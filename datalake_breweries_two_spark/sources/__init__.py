"""Sources & sinks: lake formats (parquet/json/csv), HTTP API ingestion,
JDBC serving — the engine's I/O boundary."""
