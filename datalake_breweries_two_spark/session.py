"""SparkSession factory.

The reference builds three *separate* cold SparkSessions per pipeline run and
never sets ``.master`` (reference ``plugins/brewery_operators.py:229-244,
358-371``, ``plugins/data_quality_operator.py:43-53`` — see SURVEY.md §3).
This engine instead exposes ONE master-agnostic, tuned session factory:

  * master comes from ``SPARK_GRAFT_MASTER`` / ``spark.master`` (defaults to
    ``local[N]`` with N = ``SPARK_GRAFT_CPUS``) so the identical code runs on
    a 1000-executor cluster by pointing the env var at the cluster master;
  * AQE on (runtime shuffle-partition coalescing, skew-join splitting) —
    the single most important knob for 100 TB robustness;
  * shuffle partitions sized to the local core count for tests; on a real
    cluster AQE re-coalesces from ``spark.sql.shuffle.partitions`` anyway;
  * UTC session timezone so timestamp semantics match the DuckDB oracle;
  * Arrow enabled for every pandas-interop path (Pandas UDFs, toPandas).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

_DEFAULT_APP = "datalake_breweries_two_spark"


def build_session(
    app_name: str = _DEFAULT_APP,
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the shared tuned SparkSession.

    One session per process — the reference's 3-cold-JVMs-per-run pattern
    (SURVEY.md §3 "Critical deployment fact") is deliberately not replicated.
    """
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    if master is None:
        master = os.environ.get("SPARK_GRAFT_MASTER", f"local[{cpus}]")
    if shuffle_partitions is None:
        shuffle_partitions = int(os.environ.get("SPARK_GRAFT_SHUFFLE", cpus))

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.sources.partitionOverwriteMode", "dynamic")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # Parquet TIMESTAMP(NANOS) (e.g. the events table) is read as a long
        # of epoch-nanos; catalog.load_table converts to TimestampType via
        # exact integer division (Spark has no native ns timestamp).
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # Write timestamps as TIMESTAMP(MICROS), not the legacy INT96:
        # readable by every engine (DuckDB, pyarrow) AND keeps
        # catalog.events_ts_is_nanos' footer sniff unambiguous (pyarrow
        # reports INT96 as timestamp[ns], which would misroute staged
        # event files into the nanos-long decode path).
        .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def stop_session(spark: SparkSession) -> None:
    """Explicit teardown (tests / end of pipeline run)."""
    spark.stop()
