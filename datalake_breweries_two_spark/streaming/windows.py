"""Structured Streaming: event-time windowed aggregation with watermarks,
plus a custom stateful operator.

The reference's only 'streaming' is Airflow ``@daily`` batch re-runs
(reference ``dags/dag-brewery_pipeline.py:48``); this module provides the
real thing over the ``events`` table shape. The BATCH twin of the tumbling
window (``operators.aggregates.tumbling_window_agg``) shares the same
``F.window`` expression, so the streaming path computes exactly what the
oracle-checked batch query computes.

Scale notes: state store size is bounded by (windows retained × keys);
the watermark bounds retention. ``availableNow`` trigger + parquet source
gives exactly-once batch-over-stream semantics for backfills at any scale.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from datalake_breweries_two_spark.catalog import TABLES


def read_events_stream(spark: SparkSession, path: str) -> DataFrame:
    """File-source stream over the events layout (one file per trigger batch
    in tests; kafka in production — same downstream plan). The ns→µs
    conversion mirrors ``catalog.load_table`` (Spark has no ns timestamps)."""
    from datalake_breweries_two_spark.catalog import _EVENTS_RAW

    raw = (
        spark.readStream.schema(_EVENTS_RAW)
        .option("maxFilesPerTrigger", 1)
        .parquet(path)
    )
    return raw.select(
        F.col("event_id"),
        F.timestamp_micros(F.expr("ts DIV 1000")).alias("ts"),
        F.col("user_id"),
        F.col("event_type"),
        F.col("value"),
        F.col("props"),
    )


def windowed_event_counts(
    events: DataFrame, window: str = "1 hour", watermark: str = "10 minutes"
) -> DataFrame:
    """Tumbling event-time window + watermark: counts and value sums per
    (window, event_type). Append-mode compatible: results emit when the
    watermark passes window end; state for closed windows is dropped."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window(F.col("ts"), window).alias("w"), F.col("event_type"))
        .agg(
            F.count(F.col("event_id")).alias("n"),
            F.sum(F.col("value").cast("decimal(18,4)")).cast("double").alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("event_type"),
            F.col("n"),
            F.col("sum_value"),
        )
    )


def run_stream_to_memory(
    spark: SparkSession, stream_df: DataFrame, query_name: str, output_mode: str = "append"
) -> DataFrame:
    """Drive a stream to completion synchronously against the memory sink
    (test/backfill harness): availableNow semantics via processAllAvailable."""
    q = (
        stream_df.writeStream.outputMode(output_mode)
        .format("memory")
        .queryName(query_name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.sql(f"SELECT * FROM {query_name}")


SESSION_STATE_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
    ]
)


def sessionize_batch(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Batch sessionization (the stateful-operator pattern, §'Common OLAP
    patterns'): session id = cumulative count of gap>threshold breaks per
    user. One shuffle on user_id; windows do the rest JVM-side."""
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    # millisecond epoch gap (matches DuckDB epoch_ms for the oracle twin)
    ms = F.unix_millis(F.col("ts"))
    gap = ms - F.lag(ms).over(w)
    is_new = F.when(gap.isNull() | (gap > gap_minutes * 60 * 1000), 1).otherwise(0)
    with_sess = events.withColumn(
        "session_seq",
        F.sum(is_new).over(w.rowsBetween(Window.unboundedPreceding, 0)).cast("long"),
    )
    return (
        with_sess.groupBy("user_id", "session_seq")
        .agg(
            F.count(F.col("event_id")).alias("n_events"),
            F.min(F.col("ts")).alias("session_start"),
            F.max(F.col("ts")).alias("session_end"),
        )
    )
