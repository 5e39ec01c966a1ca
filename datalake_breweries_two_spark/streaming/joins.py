"""Stream-stream joins (Structured Streaming).

The reference has no streaming surface at all (SURVEY.md §2 — batch-only
Airflow DAG); this is north-star extension territory: the
view→click-within-N-minutes attribution join every event pipeline needs.

Scale profile: a stream-stream inner join buffers BOTH sides in the state
store; the event-time range condition plus watermarks on both sides lets
Spark evict a buffered row as soon as the watermark passes the farthest
instant it could still match — state is O(events inside the lag window),
not O(stream). Without the time bound (or with only one watermark) state
grows forever; this module makes both mandatory.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def view_click_attribution(
    views: DataFrame,
    clicks: DataFrame,
    max_lag_minutes: int = 30,
    watermark: str = "3650 days",
) -> DataFrame:
    """Attribute each click to the user's views in the preceding
    ``max_lag_minutes``: inner join on user with
    ``view_ts <= click_ts <= view_ts + lag``.

    Works identically on two streaming frames (the state-bounded
    stream-stream join; append output mode only) and on two batch frames
    (the oracle-checkable twin — tests assert stream == batch). The
    ``watermark`` is only applied to streaming inputs; tests replaying a
    finite file stream pass a span wider than the data so nothing is
    dropped as late (late-drop semantics are covered by the windowed-agg
    tests).
    """
    v = views.select(
        F.col("user_id"),
        F.col("ts").alias("view_ts"),
        F.col("event_id").alias("view_id"),
    )
    c = clicks.select(
        F.col("user_id").alias("click_user"),
        F.col("ts").alias("click_ts"),
        F.col("event_id").alias("click_id"),
    )
    if views.isStreaming:
        v = v.withWatermark("view_ts", watermark)
    if clicks.isStreaming:
        c = c.withWatermark("click_ts", watermark)
    cond = (
        (v["user_id"] == c["click_user"])
        & (c["click_ts"] >= v["view_ts"])
        & (c["click_ts"] <= v["view_ts"] + F.expr(f"interval {max_lag_minutes} minutes"))
    )
    return v.join(c, cond, "inner").select(
        "user_id", "view_id", "click_id", "view_ts", "click_ts"
    )


def view_click_attribution_outer(
    views: DataFrame,
    clicks: DataFrame,
    max_lag_minutes: int = 5,
    watermark: str = "2 minutes",
) -> DataFrame:
    """LEFT OUTER stream-stream interval join: every view emits — matched
    views eagerly (the inner part), unmatched views with NULL click columns
    once the global watermark passes the farthest instant a click could
    still match (``view_ts + lag``), i.e. when their state is evicted.

    This is the semantics the inner variant cannot give you: "views that
    never converted" as a STREAM, with state still O(lag window). The
    emission cutoff is deterministic for a drained finite replay: the final
    global watermark is ``min(max view_ts, max click_ts) - watermark`` (the
    two-watermark MIN policy, Spark's default), so unmatched views with
    ``view_ts + lag < final_wm`` have emitted and later ones are still
    buffered when the query stops — exactly the set the oracle recomputes.
    Unlike the inner twin, the watermark must be REAL (not data-spanning):
    an outer join emits its null rows only as the watermark advances.
    """
    v = views.select(
        F.col("user_id"),
        F.col("ts").alias("view_ts"),
        F.col("event_id").alias("view_id"),
    ).withWatermark("view_ts", watermark)
    c = clicks.select(
        F.col("user_id").alias("click_user"),
        F.col("ts").alias("click_ts"),
        F.col("event_id").alias("click_id"),
    ).withWatermark("click_ts", watermark)
    cond = (
        (v["user_id"] == c["click_user"])
        & (c["click_ts"] >= v["view_ts"])
        & (c["click_ts"] <= v["view_ts"] + F.expr(f"interval {max_lag_minutes} minutes"))
    )
    return v.join(c, cond, "leftOuter").select(
        "user_id", "view_id", "click_id", "view_ts", "click_ts"
    )
