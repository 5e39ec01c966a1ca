"""Window functions and top-k (SURVEY.md §2.2: rank, lag, running sum, top-k).

Scale profile:
  * Partitioned windows shuffle once on the partition key, then sort within
    partitions — fine at 100 TB when the partition key has enough
    cardinality. An UNPARTITIONED ordered window is a single-task
    global-sort bottleneck: never ship one (every function here requires a
    partition key).
  * Global top-k uses ``orderBy().limit(k)`` which Catalyst compiles to
    ``TakeOrderedAndProject``: each task keeps a k-row heap, the driver
    merges P×k rows — no global sort, no full shuffle. This is THE way to
    take a top-k off 100 TB.
  * Every ordering carries a unique tie-breaker key so results are
    deterministic (oracle-hash requirement, SURVEY.md §5).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def rank_in_group(
    df: DataFrame, part_key: str, order_col: str, tiebreak: str, desc: bool = True
) -> DataFrame:
    """row_number + rank + dense_rank per group, deterministic via tiebreak."""
    oc = F.col(order_col).desc() if desc else F.col(order_col).asc()
    w = Window.partitionBy(part_key).orderBy(oc, F.col(tiebreak).asc())
    return df.select(
        "*",
        F.row_number().over(w).alias("rn"),
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
    )


def top_k_per_group(
    df: DataFrame, part_key: str, order_col: str, tiebreak: str, k: int
) -> DataFrame:
    """Top-k rows per group: window row_number ≤ k. One shuffle on the group
    key; at scale pre-aggregate or pre-filter the frame first if only a tiny
    fraction can be in any top-k."""
    w = Window.partitionBy(part_key).orderBy(
        F.col(order_col).desc(), F.col(tiebreak).asc()
    )
    return (
        df.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= k)
    )


def global_top_k(df: DataFrame, order_col: str, tiebreak: str, k: int) -> DataFrame:
    """Global top-k via TakeOrderedAndProject (per-task heaps, driver merge)."""
    return df.orderBy(F.col(order_col).desc(), F.col(tiebreak).asc()).limit(k)


def running_sum(
    df: DataFrame, part_key: str, order_col: str, tiebreak: str, value_col: str
) -> DataFrame:
    """Cumulative sum per group in event order.

    Decimal accumulator: running FP sums ARE order-deterministic given the
    total order (part, order_col, tiebreak), but decimal keeps the oracle
    hash exact regardless of engine-internal accumulation width.
    """
    w = (
        Window.partitionBy(part_key)
        .orderBy(F.col(order_col).asc(), F.col(tiebreak).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return df.select(
        "*",
        F.sum(F.col(value_col).cast("decimal(18,4)"))
        .over(w)
        .cast("double")
        .alias("running_sum"),
    )


def lag_delta(
    df: DataFrame, part_key: str, order_col: str, tiebreak: str, value_col: str
) -> DataFrame:
    """Per-group lag + delta vs previous row (sessionization building block)."""
    w = Window.partitionBy(part_key).orderBy(
        F.col(order_col).asc(), F.col(tiebreak).asc()
    )
    prev = F.lag(F.col(value_col)).over(w)
    return df.select(
        "*",
        prev.alias("prev_value"),
        (F.col(value_col) - prev).alias("delta_value"),
    )


def lead_ntile_pct(
    df: DataFrame, part_key: str, order_col: str, tiebreak: str
) -> DataFrame:
    """Navigation + distribution window functions: lead, ntile(4),
    percent_rank. Deterministic under the (order_col, tiebreak) total order;
    percent_rank is integer-rank arithmetic so the double is identical
    across engines (rounded anyway for hash hygiene)."""
    w = Window.partitionBy(part_key).orderBy(
        F.col(order_col).asc(), F.col(tiebreak).asc()
    )
    return df.select(
        "*",
        F.lead(F.col(order_col)).over(w).alias("next_val"),
        F.ntile(4).over(w).alias("quartile"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
    )


def first_last_in_group(
    df: DataFrame, part_key: str, order_col: str, tiebreak: str
) -> DataFrame:
    """first_value/last_value over the FULL frame. The frame must be
    explicit ROWS UNBOUNDED PRECEDING..UNBOUNDED FOLLOWING: the SQL default
    frame ends at CURRENT ROW, silently turning last_value into
    'current value'."""
    w = (
        Window.partitionBy(part_key)
        .orderBy(F.col(order_col).asc(), F.col(tiebreak).asc())
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return df.select(
        "*",
        F.first(F.col(tiebreak)).over(w).alias("first_key"),
        F.last(F.col(tiebreak)).over(w).alias("last_key"),
    )


def range_frame_count(
    df: DataFrame, part_key: str, order_col_int: str, radius: int
) -> DataFrame:
    """Value-range window frame: per row, how many group rows have
    ``order_col_int`` within ±radius. RANGE frames are value-based, so ties
    do NOT break determinism (peer rows see identical frames — no tiebreak
    needed). The order column must be integral for exact frame bounds;
    callers convert monetary doubles to cents first."""
    w = (
        Window.partitionBy(part_key)
        .orderBy(F.col(order_col_int).asc())
        .rangeBetween(-radius, radius)
    )
    return df.select("*", F.count(F.lit(1)).over(w).alias("n_neighbors"))
