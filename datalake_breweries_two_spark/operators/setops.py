"""Set operators & distinct (SURVEY.md §2.2).

Scale profile: ``distinct``/``intersect``/``except`` all shuffle on the full
row; keep the projection narrow FIRST (select the key columns before the set
op) so the shuffle moves keys, not whole rows. ``union`` is free (no
shuffle — just plan concatenation); ``unionByName`` is the safe variant when
lineages differ. ``approx_count_distinct`` (HyperLogLog++) replaces exact
distinct counting at 100 TB: fixed-size sketches merge map-side, error ~2%.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def distinct_rows(df: DataFrame, cols: list[str]) -> DataFrame:
    return df.select(*cols).distinct()


def union_all(a: DataFrame, b: DataFrame) -> DataFrame:
    """UNION ALL by column NAME (position-based union silently mismatches
    when lineages reorder columns)."""
    return a.unionByName(b)


def intersect_rows(a: DataFrame, b: DataFrame) -> DataFrame:
    return a.intersect(b)


def except_rows(a: DataFrame, b: DataFrame) -> DataFrame:
    """EXCEPT ALL (multiset difference) — matches SQL EXCEPT ALL semantics."""
    return a.exceptAll(b)


def count_distinct_exact(df: DataFrame, col: str, alias: str) -> DataFrame:
    return df.agg(F.countDistinct(F.col(col)).alias(alias))


def count_distinct_approx(df: DataFrame, col: str, alias: str, rsd: float = 0.02) -> DataFrame:
    """HLL++ sketch count — the 100 TB path for cardinality estimation."""
    return df.agg(F.approx_count_distinct(F.col(col), rsd).alias(alias))


def hll_partitioned_distinct(
    df: DataFrame,
    group_col: str,
    part_col,
    key_col: str,
) -> DataFrame:
    """Mergeable-sketch distinct counting: build one Datasketches HLL
    sketch per (group, partition) — e.g. per event-type per day — then
    union the binary sketches per group and surface the estimate.

    This is the 100 TB pattern exact ``count_distinct`` can't follow: the
    per-partition sketches are tiny (~KB) mergeable state, so daily
    partitions are sketched ONCE, persisted, and every later rollup is a
    union over sketch bytes — no re-scan of raw keys, no exact-distinct
    shuffle of the full key set. Incremental maintenance (a new day lands →
    union one more sketch) falls out for free, the same algebraic-merge
    shape as ``aggregates.merge_partial_aggs``.

    Returns (group, n_parts, distinct_est) with the estimate as a long.
    Estimate is engine-specific (rows-only correctness contract; accuracy
    vs exact distinct is unit-tested to ~2% at lgConfigK=12).
    """
    sketches = df.groupBy(F.col(group_col), part_col).agg(
        F.hll_sketch_agg(key_col, 12).alias("sketch")
    )
    return sketches.groupBy(group_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_parts"),
        F.hll_sketch_estimate(F.hll_union_agg("sketch")).alias("distinct_est"),
    )
