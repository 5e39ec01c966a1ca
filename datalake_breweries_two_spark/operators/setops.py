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


def kll_quantile_rollup(
    df: DataFrame,
    group_col: str,
    value_col: str,
    probs: tuple[float, ...] = (0.5, 0.9, 0.99),
) -> DataFrame:
    """Mergeable quantile sketches (Apache DataSketches KLL): one sketch
    per group built with partition-local updates + merges, quantiles
    extracted from the merged sketch.

    This is how percentiles work at 100 TB: the exact `percentile`
    aggregate buffers every value per group; a KLL sketch is KB-sized with
    a proven error bound, partials merge associatively (map-side combine,
    AND across days/partitions of a gold table — store the sketch column,
    merge on read with kll_sketch_merge). Estimates are
    sampling-randomized → rows-only contract; accuracy vs the exact
    percentile is unit-tested."""
    sk = df.groupBy(group_col).agg(
        F.kll_sketch_agg_double(F.col(value_col)).alias("sk")
    )
    return sk.select(
        F.col(group_col),
        *[
            F.kll_sketch_get_quantile_double("sk", F.lit(p)).alias(
                f"p{str(p).replace('0.', '')}"
            )
            for p in probs
        ],
    )


def theta_distinct_overlap(
    df: DataFrame, type_col: str, type_a: str, type_b: str, key_col: str
) -> DataFrame:
    """Distinct-set algebra on Theta sketches: |A|, |B|, |A∪B| estimated
    from three sketches, |A∩B| by inclusion-exclusion — the audience-
    overlap question ("users who did A and B") answered WITHOUT shuffling
    raw keys. At 100 TB the three sketches are KB-sized aggregates over
    one scan each (or stored per-segment and merged); the exact
    alternative is two distinct-shuffles plus a join. Rows-only contract
    (sketch estimates); tolerance vs exact is unit-tested."""
    est_a = F.theta_sketch_estimate(
        F.theta_sketch_agg(F.when(F.col(type_col) == type_a, F.col(key_col)))
    )
    est_b = F.theta_sketch_estimate(
        F.theta_sketch_agg(F.when(F.col(type_col) == type_b, F.col(key_col)))
    )
    est_union = F.theta_sketch_estimate(
        F.theta_sketch_agg(
            F.when(F.col(type_col).isin(type_a, type_b), F.col(key_col))
        )
    )
    return df.agg(
        est_a.cast("long").alias("n_a"),
        est_b.cast("long").alias("n_b"),
        est_union.cast("long").alias("n_union"),
        (est_a + est_b - est_union).cast("long").alias("n_intersect"),
    )
