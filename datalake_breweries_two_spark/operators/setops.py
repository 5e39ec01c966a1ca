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
