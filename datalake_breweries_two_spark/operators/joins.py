"""Join operators: equi / outer / semi / anti / multi-way star.

The reference has no joins in code (its Postgres serving layer implies
downstream joins; SURVEY.md §2.2) — these complete the relational surface.

Scale profile, per strategy:
  * ``broadcast`` — dim tables (region/nation/customer at dim scale) ship to
    every executor once; the 100 TB fact side never shuffles. Always the
    right call when one side fits in executor memory (session threshold
    64 MB; explicit ``F.broadcast`` hint used so plans don't silently
    degrade when stats are missing).
  * sort-merge — fact-fact joins shuffle both sides on the key; AQE converts
    to broadcast at runtime if a side turns out small, and splits skewed
    partitions. For repeated fact-fact joins on the same key, bucketing
    (``sources.lake.write_bucketed``) removes the shuffle entirely.
  * semi/anti — Catalyst rewrites to a semi-join that only ships the key
    column of the probe side's build table; prefer over ``IN (collect())``
    driver-side lists, always.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def join_inner(fact: DataFrame, dim: DataFrame, on, broadcast_dim: bool = True) -> DataFrame:
    right = F.broadcast(dim) if broadcast_dim else dim
    return fact.join(right, on, "inner")


def join_left(left: DataFrame, right: DataFrame, on, broadcast_right: bool = False) -> DataFrame:
    r = F.broadcast(right) if broadcast_right else right
    return left.join(r, on, "left")


def join_semi(probe: DataFrame, build: DataFrame, on) -> DataFrame:
    """EXISTS — rows of ``probe`` with a match; build side only ships keys."""
    return probe.join(build, on, "left_semi")


def join_anti(probe: DataFrame, build: DataFrame, on) -> DataFrame:
    """NOT EXISTS — rows of ``probe`` without a match."""
    return probe.join(build, on, "left_anti")


def star_join_revenue(
    region: DataFrame,
    nation: DataFrame,
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
) -> DataFrame:
    """Multi-way star join: revenue per region name.

    Plan shape at scale: lineitem (the 100 TB fact) joins orders
    (sort-merge / AQE), then the chained dim lookups customer→nation→region
    are ALL broadcast — the fact side is never re-shuffled after the first
    join. Revenue summed as decimal for order-independence, surfaced double.
    """
    dims = (
        customer.join(
            F.broadcast(nation), customer.c_nationkey == nation.n_nationkey, "inner"
        )
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey, "inner")
        .select("c_custkey", "r_name")
    )
    enriched = (
        lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey, "inner")
        .join(F.broadcast(dims), orders.o_custkey == dims.c_custkey, "inner")
    )
    # Revenue in exact decimal arithmetic (cast BOTH factors before the
    # multiply): decimal sums are order-independent, so the result is
    # identical regardless of partitioning — double sums are not.
    revenue = F.sum(
        F.col("l_extendedprice").cast("decimal(18,4)")
        * (F.lit(1) - F.col("l_discount")).cast("decimal(18,4)")
    )
    return (
        enriched.groupBy(F.col("r_name").alias("region_name"))
        .agg(
            revenue.cast("double").alias("revenue"),
            F.count(F.col("l_orderkey")).alias("n_lineitems"),
        )
    )
