"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``datalake_breweries_two_spark`` (see SURVEY.md §2
for the operator inventory each query covers); this module is a thin
adapter.
"""

from __future__ import annotations

import glob
import json
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, "/root/repo")

from datalake_breweries_two_spark import entry_queries


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (the reference's gold-aggregate shape — group-by +
    COUNT(col), ``plugins/brewery_operators.py:373-379`` — on orders) at
    sf0.001."""
    return entry_queries.q_gold_agg(spark, "/root/testdata/sf0.001")


def _driver_checked() -> set[str]:
    """Query names that already have a CORRECTNESS entry from any prior
    driver round (the driver snapshots a bounded prefix of ``queries()``
    per round, so rotation is how the whole registry gets hard-verified)."""
    seen: set[str] = set()
    for path in glob.glob("/root/repo/CORRECTNESS_r*.json"):
        try:
            with open(path) as f:
                snapshot = json.load(f)
            if isinstance(snapshot, dict):
                seen.update(k for k in snapshot if isinstance(k, str))
        except (OSError, ValueError):
            continue
    return seen


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2.

    Ordered so not-yet-driver-verified queries come first (oracle-backed
    ones ahead of rows-only ones), then previously-verified ones in
    registry order — a stable rotation that converges to full driver
    coverage across rounds without dropping any entry.
    """
    registry = dict(entry_queries.QUERIES)
    try:
        checked = _driver_checked()
        oracles = entry_queries.ORACLE_SQL

        def bucket(name: str) -> int:
            if name not in checked:
                return 0 if name in oracles else 1
            return 2

        ordered = sorted(registry, key=bucket)  # stable: keeps registry order per bucket
        return {name: registry[name] for name in ordered}
    except Exception:
        return registry


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query; keys absent here (engine-specific
    hashing / sketches / streaming / media) get the rows-only check."""
    return dict(entry_queries.ORACLE_SQL)
