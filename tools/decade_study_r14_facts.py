"""r14 decade study, part 2: the FACT-TABLE tiers over the new tiled
events/orders/lineitem/customer sf1 (tools/make_sf1_tiles.py, r14
extension — these were symlinks to sf0.1 before, so the behavioral and
relational tiers had no second-decade evidence at all).

Picks: the two worst first-decade TPC-H ratios (q18 2.64x, q21 1.69x —
SCALING.md's original table), the behavioral tier (sessionize, cohort
retention), and both physical merge-on-read gold rollups (whose
day-cell COUNT stays constant under the tiling while cell CONTENTS grow
10x — the real incremental-lake stress shape).

Same protocol as part 1: min of 3 warm runs, both SFs back-to-back in
one session. Usage: python tools/decade_study_r14_facts.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from datalake_breweries_two_spark import entry_queries  # noqa: E402
from datalake_breweries_two_spark.session import build_session  # noqa: E402

SF01 = "/root/testdata/sf0.1"
SF1 = "/root/repo/.scaling/sf1"

QUERIES = [
    "q_sql_tpch_q18",
    "q_sql_tpch_q21",
    "q_sessionize",
    "q_cohort_retention",
    "q_hll_rollup_merge",
    "q_kll_rollup_merge",
]


def timeit(fn, n=3):
    best = float("inf")
    for _ in range(n):
        t0 = time.monotonic()
        fn()
        best = min(best, time.monotonic() - t0)
    return best


def main() -> None:
    spark = build_session(
        app_name="decade_study_r14_facts", quiet_bounded_window_warn=True
    )
    results = {}
    for name in QUERIES:
        for label, sf in [("sf0.1", SF01), ("sf1", SF1)]:
            results[f"{name}/{label}"] = timeit(
                lambda n=name, s=sf: entry_queries.QUERIES[n](spark, s).count()
            )
    print()
    for k, v in results.items():
        print(f"{k}: {v:.3f} s")
    for name in QUERIES:
        r = results[f"{name}/sf1"] / results[f"{name}/sf0.1"]
        print(f"{name}: ratio @10x = {r:.2f}x")
    spark.stop()


if __name__ == "__main__":
    main()
