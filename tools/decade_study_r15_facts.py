"""r15 decade study, part 3: the FACT-TABLE tiers' sf1→sf10 third decade.

r14 gave the relational/behavioral/gold-rollup tiers their second decade
(sf0.1→sf1, tools/decade_study_r14_facts.py); r15's streaming study built
the 100-tile machinery, so the same six declared queries get the third
decade over the full sf10 fact tiles (60M lineitem, 15M orders, 10M
events, 1.5M customers — tools/make_sf1_tiles.py <out> 100):

* the two worst first-decade TPC-H ratios (q18, q21 — both keyed on the
  orderkey fan-out that grows 10x),
* the behavioral tier (sessionize, cohort retention — per-user state,
  10x users under the tiling),
* both physical merge-on-read gold rollups (day-cell COUNT constant
  under the tiling while cell CONTENTS grow 10x — the incremental-lake
  steady-state stress shape; near-FLAT was the second-decade headline,
  the third decade tests whether that holds when the build scan is
  60M rows).

Same protocol as parts 1-2: min of 3 warm runs, both SFs back-to-back
in one session, DEFAULT 8g heap. Usage:
python tools/decade_study_r15_facts.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from datalake_breweries_two_spark import entry_queries  # noqa: E402
from datalake_breweries_two_spark.session import build_session  # noqa: E402

SF1 = "/root/repo/.scaling/sf1"
SF10 = "/root/repo/.scaling/sf10"

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
    assert os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g") == "8g", (
        "this study must run at the DEFAULT 8g heap — unset "
        "SPARK_GRAFT_DRIVER_MEM"
    )
    spark = build_session(
        app_name="decade_study_r15_facts", quiet_bounded_window_warn=True
    )
    results = {}
    for name in QUERIES:
        for label, sf in [("sf1", SF1), ("sf10", SF10)]:
            results[f"{name}/{label}"] = timeit(
                lambda n=name, s=sf: entry_queries.QUERIES[n](spark, s).count()
            )
            print(f"{name}/{label}: {results[f'{name}/{label}']:.2f} s", flush=True)
    print()
    for k, v in results.items():
        print(f"{k}: {v:.3f} s")
    for name in QUERIES:
        r = results[f"{name}/sf10"] / results[f"{name}/sf1"]
        print(f"{name}: ratio @10x = {r:.2f}x")
    spark.stop()


if __name__ == "__main__":
    main()
