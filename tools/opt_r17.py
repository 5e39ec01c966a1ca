#!/usr/bin/env python
"""Round-17 optimization harness: isolate, time, and snapshot plans for
declared queries (guide §1: measure first, label jobs, noop sink).

Usage:
  python tools/opt_r17.py explain  q1 q2 ...   # plans/r17/<q>_<tag>.txt
  python tools/opt_r17.py time     q1 q2 ...   # min/median of N noop runs
  python tools/opt_r17.py count    q1 q2 ...   # bench-methodology (.count())

Env:
  SPARK_GRAFT_SF_DIR   data dir (default /root/testdata/sf0.1)
  OPT_TAG              suffix for explain files (default "before")
  OPT_RUNS             timing runs per query (default 3)

The harness matches bench.py's session shape (shuffle partitions = cpu
count, same build_session) so numbers are comparable, but times with the
noop sink by default so the computation is measured, not the sink
(guide §1.4). `count` mode reproduces the bench's exact timed action.

r17 hardening (r16 ADVICE item 2): the mode string is validated up
front, and warm-up failures are logged to stderr instead of fully
swallowed, so a typo'd mode or a query broken at the warm-up SF can no
longer produce plausible-looking output.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from datalake_breweries_two_spark import entry_queries
from datalake_breweries_two_spark.session import build_session

_MODES = {"explain", "time", "count"}


def main() -> None:
    mode = sys.argv[1]
    if mode not in _MODES:
        raise SystemExit(f"unknown mode {mode!r}; expected one of {sorted(_MODES)}")
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    tag = os.environ.get("OPT_TAG", "before")
    n_runs = int(os.environ.get("OPT_RUNS", "3"))
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    spark = build_session(
        app_name=f"opt_r17_{mode}",
        shuffle_partitions=cpus,
        quiet_bounded_window_warn=True,
    )
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r17"
    )
    os.makedirs(out_dir, exist_ok=True)

    warm_dir = "/root/testdata/sf0.001"
    for name in names:
        fn = entry_queries.QUERIES[name]
        if mode == "explain":
            import contextlib
            import io

            df = fn(spark, sf_dir)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            txt = buf.getvalue()
            path = os.path.join(out_dir, f"{name}_{tag}.txt")
            with open(path, "w") as f:
                f.write(txt)
            print(f"{name}: wrote {path} ({txt.count('Exchange')} Exchange refs)")
            continue

        # timing modes: warm once at sf0.001, then N runs at the target SF
        if os.path.isdir(warm_dir):
            try:
                fn(spark, warm_dir).count()
            except Exception as exc:
                print(f"{name}: warm-up failed at {warm_dir}: {exc!r}", file=sys.stderr)
        runs = []
        for i in range(n_runs):
            spark.catalog.clearCache()
            spark.sparkContext.setJobDescription(f"{name} run {i}")
            t0 = time.perf_counter()
            if mode == "count":
                fn(spark, sf_dir).count()
            else:
                fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            runs.append(time.perf_counter() - t0)
            spark.sparkContext.setJobDescription(None)
        runs_s = " ".join(f"{r:.3f}" for r in runs)
        print(f"{name}: min={min(runs):.3f} runs=[{runs_s}]")
    spark.stop()


if __name__ == "__main__":
    main()
