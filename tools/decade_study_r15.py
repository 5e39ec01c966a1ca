"""r15 decade study: the dedup tier's sf1→sf10 third decade re-run at the
DEFAULT 8 GiB driver heap, with the parquet stage medium (VERDICT r14
item 1: "the plan shape is right; the materialization medium isn't").

The r14 third decade (SCALING.md r14 part 3) needed
SPARK_GRAFT_DRIVER_MEM=24g because the 500k-doc shingle/signature/
candidate localCheckpoints held executor-memory blocks that contended
with the shuffle for the same heap. This study re-runs the exact same
four paths with ``stage_dir`` pointing every multi-consumer intermediate
at a parquet scratch directory instead — if the swap is the real 100 TB
medium, the default heap must survive the same corpus.

Measures (min of 3 warm runs each, one session, 8g heap):

1. near_duplicates_verified DEFAULT path (num_hashes=None auto band
   rows) at sf1 vs sf10, stage_dir set.
2. q_dedup_near registry widths (minhash_near_duplicates, portable
   hashes, num_hashes=32/bands=8/t=0.4, folded tokenizer), stage_dir set.
3. q_token_dedup_near registry widths (near_duplicates_verified,
   shingle_n=2, bpe tokenizer, t=0.3), stage_dir set.
4. The same default path WITHOUT stage_dir at sf10 (optional,
   RUN_HEAP_CONTROL=1) — expected to OOM at 8g per the r14 study; kept
   out of the default run so the study completes unattended.

Usage: python tools/decade_study_r15.py    (do NOT set
SPARK_GRAFT_DRIVER_MEM — the default 8g IS the experiment)
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from datalake_breweries_two_spark.operators import dedup  # noqa: E402
from datalake_breweries_two_spark.session import build_session  # noqa: E402

SF1 = "/root/repo/.scaling/sf1"
SF10 = "/root/repo/.scaling/sf10"


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
    spark = build_session(app_name="decade_study_r15", quiet_bounded_window_warn=True)
    scratch = tempfile.mkdtemp(prefix="dedup_stage_r15_")
    results = {}

    def staged(fn):
        """Run fn with a fresh stage subdir, wiping it after (the caller-
        owns-lifecycle contract)."""
        sub = tempfile.mkdtemp(dir=scratch)
        try:
            return fn(sub)
        finally:
            shutil.rmtree(sub, ignore_errors=True)

    for name, sf in [("sf1", SF1), ("sf10", SF10)]:
        docs = spark.read.parquet(os.path.join(sf, "documents.parquet"))
        results[f"near_dup_verified_auto/{name}"] = timeit(
            lambda d=docs: staged(
                lambda s: dedup.near_duplicates_verified(d, stage_dir=s).count()
            )
        )
        results[f"q_dedup_near_widths/{name}"] = timeit(
            lambda d=docs: staged(
                lambda s: dedup.minhash_near_duplicates(
                    d,
                    num_hashes=32,
                    bands=8,
                    threshold=0.4,
                    tokenizer="whitespace_folded",
                    hash_fn="portable",
                    stage_dir=s,
                ).count()
            )
        )
        results[f"q_token_dedup_near_widths/{name}"] = timeit(
            lambda d=docs: staged(
                lambda s: dedup.near_duplicates_verified(
                    d,
                    shingle_n=2,
                    num_hashes=32,
                    bands=8,
                    threshold=0.3,
                    tokenizer="bpe",
                    hash_fn="portable",
                    stage_dir=s,
                ).count()
            )
        )

    if os.environ.get("RUN_HEAP_CONTROL", "") == "1":
        docs10 = spark.read.parquet(os.path.join(SF10, "documents.parquet"))
        try:
            results["near_dup_verified_auto_NOSTAGE/sf10"] = timeit(
                lambda: dedup.near_duplicates_verified(docs10).count(), n=1
            )
        except Exception as e:  # expected: 8g heap OOM per the r14 study
            results["near_dup_verified_auto_NOSTAGE/sf10"] = f"FAILED: {e}"

    print()
    for k, v in results.items():
        print(f"{k}: {v if isinstance(v, str) else f'{v:.3f} s'}")
    for base in [
        "near_dup_verified_auto",
        "q_dedup_near_widths",
        "q_token_dedup_near_widths",
    ]:
        r = results[f"{base}/sf10"] / results[f"{base}/sf1"]
        print(f"{base}: ratio @10x = {r:.2f}x (8g heap, parquet stage)")
    shutil.rmtree(scratch, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
