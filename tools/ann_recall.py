"""ANN recall/latency harness (r5 verdict item 8): measure recall@k and
wall-clock of the approximate tiers (LSH candidate-budget, IVF n_probe)
against exact brute-force cosine top-k at a full scale factor.

Usage::

    python tools/ann_recall.py [sf_dir]          # default /root/testdata/sf0.1

Prints one JSON line per (method, param): recall@10 averaged over the
seeded query set plus the mean per-query latency of that configuration.
The recall numbers are deterministic (seeded queries, id tie-breaks);
latency is subject to the documented host-noise band — compare ratios
between configs within one run, not absolute seconds across runs.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from datalake_breweries_two_spark.operators import similarity

    spark = (
        SparkSession.builder.master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    n = emb.count()
    k = 10
    budgets = [16, 64, 256]
    probes = [1, 2, 4, 8]

    # recall curves in one call (deterministic)
    t0 = time.time()
    rep = {
        (r["method"], r["param"]): r["recall"]
        for r in similarity.ann_recall_curves(
            emb, n_queries=5, k=k,
            lsh_budgets=tuple(budgets), ivf_probes=tuple(probes),
            n_centroids=16,
        ).collect()
    }
    recall_sec = time.time() - t0

    # per-config latency: one representative query vector, min of 2 runs
    # (stalls only ever add time — see BASELINE.md host-noise note)
    qv = [
        float(x)
        for x in emb.filter(F.col("embedding").isNotNull())
        .orderBy(F.xxhash64("vec_id").asc(), F.col("vec_id").asc())
        .limit(1)
        .collect()[0]["embedding"]
    ]

    def timed(thunk) -> float:
        best = float("inf")
        for _ in range(2):
            t = time.time()
            thunk()
            best = min(best, time.time() - t)
        return round(best, 4)

    lat = {("brute", k): timed(
        lambda: similarity.cosine_topk_bruteforce(emb, qv, k).collect()
    )}
    for b in budgets:
        lat[("lsh", b)] = timed(
            lambda b=b: similarity.cosine_topk_lsh(
                emb, qv, k, candidate_budget=b
            ).collect()
        )

    for (method, param), recall in sorted(rep.items()):
        print(json.dumps({
            "sf_dir": sf_dir, "corpus": n, "k": k,
            "method": method, "param": param, "recall": recall,
            "latency_sec": lat.get((method, param)),
            "recall_pass_sec": round(recall_sec, 2),
        }, sort_keys=True))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
