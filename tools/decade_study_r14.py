"""r14 decade study: default-path LSH auto-width + the iterative tier.

Measures (min of 3 warm runs each, one session, the r13 protocol of
tools/make_sf1_tiles.py + SCALING.md):

1. embedding_near_dup_pairs DEFAULT path (n_planes=None — the r14
   production default) on the q_embedding_near_dup construction
   (corpus + planted parallel twins) at sf0.1 vs the synthetic sf1 —
   the r13 verdict's done-criterion for its top item (fixed width read
   5.41x at 10x data; the auto width must hold <=1.5x).
2. near_duplicates_verified DEFAULT path (num_hashes=None — auto band
   rows) at sf0.1 vs sf1.
3. q_dedup_clusters (registry query — iterative connected components
   over exact-Jaccard pairs) at sf0.1 vs sf1: the slowest bench query
   and the only heavy tier without second-decade evidence (r13 verdict
   item 4).
4. graph.pagerank's iterative loop at 10x graph size (200 -> 2000
   nodes, k=3 edges each; edge build localCheckpointed OUT of the
   timing so the loop itself is what's measured).

Usage: python tools/decade_study_r14.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from datalake_breweries_two_spark import entry_queries  # noqa: E402
from datalake_breweries_two_spark.operators import dedup, graph, similarity  # noqa: E402
from datalake_breweries_two_spark.session import build_session  # noqa: E402

SF01 = "/root/testdata/sf0.1"
SF1 = "/root/repo/.scaling/sf1"


def timeit(fn, n=3):
    best = float("inf")
    for _ in range(n):
        t0 = time.monotonic()
        fn()
        best = min(best, time.monotonic() - t0)
    return best


def emb_with_twins(spark, sf_dir):
    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet")).select(
        "vec_id",
        F.transform(F.col("embedding"), lambda x: x.cast("double")).alias("embedding"),
    )
    twins = emb.filter(F.col("vec_id") % (10**9) < 20).select(
        (F.col("vec_id") + 500_000_000).alias("vec_id"),
        F.transform(F.col("embedding"), lambda x: x * F.lit(1.5)).alias("embedding"),
    )
    return emb.unionByName(twins)


def main() -> None:
    spark = build_session(app_name="decade_study_r14", quiet_bounded_window_warn=True)
    results = {}

    for name, sf in [("sf0.1", SF01), ("sf1", SF1)]:
        corpus = emb_with_twins(spark, sf)
        results[f"embedding_near_dup_auto/{name}"] = timeit(
            lambda c=corpus: similarity.embedding_near_dup_pairs(
                c, threshold=0.95
            ).count()
        )

    for name, sf in [("sf0.1", SF01), ("sf1", SF1)]:
        docs = spark.read.parquet(os.path.join(sf, "documents.parquet"))
        results[f"near_dup_verified_auto/{name}"] = timeit(
            lambda d=docs: dedup.near_duplicates_verified(d).count()
        )

    for name, sf in [("sf0.1", SF01), ("sf1", SF1)]:
        results[f"q_dedup_clusters/{name}"] = timeit(
            lambda s=sf: entry_queries.q_dedup_clusters(spark, s).count()
        )

    emb01 = spark.read.parquet(os.path.join(SF01, "embeddings.parquet"))
    for name, max_id in [("n200", 200), ("n2000", 2000)]:
        edges = graph.knn_edges(emb01, max_id=max_id).localCheckpoint(eager=True)
        results[f"pagerank_loop/{name}"] = timeit(
            lambda e=edges: graph.pagerank(e).count()
        )

    print()
    for k, v in results.items():
        print(f"{k}: {v:.3f} s")
    for pair in [
        ("embedding_near_dup_auto", "sf0.1", "sf1"),
        ("near_dup_verified_auto", "sf0.1", "sf1"),
        ("q_dedup_clusters", "sf0.1", "sf1"),
        ("pagerank_loop", "n200", "n2000"),
    ]:
        base, a, b = pair
        r = results[f"{base}/{b}"] / results[f"{base}/{a}"]
        print(f"{base}: ratio @10x = {r:.2f}x")
    spark.stop()


if __name__ == "__main__":
    main()
