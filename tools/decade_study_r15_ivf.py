"""r15 decade study, part 4: the IVF/ANN tier's sf1→sf10 third decade,
measuring the ONE design knob that keeps probe latency flat at scale.

The declared queries amortize index build and probe a fixed 16-centroid
layout — right for the oracle contract, silent on the 100 TB question:
with n_centroids FIXED, per-cell size grows linearly with the corpus, so
probe cost (n_probe/n_centroids of the data) grows linearly too. The
production rule is to scale the centroid count with the corpus
(n_list ∝ √N in the classical IVF trade-off — cell size and centroid-
ranking cost both grow √10x per decade instead of one of them growing
10x). This study measures both policies on the real tiles:

1. BUILD: ivf_build_index at sf1 (200k vectors, 16 centroids) vs sf10
   (2M vectors, 16 centroids naive / 64 centroids ≈ √10-scaled) — the
   one-time per-corpus-version cost.
2. SEARCH: ivf_search top-10 at n_probe=4 against each index — the
   per-query cost whose growth the knob controls.
3. RECALL: at sf10/64c, top-10 overlap vs a brute-force exact scan for
   n_probe 1/2/4/8 — scaling the centroid count must not silently cost
   recall at equal probe FRACTION (4/64 probes the same share of the
   corpus as 1/16).

Min of 3 warm runs per timed cell, one session, DEFAULT 8g heap.
Usage: python tools/decade_study_r15_ivf.py
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from datalake_breweries_two_spark.operators import similarity  # noqa: E402
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
    spark = build_session(
        app_name="decade_study_r15_ivf", quiet_bounded_window_warn=True
    )
    scratch = tempfile.mkdtemp(prefix="ivf_decade_r15_")
    results: dict[str, float] = {}

    # one deterministic query vector shared by every cell: the corpus
    # vector with vec_id == 1 at sf1 (exists untouched in tile 0 of both
    # builds), perturbed by +1e-3 on the first component so it is not an
    # exact corpus member
    qrow = (
        spark.read.parquet(os.path.join(SF1, "embeddings.parquet"))
        .filter(F.col("vec_id") == 1)
        .select("embedding")
        .collect()[0]
    )
    qvec = [float(x) for x in qrow["embedding"]]
    qvec[0] += 1e-3

    cells = [
        ("sf1/16c", SF1, 16),
        ("sf10/16c", SF10, 16),
        ("sf10/64c", SF10, 64),
    ]
    for name, sf, nc in cells:
        emb = spark.read.parquet(os.path.join(sf, "embeddings.parquet"))
        idx = os.path.join(scratch, name.replace("/", "_"))
        results[f"build/{name}"] = timeit(
            lambda e=emb, i=idx, c=nc: similarity.ivf_build_index(
                e, i, n_centroids=c
            )
        )
        print(f"build/{name}: {results[f'build/{name}']:.2f} s", flush=True)
        results[f"search/{name}"] = timeit(
            lambda i=idx: similarity.ivf_search(
                spark, i, qvec, k=10, n_probe=4
            ).count()
        )
        print(f"search/{name}: {results[f'search/{name}']:.2f} s", flush=True)

    # recall at sf10/64c vs brute force (single pass each, not timed)
    emb10 = spark.read.parquet(os.path.join(SF10, "embeddings.parquet"))
    q = similarity._vec_literal(qvec)
    truth = [
        r["vec_id"]
        for r in emb10.select(
            "vec_id",
            F.round(similarity._cosine(F.col("embedding"), q), 4).alias("c"),
        )
        .orderBy(F.col("c").desc(), F.col("vec_id").asc())
        .limit(10)
        .collect()
    ]
    idx64 = os.path.join(scratch, "sf10_64c")
    for n_probe in (1, 2, 4, 8):
        got = [
            r["vec_id"]
            for r in similarity.ivf_search(
                spark, idx64, qvec, k=10, n_probe=n_probe
            ).collect()
        ]
        rec = len(set(got) & set(truth)) / 10.0
        results[f"recall@10/sf10/64c/np{n_probe}"] = rec
        print(f"recall@10/sf10/64c/np{n_probe}: {rec:.2f}", flush=True)

    shutil.rmtree(scratch, ignore_errors=True)
    print()
    for k, v in results.items():
        print(f"{k}\t{v:.3f}")
    for metric in ("build", "search"):
        a, b16, b64 = (
            results[f"{metric}/sf1/16c"],
            results[f"{metric}/sf10/16c"],
            results[f"{metric}/sf10/64c"],
        )
        print(
            f"{metric} @10x: fixed-16c {b16 / a:.2f}x, sqrt-scaled-64c "
            f"{b64 / a:.2f}x"
        )
    spark.stop()


if __name__ == "__main__":
    main()
