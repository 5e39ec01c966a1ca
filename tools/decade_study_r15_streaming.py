"""r15 decade study, part 2: the STREAMING tier's sf1→sf10 third decade
(VERDICT r14 item 6: the tier had second-decade evidence only — 2.4-2.6x
@10x, overhead-share still shrinking — and the open question is whether
the keyed-state growth term stays linear when state stops being trivially
memory-resident, plus what the RocksDB swap costs when it doesn't).

Shapes measured are the two keyed streaming gates, reconstructed from
their declared-query plans (entry_queries.q_streaming_dq_gate /
q_streaming_contamination) with ONE deliberate difference: the drive
drains to the `noop` sink with an explicit per-run checkpoint instead of
the test-harness memory sink. The memory sink accumulates one row per
key per touched trigger IN THE DRIVER (fine at the 150k-key declared
scale; at 15M keys x 4 triggers it would measure driver heap, not the
stream), while production drains to a lake upsert (foreachBatch) whose
cost is the sink's own story — noop isolates exactly the terms this
study is about: staged-slice write, per-trigger scan, shuffle to the
keyed aggregate, and state-store open/update/commit.

Matrix (min of 3 warm runs each, one session, DEFAULT 8g heap,
shuffle_partitions pinned to 8 like the declared drives):

1. DQ-gate shape (per-orderkey integer-quad state, broadcast customer
   probe): sf1 (1.5M keys) and sf10 (15M keys), with BOTH the default
   HDFSBackedStateStoreProvider and RocksDBStateStoreProvider — the
   provider conf is fixed into a query's checkpoint at first start, so
   each timed run gets a fresh checkpoint dir.
2. Contamination shape (stateless shingle explode, broadcast benchmark
   probe, per-doc overlap state): sf1 (50k docs) and sf10 (500k docs),
   default provider, plus RocksDB at sf10.

Inputs: /root/repo/.scaling/sf1 (full fact tiles) and .scaling/sf10
(streamfacts build — tools/make_sf1_tiles.py <out> 100 streamfacts).

Usage: python tools/decade_study_r15_streaming.py   (do NOT set
SPARK_GRAFT_DRIVER_MEM — the default 8g IS the experiment)
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from datalake_breweries_two_spark.operators import dedup  # noqa: E402
from datalake_breweries_two_spark.session import build_session  # noqa: E402
from datalake_breweries_two_spark.streaming import windows as stream_windows  # noqa: E402

SF1 = "/root/repo/.scaling/sf1"
SF10 = "/root/repo/.scaling/sf10"
ROCKSDB = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)


def run_to_noop(spark, stream_df, output_mode, ckpt_root, provider=None):
    """Drive a stream to completion against the noop sink with a FRESH
    checkpoint (state starts empty every run) and the declared drives'
    pinned stateful parallelism of 8."""
    prev_sp = spark.conf.get("spark.sql.shuffle.partitions")
    prev_prov = spark.conf.get(
        "spark.sql.streaming.stateStore.providerClass", None
    )
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    if provider:
        spark.conf.set("spark.sql.streaming.stateStore.providerClass", provider)
    ckpt = tempfile.mkdtemp(dir=ckpt_root)
    try:
        q = (
            stream_df.writeStream.outputMode(output_mode)
            .format("noop")
            .option("checkpointLocation", os.path.join(ckpt, "cp"))
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
    finally:
        shutil.rmtree(ckpt, ignore_errors=True)
        spark.conf.set("spark.sql.shuffle.partitions", prev_sp)
        if provider:
            if prev_prov:
                spark.conf.set(
                    "spark.sql.streaming.stateStore.providerClass", prev_prov
                )
            else:
                spark.conf.unset("spark.sql.streaming.stateStore.providerClass")


def dq_gate_drive(spark, sf_dir, scratch, ckpt_root, provider=None):
    """entry_queries.q_streaming_dq_gate's plan, noop-drained."""
    orders = spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
    cust_keys = (
        spark.read.parquet(os.path.join(sf_dir, "customer.parquet"))
        .select("c_custkey")
        .distinct()
        .localCheckpoint(eager=True)
    )
    stream = stream_windows.stage_keyed_micro_batches(
        spark,
        orders.select("o_orderkey", "o_custkey", "o_totalprice"),
        "o_orderkey",
        os.path.join(scratch, "orders_dq_stream"),
    )
    price = F.col("o_totalprice")
    flagged = stream.join(
        F.broadcast(cust_keys),
        stream["o_custkey"] == cust_keys["c_custkey"],
        "left",
    ).select(
        "o_orderkey",
        "ingest_ts",
        F.when(F.coalesce(price <= 0, F.lit(True)), 1).otherwise(0).alias("_pos"),
        F.when(F.isnan(price) | (F.abs(price) == F.lit(float("inf"))), 1)
        .otherwise(0)
        .alias("_fin"),
        F.when(F.col("c_custkey").isNull(), 1).otherwise(0).alias("_orph"),
    )
    agg = (
        flagged.withWatermark("ingest_ts", "3650 days")
        .groupBy("o_orderkey")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("_pos").alias("n_pos"),
            F.sum("_fin").alias("n_fin"),
            F.sum("_orph").alias("n_orph"),
        )
    )
    run_to_noop(spark, agg, "update", ckpt_root, provider=provider)
    cust_keys.unpersist()


def contamination_drive(spark, sf_dir, scratch, ckpt_root, provider=None):
    """entry_queries.q_streaming_contamination's plan, noop-drained."""
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    bench_sh = (
        dedup.shingle_docs_exploded(docs.filter(F.col("doc_id") % 20 == 0), n=3)
        .select("shingle")
        .distinct()
        .localCheckpoint(eager=True)
    )
    stream = stream_windows.stage_keyed_micro_batches(
        spark,
        docs.filter(F.col("doc_id") % 20 != 0).select("doc_id", "text"),
        "doc_id",
        os.path.join(scratch, "docs_contam_stream"),
    )
    exploded = stream.select(
        "doc_id",
        "ingest_ts",
        dedup.word_shingles("text", 3).alias("_sh"),
    ).select(
        "doc_id",
        "ingest_ts",
        F.size("_sh").alias("n_shingles"),
        F.explode("_sh").alias("shingle"),
    )
    hits = exploded.join(F.broadcast(bench_sh), "shingle")
    agg = (
        hits.withWatermark("ingest_ts", "3650 days")
        .groupBy("doc_id", "n_shingles")
        .agg(F.count(F.lit(1)).alias("n_overlap"))
    )
    run_to_noop(spark, agg, "update", ckpt_root, provider=provider)
    bench_sh.unpersist()


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
        app_name="decade_study_r15_streaming", quiet_bounded_window_warn=True
    )
    scratch = tempfile.mkdtemp(prefix="stream_decade_r15_")
    results: dict[str, float] = {}
    cells = [
        ("dq_gate/sf1/hdfs", dq_gate_drive, SF1, None),
        ("dq_gate/sf10/hdfs", dq_gate_drive, SF10, None),
        ("dq_gate/sf1/rocksdb", dq_gate_drive, SF1, ROCKSDB),
        ("dq_gate/sf10/rocksdb", dq_gate_drive, SF10, ROCKSDB),
        ("contam/sf1/hdfs", contamination_drive, SF1, None),
        ("contam/sf10/hdfs", contamination_drive, SF10, None),
        ("contam/sf10/rocksdb", contamination_drive, SF10, ROCKSDB),
    ]
    try:
        for name, fn, sf, provider in cells:
            results[name] = timeit(
                lambda fn=fn, sf=sf, provider=provider: fn(
                    spark, sf, scratch, scratch, provider=provider
                )
            )
            print(f"{name}: {results[name]:.2f} s", flush=True)
    finally:
        shutil.rmtree(scratch, ignore_errors=True)
    print()
    for k, v in results.items():
        print(f"{k}\t{v:.2f}")
    for shape in ("dq_gate", "contam"):
        for prov in ("hdfs", "rocksdb"):
            a = results.get(f"{shape}/sf1/{prov}")
            b = results.get(f"{shape}/sf10/{prov}")
            if a and b:
                print(f"{shape}/{prov} ratio @10x: {b / a:.2f}x")
    spark.stop()


if __name__ == "__main__":
    main()
