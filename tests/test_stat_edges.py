"""Adversarial-input parity for the statistical battery.

The sf-generated testdata is benign (non-degenerate groups, both order
statuses present, natural-ish text), so the oracle-parity suite never
exercises the division-by-zero / zero-variance / single-element edges
where Spark's ANSI mode and DuckDB historically diverge (Spark throws
DIVIDE_BY_ZERO — even for doubles — where DuckDB yields NULL). This
suite builds a deliberately degenerate lake and asserts FULL cross-engine
parity for every battery query on it:

- zero-variance groups (constant measure columns)     -> corr/slope NULL
- single-element groups                               -> co-moments NULL
- all-ties groups                                     -> rank stats NULL
- an all-zero-valued segment                          -> gini/share NULL
- one population entirely absent (all orders 'F')     -> KS NULL, PSI floored
- a single-row events table                           -> chi2 NULL, dof 0
- a one-token corpus                                  -> zipf slope NULL

Comparison discipline is the same order-insensitive normalized multiset
as tests/test_oracle_parity.py (reused directly).
"""

from __future__ import annotations

import datetime as dt
import os

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from datalake_breweries_two_spark.entry_queries import ORACLE_SQL, QUERIES

from .test_oracle_parity import _row_multiset

BATTERY = [
    "q_corr_matrix",
    "q_linreg_by_group",
    "q_spearman_corr",
    "q_mad",
    "q_gini",
    "q_benford",
    "q_zipf_slope",
    "q_ks_test",
    "q_chi_square",
    "q_psi",
    "q_event_transitions",
    "q_percent_of_total",
    "q_stats_agg",       # raw corr previously threw ANSI DIVIDE_BY_ZERO here
    "q_token_entropy",   # single-token doc: the -0.0 vs 0.0 rounding case
]

_TS = dt.datetime(2024, 1, 1, 0, 0, 0)


def _write(dir_: str, name: str, schema: pa.Schema, rows: list[tuple]) -> None:
    cols = list(zip(*rows)) if rows else [[] for _ in schema]
    table = pa.Table.from_arrays(
        [pa.array(list(c), type=f.type) for c, f in zip(cols, schema)],
        schema=schema,
    )
    pq.write_table(table, os.path.join(dir_, f"{name}.parquet"))


@pytest.fixture(scope="module")
def edge_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("stat_edges"))
    ts = pa.timestamp("us")

    _write(d, "region", pa.schema([
        ("r_regionkey", pa.int32()), ("r_name", pa.string()),
    ]), [(0, "R0"), (1, "R1")])

    _write(d, "nation", pa.schema([
        ("n_nationkey", pa.int32()), ("n_name", pa.string()),
        ("n_regionkey", pa.int32()),
    ]), [(0, "N0", 0), (1, "N1", 0), (2, "N2", 1)])

    # SV: zero-variance acctbal (linreg slope NULL); SINGLE: one order;
    # ZERO: every order priced 0.0 (gini + region-share NULL)
    _write(d, "customer", pa.schema([
        ("c_custkey", pa.int64()), ("c_name", pa.string()),
        ("c_nationkey", pa.int32()), ("c_acctbal", pa.float64()),
        ("c_mktsegment", pa.string()),
    ]), [
        (1, "c1", 0, 5.0, "SV"),
        (2, "c2", 0, 5.0, "SV"),
        (3, "c3", 1, 1.0, "SINGLE"),
        (4, "c4", 2, 0.0, "ZERO"),
        (5, "c5", 2, 2.0, "ZERO"),
        (6, "c6", 0, 3.0, "EQ"),   # all-equal order values: gini exactly 0,
        (7, "c7", 0, 3.0, "EQ"),   # the -0.0 vs 0.0 rounding trap
    ])

    # ALL status 'F': the 'O' population is entirely absent -> KS NULL,
    # PSI floors every open-bin share
    _write(d, "orders", pa.schema([
        ("o_orderkey", pa.int64()), ("o_custkey", pa.int64()),
        ("o_orderstatus", pa.string()), ("o_totalprice", pa.float64()),
        ("o_orderdate", ts), ("o_orderpriority", pa.string()),
    ]), [
        (1, 1, "F", 100.0, _TS, "1-URGENT"),
        (2, 2, "F", 200.0, _TS, "2-HIGH"),
        (3, 3, "F", 50.0, _TS, "3-MEDIUM"),
        (4, 4, "F", 0.0, _TS, "3-MEDIUM"),
        (5, 5, "F", 0.0, _TS, "3-MEDIUM"),
        (6, 1, "F", 100.0, _TS, "1-URGENT"),
        (7, 6, "F", 100.0, _TS, "2-HIGH"),
        (8, 7, "F", 100.0, _TS, "2-HIGH"),
    ])

    # Z: single-element group; C: constant quantity AND price
    # (zero variance both axes); T: all rows tied on both axes
    _write(d, "lineitem", pa.schema([
        ("l_orderkey", pa.int64()), ("l_partkey", pa.int64()),
        ("l_suppkey", pa.int64()), ("l_linenumber", pa.int32()),
        ("l_quantity", pa.float64()), ("l_extendedprice", pa.float64()),
        ("l_discount", pa.float64()), ("l_tax", pa.float64()),
        ("l_returnflag", pa.string()), ("l_linestatus", pa.string()),
        ("l_shipdate", ts),
    ]), [
        (1, 1, 1, 1, 7.0, 70.0, 0.0, 0.0, "Z", "O", _TS),
        (2, 1, 1, 1, 3.0, 30.0, 0.0, 0.0, "C", "O", _TS),
        (2, 1, 1, 2, 3.0, 30.0, 0.0, 0.0, "C", "O", _TS),
        (2, 1, 1, 3, 3.0, 30.0, 0.0, 0.0, "C", "O", _TS),
        (3, 1, 1, 1, 5.0, 55.0, 0.0, 0.0, "T", "O", _TS),
        (3, 1, 1, 2, 5.0, 55.0, 0.0, 0.0, "T", "O", _TS),
        (3, 1, 1, 3, 5.0, 55.0, 0.0, 0.0, "T", "O", _TS),
        (3, 1, 1, 4, 5.0, 55.0, 0.0, 0.0, "T", "O", _TS),
    ])

    # single event: chi-square's second time-half is empty (expected
    # count 0 -> NULL cell), transitions have no successor pairs
    _write(d, "events", pa.schema([
        ("event_id", pa.int64()), ("ts", ts), ("user_id", pa.int64()),
        ("event_type", pa.string()), ("value", pa.float64()),
        ("props", pa.string()),
    ]), [(1, _TS, 1, "click", 1.0, "{}")])

    # one-token corpus: a single (rank, freq) point -> zipf slope NULL;
    # the repeated-token doc's entropy is exactly 0 (the -0.0 trap);
    # empty and whitespace-only docs must drop cleanly everywhere
    _write(d, "documents", pa.schema([
        ("doc_id", pa.int64()), ("text", pa.string()), ("lang", pa.string()),
        ("source", pa.string()), ("n_chars", pa.int64()),
    ]), [
        (1, "aaa aaa aaa", "en", "web", 11),
        (2, "", "en", "web", 0),
        (3, "   ", "xx", "pdf", 3),
    ])

    return d


def _duck_edge(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "orders", "lineitem",
              "events", "documents"]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


@pytest.mark.parametrize("name", BATTERY)
def test_battery_parity_on_degenerate_lake(spark, edge_dir, name):
    sdf = QUERIES[name](spark, edge_dir)
    spark_cols = sdf.columns
    spark_rows = [tuple(r) for r in sdf.collect()]

    con = _duck_edge(edge_dir)
    try:
        res = con.execute(ORACLE_SQL[name])
        duck_cols = [dsc[0] for dsc in res.description]
        duck_rows = res.fetchall()
    finally:
        con.close()

    assert sorted(spark_cols) == sorted(duck_cols)
    assert len(spark_rows) == len(duck_rows), (
        f"{name}: row count spark={len(spark_rows)} duck={len(duck_rows)}"
    )
    sm = _row_multiset(spark_rows, spark_cols)
    dm = _row_multiset(duck_rows, duck_cols)
    if sm != dm:
        diffs = [(a, b) for a, b in zip(sm, dm) if a != b][:5]
        raise AssertionError(f"{name}: value mismatch, first diffs: {diffs}")


def test_degenerate_results_are_null_not_crash(spark, edge_dir):
    """The shape guarantees, stated directly: degenerate statistics are
    NULL (never an ANSI exception, never ±Infinity)."""
    import math

    corr = {r["l_returnflag"]: r["corr_l_quantity_l_extendedprice"]
            for r in QUERIES["q_corr_matrix"](spark, edge_dir).collect()}
    assert corr["Z"] is None and corr["C"] is None and corr["T"] is None

    slopes = {r["c_mktsegment"]: r["slope"]
              for r in QUERIES["q_linreg_by_group"](spark, edge_dir).collect()}
    assert slopes["SV"] is None and slopes["SINGLE"] is None

    gini = {r["c_mktsegment"]: r["gini"]
            for r in QUERIES["q_gini"](spark, edge_dir).collect()}
    assert gini["ZERO"] is None
    # all-equal distribution: exactly +0.0, never IEEE negative zero
    assert gini["EQ"] == 0.0 and repr(gini["EQ"]) != "-0.0"

    ent = {r["doc_id"]: r["entropy_nats"]
           for r in QUERIES["q_token_entropy"](spark, edge_dir).collect()}
    assert set(ent) == {1}          # empty/whitespace docs dropped
    assert ent[1] == 0.0 and repr(ent[1]) != "-0.0"

    ks = QUERIES["q_ks_test"](spark, edge_dir).collect()[0]
    assert ks["ks_stat"] is None and ks["n_b"] == 0

    chi = QUERIES["q_chi_square"](spark, edge_dir).collect()[0]
    assert chi["chi2"] is None and chi["dof"] == 0

    zipf = QUERIES["q_zipf_slope"](spark, edge_dir).collect()[0]
    assert zipf["zipf_slope"] is None and zipf["vocab_size"] == 1

    psi = QUERIES["q_psi"](spark, edge_dir).collect()[0]
    assert psi["psi"] is not None and math.isfinite(psi["psi"])

    assert QUERIES["q_event_transitions"](spark, edge_dir).count() == 0

    shares = {(r["r_name"], r["n_name"]): r["region_share"]
              for r in QUERIES["q_percent_of_total"](spark, edge_dir).collect()}
    assert shares[("R1", "N2")] is None
