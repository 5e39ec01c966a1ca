"""End-to-end medallion pipeline tests on brewery-shaped data (the
reference's own domain: bronze JSON → silver curation → quality gate →
gold aggregate; reference dags/dag-brewery_pipeline.py:103-119)."""

from __future__ import annotations

import json
import os

import pytest

from datalake_breweries_two_spark.catalog import BRONZE_BREWERY_SCHEMA
from datalake_breweries_two_spark.operators.aggregates import group_count
from datalake_breweries_two_spark.operators.projection import curate_silver_breweries
from .conftest import SF_SMOKE
from datalake_breweries_two_spark.plans.medallion import (
    MedallionConfig,
    QualityGateError,
    run_medallion,
)

N_ROWS = 120


def _write_bronze(tmp_path, n=N_ROWS, break_quality=False):
    bronze_dir = str(tmp_path / "bronze")
    os.makedirs(bronze_dir, exist_ok=True)
    rows = []
    for i in range(n):
        rows.append(
            {
                "id": "" if (break_quality and i < 5) else f"b{i:04d}",
                "name": f"  Brewery {i} ",
                "brewery_type": ["Micro", "NANO", "brewpub"][i % 3],
                "address_1": f"{i} Main St",
                "address_2": None if i % 2 else "Suite 2",
                "address_3": None,
                "city": f" City{i % 7} ",
                "state_province": f"State{i % 5}",
                "country": "United States",
                "longitude": str(-120.0 + i * 0.01),
                "latitude": str(40.0 + i * 0.01),
            }
        )
    with open(os.path.join(bronze_dir, "part-0.json"), "w") as f:
        f.write("\n".join(json.dumps(r) for r in rows))
    return bronze_dir


def _config(tmp_path):
    return MedallionConfig(
        base_dir=str(tmp_path / "lake"),
        bronze_schema=BRONZE_BREWERY_SCHEMA,
        curate=curate_silver_breweries,
        aggregate=lambda df: group_count(
            df, ["brewery_type", "state"], "id", "brewery_count"
        ),
        silver_partition_by=["state"],
        critical_columns=["id", "brewery_name", "brewery_type"],
        min_rows=100,
    )


def test_medallion_end_to_end(spark, tmp_path):
    bronze_dir = _write_bronze(tmp_path)
    result = run_medallion(spark, _config(tmp_path), bronze_dir)

    assert result.quality.passed
    assert result.quality.total_rows == N_ROWS
    assert result.gold_rows == 3 * 5  # types × states

    silver = spark.read.parquet(result.silver_path)
    # curation semantics: trim, lower, null-skipping concat_ws, double casts
    row = silver.filter(silver.id == "b0001").first()
    assert row["brewery_name"] == "Brewery 1"
    assert row["brewery_type"] in ("micro", "nano", "brewpub")
    assert ", Suite 2" not in row["full_address"] or row["full_address"].count(",") == 1
    assert isinstance(row["longitude"], float)
    # partitioned layout: hive-style state dirs exist
    assert any(d.startswith("state=") for d in os.listdir(result.silver_path))

    gold = spark.read.parquet(result.gold_path)
    assert gold.columns == ["brewery_type", "state", "brewery_count"]
    assert gold.agg({"brewery_count": "sum"}).first()[0] == N_ROWS


def test_quality_gate_blocks_gold(spark, tmp_path):
    bronze_dir = _write_bronze(tmp_path, break_quality=True)
    cfg = _config(tmp_path)
    with pytest.raises(QualityGateError, match="id"):
        run_medallion(spark, cfg, bronze_dir)
    assert not os.path.exists(os.path.join(cfg.base_dir, "gold"))


def test_quality_gate_min_rows(spark, tmp_path):
    bronze_dir = _write_bronze(tmp_path, n=50)
    with pytest.raises(QualityGateError, match="row count"):
        run_medallion(spark, _config(tmp_path), bronze_dir)


def test_readme_counts_match_registry():
    """README's query/oracle counts must track the live registry — the
    contract doc may never drift from what the driver enumerates."""
    import re

    import __spark_entry__ as e

    n_q, n_o = len(e.queries()), len(e.oracle_sql())
    readme = open(os.path.join(os.path.dirname(__file__), "..", "README.md")).read()
    claims = re.findall(r"(\d+) (?:declared )?queries", readme)
    assert claims and all(int(c) == n_q for c in claims), (claims, n_q)
    m = re.search(r"(\d+) with a\s+DuckDB oracle", readme)
    assert m and int(m.group(1)) == n_o, (m, n_o)


def test_spark_entry_adapter_contract(spark):
    """The driver-facing adapter must (a) smoke-run entry(), (b) expose
    every registry query exactly once through the rotation (no drops, no
    dups), and (c) only declare oracles for registered queries."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "spark_entry_contract", "/root/repo/__spark_entry__.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    from datalake_breweries_two_spark.entry_queries import ORACLE_SQL, QUERIES

    q = mod.queries()
    assert set(q) == set(QUERIES), "rotation dropped or invented queries"
    assert list(q) != [], "empty registry"
    o = mod.oracle_sql()
    assert set(o) == set(ORACLE_SQL)
    assert set(o) <= set(q), "oracle declared for unregistered query"

    # rotation ORDER: the driver snapshots a bounded prefix, so every
    # not-yet-driver-checked query must sort before anything already
    # checked, and the priority rows-only interleave must land INSIDE
    # the prefix (so rows-only entries are not starved forever behind a
    # >prefix-sized oracle-backed backlog)
    import glob
    import json

    checked: set = set()
    for path in glob.glob("/root/repo/CORRECTNESS_r*.json"):
        checked.update(json.load(open(path)))

    names = list(q)
    unchecked_flags = [n not in checked for n in names]
    assert unchecked_flags == sorted(unchecked_flags, reverse=True), (
        "rotation must front-load ALL not-yet-driver-checked queries"
    )
    prefix = names[: mod._DRIVER_PREFIX]
    for rows_only_name in mod._ROWS_ONLY_INTERLEAVE:
        if rows_only_name in checked or rows_only_name not in set(names):
            continue
        assert rows_only_name in prefix, (
            f"{rows_only_name}: priority rows-only entry fell out of the "
            "driver prefix"
        )
    # and the prefix never wastes a slot on an already-checked query
    # while unchecked ones remain
    n_unchecked = sum(unchecked_flags)
    for name in prefix[: min(len(prefix), n_unchecked)]:
        assert name not in checked

    # failed-then-fixed queries (latest driver record is a FAIL) must be
    # pinned for RE-check: inside the prefix (when it has room after the
    # unchecked block) and ahead of every passing checked query
    status = mod._driver_status()
    rechecks = [n for n in names if n in checked and mod._is_fail(status[n])]
    if rechecks and n_unchecked + len(rechecks) <= mod._DRIVER_PREFIX:
        for name in rechecks:
            assert name in prefix, (
                f"{name}: failed query fell out of the re-check prefix"
            )
    first_pass_idx = next(
        (
            i
            for i, n in enumerate(names)
            if n in checked and not mod._is_fail(status[n])
        ),
        len(names),
    )
    for name in rechecks:
        assert names.index(name) < first_pass_idx, (
            f"{name}: failed query sorted behind a passing one"
        )

    flagship = mod.entry(spark)
    assert flagship.count() >= 0
    assert len(flagship.columns) >= 2


def test_medallion_plan_gate_blocks_row_python(spark, tmp_path):
    """A user-supplied aggregate that smuggles in a row-at-a-time Python
    UDF must abort the pipeline BEFORE the gold write (error-level advisor
    finding); the clean pipeline reports zero error findings."""
    import json as _json

    from pyspark.sql import functions as F
    from pyspark.sql.functions import udf

    from datalake_breweries_two_spark.catalog import BRONZE_BREWERY_SCHEMA
    from datalake_breweries_two_spark.plans.advisor import PlanAuditError
    from datalake_breweries_two_spark.plans.medallion import (
        MedallionConfig,
        run_medallion,
    )

    bronze_dir = str(tmp_path / "bronze")
    os.makedirs(bronze_dir)
    rows = [
        {"id": str(i), "name": f"b{i}", "brewery_type": "micro",
         "address_1": "x", "address_2": None, "address_3": None,
         "city": "c", "state_province": "s", "country": "US",
         "longitude": "1.0", "latitude": "2.0"}
        for i in range(150)
    ]
    with open(os.path.join(bronze_dir, "page0.json"), "w") as f:
        for r in rows:
            f.write(_json.dumps(r) + "\n")

    bad = udf(lambda s: (s or "").upper())

    def curate(df):
        return df.select("id", "name", "brewery_type")

    def bad_aggregate(df):
        return df.groupBy(bad(F.col("brewery_type")).alias("t")).count()

    cfg = MedallionConfig(
        base_dir=str(tmp_path / "lake"),
        bronze_schema=BRONZE_BREWERY_SCHEMA,
        curate=curate,
        aggregate=bad_aggregate,
        critical_columns=["id", "name"],
        min_rows=100,
    )
    with pytest.raises(PlanAuditError):
        run_medallion(spark, cfg, bronze_dir)
    # gold must NOT have been written
    assert not os.path.exists(os.path.join(str(tmp_path / "lake"), "gold"))

    def good_aggregate(df):
        return df.groupBy("brewery_type").count()

    cfg2 = MedallionConfig(
        base_dir=str(tmp_path / "lake2"),
        bronze_schema=BRONZE_BREWERY_SCHEMA,
        curate=curate,
        aggregate=good_aggregate,
        critical_columns=["id", "name"],
        min_rows=100,
    )
    res = run_medallion(spark, cfg2, bronze_dir)
    assert res.gold_rows == 1
    assert [f for f in res.plan_findings if f.severity == "error"] == []


def test_cli_surface(spark, tmp_path):
    """The CLI verbs must work in-process: list-queries covers the full
    registry, run-medallion executes the brewery pipeline end-to-end, and
    audit-query returns exit 0 on a clean plan. (spark fixture keeps the
    JVM warm; the CLI builds/stops its own session via the shared
    factory, which getOrCreate()-reuses this one.)"""
    import io
    import json as _json
    from contextlib import redirect_stderr, redirect_stdout

    from datalake_breweries_two_spark.__main__ import main
    from datalake_breweries_two_spark.entry_queries import QUERIES

    out = io.StringIO()
    with redirect_stdout(out):
        assert main(["list-queries"]) == 0
    listed = dict(
        line.split("\t") for line in out.getvalue().strip().splitlines()
    )
    assert set(listed) == set(QUERIES)

    bronze_dir = str(tmp_path / "bronze")
    os.makedirs(bronze_dir)
    rows = [
        {"id": str(i), "name": f"b{i}", "brewery_type": ["micro", "nano"][i % 2],
         "address_1": "x", "address_2": None, "address_3": None,
         "city": "c", "state_province": "s", "country": "US",
         "longitude": "1.0", "latitude": "2.0"}
        for i in range(120)
    ]
    with open(os.path.join(bronze_dir, "page0.json"), "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    out = io.StringIO()
    with redirect_stdout(out):
        rc = main([
            "run-medallion", "--bronze-dir", bronze_dir,
            "--base-dir", str(tmp_path / "lake"),
        ])
    assert rc == 0
    res = _json.loads(out.getvalue())
    assert res["quality_passed"] is True and res["gold_rows"] == 2

    out, err = io.StringIO(), io.StringIO()
    with redirect_stdout(out), redirect_stderr(err):
        rc = main(["audit-query", "q_topk", "--sf-dir", SF_SMOKE])
    assert rc == 0


def test_bench_noise_canary_shape(spark):
    """The r16 noise canary must produce the machine-readable
    host-condition stamp BENCH_DETAIL.json promises: all documented keys,
    n_runs samples, index = median/ref, and a positive ref constant (the
    job is engine-independent, so only the shape is assertable here)."""
    import bench

    assert 0 < bench.CANARY_REF_END_SEC < bench.CANARY_REF_START_SEC
    c = bench._noise_canary(
        spark, cpus=4, ref_sec=bench.CANARY_REF_START_SEC, n_runs=3
    )
    assert sorted(c) == [
        "cpus", "max_index", "max_sec", "median_sec", "noise_index",
        "ref_sec", "runs",
    ]
    assert c["cpus"] == 4
    assert len(c["runs"]) == 3 and all(s > 0 for s in c["runs"])
    assert c["ref_sec"] == bench.CANARY_REF_START_SEC
    assert c["noise_index"] == round(c["median_sec"] / c["ref_sec"], 3)
    assert c["max_sec"] == max(c["runs"]) and c["max_index"] >= c["noise_index"]


def test_bench_reference_covers_headline():
    """Every bench HEADLINE query needs a ref entry — a missing entry
    silently falls back to the 0.3 s floor, making the stall detector
    retry slow-by-design queries on every run. r16 (r15 ADVICE): the ref
    lives in exactly ONE of QUIET_HOST_REF_SEC (protocol-context numbers)
    or PROVISIONAL_REF_SEC (cold standalone floors awaiting protocol
    contact) — disjointness makes 'sized off a cold floor' a visible,
    greppable state instead of a comment-only convention, and promotion
    a deliberate move."""
    import bench

    confirmed, provisional = bench.QUIET_HOST_REF_SEC, bench.PROVISIONAL_REF_SEC
    both = sorted(set(confirmed) & set(provisional))
    assert not both, f"refs present in BOTH confirmed and provisional: {both}"
    missing = [
        n for n in bench.HEADLINE if n not in confirmed and n not in provisional
    ]
    assert not missing, f"headline queries without a quiet-host ref: {missing}"
    stale = [
        n
        for n in list(confirmed) + list(provisional)
        if n not in bench.HEADLINE
    ]
    assert not stale, f"refs for queries no longer in headline: {stale}"


def test_cli_audit_accounting_matches_artifacts(capsys):
    """The `audit` verb must enumerate the registry exactly once, derive
    statuses only from CORRECTNESS_r*.json evidence, and exit 0 while no
    driver failure exists on disk."""
    import json as _json

    from datalake_breweries_two_spark.__main__ import main

    rc = main(["audit", "--repo-dir", os.path.join(os.path.dirname(__file__), "..")])
    out = capsys.readouterr()
    assert rc == 0
    rows = [l for l in out.out.splitlines() if l.startswith("| q_")]
    import __spark_entry__ as e

    assert len(rows) == len(e.queries())
    summary = _json.loads(out.err.strip().splitlines()[-1])
    assert summary["registry"] == len(e.queries())
    assert summary["with_oracle"] == len(e.oracle_sql())
    # tripwire: any UNWAIVED driver failure (or a regression of a
    # previously-passing query) must turn the suite red; a failure whose
    # fix landed and is documented in WAIVERS.json is tolerated until the
    # driver's re-check round replaces the evidence
    assert summary["driver_fail"] == summary["driver_fail_waived"], (
        "unwaived driver failures on disk — fix them or document the "
        "pending fix in WAIVERS.json"
    )
    assert summary["regressed"] == []
    assert (
        summary["driver_pass"]
        + summary["driver_rows_only_run"]
        + summary["driver_fail"]
        + summary["local_only"]
        == summary["registry"]
    )
