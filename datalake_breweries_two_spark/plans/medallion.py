"""Medallion pipeline: Bronze → Silver → (quality gate) → Gold.

The reference orchestrates this as five Airflow tasks with XCom handoffs,
three cold SparkSessions, and a full recompute of the gold aggregate for
its second sink (reference ``dags/dag-brewery_pipeline.py:103-119``;
SURVEY.md §3). This engine runs the same dataflow as one Spark application:

  * lake-path handoffs between stages (no XCom / driver round-trips);
  * ONE shared session;
  * ``persist()`` before multi-sink fan-out so gold is computed once
    (the reference recomputes at ``plugins/brewery_operators.py:328`` vs
    ``:387``);
  * the quality gate blocks gold exactly like the reference's task
    dependency (raise → downstream never runs).

The pipeline is generic over the domain: `MedallionConfig` carries the
curate/aggregate functions, so the brewery pipeline and lake-table test
pipelines are the same code.
"""

from __future__ import annotations

import os
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from datalake_breweries_two_spark.operators.quality import QualityReport, run_quality_gate
from datalake_breweries_two_spark.sources import lake


@dataclass
class MedallionConfig:
    base_dir: str                                   # lake root (bronze/silver/gold subdirs)
    bronze_schema: T.StructType
    curate: Callable[[DataFrame], DataFrame]        # bronze df -> silver df
    aggregate: Callable[[DataFrame], DataFrame]     # silver df -> gold df
    silver_partition_by: list[str] = field(default_factory=list)
    critical_columns: list[str] = field(default_factory=list)
    min_rows: int = 100


@dataclass
class MedallionResult:
    silver_path: str
    gold_path: str
    quality: QualityReport
    gold_rows: int
    plan_findings: list = field(default_factory=list)  # advisor warnings (non-fatal)


class QualityGateError(RuntimeError):
    """Raised when the silver layer violates its contract — blocks gold,
    mirroring the reference's ValueError → failed-task behavior
    (``plugins/data_quality_operator.py:62,66,71``)."""


def run_medallion(
    spark: SparkSession, cfg: MedallionConfig, bronze_json_dir: str
) -> MedallionResult:
    """Execute the full pipeline from a bronze JSON-lines directory."""
    silver_path = os.path.join(cfg.base_dir, "silver")
    gold_path = os.path.join(cfg.base_dir, "gold")

    # Bronze → Silver: explicit-schema scan (no inference pass) → curation
    # projection → partitioned parquet.
    bronze = lake.read_json(spark, bronze_json_dir, cfg.bronze_schema)
    silver = cfg.curate(bronze)
    lake.write_parquet(silver, silver_path, partition_by=cfg.silver_partition_by or None)

    # Quality gate on the *written* silver (same read-back the reference
    # does) — single-pass aggregate instead of one job per check.
    silver_back = lake.read_parquet(spark, silver_path)
    report = run_quality_gate(silver_back, cfg.critical_columns, cfg.min_rows)
    if not report.passed:
        raise QualityGateError("; ".join(report.failures))

    # Silver → Gold: aggregate once, persist, fan out to sinks. The row
    # count rides the write action itself via observe() — no second pass
    # over gold for metrics (the reference pays a separate job for every
    # count it reports; at 100 TB observability must be free).
    from pyspark.sql import Observation
    from pyspark.sql import functions as F

    obs = Observation("gold_metrics")
    gold_plan = cfg.aggregate(silver_back)

    # Pre-flight plan audit (plans/advisor.py) BEFORE any action runs:
    # error-level findings (a row-at-a-time Python UDF smuggled in via a
    # user-supplied aggregate fn) abort the pipeline; warnings ride along
    # in the result for the operator's log. At 100 TB the cheapest moment
    # to catch a de-vectorized plan is before its first task launches.
    from datalake_breweries_two_spark.plans.advisor import PlanAuditError, audit_plan

    findings = audit_plan(gold_plan)
    errors = [f for f in findings if f.severity == "error"]
    if errors:
        raise PlanAuditError(errors)

    gold = gold_plan.observe(
        obs, F.count(F.lit(1)).alias("rows")
    ).persist()
    try:
        lake.write_parquet(gold, gold_path)
        gold_rows = int(obs.get["rows"])
        # JDBC serving sink would fan out here from the SAME persisted df
        # (sources.jdbc.write_jdbc) — optional, external system.
    finally:
        gold.unpersist()

    return MedallionResult(
        silver_path=silver_path,
        gold_path=gold_path,
        quality=report,
        gold_rows=gold_rows,
        plan_findings=findings,
    )
