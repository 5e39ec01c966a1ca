"""JDBC serving sink (reference K4/K5) — optional, config-driven.

The reference overwrites ``gold_layer.brewery_summary`` in Postgres via the
Spark JDBC writer and issues ``CREATE SCHEMA`` through psycopg2 first
(reference ``plugins/brewery_operators.py:335-356,381-389``). No database
exists in this environment, so the sink is a thin, testable wrapper that is
exercised with a no-op/driver-mock in tests and documents the scale knobs.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame


@dataclass
class JdbcConfig:
    url: str                      # e.g. jdbc:postgresql://host:5432/db
    table: str                    # e.g. gold_layer.brewery_summary
    user: str
    password: str
    driver: str = "org.postgresql.Driver"
    mode: str = "overwrite"
    # Scale knobs (reference sets none of these; defaults are single-task
    # writes + 1000-row batches — a bottleneck for big serving tables):
    num_partitions: int = 8       # parallel INSERT connections
    batch_size: int = 10_000      # rows per executemany


def ensure_schema(
    schema_name: str,
    connect: Callable[[], object],
) -> None:
    """DDL side-channel (reference K5): ``CREATE SCHEMA IF NOT EXISTS``
    issued over a plain DB-API connection BEFORE the Spark JDBC write —
    Spark's JDBC writer creates tables but cannot emit schema DDL
    (reference ``plugins/brewery_operators.py:335-356`` does this with
    psycopg2). ``connect`` is a zero-arg factory returning a DB-API
    connection (e.g. ``lambda: psycopg2.connect(...)`` or
    :func:`jvm_jdbc_connect` for JDBC-only environments) — injected so
    tests mock it and no DB driver is imported here. The identifier is
    validated (the reference interpolates it raw into SQL). Dialects
    without ``IF NOT EXISTS`` on CREATE SCHEMA (Derby) fall back to the
    plain statement, tolerating an already-existing schema."""
    if not schema_name.replace("_", "").isalnum() or not schema_name[:1].isalpha():
        raise ValueError(f"invalid schema identifier: {schema_name!r}")
    conn = connect()
    try:
        if hasattr(conn, "set_session"):  # psycopg2: DDL outside a txn block
            conn.set_session(autocommit=True)
        cur = conn.cursor()
        try:
            try:
                cur.execute(f"CREATE SCHEMA IF NOT EXISTS {schema_name};")
            except Exception:
                try:
                    cur.execute(f"CREATE SCHEMA {schema_name}")
                except Exception as exc:
                    if "exist" not in str(exc).lower():  # X0Y68 et al.
                        raise
            if not getattr(conn, "autocommit", False):
                conn.commit()
        finally:
            cur.close()
    finally:
        conn.close()


class _JvmJdbcCursor:
    def __init__(self, jstmt: object) -> None:
        self._j = jstmt

    def execute(self, sql: str) -> None:
        self._j.execute(sql)

    def close(self) -> None:
        self._j.close()


class _JvmJdbcConnection:
    """Minimal DB-API-shaped adapter over a ``java.sql.Connection``.

    Exposes exactly the surface :func:`ensure_schema` consumes
    (``cursor()``/``execute``/``commit``/``close``), letting the DDL
    side-channel run against any JDBC driver already on Spark's classpath
    — no Python DB package needed. ``java.sql`` connections default to
    auto-commit, mirrored here so ``ensure_schema`` skips the explicit
    commit."""

    autocommit = True

    def __init__(self, jconn: object) -> None:
        self._j = jconn

    def cursor(self) -> _JvmJdbcCursor:
        return _JvmJdbcCursor(self._j.createStatement())

    def commit(self) -> None:
        if not self._j.getAutoCommit():
            self._j.commit()

    def close(self) -> None:
        self._j.close()


def jvm_jdbc_connect(spark: object, url: str) -> Callable[[], _JvmJdbcConnection]:
    """Zero-arg connection factory for :func:`ensure_schema` backed by the
    session JVM's ``DriverManager`` — the in-process integration path (the
    test suite drives it against the embedded Derby shipped in Spark's
    jars as the stand-in for the reference's Postgres)."""

    def connect() -> _JvmJdbcConnection:
        jvm = spark._jvm  # noqa: SLF001 — py4j bridge, no public accessor
        return _JvmJdbcConnection(jvm.java.sql.DriverManager.getConnection(url))

    return connect


def write_jdbc(df: DataFrame, cfg: JdbcConfig) -> None:
    """Partition-parallel JDBC write (reference K4 with the scale knobs set).

    Schema DDL (reference K5) goes through :func:`ensure_schema` first —
    Spark's JDBC writer cannot emit it.
    """
    (
        df.repartition(cfg.num_partitions)
        .write.format("jdbc")
        .option("url", cfg.url)
        .option("dbtable", cfg.table)
        .option("user", cfg.user)
        .option("password", cfg.password)
        .option("driver", cfg.driver)
        .option("numPartitions", str(cfg.num_partitions))
        .option("batchsize", str(cfg.batch_size))
        .mode(cfg.mode)
        .save()
    )
