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
    connection (e.g. ``lambda: psycopg2.connect(...)``) — injected so tests
    mock it and no DB driver is imported here. The identifier is validated
    (the reference interpolates it raw into SQL)."""
    if not schema_name.replace("_", "").isalnum() or not schema_name[:1].isalpha():
        raise ValueError(f"invalid schema identifier: {schema_name!r}")
    conn = connect()
    try:
        if hasattr(conn, "set_session"):  # psycopg2: DDL outside a txn block
            conn.set_session(autocommit=True)
        cur = conn.cursor()
        try:
            cur.execute(f"CREATE SCHEMA IF NOT EXISTS {schema_name};")
            if not getattr(conn, "autocommit", False):
                conn.commit()
        finally:
            cur.close()
    finally:
        conn.close()


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
