"""Paginated HTTP API ingestion (reference S1).

The reference loops ``page``/``per_page=50`` GETs on the DRIVER and ships
the accumulated list through Airflow XCom (reference
``plugins/brewery_operators.py:25-58``; the XCom handoff is the scalability
anti-pattern flagged in SURVEY.md §3). Here:

  * small APIs (the reference's ~9k-row case): driver-side fetch →
    ``spark.createDataFrame(rows, schema)`` — correct and simplest;
  * scale path: ``fetch_paginated_distributed`` partitions the page range
    across executors with ``mapInPandas`` over ``spark.range`` so N
    executors fetch N pages concurrently and rows land directly in
    executors — the driver never holds the payload.

``requests`` is imported lazily and the fetch function is injectable so
tests run without network.
"""

from __future__ import annotations

import json
from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def _default_fetch(url: str, page: int, per_page: int) -> list[dict]:
    import requests  # lazy: not needed in tests

    resp = requests.get(url, params={"page": page, "per_page": per_page}, timeout=30)
    resp.raise_for_status()
    return resp.json()


def fetch_paginated_driver(
    spark: SparkSession,
    url: str,
    schema: T.StructType,
    per_page: int = 50,
    max_pages: int = 10_000,
    fetch: Callable[[str, int, int], list[dict]] = _default_fetch,
) -> DataFrame:
    """Reference-parity ingest: loop pages until a short page, accumulate,
    one ``createDataFrame`` (reference ``plugins/brewery_operators.py:36-56``
    semantics: stop when a page returns < per_page rows)."""
    rows: list[dict] = []
    for page in range(1, max_pages + 1):
        batch = fetch(url, page, per_page)
        rows.extend(batch)
        if len(batch) < per_page:
            break
    field_names = [f.name for f in schema.fields]
    data = [tuple(r.get(k) for k in field_names) for r in rows]
    return spark.createDataFrame(data, schema)


def fetch_paginated_distributed(
    spark: SparkSession,
    url: str,
    schema: T.StructType,
    n_pages: int,
    per_page: int = 50,
    fetch: Callable[[str, int, int], list[dict]] = _default_fetch,
) -> DataFrame:
    """Scale path: page ranges fan out across executors.

    ``spark.range(n_pages)`` → ``mapInPandas`` where each batch fetches its
    pages and yields rows. Requires a known page count (HEAD request or a
    count endpoint); per-task retries come free from Spark task retry.
    """
    field_names = [f.name for f in schema.fields]

    def fetch_pages(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out: list[dict] = []
            for page in pdf["id"].tolist():
                for r in fetch(url, int(page) + 1, per_page):
                    out.append({k: r.get(k) for k in field_names})
            yield pd.DataFrame(out, columns=field_names)

    return spark.range(n_pages).mapInPandas(fetch_pages, schema)


def check_api_health(
    url: str,
    timeout: float = 30.0,
    get: Callable[[str, float], int] | None = None,
) -> bool:
    """API health probe (reference O1): one GET, healthy iff HTTP 200 —
    the reference's ``HttpSensor`` ``response_check`` (reference
    ``dags/dag-brewery_pipeline.py:52-62``). Run it as the pipeline
    prologue; retry/backoff policy belongs to the orchestrator (the
    reference pokes every 10 s), not this probe. ``get`` is injectable so
    tests run without network."""
    if get is None:
        def get(u: str, t: float) -> int:
            import requests  # lazy: not needed in tests

            return requests.get(u, timeout=t).status_code

    try:
        return get(url, timeout) == 200
    except Exception:
        return False


def to_bronze_json_lines(rows: list[dict]) -> str:
    """Serialize an ingest batch as JSON-lines (one object per line) — the
    distributed-friendly bronze format (vs the reference's single JSON array
    blob at ``plugins/brewery_operators.py:117-123``, which only one reader
    task can split)."""
    return "\n".join(json.dumps(r, sort_keys=True) for r in rows)
