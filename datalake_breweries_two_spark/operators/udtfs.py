"""Python UDTFs (user-defined table functions) — the Spark-4 LATERAL
extension point: one input row → many output rows, planned as an
Arrow-batched ``ArrowEvalPythonUDTF`` node inside the scan stage.

The reference has no table functions (its only Python runs driver-side in
Airflow operators, ``plugins/brewery_operators.py:25-58``); this module
exists to cover the API surface a pipeline author reaches for when a
cardinality-changing transform doesn't fit ``explode``/higher-order
functions. The shipped example is token-window chunking — same contract a
training-data pipeline needs for context-length packing.

Scale profile: the UDTF is a narrow per-row expansion (no shuffle, no
state); Arrow batching (``useArrow=True``) keeps the Python boundary
columnar. For chunking specifically the pure-DataFrame implementation
(``operators/text.py:chunk_documents``) stays the default — this is the
extension-point twin, oracle-checked to the same exact semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.functions import udtf


@udtf(returnType="chunk_idx int, n_tokens int, chunk_text string", useArrow=True)
class ChunkTokens:
    """Emit overlapping token windows: step = size - overlap, last window
    may be short. Deterministic pure function of the text."""

    def eval(self, text: str, size: int, overlap: int):  # noqa: D102
        if text is None:
            return
        step = size - overlap
        if step <= 0:
            raise ValueError(f"overlap {overlap} must be < size {size}")
        tokens = text.split(" ")
        n = len(tokens)
        idx = 0
        for start in range(0, n, step):
            window = tokens[start : start + size]
            yield idx, len(window), " ".join(window)
            idx += 1


def chunk_documents_udtf(
    spark: SparkSession, docs: DataFrame, size: int = 32, overlap: int = 8
) -> DataFrame:
    """LATERAL-join every document against the chunking UDTF."""
    spark.udtf.register("chunk_tokens", ChunkTokens)
    docs.createOrReplaceTempView("__udtf_docs")
    return spark.sql(
        f"""
        SELECT d.doc_id, c.chunk_idx, c.n_tokens, c.chunk_text
        FROM __udtf_docs d, LATERAL chunk_tokens(d.text, {int(size)}, {int(overlap)}) c
        """
    )
