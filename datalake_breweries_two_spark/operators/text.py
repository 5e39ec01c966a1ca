"""Text-analysis operators for LLM training-data pipelines.

Language ID (n-gram heuristic), quality scoring (length/punct/stopword
ratios), token counting (whitespace + BPE-ish regex), and document
fingerprinting. All are narrow JVM-side expressions (regex/split/hash) —
no Python in the hot path — so at 100 TB the cost is the scan itself.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Tiny per-language stopword marker lists for the n-gram/stopword heuristic
# language ID. Deliberately small: the point is the Spark-side scoring
# pattern (score per language = marker hit count, argmax via greatest), not
# linguistic accuracy.
_LANG_MARKERS: dict[str, list[str]] = {
    "en": [" the ", " and ", " of ", " to ", " is "],
    "es": [" el ", " la ", " de ", " que ", " los "],
    "de": [" der ", " die ", " und ", " das ", " ist "],
    "fr": [" le ", " la ", " et ", " les ", " des "],
}


def whitespace_token_count(col: str) -> Column:
    """Token count by whitespace split (empty string → 0 tokens)."""
    trimmed = F.trim(F.col(col))
    return F.when(trimmed == "", F.lit(0)).otherwise(
        F.size(F.split(trimmed, r"\s+"))
    )


def bpe_ish_token_count(col: str) -> Column:
    """BPE-ish token estimate: count word pieces + digits + punctuation runs
    via regex extraction — a cheap proxy for tokenizer counts at scale."""
    return F.size(
        F.regexp_extract_all(F.col(col), F.lit(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"), F.lit(0))
    )


def text_quality_features(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Quality-scoring features per document: length, token count, mean token
    length, punctuation ratio, stopword ratio, uppercase ratio.

    These are the standard cheap filters (C4/Gopher-style) used to drop
    boilerplate and garbage before expensive dedup at 100 TB.
    """
    t = F.col(text_col)
    n_chars = F.length(t)
    n_tokens = whitespace_token_count(text_col)
    n_punct = F.length(F.regexp_replace(t, r"[^.,;:!?]", ""))
    n_upper = F.length(F.regexp_replace(t, r"[^A-Z]", ""))
    n_stop = F.size(
        F.regexp_extract_all(
            F.lower(t), F.lit(r"\b(the|and|of|to|is|a|in|that|it|for)\b"), F.lit(0)
        )
    )
    return docs.select(
        "*",
        n_chars.alias("len_chars"),
        n_tokens.alias("n_tokens"),
        F.round(n_chars / F.greatest(n_tokens, F.lit(1)), 4).alias("mean_token_len"),
        F.round(n_punct / F.greatest(n_chars, F.lit(1)), 4).alias("punct_ratio"),
        F.round(n_stop / F.greatest(n_tokens, F.lit(1)), 4).alias("stopword_ratio"),
        F.round(n_upper / F.greatest(n_chars, F.lit(1)), 4).alias("upper_ratio"),
    )


def language_id_heuristic(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Marker-based language ID: score = stopword-marker hits per language,
    argmax with deterministic tie-break on language code; 'und' when no
    marker hits. Pure expression tree → codegen, no UDF."""
    padded = F.concat(F.lit(" "), F.lower(F.col(text_col)), F.lit(" "))
    scores = [
        F.struct(
            sum(
                (F.length(padded) - F.length(F.replace(padded, F.lit(m), F.lit(""))))
                / len(m)
                for m in markers
            ).cast("int").alias("score"),
            F.lit(lang).alias("lang"),
        )
        for lang, markers in sorted(_LANG_MARKERS.items())
    ]
    best = F.greatest(*scores) if len(scores) > 1 else scores[0]
    return docs.select(
        "*",
        F.when(best["score"] > 0, best["lang"]).otherwise(F.lit("und")).alias(
            "pred_lang"
        ),
        best["score"].alias("lang_score"),
    )


def fingerprint_md5(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Content fingerprint: md5 hex of the text + a 16-bucket shard key from
    the fingerprint prefix (layout key for fingerprint-partitioned storage)."""
    fp = F.md5(F.col(text_col))
    return docs.select(
        "*",
        fp.alias("fingerprint"),
        F.conv(F.substring(fp, 1, 1), 16, 10).cast("int").alias("fp_bucket"),
    )


def rolling_hash_fingerprint(docs: DataFrame, text_col: str = "text", window: int = 16) -> DataFrame:
    """Winnowing-style robust fingerprint: min xxhash64 over character
    shingles of length ``window`` — stable under small edits, unlike md5.
    JVM-side: sequence → transform(substring) → array_min of hashes."""
    t = F.col(text_col)
    idx = F.sequence(F.lit(1), F.greatest(F.length(t) - window + 1, F.lit(1)))
    shingle_hashes = F.transform(idx, lambda i: F.xxhash64(t.substr(i, F.lit(window))))
    return docs.select(
        "*",
        F.array_min(shingle_hashes).alias("robust_fingerprint"),
    )


def text_stats_by_lang(docs: DataFrame) -> DataFrame:
    """Corpus stats per language: doc count, avg chars, total whitespace
    tokens. One partial-aggregated shuffle on ``lang``."""
    return (
        docs.groupBy("lang")
        .agg(
            F.count(F.col("doc_id")).alias("n_docs"),
            F.round(F.avg(F.col("n_chars")), 4).alias("avg_chars"),
            F.sum(whitespace_token_count("text")).cast("long").alias("total_tokens"),
        )
    )


def tfidf_top_terms(
    docs: DataFrame, k: int = 3, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """TF-IDF scoring with top-k terms per document.

    Plan shape: explode(split) → (doc,term) count agg (map-side partial
    combine absorbs the token blowup before any shuffle) → doc-frequency as
    a WINDOW COUNT over the term partition (no self-join: the tf rows are
    already one-per-(doc,term), so `count() over (partition by term)` IS
    the document frequency) → per-doc top-k window. Three shuffles on
    bounded-cardinality keys ((doc,term), term, doc); no Python anywhere in
    the plan. The corpus size N enters as a 1-row broadcast cross join — no
    driver-side collect.

    Scores are rounded to 4dp BEFORE ranking so the (tfidf desc, term asc)
    order — and therefore the selected top-k — is stable across engines
    and partition counts (ln() can differ by 1 ulp between libm
    implementations).
    """
    from pyspark.sql import Window

    from datalake_breweries_two_spark.operators.windows import top_k_per_group

    tokens = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.split(F.col(text_col), " ")).alias("term"),
    ).filter(F.length("term") > 0)
    tf = tokens.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = F.count(F.lit(1)).over(Window.partitionBy("term"))
    n_docs = docs.select(F.count_distinct(F.col(id_col)).alias("n_docs"))
    scored = (
        tf.withColumn("df", dfreq)
        .crossJoin(F.broadcast(n_docs))
        .select(
            "doc_id",
            "term",
            F.round(F.col("tf") * F.log(F.col("n_docs") / F.col("df")), 4).alias("tfidf"),
        )
    )
    return top_k_per_group(scored, "doc_id", "tfidf", "term", k)


def word_count_top(docs: DataFrame, k: int = 20, text_col: str = "text") -> DataFrame:
    """Global token frequency top-k — the canonical corpus-vocabulary query.
    explode → partial-count agg → TakeOrderedAndProject: the full token
    stream is combined map-side; only per-partition (token,count) pairs
    shuffle, and only P×k rows reach the driver."""
    from datalake_breweries_two_spark.operators.windows import global_top_k

    tokens = docs.select(
        F.explode(F.split(F.col(text_col), " ")).alias("token")
    ).filter(F.length("token") > 0)
    counts = tokens.groupBy("token").agg(F.count(F.lit(1)).alias("n"))
    return global_top_k(counts, "n", "token", k)
