"""Text-analysis operators for large-scale training-data pipelines.

All JVM-side (built-in pyspark.sql.functions, whole-stage codegen) —
no Python in the hot path. Token model: whitespace split, matching the
pipeline's stub tokenizer.

Operators: token stats, quality scoring (stopword/length ratios),
language-feature extraction (n-gram/stopword heuristic), document
fingerprinting (md5).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ctinexus_spark.stopwords import ENGLISH_STOPWORDS

# Deterministic, sorted subset used by both Spark and the SQL oracle.
STOPWORD_LIST = sorted(ENGLISH_STOPWORDS)


def _tokens(col: str = "text") -> Column:
    return F.split(F.col(col), " ")


def token_stats(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(id, n_tokens, n_chars, n_distinct_tokens)"""
    toks = _tokens(text_col)
    return docs.select(
        F.col(id_col),
        F.size(toks).cast("bigint").alias("n_tokens"),
        F.length(text_col).cast("bigint").alias("n_chars"),
        F.size(F.array_distinct(toks)).cast("bigint").alias("n_distinct_tokens"),
    )


def quality_scores(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Quality features: stopword ratio, mean token length, distinct
    ratio. Ratios are double divisions of integers — bit-identical
    across engines."""
    toks = _tokens(text_col)
    n = F.size(toks).cast("double")
    stop_arr = F.array(*[F.lit(w) for w in STOPWORD_LIST])
    n_stop = F.size(F.filter(toks, lambda w: F.array_contains(stop_arr, w))).cast("double")
    n_distinct = F.size(F.array_distinct(toks)).cast("double")
    # sum of token lengths = chars minus separators
    tok_chars = (F.length(text_col) - (F.size(toks) - F.lit(1))).cast("double")
    return docs.select(
        F.col(id_col),
        (n_stop / n).alias("stopword_ratio"),
        (tok_chars / n).alias("mean_token_len"),
        (n_distinct / n).alias("distinct_ratio"),
    )


def fingerprints(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(id, fingerprint md5-hex) — exact-dup key."""
    return docs.select(F.col(id_col), F.md5(F.col(text_col)).alias("fingerprint"))


def lang_features(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Language-ID heuristic features: English stopword hit-rate and
    ascii-letter ratio. (A full lang-id model would be a broadcast
    n-gram table lookup — same shape, bigger table.)"""
    toks = _tokens(text_col)
    stop_arr = F.array(*[F.lit(w) for w in STOPWORD_LIST])
    n = F.size(toks).cast("double")
    n_stop = F.size(F.filter(toks, lambda w: F.array_contains(stop_arr, F.lower(w)))).cast("double")
    letters = F.length(F.regexp_replace(F.col(text_col), "[^A-Za-z]", "")).cast("double")
    chars = F.length(text_col).cast("double")
    return docs.select(
        F.col(id_col),
        (n_stop / n).alias("en_stopword_rate"),
        (letters / chars).alias("ascii_letter_ratio"),
    )
