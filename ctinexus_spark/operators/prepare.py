"""Corpus-preparation combinators: the filters a 100 TB training-data
pipeline runs in front of extraction. All JVM-side.

- quality gate : keep documents passing cheap text-quality thresholds
  (token count, stopword ratio bounds, distinct-token ratio) — the
  standard pre-LLM cost guard.
- url dedup    : keep one row per url (first by deterministic order) —
  crawls re-fetch pages; the pipeline key must be unique.
- near-dup gate: drop docs whose exact fingerprint already occurred
  (canonical = min id wins), composing with the MinHash-LSH candidates
  for fuzzy dedup (operators/dedup.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ctinexus_spark.operators.textops import STOPWORD_LIST


def quality_gate(
    docs: DataFrame,
    text_col: str = "text",
    min_tokens: int = 5,
    max_stopword_ratio: float = 0.9,
    min_distinct_ratio: float = 0.1,
) -> DataFrame:
    toks = F.split(F.col(text_col), " ")
    n = F.size(toks).cast("double")
    stop_arr = F.array(*[F.lit(w) for w in STOPWORD_LIST])
    n_stop = F.size(F.filter(toks, lambda w: F.array_contains(stop_arr, w))).cast("double")
    n_distinct = F.size(F.array_distinct(toks)).cast("double")
    return docs.filter(
        F.col(text_col).isNotNull()
        & (n >= float(min_tokens))
        & ((n_stop / n) <= max_stopword_ratio)
        & ((n_distinct / n) >= min_distinct_ratio)
    )


def dedupe_by_key(docs: DataFrame, key: str = "url", order_col: str | None = None) -> DataFrame:
    """One row per key; winner = lowest order_col (default: the key
    itself makes any single row win deterministically)."""
    oc = F.col(order_col) if order_col else F.md5(F.to_json(F.struct(*docs.columns)))
    w = Window.partitionBy(key).orderBy(oc)
    return docs.withColumn("_rn", F.row_number().over(w)).filter("_rn = 1").drop("_rn")


def exact_text_dedupe(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Keep the min-id document per exact text fingerprint."""
    w = Window.partitionBy(F.md5(F.col(text_col))).orderBy(F.col(id_col))
    return docs.withColumn("_rn", F.row_number().over(w)).filter("_rn = 1").drop("_rn")
