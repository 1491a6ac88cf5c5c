"""Distributed BM25 retrieval over term-occurrence tables.

The reference's retrieval (icl_utils.py: TF-IDF kNN over the 50-doc
demo corpus) is query-conditioned and driver-local by design; at
crawl scale the retrieval a training-data pipeline runs is the
corpus-wide kind — score every document against a small query set
and keep the top-k per query. This module is that operator, shaped
for Spark: postings are filtered to the query vocabulary by a
broadcast join BEFORE any aggregation, document statistics are
map-side partial aggregates, the corpus scalars (N, avgdl) attach as
one lazy keyless aggregate (the pagerank dangling-mass pattern), and
the per-(query, doc) score is an ordered left-fold so the float is
bit-reproducible.

Determinism contract (DuckDB oracle parity): scoring uses the
log-free "rational idf" (N - df + 0.5) / (df + 0.5) — monotone in
the Robertson idf log((N-df+0.5)/(df+0.5)), so rankings are
identical, but expressible as a fixed-order IEEE mul/div chain that
Spark and DuckDB agree on bit-for-bit (libm vs JVM log differ in the
last ulp — the lm_scores/token_pmi precedent). Per-document sums
fold in term order on both engines (F.aggregate over
array_sort(collect_list) == list_sum(list(x ORDER BY term))).
Callers wanting the classic log idf can pass idf="robertson"; that
variant is pinned by pytest against numpy, not by the SQL oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

__all__ = ["ngram_terms", "bm25_topk"]


def ngram_terms(
    docs: DataFrame,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, term): one row per n-gram OCCURRENCE (sliding window over
    whitespace tokens) — multiplicity is the term frequency."""
    toks = F.split(F.col(text_col), " ")
    grams = F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - n),
            lambda i: F.array_join(F.slice(toks, i + 1, n), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return docs.select(F.col(id_col), F.explode(grams).alias("term"))


def bm25_topk(
    doc_terms: DataFrame,
    query_terms: DataFrame,
    k1: float = 1.2,
    b: float = 0.75,
    k: int = 10,
    idf: str = "rational",
) -> DataFrame:
    """(query_id, doc_id, n_hit, score, rank): top-k documents per
    query under BM25 over pre-tokenized term tables.

    doc_terms: (doc_id, term), one row per occurrence (ngram_terms).
    query_terms: (query_id, term) — the query vocabulary, assumed
    tiny (broadcast side; distinct per query).

    Score = sum over matched query terms of
        idf(t) * (tf * (k1+1)) / (tf + k1 * ((1-b) + b * (dl/avgdl)))
    with dl the document's TOTAL term count and avgdl/N corpus
    scalars. Documents sharing no term with a query are absent (their
    score is 0); ties break on doc_id ascending.

    Plan shape, scale-first: the corpus-wide explode never shuffles
    raw terms for non-query vocabulary — postings semi-filter through
    a broadcast of the query terms before tf aggregation; df comes
    from the surviving postings (a term's df over its own postings IS
    its corpus df); dl is a map-side partial-aggregated per-doc
    count; N/avgdl ride one lazy keyless aggregate (single allowed
    BroadcastNestedLoopJoin); the fold groups are <= |query terms|
    rows each. Top-k is a per-query window over candidates only.
    """
    if idf not in ("rational", "robertson"):
        raise ValueError(f"unknown idf variant: {idf}")
    one_minus_b = 1.0 - b
    k1p1 = k1 + 1.0

    qterms = query_terms.select("query_id", "term").distinct()
    qvocab = qterms.select("term").distinct()

    # postings restricted to the query vocabulary, then tf per
    # (doc, term) and df per term — both partial-combined aggs
    hits = doc_terms.join(F.broadcast(qvocab), "term")
    tf_dt = hits.groupBy("doc_id", "term").agg(
        F.count("*").cast("bigint").alias("tf")
    )
    df_t = tf_dt.groupBy("term").agg(F.count("*").cast("bigint").alias("df"))

    # dl over the FULL term table (document length counts every term,
    # not just query-vocabulary hits)
    dl = doc_terms.groupBy("doc_id").agg(
        F.count("*").cast("bigint").alias("dl")
    )
    # corpus scalars as ONE lazy keyless aggregate (no eager count)
    scalars = dl.agg(
        F.count("*").cast("double").alias("n_docs"),
        (F.sum("dl").cast("double") / F.count("*").cast("double")).alias(
            "avgdl"
        ),
    )

    scored_terms = (
        tf_dt.join(F.broadcast(df_t), "term")
        .join(F.broadcast(qterms), "term")
        .join(dl, "doc_id")
        .crossJoin(scalars)
    )
    if idf == "rational":
        idf_c = (F.col("n_docs") - F.col("df") + F.lit(0.5)) / (
            F.col("df") + F.lit(0.5)
        )
    else:
        idf_c = F.log(
            (F.col("n_docs") - F.col("df") + F.lit(0.5))
            / (F.col("df") + F.lit(0.5))
        )
    tf_d = F.col("tf").cast("double")
    dl_d = F.col("dl").cast("double")
    contrib = (idf_c * (tf_d * F.lit(k1p1))) / (
        tf_d
        + F.lit(k1)
        * (F.lit(one_minus_b) + F.lit(b) * (dl_d / F.col("avgdl")))
    )

    # ordered left-fold: sum contribs in term order, bit-reproducibly
    per_doc = (
        scored_terms.select(
            "query_id", "doc_id", F.col("term"), contrib.alias("contrib")
        )
        .groupBy("query_id", "doc_id")
        .agg(
            F.count("*").cast("bigint").alias("n_hit"),
            F.aggregate(
                F.array_sort(
                    F.collect_list(F.struct(F.col("term"), F.col("contrib")))
                ),
                F.lit(0.0),
                lambda acc, x: acc + x["contrib"],
            ).alias("score"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("doc_id")
    )
    return (
        per_doc.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
        .select("query_id", "doc_id", "n_hit", "score", "rank")
    )


def rrf_fuse(
    rankings: list[DataFrame],
    names: list[str],
    rrf_k: int = 60,
    topk: int | None = None,
) -> DataFrame:
    """Reciprocal-rank fusion of N ranking tables — the standard
    hybrid-retrieval combiner (lexical BM25 + dense ANN, or any mix):
    rrf(d) = Σ_i 1/(rrf_k + rank_i(d)), missing entries contribute 0.

    Each input must be (query_id, doc_id, rank). Inputs fold through
    sequential FULL OUTER equi-joins on (query_id, doc_id) — top-k
    ranking tables are tiny relative to the corpora that produced
    them, so the fusion joins are never the scale bottleneck (the
    retrievers are), and the join keeps per-retriever ranks as
    columns (rank_<name>, -1 sentinel) instead of a union+sum, which
    both preserves provenance and fixes the float-addition order:
    the score is one left-to-right chain of coalesced IEEE divisions,
    bit-reproducible across engines for N inputs (a groupBy-sum would
    be shuffle-order dependent at N > 2).

    Output: (query_id, doc_id, rank_<name>..., rrf_score, rank) with
    rank = row_number by (rrf_score DESC, doc_id), cut at `topk`.
    """
    if len(rankings) != len(names) or not rankings:
        raise ValueError("rankings and names must be equal-length, non-empty")
    fused = None
    for r, nm in zip(rankings, names):
        ri = r.select(
            "query_id", "doc_id", F.col("rank").alias(f"rank_{nm}")
        )
        fused = ri if fused is None else fused.join(
            ri, ["query_id", "doc_id"], "full_outer"
        )
    score = None
    for nm in names:
        c = F.coalesce(
            F.lit(1.0) / (F.lit(rrf_k) + F.col(f"rank_{nm}")).cast("double"),
            F.lit(0.0),
        )
        score = c if score is None else score + c
    out = fused.select(
        "query_id",
        "doc_id",
        *[
            F.coalesce(F.col(f"rank_{nm}"), F.lit(-1)).cast("int").alias(f"rank_{nm}")
            for nm in names
        ],
        score.alias("rrf_score"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("rrf_score"), F.asc("doc_id"))
    out = out.withColumn("rank", F.row_number().over(w).cast("int"))
    if topk is not None:
        out = out.filter(F.col("rank") <= topk)
    return out
