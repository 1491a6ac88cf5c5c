"""Training-data-pipeline + classical query registry with DuckDB
oracle twins (extends entry_queries; merged by __spark_entry__).

Families:
- text analysis : token stats, quality scores, lang features,
                  fingerprints, BPE-piece estimates, winnowing
                  rolling-hash fingerprints, Gopher quality rules +
                  repetition filters (operators/textops.py)
- dedup         : exact, MinHash signatures, LSH bands/candidates
                  (bucket-capped), candidate-gated n-gram Jaccard,
                  SimHash + hamming bands, LSH-gated embedding
                  near-dups, CC duplicate clusters (operators/dedup.py,
                  graph/components.py)
- similarity    : query-broadcast exact top-k, LSH buckets/top-k,
                  IVF assign/top-k (+ trained k-means centroids),
                  kNN label vote over LSH neighbors
                  (operators/similarity.py); JL projection, PQ
                  encode/ADC + IVF-PQ with trained per-subspace
                  codebooks (operators/quantize.py)
- multimodal    : binary metadata + frame-sample plans over binary
                  columns synthesized from text (operators/multimodal)
- url ops       : normalize/validate/domain (text/urls.py)
- classical     : TPC-H-style agg + join + window/sessionization
                  (the classical-operator checklist of SURVEY.md §2.7)

Float determinism notes (verified empirically):
- cosine: Spark left-fold aggregate over double-cast arrays is
  bit-identical to DuckDB list_cosine_similarity(::DOUBLE[]).
- ratios of ints and double divisions are IEEE-exact on both engines.
- money sums go through decimal(18,2) then cast to double (exact,
  order-independent) instead of double sums (order-dependent).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ctinexus_spark.operators import dedup as D
from ctinexus_spark.operators import similarity as S
from ctinexus_spark.operators import textops as T
from ctinexus_spark.operators.textops import STOPWORD_LIST


def _docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


# --- text analysis ------------------------------------------------------


def q_token_stats(spark, sf_dir):
    return T.token_stats(_docs(spark, sf_dir))


def q_quality(spark, sf_dir):
    return T.quality_scores(_docs(spark, sf_dir))


def q_lang_features(spark, sf_dir):
    return T.lang_features(_docs(spark, sf_dir))


def q_fingerprints(spark, sf_dir):
    return T.fingerprints(_docs(spark, sf_dir))


def q_bpe_tokens(spark, sf_dir):
    return T.bpe_token_estimate(_docs(spark, sf_dir))


def q_winnow_fp(spark, sf_dir):
    return T.winnowed_fingerprints(_docs(spark, sf_dir))


# --- dedup --------------------------------------------------------------


def q_gopher_rules(spark, sf_dir):
    return T.gopher_rules(_docs(spark, sf_dir))


def q_repetition_ratios(spark, sf_dir):
    return T.repetition_ratios(_docs(spark, sf_dir))


def q_redact_pii(spark, sf_dir):
    """PII scrub over documents with deterministic synthesized PII
    appended (the driver corpus carries none): email + IPv4 + SSN per
    doc, so placeholders and counts are value-rich under the oracle."""
    d = F.col("doc_id").cast("string")
    suffix = F.concat(
        F.lit(" contact intruder"), d, F.lit("@malicious-"),
        (F.col("doc_id") % 7).cast("string"),
        F.lit(".example.com from 10."),
        (F.col("doc_id") % 250).cast("string"),
        F.lit(".0.9 ref 123-45-6789"),
    )
    docs = _docs(spark, sf_dir).withColumn("text", F.concat(F.col("text"), suffix))
    return T.redact_pii(docs)


def q_lm_scores(spark, sf_dir):
    # mean_prob is the engine-exact column; log2_ppl stays Spark-side
    # (libm vs JVM log differ in last-ulp)
    return T.bigram_lm_scores(_docs(spark, sf_dir)).select(
        "doc_id", "n_bigrams", "mean_prob"
    )


def q_doc_chunks(spark, sf_dir):
    from ctinexus_spark.operators.prepare import chunk_documents

    return chunk_documents(_docs(spark, sf_dir))


def q_pack_plan(spark, sf_dir):
    from ctinexus_spark.operators.prepare import pack_documents

    return pack_documents(_docs(spark, sf_dir), budget_tokens=256)


def q_dedup_exact(spark, sf_dir):
    return D.exact_duplicates(_docs(spark, sf_dir))


def q_minhash(spark, sf_dir):
    return D.minhash_signatures(_docs(spark, sf_dir))


def q_lsh_bands(spark, sf_dir):
    return D.lsh_bands(_docs(spark, sf_dir))


def q_lsh_candidates(spark, sf_dir):
    return D.lsh_candidates(_docs(spark, sf_dir))


def q_shingle_overlap(spark, sf_dir):
    # Jaccard verify restricted to LSH candidate pairs — the MinHash→
    # LSH→verify funnel a web-scale dedup actually runs (the corpus-
    # wide shingle self-join variant is test-only)
    docs = _docs(spark, sf_dir)
    return D.shingle_overlap(docs, candidates=D.lsh_candidates(docs))


def q_simhash(spark, sf_dir):
    return D.simhash(_docs(spark, sf_dir))


def q_simhash_candidates(spark, sf_dir):
    return D.simhash_candidates(_docs(spark, sf_dir))


def q_dedup_clusters_cc(spark, sf_dir):
    """Corpus-wide duplicate clusters: distributed min-label connected
    components over the LSH candidate-pair graph (the cross-document
    graph case GraphFrames would serve; graph/components.py)."""
    from ctinexus_spark.graph.components import connected_components

    edges = D.lsh_candidates(_docs(spark, sf_dir))
    return connected_components(edges, "a_id", "b_id")


def q_dedup_clusters_stars(spark, sf_dir):
    """Same duplicate-cluster semantics as dedup_clusters_cc through
    the large-star/small-star algorithm (O(log² n) rounds, diameter-
    independent) — shares the recursive-CTE transitive-closure oracle,
    which is exactly the point: two distributed algorithms, one
    fixpoint."""
    from ctinexus_spark.graph.components import connected_components_stars

    edges = D.lsh_candidates(_docs(spark, sf_dir))
    return connected_components_stars(edges, "a_id", "b_id")


def q_dedup_keeplist(spark, sf_dir):
    return D.dedup_keep_list(_docs(spark, sf_dir))


def q_emb_cosine_pairs(spark, sf_dir):
    # low threshold so the check is value-rich on random vectors;
    # LSH-gated scale path (the brute all-pairs variant is test-only)
    return D.embedding_near_dups_lsh(_emb(spark, sf_dir), threshold=0.3)


# --- similarity ---------------------------------------------------------


def q_ann_topk(spark, sf_dir):
    emb = _emb(spark, sf_dir)
    queries = emb.filter(F.col("vec_id") < 25)
    return S.brute_force_topk(emb, queries)


def q_lsh_buckets(spark, sf_dir):
    return S.lsh_buckets(_emb(spark, sf_dir))


def q_lsh_topk(spark, sf_dir):
    return S.lsh_topk(_emb(spark, sf_dir))


def q_mmr_topk(spark, sf_dir):
    """Maximal-marginal-relevance diversified top-5 (λ=0.7) over the
    20 highest-cosine candidates for 8 query vectors — the de-dup
    re-rank for retrieved context. Greedy loop = 4 unrolled DataFrame
    rounds (join vs the selected set + struct-min argmax); the SQL
    twin unrolls the identical recurrence, float constants embedded
    from Python ({v!r}::DOUBLE, BM25 precedent), scores a fixed IEEE
    chain over left-fold cosines — hash-exact."""
    emb = _emb(spark, sf_dir)
    return S.mmr_rerank(
        emb, emb.filter(F.col("vec_id") < 8), k=5, lam=0.7, candidates=20
    )


def q_knn_vote(spark, sf_dir):
    # neighbors from the LSH-bucketed top-k (default) — no all-pairs
    return S.knn_label_vote(_emb(spark, sf_dir))


def q_ivf_assign(spark, sf_dir):
    return S.ivf_assign(_emb(spark, sf_dir))


def q_ivf_topk(spark, sf_dir):
    return S.ivf_topk(_emb(spark, sf_dir))


# Literal short docs appended to the incremental-admission corpus: the
# sf0.01 texts are all shingle-able, so without them the band-less
# exact-hash side channel would be value-free at oracle scale. Parity
# of the id decides corpus (even) vs batch (odd); expected outcomes:
# 10001 admitted (min of the in-batch 'dup' pair), 10003 dropped,
# 10005 admitted solo, 10007 dropped (fingerprint hits corpus 10000).
_SHORT_DOC_ROWS = [
    (10000, "crossdup"),
    (10001, "dup"),
    (10003, "dup"),
    (10005, "solo tiny"),
    (10007, "crossdup"),
]


def q_dedup_incremental(spark, sf_dir):
    """Incremental near-dup admission: even doc_ids play the already-
    admitted corpus (stored band index + band-less fingerprint set),
    odd ids the new crawl batch — one index equi-join rejects near-dups
    of admitted docs, the capped star-edge funnel dedups within the
    batch, and band-less docs (injected literals; too short to shingle)
    dedupe through the md5 side channel. Survivors return as
    index-appendable band/fingerprint rows."""
    from ctinexus_spark.operators.dedup import dedup_keep_list_incremental, lsh_bands

    extra = spark.createDataFrame(_SHORT_DOC_ROWS, "doc_id bigint, text string")
    docs = _docs(spark, sf_dir).select("doc_id", "text").unionByName(extra)
    corpus = docs.filter(F.col("doc_id") % 2 == 0)
    batch = docs.filter(F.col("doc_id") % 2 == 1)
    corpus_bandless_fp = corpus.filter(
        F.size(F.split(F.col("text"), " ")) < 3
    ).select(F.md5(F.col("text")).alias("fingerprint"))
    return dedup_keep_list_incremental(
        batch, lsh_bands(corpus), index_fingerprints=corpus_bandless_fp
    )


def q_semantic_dedup(spark, sf_dir):
    """SemDeDup keep-list: IVF cells as blocks, within-cell cosine >=
    0.3 edges (value-rich on the random-vector corpus), distributed CC,
    min-id survivors — the embedding-space analogue of dedup_keeplist."""
    from ctinexus_spark.operators.dedup import semantic_dedup_keeplist

    return semantic_dedup_keeplist(_emb(spark, sf_dir), threshold=0.3)


def q_rand_proj(spark, sf_dir):
    from ctinexus_spark.operators.quantize import random_projection

    return random_projection(_emb(spark, sf_dir))


def q_pq_codes(spark, sf_dir):
    from ctinexus_spark.operators.quantize import pq_encode

    return pq_encode(_emb(spark, sf_dir))


def q_pq_adc_topk(spark, sf_dir):
    from ctinexus_spark.operators.quantize import pq_adc_topk

    emb = _emb(spark, sf_dir)
    return pq_adc_topk(emb, emb.filter(F.col("vec_id") < 10))


def q_ivf_pq_topk(spark, sf_dir):
    from ctinexus_spark.operators.quantize import ivf_pq_topk

    emb = _emb(spark, sf_dir)
    return ivf_pq_topk(emb, emb.filter(F.col("vec_id") < 10))


# --- multimodal plumbing (binary columns synthesized from text so the
# driver tables can oracle-check the schema/metadata path; the codec
# itself stays behind the honest stub in operators/multimodal.py) ----


def q_mm_metadata(spark, sf_dir):
    from ctinexus_spark.operators.multimodal import media_metadata

    media = _docs(spark, sf_dir).select(
        F.col("doc_id").alias("media_id"),
        F.encode(F.col("text"), "UTF-8").alias("content"),
    )
    return media_metadata(media)


def q_mm_frame_plan(spark, sf_dir):
    from ctinexus_spark.operators.multimodal import frame_sample_plan

    media = _docs(spark, sf_dir).select(
        F.col("doc_id").alias("media_id"),
        (F.col("n_chars").cast("double") / F.lit(100.0)).alias("duration_sec"),
    )
    return frame_sample_plan(media, fps=0.2)


def q_url_ops(spark, sf_dir):
    """URL normalize/validate/domain (T8) over synthesized URLs — half
    with an explicit scheme (mixed case host), half scheme-less (which
    urlparse treats as all-path: empty domain, invalid)."""
    from pyspark.sql.functions import pandas_udf

    from ctinexus_spark.text.urls import extract_domain, is_valid_url, normalize_url

    @pandas_udf("string")
    def _norm(u):
        return u.map(normalize_url)

    @pandas_udf("string")
    def _dom(u):
        return u.map(extract_domain)

    @pandas_udf("boolean")
    def _valid(u):
        return u.map(is_valid_url)

    d = F.col("doc_id").cast("string")
    url = F.when(
        F.col("doc_id") % 2 == 0,
        F.concat(F.lit("https://WWW.Example"), d, F.lit(".COM/p/"), d),
    ).otherwise(F.concat(F.lit("www.example"), d, F.lit(".com/p/"), d))
    u = _docs(spark, sf_dir).select("doc_id", url.alias("url"))
    return u.select(
        "doc_id",
        _norm(F.col("url")).alias("norm_url"),
        _dom(_norm(F.col("url"))).alias("domain"),
        _dom(F.col("url")).alias("raw_domain"),
        _valid(F.col("url")).alias("raw_valid"),
    )


def q_quality_gate(spark, sf_dir):
    from ctinexus_spark.operators.prepare import quality_gate

    return quality_gate(_docs(spark, sf_dir), min_tokens=30).select(
        "doc_id", "lang", "n_chars"
    )


def q_text_dedupe(spark, sf_dir):
    from ctinexus_spark.operators.prepare import exact_text_dedupe

    return exact_text_dedupe(_docs(spark, sf_dir)).select("doc_id", "n_chars")


# --- classical ----------------------------------------------------------


def q_tpch_q1(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    dec = lambda c: c.cast("decimal(18,2)")  # noqa: E731
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(dec(F.col("l_quantity"))).cast("double").alias("sum_qty"),
            F.sum(dec(F.col("l_extendedprice"))).cast("double").alias("sum_base_price"),
            # price (2dp) × (1-disc) (2dp) is an exact 4-decimal value:
            # decimal(18,4) recovers it exactly on both engines, while
            # (18,2) would hit .005 ties where Spark (HALF_UP) and
            # DuckDB (HALF_EVEN) round differently.
            F.sum((F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))).cast("decimal(18,4)"))
            .cast("double").alias("sum_disc_price"),
            F.count("*").cast("bigint").alias("count_order"),
        )
    )


def q_revenue_join(spark, sf_dir):
    """customer ⨝ orders ⨝ lineitem revenue rollup (broadcast dims)."""
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    rev = F.sum(
        (F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))).cast("decimal(18,4)")
    ).cast("double")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("c_mktsegment", "o_orderpriority")
        .agg(rev.alias("revenue"), F.count("*").cast("bigint").alias("n_items"))
    )


def q_region_revenue(spark, sf_dir):
    """TPC-H Q5-style snowflake join: region → nation → customer →
    orders → lineitem, dims broadcast, revenue rolled up per region."""
    region = spark.read.parquet(f"{sf_dir}/region.parquet")
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    rev = F.sum(
        (F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))).cast("decimal(18,4)")
    ).cast("double")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name")
        .agg(rev.alias("revenue"), F.count("*").cast("bigint").alias("n_items"))
    )


def q_user_top_events(spark, sf_dir):
    """Window top-k: each user's 3 highest-value events
    (row_number with deterministic tie-break)."""
    from pyspark.sql import Window

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    w = Window.partitionBy("user_id").orderBy(F.desc("value"), F.asc("event_id"))
    return (
        ev.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("user_id", "event_id", "event_type", F.col("rk").cast("int").alias("rk"))
    )


def q_event_sessions(spark, sf_dir):
    """Sessionization: 30-min inactivity gap → new session (window
    functions; at scale this is the watermarked streaming shape)."""
    from pyspark.sql import Window

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))
    marked = ev.withColumn(
        "new_session",
        F.when(gap.isNull() | (gap > 1800), F.lit(1)).otherwise(F.lit(0)),
    )
    return (
        marked.groupBy("user_id")
        .agg(
            F.sum("new_session").cast("bigint").alias("n_sessions"),
            F.count("*").cast("bigint").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("total_value"),
        )
    )


def q_event_sessions_native(spark, sf_dir):
    """Sessionization via the built-in F.session_window aggregation —
    the JVM/state-store production default (same operator serves the
    live stream); session_end = last event + gap, window semantics."""
    from ctinexus_spark.streaming.ingest import session_window_counts

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select("user_id", "ts")
    return session_window_counts(ev)


def q_event_type_rollup(spark, sf_dir):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return (
        ev.groupBy("event_type")
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.countDistinct("user_id").cast("bigint").alias("n_users"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("sum_value"),
        )
    )


def q_order_percentiles(spark, sf_dir):
    """Exact interpolated percentiles per priority class — Spark's
    percentile() and DuckDB's quantile_cont use the same linear
    interpolation (verified bit-exact on this corpus)."""
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    price = F.col("o_totalprice").cast("double")
    return o.groupBy("o_orderpriority").agg(
        F.percentile(price, 0.5).alias("p50"),
        F.percentile(price, 0.95).alias("p95"),
        F.count("*").cast("bigint").alias("n"),
    )


def q_revenue_rollup(spark, sf_dir):
    """ROLLUP over (priority, status): per-group + subtotal + grand
    total rows, dims coalesced to '(all)' so no NULLs reach the hash
    compare; money summed through decimal then cast (order-free)."""
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    return (
        o.rollup("o_orderpriority", "o_orderstatus")
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double").alias("total"),
            F.count("*").cast("bigint").alias("n"),
        )
        .select(
            F.coalesce("o_orderpriority", F.lit("(all)")).alias("priority"),
            F.coalesce("o_orderstatus", F.lit("(all)")).alias("status"),
            "total",
            "n",
        )
    )


def q_event_leadlag(spark, sf_dir):
    """Per-user event-to-event gap seconds via lag() — the funnel/
    dwell-time window shape; ties broken by event_id so the frame
    order is total on both engines."""
    from pyspark.sql import Window

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # NTZ timestamps: unix_timestamp under the UTC session zone ==
    # DuckDB epoch() on the same naive values
    epoch = F.unix_timestamp(F.col("ts"))
    prev = F.lag(epoch).over(w)
    return ev.select(
        "user_id",
        "event_id",
        F.coalesce(epoch - prev, F.lit(-1)).cast("bigint").alias("secs_since_prev"),
    )


def q_part_triangles(spark, sf_dir):
    """Triangle counts over the part co-occurrence graph (parts
    sharing an order are connected) — degree-ordered orientation, the
    arboricity-bounded MapReduce triangle algorithm
    (graph/analytics.py)."""
    from ctinexus_spark.graph.analytics import triangle_counts

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select("l_orderkey", "l_partkey")
    a = li.select(F.col("l_orderkey").alias("k"), F.col("l_partkey").alias("pa"))
    b = li.select(F.col("l_orderkey").alias("k"), F.col("l_partkey").alias("pb"))
    edges = (
        a.join(b, "k")
        .filter(F.col("pa") < F.col("pb"))
        .select(F.col("pa").alias("src"), F.col("pb").alias("dst"))
        .distinct()
    )
    return triangle_counts(edges)


def _shipment_edges(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select("l_suppkey", "l_partkey")
    return li.select(
        F.concat(F.lit("s"), F.col("l_suppkey")).alias("src"),
        F.concat(F.lit("p"), F.col("l_partkey")).alias("dst"),
    )


def q_part_pagerank(spark, sf_dir):
    """PageRank over the supplier→part shipment graph (who supplies
    what; ranks parts by their DISTINCT supplier in-links — duplicate
    edges collapse, so shipment multiplicity deliberately does not
    weight the edge). Oracle-grade since round 5: pagerank_pinned
    left-folds both float sums in explicit (source / vertex) order, so
    the 5-round ranks are bit-exact against the unrolled DuckDB twin
    (list_sum(list(x ORDER BY k)) is the same strict fold) — full
    double precision, no rounding column. The throughput variant
    (shuffle-order sums, identical algebra to 1e-9 by
    tests/test_graph_and_skew.py) runs as bench's graph_pagerank."""
    from ctinexus_spark.graph.analytics import pagerank_pinned

    return pagerank_pinned(_shipment_edges(spark, sf_dir), iterations=5)


def q_graph_pagerank_bench(spark, sf_dir):
    """Bench twin of part_pagerank through the unpinned (shuffle-sum)
    pagerank() — the production throughput path."""
    from ctinexus_spark.graph.analytics import pagerank

    return pagerank(_shipment_edges(spark, sf_dir), iterations=5)


def q_part_kcore(spark, sf_dir):
    """80-core of the part co-occurrence graph (parts sharing an
    order) — the dense-cluster extraction peel; at sf0.01 the peel
    cascades 143 parts away (degrees run 42-206, so k=80 bites without
    collapsing the graph). Integer output, deterministic; oracle-grade
    since round 5 via a DuckDB WITH RECURSIVE peel (each recursion step
    re-derives degrees over the working edge set and drops below-k
    endpoints; the fixpoint iteration is extracted by max(iter));
    exact peel semantics additionally pinned by
    tests/test_graph_and_skew.py."""
    from ctinexus_spark.graph.analytics import k_core

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select("l_orderkey", "l_partkey")
    a = li.select(F.col("l_orderkey").alias("k"), F.col("l_partkey").alias("pa"))
    b = li.select(F.col("l_orderkey").alias("k"), F.col("l_partkey").alias("pb"))
    edges = (
        a.join(b, "k")
        .filter(F.col("pa") < F.col("pb"))
        .select(F.col("pa").alias("src"), F.col("pb").alias("dst"))
        .distinct()
    )
    return k_core(edges, k=80)


def q_event_asof_purchase(spark, sf_dir):
    """As-of join: every event tagged with the user's most recent
    purchase at-or-before its timestamp — the trade/quote primitive
    over the events stream. Spark side is window-over-union (one
    key shuffle, no range join, operators/temporal.py); the oracle is
    DuckDB's NATIVE ASOF LEFT JOIN — an independently implemented
    as-of algorithm, so the gate cross-checks two unrelated
    formulations. Right side deduped to one purchase per (user, ts)
    by max event_id (struct-max, both engines)."""
    from ctinexus_spark.operators.temporal import asof_join

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    pur = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(F.max(F.struct(F.col("event_id"), F.col("value"))).alias("w"))
        .select(
            "user_id",
            "ts",
            F.col("w.event_id").alias("purchase_event_id"),
            F.col("w.value").alias("purchase_value"),
        )
    )
    left = ev.select("user_id", "ts", "event_id", "event_type")
    # no-prior-purchase rows coalesce to (-1, 0.0) sentinels: nullable
    # BIGINT round-trips as float64 through pandas/duckdb fetch, which
    # would break the string-hash compare ("101.0" vs "101")
    return asof_join(
        left, pur, key="user_id", ts="ts",
        payload=["purchase_event_id", "purchase_value"],
    ).select(
        "event_id",
        "user_id",
        "event_type",
        F.coalesce(F.col("purchase_event_id"), F.lit(-1).cast("bigint")).alias(
            "purchase_event_id"
        ),
        F.coalesce(F.col("purchase_value"), F.lit(0.0)).alias("purchase_value"),
    )


def q_click_attribution(spark, sf_dir):
    """Batch interval join: every click within 2 hours at-or-after a
    purchase by the same user — the attribution / config-window range
    join. Spark side bucketizes time so the match is an EQUI-join on
    (user, bucket) + exact range filter (operators/temporal.py — no
    per-key nested loop); the oracle is the plain BETWEEN range join.
    Integer epoch gap column — hash-exact."""
    from ctinexus_spark.operators.temporal import interval_join

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    pur = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("ts").alias("p_start"),
        (F.col("ts") + F.expr("INTERVAL 2 HOURS")).alias("p_end"),
        F.col("event_id").alias("purchase_event_id"),
    )
    clk = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", F.col("event_id").alias("click_event_id")
    )
    j = interval_join(
        clk, pur, key="user_id", ts="ts", start="p_start", end="p_end",
        bucket_seconds=7200,
    )
    gap = (
        F.unix_timestamp(F.col("ts")) - F.unix_timestamp(F.col("p_start"))
    ).cast("bigint")
    return j.select(
        "purchase_event_id", "click_event_id", "user_id", gap.alias("gap_secs")
    )


def q_event_rollup_cascade(spark, sf_dir):
    """Hypertable-style cascading rollup: minute/hour/day event counts
    + value sums where each coarser level re-aggregates the finer
    level's PARTIALS (raw rows scanned once). The oracle aggregates
    each level directly from raw — equality holds because counts and
    DECIMAL sums are associative-exact; the double cast happens only
    in the final projection on both engines."""
    from ctinexus_spark.operators.temporal import time_rollup

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return time_rollup(ev, ts="ts", value="value")


def q_part_truss(spark, sf_dir):
    """4-truss of the part co-occurrence graph restricted to parts
    < 300 (2689 edges at sf0.01; supports run 1-9 so k=4 peels a real
    cascade, 2689 → 617 edges) — edge-level cohesion, strictly
    stronger than the k-core. Iterative triangle-support peel
    (graph/analytics.k_truss); oracle = WITH RECURSIVE re-deriving
    per-edge supports from uncorrelated triangle enumerations over
    the working edge table each step (correlated per-edge subqueries
    do NOT decorrelate in DuckDB — measured timeout)."""
    from ctinexus_spark.graph.analytics import k_truss

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_partkey"
    ).filter(F.col("l_partkey") < 300)
    a = li.select(F.col("l_orderkey").alias("k"), F.col("l_partkey").alias("pa"))
    b = li.select(F.col("l_orderkey").alias("k"), F.col("l_partkey").alias("pb"))
    edges = (
        a.join(b, "k")
        .filter(F.col("pa") < F.col("pb"))
        .select(F.col("pa").alias("src"), F.col("pb").alias("dst"))
        .distinct()
    )
    return k_truss(edges, k=4)


def _ktruss_sql(k: int = 4, max_part: int = 300) -> str:
    """Recursive k-truss twin: per step, per-edge triangle supports
    come from three UNCORRELATED copies of the a<b<c triangle
    enumeration over the working table (multiple recursive references
    + aggregates are legal in DuckDB 1.0); termination = the survivor
    count equals the working count; final NOT EXISTS guard mirrors the
    _kcore_sql empty-truss convention."""

    def sup(srctbl: str) -> str:
        tri = (
            f"SELECT e1.u AS a, e1.v AS b, e2.v AS c "
            f"FROM {srctbl} e1 JOIN {srctbl} e2 ON e1.v = e2.u "
            f"JOIN {srctbl} e3 ON e3.u = e1.u AND e3.v = e2.v"
        )
        return f"""(
  SELECT u, v, count(*) AS s FROM (
    SELECT t.a AS u, t.b AS v FROM ({tri}) t
    UNION ALL SELECT t.a, t.c FROM ({tri}) t
    UNION ALL SELECT t.b, t.c FROM ({tri}) t
  ) GROUP BY u, v
)"""

    thresh = k - 2
    return f"""
WITH RECURSIVE co AS (
  SELECT DISTINCT least(a.l_partkey, b.l_partkey) AS u,
                  greatest(a.l_partkey, b.l_partkey) AS v
  FROM lineitem a JOIN lineitem b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  WHERE a.l_partkey < {max_part} AND b.l_partkey < {max_part}
),
peel(iter, u, v) AS (
  SELECT 0, u, v FROM co
  UNION ALL
  SELECT c.iter + 1, c.u, c.v
  FROM peel c JOIN {sup('peel')} sup ON sup.u = c.u AND sup.v = c.v
  WHERE sup.s >= {thresh}
    AND (SELECT count(*) FROM peel)
        > (SELECT count(*) FROM {sup('peel')} WHERE s >= {thresh})
),
fe AS (SELECT u, v FROM peel WHERE iter = (SELECT max(iter) FROM peel)),
fs AS (
  SELECT c.u, c.v, CAST(coalesce(sup.s, 0) AS BIGINT) AS support
  FROM fe c LEFT JOIN {sup('fe')} sup ON sup.u = c.u AND sup.v = c.v
)
SELECT u, v, support FROM fs
WHERE NOT EXISTS (SELECT 1 FROM fs WHERE support < {thresh})
"""


def q_source_drift(spark, sf_dir):
    """Per-source distribution drift: total-variation distance between
    each source's token distribution and the corpus distribution — the
    mixture-QA alarm. Exact-integer numerator (absent-vocabulary terms
    folded in algebraically, no source×vocab cross join); the single
    final division is the only float op, so tv_dist is engine
    bit-exact with no ordered folds (operators/stats.py)."""
    from ctinexus_spark.operators.stats import distribution_drift
    from ctinexus_spark.partitioning import ensure_parallelism

    docs = ensure_parallelism(_docs(spark, sf_dir))
    toks = docs.select(
        "source", F.explode(F.split(F.col("text"), " ")).alias("token")
    )
    return distribution_drift(toks, "source", "token").select(
        F.col("group").alias("source"), "n_tokens", "tv_dist"
    )


def q_part_ppr(spark, sf_dir):
    """Personalized PageRank from two seed suppliers over the
    shipment graph — the "entities related to X" relevance ranking on
    a KG (random-walk-with-restart proximity). Same bit-exact
    pinned-fold machinery as part_pagerank with the restart vector
    uniform over the seeds; twin = _pagerank_sql(seeds=...) with the
    personalized recurrence unrolled."""
    from ctinexus_spark.graph.analytics import pagerank_pinned

    return pagerank_pinned(
        _shipment_edges(spark, sf_dir), iterations=5, seeds=["s1", "s7"]
    )


def q_part_reach(spark, sf_dir):
    """4-hop reachability from two seed suppliers over the undirected
    supplier↔part shipment graph — the k-hop neighborhood / blast-
    radius query a KG user runs around an entity. Fixed hop budget ⇒
    zero convergence actions; frontier BFS (graph/analytics.py), one
    equi-join + distinct + anti-join per hop. Oracle: WITH RECURSIVE
    walk with UNION (distinct) working-table semantics + min(dist) —
    integer/string-only output, hash-exact."""
    from ctinexus_spark.graph.analytics import bfs_distances

    return bfs_distances(_shipment_edges(spark, sf_dir), seeds=["s1", "s7"], hops=4)


def q_part_clustering(spark, sf_dir):
    """Local clustering coefficient over the part co-occurrence graph
    (parts sharing an order) — transitivity separates organic dense
    clusters from hub-spoke stars. 2·T/(d·(d−1)) as a single IEEE
    division of exact integer-valued doubles (token_pmi fixed-chain
    pattern) so the float column hash-matches the DuckDB twin."""
    from ctinexus_spark.graph.analytics import clustering_coefficient

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select("l_orderkey", "l_partkey")
    a = li.select(F.col("l_orderkey").alias("k"), F.col("l_partkey").alias("pa"))
    b = li.select(F.col("l_orderkey").alias("k"), F.col("l_partkey").alias("pb"))
    edges = (
        a.join(b, "k")
        .filter(F.col("pa") < F.col("pb"))
        .select(F.col("pa").alias("src"), F.col("pb").alias("dst"))
        .distinct()
    )
    return clustering_coefficient(edges)


def q_stratified_sample(spark, sf_dir):
    """Deterministic per-language sampling quotas (md5-threshold per
    stratum) — the reproducible eval-split / rebalance primitive."""
    from ctinexus_spark.operators.prepare import stratified_sample

    docs = _docs(spark, sf_dir).select("doc_id", "lang")
    return stratified_sample(docs, "lang", {"en": 0.2, "fr": 0.5}, default_frac=0.05)


def q_mixture_plan(spark, sf_dir):
    """Deterministic weighted dataset mixing: src0 appears 3x and src1
    2x as often as the rest at every schedule prefix; global rank via
    range-repartition + broadcast offsets (no single-task window)."""
    from ctinexus_spark.operators.prepare import mixture_plan

    docs = _docs(spark, sf_dir).select("doc_id", "source")
    return mixture_plan(docs, {"src0": 3.0, "src1": 2.0}).select(
        "doc_id", "source", "mix_rank"
    )


def q_decontaminate(spark, sf_dir):
    """Benchmark n-gram decontamination (GPT-3's 13-gram rule; n=8
    here so every 10..99-token synthetic doc has grams). Benchmark set
    = every 97th doc, standing in for a held-out eval suite; its
    distinct gram hashes broadcast against one linear scan of the
    corpus."""
    from ctinexus_spark.operators.prepare import decontaminate

    docs = _docs(spark, sf_dir)
    bench = docs.filter(F.col("doc_id") % 97 == 0)
    return decontaminate(docs, bench, n=8)


def q_line_dedup(spark, sf_dir):
    """CCNet-style corpus-wide line dedup. The synthetic docs are
    single-line, so the query derives a multi-line view (newline after
    every 3rd token — 3-token lines repeat across this corpus, ~19%
    dupes at sf0.01) and dedups lines to their first (doc_id,
    line_idx) occurrence."""
    from ctinexus_spark.operators.prepare import line_dedup

    docs = _docs(spark, sf_dir).select(
        "doc_id",
        F.regexp_replace("text", r"(\S+ \S+ \S+) ", "$1\n").alias("text"),
    )
    return line_dedup(docs)


def q_domain_cap(spark, sf_dir):
    """RefinedWeb-style per-source quota: at most 10 docs per source
    (sf0.01 carries 25/source, so the cap truncates) in deterministic
    md5(id) order, via the skew-safe two-phase top-n."""
    from ctinexus_spark.operators.prepare import domain_cap

    return domain_cap(_docs(spark, sf_dir), max_per_key=10).select(
        "doc_id", "source", "capped_rank"
    )


def q_dsir_features(spark, sf_dir):
    """DSIR-shaped importance features: every doc scored under a
    bigram LM trained on the lang='en' target subset vs one trained on
    the full corpus (the data-selection likelihood-ratio shape).
    log_weight is informational-only and kept out of the hash-checked
    projection."""
    docs = _docs(spark, sf_dir)
    return T.dsir_features(docs, docs.filter(F.col("lang") == "en")).select(
        "doc_id", "n_bigrams", "mean_p_target", "mean_p_corpus"
    )


def q_vocab_topk(spark, sf_dir):
    """Top-20 token-frequency vocabulary (tokenizer-induction step
    one); global top-k planned as TakeOrderedAndProject."""
    return T.vocab_topk(_docs(spark, sf_dir), k=20)


def q_cdc_chunks(spark, sf_dir):
    """Content-defined chunking: boundaries where a token's md5 ends
    in nibble 0 (1/16) — chunk ids stable under upstream edits."""
    from ctinexus_spark.operators.prepare import cdc_chunks

    return cdc_chunks(_docs(spark, sf_dir))


def q_langid(spark, sf_dir):
    """Self-trained TextCat trigram language ID: per-lang top-100
    trigram profiles from the labeled corpus, argmax profile hits.
    NOTE the synthetic corpus's 'languages' all share one 31-token
    vocabulary (no real language signal), so accuracy here (~0.27) is
    the data's ceiling; the oracle checks the mechanics exactly and
    tests/test_textops.py pins real-signal behavior on genuinely
    distinct languages."""
    return T.langid_trigram(_docs(spark, sf_dir))


def q_table_profile(spark, sf_dir):
    """Single-pass column profile of the documents table (null counts,
    distinct counts, lexicographic string min/max per column) — the
    data-quality health check run before processing a drop."""
    return T.profile_columns(
        spark.read.parquet(f"{sf_dir}/documents.parquet"),
        ["doc_id", "text", "lang", "source", "n_chars"],
    )


def q_bpe_merges(spark, sf_dir):
    """Top-100 adjacent pre-tokenization piece pairs — the BPE merge-
    candidate table (the count a BPE trainer maximizes per merge)."""
    return T.bpe_merge_pairs(_docs(spark, sf_dir), k=100)


def q_token_pmi(spark, sf_dir):
    """Top-100 adjacent-token collocations by the PMI ratio
    p(a,b)/(p(a)p(b)) — phrase-mining over the corpus; the ratio is a
    fixed-order IEEE chain so both engines agree bit-for-bit."""
    return T.token_pmi(_docs(spark, sf_dir), min_count=3, k=100)


def q_dup_grams(spark, sf_dir):
    """Cross-document duplicated-text fraction per doc (Lee et al.
    2022 measurement) over 3-grams — the sf corpus has no shared
    8-grams but ~19% repeated 3-token spans, so 3 is the
    discriminating width here."""
    from ctinexus_spark.operators.prepare import dup_gram_fraction

    return dup_gram_fraction(_docs(spark, sf_dir), n=3)


# --- oracle SQL ---------------------------------------------------------

# SQL string literals: single quotes doubled ("don't" → 'don''t')
_STOPS = ", ".join("'" + w.replace("'", "''") + "'" for w in STOPWORD_LIST)
_TOKS = "str_split(text, ' ')"

_SHINGLES = (
    "CASE WHEN len(str_split(text,' ')) >= 3 THEN "
    "list_distinct(list_transform(range(1, len(str_split(text,' ')) - 1), "
    "i -> array_to_string(list_slice(str_split(text,' '), i, i + 2), ' '))) "
    "ELSE [] END"
)

_MINHASH_COLS = ", ".join(
    f"min(md5('{s}|' || shingle)) AS h{s}" for s in range(D.MINHASH_SEEDS)
)

_SIG = f"""
sig AS (
  SELECT doc_id, {_MINHASH_COLS}
  FROM (SELECT doc_id, unnest({_SHINGLES}) AS shingle FROM documents)
  GROUP BY doc_id
)
"""

_N_BANDS = D.MINHASH_SEEDS // D.BAND_SIZE
_BAND_ROWS = " UNION ALL ".join(
    f"SELECT doc_id, {b} AS band_idx, md5(h{b * D.BAND_SIZE} || '|' || h{b * D.BAND_SIZE + 1}) AS band_key FROM sig"
    for b in range(_N_BANDS)
)

_HYPERPLANES = S.hyperplane_signs()

# LSH candidate pairs with the degenerate-bucket cap — shared by the
# lsh_candidates and shingle_overlap oracles (must match
# D.lsh_candidates bit for bit).
_CAND_CTES = f"""{_SIG}, bands AS ({_BAND_ROWS}),
okbuckets AS (
  SELECT band_idx, band_key FROM bands GROUP BY band_idx, band_key HAVING count(*) <= {D.MAX_BUCKET}
),
bandsf AS (
  SELECT b.doc_id, b.band_idx, b.band_key FROM bands b JOIN okbuckets USING (band_idx, band_key)
),
cand AS (
  SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
  FROM bandsf a JOIN bandsf b
    ON a.band_idx = b.band_idx AND a.band_key = b.band_key AND a.doc_id < b.doc_id
)"""

# banded vector-LSH buckets (4 bands × 8 planes, global plane index
# b*8+p) — shared hyperplanes with S.lsh_band_buckets
_N_VBANDS, _VBAND_PLANES = 4, 8
_HP_BANDED = S.hyperplane_signs(planes=_N_VBANDS * _VBAND_PLANES)


def _plane_sql_from(signs: list[list[int]], p: int) -> str:
    lits = ", ".join(f"{float(s)}" for s in signs[p])
    return (
        f"(list_sum(list_transform(range(1, 65), "
        f"i -> embedding[i]::DOUBLE * ([{lits}])[i])) >= 0)"
    )


def _vband_bucket_sql(b: int, band_planes: int = _VBAND_PLANES) -> str:
    return "concat(" + ", ".join(
        f"CASE WHEN {_plane_sql_from(_HP_BANDED, b * band_planes + p)} THEN '1' ELSE '0' END"
        for p in range(band_planes)
    ) + ")"


_VBANDS_ROWS = " UNION ALL ".join(
    f"SELECT vec_id, {b} AS band_idx, {_vband_bucket_sql(b)} AS bucket FROM embeddings"
    for b in range(_N_VBANDS)
)

_CENTROIDS = S.ivf_centroids()
_CENTROID_VALUES = ", ".join(
    f"({i}, [{', '.join(f'{x!r}' for x in c)}]::DOUBLE[])" for i, c in enumerate(_CENTROIDS)
)
# nearest centroid: max cosine, ties toward higher cell index (matches
# Spark's struct array_max ordering)
_IVF_ASSIGN_SQL = f"""
cents(cell, cvec) AS (SELECT * FROM (VALUES {_CENTROID_VALUES})),
scored_cells AS (
  SELECT e.vec_id, c.cell,
         list_cosine_similarity(e.embedding::DOUBLE[], c.cvec) AS cos
  FROM embeddings e CROSS JOIN cents c
),
assign AS (
  SELECT vec_id, CAST(cell AS INT) AS cell FROM (
    SELECT vec_id, cell,
           row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, cell DESC) AS rn
    FROM scored_cells
  ) WHERE rn = 1
)
"""


def _plane_sql(p: int) -> str:
    lits = ", ".join(f"{float(s)}" for s in _HYPERPLANES[p])
    return (
        f"(list_sum(list_transform(range(1, 65), "
        f"i -> embedding[i]::DOUBLE * ([{lits}])[i])) >= 0)"
    )


_BUCKET_SQL = "concat(" + ", ".join(
    f"CASE WHEN {_plane_sql(p)} THEN '1' ELSE '0' END" for p in range(S.N_PLANES)
) + ")"

ORACLES = {
    "token_stats": f"""
SELECT doc_id,
       CAST(len({_TOKS}) AS BIGINT) AS n_tokens,
       CAST(length(text) AS BIGINT) AS n_chars,
       CAST(len(list_distinct({_TOKS})) AS BIGINT) AS n_distinct_tokens
FROM documents
""",
    "quality": f"""
SELECT doc_id,
       CAST(len(list_filter({_TOKS}, w -> w IN ({_STOPS}))) AS DOUBLE)
         / CAST(len({_TOKS}) AS DOUBLE) AS stopword_ratio,
       CAST(length(text) - (len({_TOKS}) - 1) AS DOUBLE)
         / CAST(len({_TOKS}) AS DOUBLE) AS mean_token_len,
       CAST(len(list_distinct({_TOKS})) AS DOUBLE)
         / CAST(len({_TOKS}) AS DOUBLE) AS distinct_ratio
FROM documents
""",
    "doc_chunks": """
WITH tk AS (SELECT doc_id, str_split(text, ' ') AS l FROM documents),
nc AS (
  SELECT doc_id, l,
         1 + CAST(floor((greatest(len(l) - 64, 0) + 47) / 48.0) AS INT) AS n_chunks
  FROM tk
)
SELECT doc_id, CAST(i AS INT) AS chunk_idx,
       array_to_string(list_slice(l, i * 48 + 1, i * 48 + 64), ' ') AS chunk_text,
       CAST(len(list_slice(l, i * 48 + 1, i * 48 + 64)) AS BIGINT) AS n_tokens
FROM nc, unnest(range(0, n_chunks)) t(i)
""",
    "pack_plan": """
WITH n AS (
  SELECT doc_id, source AS shard,
         CAST(len(str_split(text, ' ')) AS BIGINT) AS n_tokens
  FROM documents
),
c AS (
  SELECT doc_id, shard, n_tokens,
         sum(n_tokens) OVER (PARTITION BY shard
           ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS cum
  FROM n
)
SELECT doc_id, shard,
       CAST(floor((cum - n_tokens) / 256.0) AS BIGINT) AS pack_id,
       CAST(cum - n_tokens AS BIGINT) AS start_offset,
       n_tokens
FROM c
""",
    "decontaminate": """
WITH g8 AS (
  SELECT doc_id,
         CASE WHEN len(str_split(text, ' ')) >= 8 THEN
           list_distinct(list_transform(range(1, len(str_split(text, ' ')) - 6),
             i -> array_to_string(list_slice(str_split(text, ' '), i, i + 7), ' ')))
         ELSE [] END AS grams
  FROM documents
),
bg AS (
  SELECT DISTINCT md5(g) AS gh
  FROM (SELECT unnest(grams) AS g FROM g8 WHERE doc_id % 97 = 0)
),
dg AS (
  SELECT doc_id, md5(g) AS gh
  FROM (SELECT doc_id, unnest(grams) AS g FROM g8)
),
hits AS (
  SELECT doc_id, count(*) AS n_hits FROM dg JOIN bg USING (gh) GROUP BY doc_id
)
SELECT d.doc_id,
       CAST(coalesce(h.n_hits, 0) AS BIGINT) AS n_hits,
       coalesce(h.n_hits, 0) > 0 AS contaminated
FROM documents d LEFT JOIN hits h USING (doc_id)
""",
    # raw string: '\n' / '\S' must reach DuckDB's regex engine escaped
    "line_dedup": r"""
WITH docs2 AS (
  SELECT doc_id,
         regexp_replace(text, '(\S+ \S+ \S+) ', '\1' || chr(10), 'g') AS text
  FROM documents
),
ln AS (
  SELECT doc_id, CAST(i - 1 AS INT) AS line_idx, l[i] AS line
  FROM (SELECT doc_id, str_split_regex(text, '\n') AS l FROM docs2) t,
       unnest(range(1, len(l) + 1)) u(i)
),
win AS (
  SELECT md5(line) AS h,
         min(struct_pack(i := doc_id, x := line_idx)) AS w
  FROM ln GROUP BY md5(line)
),
kept AS (
  SELECT ln.doc_id, ln.line_idx, ln.line
  FROM ln JOIN win ON md5(ln.line) = win.h
  WHERE ln.doc_id = (win.w).i AND ln.line_idx = (win.w).x
),
agg AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_kept,
         array_to_string(list(line ORDER BY line_idx), chr(10)) AS kept_text
  FROM kept GROUP BY doc_id
)
SELECT d.doc_id,
       CAST(len(str_split_regex(d.text, '\n')) AS BIGINT) AS n_lines,
       CAST(coalesce(a.n_kept, 0) AS BIGINT) AS n_kept,
       coalesce(a.kept_text, '') AS kept_text
FROM docs2 d LEFT JOIN agg a USING (doc_id)
""",
    "domain_cap": """
SELECT doc_id, source, CAST(r AS INT) AS capped_rank
FROM (
  SELECT doc_id, source,
         row_number() OVER (
           PARTITION BY source
           ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
         ) AS r
  FROM documents
)
WHERE r <= 10
""",
    "vocab_topk": """
SELECT token, freq, CAST(row_number() OVER (ORDER BY freq DESC, token) AS INT) AS rank
FROM (
  SELECT token, CAST(count(*) AS BIGINT) AS freq
  FROM (SELECT unnest(str_split(text, ' ')) AS token FROM documents)
  GROUP BY token
)
ORDER BY freq DESC, token
LIMIT 20
""",
    "lm_scores": """
WITH tk AS (SELECT doc_id, str_split(text, ' ') AS l FROM documents),
words AS (SELECT unnest(l) AS w FROM tk),
vocab AS (SELECT count(DISTINCT w) AS v FROM words),
c1 AS (SELECT w AS w1, count(*) AS c1 FROM words GROUP BY w),
bg AS (
  SELECT doc_id, CAST(i - 1 AS INT) AS pos, l[i] AS w1, l[i + 1] AS w2
  FROM tk, unnest(range(1, len(l))) t(i)
  WHERE len(l) >= 2
),
c2 AS (SELECT w1, w2, count(*) AS c2 FROM bg GROUP BY w1, w2),
scored AS (
  SELECT b.doc_id, b.pos,
         CAST(c2.c2 + 1 AS DOUBLE) / CAST(c1.c1 + (SELECT v FROM vocab) AS DOUBLE) AS p
  FROM bg b JOIN c2 ON b.w1 = c2.w1 AND b.w2 = c2.w2 JOIN c1 ON b.w1 = c1.w1
)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
       list_sum(list(p ORDER BY pos)) / count(*) AS mean_prob
FROM scored GROUP BY doc_id
""",
    "dsir_features": """
WITH tk AS (SELECT doc_id, str_split(text, ' ') AS l FROM documents),
bg AS (
  SELECT doc_id, CAST(i - 1 AS INT) AS pos, l[i] AS w1, l[i + 1] AS w2
  FROM tk, unnest(range(1, len(l))) t(i)
  WHERE len(l) >= 2
),
words_c AS (SELECT unnest(l) AS w FROM tk),
vocab_c AS (SELECT count(DISTINCT w) AS v FROM words_c),
c1_c AS (SELECT w AS w1, count(*) AS c1 FROM words_c GROUP BY w),
c2_c AS (SELECT w1, w2, count(*) AS c2 FROM bg GROUP BY w1, w2),
tk_t AS (SELECT doc_id, str_split(text, ' ') AS l FROM documents WHERE lang = 'en'),
bg_t AS (
  SELECT l[i] AS w1, l[i + 1] AS w2
  FROM tk_t, unnest(range(1, len(l))) t(i)
  WHERE len(l) >= 2
),
words_t AS (SELECT unnest(l) AS w FROM tk_t),
vocab_t AS (SELECT count(DISTINCT w) AS v FROM words_t),
c1_t AS (SELECT w AS w1, count(*) AS c1 FROM words_t GROUP BY w),
c2_t AS (SELECT w1, w2, count(*) AS c2 FROM bg_t GROUP BY w1, w2),
scored AS (
  SELECT b.doc_id, b.pos,
         CAST(coalesce(ct2.c2, 0) + 1 AS DOUBLE)
           / CAST(coalesce(ct1.c1, 0) + (SELECT v FROM vocab_t) AS DOUBLE) AS pt,
         CAST(cc2.c2 + 1 AS DOUBLE)
           / CAST(cc1.c1 + (SELECT v FROM vocab_c) AS DOUBLE) AS pc
  FROM bg b
  LEFT JOIN c2_t ct2 ON b.w1 = ct2.w1 AND b.w2 = ct2.w2
  LEFT JOIN c1_t ct1 ON b.w1 = ct1.w1
  JOIN c2_c cc2 ON b.w1 = cc2.w1 AND b.w2 = cc2.w2
  JOIN c1_c cc1 ON b.w1 = cc1.w1
)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
       list_sum(list(pt ORDER BY pos)) / count(*) AS mean_p_target,
       list_sum(list(pc ORDER BY pos)) / count(*) AS mean_p_corpus
FROM scored GROUP BY doc_id
""",
    "gopher_rules": f"""
SELECT doc_id,
       CAST(len({_TOKS}) AS BIGINT) AS n_words,
       CAST(length(text) - (len({_TOKS}) - 1) AS DOUBLE) / len({_TOKS}) AS mean_word_len,
       CAST(len(list_filter({_TOKS}, w -> regexp_matches(w, '[A-Za-z]'))) AS DOUBLE)
         / len({_TOKS}) AS frac_words_alpha,
       CAST(len(list_intersect(list_distinct(list_transform({_TOKS}, w -> lower(w))),
                ['the','be','to','of','and','that','have','with'])) AS BIGINT)
         AS required_stop_hits,
       CAST(length(text) - length(regexp_replace(text, '[#…]', '', 'g')) AS DOUBLE)
         / len({_TOKS}) AS symbol_ratio,
       (len({_TOKS}) >= 50 AND len({_TOKS}) <= 100000
        AND CAST(length(text) - (len({_TOKS}) - 1) AS DOUBLE) / len({_TOKS}) >= 3.0
        AND CAST(length(text) - (len({_TOKS}) - 1) AS DOUBLE) / len({_TOKS}) <= 10.0
        AND CAST(len(list_filter({_TOKS}, w -> regexp_matches(w, '[A-Za-z]'))) AS DOUBLE)
              / len({_TOKS}) >= 0.8
        AND len(list_intersect(list_distinct(list_transform({_TOKS}, w -> lower(w))),
                ['the','be','to','of','and','that','have','with'])) >= 2
        AND CAST(length(text) - length(regexp_replace(text, '[#…]', '', 'g')) AS DOUBLE)
              / len({_TOKS}) <= 0.1) AS passes_gopher
FROM documents
""",
    "repetition_ratios": f"""
WITH words AS (SELECT doc_id, unnest({_TOKS}) AS gram FROM documents),
wc AS (SELECT doc_id, gram, count(*) AS c FROM words GROUP BY doc_id, gram),
wtop AS (SELECT doc_id, CAST(max(c) AS DOUBLE) / CAST(sum(c) AS DOUBLE) AS top_word_frac
         FROM wc GROUP BY doc_id),
bigr AS (
  SELECT doc_id, unnest(
    CASE WHEN len({_TOKS}) >= 2 THEN
      list_transform(range(1, len({_TOKS})), i -> {_TOKS}[i] || ' ' || {_TOKS}[i + 1])
    ELSE CAST([] AS VARCHAR[]) END) AS gram
  FROM documents
),
bc AS (SELECT doc_id, gram, count(*) AS c FROM bigr GROUP BY doc_id, gram),
btop AS (SELECT doc_id, CAST(max(c) AS DOUBLE) / CAST(sum(c) AS DOUBLE) AS top_bigram_frac
         FROM bc GROUP BY doc_id)
SELECT w.doc_id, w.top_word_frac, b.top_bigram_frac
FROM wtop w JOIN btop b ON w.doc_id = b.doc_id
""",
    "redact_pii": r"""
WITH aug AS (SELECT doc_id, text || ' contact intruder' || CAST(doc_id AS VARCHAR) || '@malicious-' || CAST(doc_id % 7 AS VARCHAR) || '.example.com from 10.' || CAST(doc_id % 250 AS VARCHAR) || '.0.9 ref 123-45-6789' AS text FROM documents)
SELECT doc_id,
       regexp_replace(regexp_replace(regexp_replace(regexp_replace(text, $$[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}$$, '<EMAIL>', 'g'), $$\b(?:\d{1,3}\.){3}\d{1,3}\b$$, '<IP>', 'g'), $$\+\d{1,3}[ -]\d{2,4}[ -]\d{3,4}[ -]\d{3,4}$$, '<PHONE>', 'g'), $$\b\d{3}-\d{2}-\d{4}\b$$, '<SSN>', 'g') AS redacted_text,
       CAST(len(regexp_extract_all(text, $$[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}$$)) AS BIGINT) AS n_email,
       CAST(len(regexp_extract_all(text, $$\b(?:\d{1,3}\.){3}\d{1,3}\b$$)) AS BIGINT) AS n_ipv4,
       CAST(len(regexp_extract_all(text, $$\+\d{1,3}[ -]\d{2,4}[ -]\d{3,4}[ -]\d{3,4}$$)) AS BIGINT) AS n_phone,
       CAST(len(regexp_extract_all(text, $$\b\d{3}-\d{2}-\d{4}\b$$)) AS BIGINT) AS n_ssn
FROM aug
""",
    "lang_features": f"""
SELECT doc_id,
       CAST(len(list_filter({_TOKS}, w -> lower(w) IN ({_STOPS}))) AS DOUBLE)
         / CAST(len({_TOKS}) AS DOUBLE) AS en_stopword_rate,
       CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS DOUBLE)
         / CAST(length(text) AS DOUBLE) AS ascii_letter_ratio
FROM documents
""",
    "fingerprints": """
SELECT doc_id, md5(text) AS fingerprint FROM documents
""",
    "bpe_tokens": f"""
SELECT doc_id,
       CAST(len({_TOKS}) AS BIGINT) AS n_ws_tokens,
       CAST(len(regexp_extract_all(text, '{T.BPE_SPLIT_PATTERN}')) AS BIGINT) AS n_bpe_pieces,
       CAST(len(regexp_extract_all(text, '{T.BPE_SPLIT_PATTERN}')) AS DOUBLE)
         / CAST(len({_TOKS}) AS DOUBLE) AS pieces_per_word
FROM documents
""",
    "table_profile": " UNION ALL ".join(
        f"""SELECT '{c}' AS "column",
       CAST(sum(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
       CAST(count(DISTINCT {c}) AS BIGINT) AS n_distinct,
       min(CAST({c} AS VARCHAR)) AS min_value,
       max(CAST({c} AS VARCHAR)) AS max_value
FROM documents"""
        for c in ["doc_id", "text", "lang", "source", "n_chars"]
    ),
    "cdc_chunks": f"""
WITH pos AS (
  SELECT doc_id, i - 1 AS pos, l[i] AS tok,
         CASE WHEN substr(md5(l[i]), 32, 1) = '0' THEN 1 ELSE 0 END AS b
  FROM (SELECT doc_id, {_TOKS} AS l FROM documents), unnest(range(1, len(l) + 1)) t(i)
),
ch AS (
  SELECT doc_id, pos, tok,
         CAST(coalesce(sum(b) OVER (PARTITION BY doc_id ORDER BY pos
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS INT) AS chunk_idx
  FROM pos
)
SELECT doc_id, chunk_idx,
       array_to_string(list(tok ORDER BY pos), ' ') AS chunk_text,
       CAST(count(*) AS BIGINT) AS n_tokens
FROM ch GROUP BY doc_id, chunk_idx
""",
    "langid": f"""
WITH tri AS (
  SELECT doc_id, lang, substr(text, i, 3) AS t
  FROM documents, unnest(range(1, length(text) - 1)) u(i)
  WHERE length(text) >= 3
),
counts AS (SELECT lang AS plang, t, count(*) AS c FROM tri GROUP BY lang, t),
prof AS (
  SELECT plang, t FROM (
    SELECT plang, t, row_number() OVER (PARTITION BY plang ORDER BY c DESC, t) AS r
    FROM counts
  ) WHERE r <= 100
),
dt AS (SELECT DISTINCT doc_id, t FROM tri),
hits AS (
  SELECT dt.doc_id, prof.plang, CAST(count(*) AS BIGINT) AS h
  FROM dt JOIN prof USING (t) GROUP BY dt.doc_id, prof.plang
),
best AS (
  SELECT doc_id, min(struct_pack(n := -h, l := plang)) AS w
  FROM hits GROUP BY doc_id
)
SELECT d.doc_id,
       coalesce(b.w.l, 'und') AS pred_lang,
       CAST(coalesce(-b.w.n, 0) AS BIGINT) AS n_hits
FROM documents d LEFT JOIN best b USING (doc_id)
""",
    "bpe_merges": f"""
WITH p AS (
  SELECT regexp_extract_all(text, '{T.BPE_SPLIT_PATTERN}') AS l FROM documents
),
pr AS (
  SELECT l[i] AS "left", l[i + 1] AS "right"
  FROM p, unnest(range(1, len(l))) t(i)
  WHERE len(l) >= 2
),
f AS (
  SELECT "left", "right", CAST(count(*) AS BIGINT) AS freq
  FROM pr GROUP BY "left", "right"
  ORDER BY freq DESC, "left", "right" LIMIT 100
)
SELECT "left", "right", freq,
       CAST(row_number() OVER (ORDER BY freq DESC, "left", "right") AS INT) AS rank
FROM f
""",
    "token_pmi": f"""
WITH tk AS (SELECT {_TOKS} AS l FROM documents),
w AS (SELECT unnest(l) AS w FROM tk),
uni AS (SELECT w, CAST(count(*) AS BIGINT) AS n_w FROM w GROUP BY w),
pr AS (
  SELECT l[i] AS "left", l[i + 1] AS "right"
  FROM tk, unnest(range(1, len(l))) t(i)
  WHERE len(l) >= 2
),
pc AS (
  SELECT "left", "right", CAST(count(*) AS BIGINT) AS n_pair
  FROM pr GROUP BY "left", "right"
),
tot AS (
  SELECT CAST((SELECT count(*) FROM w) AS DOUBLE) AS n_tokens,
         CAST((SELECT count(*) FROM pr) AS DOUBLE) AS n_pairs
),
j AS (
  SELECT pc."left", pc."right", pc.n_pair,
         ul.n_w AS n_left, ur.n_w AS n_right,
         CAST(pc.n_pair AS DOUBLE) * t.n_tokens * t.n_tokens
           / (t.n_pairs * CAST(ul.n_w AS DOUBLE) * CAST(ur.n_w AS DOUBLE)) AS pmi_ratio
  FROM pc
  JOIN uni ul ON pc."left" = ul.w
  JOIN uni ur ON pc."right" = ur.w
  CROSS JOIN tot t
  WHERE pc.n_pair >= 3
),
top AS (
  SELECT * FROM j ORDER BY pmi_ratio DESC, "left", "right" LIMIT 100
)
SELECT "left", "right", n_pair, n_left, n_right, pmi_ratio,
       CAST(row_number() OVER (ORDER BY pmi_ratio DESC, "left", "right") AS INT) AS rank
FROM top
""",
    "dup_grams": f"""
WITH g AS (
  SELECT doc_id,
         CASE WHEN len({_TOKS}) >= 3 THEN
           list_distinct(list_transform(range(1, len({_TOKS}) - 1),
             i -> array_to_string(list_slice({_TOKS}, i, i + 2), ' ')))
         ELSE [] END AS grams
  FROM documents
),
dg AS (
  SELECT doc_id, md5(gr) AS gh
  FROM (SELECT doc_id, unnest(grams) AS gr FROM g)
),
nd AS (SELECT gh, CAST(count(*) AS BIGINT) AS n_docs FROM dg GROUP BY gh),
s AS (
  SELECT dg.doc_id, CAST(count(*) AS BIGINT) AS n_grams,
         CAST(sum(CASE WHEN nd.n_docs >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_shared
  FROM dg JOIN nd USING (gh) GROUP BY dg.doc_id
)
SELECT d.doc_id,
       CAST(coalesce(s.n_grams, 0) AS BIGINT) AS n_grams,
       CAST(coalesce(s.n_shared, 0) AS BIGINT) AS n_shared,
       CASE WHEN coalesce(s.n_grams, 0) > 0
            THEN CAST(coalesce(s.n_shared, 0) AS DOUBLE) / CAST(s.n_grams AS DOUBLE)
            ELSE 0.0 END AS dup_fraction
FROM documents d LEFT JOIN s USING (doc_id)
""",
    "winnow_fp": f"""
WITH sh AS (
  SELECT doc_id, i AS pos,
         md5(array_to_string(list_slice({_TOKS}, i + 1, i + 3), ' ')) AS h
  FROM (
    SELECT doc_id, text,
           unnest(range(0, greatest(0, len({_TOKS}) - 2))) AS i
    FROM documents
  )
),
wm AS (
  SELECT doc_id,
         min(h) OVER (PARTITION BY doc_id ORDER BY pos
                      ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS fingerprint
  FROM sh
)
SELECT DISTINCT doc_id, fingerprint FROM wm
""",
    "dedup_exact": """
SELECT md5(text) AS fingerprint,
       min(doc_id) AS canonical_id,
       CAST(count(*) AS BIGINT) AS n_docs
FROM documents GROUP BY md5(text)
""",
    "minhash": f"WITH {_SIG} SELECT * FROM sig",
    "lsh_bands": f"WITH {_SIG}, bands AS ({_BAND_ROWS}) SELECT doc_id, CAST(band_idx AS INT) AS band_idx, band_key FROM bands",
    "lsh_candidates": f"""
WITH {_CAND_CTES}
SELECT a_id, b_id FROM cand
""",
    "shingle_overlap": f"""
WITH {_CAND_CTES},
sh AS (SELECT doc_id, unnest({_SHINGLES}) AS shingle FROM documents),
cnt AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n FROM sh GROUP BY doc_id),
shared AS (
  SELECT c.a_id, c.b_id, CAST(count(*) AS BIGINT) AS n_shared
  FROM cand c
  JOIN sh a ON a.doc_id = c.a_id
  JOIN sh b ON b.doc_id = c.b_id AND b.shingle = a.shingle
  GROUP BY c.a_id, c.b_id HAVING count(*) >= 2
)
SELECT s.a_id, s.b_id, s.n_shared,
       CAST(s.n_shared AS DOUBLE) / CAST(ca.n + cb.n - s.n_shared AS DOUBLE) AS jaccard
FROM shared s
JOIN cnt ca ON s.a_id = ca.doc_id
JOIN cnt cb ON s.b_id = cb.doc_id
""",
    # simhash: 48-bit sign-sum in SQL — parse the first 12 md5 hex
    # chars per token as a BIGINT, sum ±1 per bit position weighted by
    # token multiplicity, OR-fold the positive bits back into a bigint.
    "simhash": """
WITH tok AS (
  SELECT doc_id, t, CAST(count(*) AS BIGINT) AS cnt
  FROM (SELECT doc_id, unnest(str_split(text, ' ')) AS t FROM documents)
  GROUP BY doc_id, t
),
hv AS (
  SELECT doc_id, cnt,
         CAST(list_sum(list_transform(range(1, 13),
           i -> CAST(strpos('0123456789abcdef', substr(md5(t), i, 1)) - 1 AS BIGINT)
                * (CAST(1 AS BIGINT) << ((12 - i) * 4)))) AS BIGINT) AS h
  FROM tok
),
bits AS (
  SELECT doc_id, j,
         sum(CASE WHEN (h >> CAST(j AS INT)) & 1 = 1 THEN cnt ELSE -cnt END) AS acc
  FROM hv, range(0, 48) r(j)
  GROUP BY doc_id, j
)
SELECT doc_id,
       CAST(sum(CASE WHEN acc > 0 THEN (CAST(1 AS BIGINT) << CAST(j AS INT)) ELSE 0 END) AS BIGINT) AS simhash
FROM bits GROUP BY doc_id
""",
    # simhash_candidates: sketch from the simhash oracle logic, then
    # pigeonhole 12-bit chunks → bucket join → exact hamming filter.
    "simhash_candidates": """
WITH tok AS (
  SELECT doc_id, t, CAST(count(*) AS BIGINT) AS cnt
  FROM (SELECT doc_id, unnest(str_split(text, ' ')) AS t FROM documents)
  GROUP BY doc_id, t
),
hv AS (
  SELECT doc_id, cnt,
         CAST(list_sum(list_transform(range(1, 13),
           i -> CAST(strpos('0123456789abcdef', substr(md5(t), i, 1)) - 1 AS BIGINT)
                * (CAST(1 AS BIGINT) << ((12 - i) * 4)))) AS BIGINT) AS h
  FROM tok
),
bits AS (
  SELECT doc_id, j,
         sum(CASE WHEN (h >> CAST(j AS INT)) & 1 = 1 THEN cnt ELSE -cnt END) AS acc
  FROM hv, range(0, 48) r(j)
  GROUP BY doc_id, j
),
sh AS (
  SELECT doc_id,
         CAST(sum(CASE WHEN acc > 0 THEN (CAST(1 AS BIGINT) << CAST(j AS INT)) ELSE 0 END) AS BIGINT) AS simhash
  FROM bits GROUP BY doc_id
),
chunks0 AS (
  SELECT doc_id, simhash, CAST(b AS INT) AS band_idx,
         (simhash >> CAST(b * 12 AS INT)) & 4095 AS chunk
  FROM sh, range(0, 4) r(b)
),
okch AS (
  SELECT band_idx, chunk FROM chunks0 GROUP BY band_idx, chunk HAVING count(*) <= 1000
),
chunks AS (
  SELECT c.doc_id, c.simhash, c.band_idx, c.chunk
  FROM chunks0 c JOIN okch USING (band_idx, chunk)
)
SELECT a_id, b_id, hamming FROM (
  SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id,
         CAST(bit_count(xor(a.simhash, b.simhash)) AS INT) AS hamming
  FROM chunks a JOIN chunks b
    ON a.band_idx = b.band_idx AND a.chunk = b.chunk AND a.doc_id < b.doc_id
) WHERE hamming <= 3
""",
    # dedup_clusters_cc: min-reachable-label components via recursive
    # transitive closure over the (capped) LSH candidate-pair graph —
    # the SQL twin of graph/components.py's label propagation.
    "dedup_clusters_cc": f"""
WITH RECURSIVE {_CAND_CTES},
sym AS (
  SELECT a_id AS a, b_id AS b FROM cand
  UNION
  SELECT b_id AS a, a_id AS b FROM cand
),
verts AS (SELECT DISTINCT a AS v FROM sym),
reach(v, r) AS (
  SELECT v, v FROM verts
  UNION
  SELECT reach.v, s.b FROM reach JOIN sym s ON reach.r = s.a
)
SELECT v AS vertex, min(r) AS component FROM reach GROUP BY v
""",
    # dedup_keeplist: survivors = all docs minus non-canonical cluster
    # members from the recursive-CTE transitive closure over capped
    # LSH candidate pairs (twin of D.dedup_keep_list).
    "dedup_keeplist": f"""
WITH RECURSIVE {_CAND_CTES},
sym AS (
  SELECT a_id AS a, b_id AS b FROM cand
  UNION
  SELECT b_id AS a, a_id AS b FROM cand
),
verts AS (SELECT DISTINCT a AS v FROM sym),
reach(v, r) AS (
  SELECT v, v FROM verts
  UNION
  SELECT reach.v, s.b FROM reach JOIN sym s ON reach.r = s.a
),
cc AS (SELECT v AS vertex, min(r) AS component FROM reach GROUP BY v)
SELECT doc_id FROM documents
WHERE doc_id NOT IN (SELECT vertex FROM cc WHERE vertex != component)
""",
    "emb_cosine_pairs": f"""
WITH vb AS ({_VBANDS_ROWS}),
okb AS (
  SELECT band_idx, bucket FROM vb GROUP BY band_idx, bucket HAVING count(*) <= {D.MAX_BUCKET}
),
vbf AS (SELECT vb.vec_id, vb.band_idx, vb.bucket FROM vb JOIN okb USING (band_idx, bucket)),
cand AS (
  SELECT DISTINCT a.vec_id AS a_id, b.vec_id AS b_id
  FROM vbf a JOIN vbf b
    ON a.band_idx = b.band_idx AND a.bucket = b.bucket AND a.vec_id < b.vec_id
)
SELECT c.a_id, c.b_id,
       list_cosine_similarity(ea.embedding::DOUBLE[], eb.embedding::DOUBLE[]) AS cosine
FROM cand c
JOIN embeddings ea ON c.a_id = ea.vec_id
JOIN embeddings eb ON c.b_id = eb.vec_id
WHERE list_cosine_similarity(ea.embedding::DOUBLE[], eb.embedding::DOUBLE[]) >= 0.3
""",
    "ann_topk": """
WITH scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         list_cosine_similarity(q.embedding::DOUBLE[], c.embedding::DOUBLE[]) AS cosine
  FROM embeddings q JOIN embeddings c ON q.vec_id != c.vec_id
  WHERE q.vec_id < 25
)
SELECT query_id, neighbor_id, CAST(rank AS INT) AS rank FROM (
  SELECT query_id, neighbor_id,
         row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rank
  FROM scored
) WHERE rank <= 5
""",
    "lsh_buckets": f"""
SELECT vec_id, {_BUCKET_SQL} AS bucket FROM embeddings
""",
    "lsh_topk": f"""
WITH b AS (SELECT vec_id, {_BUCKET_SQL} AS bucket FROM embeddings),
okb AS (SELECT bucket FROM b GROUP BY bucket HAVING count(*) <= {S.MAX_BUCKET}),
withb AS (SELECT e.vec_id, e.embedding, b.bucket FROM embeddings e
          JOIN b ON e.vec_id = b.vec_id JOIN okb ON b.bucket = okb.bucket),
scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         list_cosine_similarity(q.embedding::DOUBLE[], c.embedding::DOUBLE[]) AS cosine
  FROM withb q JOIN withb c ON q.bucket = c.bucket AND q.vec_id != c.vec_id
)
SELECT query_id, neighbor_id, CAST(rank AS INT) AS rank FROM (
  SELECT query_id, neighbor_id,
         row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rank
  FROM scored
) WHERE rank <= 5
""",
    "ivf_assign": f"""
WITH {_IVF_ASSIGN_SQL}
SELECT vec_id, cell FROM assign
""",
    # dedup_incremental: batch (odd ids) admitted against the even-id
    # corpus's band index; within-batch star-edge + transitive closure
    "dedup_incremental": f"""
WITH RECURSIVE
extra(doc_id, text) AS (VALUES {{extra_vals}}),
docs_all AS (
  SELECT doc_id, text FROM documents
  UNION ALL SELECT doc_id::BIGINT, text FROM extra
),
sig_b AS (
  SELECT doc_id, {_MINHASH_COLS}
  FROM (SELECT doc_id, unnest({_SHINGLES}) AS shingle FROM docs_all WHERE doc_id % 2 = 1)
  GROUP BY doc_id
),
bands_b AS ({" UNION ALL ".join(
    f"SELECT doc_id, {b} AS band_idx, md5(h{b * D.BAND_SIZE} || '|' || h{b * D.BAND_SIZE + 1}) AS band_key FROM sig_b"
    for b in range(_N_BANDS))}),
okb AS (
  SELECT band_idx, band_key FROM bands_b GROUP BY band_idx, band_key
  HAVING count(*) <= {D.MAX_BUCKET}
),
bf AS (SELECT b.doc_id, b.band_idx, b.band_key FROM bands_b b JOIN okb USING (band_idx, band_key)),
sig_i AS (
  SELECT doc_id, {_MINHASH_COLS}
  FROM (SELECT doc_id, unnest({_SHINGLES}) AS shingle FROM docs_all WHERE doc_id % 2 = 0)
  GROUP BY doc_id
),
bands_i AS ({" UNION ALL ".join(
    f"SELECT doc_id, {b} AS band_idx, md5(h{b * D.BAND_SIZE} || '|' || h{b * D.BAND_SIZE + 1}) AS band_key FROM sig_i"
    for b in range(_N_BANDS))}),
hit AS (
  SELECT DISTINCT bf.doc_id FROM bf
  JOIN (SELECT DISTINCT band_idx, band_key FROM bands_i) i USING (band_idx, band_key)
),
fresh AS (SELECT * FROM bf WHERE doc_id NOT IN (SELECT doc_id FROM hit)),
hubs AS (SELECT band_idx, band_key, min(doc_id) AS hub FROM fresh GROUP BY band_idx, band_key),
edges AS (
  SELECT DISTINCT hub AS a, f.doc_id AS b
  FROM fresh f JOIN hubs USING (band_idx, band_key) WHERE f.doc_id != hub
),
sym AS (SELECT a, b FROM edges UNION SELECT b, a FROM edges),
verts AS (SELECT DISTINCT a AS v FROM sym),
reach(v, r) AS (
  SELECT v, v FROM verts
  UNION
  SELECT reach.v, s.b FROM reach JOIN sym s ON reach.r = s.a
),
cc AS (SELECT v, min(r) AS comp FROM reach GROUP BY v),
banded_admitted AS (
  SELECT f.doc_id, CAST(f.band_idx AS INT) AS band_idx, f.band_key,
         NULL::VARCHAR AS fingerprint
  FROM fresh f
  WHERE f.doc_id NOT IN (SELECT v FROM cc WHERE v != comp)
),
corpus_fp AS (
  SELECT DISTINCT md5(text) AS fingerprint FROM docs_all
  WHERE doc_id % 2 = 0 AND len(string_split(text, ' ')) < 3
),
bandless AS (
  SELECT md5(text) AS fingerprint, min(doc_id) AS doc_id
  FROM docs_all
  WHERE doc_id % 2 = 1 AND doc_id NOT IN (SELECT doc_id FROM bf)
  GROUP BY md5(text)
),
bandless_admitted AS (
  SELECT doc_id, NULL::INT AS band_idx, NULL::VARCHAR AS band_key, fingerprint
  FROM bandless
  WHERE fingerprint NOT IN (SELECT fingerprint FROM corpus_fp)
)
SELECT doc_id, band_idx, band_key, fingerprint FROM banded_admitted
UNION ALL
SELECT doc_id, band_idx, band_key, fingerprint FROM bandless_admitted
""",
    # semantic_dedup: SemDeDup keep-list — IVF-cell blocking, in-cell
    # cosine edges, recursive-CTE transitive closure, min-id survivors
    "semantic_dedup": f"""
WITH RECURSIVE {_IVF_ASSIGN_SQL},
okc AS (SELECT cell FROM assign GROUP BY cell HAVING count(*) <= {S.MAX_CELL}),
mem AS (
  SELECT e.vec_id, e.embedding, a.cell
  FROM embeddings e JOIN assign a USING (vec_id) JOIN okc USING (cell)
),
cand AS (
  SELECT a.vec_id AS a_id, b.vec_id AS b_id
  FROM mem a JOIN mem b ON a.cell = b.cell AND a.vec_id < b.vec_id
  WHERE list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) >= 0.3
),
sym AS (
  SELECT a_id AS a, b_id AS b FROM cand
  UNION
  SELECT b_id AS a, a_id AS b FROM cand
),
verts AS (SELECT DISTINCT a AS v FROM sym),
reach(v, r) AS (
  SELECT v, v FROM verts
  UNION
  SELECT reach.v, s.b FROM reach JOIN sym s ON reach.r = s.a
),
cc AS (SELECT v AS vertex, min(r) AS component FROM reach GROUP BY v)
SELECT vec_id FROM embeddings
WHERE vec_id NOT IN (SELECT vertex FROM cc WHERE vertex != component)
""",
    "ivf_topk": f"""
WITH {_IVF_ASSIGN_SQL},
probes AS (
  SELECT vec_id, CAST(cell AS INT) AS cell FROM (
    SELECT vec_id, cell,
           row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, cell DESC) AS rn
    FROM scored_cells
  ) WHERE rn <= {S.N_IVF_PROBE}
),
okc AS (SELECT cell FROM assign GROUP BY cell HAVING count(*) <= {S.MAX_CELL}),
cand AS (
  SELECT e.vec_id, e.embedding, a.cell FROM embeddings e
  JOIN assign a ON e.vec_id = a.vec_id JOIN okc ON a.cell = okc.cell
),
scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         list_cosine_similarity(q.embedding::DOUBLE[], c.embedding::DOUBLE[]) AS cosine
  FROM (SELECT p.vec_id, e.embedding, p.cell FROM probes p
        JOIN embeddings e ON p.vec_id = e.vec_id) q
  JOIN cand c ON q.cell = c.cell AND q.vec_id != c.vec_id
)
SELECT query_id, neighbor_id, CAST(rank AS INT) AS rank FROM (
  SELECT query_id, neighbor_id,
         row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rank
  FROM scored
) WHERE rank <= 5
""",
    "knn_vote": f"""
WITH b AS (SELECT vec_id, {_BUCKET_SQL} AS bucket FROM embeddings),
okb AS (SELECT bucket FROM b GROUP BY bucket HAVING count(*) <= {S.MAX_BUCKET}),
withb AS (SELECT e.vec_id, e.embedding, e.label, b.bucket FROM embeddings e
          JOIN b ON e.vec_id = b.vec_id JOIN okb ON b.bucket = okb.bucket),
scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id, c.label AS n_label,
         list_cosine_similarity(q.embedding::DOUBLE[], c.embedding::DOUBLE[]) AS cosine
  FROM withb q JOIN withb c ON q.bucket = c.bucket AND q.vec_id != c.vec_id
),
topk AS (
  SELECT query_id, n_label FROM (
    SELECT query_id, n_label,
           row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rank
    FROM scored
  ) WHERE rank <= 5
),
votes AS (
  SELECT query_id, n_label, count(*) AS votes FROM topk GROUP BY query_id, n_label
)
SELECT query_id, n_label AS predicted_label FROM (
  SELECT query_id, n_label,
         row_number() OVER (PARTITION BY query_id ORDER BY votes DESC, n_label) AS rk
  FROM votes
) WHERE rk = 1
""",
    "mm_metadata": """
SELECT CAST(doc_id AS VARCHAR) AS media_id,
       'unknown' AS kind,
       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
       md5(text) AS digest
FROM documents
""",
    "mm_frame_plan": """
SELECT CAST(doc_id AS VARCHAR) AS media_id,
       CAST(i AS DOUBLE) / 0.2 AS sample_ts_sec
FROM documents,
     unnest(range(0, greatest(1, CAST(floor((n_chars / 100.0) * 0.2) AS BIGINT)))) t(i)
""",
    "url_ops": """
WITH u AS (
  SELECT doc_id,
         CASE WHEN doc_id % 2 = 0
              THEN 'https://WWW.Example' || CAST(doc_id AS VARCHAR) || '.COM/p/' || CAST(doc_id AS VARCHAR)
              ELSE 'www.example' || CAST(doc_id AS VARCHAR) || '.com/p/' || CAST(doc_id AS VARCHAR) END AS url
  FROM documents
),
n AS (
  SELECT doc_id, url,
         CASE WHEN url LIKE 'https://%' THEN url ELSE 'https://' || url END AS norm_url
  FROM u
)
SELECT doc_id, norm_url,
       lower(split_part(substr(norm_url, 9), '/', 1)) AS domain,
       CASE WHEN url LIKE 'https://%' THEN lower(split_part(substr(url, 9), '/', 1)) ELSE '' END AS raw_domain,
       (url LIKE 'https://%') AS raw_valid
FROM n
""",
    "quality_gate": f"""
SELECT doc_id, lang, n_chars FROM documents
WHERE text IS NOT NULL
  AND CAST(len({_TOKS}) AS DOUBLE) >= 30.0
  AND CAST(len(list_filter({_TOKS}, w -> w IN ({_STOPS}))) AS DOUBLE)
      / CAST(len({_TOKS}) AS DOUBLE) <= 0.9
  AND CAST(len(list_distinct({_TOKS})) AS DOUBLE)
      / CAST(len({_TOKS}) AS DOUBLE) >= 0.1
""",
    "text_dedupe": """
SELECT doc_id, n_chars FROM (
  SELECT doc_id, n_chars,
         row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS _rn
  FROM documents
) WHERE _rn = 1
""",
    "tpch_q1": """
SELECT l_returnflag, l_linestatus,
       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
       CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc_price,
       CAST(count(*) AS BIGINT) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
""",
    "revenue_join": """
SELECT c_mktsegment, o_orderpriority,
       CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
       CAST(count(*) AS BIGINT) AS n_items
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment, o_orderpriority
""",
    "region_revenue": """
SELECT r_name,
       CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
       CAST(count(*) AS BIGINT) AS n_items
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name
""",
    "user_top_events": """
SELECT user_id, event_id, event_type, CAST(rk AS INT) AS rk FROM (
  SELECT user_id, event_id, event_type,
         row_number() OVER (PARTITION BY user_id ORDER BY "value" DESC, event_id) AS rk
  FROM events
) WHERE rk <= 3
""",
    "event_sessions": """
WITH marked AS (
  SELECT user_id, "value",
         CASE WHEN lag(ts) OVER w IS NULL
                   OR epoch(ts) - epoch(lag(ts) OVER w) > 1800
              THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT user_id,
       CAST(sum(new_session) AS BIGINT) AS n_sessions,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(CAST("value" AS DECIMAL(18,6))) AS DOUBLE) AS total_value
FROM marked GROUP BY user_id
""",
    # event_sessions_native: session_window semantics — sessions are
    # maximal runs with inter-event gap <= 30 min (verified: Spark
    # MERGES events exactly gap apart, so a new session needs gap
    # STRICTLY greater); window close = last event + gap
    "event_sessions_native": """
WITH marked AS (
  SELECT user_id, ts,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR epoch(ts) - epoch(lag(ts) OVER w) > 1800
              THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
),
sess AS (
  SELECT user_id, ts,
         sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
  FROM marked
)
SELECT user_id,
       min(ts) AS session_start,
       max(ts) + INTERVAL 30 MINUTE AS session_end,
       CAST(count(*) AS BIGINT) AS n_events
FROM sess GROUP BY user_id, sid
""",
    "stratified_sample": """
SELECT doc_id, lang FROM documents
WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) <
      CASE lang WHEN 'en' THEN '3333' WHEN 'fr' THEN '8000' ELSE '0ccc' END
""",
    "mixture_plan": """
WITH pos AS (
  SELECT doc_id, source,
         CAST(row_number() OVER (PARTITION BY source
                ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS DOUBLE)
         / (CASE source WHEN 'src0' THEN 3.0 WHEN 'src1' THEN 2.0 ELSE 1.0 END) AS p
  FROM documents
)
SELECT doc_id, source,
       CAST(row_number() OVER (ORDER BY p, source, doc_id) AS BIGINT) AS mix_rank
FROM pos
""",
    "order_percentiles": """
SELECT o_orderpriority,
       quantile_cont(CAST(o_totalprice AS DOUBLE), 0.5) AS p50,
       quantile_cont(CAST(o_totalprice AS DOUBLE), 0.95) AS p95,
       CAST(count(*) AS BIGINT) AS n
FROM orders GROUP BY o_orderpriority
""",
    "revenue_rollup": """
SELECT COALESCE(o_orderpriority, '(all)') AS priority,
       COALESCE(o_orderstatus, '(all)') AS status,
       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total,
       CAST(count(*) AS BIGINT) AS n
FROM orders GROUP BY ROLLUP (o_orderpriority, o_orderstatus)
""",
    "event_leadlag": """
SELECT user_id, event_id,
       CAST(COALESCE(CAST(floor(epoch(ts)) AS BIGINT) - lag(CAST(floor(epoch(ts)) AS BIGINT))
              OVER (PARTITION BY user_id ORDER BY ts, event_id), -1) AS BIGINT)
         AS secs_since_prev
FROM events
""",
    "part_triangles": """
WITH e AS (
  SELECT DISTINCT least(a.l_partkey, b.l_partkey) AS u,
                  greatest(a.l_partkey, b.l_partkey) AS v
  FROM lineitem a JOIN lineitem b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
),
deg AS (
  SELECT x, count(*) AS d FROM (
    SELECT u AS x FROM e UNION ALL SELECT v AS x FROM e
  ) GROUP BY x
),
w AS (
  SELECT e.u, e.v, du.d AS du, dv.d AS dv
  FROM e JOIN deg du ON e.u = du.x JOIN deg dv ON e.v = dv.x
),
o AS (
  SELECT u AS s, v AS t, dv AS dt FROM w WHERE (du < dv) OR (du = dv AND u < v)
  UNION ALL
  SELECT v AS s, u AS t, du AS dt FROM w WHERE NOT ((du < dv) OR (du = dv AND u < v))
),
paths AS (
  SELECT p1.s, p1.t AS t1, p1.dt AS d1, p2.t AS t2, p2.dt AS d2
  FROM o p1 JOIN o p2 ON p1.s = p2.s
  WHERE (p1.dt < p2.dt) OR (p1.dt = p2.dt AND p1.t < p2.t)
),
tri AS (
  SELECT p.s, p.t1, p.t2 FROM paths p JOIN o ON o.s = p.t1 AND o.t = p.t2
)
SELECT vertex, CAST(count(*) AS BIGINT) AS n_triangles FROM (
  SELECT s AS vertex FROM tri
  UNION ALL SELECT t1 AS vertex FROM tri
  UNION ALL SELECT t2 AS vertex FROM tri
) GROUP BY vertex
""",
    "event_type_rollup": """
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n,
       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
       CAST(sum(CAST("value" AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
FROM events GROUP BY event_type
""",
    # direct per-level aggregation from raw: equals the Spark cascade
    # because counts and DECIMAL(18,6) sums are associative-exact and
    # both engines cast to DOUBLE only in the final projection
    "event_rollup_cascade": """
WITH m AS (
  SELECT date_trunc('minute', ts) AS bucket_start,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CAST("value" AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
  FROM events GROUP BY 1
),
h AS (
  SELECT date_trunc('hour', ts) AS bucket_start,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CAST("value" AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
  FROM events GROUP BY 1
),
d AS (
  SELECT date_trunc('day', ts) AS bucket_start,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CAST("value" AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
  FROM events GROUP BY 1
)
SELECT 'minute' AS level, bucket_start, n, sum_value FROM m
UNION ALL SELECT 'hour', bucket_start, n, sum_value FROM h
UNION ALL SELECT 'day', bucket_start, n, sum_value FROM d
""",
    # the oracle is the naive BETWEEN range join — the Spark side's
    # bucketized equi-join must reproduce it exactly (inclusive both
    # bounds; integer epoch gap)
    "click_attribution": """
WITH pur AS (
  SELECT user_id, ts AS pts, event_id AS purchase_event_id
  FROM events WHERE event_type = 'purchase'
),
clk AS (
  SELECT user_id, ts AS cts, event_id AS click_event_id
  FROM events WHERE event_type = 'click'
)
SELECT p.purchase_event_id, c.click_event_id, p.user_id,
       CAST(floor(epoch(c.cts)) - floor(epoch(p.pts)) AS BIGINT) AS gap_secs
FROM pur p JOIN clk c ON p.user_id = c.user_id
  AND c.cts >= p.pts AND c.cts <= p.pts + INTERVAL 2 HOUR
""",
    # the oracle uses DuckDB's NATIVE ASOF JOIN — an independent
    # as-of implementation vs Spark's window-over-union — so this row
    # cross-checks two unrelated algorithms. Payload carried verbatim
    # (no arithmetic) ⇒ the double column is trivially bit-exact.
    "event_asof_purchase": """
WITH pur AS (
  SELECT user_id, ts,
         (max(struct_pack(i := event_id, v := "value"))).i AS purchase_event_id,
         (max(struct_pack(i := event_id, v := "value"))).v AS purchase_value
  FROM events WHERE event_type = 'purchase' GROUP BY user_id, ts
)
SELECT e.event_id, e.user_id, e.event_type,
       CAST(coalesce(p.purchase_event_id, -1) AS BIGINT) AS purchase_event_id,
       coalesce(p.purchase_value, 0.0::DOUBLE) AS purchase_value
FROM events e ASOF LEFT JOIN pur p
  ON e.user_id = p.user_id AND e.ts >= p.ts
""",
    # exact-integer numerator: every sum is BIGINT (order-free), the
    # single division is the one float op — bit-exact by construction.
    # DuckDB sum(BIGINT) returns HUGEINT: CAST each sum back.
    "source_drift": """
WITH tok AS (
  SELECT source AS grp, unnest(str_split(text, ' ')) AS token FROM documents
),
cnt AS (
  SELECT grp, token, CAST(count(*) AS BIGINT) AS c FROM tok GROUP BY grp, token
),
g_tot AS (SELECT grp, CAST(sum(c) AS BIGINT) AS n_g FROM cnt GROUP BY grp),
t_tot AS (SELECT token, CAST(sum(c) AS BIGINT) AS ct FROM cnt GROUP BY token),
grand AS (SELECT CAST(sum(c) AS BIGINT) AS nn FROM cnt),
contrib AS (
  SELECT cnt.grp, abs(cnt.c * nn - ct * n_g) - ct * n_g AS term
  FROM cnt JOIN t_tot USING (token) JOIN g_tot USING (grp), grand
),
sv AS (SELECT grp, CAST(sum(term) AS BIGINT) AS s FROM contrib GROUP BY grp)
SELECT sv.grp AS source, g_tot.n_g AS n_tokens,
       CAST(g_tot.n_g * grand.nn + sv.s AS DOUBLE)
         / CAST(2 * g_tot.n_g * grand.nn AS DOUBLE) AS tv_dist
FROM sv JOIN g_tot USING (grp), grand
""",
    # UNION (not UNION ALL) in the recursive term gives distinct
    # working-table semantics: the walk table stays bounded by
    # |V|·hops pairs instead of multiplying along paths; min(dist)
    # collapses a vertex reached at several depths.
    "part_reach": """
WITH RECURSIVE e AS (
  SELECT DISTINCT 's' || l_suppkey AS a, 'p' || l_partkey AS b FROM lineitem
),
und AS (
  SELECT a, b FROM e UNION SELECT b AS a, a AS b FROM e
),
walk(v, dist) AS (
  SELECT * FROM (VALUES ('s1', 0), ('s7', 0)) t(v, dist)
  UNION
  SELECT u.b, w.dist + 1 FROM walk w JOIN und u ON u.a = w.v WHERE w.dist < 4
)
SELECT v AS vertex, CAST(min(dist) AS INT) AS dist FROM walk GROUP BY v
""",
    # part_triangles' orientation chain + degrees, extended with the
    # coefficient: one IEEE division of exact integer-valued doubles
    # matches Spark bit-for-bit (token_pmi fixed-chain precedent).
    "part_clustering": """
WITH e AS (
  SELECT DISTINCT least(a.l_partkey, b.l_partkey) AS u,
                  greatest(a.l_partkey, b.l_partkey) AS v
  FROM lineitem a JOIN lineitem b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
),
deg AS (
  SELECT x, count(*) AS d FROM (
    SELECT u AS x FROM e UNION ALL SELECT v AS x FROM e
  ) GROUP BY x
),
w AS (
  SELECT e.u, e.v, du.d AS du, dv.d AS dv
  FROM e JOIN deg du ON e.u = du.x JOIN deg dv ON e.v = dv.x
),
o AS (
  SELECT u AS s, v AS t, dv AS dt FROM w WHERE (du < dv) OR (du = dv AND u < v)
  UNION ALL
  SELECT v AS s, u AS t, du AS dt FROM w WHERE NOT ((du < dv) OR (du = dv AND u < v))
),
paths AS (
  SELECT p1.s, p1.t AS t1, p1.dt AS d1, p2.t AS t2, p2.dt AS d2
  FROM o p1 JOIN o p2 ON p1.s = p2.s
  WHERE (p1.dt < p2.dt) OR (p1.dt = p2.dt AND p1.t < p2.t)
),
tri AS (
  SELECT p.s, p.t1, p.t2 FROM paths p JOIN o ON o.s = p.t1 AND o.t = p.t2
),
tc AS (
  SELECT vertex, CAST(count(*) AS BIGINT) AS n_triangles FROM (
    SELECT s AS vertex FROM tri
    UNION ALL SELECT t1 AS vertex FROM tri
    UNION ALL SELECT t2 AS vertex FROM tri
  ) GROUP BY vertex
)
SELECT d.x AS vertex,
       CAST(d.d AS BIGINT) AS degree,
       CAST(coalesce(t.n_triangles, 0) AS BIGINT) AS n_triangles,
       CAST(2 * coalesce(t.n_triangles, 0) AS DOUBLE)
         / CAST(d.d * (d.d - 1) AS DOUBLE) AS clustering
FROM deg d LEFT JOIN tc t ON t.vertex = d.x
WHERE d.d >= 2
""",
}

QUERIES = {
    "token_stats": q_token_stats,
    "quality": q_quality,
    "lang_features": q_lang_features,
    "gopher_rules": q_gopher_rules,
    "repetition_ratios": q_repetition_ratios,
    "lm_scores": q_lm_scores,
    "doc_chunks": q_doc_chunks,
    "pack_plan": q_pack_plan,
    "redact_pii": q_redact_pii,
    "fingerprints": q_fingerprints,
    "bpe_tokens": q_bpe_tokens,
    "winnow_fp": q_winnow_fp,
    "dedup_exact": q_dedup_exact,
    "minhash": q_minhash,
    "lsh_bands": q_lsh_bands,
    "lsh_candidates": q_lsh_candidates,
    "shingle_overlap": q_shingle_overlap,
    "simhash": q_simhash,
    "simhash_candidates": q_simhash_candidates,
    "dedup_clusters_cc": q_dedup_clusters_cc,
    "dedup_clusters_stars": q_dedup_clusters_stars,
    "dedup_keeplist": q_dedup_keeplist,
    "emb_cosine_pairs": q_emb_cosine_pairs,
    "ann_topk": q_ann_topk,
    "lsh_buckets": q_lsh_buckets,
    "lsh_topk": q_lsh_topk,
    "knn_vote": q_knn_vote,
    "ivf_assign": q_ivf_assign,
    "ivf_topk": q_ivf_topk,
    "mm_metadata": q_mm_metadata,
    "mm_frame_plan": q_mm_frame_plan,
    "url_ops": q_url_ops,
    "quality_gate": q_quality_gate,
    "text_dedupe": q_text_dedupe,
    "tpch_q1": q_tpch_q1,
    "revenue_join": q_revenue_join,
    "region_revenue": q_region_revenue,
    "user_top_events": q_user_top_events,
    "event_sessions": q_event_sessions,
    "event_sessions_native": q_event_sessions_native,
    "event_type_rollup": q_event_type_rollup,
    "order_percentiles": q_order_percentiles,
    "revenue_rollup": q_revenue_rollup,
    "event_leadlag": q_event_leadlag,
    "part_triangles": q_part_triangles,
    "part_reach": q_part_reach,
    "part_clustering": q_part_clustering,
    "part_ppr": q_part_ppr,
    "part_truss": q_part_truss,
    "source_drift": q_source_drift,
    "event_asof_purchase": q_event_asof_purchase,
    "click_attribution": q_click_attribution,
    "event_rollup_cascade": q_event_rollup_cascade,
    "stratified_sample": q_stratified_sample,
    "mixture_plan": q_mixture_plan,
    "decontaminate": q_decontaminate,
    "vocab_topk": q_vocab_topk,
    "line_dedup": q_line_dedup,
    "domain_cap": q_domain_cap,
    "dsir_features": q_dsir_features,
    "bpe_merges": q_bpe_merges,
    "token_pmi": q_token_pmi,
    "dup_grams": q_dup_grams,
    "part_pagerank": q_part_pagerank,
    "part_kcore": q_part_kcore,
    "semantic_dedup": q_semantic_dedup,
    "dedup_incremental": q_dedup_incremental,
    "table_profile": q_table_profile,
    "cdc_chunks": q_cdc_chunks,
    "langid": q_langid,
}

ORACLES["dedup_clusters_stars"] = ORACLES["dedup_clusters_cc"]
ORACLES["dedup_incremental"] = ORACLES["dedup_incremental"].format(
    extra_vals=", ".join(f"({i}, '{t}')" for i, t in _SHORT_DOC_ROWS)
)


# --- PQ / random-projection oracles (generated literals) ---------------

def _rand_proj_sql() -> str:
    from ctinexus_spark.operators.similarity import hyperplane_signs

    signs = hyperplane_signs(64, 16)
    exprs = []
    for j in range(16):
        lits = ", ".join(f"{float(x)}" for x in signs[j])
        exprs.append(
            f"list_sum(list_transform(range(1, 65), "
            f"i -> embedding[i]::DOUBLE * ([{lits}])[i])) / sqrt(16.0)"
        )
    lst = ",\n    ".join(exprs)
    return f"""
WITH proj AS (SELECT vec_id, [{lst}] AS l FROM embeddings)
SELECT vec_id, CAST(generate_subscripts(l, 1) - 1 AS INT) AS pos, unnest(l) AS value
FROM proj
"""


def _pq_cent_values() -> str:
    from ctinexus_spark.operators.quantize import pq_centroids

    cents = pq_centroids()
    return ", ".join(
        f"({s}, {c}, [{', '.join(repr(float(x)) for x in cents[s, c])}]::DOUBLE[])"
        for s in range(cents.shape[0])
        for c in range(cents.shape[1])
    )


_PQ_ASSIGN_SQL = """
cents(s, c, cv) AS (SELECT * FROM (VALUES {vals})),
dists AS (
  SELECT e.vec_id, c.s, c.c,
         list_sum(list_transform(range(1, 9),
           j -> (e.embedding[c.s * 8 + j]::DOUBLE - c.cv[j])
              * (e.embedding[c.s * 8 + j]::DOUBLE - c.cv[j]))) AS dist
  FROM embeddings e CROSS JOIN cents c
),
assign AS (
  SELECT vec_id, CAST(s AS INT) AS subspace, CAST(c AS INT) AS code FROM (
    SELECT vec_id, s, c,
           row_number() OVER (PARTITION BY vec_id, s ORDER BY dist ASC, c ASC) AS rn
    FROM dists
  ) WHERE rn = 1
)
"""

ORACLES["rand_proj"] = _rand_proj_sql()
ORACLES["pq_codes"] = (
    "WITH " + _PQ_ASSIGN_SQL.format(vals=_pq_cent_values())
    + "SELECT vec_id, subspace, code FROM assign"
)
ORACLES["pq_adc_topk"] = (
    "WITH " + _PQ_ASSIGN_SQL.format(vals=_pq_cent_values())
    + """,
qd AS (
  SELECT e.vec_id AS query_id, c.s, c.c,
         list_sum(list_transform(range(1, 9),
           j -> (e.embedding[c.s * 8 + j]::DOUBLE - c.cv[j])
              * (e.embedding[c.s * 8 + j]::DOUBLE - c.cv[j]))) AS dist
  FROM embeddings e CROSS JOIN cents c
  WHERE e.vec_id < 10
),
scored AS (
  SELECT q.query_id, a.vec_id AS neighbor_id,
         list_sum(list(q.dist ORDER BY q.s)) AS adc_dist
  FROM assign a JOIN qd q ON q.s = a.subspace AND q.c = a.code
  GROUP BY q.query_id, a.vec_id
)
SELECT query_id, neighbor_id, CAST(rank AS INT) AS rank FROM (
  SELECT query_id, neighbor_id,
         row_number() OVER (PARTITION BY query_id ORDER BY adc_dist ASC, neighbor_id ASC) AS rank
  FROM scored WHERE query_id != neighbor_id
) WHERE rank <= 5
"""
)

QUERIES["rand_proj"] = q_rand_proj
QUERIES["pq_codes"] = q_pq_codes
QUERIES["pq_adc_topk"] = q_pq_adc_topk


# IVF-PQ: coarse-cell restriction + code-lookup distances, composed
# from the IVF and PQ oracle pieces with fresh CTE names.
ORACLES["ivf_pq_topk"] = f"""
WITH ivfcents(cell, cvec) AS (SELECT * FROM (VALUES {_CENTROID_VALUES})),
iscored AS (
  SELECT e.vec_id, c.cell,
         list_cosine_similarity(e.embedding::DOUBLE[], c.cvec) AS cos
  FROM embeddings e CROSS JOIN ivfcents c
),
iassign AS (
  SELECT vec_id, CAST(cell AS INT) AS cell FROM (
    SELECT vec_id, cell,
           row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, cell DESC) AS rn
    FROM iscored
  ) WHERE rn = 1
),
okc AS (SELECT cell FROM iassign GROUP BY cell HAVING count(*) <= {S.MAX_CELL}),
iprobes AS (
  SELECT vec_id AS query_id, CAST(cell AS INT) AS cell FROM (
    SELECT vec_id, cell,
           row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, cell DESC) AS rn
    FROM iscored WHERE vec_id < 10
  ) WHERE rn <= {S.N_IVF_PROBE}
),
pqcents(s, c, cv) AS (SELECT * FROM (VALUES {_pq_cent_values()})),
pdists AS (
  SELECT e.vec_id, c.s, c.c,
         list_sum(list_transform(range(1, 9),
           j -> (e.embedding[c.s * 8 + j]::DOUBLE - c.cv[j])
              * (e.embedding[c.s * 8 + j]::DOUBLE - c.cv[j]))) AS dist
  FROM embeddings e CROSS JOIN pqcents c
),
passign AS (
  SELECT vec_id, CAST(s AS INT) AS subspace, CAST(c AS INT) AS code FROM (
    SELECT vec_id, s, c,
           row_number() OVER (PARTITION BY vec_id, s ORDER BY dist ASC, c ASC) AS rn
    FROM pdists
  ) WHERE rn = 1
),
qd AS (SELECT vec_id AS query_id, s, c, dist FROM pdists WHERE vec_id < 10),
cand AS (
  SELECT DISTINCT p.query_id, a.vec_id AS neighbor_id
  FROM iprobes p JOIN iassign a ON p.cell = a.cell JOIN okc ON a.cell = okc.cell
),
scored AS (
  SELECT c.query_id, c.neighbor_id, list_sum(list(q.dist ORDER BY q.s)) AS adc_dist
  FROM cand c
  JOIN passign pa ON pa.vec_id = c.neighbor_id
  JOIN qd q ON q.query_id = c.query_id AND q.s = pa.subspace AND q.c = pa.code
  GROUP BY c.query_id, c.neighbor_id
)
SELECT query_id, neighbor_id, CAST(rank AS INT) AS rank FROM (
  SELECT query_id, neighbor_id,
         row_number() OVER (PARTITION BY query_id ORDER BY adc_dist ASC, neighbor_id ASC) AS rank
  FROM scored WHERE query_id != neighbor_id
) WHERE rank <= 5
"""
QUERIES["ivf_pq_topk"] = q_ivf_pq_topk


# --- iterative graph oracles (round 5) ----------------------------------
# Both were `no_oracle` rows through round 4; the techniques that make
# them hash-checkable: pagerank folds its two float sums in explicit
# order on both engines (list_sum(list(x ORDER BY k)) == F.aggregate
# over array_sort — strict left fold, verified at 2000 elements), and
# k-core's integer peel is a DuckDB recursive CTE whose working table
# carries the full surviving edge set per iteration.

def _pagerank_sql(
    iterations: int = 5, damping: float = 0.85, seeds: list | None = None
) -> str:
    """Unrolled-round DuckDB twin of pagerank_pinned over the
    supplier→part shipment edges. ::DOUBLE casts everywhere — bare
    DuckDB numeric literals are DECIMALs with exact arithmetic that
    diverges from IEEE (verified: (1.0-0.85)/7 != the Python float).
    seeds=[...] emits the PERSONALIZED recurrence: restart vector
    uniform over the seed set (rank = (1−d)·p + d·(contrib + dang·p)),
    with 1−d and 1/|S| computed in Python and embedded ({v!r}::DOUBLE,
    BM25 precedent) to mirror pagerank_pinned's F.lit constants."""
    if seeds is not None:
        p_val = 1.0 / len(set(seeds))
        in_list = ", ".join(f"'{s}'" for s in sorted(set(seeds)))
        pcase = (
            f"(CASE WHEN {{v}}.vertex IN ({in_list}) "
            f"THEN {p_val!r}::DOUBLE ELSE 0.0::DOUBLE END)"
        )
        r0 = f"r0 AS (SELECT vertex, {pcase.format(v='verts')} AS rank FROM verts)"
    else:
        r0 = "r0 AS (SELECT vertex, 1.0::DOUBLE / (SELECT n FROM nn) AS rank FROM verts)"
    parts = [
        f"""e AS (SELECT DISTINCT 's' || l_suppkey AS s, 'p' || l_partkey AS t FROM lineitem),
verts AS (SELECT s AS vertex FROM e UNION SELECT t FROM e),
nn AS (SELECT count(*) AS n FROM verts),
outd AS (SELECT s, count(*) AS od FROM e GROUP BY s),
w AS (SELECT e.s, e.t, 1.0::DOUBLE / od AS w FROM e JOIN outd USING (s)),
{r0}"""
    ]
    one_minus_d = 1.0 - float(damping)
    for i in range(1, iterations + 1):
        p = f"r{i - 1}"
        if seeds is not None:
            pv = pcase.format(v="v")
            rank_expr = (
                f"{one_minus_d!r}::DOUBLE * {pv}\n"
                f"         + {damping}::DOUBLE * (coalesce(c.contrib, 0.0::DOUBLE)\n"
                f"             + (SELECT dang FROM d{i}) * {pv})"
            )
        else:
            rank_expr = (
                f"(1.0::DOUBLE - {damping}::DOUBLE) / (SELECT n FROM nn)\n"
                f"         + {damping}::DOUBLE * (coalesce(c.contrib, 0.0::DOUBLE)\n"
                f"             + (SELECT dang FROM d{i}) / (SELECT n::DOUBLE FROM nn))"
            )
        parts.append(
            f"""c{i} AS (
  SELECT w.t AS vertex, list_sum(list(r.rank * w.w ORDER BY w.s)) AS contrib
  FROM w JOIN {p} r ON r.vertex = w.s GROUP BY w.t
),
d{i} AS (
  SELECT coalesce(list_sum(list(r.rank ORDER BY r.vertex)), 0.0::DOUBLE) AS dang
  FROM {p} r LEFT JOIN outd o ON o.s = r.vertex WHERE o.s IS NULL
),
r{i} AS (
  SELECT v.vertex,
         {rank_expr} AS rank
  FROM verts v LEFT JOIN c{i} c ON c.vertex = v.vertex
)"""
        )
    return (
        "WITH "
        + ",\n".join(parts)
        + f"\nSELECT vertex, rank FROM r{iterations}"
    )


def _kcore_sql(k: int = 80) -> str:
    """DuckDB recursive peel over the part co-occurrence edges. The
    recursive term sees only the PREVIOUS iteration's edges (standard
    working-table semantics), recomputes degrees, and re-emits the
    surviving edges tagged iter+1 — emitting nothing (terminating)
    once no vertex is below k. If the peel ends because the survivors
    were empty (core is empty), the max-iter edge set still contains
    below-k vertices and the final NOT EXISTS guard returns zero rows."""
    deg = (
        "SELECT x, count(*) AS d FROM "
        "(SELECT u AS x FROM peel UNION ALL SELECT v FROM peel) GROUP BY x"
    )
    return f"""
WITH RECURSIVE co AS (
  SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
  FROM lineitem a JOIN lineitem b ON a.l_orderkey = b.l_orderkey
  WHERE a.l_partkey < b.l_partkey
),
peel(iter, u, v) AS (
  SELECT 0, u, v FROM co
  UNION ALL
  SELECT c.iter + 1, c.u, c.v
  FROM peel c
  WHERE EXISTS (SELECT 1 FROM ({deg}) WHERE d < {k})
    AND c.u NOT IN (SELECT x FROM ({deg}) WHERE d < {k})
    AND c.v NOT IN (SELECT x FROM ({deg}) WHERE d < {k})
),
final_edges AS (
  SELECT u, v FROM peel WHERE iter = (SELECT max(iter) FROM peel)
),
final_deg AS (
  SELECT x AS vertex, count(*) AS degree
  FROM (SELECT u AS x FROM final_edges UNION ALL SELECT v FROM final_edges)
  GROUP BY x
)
SELECT vertex, degree FROM final_deg
WHERE NOT EXISTS (SELECT 1 FROM final_deg WHERE degree < {k})
"""


ORACLES["part_pagerank"] = _pagerank_sql(iterations=5, damping=0.85)
ORACLES["part_ppr"] = _pagerank_sql(iterations=5, damping=0.85, seeds=["s1", "s7"])
ORACLES["part_kcore"] = _kcore_sql(k=80)
ORACLES["part_truss"] = _ktruss_sql(k=4, max_part=300)


def _mmr_sql(k: int = 5, lam: float = 0.7, candidates: int = 20, nq: int = 8) -> str:
    """Unrolled-round DuckDB twin of similarity.mmr_rerank: greedy
    MMR as k CTE rounds — per round, max-sim against the union of
    prior selections, score = λ·rel − (1−λ)·maxsim with BOTH float
    constants computed in Python and embedded ({v!r}::DOUBLE — the
    BM25 precedent), argmax = min(struct_pack(ns := −score, cid)) and
    the winning score recovered as −ns (negation is sign-bit-exact).
    Cosines are list_cosine_similarity(::DOUBLE[]) — bit-identical to
    the Spark left-fold."""
    lam_f = float(lam)
    om = 1.0 - lam_f

    def prev_union(r: int) -> str:
        return " UNION ALL ".join(
            f"SELECT query_id, cid FROM s{i}" for i in range(1, r)
        )

    parts = [
        f"""q AS (SELECT vec_id AS query_id, embedding FROM embeddings WHERE vec_id < {nq}),
scored AS (
  SELECT q.query_id, c.vec_id AS cid,
         list_cosine_similarity(q.embedding::DOUBLE[], c.embedding::DOUBLE[]) AS rel
  FROM q JOIN embeddings c ON c.vec_id != q.query_id
),
cand AS (
  SELECT query_id, cid, rel FROM (
    SELECT query_id, cid, rel,
           row_number() OVER (PARTITION BY query_id ORDER BY rel DESC, cid) AS rk
    FROM scored
  ) WHERE rk <= {candidates}
),
pairs AS (
  SELECT x.query_id, x.cid AS a, y.cid AS b,
         list_cosine_similarity(ea.embedding::DOUBLE[], eb.embedding::DOUBLE[]) AS sim
  FROM cand x JOIN cand y ON x.query_id = y.query_id AND x.cid != y.cid
  JOIN embeddings ea ON ea.vec_id = x.cid
  JOIN embeddings eb ON eb.vec_id = y.cid
),
s1 AS (
  SELECT query_id, (w).cid AS cid, 1 AS pick_rank, -((w).ns) AS mmr_score FROM (
    SELECT query_id,
           min(struct_pack(
             ns := -({lam_f!r}::DOUBLE * rel - {om!r}::DOUBLE * 0.0::DOUBLE),
             cid := cid)) AS w
    FROM cand GROUP BY query_id
  )
)"""
    ]
    for r in range(2, k + 1):
        prev = prev_union(r)
        parts.append(
            f"""ms{r} AS (
  SELECT p.query_id, p.a AS cid, max(p.sim) AS maxsim
  FROM pairs p JOIN ({prev}) s ON s.query_id = p.query_id AND s.cid = p.b
  GROUP BY p.query_id, p.a
),
rem{r} AS (
  SELECT c.query_id, c.cid, c.rel FROM cand c
  WHERE NOT EXISTS (SELECT 1 FROM ({prev}) s
                    WHERE s.query_id = c.query_id AND s.cid = c.cid)
),
s{r} AS (
  SELECT query_id, (w).cid AS cid, {r} AS pick_rank, -((w).ns) AS mmr_score FROM (
    SELECT t.query_id,
           min(struct_pack(
             ns := -({lam_f!r}::DOUBLE * t.rel
                     - {om!r}::DOUBLE * coalesce(m.maxsim, 0.0::DOUBLE)),
             cid := t.cid)) AS w
    FROM rem{r} t LEFT JOIN ms{r} m ON m.query_id = t.query_id AND m.cid = t.cid
    GROUP BY t.query_id
  )
)"""
        )
    final = " UNION ALL ".join(f"SELECT * FROM s{i}" for i in range(1, k + 1))
    return (
        "WITH "
        + ",\n".join(parts)
        + f"""
SELECT query_id, cid AS neighbor_id, CAST(pick_rank AS INT) AS pick_rank, mmr_score
FROM ({final})
"""
    )


ORACLES["mmr_topk"] = _mmr_sql(k=5, lam=0.7, candidates=20, nq=8)
QUERIES["mmr_topk"] = q_mmr_topk


# --- distributed sketches (round 5) -------------------------------------
# HyperLogLog / Count-Min / Bloom over 3-gram shingles (the corpus
# has only 31 distinct TOKENS, so grams are the value space with real
# cardinality: ~16k distinct corpus-wide, 1.2-1.5k per source). All
# hashes are md5-prefix integers, so both engines agree bit-for-bit
# (operators/sketches.py has the determinism contract).


def _grams3_df(spark, sf_dir, with_source: bool = False):
    """Non-distinct 3-token grams, one row per occurrence (sequential
    positions — multiplicity matters for the Count-Min counts)."""
    from ctinexus_spark.partitioning import ensure_parallelism

    docs = ensure_parallelism(_docs(spark, sf_dir))
    toks = F.split(F.col("text"), " ")
    grams = F.when(
        F.size(toks) >= 3,
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - 3),
            lambda i: F.array_join(F.slice(toks, i + 1, 3), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))
    cols = [F.col("source")] if with_source else []
    return docs.select(*cols, F.explode(grams).alias("v"))


def q_hll_distinct(spark, sf_dir):
    """Per-source HyperLogLog distinct-3-gram estimate (m=1024
    registers) next to the exact distinct count — the O(1)-state
    cardinality profile a 100 TB pipeline runs instead of
    count(DISTINCT) over the raw corpus."""
    from ctinexus_spark.operators import sketches as K

    g = _grams3_df(spark, sf_dir, with_source=True)
    hll = K.hll_distinct(g, "source", "v", p=10)
    exact = g.groupBy("source").agg(
        F.count_distinct("v").cast("bigint").alias("exact_distinct")
    )
    return hll.join(exact, "source")


def q_cms_topk(spark, sf_dir):
    """Count-Min heavy hitters: exact top-50 grams (deterministic
    tie-break) with their 4x2048 sketch estimate alongside — the gap
    is the collision noise the sketch trades for O(1) state."""
    from ctinexus_spark.operators import sketches as K

    g = _grams3_df(spark, sf_dir)
    return K.cms_heavy_hitters(g, "v", depth=4, width=2048, k=50).withColumnRenamed(
        "v", "gram"
    )


def q_bloom_probe(spark, sf_dir):
    """Bloom-filter denylist probe: filter built over src0's distinct
    grams (16384 bits, 3 hashes), probed with every distinct corpus
    gram; emits the maybe-members with ground truth so the false
    positives at this sizing are visible."""
    from ctinexus_spark.operators import sketches as K

    g = _grams3_df(spark, sf_dir, with_source=True)
    deny = g.filter(F.col("source") == "src0").select("v")
    probe = g.select("v").distinct()
    return K.bloom_probe(probe, deny, "v", bits=16384, hashes=3).withColumnRenamed(
        "v", "gram"
    )


def _hex32_sql(expr: str) -> str:
    """DuckDB fragment: integer value of the first 8 md5 hex chars of
    `expr` — the twin of sketches.hash32 (strpos fold, same idiom as
    the simhash oracle)."""
    return (
        "CAST(list_sum(list_transform(range(1, 9), "
        f"i -> CAST(strpos('0123456789abcdef', substr(md5({expr}), i, 1)) - 1 AS BIGINT)"
        " * (CAST(1 AS BIGINT) << ((8 - i) * 4)))) AS BIGINT)"
    )


_GRAMS3_CTES = """tk AS (SELECT source, str_split(text, ' ') AS l FROM documents),
g AS (
  SELECT source, array_to_string(list_slice(l, i, i + 2), ' ') AS v
  FROM tk, unnest(range(1, len(l) - 1)) t(i)
  WHERE len(l) >= 3
)"""

ORACLES["hll_distinct"] = f"""
WITH {_GRAMS3_CTES},
h AS (SELECT source, {_hex32_sql('v')} AS h32 FROM g),
rb AS (
  SELECT source, h32 >> 22 AS bucket,
         CASE WHEN (h32 & 4194303) = 0 THEN 23
              ELSE 23 - length(bin(h32 & 4194303)) END AS m_j
  FROM h
),
regs AS (SELECT source, bucket, max(m_j) AS m_j FROM rb GROUP BY source, bucket),
agg AS (
  SELECT source, CAST(count(*) AS BIGINT) AS nonzero_registers,
         sum(1.0::DOUBLE / CAST((1::BIGINT << m_j) AS DOUBLE)) AS s
  FROM regs GROUP BY source
),
ex AS (SELECT source, CAST(count(DISTINCT v) AS BIGINT) AS exact_distinct FROM g GROUP BY source)
SELECT a.source, a.nonzero_registers,
       (0.7213::DOUBLE / (1.0::DOUBLE + 1.079::DOUBLE / 1024.0::DOUBLE))
         * 1048576.0::DOUBLE
         / (a.s + CAST(1024 - a.nonzero_registers AS DOUBLE)) AS hll_est,
       ex.exact_distinct
FROM agg a JOIN ex ON a.source = ex.source
"""

ORACLES["cms_topk"] = f"""
WITH {_GRAMS3_CTES},
cells AS (
  SELECT t.i AS r, {_hex32_sql("CAST(t.i AS VARCHAR) || '|' || v")} % 2048 AS b
  FROM g, range(0, 4) t(i)
),
sk AS (SELECT r, b, CAST(count(*) AS BIGINT) AS cnt FROM cells GROUP BY r, b),
ex AS (
  SELECT v, CAST(count(*) AS BIGINT) AS exact_cnt FROM g GROUP BY v
  ORDER BY exact_cnt DESC, v LIMIT 50
),
pr AS (
  SELECT ex.v, ex.exact_cnt, t.i AS r,
         {_hex32_sql("CAST(t.i AS VARCHAR) || '|' || ex.v")} % 2048 AS b
  FROM ex, range(0, 4) t(i)
)
SELECT pr.v AS gram, pr.exact_cnt, min(sk.cnt) AS cms_est
FROM pr JOIN sk ON pr.r = sk.r AND pr.b = sk.b
GROUP BY pr.v, pr.exact_cnt
"""

ORACLES["bloom_probe"] = f"""
WITH {_GRAMS3_CTES},
deny AS (SELECT DISTINCT v FROM g WHERE source = 'src0'),
dpos AS (
  SELECT DISTINCT {_hex32_sql("CAST(t.i AS VARCHAR) || '|' || v")} % 16384 AS pos
  FROM deny, range(0, 3) t(i)
),
probe AS (SELECT DISTINCT v FROM g),
ppos AS (
  SELECT v, {_hex32_sql("CAST(t.i AS VARCHAR) || '|' || v")} % 16384 AS pos
  FROM probe, range(0, 3) t(i)
),
hits AS (SELECT v FROM ppos JOIN dpos USING (pos) GROUP BY v HAVING count(*) = 3)
SELECT h.v AS gram, (d.v IS NOT NULL) AS is_member
FROM hits h LEFT JOIN deny d ON h.v = d.v
"""

QUERIES["hll_distinct"] = q_hll_distinct
QUERIES["cms_topk"] = q_cms_topk
QUERIES["bloom_probe"] = q_bloom_probe


def q_kmv_distinct(spark, sf_dir):
    """Per-source KMV (bottom-k) distinct estimate over 3-gram
    shingles — the distinct sketch that also supports set operations
    (kmv_overlap). Salted two-stage min-k (no per-group window sort);
    estimate (k−1)·2³²/h_k is one IEEE division — bit-exact."""
    from ctinexus_spark.operators.sketches import kmv_distinct

    return kmv_distinct(_grams3_df(spark, sf_dir, with_source=True), "source", "v", k=256)


def q_kmv_overlap(spark, sf_dir):
    """Set operations on two sources' KMV sketches: merged bottom-k →
    Jaccard / union-size / intersection-size estimates between src0
    and src1's shingle sets — 'how much do these two feeds overlap'
    without comparing any documents."""
    from ctinexus_spark.operators.sketches import kmv_overlap

    return kmv_overlap(
        _grams3_df(spark, sf_dir, with_source=True), "source", "v",
        ga="src0", gb="src1", k=256,
    )


_KMV_SCALE = float(255 * (1 << 32))

ORACLES["kmv_distinct"] = f"""
WITH {_GRAMS3_CTES},
dh AS (SELECT DISTINCT source, {_hex32_sql('v')} AS h FROM g),
rk AS (SELECT source, h, row_number() OVER (PARTITION BY source ORDER BY h) AS r FROM dh),
top AS (SELECT source, CAST(count(*) AS INT) AS n_kept FROM rk WHERE r <= 256 GROUP BY source),
kth AS (SELECT source, h AS kth_hash FROM rk WHERE r = 256)
SELECT t.source AS "group", t.n_kept,
       CAST(coalesce(k.kth_hash, -1) AS BIGINT) AS kth_hash,
       CASE WHEN k.kth_hash IS NULL THEN CAST(t.n_kept AS DOUBLE)
            ELSE {_KMV_SCALE!r}::DOUBLE / CAST(k.kth_hash AS DOUBLE) END AS kmv_est
FROM top t LEFT JOIN kth k USING (source)
"""

ORACLES["kmv_overlap"] = f"""
WITH {_GRAMS3_CTES},
dh AS (SELECT DISTINCT source, {_hex32_sql('v')} AS h FROM g
       WHERE source IN ('src0', 'src1')),
rk AS (SELECT source, h, row_number() OVER (PARTITION BY source ORDER BY h) AS r FROM dh),
a AS (SELECT list(h ORDER BY h) AS hs FROM rk WHERE source = 'src0' AND r <= 256),
b AS (SELECT list(h ORDER BY h) AS hs FROM rk WHERE source = 'src1' AND r <= 256),
u AS (SELECT list_slice(list_sort(list_distinct(flatten([a.hs, b.hs]))), 1, 256) AS hs
      FROM a, b),
m AS (
  SELECT len(list_intersect(list_intersect(u.hs, a.hs), b.hs)) AS c,
         len(u.hs) AS kp, u.hs[256] AS ukth, len(u.hs) >= 256 AS isfull
  FROM u, a, b
)
SELECT CAST(c AS INT) AS inter_common,
       CAST(kp AS INT) AS k_union,
       CAST(c AS DOUBLE) / CAST(kp AS DOUBLE) AS jaccard_est,
       CASE WHEN isfull THEN {_KMV_SCALE!r}::DOUBLE / CAST(ukth AS DOUBLE)
            ELSE CAST(kp AS DOUBLE) END AS union_est,
       (CAST(c AS DOUBLE) / CAST(kp AS DOUBLE))
         * (CASE WHEN isfull THEN {_KMV_SCALE!r}::DOUBLE / CAST(ukth AS DOUBLE)
                 ELSE CAST(kp AS DOUBLE) END) AS inter_est
FROM m
"""

QUERIES["kmv_distinct"] = q_kmv_distinct
QUERIES["kmv_overlap"] = q_kmv_overlap


# --- BM25 retrieval + exact quantiles (round 5) -------------------------

# BM25 constants, computed ONCE in Python and embedded verbatim on
# both engines (repr round-trips to the identical double; DuckDB bare
# literals are DECIMAL, so every embedding carries ::DOUBLE)
_BM25_K1 = 1.2
_BM25_B = 0.75
_BM25_K1P1 = _BM25_K1 + 1.0
_BM25_1MB = 1.0 - _BM25_B


def _bm25_query_terms(doc_terms):
    """Deterministic fixture-free query set: rank corpus 3-grams by
    (count desc, gram asc) and slice three bands — q_hot (ranks 1-5),
    q_mid (51-55), q_tail (201-205). Self-contained at every sf (the
    corpus has >> 205 distinct grams at sf0.001 already)."""
    from pyspark.sql import Window

    ranked = (
        doc_terms.groupBy("term")
        .agg(F.count("*").cast("bigint").alias("c"))
        .orderBy(F.col("c").desc(), F.col("term"))
        .limit(205)
    )
    r = F.row_number().over(Window.orderBy(F.col("c").desc(), F.col("term")))
    qid = (
        F.when(F.col("r") <= 5, F.lit("q_hot"))
        .when((F.col("r") >= 51) & (F.col("r") <= 55), F.lit("q_mid"))
        .when((F.col("r") >= 201) & (F.col("r") <= 205), F.lit("q_tail"))
    )
    return (
        ranked.withColumn("r", r)
        .select(qid.alias("query_id"), "term")
        .filter(F.col("query_id").isNotNull())
    )


def q_bm25_topk(spark, sf_dir):
    """Corpus-wide BM25 top-10 per query over 3-gram terms, with the
    query set derived from the corpus itself (hot/mid/tail gram
    bands). Rational-idf scoring — bit-exact across engines; rankings
    identical to log-idf BM25 (monotone transform)."""
    from ctinexus_spark.operators import retrieval as R
    from ctinexus_spark.partitioning import barrier, ensure_parallelism

    docs = ensure_parallelism(_docs(spark, sf_dir))
    doc_terms = R.ngram_terms(docs, n=3)
    # the query-term table feeds two joins inside bm25_topk — barrier
    # the branch point (CLAUDE gotcha: lazy persist races; and the
    # ranked derivation shouldn't recompute per consumer)
    qterms = barrier(_bm25_query_terms(doc_terms))
    return R.bm25_topk(
        doc_terms, qterms, k1=_BM25_K1, b=_BM25_B, k=10, idf="rational"
    )


def q_doc_len_quantiles(spark, sf_dir):
    """Exact token-count quantiles of the document corpus — the
    length-threshold profile (Gopher-style cuts) computed exactly via
    (value, count) aggregation + running sum, instead of the
    engine-specific percentile_approx sketch."""
    from ctinexus_spark.operators import stats as ST
    from ctinexus_spark.partitioning import ensure_parallelism

    docs = ensure_parallelism(_docs(spark, sf_dir))
    lens = docs.select(
        F.size(F.split(F.col("text"), " ")).cast("bigint").alias("n_tokens")
    )
    return ST.exact_quantiles(
        lens, "n_tokens", qs=(0.1, 0.25, 0.5, 0.75, 0.9, 0.99)
    )


_BM25_DT_CTES = """tk AS (SELECT doc_id, str_split(text, ' ') AS l FROM documents),
dt AS (
  SELECT doc_id, array_to_string(list_slice(l, i, i + 2), ' ') AS term
  FROM tk, unnest(range(1, len(l) - 1)) t(i)
  WHERE len(l) >= 3
)"""

ORACLES["bm25_topk"] = f"""
WITH {_BM25_DT_CTES},
ranked AS (
  SELECT term, CAST(count(*) AS BIGINT) AS c FROM dt GROUP BY term
  ORDER BY c DESC, term LIMIT 205
),
rk AS (SELECT term, row_number() OVER (ORDER BY c DESC, term) AS r FROM ranked),
qt AS (
  SELECT CASE WHEN r <= 5 THEN 'q_hot'
              WHEN r BETWEEN 51 AND 55 THEN 'q_mid'
              WHEN r BETWEEN 201 AND 205 THEN 'q_tail' END AS query_id, term
  FROM rk
  WHERE r <= 5 OR r BETWEEN 51 AND 55 OR r BETWEEN 201 AND 205
),
tf AS (
  SELECT dt.doc_id, dt.term, CAST(count(*) AS BIGINT) AS tf
  FROM dt JOIN (SELECT DISTINCT term FROM qt) v USING (term)
  GROUP BY dt.doc_id, dt.term
),
dft AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY term),
dl AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS dl FROM dt GROUP BY doc_id),
sc AS (
  SELECT CAST(count(*) AS DOUBLE) AS n_docs,
         CAST(sum(dl) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avgdl
  FROM dl
),
ct AS (
  SELECT qt.query_id, tf.doc_id, tf.term,
         (((sc.n_docs - CAST(dft.df AS DOUBLE)) + 0.5::DOUBLE)
            / (CAST(dft.df AS DOUBLE) + 0.5::DOUBLE))
           * (CAST(tf.tf AS DOUBLE) * {_BM25_K1P1!r}::DOUBLE)
           / (CAST(tf.tf AS DOUBLE)
              + {_BM25_K1!r}::DOUBLE
                * ({_BM25_1MB!r}::DOUBLE
                   + {_BM25_B!r}::DOUBLE
                     * (CAST(dl.dl AS DOUBLE) / sc.avgdl))) AS contrib
  FROM tf
  JOIN dft USING (term)
  JOIN qt USING (term)
  JOIN dl USING (doc_id)
  CROSS JOIN sc
),
pd AS (
  SELECT query_id, doc_id, CAST(count(*) AS BIGINT) AS n_hit,
         list_sum(list(contrib ORDER BY term)) AS score
  FROM ct GROUP BY query_id, doc_id
),
rkd AS (
  SELECT query_id, doc_id, n_hit, score,
         CAST(row_number() OVER (
           PARTITION BY query_id ORDER BY score DESC, doc_id) AS INT) AS rank
  FROM pd
)
SELECT query_id, doc_id, n_hit, score, rank FROM rkd WHERE rank <= 10
"""

ORACLES["doc_len_quantiles"] = """
WITH v AS (
  SELECT CAST(len(str_split(text, ' ')) AS BIGINT) AS value FROM documents
),
c AS (SELECT value, CAST(count(*) AS BIGINT) AS cnt FROM v GROUP BY value),
cum AS (
  SELECT value,
         CAST(sum(cnt) OVER (ORDER BY value ROWS UNBOUNDED PRECEDING) AS BIGINT) AS n_le
  FROM c
),
t AS (SELECT CAST(sum(cnt) AS BIGINT) AS n_total FROM c),
qq AS (
  SELECT unnest([0.1::DOUBLE, 0.25::DOUBLE, 0.5::DOUBLE,
                 0.75::DOUBLE, 0.9::DOUBLE, 0.99::DOUBLE]) AS q
)
SELECT qq.q, min(cum.value) AS value, min(cum.n_le) AS n_le,
       min(t.n_total) AS n_total
FROM cum, t, qq
WHERE cum.n_le >= CAST(ceil(qq.q * CAST(t.n_total AS DOUBLE)) AS BIGINT)
GROUP BY qq.q
"""

QUERIES["bm25_topk"] = q_bm25_topk
QUERIES["doc_len_quantiles"] = q_doc_len_quantiles


def q_part_communities(spark, sf_dir):
    """Label-propagation communities over the (distinct) supplier→part
    shipment graph, 4 synchronous rounds — the deterministic LPA
    variant (most frequent neighbor label, ties to the smallest).
    Fixed round count ⇒ ZERO driver syncs; the oracle is the same
    recurrence unrolled in SQL. Output adds the community size."""
    from ctinexus_spark.graph.analytics import label_propagation
    from ctinexus_spark.partitioning import barrier

    edges = _shipment_edges(spark, sf_dir).distinct()
    labels = barrier(label_propagation(edges, rounds=4))
    sizes = labels.groupBy("label").agg(
        F.count("*").cast("bigint").alias("comm_size")
    )
    return labels.join(sizes, "label").select("vertex", "label", "comm_size")


def _lpa_sql(rounds: int) -> str:
    """DuckDB twin of q_part_communities: the LPA recurrence unrolled
    `rounds` times (vote counts are integers; the argmax is the
    lexicographic struct min — both engines agree exactly)."""
    parts = [
        """e AS (
  SELECT DISTINCT 's' || l_suppkey AS a, 'p' || l_partkey AS b FROM lineitem
),
und AS (SELECT a, b FROM e UNION ALL SELECT b AS a, a AS b FROM e),
l0 AS (SELECT DISTINCT a AS v, a AS label FROM und)"""
    ]
    for r in range(1, rounds + 1):
        parts.append(
            f"""v{r} AS (
  SELECT u.a AS v, l.label, CAST(count(*) AS BIGINT) AS cnt
  FROM und u JOIN l{r - 1} l ON u.b = l.v GROUP BY u.a, l.label
),
l{r} AS (
  SELECT v, (min(struct_pack(nc := -cnt, lb := label))).lb AS label
  FROM v{r} GROUP BY v
)"""
        )
    return (
        "WITH "
        + ",\n".join(parts)
        + f""",
cs AS (SELECT label, CAST(count(*) AS BIGINT) AS comm_size FROM l{rounds} GROUP BY label)
SELECT l{rounds}.v AS vertex, l{rounds}.label, cs.comm_size
FROM l{rounds} JOIN cs USING (label)
"""
    )


ORACLES["part_communities"] = _lpa_sql(rounds=4)
QUERIES["part_communities"] = q_part_communities


def q_cluster_topics(spark, sf_dir):
    """Per-cluster topic signatures: IVF-cell document clusters
    labeled with their top-5 DISTINCTIVE 3-grams by lift ratio
    p(gram|cell)/p(gram) — the BERTopic c-TF-IDF shape (lift written
    as a fixed-order IEEE chain, engine bit-exact; BERTopic's log
    weighting is a monotone transform). min_count=2: the sf corpora
    put 20-83 twice-seen grams in every cell; >=3 empties cells."""
    from ctinexus_spark.operators import retrieval as R
    from ctinexus_spark.operators import similarity as S
    from ctinexus_spark.operators import stats as ST
    from ctinexus_spark.partitioning import barrier, ensure_parallelism

    assign = barrier(S.ivf_assign(_emb(spark, sf_dir)))
    docs = ensure_parallelism(_docs(spark, sf_dir))
    return ST.cluster_topic_terms(
        assign, R.ngram_terms(docs, n=3), min_count=2, k=5
    )


ORACLES["cluster_topics"] = f"""
WITH {_IVF_ASSIGN_SQL},
{_BM25_DT_CTES},
tg AS (
  SELECT a.cell, dt.term FROM dt JOIN assign a ON dt.doc_id = a.vec_id
),
cnt AS (
  SELECT cell, term, CAST(count(*) AS BIGINT) AS n FROM tg GROUP BY cell, term
),
ctot AS (SELECT cell, CAST(sum(n) AS BIGINT) AS ct FROM cnt GROUP BY cell),
ttot AS (SELECT term, CAST(sum(n) AS BIGINT) AS tn FROM cnt GROUP BY term),
grand AS (SELECT CAST(sum(n) AS DOUBLE) AS grand FROM cnt),
sz AS (SELECT cell, CAST(count(*) AS BIGINT) AS n_docs FROM assign GROUP BY cell),
scored AS (
  SELECT cnt.cell, cnt.term AS gram, cnt.n,
         (CAST(cnt.n AS DOUBLE) * grand.grand)
           / (CAST(ctot.ct AS DOUBLE) * CAST(ttot.tn AS DOUBLE)) AS ratio
  FROM cnt
  JOIN ctot USING (cell)
  JOIN ttot ON cnt.term = ttot.term
  CROSS JOIN grand
  WHERE cnt.n >= 2
),
rk AS (
  SELECT cell, gram, n, ratio,
         CAST(row_number() OVER (
           PARTITION BY cell ORDER BY ratio DESC, gram) AS INT) AS rank
  FROM scored
)
SELECT rk.cell, rk.gram, rk.n, sz.n_docs, rk.ratio, rk.rank
FROM rk JOIN sz USING (cell) WHERE rank <= 5
"""

QUERIES["cluster_topics"] = q_cluster_topics

# headline bench additions (scale-path variants only)
BENCH_QUERIES = {
    "dedup_minhash_lsh": q_lsh_candidates,
    "dedup_simhash_cand": q_simhash_candidates,
    "dedup_clusters_cc": q_dedup_clusters_cc,
    "dedup_shingle_verify": q_shingle_overlap,
    "emb_neardup_lsh": q_emb_cosine_pairs,
    "ann_lsh_topk": q_lsh_topk,
    "text_quality": q_quality,
    "text_gopher": q_gopher_rules,
    "text_winnow_fp": q_winnow_fp,
    "dedup_lines": q_line_dedup,
    "decontaminate": q_decontaminate,
    "tpch_q1": q_tpch_q1,
    "dup_grams": q_dup_grams,
    "token_pmi": q_token_pmi,
    "graph_pagerank": q_graph_pagerank_bench,
    "dedup_incremental": q_dedup_incremental,
    # O(1)-state sketches (round 5): the cardinality/heavy-hitter
    # profiles a 100 TB pipeline runs instead of exact distincts
    "sketch_hll": q_hll_distinct,
    "sketch_cms": q_cms_topk,
    # zero-driver-sync iterative graph op (fixed-round LPA)
    "graph_lpa": q_part_communities,
    # temporal primitives (round 5): as-of carry + cascading rollup
    "temporal_asof": q_event_asof_purchase,
    "temporal_rollup": q_event_rollup_cascade,
}


def _bench_kg_global_entities(spark, sf_dir):
    from ctinexus_spark import entry_queries

    return entry_queries.q_kg_global_entities(spark, sf_dir)


# the two cross-document flagships a 100 TB user runs daily (round-4
# verdict #6): global entity resolution and incremental crawl admission
BENCH_QUERIES["kg_global_entities"] = _bench_kg_global_entities


def q_jaccard_pairs(spark, sf_dir):
    """EXACT all-pairs near-dup join (shingle Jaccard >= 1/2) via
    prefix filtering — the deterministic sibling of the MinHash/LSH
    funnel: no probabilistic recall loss, no bucket cap, yet never
    O(n²) (candidates equi-join only on each doc's globally RAREST
    shingles; PPJoin prefix principle, operators/dedup.py). The
    oracle is the brute-force all-pairs intersection — an independent
    algorithm — so the gate checks the prefix filter lost nothing.
    Threshold stays integer on both engines ((p+q)·I >= p·(|A|+|B|));
    jaccard is one IEEE division of integer-valued doubles."""
    return D.jaccard_join_exact(_docs(spark, sf_dir), threshold=(1, 2))


ORACLES["jaccard_pairs"] = f"""
WITH sh AS (SELECT doc_id, unnest({_SHINGLES}) AS shingle FROM documents),
cnt AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n FROM sh GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS a_id, b.doc_id AS b_id, CAST(count(*) AS BIGINT) AS n_shared
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
)
SELECT i.a_id, i.b_id, i.n_shared, ca.n AS n_a, cb.n AS n_b,
       CAST(i.n_shared AS DOUBLE) / CAST(ca.n + cb.n - i.n_shared AS DOUBLE) AS jaccard
FROM inter i
JOIN cnt ca ON i.a_id = ca.doc_id
JOIN cnt cb ON i.b_id = cb.doc_id
WHERE 3 * i.n_shared >= 1 * (ca.n + cb.n)
"""
QUERIES["jaccard_pairs"] = q_jaccard_pairs


def q_event_funnel(spark, sf_dir):
    """Ordered conversion funnel view → click → purchase per user:
    earliest completion time of each step strictly after the previous
    one. Spark side is the single-shuffle fold (per-user sorted event
    array + nested higher-order filters, operators/temporal.py); the
    oracle is the k-stage join+agg cascade — two independent
    formulations of the same recurrence. Epoch-micro BIGINTs with -1
    sentinels (nullable-BIGINT pandas round-trip precedent)."""
    from ctinexus_spark.operators.temporal import funnel

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return funnel(ev, ["view", "click", "purchase"]).select(
        "user_id",
        F.col("t0").alias("t_view"),
        F.col("t1").alias("t_click"),
        F.col("t2").alias("t_purchase"),
        "depth",
    )


ORACLES["event_funnel"] = """
WITH s0 AS (
  SELECT user_id, min(epoch_us(ts)) AS t0 FROM events
  WHERE event_type = 'view' GROUP BY user_id
),
s1 AS (
  SELECT e.user_id, min(epoch_us(e.ts)) AS t1
  FROM events e JOIN s0 USING (user_id)
  WHERE e.event_type = 'click' AND epoch_us(e.ts) > s0.t0
  GROUP BY e.user_id
),
s2 AS (
  SELECT e.user_id, min(epoch_us(e.ts)) AS t2
  FROM events e JOIN s1 USING (user_id)
  WHERE e.event_type = 'purchase' AND epoch_us(e.ts) > s1.t1
  GROUP BY e.user_id
)
SELECT s0.user_id,
       CAST(s0.t0 AS BIGINT) AS t_view,
       CAST(coalesce(s1.t1, -1) AS BIGINT) AS t_click,
       CAST(coalesce(s2.t2, -1) AS BIGINT) AS t_purchase,
       CAST(1 + (s1.t1 IS NOT NULL)::INT + (s2.t2 IS NOT NULL)::INT AS INT) AS depth
FROM s0 LEFT JOIN s1 USING (user_id) LEFT JOIN s2 USING (user_id)
"""
QUERIES["event_funnel"] = q_event_funnel


def q_part_linkpred(spark, sf_dir):
    """Common-neighbor link prediction over the part co-occurrence
    graph restricted to parts < 300 (the part_truss subgraph):
    non-adjacent pairs with >= 5 shared neighbors, scored by
    neighborhood Jaccard — unsupervised KG-completion / recommendation
    shape (graph/analytics.link_prediction: wedge enumeration →
    partial-agg pair counts → LEFT ANTI vs the edge set; jaccard one
    IEEE division of integer-valued doubles). 270 rows at sf0.01."""
    from ctinexus_spark.graph.analytics import link_prediction

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_partkey"
    )
    a = li.select(F.col("l_orderkey").alias("k"), F.col("l_partkey").alias("pa"))
    b = li.select(F.col("l_orderkey").alias("k"), F.col("l_partkey").alias("pb"))
    edges = (
        a.join(b, "k")
        .filter(
            (F.col("pa") < F.col("pb")) & (F.col("pa") < 300) & (F.col("pb") < 300)
        )
        .select(F.col("pa").alias("src"), F.col("pb").alias("dst"))
        .distinct()
    )
    return link_prediction(edges, min_common=5)


ORACLES["part_linkpred"] = """
WITH e AS (
  SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
  FROM lineitem a JOIN lineitem b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  WHERE a.l_partkey < 300 AND b.l_partkey < 300
),
und AS (SELECT u AS x, v AS y FROM e UNION ALL SELECT v AS x, u AS y FROM e),
deg AS (SELECT x, CAST(count(*) AS BIGINT) AS d FROM und GROUP BY x),
wedges AS (
  SELECT p.x AS u, r.x AS v, CAST(count(*) AS BIGINT) AS n_common
  FROM und p JOIN und r ON p.y = r.y AND p.x < r.x
  GROUP BY p.x, r.x HAVING count(*) >= 5
),
open_pairs AS (
  SELECT w.* FROM wedges w LEFT JOIN e ON w.u = e.u AND w.v = e.v
  WHERE e.u IS NULL
)
SELECT o.u AS a, o.v AS b, o.n_common, da.d AS deg_a, db.d AS deg_b,
       CAST(o.n_common AS DOUBLE) / CAST(da.d + db.d - o.n_common AS DOUBLE) AS jaccard
FROM open_pairs o JOIN deg da ON o.u = da.x JOIN deg db ON o.v = db.x
"""
QUERIES["part_linkpred"] = q_part_linkpred


def q_cohort_retention(spark, sf_dir):
    """DAILY cohort retention triangle over the events table: users
    bucketed by first-event day, per-offset active fraction — the
    growth-analytics standard (operators/temporal.cohort_retention).
    Daily, not weekly: the sf corpora span 30 days of always-on users,
    so weekly cells are all 1.0 — daily gives a real 59-cell triangle
    (n_active 13-134 at sf0.01). Bucket index = exact BIGINT `div` of
    epoch-micros on BOTH engines (no double rounding at bucket edges);
    retention one IEEE division of integer-valued doubles."""
    from ctinexus_spark.operators.temporal import cohort_retention

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return cohort_retention(ev, bucket_seconds=86_400)


ORACLES["cohort_retention"] = """
WITH ev AS (
  SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS bk FROM events
),
first AS (SELECT user_id, min(bk) AS cohort_bucket FROM ev GROUP BY user_id),
cells AS (
  SELECT f.cohort_bucket, ev.bk - f.cohort_bucket AS bucket_offset,
         CAST(count(*) AS BIGINT) AS n_active
  FROM ev JOIN first f USING (user_id)
  GROUP BY f.cohort_bucket, ev.bk - f.cohort_bucket
),
sz AS (SELECT cohort_bucket, CAST(count(*) AS BIGINT) AS cohort_size FROM first GROUP BY cohort_bucket)
SELECT c.cohort_bucket, CAST(c.bucket_offset AS BIGINT) AS bucket_offset,
       c.n_active, sz.cohort_size,
       CAST(c.n_active AS DOUBLE) / CAST(sz.cohort_size AS DOUBLE) AS retention
FROM cells c JOIN sz USING (cohort_bucket)
"""
QUERIES["cohort_retention"] = q_cohort_retention


def q_part_sssp(spark, sf_dir):
    """Cheapest routes through the supplier↔part shipment graph:
    bounded-hop weighted shortest paths from supplier s1, edge weight
    = min shipped quantity per (supplier, part) — 4 Bellman-Ford
    relaxation rounds (graph/analytics.sssp; the graph's diameter from
    s1 is 3, the 4th round still relaxes costs). Integer BIGINT
    distances — hash-exact; oracle is the same recurrence unrolled."""
    from ctinexus_spark.graph.analytics import sssp

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    edges = (
        li.groupBy(
            F.concat(F.lit("s"), F.col("l_suppkey")).alias("src"),
            F.concat(F.lit("p"), F.col("l_partkey")).alias("dst"),
        )
        .agg(F.min("l_quantity").cast("bigint").alias("weight"))
    )
    return sssp(edges, seeds=["s1"], max_hops=4)


def _sssp_sql(rounds: int, seed: str) -> str:
    parts = [
        """e AS (
  SELECT 's' || l_suppkey AS a, 'p' || l_partkey AS b,
         CAST(min(l_quantity) AS BIGINT) AS w
  FROM lineitem GROUP BY 's' || l_suppkey, 'p' || l_partkey
),
und AS (SELECT a AS x, b AS y, w FROM e UNION ALL SELECT b AS x, a AS y, w FROM e),
d0 AS (SELECT '%s' AS v, CAST(0 AS BIGINT) AS dist)"""
        % seed
    ]
    for r in range(1, rounds + 1):
        parts.append(
            f"""d{r} AS (
  SELECT v, min(dist) AS dist FROM (
    SELECT v, dist FROM d{r - 1}
    UNION ALL
    SELECT u.y AS v, d.dist + u.w AS dist FROM d{r - 1} d JOIN und u ON d.v = u.x
  ) GROUP BY v
)"""
        )
    return "WITH " + ",\n".join(parts) + f"\nSELECT v, dist FROM d{rounds}"


ORACLES["part_sssp"] = _sssp_sql(rounds=4, seed="s1")
QUERIES["part_sssp"] = q_part_sssp


def q_hybrid_topk(spark, sf_dir):
    """Hybrid more-like-this retrieval for 8 query documents: lexical
    BM25 (query terms = the doc's 5 globally-RAREST 3-grams — the MLT
    'interesting terms' heuristic) top-20 fused with dense cosine
    top-20 by reciprocal-rank fusion (retrieval.rrf_fuse; 1/(60+r),
    missing side contributes 0, score a fixed left-to-right chain of
    IEEE divisions — engine bit-exact). The production hybrid-search
    shape: two independent retrievers, provenance-preserving fusion."""
    from pyspark.sql import Window
    from ctinexus_spark.operators import retrieval as R
    from ctinexus_spark.operators import similarity as S
    from ctinexus_spark.partitioning import barrier, ensure_parallelism

    docs = ensure_parallelism(_docs(spark, sf_dir))
    doc_terms = barrier(R.ngram_terms(docs, n=3))
    ddt = doc_terms.distinct()
    dfreq = ddt.groupBy("term").agg(F.count("*").cast("bigint").alias("df"))
    w = Window.partitionBy("doc_id").orderBy("df", "term")
    qterms = (
        ddt.filter(F.col("doc_id") < 8)
        .join(dfreq, "term")
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 5)
        .select(F.col("doc_id").alias("query_id"), "term")
    )
    lex = R.bm25_topk(
        doc_terms, barrier(qterms), k1=_BM25_K1, b=_BM25_B, k=20, idf="rational"
    )
    emb = _emb(spark, sf_dir)
    dense = S.brute_force_topk(emb, emb.filter(F.col("vec_id") < 8), k=20)
    return R.rrf_fuse(
        [
            lex.select("query_id", "doc_id", "rank"),
            dense.select("query_id", F.col("neighbor_id").alias("doc_id"), "rank"),
        ],
        names=["lex", "dense"],
        rrf_k=60,
        topk=10,
    )


ORACLES["hybrid_topk"] = f"""
WITH {_BM25_DT_CTES},
ddt AS (SELECT DISTINCT doc_id, term FROM dt),
dfreq AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM ddt GROUP BY term),
qt AS (
  SELECT doc_id AS query_id, term FROM (
    SELECT d.doc_id, d.term,
           row_number() OVER (PARTITION BY d.doc_id ORDER BY f.df, d.term) AS rk
    FROM ddt d JOIN dfreq f USING (term) WHERE d.doc_id < 8
  ) WHERE rk <= 5
),
tf AS (
  SELECT dt.doc_id, dt.term, CAST(count(*) AS BIGINT) AS tf
  FROM dt JOIN (SELECT DISTINCT term FROM qt) v USING (term)
  GROUP BY dt.doc_id, dt.term
),
dft AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY term),
dl AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS dl FROM dt GROUP BY doc_id),
sc AS (
  SELECT CAST(count(*) AS DOUBLE) AS n_docs,
         CAST(sum(dl) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avgdl
  FROM dl
),
ct AS (
  SELECT qt.query_id, tf.doc_id, tf.term,
         (((sc.n_docs - CAST(dft.df AS DOUBLE)) + 0.5::DOUBLE)
            / (CAST(dft.df AS DOUBLE) + 0.5::DOUBLE))
           * (CAST(tf.tf AS DOUBLE) * {_BM25_K1P1!r}::DOUBLE)
           / (CAST(tf.tf AS DOUBLE)
              + {_BM25_K1!r}::DOUBLE
                * ({_BM25_1MB!r}::DOUBLE
                   + {_BM25_B!r}::DOUBLE
                     * (CAST(dl.dl AS DOUBLE) / sc.avgdl))) AS contrib
  FROM tf
  JOIN dft USING (term)
  JOIN qt USING (term)
  JOIN dl USING (doc_id)
  CROSS JOIN sc
),
pd AS (
  SELECT query_id, doc_id,
         list_sum(list(contrib ORDER BY term)) AS score
  FROM ct GROUP BY query_id, doc_id
),
lex AS (
  SELECT query_id, doc_id, CAST(row_number() OVER (
           PARTITION BY query_id ORDER BY score DESC, doc_id) AS INT) AS rank
  FROM pd QUALIFY rank <= 20
),
dn AS (
  SELECT q.vec_id AS query_id, c.vec_id AS doc_id,
         CAST(row_number() OVER (
           PARTITION BY q.vec_id
           ORDER BY list_cosine_similarity(q.embedding::DOUBLE[], c.embedding::DOUBLE[]) DESC,
                    c.vec_id) AS INT) AS rank
  FROM embeddings q JOIN embeddings c ON c.vec_id != q.vec_id
  WHERE q.vec_id < 8
  QUALIFY rank <= 20
),
fused AS (
  SELECT coalesce(l.query_id, d.query_id) AS query_id,
         coalesce(l.doc_id, d.doc_id) AS doc_id,
         CAST(coalesce(l.rank, -1) AS INT) AS rank_lex,
         CAST(coalesce(d.rank, -1) AS INT) AS rank_dense,
         coalesce(1.0::DOUBLE / CAST(60 + l.rank AS DOUBLE), 0.0::DOUBLE)
           + coalesce(1.0::DOUBLE / CAST(60 + d.rank AS DOUBLE), 0.0::DOUBLE) AS rrf_score
  FROM lex l FULL OUTER JOIN dn d
    ON l.query_id = d.query_id AND l.doc_id = d.doc_id
)
SELECT query_id, doc_id, rank_lex, rank_dense, rrf_score,
       CAST(row_number() OVER (
         PARTITION BY query_id ORDER BY rrf_score DESC, doc_id) AS INT) AS rank
FROM fused
QUALIFY rank <= 10
"""
QUERIES["hybrid_topk"] = q_hybrid_topk


# round-5 late bench additions: the EXACT (prefix-filter) near-dup
# join — the deterministic sibling of the MinHash funnel — the hybrid
# BM25+dense RRF retrieval, and the single-shuffle conversion funnel
BENCH_QUERIES["dedup_exact_jaccard"] = q_jaccard_pairs
BENCH_QUERIES["retrieval_hybrid"] = q_hybrid_topk
BENCH_QUERIES["temporal_funnel"] = q_event_funnel


def q_event_bursts(spark, sf_dir):
    """Daily per-event-type burst flags: |c − μ| > 2σ in EXACT integer
    arithmetic — q²·(n·c−S)² > p²·(n·SS−S²), no sqrt, no float
    accumulation (operators/stats.burst_detection). dev_sq_ratio (the
    squared z-score) is one IEEE division of integer-valued doubles.
    ~150 daily cells at sf0.01, a handful flagged."""
    from ctinexus_spark.operators.stats import burst_detection

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return burst_detection(ev)


ORACLES["event_bursts"] = """
WITH counts AS (
  SELECT event_type AS key, epoch_us(ts) // 86400000000 AS bucket,
         CAST(count(*) AS BIGINT) AS cnt
  FROM events GROUP BY event_type, epoch_us(ts) // 86400000000
),
m AS (
  SELECT key, CAST(count(*) AS BIGINT) AS n, CAST(sum(cnt) AS BIGINT) AS s,
         CAST(sum(cnt * cnt) AS BIGINT) AS ss
  FROM counts GROUP BY key
)
SELECT c.key AS event_type, CAST(c.bucket AS BIGINT) AS bucket, c.cnt, m.n,
       CASE WHEN m.n * m.ss - m.s * m.s > 0
            THEN CAST((m.n * c.cnt - m.s) * (m.n * c.cnt - m.s) AS DOUBLE)
                   / CAST(m.n * m.ss - m.s * m.s AS DOUBLE)
            ELSE 0.0::DOUBLE END AS dev_sq_ratio,
       1 * (m.n * c.cnt - m.s) * (m.n * c.cnt - m.s)
         > 4 * (m.n * m.ss - m.s * m.s) AS is_burst
FROM counts c JOIN m USING (key)
"""
QUERIES["event_bursts"] = q_event_bursts


def q_part_walks(spark, sf_dir):
    """Deterministic DeepWalk corpus over the part co-occurrence
    graph (parts < 300): 2 hash-driven uniform walks of length 4 from
    every vertex (graph/analytics.random_walks). Hash-driven ⇒ the
    sampled corpus is reproducible across runs/partitionings/engines;
    the oracle replays the identical walks step by step."""
    from ctinexus_spark.graph.analytics import random_walks

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_partkey"
    )
    a = li.select(F.col("l_orderkey").alias("k"), F.col("l_partkey").alias("pa"))
    b = li.select(F.col("l_orderkey").alias("k"), F.col("l_partkey").alias("pb"))
    edges = (
        a.join(b, "k")
        .filter(
            (F.col("pa") < F.col("pb")) & (F.col("pa") < 300) & (F.col("pb") < 300)
        )
        .select(F.col("pa").alias("src"), F.col("pb").alias("dst"))
        .distinct()
    )
    return random_walks(edges, walks_per_vertex=2, length=4, seed=7)


def _walks_sql(wpv: int, length: int, seed: int) -> str:
    def pick(step: int) -> str:
        key = (
            f"'{seed}|' || CAST(s.start AS VARCHAR) || '|' || "
            f"CAST(s.walk AS VARCHAR) || '|{step}|' || CAST(s.v AS VARCHAR)"
        )
        return _hex32_sql(key)

    parts = [
        """e AS (
  SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
  FROM lineitem a JOIN lineitem b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  WHERE a.l_partkey < 300 AND b.l_partkey < 300
),
und AS (SELECT u AS x, v AS y FROM e UNION ALL SELECT v AS x, u AS y FROM e),
adj AS (
  SELECT x, y, CAST(row_number() OVER (PARTITION BY x ORDER BY y) - 1 AS BIGINT) AS idx
  FROM und
),
deg AS (SELECT x, CAST(count(*) AS BIGINT) AS d FROM und GROUP BY x),
s0 AS (
  SELECT x AS start, CAST(w AS BIGINT) AS walk, x AS v
  FROM (SELECT DISTINCT x FROM und), range(0, %d) r(w)
)"""
        % wpv
    ]
    for t in range(1, length + 1):
        parts.append(
            f"""s{t} AS (
  SELECT s.start, s.walk, a.y AS v
  FROM s{t - 1} s
  JOIN deg ON s.v = deg.x
  JOIN adj a ON a.x = s.v AND a.idx = ({pick(t)}) %% deg.d
)""".replace("%%", "%")
        )
    selects = " UNION ALL ".join(
        f"SELECT start, walk, CAST({t} AS INT) AS step, v AS vertex FROM s{t}"
        for t in range(0, length + 1)
    )
    return "WITH " + ",\n".join(parts) + "\n" + selects


ORACLES["part_walks"] = _walks_sql(wpv=2, length=4, seed=7)
QUERIES["part_walks"] = q_part_walks


def q_event_twa(spark, sf_dir):
    """Time-weighted average of `value` per event type — the
    irregular-sampling mean (TimescaleDB time_weight('Linear') shape,
    operators/temporal.time_weighted_avg). Trapezoid terms are fixed
    IEEE chains; their sum is order-pinned on both engines (Spark
    left-fold over array_sort(collect_list), DuckDB list_sum(list(...
    ORDER BY)) — the lm_scores fold precedent); one final division by
    the exact integer span."""
    from ctinexus_spark.operators.temporal import time_weighted_avg

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return time_weighted_avg(ev)


ORACLES["event_twa"] = """
WITH ev AS (
  SELECT event_type AS key, epoch_us(ts) AS tus, CAST(value AS DOUBLE) AS v
  FROM events
),
tr AS (
  SELECT key, tus, v,
         lead(tus) OVER w AS t2, lead(v) OVER w AS v2
  FROM ev WINDOW w AS (PARTITION BY key ORDER BY tus, v)
),
terms AS (
  SELECT key, tus, v, (v + v2) * CAST(t2 - tus AS DOUBLE) AS term
  FROM tr WHERE t2 IS NOT NULL
),
sp AS (
  SELECT key, CAST(max(tus) - min(tus) AS BIGINT) AS span_us,
         CAST(count(*) AS BIGINT) AS n
  FROM ev GROUP BY key
)
SELECT t.key AS event_type, sp.n AS n_samples, sp.span_us,
       list_sum(list(t.term ORDER BY t.tus, t.v))
         / (2.0::DOUBLE * CAST(sp.span_us AS DOUBLE)) AS twa
FROM terms t JOIN sp ON t.key = sp.key
WHERE sp.n >= 2 AND sp.span_us > 0
GROUP BY t.key, sp.n, sp.span_us
"""
QUERIES["event_twa"] = q_event_twa


def q_revenue_cube(spark, sf_dir):
    """CUBE over (market segment, order status): all 4 grouping-set
    combinations in one pass — the OLAP cross-tab the ROLLUP query
    (revenue_rollup) doesn't produce. Dims coalesced to '(all)';
    money through DECIMAL then DOUBLE (order-free, the rollup
    precedent); one customer⇄orders equi-join feeds the cube."""
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    j = o.join(c, o["o_custkey"] == c["c_custkey"])
    return (
        j.cube("c_mktsegment", "o_orderstatus")
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double").alias("total"),
            F.count("*").cast("bigint").alias("n"),
        )
        .select(
            F.coalesce("c_mktsegment", F.lit("(all)")).alias("segment"),
            F.coalesce("o_orderstatus", F.lit("(all)")).alias("status"),
            "total",
            "n",
        )
    )


ORACLES["revenue_cube"] = """
SELECT coalesce(c_mktsegment, '(all)') AS segment,
       coalesce(o_orderstatus, '(all)') AS status,
       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total,
       CAST(count(*) AS BIGINT) AS n
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY CUBE (c_mktsegment, o_orderstatus)
"""
QUERIES["revenue_cube"] = q_revenue_cube


def q_idle_customers(spark, sf_dir):
    """Customers with NO orders (LEFT ANTI join) plus each one's
    market segment and balance — the classical exclusion-join shape
    (at scale an anti join is the broadcast/DPP-friendly form of the
    NOT-IN subquery, which naive plans turn into a nested loop)."""
    o = spark.read.parquet(f"{sf_dir}/orders.parquet").select("o_custkey")
    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    return (
        c.join(o, c["c_custkey"] == o["o_custkey"], "left_anti")
        .select(
            "c_custkey",
            "c_mktsegment",
            F.col("c_acctbal").cast("double").alias("acctbal"),
        )
    )


ORACLES["idle_customers"] = """
SELECT c_custkey, c_mktsegment, CAST(c_acctbal AS DOUBLE) AS acctbal
FROM customer
WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
"""
QUERIES["idle_customers"] = q_idle_customers


def q_event_decay(spark, sf_dir):
    """Half-life-decayed trending counters per event type (half-life 7
    days over daily buckets, window 64) — stats.decayed_counts. The
    weight table is ONE Python-computed constant list embedded into
    both engines ({v!r}::DOUBLE, BM25 precedent — engine pow() could
    differ in the last ulp); terms fold in pinned bucket order."""
    from ctinexus_spark.operators.stats import decayed_counts

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return decayed_counts(ev)


def _decay_sql(half_life: float, window: int) -> str:
    from ctinexus_spark.operators.stats import decay_weights

    values = ", ".join(
        f"(CAST({o} AS BIGINT), {w!r}::DOUBLE)"
        for o, w in decay_weights(half_life, window)
    )
    return f"""
WITH counts AS (
  SELECT event_type AS key, epoch_us(ts) // 86400000000 AS bucket,
         CAST(count(*) AS BIGINT) AS cnt
  FROM events GROUP BY event_type, epoch_us(ts) // 86400000000
),
ref AS (SELECT max(bucket) AS ref_bucket FROM counts),
wt(off, weight) AS (VALUES {values}),
terms AS (
  SELECT c.key, r.ref_bucket, c.bucket, c.cnt,
         CAST(c.cnt AS DOUBLE) * w.weight AS term
  FROM counts c CROSS JOIN ref r
  JOIN wt w ON w.off = r.ref_bucket - c.bucket
)
SELECT key AS event_type, CAST(ref_bucket AS BIGINT) AS ref_bucket,
       CAST(count(*) AS BIGINT) AS n_buckets,
       CAST(sum(cnt) AS BIGINT) AS n_events,
       list_sum(list(term ORDER BY bucket)) AS score
FROM terms GROUP BY key, ref_bucket
"""


ORACLES["event_decay"] = _decay_sql(half_life=7.0, window=64)
QUERIES["event_decay"] = q_event_decay


def q_event_transitions(spark, sf_dir):
    """Within-session (30-min gap) event-type transition matrix with
    row-conditional probabilities — the user-journey Markov/Sankey
    primitive (operators/temporal.session_transitions). Integer pair
    counts; p one IEEE division. 25 cells at sf0.01 (5x5 types)."""
    from ctinexus_spark.operators.temporal import session_transitions

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return session_transitions(ev)


ORACLES["event_transitions"] = """
WITH seq AS (
  SELECT user_id, event_type,
         lag(event_type) OVER w AS from_type,
         epoch_us(ts) - lag(epoch_us(ts)) OVER w AS gap_us
  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
pairs AS (
  SELECT from_type, event_type AS to_type, CAST(count(*) AS BIGINT) AS n
  FROM seq WHERE from_type IS NOT NULL AND gap_us <= 1800000000
  GROUP BY from_type, event_type
),
tot AS (SELECT from_type, CAST(sum(n) AS BIGINT) AS row_n FROM pairs GROUP BY from_type)
SELECT p.from_type, p.to_type, p.n, t.row_n,
       CAST(p.n AS DOUBLE) / CAST(t.row_n AS DOUBLE) AS p
FROM pairs p JOIN tot t USING (from_type)
"""
QUERIES["event_transitions"] = q_event_transitions


def q_event_cusum(spark, sf_dir):
    """CUSUM drift chart over daily per-type event counts — sustained
    level-shift detection via the prefix identity S_t = P_t −
    least(0, min prefix P) (stats.cusum_drift), all-BIGINT window
    arithmetic, k = per-key floor-mean. Complements event_bursts
    (point outliers vs accumulated drift)."""
    from ctinexus_spark.operators.stats import cusum_drift

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return cusum_drift(ev, threshold=20)


ORACLES["event_cusum"] = """
WITH counts AS (
  SELECT event_type AS key, epoch_us(ts) // 86400000000 AS bucket,
         CAST(count(*) AS BIGINT) AS cnt
  FROM events GROUP BY event_type, epoch_us(ts) // 86400000000
),
kref AS (SELECT key, CAST(sum(cnt) // count(*) AS BIGINT) AS k FROM counts GROUP BY key),
prefixed AS (
  SELECT c.key, c.bucket, c.cnt, kref.k,
         sum(c.cnt - kref.k) OVER (
           PARTITION BY c.key ORDER BY c.bucket
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS p
  FROM counts c JOIN kref USING (key)
),
scored AS (
  SELECT key, bucket, cnt, k, p,
         min(p) OVER (
           PARTITION BY key ORDER BY bucket
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS mp
  FROM prefixed
)
SELECT key AS event_type, CAST(bucket AS BIGINT) AS bucket, cnt, k,
       CAST(p - least(CAST(0 AS BIGINT), mp) AS BIGINT) AS cusum,
       (p - least(CAST(0 AS BIGINT), mp)) > 20 AS alarm
FROM scored
"""
QUERIES["event_cusum"] = q_event_cusum


def q_order_zorder(spark, sf_dir):
    """Z-order (Morton) clustering keys over orders: interleave
    (o_custkey, order epoch-day) — the lakehouse OPTIMIZE ZORDER
    primitive that makes file min/max stats selective for range
    predicates on EITHER dimension (prepare.zorder_key, pure-JVM
    shift/mask fold, exact BIGINT). Sorting/writing by zkey is the
    layout step; this query pins the key math cross-engine."""
    from ctinexus_spark.operators.prepare import zorder_key

    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    day = "CAST(unix_micros(CAST(o_orderdate AS TIMESTAMP)) div 86400000000 AS BIGINT)"
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.expr(day).alias("order_day"),
        zorder_key("o_custkey", day).alias("zkey"),
    )


ORACLES["order_zorder"] = """
WITH base AS (
  SELECT o_orderkey, o_custkey,
         CAST(epoch_us(CAST(o_orderdate AS TIMESTAMP)) // 86400000000 AS BIGINT) AS order_day
  FROM orders
)
SELECT o_orderkey, o_custkey, order_day,
       CAST(list_sum(list_transform(range(0, 21), i ->
         (((o_custkey >> CAST(i AS INT)) % 2) << CAST(i * 2 AS INT))
         + (((order_day >> CAST(i AS INT)) % 2) << CAST(i * 2 + 1 AS INT))
       )) AS BIGINT) AS zkey
FROM base
"""
QUERIES["order_zorder"] = q_order_zorder


def q_user_event_pivot(spark, sf_dir):
    """PIVOT: per-user event counts widened to one column per event
    type (the 5 types pinned explicitly — an unpinned pivot scans
    once to discover values; pinning keeps the plan single-pass) —
    the classical wide-format operator. Integer counts, 0 for absent
    combinations."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    types = ["click", "error", "purchase", "signup", "view"]
    out = (
        ev.groupBy("user_id")
        .pivot("event_type", types)
        .agg(F.count(F.lit(1)))  # count(*) is invalid inside a pivot agg
    )
    return out.select(
        "user_id",
        *[F.coalesce(F.col(t), F.lit(0)).cast("bigint").alias(f"n_{t}") for t in types],
    )


ORACLES["user_event_pivot"] = """
SELECT user_id,
       CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS n_click,
       CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS n_error,
       CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_purchase,
       CAST(sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS n_signup,
       CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS n_view
FROM events GROUP BY user_id
"""
QUERIES["user_event_pivot"] = q_user_event_pivot


def q_user_event_unpivot(spark, sf_dir):
    """UNPIVOT (melt): the wide pivot table back to long form via the
    native unpivot operator, zero-count cells dropped — the round
    trip proves pivot+unpivot lose nothing, and the oracle is the
    DIRECT long-form aggregation (never pivoted at all)."""
    wide = q_user_event_pivot(spark, sf_dir)
    types = ["click", "error", "purchase", "signup", "view"]
    long = wide.unpivot(
        "user_id",
        [f"n_{t}" for t in types],
        "event_type",
        "n",
    )
    return long.filter(F.col("n") > 0).select(
        "user_id",
        F.expr("substring(event_type, 3)").alias("event_type"),
        F.col("n").cast("bigint").alias("n"),
    )


ORACLES["user_event_unpivot"] = """
SELECT user_id, event_type, CAST(count(*) AS BIGINT) AS n
FROM events GROUP BY user_id, event_type
"""
QUERIES["user_event_unpivot"] = q_user_event_unpivot


def q_part_name_fuzzy(spark, sf_dir):
    """Fuzzy record linkage over part names: all DISTINCT-name pairs
    within levenshtein 2, each with its part-group size — the
    entity-matching join (dedup.edit_distance_join: bigram-blocked,
    EXACT — one edit kills <= 2 bigrams so lev<=k forces a shared
    bigram at these lengths; |len diff| filter; JVM levenshtein
    verify, bit-identical to DuckDB's). Names dedupe + group counts
    upstream so duplicate groups never square."""
    from ctinexus_spark.operators.dedup import edit_distance_join

    p = spark.read.parquet(f"{sf_dir}/part.parquet")
    names = p.groupBy(F.col("p_name").alias("name")).agg(
        F.count("*").cast("bigint").alias("n_parts")
    )
    pairs = edit_distance_join(names, threshold=2, id_col="name")
    na = names.select(F.col("name").alias("a"), F.col("n_parts").alias("n_a"))
    nb = names.select(F.col("name").alias("b"), F.col("n_parts").alias("n_b"))
    return pairs.join(na, "a").join(nb, "b").select("a", "b", "dist", "n_a", "n_b")


ORACLES["part_name_fuzzy"] = """
WITH names AS (
  SELECT p_name AS name, CAST(count(*) AS BIGINT) AS n_parts
  FROM part GROUP BY p_name
)
SELECT a.name AS a, b.name AS b,
       CAST(levenshtein(a.name, b.name) AS INT) AS dist,
       a.n_parts AS n_a, b.n_parts AS n_b
FROM names a JOIN names b ON a.name < b.name
WHERE levenshtein(a.name, b.name) <= 2
"""
QUERIES["part_name_fuzzy"] = q_part_name_fuzzy


def q_event_props_k(spark, sf_dir):
    """Semi-structured extraction: parse the JSON `props` column
    (get_json_object path $.k) and profile k per event type — the
    JSON-column shape every event pipeline carries. All-integer
    outputs; the oracle uses DuckDB's independent JSON reader."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    k = F.get_json_object("props", "$.k").cast("bigint")
    return (
        ev.select("event_type", k.alias("k"))
        .filter(F.col("k").isNotNull())
        .groupBy("event_type")
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.min("k").alias("k_min"),
            F.max("k").alias("k_max"),
            F.sum("k").cast("bigint").alias("k_sum"),
            F.count_distinct(F.col("k")).cast("bigint").alias("k_distinct"),
        )
    )


ORACLES["event_props_k"] = """
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n,
       CAST(min(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS k_min,
       CAST(max(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS k_max,
       CAST(sum(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS k_sum,
       CAST(count(DISTINCT CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS k_distinct
FROM events
WHERE json_extract(props, '$.k') IS NOT NULL
GROUP BY event_type
"""
QUERIES["event_props_k"] = q_event_props_k
