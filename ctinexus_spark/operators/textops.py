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


# BPE-ish lexer: letter runs, digit runs, and single non-alnum marks —
# the pre-tokenization split every BPE vocabulary starts from. RE2-safe
# (no lookahead) so Spark's Java regex and DuckDB agree exactly.
BPE_SPLIT_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def bpe_token_estimate(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(id, n_ws_tokens, n_bpe_pieces, pieces_per_word) — a tokenizer-
    free estimate of model-token counts: whitespace words plus the
    BPE-style piece count from the pre-tokenization lexer. Real BPE
    merges only reduce the piece count within a word, so n_bpe_pieces
    upper-bounds (and at web scale tracks) the model's count."""
    toks = _tokens(text_col)
    pieces = F.size(F.regexp_extract_all(F.col(text_col), F.lit(BPE_SPLIT_PATTERN), 0))
    return docs.select(
        F.col(id_col),
        F.size(toks).cast("bigint").alias("n_ws_tokens"),
        pieces.cast("bigint").alias("n_bpe_pieces"),
        (pieces.cast("double") / F.size(toks).cast("double")).alias("pieces_per_word"),
    )


def winnowed_fingerprints(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    window: int = 4,
) -> DataFrame:
    """Winnowing (rolling-hash) document fingerprints: hash every
    k-token shingle in position order, keep the minimum hash of each
    sliding window of `window` consecutive shingles, emit the distinct
    selected hashes. Guarantees any shared run of ≥ window+k-1 tokens
    between two documents shares a fingerprint (the MOSS property) —
    the robust near-dup/plagiarism key md5-of-whole-doc cannot give.
    Pure JVM, and since optimization round 6 ZERO shuffles: the
    sliding-window minima are computed array-side per document
    (transform over positions + array_min over a slice — identical
    lexicographic min to the earlier min() OVER (ROWS BETWEEN) frame,
    including the truncated tail windows), and the per-document
    fingerprint dedup is an array_distinct, so neither the positional
    explode-window exchange+sort nor the final distinct exchange
    exists any more. Output rows are the identical (id, fingerprint)
    set."""
    toks = _tokens(text_col)
    shingles = F.when(
        F.size(toks) >= k,
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - k),
            lambda i: F.md5(F.array_join(F.slice(toks, i + 1, k), " ")),
        ),
    ).otherwise(F.array().cast("array<string>"))
    # bind the shingle array to a named column FIRST: referencing the
    # raw expression inside the transform lambda would re-evaluate the
    # md5 chain once per position (O(n²) hashing); an attribute
    # reference evaluates once per row
    with_sh = docs.select(F.col(id_col), shingles.alias("_sh"))
    sh = F.col("_sh")
    wmins = F.when(
        F.size(sh) > 0,
        F.transform(
            F.sequence(F.lit(0), F.size(sh) - 1),
            lambda j: F.array_min(F.slice(sh, j + 1, F.lit(window))),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return with_sh.select(
        F.col(id_col),
        F.explode(F.array_distinct(wmins)).alias("fingerprint"),
    )


# Gopher quality-rule constants (public: Rae et al. 2021, "Scaling
# Language Models" §A1.1 — the standard web-corpus document filters).
GOPHER_REQUIRED_STOPS = ["the", "be", "to", "of", "and", "that", "have", "with"]
GOPHER_MIN_WORDS = 50
GOPHER_MAX_WORDS = 100_000
GOPHER_MIN_MEAN_WORD_LEN = 3.0
GOPHER_MAX_MEAN_WORD_LEN = 10.0
GOPHER_MIN_ALPHA_FRAC = 0.8
GOPHER_MIN_STOP_HITS = 2
GOPHER_MAX_SYMBOL_RATIO = 0.1


def gopher_rules(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Gopher document-quality rules, fully JVM-side (codegen):
    word count bounds, mean word length bounds, fraction of words
    containing an alphabetic character, presence of ≥2 required
    English stopwords, #/ellipsis symbol ratio — plus the combined
    passes_gopher flag. Set/count expressions only (no float folds),
    so both engines agree bit-for-bit."""
    toks = _tokens(text_col)
    n = F.size(toks)
    nd = n.cast("double")
    tok_chars = (F.length(text_col) - (n - F.lit(1))).cast("double")
    mean_len = tok_chars / nd
    alpha = F.size(F.filter(toks, lambda w: w.rlike("[A-Za-z]"))).cast("double") / nd
    req = F.array(*[F.lit(w) for w in GOPHER_REQUIRED_STOPS])
    stop_hits = F.size(
        F.array_intersect(F.array_distinct(F.transform(toks, F.lower)), req)
    )
    symbols = (
        F.length(text_col)
        - F.length(F.regexp_replace(F.col(text_col), "[#…]", ""))
    ).cast("double")
    sym_ratio = symbols / nd
    passes = (
        (n >= GOPHER_MIN_WORDS)
        & (n <= GOPHER_MAX_WORDS)
        & (mean_len >= GOPHER_MIN_MEAN_WORD_LEN)
        & (mean_len <= GOPHER_MAX_MEAN_WORD_LEN)
        & (alpha >= GOPHER_MIN_ALPHA_FRAC)
        & (stop_hits >= GOPHER_MIN_STOP_HITS)
        & (sym_ratio <= GOPHER_MAX_SYMBOL_RATIO)
    )
    return docs.select(
        F.col(id_col),
        n.cast("bigint").alias("n_words"),
        mean_len.alias("mean_word_len"),
        alpha.alias("frac_words_alpha"),
        stop_hits.cast("bigint").alias("required_stop_hits"),
        sym_ratio.alias("symbol_ratio"),
        passes.alias("passes_gopher"),
    )


def repetition_ratios(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Gopher repetition filters: fraction of tokens taken by the most
    common word / most common bigram. Shaped as explode → two-level
    aggregation (map-side partial combine on (doc, gram), then a tiny
    per-doc rollup) — the scale form; an aggregate() HOF over
    array_distinct would be O(n·distinct) interpreted per row."""
    toks = _tokens(text_col)
    words = docs.select(F.col(id_col), F.explode(toks).alias("gram"))
    bigrams = docs.select(
        F.col(id_col),
        F.explode(
            F.when(
                F.size(toks) >= 2,
                F.transform(
                    F.sequence(F.lit(0), F.size(toks) - 2),
                    lambda i: F.concat_ws(" ", F.slice(toks, i + 1, 2)),
                ),
            ).otherwise(F.array().cast("array<string>"))
        ).alias("gram"),
    )

    def top_frac(grams: DataFrame, out: str) -> DataFrame:
        counts = grams.groupBy(id_col, "gram").agg(F.count("*").alias("c"))
        return counts.groupBy(id_col).agg(
            (F.max("c").cast("double") / F.sum("c").cast("double")).alias(out)
        )

    return top_frac(words, "top_word_frac").join(
        top_frac(bigrams, "top_bigram_frac"), id_col
    )


# PII scrub patterns — RE2-safe (no lookaround) so Spark's Java regex
# and DuckDB's RE2 agree exactly; ordered so earlier placeholders are
# not re-matched by later patterns.
PII_PATTERNS = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b(?:\d{1,3}\.){3}\d{1,3}\b", "<IP>"),
    ("phone", r"\+\d{1,3}[ -]\d{2,4}[ -]\d{3,4}[ -]\d{3,4}", "<PHONE>"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
]


def redact_pii(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(id, redacted_text, n_email, n_ipv4, n_phone, n_ssn) — the
    training-data PII scrub: global regexp replacement with typed
    placeholders plus per-pattern hit counts, all JVM-side codegen.
    Counts come from the pre-redaction text so overlapping patterns
    report what each one saw."""
    cols = [F.col(id_col)]
    redacted = F.col(text_col)
    for name, rx, placeholder in PII_PATTERNS:
        redacted = F.regexp_replace(redacted, rx, placeholder)
    cols.append(redacted.alias("redacted_text"))
    for name, rx, _ in PII_PATTERNS:
        cols.append(
            F.size(F.regexp_extract_all(F.col(text_col), F.lit(rx), 0))
            .cast("bigint")
            .alias(f"n_{name}")
        )
    return docs.select(*cols)


def bigram_lm_scores(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    train_docs: DataFrame | None = None,
) -> DataFrame:
    """CCNet-style corpus-LM likelihood scoring — the perplexity-
    filter shape: train an add-one-smoothed bigram model ON the corpus
    itself (two aggregations), then score every document by the mean
    conditional probability of its bigrams. Low mean_prob = text
    unlike the corpus (gibberish, boilerplate, wrong language) — the
    filter signal CCNet takes from a KenLM model, here self-trained
    and fully distributed (counts are groupBy aggregations; scoring is
    an equi-join on the bigram key).

    `train_docs` (default: docs itself) chooses the training corpus —
    pass a target subset to score p(doc | target LM) for DSIR-style
    importance weighting. Bigrams/words unseen in training score with
    zero counts under the same add-one smoothing (left joins), which
    is a no-op for self-training where every key exists.

    Output: (id, n_bigrams, mean_prob, log2_ppl) with
    p(w2|w1) = (c(w1,w2) + 1) / (c(w1) + V). mean_prob is the
    hash-checkable column: each p is one IEEE division of integers and
    the sum folds in document position order (the ordered-aggregate
    pattern), so DuckDB reproduces it bit-for-bit; log2_ppl
    (-mean log2 p, the conventional perplexity form) is informational
    only — libm vs JVM log differ in last-ulp."""
    toks = _tokens(text_col)
    n = F.size(toks)
    bigrams = docs.select(
        F.col(id_col),
        F.posexplode(
            F.when(
                n >= 2,
                F.transform(
                    F.sequence(F.lit(0), n - 2),
                    lambda i: F.struct(
                        F.element_at(toks, i + 1).alias("w1"),
                        F.element_at(toks, i + 2).alias("w2"),
                    ),
                ),
            ).otherwise(F.array().cast("array<struct<w1:string,w2:string>>"))
        ).alias("pos", "bg"),
    ).select(id_col, "pos", F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2"))

    train = train_docs if train_docs is not None else docs
    train_toks = F.split(F.col(text_col), " ")
    tn = F.size(train_toks)
    train_bigrams = train.select(
        F.explode(
            F.when(
                tn >= 2,
                F.transform(
                    F.sequence(F.lit(0), tn - 2),
                    lambda i: F.struct(
                        F.element_at(train_toks, i + 1).alias("w1"),
                        F.element_at(train_toks, i + 2).alias("w2"),
                    ),
                ),
            ).otherwise(F.array().cast("array<struct<w1:string,w2:string>>"))
        ).alias("bg")
    ).select(F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2"))

    words = train.select(F.explode(train_toks).alias("w"))
    c1 = words.groupBy(F.col("w").alias("w1")).agg(F.count("*").alias("c1"))
    vocab = words.select("w").distinct().count()
    c2 = train_bigrams.groupBy("w1", "w2").agg(F.count("*").alias("c2"))

    scored = (
        bigrams.join(c2, ["w1", "w2"], "left").join(c1, "w1", "left")
        .withColumn(
            "p",
            (F.coalesce(F.col("c2"), F.lit(0)) + F.lit(1)).cast("double")
            / (F.coalesce(F.col("c1"), F.lit(0)) + F.lit(int(vocab))).cast("double"),
        )
    )
    agg = scored.groupBy(id_col).agg(
        F.count("*").cast("bigint").alias("n_bigrams"),
        # position-ordered left fold == DuckDB list_sum(list(ORDER BY))
        F.aggregate(
            F.array_sort(F.collect_list(F.struct("pos", "p"))),
            F.lit(0.0),
            lambda acc, x: acc + x["p"],
        ).alias("_sum_p"),
        F.aggregate(
            F.array_sort(F.collect_list(F.struct("pos", "p"))),
            F.lit(0.0),
            lambda acc, x: acc - F.log2(x["p"]),
        ).alias("_sum_nlog"),
    )
    return agg.select(
        F.col(id_col),
        "n_bigrams",
        (F.col("_sum_p") / F.col("n_bigrams")).alias("mean_prob"),
        (F.col("_sum_nlog") / F.col("n_bigrams")).alias("log2_ppl"),
    )


def dsir_features(
    docs: DataFrame,
    target: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, n_bigrams, mean_p_target, mean_p_corpus, log_weight) —
    DSIR-shaped importance features for data selection: every document
    scored under a bigram LM trained on the TARGET subset and one
    trained on the full corpus. Documents whose target-LM likelihood
    exceeds their corpus-LM likelihood are the ones importance
    resampling upweights (Xie et al., DSIR — there with hashed n-gram
    features; same two-model likelihood-ratio shape).

    mean_p_* are engine-exact (integer-count divisions folded in
    position order); log_weight = n · (ln mean_p_target − ln
    mean_p_corpus) is the convenient ranking form but informational
    only (libm vs JVM log differ in last ulp) — keep it out of
    hash-checked oracle projections.

    Scale shape: two count-table aggregations (map-side combined) +
    per-bigram left equi-joins; nothing quadratic, no driver loops."""
    t = bigram_lm_scores(docs, id_col, text_col, train_docs=target).select(
        id_col, "n_bigrams", F.col("mean_prob").alias("mean_p_target")
    )
    c = bigram_lm_scores(docs, id_col, text_col).select(
        id_col, F.col("mean_prob").alias("mean_p_corpus")
    )
    return t.join(c, id_col).select(
        id_col,
        "n_bigrams",
        "mean_p_target",
        "mean_p_corpus",
        (
            F.col("n_bigrams").cast("double")
            * (F.log(F.col("mean_p_target")) - F.log(F.col("mean_p_corpus")))
        ).alias("log_weight"),
    )


def vocab_topk(docs: DataFrame, k: int = 500, text_col: str = "text") -> DataFrame:
    """(token, freq, rank) — corpus token-frequency vocabulary, the
    first step of tokenizer induction (BPE/WordPiece start from exactly
    this table). Ties break on the token string so the ranking is
    total and engine-portable.

    Scale shape: explode → partial-aggregated groupBy (map-side
    combine) → global top-k via orderBy+limit, which Spark plans as
    TakeOrderedAndProject (per-partition heaps merged on the driver —
    no single-task global sort). The row_number window runs AFTER the
    limit, over k rows only."""
    from pyspark.sql import Window

    freq = (
        docs.select(F.explode(_tokens(text_col)).alias("token"))
        .groupBy("token")
        .agg(F.count("*").cast("bigint").alias("freq"))
        .orderBy(F.col("freq").desc(), F.col("token"))
        .limit(k)
    )
    w = Window.orderBy(F.col("freq").desc(), F.col("token"))
    return freq.withColumn("rank", F.row_number().over(w).cast("int"))


def bpe_merge_pairs(docs: DataFrame, k: int = 200, text_col: str = "text") -> DataFrame:
    """(left, right, freq, rank) — the BPE merge-candidate table: the
    corpus's most frequent ADJACENT pre-tokenization piece pairs (the
    count a BPE trainer maximizes at every merge step; the top row is
    the next merge). Pieces come from the same RE2-safe lexer as
    bpe_token_estimate, so one vocabulary story covers counting and
    merge induction. Ties break on (left, right) strings — total,
    engine-portable order.

    Scale shape: regexp pieces per doc (JVM) → adjacent-pair explode →
    partial-aggregated groupBy → TakeOrderedAndProject top-k (the
    vocab_topk plan); the rank window runs after the limit, over k
    rows only."""
    from pyspark.sql import Window

    from ctinexus_spark.partitioning import ensure_parallelism

    docs = ensure_parallelism(docs)  # single-split scans: spread the explode
    pieces = F.regexp_extract_all(F.col(text_col), F.lit(BPE_SPLIT_PATTERN), 0)
    n = F.size(pieces)
    pairs = docs.select(
        F.explode(
            F.when(
                n >= 2,
                F.transform(
                    F.sequence(F.lit(0), n - 2),
                    lambda i: F.struct(
                        F.element_at(pieces, i + 1).alias("left"),
                        F.element_at(pieces, i + 2).alias("right"),
                    ),
                ),
            ).otherwise(F.array().cast("array<struct<left:string,right:string>>"))
        ).alias("p")
    ).select(F.col("p.left").alias("left"), F.col("p.right").alias("right"))
    freq = (
        pairs.groupBy("left", "right")
        .agg(F.count("*").cast("bigint").alias("freq"))
        .orderBy(F.col("freq").desc(), "left", "right")
        .limit(k)
    )
    w = Window.orderBy(F.col("freq").desc(), "left", "right")
    return freq.withColumn("rank", F.row_number().over(w).cast("int"))


def token_pmi(
    docs: DataFrame,
    min_count: int = 5,
    k: int = 200,
    text_col: str = "text",
) -> DataFrame:
    """(left, right, n_pair, n_left, n_right, pmi_ratio, rank) — the
    collocation table: adjacent whitespace-token pairs ranked by the
    pointwise-mutual-information ratio p(a,b)/(p(a)p(b)) =
    (n_pair·N·N)/(P·n_a·n_b) with N = corpus tokens, P = corpus
    adjacent pairs. The standard phrase-mining signal (word2vec-style
    phrase joining, multi-word-entity induction). min_count drops the
    unstable low-frequency tail BEFORE ranking.

    The ratio is emitted instead of log-PMI: it is one fixed-order
    chain of IEEE multiplies/divides of integer-valued doubles, so
    both engines agree bit-for-bit (libm vs JVM log differ in the last
    ulp — the lm_scores precedent). Monotone in PMI, so the ranking is
    the PMI ranking.

    Scale shape: pair/unigram counts are partial-aggregated groupBys;
    the two scalar totals stay LAZY (a broadcast one-row aggregate
    crossJoin — the pagerank dangling-mass pattern), so one job covers
    the whole query instead of two eager full-corpus counts per call;
    unigram attachment is two equi-joins on the token key; top-k is
    TakeOrderedAndProject. No windows over row-level data."""
    from pyspark.sql import Window

    from ctinexus_spark.partitioning import barrier, ensure_parallelism

    docs = ensure_parallelism(docs)  # single-split scans: spread the explode
    toks = _tokens(text_col)
    n = F.size(toks)
    pairs = docs.select(
        F.explode(
            F.when(
                n >= 2,
                F.transform(
                    F.sequence(F.lit(0), n - 2),
                    lambda i: F.struct(
                        F.element_at(toks, i + 1).alias("left"),
                        F.element_at(toks, i + 2).alias("right"),
                    ),
                ),
            ).otherwise(F.array().cast("array<struct<left:string,right:string>>"))
        ).alias("p")
    ).select(F.col("p.left").alias("left"), F.col("p.right").alias("right"))
    # pairs feeds three consumers (counts + the two totals) — barrier
    # once so the explode runs a single time
    pairs = barrier(pairs)
    words = docs.select(F.explode(toks).alias("w"))
    uni = barrier(words.groupBy("w").agg(F.count("*").cast("bigint").alias("n_w")))
    pc = pairs.groupBy("left", "right").agg(F.count("*").cast("bigint").alias("n_pair"))

    # one-row totals attach via crossJoin(broadcast(...)) — this plans
    # as BroadcastNestedLoopJoin, which is the OPTIMAL shape against a
    # keyless-aggregate (guaranteed single row) build side; the
    # no-quadratic plan pin special-cases exactly that
    totals = (
        uni.agg(F.sum("n_w").cast("double").alias("_n_tokens"))
        .crossJoin(pairs.agg(F.count("*").cast("double").alias("_n_pairs")))
    )

    joined = (
        pc.filter(F.col("n_pair") >= min_count)
        .join(uni.select(F.col("w").alias("left"), F.col("n_w").alias("n_left")), "left")
        .join(uni.select(F.col("w").alias("right"), F.col("n_w").alias("n_right")), "right")
        .crossJoin(F.broadcast(totals))
    )
    # fixed-order chain, mirrored exactly in the SQL oracle
    ratio = (
        F.col("n_pair").cast("double")
        * F.col("_n_tokens")
        * F.col("_n_tokens")
        / (
            F.col("_n_pairs")
            * F.col("n_left").cast("double")
            * F.col("n_right").cast("double")
        )
    )
    top = (
        joined.withColumn("pmi_ratio", ratio)
        .orderBy(F.col("pmi_ratio").desc(), "left", "right")
        .limit(k)
        .drop("_n_tokens", "_n_pairs")
    )
    w = Window.orderBy(F.col("pmi_ratio").desc(), "left", "right")
    return top.select(
        "left", "right", "n_pair", "n_left", "n_right", "pmi_ratio",
        F.row_number().over(w).cast("int").alias("rank"),
    )


def langid_trigram(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    lang_col: str = "lang",
    profile_size: int = 100,
) -> DataFrame:
    """(id, pred_lang, n_hits) — TextCat-style character-trigram
    language identification, SELF-TRAINED: per-language top-K trigram
    profiles are built from the corpus's own labeled rows (two
    aggregations), then every document is scored by how many of its
    distinct trigrams appear in each language's profile; the language
    with the most hits wins (ties to the lexicographically smaller
    language; no hits → 'und'). The same shape as a production
    fastText/CLD lang-id pass: a broadcast profile table probed by one
    scan of the corpus.

    All counts are integers and the argmax is a lexicographic
    struct-min, so both engines agree exactly. Profiles are bounded
    (languages × profile_size rows) and broadcast; the per-language
    rank window runs over the bounded trigram vocabulary, never over
    corpus rows."""
    from pyspark.sql import Window

    from ctinexus_spark.partitioning import ensure_parallelism

    docs = ensure_parallelism(docs)  # single-split scans: spread the explode
    tris = F.when(
        F.length(text_col) >= 3,
        F.transform(
            F.sequence(F.lit(1), F.length(text_col) - 2),
            lambda i: F.col(text_col).substr(i, F.lit(3)),
        ),
    ).otherwise(F.array().cast("array<string>"))

    train = docs.select(F.col(lang_col).alias("_lang"), F.explode(tris).alias("_tri"))
    counts = train.groupBy("_lang", "_tri").agg(F.count("*").alias("_c"))
    wr = Window.partitionBy("_lang").orderBy(F.col("_c").desc(), "_tri")
    profiles = (
        counts.withColumn("_r", F.row_number().over(wr))
        .filter(F.col("_r") <= profile_size)
        .select("_lang", "_tri")
    )

    doc_tris = docs.select(F.col(id_col), F.explode(F.array_distinct(tris)).alias("_tri"))
    hits = (
        doc_tris.join(F.broadcast(profiles), "_tri")
        .groupBy(id_col, "_lang")
        .agg(F.count("*").cast("bigint").alias("_hits"))
    )
    best = hits.groupBy(id_col).agg(
        F.min(F.struct((-F.col("_hits")).alias("n"), F.col("_lang").alias("l"))).alias("_w")
    )
    return (
        docs.select(id_col)
        .join(best, id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("_w.l"), F.lit("und")).alias("pred_lang"),
            F.coalesce(-F.col("_w.n"), F.lit(0)).cast("bigint").alias("n_hits"),
        )
    )


def profile_columns(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """(column, n_nulls, n_distinct, min_value, max_value) — one row
    per profiled column, computed in a SINGLE pass over the table (all
    per-column aggregates share one scan; the long format comes from
    exploding the one aggregated row). The dbt/Deequ-style data-quality
    profile a pipeline health check runs before processing a drop.

    min/max are over the column's STRING form (lexicographic), so the
    semantics are type-uniform and engine-portable; numeric min/max
    belong in a typed query."""
    cols = columns or df.columns
    aggs = []
    for c in cols:
        aggs += [
            F.sum(F.col(c).isNull().cast("bigint")).alias(f"__nn_{c}"),
            F.count_distinct(F.col(c)).cast("bigint").alias(f"__nd_{c}"),
            F.min(F.col(c).cast("string")).alias(f"__mn_{c}"),
            F.max(F.col(c).cast("string")).alias(f"__mx_{c}"),
        ]
    one = df.agg(*aggs)
    rows = F.array(
        *[
            F.struct(
                F.lit(c).alias("column"),
                F.coalesce(F.col(f"__nn_{c}"), F.lit(0)).cast("bigint").alias("n_nulls"),
                F.col(f"__nd_{c}").alias("n_distinct"),
                F.col(f"__mn_{c}").alias("min_value"),
                F.col(f"__mx_{c}").alias("max_value"),
            )
            for c in cols
        ]
    )
    return one.select(F.explode(rows).alias("r")).select(
        "r.column", "r.n_nulls", "r.n_distinct", "r.min_value", "r.max_value"
    )


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
