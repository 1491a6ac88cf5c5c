"""BM25 retrieval + exact-quantile semantics: scoring pinned against
a direct numpy/python recomputation, ranking invariance between the
rational- and log-idf variants, and the quantile definition checked
against its own spec — properties the DuckDB hash parity
(test_entry_contract) can't express."""

import math
import os
import sys

import pytest
from pyspark.sql import Row, functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ctinexus_spark import dataset_queries as dq
from ctinexus_spark.operators import retrieval as R
from ctinexus_spark.operators import stats as ST

SF = "/root/testdata/sf0.01"


# --- BM25 ---------------------------------------------------------------

DOCS = [
    ("d1", "spark join window join spark"),
    ("d2", "spark scan filter merge sort hash"),
    ("d3", "join join join window window scan"),
    ("d4", "hash merge sort"),
]
QUERY = [("qa", "join"), ("qa", "window"), ("qb", "hash")]


def _py_bm25(idf_variant: str):
    """Reference recomputation with unigram terms, k1=1.2, b=0.75."""
    k1, b = 1.2, 0.75
    toks = {d: t.split(" ") for d, t in DOCS}
    dl = {d: len(t) for d, t in toks.items()}
    n = len(toks)
    avgdl = sum(dl.values()) / n
    out = {}
    for qid, term in QUERY:
        df = sum(1 for t in toks.values() if term in t)
        if df == 0:
            continue
        idf = (n - df + 0.5) / (df + 0.5)
        if idf_variant == "robertson":
            idf = math.log(idf)
        for d, t in toks.items():
            tf = t.count(term)
            if tf == 0:
                continue
            c = idf * (tf * (k1 + 1.0)) / (
                tf + k1 * ((1.0 - b) + b * (dl[d] / avgdl))
            )
            out[(qid, d)] = out.get((qid, d), 0.0) + c
    return out


@pytest.mark.parametrize("variant", ["rational", "robertson"])
def test_bm25_matches_python(spark, variant):
    docs = spark.createDataFrame(DOCS, ["doc_id", "text"])
    terms = R.ngram_terms(docs, n=1)
    q = spark.createDataFrame(QUERY, ["query_id", "term"])
    got = {
        (r["query_id"], r["doc_id"]): r["score"]
        for r in R.bm25_topk(terms, q, k=10, idf=variant).collect()
    }
    want = _py_bm25(variant)
    assert set(got) == set(want)
    for key, s in want.items():
        assert got[key] == pytest.approx(s, abs=1e-9), key


def test_bm25_rank_ties_break_on_doc_id(spark):
    """Two identical docs must score identically and rank by doc_id."""
    docs = spark.createDataFrame(
        [("a", "join window"), ("b", "join window"), ("c", "scan")],
        ["doc_id", "text"],
    )
    q = spark.createDataFrame([("q", "join")], ["query_id", "term"])
    out = R.bm25_topk(R.ngram_terms(docs, n=1), q, k=10).collect()
    by_doc = {r["doc_id"]: r for r in out}
    assert by_doc["a"]["score"] == by_doc["b"]["score"]
    assert by_doc["a"]["rank"] == 1 and by_doc["b"]["rank"] == 2


def test_bm25_rational_preserves_log_ranking(spark):
    """For SINGLE-term queries the score is idf(t) * w(doc) with
    idf(t) a positive per-query constant under either variant (df <<
    N/2 on this corpus, so log-idf > 0 too) — rankings are therefore
    guaranteed identical between rational and Robertson idf. Run the
    15 corpus-derived band grams as 15 single-term queries and assert
    exact rank agreement. (Multi-term rankings agree only up to the
    monotone-per-term transform — NOT asserted, by design.)"""
    from ctinexus_spark.partitioning import barrier, ensure_parallelism

    docs = ensure_parallelism(
        spark.read.parquet(f"{SF}/documents.parquet")
    )
    dt = R.ngram_terms(docs, n=3)
    qt = barrier(
        dq._bm25_query_terms(dt).select(
            F.col("term").alias("query_id"), "term"
        )
    )
    a = R.bm25_topk(dt, qt, k=10, idf="rational").collect()
    b = R.bm25_topk(dt, qt, k=10, idf="robertson").collect()
    key = lambda rows: {
        (r["query_id"], r["doc_id"]): r["rank"] for r in rows
    }
    assert len(a) > 0 and key(a) == key(b)


def test_bm25_registry_query_shape(spark):
    out = dq.q_bm25_topk(spark, SF).collect()
    assert len(out) > 0
    qids = {r["query_id"] for r in out}
    assert qids == {"q_hot", "q_mid", "q_tail"}
    for qid in qids:
        ranks = sorted(r["rank"] for r in out if r["query_id"] == qid)
        assert ranks == list(range(1, len(ranks) + 1))
        assert len(ranks) <= 10
    assert all(r["score"] > 0 for r in out)


# --- exact quantiles ----------------------------------------------------


def test_quantiles_match_spec(spark):
    """Smallest value whose cumulative count >= ceil(q*N), on a
    multiset with duplicates."""
    vals = [1, 1, 2, 3, 3, 3, 7, 10, 10, 100]
    df = spark.createDataFrame([Row(v=x) for x in vals])
    out = {
        r["q"]: (r["value"], r["n_le"], r["n_total"])
        for r in ST.exact_quantiles(df, "v", qs=(0.1, 0.5, 0.9, 1.0)).collect()
    }
    svals = sorted(vals)

    def spec(q):
        need = math.ceil(q * len(svals))
        return svals[max(need, 1) - 1]

    for q in (0.1, 0.5, 0.9, 1.0):
        assert out[q][0] == spec(q), q
        assert out[q][2] == len(vals)


def test_quantiles_constant_column(spark):
    df = spark.range(57).select(F.lit(42).alias("v"))
    out = ST.exact_quantiles(df, "v", qs=(0.25, 0.99)).collect()
    assert {r["value"] for r in out} == {42}
    assert all(r["n_total"] == 57 for r in out)


def test_quantiles_exclude_nulls(spark):
    df = spark.createDataFrame(
        [Row(v=1), Row(v=None), Row(v=3), Row(v=None)]
    )
    out = {r["q"]: r for r in ST.exact_quantiles(df, "v", qs=(0.5, 1.0)).collect()}
    assert out[1.0]["value"] == 3
    assert out[1.0]["n_total"] == 2


# --- cluster topic terms ------------------------------------------------


def test_cluster_topics_match_python(spark):
    """Lift-ratio top-k vs a direct python recomputation on a tiny
    two-cluster corpus with a shared background term."""
    assign = spark.createDataFrame(
        [(1, 0), (2, 0), (3, 1), (4, 1)], ["vec_id", "cell"]
    )
    occurrences = (
        [(1, "bg")] * 3 + [(1, "aaa")] * 2
        + [(2, "bg")] * 3 + [(2, "aaa")] * 2
        + [(3, "bg")] * 3 + [(3, "zzz")] * 4
        + [(4, "bg")] * 3
    )
    terms = spark.createDataFrame(occurrences, ["doc_id", "term"])
    out = ST.cluster_topic_terms(assign, terms, min_count=2, k=5).collect()
    got = {(r["cell"], r["gram"]): (r["n"], r["ratio"], r["rank"]) for r in out}

    cnt = {}
    for d, t in occurrences:
        c = 0 if d <= 2 else 1
        cnt[(c, t)] = cnt.get((c, t), 0) + 1
    grand = float(len(occurrences))
    ctot = {c: sum(n for (cc, _), n in cnt.items() if cc == c) for c in (0, 1)}
    ttot = {}
    for (_, t), n in cnt.items():
        ttot[t] = ttot.get(t, 0) + n
    want = {
        (c, t): (n * grand) / (float(ctot[c]) * float(ttot[t]))
        for (c, t), n in cnt.items()
        if n >= 2
    }
    assert set(got) == set(want)
    for key, ratio in want.items():
        assert got[key][1] == pytest.approx(ratio, abs=1e-12), key
    # the cluster-exclusive term outranks the shared background term
    assert got[(1, "zzz")][2] < got[(1, "bg")][2]
    assert got[(0, "aaa")][2] < got[(0, "bg")][2]
    # n_docs reflects assignment sizes
    assert all(r["n_docs"] == 2 for r in out)


def test_cluster_topics_registry_shape(spark):
    rows = dq.q_cluster_topics(spark, SF).collect()
    by_cell = {}
    for r in rows:
        by_cell.setdefault(r["cell"], []).append(r)
    assert len(by_cell) == 16  # every IVF cell labeled at min_count=2
    for cell, rs in by_cell.items():
        ranks = sorted(r["rank"] for r in rs)
        assert ranks == list(range(1, len(rs) + 1)) and len(rs) <= 5
        assert all(r["n"] >= 2 for r in rs)
    assert sum(r["n_docs"] for r in rows if r["rank"] == 1) == 500


def test_quantiles_registry_monotone(spark):
    rows = sorted(
        dq.q_doc_len_quantiles(spark, SF).collect(), key=lambda r: r["q"]
    )
    assert len(rows) == 6
    values = [r["value"] for r in rows]
    assert values == sorted(values)
    assert rows[-1]["q"] == 0.99
    # corpus docs are 10-99 tokens
    assert 10 <= values[0] <= values[-1] <= 99


# --- MMR diversified re-rank -------------------------------------------


def _mmr_emb(spark):
    rows = [
        (1, [0.9, 0.10, 0.0]),   # most relevant
        (2, [0.9, 0.11, 0.0]),   # near-duplicate of 1
        (3, [0.5, 0.00, 0.5]),   # less relevant, diverse
        (100, [1.0, 0.0, 0.0]),  # the query
    ]
    return spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")


def test_mmr_demotes_near_duplicate(spark):
    """Plain cosine ranks the near-copy second; MMR at λ=0.5 picks the
    diverse vector instead (its marginal score beats the duplicate's
    rel − sim-to-picked penalty)."""
    from ctinexus_spark.operators.similarity import mmr_rerank

    emb = _mmr_emb(spark)
    out = mmr_rerank(
        emb, emb.filter(F.col("vec_id") == 100), k=2, lam=0.5, candidates=3
    ).collect()
    picks = {r.pick_rank: r for r in out}
    assert [picks[1].neighbor_id, picks[2].neighbor_id] == [1, 3]
    # rank-1 score is exactly λ·rel (maxsim term is a literal 0.0)
    import math

    rel1 = (0.9 * 1.0 + 0.10 * 0.0 + 0.0 * 0.0) / (
        math.sqrt(0.9**2 + 0.10**2) * 1.0
    )
    assert picks[1].mmr_score == 0.5 * rel1 - 0.5 * 0.0


def test_mmr_fewer_candidates_than_k(spark):
    """k beyond the candidate pool returns the whole pool, ranked —
    no nulls, no crash."""
    from ctinexus_spark.operators.similarity import mmr_rerank

    emb = _mmr_emb(spark)
    out = mmr_rerank(
        emb, emb.filter(F.col("vec_id") == 100), k=5, lam=0.7, candidates=3
    ).collect()
    assert sorted(r.pick_rank for r in out) == [1, 2, 3]
    assert {r.neighbor_id for r in out} == {1, 2, 3}


def test_mmr_lambda_one_is_plain_topk(spark):
    """λ=1 removes the diversity term: picks must equal the cosine
    ranking (near-duplicate kept at rank 2)."""
    from ctinexus_spark.operators.similarity import mmr_rerank

    emb = _mmr_emb(spark)
    out = mmr_rerank(
        emb, emb.filter(F.col("vec_id") == 100), k=3, lam=1.0, candidates=3
    ).collect()
    order = [r.neighbor_id for r in sorted(out, key=lambda r: r.pick_rank)]
    assert order == [1, 2, 3]


# --- distribution drift (total variation) ------------------------------


def test_distribution_drift_hand_computed(spark):
    """A: {x,x,y}, B: {y,z} over corpus {x:2,y:2,z:1} → TV(A)=4/15,
    TV(B)=2/5 (hand-derived incl. the absent-term mass); checks the
    algebraic fold of out-of-group vocabulary."""
    from fractions import Fraction

    from ctinexus_spark.operators.stats import distribution_drift

    toks = spark.createDataFrame(
        [("A", "x"), ("A", "x"), ("A", "y"), ("B", "y"), ("B", "z")],
        "group string, token string",
    )
    got = {r.group: r for r in distribution_drift(toks).collect()}
    assert got["A"].n_tokens == 3 and got["B"].n_tokens == 2
    assert got["A"].tv_dist == float(Fraction(4, 15))
    assert got["B"].tv_dist == float(Fraction(2, 5))


def test_distribution_drift_identical_group_is_zero(spark):
    """A group that IS the whole corpus has zero distance."""
    from ctinexus_spark.operators.stats import distribution_drift

    toks = spark.createDataFrame(
        [("A", t) for t in ["x", "y", "z", "x"]], "group string, token string"
    )
    rows = distribution_drift(toks).collect()
    assert len(rows) == 1 and rows[0].tv_dist == 0.0


def test_mmr_matches_numpy_greedy_random(spark):
    """40 random unit vectors, 3 queries: the unrolled DataFrame
    rounds must reproduce a straight numpy greedy MMR (argmax with
    (score, -id) preference) pick for pick."""
    import numpy as np

    from ctinexus_spark.operators.similarity import mmr_rerank

    rng = np.random.default_rng(7)
    vecs = rng.normal(size=(40, 16))
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    rows = [(i, [float(x) for x in vecs[i]]) for i in range(40)]
    emb = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    lam, k, cand_n = 0.6, 4, 10

    out = mmr_rerank(
        emb, emb.filter(F.col("vec_id") < 3), k=k, lam=lam, candidates=cand_n
    ).collect()
    got = {}
    for r in out:
        got.setdefault(r.query_id, {})[r.pick_rank] = r.neighbor_id

    sims = vecs @ vecs.T
    for q in range(3):
        rel = {c: sims[q, c] for c in range(40) if c != q}
        cand = sorted(rel, key=lambda c: (-rel[c], c))[:cand_n]
        picked = []
        for _ in range(k):
            rem = [c for c in cand if c not in picked]
            scores = {
                c: lam * rel[c]
                - (1 - lam) * (max(sims[c, s] for s in picked) if picked else 0.0)
                for c in rem
            }
            best = min(rem, key=lambda c: (-scores[c], c))
            picked.append(best)
        assert [got[q][r] for r in range(1, k + 1)] == picked, (q, got[q], picked)
