"""Sketch-operator semantics: HLL accuracy + register mechanics,
Count-Min no-underestimate guarantee, Bloom no-false-negative
guarantee — properties the DuckDB hash parity (test_entry_contract)
can't express, checked against exact recomputation on the same data."""

import hashlib
import os
import sys

import pytest
from pyspark.sql import Row, functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ctinexus_spark import dataset_queries as dq
from ctinexus_spark.operators import sketches as K

SF = "/root/testdata/sf0.01"


def _values(spark, n, groups=1):
    rows = [
        Row(g=f"g{i % groups}", v=f"value-{i}") for i in range(n)
    ]
    return spark.createDataFrame(rows)


def test_hll_estimate_within_error_bound(spark):
    """m=1024 registers → relative error ~1.04/sqrt(m) ≈ 3.2%; assert
    a generous 4-sigma band on a 5000-distinct synthetic set."""
    df = _values(spark, 5000)
    out = K.hll_distinct(df, "g", "v", p=10).collect()
    assert len(out) == 1
    est = out[0]["hll_est"]
    assert abs(est - 5000) / 5000 < 0.13, est


def test_hll_insensitive_to_duplicates(spark):
    """HLL registers are maxima — feeding each value 3x must produce
    the identical sketch output (the whole point of the estimator)."""
    base = _values(spark, 800)
    dup = base.union(base).union(base)
    a = K.hll_distinct(base, "g", "v", p=10).collect()[0]
    b = K.hll_distinct(dup, "g", "v", p=10).collect()[0]
    assert a["hll_est"] == b["hll_est"]
    assert a["nonzero_registers"] == b["nonzero_registers"]


def test_hll_rho_matches_python(spark):
    """Register mechanics vs a direct python recomputation: bucket =
    top 10 hash bits, rho = leading-zero rank of the low 22."""
    df = _values(spark, 200)
    regs = (
        df.select(
            F.shiftright(K.hash32(F.col("v")), 22).alias("bucket"),
            F.col("v"),
        )
        .collect()
    )
    for r in regs:
        h = int(hashlib.md5(r["v"].encode()).hexdigest()[:8], 16)
        assert r["bucket"] == h >> 22


def test_cms_never_underestimates(spark):
    out = dq.q_cms_topk(spark, SF).collect()
    assert len(out) == 50
    assert all(r["cms_est"] >= r["exact_cnt"] for r in out)
    # the sf0.01 corpus repeats its hottest 3-token spans ~19% of
    # positions but spreads them thin: top exact count is single-digit
    top = max(out, key=lambda r: (r["exact_cnt"],))
    assert top["exact_cnt"] >= 5


def test_cms_estimate_exact_on_sparse_input(spark):
    """With far fewer values than cells (20 values into 4x2048), the
    min over 4 rows collides with nothing: estimate == exact."""
    df = _values(spark, 20)
    vals = df.union(df)  # counts of 2 each
    out = K.cms_heavy_hitters(vals, "v", depth=4, width=2048, k=20).collect()
    assert len(out) == 20
    assert all(r["cms_est"] == r["exact_cnt"] == 2 for r in out)


def test_bloom_no_false_negatives(spark):
    """Every true member MUST be flagged — Bloom's one hard
    guarantee. FPs are allowed but bounded at this sizing."""
    out = dq.q_bloom_probe(spark, SF).collect()
    flagged = {r["gram"] for r in out}
    members = {r["gram"] for r in out if r["is_member"]}
    deny = {
        r["v"]
        for r in dq._grams3_df(spark, SF, with_source=True)
        .filter(F.col("source") == "src0")
        .select("v")
        .distinct()
        .collect()
    }
    assert members == deny  # no false negatives, ground truth correct
    n_probe = dq._grams3_df(spark, SF).select("v").distinct().count()
    fp = len(flagged) - len(members)
    # fill ratio ~22% → expected FP rate ~1.1%; assert < 5%
    assert fp / (n_probe - len(deny)) < 0.05, fp


def test_sketch_sizes_are_bounded(spark):
    """The scale contract: sketch row counts depend on (p, depth,
    width), never on input size."""
    big = _values(spark, 4000)
    assert K.cms_sketch(big, "v", depth=4, width=64).count() <= 4 * 64
    assert (
        K.hll_distinct(big, "g", "v", p=6).collect()[0]["nonzero_registers"] <= 64
    )
    assert K.bloom_positions(big, "v", bits=128, hashes=3).count() <= 128


def test_bloom_probe_nondistinct_probe_side(spark):
    """A probe value occurring N times must still be flagged exactly
    once — the pre-distinct guards the count(*) == hashes containment
    test from multiplicity inflation."""
    deny = _values(spark, 30)
    probe = deny.union(deny).union(deny)  # every value three times
    out = K.bloom_probe(probe, deny, "v", bits=4096, hashes=3).collect()
    members = {r["v"] for r in out if r["is_member"]}
    assert members == {f"value-{i}" for i in range(30)}
    assert len(out) == len({r["v"] for r in out})  # one row per value


def test_kmv_exact_below_k(spark):
    """Fewer distinct values than k: the sketch IS the set — exact
    count, kth_hash sentinel −1."""
    vals = spark.createDataFrame(
        [("g", f"value-{i % 40}") for i in range(200)], "g string, v string"
    )
    out = K.kmv_distinct(vals, "g", "v", k=64).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.n_kept, r.kth_hash, r.kmv_est) == (40, -1, 40.0)


def test_kmv_matches_python_reference(spark):
    """k=8 over 100 distinct values: bottom-k set, kth hash, and the
    (k−1)·2³²/h_k estimate replicated with py_hash32 exactly."""
    vals = spark.createDataFrame(
        [("g", f"value-{i}") for i in range(100)], "g string, v string"
    )
    out = K.kmv_distinct(vals, "g", "v", k=8).collect()[0]
    hs = sorted(K.py_hash32(f"value-{i}") for i in range(100))[:8]
    assert out.n_kept == 8 and out.kth_hash == hs[7]
    assert out.kmv_est == float(7 * (1 << 32)) / float(hs[7])


def test_kmv_overlap_matches_python_reference(spark):
    """Two groups with a known 50-value intersection: merged bottom-k,
    intersection count, and the div-then-mul estimate chain replicated
    in Python bit-for-bit; Jaccard estimate lands near the true 1/3."""
    rows = [("a", f"common-{i}") for i in range(50)] + [
        ("a", f"left-{i}") for i in range(50)
    ] + [("b", f"common-{i}") for i in range(50)] + [
        ("b", f"right-{i}") for i in range(50)
    ]
    vals = spark.createDataFrame(rows, "g string, v string")
    k = 32
    out = K.kmv_overlap(vals, "g", "v", ga="a", gb="b", k=k).collect()[0]

    ah = sorted({K.py_hash32(f"common-{i}") for i in range(50)}
                | {K.py_hash32(f"left-{i}") for i in range(50)})[:k]
    bh = sorted({K.py_hash32(f"common-{i}") for i in range(50)}
                | {K.py_hash32(f"right-{i}") for i in range(50)})[:k]
    u = sorted(set(ah) | set(bh))[:k]
    c = len(set(u) & set(ah) & set(bh))
    kp = len(u)
    union_est = float((k - 1) * (1 << 32)) / float(u[k - 1]) if kp >= k else float(kp)
    jac = float(c) / float(kp)
    assert (out.inter_common, out.k_union) == (c, kp)
    assert out.jaccard_est == jac and out.union_est == union_est
    assert out.inter_est == jac * union_est
    # true Jaccard is 50/150; the estimate should be in the ballpark
    assert 0.1 < out.jaccard_est < 0.6
