"""Property tests for the prefix-filter exact Jaccard join and the
single-shuffle funnel — each checked against an independent brute
reference in plain Python (the DuckDB twins in dataset_queries are the
driver-side check; these pin the algorithms on adversarial inputs the
sf corpora don't contain: tiny sets, dead funnels, ts ties)."""

from __future__ import annotations

import datetime as dt
import itertools
import random

from pyspark.sql import functions as F

from ctinexus_spark.operators import dedup as D
from ctinexus_spark.operators.temporal import funnel


def _shingles(text: str, k: int = 3) -> set[str]:
    toks = text.split(" ")
    if len(toks) < k:
        return set()
    return {" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)}


def _brute_pairs(docs: list[tuple[str, str]], p: int, q: int):
    out = {}
    sets = {i: _shingles(t) for i, t in docs}
    for (a, sa), (b, sb) in itertools.combinations(sorted(sets.items()), 2):
        if not sa or not sb:
            continue
        inter = len(sa & sb)
        if (p + q) * inter >= p * (len(sa) + len(sb)):
            out[(a, b)] = (inter, len(sa), len(sb))
    return out


def test_jaccard_join_exact_matches_brute(spark):
    """Prefix filtering must lose NOTHING: the whole point of the
    operator is exactness. Random near-dup corpus: base docs plus
    mutated copies (drop/replace tokens) so thresholds straddle 1/2."""
    rng = random.Random(7)
    vocab = [f"w{i}" for i in range(60)]
    docs = []
    for i in range(30):
        base = [rng.choice(vocab) for _ in range(rng.randint(1, 40))]
        docs.append((f"d{i:03d}", " ".join(base)))
        if i % 2 == 0:  # a mutated near-copy
            mut = list(base)
            for _ in range(rng.randint(0, max(1, len(mut) // 6))):
                mut[rng.randrange(len(mut))] = rng.choice(vocab)
            docs.append((f"d{i:03d}x", " ".join(mut)))
    sdf = spark.createDataFrame(docs, ["doc_id", "text"])
    got = {
        (r.a_id, r.b_id): (r.n_shared, r.n_a, r.n_b)
        for r in D.jaccard_join_exact(sdf, threshold=(1, 2)).collect()
    }
    assert got == _brute_pairs(docs, 1, 2)


def test_jaccard_join_threshold_is_integer_exact(spark):
    """Boundary pairs: J exactly == p/q must be INCLUDED (>=), one
    shingle less must be excluded — no float wobble at the cut."""
    # doc pair sharing exactly half their union: |A|=3, |B|=3, I=2
    # J = 2/(3+3-2) = 0.5 exactly
    a = "x1 x2 x3 x4 x5"  # shingles: (x1..3)(x2..4)(x3..5) -> 3
    b = "x2 x3 x4 x5 x6"  # shares (x2..4)(x3..5); own (x4 x5 x6)
    sdf = spark.createDataFrame([("a", a), ("b", b)], ["doc_id", "text"])
    rows = D.jaccard_join_exact(sdf, threshold=(1, 2)).collect()
    assert len(rows) == 1 and rows[0].jaccard == 0.5
    rows = D.jaccard_join_exact(sdf, threshold=(51, 100)).collect()
    assert rows == []


def _ts(s: int):
    # tz-aware UTC so Python .timestamp() and Spark's session-UTC
    # micros agree exactly (naive datetimes would go through the
    # process-local zone on the Python side)
    return dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc) + dt.timedelta(seconds=s)


def test_funnel_dead_stays_dead_and_strict_order(spark):
    ev = spark.createDataFrame(
        [
            # u1 completes all three in order
            ("u1", "view", _ts(0)), ("u1", "click", _ts(10)), ("u1", "purchase", _ts(20)),
            # u2: purchase BEFORE click -> depth 2, purchase = -1
            ("u2", "view", _ts(0)), ("u2", "purchase", _ts(5)), ("u2", "click", _ts(10)),
            # u3: click at the SAME ts as view -> strict > excludes it
            ("u3", "view", _ts(0)), ("u3", "click", _ts(0)),
            # u4: never views -> filtered out entirely
            ("u4", "click", _ts(0)), ("u4", "purchase", _ts(1)),
            # u5: view only
            ("u5", "view", _ts(3)),
        ],
        ["user_id", "event_type", "ts"],
    )
    out = {r.user_id: r for r in funnel(ev, ["view", "click", "purchase"]).collect()}
    assert set(out) == {"u1", "u2", "u3", "u5"}
    assert out["u1"].depth == 3 and out["u1"].t2 > out["u1"].t1 > out["u1"].t0
    assert out["u2"].depth == 2 and out["u2"].t2 == -1
    assert out["u3"].depth == 1 and out["u3"].t1 == -1  # tie is NOT after
    assert out["u5"].depth == 1 and (out["u5"].t1, out["u5"].t2) == (-1, -1)


def test_funnel_matches_brute_reference(spark):
    """Randomized events vs a per-user Python fold."""
    rng = random.Random(11)
    steps = ["view", "click", "purchase"]
    rows = []
    for u in range(25):
        for _ in range(rng.randint(0, 15)):
            rows.append(
                (f"u{u}", rng.choice(steps + ["error", "signup"]), _ts(rng.randrange(3600)))
            )
    if not rows:
        rows = [("u0", "view", _ts(0))]
    ev = spark.createDataFrame(rows, ["user_id", "event_type", "ts"])
    got = {
        r.user_id: (r.t0, r.t1, r.t2, r.depth)
        for r in funnel(ev, steps).collect()
    }
    # brute: min ts per step strictly after the previous step's min
    want = {}
    byuser: dict[str, list[tuple[dt.datetime, str]]] = {}
    for u, t, ts in rows:
        byuser.setdefault(u, []).append((ts, t))
    for u, evs in byuser.items():
        prev = None  # None = funnel start; -1 = dead
        times = []
        for s in steps:
            if prev == -1:
                times.append(-1)
                continue
            cand = [ts for ts, t in evs if t == s and (prev is None or ts > prev)]
            if not cand:
                times.append(-1)
                prev = -1
            else:
                prev = min(cand)
                times.append(int(prev.timestamp() * 1_000_000))
        if times[0] != -1:
            depth = sum(1 for t in times if t != -1)
            want[u] = (*times, depth)
    assert got == want


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def test_edit_distance_join_matches_brute(spark):
    """The bigram-blocked join must find EVERY pair within the
    threshold (the q-gram count filter argument), including pairs
    differing at the first character (which naive prefix blocking
    would miss)."""
    import pytest

    from ctinexus_spark.operators.dedup import edit_distance_join

    rng = random.Random(43)
    base = ["red widget", "blue bolt", "green gear", "small ring", "metal plate"]
    names = set(base)
    for s in base:
        for _ in range(3):  # mutated variants incl. first-char edits
            t = list(s)
            op = rng.choice(["sub", "del", "ins"])
            pos = rng.randrange(len(t))
            if op == "sub":
                t[pos] = rng.choice("abcdefgh")
            elif op == "del" and len(t) > 7:
                del t[pos]
            else:
                t.insert(pos, rng.choice("abcdefgh"))
            names.add("".join(t))
    names = sorted(names)
    sdf = spark.createDataFrame([(n,) for n in names], ["name"])
    got = {
        (r.a, r.b): r.dist
        for r in edit_distance_join(sdf, threshold=2, id_col="name").collect()
    }
    want = {
        (a, b): _lev(a, b)
        for a, b in itertools.combinations(names, 2)
        if _lev(a, b) <= 2
    }
    assert got == want and want  # non-trivial fixture
    # exactness precondition enforced: strings too short must raise
    tiny = spark.createDataFrame([("abcd",), ("abce",)], ["name"])
    with pytest.raises(ValueError):
        edit_distance_join(tiny, threshold=2, id_col="name")
