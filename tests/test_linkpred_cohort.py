"""Property tests: link_prediction vs a brute adjacency-set reference
(including the max_degree hub cap) and cohort_retention vs a Python
fold — adversarial shapes the sf corpora don't contain."""

from __future__ import annotations

import datetime as dt
import itertools
import random

from ctinexus_spark.graph.analytics import link_prediction
from ctinexus_spark.operators.temporal import cohort_retention


def _brute_lp(edges, min_common, max_degree=None):
    adj: dict[int, set[int]] = {}
    for u, v in edges:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    out = {}
    for a, b in itertools.combinations(sorted(adj), 2):
        if b in adj[a]:
            continue
        common = adj[a] & adj[b]
        if max_degree is not None:
            common = {c for c in common if len(adj[c]) <= max_degree}
        if len(common) >= min_common:
            out[(a, b)] = (len(common), len(adj[a]), len(adj[b]))
    return out


def _rand_edges(rng, n, m):
    es = set()
    while len(es) < m:
        u, v = rng.randrange(n), rng.randrange(n)
        if u != v:
            es.add((min(u, v), max(u, v)))
    return sorted(es)


def test_link_prediction_matches_brute(spark):
    rng = random.Random(3)
    edges = _rand_edges(rng, 40, 140)
    sdf = spark.createDataFrame(edges, ["src", "dst"])
    got = {
        (r.a, r.b): (r.n_common, r.deg_a, r.deg_b)
        for r in link_prediction(sdf, min_common=2).collect()
    }
    assert got == _brute_lp(edges, 2)
    # every returned pair must be non-adjacent
    eset = set(edges)
    assert all(p not in eset for p in got)


def test_link_prediction_hub_cap(spark):
    """A super-hub center contributes no wedges under max_degree, but
    true degrees still feed jaccard."""
    rng = random.Random(9)
    edges = _rand_edges(rng, 30, 70)
    hub = 99
    edges = sorted(set(edges) | {(i, hub) for i in range(30)})
    sdf = spark.createDataFrame(edges, ["src", "dst"])
    got = {
        (r.a, r.b): (r.n_common, r.deg_a, r.deg_b)
        for r in link_prediction(sdf, min_common=1, max_degree=10).collect()
    }
    assert got == _brute_lp(edges, 1, max_degree=10)
    # the hub connects everyone: without the cap every non-edge pair
    # would have n_common >= 1 via the hub; with it, some pairs vanish
    assert len(got) < len(_brute_lp(edges, 1))


def test_cohort_retention_matches_brute(spark):
    rng = random.Random(5)
    base = dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc)
    rows = []
    for u in range(40):
        for _ in range(rng.randint(1, 12)):
            rows.append((f"u{u}", base + dt.timedelta(hours=rng.randrange(24 * 70))))
    ev = spark.createDataFrame(rows, ["user_id", "ts"])
    got = {
        (r.cohort_bucket, r.bucket_offset): (r.n_active, r.cohort_size)
        for r in cohort_retention(ev).collect()
    }
    wk = 604_800 * 1_000_000
    buckets: dict[str, set[int]] = {}
    for u, ts in rows:
        buckets.setdefault(u, set()).add(int(ts.timestamp() * 1_000_000) // wk)
    first = {u: min(bks) for u, bks in buckets.items()}
    sizes: dict[int, int] = {}
    for u, f in first.items():
        sizes[f] = sizes.get(f, 0) + 1
    want: dict[tuple[int, int], list[int]] = {}
    for u, bks in buckets.items():
        for b in bks:
            key = (first[u], b - first[u])
            want.setdefault(key, [0, 0])[0] += 1
    want2 = {k: (v[0], sizes[k[0]]) for k, v in want.items()}
    assert got == want2
    # offset 0 is always full retention
    assert all(
        got[(c, o)][0] == got[(c, o)][1] for (c, o) in got if o == 0
    )


def test_sssp_matches_brute_bellman_ford(spark):
    import pytest

    from ctinexus_spark.graph.analytics import sssp

    rng = random.Random(13)
    edges = [(u, v, rng.randint(1, 9)) for u, v in _rand_edges(rng, 25, 60)]
    sdf = spark.createDataFrame(edges, ["src", "dst", "weight"])
    for hops in (1, 3):
        got = {r.v: r.dist for r in sssp(sdf, seeds=[0, 7], max_hops=hops).collect()}
        # brute: hop-bounded Bellman-Ford rounds
        dist = {0: 0, 7: 0}
        for _ in range(hops):
            nxt = dict(dist)
            for u, v, w in edges:
                for a, b in ((u, v), (v, u)):
                    if a in dist and dist[a] + w < nxt.get(b, 1 << 60):
                        nxt[b] = dist[a] + w
            dist = nxt
        assert got == dist
    with pytest.raises(ValueError):
        sssp(sdf, seeds=[99999], max_hops=1).collect()
    with pytest.raises(ValueError):
        sssp(sdf, seeds=[], max_hops=1)


def test_rrf_fuse_semantics(spark):
    import pytest

    from ctinexus_spark.operators.retrieval import rrf_fuse

    lex = spark.createDataFrame(
        [("q", 1, 1), ("q", 2, 2), ("q", 3, 3)], ["query_id", "doc_id", "rank"]
    )
    dense = spark.createDataFrame(
        [("q", 2, 1), ("q", 4, 2)], ["query_id", "doc_id", "rank"]
    )
    out = {r.doc_id: r for r in rrf_fuse([lex, dense], ["lex", "dense"]).collect()}
    assert set(out) == {1, 2, 3, 4}
    # doc 2 is in both: 1/62 + 1/61; doc 4 dense-only: 1/62 + 0
    assert out[2].rrf_score == 1.0 / 62 + 1.0 / 61
    assert out[4].rrf_score == 1.0 / 62
    assert (out[4].rank_lex, out[4].rank_dense) == (-1, 2)
    assert out[2].rank == 1  # both-retriever doc wins
    # three-retriever chain keeps fixed addition order (smoke)
    third = spark.createDataFrame([("q", 1, 1)], ["query_id", "doc_id", "rank"])
    out3 = {r.doc_id: r.rrf_score for r in rrf_fuse([lex, dense, third], ["a", "b", "c"]).collect()}
    assert out3[1] == (1.0 / 61 + 0.0) + 1.0 / 61
    with pytest.raises(ValueError):
        rrf_fuse([lex], ["a", "b"])


def test_burst_detection_matches_numpy(spark):
    import math

    from ctinexus_spark.operators.stats import burst_detection

    rng = random.Random(17)
    base = dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc)
    rows = []
    for key in ("a", "b", "c"):
        for day in range(20):
            n = rng.randint(1, 30) if rng.random() > 0.1 else rng.randint(100, 140)
            for _ in range(n):
                rows.append((key, base + dt.timedelta(days=day, seconds=rng.randrange(86400))))
    ev = spark.createDataFrame(rows, ["event_type", "ts"])
    got = {
        (r.event_type, r.bucket): (r.cnt, r.is_burst, r.dev_sq_ratio)
        for r in burst_detection(ev).collect()
    }
    # float reference
    counts: dict[str, dict[int, int]] = {}
    for k, ts in rows:
        d = int(ts.timestamp() * 1_000_000) // (86_400 * 1_000_000)
        dd = counts.setdefault(k, {})
        dd[d] = dd.get(d, 0) + 1
    for k, per_day in counts.items():
        vals = list(per_day.values())
        n = len(vals)
        mu = sum(vals) / n
        var = sum(v * v for v in vals) / n - mu * mu
        sd = math.sqrt(max(var, 0.0))
        for d, c in per_day.items():
            cnt, flag, ratio = got[(k, d)]
            assert cnt == c
            # strict inequality; compare against the float reference
            # away from the boundary (the exact test IS the contract)
            if abs(abs(c - mu) - 2 * sd) > 1e-6:
                assert flag == (abs(c - mu) > 2 * sd)
                if sd > 0:
                    assert abs(ratio - ((c - mu) / sd) ** 2) < 1e-6


def test_burst_boundary_is_strict_and_exact(spark):
    from ctinexus_spark.operators.stats import burst_detection

    # counts [1, 3]: mu=2, sigma=1 -> deviations exactly 1sigma.
    # k_sigma=(1,1): strict > must NOT flag either bucket.
    base = dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc)
    rows = [("k", base)] + [("k", base + dt.timedelta(days=1, seconds=i)) for i in range(3)]
    ev = spark.createDataFrame(rows, ["event_type", "ts"])
    out = burst_detection(ev, k_sigma=(1, 1)).collect()
    assert all(not r.is_burst for r in out)
    assert all(r.dev_sq_ratio == 1.0 for r in out)
    # (2,3)·sigma threshold: 1sigma deviation IS a burst
    out2 = burst_detection(ev, k_sigma=(2, 3)).collect()
    assert all(r.is_burst for r in out2)


def test_random_walks_replay_in_python(spark):
    """The hash-driven walks must replay exactly from the Python twin
    of the column hash (py_hash32) — the determinism IS the feature."""
    from ctinexus_spark.graph.analytics import random_walks
    from ctinexus_spark.operators.sketches import py_hash32

    rng = random.Random(21)
    edges = _rand_edges(rng, 20, 40)
    sdf = spark.createDataFrame(edges, ["src", "dst"])
    wpv, length, seed = 2, 3, 7
    got = {
        (r.start, r.walk, r.step): r.vertex
        for r in random_walks(sdf, walks_per_vertex=wpv, length=length, seed=seed).collect()
    }
    adj: dict[int, list[int]] = {}
    for u, v in edges:
        adj.setdefault(u, []).append(v)
        adj.setdefault(v, []).append(u)
    adj = {k: sorted(vs) for k, vs in adj.items()}
    want = {}
    for start in adj:
        for w in range(wpv):
            v = start
            want[(start, w, 0)] = v
            for t in range(1, length + 1):
                nbrs = adj[v]
                v = nbrs[py_hash32(f"{seed}|{start}|{w}|{t}|{v}") % len(nbrs)]
                want[(start, w, t)] = v
    assert got == want
    # every consecutive pair must be a real edge
    eset = {(min(a, b), max(a, b)) for a, b in edges}
    for (s, w, t), v in got.items():
        if t:
            prev = got[(s, w, t - 1)]
            assert (min(prev, v), max(prev, v)) in eset


def test_decayed_counts_matches_python_fold(spark):
    from ctinexus_spark.operators.stats import decay_weights, decayed_counts

    rng = random.Random(29)
    base = dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc)
    rows = []
    per_key_day: dict[str, dict[int, int]] = {}
    for key in ("a", "b"):
        for day in range(20):
            n = rng.randint(0, 9)
            dd = per_key_day.setdefault(key, {})
            if n:
                dd[day] = n
                rows += [
                    (key, base + dt.timedelta(days=day, seconds=i)) for i in range(n)
                ]
    # a fresh burst and its exact one-half-life-older twin
    rows += [("fresh", base + dt.timedelta(days=19, seconds=i)) for i in range(8)]
    rows += [("stale", base + dt.timedelta(days=12, seconds=i)) for i in range(8)]
    ev = spark.createDataFrame(rows, ["event_type", "ts"])
    got = {r.event_type: r for r in decayed_counts(ev, half_life=7.0).collect()}
    wt = dict(decay_weights(7.0, 64))
    epoch_day0 = int(base.timestamp()) // 86_400
    ref = epoch_day0 + 19
    for key, dd in per_key_day.items():
        acc = 0.0
        for day in sorted(dd):  # pinned bucket order, same left fold
            acc = acc + float(dd[day]) * wt[ref - (epoch_day0 + day)]
        assert got[key].score == acc
        assert got[key].n_events == sum(dd.values())
    assert got["fresh"].score == 8.0
    # exactly one half-life older -> exactly half the score
    assert got["stale"].score == 8.0 * wt[7]
    assert abs(got["stale"].score - 4.0) < 1e-12


def test_cusum_drift_matches_python_recurrence(spark):
    """The prefix identity must equal the textbook sequential
    recurrence S_t = max(0, S_{t-1} + (c_t - k)), including a
    deliberate level shift that the point-outlier burst test misses."""
    from ctinexus_spark.operators.stats import cusum_drift

    base = dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc)
    rng = random.Random(37)
    rows = []
    per_key: dict[str, dict[int, int]] = {}
    for key in ("steady", "shifted"):
        dd = {}
        for day in range(30):
            n = rng.randint(8, 12)
            if key == "shifted" and day >= 20:
                n += 6  # small sustained shift, never a 2-sigma point outlier
            dd[day] = n
            rows += [(key, base + dt.timedelta(days=day, seconds=i)) for i in range(n)]
        per_key[key] = dd
    ev = spark.createDataFrame(rows, ["event_type", "ts"])
    got = {
        (r.event_type, r.bucket): (r.cnt, r.k, r.cusum, r.alarm)
        for r in cusum_drift(ev, threshold=15).collect()
    }
    epoch_day0 = int(base.timestamp()) // 86_400
    for key, dd in per_key.items():
        total = sum(dd.values())
        k = total // len(dd)
        s = 0
        for day in sorted(dd):
            s = max(0, s + dd[day] - k)
            cnt, gk, cusum, alarm = got[(key, epoch_day0 + day)]
            assert (cnt, gk) == (dd[day], k)
            assert cusum == s
            assert alarm == (s > 15)
    # the sustained shift must alarm; the steady series must not
    assert any(v[3] for (kk, _), v in got.items() if kk == "shifted")
    assert not any(v[3] for (kk, _), v in got.items() if kk == "steady")
