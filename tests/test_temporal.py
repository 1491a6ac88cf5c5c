"""As-of join semantics: inclusive match, per-key isolation, null
payload before the first right row — pinned on a hand-built timeline
(the DuckDB-native-ASOF cross-check lives in test_entry_contract)."""

import os
import sys

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ctinexus_spark.operators.temporal import asof_join


def _ts(s):
    return f"2026-01-01 00:00:{s:02d}"


def test_asof_join_timeline(spark):
    """Left at t=5 precedes every right row (null), t=10 matches the
    equal-timestamp right row (inclusive), t=15 still carries it,
    t=25 advances to the later right row; a key with no right rows
    stays null throughout."""
    left = spark.createDataFrame(
        [("A", _ts(5), 1), ("A", _ts(10), 2), ("A", _ts(15), 3),
         ("A", _ts(25), 4), ("B", _ts(15), 5)],
        "k string, ts_s string, lid bigint",
    ).select("k", F.col("ts_s").cast("timestamp").alias("ts"), "lid")
    right = spark.createDataFrame(
        [("A", _ts(10), 100, 1.5), ("A", _ts(20), 200, 2.5)],
        "k string, ts_s string, rid bigint, rv double",
    ).select("k", F.col("ts_s").cast("timestamp").alias("ts"), "rid", "rv")

    out = {r.lid: r for r in asof_join(left, right, "k", "ts", ["rid", "rv"]).collect()}
    assert len(out) == 5
    assert out[1].rid is None and out[1].rv is None
    assert (out[2].rid, out[2].rv) == (100, 1.5)
    assert (out[3].rid, out[3].rv) == (100, 1.5)
    assert (out[4].rid, out[4].rv) == (200, 2.5)
    assert out[5].rid is None  # key B has no right rows


def test_asof_join_rejects_payload_collision(spark):
    left = spark.createDataFrame([("A", _ts(1), 1)], "k string, ts_s string, rid bigint").select(
        "k", F.col("ts_s").cast("timestamp").alias("ts"), "rid"
    )
    right = left
    try:
        asof_join(left, right, "k", "ts", ["rid"])
        assert False, "expected ValueError"
    except ValueError as e:
        assert "collide" in str(e)


def test_asof_join_matches_bruteforce_random(spark):
    """200 random left rows × 60 right rows over 5 keys: the
    window-over-union carry must equal the per-row brute argmax
    (latest right.ts <= left.ts per key)."""
    import random

    rng = random.Random(42)
    keys = ["k0", "k1", "k2", "k3", "k4"]
    rights = [
        (k, _ts(rng.randrange(60)), i, float(i) * 0.5)
        for i, k in enumerate(rng.choices(keys, k=60))
    ]
    # enforce the uniqueness contract: one right row per (key, ts)
    seen, rdedup = set(), []
    for k, t, i, v in rights:
        if (k, t) not in seen:
            seen.add((k, t))
            rdedup.append((k, t, i, v))
    lefts = [
        (k, _ts(rng.randrange(60)), 1000 + j)
        for j, k in enumerate(rng.choices(keys, k=200))
    ]
    left = spark.createDataFrame(lefts, "k string, ts_s string, lid bigint").select(
        "k", F.col("ts_s").cast("timestamp").alias("ts"), "lid"
    )
    right = spark.createDataFrame(rdedup, "k string, ts_s string, rid bigint, rv double").select(
        "k", F.col("ts_s").cast("timestamp").alias("ts"), "rid", "rv"
    )
    got = {r.lid: (r.rid, r.rv) for r in asof_join(left, right, "k", "ts", ["rid", "rv"]).collect()}

    by_key = {}
    for k, t, i, v in rdedup:
        by_key.setdefault(k, []).append((t, i, v))
    for k, t, lid in lefts:
        cands = [(rt, i, v) for rt, i, v in by_key.get(k, []) if rt <= t]
        want = max(cands)[1:] if cands else (None, None)
        assert got[lid] == want, (lid, got[lid], want)


def test_interval_join_boundaries_and_buckets(spark):
    """Inclusive on both bounds; a point exactly at start and one at
    end match, one second past does not; intervals spanning multiple
    buckets still find points in later buckets; key isolation holds."""
    from ctinexus_spark.operators.temporal import interval_join

    pts = spark.createDataFrame(
        [("A", _ts(0), 1), ("A", _ts(10), 2), ("A", _ts(30), 3),
         ("A", _ts(31), 4), ("B", _ts(10), 5)],
        "k string, ts_s string, pid bigint",
    ).select("k", F.col("ts_s").cast("timestamp").alias("ts"), "pid")
    ivs = spark.createDataFrame(
        [("A", _ts(0), _ts(30), 100)],
        "k string, s_s string, e_s string, iid bigint",
    ).select(
        "k",
        F.col("s_s").cast("timestamp").alias("s"),
        F.col("e_s").cast("timestamp").alias("e"),
        "iid",
    )
    # bucket width 7s: the 30s interval spans 5 buckets
    out = interval_join(pts, ivs, "k", "ts", "s", "e", bucket_seconds=7).collect()
    assert sorted(r.pid for r in out) == [1, 2, 3]
    assert all(r.iid == 100 for r in out)


def test_interval_join_matches_bruteforce_random(spark):
    """Random points/intervals: the bucketized equi-join equals the
    per-pair brute filter for several bucket widths (width must not
    change semantics)."""
    import random

    from ctinexus_spark.operators.temporal import interval_join

    rng = random.Random(5)
    keys = ["a", "b", "c"]
    pts_rows = [(rng.choice(keys), _ts(rng.randrange(60)), j) for j in range(80)]
    ivs_rows = []
    for i in range(25):
        s = rng.randrange(55)
        ivs_rows.append((rng.choice(keys), _ts(s), _ts(min(59, s + rng.randrange(12))), 100 + i))
    pts = spark.createDataFrame(pts_rows, "k string, ts_s string, pid bigint").select(
        "k", F.col("ts_s").cast("timestamp").alias("ts"), "pid"
    )
    ivs = spark.createDataFrame(ivs_rows, "k string, s_s string, e_s string, iid bigint").select(
        "k", F.col("s_s").cast("timestamp").alias("s"),
        F.col("e_s").cast("timestamp").alias("e"), "iid",
    )
    want = sorted(
        (p[2], i[3])
        for p in pts_rows for i in ivs_rows
        if p[0] == i[0] and i[1] <= p[1] <= i[2]
    )
    for width in (3, 10, 100):
        got = sorted(
            (r.pid, r.iid)
            for r in interval_join(pts, ivs, "k", "ts", "s", "e", bucket_seconds=width).collect()
        )
        assert got == want, width


def test_time_rollup_cascade_consistency(spark):
    """Cascaded hour/day rows must equal direct aggregation of the
    raw rows, and each level's counts sum to the row total."""
    from ctinexus_spark.operators.temporal import time_rollup

    rows = [
        (f"2026-03-01 0{h}:{m:02d}:{s:02d}", float(h * 10 + m))
        for h in range(3) for m in (0, 1, 59) for s in (5, 40)
    ]
    ev = spark.createDataFrame(rows, "ts_s string, value double").select(
        F.col("ts_s").cast("timestamp").alias("ts"), "value"
    )
    out = time_rollup(ev, ts="ts", value="value").collect()
    by_level = {}
    for r in out:
        by_level.setdefault(r.level, []).append(r)
    assert sum(r.n for r in by_level["minute"]) == len(rows)
    assert sum(r.n for r in by_level["hour"]) == len(rows)
    assert len(by_level["day"]) == 1 and by_level["day"][0].n == len(rows)
    # hour rows match a direct python aggregation
    want_hours = {}
    for ts_s, v in rows:
        want_hours.setdefault(ts_s[:13], [0, 0.0])
        want_hours[ts_s[:13]][0] += 1
        want_hours[ts_s[:13]][1] += v
    got_hours = {str(r.bucket_start)[:13]: (r.n, r.sum_value) for r in by_level["hour"]}
    assert set(got_hours) == set(want_hours)
    for k, (n, sv) in want_hours.items():
        assert got_hours[k][0] == n and abs(got_hours[k][1] - sv) < 1e-9


def test_asof_join_null_payload_field_not_backfilled(spark):
    """A NULL field in the matched right row must stay NULL — the
    payload rides as one struct, so per-field carries cannot stitch
    together values from different right rows."""
    left = spark.createDataFrame(
        [("A", _ts(20), 1)], "k string, ts_s string, lid bigint"
    ).select("k", F.col("ts_s").cast("timestamp").alias("ts"), "lid")
    right = spark.createDataFrame(
        [("A", _ts(0), 50, 7.0), ("A", _ts(10), 100, None)],
        "k string, ts_s string, rid bigint, rv double",
    ).select("k", F.col("ts_s").cast("timestamp").alias("ts"), "rid", "rv")
    out = asof_join(left, right, "k", "ts", ["rid", "rv"]).collect()
    assert len(out) == 1
    # the matched row is (rid=100, rv=NULL) — NOT (rid=100, rv=7.0)
    assert (out[0].rid, out[0].rv) == (100, None)


def test_interval_join_subsecond_bounds(spark):
    """Sub-second timestamps: the range filter must use the original
    timestamps, not second-truncated epochs — a point 0.4 s past the
    interval end shares its truncated epoch but must NOT match."""
    from ctinexus_spark.operators.temporal import interval_join

    pts = spark.createDataFrame(
        [("A", "2026-01-01 00:00:00.900", 1), ("A", "2026-01-01 00:00:00.300", 2)],
        "k string, ts_s string, pid bigint",
    ).select("k", F.col("ts_s").cast("timestamp").alias("ts"), "pid")
    ivs = spark.createDataFrame(
        [("A", "2026-01-01 00:00:00.100", "2026-01-01 00:00:00.500", 100)],
        "k string, s_s string, e_s string, iid bigint",
    ).select(
        "k",
        F.col("s_s").cast("timestamp").alias("s"),
        F.col("e_s").cast("timestamp").alias("e"),
        "iid",
    )
    out = interval_join(pts, ivs, "k", "ts", "s", "e", bucket_seconds=60).collect()
    assert [r.pid for r in out] == [2]


def test_time_weighted_avg_matches_numpy_trapezoid(spark):
    """TWA == numpy.trapz / span on random irregular samples, and a
    constant series's TWA is exactly the constant regardless of
    spacing (the property an arithmetic mean lacks)."""
    import datetime as dt
    import random

    import numpy as np

    from ctinexus_spark.operators.temporal import time_weighted_avg

    rng = random.Random(23)
    base = dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc)
    rows, series = [], {}
    for key in ("x", "y"):
        ts = sorted(rng.sample(range(1, 500_000), 40))
        vs = [rng.uniform(-5, 5) for _ in ts]
        series[key] = (ts, vs)
        rows += [(key, base + dt.timedelta(seconds=t), v) for t, v in zip(ts, vs)]
    # constant series, wildly uneven spacing
    for t in (0, 1, 10, 1000, 100_000):
        rows.append(("const", base + dt.timedelta(seconds=t), 7.25))
    ev = spark.createDataFrame(rows, ["event_type", "ts", "value"])
    got = {r.event_type: r for r in time_weighted_avg(ev).collect()}
    for key, (ts, vs) in series.items():
        t_us = np.array(ts, dtype=np.float64) * 1_000_000
        want = np.trapz(np.array(vs), t_us) / (t_us[-1] - t_us[0])
        assert abs(got[key].twa - want) < 1e-12
        assert got[key].n_samples == 40
        assert got[key].span_us == (ts[-1] - ts[0]) * 1_000_000
    assert got["const"].twa == 7.25


def test_session_transitions_matches_brute(spark):
    """Transitions vs a per-user Python scan: session breaks drop the
    pair; row-conditional p sums to 1 per from_type."""
    import datetime as dt
    import random

    from ctinexus_spark.operators.temporal import session_transitions

    rng = random.Random(31)
    base = dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc)
    types = ["view", "click", "purchase"]
    rows = []
    eid = 0
    per_user = {}
    for u in range(15):
        t = 0
        evs = []
        for _ in range(rng.randint(0, 20)):
            t += rng.choice([5, 60, 600, 4000])  # some gaps break sessions
            evs.append((t, eid, rng.choice(types)))
            eid += 1
        per_user[u] = evs
        rows += [
            (u, e, base + dt.timedelta(seconds=t), ty) for t, e, ty in evs
        ]
    if not rows:
        rows = [(0, 0, base, "view")]
    ev = spark.createDataFrame(rows, ["user_id", "event_id", "ts", "event_type"])
    got = {
        (r.from_type, r.to_type): (r.n, r.row_n, r.p)
        for r in session_transitions(ev, gap_seconds=1800).collect()
    }
    want: dict[tuple[str, str], int] = {}
    for evs in per_user.values():
        for (t0, _, ty0), (t1, _, ty1) in zip(evs, evs[1:]):
            if t1 - t0 <= 1800:
                want[(ty0, ty1)] = want.get((ty0, ty1), 0) + 1
    row_n: dict[str, int] = {}
    for (f, _), n in want.items():
        row_n[f] = row_n.get(f, 0) + n
    want2 = {k: (n, row_n[k[0]], float(n) / float(row_n[k[0]])) for k, n in want.items()}
    assert got == want2
    # probabilities sum to 1 per from_type (exact rational partition)
    from collections import defaultdict

    sums = defaultdict(list)
    for (f, _), (n, rn, _) in got.items():
        sums[f].append((n, rn))
    for f, pairs in sums.items():
        assert sum(n for n, _ in pairs) == pairs[0][1]
