"""Temporal joins over event tables.

The as-of join — "for each left row, the most recent right row at or
before its timestamp, per key" — is the trade/quote, price/event,
config/rollout primitive. Naively it is a range join (every left row
against every earlier right row), which Spark plans as a quadratic
nested loop per key. The scalable formulation is window-over-union:
tag both sides, union them, shuffle ONCE on the key, sort within
partitions by (ts, side) with right rows first at tie, and carry the
right payload forward with last(ignore_nulls) over a running row
frame. One shuffle + one sort, linear state, no range join — at any
key cardinality or history depth.

Reference scope: the reference engine (peng-gao-lab/ctinexus) has no
temporal layer; this extends the training-data-pipeline families the
rebuild adds on top of SURVEY.md §2. The DuckDB twin uses the
engine's NATIVE ASOF JOIN — an independently implemented operator —
so the correctness gate compares two unrelated as-of algorithms.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window, functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    ts: str,
    payload: Sequence[str],
) -> DataFrame:
    """Left as-of join: every left row, plus `payload` columns from
    the latest right row with right.ts <= left.ts on the same key
    (null payload when no such row exists).

    Determinism contract: right must be unique per (key, ts) — dedupe
    upstream (struct-max winner, the line_dedup pattern) — because the
    running carry takes "the" right row at each timestamp. Left rows
    tie-break freely: they hold a null payload STRUCT, so their mutual
    order cannot change any last(ignore_nulls) result; right rows sort
    before left rows at an equal timestamp (side 0 < 1), which
    implements the <= (inclusive) match.

    The payload rides as ONE struct, not per-column carries: a struct
    is non-null for every right row even when its fields are null, so
    a null field in the matched row stays null instead of being
    back-filled from an older right row (per-column last(ignore_nulls)
    would stitch together fields from different rows).

    Scale shape: one union (no shuffle), one exchange on `key`, one
    within-partition sort, one window pass. Payload values are carried
    verbatim (no arithmetic), so float columns are trivially bit-exact
    cross-engine.
    """
    from pyspark.sql import types as T

    left_cols = left.columns
    clash = set(left_cols) & set(payload)
    if clash:
        raise ValueError(f"payload columns collide with left columns: {clash}")
    p_type = T.StructType([
        T.StructField(c, right.schema[c].dataType) for c in payload
    ])
    r_sel = [F.col(key), F.col(ts), F.lit(0).alias("_side")]
    r_sel += [F.lit(None).cast(left.schema[c].dataType).alias(c)
              for c in left_cols if c not in (key, ts)]
    r_sel += [F.struct(*[F.col(c) for c in payload]).alias("_p")]
    l_sel = [F.col(key), F.col(ts), F.lit(1).alias("_side")]
    l_sel += [F.col(c) for c in left_cols if c not in (key, ts)]
    l_sel += [F.lit(None).cast(p_type).alias("_p")]
    u = right.select(*r_sel).unionByName(left.select(*l_sel))
    w = (
        Window.partitionBy(key)
        .orderBy(F.col(ts), F.col("_side"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = u.select(
        "*", F.last(F.col("_p"), ignorenulls=True).over(w).alias("_c")
    )
    return carried.filter(F.col("_side") == 1).select(
        *[F.col(c) for c in left_cols],
        *[F.col(f"_c.{c}").alias(c) for c in payload],
    )


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    key: str,
    ts: str,
    start: str,
    end: str,
    bucket_seconds: int = 3600,
) -> DataFrame:
    """All (interval, point) pairs with start <= point.ts <= end on
    the same key — the batch twin of the streaming interval join
    (click-attribution, config-window matching). Inclusive on both
    bounds.

    Spark's optimizer plans a raw `BETWEEN` join as a nested loop per
    key; the scalable formulation bucketizes time: each interval
    explodes to its covered buckets of `bucket_seconds` (sequence of
    floor-epochs — bounded fan-out: ceil(interval_len/width)+1 rows),
    each point maps to its single bucket, and the match becomes an
    EQUI-join on (key, bucket) followed by the exact range filter. A
    point lives in exactly one bucket, so no pair is found twice — no
    dedup pass. Pick bucket_seconds near the typical interval length:
    fan-out stays O(1) per interval and each bucket joins only
    time-local rows.

    Bucket ids use second-truncated integer epochs (unix_timestamp
    under the UTC session zone == DuckDB epoch(), the event_leadlag
    precedent) — truncation is monotone, so a contained point's bucket
    always falls inside the interval's bucket range; the exact range
    filter compares the ORIGINAL timestamp columns (sub-second
    precision preserved — a truncated-epoch filter would admit a point
    0.9 s past a .5 s interval end). Points and intervals must share
    ONLY the key column name.
    """
    clash = (set(points.columns) & set(intervals.columns)) - {key}
    if clash:
        raise ValueError(f"point/interval columns collide: {clash}")
    w = int(bucket_seconds)
    pts = points.withColumn(
        "_b", F.floor(F.unix_timestamp(F.col(ts)).cast("bigint") / w).cast("bigint")
    )
    ivs = intervals.withColumn(
        "_b",
        F.explode(
            F.sequence(
                F.floor(F.unix_timestamp(F.col(start)).cast("bigint") / w).cast(
                    "bigint"
                ),
                F.floor(F.unix_timestamp(F.col(end)).cast("bigint") / w).cast(
                    "bigint"
                ),
            )
        ),
    )
    return (
        pts.join(ivs, [key, "_b"])
        .filter((F.col(ts) >= F.col(start)) & (F.col(ts) <= F.col(end)))
        .drop("_b")
    )


def time_rollup(
    events: DataFrame,
    ts: str = "ts",
    value: str | None = None,
) -> DataFrame:
    """(level, bucket_start, n, sum_value): minute/hour/day counts —
    the hypertable continuous-aggregate cascade. The minute level
    aggregates RAW rows once; the hour level re-aggregates the minute
    PARTIALS and the day level the hour partials, so raw data is
    scanned exactly once no matter how many resolutions materialize
    (at 100 TB the raw scan dominates; each cascade step above it
    touches ≤ |buckets| rows).

    Counts are integers; the value sum accumulates as DECIMAL(18,6)
    through every cascade step (associative, exact — order-free) and
    casts to DOUBLE only in the final projection, so sum_value is
    bit-exact vs a direct per-level aggregation (the
    event_type_rollup precedent). Each intermediate level is
    barriered: it feeds both its own output row-set and the next
    coarser level (multi-consumer branch rule).
    """
    from ctinexus_spark.partitioning import barrier

    val = (
        F.col(value).cast("decimal(18,6)")
        if value is not None
        else F.lit(0).cast("decimal(18,6)")
    )
    minute = barrier(
        events.groupBy(F.date_trunc("minute", F.col(ts)).alias("bucket_start"))
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.sum(val).alias("sv"),
        )
    )
    hour = barrier(
        minute.groupBy(
            F.date_trunc("hour", F.col("bucket_start")).alias("bucket_start")
        ).agg(F.sum("n").cast("bigint").alias("n"), F.sum("sv").alias("sv"))
    )
    day = hour.groupBy(
        F.date_trunc("day", F.col("bucket_start")).alias("bucket_start")
    ).agg(F.sum("n").cast("bigint").alias("n"), F.sum("sv").alias("sv"))

    def out(df, level):
        return df.select(
            F.lit(level).alias("level"),
            "bucket_start",
            "n",
            F.col("sv").cast("double").alias("sum_value"),
        )

    return out(minute, "minute").unionByName(out(hour, "hour")).unionByName(
        out(day, "day")
    )


def funnel(
    events: DataFrame,
    steps: Sequence[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Ordered conversion funnel: per user, the earliest completion
    time of each successive step, each strictly AFTER the previous
    step's completion (the classic product-analytics operator;
    `funnel(ev, ["view", "click", "purchase"])`).

    Single-shuffle formulation: instead of k-1 join+agg rounds (one
    per step), shuffle ONCE on the user, array_sort the per-user
    event structs, and fold the step chain as nested JVM higher-order
    functions — t_i = min ts among events of type steps[i] with
    ts > t_{i-1}. Per-user state is the user's own event list, which
    is bounded in any real event store (and spillable via the
    preceding sort if not).

    Output: one row per user that completed step 0 —
    (user, t_0..t_{k-1} as epoch-micro BIGINT, -1 where the funnel
    stopped, depth = number of steps completed). Sentinels, not NULLs:
    nullable BIGINTs round-trip through pandas as float64 and break
    hash comparison (event_asof_purchase precedent).
    """
    if not steps:
        raise ValueError("funnel needs at least one step")
    evs = (
        events.select(
            F.col(user_col).alias("user_id"),
            F.col(type_col).alias("etype"),
            # parquet event ts is TIMESTAMP_NTZ; the session zone is
            # pinned UTC (session.py) so the LTZ cast is identity and
            # unix_micros == DuckDB epoch_us on the naive value
            F.unix_micros(F.col(ts_col).cast("timestamp")).alias("tus"),
        )
        .filter(F.col("etype").isin(list(steps)))
        .groupBy("user_id")
        .agg(F.array_sort(F.collect_list(F.struct("tus", "etype"))).alias("evs"))
    )
    cols = [F.col("user_id")]
    prev = None
    out = evs
    for i, step in enumerate(steps):
        # min ts of this step's events strictly after the previous
        # step's time; the array is tus-sorted so hit[0] IS the min
        # closure factory, not default-arg lambdas: PySpark HOFs read
        # the lambda arity (a 2nd arg means "element index")
        def _cond(s: str, pv: str | None):
            if pv is None:
                return lambda e: e["etype"] == F.lit(s)
            return lambda e: (e["etype"] == F.lit(s)) & (e["tus"] > F.col(pv))

        hit = F.filter(F.col("evs"), _cond(step, prev))
        if prev is None:
            reached = F.size(hit) > 0
        else:
            # a dead funnel stays dead: prev = -1 blocks every later step
            reached = (F.col(prev) >= 0) & (F.size(hit) > 0)
        t_i = F.when(reached, F.element_at(hit, 1)["tus"]).otherwise(F.lit(-1)).cast("bigint")
        out = out.withColumn(f"t{i}", t_i)
        prev = f"t{i}"
        cols.append(F.col(f"t{i}"))
    depth = sum((F.col(f"t{i}") >= 0).cast("int") for i in range(len(steps)))
    return (
        out.filter(F.col("t0") >= 0)
        .select(*cols, depth.alias("depth"))
    )


def cohort_retention(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    bucket_seconds: int = 604_800,
) -> DataFrame:
    """Cohort retention matrix: users grouped by the time bucket of
    their FIRST event (the cohort), then for each later bucket the
    fraction still active — the standard growth-analytics triangle
    (cohort_bucket, bucket_offset, n_active, cohort_size, retention).

    Dataflow: bucket index = integer floor-division of epoch-micros
    (exact BIGINT `div` on both engines — no double rounding at bucket
    boundaries); first-touch per user = one partial-agg min; activity
    = distinct (user, bucket); one equi-join on the user attaches the
    cohort; counts are plain aggs because (user, bucket) is already
    unique. retention = one IEEE division of integer-valued doubles —
    engine bit-exact.
    """
    w = bucket_seconds * 1_000_000
    ev = events.select(
        F.col(user_col).alias("user_id"),
        F.expr(f"unix_micros(cast({ts_col} as timestamp)) div {w}").alias("bk"),
    )
    first = ev.groupBy("user_id").agg(F.min("bk").alias("cohort_bucket"))
    act = ev.distinct()
    per_cell = (
        act.join(first, "user_id")
        .groupBy(
            "cohort_bucket", (F.col("bk") - F.col("cohort_bucket")).alias("bucket_offset")
        )
        .agg(F.count("*").cast("bigint").alias("n_active"))
    )
    sizes = first.groupBy("cohort_bucket").agg(
        F.count("*").cast("bigint").alias("cohort_size")
    )
    return per_cell.join(sizes, "cohort_bucket").select(
        "cohort_bucket",
        "bucket_offset",
        "n_active",
        "cohort_size",
        (F.col("n_active").cast("double") / F.col("cohort_size").cast("double")).alias(
            "retention"
        ),
    )


def time_weighted_avg(
    events: DataFrame,
    key_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Time-weighted average over irregular samples (the TimescaleDB
    `time_weight('Linear')` primitive): per key, the trapezoid
    integral of the value curve divided by the observation span —
    the honest mean of a sensor/price/gauge series where sample
    spacing is uneven (an arithmetic mean over-weights bursty
    periods).

    twa = Σ_i (v_i + v_{i+1})·(t_{i+1} − t_i) / (2·(t_n − t_1))

    Float pinning: each trapezoid term is a fixed IEEE chain (one add,
    one multiply against an exact integer-valued Δt in micros); the
    SUM of terms is order-dependent, so both engines fold the terms
    in pinned (t, v) order — Spark left-folds
    array_sort(collect_list(struct)), DuckDB list_sum(list(term ORDER
    BY ...)), the lm_scores/pagerank precedent — and the final value
    is one division by the exact span. Keys need >= 2 samples (a
    single point has no span).

    One shuffle on the key; per-key state is the key's own sample
    list through the sort+fold (spillable via the aggregation sort).
    """
    ev = events.select(
        F.col(key_col).alias("key"),
        F.unix_micros(F.col(ts_col).cast("timestamp")).alias("tus"),
        F.col(value_col).cast("double").alias("v"),
    )
    agg = ev.groupBy("key").agg(
        F.array_sort(F.collect_list(F.struct("tus", "v"))).alias("pts"),
        F.count("*").cast("bigint").alias("n_samples"),
    )
    pts = F.col("pts")
    terms = F.transform(
        F.sequence(F.lit(0), F.size(pts) - 2),
        lambda i: (
            (F.element_at(pts, i + 1)["v"] + F.element_at(pts, i + 2)["v"])
            * (
                F.element_at(pts, i + 2)["tus"] - F.element_at(pts, i + 1)["tus"]
            ).cast("double")
        ),
    )
    span = (
        F.element_at(pts, F.size(pts))["tus"] - F.element_at(pts, 1)["tus"]
    ).cast("bigint")
    total = F.aggregate(terms, F.lit(0.0), lambda acc, t: acc + t)
    return (
        agg.filter(F.size(pts) >= 2)
        .filter(span > 0)
        .select(
            F.col("key").alias(key_col),
            "n_samples",
            span.alias("span_us"),
            (total / (F.lit(2.0) * span.cast("double"))).alias("twa"),
        )
    )


def session_transitions(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    tiebreak_col: str = "event_id",
    gap_seconds: int = 1800,
    min_count: int = 1,
) -> DataFrame:
    """Within-session event-type transition matrix — the user-journey
    / Markov-chain primitive behind every path-analysis Sankey:
    consecutive event pairs of the same user with <= gap_seconds
    between them, counted per (from_type, to_type), with the row-
    conditional probability p = n / Σ_to n.

    One key shuffle: lag() over (user ORDER BY ts, tiebreak) yields
    the predecessor type + gap; a session break (gap > G or first
    event) drops the pair; two partial aggs (pair counts, from-type
    totals) + one equi-join. p is one IEEE division of exact
    integer-valued doubles — engine bit-exact. The tiebreak column
    makes the frame order total (the event_leadlag precedent).
    """
    w = Window.partitionBy(user_col).orderBy(F.col(ts_col), F.col(tiebreak_col))
    tus = F.unix_micros(F.col(ts_col).cast("timestamp"))
    prev_t = F.lag(F.col(type_col)).over(w)
    gap_us = tus - F.lag(tus).over(w)
    pairs = (
        events.select(
            prev_t.alias("from_type"),
            F.col(type_col).alias("to_type"),
            gap_us.alias("gap_us"),
        )
        .filter(
            F.col("from_type").isNotNull()
            & (F.col("gap_us") <= F.lit(gap_seconds * 1_000_000))
        )
        .groupBy("from_type", "to_type")
        .agg(F.count("*").cast("bigint").alias("n"))
        .filter(F.col("n") >= min_count)
    )
    from ctinexus_spark.partitioning import barrier

    pairs = barrier(pairs)  # feeds totals + the final join
    totals = pairs.groupBy("from_type").agg(F.sum("n").cast("bigint").alias("row_n"))
    return pairs.join(totals, "from_type").select(
        "from_type",
        "to_type",
        "n",
        "row_n",
        (F.col("n").cast("double") / F.col("row_n").cast("double")).alias("p"),
    )
