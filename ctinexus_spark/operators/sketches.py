"""Distributed sketches: HyperLogLog cardinality, Count-Min heavy
hitters, Bloom-filter membership.

At 100 TB these are the O(1)-state answers to "how many distinct X",
"which values are hot", and "is this fingerprint denylisted": each
sketch is a few KB of registers that merge associatively across
partitions, so Catalyst plans them as map-side partial aggregates
plus a tiny final reduce — raw values never ship through a shuffle,
and the probe side joins against a broadcast of the finished sketch.

Determinism contract (DuckDB oracle parity): every hash is the
integer value of the first 8 hex chars of an md5 (identical in Spark
via conv(substr(md5..), 16, 10) and in DuckDB via a strpos fold);
register folds are integer maxima/sums or sums of exact powers of
two (1/2^rho spans < 53 mantissa bits, so the double sum is exact
and order-independent); the one float chain per sketch (the HLL
estimator) is a fixed-order IEEE mul/div chain. Results are
bit-exact across engines — see dataset_queries.py for the twins.

Reference scope: the reference engine (peng-gao-lab/ctinexus) has no
sketch layer; this extends the training-data-pipeline families the
rebuild adds on top of SURVEY.md §2.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

__all__ = [
    "hash32",
    "py_hash32",
    "hll_register_rows",
    "hll_distinct",
    "cms_sketch",
    "cms_bucket_rows",
    "cms_heavy_hitters",
    "bloom_positions",
    "bloom_probe",
    "kmv_min_k",
    "kmv_distinct",
    "kmv_overlap",
]


def hash32(col: Column, salt: int | None = None) -> Column:
    """Deterministic 32-bit hash: integer value of the first 8 md5
    hex chars (salted with '{salt}|' prefix). Portable to DuckDB."""
    x = F.concat(F.lit(f"{salt}|"), col) if salt is not None else col
    return F.conv(F.substring(F.md5(x), 1, 8), 16, 10).cast("long")


def py_hash32(value: str, salt: int | None = None) -> int:
    """Python twin of hash32 — byte-identical on strings (md5 of the
    utf-8 bytes, same '{salt}|' prefix). Used where a driver-side
    constant needs the same hash as the Spark column (e.g. probe
    positions for the streaming Count-Min monitor)."""
    import hashlib

    x = f"{salt}|{value}" if salt is not None else value
    return int(hashlib.md5(x.encode("utf-8")).hexdigest()[:8], 16)


# --- HyperLogLog --------------------------------------------------------


def hll_register_rows(
    values: DataFrame,
    group_col: str,
    value_col: str,
    p: int = 10,
) -> DataFrame:
    """(group, bucket, rho): the per-occurrence register observations
    an HLL is built from — bucket = top p hash bits, rho = leading-
    zero rank of the low (32-p) bits. Shared kernel of the batch
    aggregate (hll_distinct) and the streaming stateful sketch
    (streaming.ingest.stream_hll_distinct), so both produce identical
    registers by construction."""
    rest = 32 - p
    h = hash32(F.col(value_col))
    bucket = F.shiftright(h, rest)
    w = h.bitwiseAND(F.lit((1 << rest) - 1))
    rho = F.when(w == 0, F.lit(rest + 1)).otherwise(
        F.lit(rest + 1) - F.length(F.bin(w))
    )
    return values.select(
        F.col(group_col).alias("group"),
        bucket.alias("bucket"),
        rho.alias("rho"),
    )


def hll_distinct(
    values: DataFrame,
    group_col: str,
    value_col: str,
    p: int = 10,
) -> DataFrame:
    """Per-group HyperLogLog distinct estimate over a value column.

    (group, nonzero_registers, hll_est): m = 2^p registers; bucket =
    top p bits of the 32-bit hash, rho = leading-zero rank of the
    remaining (32-p) bits. Raw Flajolet estimator alpha*m^2 /
    sum(2^-M_j) — no small-range linear-counting correction, because
    that needs ln() and libm vs JVM logs differ in the last ulp
    (lm_scores precedent); callers wanting the correction can apply
    it to hll_est + nonzero_registers downstream.

    Plan shape: two hash aggregations with map-side partial combine
    ((group, bucket) max-rho, then per-group sum over <= m register
    rows). The value column itself never shuffles.
    """
    m = 1 << p
    regs = (
        hll_register_rows(values, group_col, value_col, p=p)
        .withColumnRenamed("group", group_col)
        .groupBy(group_col, "bucket")
        .agg(F.max("rho").alias("m_j"))
    )
    # 1/2^m_j is an exact power of two; the sum spans < 53 mantissa
    # bits, so it is exact and shuffle-order-independent.
    inv_pow = F.expr("CAST(1.0 AS DOUBLE) / CAST(shiftleft(CAST(1 AS BIGINT), m_j) AS DOUBLE)")
    agg = regs.groupBy(group_col).agg(
        F.count("*").cast("bigint").alias("nonzero_registers"),
        F.sum(inv_pow).alias("_s"),
    )
    alpha = F.lit(0.7213) / (F.lit(1.0) + F.lit(1.079) / F.lit(float(m)))
    est = (alpha * F.lit(float(m * m))) / (
        F.col("_s") + (F.lit(m) - F.col("nonzero_registers")).cast("double")
    )
    return agg.select(
        F.col(group_col),
        F.col("nonzero_registers"),
        est.alias("hll_est"),
    )


# --- Count-Min ----------------------------------------------------------


def cms_sketch(
    values: DataFrame,
    value_col: str,
    depth: int = 4,
    width: int = 2048,
) -> DataFrame:
    """(row, bucket, cnt): Count-Min counter table, depth x width.
    Built with one explode(depth) + one partial-combined count — the
    result is depth*width rows regardless of input size, i.e. a
    broadcastable sketch."""
    hashes = F.array(
        *[
            F.struct(
                F.lit(i).alias("row"),
                (hash32(F.col(value_col), salt=i) % width).alias("bucket"),
            )
            for i in range(depth)
        ]
    )
    return (
        values.select(F.explode(hashes).alias("h"))
        .groupBy(F.col("h.row").alias("row"), F.col("h.bucket").alias("bucket"))
        .agg(F.count("*").cast("bigint").alias("cnt"))
    )


def cms_bucket_rows(
    values: DataFrame,
    group_col: str,
    value_col: str,
    depth: int = 4,
    width: int = 2048,
) -> DataFrame:
    """(group, row, bucket): the per-occurrence counter observations a
    grouped Count-Min is built from — shared kernel of the streaming
    stateful sketch (streaming.ingest.stream_cms_probes), mirroring
    hll_register_rows so stream and batch count identical buckets by
    construction."""
    hashes = F.array(
        *[
            F.struct(
                F.lit(i).alias("row"),
                (hash32(F.col(value_col), salt=i) % width).alias("bucket"),
            )
            for i in range(depth)
        ]
    )
    return values.select(
        F.col(group_col).alias("group"), F.explode(hashes).alias("h")
    ).select("group", F.col("h.row").alias("row"), F.col("h.bucket").alias("bucket"))


def cms_heavy_hitters(
    values: DataFrame,
    value_col: str,
    depth: int = 4,
    width: int = 2048,
    k: int = 50,
) -> DataFrame:
    """(value, exact_cnt, cms_est) for the exact top-k values — the
    heavy-hitter report with its Count-Min estimate alongside the
    exact count (cms_est >= exact_cnt always; the gap is the sketch's
    collision noise at this width).

    Candidates come from the exact count (deterministic tie-break:
    cnt desc, value asc — TakeOrderedAndProject, no full sort); at
    crawl scale the candidate set would come from a per-partition
    pre-top-k, which is the same plan shape. Estimation joins the
    k*depth candidate probes against a broadcast of the finished
    depth*width sketch.

    One raw pass (optimization round 6, guide §2.3): the raw values
    aggregate to (value, exact_cnt) ONCE — Zipfian mass collapses in
    the map-side combine — and the sketch re-aggregates those partials
    (cell cnt = Σ exact_cnt over colliding values; integer-exact, so
    the sketch is bit-identical to cms_sketch's over the raw rows).
    The earlier shape scanned the raw explode twice (once for the
    sketch, once for the exact counts) and exploded depth hash rows
    per OCCURRENCE instead of per distinct value. The shared counts
    exchange is deduplicated by exchange reuse in the final plan."""
    counts = values.groupBy(value_col).agg(
        F.count("*").cast("bigint").alias("exact_cnt")
    )
    sketch = (
        counts.select(
            "exact_cnt",
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(i).alias("row"),
                            (hash32(F.col(value_col), salt=i) % width).alias("bucket"),
                        )
                        for i in range(depth)
                    ]
                )
            ).alias("h"),
        )
        .groupBy(F.col("h.row").alias("row"), F.col("h.bucket").alias("bucket"))
        .agg(F.sum("exact_cnt").cast("bigint").alias("cnt"))
    )
    exact = (
        counts.orderBy(F.col("exact_cnt").desc(), F.col(value_col))
        .limit(k)
    )
    probes = exact.select(
        F.col(value_col),
        F.col("exact_cnt"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("row"),
                        (hash32(F.col(value_col), salt=i) % width).alias("bucket"),
                    )
                    for i in range(depth)
                ]
            )
        ).alias("h"),
    ).select(
        F.col(value_col),
        F.col("exact_cnt"),
        F.col("h.row").alias("p_row"),
        F.col("h.bucket").alias("p_bucket"),
    )
    return (
        probes.join(
            F.broadcast(sketch),
            (probes["p_row"] == sketch["row"]) & (probes["p_bucket"] == sketch["bucket"]),
        )
        .groupBy(value_col, "exact_cnt")
        .agg(F.min("cnt").alias("cms_est"))
    )


# --- Bloom filter -------------------------------------------------------


def bloom_positions(
    deny: DataFrame,
    value_col: str,
    bits: int = 16384,
    hashes: int = 3,
) -> DataFrame:
    """(pos): the distinct set bit positions of a Bloom filter built
    over the deny set — the relational form of the bitset (<= bits
    rows, broadcastable)."""
    pos = F.array(*[hash32(F.col(value_col), salt=i) % bits for i in range(hashes)])
    return deny.select(F.explode(pos).alias("pos")).distinct()


def bloom_probe(
    probe: DataFrame,
    deny: DataFrame,
    value_col: str,
    bits: int = 16384,
    hashes: int = 3,
) -> DataFrame:
    """(value, is_member) for every probe value the Bloom filter
    flags as maybe-member. is_member is ground truth (broadcast
    semi-check against the deny set), so `NOT is_member` rows are the
    filter's false positives at this bits/hashes sizing.

    A probe row is flagged iff ALL `hashes` of its positions are set:
    each exploded (value, pos) row joins the distinct position table
    at most once, so count(*) == hashes is exactly set containment
    (duplicate positions within one value's hash list don't break
    this — the duplicate either matches twice or misses twice). The
    probe side is distinct-ed first: a value occurring twice would
    otherwise double its hit count past `hashes` and be silently
    dropped.
    """
    deny_d = deny.select(F.col(value_col)).distinct()
    deny_pos = bloom_positions(deny_d, value_col, bits=bits, hashes=hashes)
    pos = F.array(*[hash32(F.col(value_col), salt=i) % bits for i in range(hashes)])
    probe_pos = probe.select(F.col(value_col)).distinct().select(
        F.col(value_col), F.explode(pos).alias("pos")
    )
    flagged = (
        probe_pos.join(F.broadcast(deny_pos), "pos")
        .groupBy(value_col)
        .agg(F.count("*").alias("_hits"))
        .filter(F.col("_hits") == hashes)
        .select(value_col)
    )
    membership = deny_d.withColumn("is_member", F.lit(True))
    return flagged.join(F.broadcast(membership), value_col, "left").select(
        F.col(value_col),
        F.coalesce(F.col("is_member"), F.lit(False)).alias("is_member"),
    )


# --- KMV (k-minimum-values / bottom-k) ----------------------------------


def kmv_min_k(
    values: DataFrame,
    group_col: str,
    value_col: str,
    k: int = 256,
    salts: int = 64,
) -> DataFrame:
    """(group, hs): the k smallest DISTINCT hash32 values per group —
    the KMV / bottom-k sketch, the distinct-count sketch that (unlike
    HLL registers) also supports SET OPERATIONS: the union of two KMVs
    is the bottom-k of their merged hash sets, so intersection /
    Jaccard estimates fall out of the same k values.

    Two salted rank-filter stages: stage one ranks within each
    (group, h % salts) cell — salts× parallelism, and the window's
    SORT is disk-spillable at any cell size (a collect_list-then-slice
    formulation would buffer the cell's every distinct hash in one
    in-memory array: O(distinct/salts) per cell, not O(k)); stage two
    ranks the ≤ salts·k survivors per group (bounded input by
    construction — 16 384 rows at the defaults) and packs the k
    winners into one sorted array, the only collect_list and it is
    ≤ k elements."""
    from pyspark.sql import Window

    d = values.select(
        F.col(group_col).alias("group"), hash32(F.col(value_col)).alias("h")
    ).distinct()
    w1 = Window.partitionBy("group", F.col("h") % salts).orderBy("h")
    s1 = (
        d.withColumn("_rn", F.row_number().over(w1))
        .filter(F.col("_rn") <= k)
        .select("group", "h")
    )
    w2 = Window.partitionBy("group").orderBy("h")
    s2 = (
        s1.withColumn("_rn", F.row_number().over(w2))
        .filter(F.col("_rn") <= k)
        .select("group", "h")
    )
    return s2.groupBy("group").agg(F.array_sort(F.collect_list("h")).alias("hs"))


def kmv_distinct(
    values: DataFrame,
    group_col: str,
    value_col: str,
    k: int = 256,
    salts: int = 64,
) -> DataFrame:
    """(group, n_kept, kth_hash, kmv_est): KMV distinct-count
    estimate (k−1)·2³²/h_k — exact count when the group holds fewer
    than k distinct values (the sketch IS the value set then;
    kth_hash reports −1). One IEEE division of exact integer-valued
    doubles (scale constant Python-computed) — engine bit-exact."""
    kmv = kmv_min_k(values, group_col, value_col, k=k, salts=salts)
    size = F.size("hs")
    scale = float((k - 1) * (1 << 32))
    kth = F.when(size >= k, F.element_at("hs", k)).otherwise(F.lit(-1)).cast("bigint")
    est = F.when(
        size >= k, F.lit(scale) / F.element_at("hs", k).cast("double")
    ).otherwise(size.cast("double"))
    return kmv.select(
        "group",
        size.cast("int").alias("n_kept"),
        kth.alias("kth_hash"),
        est.alias("kmv_est"),
    )


def kmv_overlap(
    values: DataFrame,
    group_col: str,
    value_col: str,
    ga,
    gb,
    k: int = 256,
    salts: int = 64,
) -> DataFrame:
    """One row: (inter_common, k_union, jaccard_est, union_est,
    inter_est) for two groups — the KMV set-operation payoff: merge
    the two bottom-k sketches, keep the k smallest of the union, count
    how many of those appear in BOTH sketches (c), and estimate
    Jaccard = c/k', |A∪B| from the union's kth hash, and |A∩B| as
    their product. Fixed two-op IEEE chain (divide, then multiply) —
    engine bit-exact. The 1×1 cross join attaches two one-row sketch
    aggregates — constant-size build sides at any corpus scale."""
    kmv = kmv_min_k(
        values.filter(F.col(group_col).isin([ga, gb])), group_col, value_col,
        k=k, salts=salts,
    )
    a = kmv.filter(F.col("group") == ga).select(F.col("hs").alias("a_hs"))
    b = kmv.filter(F.col("group") == gb).select(F.col("hs").alias("b_hs"))
    u = F.slice(
        F.array_sort(F.array_distinct(F.concat(F.col("a_hs"), F.col("b_hs")))), 1, k
    )
    scale = float((k - 1) * (1 << 32))
    j = a.crossJoin(b).select("a_hs", "b_hs", u.alias("u"))
    kp = F.size("u")
    c = F.size(F.array_intersect(F.array_intersect(F.col("u"), F.col("a_hs")), F.col("b_hs")))
    union_est = F.when(
        kp >= k, F.lit(scale) / F.element_at("u", k).cast("double")
    ).otherwise(kp.cast("double"))
    jac = c.cast("double") / kp.cast("double")
    return j.select(
        c.cast("int").alias("inter_common"),
        kp.cast("int").alias("k_union"),
        jac.alias("jaccard_est"),
        union_est.alias("union_est"),
        (jac * union_est).alias("inter_est"),
    )
