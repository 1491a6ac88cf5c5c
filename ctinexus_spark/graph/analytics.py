"""Graph analytics over edge tables (beyond connectivity).

Triangle counting via degree-ordered orientation — the standard
scalable MapReduce formulation (orient every undirected edge from the
lower (degree, id) endpoint to the higher; enumerate each triangle
exactly once as an oriented 2-path plus its closing edge). The
orientation bounds per-vertex out-degree by O(sqrt(m)) on any graph,
so the 2-path join's fan-out is arboricity-bounded instead of
hot-vertex-quadratic — a star vertex with degree 10^6 contributes
ZERO oriented 2-paths unless its neighbors are themselves high-degree.

All equi-joins and aggregations; rank comparisons are explicit
lexicographic booleans so the DuckDB oracle reproduces them exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ctinexus_spark.partitioning import barrier

CHECKPOINT_EVERY = 3


def _oriented_triangles(und: DataFrame) -> DataFrame:
    """und: CANONICAL distinct undirected edges (u < v, no self
    loops) → one row (s, t1, t2) per triangle, found exactly once via
    degree-ordered orientation (arboricity-bounded 2-path join)."""
    deg = (
        und.select(F.col("u").alias("x"))
        .unionByName(und.select(F.col("v").alias("x")))
        .groupBy("x")
        .agg(F.count("*").alias("d"))
    )
    w = und.join(
        deg.select(F.col("x").alias("u"), F.col("d").alias("du")), "u"
    ).join(deg.select(F.col("x").alias("v"), F.col("d").alias("dv")), "v")
    u_first = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
    )
    # oriented edge s→t with rank(s) < rank(t); carry t's rank for the
    # 2-path ordering below
    o = (
        w.filter(u_first).select(
            F.col("u").alias("s"), F.col("v").alias("t"), F.col("dv").alias("dt")
        )
    ).unionByName(
        w.filter(~u_first).select(
            F.col("v").alias("s"), F.col("u").alias("t"), F.col("du").alias("dt")
        )
    )
    p1 = o.select("s", F.col("t").alias("t1"), F.col("dt").alias("d1"))
    p2 = o.select("s", F.col("t").alias("t2"), F.col("dt").alias("d2"))
    t1_first = (F.col("d1") < F.col("d2")) | (
        (F.col("d1") == F.col("d2")) & (F.col("t1") < F.col("t2"))
    )
    paths = p1.join(p2, "s").filter(t1_first)
    # rank(t1) < rank(t2) ⇒ the closing edge, if present, is oriented
    # t1→t2 — one equi-join probe per 2-path, each triangle found once
    return paths.join(
        o.select(F.col("s").alias("t1"), F.col("t").alias("t2")), ["t1", "t2"]
    ).select("s", "t1", "t2")


def triangle_counts(edges: DataFrame, src: str = "src", dst: str = "dst") -> DataFrame:
    """edges(src, dst) (directions/duplicates/self-loops ignored) →
    (vertex, n_triangles) for every vertex in ≥1 triangle."""
    e = edges.select(F.col(src).alias("a"), F.col(dst).alias("b")).filter(
        F.col("a") != F.col("b")
    )
    und = e.select(
        F.least("a", "b").alias("u"), F.greatest("a", "b").alias("v")
    ).distinct()
    tri = _oriented_triangles(und)
    verts = (
        tri.select(F.col("s").alias("vertex"))
        .unionByName(tri.select(F.col("t1").alias("vertex")))
        .unionByName(tri.select(F.col("t2").alias("vertex")))
    )
    return verts.groupBy("vertex").agg(F.count("*").cast("bigint").alias("n_triangles"))


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    damping: float = 0.85,
    iterations: int = 10,
) -> DataFrame:
    """edges(src, dst) directed (duplicates collapsed) → (vertex, rank)
    with sum(rank) = 1 — the link-authority score a web-corpus pipeline
    ranks domains/pages with (and the KG analogue ranks entities with).

    Fixed iteration count: one equi-join on src + one partial-
    aggregated groupBy(dst) per round — the textbook scale shape, no
    driver-side per-vertex state. Dangling mass (vertices with no
    out-edges) is a one-row scalar aggregate per round, redistributed
    uniformly. Lineage is truncated via barrier() every
    CHECKPOINT_EVERY rounds — without it the plan doubles per
    iteration. Ranks are float shuffle-sums, so last-ulp bits vary with
    partition order: no SQL-oracle twin (rows-only contract check);
    tests assert analytic values to 1e-9.
    """
    # ONE prologue materialization (optimization round 6): the
    # weighted edge table — real edges with weight 1/outdeg PLUS one
    # zero-weight self-loop per vertex — is barriered in a single job;
    # the deduped edge set's exchange is referenced by outd, the join
    # and both vertex-union arms inside that one plan, so exchange
    # reuse computes it once. The self-loop rows serve three duties:
    # (a) every vertex appears as a groupBy(t) target each round
    #     (contributing rank·0.0 = exact 0.0), so the per-round
    #     "verts LEFT JOIN contribs" re-attach disappears;
    # (b) the vertex set IS the w=0.0 slice of the checkpointed table
    #     (no real edge can carry weight 0), so the former separate
    #     verts persist + count jobs collapse into one cheap count
    #     over the checkpoint;
    # (c) |w| grows by |V| ≤ 2·|E| rows, all weight-0.
    e = edges.select(F.col(src).alias("s"), F.col(dst).alias("t")).filter(
        F.col("s").isNotNull() & F.col("t").isNotNull()
    ).distinct()
    verts_all = (
        e.select(F.col("s").alias("vertex"))
        .unionByName(e.select(F.col("t").alias("vertex")))
        .distinct()
    )
    outd = e.groupBy("s").agg(F.count("*").cast("double").alias("outd"))
    w = barrier(
        e.join(outd, "s")
        .select("s", "t", (F.lit(1.0) / F.col("outd")).alias("w"))
        .unionByName(
            verts_all.select(
                F.col("vertex").alias("s"),
                F.col("vertex").alias("t"),
                F.lit(0.0).alias("w"),
            )
        )
    )
    verts = w.filter(F.col("w") == 0.0).select(F.col("s").alias("vertex"))
    n = verts.count()
    if n == 0:
        return barrier(verts.withColumn("rank", F.lit(0.0)))
    ranks = verts.withColumn("rank", F.lit(1.0 / n))
    base = (1.0 - damping) / n
    for it in range(iterations):
        contribs = (
            w.join(ranks.select(F.col("vertex").alias("s"), "rank"), "s")
            .groupBy(F.col("t").alias("vertex"))
            .agg(F.sum(F.col("rank") * F.col("w")).alias("contrib"))
        )
        # Dangling mass via conservation (optimization round 6): every
        # round preserves Σ rank = 1 and Σ contribs = Σ rank over
        # NON-dangling vertices, so dang = 1 − Σ contribs. The earlier
        # ranks ⟕ outd anti-join referenced the lazy `ranks` lineage a
        # SECOND time per round, doubling the recompute between
        # barriers (the connected_components check_every>2 trap, same
        # mechanism); contribs sits behind its own shuffle, so this
        # second reference is deduplicated by exchange reuse and the
        # lineage stays LINEAR in rounds. Float difference vs the
        # summed-dangling form is last-ulp accumulation (~1e-15 over 5
        # rounds) — pagerank() is the unpinned throughput variant
        # (rows-only contract; 1e-9 analytic tests); the oracle-pinned
        # pagerank_pinned keeps the explicit dangling fold.
        dangling = contribs.agg(
            (F.lit(1.0) - F.coalesce(F.sum("contrib"), F.lit(0.0))).alias("_dang")
        )
        # contribs already covers EVERY vertex (self-loop rows), so the
        # new ranks are a projection of it — no verts re-attach join
        ranks = contribs.crossJoin(F.broadcast(dangling)).select(
            "vertex",
            (
                F.lit(base)
                + F.lit(damping)
                * (F.col("contrib") + F.col("_dang") / F.lit(float(n)))
            ).alias("rank"),
        )
        if (it + 1) % CHECKPOINT_EVERY == 0 and it + 1 < iterations:
            ranks = barrier(ranks)
    # materialize the tail rounds once so a returned lazy plan does not
    # recompute them per caller action
    return barrier(ranks)


def pagerank_pinned(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    damping: float = 0.85,
    iterations: int = 5,
    seeds: list | None = None,
) -> DataFrame:
    """pagerank() with every floating-point reduction pinned to a
    deterministic order, making the ranks BIT-EXACT across runs,
    partitionings, and engines — the oracle-grade twin of pagerank().

    Identical algebra per round (contrib sum per target, dangling mass
    redistributed uniformly, base + damping fold), but the two float
    sums are left-folds over explicitly sorted lists instead of
    shuffle-order aggregates: per-target contributions fold in source
    order (F.aggregate over array_sort(collect_list(struct(s, c)))),
    and the dangling mass folds in vertex order. DuckDB's
    list_sum(list(x ORDER BY k)) is the same strict left fold
    (token_pmi / pq_adc precedent), so an unrolled-SQL twin
    hash-matches at full double precision — no rounding column needed.

    seeds=[...] switches to PERSONALIZED PageRank: the restart vector
    p is uniform over the seed set instead of over all vertices
    (init = p; per round rank = (1−d)·p + d·(contrib + dang·p)), so
    ranks measure proximity to the seeds — the "entities related to X"
    relevance query on a KG. The uniform path is untouched
    (seeds=None reproduces the original expressions byte-for-byte).

    Cost: collect_list materializes each target's in-edge list in one
    group (bounded by max in-degree) — fine for oracle runs and still
    shuffle-parallel, but the unpinned pagerank() is the throughput
    path (bench's graph_pagerank entry).
    """
    e = (
        edges.select(F.col(src).alias("s"), F.col(dst).alias("t"))
        .filter(F.col("s").isNotNull() & F.col("t").isNotNull())
        .distinct()
    )
    verts = (
        e.select(F.col("s").alias("vertex"))
        .unionByName(e.select(F.col("t").alias("vertex")))
        .distinct()
        .persist()
    )
    n = verts.count()
    if n == 0:
        out = barrier(verts.withColumn("rank", F.lit(0.0)))
        verts.unpersist()
        return out
    outd = e.groupBy("s").agg(F.count("*").cast("double").alias("outd"))
    w = barrier(
        e.join(outd, "s").select("s", "t", (F.lit(1.0) / F.col("outd")).alias("w"))
    )
    personalized = seeds is not None
    if personalized:
        if not seeds:
            raise ValueError("personalized pagerank requires a non-empty seed set")
        # a seed set disjoint from the vertex universe makes the
        # restart vector all-zero — every rank silently collapses to
        # 0.0; fail loudly instead (one cheap action on the persisted
        # vertex set)
        if verts.filter(F.col("vertex").isin(list(seeds))).count() == 0:
            verts.unpersist()
            raise ValueError("no seed appears in the graph's vertex set")
        p_val = 1.0 / len(set(seeds))
        pv = F.when(F.col("vertex").isin(list(seeds)), F.lit(p_val)).otherwise(
            F.lit(0.0)
        )
        ranks = verts.withColumn("rank", pv)
    else:
        ranks = verts.withColumn("rank", F.lit(1.0 / n))
    base = (1.0 - damping) / n
    one_minus_d = 1.0 - damping
    ordered_fold = lambda pairs, field: F.aggregate(  # noqa: E731
        F.array_sort(pairs), F.lit(0.0), lambda acc, x: acc + x[field]
    )
    for it in range(iterations):
        contribs = (
            w.join(ranks.select(F.col("vertex").alias("s"), "rank"), "s")
            .select("t", "s", (F.col("rank") * F.col("w")).alias("c"))
            .groupBy(F.col("t").alias("vertex"))
            .agg(ordered_fold(F.collect_list(F.struct("s", "c")), "c").alias("contrib"))
        )
        dangling = (
            ranks.join(outd.select(F.col("s").alias("vertex")), "vertex", "left_anti")
            .agg(
                F.coalesce(
                    ordered_fold(F.collect_list(F.struct("vertex", "rank")), "rank"),
                    F.lit(0.0),
                ).alias("_dang")
            )
        )
        if personalized:
            new_rank = F.lit(one_minus_d) * pv + F.lit(damping) * (
                F.coalesce(F.col("contrib"), F.lit(0.0)) + F.col("_dang") * pv
            )
        else:
            new_rank = F.lit(base) + F.lit(damping) * (
                F.coalesce(F.col("contrib"), F.lit(0.0))
                + F.col("_dang") / F.lit(float(n))
            )
        ranks = (
            verts.join(contribs, "vertex", "left")
            .crossJoin(F.broadcast(dangling))
            .select("vertex", new_rank.alias("rank"))
        )
        if (it + 1) % CHECKPOINT_EVERY == 0 and it + 1 < iterations:
            ranks = barrier(ranks)
    ranks = barrier(ranks)
    verts.unpersist()
    return ranks


def k_core(
    edges: DataFrame,
    k: int,
    src: str = "src",
    dst: str = "dst",
    max_iterations: int = 100,
) -> DataFrame:
    """edges(src, dst) undirected (directions/duplicates/self-loops
    collapsed) → (vertex, degree) for the k-core: the maximal subgraph
    where every vertex keeps degree ≥ k — the standard dense-cluster /
    spam-farm extraction on link graphs.

    Iterative peel: degrees are a partial-aggregated groupBy, removal
    is a broadcast-friendly anti-join of edges against the below-k
    vertex set, repeated to fixpoint. Each round strictly shrinks the
    edge set; lineage truncated via barrier() every CHECKPOINT_EVERY
    rounds. Integer output — deterministic. Raises RuntimeError if the
    peel does not converge within max_iterations (components.py
    precedent: never silently return a wrong core).
    """
    e = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .filter(F.col("a") != F.col("b"))
        .select(F.least("a", "b").alias("u"), F.greatest("a", "b").alias("v"))
        .distinct()
    )
    cur = barrier(e)
    pinned: list[DataFrame] = []
    for it in range(max_iterations):
        # persist deg: it feeds the convergence count, BOTH anti-joins
        # of the next round's edge set, and (on the last round) the
        # result — unpersisted it would recompute the whole span since
        # the previous barrier up to three times per round
        deg = (
            cur.select(F.col("u").alias("x"))
            .unionByName(cur.select(F.col("v").alias("x")))
            .groupBy("x")
            .agg(F.count("*").cast("bigint").alias("d"))
            .persist()
        )
        pinned.append(deg)
        low = deg.filter(F.col("d") < k).select("x")
        n_low = low.count()  # materializes deg
        if n_low == 0:
            result = barrier(
                deg.select(F.col("x").alias("vertex"), F.col("d").alias("degree"))
            )
            for p in pinned:
                p.unpersist()
            return result
        cur = (
            cur.join(low.select(F.col("x").alias("u")), "u", "left_anti")
            .join(low.select(F.col("x").alias("v")), "v", "left_anti")
        )
        if (it + 1) % CHECKPOINT_EVERY == 0:
            cur = barrier(cur)  # materializes through the pinned degs
            for p in pinned:
                p.unpersist()
            pinned = []
    for p in pinned:
        p.unpersist()
    raise RuntimeError(
        f"k_core did not converge within {max_iterations} peel rounds"
    )


def label_propagation(
    edges: DataFrame,
    rounds: int = 4,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """(vertex, label): synchronous label-propagation community
    detection, deterministic variant — every vertex starts as its own
    label; each round it adopts the most frequent label among its
    NEIGHBORS (self-vote excluded), ties broken by the smallest
    label. Fixed `rounds` iterations, no convergence action: the
    round count is part of the semantics, so there are ZERO driver
    syncs in the whole query (unlike connected_components, whose
    convergence check is a per-round action) and the DuckDB oracle is
    the same recurrence unrolled.

    Integer/string-only arithmetic: the vote argmax is
    min(struct(-count, label)) — lexicographic struct min on both
    engines (the line_dedup winner pattern) — so results hash-match
    bit-for-bit.

    Scale shape per round: one equi-join (neighbor label lookup,
    shuffle on vertex id) + two partial-combined aggregations; the
    labels frame is referenced ONCE per round, so lineage grows
    linearly (no 2^k recompute — the connected_components
    check_every>2 trap does not apply). Dense communities collapse
    their vote traffic map-side because (v, label) pairs partial-
    aggregate before the shuffle. Duplicate edges act as vote
    weights; pass a distinct edge table for unweighted semantics.
    """
    e = edges.select(F.col(src).alias("a"), F.col(dst).alias("b")).filter(
        F.col("a") != F.col("b")
    )
    # und is referenced in EVERY round — barrier it once or each round
    # re-scans (and re-shuffles) the upstream edge derivation (the
    # pagerank weighted-edge pattern). Pre-partition AND pre-sort it on
    # the round-join key `b` before the barrier (optimization round 6,
    # guide §2.4): localCheckpoint preserves partitioning and ordering,
    # so when the planner picks a sort-merge join for a round, the big
    # static side needs neither exchange nor sort — only the (small)
    # per-round labels side moves. One shuffle now instead of one per
    # round at scale; when AQE broadcasts the labels side instead, the
    # layout is simply inherited at zero cost.
    und = barrier(
        e.unionByName(e.select(F.col("b").alias("a"), F.col("a").alias("b")))
        .repartition(F.col("b"))
        .sortWithinPartitions("b")
    )
    labels = (
        und.select(F.col("a").alias("v"))
        .distinct()
        .select("v", F.col("v").alias("label"))
    )
    for r in range(rounds):
        votes = (
            und.join(labels.withColumnRenamed("v", "b"), "b")
            .groupBy(F.col("a").alias("v"), "label")
            .agg(F.count("*").cast("bigint").alias("cnt"))
        )
        labels = (
            votes.groupBy("v")
            .agg(
                F.min(
                    F.struct((-F.col("cnt")).alias("nc"), F.col("label").alias("lb"))
                ).alias("w")
            )
            .select("v", F.col("w.lb").alias("label"))
        )
        if (r + 1) % CHECKPOINT_EVERY == 0 and r + 1 < rounds:
            labels = barrier(labels)  # bound linear lineage on long runs
    return labels.select(F.col("v").alias("vertex"), "label")


def bfs_distances(
    edges: DataFrame,
    seeds: list,
    hops: int,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """(vertex, dist): minimum hop count from any seed over the
    undirected graph, bounded by `hops` — the k-hop neighborhood /
    reachability primitive (reference users ask "everything within N
    hops of this entity"; same shape as blast-radius queries on a KG).
    Seeds always appear with dist 0, connected or not.

    Frontier-expansion BFS with a FIXED hop budget (the hop bound is
    part of the semantics, like label_propagation's round count).
    Per round: one equi-join of the current frontier against the
    doubled edge table (shuffle keyed on vertex id), a distinct, and
    one anti-join against the visited set — all partial-aggregated
    equi-joins, no driver-side vertex state, so the round cost is
    O(frontier-adjacent edges / cluster) at any graph size. The edge
    table is barriered ONCE before the loop (the iterative-op rule:
    lazy re-derivation re-scans the source every round); each round's
    frontier is barriered so round r+1 reads a materialized frontier
    instead of recursing through r rounds of lineage.

    Integer/string-only output — deterministic; the DuckDB twin is a
    WITH RECURSIVE walk with UNION (distinct) semantics + min(dist).
    """
    from pyspark.sql import types as T

    spark = edges.sparkSession
    e = edges.select(F.col(src).alias("a"), F.col(dst).alias("b")).filter(
        F.col("a") != F.col("b")
    )
    und = barrier(
        e.unionByName(e.select(F.col("b").alias("a"), F.col("a").alias("b"))).distinct()
    )
    vertex_type = und.schema["a"].dataType
    seed_df = spark.createDataFrame(
        [(s,) for s in seeds],
        T.StructType([T.StructField("vertex", vertex_type, False)]),
    ).distinct()
    visited = barrier(seed_df.withColumn("dist", F.lit(0).cast("int")))
    frontier = visited.select("vertex")
    for h in range(1, hops + 1):
        nxt = barrier(
            frontier.withColumnRenamed("vertex", "a")
            .join(und, "a")
            .select(F.col("b").alias("vertex"))
            .distinct()
            .join(visited.select("vertex"), "vertex", "left_anti")
            .withColumn("dist", F.lit(h).cast("int"))
        )
        # the barrier just materialized nxt, so this count is a cheap
        # metadata read — exhausted BFS (frontier empty) exits instead
        # of paying the per-round barrier floor for dead rounds
        if nxt.count() == 0:
            break
        visited = visited.unionByName(nxt)
        frontier = nxt.select("vertex")
    return visited


def clustering_coefficient(
    edges: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """(vertex, degree, n_triangles, clustering) for every vertex with
    degree ≥ 2: clustering = 2·T(v) / (d(v)·(d(v)−1)) — the local
    transitivity score that separates organic communities (high) from
    spam link farms / hub pages (near zero) on web graphs.

    Triangles come from the degree-ordered-orientation counter above
    (arboricity-bounded, hot stars contribute zero 2-paths); degrees
    are one partial-aggregated groupBy. The canonical undirected edge
    set is barriered once and feeds both (triangle_counts would
    otherwise re-derive its own distinct — one extra shuffle, and two
    scans of the raw edge source).

    Bit-exact across engines: 2·T and d·(d−1) are exact integer-valued
    operands; `clustering` is a single IEEE division of their double
    casts (the token_pmi fixed-chain pattern), so the float column
    hash-matches DuckDB's CAST(... AS DOUBLE)/CAST(... AS DOUBLE).
    """
    e = edges.select(F.col(src).alias("a"), F.col(dst).alias("b")).filter(
        F.col("a") != F.col("b")
    )
    und = barrier(
        e.select(F.least("a", "b").alias("u"), F.greatest("a", "b").alias("v")).distinct()
    )
    deg = (
        und.select(F.col("u").alias("x"))
        .unionByName(und.select(F.col("v").alias("x")))
        .groupBy("x")
        .agg(F.count("*").cast("bigint").alias("d"))
    )
    tri = triangle_counts(und, src="u", dst="v")
    return (
        deg.filter(F.col("d") >= 2)
        .select(F.col("x").alias("vertex"), F.col("d").alias("degree"))
        .join(tri, "vertex", "left")
        .select(
            "vertex",
            "degree",
            F.coalesce(F.col("n_triangles"), F.lit(0).cast("bigint")).alias(
                "n_triangles"
            ),
            (
                (
                    F.coalesce(F.col("n_triangles"), F.lit(0).cast("bigint")) * 2
                ).cast("double")
                / (F.col("degree") * (F.col("degree") - 1)).cast("double")
            ).alias("clustering"),
        )
    )


def k_truss(
    edges: DataFrame,
    k: int,
    src: str = "src",
    dst: str = "dst",
    max_iterations: int = 50,
) -> DataFrame:
    """(u, v, support): the k-truss — the maximal subgraph in which
    every edge sits in ≥ k−2 triangles — the edge-level cohesion
    extraction that is strictly stronger than the (k−1)-core (a truss
    edge needs k−2 COMMON neighbors, not just degrees). The classic
    community-core / spam-clique separator on co-occurrence graphs.

    Iterative peel, k_core's shape one level up: per round, enumerate
    triangles over the surviving edges with the degree-ordered
    orientation (_oriented_triangles — arboricity-bounded, hot stars
    contribute zero 2-paths), explode each triangle to its three
    canonical edges, partial-aggregate per-edge support, and keep
    edges with support ≥ k−2 (edges in no triangle drop for k ≥ 3 —
    absent from the support table IS support 0). One driver
    convergence count per round (the survivor count doubles as the
    next round's size — no second action); each round's edge set is
    barriered because the orientation references it several times.
    Integer output, deterministic; the DuckDB twin re-derives supports
    per WITH RECURSIVE step over the working edge table. Raises on
    non-convergence (components.py precedent).
    """
    if k < 3:
        # support >= k-2 <= 0 holds for EVERY edge, but triangle-free
        # edges are absent from the exploded support table and would be
        # silently dropped — the <=2-truss is the whole graph, which
        # this peel cannot represent. Refuse instead of returning a
        # wrong subgraph.
        raise ValueError(f"k_truss requires k >= 3 (got k={k})")
    cur = barrier(
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .filter(F.col("a") != F.col("b"))
        .select(F.least("a", "b").alias("u"), F.greatest("a", "b").alias("v"))
        .distinct()
    )
    n_cur = cur.count()
    thresh = k - 2
    for _ in range(max_iterations):
        tri = _oriented_triangles(cur)
        e3 = (
            tri.select(
                F.least("s", "t1").alias("u"), F.greatest("s", "t1").alias("v")
            )
            .unionByName(
                tri.select(
                    F.least("s", "t2").alias("u"), F.greatest("s", "t2").alias("v")
                )
            )
            .unionByName(
                tri.select(
                    F.least("t1", "t2").alias("u"), F.greatest("t1", "t2").alias("v")
                )
            )
        )
        surv = barrier(
            e3.groupBy("u", "v")
            .agg(F.count("*").cast("bigint").alias("support"))
            .filter(F.col("support") >= thresh)
        )
        n_surv = surv.count()
        if n_surv == n_cur:
            return surv
        cur = surv.select("u", "v")
        n_cur = n_surv
    raise RuntimeError(
        f"k_truss did not converge within {max_iterations} peel rounds"
    )


def link_prediction(
    edges: DataFrame,
    min_common: int = 2,
    max_degree: int | None = None,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Common-neighbor link prediction: for every NON-adjacent vertex
    pair with >= min_common shared neighbors, (a, b, n_common, deg_a,
    deg_b, jaccard) where jaccard = |Γa∩Γb| / |Γa∪Γb| — the classic
    unsupervised who-should-be-connected score (recommendations,
    KG completion, record-linkage blocking).

    Dataflow: wedge enumeration (und ⋈ und on the center vertex) →
    partial-agg count per endpoint pair → LEFT ANTI join against the
    canonical edge set → degree attach. Every stage is an equi-join /
    partial agg. The wedge join is inherently Σd(v)² — the wedge count
    IS the signal, so unlike triangle counting it cannot be oriented
    away; `max_degree` drops super-hub centers first (a hub's wedges
    carry no information — it connects everything to everything, and
    at web scale it is also the skew bomb), the standard LP mitigation.

    jaccard is one IEEE division of exact integer-valued doubles
    (|Γa∪Γb| = deg_a + deg_b − n_common) — engine bit-exact.
    """
    e = edges.select(F.col(src).alias("a"), F.col(dst).alias("b")).filter(
        F.col("a") != F.col("b")
    )
    canon = e.select(
        F.least("a", "b").alias("u"), F.greatest("a", "b").alias("v")
    ).distinct()
    und = canon.select(F.col("u").alias("x"), F.col("v").alias("y")).unionByName(
        canon.select(F.col("v").alias("x"), F.col("u").alias("y"))
    )
    deg = und.groupBy("x").agg(F.count("*").cast("bigint").alias("d"))
    if max_degree is not None:
        centers = deg.filter(F.col("d") <= max_degree).select(
            F.col("x").alias("c")
        )
        wedge_src = und.join(centers, und["y"] == centers["c"]).select("x", "y")
    else:
        wedge_src = und
    und_b = barrier(wedge_src)
    wedges = (
        und_b.select(F.col("y").alias("c"), F.col("x").alias("u"))
        .join(und_b.select(F.col("y").alias("c"), F.col("x").alias("v")), "c")
        .filter(F.col("u") < F.col("v"))
        .groupBy("u", "v")
        .agg(F.count("*").cast("bigint").alias("n_common"))
        .filter(F.col("n_common") >= min_common)
    )
    open_pairs = wedges.join(canon, ["u", "v"], "left_anti")
    da = deg.select(F.col("x").alias("u"), F.col("d").alias("deg_a"))
    db = deg.select(F.col("x").alias("v"), F.col("d").alias("deg_b"))
    return (
        open_pairs.join(da, "u")
        .join(db, "v")
        .select(
            F.col("u").alias("a"),
            F.col("v").alias("b"),
            "n_common",
            "deg_a",
            "deg_b",
            (
                F.col("n_common").cast("double")
                / (F.col("deg_a") + F.col("deg_b") - F.col("n_common")).cast("double")
            ).alias("jaccard"),
        )
    )


def sssp(
    edges: DataFrame,
    seeds: list,
    max_hops: int,
    src: str = "src",
    dst: str = "dst",
    weight: str = "weight",
) -> DataFrame:
    """Bounded-hop weighted shortest paths (Bellman-Ford rounds):
    (vertex, dist) = the minimum total edge weight over undirected
    paths of <= max_hops hops from any seed — cheapest-route /
    proximity queries on weighted graphs (the additive-cost sibling of
    bfs_distances' hop counts).

    Each round relaxes EVERY labeled vertex through one more edge:
    dist_{r} = min(dist_{r-1}, min over edges (dist_{r-1}(u) + w)) —
    one equi-join + one partial-agg min per round, no driver-side
    vertex state; the doubled edge table is barriered once before the
    loop (lazy per-round re-derivation re-scans the source every
    round — the LPA/pagerank precedent) and each round's frontier is
    barriered (it feeds the next round twice: union + join).

    The fixed round count is the oracle contract (same recurrence
    unrolled in SQL); weights must be integers for cross-engine
    bit-exactness — sums stay BIGINT, no float accumulation. Unlike
    the priority-queue Dijkstra this has no sequential bottleneck:
    every round is a bulk relaxation, the textbook BSP formulation.
    """
    if max_hops < 1:
        raise ValueError("max_hops must be >= 1")
    if not seeds:
        raise ValueError("sssp needs at least one seed")
    e = edges.select(
        F.col(src).alias("a"), F.col(dst).alias("b"), F.col(weight).cast("bigint").alias("w")
    ).filter(F.col("a") != F.col("b"))
    und = barrier(
        e.select(F.col("a").alias("x"), F.col("b").alias("y"), "w").unionByName(
            e.select(F.col("b").alias("x"), F.col("a").alias("y"), "w")
        )
    )
    spark = edges.sparkSession
    dist = spark.createDataFrame(
        [(s, 0) for s in seeds], ["v", "dist"]
    ).select("v", F.col("dist").cast("bigint").alias("dist"))
    # seeds must exist in the graph — a typo'd seed would silently
    # report only itself at dist 0
    present = und.select(F.col("x").alias("v")).distinct().join(
        dist.select("v"), "v"
    ).count()
    if present < len(set(seeds)):
        raise ValueError("some seeds are not vertices of the edge set")
    for _ in range(max_hops):
        relaxed = (
            dist.join(und, dist["v"] == und["x"])
            .select(F.col("y").alias("v"), (F.col("dist") + F.col("w")).alias("dist"))
        )
        dist = barrier(
            dist.unionByName(relaxed).groupBy("v").agg(F.min("dist").alias("dist"))
        )
    return dist.select("v", "dist")


def random_walks(
    edges: DataFrame,
    walks_per_vertex: int = 2,
    length: int = 4,
    seed: int = 7,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Deterministic uniform random walks — the DeepWalk/node2vec
    corpus generator: `walks_per_vertex` walks of `length` steps from
    every vertex, where step t moves to
        neighbors(v)[ hash32(f"{seed}|{start}|{walk}|{t}|{v}") mod deg(v) ]
    with neighbors indexed 0..d−1 in ascending order. Hash-driven, not
    RNG-driven: walks are reproducible across runs, partitionings and
    engines (hash32 = first 8 md5 hex chars, the sketches.py idiom),
    which makes the sampled corpus itself testable — the DuckDB twin
    replays identical walks.

    Dataflow: the indexed adjacency (row_number over per-vertex sorted
    neighbors) and degree table are built once and barriered; each
    step is one equi-join on the current vertex + one equi-join on
    (vertex, picked index) — no driver state, no RNG sync. Walk count
    scales with vertices, step count is the fixed `length`: the
    standard BSP walk-sampling shape.

    Output: (start, walk, step, vertex) for steps 0..length.
    """
    if length < 1 or walks_per_vertex < 1:
        raise ValueError("length and walks_per_vertex must be >= 1")
    from ctinexus_spark.operators.sketches import hash32

    e = edges.select(F.col(src).alias("a"), F.col(dst).alias("b")).filter(
        F.col("a") != F.col("b")
    )
    canon = e.select(
        F.least("a", "b").alias("u"), F.greatest("a", "b").alias("v")
    ).distinct()
    # und feeds THREE consumers (adj, deg, starts) — barrier the
    # branch point so the edge distinct isn't re-derived per consumer
    und = barrier(
        canon.select(F.col("u").alias("x"), F.col("v").alias("y")).unionByName(
            canon.select(F.col("v").alias("x"), F.col("u").alias("y"))
        )
    )
    from pyspark.sql import Window

    adj = barrier(
        und.withColumn(
            "idx",
            (F.row_number().over(Window.partitionBy("x").orderBy("y")) - 1).cast(
                "bigint"
            ),
        )
    )
    deg = barrier(und.groupBy("x").agg(F.count("*").cast("bigint").alias("d")))
    cur = (
        und.select(F.col("x").alias("start"))
        .distinct()
        .select(
            "start",
            F.explode(
                F.sequence(
                    F.lit(0).cast("bigint"), F.lit(walks_per_vertex - 1).cast("bigint")
                )
            ).alias("walk"),
        )
        .select("start", "walk", F.col("start").alias("vertex"))
    )
    frames = [cur.select("start", "walk", F.lit(0).cast("int").alias("step"), "vertex")]
    for t in range(1, length + 1):
        key = F.concat_ws(
            "|",
            F.lit(str(seed)),
            F.col("start"),
            F.col("walk"),
            F.lit(str(t)),
            F.col("vertex"),
        )
        picked = (
            cur.join(deg, cur["vertex"] == deg["x"])
            .select("start", "walk", "vertex", (hash32(key) % F.col("d")).alias("pick"))
        )
        cur = barrier(
            picked.join(
                adj,
                (picked["vertex"] == adj["x"]) & (picked["pick"] == adj["idx"]),
            ).select("start", "walk", F.col("y").alias("vertex"))
        )
        frames.append(
            cur.select("start", "walk", F.lit(t).cast("int").alias("step"), "vertex")
        )
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f)
    return out
