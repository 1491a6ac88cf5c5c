"""Distributed connected components, skew-safe aggregation, and the
synthetic skewed-corpus generator (incl. end-to-end CTI-mode run)."""

import pytest

from pyspark.sql import functions as F

from ctinexus_spark.config import PipelineConfig
from ctinexus_spark.datagen import synthesize_documents
from ctinexus_spark.graph.components import connected_components
from ctinexus_spark.model import StubModel
from ctinexus_spark.operators.fused import fused_kg
from ctinexus_spark.operators.normalize import normalize_documents
from ctinexus_spark.skew import salted_count, with_salt


class TestConnectedComponents:
    def test_two_components(self, spark):
        edges = spark.createDataFrame(
            [(1, 2), (2, 3), (10, 11)], "src bigint, dst bigint"
        )
        got = {r.vertex: r.component for r in connected_components(edges).collect()}
        assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}

    def test_chain_longer_than_checkpoint_interval(self, spark):
        # a 12-vertex path needs ~11 propagation rounds → exercises
        # the localCheckpoint lineage truncation
        edges = spark.createDataFrame(
            [(i, i + 1) for i in range(11)], "src bigint, dst bigint"
        )
        got = {r.vertex: r.component for r in connected_components(edges).collect()}
        assert set(got.values()) == {0}
        assert len(got) == 12

    def test_string_vertices(self, spark):
        edges = spark.createDataFrame(
            [("apt29", "cozy bear"), ("cozy bear", "the dukes"), ("akira", "akira_v2")],
            "src string, dst string",
        )
        got = {r.vertex: r.component for r in connected_components(edges).collect()}
        assert got["the dukes"] == "apt29"
        assert got["akira_v2"] == "akira"


class TestContraction:
    """contract_edges: the partition-local union-find pre-pass must be
    label-invisible — same (vertex, component) output with and without
    it, same vertex universe."""

    @pytest.mark.parametrize("seed", [3, 41, 97])
    def test_pre_contract_matches_raw_minlabel(self, spark, seed):
        import random

        rng = random.Random(seed)
        edges = [(rng.randrange(50), rng.randrange(50)) for _ in range(70)]
        df = spark.createDataFrame(edges, "src bigint, dst bigint")
        with_c = {r.vertex: r.component for r in connected_components(df).collect()}
        without = {
            r.vertex: r.component
            for r in connected_components(df, pre_contract=False).collect()
        }
        assert with_c == without and with_c

    def test_contract_preserves_selfloop_only_vertices(self, spark):
        from ctinexus_spark.graph.components import contract_edges

        df = spark.createDataFrame(
            [(1, 2), (7, 7)], "src bigint, dst bigint"
        )
        out = contract_edges(df).collect()
        nodes = {r.src for r in out}
        assert nodes == {1, 2, 7}
        roots = {r.src: r.dst for r in out}
        assert roots == {1: 1, 2: 1, 7: 7}

    def test_contract_star_bucket_single_round(self, spark):
        # the funnel shape: a hub with many satellites lands in ONE
        # partition (partitioned by src) and collapses to a min-rooted
        # star in the pre-pass
        from ctinexus_spark.graph.components import contract_edges

        df = spark.createDataFrame(
            [(0, i) for i in range(1, 40)], "src bigint, dst bigint"
        )
        out = contract_edges(df).collect()
        assert all(r.dst == 0 for r in out)
        assert {r.src for r in out} == set(range(40))

    def test_string_vertices_contracted(self, spark):
        edges = spark.createDataFrame(
            [("apt29", "cozy bear"), ("cozy bear", "the dukes")],
            "src string, dst string",
        )
        got = {r.vertex: r.component for r in connected_components(edges).collect()}
        assert got == {"apt29": "apt29", "cozy bear": "apt29", "the dukes": "apt29"}


class TestStarsComponents:
    """connected_components_stars: O(log² n) rounds regardless of
    diameter (Kiveris et al. large-star/small-star)."""

    @pytest.mark.parametrize("seed", [7, 23, 101])
    def test_matches_minlabel_on_random_graph(self, spark, seed):
        import random

        from ctinexus_spark.graph.components import connected_components_stars

        rng = random.Random(seed)
        edges = [(rng.randrange(60), rng.randrange(60)) for _ in range(80)]
        df = spark.createDataFrame(edges, "src bigint, dst bigint")
        a = {r.vertex: r.component for r in connected_components(df).collect()}
        b = {r.vertex: r.component for r in connected_components_stars(df).collect()}
        assert a == b and a

    def test_long_chain_beyond_minlabel_budget(self, spark):
        """A 121-vertex path: min-label needs ~120 rounds (raises at
        its 50-round budget); the star algorithm converges within its
        25-round default because folding is logarithmic in n."""
        import pytest

        from ctinexus_spark.graph.components import connected_components_stars

        edges = spark.createDataFrame(
            [(i, i + 1) for i in range(120)], "src bigint, dst bigint"
        )
        # pre_contract=False: raw min-label needs diameter rounds by
        # construction (with contraction the residual round count
        # depends on how hash partitioning scatters the path, which is
        # not what this test pins)
        with pytest.raises(RuntimeError, match="did not converge"):
            connected_components(edges, max_iterations=20, pre_contract=False)
        got = {r.vertex: r.component for r in connected_components_stars(edges).collect()}
        assert set(got.values()) == {0}
        assert len(got) == 121

    def test_string_vertices_and_self_loops(self, spark):
        from ctinexus_spark.graph.components import connected_components_stars

        edges = spark.createDataFrame(
            [("apt29", "cozy bear"), ("cozy bear", "the dukes"),
             ("akira", "akira_v2"), ("lone", "lone")],
            "src string, dst string",
        )
        got = {r.vertex: r.component for r in connected_components_stars(edges).collect()}
        assert got["the dukes"] == "apt29"
        assert got["akira_v2"] == "akira"
        assert got["lone"] == "lone"


class TestPageRank:
    def test_matches_numpy_power_iteration(self, spark):
        """Same damping, same iteration count, same dangling rule as a
        dense numpy power iteration — agreement to 1e-9 (the float
        shuffle-sum only moves last-ulp bits)."""
        import numpy as np

        from ctinexus_spark.graph.analytics import pagerank

        edges = [(0, 1), (0, 2), (1, 2), (2, 0), (3, 2)]  # 3 is a source, none dangling? no: all have out
        edges += [(2, 4)]  # 4 is dangling (no out-edges)
        df = spark.createDataFrame(edges, "src bigint, dst bigint")
        got = {r.vertex: r.rank for r in pagerank(df, iterations=10).collect()}

        n, d = 5, 0.85
        adj = {0: [1, 2], 1: [2], 2: [0, 4], 3: [2], 4: []}
        r = np.full(n, 1.0 / n)
        for _ in range(10):
            contrib = np.zeros(n)
            dangling = 0.0
            for s, outs in adj.items():
                if not outs:
                    dangling += r[s]
                for t in outs:
                    contrib[t] += r[s] / len(outs)
            r = (1 - d) / n + d * (contrib + dangling / n)
        for v in range(n):
            assert abs(got[v] - r[v]) < 1e-9, (v, got[v], r[v])
        # authority orders as expected: 2 has the most in-links
        assert max(got, key=got.get) == 2

    def test_empty_graph(self, spark):
        from ctinexus_spark.graph.analytics import pagerank

        df = spark.createDataFrame([], "src bigint, dst bigint")
        assert pagerank(df).count() == 0

    def test_pinned_matches_fast_path(self, spark):
        """pagerank_pinned (ordered left-folds — the oracle-grade
        variant the registry serves) agrees with the shuffle-sum
        pagerank to 1e-12 on every vertex: same algebra, only the
        float reduction order differs."""
        from ctinexus_spark.graph.analytics import pagerank, pagerank_pinned

        edges = [("a", "b"), ("a", "c"), ("b", "c"), ("c", "a"),
                 ("d", "c"), ("c", "e")]  # e dangles
        df = spark.createDataFrame(edges, "src string, dst string")
        fast = {r.vertex: r.rank for r in pagerank(df, iterations=5).collect()}
        pin = {r.vertex: r.rank for r in pagerank_pinned(df, iterations=5).collect()}
        assert set(fast) == set(pin)
        for v in fast:
            assert abs(fast[v] - pin[v]) < 1e-12, (v, fast[v], pin[v])

    def test_pinned_empty_graph(self, spark):
        from ctinexus_spark.graph.analytics import pagerank_pinned

        df = spark.createDataFrame([], "src string, dst string")
        assert pagerank_pinned(df).count() == 0


class TestKCore:
    def test_peels_to_dense_core(self, spark):
        from ctinexus_spark.graph.analytics import k_core

        # K4 clique + a pendant chain hanging off vertex 0
        k4 = [(a, b) for a in range(4) for b in range(4) if a < b]
        chain = [(0, 10), (10, 11), (11, 12)]
        df = spark.createDataFrame(k4 + chain, "src bigint, dst bigint")
        got = {r.vertex: r.degree for r in k_core(df, k=3).collect()}
        # 3-core = exactly the K4; every member has in-core degree 3
        assert got == {0: 3, 1: 3, 2: 3, 3: 3}
        # 2-core: chain still peels (endpoint degree 1 cascades)
        got2 = {r.vertex for r in k_core(df, k=2).collect()}
        assert got2 == {0, 1, 2, 3}

    def test_whole_graph_peels_away(self, spark):
        from ctinexus_spark.graph.analytics import k_core

        chain = spark.createDataFrame([(i, i + 1) for i in range(6)], "src bigint, dst bigint")
        assert k_core(chain, k=2).count() == 0

    def test_cascading_peel_rounds(self, spark):
        """A long chain attached to a triangle forces one peel round
        per chain link — exercises the iterative fixpoint + barrier."""
        from ctinexus_spark.graph.analytics import k_core

        tri = [(100, 101), (101, 102), (100, 102)]
        chain = [(100, 0)] + [(i, i + 1) for i in range(9)]
        df = spark.createDataFrame(tri + chain, "src bigint, dst bigint")
        got = {r.vertex for r in k_core(df, k=2).collect()}
        assert got == {100, 101, 102}


class TestSkew:
    def test_salt_range_and_determinism(self, spark):
        df = spark.createDataFrame([(f"u{i}",) for i in range(100)], "url string")
        a = {r.url: r._salt for r in with_salt(df, "url", buckets=8).collect()}
        b = {r.url: r._salt for r in with_salt(df, "url", buckets=8).collect()}
        assert a == b
        assert set(a.values()) <= set(range(8))
        assert len(set(a.values())) > 1

    def test_salted_count_matches_plain(self, spark):
        rows = [("hot.com", f"u{i}") for i in range(500)] + [
            (f"cold{i}.com", f"c{i}") for i in range(20)
        ]
        df = spark.createDataFrame(rows, "domain string, url string")
        salted = {r.domain: r.n for r in salted_count(df, "domain", "url", buckets=16).collect()}
        plain = {r.domain: r["count"] for r in df.groupBy("domain").count().collect()}
        assert salted == plain


class TestDatagen:
    def test_deterministic_and_skewed(self, spark):
        docs = synthesize_documents(spark, n_docs=800)
        again = synthesize_documents(spark, n_docs=800)
        assert sorted(map(str, docs.collect())) == sorted(map(str, again.collect()))
        by_domain = (
            docs.withColumn("domain", F.regexp_extract("url", r"https://([^/]+)/", 1))
            .groupBy("domain").count().collect()
        )
        counts = sorted((r["count"] for r in by_domain), reverse=True)
        assert counts[0] >= 10 * counts[-1]  # hot-domain skew
        langs = {r.lang for r in docs.select("lang").distinct().collect()}
        assert "fr" in langs
        assert docs.filter("text IS NULL AND html IS NOT NULL").count() > 0

    def test_hot_frac_layouts(self, spark):
        """hot_frac pins the hot-domain mass exactly (30% → domain 0)
        while hot_frac=0 spreads uniformly — the two bench corpora."""
        def domain_counts(docs):
            rows = (
                docs.withColumn("domain", F.regexp_extract("url", r"https://([^/]+)/", 1))
                .groupBy("domain").count().collect()
            )
            return {r.domain: r["count"] for r in rows}

        hot = domain_counts(synthesize_documents(spark, n_docs=1000, hot_frac=0.30))
        frac0 = hot.get("feeds0.example.com", 0) / 1000
        assert 0.25 <= frac0 <= 0.35
        uni = domain_counts(synthesize_documents(spark, n_docs=1000, hot_frac=0.0))
        assert max(uni.values()) <= 3 * (1000 / len(uni))
        # identical texts under both layouts (only the domain map moves)
        t_hot = sorted(r.text for r in synthesize_documents(spark, n_docs=100, hot_frac=0.30)
                       .select("text").collect() if r.text)
        t_uni = sorted(r.text for r in synthesize_documents(spark, n_docs=100, hot_frac=0.0)
                       .select("text").collect() if r.text)
        assert t_hot == t_uni

    def test_cti_pipeline_end_to_end_on_synthetic(self, spark):
        cfg = PipelineConfig()  # CTI mode: IOC-regex stub extraction
        docs = normalize_documents(synthesize_documents(spark, n_docs=60), lang_filter="en")
        kg = fused_kg(docs, StubModel(cfg), cfg)
        rows = kg.collect()
        assert rows
        objs = {r.obj for r in rows} | {r.subj for r in rows}
        assert any(o.startswith("CVE-") for o in objs)
        # null-text docs flow through the html fallback without error
        assert all(r.pred for r in rows)


def test_global_entity_resolution(spark):
    """Cross-document resolution: alias-linked texts collapse to one
    global id (min text), everything else resolves to itself."""
    from ctinexus_spark.config import PipelineConfig
    from ctinexus_spark.model import StubModel
    from ctinexus_spark.operators.resolve import global_entity_resolution

    ents = spark.createDataFrame(
        [("APT29",), ("Cozy Bear",), ("LockBit",), ("phishing",)],
        "entity_text string",
    )
    merged = global_entity_resolution(
        ents, StubModel(PipelineConfig(), alias_map={"Cozy Bear": "APT29"})
    )
    got = {(r.entity_text, r.global_id) for r in merged.collect()}
    assert got == {
        ("APT29", "APT29"), ("Cozy Bear", "APT29"),
        ("LockBit", "LockBit"), ("phishing", "phishing"),
    }

    identity = global_entity_resolution(ents, StubModel(PipelineConfig()))
    assert all(r.entity_text == r.global_id for r in identity.collect())


def test_triangle_counts_known_graph(spark):
    """K4 on {1..4} plus a pendant: each K4 vertex sits in C(3,2)=3
    triangles, the pendant in none; star centers contribute nothing
    (degree-ordered orientation)."""
    from ctinexus_spark.graph.analytics import triangle_counts

    k4 = [(a, b) for a in range(1, 5) for b in range(a + 1, 5)]
    edges = spark.createDataFrame(k4 + [(4, 9), (9, 9)], "src bigint, dst bigint")
    got = {r.vertex: r.n_triangles for r in triangle_counts(edges).collect()}
    assert got == {1: 3, 2: 3, 3: 3, 4: 3}

    # a pure star has zero triangles regardless of hub degree
    star = spark.createDataFrame([(0, i) for i in range(1, 30)], "src bigint, dst bigint")
    assert triangle_counts(star).count() == 0


def test_bfs_distances_path_graph(spark):
    """Path 1-2-3-4-5-6: hop budget truncates, multi-seed takes the
    min, and a seed absent from the graph still reports dist 0."""
    from ctinexus_spark.graph.analytics import bfs_distances

    path = [(i, i + 1) for i in range(1, 6)]
    edges = spark.createDataFrame(path, "src bigint, dst bigint")

    got = {r.vertex: r.dist for r in bfs_distances(edges, seeds=[1], hops=3).collect()}
    assert got == {1: 0, 2: 1, 3: 2, 4: 3}

    both = {
        r.vertex: r.dist for r in bfs_distances(edges, seeds=[1, 6], hops=2).collect()
    }
    assert both == {1: 0, 6: 0, 2: 1, 5: 1, 3: 2, 4: 2}

    lone = {
        r.vertex: r.dist for r in bfs_distances(edges, seeds=[99], hops=2).collect()
    }
    assert lone == {99: 0}


def test_clustering_coefficient_triangle_with_pendant(spark):
    """Triangle {1,2,3} + pendant edge 3-4: the degree-2 triangle
    corners are fully transitive (1.0), the junction vertex is
    2·1/(3·2)=1/3, the pendant (degree 1) is excluded, and a star hub
    with zero triangles scores 0.0."""
    from ctinexus_spark.graph.analytics import clustering_coefficient

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (3, 4)], "src bigint, dst bigint"
    )
    rows = {r.vertex: r for r in clustering_coefficient(edges).collect()}
    assert set(rows) == {1, 2, 3}
    assert rows[1].clustering == 1.0 and rows[2].clustering == 1.0
    assert rows[3].degree == 3 and rows[3].n_triangles == 1
    assert abs(rows[3].clustering - 1.0 / 3.0) < 1e-15

    star = spark.createDataFrame([(0, i) for i in range(1, 6)], "src bigint, dst bigint")
    hub = {r.vertex: r for r in clustering_coefficient(star).collect()}
    assert set(hub) == {0} and hub[0].clustering == 0.0 and hub[0].n_triangles == 0


def test_grouped_map_stitched_whole_groups_across_batches(spark):
    """The shared stitched grouped-map must hand `process` only WHOLE
    key-groups even when a group straddles the Arrow batch cap: with
    maxRecordsPerBatch=4 and 7-row groups, every group straddles."""
    import pandas as pd
    from pyspark.sql import functions as F

    from ctinexus_spark.partitioning import grouped_map_stitched

    df = spark.createDataFrame(
        [(f"g{i:02d}", j) for i in range(10) for j in range(7)],
        "k string, v int",
    )

    def process(pdf: pd.DataFrame) -> pd.DataFrame:
        return (
            pdf.groupby("k", sort=False)
            .agg(n=("v", "size"), s=("v", "sum"))
            .reset_index()
        )

    key = "spark.sql.execution.arrow.maxRecordsPerBatch"
    prev = spark.conf.get(key)
    spark.conf.set(key, "4")
    try:
        got = grouped_map_stitched(df, "k", process, "k string, n bigint, s bigint")
        rows = got.collect()
    finally:
        spark.conf.set(key, prev)
    # one output row per group (no fragment rows), full counts/sums
    assert sorted((r.k, r.n, r.s) for r in rows) == [
        (f"g{i:02d}", 7, 21) for i in range(10)
    ]


def test_bfs_distances_matches_python_bfs_random(spark):
    """Erdős–Rényi-ish random graph (seeded): frontier-expansion
    distances equal a plain Python BFS truncated at the hop budget."""
    import random
    from collections import deque

    from ctinexus_spark.graph.analytics import bfs_distances

    rng = random.Random(11)
    n, m, hops = 60, 120, 3
    edges = list({(rng.randrange(n), rng.randrange(n)) for _ in range(m)})
    df = spark.createDataFrame(edges, "src bigint, dst bigint")
    got = {r.vertex: r.dist for r in bfs_distances(df, seeds=[0, 1], hops=hops).collect()}

    adj = {}
    for a, b in edges:
        if a != b:
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
    want, dq = {0: 0, 1: 0}, deque([0, 1])
    while dq:
        v = dq.popleft()
        if want[v] >= hops:
            continue
        for w in adj.get(v, ()):
            if w not in want:
                want[w] = want[v] + 1
                dq.append(w)
    assert got == want


def test_personalized_pagerank_matches_numpy(spark):
    """Seeded restart vector: agrees with a dense numpy
    random-walk-with-restart to 1e-9, concentrates mass near the
    seed, and leaves the uniform path untouched (seeds=None equals
    the original pinned recurrence)."""
    import numpy as np

    from ctinexus_spark.graph.analytics import pagerank_pinned

    edges = [(0, 1), (1, 2), (2, 3), (3, 4), (4, 0), (1, 0)]
    df = spark.createDataFrame(edges, "src bigint, dst bigint")
    got = {
        r.vertex: r.rank
        for r in pagerank_pinned(df, iterations=6, seeds=[0]).collect()
    }

    n, d = 5, 0.85
    adj = {0: [1], 1: [0, 2], 2: [3], 3: [4], 4: [0]}
    p = np.zeros(n)
    p[0] = 1.0
    r = p.copy()
    for _ in range(6):
        contrib = np.zeros(n)
        dang = 0.0
        for s, outs in adj.items():
            if not outs:
                dang += r[s]
            for t in outs:
                contrib[t] += r[s] / len(outs)
        r = (1 - d) * p + d * (contrib + dang * p)
    for v in range(n):
        assert abs(got[v] - r[v]) < 1e-9, (v, got[v], r[v])
    # proximity: the seed and its direct neighbor outrank the far side
    assert got[0] > got[3] and got[1] > got[3]


def test_k_truss_peels_to_clique(spark):
    """K4 plus a pendant triangle glued on edge (1,2): the pendant's
    edges sit in one triangle each (< k-2=2) and peel away; the K4
    survives with every edge's support back at 2. k=5 empties the
    graph entirely (K4 edges max out at support 2)."""
    from ctinexus_spark.graph.analytics import k_truss

    k4 = [(a, b) for a in range(1, 5) for b in range(a + 1, 5)]
    edges = spark.createDataFrame(
        k4 + [(1, 5), (2, 5)], "src bigint, dst bigint"
    )
    out = {(r.u, r.v): r.support for r in k_truss(edges, k=4).collect()}
    assert set(out) == set(k4)
    assert all(s == 2 for s in out.values())

    assert k_truss(edges, k=5).count() == 0


def test_k_truss_rejects_k_below_three(spark):
    import pytest

    from ctinexus_spark.graph.analytics import k_truss

    edges = spark.createDataFrame([(1, 2)], "src bigint, dst bigint")
    with pytest.raises(ValueError, match="k >= 3"):
        k_truss(edges, k=2)


def test_personalized_pagerank_seed_validation(spark):
    """Empty seed sets and seed sets disjoint from the vertex universe
    fail loudly instead of silently producing all-zero ranks."""
    import pytest

    from ctinexus_spark.graph.analytics import pagerank_pinned

    edges = spark.createDataFrame([(0, 1), (1, 2)], "src bigint, dst bigint")
    with pytest.raises(ValueError, match="non-empty"):
        pagerank_pinned(edges, seeds=[])
    with pytest.raises(ValueError, match="vertex set"):
        pagerank_pinned(edges, seeds=[999])


def test_bfs_exhausted_frontier_exits_early(spark):
    """A hop budget far beyond the graph's diameter returns the same
    distances (the early exit is semantics-invisible)."""
    from ctinexus_spark.graph.analytics import bfs_distances

    edges = spark.createDataFrame([(1, 2), (2, 3)], "src bigint, dst bigint")
    got = {r.vertex: r.dist for r in bfs_distances(edges, seeds=[1], hops=50).collect()}
    assert got == {1: 0, 2: 1, 3: 2}
