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


def triangle_counts(edges: DataFrame, src: str = "src", dst: str = "dst") -> DataFrame:
    """edges(src, dst) (directions/duplicates/self-loops ignored) →
    (vertex, n_triangles) for every vertex in ≥1 triangle."""
    e = edges.select(F.col(src).alias("a"), F.col(dst).alias("b")).filter(
        F.col("a") != F.col("b")
    )
    und = e.select(
        F.least("a", "b").alias("u"), F.greatest("a", "b").alias("v")
    ).distinct()
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
    tri = paths.join(
        o.select(F.col("s").alias("t1"), F.col("t").alias("t2")), ["t1", "t2"]
    ).select("s", "t1", "t2")
    verts = (
        tri.select(F.col("s").alias("vertex"))
        .unionByName(tri.select(F.col("t1").alias("vertex")))
        .unionByName(tri.select(F.col("t2").alias("vertex")))
    )
    return verts.groupBy("vertex").agg(F.count("*").cast("bigint").alias("n_triangles"))
