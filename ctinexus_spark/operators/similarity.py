"""Similarity search over embedding columns.

- brute-force cosine top-k (baseline; exact)
- sign-random-projection LSH buckets (the scale path: bucket first,
  then exact re-rank within buckets — turns O(n²) into a bucket join)

Everything JVM-side: dot products via zip_with + aggregate inside
whole-stage codegen. Hyperplanes are deterministic ±1 vectors derived
from md5 (computed once driver-side, embedded as literals) so the SQL
oracle can reproduce them exactly.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

EMBED_DIM = 64
N_PLANES = 8


def cosine_expr(a: str, b: str) -> Column:
    """Cosine in double precision with a fixed evaluation order
    (left-fold sums) so results are reproducible bit-for-bit."""
    ac = F.transform(F.col(a), lambda x: x.cast("double"))
    bc = F.transform(F.col(b), lambda x: x.cast("double"))
    dot = F.aggregate(F.zip_with(ac, bc, lambda x, y: x * y), F.lit(0.0), lambda s, x: s + x)
    na = F.sqrt(F.aggregate(ac, F.lit(0.0), lambda s, x: s + x * x))
    nb = F.sqrt(F.aggregate(bc, F.lit(0.0), lambda s, x: s + x * x))
    return dot / (na * nb)


def hyperplane_signs(dim: int = EMBED_DIM, planes: int = N_PLANES) -> list[list[int]]:
    """Deterministic ±1 hyperplanes: sign from md5(f"{plane}:{dim}")."""
    out = []
    for p in range(planes):
        row = []
        for d in range(dim):
            h = hashlib.md5(f"{p}:{d}".encode()).hexdigest()
            row.append(1 if h[0] < "8" else -1)
        out.append(row)
    return out


def brute_force_topk(
    embeddings: DataFrame,
    queries: DataFrame | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
) -> DataFrame:
    """Exact top-k cosine neighbors per query vector.

    queries defaults to the full table (all-pairs kNN). Broadcast the
    query side when it is small — at scale the query set is the small
    dim table of the join.
    """
    q = (queries or embeddings).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
    )
    c = embeddings.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec"))
    pairs = F.broadcast(q).join(c, F.col("query_id") != F.col("neighbor_id"))
    scored = pairs.select(
        "query_id", "neighbor_id", cosine_expr("q_vec", "c_vec").alias("cosine")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.col("rank").cast("int").alias("rank"))
    )


def lsh_buckets(
    embeddings: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = EMBED_DIM,
    planes: int = N_PLANES,
) -> DataFrame:
    """(id, bucket) — sign bits of dot products against fixed ±1
    hyperplanes, concatenated into a bucket key."""
    signs = hyperplane_signs(dim, planes)
    vec = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    bits = []
    for p in range(planes):
        plane = F.array(*[F.lit(float(s)) for s in signs[p]])
        dot = F.aggregate(F.zip_with(vec, plane, lambda x, y: x * y), F.lit(0.0), lambda s, x: s + x)
        bits.append(F.when(dot >= 0, F.lit("1")).otherwise(F.lit("0")))
    return embeddings.select(F.col(id_col), F.concat(*bits).alias("bucket"))


def lsh_topk(
    embeddings: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
) -> DataFrame:
    """Approximate top-k: exact cosine re-rank *within* LSH buckets.
    The bucket join is the O(n²) → O(n·bucket) reduction that survives
    the 100 TB scale-up."""
    b = lsh_buckets(embeddings, id_col, vec_col)
    withb = embeddings.join(b, id_col)
    qa = withb.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec"), "bucket")
    ca = withb.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec"), "bucket")
    pairs = qa.join(ca, "bucket").filter(F.col("query_id") != F.col("neighbor_id"))
    scored = pairs.select("query_id", "neighbor_id", cosine_expr("q_vec", "c_vec").alias("cosine"))
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.col("rank").cast("int").alias("rank"))
    )


N_IVF_CELLS = 16


def ivf_centroids(dim: int = EMBED_DIM, cells: int = N_IVF_CELLS) -> list[list[float]]:
    """Deterministic seed centroids (md5-derived unit vectors). A
    production build replaces these with k-means centroids trained on
    a sample; the assignment/search plumbing is identical."""
    from ctinexus_spark.model import stub_embedding

    return [stub_embedding(f"ivf-centroid-{i}", dim).tolist() for i in range(cells)]


def ivf_assign(
    embeddings: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = EMBED_DIM,
    cells: int = N_IVF_CELLS,
) -> DataFrame:
    """(id, cell) — nearest centroid by cosine, vectorized as one
    numpy matmul per Arrow batch (a cells×dim expression tree blows up
    codegen; the matrix product is the scale shape). Argmax ties are
    impossible on real-valued cosines, so float-summation-order
    differences vs the SQL oracle cannot flip the assignment."""
    cents = np.asarray(ivf_centroids(dim, cells), dtype=np.float64)  # unit rows

    @pandas_udf("int")
    def _assign(vecs: pd.Series) -> pd.Series:
        m = np.vstack([np.asarray(v, dtype=np.float64) for v in vecs])
        norms = np.linalg.norm(m, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        sims = (m / norms) @ cents.T
        # tie rule (unreachable in practice): higher cell index wins,
        # matching the SQL oracle's ORDER BY cos DESC, cell DESC
        best = (sims.shape[1] - 1) - np.argmax(sims[:, ::-1], axis=1)
        return pd.Series(best.astype("int32"))

    return embeddings.select(F.col(id_col), _assign(F.col(vec_col)).alias("cell"))


def ivf_topk(
    embeddings: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
) -> DataFrame:
    """Approximate top-k: exact cosine re-rank within the query's IVF
    cell (nprobe=1). Same bucket-join scale shape as lsh_topk."""
    cellmap = ivf_assign(embeddings, id_col, vec_col)
    # localCheckpoint: both self-join sides consume this; persist would
    # leak in the cache manager (no safe unpersist point for a lazy
    # result), checkpoint blocks are GC-reclaimed once unreferenced
    withc = embeddings.join(cellmap, id_col).localCheckpoint(eager=True)
    qa = withc.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec"), "cell")
    ca = withc.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec"), "cell")
    pairs = qa.join(ca, "cell").filter(F.col("query_id") != F.col("neighbor_id"))
    scored = pairs.select("query_id", "neighbor_id", cosine_expr("q_vec", "c_vec").alias("cosine"))
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.col("rank").cast("int").alias("rank"))
    )


def knn_label_vote(
    embeddings: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    k: int = 5,
) -> DataFrame:
    """k-NN majority-label classification (exact neighbors)."""
    topk = brute_force_topk(embeddings, None, id_col, vec_col, k)
    labeled = topk.join(
        embeddings.select(F.col(id_col).alias("neighbor_id"), F.col(label_col).alias("n_label")),
        "neighbor_id",
    )
    votes = labeled.groupBy("query_id", "n_label").agg(F.count("*").alias("votes"))
    w = Window.partitionBy("query_id").orderBy(F.desc("votes"), F.asc("n_label"))
    return (
        votes.withColumn("rk", F.row_number().over(w))
        .filter("rk = 1")
        .select("query_id", F.col("n_label").alias("predicted_label"))
    )
