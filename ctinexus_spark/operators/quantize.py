"""Vector compression for web-scale similarity search.

At 10⁹+ vectors the raw float corpus (64 dims × 4 B = 256 B/vector)
dominates memory; these operators implement the two standard
compressions, both deterministic (md5-derived parameters, no RNG) so
DuckDB oracle twins reproduce them exactly:

- random_projection — Johnson-Lindenstrauss sign projection to
  out_dim dims (±1 rows, scaled 1/√out_dim): 4× storage cut before
  LSH/IVF with bounded distance distortion.
- pq_encode / pq_adc_topk — product quantization: split the vector
  into SUBSPACES contiguous sub-vectors, quantize each to the nearest
  of K sub-centroids (L2), store only the code bytes (64 floats →
  8 codes). Search uses asymmetric distance (ADC): the query stays
  un-quantized, per-subspace distances to every centroid are computed
  once per query, and each corpus vector's distance is a sum of 8
  table lookups — a broadcast join + aggregation, no vector math per
  pair.

Float determinism: every accumulation is a dimension-by-dimension
left fold in float64 — the same order as DuckDB's list_sum — so
distances and assignments are bit-identical across engines.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from ctinexus_spark.operators.similarity import EMBED_DIM, hyperplane_signs

PQ_SUBSPACES = 8
PQ_CODEBOOK = 16


def random_projection(
    embeddings: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    in_dim: int = EMBED_DIM,
    out_dim: int = 16,
) -> DataFrame:
    """(id, pos, value) — the projected vector exploded to scalar rows
    (engine-portable hash compare). value[j] = Σ_d v_d·sign_jd / √out,
    signs shared with the LSH hyperplane bank."""
    from ctinexus_spark.partitioning import ensure_parallelism

    signs = np.asarray(hyperplane_signs(in_dim, out_dim), dtype=np.float64)
    scale = 1.0 / np.sqrt(float(out_dim))

    @pandas_udf("array<double>")
    def _proj(vecs: pd.Series) -> pd.Series:
        m = np.vstack([np.asarray(v, dtype=np.float64) for v in vecs])
        out = np.zeros((m.shape[0], signs.shape[0]))
        for d in range(m.shape[1]):  # left-fold per dimension
            out += m[:, d : d + 1] * signs[None, :, d][0]
        out *= scale
        return pd.Series([row.tolist() for row in out])

    return ensure_parallelism(embeddings).select(
        F.col(id_col), F.posexplode(_proj(F.col(vec_col))).alias("pos", "value")
    )


def pq_centroids(
    dim: int = EMBED_DIM, subspaces: int = PQ_SUBSPACES, k: int = PQ_CODEBOOK
) -> np.ndarray:
    """(subspaces, k, dim/subspaces) deterministic sub-centroids:
    md5-seeded standard normals, the same construction as
    stub_embedding (a production build trains these per subspace with
    k-means; the encode/search plumbing is identical)."""
    sub = dim // subspaces
    out = np.zeros((subspaces, k, sub))
    for s in range(subspaces):
        for c in range(k):
            seed = int.from_bytes(
                hashlib.md5(f"pq-{s}-{c}".encode()).digest()[:4], "big"
            )
            out[s, c] = np.random.RandomState(seed).standard_normal(sub)
    return out


def _sub_dists(q: np.ndarray, cents: np.ndarray, s: int) -> np.ndarray:
    """Left-fold squared L2 from one sub-vector to each of k centroids
    (dimension order fixed for cross-engine bit-identity)."""
    k, sub = cents.shape[1], cents.shape[2]
    d = np.zeros(k)
    for j in range(sub):
        diff = q[j] - cents[s, :, j]
        d += diff * diff
    return d


def train_pq_centroids(
    embeddings: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = EMBED_DIM,
    subspaces: int = PQ_SUBSPACES,
    k: int = PQ_CODEBOOK,
    iterations: int = 5,
) -> np.ndarray:
    """Per-subspace k-means over the corpus, fully distributed (the
    same pattern that closed the IVF seed-centroid gap):

    - init: the first k vectors in md5(id) order donate their
      sub-vectors (deterministic hash-ordered sample, no RNG)
    - assignment: pq_encode's Arrow kernel with the current codebook
    - update: posexplode(vec) → groupBy(subspace, code, within-sub
      pos) → avg; only subspaces×k×sub aggregated rows reach the
      driver per round; empty codes keep their previous centroid.

    Untrained random codebooks quantize random unit vectors to noise
    (measured recall@5 ≈ 0); training recovers the signal — pinned by
    tests/test_ivf_training.py."""
    sub = dim // subspaces
    init_rows = (
        embeddings.select(F.col(id_col).alias("i"), F.col(vec_col).alias("v"))
        .withColumn("h", F.md5(F.col("i").cast("string")))
        .orderBy("h")
        .limit(k)
        .collect()
    )
    if not init_rows:
        raise ValueError("train_pq_centroids: embeddings input is empty")
    # fewer distinct vectors than codes would leave all-zero codebook
    # rows that attract assignments and silently degrade the codebook —
    # shrink k to the available sample instead
    k = min(k, len(init_rows))
    cents = np.zeros((subspaces, k, sub))
    for c, r in enumerate(init_rows):
        v = np.asarray(list(r.v), dtype=np.float64)
        for s in range(subspaces):
            cents[s, c] = v[s * sub : (s + 1) * sub]

    for _ in range(iterations):
        codes = pq_encode(
            embeddings, id_col, vec_col, dim, subspaces, k, centroids=cents
        )
        vals = embeddings.select(
            F.col(id_col), F.posexplode(F.col(vec_col)).alias("d", "val")
        ).select(
            id_col,
            (F.col("d") / sub).cast("int").alias("subspace"),
            (F.col("d") % sub).cast("int").alias("pos"),
            F.col("val").cast("double").alias("val"),
        )
        means = (
            codes.join(vals, [id_col, "subspace"])
            .groupBy("subspace", "code", "pos")
            .agg(F.avg("val").alias("m"))
            .collect()
        )
        new = cents.copy()
        by_sc: dict[tuple[int, int], dict[int, float]] = {}
        for r in means:
            by_sc.setdefault((r.subspace, r.code), {})[r.pos] = r.m
        for (s, c), posmap in by_sc.items():
            new[s, c] = np.asarray([posmap[j] for j in range(sub)])
        cents = new
    return cents


def pq_encode(
    embeddings: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = EMBED_DIM,
    subspaces: int = PQ_SUBSPACES,
    k: int = PQ_CODEBOOK,
    centroids: np.ndarray | None = None,
) -> DataFrame:
    """(id, subspace, code) — nearest sub-centroid per subspace by
    squared L2; ties (unreachable on real data) to the lowest code."""
    from ctinexus_spark.partitioning import ensure_parallelism

    cents = centroids if centroids is not None else pq_centroids(dim, subspaces, k)
    sub = dim // subspaces

    @pandas_udf("array<int>")
    def _enc(vecs: pd.Series) -> pd.Series:
        m = np.vstack([np.asarray(v, dtype=np.float64) for v in vecs])
        codes = np.zeros((m.shape[0], subspaces), dtype="int32")
        for s in range(subspaces):
            seg = m[:, s * sub : (s + 1) * sub]
            d = np.zeros((m.shape[0], cents.shape[1]))
            for j in range(sub):
                diff = seg[:, j : j + 1] - cents[s, :, j][None, :]
                d += diff * diff
            codes[:, s] = np.argmin(d, axis=1)  # ties → lowest code
        return pd.Series([row.tolist() for row in codes])

    return ensure_parallelism(embeddings).select(
        F.col(id_col), F.posexplode(_enc(F.col(vec_col))).alias("subspace", "code")
    )


def pq_adc_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    dim: int = EMBED_DIM,
    subspaces: int = PQ_SUBSPACES,
    codebook: int = PQ_CODEBOOK,
    centroids: np.ndarray | None = None,
) -> DataFrame:
    """Asymmetric-distance top-k: corpus vectors participate only
    through their PQ codes; each (query, subspace, code) distance is a
    lookup in the query's per-subspace distance table. Plan shape:
    corpus codes ⨝ broadcast(query distance tables) on (subspace,
    code), then a per-(query, doc) sum and a top-k window — no
    per-pair vector math anywhere, which is the point of PQ at 10⁹
    vectors. Queries must be a SMALL explicit set (they broadcast)."""
    cents = centroids if centroids is not None else pq_centroids(dim, subspaces, codebook)
    sub = dim // subspaces

    @pandas_udf("array<double>")
    def _dtables(vecs: pd.Series) -> pd.Series:
        out = []
        for v in vecs:
            q = np.asarray(v, dtype=np.float64)
            flat = []
            for s in range(subspaces):
                flat.extend(_sub_dists(q[s * sub : (s + 1) * sub], cents, s).tolist())
            out.append(flat)
        return pd.Series(out)

    qt = queries.select(
        F.col(id_col).alias("query_id"),
        F.posexplode(_dtables(F.col(vec_col))).alias("slot", "dist"),
    ).select(
        "query_id",
        (F.col("slot") / codebook).cast("int").alias("subspace"),
        (F.col("slot") % codebook).cast("int").alias("code"),
        "dist",
    )
    codes = pq_encode(
        embeddings, id_col, vec_col, dim, subspaces, codebook, centroids=cents
    ).select(F.col(id_col).alias("neighbor_id"), "subspace", "code")
    joined = codes.join(F.broadcast(qt), ["subspace", "code"])
    # fixed-order sum: subspace index ascending == DuckDB's ordered
    # list_sum twin (8 summands; order pinned via sort inside the agg)
    scored = (
        joined.groupBy("query_id", "neighbor_id")
        .agg(
            F.aggregate(
                F.array_sort(
                    F.collect_list(F.struct(F.col("subspace"), F.col("dist")))
                ),
                F.lit(0.0),
                lambda acc, x: acc + x["dist"],
            ).alias("adc_dist")
        )
        .filter(F.col("query_id") != F.col("neighbor_id"))
    )
    w = Window.partitionBy("query_id").orderBy(F.asc("adc_dist"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.col("rank").cast("int").alias("rank"))
    )


def ivf_pq_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    dim: int = EMBED_DIM,
    cells: int | None = None,
    nprobe: int | None = None,
    max_cell: int | None = None,
    subspaces: int = PQ_SUBSPACES,
    codebook: int = PQ_CODEBOOK,
    ivf_centroids_: list[list[float]] | None = None,
    pq_centroids_: np.ndarray | None = None,
) -> DataFrame:
    """IVF-PQ: the production ANN index at 10⁹+ vectors — coarse IVF
    cells restrict WHICH vectors are scored (nprobe cells per query,
    hot cells capped) and PQ codes restrict HOW: each candidate's
    distance is `subspaces` table lookups against the query's
    broadcast distance tables, never a float-vector op. Corpus state
    is (cell, 8 codes) per vector ≈ 12 bytes instead of 256.

    Plan: two Arrow passes over the corpus (cell assign, PQ encode),
    a probed equi-join on cell, a broadcast lookup join on
    (query, subspace, code), one ordered aggregation, one top-k
    window. Every stage a bounded equi-join — no all-pairs anywhere."""
    from ctinexus_spark.operators.similarity import (
        MAX_CELL,
        N_IVF_CELLS,
        N_IVF_PROBE,
        _probe_udf,
        cap_buckets,
        ivf_assign,
        ivf_centroids,
    )
    from ctinexus_spark.partitioning import barrier, ensure_parallelism

    cells = cells if cells is not None else N_IVF_CELLS
    nprobe = nprobe if nprobe is not None else N_IVF_PROBE
    max_cell = max_cell if max_cell is not None else MAX_CELL
    icents = np.asarray(
        ivf_centroids_ if ivf_centroids_ is not None else ivf_centroids(dim, cells),
        dtype=np.float64,
    )
    pcents = (
        pq_centroids_ if pq_centroids_ is not None else pq_centroids(dim, subspaces, codebook)
    )
    sub = dim // subspaces

    cellmap = ivf_assign(embeddings, id_col, vec_col, dim=dim, cells=cells,
                         centroids=icents.tolist())
    codes = pq_encode(embeddings, id_col, vec_col, dim, subspaces, codebook,
                      centroids=pcents)
    # one barrier: cellmap feeds the cap's groupBy AND the probe join
    withcell = barrier(cellmap)
    capped = cap_buckets(withcell, ["cell"], max_cell)

    probes = ensure_parallelism(queries).select(
        F.col(id_col).alias("query_id"),
        F.explode(_probe_udf(icents, nprobe)(F.col(vec_col))).alias("cell"),
    )
    cand = probes.join(
        capped.select(F.col(id_col).alias("neighbor_id"), "cell"), "cell"
    ).select("query_id", "neighbor_id")

    @pandas_udf("array<double>")
    def _dtables(vecs: pd.Series) -> pd.Series:
        out = []
        for v in vecs:
            q = np.asarray(v, dtype=np.float64)
            flat = []
            for s in range(subspaces):
                flat.extend(_sub_dists(q[s * sub : (s + 1) * sub], pcents, s).tolist())
            out.append(flat)
        return pd.Series(out)

    qt = queries.select(
        F.col(id_col).alias("query_id"),
        F.posexplode(_dtables(F.col(vec_col))).alias("slot", "dist"),
    ).select(
        "query_id",
        (F.col("slot") / codebook).cast("int").alias("subspace"),
        (F.col("slot") % codebook).cast("int").alias("code"),
        "dist",
    )
    ncodes = codes.select(F.col(id_col).alias("neighbor_id"), "subspace", "code")
    joined = (
        cand.join(ncodes, "neighbor_id")
        .join(F.broadcast(qt), ["query_id", "subspace", "code"])
    )
    scored = (
        joined.groupBy("query_id", "neighbor_id")
        .agg(
            F.aggregate(
                F.array_sort(
                    F.collect_list(F.struct(F.col("subspace"), F.col("dist")))
                ),
                F.lit(0.0),
                lambda acc, x: acc + x["dist"],
            ).alias("adc_dist")
        )
        .filter(F.col("query_id") != F.col("neighbor_id"))
    )
    w = Window.partitionBy("query_id").orderBy(F.asc("adc_dist"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.col("rank").cast("int").alias("rank"))
    )
