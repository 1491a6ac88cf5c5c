"""IVF k-means training (VERDICT #9): trained centroids must be
deterministic and beat the seed centroids' recall against the exact
brute-force baseline."""

import pytest

from ctinexus_spark.operators import similarity as S

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def emb(spark):
    df = spark.read.parquet(f"{SF}/embeddings.parquet").persist()
    df.count()
    yield df
    df.unpersist()


def _recall(spark, emb, centroids, exact_set):
    approx = {(r.query_id, r.neighbor_id) for r in S.ivf_topk(emb, centroids=centroids).collect()}
    return len(approx & exact_set) / len(exact_set)


def test_training_is_deterministic(spark, emb):
    a = S.train_ivf_centroids(emb, iterations=2)
    b = S.train_ivf_centroids(emb, iterations=2)
    assert a == b


def test_trained_centroids_beat_seed_recall(spark, emb):
    exact = {(r.query_id, r.neighbor_id) for r in S.brute_force_topk(emb, None).collect()}
    seed_recall = _recall(spark, emb, None, exact)
    trained = S.train_ivf_centroids(emb, iterations=5)
    trained_recall = _recall(spark, emb, trained, exact)
    # measured at sf0.01: seed 0.160, trained 0.244 (random 64-dim
    # vectors + nprobe=1 is IVF's worst case; the bar has margin)
    assert trained_recall > seed_recall
    assert trained_recall >= 0.20


def test_pq_training_recovers_recall(spark, emb):
    """Untrained random PQ codebooks quantize random unit vectors to
    noise (recall ~0); per-subspace k-means recovers the signal.
    Measured at sf0.01: untrained 0.000, trained 0.248 (ADC) / 0.208
    (IVF-PQ) — deterministic, bars carry margin."""
    from pyspark.sql import functions as F

    from ctinexus_spark.operators.quantize import (
        ivf_pq_topk,
        pq_adc_topk,
        train_pq_centroids,
    )

    q = emb.filter(F.col("vec_id") < 25)
    exact = {(r.query_id, r.neighbor_id) for r in S.brute_force_topk(emb, q).collect()}

    untrained = {(r.query_id, r.neighbor_id) for r in pq_adc_topk(emb, q).collect()}
    assert len(untrained & exact) / len(exact) < 0.05

    trained = train_pq_centroids(emb, iterations=5)
    adc = {(r.query_id, r.neighbor_id) for r in pq_adc_topk(emb, q, centroids=trained).collect()}
    assert len(adc & exact) / len(exact) >= 0.20

    ivfpq = {(r.query_id, r.neighbor_id)
             for r in ivf_pq_topk(emb, q, pq_centroids_=trained).collect()}
    assert len(ivfpq & exact) / len(exact) >= 0.15

    # determinism: two trainings agree exactly
    again = train_pq_centroids(emb, iterations=5)
    assert (trained == again).all()
