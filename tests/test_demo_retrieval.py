"""kNN demonstration retrieval against the real reference demo corpus
(148 files), exercised through the Spark operator."""

import os

import pytest

from ctinexus_spark.config import PipelineConfig
from ctinexus_spark.demos import REFERENCE_DEMO_DIR, load_demo_corpus
from ctinexus_spark.operators.ie import attach_demos

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REFERENCE_DEMO_DIR), reason="reference demo corpus not available"
)


def test_corpus_loads():
    ids, texts, triplets = load_demo_corpus()
    assert len(ids) == len(texts) == len(triplets) == 148
    assert all(texts)


def test_topk_retrieval_relevance(spark):
    ids, texts, _ = load_demo_corpus()
    # query = one demo's own text → retrieval must rank it first
    # (desc mode; identical text ⇒ cosine 1.0)
    cfg = PipelineConfig(demo_permutation="desc")
    docs = spark.createDataFrame([("u1", texts[10])], "url string, text_norm string")
    got = attach_demos(docs, texts, ids, cfg).collect()
    assert got[0].demo_ids[0] == ids[10]
    assert len(got[0].demo_ids) == cfg.shot


def test_asc_permutation_puts_best_last(spark):
    ids, texts, _ = load_demo_corpus()
    cfg = PipelineConfig(demo_permutation="asc")  # reference default
    docs = spark.createDataFrame([("u1", texts[10])], "url string, text_norm string")
    got = attach_demos(docs, texts, ids, cfg).collect()
    assert got[0].demo_ids[-1] == ids[10]
