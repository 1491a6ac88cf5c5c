"""End-to-end pipeline smoke on tiny CTI docs with the stub model."""

import pytest

from ctinexus_spark.config import PipelineConfig
from ctinexus_spark.model import StubModel
from ctinexus_spark.pipeline import run_pipeline


@pytest.fixture
def result(spark, cti_documents):
    cfg = PipelineConfig()
    return run_pipeline(cti_documents, StubModel(cfg), cfg)


def test_lang_filter(result):
    urls = {r.url for r in result.documents_clean.select("url").collect()}
    assert all("/fr" not in u for u in urls)


def test_ie_extracts_iocs(result):
    rows = result.triples_ie.collect()
    assert rows
    mentions = {r.subject for r in rows} | {r.object for r in rows}
    assert "CVE-2023-1234" in mentions
    assert "192.168.1.100" in mentions


def test_typed_classes(result):
    rows = result.triples_typed.collect()
    by_text = {r.subject_text: r.subject_class for r in rows}
    by_text.update({r.object_text: r.object_class for r in rows})
    assert by_text["CVE-2023-1234"] == "Vulnerability"
    assert by_text["192.168.1.100"] == "Indicator: IP"


def test_mention_ids_dense_per_doc(result):
    for url_rows in _group_by_url(result.mentions.collect()):
        ids = sorted({r.mention_id for r in url_rows})
        assert ids == list(range(len(ids)))


def test_aligned_entities_dense(result):
    rows = result.aligned_nodes.collect()
    assert rows
    for url_rows in _group_by_url(rows):
        eids = sorted({r.entity_id for r in url_rows})
        assert eids == list(range(len(eids)))
        for r in url_rows:
            assert r.entity_text


def test_graph_has_single_topic_per_doc(result):
    rows = result.graph.collect()
    for url_rows in _group_by_url(rows):
        assert sum(1 for r in url_rows if r.is_topic) == 1
        comps = {r.component_id for r in url_rows}
        # every component has exactly one main
        for c in comps:
            assert sum(1 for r in url_rows if r.component_id == c and r.is_main) == 1


def test_predicted_links_ok(result):
    links = result.predicted_links.collect()
    # stub model never hallucinates
    assert all(r.status == "ok" for r in links)


def test_kg_materialized(result):
    kg = result.kg.collect()
    assert kg
    sources = {r.source for r in kg}
    assert "extracted" in sources
    for r in kg:
        assert r.subj and r.pred and r.obj


def _group_by_url(rows):
    by_url = {}
    for r in rows:
        by_url.setdefault(r.url, []).append(r)
    return by_url.values()
