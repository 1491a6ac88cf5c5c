"""LP graph-analysis semantics (reference graph_constructor.py:51-209):
components, degree, main/topic selection, hallucination guard."""

import json

from ctinexus_spark.config import PipelineConfig
from ctinexus_spark.model import StubModel
from ctinexus_spark.operators.lp import analyze_graph, predict_links

URL = "https://d/1"

ALIGNED_SCHEMA = (
    "url string, t_idx int, side string, pos int, mention_id int, "
    "mention_text string, mention_class string, entity_id int, "
    "entity_text string, mention_merged array<string>"
)


def aligned_df(spark, triples):
    """triples: list of (t_idx, subj_eid, subj_text, obj_eid, obj_text)"""
    rows = []
    for (t_idx, se, st, oe, ot) in triples:
        rows.append((URL, t_idx, "subject", t_idx * 2, se, st, "c", se, st, []))
        rows.append((URL, t_idx, "object", t_idx * 2 + 1, oe, ot, "c", oe, ot, []))
    return spark.createDataFrame(rows, ALIGNED_SCHEMA)


# two components: {0,1,2} (entity 0 has degree 2) and {3,4}
TRIPLES = [
    (0, 0, "Hub", 1, "Leaf1"),
    (1, 0, "Hub", 2, "Leaf2"),
    (2, 3, "IslandA", 4, "IslandB"),
]


def test_components_and_degree(spark):
    g = {(r.entity_id): r for r in analyze_graph(aligned_df(spark, TRIPLES)).collect()}
    assert g[0].component_id == g[1].component_id == g[2].component_id
    assert g[3].component_id == g[4].component_id
    assert g[0].component_id != g[3].component_id
    assert g[0].degree == 2
    assert g[1].degree == 1
    assert g[3].degree == 1


def test_main_and_topic_selection(spark):
    g = {r.entity_id: r for r in analyze_graph(aligned_df(spark, TRIPLES)).collect()}
    assert g[0].is_main and g[0].is_topic  # biggest component, max degree
    # island main: degree tie (1,1) → lowest entity_id
    assert g[3].is_main and not g[3].is_topic
    assert not g[4].is_main


def test_component_size_tie_first_discovered(spark):
    triples = [
        (0, 0, "A", 1, "B"),   # component discovered first
        (1, 2, "C", 3, "D"),   # same size
    ]
    g = {r.entity_id: r for r in analyze_graph(aligned_df(spark, triples)).collect()}
    assert g[0].is_topic or g[1].is_topic
    assert not (g[2].is_topic or g[3].is_topic)


def test_self_loop_counts_degree_twice(spark):
    triples = [(0, 0, "Selfie", 0, "Selfie"), (1, 1, "Other", 2, "Third")]
    g = {r.entity_id: r for r in analyze_graph(aligned_df(spark, triples)).collect()}
    assert g[0].degree == 2
    assert g[0].component_size == 1


def test_predicted_links_main_to_topic(spark):
    graph = analyze_graph(aligned_df(spark, TRIPLES))
    docs = spark.createDataFrame([(URL, "doc text")], "url string, text_norm string")
    links = predict_links(graph, docs, StubModel()).collect()
    assert len(links) == 1
    (link,) = links
    assert link.subject_text == "IslandA"
    assert link.object_text == "Hub"
    assert link.status == "ok"
    assert link.relation == PipelineConfig().lp_relation


class HallucinatingModel(StubModel):
    def link(self, doc_text, main_text, topic_text):
        return json.dumps(
            {"predicted_triple": {"subject": "WrongEntity", "relation": "x", "object": topic_text}}
        )


class ReversedModel(StubModel):
    def link(self, doc_text, main_text, topic_text):
        return json.dumps(
            {"predicted_triple": {"subject": topic_text, "relation": "hosts", "object": main_text}}
        )


def test_hallucination_guard(spark):
    graph = analyze_graph(aligned_df(spark, TRIPLES))
    docs = spark.createDataFrame([(URL, "doc text")], "url string, text_norm string")
    links = predict_links(graph, docs, HallucinatingModel()).collect()
    assert links[0].status == "hallucination"
    assert links[0].subject_text == "hallucination"


def test_reversed_orientation_accepted(spark):
    graph = analyze_graph(aligned_df(spark, TRIPLES))
    docs = spark.createDataFrame([(URL, "doc text")], "url string, text_norm string")
    links = predict_links(graph, docs, ReversedModel()).collect()
    assert links[0].status == "ok"
    assert links[0].subject_text == "Hub"       # topic as subject
    assert links[0].object_text == "IslandA"
