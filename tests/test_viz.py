"""S5 graph-visualization sink: bounded, typed, self-contained HTML."""

import json
import re

import pytest


@pytest.fixture()
def kg(spark):
    edges = spark.createDataFrame(
        [("akira", "uses", "cve-2023-1234"), ("akira", "targets", "vpn"),
         ("apt29", "uses", "cve-2023-1234"), ("apt29", "aka", "cozy bear"),
         ("cozy bear", "targets", "vpn")],
        "subj string, pred string, obj string",
    )
    types = spark.createDataFrame(
        [("akira", "Malware"), ("apt29", "ThreatActor"),
         ("cozy bear", "ThreatActor"), ("cve-2023-1234", "Vulnerability")],
        "name string, type string",
    )
    return edges, types


def _meta(doc: str) -> dict:
    m = re.search(r'id="graph-meta">(.*?)</script>', doc, re.S)
    return json.loads(m.group(1))


def test_html_is_self_contained_and_typed(spark, kg):
    from ctinexus_spark.viz import graph_to_html

    edges, types = kg
    doc = graph_to_html(edges, types=types, seed=3)
    assert doc.startswith("<!DOCTYPE html>")
    # no external fetches — the reference's pyvis/CDN dependency is gone
    assert "http://" not in doc and "https://" not in doc
    assert "<svg" in doc and "<circle" in doc and "<line" in doc
    for name in ("akira", "apt29", "cozy bear", "cve-2023-1234", "vpn"):
        assert name in doc
    # legend lists every type incl. the default for untyped nodes
    meta = _meta(doc)
    assert set(meta["types"]) == {"Malware", "ThreatActor", "Vulnerability", "unknown"}
    assert meta["nodes"] == 5 and meta["edges"] == 5


def test_max_nodes_cap_limits_collect(spark):
    from ctinexus_spark.viz import graph_to_html

    rows = [(f"hub", "links", f"leaf{i}") for i in range(40)]
    edges = spark.createDataFrame(rows, "subj string, pred string, obj string")
    doc = graph_to_html(edges, max_nodes=10, seed=1)
    meta = _meta(doc)
    assert meta["nodes"] == 10
    # induced edges only: hub (top degree) plus 9 leaves → 9 edges
    assert meta["edges"] == 9


def test_escapes_hostile_names(spark):
    from ctinexus_spark.viz import graph_to_html

    edges = spark.createDataFrame(
        [('<script>alert(1)</script>', "x", 'b"'), ("b\"", "y", "c&d")],
        "subj string, pred string, obj string",
    )
    doc = graph_to_html(edges, seed=1)
    assert "<script>alert" not in doc
    assert "&lt;script&gt;" in doc and "&amp;" in doc


def test_write_sink_roundtrip(spark, kg, tmp_path):
    from ctinexus_spark.viz import write_graph_html

    edges, types = kg
    out = write_graph_html(edges, str(tmp_path / "kg.html"), types=types)
    with open(out, encoding="utf-8") as f:
        body = f.read()
    assert _meta(body)["nodes"] == 5


def test_deterministic_for_fixed_seed(spark, kg):
    from ctinexus_spark.viz import graph_to_html

    edges, types = kg
    assert graph_to_html(edges, types=types, seed=9) == graph_to_html(
        edges, types=types, seed=9
    )
