"""End-to-end pipeline orchestration: IE → ET → EA → LP → materialize.

Replaces the reference's run_pipeline sequencing
(utils/gradio_utils.py:89-150) with a DataFrame DAG. Each stage is an
independent function over tables, so callers can checkpoint/resume any
prefix (see checkpoint.py).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame

from ctinexus_spark.config import PipelineConfig
from ctinexus_spark.operators.ea import align_entities, embed_mentions, mint_mentions
from ctinexus_spark.operators.et import tag_triples
from ctinexus_spark.operators.ie import attach_demos, extract_triples
from ctinexus_spark.operators.lp import analyze_graph, predict_links
from ctinexus_spark.operators.materialize import materialize_kg
from ctinexus_spark.operators.normalize import normalize_documents


@dataclass
class PipelineResult:
    documents_clean: DataFrame
    triples_ie: DataFrame
    triples_typed: DataFrame
    mentions: DataFrame
    aligned_nodes: DataFrame
    graph: DataFrame
    predicted_links: DataFrame
    kg: DataFrame


def run_pipeline(
    documents: DataFrame,
    model,
    config: PipelineConfig | None = None,
    demo_texts: list[str] | None = None,
    demo_ids: list[str] | None = None,
    lang_filter: str | None = "en",
) -> PipelineResult:
    cfg = config or PipelineConfig()

    # Persist at DAG branch points: docs feeds IE, ET and LP; typed
    # feeds minting and materialize; aligned feeds graph and
    # materialize. Without these every downstream branch would re-run
    # the whole extraction lineage. (On the checkpointed production
    # path each stage is a parquet/Iceberg write instead.)
    docs = normalize_documents(documents, lang_filter=lang_filter).persist()
    if demo_texts:
        docs = attach_demos(docs, demo_texts, demo_ids or [str(i) for i in range(len(demo_texts))], cfg)

    ie_all = extract_triples(docs, model)
    triples_ie = ie_all.filter("valid")

    typed_all = tag_triples(triples_ie, docs, model).persist()
    nodes = mint_mentions(typed_all)
    embeddings = embed_mentions(nodes, model)
    aligned = align_entities(nodes, embeddings, cfg).persist()

    graph = analyze_graph(aligned)
    links = predict_links(graph, docs, model, cfg)
    kg = materialize_kg(aligned, typed_all, links)

    return PipelineResult(
        documents_clean=docs,
        triples_ie=triples_ie,
        triples_typed=typed_all,
        mentions=nodes,
        aligned_nodes=aligned,
        graph=graph,
        predicted_links=links,
        kg=kg,
    )
