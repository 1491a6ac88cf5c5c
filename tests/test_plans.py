"""Physical-plan shape assertions — the .explain() discipline as
tests: filters reach the parquet scan, small dims broadcast, scans
prune columns, the fused pipeline keeps its shuffle budget."""

import pytest
from pyspark.sql import functions as F

from ctinexus_spark import dataset_queries as dq
from ctinexus_spark import entry_queries as eq

SF = "/root/testdata/sf0.01"


def plan_of(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")


def test_lang_filter_pushed_to_scan(spark):
    from ctinexus_spark.operators.normalize import normalize_documents

    docs = spark.read.parquet(f"{SF}/documents.parquet").withColumnRenamed("doc_id", "url")
    plan = plan_of(normalize_documents(docs, lang_filter="en"))
    assert "PushedFilters" in plan
    assert "IsNotNull(lang)" in plan or "EqualTo(lang,en)" in plan


def test_q1_column_pruning(spark):
    plan = plan_of(dq.q_tpch_q1(spark, SF))
    # only the 7 needed columns are read, not all 11
    read_schema = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
    assert read_schema, plan
    assert "l_partkey" not in read_schema[0]
    assert "l_quantity" in read_schema[0]
    # shipdate predicate reaches the scan
    assert "PushedFilters" in plan and "l_shipdate" in plan


def test_revenue_join_broadcasts_dimension(spark):
    plan = plan_of(dq.q_revenue_join(spark, SF))
    assert "BroadcastHashJoin" in plan


def test_ann_broadcasts_query_side(spark):
    plan = plan_of(dq.q_ann_topk(spark, SF))
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan


def test_q1_partial_aggregation(spark):
    # map-side combine: HashAggregate below AND above the Exchange
    # (pre-execution AQE explain doesn't render WholeStageCodegen
    # spans; the double HashAggregate is the load-bearing shape)
    plan = plan_of(dq.q_tpch_q1(spark, SF))
    assert plan.count("HashAggregate") >= 2
    assert "Exchange" in plan


def test_fused_pipeline_shuffle_budget(spark):
    """The fused align pass must introduce exactly one Exchange on top
    of its input (the url repartition) — no hidden extra shuffles."""
    from ctinexus_spark.config import PipelineConfig
    from ctinexus_spark.model import StubModel
    from ctinexus_spark.operators.fused import align_graph_triples, extract_and_tag
    from ctinexus_spark.operators.normalize import normalize_documents

    # cached plans from earlier tests (persisted pipeline stages)
    # substitute InMemoryRelations into this lineage and change the
    # exchange count — measure the clean plan
    spark.catalog.clearCache()
    cfg = PipelineConfig(lexicon=eq.LEXICON)
    docs = normalize_documents(eq.load_documents(spark, SF), lang_filter=None)
    typed = extract_and_tag(docs, StubModel(cfg))
    fused = align_graph_triples(typed, StubModel(cfg), cfg)
    import re

    plan = plan_of(fused)
    nodes = [
        ln.strip() for ln in plan.splitlines()
        if re.match(r"\(\d+\) (ShuffleExchange|Exchange)", ln.strip())
    ]
    # 1 = repartition("url") for the align pass; the docs-repartition
    # in normalize_documents adds one more when the input is under-split
    assert len(nodes) <= 2, plan
