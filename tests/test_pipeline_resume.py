"""End-to-end checkpoint/resume over the real pipeline: run on half
the corpus, then on the full corpus — only missing urls re-run, and
the final KG equals a from-scratch run."""

from pyspark.sql import functions as F

from ctinexus_spark.checkpoint import StageStore
from ctinexus_spark.config import PipelineConfig
from ctinexus_spark.datagen import synthesize_documents
from ctinexus_spark.model import StubModel
from ctinexus_spark.pipeline import run_pipeline_checkpointed


def test_pipeline_resume_only_missing_urls(spark, tmp_path):
    cfg = PipelineConfig()
    model = StubModel(cfg)
    docs = synthesize_documents(spark, n_docs=40).persist()
    first_half = docs.limit(20).persist()

    store = StageStore(str(tmp_path / "ckpt"))
    kg1 = run_pipeline_checkpointed(spark, first_half, model, store, cfg)
    n1 = kg1.count()
    urls1 = {r.url for r in kg1.select("url").distinct().collect()}

    # resume with the full corpus: committed urls must not re-run
    kg2 = run_pipeline_checkpointed(spark, docs, model, store, cfg)
    n2 = kg2.count()
    assert n2 > n1
    urls2 = {r.url for r in kg2.select("url").distinct().collect()}
    assert urls1 <= urls2

    # equivalence with a from-scratch run over the full corpus
    fresh_store = StageStore(str(tmp_path / "fresh"))
    kg_fresh = run_pipeline_checkpointed(spark, docs, model, fresh_store, cfg)
    a = sorted(map(str, kg2.select("url", "subj", "pred", "obj").collect()))
    b = sorted(map(str, kg_fresh.select("url", "subj", "pred", "obj").collect()))
    assert a == b

    # third run with no new input: nothing re-processed, same output
    kg3 = run_pipeline_checkpointed(spark, docs, model, store, cfg)
    assert kg3.count() == n2


def test_stage_outputs_committed(spark, tmp_path):
    cfg = PipelineConfig()
    store = StageStore(str(tmp_path / "c"))
    docs = synthesize_documents(spark, n_docs=10)
    run_pipeline_checkpointed(spark, docs, StubModel(cfg), store, cfg)
    for stage in ("documents_clean", "triples_typed", "kg_fused_rows", "kg_links"):
        assert store.is_committed(stage)
        assert store.load(spark, stage).count() >= 0


def test_checkpointed_includes_predicted_links(spark, tmp_path):
    """The committed pipeline must match the in-memory paths INCLUDING
    LP link prediction — multi-component docs (SplitChainModel) emit
    source='predicted' rows on both."""
    from ctinexus_spark import entry_queries as eq
    from ctinexus_spark.model import SplitChainModel
    from ctinexus_spark.operators.fused import fused_kg
    from ctinexus_spark.operators.normalize import normalize_documents

    # url slice chosen to include docs whose two split-chains stay
    # disconnected (first such doc in the corpus is url=122)
    raw = eq.load_documents(spark, "/root/testdata/sf0.001").filter(
        F.col("url").cast("int") < 200
    )
    model = SplitChainModel(eq.CONFIG)

    store = StageStore(str(tmp_path / "c"))
    kg_ck = run_pipeline_checkpointed(spark, raw, model, store, eq.CONFIG, lang_filter=None)
    kg_mem = fused_kg(normalize_documents(raw, lang_filter=None), model, eq.CONFIG)

    a = sorted(map(str, kg_ck.select("url", "subj", "pred", "obj", "source").collect()))
    b = sorted(map(str, kg_mem.select("url", "subj", "pred", "obj", "source").collect()))
    assert a == b
    assert any("predicted" in r for r in a)


def test_resume_skips_lang_filtered(spark, tmp_path):
    # filtered-out docs must not loop forever in the work-list: the
    # resume anti-join is on the *stage output*, so non-en docs are
    # re-offered but produce no rows — verify idempotence
    cfg = PipelineConfig()
    store = StageStore(str(tmp_path / "c"))
    docs = synthesize_documents(spark, n_docs=30)
    k1 = run_pipeline_checkpointed(spark, docs, StubModel(cfg), store, cfg).count()
    k2 = run_pipeline_checkpointed(spark, docs, StubModel(cfg), store, cfg).count()
    assert k1 == k2
