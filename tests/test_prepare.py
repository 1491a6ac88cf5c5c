"""Corpus-preparation combinator tests."""

from ctinexus_spark.operators.prepare import dedupe_by_key, exact_text_dedupe, quality_gate


def test_quality_gate_filters(spark):
    rows = [
        (1, "a good long document with many distinct useful tokens present here today"),
        (2, "the the the the the the the the the the"),  # all stopwords
        (3, "x"),  # too short
        (4, None),  # null
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    kept = {r.doc_id for r in quality_gate(df, min_tokens=5).collect()}
    assert kept == {1}


def test_dedupe_by_key_keeps_one(spark):
    rows = [("u1", "a"), ("u1", "b"), ("u2", "c")]
    df = spark.createDataFrame(rows, "url string, text string")
    got = dedupe_by_key(df, "url")
    assert got.count() == 2
    assert {r.url for r in got.collect()} == {"u1", "u2"}
    # deterministic winner across runs
    a = sorted(map(str, got.collect()))
    b = sorted(map(str, dedupe_by_key(df, "url").collect()))
    assert a == b


def test_exact_text_dedupe_min_id_wins(spark):
    rows = [(5, "same text"), (2, "same text"), (9, "other")]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = {r.doc_id for r in exact_text_dedupe(df).collect()}
    assert got == {2, 9}
