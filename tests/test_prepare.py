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


def test_winnowing_shared_run_shares_fingerprint(spark):
    """MOSS guarantee: two docs sharing a run of >= window+k-1 tokens
    (here 6) share at least one winnowed fingerprint; disjoint docs
    share none."""
    from ctinexus_spark.operators.textops import winnowed_fingerprints

    shared = "alpha beta gamma delta epsilon zeta"
    docs = spark.createDataFrame(
        [
            (1, f"intro words {shared} trailing stuff here"),
            (2, f"{shared} completely different ending tokens now"),
            (3, "nothing in common with the others at all kept long enough"),
        ],
        "doc_id int, text string",
    )
    fps = winnowed_fingerprints(docs)
    by_doc = {}
    for r in fps.collect():
        by_doc.setdefault(r.doc_id, set()).add(r.fingerprint)
    assert by_doc[1] & by_doc[2]
    assert not (by_doc[1] & by_doc[3])
    assert not (by_doc[2] & by_doc[3])
