

def test_vocab_topk_order_and_ties(spark):
    from ctinexus_spark.operators.textops import vocab_topk

    docs = spark.createDataFrame(
        [(1, "b a a c b a"), (2, "c d b")], "doc_id int, text string"
    )
    got = vocab_topk(docs, k=3).collect()
    # freqs: a=3 b=3 c=2 d=1; tie a/b breaks on token asc
    assert [(r.token, r.freq, r.rank) for r in got] == [
        ("a", 3, 1),
        ("b", 3, 2),
        ("c", 2, 3),
    ]


def test_dsir_features_upweights_target_like_docs(spark):
    """Docs resembling the target subset must get mean_p_target >
    mean_p_corpus; off-target docs the reverse (the DSIR selection
    signal). Self-trained scores stay consistent with lm_scores."""
    from pyspark.sql import functions as F

    from ctinexus_spark.operators.textops import bigram_lm_scores, dsir_features

    rows = [
        (1, "the cat sat on the mat and the cat ran", "en"),
        (2, "the dog sat on the mat and the dog ran", "en"),
        (3, "le chien dort sur le tapis et le chien court", "fr"),
        (4, "le chat dort sur le tapis et le chat court", "fr"),
    ]
    docs = spark.createDataFrame(rows, "doc_id int, text string, lang string")
    target = docs.filter(F.col("lang") == "en")
    got = {r.doc_id: r for r in dsir_features(docs, target).collect()}
    assert got[1].mean_p_target > got[1].mean_p_corpus
    assert got[2].mean_p_target > got[2].mean_p_corpus
    assert got[3].mean_p_target < got[3].mean_p_corpus
    assert got[1].log_weight > 0 > got[3].log_weight
    # corpus side of dsir == self-trained lm_scores (left-join no-op)
    lm = {r.doc_id: r.mean_prob for r in bigram_lm_scores(docs).collect()}
    for d in (1, 2, 3, 4):
        assert abs(got[d].mean_p_corpus - lm[d]) == 0.0
