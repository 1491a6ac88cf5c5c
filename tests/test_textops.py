

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
