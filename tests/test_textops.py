

def test_bpe_merge_pairs_counts_and_rank(spark):
    from ctinexus_spark.operators.textops import bpe_merge_pairs

    docs = spark.createDataFrame(
        [(1, "ab cd ab cd"), (2, "ab cd x1")], "doc_id int, text string"
    )
    got = [(r.left, r.right, r.freq, r.rank) for r in bpe_merge_pairs(docs, k=10).collect()]
    # pieces doc1: ab cd ab cd → pairs (ab,cd)x2 (cd,ab)x1
    # pieces doc2: ab cd x (digit-run split: 'x','1') → (ab,cd) (cd,x) (x,1)
    assert got[0] == ("ab", "cd", 3, 1)
    assert ("cd", "ab", 1, 2) in got  # tie group ordered by (left, right)
    assert len(got) == 4


def test_token_pmi_surfaces_collocation(spark):
    from ctinexus_spark.operators.textops import token_pmi

    # "hong kong" always adjacent; filler tokens are frequent alone
    rows = [(i, "the of hong kong the of and") for i in range(5)]
    docs = spark.createDataFrame(rows, "doc_id int, text string")
    got = token_pmi(docs, min_count=3, k=5).collect()
    assert got[0].left == "hong" and got[0].right == "kong" and got[0].rank == 1
    # exact ratio: n_pair=5, N=35, P=30, n_hong=n_kong=5
    assert got[0].pmi_ratio == (5.0 * 35.0 * 35.0) / (30.0 * 5.0 * 5.0)


def test_dup_gram_fraction_cross_doc_shared_spans(spark):
    from ctinexus_spark.operators.prepare import dup_gram_fraction

    docs = spark.createDataFrame(
        [
            (1, "shared three gram one unique alpha"),
            (2, "shared three gram two unique beta"),
            (3, "totally different text here now"),
            (4, "xy"),  # shorter than n → zero grams
        ],
        "doc_id int, text string",
    )
    got = {r.doc_id: r for r in dup_gram_fraction(docs, n=3).collect()}
    # docs 1/2 share exactly the 3-gram "shared three gram"
    assert got[1].n_grams == 4 and got[1].n_shared == 1
    assert got[1].dup_fraction == 0.25
    assert got[2].n_shared == 1
    assert got[3].n_shared == 0 and got[3].dup_fraction == 0.0
    assert got[4].n_grams == 0 and got[4].dup_fraction == 0.0


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
