import math

import pytest
from pyspark.sql import functions as F

from lightfusion_spark.operators import nbayes


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (0, "sport", "goal match team goal"),
        (1, "sport", "team match win"),
        (2, "sport", "goal win team"),
        (3, "finance", "stock bond market stock"),
        (4, "finance", "market bond yield"),
        (5, "finance", "stock yield market"),
    ]
    return spark.createDataFrame(rows, "doc_id long, label string, text string")


def test_train_logps_match_closed_form(corpus):
    """logp6 == ROUND(LN((c+1)/(tc+V)), 6) for a hand-checkable cell."""
    priors, model = nbayes.train_naive_bayes(corpus, "label", "text")
    m = {(r["label"], r["token"]): r["logp6"] for r in model.collect()}
    # vocab = 8 distinct tokens; sport tokens total = 10, 'goal' count = 3
    v, tc, c = 8, 10, 3
    assert m[("sport", "goal")] == round(math.log((c + 1.0) / (tc + 1.0 * v)), 6)
    # smoothing floor: 'stock' never appears under sport but has a row
    assert m[("sport", "stock")] == round(math.log(1.0 / (tc + 1.0 * v)), 6)
    p = {r["label"]: r["logprior6"] for r in priors.collect()}
    assert p["sport"] == round(math.log(3.0 / 6.0), 6)
    # dense V x C grid
    assert len(m) == v * 2


def test_apply_recovers_separable_classes(corpus):
    priors, model = nbayes.train_naive_bayes(corpus, "label", "text")
    pred = nbayes.apply_naive_bayes(corpus, "doc_id", "text", priors, model)
    got = {r["doc_id"]: r["pred"] for r in pred.collect()}
    truth = {r["doc_id"]: r["label"] for r in corpus.collect()}
    assert got == truth


def test_oov_doc_falls_back_to_prior_tiebreak(spark, corpus):
    """A doc with only out-of-vocabulary tokens scores priors alone;
    equal priors tie-break by label ASC — deterministic."""
    priors, model = nbayes.train_naive_bayes(corpus, "label", "text")
    oov = spark.createDataFrame([(99, "zzz qqq")], "doc_id long, text string")
    row = nbayes.apply_naive_bayes(oov, "doc_id", "text", priors, model).first()
    assert row["pred"] == "finance"  # ln(0.5) both; 'finance' < 'sport'
    assert row["score_micro"] == math.floor(round(math.log(0.5), 6) * 1e6 + 0.5)


def test_max_vocab_cut_is_deterministic(corpus):
    """Top-N by (tf DESC, token ASC): with N=3 the vocab is the three
    most frequent tokens, alphabetical at ties."""
    _, model = nbayes.train_naive_bayes(corpus, "label", "text", max_vocab=3)
    vocab = {r["token"] for r in model.select("token").distinct().collect()}
    # tfs: goal 3, market 3, stock 3, team 3, bond 2, match 2, win 2, yield 2
    assert vocab == {"goal", "market", "stock"}


def test_train_refuses_nulls(spark):
    bad = spark.createDataFrame(
        [(0, "a", "x y"), (1, None, "x")], "doc_id long, label string, text string"
    )
    with pytest.raises(ValueError, match="NULL"):
        nbayes.train_naive_bayes(bad, "label", "text")


def test_scores_are_exact_integers_partition_invariant(corpus):
    """score_micro is a BIGINT sum — repartitioning cannot change it."""
    priors, model = nbayes.train_naive_bayes(corpus, "label", "text")
    a = nbayes.apply_naive_bayes(corpus, "doc_id", "text", priors, model)
    b = nbayes.apply_naive_bayes(
        corpus.repartition(7), "doc_id", "text", priors, model
    )
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))
