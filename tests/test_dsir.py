import math

import pytest
from pyspark.sql import functions as F

from lightfusion_spark.operators import curation


@pytest.fixture(scope="module")
def corpora(spark):
    # raw: half sporty, half financial; target: sporty only
    raw = spark.createDataFrame(
        [(i, "goal match team win goal") for i in range(10)]
        + [(i, "stock bond market yield stock") for i in range(10, 20)],
        "doc_id long, text string",
    )
    target = spark.createDataFrame(
        [(100 + i, "goal team match win") for i in range(5)],
        "doc_id long, text string",
    )
    return raw, target


def test_dsir_weights_separate_domains(corpora):
    """Docs from the target-like domain must outweigh the rest, and the
    two domains' weights must be internally identical (same text ->
    same grams -> same weight)."""
    raw, target = corpora
    w = curation.dsir_weights(raw, target, "doc_id", "text", n_buckets=256)
    got = {r["doc_id"]: r["logw_micro"] for r in w.collect()}
    sport = {got[i] for i in range(10)}
    fin = {got[i] for i in range(10, 20)}
    assert len(sport) == 1 and len(fin) == 1
    assert sport.pop() > fin.pop()


def test_dsir_weights_empty_doc_is_neutral(spark, corpora):
    raw, target = corpora
    plus = raw.union(
        spark.createDataFrame([(99, "   ")], "doc_id long, text string")
    )
    w = curation.dsir_weights(plus, target, "doc_id", "text", n_buckets=256)
    assert w.where(F.col("doc_id") == 99).first()["logw_micro"] == 0


def test_dsir_weights_match_numpy_reference(spark):
    """Hash-free cross-check: one bucket per gram is infeasible, so use
    a tiny corpus where we can enumerate gram->bucket with the same md5
    scheme and recompute the weight in Python."""
    import hashlib

    raw = spark.createDataFrame(
        [(0, "aa bb"), (1, "cc dd")], "doc_id long, text string"
    )
    target = spark.createDataFrame([(9, "aa bb")], "doc_id long, text string")
    B, a = 64, 1.0

    def bucket(gram, seed=17):
        h = int(hashlib.md5(f"{seed}:{gram}".encode()).hexdigest()[:14], 16)
        return h % B

    def counts(docs):
        c = {}
        for t in docs:
            toks = t.split()
            grams = toks + [f"{x} {y}" for x, y in zip(toks, toks[1:])]
            for gm in grams:
                c[bucket(gm)] = c.get(bucket(gm), 0) + 1
        return c

    cr, ct = counts(["aa bb", "cc dd"]), counts(["aa bb"])
    tr, tt = sum(cr.values()), sum(ct.values())

    def lp(c, t):
        return math.floor(round(math.log((c + a) / (t + a * B)), 6) * 1e6 + 0.5)

    def logw(text):
        toks = text.split()
        grams = toks + [f"{x} {y}" for x, y in zip(toks, toks[1:])]
        return sum(
            lp(ct.get(bucket(gm), 0), tt) - lp(cr.get(bucket(gm), 0), tr)
            for gm in grams
        )

    got = {
        r["doc_id"]: r["logw_micro"]
        for r in curation.dsir_weights(
            raw, target, "doc_id", "text", n_buckets=B
        ).collect()
    }
    assert got == {0: logw("aa bb"), 1: logw("cc dd")}


def test_dsir_select_is_deterministic_and_capped(corpora):
    raw, target = corpora
    s1 = curation.dsir_select(raw, target, "doc_id", "text", k=5, n_buckets=256)
    s2 = curation.dsir_select(
        raw.repartition(7), target, "doc_id", "text", k=5, n_buckets=256
    )
    r1 = sorted(map(tuple, s1.collect()))
    assert r1 == sorted(map(tuple, s2.collect()))
    assert len(r1) == 5
    # resampling follows the weights: most picks come from the target-like half
    picked = [t[0] for t in r1]
    assert sum(1 for d in picked if d < 10) >= 4


def test_dsir_guards(corpora):
    raw, target = corpora
    with pytest.raises(ValueError, match="n_buckets"):
        curation.dsir_weights(raw, target, "doc_id", "text", n_buckets=1)
