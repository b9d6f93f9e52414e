"""Unit invariants for operators.curation (the oracle parity lives in
tests/test_corpus_parity.py + tools/parity.py; these pin the semantic
contracts that SQL-replay alone doesn't state)."""

import os
import sys

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)

from pyspark.sql import functions as F  # noqa: E402

from lightfusion_spark.operators import curation  # noqa: E402
from lightfusion_spark.plans.audit import formatted_plan, join_nodes  # noqa: E402


def _docs(spark):
    rows = [
        (1, "alpha beta gamma delta epsilon", "src0", 30),
        (2, "alpha beta gamma delta epsilon", "src0", 30),  # dup of 1
        (3, "zeta eta theta iota kappa", "src1", 25),
        (4, "completely different words here now", "src1", 35),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, source string, n_chars long")


def test_decontaminate_flags_overlap_only(spark):
    d = _docs(spark)
    bench = d.where(F.col("doc_id") == 1)
    out = curation.decontaminate(d, bench, "doc_id", "text", n=3)
    got = {r["doc_id"]: r["contaminated"] for r in out.collect()}
    # 1 shares its own grams, 2 is its exact dup; 3 and 4 share nothing
    assert got == {1: True, 2: True, 3: False, 4: False}


def test_decontaminate_broadcasts_bench(spark):
    d = _docs(spark)
    out = curation.decontaminate(d, d.limit(1), "doc_id", "text")
    assert any(j.startswith("Broadcast") for j in join_nodes(formatted_plan(out)))


def test_pack_sequences_fills_in_order(spark):
    d = _docs(spark)
    out = curation.pack_sequences(
        d, "doc_id", F.size(F.split("text", r"\s+")), capacity=7, n_groups=1
    ).orderBy("doc_id")
    rows = out.collect()
    # single group: one pack per doc boundary where the running total crosses 7
    assert [r["pack_group"] for r in rows] == [0, 0, 0, 0]
    assert [r["pack_no"] for r in rows] == [0, 0, 1, 2]  # prev = 0, 5, 10, 15
    # pack_no is non-decreasing in fill order and every doc is assigned
    packs = [r["pack_no"] for r in rows]
    assert packs == sorted(packs)


def test_pack_sequences_groups_partition_independently(spark):
    d = _docs(spark)
    out = curation.pack_sequences(
        d, "doc_id", F.lit(4), capacity=8, n_groups=4
    )
    rows = out.collect()
    assert {r["pack_group"] for r in rows} <= set(range(4))
    # within a group the fill restarts at pack 0
    first = {}
    for r in sorted(rows, key=lambda r: r["doc_id"]):
        first.setdefault(r["pack_group"], r["pack_no"])
    assert all(v == 0 for v in first.values())


def test_mixture_sample_is_deterministic_and_capped(spark):
    d = _docs(spark)
    shares = {"src0": 0.7, "src1": 0.3}
    a = curation.mixture_sample(d, "source", "doc_id", "n_chars", shares, 1000, seed=3)
    b = curation.mixture_sample(d, "source", "doc_id", "n_chars", shares, 1000, seed=3)
    assert sorted(r["doc_id"] for r in a.collect()) == sorted(
        r["doc_id"] for r in b.collect()
    )
    assert a.agg(F.max("sample_rate")).first()[0] <= 1.0


def test_mixture_sample_drops_unlisted_strata(spark):
    d = _docs(spark)
    out = curation.mixture_sample(
        d, "source", "doc_id", "n_chars", {"src0": 1.0}, 10**9, seed=0
    )
    assert {r["source"] for r in out.collect()} == {"src0"}
    # budget >> corpus: rate caps at 1.0 and every src0 row survives
    assert out.count() == 2


def test_quality_rules_composite_gate(spark):
    d = _docs(spark)
    flags = curation.quality_rules(d, "doc_id", "text").collect()
    for r in flags:
        assert r["keep"] == (r["r_n_words"] and r["r_word_len"] and r["r_punct"])
