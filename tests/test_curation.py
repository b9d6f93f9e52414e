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


def test_split_is_deterministic_disjoint_and_total(spark):
    d = _docs(spark)
    a = curation.train_val_test_split(d, "doc_id", (0.5, 0.25, 0.25), seed=3)
    b = curation.train_val_test_split(d, "doc_id", (0.5, 0.25, 0.25), seed=3)
    got_a = {r["doc_id"]: r["split"] for r in a.collect()}
    got_b = {r["doc_id"]: r["split"] for r in b.collect()}
    assert got_a == got_b  # pure function of (id, seed)
    assert set(got_a) == {1, 2, 3, 4}  # total: every row assigned
    assert set(got_a.values()) <= {"train", "val", "test"}


def test_split_assignment_stable_under_corpus_growth(spark):
    d = _docs(spark)
    small = curation.train_val_test_split(d.where("doc_id <= 2"), "doc_id", seed=3)
    full = curation.train_val_test_split(d, "doc_id", seed=3)
    small_map = {r["doc_id"]: r["split"] for r in small.collect()}
    full_map = {r["doc_id"]: r["split"] for r in full.collect()}
    # adding docs 3/4 must not move docs 1/2 between splits
    assert all(full_map[k] == v for k, v in small_map.items())


def test_shard_assign_dense_positions_and_determinism(spark):
    d = _docs(spark)
    out = curation.shard_assign(d, "doc_id", n_shards=2, seed=1)
    rows = out.select("doc_id", "shard", "shard_pos").collect()
    by_shard = {}
    for r in rows:
        by_shard.setdefault(r["shard"], []).append(r["shard_pos"])
    for positions in by_shard.values():
        assert sorted(positions) == list(range(len(positions)))  # dense, 0-based
    again = {
        (r["doc_id"], r["shard"], r["shard_pos"])
        for r in curation.shard_assign(d, "doc_id", n_shards=2, seed=1).collect()
    }
    assert again == {(r["doc_id"], r["shard"], r["shard_pos"]) for r in rows}


def test_shard_assign_keeps_payload_columns(spark):
    d = _docs(spark)
    out = curation.shard_assign(d, "doc_id", n_shards=4)
    assert set(out.columns) == {"doc_id", "text", "source", "n_chars", "shard", "shard_pos"}


def test_quality_model_filter(spark):
    """Features -> LightGBM -> gate: p_keep orders documents by the
    fixture model's quality notion and the gate is the rounded-p
    threshold comparison (engine-reproducible by construction)."""
    import os

    from lightfusion_spark.ml.fixture import build_quality_model_text
    from lightfusion_spark.ml.lgbm_model import parse_model_str
    from lightfusion_spark.operators.curation import quality_model_filter

    from lightfusion_spark.fixtures import fixture_path

    model_path = fixture_path("models", "quality_cls.lgbm")
    docs = spark.createDataFrame(
        [
            (1, "the fast table scan and the merge join of the sort order table"),
            (2, "x!!! ???? ;;; ### !!!! ???? *** ((($$$)))"),
            (3, "word " * 80),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in quality_model_filter(
        spark, docs, "doc_id", "text", model_path).collect()}
    assert set(out) == {1, 2, 3}
    # independent reference: score the same features with the parsed model
    model = parse_model_str(build_quality_model_text())
    import numpy as np

    def feats(text):
        toks = text.lower().split()
        n = len(toks)
        awl = sum(len(t) for t in toks) / n
        import re as _re

        punct = len(_re.findall(r"[^A-Za-z0-9\s]", text)) / len(text)
        stop = sum(t in {"a", "and", "is", "of", "the"} for t in toks) / n
        return [float(n), awl, punct, stop]

    for doc_id, text in [(1, "the fast table scan and the merge join of the sort order table")]:
        p = model.predict(np.array([feats(text)]))[0][1]
        assert out[doc_id]["p_keep"] == round(float(p), 6)
    # the punctuation-soup doc must score lower than the clean one
    assert out[2]["p_keep"] < out[1]["p_keep"]
    assert all((r["keep"] == (r["p_keep"] >= 0.5)) for r in out.values())


def test_temperature_mixture_boosts_low_resource(spark):
    """T>1 must give the small stratum a HIGHER sampling rate than the
    natural mixture would, while T=1 reproduces the natural shares, and
    rates never exceed 1 (no upsampling)."""
    import pytest

    from lightfusion_spark.operators import curation

    rows = [(i, "big", 100) for i in range(90)] + [
        (i + 1000, "small", 100) for i in range(10)
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, n_chars long")

    def rates(t):
        kept = curation.temperature_mixture_sample(
            df, "source", "doc_id", "n_chars", temperature=t, token_budget=5000
        )
        return {
            r["source"]: r["sample_rate"]
            for r in kept.select("source", "sample_rate").distinct().collect()
        }

    r1, r5 = rates(1.0), rates(5.0)
    # T=1: q == p, so every stratum gets the SAME rate (budget/total)
    assert r1["big"] == pytest.approx(r1["small"], abs=2e-6)
    # T=5 boosts the small stratum's rate above the big one's
    assert r5["small"] > r5["big"]
    assert all(0 < v <= 1.0 for v in r5.values())
    with pytest.raises(ValueError, match="temperature"):
        curation.temperature_mixture_sample(
            df, "source", "doc_id", "n_chars", temperature=0.0, token_budget=5000
        )


def test_weighted_reservoir_is_deterministic_and_weight_biased(spark):
    """A-ES sampling: top-k by round(ln(u)/w, 6) — deterministic across
    runs/partitionings, excludes non-positive weights, and heavier rows
    win in expectation (checked exactly: one row carrying ~all the mass
    must always be drawn)."""
    from lightfusion_spark.operators.curation import weighted_reservoir_sample

    rows = [(i, "s", 1.0) for i in range(50)] + [(99, "s", 1e7), (100, "s", 0.0), (101, "s", -2.0)]
    df = spark.createDataFrame(rows, "doc_id long, source string, w double")
    got = weighted_reservoir_sample(df, "doc_id", "w", k=5, strata_col="source")
    ids = [r["doc_id"] for r in got.orderBy("rank").collect()]
    assert len(ids) == 5
    assert 99 in ids  # ln(u)/1e7 ~ 0- beats every unit-weight key
    assert 100 not in ids and 101 not in ids  # non-positive weights excluded
    again = weighted_reservoir_sample(
        df.repartition(7), "doc_id", "w", k=5, strata_col="source"
    )
    assert [r["doc_id"] for r in again.orderBy("rank").collect()] == ids


def test_decontaminate_bloom_equals_exact(spark, sf_dir):
    """The Bloom prefilter must be invisible in the OUTPUT (no false
    negatives; false positives die in the exact join) while measurably
    pruning the gram stream before the join."""
    from lightfusion_spark.operators.curation import (
        _md5_long,
        bloom_build,
        bloom_might_contain,
        decontaminate,
        decontaminate_bloom,
        doc_shingles,
    )
    from pyspark.sql import functions as F

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    bench = d.where(F.col("doc_id") % 7 == 0)
    exact = {tuple(r) for r in decontaminate(d, bench, "doc_id", "text").collect()}
    bloom = {tuple(r) for r in decontaminate_bloom(d, bench, "doc_id", "text").collect()}
    assert bloom == exact

    # the prefilter really prunes: non-bench grams mostly short-circuit
    grams = doc_shingles(d, "doc_id", "text", 3).select(
        _md5_long(F.col("shingle")).alias("g")
    )
    bg = doc_shingles(bench, "doc_id", "text", 3).select(
        _md5_long(F.col("shingle")).alias("g")
    ).distinct()
    words = bloom_build(bg, "g")
    total = grams.count()
    passed = grams.where(bloom_might_contain(F.col("g"), words, 1 << 17)).count()
    true_hits = grams.join(bg, "g").count()
    assert passed < total  # something was pruned
    # false-positive overhang stays small at this fill factor
    assert (passed - true_hits) / max(1, total - true_hits) < 0.05


def test_contamination_index_equals_one_shot_bloom(spark, sf_dir):
    """The prebuilt index composition must be output-identical to the
    one-shot decontaminate_bloom — on the full corpus AND on disjoint
    batches gated against the SAME index object (the continual-ingest
    contract: batch verdicts union to the full-corpus verdicts)."""
    from pyspark.sql import functions as F

    from lightfusion_spark.operators.curation import (
        contamination_index,
        decontaminate_bloom,
        decontaminate_bloom_indexed,
    )

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    bench = d.where(F.col("doc_id") % 7 == 0)
    idx = contamination_index(bench, "doc_id", "text")

    want = {tuple(r) for r in decontaminate_bloom(d, bench, "doc_id", "text").collect()}
    got_full = {
        tuple(r)
        for r in decontaminate_bloom_indexed(d, idx, "doc_id", "text").collect()
    }
    assert got_full == want and len(want) > 0

    got_batched: set = set()
    for i in (0, 1, 2):
        got_batched |= {
            tuple(r)
            for r in decontaminate_bloom_indexed(
                d.where(F.col("doc_id") % 3 == i), idx, "doc_id", "text"
            ).collect()
        }
    assert got_batched == want


def test_bloom_rejects_bad_geometry(spark):
    from lightfusion_spark.operators.curation import bloom_build

    df = spark.range(1).select(F.col("id").alias("g"))
    import pytest as _pytest

    with _pytest.raises(ValueError, match="multiple of 64"):
        bloom_build(df, "g", n_bits=100)


def test_ngram_novelty_flags_assembled_documents(spark):
    from lightfusion_spark.operators.dedup import ngram_novelty

    df = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon"),   # unique content
            (2, "the quick brown fox jumps"),        # copied verbatim by 3
            (3, "the quick brown fox jumps"),
            (4, "xy"),                               # too short: 0 grams
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in ngram_novelty(df, "doc_id", "text").collect()}
    assert rows[1]["novelty"] == 1.0
    assert rows[2]["novelty"] == 0.0 and rows[3]["novelty"] == 0.0  # fully shared
    assert rows[4]["n_grams"] == 0 and rows[4]["novelty"] is None
    assert rows[1]["n_grams"] == 3  # 5 tokens -> 3 trigrams


def test_source_overlap_matrix_containment(spark):
    from lightfusion_spark.operators.dedup import source_overlap_matrix

    df = spark.createDataFrame(
        [
            ("a", 1, "one two three four"),        # grams: {123, 234}
            ("b", 2, "one two three five six"),    # shares {123}
            ("c", 3, "totally different words here"),
        ],
        "source string, doc_id long, text string",
    )
    rows = {(r["source_a"], r["source_b"]): r
            for r in source_overlap_matrix(df, "source", "text").collect()}
    ab = rows[("a", "b")]
    assert ab["n_shared"] == 1 and ab["n_a"] == 2 and ab["n_b"] == 3
    assert ab["overlap_a"] == 0.5 and abs(ab["overlap_b"] - 0.333333) < 1e-6
    # disjoint sources produce NO row (inner join on shared grams)
    assert ("a", "c") not in rows and ("b", "c") not in rows


def test_bloom_probe_rejects_mismatched_word_array(spark):
    """A wrong-sized bit array would read NULL past the end of the literal
    and silently report 'absent' — a false NEGATIVE, the one failure mode
    a Bloom filter must never have.  Geometry mismatch raises instead."""
    import pytest as _pytest

    from lightfusion_spark.operators.curation import bloom_might_contain

    with _pytest.raises(ValueError, match="needs exactly"):
        bloom_might_contain(F.lit("x"), [0] * 10, n_bits=1 << 17)


def test_group_aware_split_no_group_straddles(spark):
    """Every row of a group must land in ONE split (the leakage
    invariant), assignment must match the row-level recipe applied to
    the group key, and growth must not migrate existing groups."""
    from lightfusion_spark.operators.curation import (
        group_aware_split,
        train_val_test_split,
    )

    df = spark.createDataFrame(
        [(i, f"g{i % 7}") for i in range(200)], "doc_id long, grp string"
    )
    parts = group_aware_split(df, "grp", (0.5, 0.25, 0.25), seed=3)
    per_group = (
        parts.groupBy("grp").agg(F.countDistinct("split").alias("k")).collect()
    )
    assert all(r["k"] == 1 for r in per_group)
    # equals the row-level operator keyed on the group column
    alt = train_val_test_split(
        df.select(F.col("grp").alias("gid")).distinct(), "gid", (0.5, 0.25, 0.25), 3
    ).collect()
    want = {r["gid"]: r["split"] for r in alt}
    got = {r["grp"]: r["split"] for r in parts.select("grp", "split").distinct().collect()}
    assert got == want
    # corpus growth: new rows of an EXISTING group join its split
    grown = group_aware_split(
        df.union(spark.createDataFrame([(999, "g3")], "doc_id long, grp string")),
        "grp", (0.5, 0.25, 0.25), seed=3,
    )
    assert {r["split"] for r in grown.where("grp = 'g3'").collect()} == {got["g3"]}


def test_calibration_report_bins_and_ece(spark):
    from lightfusion_spark.operators.curation import calibration_report

    rows = [
        # bin 0: scores 0.05/0.05, labels 0,1 -> mean 0.05, frac_pos 0.5
        (0.05, 0), (0.05, 1),
        # bin 9: 0.95 and the CLAMPED 1.0 edge, labels 1,1
        (0.95, 1), (1.0, 1),
        # bin 5: 0.55, label 0
        (0.55, 0),
    ]
    df = spark.createDataFrame(rows, "score double, label int")
    got = {r["bin"]: r for r in calibration_report(df, "score", "label").collect()}
    assert set(got) == {0, 5, 9}
    assert got[0]["n"] == 2 and got[0]["mean_score"] == 0.05 and got[0]["frac_pos"] == 0.5
    assert got[9]["n"] == 2 and got[9]["mean_score"] == 0.975 and got[9]["frac_pos"] == 1.0
    assert got[5]["gap"] == -0.55  # frac_pos 0 - mean 0.55
    # ECE from the emitted rows: sum(n/N * |gap|)
    n_total = sum(r["n"] for r in got.values())
    ece = sum(r["n"] / n_total * abs(r["gap"]) for r in got.values())
    assert abs(ece - (2 / 5 * 0.45 + 1 / 5 * 0.55 + 2 / 5 * 0.025)) < 1e-9
    # knob guard
    import pytest as _pytest

    with _pytest.raises(ValueError, match="n_bins"):
        calibration_report(df, "score", "label", n_bins=0)


def test_preference_pairs_invariants(spark):
    import pytest as _pytest

    from lightfusion_spark.operators.curation import preference_pairs

    rows = [
        # group a: 5 rows, scores 10..50 -> pairs (50,10),(40,20); 30 is the
        # middle row and must pair with nothing
        ("a", 1, 10.0), ("a", 2, 20.0), ("a", 3, 30.0),
        ("a", 4, 40.0), ("a", 5, 50.0),
        # group b: 2 rows with gap 0.5 -> killed by margin=1
        ("b", 6, 7.0), ("b", 7, 7.5),
        # group c: singleton -> cannot pair with itself
        ("c", 8, 99.0),
        # group d: tie on score -> deterministic id tie-break
        ("d", 9, 5.0), ("d", 10, 5.0), ("d", 11, 1.0), ("d", 12, 1.0),
    ]
    df = spark.createDataFrame(rows, "grp string, id long, score double")
    out = preference_pairs(
        df, "grp", "id", "score", max_pairs_per_group=2, margin=1.0
    ).collect()
    by_group = {}
    for r in out:
        by_group.setdefault(r["group"], []).append(r)
        assert r["chosen_id"] != r["rejected_id"]
        assert r["chosen_score"] - r["rejected_score"] >= 1.0
        assert r["score_gap"] == round(r["chosen_score"] - r["rejected_score"], 6)
    a = sorted((r["pair_rank"], r["chosen_id"], r["rejected_id"])
               for r in by_group["a"])
    assert a == [(1, 5, 1), (2, 4, 2)]  # middle row 3 never paired
    assert "b" not in by_group  # margin killed the weak pair
    assert "c" not in by_group  # singleton can't self-pair
    # tie-break: (5.0, id 9) beats (5.0, id 10); worst is (1.0, id 12)
    d = sorted((r["pair_rank"], r["chosen_id"], r["rejected_id"])
               for r in by_group["d"])
    assert d == [(1, 9, 12), (2, 10, 11)]
    with _pytest.raises(ValueError, match="max_pairs_per_group"):
        preference_pairs(df, "grp", "id", "score", max_pairs_per_group=0)


def test_curriculum_order_stages(spark):
    import pytest as _pytest

    from lightfusion_spark.operators.curation import curriculum_order

    df = spark.createDataFrame(
        [(i, float(100 - i)) for i in range(10)], "id long, score double"
    )
    out = curriculum_order(df, "id", "score", n_stages=4).collect()
    assert len(out) == 10
    stages = {}
    for r in out:
        stages.setdefault(r["stage"], []).append(r)
    # NTILE: first (10 % 4) = 2 stages get 3 rows, the rest 2
    assert sorted(len(v) for v in stages.values()) == [2, 2, 3, 3]
    assert len(stages[1]) == 3 and len(stages[2]) == 3
    # ascending: stage 1 holds the LOWEST scores (ids 8,9 have scores 92,91)
    assert {r["id"] for r in stages[1]} == {7, 8, 9}
    # stage_pos is 1..len within each stage following the same order
    for v in stages.values():
        assert sorted(r["stage_pos"] for r in v) == list(range(1, len(v) + 1))
    # descending flips stage membership
    rev = curriculum_order(df, "id", "score", n_stages=4, ascending=False).collect()
    rev_stages = {}
    for r in rev:
        rev_stages.setdefault(r["stage"], set()).add(r["id"])
    assert rev_stages[1] == {0, 1, 2}
    # NULL scores refused loudly
    with_null = spark.createDataFrame(
        [(1, 1.0), (2, None)], "id long, score double"
    )
    with _pytest.raises(ValueError, match="NULL"):
        curriculum_order(with_null, "id", "score")
    with _pytest.raises(ValueError, match="n_stages"):
        curriculum_order(df, "id", "score", n_stages=0)


def test_curriculum_order_matches_global_ntile(spark):
    """The scalable two-pass rank (range partition + offset decode) must
    reproduce the unpartitioned-NTILE semantics BIT-FOR-BIT — stage
    sizes, tie order, and stage_pos — across n/k shapes including
    n < k, ties, and both directions (the round-10 ADVICE rewrite)."""
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    from lightfusion_spark.operators.curation import curriculum_order

    cases = [(17, 4), (3, 5), (40, 7), (8, 1)]
    for n, k in cases:
        # deliberate score ties (i % 5): tie order must come from id
        df = spark.createDataFrame(
            [(i, float(i % 5)) for i in range(n)], "id long, score double"
        ).repartition(6)
        for asc in (True, False):
            got = sorted(
                map(
                    tuple,
                    curriculum_order(
                        df, "id", "score", n_stages=k, ascending=asc
                    ).collect(),
                )
            )
            order = (
                (F.col("score").asc(), F.col("id").asc())
                if asc
                else (F.col("score").desc(), F.col("id").desc())
            )
            ref = sorted(
                map(
                    tuple,
                    df.select(
                        "id",
                        "score",
                        F.ntile(k).over(W.orderBy(*order)).alias("stage"),
                    )
                    .select(
                        "id",
                        "score",
                        "stage",
                        F.row_number()
                        .over(W.partitionBy("stage").orderBy(*order))
                        .alias("stage_pos"),
                    )
                    .collect(),
                )
            )
            assert got == ref, (n, k, asc)


def test_global_row_number_exact_and_partition_invariant(spark):
    from pyspark.sql import functions as F

    from lightfusion_spark.operators.curation import global_row_number

    df = spark.createDataFrame(
        [(i, float((i * 37) % 11)) for i in range(123)],
        "id long, score double",
    )
    out = global_row_number(
        df.repartition(9), (F.col("score").asc(), F.col("id").asc()),
        rn_col="rn", num_partitions=5,
    ).collect()
    expect = sorted((r["score"], r["id"]) for r in out)
    got = {(r["score"], r["id"]): r["rn"] for r in out}
    assert sorted(got.values()) == list(range(1, 124))
    for rank, key in enumerate(expect, start=1):
        assert got[key] == rank


def test_decontaminate_fuzzy_catches_near_matches(spark):
    from lightfusion_spark.operators.curation import decontaminate_fuzzy

    bench_text = "the quick brown fox jumps over the lazy dog every single day"
    near = bench_text.replace("lazy", "sleepy")  # light paraphrase
    clean = "completely unrelated content about spark shuffle partitioning"
    corpus = spark.createDataFrame(
        [(1, bench_text), (2, near), (3, clean)], "doc_id long, text string"
    )
    bench = spark.createDataFrame([(100, bench_text)], "doc_id long, text string")
    got = {
        r["doc_id"]: r
        for r in decontaminate_fuzzy(corpus, bench, "doc_id", "text").collect()
    }
    assert set(got) == {1, 2, 3}  # every corpus row emitted
    assert got[1]["contaminated"] and got[1]["max_jaccard"] == 1.0
    assert got[2]["contaminated"] and 0.5 <= got[2]["max_jaccard"] < 1.0
    assert not got[3]["contaminated"]
    assert got[3]["max_jaccard"] is None and got[3]["n_bench_matches"] == 0


def test_diversity_sample_quota_and_determinism(spark, sf_dir):
    import pytest as _pytest

    from lightfusion_spark.operators.curation import diversity_sample

    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    out = diversity_sample(e, "vec_id", "embedding", quota_per_cluster=3,
                           n_centroids=8, seed=1)
    rows = out.collect()
    per_cell = {}
    for r in rows:
        per_cell.setdefault(r["centroid_id"], []).append(r["sample_rank"])
    # quota respected, ranks dense from 1
    for ranks in per_cell.values():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))
        assert len(ranks) <= 3
    # deterministic across re-runs and partitionings
    again = diversity_sample(e.repartition(7), "vec_id", "embedding",
                             quota_per_cluster=3, n_centroids=8, seed=1)
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again.collect()))
    # a different seed picks a different sample (overwhelmingly likely)
    other = diversity_sample(e, "vec_id", "embedding", quota_per_cluster=3,
                             n_centroids=8, seed=2)
    assert {r["vec_id"] for r in rows} != {r["vec_id"] for r in other.collect()}
    with _pytest.raises(ValueError, match="quota_per_cluster"):
        diversity_sample(e, "vec_id", "embedding", quota_per_cluster=0)


def test_corpus_drift_hand_computed_tv_and_top_token(spark):
    from lightfusion_spark.operators.curation import corpus_drift

    old = spark.createDataFrame([("s", "a a b")], "source string, text string")
    new = spark.createDataFrame([("s", "a b b")], "source string, text string")
    row = corpus_drift(old, new, "text").collect()[0]
    # p = {a: 2/3, b: 1/3}, q = {a: 1/3, b: 2/3} -> TV = 1/3
    assert row["tv"] == 0.333333
    assert row["n_tokens_old"] == 3 and row["n_tokens_new"] == 3
    assert row["vocab_old"] == 2 and row["vocab_new"] == 2 and row["vocab_union"] == 2
    # |delta_ppm| ties at 333333 for both tokens -> token-ascending tiebreak
    assert row["top_token"] == "a" and row["top_delta_ppm"] == 333333 - 666666


def test_corpus_drift_identical_snapshots_is_zero(spark):
    from lightfusion_spark.operators.curation import corpus_drift

    df = spark.createDataFrame(
        [("s", "x y z"), ("t", "p q")], "source string, text string"
    )
    for r in corpus_drift(df, df, "text").collect():
        assert r["tv"] == 0.0 and r["top_delta_ppm"] == 0


def test_corpus_drift_disjoint_support_is_exactly_one(spark):
    from lightfusion_spark.operators.curation import corpus_drift

    old = spark.createDataFrame([("s", "x x")], "source string, text string")
    new = spark.createDataFrame([("s", "y")], "source string, text string")
    assert corpus_drift(old, new, "text").collect()[0]["tv"] == 1.0


def test_corpus_drift_source_missing_from_one_snapshot(spark):
    from lightfusion_spark.operators.curation import corpus_drift

    old = spark.createDataFrame(
        [("s", "a b"), ("gone", "w w")], "source string, text string"
    )
    new = spark.createDataFrame(
        [("s", "a b"), ("fresh", "v")], "source string, text string"
    )
    got = {r["source"]: r for r in corpus_drift(old, new, "text").collect()}
    assert set(got) == {"s", "gone", "fresh"}
    assert got["s"]["tv"] == 0.0
    assert got["gone"]["tv"] == 1.0 and got["gone"]["n_tokens_new"] == 0
    assert got["fresh"]["tv"] == 1.0 and got["fresh"]["n_tokens_old"] == 0


def test_corpus_drift_partition_invariant_bitwise(spark):
    from lightfusion_spark.operators.curation import corpus_drift

    rows = [(f"s{i % 3}", f"tok{i % 11} tok{i % 7} tok{i % 5}") for i in range(200)]
    old = spark.createDataFrame(rows[:150], "source string, text string")
    new = spark.createDataFrame(rows[50:], "source string, text string")
    a = sorted(map(tuple, corpus_drift(old.repartition(1), new.repartition(1), "text").collect()))
    b = sorted(map(tuple, corpus_drift(old.repartition(13), new.repartition(7), "text").collect()))
    assert a == b  # integer cross-products: partitioning can't flip a bit


def test_corpus_drift_indexed_equals_one_shot(spark, sf_dir):
    """The prebuilt-reference gate must be output-identical to the
    one-shot operator on every batch slice (it runs the same
    _drift_report over the same count tables)."""
    from pyspark.sql import functions as F

    from lightfusion_spark.operators.curation import (
        corpus_drift,
        corpus_drift_index,
        corpus_drift_indexed,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    ref = docs.where(F.col("doc_id") % 3 == 0)
    idx = corpus_drift_index(ref, "text")
    for k in range(3):
        batch = docs.where(F.col("doc_id") % 3 == k)
        got = sorted(map(tuple, corpus_drift_indexed(batch, idx, "text").collect()))
        want = sorted(map(tuple, corpus_drift(ref, batch, "text").collect()))
        assert got == want and len(want) > 0


def test_numeric_drift_hand_computed(spark):
    """Two strata, hand-checkable bins on a [0,10)/5-bin grid (width 2):
    stratum s shifts half its mass one bin right -> TV = 0.5."""
    from lightfusion_spark.operators.curation import numeric_drift

    old = spark.createDataFrame(
        [("s", 1.0), ("s", 1.5), ("t", 9.0)], "g string, v double"
    )
    new = spark.createDataFrame(
        [("s", 1.0), ("s", 3.0), ("t", 9.5)], "g string, v double"
    )
    rows = {r["stratum"]: r for r in numeric_drift(old, new, "g", "v", 0.0, 10.0, 5).collect()}
    # s: old = {bin0: 2}, new = {bin0: 1, bin1: 1} -> TV = 0.5
    assert rows["s"]["tv"] == 0.5
    assert rows["s"]["n_values_old"] == 2 and rows["s"]["n_values_new"] == 2
    # top mover: bin0 lost 500000 ppm, bin1 gained 500000 -> tie, bin0 wins
    assert rows["s"]["top_bin"] == 0 and rows["s"]["top_delta_ppm"] == -500000
    # t: both values land in bin4 -> no drift
    assert rows["t"]["tv"] == 0.0


def test_numeric_drift_ignores_nulls_and_clamps(spark):
    from lightfusion_spark.operators.curation import numeric_drift

    old = spark.createDataFrame([("s", 1.0), ("s", None)], "g string, v double")
    new = spark.createDataFrame([("s", -50.0)], "g string, v double")  # clamps to bin 0
    row = numeric_drift(old, new, "g", "v", 0.0, 10.0, 5).collect()[0]
    assert row["n_values_old"] == 1  # the NULL is excluded
    assert row["tv"] == 0.0  # 1.0 -> bin0 and the clamped -50.0 -> bin0


def test_numeric_drift_indexed_equals_one_shot(spark, sf_dir):
    """The prebuilt-reference numeric gate must be output-identical to
    the one-shot operator on every batch slice."""
    from pyspark.sql import functions as F

    from lightfusion_spark.operators.curation import (
        numeric_drift,
        numeric_drift_index,
        numeric_drift_indexed,
    )

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    ref = ev.where(F.col("event_id") % 3 == 0)
    idx = numeric_drift_index(ref, "event_type", "value", 0.0, 512.0, 64)
    for k in range(3):
        batch = ev.where(F.col("event_id") % 3 == k)
        got = sorted(map(tuple, numeric_drift_indexed(batch, idx).collect()))
        want = sorted(
            map(
                tuple,
                numeric_drift(
                    ref, batch, "event_type", "value", 0.0, 512.0, 64
                ).collect(),
            )
        )
        assert got == want and len(want) > 0


def test_shard_balanced_evens_total_size(spark):
    """Skewed sizes: snake allocation keeps per-shard totals within one
    max-document of each other, where hash sharding only balances row
    counts; assignment is partition-invariant and matches the
    ROW_NUMBER replay."""
    import pytest as _pytest
    from pyspark.sql import functions as F

    from lightfusion_spark.operators.curation import shard_balanced

    # Zipf-ish sizes: one huge doc, a heavy tail
    rows = [(i, 10_000 if i == 0 else (1000 // (1 + i % 37)) + i % 13)
            for i in range(200)]
    df = spark.createDataFrame(rows, "id long, size long")
    out = shard_balanced(df.repartition(9), "id", "size", n_shards=4)
    sums = {
        r["shard"]: r["s"]
        for r in out.groupBy("shard").agg(F.sum("size").alias("s")).collect()
    }
    assert set(sums) == {0, 1, 2, 3}
    # balance bound: excluding the single outlier doc's shard, totals are
    # within the largest *tail* item of each other; with it, within the
    # outlier.  Check the practical bound: max-min <= max single size.
    assert max(sums.values()) - min(sums.values()) <= 10_000
    # the non-outlier shards should be truly tight
    tail = sorted(sums.values())[:3]
    assert max(tail) - min(tail) <= 1000
    # partition invariance
    again = shard_balanced(df.repartition(3), "id", "size", n_shards=4)
    assert sorted(map(tuple, out.collect())) == sorted(map(tuple, again.collect()))
    # guards
    with _pytest.raises(ValueError, match="n_shards"):
        shard_balanced(df, "id", "size", n_shards=0)
    with_null = spark.createDataFrame([(1, None), (2, 5)], "id long, size long")
    with _pytest.raises(ValueError, match="NULL"):
        shard_balanced(with_null, "id", "size", n_shards=2)


def test_shard_balanced_beats_hash_sharding_on_skew(spark):
    """The reason the operator exists: on a skewed corpus the size
    imbalance of hash shards is an order of magnitude worse."""
    from pyspark.sql import functions as F

    from lightfusion_spark.operators.curation import shard_assign, shard_balanced

    rows = [(i, (i * 997) % 5000 + 1) for i in range(2000)]
    df = spark.createDataFrame(rows, "id long, size long")

    def imbalance(assigned):
        s = [r["s"] for r in assigned.groupBy("shard")
             .agg(F.sum("size").alias("s")).collect()]
        return (max(s) - min(s)) / (sum(s) / len(s))

    bal = imbalance(shard_balanced(df, "id", "size", n_shards=8))
    hashed = imbalance(shard_assign(df, "id", n_shards=8).select("shard", "size"))
    assert bal < 0.01
    assert bal < hashed / 5


def _unimax_ref(sizes, E, num, den):
    """Independent driver-side water-filler."""
    B = sum(sizes.values()) * num // den
    caps = sorted(((sz * E, s) for s, sz in sizes.items()))
    N = len(caps)
    allocs, uncapped, prefix = {}, [], 0
    for idx, (c, s) in enumerate(caps):
        if not uncapped and c * (N - idx) <= B - prefix:
            allocs[s] = c
            prefix += c
        else:
            uncapped.append(s)
    rem, K = B - prefix, len(uncapped)
    base, lo = (rem // K, rem % K) if K else (0, 0)
    for r, s in enumerate(uncapped, 1):
        allocs[s] = base + (1 if r <= lo else 0)
    return B, allocs


def test_unimax_matches_water_filling_reference(spark):
    sizes = {"s0": 10, "s1": 40, "s2": 40, "s3": 200, "s4": 1000}
    data = []
    for s, sz in sizes.items():
        data += [(s, sz // 2), (s, sz - sz // 2)]
    df = spark.createDataFrame(data, "src string, tok long")
    out = curation.unimax_allocate(df, "src", "tok", max_epochs=3)
    got = {r["strata"]: (r["stratum_tokens"], r["cap"], r["alloc"], r["epochs"])
           for r in out.collect()}
    B, allocs = _unimax_ref(sizes, 3, 1, 2)
    assert got == {s: (sz, sz * 3, allocs[s], allocs[s] / sz)
                   for s, sz in sizes.items()}
    # allocations sum EXACTLY to the spendable budget — no rounding drift
    assert sum(a for _, _, a, _ in got.values()) == min(
        B, sum(sz * 3 for sz in sizes.values()))
    # monster source is held at the equal share, tiny source fully repeated
    assert got["s0"][3] == 3.0 and got["s4"][3] < 1.0
    # partition invariance
    again = {r["strata"]: r["alloc"] for r in curation.unimax_allocate(
        df.repartition(7), "src", "tok", max_epochs=3).collect()}
    assert again == {s: a for s, (_, _, a, _) in got.items()}


def test_unimax_all_capped_and_guards(spark):
    import pytest as _pytest

    df = spark.createDataFrame(
        [("a", 10), ("b", 30)], "src string, tok long")
    # budget 9x total: every source capped at its max epochs
    out = curation.unimax_allocate(
        df, "src", "tok", max_epochs=2, budget_frac=(9, 1)).collect()
    assert all(r["alloc"] == r["cap"] and r["epochs"] == 2.0 for r in out)
    # leftover tokens go to the FIRST uncapped strata in cap order
    df2 = spark.createDataFrame(
        [("a", 100), ("b", 100), ("c", 101)], "src string, tok long")
    got = {r["strata"]: r["alloc"] for r in curation.unimax_allocate(
        df2, "src", "tok", max_epochs=5, budget_frac=(1, 3)).collect()}
    # budget = 301//3 = 100; nobody capped; base 33 rem 1 -> a gets 34
    assert got == {"a": 34, "b": 33, "c": 33}
    with _pytest.raises(ValueError, match="max_epochs"):
        curation.unimax_allocate(df, "src", "tok", max_epochs=0)
    with _pytest.raises(ValueError, match="budget_frac"):
        curation.unimax_allocate(df, "src", "tok", 2, budget_frac=(0, 2))


def test_pack_efficiency_predicts_pack_sequences(spark):
    """pack_efficiency_report is pack_sequences' capacity sweep: at
    each capacity its n_packs equals the packs pack_sequences actually
    makes (sum over groups of max pack_no + 1), and the split/waste
    arithmetic matches a shared-nothing reference over the same hash
    groups and id order."""
    import hashlib
    from collections import defaultdict

    from pyspark.sql import functions as F

    from lightfusion_spark.operators import curation

    rows = [(i, (i * 13) % 50 + 1) for i in range(200)]
    rows.append((200, 150))  # longer than capacity 32: multi-crossing
    rows.append((201, 0))  # zero-token doc: never a crossing
    df = spark.createDataFrame(rows, "doc_id long, n_tokens long")

    got = {
        r["capacity"]: r.asDict()
        for r in curation.pack_efficiency_report(
            df, "doc_id", "n_tokens", capacities=(32, 64), n_groups=8
        ).collect()
    }

    def md5grp(i):
        return int(hashlib.md5(str(i).encode()).hexdigest()[:14], 16) % 8

    def round6(x):
        # Spark's ROUND is half-up; Python's is banker's — and the
        # power-of-two capacities land fill_rate exactly on .5
        # boundaries at the 6th decimal
        import decimal

        return float(
            decimal.Decimal(repr(x)).quantize(
                decimal.Decimal("0.000001"), rounding=decimal.ROUND_HALF_UP
            )
        )

    by_grp = defaultdict(list)
    for i, t in rows:
        by_grp[md5grp(i)].append((i, t))
    for cap in (32, 64):
        n_split = n_cross = n_packs = waste = 0
        for g, docs in by_grp.items():
            run = 0
            for _i, t in sorted(docs):
                if t > 0:
                    x = (run + t - 1) // cap - run // cap
                    n_cross += x
                    n_split += 1 if x > 0 else 0
                run += t
            if run > 0:
                packs = (run - 1) // cap + 1
                n_packs += packs
                waste += packs * cap - run
        r = got[cap]
        assert r["n_docs"] == len(rows)
        assert r["n_tokens"] == sum(t for _, t in rows)
        assert r["n_packs"] == n_packs
        assert r["n_split_docs"] == n_split
        assert r["n_crossings"] == n_cross
        assert r["tail_waste_tokens"] == waste
        assert r["split_rate6"] == round6(n_split / len(rows))
        assert r["fill_rate6"] == round6(
            sum(t for _, t in rows) / (n_packs * cap)
        )

    # relation to pack_sequences' ASSIGNMENT ids: the token-stream
    # sequence count exceeds sum(max(pack_no)+1) by exactly the
    # crossings of each group's FINAL document (docstring identity)
    for cap in (32, 64):
        packed = curation.pack_sequences(
            df, "doc_id", "n_tokens", capacity=cap, n_groups=8
        )
        id_packs = (
            packed.where(F.col("n_tokens") > 0)
            .groupBy("pack_group")
            .agg((F.max("pack_no") + 1).alias("p"))
            .agg(F.sum("p"))
            .collect()[0][0]
        )
        last_crossings = 0
        for g, docs in by_grp.items():
            run = 0
            last = None
            for _i, t in sorted(docs):
                if t > 0:
                    last = ((run + t - 1) // cap) - (run // cap)
                run += t
            if last is not None:
                last_crossings += last
        assert got[cap]["n_packs"] == id_packs + last_crossings


def test_pack_division_exact_past_double_precision(spark):
    """r15 advice: pack/crossing counts now use integer DIV, not
    floor-after-double-division.  At prev = 2^45*2048 - 1 the double
    quotient 2^45 - 1/2048 rounds UP to 2^45 (ulp at 2^45 is 2^-7 >
    2/2048), so the old floor(double) path mis-assigned the next doc
    by one whole pack; `div` is exact at any running total."""
    cap = 2048
    big = (1 << 45) * cap - 1  # prev of the second doc
    rows = [(1, big), (2, 5)]
    df = spark.createDataFrame(rows, "doc_id long, tok long")
    got = {
        r["doc_id"]: r["pack_no"]
        for r in curation.pack_sequences(
            df, "doc_id", "tok", capacity=cap, n_groups=1
        ).collect()
    }
    assert got[1] == 0
    assert got[2] == big // cap == (1 << 45) - 1  # double path said 2^45

    rep = {
        r["capacity"]: r.asDict()
        for r in curation.pack_efficiency_report(
            df, "doc_id", "tok", capacities=(cap,), n_groups=1
        ).collect()
    }[cap]
    total = big + 5
    n_packs = (total - 1) // cap + 1
    assert rep["n_packs"] == n_packs
    assert rep["tail_waste_tokens"] == n_packs * cap - total
    # doc 2 starts at offset big = 2^45*2048 - 1, one token before a
    # boundary, and is 5 tokens long -> exactly one crossing
    assert rep["n_crossings"] == ((big - 1) // cap - 0) + (
        (big + 5 - 1) // cap - big // cap
    )
    assert rep["n_split_docs"] == 2
