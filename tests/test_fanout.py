"""Degenerate-parallelism guard (operators/fanout.py).

The r17 optimization round parallelizes per-row-heavy operators by
repartitioning single-split scans to cluster parallelism (guide §2.5,
"input skew — repartition immediately after the read").  These tests pin
the gate semantics — fires exactly on narrow file scans, structural
no-op everywhere else — and the bit-identity of a guarded operator's
cells across partitioning.
"""

import os

import pytest
from pyspark.sql import functions as F

from lightfusion_spark.operators.fanout import fan_out, scan_splits


@pytest.fixture(scope="module")
def one_file_parquet(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("fanout") / "one.parquet")
    spark.range(2000).select(
        F.col("id"),
        F.concat(F.lit("token a b c d "), F.col("id").cast("string")).alias(
            "text"
        ),
    ).coalesce(1).write.parquet(path)
    return path


def test_scan_splits_counts_single_file(spark, one_file_parquet):
    df = spark.read.parquet(one_file_parquet)
    assert scan_splits(df) == 1


def test_scan_splits_none_for_memory_relation(spark):
    assert scan_splits(spark.range(10)) is None


def test_fan_out_spreads_narrow_scan(spark, one_file_parquet):
    df = spark.read.parquet(one_file_parquet)
    out = fan_out(df)
    target = spark.sparkContext.defaultParallelism
    assert out.rdd.getNumPartitions() == target


def test_scan_splits_enough_skips_file_stats(spark, tmp_path, monkeypatch):
    # the wide-scan short-circuit: when the file count already reaches
    # ``enough``, scan_splits must decide from the file list alone —
    # zero per-file getFileStatus RPCs (a warehouse table can have 10^5
    # files; the repartition branch can never fire there anyway)
    path = str(tmp_path / "many.parquet")
    spark.range(1000).repartition(6).write.parquet(path)
    df = spark.read.parquet(path)
    from lightfusion_spark.operators import fanout

    def _boom(spark_):  # any stat attempt would need maxPartitionBytes first
        raise AssertionError("file stats must not be consulted")

    monkeypatch.setattr(fanout, "_max_partition_bytes", _boom)
    assert fanout.scan_splits(df, enough=4) == 6
    assert fanout.fan_out(df, target=4) is df
    # below the bound the exact path still runs (and would call _boom)
    with pytest.raises(AssertionError):
        fanout.scan_splits(df, enough=100)


def test_fan_out_noop_on_memory_relation(spark):
    df = spark.range(10)
    assert fan_out(df) is df


def test_fan_out_noop_when_scan_already_wide(spark, tmp_path):
    path = str(tmp_path / "wide.parquet")
    target = spark.sparkContext.defaultParallelism
    spark.range(1000).repartition(target + 2).write.parquet(path)
    df = spark.read.parquet(path)
    assert scan_splits(df) >= target
    assert fan_out(df) is df


def test_fan_out_noop_when_target_one(spark, one_file_parquet):
    df = spark.read.parquet(one_file_parquet)
    assert fan_out(df, target=1) is df


def test_guarded_cells_bit_identical(spark, one_file_parquet):
    # the correctness contract the guard relies on: additive integer
    # cells are partitioning-invariant — a guarded operator returns the
    # same rows whether its scan had 1 split or cluster parallelism
    from lightfusion_spark.operators.evalmetrics import bleu_cells

    df = spark.read.parquet(one_file_parquet).select(
        F.col("id").cast("string").alias("pair_id"),
        F.col("text").alias("cand"),
        F.concat(F.lit("token a b x d "), F.col("id").cast("string")).alias(
            "ref"
        ),
    )
    cells = bleu_cells(df, "pair_id", "cand", "ref").orderBy("n").collect()
    wide = (
        bleu_cells(df.repartition(7), "pair_id", "cand", "ref")
        .orderBy("n")
        .collect()
    )
    assert [r.asDict() for r in cells] == [r.asDict() for r in wide]
    assert cells[0]["matched"] > 0


def test_pin_preserves_rows_and_dedups_consumers(spark):
    # pin() shares a multi-consumer intermediate: results are identical
    # to the unpinned plan, and the pinned frame's consumers read ONE
    # materialization (the qa_em_f1 / temperature_mixture_sample /
    # pipe_mixture_domain shape).
    from lightfusion_spark.operators.fanout import pin

    base = spark.range(100).select(
        F.col("id"),
        (F.col("id") % 7).alias("k"),
        (F.col("id") * 3).alias("v"),
    )
    pinned = pin(base)
    a = pinned.groupBy("k").agg(F.sum("v").alias("s"))
    b = pinned.select(F.sum("v").alias("t"))
    joined = a.crossJoin(b).orderBy("k").collect()
    ref_a = base.groupBy("k").agg(F.sum("v").alias("s"))
    ref_b = base.select(F.sum("v").alias("t"))
    ref = ref_a.crossJoin(ref_b).orderBy("k").collect()
    assert [r.asDict() for r in joined] == [r.asDict() for r in ref]


def test_qa_em_f1_bit_identical_with_and_without_pin(spark, monkeypatch):
    # the pin is a sharing optimization only: grades are bit-identical
    # when it is disabled (identity), across a multi-alternative input
    # with empty-normalization and duplicate-alternative edge cases
    from lightfusion_spark.operators import evalmetrics, fanout

    rows = spark.createDataFrame(
        [
            (1, "the cat sat", "a cat sat"),
            (1, "the cat sat", "the cat sat"),
            (1, "the cat sat", "A Cat Sat!"),  # dup after normalize
            (2, "", "no answer"),
            (2, "", ""),
            (3, "alpha beta", "beta alpha"),
        ],
        "qid long, pred string, gold string",
    )
    with_pin = evalmetrics.qa_em_f1(rows, "qid", "pred", "gold").orderBy(
        "qid"
    ).collect()
    monkeypatch.setattr(fanout, "pin", lambda df: df)
    without = evalmetrics.qa_em_f1(rows, "qid", "pred", "gold").orderBy(
        "qid"
    ).collect()
    assert [r.asDict() for r in with_pin] == [r.asDict() for r in without]
    # article-stripping normalize collapses all three alternatives of
    # qid 1 ("a cat sat" == "the cat sat" == "A Cat Sat!") into ONE
    assert with_pin[0]["n_golds"] == 1
