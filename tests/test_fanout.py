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
