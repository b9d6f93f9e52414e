"""Generic cell-store compaction (r16 verdict item 3): the
`tests/test_annindex.py` pin set, ported — streamed == one-shot
bit-parity survives compaction, replay stays addressable afterwards,
files bounded (test-counted), validation and retry guards."""

import glob

import pytest
from pyspark.sql import functions as F

from lightfusion_spark.operators import conversations as conv_ops
from lightfusion_spark.operators import evalmetrics as em
from lightfusion_spark.operators.storemaint import compact_cell_store


def _rows(df):
    return sorted(map(tuple, df.collect()))


def test_binary_score_store_compacts_and_reads_bit_identical(
    spark, tmp_path
):
    path = str(tmp_path / "scores")
    schema = "id long, score double, label int"
    for b in range(3):
        df = spark.createDataFrame(
            [
                (b * 100 + i, (i % 10) / 10.0, 1 if i % 3 == 0 else 0)
                for i in range(30)
            ],
            schema,
        )
        em.binary_scores_append_batch(df, path, b, "id", "score", "label")
    # replay batch 1: appends bit-identical rows (residue)
    em.binary_scores_append_batch(
        spark.createDataFrame(
            [
                (100 + i, (i % 10) / 10.0, 1 if i % 3 == 0 else 0)
                for i in range(30)
            ],
            schema,
        ),
        path,
        1,
        "id",
        "score",
        "label",
    )
    before = {
        "auc": _rows(em.auc_from_store(spark, path)),
        "pr": _rows(em.pr_from_store(spark, path)),
        "brier": _rows(em.brier_from_store(spark, path)),
    }
    files_before = len(glob.glob(f"{path}/*.parquet"))
    r = compact_cell_store(spark, path)
    assert r["files_before"] == files_before > 1
    assert r["files_after"] == len(glob.glob(f"{path}/*.parquet")) == 1
    assert r["rows_collapsed"] > 0  # the replayed batch's residue
    assert r["batches"] == 3
    after = {
        "auc": _rows(em.auc_from_store(spark, path)),
        "pr": _rows(em.pr_from_store(spark, path)),
        "brier": _rows(em.brier_from_store(spark, path)),
    }
    assert after == before  # bit-identical, not tolerance-compared
    # the _meta manifest rode along: a conforming append works, a
    # contract mismatch is still refused
    em.binary_scores_append_batch(
        spark.createDataFrame([(900, 0.5, 1)], schema),
        path,
        3,
        "id",
        "score",
        "label",
    )
    with pytest.raises(ValueError, match="batch contract"):
        em.binary_scores_append_batch(
            spark.createDataFrame([(901, 0.5, 1)], schema),
            path,
            4,
            "id",
            "score",
            "label",
            score_decimals=2,
        )
    # a second compaction is a no-op on rows and keeps one file
    r2 = compact_cell_store(spark, path)
    assert r2["rows_collapsed"] == 0 and r2["files_after"] == 1


def test_bleu_store_stream_parity_survives_compaction(spark, tmp_path):
    path = str(tmp_path / "bleu_cells")
    pairs = [
        (i, f"the cat sat on mat {i}", f"the cat sat on the mat {i}")
        for i in range(40)
    ]
    schema = "id long, cand string, ref string"
    all_df = spark.createDataFrame(pairs, schema)
    for b in range(4):
        em.bleu_append_batch(
            spark.createDataFrame(pairs[b * 10 : (b + 1) * 10], schema),
            path,
            b,
            "id",
            "cand",
            "ref",
        )
    one_shot = _rows(em.corpus_bleu(all_df, "id", "cand", "ref"))
    assert _rows(em.bleu_from_store(spark, path)) == one_shot
    r = compact_cell_store(spark, path)
    assert r["files_after"] == 1 and r["batches"] == 4
    assert _rows(em.bleu_from_store(spark, path)) == one_shot
    # post-compaction appends keep working and keep parity
    extra = [(100 + i, f"a b c {i}", f"a b d {i}") for i in range(5)]
    em.bleu_append_batch(
        spark.createDataFrame(extra, schema), path, 9, "id", "cand", "ref"
    )
    assert _rows(em.bleu_from_store(spark, path)) == _rows(
        em.corpus_bleu(
            spark.createDataFrame(pairs + extra, schema), "id", "cand", "ref"
        )
    )


def test_conversation_store_compaction_preserves_gates(spark, tmp_path):
    base = (
        "alpha bravo charlie delta echo foxtrot golf hotel india juliet "
        "kilo lima mike november oscar papa quebec romeo sierra tango"
    )
    other = (
        "zulu yankee xray whiskey victor uniform tide quart plum onyx "
        "noble mango lemon koala jade iris heron gator fig elm"
    )
    schema = "conversation_id long, turn_idx int, role string, content string"
    state = str(tmp_path / "conv_state")
    conv_ops.conversations_dedup_append_batch_fuzzy(
        spark.createDataFrame([(100, 0, "user", base)], schema), state, 0
    )
    conv_ops.conversations_dedup_append_batch_fuzzy(
        spark.createDataFrame([(200, 0, "user", other)], schema), state, 1
    )
    before = _rows(conv_ops.conversations_dedup_from_store_fuzzy(spark, state))
    r = conv_ops.conversations_dedup_compact_store(spark, state)
    assert set(r) == {"admitted", "bands", "sigs"}
    for rel in r.values():
        assert rel["files_after"] == 1
    assert (
        _rows(conv_ops.conversations_dedup_from_store_fuzzy(spark, state))
        == before
    )
    # the fuzzy gate still reads the compacted bands+sigs: a paraphrase
    # of a pre-compaction admission dies, a fresh conversation lands
    conv_ops.conversations_dedup_append_batch_fuzzy(
        spark.createDataFrame(
            [
                (300, 0, "user", base + " hope that helps"),
                (400, 0, "user", "totally new words entirely here now"),
            ],
            schema,
        ),
        state,
        2,
    )
    got = {
        r["conversation_id"]
        for r in conv_ops.conversations_dedup_from_store_fuzzy(
            spark, state
        ).collect()
    }
    assert got == {100, 200, 400}
    # exact-tier store form: state dir IS the admitted relation
    exact_state = str(tmp_path / "conv_exact")
    for b in range(2):
        conv_ops.conversations_dedup_append_batch(
            spark.createDataFrame(
                [(b * 10, 0, "user", f"text {b}")], schema
            ),
            exact_state,
            b,
        )
    before = _rows(conv_ops.conversations_dedup_from_store(spark, exact_state))
    r = conv_ops.conversations_dedup_compact_store(spark, exact_state)
    assert r["admitted"]["files_after"] == 1
    assert (
        _rows(conv_ops.conversations_dedup_from_store(spark, exact_state))
        == before
    )


def test_compact_cell_store_guards(spark, tmp_path):
    # not a batch-addressed store -> refused
    plain = str(tmp_path / "plain")
    spark.createDataFrame([(1, "a")], "id long, s string").write.parquet(plain)
    with pytest.raises(ValueError, match="no batch_id"):
        compact_cell_store(spark, plain)
    # a stale _compacting dir never blocks the retry; a _pre dir does
    path = str(tmp_path / "cells")
    spark.createDataFrame(
        [(1, 0), (2, 1)], "v long, batch_id long"
    ).write.parquet(path)
    (tmp_path / "cells_compacting").mkdir()
    (tmp_path / "cells_compacting" / "junk").write_text("x")
    r = compact_cell_store(spark, path)
    assert r["files_after"] == 1
    (tmp_path / "cells_pre").mkdir()
    with pytest.raises(RuntimeError, match="crashed mid-swap"):
        compact_cell_store(spark, path)
    with pytest.raises(ValueError, match="target_files"):
        compact_cell_store(spark, path, target_files=0)


def test_atomic_replace_semantics(spark, tmp_path):
    """atomic_replace (r17): the staging-write + two-rename swap behind
    the HLL/sketch compactions and the CDC snapshot — the plan may
    read the directory it replaces, stale staging never blocks, a
    crashed-swap _pre refuses, and a first write (no prior store)
    works."""
    from lightfusion_spark.operators.storemaint import atomic_replace

    path = str(tmp_path / "store")
    # first write: no prior directory
    atomic_replace(
        spark,
        spark.createDataFrame([(1, 10), (2, 20)], "k long, v long"),
        path,
    )
    assert sorted(map(tuple, spark.read.parquet(path).collect())) == [
        (1, 10),
        (2, 20),
    ]
    # replacement whose plan READS the store it replaces (the compaction
    # shape) — with a stale staging dir in the way
    (tmp_path / "store_staging").mkdir()
    (tmp_path / "store_staging" / "junk").write_text("x")
    doubled = spark.read.parquet(path).withColumn(
        "v", F.col("v") * 2
    )
    atomic_replace(spark, doubled, path)
    assert sorted(map(tuple, spark.read.parquet(path).collect())) == [
        (1, 20),
        (2, 40),
    ]
    # a crashed-swap _pre refuses until the operator resolves it
    (tmp_path / "store_pre").mkdir()
    with pytest.raises(RuntimeError, match="crashed mid-swap"):
        atomic_replace(spark, doubled, path)
