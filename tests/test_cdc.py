"""operators/cdc.py: upsert/SCD2 semantics beyond the oracle replay."""

from lightfusion_spark.operators import cdc


def _changes(spark):
    # key k1: insert, update, update (same seq -> tiebreak), no delete
    # key k2: insert then delete (must vanish from the snapshot)
    # key k3: single insert
    return spark.createDataFrame(
        [
            ("k1", 1, 1, "U", 10.0),
            ("k1", 2, 2, "U", 20.0),
            ("k1", 2, 3, "U", 25.0),  # same seq, higher tiebreak wins
            ("k2", 1, 4, "U", 30.0),
            ("k2", 5, 5, "D", None),
            ("k3", 9, 6, "U", 40.0),
        ],
        "k string, seq long, tb long, op string, v double",
    )


def test_latest_snapshot_upsert_delete_tiebreak(spark):
    out = cdc.latest_snapshot(
        _changes(spark), ["k"], "seq", op_col="op", tiebreak_cols=["tb"]
    )
    rows = {r["k"]: (r["seq"], r["tb"], r["v"]) for r in out.collect()}
    assert rows == {"k1": (2, 3, 25.0), "k3": (9, 6, 40.0)}  # k2 deleted


def test_latest_snapshot_without_ops_keeps_all_keys(spark):
    out = cdc.latest_snapshot(_changes(spark), ["k"], "seq", tiebreak_cols=["tb"])
    assert {r["k"] for r in out.collect()} == {"k1", "k2", "k3"}


def test_scd2_intervals_and_as_of(spark):
    iv = cdc.scd2_intervals(
        _changes(spark).select("k", "seq", "tb", "v"),
        ["k"],
        "seq",
        tiebreak_cols=["tb"],
    )
    k1 = sorted(
        ((r["valid_from"], r["tb"], r["valid_to"]) for r in iv.collect() if r["k"] == "k1")
    )
    # chain: (1,tb1)->2, (2,tb2)->2 (same-seq successor), (2,tb3)->open
    assert k1 == [(1, 1, 2), (2, 2, 2), (2, 3, None)]
    # as-of seq 4: k1's open interval (v=25), k2 pre-delete (v=30), not k3 (starts at 9)
    snap = cdc.snapshot_as_of(iv, at=4)
    rows = {r["k"]: r["v"] for r in snap.collect()}
    assert rows == {"k1": 25.0, "k2": 30.0}


def test_scd2_current_marker(spark):
    iv = cdc.scd2_intervals(
        _changes(spark).select("k", "seq", "tb", "v"),
        ["k"],
        "seq",
        tiebreak_cols=["tb"],
        current_marker=999,
    )
    opens = [r for r in iv.collect() if r["valid_to"] == 999]
    assert {r["k"] for r in opens} == {"k1", "k2", "k3"}


def test_streaming_upsert_state_matches_batch(spark, tmp_path):
    """The streaming face: micro-batches merged into a parquet state dir
    via merge_into_state inside foreachBatch must end at EXACTLY the
    batch-mode latest_snapshot of the full change set — regardless of
    how the changes were split into batches."""
    import os

    from pyspark.sql import functions as F

    sf_dir = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "user_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("seq"),
        "event_id",
        "value",
        F.when(F.col("value") < 10, F.lit("D")).otherwise(F.lit("U")).alias("op"),
    )
    expected = sorted(
        tuple(r)
        for r in cdc.latest_snapshot(
            ev, ["user_id"], "seq", op_col="op", tiebreak_cols=["event_id"]
        ).collect()
    )

    # split the change set into two files so availableNow runs >1 batch
    src_dir = str(tmp_path / "changes")
    ev.where(F.col("event_id") % 2 == 0).coalesce(1).write.parquet(src_dir)
    ev.where(F.col("event_id") % 2 == 1).coalesce(1).write.mode("append").parquet(src_dir)
    state_dir = str(tmp_path / "state")

    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )
    q = (
        stream.writeStream.foreachBatch(
            lambda batch, epoch: cdc.merge_into_state(
                state_dir, batch, ["user_id"], "seq",
                op_col="op", tiebreak_cols=["event_id"],
            )
        )
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = sorted(
        tuple(r)
        for r in cdc.read_state(spark, state_dir, op_col="op").collect()
    )
    assert got == expected and len(got) > 0


def test_streaming_merge_tombstones_block_resurrection(spark, tmp_path):
    """A delete arriving in an early batch must not be resurrected by a
    LATER batch carrying an OLDER change for the same key — the reason
    merge_into_state stores tombstones instead of dropping deletes."""
    state_dir = str(tmp_path / "state_ts")
    b1 = spark.createDataFrame(
        [("k", 5, 1, "D", None), ("other", 1, 2, "U", 7.0)],
        "k string, seq long, tb long, op string, v double",
    )
    b2 = spark.createDataFrame(
        [("k", 3, 3, "U", 99.0)],  # older than the delete
        "k string, seq long, tb long, op string, v double",
    )
    for b in (b1, b2):
        cdc.merge_into_state(state_dir, b, ["k"], "seq", op_col="op", tiebreak_cols=["tb"])
    live = {r["k"]: r["v"] for r in cdc.read_state(spark, state_dir, op_col="op").collect()}
    assert live == {"other": 7.0}  # k stays dead


def test_merge_never_treats_read_failure_as_first_batch(spark, tmp_path):
    """ADVICE r7: a corrupted/unreadable state directory must RAISE, not be
    silently treated as 'no state yet' — that path overwrote the whole
    upsert store with only the arriving batch (silent data loss).  Only a
    genuinely ABSENT directory means first batch."""
    import pytest

    state_dir = str(tmp_path / "state_corrupt")
    b1 = spark.createDataFrame(
        [("k", 1, 1, "U", 1.0)], "k string, seq long, tb long, op string, v double"
    )
    cdc.merge_into_state(state_dir, b1, ["k"], "seq", op_col="op", tiebreak_cols=["tb"])
    # corrupt the snapshot: replace every parquet part with garbage bytes
    import glob
    import os

    parts = glob.glob(os.path.join(state_dir, "*.parquet"))
    assert parts
    for p in parts:
        with open(p, "wb") as fh:
            fh.write(b"not a parquet file")
    b2 = spark.createDataFrame(
        [("k2", 2, 2, "U", 2.0)], "k string, seq long, tb long, op string, v double"
    )
    with pytest.raises(Exception, match="(?i)parquet|footer|schema"):
        cdc.merge_into_state(
            state_dir, b2, ["k"], "seq", op_col="op", tiebreak_cols=["tb"]
        )
    # the store was NOT overwritten by the failing merge: the garbage bytes
    # are still there (nothing replaced the state behind our back)
    with open(parts[0], "rb") as fh:
        assert fh.read() == b"not a parquet file"
