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
