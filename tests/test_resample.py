"""operators/resample.py: gapfill / downsample_ohlc semantics."""

from pyspark.sql import functions as F

from lightfusion_spark.operators import resample


def test_gapfill_fills_and_flags(spark):
    df = spark.createDataFrame(
        [("a", 0, 1.0), ("a", 30, 4.0), ("b", 10, 7.0)],
        "k string, t long, v double",
    )
    out = resample.gapfill(df, "k", "t", "v", step=10)
    rows = {(r["k"], r["t"]): (r["v"], r["is_gap"]) for r in out.collect()}
    assert rows == {
        ("a", 0): (1.0, False),
        ("a", 10): (1.0, True),   # forward-filled
        ("a", 20): (1.0, True),
        ("a", 30): (4.0, False),
        ("b", 10): (7.0, False),  # b's span is just its own point
    }


def test_gapfill_aligns_to_origin(spark):
    # points at 7 and 23 with step 10, origin 5 -> buckets 5 and 15
    df = spark.createDataFrame([("a", 7, 1.0), ("a", 26, 2.0)], "k string, t long, v double")
    out = resample.gapfill(df, "k", "t", "v", step=10, align_origin=5)
    ts = sorted(r["t"] for r in out.collect())
    assert ts == [5, 15, 25]


def test_ohlc_deterministic_tiebreak(spark):
    # two events at the SAME timestamp: open/close must pick by tiebreak
    df = spark.createDataFrame(
        [
            ("x", 100, 5.0, 1),
            ("x", 100, 9.0, 2),   # same ts, higher tiebreak
            ("x", 150, 7.0, 3),
            ("x", 260, 1.0, 4),   # next bucket
        ],
        "k string, t long, v double, tb long",
    )
    out = resample.downsample_ohlc(df, "k", "t", "v", bucket=200, tiebreak_col="tb")
    rows = {r["t"]: r for r in out.collect()}
    b0 = rows[0]
    assert (b0["open"], b0["close"]) == (5.0, 7.0)  # first by (ts, tb); last by (ts, tb)
    assert (b0["high"], b0["low"], b0["n"]) == (9.0, 5.0, 3)
    assert b0["sum_value"] == 21.0
    assert rows[200]["open"] == rows[200]["close"] == 1.0


def test_floor_bucketing_below_origin(spark):
    """ADVICE r7: sign-preserving % put any ts below the align origin (or
    a negative epoch) into the bucket one step LATER than floor semantics
    — the value surfaced in a future bucket.  Pin true floor bucketing on
    both primitives."""
    from lightfusion_spark.operators.resample import downsample_ohlc, gapfill

    df = spark.createDataFrame(
        [("k", -5, 1.0), ("k", 5, 2.0), ("k", 15, 3.0)],
        "k string, t long, v double",
    )
    rows = {r["t"]: r for r in gapfill(df, "k", "t", "v", step=10).collect()}
    # floor: -5 -> bucket -10 (NOT 0), 5 -> 0, 15 -> 10
    assert sorted(rows) == [-10, 0, 10]
    assert rows[-10]["v"] == 1.0 and not rows[-10]["is_gap"]
    assert rows[0]["v"] == 2.0 and rows[10]["v"] == 3.0

    bars = {
        r["t"]: r
        for r in downsample_ohlc(
            df.withColumn("tb", F.lit(0)), "k", "t", "v", bucket=10, tiebreak_col="tb"
        ).collect()
    }
    assert sorted(bars) == [-10, 0, 10]
    assert bars[-10]["open"] == bars[-10]["close"] == 1.0


def test_gapfill_floor_with_origin_below(spark):
    from lightfusion_spark.operators.resample import gapfill

    df = spark.createDataFrame([("k", 7, 1.0), ("k", 27, 2.0)], "k string, t long, v double")
    rows = sorted(r["t"] for r in gapfill(df, "k", "t", "v", step=10, align_origin=12).collect())
    # 7 is below origin 12 -> floor bucket 2 (12 - 10), not 12
    assert rows == [2, 12, 22]
