"""asof_join unit tests: randomized comparison against pandas
``merge_asof`` (an independent reference implementation), plus edge
cases the events-table oracle can't isolate."""

import numpy as np
import pandas as pd
import pytest

from lightfusion_spark.operators.asof import asof_join


def _reference_asof(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
    return pd.merge_asof(
        left.sort_values("ts", kind="mergesort"),
        right.sort_values("ts", kind="mergesort"),
        on="ts",
        by="k",
        direction="backward",
        suffixes=("", "_r"),
    )


@pytest.mark.parametrize("seed", [0, 7, 42])
def test_asof_matches_pandas_merge_asof(spark, seed):
    rng = np.random.RandomState(seed)
    n_l, n_r, n_k = 200, 150, 8
    left = pd.DataFrame(
        {
            "lid": np.arange(n_l),
            "k": rng.randint(0, n_k, n_l),
            "ts": rng.randint(0, 10_000, n_l).astype(np.int64),
        }
    )
    right = pd.DataFrame(
        {
            "k": rng.randint(0, n_k, n_r),
            "ts": rng.randint(0, 10_000, n_r).astype(np.int64),
            "v": rng.randn(n_r).round(6),
        }
    )
    # merge_asof breaks right-side ties arbitrarily; keep one right row
    # per (k, ts) so the expected value is well-defined
    right = right.drop_duplicates(["k", "ts"], keep="last")

    ldf = spark.createDataFrame(left)
    rdf = spark.createDataFrame(right)
    got = (
        asof_join(ldf, rdf, "k", "ts", ["v"])
        .select("lid", "v_asof", "ts_asof")
        .toPandas()
        .sort_values("lid")
        .reset_index(drop=True)
    )
    expected = _reference_asof(left, right).sort_values("lid").reset_index(drop=True)
    assert got["v_asof"].round(6).where(got["v_asof"].notna()).equals(
        expected["v"].round(6).where(expected["v"].notna())
    )


def test_asof_no_prior_row_is_null(spark):
    left = spark.createDataFrame([(1, 1, 100), (2, 1, 5)], "lid int, k int, ts long")
    right = spark.createDataFrame([(1, 50, 9.5)], "k int, ts long, v double")
    rows = {r["lid"]: (r["v_asof"], r["ts_asof"]) for r in asof_join(
        left, right, "k", "ts", ["v"]
    ).collect()}
    assert rows[1] == (9.5, 50)
    assert rows[2] == (None, None)


def test_asof_null_value_does_not_mix_rows(spark):
    # The newest matching right row has v=NULL; all _asof fields must come
    # from THAT row (merge_asof semantics), not mix the older row's value
    # with the newer row's timestamp.
    left = spark.createDataFrame([(1, 1, 30)], "lid int, k int, ts long")
    right = spark.createDataFrame(
        [(1, 10, 1.0), (1, 20, None)], "k int, ts long, v double"
    )
    (row,) = asof_join(left, right, "k", "ts", ["v"]).collect()
    assert row["ts_asof"] == 20
    assert row["v_asof"] is None


def test_asof_inclusive_on_equal_ts(spark):
    left = spark.createDataFrame([(1, 1, 50)], "lid int, k int, ts long")
    right = spark.createDataFrame([(1, 50, 3.0)], "k int, ts long, v double")
    (row,) = asof_join(left, right, "k", "ts", ["v"]).collect()
    assert row["v_asof"] == 3.0  # right ts == left ts matches


def test_bucketed_range_join_boundaries_and_plan(spark):
    from lightfusion_spark.operators.asof import bucketed_range_join
    from lightfusion_spark.plans.audit import formatted_plan, join_nodes

    left = spark.createDataFrame(
        [(1, 100), (2, 1000), (3, 1500), (4, 1501), (5, 2499)], "row_id long, ts long"
    )
    iv = spark.createDataFrame(
        [(10, 1000, 1500), (20, 2400, 3000)], "window_id long, s long, e long"
    )
    out = bucketed_range_join(left, iv, "ts", "s", "e", bucket=1000)
    got = {(r["row_id"], r["window_id"]) for r in out.collect()}
    # inclusive on both ends: ts=1000 and ts=1500 match [1000,1500]; 1501 not
    assert got == {(2, 10), (3, 10), (5, 20)}
    plan = formatted_plan(out)
    joins = join_nodes(plan)
    assert joins and all("NestedLoop" not in j and "Cartesian" not in j for j in joins), joins


def test_bucketed_range_join_pairs_unique_across_buckets(spark):
    from lightfusion_spark.operators.asof import bucketed_range_join

    left = spark.createDataFrame([(1, 150)], "row_id long, ts long")
    # interval spans two buckets; the pair must still appear exactly once
    iv = spark.createDataFrame([(10, 50, 250)], "window_id long, s long, e long")
    out = bucketed_range_join(left, iv, "ts", "s", "e", bucket=100)
    assert out.count() == 1


def test_asof_forward_direction(spark):
    from lightfusion_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [(1, 1, 100), (2, 1, 250), (3, 1, 400)], "row_id long, k long, ts long"
    )
    right = spark.createDataFrame(
        [(1, 150, 10.0), (1, 250, 20.0), (1, 300, 30.0)], "k long, ts long, v double"
    )
    out = {
        r["row_id"]: (r["ts_asof"], r["v_asof"])
        for r in asof_join(
            left, right, "k", "ts", ["v"], direction="forward"
        ).collect()
    }
    # next right row at-or-after each left ts; inclusive at equality (250)
    assert out == {1: (150, 10.0), 2: (250, 20.0), 3: (None, None)}


def test_asof_tolerance_nulls_whole_match(spark):
    from lightfusion_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [(1, 1, 100), (2, 1, 500)], "row_id long, k long, ts long"
    )
    right = spark.createDataFrame([(1, 90, 7.0)], "k long, ts long, v double")
    out = {
        r["row_id"]: (r["ts_asof"], r["v_asof"])
        for r in asof_join(
            left, right, "k", "ts", ["v"], tolerance="50"
        ).collect()
    }
    # row 1: gap 10 <= 50 -> matched; row 2: gap 410 -> BOTH fields null
    assert out == {1: (90, 7.0), 2: (None, None)}


def test_asof_tiebreak_picks_greatest_both_directions(spark):
    # duplicate (k, ts) right rows: with tiebreak_col the row with the
    # GREATEST tiebreak wins, deterministically, in both directions.
    left = spark.createDataFrame([(1, 1, 100)], "row_id long, k long, ts long")
    right = spark.createDataFrame(
        [(1, 50, 10, 1.0), (1, 50, 30, 3.0), (1, 50, 20, 2.0)],
        "k long, ts long, rid long, v double",
    )
    for direction in ("backward", "forward"):
        lts = 100 if direction == "backward" else 10
        l = spark.createDataFrame([(1, 1, lts)], "row_id long, k long, ts long")
        (row,) = asof_join(
            l, right, "k", "ts", ["v"], direction=direction, tiebreak_col="rid"
        ).collect()
        assert (row["ts_asof"], row["v_asof"]) == (50, 3.0), direction


def test_asof_rejects_bad_direction(spark):
    import pytest as _pytest

    from lightfusion_spark.operators.asof import asof_join

    df = spark.createDataFrame([(1, 1, 1)], "row_id long, k long, ts long")
    with _pytest.raises(ValueError, match="backward|forward"):
        asof_join(df, df, "k", "ts", [], direction="nearest")


@pytest.mark.parametrize("direction", ["backward", "forward"])
@pytest.mark.parametrize("seed,bucket", [(0, 500), (7, 100), (42, 37)])
def test_asof_bucketed_equals_plain(spark, direction, seed, bucket):
    """The skew-safe variant is semantics-identical to asof_join for any
    bucket width — including widths that force most matches across bucket
    boundaries (bucket=37 on a 0..10k ts range)."""
    from lightfusion_spark.operators.asof import asof_join, asof_join_bucketed

    rng = np.random.RandomState(seed)
    n_l, n_r, n_k = 300, 200, 6
    left = pd.DataFrame(
        {
            "lid": np.arange(n_l),
            "k": rng.randint(0, n_k, n_l),
            "ts": rng.randint(0, 10_000, n_l).astype(np.int64),
        }
    )
    right = pd.DataFrame(
        {
            "k": rng.randint(0, n_k, n_r),
            "ts": rng.randint(0, 10_000, n_r).astype(np.int64),
            "rid": np.arange(n_r),
            "v": rng.randn(n_r).round(6),
        }
    )
    ldf, rdf = spark.createDataFrame(left), spark.createDataFrame(right)
    kw = dict(direction=direction, tolerance="1500", tiebreak_col="rid")
    plain = {
        r["lid"]: (r["ts_asof"], r["v_asof"])
        for r in asof_join(ldf, rdf, "k", "ts", ["v"], **kw).collect()
    }
    bucketed = {
        r["lid"]: (r["ts_asof"], r["v_asof"])
        for r in asof_join_bucketed(
            ldf, rdf, "k", "ts", ["v"], bucket=bucket, **kw
        ).collect()
    }
    assert bucketed == plain


def test_asof_bucketed_partitions_by_key_and_bucket(spark):
    """The whole point: the big window must hash-partition on (key, bucket),
    not key alone — one hot key spreads over ts-range/bucket tasks."""
    from lightfusion_spark.operators.asof import asof_join_bucketed
    from lightfusion_spark.plans.audit import formatted_plan

    left = spark.createDataFrame([(1, 1, 100)], "lid long, k long, ts long")
    right = spark.createDataFrame([(1, 50, 1.0)], "k long, ts long, v double")
    plan = formatted_plan(
        asof_join_bucketed(left, right, "k", "ts", ["v"], bucket=1000)
    )
    import re

    assert re.search(r"hashpartitioning\(k#\d+L, _bk#\d+L", plan), plan


def test_asof_bucketed_null_keys_match_plain(spark):
    """Window partitioning groups NULL keys together in asof_join, so the
    bucketed variant's carry bookkeeping must too (a name-list join would
    keep null-key rows apart and can leak a same-bucket boundary row)."""
    from lightfusion_spark.operators.asof import asof_join, asof_join_bucketed

    left = spark.createDataFrame(
        [(1, None, 10), (2, None, 250), (3, 7, 150)],
        "lid long, k long, ts long",
    )
    right = spark.createDataFrame(
        [(None, 90, 1.0), (None, 240, 2.0), (7, 100, 3.0)],
        "k long, ts long, v double",
    )
    for direction in ("backward", "forward"):
        plain = {
            r["lid"]: (r["ts_asof"], r["v_asof"])
            for r in asof_join(
                left, right, "k", "ts", ["v"], direction=direction
            ).collect()
        }
        bucketed = {
            r["lid"]: (r["ts_asof"], r["v_asof"])
            for r in asof_join_bucketed(
                left, right, "k", "ts", ["v"], bucket=100, direction=direction
            ).collect()
        }
        assert bucketed == plain, direction


def test_asof_bucketed_validates_args(spark):
    from lightfusion_spark.operators.asof import asof_join_bucketed

    df = spark.createDataFrame([(1, 1)], "k long, ts long")
    with pytest.raises(ValueError, match="bucket"):
        asof_join_bucketed(df, df, "k", "ts", [], bucket=0)
    with pytest.raises(ValueError, match="backward|forward"):
        asof_join_bucketed(df, df, "k", "ts", [], bucket=10, direction="nearest")


def test_salted_join_equals_plain_join(spark):
    """salted_join must return EXACTLY the plain join's rows (inner and
    left), including null-key and unmatched-row behavior."""
    from pyspark.sql import functions as F

    from lightfusion_spark.operators.skew import salted_join

    big = spark.createDataFrame(
        [(i, i % 3 if i % 7 else None, f"r{i}") for i in range(200)],
        "row_id long, k int, payload string",
    )
    small = spark.createDataFrame(
        [(0, "zero"), (1, "one"), (9, "unmatched")], "k int, name string"
    )
    for how in ("inner", "left"):
        got = sorted(
            map(tuple, salted_join(big, small, ["k"], "row_id", 4, how).collect()),
            key=repr,
        )
        want = sorted(map(tuple, big.join(small, ["k"], how).collect()), key=repr)
        assert got == want, how
    import pytest as _pytest

    with _pytest.raises(ValueError, match="inner|left"):
        salted_join(big, small, ["k"], "row_id", 4, "full")
    with _pytest.raises(ValueError, match="_salt"):
        salted_join(big.withColumn("_salt", F.lit(1)), small, ["k"], "row_id")
