"""operators/profile.py: profiling semantics the oracle doesn't reach
(null handling, non-numeric min/max suppression, skew-share math)."""

from pyspark.sql import functions as F

from lightfusion_spark.operators import profile


def test_profile_counts_nulls_and_distincts(spark):
    df = spark.createDataFrame(
        [(1, "a", 1.5), (2, None, 1.5), (2, "b", None)],
        "i long, s string, d double",
    )
    rows = {r["column"]: r for r in profile.profile_table(df).collect()}
    assert set(rows) == {"i", "s", "d"}
    assert all(r["n_rows"] == 3 for r in rows.values())
    assert (rows["i"]["n_null"], rows["i"]["n_distinct"]) == (0, 2)
    assert (rows["s"]["n_null"], rows["s"]["n_distinct"]) == (1, 2)
    assert (rows["d"]["n_null"], rows["d"]["n_distinct"]) == (1, 1)
    # numeric min/max as doubles; string column suppressed (NULL)
    assert (rows["i"]["min_value"], rows["i"]["max_value"]) == (1.0, 2.0)
    assert rows["s"]["min_value"] is None and rows["s"]["max_value"] is None


def test_skew_report_shares_and_order(spark):
    df = spark.createDataFrame(
        [("hot",)] * 70 + [("warm",)] * 20 + [("cold",)] * 10, "k string"
    )
    rows = profile.key_skew_report(df, "k", top_n=2).collect()
    assert [(r["key"], r["n"], r["share_ppm"], r["rank"]) for r in rows] == [
        ("hot", 70, 700000, 1),
        ("warm", 20, 200000, 2),
    ]


def test_skew_report_tie_breaks_on_key(spark):
    df = spark.createDataFrame([("b",), ("a",), ("c",)], "k string")
    rows = profile.key_skew_report(df, "k", top_n=3).collect()
    assert [r["key"] for r in rows] == ["a", "b", "c"]


def test_histogram_empty_bins_present_and_max_folds(spark):
    df = spark.createDataFrame(
        [(0.0,), (1.0,), (1.0,), (4.0,), (None,)], "x double"
    )
    rows = {r["bin"]: (r["bin_lo"], r["n_rows"]) for r in
            profile.histogram(df, "x", bins=4).collect()}
    # width 1.0; bins 0..3; max value 4.0 folds into bin 3; NULL ignored
    assert rows == {
        0: (0.0, 1), 1: (1.0, 2), 2: (2.0, 0), 3: (3.0, 1),
    }


def test_histogram_constant_column(spark):
    df = spark.createDataFrame([(7.0,)] * 5, "x double")
    rows = {r["bin"]: r["n_rows"] for r in profile.histogram(df, "x", bins=3).collect()}
    assert rows == {0: 5, 1: 0, 2: 0}  # degenerate range: all in bin 0


def test_histogram_rejects_bad_bins(spark):
    import pytest

    df = spark.createDataFrame([(1.0,)], "x double")
    with pytest.raises(ValueError, match="bins"):
        profile.histogram(df, "x", bins=0)
