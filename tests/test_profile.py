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
