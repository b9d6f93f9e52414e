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


def test_schema_drift_statuses_and_null_ppm(spark):
    from lightfusion_spark.operators.profile import schema_drift

    old = spark.createDataFrame(
        [(1, 10, "a"), (2, None, "b"), (3, 30, None), (4, 40, "d")],
        "id long, v long, s string",
    )
    new = spark.createDataFrame(
        [(1, "10", 1.5), (2, "20", None)], "id long, v string, extra double"
    )
    rows = {r["column"]: r for r in schema_drift(old, new).collect()}
    assert set(rows) == {"id", "v", "s", "extra"}
    assert rows["id"]["status"] == "kept" and rows["id"]["null_ppm_delta"] == 0
    assert rows["v"]["status"] == "type_changed"
    assert rows["v"]["type_old"] == "bigint" and rows["v"]["type_new"] == "string"
    # old v: 1 null of 4 -> 250000 ppm; new v: 0 of 2 -> 0
    assert rows["v"]["null_ppm_old"] == 250000 and rows["v"]["null_ppm_new"] == 0
    assert rows["v"]["null_ppm_delta"] == -250000
    assert rows["s"]["status"] == "dropped" and rows["s"]["type_new"] is None
    assert rows["s"]["n_null_old"] == 1 and rows["s"]["n_null_new"] is None
    assert rows["s"]["null_ppm_delta"] is None
    assert rows["extra"]["status"] == "added" and rows["extra"]["type_old"] is None
    assert rows["extra"]["null_ppm_new"] == 500000  # 1 null of 2


def test_schema_drift_empty_snapshot_reports_zero_ppm(spark):
    from lightfusion_spark.operators.profile import schema_drift

    old = spark.createDataFrame([], "id long, v long")
    new = spark.createDataFrame([(1, None)], "id long, v long")
    rows = {r["column"]: r for r in schema_drift(old, new).collect()}
    assert rows["v"]["null_ppm_old"] == 0  # 0-row snapshot: ppm defined as 0
    assert rows["v"]["null_ppm_new"] == 1000000
    assert rows["id"]["status"] == "kept"


def test_schema_drift_identical_snapshots(spark):
    from lightfusion_spark.operators.profile import schema_drift

    df = spark.createDataFrame([(1, "x"), (2, None)], "id long, s string")
    for r in schema_drift(df, df).collect():
        assert r["status"] == "kept" and r["null_ppm_delta"] == 0


def test_mad_outlier_report_flags_the_planted_outlier(spark):
    from lightfusion_spark.operators.profile import mad_outlier_report

    rows = [("a", float(v)) for v in [10, 11, 12, 10, 11, 12, 10, 11, 1000]]
    rows += [("b", 5.0)] * 6
    rows += [("c", None)]
    df = spark.createDataFrame(rows, "grp string, value double")
    got = {r["grp"]: r.asDict()
           for r in mad_outlier_report(df, "grp", "value", k=3.0).collect()}
    # group a: median 11, MAD 1 -> fence 4.4478; only 1000 is out
    assert got["a"]["n_events"] == 9
    assert got["a"]["median6"] == 11.0 and got["a"]["mad6"] == 1.0
    assert got["a"]["n_outliers"] == 1
    # group b: constant -> MAD 0, no deviating rows, zero outliers
    assert got["b"]["mad6"] == 0.0 and got["b"]["n_outliers"] == 0
    # group c: only a NULL value -> dropped entirely
    assert "c" not in got


def test_mad_zero_flags_every_deviator(spark):
    """Majority-constant group: MAD = 0, so EVERY deviating row is out
    (the documented strict-fence convention)."""
    from lightfusion_spark.operators.profile import mad_outlier_report

    df = spark.createDataFrame(
        [("g", 7.0)] * 5 + [("g", 7.1), ("g", 100.0)],
        "grp string, value double",
    )
    r = mad_outlier_report(df, "grp", "value").collect()[0]
    assert r["mad6"] == 0.0 and r["n_outliers"] == 2


def test_mad_robust_where_iqr_quartiles_move(spark):
    """30% contamination: the MAD fence still isolates the planted
    cluster because the median/MAD have 50% breakdown."""
    from lightfusion_spark.operators.profile import mad_outlier_report

    clean = [("g", 100.0 + (i % 7) / 10.0) for i in range(14)]
    contam = [("g", 100000.0 + i) for i in range(6)]
    df = spark.createDataFrame(clean + contam, "grp string, value double")
    r = mad_outlier_report(df, "grp", "value", k=3.0).collect()[0]
    assert r["n_outliers"] == 6


def test_mad_partition_invariant(spark):
    from lightfusion_spark.operators.profile import mad_outlier_report

    rows = [(f"g{i % 5}", float((i * 31) % 100) / 7.0) for i in range(300)]
    df = spark.createDataFrame(rows, "grp string, value double")
    a = sorted(map(tuple, mad_outlier_report(df, "grp", "value").collect()))
    b = sorted(map(tuple, mad_outlier_report(
        df.repartition(13), "grp", "value").collect()))
    assert a == b


def test_zipf_fit_matches_independent_ols(spark):
    import math
    from collections import Counter

    from lightfusion_spark.operators.profile import zipf_fit

    words = []
    for i in range(1, 101):
        words += [f"t{i}"] * (1000 // i)
    rows = [(j, " ".join(words[j:j + 50])) for j in range(0, len(words), 50)]
    df = spark.createDataFrame(rows, "id long, text string")
    out = zipf_fit(df, "id", "text", top_k=80).collect()[0].asDict()

    cnt = Counter(w for _, t in rows for w in t.split())
    ranked = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:80]
    X = [math.floor(round(math.log(r), 6) * 1e6 + 0.5)
         for r in range(1, len(ranked) + 1)]
    Y = [math.floor(round(math.log(c), 6) * 1e6 + 0.5) for _, c in ranked]
    n, sx, sy = len(X), sum(X), sum(Y)
    sxy = sum(a * b for a, b in zip(X, Y))
    sxx = sum(a * a for a in X)
    syy = sum(b * b for b in Y)
    num, dx, dy = n * sxy - sx * sy, n * sxx - sx * sx, n * syy - sy * sy
    assert out == {
        "n_fit": n, "n_types": len(cnt), "n_tokens": len(words),
        "alpha": -(num / dx), "r2": (num / dx) * (num / dy),
    }
    # a 1/i law should fit alpha ~ 1 tightly
    assert 0.8 < out["alpha"] < 1.2 and out["r2"] > 0.97
    # bitwise partition invariance
    again = zipf_fit(df.repartition(7), "id", "text", top_k=80).collect()[0]
    assert again.asDict() == out


def test_zipf_fit_degenerate_and_guards(spark):
    import pytest as _pytest

    from lightfusion_spark.operators.profile import zipf_fit

    # uniform frequencies: every type count identical -> den_y = 0 ->
    # documented degenerate (0.0, 0.0), never NaN
    rows = [(i, f"u{i}a u{i}b u{i}c") for i in range(20)]
    df = spark.createDataFrame(rows, "id long, text string")
    out = zipf_fit(df, "id", "text").collect()[0]
    assert out["alpha"] == 0.0 and out["r2"] == 0.0 and out["n_fit"] == 60
    # empty / NULL corpus -> n_fit 0, degenerate
    empty = spark.createDataFrame([(1, None), (2, "")], "id long, text string")
    out = zipf_fit(empty, "id", "text").collect()[0]
    assert out["n_fit"] == 0 and out["n_tokens"] == 0
    assert out["alpha"] == 0.0 and out["r2"] == 0.0
    with _pytest.raises(ValueError, match="top_k"):
        zipf_fit(df, "id", "text", top_k=1)
