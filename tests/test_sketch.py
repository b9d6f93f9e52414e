"""operators/sketch.py: count-min sketch invariants beyond the oracle."""

import pytest
from pyspark.sql import functions as F

from lightfusion_spark.operators import sketch


@pytest.fixture(scope="module")
def stream(spark):
    # skewed stream: term_i appears i times, i in 1..40
    rows = [(f"t{i}",) for i in range(1, 41) for _ in range(i)]
    return spark.createDataFrame(rows, "term string")


def test_cms_never_undercounts_and_bounds_size(spark, stream):
    w, d = 64, 3  # deliberately tight so collisions happen
    sk = sketch.cms_build(stream, "term", w=w, d=d)
    assert sk.count() <= w * d
    probe = stream.select("term").distinct()
    est = {r["term"]: r["cms_count"]
           for r in sketch.cms_estimate(sk, probe, "term", w=w, d=d).collect()}
    truth = {f"t{i}": i for i in range(1, 41)}
    for t, true in truth.items():
        assert est[t] >= true, f"undercount for {t}"
    n = sum(truth.values())
    # epsilon = e/w loose bound on expected overestimate; assert a generous
    # multiple so collisions can't flake the test
    assert max(est[t] - truth[t] for t in truth) <= 3 * (2.72 / w) * n + 5


def test_cms_absent_key_reads_zero_floor(spark, stream):
    sk = sketch.cms_build(stream, "term", w=1024, d=3)
    probe = spark.createDataFrame([("never-seen-key-xyz",)], "term string")
    est = sketch.cms_estimate(sk, probe, "term", w=1024, d=3).first()
    # at w=1024 with 40 distinct terms, all 3 probe cells being occupied is
    # ~(40/1024)^3 — the min over rows reads (near-)zero
    assert est["cms_count"] <= 2


def test_cms_partial_aggregation_is_the_merge(spark, stream):
    """Building on the union == cell-wise sum of the half-stream sketches —
    the distributed-merge property, asserted literally."""
    half = F.substring(F.col("term"), 2, 10).cast("int") <= 20
    h1 = stream.where(half)
    h2 = stream.where(~half)
    full = {(r["row"], r["col"]): r["cnt"]
            for r in sketch.cms_build(stream, "term", w=64, d=3).collect()}
    s1 = {(r["row"], r["col"]): r["cnt"]
          for r in sketch.cms_build(h1, "term", w=64, d=3).collect()}
    s2 = {(r["row"], r["col"]): r["cnt"]
          for r in sketch.cms_build(h2, "term", w=64, d=3).collect()}
    merged = {k: s1.get(k, 0) + s2.get(k, 0) for k in set(s1) | set(s2)}
    assert merged == full


def test_cms_rejects_bad_geometry(spark, stream):
    with pytest.raises(ValueError, match="d must be"):
        sketch.cms_build(stream, "term", w=64, d=9)
    with pytest.raises(ValueError, match="w must be"):
        sketch.cms_build(stream, "term", w=1, d=3)


@pytest.fixture(scope="module")
def strata(spark):
    # 3 strata with overlapping key sets: a={0..599}, b={300..899},
    # c={600..1199} -> per-stratum 600 distinct, global 1200 distinct.
    rows = [(s, k + off) for s, off in (("a", 0), ("b", 300), ("c", 600))
            for k in range(600)]
    return spark.createDataFrame(rows, "src string, user int")


def test_hll_estimates_within_bound(spark, strata):
    """Per-stratum estimates land inside the lg_k=12 relative-error bound
    (~1.04/sqrt(4096) = 1.6%; assert 5% so the test can't flake)."""
    sk = sketch.hll_sketches(strata, "src", "user", lg_k=12)
    est = {r["src"]: r["n_distinct_est"]
           for r in sketch.hll_estimate(sk, ["src"]).collect()}
    assert set(est) == {"a", "b", "c"}
    for s in est:
        assert abs(est[s] - 600) <= 0.05 * 600, (s, est[s])


def test_hll_union_estimates_global_without_rescan(spark, strata):
    """The merge property: the GLOBAL cardinality from the three KB-sized
    per-stratum sketches alone — overlapping keys must not double-count
    (600*3 = 1800 rows of keys but only 1200 distinct)."""
    sk = sketch.hll_sketches(strata, "src", "user", lg_k=12).localCheckpoint()
    glob = sketch.hll_estimate(sk).first()["n_distinct_est"]
    assert abs(glob - 1200) <= 0.05 * 1200, glob
    # and the union bound does not degrade: same answer as sketching the
    # whole stream in one pass
    one_pass = sketch.hll_sketches(
        strata.withColumn("src", F.lit("all")), "src", "user", lg_k=12
    )
    direct = sketch.hll_estimate(one_pass).first()["n_distinct_est"]
    assert glob == direct


def test_hll_sketch_is_kb_sized(spark, strata):
    """The 100 TB point: a stratum's sketch is O(2^lg_k) bytes no matter
    how many rows it saw."""
    sk = sketch.hll_sketches(strata, "src", "user", lg_k=12)
    sizes = [len(r["hll_sketch"]) for r in sk.collect()]
    assert all(s <= 6 * 4096 for s in sizes), sizes


@pytest.fixture(scope="module")
def values(spark):
    # stratum a: 1..100 uniform; stratum b: 101..200 uniform
    rows = [("a", float(i)) for i in range(1, 101)] + [
        ("b", float(i)) for i in range(101, 201)
    ]
    return spark.createDataFrame(rows, "src string, v double")


def test_hist_quantiles_within_one_bin(spark, values):
    """Uniform 1..100: every estimate lands within one bin width of the
    true quantile."""
    sk = sketch.hist_sketch(values, "src", "v", lo=0.0, hi=200.0, n_bins=50)
    est = {
        (r["src"], r["q"]): r["est"]
        for r in sketch.hist_quantiles(
            sk, [0.25, 0.5, 0.9], lo=0.0, hi=200.0, n_bins=50, group_cols=["src"]
        ).collect()
    }
    width = 4.0
    for (s, q), e in est.items():
        truth = (1 if s == "a" else 101) + 99 * q
        assert abs(e - truth) <= width, (s, q, e, truth)


def test_hist_extra_group_cols_sums_back_to_plain_sketch(spark, values):
    """extra_group_cols builds every per-partition sketch in one pass
    (the daily-append construction); summing cells over the partition
    column must reproduce the plain sketch exactly."""
    parted = values.withColumn("part", (F.col("v").cast("int") % 3))
    per = sketch.hist_sketch(
        parted, "src", "v", lo=0.0, hi=200.0, n_bins=50,
        extra_group_cols=["part"],
    )
    summed = per.groupBy("src", "bin").agg(F.sum("cnt").alias("cnt"))
    plain = sketch.hist_sketch(values, "src", "v", lo=0.0, hi=200.0, n_bins=50)
    assert sorted(tuple(r) for r in summed.collect()) == sorted(
        tuple(r) for r in plain.collect()
    )
    # and there really were multiple partitions per stratum
    assert per.select("part").distinct().count() == 3


def test_hist_merge_equals_one_pass_global(spark, values):
    """The merge property: quantiles from the two per-stratum sketches
    alone == quantiles of a sketch built in one global pass."""
    sk = sketch.hist_sketch(values, "src", "v", lo=0.0, hi=200.0, n_bins=50)
    merged = sketch.hist_quantiles(sk, [0.5, 0.99], lo=0.0, hi=200.0, n_bins=50)
    one = sketch.hist_sketch(
        values.withColumn("src", F.lit("all")), "src", "v", lo=0.0, hi=200.0, n_bins=50
    )
    direct = sketch.hist_quantiles(one, [0.5, 0.99], lo=0.0, hi=200.0, n_bins=50)
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, direct.collect())
    )


def test_hist_q1_is_grid_end_and_clamping(spark):
    """q=1 interpolates to the end of the last occupied bin; values
    outside [lo, hi) clamp into the edge bins."""
    df = spark.createDataFrame(
        [("s", -5.0), ("s", 3.0), ("s", 999.0)], "src string, v double"
    )
    sk = sketch.hist_sketch(df, "src", "v", lo=0.0, hi=10.0, n_bins=10)
    bins = sorted((r["bin"], r["cnt"]) for r in sk.collect())
    assert bins == [(0, 1), (3, 1), (9, 1)]  # -5 -> bin 0, 999 -> bin 9
    est = sketch.hist_quantiles(sk, [1.0], lo=0.0, hi=10.0, n_bins=10).first()
    assert est["est"] == 10.0  # end of bin 9


def test_hist_guards(spark, values):
    with pytest.raises(ValueError, match="hi > lo"):
        sketch.hist_sketch(values, "src", "v", lo=5.0, hi=5.0)
    with pytest.raises(ValueError, match="n_bins"):
        sketch.hist_sketch(values, "src", "v", lo=0.0, hi=1.0, n_bins=1)
    sk = sketch.hist_sketch(values, "src", "v", lo=0.0, hi=200.0, n_bins=50)
    with pytest.raises(ValueError, match="0, 1"):
        sketch.hist_quantiles(sk, [0.0, 0.5], lo=0.0, hi=200.0, n_bins=50)


def test_cms_join_size_never_undercounts_and_is_tight(spark):
    """Inner-product estimate >= true join size always; exact when no
    row has colliding keys (w >> distinct keys)."""
    a = spark.createDataFrame(
        [(k,) for k in [1, 1, 1, 2, 2, 3]], "k long"
    )
    b = spark.createDataFrame(
        [(k,) for k in [1, 2, 2, 2, 4]], "k long"
    )
    # true join size: 3*1 + 2*3 = 9
    sa = sketch.cms_build(a, "k", w=1024, d=3)
    sb = sketch.cms_build(b, "k", w=1024, d=3)
    est = sketch.cms_join_size(sa, sb, d=3).first()["join_size_est"]
    assert est >= 9
    assert est == 9  # 4 distinct keys in 1024 cells: no collisions
    # and under a tiny grid it still never undercounts
    sa2 = sketch.cms_build(a, "k", w=2, d=3)
    sb2 = sketch.cms_build(b, "k", w=2, d=3)
    assert sketch.cms_join_size(sa2, sb2, d=3).first()["join_size_est"] >= 9


def test_cms_join_size_disjoint_keys_estimate_zero_possible(spark):
    """Disjoint key sets: with a wide grid the estimate collapses to 0
    (no shared occupied cells in at least one hash row)."""
    a = spark.createDataFrame([(1,), (2,)], "k long")
    b = spark.createDataFrame([(100001,), (100002,)], "k long")
    sa = sketch.cms_build(a, "k", w=1024, d=3)
    sb = sketch.cms_build(b, "k", w=1024, d=3)
    est = sketch.cms_join_size(sa, sb, d=3).first()["join_size_est"]
    assert est >= 0
    assert est == 0


def test_sketch_tables_persist_and_append(spark, strata, values, tmp_path):
    """The production daily-append pattern: land per-stratum sketch rows
    in parquet each run, answer later questions from the accumulated
    table alone.  Day-1 and day-2 HLL/histogram sketch rows written
    separately, read back, and merged must answer identically to a
    sketch built over the union — for the histogram BIT-for-bit, for
    HLL within the union-stable bound."""
    from pyspark.sql import functions as F

    d1 = strata.where(F.col("src") != "c")
    d2 = strata.where(F.col("src") == "c")
    p = str(tmp_path / "hll_table")
    sketch.hll_sketches(d1, "src", "user", lg_k=12).write.parquet(p)
    sketch.hll_sketches(d2, "src", "user", lg_k=12).write.mode("append").parquet(p)
    acc = spark.read.parquet(p)
    est = sketch.hll_estimate(acc).first()["n_distinct_est"]
    direct = sketch.hll_estimate(
        sketch.hll_sketches(strata, "src", "user", lg_k=12)
    ).first()["n_distinct_est"]
    assert est == direct  # union of persisted sketches == one-pass union

    h1 = values.where(F.col("src") == "a")
    h2 = values.where(F.col("src") == "b")
    ph = str(tmp_path / "hist_table")
    sketch.hist_sketch(h1, "src", "v", lo=0.0, hi=200.0, n_bins=50).write.parquet(ph)
    sketch.hist_sketch(h2, "src", "v", lo=0.0, hi=200.0, n_bins=50).write.mode(
        "append"
    ).parquet(ph)
    live = sketch.hist_quantiles(
        spark.read.parquet(ph), [0.5, 0.99], lo=0.0, hi=200.0, n_bins=50
    )
    full = sketch.hist_quantiles(
        sketch.hist_sketch(values, "src", "v", lo=0.0, hi=200.0, n_bins=50),
        [0.5, 0.99],
        lo=0.0,
        hi=200.0,
        n_bins=50,
    )
    assert sorted(map(tuple, live.collect())) == sorted(
        map(tuple, full.collect())
    )
