"""sources/layout.py: Z-order clustering — key bit-exactness and the
actual data-skipping payoff (file-level min/max pruning on BOTH
dimensions), which no SQL oracle can express.
"""

import glob

import pyarrow.parquet as pa_pq
import pytest
from pyspark.sql import functions as F

from lightfusion_spark.sources import layout


def _ref_morton(vals, bits):
    key = 0
    n = len(vals)
    for b in range(bits):
        for i, v in enumerate(vals):
            key += ((v >> b) & 1) << (b * n + i)
    return key


def test_zorder_key_matches_reference_interleave(spark):
    rows = [(3, 5), (255, 0), (0, 255), (170, 85)]
    df = spark.createDataFrame(rows, "x long, y long")
    got = [
        r["k"]
        for r in df.select(
            layout.zorder_key(["x", "y"], bits=8).alias("k")
        ).collect()
    ]
    assert got == [_ref_morton(v, 8) for v in rows]


def test_bit_budget_guard(spark):
    with pytest.raises(ValueError, match="63-bit"):
        layout.zorder_key(["a", "b", "c", "d"], bits=16)
    with pytest.raises(ValueError, match="at least one"):
        layout.zorder_key([])


def _files_overlapping(path, col, lo, hi):
    """Count parquet files whose [min,max] for col intersects [lo,hi] —
    exactly the statistic a pruning scan consults."""
    hits = 0
    files = sorted(glob.glob(f"{path}/*.parquet"))
    assert files
    for f in files:
        md = pa_pq.ParquetFile(f).metadata
        fmin, fmax = None, None
        for rg in range(md.num_row_groups):
            rgm = md.row_group(rg)
            for ci in range(rgm.num_columns):
                c = rgm.column(ci)
                if c.path_in_schema == col and c.statistics is not None:
                    s = c.statistics
                    fmin = s.min if fmin is None else min(fmin, s.min)
                    fmax = s.max if fmax is None else max(fmax, s.max)
        assert fmin is not None, f"no stats for {col} in {f}"
        if not (fmax < lo or fmin > hi):
            hits += 1
    return hits, len(files)


def test_zorder_write_prunes_both_dimensions(spark, tmp_path):
    """The payoff claim: a z-ordered write lets a filter on EITHER
    column skip most files, while a single-column sort only skips on
    its own column."""
    # deterministic pseudo-uniform grid points in [0, 256)^2
    df = spark.range(20000).select(
        ((F.col("id") * 2654435761) % 256).alias("x"),
        ((F.col("id") * 97 + 13) % 256).alias("y"),
    )
    zpath = str(tmp_path / "zorder")
    xpath = str(tmp_path / "xsort")
    layout.cluster_by_zorder(df, ["x", "y"], bits=8, n_partitions=16).write.parquet(
        zpath
    )
    (
        df.repartitionByRange(16, "x")
        .sortWithinPartitions("x")
        .write.parquet(xpath)
    )
    # filter on y: z-order must prune; x-sort cannot (y spans everywhere)
    z_hit, z_n = _files_overlapping(zpath, "y", 16, 31)
    x_hit, x_n = _files_overlapping(xpath, "y", 16, 31)
    assert x_hit == x_n, "x-sorted layout unexpectedly pruned on y"
    assert z_hit < z_n / 2, f"z-order pruned too little on y: {z_hit}/{z_n}"
    # and z-order still prunes on x too
    zx_hit, _ = _files_overlapping(zpath, "x", 16, 31)
    assert zx_hit < z_n / 2, f"z-order pruned too little on x: {zx_hit}/{z_n}"
    # layout changes bytes, not rows
    assert spark.read.parquet(zpath).count() == 20000


def test_compact_parquet_reduces_files_preserves_rows(spark, tmp_path):
    from lightfusion_spark.sources import layout

    src = str(tmp_path / "tiny")
    # 40 tiny files
    spark.range(4000).repartition(40).write.parquet(src)
    assert len(glob.glob(f"{src}/part-*.parquet")) == 40
    dst = str(tmp_path / "compact")
    n = layout.compact_parquet(spark, src, dst, target_mb=512)
    assert n <= 2  # a few KB of data -> one target-sized file
    assert spark.read.parquet(dst).count() == 4000
    # sorted compaction restores a clustered layout
    dst2 = str(tmp_path / "compact_sorted")
    layout.compact_parquet(spark, src, dst2, target_mb=512, sort_cols=["id"])
    got = [r["id"] for r in spark.read.parquet(dst2).collect()]
    assert got == sorted(got) or len(glob.glob(f"{dst2}/part-*.parquet")) > 1


def test_file_stats_report_reflects_layout(spark, tmp_path):
    from lightfusion_spark.sources import layout
    from pyspark.sql import functions as F

    src = str(tmp_path / "ranged")
    spark.range(1000).select(F.col("id")).repartitionByRange(4, "id").write.parquet(src)
    rep = layout.file_stats_report(spark, src, ["id"]).collect()
    assert len(rep) == 4 and all(r["col"] == "id" for r in rep)
    # range-partitioned files must have non-overlapping [min, max]
    spans = sorted((int(r["min_str"]), int(r["max_str"])) for r in rep)
    for (lo1, hi1), (lo2, _) in zip(spans, spans[1:]):
        assert hi1 < lo2
    # one report row per (file, col) here, so per-file counts sum to the total
    assert sum(r["n_rows"] for r in rep) == 1000


def test_file_stats_report_distributed_matches_driver_path(spark, tmp_path):
    """The >100k-files variant (mapInPandas over the file LIST — footer
    parse fans out, data pages never read) must produce byte-identical
    rows to the driver-side pyarrow listing on the same directory."""
    from lightfusion_spark.sources import layout
    from pyspark.sql import functions as F

    src = str(tmp_path / "ranged2")
    (spark.range(2000)
     .select(F.col("id"), (F.col("id") % 7).alias("grp"))
     .repartitionByRange(6, "id").write.parquet(src))
    driver_rows = sorted(
        tuple(r) for r in layout.file_stats_report(spark, src, ["id", "grp"]).collect()
    )
    dist_rows = sorted(
        tuple(r) for r in
        layout.file_stats_report_distributed(spark, src, ["id", "grp"]).collect()
    )
    assert driver_rows == dist_rows and len(driver_rows) == 12
    # the distributed plan carries only the path strings into Python —
    # no binaryFile scan of data bytes
    plan = layout.file_stats_report_distributed(spark, src, ["id"])._jdf.queryExecution().executedPlan().toString()
    assert "binaryFile" not in plan
