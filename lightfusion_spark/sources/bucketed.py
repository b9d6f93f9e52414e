"""Bucketed-table storage — the shuffle-elimination path for repeated
big-big joins and aggregations.

Several §2.4 pipelines (minhash banding, simhash chunk join, IVF cell
join) note in their docstrings that at 100 TB the cached narrow
intermediate becomes a *bucketed table*.  This module is that path made
concrete: write once hash-bucketed (and optionally sorted) on the join
key, and every subsequent equi-join or groupBy on that key runs with
ZERO exchanges — Spark's bucketed scan exposes the hash distribution to
the planner, so a sort-merge join of two co-bucketed tables reads both
sides bucket-by-bucket in place.  On a 1000-executor cluster that turns
the dominant cost of an n-way self-join pipeline (re-shuffling the same
TBs each stage) into a one-time write.

Plan contract (asserted in ``tests/test_bucketed.py``): joining two
tables bucketed ``(same key, same bucket count)`` shows **no Exchange
node** under a sort-merge join, while the identical join over plain
parquet shows two.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_cols: list[str],
    n_buckets: int,
    sort_cols: list[str] | None = None,
    path: str | None = None,
    format: str = "parquet",
) -> None:
    """Persist ``df`` hash-bucketed on ``bucket_cols``.

    ``sort_cols`` additionally sorts within each bucket file, letting a
    later sort-merge join skip its sort stage as well.  ``path`` makes
    the table external (data at ``path``, metadata in the session
    catalog) — pass a location on the shared filesystem in production,
    a tmpdir in tests.
    """
    w = df.write.format(format).mode("overwrite").bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(table_name)


def colocated_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: list[str],
    how: str = "inner",
) -> DataFrame:
    """Join two co-bucketed catalog tables on their bucket key.

    The plan is a sort-merge join with no Exchange on either side when
    both tables are bucketed on ``on`` with equal bucket counts — the
    bucketed scan IS the required hash partitioning.
    """
    return spark.table(left_table).join(spark.table(right_table), on, how)
