"""Bucketed-table plan contract: co-bucketed joins run with zero
exchanges; the identical join over plain parquet shuffles both sides."""

import os
import sys

import pytest

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)

from pyspark.sql import functions as F  # noqa: E402

from lightfusion_spark.plans.audit import formatted_plan  # noqa: E402
from lightfusion_spark.sources.bucketed import colocated_join, write_bucketed  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


def _exchanges(plan: str) -> int:
    import re

    # the formatted-explain detail section numbers every node: "(3) Exchange"
    return len(re.findall(r"^\(\d+\) Exchange", plan, re.M))


@pytest.fixture(scope="module")
def bucketed_tables(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("bucketed")
    orders = spark.read.parquet(os.path.join(SF_DIR, "orders.parquet"))
    lineitem = spark.read.parquet(os.path.join(SF_DIR, "lineitem.parquet"))
    write_bucketed(
        orders.withColumnRenamed("o_orderkey", "orderkey"),
        "orders_b", ["orderkey"], 4, sort_cols=["orderkey"],
        path=str(base / "orders_b"),
    )
    write_bucketed(
        lineitem.withColumnRenamed("l_orderkey", "orderkey"),
        "lineitem_b", ["orderkey"], 4, sort_cols=["orderkey"],
        path=str(base / "lineitem_b"),
    )
    yield "orders_b", "lineitem_b"
    for t in ("orders_b", "lineitem_b"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_cobucketed_join_has_zero_exchanges(spark, bucketed_tables):
    lt, rt = bucketed_tables
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = colocated_join(spark, lt, rt, ["orderkey"]).select(
            "orderkey", "o_totalprice", "l_quantity"
        )
        plan = formatted_plan(joined)
        assert "SortMergeJoin" in plan
        assert _exchanges(plan) == 0, plan
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_plain_parquet_join_shuffles_both_sides(spark):
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        o = spark.read.parquet(os.path.join(SF_DIR, "orders.parquet"))
        l = spark.read.parquet(os.path.join(SF_DIR, "lineitem.parquet"))
        joined = o.join(l, o.o_orderkey == l.l_orderkey).select(
            "o_totalprice", "l_quantity"
        )
        assert _exchanges(formatted_plan(joined)) == 2
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_cobucketed_join_matches_plain_join(spark, bucketed_tables):
    lt, rt = bucketed_tables
    bucketed = colocated_join(spark, lt, rt, ["orderkey"]).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("l_quantity").cast("double").alias("qty"),
    ).first()
    o = spark.read.parquet(os.path.join(SF_DIR, "orders.parquet"))
    l = spark.read.parquet(os.path.join(SF_DIR, "lineitem.parquet"))
    plain = o.join(l, o.o_orderkey == l.l_orderkey).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("l_quantity").cast("double").alias("qty"),
    ).first()
    assert bucketed["n"] == plain["n"] and bucketed["qty"] == plain["qty"]
