"""Source/sink coverage: parquet/csv/json round trips (SURVEY §2.3 row
'scans/sources' + 'sinks'), plus the DataFusion-style external-table DDL
for parquet and json."""

import os

import pytest

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def nation(spark):
    return spark.read.parquet(f"{SF_DIR}/nation.parquet")


def _assert_same_rows(a, b):
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_parquet_round_trip(spark, nation, tmp_path):
    path = str(tmp_path / "nation_pq")
    nation.write.mode("overwrite").parquet(path)
    _assert_same_rows(spark.read.parquet(path), nation)


def test_csv_round_trip(spark, nation, tmp_path):
    path = str(tmp_path / "nation_csv")
    nation.write.mode("overwrite").option("header", True).csv(path)
    back = spark.read.option("header", True).option("inferSchema", True).csv(path)
    _assert_same_rows(back, nation)


def test_json_round_trip(spark, nation, tmp_path):
    path = str(tmp_path / "nation_json")
    nation.write.mode("overwrite").json(path)
    back = spark.read.json(path).select(*nation.columns)  # json sorts keys
    _assert_same_rows(back, nation)


def test_partitioned_parquet_sink_prunes(spark, tmp_path):
    """Partitioned writes + partition pruning — the layout that matters at
    100 TB (a filtered read lists only the matching directory)."""
    from lightfusion_spark.plans.audit import formatted_plan

    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    path = str(tmp_path / "orders_part")
    orders.write.mode("overwrite").partitionBy("o_orderstatus").parquet(path)
    back = spark.read.parquet(path).where("o_orderstatus = 'F'")
    plan = formatted_plan(back)
    assert "PartitionFilters" in plan and "o_orderstatus" in plan.split("PartitionFilters")[1][:200]
    assert back.count() == orders.where("o_orderstatus = 'F'").count()


def test_external_table_parquet_and_json(engine, nation, tmp_path):
    jpath = str(tmp_path / "nation_j")
    nation.write.mode("overwrite").json(jpath)
    engine.sql(f"CREATE EXTERNAL TABLE nation_ext STORED AS PARQUET LOCATION '{SF_DIR}/nation.parquet'")
    assert engine.sql("SELECT COUNT(*) AS n FROM nation_ext").first()["n"] == 25
    engine.sql(f"CREATE EXTERNAL TABLE nation_j STORED AS JSON LOCATION '{jpath}'")
    assert engine.sql("SELECT COUNT(*) AS n FROM nation_j").first()["n"] == 25


def test_orc_round_trip(spark, nation, tmp_path):
    path = str(tmp_path / "nation_orc")
    nation.write.mode("overwrite").orc(path)
    back = spark.read.orc(path)
    _assert_same_rows(back, nation)


def test_orc_predicate_pushdown(spark, tmp_path):
    from lightfusion_spark.plans.audit import formatted_plan

    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    path = str(tmp_path / "orders_orc")
    orders.write.mode("overwrite").orc(path)
    back = spark.read.orc(path).where("o_totalprice > 100000").select("o_orderkey")
    plan = formatted_plan(back)
    assert "PushedFilters" in plan and "o_totalprice" in plan.split("PushedFilters")[1][:200]
    assert back.count() == orders.where("o_totalprice > 100000").count()
