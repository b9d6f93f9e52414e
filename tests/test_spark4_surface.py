"""Spark 4 SQL-surface coverage that doesn't need a driver-window slot:
pipe syntax (|>) and SQL-defined functions, each verified against the
classic formulation on the real testdata.  (Recursive CTEs and VARIANT
are oracle-verified corpus queries: rel_recursive_cte, rel_variant.)
"""

def _orders(spark, sf_dir):
    from lightfusion_spark.corpus.util import table

    table(spark, sf_dir, "orders").createOrReplaceTempView("orders")


def test_pipe_syntax_matches_classic_sql(spark, sf_dir):
    _orders(spark, sf_dir)
    piped = spark.sql(
        """
        FROM orders
        |> WHERE o_totalprice > 100000
        |> AGGREGATE COUNT(*) AS n,
                     CAST(SUM(CAST(o_totalprice AS DECIMAL(28,6))) AS DOUBLE)
                       AS total
           GROUP BY o_orderpriority
        |> ORDER BY o_orderpriority
        """
    ).collect()
    classic = spark.sql(
        """
        SELECT o_orderpriority, COUNT(*) AS n,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(28,6))) AS DOUBLE) AS total
        FROM orders WHERE o_totalprice > 100000
        GROUP BY o_orderpriority ORDER BY o_orderpriority
        """
    ).collect()
    assert [tuple(r) for r in piped] == [
        (r["o_orderpriority"], r["n"], r["total"]) for r in classic
    ]
    assert piped  # non-degenerate


def test_sql_scalar_function_in_query(spark, sf_dir):
    _orders(spark, sf_dir)
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION price_band(p DOUBLE) RETURNS STRING "
        "RETURN CASE WHEN p < 50000 THEN 'low' WHEN p < 150000 THEN 'mid' "
        "ELSE 'high' END"
    )
    got = {
        r["band"]: r["n"]
        for r in spark.sql(
            "SELECT price_band(o_totalprice) AS band, COUNT(*) AS n "
            "FROM orders GROUP BY 1"
        ).collect()
    }
    expect = {
        r["band"]: r["n"]
        for r in spark.sql(
            "SELECT CASE WHEN o_totalprice < 50000 THEN 'low' "
            "WHEN o_totalprice < 150000 THEN 'mid' ELSE 'high' END AS band, "
            "COUNT(*) AS n FROM orders GROUP BY 1"
        ).collect()
    }
    assert got == expect and set(got) == {"low", "mid", "high"}


def test_sql_table_function(spark):
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION tiers() RETURNS TABLE(tier STRING, "
        "lo DOUBLE) RETURN SELECT * FROM VALUES ('low', 0.0), ('high', 150000.0) "
        "AS t(tier, lo)"
    )
    rows = spark.sql("SELECT * FROM tiers() ORDER BY lo").collect()
    assert [(r["tier"], r["lo"]) for r in rows] == [("low", 0.0), ("high", 150000.0)]
