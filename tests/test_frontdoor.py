"""Unit tests for the SQL front-door string shim (no Spark needed)."""

import pytest

from lightfusion_spark import config as lf_config
from lightfusion_spark import errors
from lightfusion_spark.frontdoor import (
    parse_create_function,
    parse_set_lightfusion,
    preprocess,
    rewrite_array_literals,
)


def test_parse_create_function_full():
    s = parse_create_function(
        "CREATE FUNCTION f0(DOUBLE[]) RETURNS DOUBLE[] LANGUAGE LIGHTGBM AS 'm.lgbm'"
    )
    assert (s.name, s.input_type, s.return_type, s.model_path) == ("f0", "double", "double", "m.lgbm")


def test_parse_create_function_defaults():
    s = parse_create_function("CREATE FUNCTION my_fn() LANGUAGE LIGHTGBM")
    assert s.input_type == "double"  # src/lib.rs:35-42 default Float64
    assert s.return_type == "double"  # default = input (src/lib.rs:46-49)
    assert s.model_path == "model/my_fn.lgbm"  # src/lib.rs:55


def test_parse_create_function_float_and_array_syntax():
    s = parse_create_function("create function g(FLOAT[]) language lightgbm as 'x'")
    assert s.input_type == "float" and s.return_type == "float"
    s2 = parse_create_function("CREATE FUNCTION h(ARRAY<DOUBLE>) LANGUAGE LIGHTGBM AS 'y'")
    assert s2.input_type == "double"


def test_parse_create_function_non_literal_body_errors():
    with pytest.raises(errors.InvalidDdlError):
        parse_create_function("CREATE FUNCTION f() LANGUAGE LIGHTGBM AS some_ident")


def test_parse_create_function_passthrough():
    assert parse_create_function("SELECT 1") is None
    assert parse_create_function("CREATE FUNCTION f() RETURNS INT RETURN 1") is None


def test_parse_set():
    assert parse_set_lightfusion("SET lightfusion.batch_size = 32") == (
        "lightfusion.batch_size",
        "32",
    )
    assert parse_set_lightfusion("SET spark.sql.shuffle.partitions=8") is None
    with pytest.raises(lf_config.LightFusionConfigError):
        parse_set_lightfusion("SET lightfusion.nope = 1")


def test_rewrite_array_literals_basic():
    assert rewrite_array_literals("SELECT [1, 2, 3]") == "SELECT array(1, 2, 3)"
    assert (
        rewrite_array_literals("SELECT f0([0.1, 0.2]) AS x")
        == "SELECT f0(array(0.1, 0.2)) AS x"
    )


def test_rewrite_array_literals_nested():
    assert rewrite_array_literals("SELECT [[1,2],[3,4]]") == "SELECT array(array(1,2),array(3,4))"


def test_rewrite_preserves_subscripts_and_strings():
    assert rewrite_array_literals("SELECT arr[1] FROM t") == "SELECT arr[1] FROM t"
    assert rewrite_array_literals("SELECT m['k'] FROM t") == "SELECT m['k'] FROM t"
    assert rewrite_array_literals("SELECT f(x)[2]") == "SELECT f(x)[2]"
    assert rewrite_array_literals("SELECT '[1,2]' AS s") == "SELECT '[1,2]' AS s"
    assert rewrite_array_literals("SELECT [1,2][0]") == "SELECT array(1,2)[0]"


def test_preprocess_info_schema():
    assert (
        preprocess("SELECT * FROM information_schema.df_settings")
        == "SELECT * FROM df_settings"
    )


def test_preprocess_info_schema_quote_aware():
    # rewrite applies outside quotes only (ADVICE r1): string data survives
    q = "SELECT 'information_schema.df_settings' AS s FROM information_schema.df_settings"
    assert preprocess(q) == "SELECT 'information_schema.df_settings' AS s FROM df_settings"


def test_subscript_on_keywordish_identifiers():
    # `values`/`end`/`set` are legal column names; [ after them is a subscript
    assert rewrite_array_literals("SELECT values[1] FROM t") == "SELECT values[1] FROM t"
    assert rewrite_array_literals("SELECT end[0] FROM t") == "SELECT end[0] FROM t"
    assert rewrite_array_literals("SELECT set[2] FROM t") == "SELECT set[2] FROM t"


def test_parse_create_external_table():
    from lightfusion_spark.frontdoor import parse_create_external_table

    s = parse_create_external_table(
        "CREATE EXTERNAL TABLE m STORED AS CSV DELIMITER '\t' LOCATION 'multiclass.test'"
    )
    assert (s.name, s.format, s.delimiter, s.location) == ("m", "csv", "\t", "multiclass.test")
    assert s.header is False
    s2 = parse_create_external_table(
        "CREATE EXTERNAL TABLE p STORED AS PARQUET LOCATION '/tmp/x.parquet'"
    )
    assert (s2.format, s2.location) == ("parquet", "/tmp/x.parquet")
    assert parse_create_external_table("CREATE TABLE t (a INT)") is None
    assert parse_create_external_table("SELECT 1") is None
    with pytest.raises(errors.InvalidDdlError):
        parse_create_external_table("CREATE EXTERNAL TABLE bad STORED AS CSV")
    with pytest.raises(errors.UnsupportedTypeError):
        parse_create_external_table(
            "CREATE EXTERNAL TABLE bad STORED AS AVRO LOCATION 'x'"
        )
