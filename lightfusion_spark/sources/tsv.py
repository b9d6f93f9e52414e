"""Headerless TSV source with DataFusion-compatible column naming.

The reference scans its eval set via ``CREATE EXTERNAL TABLE m STORED AS CSV
DELIMITER '\\t' LOCATION 'multiclass.test'`` with schema inference and
default column names ``column_1..column_N`` (``examples/lightfusion_tsv.rs:
20-24``).  Spark's inferred names are ``_c0.._cN-1``; this loader renames
them for name parity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def read_headerless_tsv(spark: SparkSession, path: str, delimiter: str = "\t") -> DataFrame:
    df = (
        spark.read.option("delimiter", delimiter)
        .option("header", "false")
        .option("inferSchema", "true")
        .csv(path)
    )
    renames = {c: f"column_{i + 1}" for i, c in enumerate(df.columns)}
    return df.withColumnsRenamed(renames)
