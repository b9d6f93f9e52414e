"""Shared helpers for corpus queries."""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

#: Exact-decimal accumulator type for float sums: exact and associative so
#: partial-aggregation order (shuffle partitioning, AQE coalescing) can
#: never flip a bit.  Scale 6 because every monetary value in the testdata
#: has <= 6 decimal digits (price x discount x tax products) — the cast is
#: then *exact*, avoiding engine-specific tie-rounding (Spark HALF_UP vs
#: DuckDB half-even at .00005 boundaries).  Precision 28 leaves 22 integer
#: digits of headroom for 100 TB-scale sums.
DEC = "decimal(28,6)"


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """One driver table as a DataFrame (column-pruned parquet scan).

    Session confs applied on every load (the driver's session config is
    not ours to choose):

    * UTC session time — timestamp literals, day-window alignment and
      ``date_format`` outputs must match DuckDB's naive timestamps
      regardless of the host timezone;
    * ``nanosAsLong`` — a no-op for the current testdata (events.ts is
      parquet TIMESTAMP[us], read as TIMESTAMP_NTZ), kept so legacy
      TIMESTAMP(NANOS) files still load; event-time code probes the
      loaded dtype (``streaming.events.event_time_col``) instead of
      assuming either representation.
    """
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def use_utc(spark: SparkSession) -> None:
    """Timestamps in the driver parquet are naive; read them as UTC instants
    so date-part extraction matches DuckDB's naive interpretation."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")


def dsum(col: str | Column, alias: str) -> Column:
    """Order-insensitive exact sum of a double column -> double."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(DEC)).cast("double").alias(alias)


def davg(col: str | Column, alias: str) -> Column:
    """Exact-decimal average -> double (sum_dec / count, both deterministic)."""
    c = F.col(col) if isinstance(col, str) else col
    return (F.sum(c.cast(DEC)).cast("double") / F.count(F.lit(1))).alias(alias)


def sql_dsum(expr: str, alias: str) -> str:
    return f"CAST(SUM(CAST({expr} AS DECIMAL(28,6))) AS DOUBLE) AS {alias}"


def sql_davg(expr: str, alias: str) -> str:
    return f"CAST(SUM(CAST({expr} AS DECIMAL(28,6))) AS DOUBLE) / COUNT(*) AS {alias}"
