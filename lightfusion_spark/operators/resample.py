"""Time-series resampling: regular-grid gap filling and OHLC
downsampling.

The two batch primitives every metrics/feature pipeline needs next to
the as-of/range joins in ``asof.py``: turn an irregular event stream
into a regular grid (``gapfill`` — the TimescaleDB ``time_bucket_gapfill``
/ pandas ``resample().ffill()`` shape) and collapse it into per-bucket
bars (``downsample_ohlc``).

Both operate on INTEGER time columns (epoch micros — see
``corpus/timeseries.ts_micros_col`` for the dtype-probing conversion):
integer bucket arithmetic is engine-portable, replayable in a DuckDB
oracle, and immune to timestamp-semantics drift.

100 TB shape: everything is per-key — the spine explode is bounded by
``span/step`` rows per key, the forward-fill window and the bucket
aggregation shuffle ONCE on the key, and nothing ever crosses into
Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _floor_bucket(ts, step: int, origin: int = 0):
    """FLOOR-bucket an integer timestamp: ``origin + floor((ts-origin)/step)*step``.

    Spelled with ``pmod`` in exact integer arithmetic (no double round-trip
    — epoch micros brush against 2^53).  Spark's ``%`` is sign-preserving
    (rounds toward zero), which put any ts BELOW the origin — or any
    negative epoch — into the bucket one step LATER than floor semantics,
    i.e. the value surfaced in a future bucket (ADVICE r7).  The DuckDB
    oracles spell the identical ``((x % s) + s) % s`` so both engines share
    true floor bucketing.
    """
    off = ts - F.lit(origin)
    return off - F.pmod(off, F.lit(step)) + F.lit(origin)


def gapfill(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    step: int,
    align_origin: int = 0,
) -> DataFrame:
    """Regularize ``(key, ts, value)`` onto a ``step``-spaced grid per
    key, forward-filling values across the gaps.

    Grid points are aligned to ``align_origin`` (ts floored to the
    step) and span each key's own [min, max] — a key absent for a
    period keeps emitting its last value, which is exactly what
    monitoring/feature pipelines want from ffill.  Input must be
    unique per (key, grid point); pre-aggregate first (the registered
    query takes the exact-DECIMAL mean).

    Returns ``(key, ts, value, is_gap)`` where ``is_gap`` marks rows
    the fill synthesized.  The fill is ``last(value, ignoreNulls)``
    over an unbounded-preceding window — one shuffle on the key; the
    spine is a JVM ``sequence``/``explode``, bounded by span/step rows
    per key.
    """
    bucket = _floor_bucket(F.col(ts_col), step, align_origin)
    vals = df.select(
        F.col(key_col).alias("_k"),
        bucket.alias("_t"),
        F.col(value_col).alias("_val"),
    )
    spine = (
        vals.groupBy("_k")
        .agg(F.min("_t").alias("_lo"), F.max("_t").alias("_hi"))
        .select(
            "_k",
            F.explode(F.sequence("_lo", "_hi", F.lit(step))).alias("_t"),
        )
    )
    joined = spine.join(vals, ["_k", "_t"], "left")
    w = (
        Window.partitionBy("_k")
        .orderBy("_t")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return joined.select(
        F.col("_k").alias(key_col),
        F.col("_t").alias(ts_col),
        F.last("_val", ignorenulls=True).over(w).alias(value_col),
        F.col("_val").isNull().alias("is_gap"),
    )


def downsample_ohlc(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    bucket: int,
    tiebreak_col: str,
) -> DataFrame:
    """Per-``bucket`` bars: open/high/low/close + count and exact sum.

    ``open``/``close`` are the first/last value by (ts, tiebreak) —
    the tiebreak makes simultaneous events deterministic, expressed as
    portable ROW_NUMBER windows (composite ``arg_min`` exists in
    neither engine).  One shuffle for the windows, reused by the final
    aggregation (same partitioning key).
    """
    b = _floor_bucket(F.col(ts_col), bucket).alias("_b")
    src = df.select(
        F.col(key_col).alias("_k"),
        b,
        F.col(ts_col).alias("_t"),
        F.col(value_col).alias("_val"),
        F.col(tiebreak_col).alias("_tb"),
    )
    w_asc = Window.partitionBy("_k", "_b").orderBy("_t", "_tb")
    w_desc = Window.partitionBy("_k", "_b").orderBy(
        F.col("_t").desc(), F.col("_tb").desc()
    )
    tagged = src.select(
        "_k",
        "_b",
        "_val",
        F.row_number().over(w_asc).alias("_rn_a"),
        F.row_number().over(w_desc).alias("_rn_d"),
    )
    return tagged.groupBy("_k", "_b").agg(
        F.max(F.when(F.col("_rn_a") == 1, F.col("_val"))).alias("open"),
        F.max("_val").alias("high"),
        F.min("_val").alias("low"),
        F.max(F.when(F.col("_rn_d") == 1, F.col("_val"))).alias("close"),
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("_val").cast("decimal(28,6)")).cast("double").alias("sum_value"),
    ).select(
        F.col("_k").alias(key_col),
        F.col("_b").alias(ts_col),
        "open",
        "high",
        "low",
        "close",
        "n",
        "sum_value",
    )
