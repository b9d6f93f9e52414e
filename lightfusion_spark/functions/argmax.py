"""``argmax`` — index of the maximum element of an array column.

The reference implements this as a SIMD-accelerated Rust scalar UDF over
Arrow list arrays (``src/argmax.rs:15-120``), returning ``UInt32`` with
first-max-wins tie semantics (``src/argmax.rs:115`` via the ``argminmax``
crate).

Spark-first design: **no Python hop at all** — ``argmax(v)`` is the built-in
expression ``array_position(v, array_max(v)) - 1``, which stays inside
whole-stage codegen on the JVM.  ``array_position`` returns the *first*
occurrence, preserving first-max-wins.  Registered for SQL via a Spark 4 SQL
scalar UDF (``CREATE FUNCTION ... RETURN expr``) so SQL queries also stay
JVM-side.

NaN semantics match the reference: ``argminmax`` ignores NaN elements
(``Cargo.toml:20`` default features), so the maximum is taken over the
non-NaN elements — expressed here as ``array_max(filter(v, NOT isnan))``,
still a pure JVM expression.

Deviations (documented, SURVEY.md §7):
* return type ``INT`` — Spark has no unsigned types (reference returns
  ``UInt32``, ``src/argmax.rs:58-60``);
* empty/null/all-NaN array -> NULL (the reference never sees one: list
  items are declared non-nullable, ``src/udf.rs:70``).
"""

from __future__ import annotations

from pyspark.sql import Column, SparkSession
from pyspark.sql import functions as F

ARGMAX_SQL_BODY = (
    "CAST(array_position(v, array_max(filter(v, x -> NOT isnan(x)))) - 1 AS INT)"
)


def argmax(col: Column | str) -> Column:
    """DataFrame-API argmax: first index (0-based) of the array's maximum,
    ignoring NaN elements (first-max-wins on ties)."""
    c = F.col(col) if isinstance(col, str) else col
    non_nan_max = F.array_max(F.filter(c, lambda x: ~F.isnan(x)))
    return (F.array_position(c, non_nan_max) - F.lit(1)).cast("int")


def register_argmax(spark: SparkSession) -> None:
    """Register ``argmax`` for SQL use.

    Primary path: Spark 4 SQL scalar UDF — a pure JVM expression, no Python
    worker involved (the analogue of pre-registering the Rust UDF in
    ``configure_context()``, ``src/lib.rs:112``).  Typed ``ARRAY<DOUBLE>``
    parameter: integer/float arrays reach it through implicit casts.
    """
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION argmax(v ARRAY<DOUBLE>) "
        f"RETURNS INT RETURN {ARGMAX_SQL_BODY}"
    )
