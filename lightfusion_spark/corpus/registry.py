"""QuerySpec registry — the single source of truth behind
``__spark_entry__.queries()`` / ``oracle_sql()``.

Design rules for every spec (they make the DuckDB hash-compare exact):

* alias every computed column identically in the Spark plan and the oracle;
* sums/avgs of doubles go through ``DECIMAL(18,4)`` (exact, associative)
  and back to double, so Spark's partial aggregation order can never change
  a result bit (driver compares order-insensitive value hashes);
* row-level float arithmetic (+,-,*,/) is IEEE-identical across engines and
  needs no rounding; transcendentals (exp/ln) are rounded to 6 decimals
  because libm implementations may differ in the last ulp;
* no raw TIMESTAMP columns in outputs — return date parts / DATE / strings
  (Spark TIMESTAMP is an instant, DuckDB's is naive; formatting diverges).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

#: name -> spec, in registration order.
REGISTRY: dict[str, "QuerySpec"] = {}


@dataclass
class QuerySpec:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # DuckDB SQL over the pre-registered table views; None => rows-only check
    doc: str = ""


def register(name: str, oracle: str | None, doc: str = ""):
    """Decorator: ``@register("rel_agg_q1", oracle="SELECT ...")``."""

    def wrap(fn):
        REGISTRY[name] = QuerySpec(name=name, fn=fn, oracle=oracle, doc=doc)
        return fn

    return wrap


def query_functions() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: spec.fn for name, spec in REGISTRY.items()}


def oracle_strings() -> dict[str, str]:
    return {name: spec.oracle for name, spec in REGISTRY.items() if spec.oracle is not None}
