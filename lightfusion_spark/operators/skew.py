"""Skew-aware aggregation: the salting pattern as a reusable operator.

A groupBy on a low-cardinality / hot-key column funnels each hot key
into one reducer task.  Salting splits every key into ``n_salts``
sub-keys for a first partial aggregation, then combines the partials in
a second (tiny) aggregation — the classic two-phase rewrite.

Spark's map-side partial aggregation already does this implicitly for
algebraic aggregates, and AQE skew-join handles skewed *joins*; explicit
salting remains the tool when (a) the aggregate is not partial-able
(e.g. exact distinct via sets), (b) a window/collect per hot key
explodes one task, or (c) the combine stage needs different resources.
The operator exists so pipelines can opt in deliberately — and so the
rewrite's correctness is oracle-verified (results must be identical to
the plain groupBy, which is exactly what the driver checks).

Salt must be deterministic for verifiability: we hash a uniquifier
column rather than calling rand() (nondeterministic expressions also
block some optimizer rewrites).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    key_cols: list[str],
    salt_src_col: str,
    n_salts: int = 16,
) -> DataFrame:
    """Skew-safe (count, exact decimal sum of ``value``) per key.

    Phase 1 groups by (key, salt) — hot keys fan out over ``n_salts``
    reducers; phase 2 combines ``n_keys * n_salts`` partial rows.  The
    DECIMAL partials make the two-phase sum bit-identical to the
    single-phase one regardless of how rows landed in salts.
    """
    salt = F.pmod(F.xxhash64(F.col(salt_src_col)), F.lit(n_salts)).alias("_salt")
    partial = (
        df.select(*key_cols, salt, F.col("value"))
        .groupBy(*key_cols, "_salt")
        .agg(
            F.count(F.lit(1)).alias("_n"),
            F.sum(F.col("value").cast("decimal(28,6)")).alias("_s"),
        )
    )
    return (
        partial.groupBy(*key_cols)
        .agg(
            F.sum("_n").alias("n"),
            F.sum("_s").cast("double").alias("sum_value"),
        )
    )
