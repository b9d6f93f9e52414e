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


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: list[str],
    salt_src_col: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi-join: spread the big side's hot keys over
    ``n_salts`` sub-partitions and replicate the small side to match.

    The shuffle-join analogue of :func:`salted_agg`: a sort-merge or
    shuffle-hash join partitions by the join key, so one hot key (a
    viral item, a default user id) lands its entire row set on a single
    task.  Salting joins on ``(key, salt)`` instead — the big side gets
    a per-ROW deterministic salt (hashed from ``salt_src_col``, a
    uniquifier column: salting by the key alone would not spread it!)
    and the small side explodes ``n_salts`` ways, so each hot key's rows
    fan out over ``n_salts`` tasks at the cost of an n_salts-times
    larger small side — the standard trade when the small side is
    thousands of times smaller.

    Results are EXACTLY those of ``big.join(small, on, how)``: every big
    row carries one salt and meets the one matching small replica.
    ``how`` is limited to inner/left — for right/full outer the
    replicated small side would emit one unmatched row per salt.

    AQE's skew-join handles many such cases automatically at runtime;
    explicit salting remains the tool when the skew is known up front,
    when AQE's split thresholds don't trigger (moderate-but-chronic
    skew), or when the join sits under a window/collect that AQE cannot
    split.  Deterministic salt, as in :func:`salted_agg`.
    """
    if how not in ("inner", "left"):
        raise ValueError(
            f"salted_join supports inner|left, got {how!r} — a replicated "
            "small side would duplicate right/full-outer unmatched rows"
        )
    overlap = {"_salt"} & set(big.columns) | {"_salt"} & set(small.columns)
    if overlap:
        raise ValueError("salted_join needs a temp column _salt — rename it first")
    salts = F.array(*[F.lit(i).cast("bigint") for i in range(n_salts)])
    sm = small.withColumn("_salt", F.explode(salts))
    bg = big.withColumn(
        "_salt", F.pmod(F.xxhash64(F.col(salt_src_col)), F.lit(n_salts))
    )
    return bg.join(sm, [*on, "_salt"], how).drop("_salt")
