"""Ordered-funnel analysis: how far does each key get through a stage
sequence, respecting event order?

The classic product-analytics query (view → click → purchase) that a
naive GROUP BY gets wrong: stage N only counts if it happens AT OR
AFTER the key's entry into stage N-1.  Shape: one tiny per-stage
aggregation chain — each step is a (key)-grouped min-timestamp join,
so everything stays key-partitioned and the chain length is the stage
count, never the data size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def funnel_stages(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    stage_col: str,
    stages: list[str],
) -> DataFrame:
    """Per key: the first timestamp of each funnel stage, where stage
    ``i`` must occur at-or-after the key's stage ``i-1`` timestamp.

    Returns ``(key, stage_1_ts, …, stage_N_ts, stages_reached)`` with
    NULL timestamps once the funnel breaks.  Ties (same-timestamp
    consecutive stages) count as progression — the >= reading, stated
    here because both readings exist in the wild.
    """
    if not stages:
        raise ValueError("funnel_stages needs at least one stage")
    src = df.select(
        F.col(key_col).alias("_k"),
        F.col(ts_col).alias("_t"),
        F.col(stage_col).alias("_s"),
    )
    out = (
        src.where(F.col("_s") == stages[0])
        .groupBy("_k")
        .agg(F.min("_t").alias("stage_1_ts"))
    )
    for i, stage in enumerate(stages[1:], start=2):
        ev = src.where(F.col("_s") == stage).select(
            "_k", F.col("_t").alias("_cand")
        )
        prev = f"stage_{i - 1}_ts"
        # conditional aggregation, NOT a filter: a key whose candidates
        # all precede the previous stage must SURVIVE with a NULL stage
        # ts (funnel broken), not vanish from the report.  A NULL prev
        # makes the WHEN null too, so a broken funnel stays broken.
        out = (
            out.join(ev, "_k", "left")
            .groupBy("_k", *[f"stage_{j}_ts" for j in range(1, i)])
            .agg(
                F.min(
                    F.when(F.col("_cand") >= F.col(prev), F.col("_cand"))
                ).alias(f"stage_{i}_ts")
            )
        )
    reached = sum(
        F.when(F.col(f"stage_{i}_ts").isNotNull(), 1).otherwise(0)
        for i in range(1, len(stages) + 1)
    )
    return out.select(
        F.col("_k").alias(key_col),
        *[f"stage_{i}_ts" for i in range(1, len(stages) + 1)],
        reached.alias("stages_reached"),
    )


def funnel_counts(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    stage_col: str,
    stages: list[str],
) -> DataFrame:
    """The headline funnel report: ``(stage, stage_name, n_keys)`` —
    how many keys reached at least each stage, in order."""
    per_key = funnel_stages(df, key_col, ts_col, stage_col, stages)
    counts = per_key.agg(
        *[
            F.sum(
                F.col(f"stage_{i}_ts").isNotNull().cast("bigint")
            ).alias(f"_n_{i}")
            for i in range(1, len(stages) + 1)
        ]
    )
    rows = F.array(
        *[
            F.struct(
                F.lit(i).alias("stage"),
                F.lit(stages[i - 1]).alias("stage_name"),
                F.col(f"_n_{i}").alias("n_keys"),
            )
            for i in range(1, len(stages) + 1)
        ]
    )
    return counts.select(F.explode(rows).alias("r")).select("r.*")
