"""Change-data-capture primitives: latest-wins upsert compaction and
SCD2 validity intervals — the Delta-``MERGE``/dimension-table shapes
from plain Spark operators.

A 100 TB lakehouse ingests mutation streams (key, seq, op, payload);
before anything joins them it needs (a) the CURRENT state per key
(``latest_snapshot``) and (b) the history as validity intervals for
temporal AS-OF queries (``scd2_intervals``).  Both are one window over
the key — no driver state, no Python, and the window shuffle is the
same (key)-partitioning every downstream join wants.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def latest_snapshot(
    changes: DataFrame,
    key_cols: list[str],
    seq_col: str,
    op_col: str | None = None,
    delete_op: str = "D",
    tiebreak_cols: list[str] | None = None,
) -> DataFrame:
    """Compact a change stream to its latest-wins state: one row per
    key (the highest ``seq_col``), rows whose final op is a delete
    dropped.

    ``tiebreak_cols`` orders same-seq changes deterministically (a CDC
    feed with batch-grain sequence numbers NEEDS one — otherwise the
    survivor depends on partitioning, the exact nondeterminism this
    module exists to kill).  One ROW_NUMBER window on the key; output
    partitioning = key partitioning, which every downstream join
    reuses.
    """
    order = [F.col(seq_col).desc()] + [
        F.col(c).desc() for c in (tiebreak_cols or [])
    ]
    w = Window.partitionBy(*key_cols).orderBy(*order)
    latest = (
        changes.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )
    if op_col is not None:
        latest = latest.where(F.col(op_col) != delete_op)
    return latest


def scd2_intervals(
    changes: DataFrame,
    key_cols: list[str],
    seq_col: str,
    tiebreak_cols: list[str] | None = None,
    end_col: str = "valid_to",
    current_marker: int | None = None,
) -> DataFrame:
    """Slowly-changing-dimension type 2: each change becomes a validity
    interval ``[seq, next_seq)`` via ``lead`` over the key — the open
    (current) interval gets ``current_marker`` (NULL by default).

    AS-OF T lookups are then ``valid_from <= T AND (valid_to IS NULL OR
    T < valid_to)`` — a plain filter, prunable, no as-of join needed.
    Same single key-window as :func:`latest_snapshot`.
    """
    order = [F.col(seq_col).asc()] + [F.col(c).asc() for c in (tiebreak_cols or [])]
    w = Window.partitionBy(*key_cols).orderBy(*order)
    nxt = F.lead(F.col(seq_col)).over(w)
    out = changes.withColumn(
        end_col,
        nxt if current_marker is None else F.coalesce(nxt, F.lit(current_marker)),
    )
    return out.withColumnRenamed(seq_col, "valid_from") if seq_col != "valid_from" else out


def snapshot_as_of(
    intervals: DataFrame,
    at: int,
    from_col: str = "valid_from",
    end_col: str = "valid_to",
) -> DataFrame:
    """The state as of sequence/time ``at`` from :func:`scd2_intervals`
    output: a pure filter (partition-prunable when the table is stored
    partitioned/z-ordered on the interval columns)."""
    return intervals.where(
        (F.col(from_col) <= F.lit(at))
        & (F.col(end_col).isNull() | (F.lit(at) < F.col(end_col)))
    )
