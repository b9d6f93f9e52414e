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

from .storemaint import atomic_replace


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


def merge_into_state(
    state_dir: str,
    batch_df: DataFrame,
    key_cols: list[str],
    seq_col: str,
    op_col: str | None = None,
    delete_op: str = "D",
    tiebreak_cols: list[str] | None = None,
) -> None:
    """One CDC merge cycle against a parquet state directory: read the
    previous snapshot (if any), union the arriving batch, re-compact
    with :func:`latest_snapshot`, and atomically-enough replace the
    state (the result is pinned with ``localCheckpoint`` BEFORE the
    overwrite, so the lazy read of the directory being replaced can
    never feed its own overwrite).

    This is the ``foreachBatch`` body for a maintained upsert store —
    paired with a checkpointed ``writeStream`` it is idempotent under
    micro-batch replay because compaction is deterministic ((seq,
    tiebreak) total order) and the overwrite is whole-snapshot.  A
    production deployment swaps this for a transactional table format's
    MERGE (Delta/Iceberg); the compaction semantics — and the tests —
    stay identical.

    Deletes are kept as TOMBSTONES in the stored state (only the
    (seq, tiebreak) winner per key is stored, whatever its op): if the
    delete row itself were dropped at merge time, a later micro-batch
    carrying an OLDER change for that key would resurrect it.  Read the
    live view back with :func:`read_state`, which filters tombstones.
    """
    spark = batch_df.sparkSession
    # "First batch" is decided by an EXPLICIT existence probe, never by
    # catching the read error: a transient IO/permission failure or a
    # corrupted state file must propagate, not silently discard all prior
    # state by overwriting the store with only the arriving batch.
    jvm_path = spark._jvm.org.apache.hadoop.fs.Path(state_dir)
    fs = jvm_path.getFileSystem(
        spark._jsc.hadoopConfiguration()  # resolves s3a/hdfs/local alike
    )
    if fs.exists(jvm_path):
        prev = spark.read.parquet(state_dir)
        merged = prev.unionByName(batch_df)
    else:
        merged = batch_df
    snap = latest_snapshot(
        merged, key_cols, seq_col, op_col=None, tiebreak_cols=tiebreak_cols
    )
    # staging write + two-rename swap (r17): the old in-place
    # overwrite deleted the store before writing, so a crash in
    # between lost it — and the checkpointed replay then saw "no
    # store" and silently rebuilt from the arriving batch alone,
    # exactly the prior-state discard the existence probe above
    # guards against.  The swap also retires the pre-overwrite
    # localCheckpoint (the staging write materializes the plan off
    # the live directory — one materialization instead of two).
    atomic_replace(spark, snap, state_dir)


def read_state(
    spark,
    state_dir: str,
    op_col: str | None = None,
    delete_op: str = "D",
) -> DataFrame:
    """The live view of a :func:`merge_into_state` store: the stored
    per-key winners with delete tombstones filtered out."""
    state = spark.read.parquet(state_dir)
    if op_col is not None:
        state = state.where(F.col(op_col) != delete_op)
    return state
