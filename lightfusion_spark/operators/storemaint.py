"""Generic layout maintenance for batch-appended CELL stores — the
small-files half of the store family's lifecycle (r16 verdict item 3).

Every maintained store in this repo (the eval-metric cell stores —
BLEU/chrF/WER/ROUGE/QA/ranking/winrate, the binary-score store — the
conversation-dedup relations, the additive sketch store) follows one
append discipline: each batch appends rows that are a DETERMINISTIC
function of the batch's data, tagged with a ``batch_id``, and the read
side collapses replay duplicates (MAX per cell-and-batch, or a
full-row drop) before summing.  The cheapest correct append is one
parquet file per batch — so a long-lived store accumulates one file
per batch forever, and every read pays a task per file.  The sketch
stores solved this with a semantic fold (``sketch_compact_state`` — a
fence plus cell summation); the IVF index with a validated rewrite
(``ivf_compact``).  This module is the store-agnostic version of the
latter: a PHYSICAL rewrite that never interprets the cells.

:func:`compact_cell_store` works on any append-dir whose rows carry a
``batch_id`` column because it only ever collapses BIT-IDENTICAL full
rows — exactly the rows a replayed batch re-appends (appends are
deterministic, the family contract), and never two distinct logical
rows (within a batch, cells are grouped per key — one row each; across
batches, ``batch_id`` differs).  Streamed-equals-one-shot parity
therefore survives compaction bit for bit, replay stays addressable
(batch ids live in the rows, untouched), and a post-compaction replay
of an already-applied batch re-appends rows the read side still
collapses — all test-pinned in ``tests/test_storemaint.py``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def atomic_replace(spark: SparkSession, df: DataFrame, path: str) -> None:
    """Crash-safe whole-relation replacement for maintained stores —
    the write-side half of the :func:`compact_cell_store` contract,
    factored out for stores whose replacement is SEMANTIC (the HLL
    union-fold, the additive-sketch fence fold, the CDC snapshot)
    rather than a row-identical rewrite (r17; closes a real
    crash-recovery hole: ``mode("overwrite")`` on the directory being
    replaced deletes it BEFORE writing, so a crash in between loses
    the store — and in the CDC ``foreachBatch`` case the streaming
    replay then sees "no store" and silently rebuilds from the
    arriving batch alone, exactly the prior-state discard its
    existence probe exists to prevent).

    ``df`` MAY lazily read from ``path``: the plan materializes into a
    sibling ``{path}_staging`` directory first (which also makes the
    defensive pre-overwrite ``localCheckpoint`` the old call sites
    carried unnecessary — one materialization instead of two), then
    the two-rename swap replaces the live directory.  Crash windows:
    before the first rename the store is untouched; between renames
    ``{path}_pre`` holds the original (recover by renaming back) and
    the next call REFUSES until an operator resolves it; a stale
    ``_staging`` never blocks a retry.
    """
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path
    fs = hpath(path).getFileSystem(spark._jsc.hadoopConfiguration())
    pre = f"{path}_pre"
    if fs.exists(hpath(pre)):
        raise RuntimeError(
            f"atomic_replace: {pre} exists — a previous replacement "
            "crashed mid-swap and it may be the only copy of the store; "
            "rename it back over the store (or remove it after "
            "verifying the store reads) before retrying"
        )
    tmp = f"{path}_staging"
    if fs.exists(hpath(tmp)):
        fs.delete(hpath(tmp), True)
    df.write.mode("error").parquet(tmp)
    had_prior = fs.exists(hpath(path))
    if had_prior and not fs.rename(hpath(path), hpath(pre)):
        raise RuntimeError(f"atomic_replace: could not stage {path}")
    if not fs.rename(hpath(tmp), hpath(path)):
        if had_prior:
            fs.rename(hpath(pre), hpath(path))
        raise RuntimeError(f"atomic_replace: could not swap in {tmp}")
    if had_prior:
        fs.delete(hpath(pre), True)


def compact_cell_store(
    spark: SparkSession, path: str, target_files: int = 1
) -> dict:
    """Fold a batch-appended cell store down to ``target_files``
    parquet files (default ONE), collapsing bit-identical replay
    residue, without changing what any read computes.

    The ``ivf_compact`` maintenance contract, applied generically:

    * validate-then-swap: the rewrite lands in a sibling
      ``{path}_compacting`` directory and must hold exactly the
      source's distinct row count AND the full ``batch_id`` set
      before the two-rename swap replaces the live directory — a torn
      rewrite aborts with the store untouched;
    * ``_``-prefixed side relations (e.g. the binary-score store's
      ``_meta`` manifest) ride along: parquet reads never see them,
      and the swap carries them from the old directory into the new;
    * an aborted run's temp directory never blocks the retry (deleted
      and rewritten); a crash mid-swap leaves ``{path}_pre`` on disk
      — never data loss; the next run REFUSES until an operator
      renames it back or removes it (unlike the temp dir, ``_pre``
      may be the only copy of the data);
    * run offline (no concurrent appends), the standard maintenance
      contract; file counts come from the Hadoop ``FileSystem`` glob
      (portable beyond local disk).

    Returns ``{rows, rows_collapsed, batches, files_before,
    files_after}``.

    100 TB shape: cell stores are O(batches × bounded cells) — tiny
    relative to the corpora they summarize — so two scans plus one
    ``coalesce(target_files)`` write is the whole cost; reads
    afterwards open ``target_files`` files instead of one per batch.
    """
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path
    fs = hpath(path).getFileSystem(spark._jsc.hadoopConfiguration())

    def _files(p: str) -> int:
        stats = fs.globStatus(hpath(f"{p}/*.parquet"))
        return 0 if stats is None else len(stats)

    if int(target_files) < 1:
        raise ValueError(
            f"compact_cell_store: target_files must be >= 1, got "
            f"{target_files}"
        )
    pre = f"{path}_pre"
    if fs.exists(hpath(pre)):
        raise RuntimeError(
            f"compact_cell_store: {pre} exists — a previous run crashed "
            "mid-swap and it may be the only copy of the store; rename "
            "it back over the store (or remove it after verifying the "
            "store reads) before compacting"
        )
    src = spark.read.parquet(path)
    if "batch_id" not in src.columns:
        raise ValueError(
            f"compact_cell_store: {path} has no batch_id column — not a "
            "batch-appended cell store (this compactor only collapses "
            "bit-identical replay rows, which only batch-addressed "
            "stores guarantee)"
        )
    files_before = _files(path)
    n_src = src.count()
    # bit-identical replay residue ONLY: full-row distinct
    kept = src.dropDuplicates()
    n_kept = kept.count()
    batches = {
        r["batch_id"] for r in src.select("batch_id").distinct().collect()
    }
    tmp = f"{path}_compacting"
    if fs.exists(hpath(tmp)):
        fs.delete(hpath(tmp), True)
    kept.coalesce(int(target_files)).write.mode("error").parquet(tmp)
    written = spark.read.parquet(tmp)
    got = written.count()
    got_batches = {
        r["batch_id"]
        for r in written.select("batch_id").distinct().collect()
    }
    if got != n_kept or got_batches != batches:
        raise RuntimeError(
            f"compact_cell_store: rewrite holds {got} rows over "
            f"{len(got_batches)} batches but the source scan kept "
            f"{n_kept} over {len(batches)} at {path} — aborting with "
            f"the live store untouched; inspect {tmp}"
        )
    if not fs.rename(hpath(path), hpath(pre)):
        raise RuntimeError(f"compact_cell_store: could not stage {path}")
    if not fs.rename(hpath(tmp), hpath(path)):
        fs.rename(hpath(pre), hpath(path))
        raise RuntimeError(f"compact_cell_store: could not swap in {tmp}")
    # carry _-prefixed side relations (manifests) into the new layout;
    # same-named artifacts the write already produced (_SUCCESS) stay
    for st in fs.listStatus(hpath(pre)):
        name = st.getPath().getName()
        if name.startswith("_") and not fs.exists(
            hpath(f"{path}/{name}")
        ):
            fs.rename(st.getPath(), hpath(f"{path}/{name}"))
    fs.delete(hpath(pre), True)
    return {
        "rows": int(got),
        "rows_collapsed": int(n_src - n_kept),
        "batches": len(batches),
        "files_before": files_before,
        "files_after": _files(path),
    }
