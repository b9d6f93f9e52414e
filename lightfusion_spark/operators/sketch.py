"""Count-min sketch: bounded-memory frequency estimation over unbounded
key streams (Cormode & Muthukrishnan 2005).

The 100 TB problem it solves: exact token/URL/key frequency tables grow
with the *vocabulary* (billions of rows for web-scale token streams),
but a CMS is a fixed ``d × w`` grid of counters — kilobytes — with a
one-sided guarantee: ``estimate >= true`` always, and
``estimate <= true + εN`` w.h.p. for ``w = ⌈e/ε⌉``.  The build is ONE
map-side-combinable groupBy whose key space is capped at ``d·w`` cells
regardless of stream size, so two sketches merge by cell-wise addition
(partial aggregation IS the merge — the property that makes it a
streaming/distributed-native summary).

Deterministic by construction: the ``d`` probe positions are sliced
from a single md5 digest (six hex digits each — 24 bits ≫ log2(w)), no
RNG — so the DuckDB oracle rebuilds the identical sketch and the
registered face is hash-exact, overestimates included.

Reference scope: the reference has no sketch surface; §2.4 extension
alongside the HLL/percentile approximates of `rel_approx_sketch`.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _probe_positions(col: Column, w: int, d: int, seed: int) -> list[Column]:
    """``d`` positions in ``[0, w)`` from ONE md5 digest of ``seed:value``
    (the bloom-filter slicing pattern — five 24-bit slices fit the
    32-hex digest)."""
    if d < 1 or d > 5:
        raise ValueError(f"cms: d must be 1..5, got {d}")
    if w < 2:
        raise ValueError(f"cms: w must be >= 2, got {w}")
    digest = F.md5(F.concat_ws(":", F.lit(str(seed)), col.cast("string")))
    return [
        F.conv(F.substring(digest, p * 6 + 1, 6), 16, 10).cast("bigint") % w
        for p in range(d)
    ]


def cms_build(
    df: DataFrame,
    key_col: str,
    w: int = 1024,
    d: int = 3,
    seed: int = 47,
) -> DataFrame:
    """Build the sketch: ``(row, col, cnt)`` — at most ``d·w`` rows.

    Each input key increments one cell per hash row; the groupBy key
    space is the CELL grid, not the key space, so the shuffle is bounded
    by the sketch geometry however large (or skewed) the stream is.
    """
    probes = _probe_positions(F.col(key_col), w, d, seed)
    cells = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(p).alias("row"), pos.alias("col"))
                    for p, pos in enumerate(probes)
                ]
            )
        ).alias("c")
    )
    return cells.groupBy(
        F.col("c.row").alias("row"), F.col("c.col").alias("col")
    ).agg(F.count(F.lit(1)).alias("cnt"))


def cms_estimate(
    sketch: DataFrame,
    probe: DataFrame,
    key_col: str,
    w: int = 1024,
    d: int = 3,
    seed: int = 47,
) -> DataFrame:
    """Point-query the sketch for every key in ``probe``: the estimate is
    the MIN over the ``d`` cells the key hashes to (an absent cell reads
    0 — the key was never seen).  Returns ``(key_col, cms_count)``.

    The sketch side is ≤ ``d·w`` rows and broadcasts; estimating any
    number of probe keys is a map-side join + one groupBy(key) min.
    """
    probes = _probe_positions(F.col(key_col), w, d, seed)
    pk = probe.select(
        F.col(key_col),
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(p).alias("row"), pos.alias("col"))
                    for p, pos in enumerate(probes)
                ]
            )
        ).alias("c"),
    ).select(key_col, F.col("c.row").alias("row"), F.col("c.col").alias("col"))
    joined = pk.join(F.broadcast(sketch), ["row", "col"], "left")
    return (
        joined.groupBy(key_col)
        .agg(F.min(F.coalesce("cnt", F.lit(0))).alias("cms_count"))
    )


def hll_sketches(
    df: DataFrame, stratum_col: str, key_col: str, lg_k: int = 12
) -> DataFrame:
    """Per-stratum mergeable HLL sketches: ``(stratum, hll_sketch)``.

    The 100 TB distinct-count pattern: each stratum (a source, a day, a
    shard) keeps a KB-sized Datasketches HLL binary instead of its key
    set, and ANY later slice's cardinality is a sketch union
    (:func:`hll_estimate`) — never a re-scan of the data.  Relative
    error is ~1.04/sqrt(2^lg_k) (±1.6% at the default lg_k=12), and
    union does not degrade the bound.  One map-side-combinable groupBy;
    the sketch column persists to parquet like any binary column, so a
    daily pipeline appends one sketch row per stratum per run.

    Spark-4 surface (`hll_sketch_agg`, Apache DataSketches HLL);
    engine-specific binaries, so faces verify the ESTIMATE against the
    exact count within the error bound (the `rel_approx_sketch`
    boolean-verification pattern) rather than hashing sketch bytes.
    """
    return df.groupBy(stratum_col).agg(
        F.expr(f"hll_sketch_agg({key_col}, {int(lg_k)})").alias("hll_sketch")
    )


def hll_estimate(
    sketches: DataFrame,
    group_cols: list[str] | None = None,
    sketch_col: str = "hll_sketch",
) -> DataFrame:
    """Union-merge HLL sketches and estimate: one row per group (or ONE
    global row with ``group_cols=None``) with ``n_distinct_est``.  The
    merge is the whole point: the global estimate comes from the
    per-stratum sketches alone — the raw data is never re-read.
    """
    est = F.expr(f"hll_sketch_estimate(hll_union_agg({sketch_col}))").alias(
        "n_distinct_est"
    )
    if group_cols:
        return sketches.groupBy(*group_cols).agg(est)
    return sketches.agg(est)
