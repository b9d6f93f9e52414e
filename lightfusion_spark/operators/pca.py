"""Distributed PCA: exact covariance aggregation + top-component power
iteration.

The production shape for principal components over a corpus-scale
embedding table (Spark MLlib's RowMatrix follows it too): ONE distributed
pass reduces N×dim vectors to the dim×dim covariance matrix — thousands
of doubles, independent of N — and the eigen-solve runs driver-side on
that tiny matrix.  Nothing quadratic in N ever exists; the corpus is
touched exactly twice (mean pass + covariance pass) and never shuffles
by more than (pos) / (i, j) keys.

Every floating-point reduction uses the repo's scaled-BIGINT discipline
(``floor(x*1e9 + 0.5)`` per term, associative integer sums), and the
driver-side power iteration applies the identical formula per step — so
the registered query is hash-exact against a DuckDB oracle that replays
the whole chain, unrolled iterations included, despite "iterative
eigensolver" sounding oracle-hopeless.

Reference scope: the reference engine has no linear-algebra surface at
all (`/root/reference/src/lib.rs` — LightGBM inference only); this is a
§2.4 north-star extension like the IVF/PQ family it feeds (component
removal — the "all-but-the-top" embedding cleanup — and PCA-whitened
quantization both start from exactly this operator).
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .similarity import as_double

#: Shared scaling for exact associative float sums.
_S = 1e9


def _round6(x: float) -> float:
    """ROUND half-away-from-zero at 6 decimals — Spark AND DuckDB
    ``ROUND``-on-DOUBLE semantics (python's builtin ``round`` is
    banker's and diverges).  Measured both ways: the
    ``test_round6_matches_duckdb_round`` property pins DuckDB at 6
    digits, and the 0-digit probe (``ROUND(2.5)=3, ROUND(-2.5)=-3``,
    where ties ARE float-representable) confirms half-away there too —
    an older ``similarity.quantize_embeddings`` comment claiming DuckDB
    banker's was wrong and has been reconciled to this one."""
    return math.copysign(math.floor(abs(x) * 1e6 + 0.5), x) / 1e6


def column_means(df: DataFrame, vec_col: str) -> tuple[list[float], int]:
    """Per-dimension means as ``(int_sum/1e9)/n`` — one posexplode +
    map-side-combinable groupBy(pos), JVM-only.

    Geometry guard (mirrors the bloom/cms validation): every position's
    row count must equal every other's AND the input row count — ragged
    vectors or NULL embedding rows would otherwise feed an
    arbitrary-position count into every mean (the ``collect()`` is
    unordered) and silently skew the whole covariance chain downstream.

    ONE corpus pass: ``posexplode_outer`` emits a ``pos = NULL`` row
    for each NULL/empty vector, so the NULL group carries the row count
    the guard needs and the separate ``count()`` job the pre-r18
    implementation ran is gone (guide §1.2 job count — this is one of
    two eager jobs every covariance/PCA construction paid).
    """
    src = df.select(as_double(vec_col).alias("_v"))
    rows = (
        src.select(F.posexplode_outer("_v").alias("pos", "x"))
        .groupBy("pos")
        .agg(
            F.sum(F.expr(f"CAST(FLOOR(x * {_S} + 0.5D) AS BIGINT)")).alias("s"),
            F.count(F.lit(1)).alias("n"),
            F.count("x").alias("nx"),  # non-NULL elements: catches NULLs INSIDE a vector
        )
        .collect()
    )
    if not rows:
        return [], 0
    null_rows = 0
    sums = []
    for r in rows:
        if r["pos"] is None:
            null_rows = r["n"]  # rows whose vector is NULL or empty
        else:
            sums.append(r)
    if not sums:
        raise ValueError(
            f"pca: all {null_rows} rows have NULL/empty {vec_col!r} vectors"
        )
    # every non-empty vector contributes a pos-0 row, so the input row
    # count is the pos-0 group plus the NULL/empty group
    n_rows = next(
        (r["n"] for r in sums if r["pos"] == 0), 0
    ) + null_rows
    counts = {r["n"] for r in sums} | {r["nx"] for r in sums}
    positions = {r["pos"] for r in sums}
    if counts != {n_rows} or positions != set(range(len(sums))):
        raise ValueError(
            "pca: ragged or NULL vectors in "
            f"{vec_col!r} — per-position (rows, non-NULL) counts "
            f"{sorted(counts)} over positions {sorted(positions)} vs "
            f"{n_rows} input rows; every row must carry the "
            "same-dimension vector with no NULL elements. Filter or "
            "impute upstream."
        )
    n = n_rows
    mu = [0.0] * len(sums)
    for r in sums:
        mu[r["pos"]] = (r["s"] / _S) / n
    return mu, n


def covariance_matrix(df: DataFrame, vec_col: str) -> tuple[np.ndarray, list[float], int]:
    """The dim×dim covariance ``C = Σ (x-μ)(x-μ)ᵀ / n`` via one Arrow
    crossing emitting per-batch PARTIAL integer sums per (i, j) — each
    batch contributes dim² rows however many vectors it holds, so the
    only shuffle carries dim² keys, never the corpus.  Exact: the floor
    is applied per (row, i, j) term before any summation.

    Operating bound (the price of exactness): each (i, j) cell sums N
    int64 terms of magnitude ≈ ``|x_i-μ_i|·|x_j-μ_j|·1e9``, so the
    arithmetic requires ``N · max|x-μ|² · 1e9 < 2^63`` ≈ 9.2e18 —
    unit-normalized embeddings (|x-μ| ≤ 2) hold to N ≈ 2.3e9 rows;
    beyond that, or with unnormalized features, pre-scale the vectors
    or swap the BIGINT sum for DECIMAL(38,0) (exact to 1e38, ~4 bytes
    wider per partial).  Under non-ANSI Spark arithmetic an overflow
    would WRAP silently, which is why the bound is stated here rather
    than discovered in production (ADVICE r8)."""
    mu_list, n = column_means(df, vec_col)
    if n == 0:
        return np.zeros((0, 0)), [], 0
    dim = len(mu_list)
    mu = np.array(mu_list, dtype=np.float64)

    def partials(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            v = np.stack(pdf["_v"].to_numpy()).astype(np.float64) - mu[None, :]
            terms = v[:, :, None] * v[:, None, :]  # (rows, i, j)
            ints = np.floor(terms * _S + 0.5).astype(np.int64).sum(axis=0)
            ii, jj = np.meshgrid(np.arange(dim), np.arange(dim), indexing="ij")
            yield pd.DataFrame(
                {"i": ii.ravel(), "j": jj.ravel(), "s": ints.ravel()}
            )

    rows = (
        df.select(as_double(vec_col).alias("_v"))
        .mapInPandas(partials, "i int, j int, s long")
        .groupBy("i", "j")
        .agg(F.sum("s").alias("s"))
        .collect()
    )
    c = np.zeros((dim, dim), dtype=np.float64)
    for r in rows:
        c[r["i"], r["j"]] = (r["s"] / _S) / n
    return c, mu_list, n


def pca_top_component(
    df: DataFrame,
    vec_col: str,
    n_iters: int = 4,
) -> DataFrame:
    """Top principal component by power iteration on the distributed
    covariance matrix.

    The iteration runs driver-side on the dim×dim matrix (the correct
    altitude: after the covariance reduction the problem is kilobytes)
    but applies engine-replayable arithmetic at every step —
    ``w_i = (Σ_j floor(C_ij · v_j · 1e9 + 0.5)) / 1e9``, norms through
    the same scaling, components re-rounded to 6 decimals per iteration
    — so the DuckDB oracle unrolls the identical ``n_iters`` steps and
    hash-matches bit for bit.  ``v₀ = 1/√dim`` per entry (exact 0.125
    at dim=64).

    Returns ``(pos, loading, eigenvalue)`` — 64 rows; ``eigenvalue`` is
    the final pre-normalization ‖w‖ (the Rayleigh estimate power
    iteration converges to), rounded 6, constant across rows.
    """
    v, lam, _mu, n = top_component_values(df, vec_col, n_iters)
    spark = df.sparkSession
    if n == 0:
        return spark.createDataFrame([], "pos int, loading double, eigenvalue double")
    return spark.createDataFrame(
        [(i, v[i], lam) for i in range(len(v))],
        "pos int, loading double, eigenvalue double",
    )


def top_component_values(
    df: DataFrame, vec_col: str, n_iters: int = 4
) -> tuple[list[float], float, list[float], int]:
    """The power-iteration core: ``(component, eigenvalue, mean, n)`` as
    plain python values — for composing consumers (:func:`remove_component`)
    without a second covariance pass."""
    c, mu, n = covariance_matrix(df, vec_col)
    if n == 0:
        return [], 0.0, [], 0
    dim = c.shape[0]
    v = [_round6(1.0 / math.sqrt(dim))] * dim
    norm = 0.0
    for _ in range(n_iters):
        w = [
            sum(int(math.floor(c[i, j] * v[j] * _S + 0.5)) for j in range(dim)) / _S
            for i in range(dim)
        ]
        norm = math.sqrt(
            sum(int(math.floor(wi * wi * _S + 0.5)) for wi in w) / _S
        )
        if norm == 0.0:  # degenerate (zero covariance): keep v as-is
            break
        v = [_round6(wi / norm) for wi in w]
    return v, _round6(norm), mu, n


def remove_component(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    component: list[float],
    mean: list[float] | None = None,
) -> DataFrame:
    """All-but-the-top embedding post-processing (Mu & Viswanath, ICLR
    2018): center on ``mean`` (when given) and remove the projection on
    ``component`` — ``x' = xc - (xc·v)·v``.  Embedding tables cluster
    tightly around a dominant direction that carries frequency, not
    meaning; stripping it measurably sharpens cosine similarity, which
    is why this is the standard cleanup between ``pca_top_component``
    and the ANN/semantic-dedup family.

    One Arrow crossing, zero shuffles; the projection coefficient is the
    scaled-BIGINT per-term sum (partition-order-proof), the element
    update plain IEEE arithmetic — the DuckDB oracle composes the same
    chain off the unrolled PCA CTEs.
    """
    v = np.array(component, dtype=np.float64)
    mu = (
        np.array(mean, dtype=np.float64)
        if mean is not None
        else np.zeros_like(v)
    )

    def strip(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            x = np.stack(pdf["_v"].to_numpy()).astype(np.float64) - mu[None, :]
            dots = (
                np.floor(x * v[None, :] * _S + 0.5).astype(np.int64).sum(axis=1)
                / _S
            )
            out = pdf[[id_col]].copy()
            out["embedding"] = [list(row) for row in x - dots[:, None] * v[None, :]]
            yield out

    src = df.select(F.col(id_col), as_double(vec_col).alias("_v"))
    id_t = src.schema[id_col].dataType.simpleString()
    return src.mapInPandas(strip, f"`{id_col}` {id_t}, embedding array<double>")
