"""Product-quantization (PQ) compressed similarity search.

The memory step beyond int8 scalar quantization
(``similarity.quantize_embeddings``): PQ (Jégou, Douze, Schmid,
"Product Quantization for Nearest Neighbor Search", TPAMI 2011) splits
the vector into ``m`` subspaces, k-means-codes each subspace with its
own ``pq_k``-entry codebook, and stores ``m`` small codes per vector —
dim 64 doubles (512 B) become 4 codes (4 B at pq_k<=256) plus one norm.
Search uses asymmetric distance computation (ADC): the query stays
full-precision and each candidate's dot product is a sum of ``m``
codebook lookups.

Spark shape (the same discipline as the IVF family in
``similarity.py``): codebooks are trained by per-subspace Lloyd loops
whose update step is the scaled-BIGINT exact mean (bit-reproducible in
a DuckDB oracle), encode is one Arrow-batched GEMM crossing for ALL
subspaces, and search is the IVF cell equi-join with the ADC expression
evaluated JVM-side against literal codebooks — never a cross product,
never a per-row Python call.

At 100 TB: the coarse quantizer prunes candidates (IVF), PQ prunes
bytes — the candidate join ships ``m`` bytes of codes + one norm per
row instead of the vector, and the corpus-side vectors are only ever
read once (encode).  Codebooks are m x pq_k x (dim/m) doubles — KBs —
broadcast as literals.
"""

from __future__ import annotations

from collections.abc import Sequence

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .similarity import (
    _assign_gemm,
    _assign_topn_gemm,
    as_double,
    dot_expr,
    kmeans_centroid_pairs,
    planes_lit,
)

#: Same inline bound as the coarse quantizer: a codebook bigger than
#: this should be a bucketed join, not a literal.
MAX_INLINE_CODES = 256


def _assign_l2_gemm(
    df: DataFrame,
    cent_pairs: Sequence[tuple],
    id_col: str,
    vec_col: str,
    round_digits: int,
) -> DataFrame:
    """Nearest-centroid assignment under SQUARED L2 (the PQ metric —
    codebooks minimize reconstruction error, not angle): one GEMM per
    Arrow batch, ``argmin`` of the rounded distances, first-min
    tiebreak (np.argmin first occurrence == the oracle's
    ``ORDER BY d2 ASC, code ASC``).

    Oracle-exactness: d2 is evaluated as ``(x·x) - 2·(x·c) + (c·c)``
    and rounded to ``round_digits`` before the argmin — the identical
    spelling the DuckDB replay uses, so a flip would need two true
    distances within an ulp of the same rounding boundary (the
    ``_assign_gemm`` argument, measured hash-green since r4).
    """
    if len(cent_pairs) > MAX_INLINE_CODES:
        raise ValueError(
            f"pq assignment: {len(cent_pairs)} codes exceeds the "
            f"{MAX_INLINE_CODES} inline cap"
        )
    codes = np.array([int(c) for c, _ in cent_pairs], dtype=np.int64)
    c_mat = np.array([vec for _, vec in cent_pairs], dtype=np.float64)
    c_sq = np.einsum("ij,ij->i", c_mat, c_mat)

    src = df.select(F.col(id_col), as_double(vec_col).alias("_v"))
    id_field = src.schema[id_col]
    out_schema = (
        f"`{id_col}` {id_field.dataType.simpleString()}, "
        "_v array<double>, code bigint"
    )

    def assign(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            v = np.stack(pdf["_v"].to_numpy()).astype(np.float64)
            x_sq = np.einsum("ij,ij->i", v, v)
            d2 = np.round(
                x_sq[:, None] - 2.0 * (v @ c_mat.T) + c_sq[None, :], round_digits
            )
            out = pdf[[id_col, "_v"]].copy()
            out["code"] = codes[np.argmin(d2, axis=1)]
            yield out

    return src.mapInPandas(assign, out_schema)


def pq_train_codebook(
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    m: int = 4,
    pq_k: int = 16,
    n_iters: int = 2,
    round_digits: int = 6,
) -> list[list[tuple[int, list[float]]]]:
    """Train ``m`` per-subspace codebooks; returns, per subspace, the
    ``(code, centroid)`` pairs (codes are compact 0..pq_k-1 ranks of the
    deterministic seeds, NOT corpus ids — they must fit a byte).

    Each subspace runs the ``kmeans_centroids`` loop shape under L2:
    seed = first ``pq_k`` sliced vectors by id, then per iteration ONE
    narrow GEMM assignment + ONE map-side-combined aggregation of
    scaled-BIGINT element sums (exact, associative — the DuckDB replay
    is bit-identical).  Driver holds m x pq_k x (dim/m) doubles.  At
    corpus scale, train on a bounded sample — codebook quality
    saturates in thousands of rows (the FAISS guidance) while encode
    (below) still sweeps everything.
    """
    import pandas as pd

    # ONE seed job for all m subspaces (slice driver-side), then ONE
    # corpus pass per Lloyd iteration that assigns EVERY subspace in the
    # same Arrow crossing and feeds one (subspace, code, pos) aggregation
    # — m x fewer corpus scans than the per-subspace loop this replaces
    # (at 100 TB, m fewer crawls per iteration; at bench scale,
    # job-overhead x m fewer round trips).  The seed rows also carry the
    # dimensionality, so there is no separate first() probe job (r17).
    seeds = (
        corpus.select(F.col(id_col), as_double(vec_col).alias("_v"))
        .orderBy(id_col)
        .limit(pq_k)
        .collect()
    )
    if not seeds:
        return [[] for _ in range(m)]
    dim = len(seeds[0]["_v"])
    if dim % m != 0:
        raise ValueError(f"pq: dim {dim} not divisible by m={m} subspaces")
    sub = dim // m
    books: list[list[tuple[int, list[float]]]] = [
        [
            (c, [float(x) for x in r["_v"][j * sub : (j + 1) * sub]])
            for c, r in enumerate(seeds)
        ]
        for j in range(m)
    ]
    src = corpus.select(as_double(vec_col).alias("_v"))
    sum_col = F.expr("CAST(sum(FLOOR(_x * 1e9 + 0.5D)) AS DOUBLE) / 1e9")
    for _ in range(n_iters):
        mats = [np.array([v for _, v in pairs], dtype=np.float64) for pairs in books]
        code_ids = [np.array([c for c, _ in pairs], dtype=np.int64) for pairs in books]
        c_sqs = [np.einsum("ij,ij->i", cm, cm) for cm in mats]

        def assign_all(batches):
            for pdf in batches:
                if not len(pdf):
                    continue
                v = np.stack(pdf["_v"].to_numpy()).astype(np.float64)
                frames = []
                for j in range(m):
                    vj = v[:, j * sub : (j + 1) * sub]
                    xj_sq = np.einsum("ij,ij->i", vj, vj)
                    d2 = np.round(
                        xj_sq[:, None] - 2.0 * (vj @ mats[j].T) + c_sqs[j][None, :],
                        round_digits,
                    )
                    frames.append(
                        pd.DataFrame(
                            {
                                "subspace": j,
                                "code": code_ids[j][np.argmin(d2, axis=1)],
                                "_sv": list(vj),
                            }
                        )
                    )
                yield pd.concat(frames, ignore_index=True)

        assigned = src.mapInPandas(
            assign_all, "subspace int, code bigint, _sv array<double>"
        )
        sums = (
            assigned.select("subspace", "code", F.posexplode("_sv").alias("_pos", "_x"))
            .groupBy("subspace", "code", "_pos")
            .agg(sum_col.alias("_s"), F.count(F.lit(1)).alias("_n"))
        )
        accs: list[dict[int, list[float]]] = [{} for _ in range(m)]
        for r in sums.collect():
            accs[r["subspace"]].setdefault(r["code"], [0.0] * sub)[r["_pos"]] = (
                r["_s"] / r["_n"]
            )
        books = [sorted(acc.items()) for acc in accs]
    # Re-densify: a Lloyd iteration that empties a cluster drops its code,
    # leaving survivors like [0,1,2,4] — but adc_dot_expr's LUT probe is
    # POSITIONAL (element_at(book, code+1)), so sparse codes would read the
    # wrong centroid (or NULL past the end).  Re-rank surviving codes to
    # 0..len-1 in sorted-old-code order; pq_encode then emits the dense
    # codes, so lookup-by-position IS lookup-by-code again.  Assignment
    # winners are unchanged (same centroid set, same tie order: argmin's
    # first-min index == smallest old code == smallest new code), and code
    # VALUES never surface in a result — the DuckDB oracle joins its own
    # codes by value, so parity is unaffected.
    return [
        [(rank, vec) for rank, (_, vec) in enumerate(pairs)] for pairs in books
    ]


def _train_coarse_and_pq(
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    n_centroids: int,
    coarse_iters: int,
    m: int,
    pq_k: int,
    pq_iters: int,
    round_digits: int,
) -> tuple[list[tuple[int, list[float]]], list[list[tuple[int, list[float]]]]]:
    """Train the coarse quantizer AND all ``m`` PQ subspace codebooks in
    ONE seed job plus ONE corpus pass per Lloyd round (when both loops
    run the same iteration count — the registered IVF-PQ shape; unequal
    counts fall back to the two separate trainers unchanged).

    Fusion is job-level only — every branch keeps its exact arithmetic:
    the coarse branch is ``_assign_gemm``'s rounded-cosine argmax and the
    subspace branches are the L2 argmin, emitted from the same Arrow
    crossing and aggregated by (subspace, code, pos) with the scaled-
    BIGINT exact sum (associative, so sharing one hash aggregate with
    the coarse rows at subspace=-1 cannot move any group's result).
    Returns ``(coarse_pairs, books)`` — both driver-side, ready to
    inline; the separate-trainer path returned the identical values
    through 2x the seed jobs and 2x the per-round corpus passes.
    """
    import pandas as pd

    if coarse_iters != pq_iters:
        return (
            kmeans_centroid_pairs(
                corpus, id_col, vec_col, n_centroids, coarse_iters, round_digits
            ),
            pq_train_codebook(
                corpus, id_col, vec_col, m, pq_k, pq_iters, round_digits
            ),
        )
    seeds = (
        corpus.select(F.col(id_col), as_double(vec_col).alias("_v"))
        .orderBy(id_col)
        .limit(max(n_centroids, pq_k))
        .collect()
    )
    if not seeds:
        return [], [[] for _ in range(m)]
    dim = len(seeds[0]["_v"])
    if dim % m != 0:
        raise ValueError(f"pq: dim {dim} not divisible by m={m} subspaces")
    sub = dim // m
    coarse: list[tuple[int, list[float]]] = [
        (r[id_col], [float(x) for x in r["_v"]]) for r in seeds[:n_centroids]
    ]
    books: list[list[tuple[int, list[float]]]] = [
        [
            (c, [float(x) for x in r["_v"][j * sub : (j + 1) * sub]])
            for c, r in enumerate(seeds[:pq_k])
        ]
        for j in range(m)
    ]
    src = corpus.select(as_double(vec_col).alias("_v"))
    sum_col = F.expr("CAST(sum(FLOOR(_x * 1e9 + 0.5D)) AS DOUBLE) / 1e9")
    for _ in range(pq_iters):
        co_ids = np.array([int(cid) for cid, _ in coarse], dtype=np.int64)
        co_mat = np.array([vec for _, vec in coarse], dtype=np.float64)
        co_norm = np.sqrt(np.einsum("ij,ij->i", co_mat, co_mat))
        mats = [np.array([v for _, v in pairs], dtype=np.float64) for pairs in books]
        code_ids = [np.array([c for c, _ in pairs], dtype=np.int64) for pairs in books]
        c_sqs = [np.einsum("ij,ij->i", cm, cm) for cm in mats]

        def assign_all(batches):
            for pdf in batches:
                if not len(pdf):
                    continue
                v = np.stack(pdf["_v"].to_numpy()).astype(np.float64)
                # coarse: rounded-cosine argmax, the _assign_gemm
                # arithmetic verbatim (same float64 ops row-wise, so
                # Arrow batch boundaries cannot move a result)
                nv = np.sqrt(np.einsum("ij,ij->i", v, v))
                scores = np.round(
                    (v @ co_mat.T) / (nv[:, None] * co_norm[None, :]),
                    round_digits,
                )
                frames = [
                    pd.DataFrame(
                        {
                            "subspace": -1,
                            "code": co_ids[np.argmax(scores, axis=1)],
                            "_sv": list(v),
                        }
                    )
                ]
                for j in range(m):
                    vj = v[:, j * sub : (j + 1) * sub]
                    xj_sq = np.einsum("ij,ij->i", vj, vj)
                    d2 = np.round(
                        xj_sq[:, None] - 2.0 * (vj @ mats[j].T) + c_sqs[j][None, :],
                        round_digits,
                    )
                    frames.append(
                        pd.DataFrame(
                            {
                                "subspace": j,
                                "code": code_ids[j][np.argmin(d2, axis=1)],
                                "_sv": list(vj),
                            }
                        )
                    )
                yield pd.concat(frames, ignore_index=True)

        assigned = src.mapInPandas(
            assign_all, "subspace int, code bigint, _sv array<double>"
        )
        sums = (
            assigned.select("subspace", "code", F.posexplode("_sv").alias("_pos", "_x"))
            .groupBy("subspace", "code", "_pos")
            .agg(sum_col.alias("_s"), F.count(F.lit(1)).alias("_n"))
        )
        acc_coarse: dict[int, list[float]] = {}
        accs: list[dict[int, list[float]]] = [{} for _ in range(m)]
        for r in sums.collect():
            if r["subspace"] < 0:
                acc_coarse.setdefault(r["code"], [0.0] * dim)[r["_pos"]] = (
                    r["_s"] / r["_n"]
                )
            else:
                accs[r["subspace"]].setdefault(r["code"], [0.0] * sub)[r["_pos"]] = (
                    r["_s"] / r["_n"]
                )
        coarse = sorted(acc_coarse.items())
        books = [sorted(acc.items()) for acc in accs]
    # same re-densify as pq_train_codebook (see its comment)
    return coarse, [
        [(rank, vec) for rank, (_, vec) in enumerate(pairs)] for pairs in books
    ]


def pq_encode(
    df: DataFrame,
    codebook: list[list[tuple[int, list[float]]]],
    id_col: str,
    vec_col: str,
    round_digits: int = 6,
    keep_cols: Sequence[str] = (),
) -> DataFrame:
    """Encode every vector as ``m`` codes in ONE Arrow crossing (all
    subspace GEMMs per batch): (id, [keep_cols,] _v, codes array<bigint>).

    The original vector is carried through because the registered search
    keeps exact norms; a storage-bound deployment drops ``_v`` after
    computing ``sqrt(dot(v,v))`` once.
    """
    m = len(codebook)
    mats = [np.array([vec for _, vec in pairs], dtype=np.float64) for pairs in codebook]
    code_ids = [np.array([c for c, _ in pairs], dtype=np.int64) for pairs in codebook]
    sub = mats[0].shape[1] if m else 0
    c_sqs = [np.einsum("ij,ij->i", cm, cm) for cm in mats]

    keep = list(keep_cols)
    src = df.select(
        F.col(id_col), *[F.col(c) for c in keep], as_double(vec_col).alias("_v")
    )
    field_sql = ", ".join(
        f"`{c}` {src.schema[c].dataType.simpleString()}" for c in [id_col, *keep]
    )
    out_schema = f"{field_sql}, _v array<double>, codes array<bigint>"

    def enc(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            v = np.stack(pdf["_v"].to_numpy()).astype(np.float64)
            cols = []
            for j in range(m):
                vj = v[:, j * sub : (j + 1) * sub]
                xj_sq = np.einsum("ij,ij->i", vj, vj)
                d2 = np.round(
                    xj_sq[:, None] - 2.0 * (vj @ mats[j].T) + c_sqs[j][None, :],
                    round_digits,
                )
                cols.append(code_ids[j][np.argmin(d2, axis=1)])
            out = pdf[[id_col, *keep, "_v"]].copy()
            out["codes"] = [list(row) for row in np.stack(cols, axis=1)]
            yield out

    return src.mapInPandas(enc, out_schema)


def adc_dot_expr(
    query_vec,  # Column: full-precision query vector
    codes_col,  # Column: array<bigint> PQ codes of the candidate
    codebook: list[list[tuple[int, list[float]]]],
):
    """ADC approximate dot(query, candidate): per subspace, a literal-
    codebook lookup (``element_at`` on a nested array literal — the
    JVM-side form of the classic LUT probe) dotted with the query's
    slice, summed left-to-right (the oracle spells the identical sum).
    """
    m = len(codebook)
    sub = len(codebook[0][0][1])
    total = None
    for j in range(m):
        # codes are compact ranks 0..pq_k-1 == positions in the sorted
        # codebook, so element_at(lit, code+1) IS the lookup.
        cb = planes_lit(np.array([vec for _, vec in codebook[j]], dtype=np.float64))
        cent = F.element_at(cb, (F.element_at(codes_col, j + 1) + 1).cast("int"))
        d = dot_expr(F.slice(query_vec, j * sub + 1, sub), cent)
        total = d if total is None else total + d
    return total


def topk_cosine_ivf_pq(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_centroids: int = 8,
    coarse_iters: int = 2,
    m: int = 4,
    pq_k: int = 16,
    pq_iters: int = 2,
    k: int = 3,
    round_digits: int = 6,
    rerank_depth: int | None = None,
    nprobe: int = 1,
) -> DataFrame:
    """IVF-PQ search: k-means coarse cells prune candidates, PQ codes
    prune bytes, ADC scores the survivors.

    Plan: coarse assign (narrow GEMM, zero corpus shuffle) -> encode
    (one Arrow crossing) -> cell equi-join (never a cross product) ->
    JVM ADC expression with exact norms -> per-query top-k window.
    Returns (query_id, neighbor_id, rank, cos_pq) where ``cos_pq`` is
    the PQ-approximate cosine.

    ``rerank_depth`` enables the production IVF-PQ+R shape (the FAISS
    refinement stage): ADC shortlists the top ``rerank_depth`` per
    query, then the shortlist — and ONLY the shortlist — is re-scored
    with the exact cosine and re-ranked.  The cheap 1-byte-per-subspace
    probe does the pruning; full vectors are touched for
    |queries| x depth rows.  Measured on the worst-case random-vector
    fixture (knob table in SCALE.md): agreement@5 with exact-scored IVF
    goes 0.30 (ADC-only, m=4 x 16) -> 0.71 at depth 20 -> 0.94 at depth
    40; a richer codebook (m=8 x 64) reaches 0.92 at depth 20.  Output
    column is then the exact ``cos_sim``.
    """
    cent_pairs, codebook = _train_coarse_and_pq(
        corpus, id_col, vec_col, n_centroids, coarse_iters, m, pq_k, pq_iters,
        round_digits,
    )
    c_assign = _assign_gemm(corpus, cent_pairs, id_col, vec_col, round_digits)
    c_codes = pq_encode(
        c_assign, codebook, id_col, "_v", round_digits, keep_cols=["centroid_id"]
    )
    # nprobe > 1: the query probes its n nearest cells (the IVF recall
    # knob) — candidates stay an equi-join; a neighbor lives in exactly
    # one cell, so no dedup pass is needed.
    q_assign = (
        _assign_gemm(queries, cent_pairs, id_col, vec_col, round_digits)
        if nprobe == 1
        else _assign_topn_gemm(
            queries, cent_pairs, id_col, vec_col, nprobe, round_digits
        )
    )

    q = q_assign.select(
        F.col(id_col).alias("query_id"), F.col("_v").alias("_qv"), "centroid_id"
    )
    c = c_codes.select(
        F.col(id_col).alias("neighbor_id"),
        F.col("_v").alias("_cv"),
        "codes",
        "centroid_id",
    )
    adc = adc_dot_expr(F.col("_qv"), F.col("codes"), codebook)
    scored = (
        q.join(c, "centroid_id")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            "_qv",
            "_cv",
            F.round(
                adc
                / (
                    F.sqrt(dot_expr(F.col("_qv"), F.col("_qv")))
                    * F.sqrt(dot_expr(F.col("_cv"), F.col("_cv")))
                ),
                round_digits,
            ).alias("cos_pq"),
        )
    )
    w_pq = Window.partitionBy("query_id").orderBy(
        F.col("cos_pq").desc(), F.col("neighbor_id")
    )
    if rerank_depth is None:
        return (
            scored.withColumn("rank", F.row_number().over(w_pq))
            .where(F.col("rank") <= k)
            .select("query_id", "neighbor_id", "rank", "cos_pq")
        )
    shortlist = scored.withColumn("_rn_pq", F.row_number().over(w_pq)).where(
        F.col("_rn_pq") <= rerank_depth
    )
    from .similarity import cosine_expr

    rescored = shortlist.select(
        "query_id",
        "neighbor_id",
        F.round(cosine_expr(F.col("_qv"), F.col("_cv")), round_digits).alias(
            "cos_sim"
        ),
    )
    w_exact = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id")
    )
    return (
        rescored.withColumn("rank", F.row_number().over(w_exact))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cos_sim")
    )
