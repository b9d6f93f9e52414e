"""Similarity search over embedding columns (SURVEY §2.4).

The reference has no vector-search surface; these are engine extensions
for training-data pipelines: exact brute-force top-k as the correctness
baseline, and an LSH(random-hyperplane)-bucketed variant as the scale
path.  Everything stays in JVM whole-stage codegen — the dot products
are ``zip_with``/``aggregate`` higher-order functions, not Python UDFs.

100 TB design notes
-------------------
* **Brute force** — correct but O(|Q|·|C|·d); usable when the query set
  broadcasts (<< executor memory) and the corpus streams once.  The plan
  below is exactly that shape: broadcast(queries) x corpus scan ->
  per-partition partial top-k (window) -> final top-k.  No shuffle of
  the corpus itself.
* **LSH** — sign-of-projection onto ``n_planes`` fixed hyperplanes
  bucketizes both sides; candidates only within the query's bucket.
  Expected candidate volume drops ~2^planes; recall is tunable via
  multi-probe (flip lowest-margin bits) or repeated tables.  The bucket
  id is a plain integer column, so the candidate join is an ordinary
  hash-partitioned equi-join — broadcast-free and skew-aware under AQE.
* An IVF variant (k-means centroids as the coarse quantizer) has the
  same plan shape: assign -> equi-join on centroid id -> local top-k.
"""

from __future__ import annotations

from collections.abc import Sequence

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def as_double(vec_col: str | Column) -> Column:
    c = F.col(vec_col) if isinstance(vec_col, str) else vec_col
    return c.cast("array<double>")


def dot_expr(a: Column, b: Column) -> Column:
    """Sequential left-fold dot product (matches DuckDB list_inner_product)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )


def cosine_expr(a: Column, b: Column) -> Column:
    return dot_expr(a, b) / (F.sqrt(dot_expr(a, a)) * F.sqrt(dot_expr(b, b)))


def topk_cosine(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    round_digits: int = 6,
    max_query_rows: int = 10_000,
) -> DataFrame:
    """Exact top-k cosine neighbors of each query against the corpus —
    the ORACLE BASELINE, not the scale path.

    Output: (query_id, neighbor_id, rank, cos_sim).  Ordering is by the
    *rounded* similarity with the neighbor id as tiebreak, which makes
    ranks reproducible across engines and partitionings.

    The plan is a broadcast nested-loop join scoring every (query,
    corpus) pair with an interpreted higher-order-function dot product —
    exactly the SQL an oracle can mirror, and a scale-killer beyond a
    bounded query set (|Q|x|C| pairs).  ``max_query_rows`` enforces that
    bound up front; production callers with larger query sets belong on
    ``topk_cosine_gemm`` (same exact results, one NumPy matmul per Arrow
    batch) or the LSH/IVF variants (both sides stay distributed).
    """
    n_q = queries.limit(max_query_rows + 1).count()
    if n_q > max_query_rows:
        raise ValueError(
            f"topk_cosine is the oracle-baseline BNLJ: it scores every "
            f"(query x corpus) pair and got more than "
            f"max_query_rows={max_query_rows} query rows. Use "
            "topk_cosine_gemm (exact) or topk_cosine_lsh/ivf (approximate) "
            "for large query sets, or raise max_query_rows explicitly."
        )
    # norms are computed once per side, not once per pair (same arithmetic
    # as cosine_expr — dot / (|q| * |c|) — so values are bit-identical)
    q = queries.select(
        F.col(id_col).alias("query_id"),
        as_double(vec_col).alias("_qv"),
    ).withColumn("_qn", F.sqrt(dot_expr(F.col("_qv"), F.col("_qv"))))
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        as_double(vec_col).alias("_cv"),
    ).withColumn("_cn", F.sqrt(dot_expr(F.col("_cv"), F.col("_cv"))))
    scored = (
        F.broadcast(q)
        .crossJoin(c)
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                dot_expr(F.col("_qv"), F.col("_cv")) / (F.col("_qn") * F.col("_cn")),
                round_digits,
            ).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cos_sim")
    )


def random_hyperplanes(n_planes: int, dim: int, seed: int = 7) -> np.ndarray:
    """Deterministic hyperplanes for sign-LSH (seeded; reproducible in SQL)."""
    return np.random.RandomState(seed).standard_normal((n_planes, dim)).round(6)


def planes_lit(planes: np.ndarray) -> Column:
    """The hyperplane matrix as ONE literal expression.

    ``F.lit`` accepts nested lists (Spark 4): one py4j call carrying the
    whole matrix as a Java literal, exact to the double bit.  (The
    previous spelling — an ``array(array(CAST('…' AS DOUBLE), …)))`` SQL
    string — made the parser allocate per element and blew driver heap
    beyond ~2k elements, which capped multi-table LSH plane counts.)
    """
    return F.lit([[float(x) for x in plane] for plane in planes])


def lsh_bucket_expr(vec_col: str | Column, planes: np.ndarray) -> Column:
    """Sign-of-projection bucket id: bit p set iff dot(v, plane_p) > 0."""
    v = as_double(vec_col)
    bits = F.array(*[F.lit(1 << p) for p in range(len(planes))])
    dps = F.transform(planes_lit(planes), lambda p: dot_expr(v, p))
    signed = F.zip_with(dps, bits, lambda d, b: F.when(d > 0, b).otherwise(0))
    return F.aggregate(signed, F.lit(0), lambda a, x: a + x)


def topk_cosine_lsh(
    corpus: DataFrame,
    queries: DataFrame,
    planes: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 3,
    round_digits: int = 6,
) -> DataFrame:
    """Approximate top-k: candidates restricted to the query's LSH bucket.

    TEACHING BASELINE — a single b-plane code has AND semantics (a
    neighbor must agree on every bit), so recall decays exponentially
    in b: measured micro-recall@5 of 0.13 (4 planes) / 0.03 (8 planes)
    on the synthetic corpus (docs/SCALE.md).  Production ANN belongs on
    :func:`topk_cosine_lsh_banded` (OR-of-ANDs across tables, measured
    0.676 at the same k) or the IVF family.

    Output: (query_id, neighbor_id, rank, cos_sim) — rank within bucket.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"),
        as_double(vec_col).alias("_qv"),
        lsh_bucket_expr(vec_col, planes).alias("bucket"),
    ).withColumn("_qn", F.sqrt(dot_expr(F.col("_qv"), F.col("_qv"))))
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        as_double(vec_col).alias("_cv"),
        lsh_bucket_expr(vec_col, planes).alias("bucket"),
    ).withColumn("_cn", F.sqrt(dot_expr(F.col("_cv"), F.col("_cv"))))
    scored = (
        q.join(c, "bucket")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                dot_expr(F.col("_qv"), F.col("_cv")) / (F.col("_qn") * F.col("_cn")),
                round_digits,
            ).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cos_sim")
    )


def topk_cosine_lsh_multiprobe(
    corpus: DataFrame,
    queries: DataFrame,
    planes: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 3,
    n_probes: int = 2,
    round_digits: int = 6,
) -> DataFrame:
    """Multi-probe sign-LSH top-k: probe the query's own bucket plus the
    ``n_probes - 1`` buckets reached by flipping its lowest-margin bits.

    A query's nearest neighbors that land in an adjacent bucket almost
    always differ in the plane the query is *closest to* (smallest
    ``|dot(v, plane)|`` margin), so flipping the smallest-margin bits
    recovers most of the recall lost to bucket boundaries at the cost of
    ``n_probes`` equi-joins' worth of candidates — still never a cross
    product, and only the (small) query side is exploded ``n_probes``
    ways; the corpus is bucketed and shuffled once.  Probed buckets are
    distinct by construction, so no candidate dedup is needed.
    """
    if not 1 <= n_probes <= len(planes) + 1:
        raise ValueError(f"n_probes must be in [1, n_planes+1], got {n_probes}")
    # Materialize the per-plane projections once (one dot product per
    # plane); bucket/margin/probe arithmetic on top of them is cheap.
    # A lambda capturing the raw vector would re-fold every dot product
    # per reference (see dedup.doc_shingles for the same trick).
    dps = F.transform(
        planes_lit(planes), lambda p: dot_expr(F.col("_qv"), p)
    )
    q0 = queries.select(
        F.col(id_col).alias("query_id"), as_double(vec_col).alias("_qv")
    ).withColumn("_dps", dps)
    bucket = None
    for p in range(len(planes)):
        bit = F.when(F.element_at("_dps", p + 1) > 0, F.lit(1 << p)).otherwise(0)
        bucket = bit if bucket is None else bucket + bit
    margins = F.array_sort(
        F.array(
            *[
                F.struct(
                    F.abs(F.element_at("_dps", p + 1)).alias("m"),
                    F.lit(p).alias("p"),
                )
                for p in range(len(planes))
            ]
        )
    )
    q1 = q0.select(
        "query_id",
        "_qv",
        F.sqrt(dot_expr(F.col("_qv"), F.col("_qv"))).alias("_qn"),
        bucket.alias("_bucket"),
        F.slice(margins, 1, n_probes - 1).alias("_flips"),
    )
    probes = F.concat(
        F.array(F.col("_bucket")),
        F.transform(
            F.col("_flips"),
            lambda s: F.col("_bucket").bitwiseXOR(
                F.pow(F.lit(2.0), s["p"]).cast("int")
            ),
        ),
    )
    q = q1.select(
        "query_id", "_qv", "_qn", F.explode(probes).alias("bucket")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        as_double(vec_col).alias("_cv"),
        lsh_bucket_expr(vec_col, planes).alias("bucket"),
    ).withColumn("_cn", F.sqrt(dot_expr(F.col("_cv"), F.col("_cv"))))
    scored = (
        q.join(c, "bucket")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                dot_expr(F.col("_qv"), F.col("_cv")) / (F.col("_qn") * F.col("_cn")),
                round_digits,
            ).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cos_sim")
    )


def banded_keys_expr(vec_col: str | Column, planes: np.ndarray, n_tables: int) -> Column:
    """Array of ``n_tables`` band keys for multi-table sign-LSH.

    ``planes`` has ``n_tables * r`` rows; table ``t`` owns the contiguous
    slice ``[t*r, (t+1)*r)`` and hashes a vector to
    ``t * 2^r + sum(sign bits)`` — the table index is folded into the key
    so one equi-join column covers all tables.  All ``n_tables * r`` dot
    products are materialized ONCE into an array column before the
    per-table bit folds reference them (re-folding per reference is the
    higher-order-lambda trap measured in dedup.doc_shingles).
    """
    if len(planes) % n_tables != 0:
        raise ValueError(
            f"planes rows ({len(planes)}) must be divisible by n_tables ({n_tables})"
        )
    r = len(planes) // n_tables
    v = as_double(vec_col)
    dps = F.transform(planes_lit(planes), lambda p: dot_expr(v, p))
    keys = []
    for t in range(n_tables):
        key = F.lit(t * (1 << r))
        for j in range(r):
            key = key + F.when(
                F.element_at(dps, t * r + j + 1) > 0, F.lit(1 << j)
            ).otherwise(0)
        keys.append(key)
    return F.array(*keys)


def _banded_keys_gemm(
    df: DataFrame,
    id_col: str,
    id_alias: str,
    vec_col: str,
    planes: np.ndarray,
    n_tables: int,
) -> DataFrame:
    """GEMM form of :func:`banded_keys_expr`: ONE (batch x dim) @
    (dim x n_planes) multiply per Arrow batch computes every sign bit,
    then the per-table bit folds are two tiny integer matmuls —
    replacing n_tables*r interpreted ``aggregate(zip_with(...))`` folds
    per row (the ~0.9 ms/row higher-order-lambda trap measured for
    ``_assign_inline``).  Sign agreement with the engines' sequential
    dot: a flip needs |dot| within ~1 ulp of 0, which real-valued data
    never hits (the ``_assign_gemm`` rounding-boundary argument, at a
    sign boundary instead).  Emits the exploded (id, _key) relation the
    candidate equi-join consumes.
    """
    import pandas as pd

    if len(planes) % n_tables != 0:
        raise ValueError(
            f"planes rows ({len(planes)}) must be divisible by n_tables ({n_tables})"
        )
    r = len(planes) // n_tables
    p_mat = np.asarray(planes, dtype=np.float64)
    pow2 = (1 << np.arange(r, dtype=np.int64))
    table_base = (np.arange(n_tables, dtype=np.int64) * (1 << r))

    src = df.select(F.col(id_col).alias(id_alias), as_double(vec_col).alias("_v"))
    id_sql = src.schema[id_alias].dataType.simpleString()
    out_schema = f"`{id_alias}` {id_sql}, _key bigint"

    def keys(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            v = np.stack(pdf["_v"].to_numpy()).astype(np.float64)
            bits = (v @ p_mat.T) > 0  # (n, n_tables*r)
            folded = (
                bits.reshape(len(v), n_tables, r).astype(np.int64) @ pow2
            ) + table_base[None, :]
            ids = pdf[id_alias].to_numpy()
            yield pd.DataFrame(
                {
                    id_alias: np.repeat(ids, n_tables),
                    "_key": folded.reshape(-1),
                }
            )

    return src.mapInPandas(keys, out_schema)


def _cosine_pairs_gemm(
    pairs: DataFrame, a_col: str, b_col: str, round_digits: int
) -> DataFrame:
    """Row-wise cosine over joined vector pairs in ONE Arrow crossing
    (vectorized einsum across the batch) — the scoring tail for
    candidate-pair relations where each row carries its own two vectors.
    Rounded before ranking, the repo-wide oracle-exactness discipline.
    """
    keep = [c for c in pairs.columns if c not in (a_col, b_col)]
    fields = ", ".join(
        f"`{c}` {pairs.schema[c].dataType.simpleString()}" for c in keep
    )
    out_schema = f"{fields}, cos_sim double"

    def score(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            a = np.stack(pdf[a_col].to_numpy()).astype(np.float64)
            b = np.stack(pdf[b_col].to_numpy()).astype(np.float64)
            dots = np.einsum("ij,ij->i", a, b)
            na = np.sqrt(np.einsum("ij,ij->i", a, a))
            nb = np.sqrt(np.einsum("ij,ij->i", b, b))
            out = pdf[keep].copy()
            out["cos_sim"] = np.round(dots / (na * nb), round_digits)
            yield out

    return pairs.mapInPandas(score, out_schema)


def topk_cosine_lsh_banded(
    corpus: DataFrame,
    queries: DataFrame,
    planes: np.ndarray,
    n_tables: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 3,
    round_digits: int = 6,
) -> DataFrame:
    """Multi-table (banded, OR-of-ANDs) sign-LSH top-k — the construction
    that makes sign-LSH a usable ANN.

    A single-table code of b planes has AND semantics: a neighbor must
    agree on every bit, so recall *decays exponentially* in b (measured
    at 0.13 -> 0.03 for 4 -> 8 planes on this corpus, docs/SCALE.md).
    Banding flips the combinator: ``n_tables`` independent r-plane tables
    each propose same-bucket candidates and the union is searched — P[hit]
    = 1-(1-p^r)^L for per-plane agreement p, the same OR-of-ANDs curve
    :func:`~lightfusion_spark.operators.dedup.minhash_near_duplicates`
    uses for Jaccard banding.

    Plan shape (100 TB): both sides explode to ``n_tables`` (table, key)
    rows and meet in ONE equi-join on the fused band key — never a cross
    product; the corpus shuffle is n_tables x ids+key, not vectors.
    Candidate (query, neighbor) pairs are deduplicated as a narrow
    id-only relation BEFORE vectors are joined back for scoring, so each
    survivor pair is scored exactly once and vector bytes cross the wire
    once per side, not once per table.  Output matches every other
    ``topk_cosine*``: (query_id, neighbor_id, rank, cos_sim).
    """
    qk = _banded_keys_gemm(queries, id_col, "query_id", vec_col, planes, n_tables)
    ck = _banded_keys_gemm(corpus, id_col, "neighbor_id", vec_col, planes, n_tables)
    cand = (
        qk.join(ck, "_key")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id")
        .distinct()
    )
    q = queries.select(
        F.col(id_col).alias("query_id"), as_double(vec_col).alias("_qv")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), as_double(vec_col).alias("_cv")
    )
    # both hot paths ride GEMM crossings (keys above, scoring here): the
    # r6 expression form paid ~0.5 ms/row of interpreted zip_with folds,
    # 14.7 s at sf0.1 — see the A/B in docs/PLANS.md.
    scored = _cosine_pairs_gemm(
        cand.join(q, "query_id").join(c, "neighbor_id"), "_qv", "_cv", round_digits
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cos_sim")
    )


def cosine_pairs_blocked(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    block_col: str,
    threshold: float,
    round_digits: int = 6,
) -> DataFrame:
    """All pairs within a blocking key with cosine >= threshold.

    Embedding near-duplicate detection; the blocking key bounds the pair
    space the way LSH buckets would at scale.  Output (id_a, id_b, cos_sim).
    """
    a = df.select(
        F.col(id_col).alias("id_a"), F.col(block_col).alias("_blk"), as_double(vec_col).alias("_va")
    ).withColumn("_na", F.sqrt(dot_expr(F.col("_va"), F.col("_va"))))
    b = df.select(
        F.col(id_col).alias("id_b"), F.col(block_col).alias("_blk"), as_double(vec_col).alias("_vb")
    ).withColumn("_nb", F.sqrt(dot_expr(F.col("_vb"), F.col("_vb"))))
    return (
        a.join(b, "_blk")
        .where(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            F.round(
                dot_expr(F.col("_va"), F.col("_vb")) / (F.col("_na") * F.col("_nb")),
                round_digits,
            ).alias("cos_sim"),
        )
        .where(F.col("cos_sim") >= threshold)
    )


MAX_INLINE_CENTROIDS = 65_536


def assign_to_centroids(
    df,
    centroids: DataFrame,
    id_col: str,
    vec_col: str,
    round_digits: int = 6,
    use_gemm: bool = True,
) -> DataFrame:
    """Nearest-centroid (max cosine) assignment: (id, vec, centroid_id).

    ``centroids`` is (centroid_id, _cent).  A coarse quantizer is tiny by
    construction (n_centroids ~ sqrt(corpus) at most), so we collect it
    to the driver and assignment stays a *narrow* projection with ZERO
    shuffle of the corpus (the previous shape, crossJoin + window argmin,
    shuffled (corpus x centroids) rows by id).  Tie-break is first-max in
    centroid_id order, identical to the old (score DESC, centroid_id ASC)
    window ordering.

    ``use_gemm`` (default) scores all centroids with ONE NumPy matmul
    per Arrow batch (``_assign_gemm``); the interpreted ``zip_with``
    fold (``_assign_inline``) costs ~0.9 ms/row at 64 centroids x dim 64
    — 170 s for 200k rows, measured in tools/scalecheck.py — vs ~2 s
    for the GEMM path, same rounded scores.
    """
    pairs = _collect_cent_pairs(centroids)
    if use_gemm:
        return _assign_gemm(df, pairs, id_col, vec_col, round_digits)
    return _assign_inline(df, pairs, id_col, vec_col, round_digits)


def _collect_cent_pairs(centroids: DataFrame) -> list[tuple]:
    """Collect a (centroid_id, _cent) relation to the driver-side pair
    list every inline assignment consumes — ONE job per codebook; search
    paths that assign both join sides share the result instead of
    collecting twice."""
    rows = centroids.select("centroid_id", "_cent").orderBy("centroid_id").collect()
    return [(r["centroid_id"], [float(x) for x in r["_cent"]]) for r in rows]


def _assign_gemm(
    df,
    cent_pairs: Sequence[tuple],
    id_col: str,
    vec_col: str,
    round_digits: int,
) -> DataFrame:
    """GEMM nearest-centroid assignment: one (batch x dim) @ (dim x k)
    multiply per Arrow batch, ``argmax`` row-wise (NumPy argmax takes the
    first maximum, matching ``_assign_inline``'s array_position pick and
    the oracle's sequential scan).

    Oracle-exactness: scores are rounded to ``round_digits`` before the
    argmax.  NumPy's pairwise-summed dot differs from the engines'
    sequential fold by ~1 ulp; a flip would need the true cosine within
    ~1e-15 of a 0.5e-6 rounding boundary, which real-valued data never
    hits — the same argument (and the same measured hash-match) as the
    verified ``topk_cosine_gemm``.
    """
    if len(cent_pairs) > MAX_INLINE_CENTROIDS:
        raise ValueError(
            f"assign_to_centroids: {len(cent_pairs)} centroids exceeds the "
            f"{MAX_INLINE_CENTROIDS} inline cap — a coarse quantizer this "
            "large should be a bucketed equi-join, not an inline scan"
        )
    import pandas as pd

    c_ids = np.array([int(cid) for cid, _ in cent_pairs], dtype=np.int64)
    c_mat = np.array([vec for _, vec in cent_pairs], dtype=np.float64)
    c_norm = np.sqrt(np.einsum("ij,ij->i", c_mat, c_mat))

    src = df.select(F.col(id_col), as_double(vec_col).alias("_v"))
    id_field = src.schema[id_col]
    out_schema = (
        f"`{id_col}` {id_field.dataType.simpleString()}, "
        "_v array<double>, centroid_id bigint"
    )

    def assign(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            v = np.stack(pdf["_v"].to_numpy()).astype(np.float64)
            nv = np.sqrt(np.einsum("ij,ij->i", v, v))
            scores = np.round(
                (v @ c_mat.T) / (nv[:, None] * c_norm[None, :]), round_digits
            )
            pdf = pdf[[id_col, "_v"]].copy()
            pdf["centroid_id"] = c_ids[np.argmax(scores, axis=1)]
            yield pdf

    return src.mapInPandas(assign, out_schema)


def _assign_inline(
    df,
    cent_pairs: Sequence[tuple],
    id_col: str,
    vec_col: str,
    round_digits: int,
) -> DataFrame:
    """Assignment against driver-held (centroid_id, vector) pairs —
    the literal-inline narrow projection described above."""
    if len(cent_pairs) > MAX_INLINE_CENTROIDS:
        raise ValueError(
            f"assign_to_centroids: {len(cent_pairs)} centroids exceeds the "
            f"{MAX_INLINE_CENTROIDS} inline cap — a coarse quantizer this "
            "large should be a bucketed equi-join, not an inline scan"
        )
    import math

    # Centroid norms are driver-side constants, and sqrt(dot(v,v)) is
    # row-constant: compute each once, not once per (row, centroid).
    # Python's left-to-right `sum` matches the engines' sequential
    # inner-product folds bit-for-bit, so ROUND(.., 6) stays oracle-exact.
    #
    # The whole scoring expression is built as ONE SQL string parsed by a
    # single F.expr: building it per-centroid from F.lit objects costs a
    # py4j round trip per literal (n_centroids x dim of them), which at
    # 8x64 already dominated wall-clock over the actual job.  CAST of the
    # repr string round-trips every double exactly, and the zip_with fold
    # is the same sequential left fold dot_expr emits, so scores are
    # bit-identical to the unrolled form.
    def dlit(x: float) -> str:
        return f"CAST('{x!r}' AS DOUBLE)"

    cents_sql = ",".join(
        "array(" + ",".join(dlit(x) for x in vec) + ")" for _, vec in cent_pairs
    )
    norms_sql = ",".join(
        dlit(math.sqrt(sum(x * x for x in vec))) for _, vec in cent_pairs
    )
    ids_sql = ",".join(f"CAST({int(cid)} AS BIGINT)" for cid, _ in cent_pairs)
    scores_sql = (
        f"zip_with(array({cents_sql}), array({norms_sql}), (c, nc) -> "
        f"round(aggregate(zip_with(_v, c, (x, y) -> x * y), CAST(0.0 AS DOUBLE),"
        f" (acc, v) -> acc + v) / (_nv * nc), {round_digits}))"
    )
    pick_sql = (
        f"element_at(array({ids_sql}), "
        "CAST(array_position(_scores, array_max(_scores)) AS INT))"
    )
    return (
        df.select(F.col(id_col), as_double(vec_col).alias("_v"))
        .withColumn("_nv", F.sqrt(dot_expr(F.col("_v"), F.col("_v"))))
        .withColumn("_scores", F.expr(scores_sql))
        .withColumn("centroid_id", F.expr(pick_sql))
        .select(id_col, "_v", "centroid_id")
    )


def seed_centroids(
    corpus: DataFrame, id_col: str, vec_col: str, n_centroids: int
) -> DataFrame:
    """Deterministic init: the first ``n_centroids`` corpus vectors by id.

    (Random init would be fine for quality but breaks oracle replay.)
    """
    return (
        corpus.orderBy(id_col)
        .limit(n_centroids)
        .select(F.col(id_col).alias("centroid_id"), as_double(vec_col).alias("_cent"))
    )


def kmeans_centroids(
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    n_centroids: int = 16,
    n_iters: int = 2,
    round_digits: int = 6,
    exact_reduce: bool = True,
) -> DataFrame:
    """Lloyd's k-means as pure DataFrame aggregations: (centroid_id, _cent).

    Centroid state lives on the driver (the Spark MLlib k-means shape):
    each iteration is one *narrow* literal-inline assignment over the
    corpus followed by ONE hash shuffle — per-position sums with
    map-side partial aggregation, so the reduce side carries
    n_partitions x n_centroids rows of dim columns, bounded by centroid
    count, never corpus size.  The exact reduction quantizes each
    element to the 1e-9 grid with ``FLOOR(x * 1e9 + 0.5)`` (the same
    bit-deterministic form the int8 quantizer uses — identical IEEE
    multiply-then-floor in Spark and DuckDB, immune to the engines'
    HALF_UP-vs-banker's ROUND split) and sums BIGINTs: exact,
    associative, and pure codegen'd long arithmetic — no BigDecimal in
    the inner loop — so centroids are bit-identical regardless of
    partitioning AND reproducible in a DuckDB oracle.  Overflow bound:
    int64 holds sum(|x|*1e9) for ~9.2e9 rows per (centroid, dim) at
    |x|<=1; Spark 4's ANSI mode makes an overflow loud, and beyond that
    scale pre-aggregate per partition or drop to decimal.  Empty
    clusters drop out in both engines alike.  At 100 TB: assignment is
    embarrassingly parallel; the per-iteration collect moves only
    n_centroids x dim doubles to the driver.

    ``exact_reduce=False`` is plain DOUBLE sums, whose partial-
    aggregation order can move the centroid by ~1 ulp.  Assignment
    scores round to ``round_digits`` before the argmax, so that jitter
    essentially never flips a membership — but bit-exact replay (the
    oracle contract) is only guaranteed with the scaled-integer
    reduction, which every registered query keeps.  Measured at
    200k x dim 64 (tools/scalecheck.py kmeans A/B): exact 8.4 s vs
    fast 4.7 s per iteration — a ~1.8x premium, down from the 14x the
    earlier DECIMAL(28,9) exact path paid (18 s vs 1.3 s).
    """
    seed = seed_centroids(corpus, id_col, vec_col, n_centroids)
    pairs = kmeans_centroid_pairs(
        corpus, id_col, vec_col, n_centroids, n_iters, round_digits, exact_reduce
    )
    if not pairs:
        return seed
    spark = corpus.sparkSession
    return spark.createDataFrame(
        [(cid, vec) for cid, vec in pairs], schema=seed.schema
    )


def kmeans_centroid_pairs(
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    n_centroids: int = 16,
    n_iters: int = 2,
    round_digits: int = 6,
    exact_reduce: bool = True,
) -> list[tuple]:
    """The :func:`kmeans_centroids` Lloyd loop returning the DRIVER-side
    ``(centroid_id, vector)`` pair list directly — the form every inline
    assignment consumes.  Same seed, arithmetic, tie behavior, and
    iteration structure as the DataFrame wrapper (which delegates here);
    composed search paths use this to skip the createDataFrame ->
    re-collect round trip (one local-relation job per assignment side).
    """
    seed = seed_centroids(corpus, id_col, vec_col, n_centroids)
    rows = seed.collect()
    pairs = [(r["centroid_id"], [float(x) for x in r["_cent"]]) for r in rows]
    if not pairs:
        return []
    dim = len(pairs[0][1])
    vecs = corpus.select(F.col(id_col), as_double(vec_col).alias("_v"))
    if exact_reduce:
        # FLOOR(x*1e9+0.5) scaled-BIGINT partial sums: exact, associative,
        # codegen'd long arithmetic the DuckDB oracle replays bit-for-bit.
        sum_col = F.expr("CAST(sum(FLOOR(_x * 1e9 + 0.5D)) AS DOUBLE) / 1e9")
    else:
        sum_col = F.sum("_x")
    for _ in range(n_iters):
        assigned = _assign_gemm(vecs, pairs, id_col, "_v", round_digits)
        # posexplode keeps the agg plan at two expressions regardless of
        # dim (vs dim sum columns: same shuffled bytes after map-side
        # partial agg — n_partitions x k x dim rows either way — but a
        # far smaller plan to analyze/codegen per iteration).
        sums = (
            assigned.select("centroid_id", F.posexplode("_v").alias("_pos", "_x"))
            .groupBy("centroid_id", "_pos")
            .agg(sum_col.alias("_s"), F.count(F.lit(1)).alias("_n"))
        )
        acc: dict[int, list[float]] = {}
        for r in sums.collect():
            acc.setdefault(r["centroid_id"], [0.0] * dim)[r["_pos"]] = (
                r["_s"] / r["_n"]
            )
        pairs = sorted(acc.items())
    return pairs


def _ivf_search(
    corpus: DataFrame,
    queries: DataFrame,
    cents: DataFrame | None,
    id_col: str,
    vec_col: str,
    k: int,
    round_digits: int,
    cent_pairs: list[tuple] | None = None,
) -> DataFrame:
    """Shared IVF tail: assign both sides -> equi-join on cell -> top-k.

    The codebook is collected ONCE and both assignment sides share the
    driver pairs (previously each side's ``assign_to_centroids`` re-ran
    the centroid query — a duplicated job per search).  Callers that
    already hold driver pairs (the k-means trainers) pass ``cent_pairs``
    and skip the collect entirely.
    """
    if cent_pairs is None:
        cent_pairs = _collect_cent_pairs(cents)
    c_assign = _assign_gemm(corpus, cent_pairs, id_col, vec_col, round_digits)
    q_assign = _assign_gemm(queries, cent_pairs, id_col, vec_col, round_digits)
    q = q_assign.select(
        F.col(id_col).alias("query_id"), F.col("_v").alias("_qv"), "centroid_id"
    )
    c = c_assign.select(
        F.col(id_col).alias("neighbor_id"), F.col("_v").alias("_cv"), "centroid_id"
    )
    scored = (
        q.join(c, "centroid_id")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine_expr(F.col("_qv"), F.col("_cv")), round_digits).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cos_sim")
    )


def topk_cosine_ivf(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_centroids: int = 16,
    k: int = 3,
    round_digits: int = 6,
) -> DataFrame:
    """IVF-style approximate top-k: coarse quantize, search one cell.

    The coarse quantizer here is the deterministic seed (first
    ``n_centroids`` vectors by id); ``topk_cosine_ivf_kmeans`` trains it
    with Lloyd iterations.  The search plan shape (assign -> equi-join
    on centroid id -> local top-k) is identical either way — that is the
    point.  nprobe=1; raise recall by probing the q nearest cells (union
    of equi-joins), still never a cross product.
    """
    cents = seed_centroids(corpus, id_col, vec_col, n_centroids)
    return _ivf_search(corpus, queries, cents, id_col, vec_col, k, round_digits)


def topk_cosine_ivf_kmeans(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_centroids: int = 16,
    n_iters: int = 2,
    k: int = 3,
    round_digits: int = 6,
) -> DataFrame:
    """IVF top-k with a k-means-trained coarse quantizer (see
    ``kmeans_centroids`` for the deterministic, oracle-replayable loop)."""
    pairs = kmeans_centroid_pairs(
        corpus, id_col, vec_col, n_centroids, n_iters, round_digits
    )
    return _ivf_search(
        corpus, queries, None, id_col, vec_col, k, round_digits, cent_pairs=pairs
    )


def assign_topn_centroids(
    df: DataFrame,
    centroids: DataFrame,
    id_col: str,
    vec_col: str,
    nprobe: int,
    round_digits: int = 6,
) -> DataFrame:
    """Top-``nprobe`` centroid assignment: up to ``nprobe`` output rows
    per input row, one per probed cell — the IVF recall knob's query-side
    expansion.  Scoring is the same per-Arrow-batch GEMM as
    ``_assign_gemm``; the stable descending argsort breaks rounded-score
    ties toward the lower centroid id, identical to the oracle's
    ``ROW_NUMBER() OVER (ORDER BY score DESC, centroid_id)``.
    """
    return _assign_topn_gemm(
        df, _collect_cent_pairs(centroids), id_col, vec_col, nprobe, round_digits
    )


def _assign_topn_gemm(
    df,
    pairs: Sequence[tuple],
    id_col: str,
    vec_col: str,
    nprobe: int,
    round_digits: int = 6,
) -> DataFrame:
    """:func:`assign_topn_centroids` against driver-held pairs (shared
    with the corpus side's assignment instead of re-collecting)."""
    import pandas as pd

    if nprobe < 1:
        raise ValueError(f"assign_topn_centroids: nprobe must be >= 1, got {nprobe}")
    if len(pairs) > MAX_INLINE_CENTROIDS:
        raise ValueError(
            f"assign_topn_centroids: {len(pairs)} centroids exceeds the "
            f"{MAX_INLINE_CENTROIDS} inline cap"
        )
    p = min(nprobe, len(pairs))
    c_ids = np.array([int(cid) for cid, _ in pairs], dtype=np.int64)
    c_mat = np.array([vec for _, vec in pairs], dtype=np.float64)
    c_norm = np.sqrt(np.einsum("ij,ij->i", c_mat, c_mat))

    src = df.select(F.col(id_col), as_double(vec_col).alias("_v"))
    id_field = src.schema[id_col]
    out_schema = (
        f"`{id_col}` {id_field.dataType.simpleString()}, "
        "_v array<double>, centroid_id bigint"
    )

    def assign(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            v = np.stack(pdf["_v"].to_numpy()).astype(np.float64)
            nv = np.sqrt(np.einsum("ij,ij->i", v, v))
            scores = np.round(
                (v @ c_mat.T) / (nv[:, None] * c_norm[None, :]), round_digits
            )
            top = np.argsort(-scores, axis=1, kind="stable")[:, :p]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].to_numpy().repeat(p),
                    "_v": pdf["_v"].to_numpy().repeat(p),
                    "centroid_id": c_ids[top].reshape(-1),
                }
            )

    return src.mapInPandas(assign, out_schema)


def topk_cosine_ivf_probe(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_centroids: int = 16,
    nprobe: int = 2,
    k: int = 3,
    round_digits: int = 6,
) -> DataFrame:
    """IVF top-k with multi-cell probing — the standard IVF recall knob.

    Each query searches its ``nprobe`` nearest cells instead of one:
    candidate volume (and recall) scales ~linearly with ``nprobe`` while
    the plan stays a hash equi-join on centroid_id — never a cross
    product.  A (query, neighbor) pair cannot duplicate: the corpus side
    keeps its unique nearest-cell assignment, so each neighbor meets a
    query through at most one of its probed cells — no dedup pass.
    """
    cents = seed_centroids(corpus, id_col, vec_col, n_centroids)
    # ONE codebook collect shared by both assignment sides (previously
    # the seed query ran twice, once per side)
    pairs = _collect_cent_pairs(cents)
    c_assign = _assign_gemm(corpus, pairs, id_col, vec_col, round_digits)
    q_assign = _assign_topn_gemm(
        queries, pairs, id_col, vec_col, nprobe, round_digits
    )
    q = q_assign.select(
        F.col(id_col).alias("query_id"), F.col("_v").alias("_qv"), "centroid_id"
    )
    c = c_assign.select(
        F.col(id_col).alias("neighbor_id"), F.col("_v").alias("_cv"), "centroid_id"
    )
    scored = (
        q.join(c, "centroid_id")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                cosine_expr(F.col("_qv"), F.col("_cv")), round_digits
            ).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cos_sim")
    )


def _cluster_dominated_gemm(
    assigned: DataFrame, id_col: str, threshold: float, round_digits: int
) -> DataFrame:
    """Per-cluster dominated scan as one NumPy matmul per group.

    For each centroid group: cos(i,j) = (V·Vᵀ) / (‖v‖ outer ‖v‖),
    rounded to ``round_digits``; a row is dominated when any lower-id
    row in the same cluster meets the threshold.  Ids are unique per
    cluster (a row is assigned exactly once), so no global distinct is
    needed.  Emits the full (id, centroid_id, is_dup) verdict per row —
    the group already holds every cluster member, so this IS the
    operator output: no flag join, and the assignment projection is
    evaluated once, not once per consumer.
    """
    import numpy as np
    import pandas as pd

    out_schema = f"{id_col} long, centroid_id long, is_dup boolean"

    def find_dominated(pdf: pd.DataFrame) -> pd.DataFrame:
        ids = pdf[id_col].to_numpy()
        cid = pdf["centroid_id"].to_numpy()
        if len(pdf) < 2:
            return pd.DataFrame(
                {id_col: ids, "centroid_id": cid, "is_dup": np.zeros(len(pdf), bool)}
            )
        order = np.argsort(ids, kind="stable")
        ids = ids[order]
        mat = np.vstack(pdf["_v"].to_numpy()[order]).astype(np.float64)
        norms = np.sqrt(np.einsum("ij,ij->i", mat, mat))
        cos = np.round((mat @ mat.T) / np.outer(norms, norms), round_digits)
        # strict upper triangle = (lower id, higher id) pairs
        hit = np.triu(cos >= threshold, k=1).any(axis=0)
        return pd.DataFrame({id_col: ids, "centroid_id": cid[order], "is_dup": hit})

    return assigned.groupBy("centroid_id").applyInPandas(find_dominated, out_schema)


def semantic_dedup(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_centroids: int = 16,
    n_iters: int = 2,
    threshold: float = 0.99,
    round_digits: int = 6,
    use_gemm: bool = True,
) -> DataFrame:
    """SemDeDup-shaped semantic deduplication (Abbas et al. 2023):
    k-means-cluster the embedding space, then within each cluster mark
    any row whose cosine similarity to a lower-id row meets the
    threshold as a duplicate (deterministic min-id survivor).

    Output: (id, centroid_id, is_dup).  Plan: the training loop (see
    ``kmeans_centroids``), a narrow literal-inline assignment, the
    intra-cluster pair scan, and a left anti-ish join to flag
    survivors.  The pair scan is quadratic only within a cluster — the
    SemDeDup contract — so n_centroids is the knob that bounds
    candidate volume at 100 TB (clusters of ~n/k rows).

    With ``use_gemm`` (default) the pair scan is one Arrow-batched
    ``applyInPandas`` per cluster: a single (m × dim)·(dim × m) NumPy
    matmul replaces m²·dim interpreted fold steps (same ~25× win the
    top-k GEMM path measured in tools/scalecheck.py), and each group
    emits its rows' (id, centroid_id, is_dup) verdicts directly — no
    flag join.  One cluster must fit an executor's
    memory — at 100 TB that is exactly the SemDeDup regime, where
    n_centroids is chosen to keep clusters at ~1e4-1e5 rows.
    ``use_gemm=False`` keeps the pure-SQL equi-join pair scan (the
    shape the DuckDB oracle replays literally); both paths round the
    cosine to ``round_digits`` before the threshold, so they agree.
    """
    pairs = kmeans_centroid_pairs(
        corpus, id_col, vec_col, n_centroids, n_iters, round_digits
    )
    assigned = (
        _assign_gemm(corpus, pairs, id_col, vec_col, round_digits)
        if use_gemm
        else _assign_inline(corpus, pairs, id_col, vec_col, round_digits)
    )
    if use_gemm:
        return _cluster_dominated_gemm(assigned, id_col, threshold, round_digits)
    else:
        a = assigned.select(
            F.col(id_col).alias("_ida"), F.col("_v").alias("_va"), "centroid_id"
        )
        b = assigned.select(
            F.col(id_col).alias("_idb"), F.col("_v").alias("_vb"), "centroid_id"
        )
        dominated = (
            a.join(b, "centroid_id")
            .where(F.col("_ida") < F.col("_idb"))
            .where(
                F.round(cosine_expr(F.col("_va"), F.col("_vb")), round_digits)
                >= threshold
            )
            .select(F.col("_idb").alias(id_col))
            .distinct()
            .withColumn("_dup", F.lit(True))
        )
    return (
        assigned.select(id_col, "centroid_id")
        .join(dominated, id_col, "left")
        .select(
            id_col,
            "centroid_id",
            F.coalesce("_dup", F.lit(False)).alias("is_dup"),
        )
    )


def topk_cosine_gemm(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    round_digits: int = 6,
    max_query_rows: int = 100_000,
) -> DataFrame:
    """Brute-force top-k via per-partition NumPy GEMM — the scale path.

    The JVM higher-order-function dot product evaluates interpreted
    per-element; at millions of (query x corpus) pairs a vectorized
    matrix multiply is ~25x faster (measured in tools/scalecheck.py).
    The query matrix broadcasts once per executor; each Arrow batch of
    the corpus does ONE (batch x dim) @ (dim x n_queries) multiply and
    emits only its per-batch top-k rows, so the shuffle to the final
    global top-k carries n_batches * n_queries * k rows, never the full
    pair matrix.  Exclusion of self-matches happens on the id column.

    The query side is collected to the driver and broadcast, so it must
    be small; ``max_query_rows`` (default 100k ~ a few hundred MB at
    dim 1k) guards the driver against OOM — for larger query sets use
    the LSH/IVF variants, which keep both sides distributed.
    """
    import pandas as pd

    spark = corpus.sparkSession
    qpd = (
        queries.select(F.col(id_col).alias("qid"), as_double(vec_col).alias("qv"))
        .limit(max_query_rows + 1)
        .toPandas()
    )
    if len(qpd) > max_query_rows:
        raise ValueError(
            f"topk_cosine_gemm collects the query side to the driver; got more "
            f"than max_query_rows={max_query_rows} query rows. Use "
            "topk_cosine_lsh/topk_cosine_ivf for large query sets, or raise "
            "max_query_rows explicitly if the driver has the memory."
        )
    q_ids = qpd["qid"].to_numpy()
    q_mat = np.stack(qpd["qv"].to_numpy()).astype(np.float64)
    q_norm = np.sqrt(np.einsum("ij,ij->i", q_mat, q_mat))
    bc = spark.sparkContext.broadcast((q_ids, q_mat, q_norm))
    kk = k

    def score(batches):
        q_ids_, q_mat_, q_norm_ = bc.value
        for pdf in batches:
            c_mat = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            c_ids = pdf[id_col].to_numpy()
            c_norm = np.sqrt(np.einsum("ij,ij->i", c_mat, c_mat))
            sims = (c_mat @ q_mat_.T) / (c_norm[:, None] * q_norm_[None, :])
            sims[c_ids[:, None] == q_ids_[None, :]] = -np.inf  # self-match
            top = min(kk, sims.shape[0])
            idx = np.argpartition(-sims, top - 1, axis=0)[:top]  # per-query partial top-k
            out = pd.DataFrame(
                {
                    "query_id": np.repeat(q_ids_, top),
                    "neighbor_id": c_ids[idx].T.ravel(),
                    "cos_sim": np.round(np.take_along_axis(sims, idx, axis=0).T.ravel(), 6),
                }
            )
            yield out[np.isfinite(out["cos_sim"])]

    partial = corpus.select(id_col, as_double(vec_col).alias(vec_col)).mapInPandas(
        score, schema="query_id long, neighbor_id long, cos_sim double"
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id")
    )
    return (
        partial.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cos_sim")
    )


def quantize_embeddings(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    clip: float = 1.0,
) -> DataFrame:
    """Symmetric int8 scalar quantization of an embedding column.

    ``q_i = floor(clamp(x_i, -clip, clip) / clip * 127 + 0.5)`` — an
    8-byte-per-dim array<double> becomes 1 byte per dim (4 bytes here,
    Spark arrays have no TINYINT element specialization on the wire, but
    Parquet dictionary/bit-packing stores the int range in ~1 byte): the
    standard memory-bound ANN trade.  ``floor(x + 0.5)`` rather than
    ``round(x)`` because it is EXPLICIT about the tie rule: measured,
    ROUND on DOUBLE is half-away-from-zero in BOTH engines
    (``ROUND(2.5)=3``, ``ROUND(-2.5)=-3`` in DuckDB; Spark HALF_UP ==
    away-from-zero) — an earlier revision of this docstring claimed
    DuckDB was banker's, contradicting ``pca._round6``; the
    ``test_round6_matches_duckdb_round`` property pins the half-away
    behavior at 6 digits, and the direct 0-digit probe (where ties ARE
    representable) confirms it too.  ``floor(x+0.5)`` stays because it
    states the rule in arithmetic instead of relying on either engine's
    ROUND documentation.  Clamping first bounds the int range at ±127
    exactly.

    Output: (id, q array<int>, n_clipped int).  Dequantize with
    ``dequantize_expr`` (x̂_i = q_i / 127 * clip); reconstruction error
    is bounded by clip/254 per element plus the clipping loss, which
    ``n_clipped`` makes observable per row.

    At 100 TB this is a narrow projection (zero shuffle) that cuts the
    embedding bytes ~4-8x before they enter any join/shuffle — quantize
    BEFORE the candidate join, not after, is the point.
    """
    v = as_double(vec_col)
    clamped = F.transform(
        v, lambda x: F.least(F.greatest(x, F.lit(-clip)), F.lit(clip))
    )
    q = F.transform(
        clamped, lambda x: F.floor(x / F.lit(clip) * 127 + F.lit(0.5)).cast("int")
    )
    n_clipped = F.aggregate(
        v,
        F.lit(0),
        lambda acc, x: acc
        + F.when((x < F.lit(-clip)) | (x > F.lit(clip)), F.lit(1)).otherwise(F.lit(0)),
    )
    return df.select(
        F.col(id_col),
        q.alias("q"),
        n_clipped.cast("int").alias("n_clipped"),
    )


def dequantize_expr(q_col: Column | str, clip: float = 1.0) -> Column:
    """Inverse of ``quantize_embeddings``: x̂_i = q_i / 127 * clip."""
    c = F.col(q_col) if isinstance(q_col, str) else q_col
    return F.transform(c, lambda x: x.cast("double") / F.lit(127.0) * F.lit(clip))


def topk_cosine_quantized(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    clip: float = 1.0,
    round_digits: int = 6,
) -> DataFrame:
    """Exact-over-quantized top-k: quantize both sides to int8, then run
    the GEMM top-k on the dequantized vectors.

    Recall loss comes only from quantization (cosine perturbation
    ~1/127 per unit vector); the search itself is exact.  Dequantized
    values are exact multiples of clip/127, so the rounded cosine is
    engine-reproducible the same way the float path is.
    """
    cq = quantize_embeddings(corpus, id_col, vec_col, clip).select(
        F.col(id_col), dequantize_expr("q", clip).alias(vec_col)
    )
    qq = quantize_embeddings(queries, id_col, vec_col, clip).select(
        F.col(id_col), dequantize_expr("q", clip).alias(vec_col)
    )
    return topk_cosine_gemm(cq, qq, id_col, vec_col, k=k, round_digits=round_digits)

def recall_report(
    approx: DataFrame,
    exact: DataFrame,
    k: int,
    query_col: str = "query_id",
    neighbor_col: str = "neighbor_id",
) -> DataFrame:
    """Recall@k of an approximate neighbor result against the exact one —
    the measurement that makes the ANN recall knobs (LSH bands, IVF
    nprobe, quantization clip) tunable instead of blind (round-6 item 5).

    Both inputs are ``(query_id, neighbor_id, rank, ...)`` frames as
    produced by every ``topk_cosine*`` variant; rows with ``rank > k``
    are ignored so a k'-deep result can be evaluated at any k <= k'.
    Returns ONE row::

        (k, n_queries, n_hits, n_exact, micro_recall, macro_recall)

    * ``micro_recall`` — total hits / total exact neighbors (corpus view);
    * ``macro_recall`` — mean per-query recall (every query weighs the
      same, so a single all-miss query is visible even among easy ones).

    Determinism: micro is a single bigint/bigint division; macro rounds
    each per-query recall to 6 digits, SUMS as DECIMAL (exact,
    associative), and divides by the query count once in float64 —
    partial-aggregation order can never change a bit, the registry's
    standard float discipline.

    Scale: one equi-join on (query, neighbor) + two aggregations over
    |queries| x k rows — trivially distributed, no driver state; at any
    corpus size the report is one row, so it composes into monitoring
    pipelines for free.
    """
    e = exact.where(F.col("rank") <= k).select(query_col, neighbor_col)
    a = (
        approx.where(F.col("rank") <= k)
        .select(query_col, neighbor_col)
        .distinct()
        .withColumn("_hit", F.lit(1))
    )
    per_q = (
        e.join(a, [query_col, neighbor_col], "left")
        .groupBy(query_col)
        .agg(
            F.count(F.lit(1)).alias("n_exact"),
            F.sum(F.coalesce("_hit", F.lit(0))).alias("n_hit"),
        )
    )
    per_q_recall = F.round(F.col("n_hit") / F.col("n_exact"), 6).cast("decimal(18,6)")
    return per_q.agg(
        F.lit(k).alias("k"),
        F.count(F.lit(1)).alias("n_queries"),
        F.sum("n_hit").alias("n_hits"),
        F.sum("n_exact").alias("n_exact"),
        F.round(F.sum("n_hit") / F.sum("n_exact"), 6).alias("micro_recall"),
        F.round(
            F.sum(per_q_recall).cast("double") / F.count(F.lit(1)), 6
        ).alias("macro_recall"),
    )


def hard_negatives(
    corpus: DataFrame,
    pairs: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_col: str = "query_id",
    positive_col: str = "positive_id",
    k: int = 3,
    n_centroids: int = 8,
    n_iters: int = 2,
    round_digits: int = 6,
) -> DataFrame:
    """Hard-negative mining for contrastive training: for each
    (query, positive) pair, the ``k`` corpus items most similar to the
    query that are NOT the query and NOT its positive — the negatives
    that actually move an embedding model (random negatives are too
    easy; see DPR/SimCSE practice).

    Built on the IVF scale path: candidates come from the k-means cell
    equi-join (never a cross product); the positive is excluded by an
    id comparison after the pairs relation (small — one row per
    training pair) broadcasts onto the query side.  Output:
    ``(query_id, positive_id, negative_id, rank, cos_sim)``.
    """
    cent_pairs = kmeans_centroid_pairs(
        corpus, id_col, vec_col, n_centroids, n_iters, round_digits
    )
    queries = corpus.join(
        F.broadcast(pairs.select(F.col(query_col).alias(id_col))), id_col, "left_semi"
    )
    hits = _ivf_search(
        corpus, queries, None, id_col, vec_col, k + 1, round_digits,
        cent_pairs=cent_pairs,
    )
    p = pairs.select(
        F.col(query_col).alias("query_id"), F.col(positive_col).alias("positive_id")
    )
    negs = (
        hits.join(F.broadcast(p), "query_id")
        .where(F.col("neighbor_id") != F.col("positive_id"))
    )
    w = Window.partitionBy("query_id", "positive_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id")
    )
    return (
        negs.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            "query_id",
            "positive_id",
            F.col("neighbor_id").alias("negative_id"),
            "rank",
            "cos_sim",
        )
    )


def truncate_embeddings(
    df: DataFrame,
    vec_col: str,
    dim: int,
    renormalize: bool = True,
    out_col: str | None = None,
) -> DataFrame:
    """Matryoshka truncation (Kusupati et al. 2022): keep the first
    ``dim`` components of an MRL-trained embedding — the
    cost/recall knob that needs NO model change, just a projection.
    ``renormalize`` restores unit norm (cosine consumers assume it
    post-truncation; the full vector's norm no longer applies).

    Pure JVM ``slice`` + element-wise divide; pair with
    ``recall_report`` to measure what a given ``dim`` costs on YOUR
    corpus before committing storage to it.  Zero-vector inputs stay
    zero instead of dividing by zero.
    """
    if dim < 1:
        raise ValueError(f"truncate_embeddings: dim must be >= 1, got {dim}")
    out = out_col or vec_col
    v = F.slice(as_double(vec_col), 1, dim)
    if renormalize:
        n = F.sqrt(dot_expr(v, v))
        v = F.when(n == 0, v).otherwise(F.transform(v, lambda x: x / n))
    return df.withColumn(out, v)


def jl_projection_matrix(in_dim: int, out_dim: int, seed: int = 29) -> np.ndarray:
    """Deterministic dense ±1/sqrt(out_dim) Johnson–Lindenstrauss matrix
    (the Achlioptas sign construction): entry sign from an md5 digit of
    ``seed:i:j`` — no RNG, so any engine (and the DuckDB oracle) rebuilds
    the identical matrix from the same three integers."""
    import hashlib

    m = np.empty((in_dim, out_dim), dtype=np.float64)
    scale = 1.0 / float(np.sqrt(out_dim))
    for i in range(in_dim):
        for j in range(out_dim):
            d = int(hashlib.md5(f"{seed}:{i}:{j}".encode()).hexdigest()[:1], 16)
            m[i, j] = scale if d % 2 == 0 else -scale
    return m


def project_jl(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    out_dim: int = 16,
    seed: int = 29,
    keep_cols: Sequence[str] = (),
) -> DataFrame:
    """Johnson–Lindenstrauss random projection: ``in_dim -> out_dim``
    with pairwise distances preserved within (1±ε) w.h.p. — the cheap
    front-end that makes every downstream ANN/brute-force pass ~in/out×
    fewer multiplies at 100 TB (project ONCE, land the narrow vectors,
    index those).

    One Arrow crossing per batch; each output component is an exact
    scaled-BIGINT sum of per-term ``floor(v_i * m_ij * 1e9 + 0.5)``
    contributions — associative integer adds, so the result is
    independent of batch/partition boundaries and bit-identical to the
    DuckDB replay (the repo's GEMM-exactness discipline).

    Operating bound: each output component sums ``in_dim`` int64 terms
    of magnitude ``|v_i|·(1/√out_dim)·1e9``, so exactness requires
    ``in_dim · max|v| · 1e9 / √out_dim < 2^63`` — comfortable for any
    real embedding (unit vectors at in_dim 4096: ~1e12, six orders
    under the 9.2e18 ceiling); per-ROW sums never grow with corpus
    size, unlike the covariance reduction whose N-term bound
    ``operators/pca.py:covariance_matrix`` documents (ADVICE r8).

    Returns ``(id_col, *keep_cols, embedding array<double>)``.
    """
    import pandas as pd

    keep = list(keep_cols)
    src = df.select(
        F.col(id_col), *[F.col(c) for c in keep], as_double(vec_col).alias("_v")
    )
    field_sql = ", ".join(
        f"`{c}` {src.schema[c].dataType.simpleString()}" for c in [id_col, *keep]
    )
    first = src.first()
    if first is None:  # empty input: empty output with the REAL id/keep schema
        return df.sparkSession.createDataFrame(
            [], f"{field_sql}, embedding array<double>"
        )
    in_dim = len(first["_v"])
    m = jl_projection_matrix(in_dim, out_dim, seed)

    def proj(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            v = np.stack(pdf["_v"].to_numpy()).astype(np.float64)
            # exact per-term scaled-int sums: (n, in) x (in, out) with the
            # flooring applied to each term BEFORE summation
            terms = v[:, :, None] * m[None, :, :]  # (n, in, out)
            ints = np.floor(terms * 1e9 + 0.5).astype(np.int64).sum(axis=1)
            out = pdf[[id_col, *keep]].copy()
            out["embedding"] = [list(row) for row in ints / 1e9]
            yield out

    return src.mapInPandas(proj, f"{field_sql}, embedding array<double>")


def topk_cosine_jl(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    out_dim: int = 16,
    depth: int = 10,
    k: int = 3,
    seed: int = 29,
    round_digits: int = 6,
) -> DataFrame:
    """JL-compressed shortlist + exact re-rank — the projection analogue
    of IVF-PQ+R: score candidates in the ``out_dim`` projected space
    (in/out × fewer multiplies per pair), shortlist ``depth`` per query,
    then re-score ONLY the shortlist with the exact full-dimension
    cosine.  JL preserves pairwise geometry within (1±ε) w.h.p., so a
    modest ``depth`` recovers near-exact top-k while the expensive pass
    touches |queries| × depth rows.

    At 100 TB the projection runs ONCE (land the narrow vectors to
    parquet) and every shortlist pass reads 4× fewer bytes; the re-rank
    joins full vectors for survivors only.
    """
    pc = project_jl(corpus, id_col, vec_col, out_dim, seed)
    pq = project_jl(queries, id_col, vec_col, out_dim, seed)
    shortlist = topk_cosine_gemm(
        pc, pq, id_col, "embedding", k=depth, round_digits=round_digits
    )
    c = corpus.select(F.col(id_col).alias("_nid"), as_double(vec_col).alias("_cv"))
    q = queries.select(F.col(id_col).alias("_qid"), as_double(vec_col).alias("_qv"))
    cand = (
        shortlist.select("query_id", "neighbor_id")
        .join(c, F.col("neighbor_id") == F.col("_nid"))
        .join(F.broadcast(q), F.col("query_id") == F.col("_qid"))
    )
    rescored = cand.select(
        "query_id",
        "neighbor_id",
        F.round(cosine_expr(F.col("_qv"), F.col("_cv")), round_digits).alias(
            "cos_sim"
        ),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id")
    )
    return (
        rescored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cos_sim")
    )


def knn_graph(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 3,
    n_centroids: int | None = 16,
    sim_threshold: float | None = None,
    round_digits: int = 6,
    target_cell_rows: int = 500,
) -> DataFrame:
    """k-nearest-neighbor graph over an embedding corpus: one directed
    edge ``(id_a, id_b, cos_sim)`` per (vector, top-k neighbor), built
    on the IVF scale path (cell equi-join, never an all-pairs product)
    with the corpus as its own query set.  ``sim_threshold`` optionally
    drops weak edges — the usual knob between 'every vector gets k
    edges' and 'only genuinely similar vectors connect'.

    Scale (100 TB): the candidate space is per-cell, so edge
    construction costs what one IVF search over the corpus costs; the
    output is at most ``k·n`` edges — linear in the corpus, never
    quadratic.  Because corpus == queries here, the centroid GEMM
    assignment is computed ONCE and localCheckpointed, then self-joined
    — the generic ``_ivf_search(corpus, corpus)`` path would run the
    identical Arrow crossing twice, once per join side (the same
    re-derivation class as the r7 embed-IVF and r8 WARC fixes; at real
    scale: land the assignment to parquet, self-join from there).

    ``n_centroids`` must grow with the corpus or the cell self-join
    goes quadratic: per-cell cost is O(cell²), and a FIXED centroid
    count makes cell size ∝ n, so total work ∝ n²/c — measured in
    tools/scalecheck.py as exponent 1.58 (6.2 s → 236 s) for a 10×
    corpus at a pinned ``n_centroids=16``, vs exponent 0.55 when
    centroids scale with n.  Pass ``n_centroids=None`` to size the
    codebook automatically as ``ceil(n / target_cell_rows)`` (one
    extra count job; at real scale you know n from table stats and
    should pass it explicitly).
    """
    if n_centroids is None:
        import math as _math

        n_rows = corpus.count()
        n_centroids = max(16, _math.ceil(n_rows / max(1, target_cell_rows)))
    cents = seed_centroids(corpus, id_col, vec_col, n_centroids)
    assign = assign_to_centroids(
        corpus, cents, id_col, vec_col, round_digits
    ).localCheckpoint(eager=False)
    # Corpus-as-queries makes the candidate set cell-QUADRATIC (~n²/cells
    # pairs).  The pre-r18 shape materialized those pairs through a cell
    # self-join — every vector crossed the exchange AND the Arrow boundary
    # once PER CANDIDATE (cell_rows ≈ 125 copies each at sf0.1: ~250 MB
    # shuffled and pickled for a 2.5 MB corpus) — then ranked them with a
    # window exchange+sort.  Per-cell GEMM (guide §2.3 "shuffle keys and
    # metadata, not payloads"; §4.2) moves each vector ONCE into the cell
    # task, scores the cell against itself with one blocked matmul, and
    # takes the top-k inside the task, so the exchange and the Python
    # crossing carry O(n) vector rows and the window shuffle disappears
    # (measured 2.5 s → 0.9 s isolated at sf0.1; edges bit-identical).
    # Exactness: scores are np.round(dot/(norm·norm), round_digits) —
    # the _cosine_pairs_gemm arithmetic; BLAS vs einsum summation order
    # differs by ~1 ulp, far inside the 0.5e-6 rounding slack (the
    # repo-wide GEMM exactness argument, oracle hash-green) — and the
    # in-cell ordering replays the old window's (cos_sim DESC,
    # neighbor_id ASC) tie-break via a stable lexsort.  Memory: the
    # score matrix is built in 4096-query-row blocks, O(block ×
    # cell_rows) doubles, so an under-sized codebook degrades to more
    # blocks, never a single giant allocation; per-cell work remains
    # O(cell²) either way, which is why ``n_centroids`` must scale with
    # the corpus (see above).
    kk = int(k)
    id_type = assign.schema[id_col].dataType.simpleString()
    out_schema = f"id_a {id_type}, id_b {id_type}, cos_sim double"

    def cell_topk(pdf):
        import pandas as pd

        m = len(pdf)
        ids = pdf[id_col].to_numpy()
        if m < 2:
            return pd.DataFrame(
                {
                    "id_a": ids[:0],
                    "id_b": ids[:0],
                    "cos_sim": np.zeros(0, dtype=np.float64),
                }
            )
        v = np.stack(pdf["_v"].to_numpy()).astype(np.float64)
        norms = np.sqrt(np.einsum("ij,ij->i", v, v))
        out_a, out_b, out_s = [], [], []
        for i0 in range(0, m, 4096):
            i1 = min(i0 + 4096, m)
            scores = np.round(
                (v[i0:i1] @ v.T) / (norms[i0:i1, None] * norms[None, :]),
                round_digits,
            )
            for i in range(i0, i1):
                s = scores[i - i0]
                order = np.lexsort((ids, -s))
                cnt = 0
                for j in order:
                    if ids[j] == ids[i]:
                        continue
                    out_a.append(ids[i])
                    out_b.append(ids[j])
                    out_s.append(s[j])
                    cnt += 1
                    if cnt == kk:
                        break
        return pd.DataFrame({"id_a": out_a, "id_b": out_b, "cos_sim": out_s})

    pairs = assign.groupBy("centroid_id").applyInPandas(cell_topk, out_schema)
    if sim_threshold is not None:
        pairs = pairs.where(F.col("cos_sim") >= sim_threshold)
    return pairs


def cluster_embeddings_knn(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 3,
    n_centroids: int | None = 16,
    sim_threshold: float | None = None,
    round_digits: int = 6,
    max_iterations: int = 25,
    target_cell_rows: int = 500,
) -> DataFrame:
    """Corpus clustering via the k-NN graph: connected components over
    :func:`knn_graph` edges — the scalable skeleton of topic/content
    clustering (and the graph-side sibling of ``semantic_dedup``, which
    clusters by centroid cell instead of by neighbor chains).  Every
    vector gets a ``(id_col, component)`` label; the component id is
    the minimum member id (deterministic canonical representative),
    singletons keep their own id.  ``n_centroids=None`` auto-sizes the
    codebook to keep cells bounded — see :func:`knn_graph` for the
    measured superlinearity a fixed codebook causes at scale.

    Composition, not new machinery: the edges come from the IVF cell
    join and the labels from the O(log n)-round large-star/small-star
    alternation ``dedup.connected_components`` already provides (with
    its converged-or-warn contract).  At 100 TB both pieces keep their
    own scale stories; nothing here adds a shuffle beyond them.
    """
    from .dedup import connected_components

    edges = knn_graph(
        corpus, id_col, vec_col, k, n_centroids, sim_threshold, round_digits,
        target_cell_rows,
    )
    return connected_components(
        edges.select("id_a", "id_b"),
        corpus,
        id_col,
        max_iterations=max_iterations,
    )
