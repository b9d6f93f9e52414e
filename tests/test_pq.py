"""operators/pq.py: product-quantization semantics beyond the oracle.

The registered queries pin the full replay; these tests pin the PQ
invariants — code compactness, exact-reconstruction behavior, the
rerank-converges-to-exact-IVF property, and the guard rails.
"""

import pytest
from pyspark.sql import functions as F

from lightfusion_spark.operators import pq, similarity


def _vecs(spark, rows, dim=8):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in rows],
        f"vec_id long, embedding array<double>",
    )


def _block_corpus(spark, n=24, dim=8):
    """Vectors whose two subspace halves each take one of two exact
    patterns -> a 2-entry codebook reconstructs them EXACTLY, so the
    ADC dot equals the true dot."""
    a, b = [1.0, 0.0, 0.0, 1.0], [0.0, 2.0, 2.0, 0.0]
    rows = [(i, (a if i % 2 == 0 else b) + (b if i % 3 == 0 else a)) for i in range(n)]
    return _vecs(spark, rows, dim)


def test_dim_must_divide(spark):
    df = _vecs(spark, [(0, [1.0, 2.0, 3.0])], dim=3)
    with pytest.raises(ValueError, match="not divisible"):
        pq.pq_train_codebook(df, "vec_id", "embedding", m=2, pq_k=2)


def test_codebook_cap(spark):
    df = _block_corpus(spark)
    with pytest.raises(ValueError, match="inline cap"):
        pq._assign_l2_gemm(df, [(i, [0.0] * 8) for i in range(300)], "vec_id", "embedding", 6)


def test_encode_codes_compact_and_in_range(spark):
    df = _block_corpus(spark)
    book = pq.pq_train_codebook(df, "vec_id", "embedding", m=2, pq_k=4, n_iters=2)
    assert len(book) == 2
    for pairs in book:
        assert all(0 <= c < 4 for c, _ in pairs)  # compact ranks, byte-safe
    enc = pq.pq_encode(df, book, "vec_id", "embedding").collect()
    assert len(enc) == 24
    for r in enc:
        assert len(r["codes"]) == 2
        assert all(0 <= c < 4 for c in r["codes"])


def test_emptied_cluster_codes_stay_dense(spark):
    """Duplicate seed vectors force a cluster to EMPTY during Lloyd (ties
    break to the lower code, so the duplicate centroid gets zero points).
    Before the re-densify fix, the surviving codes skipped the dead rank
    (e.g. [0, 2, 3]) while adc_dot_expr probes the codebook POSITIONALLY —
    element_at(book, code+1) read the wrong centroid or NULL past the end.
    Pin: codes returned by training are exactly 0..len-1 per subspace, and
    the ADC search over such a corpus yields no NULL scores."""
    # seeds = first pq_k=3 by id; vec 0 and 1 identical -> code 1 empties.
    rows = [
        (0, [0.0, 0.0, 5.0, 5.0]),
        (1, [0.0, 0.0, 5.0, 5.0]),
        (2, [10.0, 10.0, -5.0, -5.0]),
        (3, [0.1, 0.1, 5.1, 5.1]),
        (4, [10.1, 9.9, -5.1, -4.9]),
        (5, [0.2, -0.1, 4.9, 5.2]),
    ]
    df = _vecs(spark, rows, dim=4)
    book = pq.pq_train_codebook(df, "vec_id", "embedding", m=2, pq_k=3, n_iters=2)
    for pairs in book:
        assert [c for c, _ in pairs] == list(range(len(pairs))), (
            f"sparse codes after an emptied cluster: {[c for c, _ in pairs]}"
        )
        assert len(pairs) < 3  # the duplicate-seed cluster really did empty
    out = pq.topk_cosine_ivf_pq(
        df, df.where(F.col("vec_id") < 2), n_centroids=2, coarse_iters=1,
        m=2, pq_k=3, pq_iters=2, k=2,
    ).collect()
    assert out, "search returned nothing"
    assert all(r["cos_pq"] is not None for r in out), "NULL ADC score"


def test_adc_exact_on_representable_corpus(spark):
    """Two distinct patterns per subspace + pq_k>=2 -> Lloyd converges to
    the patterns themselves -> reconstruction is exact -> the ADC cosine
    must equal the true cosine (both rounded at 6)."""
    df = _block_corpus(spark)
    q = df.where(F.col("vec_id") < 4)
    got = pq.topk_cosine_ivf_pq(
        df, q, "vec_id", "embedding",
        n_centroids=2, coarse_iters=1, m=2, pq_k=4, pq_iters=2, k=3,
    )
    exact = similarity.topk_cosine_ivf_kmeans(
        df, q, "vec_id", "embedding", n_centroids=2, n_iters=1, k=3
    )
    g = {(r["query_id"], r["neighbor_id"]): r["cos_pq"] for r in got.collect()}
    e = {(r["query_id"], r["neighbor_id"]): r["cos_sim"] for r in exact.collect()}
    assert g and set(g) == set(e)
    for key, v in g.items():
        assert v == pytest.approx(e[key], abs=1e-9)


def test_rerank_deep_equals_exact_ivf(spark):
    """With rerank_depth >= the cell size, IVF-PQ+R rescored EVERY
    candidate exactly — the result must equal plain exact-scored IVF."""
    df = _block_corpus(spark, n=30)
    q = df.where(F.col("vec_id") < 6)
    pq_res = pq.topk_cosine_ivf_pq(
        df, q, "vec_id", "embedding",
        n_centroids=2, coarse_iters=1, m=2, pq_k=4, pq_iters=1, k=3,
        rerank_depth=1000,
    )
    ivf_res = similarity.topk_cosine_ivf_kmeans(
        df, q, "vec_id", "embedding", n_centroids=2, n_iters=1, k=3
    )
    got = sorted(map(tuple, pq_res.collect()))
    want = sorted(map(tuple, ivf_res.collect()))
    assert got == want


def test_fused_trainer_bitwise_matches_separate(spark):
    """_train_coarse_and_pq fuses the coarse + subspace Lloyd loops into
    one job per round; the driver-side results must be BIT-identical to
    the two separate trainers (the fusion is job-level only — same
    seeds, same assignment arithmetic, same exact aggregation)."""
    rows = [
        (i, [((i * 7 + j * 13) % 11) / 3.0 - 1.0 for j in range(8)])
        for i in range(40)
    ]
    df = _vecs(spark, rows, dim=8)
    pairs_sep = similarity.kmeans_centroid_pairs(
        df, "vec_id", "embedding", n_centroids=4, n_iters=2
    )
    books_sep = pq.pq_train_codebook(
        df, "vec_id", "embedding", m=2, pq_k=4, n_iters=2
    )
    pairs_f, books_f = pq._train_coarse_and_pq(
        df, "vec_id", "embedding",
        n_centroids=4, coarse_iters=2, m=2, pq_k=4, pq_iters=2, round_digits=6,
    )
    assert pairs_f == pairs_sep
    assert books_f == books_sep


def test_fused_trainer_unequal_iters_falls_back(spark):
    """coarse_iters != pq_iters takes the separate-trainer fallback and
    must still return the identical (pairs, books)."""
    df = _block_corpus(spark)
    pairs_f, books_f = pq._train_coarse_and_pq(
        df, "vec_id", "embedding",
        n_centroids=2, coarse_iters=1, m=2, pq_k=4, pq_iters=2, round_digits=6,
    )
    assert pairs_f == similarity.kmeans_centroid_pairs(
        df, "vec_id", "embedding", n_centroids=2, n_iters=1
    )
    assert books_f == pq.pq_train_codebook(
        df, "vec_id", "embedding", m=2, pq_k=4, n_iters=2
    )
