"""operators/pca.py + similarity.project_jl: the linear-algebra pair —
distributed covariance/power-iteration PCA and Johnson-Lindenstrauss
projection.  The registered oracles pin exact replay; these tests pin the
MATH (agreement with numpy's dense solutions) and partition invariance."""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from lightfusion_spark.operators import pca, similarity


def _vec_df(spark, mat, ids=None):
    ids = ids if ids is not None else range(len(mat))
    return spark.createDataFrame(
        [(int(i), [float(x) for x in row]) for i, row in zip(ids, mat)],
        "vec_id long, embedding array<double>",
    )


@pytest.fixture(scope="module")
def aniso(spark):
    """Deterministic anisotropic cloud: one dominant direction."""
    rng = np.random.RandomState(7)
    base = rng.standard_normal((200, 8))
    base[:, 0] *= 6.0  # dominant variance along e0 (mixed by rotation below)
    q, _ = np.linalg.qr(rng.standard_normal((8, 8)))
    return base @ q


def test_covariance_matches_numpy(spark, aniso):
    df = _vec_df(spark, aniso)
    c, mu, n = pca.covariance_matrix(df, "embedding")
    assert n == 200
    np.testing.assert_allclose(mu, aniso.mean(axis=0), atol=1e-8)
    expected = np.cov(aniso, rowvar=False, bias=True)
    np.testing.assert_allclose(c, expected, atol=1e-6)
    # exact-arithmetic partition invariance: bit-identical, not just close
    c2, _, _ = pca.covariance_matrix(df.repartition(13), "embedding")
    assert (c == c2).all()


def test_pca_top_component_matches_dense_eig(spark, aniso):
    df = _vec_df(spark, aniso)
    got = pca.pca_top_component(df, "embedding", n_iters=8).collect()
    v = np.array([r["loading"] for r in sorted(got, key=lambda r: r["pos"])])
    lam = got[0]["eigenvalue"]
    c = np.cov(aniso, rowvar=False, bias=True)
    evals, evecs = np.linalg.eigh(c)
    top = evecs[:, -1]
    assert abs(float(v @ top)) / np.linalg.norm(v) > 0.999
    assert lam == pytest.approx(evals[-1], rel=1e-3)


def test_pca_empty_input(spark):
    df = _vec_df(spark, np.zeros((0, 4)))
    assert pca.pca_top_component(df, "embedding").count() == 0


def test_jl_projection_exact_and_partition_invariant(spark):
    rng = np.random.RandomState(3)
    mat = rng.standard_normal((50, 8)).round(6)
    df = _vec_df(spark, mat)
    got = {
        r["vec_id"]: r["embedding"]
        for r in similarity.project_jl(df, "vec_id", "embedding", out_dim=4).collect()
    }
    m = similarity.jl_projection_matrix(8, 4)
    # manual replication of the per-term scaled-int sum
    for i, row in enumerate(mat):
        terms = row[:, None] * m
        expect = np.floor(terms * 1e9 + 0.5).astype(np.int64).sum(axis=0) / 1e9
        assert got[i] == list(expect)
    again = {
        r["vec_id"]: r["embedding"]
        for r in similarity.project_jl(
            df.repartition(11), "vec_id", "embedding", out_dim=4
        ).collect()
    }
    assert again == got


def test_jl_preserves_pairwise_geometry(spark):
    """JL guarantee (loose check at small scale): projected pairwise
    squared distances stay within a broad multiplicative band."""
    rng = np.random.RandomState(11)
    mat = rng.standard_normal((40, 64))
    df = _vec_df(spark, mat)
    got = {
        r["vec_id"]: np.array(r["embedding"])
        for r in similarity.project_jl(df, "vec_id", "embedding", out_dim=16).collect()
    }
    ratios = []
    for a in range(0, 40, 5):
        for b in range(a + 1, 40, 7):
            d_in = float(np.sum((mat[a] - mat[b]) ** 2))
            d_out = float(np.sum((got[a] - got[b]) ** 2))
            ratios.append(d_out / d_in)
    r = np.array(ratios)
    assert 0.4 < r.mean() < 1.6
    assert (r > 0.15).all() and (r < 3.5).all()


def test_remove_component_orthogonalizes(spark, aniso):
    df = _vec_df(spark, aniso)
    v, lam, mu, n = pca.top_component_values(df, "embedding", n_iters=8)
    assert n == 200 and lam > 0
    stripped = {
        r["vec_id"]: np.array(r["embedding"])
        for r in pca.remove_component(df, "vec_id", "embedding", v, mean=mu).collect()
    }
    vv = np.array(v)
    resid = np.array([abs(float(x @ vv)) for x in stripped.values()])
    # projections on the removed direction collapse to ~0 (scaled-int
    # rounding leaves <=1e-6-scale residue)
    assert resid.max() < 1e-5
    # variance along the top direction is gone, the rest preserved
    x0 = aniso - aniso.mean(axis=0)
    before = float(np.var(x0 @ vv))
    total_before = float(np.sum(np.var(x0, axis=0)))
    total_after = float(np.sum(np.var(np.stack(list(stripped.values())), axis=0)))
    assert before > 0.3 * total_before  # the direction actually mattered
    assert total_after == pytest.approx(total_before - before, rel=1e-2)


def test_jl_rerank_recall_vs_exact(spark, sf_dir):
    """Measured agreement@3 of the JL shortlist+rerank against exact
    brute-force top-3 on the real embeddings fixture — the number that
    justifies the depth knob (and mirrors the IVF-PQ recall table)."""
    from lightfusion_spark.operators import similarity

    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = e.where(F.col("vec_id") < 20)
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in similarity.topk_cosine(e, q, "vec_id", "embedding", k=3).collect()
    }
    agreements = []
    for depth in (10, 50, 100):
        jl = {
            (r["query_id"], r["neighbor_id"])
            for r in similarity.topk_cosine_jl(
                e, q, "vec_id", "embedding", out_dim=16, depth=depth, k=3
            ).collect()
        }
        agreements.append(len(exact & jl) / len(exact))
    # Uniform random 64-d vectors are JL's true worst case (all cosines
    # ~N(0, 1/64): neighbor gaps sit below the 16-dim distortion), so
    # absolute agreement is modest by design — measured 0.22/0.47/0.65
    # at depth 10/50/100, the knob table recorded in SCALE.md.  Pin the
    # CLAIM: deeper shortlists recover strictly more, and depth-100
    # recovers most of the exact set even here.
    # non-decreasing with a strict overall gain: exact ties between
    # adjacent depths are possible on other corpora (CI runs this on
    # GENERATED embeddings), but deeper must never recover less, and the
    # full sweep of the knob must actually move the number
    assert agreements[0] <= agreements[1] <= agreements[2]
    assert agreements[2] > agreements[0]
    assert agreements[2] > 0.5, f"agreement@3 ladder {agreements}"


def test_pca_rejects_ragged_and_null_vectors(spark):
    """ADVICE r8: ragged vector lengths, NULL vector rows, and NULL
    ELEMENTS inside a vector must all raise loudly instead of feeding an
    arbitrary-position count (unordered collect) into every mean."""
    ragged = spark.createDataFrame(
        [(0, [1.0, 2.0]), (1, [1.0, 2.0, 3.0])],
        "vec_id long, embedding array<double>",
    )
    with pytest.raises(ValueError, match="ragged or NULL"):
        pca.column_means(ragged, "embedding")
    nullrow = spark.createDataFrame(
        [(0, [1.0, 2.0]), (1, None)], "vec_id long, embedding array<double>"
    )
    with pytest.raises(ValueError, match="ragged or NULL"):
        pca.column_means(nullrow, "embedding")
    allnull = spark.createDataFrame(
        [(0, None), (1, None)], "vec_id long, embedding array<double>"
    )
    with pytest.raises(ValueError, match="NULL/empty"):
        pca.column_means(allnull, "embedding")
    nullelem = spark.createDataFrame(
        [(0, [1.0, None]), (1, [1.0, 2.0])],
        "vec_id long, embedding array<double>",
    )
    with pytest.raises(ValueError, match="ragged or NULL"):
        pca.column_means(nullelem, "embedding")
    # the guard must not reject the healthy shape
    ok = spark.createDataFrame(
        [(0, [1.0, 2.0]), (1, [3.0, 4.0])], "vec_id long, embedding array<double>"
    )
    mu, n = pca.column_means(ok, "embedding")
    assert n == 2 and mu == [2.0, 3.0]
