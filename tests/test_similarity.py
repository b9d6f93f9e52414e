"""Unit tests for the similarity operators' edge cases the corpus oracle
queries can't isolate (error paths, guard rails)."""

import pytest

from lightfusion_spark.operators import similarity


def _vecs(spark, n):
    rows = [(i, [float(i), 1.0, 0.5]) for i in range(n)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_gemm_rejects_oversized_query_set(spark):
    corpus = _vecs(spark, 10)
    queries = _vecs(spark, 5)
    with pytest.raises(ValueError, match="max_query_rows"):
        similarity.topk_cosine_gemm(
            corpus, queries, k=2, max_query_rows=3
        )


def test_gemm_accepts_query_set_at_limit(spark):
    corpus = _vecs(spark, 10)
    queries = _vecs(spark, 3)
    out = similarity.topk_cosine_gemm(corpus, queries, k=2, max_query_rows=3)
    assert out.count() == 6  # 3 queries x k=2
