"""operators/retrieval.py: RRF hybrid search.  The registered oracle
pins exact replay; these tests pin the fusion SEMANTICS — rank-based
scoring, missing-source handling, both-sources-beat-one — and the
multi-query BM25 surface it rides on."""

import pytest
from pyspark.sql import functions as F

from lightfusion_spark.operators import retrieval, text as text_ops

SF_DIR = "/root/testdata/sf0.001"


def _ranking(spark, rows):
    return spark.createDataFrame(rows, "query_id long, doc_id long, rank int")


def test_rrf_fuse_scores_and_ties(spark):
    lex = _ranking(spark, [(1, 10, 1), (1, 11, 2), (1, 12, 3)])
    vec = _ranking(spark, [(1, 11, 1), (1, 13, 2), (1, 10, 3)])
    out = {
        r["doc_id"]: (r["rrf_score"], r["rank"])
        for r in retrieval.rrf_fuse([lex, vec], k=4).collect()
    }
    # doc 11: 1/62 + 1/61; doc 10: 1/61 + 1/63; doc 12: 1/63; doc 13: 1/62
    assert out[11][0] == round(1 / 62 + 1 / 61, 6)
    assert out[10][0] == round(1 / 61 + 1 / 63, 6)
    assert out[12][0] == round(1 / 63, 6)
    assert out[13][0] == round(1 / 62, 6)
    # both-sources docs beat single-source docs; ranks follow scores
    assert out[11][1] == 1 and out[10][1] == 2
    assert out[13][1] == 3 and out[12][1] == 4  # 1/62 > 1/63


def test_rrf_fuse_guards(spark):
    with pytest.raises(ValueError, match="at least one"):
        retrieval.rrf_fuse([])
    with pytest.raises(ValueError, match="rrf_k"):
        retrieval.rrf_fuse([_ranking(spark, [(1, 1, 1)])], rrf_k=0)


def test_bm25_multi_matches_single_query_operator(spark):
    """Per query, the multi-query surface must equal the single-query
    operator's nonzero scores exactly (same math, different plumbing)."""
    d = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    qt = spark.createDataFrame(
        [(0, "spark"), (0, "join"), (1, "vector"), (1, "data")],
        "query_id long, term string",
    )
    multi = {
        (r["query_id"], r["doc_id"]): r["bm25"]
        for r in text_ops.bm25_scores_multi(d, "doc_id", "text", qt).collect()
    }
    for qid, terms in ((0, ["spark", "join"]), (1, ["vector", "data"])):
        single = {
            r["doc_id"]: r["bm25"]
            for r in text_ops.bm25_scores(d, "doc_id", "text", terms)
            .where(F.col("bm25") > 0)
            .collect()
        }
        got = {doc: s for (q, doc), s in multi.items() if q == qid}
        assert got == single, qid


def test_hybrid_more_like_this_excludes_seed(spark):
    d = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    e = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    qt = spark.createDataFrame(
        [(0, "spark"), (0, "join"), (1, "vector"), (1, "data")],
        "query_id long, term string",
    )
    qv = e.where(F.col("vec_id") < 2)
    out = retrieval.hybrid_topk_rrf(d, e, qt, qv, k=5, depth=10).collect()
    assert all(r["doc_id"] != r["query_id"] for r in out)
    per_q = {}
    for r in out:
        per_q.setdefault(r["query_id"], []).append(r)
    assert set(per_q) == {0, 1}
    for rows in per_q.values():
        assert len(rows) == 5
        ranks = sorted(r["rank"] for r in rows)
        assert ranks == [1, 2, 3, 4, 5]
        # scores non-increasing in rank
        by_rank = sorted(rows, key=lambda r: r["rank"])
        scores = [r["rrf_score"] for r in by_rank]
        assert scores == sorted(scores, reverse=True)


def test_rrf_fuse_matches_python_reference_on_random_rankings(spark):
    """Seeded-random many-query fusion vs an independent python
    reference (dict-merge + sort) — one Spark job, exact equality."""
    import random

    rng = random.Random(17)
    lex_rows, vec_rows = [], []
    for q in range(25):
        docs = rng.sample(range(1000), 12)
        for r, d in enumerate(docs[:8], start=1):
            lex_rows.append((q, d, r))
        vdocs = rng.sample(docs, 6) + rng.sample(range(1000, 1100), 4)
        for r, d in enumerate(vdocs, start=1):
            vec_rows.append((q, d, r))
    lex = _ranking(spark, lex_rows)
    vec = _ranking(spark, vec_rows)
    got = {
        (r["query_id"], r["rank"]): (r["doc_id"], r["rrf_score"])
        for r in retrieval.rrf_fuse([lex, vec], k=5).collect()
    }

    # independent reference
    ref = {}
    lex_idx = {(q, d): r for q, d, r in lex_rows}
    vec_idx = {(q, d): r for q, d, r in vec_rows}
    for q in range(25):
        scores = {}
        for (qq, d), r in lex_idx.items():
            if qq == q:
                scores[d] = scores.get(d, 0.0) + 1.0 / (60 + r)
        for (qq, d), r in vec_idx.items():
            if qq == q:
                scores[d] = scores.get(d, 0.0) + 1.0 / (60 + r)
        ranked = sorted(
            ((round(s, 6), d) for d, s in scores.items()),
            key=lambda t: (-t[0], t[1]),
        )[:5]
        for i, (s, d) in enumerate(ranked, start=1):
            ref[(q, i)] = (d, s)
    assert got == ref
