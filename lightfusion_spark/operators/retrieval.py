"""Hybrid retrieval: lexical (BM25) + vector (cosine) candidate lists
fused by Reciprocal Rank Fusion.

RRF (Cormack, Clarke & Büttcher, SIGIR 2009 — "Reciprocal rank fusion
outperforms Condorcet and individual rank learning methods") is the
standard way modern retrieval stacks combine a keyword index with an
embedding index: each source contributes ``1/(rrf_k + rank)`` for every
document it ranks, scores add across sources, and the constant
(canonically 60) damps the head so a document ranked well by BOTH
sources beats one ranked first by only one.  Rank-based fusion needs no
score calibration between BM25's unbounded sums and cosine's [-1, 1] —
exactly why it won.

Training-data relevance: hybrid "more-like-this" selection (seed
documents → lexically AND semantically similar corpus slices) and
decontamination review queues both want the fused view, not either
single ranking.

Determinism discipline (registry rules): both input rankings are
already exact (BM25 sums micro-ints; cosine ROUND(...,6) with id
tiebreaks), each RRF term ``1/(rrf_k + rank)`` is one IEEE division of
exact integers, the two terms add in a FIXED order (lexical + vector),
and the fused score rounds to 6 before the final ranking — so the
DuckDB oracle replays the whole fusion hash-exactly.

Scale (100 TB): each source produces |queries| × depth rows; the fusion
is one full outer join on (query, doc) between two depth-bounded lists
plus a per-query top-k window — the corpus is only touched by the
sources themselves (BM25's pruned token stream, the vector search's
chosen ANN path).  Swap ``topk_cosine`` for any ``topk_cosine_*``
variant at scale; the fusion is source-agnostic by construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .similarity import topk_cosine
from .text import bm25_scores_multi


def rrf_fuse(
    rankings: list[DataFrame],
    query_col: str = "query_id",
    id_col: str = "doc_id",
    rank_col: str = "rank",
    k: int = 5,
    rrf_k: int = 60,
) -> DataFrame:
    """Fuse ranked lists by RRF: each input is ``(query, id, rank)``;
    output is ``(query, id, rrf_score, rank)`` with the per-query top
    ``k`` by ``round(Σ 1/(rrf_k + rank_i), 6)``, doc-id tiebroken.
    The terms add in INPUT-LIST ORDER (fixed, so the float sum is
    reproducible); lists are full-outer-merged, so a document missing
    from one list simply contributes nothing for it."""
    if not rankings:
        raise ValueError("rrf_fuse: need at least one ranking")
    if rrf_k < 1:
        raise ValueError(f"rrf_fuse: rrf_k must be >= 1, got {rrf_k}")
    merged = None
    for i, r in enumerate(rankings):
        side = r.select(
            F.col(query_col).alias("_q"),
            F.col(id_col).alias("_d"),
            F.col(rank_col).alias(f"_r{i}"),
        )
        if merged is None:
            merged = side
        else:
            merged = (
                merged.join(side, ["_q", "_d"], "full_outer")
            )
    terms = [
        F.coalesce(
            F.lit(1.0) / (F.lit(rrf_k) + F.col(f"_r{i}")), F.lit(0.0)
        )
        for i in range(len(rankings))
    ]
    score = terms[0]
    for t in terms[1:]:
        score = score + t
    scored = merged.select(
        F.col("_q").alias(query_col),
        F.col("_d").alias(id_col),
        F.round(score, 6).alias("rrf_score"),
    )
    w = Window.partitionBy(query_col).orderBy(
        F.col("rrf_score").desc(), F.col(id_col)
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(query_col, id_col, "rrf_score", "rank")
    )


def hybrid_topk_rrf(
    corpus_text: DataFrame,
    corpus_vec: DataFrame,
    query_terms: DataFrame,
    query_vec: DataFrame,
    text_id_col: str = "doc_id",
    text_col: str = "text",
    vec_id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_col: str = "query_id",
    term_col: str = "term",
    k: int = 5,
    depth: int = 10,
    rrf_k: int = 60,
    exclude_self: bool = True,
) -> DataFrame:
    """End-to-end hybrid search: per-query BM25 over ``corpus_text``
    (terms from ``query_terms``) and cosine over ``corpus_vec``
    (queries from ``query_vec``), each cut to a ``depth``-deep ranked
    list, RRF-fused to the top ``k``.

    ``exclude_self`` drops the query's own document from the LEXICAL
    list (a seed document trivially tops its own keyword search; the
    cosine side already excludes identical ids) so "more-like-this"
    results are actually other documents.  Doc ids are assumed shared
    between the text and vector corpora (the usual layout: one row per
    document, embedding landed next to text).
    """
    lex = bm25_scores_multi(
        corpus_text, text_id_col, text_col, query_terms, query_col, term_col
    )
    if exclude_self:
        lex = lex.where(F.col(query_col) != F.col(text_id_col))
    wl = Window.partitionBy(query_col).orderBy(
        F.col("bm25").desc(), F.col(text_id_col)
    )
    lexd = (
        lex.withColumn("rank", F.row_number().over(wl))
        .where(F.col("rank") <= depth)
        .select(
            query_col, F.col(text_id_col).alias("doc_id"), "rank"
        )
    )
    vec = topk_cosine(
        corpus_vec, query_vec, vec_id_col, vec_col, k=depth
    ).select(
        F.col("query_id").alias(query_col),
        F.col("neighbor_id").alias("doc_id"),
        "rank",
    )
    return rrf_fuse(
        [lexd, vec], query_col=query_col, id_col="doc_id", k=k, rrf_k=rrf_k
    )
