"""Retrieval ranking metrics (operators/ranking.py): nDCG@k / MRR /
P@k / R@k against hand-computed references, graded relevance, the
zero-IDCG guard, and partition invariance."""

import math

import pytest

from lightfusion_spark.operators import ranking as rk


def _g(pos):
    return round(1.0 / math.log2(pos + 1), 6)


RESULTS = [
    # q1: gold {a,b,c}; hits at rank 1 and 3
    (1, "a", 1), (1, "x", 2), (1, "b", 3),
    # q2: gold {d}; hit at rank 3
    (2, "x", 1), (2, "y", 2), (2, "d", 3),
    # q3: gold {e,f}; full miss
    (3, "p", 1),
    # q4 appears in results but NOT in gold -> ignored entirely
    (4, "z", 1),
]
GOLD = [(1, "a"), (1, "b"), (1, "c"), (2, "d"), (3, "e"), (3, "f")]


def _frames(spark):
    res = spark.createDataFrame(RESULTS, "q long, item string, rank long")
    gold = spark.createDataFrame(GOLD, "q long, item string")
    return res, gold


def test_per_query_matches_hand_computation(spark):
    res, gold = _frames(spark)
    per = {
        r["q"]: r.asDict()
        for r in rk.ranking_report_per_query(
            res, gold, "q", "item", "rank", k=3
        ).collect()
    }
    # only gold queries are graded; q4 (results-only) must be absent
    assert set(per) == {1, 2, 3}
    q1 = per[1]
    assert q1["n_gold"] == 3 and q1["n_hits_k"] == 2
    assert q1["rr6"] == 1.0
    assert q1["precision_k6"] == round(2 / 3, 6)
    assert q1["recall_k6"] == round(2 / 3, 6)
    dcg1, idcg1 = _g(1) + _g(3), _g(1) + _g(2) + _g(3)
    assert q1["dcg6"] == dcg1 and q1["idcg6"] == idcg1
    assert q1["ndcg6"] == round(dcg1 / idcg1, 6)
    q2 = per[2]
    assert q2["rr6"] == round(1 / 3, 6) and q2["recall_k6"] == 1.0
    assert q2["ndcg6"] == round(_g(3) / _g(1), 6)
    q3 = per[3]
    # full miss: every metric 0, but idcg is the ideal of its 2 golds
    assert q3["n_hits_k"] == 0 and q3["rr6"] == 0.0
    assert q3["ndcg6"] == 0.0 and q3["idcg6"] == _g(1) + _g(2)


def test_corpus_report_macro_micro_and_invariance(spark):
    res, gold = _frames(spark)
    rep = rk.ranking_report(res, gold, "q", "item", "rank", k=3)
    got = rep.collect()[0].asDict()
    assert got["k"] == 3 and got["n_queries"] == 3
    assert got["n_hits_total"] == 3 and got["n_gold_total"] == 6
    assert got["micro_recall6"] == 0.5
    assert got["mrr6"] == round((1.0 + round(1 / 3, 6) + 0.0) / 3, 6)
    assert got["n_ndcg_ungraded"] == 0
    # partition invariance: DECIMAL sums make the macro means exact
    again = (
        rk.ranking_report(
            res.repartition(7), gold.repartition(5), "q", "item", "rank", k=3
        )
        .collect()[0]
        .asDict()
    )
    assert again == got


def test_graded_relevance_and_zero_idcg_guard(spark):
    res = spark.createDataFrame(
        [(1, "a", 1), (1, "x", 2), (1, "b", 3), (9, "a", 1)],
        "q long, item string, rank long",
    )
    gold = spark.createDataFrame(
        [(1, "a", 2.0), (1, "b", 1.0), (1, "c", 0.0), (9, "a", 0.0)],
        "q long, item string, rel double",
    )
    per = {
        r["q"]: r.asDict()
        for r in rk.ranking_report_per_query(
            res, gold, "q", "item", "rank", k=3, rel_col="rel"
        ).collect()
    }
    q1 = per[1]
    # grade-0 gold rows are judged-irrelevant: not hits, don't stop RR
    assert q1["n_hits_k"] == 2 and q1["rr6"] == 1.0
    dcg = round(2 / _g_inv(1), 6) + round(1 / _g_inv(3), 6)
    idcg = round(2 / _g_inv(1), 6) + round(1 / _g_inv(2), 6) + 0.0
    assert q1["dcg6"] == dcg and q1["idcg6"] == idcg
    assert q1["ndcg6"] == round(dcg / idcg, 6)
    # all-zero grades: idcg 0 -> ndcg NULL (undefined, not 0)
    q9 = per[9]
    assert q9["idcg6"] == 0.0 and q9["ndcg6"] is None
    rep = rk.ranking_report(
        res, gold, "q", "item", "rank", k=3, rel_col="rel"
    ).collect()[0]
    assert rep["n_ndcg_ungraded"] == 1
    # the ungraded query is excluded from the mean, not zero-filled
    assert rep["mean_ndcg6"] == q1["ndcg6"]


def _g_inv(pos):
    return math.log2(pos + 1)


def test_k_validation():
    with pytest.raises(ValueError, match="k must"):
        rk.ranking_report_per_query(None, None, "q", "i", "r", k=0)


def test_ndcg_grades_ann_against_exact_ground_truth(spark, sf_dir):
    """The integration the module exists for: grade the repo's own
    IVF approximate search against the exact brute-force ground truth
    with ranking metrics.  Exact top-k is its own gold (nDCG/MRR/
    recall exactly 1); nprobe=1 IVF drops whole cells, so its nDCG
    lands strictly below 1 and at-or-below its own micro recall's
    ceiling — the number that turns nprobe tuning into an experiment
    (the recall@k face is pipe_sim_recall_ivf; this adds the
    rank-position-aware grade)."""
    import os

    from lightfusion_spark.operators import similarity

    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    queries = emb.where("vec_id % 20 = 0").limit(40)
    exact = similarity.topk_cosine(emb, queries, "vec_id", "embedding", k=3)
    approx = similarity.topk_cosine_ivf(
        emb, queries, "vec_id", "embedding", n_centroids=8, k=3
    )
    gold = exact.select("query_id", "neighbor_id")

    perfect = rk.ranking_report(
        exact, gold, "query_id", "neighbor_id", "rank", k=3
    ).collect()[0]
    assert perfect["mean_ndcg6"] == 1.0 and perfect["mrr6"] == 1.0
    assert perfect["micro_recall6"] == 1.0

    graded = rk.ranking_report(
        approx, gold, "query_id", "neighbor_id", "rank", k=3
    ).collect()[0]
    assert graded["n_queries"] == perfect["n_queries"]
    # nprobe=1 misses whole cells: strictly imperfect on this fixture
    assert graded["micro_recall6"] < 1.0
    assert 0.0 < graded["mean_ndcg6"] < 1.0
    # position-aware nDCG can't exceed 1, and MRR is bounded by hit rate
    assert graded["mrr6"] <= 1.0


def test_ranking_bootstrap_matches_independent_reference(spark):
    """Paired query-bootstrap for nDCG vs a shared-nothing reference
    (hashlib weights + hand nDCG): interval, win counts, and the
    full-mean == ranking_report.mean_ndcg6 identity."""
    import hashlib
    import math

    from lightfusion_spark.operators.evalmetrics import POISSON1_CDF_PPM

    # heterogeneous queries: varying gold sizes and hit depths
    res_a, res_b, gold = [], [], []
    for q in range(40):
        for r in range(1, 6):
            res_a.append((q, f"i{q}_{r}", r))
            # B reverses A's list
            res_b.append((q, f"i{q}_{6 - r}", r))
        for g in range(1 + q % 3):
            gold.append((q, f"i{q}_{1 + g}"))
    ra = spark.createDataFrame(res_a, "q long, item string, rank long")
    rb = spark.createDataFrame(res_b, "q long, item string, rank long")
    gd = spark.createDataFrame(gold, "q long, item string")
    got = (
        rk.ranking_paired_bootstrap(ra, rb, gd, "q", "item", "rank", k=5)
        .collect()[0]
        .asDict()
    )

    def g(pos):
        return round(1.0 / math.log2(pos + 1), 6)

    def ndcg(results, q, golds):
        hits = sorted(
            r for (qq, item, r) in results if qq == q and (q, item) in golds
        )
        dcg = sum(g(r) for r in hits)
        idcg = sum(g(i + 1) for i in range(min(5, len([1 for (qq, _) in golds if qq == q]))))
        return round(round(dcg, 6) / round(idcg, 6), 6) if idcg else None

    golds = set(gold)
    per = {}
    for q in range(40):
        per[q] = (ndcg(res_a, q, golds), ndcg(res_b, q, golds))

    def weight(q, b, seed=7):
        h6 = (
            int(hashlib.md5(f"{seed}:{q}:{b}".encode()).hexdigest()[:14], 16)
            % 1_000_000
        )
        for k_, t in enumerate(POISSON1_CDF_PPM):
            if h6 < t:
                return k_
        return len(POISSON1_CDF_PPM)

    from decimal import Decimal

    deltas = []
    for b in range(32):
        wa = wb = Decimal(0)
        ws = 0
        for q, (na, nb) in per.items():
            w = weight(q, b)
            wa += Decimal(str(na)) * w
            wb += Decimal(str(nb)) * w
            ws += w
        da = round(float(wa) / ws, 6) if ws else None
        db = round(float(wb) / ws, 6) if ws else None
        deltas.append(round(da - db, 6))
    deltas.sort()
    assert got["n_queries"] == 40 and got["n_queries_ungraded"] == 0
    assert got["delta_lo6"] == deltas[0] and got["delta_hi6"] == deltas[31]
    assert got["n_delta_pos"] == sum(1 for d in deltas if d > 0)
    # A's gold always sits at the top ranks: it wins every world
    assert got["p_a_better6"] == 1.0 and got["delta6"] > 0
    # full means equal ranking_report's macro mean (same formula, same
    # universe because gold is shared)
    rep_a = rk.ranking_report(ra, gd, "q", "item", "rank", k=5).collect()[0]
    assert got["ndcg_a6"] == rep_a["mean_ndcg6"]


def test_duplicate_result_items_collapse_to_best_rank(spark):
    """The r13 judge's contract finding: duplicate (query, item) rows
    inside the top k used to multiply through the inner hit join and
    silently inflate n_hits_k/dcg6.  The guard collapses the top-k
    slice to each item's BEST (minimum) rank — metrics must equal the
    clean single-occurrence run exactly."""
    gold = spark.createDataFrame([(1, "a"), (1, "b")], "q long, item string")
    clean = spark.createDataFrame(
        [(1, "a", 1), (1, "x", 2), (1, "b", 3)], "q long, item string, rank long"
    )
    dirty = spark.createDataFrame(
        # "a" appears at ranks 1 AND 2; "b" at 3 twice
        [(1, "a", 1), (1, "a", 2), (1, "b", 3), (1, "b", 3)],
        "q long, item string, rank long",
    )
    want = rk.ranking_report_per_query(clean, gold, "q", "item", "rank", k=3)
    got = rk.ranking_report_per_query(dirty, gold, "q", "item", "rank", k=3)
    w, g = want.collect()[0].asDict(), got.collect()[0].asDict()
    assert g["n_hits_k"] == 2 == w["n_hits_k"]
    assert g["dcg6"] == w["dcg6"] and g["ndcg6"] == w["ndcg6"]
    assert g["rr6"] == w["rr6"] == 1.0


def _policy_frames(spark):
    import pyspark.sql.functions as F  # noqa: F401

    res = spark.createDataFrame(
        [
            ("p1", 1, "a", 1), ("p1", 1, "x", 2), ("p1", 1, "b", 3),
            ("p1", 2, "d", 1),
            ("p2", 1, "x", 1), ("p2", 1, "a", 2), ("p2", 3, "e", 1),
        ],
        "pol string, q long, item string, rank long",
    )
    gold = spark.createDataFrame(
        [(1, "a"), (1, "b"), (2, "d"), (3, "e"), (3, "f")],
        "q long, item string",
    )
    return res, gold


def test_ranking_grouped_matches_per_slice_on_full_gold_universe(spark):
    """ranking_report(group_col=...) — the N-policy leaderboard —
    equals ranking_report over each policy's results bit for bit, and
    EVERY policy is graded on the FULL gold query set: p2 returned
    nothing for query 2, which must grade as a full miss (a row with
    0 hits), not a missing row."""
    from pyspark.sql import functions as F

    res, gold = _policy_frames(spark)
    by = {
        r["pol"]: r.asDict()
        for r in rk.ranking_report(
            res, gold, "q", "item", "rank", k=3, group_col="pol"
        ).collect()
    }
    assert set(by) == {"p1", "p2"}
    for p in by:
        want = rk.ranking_report(
            res.where(F.col("pol") == p).drop("pol"),
            gold, "q", "item", "rank", k=3,
        ).collect()[0].asDict()
        got = dict(by[p])
        got.pop("pol")
        assert got == want
    # both policies graded over ALL 3 gold queries
    assert by["p1"]["n_queries"] == 3 and by["p2"]["n_queries"] == 3
    per = {
        (r["pol"], r["q"]): r.asDict()
        for r in rk.ranking_report_per_query(
            res, gold, "q", "item", "rank", k=3, group_col="pol"
        ).collect()
    }
    assert per[("p2", 2)]["n_hits_k"] == 0  # full miss present, graded 0


def test_ranking_store_matches_one_shot_and_replay_is_no_op(spark, tmp_path):
    """Maintained ranking store: per-batch cells (exact integer totals
    + DECIMAL(18,6) metric sums) are additive over disjoint query
    sets, so the store report equals ranking_report over the union of
    all batches; a batch-id replay is collapsed by the MAX read."""
    from pyspark.sql import functions as F

    res, gold = _policy_frames(spark)
    res = res.where(F.col("pol") == "p1").drop("pol")
    state_dir = str(tmp_path / "rk_state")
    b0r, b0g = res.where("q = 1"), gold.where("q = 1")
    b1r, b1g = res.where("q > 1"), gold.where("q > 1")
    rk.ranking_append_batch(b0r, b0g, state_dir, 0, "q", "item", "rank", k=3)
    rk.ranking_append_batch(b1r, b1g, state_dir, 1, "q", "item", "rank", k=3)
    before = rk.ranking_from_store(spark, state_dir).collect()[0].asDict()
    rk.ranking_append_batch(  # replay under the original id
        b1r, b1g, state_dir, 1, "q", "item", "rank", k=3
    )
    after = rk.ranking_from_store(spark, state_dir).collect()[0].asDict()
    assert after == before
    want = rk.ranking_report(res, gold, "q", "item", "rank", k=3)
    assert before == want.collect()[0].asDict()
