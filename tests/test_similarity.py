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


def test_bnlj_baseline_rejects_oversized_query_set(spark):
    """topk_cosine is the oracle-baseline BNLJ (|Q|x|C| pairs) — its
    query-side bound must trip before the plan executes, so no unbounded
    BNLJ variant is reachable (r3 verdict item 6)."""
    corpus = _vecs(spark, 10)
    queries = _vecs(spark, 5)
    with pytest.raises(ValueError, match="max_query_rows"):
        similarity.topk_cosine(corpus, queries, k=2, max_query_rows=3)


def test_bnlj_baseline_accepts_query_set_at_limit(spark):
    corpus = _vecs(spark, 10)
    queries = _vecs(spark, 3)
    out = similarity.topk_cosine(corpus, queries, k=2, max_query_rows=3)
    assert out.count() == 6  # 3 queries x k=2


def test_gemm_accepts_query_set_at_limit(spark):
    corpus = _vecs(spark, 10)
    queries = _vecs(spark, 3)
    out = similarity.topk_cosine_gemm(corpus, queries, k=2, max_query_rows=3)
    assert out.count() == 6  # 3 queries x k=2


def test_semantic_dedup_min_id_survivor(spark):
    # two identical-direction pairs + one orthogonal singleton
    rows = [
        (1, [1.0, 0.0]),
        (2, [2.0, 0.0]),   # cos=1 with id 1 -> dup
        (3, [0.0, 1.0]),
        (4, [0.0, 5.0]),   # cos=1 with id 3 -> dup
        (5, [1.0, 1.0]),   # cos ~0.707 to both axes -> kept at 0.99
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = {
        r["vec_id"]: r["is_dup"]
        for r in similarity.semantic_dedup(
            df, n_centroids=1, n_iters=1, threshold=0.99
        ).collect()
    }
    assert out == {1: False, 2: True, 3: False, 4: True, 5: False}


def test_assign_inline_rejects_oversized_quantizer(spark):
    df = _vecs(spark, 3)
    pairs = [(i, [1.0, 0.0, 0.0]) for i in range(5)]
    with pytest.raises(ValueError, match="inline cap"):
        similarity._assign_inline(df, pairs * 20000, "vec_id", "embedding", 6)


def test_semantic_dedup_gemm_matches_sql_pair_scan(spark):
    rows = [
        (1, [1.0, 0.0]),
        (2, [2.0, 0.0]),
        (3, [0.0, 1.0]),
        (4, [0.0, 5.0]),
        (5, [1.0, 1.0]),
        (6, [1.0, 0.01]),  # near-parallel to id 1 — exercises the threshold edge
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    kw = dict(n_centroids=2, n_iters=1, threshold=0.99)
    gemm = {
        (r["vec_id"], r["centroid_id"], r["is_dup"])
        for r in similarity.semantic_dedup(df, use_gemm=True, **kw).collect()
    }
    sql = {
        (r["vec_id"], r["centroid_id"], r["is_dup"])
        for r in similarity.semantic_dedup(df, use_gemm=False, **kw).collect()
    }
    assert gemm == sql


def test_quantize_roundtrip_bounds(spark):
    rows = [(1, [0.5, -0.25, 0.0]), (2, [1.5, -2.0, 0.99])]  # id 2 clips twice
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = {r["vec_id"]: r for r in similarity.quantize_embeddings(df).collect()}
    assert out[1]["n_clipped"] == 0 and out[2]["n_clipped"] == 2
    assert out[2]["q"][0] == 127 and out[2]["q"][1] == -127
    # reconstruction error within clip/254 per unclipped element
    q1 = out[1]["q"]
    for orig, q in zip(rows[0][1], q1):
        assert abs(orig - q / 127.0) <= 1.0 / 254 + 1e-12


def test_quantized_topk_agrees_with_exact_on_separated_data(spark):
    # well-separated directions: int8 noise cannot reorder the top-1
    rows = [(i, [1.0 if j == i % 4 else 0.01 for j in range(4)]) for i in range(8)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in similarity.topk_cosine_gemm(df, df.where("vec_id < 2"), k=1).collect()
    }
    quant = {
        (r["query_id"], r["neighbor_id"])
        for r in similarity.topk_cosine_quantized(df, df.where("vec_id < 2"), k=1).collect()
    }
    assert exact == quant


def test_kmeans_fast_reduce_matches_exact_assignments(spark):
    df = _vecs(spark, 40)
    kw = dict(n_centroids=4, n_iters=2)
    exact = similarity.kmeans_centroids(df, "vec_id", "embedding", exact_reduce=True, **kw)
    fast = similarity.kmeans_centroids(df, "vec_id", "embedding", exact_reduce=False, **kw)
    a_e = {
        (r["vec_id"], r["centroid_id"])
        for r in similarity.assign_to_centroids(df, exact, "vec_id", "embedding").collect()
    }
    a_f = {
        (r["vec_id"], r["centroid_id"])
        for r in similarity.assign_to_centroids(df, fast, "vec_id", "embedding").collect()
    }
    assert a_e == a_f


def test_ivf_probe_all_cells_equals_exact(spark):
    """nprobe = n_centroids degenerates IVF to exact search: every query
    probes every cell, so results must equal the brute-force baseline —
    the recall knob's boundary condition."""
    import math

    rows = [
        (i, [math.sin(i * 1.7 + j) for j in range(8)]) for i in range(40)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    q = df.where("vec_id < 5")
    exact = {
        tuple(r)
        for r in similarity.topk_cosine(df, q, k=3).collect()
    }
    probed = {
        tuple(r)
        for r in similarity.topk_cosine_ivf_probe(
            df, q, n_centroids=4, nprobe=4, k=3
        ).collect()
    }
    assert probed == exact


def test_ivf_probe2_expands_candidates(spark):
    """nprobe=2 candidate sets contain the nprobe=1 cells' candidates."""
    import math

    rows = [
        (i, [math.cos(i * 0.9 + j * 0.3) for j in range(8)]) for i in range(40)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    q = df.where("vec_id < 5")
    one = similarity.topk_cosine_ivf(df, q, n_centroids=8, k=3)
    two = similarity.topk_cosine_ivf_probe(df, q, n_centroids=8, nprobe=2, k=3)
    # recall can only improve: every query's top-1 similarity under
    # nprobe=2 is >= its top-1 under nprobe=1
    best1 = {r["query_id"]: r["cos_sim"] for r in one.where("rank = 1").collect()}
    best2 = {r["query_id"]: r["cos_sim"] for r in two.where("rank = 1").collect()}
    assert set(best1) <= set(best2)
    assert all(best2[qid] >= best1[qid] for qid in best1)


def test_recall_report(spark):
    from pyspark.sql import functions as F

    from lightfusion_spark.operators import similarity

    # exact: q1 -> {a,b,c}; q2 -> {a,b}  |  approx: q1 hits a,b; q2 hits none
    exact = spark.createDataFrame(
        [(1, "a", 1), (1, "b", 2), (1, "c", 3), (2, "a", 1), (2, "b", 2)],
        "query_id long, neighbor_id string, rank int",
    )
    approx = spark.createDataFrame(
        [(1, "a", 1), (1, "b", 2), (1, "x", 3), (2, "y", 1), (2, "z", 2)],
        "query_id long, neighbor_id string, rank int",
    )
    (row,) = similarity.recall_report(approx, exact, k=3).collect()
    assert (row["k"], row["n_queries"], row["n_hits"], row["n_exact"]) == (3, 2, 2, 5)
    assert row["micro_recall"] == 0.4
    # macro: mean(2/3, 0/2) = 0.333333 (rounded per query first)
    assert row["macro_recall"] == round((0.666667 + 0.0) / 2, 6)

    # rank > k rows are ignored: evaluating the same frames at k=1
    (row1,) = similarity.recall_report(approx, exact, k=1).collect()
    assert (row1["n_hits"], row1["n_exact"]) == (1, 2)
    assert row1["micro_recall"] == 0.5


def test_banded_lsh_rejects_bad_table_split(spark):
    corpus = _vecs(spark, 4)
    planes = similarity.random_hyperplanes(n_planes=5, dim=3, seed=1)
    with pytest.raises(ValueError, match="divisible"):
        similarity.topk_cosine_lsh_banded(corpus, corpus, planes, n_tables=2)


def test_banded_lsh_finds_identical_direction_neighbors(spark):
    """Vectors pointing the same way agree on every sign bit in every
    table, so they MUST be candidates regardless of plane draw — and the
    result ranks them first."""
    rows = [
        (1, [1.0, 0.0, 0.0]),
        (2, [3.0, 0.0, 0.0]),   # same direction as 1
        (3, [0.0, 1.0, 0.0]),
        (4, [0.0, 4.0, 0.0]),   # same direction as 3
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    planes = similarity.random_hyperplanes(n_planes=8, dim=3, seed=3)
    out = similarity.topk_cosine_lsh_banded(df, df, planes, n_tables=4, k=1)
    top = {r["query_id"]: r["neighbor_id"] for r in out.collect()}
    assert top[1] == 2 and top[2] == 1 and top[3] == 4 and top[4] == 3


def test_banded_lsh_scores_each_candidate_once(spark):
    """A pair colliding in MANY tables must appear once in the scored
    output (the distinct happens on the id-only candidate relation)."""
    rows = [(1, [1.0, 0.0]), (2, [2.0, 0.0]), (3, [1.5, 0.0])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    planes = similarity.random_hyperplanes(n_planes=8, dim=2, seed=5)
    out = similarity.topk_cosine_lsh_banded(df, df, planes, n_tables=4, k=10)
    pairs = [(r["query_id"], r["neighbor_id"]) for r in out.collect()]
    assert len(pairs) == len(set(pairs))


def test_banded_lsh_beats_single_table_recall(spark):
    """The reason the operator exists: OR-of-ANDs recall >= the single
    table's on the same total plane budget (here, strictly greater)."""
    import numpy as np

    rng = np.random.default_rng(11)
    rows = [(i, [float(x) for x in rng.normal(0, 1, 16)]) for i in range(120)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    q = df.where("vec_id < 15")
    exact = similarity.topk_cosine(df, q, k=3)
    planes = similarity.random_hyperplanes(n_planes=16, dim=16, seed=7)
    banded = similarity.topk_cosine_lsh_banded(df, q, planes, n_tables=4, k=3)
    single = similarity.topk_cosine_lsh(df, q, planes, k=3)
    rb = similarity.recall_report(banded, exact, 3).collect()[0]
    rs = similarity.recall_report(single, exact, 3).collect()[0]
    assert float(rb["micro_recall"]) > float(rs["micro_recall"])
    assert float(rb["micro_recall"]) >= 0.5


def test_hard_negatives_excludes_self_and_positive(spark):
    """The mined negatives must never contain the query itself or its
    declared positive, and ranks must stay dense after the exclusion."""
    import numpy as np

    rng = np.random.RandomState(3)
    rows = [(i, [float(x) for x in rng.standard_normal(8)]) for i in range(40)]
    e = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    pairs = spark.createDataFrame(
        [(0, 1), (2, 3)], "query_id long, positive_id long"
    )
    out = similarity.hard_negatives(
        e, pairs, "vec_id", "embedding", k=3, n_centroids=2, n_iters=1
    ).collect()
    assert out
    for r in out:
        assert r["negative_id"] != r["query_id"]
        assert r["negative_id"] != r["positive_id"]
    by_q = {}
    for r in out:
        by_q.setdefault((r["query_id"], r["positive_id"]), []).append(r["rank"])
    for ranks in by_q.values():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))  # dense


def test_truncate_embeddings_renorm_and_zero(spark):
    df = spark.createDataFrame(
        [(1, [3.0, 4.0, 100.0]), (2, [0.0, 0.0, 9.0])],
        "vec_id long, embedding array<double>",
    )
    rows = {
        r["vec_id"]: r["embedding"]
        for r in similarity.truncate_embeddings(df, "embedding", 2).collect()
    }
    assert rows[1] == pytest.approx([0.6, 0.8])  # renormed 3-4-5 triangle
    assert rows[2] == [0.0, 0.0]  # zero prefix stays zero, no NaN
    raw = {
        r["vec_id"]: r["embedding"]
        for r in similarity.truncate_embeddings(
            df, "embedding", 2, renormalize=False
        ).collect()
    }
    assert raw[1] == [3.0, 4.0]
    with pytest.raises(ValueError, match="dim"):
        similarity.truncate_embeddings(df, "embedding", 0)


def test_knn_graph_and_clusters(spark, sf_dir):
    from lightfusion_spark.operators import similarity as sim

    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    edges = sim.knn_graph(e, "vec_id", "embedding", k=3, n_centroids=8)
    rows = edges.collect()
    n = e.count()
    # at most k edges per vector, no self-loops
    assert len(rows) <= 3 * n
    assert all(r["id_a"] != r["id_b"] for r in rows)
    from collections import Counter

    out_deg = Counter(r["id_a"] for r in rows)
    assert max(out_deg.values()) <= 3
    # a similarity floor only removes edges
    thinner = sim.knn_graph(
        e, "vec_id", "embedding", k=3, n_centroids=8, sim_threshold=0.2
    ).count()
    assert thinner <= len(rows)

    labels = sim.cluster_embeddings_knn(e, "vec_id", "embedding", k=3, n_centroids=8)
    lab = {r["vec_id"]: r["component"] for r in labels.collect()}
    assert len(lab) == n  # every vector labeled
    # component id is the minimum member id (canonical representative)
    comps = {}
    for v, c in lab.items():
        comps.setdefault(c, []).append(v)
    assert all(c == min(vs) for c, vs in comps.items())
    # edges never cross components (labels are consistent with the graph)
    assert all(lab[r["id_a"]] == lab[r["id_b"]] for r in rows)


def test_knn_graph_auto_centroids(spark, sf_dir):
    # n_centroids=None sizes the codebook from the corpus so cell size
    # stays bounded — the fixed-codebook hazard measured in SCALE.md's
    # round-10 curves (exponent 1.58 at pinned 16 vs 0.55 scaled).
    from lightfusion_spark.operators import similarity as sim

    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    n = e.count()
    target = max(1, n // 4)
    auto = sim.knn_graph(
        e, "vec_id", "embedding", k=2, n_centroids=None, target_cell_rows=target
    )
    # auto mode floors at 16 centroids; with target = n/4 the ceil gives
    # max(16, 4) = 16, so it must equal the explicit-16 graph exactly
    explicit = sim.knn_graph(e, "vec_id", "embedding", k=2, n_centroids=16)
    assert sorted(map(tuple, auto.collect())) == sorted(
        map(tuple, explicit.collect())
    )
    # a small target forces a bigger codebook -> smaller cells -> a
    # subset-or-equal candidate space, still ≤ k edges per vector
    many = sim.knn_graph(
        e, "vec_id", "embedding", k=2, n_centroids=None, target_cell_rows=10
    )
    from collections import Counter

    deg = Counter(r["id_a"] for r in many.collect())
    assert deg and max(deg.values()) <= 2


def test_kmeans_pairs_match_dataframe_wrapper(spark):
    """kmeans_centroid_pairs is the driver-side core the search paths
    inline; the DataFrame wrapper must expose the identical centroids."""
    corpus = _vecs(spark, 30)
    pairs = similarity.kmeans_centroid_pairs(
        corpus, "vec_id", "embedding", n_centroids=4, n_iters=2
    )
    rows = (
        similarity.kmeans_centroids(
            corpus, "vec_id", "embedding", n_centroids=4, n_iters=2
        )
        .orderBy("centroid_id")
        .collect()
    )
    assert [(r["centroid_id"], list(r["_cent"])) for r in rows] == [
        (cid, list(vec)) for cid, vec in pairs
    ]
