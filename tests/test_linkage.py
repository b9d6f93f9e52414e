"""operators/linkage.py: blocking recall trade and best-match ties."""

from pyspark.sql import functions as F

from lightfusion_spark.operators import linkage


def test_fuzzy_pairs_respects_blocks_and_threshold(spark):
    df = spark.createDataFrame(
        [
            (1, "red widget"),
            (2, "rad widget"),   # lev 1 to id 1, same block
            (3, "red gadget"),   # different block (gadget) — NEVER paired
            (4, "reddish widget"),  # lev 4 to id 1 — over threshold
        ],
        "id long, name string",
    )
    pairs = linkage.fuzzy_pairs_blocked(
        df, "id", "name", F.element_at(F.split(F.col("name"), " "), -1), 3
    ).collect()
    assert [(r["id_a"], r["id_b"], r["distance"]) for r in pairs] == [(1, 2, 1)]


def test_fuzzy_join_best_only_deterministic_ties(spark):
    left = spark.createDataFrame([(1, "acme corp")], "id long, name string")
    right = spark.createDataFrame(
        [
            (10, "acme corp"),   # distance 0
            (11, "acme corp"),   # distance 0 too — tie: smaller id wins
            (12, "acme cor"),    # distance 1
        ],
        "id long, name string",
    )
    blk = F.lit("b")
    out = linkage.fuzzy_join_blocked(
        left, right, "id", "id", "name", "name", blk, blk, 2, best_only=True
    ).collect()
    assert [(r["left_id"], r["right_id"], r["distance"]) for r in out] == [(1, 10, 0)]
    # without best_only all three survive
    all_ = linkage.fuzzy_join_blocked(
        left, right, "id", "id", "name", "name", blk, blk, 2
    )
    assert all_.count() == 3
