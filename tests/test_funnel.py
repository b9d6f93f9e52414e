"""operators/funnel.py: order constraints and the key-loss trap."""

import pytest

from lightfusion_spark.operators import funnel


def _ev(spark, rows):
    return spark.createDataFrame(rows, "k string, t long, s string")


def test_funnel_respects_order(spark):
    df = _ev(
        spark,
        [
            # u1: full ordered funnel
            ("u1", 10, "view"), ("u1", 20, "click"), ("u1", 30, "buy"),
            # u2: click BEFORE first view -> funnel breaks at stage 2,
            # and u2 must still appear (the key-loss trap)
            ("u2", 5, "click"), ("u2", 10, "view"),
            # u3: view only
            ("u3", 10, "view"),
            # u4: never viewed -> not in the funnel at all
            ("u4", 10, "click"),
        ],
    )
    per_key = funnel.funnel_stages(df, "k", "t", "s", ["view", "click", "buy"])
    rows = {r["k"]: (r["stage_1_ts"], r["stage_2_ts"], r["stage_3_ts"], r["stages_reached"]) for r in per_key.collect()}
    assert rows == {
        "u1": (10, 20, 30, 3),
        "u2": (10, None, None, 1),
        "u3": (10, None, None, 1),
    }
    counts = {
        r["stage"]: (r["stage_name"], r["n_keys"])
        for r in funnel.funnel_counts(df, "k", "t", "s", ["view", "click", "buy"]).collect()
    }
    assert counts == {1: ("view", 3), 2: ("click", 1), 3: ("buy", 1)}


def test_same_timestamp_counts_as_progression(spark):
    df = _ev(spark, [("u", 10, "view"), ("u", 10, "click")])
    row = funnel.funnel_stages(df, "k", "t", "s", ["view", "click"]).collect()[0]
    assert (row["stage_1_ts"], row["stage_2_ts"], row["stages_reached"]) == (10, 10, 2)


def test_empty_stages_rejected(spark):
    df = _ev(spark, [("u", 1, "view")])
    with pytest.raises(ValueError, match="at least one"):
        funnel.funnel_stages(df, "k", "t", "s", [])
