import pytest
from pyspark.sql import functions as F  # noqa: F401

from lightfusion_spark.operators import btrank


@pytest.fixture(scope="module")
def pairs(spark):
    # a beats b 3x, b beats a 1x, a beats c 4x, c beats a 1x,
    # b beats c 1x, c beats b 2x  -> strength a > c ~ b
    rows = (
        [("a", "b")] * 3 + [("b", "a")] + [("a", "c")] * 4 + [("c", "a")]
        + [("b", "c")] + [("c", "b")] * 2
    )
    return spark.createDataFrame(rows, "winner string, loser string")


def test_bt_orders_by_strength_not_raw_wins(pairs):
    out, hist = btrank.bt_strengths(pairs, "winner", "loser", epochs=5)
    rows = {r["item"]: r for r in out.collect()}
    assert set(rows) == {"a", "b", "c"}
    assert rows["a"]["strength6"] > rows["c"]["strength6"]
    assert rows["a"]["strength6"] > rows["b"]["strength6"]
    assert rows["a"]["wins"] == 7 and rows["a"]["n_pairs"] == 9
    assert len(hist) == 5
    # mean-1 normalization: strengths sum to ~ K
    assert abs(sum(r["strength6"] for r in rows.values()) - 3.0) < 1e-4


def test_bt_matches_unconstrained_mm(pairs):
    """The scaled-int/round6 discipline must not distort the fit: plain
    float MM (same epochs, same normalization) agrees to ~1e-5."""
    out, _ = btrank.bt_strengths(pairs, "winner", "loser", epochs=4)
    wins = {"a": 7.0, "b": 2.0, "c": 3.0}
    n = {("a", "b"): 4.0, ("a", "c"): 5.0, ("b", "c"): 3.0}
    opp = {
        "a": [("b", 4.0), ("c", 5.0)],
        "b": [("a", 4.0), ("c", 3.0)],
        "c": [("a", 5.0), ("b", 3.0)],
    }
    g = {i: 1.0 for i in wins}
    for _ in range(4):
        raw = {
            i: wins[i] / sum(m / (g[i] + g[j]) for j, m in opp[i])
            for i in wins
        }
        s = sum(raw.values())
        g = {i: raw[i] * 3.0 / s for i in wins}
    got = {r["item"]: r["strength6"] for r in out.collect()}
    for i in wins:
        assert abs(got[i] - g[i]) < 1e-5, (i, got[i], g[i])


def test_bt_partition_invariant(pairs):
    a, _ = btrank.bt_strengths(pairs, "winner", "loser", epochs=3)
    b, _ = btrank.bt_strengths(pairs.repartition(7), "winner", "loser", epochs=3)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_bt_undefeated_item_finite(spark):
    only_wins = spark.createDataFrame(
        [("champ", "x")] * 3 + [("x", "y")], "winner string, loser string"
    )
    out, _ = btrank.bt_strengths(only_wins, "winner", "loser", epochs=3)
    rows = {r["item"]: r for r in out.collect()}
    assert rows["champ"]["strength6"] == max(
        r["strength6"] for r in rows.values()
    )
    assert all(r["strength6"] < float("inf") for r in rows.values())
    # y never won: still ranked, weakest
    assert rows["y"]["wins"] == 0


def test_bt_guards(spark, pairs):
    with pytest.raises(ValueError, match="epochs"):
        btrank.bt_strengths(pairs, "winner", "loser", epochs=0)
    with pytest.raises(ValueError, match="max_items"):
        btrank.bt_strengths(pairs, "winner", "loser", max_items=2)
    empty = spark.createDataFrame(
        [(None, "a")], "winner string, loser string"
    )
    with pytest.raises(ValueError, match="no cross-item"):
        btrank.bt_strengths(empty, "winner", "loser")


def test_bt_self_pairs_dropped(spark, pairs):
    """winner == loser rows carry no information: they must not inflate
    wins or the denominators, and an all-self-pair table is refused
    loudly (the round-10 ADVICE finding — previously a raw
    ZeroDivisionError)."""
    selfed = pairs.union(
        spark.createDataFrame(
            [("a", "a")] * 5 + [("b", "b")], "winner string, loser string"
        )
    )
    a = sorted(map(tuple, btrank.bt_strengths(pairs, "winner", "loser")[0].collect()))
    b = sorted(map(tuple, btrank.bt_strengths(selfed, "winner", "loser")[0].collect()))
    assert a == b
    only_self = spark.createDataFrame(
        [("a", "a"), ("b", "b")], "winner string, loser string"
    )
    with pytest.raises(ValueError, match="no cross-item"):
        btrank.bt_strengths(only_self, "winner", "loser")
