"""operators/probe.py: in-engine linear-probe training.  The registered
oracle pins exact DuckDB replay; these tests pin (a) EXACT agreement
with an independent NumPy implementation of the same floored
arithmetic, (b) that the probe actually LEARNS (loss decreases,
accuracy beats the majority class), (c) the apply_probe gate, and
(d) the input guards."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from lightfusion_spark.operators import probe


@pytest.fixture(scope="module")
def feats(spark):
    """A separable-but-noisy 2-feature problem: y = 1 iff x1 > 0.5,
    with x2 pure noise — the probe must find w1 >> w2."""
    rng = np.random.RandomState(11)
    x1 = rng.uniform(0, 1, 400)
    x2 = rng.uniform(-1, 1, 400)
    y = (x1 > 0.5).astype(np.float64)
    df = spark.createDataFrame(
        [(1.0, float(a), float(b), float(c)) for a, b, c in zip(x1, x2, y)],
        "x0 double, x1 double, x2 double, y double",
    )
    X = np.column_stack([np.ones(400), x1, x2])
    return df, X, y


def test_probe_matches_numpy_exactly(spark, feats):
    df, X, y = feats
    w_spark, hist_spark = probe.train_linear_probe(
        df, ["x0", "x1", "x2"], "y", lr=0.5, epochs=4
    )
    w_np, hist_np = probe.train_linear_probe_numpy(X, y, lr=0.5, epochs=4)
    # EXACT equality, not allclose: both sides floor per term and round
    # per update, so any divergence is a bug, not noise
    assert w_spark == w_np
    assert [h["loss"] for h in hist_spark] == [h["loss"] for h in hist_np]
    assert [h["weights"] for h in hist_spark] == [h["weights"] for h in hist_np]


def test_probe_learns(spark, feats):
    df, X, y = feats
    w, hist = probe.train_linear_probe(
        df, ["x0", "x1", "x2"], "y", lr=1.0, epochs=8
    )
    losses = [h["loss"] for h in hist]
    assert losses[-1] < losses[0], losses
    # the signal feature must dominate the noise feature
    assert abs(w[1]) > abs(w[2])
    # accuracy beats the majority class on the training set
    z = w[0] + w[1] * X[:, 1] + w[2] * X[:, 2]
    pred = (probe._elliott_np(z) >= 0.5).astype(np.float64)
    acc = float((pred == y).mean())
    majority = max(float(y.mean()), 1.0 - float(y.mean()))
    assert acc > majority, (acc, majority)


def test_probe_partition_invariant(spark, feats):
    df, X, y = feats
    w1, _ = probe.train_linear_probe(df, ["x0", "x1", "x2"], "y", epochs=3)
    w2, _ = probe.train_linear_probe(
        df.repartition(13), ["x0", "x1", "x2"], "y", epochs=3
    )
    assert w1 == w2  # bit-identical: integer sums are associative


def test_apply_probe_gates(spark, feats):
    df, X, y = feats
    w, _ = probe.train_linear_probe(df, ["x0", "x1", "x2"], "y", lr=1.0, epochs=8)
    scored = probe.apply_probe(df, ["x0", "x1", "x2"], w, threshold=0.5)
    rows = scored.select("p_keep", "keep", "y").collect()
    assert all((r["p_keep"] >= 0.5) == r["keep"] for r in rows)
    kept = [r for r in rows if r["keep"]]
    assert 0 < len(kept) < len(rows)
    # the gate should be enriched in positives vs the raw corpus
    frac_pos_kept = sum(r["y"] for r in kept) / len(kept)
    frac_pos_all = sum(r["y"] for r in rows) / len(rows)
    assert frac_pos_kept > frac_pos_all


def test_probe_input_guards(spark):
    empty = spark.createDataFrame([], "x0 double, y double")
    with pytest.raises(ValueError, match="empty input"):
        probe.train_linear_probe(empty, ["x0"], "y")
    df = spark.createDataFrame([(1.0, 0.0)], "x0 double, y double")
    with pytest.raises(ValueError, match="at least one feature"):
        probe.train_linear_probe(df, [], "y")


def test_probe_rejects_null_features_and_labels(spark):
    """Same failure class as the pca ADVICE-r8 guard: a NULL feature or
    label silently drops its row from the affected gradient sums ONLY,
    skewing the fit — refuse loudly instead."""
    df = spark.createDataFrame(
        [(1.0, 0.5, 1.0), (1.0, None, 0.0), (1.0, 0.2, None)],
        "x0 double, x1 double, y double",
    )
    with pytest.raises(ValueError, match="NULL"):
        probe.train_linear_probe(df, ["x0", "x1"], "y", epochs=1)
