"""Property-based checks for the round-10 operators (hypothesis).

Spark calls are slow, so example counts are small and deadlines off —
the point is randomized structure (duplicate values, boundary-landing
quantile targets, lopsided tournaments), not volume.  Each property
drives the REAL operator, not a reimplementation.
"""

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F  # noqa: F401

from lightfusion_spark.operators import btrank, sketch

_prop = settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@_prop
@given(
    values=st.lists(
        st.integers(min_value=0, max_value=99), min_size=1, max_size=60
    ),
    qs=st.lists(
        st.sampled_from([0.01, 0.25, 0.5, 0.75, 0.9, 1.0]),
        min_size=1,
        max_size=3,
        unique=True,
    ),
)
def test_hist_quantiles_one_row_per_q_within_bounds(spark, values, qs):
    """For ANY value multiset and q set: exactly one estimate per q,
    each inside the grid, each within one bin width of the true
    quantile — including targets landing exactly on cumulative
    boundaries (integer values make those common by construction)."""
    df = spark.createDataFrame([("s", float(v)) for v in values], "g string, v double")
    lo, hi, nb = 0.0, 100.0, 20
    width = (hi - lo) / nb
    sk = sketch.hist_sketch(df, "g", "v", lo=lo, hi=hi, n_bins=nb)
    est = sketch.hist_quantiles(sk, qs, lo=lo, hi=hi, n_bins=nb).collect()
    got = {}
    for r in est:
        assert r["q"] not in got, f"duplicate estimate for q={r['q']}"
        got[r["q"]] = r["est"]
    assert set(got) == set(qs)
    import math

    svals = sorted(values)
    for q in qs:
        # true q-quantile (inverse-CDF convention: smallest v with
        # CDF(v) >= q), matching the sketch's first-bin-reaching-target
        idx = min(len(svals) - 1, max(0, math.ceil(q * len(svals)) - 1))
        truth = float(svals[idx])
        assert lo <= got[q] <= hi
        assert abs(got[q] - truth) <= width + 1e-9, (q, got[q], truth)


@_prop
@given(
    outcomes=st.lists(
        st.tuples(
            st.sampled_from(["a", "b", "c", "d"]),
            st.sampled_from(["a", "b", "c", "d"]),
            st.integers(min_value=1, max_value=9),
        ),
        min_size=1,
        max_size=8,
    )
)
def test_bt_strengths_positive_and_mean_one(spark, outcomes):
    """Any tournament (self-pairs dropped): strengths are finite and
    >= 0, and the mean-1 normalization holds."""
    rows = [
        (w, loser) for w, loser, n in outcomes for _ in range(n) if w != loser
    ]
    if not rows:
        return  # all self-pairs: operator rejects (tested elsewhere)
    df = spark.createDataFrame(rows, "winner string, loser string")
    out, hist = btrank.bt_strengths(df, "winner", "loser", epochs=3)
    got = out.collect()
    k = len(got)
    assert all(r["strength6"] >= 0 for r in got)
    assert all(r["strength6"] < float("inf") for r in got)
    total = sum(r["strength6"] for r in got)
    assert abs(total - k) < 1e-3 * k, (total, k)
    assert len(hist) == 3
