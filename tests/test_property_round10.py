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


@_prop
@given(
    batches=st.lists(
        st.lists(
            st.tuples(st.sampled_from(["a", "b"]), st.integers(0, 9)),
            min_size=1,
            max_size=5,
        ),
        min_size=1,
        max_size=3,
    ),
    replays=st.lists(st.integers(0, 2), max_size=2),
    compact_at=st.one_of(st.none(), st.integers(0, 2)),
)
def test_sketch_store_any_append_replay_compact_sequence(
    spark, batches, replays, compact_at
):
    """For ANY sequence of appends, then an optional fenced compaction,
    then ANY replays (of folded or unfolded batches alike), the store's
    live cells equal the ground-truth histogram of each batch counted
    ONCE — replays collapse by (cell, batch_id) dedup before the fence
    and are dropped by it after, and compaction itself moves nothing.
    Drives the real parquet store, not a reimplementation."""
    import collections
    import math
    import shutil
    import tempfile

    lo, hi, nb = 0.0, 10.0, 5
    width = (hi - lo) / nb

    def batch_df(b):
        return spark.createDataFrame(
            [(g, float(v)) for g, v in b], "g string, v double"
        )

    d = tempfile.mkdtemp(prefix="prop_sketch_store_")
    try:
        for i, b in enumerate(batches):
            sketch.sketch_append_batch(
                sketch.hist_sketch(batch_df(b), "g", "v", lo=lo, hi=hi, n_bins=nb),
                d,
                batch_id=i,
            )
        if compact_at is not None:
            sketch.sketch_compact_state(
                spark, d, through_batch_id=min(compact_at, len(batches) - 1)
            )
        for r in replays:
            i = min(r, len(batches) - 1)
            sketch.sketch_append_batch(
                sketch.hist_sketch(
                    batch_df(batches[i]), "g", "v", lo=lo, hi=hi, n_bins=nb
                ),
                d,
                batch_id=i,
            )
        got = {
            (r["g"], r["bin"]): r["cnt"]
            for r in sketch.sketch_state_cells(spark, d).collect()
        }
    finally:
        shutil.rmtree(d, ignore_errors=True)

    truth: collections.Counter = collections.Counter()
    for b in batches:  # each batch exactly once, replays notwithstanding
        for g, v in b:
            truth[(g, min(nb - 1, max(0, math.floor((v - lo) / width))))] += 1
    assert got == dict(truth), (got, dict(truth), batches, replays, compact_at)
