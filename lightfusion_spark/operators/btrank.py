"""In-engine Bradley–Terry preference-strength fitting via Hunter's MM
algorithm, with exact engine-replayable arithmetic.

The Bradley–Terry model (Bradley & Terry 1952) turns pairwise outcomes
— "A beat B" — into per-item strengths ``γ`` with ``P(i beats j) =
γ_i / (γ_i + γ_j)``; Hunter 2004's MM update

    γ_i ← W_i / Σ_{j≠i} n_ij / (γ_i + γ_j)

(W_i = i's total wins, n_ij = comparisons between i and j) is the
standard fit.  This is the third trained-model family in the repo
(iterative-gradient probe, closed-form NB, and now an iterative MM on
SUFFICIENT STATISTICS): the corpus-scale work is exactly two
aggregations — a win count and a pair-count matrix — after which the
MM iterations run on driver-side state bounded by the ITEM vocabulary
(sources, models, annotators — the arms being ranked, never the
documents), the same giant-data/tiny-parameter shape as the probe and
the PCA power iteration.  The RLHF-pipeline use: turn a
``preference_pairs`` table into a source/model quality league table
with principled strengths instead of raw win rates (win rates ignore
WHO you beat; BT does not).

Exact-replay discipline (the repo's iterative-oracle recipe):

* per-epoch denominator terms ``n_ij / (γ_i + γ_j)`` are floored to
  scaled BIGINT per term (``floor(t·1e9 + 0.5)``) and integer-summed —
  associative, so neither Spark partial aggregation nor DuckDB's
  unordered SUM can change a bit;
* the update is ``γ'_i = round6(W_i / (s_i / 1e9))``, then strengths
  are rescaled to mean 1 with the DECIMAL(28,6) exact-sum recipe
  (``S = Σ decimal6(γ')``, ``γ''_i = round6(γ'_i · K / S)``) — the
  identifiability normalization, computed identically on the driver
  (integer micro-unit sum) and in the oracle's unrolled CTE chain.

Epoch count is fixed and the full history is returned — no silent
convergence claim (the round-6 verdict class); consumers read the
per-epoch drift column and decide.

Reference scope: the reference engine has no training surface; §2.4
extension alongside ``probe.train_linear_probe`` and ``nbayes``.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .pca import _round6

_S = 1e9


def bt_strengths(
    pairs: DataFrame,
    winner_col: str,
    loser_col: str,
    epochs: int = 3,
    max_items: int = 1000,
) -> tuple[DataFrame, list[dict]]:
    """Fit Bradley–Terry strengths from a (winner, loser) pair table.
    Returns ``(strengths_df, history)``: ``strengths_df`` has one row
    per item — ``(item, strength6, wins, n_pairs)`` — and ``history[e]``
    records ``{"epoch", "strengths": {item: γ}}`` for the oracle's
    unrolled replay.

    NULL rows and self-pairs (winner == loser) are dropped before any
    statistic is computed: a self-pair says nothing about relative
    strength, and counting it as a win would inflate the item's fitted
    γ.  A table with ONLY such rows is refused loudly.

    The pair table may be corpus-sized; the ITEM set may not —
    driver state is O(items²) pair counts (the sufficient statistic),
    so more than ``max_items`` distinct items is refused loudly rather
    than silently collecting a quadratic table.  Items appearing only
    as winners (or only as losers) are still ranked; an undefeated
    item's strength grows with every epoch (the classic BT
    non-identifiability at the boundary) — fixed epochs keep it
    finite, and the returned win/pair counts expose the condition.
    """
    if epochs < 1:
        raise ValueError(f"bt_strengths: epochs must be >= 1, got {epochs}")
    counts = (
        pairs.where(
            F.col(winner_col).isNotNull()
            & F.col(loser_col).isNotNull()
            # self-pairs (winner == loser) carry no information and must
            # not inflate wins or the MM denominators — dropped at the
            # aggregation, before any sufficient statistic is built
            & (F.col(winner_col) != F.col(loser_col))
        )
        .groupBy(
            F.col(winner_col).alias("w"), F.col(loser_col).alias("l")
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    if not counts:
        raise ValueError(
            "bt_strengths: no cross-item pairs (every row was NULL or a "
            "winner == loser self-pair) — BT needs comparisons between "
            "distinct items"
        )
    wins: dict = {}
    npair: dict = {}
    for r in counts:
        wins[r["w"]] = wins.get(r["w"], 0) + r["n"]
        key = (r["w"], r["l"]) if r["w"] <= r["l"] else (r["l"], r["w"])
        npair[key] = npair.get(key, 0) + r["n"]
    items = sorted({i for k in npair for i in k})
    if len(items) > max_items:
        raise ValueError(
            f"bt_strengths: {len(items)} distinct items > max_items="
            f"{max_items} — driver state is O(items²); BT ranks arms "
            "(sources, models), not documents. Aggregate upstream."
        )
    opp: dict = {i: [] for i in items}
    for (a, b), n in npair.items():
        opp[a].append((b, n))
        opp[b].append((a, n))
    g = {i: 1.0 for i in items}
    k_items = float(len(items))
    history: list[dict] = []
    for e in range(epochs):
        raw = {}
        for i in items:
            s = 0
            for j, n in opp[i]:
                # terms are positive; floor(t*1e9 + 0.5) per term, then
                # integer-sum — associative, so the oracle's unordered
                # SUM reproduces it bit-for-bit
                s += math.floor(n / (g[i] + g[j]) * _S + 0.5)
            raw[i] = _round6(wins.get(i, 0) / (s / _S)) if s else 0.0
        # mean-1 rescale with the DECIMAL(28,6) exact-sum recipe:
        # round6 values are within 1 ulp of a 6-decimal rational, so
        # summing their micro-int images IS the oracle's
        # SUM(CAST(g AS DECIMAL(28,6))), and the final /1e6 division
        # rounds the same exact rational to the same double.
        total_micro = sum(int(round(raw[i] * 1e6)) for i in items)
        s_f = total_micro / 1e6
        g = {i: _round6(raw[i] * k_items / s_f) for i in items}
        history.append({"epoch": e + 1, "strengths": dict(g)})
    spark = pairs.sparkSession
    tot_pairs = {i: sum(n for _, n in opp[i]) for i in items}
    out = spark.createDataFrame(
        [
            (i, g[i], int(wins.get(i, 0)), int(tot_pairs[i]))
            for i in items
        ],
        "item string, strength6 double, wins long, n_pairs long",
    )
    return out, history
