"""As-of (point-in-time) join — a custom operator Spark lacks natively.

For every left row, attach the right row with the greatest timestamp
<= the left timestamp within the same key (the semantics of DuckDB/kdb
``ASOF JOIN`` and pandas ``merge_asof``).

Spark-first formulation: union the two sides, then one window pass per
key carrying the right side's values forward (``last(..., ignorenulls)``
over rows preceding).  Compared to the ``cogroup().applyInPandas(
pd.merge_asof)`` alternative this stays entirely in the JVM — one
shuffle on the key, per-partition sort, no Python crossing, and no
requirement that a whole key group fits in one pandas frame.

At 100 TB: the single shuffle partitions by key; heavily skewed keys
(one user with billions of events) are the failure mode — mitigate by
range-bucketing time into the key (join on (key, time_bucket) and also
carrying the previous bucket's last value forward), which keeps the
window state bounded per task.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key_col: str,
    ts_col: str,
    value_cols: list[str],
    suffix: str = "_asof",
    direction: str = "backward",
    tolerance: str | None = None,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Left as-of join: every left row + the nearest right values.

    ``direction`` (the pandas ``merge_asof`` surface):

    * ``"backward"`` (default) — the right row with the greatest
      timestamp <= the left timestamp;
    * ``"forward"`` — the right row with the smallest timestamp >= the
      left timestamp (same single window pass, descending order).

    ``tolerance`` (optional) — a SQL expression string bounding the
    match distance (e.g. ``"INTERVAL 1 HOUR"`` for timestamp columns or
    ``"3600000000"`` for integer micros); matches farther than that are
    nulled out whole-row, exactly like ``merge_asof``'s tolerance.

    ``tiebreak_col`` (optional) — a right-side column (e.g. a unique row
    id) breaking ties among right rows sharing the same (key, ts): the
    row with the GREATEST tiebreak value wins, in both directions.
    Without it, which of several equal-timestamp right rows is matched
    is plan-dependent (Spark's sort is not stable across partitionings)
    — fine when (key, ts) is unique on the right, a data-dependent
    lottery otherwise.

    ``right`` must contain ``key_col``, ``ts_col`` and ``value_cols``;
    output carries all left columns plus ``{v}{suffix}`` for each value
    column and ``{ts_col}{suffix}`` (the matched right timestamp), all
    NULL when no right row qualifies.  Matching is inclusive (right ts ==
    left ts matches), implemented by sorting right rows before left rows
    at equal timestamps.

    All carried fields come from ONE right row: they travel as a single
    struct filled with one ``last(ignorenulls=True)`` pass.  (Filling each
    column independently would let a NULL in one right value column mix an
    older row's value with a newer row's timestamp — diverging from
    ``merge_asof`` / DuckDB ASOF JOIN, where the whole match is one row.)
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"asof_join direction must be backward|forward, got {direction!r}")
    l_tagged = left.withColumn("_side", F.lit(1))
    r_tagged = right.select(
        F.col(key_col),
        F.col(ts_col),
        F.struct(
            F.col(ts_col).alias(f"{ts_col}{suffix}"),
            *[F.col(v).alias(f"{v}{suffix}") for v in value_cols],
        ).alias("_asof_row"),
        F.lit(0).alias("_side"),
        *([F.col(tiebreak_col).alias("_tiebreak")] if tiebreak_col else []),
    )
    merged = l_tagged.unionByName(r_tagged, allowMissingColumns=True)
    # right rows (side 0) sort before left rows at the same timestamp =>
    # inclusive as-of semantics; left rows carry a NULL struct, which
    # last(ignorenulls) skips.  Backward scans time ascending (nearest
    # preceding right row is the last seen); forward scans descending
    # (nearest following right row is the last seen).  The tiebreak (when
    # given) sorts ascending among equal-ts right rows in BOTH directions,
    # so last() always lands on the greatest tiebreak value.
    ts_order = F.col(ts_col) if direction == "backward" else F.col(ts_col).desc()
    order = [ts_order, F.col("_side")]
    if tiebreak_col:
        order.append(F.col("_tiebreak").asc_nulls_first())
    w = (
        Window.partitionBy(key_col)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = merged.withColumn(
        "_asof_row", F.last("_asof_row", ignorenulls=True).over(w)
    )
    if tolerance is not None:
        gap = (
            F.expr(f"{ts_col} - _asof_row.{ts_col}{suffix}")
            if direction == "backward"
            else F.expr(f"_asof_row.{ts_col}{suffix} - {ts_col}")
        )
        filled = filled.withColumn(
            "_asof_row",
            F.when(gap <= F.expr(tolerance), F.col("_asof_row")),
        )
    return filled.where(F.col("_side") == 1).select(
        *left.columns,
        F.col(f"_asof_row.{ts_col}{suffix}").alias(f"{ts_col}{suffix}"),
        *[
            F.col(f"_asof_row.{v}{suffix}").alias(f"{v}{suffix}")
            for v in value_cols
        ],
    )


def asof_join_bucketed(
    left: DataFrame,
    right: DataFrame,
    key_col: str,
    ts_col: str,
    value_cols: list[str],
    bucket: int,
    suffix: str = "_asof",
    direction: str = "backward",
    tolerance: str | None = None,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Skew-safe :func:`asof_join`: identical semantics, bounded task state.

    ``asof_join`` partitions its window by key alone, so one hot key (a
    user with billions of events) serializes onto a single task.  This
    variant implements the time-bucketed key-carry pattern that
    ``asof_join``'s module docstring describes: partition by **(key,
    time-bucket)** so no task ever sorts more than one bucket of one key,
    and carry each bucket's boundary row across buckets through a
    window over per-bucket *summaries* (≤ one row per (key, bucket) —
    millions of times smaller than the event stream, so the hot key's
    sequential pass is over its bucket count, not its row count).

    ``ts_col`` must be integral (e.g. epoch micros — see
    ``streaming.events.ts_micros_col``); ``bucket`` is the bucket width in
    the same unit.  ``direction`` / ``tolerance`` / ``tiebreak_col`` as in
    :func:`asof_join`.

    Plan shape (3 shuffles, all bounded): (1) per-(key, bucket) boundary
    aggregation of the right side — map-side combinable; (2) the carry
    window over (key, bucket) summaries; (3) the main union window
    hash-partitioned by (key, bucket).  Pick ``bucket`` so a typical
    (key, bucket) slice fits a task comfortably; smaller buckets raise
    summary volume, never correctness.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"asof_join_bucketed direction must be backward|forward, got {direction!r}")
    if bucket <= 0:
        raise ValueError(f"asof_join_bucketed bucket must be a positive int, got {bucket}")
    # floor-division bucket id (pmod keeps it exact for negative ts too,
    # where SQL `div` truncates toward zero).
    _bk = F.expr(f"(({ts_col} - pmod({ts_col}, {bucket})) div {bucket})")
    ts_type = dict(left.dtypes)[ts_col]

    payload = F.struct(
        F.col(ts_col).alias(f"{ts_col}{suffix}"),
        *[F.col(v).alias(f"{v}{suffix}") for v in value_cols],
    )
    tb = F.col(tiebreak_col) if tiebreak_col else F.lit(0)
    r = right.select(
        F.col(key_col),
        F.col(ts_col),
        payload.alias("_asof_row"),
        tb.alias("_tb"),
        _bk.alias("_bk"),
    )

    # (1) each bucket's boundary right row: the one asof_join's scan would
    # have in hand when leaving the bucket — nearest-to-the-boundary ts,
    # greatest tiebreak on ties (same rule as asof_join's window order).
    # max_by over (±ts, tb): ts negated for forward (ts is integral by
    # contract) so the tiebreak rule stays "greatest wins" for any
    # orderable tiebreak type in both directions.
    ts_rank = F.col(ts_col) if direction == "backward" else -F.col(ts_col)
    summaries = r.groupBy(key_col, "_bk").agg(
        F.max_by(
            "_asof_row", F.struct(ts_rank.alias("_ts"), F.col("_tb"))
        ).alias("_last")
    )

    # (2) carry = that boundary row from the nearest preceding bucket (in
    # scan direction), computed over the summary table and materialized as
    # one synthetic right row per (key, bucket), sorted to the bucket edge
    # where the scan enters (side -1 beats real rows at the same ts).
    # null-safe merge: plain asof_join's window groups NULL keys into one
    # partition (they match each other), so the carry bookkeeping must
    # too — a name-list full join would keep null-key rows apart and
    # leave duplicate (null, bucket) rows whose carry could leak the
    # same bucket's boundary row.
    lb = left.select(F.col(key_col).alias("_lk"), _bk.alias("_lbk")).distinct()
    summ = summaries.select(
        F.col(key_col).alias("_sk"), F.col("_bk").alias("_sbk"), "_last"
    )
    allb = lb.join(
        summ,
        F.col("_lk").eqNullSafe(F.col("_sk"))
        & F.col("_lbk").eqNullSafe(F.col("_sbk")),
        "full",
    ).select(
        F.coalesce("_sk", "_lk").alias(key_col),
        F.coalesce("_sbk", "_lbk").alias("_bk"),
        "_last",
    )
    bk_order = F.col("_bk") if direction == "backward" else F.col("_bk").desc()
    w_prev = (
        Window.partitionBy(key_col)
        .orderBy(bk_order)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    edge = (
        F.col("_bk") * bucket
        if direction == "backward"
        else F.col("_bk") * bucket + (bucket - 1)
    )
    carry = (
        allb.withColumn("_carry", F.last("_last", ignorenulls=True).over(w_prev))
        .where(F.col("_carry").isNotNull())
        .select(
            F.col(key_col),
            edge.cast(ts_type).alias(ts_col),
            F.col("_carry").alias("_asof_row"),
            F.lit(-1).alias("_side"),
            F.col("_bk"),
        )
    )

    # (3) the same union-window scan as asof_join, per (key, bucket).
    l_tagged = left.withColumn("_side", F.lit(1)).withColumn("_bk", _bk)
    r_tagged = r.select(
        key_col, ts_col, "_asof_row", F.lit(0).alias("_side"), "_bk", "_tb"
    )
    merged = l_tagged.unionByName(r_tagged, allowMissingColumns=True).unionByName(
        carry, allowMissingColumns=True
    )
    ts_order = F.col(ts_col) if direction == "backward" else F.col(ts_col).desc()
    order = [ts_order, F.col("_side")]
    if tiebreak_col:
        order.append(F.col("_tb").asc_nulls_first())
    w = (
        Window.partitionBy(key_col, "_bk")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = merged.withColumn(
        "_asof_row", F.last("_asof_row", ignorenulls=True).over(w)
    )
    if tolerance is not None:
        gap = (
            F.expr(f"{ts_col} - _asof_row.{ts_col}{suffix}")
            if direction == "backward"
            else F.expr(f"_asof_row.{ts_col}{suffix} - {ts_col}")
        )
        filled = filled.withColumn(
            "_asof_row",
            F.when(gap <= F.expr(tolerance), F.col("_asof_row")),
        )
    return filled.where(F.col("_side") == 1).select(
        *left.columns,
        F.col(f"_asof_row.{ts_col}{suffix}").alias(f"{ts_col}{suffix}"),
        *[
            F.col(f"_asof_row.{v}{suffix}").alias(f"{v}{suffix}")
            for v in value_cols
        ],
    )


def bucketed_range_join(
    left: DataFrame,
    intervals: DataFrame,
    left_ts: str,
    start_col: str,
    end_col: str,
    bucket: int,
) -> DataFrame:
    """Exact interval join without an equi-key and without a cross product.

    ``left rows whose left_ts falls in [start, end]`` naively plans a
    BroadcastNestedLoopJoin (every row against every interval) — the
    classic range-join trap.  Bucketing makes it an ordinary hash
    equi-join: each interval explodes into the coarse time buckets it
    covers, each left row computes its single bucket, the sides
    equi-join on the bucket id, and an exact BETWEEN filter removes the
    bucket-boundary false positives.  A left row occupies exactly one
    bucket, so a (row, interval) pair can match only once — no dedup
    pass.  Timestamps are integers (any epoch unit — the callers pass
    microseconds via ``ts_micros_col``); ``bucket`` is the bucket width
    in the same unit.

    Scale: candidate volume is |left| + Σ(interval_span / bucket) rows
    through one hash exchange — pick ``bucket`` ≈ the typical interval
    length so each interval explodes into ~2 buckets.  Skewed buckets
    (a hot hour) are ordinary join skew — AQE splits them.
    """
    l2 = left.withColumn("_bk", F.expr(f"{left_ts} div {bucket}"))
    iv = intervals.withColumn(
        "_bk",
        F.explode(
            F.sequence(
                F.expr(f"{start_col} div {bucket}"), F.expr(f"{end_col} div {bucket}")
            )
        ),
    )
    return (
        l2.join(iv, "_bk")
        .where(F.col(left_ts).between(F.col(start_col), F.col(end_col)))
        .drop("_bk")
    )
