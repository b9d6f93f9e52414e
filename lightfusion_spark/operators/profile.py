"""Data profiling: per-column statistics and key-skew reports.

The operational side of a 100 TB engine: before you pick a partition
count, a salt factor, or a broadcast threshold you profile the data.
``profile_table`` is the DuckDB-``SUMMARIZE`` shape as one Spark
aggregation; ``key_skew_report`` names the hot keys that the skew
toolkit (``operators/skew.py`` salted agg/join, AQE skew split) exists
to absorb.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

#: Numeric types whose min/max are reported as doubles (strings would
#: hit cross-engine float-rendering differences).
_NUMERIC = ("int", "bigint", "smallint", "tinyint", "double", "float", "decimal")


def profile_table(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """One row per column: ``(column, n_rows, n_null, n_distinct,
    min_value, max_value)`` — min/max as doubles for numeric columns,
    NULL otherwise.

    Single-pass shape: ALL metrics are expressions of ONE aggregation
    (count-distinct expands internally, which is the exact-answer cost;
    swap ``approx_count_distinct`` in when ±2% serves), then the wide
    row unpivots to long format JVM-side.  No shuffle beyond the
    aggregation itself, no driver loop over the data.
    """
    cols = cols or df.columns
    dtypes = dict(df.dtypes)
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in cols:
        aggs.append(F.sum(F.col(c).isNull().cast("bigint")).alias(f"__null_{c}"))
        aggs.append(F.count_distinct(F.col(c)).alias(f"__dist_{c}"))
        if dtypes[c].startswith(_NUMERIC):
            aggs.append(F.min(F.col(c)).cast("double").alias(f"__min_{c}"))
            aggs.append(F.max(F.col(c)).cast("double").alias(f"__max_{c}"))
    wide = df.agg(*aggs)
    structs = []
    for c in cols:
        is_num = dtypes[c].startswith(_NUMERIC)
        structs.append(
            F.struct(
                F.lit(c).alias("column"),
                F.col("n_rows"),
                F.col(f"__null_{c}").alias("n_null"),
                F.col(f"__dist_{c}").alias("n_distinct"),
                (F.col(f"__min_{c}") if is_num else F.lit(None).cast("double")).alias(
                    "min_value"
                ),
                (F.col(f"__max_{c}") if is_num else F.lit(None).cast("double")).alias(
                    "max_value"
                ),
            )
        )
    return wide.select(F.explode(F.array(*structs)).alias("s")).select("s.*")


def schema_drift(old: DataFrame, new: DataFrame) -> DataFrame:
    """Column-level drift between two snapshots of a structured table —
    the schema sibling of ``curation.corpus_drift`` and the first check
    a pipeline runs when an upstream export changes: one row per column
    present in EITHER snapshot::

        (column, status, type_old, type_new,
         n_null_old, n_null_new, null_ppm_old, null_ppm_new,
         null_ppm_delta)

    * ``status`` — ``added`` / ``dropped`` / ``type_changed`` /
      ``kept`` (dtype strings compared; ``type_*`` is NULL on the
      absent side).
    * null accounting — exact: BIGINT null counts from ONE aggregation
      pass per snapshot (the :func:`profile_table` shape — every
      column's count is an expression of the same agg, no per-column
      scans), and ``null_ppm_*`` as integer parts-per-million via
      ``n·10⁶ div n_rows`` (Spark ``div`` == DuckDB ``//``), so the
      report replays hash-exact.  ``null_ppm_delta`` is NULL for
      added/dropped columns (no defined drift against an absent side).

    Scale: two single-pass aggregations and a 1-row × 1-row cross join
    — schema metadata is driver-side by nature (a DataFrame's dtypes
    are plan state, not data), and the data-touching part never reads
    a column twice or shuffles at all.
    """
    dt_old, dt_new = dict(old.dtypes), dict(new.dtypes)
    all_cols = sorted(set(dt_old) | set(dt_new))

    def _nulls(df, cols, tag):
        aggs = [F.count(F.lit(1)).alias(f"n_rows_{tag}")]
        aggs += [
            F.sum(F.col(c).isNull().cast("bigint")).alias(f"__{tag}_{c}")
            for c in cols
        ]
        return df.agg(*aggs)

    wide = _nulls(old, dt_old, "o").crossJoin(_nulls(new, dt_new, "n"))

    def _ppm(nulls_col, rows_col):
        return F.expr(
            f"CASE WHEN {rows_col} = 0 THEN 0L "
            f"ELSE {nulls_col} * 1000000L div {rows_col} END"
        )

    structs = []
    for c in all_cols:
        in_o, in_n = c in dt_old, c in dt_new
        if in_o and in_n:
            status = "kept" if dt_old[c] == dt_new[c] else "type_changed"
        else:
            status = "dropped" if in_o else "added"
        no = F.col(f"__o_{c}") if in_o else F.lit(None).cast("bigint")
        nn = F.col(f"__n_{c}") if in_n else F.lit(None).cast("bigint")
        po = _ppm(f"__o_{c}", "n_rows_o") if in_o else F.lit(None).cast("bigint")
        pn = _ppm(f"__n_{c}", "n_rows_n") if in_n else F.lit(None).cast("bigint")
        structs.append(
            F.struct(
                F.lit(c).alias("column"),
                F.lit(status).alias("status"),
                (F.lit(dt_old[c]) if in_o else F.lit(None).cast("string")).alias(
                    "type_old"
                ),
                (F.lit(dt_new[c]) if in_n else F.lit(None).cast("string")).alias(
                    "type_new"
                ),
                no.alias("n_null_old"),
                nn.alias("n_null_new"),
                po.alias("null_ppm_old"),
                pn.alias("null_ppm_new"),
                (
                    (pn - po)
                    if (in_o and in_n)
                    else F.lit(None).cast("bigint")
                ).alias("null_ppm_delta"),
            )
        )
    return wide.select(F.explode(F.array(*structs)).alias("s")).select("s.*")


def key_skew_report(df: DataFrame, key_col: str, top_n: int = 10) -> DataFrame:
    """Top-``top_n`` hottest keys with their row share: ``(key, n,
    share_ppm, rank)``.

    ``share_ppm`` is integer parts-per-million via BIGINT floor
    division (Spark ``div`` == DuckDB ``//`` for non-negative operands
    — a double division then cast would hit Spark-truncates vs
    DuckDB-rounds).  One map-side-combined count per key, one 1-row
    total broadcast, then a distributed sort-limit
    (``TakeOrderedAndProject``) — the rank window only ever sees the
    ``top_n`` surviving rows, so no global single-task window and the
    input rows are never reshuffled.

    Reading it: share_ppm x n_partitions >> 1e6 on your biggest key
    means that key serializes onto one task — reach for
    ``skew.salted_agg`` / ``salted_join`` or AQE skew split.
    """
    counts = df.groupBy(F.col(key_col).alias("key")).agg(
        F.count(F.lit(1)).alias("n")
    )
    total = counts.agg(F.sum("n").alias("_total"))
    top = (
        counts.crossJoin(F.broadcast(total))
        .select(
            "key",
            "n",
            F.expr("(n * 1000000) div _total").alias("share_ppm"),
        )
        .orderBy(F.col("n").desc(), F.col("key"))
        .limit(top_n)
    )
    w = Window.orderBy(F.col("n").desc(), F.col("key"))
    return top.withColumn("rank", F.row_number().over(w))


def histogram(
    df: DataFrame, col: str, bins: int = 16
) -> DataFrame:
    """Fixed-width histogram of a numeric column: ``(bin, bin_lo, n_rows)``
    with EMPTY BINS PRESENT (a monitoring chart with silently-missing
    bars misleads).

    Data-derived [min, max] attaches as a broadcast 1-row relation, the
    bin index is pure row arithmetic (``least(bins-1, floor((x-lo)/w))``
    — the max value folds into the last bin), and the bin spine is a
    ``sequence``/``explode`` left join.  One aggregation total; no
    driver round-trip.
    """
    if bins < 1:
        raise ValueError(f"histogram: bins must be >= 1, got {bins}")
    x = F.col(col).cast("double")
    stats = df.agg(
        F.min(x).alias("_lo"), F.max(x).alias("_hi")
    )
    width = (F.col("_hi") - F.col("_lo")) / F.lit(float(bins))
    binned = (
        df.where(x.isNotNull())
        .crossJoin(F.broadcast(stats))
        .select(
            F.when(F.col("_hi") == F.col("_lo"), F.lit(0))
            .otherwise(
                F.least(
                    F.lit(bins - 1),
                    F.floor((x - F.col("_lo")) / width),
                )
            )
            .cast("bigint")
            .alias("bin")
        )
        .groupBy("bin")
        .agg(F.count(F.lit(1)).alias("n_rows"))
    )
    spine = (
        stats.select(
            F.explode(F.sequence(F.lit(0), F.lit(bins - 1))).alias("bin"),
            "_lo",
            "_hi",
        )
        .select(
            "bin",
            (F.col("_lo") + F.col("bin") * ((F.col("_hi") - F.col("_lo")) / F.lit(float(bins))))
            .alias("bin_lo"),
        )
    )
    return (
        spine.join(binned, "bin", "left")
        .select("bin", "bin_lo", F.coalesce(F.col("n_rows"), F.lit(0)).alias("n_rows"))
    )


#: Normal-consistency constant: for Gaussian data 1.4826·MAD ≈ σ, so the
#: default fence k·1.4826·MAD matches the familiar k-sigma rule while
#: staying robust to the outliers being hunted (mean/stddev are not).
MAD_SIGMA = 1.4826


def mad_outlier_report(
    df: DataFrame,
    group_col: str,
    value_col: str,
    k: float = 3.0,
) -> DataFrame:
    """Median/MAD robust outlier screen per group — the heavy-tail-safe
    sibling of the Tukey IQR fence (`rel_outlier_iqr`): with >25%
    contamination or extreme skew the quartiles themselves move, while
    the median absolute deviation has the maximum possible 50%
    breakdown point.  Emits ``(group, n_events, median6, mad6,
    n_outliers)`` with a row flagged when ``|x − median| >
    k·1.4826·MAD`` (``MAD_SIGMA`` makes k read as sigmas under
    normality).

    Degenerate convention: MAD = 0 (a majority-constant group) flags
    EVERY deviating row — the strict reading of the fence, documented
    rather than silently returning zero outliers.  NULL values are
    dropped (they carry no magnitude).

    Exactness: medians are Spark's exact sort-based ``percentile`` —
    IEEE-identical to DuckDB's ``quantile_cont`` interpolation (the
    `rel_outlier_iqr` precedent); the fence coefficient is ONE
    pre-multiplied double literal so both engines do a single multiply,
    and deviations/comparisons are raw IEEE ops — hash-exact with
    rounding only on the REPORTED median6/mad6.

    Scale (100 TB): three passes over the (group, value) stream — group
    median, deviation median, fence count — each a map-side-pruned
    2-column scan with the tiny per-group medians broadcast back;
    exact percentile buffers one group's values per agg state, the
    documented exact-vs-approx_percentile trade (approx would be
    partition-order-dependent and break replay).
    """
    coeff = float(k) * MAD_SIGMA
    src = df.select(
        F.col(group_col).alias("_g"), F.col(value_col).alias("_v")
    ).where(F.col("_v").isNotNull())
    med = src.groupBy("_g").agg(
        F.expr("percentile(_v, 0.5)").alias("_med")
    )
    dev = src.join(F.broadcast(med), "_g").withColumn(
        "_dev", F.abs(F.col("_v") - F.col("_med"))
    )
    mad = dev.groupBy("_g").agg(
        F.expr("percentile(_dev, 0.5)").alias("_mad")
    )
    return (
        dev.join(F.broadcast(mad), "_g")
        .groupBy(
            F.col("_g").alias(group_col),
            F.round(F.col("_med"), 6).alias("median6"),
            F.round(F.col("_mad"), 6).alias("mad6"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(
                (F.col("_dev") > F.lit(coeff) * F.col("_mad")).cast("bigint")
            ).alias("n_outliers"),
        )
        .select(group_col, "n_events", "median6", "mad6", "n_outliers")
    )


def zipf_fit(
    df: DataFrame,
    id_col: str,
    text_col: str,
    top_k: int = 200,
) -> DataFrame:
    """Zipf-law fit over the corpus rank-frequency curve — the
    one-number language-health check of a scraped corpus: natural text
    follows ``freq ∝ rank^(-alpha)`` with alpha ≈ 1; boilerplate
    floods, template spam, and machine-generated filler bend the
    log-log line (alpha drifts, R² collapses), so (alpha, r2) is a
    cheap release-gate signal beside the per-document Gopher filters.

    OLS on ``(x, y) = (ln rank, ln freq)`` over the ``top_k``
    most-frequent token types (rank ties broken by token — fully
    deterministic).  Returns ONE row: ``n_fit`` (types actually
    fitted), ``n_types``/``n_tokens`` (whole-vocabulary scalars),
    ``alpha`` (the negated OLS slope) and ``r2``.

    Exactness: x and y are ROUND(ln, 6) micro-ints; the five OLS
    sufficient statistics (Sx, Sy, Sxy, Sxx, Syy) are BIGINT sums of
    micro-int products, so ``num = n·Sxy − Sx·Sy`` and the two
    denominators are exact integers and

    * ``alpha = −num / den_x``                      (one IEEE division)
    * ``r2    = (num/den_x) · (num/den_y)``         (two divisions, one
      multiply — fixed order)

    are bit-stable across engines and partitionings with no further
    rounding.  Integer headroom: |x|,|y| ≤ ~3·10⁷ micro-units at
    web-scale counts, so Sxy terms are ≤ 10¹⁵ and ``n·Sxy`` at
    ``top_k = 200`` stays ~10¹⁸ < 2⁶³ (the docstring bound:
    ``top_k · (ln max_freq · 1e6)² < 2⁶³`` — raise top_k past ~10⁴
    only with the DECIMAL fold).  Degenerate fits (fewer than 2
    types, or a zero denominator — all ranks or all freqs equal)
    return alpha = 0.0, r2 = 0.0 rather than NaN.

    100 TB shape: one explode into a map-side-combinable token count
    (Zipf itself guarantees distinct types ≪ tokens), one top-k
    window over the type table ONLY (never the corpus; Catalyst plans
    the rank<=k filter as a distributed TakeOrderedAndProject feeding
    the window, so no task ever sorts the full vocabulary), and a
    1-row reduction.  The whole-vocab scalars ride the same aggregation.
    """
    from pyspark.sql import Window

    if top_k < 2:
        raise ValueError(f"zipf_fit: top_k must be >= 2, got {top_k}")
    toks = F.explode(
        F.filter(
            F.split(F.lower(F.coalesce(F.col(text_col), F.lit(""))), r"\s+"),
            lambda x: x != F.lit(""),
        )
    ).alias("tok")
    counts = df.select(toks).groupBy("tok").agg(
        F.count(F.lit(1)).alias("c")
    )
    totals = counts.agg(
        F.count(F.lit(1)).alias("n_types"),
        F.coalesce(F.sum("c"), F.lit(0)).alias("n_tokens"),
    )
    w = Window.orderBy(F.col("c").desc(), F.col("tok").asc())
    ranked = (
        counts.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= top_k)
        .select(
            F.floor(
                F.round(F.log(F.col("rank").cast("double")), 6) * 1000000
                + F.lit(0.5)
            ).cast("long").alias("x"),
            F.floor(
                F.round(F.log(F.col("c").cast("double")), 6) * 1000000
                + F.lit(0.5)
            ).cast("long").alias("y"),
        )
    )
    s = ranked.agg(
        F.count(F.lit(1)).alias("n_fit"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    num = F.col("n_fit") * F.col("sxy") - F.col("sx") * F.col("sy")
    den_x = F.col("n_fit") * F.col("sxx") - F.col("sx") * F.col("sx")
    den_y = F.col("n_fit") * F.col("syy") - F.col("sy") * F.col("sy")
    degenerate = (F.col("n_fit") < 2) | (den_x == 0) | (den_y == 0)
    return (
        s.crossJoin(F.broadcast(totals))
        .select(
            "n_fit",
            "n_types",
            "n_tokens",
            F.when(degenerate, F.lit(0.0))
            .otherwise(-(num.cast("double") / den_x.cast("double")))
            .alias("alpha"),
            F.when(degenerate, F.lit(0.0))
            .otherwise(
                (num.cast("double") / den_x.cast("double"))
                * (num.cast("double") / den_y.cast("double"))
            )
            .alias("r2"),
        )
    )
