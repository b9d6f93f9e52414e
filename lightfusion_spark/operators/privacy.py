"""Privacy risk analytics: k-anonymity / l-diversity reporting over
quasi-identifier combinations (Sweeney 2002; Machanavajjhala et al.
2007).

The release-gate question for any dataset leaving a training pipeline
— "can rows be re-identified by joining on quasi-identifiers?" — is a
pure aggregation: group by the quasi-identifier columns, inspect the
equivalence-class sizes.  A row in a class smaller than ``k`` is
re-identifiable to within ``k`` candidates; a class whose SENSITIVE
attribute takes fewer than ``l`` distinct values leaks that attribute
even when k-anonymous (the homogeneity attack l-diversity exists to
catch).  This sits beside the detection/redaction pair
(``text.detect_pii`` / ``text.redact_pii``): those find and strip
direct identifiers inside free text; this measures the joinability of
the STRUCTURED columns that remain.

Scale (100 TB): one groupBy over the quasi-identifier key (map-side
combinable counts + one ``countDistinct`` on the sensitive column),
then a bounded aggregation over the class-size table — no row-level
state, no pair space, and the report is a single row.  Everything is
integer arithmetic plus one exact ratio, so faces hash-verify.

Reference scope: no privacy surface in the reference; §2.4 extension
in the curation family.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def k_anonymity_report(
    df: DataFrame,
    quasi_cols: list[str],
    k: int = 5,
    sensitive_col: str | None = None,
    l_threshold: int = 2,
) -> DataFrame:
    """One-row re-identification risk report:

    * ``n_rows`` / ``n_classes`` — corpus size and distinct
      quasi-identifier combinations;
    * ``min_class_size`` — the worst equivalence class (k-anonymity of
      the release = this number);
    * ``n_rows_at_risk`` / ``risk_ppm`` — rows in classes smaller than
      ``k`` (parts-per-million as an exact integer ratio — no float);
    * with ``sensitive_col``: ``min_l`` (the least-diverse class's
      distinct sensitive count) and ``n_rows_homogeneous`` (rows in
      classes with fewer than ``l_threshold`` distinct sensitive
      values — the homogeneity-attack surface).

    NULL quasi-identifier values form their own classes (NULL is a
    joinable value to an attacker holding the same NULL convention) —
    Spark/SQL ``GROUP BY`` semantics already do exactly that.
    """
    if not quasi_cols:
        raise ValueError("k_anonymity_report: need at least one quasi column")
    if k < 2:
        raise ValueError(f"k_anonymity_report: k must be >= 2, got {k}")
    aggs = [F.count(F.lit(1)).alias("sz")]
    if sensitive_col is not None:
        aggs.append(F.countDistinct(sensitive_col).alias("ndiv"))
    classes = df.groupBy(*quasi_cols).agg(*aggs)
    out = [
        F.sum("sz").alias("n_rows"),
        F.count(F.lit(1)).alias("n_classes"),
        F.min("sz").alias("min_class_size"),
        F.sum(F.when(F.col("sz") < k, F.col("sz")).otherwise(0)).alias(
            "n_rows_at_risk"
        ),
        # exact integer ppm: floor(at_risk * 1e6 / n_rows) — div is
        # integer division in both engines (Spark div == DuckDB //)
        (
            F.sum(F.when(F.col("sz") < k, F.col("sz")).otherwise(0))
            * F.lit(1_000_000)
        ).alias("_risk_num"),
    ]
    if sensitive_col is not None:
        out.append(F.min("ndiv").alias("min_l"))
        out.append(
            F.sum(
                F.when(F.col("ndiv") < l_threshold, F.col("sz")).otherwise(0)
            ).alias("n_rows_homogeneous")
        )
    rep = classes.agg(*out)
    return rep.select(
        "n_rows",
        "n_classes",
        "min_class_size",
        "n_rows_at_risk",
        F.expr("_risk_num div n_rows").alias("risk_ppm"),
        *(
            ["min_l", "n_rows_homogeneous"]
            if sensitive_col is not None
            else []
        ),
    )
