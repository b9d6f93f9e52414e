"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship pipeline (LightGBM inference UDF +
argmax over the embeddings table at sf0.001, summarized per predicted
class).  ``queries()`` / ``oracle_sql()`` expose the full verification
corpus from :mod:`lightfusion_spark.corpus` — one named (DataFrame
query, DuckDB oracle SQL) pair per operator claimed in SURVEY.md §2.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

FLAGSHIP_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: LIGHTGBM DDL -> batched inference pandas UDF -> argmax,
    joined back to labels and summarized per predicted class."""
    from pyspark.sql import functions as F

    from lightfusion_spark.corpus import REGISTRY
    from lightfusion_spark.corpus.util import table

    preds = REGISTRY["lgbm_infer_embeddings"].fn(spark, FLAGSHIP_SF_DIR)
    labels = table(spark, FLAGSHIP_SF_DIR, "embeddings").select("vec_id", "label")
    return (
        preds.join(labels, "vec_id")
        .groupBy("predicted")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                F.when(F.col("predicted") == F.col("label"), 1).otherwise(0)
            ).alias("n_label_match"),
        )
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from lightfusion_spark.corpus import query_functions

    return query_functions()


def oracle_sql() -> dict[str, str]:
    from lightfusion_spark.corpus import oracle_strings

    return oracle_strings()
