"""UDF-surface coverage beyond scalar pandas UDFs (SURVEY §2.3 row
"UDF/UDAF/UDTF"): a grouped-aggregate pandas UDF and a grouped-map
``applyInPandas``, both Arrow-batched, both DuckDB-verified.

The reference authors scalar UDFs only (``src/udf.rs``, ``src/argmax.rs``);
these demonstrate the remaining Spark Python-UDF shapes with the same
oracle discipline.  Outputs are rounded to 6 digits because numpy
reduces with pairwise summation while SQL engines sum sequentially —
same math, different last ulp.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from .registry import register
from .util import table


@register(
    "udaf_mean_norm",
    oracle="""
    SELECT label,
           ROUND(AVG(sqrt(list_inner_product(CAST(embedding AS DOUBLE[]),
                                             CAST(embedding AS DOUBLE[])))), 6) AS mean_norm,
           COUNT(*) AS n
    FROM embeddings GROUP BY label
    """,
    doc="grouped-aggregate pandas UDF: mean embedding L2 norm per label "
    "(Arrow-batched per group; partial aggregation is Spark's, the Python "
    "side sees one group at a time)",
)
def udaf_mean_norm(spark, sf_dir):
    @F.pandas_udf("double")
    def mean_norm(vs: pd.Series) -> float:
        mat = np.stack(vs.to_numpy()).astype(np.float64)
        return float(np.round(np.mean(np.sqrt(np.einsum("ij,ij->i", mat, mat))), 6))

    @F.pandas_udf("long")
    def group_size(vs: pd.Series) -> int:
        return len(vs)

    # grouped-agg pandas UDFs cannot mix with JVM aggregates in one agg —
    # the group count is a second pandas aggregate
    e = table(spark, sf_dir, "embeddings")
    v = F.col("embedding").cast("array<double>")
    return e.groupBy("label").agg(
        mean_norm(v).alias("mean_norm"),
        group_size(F.col("vec_id")).alias("n"),
    )


@register(
    "grouped_map_centroid",
    oracle="""
    SELECT label,
           ROUND(AVG(CAST(embedding[1] AS DOUBLE)), 6) AS dim0,
           ROUND(AVG(CAST(embedding[2] AS DOUBLE)), 6) AS dim1,
           COUNT(*) AS n
    FROM embeddings GROUP BY label
    """,
    doc="grouped-map applyInPandas: per-label centroid head (each group "
    "arrives as one pandas frame; at scale groups must fit an executor — "
    "use the UDAF shape when they may not)",
)
def grouped_map_centroid(spark, sf_dir):
    def centroid(pdf: pd.DataFrame) -> pd.DataFrame:
        mat = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
        return pd.DataFrame(
            {
                "label": [int(pdf["label"].iloc[0])],
                "dim0": [float(np.round(np.mean(mat[:, 0]), 6))],
                "dim1": [float(np.round(np.mean(mat[:, 1]), 6))],
                "n": [len(pdf)],
            }
        )

    e = table(spark, sf_dir, "embeddings").select("label", "embedding")
    return e.groupBy("label").applyInPandas(
        centroid, schema="label int, dim0 double, dim1 double, n bigint"
    )


@register(
    "udtf_split_words",
    oracle=r"""
    SELECT doc_id, CAST(i - 1 AS INTEGER) AS pos, w AS word
    FROM (
      SELECT doc_id,
             unnest(string_split_regex(text, '\s+')) AS w,
             generate_subscripts(string_split_regex(text, '\s+'), 1) AS i
      FROM documents WHERE doc_id < 50)
    """,
    doc="Arrow-optimized Python UDTF with LATERAL join — surface coverage; "
    "at scale prefer explode/posexplode (JVM) for this shape",
)
def udtf_split_words(spark, sf_dir):
    from pyspark.sql.functions import udtf

    @udtf(returnType="pos int, word string", useArrow=True)
    class SplitWords:
        def eval(self, text: str):
            for i, w in enumerate(text.split()):
                yield i, w

    spark.udtf.register("split_words", SplitWords)
    table(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    return spark.sql(
        """
        SELECT d.doc_id, t.pos, t.word
        FROM documents d, LATERAL split_words(d.text) t
        WHERE d.doc_id < 50
        """
    )
