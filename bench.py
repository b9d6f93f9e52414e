"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line:
  {"metric": "total_wall_sec", "value": N, "unit": "sec",
   "queries": {"<name>": sec, ...}, "sf": <scale factor>}

Each query is materialized with the noop sink (full plan executes, no
driver collect, no result materialization cost), after a small warmup
that absorbs JVM/codegen startup.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO_ROOT)

#: Headline set: one per load-bearing subsystem (scan+agg, joins, windows,
#: JSON scan, ML inference, TSV e2e, minhash dedup, vector top-k, text).
BENCH_QUERIES = [
    "rel_agg_q1",
    "rel_join_inner_agg",
    "rel_window_frame",
    "rel_scalar_json",
    "lgbm_infer_embeddings",
    "lgbm_tsv_flagship",
    "pipe_dedup_minhash",
    "pipe_sim_topk",
    "pipe_text_stats",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", str(min(os.cpu_count() or 8, 32)))
    try:
        sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", ""))
    except ValueError:
        sf = -1.0

    from pyspark.sql import SparkSession

    import __spark_entry__ as entry_mod

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("lightfusion-bench")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    qs = entry_mod.queries()
    # warmup: scan the fact table once (JVM + codegen + parquet footer cache)
    spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")).count()

    timings: dict[str, float] = {}
    for name in BENCH_QUERIES:
        t0 = time.time()
        qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        timings[name] = round(time.time() - t0, 3)

    print(
        json.dumps(
            {
                "metric": "total_wall_sec",
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
