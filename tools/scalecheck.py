"""Scale smoke: run the heavy operators on inflated copies of the sf0.1
tables to observe scaling behavior beyond the bench scale.

Inflation replicates each row R times with shifted ids (and a per-replica
suffix word on documents so replicas are *near*-duplicates, exercising
the fuzzy-dedup path rather than trivial exact collapse).  Nothing is
written to disk; results print as one JSON line per scenario.

Usage: python tools/scalecheck.py [--sf /root/testdata/sf0.1]
                                  [--only SUBSTR [SUBSTR ...]]

``--only`` runs just the scenarios whose label contains any of the given
substrings (the full sweep takes ~15 min; a single scenario seconds).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)


def inflate(df, times: int, id_col: str, id_stride: int, text_col: str | None = None):
    from pyspark.sql import functions as F

    rep = df.crossJoin(
        F.broadcast(
            df.sparkSession.range(times).select(F.col("id").alias("_rep"))
        )
    ).withColumn(id_col, F.col(id_col) + F.col("_rep") * id_stride)
    if text_col is not None:
        rep = rep.withColumn(
            text_col, F.concat_ws(" ", F.col(text_col), F.concat(F.lit("rep"), F.col("_rep")))
        )
    return rep.drop("_rep")


ONLY: list[str] = []


def timed(label, fn):
    if ONLY and not any(s in label for s in ONLY):
        return None
    t0 = time.time()
    n = fn()
    dt = round(time.time() - t0, 2)
    print(json.dumps({"scenario": label, "rows_out": n, "sec": dt}))
    return dt


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--only", nargs="*", default=[])
    args = ap.parse_args()
    ONLY[:] = args.only

    from pyspark.sql import SparkSession, functions as F

    from lightfusion_spark.functions.argmax import argmax
    from lightfusion_spark.functions.inference import make_lightgbm_udf
    from lightfusion_spark.operators import dedup, similarity, skew

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("lightfusion-scalecheck")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.driver.memory", "24g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")

    docs = spark.read.parquet(f"{args.sf}/documents.parquet")
    emb = spark.read.parquet(f"{args.sf}/embeddings.parquet")
    events = spark.read.parquet(f"{args.sf}/events.parquet")
    n_docs, n_emb, n_ev = docs.count(), emb.count(), events.count()

    docs10 = inflate(docs, 10, "doc_id", 1_000_000, "text")          # 50k near-dup docs
    emb100 = inflate(emb, 100, "vec_id", 1_000_000)                  # 200k vectors
    ev20 = inflate(events, 20, "event_id", 100_000_000)              # 2M events

    print(json.dumps({"base": {"docs": n_docs, "emb": n_emb, "events": n_ev}}))

    timed(
        f"minhash_dedup_{10 * n_docs}_docs",
        lambda: dedup.minhash_near_duplicates(docs10, "doc_id", "text").count(),
    )
    timed(
        f"simhash_fingerprints_{10 * n_docs}_docs",
        lambda: dedup.simhash(docs10, "doc_id", "text").count(),
    )
    # fingerprints cached: both chunk sides of the blocked join reuse them.
    # 16-bit vs 60-bit at the same radius measures the pigeonhole
    # candidate-volume reduction (4-bit chunks match ~1/16 of the corpus,
    # 15-bit chunks ~1/32768) — the reason 60-bit is the operator default.
    for bits in (16, 60):
        fp = dedup.simhash(docs10, "doc_id", "text", bits=bits).cache()
        fp.count()
        timed(
            f"simhash{bits}_blocked_pairs_{10 * n_docs}_docs",
            lambda fp=fp, bits=bits: dedup.simhash_near_duplicates(
                fp, "doc_id", max_hamming=3, bits=bits
            ).count(),
        )
        fp.unpersist()

    q = emb.select("vec_id", "embedding").limit(50)
    timed(
        f"topk_cosine_50q_x_{100 * n_emb}_corpus",
        lambda: similarity.topk_cosine(emb100, q, "vec_id", "embedding", k=5).count(),
    )
    planes = similarity.random_hyperplanes(8, 64)
    timed(
        f"topk_lsh_8planes_50q_x_{100 * n_emb}_corpus",
        lambda: similarity.topk_cosine_lsh(emb100, q, planes, "vec_id", "embedding", k=5).count(),
    )

    model = os.path.join(REPO_ROOT, "models", "embed_cls.lgbm")
    for bs in (1, 64, 4096):
        udf = make_lightgbm_udf(model, batch_size=bs, spark=spark)
        timed(
            f"inference_{100 * n_emb}_rows_batch{bs}",
            lambda: emb100.select(
                argmax(udf(F.col("embedding").cast("array<double>"))).alias("p")
            ).groupBy("p").count().count(),
        )

    timed(
        f"topk_gemm_50q_x_{100 * n_emb}_corpus",
        lambda: similarity.topk_cosine_gemm(emb100, q, "vec_id", "embedding", k=5).count(),
    )

    timed(
        f"salted_agg_{20 * n_ev}_events_5keys",
        lambda: skew.salted_agg(ev20, ["event_type"], "event_id").count(),
    )

    # Connected-components round-count A/B on a worst-case path graph
    # (template-spam chains): two-phase contracts O(log n), propagation
    # crawls one hop per round.  rows_out records the converged ROUNDS.
    def _cc_rounds(n, algorithm, max_iterations):
        vs = spark.range(n).select(F.col("id").alias("doc_id"))
        ps = spark.range(n - 1).select(
            F.col("id").alias("id_a"), (F.col("id") + 1).alias("id_b")
        )
        out = dedup.connected_components(
            ps, vs, "doc_id", max_iterations=max_iterations, algorithm=algorithm
        )
        assert out.where(F.col("component") != 0).count() == 0, algorithm
        return dedup.last_cc_rounds

    # same 64-node chain: ~6 rounds vs 63
    timed("cc_two_phase_path64_rounds", lambda: _cc_rounds(64, "two_phase", 25))
    timed("cc_propagation_path64_rounds", lambda: _cc_rounds(64, "propagation", 70))
    # 8x the chain costs two-phase only ~log2(8)=3 more rounds
    timed("cc_two_phase_path512_rounds", lambda: _cc_rounds(512, "two_phase", 25))

    # Semantic dedup: per-cluster GEMM pair scan at 100x vectors (64 cells
    # keep clusters ~n/64; the SQL pair-scan variant at this size would
    # evaluate ~64x(n/64)^2/2 interpreted folds — the reason GEMM is the
    # default; the SQL shape remains the sf0.01 oracle literal).
    timed(
        f"semantic_dedup_gemm_{100 * n_emb}_vectors_64cells",
        lambda: similarity.semantic_dedup(
            emb100, "vec_id", "embedding", n_centroids=64, n_iters=1, threshold=0.35
        ).count(),
    )

    # K-means reduce A/B at 100x vectors: the exact scaled-BIGINT
    # reduction (oracle contract) vs plain double sums (production fast
    # path) — the gap was 14x when the exact path was DECIMAL(28,9).
    for exact in (True, False):
        timed(
            f"kmeans_1iter_{100 * n_emb}_vectors_16cells_exact{exact}",
            lambda exact=exact: similarity.kmeans_centroids(
                emb100, "vec_id", "embedding",
                n_centroids=16, n_iters=1, exact_reduce=exact,
            ).count(),
        )

    # Keyless range join at 2M events x 100 hot windows: bucketed
    # equi-join vs the naive broadcast nested-loop the same predicate
    # plans without bucketing.
    from lightfusion_spark.operators.asof import bucketed_range_join
    from lightfusion_spark.streaming.events import ts_micros_col

    hour_us = 3_600_000_000
    iv = (
        events.withColumn("ts_us", ts_micros_col(events))
        .where(F.col("event_type") == "purchase")
        .orderBy(F.col("value").desc(), "event_id")
        .limit(100)
        .select(
            F.col("event_id").alias("window_id"),
            F.col("ts_us").alias("w_start"),
            (F.col("ts_us") + F.lit(hour_us)).alias("w_end"),
        )
        .cache()
    )
    iv.count()
    left = ev20.withColumn("ts_us", ts_micros_col(ev20)).select(
        "ts_us", "event_type", "value"
    )
    timed(
        f"range_join_bucketed_{20 * n_ev}_events_x_100_windows",
        lambda: bucketed_range_join(left, iv, "ts_us", "w_start", "w_end", hour_us).count(),
    )
    timed(
        f"range_join_naive_bnlj_{20 * n_ev}_events_x_100_windows",
        lambda: left.join(
            iv, F.col("ts_us").between(F.col("w_start"), F.col("w_end"))
        ).count(),
    )


if __name__ == "__main__":
    main()
