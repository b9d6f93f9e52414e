"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line:
  {"metric": "total_wall_sec", "value": N, "unit": "sec",
   "queries": {"<name>": sec, ...}, "sf": <scale factor>}

When the per-query name->sec map would push the line past the recorder's
~2000-char tail window (134 query names do not fit), ``queries`` is
emitted empty and the per-query data instead rides ``"qv"``: a positional
array of CENTISECOND integers, one per entry of ``BENCH_QUERIES`` in
order (``qv[i] == round(seconds * 100)`` for ``BENCH_QUERIES[i]``).  The
full-detail map (seconds, spread, sample counts) is always written to
``BENCH_LAST.json`` alongside.

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
    "rel_tpch_q3_shape",
    "rel_tpch_q5_shape",
    "rel_window_frame",
    "rel_scalar_json",
    "lgbm_infer_embeddings",
    "lgbm_tsv_flagship",
    "pipe_dedup_minhash",
    "pipe_dedup_spans",
    "pipe_dedup_incremental",
    "pipe_simhash_wide",
    "pipe_dedup_semantic",
    "pipe_sim_topk_gemm",
    "pipe_sim_ivf_kmeans",
    "events_asof_join",
    "events_asof_bucketed",
    "events_attribution",
    "pipe_text_stats",
    "pipe_text_repetition",
    "pipe_text_bm25",
    "pipe_lm_score",
    "pipe_multimodal_codec",
    "pipe_e2e_curation",
    "rel_tpch_q18_shape",
    # round-6 operators
    "pipe_tokenize_bpe",
    "pipe_chunk_bpe",
    "pipe_multimodal_png",
    "pipe_multimodal_jpeg",
    "pipe_multimodal_wav",
    "pipe_multimodal_video",
    "pipe_quality_model",
    "pipe_sim_recall_ivf",
    "pipe_e2e_model_curation",
    # round-7 operators
    "pipe_ingest_warc",
    "pipe_ingest_warc_clean",
    "pipe_embed_text",
    "pipe_embed_ivf_topk",
    "pipe_sim_lsh_banded",
    "pipe_lm_score_ngram",
    "pipe_web_pagerank",
    "pipe_web_links",
    "pipe_sim_ivf_pq_rerank",
    "events_gapfill",
    "pipe_corpus_health",
    # round-8 operators
    "events_stream_join",
    "pipe_text_keywords",
    "pipe_embed_project",
    "pipe_pca_top",
    "pipe_embed_detop",
    "pipe_sim_topk_jl",
    "pipe_sketch_cms",
    "pipe_text_novelty",
    "pipe_source_overlap",
    # round-9: the heaviest operator families previously without a
    # headline number (r8 verdict item 3) + the new trainer
    "pipe_dedup_components",
    "pipe_hard_negatives",
    "pipe_sim_ivf_pq",
    "pipe_probe_train",
    "events_stream_join_full",
    "pipe_warc_robots_clean",
    "pipe_hybrid_rrf",
    "pipe_cluster_embeddings",
    # round-10: the categorical-split scorer, the full redaction chain,
    # and the three streaming batch twins
    "pipe_quality_model_categorical",
    "pipe_text_redact",
    "events_reservoir_batch",
    "events_heavy_hitters_batch",
    "events_ewma_batch",
    # late round-10: the heavy new faces (fuzzy decontamination runs the
    # full cross-corpus MinHash machinery; q8 is the widest join tree in
    # the registry; preference pairs = window + rank-pruned self-join)
    "pipe_decontaminate_fuzzy",
    "rel_tpch_q8_shape",
    "pipe_preference_pairs",
    "pipe_sketch_hll",
    "pipe_sketch_quantile",
    "pipe_nb_domain",
    "pipe_dsir_select",
    "pipe_bt_sources",
    "pipe_sketch_joinsize",
    "pipe_privacy_kanon",
    "pipe_mixture_domain",
    "pipe_sketch_append",
    "pipe_web_ppr",
    "pipe_web_hits",
    "pipe_corpus_drift",
    "pipe_schema_drift",
    "pipe_drift_numeric",
    # round-11: label-propagation communities (the 4-round LPA loop is
    # the same iterative join+agg shape as pagerank — benched beside it)
    # + the token-entropy quality signal (the one shuffling text op)
    "pipe_web_lpa",
    "pipe_text_entropy",
    "pipe_shard_balanced",
    "pipe_mad_outliers",
    "pipe_web_kcore",
    # late round-11: exact triangles (the wedge join is the heaviest
    # one-shot graph op), the eval-metrics pair, UniMax allocation, and
    # the KN model (train + score over the whole corpus)
    "pipe_web_triangles",
    "pipe_eval_bleu",
    "pipe_eval_kappa",
    "pipe_mix_unimax",
    "pipe_lm_kneser_ney",
    "pipe_lm_kn_trigram",
    # round-12 faces
    "pipe_eval_bleu_by_system",
    "pipe_eval_krippendorff",
    "pipe_ingest_conversations",
    "pipe_dedup_turns",
    "pipe_dedup_conversations",
    "pipe_eval_chrf",
    "pipe_eval_distinct_n",
    "pipe_multimodal_flac",
    "pipe_multimodal_mp4",
    # round-13 faces
    "pipe_eval_chrf_by_system",
    "pipe_dedup_conversations_fuzzy",
    "pipe_conversation_quality",
    "pipe_sft_spans",
    "pipe_eval_wer",
    "pipe_eval_wer_by_system",
    "pipe_eval_ranking",
    "pipe_eval_qa",
    "pipe_eval_rouge",
    "pipe_eval_rouge_by_system",
    "pipe_eval_bleu_bootstrap",
    "pipe_eval_wer_bootstrap",
    "pipe_eval_ranking_bootstrap",
    "pipe_eval_qa_by_system",
    "pipe_eval_ranking_by_policy",
    "pipe_train_shards",
    "pipe_eval_chrf_bootstrap",
    "pipe_eval_rouge_bootstrap",
    "pipe_eval_auc",
    "pipe_eval_calibration",
    "pipe_eval_spearman",
    # round-15 faces
    "pipe_eval_qa_bootstrap",
    "pipe_eval_spearman_by_judge",
    "pipe_eval_pr",
    "pipe_eval_auc_bootstrap",
    "pipe_pack_efficiency",
    # round-16 faces
    "pipe_eval_pr_bootstrap",
    "pipe_eval_kendall",
    "pipe_eval_brier",
    "pipe_eval_pass_at_k",
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
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    qs = entry_mod.queries()
    # Warmup: exercise every engine path the bench set hits (parquet scan,
    # hash agg, shuffle join, window, higher-order funcs, Python worker
    # pool) so JIT/codegen/daemon startup doesn't land on the first timed
    # query.  Runs on a 10k-row slice — a few seconds, independent of sf.
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    li = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")).limit(10000)
    w = Window.partitionBy("l_returnflag").orderBy("l_orderkey")
    (
        li.groupBy("l_returnflag")
        .agg(F.sum(F.col("l_quantity").cast("decimal(28,6)")).alias("s"))
        .join(li.select("l_returnflag").distinct(), "l_returnflag")
        .count()
    )
    li.select(F.row_number().over(w).alias("rn")).where("rn <= 5").count()
    li.select(F.explode(F.array_distinct(F.split(F.lit("a b c a"), " ")))).count()
    spark.range(1000).select(
        F.pandas_udf(lambda s: s + 1, "long")(F.col("id"))
    ).count()
    # the minhash plan compiles ~a dozen codegen stages; warm them on a
    # 100-doc slice so the timed run measures execution, not janino
    from lightfusion_spark.operators import dedup

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet")).limit(100)
    dedup.minhash_near_duplicates(docs, "doc_id", "text").write.format(
        "noop"
    ).mode("overwrite").save()

    # Best-of-N per query with ADAPTIVE re-runs: the host VM shows
    # occasional multi-x slowdowns (measured in docs/SCALE.md), so a single
    # sample makes round-over-round deltas meaningless — and a fixed pair
    # of samples can still be one cold + one warm (round-4 bench:
    # pipe_dedup_semantic spread 7.8 s on a 4.0 s best).  Each query runs
    # at least ``n_runs`` times, then keeps re-running (up to ``max_runs``)
    # until its two best samples agree within 50% of the best.  Reported
    # ``spread`` is that two-best gap — the confidence of the min
    # estimate — and ``samples`` the per-query run count.
    n_runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "2"))
    max_runs = int(os.environ.get("SPARK_GRAFT_BENCH_MAX_RUNS", "5"))
    timings: dict[str, float] = {}
    spread: dict[str, float] = {}
    n_samples: dict[str, int] = {}

    def _two_best_gap(samples: list[float]) -> float:
        if len(samples) < 2:  # single-run mode (SPARK_GRAFT_BENCH_RUNS=1)
            return 0.0
        lo = sorted(samples)
        return lo[1] - lo[0]

    # Per-query plan warmup at the smallest scale: whole-stage codegen
    # classes are keyed by the generated code (schema/plan shape, not data
    # volume), so one tiny-sf run compiles exactly the classes the timed
    # run needs.  Without it a multi-stage plan can pay ~10 s of janino
    # compilation INSIDE its timed samples — consistently, so best-of-N
    # and the adaptive re-run trigger never see it as noise
    # (events_asof_bucketed measured 9.5 s cold vs 1.6 s warm at sf0.1).
    warm_dir = os.environ.get("SPARK_GRAFT_WARMUP_SF_DIR", "/root/testdata/sf0.001")
    if not os.path.isdir(warm_dir):
        # fall back to the timed dataset: the warmup then costs one full-
        # size run per query instead of crashing before timing anything
        print(f"warmup dir {warm_dir} missing; warming on {sf_dir}", file=sys.stderr)
        warm_dir = sf_dir

    for name in BENCH_QUERIES:
        qs[name](spark, warm_dir).write.format("noop").mode("overwrite").save()
        spark.catalog.clearCache()
        samples: list[float] = []
        while len(samples) < max(n_runs, 1) or (
            n_runs >= 2
            and len(samples) < max_runs
            and _two_best_gap(samples) > 0.5 * min(samples)
        ):
            t0 = time.time()
            qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            samples.append(time.time() - t0)
            # Measurement isolation: a few operators cache intermediate
            # relations (minhash shingle hashes, simhash fingerprints);
            # each timed rebuild creates fresh entries, and the
            # accumulated blocks squeeze execution memory for LATER
            # queries.  Dropping them between runs keeps each
            # measurement independent.
            spark.catalog.clearCache()
        timings[name] = round(min(samples), 3)
        spread[name] = round(_two_best_gap(samples), 3)
        n_samples[name] = len(samples)

    # The recorder that captures this process keeps only the LAST ~2000
    # chars of output, so the stdout line must stay compact: rounds 3/5/6
    # shipped spread+samples inline and the recorded line lost its head and
    # failed to parse.  Full detail (spread, per-query sample counts) goes
    # to BENCH_LAST.json; stdout carries only the contract fields.
    detail = json.dumps(
        {
            "metric": "total_wall_sec",
            "value": round(sum(timings.values()), 3),
            "unit": "sec",
            "queries": timings,
            "spread": spread,
            "samples": n_samples,
            "runs_per_query": n_runs,
            "sf": sf,
        },
        separators=(",", ":"),
    )
    with open(os.path.join(REPO_ROOT, "BENCH_LAST.json"), "w", encoding="utf-8") as fh:
        fh.write(detail + "\n")
    line = json.dumps(
        {
            "metric": "total_wall_sec",
            "value": round(sum(timings.values()), 3),
            "unit": "sec",
            "queries": timings,
            "sf": sf,
        },
        separators=(",", ":"),
    )
    if len(line) > 1900:  # stay under the recorder's tail window, whatever grows
        # The name->sec map does not fit; ship the per-query data as the
        # compact positional centisecond array documented in the module
        # docstring ("qv", BENCH_QUERIES order) so the driver still gets
        # per-query timings on one parseable line.
        line = json.dumps(
            {
                "metric": "total_wall_sec",
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "queries": {},
                "qv": [int(round(timings[n] * 100)) for n in BENCH_QUERIES],
                "sf": sf,
                "detail": "BENCH_LAST.json",
            },
            separators=(",", ":"),
        )
    sys.stdout.flush()
    print("\n" + line, flush=True)


if __name__ == "__main__":
    main()
