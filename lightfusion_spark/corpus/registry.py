"""QuerySpec registry — the single source of truth behind
``__spark_entry__.queries()`` / ``oracle_sql()``.

Design rules for every spec (they make the DuckDB hash-compare exact):

* alias every computed column identically in the Spark plan and the oracle;
* sums/avgs of doubles go through ``DECIMAL(18,4)`` (exact, associative)
  and back to double, so Spark's partial aggregation order can never change
  a result bit (driver compares order-insensitive value hashes);
* row-level float arithmetic (+,-,*,/) is IEEE-identical across engines and
  needs no rounding; transcendentals (exp/ln) are rounded to 6 decimals
  because libm implementations may differ in the last ulp;
* no raw TIMESTAMP columns in outputs — return date parts / DATE / strings
  (Spark TIMESTAMP is an instant, DuckDB's is naive; formatting diverges).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

#: name -> spec, in registration order.
REGISTRY: dict[str, "QuerySpec"] = {}


@dataclass
class QuerySpec:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # DuckDB SQL over the pre-registered table views; None => rows-only check
    doc: str = ""


def register(name: str, oracle: str | None, doc: str = ""):
    """Decorator: ``@register("rel_agg_q1", oracle="SELECT ...")``."""

    def wrap(fn):
        REGISTRY[name] = QuerySpec(name=name, fn=fn, oracle=oracle, doc=doc)
        return fn

    return wrap


#: Curated export order.  The driver's correctness gate evaluates only the
#: FIRST 50 ``queries()`` entries, so the names below are emitted first.
#:
#: Round-11 rotation (per the recorded round-10 backlog): the window
#: re-verifies the STALEST official rows wholesale —
#: 4 flagship Layer-A queries (windowed every round)
#: + the 3 remaining r04-green rows (pipe_simhash_pairs,
#:   pipe_text_langid, rel_tpch_q14_shape — each also re-confirmed
#:   exact by the round-9 judge's own parity run)
#: + the 6 remaining r05-green rows (events_asof_forward — the as-of
#:   subfamily's re-window, flagged in the r10 header — plus
#:   events_attribution, pipe_boilerplate_lines, pipe_dedup_exact,
#:   pipe_dedup_incremental, pipe_split_stratified)
#: + 12 of the 34 r06-green rows (alphabetical; the rows deferred to the
#:   r12 backlog each keep an in-window family sibling:
#:   events_asof_bucketed [as-of repped by events_asof_join +
#:   events_asof_forward], pipe_dedup_minhash_incr + pipe_dedup_spans
#:   [dedup repped 3-way after the late swaps below], pipe_multimodal_png/_video/_wav [multimodal
#:   repped by codec/decode/jpeg], pipe_quality_filter [repped by
#:   pipe_quality_model], pipe_sim_ivf_probe2 + pipe_sim_recall_ivf +
#:   pipe_sim_topk_gemm [similarity repped by pipe_sim_ivf +
#:   pipe_sim_ivf_kmeans + pipe_sim_topk], rel_join_right +
#:   rel_salted_join [joins repped by rel_tpch_q14_shape +
#:   rel_join_inner_agg])
#: + 11 per-category §2.3 representatives, each its family's STALEST
#:   verified sibling (rel_case_when r8, rel_agg_rollup r7,
#:   rel_window_frame r8, rel_sort_limit r9, rel_set_except r8,
#:   rel_subquery_scalar r7, rel_scalar_string r7, rel_higher_order
#:   r8, udaf_mean_norm r8, rel_approx_sketch r9, rel_recursive_cte
#:   r7 — doubling as the Spark-4 RECURSIVE rep)
#: + round-11 NEW faces, displacing the r07 swap rows one-for-one as
#:   they landed: pipe_web_lpa (displaced events_funnel — r07 green,
#:   events repped 5-way in-window), pipe_text_entropy (displaced
#:   events_gapfill — r07 green, same family rep story),
#:   pipe_shard_balanced (displaced events_ohlc — r07 green, same
#:   family rep story), pipe_mad_outliers (displaced
#:   pipe_corpus_health — r07 green, profiling repped by the face
#:   itself plus pipe_text_stats in-window)
#: (The 4 r07 swap rows — events_funnel, events_gapfill, events_ohlc,
#:   pipe_corpus_health — each ceded its slot to a round-11 face and
#:   heads the r12 backlog with its r07 green.)
#: 4+3+6+12+11+14 = 50 exactly (14 = the round-11 new faces; the r06
#: block shrank to 12 as pipe_dedup_simhash, events_windowed_stats,
#: pipe_dedup_minhash, pipe_dedup_semantic, pipe_lm_score,
#: pipe_text_bm25, pipe_chunk_bpe, events_range_join and
#: events_sessionize ceded slots to the late faces below — dedup
#: stays 3-way (simhash_pairs/exact/incremental), events 3-way
#: (asof_forward/attribution/asof_join), LM scoring is repped by the
#: two new KN faces, text by langid/text_stats/entropy, tokenization
#: by pack_bpe + tokenize_bpe).  The
#: round-12 re-window backlog is the 22 deferred r06 rows above plus
#: the 4 ceded r07 swap rows, then the rest of the r07 block (34 rows
#: after this round's picks).  Every rotated-out name was officially green in
#: r05-r10 and moves to WINDOW_EXEMPT; tests/test_registry_window.py
#: asserts every registered query is either in the current window or
#: has a recorded green row from a past driver window, and
#: tools/parity.py + CI keep sweeping the whole registry regardless.
PRIORITY: list[str] = [
    # Layer A flagship (windowed every round)
    "lgbm_tsv_flagship",
    "lgbm_infer_embeddings",
    "argmax_embeddings",
    "settings_introspection",
    # r04 block — the stalest officials
    "pipe_simhash_pairs",
    "pipe_text_langid",
    "rel_tpch_q14_shape",
    # r05 block
    "events_asof_forward",
    "events_attribution",
    "pipe_boilerplate_lines",
    "pipe_dedup_exact",
    "pipe_dedup_incremental",
    "pipe_split_stratified",
    # r06 block (12 of 34; the rest head the r12 backlog)
    "events_asof_join",
    "pipe_decontaminate",
    "pipe_e2e_model_curation",
    "pipe_multimodal_codec",
    "pipe_multimodal_decode",
    "pipe_pack_bpe",
    "pipe_quality_model",
    "pipe_sim_ivf_kmeans",
    "pipe_sim_topk",
    "pipe_text_stats",
    "pipe_tokenize_bpe",
    "rel_join_inner_agg",
    # per-category 2.3 reps, stalest verified sibling each
    "rel_case_when",
    "rel_agg_rollup",
    "rel_window_frame",
    "rel_sort_limit",
    "rel_set_except",
    "rel_subquery_scalar",
    "rel_scalar_string",
    "rel_higher_order",
    "udaf_mean_norm",
    "rel_approx_sketch",
    "rel_recursive_cte",
    # round-11 NEW faces (never driver-verified), each displacing one
    # r07 swap slot back to WINDOW_EXEMPT (r07 green; families repped:
    # events by the five in-window events rows)
    "pipe_web_lpa",
    "pipe_text_entropy",
    "pipe_shard_balanced",
    "pipe_mad_outliers",
    # ... and a FIFTH round-11 face: k-core pruning (displaced
    # pipe_multimodal_jpeg — r06 green, multimodal repped in-window by
    # the codec and decode rows — to the r12 backlog head)
    "pipe_web_kcore",
    # ... and a SIXTH: exact triangle counting / clustering coefficients
    # (displaced pipe_dedup_simhash — r06 green, dedup still repped
    # 5-way in-window by simhash_pairs/exact/incremental/minhash/
    # semantic — to the r12 backlog)
    "pipe_web_triangles",
    # ... and a SEVENTH: corpus BLEU, the first eval-metrics face
    # (displaced events_windowed_stats — r06 green, events still
    # repped 5-way in-window by asof_forward/attribution/asof_join/
    # range_join/sessionize — to the r12 backlog)
    "pipe_eval_bleu",
    # ... and an EIGHTH: Cohen's-kappa annotator agreement (displaced
    # pipe_dedup_minhash — r06 green, dedup still repped 4-way
    # in-window by simhash_pairs/exact/incremental/semantic — to the
    # r12 backlog)
    "pipe_eval_kappa",
    # ... and a NINTH: UniMax budget-capped mixture allocation
    # (displaced pipe_dedup_semantic — r06 green, dedup still repped
    # 3-way in-window by simhash_pairs/exact/incremental — to the r12
    # backlog)
    "pipe_mix_unimax",
    # ... and a TENTH: the Kneser-Ney bigram LM, a same-family swap
    # (displaced pipe_lm_score — r06 green; the LM-scoring family is
    # repped by this new face itself plus the r07/r08-green ngram
    # variants)
    "pipe_lm_kneser_ney",
    # ... and an ELEVENTH: the Zipf-law corpus-health fit (displaced
    # pipe_text_bm25 — r06 green; BM25 stays repped by the r10-green
    # pipe_text_bm25_terms and text by langid/text_stats/entropy
    # in-window)
    "pipe_corpus_zipf",
    # ... and a TWELFTH: the trigram Kneser-Ney LM (displaced
    # pipe_chunk_bpe — r06 green, tokenization repped 2-way in-window
    # by pipe_pack_bpe + pipe_tokenize_bpe)
    "pipe_lm_kn_trigram",
    # ... and a THIRTEENTH: Fleiss' panel kappa (displaced
    # events_range_join — r06 green, events repped 4-way in-window by
    # asof_forward/attribution/asof_join/sessionize)
    "pipe_eval_fleiss",
    # ... and a FOURTEENTH: Wilson win-rate intervals (displaced
    # events_sessionize — r06 green, events repped 3-way in-window by
    # asof_forward/attribution/asof_join)
    "pipe_eval_winrate",
    # (all four r07 swap slots now hold round-11 faces; the r07 head
    # rows events_funnel/events_gapfill/events_ohlc/pipe_corpus_health
    # keep their r07 greens at the front of the r12 backlog)
]

#: Queries intentionally OUTSIDE the driver's 50-entry window.  Every name
#: here MUST have a green row in a recorded past driver window (enforced by
#: tests/test_registry_window.py, which cross-checks CORRECTNESS_r*.json):
#: each was hash-verified by an earlier driver gate and ceded its slot.
#: Round 11 cedes the whole round-10 window except the 4 flagship queries
#: (those 46 rows are the freshest in the registry) so the r04-r07 long
#: tail gets official re-verification; the r12 backlog (12 deferred r06
#: rows, then the r07 block) is listed in the PRIORITY header note.
WINDOW_EXEMPT: frozenset[str] = frozenset(
    {
        "events_asof_bucketed",
        "events_ewma_batch",
        "events_funnel",
        "events_gapfill",
        "events_heavy_hitters_batch",
        "events_ohlc",
        "events_range_join",
        "events_reservoir_batch",
        "events_sessionize",
        "events_stream_join",
        "events_stream_join_full",
        "events_windowed_stats",
        "grouped_map_centroid",
        "pipe_bpe_train",
        "pipe_bt_sources",
        "pipe_chunk_bpe",
        "pipe_chunk_documents",
        "pipe_cluster_embeddings",
        "pipe_cluster_report",
        "pipe_corpus_drift",
        "pipe_corpus_health",
        "pipe_curriculum_order",
        "pipe_decontaminate_bloom",
        "pipe_decontaminate_fuzzy",
        "pipe_dedup_components",
        "pipe_dedup_minhash",
        "pipe_dedup_minhash_incr",
        "pipe_dedup_ngram",
        "pipe_dedup_semantic",
        "pipe_dedup_simhash",
        "pipe_dedup_spans",
        "pipe_dedup_survivors",
        "pipe_diversity_sample",
        "pipe_drift_numeric",
        "pipe_dsir_select",
        "pipe_e2e_curation",
        "pipe_embed_detop",
        "pipe_embed_ivf_topk",
        "pipe_embed_project",
        "pipe_embed_text",
        "pipe_file_stats",
        "pipe_file_stats_distributed",
        "pipe_hard_negatives",
        "pipe_hybrid_rrf",
        "pipe_ingest_warc",
        "pipe_ingest_warc_clean",
        "pipe_layout_zorder",
        "pipe_lm_buckets",
        "pipe_lm_buckets_ngram",
        "pipe_lm_score",
        "pipe_lm_score_ngram",
        "pipe_mixture_domain",
        "pipe_mixture_sample",
        "pipe_mixture_temperature",
        "pipe_model_calibration",
        "pipe_multimodal_audio_frames",
        "pipe_multimodal_jpeg",
        "pipe_multimodal_png",
        "pipe_multimodal_resize",
        "pipe_multimodal_scenecut",
        "pipe_multimodal_video",
        "pipe_multimodal_wav",
        "pipe_nb_domain",
        "pipe_neardup_embedding",
        "pipe_normalize_unicode",
        "pipe_pack_sequences",
        "pipe_pca_top",
        "pipe_preference_pairs",
        "pipe_privacy_kanon",
        "pipe_probe_train",
        "pipe_quality_filter",
        "pipe_quality_model_categorical",
        "pipe_robots_precedence",
        "pipe_sample_weighted",
        "pipe_schema_drift",
        "pipe_sentence_chunks",
        "pipe_shard_assign",
        "pipe_sim_ann_lsh",
        "pipe_sim_ivf",
        "pipe_sim_ivf_pq",
        "pipe_sim_ivf_pq_probe2",
        "pipe_sim_ivf_pq_rerank",
        "pipe_sim_ivf_probe2",
        "pipe_sim_lsh_banded",
        "pipe_sim_lsh_multiprobe",
        "pipe_sim_recall_ivf",
        "pipe_sim_topk_gemm",
        "pipe_sim_topk_jl",
        "pipe_sim_topk_quantized",
        "pipe_simhash_wide",
        "pipe_sketch_append",
        "pipe_sketch_cms",
        "pipe_sketch_hll",
        "pipe_sketch_joinsize",
        "pipe_sketch_quantile",
        "pipe_source_overlap",
        "pipe_split_group",
        "pipe_strip_boilerplate",
        "pipe_text_bm25",
        "pipe_text_bm25_terms",
        "pipe_text_fingerprint",
        "pipe_text_keywords",
        "pipe_text_novelty",
        "pipe_text_pii",
        "pipe_text_redact",
        "pipe_text_repetition",
        "pipe_text_tokens",
        "pipe_text_urls",
        "pipe_truncate_matryoshka",
        "pipe_url_blocklist",
        "pipe_url_canonicalize",
        "pipe_warc_robots_clean",
        "pipe_web_hits",
        "pipe_web_links",
        "pipe_web_pagerank",
        "pipe_web_ppr",
        "pipe_web_rank_sample",
        "pipe_web_robots",
        "rel_agg_argminmax",
        "rel_agg_cube",
        "rel_agg_distinct",
        "rel_agg_q1",
        "rel_cast_battery",
        "rel_cdc_latest",
        "rel_cte",
        "rel_distinct",
        "rel_explode",
        "rel_filter_project",
        "rel_fuzzy_match",
        "rel_group_by_all",
        "rel_grouping_sets",
        "rel_having",
        "rel_histogram",
        "rel_join_anti",
        "rel_join_cross",
        "rel_join_full_outer",
        "rel_join_left",
        "rel_join_part_supplier",
        "rel_join_right",
        "rel_join_semi",
        "rel_join_theta",
        "rel_lateral_join",
        "rel_not_in_subquery",
        "rel_outlier_iqr",
        "rel_part_stats",
        "rel_percentile",
        "rel_pivot",
        "rel_profile_orders",
        "rel_regexp",
        "rel_salted_agg",
        "rel_salted_join",
        "rel_scalar_array",
        "rel_scalar_bitwise",
        "rel_scalar_conditional",
        "rel_scalar_date",
        "rel_scalar_json",
        "rel_scalar_math",
        "rel_scalar_string2",
        "rel_scalar_struct_map",
        "rel_scd2_asof",
        "rel_set_intersect",
        "rel_set_union",
        "rel_skew_report",
        "rel_subquery_in_exists",
        "rel_topk_group",
        "rel_tpch_pipe_syntax",
        "rel_tpch_q10_shape",
        "rel_tpch_q17_shape",
        "rel_tpch_q18_shape",
        "rel_tpch_q20_shape",
        "rel_tpch_q21_shape",
        "rel_tpch_q2_shape",
        "rel_tpch_q3_shape",
        "rel_tpch_q5_shape",
        "rel_tpch_q7_shape",
        "rel_tpch_q8_shape",
        "rel_tpch_q9_shape",
        "rel_union_all",
        "rel_unpivot",
        "rel_variant",
        "rel_window_analytics",
        "rel_window_lag",
        "rel_window_range_frame",
        "rel_window_rank",
        "udtf_split_words",
    }
)


def _ordered() -> list[str]:
    head = [n for n in PRIORITY if n in REGISTRY]
    seen = set(head)
    return head + [n for n in REGISTRY if n not in seen]


def query_functions() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: REGISTRY[name].fn for name in _ordered()}


def oracle_strings() -> dict[str, str]:
    return {
        name: REGISTRY[name].oracle
        for name in _ordered()
        if REGISTRY[name].oracle is not None
    }
