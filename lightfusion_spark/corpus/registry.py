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
#: Round-12 rotation (per the round-11 verdict's top item): the window is
#: spent wholesale on the registry's STALEST driver rows —
#: 4 flagship Layer-A queries (windowed every round)
#: + ALL 22 deferred r06 rows (the entire r06 rotation debt retired in one
#:   stroke: the four multimodal codecs, the five dedup variants, the two
#:   LM-scoring rows, the four events rows, the three similarity recalls,
#:   pipe_quality_filter, pipe_chunk_bpe, pipe_lm_score, and the two join
#:   reps rel_join_right + rel_salted_join)
#: + the 4 ceded r07 swap rows (events_funnel, events_gapfill, events_ohlc,
#:   pipe_corpus_health — each lent its slot to a round-11 face)
#: + 4 more r07 rows chosen as family flagships (pipe_web_pagerank,
#:   pipe_sim_ivf_pq, pipe_ingest_warc, pipe_dedup_components;
#:   pipe_mixture_temperature ceded its planned slot to a late face);
#:   the remaining 26 r07 rows head the r13 backlog, each keeping an
#:   in-window or r10/r11-green family sibling
#: + 7 per-category §2.3 representatives, each its family's STALEST
#:   verified sibling (rel_filter_project r9,
#:   rel_window_analytics r8, rel_union_all r8, rel_not_in_subquery r8,
#:   rel_explode r9, pipe_sketch_cms r8 — doubling as the
#:   approximate-ops rep, rel_variant r8 — doubling as the Spark-4 rep;
#:   the sort/limit, UDF, scalar and aggregations rep slots ceded to
#:   late faces, those families keeping r10/r11-green recorded rows)
#: + 9 round-12 NEW faces (the r11 displacement pattern: each landed by
#:   displacing a multiply-repped r07/r08/r09/r10-green row, recorded at
#:   its slot below): pipe_eval_bleu_by_system, pipe_eval_krippendorff,
#:   pipe_ingest_conversations, pipe_dedup_turns,
#:   pipe_dedup_conversations, pipe_eval_chrf, pipe_eval_distinct_n,
#:   pipe_multimodal_flac, pipe_multimodal_mp4
#: 4+22+4+4+7+9 = 50 exactly (4 swap + 4 flagship r07 rows; the reps
#: block ended at 7 after four slots ceded to late faces).  After this round every registry row's
#: last-green age is r07+ only for the 26 deferred r07 rows and the r08
#: long tail — the r13 backlog, listed stalest-first in docs/PLANS.md.
#: Every rotated-out name was officially green in r05-r11 and moves to
#: WINDOW_EXEMPT; tests/test_registry_window.py asserts every registered
#: query is either in the current window or has a recorded green row from
#: a past driver window, and tools/parity.py + CI keep sweeping the whole
#: registry regardless.
PRIORITY: list[str] = [
    # Layer A flagship (windowed every round)
    "lgbm_tsv_flagship",
    "lgbm_infer_embeddings",
    "argmax_embeddings",
    "settings_introspection",
    # r06 block — the ENTIRE deferred r06 rotation debt (22 rows)
    "events_asof_bucketed",
    "events_range_join",
    "events_sessionize",
    "events_windowed_stats",
    "pipe_chunk_bpe",
    "pipe_dedup_minhash",
    "pipe_dedup_minhash_incr",
    "pipe_dedup_semantic",
    "pipe_dedup_simhash",
    "pipe_dedup_spans",
    "pipe_lm_score",
    "pipe_multimodal_jpeg",
    "pipe_multimodal_png",
    "pipe_multimodal_video",
    "pipe_multimodal_wav",
    "pipe_quality_filter",
    "pipe_sim_ivf_probe2",
    "pipe_sim_recall_ivf",
    "pipe_sim_topk_gemm",
    "pipe_text_bm25",
    "rel_join_right",
    "rel_salted_join",
    # r07 swap rows (ceded their slots to round-11 faces)
    "events_funnel",
    "events_gapfill",
    "events_ohlc",
    "pipe_corpus_health",
    # r07 family flagships (the other 25 r07 rows head the r13 backlog)
    # (pipe_mixture_temperature ceded its flagship slot to the third
    # conversation face — r07 green, mixtures repped by the r11-green
    # pipe_mix_unimax, curation by pipe_quality_filter in-window)
    "pipe_web_pagerank",
    "pipe_sim_ivf_pq",
    "pipe_ingest_warc",
    "pipe_dedup_components",
    # per-category 2.3 reps, stalest verified sibling each
    "rel_filter_project",
    # (rel_grouping_sets — r08 — ceded its rep slot to the ninth
    # round-12 face, the MP4 container walk; aggregations stay repped
    # by the r11-green rel_agg_rollup + r08-green siblings' rows)
    "pipe_multimodal_mp4",
    "rel_window_analytics",
    # (rel_topk_group — r10 green, the window's FRESHEST non-flagship
    # row — and grouped_map_centroid — r09 green — ceded their rep
    # slots to the sixth/seventh round-12 faces; sort/limit stays
    # repped by the r11-green rel_sort_limit, UDF/UDAF/UDTF by the
    # r11-green udaf_mean_norm + r10-green udtf_split_words)
    "pipe_eval_chrf",
    "rel_union_all",
    "rel_not_in_subquery",
    # (rel_scalar_date — r08 — ceded its rep slot to the eighth
    # round-12 face, the FLAC codec; the scalar family stays repped by
    # the r11-green rel_scalar_string + r08-green siblings'
    # recorded rows)
    "pipe_multimodal_flac",
    "rel_explode",
    "pipe_eval_distinct_n",
    "pipe_sketch_cms",
    "rel_variant",
    # r07 swap slots — each cedes to a round-12 NEW face as it lands
    # (the r11 displacement pattern; pipe_hard_negatives ceded first —
    # r07 green, similarity repped in-window by pipe_sim_ivf_probe2 /
    # _recall_ivf / _topk_gemm / _ivf_pq)
    "pipe_eval_bleu_by_system",
    # (pipe_embed_ivf_topk ceded to the alpha face — r07 green,
    # similarity/embeddings repped in-window by the three sim recalls
    # + pipe_sim_ivf_pq)
    "pipe_eval_krippendorff",
    # (pipe_web_links + pipe_url_blocklist ceded to the conversation
    # faces — both r07 green, web repped in-window by pipe_web_pagerank
    # + pipe_ingest_warc; the THIRD conversation face takes the slot
    # budgeted for one more r07 row)
    "pipe_ingest_conversations",
    "pipe_dedup_turns",
    "pipe_dedup_conversations",
]


#: Queries intentionally OUTSIDE the driver's 50-entry window.  Every name
#: here MUST have a green row in a recorded past driver window (enforced by
#: tests/test_registry_window.py, which cross-checks CORRECTNESS_r*.json):
#: each was hash-verified by an earlier driver gate and ceded its slot.
#: Round 12 cedes the whole round-11 window except the 4 flagship queries
#: (those 46 rows are the freshest in the registry) so the r06+r07 long
#: tail gets official re-verification; the r13 backlog (25 deferred r07
#: rows, then the r08 block) is listed in the PRIORITY header note.
#: Computed as REGISTRY minus PRIORITY lazily (registrations happen when the
#: corpus modules import, after this module) so the two sets can never
#: drift; the membership contract (past-green only) is enforced by
#: tests/test_registry_window.py.
def window_exempt() -> frozenset[str]:
    return frozenset(n for n in REGISTRY if n not in set(PRIORITY))


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
