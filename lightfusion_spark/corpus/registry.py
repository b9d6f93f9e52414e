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
#: Round-13 rotation (per the round-12 verdict's top item, following the
#: backlog enumerated in docs/PLANS.md "Round-13 re-window backlog"):
#: 4 flagship Layer-A queries (windowed every round)
#: + ALL 26 deferred r07 rows — the entire remaining r07 rotation debt
#:   retired in one stroke (embeddings/similarity recalls, the two
#:   n-gram LM rows, the three multimodal frame ops, the url/web block,
#:   and the eight r07 relational reps)
#: + 7 of the r08 block, displaced-reps first (rel_scalar_date and
#:   rel_grouping_sets, which ceded their r12 rep slots to late faces)
#:   then family spread: the anti join, cube agg, CTE, the stream
#:   join's batch twin, and pipe_bpe_train (whose expected-merges
#:   fixture was regenerated this round, so official re-verification
#:   is due; pipe_decontaminate_bloom ceded its planned slot to the
#:   WER face, and rel_join_cross/rel_join_theta/rel_pivot/
#:   rel_unpivot/rel_join_full_outer/rel_agg_distinct/rel_join_semi/
#:   rel_window_range_frame — all r08-green — ceded theirs to the
#:   eight late round-13 eval faces; all nine head the r14 backlog.
#:   Joins stay repped by left (r07, re-graded THIS window) + anti;
#:   the windows family cedes on the established fresh-recorded-row
#:   pattern — rel_window_analytics is r12-green)
#: + 13 round-13 NEW faces (the round-12 verdict's items 5, 3, 4, 8,
#:   then the eval-family completion wave): pipe_eval_chrf_by_system,
#:   pipe_dedup_conversations_fuzzy, pipe_conversation_quality,
#:   pipe_sft_spans, pipe_eval_wer, pipe_eval_wer_by_system,
#:   pipe_eval_ranking, pipe_eval_qa, pipe_eval_rouge,
#:   pipe_eval_rouge_by_system, pipe_eval_bleu_bootstrap,
#:   pipe_eval_wer_bootstrap, pipe_eval_ranking_bootstrap
#: 4+26+7+13 = 50 exactly.  After this round no registry row's last
#: driver grade is older than r08; the remaining r08 rows (27) head the
#: r14 backlog, then the r09 block.  Every rotated-out name was
#: officially green in r08-r12 and moves to WINDOW_EXEMPT;
#: tests/test_registry_window.py asserts every registered query is
#: either in the current window or has a recorded green row from a past
#: driver window, and tools/parity.py + CI keep sweeping the whole
#: registry regardless.
PRIORITY: list[str] = [
    # Layer A flagship (windowed every round)
    "lgbm_tsv_flagship",
    "lgbm_infer_embeddings",
    "argmax_embeddings",
    "settings_introspection",
    # r07 block — the ENTIRE remaining r07 rotation debt (26 rows)
    "pipe_embed_ivf_topk",
    "pipe_hard_negatives",
    "pipe_ingest_warc_clean",
    "pipe_layout_zorder",
    "pipe_lm_buckets_ngram",
    "pipe_lm_score_ngram",
    "pipe_mixture_temperature",
    "pipe_multimodal_audio_frames",
    "pipe_multimodal_resize",
    "pipe_multimodal_scenecut",
    "pipe_sim_ivf_pq_probe2",
    "pipe_sim_ivf_pq_rerank",
    "pipe_sim_lsh_banded",
    "pipe_url_blocklist",
    "pipe_url_canonicalize",
    "pipe_web_links",
    "pipe_web_rank_sample",
    "pipe_web_robots",
    "rel_cdc_latest",
    "rel_fuzzy_match",
    "rel_histogram",
    "rel_join_left",
    "rel_outlier_iqr",
    "rel_profile_orders",
    "rel_scd2_asof",
    "rel_skew_report",
    # r08 block — 7 rows, displaced-reps first, then family spread
    "rel_scalar_date",
    "rel_grouping_sets",
    "pipe_bpe_train",
    "rel_join_anti",
    "rel_agg_cube",
    "rel_cte",
    "events_stream_join",
    # (pipe_decontaminate_bloom, rel_join_cross, rel_join_theta,
    # rel_pivot, rel_unpivot, rel_join_full_outer and rel_agg_distinct
    # — all r08-green — ceded their planned slots to the seven late
    # round-13 faces; they head the r14 backlog.  Joins stay repped by
    # left/anti/semi this window, aggs by cube + grouping sets,
    # decontamination by the r10-green pipe_decontaminate_fuzzy +
    # r11-green pipe_decontaminate rows.)
    # round-13 NEW faces (round-12 verdict items 5, 3, 4, 8, then the
    # eval-family completion wave: grouped WER, ranking metrics,
    # SQuAD EM/F1, ROUGE one-shot/by-system, BLEU paired bootstrap)
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
