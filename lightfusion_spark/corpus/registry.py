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
#: Round-15 rotation (per the round-14 verdict's item 2, with the
#: membership now DERIVED FROM DATA instead of a hand-enumerated
#: backlog — the verdict's item 3: the r14 PLANS.md backlog listed 30
#: of the 31 r09 rows, dropping pipe_pack_sequences.
#: tests/test_registry_window.py::test_window_takes_the_stalest_rows_first
#: recomputes last-green ages from the committed CORRECTNESS_r*.json
#: files and asserts the ENTIRE oldest bucket is in this window unless
#: a row is explicitly listed in WINDOW_DISPLACED below, so that class
#: of drift is now test-impossible):
#: 4 flagship Layer-A queries (windowed every round)
#: + ALL 31 r09 rows — the entire remaining r09 rotation debt retired
#:   in one stroke, pipe_pack_sequences included (the five r14-
#:   displaced reps first, then the sampling/similarity/text rows and
#:   the eleven r09 relational reps: cast battery, GROUP BY ALL,
#:   regexp, salted agg, the three scalar batteries, set union, the
#:   six TPC-H shapes, the rank window)
#: + 10 of the 46 r10 rows, stalest-first (the three bounded-state
#:   event monitors' batch twins, BT source ranking, chunking, corpus
#:   drift, curriculum order, fuzzy decontamination, diversity
#:   sampling, numeric drift); the remaining 36 r10 rows head the
#:   r16 backlog
#: + 5 round-15 NEW faces (r14 verdict items 5 and 8, the PR
#:   companion to AUC, the AUC paired bootstrap, and the packing
#:   capacity sweep):
#:   pipe_eval_qa_bootstrap (the sixth and last bootstrap gaining an
#:   oracle face — EM and F1 disagreeing about significance),
#:   pipe_eval_spearman_by_judge (the judge-validation statistic
#:   sliced per judge, exercising the grouped path and the round-15
#:   fully-excluded-group join fix), pipe_eval_pr (average
#:   precision + best-F1 operating point on auc_report's shared
#:   pinned relation), pipe_eval_auc_bootstrap (is model A's
#:   AUC lead real — integer-weighted Mann-Whitney per replicate),
#:   and pipe_pack_efficiency (the context-length capacity sweep)
#: 4+31+10+5 = 50 exactly.  After this round no registry row's last
#: driver grade is older than r10.  Every rotated-out name was
#: officially green in r09-r14 and moves to WINDOW_EXEMPT;
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
    # r09 block — the ENTIRE remaining r09 rotation debt (31 rows):
    # the five r14-displaced reps first, then alphabetical
    "pipe_pack_sequences",
    "pipe_probe_train",
    "pipe_robots_precedence",
    "pipe_sentence_chunks",
    "pipe_shard_assign",
    "pipe_sim_ann_lsh",
    "pipe_sim_lsh_multiprobe",
    "pipe_sim_topk_quantized",
    "pipe_simhash_wide",
    "pipe_text_fingerprint",
    "pipe_text_pii",
    "pipe_text_repetition",
    "pipe_text_tokens",
    "pipe_text_urls",
    "pipe_truncate_matryoshka",
    "pipe_warc_robots_clean",
    "rel_cast_battery",
    "rel_group_by_all",
    "rel_regexp",
    "rel_salted_agg",
    "rel_scalar_bitwise",
    "rel_scalar_conditional",
    "rel_scalar_struct_map",
    "rel_set_union",
    "rel_tpch_q2_shape",
    "rel_tpch_q10_shape",
    "rel_tpch_q17_shape",
    "rel_tpch_q18_shape",
    "rel_tpch_q20_shape",
    "rel_tpch_q21_shape",
    "rel_window_rank",
    # r10 block — 10 rows, stalest-first; the remaining 36 r10 rows
    # head the r16 backlog
    "events_ewma_batch",
    "events_heavy_hitters_batch",
    "events_reservoir_batch",
    "pipe_bt_sources",
    "pipe_chunk_documents",
    "pipe_corpus_drift",
    "pipe_curriculum_order",
    "pipe_decontaminate_fuzzy",
    "pipe_diversity_sample",
    "pipe_drift_numeric",
    # (pipe_file_stats_distributed, pipe_e2e_curation and
    # pipe_dsir_select — all r10-green — ceded their planned slots to
    # the late pipe_eval_pr, pipe_eval_auc_bootstrap and
    # pipe_pack_efficiency faces; they head the r16 backlog with the
    # remaining r10 rows.  r10 rows are not stalest-bucket members,
    # so these are ordinary swaps, not WINDOW_DISPLACED entries.)
    # round-15 NEW faces (r14 verdict items 5 and 8, the
    # precision-recall companion to AUC, the AUC paired bootstrap —
    # the bootstrap family's seventh member — and the packing
    # capacity sweep)
    "pipe_eval_qa_bootstrap",
    "pipe_eval_spearman_by_judge",
    "pipe_eval_pr",
    "pipe_eval_auc_bootstrap",
    "pipe_pack_efficiency",
]

#: Stalest-bucket rows EXPLICITLY displaced from the current window
#: (the displacement pattern: a new face may take a backlog row's
#: slot, but the trade must be recorded HERE, where
#: tests/test_registry_window.py::test_window_takes_the_stalest_rows_first
#: audits it against the CORRECTNESS record — never in a prose list
#: that can drift).  Empty for round 15: the whole r09 bucket fit.
WINDOW_DISPLACED: frozenset[str] = frozenset()


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
