"""The driver's correctness gate evaluates only the FIRST 50 ``queries()``
entries.  These tests pin the curated export order so every SURVEY §2 family
lands inside that window (round-2 verdict: all 50 slots were spent on rel_*,
leaving the whole ML/pipeline surface driver-unverified).
"""

import __spark_entry__ as entry
from lightfusion_spark.corpus.registry import PRIORITY, REGISTRY, WINDOW_EXEMPT

DRIVER_WINDOW = 50


def test_priority_names_all_registered():
    missing = [n for n in PRIORITY if n not in REGISTRY]
    assert not missing, f"PRIORITY names not in REGISTRY (typo?): {missing}"


def test_priority_fits_driver_window():
    assert len(PRIORITY) <= DRIVER_WINDOW


def test_priority_has_no_duplicates():
    assert len(PRIORITY) == len(set(PRIORITY))


def test_window_covers_every_family():
    window = list(entry.queries())[:DRIVER_WINDOW]
    # Layer A (reference-authored) — all four must be verified.
    for name in (
        "lgbm_tsv_flagship",
        "lgbm_infer_embeddings",
        "argmax_embeddings",
        "settings_introspection",
    ):
        assert name in window, f"Layer-A query {name} outside driver window"
    # Every pipeline / timeseries / UDF query currently registered, except
    # explicitly exempted redundant variants (whose windowed sibling runs
    # the same algorithm).
    for name in REGISTRY:
        if name.startswith(("pipe_", "events_", "udaf_", "udtf_", "grouped_")):
            assert name in window or name in WINDOW_EXEMPT, (
                f"{name} outside driver window and not exempted"
            )
    for name in WINDOW_EXEMPT:
        assert name in REGISTRY, f"stale WINDOW_EXEMPT entry {name}"
        assert name not in window, f"{name} exempted but wastes a window slot"
    # One-plus rel_* representative per §2.3 category.
    for name in (
        "rel_filter_project",
        "rel_join_inner_agg",
        "rel_join_right",
        "rel_agg_q1",
        "rel_window_rank",
        "rel_set_union",
        "rel_subquery_in_exists",
        "rel_scalar_math",
        "rel_approx_sketch",
        "rel_salted_agg",
    ):
        assert name in window, f"§2.3 representative {name} outside driver window"


def test_all_registered_queries_still_exported():
    qs = entry.queries()
    assert set(qs) == set(REGISTRY)
    oracles = entry.oracle_sql()
    assert set(oracles) == {n for n, s in REGISTRY.items() if s.oracle is not None}
