"""The driver's correctness gate evaluates only the FIRST 50 ``queries()``
entries.  These tests pin the curated export order so every SURVEY §2 family
lands inside that window (round-2 verdict: all 50 slots were spent on rel_*,
leaving the whole ML/pipeline surface driver-unverified).
"""

import json
from pathlib import Path

import __spark_entry__ as entry
from lightfusion_spark.corpus.registry import PRIORITY, REGISTRY, window_exempt

DRIVER_WINDOW = 50
REPO = Path(__file__).resolve().parent.parent


def _past_green_rows() -> set[str]:
    """Query names with a hash-verified green row in ANY past driver window.

    Reconstructed from the committed CORRECTNESS_r*.json files rather than a
    hand-maintained list, so the record can't drift from what the driver
    actually verified.
    """
    green: set[str] = set()
    for path in sorted(REPO.glob("CORRECTNESS_r*.json")):
        rows = json.loads(path.read_text())
        for name, row in rows.items():
            if row.get("rows_match") and row.get("schema_match") and not row.get("err"):
                green.add(name)
    return green


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
    exempt = window_exempt()
    for name in REGISTRY:
        if name.startswith(("pipe_", "events_", "udaf_", "udtf_", "grouped_")):
            assert name in window or name in exempt, (
                f"{name} outside driver window and not exempted"
            )
    for name in exempt:
        assert name in REGISTRY, f"stale window_exempt entry {name}"
        assert name not in window, f"{name} exempted but wastes a window slot"
    # One-plus representative per §2.3 category.  Round-14 rotation picks
    # the stalest-verified sibling per category (everything below is an
    # r08/r09 row; the r13-refreshed siblings ceded their slots — the
    # established displacement precedent, each ceding family keeping an
    # r12/r13-green recorded row).
    for name in (
        # projection/filter, set ops, generators/higher-order, the
        # approximate/sketch family and the Spark-4 surface stay repped
        # by r12-green recorded rows (rel_filter_project, rel_union_all,
        # rel_explode, pipe_sketch_cms, rel_variant); subqueries/CTEs by
        # the r13-green rel_cte row — the freshest in the registry —
        # per the same fresh-recorded-row pattern.
        "rel_join_cross",  # joins: the ENTIRE remaining r08 join debt
        "rel_join_semi",
        "rel_join_theta",
        "rel_join_full_outer",
        "rel_join_part_supplier",
        "rel_agg_argminmax",  # aggregations (r8 — plus distinct, HAVING)
        "rel_agg_distinct",
        "rel_having",
        "rel_window_range_frame",  # windows (r8)
        "rel_scalar_array",  # scalar library (r8: array/json/string2)
        "rel_scalar_json",
        "rel_scalar_string2",
        "events_stream_join_full",  # timeseries/streaming family (r9 —
        # the stream join's full-outer batch twin)
        "grouped_map_centroid",  # UDF/Arrow crossing (r9)
        "rel_pivot",  # reshaping (r8, with unpivot)
        "rel_unpivot",
    ):
        assert name in window, f"§2.3 representative {name} outside driver window"


def test_every_query_windowed_now_or_green_in_a_past_window():
    """r4 verdict item 7: a registered query must either sit in the CURRENT
    driver window or hold a green row from a PAST driver window.  A new query
    parked in WINDOW_EXEMPT without ever being windowed fails here loudly
    instead of surfacing as a judge finding a round later."""
    window = set(list(entry.queries())[:DRIVER_WINDOW])
    green = _past_green_rows()
    never_verified = [
        n for n in REGISTRY if n not in window and n not in green
    ]
    assert not never_verified, (
        "queries neither in the current driver window nor green in any past "
        f"window — rotate them into PRIORITY: {never_verified}"
    )


def test_window_exempt_only_for_past_green_queries():
    """window_exempt()'s contract: exemption is only for queries the driver
    has already hash-verified (the advisor flagged round 4 for breaking
    this)."""
    green = _past_green_rows()
    unearned = sorted(window_exempt() - green)
    assert not unearned, (
        f"window_exempt entries with no past green driver row: {unearned}"
    )


def test_all_registered_queries_still_exported():
    qs = entry.queries()
    assert set(qs) == set(REGISTRY)
    oracles = entry.oracle_sql()
    assert set(oracles) == {n for n, s in REGISTRY.items() if s.oracle is not None}
