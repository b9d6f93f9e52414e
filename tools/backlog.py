"""Rotation-backlog report, derived from the committed CORRECTNESS record.

The r14 verdict's item 3: the hand-enumerated PLANS.md backlog drifted
once (30 of 31 r09 rows).  This tool recomputes every registry row's
last driver-green round from the raw ``CORRECTNESS_r*.json`` files and
prints the stalest-first backlog the next window rotation should take;
``tests/test_registry_window.py::test_window_takes_the_stalest_rows_first``
enforces the same derivation, so the printed list and the test can
never disagree.

Usage: python tools/backlog.py
"""

from __future__ import annotations

import json
import os
import re
import sys
from collections import defaultdict

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)


def last_green_rounds(through: int | None = None) -> dict[str, int]:
    """name -> latest round whose driver window graded it green.

    ``through`` scopes the derivation to grade files r01..r{through}:
    the window-enforcement test passes ``registry.WINDOW_BUILT_FROM``
    so a CORRECTNESS file the driver drops AFTER the builder's final
    commit can never redden the shipped tree.  The CLI report stays
    unscoped — it plans the NEXT window and should see every file.
    """
    last: dict[str, int] = {}
    for fname in sorted(os.listdir(REPO_ROOT)):
        m = re.fullmatch(r"CORRECTNESS_r(\d+)\.json", fname)
        if not m:
            continue
        rnd = int(m.group(1))
        if through is not None and rnd > through:
            continue
        with open(os.path.join(REPO_ROOT, fname)) as fh:
            rows = json.load(fh)
        for name, row in rows.items():
            if (
                row.get("rows_match")
                and row.get("schema_match")
                and not row.get("err")
            ):
                last[name] = max(last.get(name, 0), rnd)
    return last


def main() -> None:
    from lightfusion_spark.corpus import registry

    # importing __spark_entry__ registers every corpus query
    from __spark_entry__ import queries

    window = set(list(queries())[:50])
    last = last_green_rounds()
    buckets: dict[int, list[str]] = defaultdict(list)
    never: list[str] = []
    for name in registry.REGISTRY:
        if name in last:
            buckets[last[name]].append(name)
        else:
            never.append(name)

    print(f"registry rows: {len(registry.REGISTRY)}  window: {len(window)}")
    if never:
        in_w = sorted(n for n in never if n in window)
        out_w = sorted(n for n in never if n not in window)
        print(f"never driver-graded, IN window ({len(in_w)}): {in_w}")
        if out_w:
            print(f"never driver-graded, NOT in window ({len(out_w)}): {out_w}  <-- rotate these in")
    for rnd in sorted(buckets):
        rows = sorted(buckets[rnd])
        pending = [n for n in rows if n not in window]
        print(
            f"r{rnd:02d}: {len(rows)} rows, {len(rows) - len(pending)} "
            f"in current window, {len(pending)} pending"
        )
        if pending:
            for n in pending:
                print(f"    {n}")


if __name__ == "__main__":
    main()
