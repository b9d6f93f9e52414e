"""Dump .explain('formatted') for bench queries to plans/r18/<q>_<tag>.txt.

Plan-only: builds each query (which for driver-loop trainers runs their
eager jobs) and explains it — no noop execution, no timing.  Used to
(re)generate the committed after-plans the optimization rounds require.

Usage:
  python tools/dump_plans.py --tag after [name ...]   # default: full bench set
"""

from __future__ import annotations

import argparse
import io
import os
import sys
from contextlib import redirect_stdout

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--cpus", default=os.environ.get("SPARK_GRAFT_CPUS", "32"))
    ap.add_argument("--tag", default="after")
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    import __spark_entry__ as entry_mod
    from bench import BENCH_QUERIES

    spark = (
        SparkSession.builder.master(f"local[{args.cpus}]")
        .appName("lightfusion-dump-plans")
        .config("spark.sql.shuffle.partitions", args.cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry_mod.queries()
    names = args.names or list(BENCH_QUERIES)
    out_dir = os.path.join(REPO_ROOT, "plans", "r18")
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        if name not in qs:
            print(f"??    {name}")
            continue
        try:
            df = qs[name](spark, args.sf)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            with open(
                os.path.join(out_dir, f"{name}_{args.tag}.txt"), "w", encoding="utf-8"
            ) as fh:
                fh.write(buf.getvalue())
            print(f"ok    {name}")
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL  {name}: {type(exc).__name__}: {str(exc)[:160]}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
