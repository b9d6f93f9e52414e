"""Per-query bench profiler — the measurement side of the optimization
rounds (guide §1: measure first).

For each named query (default: the full bench.py set) this times, with
the SAME session shape as bench.py:

* ``build``  — query construction (``qs[name](spark, sf_dir)``), which
  for driver-loop operators (k-means, PageRank, probe training) includes
  their eager jobs;
* ``exec``   — the noop-sink write of the returned plan (best of N);
* ``jobs``   — Spark jobs launched per timed execution (statusTracker
  delta), the job-overhead signal;
* optionally dumps ``.explain('formatted')`` to ``plans/r18/<q>_<tag>.txt``.

Usage:
  python tools/profile_bench.py [--runs 2] [--explain-tag before] [name ...]
"""

from __future__ import annotations

import argparse
import io
import json
import os
import sys
import time
from contextlib import redirect_stdout

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--cpus", default=os.environ.get("SPARK_GRAFT_CPUS", "32"))
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--explain-tag", default=None,
                    help="dump explain('formatted') to plans/r18/<q>_<tag>.txt")
    ap.add_argument("--out", default=None, help="write JSON detail here")
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    import __spark_entry__ as entry_mod
    from bench import BENCH_QUERIES

    spark = (
        SparkSession.builder.master(f"local[{args.cpus}]")
        .appName("lightfusion-profile")
        .config("spark.sql.shuffle.partitions", args.cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    st = spark.sparkContext.statusTracker()

    qs = entry_mod.queries()
    names = args.names or list(BENCH_QUERIES)

    # floor calibration: a trivial noop write, the per-action overhead
    t0 = time.time()
    spark.range(10).write.format("noop").mode("overwrite").save()
    floor_cold = time.time() - t0
    t0 = time.time()
    spark.range(10).write.format("noop").mode("overwrite").save()
    floor = time.time() - t0
    print(f"noop floor: cold {floor_cold:.3f}s warm {floor:.3f}s")

    warm_dir = os.environ.get("SPARK_GRAFT_WARMUP_SF_DIR", "/root/testdata/sf0.001")
    results: dict[str, dict] = {}
    for name in names:
        if name not in qs:
            print(f"??    {name}: not in queries()")
            continue
        spark.sparkContext.setJobDescription(f"warmup {name}")
        try:
            qs[name](spark, warm_dir).write.format("noop").mode("overwrite").save()
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL  {name}: warmup error {type(exc).__name__}: {str(exc)[:200]}")
            continue
        spark.catalog.clearCache()

        builds, execs, jobss = [], [], []
        df = None
        for _ in range(max(1, args.runs)):
            j0 = len(st.getJobIdsForGroup(None) or [])
            spark.sparkContext.setJobDescription(f"build {name}")
            t0 = time.time()
            df = qs[name](spark, args.sf)
            builds.append(time.time() - t0)
            spark.sparkContext.setJobDescription(f"exec {name}")
            t0 = time.time()
            df.write.format("noop").mode("overwrite").save()
            execs.append(time.time() - t0)
            jobss.append(len(st.getJobIdsForGroup(None) or []) - j0)
            spark.catalog.clearCache()
        spark.sparkContext.setJobDescription(None)
        if args.explain_tag and df is not None:
            os.makedirs(os.path.join(REPO_ROOT, "plans", "r18"), exist_ok=True)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            with open(
                os.path.join(REPO_ROOT, "plans", "r18", f"{name}_{args.explain_tag}.txt"),
                "w", encoding="utf-8",
            ) as fh:
                fh.write(buf.getvalue())
        results[name] = {
            "build": round(min(builds), 3),
            "exec": round(min(execs), 3),
            "total": round(min(b + e for b, e in zip(builds, execs)), 3),
            "jobs": min(jobss),
        }
        print(
            f"{min(b + e for b, e in zip(builds, execs)):7.2f}s  "
            f"build {min(builds):6.2f}  exec {min(execs):6.2f}  "
            f"jobs {min(jobss):3d}  {name}"
        )

    total = sum(r["total"] for r in results.values())
    print(f"\nTOTAL {total:.1f}s over {len(results)} queries (floor {floor:.3f}s/query)")
    if args.out:
        with open(args.out, "w", encoding="utf-8") as fh:
            json.dump({"queries": results, "floor": floor}, fh, indent=1)
    return 0


if __name__ == "__main__":
    sys.exit(main())
