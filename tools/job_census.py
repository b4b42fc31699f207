"""Count Spark jobs + wall for a query's construct and execute phases.

Usage: python tools/job_census.py [--sf DIR] name [name...]

Prints one JSON line per query:
  {"name": ..., "construct_s": ..., "execute_s": ...,
   "jobs_construct": N, "jobs_execute": N}

Job counts come from the status tracker's job-id high-water mark, so
they include every eager action a query's fn() runs (localCheckpoint
materializations, convergence isEmpty probes, collects) plus the
checkpoint fill-in jobs the lazy variants schedule. Measurement-only
tool (guide §1): nothing here feeds results back into the queries.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("names", nargs="+")
    args = ap.parse_args()

    from big_data_bowl_spark.session import get_spark
    from big_data_bowl_spark.queries import REGISTRY

    spark = get_spark()
    sc = spark.sparkContext
    tracker = sc.statusTracker()

    def job_count() -> int:
        ids = tracker.getJobIdsForGroup(None) or []
        # high-water mark: job ids are monotonically increasing ints
        return (max(ids) + 1) if ids else 0

    for name in args.names:
        fn = REGISTRY[name].fn
        # warmup (codegen/broadcast cold start), untimed
        fn(spark, args.sf).count()
        best = None
        for _ in range(args.runs):
            sc.setJobDescription(f"census:{name}")
            j0 = job_count()
            t0 = time.time()
            df = fn(spark, args.sf)
            t1 = time.time()
            j1 = job_count()
            n = df.count()
            t2 = time.time()
            j2 = job_count()
            sc.setJobDescription(None)
            row = {
                "name": name,
                "construct_s": round(t1 - t0, 3),
                "execute_s": round(t2 - t1, 3),
                "total_s": round(t2 - t0, 3),
                "jobs_construct": j1 - j0,
                "jobs_execute": j2 - j1,
                "rows": n,
            }
            if best is None or row["total_s"] < best["total_s"]:
                best = row
        print(json.dumps(best))


if __name__ == "__main__":
    main()
