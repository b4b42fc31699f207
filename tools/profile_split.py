"""Split a query's bench wall into driver-side plan construction vs
execution (VERDICT-style measurement tool for the r17 optimization
round, guide §1: decide whether time goes to compute, shuffle, or the
driver before touching anything).

For each named query (default: the 15 slowest from the last bench):
  - construct_s: wall of fn(spark, sf_dir) alone — Python query
    building + Py4J round trips + Catalyst analysis triggered during
    construction (no job runs).
  - execute_s: wall of .count() on the already-built DataFrame —
    optimization + physical planning + codegen-cache lookup + all jobs.
Best of `--runs` (default 3) for each, after one untimed warmup, the
bench's timed_best convention.

Usage: python tools/profile_split.py [--sf DIR] [--runs N] name ...
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    args = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.1"
    runs = 3
    names = []
    i = 0
    while i < len(args):
        if args[i] == "--sf":
            sf_dir = args[i + 1]
            i += 2
        elif args[i] == "--runs":
            runs = int(args[i + 1])
            i += 2
        else:
            names.append(args[i])
            i += 1

    from big_data_bowl_spark.queries import REGISTRY
    from big_data_bowl_spark.session import get_spark
    from big_data_bowl_spark.sources.io import STAR_TABLES, load_table

    spark = get_spark(cpus=os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("ERROR")
    for tbl in STAR_TABLES:
        load_table(spark, sf_dir, tbl).count()

    out = {}
    for name in names:
        fn = REGISTRY[name].fn
        fn(spark, sf_dir).count()  # warmup: codegen + broadcast build
        best_c, best_e, best_t = None, None, None
        for _ in range(runs):
            t0 = time.time()
            df = fn(spark, sf_dir)
            t1 = time.time()
            df.count()
            t2 = time.time()
            c, e, tot = t1 - t0, t2 - t1, t2 - t0
            best_c = c if best_c is None or c < best_c else best_c
            best_e = e if best_e is None or e < best_e else best_e
            best_t = tot if best_t is None or tot < best_t else best_t
        out[name] = {
            "construct_s": round(best_c, 3),
            "execute_s": round(best_e, 3),
            "total_s": round(best_t, 3),
        }
        print(f"# {name}: construct {best_c:.3f}s execute {best_e:.3f}s",
              file=sys.stderr)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
