"""Isolated wall measurement for named registry queries: warmup +
best-of-3 on an idle host, the bench.timed_best convention (count()
materialization). Used for rescan-watch accept/reject adjudication
(VERDICT r12 item 2) — run old code, run new code, compare.

Usage: python tools/measure_iso.py [--sf DIR] name [name ...]
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
    if args and args[0] == "--sf":
        sf_dir = args[1]
        args = args[2:]

    from big_data_bowl_spark.queries import REGISTRY
    from big_data_bowl_spark.session import get_spark
    from big_data_bowl_spark.sources.io import STAR_TABLES, load_table

    spark = get_spark(cpus=os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("ERROR")
    for tbl in STAR_TABLES:
        load_table(spark, sf_dir, tbl).count()

    out = {}
    for name in args:
        fn = REGISTRY[name].fn
        fn(spark, sf_dir).count()  # warmup (codegen/broadcast build)
        best = None
        for _ in range(3):
            t0 = time.time()
            n = fn(spark, sf_dir).count()
            dt = time.time() - t0
            best = dt if best is None or dt < best else best
        out[name] = {"best_sec": round(best, 3), "rows": n}
        print(f"# {name}: {best:.3f}s ({n} rows)", file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
