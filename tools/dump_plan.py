"""Dump .explain('formatted') for named registry queries to files.

Usage:
    python tools/dump_plan.py --out plans/r17 --suffix _before [--sf DIR] name...

Writes <out>/<name><suffix>.txt with the formatted physical plan
(initial AQE plan — plan shape, join strategies, exchanges, pushed
filters; the judge-checkable artifact for optimization rounds).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    args = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.1"
    out_dir = "plans/r17"
    suffix = ""
    names = []
    i = 0
    while i < len(args):
        if args[i] == "--sf":
            sf_dir = args[i + 1]; i += 2
        elif args[i] == "--out":
            out_dir = args[i + 1]; i += 2
        elif args[i] == "--suffix":
            suffix = args[i + 1]; i += 2
        else:
            names.append(args[i]); i += 1

    from big_data_bowl_spark.queries import REGISTRY
    from big_data_bowl_spark.session import get_spark

    spark = get_spark(cpus=os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        df = REGISTRY[name].fn(spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({len(plan)} bytes)")


if __name__ == "__main__":
    main()
