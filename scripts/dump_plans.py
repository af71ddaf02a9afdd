#!/usr/bin/env python
"""Dump `.explain("formatted")` for named queries to plans/<tag>/.

Usage: python scripts/dump_plans.py <tag> <suffix> <prefix> [...]
e.g.   python scripts/dump_plans.py r11 before q06 q14 x57 x58

Writes plans/<tag>/<query>_<suffix>.txt for each matching declared
query — the optimization-round evidence files the judge checks plan
claims against."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    tag, suffix, *prefixes = sys.argv[1:]
    from mc_ns_data_pipeline_spark.plans import QUERIES
    from mc_ns_data_pipeline_spark.session import get_spark

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out_dir = os.path.join(repo, "plans", tag)
    os.makedirs(out_dir, exist_ok=True)

    spark = get_spark("dump-plans")
    want = set(prefixes)
    for name, fn in sorted(QUERIES.items()):
        if name.split("_", 1)[0] not in want:
            continue
        df = fn(spark, SF_DIR)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted")
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print("wrote", path)


if __name__ == "__main__":
    main()
