#!/usr/bin/env python
"""Dump `.explain("formatted")` for registry queries to plans/<outdir>/.

Usage:
    python scripts/dump_plans.py <outdir-suffix> q01_pricing_summary,... [sf_dir]

Writes plans/r12/<name>_<suffix>.txt for each query. Plan capture only —
nothing is executed (AQE plans print isFinalPlan=false; Exchange counts,
join strategies, PushedFilters and ReadSchema are all visible pre-run,
which is what the plan-claims in OPTIMIZATION_r12.md cite).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from reactivestreams_kinesis_spark.queries.registry import all_queries
from reactivestreams_kinesis_spark.session import get_spark, released_caches


def main() -> None:
    suffix = sys.argv[1]
    names = sys.argv[2].split(",")
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"
    out_root = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r12")
    os.makedirs(out_root, exist_ok=True)
    spark = get_spark(app_name="rsk-plan-dump")
    registry = all_queries()
    for name in names:
        q = registry[name]
        with released_caches(spark):
            df = q.fn(spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        path = os.path.join(out_root, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({plan.count('Exchange')} Exchange refs)")


if __name__ == "__main__":
    main()
