#!/usr/bin/env python
"""Generate the RELATIONAL x10 scale tier (round-4 extension of the dedup
ladder): the sf0.1 TPC-H-shaped tables replicated 10× with consistently
shifted join keys, so every headline relational query runs unchanged at
10× the fact rows (6 M lineitem / 1.5 M orders) with identical join
selectivity and group structure.

Replication rules (rep = 0..9):
- lineitem: l_orderkey += rep·10M, l_partkey/l_suppkey += rep·1M
- orders:   o_orderkey += rep·10M, o_custkey += rep·1M
- customer: c_custkey += rep·1M (nationkey unchanged — bounded dim)
- supplier: s_suppkey += rep·1M (nationkey unchanged)
- part:     p_partkey += rep·1M
- nation/region: copied unchanged (bounded at every SF by definition)

x1 for the relational ladder is /root/testdata/sf0.1 itself, so only the
x10 tier is written (to .scale/rel_x10/, gitignored — regenerate with
this script). Measured by scripts/rel_scale_stress.py.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from reactivestreams_kinesis_spark.catalog import load_table
from reactivestreams_kinesis_spark.session import get_spark

SF01 = "/root/testdata/sf0.1"
OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".scale", "rel_x10"
)
REPS = 10
ORDER_OFF = 10_000_000
KEY_OFF = 1_000_000

SHIFTS = {
    "lineitem": {"l_orderkey": ORDER_OFF, "l_partkey": KEY_OFF, "l_suppkey": KEY_OFF},
    "orders": {"o_orderkey": ORDER_OFF, "o_custkey": KEY_OFF},
    "customer": {"c_custkey": KEY_OFF},
    "supplier": {"s_suppkey": KEY_OFF},
    "part": {"p_partkey": KEY_OFF},
    "nation": {},
    "region": {},
    # events: more users at constant per-user history depth — the right
    # scaling model for the event analytics (funnel/cohort/transitions)
    "events": {"event_id": ORDER_OFF, "user_id": KEY_OFF},
}


def main() -> int:
    spark = get_spark(app_name="rsk-gen-rel-tier")
    os.makedirs(OUT, exist_ok=True)
    for name, shifts in SHIFTS.items():
        df = load_table(spark, SF01, name)
        if shifts:
            rep = spark.range(REPS).withColumnRenamed("id", "__rep")
            df = df.crossJoin(rep)
            for col, off in shifts.items():
                df = df.withColumn(
                    col, (F.col(col) + F.col("__rep") * F.lit(off)).cast("bigint")
                )
            df = df.drop("__rep")
        out = os.path.join(OUT, f"{name}.parquet")
        df.write.mode("overwrite").parquet(out)
        print(f"{name}: {df.count()} rows -> {out}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
