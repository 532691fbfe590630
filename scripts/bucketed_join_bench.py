#!/usr/bin/env python
"""Bucketed-join demo (round 4): SCALING.md claims the one fact-fact
shuffle (lineitem ⋈ orders on orderkey) disappears when both tables are
bucketed by the join key — "bucketing is a storage property, the query
code is unchanged". This proves it: write the rel_x10 facts as bucketed
tables, run the same join both ways, and compare (a) the number of
shuffle Exchanges in the physical plan and (b) wall time.

Bucketed tables live in a throwaway warehouse under .scale/ (gitignored).
Broadcast is disabled for the join so the comparison is
shuffle-sort-merge vs bucket-sort-merge, the regime that matters at
100 TB where neither fact side broadcasts.

Prints one JSON document; ``--out PATH`` writes it atomically.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from reactivestreams_kinesis_spark.catalog import load_table
from reactivestreams_kinesis_spark.plans.inspect import count_exchanges
from reactivestreams_kinesis_spark.session import get_spark

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REL = os.path.join(ROOT, ".scale", "rel_x10")
WAREHOUSE = os.path.join(ROOT, ".scale", "bucket_warehouse")
N_BUCKETS = 32


def the_join(li, orders):
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.round(F.sum("l_extendedprice"), 2).alias("revenue"),
        )
    )


def timed(df) -> float:
    df.write.format("noop").mode("overwrite").save()
    best = float("inf")
    for _ in range(2):
        start = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        best = min(best, time.perf_counter() - start)
    return best


def main() -> int:
    spark = get_spark(
        app_name="rsk-bucketed-join",
        extra_conf={"spark.sql.warehouse.dir": WAREHOUSE},
    )
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.sources.bucketing.enabled", "true")

    li = load_table(spark, REL, "lineitem").select(
        "l_orderkey", "l_extendedprice"
    )
    orders = load_table(spark, REL, "orders").select("o_orderkey", "o_orderpriority")

    for name, df, key in (
        ("b_lineitem", li, "l_orderkey"),
        ("b_orders", orders, "o_orderkey"),
    ):
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        (
            df.write.bucketBy(N_BUCKETS, key)
            .sortBy(key)
            .mode("overwrite")
            .saveAsTable(name)
        )

    plain = the_join(li, orders)
    bucketed = the_join(spark.table("b_lineitem"), spark.table("b_orders"))

    rows_plain = {tuple(r) for r in plain.collect()}
    rows_bucketed = {tuple(r) for r in bucketed.collect()}
    assert rows_plain == rows_bucketed

    out = {
        "n_buckets": N_BUCKETS,
        "plain": {
            "exchanges": count_exchanges(plain),
            "sec": round(timed(plain), 2),
        },
        "bucketed": {
            "exchanges": count_exchanges(bucketed),
            "sec": round(timed(bucketed), 2),
        },
    }
    payload = json.dumps(out)
    print(payload)
    for i, arg in enumerate(sys.argv):
        if arg == "--out" and i + 1 < len(sys.argv):
            path = sys.argv[i + 1]
            d = os.path.dirname(os.path.abspath(path)) or "."
            fd, tmp = tempfile.mkstemp(dir=d, prefix=".bk_tmp_")
            with os.fdopen(fd, "w") as f:
                f.write(payload + "\n")
            os.replace(tmp, path)
    return 0


if __name__ == "__main__":
    sys.exit(main())
