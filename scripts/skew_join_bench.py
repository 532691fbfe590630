#!/usr/bin/env python
"""Join-skew demo (round 4): plant one hot key in a fact-fact join and
measure the three regimes that matter at 100 TB:

1. sort-merge join, AQE skew-join OFF — the pathology: the hot key's
   entire probe side lands on ONE task (a straggler that at cluster
   scale runs for hours or OOMs);
2. sort-merge join, AQE skew-join ON — Spark's runtime remedy splits the
   oversized partition (thresholds tuned down to engage at demo scale;
   at 100 TB the defaults engage on real sizes);
3. ``operators.joins.salted_join`` — the deterministic remedy for the
   single-hot-key case, no AQE required: hot rows fan out across
   ``n_salts`` sub-keys, the build side replicates per salt.

Broadcast is disabled throughout: at the scale this demo stands in for,
the build side exceeds any broadcast threshold — that is exactly when
key skew starts to matter. All three regimes are verified to produce
the same row count. Fixture: .scale/rel_x10 lineitem (6 M rows) with
40 % of rows re-pointed (deterministically, hash-based) at one hot
orderkey, joined to rel_x10 orders (1.5 M rows).

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
from reactivestreams_kinesis_spark.operators.joins import salted_join, skew_split_join
from reactivestreams_kinesis_spark.session import get_spark

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REL = os.path.join(ROOT, ".scale", "rel_x10")
HOT_KEY = 1  # every tier contains orderkey 1
SKEW_FRACTION_MOD = 10  # hash % 10 < 4 -> 40% of rows hit the hot key


def skewed_lineitem(spark):
    li = load_table(spark, REL, "lineitem")
    return li.withColumn(
        "l_orderkey",
        F.when(
            F.pmod(F.hash("l_orderkey", "l_linenumber"), F.lit(SKEW_FRACTION_MOD))
            < 4,
            F.lit(HOT_KEY).cast("bigint"),
        ).otherwise(F.col("l_orderkey")),
    )


def timed(df) -> float:
    df.write.format("noop").mode("overwrite").save()  # warm-up
    best = float("inf")
    for _ in range(2):
        start = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        best = min(best, time.perf_counter() - start)
    return best


def main() -> int:
    spark = get_spark(app_name="rsk-skew-join-bench")
    conf = spark.conf
    saved = {
        k: conf.get(k, None)
        for k in (
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.skewJoin.enabled",
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
        )
    }
    conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

    li = skewed_lineitem(spark)
    orders = load_table(spark, REL, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    joined = li.join(orders, li.l_orderkey == orders.o_orderkey).select(
        "l_orderkey", "l_extendedprice", "o_orderdate", "o_orderpriority"
    )
    expected = joined.count()
    out: dict = {"rows": expected, "regimes": {}}

    # 1. the pathology: SMJ, skew handling off
    conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
    out["regimes"]["smj_skew_off"] = round(timed(joined), 2)

    # 2. AQE skew-join on, thresholds scaled to the demo data size
    conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "8m")
    conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "4m")
    conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    assert joined.count() == expected
    out["regimes"]["smj_aqe_skew_split"] = round(timed(joined), 2)

    # 3. whole-table salting: deterministic, but replicates the FULL
    # build side n_salts x — measured to show the documented cost model,
    # not to recommend it at this build-side size
    conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
    renamed_orders = orders.withColumnRenamed("o_orderkey", "l_orderkey")
    salted = salted_join(
        li, renamed_orders, key="l_orderkey", n_salts=32
    ).select("l_orderkey", "l_extendedprice", "o_orderdate", "o_orderpriority")
    assert salted.count() == expected
    out["regimes"]["salted_join_32"] = round(timed(salted), 2)

    # 4. split treatment: hot keys -> broadcast of their few build rows,
    # rest -> normal shuffle join (operators.joins.skew_split_join)
    split = skew_split_join(
        li, renamed_orders, key="l_orderkey", hot_keys=[HOT_KEY]
    ).select("l_orderkey", "l_extendedprice", "o_orderdate", "o_orderpriority")
    assert split.count() == expected
    out["regimes"]["skew_split_join"] = round(timed(split), 2)

    for k, v in saved.items():
        if v is None:
            conf.unset(k)
        else:
            conf.set(k, v)

    payload = json.dumps(out)
    print(payload)
    for i, arg in enumerate(sys.argv):
        if arg == "--out" and i + 1 < len(sys.argv):
            path = sys.argv[i + 1]
            d = os.path.dirname(os.path.abspath(path)) or "."
            fd, tmp = tempfile.mkstemp(dir=d, prefix=".skew_tmp_")
            with os.fdopen(fd, "w") as f:
                f.write(payload + "\n")
            os.replace(tmp, path)
    return 0


if __name__ == "__main__":
    sys.exit(main())
