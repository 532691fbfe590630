#!/usr/bin/env python
"""Co-located join scale ladder (round 10): pin the zero-exchange claim
of ``sources/colocated.py`` against the generic shuffle join at growing
fact sizes.

Both sides replicate K× onto new key ranges (join cardinality grows
linearly, per-key fanout constant — the regime where neither side
broadcasts and the generic plan must exchange BOTH tables on the key).
Each tier commits customer/orders as bucket(32)-partitioned snapshot
tables, then runs the same logical join two ways:

- ``coloc``: snapshot_colocated_join — one task per bucket, both sides'
  bucket files read in-task, Arrow hash join, no exchange (asserted
  from the plan, not claimed).
- ``generic``: read_snapshot + DataFrame join with broadcast disabled —
  shuffle-sort-merge, the plan you get without a co-located layout.

Result parity is checked at every tier (count + order-insensitive hash
checksum). Commit/write time is EXCLUDED — bucketing is a write-time
layout property; the bench measures the repeated-read regime that
dominates at 100 TB. One JSON document to stdout; ``--out PATH`` writes
atomically.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from reactivestreams_kinesis_spark.catalog import load_table
from reactivestreams_kinesis_spark.operators.snapshots import (
    read_snapshot,
    snapshot_commit,
)
from reactivestreams_kinesis_spark.session import get_spark
from reactivestreams_kinesis_spark.sources.colocated import colocated_join

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
N_BUCKETS = 32


def timed(df) -> float:
    df.write.format("noop").mode("overwrite").save()  # warm-up
    best = float("inf")
    for _ in range(2):
        start = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        best = min(best, time.perf_counter() - start)
    return best


def checksum(df) -> tuple[int, int]:
    row = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.expr(
            f"bit_xor(xxhash64({', '.join(sorted(df.columns))}))"
        ).alias("h"),
    ).collect()[0]
    return int(row["n"]), int(row["h"] or 0)


def main() -> int:
    out_path = None
    args = sys.argv[1:]
    if "--out" in args:
        out_path = args[args.index("--out") + 1]
    spark = get_spark(app_name="rsk-coloc-bench")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

    cust0 = load_table(spark, SF_DIR, "customer").select(
        "c_custkey", "c_nationkey", "c_acctbal"
    )
    orders0 = load_table(spark, SF_DIR, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    base = os.path.join(tempfile.gettempdir(), "rsk_coloc_bench")
    shutil.rmtree(base, ignore_errors=True)
    result = {"sf_dir": SF_DIR, "n_buckets": N_BUCKETS, "tiers": {}}

    for scale in (1, 4, 16):
        rep = spark.range(scale).withColumnRenamed("id", "__rep")
        cust = (
            cust0.crossJoin(rep)
            .withColumn(
                "c_custkey",
                F.col("c_custkey") + F.col("__rep") * F.lit(100_000_000),
            )
            .drop("__rep")
        )
        orders = (
            orders0.crossJoin(rep)
            .withColumn(
                "o_custkey",
                F.col("o_custkey") + F.col("__rep") * F.lit(100_000_000),
            )
            .withColumn(
                "o_orderkey",
                F.col("o_orderkey") + F.col("__rep") * F.lit(10_000_000_000),
            )
            .drop("__rep")
        )
        lt = os.path.join(base, f"x{scale}_cust")
        rt = os.path.join(base, f"x{scale}_orders")
        snapshot_commit(cust, lt, partition_by=[("c_custkey", "bucket", N_BUCKETS)])
        snapshot_commit(orders, rt, partition_by=[("o_custkey", "bucket", N_BUCKETS)])

        coloc = colocated_join(
            spark, lt, rt, left_key="c_custkey", right_key="o_custkey"
        )
        generic = (
            read_snapshot(spark, lt)
            .join(
                read_snapshot(spark, rt),
                F.col("c_custkey") == F.col("o_custkey"),
            )
            .select(
                "c_custkey", "c_nationkey", "c_acctbal", "o_orderkey", "o_totalprice"
            )
        )
        plan_c = coloc._jdf.queryExecution().executedPlan().toString()
        plan_g = generic._jdf.queryExecution().executedPlan().toString()
        n_c, h_c = checksum(coloc)
        n_g, h_g = checksum(generic)
        assert (n_c, h_c) == (n_g, h_g), f"parity broke at x{scale}"
        tier = {
            "join_rows": n_c,
            "coloc_sec": round(timed(coloc), 3),
            "generic_sec": round(timed(generic), 3),
            "coloc_exchanges": plan_c.count("Exchange"),
            "generic_exchanges": plan_g.count("Exchange"),
        }
        result["tiers"][f"x{scale}"] = tier
        print(f"x{scale}: {tier}", file=sys.stderr)

    # SKEW tier: every key hashes into ONE bucket (filtered by the
    # bucket expression itself), so the plain co-located join runs a
    # single task — leftSplit fans the hot bucket across tasks. Multiple
    # appends give the splitter tight files to cut.
    skew_keys = (
        spark.range(4_000_000)
        .select(F.col("id").alias("k"))
        .where(F.pmod(F.crc32(F.col("id").cast("string")), F.lit(N_BUCKETS)) == 0)
    )
    lt = os.path.join(base, "skew_l")
    rt = os.path.join(base, "skew_r")
    left = skew_keys.select(
        F.col("k").alias("c_custkey"),
        (F.col("k") % 25).cast("int").alias("c_nationkey"),
        (F.col("k") % 1000).cast("double").alias("c_acctbal"),
    )
    for i in range(8):
        snapshot_commit(
            left.where(F.col("c_custkey") % 8 == i),
            lt,
            partition_by=[("c_custkey", "bucket", N_BUCKETS)]
            if i == 0
            else None,
        )
    snapshot_commit(
        skew_keys.select(
            F.col("k").alias("o_custkey"),
            (F.col("k") * 10).alias("o_orderkey"),
            (F.col("k") % 500).cast("double").alias("o_totalprice"),
        ),
        rt,
        partition_by=[("o_custkey", "bucket", N_BUCKETS)],
    )
    hot = colocated_join(spark, lt, rt, left_key="c_custkey", right_key="o_custkey")
    split = colocated_join(
        spark, lt, rt, left_key="c_custkey", right_key="o_custkey", left_split=1
    )
    n_h, h_h = checksum(hot)
    n_s, h_s = checksum(split)
    assert (n_h, h_h) == (n_s, h_s), "skew split parity broke"
    result["skew"] = {
        "join_rows": n_h,
        "hot_tasks": hot.rdd.getNumPartitions(),
        "split_tasks": split.rdd.getNumPartitions(),
        "hot_sec": round(timed(hot), 3),
        "split_sec": round(timed(split), 3),
    }
    print(f"skew: {result['skew']}", file=sys.stderr)

    # MISMATCH tier (round 11): a compatible 2N/N bucket pair — the
    # coarsened plan (each task reads the finer side's two child
    # buckets) must stay zero-exchange, one task per COARSE bucket, and
    # parity-exact vs the generic join
    lt = os.path.join(base, "mm_cust")
    rt = os.path.join(base, "mm_orders")
    snapshot_commit(
        cust0, lt, partition_by=[("c_custkey", "bucket", 2 * N_BUCKETS)]
    )
    snapshot_commit(
        orders0, rt, partition_by=[("o_custkey", "bucket", N_BUCKETS)]
    )
    mm = colocated_join(
        spark, lt, rt, left_key="c_custkey", right_key="o_custkey"
    )
    gen = (
        read_snapshot(spark, lt)
        .join(read_snapshot(spark, rt), F.col("c_custkey") == F.col("o_custkey"))
        .select(
            "c_custkey", "c_nationkey", "c_acctbal", "o_orderkey", "o_totalprice"
        )
    )
    plan_m = mm._jdf.queryExecution().executedPlan().toString()
    n_m, h_m = checksum(mm)
    n_g2, h_g2 = checksum(gen)
    assert (n_m, h_m) == (n_g2, h_g2), "mismatch-tier parity broke"
    result["mismatch"] = {
        "left_buckets": 2 * N_BUCKETS,
        "right_buckets": N_BUCKETS,
        "join_rows": n_m,
        "tasks": mm.rdd.getNumPartitions(),
        "exchanges": plan_m.count("Exchange"),
        "coloc_sec": round(timed(mm), 3),
        "generic_sec": round(timed(gen), 3),
    }
    print(f"mismatch: {result['mismatch']}", file=sys.stderr)

    # PUSHDOWN tier (round 12): the SQL-routed form of the x16 join
    # with a selective one-sided WHERE — the front-end pushes the
    # conjunct into the source (row-exact Arrow filter BEFORE the
    # per-bucket hash join; file prune when stats allow), vs the same
    # predicate applied after a generic shuffle join. Parity-checked.
    from reactivestreams_kinesis_spark.operators.sql_frontend import (
        SnapshotWarehouse,
    )

    wh = SnapshotWarehouse(spark, {"cust": lt, "ords": rt})
    routed = wh.sql(
        "SELECT c.c_custkey, c.c_acctbal, o.o_totalprice "
        "FROM cust c JOIN ords o ON c.c_custkey = o.o_custkey "
        "WHERE c.c_acctbal >= 9000.0"
    )
    plan_p = routed._jdf.queryExecution().executedPlan().toString()
    assert "snapshot_colocated_join" in plan_p, "pushdown tier must route"
    gen_p = (
        read_snapshot(spark, lt)
        .join(read_snapshot(spark, rt), F.col("c_custkey") == F.col("o_custkey"))
        .filter(F.col("c_acctbal") >= 9000.0)
        .select("c_custkey", "c_acctbal", "o_totalprice")
    )
    n_p, h_p = checksum(routed)
    n_gp, h_gp = checksum(gen_p)
    assert (n_p, h_p) == (n_gp, h_gp), "pushdown-tier parity broke"
    result["pushdown"] = {
        "join_rows": n_p,
        "routed_exchanges": plan_p.count("Exchange"),
        "routed_sec": round(timed(routed), 3),
        "generic_sec": round(timed(gen_p), 3),
    }
    print(f"pushdown: {result['pushdown']}", file=sys.stderr)

    # AGG tier (round 12, 3rd session): bucket-local GROUP BY
    # (colocated_groupby — the aggregation finalizes inside each
    # bucket's scan task) vs the generic partial→exchange→final plan,
    # on the x16 orders table grouped by the bucket key (group count ~
    # distinct customers × 16 — the high-cardinality regime where the
    # exchange volume tracks group count). SUM runs over the integer
    # orderkey so both plans' checksums are float-order-free.
    from reactivestreams_kinesis_spark.sources.colocated import (
        colocated_groupby,
    )

    rt16 = os.path.join(base, "x16_orders")
    bagg = colocated_groupby(
        spark,
        rt16,
        group_by=["o_custkey"],
        aggs={
            "n": ("count", None),
            "s": ("sum", "o_orderkey"),
            "hi": ("max", "o_totalprice"),
        },
    )
    gagg = (
        read_snapshot(spark, rt16)
        .groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("o_orderkey").alias("s"),
            F.max("o_totalprice").alias("hi"),
        )
    )
    plan_b = bagg._jdf.queryExecution().executedPlan().toString()
    plan_ga = gagg._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan_b and "HashAggregate" not in plan_b
    n_b, h_b = checksum(bagg)
    n_ga, h_ga = checksum(gagg)
    assert (n_b, h_b) == (n_ga, h_ga), "agg-tier parity broke"
    result["agg"] = {
        "groups": n_b,
        "bagg_exchanges": plan_b.count("Exchange"),
        "generic_exchanges": plan_ga.count("Exchange"),
        "bagg_sec": round(timed(bagg), 3),
        "generic_sec": round(timed(gagg), 3),
    }
    print(f"agg: {result['agg']}", file=sys.stderr)

    # ENTITY-GRAINED agg tier: groups ~ rows (per-document/per-event
    # stats — the shape this engine's LLM-corpus rollups take). The
    # generic plan's partial aggregate achieves no reduction, so its
    # exchange moves the ENTIRE table — a real cost even on one node;
    # the bucket-local plan still finalizes in-scan with zero moved.
    ebagg = colocated_groupby(
        spark,
        rt16,
        group_by=["o_custkey", "o_orderkey"],
        aggs={
            "n": ("count", None),
            "s": ("sum", "o_orderkey"),
            "hi": ("max", "o_totalprice"),
        },
    )
    egagg = (
        read_snapshot(spark, rt16)
        .groupBy("o_custkey", "o_orderkey")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("o_orderkey").alias("s"),
            F.max("o_totalprice").alias("hi"),
        )
    )
    plan_eb = ebagg._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan_eb and "HashAggregate" not in plan_eb
    n_eb, h_eb = checksum(ebagg)
    n_eg, h_eg = checksum(egagg)
    assert (n_eb, h_eb) == (n_eg, h_eg), "entity-agg-tier parity broke"
    result["agg_entity"] = {
        "groups": n_eb,
        "bagg_sec": round(timed(ebagg), 3),
        "generic_sec": round(timed(egagg), 3),
    }
    print(f"agg_entity: {result['agg_entity']}", file=sys.stderr)

    shutil.rmtree(base, ignore_errors=True)
    doc = json.dumps(result)
    print(doc)
    if out_path:
        fd, tmp = tempfile.mkstemp(dir=os.path.dirname(out_path) or ".")
        with os.fdopen(fd, "w") as f:
            f.write(doc + "\n")
        os.replace(tmp, out_path)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
