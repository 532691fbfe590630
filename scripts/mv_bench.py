#!/usr/bin/env python
"""Materialized-view refresh scale ladder (round 10): pin the
delta-proportional claim of ``operators/matview.py`` — refresh cost
follows the DELTA, not the table.

Each tier builds a source table K× the sf0.1 customer base (new key
ranges, group cardinality fixed at 25 nations), creates TWO views, then
applies the SAME fixed-size delta at every tier (one bounded append +
one merge-on-read delete over a fixed key range + one append) and
measures:

- ``refresh_arith_sec``: refresh of a count/sum view — pure retraction
  arithmetic, ZERO source access (feed + view only)
- ``refresh_minmax_sec``: refresh of a view that also carries min/max —
  pays the dirty-group recompute (a pruned source scan for retracting
  groups)
- ``refresh_merge_composite_sec`` (round 12): refresh of a
  COMPOSITE-key (nation, segment) count/sum view under
  ``strategy='merge'`` — the tuple-keyed equality-delete/merge path,
  measuring that the round-12 composite support keeps the
  delta-proportional shape (cost follows the touched tuples, not the
  view or the table)
- ``refresh_hist_sec`` (round 12, second session): refresh of a
  percentile view (``hist_quantile`` p95) under ``strategy='merge'`` —
  bin counts are fully abelian, so the retracting delta costs sketch
  arithmetic only; the pin is that this line tracks the ARITH view's
  flat shape, not the minmax view's dirty-scan shape
- ``recompute_sec``: the naive alternative — full aggregate over the
  source at the same version, committed the same way

The claim under measurement is SHAPE, not absolute speed: refresh cost
is ~flat in table size (delta-proportional) while recompute grows with
the table — at these local scales the recompute of a 15k-row table is
trivially cheap and the refresh's fixed multi-job overhead dominates,
so the ladder runs to x64 to expose the trend lines honestly. Parity
(view ≡ recompute) asserts at every tier. One JSON document;
``--out PATH`` writes atomically.
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
from reactivestreams_kinesis_spark.operators.matview import (
    create_materialized_view,
    read_materialized_view,
    refresh_materialized_view,
)
from reactivestreams_kinesis_spark.operators.snapshots import (
    delete_where,
    read_snapshot,
    snapshot_commit,
)
from reactivestreams_kinesis_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> int:
    out_path = None
    args = sys.argv[1:]
    if "--out" in args:
        out_path = args[args.index("--out") + 1]
    spark = get_spark(app_name="rsk-mv-bench")

    cust0 = load_table(spark, SF_DIR, "customer").select(
        "c_custkey", "c_nationkey", F.col("c_acctbal").cast("decimal(12,2)").alias("bal")
    )
    base = os.path.join(tempfile.gettempdir(), "rsk_mv_bench")
    shutil.rmtree(base, ignore_errors=True)
    result = {"sf_dir": SF_DIR, "tiers": {}}
    arith_aggs = {"n": ("count", None), "total": ("sum", "bal")}
    minmax_aggs = {**arith_aggs, "lo": ("min", "bal"), "hi": ("max", "bal")}

    # x256 tier added in round 11: at x64 the arith refresh and the
    # recompute sat at parity (1.13 vs 1.11 s) — the crossover claim
    # needs a tier where the growing recompute is unambiguously past
    # the flat refresh
    for scale in (1, 4, 16, 64, 256):
        rep = spark.range(scale).withColumnRenamed("id", "__rep")
        src = (
            cust0.crossJoin(rep)
            .withColumn(
                "c_custkey",
                F.col("c_custkey") + F.col("__rep") * F.lit(100_000_000),
            )
            .drop("__rep")
            .withColumn("seg", (F.col("c_custkey") % 4).cast("int"))
            .withColumn("bal_d", F.col("bal").cast("double"))
        )
        t = os.path.join(base, f"x{scale}_src")
        va = os.path.join(base, f"x{scale}_view_arith")
        vm = os.path.join(base, f"x{scale}_view_minmax")
        # identity partition spec on the group key: the min/max dirty
        # recompute's IN-list scan then prunes to the dirty groups'
        # files — the layout/operator synergy the refresh is designed
        # around (without it the recompute reads the whole table)
        snapshot_commit(
            src.repartition(max(8, 4 * scale)),
            t,
            partition_by=["c_nationkey"],
        )
        create_materialized_view(
            spark, va, t, group_by=["c_nationkey"], aggs=arith_aggs
        )
        create_materialized_view(
            spark, vm, t, group_by=["c_nationkey"], aggs=minmax_aggs
        )
        vc = os.path.join(base, f"x{scale}_view_comp")
        create_materialized_view(
            spark, vc, t, group_by=["c_nationkey", "seg"], aggs=arith_aggs
        )
        # round-12 arm: a percentile view (hist_quantile) — fully
        # abelian bin counts, so the retracting delta below costs
        # sketch arithmetic only (no dirty source scan, the cost
        # minmax pays); the ladder pins that its refresh tracks the
        # arith view's flat line, not the minmax view's
        vh = os.path.join(base, f"x{scale}_view_hist")
        create_materialized_view(
            spark,
            vh,
            t,
            group_by=["c_nationkey"],
            aggs={
                "n": ("count", None),
                "p95": (
                    "hist_quantile",
                    "bal_d",
                    {"q": 0.95, "lo": -1000.0, "hi": 10000.0, "bins": 55},
                ),
            },
        )
        n_rows = read_snapshot(spark, t).count()

        # the FIXED delta: same row count at every tier
        delta_ins = load_table(spark, SF_DIR, "nation").select(
            (F.lit(900_000_000) + F.col("n_nationkey")).cast("bigint").alias(
                "c_custkey"
            ),
            F.col("n_nationkey").alias("c_nationkey"),
            F.col("n_nationkey").cast("decimal(12,2)").alias("bal"),
        ).withColumn("seg", (F.col("c_custkey") % 4).cast("int")).withColumn(
            "bal_d", F.col("bal").cast("double")
        )
        snapshot_commit(delta_ins, t)
        # the retraction touches ONE group (nation 3) — the realistic
        # CDC shape: a delta dirties few groups, so the min/max
        # recompute scans only those groups' (partition-pruned) files
        delete_where(
            spark,
            t,
            [("c_custkey", "=", 900_000_003)],
            strategy="merge_on_read",
        )
        snapshot_commit(
            delta_ins.withColumn("bal", F.col("bal") + 1).withColumn(
                "bal_d", F.col("bal").cast("double")
            ),
            t,
        )

        start = time.perf_counter()
        refresh_materialized_view(spark, va)
        refresh_arith_sec = time.perf_counter() - start
        start = time.perf_counter()
        refresh_materialized_view(spark, vm)
        refresh_minmax_sec = time.perf_counter() - start
        start = time.perf_counter()
        refresh_materialized_view(spark, vc, strategy="merge")
        refresh_merge_composite_sec = time.perf_counter() - start
        start = time.perf_counter()
        refresh_materialized_view(spark, vh, strategy="merge")
        refresh_hist_sec = time.perf_counter() - start

        def recompute():
            return read_snapshot(spark, t).groupBy("c_nationkey").agg(
                F.count(F.lit(1)).alias("n"),
                F.sum("bal").alias("total"),
                F.min("bal").alias("lo"),
                F.max("bal").alias("hi"),
            )

        start = time.perf_counter()
        rt = os.path.join(base, f"x{scale}_recomp")
        snapshot_commit(recompute(), rt)
        recompute_sec = time.perf_counter() - start

        got = {tuple(r) for r in read_materialized_view(spark, vm).collect()}
        exp = {tuple(r) for r in read_snapshot(spark, rt).collect()}
        assert got == exp, f"parity broke at x{scale}"
        got_c = {
            tuple(r) for r in read_materialized_view(spark, vc).collect()
        }
        exp_c = {
            tuple(r)
            for r in read_snapshot(spark, t)
            .groupBy("c_nationkey", "seg")
            .agg(F.count(F.lit(1)).alias("n"), F.sum("bal").alias("total"))
            .collect()
        }
        assert got_c == exp_c, f"composite-merge parity broke at x{scale}"
        # hist parity: the stored sketch inverted at q ≡ the binning
        # rule evaluated directly over the tip
        read_snapshot(spark, t).createOrReplaceTempView("mvb_src")
        exp_h = {
            tuple(r)
            for r in spark.sql(
                """
                WITH b AS (
                    SELECT c_nationkey,
                           LEAST(GREATEST(CAST(FLOOR((bal_d - (-1000.0))
                               / 200.0) AS INT), 0), 54) AS b
                    FROM mvb_src WHERE bal_d IS NOT NULL
                ),
                c AS (SELECT c_nationkey, b, COUNT(*) c
                      FROM b GROUP BY c_nationkey, b),
                r AS (SELECT c_nationkey, b,
                             SUM(c) OVER (PARTITION BY c_nationkey
                                          ORDER BY b) cum,
                             SUM(c) OVER (PARTITION BY c_nationkey) total
                      FROM c),
                nn AS (SELECT c_nationkey, COUNT(*) AS n
                       FROM mvb_src GROUP BY c_nationkey)
                SELECT nn.c_nationkey, nn.n,
                       CAST(-1000.0 AS DOUBLE)
                         + (MIN(CASE WHEN cum >= GREATEST(CAST(
                               CEIL(0.95 * total) AS BIGINT), 1)
                               THEN b END) + 0.5) * CAST(200.0 AS DOUBLE)
                           AS p95
                FROM nn JOIN r ON nn.c_nationkey = r.c_nationkey
                GROUP BY nn.c_nationkey, nn.n
                """
            ).collect()
        }
        got_h = {
            tuple(r) for r in read_materialized_view(spark, vh).collect()
        }
        assert got_h == exp_h, f"hist parity broke at x{scale}"

        tier = {
            "source_rows": n_rows,
            "refresh_arith_sec": round(refresh_arith_sec, 3),
            "refresh_minmax_sec": round(refresh_minmax_sec, 3),
            "refresh_merge_composite_sec": round(refresh_merge_composite_sec, 3),
            "refresh_hist_sec": round(refresh_hist_sec, 3),
            "recompute_sec": round(recompute_sec, 3),
        }
        result["tiers"][f"x{scale}"] = tier
        print(f"x{scale}: {tier}", file=sys.stderr)

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
