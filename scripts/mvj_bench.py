#!/usr/bin/env python
"""Join-materialized-view refresh scale ladder (round 11): pin the
delta-proportional claim of ``create_materialized_view_over_join`` —
the star-schema view's refresh cost follows the FACT DELTA (enriched
through the pinned dimension), not the fact table.

Each tier builds a fact table K× the sf0.1 orders base joined to the
FIXED customer dimension, creates a revenue-by-nation view (count +
sum grouped by a DIM attribute), applies the SAME fixed-size fact
delta at every tier (one bounded append + one merge-on-read delete of
a fixed key range), and measures:

- ``refresh_sec``: the incremental refresh — fact feed ⋈ pinned dim +
  the aggregate-sized view; no fact rescan
- ``recompute_sec``: the naive alternative — the full fact ⋈ dim
  aggregate at the same version, committed the same way

Round-12 dim tiers: the fact commits CUSTKEY-CLUSTERED
(repartitionByRange + sortWithinPartitions on the join key — the
layout every join-key access path in this engine assumes; tight
per-file min/max stats are what make bounded key probes prune to
files). After the fact delta, each tier applies the SAME fixed-size
DIMENSION changes and measures the incremental dim fold:

- ``refresh_dim_small_sec``: a 6-key SCD drip (4 migrations + 2
  deletes — the overwhelmingly common dim-change shape) — under the
  bounded-probe cap, so the fact access is an IN-predicate
  ``scan_snapshot`` that PRUNES TO O(keys) FILES on this layout and
  the dim feed broadcasts; cost is flat across fact scale.
- ``refresh_dim_wide_sec``: a 400-key migration + 100-key delete —
  over the cap, so the changed keys stay distributed, the fact scans
  once, and AQE converts the feed join to broadcast at runtime; cost
  tracks one fact scan (same asymptote as the rebuild, without
  rewriting the view).
- ``recompute_dim_sec``: the alternative the refusal policy forces —
  the full fact ⋈ new-dim aggregate (what on_dim_change='rebuild'
  pays). Grows with the table.

Claim shape: the small arm is FLAT while recompute grows (the ×256
tier makes the gap concrete); the wide arm tracks the scan, bounded
by recompute.

The claim is SHAPE (flat vs growing); parity (view ≡ direct join
aggregate) asserts at every tier and after every dim fold. One JSON
document; ``--out PATH`` writes atomically.
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
    create_materialized_view_over_join,
    read_materialized_view,
    refresh_materialized_view,
)
from reactivestreams_kinesis_spark.operators.snapshots import (
    delete_where,
    read_snapshot,
    snapshot_commit,
    update_where,
)
from reactivestreams_kinesis_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> int:
    out_path = None
    args = sys.argv[1:]
    if "--out" in args:
        out_path = args[args.index("--out") + 1]
    spark = get_spark(app_name="rsk-mvj-bench")

    orders0 = load_table(spark, SF_DIR, "orders").select(
        "o_orderkey",
        "o_custkey",
        F.col("o_totalprice").cast("decimal(12,2)").alias("price"),
    )
    dim_df = load_table(spark, SF_DIR, "customer").select(
        "c_custkey", "c_nationkey"
    )
    base = os.path.join(tempfile.gettempdir(), "rsk_mvj_bench")
    shutil.rmtree(base, ignore_errors=True)
    result = {"sf_dir": SF_DIR, "tiers": {}}
    aggs = {"n": ("count", None), "rev": ("sum", "price")}

    for scale in (1, 4, 16, 64, 256):
        # per-tier dim copy: tiers stay independent (each tier's dim
        # DML never leaks into the next tier's pin)
        dim = os.path.join(base, f"x{scale}_dim")
        snapshot_commit(dim_df, dim)
        rep = spark.range(scale).withColumnRenamed("id", "__rep")
        src = (
            orders0.crossJoin(rep)
            .withColumn(
                "o_orderkey",
                F.col("o_orderkey") + F.col("__rep") * F.lit(1_000_000_000),
            )
            .drop("__rep")
        )
        t = os.path.join(base, f"x{scale}_fact")
        v = os.path.join(base, f"x{scale}_view")
        snapshot_commit(
            src.repartitionByRange(max(8, 4 * scale), "o_custkey")
            .sortWithinPartitions("o_custkey"),
            t,
        )
        create_materialized_view_over_join(
            spark,
            v,
            t,
            dim,
            join_on=("o_custkey", "c_custkey"),
            group_by=["c_nationkey"],
            aggs=aggs,
        )
        n_rows = read_snapshot(spark, t).count()

        # the FIXED fact delta: same row count at every tier
        delta = orders0.limit(500).withColumn(
            "o_orderkey",
            # the delta key namespace must clear the replicated base
            # (rep*1e9 reaches 255e9 at x256) or the MoR delete below
            # silently targets base files and the "fixed-size" delta
            # becomes table-sized
            (F.col("o_orderkey") + F.lit(1_000_000_000_000)).cast("bigint"),
        )
        snapshot_commit(delta, t)
        delete_where(
            spark,
            t,
            [("o_orderkey", ">=", 1_000_000_000_000), ("price", ">", 200000.0)],
            strategy="merge_on_read",
        )

        start = time.perf_counter()
        refresh_materialized_view(spark, v)
        refresh_sec = time.perf_counter() - start

        def recompute():
            f = read_snapshot(spark, t)
            d = read_snapshot(spark, dim)
            return (
                f.join(d, f.o_custkey == d.c_custkey)
                .groupBy("c_nationkey")
                .agg(F.count(F.lit(1)).alias("n"), F.sum("price").alias("rev"))
            )

        rt = os.path.join(base, f"x{scale}_recomp")
        start = time.perf_counter()
        snapshot_commit(recompute(), rt, mode="overwrite")
        recompute_sec = time.perf_counter() - start

        got = {tuple(r) for r in read_materialized_view(spark, v).collect()}
        want = {tuple(r) for r in recompute().collect()}
        assert got == want, f"x{scale}: join view diverged from recompute"

        # dim tier A: the SCD drip (6 keys ≤ cap — IN-scan prunes the
        # clustered fact to O(keys) files, the feed broadcasts)
        update_where(
            spark, dim, [("c_custkey", "<=", 4)], {"c_nationkey": F.lit(88)}
        )
        delete_where(spark, dim, [("c_custkey", ">", 14998)])
        start = time.perf_counter()
        refresh_materialized_view(spark, v, on_dim_change="incremental")
        refresh_dim_small_sec = time.perf_counter() - start

        # dim tier B: wide change (500 keys > cap — the distributed path)
        update_where(
            spark, dim,
            [("c_custkey", ">", 250), ("c_custkey", "<=", 650)],
            {"c_nationkey": F.lit(77)},
        )
        delete_where(
            spark, dim,
            [("c_custkey", ">", 14800), ("c_custkey", "<=", 14900)],
        )
        start = time.perf_counter()
        refresh_materialized_view(spark, v, on_dim_change="incremental")
        refresh_dim_wide_sec = time.perf_counter() - start

        rt2 = os.path.join(base, f"x{scale}_recomp_dim")
        start = time.perf_counter()
        snapshot_commit(recompute(), rt2, mode="overwrite")
        recompute_dim_sec = time.perf_counter() - start

        got = {tuple(r) for r in read_materialized_view(spark, v).collect()}
        want = {tuple(r) for r in recompute().collect()}
        assert got == want, f"x{scale}: dim fold diverged from recompute"

        result["tiers"][f"x{scale}"] = {
            "fact_rows": n_rows,
            "refresh_sec": round(refresh_sec, 3),
            "recompute_sec": round(recompute_sec, 3),
            "refresh_dim_small_sec": round(refresh_dim_small_sec, 3),
            "refresh_dim_wide_sec": round(refresh_dim_wide_sec, 3),
            "recompute_dim_sec": round(recompute_dim_sec, 3),
        }
        print(f"x{scale}: {result['tiers'][f'x{scale}']}", file=sys.stderr)

    doc = json.dumps(result, indent=1)
    print(doc)
    if out_path:
        tmp = out_path + ".tmp"
        with open(tmp, "w") as f:
            f.write(doc + "\n")
        os.replace(tmp, out_path)
    shutil.rmtree(base, ignore_errors=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
