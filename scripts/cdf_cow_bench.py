"""Measure change-feed extraction cost across rewrite commits (round 9).

Claim under measurement: `snapshot_change_feed`'s rewrite diff
(`_rewrite_change_rows`) costs what the REWRITE touched, not what the
table holds. Method: a synthetic table-size ladder built from sf0.1
orders replicated with shifted keys (x1 / x4 / x16 -> 150 k / 600 k /
2.4 M rows; 32->128 range files so file size stays constant - the
100 TB-realistic axis is MORE files, not bigger ones). On each tier,
measure the feed (best of 2, warm) over (a) a TARGETED merge of a fixed
500-key contiguous range - expectation: ~FLAT across the ladder (the
diff reads only the touched files) - (b) a FULL overwrite rewriting
every row - expectation: grows with the table, because it IS a
full-table diff - and (c) a reorg compaction - expectation: planned
away, zero data read. Companion numbers to DV_BENCH/CDC_BENCH.

Run on a quiet box: python scripts/cdf_cow_bench.py
Writes CDF_COW_BENCH.json at the repo root.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time
import uuid

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from reactivestreams_kinesis_spark.catalog import load_table  # noqa: E402
from reactivestreams_kinesis_spark.operators.snapshots import (  # noqa: E402
    _read_manifest,
    compact_snapshot,
    merge_upsert,
    snapshot_change_feed,
    snapshot_commit,
)
from reactivestreams_kinesis_spark.session import get_spark  # noqa: E402

N_UPD = 500          # fixed targeted-update size across tiers
SHIFT = 10_000_000   # key shift per replica (sf0.1 max o_orderkey << this)


def best_of_2(fn):
    a = fn()
    b = fn()
    return round(min(a, b), 3)


def run_tier(spark, base, mult: int) -> dict:
    rep = base
    for i in range(1, mult):
        rep = rep.unionByName(base.withColumn("lk", F.col("lk") + i * SHIFT))
    n_files = 32 * mult  # constant file size; more files
    t = os.path.join(tempfile.gettempdir(), f"cdfcow_{uuid.uuid4().hex[:8]}")
    snapshot_commit(rep.repartitionByRange(n_files, "lk"), t)          # v0
    tier: dict = {"rows": rep.count(), "n_files": n_files}

    upd = base.orderBy("lk").limit(N_UPD).select(
        "lk", "ck", (F.col("price") + 1.0).alias("price"), "odate"
    )
    merge_upsert(spark, t, upd, "lk")                                  # v1
    tier["touched_files"] = len(
        set(_read_manifest(t, 0)["files"]) - set(_read_manifest(t, 1)["files"])
    )

    def targeted():
        t0 = time.time()
        n = snapshot_change_feed(spark, t, from_version=0, to_version=1).count()
        tier["targeted_feed_rows"] = n
        return time.time() - t0

    tier["targeted_sec"] = best_of_2(targeted)

    compact_snapshot(spark, t)                                         # v2 reorg
    t0 = time.time()
    try:
        snapshot_change_feed(spark, t, from_version=1, to_version=2)
        raise AssertionError("reorg-only range must report no changes")
    except ValueError:
        pass
    tier["reorg_sec"] = round(time.time() - t0, 3)

    snapshot_commit(
        rep.select(
            "lk", "ck", (F.col("price") + 2.0).alias("price"), "odate"
        ).repartitionByRange(n_files, "lk"),
        t,
        mode="overwrite",
    )                                                                  # v3

    def full():
        t0 = time.time()
        n = snapshot_change_feed(spark, t, from_version=2, to_version=3).count()
        tier["full_feed_rows"] = n
        return time.time() - t0

    tier["full_sec"] = best_of_2(full)
    return tier


def main() -> None:
    spark = get_spark(app_name="cdf-cow-bench", cpus=32, shuffle_partitions=32)
    base = load_table(spark, "/root/testdata/sf0.1", "orders").select(
        F.col("o_orderkey").alias("lk"),
        F.col("o_custkey").alias("ck"),
        F.col("o_totalprice").alias("price"),
        F.col("o_orderdate").alias("odate"),
    )
    out: dict = {"n_upd": N_UPD, "tiers": {}}
    try:
        out["loadavg_start"] = list(os.getloadavg())
    except OSError:
        pass
    for mult in (1, 4, 16):
        out["tiers"][f"x{mult}"] = run_tier(spark, base, mult)
    t1, t4, t16 = (out["tiers"][k] for k in ("x1", "x4", "x16"))
    out["targeted_growth_x16"] = round(
        t16["targeted_sec"] / max(t1["targeted_sec"], 1e-9), 2
    )
    out["full_growth_x16"] = round(
        t16["full_sec"] / max(t1["full_sec"], 1e-9), 2
    )
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "CDF_COW_BENCH.json",
    )
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
