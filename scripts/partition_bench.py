"""Measure partition-spec pruning across a table-size ladder (round 10).

Claim under measurement: a point/partition-selective scan on a table
with a declared PARTITION SPEC costs what the MATCHING PARTITIONS hold,
not what the table holds — the manifest's per-file partition tuples
(`__pvals`) skip files at plan time, before any task launches.

Method: a synthetic ladder built from sf0.1 orders replicated with
shifted keys (x1 / x4 / x16 → 150 k / 600 k / 2.4 M rows). Two layouts
per tier over the same rows:

- identity(o_custkey % 64) partition spec — the scan predicate selects
  ONE partition value; expectation: scan time ~FLAT across the ladder
  (matching files only; file count per partition is constant),
  while the specless scan of the same rows grows with the table;
- bucket(32) on o_orderkey — a point lookup; expectation: the bucket
  tuples prune what min/max NEVER can on a hash-scattered key
  (every file's [min,max] spans the domain), so files-planned drops
  ~32x vs the stats-only table.

Reported per tier: files planned (pruned vs total) and wall time
(best of 2, warm) for partitioned vs specless. Companion numbers to
the bucketed-join / skew / CDF ladders in SCALING.md.

Run on a quiet box: python scripts/partition_bench.py
Writes PARTITION_BENCH.json at the repo root.
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
    prune_files,
    scan_snapshot,
    snapshot_commit,
)
from reactivestreams_kinesis_spark.session import get_spark  # noqa: E402

SHIFT = 10_000_000


def best_of_2(fn):
    a = fn()
    b = fn()
    return round(min(a, b), 3)


def timed(fn):
    t0 = time.monotonic()
    n = fn()
    return time.monotonic() - t0, n


def run_tier(spark, base, mult: int) -> dict:
    rep = base
    for i in range(1, mult):
        rep = rep.unionByName(
            base.withColumn("o_orderkey", F.col("o_orderkey") + i * SHIFT)
        )
    rep = rep.withColumn("pkey", (F.col("o_custkey") % 64).cast("int"))
    tier: dict = {"rows": rep.count()}

    # identity-partitioned vs specless over the SAME rows
    tp = os.path.join(tempfile.gettempdir(), f"pb_p_{uuid.uuid4().hex[:8]}")
    tn = os.path.join(tempfile.gettempdir(), f"pb_n_{uuid.uuid4().hex[:8]}")
    snapshot_commit(rep, tp, partition_by=["pkey"])
    snapshot_commit(rep.repartition(32 * mult), tn)
    mp, mn = _read_manifest(tp, 0), _read_manifest(tn, 0)
    preds = [("pkey", "=", 7)]
    tier["identity"] = {
        "files_total": len(mp["files"]),
        "files_planned": len(prune_files(mp, preds)),
        "specless_files_total": len(mn["files"]),
        "specless_files_planned": len(prune_files(mn, preds)),
        "scan_sec": best_of_2(
            lambda: timed(lambda: scan_snapshot(spark, tp, preds).count())[0]
        ),
        "specless_scan_sec": best_of_2(
            lambda: timed(lambda: scan_snapshot(spark, tn, preds).count())[0]
        ),
    }

    # bucket(32) point lookup vs stats-only on a hash-scattered key
    tb = os.path.join(tempfile.gettempdir(), f"pb_b_{uuid.uuid4().hex[:8]}")
    shuffled = rep.repartition(32 * mult)  # hash-scattered: min/max useless
    snapshot_commit(shuffled, tb, partition_by=[("o_orderkey", "bucket", 32)])
    ts = os.path.join(tempfile.gettempdir(), f"pb_s_{uuid.uuid4().hex[:8]}")
    snapshot_commit(shuffled, ts)
    # pick a real key near the middle of the tier's key domain
    mid = int(rep.agg(F.percentile_approx("o_orderkey", 0.5)).collect()[0][0])
    key = int(
        rep.filter(F.col("o_orderkey") >= mid)
        .agg(F.min("o_orderkey"))
        .collect()[0][0]
    )
    mb, ms = _read_manifest(tb, 0), _read_manifest(ts, 0)
    bpred = [("o_orderkey", "=", key)]
    tier["bucket"] = {
        "files_total": len(mb["files"]),
        "files_planned": len(prune_files(mb, bpred)),
        "statsonly_files_total": len(ms["files"]),
        "statsonly_files_planned": len(prune_files(ms, bpred)),
        "lookup_sec": best_of_2(
            lambda: timed(lambda: scan_snapshot(spark, tb, bpred).count())[0]
        ),
        "statsonly_lookup_sec": best_of_2(
            lambda: timed(lambda: scan_snapshot(spark, ts, bpred).count())[0]
        ),
    }
    return tier


def main() -> None:
    spark = get_spark(app_name="partition_bench")
    spark.sparkContext.setLogLevel("ERROR")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    base = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    out = {"sf_dir": sf_dir, "tiers": {}}
    for mult in (1, 4, 16):
        out["tiers"][f"x{mult}"] = run_tier(spark, base, mult)
        print(json.dumps({f"x{mult}": out["tiers"][f"x{mult}"]}))
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(root, "PARTITION_BENCH.json"), "w") as f:
        json.dump(out, f, indent=2)
    print("wrote PARTITION_BENCH.json")


if __name__ == "__main__":
    main()
