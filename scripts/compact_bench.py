#!/usr/bin/env python
"""Incremental vs full compaction cost on a streaming-shaped table:
one compacted bulk file plus a tail of K small epoch commits. SCALING.md
claims the bin-pack mode's cost is proportional to the TAIL — this
measures both modes on the same table (fresh copy each, full first so
warmup biases against the claim).

Prints one JSON document; ``--out PATH`` writes it atomically.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time
import uuid

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from reactivestreams_kinesis_spark.catalog import load_table
from reactivestreams_kinesis_spark.operators.snapshots import (
    _read_manifest,
    compact_snapshot,
    latest_version,
    read_snapshot,
    snapshot_commit,
)
from reactivestreams_kinesis_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
TAIL = 12


def _build(spark, li) -> str:
    t = os.path.join(tempfile.gettempdir(), f"rsk_cb_{uuid.uuid4().hex[:8]}")
    snapshot_commit(li.repartition(4), t)  # the compacted bulk
    for i in range(TAIL):  # small epoch commits (~1/200 of the bulk each)
        snapshot_commit(
            li.filter(F.col("l_orderkey") % 200 == i).repartition(1), t
        )
    return t


def main() -> int:
    spark = get_spark()
    li = load_table(spark, SF_DIR, "lineitem").select(
        "l_orderkey", "l_quantity", "l_extendedprice"
    )
    results = {"sf_dir": SF_DIR, "tail_files": TAIL}

    for mode in ("full", "incremental"):
        t = _build(spark, li)
        n_before = read_snapshot(spark, t).count()
        files_before = len(_read_manifest(t, latest_version(t))["files"])
        t0 = time.perf_counter()
        if mode == "full":
            compact_snapshot(spark, t, target_file_bytes=64 << 20)
        else:
            # threshold above the epoch files, below the bulk files
            compact_snapshot(
                spark, t, target_file_bytes=64 << 20, small_file_bytes=1 << 20
            )
        wall = time.perf_counter() - t0
        m = _read_manifest(t, latest_version(t))
        results[mode] = {
            "wall_sec": round(wall, 3),
            "files_before": files_before,
            "files_after": len(m["files"]),
            "rows_stable": read_snapshot(spark, t).count() == n_before,
        }
        print(f"  {mode}: {results[mode]}", file=sys.stderr)

    doc = json.dumps(results)
    print(doc)
    if "--out" in sys.argv:
        path = sys.argv[sys.argv.index("--out") + 1]
        tmp = path + ".tmp"
        with open(tmp, "w") as fh:
            fh.write(doc + "\n")
        os.replace(tmp, path)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
