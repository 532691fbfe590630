#!/usr/bin/env python
"""Merge-on-read vs copy-on-write DELETE cost, and the DV read tax.

SCALING.md claims: a merge-on-read delete's write cost is proportional
to DELETED ROWS (position files only, zero data rewritten), where
copy-on-write pays a rewrite of every TOUCHED file; the price is a
scan-time anti-join until compaction materializes the DVs. This
measures all three sides on a lineitem-derived snapshot table:

- rungs of delete selectivity (a value scattered across every file —
  CoW's worst case — and a contiguous key range that localizes to ~1
  file): wall time, bytes written, files rewritten, for both strategies;
- the read tax: full-scan aggregate on the DV'd table vs the same
  table after compaction (and vs pre-delete).

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
    delete_where,
    latest_version,
    read_snapshot,
    snapshot_commit,
)
from reactivestreams_kinesis_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
N_FILES = 32


def _table_bytes(table_dir: str, rel_files) -> int:
    return sum(os.path.getsize(os.path.join(table_dir, f)) for f in rel_files)


def _fresh_table(spark, li) -> str:
    t = os.path.join(tempfile.gettempdir(), f"rsk_dv_bench_{uuid.uuid4().hex[:8]}")
    snapshot_commit(li.repartitionByRange(N_FILES, "row_id"), t)
    return t


def _run_delete(spark, li, preds, strategy) -> dict:
    t = _fresh_table(spark, li)
    v0 = _read_manifest(t, 0)
    t0 = time.perf_counter()
    delete_where(spark, t, preds, strategy=strategy)
    wall = time.perf_counter() - t0
    tip = _read_manifest(t, latest_version(t))
    new_data = [f for f in tip["files"] if f not in set(v0["files"])]
    dv_files = tip.get("delete_files") or []
    out = {
        "strategy": strategy,
        "wall_sec": round(wall, 3),
        "files_rewritten": len(new_data),
        "bytes_written": _table_bytes(t, new_data) + _table_bytes(t, dv_files),
        "rows_deleted": sum((tip.get("dv_counts") or {}).values()) or None,
    }
    # read tax: one full-scan aggregate under DVs, then after compaction
    if strategy == "merge_on_read":
        t0 = time.perf_counter()
        read_snapshot(spark, t).agg(F.sum("l_quantity")).collect()
        out["scan_with_dv_sec"] = round(time.perf_counter() - t0, 3)
        compact_snapshot(spark, t, target_file_bytes=128 << 20)
        t0 = time.perf_counter()
        read_snapshot(spark, t).agg(F.sum("l_quantity")).collect()
        out["scan_after_compact_sec"] = round(time.perf_counter() - t0, 3)
    return out


def main() -> int:
    spark = get_spark()
    li = load_table(spark, SF_DIR, "lineitem").select(
        F.expr("l_orderkey * 10 + l_linenumber").alias("row_id"),
        "l_orderkey",
        "l_quantity",
        "l_extendedprice",
    )
    n_rows = li.count()
    max_id = li.agg(F.max("row_id")).collect()[0][0]
    results = {"sf_dir": SF_DIR, "n_files": N_FILES, "n_rows": n_rows, "rungs": []}

    # baseline scan (no deletes) for the read-tax comparison
    t = _fresh_table(spark, li)
    t0 = time.perf_counter()
    read_snapshot(spark, t).agg(F.sum("l_quantity")).collect()
    results["scan_clean_sec"] = round(time.perf_counter() - t0, 3)

    rungs = [
        # scattered-by-construction: ~2% of rows (one of 50 uniform
        # quantity values), present in EVERY file — CoW's worst case
        # per deleted row
        ("scattered_2pct", [("l_quantity", "=", 50.0)]),
        # contiguous key range ~3% of rows, localizes to ~1 file
        ("contiguous_3pct", [("row_id", "<=", int(max_id * 0.03))]),
    ]
    for name, preds in rungs:
        for strategy in ("copy_on_write", "merge_on_read"):
            r = _run_delete(spark, li, preds, strategy)
            r["rung"] = name
            results["rungs"].append(r)
            print(f"  {name} {strategy}: {r}", file=sys.stderr)

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
