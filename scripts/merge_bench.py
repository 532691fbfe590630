#!/usr/bin/env python
"""Copy-on-write MERGE cost ladder: SCALING.md claims "a merge touching
0.1% of files costs 0.1% of a full rewrite". This measures it: a
lineitem-derived snapshot table range-partitioned into N_FILES files,
then merges whose update keys localize to ~1 file, ~1/4 of the files,
and every file — wall time and rewritten-file count per rung. The
narrow-merge rung should cost a small, file-count-proportional fraction
of the full-width rung (floor = the targeting scan, one pass over the
candidates).

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
    latest_version,
    merge_upsert,
    snapshot_commit,
)
from reactivestreams_kinesis_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
N_FILES = 32


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

    # updates sized to touch ~1, ~N/4, and all range files: contiguous
    # row_id spans of the corresponding width
    # full first: JVM warmup biases AGAINST the narrow-merge claim
    for label, frac in [("full", 1.0), ("quarter", 0.25), ("narrow", 1.0 / N_FILES)]:
        t = os.path.join(tempfile.gettempdir(), f"rsk_merge_bench_{uuid.uuid4().hex[:8]}")
        snapshot_commit(li.repartitionByRange(N_FILES, "row_id"), t)
        files_v0 = _read_manifest(t, 0)["files"]
        hi = int(max_id * frac)
        updates = li.filter(F.col("row_id") <= hi).select(
            "row_id",
            "l_orderkey",
            (F.col("l_quantity") + 1).alias("l_quantity"),
            "l_extendedprice",
        )
        n_upd = updates.count()
        start = time.perf_counter()
        v = merge_upsert(spark, t, updates, "row_id")
        wall = time.perf_counter() - start
        retained = sum(1 for f in files_v0 if f in set(_read_manifest(t, v)["files"]))
        results["rungs"].append(
            {
                "label": label,
                "update_rows": n_upd,
                "files_rewritten": N_FILES - retained,
                "files_retained": retained,
                "merge_sec": round(wall, 3),
            }
        )
    out = json.dumps(results)
    print(out)
    for i, arg in enumerate(sys.argv):
        if arg == "--out" and i + 1 < len(sys.argv):
            path = sys.argv[i + 1]
            tmp = path + ".tmp"
            with open(tmp, "w") as f:
                f.write(out + "\n")
            os.replace(tmp, path)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
