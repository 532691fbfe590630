#!/usr/bin/env python
"""Per-epoch CDC-apply cost: copy-on-write merge vs merge-on-read
(equality-delete + append) — the two strategies behind
``snapshot_stream_merge_sink``, measured on the primitives the sink
calls per micro-batch (foreachBatch adds only plumbing).

Setup: a lineitem-derived snapshot table (32 range files), then K epochs
of B scattered-key upserts applied with each strategy to its own copy.
Scattered keys are CoW's worst case (every batch touches most files →
per-epoch cost tracks the table's file count) and MoR's design point
(per-epoch cost is O(batch): write B rows + B keys + two manifests).
Afterwards, the read side of the trade: a full-scan aggregate on the
MoR table with K epochs of pending equality entries, and again after
one compaction folds them.

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
    compact_snapshot,
    delete_by_key,
    merge_upsert,
    read_snapshot,
    snapshot_commit,
)
from reactivestreams_kinesis_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
N_FILES = 32
EPOCHS = 6
BATCH = 2000


def main() -> int:
    spark = get_spark()
    # the synthetic fixture repeats (orderkey, linenumber) pairs, so fold
    # to one row per id deterministically (max-agg) — the bench needs a
    # unique merge key
    li = (
        load_table(spark, SF_DIR, "lineitem")
        .select(
            F.expr("l_orderkey * 10 + l_linenumber").alias("row_id"),
            "l_quantity",
            "l_extendedprice",
        )
        .groupBy("row_id")
        .agg(
            F.max("l_quantity").alias("l_quantity"),
            F.max("l_extendedprice").alias("l_extendedprice"),
        )
    )
    n_rows = li.count()
    results = {
        "sf_dir": SF_DIR,
        "n_rows": n_rows,
        "n_files": N_FILES,
        "epochs": EPOCHS,
        "batch_rows": BATCH,
    }

    tables = {}
    for strategy in ("copy_on_write", "merge_on_read"):
        t = os.path.join(
            tempfile.gettempdir(), f"rsk_cdc_bench_{uuid.uuid4().hex[:8]}"
        )
        snapshot_commit(li.repartitionByRange(N_FILES, "row_id"), t)
        tables[strategy] = t
        per_epoch = []
        for e in range(EPOCHS):
            # B scattered keys per epoch (stride walk over the id space)
            batch = (
                li.filter((F.col("row_id") + e) % (n_rows // BATCH) == 7)
                .limit(BATCH)
                .withColumn("l_quantity", F.col("l_quantity") + F.lit(1.0))
            )
            t0 = time.perf_counter()
            if strategy == "copy_on_write":
                merge_upsert(spark, t, batch, "row_id", txn_id=f"e{e}")
            else:
                delete_by_key(
                    spark, t, batch.select("row_id"), "row_id", txn_id=f"d{e}"
                )
                snapshot_commit(batch, t, txn_id=f"a{e}")
            per_epoch.append(round(time.perf_counter() - t0, 3))
        results[f"{strategy}_epoch_sec"] = per_epoch
        results[f"{strategy}_total_sec"] = round(sum(per_epoch), 3)

    t = tables["merge_on_read"]
    t0 = time.perf_counter()
    read_snapshot(spark, t).agg(F.sum("l_quantity")).collect()
    results["mor_scan_pending_sec"] = round(time.perf_counter() - t0, 3)
    t0 = time.perf_counter()
    compact_snapshot(spark, t, target_file_bytes=128 << 20)
    results["mor_compact_sec"] = round(time.perf_counter() - t0, 3)
    t0 = time.perf_counter()
    read_snapshot(spark, t).agg(F.sum("l_quantity")).collect()
    results["mor_scan_after_compact_sec"] = round(time.perf_counter() - t0, 3)

    # value sanity: both strategies converged to the same table
    a = read_snapshot(spark, tables["copy_on_write"])
    b = read_snapshot(spark, tables["merge_on_read"])
    results["tables_equal"] = (
        a.count() == b.count() and a.subtract(b).count() == 0
    )

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
