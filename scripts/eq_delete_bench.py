#!/usr/bin/env python
"""Stacked equality-delete read ladder (round 12): cost of reading a
table carrying K pending ``delete_by_key`` entries — the
deletes-between-compactions shape (a CDC apply loop or MV merge-refresh
cadence that hasn't compacted yet).

Per tier: one 200k-row base commit, K equality-delete commits (bounded
key sets, same key column, no appends between — one congruence group),
then time ``read_snapshot`` to the noop sink and count the plan's
anti-joins and parquet scans. Before the round-12 coalescing each entry
chained its own anti-join (K broadcast builds, K probe passes); after,
one group = one anti-join over one unioned key scan. One JSON document;
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

from reactivestreams_kinesis_spark.operators.snapshots import (
    delete_by_key,
    read_snapshot,
    snapshot_commit,
)
from reactivestreams_kinesis_spark.plans.inspect import explain_string
from reactivestreams_kinesis_spark.session import get_spark


def main() -> int:
    out_path = None
    args = sys.argv[1:]
    if "--out" in args:
        out_path = args[args.index("--out") + 1]
    spark = get_spark(app_name="rsk-eq-delete-bench")

    tiers: dict[str, dict] = {}
    for k in (4, 16, 48):
        d = tempfile.mkdtemp(prefix="eq-bench-")
        t = os.path.join(d, "t")
        snapshot_commit(
            spark.range(0, 200_000).selectExpr("id AS k", "id * 2 AS v"), t
        )
        for i in range(k):
            delete_by_key(
                spark,
                t,
                spark.range(i * 100, i * 100 + 50).selectExpr("id AS k"),
                "k",
            )
        best = float("inf")
        for _trial in range(2):
            s = time.perf_counter()
            read_snapshot(spark, t).write.format("noop").mode(
                "overwrite"
            ).save()
            best = min(best, time.perf_counter() - s)
        plan = explain_string(read_snapshot(spark, t), "simple")
        tiers[f"k{k}"] = {
            "entries": k,
            "read_noop_sec": round(best, 3),
            "anti_joins_in_plan": plan.count("LeftAnti"),
            "parquet_scans_in_plan": plan.count("Scan parquet"),
        }
        shutil.rmtree(d)
        print(f"tier k{k}: {tiers[f'k{k}']}")

    doc = {"base_rows": 200_000, "tiers": tiers}
    if out_path:
        fd, tmp = tempfile.mkstemp(dir=os.path.dirname(out_path) or ".")
        with os.fdopen(fd, "w") as f:
            json.dump(doc, f, indent=1)
        os.replace(tmp, out_path)
    print(json.dumps(doc))
    return 0


if __name__ == "__main__":
    sys.exit(main())
