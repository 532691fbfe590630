#!/usr/bin/env python
"""Change-feed BACKFILL ladder (round 12): cost of draining a long
append-only version range through ``snapshot_change_feed`` — the CDC
catch-up shape (a consumer that fell behind by V commits, or an MV
refreshed after V appends).

Per tier: build a table of V append commits (fixed rows per commit so
total data grows with V), then time (a) feed plan construction and
(b) executing the feed to the noop sink. Before the round-12 batching,
the feed unioned V single-version scans — plan-build O(V) with a
~0.015 s/version constant and V separately scheduled scan stages whose
files cannot pack into shared splits; after it, consecutive compatible
appends share ONE scan whose ``_commit_version`` derives from the
commit directory. One JSON document; ``--out PATH`` writes atomically.
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
    snapshot_change_feed,
    snapshot_commit,
)
from reactivestreams_kinesis_spark.session import get_spark

ROWS_PER_COMMIT = 10_000


def main() -> int:
    out_path = None
    args = sys.argv[1:]
    if "--out" in args:
        out_path = args[args.index("--out") + 1]
    spark = get_spark(app_name="rsk-cdf-backfill-bench")

    tiers: dict[str, dict] = {}
    for n_versions in (8, 32, 64):
        d = tempfile.mkdtemp(prefix="cdf-backfill-")
        t = os.path.join(d, "t")
        for i in range(n_versions):
            snapshot_commit(
                spark.range(
                    i * ROWS_PER_COMMIT, (i + 1) * ROWS_PER_COMMIT
                ).selectExpr("id AS k", "id * 2 AS v", "id % 97 AS g"),
                t,
                mode="append",
            )
        best_plan, best_exec = float("inf"), float("inf")
        for _trial in range(2):
            t0 = time.perf_counter()
            feed = snapshot_change_feed(spark, t, from_version=0)
            t1 = time.perf_counter()
            feed.write.format("noop").mode("overwrite").save()
            t2 = time.perf_counter()
            best_plan = min(best_plan, t1 - t0)
            best_exec = min(best_exec, t2 - t1)
        from reactivestreams_kinesis_spark.plans.inspect import explain_string

        n_scans = explain_string(
            snapshot_change_feed(spark, t, from_version=0), "simple"
        ).count("Scan parquet")
        tiers[f"v{n_versions}"] = {
            "append_versions": n_versions,
            "rows": n_versions * ROWS_PER_COMMIT,
            "plan_build_sec": round(best_plan, 3),
            "exec_noop_sec": round(best_exec, 3),
            "parquet_scans_in_plan": n_scans,
        }
        shutil.rmtree(d)
        print(f"tier v{n_versions}: {tiers[f'v{n_versions}']}")

    # INTERLEAVED tier (round 13): the CDC MoR catch-up shape — every
    # append is followed by an equality-delete commit retracting a slice
    # of the PREVIOUS append's keys. Before round 13 each delete version
    # flushed the append run, so the feed planned one scan per append
    # (O(versions)); after, deletes keep the run open and every
    # compatible append shares ONE batched scan (O(runs) + the deletes'
    # own retraction scans).
    for n_pairs in (16, 32):
        d = tempfile.mkdtemp(prefix="cdf-backfill-ix-")
        t = os.path.join(d, "t")
        for i in range(n_pairs):
            snapshot_commit(
                spark.range(
                    i * ROWS_PER_COMMIT, (i + 1) * ROWS_PER_COMMIT
                ).selectExpr("id AS k", "id * 2 AS v", "id % 97 AS g"),
                t,
                mode="append",
            )
            lo = i * ROWS_PER_COMMIT
            keys = spark.range(lo, lo + 50).selectExpr("id AS k")
            delete_by_key(spark, t, keys, ["k"])
        best_plan, best_exec = float("inf"), float("inf")
        for _trial in range(2):
            t0 = time.perf_counter()
            feed = snapshot_change_feed(spark, t, from_version=0)
            t1 = time.perf_counter()
            feed.write.format("noop").mode("overwrite").save()
            t2 = time.perf_counter()
            best_plan = min(best_plan, t1 - t0)
            best_exec = min(best_exec, t2 - t1)
        from reactivestreams_kinesis_spark.plans.inspect import explain_string

        n_scans = explain_string(
            snapshot_change_feed(spark, t, from_version=0), "simple"
        ).count("Scan parquet")
        tiers[f"ix{n_pairs}"] = {
            "append_versions": n_pairs,
            "delete_versions": n_pairs,
            "rows": n_pairs * ROWS_PER_COMMIT,
            "plan_build_sec": round(best_plan, 3),
            "exec_noop_sec": round(best_exec, 3),
            "parquet_scans_in_plan": n_scans,
        }
        shutil.rmtree(d)
        print(f"tier ix{n_pairs}: {tiers[f'ix{n_pairs}']}")

    doc = {"rows_per_commit": ROWS_PER_COMMIT, "tiers": tiers}
    if out_path:
        fd, tmp = tempfile.mkstemp(dir=os.path.dirname(out_path) or ".")
        with os.fdopen(fd, "w") as f:
            json.dump(doc, f, indent=1)
        os.replace(tmp, out_path)
    print(json.dumps(doc))
    return 0


if __name__ == "__main__":
    sys.exit(main())
