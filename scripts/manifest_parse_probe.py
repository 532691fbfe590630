#!/usr/bin/env python
"""Measure how many manifest JSON parses (and how many file entries those
parses deserialize) each warehouse operation pays at PLAN time. The parse
count is contention-proof evidence: it cannot be faked by box load.

Shapes probed (all metadata-path, tiny data):
  - read_snapshot of a V-commit table (tip read)
  - snapshot_change_feed over the full range (CDC catch-up)
  - find_txn miss (the O(versions) walk)
  - merge-strategy MV refresh
  - streaming drain of the table (one version per trigger)
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

from reactivestreams_kinesis_spark.session import get_spark
from reactivestreams_kinesis_spark.operators import snapshots as S

COUNTS = {"calls": 0, "file_entries": 0, "parses": 0}
_orig = S._read_manifest

import json as _json_real


class _CountingJson:
    """json shim for snapshots.py: counts load() parses (cache misses)."""

    def load(self, f):
        COUNTS["parses"] += 1
        return _json_real.load(f)

    def __getattr__(self, a):
        return getattr(_json_real, a)


S.json = _CountingJson()


def counting(table_dir, version):
    m = _orig(table_dir, version)
    COUNTS["calls"] += 1
    COUNTS["file_entries"] += len(m.get("files") or [])
    return m


def snap():
    out = dict(COUNTS)
    for k in COUNTS:
        COUNTS[k] = 0
    return out


def main() -> None:
    S._read_manifest = counting
    # also patch every importer that bound the name directly
    import reactivestreams_kinesis_spark.operators.matview as MV
    import reactivestreams_kinesis_spark.operators.merge_into as MI
    import reactivestreams_kinesis_spark.sources.colocated as CO
    import reactivestreams_kinesis_spark.sources.snapshot_source as SS

    for mod in (MV, MI, CO, SS):
        if hasattr(mod, "_read_manifest"):
            mod._read_manifest = counting

    spark = get_spark(app_name="manifest-parse-probe")
    spark.sparkContext.setLogLevel("ERROR")
    base = tempfile.mkdtemp(prefix="mparse_")
    t = os.path.join(base, "t")
    V = 64
    df0 = spark.range(0, 100).selectExpr("id AS k", "id * 2 AS v")
    S.snapshot_commit(df0, t)
    for i in range(1, V):
        S.snapshot_commit(
            spark.range(100 * i, 100 * i + 100).selectExpr("id AS k", "id * 2 AS v"),
            t,
            mode="append",
        )
    snap()

    r = S.read_snapshot(spark, t)
    r.write.format("noop").mode("overwrite").save()
    print("read_snapshot(tip):", snap(), flush=True)

    feed = S.snapshot_change_feed(spark, t, from_version=1, to_version=V - 1)
    feed.write.format("noop").mode("overwrite").save()
    print(f"change_feed(1..{V - 1}):", snap(), flush=True)

    S.find_txn(t, "no-such-txn")
    print("find_txn miss:", snap(), flush=True)

    t0 = time.perf_counter()
    for _ in range(10):
        S.read_snapshot(spark, t).write.format("noop").mode("overwrite").save()
    print(f"10x read_snapshot: {snap()} wall={time.perf_counter() - t0:.2f}s", flush=True)

    shutil.rmtree(base, ignore_errors=True)


if __name__ == "__main__":
    main()
