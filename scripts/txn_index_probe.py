#!/usr/bin/env python
"""Count the filesystem metadata calls (stat / exists / listdir) each
``find_txn`` lookup pays on a V-version table — the residual left after
the round's parsed-manifest cache (every idempotent commit calls
``find_txn``: each ``merge_upsert``, each MV refresh phase). Syscall
counts are contention-proof evidence, same class as the parse counts in
``manifest_cache_ab.py``.

Shapes probed, before/after the txn index:
  - find_txn MISS (the common idempotency probe: txn not yet committed)
  - find_txn HIT  (crash-replay: txn already committed)
  - repeated misses across a commit loop (the maintenance cadence)
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile

sys.path.insert(0, "/root/repo")

from reactivestreams_kinesis_spark.session import get_spark
from reactivestreams_kinesis_spark.operators import snapshots as S

COUNTS = {"stat": 0, "exists": 0, "listdir": 0}
_stat, _exists, _listdir = os.stat, os.path.exists, os.listdir


def counting_stat(*a, **k):
    COUNTS["stat"] += 1
    return _stat(*a, **k)


def counting_exists(*a, **k):
    COUNTS["exists"] += 1
    return _exists(*a, **k)


def counting_listdir(*a, **k):
    COUNTS["listdir"] += 1
    return _listdir(*a, **k)


def snap() -> dict:
    out = dict(COUNTS)
    for key in COUNTS:
        COUNTS[key] = 0
    return out


def main() -> None:
    spark = get_spark(app_name="txn-index-probe")
    spark.sparkContext.setLogLevel("ERROR")
    base = tempfile.mkdtemp(prefix="txnidx_")
    t = os.path.join(base, "t")
    V = 64
    df0 = spark.range(0, 100).selectExpr("id AS k", "id * 2 AS v")
    S.snapshot_commit(df0, t)
    for i in range(1, V):
        S.snapshot_commit(df0, t, mode="append", txn_id=f"txn-{i}")

    os.stat, os.path.exists, os.listdir = counting_stat, counting_exists, counting_listdir
    try:
        snap()
        # cold miss (first call builds the index if one exists)
        assert S.find_txn(t, "txn-nope-0") is None
        cold = snap()
        # warm misses: 10 consecutive idempotency probes, the commit-loop shape
        for i in range(10):
            assert S.find_txn(t, f"txn-nope-{i + 1}") is None
        warm_miss = snap()
        # warm hits: oldest and newest committed txn
        assert S.find_txn(t, "txn-1") == 1
        assert S.find_txn(t, f"txn-{V - 1}") == V - 1
        warm_hit = snap()
        # COLD-PROCESS simulation (round 13): clear every in-process
        # cache, then one miss and one hit — the shape a FRESH driver
        # pays on its first idempotency probe against an existing
        # table. Before the persisted tip txn index this walked all V
        # manifests (O(V) stats+parses); with it, the miss is one dir
        # stat + one tip manifest read, the hit adds one verify read.
        S._TXN_INDEX.clear()
        S._MANIFEST_CACHE.clear()
        S._TIP_CACHE.clear()
        snap()
        assert S.find_txn(t, "txn-cold-nope") is None
        cold_proc_miss = snap()
        S._TXN_INDEX.clear()
        S._MANIFEST_CACHE.clear()
        S._TIP_CACHE.clear()
        snap()
        assert S.find_txn(t, "txn-1") == 1
        cold_proc_hit = snap()
    finally:
        os.stat, os.path.exists, os.listdir = _stat, _exists, _listdir

    print(f"table versions: {V}")
    print(f"cold miss        : {cold}")
    print(f"10 warm misses   : {warm_miss}")
    print(f"2 warm hits      : {warm_hit}")
    print(f"cold-process miss: {cold_proc_miss}")
    print(f"cold-process hit : {cold_proc_hit}")
    shutil.rmtree(base, ignore_errors=True)


if __name__ == "__main__":
    main()
