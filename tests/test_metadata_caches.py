"""Regression pins for the round-12 driver-metadata caches on the
commit/plan hot path: the ``latest_version`` tip cache (one dir stat per
call instead of one listing) and the ``find_txn`` txn index (amortized
O(new versions) instead of O(all versions) per idempotent-commit probe).

Both caches must be INVISIBLE semantically: every test here drives the
real commit protocol and asserts the uncached answers, plus the
invalidation edges (new commits from this process, out-of-band manifest
creation, vacuum, table recreation at the same path)."""

from __future__ import annotations

import json
import os
import shutil

from reactivestreams_kinesis_spark.operators import snapshots as S
from reactivestreams_kinesis_spark.operators.snapshots import (
    find_txn,
    latest_version,
    snapshot_commit,
    vacuum,
)


def _age_snapdir(table_dir: str) -> None:
    """Push the manifest dir's mtime past the racy-store window so the
    tip cache is allowed to store an entry (deterministic, no sleep)."""
    snap = os.path.join(table_dir, S._SNAPDIR)
    st = os.stat(snap)
    old = st.st_mtime_ns - 2 * S._TIP_RACY_NS
    os.utime(snap, ns=(old, old))


def test_latest_version_tip_cache_stats_not_lists(spark, tmp_path):
    t = str(tmp_path / "t")
    df = spark.range(0, 10).selectExpr("id AS k")
    snapshot_commit(df, t)
    snapshot_commit(df, t, mode="append")
    assert latest_version(t) == 1

    # freshly modified dir: the racy guard must refuse to cache
    snap = os.path.join(t, S._SNAPDIR)
    assert snap not in S._TIP_CACHE

    # aged dir: one listing, then repeat calls are stat-only
    _age_snapdir(t)
    assert latest_version(t) == 1
    assert S._TIP_CACHE[snap][1] == 1
    calls = {"listdir": 0}
    real_listdir = os.listdir

    def counting(*a, **k):
        calls["listdir"] += 1
        return real_listdir(*a, **k)

    os.listdir = counting
    try:
        for _ in range(5):
            assert latest_version(t) == 1
        assert calls["listdir"] == 0, "cached tip must not re-list"
    finally:
        os.listdir = real_listdir

    # a new commit bumps the dir mtime: seen immediately
    snapshot_commit(df, t, mode="append")
    assert latest_version(t) == 2

    # out-of-band manifest creation (tests simulate crashes this way)
    _age_snapdir(t)
    assert latest_version(t) == 2
    with open(S._manifest_path(t, 3), "x") as f:
        json.dump({"op": "append", "files": []}, f)
    assert latest_version(t) == 3

    # table recreated at the same path: no stale tip
    shutil.rmtree(t)
    assert latest_version(t) is None
    snapshot_commit(df, t)
    assert latest_version(t) == 0


def test_find_txn_index_incremental_and_exact(spark, tmp_path):
    t = str(tmp_path / "t")
    df = spark.range(0, 10).selectExpr("id AS k")
    snapshot_commit(df, t)
    for i in range(1, 6):
        snapshot_commit(df, t, mode="append", txn_id=f"txn-{i}")

    # hits and misses, cold
    assert find_txn(t, "txn-1") == 1
    assert find_txn(t, "txn-5") == 5
    assert find_txn(t, "txn-nope") is None

    # warm probes must not re-read historical manifests: count the
    # per-version stats/exists the old walk paid
    calls = {"stat": 0, "exists": 0}
    real_stat, real_exists = os.stat, os.path.exists

    def cstat(*a, **k):
        calls["stat"] += 1
        return real_stat(*a, **k)

    def cexists(*a, **k):
        calls["exists"] += 1
        return real_exists(*a, **k)

    os.stat, os.path.exists = cstat, cexists
    try:
        assert find_txn(t, "txn-also-nope") is None
        # old walk: 1 exists + 1 stat per version (6 versions) = 12+;
        # indexed: tip poll + anchor stat only
        assert calls["stat"] + calls["exists"] <= 6
    finally:
        os.stat, os.path.exists = real_stat, real_exists

    # a NEW txn commit is found without a full rescan
    snapshot_commit(df, t, mode="append", txn_id="txn-6")
    assert find_txn(t, "txn-6") == 6
    assert find_txn(t, "txn-1") == 1

    # vacuum drops old versions: their txns must no longer resolve
    # (matches the uncached walk, which skipped missing manifests)
    vacuum(t, keep_from_version=5)
    assert find_txn(t, "txn-1") is None
    assert find_txn(t, "txn-5") == 5
    assert find_txn(t, "txn-6") == 6

    # table recreated at the same path: the anchor changes, no stale hits
    shutil.rmtree(t)
    snapshot_commit(df, t)
    snapshot_commit(df, t, mode="append", txn_id="fresh-1")
    assert find_txn(t, "txn-6") is None
    assert find_txn(t, "fresh-1") == 1


def test_find_txn_hit_reverifies_through_stat_validated_parse(spark, tmp_path):
    """An out-of-band in-place rewrite that strips a manifest's txn (the
    legacy-simulation pattern) must flip the indexed hit to a miss."""
    t = str(tmp_path / "t")
    df = spark.range(0, 10).selectExpr("id AS k")
    snapshot_commit(df, t)
    snapshot_commit(df, t, mode="append", txn_id="txn-a")
    assert find_txn(t, "txn-a") == 1  # index built

    mp = S._manifest_path(t, 1)
    with open(mp) as f:
        m = json.load(f)
    m.pop("txn")
    with open(mp, "w") as f:
        json.dump(m, f)
    assert find_txn(t, "txn-a") is None
