"""TRUE-CONCURRENCY races on the optimistic commit protocol (round 10):
N real threads hammer one table through the public DML surface. The
exclusive-create commit point plus `require_parent` conflict guard must
yield a linearizable history — no lost update, a contiguous version
chain, every surviving row exactly once — under actual interleaving,
not the single-thread interleavings the earlier tests replay.
"""

from __future__ import annotations

import os
import threading

from pyspark.sql import functions as F

from reactivestreams_kinesis_spark.operators.snapshots import (
    SnapshotConflictError,
    _manifest_path,
    _read_manifest,
    latest_version,
    merge_upsert,
    read_snapshot,
    snapshot_commit,
)


def test_concurrent_appends_compose(spark, sf_dir, tmp_path):
    """6 threads x 4 appends each: appends never conflict (losers of the
    exclusive create retry against the new tip and COMPOSE) — final
    content is the exact union, version chain contiguous with correct
    parents, every manifest's file set a superset of its parent's."""
    t = str(tmp_path / "t")
    snapshot_commit(
        spark.createDataFrame([(-1, -1)], "writer int, seq int"), t
    )  # v0
    n_threads, n_commits = 6, 4
    errors: list = []

    def worker(w):
        try:
            for s in range(n_commits):
                snapshot_commit(
                    spark.createDataFrame([(w, s)], "writer int, seq int"), t
                )
        except Exception as e:  # pragma: no cover - surfaced by assert
            errors.append(e)

    threads = [threading.Thread(target=worker, args=(w,)) for w in range(n_threads)]
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    assert not errors, errors

    tip = latest_version(t)
    assert tip == n_threads * n_commits  # every commit got its own version
    rows = read_snapshot(spark, t).collect()
    got = sorted((r["writer"], r["seq"]) for r in rows)
    want = sorted(
        [(-1, -1)] + [(w, s) for w in range(n_threads) for s in range(n_commits)]
    )
    assert got == want, "no lost, duplicated, or phantom append"
    prev_files: set = set()
    for v in range(tip + 1):
        assert os.path.exists(_manifest_path(t, v))
        m = _read_manifest(t, v)
        assert m["parent"] == (None if v == 0 else v - 1)
        assert prev_files.issubset(set(m["files"])), "appends only add files"
        prev_files = set(m["files"])


def test_concurrent_merges_no_lost_update(spark, sf_dir, tmp_path):
    """3 threads each increment THEIR OWN key 3 times via merge_upsert,
    retrying on SnapshotConflictError — the guard must turn every
    overlap into a retry, never a silent lost update: each key ends at
    exactly its increment count, and the untouched base rows survive."""
    t = str(tmp_path / "t")
    base = spark.createDataFrame(
        [(k, 0) for k in range(10)], "k int, v int"
    )
    snapshot_commit(base.coalesce(2), t)  # v0
    n_threads, n_merges = 3, 3
    errors: list = []

    def worker(w):
        try:
            for _ in range(n_merges):
                for attempt in range(60):
                    cur = (
                        read_snapshot(spark, t)
                        .filter(F.col("k") == w)
                        .collect()[0]["v"]
                    )
                    upd = spark.createDataFrame([(w, cur + 1)], "k int, v int")
                    try:
                        merge_upsert(spark, t, upd, "k")
                        break
                    except SnapshotConflictError:
                        continue  # re-read against the new tip and retry
                else:  # pragma: no cover
                    raise AssertionError(f"writer {w} starved after 60 tries")
        except Exception as e:  # pragma: no cover
            errors.append(e)

    threads = [threading.Thread(target=worker, args=(w,)) for w in range(n_threads)]
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    assert not errors, errors

    final = {r["k"]: r["v"] for r in read_snapshot(spark, t).collect()}
    # every thread's increments all landed (no lost update), untouched
    # keys still 0, nothing duplicated
    assert len(final) == 10
    for k in range(10):
        assert final[k] == (n_merges if k < n_threads else 0), (k, final)
    # linearizable chain: one manifest per committed version, contiguous
    tip = latest_version(t)
    for v in range(tip + 1):
        m = _read_manifest(t, v)
        assert m["parent"] == (None if v == 0 else v - 1)
