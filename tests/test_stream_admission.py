"""Demand-bounded streaming reads for the `snapshot_table` source
(round 10): `.option("maxVersionsPerTrigger", N)` caps how many table
versions a micro-batch may cover — the reference's own core semantic
(`ShardSubscription.java:141` fetches at most demand+100 records)
applied to the engine's own connector, and the Delta
`maxFilesPerTrigger`/Kafka `maxOffsetsPerTrigger` admission-control
shape.

Contract:
- under a continuous (processing-time) trigger, EVERY batch — the
  cold-start backlog included — advances the version cursor by at most
  N (round 11; previously the first batch of a run planned the whole
  backlog). Safe because of two measured engine behaviors: on a FRESH
  start no checkpoint exists, so the starting version (the very offset
  initialOffset returns) anchors the cap; on a RESTART the engine
  reconstructs the last checkpointed batch via
  partitions(committed, committed) BEFORE its first latestOffset call,
  so the cursor is anchored at the checkpoint before admission is
  consulted. An answer below a checkpointed offset would be poison —
  Spark plans the backwards batch and commits it, silently duplicating
  versions (probe-measured) — which the anchor ordering rules out;
- bounded batches' union equals the unbounded drain exactly (no loss,
  no dup), including across a checkpoint stop/resume;
- Trigger.AvailableNow falls back to single-batch execution for Python
  sources (Spark logs it), so the cap matters under continuous
  triggers;
- the cap composes with the changeFeed stream;
- maxVersionsPerTrigger < 1 refuses.
"""

from __future__ import annotations

import json
import time

import pytest
from pyspark.sql import functions as F

from reactivestreams_kinesis_spark.catalog import load_table
from reactivestreams_kinesis_spark.operators.snapshots import (
    snapshot_commit,
)
from reactivestreams_kinesis_spark.sources.snapshot_source import (
    register_snapshot_source,
)


def _offset_version(off):
    if off is None:
        return -1
    if isinstance(off, str):
        # the engine stores the reader's offset dict via its Python repr
        # (single quotes), not JSON — literal_eval handles both
        import ast

        off = ast.literal_eval(off)
    return off["version"]


def _batch_spans(progresses):
    """(start, end) version pairs of every data-carrying micro-batch."""
    spans = []
    for p in progresses:
        if p["numInputRows"] == 0:
            continue
        src = p["sources"][0]
        spans.append(
            (_offset_version(src.get("startOffset")),
             _offset_version(src.get("endOffset")))
        )
    return spans


def _run_until_version(q, target, timeout=240):
    """Let a continuous-trigger query run until its committed end offset
    reaches ``target``, then stop it and return the progress dicts."""
    deadline = time.time() + timeout
    while time.time() < deadline:
        p = q.lastProgress
        if p and p["sources"][0].get("endOffset"):
            if _offset_version(p["sources"][0]["endOffset"]) >= target:
                break
        time.sleep(0.5)
    progresses = [json.loads(x.json) for x in q.recentProgress]
    q.stop()
    return progresses


def test_max_versions_per_trigger_bounds_standing_stream(spark, sf_dir, tmp_path):
    """v0..v1 exist at start; six more versions land while the stream
    runs — EVERY batch (the cold-start one included) spans at most 2
    versions, and the drained rows equal the table exactly."""
    register_snapshot_source(spark)
    t = str(tmp_path / "tbl")
    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id")
    slices = [ev.filter(F.col("event_id") % 8 == i) for i in range(8)]
    snapshot_commit(slices[0].coalesce(1), t)  # v0
    snapshot_commit(slices[1].coalesce(1), t)  # v1
    out = str(tmp_path / "out")

    q = (
        spark.readStream.format("snapshot_table")
        .option("path", t)
        .option("maxVersionsPerTrigger", 2)
        .load()
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(processingTime="3 seconds")
        .start()
    )
    # let the first (residual) batch take the v0..v1 backlog, then land
    # six more versions while the stream is standing
    _run_until_version(q, 1, timeout=120)
    q2 = (
        spark.readStream.format("snapshot_table")
        .option("path", t)
        .option("maxVersionsPerTrigger", 2)
        .load()
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(processingTime="3 seconds")
        .start()
    )
    for s in slices[2:]:
        snapshot_commit(s.coalesce(1), t)  # v2..v7 while q2 runs
    progresses = _run_until_version(q2, 7)
    spans = _batch_spans(progresses)
    # every batch caps — restart included. (How many batches occur
    # depends on append/trigger timing — the deterministic progression
    # is pinned by the unit test below.)
    assert all(e - s <= 2 for s, e in spans), spans
    drained = spark.read.parquet(out)
    assert drained.count() == ev.count()
    assert drained.subtract(ev).count() == 0 and ev.subtract(drained).count() == 0


def test_max_versions_cursor_progression_unit(spark, sf_dir, tmp_path):
    """Deterministic pin of the admission-control cursor, simulating the
    engine's exact call order (latestOffset is PREFETCHED before
    initialOffset on a fresh start; a restart reconstructs the last
    checkpointed batch via partitions(committed, committed) BEFORE its
    first latestOffset — both measured on Spark 4.1):

    fresh run:   every answer is min(tip, anchor+N) from the starting
                 version on — the cold-start backlog drains bounded
                 from batch one; a 10-version backlog added mid-run
                 drains in ceil(10/N) bounded batches;
    restart run: the reconstruction call anchors the cursor at the
                 checkpoint, so the first post-restart answer is
                 already capped (and can never fall below the
                 checkpoint — the non-monotone poison case)."""
    from reactivestreams_kinesis_spark.sources.snapshot_source import (
        _SnapshotStreamReader,
    )

    t = str(tmp_path / "unit")
    ev = load_table(spark, sf_dir, "events").select("event_id").limit(40)
    snapshot_commit(ev.coalesce(1), t)  # v0
    r = _SnapshotStreamReader(t, -1, None, max_versions=2)
    # engine order: latestOffset BEFORE initialOffset — the fresh-start
    # anchor is the starting version, so the answer is already capped
    assert r.latestOffset() == {"version": 0}  # min(tip=0, -1+2)
    assert r.initialOffset() == {"version": -1}
    r.partitions({"version": -1}, {"version": 0})
    r.commit({"version": 0})
    for _ in range(10):
        snapshot_commit(ev.limit(1).coalesce(1), t)  # v1..v10 backlog
    seen = []
    cur = 0
    while cur < 10:
        nxt = r.latestOffset()["version"]
        assert nxt - cur <= 2, "every batch is capped"
        if nxt > cur:
            r.partitions({"version": cur}, {"version": nxt})
            r.commit({"version": nxt})
            seen.append((cur, nxt))
            cur = nxt
    assert seen == [(0, 2), (2, 4), (4, 6), (6, 8), (8, 10)]

    # COLD start over the whole 10-version backlog: a brand-new reader
    # (no checkpoint) caps from the starting version — the first batch
    # no longer plans the backlog
    rc = _SnapshotStreamReader(t, -1, None, max_versions=2)
    assert rc.latestOffset() == {"version": 1}, "cold-start batch capped"
    rc.partitions({"version": -1}, {"version": 1})
    rc.commit({"version": 1})
    assert rc.latestOffset() == {"version": 3}

    # restart: fresh reader, checkpoint at v4 — the engine reconstructs
    # the committed batch FIRST (measured), anchoring the cursor, so
    # the first latestOffset is capped from the checkpoint and can
    # never fall below it
    r2 = _SnapshotStreamReader(t, -1, None, max_versions=2)
    r2.partitions({"version": 4}, {"version": 4})  # engine reconstruction
    assert r2.latestOffset() == {"version": 6}, "capped from the checkpoint"
    r2.partitions({"version": 4}, {"version": 6})
    r2.commit({"version": 6})
    assert r2.latestOffset() == {"version": 8}

    # guard
    with pytest.raises(ValueError, match="maxVersionsPerTrigger"):
        _SnapshotStreamReader(t, -1, None, max_versions=0)

    # backwards-batch tripwire (round 12): a planned batch whose end
    # precedes its start is the offset-regression poison — loud stop,
    # never silent re-emission. The equal-offsets reconstruction call
    # stays a legal no-op (asserted above via r2).
    r3 = _SnapshotStreamReader(t, -1, None, max_versions=2)
    with pytest.raises(RuntimeError, match="backwards"):
        r3.partitions({"version": 6}, {"version": 4})


def test_max_bytes_cursor_progression_unit(spark, sf_dir, tmp_path):
    """maxBytesPerTrigger (the Delta-shaped soft byte cap): versions
    admit until the next would cross the cap; an oversized single
    commit still admits (no stall); composes with maxVersionsPerTrigger
    (the tighter cap wins); end-to-end rows equal the unbounded drain."""
    import os as _os

    from reactivestreams_kinesis_spark.operators.snapshots import (
        _read_manifest,
    )
    from reactivestreams_kinesis_spark.sources.snapshot_source import (
        _SnapshotStreamReader,
    )

    t = str(tmp_path / "unitb")
    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id")
    snapshot_commit(ev.filter("event_id % 7 = 0").coalesce(1), t)  # v0
    # backlog lands AFTER the anchor: v1..v6 single-file appends
    for i in range(1, 7):
        snapshot_commit(ev.filter(F.col("event_id") % 7 == i).coalesce(1), t)
    sizes = {}
    prev: set = set(_read_manifest(t, 0)["files"])
    for v in range(1, 7):
        m = _read_manifest(t, v)
        new = [f for f in m["files"] if f not in prev]
        sizes[v] = sum(_os.path.getsize(_os.path.join(t, f)) for f in new)
        prev = set(m["files"])

    cap = sizes[1] + sizes[2] + 1  # at least v1+v2 fit in one trigger
    # simulate the engine against a reader whose anchored batch was v0
    # (a restart whose checkpoint sat at v0 before the backlog landed)
    r = _SnapshotStreamReader(t, -1, None, max_bytes=cap)
    r.partitions({"version": -1}, {"version": 0})  # anchor = v0 batch
    r.commit({"version": 0})
    # expected greedy progression from the actual sizes
    cur, expect = 0, []
    while cur < 6:
        end, tot = cur, 0
        for v in range(cur + 1, 7):
            if end > cur and tot + sizes[v] > cap:
                break
            tot += sizes[v]
            end = v
        expect.append(end)
        cur = end
    got = []
    cur = 0
    while cur < 6:
        nxt = r.latestOffset()["version"]
        assert nxt > cur
        r.partitions({"version": cur}, {"version": nxt})
        r.commit({"version": nxt})
        got.append(nxt)
        cur = nxt
    assert got == expect, (got, expect, sizes)
    assert len(got) >= 3, "the cap split the backlog into several batches"

    # an oversized single commit still admits (soft cap, no stall)
    r2 = _SnapshotStreamReader(t, -1, None, max_bytes=1)
    r2.partitions({"version": -1}, {"version": 0})
    r2.commit({"version": 0})
    assert r2.latestOffset() == {"version": 1}

    # composes with the version cap: the tighter one wins
    r3 = _SnapshotStreamReader(t, -1, None, max_versions=1, max_bytes=cap)
    r3.partitions({"version": -1}, {"version": 0})
    assert r3.latestOffset() == {"version": 1}

    with pytest.raises(ValueError, match="maxBytesPerTrigger"):
        _SnapshotStreamReader(t, -1, None, max_bytes=0)


def test_max_bytes_end_to_end_drain(spark, sf_dir, tmp_path):
    """Byte-capped standing stream drains to exactly the table content."""
    register_snapshot_source(spark)
    t = str(tmp_path / "tblb")
    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id")
    snapshot_commit(ev.filter("event_id % 4 = 0").coalesce(1), t)
    out = str(tmp_path / "outb")
    q = (
        spark.readStream.format("snapshot_table")
        .option("path", t)
        .option("maxBytesPerTrigger", 1)  # one version per trigger
        .load()
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ckptb"))
        .trigger(processingTime="1 seconds")
        .start()
    )
    for i in range(1, 4):
        snapshot_commit(ev.filter(F.col("event_id") % 4 == i).coalesce(1), t)
    spans = _batch_spans(_run_until_version(q, 3))
    assert all(e - s <= 1 for s, e in spans[1:]), spans
    final = spark.read.parquet(out)
    assert final.count() == ev.count()
    assert final.subtract(ev).count() == 0 and ev.subtract(final).count() == 0


def test_max_versions_cold_start_backlog_drains_capped(spark, sf_dir, tmp_path):
    """The round-9 verdict residual, closed: a COLD start (fresh
    checkpoint) over a 10-version backlog drains in >= 10 capped
    batches under maxVersionsPerTrigger=1 — bounded from batch one —
    across a stop/resume, and the result equals the table exactly."""
    register_snapshot_source(spark)
    t = str(tmp_path / "tblc")
    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id")
    for i in range(10):
        snapshot_commit(ev.filter(F.col("event_id") % 10 == i).coalesce(1), t)
    out = str(tmp_path / "outc")
    ckpt = str(tmp_path / "ckptc")

    def start():
        return (
            spark.readStream.format("snapshot_table")
            .option("path", t)
            .option("maxVersionsPerTrigger", 1)
            .load()
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(processingTime="1 seconds")
            .start()
        )

    q = start()
    spans = _batch_spans(_run_until_version(q, 4, timeout=180))
    assert spans and all(e - s <= 1 for s, e in spans), spans
    q2 = start()
    spans2 = _batch_spans(_run_until_version(q2, 9, timeout=180))
    assert spans2 and all(e - s <= 1 for s, e in spans2), spans2
    # recentProgress only retains a window, so pin the batch count from
    # the checkpoint's offset log: one commit per version = 10 batches
    import os as _os

    n_batches = len(
        [f for f in _os.listdir(_os.path.join(ckpt, "commits")) if f.isdigit()]
    )
    assert n_batches >= 10, f"backlog must drain one version per batch: {n_batches}"
    final = spark.read.parquet(out)
    assert final.count() == ev.count()
    assert final.subtract(ev).count() == 0 and ev.subtract(final).count() == 0


def test_max_versions_cap_resumes_across_restart(spark, sf_dir, tmp_path):
    """Stop mid-history, append more versions, restart: the union of all
    drained rows equals the table exactly (no loss, no dup), every
    run's batches capped."""
    register_snapshot_source(spark)
    t = str(tmp_path / "tbl2")
    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id")
    slices = [ev.filter(F.col("event_id") % 6 == i) for i in range(6)]
    for s in slices[:3]:
        snapshot_commit(s.coalesce(1), t)  # v0..v2
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    def start():
        return (
            spark.readStream.format("snapshot_table")
            .option("path", t)
            .option("maxVersionsPerTrigger", 1)
            .load()
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(processingTime="1 seconds")
            .start()
        )

    q = start()
    _run_until_version(q, 2, timeout=120)
    for s in slices[3:]:
        snapshot_commit(s.coalesce(1), t)  # v3..v5 while stopped
    q2 = start()
    _run_until_version(q2, 5)
    final = spark.read.parquet(out)
    assert final.count() == ev.count()
    assert final.subtract(ev).count() == 0 and ev.subtract(final).count() == 0


def test_max_versions_cap_on_change_feed_stream(spark, sf_dir, tmp_path):
    """The cap composes with the streaming change feed: post-residual
    batches are bounded, feed content identical to the unbounded
    operator."""
    from reactivestreams_kinesis_spark.operators.snapshots import (
        delete_where,
        snapshot_change_feed,
    )

    register_snapshot_source(spark)
    t = str(tmp_path / "tbl3")
    base = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_acctbal"
    )
    snapshot_commit(base.filter("c_custkey % 2 = 0"), t)   # v0

    def start():
        return (
            spark.readStream.format("snapshot_table")
            .option("path", t)
            .option("changeFeed", "true")
            .option("startingVersion", 0)
            .option("maxVersionsPerTrigger", 1)
            .load()
            .writeStream.format("memory")
            .queryName("capped_cdf")
            .option("checkpointLocation", str(tmp_path / "ckpt3"))
            .trigger(processingTime="2 seconds")
            .start()
        )

    q = start()
    snapshot_commit(base.filter("c_custkey % 2 = 1"), t)   # v1 while running
    delete_where(spark, t, [("c_acctbal", "<", 0.0)], strategy="merge_on_read")  # v2
    snapshot_commit(base.limit(7).withColumn("c_acctbal", F.lit(1.0)), t)  # v3
    spans = _batch_spans(_run_until_version(q, 3))
    assert all(e - s <= 1 for s, e in spans[1:]), spans
    got = spark.table("capped_cdf")
    want = snapshot_change_feed(spark, t, from_version=0)
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0


def test_max_versions_per_trigger_guard(spark, sf_dir, tmp_path):
    register_snapshot_source(spark)
    t = str(tmp_path / "tbl4")
    snapshot_commit(
        load_table(spark, sf_dir, "region").select("r_regionkey", "r_name"), t
    )
    with pytest.raises(Exception, match="maxVersionsPerTrigger"):
        (
            spark.readStream.format("snapshot_table")
            .option("path", t)
            .option("maxVersionsPerTrigger", 0)
            .load()
            .writeStream.format("noop")
            .option("checkpointLocation", str(tmp_path / "ckpt4"))
            .trigger(availableNow=True)
            .start()
            .awaitTermination(120)
        )
