"""Round 9: change data feed over COPY-ON-WRITE rewrite commits, and the
batch `changeFeed` read through the snapshot_table source.

Contract under test (Delta readChangeFeed parity):
- `merge_upsert` (CoW) emits update_preimage/update_postimage for
  matched keys, insert for new keys, delete for deleted keys;
- `update_where` emits pre/postimages; `delete_where` (CoW) emits
  deletes; a reorg (compaction) emits NOTHING and never kills a feed;
- an untagged full overwrite falls back to delete/insert;
- the replay invariant holds over a MIXED CoW/MoR history:
  v0 + feed ≡ tip (insert/update_postimage added,
  delete/update_preimage removed);
- the batch source option `.option("changeFeed", "true")` returns the
  stamped feed (never null-padded rows), hash-equal to
  `snapshot_change_feed`;
- the streaming `changeFeed` source crosses rewrite commits.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from reactivestreams_kinesis_spark.catalog import load_table
from reactivestreams_kinesis_spark.operators.snapshots import (
    compact_snapshot,
    delete_where,
    merge_upsert,
    read_snapshot,
    snapshot_change_feed,
    snapshot_commit,
    update_where,
)
from reactivestreams_kinesis_spark.sources.snapshot_source import (
    register_snapshot_source,
)


def _base(spark, sf_dir):
    return load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey", "c_acctbal"
    )


def _mixed_history(spark, sf_dir, t):
    """v0 base → v1 CoW update → v2 CoW merge (update+insert+delete) →
    v3 reorg compaction → v4 MoR position delete. Returns the base df."""
    base = _base(spark, sf_dir)
    snapshot_commit(base.repartitionByRange(4, "c_custkey"), t)          # v0
    update_where(
        spark,
        t,
        [("c_custkey", "<=", 100)],
        {"c_acctbal": F.col("c_acctbal") + 100.0},
    )                                                                    # v1
    upd = base.filter("c_custkey > 100 AND c_custkey <= 120").select(
        "c_custkey",
        "c_nationkey",
        # +7.5 ALWAYS changes the value (×2 would no-op on a 0.00
        # balance and the changed row would rightly cancel in the diff,
        # making the expected-count assertion SF-dependent)
        (F.col("c_acctbal") + 7.5).alias("c_acctbal"),
        F.lit(False).alias("_d"),
    )
    ins = load_table(spark, sf_dir, "nation").select(
        (F.lit(1000000) + F.col("n_nationkey")).cast("bigint").alias("c_custkey"),
        F.col("n_nationkey").alias("c_nationkey"),
        F.col("n_nationkey").cast("double").alias("c_acctbal"),
        F.lit(False).alias("_d"),
    )
    dels = base.filter("c_custkey > 120 AND c_custkey <= 130").select(
        "c_custkey", "c_nationkey", "c_acctbal", F.lit(True).alias("_d")
    )
    merge_upsert(
        spark, t, upd.unionByName(ins).unionByName(dels), "c_custkey",
        delete_col="_d",
    )                                                                    # v2
    compact_snapshot(spark, t)                                           # v3
    delete_where(spark, t, [("c_acctbal", "<", 0.0)], strategy="merge_on_read")  # v4
    return base


def _replay(spark, t, feed, from_version):
    add = feed.filter(
        "_change_type IN ('insert', 'update_postimage')"
    ).drop("_change_type", "_commit_version")
    rem = feed.filter(
        "_change_type IN ('delete', 'update_preimage')"
    ).drop("_change_type", "_commit_version")
    replayed = read_snapshot(spark, t, from_version).unionByName(add).exceptAll(rem)
    tip = read_snapshot(spark, t)
    assert replayed.exceptAll(tip).count() == 0
    assert tip.exceptAll(replayed).count() == 0


def test_cow_feed_kinds_and_replay(spark, sf_dir, tmp_path):
    """Per-commit change vocabulary over the mixed history, plus the
    replay invariant end to end."""
    t = str(tmp_path / "t")
    base = _mixed_history(spark, sf_dir, t)

    feed = snapshot_change_feed(spark, t, from_version=0)
    by = {
        (r[0], r[1]): r[2]
        for r in feed.groupBy("_commit_version", "_change_type").count().collect()
    }
    n_upd1 = base.filter("c_custkey <= 100").count()
    assert by[(1, "update_preimage")] == n_upd1
    assert by[(1, "update_postimage")] == n_upd1
    n_upd2 = base.filter("c_custkey > 100 AND c_custkey <= 120").count()
    n_del2 = base.filter("c_custkey > 120 AND c_custkey <= 130").count()
    assert by[(2, "update_preimage")] == n_upd2
    assert by[(2, "update_postimage")] == n_upd2
    assert by[(2, "insert")] == 25
    assert by[(2, "delete")] == n_del2
    # v3 is a reorg: provably row-preserving, zero feed rows
    assert not any(v == 3 for (v, _k) in by)
    # v4 MoR delete retracts exactly the tip-negative balances
    assert by[(4, "delete")] == read_snapshot(spark, t, 3).filter(
        "c_acctbal < 0"
    ).count()
    # pre/postimages carry the actual old/new values
    pre1 = feed.filter(
        "_commit_version = 1 AND _change_type = 'update_preimage'"
    )
    post1 = feed.filter(
        "_commit_version = 1 AND _change_type = 'update_postimage'"
    )
    joined = pre1.alias("a").join(
        post1.alias("b"), F.col("a.c_custkey") == F.col("b.c_custkey")
    )
    assert joined.count() == n_upd1
    assert (
        joined.filter(
            F.col("b.c_acctbal") != F.col("a.c_acctbal") + 100.0
        ).count()
        == 0
    )
    _replay(spark, t, feed, 0)


def test_cow_feed_subranges_and_untagged_overwrite(spark, sf_dir, tmp_path):
    """Sub-ranges compose across rewrite commits; an untagged overwrite
    (a plain user mode('overwrite') write) falls back to delete/insert
    and still replays exactly."""
    t = str(tmp_path / "t")
    base = _base(spark, sf_dir)
    snapshot_commit(base, t)                                             # v0
    replacement = base.filter("c_custkey <= 50").select(
        "c_custkey", "c_nationkey", (F.col("c_acctbal") + 1.0).alias("c_acctbal")
    )
    snapshot_commit(replacement, t, mode="overwrite")                    # v1
    feed = snapshot_change_feed(spark, t, from_version=0)
    by = {r[0]: r[1] for r in feed.groupBy("_change_type").count().collect()}
    assert set(by) == {"delete", "insert"}
    assert by["delete"] == base.count()
    assert by["insert"] == replacement.count()
    _replay(spark, t, feed, 0)


def test_cow_feed_delete_where_and_reorg_silence(spark, sf_dir, tmp_path):
    """delete_where CoW emits pure deletes (survivor rows rewritten
    verbatim cancel in the diff); a reorg-only range refuses with 'no
    changes' rather than emitting phantom rows."""
    t = str(tmp_path / "t")
    base = _base(spark, sf_dir)
    snapshot_commit(base.repartitionByRange(4, "c_custkey"), t)          # v0
    delete_where(spark, t, [("c_acctbal", "<", 0.0)])                    # v1 CoW
    feed = snapshot_change_feed(spark, t, from_version=0, to_version=1)
    by = {r[0]: r[1] for r in feed.groupBy("_change_type").count().collect()}
    assert by == {"delete": base.filter("c_acctbal < 0").count()}
    assert feed.filter("c_acctbal >= 0").count() == 0
    compact_snapshot(spark, t)                                           # v2 reorg
    with pytest.raises(ValueError, match="no changes"):
        snapshot_change_feed(spark, t, from_version=1, to_version=2)
    _replay(spark, t, snapshot_change_feed(spark, t, from_version=0), 0)


def test_batch_changefeed_source_matches_operator(spark, sf_dir, tmp_path):
    """.option('changeFeed', 'true') on a BATCH read returns the stamped
    feed — never the null-padded full table — and matches the operator
    row for row over the mixed history; version range options map to
    the operator's (from, to]."""
    register_snapshot_source(spark)
    t = str(tmp_path / "t")
    _mixed_history(spark, sf_dir, t)

    got = (
        spark.read.format("snapshot_table")
        .option("path", t)
        .option("changeFeed", "true")
        .option("startingVersion", 0)
        .load()
    )
    assert got.filter(F.col("_change_type").isNull()).count() == 0
    want = snapshot_change_feed(spark, t, from_version=0)
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0

    # full history (default startingVersion=-1) adds exactly v0's inserts
    full = (
        spark.read.format("snapshot_table")
        .option("path", t)
        .option("changeFeed", "true")
        .load()
    )
    v0_ins = full.filter("_commit_version = 0")
    assert v0_ins.count() == read_snapshot(spark, t, 0).count()
    assert set(
        r[0] for r in v0_ins.select("_change_type").distinct().collect()
    ) == {"insert"}

    # explicit sub-range
    sub = (
        spark.read.format("snapshot_table")
        .option("path", t)
        .option("changeFeed", "true")
        .option("startingVersion", 1)
        .option("endingVersion", 2)
        .load()
    )
    wsub = snapshot_change_feed(spark, t, from_version=1, to_version=2)
    assert sub.exceptAll(wsub).count() == 0 and wsub.exceptAll(sub).count() == 0

    with pytest.raises(Exception, match="bad changeFeed range"):
        (
            spark.read.format("snapshot_table")
            .option("path", t)
            .option("changeFeed", "true")
            .option("startingVersion", 99)
            .load()
        ).count()


def test_batch_changefeed_quiet_range_returns_empty(spark, sf_dir, tmp_path):
    """A valid range holding only a reorg (or no commits at all) yields an
    EMPTY DataFrame with the stamped schema — Delta readChangeFeed parity;
    pollers never have to catch an exception for 'nothing happened'."""
    register_snapshot_source(spark)
    t = str(tmp_path / "tq")
    part = load_table(spark, sf_dir, "part").select(
        "p_partkey", "p_name", "p_retailprice"
    )
    snapshot_commit(part.filter("p_partkey % 2 = 0"), t)  # v0
    snapshot_commit(part.filter("p_partkey % 2 = 1"), t)  # v1
    compact_snapshot(spark, t)                            # v2 reorg
    quiet = (
        spark.read.format("snapshot_table")
        .option("path", t)
        .option("changeFeed", "true")
        .option("startingVersion", 1)
        .option("endingVersion", 2)
        .load()
    )
    assert quiet.count() == 0
    assert {"_change_type", "_commit_version"} <= set(quiet.columns)


def test_rewrite_diff_size_guard(spark, sf_dir, tmp_path, monkeypatch):
    """A rewrite commit whose old+new parquet exceeds the single-task
    ceiling fails loudly with a pointer to the distributed
    snapshot_change_feed operator instead of OOMing one executor."""
    import pyarrow.parquet as pq

    from reactivestreams_kinesis_spark.sources import snapshot_source as ss

    old_p = str(tmp_path / "old.parquet")
    new_p = str(tmp_path / "new.parquet")
    tbl = load_table(spark, sf_dir, "region").toPandas()
    pq.write_table(__import__("pyarrow").Table.from_pandas(tbl), old_p)
    pq.write_table(__import__("pyarrow").Table.from_pandas(tbl), new_p)
    part = ss._CDFPartition(
        "rewrite_diff",
        None,
        None,
        1,
        old_files=[("old.parquet", old_p)],
        new_files=[new_p],
    )
    monkeypatch.setattr(ss, "_REWRITE_DIFF_MAX_BYTES", 1)
    with pytest.raises(ValueError, match="snapshot_change_feed"):
        list(ss._read_rewrite_diff(part, None))
    # restored ceiling: the same partition diffs fine (identical sides
    # cancel — zero change rows)
    monkeypatch.setattr(ss, "_REWRITE_DIFF_MAX_BYTES", 4 * 2**30)
    assert list(ss._read_rewrite_diff(part, None)) == []


def test_streaming_changefeed_crosses_rewrites(spark, sf_dir, tmp_path):
    """The streaming changeFeed source drains the SAME feed as the batch
    operator across CoW rewrites and reorgs (one partition per rewrite
    commit, diff computed task-side)."""
    register_snapshot_source(spark)
    t = str(tmp_path / "t")
    _mixed_history(spark, sf_dir, t)
    q = (
        spark.readStream.format("snapshot_table")
        .option("path", t)
        .option("changeFeed", "true")
        .option("startingVersion", 0)
        .load()
        .writeStream.format("memory")
        .queryName("cdf_cow_stream")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(300)
    got = spark.table("cdf_cow_stream")
    want = snapshot_change_feed(spark, t, from_version=0)
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0


def test_plain_stream_crosses_reorg(spark, sf_dir, tmp_path):
    """The non-CDF streaming source skips reorg commits (Delta's
    dataChange=false contract): a maintenance compaction mid-stream
    neither kills the query nor re-emits compacted rows."""
    register_snapshot_source(spark)
    t = str(tmp_path / "t")
    base = _base(spark, sf_dir)
    snapshot_commit(base.filter("c_custkey <= 500"), t)                  # v0
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")

    def drain():
        q = (
            spark.readStream.format("snapshot_table")
            .option("path", t)
            .load()
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(300)

    drain()
    snapshot_commit(base.filter("c_custkey > 500"), t)                   # v1
    compact_snapshot(spark, t)                                           # v2 reorg
    drain()
    got = spark.read.parquet(out)
    assert got.count() == base.count()
    assert got.exceptAll(base).count() == 0 and base.exceptAll(got).count() == 0


def test_snapshot_changes_crosses_reorg(spark, sf_dir, tmp_path):
    """The inserts-only incremental read also skips reorg commits: a
    compaction between two appends neither kills the diff nor
    misreports compacted files as new rows."""
    from reactivestreams_kinesis_spark.operators.snapshots import (
        snapshot_changes,
    )

    t = str(tmp_path / "t")
    base = _base(spark, sf_dir)
    snapshot_commit(base.filter("c_custkey <= 500"), t)              # v0
    compact_snapshot(spark, t)                                       # v1 reorg
    late = base.filter("c_custkey > 500")
    snapshot_commit(late, t)                                         # v2
    got = snapshot_changes(spark, t, from_version=0)
    assert got.count() == late.count()
    assert got.exceptAll(late).count() == 0
    # a reorg-only range still reports no changes, loudly
    with pytest.raises(ValueError, match="no files added"):
        snapshot_changes(spark, t, from_version=0, to_version=1)


def test_cdf_replication_end_to_end(spark, sf_dir, tmp_path):
    """The COMPLETE CDC pipe over the full change vocabulary: a mixed
    CoW/MoR/reorg history streams out as a change feed and drives a
    downstream REPLICA via the merge sink — update_postimage upserts,
    delete retracts, update_preimage is dropped (it re-states the old
    row), reorg contributes nothing — and the replica's data columns
    equal the source tip exactly. This is what the feed exists for."""
    from reactivestreams_kinesis_spark.operators.snapshots import (
        snapshot_stream_merge_sink,
    )

    register_snapshot_source(spark)
    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    _mixed_history(spark, sf_dir, src)

    feed = (
        spark.readStream.format("snapshot_table")
        .option("path", src)
        .option("changeFeed", "true")
        .load()
        .filter("_change_type <> 'update_preimage'")
    )
    q = snapshot_stream_merge_sink(
        feed,
        dst,
        str(tmp_path / "ckpt"),
        key="c_custkey",
        order_cols=["_commit_version"],
        delete_predicate=F.col("_change_type") == "delete",
    )
    assert q.awaitTermination(300)

    cols = ["c_custkey", "c_nationkey", "c_acctbal"]
    replica = read_snapshot(spark, dst).select(*cols)
    tip = read_snapshot(spark, src).select(*cols)
    assert replica.exceptAll(tip).count() == 0
    assert tip.exceptAll(replica).count() == 0


def test_batch_changefeed_refuses_vacuumed_range(spark, sf_dir, tmp_path):
    """A batch changeFeed range touching a vacuumed version raises the
    planner's clear error instead of emitting an incomplete feed."""
    from reactivestreams_kinesis_spark.operators.snapshots import vacuum

    register_snapshot_source(spark)
    t = str(tmp_path / "t")
    base = _base(spark, sf_dir)
    snapshot_commit(base.filter("c_custkey <= 100"), t)              # v0
    snapshot_commit(base.filter("c_custkey > 100 AND c_custkey <= 200"), t)
    snapshot_commit(base.filter("c_custkey > 200"), t)               # v2
    vacuum(t, keep_from_version=1)
    with pytest.raises(Exception, match="vacuumed"):
        (
            spark.read.format("snapshot_table")
            .option("path", t)
            .option("changeFeed", "true")
            .load()
        ).count()
    # a fully-retained range (v1 parent exists for v2's diff) still reads
    ok = (
        spark.read.format("snapshot_table")
        .option("path", t)
        .option("changeFeed", "true")
        .option("startingVersion", 1)
        .load()
    )
    assert ok.count() == base.filter("c_custkey > 200").count()
    # the batch operator refuses the vacuumed range just as clearly
    from reactivestreams_kinesis_spark.operators.snapshots import (
        snapshot_change_feed,
    )

    with pytest.raises(ValueError, match="vacuumed"):
        snapshot_change_feed(spark, t, from_version=0)


def test_streaming_changefeed_after_drop_uses_narrowed_schema(
    spark, sf_dir, tmp_path
):
    """A changeFeed stream STARTED after a DROP COLUMN carries the
    narrowed schema: pre-drop inserts project the column away (their
    values are still visible to a time-travel read, just not through
    the post-drop feed schema)."""
    from reactivestreams_kinesis_spark.operators.snapshots import drop_column

    register_snapshot_source(spark)
    t = str(tmp_path / "t")
    base = _base(spark, sf_dir)
    snapshot_commit(base, t)                                         # v0
    drop_column(t, "c_acctbal")                                      # v1
    late = base.limit(5).select(
        (F.col("c_custkey") + 900000).alias("c_custkey"), "c_nationkey"
    )
    snapshot_commit(late, t)                                         # v2
    q = (
        spark.readStream.format("snapshot_table")
        .option("path", t)
        .option("changeFeed", "true")
        .load()
        .writeStream.format("memory")
        .queryName("cdf_after_drop")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(300)
    got = spark.table("cdf_after_drop")
    assert got.columns == [
        "c_custkey", "c_nationkey", "_change_type", "_commit_version",
    ]
    assert got.count() == base.count() + 5
    assert set(r[0] for r in got.select("_change_type").distinct().collect()) == {
        "insert"
    }


def test_feed_crosses_rename_then_physical_reset(spark, tmp_path):
    """REGRESSION (found by the replay property test): a RENAME followed
    by an overwrite-op commit (compaction here) RESETS the physical
    namespace, and the old single-end-inverse remap surfaced pre-rename
    inserts NULL-padded under the new name — a silent wrong answer. The
    step-composed maps (`_logical_to_end_maps`) resolve the chain:
    physical matching carries the rename, name matching crosses the
    reset. Pinned on BOTH the operator and the source (batch changeFeed),
    with post-reset MoR + CoW commits in range to cover every partition
    kind's per-version read names."""
    import uuid as _uuid

    from pyspark.sql import functions as F

    from reactivestreams_kinesis_spark.operators.snapshots import (
        compact_snapshot,
        delete_where,
        rename_column,
        snapshot_change_feed,
        snapshot_commit,
        update_where,
    )
    from reactivestreams_kinesis_spark.sources.snapshot_source import (
        register_snapshot_source,
    )

    register_snapshot_source(spark)
    t = str(tmp_path / f"cfreset_{_uuid.uuid4().hex[:6]}")
    mk = lambda rows: spark.createDataFrame(rows, "uid bigint, k int, v int")
    snapshot_commit(mk([(0, 0, 0), (5, 1, 7)]), t)                    # v0
    snapshot_commit(mk([(1, 0, 0)]), t)                               # v1
    rename_column(t, "k", "k2")                                       # v2
    compact_snapshot(spark, t, target_file_bytes=1 << 40)             # v3 reset
    delete_where(spark, t, [("v", "=", 7)], strategy="merge_on_read") # v4
    update_where(spark, t, [("uid", "=", 0)], {"v": F.lit(9)})        # v5

    expect = {
        (1, 0, 0, "insert", 1),
        (5, 1, 7, "delete", 4),
        (0, 0, 0, "update_preimage", 5),
        (0, 0, 9, "update_postimage", 5),
    }
    op = {tuple(r) for r in snapshot_change_feed(spark, t, from_version=0).collect()}
    assert op == expect
    assert snapshot_change_feed(spark, t, from_version=0).columns[:3] == [
        "uid", "k2", "v",
    ]
    src = {
        tuple(r)
        for r in spark.read.format("snapshot_table")
        .option("path", t)
        .option("changeFeed", "true")
        .option("startingVersion", "0")
        .load()
        .collect()
    }
    assert src == expect


def test_feed_batches_consecutive_appends_into_one_scan(spark, tmp_path):
    """Round-12 optimization pin: a range of K compatible append commits
    plans ONE parquet scan (the batched insert part), not K — and the
    rows, the per-version `_commit_version` stamps, and the feed schema
    (including the stamp columns' non-nullability) are exactly the
    per-version path's. A rename inside the range breaks the run
    (evolution semantics stay per-version; crossing is covered by
    `test_feed_crosses_rename_then_physical_reset`), and appends on both
    sides of a delete commit batch per side without disturbing part
    order."""
    import uuid as _uuid

    from reactivestreams_kinesis_spark.operators.snapshots import (
        delete_where,
        rename_column,
    )
    from reactivestreams_kinesis_spark.plans.inspect import explain_string

    mk = lambda lo, hi: spark.range(lo, hi).selectExpr(
        "id AS uid", "CAST(id % 3 AS int) AS k", "CAST(id AS int) AS v"
    )
    t = str(tmp_path / f"cfbatch_{_uuid.uuid4().hex[:6]}")
    for i in range(6):                                      # v0..v5 appends
        snapshot_commit(mk(i * 10, i * 10 + 10), t, mode="append")
    feed = snapshot_change_feed(spark, t, from_version=0)
    plan = explain_string(feed, "simple")
    assert plan.count("Scan parquet") == 1, plan
    got = {tuple(r) for r in feed.collect()}
    # v0's rows predate the range start; appends v1..v5 are the feed
    assert got == {
        (uid, uid % 3, uid, "insert", uid // 10) for uid in range(10, 60)
    }
    # stamp columns stay non-nullable, as the per-version lit() stamps were
    fields = {f.name: f for f in feed.schema.fields}
    assert not fields["_change_type"].nullable
    assert not fields["_commit_version"].nullable

    # a delete splits the run; appends after it batch among themselves
    delete_where(spark, t, [("uid", "=", 0)], strategy="merge_on_read")  # v6
    snapshot_commit(mk(60, 70), t, mode="append")                        # v7
    snapshot_commit(mk(70, 80), t, mode="append")                        # v8
    feed2 = snapshot_change_feed(spark, t, from_version=0)
    by_kind = {}
    for r in feed2.collect():
        by_kind.setdefault(r["_change_type"], set()).add(tuple(r))
    assert (0, 0, 0, "delete", 6) in by_kind["delete"]
    assert {r[-1] for r in by_kind["insert"]} == set(range(1, 6)) | {7, 8}

    # a rename mid-run breaks compatibility: stamps stay exact across it
    rename_column(t, "k", "k2")                                          # v9
    snapshot_commit(
        spark.range(80, 90).selectExpr(
            "id AS uid", "CAST(id % 3 AS int) AS k2", "CAST(id AS int) AS v"
        ),
        t,
        mode="append",
    )                                                                    # v10
    feed3 = snapshot_change_feed(spark, t, from_version=6)
    got3 = {tuple(r) for r in feed3.collect()}
    # appends land at v7, v8 (rename is v9), v10
    assert got3 == {
        (uid, uid % 3, uid, "insert", uid // 10 + (1 if uid >= 80 else 0) + 1)
        for uid in range(60, 90)
    }
