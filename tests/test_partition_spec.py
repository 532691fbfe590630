"""PARTITION SPEC in the snapshot manifest (round 10) — Iceberg-style
hidden partitioning: `snapshot_commit(..., partition_by=[...])` declares
identity / day / bucket(n) transforms; writers CLUSTER each commit on
the transform tuple and record every file's distinct partition tuples
in its stats blob (`__pvals`); `prune_files` (and therefore
scan_snapshot, DML targeting, and the custom source's pushdown path)
prunes on tuples BEFORE min/max stats.

Deliberately the Iceberg model, not the hive one: the manifest is the
index, so files keep ALL columns and a flat layout — no directory-name
coupling, no partition columns stripped from parquet — and a file the
writer couldn't keep tuple-tight records more tuples (pruning stays
exact, never a filter).

Contract:
- identity spec on a clustered table: an equality predicate keeps
  exactly the matching-tuple files; content equals the unpruned read;
- bucket(n): a point lookup keeps only the matching bucket's files —
  pruning min/max can NEVER provide on a hash-scattered key;
- day(ts): a date-range predicate prunes whole days conservatively;
- appends inherit the spec and cannot change it (overwrite evolves it);
- the spec follows rewrites (CoW DML keeps the layout + tuples carry
  for retained files) and survives rename (spec keys physical names);
- dropping a partition column refuses;
- the custom source's opt-in pushdown plans fewer partitions on a
  partitioned table (file-level skipping before any task launches).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from reactivestreams_kinesis_spark.catalog import load_table
from reactivestreams_kinesis_spark.operators.snapshots import (
    _read_manifest,
    delete_where,
    drop_column,
    latest_version,
    prune_files,
    read_snapshot,
    rename_column,
    scan_snapshot,
    snapshot_commit,
    update_where,
)
from reactivestreams_kinesis_spark.sources.snapshot_source import (
    register_snapshot_source,
)


def _cust(spark, sf_dir):
    return load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey", "c_acctbal"
    )


def test_identity_partition_prunes_exactly(spark, sf_dir, tmp_path):
    t = str(tmp_path / "t")
    base = _cust(spark, sf_dir)
    snapshot_commit(base, t, partition_by=["c_nationkey"])           # v0
    m = _read_manifest(t, 0)
    assert m["partition_spec"] == [{"col": "c_nationkey", "kind": "identity"}]
    stats = m["stats"]
    # every file records its tuple set; clustering keeps them tight
    assert all("__pvals" in stats[f] for f in m["files"])
    n_nations = base.select("c_nationkey").distinct().count()

    # equality predicate keeps only files recording that tuple
    kept = prune_files(m, [("c_nationkey", "=", 3)])
    assert 0 < len(kept) < len(m["files"])
    for f in kept:
        assert any(
            tup["c_nationkey"] == 3 for tup in stats[f]["__pvals"]
        )
    got = scan_snapshot(spark, t, [("c_nationkey", "=", 3)])
    want = base.filter("c_nationkey = 3")
    assert got.subtract(want).count() == 0 and want.subtract(got).count() == 0

    # appends inherit the spec (and cluster): new files carry tuples
    snapshot_commit(base.limit(50), t)                               # v1
    m1 = _read_manifest(t, 1)
    assert m1["partition_spec"] == m["partition_spec"]
    new = [f for f in m1["files"] if f not in set(m["files"])]
    assert new and all("__pvals" in m1["stats"][f] for f in new)
    # an append cannot change the spec
    with pytest.raises(ValueError, match="cannot change the partition spec"):
        snapshot_commit(base.limit(1), t, partition_by=["c_custkey"])
    # overwrite evolves it
    snapshot_commit(
        base, t, mode="overwrite", partition_by=[("c_custkey", "bucket", 8)]
    )                                                                # v2
    assert _read_manifest(t, 2)["partition_spec"] == [
        {"col": "c_custkey", "kind": "bucket", "n": 8}
    ]
    assert n_nations > 1  # sanity: the prune above was non-trivial


def test_bucket_partition_point_lookup(spark, sf_dir, tmp_path):
    """Hash-scattered key: every file's [min, max] spans the domain, so
    stats can't prune a point lookup — the bucket tuples can."""
    t = str(tmp_path / "t")
    base = _cust(spark, sf_dir)
    snapshot_commit(base, t, partition_by=[("c_custkey", "bucket", 8)])
    m = _read_manifest(t, 0)
    key = base.limit(1).collect()[0]["c_custkey"]
    kept = prune_files(m, [("c_custkey", "=", int(key))])
    assert 0 < len(kept) < len(m["files"]), (len(kept), len(m["files"]))
    got = scan_snapshot(spark, t, [("c_custkey", "=", int(key))])
    assert got.count() == 1
    # IN-list across several keys still prunes to the union of buckets
    keys = [r["c_custkey"] for r in base.limit(3).collect()]
    kept_in = prune_files(m, [("c_custkey", "in", [int(k) for k in keys])])
    assert len(kept_in) <= len(m["files"])
    got_in = scan_snapshot(
        spark, t, [("c_custkey", "in", [int(k) for k in keys])]
    )
    assert got_in.count() == 3


def test_day_partition_prunes_time_ranges(spark, sf_dir, tmp_path):
    t = str(tmp_path / "t")
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", F.col("ts").alias("ts")
    )
    snapshot_commit(ev, t, partition_by=[("ts", "day")])
    m = _read_manifest(t, 0)
    days = sorted(
        {tup["day(ts)"] for f in m["files"] for tup in m["stats"][f]["__pvals"]}
    )
    assert len(days) >= 3, "fixture spans several days"
    cut = days[len(days) // 2]
    import datetime as dt

    cut_ts = dt.datetime.fromisoformat(cut + "T00:00:00")
    kept = prune_files(m, [("ts", ">=", cut_ts)])
    assert 0 < len(kept) < len(m["files"])
    got = scan_snapshot(spark, t, [("ts", ">=", cut_ts)])
    want = ev.filter(F.col("ts") >= F.lit(cut_ts))
    assert got.count() == want.count()
    assert got.subtract(want).count() == 0

    # the sink's session-less DuckDB tuple derivation must agree with
    # the Spark expression BIT-EXACTLY for the day transform (a
    # disagreement would mis-prune = wrong rows, not just a perf miss)
    from reactivestreams_kinesis_spark.sources.snapshot_source import (
        _staged_pvals,
    )

    duck = _staged_pvals(t, m["files"], m["partition_spec"])
    for f in m["files"]:
        want_tuples = sorted(
            (tup["day(ts)"] for tup in m["stats"][f]["__pvals"])
        )
        got_tuples = sorted(tup["day(ts)"] for tup in duck[f])
        assert got_tuples == want_tuples, f


def test_spec_follows_dml_and_rename(spark, sf_dir, tmp_path):
    t = str(tmp_path / "t")
    base = _cust(spark, sf_dir)
    snapshot_commit(base, t, partition_by=["c_nationkey"])           # v0
    # CoW update rewrites some files: spec carries, new files get tuples
    update_where(
        spark, t, [("c_nationkey", "=", 3)], {"c_acctbal": F.lit(1.0)}
    )                                                                # v1
    m1 = _read_manifest(t, 1)
    assert m1["partition_spec"] == [{"col": "c_nationkey", "kind": "identity"}]
    assert all("__pvals" in m1["stats"][f] for f in m1["files"])
    kept = prune_files(m1, [("c_nationkey", "=", 3)])
    assert 0 < len(kept) < len(m1["files"])
    got = scan_snapshot(spark, t, [("c_nationkey", "=", 3)])
    assert got.count() == base.filter("c_nationkey = 3").count()
    assert got.filter("c_acctbal != 1.0").count() == 0

    # MoR delete then prune: pruning stays sound (DVs only shrink files)
    delete_where(
        spark, t, [("c_nationkey", "=", 5)], strategy="merge_on_read"
    )                                                                # v2
    assert scan_snapshot(spark, t, [("c_nationkey", "=", 5)]).count() == 0

    # rename the partition column: spec keys the PHYSICAL name, so
    # pruning keeps working under the new logical name
    rename_column(t, "c_nationkey", "nation")                        # v3
    m3 = _read_manifest(t, latest_version(t))
    assert m3["partition_spec"] == [{"col": "c_nationkey", "kind": "identity"}]
    got2 = scan_snapshot(spark, t, [("nation", "=", 3)])
    assert got2.count() == base.filter("c_nationkey = 3").count()
    kept2 = prune_files(m3, [("nation", "=", 3)])
    assert 0 < len(kept2) < len(m3["files"])

    # dropping the (renamed) partition column refuses
    with pytest.raises(ValueError, match="partition column"):
        drop_column(t, "nation")

    # a full-rewrite compaction resets the physical mapping to identity
    # and must REMAP the carried spec with it, so partition pruning
    # keeps working on the compacted files under the current name
    from reactivestreams_kinesis_spark.operators.snapshots import (
        compact_snapshot,
    )

    compact_snapshot(spark, t, target_file_bytes=1 << 20)
    mc = _read_manifest(t, latest_version(t))
    assert mc["partition_spec"] == [{"col": "nation", "kind": "identity"}]
    keptc = prune_files(mc, [("nation", "=", 3)])
    assert 0 < len(keptc) < len(mc["files"])
    gotc = scan_snapshot(spark, t, [("nation", "=", 3)])
    assert gotc.count() == base.filter("c_nationkey = 3").count()


def test_partition_evolution_metadata_only(spark, sf_dir, tmp_path):
    """set_partition_spec evolves the spec WITHOUT rewriting a file:
    old files keep their old-transform tuples (they no longer
    partition-prune, but min/max still applies and reads stay exact),
    files written after follow the new spec and prune under it;
    clearing with [] stops clustering/recording; compaction migrates
    the whole table onto the current spec."""
    from reactivestreams_kinesis_spark.operators.snapshots import (
        compact_snapshot,
        set_partition_spec,
    )

    t = str(tmp_path / "t")
    base = _cust(spark, sf_dir)
    snapshot_commit(base, t, partition_by=["c_nationkey"])           # v0
    files_v0 = set(_read_manifest(t, 0)["files"])
    set_partition_spec(t, [("c_custkey", "bucket", 8)])              # v1
    m1 = _read_manifest(t, 1)
    assert m1["partition_spec"] == [
        {"col": "c_custkey", "kind": "bucket", "n": 8}
    ]
    assert set(m1["files"]) == files_v0, "evolution rewrites nothing"

    # appends now follow the NEW spec
    extra = base.limit(200).select(
        (F.col("c_custkey") + 1_000_000).alias("c_custkey"),
        "c_nationkey",
        "c_acctbal",
    )
    snapshot_commit(extra, t)                                        # v2
    m2 = _read_manifest(t, 2)
    new = [f for f in m2["files"] if f not in files_v0]
    assert new
    assert all(
        "bucket(c_custkey,8)" in tup
        for f in new
        for tup in m2["stats"][f]["__pvals"]
    )
    # a point lookup on a NEW row prunes to the bucket's new files; OLD
    # files' tuples predate the spec, so the PARTITION layer keeps them
    # conservatively (here min/max stats still exclude them — pruning
    # composes, exactness doesn't depend on the tuples)
    from reactivestreams_kinesis_spark.operators.snapshots import (
        _pvals_exclude,
    )

    key = int(extra.limit(1).collect()[0]["c_custkey"])
    old_f = next(iter(files_v0))
    assert not _pvals_exclude(
        m2["stats"][old_f]["__pvals"],
        m2["partition_spec"],
        "c_custkey",
        "=",
        key,
    ), "old-spec tuples never partition-prune under the new spec"
    kept = prune_files(m2, [("c_custkey", "=", key)])
    assert len(kept) < len(m2["files"]), "new files still prune"
    got = scan_snapshot(spark, t, [("c_custkey", "=", key)])
    assert got.count() == 1
    # reads stay exact across the evolution
    tipdf = read_snapshot(spark, t)
    want = base.unionByName(extra)
    assert tipdf.subtract(want).count() == 0
    assert want.subtract(tipdf).count() == 0

    # compaction migrates everything onto the current spec
    compact_snapshot(spark, t, target_file_bytes=1 << 20)
    mt = _read_manifest(t, latest_version(t))
    assert all(
        tup.get("bucket(c_custkey,8)") is not None
        for f in mt["files"]
        for tup in (mt["stats"][f].get("__pvals") or [{}])
        if mt["stats"][f].get("__pvals")
    )

    # clearing stops recording for later commits
    set_partition_spec(t, [])
    snapshot_commit(extra.limit(5), t)
    mf = _read_manifest(t, latest_version(t))
    assert "partition_spec" not in mf
    newest = [
        f for f in mf["files"] if f not in set(mt["files"])
    ]
    assert newest and all(
        "__pvals" not in (mf["stats"].get(f) or {}) for f in newest
    )

    # guards mirror the commit-time declaration
    with pytest.raises(ValueError, match="not in the table"):
        set_partition_spec(t, ["nope"])
    with pytest.raises(ValueError, match="does not support"):
        set_partition_spec(t, [("c_acctbal", "bucket", 4)])


def test_partitioned_source_pushdown_plans_fewer_files(spark, sf_dir, tmp_path):
    register_snapshot_source(spark)
    t = str(tmp_path / "t")
    base = _cust(spark, sf_dir)
    snapshot_commit(base, t, partition_by=["c_nationkey"])
    m = _read_manifest(t, 0)
    n_kept = len(prune_files(m, [("c_nationkey", "=", 3)]))
    assert 0 < n_kept < len(m["files"])
    pushed = (
        spark.read.format("snapshot_table")
        .option("path", t)
        .option("filterPushdown", "true")
        .load()
        .filter("c_nationkey = 3")
    )
    # the pushdown reader plans exactly the pruned file set: partition
    # count == surviving files (one InputPartition per file)
    assert pushed.rdd.getNumPartitions() == n_kept
    want = base.filter("c_nationkey = 3")
    assert pushed.subtract(want).count() == 0
    assert want.subtract(pushed).count() == 0

    # the SINK path (df.write.format('snapshot_table')) records tuples
    # too — its session-less commit hook derives them via DuckDB; sink
    # tasks don't cluster, so files may carry several tuples, and
    # pruning stays exact
    extra = base.limit(300).select(
        (F.col("c_custkey") + 5_000_000).alias("c_custkey"),
        "c_nationkey",
        "c_acctbal",
    )
    extra.write.format("snapshot_table").option("path", t).mode(
        "append"
    ).save()
    from reactivestreams_kinesis_spark.operators.snapshots import (
        latest_version,
        read_snapshot,
    )

    mt = _read_manifest(t, latest_version(t))
    sink_files = [f for f in mt["files"] if f.startswith("data-tasks")]
    assert sink_files
    assert all(
        mt["stats"][f].get("__pvals") for f in sink_files
    ), "sink files record partition tuples"
    got2 = read_snapshot(spark, t).filter("c_nationkey = 3")
    want2 = base.unionByName(extra).filter("c_nationkey = 3")
    assert got2.subtract(want2).count() == 0
    assert want2.subtract(got2).count() == 0
    kept2 = prune_files(mt, [("c_nationkey", "=", 3)])
    assert len(kept2) < len(mt["files"])

    # declaration guards
    with pytest.raises(ValueError, match="not in the commit"):
        snapshot_commit(base, str(tmp_path / "x"), partition_by=["nope"])
    with pytest.raises(ValueError, match="does not support"):
        snapshot_commit(base, str(tmp_path / "y"), partition_by=[("c_acctbal", "day")])
    with pytest.raises(ValueError, match="does not support"):
        snapshot_commit(
            base, str(tmp_path / "z"), partition_by=[("c_acctbal", "bucket", 4)]
        )
