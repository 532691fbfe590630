"""Snapshot isolation / time travel (round 6): manifest-published parquet
versions — append/overwrite lineage, reader isolation under compaction,
the exclusive-create commit point, and vacuum retention.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from reactivestreams_kinesis_spark.catalog import load_table
from reactivestreams_kinesis_spark.operators.snapshots import (
    _read_manifest,
    compact_snapshot,
    latest_version,
    read_snapshot,
    snapshot_commit,
    vacuum,
)


def test_snapshot_append_overwrite_time_travel(spark, sf_dir, tmp_path):
    """v0 append, v1 append, v2 overwrite: every version stays readable
    with exactly its committed content."""
    t = str(tmp_path / "tbl")
    r = load_table(spark, sf_dir, "region")
    n = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("r_regionkey"),
        F.col("n_name").alias("r_name"),
    )
    r = r.select("r_regionkey", "r_name")
    assert snapshot_commit(r, t) == 0
    assert snapshot_commit(n, t) == 1                      # append
    assert snapshot_commit(r, t, mode="overwrite") == 2    # replace
    assert latest_version(t) == 2
    assert read_snapshot(spark, t, 0).count() == r.count()
    assert read_snapshot(spark, t, 1).count() == r.count() + n.count()
    assert read_snapshot(spark, t, 2).count() == r.count()
    # latest == v2, and content (not just counts) matches
    assert read_snapshot(spark, t).subtract(r).count() == 0


def test_snapshot_reader_isolation_under_compaction(spark, sf_dir, tmp_path):
    """A reader bound to vN is unaffected by a compaction that publishes
    v(N+1): its files are immutable and still on disk — the property a
    directory-listing read cannot have (compact_parquet must REJECT the
    in-place case; snapshot compaction makes it safe)."""
    t = str(tmp_path / "tbl2")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    snapshot_commit(li.repartition(16), t)
    v0 = read_snapshot(spark, t, 0)
    before = v0.count()
    v0_files = {f["path"] for f in v0.select(F.input_file_name().alias("path")).distinct().collect()}
    assert len(v0_files) == 16

    v1 = compact_snapshot(spark, t, target_file_bytes=1 << 40)  # 1 file
    assert v1 == 1
    # old reader still sees its exact file set and content
    assert v0.count() == before
    v1_files = {
        f["path"]
        for f in read_snapshot(spark, t, 1)
        .select(F.input_file_name().alias("path"))
        .distinct()
        .collect()
    }
    assert len(v1_files) == 1 and v1_files.isdisjoint(v0_files)
    assert read_snapshot(spark, t, 1).subtract(read_snapshot(spark, t, 0)).count() == 0


def test_snapshot_commit_race_retries(spark, sf_dir, tmp_path):
    """The exclusive-create commit point: a manifest squatting on the
    next version forces the committer to retry and land one higher —
    append recomputed against the new tip (optimistic concurrency)."""
    import json

    t = str(tmp_path / "tbl3")
    r = load_table(spark, sf_dir, "region")
    snapshot_commit(r, t)
    # simulate a concurrent winner for v1: same file set as v0
    with open(os.path.join(t, "_snapshots", "v000000001.json"), "x") as f:
        json.dump(
            {"version": 1, "parent": 0, "op": "append",
             "files": json.load(open(os.path.join(t, "_snapshots", "v000000000.json")))["files"]},
            f,
        )
    v = snapshot_commit(r, t)  # loser must retry past the squatted v1
    assert v == 2
    # append parent was the squatted tip: v2 = v1 files + new commit
    assert read_snapshot(spark, t, 2).count() == 2 * r.count()


def test_snapshot_vacuum_retention(spark, sf_dir, tmp_path):
    """vacuum(keep_from_version=k) deletes exactly the files no retained
    version references; retained versions still read, older ones are
    gone."""
    import pytest

    t = str(tmp_path / "tbl4")
    r = load_table(spark, sf_dir, "region")
    snapshot_commit(r, t)                       # v0
    snapshot_commit(r, t)                       # v1 = v0 files + new
    compact_snapshot(spark, t, target_file_bytes=1 << 40)  # v2 overwrite
    deleted = vacuum(t, keep_from_version=2)
    # v0's files were shared into v1 (append) but v2 replaced everything:
    # both commits' data files are unreferenced now
    assert deleted, "expected unreferenced files to be removed"
    assert read_snapshot(spark, t, 2).count() == 2 * r.count()
    with pytest.raises(FileNotFoundError):
        read_snapshot(spark, t, 0).count()
    # the deleted files are really off disk
    assert all(not os.path.exists(p) for p in deleted)


def test_snapshot_txn_idempotent_commit(spark, sf_dir, tmp_path):
    """The same txn_id commits exactly once — the second call returns the
    existing version and publishes nothing (Delta txnAppId semantics)."""
    t = str(tmp_path / "tbl5")
    r = load_table(spark, sf_dir, "region")
    v1 = snapshot_commit(r, t, txn_id="epoch-0")
    v2 = snapshot_commit(r, t, txn_id="epoch-0")
    assert v1 == v2 == 0
    assert latest_version(t) == 0
    assert read_snapshot(spark, t).count() == r.count()
    # a new txn does append
    assert snapshot_commit(r, t, txn_id="epoch-1") == 1
    assert read_snapshot(spark, t).count() == 2 * r.count()


def test_snapshot_stream_sink_exactly_once(spark, sf_dir, tmp_path):
    """Streaming appends land one committed version per micro-batch, total
    content equals the source exactly, and replaying an epoch's commit
    (the at-least-once foreachBatch case) does not duplicate rows."""
    from reactivestreams_kinesis_spark.operators.snapshots import (
        snapshot_stream_sink,
    )

    events = load_table(spark, sf_dir, "events")
    src = str(tmp_path / "src")
    events.repartition(3).write.parquet(src)
    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    t = str(tmp_path / "tbl6")
    q = snapshot_stream_sink(
        stream.select("event_id", "user_id"), t, str(tmp_path / "ckpt")
    )
    assert q.awaitTermination(300)
    tip = latest_version(t)
    assert tip == 2  # one version per micro-batch (3 files, 1 per trigger)
    got = read_snapshot(spark, t)
    assert got.count() == events.count()
    assert got.select("event_id").subtract(events.select("event_id")).count() == 0
    # crash-replay simulation: re-commit epoch 0's batch under its txn id
    from reactivestreams_kinesis_spark.operators.snapshots import (
        stream_txn_scope,
    )

    scope = stream_txn_scope(str(tmp_path / "ckpt"))
    replay = spark.read.parquet(src).limit(10).select("event_id", "user_id")
    assert snapshot_commit(replay, t, txn_id=f"stream-{scope}-0") == 0
    assert read_snapshot(spark, t).count() == events.count()


def test_snapshot_vacuum_clean_orphans(spark, sf_dir, tmp_path):
    """Files written by a commit that never published (crash before the
    manifest) are invisible to readers and reclaimed only by
    clean_orphans."""
    import uuid as _uuid

    t = str(tmp_path / "tbl7")
    r = load_table(spark, sf_dir, "region")
    snapshot_commit(r, t)
    # simulate a crashed commit: data files, no manifest
    orphan_dir = os.path.join(t, f"data-{_uuid.uuid4().hex[:12]}")
    r.write.parquet(orphan_dir)
    assert read_snapshot(spark, t).count() == r.count()  # invisible
    deleted = vacuum(t, keep_from_version=0, clean_orphans=True)
    assert deleted and all("data-" in p for p in deleted)
    assert read_snapshot(spark, t).count() == r.count()  # table intact


def test_snapshot_changes_incremental_read(spark, sf_dir, tmp_path):
    """snapshot_changes reads exactly the rows appended in the version
    range — the batch CDC feed — and refuses to diff across an overwrite
    (history rewrite)."""
    import pytest

    from reactivestreams_kinesis_spark.operators.snapshots import (
        snapshot_changes,
    )

    t = str(tmp_path / "tbl8")
    r = load_table(spark, sf_dir, "region").select("r_regionkey", "r_name")
    n = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("r_regionkey"),
        F.col("n_name").alias("r_name"),
    )
    snapshot_commit(r, t)   # v0
    snapshot_commit(n, t)   # v1 append
    snapshot_commit(r, t)   # v2 append
    delta = snapshot_changes(spark, t, from_version=0, to_version=1)
    assert delta.count() == n.count()
    assert delta.subtract(n).count() == 0
    # open range = through tip; v1+v2 additions
    both = snapshot_changes(spark, t, from_version=0)
    assert both.count() == n.count() + r.count()
    # an overwrite in range invalidates incremental reads
    snapshot_commit(n, t, mode="overwrite")  # v3
    with pytest.raises(ValueError, match="not an append"):
        snapshot_changes(spark, t, from_version=0)
    # but a range ending before it still works
    assert snapshot_changes(spark, t, from_version=1, to_version=2).count() == r.count()


def test_snapshot_schema_evolution_add_column(spark, sf_dir, tmp_path):
    """Add-column evolution: an append whose df carries a NEW column
    widens the table schema; the new version reads pre-evolution files
    with the column NULL, old versions read their own (narrower) schema,
    and a type-changing append is refused."""
    import pytest

    t = str(tmp_path / "evo")
    r = load_table(spark, sf_dir, "region").select("r_regionkey", "r_name")
    snapshot_commit(r, t)
    widened = r.withColumn("r_score", F.col("r_regionkey") * 10)
    snapshot_commit(widened, t)  # append with a new column

    latest = read_snapshot(spark, t)
    assert latest.columns == ["r_regionkey", "r_name", "r_score"]
    n = r.count()
    assert latest.count() == 2 * n
    # pre-evolution rows surface NULL; evolved rows carry values
    assert latest.filter(F.col("r_score").isNull()).count() == n
    assert latest.filter(F.col("r_score") == F.col("r_regionkey") * 10).count() == n
    # time travel reads v0 with v0's OWN schema
    assert read_snapshot(spark, t, 0).columns == ["r_regionkey", "r_name"]
    # type change is a rewrite, not an evolution
    with pytest.raises(Exception, match="cannot change column"):
        snapshot_commit(
            r.withColumn("r_score", F.lit("not-a-number")), t
        )


def test_snapshot_merge_upsert_file_granular(spark, sf_dir, tmp_path):
    """Copy-on-write MERGE: updates win over matched rows, unmatched keys
    insert, delete-flagged keys vanish — and files owning NO matched key
    survive VERBATIM in the new manifest (the 100 TB property: a merge
    rewrites only the files it touches)."""
    from reactivestreams_kinesis_spark.operators.snapshots import (
        _read_manifest,
        merge_upsert,
    )

    t = str(tmp_path / "mrg")
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    # 5 files partitioned BY KEY RANGE so update keys localize to files
    snapshot_commit(n.repartitionByRange(5, "n_nationkey"), t)
    files_v0 = _read_manifest(t, 0)["files"]
    assert len(files_v0) == 5

    updates = spark.createDataFrame(
        [
            (0, "UPDATED-0", False),    # update an existing key
            (1, "UPDATED-1", False),    # update in the same range/file
            (999, "INSERTED", False),   # brand-new key
            (2, None, True),            # delete key 2
        ],
        "n_nationkey int, n_name string, _del boolean",
    )
    v1 = merge_upsert(spark, t, updates, "n_nationkey", delete_col="_del")
    assert v1 == 1

    got = {
        r["n_nationkey"]: r["n_name"]
        for r in read_snapshot(spark, t).collect()
    }
    assert got[0] == "UPDATED-0" and got[1] == "UPDATED-1"
    assert got[999] == "INSERTED"
    assert 2 not in got
    base = {r["n_nationkey"]: r["n_name"] for r in n.collect()}
    for k, v in base.items():
        if k not in (0, 1, 2):
            assert got[k] == v, k
    assert len(got) == len(base) - 1 + 1  # one delete, one insert

    # file granularity: keys 0,1,2 live in ONE range file; the other
    # four v0 files must appear verbatim in v1's manifest
    files_v1 = set(_read_manifest(t, 1)["files"])
    survivors = [f for f in files_v0 if f in files_v1]
    assert len(survivors) == 4
    # time travel: v0 unchanged
    v0 = {r["n_nationkey"]: r["n_name"] for r in read_snapshot(spark, t, 0).collect()}
    assert v0 == base


def test_snapshot_merge_upsert_txn_idempotent(spark, sf_dir, tmp_path):
    """A replayed merge (same txn id) must no-op and return the committed
    version — the foreachBatch crash-replay contract, same as appends."""
    from reactivestreams_kinesis_spark.operators.snapshots import merge_upsert

    t = str(tmp_path / "mrgtxn")
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    snapshot_commit(n, t)
    upd = spark.createDataFrame(
        [(0, "X")], "n_nationkey int, n_name string"
    )
    v1 = merge_upsert(spark, t, upd, "n_nationkey", txn_id="merge-epoch-7")
    v_replay = merge_upsert(spark, t, upd, "n_nationkey", txn_id="merge-epoch-7")
    assert v1 == v_replay == 1
    assert latest_version(t) == 1
    assert read_snapshot(spark, t).filter(F.col("n_name") == "X").count() == 1


def test_snapshot_merge_schema_evolving_updates(spark, sf_dir, tmp_path):
    """A merge whose updates carry a new column widens the schema through
    the same add-column path as appends: survivors and untouched files
    read the column as NULL."""
    from reactivestreams_kinesis_spark.operators.snapshots import merge_upsert

    t = str(tmp_path / "mrgevo")
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    snapshot_commit(n.repartitionByRange(5, "n_nationkey"), t)
    upd = spark.createDataFrame(
        [(0, "X", 1.5)], "n_nationkey int, n_name string, score double"
    )
    merge_upsert(spark, t, upd, "n_nationkey")
    latest = read_snapshot(spark, t)
    assert latest.columns == ["n_nationkey", "n_name", "score"]
    assert latest.filter(F.col("score").isNotNull()).count() == 1
    assert latest.count() == n.count()


def test_snapshot_stats_prune_scan(spark, sf_dir, tmp_path):
    """Manifest stats data skipping: a range-partitioned commit records
    per-file min/max; a point/range scan prunes to the owning file(s)
    driver-side and still returns exactly read_snapshot().filter()'s
    rows (pruning is an optimization, never a filter)."""
    from reactivestreams_kinesis_spark.operators.snapshots import (
        _read_manifest,
        prune_files,
        scan_snapshot,
    )

    t = str(tmp_path / "stats")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name", "c_acctbal")
    snapshot_commit(c.repartitionByRange(8, "c_custkey"), t)
    manifest = _read_manifest(t, 0)
    assert len(manifest["files"]) == 8
    assert all(f in manifest["stats"] for f in manifest["files"])

    some_key = c.agg(F.max("c_custkey")).collect()[0][0]
    # point predicate: exactly one range file can own the max key
    assert len(prune_files(manifest, [("c_custkey", "=", some_key)])) == 1
    got = scan_snapshot(spark, t, [("c_custkey", "=", some_key)])
    want = read_snapshot(spark, t).filter(F.col("c_custkey") == some_key)
    assert got.collect() == want.collect()
    # range predicate prunes a strict subset and matches the plain filter
    lo = c.agg(F.expr("percentile_approx(c_custkey, 0.9)")).collect()[0][0]
    survivors = prune_files(manifest, [("c_custkey", ">=", lo)])
    assert 0 < len(survivors) < 8
    got = scan_snapshot(spark, t, [("c_custkey", ">=", lo)])
    want = read_snapshot(spark, t).filter(F.col("c_custkey") >= lo)
    assert got.count() == want.count()
    assert got.subtract(want).count() == 0
    # a predicate outside the domain prunes EVERYTHING, schema preserved
    empty = scan_snapshot(spark, t, [("c_custkey", "<", -1)])
    assert empty.count() == 0
    assert empty.columns == ["c_custkey", "c_name", "c_acctbal"]


def test_snapshot_stats_survive_merge_and_append(spark, sf_dir, tmp_path):
    """Stats carry through the lineage: appends extend the parent's map,
    a copy-on-write merge keeps retained files' stats and records stats
    for its rewritten files — every file of the new version has stats."""
    from reactivestreams_kinesis_spark.operators.snapshots import (
        _read_manifest,
        merge_upsert,
    )

    t = str(tmp_path / "statsl")
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    snapshot_commit(n.repartitionByRange(5, "n_nationkey"), t)
    snapshot_commit(n.limit(3), t)  # append
    m1 = _read_manifest(t, 1)
    assert all(f in m1["stats"] for f in m1["files"])
    upd = spark.createDataFrame([(0, "X")], "n_nationkey int, n_name string")
    merge_upsert(spark, t, upd, "n_nationkey")
    m2 = _read_manifest(t, 2)
    assert all(f in m2["stats"] for f in m2["files"])


def test_snapshot_clustered_compaction_enables_pruning(spark, sf_dir, tmp_path):
    """Clustered compaction turns the manifest stats into a prune index:
    on a hash-scattered table a point predicate prunes (almost) nothing
    because every file spans the key domain; after
    compact_snapshot(cluster_by=[key]) the same predicate prunes to one
    file — and the answer is unchanged."""
    from reactivestreams_kinesis_spark.operators.snapshots import (
        _read_manifest,
        compact_snapshot,
        prune_files,
        scan_snapshot,
    )

    t = str(tmp_path / "clus")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_acctbal")
    snapshot_commit(c.repartition(8), t)  # hash scatter: files span the domain
    # a MID-domain key: every scattered file's [min,max] straddles it
    key = c.agg(F.expr("percentile_approx(c_custkey, 0.5)")).collect()[0][0]
    m0 = _read_manifest(t, 0)
    scattered = len(prune_files(m0, [("c_custkey", "=", key)]))
    assert scattered >= 7  # stats are useless on a scattered layout

    v1 = compact_snapshot(
        spark, t, target_file_bytes=1, cluster_by=["c_custkey"]
    )  # 1-byte target => keeps multiple files, range-clustered
    m1 = _read_manifest(t, v1)
    assert len(m1["files"]) > 1
    assert len(prune_files(m1, [("c_custkey", "=", key)])) == 1
    got = scan_snapshot(spark, t, [("c_custkey", "=", key)])
    want = c.filter(F.col("c_custkey") == key)
    assert got.collect() == want.collect()

    # z-order variant stays row-equivalent and records stats for all files
    v2 = compact_snapshot(
        spark, t, target_file_bytes=1,
        cluster_by=["c_custkey", "c_acctbal"], zorder=True,
    )
    m2 = _read_manifest(t, v2)
    assert all(f in m2["stats"] for f in m2["files"])
    assert read_snapshot(spark, t, v2).subtract(c).count() == 0
    assert read_snapshot(spark, t, v2).count() == c.count()


def test_snapshot_delete_where_file_granular(spark, sf_dir, tmp_path):
    """Predicate DELETE rewrites only the files that actually hold a
    matching row (stats exclusion + one exact candidate scan); the rest
    carry verbatim. Result equals the filter; time travel unchanged; a
    no-match delete publishes no version."""
    from reactivestreams_kinesis_spark.operators.snapshots import (
        _read_manifest,
        delete_where,
    )

    t = str(tmp_path / "delw")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_acctbal")
    snapshot_commit(c.repartitionByRange(8, "c_custkey"), t)
    files_v0 = _read_manifest(t, 0)["files"]

    # delete the lowest ~eighth of the key domain: range layout localizes
    # the matches to the first file(s)
    cut = c.agg(F.expr("percentile_approx(c_custkey, 0.125)")).collect()[0][0]
    v1 = delete_where(spark, t, [("c_custkey", "<=", cut)])
    assert v1 == 1
    files_v1 = set(_read_manifest(t, 1)["files"])
    retained = [f for f in files_v0 if f in files_v1]
    assert len(retained) >= 6  # at most ~2 boundary files rewrote

    got = read_snapshot(spark, t)
    want = c.filter(F.col("c_custkey") > cut)
    assert got.count() == want.count()
    assert got.subtract(want).count() == 0
    # time travel intact
    assert read_snapshot(spark, t, 0).count() == c.count()
    # no-match delete: no new version
    assert delete_where(spark, t, [("c_custkey", "<", -5)]) == 1
    # txn idempotence
    v2 = delete_where(spark, t, [("c_custkey", ">", cut + 10)], txn_id="d-1")
    assert delete_where(spark, t, [("c_custkey", ">", cut + 10)], txn_id="d-1") == v2


def test_snapshot_update_where_file_granular(spark, sf_dir, tmp_path):
    """Predicate UPDATE: matching rows take the assignments (expressions
    may reference the row's own columns), non-matching rows — in touched
    files and untouched files alike — are byte-identical; file
    granularity and txn idempotence hold as for delete."""
    from reactivestreams_kinesis_spark.operators.snapshots import (
        _read_manifest,
        update_where,
    )

    t = str(tmp_path / "updw")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name", "c_acctbal")
    snapshot_commit(c.repartitionByRange(8, "c_custkey"), t)
    files_v0 = _read_manifest(t, 0)["files"]
    cut = c.agg(F.expr("percentile_approx(c_custkey, 0.125)")).collect()[0][0]

    v1 = update_where(
        spark, t, [("c_custkey", "<=", cut)],
        {"c_acctbal": F.col("c_acctbal") * 2, "c_name": "CAPPED"},
    )
    assert v1 == 1
    retained = [f for f in files_v0 if f in set(_read_manifest(t, 1)["files"])]
    assert len(retained) >= 6

    got = read_snapshot(spark, t)
    want = c.select(
        "c_custkey",
        F.when(F.col("c_custkey") <= cut, F.lit("CAPPED"))
        .otherwise(F.col("c_name")).alias("c_name"),
        F.when(F.col("c_custkey") <= cut, F.col("c_acctbal") * 2)
        .otherwise(F.col("c_acctbal")).alias("c_acctbal"),
    )
    assert got.count() == want.count()
    assert got.subtract(want).count() == 0
    # unknown assignment column refuses
    import pytest

    with pytest.raises(ValueError, match="unknown columns"):
        update_where(spark, t, [("c_custkey", ">", 0)], {"nope": 1})
    # no-match predicate: no new version
    assert update_where(spark, t, [("c_custkey", "<", -9)], {"c_name": "x"}) == 1


def test_snapshot_check_constraints(spark, sf_dir, tmp_path):
    """CHECK constraints: a violating add is refused; once attached, every
    commit kind validates its new/rewritten rows and a violation aborts
    before the manifest publishes (table untouched, debris vacuumable);
    NULL evaluates as pass (SQL CHECK); the constraint survives
    compaction and keeps firing after it."""
    import pytest

    from reactivestreams_kinesis_spark.operators.snapshots import (
        add_constraint,
        merge_upsert,
        update_where,
    )

    t = str(tmp_path / "chk")
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    snapshot_commit(n, t)
    # violating add refused (existing data already breaks it)
    with pytest.raises(ValueError, match="violation"):
        add_constraint(spark, t, "impossible", "n_nationkey < 0")
    v = add_constraint(spark, t, "key_range", "n_nationkey BETWEEN 0 AND 500000")
    assert v == 1  # metadata-only version

    bad = spark.createDataFrame(
        [(999999999, "TOO-BIG")], "n_nationkey int, n_name string"
    )
    with pytest.raises(ValueError, match="key_range"):
        snapshot_commit(bad, t)
    assert latest_version(t) == 1  # nothing published

    # NULL passes (SQL CHECK: only FALSE violates)
    nullish = spark.createDataFrame(
        [(None, "NULLKEY")], "n_nationkey int, n_name string"
    )
    v2 = snapshot_commit(nullish, t)
    assert v2 == 2

    # merge and update validate their rewrites too
    with pytest.raises(ValueError, match="key_range"):
        merge_upsert(
            spark, t,
            spark.createDataFrame([(600000, "X")], "n_nationkey int, n_name string"),
            "n_nationkey",
        )
    with pytest.raises(ValueError, match="key_range"):
        update_where(
            spark, t, [("n_nationkey", ">=", 0)], {"n_nationkey": 700000}
        )

    # survives compaction (overwrite commit) and still enforces after
    compact_snapshot(spark, t, target_file_bytes=1 << 40)
    with pytest.raises(ValueError, match="key_range"):
        snapshot_commit(bad, t)
    assert read_snapshot(spark, t).count() == n.count() + 1


def test_snapshot_bloom_point_lookup_skipping(spark, sf_dir, tmp_path):
    """Bloom file skipping closes the hash-scatter gap: on a scattered
    layout min/max prunes nothing for a mid-domain point key, but after
    set_bloom_columns + rewrite the bloom proves definite absence for
    the non-owning files. Pruning stays exact (results equal the plain
    filter), IN-lists prune when every key is absent, and a float bloom
    column is refused."""
    import pytest

    from reactivestreams_kinesis_spark.operators.snapshots import (
        _read_manifest,
        compact_snapshot,
        prune_files,
        scan_snapshot,
        set_bloom_columns,
    )

    t = str(tmp_path / "bloom")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name", "c_acctbal")
    snapshot_commit(c.repartition(8), t)  # hash scatter
    key = c.agg(F.expr("percentile_approx(c_custkey, 0.5)")).collect()[0][0]
    m0 = _read_manifest(t, 0)
    assert len(prune_files(m0, [("c_custkey", "=", key)])) >= 7  # range: useless

    with pytest.raises(ValueError, match="floating-point"):
        set_bloom_columns(spark, t, ["c_acctbal"])
    set_bloom_columns(spark, t, ["c_custkey"])
    # metadata-only version: old files have no blooms yet -> conservative
    m1 = _read_manifest(t, latest_version(t))
    assert len(prune_files(m1, [("c_custkey", "=", key)])) >= 7

    # rewrite (compaction into several files) builds the blooms
    v = compact_snapshot(spark, t, target_file_bytes=1)
    m2 = _read_manifest(t, v)
    assert len(m2["files"]) > 1
    assert all(
        "bloom" in m2["stats"][f].get("c_custkey", {}) for f in m2["files"]
    )
    survivors = prune_files(m2, [("c_custkey", "=", key)])
    assert len(survivors) < len(m2["files"])  # bloom prunes scattered files
    got = scan_snapshot(spark, t, [("c_custkey", "=", key)])
    want = c.filter(F.col("c_custkey") == key)
    assert sorted(got.collect()) == sorted(want.collect())
    # an absent key prunes EVERY file (bloom definite-absence)
    assert prune_files(m2, [("c_custkey", "=", -424242)]) == []
    assert scan_snapshot(spark, t, [("c_custkey", "=", -424242)]).count() == 0


def test_snapshot_merge_bloom_targeting_on_scattered_keys(spark, sf_dir, tmp_path):
    """A merge whose update keys are scattered (range spans the domain)
    still targets file-granularly when the table declares blooms: only
    the files whose blooms admit an update key rewrite; the rest carry
    verbatim — and the merge result equals the key-by-key expectation."""
    from reactivestreams_kinesis_spark.operators.snapshots import (
        _read_manifest,
        compact_snapshot,
        merge_upsert,
        set_bloom_columns,
    )

    t = str(tmp_path / "mrgbloom")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    snapshot_commit(c.repartition(8), t)          # hash scatter
    set_bloom_columns(spark, t, ["c_custkey"])
    v = compact_snapshot(spark, t, target_file_bytes=1)  # rewrite -> blooms
    files_pre = _read_manifest(t, v)["files"]
    assert len(files_pre) > 4

    lo = c.agg(F.min("c_custkey")).collect()[0][0]
    hi = c.agg(F.max("c_custkey")).collect()[0][0]
    # two extreme keys: their RANGE spans every file, blooms must save it
    upd = spark.createDataFrame(
        [(lo, "LOW"), (hi, "HIGH")], "c_custkey long, c_name string"
    )
    v2 = merge_upsert(spark, t, upd, "c_custkey")
    files_post = set(_read_manifest(t, v2)["files"])
    retained = [f for f in files_pre if f in files_post]
    assert len(files_pre) - len(retained) <= 3  # only bloom-admitting files rewrote
    got = {r["c_custkey"]: r["c_name"] for r in read_snapshot(spark, t).collect()}
    assert got[lo] == "LOW" and got[hi] == "HIGH"
    base = {r["c_custkey"]: r["c_name"] for r in c.collect()}
    assert all(got[k] == v for k, v in base.items() if k not in (lo, hi))


def test_snapshot_vacuum_by_retention_window(spark, sf_dir, tmp_path):
    """Time-based retention: versions published before the window drop
    (files and manifests), versions inside it survive, and the tip
    survives even when it is older than the window."""
    import pytest

    from reactivestreams_kinesis_spark.operators.snapshots import (
        _manifest_path,
        vacuum_by_retention,
    )

    t = str(tmp_path / "ret")
    r = load_table(spark, sf_dir, "region").select("r_regionkey")
    snapshot_commit(r, t, mode="overwrite")            # v0
    snapshot_commit(r, t, mode="overwrite")            # v1
    snapshot_commit(r, t, mode="overwrite")            # v2 (tip)
    now = 1_000_000.0
    os.utime(_manifest_path(t, 0), (now - 500, now - 500))
    os.utime(_manifest_path(t, 1), (now - 100, now - 100))
    os.utime(_manifest_path(t, 2), (now - 50, now - 50))

    deleted = vacuum_by_retention(t, retention_seconds=200, now=now)
    assert deleted  # v0's overwritten files dropped
    with pytest.raises(FileNotFoundError):
        read_snapshot(spark, t, 0)
    assert read_snapshot(spark, t, 1).count() == r.count()
    assert read_snapshot(spark, t, 2).count() == r.count()

    # tip older than the window still survives
    os.utime(_manifest_path(t, 1), (now - 900, now - 900))
    os.utime(_manifest_path(t, 2), (now - 800, now - 800))
    deleted2 = vacuum_by_retention(t, retention_seconds=200, now=now)
    assert read_snapshot(spark, t).count() == r.count()
    assert latest_version(t) == 2


def test_snapshot_rewrite_conflict_detection(spark, sf_dir, tmp_path):
    """Optimistic concurrency for REWRITE commits: a merge / delete /
    compaction whose retained-file list was computed against a tip that
    has since moved must ABORT (SnapshotConflictError) rather than
    publish — publishing would silently drop the concurrent commit's
    rows (the lost-update anomaly). Appends still compose across the
    race, and a replayed committed txn still returns idempotently."""
    import pytest

    from reactivestreams_kinesis_spark.operators.snapshots import (
        SnapshotConflictError,
        compact_snapshot,
        merge_upsert,
        publish_manifest,
    )

    t = str(tmp_path / "conflict")
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    snapshot_commit(n, t)  # v0

    # direct protocol-level check: a rewrite publish bound to v0 loses
    # to an append that landed v1
    snapshot_commit(n.limit(1), t)  # v1 (the racing commit)
    with pytest.raises(SnapshotConflictError, match="re-run"):
        publish_manifest(t, [], mode="overwrite", base_files=[], require_parent=0)

    # end-to-end: interleave an append inside a merge by racing the
    # commit step — monkeypatch the rewrite commit to append first
    import reactivestreams_kinesis_spark.operators.snapshots as S

    real = S._commit_rewrite
    def racing(table_dir, df, **kw):
        snapshot_commit(n.limit(2), table_dir)  # concurrent append wins
        return real(table_dir, df, **kw)
    S._commit_rewrite = racing
    try:
        with pytest.raises(SnapshotConflictError):
            merge_upsert(
                spark, t,
                spark.createDataFrame([(0, "X")], "n_nationkey int, n_name string"),
                "n_nationkey",
            )
    finally:
        S._commit_rewrite = real
    # the racing append's rows are intact (nothing lost)
    assert read_snapshot(spark, t).count() == n.count() + 1 + 2

    # a clean retry against the new tip succeeds
    merge_upsert(
        spark, t,
        spark.createDataFrame([(0, "X")], "n_nationkey int, n_name string"),
        "n_nationkey",
    )
    assert (
        read_snapshot(spark, t).filter(F.col("n_name") == "X").count() >= 1
    )

    # compaction is guarded the same way
    tip_before = latest_version(t)
    real_read = S.read_snapshot
    def racing_read(spark_, table_dir, version=None):
        df = real_read(spark_, table_dir, version)
        if version == tip_before:  # compaction's bound read
            snapshot_commit(n.limit(1), table_dir)
        return df
    S.read_snapshot = racing_read
    try:
        with pytest.raises(SnapshotConflictError):
            compact_snapshot(spark, t, target_file_bytes=1 << 40)
    finally:
        S.read_snapshot = real_read


def test_snapshot_metadata_queries(spark, sf_dir, tmp_path):
    """table_stats_summary answers COUNT/MIN/MAX from the manifest alone
    (values equal a real scan), describe_history reports one audit row
    per version with op/files/rows, and both stay honest after a vacuum
    (missing versions skipped, stats still exact for the tip)."""
    from reactivestreams_kinesis_spark.operators.snapshots import (
        compact_snapshot,
        describe_history,
        table_stats_summary,
        vacuum,
    )

    t = str(tmp_path / "meta")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_acctbal")
    snapshot_commit(c.repartition(4), t)      # v0
    snapshot_commit(c.limit(10), t)           # v1 append
    compact_snapshot(spark, t, target_file_bytes=1 << 40)  # v2 overwrite

    s = table_stats_summary(t)
    want_rows = c.count() + 10
    assert s["rows"] == want_rows
    agg = c.agg(
        F.min("c_custkey"), F.max("c_custkey")
    ).collect()[0]
    assert s["columns"]["c_custkey"]["min"] == agg[0]
    assert s["columns"]["c_custkey"]["max"] == agg[1]
    # time travel: v0's summary counts only v0
    assert table_stats_summary(t, version=0)["rows"] == c.count()

    h = {r["version"]: r for r in describe_history(spark, t).collect()}
    assert h[0]["op"] == "append" and h[0]["parent"] is None
    assert h[1]["op"] == "append" and h[1]["parent"] == 0
    assert h[2]["op"] == "overwrite" and h[2]["n_rows"] == want_rows
    assert h[2]["n_files"] == 1 and h[2]["total_bytes"] > 0

    vacuum(t, keep_from_version=2)
    h2 = describe_history(spark, t).collect()
    assert [r["version"] for r in h2] == [2]
    assert table_stats_summary(t)["rows"] == want_rows


def test_snapshot_review_fixes_regressions(spark, sf_dir, tmp_path):
    """Regression pins for the round-6 self-review findings: NULL delete
    flags upsert (not delete); duplicated update keys are refused; a
    type-mismatched bloom probe stays conservative; a narrower-than-
    evolved append evaluates a constraint on the missing column as NULL
    and passes."""
    import pytest

    from reactivestreams_kinesis_spark.operators.snapshots import (
        _bloom_maybe_contains,
        _file_bloom,
        add_constraint,
        merge_upsert,
        prune_files,
        _read_manifest,
        set_bloom_columns,
        compact_snapshot,
    )

    t = str(tmp_path / "rev")
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    snapshot_commit(n, t)

    # NULL delete flag = plain upsert, key survives with the new value
    upd = spark.createDataFrame(
        [(0, "NULLFLAG", None)],
        "n_nationkey int, n_name string, _del boolean",
    )
    merge_upsert(spark, t, upd, "n_nationkey", delete_col="_del")
    got = {r["n_nationkey"]: r["n_name"] for r in read_snapshot(spark, t).collect()}
    assert got[0] == "NULLFLAG"
    assert len(got) == n.count()

    # duplicated update keys refused (multiple-match error)
    dup = spark.createDataFrame(
        [(1, "A"), (1, "B")], "n_nationkey int, n_name string"
    )
    with pytest.raises(ValueError, match="duplicated"):
        merge_upsert(spark, t, dup, "n_nationkey")

    # bloom: float/bool probes of an int column cannot prove absence
    sb = str(tmp_path / "revbloom")
    snapshot_commit(n.repartition(4), sb)
    set_bloom_columns(spark, sb, ["n_nationkey"])
    v = compact_snapshot(spark, sb, target_file_bytes=1)
    m = _read_manifest(sb, v)
    assert len(prune_files(m, [("n_nationkey", "=", 5.0)])) >= 1  # conservative
    assert len(prune_files(m, [("n_nationkey", "=", True)])) >= 1
    some_file = m["files"][0]
    bloom = m["stats"][some_file]["n_nationkey"]["bloom"]
    assert _bloom_maybe_contains(bloom, 5.0)  # non-key type: maybe
    # bool columns never build blooms
    bvals = spark.createDataFrame([(True,), (False,)], "b boolean")
    bdir = str(tmp_path / "bparq")
    bvals.coalesce(1).write.parquet(bdir)
    import glob

    assert _file_bloom(glob.glob(bdir + "/*.parquet")[0], "b") is None

    # narrower-than-evolved append under a constraint on the new column
    te = str(tmp_path / "revevo")
    snapshot_commit(n, te)
    snapshot_commit(n.withColumn("score", F.col("n_nationkey") + 1), te)
    add_constraint(spark, te, "pos_score", "score > 0")
    v2 = snapshot_commit(n, te)  # no 'score' column: NULL -> passes
    assert read_snapshot(spark, te, v2).filter(F.col("score").isNull()).count() >= n.count()


def test_snapshot_source_writer_enforces_constraints(spark, sf_dir, tmp_path):
    """The snapshot_table sink honors CHECK constraints: a violating
    batch write aborts before the manifest publishes (table untouched,
    staged files cleaned by the abort), a conforming write lands."""
    import pytest

    from reactivestreams_kinesis_spark.operators.snapshots import (
        add_constraint,
        latest_version,
        read_snapshot,
        snapshot_commit,
    )
    from reactivestreams_kinesis_spark.sources.snapshot_source import (
        register_snapshot_source,
    )

    register_snapshot_source(spark)
    t = str(tmp_path / "dscons")
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    snapshot_commit(n, t)
    add_constraint(spark, t, "key_cap", "n_nationkey < 100000")
    tip = latest_version(t)

    bad = spark.createDataFrame(
        [(500000, "BAD")], "n_nationkey int, n_name string"
    )
    with pytest.raises(Exception, match="key_cap"):
        bad.write.format("snapshot_table").option("path", t).mode("append").save()
    assert latest_version(t) == tip  # nothing published

    ok = spark.createDataFrame([(999, "OK")], "n_nationkey int, n_name string")
    ok.write.format("snapshot_table").option("path", t).mode("append").save()
    assert (
        read_snapshot(spark, t).filter(F.col("n_name") == "OK").count() == 1
    )


def test_tags_pin_versions_against_vacuum(spark, sf_dir, tmp_path):
    """Tags are immutable named refs: a tagged version (manifest + files,
    delete files included) survives any vacuum window; deleting the tag
    releases it; re-tagging an existing name refuses; tagging a missing
    version refuses."""
    import pytest as _pytest

    from reactivestreams_kinesis_spark.catalog import load_table
    from reactivestreams_kinesis_spark.operators.snapshots import (
        delete_tag,
        delete_where,
        list_tags,
        read_snapshot,
        resolve_tag,
        snapshot_commit,
        tag_snapshot,
        vacuum,
    )

    base = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey", "c_acctbal"
    )
    t = str(tmp_path / "t")
    snapshot_commit(base.repartitionByRange(4, "c_custkey"), t)      # v0
    delete_where(spark, t, [("c_acctbal", "<", 0.0)], strategy="merge_on_read")  # v1
    v1_count = read_snapshot(spark, t, 1).count()
    snapshot_commit(base.limit(7), t)                                # v2
    snapshot_commit(base.limit(3), t)                                # v3

    assert tag_snapshot(t, "train-corpus.v1", 1) == 1
    assert tag_snapshot(t, "latest") == 3  # defaults to tip
    assert list_tags(t) == {"latest": 3, "train-corpus.v1": 1}
    with _pytest.raises(ValueError, match="already exists"):
        tag_snapshot(t, "latest", 2)
    with _pytest.raises(FileNotFoundError):
        tag_snapshot(t, "nope", 99)
    with _pytest.raises(ValueError, match="invalid tag name"):
        tag_snapshot(t, "../escape", 1)

    # vacuum far past v1: the tagged version (with its DV files) survives
    vacuum(t, keep_from_version=3)
    assert resolve_tag(t, "train-corpus.v1") == 1
    assert read_snapshot(spark, t, 1).count() == v1_count
    # untagged v0/v2 are gone
    with _pytest.raises(FileNotFoundError):
        read_snapshot(spark, t, 0)

    delete_tag(t, "train-corpus.v1")
    vacuum(t, keep_from_version=3)
    with _pytest.raises(FileNotFoundError):
        read_snapshot(spark, t, 1)
    assert read_snapshot(spark, t, 3).count() > 0


def test_version_at_timestamp(spark, sf_dir, tmp_path):
    """TIMESTAMP AS OF resolves against commit mtimes: a time between
    two commits reads the earlier one; before the first refuses; now
    reads the tip; vacuumed versions are skipped (the horizon moves)."""
    import os
    import time

    import pytest as _pytest

    from reactivestreams_kinesis_spark.catalog import load_table
    from reactivestreams_kinesis_spark.operators.snapshots import (
        _manifest_path,
        read_snapshot,
        snapshot_commit,
        vacuum,
        version_at_timestamp,
    )

    base = load_table(spark, sf_dir, "nation")
    t = str(tmp_path / "t")
    snapshot_commit(base, t)                    # v0
    time.sleep(0.05)
    snapshot_commit(base.limit(5), t)           # v1
    time.sleep(0.05)
    snapshot_commit(base.limit(2), t)           # v2

    t0 = os.path.getmtime(_manifest_path(t, 0))
    t1 = os.path.getmtime(_manifest_path(t, 1))
    assert version_at_timestamp(t, (t0 + t1) / 2) == 0
    assert version_at_timestamp(t, time.time()) == 2
    with _pytest.raises(ValueError, match="no retained version"):
        version_at_timestamp(t, t0 - 10.0)
    n0 = read_snapshot(spark, t, version_at_timestamp(t, (t0 + t1) / 2)).count()
    assert n0 == base.count()

    vacuum(t, keep_from_version=1)
    with _pytest.raises(ValueError, match="no retained version"):
        version_at_timestamp(t, (t0 + t1) / 2)


def test_snapshot_files_metadata_table(spark, sf_dir, tmp_path):
    """The FILES metadata table reflects the manifest exactly: one row
    per file, bytes/rows from metadata only, per-file deleted counts
    after a merge-on-read delete, and queryable stats."""
    import json as _json

    from pyspark.sql import functions as F

    from reactivestreams_kinesis_spark.catalog import load_table
    from reactivestreams_kinesis_spark.operators.snapshots import (
        delete_where,
        read_snapshot,
        snapshot_commit,
        snapshot_files,
    )

    base = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_acctbal"
    )
    t = str(tmp_path / "t")
    snapshot_commit(base.repartitionByRange(4, "c_custkey"), t)
    delete_where(spark, t, [("c_acctbal", "<", 0.0)], strategy="merge_on_read")

    files = snapshot_files(spark, t)
    rows = files.collect()
    assert len(rows) == 4 and all(r["bytes"] > 0 for r in rows)
    total = files.agg(
        F.sum("rows").alias("r"), F.sum("deleted_rows").alias("d")
    ).collect()[0]
    assert total["r"] == base.count()
    assert total["r"] - total["d"] == read_snapshot(spark, t).count()
    # stats are real JSON with the clustered column's bounds
    s = _json.loads(rows[0]["stats_json"])
    assert "c_custkey" in s and "min" in s["c_custkey"]
    # time travel: v0 has no deletes
    assert (
        snapshot_files(spark, t, 0).agg(F.sum("deleted_rows")).collect()[0][0]
        == 0
    )


def test_compaction_advice_decision(spark, sf_dir, tmp_path):
    """The metadata-only maintenance decision: a healthy table advises
    nothing; a small-file tail advises bin_pack; stacked MoR deletes and
    any equality entry advise materialization; acting on the advice
    clears it."""
    from reactivestreams_kinesis_spark.operators.snapshots import (
        compact_snapshot,
        compaction_advice,
        delete_by_key,
        delete_where,
    )

    t = str(tmp_path / "t")
    base = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey", "c_acctbal"
    )
    snapshot_commit(base.coalesce(1), t)
    fresh = compaction_advice(t)
    assert not fresh["bin_pack"] and not fresh["materialize_deletes"]
    assert fresh["reasons"] == []

    # small-file tail: six one-row epoch commits
    for i in range(6):
        snapshot_commit(base.filter(F.col("c_custkey") == 1 + i).coalesce(1), t)
    tail = compaction_advice(t)
    assert tail["bin_pack"] and tail["small_files"] >= 6
    compact_snapshot(spark, t, small_file_bytes=32 * 1024 * 1024)
    assert not compaction_advice(t)["bin_pack"]

    # stacked MoR deletes: generations accumulate until materialized
    # loosen the cut each time so every generation deletes NEW rows
    for cut in (-800.0, -600.0, -400.0, -200.0, 0.0):
        delete_where(
            spark, t, [("c_acctbal", "<", cut)], strategy="merge_on_read"
        )
    mor = compaction_advice(t)
    assert mor["materialize_deletes"]
    # sf0.001 has no balance below -800, so that cut publishes nothing:
    # 4 generations at the smallest fixture, 5 at larger ones
    assert mor["delete_generations"] >= 4

    # equality entries always advise (they suppress metadata COUNT)
    keys = spark.createDataFrame([(3,)], "c_nationkey int")
    delete_by_key(spark, t, keys, "c_nationkey")
    assert compaction_advice(t)["materialize_deletes"]
    compact_snapshot(spark, t)
    cleared = compaction_advice(t)
    assert not cleared["materialize_deletes"]
    assert cleared["delete_generations"] == 0


def test_drop_column_metadata_only(spark, sf_dir, tmp_path):
    """DROP COLUMN as one manifest write: every read surface stops
    seeing the column, no data file changes, time travel still shows it,
    and appends no longer need it."""
    from reactivestreams_kinesis_spark.operators.snapshots import (
        _read_manifest,
        drop_column,
    )
    from reactivestreams_kinesis_spark.sources.snapshot_source import (
        register_snapshot_source,
    )

    t = str(tmp_path / "t")
    base = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey", "c_acctbal"
    )
    snapshot_commit(base.repartitionByRange(4, "c_custkey"), t)      # v0
    files_v0 = _read_manifest(t, 0)["files"]
    v = drop_column(t, "c_acctbal")                                  # v1
    assert v == 1
    m = _read_manifest(t, 1)
    assert m["files"] == files_v0, "drop rewrites no data file"
    assert m["dropped_cols"] == ["c_acctbal"]

    cur = read_snapshot(spark, t)
    assert cur.columns == ["c_custkey", "c_nationkey"]
    assert cur.count() == base.count()
    assert read_snapshot(spark, t, 0).columns == [
        "c_custkey", "c_nationkey", "c_acctbal",
    ]
    register_snapshot_source(spark)
    src = spark.read.format("snapshot_table").option("path", t).load()
    assert src.columns == ["c_custkey", "c_nationkey"]
    assert src.count() == base.count()

    # appends without the column are normal; an append RE-ADDING the
    # dropped name is legal via physical column mapping — it mints a
    # fresh physical name, so pre-drop files read NULL (never the old
    # bytes) while the new rows carry their values
    snapshot_commit(
        base.limit(5).select("c_custkey", "c_nationkey"), t
    )                                                                # v2
    assert read_snapshot(spark, t).count() == base.count() + 5
    snapshot_commit(base.limit(3), t)  # carries c_acctbal again     # v3
    m3 = _read_manifest(t, 3)
    assert m3["phys"]["c_acctbal"] != "c_acctbal", "fresh physical minted"
    assert m3["dropped_cols"] == ["c_acctbal"], "tombstone stays (physical)"
    got = read_snapshot(spark, t)
    assert got.filter(F.col("c_acctbal").isNotNull()).count() == 3
    assert got.count() == base.count() + 8
    # idempotent txn replay
    assert drop_column(t, "c_nationkey", txn_id="drop-nk") == 4
    assert drop_column(t, "c_nationkey", txn_id="drop-nk") == 4


def test_drop_column_guards(spark, sf_dir, tmp_path):
    """Refusals: constraint references, pending equality-delete keys,
    unknown column, last column, legacy schema-less manifest; declared
    bloom/NDV lists shed the column instead of blocking."""
    import json as _json

    import pytest as _pytest

    from reactivestreams_kinesis_spark.operators.snapshots import (
        _manifest_path,
        _read_manifest,
        add_constraint,
        compact_snapshot,
        delete_by_key,
        drop_column,
        latest_version,
        set_bloom_columns,
        set_ndv_columns,
    )

    t = str(tmp_path / "t")
    base = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey", "c_acctbal"
    )
    snapshot_commit(base, t)
    with _pytest.raises(ValueError, match="not in the table schema"):
        drop_column(t, "nope")

    add_constraint(spark, t, "bal_floor", "c_acctbal > -10000")
    with _pytest.raises(ValueError, match="bal_floor"):
        drop_column(t, "c_acctbal")

    keys = spark.createDataFrame([(3,)], "c_nationkey int")
    delete_by_key(spark, t, keys, "c_nationkey")
    with _pytest.raises(ValueError, match="equality-delete"):
        drop_column(t, "c_nationkey")
    compact_snapshot(spark, t)  # materialize the entry

    set_bloom_columns(spark, t, ["c_custkey", "c_nationkey"])
    set_ndv_columns(spark, t, ["c_nationkey"])
    snapshot_commit(base.limit(3), t)  # build sketches for new files
    drop_column(t, "c_nationkey")
    m = _read_manifest(t, latest_version(t))
    assert m["bloom_cols"] == ["c_custkey"]
    assert "ndv_cols" not in m  # emptied list clears the declaration

    legacy = str(tmp_path / "legacy")
    snapshot_commit(base, legacy)
    mp = _manifest_path(legacy, 0)
    with open(mp) as f:
        lm = _json.load(f)
    lm.pop("schema", None)
    with open(mp, "w") as f:
        _json.dump(lm, f)
    with _pytest.raises(ValueError, match="declared table schema"):
        drop_column(legacy, "c_acctbal")


def test_drop_column_restore_clears_tombstone(spark, sf_dir, tmp_path):
    """RESTORE to a pre-drop version brings the column back and clears
    its tombstone — appends may carry it again."""
    from reactivestreams_kinesis_spark.operators.snapshots import (
        drop_column,
        restore_snapshot,
    )

    t = str(tmp_path / "t")
    base = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey", "c_acctbal"
    )
    snapshot_commit(base, t)                                         # v0
    drop_column(t, "c_acctbal")                                      # v1
    restore_snapshot(t, 0)                                           # v2
    got = read_snapshot(spark, t)
    assert got.columns == ["c_custkey", "c_nationkey", "c_acctbal"]
    assert got.count() == base.count()
    snapshot_commit(base.limit(2), t)  # re-adding is legal again
    assert read_snapshot(spark, t).count() == base.count() + 2


def test_change_feed_projects_ending_schema_across_drop(spark, sf_dir, tmp_path):
    """A feed range spanning a DROP returns the ENDING schema: earlier
    inserts lose the dropped column; the replay invariant holds on the
    surviving columns."""
    from reactivestreams_kinesis_spark.operators.snapshots import (
        drop_column,
        snapshot_change_feed,
    )

    t = str(tmp_path / "t")
    base = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey", "c_acctbal"
    )
    snapshot_commit(base, t)                                          # v0
    extra = base.limit(10).select(
        (F.col("c_custkey") + 700000).alias("c_custkey"),
        "c_nationkey",
        "c_acctbal",
    )
    snapshot_commit(extra, t)                                         # v1
    drop_column(t, "c_acctbal")                                       # v2
    late = base.limit(5).select(
        (F.col("c_custkey") + 800000).alias("c_custkey"), "c_nationkey"
    )
    snapshot_commit(late, t)                                          # v3
    feed = snapshot_change_feed(spark, t, from_version=0)
    assert feed.columns == [
        "c_custkey", "c_nationkey", "_change_type", "_commit_version",
    ]
    assert feed.count() == 15
    replayed = (
        read_snapshot(spark, t, 0)
        .select("c_custkey", "c_nationkey")
        .unionByName(feed.drop("_change_type", "_commit_version"))
    )
    tip = read_snapshot(spark, t)
    assert replayed.exceptAll(tip).count() == 0
    assert tip.exceptAll(replayed).count() == 0


def test_add_column_metadata_only(spark, sf_dir, tmp_path):
    """Explicit ADD COLUMN: one manifest write; existing files read NULL
    for the new column; the next append may fill it; a dropped name
    refuses; duplicates refuse."""
    import pytest as _pytest

    from reactivestreams_kinesis_spark.operators.snapshots import (
        add_column,
        drop_column,
    )

    t = str(tmp_path / "t")
    base = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey"
    )
    snapshot_commit(base, t)                                         # v0
    assert add_column(t, "c_tier", "string") == 1                    # v1
    cur = read_snapshot(spark, t)
    assert cur.columns == ["c_custkey", "c_nationkey", "c_tier"]
    assert cur.filter(F.col("c_tier").isNotNull()).count() == 0
    snapshot_commit(
        base.limit(3).withColumn("c_tier", F.lit("gold")), t
    )                                                                # v2
    got = read_snapshot(spark, t)
    assert got.filter("c_tier = 'gold'").count() == 3
    assert got.filter(F.col("c_tier").isNull()).count() == base.count()
    with _pytest.raises(ValueError, match="already exists"):
        add_column(t, "c_tier", "string")
    drop_column(t, "c_nationkey")
    # re-adding a dropped name is legal: physical mapping mints a fresh
    # physical, so every pre-drop file reads NULL, never the old bytes
    from reactivestreams_kinesis_spark.operators.snapshots import (
        _read_manifest as _rm,
        latest_version as _lv,
    )

    add_column(t, "c_nationkey", "int")
    m = _rm(t, _lv(t))
    assert m["phys"]["c_nationkey"] != "c_nationkey"
    readd = read_snapshot(spark, t)
    assert readd.filter(F.col("c_nationkey").isNotNull()).count() == 0
    # txn replay no-ops
    v = add_column(t, "c_extra", "double", txn_id="add-x")
    assert add_column(t, "c_extra2", "double", txn_id="add-x") == v


def test_full_overwrite_clears_drop_tombstone(spark, sf_dir, tmp_path):
    """A FULL overwrite references no pre-drop files, so reintroducing a
    dropped name clears its tombstone and resets the physical mapping to
    identity — the new files own every value. A CoW rewrite (base_files
    retained) must NOT clear the tombstone, and any later re-add keeps
    minting a fresh physical name."""
    from reactivestreams_kinesis_spark.operators.snapshots import (
        drop_column,
        update_where,
    )

    t = str(tmp_path / "t")
    base = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey", "c_acctbal"
    )
    snapshot_commit(base, t)                                         # v0
    drop_column(t, "c_acctbal")                                      # v1

    # full overwrite reintroducing the name: tombstone clears, identity map
    fresh = base.withColumn("c_acctbal", F.lit(7.0))
    snapshot_commit(fresh, t, mode="overwrite")                      # v2
    m = _read_manifest(t, latest_version(t))
    assert not m.get("dropped_cols"), "tombstone cleared by full overwrite"
    assert not m.get("phys"), "full overwrite resets mapping to identity"
    got = read_snapshot(spark, t)
    assert got.filter("c_acctbal = 7.0").count() == base.count()

    # appends of the column are normal again after the clear
    snapshot_commit(fresh.limit(2), t)                               # v3
    assert read_snapshot(spark, t).count() == base.count() + 2

    # CoW rewrite keeps the guard: drop again, then a targeted update
    # (which retains base_files) must not clear the tombstone
    drop_column(t, "c_acctbal")                                      # v4
    update_where(
        spark, t, [("c_custkey", "<=", 10)], {"c_nationkey": F.lit(1)}
    )                                                                # v5
    m5 = _read_manifest(t, latest_version(t))
    assert m5.get("dropped_cols") == ["c_acctbal"]
    # a re-add via append now mints a fresh physical: pre-drop/rewrite
    # files read NULL for it, the appended row keeps its value
    snapshot_commit(fresh.limit(1), t)                               # v6
    m6 = _read_manifest(t, latest_version(t))
    assert m6["phys"]["c_acctbal"] != "c_acctbal"
    assert m6["dropped_cols"] == ["c_acctbal"]
    cur = read_snapshot(spark, t)
    assert cur.filter(F.col("c_acctbal").isNotNull()).count() == 1


# ---- randomized model check over schema-evolution histories ----

from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

_COL_POOL = ("a", "b", "c", "d")
_SCHEMA_OP = st.one_of(
    st.tuples(st.just("append"), st.integers(1, 3)),
    st.tuples(st.just("add"), st.sampled_from(_COL_POOL)),
    st.tuples(st.just("drop"), st.sampled_from(_COL_POOL)),
    st.tuples(
        st.just("rename"),
        st.tuples(st.sampled_from(_COL_POOL), st.sampled_from(_COL_POOL)),
    ),
    st.tuples(st.just("widen"), st.sampled_from(_COL_POOL)),
)


@given(ops=st.lists(_SCHEMA_OP, min_size=1, max_size=6))
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
def test_schema_evolution_history_matches_model(spark, tmp_path_factory, ops):
    """Any interleaving of appends, explicit ADD COLUMNs, DROP COLUMNs
    and RENAME COLUMNs must read back exactly what a pure-Python model
    holds: declared column order, NULL padding for pre-add rows, dropped
    columns gone everywhere, re-adds of a dropped name reading NULL for
    every pre-re-add row (fresh physical — never resurrected bytes),
    renamed columns carrying their values under the new name, and
    WIDENED columns (int→bigint) reading every era's files exactly —
    the randomized sweep over evolution interactions."""
    import uuid as _uuid

    from reactivestreams_kinesis_spark.operators.snapshots import (
        add_column,
        drop_column,
        read_snapshot,
        rename_column,
        snapshot_commit,
    )

    t = str(tmp_path_factory.mktemp("schprop") / f"t_{_uuid.uuid4().hex[:6]}")
    declared = ["uid", "a"]          # uid is never in the op pool
    col_types = {"uid": "int", "a": "int"}
    model: list[dict] = []
    uid = 0

    def commit_rows(n):
        nonlocal uid
        rows = []
        for _ in range(n):
            row = {c: uid * 10 + i for i, c in enumerate(declared)}
            row["uid"] = uid
            rows.append(row)
            uid += 1
        schema = ", ".join(f"{c} {col_types[c]}" for c in declared)
        snapshot_commit(
            spark.createDataFrame(
                [tuple(r[c] for c in declared) for r in rows], schema
            ),
            t,
        )
        model.extend(rows)

    commit_rows(2)
    for kind, arg in ops:
        if kind == "append":
            commit_rows(arg)
        elif kind == "widen":
            if arg in declared and col_types[arg] == "int":
                # an append carrying the column as bigint widens the
                # declared type; files from both eras keep reading
                col_types[arg] = "bigint"
                commit_rows(1)
        elif kind == "add":
            if arg in declared:
                import pytest as _pytest

                with _pytest.raises(ValueError):
                    add_column(t, arg, "bigint")
            else:
                # legal even for previously dropped names: the fresh
                # physical means every existing row reads NULL
                add_column(t, arg, "bigint")
                declared.append(arg)
                col_types[arg] = "bigint"
                for r in model:
                    r[arg] = None
        elif kind == "drop":
            if arg not in declared:
                import pytest as _pytest

                with _pytest.raises(ValueError):
                    drop_column(t, arg)
            else:
                drop_column(t, arg)
                declared.remove(arg)
                col_types.pop(arg, None)
                for r in model:
                    r.pop(arg, None)
        elif kind == "rename":
            old, new = arg
            if old not in declared or new in declared:
                import pytest as _pytest

                with _pytest.raises(ValueError):
                    rename_column(t, old, new)
            else:
                rename_column(t, old, new)
                declared[declared.index(old)] = new
                col_types[new] = col_types.pop(old)
                for r in model:
                    r[new] = r.pop(old, None)

    got = read_snapshot(spark, t)
    assert got.columns == declared
    got_rows = sorted(
        tuple(r[c] for c in declared) for r in got.collect()
    )
    want_rows = sorted(tuple(r.get(c) for c in declared) for r in model)
    assert got_rows == want_rows


def test_drop_constraint(spark, sf_dir, tmp_path):
    """ALTER TABLE DROP CONSTRAINT: the remaining rules keep enforcing,
    the dropped one stops, unknown names raise, and dropping a
    column's referencing constraint unblocks drop_column (the loop the
    guard's error message prescribes)."""
    import pytest as _pytest

    from reactivestreams_kinesis_spark.operators.snapshots import (
        add_constraint,
        drop_column,
        drop_constraint,
    )

    t = str(tmp_path / "t")
    base = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey", "c_acctbal"
    )
    snapshot_commit(base, t)
    add_constraint(spark, t, "bal_floor", "c_acctbal > -100000")
    add_constraint(spark, t, "key_pos", "c_custkey >= 0")  # fixture keys start at 0
    bad_bal = spark.createDataFrame(
        [(999999, 1, -999999.0)],
        "c_custkey bigint, c_nationkey int, c_acctbal double",
    )
    with _pytest.raises(ValueError, match="bal_floor"):
        snapshot_commit(bad_bal, t)
    with _pytest.raises(ValueError, match="no CHECK constraint named"):
        drop_constraint(t, "nope")
    drop_constraint(t, "bal_floor")
    snapshot_commit(bad_bal, t)  # the dropped rule no longer blocks
    with _pytest.raises(ValueError, match="key_pos"):
        snapshot_commit(
            spark.createDataFrame(
                [(-1, 1, 0.0)],
                "c_custkey bigint, c_nationkey int, c_acctbal double",
            ),
            t,
        )  # the kept rule still enforces (c_custkey = -1 < 0)
    # the drop_column guard's prescribed workflow now completes
    add_constraint(spark, t, "bal_floor2", "c_acctbal > -10000000")
    with _pytest.raises(ValueError, match="bal_floor2"):
        drop_column(t, "c_acctbal")
    drop_constraint(t, "bal_floor2")
    drop_column(t, "c_acctbal")
    assert read_snapshot(spark, t).columns == ["c_custkey", "c_nationkey"]


def test_snapshot_merge_upsert_composite_key(spark, tmp_path):
    """merge_upsert over a COMPOSITE equality key (round 12): matched
    TUPLES update, unmatched tuples insert, delete-flagged tuples
    vanish; a row sharing only ONE key column with an update is
    untouched; untouched files survive verbatim; the duplicate-tuple
    guard fires on repeated tuples (while repeated single-column values
    across distinct tuples are legal); MoR strategy lands the same
    state via equality-delete + append."""
    import pytest as _pytest

    from reactivestreams_kinesis_spark.operators.snapshots import (
        _read_manifest,
        merge_upsert,
    )

    base = [(a, b, a * 10 + b) for a in range(4) for b in range(3)]
    mk = lambda rows, s="a int, b int, x int": spark.createDataFrame(rows, s)

    for strategy in ("copy_on_write", "merge_on_read"):
        t = str(tmp_path / f"cmk_{strategy}")
        snapshot_commit(mk(base).repartitionByRange(4, "a"), t)
        updates = mk(
            [
                (0, 0, 999, False),   # update tuple (0,0)
                (0, 9, 90, False),    # insert: a=0 exists, (0,9) doesn't
                (3, 2, None, True),   # delete tuple (3,2)
            ],
            "a int, b int, x int, _del boolean",
        )
        merge_upsert(
            spark, t, updates, ["a", "b"], delete_col="_del", strategy=strategy
        )
        got = {(r["a"], r["b"]): r["x"] for r in read_snapshot(spark, t).collect()}
        assert got[(0, 0)] == 999
        assert got[(0, 9)] == 90
        assert (3, 2) not in got
        assert got[(0, 1)] == 1 and got[(3, 1)] == 31  # shared-column rows untouched
        assert len(got) == len(base) - 1 + 1

    # COW file granularity: only the range files owning a matched tuple rewrite
    t = str(tmp_path / "cmk_files")
    snapshot_commit(mk(base).repartitionByRange(4, "a"), t)
    files_v0 = _read_manifest(t, 0)["files"]
    merge_upsert(spark, t, mk([(0, 0, 7)]), ["a", "b"])
    files_v1 = set(_read_manifest(t, 1)["files"])
    assert len([f for f in files_v0 if f in files_v1]) == len(files_v0) - 1

    # duplicate TUPLE refuses; duplicate single-column values don't
    with _pytest.raises(ValueError, match="duplicated"):
        merge_upsert(spark, t, mk([(1, 1, 1), (1, 1, 2)]), ["a", "b"])
    merge_upsert(spark, t, mk([(1, 1, 1), (1, 2, 2)]), ["a", "b"])
    got = {(r["a"], r["b"]): r["x"] for r in read_snapshot(spark, t).collect()}
    assert got[(1, 1)] == 1 and got[(1, 2)] == 2


def test_plan_construction_fires_no_jobs_with_pending_deletes(spark, tmp_path):
    """Building a read plan over a table with pending position AND
    equality deletes must not run any Spark job: the DV and key-file
    schemas are declared (fixed shape / pyarrow footer), never inferred.
    Regression pin for the round-12 optimization — inference fired one
    footer-reading job per delete artifact per plan construction, on
    every read path of every table with pending deletes."""
    from reactivestreams_kinesis_spark.operators.snapshots import (
        delete_by_key,
        delete_where,
    )

    t = str(tmp_path / "nojobs")
    df = spark.range(0, 100).selectExpr("id AS k", "id * 2 AS v")
    snapshot_commit(df, t)
    delete_where(spark, t, [("k", "<", 5)], strategy="merge_on_read")
    delete_by_key(spark, t, spark.createDataFrame([(7,)], "k bigint"), "k")

    tracker = spark.sparkContext.statusTracker()
    before = len(tracker.getJobIdsForGroup(None))
    plan = read_snapshot(spark, t)  # plan only — no action
    plan.schema  # force analysis too
    assert len(tracker.getJobIdsForGroup(None)) == before
    # and the plan still answers correctly once executed
    got = sorted(r["k"] for r in plan.collect())
    assert got == [k for k in range(5, 100) if k != 7]


def test_dir_tiled_scan_paths(spark, tmp_path):
    """Round-12 optimization pin: a read whose file set exactly tiles its
    commit directories hands the scan the DIR paths — read planning then
    costs one LIST per commit instead of one stat per file, and a
    many-file table stays under the 32-path parallel-listing threshold,
    so plan construction fires ZERO jobs even when the table holds more
    files than spark.sql.sources.parallelPartitionDiscovery.threshold.
    A dir partially rewritten by DML falls back to exact file paths —
    the dead files still on disk must not leak into the scan."""
    from reactivestreams_kinesis_spark.operators.snapshots import (
        _read_manifest,
        _tiled_data_paths,
        delete_where,
    )

    t = str(tmp_path / "tiled")
    snapshot_commit(
        spark.range(0, 400)
        .selectExpr("id AS k", "id * 2 AS v")
        .repartitionByRange(40, "k"),
        t,
    )
    m = _read_manifest(t, latest_version(t))
    assert len(m["files"]) == 40
    paths = _tiled_data_paths(t, m, m["files"])
    assert len(paths) == 1 and paths[0].endswith(m["files"][0].split("/")[0])

    tracker = spark.sparkContext.statusTracker()
    before = len(tracker.getJobIdsForGroup(None))
    plan = read_snapshot(spark, t)
    plan.schema
    assert len(tracker.getJobIdsForGroup(None)) == before, (
        "plan construction over a 40-file table must not fire the "
        "parallel-listing job once the scan is handed the commit dir"
    )
    assert sorted(r["k"] for r in plan.collect()) == list(range(400))

    # CoW delete rewrites the targeted files into a new dir; the old
    # dir keeps its dead files on disk, so it no longer tiles and those
    # manifest files must stay exact file paths
    delete_where(spark, t, [("k", "<", 10)])
    m2 = _read_manifest(t, latest_version(t))
    old_dir = m["files"][0].split("/")[0]
    survivors_in_old = [f for f in m2["files"] if f.startswith(old_dir + "/")]
    assert survivors_in_old and len(survivors_in_old) < 40
    paths2 = _tiled_data_paths(t, m2, m2["files"])
    assert all(not p.endswith(old_dir) for p in paths2), (
        "a partially rewritten dir must not collapse to its dir path"
    )
    assert sorted(r["k"] for r in read_snapshot(spark, t).collect()) == list(
        range(10, 400)
    )


def test_merge_upsert_precomputed_stats_parity(spark, tmp_path):
    """merge_upsert with caller-supplied stats commits the identical
    state as the self-computed stats path (same prune decisions on a
    range-clustered table), and the duplicate-key guard still fires on
    a precomputed rows > n."""
    import pytest as _pytest

    from reactivestreams_kinesis_spark.operators.snapshots import merge_upsert

    base = spark.range(0, 200).selectExpr("id AS k", "CAST(id AS DOUBLE) AS v")
    upd = spark.createDataFrame([(3, -1.0), (150, -2.0)], "k bigint, v double")
    stats = {"rows": 2, "n": 2, "lo0": 3, "hi0": 150}

    results = {}
    for label, kw in (
        ("computed", {}),
        ("precomputed", {"precomputed_stats": stats}),
    ):
        t = str(tmp_path / f"ps_{label}")
        snapshot_commit(base.repartitionByRange(4, "k"), t)
        merge_upsert(spark, t, upd, "k", **kw)
        results[label] = {
            "rows": sorted(
                (r["k"], r["v"]) for r in read_snapshot(spark, t).collect()
            ),
            "untouched": len(
                set(_read_manifest(t, 0)["files"])
                & set(_read_manifest(t, 1)["files"])
            ),
        }
    assert results["computed"] == results["precomputed"]

    t = str(tmp_path / "ps_dup")
    snapshot_commit(base, t)
    with _pytest.raises(ValueError, match="duplicated"):
        merge_upsert(
            spark, t, upd, "k",
            precomputed_stats={"rows": 3, "n": 2, "lo0": 3, "hi0": 150},
        )


def test_plain_session_shuffle_sizing_uses_session_parallelism(spark):
    """A plain session still at the 200 default gets its shuffle
    partitions sized to the SESSION's parallelism (defaultParallelism,
    i.e. the local[N] core count) — not the box's cpu count. Streaming
    state-store partitioning locks to this value at the first
    micro-batch and is exempt from AQE coalescing, so a local[8] driver
    session on a 32-cpu box was paying 4x the state files per drain."""
    from reactivestreams_kinesis_spark.catalog import _ensure_session_confs

    key = "spark.sql.shuffle.partitions"
    old = spark.conf.get(key)
    try:
        spark.conf.set(key, "200")
        _ensure_session_confs(spark)
        expect = max(spark.sparkContext.defaultParallelism, 8)
        assert spark.conf.get(key) == str(expect)
        # an explicit non-200 value is never overridden
        spark.conf.set(key, "12")
        _ensure_session_confs(spark)
        assert spark.conf.get(key) == "12"
    finally:
        spark.conf.set(key, old)


def test_constraint_validation_rides_the_write_job(spark, tmp_path):
    """CHECK validation on commit must not re-read the staged files: the
    violation counters ride the write job as an Observation, so a
    constrained commit fires exactly as many Spark jobs as the identical
    unconstrained commit — on the append path AND the rewrite
    (merge_upsert copy-on-write) path. A violating frame still fails the
    commit through the observed counters, leaving the table untouched.
    Regression pin for the round-12 optimization: the staged-read
    validation was a second full pass over every committed byte, paid by
    every commit to a constrained table (every MV refresh pays it via
    mv_live_groups)."""
    import uuid as _uuid

    import pytest as _pytest

    from reactivestreams_kinesis_spark.operators.snapshots import (
        add_constraint,
        merge_upsert,
    )

    tracker = spark.sparkContext.statusTracker()

    def jobs_for(fn):
        # count inside a dedicated job group: the UI store retains only
        # ~1000 finished jobs, so default-group before/after deltas
        # under-count late in a long shared-session suite (this test
        # flaked exactly that way in the full run)
        gid = f"jobcount-{_uuid.uuid4().hex[:8]}"
        sc = spark.sparkContext
        sc.setJobGroup(gid, "job-count probe")
        try:
            fn()
        finally:
            sc.setLocalProperty("spark.jobGroup.id", None)
        return len(tracker.getJobIdsForGroup(gid))

    def build(name, constrained):
        t = str(tmp_path / name)
        snapshot_commit(
            spark.range(0, 100).selectExpr("id AS k", "id * 2 AS v"), t
        )
        if constrained:
            add_constraint(spark, t, "v_nonneg", "v >= 0")
        return t

    plain, checked = build("plain", False), build("checked", True)
    appender = spark.range(100, 200).selectExpr("id AS k", "id * 2 AS v")
    append_plain = jobs_for(lambda: snapshot_commit(appender, plain))
    append_checked = jobs_for(lambda: snapshot_commit(appender, checked))
    assert append_checked == append_plain

    upd = spark.createDataFrame([(3, 7), (50, 9)], "k bigint, v bigint")
    mu_plain = jobs_for(lambda: merge_upsert(spark, plain, upd, "k"))
    mu_checked = jobs_for(lambda: merge_upsert(spark, checked, upd, "k"))
    assert mu_checked == mu_plain

    # the observed counters still refuse a violating commit pre-publish
    tip = latest_version(checked)
    bad = spark.createDataFrame([(500, -1)], "k bigint, v bigint")
    with _pytest.raises(ValueError, match="CHECK constraint violation"):
        snapshot_commit(bad, checked)
    assert latest_version(checked) == tip
    got = {r["k"]: r["v"] for r in read_snapshot(spark, checked).collect()}
    assert got[3] == 7 and got[50] == 9 and 500 not in got


def test_stacked_equality_deletes_coalesce_into_one_antijoin(spark, tmp_path):
    """Round-12 optimization pin: K equality-delete commits with the same
    key column and the same effective scope apply as ONE anti-join over
    their unioned key sets (subtractive applications commute), with the
    key files read in ONE scan — not K chained anti-joins over K scans.
    An append BETWEEN deletes splits the scope: the re-inserted key stays
    visible (the semantics the scope exists for) and the plan carries one
    anti-join per scope group."""
    from reactivestreams_kinesis_spark.operators.snapshots import (
        delete_by_key,
    )
    from reactivestreams_kinesis_spark.plans.inspect import explain_string

    t = str(tmp_path / "eqstack")
    snapshot_commit(
        spark.range(0, 1000).selectExpr("id AS k", "id * 2 AS v"), t
    )
    for i in range(5):
        delete_by_key(
            spark,
            t,
            spark.createDataFrame([(i,), (i + 100,)], "k bigint"),
            "k",
        )
    df = read_snapshot(spark, t)
    plan = explain_string(df, "simple")
    assert plan.count("LeftAnti") == 1, plan
    gone = {i for i in range(5)} | {i + 100 for i in range(5)}
    assert {r["k"] for r in df.collect()} == set(range(1000)) - gone

    # append re-inserting a deleted key, then another delete: two scope
    # groups, and the re-inserted row survives the earlier entries
    snapshot_commit(
        spark.createDataFrame([(0, -1)], "k bigint, v bigint"),
        t,
        mode="append",
    )
    delete_by_key(
        spark, t, spark.createDataFrame([(999,)], "k bigint"), "k"
    )
    df2 = read_snapshot(spark, t)
    plan2 = explain_string(df2, "simple")
    assert plan2.count("LeftAnti") == 2, plan2
    rows = {(r["k"], r["v"]) for r in df2.collect()}
    assert (0, -1) in rows and (0, 0) not in rows
    assert not any(k == 999 for k, _v in rows)
    assert len(rows) == 1000 - len(gone) - 1 + 1


def test_eq_delete_key_schema_recorded_skips_footer_read(
    spark, tmp_path, monkeypatch
):
    """Round-12 optimization pin: ``delete_by_key`` records the exact
    struct of the key files it wrote in the manifest entry
    (``key_schema``), so every later plan build declares it instead of
    re-reading a key-file footer per pending entry (at 100 TB: one
    object-store round trip per entry per plan build, on every read of
    a table with pending equality deletes). Entries without the field
    (older manifests) still fall back to the footer, with identical
    results."""
    import json as _json

    import pyarrow.parquet as pq
    from pyspark.sql.pandas.types import from_arrow_schema
    from pyspark.sql.types import StructType

    from reactivestreams_kinesis_spark.operators.snapshots import (
        _manifest_path,
        _read_manifest,
        delete_by_key,
    )

    t = str(tmp_path / "eqschema")
    snapshot_commit(
        spark.range(0, 100).selectExpr("id AS k", "CAST(id AS int) AS v"), t
    )
    delete_by_key(
        spark, t, spark.createDataFrame([(3,), (7,)], "k bigint"), "k"
    )
    tip = latest_version(t)
    entry = _read_manifest(t, tip)["eq_deletes"][0]
    recorded = StructType.fromJson(entry["key_schema"])
    footer = from_arrow_schema(
        pq.read_schema(os.path.join(t, entry["delete_files"][0]))
    )
    assert [(f.name, f.dataType) for f in recorded.fields] == [
        (f.name, f.dataType) for f in footer.fields
    ]

    calls: list = []
    real = pq.read_schema
    monkeypatch.setattr(
        pq,
        "read_schema",
        lambda *a, **kw: (calls.append(a), real(*a, **kw))[1],
    )
    df = read_snapshot(spark, t)
    assert calls == [], "plan build must not read key-file footers"
    assert {r["k"] for r in df.collect()} == set(range(100)) - {3, 7}

    # legacy manifest without the field: the footer fallback fires once
    # and the rows are identical
    mp = _manifest_path(t, tip)
    with open(mp) as f:
        m = _json.load(f)
    m["eq_deletes"][0].pop("key_schema")
    with open(mp, "w") as f:
        _json.dump(m, f)
    df2 = read_snapshot(spark, t)
    assert len(calls) >= 1
    assert {r["k"] for r in df2.collect()} == set(range(100)) - {3, 7}


def test_widened_table_constraint_validates_under_table_types(spark, tmp_path):
    """The in-write Observation validation (round 12) must not evaluate a
    constraint under an append frame's NARROWER types: after widening
    `v` int→long, `v * 2000000000 >= 0` overflows in int arithmetic but
    not in long — under ANSI the observed write job would die with
    ARITHMETIC_OVERFLOW, non-ANSI it wraps negative (v=2) and raises a
    spurious violation; either way a commit the table-schema validation
    accepts would be refused. The type gate in `_constraint_observation`
    detects the df/table type mismatch and falls back to the
    table-schema staged read, which promotes the narrow frame to the
    declared long before evaluating — so the append commits, exactly as
    it did before the optimization."""
    from reactivestreams_kinesis_spark.operators.snapshots import (
        add_constraint,
        alter_column_type,
    )

    t = str(tmp_path / "widechk")
    snapshot_commit(
        spark.range(0, 10).selectExpr(
            "CAST(id AS int) AS k", "CAST(id AS int) AS v"
        ),
        t,
    )
    alter_column_type(t, "v", "bigint")
    add_constraint(spark, t, "v_big_ok", "v * 2000000000 >= 0")

    # int frame: 2 * 2000000000 overflows int (raises under ANSI, wraps
    # negative without) but is a plain positive long under the table type
    narrow = spark.createDataFrame([(100, 2)], "k int, v int")
    v = snapshot_commit(narrow, t, mode="append")
    assert v == latest_version(t)
    got = {(r["k"], r["v"]) for r in read_snapshot(spark, t).collect()}
    assert (100, 2) in got

    # a long frame (matching the table types) still validates in-stream
    # and still refuses a real violation
    import pytest as _pytest

    with _pytest.raises(ValueError, match="CHECK constraint violation"):
        snapshot_commit(
            spark.createDataFrame([(101, -5)], "k int, v bigint"),
            t,
            mode="append",
        )
    assert (101, -5) not in {
        (r["k"], r["v"]) for r in read_snapshot(spark, t).collect()
    }


def test_manifest_cache_parse_once_and_rewrite_invalidation(spark, tmp_path):
    """The parsed-manifest cache (stat-validated): a repeat read of the
    same version parses zero JSON, and an out-of-band in-place rewrite
    (the legacy-manifest simulation some tests do) is picked up because
    the (mtime_ns, size) key changes."""
    import json as _json

    from reactivestreams_kinesis_spark.operators import snapshots as S

    t = str(tmp_path / "t")
    snapshot_commit(
        spark.range(0, 10).selectExpr("id AS k", "id * 2 AS v"), t
    )

    parses = {"n": 0}
    real = S.json

    class CountingJson:
        def load(self, f):
            parses["n"] += 1
            return _json.load(f)

        def __getattr__(self, a):
            return getattr(_json, a)

    S.json = CountingJson()
    try:
        m1 = _read_manifest(t, 0)
        first = parses["n"]  # 0 if the commit already cached it, else 1
        m2 = _read_manifest(t, 0)
        assert parses["n"] == first, "repeat read must not re-parse"
        assert m2 is m1

        # out-of-band rewrite (tests simulate legacy manifests this way):
        # the stat key must miss and the NEW content must be returned
        mp = S._manifest_path(t, 0)
        with open(mp) as f:
            raw = _json.load(f)
        raw["op"] = "append-rewritten"
        with open(mp, "w") as f:
            _json.dump(raw, f)
        m3 = _read_manifest(t, 0)
        assert m3["op"] == "append-rewritten"
        assert parses["n"] == first + 1
    finally:
        S.json = real


def test_manifest_cache_never_observes_mutation(spark, tmp_path):
    """Every consumer treats a parsed manifest as read-only (they copy
    before mutating). Run the DML battery over one table and, after each
    operation, compare EVERY cached manifest bytes-for-bytes against a
    fresh parse of its file — any in-place mutation of a shared cached
    dict fails here."""
    import json as _json

    from reactivestreams_kinesis_spark.operators import snapshots as S
    from reactivestreams_kinesis_spark.operators.snapshots import (
        delete_by_key,
        delete_where,
        merge_upsert,
        snapshot_change_feed,
    )

    t = str(tmp_path / "t")

    def assert_cache_clean(label):
        for path, (_mt, _sz, cached) in list(S._MANIFEST_CACHE.items()):
            if not path.startswith(t):
                continue
            with open(path) as f:
                disk = _json.load(f)
            assert cached == disk, f"cached manifest mutated after {label}: {path}"

    df = spark.range(0, 100).selectExpr(
        "CAST(id AS int) AS k", "CAST(id % 7 AS int) AS v"
    )
    snapshot_commit(df, t)
    assert_cache_clean("initial commit")
    snapshot_commit(
        spark.range(100, 200).selectExpr(
            "CAST(id AS int) AS k", "CAST(id % 7 AS int) AS v"
        ),
        t,
        mode="append",
    )
    assert_cache_clean("append")
    delete_by_key(
        spark, t, spark.createDataFrame([(3,), (7,)], "k int"), "k"
    )
    assert_cache_clean("delete_by_key")
    delete_where(spark, t, [("v", "<", 1)], strategy="merge_on_read")
    assert_cache_clean("delete_where merge_on_read")
    merge_upsert(
        spark,
        t,
        spark.createDataFrame([(5, 99), (500, 1)], "k int, v int"),
        "k",
    )
    assert_cache_clean("merge_upsert")
    compact_snapshot(spark, t, target_file_bytes=1 << 40)
    assert_cache_clean("compact")
    tip = latest_version(t)
    snapshot_change_feed(spark, t, from_version=1, to_version=tip).collect()
    assert_cache_clean("change_feed")
    read_snapshot(spark, t).collect()
    assert_cache_clean("read")
