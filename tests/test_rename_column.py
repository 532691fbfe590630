"""RENAME COLUMN via physical column mapping (round 10).

Contract under test (Delta column-mapping / Iceberg field-id parity,
reduced to the manifest primitives):
- rename is METADATA-ONLY: no data file changes, reads surface the new
  logical name with the same values; time travel shows each version
  under its own names;
- physical names are immutable: per-file stats/blooms/NDV sketches and
  pending equality-delete keys keep applying exactly across a rename;
- predicates on the renamed column still PRUNE (stats key on physical);
- the change feed crosses a mid-range rename by physical identity
  (pre-rename rows surface under the ending name);
- the snapshot_table source (batch, pushdown, streaming, CDF) reads
  renamed tables correctly;
- re-add-after-drop is LEGAL and mints a fresh physical (NULL reads,
  never resurrected bytes) — the tombstone refusal this replaces;
- guards: rename to an existing name, of a missing name, or of a
  constraint-referenced column refuse.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from reactivestreams_kinesis_spark.catalog import load_table
from reactivestreams_kinesis_spark.operators.snapshots import (
    _read_manifest,
    add_column,
    approx_distinct_count,
    delete_by_key,
    delete_where,
    drop_column,
    latest_version,
    merge_upsert,
    prune_files,
    read_snapshot,
    rename_column,
    restore_snapshot,
    scan_snapshot,
    set_bloom_columns,
    set_ndv_columns,
    snapshot_change_feed,
    snapshot_commit,
    table_stats_summary,
    update_where,
)
from reactivestreams_kinesis_spark.sources.snapshot_source import (
    register_snapshot_source,
)


def _base(spark, sf_dir):
    return load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey", "c_acctbal"
    )


def test_rename_metadata_only_and_time_travel(spark, sf_dir, tmp_path):
    t = str(tmp_path / "t")
    base = _base(spark, sf_dir)
    snapshot_commit(base.repartitionByRange(4, "c_custkey"), t)      # v0
    files_v0 = _read_manifest(t, 0)["files"]
    v = rename_column(t, "c_acctbal", "balance")                     # v1
    assert v == 1
    m = _read_manifest(t, 1)
    assert m["files"] == files_v0, "rename rewrites no data file"
    assert m["phys"] == {"balance": "c_acctbal"}

    cur = read_snapshot(spark, t)
    assert cur.columns == ["c_custkey", "c_nationkey", "balance"]
    want = base.withColumnRenamed("c_acctbal", "balance")
    assert cur.subtract(want).count() == 0 and want.subtract(cur).count() == 0
    # time travel: v0 reads its own (pre-rename) names
    assert read_snapshot(spark, t, 0).columns == [
        "c_custkey", "c_nationkey", "c_acctbal",
    ]

    # appends after the rename use the NEW name; files share the physical
    snapshot_commit(want.limit(5), t)                                # v2
    assert read_snapshot(spark, t).count() == base.count() + 5
    # the appended file physically holds c_acctbal (the immutable name)
    import pyarrow.parquet as pq

    m2 = _read_manifest(t, 2)
    new_file = [f for f in m2["files"] if f not in set(files_v0)][0]
    assert "c_acctbal" in pq.read_schema(os.path.join(t, new_file)).names

    # guards
    with pytest.raises(ValueError, match="already exists"):
        rename_column(t, "balance", "c_custkey")
    with pytest.raises(ValueError, match="not in the table schema"):
        rename_column(t, "nope", "x")
    # idempotent txn replay
    v3 = rename_column(t, "balance", "bal2", txn_id="rn-1")
    assert rename_column(t, "balance", "bal3", txn_id="rn-1") == v3
    assert read_snapshot(spark, t).columns == [
        "c_custkey", "c_nationkey", "bal2",
    ]


def test_rename_keeps_pruning_blooms_ndv(spark, sf_dir, tmp_path):
    """Stats/blooms/sketches key on the physical name, so every prune
    and cardinality surface keeps working across the rename, queried
    under the NEW logical name."""
    t = str(tmp_path / "t")
    base = _base(spark, sf_dir)
    snapshot_commit(base.repartitionByRange(4, "c_custkey"), t)      # v0
    set_bloom_columns(spark, t, ["c_custkey"])                       # v1
    set_ndv_columns(spark, t, ["c_nationkey"])                       # v2
    # rewrite so every file carries bloom + sketch
    snapshot_commit(
        read_snapshot(spark, t).repartitionByRange(4, "c_custkey"),
        t,
        mode="overwrite",
    )                                                                # v3
    # overwrite resets mapping; re-declare (physical now identity), then
    # rename and verify everything still answers under the new names
    set_bloom_columns(spark, t, ["c_custkey"])
    set_ndv_columns(spark, t, ["c_nationkey"])
    snapshot_commit(
        read_snapshot(spark, t).repartitionByRange(4, "c_custkey"),
        t,
        mode="overwrite",
    )
    rename_column(t, "c_custkey", "cust_id")
    rename_column(t, "c_nationkey", "nation")
    tip = latest_version(t)
    manifest = _read_manifest(t, tip)

    # range pruning under the new name: a range-partitioned table prunes
    lo = prune_files(manifest, [("cust_id", "<=", 10)])
    assert 0 < len(lo) < len(manifest["files"])
    # scan_snapshot equals filter-after-read, on the renamed column
    got = scan_snapshot(spark, t, [("cust_id", "<=", 10)])
    want = read_snapshot(spark, t).filter("cust_id <= 10")
    assert got.subtract(want).count() == 0 and want.subtract(got).count() == 0

    # NDV under the new name
    n = approx_distinct_count(t, "nation")
    true_n = base.select("c_nationkey").distinct().count()
    assert n is not None and abs(n - true_n) <= max(2, 0.2 * true_n)
    # stats summary reports LOGICAL names
    cols = table_stats_summary(t)["columns"]
    assert "cust_id" in cols and "c_custkey" not in cols


def test_rename_crosses_equality_deletes_and_dml(spark, sf_dir, tmp_path):
    """An equality delete keyed on a column that is RENAMED afterwards
    still applies (keys store physical names); DML after the rename
    targets the new name; a CoW rewrite keeps the mapping."""
    t = str(tmp_path / "t")
    base = _base(spark, sf_dir)
    n_all = base.count()
    snapshot_commit(base.repartitionByRange(4, "c_custkey"), t)      # v0
    keys = spark.createDataFrame([(3,), (7,)], "c_nationkey int")
    delete_by_key(spark, t, keys, "c_nationkey")                     # v1
    n_del = base.filter("c_nationkey IN (3, 7)").count()
    rename_column(t, "c_nationkey", "nation")                        # v2
    cur = read_snapshot(spark, t)
    assert cur.count() == n_all - n_del
    assert cur.filter("nation IN (3, 7)").count() == 0

    # MoR position delete by predicate on the RENAMED balance column
    rename_column(t, "c_acctbal", "balance")                         # v3
    n_neg = cur.filter("c_acctbal < 0").count()
    delete_where(spark, t, [("balance", "<", 0.0)], strategy="merge_on_read")
    cur2 = read_snapshot(spark, t)
    assert cur2.count() == n_all - n_del - n_neg
    assert cur2.filter("balance < 0").count() == 0

    # CoW update on the renamed column; mapping carries through rewrite
    update_where(spark, t, [("c_custkey", "<=", 50)], {"balance": F.lit(1.5)})
    m = _read_manifest(t, latest_version(t))
    assert m["phys"]["balance"] == "c_acctbal"
    assert m["phys"]["nation"] == "c_nationkey"
    got = read_snapshot(spark, t)
    assert got.filter("c_custkey <= 50 AND balance = 1.5").count() == \
        got.filter("c_custkey <= 50").count()

    # merge keyed on the original-named key still works post-renames
    upd = spark.createDataFrame(
        [(1, 99, 42.0)], "c_custkey bigint, nation int, balance double"
    )
    merge_upsert(spark, t, upd, "c_custkey")
    row = read_snapshot(spark, t).filter("c_custkey = 1").collect()
    assert len(row) == 1 and row[0]["nation"] == 99 and row[0]["balance"] == 42.0


def test_change_feed_crosses_midrange_rename(spark, sf_dir, tmp_path):
    """Feed over a range containing a rename surfaces EVERY row —
    pre-rename inserts included — under the ENDING name, and the replay
    invariant holds across the rename."""
    t = str(tmp_path / "t")
    base = _base(spark, sf_dir)
    snapshot_commit(base.repartitionByRange(4, "c_custkey"), t)      # v0
    rename_column(t, "c_acctbal", "balance")                         # v1
    extra = base.limit(10).select(
        (F.col("c_custkey") + 2000000).alias("c_custkey"),
        "c_nationkey",
        F.col("c_acctbal").alias("balance"),
    )
    snapshot_commit(extra, t)                                        # v2
    delete_where(spark, t, [("balance", "<", 0.0)], strategy="merge_on_read")  # v3
    update_where(spark, t, [("c_custkey", "<=", 20)], {"balance": F.lit(9.0)})  # v4

    feed = snapshot_change_feed(spark, t, from_version=0)
    assert feed.columns == [
        "c_custkey", "c_nationkey", "balance", "_change_type", "_commit_version",
    ]
    # v1 (rename) is silent; v2 inserts carry the new name
    assert feed.filter("_commit_version = 1").count() == 0
    ins2 = feed.filter("_commit_version = 2")
    assert ins2.count() == 10
    assert ins2.filter(F.col("balance").isNull()).count() == \
        extra.filter(F.col("balance").isNull()).count()

    # replay invariant across the rename: v0 (renamed) + feed == tip
    start = read_snapshot(spark, t, 0).withColumnRenamed("c_acctbal", "balance")
    adds = feed.filter(
        F.col("_change_type").isin("insert", "update_postimage")
    ).drop("_change_type", "_commit_version")
    rems = feed.filter(
        F.col("_change_type").isin("delete", "update_preimage")
    ).drop("_change_type", "_commit_version")
    replayed = start.unionByName(adds).exceptAll(rems)
    tip_df = read_snapshot(spark, t)
    assert replayed.exceptAll(tip_df).count() == 0
    assert tip_df.exceptAll(replayed).count() == 0


def test_snapshot_source_reads_renamed_table(spark, sf_dir, tmp_path):
    """The custom source surfaces the new logical names on every path:
    batch, opt-in pushdown, streaming, and the batch change feed."""
    register_snapshot_source(spark)
    t = str(tmp_path / "t")
    base = _base(spark, sf_dir)
    snapshot_commit(base.repartitionByRange(4, "c_custkey"), t)      # v0
    rename_column(t, "c_custkey", "cust_id")                         # v1
    rename_column(t, "c_acctbal", "balance")                         # v2
    want = base.withColumnRenamed("c_custkey", "cust_id").withColumnRenamed(
        "c_acctbal", "balance"
    )

    src = spark.read.format("snapshot_table").option("path", t).load()
    assert src.columns == ["cust_id", "c_nationkey", "balance"]
    assert src.subtract(want).count() == 0 and want.subtract(src).count() == 0

    pushed = (
        spark.read.format("snapshot_table")
        .option("path", t)
        .option("filterPushdown", "true")
        .load()
        .filter(F.col("cust_id") > 200)
    )
    wantp = want.filter("cust_id > 200")
    assert pushed.subtract(wantp).count() == 0
    assert wantp.subtract(pushed).count() == 0

    # streaming registered AFTER the rename reads pre-rename files fine
    out = str(tmp_path / "out")
    q = (
        spark.readStream.format("snapshot_table")
        .option("path", t)
        .load()
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(300)
    drained = spark.read.parquet(out)
    assert set(drained.columns) == {"cust_id", "c_nationkey", "balance"}
    assert drained.count() == base.count()

    # an equality delete AFTER the renames (keys named logically) applies
    # through the source's Arrow anti-join path too
    keys = spark.createDataFrame([(5,)], "c_nationkey int")
    delete_by_key(spark, t, keys, "c_nationkey")                     # v3
    src2 = spark.read.format("snapshot_table").option("path", t).load()
    want2 = want.filter("c_nationkey != 5")
    assert src2.subtract(want2).count() == 0
    assert want2.subtract(src2).count() == 0

    # batch CDF across the renames: columns follow the ending schema
    feed = (
        spark.read.format("snapshot_table")
        .option("path", t)
        .option("changeFeed", "true")
        .option("startingVersion", 0)
        .load()
    )
    wantf = snapshot_change_feed(spark, t, from_version=0)
    assert feed.exceptAll(wantf).count() == 0
    assert wantf.exceptAll(feed).count() == 0
    assert "cust_id" in feed.columns and "balance" in feed.columns


def test_rename_then_drop_then_readd_and_rename_to_dropped(spark, sf_dir, tmp_path):
    """The whole evolution composition: rename → drop → re-add the SAME
    name (fresh physical, NULL reads) → rename another column TO the
    dropped name (legal: tombstones guard physical names)."""
    t = str(tmp_path / "t")
    base = _base(spark, sf_dir)
    snapshot_commit(base, t)                                         # v0
    rename_column(t, "c_acctbal", "balance")                         # v1
    drop_column(t, "balance")                                        # v2
    m = _read_manifest(t, 2)
    assert m["dropped_cols"] == ["c_acctbal"], "tombstone is the PHYSICAL name"
    assert "balance" not in (m.get("phys") or {})

    # re-add the dropped logical name: its physical must NOT resolve to
    # the tombstoned c_acctbal (here identity 'balance' is fine — no
    # file ever held a column physically named 'balance'), so every
    # pre-drop file reads NULL, never the old bytes
    add_column(t, "balance", "double")                               # v3
    cur = read_snapshot(spark, t)
    assert cur.filter(F.col("balance").isNotNull()).count() == 0
    m3 = _read_manifest(t, 3)
    assert (m3.get("phys") or {}).get("balance", "balance") != "c_acctbal"

    # rename ANOTHER column to a tombstoned name: legal, values intact
    rename_column(t, "c_nationkey", "c_acctbal")                     # v4
    got = read_snapshot(spark, t)
    assert got.columns == ["c_custkey", "c_acctbal", "balance"]
    want = base.select("c_custkey", F.col("c_nationkey").alias("c_acctbal"))
    assert got.select("c_custkey", "c_acctbal").subtract(want).count() == 0

    # restore to v1 brings back the original mapping and clears tombstones
    restore_snapshot(t, 1)                                           # v5
    back = read_snapshot(spark, t)
    assert back.columns == ["c_custkey", "c_nationkey", "balance"]
    m5 = _read_manifest(t, 5)
    assert not m5.get("dropped_cols")
    assert m5["phys"] == {"balance": "c_acctbal"}
    wantb = base.withColumnRenamed("c_acctbal", "balance")
    assert back.subtract(wantb).count() == 0 and wantb.subtract(back).count() == 0


def test_describe_history_reports_schema_changes(spark, sf_dir, tmp_path):
    """DESCRIBE HISTORY's schema_change column tells a RENAME (same
    physical, new logical) from a drop+add, reports adds/drops/widens,
    and surfaces the declared partition spec."""
    from reactivestreams_kinesis_spark.operators.snapshots import (
        describe_history,
    )

    t = str(tmp_path / "t")
    base = _base(spark, sf_dir)
    snapshot_commit(base, t, partition_by=["c_nationkey"])           # v0
    rename_column(t, "c_acctbal", "balance")                         # v1
    add_column(t, "tier", "string")                                  # v2
    drop_column(t, "tier")                                           # v3
    snapshot_commit(  # widen balance double stays; widen custkey? no —
        base.select(
            F.col("c_custkey").alias("c_custkey"),
            "c_nationkey",
            F.col("c_acctbal").alias("balance"),
        ).limit(1),
        t,
    )                                                                # v4
    snapshot_commit(  # a genuinely WIDER append: int -> bigint
        base.select(
            "c_custkey",
            F.col("c_nationkey").cast("bigint").alias("c_nationkey"),
            F.col("c_acctbal").alias("balance"),
        ).limit(1),
        t,
    )                                                                # v5
    h = {r["version"]: r for r in describe_history(spark, t).collect()}
    assert h[0]["schema_change"] is None
    assert h[0]["partition"] == "c_nationkey"
    assert h[1]["schema_change"] == "rename c_acctbal->balance"
    assert h[2]["schema_change"] == "add tier string"
    assert h[3]["schema_change"] == "drop tier"
    assert h[4]["schema_change"] is None
    assert h[5]["schema_change"] == "widen c_nationkey integer->long"
    assert all(h[v]["partition"] == "c_nationkey" for v in range(6))


def test_rename_refuses_constraint_reference(spark, sf_dir, tmp_path):
    from reactivestreams_kinesis_spark.operators.snapshots import (
        add_constraint,
        drop_constraint,
    )

    t = str(tmp_path / "t")
    snapshot_commit(_base(spark, sf_dir), t)
    add_constraint(spark, t, "bal_floor", "c_acctbal > -100000")
    with pytest.raises(ValueError, match="bal_floor"):
        rename_column(t, "c_acctbal", "balance")
    drop_constraint(t, "bal_floor")
    rename_column(t, "c_acctbal", "balance")
    # constraints on OTHER columns keep enforcing after the rename
    add_constraint(spark, t, "key_pos", "c_custkey >= 0")
    bad = spark.createDataFrame(
        [(-1, 1, 0.0)], "c_custkey bigint, c_nationkey int, balance double"
    )
    with pytest.raises(ValueError, match="key_pos"):
        snapshot_commit(bad, t)
