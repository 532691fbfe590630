"""Merge-on-read deletion vectors (round 7): position-delete files as a
metadata commit, applied by every reader as a scan-time anti-join; the
Delta DV / Iceberg position-delete shape on the manifest primitives.

Contract under test: a merge-on-read delete rewrites ZERO data files yet
every read surface (read_snapshot, scan_snapshot, the snapshot_table
source — plain and pushed-filter paths, CoW DML reads, metadata-only
COUNT) answers exactly as if the rows were physically gone; compaction
materializes; time travel composes (each version reads its own DV set);
vacuum treats DV files as first-class referenced files.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from reactivestreams_kinesis_spark.catalog import load_table
from reactivestreams_kinesis_spark.operators.snapshots import (
    _read_manifest,
    compact_snapshot,
    delete_where,
    latest_version,
    merge_upsert,
    read_snapshot,
    restore_snapshot,
    scan_snapshot,
    snapshot_changes,
    snapshot_commit,
    table_stats_summary,
    update_where,
    vacuum,
)


def _mk_table(spark, sf_dir, path, n_files=6):
    base = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey", "c_acctbal"
    )
    snapshot_commit(base.repartitionByRange(n_files, "c_custkey"), str(path))
    return base


def test_mor_delete_equals_cow_delete(spark, sf_dir, tmp_path):
    """The two strategies are interchangeable for readers: same predicates,
    identical surviving content — but MoR's manifest still names the
    ORIGINAL data files verbatim (zero rewritten), which is the entire
    point of the strategy."""
    preds = [("c_acctbal", "<", 0.0)]
    base = _mk_table(spark, sf_dir, tmp_path / "cow")
    _mk_table(spark, sf_dir, tmp_path / "mor")
    files_before = _read_manifest(str(tmp_path / "mor"), 0)["files"]

    delete_where(spark, str(tmp_path / "cow"), preds)
    delete_where(spark, str(tmp_path / "mor"), preds, strategy="merge_on_read")

    cow = read_snapshot(spark, str(tmp_path / "cow"))
    mor = read_snapshot(spark, str(tmp_path / "mor"))
    assert mor.count() == cow.count() < base.count()
    assert mor.subtract(cow).count() == 0 and cow.subtract(mor).count() == 0

    m = _read_manifest(str(tmp_path / "mor"), 1)
    assert m["op"] == "delete"
    assert m["files"] == files_before, "MoR delete must rewrite no data file"
    assert m["delete_files"], "positions must be recorded"
    assert sum(m["dv_counts"].values()) == base.count() - mor.count()


def test_mor_stacking_time_travel_and_idempotence(spark, sf_dir, tmp_path):
    """Stacked MoR deletes compose; every version reads with exactly ITS
    OWN delete set; a re-run of the same predicate publishes nothing
    (the candidate scan is DV-aware — already-deleted rows cannot match
    again); a txn replay no-ops."""
    t = str(tmp_path / "t")
    base = _mk_table(spark, sf_dir, tmp_path / "t")
    n = base.count()
    n_neg = base.filter("c_acctbal < 0").count()
    n_low = base.filter("c_custkey <= 100").count()
    n_both = base.filter("c_acctbal < 0 and c_custkey <= 100").count()

    v1 = delete_where(
        spark, t, [("c_acctbal", "<", 0.0)], strategy="merge_on_read"
    )
    v2 = delete_where(
        spark, t, [("c_custkey", "<=", 100)], strategy="merge_on_read",
        txn_id="dv-t2",
    )
    assert (v1, v2) == (1, 2)
    assert read_snapshot(spark, t, 0).count() == n
    assert read_snapshot(spark, t, 1).count() == n - n_neg
    assert read_snapshot(spark, t, 2).count() == n - n_neg - n_low + n_both

    # nothing left to match: no new version (and no orphan dv dir growth)
    assert (
        delete_where(spark, t, [("c_acctbal", "<", 0.0)], strategy="merge_on_read")
        == 2
    )
    # txn replay returns the committed version without re-deleting
    assert (
        delete_where(
            spark, t, [("c_custkey", "<=", 100)], strategy="merge_on_read",
            txn_id="dv-t2",
        )
        == 2
    )
    assert latest_version(t) == 2


def test_dv_read_surfaces_agree(spark, sf_dir, tmp_path):
    """All four read surfaces give the same answer under DVs:
    read_snapshot, scan_snapshot (stats prune + residual filter), and
    the snapshot_table source with and without filter pushdown."""
    from reactivestreams_kinesis_spark.sources.snapshot_source import (
        register_snapshot_source,
    )

    t = str(tmp_path / "t")
    _mk_table(spark, sf_dir, tmp_path / "t")
    delete_where(spark, t, [("c_nationkey", "=", 5)], strategy="merge_on_read")

    expected = read_snapshot(spark, t).filter("c_custkey > 200")
    via_scan = scan_snapshot(spark, t, [("c_custkey", ">", 200)])
    assert via_scan.subtract(expected).count() == 0
    assert expected.subtract(via_scan).count() == 0

    register_snapshot_source(spark)
    src = spark.read.format("snapshot_table").option("path", t).load()
    assert src.count() == read_snapshot(spark, t).count()
    pushed = src.filter(F.col("c_custkey") > 200)
    assert pushed.count() == expected.count()
    assert pushed.subtract(expected).count() == 0
    assert src.filter("c_nationkey = 5").count() == 0


def test_cow_dml_after_mor_delete_carries_dvs(spark, sf_dir, tmp_path):
    """A copy-on-write UPDATE on a DV'd table must (a) not resurrect
    deleted rows in the files it rewrites, and (b) CARRY the pending DVs
    of the files it retains — checked on the manifest, then by value."""
    t = str(tmp_path / "t")
    base = _mk_table(spark, sf_dir, tmp_path / "t")
    n = base.count()
    n_del = base.filter("c_acctbal < 0").count()
    delete_where(spark, t, [("c_acctbal", "<", 0.0)], strategy="merge_on_read")

    # localized update: only low-key files rewrite; high-key files keep DVs
    update_where(
        spark, t, [("c_custkey", "<=", 50)], {"c_acctbal": F.lit(9999.0)}
    )
    m = _read_manifest(t, latest_version(t))
    assert m.get("delete_files"), "retained files' DVs must carry"
    cur = read_snapshot(spark, t)
    assert cur.count() == n - n_del, "no resurrection, no extra loss"
    assert cur.filter("c_acctbal < 0").count() == 0
    # rewritten files' DV entries dropped from the counts
    assert set(m.get("dv_counts", {})).issubset(set(m["files"]))

    # a merge keyed on a DV-deleted row INSERTS it anew (it is logically gone)
    gone = base.filter("c_acctbal < 0").limit(1).collect()
    if gone:
        key = gone[0]["c_custkey"]
        upd = spark.createDataFrame(
            [(key, 0, 1.0)], "c_custkey bigint, c_nationkey int, c_acctbal double"
        )
        merge_upsert(spark, t, upd, "c_custkey")
        row = read_snapshot(spark, t).filter(F.col("c_custkey") == key).collect()
        assert len(row) == 1 and row[0]["c_acctbal"] == 1.0


def test_compaction_materializes_dvs(spark, sf_dir, tmp_path):
    """OPTIMIZE on a DV'd table applies the deletes into clean files:
    the new version has no delete_files, identical live content, and the
    metadata-only column stats come back."""
    t = str(tmp_path / "t")
    base = _mk_table(spark, sf_dir, tmp_path / "t")
    delete_where(spark, t, [("c_nationkey", ">=", 20)], strategy="merge_on_read")
    live = read_snapshot(spark, t)
    n_live = live.count()
    assert table_stats_summary(t)["columns"] == {}  # withheld under DVs

    v = compact_snapshot(spark, t, target_file_bytes=1 << 40)
    m = _read_manifest(t, v)
    assert not m.get("delete_files") and not m.get("dv_counts")
    s = table_stats_summary(t)
    assert s["rows"] == n_live == read_snapshot(spark, t).count()
    assert s["columns"], "exact min/max restored after materialization"
    assert s["columns"]["c_nationkey"]["max"] < 20


def test_metadata_count_exact_under_dvs(spark, sf_dir, tmp_path):
    """COUNT(*) from the manifest alone stays exact with DVs pending:
    per-file footer rows minus per-file deleted-position counts."""
    t = str(tmp_path / "t")
    base = _mk_table(spark, sf_dir, tmp_path / "t")
    delete_where(spark, t, [("c_acctbal", "<", 0.0)], strategy="merge_on_read")
    delete_where(spark, t, [("c_custkey", "<=", 30)], strategy="merge_on_read")
    assert table_stats_summary(t)["rows"] == read_snapshot(spark, t).count()

    from reactivestreams_kinesis_spark.operators.snapshots import describe_history

    hist = {r["version"]: r for r in describe_history(spark, t).collect()}
    assert hist[2]["op"] == "delete"
    assert hist[2]["n_rows"] == read_snapshot(spark, t, 2).count()
    assert hist[0]["n_rows"] == base.count()


def test_vacuum_treats_dv_files_as_referenced(spark, sf_dir, tmp_path):
    """DV files referenced by a retained version survive vacuum; once
    compaction drops the reference and history is vacuumed, they go."""
    t = str(tmp_path / "t")
    _mk_table(spark, sf_dir, tmp_path / "t")
    delete_where(spark, t, [("c_nationkey", "=", 3)], strategy="merge_on_read")
    dv_files = _read_manifest(t, 1)["delete_files"]
    n_live = read_snapshot(spark, t).count()

    vacuum(t, keep_from_version=1)  # v1 (with DVs) retained
    assert all(os.path.exists(os.path.join(t, f)) for f in dv_files)
    assert read_snapshot(spark, t).count() == n_live

    compact_snapshot(spark, t, target_file_bytes=1 << 40)  # v2: DVs applied
    deleted = vacuum(t, keep_from_version=2)
    assert {os.path.join(t, f) for f in dv_files}.issubset(set(deleted))
    assert read_snapshot(spark, t).count() == n_live


def test_snapshot_changes_refuses_crossing_delete(spark, sf_dir, tmp_path):
    """A DV commit logically removes rows, so the incremental append feed
    must refuse to diff across it (same contract as overwrite/compaction)."""
    t = str(tmp_path / "t")
    base = _mk_table(spark, sf_dir, tmp_path / "t")
    delete_where(spark, t, [("c_custkey", "<=", 10)], strategy="merge_on_read")
    snapshot_commit(base.limit(5), t)  # v2 append on top
    with pytest.raises(ValueError, match="not an append"):
        snapshot_changes(spark, t, from_version=0)
    # diffing a pure-append range still works
    assert snapshot_changes(spark, t, from_version=1).count() == 5


def test_restore_snapshot_metadata_only(spark, sf_dir, tmp_path):
    """RESTORE publishes an old version's exact content (DVs included) as
    a new version without touching data; the undone versions stay in
    history; restoring a vacuumed version refuses."""
    t = str(tmp_path / "t")
    base = _mk_table(spark, sf_dir, tmp_path / "t")          # v0
    delete_where(spark, t, [("c_acctbal", "<", 0.0)], strategy="merge_on_read")  # v1
    v1_count = read_snapshot(spark, t).count()
    update_where(spark, t, [("c_custkey", "<=", 500)], {"c_acctbal": F.lit(0.0)})  # v2 (bad)

    data_dirs_before = {d for d in os.listdir(t) if d.startswith(("data-", "dv-"))}
    v3 = restore_snapshot(t, 1)
    assert {d for d in os.listdir(t) if d.startswith(("data-", "dv-"))} == (
        data_dirs_before
    ), "restore writes no data"
    restored = read_snapshot(spark, t, v3)
    v1_df = read_snapshot(spark, t, 1)
    assert restored.count() == v1_count
    assert restored.subtract(v1_df).count() == 0
    assert v1_df.subtract(restored).count() == 0
    # bad version remains auditable
    assert read_snapshot(spark, t, 2).filter(
        "c_custkey <= 500 and c_acctbal = 0.0"
    ).count() > 0

    vacuum(t, keep_from_version=v3)
    with pytest.raises(FileNotFoundError):
        restore_snapshot(t, 2)


# ---- equality deletes (the zero-scan merge-on-read form) ----


def test_eq_delete_zero_scan_and_scope(spark, sf_dir, tmp_path):
    """delete_by_key rewrites nothing AND reads nothing: the manifest
    keeps the data files verbatim and records the key set; readers drop
    exactly the matching rows — but ONLY in files that existed at delete
    time, so a later append of the same key stays visible (the CDC
    retract-then-reinsert semantics)."""
    from reactivestreams_kinesis_spark.operators.snapshots import delete_by_key

    t = str(tmp_path / "t")
    base = _mk_table(spark, sf_dir, tmp_path / "t")
    files_before = _read_manifest(t, 0)["files"]
    keys = spark.createDataFrame([(3,), (7,), (None,)], "c_nationkey int")

    v = delete_by_key(spark, t, keys, "c_nationkey", txn_id="eq-1")
    m = _read_manifest(t, v)
    assert m["op"] == "delete" and m["files"] == files_before
    assert m["eq_deletes"][0]["key_cols"] == ["c_nationkey"]
    cur = read_snapshot(spark, t)
    expected = base.filter("c_nationkey NOT IN (3, 7)")
    assert cur.count() == expected.count()
    assert cur.filter("c_nationkey IN (3, 7)").count() == 0

    # txn replay no-ops
    assert delete_by_key(spark, t, keys, "c_nationkey", txn_id="eq-1") == v

    # append rows with a deleted key AFTER the delete: they are new rows,
    # outside every entry's scope, and must stay visible
    reinsert = base.filter("c_nationkey = 3").limit(10)
    n_re = reinsert.count()
    snapshot_commit(reinsert, t)
    cur2 = read_snapshot(spark, t)
    assert cur2.filter("c_nationkey = 3").count() == n_re
    assert cur2.count() == expected.count() + n_re


def test_eq_delete_read_surfaces_agree(spark, sf_dir, tmp_path):
    """scan_snapshot and the snapshot_table source (plain + pushed
    filter) agree with read_snapshot under pending equality deletes."""
    from reactivestreams_kinesis_spark.operators.snapshots import delete_by_key
    from reactivestreams_kinesis_spark.sources.snapshot_source import (
        register_snapshot_source,
    )

    t = str(tmp_path / "t")
    _mk_table(spark, sf_dir, tmp_path / "t")
    # deliberately WIDER key type than the table's int column: the writer
    # must align it to the declared schema or the source's Arrow
    # hash-join kernel (exact-type) would refuse
    keys = spark.createDataFrame([(5,), (11,)], "c_nationkey bigint")
    delete_by_key(spark, t, keys, "c_nationkey")

    expected = read_snapshot(spark, t).filter("c_custkey > 200")
    via_scan = scan_snapshot(spark, t, [("c_custkey", ">", 200)])
    assert via_scan.subtract(expected).count() == 0
    assert expected.subtract(via_scan).count() == 0

    register_snapshot_source(spark)
    src = spark.read.format("snapshot_table").option("path", t).load()
    assert src.count() == read_snapshot(spark, t).count()
    assert src.filter("c_nationkey = 5").count() == 0
    pushed = src.filter(F.col("c_custkey") > 200)
    assert pushed.count() == expected.count()
    assert pushed.subtract(expected).count() == 0


def test_eq_delete_carry_compact_stats_vacuum(spark, sf_dir, tmp_path):
    """The full lifecycle: metadata COUNT is withheld while equality
    deletes are pending (their per-file counts are unknowable without a
    scan); a CoW update carries entries scoped to retained files;
    compaction materializes everything; vacuum treats the key files as
    referenced until the last manifest naming them goes."""
    from reactivestreams_kinesis_spark.operators.snapshots import delete_by_key

    t = str(tmp_path / "t")
    base = _mk_table(spark, sf_dir, tmp_path / "t")
    keys = spark.createDataFrame([(2,), (9,)], "c_nationkey int")
    delete_by_key(spark, t, keys, "c_nationkey")
    n_live = read_snapshot(spark, t).count()
    assert n_live == base.filter("c_nationkey NOT IN (2, 9)").count()
    s = table_stats_summary(t)
    assert s["rows"] is None and s["columns"] == {}

    # CoW update on low keys: retained files keep their eq scope
    update_where(spark, t, [("c_custkey", "<=", 50)], {"c_acctbal": F.lit(1.0)})
    m = _read_manifest(t, latest_version(t))
    assert m.get("eq_deletes"), "entries scoped to retained files must carry"
    for e in m["eq_deletes"]:
        assert set(e["files"]).issubset(set(m["files"]))
    cur = read_snapshot(spark, t)
    assert cur.count() == n_live, "no resurrection through the rewrite"
    assert cur.filter("c_nationkey IN (2, 9)").count() == 0

    eq_files = [f for e in m["eq_deletes"] for f in e["delete_files"]]
    v = compact_snapshot(spark, t, target_file_bytes=1 << 40)
    mc = _read_manifest(t, v)
    assert not mc.get("eq_deletes") and not mc.get("delete_files")
    s2 = table_stats_summary(t)
    assert s2["rows"] == n_live == read_snapshot(spark, t).count()
    assert s2["columns"], "metadata min/max restored after materialization"

    vacuum(t, keep_from_version=v - 1)  # eq'd version retained: keys live
    assert all(os.path.exists(os.path.join(t, f)) for f in eq_files)
    deleted = vacuum(t, keep_from_version=v)
    assert {os.path.join(t, f) for f in eq_files}.issubset(set(deleted))
    assert read_snapshot(spark, t).count() == n_live


def test_eq_and_positional_deletes_stack(spark, sf_dir, tmp_path):
    """Both merge-on-read forms pending at once: a positional delete and
    an equality delete compose; restore carries both verbatim."""
    from reactivestreams_kinesis_spark.operators.snapshots import delete_by_key

    t = str(tmp_path / "t")
    base = _mk_table(spark, sf_dir, tmp_path / "t")
    delete_where(spark, t, [("c_acctbal", "<", 0.0)], strategy="merge_on_read")
    keys = spark.createDataFrame([(4,), (13,)], "c_nationkey int")
    v2 = delete_by_key(spark, t, keys, "c_nationkey")
    expected = base.filter("c_acctbal >= 0 AND c_nationkey NOT IN (4, 13)")
    assert read_snapshot(spark, t).count() == expected.count()

    snapshot_commit(base.filter("c_nationkey = 4").limit(3), t)  # v3 append
    v4 = restore_snapshot(t, v2)
    m = _read_manifest(t, v4)
    assert m.get("delete_files") and m.get("eq_deletes")
    restored = read_snapshot(spark, t, v4)
    assert restored.count() == expected.count()
    assert restored.subtract(expected.select(*restored.columns)).count() == 0


def test_dv_read_plan_broadcasts_delete_sets(spark, sf_dir, tmp_path):
    """Plan pin for the merge-on-read read path: BOTH delete forms apply
    as broadcast hash anti-joins (the delete sets are sized by deleted
    rows/keys, so AQE broadcasts them; the eq entry's file scope rides
    the join condition as a residual) — never a nested-loop or cartesian
    plan, and the fact side never shuffles for the deletes."""
    from reactivestreams_kinesis_spark.operators.snapshots import delete_by_key
    from reactivestreams_kinesis_spark.plans.inspect import explain_string

    t = str(tmp_path / "t")
    _mk_table(spark, sf_dir, tmp_path / "t")
    delete_where(spark, t, [("c_acctbal", "<", 0.0)], strategy="merge_on_read")
    keys = spark.createDataFrame([(3,), (7,)], "c_nationkey int")
    delete_by_key(spark, t, keys, "c_nationkey")

    df = read_snapshot(spark, t)
    df.count()  # let AQE finalize the joins
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan and "NestedLoop" not in plan
    assert plan.count("LeftAnti") == 2, plan
    assert "BroadcastHashJoin" in plan, plan
    # the deletes add no exchange on the fact side (broadcast only)
    assert "Exchange hashpartitioning" not in explain_string(df), plan


# ---- randomized model check over mixed DML histories ----

from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

_OP = st.one_of(
    st.tuples(st.just("append"), st.lists(st.tuples(st.integers(0, 5), st.integers(0, 9)), min_size=1, max_size=6)),
    st.tuples(st.just("pos_del"), st.integers(0, 9)),
    st.tuples(st.just("eq_del"), st.lists(st.integers(0, 5), min_size=1, max_size=3)),
    st.tuples(st.just("update"), st.tuples(st.integers(0, 5), st.integers(100, 109))),
    st.tuples(st.just("compact"), st.none()),
)


@given(
    init=st.lists(st.tuples(st.integers(0, 5), st.integers(0, 9)), min_size=1, max_size=8),
    ops=st.lists(_OP, min_size=1, max_size=4),
)
@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
def test_mixed_dml_history_matches_model(spark, tmp_path_factory, init, ops):
    """Any interleaving of appends, merge-on-read position deletes,
    equality deletes, copy-on-write updates, and compactions must read
    back exactly what a pure-Python model of the same history holds —
    the randomized sweep over DELETE-form interactions (scope semantics,
    DV carrying through rewrites, materialization) that example-based
    tests can only sample."""
    import uuid as _uuid

    from reactivestreams_kinesis_spark.operators.snapshots import (
        compact_snapshot,
        delete_by_key,
        delete_where,
        read_snapshot,
        snapshot_commit,
        update_where,
    )

    t = str(tmp_path_factory.mktemp("dvprop") / f"t_{_uuid.uuid4().hex[:6]}")
    uid = 0
    model: list[dict] = []

    def mk_df(rows):
        return spark.createDataFrame(rows, "uid bigint, k int, v int")

    first = [(uid + i, k, v) for i, (k, v) in enumerate(init)]
    uid += len(init)
    model.extend({"uid": u, "k": k, "v": v} for u, k, v in first)
    snapshot_commit(mk_df(first).repartition(2), t)

    for kind, arg in ops:
        if kind == "append":
            rows = [(uid + i, k, v) for i, (k, v) in enumerate(arg)]
            uid += len(arg)
            model.extend({"uid": u, "k": k, "v": v} for u, k, v in rows)
            snapshot_commit(mk_df(rows), t)
        elif kind == "pos_del":
            delete_where(spark, t, [("v", "<", arg)], strategy="merge_on_read")
            model = [r for r in model if not (r["v"] < arg)]
        elif kind == "eq_del":
            delete_by_key(spark, t, mk_df([(0, k, 0) for k in arg]).select("k"), "k")
            model = [r for r in model if r["k"] not in set(arg)]
        elif kind == "update":
            key, newv = arg
            update_where(spark, t, [("k", "=", key)], {"v": F.lit(newv)})
            for r in model:
                if r["k"] == key:
                    r["v"] = newv
        elif kind == "compact":
            compact_snapshot(spark, t, target_file_bytes=1 << 40)

    got = sorted(
        (r["uid"], r["k"], r["v"]) for r in read_snapshot(spark, t).collect()
    )
    want = sorted((r["uid"], r["k"], r["v"]) for r in model)
    assert got == want


def test_merge_upsert_merge_on_read_strategy(spark, sf_dir, tmp_path):
    """Batch MERGE in merge-on-read form: same three-clause semantics as
    copy-on-write (update / insert / delete), zero data files rewritten
    (the manifest keeps v0's files and gains only appends), txn replay
    no-ops, duplicate keys refused, and compaction converges the table
    to the exact CoW result."""
    t_mor = str(tmp_path / "mor")
    t_cow = str(tmp_path / "cow")
    base = _mk_table(spark, sf_dir, tmp_path / "mor")
    _mk_table(spark, sf_dir, tmp_path / "cow")
    files_v0 = set(_read_manifest(t_mor, 0)["files"])

    upd = base.filter("c_custkey % 10 = 0").select(
        "c_custkey", "c_nationkey",
        (F.col("c_acctbal") + 100.0).alias("c_acctbal"),
        F.lit(False).alias("_del"),
    )
    dels = base.filter("c_custkey % 10 = 7").select(
        "c_custkey", "c_nationkey",
        F.lit(None).cast("double").alias("c_acctbal"),
        F.lit(True).alias("_del"),
    )
    ins = spark.createDataFrame(
        [(10_000_001, 0, 5.0, False), (10_000_002, 1, 6.0, False)],
        "c_custkey bigint, c_nationkey int, c_acctbal double, _del boolean",
    )
    changes = upd.unionByName(dels).unionByName(ins)

    merge_upsert(spark, t_mor, changes, "c_custkey", delete_col="_del",
                 strategy="merge_on_read", txn_id="m1")
    merge_upsert(spark, t_cow, changes, "c_custkey", delete_col="_del",
                 txn_id="m1")

    m = _read_manifest(t_mor, latest_version(t_mor))
    assert files_v0.issubset(set(m["files"])), "MoR merge rewrites nothing"
    assert m.get("eq_deletes"), "retractions recorded as equality entries"

    mor = read_snapshot(spark, t_mor)
    cow = read_snapshot(spark, t_cow)
    assert mor.count() == cow.count()
    assert mor.subtract(cow).count() == 0 and cow.subtract(mor).count() == 0

    # replay no-ops (per-phase txns resolve through the append phase)
    v = latest_version(t_mor)
    assert merge_upsert(spark, t_mor, changes, "c_custkey", delete_col="_del",
                        strategy="merge_on_read", txn_id="m1") == v

    # duplicates refused in MoR form too
    with pytest.raises(ValueError, match="duplicated"):
        merge_upsert(spark, t_mor, changes.unionByName(ins), "c_custkey",
                     delete_col="_del", strategy="merge_on_read")

    compact_snapshot(spark, t_mor, target_file_bytes=1 << 40)
    after = read_snapshot(spark, t_mor)
    assert after.subtract(cow).count() == 0 and cow.subtract(after).count() == 0


def test_incremental_compaction_bin_packs_small_files(spark, sf_dir, tmp_path):
    """compact_snapshot(small_file_bytes=...) rewrites ONLY the
    small-file tail: large files are retained byte-identical with their
    pending deletes carried; the packed small files materialize theirs;
    content, metadata COUNT, and a later full compaction all agree."""
    t = str(tmp_path / "t")
    base = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey", "c_acctbal"
    )
    # one big file, then a tail of small epoch-style appends
    snapshot_commit(base.repartition(1), t)
    big = _read_manifest(t, 0)["files"][0]
    for i in range(4):
        snapshot_commit(base.filter(F.col("c_custkey") % 50 == i).repartition(1), t)
    delete_where(spark, t, [("c_acctbal", "<", 0.0)], strategy="merge_on_read")
    n_live = read_snapshot(spark, t).count()
    big_bytes = os.path.getsize(os.path.join(t, big))

    v = compact_snapshot(
        spark, t, target_file_bytes=1 << 40, small_file_bytes=big_bytes
    )
    m = _read_manifest(t, v)
    assert big in m["files"], "the large file is retained verbatim"
    assert len(m["files"]) == 2, "the small tail packed into one file"
    assert m.get("delete_files"), "the big file's pending DVs carry"
    assert set(m.get("dv_counts", {})) == {big}
    cur = read_snapshot(spark, t)
    assert cur.count() == n_live
    assert cur.filter("c_acctbal < 0").count() == 0
    assert table_stats_summary(t)["rows"] == n_live

    # nothing small left: no-op
    assert compact_snapshot(
        spark, t, target_file_bytes=1 << 40, small_file_bytes=1024
    ) == v
    # a later FULL compaction drains the carried DVs too
    v2 = compact_snapshot(spark, t, target_file_bytes=1 << 40)
    assert not _read_manifest(t, v2).get("delete_files")
    assert read_snapshot(spark, t).count() == n_live


def test_change_feed_emits_inserts_and_retractions(spark, sf_dir, tmp_path):
    """snapshot_change_feed: appends emit inserts, both delete forms emit
    exactly the rows they retracted (never a row already dead), ranges
    compose, overwrites refuse, and an empty range refuses."""
    from reactivestreams_kinesis_spark.operators.snapshots import (
        delete_by_key,
        snapshot_change_feed,
    )

    t = str(tmp_path / "t")
    base = _mk_table(spark, sf_dir, tmp_path / "t")                  # v0
    extra = base.filter("c_custkey <= 20").select(
        (F.col("c_custkey") + 900000).alias("c_custkey"),
        "c_nationkey",
        "c_acctbal",
    )
    snapshot_commit(extra, t)                                        # v1
    delete_where(spark, t, [("c_acctbal", "<", 0.0)], strategy="merge_on_read")  # v2
    keys = spark.createDataFrame([(3,), (7,)], "c_nationkey int")
    delete_by_key(spark, t, keys, "c_nationkey")                     # v3

    feed = snapshot_change_feed(spark, t, from_version=0)
    by = {r: c for r, c in feed.groupBy("_change_type").count().collect()}
    n_ins = extra.count()
    live1 = base.unionByName(extra)
    n_d2 = live1.filter("c_acctbal < 0").count()
    n_d3 = live1.filter("c_acctbal >= 0 AND c_nationkey IN (3, 7)").count()
    assert by["insert"] == n_ins
    assert by["delete"] == n_d2 + n_d3
    # a row position-deleted at v2 never retracts again at v3
    v3_deletes = feed.filter("_commit_version = 3")
    assert v3_deletes.filter("c_acctbal < 0").count() == 0
    # applying the feed to v0 reproduces the tip
    tip_rows = read_snapshot(spark, t)
    replayed = (
        read_snapshot(spark, t, 0)
        .unionByName(feed.filter("_change_type = 'insert'").drop("_change_type", "_commit_version"))
        .exceptAll(feed.filter("_change_type = 'delete'").drop("_change_type", "_commit_version"))
    )
    assert replayed.exceptAll(tip_rows).count() == 0
    assert tip_rows.exceptAll(replayed).count() == 0

    # sub-range: only v3's retractions
    sub = snapshot_change_feed(spark, t, from_version=2, to_version=3)
    assert sub.filter("_change_type = 'insert'").count() == 0
    assert sub.count() == n_d3

    update_where(spark, t, [("c_custkey", "<=", 10)], {"c_acctbal": F.lit(1.0)})  # v4 CoW rewrite
    # round 9: the feed crosses the rewrite with update pre/postimages
    v4 = snapshot_change_feed(spark, t, from_version=3, to_version=4)
    by4 = {r[0]: r[1] for r in v4.groupBy("_change_type").count().collect()}
    n_upd = (
        read_snapshot(spark, t, 3)
        .filter("c_custkey <= 10 AND c_acctbal <> 1.0")
        .count()
    )
    assert by4 == {"update_preimage": n_upd, "update_postimage": n_upd}
    with pytest.raises(ValueError, match="no changes"):
        snapshot_change_feed(spark, t, from_version=4, to_version=4)


def test_change_feed_streaming_matches_batch(spark, sf_dir, tmp_path):
    """The snapshot_table source with .option("changeFeed", "true")
    streams the same rows the batch snapshot_change_feed extracts —
    inserts and both retraction kinds — across an AvailableNow drain,
    and resumes from the checkpoint for a second increment."""
    from reactivestreams_kinesis_spark.operators.snapshots import (
        delete_by_key,
        snapshot_change_feed,
    )
    from reactivestreams_kinesis_spark.sources.snapshot_source import (
        register_snapshot_source,
    )

    register_snapshot_source(spark)
    t = str(tmp_path / "t")
    ckpt = str(tmp_path / "ckpt")
    out_dir = str(tmp_path / "out")
    base = _mk_table(spark, sf_dir, tmp_path / "t")                  # v0
    snapshot_commit(base.filter("c_custkey <= 30").select(
        (F.col("c_custkey") + 800000).alias("c_custkey"),
        "c_nationkey", "c_acctbal",
    ), t)                                                            # v1
    delete_where(spark, t, [("c_acctbal", "<", 0.0)], strategy="merge_on_read")  # v2

    def drain():
        stream = (
            spark.readStream.format("snapshot_table")
            .option("path", t)
            .option("changeFeed", "true")
            .load()
        )
        q = (
            stream.writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(300)

    cols = ["c_custkey", "c_nationkey", "c_acctbal", "_change_type", "_commit_version"]

    drain()
    got = spark.read.parquet(out_dir).select(*cols)
    # batch twin over the full history: v0's rows are inserts too
    batch_inserts_v0 = read_snapshot(spark, t, 0).withColumn(
        "_change_type", F.lit("insert")
    ).withColumn("_commit_version", F.lit(0).cast("long"))
    batch_rest = snapshot_change_feed(spark, t, from_version=0)
    want = batch_inserts_v0.unionByName(batch_rest).select(*cols)
    assert got.count() == want.count()
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0

    # a second increment: eq delete, resume from checkpoint
    keys = spark.createDataFrame([(4,), (9,)], "c_nationkey int")
    delete_by_key(spark, t, keys, "c_nationkey")                     # v3
    drain()
    got2 = spark.read.parquet(out_dir).select(*cols)
    inc = snapshot_change_feed(spark, t, from_version=2, to_version=3).select(*cols)
    assert got2.count() == want.count() + inc.count()
    assert got2.filter("_commit_version = 3").exceptAll(inc).count() == 0
    assert inc.exceptAll(got2.filter("_commit_version = 3")).count() == 0


def test_change_feed_across_schema_evolution(spark, sf_dir, tmp_path):
    """The batch feed composes with add-column evolution: inserts from a
    widened append carry the new column, pre-evolution rows surface NULL
    for it, and retractions of pre-evolution rows read under the widened
    schema (unionByName alignment)."""
    from reactivestreams_kinesis_spark.operators.snapshots import (
        snapshot_change_feed,
    )

    t = str(tmp_path / "t")
    base = _mk_table(spark, sf_dir, tmp_path / "t")                  # v0
    widened = base.filter("c_custkey <= 15").select(
        (F.col("c_custkey") + 700000).alias("c_custkey"),
        "c_nationkey",
        "c_acctbal",
        F.lit("gold").alias("c_tier"),
    )
    snapshot_commit(widened, t)                                      # v1 widens
    delete_where(spark, t, [("c_acctbal", "<", 0.0)], strategy="merge_on_read")  # v2

    feed = snapshot_change_feed(spark, t, from_version=0)
    assert "c_tier" in feed.columns
    ins = feed.filter("_change_type = 'insert'")
    assert ins.count() == widened.count()
    assert ins.filter("c_tier = 'gold'").count() == ins.count()
    dels = feed.filter("_change_type = 'delete'")
    n_old_neg = base.filter("c_acctbal < 0").count()
    n_new_neg = widened.filter("c_acctbal < 0").count()
    assert dels.count() == n_old_neg + n_new_neg
    # pre-evolution retractions surface NULL for the widened column
    assert dels.filter(
        (F.col("c_custkey") < 700000) & F.col("c_tier").isNotNull()
    ).count() == 0


def test_compact_guard_rejects_clustered_binpack(spark, sf_dir, tmp_path):
    """Incremental bin-pack concatenates the small tail verbatim and
    cannot honor a clustering request; silently packing would hand back
    an unclustered table, so the combination must refuse loudly."""
    t = str(tmp_path / "t")
    _mk_table(spark, sf_dir, tmp_path / "t")
    with pytest.raises(ValueError, match="cluster"):
        compact_snapshot(
            spark, t, small_file_bytes=1 << 20, cluster_by=["c_custkey"]
        )
    with pytest.raises(ValueError, match="cluster"):
        compact_snapshot(
            spark, t, small_file_bytes=1 << 20, cluster_by=["c_custkey"], zorder=True
        )
    # the guard must not have published anything
    assert latest_version(t) == 0


def test_delete_by_key_legacy_schemaless_manifest(spark, sf_dir, tmp_path):
    """A manifest from before the schema field (legacy table) derives key
    types from a data-file FOOTER; mismatched key types (int keys vs a
    bigint column) must still cast so the snapshot_table source's Arrow
    hash-join kernel sees exact type equality."""
    import json as _json

    from reactivestreams_kinesis_spark.operators.snapshots import (
        _manifest_path,
        delete_by_key,
    )
    from reactivestreams_kinesis_spark.sources.snapshot_source import (
        register_snapshot_source,
    )

    t = str(tmp_path / "t")
    base = _mk_table(spark, sf_dir, tmp_path / "t")
    # simulate a legacy commit: strip the declared schema from the manifest
    mp = _manifest_path(t, 0)
    with open(mp) as f:
        m = _json.load(f)
    m.pop("schema", None)
    with open(mp, "w") as f:
        _json.dump(m, f)

    keys = spark.createDataFrame([(3,), (7,)], "c_nationkey int")  # int vs bigint
    delete_by_key(spark, t, keys, "c_nationkey")
    expect = base.filter("c_nationkey NOT IN (3, 7)").count()
    assert read_snapshot(spark, t).count() == expect

    register_snapshot_source(spark)
    via_source = (
        spark.read.format("snapshot_table").option("path", t).load().count()
    )
    assert via_source == expect

    # unknown key column still raises a clear error in the legacy path
    with pytest.raises(ValueError, match="not in table schema"):
        delete_by_key(
            spark, t, spark.createDataFrame([(1,)], "nope int"), "nope"
        )


def test_delete_by_key_empty_file_set_noop(spark, sf_dir, tmp_path):
    """A tip whose file set is empty (an overwrite that produced zero
    part files) cannot match any row — delete_by_key must no-op and
    return the tip instead of raising IndexError on the footer read."""
    from reactivestreams_kinesis_spark.operators.snapshots import (
        delete_by_key,
        publish_manifest,
    )

    t = str(tmp_path / "t")
    _mk_table(spark, sf_dir, tmp_path / "t")
    publish_manifest(t, [], mode="overwrite")                       # v1: empty
    keys = spark.createDataFrame([(3,)], "c_nationkey int")
    assert delete_by_key(spark, t, keys, "c_nationkey") == 1
    assert latest_version(t) == 1


def test_delete_free_files_keep_fast_path(spark, sf_dir, tmp_path):
    """Partition-level pin of the round-8 dv fast path: after a MoR
    delete confined to one file's key range, the batch reader plans
    dv_paths ONLY for the file whose dv_counts grew — delete-free files
    keep the pushdown path — while deleted rows stay hidden end to end."""
    from reactivestreams_kinesis_spark.sources.snapshot_source import (
        _SnapshotBatchReader,
        register_snapshot_source,
    )

    t = str(tmp_path / "t")
    base = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey", "c_acctbal"
    )
    snapshot_commit(base.repartitionByRange(4, "c_custkey"), t)
    lo = base.agg(F.min("c_custkey")).collect()[0][0]
    delete_where(
        spark, t, [("c_custkey", "<=", lo + 5)], strategy="merge_on_read"
    )
    m = _read_manifest(t, 1)
    with_dv = {f for f, n in m["dv_counts"].items() if n > 0}
    assert 0 < len(with_dv) < len(m["files"]), "delete must be file-local"

    parts = _SnapshotBatchReader(t, m).partitions()
    planned = {p.rel: p.dv_paths for p in parts}
    for rel, dv in planned.items():
        if rel in with_dv:
            assert dv, f"deleted file {rel} must route through the DV path"
        else:
            assert dv is None, f"delete-free file {rel} must keep the fast path"

    register_snapshot_source(spark)
    got = spark.read.format("snapshot_table").option("path", t).load()
    assert got.filter(F.col("c_custkey") <= lo + 5).count() == 0
    assert got.count() == base.filter(F.col("c_custkey") > lo + 5).count()


def test_publish_rejects_uncovered_position_delete(spark, sf_dir, tmp_path):
    """publish_manifest enforces the dv fast path's invariant: a delete
    commit whose delete_files target a data file with no positive
    dv_counts entry refuses instead of committing a manifest readers
    would silently mis-read."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from reactivestreams_kinesis_spark.operators.snapshots import publish_manifest

    t = str(tmp_path / "t")
    _mk_table(spark, sf_dir, tmp_path / "t")
    target = _read_manifest(t, 0)["files"][0]
    os.makedirs(os.path.join(t, "dv-x"), exist_ok=True)
    pq.write_table(
        pa.table({"file": [target, target], "pos": [0, 1]}),
        os.path.join(t, "dv-x", "d.parquet"),
    )
    with pytest.raises(ValueError, match="dv_counts"):
        publish_manifest(t, [], mode="delete", delete_files=["dv-x/d.parquet"])
    with pytest.raises(ValueError, match="dv_counts"):
        publish_manifest(
            t,
            [],
            mode="delete",
            delete_files=["dv-x/d.parquet"],
            dv_counts={"some/other-file.parquet": 2},
        )
    assert latest_version(t) == 0
    # covering counts commit fine
    v = publish_manifest(
        t, [], mode="delete", delete_files=["dv-x/d.parquet"], dv_counts={target: 2}
    )
    assert v == 1


def test_legacy_manifest_without_dv_counts_fails_safe(spark, sf_dir, tmp_path):
    """A pre-invariant manifest (delete_files but no dv_counts) must read
    slow-but-correct: every file routes through the DV path rather than
    none, so deleted rows stay hidden."""
    import json as _json

    from reactivestreams_kinesis_spark.operators.snapshots import _manifest_path
    from reactivestreams_kinesis_spark.sources.snapshot_source import (
        register_snapshot_source,
    )

    t = str(tmp_path / "t")
    base = _mk_table(spark, sf_dir, tmp_path / "t")
    delete_where(spark, t, [("c_acctbal", "<", 0.0)], strategy="merge_on_read")
    mp = _manifest_path(t, 1)
    with open(mp) as f:
        m = _json.load(f)
    del m["dv_counts"]
    with open(mp, "w") as f:
        _json.dump(m, f)

    register_snapshot_source(spark)
    got = spark.read.format("snapshot_table").option("path", t).load()
    assert got.filter("c_acctbal < 0").count() == 0
    assert got.count() == base.filter("c_acctbal >= 0").count()


def test_merge_sink_bootstrap_replay_noop(spark, sf_dir, tmp_path):
    """The merge sink's table-bootstrap commit must be replay-safe under
    BOTH strategies: re-applying epoch 0 (foreachBatch's at-least-once
    contract) publishes no extra version and emits no spurious feed rows."""
    from reactivestreams_kinesis_spark.operators.snapshots import merge_upsert

    for strategy in ("copy_on_write", "merge_on_read"):
        t = str(tmp_path / strategy)
        batch = load_table(spark, sf_dir, "customer").select(
            "c_custkey", "c_nationkey", "c_acctbal"
        ).limit(50)
        txn = "merge-scope-0"
        # bootstrap: what apply_batch does when the table doesn't exist
        snapshot_commit(batch, t, txn_id=txn)
        v0 = latest_version(t)
        n0 = read_snapshot(spark, t).count()
        # replay of epoch 0: table now exists, apply_batch routes through
        # merge_upsert with the SAME txn id and the chosen strategy
        merge_upsert(spark, t, batch, "c_custkey", txn_id=txn, strategy=strategy)
        assert latest_version(t) == v0, f"{strategy}: replay published a version"
        assert read_snapshot(spark, t).count() == n0


_CF_OP = st.one_of(
    st.tuples(st.just("append"), st.lists(st.tuples(st.integers(0, 5), st.integers(0, 9)), min_size=1, max_size=6)),
    st.tuples(st.just("pos_del"), st.integers(0, 9)),
    st.tuples(st.just("eq_del"), st.lists(st.integers(0, 5), min_size=1, max_size=3)),
    st.tuples(st.just("update"), st.tuples(st.integers(0, 5), st.integers(100, 109))),
    st.tuples(st.just("merge"), st.lists(st.tuples(st.integers(0, 5), st.integers(200, 209)), min_size=1, max_size=3, unique_by=lambda kv: kv[0])),
    st.tuples(st.just("cow_del"), st.integers(0, 9)),
    st.tuples(st.just("compact"), st.none()),
    # schema evolution interleaved with the DML (round 10): rename a
    # data column mid-history (the feed must cross it by physical
    # identity), widen v int→bigint (straddled files must still diff)
    st.tuples(st.just("rename"), st.sampled_from(["k", "v"])),
    st.tuples(st.just("widen"), st.none()),
)


@given(
    init=st.lists(st.tuples(st.integers(0, 5), st.integers(0, 9)), min_size=1, max_size=8),
    ops=st.lists(_CF_OP, min_size=1, max_size=5),
)
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
def test_change_feed_replay_over_random_history(spark, tmp_path_factory, init, ops):
    """The round-9 replay invariant, PROPERTY-TESTED: over any random
    interleaving of appends, both merge-on-read delete forms, CoW
    updates/deletes, keyed merges, reorg compactions — and, since round
    10, RENAME COLUMN and TYPE WIDENING interleaved with the DML —
    v0 + feed(0→tip) ≡ tip — inserts/update_postimages added,
    deletes/update_preimages removed, reorgs and renames contributing
    nothing. Catches the interaction classes example tests can only
    sample: feed-over-rewrite after stacked MoR deletes, retraction of
    rows a later rewrite replaced, compaction between any two ops, a
    rename between a delete and its feed read, a widening straddled by
    a rewrite diff. Rows compare POSITIONALLY (column order is stable
    across renames), so the invariant holds under whatever the ending
    names are."""
    import uuid as _uuid

    from reactivestreams_kinesis_spark.operators.snapshots import (
        compact_snapshot,
        delete_by_key,
        delete_where,
        latest_version,
        merge_upsert,
        read_snapshot,
        rename_column,
        snapshot_change_feed,
        snapshot_commit,
        update_where,
    )

    t = str(tmp_path_factory.mktemp("cfprop") / f"t_{_uuid.uuid4().hex[:6]}")
    uid = 0
    names = {"uid": "uid", "k": "k", "v": "v"}  # role → current logical name
    v_type = "int"
    rename_n = 0

    def mk_df(rows):
        schema = (
            f"{names['uid']} bigint, {names['k']} int, {names['v']} {v_type}"
        )
        return spark.createDataFrame(rows, schema)

    first = [(uid + i, k, v) for i, (k, v) in enumerate(init)]
    uid += len(init)
    snapshot_commit(mk_df(first).repartition(2), t)

    for kind, arg in ops:
        if kind == "append":
            rows = [(uid + i, k, v) for i, (k, v) in enumerate(arg)]
            uid += len(arg)
            snapshot_commit(mk_df(rows), t)
        elif kind == "pos_del":
            delete_where(
                spark, t, [(names["v"], "<", arg)], strategy="merge_on_read"
            )
        elif kind == "eq_del":
            delete_by_key(
                spark,
                t,
                mk_df([(0, k, 0) for k in arg]).select(names["k"]),
                names["k"],
            )
        elif kind == "update":
            key, newv = arg
            update_where(
                spark, t, [(names["k"], "=", key)], {names["v"]: F.lit(newv)}
            )
        elif kind == "merge":
            rows = [(uid + i, k, v) for i, (k, v) in enumerate(arg)]
            uid += len(arg)
            merge_upsert(spark, t, mk_df(rows), names["k"])
        elif kind == "cow_del":
            delete_where(spark, t, [(names["v"], "<", arg)])
        elif kind == "compact":
            compact_snapshot(spark, t, target_file_bytes=1 << 40)
        elif kind == "rename":
            rename_n += 1
            new = f"{arg}_r{rename_n}"
            rename_column(t, names[arg], new)
            names[arg] = new
        elif kind == "widen":
            if v_type == "int":
                v_type = "bigint"
                snapshot_commit(mk_df([(uid, 0, 0)]), t)
                uid += 1

    tip_v = latest_version(t)

    def rows_at(version):
        try:
            return {
                tuple(r)  # positional: (uid, k, v) roles, any names
                for r in read_snapshot(spark, t, version).collect()
            }
        except ValueError:
            return set()  # a rewrite can empty the file set entirely

    tip_rows = rows_at(tip_v)
    if tip_v == 0:
        return
    try:
        feed_df = snapshot_change_feed(spark, t, from_version=0)
    except ValueError:
        # reorg/rename-only history: no changes means the tip equals v0
        assert tip_rows == rows_at(0)
        return
    data_cols = [
        c for c in feed_df.columns if c not in ("_change_type", "_commit_version")
    ]
    feed = feed_df.collect()
    replayed = set(rows_at(0))
    for r in sorted(feed, key=lambda r: r["_commit_version"]):
        key = tuple(r[c] for c in data_cols)
        if r["_change_type"] in ("insert", "update_postimage"):
            replayed.add(key)
        else:
            replayed.discard(key)
    assert replayed == tip_rows
