"""Full conditional MERGE INTO (operators/merge_into.py): clause
semantics, file-granular rewrite mechanics, guards, idempotency, and
change-feed composition."""

from __future__ import annotations

import uuid as _uuid

import pytest
from pyspark.sql import functions as F

from reactivestreams_kinesis_spark.operators.merge_into import merge_into
from reactivestreams_kinesis_spark.operators.snapshots import (
    _read_manifest,
    latest_version,
    read_snapshot,
    snapshot_change_feed,
    snapshot_commit,
)

pytestmark = pytest.mark.usefixtures("spark")


def _t(tmp_path):
    return str(tmp_path / f"mi_{_uuid.uuid4().hex[:6]}")


def _mk_target(spark, t, rows=None):
    rows = rows or [(1, "a", 10), (2, "b", 20), (3, "c", 30), (4, "d", 40)]
    snapshot_commit(
        spark.createDataFrame(rows, "k int, name string, qty int").repartition(2),
        t,
    )
    return rows


def _rows(df):
    return sorted([tuple(r) for r in df.collect()], key=str)


def test_merge_into_three_clauses(spark, tmp_path):
    """DELETE (checked first), conditional UPDATE with expressions over
    both sides, expression INSERT — including a NULL source key (matches
    nothing, inserts) and a clause condition evaluating NULL (clause
    does not fire, row keeps)."""
    t = _t(tmp_path)
    _mk_target(spark, t)
    src = spark.createDataFrame(
        [(2, 5), (3, -1), (5, 50), (None, 99), (1, None)],
        "k int, delta int",
    )
    merge_into(
        spark,
        t,
        src,
        "k",
        when_matched_update={"qty": "t.qty + s.delta"},
        matched_update_condition="s.delta > 0",
        when_matched_delete=True,
        matched_delete_condition="s.delta < 0",
        when_not_matched_insert={
            "k": "s.k",
            "name": "concat('new', CAST(s.delta AS STRING))",
            "qty": "s.delta",
        },
    )
    assert _rows(read_snapshot(spark, t)) == sorted(
        [
            (1, "a", 10),        # matched, both conditions NULL -> keep
            (2, "b", 25),        # update fires
            (4, "d", 40),        # unmatched target
            (5, "new50", 50),    # insert
            (None, "new99", 99), # NULL key: not matched -> insert
        ],
        key=str,
    )


def test_merge_into_untouched_files_republish_verbatim(spark, tmp_path):
    """Only files owning a matched key rewrite: a range-clustered target
    hit on one end keeps the other end's files byte-identical in the new
    manifest."""
    t = _t(tmp_path)
    df = spark.range(1, 401).select(
        F.col("id").cast("int").alias("k"),
        F.concat(F.lit("n"), F.col("id")).alias("name"),
        (F.col("id") * 10).cast("int").alias("qty"),
    )
    snapshot_commit(df.repartitionByRange(4, "k"), t)
    before = set(_read_manifest(t, latest_version(t))["files"])
    src = spark.createDataFrame([(1, 1), (2, 1), (3, 1)], "k int, delta int")
    merge_into(
        spark, t, src, "k", when_matched_update={"qty": "t.qty + s.delta"}
    )
    after = set(_read_manifest(t, latest_version(t))["files"])
    kept = before & after
    assert kept, "low-key merge must retain the untouched range files"
    assert len(kept) >= 2
    got = {r["k"]: r["qty"] for r in read_snapshot(spark, t).collect()}
    assert got[1] == 11 and got[2] == 21 and got[400] == 4000


def test_merge_into_guards_and_idempotency(spark, tmp_path):
    t = _t(tmp_path)
    _mk_target(spark, t)
    dup = spark.createDataFrame([(2, 1), (2, 2)], "k int, delta int")
    with pytest.raises(ValueError, match="duplicated"):
        merge_into(spark, t, dup, "k", when_matched_update={"qty": "s.delta"})
    with pytest.raises(ValueError, match="at least one WHEN clause"):
        merge_into(spark, t, dup.limit(1), "k", when_not_matched_insert=False)
    with pytest.raises(ValueError, match="unknown columns"):
        merge_into(
            spark, t, dup.limit(1), "k", when_matched_update={"nope": "s.delta"}
        )
    src = spark.createDataFrame([(2, 100)], "k int, delta int")
    v = merge_into(
        spark, t, src, "k",
        when_matched_update={"qty": "s.delta"},
        txn_id="mi-epoch-7",
    )
    assert (
        merge_into(
            spark, t, src, "k",
            when_matched_update={"qty": "s.delta"},
            txn_id="mi-epoch-7",
        )
        == v
    )
    assert latest_version(t) == v


def test_merge_into_delete_only_no_match_is_noop(spark, tmp_path):
    t = _t(tmp_path)
    _mk_target(spark, t)
    tip = latest_version(t)
    src = spark.createDataFrame([(99, 0)], "k int, delta int")
    v = merge_into(spark, t, src, "k", when_matched_delete=True,
                   when_not_matched_insert=False)
    assert v == tip, "nothing matched and inserts disabled: no commit"


def test_merge_into_change_feed_replays(spark, tmp_path):
    """The merge publishes a keyed rewrite commit: the change feed
    crosses it and the replay invariant (v0 + feed ≡ tip) holds."""
    t = _t(tmp_path)
    _mk_target(spark, t)
    src = spark.createDataFrame([(2, 5), (3, -1), (9, 90)], "k int, delta int")
    merge_into(
        spark, t, src, "k",
        when_matched_update={"qty": "t.qty + s.delta"},
        matched_update_condition="s.delta > 0",
        when_matched_delete=True,
        matched_delete_condition="s.delta < 0",
        when_not_matched_insert={"k": "s.k", "name": "lit_x", "qty": "s.delta"}
        if False
        else {"k": "s.k", "name": "CAST('x' AS STRING)", "qty": "s.delta"},
    )
    feed = snapshot_change_feed(spark, t, from_version=0).collect()
    replayed = {tuple(r) for r in read_snapshot(spark, t, 0).collect()}
    for r in sorted(feed, key=lambda r: r["_commit_version"]):
        key = (r["k"], r["name"], r["qty"])
        if r["_change_type"] in ("insert", "update_postimage"):
            replayed.add(key)
        else:
            replayed.discard(key)
    assert replayed == {tuple(r) for r in read_snapshot(spark, t).collect()}


def test_merge_into_insert_only_pads_typed_nulls(spark, tmp_path):
    """An insert-only merge (no key matches, so NO file is touched)
    whose source lacks some table columns: the NULL padding must carry
    the declared types — an untyped lit(None) is VoidType, which has no
    unionByName partner to coerce against in this shape and would fail
    at the parquet writer."""
    t = _t(tmp_path)
    _mk_target(spark, t)
    src = spark.createDataFrame([(100,), (101,)], "k int")  # no name/qty
    merge_into(spark, t, src, "k")
    got = {r["k"]: r for r in read_snapshot(spark, t).collect()}
    assert set(got) == {1, 2, 3, 4, 100, 101}
    assert got[100]["name"] is None and got[100]["qty"] is None
    # declared schema unchanged (no void-type leakage into the manifest)
    from pyspark.sql.types import StructType

    m = _read_manifest(t, latest_version(t))
    names = {f.name: f.dataType.simpleString()
             for f in StructType.fromJson(m["schema"]).fields}
    assert names == {"k": "int", "name": "string", "qty": "int"}


def test_merge_into_composite_key(spark, tmp_path):
    """Composite equality keys (round 12): matching, duplicate
    detection, file targeting, and the insert anti-join all range over
    the column TUPLE — a source row sharing only one key column with a
    target row inserts instead of matching; duplicated tuples refuse
    while duplicated single-column values across distinct tuples are
    legal; all three clauses compose."""
    t = _t(tmp_path)
    base = [
        (a, b, a * 10 + (1 if b == "y" else 0))
        for a in range(3)
        for b in ("x", "y")
    ]
    snapshot_commit(
        spark.createDataFrame(base, "a int, b string, qty int").repartition(2), t
    )
    src = spark.createDataFrame(
        [
            (0, "x", 100),   # matches (0, x) -> update
            (0, "y", -1),    # matches (0, y) -> delete (negative)
            (0, "z", 7),     # a=0 exists but (0, z) doesn't -> insert
            (9, "x", 8),     # b=x exists but (9, x) doesn't -> insert
        ],
        "a int, b string, delta int",
    )
    merge_into(
        spark, t, src, [("a", "a"), ("b", "b")],
        when_matched_delete=True,
        matched_delete_condition="s.delta < 0",
        when_matched_update={"qty": "t.qty + s.delta"},
        when_not_matched_insert={"a": "s.a", "b": "s.b", "qty": "s.delta"},
    )
    got = {(r["a"], r["b"]): r["qty"] for r in read_snapshot(spark, t).collect()}
    assert got[(0, "x")] == 100
    assert (0, "y") not in got
    assert got[(0, "z")] == 7 and got[(9, "x")] == 8
    assert got[(1, "x")] == 10 and got[(2, "y")] == 21  # untouched tuples
    # duplicate TUPLE refuses; same a across distinct b does not
    with pytest.raises(ValueError, match="duplicated"):
        merge_into(
            spark, t,
            spark.createDataFrame([(1, "x", 1), (1, "x", 2)], "a int, b string, delta int"),
            [("a", "a"), ("b", "b")],
            when_matched_update={"qty": "s.delta"},
        )
    merge_into(
        spark, t,
        spark.createDataFrame([(1, "x", 1), (1, "y", 2)], "a int, b string, delta int"),
        [("a", "a"), ("b", "b")],
        when_matched_update={"qty": "s.delta"},
        when_not_matched_insert=False,
    )
    got = {(r["a"], r["b"]): r["qty"] for r in read_snapshot(spark, t).collect()}
    assert got[(1, "x")] == 1 and got[(1, "y")] == 2


def test_merge_into_composite_key_differing_names_and_nulls(spark, tmp_path):
    """Composite keys with per-side names ([(t, s), ...]); NULL in ANY
    source key column means the row matches nothing (SQL equality) and
    flows to NOT MATCHED."""
    t = _t(tmp_path)
    snapshot_commit(
        spark.createDataFrame(
            [(1, "x", 10), (2, "y", 20)], "a int, b string, qty int"
        ),
        t,
    )
    src = spark.createDataFrame(
        [(1, "x", 99), (None, "y", 5)], "ka int, kb string, v int"
    )
    merge_into(
        spark, t, src, [("a", "ka"), ("b", "kb")],
        when_matched_update={"qty": "s.v"},
        when_not_matched_insert={"a": "s.ka", "b": "s.kb", "qty": "s.v"},
    )
    got = {(r["a"], r["b"]): r["qty"] for r in read_snapshot(spark, t).collect()}
    assert got[(1, "x")] == 99
    assert got[(None, "y")] == 5  # NULL-key row inserted, never matched
    assert got[(2, "y")] == 20
