"""Incremental materialized views (operators/matview.py): create /
refresh-from-change-feed / read, against full-recompute truth.

The maintenance invariant under test everywhere:
``read_materialized_view(view)`` after any refresh ≡ the spec's
aggregate run directly over ``read_snapshot(source)`` at the consumed
version — count/sum/avg by retraction arithmetic alone, min/max through
the dirty-group recompute. Decimal value columns make the checks
bit-exact (no float-summation-order caveats)."""

from __future__ import annotations

import os
import uuid as _uuid
from decimal import Decimal

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from reactivestreams_kinesis_spark.operators.matview import (
    create_materialized_view,
    materialized_view_status,
    read_materialized_view,
    refresh_materialized_view,
)
from reactivestreams_kinesis_spark.operators.snapshots import (
    compact_snapshot,
    delete_by_key,
    delete_where,
    latest_version,
    merge_upsert,
    read_snapshot,
    snapshot_commit,
    update_where,
    vacuum,
)

pytestmark = pytest.mark.usefixtures("spark")


def _dirs(tmp_path):
    u = _uuid.uuid4().hex[:6]
    return str(tmp_path / f"src_{u}"), str(tmp_path / f"view_{u}")


def _customer_src(spark, sf_dir):
    return (
        spark.read.parquet(os.path.join(sf_dir, "customer.parquet"))
        .select(
            "c_custkey",
            "c_nationkey",
            F.col("c_acctbal").cast("decimal(12,2)").alias("bal"),
        )
    )


_FULL_AGGS = {
    "n": ("count", None),
    "total": ("sum", "bal"),
    "lo": ("min", "bal"),
    "hi": ("max", "bal"),
    "mean": ("avg", "bal"),
    "nkeys": ("count", "c_custkey"),
}


def _recompute(df):
    """The spec of _FULL_AGGS evaluated directly — avg in the same
    exact sum/count form the view stores, so comparisons are bit-exact."""
    return df.groupBy("c_nationkey").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("bal").alias("total"),
        F.min("bal").alias("lo"),
        F.max("bal").alias("hi"),
        (F.sum("bal").cast("double") / F.count("bal")).alias("mean"),
        F.count("c_custkey").alias("nkeys"),
    )


def _rows(df):
    return {tuple(r) for r in df.collect()}


def test_mv_refresh_matches_recompute_over_mixed_dml(spark, sf_dir, tmp_path):
    """Append + MoR position delete + CoW update + equality delete —
    every feed change kind — then one incremental refresh ≡ full
    recompute at the tip; a replayed refresh publishes nothing."""
    t, v = _dirs(tmp_path)
    snapshot_commit(_customer_src(spark, sf_dir).repartition(4), t)
    create_materialized_view(
        spark, v, t, group_by=["c_nationkey"], aggs=_FULL_AGGS
    )

    ins = spark.read.parquet(os.path.join(sf_dir, "nation.parquet")).select(
        (F.lit(100000) + F.col("n_nationkey")).cast("bigint").alias("c_custkey"),
        F.col("n_nationkey").alias("c_nationkey"),
        F.col("n_nationkey").cast("decimal(12,2)").alias("bal"),
    )
    snapshot_commit(ins, t)
    delete_where(spark, t, [("bal", "<", 0.0)], strategy="merge_on_read")
    update_where(
        spark,
        t,
        [("c_custkey", "<=", 50)],
        {"bal": F.col("bal") + F.lit(1000).cast("decimal(12,2)")},
    )
    delete_by_key(
        spark, t, spark.createDataFrame([(3,), (7,)], "c_nationkey int"), "c_nationkey"
    )

    refresh_materialized_view(spark, v)
    assert _rows(read_materialized_view(spark, v)) == _rows(
        _recompute(read_snapshot(spark, t))
    )
    st_ = materialized_view_status(v)
    assert st_["source_version"] == latest_version(t)

    tip = latest_version(v)
    assert refresh_materialized_view(spark, v) == tip
    assert latest_version(v) == tip, "an already-current refresh must publish nothing"


def test_mv_sum_nulls_and_group_death_rebirth(spark, tmp_path):
    """SQL aggregate edges: a group whose non-null contributors all
    retract reads SUM/AVG/MIN/MAX = NULL with COUNT(*) still live; a
    group whose rows all retract disappears; a later insert rebirths it
    from zero (no stale state)."""
    t, v = _dirs(tmp_path)
    d = lambda x: None if x is None else Decimal(str(x))
    mk = lambda rows: spark.createDataFrame(
        [(i, k, d(x)) for i, k, x in rows], "id bigint, k int, x decimal(10,2)"
    )
    snapshot_commit(
        mk([(1, 1, 5.0), (2, 1, None), (3, 2, 7.0), (4, 3, 9.0)]), t
    )
    create_materialized_view(
        spark,
        v,
        t,
        group_by=["k"],
        aggs={
            "n": ("count", None),
            "s": ("sum", "x"),
            "m": ("avg", "x"),
            "lo": ("min", "x"),
            "hi": ("max", "x"),
        },
    )
    # retract group 1's only non-null contributor; kill group 2 entirely
    delete_where(spark, t, [("id", "=", 1)], strategy="merge_on_read")
    delete_where(spark, t, [("k", "=", 2)])
    refresh_materialized_view(spark, v)
    got = {r["k"]: r for r in read_materialized_view(spark, v).collect()}
    assert set(got) == {1, 3}
    assert got[1]["n"] == 1
    assert got[1]["s"] is None and got[1]["m"] is None
    assert got[1]["lo"] is None and got[1]["hi"] is None
    # rebirth group 2 with a fresh value
    snapshot_commit(mk([(5, 2, 2.5)]), t)
    refresh_materialized_view(spark, v)
    got = {r["k"]: r for r in read_materialized_view(spark, v).collect()}
    assert got[2]["n"] == 1 and got[2]["s"] == got[2]["lo"]


def test_mv_quiet_range_advances_watermark(spark, sf_dir, tmp_path):
    """A reorg-only range (compaction) changes no rows: refresh advances
    the watermark over identical state instead of erroring."""
    t, v = _dirs(tmp_path)
    snapshot_commit(_customer_src(spark, sf_dir).repartition(4), t)
    create_materialized_view(
        spark, v, t, group_by=["c_nationkey"], aggs={"n": ("count", None)}
    )
    before = _rows(read_materialized_view(spark, v))
    compact_snapshot(spark, t, target_file_bytes=1 << 40)
    refresh_materialized_view(spark, v)
    assert materialized_view_status(v)["source_version"] == latest_version(t)
    assert _rows(read_materialized_view(spark, v)) == before


def test_mv_vacuumed_gap_rebuild_or_error(spark, sf_dir, tmp_path):
    """A vacuumed manifest inside the unconsumed range: on_gap='error'
    refuses loudly (never a silently-truncated feed), on_gap='rebuild'
    recomputes the same answer at full price."""
    t, v = _dirs(tmp_path)
    src = _customer_src(spark, sf_dir)
    snapshot_commit(src.filter("c_custkey <= 40").repartition(2), t)
    create_materialized_view(
        spark, v, t, group_by=["c_nationkey"], aggs=_FULL_AGGS
    )
    snapshot_commit(src.filter("c_custkey > 40 AND c_custkey <= 60"), t)
    delete_where(spark, t, [("bal", "<", 0.0)])
    vacuum(t, keep_from_version=latest_version(t))
    with pytest.raises(FileNotFoundError, match="vacuumed"):
        refresh_materialized_view(spark, v, on_gap="error")
    refresh_materialized_view(spark, v, on_gap="rebuild")
    assert _rows(read_materialized_view(spark, v)) == _rows(
        _recompute(read_snapshot(spark, t))
    )


def test_mv_dirty_recompute_semijoin_path(spark, sf_dir, tmp_path, monkeypatch):
    """The min/max dirty-group recompute has two physical forms — the
    collected IN-predicate prune scan and the null-safe semi-join; both
    must produce the identical view."""
    import reactivestreams_kinesis_spark.operators.matview as mv

    src = _customer_src(spark, sf_dir)
    results = []
    for cap in (256, 0):
        t, v = _dirs(tmp_path)
        monkeypatch.setattr(mv, "_DIRTY_PRUNE_CAP", cap)
        snapshot_commit(src.repartition(4), t)
        create_materialized_view(
            spark, v, t, group_by=["c_nationkey"], aggs=_FULL_AGGS
        )
        delete_where(spark, t, [("bal", ">", 9000.0)], strategy="merge_on_read")
        refresh_materialized_view(spark, v)
        results.append(_rows(read_materialized_view(spark, v)))
        assert results[-1] == _rows(_recompute(read_snapshot(spark, t)))
    assert results[0] == results[1]


def test_mv_null_group_keys_and_where(spark, tmp_path):
    """NULL group keys aggregate into SQL's null bucket (a join-based
    state merge would drop them — the union+re-aggregate must not), and
    the WHERE filter applies identically to base rows and feed rows."""
    t, v = _dirs(tmp_path)
    d = lambda x: None if x is None else Decimal(str(x))
    mk = lambda rows: spark.createDataFrame(
        [(i, k, d(x)) for i, k, x in rows], "id bigint, k int, x decimal(10,2)"
    )
    snapshot_commit(
        mk([(1, None, 5.0), (2, None, 3.0), (3, 1, 7.0), (4, 1, 0.5)]), t
    )
    create_materialized_view(
        spark,
        v,
        t,
        group_by=["k"],
        aggs={"n": ("count", None), "s": ("sum", "x"), "hi": ("max", "x")},
        where="x >= 1.0",
    )
    # retraction in the NULL group (dirty recompute must hit the null
    # bucket through the null-safe semi-join) + an insert below the WHERE
    snapshot_commit(mk([(5, None, 0.2), (6, 1, 9.0)]), t)
    delete_where(spark, t, [("id", "=", 1)], strategy="merge_on_read")
    refresh_materialized_view(spark, v)
    exp = (
        read_snapshot(spark, t)
        .filter("x >= 1.0")
        .groupBy("k")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("x").alias("s"),
            F.max("x").alias("hi"),
        )
    )
    assert _rows(read_materialized_view(spark, v)) == _rows(exp)


def test_mv_time_travel_reads_past_refreshes(spark, tmp_path):
    """Each refresh is a snapshot version of the VIEW: reading an older
    view version returns that refresh's state exactly."""
    t, v = _dirs(tmp_path)
    d = lambda x: None if x is None else Decimal(str(x))
    mk = lambda rows: spark.createDataFrame(
        [(i, k, d(x)) for i, k, x in rows], "id bigint, k int, x decimal(10,2)"
    )
    snapshot_commit(mk([(1, 1, 5.0), (2, 2, 3.0)]), t)
    create_materialized_view(
        spark, v, t, group_by=["k"], aggs={"n": ("count", None), "s": ("sum", "x")}
    )
    v1 = latest_version(v)
    first = _rows(read_materialized_view(spark, v))
    snapshot_commit(mk([(3, 1, 2.0)]), t)
    refresh_materialized_view(spark, v)
    assert _rows(read_materialized_view(spark, v, version=v1)) == first
    assert _rows(read_materialized_view(spark, v)) != first


def test_mv_spec_validation(spark, sf_dir, tmp_path):
    t, v = _dirs(tmp_path)
    snapshot_commit(_customer_src(spark, sf_dir).limit(10), t)
    with pytest.raises(ValueError, match="unsupported aggregate"):
        create_materialized_view(
            spark, v, t, group_by=["c_nationkey"], aggs={"x": ("median", "bal")}
        )
    with pytest.raises(ValueError, match="collide"):
        create_materialized_view(
            spark, v, t, group_by=["c_nationkey"], aggs={"c_nationkey": ("count", None)}
        )
    with pytest.raises(ValueError, match="reserved"):
        create_materialized_view(
            spark, v, t, group_by=["c_nationkey"], aggs={"__mv_x": ("count", None)}
        )
    create_materialized_view(
        spark, v, t, group_by=["c_nationkey"], aggs={"n": ("count", None)}
    )
    with pytest.raises(FileExistsError):
        create_materialized_view(
            spark, v, t, group_by=["c_nationkey"], aggs={"n": ("count", None)}
        )


# ---- randomized model check: interleaved DML + refreshes ------------------

_MV_OP = st.one_of(
    st.tuples(
        st.just("append"),
        st.lists(
            st.tuples(st.integers(0, 4), st.integers(-5, 9) | st.none()),
            min_size=1,
            max_size=6,
        ),
    ),
    st.tuples(st.just("pos_del"), st.integers(-2, 8)),
    st.tuples(st.just("eq_del"), st.lists(st.integers(0, 4), min_size=1, max_size=2)),
    st.tuples(st.just("update"), st.tuples(st.integers(0, 4), st.integers(100, 109))),
    st.tuples(st.just("cow_del"), st.integers(-2, 8)),
    st.tuples(st.just("compact"), st.none()),
    st.tuples(st.just("refresh"), st.sampled_from(["overwrite", "merge"])),
)


@given(
    init=st.lists(
        st.tuples(st.integers(0, 4), st.integers(-5, 9) | st.none()),
        min_size=1,
        max_size=6,
    ),
    ops=st.lists(_MV_OP, min_size=1, max_size=5),
)
@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
def test_mv_matches_recompute_over_random_history(
    spark, tmp_path_factory, init, ops
):
    """Over any interleaving of appends (with NULL values), both
    merge-on-read delete forms, CoW updates/deletes, reorg compactions,
    and REFRESH POINTS — after a final refresh, the view ≡ the aggregate
    recomputed from scratch at the source tip. Interleaved refreshes
    matter: each one snapshots intermediate state that later arithmetic
    must extend, which a single create-then-refresh test never exercises."""
    t = str(tmp_path_factory.mktemp("mvprop") / f"t_{_uuid.uuid4().hex[:6]}")
    v = str(tmp_path_factory.mktemp("mvprop") / f"v_{_uuid.uuid4().hex[:6]}")
    uid = 0

    def mk(rows):
        return spark.createDataFrame(rows, "id bigint, k int, x int")

    first = [(uid + i, k, x) for i, (k, x) in enumerate(init)]
    uid += len(init)
    snapshot_commit(mk(first).repartition(2), t)
    create_materialized_view(
        spark,
        v,
        t,
        group_by=["k"],
        aggs={
            "n": ("count", None),
            "s": ("sum", "x"),
            "lo": ("min", "x"),
            "hi": ("max", "x"),
        },
    )

    for kind, arg in ops:
        if kind == "append":
            rows = [(uid + i, k, x) for i, (k, x) in enumerate(arg)]
            uid += len(arg)
            snapshot_commit(mk(rows), t)
        elif kind == "pos_del":
            delete_where(spark, t, [("x", "<", arg)], strategy="merge_on_read")
        elif kind == "eq_del":
            delete_by_key(
                spark, t, mk([(0, k, 0) for k in arg]).select("k"), "k"
            )
        elif kind == "update":
            key, newx = arg
            update_where(spark, t, [("k", "=", key)], {"x": F.lit(newx)})
        elif kind == "cow_del":
            delete_where(spark, t, [("x", "<", arg)])
        elif kind == "compact":
            compact_snapshot(spark, t, target_file_bytes=1 << 40)
        elif kind == "refresh":
            # both strategies must extend intermediate state identically
            # (keys here are never NULL, so merge is always legal)
            refresh_materialized_view(spark, v, strategy=arg)

    refresh_materialized_view(spark, v)
    try:
        src = read_snapshot(spark, t)
    except ValueError:
        # a rewrite emptied the table: the view must hold zero groups
        assert read_materialized_view(spark, v).count() == 0
        return
    exp = src.groupBy("k").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("s"),
        F.min("x").alias("lo"),
        F.max("x").alias("hi"),
    )
    assert _rows(read_materialized_view(spark, v)) == _rows(exp)


# ---- merge (delta-proportional) refresh strategy --------------------------


def test_mv_merge_strategy_matches_overwrite(spark, sf_dir, tmp_path):
    """Twin views over the same DML history, one refreshed with each
    strategy: identical read-out, both equal to the recompute. The merge
    view's files holding untouched groups never rewrite (the commit is
    a merge/eq-delete, not a full overwrite)."""
    t = str(tmp_path / f"src_{_uuid.uuid4().hex[:6]}")
    vo = str(tmp_path / f"vo_{_uuid.uuid4().hex[:6]}")
    vm = str(tmp_path / f"vm_{_uuid.uuid4().hex[:6]}")
    snapshot_commit(_customer_src(spark, sf_dir).repartition(4), t)
    for v in (vo, vm):
        create_materialized_view(
            spark, v, t, group_by=["c_nationkey"], aggs=_FULL_AGGS
        )
    ins = spark.read.parquet(os.path.join(sf_dir, "nation.parquet")).select(
        (F.lit(100000) + F.col("n_nationkey")).cast("bigint").alias("c_custkey"),
        F.col("n_nationkey").alias("c_nationkey"),
        F.col("n_nationkey").cast("decimal(12,2)").alias("bal"),
    )
    snapshot_commit(ins, t)
    delete_where(spark, t, [("bal", "<", 0.0)], strategy="merge_on_read")
    delete_by_key(
        spark, t, spark.createDataFrame([(3,), (7,)], "c_nationkey int"), "c_nationkey"
    )
    refresh_materialized_view(spark, vo, strategy="overwrite")
    refresh_materialized_view(spark, vm, strategy="merge")
    exp = _rows(_recompute(read_snapshot(spark, t)))
    assert _rows(read_materialized_view(spark, vo)) == exp
    assert _rows(read_materialized_view(spark, vm)) == exp
    # both watermarks advanced to the source tip
    assert materialized_view_status(vm)["source_version"] == latest_version(t)
    # replay is a no-op for both
    tip = latest_version(vm)
    assert refresh_materialized_view(spark, vm, strategy="merge") == tip


def test_mv_merge_strategy_death_rebirth_and_pure_death(spark, tmp_path):
    """Dead groups equality-delete from the view; a refresh that ONLY
    kills groups still advances the watermark; a later insert rebirths
    the group from zero."""
    t, v = _dirs(tmp_path)
    mk = lambda rows: spark.createDataFrame(rows, "id bigint, k int, x int")
    snapshot_commit(mk([(1, 1, 5), (2, 2, 3), (3, 3, 9)]), t)
    create_materialized_view(
        spark, v, t, group_by=["k"],
        aggs={"n": ("count", None), "s": ("sum", "x")},
    )
    delete_where(spark, t, [("k", "=", 2)])
    refresh_materialized_view(spark, v, strategy="merge")
    assert materialized_view_status(v)["source_version"] == latest_version(t)
    got = {r["k"]: r for r in read_materialized_view(spark, v).collect()}
    assert set(got) == {1, 3}
    snapshot_commit(mk([(4, 2, 11)]), t)
    refresh_materialized_view(spark, v, strategy="merge")
    got = {r["k"]: r for r in read_materialized_view(spark, v).collect()}
    assert got[2]["n"] == 1 and got[2]["s"] == 11


def test_mv_merge_strategy_crash_between_phases_replays(
    spark, tmp_path, monkeypatch
):
    """Kill the refresh between the eq-delete phase and the merge phase:
    the watermark has NOT advanced, the replayed refresh recomputes from
    the watermark state (not the half-advanced tip), the staged delete's
    txn id makes its replay a no-op, and the final state matches the
    recompute."""
    import reactivestreams_kinesis_spark.operators.matview as mv
    import reactivestreams_kinesis_spark.operators.snapshots as snaps

    t, v = _dirs(tmp_path)
    mk = lambda rows: spark.createDataFrame(rows, "id bigint, k int, x int")
    snapshot_commit(mk([(1, 1, 5), (2, 2, 3), (3, 3, 9), (4, 1, 2)]), t)
    create_materialized_view(
        spark, v, t, group_by=["k"],
        aggs={"n": ("count", None), "s": ("sum", "x"), "hi": ("max", "x")},
    )
    # kill group 2 (exercises the delete phase) and mutate group 1
    delete_where(spark, t, [("k", "=", 2)])
    delete_where(spark, t, [("x", ">", 4)], strategy="merge_on_read")

    real_merge = snaps.merge_upsert
    calls = {"n": 0}

    def exploding_merge(*a, **kw):
        calls["n"] += 1
        if calls["n"] == 1:
            raise RuntimeError("simulated crash after delete phase")
        return real_merge(*a, **kw)

    monkeypatch.setattr(snaps, "merge_upsert", exploding_merge)
    with pytest.raises(RuntimeError, match="simulated crash"):
        refresh_materialized_view(spark, v, strategy="merge")
    sv = materialized_view_status(v)["source_version"]
    assert sv == 0, "watermark must not advance past a half-done refresh"
    refresh_materialized_view(spark, v, strategy="merge")
    exp = (
        read_snapshot(spark, t)
        .groupBy("k")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("x").alias("s"),
            F.max("x").alias("hi"),
        )
    )
    assert _rows(read_materialized_view(spark, v)) == _rows(exp)
    assert materialized_view_status(v)["source_version"] == latest_version(t)


def test_mv_merge_strategy_null_group_refuses(spark, tmp_path):
    t, v = _dirs(tmp_path)
    mk = lambda rows: spark.createDataFrame(rows, "id bigint, k int, x int")
    snapshot_commit(mk([(1, None, 5), (2, 1, 3)]), t)
    create_materialized_view(
        spark, v, t, group_by=["k"], aggs={"n": ("count", None)}
    )
    snapshot_commit(mk([(3, None, 7)]), t)
    with pytest.raises(ValueError, match="NULL group key"):
        refresh_materialized_view(spark, v, strategy="merge")
    # the overwrite strategy maintains the same history fine
    refresh_materialized_view(spark, v, strategy="overwrite")
    assert {tuple(r) for r in read_materialized_view(spark, v).collect()} == {
        (None, 2),
        (1, 1),
    }


def test_mv_merge_strategy_composite_key(spark, sf_dir, tmp_path):
    """Composite group keys under strategy='merge' (round-12: the last
    not-delta-proportional refresh path closed): the equality delete
    and the merge primitive key on the column TUPLE, so a
    high-cardinality composite-key view refreshes delta-proportionally.
    Full DML history (insert, CoW delete, MoR delete) with dirty
    min/max extremes; merge read-out ≡ overwrite twin ≡ recompute."""
    t = str(tmp_path / f"src_{_uuid.uuid4().hex[:6]}")
    vo = str(tmp_path / f"vo_{_uuid.uuid4().hex[:6]}")
    vm = str(tmp_path / f"vm_{_uuid.uuid4().hex[:6]}")
    mk = lambda rows: spark.createDataFrame(rows, "a int, b string, x int")
    snapshot_commit(
        mk([(i % 5, f"g{i % 3}", i) for i in range(60)]).repartition(4), t
    )
    aggs = {"n": ("count", None), "s": ("sum", "x"), "hi": ("max", "x")}
    for vd in (vo, vm):
        create_materialized_view(spark, vd, t, group_by=["a", "b"], aggs=aggs)
    snapshot_commit(mk([(9, "new", 100), (0, "g0", 7)]), t)
    delete_where(spark, t, [("a", "=", 1)])                       # kills (1, *)
    delete_where(spark, t, [("x", ">", 50)], strategy="merge_on_read")
    refresh_materialized_view(spark, vo, strategy="overwrite")
    refresh_materialized_view(spark, vm, strategy="merge")
    exp = _rows(
        read_snapshot(spark, t).groupBy("a", "b").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("x").alias("s"),
            F.max("x").alias("hi"),
        )
    )
    assert _rows(read_materialized_view(spark, vo)) == exp
    assert _rows(read_materialized_view(spark, vm)) == exp
    assert materialized_view_status(vm)["source_version"] == latest_version(t)
    # replay no-op; death-rebirth of a composite key from zero
    assert refresh_materialized_view(spark, vm, strategy="merge") == latest_version(vm)
    snapshot_commit(mk([(1, "g1", 13)]), t)
    refresh_materialized_view(spark, vm, strategy="merge")
    got = {(r["a"], r["b"]): r for r in read_materialized_view(spark, vm).collect()}
    assert got[(1, "g1")]["n"] == 1 and got[(1, "g1")]["s"] == 13


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(st.data())
def test_mv_merge_strategy_composite_key_model(spark, tmp_path, data):
    """Randomized model check: arbitrary insert/delete interleavings on
    a 2-column-key view; after each merge refresh the read-out equals
    the recompute over the live rows — the same invariant the
    single-key model check pins, now on the tuple path."""
    t = str(tmp_path / f"src_{_uuid.uuid4().hex[:8]}")
    v = str(tmp_path / f"view_{_uuid.uuid4().hex[:8]}")
    mk = lambda rows: spark.createDataFrame(rows, "a int, b int, x int")
    nid = iter(range(10_000))
    base = [
        (data.draw(st.integers(0, 3)), data.draw(st.integers(0, 2)), next(nid))
        for _ in range(data.draw(st.integers(3, 10)))
    ]
    snapshot_commit(mk(base), t)
    create_materialized_view(
        spark, v, t, group_by=["a", "b"],
        aggs={"n": ("count", None), "s": ("sum", "x")},
    )
    for _ in range(data.draw(st.integers(1, 3))):
        if data.draw(st.booleans()):
            rows = [
                (data.draw(st.integers(0, 3)), data.draw(st.integers(0, 2)), next(nid))
                for _ in range(data.draw(st.integers(1, 4)))
            ]
            snapshot_commit(mk(rows), t)
        else:
            delete_where(spark, t, [("a", "=", data.draw(st.integers(0, 3)))])
        refresh_materialized_view(spark, v, strategy="merge")
        exp = _rows(
            read_snapshot(spark, t).groupBy("a", "b").agg(
                F.count(F.lit(1)).alias("n"), F.sum("x").alias("s")
            )
        )
        assert _rows(read_materialized_view(spark, v)) == exp


# ---- streaming maintenance -------------------------------------------------


def test_mv_stream_refresh_drains_and_resumes(spark, sf_dir, tmp_path):
    """stream_refresh_materialized_view as the batch-twin (AvailableNow):
    a backlog of DML drains to the recompute answer; more DML + a second
    run over the SAME checkpoint resumes exactly (the refresh txns and
    the stream offsets compose — nothing double-applies)."""
    from reactivestreams_kinesis_spark.operators.matview import (
        stream_refresh_materialized_view,
    )

    t, v = _dirs(tmp_path)
    ck = str(tmp_path / "ckpt")
    snapshot_commit(_customer_src(spark, sf_dir).repartition(4), t)
    create_materialized_view(
        spark, v, t, group_by=["c_nationkey"], aggs=_FULL_AGGS
    )
    ins = spark.read.parquet(os.path.join(sf_dir, "nation.parquet")).select(
        (F.lit(100000) + F.col("n_nationkey")).cast("bigint").alias("c_custkey"),
        F.col("n_nationkey").alias("c_nationkey"),
        F.col("n_nationkey").cast("decimal(12,2)").alias("bal"),
    )
    snapshot_commit(ins, t)
    delete_where(spark, t, [("bal", "<", 0.0)], strategy="merge_on_read")

    q = stream_refresh_materialized_view(
        spark, v, ck, max_versions_per_trigger=1
    )
    q.awaitTermination(120)
    assert materialized_view_status(v)["source_version"] == latest_version(t)
    assert _rows(read_materialized_view(spark, v)) == _rows(
        _recompute(read_snapshot(spark, t))
    )

    # new backlog, same checkpoint: resume must extend, not replay
    update_where(
        spark, t, [("c_custkey", "<=", 30)],
        {"bal": F.col("bal") + F.lit(500).cast("decimal(12,2)")},
    )
    delete_by_key(
        spark, t, spark.createDataFrame([(9,)], "c_nationkey int"), "c_nationkey"
    )
    q2 = stream_refresh_materialized_view(spark, v, ck)
    q2.awaitTermination(120)
    assert materialized_view_status(v)["source_version"] == latest_version(t)
    assert _rows(read_materialized_view(spark, v)) == _rows(
        _recompute(read_snapshot(spark, t))
    )


def test_mv_approx_distinct_sketch_maintenance(spark, tmp_path):
    """approx_distinct state: insert-only refreshes UNION sketches
    (estimate equals the direct hll estimate over the same rows —
    sketch algebra is deterministic), retractions route through the
    dirty recompute, and both strategies agree."""
    t, vo, vm = (
        str(tmp_path / "src"), str(tmp_path / "vo"), str(tmp_path / "vm")
    )
    mk = lambda rows: spark.createDataFrame(rows, "id bigint, k int, u string")
    snapshot_commit(
        mk([(i, i % 3, f"user{i % 40}") for i in range(100)]).repartition(2), t
    )
    aggs = {"n": ("count", None), "users": ("approx_distinct", "u")}
    for v in (vo, vm):
        create_materialized_view(spark, v, t, group_by=["k"], aggs=aggs)
    # insert-only delta: sketch-union path, no dirty recompute
    snapshot_commit(mk([(1000 + i, i % 3, f"user{40 + i}") for i in range(20)]), t)
    refresh_materialized_view(spark, vo)
    refresh_materialized_view(spark, vm, strategy="merge")

    def direct():
        return (
            read_snapshot(spark, t)
            .groupBy("k")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.hll_sketch_estimate(F.hll_sketch_agg("u")).alias("users"),
            )
        )

    exp = _rows(direct())
    assert _rows(read_materialized_view(spark, vo)) == exp
    assert _rows(read_materialized_view(spark, vm)) == exp
    # retraction: the group's sketch must recompute, not stay stale —
    # delete ALL rows of user0..user9 in group 0 and check the estimate
    # drops to the direct recompute's value
    delete_where(spark, t, [("id", "<", 30)], strategy="merge_on_read")
    refresh_materialized_view(spark, vo)
    refresh_materialized_view(spark, vm, strategy="merge")
    exp2 = _rows(direct())
    assert _rows(read_materialized_view(spark, vo)) == exp2
    assert _rows(read_materialized_view(spark, vm)) == exp2
    assert exp2 != exp, "the retraction must change the sketch estimates"


# ---- round-11 hardening ----------------------------------------------------


def test_mv_refresh_never_collects_unbounded_group_keys(
    spark, sf_dir, tmp_path, monkeypatch
):
    """Scale pin: with the dirty-group count far above _DIRTY_PRUNE_CAP,
    no refresh path may materialize the group-key set on the driver —
    the semi-join / delete_by_key branches take the keys as DataFrames.
    Every DataFrame.collect() during the refresh is instrumented and
    must stay within the bounded-probe budget."""
    import reactivestreams_kinesis_spark.operators.matview as mv

    # the classic session's concrete class — pyspark.sql.DataFrame is
    # the abstract parent whose collect the subclass overrides
    from pyspark.sql.classic.dataframe import DataFrame

    t, v = _dirs(tmp_path)
    snapshot_commit(_customer_src(spark, sf_dir).repartition(4), t)
    create_materialized_view(
        spark, v, t, group_by=["c_nationkey"], aggs=_FULL_AGGS
    )
    # a wide retraction dirties every nation group (25 > cap=1)
    delete_where(spark, t, [("bal", ">", 0.0)], strategy="merge_on_read")
    monkeypatch.setattr(mv, "_DIRTY_PRUNE_CAP", 1)

    real_collect = DataFrame.collect
    sizes: list[int] = []

    def spy(self):
        out = real_collect(self)
        sizes.append(len(out))
        return out

    monkeypatch.setattr(DataFrame, "collect", spy)
    refresh_materialized_view(spark, v)
    refresh_sizes = list(sizes)
    monkeypatch.setattr(DataFrame, "collect", real_collect)
    # budget: the cap+1 probe plus bounded metadata/stats rows — never
    # the 25-group key set, and at 1e9 groups never that either
    assert refresh_sizes, "instrumentation saw no collects at all?"
    assert max(refresh_sizes) <= 16, (
        f"a refresh collect materialized {max(refresh_sizes)} rows — "
        "group keys are reaching the driver"
    )
    assert _rows(read_materialized_view(spark, v)) == _rows(
        _recompute(read_snapshot(spark, t))
    )


def test_mv_merge_dead_keys_stay_distributed(spark, tmp_path, monkeypatch):
    """The merge strategy's dead-group equality delete must route the
    key set straight into delete_by_key as a DataFrame (existence probe
    only on the driver)."""
    from pyspark.sql.classic.dataframe import DataFrame

    t, v = _dirs(tmp_path)
    mk = lambda rows: spark.createDataFrame(rows, "id bigint, k int, x int")
    snapshot_commit(mk([(i, i, i) for i in range(40)]), t)
    create_materialized_view(
        spark, v, t, group_by=["k"], aggs={"n": ("count", None), "s": ("sum", "x")}
    )
    delete_where(spark, t, [("k", "<", 30)])  # 30 dead groups

    real_collect = DataFrame.collect
    sizes: list[int] = []

    def spy(self):
        out = real_collect(self)
        sizes.append(len(out))
        return out

    monkeypatch.setattr(DataFrame, "collect", spy)
    refresh_materialized_view(spark, v, strategy="merge")
    refresh_sizes = list(sizes)
    monkeypatch.setattr(DataFrame, "collect", real_collect)
    assert max(refresh_sizes) <= 16, (
        f"merge refresh collected {max(refresh_sizes)} rows on the driver"
    )
    got = {r["k"] for r in read_materialized_view(spark, v).collect()}
    assert got == set(range(30, 40))


def test_mv_overwrite_replay_after_merge_crash_anchors_watermark(
    spark, tmp_path, monkeypatch
):
    """A merge refresh crashes between its eq-delete phase and its merge
    phase, leaving the view TIP diverged from the watermark state (dead
    groups already deleted). A replay with strategy='overwrite' must
    fold the delta over the WATERMARK state, not the tip: a group that
    died and was reborn with MORE rows would otherwise publish
    inserts-minus-retractions (> 0, so the __mv_n >= 1 constraint can't
    catch it) — a silent wrong answer."""
    import reactivestreams_kinesis_spark.operators.snapshots as snaps

    t, v = _dirs(tmp_path)
    mk = lambda rows: spark.createDataFrame(rows, "id bigint, k int, x int")
    # group 2 starts with 3 rows; group 1 with 2 (so the crashed refresh
    # has both a dead group for its delete phase AND a live changed
    # group that reaches the merge phase where the crash fires)
    snapshot_commit(
        mk([(1, 1, 5), (5, 1, 7), (2, 2, 1), (3, 2, 2), (4, 2, 3)]), t
    )
    create_materialized_view(
        spark, v, t, group_by=["k"], aggs={"n": ("count", None), "s": ("sum", "x")}
    )
    # group 2 dies, group 1 shrinks ...
    delete_where(spark, t, [("k", "=", 2)])
    delete_where(spark, t, [("id", "=", 5)])

    def exploding_merge(*a, **kw):
        raise RuntimeError("simulated crash after delete phase")

    monkeypatch.setattr(snaps, "merge_upsert", exploding_merge)
    with pytest.raises(RuntimeError, match="simulated crash"):
        refresh_materialized_view(spark, v, strategy="merge")
    monkeypatch.undo()
    # ... and is reborn with FIVE rows (more than it lost)
    snapshot_commit(mk([(10 + i, 2, 10 + i) for i in range(5)]), t)
    refresh_materialized_view(spark, v, strategy="overwrite")
    got = {r["k"]: r for r in read_materialized_view(spark, v).collect()}
    assert got[2]["n"] == 5, (
        f"reborn group folded over the diverged tip: n={got[2]['n']}"
    )
    assert _rows(read_materialized_view(spark, v)) == _rows(
        read_snapshot(spark, t)
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("x").alias("s"))
    )


def test_mv_create_failure_removes_meta_for_retry(spark, tmp_path):
    """A failed initial build (unresolvable WHERE column) must not
    strand the exclusive-create meta file — the corrected retry
    succeeds instead of hitting FileExistsError."""
    t, v = _dirs(tmp_path)
    mk = lambda rows: spark.createDataFrame(rows, "id bigint, k int, x int")
    snapshot_commit(mk([(1, 1, 5)]), t)
    with pytest.raises(Exception):
        create_materialized_view(
            spark, v, t, group_by=["k"],
            aggs={"n": ("count", None)}, where="no_such_column > 0",
        )
    assert not os.path.exists(os.path.join(v, "_mv.json"))
    create_materialized_view(
        spark, v, t, group_by=["k"], aggs={"n": ("count", None)}
    )
    assert _rows(read_materialized_view(spark, v)) == {(1, 1)}


def test_mv_non_quiet_feed_error_propagates(spark, tmp_path, monkeypatch):
    """Only QuietRangeError (the provably-unchanged range) may advance
    the watermark without changes; any other ValueError from feed
    derivation must propagate — silently skipping real changes would
    permanently publish a stale view."""
    import reactivestreams_kinesis_spark.operators.matview as mv

    t, v = _dirs(tmp_path)
    mk = lambda rows: spark.createDataFrame(rows, "id bigint, k int, x int")
    snapshot_commit(mk([(1, 1, 5)]), t)
    create_materialized_view(
        spark, v, t, group_by=["k"], aggs={"n": ("count", None)}
    )
    snapshot_commit(mk([(2, 1, 6)]), t)

    def broken_feed(*a, **kw):
        raise ValueError("unexpected feed derivation failure")

    monkeypatch.setattr(mv, "snapshot_change_feed", broken_feed)
    before = materialized_view_status(v)["source_version"]
    with pytest.raises(ValueError, match="unexpected feed"):
        refresh_materialized_view(spark, v)
    assert materialized_view_status(v)["source_version"] == before


# ---- join views (round 11) -------------------------------------------------


def _join_mv_setup(spark, sf_dir, tmp_path, group_by, aggs, **kw):
    from reactivestreams_kinesis_spark.operators.matview import (
        create_materialized_view_over_join,
    )

    u = _uuid.uuid4().hex[:6]
    fact, dim, v = (
        str(tmp_path / f"fact_{u}"), str(tmp_path / f"dim_{u}"),
        str(tmp_path / f"jview_{u}"),
    )
    orders = spark.read.parquet(os.path.join(sf_dir, "orders.parquet")).select(
        "o_orderkey", "o_custkey",
        F.col("o_totalprice").cast("decimal(12,2)").alias("price"),
    )
    cust = spark.read.parquet(os.path.join(sf_dir, "customer.parquet")).select(
        "c_custkey", "c_nationkey", "c_mktsegment"
    )
    snapshot_commit(orders.repartitionByRange(4, "o_orderkey"), fact)
    snapshot_commit(cust, dim)
    create_materialized_view_over_join(
        spark, v, fact, dim,
        join_on=("o_custkey", "c_custkey"),
        group_by=group_by, aggs=aggs, **kw,
    )
    return fact, dim, v, orders, cust


def _join_recompute(spark, fact, dim, group_by, agg_exprs):
    from reactivestreams_kinesis_spark.operators.matview import _load_meta

    f = read_snapshot(spark, fact)
    d = read_snapshot(spark, dim)
    return (
        f.join(d, f.o_custkey == d.c_custkey)
        .groupBy(*group_by)
        .agg(*agg_exprs)
    )


def test_join_mv_fact_dml_refresh_matches_direct_join(spark, sf_dir, tmp_path):
    """The star-schema view (orders ⋈ customer grouped by a DIM
    attribute) maintained through append + CoW update + MoR delete on
    the FACT ≡ the direct join-aggregate at the tip, under both
    strategies; replays publish nothing."""
    aggs = {
        "n": ("count", None),
        "rev": ("sum", "price"),
        "hi": ("max", "price"),
    }
    exprs = [
        F.count(F.lit(1)).alias("n"),
        F.sum("price").alias("rev"),
        F.max("price").alias("hi"),
    ]
    for strategy in ("overwrite", "merge"):
        fact, dim, v, orders, cust = _join_mv_setup(
            spark, sf_dir, tmp_path, ["c_nationkey"], aggs
        )
        snapshot_commit(
            orders.limit(50).withColumn(
                "o_orderkey", F.col("o_orderkey") + F.lit(9000000).cast("bigint")
            ),
            fact,
        )
        update_where(
            spark, fact, [("o_orderkey", "<=", 100)],
            {"price": F.col("price") + F.lit(5).cast("decimal(12,2)")},
        )
        delete_where(spark, fact, [("price", ">", 300000.0)], strategy="merge_on_read")
        refresh_materialized_view(spark, v, strategy=strategy)
        assert _rows(read_materialized_view(spark, v)) == _rows(
            _join_recompute(spark, fact, dim, ["c_nationkey"], exprs)
        ), strategy
        tip = latest_version(v)
        assert refresh_materialized_view(spark, v, strategy=strategy) == tip


def test_join_mv_dim_change_refuses_or_rebuilds(spark, sf_dir, tmp_path):
    """Real dim row changes refuse by default (a fact-only delta cannot
    fold them); on_dim_change='rebuild' re-pins at the dim tip with a
    full recompute; QUIET dim history (compaction) never blocks."""
    from reactivestreams_kinesis_spark.operators.matview import _load_meta

    aggs = {"n": ("count", None), "rev": ("sum", "price")}
    exprs = [F.count(F.lit(1)).alias("n"), F.sum("price").alias("rev")]
    fact, dim, v, orders, cust = _join_mv_setup(
        spark, sf_dir, tmp_path, ["c_mktsegment"], aggs
    )
    # quiet dim commit: compaction changes no rows — refresh proceeds
    compact_snapshot(spark, dim, target_file_bytes=1 << 40)
    snapshot_commit(orders.limit(5).withColumn(
        "o_orderkey", F.col("o_orderkey") + F.lit(8000000).cast("bigint")
    ), fact)
    refresh_materialized_view(spark, v)
    assert _rows(read_materialized_view(spark, v)) == _rows(
        _join_recompute(spark, fact, dim, ["c_mktsegment"], exprs)
    )
    # real dim change: move some customers to a new segment
    update_where(
        spark, dim, [("c_custkey", "<=", 200)],
        {"c_mktsegment": F.lit("MIGRATED")},
    )
    snapshot_commit(orders.limit(3).withColumn(
        "o_orderkey", F.col("o_orderkey") + F.lit(7000000).cast("bigint")
    ), fact)
    with pytest.raises(ValueError, match="dim"):
        refresh_materialized_view(spark, v)
    refresh_materialized_view(spark, v, on_dim_change="rebuild")
    assert _rows(read_materialized_view(spark, v)) == _rows(
        _join_recompute(spark, fact, dim, ["c_mktsegment"], exprs)
    )
    # the pin advanced: a further fact-only refresh folds incrementally
    assert _load_meta(v)["join"]["dim_version"] == latest_version(dim)
    delete_where(spark, fact, [("o_orderkey", ">", 7000000)])
    refresh_materialized_view(spark, v)
    assert _rows(read_materialized_view(spark, v)) == _rows(
        _join_recompute(spark, fact, dim, ["c_mktsegment"], exprs)
    )


def test_join_mv_spec_guards(spark, sf_dir, tmp_path):
    from reactivestreams_kinesis_spark.operators.matview import (
        create_materialized_view_over_join,
    )

    u = _uuid.uuid4().hex[:6]
    fact, dim = str(tmp_path / f"gf_{u}"), str(tmp_path / f"gd_{u}")
    snapshot_commit(
        spark.createDataFrame([(1, 10, 5.0)], "id bigint, ck int, x double"), fact
    )
    snapshot_commit(
        spark.createDataFrame([(10, "a", 5.0)], "ck2 int, seg string, x double"), dim
    )
    with pytest.raises(ValueError, match="collision"):
        create_materialized_view_over_join(
            spark, str(tmp_path / f"gv1_{u}"), fact, dim,
            join_on=("ck", "ck2"), group_by=["seg"], aggs={"n": ("count", None)},
        )
    with pytest.raises(ValueError, match="join key"):
        create_materialized_view_over_join(
            spark, str(tmp_path / f"gv2_{u}"), fact, dim,
            join_on=("nope", "ck2"), group_by=["seg"], aggs={"n": ("count", None)},
        )
    with pytest.raises(ValueError, match="group keys"):
        create_materialized_view_over_join(
            spark, str(tmp_path / f"gv3_{u}"), fact, dim,
            join_on=("ck", "ck2"), group_by=["nope"],
            aggs={"n": ("count", None)}, dim_columns=["seg"],
        )
    # projection resolves the collision
    vd = str(tmp_path / f"gv4_{u}")
    create_materialized_view_over_join(
        spark, vd, fact, dim, join_on=("ck", "ck2"),
        group_by=["seg"], aggs={"n": ("count", None)}, dim_columns=["seg"],
    )
    assert _rows(read_materialized_view(spark, vd)) == {("a", 1)}


def test_join_mv_stream_maintenance(spark, sf_dir, tmp_path):
    """The standing CDF-stream maintainer composes with join views: a
    fact backlog drains (capped), the view lands at the direct
    join-aggregate."""
    from reactivestreams_kinesis_spark.operators.matview import (
        stream_refresh_materialized_view,
    )

    aggs = {"n": ("count", None), "rev": ("sum", "price")}
    exprs = [F.count(F.lit(1)).alias("n"), F.sum("price").alias("rev")]
    fact, dim, v, orders, cust = _join_mv_setup(
        spark, sf_dir, tmp_path, ["c_nationkey"], aggs
    )
    snapshot_commit(orders.limit(20).withColumn(
        "o_orderkey", F.col("o_orderkey") + F.lit(6000000).cast("bigint")
    ), fact)
    delete_where(spark, fact, [("price", "<", 5000.0)])
    q = stream_refresh_materialized_view(
        spark, v, str(tmp_path / "jck"), max_versions_per_trigger=1
    )
    q.awaitTermination(300)
    assert materialized_view_status(v)["source_version"] == latest_version(fact)
    assert _rows(read_materialized_view(spark, v)) == _rows(
        _join_recompute(spark, fact, dim, ["c_nationkey"], exprs)
    )


_JMV_OP = st.one_of(
    st.tuples(
        st.just("append"),
        st.lists(
            st.tuples(st.integers(0, 6) | st.none(), st.integers(-5, 9) | st.none()),
            min_size=1,
            max_size=6,
        ),
    ),
    st.tuples(st.just("pos_del"), st.integers(-2, 8)),
    st.tuples(st.just("eq_del"), st.lists(st.integers(0, 6), min_size=1, max_size=2)),
    st.tuples(st.just("update"), st.tuples(st.integers(0, 6), st.integers(100, 109))),
    st.tuples(st.just("cow_del"), st.integers(-2, 8)),
    st.tuples(st.just("compact"), st.none()),
    st.tuples(st.just("refresh"), st.sampled_from(["overwrite", "merge"])),
)


@given(
    init=st.lists(
        st.tuples(st.integers(0, 6) | st.none(), st.integers(-5, 9) | st.none()),
        min_size=1,
        max_size=6,
    ),
    ops=st.lists(_JMV_OP, min_size=1, max_size=5),
)
@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
def test_join_mv_matches_recompute_over_random_history(
    spark, tmp_path_factory, init, ops
):
    """The join-MV twin of the single-table model check: over any
    interleaving of fact DML (appends with NULL keys/values, both
    merge-on-read delete forms, CoW updates/deletes, reorgs) and
    interleaved refreshes under both strategies, the star-schema view
    grouped by a DIM attribute ≡ the direct fact⋈dim aggregate at the
    tip. Fact keys 5..6 have no dim row and NULL keys match nothing —
    both drop under the inner join at every stage, including inside
    retraction preimages."""
    from reactivestreams_kinesis_spark.operators.matview import (
        create_materialized_view_over_join,
    )

    base = tmp_path_factory.mktemp("jmvprop")
    t = str(base / f"t_{_uuid.uuid4().hex[:6]}")
    d = str(base / f"d_{_uuid.uuid4().hex[:6]}")
    v = str(base / f"v_{_uuid.uuid4().hex[:6]}")
    uid = 0

    def mk(rows):
        return spark.createDataFrame(rows, "id bigint, ck int, x int")

    dim = spark.createDataFrame(
        [(0, "red"), (1, "red"), (2, "blue"), (3, "blue"), (4, "green")],
        "ck2 int, g string",
    )
    snapshot_commit(dim, d)
    first = [(uid + i, k, x) for i, (k, x) in enumerate(init)]
    uid += len(init)
    snapshot_commit(mk(first).repartition(2), t)
    create_materialized_view_over_join(
        spark,
        v,
        t,
        d,
        join_on=("ck", "ck2"),
        group_by=["g"],
        aggs={
            "n": ("count", None),
            "s": ("sum", "x"),
            "lo": ("min", "x"),
            "hi": ("max", "x"),
        },
    )

    for kind, arg in ops:
        if kind == "append":
            rows = [(uid + i, k, x) for i, (k, x) in enumerate(arg)]
            uid += len(arg)
            snapshot_commit(mk(rows), t)
        elif kind == "pos_del":
            delete_where(spark, t, [("x", "<", arg)], strategy="merge_on_read")
        elif kind == "eq_del":
            delete_by_key(
                spark, t, mk([(0, k, 0) for k in arg]).select("ck"), "ck"
            )
        elif kind == "update":
            key, newx = arg
            update_where(spark, t, [("ck", "=", key)], {"x": F.lit(newx)})
        elif kind == "cow_del":
            delete_where(spark, t, [("x", "<", arg)])
        elif kind == "compact":
            compact_snapshot(spark, t, target_file_bytes=1 << 40)
        elif kind == "refresh":
            refresh_materialized_view(spark, v, strategy=arg)

    refresh_materialized_view(spark, v)
    try:
        src = read_snapshot(spark, t)
    except ValueError:
        assert read_materialized_view(spark, v).count() == 0
        return
    dd = read_snapshot(spark, d)
    exp = (
        src.join(dd, src.ck == dd.ck2)
        .groupBy("g")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("x").alias("s"),
            F.min("x").alias("lo"),
            F.max("x").alias("hi"),
        )
    )
    assert _rows(read_materialized_view(spark, v)) == _rows(exp)


def test_join_mv_composite_key_merge_strategy(spark, sf_dir, tmp_path):
    """The round-12 composition: a star-schema JOIN view grouped by a
    composite (dim attr, dim attr) tuple, refreshed under
    strategy='merge' — the fact delta enriches through the pinned dim,
    then the tuple-keyed equality-delete/merge path maintains the
    state; read-out ≡ direct join recompute, replay no-op."""
    aggs = {"n": ("count", None), "rev": ("sum", "price")}
    fact, dim, v, orders, cust = _join_mv_setup(
        spark, sf_dir, tmp_path, ["c_nationkey", "c_mktsegment"], aggs
    )
    snapshot_commit(
        orders.limit(40).withColumn(
            "o_orderkey", F.col("o_orderkey") + F.lit(9000000).cast("bigint")
        ),
        fact,
    )
    delete_where(spark, fact, [("o_orderkey", "<=", 200)], strategy="merge_on_read")
    refresh_materialized_view(spark, v, strategy="merge")
    exp = _join_recompute(
        spark, fact, dim, ["c_nationkey", "c_mktsegment"],
        [F.count(F.lit(1)).alias("n"), F.sum("price").alias("rev")],
    )
    assert _rows(read_materialized_view(spark, v)) == _rows(exp)
    assert refresh_materialized_view(spark, v, strategy="merge") == latest_version(v)


# ---- join views: dim-delta incremental maintenance (round 12) -------------


def test_join_mv_dim_delta_incremental_matches_direct_join(
    spark, sf_dir, tmp_path
):
    """on_dim_change='incremental' folds the dimension's OWN change
    feed: an SCD-1 attribute update (customers migrate segment), a dim
    DELETE (their fact rows leave the inner-join view), a dim INSERT
    whose key new fact rows then reference (the ΔF⋈ΔD corner — must
    land exactly once, through the dim term only), plus a concurrent
    fact append — all in ONE refresh, under both strategies. The meta
    file is NOT rewritten: the advanced pin travels txn-encoded with
    the commit."""
    from reactivestreams_kinesis_spark.operators.matview import _load_meta

    aggs = {"n": ("count", None), "rev": ("sum", "price"), "hi": ("max", "price")}
    exprs = [
        F.count(F.lit(1)).alias("n"),
        F.sum("price").alias("rev"),
        F.max("price").alias("hi"),
    ]
    for strategy in ("overwrite", "merge"):
        fact, dim, v, orders, cust = _join_mv_setup(
            spark, sf_dir, tmp_path, ["c_mktsegment"], aggs
        )
        meta_before = _load_meta(v)
        # SCD-1 update: segment migration for a slice of customers
        update_where(
            spark, dim, [("c_custkey", "<=", 150)],
            {"c_mktsegment": F.lit("MIGRATED")},
        )
        # dim delete: these customers' orders drop out of the view
        delete_where(spark, dim, [("c_custkey", ">", 1400)])
        # dim insert: a brand-new customer...
        snapshot_commit(
            spark.createDataFrame(
                [(99999001, 99, "NEWSEG")],
                "c_custkey bigint, c_nationkey int, c_mktsegment string",
            ),
            dim,
        )
        # ...and fact rows referencing both the new and existing keys
        snapshot_commit(
            spark.createDataFrame(
                [(9000001, 99999001, Decimal("123.45")),
                 (9000002, 99999001, Decimal("1.55"))],
                "o_orderkey bigint, o_custkey bigint, price decimal(12,2)",
            ),
            fact,
        )
        tip = refresh_materialized_view(
            spark, v, strategy=strategy, on_dim_change="incremental"
        )
        assert _rows(read_materialized_view(spark, v)) == _rows(
            _join_recompute(spark, fact, dim, ["c_mktsegment"], exprs)
        ), strategy
        # replay is a manifest no-op; the pin advanced in the txn, not
        # the (immutable) meta file
        assert refresh_materialized_view(
            spark, v, strategy=strategy, on_dim_change="incremental"
        ) == tip
        st = materialized_view_status(v)
        assert st["dim_version_effective"] == latest_version(dim)
        assert _load_meta(v)["join"]["dim_version"] == (
            meta_before["join"]["dim_version"]
        )


def test_join_mv_dim_only_refresh_and_pin_persistence(spark, sf_dir, tmp_path):
    """A dim change with the FACT unmoved still refreshes (the ev==sv
    early-return must not swallow it), and the txn-encoded pin is the
    delta base of the NEXT refresh: a later fact-only refresh enriches
    against the advanced pin, not the stale create-time one."""
    aggs = {"n": ("count", None), "rev": ("sum", "price")}
    exprs = [F.count(F.lit(1)).alias("n"), F.sum("price").alias("rev")]
    fact, dim, v, orders, cust = _join_mv_setup(
        spark, sf_dir, tmp_path, ["c_mktsegment"], aggs
    )
    update_where(
        spark, dim, [("c_custkey", "<=", 99)],
        {"c_mktsegment": F.lit("MOVED")},
    )
    v1 = refresh_materialized_view(
        spark, v, strategy="merge", on_dim_change="incremental"
    )
    assert _rows(read_materialized_view(spark, v)) == _rows(
        _join_recompute(spark, fact, dim, ["c_mktsegment"], exprs)
    )
    # dim unchanged since: replay no-op even though ev == sv still holds
    assert refresh_materialized_view(
        spark, v, on_dim_change="incremental"
    ) == v1
    # fact-only follow-up: MOVED customers' new orders must enrich
    # against the ADVANCED pin (default refuse proves the pin is
    # considered current — it would raise if the effective pin were
    # still the create-time one)
    snapshot_commit(
        orders.limit(30).withColumn(
            "o_orderkey", F.col("o_orderkey") + F.lit(9000000).cast("bigint")
        ),
        fact,
    )
    refresh_materialized_view(spark, v)
    assert _rows(read_materialized_view(spark, v)) == _rows(
        _join_recompute(spark, fact, dim, ["c_mktsegment"], exprs)
    )


def test_join_mv_dim_delta_prunes_fact_scan(
    spark, sf_dir, tmp_path, monkeypatch
):
    """Scale pin: a small changed-dim-key set restricts the FACT SCAN
    through the IN-predicate scan_snapshot path (manifest-prunable) —
    the full-table read_snapshot branch never runs for the fact; past
    the cap the keys stay distributed (full read + join restriction)
    and the answer is identical."""
    import reactivestreams_kinesis_spark.operators.matview as mv

    aggs = {"n": ("count", None), "rev": ("sum", "price")}
    exprs = [F.count(F.lit(1)).alias("n"), F.sum("price").alias("rev")]
    fact, dim, v, orders, cust = _join_mv_setup(
        spark, sf_dir, tmp_path, ["c_nationkey"], aggs
    )
    update_where(
        spark, dim, [("c_custkey", "<=", 3)], {"c_nationkey": F.lit(77)}
    )
    fact_full_reads = []
    real_read = mv.read_snapshot
    real_scan = mv.scan_snapshot
    scan_calls = []

    def spy_read(s, table_dir, version=None):
        if os.path.abspath(table_dir) == os.path.abspath(fact):
            fact_full_reads.append(version)
        return real_read(s, table_dir, version)

    def spy_scan(s, table_dir, predicates, version=None):
        scan_calls.append((os.path.abspath(table_dir), predicates))
        return real_scan(s, table_dir, predicates, version=version)

    monkeypatch.setattr(mv, "read_snapshot", spy_read)
    monkeypatch.setattr(mv, "scan_snapshot", spy_scan)
    refresh_materialized_view(spark, v, on_dim_change="incremental")
    assert not fact_full_reads, "small dim delta must not full-scan the fact"
    assert any(
        p and p[0][0] == "o_custkey" and p[0][1] == "in"
        for _d, p in scan_calls
    )
    assert _rows(read_materialized_view(spark, v)) == _rows(
        _join_recompute(spark, fact, dim, ["c_nationkey"], exprs)
    )
    # over-cap: keys stay distributed, fact reads once, same answer
    monkeypatch.setattr(mv, "_DIRTY_PRUNE_CAP", 1)
    update_where(
        spark, dim, [("c_custkey", "<=", 40)], {"c_nationkey": F.lit(78)}
    )
    fact_full_reads.clear()
    refresh_materialized_view(spark, v, on_dim_change="incremental")
    assert fact_full_reads, "over-cap dim delta takes the distributed branch"
    assert _rows(read_materialized_view(spark, v)) == _rows(
        _join_recompute(spark, fact, dim, ["c_nationkey"], exprs)
    )


def test_join_mv_dim_delta_merge_crash_between_phases_replays(
    spark, sf_dir, tmp_path, monkeypatch
):
    """A merge-strategy refresh carrying a dim fold that crashes between
    its equality-delete and upsert phases replays to the correct state:
    the stage txn (pin-suffixed) makes the delete at-most-once, the
    recompute re-reads the WATERMARK base, and the pin only advances
    with the final commit."""
    import reactivestreams_kinesis_spark.operators.snapshots as sn

    aggs = {"n": ("count", None), "rev": ("sum", "price")}
    exprs = [F.count(F.lit(1)).alias("n"), F.sum("price").alias("rev")]
    fact, dim, v, orders, cust = _join_mv_setup(
        spark, sf_dir, tmp_path, ["c_mktsegment"], aggs
    )
    # partial dim delete: the DOOMED group survives but is DIRTY (its
    # max retracted members) — the refresh must take the upsert phase,
    # which is where the crash injects
    update_where(
        spark, dim, [("c_custkey", "<=", 120)],
        {"c_mktsegment": F.lit("DOOMED")},
    )
    refresh_materialized_view(spark, v, on_dim_change="incremental")
    pin_before = materialized_view_status(v)["dim_version_effective"]
    delete_where(
        spark, dim,
        [("c_mktsegment", "=", "DOOMED"), ("c_custkey", "<=", 60)],
    )
    real_upsert = sn.merge_upsert
    calls = {"n": 0}

    def boom(*a, **k):
        calls["n"] += 1
        raise RuntimeError("injected crash before upsert")

    # _merge_refresh imports merge_upsert from snapshots at call time —
    # patch it there
    monkeypatch.setattr(sn, "merge_upsert", boom)
    with pytest.raises(RuntimeError, match="injected"):
        refresh_materialized_view(
            spark, v, strategy="merge", on_dim_change="incremental"
        )
    assert calls["n"] == 1
    # pin did NOT advance: no refresh commit landed, only the stage
    assert materialized_view_status(v)["dim_version_effective"] == pin_before
    monkeypatch.setattr(sn, "merge_upsert", real_upsert)
    refresh_materialized_view(
        spark, v, strategy="merge", on_dim_change="incremental"
    )
    assert _rows(read_materialized_view(spark, v)) == _rows(
        _join_recompute(spark, fact, dim, ["c_mktsegment"], exprs)
    )
    assert materialized_view_status(v)["dim_version_effective"] == \
        latest_version(dim)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    init=st.lists(
        st.tuples(st.integers(0, 6), st.integers(0, 30)), min_size=1, max_size=8
    ),
    ops=st.lists(
        st.one_of(
            st.tuples(
                st.just("append"),
                st.lists(
                    st.tuples(st.integers(0, 6), st.integers(0, 30)),
                    min_size=1,
                    max_size=5,
                ),
            ),
            st.tuples(st.just("pos_del"), st.integers(0, 30)),
            st.tuples(
                st.just("dim_update"),
                st.tuples(st.integers(0, 4), st.sampled_from(["red", "blue", "green", "gold"])),
            ),
            st.tuples(st.just("dim_del"), st.integers(0, 4)),
            st.tuples(st.just("dim_ins"), st.integers(5, 6)),
            st.tuples(st.just("refresh"), st.sampled_from(["overwrite", "merge"])),
        ),
        min_size=1,
        max_size=7,
    ),
)
def test_join_mv_dim_delta_matches_recompute_over_random_history(
    spark, tmp_path_factory, init, ops
):
    """The dim-delta twin of the join-MV model check: over any
    interleaving of fact DML and DIM DML (SCD-1 attribute updates, dim
    deletes, dim inserts that late fact rows may reference) with
    refreshes under both strategies and on_dim_change='incremental',
    the view ≡ the direct fact⋈dim aggregate at the tips. Exercises
    repeated pin advancement across refreshes — each refresh's delta
    base is the previous commit's txn-encoded pin."""
    from reactivestreams_kinesis_spark.operators.matview import (
        create_materialized_view_over_join,
    )

    base = tmp_path_factory.mktemp("jmvdimprop")
    t = str(base / f"t_{_uuid.uuid4().hex[:6]}")
    d = str(base / f"d_{_uuid.uuid4().hex[:6]}")
    v = str(base / f"v_{_uuid.uuid4().hex[:6]}")
    uid = 0
    dim_rows = {k: g for k, g in
                [(0, "red"), (1, "red"), (2, "blue"), (3, "blue"), (4, "green")]}

    def mk(rows):
        return spark.createDataFrame(rows, "id bigint, ck int, x int")

    def mkd(items):
        return spark.createDataFrame(items, "ck2 int, g string")

    snapshot_commit(mkd(list(dim_rows.items())), d)
    first = [(uid + i, k, x) for i, (k, x) in enumerate(init)]
    uid += len(init)
    snapshot_commit(mk(first).repartition(2), t)
    create_materialized_view_over_join(
        spark, v, t, d,
        join_on=("ck", "ck2"),
        group_by=["g"],
        aggs={
            "n": ("count", None),
            "s": ("sum", "x"),
            "hi": ("max", "x"),
        },
    )

    for kind, arg in ops:
        if kind == "append":
            rows = [(uid + i, k, x) for i, (k, x) in enumerate(arg)]
            uid += len(arg)
            snapshot_commit(mk(rows), t)
        elif kind == "pos_del":
            delete_where(spark, t, [("x", "<", arg)], strategy="merge_on_read")
        elif kind == "dim_update":
            key, g = arg
            if key in dim_rows and dim_rows[key] != g:
                update_where(spark, d, [("ck2", "=", key)], {"g": F.lit(g)})
                dim_rows[key] = g
        elif kind == "dim_del":
            if arg in dim_rows:
                delete_where(spark, d, [("ck2", "=", arg)])
                del dim_rows[arg]
        elif kind == "dim_ins":
            if arg not in dim_rows:
                snapshot_commit(mkd([(arg, "new")]), d)
                dim_rows[arg] = "new"
        elif kind == "refresh":
            refresh_materialized_view(
                spark, v, strategy=arg, on_dim_change="incremental"
            )

    refresh_materialized_view(spark, v, on_dim_change="incremental")
    try:
        src = read_snapshot(spark, t)
    except ValueError:
        assert read_materialized_view(spark, v).count() == 0
        return
    dd = read_snapshot(spark, d)
    exp = (
        src.join(dd, src.ck == dd.ck2)
        .groupBy("g")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("x").alias("s"),
            F.max("x").alias("hi"),
        )
    )
    assert _rows(read_materialized_view(spark, v)) == _rows(exp)


# ---- hist_quantile: incremental percentiles ------------------------------

_HQ = {"q": 0.5, "lo": 0.0, "hi": 20.0, "bins": 10}  # width = 2.0 exact


def _hq_recompute(df, q=0.5, lo=0.0, hi=20.0, bins=10):
    """The hist_quantile read rule evaluated directly over the source:
    bin by floor((v-lo)/width) clamped to the edge bins, answer the
    midpoint of the first bin whose cumulative count reaches
    ceil(q*total) — term-for-term the sketch's documented semantics."""
    width = (hi - lo) / bins
    df.createOrReplaceTempView("hq_src")
    return df.sparkSession.sql(f"""
        WITH b AS (
            SELECT g, LEAST(GREATEST(CAST(FLOOR((x - {lo}) / {width}) AS INT),
                                     0), {bins - 1}) AS b
            FROM hq_src WHERE x IS NOT NULL
        ),
        c AS (SELECT g, b, COUNT(*) AS c FROM b GROUP BY g, b),
        r AS (SELECT g, b, c,
                     SUM(c) OVER (PARTITION BY g ORDER BY b) AS cum,
                     SUM(c) OVER (PARTITION BY g) AS total FROM c),
        nn AS (SELECT g, COUNT(*) AS n FROM hq_src GROUP BY g)
        SELECT nn.g, nn.n,
               CAST({lo} AS DOUBLE)
                 + (MIN(CASE WHEN cum >= GREATEST(CAST(CEIL({q} * total)
                        AS BIGINT), 1) THEN b END) + 0.5)
                   * CAST({width} AS DOUBLE) AS p
        FROM nn LEFT JOIN r ON nn.g = r.g
        GROUP BY nn.g, nn.n
    """)


def _hq_commit(spark, t, rows):
    snapshot_commit(
        spark.createDataFrame(rows, "g int, x double"), t
    )


def test_mv_hist_quantile_matches_recompute_over_mixed_dml(
    spark, tmp_path
):
    """Inserts, below/above-domain values (edge-bin clamping), NULLs,
    MoR position deletes, CoW updates, and equality deletes — then a
    merge-strategy refresh ≡ the binning rule evaluated directly at the
    tip, and a second overwrite refresh over more DML agrees too."""
    t, v = _dirs(tmp_path)
    _hq_commit(
        spark,
        t,
        [(g, float(x)) for g in range(3) for x in range(-3, 25, 2)]
        + [(0, None), (1, None)],
    )
    create_materialized_view(
        spark,
        v,
        t,
        group_by=["g"],
        aggs={"n": ("count", None), "p": ("hist_quantile", "x", _HQ)},
    )
    _hq_commit(spark, t, [(g, float(x)) for g in range(4) for x in (1, 7, 30)])
    delete_where(spark, t, [("x", "<", 0.0)], strategy="merge_on_read")
    update_where(spark, t, [("x", ">", 25.0)], {"x": F.lit(19.0)})
    delete_by_key(
        spark, t, spark.createDataFrame([(2,)], "g int"), "g"
    )
    refresh_materialized_view(spark, v, strategy="merge")
    assert _rows(read_materialized_view(spark, v)) == _rows(
        _hq_recompute(read_snapshot(spark, t))
    )
    # second round through the overwrite strategy
    _hq_commit(spark, t, [(2, 5.0), (2, 5.5), (0, 11.0)])
    delete_where(spark, t, [("x", "=", 7.0)], strategy="copy_on_write")
    refresh_materialized_view(spark, v)
    assert _rows(read_materialized_view(spark, v)) == _rows(
        _hq_recompute(read_snapshot(spark, t))
    )


def test_mv_hist_quantile_retractions_never_touch_the_source(
    spark, tmp_path, monkeypatch
):
    """The abelian property, proven structurally: bin counts subtract
    exactly, so a retraction-bearing refresh of a hist-only view must
    complete WITHOUT reading the source relation at all (min/max/HLL
    views pay a dirty-group source scan here). _source_rows is the one
    gate every source read goes through — poison it and refresh."""
    import reactivestreams_kinesis_spark.operators.matview as mv

    t, v = _dirs(tmp_path)
    _hq_commit(spark, t, [(g, float(x)) for g in range(3) for x in range(12)])
    create_materialized_view(
        spark,
        v,
        t,
        group_by=["g"],
        aggs={"n": ("count", None), "p": ("hist_quantile", "x", _HQ)},
    )
    _hq_commit(spark, t, [(0, 3.0), (1, 18.0)])
    delete_where(spark, t, [("x", "<", 4.0)], strategy="merge_on_read")
    delete_by_key(spark, t, spark.createDataFrame([(2,)], "g int"), "g")

    def _no_source(*a, **k):
        raise AssertionError(
            "hist_quantile refresh read the source — the abelian "
            "contract is broken"
        )

    monkeypatch.setattr(mv, "_source_rows", _no_source)
    refresh_materialized_view(spark, v, strategy="merge")
    monkeypatch.undo()
    assert _rows(read_materialized_view(spark, v)) == _rows(
        _hq_recompute(read_snapshot(spark, t))
    )


def test_mv_hist_quantile_spec_validation(spark, tmp_path):
    t, _ = _dirs(tmp_path)
    _hq_commit(spark, t, [(0, 1.0)])

    def mk(prm, suffix):
        return create_materialized_view(
            spark,
            str(tmp_path / f"v_{suffix}"),
            t,
            group_by=["g"],
            aggs={"p": ("hist_quantile", "x", prm)},
        )

    with pytest.raises(ValueError, match="needs params"):
        mk(None, "a")
    with pytest.raises(ValueError, match="unknown hist_quantile params"):
        mk({**_HQ, "width": 1}, "b")
    with pytest.raises(ValueError, match="q must be in"):
        mk({**_HQ, "q": 1.0}, "c")
    with pytest.raises(ValueError, match="lo < hi"):
        mk({**_HQ, "lo": 20.0, "hi": 0.0}, "d")
    with pytest.raises(ValueError, match="bins must be in"):
        mk({**_HQ, "bins": 1}, "e")
    with pytest.raises(ValueError, match="bins must be in"):
        mk({**_HQ, "bins": 100000}, "f")
    with pytest.raises(ValueError, match="only hist_quantile takes params"):
        create_materialized_view(
            spark,
            str(tmp_path / "v_g"),
            t,
            group_by=["g"],
            aggs={"s": ("sum", "x", {"q": 0.5})},
        )


def test_mv_hist_quantile_shared_sketch_state(spark, tmp_path):
    """p50/p90/p99 over ONE (col, lo, hi, bins) domain store ONE bin
    array (state keyed by sketch identity, not output name); a second
    domain gets its own. All outputs still read correctly."""
    t, v = _dirs(tmp_path)
    _hq_commit(spark, t, [(g, float(x)) for g in (0, 1) for x in range(20)])
    create_materialized_view(
        spark,
        v,
        t,
        group_by=["g"],
        aggs={
            "p50": ("hist_quantile", "x", {**_HQ, "q": 0.5}),
            "p90": ("hist_quantile", "x", {**_HQ, "q": 0.9}),
            "p10_fine": (
                "hist_quantile",
                "x",
                {"q": 0.1, "lo": 0.0, "hi": 20.0, "bins": 20},
            ),
        },
    )
    state_cols = [
        c for c in read_snapshot(spark, v).columns if c.startswith("__mv_hist__")
    ]
    assert len(state_cols) == 2, state_cols  # shared + the fine domain
    _hq_commit(spark, t, [(0, 19.0), (1, 0.5)])
    delete_where(spark, t, [("x", "<", 2.0)], strategy="merge_on_read")
    refresh_materialized_view(spark, v, strategy="merge")
    rows = {tuple(r) for r in read_materialized_view(spark, v).collect()}
    # survivors g=0: 2..19 + 19.0 → 19 values; g=1: 2..19 → 18 values
    # p50 g0: rank ceil(9.5)=10 → val 11 → bin 5 → 11.0
    # p50 g1: rank 9 → val 10 → bin 5 → 11.0
    # p90 g0: rank ceil(17.1)=18 → val 19 (sorted idx 18: [2..19,19]) → bin 9 → 19.0
    # p90 g1: rank ceil(16.2)=17 → val 18 → bin 9 → 19.0
    # p10_fine g0: rank ceil(1.9)=2 → val 3 → fine bin 3 → 3.5
    # p10_fine g1: rank ceil(1.8)=2 → val 3 → 3.5
    assert rows == {(0, 11.0, 19.0, 3.5), (1, 11.0, 19.0, 3.5)}


_HQ_OP = st.one_of(
    st.tuples(
        st.just("append"),
        st.lists(
            st.tuples(
                st.integers(0, 3),
                st.one_of(
                    st.none(),
                    st.floats(
                        min_value=-10.0,
                        max_value=30.0,
                        allow_nan=False,
                        allow_infinity=False,
                        width=32,
                    ),
                ),
            ),
            min_size=1,
            max_size=5,
        ),
    ),
    st.tuples(st.just("pos_del"), st.floats(min_value=-5.0, max_value=25.0,
                                            allow_nan=False, width=32)),
    st.tuples(st.just("eq_del"), st.integers(0, 3)),
    st.tuples(st.just("refresh"), st.sampled_from(["overwrite", "merge"])),
)


@given(
    init=st.lists(
        st.tuples(
            st.integers(0, 3),
            st.one_of(
                st.none(),
                st.floats(min_value=-10.0, max_value=30.0, allow_nan=False,
                          allow_infinity=False, width=32),
            ),
        ),
        min_size=1,
        max_size=5,
    ),
    ops=st.lists(_HQ_OP, min_size=1, max_size=4),
)
@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
def test_mv_hist_quantile_matches_recompute_over_random_history(
    spark, tmp_path, init, ops
):
    """Randomized DML histories (inserts incl. NULLs and out-of-domain
    values, position deletes, whole-group equality deletes, interleaved
    overwrite/merge refreshes): the sketch inverted at q must equal the
    binning rule evaluated directly at every refresh point."""
    t, v = _dirs(tmp_path)  # _dirs uuids per call: unique per example
    _hq_commit(spark, t, [(g, x) for g, x in init])
    create_materialized_view(
        spark,
        v,
        t,
        group_by=["g"],
        aggs={"n": ("count", None), "p": ("hist_quantile", "x", _HQ)},
    )
    for op, arg in ops:
        if op == "append":
            _hq_commit(spark, t, [(g, x) for g, x in arg])
        elif op == "pos_del":
            delete_where(spark, t, [("x", "<", arg)], strategy="merge_on_read")
        elif op == "eq_del":
            delete_by_key(
                spark, t, spark.createDataFrame([(arg,)], "g int"), "g"
            )
        else:
            refresh_materialized_view(spark, v, strategy=arg)
            assert _rows(read_materialized_view(spark, v)) == _rows(
                _hq_recompute(read_snapshot(spark, t))
            )
    refresh_materialized_view(spark, v)
    assert _rows(read_materialized_view(spark, v)) == _rows(
        _hq_recompute(read_snapshot(spark, t))
    )


def test_mv_hist_quantile_stream_maintained(spark, tmp_path):
    """The percentile view under STANDING maintenance: a stream-driven
    drain (AvailableNow, merge strategy) folds a retraction-bearing
    backlog into the sketch and answers the binning rule exactly —
    the stream offsets and the abelian sketch arithmetic compose."""
    from reactivestreams_kinesis_spark.operators.matview import (
        stream_refresh_materialized_view,
    )

    t, v = _dirs(tmp_path)
    ck = str(tmp_path / "hq_ckpt")
    _hq_commit(spark, t, [(g, float(x)) for g in (0, 1, 2) for x in range(16)])
    create_materialized_view(
        spark,
        v,
        t,
        group_by=["g"],
        aggs={"n": ("count", None), "p": ("hist_quantile", "x", _HQ)},
    )
    _hq_commit(spark, t, [(0, 25.0), (1, -3.0), (2, 7.5)])
    delete_where(spark, t, [("x", "<", 3.0)], strategy="merge_on_read")
    delete_by_key(spark, t, spark.createDataFrame([(2,)], "g int"), "g")

    q = stream_refresh_materialized_view(spark, v, ck, strategy="merge")
    q.awaitTermination(120)
    assert materialized_view_status(v)["source_version"] == latest_version(t)
    assert _rows(read_materialized_view(spark, v)) == _rows(
        _hq_recompute(read_snapshot(spark, t))
    )
