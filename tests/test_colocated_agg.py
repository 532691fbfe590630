"""Zero-exchange bucket-local GROUP BY (sources/colocated.py:
colocated_groupby): bit-exact parity with Spark's generic groupBy over
every layout shape (tight, straddling, merge-on-read), the
no-exchange/no-HashAggregate plan shape, SQL null-group semantics, and
the spec guards."""

from __future__ import annotations

import os
import uuid as _uuid
from decimal import Decimal

import pytest
from pyspark.sql import functions as F

from reactivestreams_kinesis_spark.operators.snapshots import (
    delete_where,
    read_snapshot,
    snapshot_commit,
)
from reactivestreams_kinesis_spark.sources.colocated import colocated_groupby

pytestmark = pytest.mark.usefixtures("spark")


def _t(tmp_path):
    return str(tmp_path / f"t_{_uuid.uuid4().hex[:6]}")


def _rows(df):
    return {tuple(r) for r in df.collect()}


_AGGS = {
    "n": ("count", None),
    "nx": ("count", "x"),
    "sx": ("sum", "x"),
    "sd": ("sum", "d"),
    "mn": ("min", "x"),
    "mx": ("max", "x"),
    "ax": ("avg", "y"),
}


def _expected(src, keys):
    return src.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("n"),
        F.count("x").alias("nx"),
        F.sum("x").alias("sx"),
        F.sum("d").alias("sd"),
        F.min("x").alias("mn"),
        F.max("x").alias("mx"),
        F.avg("y").alias("ax"),
    )


def _mk_df(spark, lo, hi, null_every=11):
    rows = [
        (
            i % 37 if null_every and i % null_every else None,
            f"s{i % 3}",
            float(i) if i % 7 else None,
            Decimal(i).scaleb(-1),
            i,
        )
        for i in range(lo, hi)
    ]
    return spark.createDataFrame(
        rows, "k int, s string, x double, d decimal(12,2), y bigint"
    )


def test_colocated_groupby_parity_and_plan(spark, tmp_path):
    """Bit-exact vs the generic groupBy — including NULL group keys
    (SQL's null group), null agg values, a straddling append, and a
    pending merge-on-read delete — and the plan is a single BatchScan
    with no Exchange and no HashAggregate pair."""
    t = _t(tmp_path)
    df = _mk_df(spark, 1, 2001)
    snapshot_commit(df, t, partition_by=[("k", "bucket", 8)])
    # unclustered second commit -> straddler files (incl. null keys)
    snapshot_commit(_mk_df(spark, 2001, 2101, null_every=3), t)
    delete_where(spark, t, [("x", ">", 1900.0)], strategy="merge_on_read")

    got = colocated_groupby(spark, t, group_by=["k", "s"], aggs=_AGGS)
    src = read_snapshot(spark, t)
    assert _rows(got) == _rows(_expected(src, ["k", "s"]))
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "snapshot_bucketed_agg" in plan
    assert "Exchange" not in plan, "bucket-local agg must not shuffle"
    assert "HashAggregate" not in plan, "aggregation happens inside the scan"


def test_colocated_groupby_null_group_exactly_once(spark, tmp_path):
    """NULL bucket keys live only in straddler files (a null transform
    value makes the file's partition tuple unknown); exactly one owner
    partition surfaces them, as SQL's single null group."""
    t = _t(tmp_path)
    snapshot_commit(
        _mk_df(spark, 1, 301, null_every=2), t,
        partition_by=[("k", "bucket", 4)],
    )
    got = colocated_groupby(spark, t, group_by=["k"], aggs={"n": ("count", None)})
    rows = {r["k"]: r["n"] for r in got.collect()}
    src = read_snapshot(spark, t)
    exp = {
        r["k"]: r["n"]
        for r in src.groupBy("k").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert rows == exp
    assert None in rows  # the null group surfaced, once


def test_colocated_groupby_where_and_time_travel(spark, tmp_path):
    """Scan predicates file-prune then re-apply row-exactly; ``version``
    reads any historical snapshot."""
    t = _t(tmp_path)
    snapshot_commit(
        _mk_df(spark, 1, 1001), t, partition_by=[("k", "bucket", 4)]
    )  # v0
    snapshot_commit(_mk_df(spark, 1001, 1501), t)  # v1
    got0 = colocated_groupby(
        spark, t, group_by=["k"], aggs={"n": ("count", None)}, version=0
    )
    src0 = read_snapshot(spark, t, 0)
    assert _rows(got0) == _rows(src0.groupBy("k").agg(F.count(F.lit(1)).alias("n")))
    got = colocated_groupby(
        spark, t, group_by=["k"],
        aggs={"n": ("count", None), "sx": ("sum", "x")},
        where=[("s", "=", "s1")],
    )
    src = read_snapshot(spark, t).filter("s = 's1'")
    assert _rows(got) == _rows(
        src.groupBy("k").agg(F.count(F.lit(1)).alias("n"), F.sum("x").alias("sx"))
    )


def test_colocated_groupby_multi_layouts_match_generic(spark, tmp_path):
    """Parity across layout shapes: bucket counts 4/8/16, pure-tight vs
    straddler-bearing histories, single- and multi-key grouping, and a
    group key that is not the bucket key riding along."""
    for n, extra_commit in ((4, False), (8, True), (16, True)):
        t = _t(tmp_path)
        snapshot_commit(
            _mk_df(spark, 1, 801), t, partition_by=[("k", "bucket", n)]
        )
        if extra_commit:
            snapshot_commit(_mk_df(spark, 801, 1101, null_every=5), t)
            delete_where(spark, t, [("y", ">", 1050)], strategy="merge_on_read")
        for keys in (["k"], ["k", "s"], ["s", "k"]):
            got = colocated_groupby(spark, t, group_by=keys, aggs=_AGGS)
            src = read_snapshot(spark, t)
            assert _rows(got) == _rows(_expected(src, keys)), (n, keys)


def test_colocated_groupby_all_null_agg_values(spark, tmp_path):
    """A group whose agg column is entirely NULL: SUM/MIN/MAX/AVG are
    NULL, COUNT(col) is 0, COUNT(*) counts — the SQL contract through
    the partial/merge decomposition."""
    t = _t(tmp_path)
    rows = [(1, None, None), (1, None, None), (2, 5.0, 7)]
    snapshot_commit(
        spark.createDataFrame(rows, "k int, x double, y bigint"),
        t,
        partition_by=[("k", "bucket", 4)],
    )
    got = {
        r["k"]: (r["n"], r["nx"], r["sx"], r["mn"], r["ax"])
        for r in colocated_groupby(
            spark, t, group_by=["k"],
            aggs={
                "n": ("count", None), "nx": ("count", "x"),
                "sx": ("sum", "x"), "mn": ("min", "x"), "ax": ("avg", "y"),
            },
        ).collect()
    }
    assert got[1] == (2, 0, None, None, None)
    assert got[2] == (1, 1, 5.0, 5.0, 7.0)


def test_colocated_groupby_guards(spark, tmp_path):
    """Loud refusals: no bucket spec on any group key, unknown
    aggregate, output-name collisions, col=None outside count."""
    t = _t(tmp_path)
    snapshot_commit(
        _mk_df(spark, 1, 101), t, partition_by=[("k", "bucket", 4)]
    )
    with pytest.raises(Exception, match="bucket"):
        colocated_groupby(
            spark, t, group_by=["s"], aggs={"n": ("count", None)}
        ).collect()
    with pytest.raises(Exception, match="unsupported aggregate"):
        colocated_groupby(
            spark, t, group_by=["k"], aggs={"m": ("median", "x")}
        ).collect()
    with pytest.raises(Exception, match="collide"):
        colocated_groupby(
            spark, t, group_by=["k"], aggs={"k": ("count", None)}
        ).collect()
    with pytest.raises(Exception, match="col=None"):
        colocated_groupby(
            spark, t, group_by=["k"], aggs={"s_": ("sum", None)}
        ).collect()


def test_colocated_groupby_empty_after_where_sentinel(spark, tmp_path):
    """A predicate that prunes every file still satisfies the Python
    data source contract (sentinel partition) and reads zero rows."""
    t = _t(tmp_path)
    snapshot_commit(
        _mk_df(spark, 1, 101), t, partition_by=[("k", "bucket", 4)]
    )
    got = colocated_groupby(
        spark, t, group_by=["k"], aggs={"n": ("count", None)},
        where=[("y", ">", 10_000_000)],
    )
    assert got.count() == 0


# ---- fused join + aggregation (colocated_join_agg) ------------------------


def _mk_star(spark, tmp_path, n_buckets=8):
    from reactivestreams_kinesis_spark.sources.colocated import (
        colocated_join_agg,
    )

    lt, rt = _t(tmp_path), _t(tmp_path)
    cust = spark.createDataFrame(
        [(i, i % 5, f"seg{i % 3}") for i in range(100)],
        "ck bigint, nat int, seg string",
    )
    orders = spark.createDataFrame(
        [(i, i % 80, float(i)) for i in range(1, 1201)],
        "ok bigint, oc bigint, amt double",
    )
    snapshot_commit(cust, lt, partition_by=[("ck", "bucket", n_buckets)])
    snapshot_commit(orders, rt, partition_by=[("oc", "bucket", n_buckets)])
    # unclustered append -> straddlers; MoR delete -> pending DVs
    snapshot_commit(
        orders.limit(60).withColumn("ok", F.col("ok") + 100000), rt
    )
    delete_where(spark, rt, [("amt", ">", 1100.0)], strategy="merge_on_read")
    return lt, rt, colocated_join_agg


def test_colocated_join_agg_parity_and_plan(spark, tmp_path):
    """The fused star rollup (inner co-located join + in-task
    aggregation, group keys including the join key) matches the generic
    join→groupBy bit-exactly over straddler + merge-on-read layouts,
    with a plan that is a single BatchScan: no join Exchange, no
    partial/final HashAggregate, no sort."""
    lt, rt, colocated_join_agg = _mk_star(spark, tmp_path)
    got = colocated_join_agg(
        spark, lt, rt, left_key="ck", right_key="oc",
        group_by=["ck", "seg"],
        aggs={
            "n": ("count", None), "rev": ("sum", "amt"),
            "hi": ("max", "amt"), "aok": ("avg", "ok"),
        },
    )
    l, r = read_snapshot(spark, lt), read_snapshot(spark, rt)
    exp = (
        l.join(r, l.ck == r.oc).groupBy("ck", "seg").agg(
            F.count(F.lit(1)).alias("n"), F.sum("amt").alias("rev"),
            F.max("amt").alias("hi"), F.avg("ok").alias("aok"),
        )
    )
    assert _rows(got) == _rows(exp)
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "snapshot_colocated_join" in plan
    assert "Exchange" not in plan and "HashAggregate" not in plan
    assert "SortMergeJoin" not in plan


def test_colocated_join_agg_side_predicates(spark, tmp_path):
    """Per-side WHERE triples prune files and re-apply row-exactly
    BEFORE the join+rollup — parity against filter-then-join-then-agg."""
    lt, rt, colocated_join_agg = _mk_star(spark, tmp_path)
    got = colocated_join_agg(
        spark, lt, rt, left_key="ck", right_key="oc",
        group_by=["ck"],
        aggs={"n": ("count", None), "rev": ("sum", "amt")},
        left_where=[("seg", "=", "seg1")],
        right_where=[("amt", "<", 900.0)],
    )
    l = read_snapshot(spark, lt).filter("seg = 'seg1'")
    r = read_snapshot(spark, rt).filter("amt < 900.0")
    exp = l.join(r, l.ck == r.oc).groupBy("ck").agg(
        F.count(F.lit(1)).alias("n"), F.sum("amt").alias("rev")
    )
    assert _rows(got) == _rows(exp)


def test_colocated_join_agg_guards(spark, tmp_path):
    """Refusals: group keys must include the left join key (bucket
    pinning), inner joins only, no leftSplit composition, unknown
    columns loudly."""
    lt, rt, colocated_join_agg = _mk_star(spark, tmp_path)
    from reactivestreams_kinesis_spark.sources.colocated import (
        register_colocated_source,
    )
    import json

    with pytest.raises(Exception, match="join key"):
        colocated_join_agg(
            spark, lt, rt, left_key="ck", right_key="oc",
            group_by=["seg"], aggs={"n": ("count", None)},
        ).collect()
    with pytest.raises(Exception, match="not in the joined relation"):
        colocated_join_agg(
            spark, lt, rt, left_key="ck", right_key="oc",
            group_by=["ck"], aggs={"s": ("sum", "nope")},
        ).collect()
    register_colocated_source(spark)
    base = (
        spark.read.format("snapshot_colocated_join")
        .option("leftPath", lt).option("rightPath", rt)
        .option("leftKey", "ck").option("rightKey", "oc")
        .option("aggGroupBy", "ck")
        .option("aggSpec", json.dumps([["n", "count", None]]))
    )
    with pytest.raises(Exception, match="inner"):
        base.option("joinType", "left_outer").load().collect()
    with pytest.raises(Exception, match="leftSplit"):
        base.option("joinType", "inner").option("leftSplit", "1").load().collect()
