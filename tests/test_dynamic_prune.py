"""Dynamic file pruning join (operators/joins.py:dynamic_prune_join):
semantics parity with the generic join, and the planning-time file cuts
the manifest indexes actually deliver."""

from __future__ import annotations

import os
import uuid as _uuid

import pytest
from pyspark.sql import functions as F

from reactivestreams_kinesis_spark.operators.joins import dynamic_prune_join
from reactivestreams_kinesis_spark.operators.snapshots import (
    _read_manifest,
    latest_version,
    prune_files,
    snapshot_commit,
)

pytestmark = pytest.mark.usefixtures("spark")


def _orders(spark, sf_dir):
    return spark.read.parquet(os.path.join(sf_dir, "orders.parquet")).select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )


def _rows(df):
    return {tuple(r) for r in df.collect()}


def test_dynamic_prune_join_inlist_parity_and_file_cut(spark, sf_dir, tmp_path):
    """A 3-key dim against a bucket-partitioned fact: result ≡ the plain
    join, and the derived IN-list predicate provably drops fact files at
    the manifest (bucket tuples prune what min/max never could on a
    hash-scattered key)."""
    t = str(tmp_path / f"fact_{_uuid.uuid4().hex[:6]}")
    orders = _orders(spark, sf_dir)
    snapshot_commit(orders, t, partition_by=[("o_custkey", "bucket", 8)])
    dim = spark.createDataFrame(
        [(1, "a"), (4, "b"), (7, "c")], "k bigint, tag string"
    )
    j = dynamic_prune_join(spark, t, dim, ("o_custkey", "k"))
    exp = orders.join(dim, orders.o_custkey == dim.k).select(
        "o_orderkey", "o_custkey", "o_totalprice", "k", "tag"
    )
    assert _rows(j.select("o_orderkey", "o_custkey", "o_totalprice", "k", "tag")) == _rows(exp)
    m = _read_manifest(t, latest_version(t))
    kept = prune_files(m, [("o_custkey", "in", (1, 4, 7))])
    assert len(kept) < len(m["files"]), (
        "bucket tuples should exclude files for a 3-key IN-list"
    )


def test_dynamic_prune_join_range_fallback(spark, sf_dir, tmp_path):
    """Dim cardinality above max_keys: the scan prunes by the dim keys'
    [min,max] range instead — same rows, one-row driver cost."""
    t = str(tmp_path / f"fact_{_uuid.uuid4().hex[:6]}")
    orders = _orders(spark, sf_dir)
    # range-clustered layout so the range predicate can actually prune
    snapshot_commit(orders.repartitionByRange(8, "o_custkey"), t)
    dim = spark.createDataFrame(
        [(k, str(k)) for k in range(10, 40)], "k bigint, tag string"
    )
    j = dynamic_prune_join(spark, t, dim, ("o_custkey", "k"), max_keys=5)
    exp = orders.join(dim, orders.o_custkey == dim.k).select(
        "o_orderkey", "o_custkey", "o_totalprice", "k", "tag"
    )
    assert _rows(j.select("o_orderkey", "o_custkey", "o_totalprice", "k", "tag")) == _rows(exp)
    m = _read_manifest(t, latest_version(t))
    kept = prune_files(m, [("o_custkey", ">=", 10), ("o_custkey", "<=", 39)])
    assert len(kept) < len(m["files"]), "range-clustered files should prune"


def test_dynamic_prune_join_empty_and_null_dim(spark, sf_dir, tmp_path):
    """An empty (or all-NULL-key) dim yields an empty join with the full
    joined schema — never an error, never a full fact scan."""
    t = str(tmp_path / f"fact_{_uuid.uuid4().hex[:6]}")
    snapshot_commit(_orders(spark, sf_dir).limit(200), t)
    empty = spark.createDataFrame([], "k bigint, tag string")
    j = dynamic_prune_join(spark, t, empty, ("o_custkey", "k"))
    assert j.count() == 0
    assert j.columns == ["o_orderkey", "o_custkey", "o_totalprice", "k", "tag"]
    nulls = spark.createDataFrame([(None, "x")], "k bigint, tag string")
    assert dynamic_prune_join(spark, t, nulls, ("o_custkey", "k")).count() == 0


def test_dynamic_prune_join_plan_shapes(spark, sf_dir, tmp_path):
    """IN-list regime pins a broadcast-hash join (the dim was observed
    bounded); the range-fallback regime pins NO broadcast hint — the
    strategy is AQE's to pick from runtime sizes."""
    t = str(tmp_path / f"fact_{_uuid.uuid4().hex[:6]}")
    snapshot_commit(_orders(spark, sf_dir).limit(500), t)
    small = spark.createDataFrame([(k, "x") for k in range(5)], "k bigint, tag string")
    j = dynamic_prune_join(spark, t, small, ("o_custkey", "k"))
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    big = spark.createDataFrame([(k, "x") for k in range(50)], "k bigint, tag string")
    j2 = dynamic_prune_join(spark, t, big, ("o_custkey", "k"), max_keys=10)
    logical = j2._jdf.queryExecution().optimizedPlan().toString()
    assert "broadcast" not in logical.lower() or "ResolvedHint" not in logical, (
        "range regime must not PIN a broadcast (AQE may still choose one)"
    )
