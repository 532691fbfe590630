"""Shallow clone (operators/snapshots.py:clone_snapshot): zero-copy
creation, independent evolution, ownership-guarded retention, and the
read stack over foreign-based files."""

from __future__ import annotations

import glob
import os
import uuid as _uuid

import pytest
from pyspark.sql import functions as F

from reactivestreams_kinesis_spark.operators.snapshots import (
    _read_manifest,
    clone_snapshot,
    compact_snapshot,
    delete_where,
    latest_version,
    prune_files,
    read_snapshot,
    scan_snapshot,
    snapshot_change_feed,
    snapshot_commit,
    update_where,
    vacuum,
)
from reactivestreams_kinesis_spark.sources.snapshot_source import (
    register_snapshot_source,
)

pytestmark = pytest.mark.usefixtures("spark")


def _dirs(tmp_path):
    u = _uuid.uuid4().hex[:6]
    return str(tmp_path / f"src_{u}"), str(tmp_path / f"dst_{u}")


def _cust(spark, sf_dir):
    return spark.read.parquet(os.path.join(sf_dir, "customer.parquet")).select(
        "c_custkey", "c_nationkey", "c_acctbal"
    )


def _rows(df):
    return {tuple(r) for r in df.collect()}


def test_clone_reads_equal_and_evolves_independently(spark, sf_dir, tmp_path):
    """Clone ≡ source at creation; CoW update + MoR delete on the CLONE
    (local delete files over foreign data files) leave the source
    bit-identical; the clone's change feed crosses its own history."""
    src, dst = _dirs(tmp_path)
    cust = _cust(spark, sf_dir)
    snapshot_commit(
        cust.repartitionByRange(4, "c_custkey"), src, partition_by=["c_nationkey"]
    )
    clone_snapshot(src, dst)
    base = _rows(read_snapshot(spark, src))
    assert _rows(read_snapshot(spark, dst)) == base

    update_where(spark, dst, [("c_custkey", "<=", 20)], {"c_acctbal": F.lit(0.0)})
    delete_where(spark, dst, [("c_acctbal", "<", 0.0)], strategy="merge_on_read")
    exp = {
        (k, n, 0.0 if k <= 20 else bal)
        for (k, n, bal) in base
        if not (bal < 0.0 and k > 20)
    }
    assert _rows(read_snapshot(spark, dst)) == exp
    assert _rows(read_snapshot(spark, src)) == base, "source must never change"
    assert snapshot_change_feed(spark, dst, from_version=0).count() > 0


def test_clone_vacuum_never_deletes_foreign_files(spark, sf_dir, tmp_path):
    src, dst = _dirs(tmp_path)
    snapshot_commit(_cust(spark, sf_dir).repartition(3), src)
    clone_snapshot(src, dst)
    update_where(spark, dst, [("c_custkey", "<=", 50)], {"c_acctbal": F.lit(1.0)})
    n_src = len(glob.glob(os.path.join(src, "data-*", "*.parquet")))
    before = _rows(read_snapshot(spark, dst))
    vacuum(dst, keep_from_version=latest_version(dst))
    assert len(glob.glob(os.path.join(src, "data-*", "*.parquet"))) == n_src
    assert _rows(read_snapshot(spark, dst)) == before
    assert _rows(read_snapshot(spark, src)) == _rows(read_snapshot(spark, src))


def test_clone_compact_becomes_self_contained(spark, sf_dir, tmp_path):
    src, dst = _dirs(tmp_path)
    snapshot_commit(_cust(spark, sf_dir).repartition(3), src)
    clone_snapshot(src, dst)
    before = _rows(read_snapshot(spark, dst))
    compact_snapshot(spark, dst)
    m = _read_manifest(dst, latest_version(dst))
    assert "file_bases" not in m, "a full rewrite owns every file"
    assert _rows(read_snapshot(spark, dst)) == before


def test_clone_guards_time_travel_and_clone_of_clone(spark, sf_dir, tmp_path):
    """Refusals (pending MoR state, occupied destination), cloning an
    OLD version, and clone-of-clone pointing at the original owner."""
    src, dst = _dirs(tmp_path)
    cust = _cust(spark, sf_dir)
    snapshot_commit(cust.filter("c_custkey <= 60"), src)            # v0
    snapshot_commit(cust.filter("c_custkey > 60 AND c_custkey <= 90"), src)  # v1
    delete_where(spark, src, [("c_acctbal", "<", 0.0)], strategy="merge_on_read")  # v2
    with pytest.raises(ValueError, match="pending merge-on-read"):
        clone_snapshot(src, dst)
    clone_snapshot(src, dst, version=1)  # pre-MoR version clones fine
    assert _rows(read_snapshot(spark, dst)) == _rows(
        read_snapshot(spark, src, 1)
    )
    with pytest.raises(FileExistsError):
        clone_snapshot(src, dst, version=0)
    dst2 = dst + "_2"
    clone_snapshot(dst, dst2)
    m2 = _read_manifest(dst2, 0)
    assert set(m2["file_bases"].values()) == {os.path.abspath(src)}, (
        "clone-of-clone must reference the ORIGINAL owner"
    )
    assert _rows(read_snapshot(spark, dst2)) == _rows(read_snapshot(spark, dst))


def test_clone_keeps_prune_indexes_and_source_reads(spark, sf_dir, tmp_path):
    """Inherited stats/partition tuples prune on the clone exactly as on
    the source, and the snapshot_table data source (batch + batch CDF)
    reads the clone through its foreign-based files."""
    src, dst = _dirs(tmp_path)
    snapshot_commit(
        _cust(spark, sf_dir), src, partition_by=["c_nationkey"]
    )
    clone_snapshot(src, dst)
    m = _read_manifest(dst, 0)
    kept = prune_files(m, [("c_nationkey", "in", (3, 7))])
    assert 0 < len(kept) < len(m["files"]), "inherited tuples must prune"
    assert _rows(
        scan_snapshot(spark, dst, [("c_nationkey", "=", 3)])
    ) == _rows(read_snapshot(spark, src).filter("c_nationkey = 3"))

    register_snapshot_source(spark)
    snapshot_commit(
        _cust(spark, sf_dir).limit(5).withColumn("c_acctbal", F.lit(9.0)), dst
    )
    via_source = (
        spark.read.format("snapshot_table").option("path", dst).load()
    )
    assert _rows(via_source) == _rows(read_snapshot(spark, dst))
    cdf = (
        spark.read.format("snapshot_table")
        .option("path", dst)
        .option("changeFeed", "true")
        .load()
    )
    assert cdf.count() == read_snapshot(spark, dst).count()
