"""Round 9: per-file NDV (HyperLogLog) sketches in manifest stats.

Contract under test: sketches are deterministic and COMPOSABLE — the
union of per-file sketches is register-identical to one sketch over all
the data (the property that makes table-level cardinality a zero-I/O
manifest fold); estimates land within HLL's error envelope; the summary
and `approx_distinct_count` report only when every file is covered and
no deletes are pending; and merge targeting's probe gate reads the
per-file/table NDV ratio correctly on clustered vs overlapping layouts.
"""

from __future__ import annotations

import base64

import pytest
from pyspark.sql import functions as F

from reactivestreams_kinesis_spark.catalog import load_table
from reactivestreams_kinesis_spark.operators.snapshots import (
    _file_ndv,
    _hll_add,
    _hll_estimate,
    _hll_merge,
    _key_overlap_factor,
    _read_manifest,
    approx_distinct_count,
    compact_snapshot,
    delete_where,
    latest_version,
    set_ndv_columns,
    snapshot_commit,
    table_stats_summary,
)


def _sketch_of(values) -> dict:
    regs = bytearray(512)
    for v in values:
        _hll_add(regs, str(v))
    return {"p": 9, "b64": base64.b64encode(bytes(regs)).decode("ascii")}


def test_hll_union_register_exact_vs_direct():
    """Union of per-part sketches ≡ the sketch of the concatenation,
    REGISTER-EXACT — not approximately: max-of-max is associative."""
    parts = [range(0, 4000), range(3000, 9000), range(8500, 20000)]
    union = _hll_merge([_sketch_of(p) for p in parts])
    direct_regs = bytearray(512)
    for p in parts:
        for v in p:
            _hll_add(direct_regs, str(v))
    assert bytes(union) == bytes(direct_regs)


def test_hll_estimate_accuracy():
    """Estimates stay inside a conservative 4σ envelope (σ ≈ 4.6% at 512
    registers) across the regimes the per-file sketches see, including
    the linear-counting small range."""
    for n in (40, 400, 4000, 40000):
        est = _hll_estimate(
            bytearray(base64.b64decode(_sketch_of(range(n))["b64"]))
        )
        assert abs(est - n) / n < 0.2, (n, est)


def test_ndv_sketches_commit_summary_and_deletes(spark, sf_dir, tmp_path):
    """Declared NDV columns sketch on every later commit; the summary
    and approx_distinct_count fold them zero-I/O; coverage and pending
    deletes gate the answer honestly; compaction restores it."""
    t = str(tmp_path / "t")
    base = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey", "c_acctbal"
    )
    snapshot_commit(base.repartitionByRange(4, "c_custkey"), t)      # v0
    with pytest.raises(ValueError, match="floating-point"):
        set_ndv_columns(spark, t, ["c_acctbal"])
    set_ndv_columns(spark, t, ["c_custkey", "c_nationkey"])          # v1
    # pre-declaration files carry no sketch → honest None
    assert approx_distinct_count(t, "c_custkey") is None
    compact_snapshot(spark, t)                                       # v2 rewrite
    m = _read_manifest(t, latest_version(t))
    assert m["ndv_cols"] == ["c_custkey", "c_nationkey"]
    assert all(
        m["stats"][f]["c_custkey"].get("ndv") for f in m["files"]
    )

    true_keys = base.select("c_custkey").distinct().count()
    true_nations = base.select("c_nationkey").distinct().count()
    est_keys = approx_distinct_count(t, "c_custkey")
    est_nations = approx_distinct_count(t, "c_nationkey")
    assert abs(est_keys - true_keys) / true_keys < 0.2
    # 25 nations: linear-counting regime is near-exact
    assert est_nations == true_nations
    summary = table_stats_summary(t)
    assert summary["columns"]["c_custkey"]["approx_ndv"] == est_keys
    assert summary["columns"]["c_nationkey"]["approx_ndv"] == est_nations
    # undeclared / float columns report no sketch field
    assert "approx_ndv" not in summary["columns"].get("c_acctbal", {})

    delete_where(spark, t, [("c_acctbal", "<", 0.0)], strategy="merge_on_read")
    assert approx_distinct_count(t, "c_custkey") is None  # deletes pending
    compact_snapshot(spark, t)                                       # materialize
    n_after = base.filter("c_acctbal >= 0").select("c_custkey").distinct().count()
    est_after = approx_distinct_count(t, "c_custkey")
    assert abs(est_after - n_after) / n_after < 0.2


def test_key_overlap_factor_decision(spark, sf_dir, tmp_path):
    """The merge-probe gate's input: a range-clustered layout (each key
    in one file) reads ≈1 — probing prunes; a layout where every file
    holds every key value reads ≈|files| — probing is pure overhead and
    the gate must say so."""
    base = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey"
    )

    clustered = str(tmp_path / "clustered")
    snapshot_commit(base.limit(0), clustered)
    set_ndv_columns(spark, clustered, ["c_custkey"])
    snapshot_commit(base.repartitionByRange(4, "c_custkey"), clustered)
    mc = _read_manifest(clustered, latest_version(clustered))
    data_files = [f for f in mc["files"] if mc["stats"][f]["__rows"] > 0]
    fc = _key_overlap_factor(
        {"files": data_files, "stats": mc["stats"]}, "c_custkey"
    )
    assert fc is not None and fc < 1.5, fc

    overlapping = str(tmp_path / "overlapping")
    snapshot_commit(base.limit(0), overlapping)
    set_ndv_columns(spark, overlapping, ["c_nationkey"])
    # random 4-way split: all 25 nation keys land in every file
    snapshot_commit(base.repartition(4), overlapping)
    mo = _read_manifest(overlapping, latest_version(overlapping))
    data_files_o = [f for f in mo["files"] if mo["stats"][f]["__rows"] > 0]
    fo = _key_overlap_factor(
        {"files": data_files_o, "stats": mo["stats"]}, "c_nationkey"
    )
    assert fo is not None and fo > 0.5 * len(data_files_o), fo

    # a file without a sketch → None (no guessing)
    broken = {"files": data_files + ["nope.parquet"], "stats": mc["stats"]}
    assert _key_overlap_factor(broken, "c_custkey") is None


def test_file_ndv_refuses_unsketchable(spark, sf_dir, tmp_path):
    """Float/bool columns never sketch (canonicalization contract shared
    with the blooms); absent columns return None."""
    p = str(tmp_path / "f.parquet")
    load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_acctbal"
    ).coalesce(1).write.parquet(str(tmp_path / "d"))
    import glob
    import shutil

    shutil.copy(glob.glob(str(tmp_path / "d" / "*.parquet"))[0], p)
    assert _file_ndv(p, "c_acctbal") is None
    assert _file_ndv(p, "missing_col") is None
    assert _file_ndv(p, "c_custkey") is not None
