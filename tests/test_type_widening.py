"""TYPE WIDENING in schema evolution (round 10): int→bigint and
float→double (plus the byte→short→int→long chain) merge through
`_merge_schema` — each file keeps its WRITTEN type, the manifest
declares the widened type, and readers promote at scan time (Spark 4's
vectorized parquet reader natively; pyarrow casts in the custom
source). No file rewrite at any table size.

Contract:
- a wider append widens the declared schema; the pre-widening files'
  values read exactly under the wide type (including values that only
  fit the wide type in the NEW files);
- a narrower append under a widened table keeps the wide type;
- non-widening changes still refuse;
- stats pruning keeps working across the straddle (footer stats carry
  each file's written type; comparisons are value-level);
- merge-on-read deletes straddle the widening: an equality-delete key
  file written BEFORE the widening still applies after it (the source's
  Arrow join casts the key table to the declared type);
- the custom source (batch + changeFeed) reads straddled tables;
- composes with RENAME (physical mapping): widen a renamed column.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from reactivestreams_kinesis_spark.catalog import load_table
from reactivestreams_kinesis_spark.operators.snapshots import (
    _read_manifest,
    delete_by_key,
    latest_version,
    prune_files,
    read_snapshot,
    rename_column,
    scan_snapshot,
    snapshot_change_feed,
    snapshot_commit,
)
from reactivestreams_kinesis_spark.sources.snapshot_source import (
    register_snapshot_source,
)


def _declared_types(t):
    m = _read_manifest(t, latest_version(t))
    return {f["name"]: f["type"] for f in m["schema"]["fields"]}


def test_widening_append_and_time_travel(spark, sf_dir, tmp_path):
    t = str(tmp_path / "t")
    narrow = spark.createDataFrame(
        [(1, 1.5), (2, -2.5), (3, 3.5)], "k int, v float"
    )
    wide = spark.createDataFrame(
        [(3_000_000_000, 1e300)], "k bigint, v double"
    )
    snapshot_commit(narrow, t)                                       # v0
    snapshot_commit(wide, t)                                         # v1
    assert _declared_types(t) == {"k": "long", "v": "double"}

    got = read_snapshot(spark, t)
    assert dict(got.dtypes) == {"k": "bigint", "v": "double"}
    assert got.count() == 4
    assert got.filter("k = 3000000000").count() == 1
    assert got.filter("k = 2").collect()[0]["v"] == -2.5
    # time travel: v0 reads with its own (narrow) schema
    assert dict(read_snapshot(spark, t, 0).dtypes) == {"k": "int", "v": "float"}

    # a narrower append under the widened table keeps the wide type
    snapshot_commit(spark.createDataFrame([(7, 7.0)], "k int, v float"), t)  # v2
    assert _declared_types(t) == {"k": "long", "v": "double"}
    assert read_snapshot(spark, t).count() == 5

    # non-widening changes still refuse
    with pytest.raises(ValueError, match="cannot change column"):
        snapshot_commit(spark.createDataFrame([("x", 1.0)], "k string, v double"), t)
    with pytest.raises(ValueError, match="cannot change column"):
        snapshot_commit(spark.createDataFrame([(1, 1)], "k bigint, v int"), t)


def test_widening_straddle_prune_and_source(spark, sf_dir, tmp_path):
    register_snapshot_source(spark)
    t = str(tmp_path / "t")
    lo = spark.range(0, 100).select(F.col("id").cast("int").alias("k"))
    hi = spark.range(0, 5).select(
        (F.col("id") + 4_000_000_000).alias("k")  # bigint-only values
    )
    snapshot_commit(lo.coalesce(1), t)                               # v0 int
    snapshot_commit(hi.coalesce(1), t)                               # v1 long
    m = _read_manifest(t, latest_version(t))

    # stats prune across the straddle: a predicate above the int range
    # keeps only the wide file; one inside keeps only the narrow file
    assert len(prune_files(m, [("k", ">", 3_999_999_999)])) == 1
    assert len(prune_files(m, [("k", "<", 50)])) == 1
    got = scan_snapshot(spark, t, [("k", ">=", 4_000_000_000)])
    assert got.count() == 5

    # custom source: batch read promotes the narrow file
    src = spark.read.format("snapshot_table").option("path", t).load()
    assert dict(src.dtypes) == {"k": "bigint"}
    assert src.count() == 105
    assert src.filter("k = 4000000001").count() == 1

    # equality delete keyed BEFORE more widening-era appends still
    # applies through the source's Arrow join (key file holds int32)
    t2 = str(tmp_path / "t2")
    snapshot_commit(lo.coalesce(1), t2)                              # v0 int
    delete_by_key(spark, t2, spark.createDataFrame([(7,), (9,)], "k int"), "k")
    snapshot_commit(hi.coalesce(1), t2)                              # widen
    src2 = spark.read.format("snapshot_table").option("path", t2).load()
    assert src2.count() == 103
    assert src2.filter("k IN (7, 9)").count() == 0
    nat = read_snapshot(spark, t2)
    assert nat.count() == 103 and nat.filter("k IN (7, 9)").count() == 0

    # change feed across the widening: v0's (int-file) inserts surface
    # as bigint through the full-history source read
    full = (
        spark.read.format("snapshot_table")
        .option("path", t)
        .option("changeFeed", "true")
        .load()
    )
    assert dict(full.dtypes)["k"] == "bigint"
    assert full.filter("_commit_version = 0").count() == 100
    feed = snapshot_change_feed(spark, t, from_version=0)
    cdf_src = (
        spark.read.format("snapshot_table")
        .option("path", t)
        .option("changeFeed", "true")
        .option("startingVersion", 0)
        .load()
    )
    assert cdf_src.exceptAll(feed).count() == 0
    assert feed.exceptAll(cdf_src).count() == 0


def test_widening_composes_with_rename(spark, sf_dir, tmp_path):
    """Widen a RENAMED column: the physical name stays the original, the
    declared type widens, values from all three eras read exactly."""
    t = str(tmp_path / "t")
    snapshot_commit(
        spark.createDataFrame([(1, 10)], "id int, amount int"), t
    )                                                                # v0
    rename_column(t, "amount", "amt")                                # v1
    snapshot_commit(
        spark.createDataFrame([(2, 5_000_000_000)], "id int, amt bigint"), t
    )                                                                # v2
    m = _read_manifest(t, latest_version(t))
    assert m["phys"] == {"amt": "amount"}
    assert _declared_types(t) == {"id": "integer", "amt": "long"}
    got = read_snapshot(spark, t).orderBy("id").collect()
    assert [(r["id"], r["amt"]) for r in got] == [(1, 10), (2, 5_000_000_000)]


def test_decimal_widening_straddle_and_refusal(spark, tmp_path):
    """Decimal widening (round 10): an append whose decimal column needs
    more precision or scale widens the declared schema to the least
    upper bound; files written under the narrow type read back promoted
    (Spark's vectorized reader and the source's pyarrow cast both
    support it — verified by value, not claimed). A pair whose bound
    exceeds decimal(38) refuses. Before the _wider_type decimal branch,
    decimal(13,2) silently 'equaled' decimal(12,2) by typeName and the
    published table could not read its own files."""
    from decimal import Decimal

    import pytest
    from pyspark.sql import functions as F

    from reactivestreams_kinesis_spark.operators.snapshots import (
        read_snapshot,
        snapshot_commit,
    )
    from reactivestreams_kinesis_spark.sources.snapshot_source import (
        register_snapshot_source,
    )

    t = str(tmp_path / "dec_widen")
    mk = lambda rows, typ: spark.createDataFrame(
        [(i, Decimal(x)) for i, x in rows], f"id bigint, x decimal{typ}"
    )
    snapshot_commit(mk([(1, "12.34"), (2, "5.00")], "(12,2)"), t)   # v0
    snapshot_commit(mk([(3, "123456789012.3")], "(13,1)"), t)       # v1 widens
    got = {tuple(r) for r in read_snapshot(spark, t).collect()}
    want = {
        (1, Decimal("12.34")),
        (2, Decimal("5.00")),
        (3, Decimal("123456789012.30")),
    }
    assert got == want
    # declared schema is the LUB: int digits 12, scale 2 -> decimal(14,2)
    f = dict(zip(read_snapshot(spark, t).schema.names, read_snapshot(spark, t).schema))
    assert f["x"].dataType.simpleString() == "decimal(14,2)"
    # the Python-source read path promotes identically
    register_snapshot_source(spark)
    src = (
        spark.read.format("snapshot_table").option("path", t).load()
    )
    assert {tuple(r) for r in src.collect()} == want
    # beyond decimal(38): refuse, never truncate (int digits 25 + scale
    # 20 has no representable least upper bound)
    t2 = str(tmp_path / "dec_refuse")
    snapshot_commit(mk([(1, "1")], "(25,0)"), t2)
    with pytest.raises(ValueError, match="schema evolution cannot change"):
        snapshot_commit(mk([(2, "0.5")], "(20,20)"), t2)
