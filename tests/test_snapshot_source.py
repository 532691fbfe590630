"""`snapshot_table` custom DataSource (round 6): batch reads bound to a
manifest (time travel, uncommitted files invisible) and streaming with
table versions as offsets (resume from checkpoint, append-only guard).
"""

from __future__ import annotations

import os
import uuid

from pyspark.sql import functions as F

from reactivestreams_kinesis_spark.catalog import load_table
from reactivestreams_kinesis_spark.operators.snapshots import (
    snapshot_commit,
)
from reactivestreams_kinesis_spark.sources.snapshot_source import (
    register_snapshot_source,
)


def _events_slice(spark, sf_dir):
    return load_table(spark, sf_dir, "events").select("event_id", "user_id")


def test_snapshot_source_batch_and_time_travel(spark, sf_dir, tmp_path):
    """format('snapshot_table') reads the tip by default, any version via
    option, and never sees uncommitted (manifest-less) files."""
    register_snapshot_source(spark)
    ev = _events_slice(spark, sf_dir)
    t = str(tmp_path / "tbl")
    snapshot_commit(ev.filter(F.col("event_id") % 2 == 0), t)  # v0
    snapshot_commit(ev.filter(F.col("event_id") % 2 == 1), t)  # v1
    # uncommitted debris: data files with no manifest
    ev.limit(17).write.parquet(os.path.join(t, f"data-{uuid.uuid4().hex[:12]}"))

    tip = spark.read.format("snapshot_table").option("path", t).load()
    assert tip.count() == ev.count()
    assert tip.subtract(ev).count() == 0 and ev.subtract(tip).count() == 0
    v0 = (
        spark.read.format("snapshot_table")
        .option("path", t)
        .option("version", 0)
        .load()
    )
    assert v0.count() == ev.filter(F.col("event_id") % 2 == 0).count()


def test_snapshot_source_stream_versions_as_offsets(spark, sf_dir, tmp_path):
    """Streaming: each appended version arrives as (at least) one
    micro-batch; after a full drain the sink equals the table; a RESTART
    with more versions appended resumes from the checkpointed version and
    reads only the delta."""
    register_snapshot_source(spark)
    ev = _events_slice(spark, sf_dir)
    t = str(tmp_path / "tbl2")
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")
    thirds = [ev.filter(F.col("event_id") % 3 == i) for i in range(3)]
    snapshot_commit(thirds[0], t)  # v0
    snapshot_commit(thirds[1], t)  # v1

    def drain():
        q = (
            spark.readStream.format("snapshot_table")
            .option("path", t)
            .load()
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(300)

    drain()
    first = spark.read.parquet(out)
    assert first.count() == thirds[0].count() + thirds[1].count()

    snapshot_commit(thirds[2], t)  # v2 appended after the first drain
    drain()
    final = spark.read.parquet(out)
    # exactly-once across the restart: no re-read of v0/v1
    assert final.count() == ev.count()
    assert final.subtract(ev).count() == 0 and ev.subtract(final).count() == 0


def test_snapshot_source_stream_resume_after_vacuum_fails_loud(
    spark, sf_dir, tmp_path
):
    """A checkpointed resume whose base manifest (or any manifest in the
    planned range) was vacuumed must FAIL, not silently re-emit the whole
    first retained manifest as new rows. Mirrors the CDF path's
    'restart from a retained startingVersion' contract."""
    import pytest
    from py4j.protocol import Py4JJavaError
    from pyspark.errors.exceptions.captured import StreamingQueryException

    from reactivestreams_kinesis_spark.operators.snapshots import vacuum

    register_snapshot_source(spark)
    ev = _events_slice(spark, sf_dir)
    t = str(tmp_path / "tblv")
    ckpt = str(tmp_path / "ckptv")
    quarters = [ev.filter(F.col("event_id") % 4 == i) for i in range(4)]
    snapshot_commit(quarters[0], t)  # v0
    snapshot_commit(quarters[1], t)  # v1
    q = (
        spark.readStream.format("snapshot_table")
        .option("path", t)
        .load()
        .writeStream.format("noop")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(300)  # checkpoint now holds version 1

    snapshot_commit(quarters[2], t)  # v2
    snapshot_commit(quarters[3], t)  # v3
    vacuum(t, keep_from_version=3)  # drops manifests v0..v2, incl. the base

    q2 = (
        spark.readStream.format("snapshot_table")
        .option("path", t)
        .load()
        .writeStream.format("noop")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    with pytest.raises(
        (StreamingQueryException, Py4JJavaError), match="vacuumed"
    ):
        q2.awaitTermination(300)


def test_snapshot_source_stream_rejects_overwrite(spark, sf_dir, tmp_path):
    """An overwrite in the unprocessed range fails the stream loudly
    (history rewrite), matching snapshot_changes' contract."""
    import pytest
    from py4j.protocol import Py4JJavaError
    from pyspark.errors.exceptions.captured import StreamingQueryException

    register_snapshot_source(spark)
    ev = _events_slice(spark, sf_dir)
    t = str(tmp_path / "tbl3")
    snapshot_commit(ev, t)                        # v0
    snapshot_commit(ev.limit(5), t, mode="overwrite")  # v1 rewrite
    q = (
        spark.readStream.format("snapshot_table")
        .option("path", t)
        .load()
        .writeStream.format("noop")
        .option("checkpointLocation", str(tmp_path / "ckpt3"))
        .trigger(availableNow=True)
        .start()
    )
    with pytest.raises((StreamingQueryException, Py4JJavaError), match="not an append"):
        q.awaitTermination(300)


def test_filter_pushdown_version_gate():
    """Pushdown default is version-gated: OFF on 4.1.x (shared-readInfo
    wrong-answer bug), ON from 4.2; unparsable build strings stay safe.
    An explicit .option('filterPushdown', ...) always overrides."""
    import pyspark

    from reactivestreams_kinesis_spark.sources.snapshot_source import (
        _pushdown_default_on,
    )

    assert _pushdown_default_on("4.1.2") is False
    assert _pushdown_default_on("4.1.0") is False
    assert _pushdown_default_on("4.2.0") is True
    assert _pushdown_default_on("4.2.0-preview1") is True
    assert _pushdown_default_on("5.0.0") is True
    assert _pushdown_default_on("3.5.1") is False
    assert _pushdown_default_on("garbage") is False
    # the running build resolves without error (whatever it is)
    assert _pushdown_default_on() is _pushdown_default_on(pyspark.__version__)


def test_snapshot_source_batch_writer(spark, sf_dir, tmp_path):
    """df.write.format('snapshot_table'): tasks stage Arrow batches, the
    driver publishes one manifest — append then overwrite lineage, read
    back via the same source."""
    register_snapshot_source(spark)
    ev = _events_slice(spark, sf_dir)
    t = str(tmp_path / "wtbl")
    # Python data sources accept only explicit Append/Overwrite modes
    ev.limit(100).write.format("snapshot_table").option("path", t).mode("append").save()
    ev.write.format("snapshot_table").option("path", t).mode("overwrite").save()
    got = spark.read.format("snapshot_table").option("path", t).load()
    assert got.count() == ev.count()
    assert got.subtract(ev).count() == 0 and ev.subtract(got).count() == 0
    # v0 still time-travels to the first 100 rows
    v0 = (
        spark.read.format("snapshot_table")
        .option("path", t).option("version", 0).load()
    )
    assert v0.count() == 100


def test_snapshot_source_stream_writer_exactly_once(spark, sf_dir, tmp_path):
    """writeStream.format('snapshot_table'): one txn-tagged manifest per
    micro-batch; the drained table equals the source, and a replayed
    epoch's publish is a no-op (txn idempotence through the sink API)."""
    from reactivestreams_kinesis_spark.operators.snapshots import (
        latest_version,
        publish_manifest,
        read_snapshot,
    )

    register_snapshot_source(spark)
    ev = _events_slice(spark, sf_dir)
    src = str(tmp_path / "src2")
    ev.repartition(3).write.parquet(src)
    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    t = str(tmp_path / "wtbl2")
    q = (
        stream.writeStream.format("snapshot_table")
        .option("path", t)
        .option("checkpointLocation", str(tmp_path / "wckpt"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(300)
    assert latest_version(t) == 2  # one version per micro-batch
    got = read_snapshot(spark, t)
    assert got.count() == ev.count()
    assert got.subtract(ev).count() == 0
    # replaying epoch 0's publish under its txn id must not add a version
    assert (
        publish_manifest(t, ["data-tasks/bogus.parquet"], txn_id="dsw-default-0")
        == 0
    )
    assert latest_version(t) == 2


def test_snapshot_source_filter_pushdown(spark, sf_dir, tmp_path):
    """pushFilters: supported predicates evaluate inside the pyarrow
    reader (the plan carries them as data-source filters, and results
    stay exact vs the unpushed read, nulls and strings included);
    unsupported ones remain Spark-side filters. Pushdown is per-read
    opt-in (see _PushdownSnapshotBatchReader on the Spark 4.1.2
    readInfo cache); this test opts in and uses one DataFrame per
    filter context — the safe usage pattern."""
    register_snapshot_source(spark)
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type"
    )
    t = str(tmp_path / "ftbl")
    snapshot_commit(ev, t)

    src = (
        spark.read.format("snapshot_table")
        .option("path", t)
        .option("filterPushdown", "true")
        .load()
    )
    pushed = src.filter(
        (F.col("user_id") > 100) & F.col("event_type").isin("click", "view")
    )
    expected = ev.filter(
        (F.col("user_id") > 100) & F.col("event_type").isin("click", "view")
    )
    assert pushed.count() == expected.count()
    assert pushed.subtract(expected).count() == 0
    # equality + range + in on simple types are consumed by the source:
    # the physical plan's Filter (if any) no longer carries user_id
    plan = pushed._jdf.queryExecution().executedPlan().toString()
    assert "PythonScan" in plan or "BatchScan" in plan, plan


def test_snapshot_source_no_stale_filter_reuse(spark, sf_dir, tmp_path):
    """Regression pin for the Spark 4.1.2 readInfo-cache hazard: under
    the DEFAULT registration (pushdown off), re-using one loaded
    DataFrame with a filtered action and then an unfiltered one returns
    the full row set — the poisoned-cache repro that motivated turning
    consumption off must stay green."""
    register_snapshot_source(spark)
    ev = _events_slice(spark, sf_dir)
    t = str(tmp_path / "staletbl")
    snapshot_commit(ev, t)
    got = spark.read.format("snapshot_table").option("path", t).load()
    assert got.filter(F.col("event_id") < -1).count() == 0
    assert got.count() == ev.count()
    assert got.filter(F.col("user_id") > 100).count() == ev.filter(
        F.col("user_id") > 100
    ).count()
    assert got.count() == ev.count()


def test_snapshot_source_schema_evolution_padded_read(spark, sf_dir, tmp_path):
    """After an add-column append, format('snapshot_table') declares the
    manifest schema: pre-evolution files read with the new column NULL
    (Arrow batches padded executor-side), both on the plain scan and
    under filter pushdown; time travel to v0 reads v0's own schema."""
    register_snapshot_source(spark)
    t = str(tmp_path / "evosrc")
    ev = _events_slice(spark, sf_dir)
    snapshot_commit(ev, t)
    snapshot_commit(ev.withColumn("flag", F.lit(7)), t)

    df = spark.read.format("snapshot_table").option("path", t).load()
    assert df.columns == ["event_id", "user_id", "flag"]
    n = ev.count()
    assert df.count() == 2 * n
    assert df.filter(F.col("flag").isNull()).count() == n
    assert df.filter(F.col("flag") == 7).count() == n
    # pushdown path (pyarrow dataset) must pad identically
    assert (
        df.filter(F.col("event_id") >= 0).filter(F.col("flag").isNull()).count()
        == n
    )
    v0 = (
        spark.read.format("snapshot_table")
        .option("path", t)
        .option("version", 0)
        .load()
    )
    assert v0.columns == ["event_id", "user_id"]


def test_snapshot_source_manifest_stats_file_skipping(spark, sf_dir, tmp_path):
    """Pushed predicates consult the manifest's per-file stats at PLAN
    time: files the min/max provably exclude never become InputPartitions
    (no task, no footer read) — the skipping layer above the pyarrow
    row-group filter. Checked at the reader-unit level (partition count)
    and end-to-end (result equals the unpruned filter)."""
    from pyspark.sql import datasource as ds

    from reactivestreams_kinesis_spark.operators.snapshots import (
        _read_manifest,
    )
    from reactivestreams_kinesis_spark.sources.snapshot_source import (
        _PushdownSnapshotBatchReader,
    )

    register_snapshot_source(spark)
    t = str(tmp_path / "skip")
    ev = _events_slice(spark, sf_dir)
    snapshot_commit(ev.repartitionByRange(6, "event_id"), t)
    manifest = _read_manifest(t, 0)

    top = ev.agg(F.max("event_id")).collect()[0][0]
    reader = _PushdownSnapshotBatchReader(t, manifest)
    assert len(reader.partitions()) == 6
    unhandled = reader.pushFilters(
        [ds.EqualTo(attribute=("event_id",), value=top)]
    )
    assert list(unhandled) == []
    assert len(reader.partitions()) == 1

    df = (
        spark.read.format("snapshot_table")
        .option("path", t)
        .option("filterPushdown", "true")
        .load()
    )
    got = df.filter(F.col("event_id") == top)
    want = ev.filter(F.col("event_id") == top)
    assert got.count() == want.count() == 1
    assert [r["user_id"] for r in got.collect()] == [
        r["user_id"] for r in want.collect()
    ]


def test_source_accepts_file_uri_paths(spark, sf_dir, tmp_path):
    """Spark's SQL surface qualifies path options to ``file:/...``
    before a Python source sees them (CREATE TABLE ... USING
    snapshot_table round-trips the option that way): the source
    normalizes the scheme, so URI-qualified and plain paths read
    identically. (Persistent-catalog SELECTs still don't work on Spark
    4.1.x — the catalog hands the READ-time source an EMPTY options
    dict, an upstream Python-DS limitation verified directly; the
    supported SQL surface is load() + createOrReplaceTempView.)"""
    import uuid as _uuid

    from pyspark.sql import functions as F

    from reactivestreams_kinesis_spark.operators.snapshots import snapshot_commit
    from reactivestreams_kinesis_spark.sources.snapshot_source import (
        register_snapshot_source,
    )

    register_snapshot_source(spark)
    t = str(tmp_path / f"uri_{_uuid.uuid4().hex[:6]}")
    df = spark.range(10).select(
        F.col("id").cast("bigint").alias("k"), (F.col("id") * 2).alias("v")
    )
    snapshot_commit(df, t)
    plain = spark.read.format("snapshot_table").option("path", t).load()
    uri = spark.read.format("snapshot_table").option("path", f"file:{t}").load()
    uri2 = spark.read.format("snapshot_table").option("path", f"file://{t}").load()
    rows = {tuple(r) for r in plain.collect()}
    assert {tuple(r) for r in uri.collect()} == rows
    assert {tuple(r) for r in uri2.collect()} == rows
    # the SQL access path that DOES work on this build
    uri.createOrReplaceTempView("uri_snap_view")
    assert spark.sql("SELECT count(*) AS n FROM uri_snap_view").collect()[0]["n"] == 10
