"""Streaming observability (round 6): ProgressCollector turns the
listener bus into a queryable telemetry DataFrame.
"""

from __future__ import annotations

import uuid

from pyspark.sql import functions as F

from reactivestreams_kinesis_spark.catalog import load_table
from reactivestreams_kinesis_spark.streaming.metrics import collecting_progress


def test_progress_collector_captures_microbatches(spark, sf_dir, tmp_path):
    """A 3-file replay under the collector yields one progress row per
    micro-batch with consistent row accounting, scoped to the listener's
    lifetime; the snapshot is a plain DataFrame (aggregatable)."""
    events = load_table(spark, sf_dir, "events").select("event_id", "user_id")
    src = str(tmp_path / "src")
    events.repartition(3).write.parquet(src)

    with collecting_progress(spark) as metrics:
        name = f"met_{uuid.uuid4().hex[:8]}"
        q = (
            spark.readStream.schema(events.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
            .writeStream.format("memory")
            .queryName(name)
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(300)
        # the listener bus is async: wait for all 3 batches' events
        assert metrics.wait_for_batches(str(q.id), 3)

    snap = metrics.snapshot(spark)
    mine = snap.filter(F.col("query_id") == str(q.id))
    batches = mine.filter(F.col("num_input_rows") > 0)
    assert batches.count() == 3  # one per file
    total = batches.agg(F.sum("num_input_rows")).first()[0]
    assert total == events.count()
    # telemetry is a table: aggregate the batch-duration split
    stats = mine.agg(
        F.max("trigger_execution_ms").alias("max_trig"),
        F.max("batch_id").alias("max_batch"),
    ).first()
    assert stats["max_trig"] is not None and stats["max_batch"] >= 2

    # detached after the scope: a new query adds no rows to this
    # collector (assert on q2's id — the first query's trailing zero-row
    # events may still drain off the async bus, which is fine)
    name2 = f"met_{uuid.uuid4().hex[:8]}"
    q2 = (
        spark.readStream.schema(events.schema)
        .parquet(src)
        .writeStream.format("memory")
        .queryName(name2)
        .trigger(availableNow=True)
        .start()
    )
    assert q2.awaitTermination(300)
    assert not any(e["query_id"] == str(q2.id) for e in metrics._events)


def test_progress_collector_sees_state_metrics(spark, sf_dir, tmp_path):
    """A stateful (windowed-agg) stream reports state-store rows/memory
    through the same telemetry path — the numbers watermark tuning is
    done with."""
    events = load_table(spark, sf_dir, "events")
    src = str(tmp_path / "src2")
    events.coalesce(1).write.parquet(src)

    with collecting_progress(spark) as metrics:
        name = f"met_{uuid.uuid4().hex[:8]}"
        q = (
            spark.readStream.schema(events.schema)
            .parquet(src)
            .withWatermark("ts", "1 hour")
            .groupBy(F.window("ts", "6 hours"))
            .count()
            .writeStream.format("memory")
            .queryName(name)
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(300)
        assert metrics.wait_for_batches(str(q.id), 1)

    snap = metrics.snapshot(spark).filter(F.col("query_id") == str(q.id))
    stateful = snap.filter(F.col("state_rows_total") > 0)
    assert stateful.count() >= 1
    assert stateful.agg(F.max("state_memory_bytes")).first()[0] > 0
