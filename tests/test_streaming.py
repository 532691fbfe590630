"""Structured Streaming semantics tests (SURVEY.md §5 strategy): the TCK's
role — spec conformance for the streaming path — replayed deterministically
on file sources with AvailableNow triggers and memory/foreachBatch sinks.

Covers: record emulation (S1), seek (S2), foreach sink (S4), demand caps
(F1/F2), take-N (F4), completion (F5), error teardown (F7), per-shard order
(F9), watermark late-data drops (T2/T3), session windows (T5), streaming
dedup (T6), stateful ops (T7), output modes (T8), checkpoint recovery (T9),
stream-static (J8) and stream-stream (J9) joins.
"""

from __future__ import annotations

import os
import time
import uuid

import pytest
from pyspark.sql import functions as F

from reactivestreams_kinesis_spark.streaming import (
    ShardStream,
    events_as_records,
    write_record_fixture,
)
from reactivestreams_kinesis_spark.streaming.records import RECORD_SCHEMA, read_record_stream
from reactivestreams_kinesis_spark.streaming.state import running_user_stats


@pytest.fixture(scope="module")
def records_dir(spark, sf_dir, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("records"))
    write_record_fixture(spark, sf_dir, out, n_files=4)
    return out


def _await(query, timeout=120):
    query.awaitTermination(timeout)
    assert not query.isActive, "query did not terminate"


def test_record_fixture_roundtrip(spark, sf_dir, records_dir):
    batch = spark.read.schema(RECORD_SCHEMA).parquet(records_dir)
    n_events = events_as_records(spark, sf_dir).count()
    assert batch.count() == n_events
    # payload decodes back to JSON with the original fields (P1)
    decoded = batch.select(
        F.get_json_object(F.col("data").cast("string"), "$.event_id").alias("eid")
    )
    assert decoded.filter(F.col("eid").isNull()).count() == 0


def test_take_n_ordered(spark, records_dir):
    """F4 take-N + F9 ordering: exactly N records, ascending sequenceNumber."""
    query, table = ShardStream(spark, records_dir).take(10).to_memory()
    _await(query)
    rows = spark.table(table).orderBy("sequenceNumber").collect()
    assert len(rows) == 10
    seqs = [r.sequenceNumber for r in rows]
    assert seqs == sorted(seqs) and len(set(seqs)) == 10


def test_seek_at_sequence_number(spark, records_dir):
    """S2: AT_SEQUENCE_NUMBER seek — all delivered records >= start."""
    start = "%020d" % 500
    query, table = ShardStream(spark, records_dir).starting_at(start).to_memory()
    _await(query)
    got = spark.table(table)
    assert got.count() > 0
    assert got.filter(F.col("sequenceNumber") < start).count() == 0


def test_rate_cap_multiple_batches(spark, records_dir):
    """F1/F2: demand cap — maxFilesPerTrigger=1 forces ≥2 microbatches."""
    query, table = (
        ShardStream(spark, records_dir).max_files_per_trigger(1).to_memory()
    )
    _await(query)
    batches = [p for p in query.recentProgress if p["numInputRows"] > 0]
    assert len(batches) >= 2, f"expected multiple pulls, got {len(batches)}"


def test_shard_filter(spark, records_dir):
    """Per-shard addressing (ShardPublisher.java:23-24): one publisher = one shard."""
    shard = "shardId-000000000000"
    query, table = ShardStream(spark, records_dir, shard_id=shard).to_memory()
    _await(query)
    got = spark.table(table)
    assert got.count() > 0
    assert got.filter(F.col("shardId") != shard).count() == 0


def test_subscribe_foreach(spark, records_dir, tmp_path):
    """S4 foreach sink: per-record on_next callback (Subscriber.onNext analog)."""
    out_file = str(tmp_path / "seen.txt")

    def on_next(row):
        with open(out_file, "a") as f:
            f.write(row.sequenceNumber + "\n")

    query = ShardStream(spark, records_dir).subscribe(on_next)
    _await(query)
    with open(out_file) as f:
        lines = [line.strip() for line in f if line.strip()]
    expected = spark.read.schema(RECORD_SCHEMA).parquet(records_dir).count()
    assert len(lines) == expected


def test_checkpoint_recovery(spark, sf_dir, tmp_path):
    """T9: restart from checkpoint processes only new files — the semantic
    upgrade over the reference's dropped in-memory cursor."""
    records = events_as_records(spark, sf_dir).orderBy("sequenceNumber")
    first, second = records.limit(400), records.subtract(records.limit(400))
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    sink_dir = str(tmp_path / "sink")
    first.coalesce(1).write.mode("append").parquet(src)

    def run():
        q = (
            read_record_stream(spark, src)
            .writeStream.format("parquet")
            .option("path", sink_dir)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        _await(q)
        return q

    q1 = run()
    n1 = sum(p["numInputRows"] for p in q1.recentProgress)
    second.coalesce(1).write.mode("append").parquet(src)
    q2 = run()
    n2 = sum(p["numInputRows"] for p in q2.recentProgress)
    total = spark.read.schema(RECORD_SCHEMA).parquet(sink_dir).count()
    assert n1 == 400
    assert n2 == total - 400, "restart must resume from checkpoint, not reprocess"
    assert total == records.count()


def test_watermark_drops_late_data(spark, tmp_path):
    """T2/T3: append-mode tumbling window with watermark drops an event
    arriving beyond the watermark."""
    src = str(tmp_path / "late_src")
    os.makedirs(src)
    schema = "ts timestamp, user_id bigint, value double"

    def mk(rows, name):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode("append").parquet(
            src + "/" + name
        )

    # batch 1: on-time events 10:00-11:00 → watermark advances to 10:50
    import datetime as dt

    t = lambda h, m: dt.datetime(2024, 1, 1, h, m)
    mk([(t(10, 5), 1, 1.0), (t(10, 35), 1, 1.0), (t(11, 0), 1, 1.0)], "f1")
    time.sleep(1.1)  # file source orders batches by modification time
    # batch 2: on-time 11:05 — locks the >=10:50 watermark in for late-event
    # filtering (Spark applies the PREVIOUS batch's watermark to late rows)
    mk([(t(11, 5), 1, 1.0)], "f2")
    time.sleep(1.1)
    # batch 3: a 9:00 event — far behind the watermark → dropped
    mk([(t(9, 0), 1, 1.0), (t(11, 10), 1, 1.0)], "f3")

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/*")
        .withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "30 minutes").alias("win"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    name = f"late_{uuid.uuid4().hex[:8]}"
    q = stream.writeStream.format("memory").queryName(name).outputMode("append").trigger(
        availableNow=True
    ).start()
    _await(q)
    wins = {
        (r.win.start.strftime("%H:%M"), r.n)
        for r in spark.table(name).collect()
    }
    # the 09:00 window must NOT appear; the 10:00 and 10:30 windows must.
    assert ("09:00", 1) not in wins
    assert ("10:00", 1) in wins and ("10:30", 1) in wins


def test_session_window(spark, tmp_path):
    """T5: native session windows with a 30-minute gap."""
    import datetime as dt

    schema = "ts timestamp, user_id bigint"
    t = lambda h, m: dt.datetime(2024, 1, 1, h, m)
    src = str(tmp_path / "sess_src")
    rows = [
        (t(10, 0), 1), (t(10, 10), 1), (t(10, 20), 1),  # session 1
        (t(12, 0), 1),                                   # session 2
        (t(10, 5), 2),                                   # session 3
    ]
    spark.createDataFrame(rows, schema).coalesce(1).write.parquet(src)
    stream = (
        spark.readStream.schema(schema)
        .parquet(src)
        .withWatermark("ts", "1 minute")
        .groupBy("user_id", F.session_window("ts", "30 minutes").alias("sw"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    name = f"sess_{uuid.uuid4().hex[:8]}"
    q = stream.writeStream.format("memory").queryName(name).outputMode("complete").trigger(
        availableNow=True
    ).start()
    _await(q)
    got = {(r.user_id, r.n) for r in spark.table(name).collect()}
    assert got == {(1, 3), (1, 1), (2, 1)}


def test_streaming_dedup(spark, records_dir):
    """T6: dropDuplicates over a stream — state holds keys across batches."""
    stream = read_record_stream(spark, records_dir, max_files_per_trigger=2)
    deduped = stream.select("partitionKey").dropDuplicates(["partitionKey"])
    name = f"dedup_{uuid.uuid4().hex[:8]}"
    q = deduped.writeStream.format("memory").queryName(name).outputMode("append").trigger(
        availableNow=True
    ).start()
    _await(q)
    expected = (
        spark.read.schema(RECORD_SCHEMA).parquet(records_dir)
        .select("partitionKey").distinct().count()
    )
    assert spark.table(name).count() == expected


def test_stream_static_join(spark, sf_dir, records_dir):
    """J8: enrich the record stream with the static customer dimension."""
    from reactivestreams_kinesis_spark.catalog import load_table

    customer = load_table(spark, sf_dir, "customer")
    stream = read_record_stream(spark, records_dir)
    joined = stream.join(
        F.broadcast(customer),
        stream.partitionKey == customer.c_custkey.cast("string"),
        "inner",
    ).select("sequenceNumber", "partitionKey", "c_mktsegment")
    name = f"ssj_{uuid.uuid4().hex[:8]}"
    q = joined.writeStream.format("memory").queryName(name).trigger(availableNow=True).start()
    _await(q)
    batch_records = spark.read.schema(RECORD_SCHEMA).parquet(records_dir)
    expected = batch_records.join(
        customer, batch_records.partitionKey == customer.c_custkey.cast("string")
    ).count()
    assert spark.table(name).count() == expected


def test_stream_stream_join(spark, sf_dir, tmp_path):
    """J9: stream-stream inner join with watermarks and a time-range bound
    (purchase joined to clicks within the preceding hour)."""
    from reactivestreams_kinesis_spark.catalog import load_table

    events = load_table(spark, sf_dir, "events")
    clicks_dir, buys_dir = str(tmp_path / "clicks"), str(tmp_path / "buys")
    events.filter(F.col("event_type") == "click").write.parquet(clicks_dir)
    events.filter(F.col("event_type") == "purchase").write.parquet(buys_dir)
    schema = events.schema

    clicks = (
        spark.readStream.schema(schema).parquet(clicks_dir)
        .select(
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("click_ts"),
            F.col("event_id").alias("click_id"),
        )
        .withWatermark("click_ts", "2 hours")
    )
    buys = (
        spark.readStream.schema(schema).parquet(buys_dir)
        .select(
            F.col("user_id").alias("b_user"),
            F.col("ts").alias("buy_ts"),
            F.col("event_id").alias("buy_id"),
        )
        .withWatermark("buy_ts", "2 hours")
    )
    joined = buys.join(
        clicks,
        (F.col("b_user") == F.col("c_user"))
        & (F.col("click_ts") <= F.col("buy_ts"))
        & (F.col("click_ts") >= F.col("buy_ts") - F.expr("INTERVAL 1 HOUR")),
        "inner",
    )
    name = f"s2s_{uuid.uuid4().hex[:8]}"
    q = joined.writeStream.format("memory").queryName(name).trigger(availableNow=True).start()
    _await(q)
    # batch equivalent as ground truth
    c_b, b_b = (
        events.filter(F.col("event_type") == "click"),
        events.filter(F.col("event_type") == "purchase"),
    )
    expected = b_b.alias("b").join(
        c_b.alias("c"),
        (F.col("b.user_id") == F.col("c.user_id"))
        & (F.col("c.ts") <= F.col("b.ts"))
        & (F.col("c.ts") >= F.col("b.ts") - F.expr("INTERVAL 1 HOUR")),
    ).count()
    assert spark.table(name).count() == expected


def test_stateful_running_stats(spark, sf_dir, tmp_path):
    """T7: applyInPandasWithState running per-user stats across batches
    must converge to the batch aggregate."""
    from reactivestreams_kinesis_spark.catalog import load_table

    events = load_table(spark, sf_dir, "events")
    src = str(tmp_path / "ev_src")
    events.repartition(3).write.parquet(src)
    stream = spark.readStream.schema(events.schema).option("maxFilesPerTrigger", 1).parquet(src)
    stats = running_user_stats(stream)
    name = f"state_{uuid.uuid4().hex[:8]}"
    q = stats.writeStream.format("memory").queryName(name).outputMode("update").trigger(
        availableNow=True
    ).start()
    _await(q)
    # memory sink appends update rows in batch order; the final state per
    # user is the row with the max n_events (monotone counter)
    final = (
        spark.table(name)
        .groupBy("user_id")
        .agg(F.max("n_events").alias("n_events"), F.max("max_value").alias("max_value"))
    )
    expected = events.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"), F.max("value").alias("max_value")
    )
    diff = final.join(expected, "user_id").filter(
        (final["n_events"] != expected["n_events"])
        | (final["max_value"] != expected["max_value"])
    )
    assert diff.count() == 0


def test_error_propagation(spark, records_dir):
    """F7: a failing sink surfaces through query.exception() — the
    onError path (ShardSubscription.java:223-227)."""
    from pyspark.errors.exceptions.captured import StreamingQueryException

    def boom(batch, batch_id):
        raise RuntimeError("sink failure")

    q = (
        read_record_stream(spark, records_dir)
        .writeStream.foreachBatch(boom)
        .trigger(availableNow=True)
        .start()
    )
    with pytest.raises(StreamingQueryException):
        q.awaitTermination(120)
    assert q.exception() is not None


def test_processing_time_trigger(spark, records_dir, tmp_path):
    """F3/T1 + F6: a live processing-time-triggered query (the reference's
    5 s tick, scaled down) pulls on a cadence; stop() cancels cleanly."""
    stream = read_record_stream(spark, records_dir, max_files_per_trigger=1)
    name = f"tick_{uuid.uuid4().hex[:8]}"
    q = (
        stream.writeStream.format("memory")
        .queryName(name)
        .trigger(processingTime="500 milliseconds")
        .start()
    )
    deadline = time.time() + 30
    while time.time() < deadline:
        if len([p for p in q.recentProgress if p["numInputRows"] > 0]) >= 2:
            break
        time.sleep(0.2)
    q.stop()                              # F6: cancel
    q.awaitTermination(60)
    assert not q.isActive
    ticks = [p for p in q.recentProgress if p["numInputRows"] > 0]
    assert len(ticks) >= 2, "expected multiple timed pulls"
    assert spark.table(name).count() > 0


def test_checkpoint_in_use_guard(spark, records_dir, tmp_path):
    """F8 analog: the reference rejects a second subscriber on one publisher
    (ShardPublisher.java:59-77). Spark guarantees ONE active run per query
    identity (= checkpoint) — by default (stopActiveRunOnRestart=true) the
    new run supersedes the old one, which is stopped."""
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")
    stream = read_record_stream(spark, records_dir)

    def start(tag):
        return (
            stream.writeStream.format("parquet")
            .queryName(f"{tag}_{uuid.uuid4().hex[:8]}")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(processingTime="10 seconds")
            .start()
        )

    q1 = start("g1")
    q2 = start("g2")
    try:
        deadline = time.time() + 30
        while q1.isActive and time.time() < deadline:
            time.sleep(0.2)
        assert not q1.isActive, "first run must be stopped when superseded"
        assert q2.isActive
    finally:
        q2.stop()
        q2.awaitTermination(60)


def test_dedup_within_watermark(spark, tmp_path):
    """T6 variant: dropDuplicatesWithinWatermark — state for a key is
    dropped once the watermark passes, so duplicates only collapse within
    the watermark horizon (bounded state, the 100 TB-safe dedup)."""
    import datetime as dt

    schema = "ts timestamp, k string"
    t = lambda h, m: dt.datetime(2024, 1, 1, h, m)
    src = str(tmp_path / "wmdedup")
    rows = [(t(10, 0), "a"), (t(10, 1), "a"), (t(10, 2), "b")]
    spark.createDataFrame(rows, schema).coalesce(1).write.parquet(src)
    stream = (
        spark.readStream.schema(schema)
        .parquet(src)
        .withWatermark("ts", "30 minutes")
        .dropDuplicatesWithinWatermark(["k"])
    )
    name = f"wmd_{uuid.uuid4().hex[:8]}"
    q = stream.writeStream.format("memory").queryName(name).outputMode("append").trigger(
        availableNow=True
    ).start()
    _await(q)
    got = sorted(r.k for r in spark.table(name).collect())
    assert got == ["a", "b"]


def test_tck_fixture_parity(spark, tmp_path):
    """Mirror of the reference's TCK fixture (its only active test --
    ShardPublisherVerification.scala:41-64): 10 records with payload
    "testData-%d", one shard, constant partition key, writes chained in
    sequence order; consume AT_SEQUENCE_NUMBER of the first record and
    assert complete, ordered delivery -- the createPublisher(elements)
    contract."""
    rows = [
        (
            f"testData-{d}".encode(),
            "partitionKey",                       # :46 constant key
            "%020d" % (100 + d),                  # :47-49 chained sequence
            None,
            "reactivestreams-kinesis-test",       # :28 stream name
            "shardId-000000000000",               # :31-37 single shard
        )
        for d in range(10)
    ]
    src = str(tmp_path / "tck")
    spark.createDataFrame(rows, RECORD_SCHEMA).coalesce(1).write.parquet(src)

    first_seq = "%020d" % 100                     # :50-51 seek point
    query, table = (
        ShardStream(spark, src).starting_at(first_seq).take(10).to_memory()
    )
    _await(query)
    got = spark.table(table).orderBy("sequenceNumber").collect()
    assert [bytes(r.data).decode() for r in got] == [f"testData-{d}" for d in range(10)]
    assert {r.partitionKey for r in got} == {"partitionKey"}


def test_stream_dedup_against_reference_set(spark, sf_dir, tmp_path):
    """X2 incremental form: a stream anti-joined against a static
    already-seen hash set — only unseen content passes. This is how
    exact dedup runs continuously at 100 TB (broadcast the bloom/hash
    set; stream side never shuffles)."""
    from reactivestreams_kinesis_spark.catalog import load_table

    docs = load_table(spark, sf_dir, "documents")
    seen = docs.filter(F.col("doc_id") < 250).select(
        F.md5("text").alias("seen_hash")
    )
    src = str(tmp_path / "docs_stream")
    docs.write.parquet(src)
    stream = spark.readStream.schema(docs.schema).parquet(src)
    fresh = stream.withColumn("h", F.md5("text")).join(
        F.broadcast(seen), F.col("h") == F.col("seen_hash"), "left_anti"
    )
    name = f"fresh_{uuid.uuid4().hex[:8]}"
    q = fresh.writeStream.format("memory").queryName(name).trigger(availableNow=True).start()
    _await(q)
    expected = docs.filter(F.col("doc_id") >= 250).count()
    assert spark.table(name).count() == expected


def test_stream_stream_left_outer_join(spark, sf_dir, tmp_path):
    """J9 outer variant: stream-stream LEFT OUTER with watermarks — buys
    without a qualifying click emit with nulls once the watermark passes
    the join window (state eviction proves the bound)."""
    from reactivestreams_kinesis_spark.catalog import load_table

    events = load_table(spark, sf_dir, "events")
    clicks_dir, buys_dir = str(tmp_path / "oc"), str(tmp_path / "ob")
    events.filter(F.col("event_type") == "click").write.parquet(clicks_dir)
    events.filter(F.col("event_type") == "purchase").write.parquet(buys_dir)
    schema = events.schema

    clicks = (
        spark.readStream.schema(schema).parquet(clicks_dir)
        .select(F.col("user_id").alias("c_user"), F.col("ts").alias("click_ts"))
        .withWatermark("click_ts", "2 hours")
    )
    buys = (
        spark.readStream.schema(schema).parquet(buys_dir)
        .select(
            F.col("user_id").alias("b_user"),
            F.col("ts").alias("buy_ts"),
            F.col("event_id").alias("buy_id"),
        )
        .withWatermark("buy_ts", "2 hours")
    )
    joined = buys.join(
        clicks,
        (F.col("b_user") == F.col("c_user"))
        & (F.col("click_ts") <= F.col("buy_ts"))
        & (F.col("click_ts") >= F.col("buy_ts") - F.expr("INTERVAL 10 MINUTES")),
        "left_outer",
    )
    name = f"s2slo_{uuid.uuid4().hex[:8]}"
    q = joined.writeStream.format("memory").queryName(name).trigger(availableNow=True).start()
    _await(q)
    got = spark.table(name)
    # batch ground truth
    c_b = events.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"), F.col("ts").alias("click_ts")
    )
    b_b = events.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("b_user"), F.col("ts").alias("buy_ts"),
        F.col("event_id").alias("buy_id"),
    )
    expected = b_b.join(
        c_b,
        (F.col("b_user") == F.col("c_user"))
        & (F.col("click_ts") <= F.col("buy_ts"))
        & (F.col("click_ts") >= F.col("buy_ts") - F.expr("INTERVAL 10 MINUTES")),
        "left_outer",
    )
    # matched rows must agree exactly; unmatched (null) rows may be withheld
    # for buys newer than the final watermark — compare the matched subset
    # plus require at least some null-extended rows were emitted.
    got_matched = got.filter(F.col("c_user").isNotNull())
    exp_matched = expected.filter(F.col("c_user").isNotNull())
    assert got_matched.count() == exp_matched.count()
    assert got.filter(F.col("c_user").isNull()).count() > 0


def test_rate_record_stream(spark):
    """S1 rate-source emulation: unbounded synthetic records in the standard
    schema, delivered on a processing-time trigger, stopped by cancel (F6)."""
    from reactivestreams_kinesis_spark.streaming.records import (
        RECORD_SCHEMA,
        rate_record_stream,
    )

    stream = rate_record_stream(spark, rows_per_second=200)
    # rate-source columns are non-nullable, so compare names+types only
    assert [(f.name, f.dataType) for f in stream.schema.fields] == [
        (f.name, f.dataType) for f in RECORD_SCHEMA.fields
    ]
    name = f"rate_{uuid.uuid4().hex[:8]}"
    q = (
        stream.writeStream.format("memory")
        .queryName(name)
        .trigger(processingTime="300 milliseconds")
        .start()
    )
    deadline = time.time() + 30
    while time.time() < deadline and spark.table(name).count() < 100:
        time.sleep(0.3)
    q.stop()
    q.awaitTermination(60)
    got = spark.table(name)
    assert got.count() >= 100
    row = got.orderBy("sequenceNumber").first()
    # payload value must CORRESPOND to the sequence number, not merely be
    # well-formed — pins the column pairing in the projection
    assert bytes(row.data).decode() == f"testData-{int(row.sequenceNumber)}"
    seqs = [r.sequenceNumber for r in got.select("sequenceNumber").collect()]
    assert len(set(seqs)) == len(seqs)  # monotone source → unique sequence numbers


def _perf_gate():
    """Wall-clock throughput assertions are hardware/load dependent; a
    contended CI box can set RSK_PERF_TESTS=0 to skip them without losing
    the functional suite (the floors still run by default — this harness's
    box is dedicated)."""
    import os

    import pytest

    if os.environ.get("RSK_PERF_TESTS", "1") == "0":
        pytest.skip("perf assertions disabled via RSK_PERF_TESTS=0")


def test_stream_throughput_floor(spark):
    """Throughput sanity against the reference's envelope: its derived
    ceiling is ≈20 records/s/shard (100-record prefetch per 5 s tick —
    BASELINE.md). A decode + per-shard aggregate over the rate-source
    record stream must sustain ≥ 10 000 records/s on this box — a
    conservative floor ~60× the reference's 8-shard ceiling (measured
    median here is ~590 000/s; the floor is low so a loaded CI box can't
    flake the test)."""
    _perf_gate()
    from reactivestreams_kinesis_spark.streaming.records import rate_record_stream

    recs = rate_record_stream(spark, rows_per_second=100_000, n_shards=8)
    per_shard = (
        recs.select(
            "shardId", F.col("data").cast("string").alias("text")
        )
        .groupBy("shardId")
        .count()
    )
    name = f"tp_{uuid.uuid4().hex[:8]}"
    q = (
        per_shard.writeStream.outputMode("update")
        .format("memory")
        .queryName(name)
        .trigger(processingTime="1 second")
        .start()
    )
    try:
        deadline = time.time() + 30
        rates: list[float] = []
        while time.time() < deadline and len(rates) < 4:
            time.sleep(1)
            rates = [
                p["processedRowsPerSecond"]
                for p in (q.recentProgress or [])
                if p["numInputRows"] > 0
            ][1:]  # drop the warm-up batch (backlog burst inflates its rate)
    finally:
        q.stop()
        q.awaitTermination(60)
    assert rates, "stream produced no non-empty batches in 30 s"
    # median, not max: a single backlog-draining burst must not satisfy the
    # floor — the claim under test is SUSTAINED throughput
    sustained = sorted(rates)[len(rates) // 2]
    assert sustained >= 10_000, f"sustained throughput {sustained:.0f} rows/s below floor"


def test_stream_throughput_scales_with_shards(spark):
    """The "shards → input partitions" parallelism claim (SURVEY §1.2),
    measured rather than asserted: sustained narrow-path throughput
    (decode + projection, noop sink — no shard-independent shuffle to
    saturate) at 16 emulated shards must be ≥ 1.5× the 4-shard rate.
    The requested rate (8 M rows/s) is far above 4-shard capacity so both
    configs run saturated — measuring capacity, not the rate limiter.
    Measured on this box: 4 shards ≈ 3.2 M rows/s, 16 ≈ 8.1 M (≈2.5×,
    stable across trials) — recorded in BASELINE.md. One retry with a
    longer window absorbs transient load spikes; RSK_PERF_TESTS=0 skips."""
    _perf_gate()
    from reactivestreams_kinesis_spark.streaming.records import rate_record_stream

    def sustained(n_shards: int, window: int) -> float:
        recs = rate_record_stream(
            spark, rows_per_second=8_000_000, n_shards=n_shards
        )
        decoded = (
            recs.select(F.col("data").cast("string").alias("text"), "shardId")
            .select(F.length("text").alias("n"), "shardId")
            .filter(F.col("n") > 0)
        )
        q = (
            decoded.writeStream.format("noop")
            .trigger(processingTime="1 second")
            .start()
        )
        try:
            deadline = time.time() + window
            rates: list[float] = []
            while time.time() < deadline and len(rates) < 8:
                time.sleep(1)
                rates = [
                    p["processedRowsPerSecond"]
                    for p in (q.recentProgress or [])
                    if p["numInputRows"] > 0
                ][1:]  # drop warm-up batch
        finally:
            q.stop()
            q.awaitTermination(60)
        return sorted(rates)[len(rates) // 2] if rates else 0.0

    ratio = 0.0
    for window in (30, 50):  # second pass = the load-spike retry
        r4, r16 = sustained(4, window), sustained(16, window)
        ratio = r16 / max(r4, 1.0)
        if ratio >= 1.5:
            break
    assert ratio >= 1.5, (
        f"16-shard throughput only {ratio:.2f}x of 4-shard "
        f"({r16:,.0f} vs {r4:,.0f} rows/s)"
    )


def test_stateful_running_stats_transform_with_state(spark, sf_dir, tmp_path):
    """T7 on the modern transformWithStateInPandas API (RocksDB-backed
    typed state handles): must converge to the same batch aggregate as the
    legacy GroupState flavor. Skips where the protobuf package (Spark's
    TWS state protocol) is unavailable — this container — in which case
    the operator must fail fast with a clear ImportError instead."""
    import pytest

    from reactivestreams_kinesis_spark.catalog import load_table
    from reactivestreams_kinesis_spark.streaming.state import running_user_stats_tws

    try:
        import google.protobuf  # noqa: F401
    except ImportError:
        with pytest.raises(ImportError, match="protobuf"):
            running_user_stats_tws(
                spark.readStream.format("rate").load().withColumnRenamed("value", "user_id")
            )
        pytest.skip("protobuf unavailable: transformWithStateInPandas cannot run here")

    events = load_table(spark, sf_dir, "events")
    src = str(tmp_path / "ev_src")
    events.repartition(3).write.parquet(src)
    stream = spark.readStream.schema(events.schema).option("maxFilesPerTrigger", 1).parquet(src)
    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        stats = running_user_stats_tws(stream)
        name = f"tws_{uuid.uuid4().hex[:8]}"
        q = stats.writeStream.format("memory").queryName(name).outputMode("update").trigger(
            availableNow=True
        ).start()
        _await(q)
        final = (
            spark.table(name)
            .groupBy("user_id")
            .agg(F.max("n_events").alias("n_events"), F.max("max_value").alias("max_value"))
        )
        expected = events.groupBy("user_id").agg(
            F.count(F.lit(1)).alias("n_events"), F.max("value").alias("max_value")
        )
        diff = final.join(expected, "user_id").filter(
            (final["n_events"] != expected["n_events"])
            | (final["max_value"] != expected["max_value"])
        )
        assert diff.count() == 0
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)


def test_stateful_running_stats_on_rocksdb_store(spark, sf_dir, tmp_path):
    """The T7 stateful fold must run unchanged on the RocksDB state store
    provider — the production backend at cluster scale (bounded executor
    memory, changelog checkpointing); the default HDFS-backed store keeps
    all state on the JVM heap."""
    from reactivestreams_kinesis_spark.catalog import load_table

    events = load_table(spark, sf_dir, "events")
    src = str(tmp_path / "ev_src")
    events.repartition(2).write.parquet(src)
    stream = spark.readStream.schema(events.schema).option("maxFilesPerTrigger", 1).parquet(src)
    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        stats = running_user_stats(stream)
        name = f"rocks_{uuid.uuid4().hex[:8]}"
        q = stats.writeStream.format("memory").queryName(name).outputMode("update").trigger(
            availableNow=True
        ).start()
        _await(q)
        final = (
            spark.table(name)
            .groupBy("user_id")
            .agg(F.max("n_events").alias("n_events"))
        )
        expected = events.groupBy("user_id").agg(F.count(F.lit(1)).alias("n_events"))
        diff = final.join(expected, "user_id").filter(
            final["n_events"] != expected["n_events"]
        )
        assert diff.count() == 0
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)


def test_exactly_once_kill_midbatch_restart(spark, sf_dir, tmp_path):
    """T9/§4.3 executed, not just claimed: kill a RUNNING query mid-batch,
    restart from the same checkpoint, drain — the committed sink holds
    every source record exactly once (no loss, no duplicates). The
    reference drops its cursor and all prefetched records on cancel
    (ShardSubscription.java:215-216); here the offset checkpoint plus the
    parquet sink's transactional commit log (_spark_metadata) make
    cancel/restart exactly-once: a batch interrupted mid-write leaves only
    uncommitted orphan part-files, which metadata-log-aware reads ignore,
    and the restart re-runs that batch from its checkpointed offsets."""
    from pyspark.sql.types import BooleanType
    from pyspark.sql.window import Window

    base = (
        events_as_records(spark, sf_dir)
        .withColumn("rn", F.row_number().over(Window.orderBy("sequenceNumber")))
        .filter(F.col("rn") <= 600)
    )
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    sink_dir = str(tmp_path / "sink")
    # 6 single-part files -> 6 microbatches at maxFilesPerTrigger=1
    for i in range(6):
        (
            base.filter((F.col("rn") > i * 100) & (F.col("rn") <= (i + 1) * 100))
            .drop("rn")
            .coalesce(1)
            .write.mode("append")
            .parquet(src)
        )

    # ~5 ms/row brake keeps each 100-row microbatch >= ~0.5 s so stop()
    # below reliably lands while a batch is in flight (test-only UDF)
    brake = F.udf(lambda s: time.sleep(0.005) or True, BooleanType())

    def start(trigger):
        return (
            read_record_stream(spark, src, max_files_per_trigger=1)
            .filter(brake(F.col("sequenceNumber")))
            .writeStream.format("parquet")
            .option("path", sink_dir)
            .option("checkpointLocation", ckpt)
            .trigger(**trigger)
            .start()
        )

    def committed_rows():
        try:
            return spark.read.parquet(sink_dir).count()
        except Exception:  # sink/metadata log not created yet
            return 0

    q1 = start({"processingTime": "0 seconds"})
    deadline = time.time() + 60
    while time.time() < deadline and committed_rows() < 100:
        time.sleep(0.05)
    assert committed_rows() >= 100, "no batch ever committed"
    q1.stop()  # the cancel the reference answers by dropping records
    q1.awaitTermination(60)
    killed_at = committed_rows()
    assert killed_at < 600, "kill landed after full drain; restart proves nothing"

    q2 = start({"availableNow": True})
    _await(q2)
    out = spark.read.parquet(sink_dir)
    assert out.count() == 600, "records lost across kill/restart"
    assert (
        out.select("sequenceNumber").distinct().count() == 600
    ), "duplicate records across kill/restart"
    src_df = base.drop("rn")
    assert out.subtract(src_df).count() == 0
    assert src_df.subtract(out).count() == 0


def test_incremental_ingest_dedup_vs_history(spark, sf_dir, tmp_path):
    """X2/T6 composition (round 4): incremental corpus ingestion — new
    documents stream in, exact dups are dropped both WITHIN the stream
    (first arrival wins, content-hash dedup state) and AGAINST the
    historical corpus (stream-static left-anti join on the hash). This is
    how a 100 TB training corpus absorbs a daily crawl drop without
    re-deduplicating history: the historical side is a 16-byte-key hash
    table (broadcast here; bucketed storage join at scale), the stream
    side holds only the within-drop hash set in state — watermarked in
    production (test_dedup_within_watermark) to bound it."""
    from reactivestreams_kinesis_spark.catalog import load_table

    docs = load_table(spark, sf_dir, "documents")
    cols = docs.columns
    hist = docs.filter(F.col("doc_id") % 3 == 0)
    fresh = docs.filter(F.col("doc_id") % 3 != 0)

    def reid(df, offset):
        return df.select(
            (F.col("doc_id") + offset).alias("doc_id"),
            *[c for c in cols if c != "doc_id"],
        )

    # plant dups: 3 docs whose text already exists in history, 2 in-stream
    # re-arrivals of fresh texts
    incoming = (
        fresh.unionByName(reid(hist.orderBy("doc_id").limit(3), 100_000))
        .unionByName(reid(fresh.orderBy("doc_id").limit(2), 200_000))
    )
    src = str(tmp_path / "incoming")
    incoming.write.parquet(src)

    hist_hashes = hist.select(F.md5("text").alias("h")).distinct()
    stream = spark.readStream.schema(incoming.schema).parquet(src)
    cleaned = (
        stream.withColumn("h", F.md5("text"))
        .dropDuplicates(["h"])
        .join(F.broadcast(hist_hashes), "h", "left_anti")
    )
    name = f"ingest_{uuid.uuid4().hex[:8]}"
    q = (
        cleaned.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    _await(q)
    got = spark.table(name)

    expected_hashes = {
        r["h"]
        for r in incoming.withColumn("h", F.md5("text"))
        .join(hist_hashes, "h", "left_anti")
        .select("h")
        .distinct()
        .collect()
    }
    assert {r["h"] for r in got.select("h").collect()} == expected_hashes
    # one survivor per surviving hash, and no historical text re-admitted
    assert got.count() == len(expected_hashes)
    assert (
        got.withColumnRenamed("h", "hh")
        .join(hist_hashes, F.col("hh") == F.col("h"), "inner")
        .count()
        == 0
    )


def test_watermark_boundary_semantics(spark, tmp_path):
    """T2 exact rules that the `stream_watermark_late` oracle recomputes in
    SQL — pinned here so a Spark behavior change breaks THIS test with a
    readable story instead of a value-hash mismatch:
    - the late filter for micro-batch N uses the watermark from data
      through batch N-2 (the update commits one batch late);
    - a late row is dropped iff its window END <= watermark (== drops);
    - the final flush emits a window iff END <= final watermark (== emits).
    """
    import datetime as dt

    src = str(tmp_path / "wm_bounds")
    schema = "ts timestamp, k bigint"

    def mk(rows, name, mtime):
        spark.createDataFrame(rows, schema).coalesce(1).write.parquet(
            src + "/" + name
        )
        for root, _, fs in os.walk(src + "/" + name):
            for f in fs:
                os.utime(os.path.join(root, f), (mtime, mtime))

    t = lambda h, m, s=0: dt.datetime(2024, 1, 1, h, m, s)
    mk([(t(12, 0), 1)], "f1", 1_000_000)  # wm_a = 11:50
    mk([(t(12, 5), 2)], "f2", 1_000_100)  # wm_b = 11:55 = final wm
    mk(
        [
            (t(11, 52, 30), 100),  # end 11:53 > wm_a: kept iff filter lags
            (t(11, 49, 30), 101),  # end 11:50 == wm_a: equality must drop
            (t(11, 48, 10), 102),  # end 11:49 < wm_a: dropped
            (t(11, 55, 30), 103),  # end 11:56 > final wm: stays in state
            (t(11, 54, 30), 104),  # end 11:55 == final wm: equality emits
        ],
        "f3",
        1_000_200,
    )
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/*")
        .withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 minute").alias("w"))
        .agg(F.collect_set("k").alias("ks"))
    )
    name = f"wmb_{uuid.uuid4().hex[:8]}"
    q = (
        stream.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    _await(q)
    emitted = {k for r in spark.table(name).collect() for k in r.ks}
    assert emitted == {100, 104}, (
        f"watermark boundary semantics changed: emitted {sorted(emitted)} — "
        "update the stream_watermark_late oracle to match"
    )


def test_resharding_continuity(spark, sf_dir, tmp_path):
    """S1/T9 (round 5): a shard-count change mid-stream — the emulated
    form of a Kinesis shard split, which the single-shard reference
    cannot represent (ShardPublisher.java:24) — must not break checkpoint
    continuity. Phase 1 drains 2-shard-routed records under a checkpoint;
    phase 2 appends records routed over 4 shards (same hash routing, new
    shard count, exactly like a split re-keying the hash ranges) and
    restarts from the SAME checkpoint. Exactly-once must hold across the
    reshard: nothing lost, nothing reprocessed, and both shard layouts
    coexist in the committed sink."""
    records2 = events_as_records(spark, sf_dir, n_shards=2)
    records4 = events_as_records(spark, sf_dir, n_shards=4)
    cutoff = (
        records2.select("sequenceNumber")
        .orderBy("sequenceNumber")
        .limit(300)
        .agg(F.max("sequenceNumber"))
        .collect()[0][0]
    )
    first = records2.filter(F.col("sequenceNumber") <= cutoff)
    second = records4.filter(F.col("sequenceNumber") > cutoff)

    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    sink_dir = str(tmp_path / "sink")
    first.coalesce(1).write.mode("append").parquet(src)

    def run():
        q = (
            read_record_stream(spark, src)
            .writeStream.format("parquet")
            .option("path", sink_dir)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        _await(q)
        return sum(p["numInputRows"] for p in q.recentProgress)

    n1 = run()
    assert n1 == first.count()
    second.coalesce(2).write.mode("append").parquet(src)
    n2 = run()
    assert n2 == second.count(), "restart must process ONLY the post-reshard files"

    out = spark.read.schema(RECORD_SCHEMA).parquet(sink_dir)
    total = first.count() + second.count()
    assert out.count() == total
    assert out.select("sequenceNumber").distinct().count() == total
    # the committed stream carries both shard layouts, split intact:
    # phase-1 rows on the 2-shard routing, phase-2 rows on the 4-shard one
    pre = out.filter(F.col("sequenceNumber") <= cutoff)
    post = out.filter(F.col("sequenceNumber") > cutoff)
    pre_ids = {r.shardId for r in pre.select("shardId").distinct().collect()}
    post_ids = {r.shardId for r in post.select("shardId").distinct().collect()}
    assert pre_ids == {f"shardId-{i:012d}" for i in range(2)}
    assert post_ids == {f"shardId-{i:012d}" for i in range(4)}
    # exact content parity with the union of both phases
    expected = first.unionByName(second)
    assert out.subtract(expected).count() == 0
    assert expected.subtract(out).count() == 0


def test_stream_static_join_sees_dimension_updates(spark, sf_dir, tmp_path):
    """J8 semantics production code relies on: the slowly-changing-
    dimension refresh pattern — a dimension directory overwritten between
    checkpointed runs enriches later stream batches with the NEW values,
    while rows already committed keep the values they joined at process
    time, and the checkpoint guarantees the stream itself is never
    reprocessed (so no row is re-enriched under the new dimension).
    Pinned because this combination (offset checkpoint + re-resolved
    static side) is exactly how periodic-restart streaming ETL handles
    SCD without replaying the fact stream."""
    dim_dir = str(tmp_path / "dim")
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    sink = str(tmp_path / "sink")

    spark.createDataFrame(
        [(1, "v1")], "user_id bigint, seg string"
    ).coalesce(1).write.mode("overwrite").parquet(dim_dir)

    def run_batch(rows):
        spark.createDataFrame(rows, "user_id bigint, k bigint").coalesce(
            1
        ).write.mode("append").parquet(src)
        dim = spark.read.parquet(dim_dir)
        stream = spark.readStream.schema("user_id bigint, k bigint").parquet(src)
        q = (
            stream.join(dim, "user_id")
            .writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        _await(q)

    run_batch([(1, 100)])
    # dimension update BETWEEN batches: same key, new attribute value
    spark.createDataFrame(
        [(1, "v2")], "user_id bigint, seg string"
    ).coalesce(1).write.mode("overwrite").parquet(dim_dir)
    run_batch([(1, 200)])

    got = {
        (r.k, r.seg)
        for r in spark.read.schema("user_id bigint, k bigint, seg string")
        .parquet(sink)
        .collect()
    }
    assert got == {(100, "v1"), (200, "v2")}, got
