"""The standardized Kinesis record schema and fixture emulation (S1).

Schema per SURVEY.md §1.2 — the de-facto record shape of public Spark
Kinesis connectors, matching the three fields the reference actually touches
(``data`` ``ShardPublisherVerification.scala:45``, ``partitionKey`` ``:46``,
``sequenceNumber`` ``:47``) plus arrival timestamp and stream/shard
addressing (``ShardPublisher.java:23-24``).

No AWS in the harness (the reference's own live-network test is commented
out — ``ShardProducerSpec.scala:20-53``), so streams are emulated: any
DataFrame is projected to the record schema and replayed through the file
source, which preserves per-shard ordering within a microbatch the same way
a shard iterator does.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from reactivestreams_kinesis_spark.catalog import load_table

RECORD_SCHEMA = T.StructType(
    [
        T.StructField("data", T.BinaryType()),
        T.StructField("partitionKey", T.StringType()),
        T.StructField("sequenceNumber", T.StringType()),
        T.StructField("approximateArrivalTimestamp", T.TimestampType()),
        T.StructField("streamName", T.StringType()),
        T.StructField("shardId", T.StringType()),
    ]
)


def _shard_id(key_col, n_shards: int):
    """Kinesis-style shard routing: hash the partition key into one of
    ``n_shards`` zero-padded shard ids — single definition shared by every
    record emulation so the routings cannot drift."""
    return F.concat(
        F.lit("shardId-"),
        F.format_string("%012d", F.pmod(F.crc32(key_col.cast("string")), F.lit(n_shards))),
    )


def events_as_records(
    spark: SparkSession,
    sf_dir: str,
    stream_name: str = "events",
    n_shards: int = 4,
) -> DataFrame:
    """Project the ``events`` fixture to the record schema: payload = JSON
    of the event (the opaque-blob model — consumers decode, engine doesn't),
    partitionKey = user_id, sequenceNumber = zero-padded event_id (monotone,
    seekable), shard = hash(partitionKey) % n_shards exactly like Kinesis
    routes partition keys to shards."""
    events = load_table(spark, sf_dir, "events")
    payload = F.to_json(F.struct("event_id", "event_type", "value", "props"))
    return events.select(
        payload.cast("binary").alias("data"),
        F.col("user_id").cast("string").alias("partitionKey"),
        F.format_string("%020d", F.col("event_id")).alias("sequenceNumber"),
        F.col("ts").alias("approximateArrivalTimestamp"),
        F.lit(stream_name).alias("streamName"),
        _shard_id(F.col("user_id"), n_shards).alias("shardId"),
    )


def write_record_fixture(
    spark: SparkSession,
    sf_dir: str,
    out_dir: str,
    n_files: int = 4,
    **kwargs,
) -> str:
    """Materialize the record projection as ``n_files`` parquet files so the
    file streaming source can replay them as multiple microbatches
    (``maxFilesPerTrigger=1`` → one batch per file — the emulation of the
    reference's per-tick GetRecords pages, ``ShardSubscription.java:139-150``).
    Files are split on sequenceNumber ranges so arrival order ≈ sequence
    order, like a shard replay."""
    records = events_as_records(spark, sf_dir, **kwargs)
    (
        records.withColumn(
            "__bucket",
            F.ntile(n_files).over(Window.orderBy("sequenceNumber")),
        )
        .repartitionByRange(n_files, "__bucket")
        .sortWithinPartitions("sequenceNumber")
        .drop("__bucket")
        .write.mode("overwrite")
        .parquet(out_dir)
    )
    return out_dir


def read_events_stream(
    spark: SparkSession,
    sf_dir: str,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """The ``events`` fixture as a stream: file source over the same parquet
    the batch catalog reads, with the same ts normalization (fixtures have
    shipped both TIMESTAMP(NANOS) — readable only as int64 nanos — and
    TIMESTAMP(MICROS); detect from the footer like the batch catalog does).
    This is how every streaming query in the harness replays event time."""
    from reactivestreams_kinesis_spark.catalog import (
        _SCHEMA_CACHE,
        _ensure_session_confs,
        table_path,
    )

    _ensure_session_confs(spark)
    # share the batch catalog's per-path schema cache (same key) so the
    # footer-sniff job fires at most once per fixture path per process,
    # whether the first reader was batch or streaming
    events_path = table_path(sf_dir, "events")
    cached_schema = _SCHEMA_CACHE.get(events_path)
    if cached_schema is None:
        cached_schema = spark.read.parquet(events_path).schema
        _SCHEMA_CACHE[events_path] = cached_schema
    raw_ts = dict(
        (f.name, f.dataType.simpleString()) for f in cached_schema.fields
    )["ts"]
    ts_is_nanos = raw_ts == "bigint"
    schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField(
                "ts", T.LongType() if ts_is_nanos else T.TimestampType()
            ),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    )
    reader = spark.readStream.schema(schema).option("pathGlobFilter", "events.parquet")
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(sf_dir)
    if ts_is_nanos:
        stream = stream.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    return stream


def read_record_stream(
    spark: SparkSession,
    records_dir: str,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Unbounded scan of the emulated shard (S1): file source projected to
    the record schema. ``maxFilesPerTrigger`` is the demand cap (F1/F2):
    each microbatch pulls at most that many files, exactly as the reference
    sizes each fetch by outstanding demand (``ShardSubscription.java:141``)."""
    reader = spark.readStream.schema(RECORD_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(records_dir)


def rate_record_stream(
    spark: SparkSession,
    rows_per_second: int = 100,
    stream_name: str = "rate-emulation",
    n_shards: int = 4,
) -> DataFrame:
    """Unbounded synthetic shard (S1's rate-source emulation): Spark's rate
    source projected to the record schema — an infinite stream for
    soak/demo runs where the file replay's boundedness is the wrong shape.
    sequenceNumber is the rate source's monotone ``value``; payloads are
    the reference's TCK seeding shape (``testData-%d``,
    ShardPublisherVerification.scala:44-45)."""
    rate = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", rows_per_second)
        # shards → input partitions (SURVEY §1.2): generation and all
        # narrow work downstream parallelize per shard, exactly how a
        # connector turns N shards into N partitions per microbatch
        .option("numPartitions", n_shards)
        .load()
    )
    partition_key = F.pmod(F.col("value"), F.lit(50))
    return rate.select(
        F.concat(F.lit("testData-"), F.col("value")).cast("binary").alias("data"),
        partition_key.cast("string").alias("partitionKey"),
        F.format_string("%020d", F.col("value")).alias("sequenceNumber"),
        F.col("timestamp").alias("approximateArrivalTimestamp"),
        F.lit(stream_name).alias("streamName"),
        _shard_id(partition_key, n_shards).alias("shardId"),
    )
