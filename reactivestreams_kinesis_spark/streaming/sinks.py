"""Record sinks — the produce side (SURVEY.md §2.1 S3, S4).

The reference's produce side exists only as intent (``README.md:6`` "data
may be produced to … Kinesis") plus test seeding code that writes ordered
records with ``PutRecordRequest`` + ``setSequenceNumberForOrdering``
(``ShardPublisherVerification.scala:42-52``). Here the producer is a
``foreachBatch`` sink: each microbatch is written transactionally per
epoch, giving exactly-once file output and at-least-once push output —
already stronger than the reference's fire-and-forget puts.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery


def parquet_record_sink(
    records: DataFrame, out_dir: str, checkpoint_dir: str
) -> StreamingQuery:
    """Durable record sink: append each microbatch to parquet with
    checkpointed offsets — the harness-testable stand-in for a downstream
    stream/table (exactly-once via file-sink transaction log)."""
    return (
        records.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def put_records_batch(batch: DataFrame, stream_name: str, put_fn: Callable) -> None:
    """Produce one microbatch to a Kinesis-shaped endpoint (S3),
    executor-side — no driver ``collect()``.

    ``put_fn(stream_name, entries)`` receives ``[{"Data": bytes,
    "PartitionKey": str}, ...]`` chunks of ≤500 (the Kinesis PutRecords
    limit, public AWS docs) and runs INSIDE ``foreachPartition``: each
    executor streams its partition straight to the service, so producer
    throughput scales with the cluster instead of bottlenecking on the
    driver. Ordering: rows are hash-repartitioned on partitionKey (one
    partition owns a key) then sorted on (partitionKey, sequenceNumber)
    within the partition — the per-key write-ordering the reference chains
    via ``setSequenceNumberForOrdering``
    (``ShardPublisherVerification.scala:47-49``). In this harness
    ``put_fn`` is a test double (it must be picklable — it ships to the
    executor Python workers); in production it wraps
    ``boto3.client("kinesis").put_records``.
    """

    def push(rows) -> None:
        entries: list[dict] = []
        for r in rows:
            entries.append({"Data": bytes(r.data), "PartitionKey": r.partitionKey})
            if len(entries) == 500:
                put_fn(stream_name, entries)
                entries = []
        if entries:
            put_fn(stream_name, entries)

    (
        batch.select("data", "partitionKey", "sequenceNumber")
        .repartition(F.col("partitionKey"))
        .sortWithinPartitions("partitionKey", "sequenceNumber")
        .foreachPartition(push)
    )


def kinesis_record_sink(
    records: DataFrame,
    stream_name: str,
    put_fn: Callable,
    checkpoint_dir: str | None = None,
) -> StreamingQuery:
    """Streaming producer (S3): foreachBatch → ``put_records_batch`` —
    each microbatch pushed per-partition from the executors."""
    writer = records.writeStream.foreachBatch(
        lambda batch, _epoch: put_records_batch(batch, stream_name, put_fn)
    ).trigger(availableNow=True)
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    return writer.start()


def write_partitioned(df, out_dir: str, partition_cols: list[str], mode: str = "overwrite") -> None:
    """Partitioned parquet write — thin delegate kept for the sink-side
    call sites; the canonical layout lever (with the directory-pruning
    contract and optional within-partition clustering) lives beside
    ``sorted_write``/``interleaved_write`` in
    ``operators.layout.partitioned_write``."""
    from reactivestreams_kinesis_spark.operators.layout import partitioned_write

    partitioned_write(df, out_dir, partition_cols, mode=mode)
