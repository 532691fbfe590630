"""ShardStream — the reference's Publisher surface as a streaming builder.

Maps the reference API onto Structured Streaming 1:1 (SURVEY.md §2.1-2.2):

| reference                                            | here |
| ---------------------------------------------------- | ---- |
| ``new ShardPublisher(stream, shard, type, seq)``     | ``ShardStream(spark, dir).starting_at(...)`` |
| ``ShardIteratorType`` TRIM_HORIZON / AT_SEQUENCE_NUMBER (``ShardSubscription.java:79-84``) | ``starting_at("earliest")`` / ``starting_at(seq)`` (filter pushdown on sequenceNumber) |
| bounded demand / prefetch (``:31,:141``)             | ``max_files_per_trigger`` rate cap |
| 5 s poll tick (``:32-33,:92-101``)                   | ``trigger(processing_time=...)`` |
| ``maxElements`` take-N (``:67-68,:174-182``)         | ``take(n)`` |
| ``subscribe(Subscriber)`` (``ShardPublisher.java:59-77``) | ``subscribe(on_next)`` foreach sink |
| ``cancel()`` (``:195-200``)                          | ``query.stop()`` |
| — (cursor lost on restart, ``:39,:215-216``)         | ``checkpoint(path)`` — recovery the reference lacks |

The underlying source is either the emulated record directory
(``records.write_record_fixture``) or, on a real deployment, a Kinesis
connector via ``format("kinesis")`` with the same option names — the builder
only assembles options, so swapping the format is config, not code.
"""

from __future__ import annotations

import uuid
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from reactivestreams_kinesis_spark.streaming.records import (
    RECORD_SCHEMA,
    read_record_stream,
)


class ShardStream:
    """Builder for a demand-bounded, offset-seekable record stream."""

    def __init__(self, spark: SparkSession, records_dir: str, shard_id: str | None = None):
        self._spark = spark
        self._records_dir = records_dir
        self._shard_id = shard_id
        self._starting_sequence: str | None = None
        self._max_files_per_trigger: int | None = None
        self._max_elements: int | None = None
        self._trigger: dict = {"availableNow": True}
        self._checkpoint: str | None = None

    # -- option surface (mirrors ShardPublisher ctor + Subscription knobs) --

    def starting_at(self, position: str) -> "ShardStream":
        """'earliest' ≡ TRIM_HORIZON; a sequence-number string ≡
        AT_SEQUENCE_NUMBER (the two positions the reference exercises,
        ``ShardProducerSpec.scala:38``, ``ShardPublisherVerification.scala:60-61``)."""
        self._starting_sequence = None if position == "earliest" else position
        return self

    def max_files_per_trigger(self, n: int) -> "ShardStream":
        """Per-batch demand cap (F1/F2): the microbatch analog of
        ``numRequested + 100 − queued`` fetch sizing (``ShardSubscription.java:141``)."""
        self._max_files_per_trigger = n
        return self

    def take(self, n: int) -> "ShardStream":
        """Bounded stream (F4): at most ``n`` records then complete —
        ``maxElements`` semantics (``ShardSubscription.java:67-68``)."""
        self._max_elements = n
        return self

    def trigger(self, processing_time: str | None = None) -> "ShardStream":
        """Fixed-rate poll (F3) — the reference ticks every 5 s
        (``ShardSubscription.java:33``); default stays AvailableNow so tests
        terminate (F5)."""
        self._trigger = (
            {"processingTime": processing_time} if processing_time else {"availableNow": True}
        )
        return self

    def checkpoint(self, path: str) -> "ShardStream":
        """Offset checkpointing (T9) — the semantic upgrade over the
        reference's in-memory cursor (``ShardSubscription.java:39``)."""
        self._checkpoint = path
        return self

    # -- plan assembly --

    def load(self) -> DataFrame:
        df = read_record_stream(
            self._spark, self._records_dir, self._max_files_per_trigger
        )
        if self._shard_id is not None:
            df = df.filter(F.col("shardId") == self._shard_id)
        if self._starting_sequence is not None:
            df = df.filter(F.col("sequenceNumber") >= self._starting_sequence)
        return df

    # -- consumption (Subscriber side) --

    def subscribe(
        self,
        on_next: Callable,
        transform: Callable[[DataFrame], DataFrame] | None = None,
    ) -> StreamingQuery:
        """Per-record push consumption (S4): ``foreach`` sink calling
        ``on_next(row)`` — the ``Subscriber.onNext`` analog
        (``ShardSubscription.java:171``). Rows within a shard arrive in
        sequenceNumber order within each batch (F9)."""
        df = self.load()
        if transform is not None:
            df = transform(df)
        writer = df.writeStream.foreach(on_next).trigger(**self._trigger)
        if self._checkpoint:
            writer = writer.option("checkpointLocation", self._checkpoint)
        return writer.start()

    def to_memory(self, table_name: str | None = None) -> tuple[StreamingQuery, str]:
        """Memory sink (S6) for deterministic capture in tests/harness.
        Applies the take-N bound (F4) via per-batch accounting in
        foreachBatch — append-mode limit over a stream, which Spark's
        ``limit`` does not support on streaming DataFrames."""
        name = table_name or f"shard_capture_{uuid.uuid4().hex[:8]}"
        df = self.load()
        max_elements = self._max_elements
        spark = self._spark
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        spark.createDataFrame([], df.schema).write.saveAsTable(name)

        taken = {"n": 0}

        def sink(batch: DataFrame, batch_id: int) -> None:
            if max_elements is not None:
                remaining = max_elements - taken["n"]
                if remaining <= 0:
                    return
                # per-shard order: take the lowest sequence numbers first,
                # mirroring FIFO queue drain (ShardSubscription.java:163-176)
                batch = (
                    batch.orderBy("sequenceNumber").limit(remaining)
                )
            # persist so the take-N accounting count and the table write
            # execute the batch plan once, not twice
            batch.persist()
            try:
                taken["n"] += batch.count()
                batch.write.mode("append").saveAsTable(name)
            finally:
                batch.unpersist()

        writer = df.writeStream.foreachBatch(sink).trigger(**self._trigger)
        if self._checkpoint:
            writer = writer.option("checkpointLocation", self._checkpoint)
        return writer.start(), name


__all__ = ["ShardStream", "RECORD_SCHEMA"]
