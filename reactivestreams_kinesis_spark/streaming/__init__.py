"""Streaming layer: the reference's Publisher surface, Spark-first.

The reference implements a Reactive Streams ``Publisher<Record>`` over one
Kinesis shard (``ShardPublisher.java``/``ShardSubscription.java``). Spark's
microbatch engine already provides its semantics natively — demand-driven
pull (F1/F2 → ``maxOffsetsPerTrigger``-style rate caps), fixed-rate polling
(F3 → processing-time trigger), completion (F5 → ``Trigger.AvailableNow``),
cancellation (F6 → ``query.stop()``), error propagation (F7 →
``StreamingQueryException``), and — beyond the reference — checkpointed
recovery (T9; the reference drops cursor + queue on teardown,
``ShardSubscription.java:215-216``).
"""

from reactivestreams_kinesis_spark.streaming.publisher import ShardStream
from reactivestreams_kinesis_spark.streaming.records import (
    RECORD_SCHEMA,
    events_as_records,
    write_record_fixture,
)

__all__ = ["ShardStream", "RECORD_SCHEMA", "events_as_records", "write_record_fixture"]
