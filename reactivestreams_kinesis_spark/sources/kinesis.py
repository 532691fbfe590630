"""Real AWS Kinesis source/sink option mapping (SURVEY.md §1.2, S1/S2).

The reference addresses a stream by ``(streamName, shardId)`` with a
``ShardIteratorType`` start position (``ShardPublisher.java:23-26``,
request built at ``ShardSubscription.java:79-84``). On a real cluster the
same surface is a Structured Streaming connector format; this module maps
our builder options onto the de-facto option names used by the public
Spark Kinesis connectors so a deployment only swaps the format string.

No AWS SDK or network is available in this harness (the reference dodged
the same constraint by leaving its live test commented out —
``ShardProducerSpec.scala:20-53``), so ``kinesis_reader`` assembles the
reader but any ``.load()`` against a real endpoint is the deployment's
responsibility; everything downstream of the source (the entire operator
library) is identical either way.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql.streaming import DataStreamReader

#: reference ShardIteratorType → connector startingPosition (S2)
STARTING_POSITION = {
    "TRIM_HORIZON": "earliest",  # ShardProducerSpec.scala:38
    "LATEST": "latest",
    "AT_SEQUENCE_NUMBER": "at_sequence_number",  # ShardPublisherVerification.scala:60-61
    "AFTER_SEQUENCE_NUMBER": "after_sequence_number",
}


def kinesis_options(
    stream_name: str,
    region: str = "us-east-1",
    iterator_type: str = "TRIM_HORIZON",
    starting_sequence_number: str | None = None,
    endpoint_url: str | None = None,
    max_records_per_fetch: int | None = None,
) -> dict[str, str]:
    """Connector options for the reference's parameters.

    - ``stream_name``/``region``: ``ShardPublisher.java:23`` addressing
      (shard fan-out is automatic in Spark — one input partition per shard,
      where the reference needed one Publisher per shard).
    - ``iterator_type`` (+ sequence number): the seek surface (S2).
    - ``max_records_per_fetch``: the demand bound (F1/F2 —
      ``ShardSubscription.java:141``).
    Checkpointing (T9) comes from the query's ``checkpointLocation``.
    """
    if iterator_type not in STARTING_POSITION:
        raise ValueError(f"unknown iterator type: {iterator_type}")
    opts = {
        "streamName": stream_name,
        "region": region,
        "startingPosition": STARTING_POSITION[iterator_type],
    }
    if starting_sequence_number is not None:
        opts["startingSequenceNumber"] = starting_sequence_number
    if endpoint_url is not None:
        opts["endpointUrl"] = endpoint_url
    if max_records_per_fetch is not None:
        opts["maxRecordsPerFetch"] = str(max_records_per_fetch)
    return opts


def kinesis_reader(spark: SparkSession, stream_name: str, **kwargs) -> DataStreamReader:
    """Assemble the stream reader (``format("kinesis")`` + options).
    ``.load()`` requires a deployed connector + AWS credentials — outside
    this harness, per the module docstring."""
    reader = spark.readStream.format("kinesis")
    for key, value in kinesis_options(stream_name, **kwargs).items():
        reader = reader.option(key, value)
    return reader
