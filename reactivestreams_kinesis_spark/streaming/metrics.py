"""Streaming observability (round 6): progress metrics as a queryable
DataFrame via ``StreamingQueryListener``.

The reference surfaces its consumption rate only through logs; a real
deployment tunes triggers, watermarks, and state stores off numbers —
input rate vs processing rate (falling behind?), batch duration split
(addBatch vs walCommit — sink-bound or source-bound?), and state-store
rows/memory (is the watermark actually expiring state?). Spark emits all
of it per micro-batch through the listener bus; this module collects the
events driver-side (bounded: one small record per micro-batch, capped by
``max_events``) and exposes them as a DataFrame so the same engine that
runs the pipeline can analyze its own telemetry — metrics ARE a table.

Driver-side by design: listener callbacks run on the driver's listener
bus thread; the collector only appends dicts (no Spark calls inside the
callback — calling the session from the bus thread can deadlock), and
the DataFrame is built lazily on ``snapshot()``.
"""

from __future__ import annotations

import json
from collections import deque

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T
from pyspark.sql.streaming import StreamingQueryListener

PROGRESS_SCHEMA = T.StructType(
    [
        T.StructField("query_id", T.StringType()),
        T.StructField("run_id", T.StringType()),
        T.StructField("batch_id", T.LongType()),
        T.StructField("timestamp", T.StringType()),
        T.StructField("num_input_rows", T.LongType()),
        T.StructField("input_rows_per_second", T.DoubleType()),
        T.StructField("processed_rows_per_second", T.DoubleType()),
        T.StructField("add_batch_ms", T.LongType()),
        T.StructField("trigger_execution_ms", T.LongType()),
        T.StructField("state_rows_total", T.LongType()),
        T.StructField("state_memory_bytes", T.LongType()),
    ]
)


class ProgressCollector(StreamingQueryListener):
    """Collects per-micro-batch progress into a bounded in-memory ring
    (``max_events`` newest records kept — telemetry must never grow with
    job lifetime). Attach with ``spark.streams.addListener``; detach with
    ``removeListener`` (or use ``collecting_progress``)."""

    def __init__(self, max_events: int = 10_000):
        self._events: deque = deque(maxlen=max_events)

    def onQueryStarted(self, event) -> None:
        pass

    def onQueryIdle(self, event) -> None:
        pass

    def onQueryTerminated(self, event) -> None:
        pass

    def onQueryProgress(self, event) -> None:
        p = json.loads(event.progress.json)
        durations = p.get("durationMs", {}) or {}
        states = p.get("stateOperators", []) or []
        self._events.append(
            {
                "query_id": p.get("id"),
                "run_id": p.get("runId"),
                "batch_id": p.get("batchId"),
                "timestamp": p.get("timestamp"),
                "num_input_rows": p.get("numInputRows"),
                "input_rows_per_second": float(p.get("inputRowsPerSecond") or 0.0),
                "processed_rows_per_second": float(
                    p.get("processedRowsPerSecond") or 0.0
                ),
                "add_batch_ms": durations.get("addBatch"),
                "trigger_execution_ms": durations.get("triggerExecution"),
                "state_rows_total": sum(
                    s.get("numRowsTotal", 0) for s in states
                )
                if states
                else None,
                "state_memory_bytes": sum(
                    s.get("memoryUsedBytes", 0) for s in states
                )
                if states
                else None,
            }
        )

    def wait_for_batches(
        self, query_id: str, n: int, timeout_s: float = 30.0
    ) -> bool:
        """Block until ≥ ``n`` non-empty progress events for ``query_id``
        have ARRIVED (the listener bus is asynchronous — events for a
        finished query can land after ``awaitTermination`` returns), or
        the timeout passes. Call while the collector is still attached."""
        import time

        deadline = time.monotonic() + timeout_s
        while time.monotonic() < deadline:
            got = sum(
                1
                for e in list(self._events)
                if e["query_id"] == query_id and (e["num_input_rows"] or 0) > 0
            )
            if got >= n:
                return True
            time.sleep(0.1)
        return False

    def snapshot(self, spark: SparkSession) -> DataFrame:
        """The collected telemetry as a DataFrame (stable schema even
        when empty) — join it, window it, write it to a snapshot table:
        it is just data."""
        return spark.createDataFrame(list(self._events), PROGRESS_SCHEMA)


class collecting_progress:
    """Context manager: attach a ``ProgressCollector`` for the scope,
    detach on exit, hand back the collector.

    >>> with collecting_progress(spark) as metrics:
    ...     run_streaming_queries()
    ... metrics.snapshot(spark).groupBy("query_id").agg(...)
    """

    def __init__(self, spark: SparkSession, max_events: int = 10_000):
        self._spark = spark
        self.collector = ProgressCollector(max_events)

    def __enter__(self) -> ProgressCollector:
        self._spark.streams.addListener(self.collector)
        return self.collector

    def __exit__(self, *exc) -> None:
        self._spark.streams.removeListener(self.collector)
