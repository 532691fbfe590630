#!/usr/bin/env python
"""Stateful-streaming throughput (round 4): the BASELINE.md streaming
table covers the narrow decode path (~590 k records/s); this measures the
two stateful paths a production pipeline actually runs, on the same
rate-source record stream and methodology (sustained = median
processedRowsPerSecond over non-warm-up microbatches, 1 s trigger):

- windowed: watermark + 10 s tumbling window count per shard — JVM-side
  streaming state (no Python on the row path);
- custom state: ``applyInPandasWithState`` running per-key stats
  (``streaming/state.py``) — the Arrow-batched Python stateful operator,
  keyed by user_id.

Prints one JSON document; ``--out PATH`` writes it atomically.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import tempfile
import time
import uuid

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from reactivestreams_kinesis_spark.session import get_spark
from reactivestreams_kinesis_spark.streaming.records import rate_record_stream

RATE = 200_000
N_SHARDS = 8
MEASURE_BATCHES = 6


def sustained_rate(df, output_mode: str) -> dict:
    name = f"sb_{uuid.uuid4().hex[:8]}"
    q = (
        df.writeStream.outputMode(output_mode)
        .format("memory")
        .queryName(name)
        .trigger(processingTime="1 second")
        .start()
    )
    try:
        deadline = time.time() + 90
        rates: list[float] = []
        while time.time() < deadline and len(rates) < MEASURE_BATCHES:
            time.sleep(1)
            rates = [
                p["processedRowsPerSecond"]
                for p in (q.recentProgress or [])
                if p["numInputRows"] > 0
            ][1:]  # drop the warm-up batch (backlog burst inflates it)
    finally:
        q.stop()
        q.awaitTermination(60)
    assert rates, "no non-empty batches"
    return {
        "median_rows_per_sec": round(statistics.median(rates)),
        "peak_rows_per_sec": round(max(rates)),
        "batches": len(rates),
    }


def main() -> int:
    spark = get_spark(app_name="rsk-stateful-bench")
    out: dict = {"rate_rows_per_sec": RATE, "n_shards": N_SHARDS}

    recs = rate_record_stream(spark, rows_per_second=RATE, n_shards=N_SHARDS)
    windowed = (
        recs.withWatermark("approximateArrivalTimestamp", "10 seconds")
        .groupBy(
            F.window("approximateArrivalTimestamp", "10 seconds"), F.col("shardId")
        )
        .count()
    )
    out["windowed_agg"] = sustained_rate(windowed, "update")
    print(f"windowed: {out['windowed_agg']}", file=sys.stderr)

    from reactivestreams_kinesis_spark.streaming.state import running_user_stats

    events_shaped = rate_record_stream(
        spark, rows_per_second=RATE, n_shards=N_SHARDS
    ).select(
        F.col("sequenceNumber").cast("long").alias("event_id"),
        F.col("approximateArrivalTimestamp").alias("ts"),
        (F.col("sequenceNumber").cast("long") % 1000).alias("user_id"),
        F.lit("click").alias("event_type"),
        F.col("sequenceNumber").cast("double").alias("value"),
        F.lit("{}").alias("props"),
    )
    out["apply_in_pandas_with_state"] = sustained_rate(
        running_user_stats(events_shaped), "update"
    )
    print(f"stateful: {out['apply_in_pandas_with_state']}", file=sys.stderr)

    payload = json.dumps(out)
    print(payload)
    for i, arg in enumerate(sys.argv):
        if arg == "--out" and i + 1 < len(sys.argv):
            path = sys.argv[i + 1]
            d = os.path.dirname(os.path.abspath(path)) or "."
            fd, tmp = tempfile.mkstemp(dir=d, prefix=".sb_tmp_")
            with os.fdopen(fd, "w") as f:
                f.write(payload + "\n")
            os.replace(tmp, path)
    return 0


if __name__ == "__main__":
    sys.exit(main())
