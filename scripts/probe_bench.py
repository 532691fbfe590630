#!/usr/bin/env python
"""Per-query progress probe for the headline bench: identical semantics to
bench.py (warmed session, released_caches around each query's trials,
best-of-2, noop sink) but prints one line per phase as it happens so a
slow query is identifiable mid-run. Diagnostic only — not the contract."""

from __future__ import annotations

import os
import sys
import time

from reactivestreams_kinesis_spark.queries.registry import all_queries
from reactivestreams_kinesis_spark.session import get_spark, released_caches


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    t0 = time.perf_counter()
    spark = get_spark(app_name="rsk-probe-bench")
    print(f"session up {time.perf_counter() - t0:.1f}s", flush=True)
    names = os.environ.get("SPARK_GRAFT_BENCH_QUERIES")
    registry = all_queries()
    if names:
        queries = {n: registry[n] for n in names.split(",")}
    else:
        queries = {n: q for n, q in registry.items() if q.bench}
    for name in sorted(queries):
        q = queries[name]
        with released_caches(spark):
            if name == sorted(queries)[0]:
                t = time.perf_counter()
                q.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
                print(f"warmup {name} {time.perf_counter() - t:.2f}s", flush=True)
            best = float("inf")
            for trial in range(2):
                t = time.perf_counter()
                q.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
                dt = time.perf_counter() - t
                print(f"{name} trial{trial} {dt:.3f}s", flush=True)
                best = min(best, dt)
        print(f"{name} BEST {best:.3f}s", flush=True)


if __name__ == "__main__":
    sys.exit(main())
