#!/usr/bin/env python
"""Benchmark harness (driver contract): run the headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS]
and print ONE JSON line:

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Headline queries are the registry entries flagged ``bench=True`` — one per
major operator family (scan+agg, fact-fact join, 6-table join, window,
MinHash LSH dedup, vector top-k). Each is executed to completion through the
noop sink (full plan runs, nothing materializes driver-side).

``SPARK_GRAFT_BENCH_QUERIES`` (comma-separated registry names) selects a
SECONDARY set under identical timing semantics without disturbing the
headline set's round-over-round comparability — e.g. the event-analytics
family recorded in BASELINE.md:

    SPARK_GRAFT_BENCH_QUERIES=events_funnel,events_cohort_retention,events_transitions python bench.py
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

from reactivestreams_kinesis_spark.queries.registry import all_queries
from reactivestreams_kinesis_spark.session import (
    cached_rdd_count,
    get_spark,
    released_caches,
)


def _stat_snapshot() -> tuple[int, int, int]:
    """(total, steal, idle+iowait) jiffies from /proc/stat. Steal is
    CPU the HYPERVISOR withheld from this guest — invisible to loadavg
    and to the idle-based pre_busy_frac (a stolen tick is not idle), but
    it slows queries and calibration probe alike. Measured on this
    round's box: 36% of guest CPU stolen under full load, varying
    run-to-run — the signature of a fixed-work probe swinging 1.7→10.8 s
    between back-to-back runs."""
    with open("/proc/stat") as f:
        vals = [int(x) for x in f.readline().split()[1:]]
    steal = vals[7] if len(vals) > 7 else 0
    return sum(vals), steal, vals[3] + vals[4]


def _box_busy_frac(sample_s: float = 0.25) -> float:
    """Fraction of ALL cpus busy with someone else's work, sampled while
    this process is idle (before the JVM exists) — the contention guard:
    twice (r3, r5) a driver bench record was inflated by box load and
    needed a judge re-run to adjudicate; this makes a contaminated run
    self-evident from the artifact. Reads /proc/stat twice; near 0.0 on a
    quiet box."""

    def snap() -> tuple[int, int]:
        with open("/proc/stat") as f:
            vals = [int(x) for x in f.readline().split()[1:]]
        return sum(vals), vals[3] + vals[4]  # total, idle+iowait

    t0, i0 = snap()
    time.sleep(sample_s)
    t1, i1 = snap()
    dt = t1 - t0
    return round(1.0 - (i1 - i0) / dt, 4) if dt else -1.0


def _calibration_sec(spark) -> float:
    """Fixed-work calibration probe (round 11): a constant-size,
    zero-I/O hash aggregation — 30M synthetic longs hashed into ~1M
    groups across 32 in-memory partitions — timed best-of-2 on the SAME
    warmed session as the headline queries. Its runtime moves with box
    contention/CPU the same way the queries' do but never with the
    repo's code, so BASELINE.md's normalized reading
    (query_sec / calibration_sec) compares rounds across noisy boxes
    without judge A/B re-runs (needed in r3, r8, r10)."""
    from pyspark.sql import functions as F

    best = float("inf")
    for _trial in range(2):
        start = time.perf_counter()
        (
            spark.range(0, 30_000_000, 1, 32)
            .select(((F.col("id") * 2654435761) % 1000003).alias("k"))
            .groupBy("k")
            .agg(F.count(F.lit(1)).alias("n"))
            .write.format("noop")
            .mode("overwrite")
            .save()
        )
        best = min(best, time.perf_counter() - start)
    return round(best, 3)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf_match = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(sf_match.group(1).rstrip(".")) if sf_match else -1.0

    loadavg_start = [round(v, 2) for v in os.getloadavg()]
    pre_busy_frac = _box_busy_frac()
    stat_start = _stat_snapshot()
    wall_start = time.perf_counter()
    spark = get_spark(app_name="rsk-spark-bench")
    override = os.environ.get("SPARK_GRAFT_BENCH_QUERIES")
    if override:
        registry = all_queries()
        unknown = [n for n in override.split(",") if n not in registry]
        if unknown:
            raise SystemExit(f"unknown bench queries: {unknown}")
        queries = {n: registry[n] for n in override.split(",")}
    else:
        queries = {name: q for name, q in all_queries().items() if q.bench}

    timings: dict[str, float] = {}
    for name in sorted(queries):
        q = queries[name]
        # released_caches wraps each query's trials (NOT each trial — trial 2
        # reusing trial 1's plan-matched cache is the established timing
        # semantics) so query-internal persists don't accumulate across the
        # headline set in this long-lived session.
        with released_caches(spark):
            # one warm-up pass amortizes JVM/codegen warm-up out of the numbers
            if name == sorted(queries)[0]:
                q.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            best = float("inf")
            for _trial in range(2):  # best-of-2: local-mode scheduling noise is large
                start = time.perf_counter()
                q.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
                best = min(best, time.perf_counter() - start)
        timings[name] = round(best, 3)
    # cache-hygiene invariant: nothing may stay cached once the set is done
    leftover = cached_rdd_count(spark)
    if leftover:
        raise RuntimeError(f"{leftover} RDDs still cached after bench loop")

    total = round(sum(timings.values()), 3)
    calibration = _calibration_sec(spark)
    t1, s1, i1 = _stat_snapshot()
    t0, s0, i0 = stat_start
    dt, dsteal, didle = t1 - t0, s1 - s0, i1 - i0
    steal_frac_run = round(dsteal / dt, 4) if dt else -1.0
    busy = dt - didle
    steal_frac_busy = round(dsteal / busy, 4) if busy > 0 else -1.0
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_runtime",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                # fixed-work probe on the same warmed session: divide any
                # query time (or `value`) by this to compare rounds
                # across differently-loaded boxes (BASELINE.md
                # "Calibrated reading")
                "calibration_sec": calibration,
                "value_calibrated": round(total / calibration, 2)
                if calibration
                else None,
                # contention fingerprint (BASELINE.md "Reading the load
                # fingerprint"): pre_busy_frac is the box's busy fraction
                # sampled while this process was idle — >0.2 means the
                # timings above competed with someone else's work and the
                # round-over-round comparison should use per-query RATIOS
                # against a clean round, not absolutes.
                "load": {
                    "cpus": os.cpu_count(),
                    "loadavg_start": loadavg_start,
                    "loadavg_end": [round(v, 2) for v in os.getloadavg()],
                    "pre_busy_frac": pre_busy_frac,
                    "wall_sec": round(time.perf_counter() - wall_start, 3),
                    # hypervisor CPU steal across the whole run:
                    # steal_frac_run is steal/total jiffies (all cpus,
                    # idle included); steal_frac_busy is steal/non-idle —
                    # the fraction of the CPU this run actually tried to
                    # use that the HOST withheld. Nonzero-and-varying
                    # steal makes absolutes AND single-run calibrated
                    # ratios unreliable (probe and queries see different
                    # instantaneous speeds); compare medians of several
                    # runs, or per-query minima.
                    "steal_frac_run": steal_frac_run,
                    "steal_frac_busy": steal_frac_busy,
                },
            }
        )
    )


if __name__ == "__main__":
    sys.exit(main())
