#!/usr/bin/env python
"""Scale stress run (judge round-3 item #1): measure how the heavy
dedup/ANN operators scale from the sf0.1-equivalent tier to 10× that, and
demonstrate the hot-shingle skew cap on a planted-skew corpus.

Run `scripts/gen_scale_tiers.py` first. Prints one JSON document; the
numbers are recorded in BASELINE.md (separate table — the frozen sf0.1
headline baseline is untouched).

Methodology: noop sink (full plan executes, nothing materializes
driver-side), one warm-up execution per tier (first-touch parquet footer
reads + codegen), then best-of-2 — identical to bench.py. Scaling exponent
= log(t_x10 / t_x1) / log(10): 1.0 is linear; local[32] numbers also carry
fixed per-stage costs that amortize at cluster scale, so the exponent is
an UPPER bound on the data-dependent growth.
"""

from __future__ import annotations

import json
import math
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from reactivestreams_kinesis_spark.queries.registry import all_queries
from reactivestreams_kinesis_spark.session import get_spark, released_caches

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCALE = os.path.join(ROOT, ".scale")
TIERS = ("x1", "x3", "x10")
QUERIES = (
    "dedup_minhash_lsh",
    "dedup_components_lsh",
    "pipeline_end_to_end",
    "sim_ann_lsh",
)
# the exhaustive-Jaccard paths, measured separately as the deliberate
# quadratic baseline (Σ df² growth under the fixture's fixed vocabulary) —
# timed once, not best-of-2, and only up to x3 by default (x10 runs many
# minutes; pass --full to include it)
BASELINE_QUERIES = ("dedup_jaccard_pairs",)


def timed(fn, *args) -> tuple[float, int]:
    """Best-of-2 noop-sink wall time + result row count (rows from a third,
    untimed run via count on the cached-free plan would re-execute; count
    once during warm-up instead)."""
    df = fn(*args)
    rows = df.count()  # warm-up + row count in one pass
    best = float("inf")
    for _ in range(2):
        start = time.perf_counter()
        fn(*args).write.format("noop").mode("overwrite").save()
        best = min(best, time.perf_counter() - start)
    return best, rows


def main() -> int:
    spark = get_spark(app_name="rsk-scale-stress")
    queries = all_queries()
    out: dict = {"tiers": {}, "exponents": {}, "skew_demo": {}}

    for tier in TIERS:
        sf_dir = os.path.join(SCALE, tier)
        tier_out = {}
        for name in QUERIES:
            with released_caches(spark):
                sec, rows = timed(queries[name].fn, spark, sf_dir)
            tier_out[name] = {"sec": round(sec, 2), "rows": rows}
            print(f"{tier} {name}: {sec:.2f}s ({rows} rows)", file=sys.stderr)
        out["tiers"][tier] = tier_out
        _checkpoint(out)

    for name in QUERIES:
        t1 = out["tiers"]["x1"][name]["sec"]
        t10 = out["tiers"]["x10"][name]["sec"]
        out["exponents"][name] = round(math.log(t10 / t1) / math.log(10), 2)

    # quadratic baseline ladder (single-run timing)
    baseline_tiers = TIERS if "--full" in sys.argv else TIERS[:2]
    for name in BASELINE_QUERIES:
        for tier in baseline_tiers:
            sf_dir = os.path.join(SCALE, tier)
            with released_caches(spark):
                start = time.perf_counter()
                queries[name].fn(spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                sec = time.perf_counter() - start
            out["tiers"][tier][name] = {"sec": round(sec, 2), "single_run": True}
            print(f"{tier} {name}: {sec:.2f}s (single run)", file=sys.stderr)

    # --- skew demo: one boilerplate sentence in 40% of docs (3 trigrams
    # with df ≈ 2000 = 20× MAX_SHINGLE_DF). Capped run drops them before
    # the postings self-join; uncapped run pays ~3 × 2000² intersection
    # rows for shingles that carry zero near-dup signal.
    from pyspark.sql import functions as F

    from reactivestreams_kinesis_spark.queries.llm_dedup import (
        jaccard_pairs,
        shingle_postings,
    )

    skew_docs = spark.read.parquet(os.path.join(SCALE, "skew", "documents.parquet"))
    for label, cap in (("capped", 100), ("uncapped", 1 << 40)):
        with released_caches(spark):
            toks = shingle_postings(skew_docs).persist()
            start = time.perf_counter()
            pairs = jaccard_pairs(toks, max_shingle_df=cap)
            n_pairs = pairs.count()
            sec = time.perf_counter() - start
            # candidate volume the self-join actually materialized
            hot = toks.groupBy("tok").count().filter(F.col("count") > 100).count()
        out["skew_demo"][label] = {
            "sec": round(sec, 2),
            "pairs": n_pairs,
            "shingles_over_cap": hot,
        }
        print(f"skew {label}: {sec:.2f}s, {n_pairs} pairs", file=sys.stderr)

    payload = json.dumps(out)
    print(payload)
    # Atomic result write (temp + rename): a mid-run teardown can never
    # leave a half-written record — either the old file survives or the
    # complete new one does. Partial per-tier progress is also flushed
    # after each tier above via _checkpoint().
    out_path = _out_path()
    if out_path:
        _atomic_write(out_path, payload)
    return 0


def _checkpoint(out: dict) -> None:
    """Flush partial progress atomically after each tier, marked partial."""
    out_path = _out_path()
    if out_path:
        _atomic_write(out_path, json.dumps({**out, "partial": True}))


def _out_path() -> str | None:
    for i, arg in enumerate(sys.argv):
        if arg == "--out" and i + 1 < len(sys.argv):
            return sys.argv[i + 1]
    return None


def _atomic_write(path: str, payload: str) -> None:
    d = os.path.dirname(os.path.abspath(path)) or "."
    fd, tmp = tempfile.mkstemp(dir=d, prefix=".stress_tmp_")
    try:
        with os.fdopen(fd, "w") as f:
            f.write(payload + "\n")
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, path)
    except BaseException:
        try:
            os.unlink(tmp)
        except OSError:
            pass
        raise


if __name__ == "__main__":
    sys.exit(main())
