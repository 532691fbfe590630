#!/usr/bin/env python
"""ANN recall-targeted tuning harness (round 12, verdict #5).

Measures recall@k of the IVF list/probe path against the brute-force
oracle with statistical power — 100 held-out pseudo-queries instead of
the 5-query driver fixture (±0.04/pair, too noisy for A/B) — across a
(n_lists, nprobe) grid, reports the PROBE-COST CURVE (scored-candidate
fraction of the corpus per query, the quantity that actually bills at
100 TB), and auto-picks the cheapest configuration meeting a stated
recall target. The pick logic itself lives in the package
(`operators/ann_index.tune_ivf`); this script is the recorded
measurement run for BASELINE.md.

Method: the pseudo-queries are a deterministic md5-hash holdout of the
corpus (the same engine-portable selection idiom as LLOYD_SAMPLE_SPARK);
truth is brute-force cosine top-k over the REMAINING corpus, so every
grid cell is scored against the identical 100×k truth pairs. Codebooks
are seeded by a stride matched to the requested list count and refined
with the production Lloyd path on the hash sample — exactly the build
`sim_ann_ivf*` runs, so the picked knobs transfer.

Usage:
    python scripts/ann_recall_bench.py            # sf0.1, target 0.5@5
    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.01 TARGET=0.6 python ...
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from reactivestreams_kinesis_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    target = float(os.environ.get("TARGET", "0.5"))
    spark = get_spark(app_name="rsk-ann-recall")

    from reactivestreams_kinesis_spark.catalog import load_table
    from reactivestreams_kinesis_spark.operators.ann_index import tune_ivf

    from pyspark.sql import functions as F

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").alias("cv")
    )
    t0 = time.perf_counter()
    result = tune_ivf(
        spark,
        emb,
        target_recall=target,
        k=5,
        n_queries=100,
        n_lists_grid=(20, 40, 80),
        nprobe_grid=(1, 2, 4, 8),
    )
    result["sf_dir"] = sf_dir
    result["wall_sec"] = round(time.perf_counter() - t0, 1)
    print(json.dumps(result))


if __name__ == "__main__":
    sys.exit(main())
