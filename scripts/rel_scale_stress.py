#!/usr/bin/env python
"""Relational scale ladder (round 4): measure the headline relational
queries at x1 (= /root/testdata/sf0.1, 600 k lineitem) and x10
(.scale/rel_x10 from scripts/gen_rel_tier.py, 6 M lineitem) and report
the x1→x10 scaling exponent per query.

Methodology identical to scale_stress.py: warm-up pass (also captures the
row count), then best-of-2 noop-sink wall time per tier; exponent =
log(t_x10 / t_x1) / log(10) — 1.0 is linear, and the fixed per-stage
costs local mode pays make it an UPPER bound on data-dependent growth.
Prints one JSON document; ``--out PATH`` writes it atomically.
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
TIERS = {
    "x1": "/root/testdata/sf0.1",
    "x10": os.path.join(ROOT, ".scale", "rel_x10"),
}
QUERIES = (
    "q01_pricing_summary",
    "q03_shipping_priority",
    "q05_local_supplier_volume",
    "q10_returned_items",
    "win_running_total",
    "win_topk_per_group",
    "agg_grouping_sets",
    # round-4 event analytics (x10 events = 10x users, same history depth)
    "events_funnel",
    "events_cohort_retention",
    "events_transitions",
)


def timed(fn, *args) -> tuple[float, int]:
    df = fn(*args)
    rows = df.count()  # warm-up + row count in one pass
    best = float("inf")
    for _ in range(2):
        start = time.perf_counter()
        fn(*args).write.format("noop").mode("overwrite").save()
        best = min(best, time.perf_counter() - start)
    return best, rows


def main() -> int:
    spark = get_spark(app_name="rsk-rel-scale-stress")
    queries = all_queries()
    out: dict = {"tiers": {}, "exponents": {}}
    for tier, sf_dir in TIERS.items():
        tier_out = {}
        for name in QUERIES:
            with released_caches(spark):
                sec, rows = timed(queries[name].fn, spark, sf_dir)
            tier_out[name] = {"sec": round(sec, 2), "rows": rows}
            print(f"{tier} {name}: {sec:.2f}s ({rows} rows)", file=sys.stderr)
        out["tiers"][tier] = tier_out
    for name in QUERIES:
        t1 = out["tiers"]["x1"][name]["sec"]
        t10 = out["tiers"]["x10"][name]["sec"]
        out["exponents"][name] = round(math.log(t10 / t1) / math.log(10), 2)
    payload = json.dumps(out)
    print(payload)
    for i, arg in enumerate(sys.argv):
        if arg == "--out" and i + 1 < len(sys.argv):
            path = sys.argv[i + 1]
            d = os.path.dirname(os.path.abspath(path)) or "."
            fd, tmp = tempfile.mkstemp(dir=d, prefix=".rel_tmp_")
            with os.fdopen(fd, "w") as f:
                f.write(payload + "\n")
            os.replace(tmp, path)
    return 0


if __name__ == "__main__":
    sys.exit(main())
