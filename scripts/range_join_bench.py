#!/usr/bin/env python
"""Range-join bench (round 4): the theta form (BroadcastNestedLoopJoin,
|S|×|C| predicate evaluations) vs the binned form
(``operators.joins.range_join``: bin equi-join + exact refine) on the
x1 (sf0.1: 1 k supplier × 15 k customer) and x10 (.scale/rel_x10:
10 k × 150 k = 1.5 B pair evaluations for the nested loop) tiers.
Row-parity asserted between the two query forms at each tier.

Prints one JSON document; ``--out PATH`` writes it atomically.
"""

from __future__ import annotations

import json
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


def timed(fn, spark, sf_dir) -> float:
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()  # warm-up
    best = float("inf")
    for _ in range(2):
        start = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        best = min(best, time.perf_counter() - start)
    return best


def main() -> int:
    spark = get_spark(app_name="rsk-range-join-bench")
    qs = all_queries()
    theta, binned = qs["join_range_theta"].fn, qs["join_range_binned"].fn
    out: dict = {"tiers": {}}
    for tier, sf_dir in TIERS.items():
        with released_caches(spark):
            a = theta(spark, sf_dir)
            b = binned(spark, sf_dir)
            assert a.subtract(b).count() == 0 and b.subtract(a).count() == 0
            out["tiers"][tier] = {
                "rows": a.count(),
                "theta_nested_loop_sec": round(timed(theta, spark, sf_dir), 2),
                "binned_sec": round(timed(binned, spark, sf_dir), 2),
            }
        print(f"{tier}: {out['tiers'][tier]}", file=sys.stderr)
    payload = json.dumps(out)
    print(payload)
    for i, arg in enumerate(sys.argv):
        if arg == "--out" and i + 1 < len(sys.argv):
            path = sys.argv[i + 1]
            d = os.path.dirname(os.path.abspath(path)) or "."
            fd, tmp = tempfile.mkstemp(dir=d, prefix=".range_tmp_")
            with os.fdopen(fd, "w") as f:
                f.write(payload + "\n")
            os.replace(tmp, path)
    return 0


if __name__ == "__main__":
    sys.exit(main())
