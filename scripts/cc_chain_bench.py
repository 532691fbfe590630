#!/usr/bin/env python
"""Connected-components convergence ladder: min-label propagation vs
large-star/small-star contraction on planted dup CHAINS — the diameter
pathology from the round-4 verdict (#4). A chain of depth d forces the
propagation modes into d rounds (one hop per round); star contraction is
O(log n) rounds regardless of d. Prints one JSON line per (depth, mode):

    {"depth": 64, "mode": "star", "rounds": 7, "sec": 3.1, "correct": true}

Run on a quiet box: python scripts/cc_chain_bench.py [max_depth_exponent]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from reactivestreams_kinesis_spark.queries.llm_dedup import (
    connected_components,
    connected_components_star,
)
from reactivestreams_kinesis_spark.session import get_spark


def main() -> None:
    max_exp = int(sys.argv[1]) if len(sys.argv) > 1 else 9  # depths 8..512
    spark = get_spark(app_name="rsk-cc-chain-bench")
    for exp in range(3, max_exp + 1):
        depth = 2**exp
        # a planted chain 0-1-...-depth plus a disjoint pair (multi-component)
        pairs = spark.range(depth).selectExpr(
            "id AS doc_a", "id + 1 AS doc_b"
        ).unionByName(
            spark.createDataFrame([(10**6, 10**6 + 1)], "doc_a long, doc_b long")
        )
        runs = {
            "star": lambda: connected_components_star(pairs, stats=stats),
            # adaptive propagation needs depth+1 rounds; cap generously
            "propagation": lambda: connected_components(
                pairs, max_rounds=depth + 8
            ),
        }
        for mode, fn in runs.items():
            if mode == "propagation" and depth > 16:
                # adaptive propagation pays d rounds AND a per-round cost
                # that grows with the accumulated plan lineage — measured
                # 8 s at depth 8 vs 1034 s at depth 16; deeper tiers are
                # hours. That cliff IS the result; don't re-pay it.
                continue
            stats: dict = {}
            t0 = time.perf_counter()
            labels = {r.doc_id: r.component_id for r in fn().collect()}
            sec = round(time.perf_counter() - t0, 2)
            correct = all(labels[i] == 0 for i in range(depth + 1))
            print(
                json.dumps(
                    {
                        "depth": depth,
                        "mode": mode,
                        "rounds": stats.get("rounds"),
                        "sec": sec,
                        "correct": correct,
                    }
                ),
                flush=True,
            )


if __name__ == "__main__":
    sys.exit(main())
