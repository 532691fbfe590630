#!/usr/bin/env python
"""A/B evidence for the parsed-manifest cache: run each maintenance-set
query once with the cache DISABLED (legacy behavior: parse the manifest
JSON on every _read_manifest call) and once with it enabled, counting
json.load parses inside the snapshots module. Parse counts are
contention-proof — box load cannot fake them."""

from __future__ import annotations

import json as _json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

from reactivestreams_kinesis_spark.operators import snapshots as S
from reactivestreams_kinesis_spark.queries.registry import all_queries
from reactivestreams_kinesis_spark.session import get_spark, released_caches

COUNT = {"n": 0}


class CountingJson:
    def load(self, f):
        COUNT["n"] += 1
        return _json.load(f)

    def __getattr__(self, a):
        return getattr(_json, a)


def legacy_read_manifest(table_dir, version):
    with open(S._manifest_path(table_dir, version)) as f:
        return S.json.load(f)


QUERIES = [
    "rel_merge_into_sql",
    "rel_cdf_cow",
    "rel_mv_incremental",
    "rel_mv_composite_merge",
]


def run(spark, sf_dir, mode):
    import reactivestreams_kinesis_spark.operators.matview as MV
    import reactivestreams_kinesis_spark.operators.merge_into as MI
    import reactivestreams_kinesis_spark.sources.colocated as CO
    import reactivestreams_kinesis_spark.sources.snapshot_source as SS

    fn = legacy_read_manifest if mode == "legacy" else S._read_manifest_cached
    S._read_manifest = fn
    for mod in (MV, MI, CO, SS):
        if hasattr(mod, "_read_manifest"):
            mod._read_manifest = fn
    reg = all_queries()
    out = {}
    for name in QUERIES:
        S._MANIFEST_CACHE.clear()
        COUNT["n"] = 0
        t0 = time.perf_counter()
        with released_caches(spark):
            reg[name].fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        out[name] = (COUNT["n"], round(time.perf_counter() - t0, 2))
    return out


def main() -> None:
    S.json = CountingJson()
    S._read_manifest_cached = S._read_manifest
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="manifest-cache-ab")
    spark.sparkContext.setLogLevel("ERROR")
    for mode in ("legacy", "cached", "legacy", "cached"):
        res = run(spark, sf_dir, mode)
        print(mode, {k: v for k, v in res.items()}, flush=True)


if __name__ == "__main__":
    main()
