"""Measure change-feed extraction cost across rewrite commits (round 9).

Claim under measurement: `snapshot_change_feed`'s rewrite diff
(`_rewrite_change_rows`) costs what the REWRITE touched, not what the
table holds — a targeted CoW merge over a range-clustered table diffs
only its touched files, a full overwrite is a full-table diff (which is
what it semantically is), and a reorg compaction is FREE (planned away,
no data read). Companion numbers to DV_BENCH/CDC_BENCH.

Run on a quiet box: python scripts/cdf_cow_bench.py [sf_dir]
Writes CDF_COW_BENCH.json at the repo root.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time
import uuid

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from reactivestreams_kinesis_spark.catalog import load_table  # noqa: E402
from reactivestreams_kinesis_spark.operators.snapshots import (  # noqa: E402
    _read_manifest,
    compact_snapshot,
    latest_version,
    merge_upsert,
    snapshot_change_feed,
    snapshot_commit,
)
from reactivestreams_kinesis_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark(app_name="cdf-cow-bench", cpus=32, shuffle_partitions=32)
    base = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice", "o_orderdate"
    )
    n_rows = base.count()
    t = os.path.join(tempfile.gettempdir(), f"cdfcow_{uuid.uuid4().hex[:8]}")
    snapshot_commit(base.repartitionByRange(32, "o_orderkey"), t)      # v0
    out: dict = {"sf_dir": sf_dir, "rows": n_rows, "n_files": 32}

    # 1. targeted merge: keys confined to one file's range (~1/32 of rows)
    lo, hi = base.agg(F.min("o_orderkey"), F.max("o_orderkey")).collect()[0]
    cut = lo + (hi - lo) // 32
    upd = base.filter(F.col("o_orderkey") <= cut).select(
        "o_orderkey",
        "o_custkey",
        (F.col("o_totalprice") + 1.0).alias("o_totalprice"),
        "o_orderdate",
    )
    n_upd = upd.count()
    merge_upsert(spark, t, upd, "o_orderkey")                          # v1
    m1 = _read_manifest(t, 1)
    touched = len(set(_read_manifest(t, 0)["files"]) - set(m1["files"]))
    t0 = time.time()
    feed1 = snapshot_change_feed(spark, t, from_version=0, to_version=1)
    rows1 = feed1.count()
    out["targeted_merge"] = {
        "updated_rows": n_upd,
        "touched_files": touched,
        "feed_rows": rows1,
        "sec": round(time.time() - t0, 3),
    }

    # 2. reorg: compaction must plan away to zero work
    compact_snapshot(spark, t)                                         # v2
    t0 = time.time()
    try:
        snapshot_change_feed(spark, t, from_version=1, to_version=2)
        raise AssertionError("reorg-only range must report no changes")
    except ValueError:
        pass
    out["reorg"] = {"sec": round(time.time() - t0, 3), "feed_rows": 0}

    # 3. full overwrite: every row rewritten — the honest full diff
    snapshot_commit(
        base.select(
            "o_orderkey",
            "o_custkey",
            (F.col("o_totalprice") + 2.0).alias("o_totalprice"),
            "o_orderdate",
        ).repartitionByRange(32, "o_orderkey"),
        t,
        mode="overwrite",
    )                                                                  # v3
    t0 = time.time()
    feed3 = snapshot_change_feed(spark, t, from_version=2, to_version=3)
    rows3 = feed3.count()
    out["full_overwrite"] = {
        "feed_rows": rows3,
        "sec": round(time.time() - t0, 3),
    }
    assert latest_version(t) == 3

    out["ratio_full_vs_targeted"] = round(
        out["full_overwrite"]["sec"] / max(out["targeted_merge"]["sec"], 1e-9), 2
    )
    try:
        out["loadavg_start"] = list(os.getloadavg())
    except OSError:
        pass
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "CDF_COW_BENCH.json",
    )
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
