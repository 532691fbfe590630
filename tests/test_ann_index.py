"""Persisted IVF index (round 6): the inverted lists as a hive-partitioned
layout — probe equivalence with the in-memory IVF path, and the
storage-level proof that a probe reads only the probed directories.
"""

from __future__ import annotations

import os
import re

from pyspark.sql import functions as F

from reactivestreams_kinesis_spark.catalog import load_table
from reactivestreams_kinesis_spark.operators.ann_index import (
    build_ivf_index,
    probe_ivf_index,
)
from reactivestreams_kinesis_spark.plans.inspect import explain_string
from reactivestreams_kinesis_spark.queries.llm_similarity import (
    IVF_STRIDE,
    LLOYD_SAMPLE_SPARK,
    N_QUERIES,
    ann_ivf_topk,
    lloyd_refine,
)


def _fixture(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    corpus = emb.filter(F.col("vec_id") >= N_QUERIES).select(
        "vec_id", F.col("embedding").alias("cv")
    )
    queries = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    init = emb.filter(
        (F.col("vec_id") >= N_QUERIES) & (F.col("vec_id") % IVF_STRIDE == 5)
    ).select(F.col("vec_id").alias("centroid_id"), F.col("embedding").alias("centv"))
    cent = lloyd_refine(
        corpus.filter(F.expr(LLOYD_SAMPLE_SPARK)), init
    ).localCheckpoint(eager=True)
    return corpus, queries, cent


def test_ivf_index_probe_matches_inmemory(spark, sf_dir, tmp_path):
    """The persisted-index probe must return exactly the in-memory
    ann_ivf_topk answer for the same codebook — the layout changes WHERE
    the lists live, never the math."""
    corpus, queries, cent = _fixture(spark, sf_dir)
    idx = str(tmp_path / "ivf_idx")
    build_ivf_index(corpus, cent, idx)
    got = probe_ivf_index(spark, idx, queries, k=5, nprobe=2)
    want = ann_ivf_topk(queries, corpus, cent, k=5, nprobe=2)
    assert got.count() == want.count()
    assert got.subtract(want).count() == 0 and want.subtract(got).count() == 0


def test_ivf_index_probe_prunes_directories(spark, sf_dir, tmp_path):
    """Storage-level contract: the probe scan carries PartitionFilters on
    centroid_id (directory pruning — unprobed cells are never listed),
    and the cell directories on disk cover the whole corpus exactly."""
    corpus, queries, cent = _fixture(spark, sf_dir)
    idx = str(tmp_path / "ivf_idx2")
    build_ivf_index(corpus, cent, idx)

    cell_dirs = [d for d in os.listdir(idx) if d.startswith("centroid_id=")]
    assert len(cell_dirs) > 1  # partitioned layout, one dir per list
    assert spark.read.parquet(idx).count() == corpus.count()

    probed = probe_ivf_index(spark, idx, queries, k=5, nprobe=1)
    plan = explain_string(probed, "formatted")
    m = re.search(r"PartitionFilters: \[centroid_id#\d+ IN \(([^)]*)\)", plan)
    assert m, plan
    # nprobe=1 over N_QUERIES queries: at most one probed cell per query
    assert len(m.group(1).split(",")) <= N_QUERIES
    assert probed.count() > 0


def test_ivf_index_incremental_append(spark, sf_dir, tmp_path):
    """Incremental ingest: build the index on half the corpus, append the
    other half against the persisted codebook — the probe over the
    incrementally-built index must EQUAL the probe over a one-shot full
    build (same codebook geometry ⇒ same cells ⇒ same answer), and the
    append must not rewrite any pre-existing file."""
    import glob

    from reactivestreams_kinesis_spark.operators.ann_index import (
        append_to_ivf_index,
    )

    corpus, queries, cent = _fixture(spark, sf_dir)
    half_a = corpus.filter(F.col("vec_id") % 2 == 0)
    half_b = corpus.filter(F.col("vec_id") % 2 == 1)

    inc = str(tmp_path / "ivf_inc")
    build_ivf_index(half_a, cent, inc)
    before = {
        p: os.path.getmtime(p)
        for p in glob.glob(os.path.join(inc, "**", "*.parquet"), recursive=True)
    }
    append_to_ivf_index(spark, inc, half_b)
    after = {
        p: os.path.getmtime(p)
        for p in glob.glob(os.path.join(inc, "**", "*.parquet"), recursive=True)
    }
    assert set(before) <= set(after) and len(after) > len(before)
    assert all(after[p] == before[p] for p in before), "append rewrote a file"

    full = str(tmp_path / "ivf_full")
    build_ivf_index(corpus, cent, full)
    got = probe_ivf_index(spark, inc, queries, k=5, nprobe=2)
    want = probe_ivf_index(spark, full, queries, k=5, nprobe=2)
    assert got.collect() == want.collect()


def test_tune_ivf_picks_cheapest_meeting_target(spark, sf_dir):
    """The recall-tuning surface (round 12): the curve is monotone in
    nprobe within a codebook (top-p probed cells ⊇ top-(p-1)'s), the
    pick is the cheapest (scan_frac) grid cell meeting the target, and
    an unreachable target reports met=False with the best row instead
    of a silent wrong pick."""
    import os

    from pyspark.sql import functions as F

    from reactivestreams_kinesis_spark.operators.ann_index import tune_ivf

    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet")).select(
        "vec_id", F.col("embedding").alias("cv")
    )
    res = tune_ivf(
        spark,
        emb,
        target_recall=0.3,
        k=5,
        n_queries=20,
        n_lists_grid=(10, 20),
        nprobe_grid=(1, 2, 4),
    )
    assert res["n_queries"] == 20 and res["truth_pairs"] == 100
    by_lists: dict = {}
    for c in res["curve"]:
        by_lists.setdefault(c["n_lists"], []).append(c)
    for cells in by_lists.values():
        cells.sort(key=lambda c: c["nprobe"])
        recalls = [c["recall"] for c in cells]
        fracs = [c["scan_frac"] for c in cells]
        assert recalls == sorted(recalls), "recall must be monotone in nprobe"
        assert fracs == sorted(fracs), "probe cost must grow with nprobe"
    if res["met"]:
        eligible = [c for c in res["curve"] if c["recall"] >= 0.3]
        assert res["picked"] == min(
            eligible, key=lambda c: (c["scan_frac"], c["nprobe"])
        )
    # an unreachable target refuses to pick
    res2 = tune_ivf(
        spark, emb, target_recall=1.01, k=5, n_queries=10,
        n_lists_grid=(10,), nprobe_grid=(1,),
    )
    assert res2["met"] is False and res2["picked"] is None
    assert res2["best"] is not None
