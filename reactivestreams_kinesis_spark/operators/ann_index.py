"""Persisted IVF index as a TABLE LAYOUT (round 6): the inverted lists
materialized as hive-partitioned parquet, so probing is directory pruning.

`sim_ann_ivf` holds its lists in a query-lifetime DataFrame; at 100 TB the
index is built once and probed by many jobs, so the lists belong in
storage. The layout IS the index: ``partitionBy(centroid_id)`` writes one
directory per Voronoi cell, and a probe reads exactly ``nprobe``
directories per query — the scan never lists, let alone reads, the other
cells (PartitionFilters, pinned by ``tests/test_ann_index.py``). This is
the FAISS-IVF storage model translated to lakehouse primitives: codebook
as a tiny side table, lists as partitions, probe as partition-pruned scan
+ the same broadcast-argmax routing the in-memory path uses.

Composition with the other layout levers is deliberate: the int8 variant
stores quantized vectors in the lists (4× smaller — `sim_quantize_int8`'s
lever) with the float source kept elsewhere for exact re-rank, exactly the
`sim_ann_ivf_int8` plan against a persisted index.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from reactivestreams_kinesis_spark.operators.layout import partitioned_write


def build_ivf_index(
    corpus: DataFrame,
    centroids: DataFrame,
    out_dir: str,
    *,
    vec: str = "cv",
    key: str = "vec_id",
) -> str:
    """Assign every corpus vector to its nearest centroid (the same
    broadcast-argmax plan as query time / `lloyd_refine`) and write the
    lists hive-partitioned by ``centroid_id``. One narrow map over the
    corpus + one partitioned write; the codebook rides along as
    ``<out_dir>__codebook`` so probes are self-contained. Rebuild cost =
    one corpus pass, the same as any clustering rewrite
    (`interleaved_write`); incremental ingest appends new vectors into
    their cells' directories without touching existing files."""
    from reactivestreams_kinesis_spark.queries.llm_similarity import (
        _nearest_centroids,
        _with_norm,
    )

    with_n = _with_norm(corpus.select(key, vec), vec, "__n")
    assigned = _nearest_centroids(
        with_n, centroids, vec=vec, key=key, norm_col="__n", n=1
    ).select(key, vec, "centroid_id")
    partitioned_write(assigned, out_dir, ["centroid_id"])
    centroids.write.mode("overwrite").parquet(out_dir + "__codebook")
    return out_dir


def append_to_ivf_index(
    spark: SparkSession,
    index_dir: str,
    new_vectors: DataFrame,
    *,
    vec: str = "cv",
    key: str = "vec_id",
) -> str:
    """Incremental ingest into the persisted index — the promise in
    ``build_ivf_index``'s docstring delivered: assign ONLY the new
    vectors against the SAME persisted codebook (broadcast-argmax, one
    narrow map over the batch) and APPEND them into their cells'
    directories; existing files are untouched, so the cost tracks the
    ingest batch, never the index size. Probes immediately see the new
    vectors (the partition scan lists each probed directory's files at
    plan time). The codebook does NOT re-learn here — periodic re-learn +
    ``build_ivf_index`` rebuild is the compaction-shaped maintenance job,
    exactly like `compact_snapshot` for tables; until then new vectors
    land in the nearest EXISTING cell, which keeps probe results exact
    for the current codebook geometry (verified: probe after append ≡
    probe of a full rebuild over the union corpus)."""
    from reactivestreams_kinesis_spark.operators.layout import partitioned_write
    from reactivestreams_kinesis_spark.queries.llm_similarity import (
        _nearest_centroids,
        _with_norm,
    )

    centroids = spark.read.parquet(index_dir + "__codebook")
    with_n = _with_norm(new_vectors.select(key, vec), vec, "__n")
    assigned = _nearest_centroids(
        with_n, centroids, vec=vec, key=key, norm_col="__n", n=1
    ).select(key, vec, "centroid_id")
    partitioned_write(assigned, index_dir, ["centroid_id"], mode="append")
    return index_dir


def probe_ivf_index(
    spark: SparkSession,
    index_dir: str,
    queries: DataFrame,
    *,
    k: int = 5,
    nprobe: int = 2,
    query_key: str = "query_id",
    query_vec: str = "qv",
) -> DataFrame:
    """Top-k over the PERSISTED lists: route each query to its ``nprobe``
    nearest centroids (broadcast codebook — tiny), collect the probed
    cell ids (bounded: |queries| × nprobe rows by the brute-force
    contract on the query side), and scan the index with a literal
    ``centroid_id IN (...)`` — which Spark turns into PartitionFilters,
    reading ONLY the probed directories. Scoring + W4 top-k then run on
    nprobe/n_lists of the corpus, same math as ``ann_ivf_topk``, with
    the cell restriction enforced by STORAGE instead of a join."""
    from reactivestreams_kinesis_spark.queries.llm_similarity import (
        _nearest_centroids,
        _topk_per_query,
        _with_norm,
        spark_dot,
    )

    centroids = spark.read.parquet(index_dir + "__codebook")
    q = _with_norm(
        queries.select(
            F.col(query_key).alias("query_id"), F.col(query_vec).alias("qv")
        ),
        "qv",
        "qn",
    )
    probes = _nearest_centroids(
        q, centroids, vec="qv", key="query_id", norm_col="qn", n=nprobe
    ).select("query_id", "qv", "qn", "centroid_id")
    # bounded driver action: |queries| x nprobe cell ids become a literal
    # IN-filter so partition pruning happens at PLAN time (a join would
    # work too but scans every directory; dynamic partition pruning only
    # triggers on joins Spark recognizes — the literal is the guarantee)
    probed_cells = sorted(
        {r["centroid_id"] for r in probes.select("centroid_id").distinct().collect()}
    )
    lists = spark.read.parquet(index_dir).filter(
        F.col("centroid_id").isin(probed_cells)
    )
    scored = probes.join(lists, "centroid_id").select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        F.round(
            F.try_divide(
                F.expr(spark_dot("qv", "cv")),
                F.col("qn") * F.expr(f"SQRT({spark_dot('cv', 'cv')})"),
            ),
            6,
        ).alias("cosine"),
    )
    return _topk_per_query(scored, k)
