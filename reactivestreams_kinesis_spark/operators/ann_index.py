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


def tune_ivf(
    spark: SparkSession,
    corpus: DataFrame,
    *,
    target_recall: float = 0.5,
    k: int = 5,
    n_queries: int = 100,
    n_lists_grid: tuple = (20, 40, 80),
    nprobe_grid: tuple = (1, 2, 4, 8),
    key: str = "vec_id",
    vec: str = "cv",
) -> dict:
    """Recall-targeted knob picking (round 12): measure recall@``k`` of
    the IVF list/probe path against a brute-force truth set over a
    (n_lists, nprobe) grid and return the CHEAPEST configuration meeting
    ``target_recall`` — cheapest by scored-candidate fraction of the
    corpus per query, the quantity that bills at 100 TB (probe cost is
    ~nprobe/n_lists of the corpus; more lists cut per-probe cost but
    spread true neighbors across more cells, so the trade must be
    measured, not assumed).

    Statistical power comes from ``n_queries`` held-out PSEUDO-QUERIES:
    a deterministic md5-rank holdout of the corpus (the same
    engine-portable hash-selection idiom as the Lloyd sample), scored
    against brute-force cosine top-k over the REMAINING corpus — every
    grid cell faces the identical n_queries×k truth pairs. Codebooks
    seed from an id-stride matched to the requested list count and
    refine with the production Lloyd path on the hash sample — the
    exact build ``sim_ann_ivf*`` runs, so the picked knobs transfer.

    Returns ``{"curve": [...], "picked": {...}|None, "met": bool, ...}``;
    ``curve`` rows carry (n_lists, n_lists_effective, nprobe, recall,
    scan_frac). Within one codebook recall is monotone in nprobe (top-p
    probed cells are a superset of top-(p-1)'s), so a caller can also
    read the curve as p cost/recall ladders.

    Cost: one brute-force pass over n_queries×|corpus| (the truth),
    plus per grid row a codebook build (sample-sized Lloyd) and a
    probed scoring join — all bounded, no all-pairs stage. At 100 TB
    run it on a hash-sampled sub-corpus; the fractions transfer."""
    from reactivestreams_kinesis_spark.queries.llm_similarity import (
        LLOYD_SAMPLE_SPARK,
        _nearest_centroids,
        _with_norm,
        ann_ivf_topk,
        cosine_topk,
        lloyd_refine,
    )

    rows = corpus.select(F.col(key).alias("vec_id"), F.col(vec).alias("cv"))
    # deterministic holdout: the n_queries smallest md5(vec_id) values —
    # engine-portable, independent of how ids correlate with content
    qids = [
        r["vec_id"]
        for r in rows.select("vec_id")
        .withColumn("__h", F.md5(F.col("vec_id").cast("string")))
        .orderBy("__h", "vec_id")
        .limit(n_queries)
        .collect()
    ]
    queries = (
        rows.filter(F.col("vec_id").isin(qids))
        .select(F.col("vec_id").alias("query_id"), F.col("cv").alias("qv"))
        .localCheckpoint(eager=True)
    )
    pool = rows.filter(~F.col("vec_id").isin(qids)).localCheckpoint(eager=True)
    n_corpus = pool.count()
    truth = {
        (r["query_id"], r["neighbor_id"])
        for r in cosine_topk(
            queries, pool, k=k,
            query_id="query_id", query_vec="qv",
            corpus_id="vec_id", corpus_vec="cv",
        ).collect()
    }
    sample = pool.filter(F.expr(LLOYD_SAMPLE_SPARK))
    pooln = _with_norm(pool, "cv", "cn")
    qn = _with_norm(queries, "qv", "qn")
    curve: list[dict] = []
    for n_lists in n_lists_grid:
        stride = max(1, n_corpus // int(n_lists))
        init = pool.filter(
            F.col("vec_id") % stride == F.lit(5 % stride)
        ).select(
            F.col("vec_id").alias("centroid_id"), F.col("cv").alias("centv")
        )
        cent = lloyd_refine(sample, init).localCheckpoint(eager=True)
        n_eff = cent.count()
        sizes = (
            _nearest_centroids(
                pooln, cent, vec="cv", key="vec_id", norm_col="cn", n=1
            )
            .groupBy("centroid_id")
            .agg(F.count(F.lit(1)).alias("sz"))
            .localCheckpoint(eager=True)
        )
        for nprobe in nprobe_grid:
            probes = _nearest_centroids(
                qn, cent, vec="qv", key="query_id", norm_col="qn", n=nprobe
            ).select("query_id", "centroid_id")
            scanned = (
                probes.join(sizes, "centroid_id").agg(F.sum("sz")).collect()[0][0]
                or 0
            )
            approx = {
                (r["query_id"], r["neighbor_id"])
                for r in ann_ivf_topk(
                    queries, pool, cent, k=k, nprobe=nprobe
                ).collect()
            }
            curve.append(
                {
                    "n_lists": int(n_lists),
                    "n_lists_effective": int(n_eff),
                    "nprobe": int(nprobe),
                    "recall": round(len(truth & approx) / len(truth), 4),
                    "scan_frac": round(scanned / (len(qids) * n_corpus), 4),
                }
            )
    eligible = [c for c in curve if c["recall"] >= target_recall]
    picked = (
        min(eligible, key=lambda c: (c["scan_frac"], c["nprobe"]))
        if eligible
        else None
    )
    return {
        "target_recall": target_recall,
        "k": k,
        "n_queries": len(qids),
        "n_corpus": n_corpus,
        "truth_pairs": len(truth),
        "curve": curve,
        "picked": picked,
        "met": picked is not None,
        # fallback guidance when the grid can't hit the target: the
        # highest-recall row (callers widen the grid or raise nprobe)
        "best": max(curve, key=lambda c: c["recall"]) if curve else None,
    }
