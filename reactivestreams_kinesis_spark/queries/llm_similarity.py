"""Similarity search over embeddings (SURVEY.md §2.10 X1, X6) — all [MANDATE].

Brute-force cosine top-k is the correctness baseline; the LSH-bucketed
variant is the 100 TB path (it replaces the query×corpus cross join with a
bucket equi-join). Embedding-cosine near-dup pairs use label blocking the
same way MinHash bands block Jaccard (X3).

All vector math is higher-order expressions (``functions.vector``) — JVM
codegen, no UDF. Hyperplanes for LSH are derived from md5 (hashlib and the
engines' MD5 agree), inlined as literal arrays into BOTH the Spark plan and
the DuckDB oracle — seeded determinism per SURVEY §7.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from reactivestreams_kinesis_spark.catalog import load_table
from reactivestreams_kinesis_spark.functions.vector import (
    duckdb_cosine,
    duckdb_dot,
    spark_dot,
)
from reactivestreams_kinesis_spark.queries.registry import register, scratch_dir
from reactivestreams_kinesis_spark.session import persist_once

def _with_norm(df, vec: str, norm_name: str):
    """Attach ||v|| once per vector — pair-scoring then does ONE dot per pair
    instead of three (dot(a,b), dot(a,a), dot(b,b)); sqrt(dot(v,v)) is the
    same double either way so oracle parity is unchanged. ~3x less compute
    on the pair-quadratic stage (measured 10.3s → see commit)."""
    return df.withColumn(norm_name, F.expr(f"SQRT({spark_dot(vec, vec)})"))


N_QUERIES = 5  # vec_id < 5 are the query vectors
TOP_K = 5
DIM = 64
N_HYPERPLANES = 4  # 16 buckets over the 500-vector corpus


def _topk_per_query(scored: DataFrame, k: int) -> DataFrame:
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("query_id", "neighbor_id", "cosine")
    )


def cosine_topk(
    queries: DataFrame,
    corpus: DataFrame,
    *,
    k: int = TOP_K,
    query_id: str = "query_id",
    query_vec: str = "qv",
    corpus_id: str = "neighbor_id",
    corpus_vec: str = "cv",
) -> DataFrame:
    """Brute-force cosine top-k — the reusable, knob-exposed form of
    ``sim_cosine_topk``: broadcast the query set against the corpus, score
    with codegen'd higher-order expressions, keep top-k per query. Pass
    any (id, array<float>) pair of DataFrames; the query side must be
    small enough to broadcast (that is the brute-force contract — use
    ``ann_lsh_topk`` / the IVF path when it isn't)."""
    q = _with_norm(
        queries.select(
            F.col(query_id).alias("query_id"), F.col(query_vec).alias("qv")
        ),
        "qv", "qn",
    )
    c = _with_norm(
        corpus.select(
            F.col(corpus_id).alias("neighbor_id"), F.col(corpus_vec).alias("cv")
        ),
        "cv", "cn",
    )
    scored = c.crossJoin(F.broadcast(q)).select(
        "query_id",
        "neighbor_id",
        F.round(
            F.try_divide(
                F.expr(spark_dot("qv", "cv")), F.col("qn") * F.col("cn")
            ),
            6,
        ).alias("cosine"),
    )
    return _topk_per_query(scored, k)


@register(
    "sim_cosine_topk",
    oracle=f"""
    WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < {N_QUERIES}),
    c AS (SELECT vec_id, embedding AS cv FROM embeddings WHERE vec_id >= {N_QUERIES}),
    scored AS (
        SELECT
            q.query_id,
            c.vec_id AS neighbor_id,
            ROUND({duckdb_cosine('qv', 'cv')}, 6) AS cosine
        FROM q CROSS JOIN c
    )
    SELECT query_id, neighbor_id, cosine
    FROM (
        SELECT *, ROW_NUMBER() OVER (
            PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rn
        FROM scored
    ) WHERE rn <= {TOP_K}
    """,
    tags=("X1", "J4", "W4"),
    bench=True,
)
def sim_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-k (X1 baseline): broadcast the tiny query set
    against the corpus, score with codegen'd zip_with/aggregate, keep top-k
    per query via the W4 window pattern.

    Scale shape: the corpus side never shuffles — queries broadcast, scoring
    is a narrow map, and WindowGroupLimit keeps only k rows per query per
    partition before the final tiny exchange. Ranking uses the ROUNDED
    cosine (+ neighbor_id tie-break) so ordering is engine-deterministic.
    Knobs live on ``cosine_topk``; this is the oracle-checked instantiation.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    return cosine_topk(
        emb.filter(F.col("vec_id") < N_QUERIES),
        emb.filter(F.col("vec_id") >= N_QUERIES),
        query_id="vec_id", query_vec="embedding",
        corpus_id="vec_id", corpus_vec="embedding",
    )


COSINE_PAIR_THRESHOLD = 0.4


@register(
    "sim_neardup_blocked",
    oracle=f"""
    SELECT
        a.vec_id AS vec_a,
        b.vec_id AS vec_b,
        ROUND({duckdb_cosine('a.embedding', 'b.embedding')}, 6) AS cosine
    FROM embeddings a
    JOIN embeddings b
      ON a.label = b.label AND a.vec_id < b.vec_id
    WHERE {duckdb_cosine('a.embedding', 'b.embedding')} >= {COSINE_PAIR_THRESHOLD}
    """,
    tags=("X1", "X2"),
)
def sim_neardup_blocked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs with label blocking (X1/X2): the
    equi-join on ``label`` turns all-pairs O(n²) into Σ|block|² — the same
    blocking idea as LSH bands, using an existing cluster key. At 100 TB
    the block key would itself be an LSH bucket."""
    emb = _with_norm(
        load_table(spark, sf_dir, "embeddings"), "embedding", "nrm"
    )
    a = emb.alias("a")
    b = emb.alias("b")
    cos = F.try_divide(
        F.expr(spark_dot("a.embedding", "b.embedding")),
        F.col("a.nrm") * F.col("b.nrm"),
    )
    return (
        a.join(
            b,
            (F.col("a.label") == F.col("b.label"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .filter(cos >= COSINE_PAIR_THRESHOLD)
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            F.round(cos, 6).alias("cosine"),
        )
    )


def _hyperplanes(
    n_hyperplanes: int = N_HYPERPLANES, dim: int = DIM
) -> list[list[float]]:
    """±1 hyperplanes from md5(seed, dim) — deterministic and identical to
    what any engine would derive, inlined as literals on both sides."""
    planes = []
    for s in range(n_hyperplanes):
        row = []
        for i in range(dim):
            digest = hashlib.md5(f"{s}_{i}".encode()).hexdigest()
            row.append(1.0 if digest[0] in "89abcdef" else -1.0)
        planes.append(row)
    return planes


def _bucket_sql(
    vec: str, dot_fn, n_hyperplanes: int = N_HYPERPLANES, dim: int = DIM
) -> str:
    """Bucket id = Σ 2^s · [dot(vec, plane_s) > 0], with plane literals.
    Array literal syntax differs per engine: Spark ``array(...)``,
    DuckDB ``[...]`` — selected off which dot builder we were handed."""
    array_fmt = "array({})" if dot_fn is spark_dot else "[{}]"
    terms = []
    for s, plane in enumerate(_hyperplanes(n_hyperplanes, dim)):
        lit = array_fmt.format(", ".join(f"CAST({v} AS DOUBLE)" for v in plane))
        terms.append(f"(CASE WHEN {dot_fn(vec, lit)} > 0 THEN {2 ** s} ELSE 0 END)")
    return "(" + " + ".join(terms) + ")"


def ann_lsh_topk(
    queries: DataFrame,
    corpus: DataFrame,
    *,
    k: int = TOP_K,
    n_hyperplanes: int = N_HYPERPLANES,
    dim: int = DIM,
    multiprobe: bool = True,
    query_id: str = "query_id",
    query_vec: str = "qv",
    corpus_id: str = "neighbor_id",
    corpus_vec: str = "cv",
) -> DataFrame:
    """Random-hyperplane LSH approximate top-k — the reusable, knob-exposed
    form of ``sim_ann_lsh``. 2^n_hyperplanes buckets: raise n_hyperplanes
    to cut scored pairs (precision/cost), lower it for recall.

    ``multiprobe`` additionally probes every bucket at Hamming distance 1
    from the query's bucket (flip each sign bit once) — the standard
    recall lever: a true neighbor that disagrees with the query on ONE
    hyperplane is still found, at (n_hyperplanes+1)× the probe cost but
    with no extra corpus work. Measured on the fixture it takes recall@5
    from chance (~0.08, single-bucket) to 0.52 (the test asserts a 0.4
    floor below that measurement); the query side stays tiny
    so the exploded probes still broadcast. Unlike the brute-force path,
    neither side needs to fit in a broadcast at extreme scale — the
    bucket equi-join can shuffle both sides on the bucket key."""
    bucket = F.expr(_bucket_sql("v", spark_dot, n_hyperplanes, dim))
    q = _with_norm(
        queries.select(
            F.col(query_id).alias("query_id"), F.col(query_vec).alias("v")
        ).withColumn("bucket", bucket).withColumnRenamed("v", "qv"),
        "qv", "qn",
    )
    if multiprobe:
        probes = ", ".join(
            ["bucket"] + [f"bucket ^ {2 ** s}" for s in range(n_hyperplanes)]
        )
        q = q.withColumn("bucket", F.explode(F.expr(f"array({probes})")))
    c = _with_norm(
        corpus.select(
            F.col(corpus_id).alias("neighbor_id"), F.col(corpus_vec).alias("v")
        ).withColumn("bucket", bucket).withColumnRenamed("v", "cv"),
        "cv", "cn",
    )
    scored = c.join(F.broadcast(q), "bucket").select(
        "query_id",
        "neighbor_id",
        F.round(
            F.try_divide(
                F.expr(spark_dot("qv", "cv")), F.col("qn") * F.col("cn")
            ),
            6,
        ).alias("cosine"),
    )
    return _topk_per_query(scored, k)


@register(
    "sim_ann_lsh",
    oracle=f"""
    WITH q AS (
        SELECT vec_id AS query_id, embedding AS qv,
               {_bucket_sql('embedding', duckdb_dot)} AS bucket
        FROM embeddings WHERE vec_id < {N_QUERIES}
    ),
    probes AS (
        SELECT query_id, qv, UNNEST([bucket,
            {", ".join(f"xor(bucket, {2 ** s})" for s in range(N_HYPERPLANES))}
        ]) AS bucket
        FROM q
    ),
    c AS (
        SELECT vec_id, embedding AS cv,
               {_bucket_sql('embedding', duckdb_dot)} AS bucket
        FROM embeddings WHERE vec_id >= {N_QUERIES}
    ),
    scored AS (
        SELECT
            p.query_id,
            c.vec_id AS neighbor_id,
            ROUND({duckdb_cosine('qv', 'cv')}, 6) AS cosine
        FROM probes p JOIN c ON p.bucket = c.bucket
    )
    SELECT query_id, neighbor_id, cosine
    FROM (
        SELECT *, ROW_NUMBER() OVER (
            PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rn
        FROM scored
    ) WHERE rn <= {TOP_K}
    """,
    tags=("X1",),
)
def sim_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-bucketed approximate top-k (X1 scale path): random-hyperplane
    signatures bucket the corpus; each query scores its own bucket plus
    every bucket one sign-flip away (multi-probe) instead of the full
    cross join — with B buckets this still cuts scored pairs ~B/(H+1)×
    while recovering neighbors that disagree on a single hyperplane.
    The brute-force twin (``sim_cosine_topk``) is the recall oracle
    (recall floor pinned in tests). Knobs (k, hyperplanes, multiprobe)
    live on ``ann_lsh_topk``; this is the oracle-checked instantiation."""
    emb = load_table(spark, sf_dir, "embeddings")
    return ann_lsh_topk(
        emb.filter(F.col("vec_id") < N_QUERIES),
        emb.filter(F.col("vec_id") >= N_QUERIES),
        query_id="vec_id", query_vec="embedding",
        corpus_id="vec_id", corpus_vec="embedding",
    )


@register(
    "sim_embed_enrich",
    oracle=f"""
    SELECT
        d.lang,
        e.label,
        COUNT(*) AS n_docs,
        ROUND(AVG({duckdb_dot('e.embedding', 'e.embedding')}), 6) AS avg_sq_norm,
        ROUND(AVG(d.n_chars), 6) AS avg_chars
    FROM documents d
    JOIN embeddings e ON d.doc_id = e.vec_id
    GROUP BY d.lang, e.label
    """,
    tags=("X6", "J1"),
)
def sim_embed_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document–embedding enrichment join (X6): equi-join on id, then
    per-(lang, label) aggregates mixing text and vector features."""
    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")
    return (
        docs.join(emb, docs.doc_id == emb.vec_id)
        .groupBy("lang", "label")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.avg(F.expr(spark_dot("embedding", "embedding"))), 6).alias(
                "avg_sq_norm"
            ),
            F.round(F.avg("n_chars"), 6).alias("avg_chars"),
        )
    )


# IVF coarse quantizer: every corpus vector whose id falls on the stride is a
# centroid — a deterministic, data-derived codebook (real IVF trains k-means;
# the list/probe PLAN is identical, and determinism is what the oracle needs).
IVF_STRIDE = 50  # 1 centroid per 50 corpus vectors
IVF_NPROBE = 2   # lists probed per query


def _nearest_centroids(df, centroids, *, vec, key, norm_col, n):
    """Attach the ``n`` nearest codebook centroids to each row of ``df``:
    broadcast the (tiny) codebook, score rounded cosines, keep the top-n
    per row via one WindowGroupLimit. Ranking uses the ROUNDED cosine +
    centroid_id tie-break so both engines agree exactly."""
    cos = F.round(
        F.try_divide(
            F.expr(spark_dot(vec, "centv")),
            F.col(norm_col) * F.expr(f"SQRT({spark_dot('centv', 'centv')})"),
        ),
        6,
    )
    w = Window.partitionBy(key).orderBy(cos.desc(), F.col("centroid_id"))
    return (
        df.crossJoin(F.broadcast(centroids))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= n)
        .drop("rn", "centv")
    )


LLOYD_ITERS = 2      # refinement passes over the strided init
LLOYD_ROUND_DP = 4   # centroid coordinates quantized to this grid

# Codebook learning runs on a DETERMINISTIC HASH SAMPLE of the corpus
# (md5 first hex digit < '8' → ~50%), not the full corpus: centroid
# quality needs only a representative subset, so the per-pass Lloyd
# assignment cost becomes scale-free (sample size is a knob, not a
# function of corpus size) while the FULL corpus is still touched
# exactly once at final list assignment. md5 hex is identical across
# engines, so the oracle selects the identical sample. Measured at
# sf0.1: recall@5 identical to full-corpus Lloyd at every nprobe
# (BASELINE.md "Sampled codebook learning").
LLOYD_SAMPLE_SPARK = "substring(md5(CAST(vec_id AS STRING)), 1, 1) < '8'"
LLOYD_SAMPLE_DUCK = "substr(md5(CAST(vec_id AS VARCHAR)), 1, 1) < '8'"


def lloyd_refine(
    corpus: DataFrame,
    centroids: DataFrame,
    *,
    iters: int = LLOYD_ITERS,
    vec: str = "cv",
    key: str = "vec_id",
    round_dp: int = LLOYD_ROUND_DP,
) -> DataFrame:
    """Seeded Lloyd (k-means) refinement of a codebook as bounded
    DataFrame jobs: each pass assigns every corpus vector to its nearest
    centroid (broadcast codebook, one WindowGroupLimit — the same plan as
    query-time assignment) and recomputes each centroid as the per-dim
    mean of its members (posexplode → groupBy(centroid, dim) avg →
    array rebuild). Deterministic across engines: assignment ranks the
    ROUNDED cosine with a centroid_id tie-break, and every mean is
    quantized to the ``round_dp`` grid, so double-summation-order noise
    (~1e-16 relative) cannot flip a coordinate. Empty clusters simply
    drop out of the GROUP BY in both engines. Cost: ``iters`` × (one
    narrow map over the corpus + one centroid-sized shuffle) — no
    all-pairs stage anywhere, so the refinement scales exactly like
    query-time assignment does. At 100 TB, pass a deterministic hash
    SAMPLE of the corpus (md5-bucket filter, ``sample_hash`` style) as
    ``corpus`` here — centroid quality needs only a representative
    subset, so the full corpus is touched once at final assignment, not
    per Lloyd pass."""
    corpus = _with_norm(corpus.select(key, vec), vec, "__ln")
    for _ in range(iters):
        assigned = _nearest_centroids(
            corpus, centroids, vec=vec, key=key, norm_col="__ln", n=1
        )
        centroids = (
            assigned.select("centroid_id", F.posexplode(vec).alias("pos", "v"))
            .groupBy("centroid_id", "pos")
            .agg(F.round(F.avg("v"), round_dp).alias("m"))
            .groupBy("centroid_id")
            .agg(
                F.expr(
                    "transform(array_sort(collect_list(struct(pos, m))), x -> x.m)"
                ).alias("centv")
            )
        )
    return centroids


def ann_ivf_topk(
    queries: DataFrame,
    corpus: DataFrame,
    centroids: DataFrame,
    *,
    k: int = TOP_K,
    nprobe: int = IVF_NPROBE,
) -> DataFrame:
    """IVF list/probe approximate top-k — the reusable, knob-exposed form
    of ``sim_ann_ivf``. ``queries``: (query_id, qv); ``corpus``:
    (vec_id, cv); ``centroids``: (centroid_id, centv) — any codebook
    (``lloyd_refine`` output, strided sample). Raise ``nprobe`` for
    recall at linear probe cost; list count is whatever the codebook
    provides."""
    corpus = _with_norm(corpus, "cv", "cn")
    queries = _with_norm(queries, "qv", "qn")
    assigned = _nearest_centroids(
        corpus, centroids, vec="cv", key="vec_id", norm_col="cn", n=1
    )
    probes = _nearest_centroids(
        queries, centroids, vec="qv", key="query_id", norm_col="qn", n=nprobe
    )
    scored = probes.join(assigned, "centroid_id").select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        F.round(
            F.try_divide(
                F.expr(spark_dot("qv", "cv")), F.col("qn") * F.col("cn")
            ),
            6,
        ).alias("cosine"),
    )
    return _topk_per_query(scored, k)


def _lloyd_oracle_ctes(
    iters: int = LLOYD_ITERS,
    *,
    assign_where: str | None = None,
    init_where: str | None = None,
) -> str:
    """DuckDB CTE chain computing the SAME seeded Lloyd refinement as
    ``lloyd_refine``, unrolled: cent0 = strided init, then per pass an
    argmax assignment (rounded cosine + id tie-break) and a per-dim mean
    quantized to the {LLOYD_ROUND_DP}-dp grid (multiple UNNESTs in one
    SELECT zip positionally; list(... ORDER BY pos) rebuilds the array).
    The final codebook is ``cent{iters}``. ``assign_where`` selects the
    learning corpus (default: the IVF corpus restricted to the hash
    sample, matching the Spark side's sampled learning); ``init_where``
    selects the strided seed rows."""
    if assign_where is None:
        assign_where = f"c.vec_id >= {N_QUERIES} AND {LLOYD_SAMPLE_DUCK}"
    if init_where is None:
        init_where = f"vec_id >= {N_QUERIES} AND vec_id % {IVF_STRIDE} = 5"
    parts = [
        f"""cent0 AS (
        SELECT vec_id AS centroid_id, embedding AS centv
        FROM embeddings
        WHERE {init_where}
    )"""
    ]
    for i in range(iters):
        parts.append(f"""assign_it{i} AS (
        SELECT vec_id, cv, centroid_id FROM (
            SELECT c.vec_id, c.embedding AS cv, k.centroid_id,
                   ROW_NUMBER() OVER (
                       PARTITION BY c.vec_id
                       ORDER BY ROUND({duckdb_cosine('c.embedding', 'k.centv')}, 6) DESC,
                                k.centroid_id) AS rn
            FROM embeddings c CROSS JOIN cent{i} k
            WHERE {assign_where}
        ) WHERE rn = 1
    )""")
        parts.append(f"""cent{i + 1} AS (
        SELECT centroid_id, list(m ORDER BY pos) AS centv FROM (
            SELECT centroid_id, pos, ROUND(AVG(v), {LLOYD_ROUND_DP}) AS m FROM (
                SELECT centroid_id, UNNEST(cv) AS v,
                       UNNEST(range(len(cv))) AS pos
                FROM assign_it{i}
            ) GROUP BY centroid_id, pos
        ) GROUP BY centroid_id
    )""")
    return ",\n    ".join(parts)


@register(
    "sim_ann_ivf",
    oracle=f"""
    WITH {_lloyd_oracle_ctes()},
    cent AS (SELECT * FROM cent{LLOYD_ITERS}),
    assigned AS (
        SELECT vec_id, cv, centroid_id FROM (
            SELECT c.vec_id, c.embedding AS cv, cent.centroid_id,
                   ROW_NUMBER() OVER (
                       PARTITION BY c.vec_id
                       ORDER BY ROUND({duckdb_cosine('c.embedding', 'cent.centv')}, 6) DESC,
                                cent.centroid_id) AS rn
            FROM embeddings c CROSS JOIN cent
            WHERE c.vec_id >= {N_QUERIES}
        ) WHERE rn = 1
    ),
    probes AS (
        SELECT query_id, qv, centroid_id FROM (
            SELECT q.vec_id AS query_id, q.embedding AS qv, cent.centroid_id,
                   ROW_NUMBER() OVER (
                       PARTITION BY q.vec_id
                       ORDER BY ROUND({duckdb_cosine('q.embedding', 'cent.centv')}, 6) DESC,
                                cent.centroid_id) AS rn
            FROM embeddings q CROSS JOIN cent
            WHERE q.vec_id < {N_QUERIES}
        ) WHERE rn <= {IVF_NPROBE}
    )
    SELECT query_id, neighbor_id, cosine FROM (
        SELECT p.query_id, a.vec_id AS neighbor_id,
               ROUND({duckdb_cosine('p.qv', 'a.cv')}, 6) AS cosine,
               ROW_NUMBER() OVER (
                   PARTITION BY p.query_id
                   ORDER BY ROUND({duckdb_cosine('p.qv', 'a.cv')}, 6) DESC,
                            a.vec_id) AS rn
        FROM probes p JOIN assigned a ON p.centroid_id = a.centroid_id
    ) WHERE rn <= {TOP_K}
    """,
    tags=("X1",),
)
def sim_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-style approximate top-k (X1 scale path #2): coarse-quantize the
    corpus into inverted lists (nearest centroid per vector), probe only
    the {IVF_NPROBE} closest lists per query. Complements ``sim_ann_lsh``:
    IVF partitions by data geometry (Voronoi cells), LSH by random
    hyperplanes — production vector stores (FAISS-style) use exactly this
    list/probe plan.

    The codebook is LEARNED: a deterministic strided sample seeds
    {LLOYD_ITERS} Lloyd iterations (``lloyd_refine`` — assign = the same
    broadcast-argmax plan as query time, update = groupBy-avg quantized
    to the {LLOYD_ROUND_DP}-dp grid), and the oracle unrolls the
    identical passes in SQL, so list geometry follows the DATA rather
    than the id sequence — the property recall at real scale depends on
    (measured recall/nprobe table in BASELINE.md).

    Scale shape: the codebook is tiny → broadcast to both assignment and
    probing; list assignment is a narrow map over the corpus (argmax over
    broadcast centroids via one WindowGroupLimit); the probe join is an
    equi-join on centroid_id, so scored candidates ≈ nprobe/n_lists of the
    corpus per query instead of all of it. The brute-force twin
    (``sim_cosine_topk``) is the recall oracle. Ranking always uses the
    ROUNDED cosine + id tie-break for cross-engine determinism. Knobs
    live on ``ann_ivf_topk`` / ``lloyd_refine``; this is the
    oracle-checked instantiation."""
    emb = load_table(spark, sf_dir, "embeddings")
    init = emb.filter(
        (F.col("vec_id") >= N_QUERIES) & (F.col("vec_id") % IVF_STRIDE == 5)
    ).select(F.col("vec_id").alias("centroid_id"), F.col("embedding").alias("centv"))
    corpus = emb.filter(F.col("vec_id") >= N_QUERIES).select(
        "vec_id", F.col("embedding").alias("cv")
    )
    queries = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    # learn on the deterministic hash sample (scale-free build cost; the
    # full corpus is only touched once, at final list assignment below);
    # materialize the (centroid-count-sized) learned codebook once —
    # assignment and probing both broadcast it, and without the checkpoint
    # each reference would recompute the full iterative refinement DAG
    sample = corpus.filter(F.expr(LLOYD_SAMPLE_SPARK))
    cent = lloyd_refine(sample, init).localCheckpoint(eager=True)
    return ann_ivf_topk(queries, corpus, cent)


# --- SemDedup: cluster-blocked embedding near-dup --------------------------
#
# sim_neardup_blocked blocks the pair-quadratic on a GIVEN key (label).
# SemDedup (Abbas et al., 2023) derives the blocking key from the data:
# cluster the embedding space, then score pairs only within a cluster —
# near-dups are near in space, so they co-cluster, and the all-pairs n²
# collapses to Σ|cluster|². Round 6: the codebook is the LLOYD-LEARNED
# one (seeded by the strided sample, refined on the hash sample — the
# same learning path as sim_ann_ivf, oracle-unrolled identically). This
# matters for SemDedup specifically because the pair cost is Σ|cell|²:
# data-following centroids balance the Voronoi cells, and the measured
# max-cell shrink directly cuts the quadratic term (cell-size histogram
# in BASELINE.md "SemDedup cell balance").

SEMDEDUP_THRESHOLD = 0.4  # drop b if cos(a, b) >= τ for some lower-id a


@register(
    "sim_semdedup",
    oracle=f"""
    WITH {_lloyd_oracle_ctes(assign_where=LLOYD_SAMPLE_DUCK, init_where=f"vec_id % {IVF_STRIDE} = 5")},
    cent AS (SELECT * FROM cent{LLOYD_ITERS}),
    assigned AS (
        SELECT vec_id, cv, centroid_id FROM (
            SELECT c.vec_id, c.embedding AS cv, cent.centroid_id,
                   ROW_NUMBER() OVER (
                       PARTITION BY c.vec_id
                       ORDER BY ROUND({duckdb_cosine('c.embedding', 'cent.centv')}, 6) DESC,
                                cent.centroid_id) AS rn
            FROM embeddings c CROSS JOIN cent
        ) WHERE rn = 1
    )
    SELECT b.vec_id, b.centroid_id,
           COUNT(*) AS n_dups,
           ROUND(MAX({duckdb_cosine('a.cv', 'b.cv')}), 6) AS max_cosine
    FROM assigned a
    JOIN assigned b
      ON a.centroid_id = b.centroid_id AND a.vec_id < b.vec_id
    WHERE {duckdb_cosine('a.cv', 'b.cv')} >= {SEMDEDUP_THRESHOLD}
    GROUP BY b.vec_id, b.centroid_id
    """,
    tags=("X1", "X2", "X3"),
)
def sim_semdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDedup-style embedding dedup (X1/X3 composition): assign every
    vector to its nearest codebook centroid (Voronoi cell), score cosine
    pairs ONLY within a cell, and report the drop-list — each vector that
    has a lower-id near-duplicate (cos ≥ {SEMDEDUP_THRESHOLD}) in its
    cell, with its dup count and strongest match. Keep-set = corpus
    anti-join this result.

    Scale shape: the codebook is bounded (broadcast), assignment is a
    narrow map (one WindowGroupLimit over corpus × codebook, corpus never
    shuffles for it), and the pair stage is an equi-join on centroid_id —
    Σ|cell|² like every blocked near-dup here, with cell size controlled
    by codebook granularity (more centroids → smaller cells; production
    SemDedup uses ~100k k-means clusters for exactly this reason).
    Cross-cell near-dups are the documented recall trade: boundary pairs
    land in different cells, the price of killing n². The codebook is
    Lloyd-learned from the deterministic hash sample (strided seed, same
    passes the oracle unrolls) — one codebook pipeline for IVF and
    SemDedup. On this synthetic corpus the strided cells were already
    near-balanced, so the learning buys only a marginal balance gain
    (max |cell| 73→69 at sf0.1 — honest histogram in BASELINE.md); the
    value is the shared learning path plus the guarantee that cells
    follow data geometry on corpora where the id-order DOESN'T mix the
    space (real corpora cluster by source/time, where a strided sample
    skews badly)."""
    emb = load_table(spark, sf_dir, "embeddings")
    init = emb.filter(F.col("vec_id") % IVF_STRIDE == 5).select(
        F.col("vec_id").alias("centroid_id"), F.col("embedding").alias("centv")
    )
    corpus = _with_norm(
        emb.select("vec_id", F.col("embedding").alias("cv")), "cv", "cn"
    )
    sample = corpus.select("vec_id", "cv").filter(F.expr(LLOYD_SAMPLE_SPARK))
    centroids = lloyd_refine(sample, init).localCheckpoint(eager=True)
    cent_cos = F.round(
        F.try_divide(
            F.expr(spark_dot("cv", "centv")),
            F.col("cn") * F.expr(f"SQRT({spark_dot('centv', 'centv')})"),
        ),
        6,
    )
    w = Window.partitionBy("vec_id").orderBy(cent_cos.desc(), F.col("centroid_id"))
    # persisted: the pair stage references the assignment twice (a/b
    # sides of the self-join) — without the cache the broadcast-window
    # assignment would execute twice (caught by the round-4 scan audit);
    # released by the caller's released_caches scope like every shared
    # fan-out intermediate here
    assigned = (
        corpus.crossJoin(F.broadcast(centroids))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 1)
        .select("vec_id", "cv", "cn", "centroid_id")
    )
    assigned = persist_once(assigned)
    a = assigned.alias("a")
    b = assigned.alias("b")
    pair_cos = F.try_divide(
        F.expr(spark_dot("a.cv", "b.cv")), F.col("a.cn") * F.col("b.cn")
    )
    return (
        a.join(
            b,
            (F.col("a.centroid_id") == F.col("b.centroid_id"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .filter(pair_cos >= SEMDEDUP_THRESHOLD)
        .groupBy(
            F.col("b.vec_id").alias("vec_id"),
            F.col("b.centroid_id").alias("centroid_id"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_dups"),
            F.round(F.max(pair_cos), 6).alias("max_cosine"),
        )
    )


# --- Embedding quantization (int8) -----------------------------------------
#
# The standard memory lever for vector search at scale: symmetric int8
# scalar quantization cuts embedding storage 4x (float32 -> int8 + one
# float scale per vector), which at 100 TB of embeddings is the
# difference between in-memory ANN lists and disk spills. Quantize and
# dequantize are pure higher-order expressions; the query reports
# per-label reconstruction fidelity so the recall cost is measured, not
# assumed. round() on identical doubles is identical in both engines, so
# the quantized vectors — and therefore the fidelity numbers — are
# oracle-checked bit-exactly.

QUANT_BITS_MAX = 127  # symmetric int8 range


def quantize_int8(vec: str) -> str:
    """Spark fragment: symmetric int8 quantization of a float array —
    q_i = round(x_i * 127 / max|x|), stored with its scale. Zero vectors
    quantize to zeros with scale 0 (guarded divide)."""
    return (
        f"transform({vec}, x -> CAST(round(CAST(x AS DOUBLE) * {QUANT_BITS_MAX} "
        f"/ nullif(array_max(transform({vec}, y -> abs(CAST(y AS DOUBLE)))), 0.0)"
        f") AS INT))"
    )


def _duck_quantize(vec: str) -> str:
    return (
        f"list_transform({vec}, x -> CAST(round(CAST(x AS DOUBLE) * {QUANT_BITS_MAX} "
        f"/ nullif(list_max(list_transform({vec}, y -> abs(CAST(y AS DOUBLE)))), 0.0)"
        f") AS INT))"
    )


@register(
    "sim_quantize_int8",
    oracle=f"""
    WITH q AS (
        SELECT label,
               embedding,
               {_duck_quantize('embedding')} AS qv,
               list_max(list_transform(embedding,
                        y -> abs(CAST(y AS DOUBLE)))) / {QUANT_BITS_MAX} AS scale
        FROM embeddings
    ),
    scored AS (
        SELECT label,
               {duckdb_dot('embedding', 'embedding')} AS fdot,
               LIST_AGGREGATE(LIST_TRANSFORM(LIST_ZIP(qv, qv),
                   p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)), 'sum')
                   * scale * scale AS qdot
        FROM q
    )
    SELECT label,
           COUNT(*) AS n_vecs,
           ROUND(AVG(fdot), 6) AS avg_sq_norm,
           ROUND(MAX(CASE WHEN fdot > 0
                          THEN ABS(SQRT(qdot) - SQRT(fdot)) / SQRT(fdot)
                          ELSE 0 END), 6) AS max_norm_rel_err
    FROM scored
    GROUP BY label
    """,
    tags=("X1", "X5"),
)
def sim_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric int8 embedding quantization with a fidelity report (X1
    storage path): quantize every vector (4x smaller), dequantize via its
    scale, and report per-label worst-case relative norm error — the
    quantity that bounds cosine drift in downstream ANN. All expression
    work (transform/round/aggregate), no UDF; at scale the quantized
    corpus is what the IVF/LSH lists would hold, with full-precision
    re-scoring only for the final top-k. The oracle recomputes the exact
    same quantization — round() on identical doubles agrees across
    engines — so this is value-checked, not bounds-checked."""
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.select(
        "label",
        "embedding",
        F.expr(quantize_int8("embedding")).alias("qv"),
        F.expr(
            f"array_max(transform(embedding, y -> abs(CAST(y AS DOUBLE)))) "
            f"/ {QUANT_BITS_MAX}"
        ).alias("scale"),
    )
    scored = q.select(
        "label",
        F.expr(spark_dot("embedding", "embedding")).alias("fdot"),
        (
            F.expr(
                "aggregate(zip_with(qv, qv, (x, y) -> CAST(x AS DOUBLE) "
                "* CAST(y AS DOUBLE)), CAST(0 AS DOUBLE), (acc, v) -> acc + v)"
            )
            * F.col("scale")
            * F.col("scale")
        ).alias("qdot"),
    )
    return scored.groupBy("label").agg(
        F.count(F.lit(1)).alias("n_vecs"),
        F.round(F.avg("fdot"), 6).alias("avg_sq_norm"),
        F.round(
            F.max(
                F.when(
                    F.col("fdot") > 0,
                    F.abs(F.sqrt("qdot") - F.sqrt("fdot")) / F.sqrt("fdot"),
                ).otherwise(0.0)
            ),
            6,
        ).alias("max_norm_rel_err"),
    )


# --- IVF over an int8-quantized index with exact re-rank --------------------
#
# The composition a production vector store actually runs: the inverted
# lists hold 4x-smaller int8 vectors (sim_quantize_int8's lever), probing
# scores candidates on the DEQUANTIZED approximations, and only the
# shortlist is re-scored at full precision against the source of truth.
# Quantization noise can reorder the shortlist's tail but the exact
# re-rank restores the final top-k wherever the true neighbor made the
# shortlist — the standard recall/storage trade, here oracle-checked.

IVF_RERANK = 3  # shortlist size = IVF_RERANK * k candidates per query


@register(
    "sim_ann_ivf_int8",
    oracle=f"""
    WITH {_lloyd_oracle_ctes()},
    cent AS (SELECT * FROM cent{LLOYD_ITERS}),
    qc AS (
        SELECT vec_id, embedding AS cv,
               {_duck_quantize('embedding')} AS qv,
               list_max(list_transform(embedding,
                        y -> abs(CAST(y AS DOUBLE)))) / {QUANT_BITS_MAX} AS scale
        FROM embeddings WHERE vec_id >= {N_QUERIES}
    ),
    dq AS (
        SELECT vec_id, cv,
               list_transform(qv, x -> CAST(x AS DOUBLE) * scale) AS dv
        FROM qc
    ),
    assigned AS (
        SELECT vec_id, cv, dv, centroid_id FROM (
            SELECT d.vec_id, d.cv, d.dv, k.centroid_id,
                   ROW_NUMBER() OVER (
                       PARTITION BY d.vec_id
                       ORDER BY ROUND({duckdb_cosine('d.dv', 'k.centv')}, 6) DESC,
                                k.centroid_id) AS rn
            FROM dq d CROSS JOIN cent k
        ) WHERE rn = 1
    ),
    probes AS (
        SELECT query_id, quv, centroid_id FROM (
            SELECT q.vec_id AS query_id, q.embedding AS quv, k.centroid_id,
                   ROW_NUMBER() OVER (
                       PARTITION BY q.vec_id
                       ORDER BY ROUND({duckdb_cosine('q.embedding', 'k.centv')}, 6) DESC,
                                k.centroid_id) AS rn
            FROM embeddings q CROSS JOIN cent k
            WHERE q.vec_id < {N_QUERIES}
        ) WHERE rn <= {IVF_NPROBE}
    ),
    shortlist AS (
        SELECT query_id, quv, vec_id, cv FROM (
            SELECT p.query_id, p.quv, a.vec_id, a.cv,
                   ROW_NUMBER() OVER (
                       PARTITION BY p.query_id
                       ORDER BY ROUND({duckdb_cosine('p.quv', 'a.dv')}, 6) DESC,
                                a.vec_id) AS rn
            FROM probes p JOIN assigned a ON p.centroid_id = a.centroid_id
        ) WHERE rn <= {TOP_K * IVF_RERANK}
    )
    SELECT query_id, neighbor_id, cosine FROM (
        SELECT query_id, vec_id AS neighbor_id,
               ROUND({duckdb_cosine('quv', 'cv')}, 6) AS cosine,
               ROW_NUMBER() OVER (
                   PARTITION BY query_id
                   ORDER BY ROUND({duckdb_cosine('quv', 'cv')}, 6) DESC,
                            vec_id) AS rn
        FROM shortlist
    ) WHERE rn <= {TOP_K}
    """,
    tags=("X1",),
)
def sim_ann_ivf_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF over an int8-quantized index with exact re-rank (X1, the
    storage-lever composition): inverted lists hold symmetric-int8
    vectors (4× smaller — `sim_quantize_int8`), the Lloyd-learned
    codebook routes probes, candidates are scored on the DEQUANTIZED
    approximations, and only the {IVF_RERANK}·k shortlist per query is
    re-scored at full precision against the source embeddings — so the
    expensive full-precision vectors are touched for 15 rows per query,
    not nprobe/n_lists of the corpus. Every stage is deterministic
    (round() agrees on identical doubles across engines; rounded-score +
    id tie-breaks), so the whole composition is value-checked by the
    oracle, quantization noise included."""
    emb = load_table(spark, sf_dir, "embeddings")
    init = emb.filter(
        (F.col("vec_id") >= N_QUERIES) & (F.col("vec_id") % IVF_STRIDE == 5)
    ).select(F.col("vec_id").alias("centroid_id"), F.col("embedding").alias("centv"))
    corpus = emb.filter(F.col("vec_id") >= N_QUERIES).select(
        "vec_id", F.col("embedding").alias("cv")
    )
    queries = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("quv")
    )
    # sampled codebook learning — same scale-free-build rationale as
    # sim_ann_ivf; the int8 lists still index the FULL corpus
    sample = corpus.filter(F.expr(LLOYD_SAMPLE_SPARK))
    cent = lloyd_refine(sample, init).localCheckpoint(eager=True)

    # the quantized index: int8 vector + per-vector scale, dequantized view
    dq = corpus.select(
        "vec_id",
        "cv",
        F.expr(quantize_int8("cv")).alias("qv"),
        F.expr(
            f"array_max(transform(cv, y -> abs(CAST(y AS DOUBLE)))) "
            f"/ {QUANT_BITS_MAX}"
        ).alias("scale"),
    ).withColumn("dv", F.expr("transform(qv, x -> CAST(x AS DOUBLE) * scale)"))
    dq = _with_norm(dq, "dv", "dn")
    assigned = _nearest_centroids(
        dq.select("vec_id", "cv", "dv", "dn"), cent,
        vec="dv", key="vec_id", norm_col="dn", n=1,
    )
    probes = _nearest_centroids(
        _with_norm(queries, "quv", "qn"), cent,
        vec="quv", key="query_id", norm_col="qn", n=IVF_NPROBE,
    )
    approx = probes.join(assigned, "centroid_id").select(
        "query_id",
        "quv",
        "qn",
        "vec_id",
        "cv",
        F.round(
            F.try_divide(F.expr(spark_dot("quv", "dv")), F.col("qn") * F.col("dn")),
            6,
        ).alias("approx_cos"),
    )
    w_short = Window.partitionBy("query_id").orderBy(
        F.col("approx_cos").desc(), F.col("vec_id")
    )
    shortlist = (
        approx.withColumn("rn", F.row_number().over(w_short))
        .filter(F.col("rn") <= TOP_K * IVF_RERANK)
        .drop("rn", "approx_cos")
    )
    exact = shortlist.select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        F.round(
            F.try_divide(
                F.expr(spark_dot("quv", "cv")),
                F.col("qn") * F.expr(f"SQRT({spark_dot('cv', 'cv')})"),
            ),
            6,
        ).alias("cosine"),
    )
    return _topk_per_query(exact, TOP_K)


# --- Persisted IVF index under the value oracle (round 6) ------------------

from reactivestreams_kinesis_spark.queries.registry import REGISTRY  # noqa: E402

_IVF_ORACLE = REGISTRY["sim_ann_ivf"].oracle  # probe ≡ in-memory IVF


def _ensure_ivf_index(spark: SparkSession, sf_dir: str) -> str:
    """Build (once per fixture, content-fingerprinted cache) the persisted
    hive-partitioned IVF index over the embeddings corpus and return its
    directory. Same sampled-Lloyd codebook as ``sim_ann_ivf``; shared by
    the batch probe (`sim_ann_ivf_persisted`) and the streaming probe
    (`stream_ann_probe`) — one ingest job, many probe jobs."""
    import os

    from reactivestreams_kinesis_spark.operators.ann_index import build_ivf_index
    from reactivestreams_kinesis_spark.sources.text_formats import (
        fixture_cache_dir,
    )

    idx = fixture_cache_dir(sf_dir, "ivf_index", "embeddings")
    if not os.path.exists(idx + "__codebook"):
        emb = load_table(spark, sf_dir, "embeddings")
        corpus = emb.filter(F.col("vec_id") >= N_QUERIES).select(
            "vec_id", F.col("embedding").alias("cv")
        )
        init = emb.filter(
            (F.col("vec_id") >= N_QUERIES) & (F.col("vec_id") % IVF_STRIDE == 5)
        ).select(
            F.col("vec_id").alias("centroid_id"), F.col("embedding").alias("centv")
        )
        cent = lloyd_refine(
            corpus.filter(F.expr(LLOYD_SAMPLE_SPARK)), init
        ).localCheckpoint(eager=True)
        build_ivf_index(corpus, cent, idx)
    return idx


@register("sim_ann_ivf_persisted", oracle=_IVF_ORACLE, tags=("X1", "S5"))
def sim_ann_ivf_persisted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF probe over the PERSISTED index (X1 + the storage layout lever):
    the inverted lists live as a hive-partitioned parquet table
    (``operators/ann_index.py`` — one directory per Voronoi cell, probes
    become PartitionFilters directory pruning), built once per fixture
    into the content-fingerprinted cross-process cache and probed here.
    Same learned-codebook geometry as ``sim_ann_ivf``, so the SAME
    oracle: storage changes WHERE the lists live, never the answer — one
    wrong file in one cell directory breaks the hash. This is the query
    a production vector store actually serves (index built by an ingest
    job, probed by many)."""
    from reactivestreams_kinesis_spark.operators.ann_index import probe_ivf_index

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    idx = _ensure_ivf_index(spark, sf_dir)
    return probe_ivf_index(
        spark, idx, queries, k=TOP_K, nprobe=IVF_NPROBE
    )


@register("stream_ann_probe", oracle=_IVF_ORACLE, tags=("X1", "J8", "T1", "S5"))
def stream_ann_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING probe of the persisted IVF index (X1 × J8): query vectors
    arrive as a micro-batched stream (file replay, one file per trigger —
    the reference's demand-bounded pull, F1/F2) and each micro-batch is
    served by the same partition-pruned probe plan the batch path uses,
    via ``foreachBatch`` — the shape a production vector store runs when
    probe traffic is a queue, not a table. Per-batch top-k is globally
    correct because a query vector is ONE row, so every candidate for a
    given query_id lives in that query's own micro-batch (no cross-batch
    state needed — stateless serving, arbitrarily shardable). The drained
    union of all batches must hash-equal the one-shot in-memory IVF
    oracle: a dropped batch, double-served file, or wrong-cell probe
    breaks it. Scale: the streaming side is |queries|-proportional only;
    the index side reads nprobe directories per batch regardless of
    corpus size."""
    import os
    import tempfile
    import uuid

    from reactivestreams_kinesis_spark.operators.ann_index import probe_ivf_index
    from reactivestreams_kinesis_spark.sources.text_formats import (
        fixture_cache_dir,
    )

    idx = _ensure_ivf_index(spark, sf_dir)

    # stage the query vectors one-file-per-query so AvailableNow replays
    # them across several genuine micro-batches (cached per fixture)
    qdir = fixture_cache_dir(sf_dir, "ann_query_stream", "embeddings")
    if not os.path.exists(qdir):
        emb = load_table(spark, sf_dir, "embeddings")
        (
            emb.filter(F.col("vec_id") < N_QUERIES)
            .select(F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv"))
            .repartition(N_QUERIES, "query_id")
            .write.mode("overwrite")
            .parquet(qdir)
        )

    qschema = spark.read.parquet(qdir).schema
    stream = (
        spark.readStream.schema(qschema)
        .option("maxFilesPerTrigger", 1)
        .parquet(qdir)
    )

    run = uuid.uuid4().hex[:8]
    out = scratch_dir("rsk_ann_probe_out")
    ckpt = scratch_dir("rsk_ann_probe_ckpt")

    def _probe_batch(batch: DataFrame, _epoch: int) -> None:
        if batch.isEmpty():
            return
        probe_ivf_index(
            spark, idx, batch, k=TOP_K, nprobe=IVF_NPROBE
        ).write.mode("append").parquet(out)

    query = (
        stream.writeStream.foreachBatch(_probe_batch)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    if not query.awaitTermination(300):
        query.stop()
        raise TimeoutError("streaming ANN probe did not drain in 300s")
    return spark.read.parquet(out)
