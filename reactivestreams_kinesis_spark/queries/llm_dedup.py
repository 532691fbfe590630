"""Deduplication operators (SURVEY.md §2.10 X2, X3) — exact, n-gram
Jaccard, MinHash+LSH, and embedding-cosine near-dup.

All [MANDATE]. Design stance per SURVEY §7: deterministic seeded hashing
only (md5 — identical hex in Spark and DuckDB; engine-native ``hash()`` is
murmur-based and engine-specific, so it never appears in an oracle-checked
path).

Scale shapes:
- exact dedup: one hash-agg, scales with the scan;
- Jaccard verify: token self-join — skew on hot tokens handled by AQE skew
  join; at 100 TB the candidate set MUST come from LSH blocking first;
- MinHash+LSH: signatures are one explode + one agg; the band join turns
  O(n²) pair enumeration into O(candidates).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from reactivestreams_kinesis_spark.catalog import load_table
from reactivestreams_kinesis_spark.queries.registry import register

N_HASHES = 8
BAND_SIZE = 2
N_BANDS = N_HASHES // BAND_SIZE
JACCARD_THRESHOLD = 0.9


@register(
    "dedup_exact",
    oracle="""
    SELECT
        MD5(text)     AS content_hash,
        MIN(doc_id)   AS keep_doc_id,
        COUNT(*)      AS n_copies
    FROM documents
    GROUP BY MD5(text)
    """,
    tags=("X2",),
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact content dedup (X2): hash-groupBy on md5(text), keeping the
    smallest doc_id as the deterministic canonical representative.
    Equivalent to ``dropDuplicates(["text"])`` but with an explicit,
    stable keeper — at 100 TB the hash shuffles 16 bytes/row instead of
    the full text."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.groupBy(F.md5("text").alias("content_hash")).agg(
        F.min("doc_id").alias("keep_doc_id"),
        F.count(F.lit(1)).alias("n_copies"),
    )


_JACCARD_ORACLE = f"""
    WITH toks AS (
        SELECT doc_id, UNNEST(list_distinct(string_split(text, ' '))) AS tok
        FROM documents
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS sz FROM toks GROUP BY doc_id),
    inter AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_common
        FROM toks a JOIN toks b ON a.tok = b.tok AND a.doc_id < b.doc_id
        GROUP BY a.doc_id, b.doc_id
    )
    SELECT
        doc_a,
        doc_b,
        ROUND(n_common / (sa.sz + sb.sz - n_common * CAST(1 AS DOUBLE)), 6) AS jaccard
    FROM inter
    JOIN sizes sa ON doc_a = sa.doc_id
    JOIN sizes sb ON doc_b = sb.doc_id
    WHERE n_common / (sa.sz + sb.sz - n_common * CAST(1 AS DOUBLE)) >= {JACCARD_THRESHOLD}
"""


@register("dedup_jaccard_pairs", oracle=_JACCARD_ORACLE, tags=("X3",))
def dedup_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-set Jaccard near-dup pairs (X3 verify stage): inverted-index
    self-join on tokens → per-pair intersection counts → |A∩B| / |A∪B|.

    Only pairs sharing ≥1 token are ever materialized (inverted index, not
    a cross join). Hot tokens make the self-join skewed — AQE skew-join
    splits those; at 100 TB you'd also drop top-df tokens (they can't
    create high-Jaccard evidence alone) before joining.
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.explode(F.array_distinct(F.split("text", " "))).alias("tok")
    )
    sizes = toks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("sz"))
    a = toks.alias("a")
    b = toks.alias("b")
    inter = (
        a.join(b, (F.col("a.tok") == F.col("b.tok")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = sizes.alias("sa")
    sb = sizes.alias("sb")
    jac = F.col("n_common") / (
        F.col("sa.sz") + F.col("sb.sz") - F.col("n_common") * F.lit(1.0)
    )
    return (
        inter.join(sa, F.col("doc_a") == F.col("sa.doc_id"))
        .join(sb, F.col("doc_b") == F.col("sb.doc_id"))
        .filter(jac >= JACCARD_THRESHOLD)
        .select("doc_a", "doc_b", F.round(jac, 6).alias("jaccard"))
    )


def _band_exprs_sql() -> list[str]:
    """Band keys: concatenation of BAND_SIZE adjacent min-hashes.
    MIN over lexicographic md5 hex ≡ min-hash under a random permutation —
    portable across engines, no integer conversion needed."""
    out = []
    for band in range(N_BANDS):
        parts = " || ".join(
            f"MIN(CASE WHEN s = {band * BAND_SIZE + j} THEN h END)"
            for j in range(BAND_SIZE)
        )
        out.append(f"{parts} AS band{band}")
    return out


_MINHASH_ORACLE = f"""
    WITH toks AS (
        SELECT doc_id, UNNEST(list_distinct(string_split(text, ' '))) AS tok
        FROM documents
    ),
    hashes AS (
        SELECT doc_id, seeds.s AS s, MD5(CAST(seeds.s AS VARCHAR) || '_' || tok) AS h
        FROM toks, (SELECT UNNEST(RANGE({N_HASHES})) AS s) seeds
    ),
    sig AS (
        SELECT doc_id, {", ".join(_band_exprs_sql())}
        FROM hashes GROUP BY doc_id
    ),
    bands AS (
        {" UNION ALL ".join(f"SELECT doc_id, {b} AS bkey, band{b} AS bval FROM sig" for b in range(N_BANDS))}
    ),
    cand AS (
        SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
        FROM bands x JOIN bands y
          ON x.bkey = y.bkey AND x.bval = y.bval AND x.doc_id < y.doc_id
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS sz FROM toks GROUP BY doc_id),
    inter AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_common
        FROM toks a JOIN toks b ON a.tok = b.tok AND a.doc_id < b.doc_id
        GROUP BY a.doc_id, b.doc_id
    )
    SELECT
        c.doc_a,
        c.doc_b,
        ROUND(i.n_common / (sa.sz + sb.sz - i.n_common * CAST(1 AS DOUBLE)), 6) AS jaccard
    FROM cand c
    JOIN inter i ON c.doc_a = i.doc_a AND c.doc_b = i.doc_b
    JOIN sizes sa ON c.doc_a = sa.doc_id
    JOIN sizes sb ON c.doc_b = sb.doc_id
    WHERE i.n_common / (sa.sz + sb.sz - i.n_common * CAST(1 AS DOUBLE)) >= {JACCARD_THRESHOLD}
"""


@register("dedup_minhash_lsh", oracle=_MINHASH_ORACLE, tags=("X3",))
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash + LSH near-dup dedup (X3), the 100 TB path: shingle →
    {N_HASHES}-hash MinHash signature → {N_BANDS} bands of {BAND_SIZE} →
    band-bucket equi-join for candidates → exact Jaccard verify.

    The min-hash family is MIN over md5 hex of (seed || token) — a seeded,
    engine-portable permutation proxy (SURVEY §7 determinism rule). The
    band join replaces all-pairs enumeration: only bucket collisions become
    candidates, then the exact Jaccard filter removes LSH false positives.
    The verify join here reuses the inverted-index intersection, computed
    once and inner-joined to candidates.
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.explode(F.array_distinct(F.split("text", " "))).alias("tok")
    )
    seeds = spark.range(N_HASHES).select(F.col("id").cast("int").alias("s"))
    hashes = toks.crossJoin(F.broadcast(seeds)).select(
        "doc_id",
        "s",
        F.md5(F.concat_ws("_", F.col("s").cast("string"), F.col("tok"))).alias("h"),
    )
    sig = hashes.groupBy("doc_id").agg(
        *[F.expr(e) for e in _band_exprs_sql()]
    )
    bands = None
    for band in range(N_BANDS):
        part = sig.select(
            "doc_id", F.lit(band).alias("bkey"), F.col(f"band{band}").alias("bval")
        )
        bands = part if bands is None else bands.unionByName(part)
    x = bands.alias("x")
    y = bands.alias("y")
    cand = (
        x.join(
            y,
            (F.col("x.bkey") == F.col("y.bkey"))
            & (F.col("x.bval") == F.col("y.bval"))
            & (F.col("x.doc_id") < F.col("y.doc_id")),
        )
        .select(F.col("x.doc_id").alias("doc_a"), F.col("y.doc_id").alias("doc_b"))
        .distinct()
    )
    sizes = toks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("sz"))
    a = toks.alias("a")
    b = toks.alias("b")
    inter = (
        a.join(b, (F.col("a.tok") == F.col("b.tok")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = sizes.alias("sa")
    sb = sizes.alias("sb")
    jac = F.col("n_common") / (
        F.col("sa.sz") + F.col("sb.sz") - F.col("n_common") * F.lit(1.0)
    )
    return (
        cand.join(inter, ["doc_a", "doc_b"])
        .join(sa, F.col("doc_a") == F.col("sa.doc_id"))
        .join(sb, F.col("doc_b") == F.col("sb.doc_id"))
        .filter(jac >= JACCARD_THRESHOLD)
        .select("doc_a", "doc_b", F.round(jac, 6).alias("jaccard"))
    )


# Format docstring constants in at import time.
dedup_minhash_lsh.__doc__ = dedup_minhash_lsh.__doc__.replace(
    "{N_HASHES}", str(N_HASHES)
).replace("{N_BANDS}", str(N_BANDS)).replace("{BAND_SIZE}", str(BAND_SIZE))
