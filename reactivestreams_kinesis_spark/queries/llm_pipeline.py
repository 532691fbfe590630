"""Training-data pipeline operators beyond dedup/similarity (north-star
mandate): deterministic sampling, stratified sampling, train/val/test
splits, weighted corpus mixing, sequence packing, and table profiling.

Sampling policy: NEVER engine RNG (``rand()`` / TABLESAMPLE are
engine-specific and non-reproducible across runs at scale). Every sampling
decision is a pure function of the row's stable id via md5 — the same
technique production pipelines use so a re-run (or a different engine)
selects the identical sample. md5 hex is identical in Spark and DuckDB, so
all of these are oracle-checked exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from reactivestreams_kinesis_spark.catalog import load_table
from reactivestreams_kinesis_spark.queries.registry import register
from reactivestreams_kinesis_spark.session import persist_once

# first two md5 hex chars of the doc id: uniform over 256 buckets
_BUCKET = "SUBSTRING(MD5(CAST(doc_id AS STRING)), 1, 2)"


@register(
    "sample_hash",
    oracle=f"""
    SELECT 'global' AS variant, doc_id, lang
    FROM documents
    WHERE {_BUCKET} <= '19'
    UNION ALL
    SELECT 'stratified' AS variant, doc_id, lang
    FROM (
        SELECT doc_id, lang,
               ROW_NUMBER() OVER (
                   PARTITION BY lang
                   ORDER BY MD5(CAST(doc_id AS STRING)), doc_id) AS rn
        FROM documents
    ) WHERE rn <= 20
    """,
    tags=("X-pipeline", "W4"),
)
def sample_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic sampling, both flavors, variant-tagged:

    - ``global``: ~10% sample (hex buckets 00-19 = 26/256 ≈ 10.2%) — a
      pure row-local filter: no shuffle, no state, reproducible on any
      engine and any rerun, composable with incremental ingestion (new
      rows sample themselves);
    - ``stratified``: exactly 20 docs per language, chosen by md5 order
      (a deterministic shuffle) — the per-class balanced subset pattern
      for eval-set construction. W4 top-k-per-group shape →
      WindowGroupLimit keeps 20 rows per class per task.
    """
    docs = load_table(spark, sf_dir, "documents")
    g = docs.filter(F.expr(f"{_BUCKET} <= '19'")).select(
        F.lit("global").alias("variant"), "doc_id", "lang"
    )
    w = Window.partitionBy("lang").orderBy(
        F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
    )
    s = (
        docs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 20)
        .select(F.lit("stratified").alias("variant"), "doc_id", "lang")
    )
    return g.unionByName(s)


@register(
    "split_train_val_test",
    oracle=f"""
    SELECT
        split,
        COUNT(*) AS n_docs,
        CAST(ROUND(SUM(CAST(n_chars AS DECIMAL(18,0))), 0) AS BIGINT) AS total_chars
    FROM (
        SELECT
            n_chars,
            CASE WHEN {_BUCKET} < 'c0' THEN 'train'
                 WHEN {_BUCKET} < 'e0' THEN 'val'
                 ELSE 'test' END AS split
        FROM documents
    )
    GROUP BY split
    """,
    tags=("X-pipeline",),
)
def split_train_val_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/val/test split (75/12.5/12.5 by hex range): hash-of-id
    assignment means a document NEVER migrates between splits as the
    corpus grows — the leakage-safe split every training pipeline needs.
    Output is per-split stats; the row-level assignment is the inner
    SELECT."""
    docs = load_table(spark, sf_dir, "documents")
    split = F.expr(
        f"CASE WHEN {_BUCKET} < 'c0' THEN 'train' "
        f"WHEN {_BUCKET} < 'e0' THEN 'val' ELSE 'test' END"
    )
    return (
        docs.select(F.col("n_chars"), split.alias("split"))
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.expr(
                "CAST(ROUND(SUM(CAST(n_chars AS DECIMAL(18,0))), 0) AS BIGINT)"
            ).alias("total_chars"),
        )
    )


@register(
    "mix_corpora",
    oracle=f"""
    SELECT source, COUNT(*) AS n_sampled
    FROM documents
    WHERE {_BUCKET} < CASE source
        WHEN 'src0' THEN 'ff'   -- keep ~100%
        WHEN 'src1' THEN '80'   -- keep ~50%
        WHEN 'src2' THEN '40'   -- keep ~25%
        ELSE '1a'               -- keep ~10%
    END
    GROUP BY source
    """,
    tags=("X-pipeline",),
)
def mix_corpora(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted corpus mixing: per-source deterministic sampling rates —
    the up/down-weighting step that turns raw crawls into a training mix.
    One filter, no shuffle; rates are data-independent so the mix is
    stable under corpus growth."""
    docs = load_table(spark, sf_dir, "documents")
    keep = F.expr(
        f"{_BUCKET} < CASE source "
        "WHEN 'src0' THEN 'ff' WHEN 'src1' THEN '80' "
        "WHEN 'src2' THEN '40' ELSE '1a' END"
    )
    return (
        docs.filter(keep)
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_sampled"))
    )


_CTX = 4096  # tokens per packed sequence
_PACK_SHARD = 512  # documents per packing shard (doc_id range partition)
# pack ids are globally unique: shard * _PACKS_PER_SHARD + within-shard index.
# The within-shard index is floor(prior_tokens / _CTX), so it stays below
# _PACKS_PER_SHARD as long as a shard's token mass < _PACKS_PER_SHARD * _CTX
# (4M tokens per 512-doc shard ⇒ avg doc ≤ 8K tokens — raise the multiplier
# for long-document corpora).
_PACKS_PER_SHARD = 1024


def pack_assignments(
    sized: DataFrame,
    *,
    id_col: str = "doc_id",
    tokens_col: str = "n_tokens",
    ctx: int = _CTX,
    shard_size: int = _PACK_SHARD,
    packs_per_shard: int = _PACKS_PER_SHARD,
) -> DataFrame:
    """Fixed-budget sequence packing over any (id, token-count) table —
    the reusable, knob-exposed form of ``pack_sequences``. Documents are
    assigned to ``ctx``-token bins by exclusive running token count within
    ``shard_size``-wide id-range shards; pack ids are globally unique as
    ``shard * packs_per_shard + floor(prior_tokens / ctx)``.

    Sharding is the scale contract: each shard's running sum is an
    independent window partition (parallel tasks, no single-task global
    sort) at the cost of ≤1 underfull pack per shard. Size
    ``packs_per_shard`` so a shard's token mass stays below
    ``packs_per_shard * ctx`` — the id-uniqueness bound documented at the
    registered query.

    Raises (at execution, executor-side) if any within-shard pack index
    reaches ``packs_per_shard``: such an index would overflow into the
    next shard's id space and silently collide, so the bound is enforced
    in-plan — a row-local comparison, no extra shuffle or action.
    """
    w = (
        Window.partitionBy("shard")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    idx = F.floor(
        F.coalesce(F.sum(tokens_col).over(w), F.lit(0)) / float(ctx)
    ).cast("bigint")
    guarded_idx = F.when(idx < packs_per_shard, idx).otherwise(
        F.raise_error(
            F.format_string(
                "pack index %s >= packs_per_shard "
                f"{packs_per_shard}: shard token mass exceeds "
                f"packs_per_shard * ctx = {packs_per_shard * ctx}; raise "
                "packs_per_shard for long-document corpora",
                idx.cast("string"),
            )
        ).cast("bigint")
    )
    return sized.withColumn(
        "shard", F.floor(F.col(id_col) / shard_size).cast("bigint")
    ).select(
        id_col,
        tokens_col,
        (F.col("shard") * packs_per_shard + guarded_idx).alias("pack_id"),
    )


@register(
    "pack_sequences",
    oracle=f"""
    WITH sized AS (
        SELECT doc_id, CAST(FLOOR(doc_id / {_PACK_SHARD}) AS BIGINT) AS shard,
               LEN(string_split(text, ' ')) AS n_tokens
        FROM documents
    ),
    cum AS (
        SELECT doc_id, shard, n_tokens,
               SUM(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prior_tokens
        FROM sized
    )
    SELECT
        doc_id,
        CAST(n_tokens AS INT) AS n_tokens,
        shard * {_PACKS_PER_SHARD}
            + CAST(FLOOR(COALESCE(prior_tokens, 0) / ({_CTX} * 1.0)) AS BIGINT)
            AS pack_id
    FROM cum
    """,
    tags=("X-pipeline", "W3"),
)
def pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing: assign documents to fixed-budget training bins
    ({_CTX} tokens) by exclusive running token count — the batch-packing
    step before tokenized examples are written.

    Sharded for scale: documents partition into doc_id ranges of
    {_PACK_SHARD} and each shard packs independently (PARTITION BY shard
    running sum → parallel window tasks, no single-task global sort; a
    plan test asserts no SinglePartition exchange). Cost: ≤1 underfull
    pack per shard — negligible against shard token mass. Pack ids stay
    globally unique via shard * {_PACKS_PER_SHARD} + within-shard index.
    """
    docs = load_table(spark, sf_dir, "documents")
    sized = docs.select(
        "doc_id", F.size(F.split("text", " ")).alias("n_tokens")
    )
    return pack_assignments(sized)


pack_sequences.__doc__ = (
    pack_sequences.__doc__.replace("{_CTX}", str(_CTX))
    .replace("{_PACK_SHARD}", str(_PACK_SHARD))
    .replace("{_PACKS_PER_SHARD}", str(_PACKS_PER_SHARD))
)


@register(
    "profile_table",
    oracle="""
    SELECT 'l_quantity' AS column_name, COUNT(*) AS n_rows,
           COUNT(*) - COUNT(l_quantity) AS n_nulls,
           COUNT(DISTINCT l_quantity) AS n_distinct,
           MIN(l_quantity) AS min_val, MAX(l_quantity) AS max_val
    FROM lineitem
    UNION ALL
    SELECT 'l_discount', COUNT(*), COUNT(*) - COUNT(l_discount),
           COUNT(DISTINCT l_discount), MIN(l_discount), MAX(l_discount)
    FROM lineitem
    UNION ALL
    SELECT 'l_tax', COUNT(*), COUNT(*) - COUNT(l_tax),
           COUNT(DISTINCT l_tax), MIN(l_tax), MAX(l_tax)
    FROM lineitem
    """,
    tags=("X-pipeline", "A6"),
)
def profile_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column profiling (describe-style data-quality pass): per-column
    row/null/distinct counts and min/max. ONE global aggregate computes
    every column's metrics in a single scan (a union of per-column
    aggregates would re-scan the table once per profiled column — at
    100 TB that multiplies the whole job by the column count), then
    ``stack`` pivots the one wide row into the long-format report —
    driver-side-free, 3 rows. The multiple countDistincts plan as one
    Expand + single shuffle of distinct values, not extra scans."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    cols = ["l_quantity", "l_discount", "l_tax"]
    aggs = []
    for c in cols:
        aggs += [
            F.count(F.lit(1)).alias(f"n_{c}"),
            (F.count(F.lit(1)) - F.count(c)).alias(f"nulls_{c}"),
            F.countDistinct(c).alias(f"nd_{c}"),
            F.min(c).alias(f"min_{c}"),
            F.max(c).alias(f"max_{c}"),
        ]
    wide = lineitem.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', n_{c}, nulls_{c}, nd_{c}, min_{c}, max_{c}" for c in cols
    )
    return wide.select(
        F.expr(
            f"stack({len(cols)}, {stack_args}) AS "
            "(column_name, n_rows, n_nulls, n_distinct, min_val, max_val)"
        )
    )


from reactivestreams_kinesis_spark.queries.llm_dedup import (  # noqa: E402
    _DUCK_SHINGLES,
    minhash_pairs_ctes,
)
from reactivestreams_kinesis_spark.queries.llm_text import _STOP_IN  # noqa: E402

# Stage chain shares its building blocks with the standalone operators:
# shingles + the whole MinHash/LSH verify CTE list from llm_dedup,
# stopwords from llm_text, hash bucket from this module — one definition
# each, so the stages cannot drift from the operators they compose.
_PIPELINE_ORACLE = f"""
    WITH quality AS (
        SELECT doc_id, lang, text,
               LEN(string_split(text, ' ')) AS n_tokens
        FROM documents
        WHERE LEN(string_split(text, ' ')) >= 30
          AND LEN(list_filter(string_split(text, ' '), x -> x IN {_STOP_IN}))
              / (LEN(string_split(text, ' ')) * CAST(1 AS DOUBLE)) < 0.5
    ),
    exact_kept AS (
        SELECT MIN(doc_id) AS doc_id FROM quality GROUP BY MD5(text)
    ),
    kept AS (
        SELECT q.doc_id, q.lang, q.text, q.n_tokens
        FROM quality q JOIN exact_kept e ON q.doc_id = e.doc_id
    ),
    toks_raw AS (
        SELECT doc_id, UNNEST({_DUCK_SHINGLES}) AS tok
        FROM kept
    ),
    {minhash_pairs_ctes()},
    near_dup_losers AS (
        SELECT DISTINCT doc_b AS doc_id FROM lsh_pairs
    ),
    survivors AS (
        SELECT k.doc_id, k.lang, k.n_tokens
        FROM kept k
        WHERE k.doc_id NOT IN (SELECT doc_id FROM near_dup_losers)
          AND {_BUCKET} < '80'
    )
    SELECT lang, COUNT(*) AS n_docs, CAST(SUM(n_tokens) AS BIGINT) AS total_tokens
    FROM survivors
    GROUP BY lang
"""


@register(
    "pipeline_end_to_end",
    oracle=_PIPELINE_ORACLE,
    tags=("X2", "X3", "X4", "X-pipeline"),
    bench=True,
)
def pipeline_end_to_end(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full curation chain as ONE composed plan — what a user of this
    engine actually runs: quality filter (token count + stopword ratio) →
    exact dedup (md5, keep min id) → near-dup removal over the SURVIVORS
    of the previous stages (MinHash+LSH candidates → exact trigram Jaccard
    ≥ threshold on candidates only; greedy keep-lowest-id: the higher id
    of each pair is dropped — the one-pass approximation of component
    clustering, deterministic in both engines) → deterministic 50% hash
    sample → per-language corpus stats.

    Stage ordering matters and is the point: the shingle work (the only
    heavy exchange) runs on the quality+exact survivors, not the raw
    corpus — cheaper AND correct (a rejected document must not knock out a
    good near-duplicate). The near-dup stage is the CANDIDATE-BOUNDED
    MinHash path, not exhaustive Jaccard: round-3 scale-ladder measurement
    (BASELINE.md) showed the exhaustive self-join grows with Σ df² —
    quadratic in corpus size whenever shingle document frequency scales
    with the corpus — while band collisions keep this plan near-linear.
    All stage logic is shared with the standalone operators via the
    imported constants and CTE builders.
    """
    from reactivestreams_kinesis_spark.queries.llm_dedup import (
        _SPARK_SHINGLES,
        minhash_lsh_pairs,
    )

    docs = load_table(spark, sf_dir, "documents")
    toks_expr = "split(text, ' ')"
    quality = docs.withColumn("n_tokens", F.expr(f"size({toks_expr})")).filter(
        (F.col("n_tokens") >= 30)
        & (
            F.expr(f"size(filter({toks_expr}, x -> x IN {_STOP_IN}))")
            / (F.col("n_tokens") * F.lit(1.0))
            < 0.5
        )
    )
    exact_kept = quality.groupBy(F.md5("text").alias("h")).agg(
        F.min("doc_id").alias("doc_id")
    )
    # `kept` fans out to the shingle postings AND the final survivor
    # anti-join; persist so quality-filter + exact-dedup run once, not per
    # consumer (each recompute would re-scan the corpus).
    kept = persist_once(quality.join(exact_kept.select("doc_id"), "doc_id", "left_semi"))
    postings = kept.withColumn("toks", F.split("text", " ")).select(
        "doc_id", F.explode(F.expr(_SPARK_SHINGLES)).alias("tok")
    )
    near_losers = (
        minhash_lsh_pairs(persist_once(postings))
        .select(F.col("doc_b").alias("doc_id"))
        .distinct()
    )
    survivors = kept.join(near_losers, "doc_id", "left_anti").filter(
        F.expr(f"{_BUCKET} < '80'")
    )
    return survivors.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("total_tokens"),
    )


# --- Benchmark decontamination (n-gram overlap vs an eval set) -------------
#
# The standard pre-training hygiene step: drop every training document that
# shares an n-gram with the evaluation/benchmark set (GPT-3 used 13-grams;
# n is a knob here, fixture docs are short so the registered query uses 5).
# The eval set is derived deterministically from the corpus so the oracle
# can reproduce it; in production it would be a separate tiny table. The
# id-range bound makes it FIXED-SIZE (≤5 docs at every SF tier) — a
# benchmark set does not grow with the training corpus, and that
# boundedness is what licenses the broadcast pin in `decontaminate`; an
# unbounded `doc_id % 97` split would scale with SF and turn the pin into
# an executor-OOM hazard at 100 TB.

DECONTAM_N = 5  # n-gram width
_EVAL_PRED = "doc_id % 97 = 69 AND doc_id < 485"


def _spark_ngrams(n: int) -> str:
    """Distinct word n-grams over a pre-split `toks` column. The <n-token
    guard matters: Spark's sequence() counts DOWN when the end < start and
    slice/concat then misbehaves — short docs must yield an empty set, as
    DuckDB's descending range() does natively."""
    return (
        f"if(size(toks) < {n}, array(), "
        f"array_distinct(transform(sequence(1, size(toks) - {n - 1}), "
        f"i -> concat_ws(' ', slice(toks, i, {n})))))"
    )


def _duck_ngrams(n: int) -> str:
    return (
        f"list_distinct(list_transform("
        f"range(1, len(string_split(text, ' ')) - {n - 2}), "
        f"i -> array_to_string(list_slice(string_split(text, ' '), i, i + {n - 1}), ' ')))"
    )


def decontaminate(
    corpus_grams: DataFrame,
    eval_grams: DataFrame,
    *,
    min_shared: int = 1,
    broadcast_eval: bool = True,
) -> DataFrame:
    """Contamination report from two (doc_id, gram) posting sets: corpus
    documents sharing >= min_shared distinct n-grams with the eval set.
    With ``broadcast_eval`` (default) the eval side is pinned broadcast —
    correct ONLY for a genuinely bounded benchmark set (the production
    case, and the registered query's fixed id-range split): the corpus
    then never shuffles until the per-doc count aggregation, which only
    sees matched rows. Pass ``broadcast_eval=False`` when the eval side
    scales with the data (e.g. a held-out corpus fraction) so AQE's
    size-based planner chooses the join strategy instead of the pin.
    Anti-join the result against the corpus to get the clean training
    set."""
    eval_side = eval_grams.select("gram").distinct()
    if broadcast_eval:
        eval_side = F.broadcast(eval_side)
    hits = corpus_grams.join(eval_side, "gram", "left_semi")
    return (
        hits.groupBy("doc_id")
        .agg(F.countDistinct("gram").alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )


@register(
    "decontaminate_ngram",
    oracle=f"""
    WITH eval_grams AS (
        SELECT DISTINCT UNNEST({_duck_ngrams(DECONTAM_N)}) AS gram
        FROM documents WHERE {_EVAL_PRED}
    ),
    corpus_grams AS (
        SELECT doc_id, UNNEST({_duck_ngrams(DECONTAM_N)}) AS gram
        FROM documents WHERE NOT ({_EVAL_PRED})
    )
    SELECT doc_id, COUNT(DISTINCT c.gram) AS n_shared
    FROM corpus_grams c
    JOIN eval_grams e ON c.gram = e.gram
    GROUP BY doc_id
    """,
    tags=("X3", "J3"),
)
def decontaminate_ngram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination (training-pipeline mandate): corpus
    documents contaminated by {DECONTAM_N}-gram overlap with the eval
    split — the GPT-3/PaLM-style hygiene filter. Scale shape: the eval
    gram set is tiny and broadcast; the corpus side is a narrow
    map (tokenize → n-grams → explode) with the semi-join applied
    before the only aggregation, so nothing corpus-sized ever
    shuffles. Knobs (n, min_shared) live on ``decontaminate`` /
    ``_spark_ngrams``."""
    docs = load_table(spark, sf_dir, "documents")
    eval_docs = docs.filter(F.expr(_EVAL_PRED))
    corpus = docs.filter(~F.expr(_EVAL_PRED))

    def grams(df):
        return df.withColumn("toks", F.split("text", " ")).select(
            "doc_id", F.explode(F.expr(_spark_ngrams(DECONTAM_N))).alias("gram")
        )

    return decontaminate(grams(corpus), grams(eval_docs))


# --- Bloom-prefiltered decontamination -------------------------------------
#
# The same contamination answer as `decontaminate_ngram`, computed the way
# a 100 TB pipeline would: the eval gram set is compiled into a Bloom
# filter bitmap (k seeded xxhash64 positions over m bits), the corpus gram
# stream is screened against the bitmap as a PURE MAP (k hashes + k array
# lookups per gram, whole-stage-codegen, no join, no shuffle), and only
# the surviving ~FP-rate fraction reaches the exact semi-join that removes
# Bloom false positives. False negatives are impossible (every eval gram's
# bits are set), so the output is bit-identical to the exact path and the
# oracle is the SAME exact SQL.
#
# Why this beats the plain broadcast semi-join at scale: a broadcast hash
# join still pays a per-row probe into a hash relation sized by the FULL
# eval gram set inside the join operator, and — more importantly — the
# pattern generalizes to eval sets too big to broadcast-join cheaply: the
# bitmap is m/8 bytes regardless of gram count (here 16 KiB), the cheapest
# possible broadcast. Spark's own runtime row-level filtering
# (spark.sql.optimizer.runtime.bloomFilter) applies the identical idea to
# shuffle joins; this is the explicit, tunable form.

BLOOM_M_BITS = 1 << 17  # 16 KiB bitmap; sized for ~500 eval grams -> FP ~1e-9
BLOOM_K = 5  # hash functions


def bloom_build(grams: DataFrame, *, m_bits: int = BLOOM_M_BITS,
                k: int = BLOOM_K, gram_col: str = "gram") -> list[int]:
    """Compile a (bounded) gram set into a Bloom bitmap: k seeded xxhash64
    positions per gram, OR-ed into m_bits bits packed as m/64 signed int64
    words (Spark LongType two's complement — the probe expression uses the
    same signed shiftleft, so bit 63 round-trips). The collect() is
    licensed by the same boundedness argument as the eval-side broadcast
    pin in `decontaminate`: a benchmark set does not scale with the
    corpus. Distinct positions first, so the driver pulls ≤ k·|grams|
    ints, not the gram strings."""
    _validate_bloom_params(m_bits, k)
    positions = (
        grams.select(
            F.explode(
                F.expr(
                    f"transform(sequence(0, {k - 1}), "
                    f"i -> pmod(xxhash64({gram_col}, i), {m_bits}))"
                )
            ).alias("pos")
        )
        .distinct()
        .collect()
    )
    words = [0] * (m_bits // 64)
    for row in positions:
        p = row["pos"]
        words[p >> 6] |= 1 << (p & 63)
    return [w - (1 << 64) if w >= (1 << 63) else w for w in words]


def _validate_bloom_params(m_bits: int, k: int) -> None:
    """Both ends of the Bloom contract hash positions in [0, m_bits) into
    m_bits//64 words; a non-multiple-of-64 m_bits makes the top partial
    word unreachable — IndexError at build time, or an out-of-range
    element_at at probe time (ANSI error on Spark 4; silent false negative
    under non-ANSI, defeating the no-false-negative contract). Fail fast
    in BOTH entry points instead."""
    if m_bits <= 0 or m_bits % 64 != 0:
        raise ValueError(f"m_bits must be a positive multiple of 64, got {m_bits}")
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")


def bloom_maybe_contains(bitmap_col: str, gram_col: str, *,
                         m_bits: int = BLOOM_M_BITS, k: int = BLOOM_K):
    """Membership-screen expression over a bitmap array<bigint> column:
    true iff all k seeded positions of the gram are set. Pure codegen —
    the Bloom screen never leaves the JVM expression pipeline."""
    _validate_bloom_params(m_bits, k)
    return F.expr(
        f"forall(transform(sequence(0, {k - 1}), "
        f"i -> pmod(xxhash64({gram_col}, i), {m_bits})), "
        f"p -> (element_at({bitmap_col}, CAST(p DIV 64 AS INT) + 1) "
        f"& shiftleft(CAST(1 AS BIGINT), CAST(p % 64 AS INT))) != 0)"
    )


@register(
    "decontaminate_bloom",
    oracle=f"""
    WITH eval_grams AS (
        SELECT DISTINCT UNNEST({_duck_ngrams(DECONTAM_N)}) AS gram
        FROM documents WHERE {_EVAL_PRED}
    ),
    corpus_grams AS (
        SELECT doc_id, UNNEST({_duck_ngrams(DECONTAM_N)}) AS gram
        FROM documents WHERE NOT ({_EVAL_PRED})
    )
    SELECT doc_id, COUNT(DISTINCT c.gram) AS n_shared
    FROM corpus_grams c
    JOIN eval_grams e ON c.gram = e.gram
    GROUP BY doc_id
    """,
    tags=("X3", "J3"),
)
def decontaminate_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-prefiltered benchmark decontamination: identical answer to
    ``decontaminate_ngram`` (the oracle is the SAME exact SQL — Bloom
    false positives are removed by the exact semi-join, false negatives
    cannot exist), but the corpus gram stream is screened map-side
    against a 16 KiB bitmap before any join. Scale shape: corpus side is
    scan → tokenize → explode → k-hash bitmap probe (all codegen) —
    ~100% of grams die in the map with zero shuffle; only Bloom
    survivors reach the exact verify."""
    docs = load_table(spark, sf_dir, "documents")
    eval_docs = docs.filter(F.expr(_EVAL_PRED))
    corpus = docs.filter(~F.expr(_EVAL_PRED))

    def grams(df):
        return df.withColumn("toks", F.split("text", " ")).select(
            "doc_id", F.explode(F.expr(_spark_ngrams(DECONTAM_N))).alias("gram")
        )

    eval_grams = grams(eval_docs)
    bitmap = bloom_build(eval_grams)
    candidates = (
        grams(corpus)
        .withColumn("__bloom", F.lit(bitmap))
        .filter(bloom_maybe_contains("__bloom", "gram"))
        .drop("__bloom")
    )
    return decontaminate(candidates, eval_grams)


# --- Repetition signals (Gopher-style quality filter) ----------------------


@register(
    "text_repetition",
    oracle=f"""
    WITH grams AS (
        SELECT doc_id, UNNEST(list_transform(
            range(1, len(string_split(text, ' '))),
            i -> array_to_string(list_slice(string_split(text, ' '), i, i + 1), ' ')
        )) AS gram
        FROM documents
    ),
    gram_counts AS (
        SELECT doc_id, gram, COUNT(*) AS c
        FROM grams GROUP BY doc_id, gram
    ),
    per_doc AS (
        SELECT doc_id,
               CAST(SUM(c) AS BIGINT) AS n_bigrams,
               CAST(MAX(c) AS BIGINT) AS top_bigram_count,
               CAST(COUNT(*) AS BIGINT) AS n_distinct_bigrams
        FROM gram_counts GROUP BY doc_id
    )
    SELECT doc_id,
           n_bigrams,
           top_bigram_count,
           ROUND(top_bigram_count / (n_bigrams * 1.0), 6) AS top_bigram_ratio,
           ROUND(1.0 - n_distinct_bigrams / (n_bigrams * 1.0), 6) AS dup_bigram_ratio,
           top_bigram_count / (n_bigrams * 1.0) > 0.1 AS repetitive
    FROM per_doc
    """,
    tags=("X4",),
)
def text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repetition-ratio quality signals (X4, Gopher-style): per-document
    bigram statistics — most-frequent-bigram share and duplicate-bigram
    mass — flagging looping/boilerplate text that length and stopword
    heuristics miss. Scale shape: explode → two hash aggregations keyed by
    doc_id (map-side partial combine does most of the work since a
    document's bigrams co-locate in the scan); nothing joins, nothing
    broadcasts, linear in corpus size."""
    docs = load_table(spark, sf_dir, "documents")
    grams = docs.withColumn("toks", F.split("text", " ")).select(
        "doc_id",
        F.explode(
            # <2-token guard: Spark's sequence(1, 0) counts DOWN and slice
            # then throws on index 0 — single-token docs must yield an
            # empty bigram set, as DuckDB's descending range() does.
            F.expr(
                "if(size(toks) < 2, array(), "
                "transform(sequence(1, size(toks) - 1), "
                "i -> concat_ws(' ', slice(toks, i, 2))))"
            )
        ).alias("gram"),
    )
    per_doc = (
        grams.groupBy("doc_id", "gram")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("doc_id")
        .agg(
            F.sum("c").cast("bigint").alias("n_bigrams"),
            F.max("c").cast("bigint").alias("top_bigram_count"),
            F.count(F.lit(1)).cast("bigint").alias("n_distinct_bigrams"),
        )
    )
    ratio = F.col("top_bigram_count") / (F.col("n_bigrams") * F.lit(1.0))
    return per_doc.select(
        "doc_id",
        "n_bigrams",
        "top_bigram_count",
        F.round(ratio, 6).alias("top_bigram_ratio"),
        F.round(
            F.lit(1.0) - F.col("n_distinct_bigrams") / (F.col("n_bigrams") * F.lit(1.0)),
            6,
        ).alias("dup_bigram_ratio"),
        (ratio > 0.1).alias("repetitive"),
    )


# --- deterministic weighted sampling (priority sampling) --------------------

_MD5_U32 = "SUBSTRING(MD5(CAST(doc_id AS STRING)), 1, 8)"
SAMPLE_WEIGHTED_K = 20


@register(
    "sample_weighted",
    oracle=f"""
    SELECT lang, doc_id, priority FROM (
        SELECT lang, doc_id,
               ROUND(CAST(n_chars AS DOUBLE) /
                     ((CAST(('0x' || {_MD5_U32}) AS UBIGINT) + 0.5) / 4294967296.0),
                     6) AS priority,
               ROW_NUMBER() OVER (
                   PARTITION BY lang
                   ORDER BY CAST(n_chars AS DOUBLE) /
                            ((CAST(('0x' || {_MD5_U32}) AS UBIGINT) + 0.5) / 4294967296.0)
                            DESC, doc_id) AS rn
        FROM documents
    ) WHERE rn <= {SAMPLE_WEIGHTED_K}
    """,
    tags=("X-pipeline", "W4"),
)
def sample_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic WEIGHTED sampling — priority sampling (Duffield,
    Lund & Thorup): each doc draws u ∈ (0,1) from md5(doc_id) (first 8
    hex chars → uniform 32-bit int, +0.5, /2³²), gets priority w/u with
    w = n_chars, and the top-{SAMPLE_WEIGHTED_K} priorities per language
    are the sample — inclusion probability ∝ weight (length-proportional
    here: the token-budget-weighted corpus subset), with the estimator
    guarantees of the DLT scheme. Complements ``sample_hash``'s two
    uniform flavors; same seeded-hash determinism (no engine RNG, new
    rows sample themselves, reruns agree).

    Numeric portability is why this is PRIORITY sampling and not the
    Efraimidis–Spirakis u^(1/w) exponential scheme: every step here —
    hex→int, +0.5, divide by 2³² (a power of two), one final division —
    is IEEE-exact or correctly-rounded identically in Spark and DuckDB,
    whereas pow()/ln() may differ by an ulp between libm builds and flip
    a rank at the cut. W4 shape: one WindowGroupLimit keeps
    {SAMPLE_WEIGHTED_K} rows per language per task before the tiny final
    exchange."""
    docs = load_table(spark, sf_dir, "documents")
    u = (
        F.expr(f"CAST(CONV({_MD5_U32}, 16, 10) AS DOUBLE)") + F.lit(0.5)
    ) / F.lit(4294967296.0)
    priority = F.col("n_chars").cast("double") / u
    w = Window.partitionBy("lang").orderBy(priority.desc(), F.col("doc_id"))
    return (
        docs.withColumn("priority", F.round(priority, 6))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= SAMPLE_WEIGHTED_K)
        .select("lang", "doc_id", "priority")
    )
