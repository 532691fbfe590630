"""Text-analysis operators for LLM data pipelines (SURVEY.md §2.10 X4).

All [MANDATE] — the reference's payloads are opaque blobs; these operators
give the engine a native text-processing surface: token statistics, quality
scoring, language-ID heuristics, TF-IDF keyword extraction, and SimHash
fingerprinting. Everything is built-in expressions (split / higher-order
functions / md5) — no Python in the row path, so the whole family rides
WholeStageCodegen and scales with the scan.

Portability: scalar fragments (md5 nibbles, stopword membership, log-idf)
are generated once and shared between the Spark plan and the DuckDB oracle
where syntax allows; engine-specific list functions (``filter`` vs
``list_filter``) keep identical math.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from reactivestreams_kinesis_spark.catalog import load_table
from reactivestreams_kinesis_spark.queries.registry import register
from reactivestreams_kinesis_spark.session import persist_once

STOPWORDS = ("the", "a", "of", "and", "to", "in", "is")
_STOP_IN = "(" + ", ".join(f"'{w}'" for w in STOPWORDS) + ")"


_LANG_MARKERS = {
    "de": ("der", "die", "und", "nicht"),
    "en": ("the", "a", "of", "and"),
    "es": ("el", "los", "y", "que"),
    "fr": ("le", "la", "et", "les"),
    "zh": ("de5", "shi4", "le5", "zai4"),  # pinyin-ish placeholders
}


_LANG_CASE = """
    CASE
        WHEN s_en >= GREATEST(s_de, s_es, s_fr, s_zh) THEN 'en'
        WHEN s_de >= GREATEST(s_es, s_fr, s_zh) THEN 'de'
        WHEN s_es >= GREATEST(s_fr, s_zh) THEN 'es'
        WHEN s_fr >= s_zh THEN 'fr'
        ELSE 'zh'
    END
"""

_DUCK_LANG_SCORES = ", ".join(
    "LEN(list_filter(string_split(text, ' '), x -> x IN ("
    + ", ".join(f"'{w}'" for w in _LANG_MARKERS[lg])
    + f"))) AS s_{lg}"
    for lg in sorted(_LANG_MARKERS)
)


@register(
    "text_stats",
    oracle=f"""
    WITH t AS (
        SELECT
            doc_id,
            lang,
            n_chars,
            text,
            LEN(string_split(text, ' '))                                    AS n_tokens,
            LEN(list_filter(string_split(text, ' '), x -> x IN {_STOP_IN})) AS n_stop,
            LEN(list_distinct(string_split(text, ' ')))                     AS n_distinct,
            {_DUCK_LANG_SCORES}
        FROM documents
    )
    SELECT
        doc_id,
        lang,
        n_chars,
        CAST(n_tokens AS INT)    AS n_tokens,
        CAST(n_distinct AS INT)  AS n_distinct_tokens,
        ROUND((LENGTH(text) - n_tokens + 1.0) / n_tokens, 6) AS avg_token_len,
        ROUND(n_stop / (n_tokens * 1.0), 6)     AS stopword_ratio,
        ROUND(n_distinct / (n_tokens * 1.0), 6) AS ttr,
        ROUND(LEAST(1.0, n_tokens / 50.0)
              * (1.0 - n_stop / (n_tokens * 1.0))
              * (n_distinct / (n_tokens * 1.0)), 6) AS quality_score,
        {_LANG_CASE} AS detected_lang,
        ({_LANG_CASE}) = lang AS lang_agree
    FROM t
    """,
    tags=("X4",),
)
def text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document text analysis (X4), one narrow map over the scan —
    no shuffle, tokenized once and shared across all outputs:

    - token counting: whitespace tokens, distinct tokens, avg token length;
    - quality scoring: length saturation × (1 − stopword ratio) ×
      type-token ratio — the shape of a fastText-style heuristic filter;
    - language-ID heuristic: stopword-marker voting with a fixed priority
      order for ties (en > de > es > fr > zh, matching the CASE ladder) so
      the argmax is deterministic. At 100 TB this is the cheap first-pass
      filter before an expensive model-based IDer.
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = "split(text, ' ')"
    score_cols = [
        F.expr(
            f"size(filter({toks}, x -> x IN ("
            + ", ".join(f"'{w}'" for w in _LANG_MARKERS[lg])
            + ")))"
        ).alias(f"s_{lg}")
        for lg in sorted(_LANG_MARKERS)
    ]
    t = docs.select(
        "doc_id",
        "lang",
        "n_chars",
        F.length("text").alias("text_len"),
        F.expr(f"size({toks})").alias("n_tokens"),
        F.expr(f"size(filter({toks}, x -> x IN {_STOP_IN}))").alias("n_stop"),
        F.expr(f"size(array_distinct({toks}))").alias("n_distinct"),
        *score_cols,
    )
    return t.select(
        "doc_id",
        "lang",
        "n_chars",
        "n_tokens",
        F.col("n_distinct").alias("n_distinct_tokens"),
        F.round(
            (F.col("text_len") - F.col("n_tokens") + F.lit(1.0)) / F.col("n_tokens"), 6
        ).alias("avg_token_len"),
        F.round(F.col("n_stop") / (F.col("n_tokens") * 1.0), 6).alias("stopword_ratio"),
        F.round(F.col("n_distinct") / (F.col("n_tokens") * 1.0), 6).alias("ttr"),
        F.round(
            F.least(F.lit(1.0), F.col("n_tokens") / 50.0)
            * (1.0 - F.col("n_stop") / (F.col("n_tokens") * 1.0))
            * (F.col("n_distinct") / (F.col("n_tokens") * 1.0)),
            6,
        ).alias("quality_score"),
        F.expr(_LANG_CASE).alias("detected_lang"),
        (F.expr(_LANG_CASE) == F.col("lang")).alias("lang_agree"),
    )


@register(
    "text_tfidf_topk",
    oracle="""
    WITH tf AS (
        SELECT doc_id, tok AS term, COUNT(*) AS tf
        FROM (SELECT doc_id, UNNEST(string_split(text, ' ')) AS tok FROM documents)
        GROUP BY doc_id, tok
    ),
    df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
    n AS (SELECT COUNT(*) AS n_docs FROM documents),
    scored AS (
        SELECT
            tf.doc_id, tf.term, tf.tf,
            ROUND(tf.tf * LN(CAST(n.n_docs AS DOUBLE) / df.df), 6) AS tfidf
        FROM tf, df, n
        WHERE tf.term = df.term
    )
    SELECT doc_id, term, tf, tfidf
    FROM (
        SELECT *, ROW_NUMBER() OVER (
            PARTITION BY doc_id ORDER BY tfidf DESC, term) AS rn
        FROM scored
    ) WHERE rn <= 3
    """,
    tags=("X4", "W4"),
)
def text_tfidf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF keyword extraction (X4): explode → per-(doc,term) counts →
    document-frequency join → top-3 terms per doc (W4 pattern). Ranking
    uses the ROUNDED score (+ term tie-break) so ordering is cross-engine
    deterministic.

    The corpus size N enters the PLAN as a one-row aggregate broadcast
    into a cross join (mirroring the oracle's ``n`` CTE) — NOT a
    driver-side ``count()``, which would fire a full corpus scan at query
    *construction* time and break the lazy DataFrame-in/DataFrame-out
    contract. The df (vocabulary) side carries no broadcast pin: web-scale
    vocabularies grow into billions of near-unique terms, so AQE decides
    (broadcast at small SF, shuffle join beyond the threshold)."""
    docs = load_table(spark, sf_dir, "documents")
    n_docs = docs.agg(F.count(F.lit(1)).alias("n_docs"))  # one-row, in-plan
    exploded = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("term")
    )
    # tf feeds BOTH the document-frequency aggregate and the scoring join;
    # persist so the explode + (doc,term) aggregation runs once, not per
    # consumer (MEMORY_AND_DISK spills rather than OOMs; at 100 TB this is
    # where you'd checkpoint the term index to storage). The cache entry
    # outlives this call by design — the registry contract returns a lazy
    # DataFrame, so unpersisting here would defeat the sharing; once the
    # caller drops the result, Spark's ContextCleaner reclaims the
    # unreachable cached RDD.
    tf = persist_once(exploded.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf")))
    df_counts = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    scored = tf.join(df_counts, "term").crossJoin(F.broadcast(n_docs)).select(
        "doc_id",
        "term",
        "tf",
        F.round(
            F.col("tf") * F.log(F.col("n_docs").cast("double") / F.col("df")), 6
        ).alias("tfidf"),
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("tfidf").desc(), F.col("term"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("doc_id", "term", "tf", "tfidf")
    )


def _simhash_fragments() -> tuple[list[str], str]:
    """16-bit SimHash from the 16 md5 nibbles of each distinct token:
    bit_i = sign of Σ_tokens (+1 if nibble_i ≥ 8 else −1). md5 hex is
    identical in Spark and DuckDB so the fragments are engine-portable."""
    high = "('8', '9', 'a', 'b', 'c', 'd', 'e', 'f')"
    bit_sums = [
        f"SUM(CASE WHEN SUBSTRING(MD5(tok), {i}, 1) IN {high} THEN 1 ELSE -1 END) AS b{i}"
        for i in range(1, 17)
    ]
    fingerprint = "CAST(" + " + ".join(
        f"(CASE WHEN b{i} > 0 THEN {2 ** (i - 1)} ELSE 0 END)" for i in range(1, 17)
    ) + " AS BIGINT)"
    return bit_sums, fingerprint


_BIT_SUMS, _FINGERPRINT = _simhash_fragments()


@register(
    "text_simhash",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, UNNEST(list_distinct(string_split(text, ' '))) AS tok
        FROM documents
    ),
    bits AS (
        SELECT doc_id, {", ".join(_BIT_SUMS)}
        FROM toks GROUP BY doc_id
    )
    SELECT doc_id, {_FINGERPRINT} AS simhash16
    FROM bits
    """,
    tags=("X4", "X3"),
)
def text_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash document fingerprinting (X4/X3): near-identical documents get
    equal or near-equal (small Hamming distance) 16-bit fingerprints, so
    grouping by fingerprint is an O(n) near-dup blocking key. One explode +
    one hash-agg — scales with token count, not document pairs."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.explode(F.array_distinct(F.split("text", " "))).alias("tok")
    )
    bits = toks.groupBy("doc_id").agg(*[F.expr(s) for s in _BIT_SUMS])
    return bits.select("doc_id", F.expr(_FINGERPRINT).alias("simhash16"))


# --- document fingerprinting: Karp-Rabin rolling hash over token k-grams ---
# Hash family: Horner fold h = fold((acc, t) -> (acc*B + t) mod P) over the
# k-gram's token hashes, token hash = first 32 bits of md5 (identical hex in
# both engines; '0x..'::BIGINT in DuckDB ≡ CONV(.., 16, 10) in Spark).
# Intermediates stay < 2^37 (acc < P ≈ 2^30, B = 31, t < 2^32) so the fold
# never overflows int64 in either engine. Spark's aggregate() seeds acc=0 and
# DuckDB's list_reduce() seeds acc=first element — congruent mod P because
# (0*B + t1) ≡ t1, and neither intermediate overflows before its first mod.
_FP_K = 5  # tokens per gram
_FP_B = 31
_FP_P = 1_000_000_007

_SPARK_GRAM_HASHES = f"""
    CASE WHEN size(toks) < {_FP_K} THEN array()
         ELSE transform(sequence(1, size(toks) - {_FP_K} + 1),
              i -> aggregate(slice(toks, i, {_FP_K}), 0L,
                   (acc, x) -> (acc * {_FP_B}
                       + CAST(CONV(SUBSTRING(MD5(x), 1, 8), 16, 10) AS BIGINT))
                       % {_FP_P}))
    END
"""
_DUCK_GRAM_HASHES = f"""
    CASE WHEN LEN(string_split(text, ' ')) < {_FP_K} THEN []
         ELSE list_transform(range(1, LEN(string_split(text, ' ')) - {_FP_K} + 2),
              i -> list_reduce(
                   list_transform(list_slice(string_split(text, ' '), i, i + {_FP_K} - 1),
                        x -> CAST('0x' || SUBSTRING(MD5(x), 1, 8) AS BIGINT)),
                   (acc, x) -> (acc * {_FP_B} + x) % {_FP_P}))
    END
"""


@register(
    "text_fingerprint",
    oracle=f"""
    WITH grams AS (
        SELECT doc_id, {_DUCK_GRAM_HASHES} AS gh FROM documents
    )
    SELECT
        doc_id,
        CAST(LEN(gh) AS INT)                AS n_grams,
        CAST(LEN(list_distinct(gh)) AS INT) AS n_distinct_grams,
        list_min(gh)                        AS fingerprint
    FROM grams
    """,
    tags=("X4", "X3"),
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprinting (X4): Karp-Rabin rolling hash over token
    5-grams, fingerprint = min gram hash (the 1-hash degenerate case of
    winnowing / MinHash — docs sharing ANY 5-gram window with the minimal
    hash collide, so equal fingerprints are near-dup candidates, X3).

    Entirely in Catalyst higher-order functions (transform/slice/
    aggregate) — no UDF, codegen'd, one narrow map over the scan. Short
    docs (< k tokens) fingerprint to NULL on both engines."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.withColumn("toks", F.split("text", " "))
        .withColumn("gh", F.expr(_SPARK_GRAM_HASHES))
        .select(
            "doc_id",
            F.size("gh").alias("n_grams"),
            F.size(F.array_distinct("gh")).alias("n_distinct_grams"),
            F.array_min("gh").alias("fingerprint"),
        )
    )


# GPT-2-style pretokenizer, reduced to the char classes both regex engines
# (Java in Spark, RE2 in DuckDB) treat identically: letter runs, digit runs,
# single non-alphanumerics. No lookarounds (RE2 has none), no \p classes.
_BPE_PATTERN = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]"


@register(
    "text_token_regex",
    oracle=f"""
    SELECT
        doc_id,
        CAST(LEN(string_split(text, ' ')) AS INT) AS n_ws_tokens,
        CAST(LEN(regexp_extract_all(text, '{_BPE_PATTERN}')) AS INT) AS n_bpe_tokens,
        CAST(LEN(list_distinct(regexp_extract_all(text, '{_BPE_PATTERN}'))) AS INT)
            AS n_distinct_bpe,
        ROUND(LEN(regexp_extract_all(text, '{_BPE_PATTERN}'))
              / (LEN(string_split(text, ' ')) * 1.0), 6) AS fertility
    FROM documents
    """,
    tags=("X4",),
)
def text_token_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE-ish token counting (X4): a GPT-2-style pretokenizer regex
    (letter runs / digit runs / single punctuation) next to the whitespace
    count — `fertility` (regex tokens per whitespace token) is the
    standard proxy for how a subword tokenizer will blow up sequence
    length. Narrow map, regex evaluated once per output column by
    codegen's common-subexpression elimination."""
    docs = load_table(spark, sf_dir, "documents")
    bpe = F.expr(f"regexp_extract_all(text, '{_BPE_PATTERN}', 0)")
    ws = F.split("text", " ")
    return docs.select(
        "doc_id",
        F.size(ws).alias("n_ws_tokens"),
        F.size(bpe).alias("n_bpe_tokens"),
        F.size(F.array_distinct(bpe)).alias("n_distinct_bpe"),
        F.round(F.size(bpe) / (F.size(ws) * F.lit(1.0)), 6).alias("fertility"),
    )


VOCAB_TOP_K = 25


@register(
    "text_vocab_topk",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, UNNEST(string_split(text, ' ')) AS term FROM documents
    ),
    vocab AS (
        SELECT term, COUNT(DISTINCT doc_id) AS df, COUNT(*) AS cf
        FROM toks GROUP BY term
    ),
    topk AS (
        SELECT term, df, cf FROM vocab ORDER BY df DESC, term LIMIT {VOCAB_TOP_K}
    )
    SELECT term, df, cf,
           CAST(ROW_NUMBER() OVER (ORDER BY df DESC, term) AS INT) AS rank
    FROM topk
    """,
    tags=("X4", "O2"),
)
def text_vocab_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus vocabulary statistics (X4): per-term document frequency and
    collection frequency, top-K terms by df — the data-driven stopword /
    boilerplate-term discovery pass that feeds quality filtering and the
    hot-shingle cap (a term in >x% of documents carries no signal).

    Scale shape: explode → ONE two-metric hash-agg (partial map-side, so
    the shuffle carries one row per term per task, bounded by vocab size,
    not corpus size) → global top-K as orderBy+limit, which Catalyst plans
    as TakeOrderedAndProject (per-partition heaps + single merge — never a
    global sort). The rank column is added AFTER the limit, so its
    unpartitioned window touches exactly K rows regardless of corpus size.
    Ties are broken by term so the cutoff is deterministic on both engines.
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", F.explode(F.split("text", " ")).alias("term"))
    vocab = toks.groupBy("term").agg(
        F.countDistinct("doc_id").alias("df"),
        F.count(F.lit(1)).alias("cf"),
    )
    topk = vocab.orderBy(F.desc("df"), "term").limit(VOCAB_TOP_K)
    rank_w = Window.orderBy(F.desc("df"), "term")
    return topk.withColumn("rank", F.row_number().over(rank_w).cast("int"))


# --- PII redaction --------------------------------------------------------
#
# Backslash-free regexes (`[.]` instead of `\.`) so the same pattern text
# survives Python, Java-regex (Spark) and RE2 (DuckDB) quoting unchanged;
# no lookarounds (RE2 has none), no backreferences.
_EMAIL_RE = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+[.][A-Za-z]{2,}"
_IP_RE = "[0-9]{1,3}([.][0-9]{1,3}){3}"

# The fixture corpus is PII-free by construction, so the redaction pass is
# exercised by injecting deterministic synthetic PII derived from doc_id —
# both engines inject the identical string, redact it, and must agree that
# nothing survives. In production the injection select disappears and the
# redaction expressions run over the raw text unchanged.
_DUCK_INJECT = (
    "text || ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com"
    " from 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.7'"
)


@register(
    "text_redact_pii",
    oracle=f"""
    WITH injected AS (
        SELECT doc_id, {_DUCK_INJECT} AS text FROM documents
    ),
    red AS (
        SELECT
            doc_id,
            CAST(LEN(regexp_extract_all(text, '{_EMAIL_RE}')) AS INT) AS n_emails,
            CAST(LEN(regexp_extract_all(text, '{_IP_RE}')) AS INT)    AS n_ips,
            regexp_replace(regexp_replace(text, '{_EMAIL_RE}', '<EMAIL>', 'g'),
                           '{_IP_RE}', '<IP>', 'g') AS clean
        FROM injected
    )
    SELECT
        doc_id,
        n_emails,
        n_ips,
        LEN(regexp_extract_all(clean, '{_EMAIL_RE}'))
            + LEN(regexp_extract_all(clean, '{_IP_RE}')) = 0 AS pii_free,
        MD5(clean) AS clean_hash
    FROM red
    """,
    tags=("X4",),
)
def text_redact_pii(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction (X4): global regexp_replace of email addresses and
    IPv4 literals with typed placeholder tokens — the standard scrubbing
    pass before training-data release. Output per document: match counts,
    a post-redaction "nothing survives" assertion, and the md5 of the
    redacted text so the oracle verifies the exact redacted bytes, not
    just the counts.

    Narrow map over the scan (regex + md5 are codegen'd expressions, no
    Python in the row path) — at 100 TB this runs at scan bandwidth and
    shuffles nothing. The synthetic-injection preamble exists only because
    the fixture corpus is PII-free; see module comment above _DUCK_INJECT.
    """
    docs = load_table(spark, sf_dir, "documents")
    injected = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" contact user"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com from 10.0."),
            (F.col("doc_id") % 256).cast("string"),
            F.lit(".7"),
        ).alias("text"),
    )
    clean = F.regexp_replace(
        F.regexp_replace("text", _EMAIL_RE, "<EMAIL>"), _IP_RE, "<IP>"
    )
    red = injected.select(
        "doc_id",
        F.regexp_count("text", F.lit(_EMAIL_RE)).cast("int").alias("n_emails"),
        F.regexp_count("text", F.lit(_IP_RE)).cast("int").alias("n_ips"),
        clean.alias("clean"),
    )
    return red.select(
        "doc_id",
        "n_emails",
        "n_ips",
        (
            F.regexp_count("clean", F.lit(_EMAIL_RE))
            + F.regexp_count("clean", F.lit(_IP_RE))
            == 0
        ).alias("pii_free"),
        F.md5("clean").alias("clean_hash"),
    )


# --- Heavy hitters via an explicit count-min sketch ------------------------
#
# Frequent-token tracking at corpus scale without a full vocabulary agg:
# the classic count-min sketch, built as DATA (a bounded (row, bucket) →
# counter table) instead of an opaque binary blob. Spark ships
# count_min_sketch() as an agg, but its serialized form can't be queried
# in SQL or reproduced by another engine; this explicit form is the same
# structure — d hash rows × w buckets, estimate = min over rows — with an
# md5-derived hash family both engines compute bit-identically, so the
# ENTIRE sketch (not just a bounds flag) is oracle-checked.
#
# Scale shape: the counter build is one map-side-combining aggregation
# over (row, bucket) — the shuffle carries ≤ d·w rows per map partition
# regardless of corpus size, and the sketch table is ≤ d·w rows total
# (here 4×4096). Mergeable by construction (counters add), exactly like
# the binary sketch. Estimates: guaranteed ≥ true count; overcount ≤ εN
# w.h.p. with ε ≈ e/w — asserted per token in `cms_ok`.

CMS_DEPTH = 4       # independent hash rows
CMS_HEX = 3         # bucket key = first 3 md5 hex chars -> w = 16^3 = 4096

_CMS_SPARK_BUCKET = f"SUBSTRING(MD5(CONCAT('cms', i, '_', tok)), 1, {CMS_HEX})"
_CMS_DUCK_BUCKET = f"SUBSTRING(MD5('cms' || s.i || '_' || {{tok}}), 1, {CMS_HEX})"


CMS_HH_ORACLE = f"""
    WITH toks AS (
        SELECT UNNEST(string_split(text, ' ')) AS tok FROM documents
    ),
    toks_f AS (SELECT tok FROM toks WHERE tok <> ''),
    seeds AS (SELECT UNNEST(range(0, {CMS_DEPTH})) AS i),
    counters AS (
        SELECT s.i, {_CMS_DUCK_BUCKET.format(tok='tok')} AS b, COUNT(*) AS c
        FROM toks_f CROSS JOIN seeds s
        GROUP BY 1, 2
    ),
    exact_top AS (
        SELECT tok, COUNT(*) AS exact_cnt
        FROM toks_f GROUP BY tok
        ORDER BY exact_cnt DESC, tok
        LIMIT 20
    ),
    n AS (SELECT COUNT(*) AS n_toks FROM toks_f),
    est AS (
        SELECT t.tok, MIN(c.c) AS cms_est
        FROM exact_top t
        CROSS JOIN seeds s
        JOIN counters c
          ON c.i = s.i AND c.b = {_CMS_DUCK_BUCKET.format(tok='t.tok')}
        GROUP BY t.tok
    )
    SELECT t.tok, t.exact_cnt, e.cms_est,
           CAST(e.cms_est >= t.exact_cnt
                AND e.cms_est <= t.exact_cnt
                    + GREATEST(20, CAST(CEIL(0.005 * n.n_toks) AS BIGINT))
                AS INT) AS cms_ok
    FROM exact_top t
    JOIN est e ON t.tok = e.tok
    CROSS JOIN n
    """


def cms_tokens(docs: DataFrame) -> DataFrame:
    """Token stream for the sketch: split on space, drop empties."""
    return docs.select(F.explode(F.split("text", " ")).alias("tok")).filter(
        F.col("tok") != ""
    )


_CMS_SEEDS = f"sequence(0, {CMS_DEPTH - 1})"


def cms_counters(toks: DataFrame) -> DataFrame:
    """The sketch itself: (row i, bucket b) -> counter. One
    map-side-combining aggregation; works identically on a batch token
    frame or a streaming one (counters are pure adds — the streaming twin
    maintains this exact aggregate incrementally)."""
    return (
        toks.select("tok", F.explode(F.expr(_CMS_SEEDS)).alias("i"))
        .select("i", F.expr(_CMS_SPARK_BUCKET).alias("b"))
        .groupBy("i", "b")
        .agg(F.count(F.lit(1)).alias("c"))
    )


def cms_report(toks: DataFrame, counters: DataFrame) -> DataFrame:
    """Estimate + check report over a counter table (however it was
    built): exact top-20 anchor, MIN-over-rows estimates, domination and
    eps*N envelope flags."""
    # vocab (distinct tokens + counts) is persisted and reused three
    # times — top-k anchor, total-token count, and the estimate join —
    # so the corpus token stream is scanned for it exactly once; caching
    # the vocab is cheap (vocabulary-sized), caching the exploded token
    # stream would not be (corpus-sized). Round-4 scan-audit fix:
    # previously each use re-scanned and re-tokenized the corpus.
    vocab = (
        persist_once(toks.groupBy("tok").agg(F.count(F.lit(1)).alias("exact_cnt")))
    )
    exact_top = vocab.orderBy(F.col("exact_cnt").desc(), "tok").limit(20)
    n_toks = vocab.agg(F.sum("exact_cnt").alias("n_toks"))
    est = (
        exact_top.select("tok", F.explode(F.expr(_CMS_SEEDS)).alias("i"))
        .withColumn("b", F.expr(_CMS_SPARK_BUCKET))
        .join(counters, ["i", "b"])
        .groupBy("tok")
        .agg(F.min("c").alias("cms_est"))
    )
    return (
        exact_top.join(est, "tok")
        .crossJoin(n_toks)
        .select(
            "tok",
            "exact_cnt",
            "cms_est",
            (
                (F.col("cms_est") >= F.col("exact_cnt"))
                & (
                    F.col("cms_est")
                    <= F.col("exact_cnt")
                    + F.greatest(
                        F.lit(20),
                        F.expr("CAST(CEIL(0.005 * n_toks) AS BIGINT)"),
                    )
                )
            )
            .cast("int")
            .alias("cms_ok"),
        )
    )


@register("text_heavy_hitters_cms", oracle=CMS_HH_ORACLE, tags=("X4", "A3"))
def text_heavy_hitters_cms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy-hitter tokens with a count-min sketch built as a DataFrame
    (X4/A3): d={CMS_DEPTH} md5-hash rows × w=16^{CMS_HEX} buckets, counter
    build = one map-side-combining agg (bounded shuffle), estimate = MIN
    over rows. The exact top-20 (count desc, token tie-break) anchors the
    check: every estimate must dominate its true count (CMS can never
    undercount) and stay within the εN envelope (`cms_ok`). The oracle
    recomputes the sketch itself — both engines agree on every md5 bucket
    and every counter, so `cms_est` is value-checked, not just bounded."""
    docs = load_table(spark, sf_dir, "documents")
    toks = cms_tokens(docs)
    return cms_report(toks, cms_counters(toks))


# --- Overlapping document chunking (round 6) -------------------------------

CHUNK_LEN = 200     # chars per chunk
CHUNK_STRIDE = 150  # stride; CHUNK_LEN - CHUNK_STRIDE = 50 chars of overlap


@register(
    "text_chunk_overlap",
    oracle=f"""
    WITH sized AS (
        SELECT doc_id, text, LENGTH(text) AS n FROM documents
    ),
    ks AS (
        SELECT doc_id, text, n,
               CASE WHEN n > {CHUNK_LEN}
                    THEN (n - {CHUNK_LEN} + {CHUNK_STRIDE} - 1) // {CHUNK_STRIDE}
                    ELSE 0 END AS last_k
        FROM sized
    )
    SELECT doc_id,
           k AS chunk_idx,
           LENGTH(SUBSTR(text, k * {CHUNK_STRIDE} + 1, {CHUNK_LEN})) AS chunk_len,
           MD5(SUBSTR(text, k * {CHUNK_STRIDE} + 1, {CHUNK_LEN})) AS chunk_md5
    FROM ks, UNNEST(range(0, last_k + 1)) AS t(k)
    """,
    tags=("X4", "X-pipeline", "§2.8-string"),
)
def text_chunk_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping document chunking (the standard training/RAG prep
    step this family lacked): fixed {CHUNK_LEN}-char windows at stride
    {CHUNK_STRIDE} ({CHUNK_LEN - CHUNK_STRIDE} chars of overlap so no
    boundary context is lost), last chunk ragged, short docs → one
    chunk. Chunk count is pure integer arithmetic
    (ceil((n - len) / stride) + 1 via integer division — identical in
    both engines), the explode is one ``posexplode(sequence(...))`` per
    doc (narrow map, no shuffle — chunking 100 TB is embarrassingly
    parallel), and chunk CONTENT is value-checked through its md5, so an
    off-by-one in any window boundary breaks the hash. Downstream ops
    (dedup, embedding, packing) key on (doc_id, chunk_idx)."""
    docs = load_table(spark, sf_dir, "documents")
    sized = docs.select("doc_id", "text", F.length("text").alias("n"))
    last_k = F.when(
        F.col("n") > CHUNK_LEN,
        F.floor((F.col("n") - CHUNK_LEN + CHUNK_STRIDE - 1) / CHUNK_STRIDE),
    ).otherwise(0)
    ks = sized.select(
        "doc_id",
        "text",
        F.posexplode(F.sequence(F.lit(0), last_k.cast("int"))).alias("_p", "k"),
    )
    chunk = F.expr(f"substring(text, k * {CHUNK_STRIDE} + 1, {CHUNK_LEN})")
    return ks.select(
        "doc_id",
        F.col("k").cast("bigint").alias("chunk_idx"),
        F.length(chunk).cast("bigint").alias("chunk_len"),
        F.md5(chunk).alias("chunk_md5"),
    )


text_chunk_overlap.__doc__ = (
    text_chunk_overlap.__doc__.replace("{CHUNK_LEN - CHUNK_STRIDE}", str(CHUNK_LEN - CHUNK_STRIDE))
    .replace("{CHUNK_LEN}", str(CHUNK_LEN))
    .replace("{CHUNK_STRIDE}", str(CHUNK_STRIDE))
)


@register(
    "pipeline_chunk_dedup",
    oracle=f"""
    WITH sized AS (
        SELECT doc_id, text, LENGTH(text) AS n FROM documents
    ),
    ks AS (
        SELECT doc_id, text,
               CASE WHEN n > {CHUNK_LEN}
                    THEN (n - {CHUNK_LEN} + {CHUNK_STRIDE} - 1) // {CHUNK_STRIDE}
                    ELSE 0 END AS last_k
        FROM sized
    ),
    chunks AS (
        SELECT doc_id, k AS chunk_idx,
               MD5(SUBSTR(text, k * {CHUNK_STRIDE} + 1, {CHUNK_LEN})) AS chunk_md5
        FROM ks, UNNEST(range(0, last_k + 1)) AS t(k)
    ),
    ranked AS (
        SELECT doc_id, chunk_idx,
               ROW_NUMBER() OVER (
                   PARTITION BY chunk_md5 ORDER BY doc_id, chunk_idx) AS rn
        FROM chunks
    )
    SELECT doc_id,
           COUNT(*) AS n_chunks,
           CAST(SUM(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
    FROM ranked
    GROUP BY doc_id
    """,
    tags=("X-pipeline", "X2", "X4"),
)
def pipeline_chunk_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chunk-granularity exact dedup (the composition `text_chunk_overlap`
    exists for): chunk every document into the standard overlapping
    windows, dedup the CHUNKS globally by content hash (first owner by
    (doc_id, chunk_idx) keeps each chunk — the policy that strips
    boilerplate repeated across documents, which doc-level dedup cannot
    see), and report per document how many of its chunks survive. Same
    scale shape as `dedup_exact` one level down: the shuffle carries
    16-byte hashes + ids, never text; chunking itself is a narrow map.
    One wrongly-deduped chunk changes some doc's n_kept and breaks the
    hash."""
    docs = load_table(spark, sf_dir, "documents")
    from pyspark.sql import Window

    sized = docs.select("doc_id", "text", F.length("text").alias("n"))
    last_k = F.when(
        F.col("n") > CHUNK_LEN,
        F.floor((F.col("n") - CHUNK_LEN + CHUNK_STRIDE - 1) / CHUNK_STRIDE),
    ).otherwise(0)
    chunks = sized.select(
        "doc_id",
        "text",
        F.posexplode(F.sequence(F.lit(0), last_k.cast("int"))).alias("_p", "k"),
    ).select(
        "doc_id",
        F.col("k").alias("chunk_idx"),
        F.md5(
            F.expr(f"substring(text, k * {CHUNK_STRIDE} + 1, {CHUNK_LEN})")
        ).alias("chunk_md5"),
    )
    w = Window.partitionBy("chunk_md5").orderBy("doc_id", "chunk_idx")
    ranked = chunks.withColumn("rn", F.row_number().over(w))
    return ranked.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_chunks"),
        F.sum(F.when(F.col("rn") == 1, 1).otherwise(0))
        .cast("bigint")
        .alias("n_kept"),
    )
