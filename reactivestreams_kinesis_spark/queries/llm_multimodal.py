"""Multimodal-column queries (X5) + the Python UDF surface (§2.11).

The fake decoder is deterministic, so even the mapInPandas path is
oracle-checked at full value level — the DuckDB twin recomputes the same
features from the text the payload was derived from. That validates the
whole Arrow round-trip: binary columns in, typed features out.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from reactivestreams_kinesis_spark.catalog import load_table
from reactivestreams_kinesis_spark.operators.multimodal import (
    attach_fake_media,
    extract_features,
)
from reactivestreams_kinesis_spark.queries.registry import register


@register(
    "multimodal_plumbing",
    oracle="""
    SELECT
        doc_id,
        CAST(OCTET_LENGTH(encode(text)) AS INT) AS payload_bytes,
        MD5(text)                                     AS payload_md5,
        'image/fake'                                  AS media_type
    FROM documents
    """,
    tags=("X5",),
)
def multimodal_plumbing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column plumbing (X5): payload size + checksum computed
    engine-side on the ``binary`` column (md5 works on bytes in both
    engines), metadata struct field access. No Python in this path."""
    docs = load_table(spark, sf_dir, "documents")
    media = attach_fake_media(docs)
    return media.select(
        "doc_id",
        F.octet_length("payload").alias("payload_bytes"),
        F.md5("payload").alias("payload_md5"),
        F.col("meta.media_type").alias("media_type"),
    )


@register(
    "multimodal_features",
    oracle="""
    SELECT
        doc_id,
        'image/fake'                                         AS media_type,
        CAST(OCTET_LENGTH(encode(text)) AS INT)        AS n_bytes,
        CAST(OCTET_LENGTH(encode(text)) % 640 AS INT)  AS width,
        CAST(OCTET_LENGTH(encode(text)) % 480 AS INT)  AS height,
        MD5(text)                                            AS checksum
    FROM documents
    """,
    tags=("X5", "§2.11"),
)
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Media feature extraction via mapInPandas (X5): binary payloads →
    Arrow batches → (stubbed) decoder → typed feature rows. The oracle
    recomputes the deterministic features directly, verifying the full
    Python/Arrow round-trip value-for-value."""
    docs = load_table(spark, sf_dir, "documents")
    return extract_features(attach_fake_media(docs))


@register(
    "udf_pandas_scalar",
    oracle="""
    SELECT
        doc_id,
        CAST(LEN(string_split(text, ' ')) AS BIGINT) AS n_tokens_udf,
        ROUND(LENGTH(text) / (LEN(string_split(text, ' ')) * CAST(1 AS DOUBLE)), 6)
            AS chars_per_token
    FROM documents
    """,
    tags=("§2.11",),
)
def udf_pandas_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vectorized scalar pandas_udf (§2.11): token counting in pandas
    string ops, Arrow-batched — the UDF escape hatch when an expression
    genuinely can't express the logic. Here it CAN (``text_token_stats``
    is the expression twin), which is exactly what makes it
    oracle-checkable; the policy remains expressions-first."""

    @F.pandas_udf("bigint")
    def n_tokens(texts: pd.Series) -> pd.Series:
        return texts.str.split(" ").str.len().astype("int64")

    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        n_tokens("text").alias("n_tokens_udf"),
        F.round(
            F.length("text") / (n_tokens("text") * F.lit(1.0)), 6
        ).alias("chars_per_token"),
    )


@register(
    "udf_pandas_grouped_agg",
    oracle="""
    SELECT
        c_nationkey,
        ROUND(MAX(c_acctbal) - MIN(c_acctbal), 6) AS bal_range
    FROM customer
    GROUP BY c_nationkey
    """,
    tags=("§2.11",),
)
def udf_pandas_grouped_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-aggregate pandas_udf (§2.11 UDAF surface): per-group pandas
    Series in, scalar out, Arrow-batched. max−min is order-insensitive so
    the result is exactly the expression twin — which is the point: the
    UDAF machinery is verified, and the policy stays expressions-first."""

    @F.pandas_udf("double")
    def bal_range(bals: pd.Series) -> float:
        return float(bals.max() - bals.min())

    docs = load_table(spark, sf_dir, "customer")
    return docs.groupBy("c_nationkey").agg(
        F.round(bal_range("c_acctbal"), 6).alias("bal_range")
    )


@register(
    "udf_row_scalar",
    oracle="""
    SELECT
        doc_id,
        CAST(LENGTH(text) - LENGTH(REGEXP_REPLACE(text, '[aeiou]', '', 'g')) AS INT)
            AS n_vowels
    FROM documents
    """,
    tags=("§2.11",),
)
def udf_row_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-at-a-time Python UDF (§2.11) — present for surface completeness
    and deliberately the ONLY registered query using one: it pays per-row
    serde and blocks codegen, which is why everything else is expressions
    or Arrow-batched. The oracle recomputes the same vowel count in SQL."""

    @F.udf("int")
    def n_vowels(text: str) -> int:
        return sum(1 for ch in text if ch in "aeiou")

    docs = load_table(spark, sf_dir, "documents")
    return docs.select("doc_id", n_vowels("text").alias("n_vowels"))


@register(
    "udf_grouped_map",
    oracle="""
    SELECT c_custkey, c_nationkey,
           ROUND((c_acctbal - mn) / (mx - mn), 6) AS bal_scaled
    FROM (
        SELECT c_custkey, c_nationkey, c_acctbal,
               MIN(c_acctbal) OVER (PARTITION BY c_nationkey) AS mn,
               MAX(c_acctbal) OVER (PARTITION BY c_nationkey) AS mx
        FROM customer
    )
    WHERE mx > mn
    """,
    tags=("§2.11",),
)
def udf_grouped_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-map applyInPandas (§2.11 UDTF-ish surface): each group
    arrives as ONE pandas DataFrame and returns a transformed frame —
    here per-nation min-max scaling of account balances, the
    whole-group-context transform (normalization, per-group model fit)
    that scalar/agg UDFs can't express. min/max are order-insensitive and
    the division is a single double op, so the oracle's window-function
    twin matches exactly; rounding happens engine-side (F.round) to keep
    one rounding rule on both paths. Degenerate all-equal groups are
    dropped identically on both sides."""

    def scale(pdf: pd.DataFrame) -> pd.DataFrame:
        mn, mx = pdf["c_acctbal"].min(), pdf["c_acctbal"].max()
        if mx == mn:
            return pdf.iloc[0:0][["c_custkey", "c_nationkey"]].assign(bal_scaled=0.0)
        return pd.DataFrame(
            {
                "c_custkey": pdf["c_custkey"],
                "c_nationkey": pdf["c_nationkey"],
                "bal_scaled": (pdf["c_acctbal"] - mn) / (mx - mn),
            }
        )

    customer = load_table(spark, sf_dir, "customer")
    scaled = customer.groupBy("c_nationkey").applyInPandas(
        scale, "c_custkey bigint, c_nationkey int, bal_scaled double"
    )
    return scaled.withColumn("bal_scaled", F.round("bal_scaled", 6))


@register(
    "udf_python_udtf",
    oracle="""
    WITH t AS (
        SELECT doc_id, string_split(text, ' ') AS toks
        FROM documents WHERE doc_id < 30
    ),
    u AS (
        SELECT doc_id,
               CAST(UNNEST(range(1, len(toks) + 1)) AS INT) AS pos,
               UNNEST(toks) AS tok
        FROM t
    )
    SELECT doc_id, pos, tok, CAST(LENGTH(tok) AS INT) AS tok_len
    FROM u WHERE tok <> ''
    """,
    tags=("P1",),
)
def udf_python_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF (§2.11 — the real table-function surface, not just the
    applyInPandas 'UDTF-ish' form): a LATERAL-joined generator yielding
    one (pos, tok, tok_len) row per token. Like ``udf_row_scalar`` this
    is a deliberate surface proof on a bounded slice (doc_id < 30): row
    UDTFs run Python per input row — the policy keeps them off hot paths
    (the oracle-twin tokenizations elsewhere are all `split`/`explode`
    expressions). Unicode lengths are CHARACTER counts in both engines
    (Python len vs DuckDB LENGTH)."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="pos int, tok string, tok_len int")
    class TokenizeUDTF:
        def eval(self, text: str):
            for i, tok in enumerate(text.split(" "), start=1):
                if tok != "":
                    yield i, tok, len(tok)

    spark.udtf.register("rsk_tokenize_udtf", TokenizeUDTF)
    docs = load_table(spark, sf_dir, "documents")
    view = f"rsk_udtf_docs_{abs(hash(sf_dir)) % 10_000}"
    docs.filter(F.col("doc_id") < 30).createOrReplaceTempView(view)
    return spark.sql(
        f"""
        SELECT d.doc_id, t.pos, t.tok, t.tok_len
        FROM {view} AS d, LATERAL rsk_tokenize_udtf(d.text) AS t
        """
    )
