"""Format-connector queries: the documents table consumed via JSONL,
CSV, and ORC (``sources/text_formats``) instead of parquet, proving the
readers reproduce the exact table content — the oracle runs against the
parquet view, so any roundtrip loss (type coercion, quote mangling, row
drops) breaks the value hash.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from reactivestreams_kinesis_spark.queries.registry import register
from reactivestreams_kinesis_spark.sources.text_formats import (
    documents_as_format,
    read_documents_csv,
    read_documents_jsonl,
    read_documents_orc,
)

_FMT_ORACLE = """
    SELECT 'jsonl' AS fmt, lang,
           COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
           CAST(SUM(LEN(string_split(text, ' '))) AS BIGINT) AS sum_toks
    FROM documents GROUP BY lang
    UNION ALL
    SELECT 'csv' AS fmt, lang,
           COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
           CAST(SUM(LEN(string_split(text, ' '))) AS BIGINT) AS sum_toks
    FROM documents GROUP BY lang
    UNION ALL
    SELECT 'orc' AS fmt, lang,
           COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
           CAST(SUM(LEN(string_split(text, ' '))) AS BIGINT) AS sum_toks
    FROM documents GROUP BY lang
"""


@register("src_format_roundtrip", oracle=_FMT_ORACLE, tags=("S5", "P1"))
def src_format_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Documents via the JSONL, CSV, and ORC connectors (S5 source
    surface, P1 payload decode): convert the fixture once per process,
    read each dump back with the explicit-schema readers, and aggregate
    per (format, lang) — counts, char sums, and a token-sum over the decoded text so a
    whitespace/quote mangling in either container format cannot cancel
    out. The oracle aggregates the parquet view twice (once per format
    tag), so the hash only matches if both connectors reproduce the
    table exactly."""

    def agg(df: DataFrame, fmt: str) -> DataFrame:
        return df.groupBy(F.lit(fmt).alias("fmt"), F.col("lang")).agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("sum_chars"),
            F.sum(F.size(F.split("text", " "))).alias("sum_toks"),
        )

    jsonl = read_documents_jsonl(spark, documents_as_format(spark, sf_dir, "jsonl"))
    csv = read_documents_csv(spark, documents_as_format(spark, sf_dir, "csv"))
    orc = read_documents_orc(spark, documents_as_format(spark, sf_dir, "orc"))
    return (
        agg(jsonl, "jsonl").unionByName(agg(csv, "csv")).unionByName(agg(orc, "orc"))
    )
