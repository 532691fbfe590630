"""Text-format connectors (JSONL / CSV) for the documents table.

LLM corpora ship as JSON-lines far more often than parquet (Common Crawl
derivatives, RedPajama, Dolma all distribute .jsonl[.gz]); a user of this
engine needs to point the same queries at those files. The rules that
matter at 100 TB:

- ALWAYS pass an explicit schema. ``spark.read.json`` without one runs a
  full extra pass over the data just to infer types (and infers them from
  whatever subset it samples — schema drift between runs). Same for CSV.
- JSONL and CSV are splittable when uncompressed (and when compressed with
  a splittable codec); a single .json.gz blob is ONE task no matter the
  cluster size — shard source files at write time.
- Malformed rows: surface, don't silently drop — ``mode=PERMISSIVE`` with
  a ``columnNameOfCorruptRecord`` quarantine column, so a corrupt record
  becomes a filterable row instead of a killed job (FAILFAST) or silent
  loss (DROPMALFORMED).

The reference reads opaque Kinesis record payloads and leaves decoding to
the consumer (``ShardProducerSpec.scala:41-42``); these readers are that
decode step for the two dominant text container formats.
"""

from __future__ import annotations

import glob
import hashlib
import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

DOCUMENTS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)


def fixture_cache_dir(sf_dir: str, tag: str, table: str = "documents") -> str:
    """Cross-process cache dir for a derived copy of a fixture table
    (format dumps, replay splits). The dir lives in the shared system temp
    dir and survives across processes, so the key must change when the
    FIXTURE changes, not just the path: a regenerated parquet (new seed /
    scale) at the same path would otherwise silently serve a stale
    derivative. The key fingerprints every file under the source table by
    mtime+size PLUS a real content sample (first/last 256 bytes — for
    parquet that spans the magic header and the footer metadata, which
    changes with any rewrite), so even a timestamp-preserving regeneration
    of equal size (``cp -p``, archive restore) misses the stale cache."""
    path_key = os.path.abspath(sf_dir).strip("/").replace("/", "_")
    src = os.path.join(sf_dir, f"{table}.parquet")
    parts = sorted(glob.glob(os.path.join(src, "**"), recursive=True)) or [src]
    fp = hashlib.md5()
    for p in parts:
        if os.path.isfile(p):
            st = os.stat(p)
            fp.update(f"{p}:{st.st_mtime_ns}:{st.st_size};".encode())
            with open(p, "rb") as fh:
                fp.update(fh.read(256))
                if st.st_size > 256:
                    fh.seek(-min(256, st.st_size - 256), os.SEEK_END)
                    fp.update(fh.read(256))
    return os.path.join(
        tempfile.gettempdir(), f"rsk_{tag}_{path_key}_{fp.hexdigest()[:12]}"
    )


def _conversion_dir(sf_dir: str, fmt: str) -> str:
    return fixture_cache_dir(sf_dir, f"fmt_{fmt}", "documents")


def documents_as_format(spark: SparkSession, sf_dir: str, fmt: str) -> str:
    """Materialize the documents table as sharded JSONL or CSV files (the
    fixture-conversion step a real deployment would not need — its corpus
    already IS jsonl). Written once per process; sharded by Spark's
    partitioning so the files are parallel-readable like any real dump."""
    out = _conversion_dir(sf_dir, fmt)
    if not os.path.exists(os.path.join(out, "_SUCCESS")):
        from reactivestreams_kinesis_spark.catalog import load_table

        docs = load_table(spark, sf_dir, "documents")
        writer = docs.write.mode("overwrite")
        if fmt == "jsonl":
            writer.json(out)
        elif fmt == "orc":
            # the other columnar container warehouses actually hold (Hive
            # lineage); schema+stats live in the file like parquet, so the
            # reader needs no explicit-schema/quote contract at all
            writer.orc(out)
        elif fmt == "csv":
            # lossless-text CSV contract (mirrored by read_documents_csv):
            # Spark's writer defaults TRIM leading/trailing whitespace and
            # write empty string and NULL identically — both silently
            # corrupt real corpora. Distinct nullValue token + no trimming
            # + quote-escaping makes the roundtrip byte-exact, including
            # embedded newlines (auto-quoted by the writer).
            (
                writer.option("header", "true")
                .option("escape", '"')
                .option("ignoreLeadingWhiteSpace", "false")
                .option("ignoreTrailingWhiteSpace", "false")
                .option("nullValue", "\\N")
                .csv(out)
            )
        else:
            raise ValueError(f"unsupported format: {fmt}")
    return out


def read_documents_jsonl(
    spark: SparkSession, path: str, corrupt_col: str | None = None
) -> DataFrame:
    """JSONL documents reader: explicit schema (zero inference passes).
    With ``corrupt_col``, malformed lines surface as rows whose quarantine
    column holds the raw record (PERMISSIVE mode) — filterable into a
    dead-letter sink instead of killing the job (FAILFAST) or vanishing
    (DROPMALFORMED)."""
    schema = DOCUMENTS_SCHEMA
    if corrupt_col is not None:
        schema = T.StructType(
            [*DOCUMENTS_SCHEMA.fields, T.StructField(corrupt_col, T.StringType())]
        )
    reader = spark.read.schema(schema).option("mode", "PERMISSIVE")
    if corrupt_col is not None:
        reader = reader.option("columnNameOfCorruptRecord", corrupt_col)
    return reader.json(path)


def read_documents_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC documents reader. Schema travels in the file (columnar
    container, like parquet), so unlike the text formats there is no
    inference pass to avoid and no quoting contract to mirror — the
    reader is one call; the roundtrip oracle still proves content
    exactness. Splittable by stripe, so a 100 TB directory parallelizes
    like parquet does."""
    return spark.read.schema(DOCUMENTS_SCHEMA).orc(path)


def read_documents_csv(spark: SparkSession, path: str) -> DataFrame:
    """CSV documents reader: explicit schema, header line, and the exact
    mirror of the writer's lossless-text contract (no whitespace trimming,
    distinct NULL token, quote-escaping). ``multiLine`` is required for
    text fields containing newlines — and it makes each CSV FILE a single
    parse unit (non-splittable), which is the documented reason to prefer
    JSONL for newline-bearing corpora at scale: JSONL escapes newlines so
    the format stays line-splittable."""
    return (
        spark.read.schema(DOCUMENTS_SCHEMA)
        .option("header", "true")
        .option("escape", '"')
        .option("multiLine", "true")
        .option("ignoreLeadingWhiteSpace", "false")
        .option("ignoreTrailingWhiteSpace", "false")
        .option("nullValue", "\\N")
        .option("mode", "PERMISSIVE")
        .csv(path)
    )
