"""Fixture-table catalog: batch parquet scans (SURVEY.md §2.1 S5).

One parquet file per table under a scale-factor directory
(``/root/testdata/sf*/``). ``load_tables`` registers each as a temp view so
operators can be written in either DataFrame or SQL form — Catalyst produces
the same plan.

At 100 TB these would be partitioned/bucketed parquet (or Iceberg/Delta)
directories instead of single files; the reader surface is identical
(``spark.read.parquet`` on a directory prunes partitions from pushed-down
filters automatically), so nothing in the query layer changes.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLE_NAMES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Parquet schema inference fires a one-task footer-read job per
# ``spark.read.parquet`` call. Plans are rebuilt constantly (each registered
# query re-loads its tables), so cache the inferred schema per path and pass
# it explicitly on repeat reads — construction of the 2nd..Nth plan over a
# table then fires zero jobs. Safe because fixture files are immutable for
# the life of the process; a real deployment would invalidate on table DDL.
_SCHEMA_CACHE: dict[str, "object"] = {}


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def _ensure_session_confs(spark: SparkSession) -> None:
    """Confs required for fixture parity, set defensively at runtime because
    the correctness driver supplies its own SparkSession (not ``get_spark``):
    nanos-as-long so TIMESTAMP(NANOS) parquet is readable, UTC session time
    so TimestampType values collect identically to DuckDB's naive
    timestamps."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    # Micros-without-timezone parquet must read as TimestampType, not
    # TIMESTAMP_NTZ: chrono functions like unix_micros reject NTZ, and with
    # a UTC session the two types carry identical values anyway (matching
    # DuckDB's naive TIMESTAMP).
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    # The 200-partition default makes every shuffle a 200-task stage even
    # on small fixtures; size to the SESSION's parallelism. Guarded twice:
    # only in local mode (cluster deployments keep their sizing) and only
    # when the value still reads 200 — an explicit 200 is
    # indistinguishable from the default, which is the accepted cost of
    # making the harness's plain sessions usable (documented tradeoff;
    # get_spark sessions set their own value so this never fires for
    # them). defaultParallelism, not os.cpu_count(): a plain local[8]
    # session on a 32-cpu box was getting 32 — AQE re-coalesces batch
    # stages so that was mostly noise, but STREAMING state is exempt from
    # AQE and the state-store partition count locks to this value at the
    # first micro-batch, so every stateful drain paid 4x the state files
    # and 4x the per-batch task schedule (measured ~4x wall on the
    # drained stream twins).
    if (
        spark.sparkContext.master.startswith("local")
        and spark.conf.get("spark.sql.shuffle.partitions", "200") == "200"
    ):
        spark.conf.set(
            "spark.sql.shuffle.partitions",
            str(max(spark.sparkContext.defaultParallelism, 8)),
        )


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Batch table scan (S5). Column pruning + predicate pushdown are left
    to Catalyst — callers express filters declaratively.

    ``events.ts`` is nanosecond-precision parquet; Spark reads it as int64
    nanos (``spark.sql.legacy.parquet.nanosAsLong``) and we truncate to a
    microsecond TimestampType here — the same truncation DuckDB applies
    casting TIMESTAMP_NS → TIMESTAMP, keeping oracle parity (FIXTURES.md).
    """
    _ensure_session_confs(spark)
    path = table_path(sf_dir, name)
    cached = _SCHEMA_CACHE.get(path)
    reader = spark.read if cached is None else spark.read.schema(cached)
    df = reader.parquet(path)
    if cached is None:
        _SCHEMA_CACHE[path] = df.schema
    ts_type = dict(df.dtypes).get("ts") if name == "events" else None
    if ts_type == "bigint":
        df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    elif ts_type == "timestamp_ntz":
        # Schema was cached before the NTZ conf took effect, or a caller
        # session overrides it; value-preserving under the UTC session tz.
        df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def load_tables(
    spark: SparkSession, sf_dir: str, names: list[str] | None = None, register_views: bool = True
) -> dict[str, DataFrame]:
    out: dict[str, DataFrame] = {}
    for name in names or TABLE_NAMES:
        df = load_table(spark, sf_dir, name)
        if register_views:
            df.createOrReplaceTempView(name)
        out[name] = df
    return out
