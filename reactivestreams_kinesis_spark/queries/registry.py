"""Query registry — single source of truth for the correctness harness.

Each registered query carries:
- ``fn(spark, sf_dir) -> DataFrame`` — the PySpark implementation,
- ``oracle`` — equivalent DuckDB-runnable ANSI SQL over the same parquet
  tables (``None`` for non-SQL-expressible ops → rows-only check),
- ``tags`` — SURVEY.md §2 operator ids the query exercises.

``__spark_entry__.queries()`` / ``oracle_sql()``, the pytest suite, and
``bench.py`` all read from here, so a query is implemented exactly once.

Determinism rules (driver hashes values order-insensitively, but LIMIT /
top-k / collected lists still need deterministic content):
- every ORDER BY under a LIMIT or window rank uses a unique tie-breaker key;
- floating aggregates are rounded (money 2dp, ratios 6dp) in BOTH the Spark
  fn and the oracle, since double summation order differs between engines;
- collected lists are sorted (``sort_array`` / ``list_sort``).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class Query:
    name: str
    fn: QueryFn
    oracle: str | None
    tags: tuple[str, ...] = field(default_factory=tuple)
    bench: bool = False  # headline query included in bench.py


REGISTRY: dict[str, Query] = {}


def register(
    name: str, oracle: str | None = None, tags: tuple[str, ...] = (), bench: bool = False
) -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        REGISTRY[name] = Query(name=name, fn=fn, oracle=oracle, tags=tags, bench=bench)
        return fn

    return deco


def register_sql(
    name: str,
    sql: str,
    tables: list[str],
    tags: tuple[str, ...] = (),
    bench: bool = False,
    doc: str = "",
) -> None:
    """Register a query defined by ONE SQL text that both engines run
    verbatim (possible when the statement stays in the shared dialect):
    Spark executes it via the SQL API over registered temp views, DuckDB
    runs it as the oracle. Eliminates the spark.sql/oracle copy-paste for
    pure-SQL operators (scalar subqueries, GROUPING SETS, CTE reuse)."""

    def fn(spark: SparkSession, sf_dir: str) -> DataFrame:
        from reactivestreams_kinesis_spark.catalog import load_tables

        load_tables(spark, sf_dir, tables)
        return spark.sql(sql)

    fn.__name__ = name
    fn.__doc__ = doc
    register(name, oracle=sql, tags=tags, bench=bench)(fn)


def all_queries() -> dict[str, Query]:
    # Import side-effect modules exactly once; keeps registry population lazy
    # so `import reactivestreams_kinesis_spark` stays cheap.
    from reactivestreams_kinesis_spark.queries import (  # noqa: F401
        aggregates,
        functions_scalar,
        joins,
        llm_dedup,
        llm_multimodal,
        llm_pipeline,
        llm_similarity,
        llm_text,
        relational,
        setops,
        streaming_batch,
        tpch,
        windows,
    )

    return dict(REGISTRY)
