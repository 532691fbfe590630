"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All queries live in ``reactivestreams_kinesis_spark.queries.*`` and are
surfaced here through the registry, so implementation / oracle / tests /
bench never drift apart.
"""

from __future__ import annotations

import functools
import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

# Importable regardless of the harness's cwd: the package lives next to
# this file.
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from reactivestreams_kinesis_spark.queries.registry import all_queries  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    queries_map = all_queries()
    return queries_map["q01_pricing_summary"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: functools.partial(_run, name) for name in all_queries()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each SQL-expressible query."""
    return {name: q.oracle for name, q in all_queries().items() if q.oracle is not None}


def _run(name: str, spark: SparkSession, sf_dir: str) -> DataFrame:
    return all_queries()[name].fn(spark, sf_dir)
