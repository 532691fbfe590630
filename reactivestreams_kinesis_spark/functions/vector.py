"""Vector math over ``array<float>`` columns via higher-order functions.

JVM-side expressions only (SURVEY.md §2.10 X1 design): ``zip_with`` +
``aggregate`` compile to codegen'd loops — no Python, no UDF, no VectorUDT.
Both fragments fold left-to-right in double precision, so Spark and the
DuckDB oracle produce bit-identical dot products for identical inputs
(products of identical doubles are IEEE-exact; only accumulation order
could differ, and both are sequential).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def spark_dot(a: str, b: str) -> str:
    """Spark SQL fragment: double-precision dot product of two float arrays."""
    return (
        f"aggregate(zip_with({a}, {b}, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), "
        f"CAST(0 AS DOUBLE), (acc, v) -> acc + v)"
    )


def duckdb_dot(a: str, b: str) -> str:
    """DuckDB SQL fragment computing the same dot product the same way."""
    return (
        f"LIST_AGGREGATE(LIST_TRANSFORM(LIST_ZIP({a}, {b}), "
        f"p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)), 'sum')"
    )


def spark_cosine(a: str, b: str) -> str:
    """Spark SQL fragment: cosine similarity (no assumption of unit norm).

    Zero-norm operands yield NULL (``try_divide``), matching DuckDB's
    quiet NULL on float division by zero — under Spark 4's default ANSI
    mode a bare ``/`` would instead THROW ``DIVIDE_BY_ZERO`` and kill the
    whole job on one degenerate embedding (caught by the adversarial
    embedding corpus, tests/test_edge_corpus.py). NULL cosines sort last
    under every ``DESC`` ranking in both engines, so zero vectors can
    never rank as neighbors."""
    return (
        f"try_divide({spark_dot(a, b)}, "
        f"SQRT({spark_dot(a, a)}) * SQRT({spark_dot(b, b)}))"
    )


def duckdb_cosine(a: str, b: str) -> str:
    """DuckDB twin: bare division — DuckDB yields NULL on float /0."""
    return (
        f"{duckdb_dot(a, b)} / (SQRT({duckdb_dot(a, a)}) * SQRT({duckdb_dot(b, b)}))"
    )


def cosine_col(a: str, b: str, digits: int = 6) -> Column:
    """Cosine similarity as a Column, rounded for cross-engine stability."""
    return F.round(F.expr(spark_cosine(a, b)), digits)
