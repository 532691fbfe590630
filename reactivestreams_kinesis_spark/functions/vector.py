"""Vector math over ``array<float>`` columns — JVM-side expressions only
(SURVEY.md §2.10 X1 design): no Python, no UDF, no VectorUDT.

Two dot-product forms, same bits, opposite cost regimes — both measured
at sf0.1:

- ``dim=None`` (DEFAULT): ``zip_with`` + ``aggregate`` fold. Higher-order
  functions are CodegenFallback in Spark (interpreted lambda eval per
  element), but the expression tree is tiny, so one-shot query latency —
  the regime the fixture bench measures, where plan compile dominates a
  2000-row scan — is ~2× better (0.30 s vs 0.63 s on the full
  ``sim_cosine_topk``).
- ``dim=<n>``: unrolled ``a[0]*b[0] + a[1]*b[1] + ...`` — a plain
  whole-stage-codegen Add tree, ~1.4× higher steady-state scan
  throughput (0.309 s vs 0.435 s per corpus pass once compiled). The
  right form for the 100 TB regime — compile once, scan for hours — and
  for pair-quadratic stages; pay one bigger JIT compile for it.

Result bits are IDENTICAL either way: SQL ``+`` is left-associative, so
the unrolled accumulation sequence equals the HOF fold's (whose leading
``0 + p0`` is exact), and products of identical doubles are IEEE-exact.
Under ANSI mode a shorter-than-``dim`` array fails LOUDLY on the
out-of-bounds index — the DIM-64 table contract (TESTDATA.md) is
enforced, not assumed.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DIM = 64  # the embeddings-table contract: fixed-width float vectors


def spark_dot(a: str, b: str, dim: int | None = None) -> str:
    """Spark SQL fragment: double-precision dot product of two float
    arrays — higher-order fold by default (compile-light, the fixture
    bench regime), unrolled codegen chain for a fixed ``dim`` (the
    scan-throughput regime; see module docstring)."""
    if dim is not None:
        return " + ".join(
            f"CAST({a}[{i}] AS DOUBLE) * CAST({b}[{i}] AS DOUBLE)"
            for i in range(dim)
        )
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
