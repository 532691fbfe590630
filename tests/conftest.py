"""Shared fixtures: one SparkSession per test session + the DuckDB oracle.

``assert_matches_oracle`` mirrors the driver's compare contract
(``__spark_entry__`` docstring): row count, column names sorted, and
order-insensitive BIT-EXACT value comparison, floats included — every
registered query is engineered for identical cross-engine results, and a
past float tolerance here masked a real rounding bug.
"""

from __future__ import annotations

import math
import os

import duckdb
import pytest

from reactivestreams_kinesis_spark.catalog import TABLE_NAMES, table_path
from reactivestreams_kinesis_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    spark = get_spark(app_name="rsk-spark-tests", cpus=8, shuffle_partitions=8)
    yield spark
    # ShardStream.to_memory captures land as managed warehouse tables;
    # drop them so spark-warehouse/ doesn't accumulate across runs
    for row in spark.sql("SHOW TABLES").collect():
        if row.tableName.startswith("shard_capture_"):
            spark.sql(f"DROP TABLE IF EXISTS {row.tableName}")
    spark.stop()


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR


@pytest.fixture(scope="session")
def oracle_con():
    con = duckdb.connect()
    for name in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{table_path(SF_DIR, name)}')"
        )
    yield con
    con.close()


def _normalize_cell(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
        return tuple(_normalize_cell(x) for x in v)
    if type(v).__module__ == "numpy":  # numpy scalar → python scalar
        return _normalize_cell(v.item())
    if hasattr(v, "isoformat"):  # datetime/date — engine-neutral text form
        return v.isoformat()
    if isinstance(v, bytes):
        return v.hex()
    return v


def _sort_key(row):
    return tuple(
        (x is None, str(type(x).__name__), str(x)) for x in row
    )


def rows_sorted_by_colname(df_pandas):
    cols = sorted(df_pandas.columns)
    recs = [
        tuple(_normalize_cell(v) for v in row)
        for row in df_pandas[cols].itertuples(index=False, name=None)
    ]
    return cols, sorted(recs, key=_sort_key)


def _cells_equal(a, b) -> bool:
    # EXACT comparison, floats included AND type-strict across numeric
    # kinds: every registered query is designed to be bit-identical across
    # engines (decimal money math, shared fragments, deliberate rounding
    # policy). A float tolerance here once masked a ROUND half-boundary
    # bug, and an int==float tolerance masked the DuckDB HUGEINT / Spark
    # BIGINT dtype drift the driver's hash rejects (CORRECTNESS_r01
    # agg_distinct_counts / fn_math) — so pytest now enforces the driver's
    # standard: a float only equals a float, an int only an int.
    if isinstance(a, tuple) and isinstance(b, tuple):
        return len(a) == len(b) and all(_cells_equal(x, y) for x, y in zip(a, b))
    if isinstance(a, (int, float)) and not isinstance(a, bool):
        if not isinstance(b, (int, float)) or isinstance(b, bool):
            return False
        return isinstance(a, float) == isinstance(b, float) and a == b
    return a == b


def _assert_driver_canonicalizable(cols, rows, engine: str):
    # The driver's canonicalizer pandas-sorts raw cell values and crashes
    # on list-valued cells (TypeError: unhashable type 'list'), which cost
    # three CORRECTNESS_r01 rows. Replicate that constraint locally so a
    # list-shaped output column fails HERE, not at the driver: serialize
    # arrays to delimited strings in the query (concat_ws / array_to_string).
    for row in rows[:1] + rows[-1:]:  # dtype check — one row suffices per end
        for col, cell in zip(cols, row):
            assert not isinstance(cell, tuple), (
                f"{engine} column {col!r} is list-valued — the driver's "
                "canonicalizer cannot hash it; serialize to a string"
            )


def assert_matches_oracle(spark_df, oracle_con, oracle_sql: str):
    import pandas as pd  # noqa: F401

    spark_pd = spark_df.toPandas()
    duck_pd = oracle_con.execute(oracle_sql).df()

    s_cols, s_rows = rows_sorted_by_colname(spark_pd)
    d_cols, d_rows = rows_sorted_by_colname(duck_pd)

    assert s_cols == d_cols, f"column mismatch: spark={s_cols} duckdb={d_cols}"
    _assert_driver_canonicalizable(s_cols, s_rows, "spark")
    _assert_driver_canonicalizable(d_cols, d_rows, "duckdb")
    assert len(s_rows) == len(d_rows), f"row count: spark={len(s_rows)} duckdb={len(d_rows)}"
    for i, (sr, dr) in enumerate(zip(s_rows, d_rows)):
        assert _cells_equal(sr, dr), f"row {i} mismatch:\n  spark : {sr}\n  duckdb: {dr}"
