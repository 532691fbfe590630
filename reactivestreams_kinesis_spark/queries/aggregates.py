"""Aggregation operators (SURVEY.md §2.5 A1-A7) — all [MANDATE].

The reference streams records without interpreting them (its only "aggregate"
is the demand counter, ``ShardSubscription.java:112-116``); these are the
relational aggregation surface required by the north-star.

All money sums follow the DECIMAL-exact policy from ``relational.py``.
Collected lists are sorted so content is deterministic (A7).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from reactivestreams_kinesis_spark.catalog import load_table
from reactivestreams_kinesis_spark.queries.registry import register, register_sql


@register(
    "agg_distinct_counts",
    oracle="""
    SELECT
        c_mktsegment,
        COUNT(*)                    AS n_customers,
        COUNT(DISTINCT c_nationkey) AS n_nations,
        SUM(CASE WHEN c_acctbal > 5000 THEN 1 ELSE 0 END) AS n_rich
    FROM customer
    GROUP BY c_mktsegment
    """,
    tags=("A1", "A2"),
)
def agg_distinct_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct + conditional aggregation (A2). countDistinct plans as a
    two-stage partial-distinct aggregate — no row explosion at scale."""
    customer = load_table(spark, sf_dir, "customer")
    return customer.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.countDistinct("c_nationkey").alias("n_nations"),
        F.sum(F.when(F.col("c_acctbal") > 5000, 1).otherwise(0)).alias("n_rich"),
    )


@register(
    "agg_percentiles",
    oracle="""
    SELECT
        l_returnflag,
        ROUND(quantile_cont(l_quantity, 0.5), 6)  AS median_qty,
        ROUND(quantile_cont(l_extendedprice, 0.25), 6) AS p25_price,
        ROUND(quantile_cont(l_extendedprice, 0.75), 6) AS p75_price,
        ROUND(MIN(l_extendedprice), 6) AS min_price,
        ROUND(MAX(l_extendedprice), 6) AS max_price
    FROM lineitem
    GROUP BY l_returnflag
    """,
    tags=("A4",),
)
def agg_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles (A4). At 100 TB the exact form needs a
    per-group sort; the scale path is ``approx_percentile`` (t-digest
    sketch, single pass, mergeable) — kept exact here for oracle parity
    (Spark ``percentile`` ≡ DuckDB ``quantile_cont``)."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    return lineitem.groupBy("l_returnflag").agg(
        F.round(F.expr("percentile(l_quantity, 0.5)"), 6).alias("median_qty"),
        F.round(F.expr("percentile(l_extendedprice, 0.25)"), 6).alias("p25_price"),
        F.round(F.expr("percentile(l_extendedprice, 0.75)"), 6).alias("p75_price"),
        F.round(F.min("l_extendedprice"), 6).alias("min_price"),
        F.round(F.max("l_extendedprice"), 6).alias("max_price"),
    )


_SUM_QTY = "CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(12,2))), 2) AS DOUBLE)"


@register(
    "agg_rollup",
    oracle=f"""
    SELECT l_returnflag, l_linestatus, COUNT(*) AS n, {_SUM_QTY} AS sum_qty
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
    tags=("A5",),
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP hierarchy totals (A5): Catalyst expands to grouping sets in one
    Expand + single shuffle (not one pass per level)."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    return lineitem.rollup("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n"), F.expr(_SUM_QTY).alias("sum_qty")
    )


_SUM_TOTAL = "CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(12,2))), 2) AS DOUBLE)"


@register(
    "agg_cube",
    oracle=f"""
    SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n, {_SUM_TOTAL} AS sum_total
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
    tags=("A5",),
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over two low-cardinality dims (A5)."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.cube("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"), F.expr(_SUM_TOTAL).alias("sum_total")
    )


@register(
    "agg_global",
    oracle=f"""
    SELECT
        COUNT(*) AS n_rows,
        COUNT(DISTINCT l_orderkey) AS n_orders,
        {_SUM_QTY} AS sum_qty,
        MIN(l_shipdate) AS first_ship,
        MAX(l_shipdate) AS last_ship,
        MIN(l_extendedprice) AS min_price,
        MAX(l_extendedprice) AS max_price
    FROM lineitem
    """,
    tags=("A6", "A2"),
)
def agg_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyless global aggregate (A6): partial aggregation reduces every
    partition to one row before the single-row final stage."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    return lineitem.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct("l_orderkey").alias("n_orders"),
        F.expr(_SUM_QTY).alias("sum_qty"),
        F.min("l_shipdate").alias("first_ship"),
        F.max("l_shipdate").alias("last_ship"),
        F.min("l_extendedprice").alias("min_price"),
        F.max("l_extendedprice").alias("max_price"),
    )


@register(
    "agg_collect_set",
    oracle="""
    SELECT
        n_regionkey AS region_key,
        list_sort(list(DISTINCT n_name)) AS nations
    FROM nation
    GROUP BY n_regionkey
    """,
    tags=("A7",),
)
def agg_collect_set(spark: SparkSession, sf_dir: str) -> DataFrame:
    """collect_set with deterministic ordering (A7): ``sort_array`` makes
    the list content comparable across engines and runs. At scale
    collect_* is only safe on bounded-cardinality groups (it materializes
    the group in memory) — this one is ≤25 nations per region."""
    nation = load_table(spark, sf_dir, "nation")
    return nation.groupBy(F.col("n_regionkey").alias("region_key")).agg(
        F.sort_array(F.collect_set("n_name")).alias("nations")
    )


@register(
    "agg_approx_count_distinct",
    oracle=None,  # HLL sketch values are engine-specific; accuracy asserted in tests
    tags=("A3",),
)
def agg_approx_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ approximate distinct (A3) — the 100 TB path for
    distinct counting: single pass, fixed memory, mergeable sketches.
    Engine-specific sketch internals → rows-only driver check; the test
    suite asserts <5% relative error vs exact."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    return lineitem.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey", 0.02).alias("approx_parts"),
        F.count(F.lit(1)).alias("n"),
    )


@register(
    "agg_pivot",
    oracle=f"""
    SELECT
        o_orderpriority,
        CAST(ROUND(COALESCE(SUM(CASE WHEN o_orderstatus = 'F' THEN CAST(o_totalprice AS DECIMAL(12,2)) END), 0), 2) AS DOUBLE) AS F,
        CAST(ROUND(COALESCE(SUM(CASE WHEN o_orderstatus = 'O' THEN CAST(o_totalprice AS DECIMAL(12,2)) END), 0), 2) AS DOUBLE) AS O,
        CAST(ROUND(COALESCE(SUM(CASE WHEN o_orderstatus = 'P' THEN CAST(o_totalprice AS DECIMAL(12,2)) END), 0), 2) AS DOUBLE) AS P
    FROM orders
    GROUP BY o_orderpriority
    """,
    tags=("A5",),
)
def agg_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (wide aggregation): one row per priority, one revenue column
    per order status. The value list is given explicitly so the output
    schema is plan-time-stable (no extra distinct-values job, and no
    column-set drift between runs) — mandatory at scale."""
    orders = load_table(spark, sf_dir, "orders")
    pivoted = (
        orders.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.expr("SUM(CAST(o_totalprice AS DECIMAL(12,2)))"))
    )
    return pivoted.select(
        "o_orderpriority",
        *[
            F.expr(f"CAST(ROUND(COALESCE(`{c}`, 0), 2) AS DOUBLE)").alias(c)
            for c in ["F", "O", "P"]
        ],
    )


@register(
    "agg_approx_percentile",
    oracle=None,  # t-digest sketch internals are engine-specific (scale path for A4)
    tags=("A4",),
)
def agg_approx_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate percentiles (A4 scale path): single-pass, mergeable
    sketch — what replaces the exact per-group sort at 100 TB. Rows-only
    at the driver; the test suite bounds its error against the exact
    percentile."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    return lineitem.groupBy("l_returnflag").agg(
        F.expr("approx_percentile(l_extendedprice, 0.5, 10000)").alias("approx_median"),
        F.expr("approx_percentile(l_extendedprice, array(0.25, 0.75), 10000)").alias(
            "approx_quartiles"
        ),
    )


@register(
    "agg_histogram",
    oracle="""
    SELECT
        LEAST(GREATEST(CAST(FLOOR(o_totalprice / 50000.0) AS INT) + 1, 0), 13) AS bucket,
        COUNT(*) AS n,
        CAST(ROUND(MIN(o_totalprice), 2) AS DOUBLE) AS lo,
        CAST(ROUND(MAX(o_totalprice), 2) AS DOUBLE) AS hi
    FROM orders
    GROUP BY 1
    """,
    tags=("A1", "A5"),
)
def agg_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width histogram (the profiling companion to percentiles):
    explicit 50k-wide bucket arithmetic (DuckDB lacks width_bucket, so the
    identical clamped-floor expression runs on both engines) — a single
    hash-agg over bucket ids, the constant-memory way to see a
    distribution at 100 TB."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupBy(
        F.expr("LEAST(GREATEST(CAST(FLOOR(o_totalprice / 50000.0) AS INT) + 1, 0), 13)").alias("bucket")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.expr("CAST(ROUND(MIN(o_totalprice), 2) AS DOUBLE)").alias("lo"),
        F.expr("CAST(ROUND(MAX(o_totalprice), 2) AS DOUBLE)").alias("hi"),
    )


_GROUPING_SETS_SQL = f"""
    SELECT l_returnflag, l_linestatus, COUNT(*) AS n, {_SUM_QTY} AS sum_qty
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
"""

register_sql(
    "agg_grouping_sets",
    _GROUPING_SETS_SQL,
    tables=["lineitem"],
    tags=("A5",),
    doc="""Explicit GROUPING SETS (A5, completing rollup/cube): disjoint
    per-dimension totals plus the grand total in ONE Expand + shuffle.
    One SQL text runs on both engines (register_sql).""",
)
