"""Additional TPC-H-shaped queries: the classic relational shapes not yet
covered by the core families — EXISTS-driven counts (Q4), single-pass
filter aggregation (Q6), conditional aggregation (Q12), ratio-of-sums
(Q14), HAVING (Q18), and disjunctive multi-predicate joins (Q19).

All revenue math follows the DECIMAL-exact policy; shapes annotated with
their scale story. (The reference has no query surface at all — these are
the breadth a user of a real engine expects, per the north-star.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from reactivestreams_kinesis_spark.catalog import load_table
from reactivestreams_kinesis_spark.queries.joins import _REVENUE
from reactivestreams_kinesis_spark.queries.registry import register, register_sql


@register(
    "q04_order_priority",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-07-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1996-10-01 00:00:00'
      AND EXISTS (
        SELECT 1 FROM lineitem
        WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate
      )
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    tags=("J3", "A1"),
)
def q04_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4: priority counts for orders with at least one late-shipped
    line — EXISTS as a left-semi join with a non-equi residual, then a tiny
    agg. Only orderkeys cross the shuffle."""
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-07-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-10-01").cast("timestamp"))
    )
    lineitem = load_table(spark, sf_dir, "lineitem")
    return (
        orders.join(
            lineitem,
            (F.col("l_orderkey") == F.col("o_orderkey"))
            & (F.col("l_shipdate") > F.col("o_orderdate")),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


@register(
    "q06_forecast_revenue",
    oracle="""
    SELECT
        CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                       * CAST(l_discount AS DECIMAL(4,2))), 2) AS DOUBLE) AS revenue,
        COUNT(*) AS n_lines
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
    tags=("P3", "A6"),
)
def q06_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6: pure filter + global aggregate — the canonical
    scan-bound query. Every predicate reaches the parquet scan
    (PushedFilters); zero shuffles beyond the single-row final agg."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    return (
        lineitem.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & F.col("l_discount").between(0.05, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.expr(
                "CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,2))"
                " * CAST(l_discount AS DECIMAL(4,2))), 2) AS DOUBLE)"
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@register(
    "q12_shipmode_priority",
    oracle="""
    SELECT
        l_linestatus,
        CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                       THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                       THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY l_linestatus
    ORDER BY l_linestatus
    """,
    tags=("J1", "A1"),
)
def q12_shipmode_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12-shaped: join + conditional (pivot-style) counting."""
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        lineitem.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
        .orderBy("l_linestatus")
    )


@register(
    "q14_promo_effect",
    oracle="""
    SELECT
        ROUND(
            100.0 * CAST(SUM(CASE WHEN p_type LIKE 'PROMO%'
                THEN CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))
                ELSE CAST(0 AS DECIMAL(12,2)) END) AS DOUBLE)
            / CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE),
            6) AS promo_revenue_pct
    FROM lineitem
    JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-02-01 00:00:00'
    """,
    tags=("J1", "A6"),
)
def q14_promo_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14: ratio of conditional sums (promo revenue share). Both
    sums are exact decimals; the single division of two identical doubles
    is engine-deterministic, then rounded."""
    part = load_table(spark, sf_dir, "part")
    lineitem = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-02-01").cast("timestamp"))
    )
    disc = (
        "CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))"
    )
    return (
        lineitem.join(part, F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            F.expr(
                f"ROUND(100.0 * CAST(SUM(CASE WHEN p_type LIKE 'PROMO%' THEN {disc} "
                f"ELSE CAST(0 AS DECIMAL(12,2)) END) AS DOUBLE) "
                f"/ CAST(SUM({disc}) AS DOUBLE), 6)"
            ).alias("promo_revenue_pct")
        )
    )


@register(
    "q18_large_orders",
    oracle="""
    SELECT
        c_custkey,
        o_orderkey,
        CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(12,2))), 2) AS DOUBLE) AS total_qty
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    GROUP BY c_custkey, o_orderkey
    HAVING SUM(CAST(l_quantity AS DECIMAL(12,2))) > 150
    ORDER BY total_qty DESC, o_orderkey
    LIMIT 20
    """,
    tags=("J1", "A1", "O2"),
)
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18-shaped: HAVING over a grouped join (post-aggregation
    filter) + top-K. The HAVING predicate runs after partial+final agg, so
    the shuffle carries one row per order, not per line."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    total_qty = "SUM(CAST(l_quantity AS DECIMAL(12,2)))"
    return (
        lineitem.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_custkey", "o_orderkey")
        .agg(
            F.expr(f"CAST(ROUND({total_qty}, 2) AS DOUBLE)").alias("total_qty"),
            F.expr(total_qty).alias("__raw_qty"),
        )
        .filter(F.col("__raw_qty") > 150)
        .drop("__raw_qty")
        .orderBy(F.col("total_qty").desc(), "o_orderkey")
        .limit(20)
    )


@register(
    "q19_disjunctive",
    oracle=f"""
    SELECT
        {_REVENUE} AS revenue,
        COUNT(*) AS n_lines
    FROM lineitem
    JOIN part ON l_partkey = p_partkey
    WHERE (p_brand = 'Brand#13' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 21)
       OR (p_brand = 'Brand#20' AND p_size BETWEEN 1 AND 30 AND l_quantity BETWEEN 10 AND 30)
       OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 45 AND l_quantity BETWEEN 20 AND 40)
    """,
    tags=("J1", "P3", "A6"),
)
def q19_disjunctive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19-shaped: disjunctive predicates spanning both join sides —
    the join stays an equi-join on partkey and the OR-of-ANDs becomes a
    post-join filter (Catalyst also derives the p_brand IN (...) prefilter
    and pushes it to the part scan)."""
    part = load_table(spark, sf_dir, "part")
    lineitem = load_table(spark, sf_dir, "lineitem")
    cond = (
        ((F.col("p_brand") == "Brand#13") & F.col("p_size").between(1, 15) & F.col("l_quantity").between(1, 21))
        | ((F.col("p_brand") == "Brand#20") & F.col("p_size").between(1, 30) & F.col("l_quantity").between(10, 30))
        | ((F.col("p_brand") == "Brand#23") & F.col("p_size").between(1, 45) & F.col("l_quantity").between(20, 40))
    )
    return (
        lineitem.join(part, F.col("l_partkey") == F.col("p_partkey"))
        .filter(cond)
        .agg(F.expr(_REVENUE).alias("revenue"), F.count(F.lit(1)).alias("n_lines"))
    )


_Q22_SQL = """
    SELECT
        c_mktsegment,
        COUNT(*) AS n_customers,
        CAST(ROUND(SUM(CAST(c_acctbal AS DECIMAL(12,2))), 2) AS DOUBLE) AS total_bal
    FROM customer
    WHERE c_acctbal > (
            SELECT AVG(c2.c_acctbal) FROM customer c2 WHERE c2.c_acctbal > 0
          )
      AND NOT EXISTS (
            SELECT 1 FROM orders
            WHERE o_custkey = c_custkey AND o_totalprice > 450000
          )
    GROUP BY c_mktsegment
"""

register_sql(
    "q22_global_sales_opportunity",
    _Q22_SQL,
    tables=["customer", "orders"],
    tags=("J3", "A6"),
    doc="""TPC-H Q22-shaped: rich customers with no very-large orders — an
    uncorrelated scalar-subquery threshold (broadcast single row) feeding
    an anti join against orders, grouped per segment. One SQL text runs on
    both engines (register_sql).""",
)

_Q15_SQL = f"""
    WITH revenue AS (
        SELECT l_suppkey AS supplier_no, {_REVENUE} AS total_revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1997-04-01 00:00:00'
        GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier
    JOIN revenue ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
"""

register_sql(
    "q15_top_supplier",
    _Q15_SQL,
    tables=["lineitem", "supplier"],
    tags=("J1", "A6"),
    doc="""TPC-H Q15-shaped: top supplier by quarterly revenue via a reused
    CTE — the revenue aggregate feeds both the join and the MAX scalar
    subquery; equality (not LIMIT 1) keeps revenue ties, like the spec
    query. Decimal-exact revenue makes the MAX equality engine-safe.""",
)
