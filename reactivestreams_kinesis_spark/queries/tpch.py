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


_VOLUME = (
    "CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))"
)


# The fixtures carry no partsupp table, so Q2/Q11/Q16/Q20 below derive the
# part-supplier relationship from lineitem (DISTINCT l_partkey, l_suppkey) and
# use s_acctbal as the per-supplier cost/complaint stand-in. The *shapes* are
# the point: correlated MIN subquery (Q2), HAVING vs a global scalar threshold
# (Q11), count-distinct behind an anti join (Q16), nested semi-join chain (Q20).

_Q02_SQL = """
    WITH ps AS (
        SELECT DISTINCT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey
        FROM lineitem
    )
    SELECT s_acctbal, s_name, n_name, p_partkey, p_name
    FROM part
    JOIN ps ON p_partkey = ps_partkey
    JOIN supplier ON s_suppkey = ps_suppkey
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE p_size < 15
      AND p_type = 'LARGE'
      AND r_name = 'EUROPE'
      AND s_acctbal = (
          SELECT MIN(s2.s_acctbal)
          FROM ps ps2
          JOIN supplier s2 ON s2.s_suppkey = ps2.ps_suppkey
          JOIN nation n2 ON s2.s_nationkey = n2.n_nationkey
          JOIN region r2 ON n2.n_regionkey = r2.r_regionkey
          WHERE ps2.ps_partkey = p_partkey AND r2.r_name = 'EUROPE'
      )
    ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
    LIMIT 100
"""

register_sql(
    "q02_min_cost_supplier",
    _Q02_SQL,
    tables=["lineitem", "part", "supplier", "nation", "region"],
    tags=("J1", "A6", "O2"),
    doc="""TPC-H Q2-shaped (s_acctbal stands in for the missing
    ps_supplycost): cheapest EUROPE supplier per qualifying part via a
    correlated MIN scalar subquery. Catalyst decorrelates the subquery into
    a per-part MIN aggregate + equi-join — at scale the part-supplier
    relation shuffles once on partkey and the bounded dims broadcast; no
    per-row re-probe survives into the physical plan. MIN equality (not
    row_number) keeps cost ties, like the spec query.""",
)

_Q11_SQL = """
    WITH nation_lines AS (
        SELECT l_partkey, CAST(l_extendedprice AS DECIMAL(12,2)) AS val
        FROM lineitem
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        WHERE n_name = 'NATION_7'
    )
    SELECT
        l_partkey AS partkey,
        CAST(ROUND(SUM(val), 2) AS DOUBLE) AS part_value
    FROM nation_lines
    GROUP BY l_partkey
    HAVING CAST(SUM(val) AS DOUBLE)
         > 0.001 * (SELECT CAST(SUM(val) AS DOUBLE) FROM nation_lines)
    ORDER BY part_value DESC, partkey
"""

register_sql(
    "q11_important_stock",
    _Q11_SQL,
    tables=["lineitem", "supplier", "nation"],
    tags=("A1", "A6", "O1"),
    doc="""TPC-H Q11-shaped (nation-filtered line value stands in for the
    missing ps_supplycost*ps_availqty): parts whose value within one
    nation's suppliers exceeds a fraction of that nation's total — a
    group-by HAVING compared against an uncorrelated global-aggregate
    scalar subquery (computed once, broadcast as a single row). The CTE
    feeds both the per-part agg and the total; sums are decimal-exact so
    the threshold comparison is engine-deterministic.""",
)


@register(
    "q16_parts_supplier_relationship",
    oracle="""
    WITH ps AS (
        SELECT DISTINCT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey
        FROM lineitem
    )
    SELECT p_brand, p_size, COUNT(DISTINCT ps_suppkey) AS supplier_cnt
    FROM ps
    JOIN part ON p_partkey = ps_partkey
    WHERE p_brand <> 'Brand#13'
      AND p_size IN (1, 4, 9, 16, 25, 36, 49)
      AND ps_suppkey NOT IN (
          SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
      )
    GROUP BY p_brand, p_size
    ORDER BY supplier_cnt DESC, p_brand, p_size
    """,
    tags=("J3", "A2", "A1", "O1"),
)
def q16_parts_supplier_relationship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16-shaped (negative s_acctbal stands in for the missing
    complaint comment): how many distinct suppliers can deliver each
    qualifying (brand, size) — NOT IN realized as a left-anti join against
    the (tiny, broadcastable) bad-supplier set, then COUNT(DISTINCT) over
    the surviving part-supplier pairs. The distinct-pair projection runs
    before the part join so only (partkey, suppkey) crosses the first
    shuffle; suppliers with complaints never reach the aggregate."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#13")
        & F.col("p_size").isin(1, 4, 9, 16, 25, 36, 49)
    )
    bad_suppliers = load_table(spark, sf_dir, "supplier").filter(
        F.col("s_acctbal") < 0
    )
    ps = lineitem.select(
        F.col("l_partkey").alias("ps_partkey"), F.col("l_suppkey").alias("ps_suppkey")
    ).distinct()
    return (
        ps.join(part, F.col("ps_partkey") == F.col("p_partkey"))
        .join(bad_suppliers, F.col("ps_suppkey") == F.col("s_suppkey"), "left_anti")
        .groupBy("p_brand", "p_size")
        .agg(F.countDistinct("ps_suppkey").alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_size")
    )


@register(
    "q20_potential_promotion",
    oracle="""
    WITH qualifying_parts AS (
        SELECT p_partkey FROM part WHERE p_name LIKE '%gear%'
    ),
    heavy_shippers AS (
        SELECT l_suppkey
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
          AND l_partkey IN (SELECT p_partkey FROM qualifying_parts)
        GROUP BY l_suppkey, l_partkey
        HAVING SUM(CAST(l_quantity AS DECIMAL(12,2))) > 48
    )
    SELECT s_name, CAST(ROUND(s_acctbal, 2) AS DOUBLE) AS acctbal
    FROM supplier
    JOIN nation ON s_nationkey = n_nationkey
    WHERE n_name IN ('NATION_3', 'NATION_4')
      AND s_suppkey IN (SELECT l_suppkey FROM heavy_shippers)
    ORDER BY s_name
    """,
    tags=("J3", "A1", "P3"),
)
def q20_potential_promotion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20-shaped (shipped-quantity threshold stands in for the
    missing ps_availqty comparison): suppliers in target nations who
    heavily shipped a qualifying part — a nested semi-join chain
    (part-name semi-join inside the shipment aggregate, then the
    heavy-shipper set semi-joins supplier). Each IN becomes a left-semi
    join; the part filter prunes lineitem BEFORE its aggregation, and only
    distinct suppkeys (bounded by supplier cardinality, not lineitem)
    reach the final join."""
    part = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("%gear%"))
    lineitem = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation").filter(
        F.col("n_name").isin("NATION_3", "NATION_4")
    )
    heavy_shippers = (
        lineitem.join(part, F.col("l_partkey") == F.col("p_partkey"), "left_semi")
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(12,2)")).alias("qty"))
        .filter(F.col("qty") > 48)
        .select("l_suppkey")
    )
    return (
        supplier.join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(heavy_shippers, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
        .select(
            "s_name",
            F.expr("CAST(ROUND(s_acctbal, 2) AS DOUBLE)").alias("acctbal"),
        )
        .orderBy("s_name")
    )


@register(
    "q08_market_share",
    oracle=f"""
    WITH all_nations AS (
        SELECT
            CAST(EXTRACT(YEAR FROM o_orderdate) AS INT) AS o_year,
            {_VOLUME} AS volume,
            n2.n_name AS nation
        FROM part
        JOIN lineitem ON p_partkey = l_partkey
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation n1 ON c_nationkey = n1.n_nationkey
        JOIN region    ON n1.n_regionkey = r_regionkey
        JOIN supplier  ON l_suppkey = s_suppkey
        JOIN nation n2 ON s_nationkey = n2.n_nationkey
        WHERE r_name = 'AMERICA'
          AND p_type = 'ECONOMY'
          AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
    )
    SELECT
        o_year,
        ROUND(
            CAST(SUM(CASE WHEN nation = 'NATION_5' THEN volume
                          ELSE CAST(0 AS DECIMAL(12,2)) END) AS DOUBLE)
            / CAST(SUM(volume) AS DOUBLE), 6) AS mkt_share
    FROM all_nations
    GROUP BY o_year
    ORDER BY o_year
    """,
    tags=("J1", "A1"),
)
def q08_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8: national market share — the 8-table join (nation joined
    TWICE under different roles: customer's nation restricts the region,
    supplier's nation is the share target). Scale shape: region/nation are
    pinned broadcasts (bounded dims); the three fact joins
    (part←lineitem→orders→customer) shuffle on their keys and AQE picks
    broadcast for whichever side fits. Share = ratio of decimal-exact
    conditional sums, divided as doubles and rounded."""
    part = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    lineitem = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    customer = load_table(spark, sf_dir, "customer")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")
    n1 = nation.alias("n1")
    n2 = nation.select(
        F.col("n_nationkey").alias("n2_nationkey"), F.col("n_name").alias("nation")
    )
    joined = (
        lineitem.join(part, F.col("l_partkey") == F.col("p_partkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("n1.n_nationkey"))
        .join(F.broadcast(region), F.col("n1.n_regionkey") == F.col("r_regionkey"))
        .join(supplier, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("n2_nationkey"))
        .select(
            F.year("o_orderdate").alias("o_year"),
            F.expr(_VOLUME).alias("volume"),
            "nation",
        )
    )
    return (
        joined.groupBy("o_year")
        .agg(
            F.round(
                F.expr(
                    "CAST(SUM(CASE WHEN nation = 'NATION_5' THEN volume"
                    " ELSE CAST(0 AS DECIMAL(12,2)) END) AS DOUBLE)"
                )
                / F.expr("CAST(SUM(volume) AS DOUBLE)"),
                6,
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


@register(
    "q09_product_type_profit",
    oracle=f"""
    SELECT
        n_name AS nation,
        CAST(EXTRACT(YEAR FROM o_orderdate) AS INT) AS o_year,
        CAST(ROUND(SUM({_VOLUME}), 2) AS DOUBLE) AS sum_profit
    FROM part
    JOIN lineitem ON p_partkey = l_partkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN nation   ON s_nationkey = n_nationkey
    WHERE p_name LIKE '%widget%'
    GROUP BY n_name, o_year
    ORDER BY nation, o_year DESC
    """,
    tags=("J1", "A1", "O1"),
)
def q09_product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9-shaped (adapted: fixtures carry no partsupp/supplycost, so
    profit reduces to discounted revenue): per-(supplier-nation, year)
    revenue on name-matched parts. The LIKE prefilter prunes part before
    the join; nation broadcasts; the orders join brings the date for the
    year bucket."""
    part = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("%widget%"))
    lineitem = load_table(spark, sf_dir, "lineitem")
    supplier = load_table(spark, sf_dir, "supplier")
    orders = load_table(spark, sf_dir, "orders")
    nation = load_table(spark, sf_dir, "nation")
    return (
        lineitem.join(part, F.col("l_partkey") == F.col("p_partkey"))
        .join(supplier, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(
            F.col("n_name").alias("nation"), F.year("o_orderdate").alias("o_year")
        )
        .agg(F.expr(f"CAST(ROUND(SUM({_VOLUME}), 2) AS DOUBLE)").alias("sum_profit"))
        .orderBy("nation", F.col("o_year").desc())
    )


_Q13_SQL = """
    WITH c_orders AS (
        SELECT c_custkey, COUNT(o_orderkey) AS c_count
        FROM customer
        LEFT OUTER JOIN orders
          ON c_custkey = o_custkey AND o_orderpriority <> '5-LOW'
        GROUP BY c_custkey
    )
    SELECT c_count, COUNT(*) AS custdist
    FROM c_orders
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
"""

register_sql(
    "q13_customer_distribution",
    _Q13_SQL,
    tables=["customer", "orders"],
    tags=("J2", "A1", "O1"),
    doc="""TPC-H Q13-shaped (adapted: priority filter stands in for the
    missing o_comment): order-count distribution over ALL customers — the
    outer join keeps zero-order customers (COUNT(o_orderkey) counts only
    matched rows), then a second aggregation histograms the counts. Two
    shuffles by construction (custkey, then c_count); the first is the
    only large one.""",
)

_Q17_SQL = """
    SELECT
        CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) / 7.0, 2) AS DOUBLE)
            AS avg_yearly
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE p_brand = 'Brand#13'
      AND p_size < 10
      AND l_quantity < (
          SELECT 0.2 * AVG(l2.l_quantity)
          FROM lineitem l2
          WHERE l2.l_partkey = p_partkey
      )
"""

register_sql(
    "q17_small_qty_revenue",
    _Q17_SQL,
    tables=["lineitem", "part"],
    tags=("J1", "A6"),
    doc="""TPC-H Q17-shaped (p_brand/p_size filter stands in for the
    missing p_container): revenue lost to small-quantity orders. The
    correlated scalar subquery (per-part 20%-of-average threshold) is
    decorrelated by Catalyst into an aggregate + equi-join on partkey —
    the plan a hand-written rewrite would produce, derived automatically
    from the declarative form.""",
)


@register(
    "q21_waiting_supplier",
    oracle="""
    WITH fo_lines AS (
        SELECT l_orderkey, l_suppkey,
               MAX(CASE WHEN l_shipdate > o_orderdate + INTERVAL 90 DAY
                        THEN 1 ELSE 0 END) AS is_late
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        WHERE o_orderstatus = 'F'
        GROUP BY l_orderkey, l_suppkey
    ),
    order_stats AS (
        SELECT l_orderkey,
               COUNT(*) AS n_suppliers,
               CAST(SUM(is_late) AS BIGINT) AS n_late_suppliers
        FROM fo_lines
        GROUP BY l_orderkey
    )
    SELECT s_name, COUNT(*) AS numwait
    FROM fo_lines f
    JOIN order_stats o ON f.l_orderkey = o.l_orderkey
    JOIN supplier ON f.l_suppkey = s_suppkey
    WHERE f.is_late = 1
      AND o.n_suppliers > 1
      AND o.n_late_suppliers = 1
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 20
    """,
    tags=("J1", "J3", "A1", "O2"),
)
def q21_waiting_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21-shaped (adapted: ship-more-than-90-days-after-order
    stands in for the missing commit/receipt dates): suppliers who were
    the SOLE late supplier on a multi-supplier finished order.

    The spec's EXISTS / NOT EXISTS pair re-probes lineitem twice per row;
    this form computes per-(order, supplier) lateness once, rolls it up to
    per-order counts, and joins back — one pass over the fact table plus
    two small aggregations, the shape that survives 100 TB (self-probe
    EXISTS subqueries on a fact table do not)."""
    supplier = load_table(spark, sf_dir, "supplier")
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    lineitem = load_table(spark, sf_dir, "lineitem")
    fo_lines = (
        lineitem.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_orderkey", "l_suppkey")
        .agg(
            F.max(
                F.when(
                    F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAY"),
                    1,
                ).otherwise(0)
            ).alias("is_late")
        )
    )
    order_stats = fo_lines.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("n_suppliers"),
        F.sum("is_late").cast("bigint").alias("n_late_suppliers"),
    )
    return (
        fo_lines.filter(F.col("is_late") == 1)
        .join(order_stats, "l_orderkey")
        .filter((F.col("n_suppliers") > 1) & (F.col("n_late_suppliers") == 1))
        .join(supplier, F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(20)
    )
