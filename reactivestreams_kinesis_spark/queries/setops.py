"""Sorts / limits / set operations (SURVEY.md §2.7 O1-O5).

Limit lineage: the reference's take-N is the only [REF] operator here
(``ShardSubscription.java:67-68,174-182``, exercised by
``rel_decode_take``); union/intersect/except are [MANDATE].
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from reactivestreams_kinesis_spark.catalog import load_table
from reactivestreams_kinesis_spark.queries.registry import register


@register(
    "sort_topk",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 25
    """,
    tags=("O1", "O2"),
)
def sort_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-K (O2): Catalyst compiles orderBy+limit to
    TakeOrderedAndProject — each partition keeps a K-heap, driver merges K×P
    rows; no global sort exchange even at 100 TB. Tie-break on o_orderkey
    keeps content deterministic."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(25)
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )


@register(
    "setop_union_all",
    oracle="""
    SELECT c_custkey AS entity_key, c_name AS entity_name, 'customer' AS kind
    FROM customer WHERE c_acctbal > 9000
    UNION ALL
    SELECT s_suppkey AS entity_key, s_name AS entity_name, 'supplier' AS kind
    FROM supplier WHERE s_acctbal > 9000
    """,
    tags=("O4",),
)
def setop_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL (O4): pure concatenation of lineages, no shuffle."""
    customer = load_table(spark, sf_dir, "customer")
    supplier = load_table(spark, sf_dir, "supplier")
    c = customer.filter(F.col("c_acctbal") > 9000).select(
        F.col("c_custkey").alias("entity_key"),
        F.col("c_name").alias("entity_name"),
        F.lit("customer").alias("kind"),
    )
    s = supplier.filter(F.col("s_acctbal") > 9000).select(
        F.col("s_suppkey").alias("entity_key"),
        F.col("s_name").alias("entity_name"),
        F.lit("supplier").alias("kind"),
    )
    return c.unionByName(s)


@register(
    "setop_union_distinct",
    oracle="""
    SELECT c_nationkey AS nation_key FROM customer
    UNION
    SELECT s_nationkey AS nation_key FROM supplier
    """,
    tags=("O4",),
)
def setop_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION DISTINCT (O4): union + hash-distinct; partial distinct runs
    map-side so the shuffle carries only unique keys."""
    customer = load_table(spark, sf_dir, "customer")
    supplier = load_table(spark, sf_dir, "supplier")
    c = customer.select(F.col("c_nationkey").alias("nation_key"))
    s = supplier.select(F.col("s_nationkey").alias("nation_key"))
    return c.union(s).distinct()


@register(
    "setop_intersect",
    oracle="""
    SELECT c_nationkey AS nation_key FROM customer
    INTERSECT
    SELECT s_nationkey AS nation_key FROM supplier
    """,
    tags=("O5",),
)
def setop_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (O5): plans as an aggregate + semi-join under AQE."""
    customer = load_table(spark, sf_dir, "customer")
    supplier = load_table(spark, sf_dir, "supplier")
    return (
        customer.select(F.col("c_nationkey").alias("nation_key"))
        .intersect(supplier.select(F.col("s_nationkey").alias("nation_key")))
    )


@register(
    "setop_except",
    oracle="""
    SELECT c_nationkey AS nation_key FROM customer
    EXCEPT
    SELECT s_nationkey AS nation_key FROM supplier
    """,
    tags=("O5",),
)
def setop_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT / set difference (O5): anti-join under the hood — the
    building block for dedup-against-reference-set at pipeline scale."""
    customer = load_table(spark, sf_dir, "customer")
    supplier = load_table(spark, sf_dir, "supplier")
    return (
        customer.select(F.col("c_nationkey").alias("nation_key"))
        .subtract(supplier.select(F.col("s_nationkey").alias("nation_key")))
    )


@register(
    "setop_union_evolved_schema",
    oracle="""
    SELECT c_custkey AS entity_id, c_name AS name, c_acctbal AS balance, NULL AS segment
    FROM customer WHERE c_custkey <= 50
    UNION ALL
    SELECT c_custkey AS entity_id, c_name AS name, NULL AS balance, c_mktsegment AS segment
    FROM customer WHERE c_custkey > 50 AND c_custkey <= 100
    """,
    tags=("O4",),
)
def setop_union_evolved_schema(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-evolution union (O4 variant): two record versions with
    different column sets merge via unionByName(allowMissingColumns=True)
    — absent columns null-fill, by NAME not position. The ingestion
    pattern for a corpus whose schema grew over time; positional union
    would silently mis-align."""
    customer = load_table(spark, sf_dir, "customer")
    v1 = customer.filter(F.col("c_custkey") <= 50).select(
        F.col("c_custkey").alias("entity_id"),
        F.col("c_name").alias("name"),
        F.col("c_acctbal").alias("balance"),
    )
    v2 = (
        customer.filter((F.col("c_custkey") > 50) & (F.col("c_custkey") <= 100))
        .select(
            F.col("c_custkey").alias("entity_id"),
            F.col("c_name").alias("name"),
            F.col("c_mktsegment").alias("segment"),
        )
    )
    return v1.unionByName(v2, allowMissingColumns=True)


@register(
    "setop_unpivot",
    oracle="""
    SELECT s_suppkey, 'acctbal' AS metric, CAST(s_acctbal AS DOUBLE) AS value
    FROM supplier
    UNION ALL
    SELECT s_suppkey, 'nationkey' AS metric, CAST(s_nationkey AS DOUBLE) AS value
    FROM supplier
    """,
    tags=("O4", "P2"),
)
def setop_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot / melt: wide columns → long (metric, value) rows via the
    native unpivot operator — the inverse of agg_pivot, and the shape
    feature stores and metric pipelines ingest. The oracle states the
    equivalent portable UNION ALL."""
    supplier = load_table(spark, sf_dir, "supplier")
    return supplier.unpivot(
        ids=["s_suppkey"],
        values=[
            F.col("s_acctbal").cast("double").alias("acctbal"),
            F.col("s_nationkey").cast("double").alias("nationkey"),
        ],
        variableColumnName="metric",
        valueColumnName="value",
    )
