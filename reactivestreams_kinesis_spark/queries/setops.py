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
    "setop_unions",
    oracle="""
    SELECT 'all' AS variant, entity_key, entity_name FROM (
        SELECT c_custkey AS entity_key, c_name AS entity_name
        FROM customer WHERE c_acctbal > 9000
        UNION ALL
        SELECT s_suppkey AS entity_key, s_name AS entity_name
        FROM supplier WHERE s_acctbal > 9000
    )
    UNION ALL
    SELECT 'distinct' AS variant, nation_key AS entity_key, NULL AS entity_name FROM (
        SELECT c_nationkey AS nation_key FROM customer
        UNION
        SELECT s_nationkey AS nation_key FROM supplier
    )
    """,
    tags=("O4",),
)
def setop_unions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL + UNION DISTINCT (O4) as one variant-tagged result.
    UNION ALL is pure concatenation of lineages — no shuffle; UNION
    DISTINCT adds a hash-distinct whose partial stage runs map-side so
    the shuffle carries only unique keys."""
    customer = load_table(spark, sf_dir, "customer")
    supplier = load_table(spark, sf_dir, "supplier")
    c = customer.filter(F.col("c_acctbal") > 9000).select(
        F.col("c_custkey").alias("entity_key"),
        F.col("c_name").alias("entity_name"),
    )
    s = supplier.filter(F.col("s_acctbal") > 9000).select(
        F.col("s_suppkey").alias("entity_key"),
        F.col("s_name").alias("entity_name"),
    )
    u_all = c.unionByName(s).select(
        F.lit("all").alias("variant"), "entity_key", "entity_name"
    )
    u_distinct = (
        customer.select(F.col("c_nationkey").alias("entity_key"))
        .union(supplier.select(F.col("s_nationkey").alias("entity_key")))
        .distinct()
        .select(
            F.lit("distinct").alias("variant"),
            "entity_key",
            F.lit(None).cast("string").alias("entity_name"),
        )
    )
    return u_all.unionByName(u_distinct)


@register(
    "setop_intersect_except",
    oracle="""
    SELECT 'intersect' AS variant, nation_key FROM (
        SELECT c_nationkey AS nation_key FROM customer
        INTERSECT
        SELECT s_nationkey AS nation_key FROM supplier
    )
    UNION ALL
    SELECT 'except' AS variant, nation_key FROM (
        SELECT c_nationkey AS nation_key FROM customer
        EXCEPT
        SELECT s_nationkey AS nation_key FROM supplier
    )
    """,
    tags=("O5",),
)
def setop_intersect_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT + EXCEPT (O5) as one variant-tagged result. INTERSECT
    plans as an aggregate + semi-join; EXCEPT is an anti-join under the
    hood — the building block for dedup-against-reference-set at
    pipeline scale."""
    customer = load_table(spark, sf_dir, "customer")
    supplier = load_table(spark, sf_dir, "supplier")
    c = customer.select(F.col("c_nationkey").alias("nation_key"))
    s = supplier.select(F.col("s_nationkey").alias("nation_key"))
    inter = c.intersect(s).select(F.lit("intersect").alias("variant"), "nation_key")
    diff = c.subtract(s).select(F.lit("except").alias("variant"), "nation_key")
    return inter.unionByName(diff)


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
