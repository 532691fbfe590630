"""Join operators (SURVEY.md §2.4 J1-J8) — all [MANDATE], the reference is
single-stream only (``ShardPublisher.java:16``).

Broadcast policy: explicit ``F.broadcast`` hints go ONLY on tables whose
size is bounded regardless of scale factor (region: 5 rows, nation: 25).
customer/supplier/part/orders/lineitem all grow linearly with SF — a pinned
broadcast hint on those would override AQE's size-based fallback and OOM
every executor at the 100 TB target. AQE still broadcasts them at small SF
from its runtime size estimates, so small-scale plans keep the same shape
without hard-coding a scale bomb (enforced by
tests/test_plans.py::test_no_pinned_broadcast_on_scaling_tables).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from reactivestreams_kinesis_spark.catalog import load_table
from reactivestreams_kinesis_spark.operators.joins import asof_join, dynamic_prune_join
from reactivestreams_kinesis_spark.queries.registry import register, register_sql, scratch_dir

_REVENUE = (
    "CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * "
    "(1 - CAST(l_discount AS DECIMAL(4,2)))), 2) AS DOUBLE)"
)


@register(
    "q05_local_supplier_volume",
    oracle=f"""
    SELECT
        n_name,
        {_REVENUE} AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation   ON c_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY n_name
    ORDER BY revenue DESC, n_name
    """,
    tags=("J1", "A1", "O1"),
    bench=True,
)
def q05_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5-shaped 6-table join (J1): fact-fact join on orderkey plus
    dimension joins.

    Scale shape: lineitem⋈orders is the big shuffle (both sides hashed on
    orderkey); nation/region are pinned broadcasts (bounded dims), while
    customer/supplier join strategy is left to AQE — it broadcasts them at
    small SF (same plan as a pinned hint) but falls back to shuffle joins
    when they outgrow the threshold, which a hint would dangerously
    override at 100 TB. The date filter prunes at the orders parquet scan
    before the join.
    """
    lineitem = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    customer = load_table(spark, sf_dir, "customer")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")

    return (
        lineitem.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(
            supplier,
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("n_name")
        .agg(F.expr(_REVENUE).alias("revenue"))
        .orderBy(F.col("revenue").desc(), "n_name")
    )


@register(
    "q03_shipping_priority",
    oracle=f"""
    SELECT
        l_orderkey,
        {_REVENUE} AS revenue,
        o_orderdate,
        o_orderpriority
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate  > TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
    tags=("J1", "A1", "O2", "O3"),
    bench=True,
)
def q03_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3-shaped join + top-K (J1, O2). Revenue is decimal-exact so
    the DESC ordering under LIMIT is identical across engines. The
    customer side (SF-scaling) carries no broadcast pin — AQE chooses."""
    customer = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp")
    )
    lineitem = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1997-01-01").cast("timestamp")
    )
    return (
        lineitem.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.expr(_REVENUE).alias("revenue"))
        .orderBy(F.col("revenue").desc(), "l_orderkey")
        .limit(10)
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
    )


@register(
    "join_left_outer",
    oracle="""
    SELECT
        c_custkey,
        COUNT(o_orderkey) AS n_orders,
        CAST(ROUND(COALESCE(SUM(CAST(o_totalprice AS DECIMAL(12,2))), 0), 2) AS DOUBLE)
            AS total_spend
    FROM customer
    LEFT JOIN orders ON c_custkey = o_custkey
    GROUP BY c_custkey
    """,
    tags=("J2", "A1"),
)
def join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join (J2) preserving customers with zero orders —
    COUNT(col) skips the null-extended rows, COALESCE zeroes the sum."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return (
        customer.join(orders, F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.expr(
                "CAST(ROUND(COALESCE(SUM(CAST(o_totalprice AS DECIMAL(12,2))), 0), 2) AS DOUBLE)"
            ).alias("total_spend"),
        )
    )


@register(
    "join_semi_anti",
    oracle="""
    SELECT 'semi' AS variant, c_custkey, c_name
    FROM customer
    WHERE EXISTS (
        SELECT 1 FROM orders
        WHERE o_custkey = c_custkey AND o_totalprice > 300000
    )
    UNION ALL
    SELECT 'anti' AS variant, c_custkey, c_name
    FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    """,
    tags=("J3",),
)
def join_semi_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left semi (≡ EXISTS) and left anti (≡ NOT EXISTS) joins (J3) as one
    variant-tagged result. Semi emits each matching left row once with no
    duplication and the right side never leaves the join — at scale the
    probe table streams against a hashed key set. Anti is the
    dedup-against-reference-set primitive (X2's incremental form)."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    big_orders = orders.filter(F.col("o_totalprice") > 300000)
    semi = customer.join(
        big_orders, F.col("c_custkey") == F.col("o_custkey"), "left_semi"
    ).select(F.lit("semi").alias("variant"), "c_custkey", "c_name")
    anti = customer.join(
        orders, F.col("c_custkey") == F.col("o_custkey"), "left_anti"
    ).select(F.lit("anti").alias("variant"), "c_custkey", "c_name")
    return semi.unionByName(anti)


@register(
    "join_cross_dims",
    oracle="""
    SELECT
        r_name,
        n_name,
        n_regionkey = r_regionkey AS is_home_region
    FROM region
    CROSS JOIN nation
    """,
    tags=("J4",),
)
def join_cross_dims(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross join (J4) of two bounded dims — the only safe cross-join shape
    at scale (|R|×|N| stays constant as facts grow); big×big cross joins
    are instead LSH-bucketed (X1/X3)."""
    region = load_table(spark, sf_dir, "region")
    nation = load_table(spark, sf_dir, "nation")
    return region.crossJoin(nation).select(
        "r_name",
        "n_name",
        (F.col("n_regionkey") == F.col("r_regionkey")).alias("is_home_region"),
    )


@register(
    "join_range_theta",
    oracle="""
    SELECT
        s_suppkey,
        COUNT(c_custkey) AS n_peer_customers
    FROM supplier
    LEFT JOIN customer
      ON c_acctbal BETWEEN s_acctbal - 100 AND s_acctbal + 100
    GROUP BY s_suppkey
    """,
    tags=("J5", "J6"),
)
def join_range_theta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pure range-predicate theta join (J5/J6): customers whose balance is
    within ±100 of each supplier's. Physically BroadcastNestedLoopJoin with
    the supplier side broadcast; the scale path for big×big range joins is
    bucketing both sides by floor(value/width) and equi-joining adjacent
    buckets (same trick as the LSH band join, X3)."""
    supplier = load_table(spark, sf_dir, "supplier")
    customer = load_table(spark, sf_dir, "customer")
    cond = F.col("c_acctbal").between(F.col("s_acctbal") - 100, F.col("s_acctbal") + 100)
    return (
        supplier.join(customer, cond, "left")
        .groupBy("s_suppkey")
        .agg(F.count("c_custkey").alias("n_peer_customers"))
    )


@register(
    "join_asof_attribution",
    oracle="""
    WITH clicks AS (
        SELECT user_id, ts, event_id
        FROM (
            SELECT user_id, ts, event_id,
                   ROW_NUMBER() OVER (PARTITION BY user_id, ts ORDER BY event_id DESC) AS rn
            FROM events WHERE event_type = 'click'
        ) WHERE rn = 1
    ),
    purchases AS (
        SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'purchase'
    )
    SELECT
        p.event_id,
        p.user_id,
        p.value,
        c.event_id AS click_event_id,
        c.ts       AS click_ts
    FROM purchases p
    ASOF LEFT JOIN clicks c
      ON p.user_id = c.user_id AND p.ts >= c.ts
    """,
    tags=("J7",),
)
def join_asof_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (J7): attribute each purchase to the user's latest prior
    click. Spark has no ASOF JOIN, so this uses the union+merge composition
    in ``operators.joins.asof_join`` (one sort-merge-shaped pass — see that
    docstring for why the rank-over-pairs alternative dies at scale). The
    oracle uses DuckDB's native ASOF LEFT JOIN. Clicks are pre-deduped per
    (user, ts) so the nearest-prior row is unique → deterministic."""
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "ts").orderBy(F.col("event_id").desc())
    clicks = (
        events.filter(F.col("event_type") == "click")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "ts", "event_id")
    )
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    joined = asof_join(
        purchases.withColumnRenamed("event_id", "purchase_event_id"),
        clicks.withColumnRenamed("event_id", "click_event_id").withColumnRenamed(
            "ts", "click_ts"
        ),
        on="user_id",
        left_ts="ts",
        right_ts="click_ts",
        payload=["click_event_id", "click_ts"],
        how="left",
    )
    return joined.select(
        F.col("purchase_event_id").alias("event_id"),
        "user_id",
        "value",
        "click_event_id",
        "click_ts",
    )


@register(
    "q10_returned_items",
    oracle=f"""
    SELECT
        c_custkey,
        c_name,
        {_REVENUE} AS revenue,
        n_name
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE l_returnflag = 'R'
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY c_custkey, c_name, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
    tags=("J1", "A1", "O2"),
    bench=True,
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10-shaped: customers who returned the most revenue. Fact-fact
    shuffle on orderkey; nation (bounded dim) broadcast, customer left to
    AQE; decimal-exact revenue makes the top-20 ordering
    engine-deterministic."""
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    lineitem = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag") == "R"
    )
    return (
        lineitem.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(F.expr(_REVENUE).alias("revenue"))
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
        .select("c_custkey", "c_name", "revenue", "n_name")
    )


@register(
    "q07_volume_shipping",
    oracle=f"""
    SELECT
        n1.n_name AS supp_nation,
        n2.n_name AS cust_nation,
        CAST(YEAR(l_shipdate) AS INT) AS l_year,
        {_REVENUE} AS revenue
    FROM lineitem
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation n1 ON s_nationkey = n1.n_nationkey
    JOIN nation n2 ON c_nationkey = n2.n_nationkey
    WHERE n1.n_name <> n2.n_name
    GROUP BY n1.n_name, n2.n_name, YEAR(l_shipdate)
    """,
    tags=("J1", "A1"),
)
def q07_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7-shaped: cross-nation shipping volume by year. Two aliases
    of the same nation dim (supplier-side and customer-side) both carry
    broadcast pins (bounded: 25 rows); supplier/customer are SF-scaling so
    AQE picks their strategy. The year extraction groups the fact rows
    without a second shuffle (same exchange as the aggregate)."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    supplier = load_table(spark, sf_dir, "supplier")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    n1 = nation.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    return (
        lineitem.join(supplier, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(F.expr(_REVENUE).alias("revenue"))
    )


@register(
    "join_skew_split",
    oracle="""
    WITH skewed AS (
        SELECT o_orderkey,
               CASE WHEN o_orderkey % 10 < 3 THEN 7
                    WHEN o_orderkey % 97 = 0 THEN NULL
                    ELSE o_custkey END AS o_custkey
        FROM orders
    )
    SELECT s.o_orderkey, s.o_custkey, c.c_name
    FROM skewed s
    JOIN customer c ON s.o_custkey = c.c_custkey
    """,
    tags=("J1",),
)
def join_skew_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew split-treatment join as a correctness query: 30 % of orders
    re-pointed (deterministically, key-modulo so both engines can plant
    the identical skew) at ONE hot customer plus some NULL keys, joined
    through ``operators.joins.skew_split_join`` (hot keys → broadcast of
    their few build rows, rest → normal join, branches unioned). The
    oracle is the PLAIN join over the same skewed input — proving the
    split treatment is a pure physical rewrite. Measured against the
    other skew regimes in BASELINE.md ("Join skew", round 4)."""
    from reactivestreams_kinesis_spark.operators.joins import skew_split_join

    orders = load_table(spark, sf_dir, "orders")
    skewed = orders.select(
        "o_orderkey",
        F.when(F.col("o_orderkey") % 10 < 3, F.lit(7).cast("bigint"))
        .when(F.col("o_orderkey") % 97 == 0, F.lit(None).cast("bigint"))
        .otherwise(F.col("o_custkey"))
        .alias("o_custkey"),
    )
    customer = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"), "c_name"
    )
    return skew_split_join(
        skewed, customer, "o_custkey", how="inner", hot_keys=[7]
    ).select("o_orderkey", "o_custkey", "c_name")


@register(
    "join_range_binned",
    oracle="""
    SELECT
        s_suppkey,
        COUNT(c_custkey) AS n_peer_customers
    FROM supplier
    LEFT JOIN customer
      ON c_acctbal BETWEEN s_acctbal - 100 AND s_acctbal + 100
    GROUP BY s_suppkey
    """,
    tags=("J5", "J6"),
)
def join_range_binned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The same range join as ``join_range_theta``, through the BINNED
    plan (``operators.joins.range_join``): intervals explode to the ≤2
    width-200 bins they overlap, points hash to one bin, bin equi-join +
    exact refine — a shuffle join instead of |S|×|C| nested-loop
    predicate evaluations. Same oracle as the theta form, so the driver
    proves the rewrite exact; measured 5.8× faster at the x10 tier
    (1.25 s vs 7.22 s — BASELINE.md "Range join", round 4), a gap that
    grows as |S|×|C| while the binned cost stays near-linear. Left
    semantics composed by joining the aggregated inner result back to
    the supplier side. The bin width is DERIVED (round 5): the median
    interval width stats-aggregate picks 200.0 here — exercising the
    default a naive caller gets, instead of a hand-tuned constant."""
    from reactivestreams_kinesis_spark.operators.joins import range_join

    supplier = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey",
        (F.col("s_acctbal") - 100).alias("lo"),
        (F.col("s_acctbal") + 100).alias("hi"),
    )
    customer = load_table(spark, sf_dir, "customer").select("c_custkey", "c_acctbal")
    inner = range_join(supplier, customer, "lo", "hi", "c_acctbal")
    counts = inner.groupBy("s_suppkey").agg(
        F.count("c_custkey").alias("n_peer_customers")
    )
    return (
        load_table(spark, sf_dir, "supplier")
        .select("s_suppkey")
        .join(counts, "s_suppkey", "left")
        .select(
            "s_suppkey",
            F.coalesce("n_peer_customers", F.lit(0)).alias("n_peer_customers"),
        )
    )


register_sql(
    "join_fuzzy_blocked",
    """
    SELECT a.p_partkey AS key_a, b.p_partkey AS key_b,
           a.p_name AS name_a, b.p_name AS name_b,
           a.p_brand AS brand,
           levenshtein(a.p_name, b.p_name) AS dist
    FROM part a JOIN part b
      ON a.p_brand = b.p_brand AND a.p_size = b.p_size
     AND a.p_partkey < b.p_partkey
    WHERE levenshtein(a.p_name, b.p_name) <= 4
    """,
    tables=["part"],
    tags=("J5", "X3", "P3"),
    doc="""Blocked fuzzy-match join — record linkage by edit distance,
    the entity-resolution dual of the token-based near-dup family
    (MinHash/SimHash match shared CONTENT; levenshtein matches near-equal
    SHORT STRINGS — names, titles, product labels — where one typo is a
    whole shingle gone). The quadratic is tamed exactly like every
    similarity join in this repo: a cheap equality BLOCK first (brand ×
    size — an ordinary equi-join Catalyst shuffles on the block key), the
    expensive distance only WITHIN blocks, and `p_partkey <` for pair
    canonicalization. Both engines run the identical SQL text
    (levenshtein is built in to each); distances are exact integers, so
    parity is trivially bit-exact. At 100 TB the block key is the whole
    game: Σ|block|² work, shuffle on the block key, no cross join —
    swap in any blocking scheme (phonetic code, sorted-neighborhood
    window, LSH bucket) without touching the distance stage.""",
)


@register(
    "join_colocated_bucket",
    oracle="""
    SELECT c.c_custkey, c.c_nationkey, o.o_orderkey, o.o_totalprice
    FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
    WHERE NOT (o.o_totalprice > 250000.0)
    """,
    tags=("J1", "S5"),
)
def join_colocated_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SHUFFLE-FREE CO-LOCATED JOIN under the value oracle
    (`sources/colocated.py` — the storage-partitioned join): customer
    and orders each commit bucketed 16 ways on the join key, orders
    takes a merge-on-read delete (pending DVs the per-bucket reads must
    apply), then the join plans ONE task per bucket reading both sides'
    bucket files and hash-joining them with Arrow inside the task — the
    physical plan is a bare BatchScan, no Exchange, no sort (plan-pinned
    in tests/test_colocated_join.py). The oracle is the ordinary SQL
    join over the fixtures: co-location is an execution strategy, never
    a semantics change.

    At 100 TB: the generic plan shuffles BOTH fact tables on the key;
    this plan moves zero rows over the network and scales with the
    largest bucket — the trade Iceberg/Delta users buy with
    bucket-partitioned layouts, here native to the snapshot format."""
    import os
    import tempfile
    import uuid as _uuid

    from reactivestreams_kinesis_spark.operators.snapshots import (
        delete_where,
        snapshot_commit,
    )
    from reactivestreams_kinesis_spark.sources.colocated import colocated_join

    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey"
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    u = _uuid.uuid4().hex[:8]
    lt = scratch_dir("rsk_coloc_l")
    rt = scratch_dir("rsk_coloc_r")
    snapshot_commit(cust, lt, partition_by=[("c_custkey", "bucket", 16)])
    snapshot_commit(orders, rt, partition_by=[("o_custkey", "bucket", 16)])
    delete_where(
        spark, rt, [("o_totalprice", ">", 250000.0)], strategy="merge_on_read"
    )
    return colocated_join(
        spark, lt, rt, left_key="c_custkey", right_key="o_custkey"
    )


@register(
    "join_colocated_sql",
    oracle="""
    SELECT c.c_nationkey,
           COUNT(*) AS n,
           ROUND(CAST(SUM(CAST(o.o_totalprice AS DECIMAL(12,2)))
                 AS DOUBLE), 2) AS rev
    FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
    WHERE o.o_totalprice < 200000.0 AND c.c_nationkey >= 5
    GROUP BY c.c_nationkey
    """,
    tags=("J1", "S5"),
)
def join_colocated_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SQL-ROUTED co-located join (round 12): the literal SELECT a
    user types over two bucket-partitioned warehouse tables routes onto
    the zero-exchange source automatically (`sql_frontend.
    _try_colocated_select`), with the simple one-sided WHERE conjuncts
    PUSHED into the source as pruning predicates (manifest-stats file
    prune + row-exact re-apply) and the aggregate running over the
    routed relation. Mirror twin of `join_colocated_bucket` (the
    Python-API form, driver slot) — this row proves the SQL planner
    hook end-to-end under the value oracle; plan shape (BatchScan +
    zero exchanges below the groupBy) is pinned in
    tests/test_sql_frontend.py.

    At 100 TB this is the statement users actually issue: the layout
    levers pay off without anyone calling colocated_join by hand."""
    from reactivestreams_kinesis_spark.operators.snapshots import (
        snapshot_commit,
    )
    from reactivestreams_kinesis_spark.operators.sql_frontend import (
        SnapshotWarehouse,
    )

    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey"
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey",
        F.col("o_totalprice").cast("decimal(12,2)").alias("o_totalprice"),
    )
    lt = scratch_dir("rsk_colocsql_l")
    rt = scratch_dir("rsk_colocsql_r")
    snapshot_commit(cust, lt, partition_by=[("c_custkey", "bucket", 16)])
    snapshot_commit(orders, rt, partition_by=[("o_custkey", "bucket", 16)])
    wh = SnapshotWarehouse(spark, {"cust": lt, "ords": rt})
    return wh.sql(
        "SELECT c.c_nationkey, COUNT(*) AS n, "
        "ROUND(CAST(SUM(o.o_totalprice) AS DOUBLE), 2) AS rev "
        "FROM cust c JOIN ords o ON c.c_custkey = o.o_custkey "
        "WHERE o.o_totalprice < 200000.0 AND c.c_nationkey >= 5 "
        "GROUP BY c.c_nationkey"
    )


@register(
    "join_dynamic_prune",
    oracle="""
    SELECT o.o_orderkey, o.o_custkey, o.o_totalprice, c.c_acctbal
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    WHERE c.c_nationkey = 3
    """,
    tags=("J1", "S5", "P3"),
)
def join_dynamic_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DYNAMIC FILE PRUNING under the value oracle
    (`operators/joins.py:dynamic_prune_join` — the star-schema DFP
    shape): orders commits as a bucket-partitioned fact snapshot, the
    dim side is customers of ONE nation, and the join derives the dim's
    key set FIRST to plan the fact scan from only matching files
    (bucket tuples + min/max + blooms), broadcasting the dim for the
    row join. Below the key cap it's an exact IN-list; above, the dim
    range — either way the oracle pins that pruning is pure planning:
    the result equals the ordinary join, row for row.

    At 100 TB: the selective-dim query is THE star-schema pattern, and
    metadata-planned file skipping is what keeps the fact side's scan
    proportional to the answer, not to the table."""
    import os
    import tempfile
    import uuid as _uuid

    from reactivestreams_kinesis_spark.operators.snapshots import snapshot_commit

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    dim = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_nationkey") == 3)
        .select("c_custkey", "c_acctbal")
    )
    t = scratch_dir("rsk_dfp_q")
    snapshot_commit(orders, t, partition_by=[("o_custkey", "bucket", 16)])
    j = dynamic_prune_join(spark, t, dim, ("o_custkey", "c_custkey"))
    return j.select("o_orderkey", "o_custkey", "o_totalprice", "c_acctbal")


@register(
    "join_colocated_agg",
    oracle="""
    SELECT c.c_custkey,
           c.c_nationkey,
           COUNT(*) AS n,
           ROUND(CAST(SUM(CAST(o.o_totalprice AS DECIMAL(12,2)))
                 AS DOUBLE), 2) AS spend,
           ROUND(CAST(MAX(CAST(o.o_totalprice AS DECIMAL(12,2)))
                 AS DOUBLE), 2) AS hi
    FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
    WHERE NOT (o.o_totalprice > 350000.0)
    GROUP BY c.c_custkey, c.c_nationkey
    """,
    tags=("J1", "A1", "S5"),
)
def join_colocated_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FUSED STAR ROLLUP under the value oracle
    (`sources/colocated.py:colocated_join_agg`): per-customer order
    count and spend over customer ⋈ orders, both bucketed 16 ways on
    the key, orders carrying a pending merge-on-read delete — joined
    AND aggregated inside each bucket's task (group keys include the
    join key, so every group is bucket-local), one BatchScan, zero
    exchanges end-to-end (plan-pinned in tests/test_colocated_agg.py).
    The oracle is the ordinary join-GROUP BY: fusion is an execution
    strategy, never a semantics change.

    At 100 TB this is the per-entity enrich+rollup: the generic plan
    shuffles both tables for the join and then one partial row per
    group for the aggregate — at entity-grained cardinality (groups ~
    customers) both exchanges move table-scale volume; the fused plan
    moves zero rows over the network."""
    from reactivestreams_kinesis_spark.operators.snapshots import (
        delete_where,
        snapshot_commit,
    )
    from reactivestreams_kinesis_spark.sources.colocated import (
        colocated_join_agg,
    )

    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey"
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        "o_totalprice",
        F.col("o_totalprice").cast("decimal(12,2)").alias("price_d"),
    )
    lt = scratch_dir("rsk_jagg_l")
    rt = scratch_dir("rsk_jagg_r")
    snapshot_commit(cust, lt, partition_by=[("c_custkey", "bucket", 16)])
    snapshot_commit(orders, rt, partition_by=[("o_custkey", "bucket", 16)])
    delete_where(
        spark, rt, [("o_totalprice", ">", 350000.0)], strategy="merge_on_read"
    )
    out = colocated_join_agg(
        spark, lt, rt, left_key="c_custkey", right_key="o_custkey",
        group_by=["c_custkey", "c_nationkey"],
        aggs={
            "n": ("count", None),
            "spend_d": ("sum", "price_d"),
            "hi_d": ("max", "price_d"),
        },
    )
    return out.select(
        "c_custkey",
        "c_nationkey",
        "n",
        F.round(F.col("spend_d").cast("double"), 2).alias("spend"),
        F.round(F.col("hi_d").cast("double"), 2).alias("hi"),
    )
