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
        CAST(SUM(CASE WHEN c_acctbal > 5000 THEN 1 ELSE 0 END) AS BIGINT) AS n_rich
    FROM customer
    GROUP BY c_mktsegment
    """,
    tags=("A1", "A2"),
)
def agg_distinct_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct + conditional aggregation (A2). countDistinct plans as a
    two-stage partial-distinct aggregate — no row explosion at scale.
    The oracle CASTs its SUM(CASE...) to BIGINT: DuckDB widens to HUGEINT
    (pandas float64) while Spark's sum(when...) is int64 — the one type
    drift the driver's strict hash comparison catches."""
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
        ROUND(MAX(l_extendedprice), 6) AS max_price,
        CAST(1 AS INT) AS approx_median_ok
    FROM lineitem
    GROUP BY l_returnflag
    """,
    tags=("A4",),
)
def agg_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact + approximate percentiles (A4). At 100 TB the exact form needs
    a per-group sort; the scale path is ``approx_percentile`` (t-digest-like
    sketch, single pass, mergeable). Exact values are oracle-compared
    bit-for-bit (Spark ``percentile`` ≡ DuckDB ``quantile_cont``); the
    sketch is engine-specific, so it's verified as a BOUNDS CHECK computed
    inside the query: ``approx_median_ok`` = 1 iff the approx median lands
    within 2% of the exact median (the oracle asserts the literal 1).
    A sketch regression flips the flag and fails the driver's value hash."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    exact_median = F.expr("percentile(l_extendedprice, 0.5)")
    approx_median = F.expr("approx_percentile(l_extendedprice, 0.5, 10000)")
    return lineitem.groupBy("l_returnflag").agg(
        F.round(F.expr("percentile(l_quantity, 0.5)"), 6).alias("median_qty"),
        F.round(F.expr("percentile(l_extendedprice, 0.25)"), 6).alias("p25_price"),
        F.round(F.expr("percentile(l_extendedprice, 0.75)"), 6).alias("p75_price"),
        F.round(F.min("l_extendedprice"), 6).alias("min_price"),
        F.round(F.max("l_extendedprice"), 6).alias("max_price"),
        (F.abs(approx_median - exact_median) <= 0.02 * F.abs(exact_median))
        .cast("int")
        .alias("approx_median_ok"),
    )


_SUM_QTY = "CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(12,2))), 2) AS DOUBLE)"
_SUM_TOTAL = "CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(12,2))), 2) AS DOUBLE)"

# ROLLUP and CUBE in one variant-tagged statement (A5): each side is one
# Expand + one shuffle; the UNION ALL is pure concatenation. One SQL text
# runs verbatim on both engines (register_sql).
_ROLLUP_CUBE_SQL = f"""
    SELECT 'rollup' AS variant, l_returnflag AS k1, l_linestatus AS k2,
           COUNT(*) AS n, {_SUM_QTY} AS metric
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    UNION ALL
    SELECT 'cube' AS variant, o_orderstatus AS k1, o_orderpriority AS k2,
           COUNT(*) AS n, {_SUM_TOTAL} AS metric
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
"""

register_sql(
    "agg_rollup_cube",
    _ROLLUP_CUBE_SQL,
    tables=["lineitem", "orders"],
    tags=("A5",),
    doc="""ROLLUP hierarchy totals over lineitem + CUBE over two
    low-cardinality order dims (A5): Catalyst expands each to grouping
    sets in one Expand + single shuffle (not one pass per level).""",
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
        array_to_string(list_sort(list(DISTINCT n_name)), '|') AS nations
    FROM nation
    GROUP BY n_regionkey
    """,
    tags=("A7",),
)
def agg_collect_set(spark: SparkSession, sf_dir: str) -> DataFrame:
    """collect_set with deterministic ordering (A7): ``sort_array`` makes
    the list content deterministic, then ``concat_ws`` serializes it —
    the driver's canonicalizer can't hash list-valued cells, so the
    comparable form is a delimited string on both engines (list semantics
    stay covered by tests/test_streaming.py and the sort_array here).
    At scale collect_* is only safe on bounded-cardinality groups (it
    materializes the group in memory) — this one is ≤25 nations/region."""
    nation = load_table(spark, sf_dir, "nation")
    return nation.groupBy(F.col("n_regionkey").alias("region_key")).agg(
        F.concat_ws("|", F.sort_array(F.collect_set("n_name"))).alias("nations")
    )


@register(
    "agg_approx_count_distinct",
    oracle="""
    SELECT
        l_returnflag,
        COUNT(DISTINCT l_partkey) AS exact_parts,
        COUNT(*) AS n,
        CAST(1 AS INT) AS approx_ok
    FROM lineitem
    GROUP BY l_returnflag
    """,
    tags=("A3",),
)
def agg_approx_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ approximate distinct (A3) — the 100 TB path for
    distinct counting: single pass, fixed memory, mergeable sketches.
    Sketch values are engine-specific, so the driver-checkable form is a
    BOUNDS CHECK inside the query: ``approx_ok`` = 1 iff the HLL++
    estimate (2% rsd config) is within 10% of the exact distinct count
    computed in the same aggregate; the oracle asserts the literal 1.
    HLL is deterministic for a fixed input, so this is a stable check,
    not a flaky one."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    approx = F.approx_count_distinct("l_partkey", 0.02)
    exact = F.countDistinct("l_partkey")
    return lineitem.groupBy("l_returnflag").agg(
        exact.alias("exact_parts"),
        F.count(F.lit(1)).alias("n"),
        (F.abs(approx - exact) <= 0.10 * exact).cast("int").alias("approx_ok"),
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


@register(
    "agg_hll_mergeable",
    oracle="""
    SELECT
        COUNT(DISTINCT o_custkey) AS exact_custs,
        COUNT(DISTINCT date_trunc('month', o_orderdate)) AS n_parts,
        CAST(1 AS INT) AS merged_ok,
        CAST(1 AS INT) AS direct_ok
    FROM orders
    """,
    tags=("A3",),
)
def agg_hll_mergeable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable distinct-count sketches (A3, the incremental path): build
    one DataSketches HLL sketch PER MONTH of orders (`hll_sketch_agg`),
    then union the monthly sketches (`hll_union_agg`) into the global
    distinct-customer estimate — the pattern that lets a 100 TB pipeline
    keep per-day/per-partition sketches (KBs each, mergeable, re-usable)
    and answer "distinct users this quarter" without ever re-scanning:
    merging sketches is associative and lossless, unlike merging counts.
    Sketch bytes are engine-specific, so the driver-checkable form is the
    same bounds pattern as `agg_approx_count_distinct`: `merged_ok` /
    `direct_ok` assert the union-of-parts estimate AND the single-pass
    estimate each land within 10% of the exact count (deterministic for
    fixed input). The month count rides along so the oracle pins that the
    merge actually spanned multiple partitions."""
    orders = load_table(spark, sf_dir, "orders")
    monthly = orders.groupBy(
        F.trunc("o_orderdate", "month").alias("m")
    ).agg(F.hll_sketch_agg("o_custkey").alias("sk"))
    merged = monthly.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("merged_est"),
        F.count(F.lit(1)).alias("n_parts"),
    )
    direct = orders.agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("o_custkey")).alias("direct_est"),
        F.countDistinct("o_custkey").alias("exact_custs"),
    )
    return direct.crossJoin(merged).select(
        "exact_custs",
        "n_parts",
        (F.abs(F.col("merged_est") - F.col("exact_custs")) <= 0.10 * F.col("exact_custs"))
        .cast("int")
        .alias("merged_ok"),
        (F.abs(F.col("direct_est") - F.col("exact_custs")) <= 0.10 * F.col("exact_custs"))
        .cast("int")
        .alias("direct_ok"),
    )


register_sql(
    "agg_moments_exact",
    """
    WITH s AS (
        SELECT l_returnflag,
               COUNT(*) AS n,
               CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sq,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sp,
               CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))
                        * CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sqq,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                        * CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS spp,
               CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))
                        * CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sqp
        FROM lineitem
        GROUP BY l_returnflag
    )
    SELECT l_returnflag, n,
           ROUND(sq / n, 6) AS mean_qty,
           ROUND((n * sqq - sq * sq) / (CAST(n AS DOUBLE) * n), 6) AS var_qty,
           ROUND((n * sqp - sq * sp) / (CAST(n AS DOUBLE) * n), 6)
               AS covar_qty_price,
           ROUND((n * sqp - sq * sp)
                 / (SQRT(n * sqq - sq * sq) * SQRT(n * spp - sp * sp)), 6)
               AS corr_qty_price
    FROM s
    """,
    tables=["lineitem"],
    tags=("A1", "A6"),
    doc="""Statistical moments with EXACT cross-engine parity (A-family
    depth): population variance, covariance, and Pearson correlation of
    (quantity, price) per return flag — computed from exact DECIMAL power
    sums (n, Σx, Σx², Σxy), so the only engine-dependent step (float
    summation order) never happens: sums are decimal-exact, and every
    double operation after the cast evaluates the same formula on
    identical values. This is also the SCALABLE form: power sums are one
    map-side-combining aggregate (mergeable across partitions — unlike
    two-pass mean-then-deviation variance), the textbook single-pass
    moment pattern. Native F.corr/F.var_pop float-fold in engine-specific
    order and cannot be oracle-checked bit-exactly; this can.""",
)


ROLLUP_WEEK_ORACLE = """
    SELECT
        date_trunc('week', CAST(ts AS TIMESTAMP)) AS wk,
        event_type,
        COUNT(*) AS n,
        CAST(ROUND(SUM(CAST(value AS DECIMAL(18,6))), 6) AS DOUBLE) AS sum_value,
        MIN(value) AS min_value,
        MAX(value) AS max_value,
        CAST(ROUND(SUM(CAST(value AS DECIMAL(18,6))) / COUNT(*), 6) AS DOUBLE)
            AS avg_value
    FROM events
    GROUP BY 1, 2
    """


def merge_day_partials_to_week(daily: DataFrame) -> DataFrame:
    """Merge a day-grain partial-aggregate table (d, event_type, n,
    sum_dec, min_value, max_value) up to the week answer — shared by the
    batch rollup query and its streaming-maintenance twin so the merge
    arithmetic cannot drift between them."""
    return (
        daily.groupBy(F.date_trunc("week", "d").alias("wk"), "event_type")
        .agg(
            F.sum("n").alias("n"),
            F.sum("sum_dec").alias("merged_dec"),
            F.min("min_value").alias("min_value"),
            F.max("max_value").alias("max_value"),
        )
        .select(
            "wk",
            "event_type",
            "n",
            F.expr("CAST(ROUND(merged_dec, 6) AS DOUBLE)").alias("sum_value"),
            "min_value",
            "max_value",
            F.expr("CAST(ROUND(merged_dec / n, 6) AS DOUBLE)").alias("avg_value"),
        )
    )


@register("agg_rollup_merge", oracle=ROLLUP_WEEK_ORACLE, tags=("A1", "A6"))
def agg_rollup_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Materialized-rollup maintenance (A1/A6, the incremental path for
    sums — `agg_hll_mergeable`'s counterpart for plain aggregates): a
    DAY-grain partial-aggregate table (count / decimal sum / min / max —
    every one mergeable) is MERGED up to the WEEK answer instead of
    re-aggregating raw events (the fixture spans one month, so weeks
    give the merge 5 serving groups over 30 daily partials); avg is
    derived at merge time as sum/count, never averaged-of-averages. The
    oracle computes the week grain DIRECTLY from raw events, proving the
    two-level decomposition
    exact — the identity that lets a 100 TB pipeline maintain per-day
    partials (re-aggregating only new partitions on ingest) and serve
    any coarser rollup from KBs of partials with zero raw re-scans.
    Decimal sums make the merge associativity exact; a double sum would
    drift between the one-pass and two-pass groupings."""
    events = load_table(spark, sf_dir, "events")
    daily = events.groupBy(
        F.date_trunc("day", "ts").alias("d"), "event_type"
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("value").cast("decimal(18,6)")).alias("sum_dec"),
        F.min("value").alias("min_value"),
        F.max("value").alias("max_value"),
    )
    return merge_day_partials_to_week(daily)


@register(
    "agg_quantile_kmv_sketch",
    oracle="""
    WITH sketch AS (
        SELECT o_totalprice
        FROM orders
        ORDER BY md5(CAST(o_orderkey AS VARCHAR))
        LIMIT 512
    ),
    ranked AS (
        SELECT o_totalprice,
               ROW_NUMBER() OVER (ORDER BY o_totalprice) AS r,
               COUNT(*) OVER () AS k
        FROM sketch
    )
    SELECT
        MAX(CASE WHEN r = CAST(CEIL(0.5 * k) AS BIGINT) THEN o_totalprice END) AS p50,
        MAX(CASE WHEN r = CAST(CEIL(0.9 * k) AS BIGINT) THEN o_totalprice END) AS p90,
        MAX(CASE WHEN r = CAST(CEIL(0.99 * k) AS BIGINT) THEN o_totalprice END) AS p99,
        CAST(MAX(k) AS BIGINT) AS sample_k
    FROM ranked
    """,
    tags=("A4", "A6", "W1"),
)
def agg_quantile_kmv_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGEABLE QUANTILE SKETCH — percentiles that ROLL UP. The sketch
    is a bottom-k (KMV) hash sample: the k rows with the smallest
    md5(orderkey) are a deterministic uniform sample, and bottom-k is
    an exact semilattice — merge(bottom-k(A), bottom-k(B)) ≡
    bottom-k(A ∪ B) — so per-partition sketches merge hierarchically
    to the same sketch a flat pass builds, which is the property
    percentile rollups at 100 TB need (t-digest/KLL give it
    approximately; KMV gives it EXACTLY, engine-portably, no RNG).

    Spark builds per-month sketches first (rank by hash within month,
    keep k), merges them by re-ranking the union (the rollup path a
    day→week→month pipeline would run), then reads the 50/90/99th
    percentiles off the merged sample. The ORACLE builds the flat
    global sketch in one pass — the two agree only if the merge is
    lossless, so the hash pins the mergeability invariant itself, not
    just the numbers. Estimates are sample-exact (deterministic), with
    the usual KMV error vs the true quantiles (k=512 → ~±2%% rank
    error at 95%% confidence; the exact forms live in
    `agg_percentiles`)."""
    from pyspark.sql import Window

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_totalprice"
    )
    k = 512
    h = F.md5(F.col("o_orderkey").cast("string"))
    month = F.date_format("o_orderdate", "yyyy-MM")
    per_month = orders.select(
        month.alias("m"), h.alias("h"), "o_totalprice"
    ).withColumn(
        "r", F.row_number().over(Window.partitionBy("m").orderBy("h"))
    ).filter(F.col("r") <= k)
    merged = (
        per_month.withColumn(
            "g", F.row_number().over(Window.orderBy("h"))
        ).filter(F.col("g") <= k)
    )
    ranked = merged.select(
        "o_totalprice",
        F.row_number().over(Window.orderBy("o_totalprice")).alias("r"),
        F.count(F.lit(1)).over(Window.partitionBy()).alias("k"),
    )
    pick = lambda q: F.max(
        F.when(
            F.col("r") == F.ceil(F.lit(q) * F.col("k")).cast("bigint"),
            F.col("o_totalprice"),
        )
    )
    return ranked.agg(
        pick(0.5).alias("p50"),
        pick(0.9).alias("p90"),
        pick(0.99).alias("p99"),
        F.max("k").cast("bigint").alias("sample_k"),
    )


@register(
    "agg_colocated_groupby",
    oracle="""
    SELECT o_custkey,
           COUNT(*) AS n,
           COUNT(o_orderdate) AS n_dates,
           ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2)))
                 AS DOUBLE), 2) AS spend,
           ROUND(CAST(MIN(CAST(o_totalprice AS DECIMAL(12,2)))
                 AS DOUBLE), 2) AS lo,
           ROUND(CAST(MAX(CAST(o_totalprice AS DECIMAL(12,2)))
                 AS DOUBLE), 2) AS hi,
           AVG(o_orderkey) AS avg_key
    FROM orders
    WHERE NOT (o_totalprice > 400000.0)
    GROUP BY o_custkey
    """,
    tags=("A1", "A6", "S5"),
)
def agg_colocated_groupby(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ZERO-EXCHANGE GROUP BY over a bucket-partitioned table
    (`sources/colocated.py:colocated_groupby` — the aggregation sibling
    of the co-located join): orders commits bucketed 16 ways on
    o_custkey, takes a merge-on-read delete (pending DVs the per-bucket
    reads must apply), then the per-customer rollup aggregates INSIDE
    each bucket's scan task with Arrow's group_by kernel — the physical
    plan is a bare BatchScan, no partial/final HashAggregate pair, no
    Exchange (plan-pinned in tests/test_colocated_agg.py). The oracle
    is the plain SQL GROUP BY: bucket-locality is an execution
    strategy, never a semantics change.

    At 100 TB: a per-user/per-document rollup has ~as many groups as
    rows, so the generic plan's exchange moves nearly the whole table;
    with the bucket key among the group keys every group lives wholly
    in one bucket and that exchange is deleted. AVG rides as exact
    sum+count partials divided at the end; the double rounding is
    display-only."""
    from reactivestreams_kinesis_spark.operators.snapshots import (
        delete_where,
        snapshot_commit,
    )
    from reactivestreams_kinesis_spark.queries.registry import scratch_dir
    from reactivestreams_kinesis_spark.sources.colocated import colocated_groupby

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        "o_totalprice",
        "o_orderdate",
        F.col("o_totalprice").cast("decimal(12,2)").alias("price_d"),
    )
    t = scratch_dir("rsk_bagg")
    snapshot_commit(orders, t, partition_by=[("o_custkey", "bucket", 16)])
    delete_where(
        spark, t, [("o_totalprice", ">", 400000.0)], strategy="merge_on_read"
    )
    out = colocated_groupby(
        spark,
        t,
        group_by=["o_custkey"],
        aggs={
            "n": ("count", None),
            "n_dates": ("count", "o_orderdate"),
            "spend_d": ("sum", "price_d"),
            "lo_d": ("min", "price_d"),
            "hi_d": ("max", "price_d"),
            # AVG over an exactly-float64-summable integer column: the
            # engine's sum+count/divide and the oracle's AVG agree
            # bit-for-bit (money avg would hit double-rounding ties)
            "avg_key": ("avg", "o_orderkey"),
        },
    )
    return out.select(
        "o_custkey",
        "n",
        "n_dates",
        F.round(F.col("spend_d").cast("double"), 2).alias("spend"),
        F.round(F.col("lo_d").cast("double"), 2).alias("lo"),
        F.round(F.col("hi_d").cast("double"), 2).alias("hi"),
        "avg_key",
    )
