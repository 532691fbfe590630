"""Relational core: projections, filters, computed columns, basic aggregation.

SURVEY.md §2.3 (P2-P4) + §2.5 (A1). The reference engine exposes none of
these (it streams opaque records — ``ShardSubscription.java:169-176`` emits
``Record`` blobs untouched); they are [MANDATE] operators from the north-star
plus the consumer-side decode lineage (P1, ``ShardProducerSpec.scala:41-42``).

Float-determinism policy (applies to every money aggregate in this repo):
source money/ratio columns are doubles holding ≤2-decimal values, so we cast
to DECIMAL, do the arithmetic exactly (sums are then order-independent and
engine-independent), ROUND in the decimal domain (half-up in both Spark and
DuckDB for positives), and only then cast to DOUBLE for a stable output
schema. Rounding raw double sums instead is a trap: accumulation order
differs between engines and ROUND-at-a-half-boundary flips (observed locally:
``ROUND(o_totalprice * 1.1, 2)`` → 9168.01 vs 9168.0). The shared SQL
fragments below (_QTY/_PRICE/_DISC/_TAX and the full aggregate lists) are
used verbatim by both the Spark plan (``F.expr``) and the DuckDB oracle so
the decimal domain cannot drift; where the Spark plan uses a different
*shape* than the oracle (q01's factored aggregation), the rewrite is exact
decimal algebra over those same fragments, never a float re-derivation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from reactivestreams_kinesis_spark.catalog import load_table
from reactivestreams_kinesis_spark.queries.registry import register, register_sql, scratch_dir

# Exact-decimal aggregate fragments shared by Spark expr and DuckDB oracle.
_QTY = "CAST(l_quantity AS DECIMAL(12,2))"
_PRICE = "CAST(l_extendedprice AS DECIMAL(12,2))"
_DISC = "CAST(l_discount AS DECIMAL(4,2))"
_TAX = "CAST(l_tax AS DECIMAL(4,2))"
Q1_AGGS = f"""
        CAST(ROUND(SUM({_QTY}), 2) AS DOUBLE)                              AS sum_qty,
        CAST(ROUND(SUM({_PRICE}), 2) AS DOUBLE)                            AS sum_base_price,
        CAST(ROUND(SUM({_PRICE} * (1 - {_DISC})), 2) AS DOUBLE)            AS sum_disc_price,
        CAST(ROUND(SUM({_PRICE} * (1 - {_DISC}) * (1 + {_TAX})), 2) AS DOUBLE) AS sum_charge,
        ROUND(CAST(SUM({_QTY}) AS DOUBLE) / COUNT(*), 6)                   AS avg_qty,
        ROUND(CAST(SUM({_PRICE}) AS DOUBLE) / COUNT(*), 6)                 AS avg_price,
        ROUND(CAST(SUM({_DISC}) AS DOUBLE) / COUNT(*), 6)                  AS avg_disc,
        COUNT(*)                                                           AS count_order
"""


@register(
    "q01_pricing_summary",
    oracle=f"""
    SELECT
        l_returnflag,
        l_linestatus,
        {Q1_AGGS}
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
    tags=("P3", "A1", "A6", "O1"),
    bench=True,
)
def q01_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-shaped pricing summary: scan → filter → hash agg → sort.

    The discounted/charged sums are FACTORED: rows first aggregate by
    (returnflag, linestatus, discount, tax) — discount and tax have ~10
    distinct 2-dp values each, so this subgroup key is bounded at a few
    hundred combinations regardless of data size — and the decimal
    multiplies (1-d), (1-d)(1+t) then run once per subgroup instead of
    once per row. Decimal arithmetic is exact, so
    SUM(p·(1-d)·(1+t)) ≡ Σ_{d,t}(1-d)(1+t)·Σp bit-for-bit against the
    oracle's straightforward per-row form (verified at every SF); per-row
    work drops to two decimal CASTs + sums (a direct A/B at sf0.1
    measured 0.93 s → 0.81 s for the agg stage; headline bench totals are
    stage-launch-noise-dominated at this SF, so the win shows there only
    at larger data — the multiply count is O(subgroups) vs O(rows)). Both
    aggregation levels are partial-first: the extra level adds one
    exchange of ≤ a-few-hundred rows per task. The oracle keeps the
    straightforward per-row Q1_AGGS form; both sides share the _QTY /
    _PRICE / _DISC / _TAX cast fragments so the decimal domain cannot
    drift.

    Scale notes: filter + column pruning push to the parquet scan; at
    100 TB the scan dominates and parallelism is limited only by input
    splits.
    """
    lineitem = load_table(spark, sf_dir, "lineitem")
    sub = (
        lineitem.filter(
            F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp")
        )
        .groupBy("l_returnflag", "l_linestatus", "l_discount", "l_tax")
        .agg(
            F.expr(f"SUM({_QTY})").alias("s_qty"),
            F.expr(f"SUM({_PRICE})").alias("s_price"),
            F.count(F.lit(1)).alias("n"),
        )
    )
    return (
        sub.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.expr("CAST(ROUND(SUM(s_qty), 2) AS DOUBLE)").alias("sum_qty"),
            F.expr("CAST(ROUND(SUM(s_price), 2) AS DOUBLE)").alias("sum_base_price"),
            F.expr(
                f"CAST(ROUND(SUM(s_price * (1 - {_DISC})), 2) AS DOUBLE)"
            ).alias("sum_disc_price"),
            F.expr(
                f"CAST(ROUND(SUM(s_price * (1 - {_DISC}) * (1 + {_TAX})), 2) AS DOUBLE)"
            ).alias("sum_charge"),
            F.expr("ROUND(CAST(SUM(s_qty) AS DOUBLE) / SUM(n), 6)").alias("avg_qty"),
            F.expr("ROUND(CAST(SUM(s_price) AS DOUBLE) / SUM(n), 6)").alias(
                "avg_price"
            ),
            F.expr(f"ROUND(CAST(SUM({_DISC} * n) AS DOUBLE) / SUM(n), 6)").alias(
                "avg_disc"
            ),
            F.sum("n").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


_FEE = "CAST(ROUND(CAST(o_totalprice AS DECIMAL(12,2)) * 1.1, 2) AS DOUBLE)"


@register(
    "rel_projection_compute",
    oracle=f"""
    SELECT
        o_orderkey,
        o_custkey,
        {_FEE}                       AS price_with_fee,
        CASE WHEN o_totalprice >= 200000 THEN 'big'
             WHEN o_totalprice >= 50000 THEN 'mid'
             ELSE 'small' END        AS price_band,
        o_orderstatus = 'F'          AS is_finished
    FROM orders
    """,
    tags=("P2", "P4"),
)
def rel_projection_compute(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Projection + computed columns (P2, P4): pure narrow map, no shuffle.

    ``ReadSchema`` in the physical plan must show only the 4 source columns.
    """
    orders = load_table(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey",
        "o_custkey",
        F.expr(_FEE).alias("price_with_fee"),
        F.when(F.col("o_totalprice") >= 200000, "big")
        .when(F.col("o_totalprice") >= 50000, "mid")
        .otherwise("small")
        .alias("price_band"),
        (F.col("o_orderstatus") == "F").alias("is_finished"),
    )


@register(
    "rel_filter_predicates",
    oracle="""
    SELECT c_custkey, c_name, c_mktsegment, c_acctbal
    FROM customer
    WHERE c_mktsegment IN ('BUILDING', 'AUTOMOBILE')
      AND c_acctbal BETWEEN 0 AND 9000
      AND c_name LIKE 'Customer%'
      AND c_nationkey IS NOT NULL
    """,
    tags=("P3",),
)
def rel_filter_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Predicate mix (P3): IN / range / LIKE / null-check — all of which
    Catalyst pushes into the parquet scan (visible as ``PushedFilters``).
    ``c_acctbal`` passes through unmodified (no arithmetic → bit-identical)."""
    customer = load_table(spark, sf_dir, "customer")
    return customer.filter(
        F.col("c_mktsegment").isin("BUILDING", "AUTOMOBILE")
        & F.col("c_acctbal").between(0, 9000)
        & F.col("c_name").like("Customer%")
        & F.col("c_nationkey").isNotNull()
    ).select("c_custkey", "c_name", "c_mktsegment", "c_acctbal")


@register(
    "rel_decode_take",
    oracle="""
    SELECT event_id, event_type, CAST(props AS VARCHAR) AS payload_text
    FROM events
    ORDER BY event_id
    LIMIT 10
    """,
    tags=("P1", "F4", "F9", "O2"),
)
def rel_decode_take(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's canonical consumer flow, batch analog: source →
    ordered take(N) → decode payload.

    Lineage: commented integration test ``ShardProducerSpec.scala:40-44``
    (``Flow(kinesis).take(3).map(bytes → String)``), limit semantics
    ``ShardSubscription.java:67-68,174-182`` (F4), per-shard
    sequence-number order ``ShardSubscription.java:163-171`` (F9) — here
    ``event_id`` plays the sequence-number role. Catalyst compiles
    orderBy+limit to TakeOrderedAndProject (no global sort at scale).
    """
    events = load_table(spark, sf_dir, "events")
    return (
        events.orderBy("event_id")
        .limit(10)
        .select(
            "event_id",
            "event_type",
            F.col("props").cast("string").alias("payload_text"),
        )
    )


_SCALAR_SUBQUERY_SQL = """
    SELECT
        c_custkey,
        c_acctbal,
        (SELECT MAX(o_totalprice) FROM orders WHERE o_custkey = c_custkey)
            AS max_order_value,
        c_acctbal > (SELECT AVG(c2.c_acctbal) FROM customer c2)
            AS above_avg_balance
    FROM customer
"""

register_sql(
    "rel_scalar_subquery",
    _SCALAR_SUBQUERY_SQL,
    tables=["customer", "orders"],
    tags=("P4", "J3"),
    doc="""Correlated + uncorrelated scalar subqueries: Catalyst
    de-correlates the per-customer MAX into an aggregate+join and the
    global AVG becomes a broadcast scalar — the same de-correlation DuckDB
    applies, so results match exactly. One SQL text, both engines
    (register_sql).""",
)


@register(
    "rel_winsorize",
    oracle="""
    WITH ranked AS (
        SELECT l_returnflag, l_extendedprice,
               ROW_NUMBER() OVER (PARTITION BY l_returnflag
                                  ORDER BY l_extendedprice) AS rn,
               COUNT(*) OVER (PARTITION BY l_returnflag) AS n
        FROM lineitem
    ),
    pct AS (
        SELECT l_returnflag,
               MIN(CASE WHEN rn = (n * 5 + 99) // 100 THEN l_extendedprice END) AS p05,
               MIN(CASE WHEN rn = (n * 95 + 99) // 100 THEN l_extendedprice END) AS p95
        FROM ranked GROUP BY l_returnflag
    )
    SELECT
        l.l_orderkey,
        l.l_linenumber,
        l.l_returnflag,
        l.l_extendedprice AS price,
        LEAST(GREATEST(l.l_extendedprice, p.p05), p.p95) AS price_winsorized,
        (l.l_extendedprice < p.p05 OR l.l_extendedprice > p.p95) AS clipped
    FROM lineitem l
    JOIN pct p ON l.l_returnflag = p.l_returnflag
    """,
    tags=("A4", "P4", "J1", "W1"),
)
def rel_winsorize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group winsorization (percentile clipping): values are clamped
    to their group's [p05, p95] — the standard outlier treatment before
    feature normalization in a training-data pipeline.

    The cut points are DISCRETE (type-1) quantiles — the element at rank
    ceil(q·n), with the rank computed in pure integer arithmetic
    ((n·5+99) integer-div 100) on both engines. That makes the whole query
    arithmetic-free on doubles: cut points are actual data elements, the
    clamp picks raw values, nothing is rounded — bit-exact against the
    oracle by construction, unlike interpolated ``percentile`` +
    ``ROUND(double)`` whose last-ulp behavior is engine-dependent (the
    float-determinism trap in this module's docstring). A double literal
    like 0.05·n is avoided deliberately: DuckDB parses 0.05 as DECIMAL
    while Spark uses binary double, and ceil() of the two can differ at
    exact-integer boundaries.

    Scale shape: the rank pass is one per-group sort (the same cost exact
    percentiles pay), reduced to one row per group and broadcast back
    onto the fact scan — the clip itself is a row-local map, no second
    shuffle of the data. The broadcast hint is safe: group cardinality is
    bounded by the key's domain (3 return flags), not by data volume. At
    100 TB the drop-in path is ``approx_percentile`` (returns actual
    elements too) with a bounds-checked sketch, trading the sort for a
    single pass.
    """
    lineitem = load_table(spark, sf_dir, "lineitem")
    w_rank = Window.partitionBy("l_returnflag").orderBy("l_extendedprice")
    w_all = Window.partitionBy("l_returnflag")
    ranked = lineitem.select(
        "l_returnflag",
        "l_extendedprice",
        F.row_number().over(w_rank).alias("rn"),
        F.count(F.lit(1)).over(w_all).alias("n"),
    )
    k05 = F.expr("(n * 5 + 99) div 100")
    k95 = F.expr("(n * 95 + 99) div 100")
    pct = ranked.groupBy("l_returnflag").agg(
        F.min(F.when(F.col("rn") == k05, F.col("l_extendedprice"))).alias("p05"),
        F.min(F.when(F.col("rn") == k95, F.col("l_extendedprice"))).alias("p95"),
    )
    return lineitem.join(F.broadcast(pct), "l_returnflag").select(
        "l_orderkey",
        "l_linenumber",
        "l_returnflag",
        F.col("l_extendedprice").alias("price"),
        F.least(
            F.greatest(F.col("l_extendedprice"), F.col("p05")), F.col("p95")
        ).alias("price_winsorized"),
        (
            (F.col("l_extendedprice") < F.col("p05"))
            | (F.col("l_extendedprice") > F.col("p95"))
        ).alias("clipped"),
    )


register_sql(
    "rel_skew_profile",
    """
    WITH per_key AS (
        SELECT l_suppkey AS key, COUNT(*) AS cnt
        FROM lineitem GROUP BY l_suppkey
    ),
    ranked AS (
        SELECT key, cnt,
               ROW_NUMBER() OVER (ORDER BY cnt DESC, key) AS rk,
               COUNT(*) OVER () AS n_keys,
               MAX(cnt) OVER () AS max_cnt,
               MIN(cnt) OVER () AS min_cnt,
               CAST(SUM(cnt) OVER () AS BIGINT) AS n_rows
        FROM per_key
    )
    SELECT rk, key, cnt, n_keys, n_rows,
           ROUND(CAST(cnt AS DOUBLE) * n_keys / n_rows, 6) AS skew_factor,
           ROUND(CAST(max_cnt AS DOUBLE) / min_cnt, 6) AS max_min_ratio
    FROM ranked
    WHERE rk <= 5
    """,
    tables=["lineitem"],
    tags=("A1", "W1", "O2"),
    doc="""Join-key skew diagnosis (the measurement that decides between
    plain AQE, `skew_split_join`, and salting — BASELINE.md's join-skew
    remedy ladder assumes you KNOW the hot keys; this query finds them):
    per-key row counts, the 5 heaviest keys with their skew factor
    (count ÷ mean count — 1.0 is perfectly uniform), and the global
    max/min spread. One SQL text runs on both engines. Scale shape: ONE
    fact scan feeding one map-side-combining count per key; rank and
    global stats come from windows over the per-KEY table (dimension
    cardinality — small by definition of a key worth diagnosing), so the
    fact table is read once (the CTE-per-branch form scanned it twice —
    caught by explain). Run it on a join's build/probe keys BEFORE
    choosing a skew remedy.""",
)


@register(
    "rel_cdc_latest_snapshot",
    oracle="""
    SELECT user_id, last_type, epoch_us(CAST(last_ts AS TIMESTAMP)) AS last_ts_us,
           n_changes
    FROM (
        SELECT user_id,
               event_type AS last_type,
               ts AS last_ts,
               COUNT(*) OVER (PARTITION BY user_id) AS n_changes,
               ROW_NUMBER() OVER (
                   PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        FROM events
    )
    WHERE rn = 1 AND last_type <> 'error'
    """,
    tags=("W1", "P3"),
)
def rel_cdc_latest_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Change-data-capture compaction (last-writer-wins snapshot): the
    events table read as a change log — per key (user_id) keep only the
    LATEST change by (ts, event_id), and drop keys whose final record is
    a tombstone ('error' plays the delete op here). This is the
    upsert/delete merge every lakehouse table format performs on read or
    compaction (Delta/Iceberg MERGE, SCD type 1), expressed as the W4
    latest-per-key window — at 100 TB the ROW_NUMBER shuffle is one
    exchange on the key, and a sorted/bucketed layout on (user_id, ts)
    removes even that (SCALING.md layout section). Timestamps compare as
    µs integers so the snapshot hash is engine-exact."""
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    return (
        events.select(
            "user_id",
            F.col("event_type").alias("last_type"),
            F.unix_micros("ts").alias("last_ts_us"),
            F.count(F.lit(1)).over(Window.partitionBy("user_id")).alias("n_changes"),
            F.row_number().over(w).alias("rn"),
        )
        .filter((F.col("rn") == 1) & (F.col("last_type") != "error"))
        .drop("rn")
        .select("user_id", "last_type", "last_ts_us", "n_changes")
    )


@register(
    "rel_scd2_intervals",
    oracle="""
    WITH ordered AS (
        SELECT user_id, event_type,
               epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us,
               event_id,
               LAG(event_type) OVER w AS prev_type
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    changes AS (
        SELECT user_id, event_type, ts_us, event_id
        FROM ordered
        WHERE prev_type IS NULL OR prev_type <> event_type
    )
    SELECT user_id,
           event_type AS attr_value,
           ts_us AS valid_from_us,
           LEAD(ts_us) OVER w2 AS valid_to_us,
           CAST(LEAD(ts_us) OVER w2 IS NULL AS INT) AS is_current
    FROM changes
    WINDOW w2 AS (PARTITION BY user_id ORDER BY ts_us, event_id)
    """,
    tags=("W2", "W3"),
)
def rel_scd2_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension TYPE 2 build (validity intervals from a
    change log): collapse consecutive duplicate attribute values per key
    (lag filter), then close each surviving version's interval with the
    next version's start (lead) — open-ended + is_current on the latest.
    The warehouse pattern that turns an event stream into a
    point-in-time-joinable dimension (the as-of join J7 is its query-side
    dual). Two window passes over one shuffle key; timestamps stay µs
    integers end to end so interval boundaries hash identically in both
    engines."""
    events = load_table(spark, sf_dir, "events")
    return build_scd2_dimension(events)


def build_scd2_dimension(events: DataFrame) -> DataFrame:
    """The SCD2 interval build shared by the batch query above and the
    streaming point-in-time enrichment (``stream_temporal_enrich``):
    change-log → (user_id, attr_value, valid_from_us, valid_to_us,
    is_current). Factored so both consumers provably build the SAME
    dimension."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ordered = events.select(
        "user_id",
        "event_type",
        F.unix_micros("ts").alias("ts_us"),
        "event_id",
        F.lag("event_type").over(w).alias("prev_type"),
    )
    changes = ordered.filter(
        F.col("prev_type").isNull() | (F.col("prev_type") != F.col("event_type"))
    )
    w2 = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    return changes.select(
        "user_id",
        F.col("event_type").alias("attr_value"),
        F.col("ts_us").alias("valid_from_us"),
        F.lead("ts_us").over(w2).alias("valid_to_us"),
        F.lead("ts_us").over(w2).isNull().cast("int").alias("is_current"),
    )


# --- Z-order key under the value oracle (round 6) --------------------------

_Z_BITS = 16
_Z_GRID = 1 << _Z_BITS
_Z_COLS = ("l_partkey", "l_suppkey", "l_quantity")


def _duck_cell(col: str, lo: str, hi: str) -> str:
    span = f"(CASE WHEN {hi} > {lo} THEN {hi} - {lo} ELSE 1.0 END)"
    return (
        f"LEAST({_Z_GRID - 1}, CAST(FLOOR(((CAST({col} AS DOUBLE) - {lo}) "
        f"/ {span}) * {_Z_GRID}) AS BIGINT))"
    )


# the interleave fully unrolled (bits x cols literal terms) so the key is
# one per-row expression — no grouping, which matters because the synthetic
# fixture has duplicate (orderkey, linenumber) pairs and a bit-sum GROUP BY
# would collapse distinct rows
_ZKEY_TERMS = " | ".join(
    f"(((c{i} >> {b}) & 1) << {b * len(_Z_COLS) + i})"
    for b in range(_Z_BITS)
    for i in range(len(_Z_COLS))
)

_ZKEY_ORACLE = f"""
    WITH bounds AS (
        SELECT {", ".join(
            f"CAST(MIN({c}) AS DOUBLE) AS lo{i}, CAST(MAX({c}) AS DOUBLE) AS hi{i}"
            for i, c in enumerate(_Z_COLS)
        )}
        FROM lineitem
    ),
    cells AS (
        SELECT l_orderkey, l_linenumber,
               {", ".join(
                   f"{_duck_cell(c, f'lo{i}', f'hi{i}')} AS c{i}"
                   for i, c in enumerate(_Z_COLS)
               )}
        FROM lineitem, bounds
        WHERE l_orderkey % 37 = 0
    )
    SELECT l_orderkey, l_linenumber, CAST({_ZKEY_TERMS} AS BIGINT) AS zkey
    FROM cells
"""


@register("layout_zorder_key", oracle=_ZKEY_ORACLE, tags=("P4",))
def layout_zorder_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 3-column Morton (Z-order) key under the VALUE ORACLE: the
    branchless magic-mask interleave `interleaved_write` clusters by
    (`operators/layout.py:zorder_expr`, k=3 21-bit ladder) computed per
    row and hash-compared against DuckDB's naive bit-at-a-time
    interleave. A wrong mask constant, a sign-bit overflow (the advisor's
    k·bits > 63 class), or drifted min-max scaling flips key bits and
    breaks the hash — the write-side clustering math gets the same
    bit-exact gate as every query operator. Bounds come from one stats
    aggregate over the full table (literals in the expression, exactly as
    the write path embeds them — float literals round-trip via repr);
    a deterministic 1/37 orderkey sample bounds the output."""
    from reactivestreams_kinesis_spark.operators.layout import zorder_expr

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", *_Z_COLS
    )
    bounds = li.agg(
        *[F.min(c).alias(f"lo_{c}") for c in _Z_COLS],
        *[F.max(c).alias(f"hi_{c}") for c in _Z_COLS],
    ).first()
    mins = {c: bounds[f"lo_{c}"] for c in _Z_COLS}
    maxs = {c: bounds[f"hi_{c}"] for c in _Z_COLS}
    key = zorder_expr(list(_Z_COLS), mins, maxs, bits=_Z_BITS)
    return li.filter(F.col("l_orderkey") % 37 == 0).select(
        "l_orderkey", "l_linenumber", key.alias("zkey")
    )


@register(
    "rel_merge_upsert",
    oracle="""
    WITH base AS (SELECT c_custkey, c_name, c_acctbal FROM customer),
    upd AS (
        SELECT c_custkey, 'U:' || c_name AS c_name,
               c_acctbal + 100.0 AS c_acctbal
        FROM base WHERE c_custkey % 10 = 0
    ),
    ins AS (
        SELECT CAST(1000000 + n_nationkey AS BIGINT) AS c_custkey,
               n_name AS c_name,
               CAST(n_nationkey AS DOUBLE) AS c_acctbal
        FROM nation
    ),
    kept AS (SELECT * FROM base WHERE c_custkey % 10 NOT IN (0, 7))
    SELECT * FROM kept
    UNION ALL SELECT * FROM upd
    UNION ALL SELECT * FROM ins
    """,
    tags=("S5", "J3"),
)
def rel_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Copy-on-write MERGE under the value oracle (the lakehouse
    MERGE INTO, `operators/snapshots.py:merge_upsert`): build a snapshot
    table from customer, apply one merge batch carrying all three clause
    kinds — updates (keys ≡0 mod 10: renamed + rebalanced), deletes
    (keys ≡7 mod 10), inserts (25 nation-derived new keys) — and read
    the committed result. The oracle states the merge SEMANTICS as pure
    SQL over the fixture; one wrongly-rewritten or wrongly-retained file
    in the copy-on-write commit breaks the hash. The table builds fresh
    per call (uuid temp dir) so the merge always applies to a clean v0;
    arithmetic stays IEEE-double (+100.0) so both engines agree bitwise.
    At scale the semi-join file-pruning pass makes the rewrite
    proportional to TOUCHED files, not table size (see merge_upsert)."""
    import os
    import tempfile
    import uuid as _uuid

    from reactivestreams_kinesis_spark.operators.snapshots import (
        merge_upsert,
        read_snapshot,
        snapshot_commit,
    )

    base = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_acctbal"
    )
    t = scratch_dir("rsk_merge_q")
    snapshot_commit(base.repartitionByRange(8, "c_custkey"), t)

    upd = base.filter(F.col("c_custkey") % 10 == 0).select(
        "c_custkey",
        F.concat(F.lit("U:"), F.col("c_name")).alias("c_name"),
        (F.col("c_acctbal") + F.lit(100.0)).alias("c_acctbal"),
        F.lit(False).alias("_del"),
    )
    dels = base.filter(F.col("c_custkey") % 10 == 7).select(
        "c_custkey",
        F.lit(None).cast("string").alias("c_name"),
        F.lit(None).cast("double").alias("c_acctbal"),
        F.lit(True).alias("_del"),
    )
    ins = load_table(spark, sf_dir, "nation").select(
        (F.lit(1000000) + F.col("n_nationkey")).cast("bigint").alias("c_custkey"),
        F.col("n_name").alias("c_name"),
        F.col("n_nationkey").cast("double").alias("c_acctbal"),
        F.lit(False).alias("_del"),
    )
    merge_upsert(
        spark, t, upd.unionByName(dels).unionByName(ins), "c_custkey",
        delete_col="_del",
    )
    return read_snapshot(spark, t).select("c_custkey", "c_name", "c_acctbal")


register_sql(
    "rel_recursive_hierarchy",
    """
    WITH RECURSIVE chain (node, root, depth) AS (
        SELECT c_custkey, c_custkey, 0
        FROM customer WHERE c_custkey < 10
        UNION ALL
        SELECT c.c_custkey, ch.root, ch.depth + 1
        FROM customer c
        JOIN chain ch
          ON CAST(FLOOR(c.c_custkey / 10) AS BIGINT) = ch.node
        WHERE c.c_custkey >= 10
    )
    SELECT root, depth,
           COUNT(*) AS n_nodes,
           CAST(SUM(node) AS BIGINT) AS sum_keys,
           MIN(node) AS min_key,
           MAX(node) AS max_key
    FROM chain
    GROUP BY root, depth
    """,
    tables=["customer"],
    tags=("J1", "A1", "O1"),
    doc="""Recursive CTE (Spark 4's WITH RECURSIVE — the iterative-query
    family): transitive closure over a derived decimal-digit hierarchy
    (parent(k) = k div 10, so every customer key chains to a single-digit
    root in ≤ log10(maxkey) steps), aggregated per (root, depth) so the
    oracle value-checks every level of the traversal. ONE SQL text both
    engines run verbatim (register_sql). Spark executes the recursion as
    iterated joins under the same Catalyst plan machinery as everything
    else — each level is an equi-join against the previous frontier, so
    at scale the shuffle key is the parent key and AQE sizes each level's
    exchange; depth is data-bounded (≤6 at any fixture SF), far under
    spark.sql.cteRecursionLevelLimit.""",
)


@register(
    "rel_mor_delete",
    oracle="""
    SELECT c_custkey, c_nationkey, c_acctbal
    FROM customer
    WHERE NOT (c_acctbal < 0.0) AND NOT (c_custkey <= 200)
    """,
    tags=("S5", "P3", "J3"),
)
def rel_mor_delete(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merge-on-read DELETE under the value oracle (the Delta
    deletion-vector / Iceberg position-delete shape,
    `operators/snapshots.py:delete_where(strategy="merge_on_read")`):
    build a snapshot table from customer, stack TWO MoR deletes —
    negative balances, then low keys — and read the tip. Neither delete
    rewrites a data file; the manifest attaches (file, pos) delete sets,
    and the read applies them as a scan-time anti-join on
    (_metadata.file_path, row_index). The oracle states the end state as
    plain filters, so a wrong or missing position anywhere — recorded
    against the wrong file, not deduped across the stacked deletes,
    dropped by the reader — breaks the hash. The table builds fresh per
    call (uuid temp dir), so the deletes always stack on a clean v0.

    At 100 TB this is the GDPR-erasure / CDC-retraction path: write cost
    proportional to DELETED ROWS (position files), zero data rewritten,
    read-side cost one anti-join against a delete set AQE broadcasts
    until compaction materializes it (see SCALING.md)."""
    import os
    import tempfile
    import uuid as _uuid

    from reactivestreams_kinesis_spark.operators.snapshots import (
        delete_where,
        read_snapshot,
        snapshot_commit,
    )

    base = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey", "c_acctbal"
    )
    t = scratch_dir("rsk_mor_q")
    snapshot_commit(base.repartitionByRange(8, "c_custkey"), t)
    delete_where(spark, t, [("c_acctbal", "<", 0.0)], strategy="merge_on_read")
    delete_where(spark, t, [("c_custkey", "<=", 200)], strategy="merge_on_read")
    return read_snapshot(spark, t).select("c_custkey", "c_nationkey", "c_acctbal")


@register(
    "rel_eq_delete",
    oracle="""
    SELECT c_custkey, c_nationkey, c_acctbal
    FROM customer WHERE c_nationkey NOT IN (3, 7)
    UNION ALL
    SELECT c_custkey, c_nationkey, c_acctbal
    FROM customer WHERE c_nationkey = 3 AND c_custkey <= 500
    """,
    tags=("S5", "J3"),
)
def rel_eq_delete(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equality delete under the value oracle (Iceberg v2's zero-scan
    merge-on-read form, `operators/snapshots.py:delete_by_key`): build a
    snapshot table from customer, delete two nation keys by COMMITTING
    THE KEY SET (no data file read or written), then append a subset of
    one deleted nation BACK — the entry's file scope must keep the
    re-inserted rows visible while the original rows stay gone (the CDC
    retract-then-reinsert semantics). The oracle states the end state as
    a filter plus the re-appended subset; a scope bug in either
    direction — the anti-join leaking into the new files, or the old
    files resurfacing — breaks the hash."""
    import os
    import tempfile
    import uuid as _uuid

    from reactivestreams_kinesis_spark.operators.snapshots import (
        delete_by_key,
        read_snapshot,
        snapshot_commit,
    )

    base = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey", "c_acctbal"
    )
    t = scratch_dir("rsk_eqd_q")
    snapshot_commit(base.repartitionByRange(8, "c_custkey"), t)
    keys = spark.createDataFrame([(3,), (7,)], "c_nationkey int")
    delete_by_key(spark, t, keys, "c_nationkey")
    snapshot_commit(
        base.filter((F.col("c_nationkey") == 3) & (F.col("c_custkey") <= 500)), t
    )
    return read_snapshot(spark, t).select("c_custkey", "c_nationkey", "c_acctbal")


@register(
    "rel_cdf_feed",
    oracle="""
    WITH ins AS (
        SELECT CAST(1000000 + n_nationkey AS BIGINT) AS c_custkey,
               n_nationkey AS c_nationkey,
               CAST(n_nationkey AS DOUBLE) AS c_acctbal
        FROM nation
    ),
    live1 AS (
        SELECT c_custkey, c_nationkey, c_acctbal FROM customer
        UNION ALL SELECT * FROM ins
    )
    SELECT c_custkey, c_nationkey, c_acctbal,
           'insert' AS _change_type, CAST(1 AS BIGINT) AS _commit_version
    FROM ins
    UNION ALL
    SELECT c_custkey, c_nationkey, c_acctbal,
           'delete' AS _change_type, CAST(2 AS BIGINT) AS _commit_version
    FROM live1 WHERE c_acctbal < 0.0
    UNION ALL
    SELECT c_custkey, c_nationkey, c_acctbal,
           'delete' AS _change_type, CAST(3 AS BIGINT) AS _commit_version
    FROM live1
    WHERE NOT (c_acctbal < 0.0) AND c_nationkey IN (3, 7)
    """,
    tags=("S5", "J3", "P3"),
)
def rel_cdf_feed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CHANGE DATA FEED under the value oracle
    (`operators/snapshots.py:snapshot_change_feed` — the readChangeFeed
    shape with retractions): build a snapshot table from customer (v0),
    append 25 nation-derived rows (v1), merge-on-read position-delete
    negative balances (v2), equality-delete two nation keys (v3), then
    read the feed over (0, 3]. The oracle states the exact change set:
    v1's inserts, v2's retractions = rows live at v1 with negative
    balance, v3's retractions = rows STILL live at v2 matching the keys
    (a row deleted at v2 must not retract again at v3 — the
    parent-manifest-aware extraction is what the hash pins). Extraction
    cost is delta-proportional: appended files for inserts, a semi-join
    of the delta's target files against the bounded delete set for
    retractions."""
    import os
    import tempfile
    import uuid as _uuid

    from reactivestreams_kinesis_spark.operators.snapshots import (
        delete_by_key,
        delete_where,
        snapshot_change_feed,
        snapshot_commit,
    )

    base = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey", "c_acctbal"
    )
    ins = load_table(spark, sf_dir, "nation").select(
        (F.lit(1000000) + F.col("n_nationkey")).cast("bigint").alias("c_custkey"),
        F.col("n_nationkey").alias("c_nationkey"),
        F.col("n_nationkey").cast("double").alias("c_acctbal"),
    )
    t = scratch_dir("rsk_cdf_q")
    snapshot_commit(base.repartitionByRange(8, "c_custkey"), t)            # v0
    snapshot_commit(ins, t)                                                # v1
    delete_where(spark, t, [("c_acctbal", "<", 0.0)], strategy="merge_on_read")  # v2
    keys = spark.createDataFrame([(3,), (7,)], "c_nationkey int")
    delete_by_key(spark, t, keys, "c_nationkey")                           # v3
    return snapshot_change_feed(spark, t, from_version=0)


@register(
    "rel_rename_evolution",
    oracle="""
    WITH all_rows AS (
        SELECT c_custkey, c_nationkey, c_acctbal AS balance FROM customer
        UNION ALL
        SELECT CAST(1000000 + n_nationkey AS BIGINT),
               n_nationkey,
               CAST(n_nationkey AS DOUBLE)
        FROM nation
    ),
    live AS (SELECT * FROM all_rows WHERE NOT (balance < 0.0))
    SELECT c_custkey AS cust_id,
           c_nationkey,
           CASE WHEN c_custkey <= 100 THEN balance + 1000.0
                ELSE balance END AS balance
    FROM live
    """,
    tags=("S5", "P3", "P4"),
)
def rel_rename_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RENAME COLUMN (physical column mapping,
    `operators/snapshots.py:rename_column`) under the value oracle: build
    a snapshot table from customer (v0), rename c_acctbal→balance —
    metadata-only, no file rewritten (v1), append nation-derived rows
    under the NEW name (v2: new files physically share the old column
    name, the map makes that invisible), merge-on-read position-delete
    `balance < 0` (v3: the predicate names the renamed column, prunes
    and applies against files written BEFORE the rename), copy-on-write
    update `balance += 1000 where c_custkey <= 100` (v4: the rewrite
    carries the mapping forward), then rename the KEY column
    c_custkey→cust_id (v5) and read the tip. The oracle states the end
    state over the raw fixture; the hash breaks if any surface — read
    aliasing, predicate translation, stats pruning, the rewrite's file
    naming — mixes logical and physical names anywhere.

    At 100 TB rename is the operation that must be O(1): one manifest
    write, every prune index (min/max, bloom, NDV) intact because
    they key on the immutable physical names."""
    import os
    import tempfile
    import uuid as _uuid

    from reactivestreams_kinesis_spark.operators.snapshots import (
        delete_where,
        read_snapshot,
        rename_column,
        snapshot_commit,
        update_where,
    )

    base = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey", "c_acctbal"
    )
    ins = load_table(spark, sf_dir, "nation").select(
        (F.lit(1000000) + F.col("n_nationkey")).cast("bigint").alias("c_custkey"),
        F.col("n_nationkey").alias("c_nationkey"),
        F.col("n_nationkey").cast("double").alias("balance"),
    )
    t = scratch_dir("rsk_ren_q")
    snapshot_commit(base.repartitionByRange(8, "c_custkey"), t)            # v0
    rename_column(t, "c_acctbal", "balance")                               # v1
    snapshot_commit(ins, t)                                                # v2
    delete_where(spark, t, [("balance", "<", 0.0)], strategy="merge_on_read")  # v3
    update_where(
        spark, t, [("c_custkey", "<=", 100)],
        {"balance": F.col("balance") + F.lit(1000.0)},
    )                                                                      # v4
    rename_column(t, "c_custkey", "cust_id")                               # v5
    return read_snapshot(spark, t).select("cust_id", "c_nationkey", "balance")


@register(
    "rel_partition_prune",
    oracle="""
    SELECT c_custkey, c_nationkey, c_acctbal
    FROM customer
    WHERE c_nationkey IN (3, 7) AND c_acctbal >= 0.0
    """,
    tags=("S5", "P3"),
)
def rel_partition_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PARTITION SPEC under the value oracle (Iceberg-style hidden
    partitioning, `operators/snapshots.py:_compute_pvals` /
    `prune_files`): commit customer partitioned by identity(c_nationkey)
    — the writer clusters the commit on the partition tuple and records
    each file's distinct tuples in the manifest — then scan with a
    nation IN-list plus a balance range. The scan plans only the files
    whose recorded tuples intersect the IN-list (asserted file-level in
    tests/test_partition_spec.py; here the ORACLE pins that pruning is
    an optimization, never a filter: the result must equal the plain
    WHERE clause row-for-row). At 100 TB this is the difference between
    touching two nations' files and listing the table."""
    import os
    import tempfile
    import uuid as _uuid

    from reactivestreams_kinesis_spark.operators.snapshots import (
        scan_snapshot,
        snapshot_commit,
    )

    base = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey", "c_acctbal"
    )
    t = scratch_dir("rsk_part_q")
    snapshot_commit(base, t, partition_by=["c_nationkey"])
    return scan_snapshot(
        spark,
        t,
        [("c_nationkey", "in", (3, 7)), ("c_acctbal", ">=", 0.0)],
    ).select("c_custkey", "c_nationkey", "c_acctbal")


@register(
    "rel_type_widening",
    oracle="""
    SELECT CAST(c_custkey AS BIGINT) AS c_custkey,
           c_nationkey,
           CAST(CAST(c_acctbal AS FLOAT) AS DOUBLE) AS c_acctbal
    FROM customer
    UNION ALL
    SELECT CAST(10000000000 + n_nationkey AS BIGINT),
           n_nationkey,
           CAST(n_nationkey AS DOUBLE)
    FROM nation
    """,
    tags=("S5", "P4"),
)
def rel_type_widening(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TYPE WIDENING under the value oracle (`_merge_schema` — the Delta
    type-widening chains int→bigint / float→double): commit customer
    with NARROW types (int key, float balance) as v0, append
    nation-derived rows whose key only fits bigint (1e10 + n) with
    double balances as v1 — the append WIDENS the declared schema, the
    v0 files keep their written narrow types, and the tip read promotes
    them at scan time (Spark 4's vectorized parquet reader; no file
    rewritten). The oracle replays the exact value path: the narrow
    era's balances round-trip through FLOAT (CAST(CAST(x AS FLOAT) AS
    DOUBLE)) — IEEE promotion is bit-exact in both engines, so the hash
    breaks if the reader rewrites, re-rounds, or refuses the straddle."""
    import os
    import tempfile
    import uuid as _uuid

    from reactivestreams_kinesis_spark.operators.snapshots import (
        read_snapshot,
        snapshot_commit,
    )

    narrow = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").cast("int").alias("c_custkey"),
        "c_nationkey",
        F.col("c_acctbal").cast("float").alias("c_acctbal"),
    )
    wide = load_table(spark, sf_dir, "nation").select(
        (F.lit(10_000_000_000) + F.col("n_nationkey")).cast("bigint").alias(
            "c_custkey"
        ),
        F.col("n_nationkey").alias("c_nationkey"),
        F.col("n_nationkey").cast("double").alias("c_acctbal"),
    )
    t = scratch_dir("rsk_wid_q")
    snapshot_commit(narrow.repartitionByRange(4, "c_custkey"), t)          # v0
    snapshot_commit(wide, t)                                               # v1
    return read_snapshot(spark, t).select("c_custkey", "c_nationkey", "c_acctbal")


@register(
    "rel_cdf_materialize",
    oracle="""
    WITH live AS (
        SELECT c_custkey, c_nationkey, c_acctbal FROM customer
        UNION ALL
        SELECT CAST(1000000 + n_nationkey AS BIGINT),
               n_nationkey,
               CAST(n_nationkey AS DOUBLE)
        FROM nation
    )
    SELECT c_nationkey, COUNT(*) AS n_rows,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS sum_bal
    FROM live
    WHERE NOT (c_acctbal < 0.0) AND c_nationkey NOT IN (3, 7)
    GROUP BY c_nationkey
    """,
    tags=("S5", "A1", "J3"),
)
def rel_cdf_materialize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental aggregate MAINTENANCE from the change feed — the
    reason a feed carries retractions at all: a downstream per-nation
    (count, sum) materialization updated purely from `rel_cdf_feed`'s
    history (v0 base aggregates, then +1/−1 per insert/delete change),
    never re-reading the table. The oracle computes the TIP aggregates
    directly from the live rows; they match only if the feed is exactly
    complete — every insert present, every retraction present, nothing
    retracted twice. Sums fold in exact decimals so the incremental
    merge is order-independent across both engines.

    At 100 TB this is the standing pattern: the feed is
    delta-proportional, the materialization update is
    O(changes · aggregation keys) — the table itself is never
    re-scanned."""
    import os
    import tempfile
    import uuid as _uuid

    from reactivestreams_kinesis_spark.operators.snapshots import (
        delete_by_key,
        delete_where,
        read_snapshot,
        snapshot_change_feed,
        snapshot_commit,
    )

    base = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey", "c_acctbal"
    )
    ins = load_table(spark, sf_dir, "nation").select(
        (F.lit(1000000) + F.col("n_nationkey")).cast("bigint").alias("c_custkey"),
        F.col("n_nationkey").alias("c_nationkey"),
        F.col("n_nationkey").cast("double").alias("c_acctbal"),
    )
    t = scratch_dir("rsk_cdfm_q")
    snapshot_commit(base.repartitionByRange(8, "c_custkey"), t)            # v0
    snapshot_commit(ins, t)                                                # v1
    delete_where(spark, t, [("c_acctbal", "<", 0.0)], strategy="merge_on_read")  # v2
    keys = spark.createDataFrame([(3,), (7,)], "c_nationkey int")
    delete_by_key(spark, t, keys, "c_nationkey")                           # v3

    dec = F.col("c_acctbal").cast("decimal(12,2)")
    base_agg = read_snapshot(spark, t, 0).groupBy("c_nationkey").agg(
        F.count(F.lit(1)).alias("n_rows"), F.sum(dec).alias("sum_bal_dec")
    )
    sign = F.when(F.col("_change_type") == "insert", F.lit(1)).otherwise(F.lit(-1))
    delta_agg = (
        snapshot_change_feed(spark, t, from_version=0)
        .groupBy("c_nationkey")
        .agg(
            F.sum(sign).alias("n_rows"),
            F.sum(dec * sign).alias("sum_bal_dec"),
        )
    )
    merged = (
        base_agg.unionByName(delta_agg)
        .groupBy("c_nationkey")
        .agg(
            F.sum("n_rows").alias("n_rows"),
            F.sum("sum_bal_dec").alias("sum_bal_dec"),
        )
        .filter(F.col("n_rows") > 0)
    )
    return merged.select(
        "c_nationkey",
        "n_rows",
        F.col("sum_bal_dec").cast("double").alias("sum_bal"),
    )


@register(
    "rel_cdf_cow",
    oracle="""
    WITH ins AS (
        SELECT CAST(1000000 + n_nationkey AS BIGINT) AS c_custkey,
               n_nationkey AS c_nationkey,
               CAST(n_nationkey AS DOUBLE) AS c_acctbal
        FROM nation
    )
    SELECT c_custkey, c_nationkey, c_acctbal,
           'update_preimage' AS _change_type, CAST(1 AS BIGINT) AS _commit_version
    FROM customer WHERE c_custkey <= 100
    UNION ALL
    SELECT c_custkey, c_nationkey, c_acctbal + 100.0,
           'update_postimage', CAST(1 AS BIGINT)
    FROM customer WHERE c_custkey <= 100
    UNION ALL
    SELECT c_custkey, c_nationkey, c_acctbal, 'insert', CAST(1 AS BIGINT)
    FROM ins
    UNION ALL
    SELECT c_custkey, c_nationkey, c_acctbal, 'delete', CAST(1 AS BIGINT)
    FROM customer WHERE c_custkey > 120 AND c_custkey <= 130
    UNION ALL
    SELECT c_custkey, c_nationkey, c_acctbal + 100.0, 'delete', CAST(3 AS BIGINT)
    FROM customer WHERE c_custkey <= 100 AND c_acctbal + 100.0 < 0.0
    UNION ALL
    SELECT c_custkey, c_nationkey, c_acctbal, 'delete', CAST(3 AS BIGINT)
    FROM customer
    WHERE c_custkey > 100 AND NOT (c_custkey > 120 AND c_custkey <= 130)
      AND c_acctbal < 0.0
    """,
    tags=("S5", "J3", "A1"),
)
def rel_cdf_cow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CHANGE DATA FEED over COPY-ON-WRITE rewrite commits under the
    value oracle (`operators/snapshots.py:snapshot_change_feed` +
    `_rewrite_change_rows` — Delta's readChangeFeed vocabulary incl.
    update_preimage/update_postimage): build a snapshot table from
    customer (v0), apply ONE CoW `merge_upsert` that simultaneously
    updates keys ≤100 (+100.0 balance), inserts 25 nation-derived rows
    and deletes keys (120, 130] (v1), compact the table (v2 — a reorg:
    provably row-preserving, must emit NOTHING), then merge-on-read
    position-delete negative balances (v3), and read the feed over
    (0, 3].

    The oracle states the exact change set per commit: v1's pre/post
    image pairs (the multiset diff of rewritten files, paired by the
    recorded merge key), its inserts and deletes; nothing for v2; v3's
    retractions computed against the POST-merge live rows (an updated
    balance that went ≥0 must not retract; one that stayed <0 retracts
    with its UPDATED value). A diff bug in either direction — survivor
    rows leaking as changes, pre/post pairing inverted, reorg emitting
    phantom rows, retraction against the wrong version — breaks the
    hash.

    At 100 TB: rewrite-diff cost is bounded by the TOUCHED file set
    (one shuffle grouping the diff), reorgs are free by construction,
    and MoR retraction cost stays delta-proportional — the feed is the
    standing CDC surface for a lakehouse table under routine DML plus
    maintenance compaction."""
    import os
    import tempfile
    import uuid as _uuid

    from reactivestreams_kinesis_spark.operators.snapshots import (
        compact_snapshot,
        delete_where,
        merge_upsert,
        snapshot_change_feed,
        snapshot_commit,
    )

    base = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey", "c_acctbal"
    )
    t = scratch_dir("rsk_cdfcow_q")
    snapshot_commit(base.repartitionByRange(8, "c_custkey"), t)            # v0
    upd = base.filter("c_custkey <= 100").select(
        "c_custkey",
        "c_nationkey",
        (F.col("c_acctbal") + 100.0).alias("c_acctbal"),
        F.lit(False).alias("_d"),
    )
    ins = load_table(spark, sf_dir, "nation").select(
        (F.lit(1000000) + F.col("n_nationkey")).cast("bigint").alias("c_custkey"),
        F.col("n_nationkey").alias("c_nationkey"),
        F.col("n_nationkey").cast("double").alias("c_acctbal"),
        F.lit(False).alias("_d"),
    )
    dels = base.filter("c_custkey > 120 AND c_custkey <= 130").select(
        "c_custkey", "c_nationkey", "c_acctbal", F.lit(True).alias("_d")
    )
    merge_upsert(
        spark, t, upd.unionByName(ins).unionByName(dels), "c_custkey",
        delete_col="_d",
    )                                                                      # v1
    compact_snapshot(spark, t)                                             # v2
    delete_where(spark, t, [("c_acctbal", "<", 0.0)], strategy="merge_on_read")  # v3
    return snapshot_change_feed(spark, t, from_version=0)


@register(
    "rel_mv_incremental",
    oracle="""
    WITH all_rows AS (
        SELECT c_custkey, c_nationkey,
               CAST(c_acctbal AS DECIMAL(12,2)) AS bal
        FROM customer
        UNION ALL
        SELECT CAST(1000000 + n_nationkey AS BIGINT),
               n_nationkey,
               CAST(n_nationkey AS DECIMAL(12,2))
        FROM nation
    ),
    live1 AS (SELECT * FROM all_rows WHERE NOT (bal < 0.0)),
    live2 AS (
        SELECT c_custkey, c_nationkey,
               CASE WHEN c_custkey <= 100
                    THEN CAST(bal + 1000 AS DECIMAL(12,2))
                    ELSE bal END AS bal
        FROM live1
    ),
    live AS (SELECT * FROM live2 WHERE c_nationkey NOT IN (3, 7))
    SELECT c_nationkey,
           COUNT(*) AS n_rows,
           ROUND(CAST(SUM(bal) AS DOUBLE), 2) AS sum_bal,
           ROUND(CAST(MIN(bal) AS DOUBLE), 2) AS lo_bal,
           ROUND(CAST(MAX(bal) AS DOUBLE), 2) AS hi_bal,
           ROUND(CAST(SUM(bal) AS DOUBLE) / COUNT(bal), 6) AS avg_bal
    FROM live
    GROUP BY c_nationkey
    """,
    tags=("S5", "A1", "A6"),
)
def rel_mv_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INCREMENTAL MATERIALIZED VIEW under the value oracle
    (`operators/matview.py` — the first-class persisted form of the
    inline feed arithmetic `rel_cdf_materialize` demonstrates): create
    a per-nation (count, sum, min, max, avg) view over the base table,
    run every DML kind against the SOURCE — append (v1), merge-on-read
    position delete (v2), copy-on-write update (v3: pre/postimage
    pairs), equality delete (v4) — then ONE `refresh_materialized_view`
    call folds the change feed into the stored state: count/sum/avg by
    retraction arithmetic in exact decimals, min/max through the
    dirty-group recompute (both v2..v4 retract rows, so every surviving
    group recomputes its extremes from a pruned source scan at v4). The
    oracle aggregates the equivalent end state directly from the
    fixtures; the hash breaks if the feed misses a change, applies one
    twice, or the dirty patch reads a stale extreme.

    At 100 TB: the refresh reads the delta-proportional feed plus the
    aggregate-sized view — never the table — and the refresh commit is
    idempotent under replay (txn = consumed source version)."""
    import os
    import tempfile
    import uuid as _uuid

    from reactivestreams_kinesis_spark.operators.matview import (
        create_materialized_view,
        read_materialized_view,
        refresh_materialized_view,
    )
    from reactivestreams_kinesis_spark.operators.snapshots import (
        delete_by_key,
        delete_where,
        snapshot_commit,
        update_where,
    )

    base = load_table(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_nationkey",
        F.col("c_acctbal").cast("decimal(12,2)").alias("bal"),
    )
    ins = load_table(spark, sf_dir, "nation").select(
        (F.lit(1000000) + F.col("n_nationkey")).cast("bigint").alias("c_custkey"),
        F.col("n_nationkey").alias("c_nationkey"),
        F.col("n_nationkey").cast("decimal(12,2)").alias("bal"),
    )
    u = _uuid.uuid4().hex[:8]
    t = scratch_dir("rsk_mv_src")
    v = scratch_dir("rsk_mv_view")
    snapshot_commit(base.repartitionByRange(8, "c_custkey"), t)            # v0
    create_materialized_view(
        spark,
        v,
        t,
        group_by=["c_nationkey"],
        aggs={
            "n_rows": ("count", None),
            "sum_bal": ("sum", "bal"),
            "lo_bal": ("min", "bal"),
            "hi_bal": ("max", "bal"),
            "avg_bal": ("avg", "bal"),
        },
    )
    snapshot_commit(ins, t)                                                # v1
    delete_where(spark, t, [("bal", "<", 0.0)], strategy="merge_on_read")  # v2
    update_where(
        spark,
        t,
        [("c_custkey", "<=", 100)],
        {"bal": (F.col("bal") + F.lit(1000)).cast("decimal(12,2)")},
    )                                                                      # v3
    keys = spark.createDataFrame([(3,), (7,)], "c_nationkey int")
    delete_by_key(spark, t, keys, "c_nationkey")                           # v4
    refresh_materialized_view(spark, v)
    mv = read_materialized_view(spark, v)
    return mv.select(
        "c_nationkey",
        "n_rows",
        F.round(F.col("sum_bal").cast("double"), 2).alias("sum_bal"),
        F.round(F.col("lo_bal").cast("double"), 2).alias("lo_bal"),
        F.round(F.col("hi_bal").cast("double"), 2).alias("hi_bal"),
        F.round("avg_bal", 6).alias("avg_bal"),
    )


@register(
    "rel_mv_composite_merge",
    oracle="""
    WITH all_rows AS (
        SELECT c_custkey, c_nationkey, c_mktsegment,
               CAST(c_acctbal AS DECIMAL(12,2)) AS bal
        FROM customer
        UNION ALL
        SELECT CAST(2000000 + n_nationkey AS BIGINT),
               n_nationkey,
               'SYNTH',
               CAST(n_nationkey AS DECIMAL(12,2))
        FROM nation
    ),
    live1 AS (SELECT * FROM all_rows WHERE NOT (bal < 0.0)),
    live AS (SELECT * FROM live1 WHERE c_nationkey NOT IN (3, 7))
    SELECT c_nationkey, c_mktsegment,
           COUNT(*) AS n_rows,
           ROUND(CAST(SUM(bal) AS DOUBLE), 2) AS sum_bal,
           ROUND(CAST(MAX(bal) AS DOUBLE), 2) AS hi_bal
    FROM live
    GROUP BY c_nationkey, c_mktsegment
    """,
    tags=("S5", "A1", "A6"),
)
def rel_mv_composite_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COMPOSITE-KEY materialized view maintained DELTA-PROPORTIONALLY
    (round 12 — the last not-delta-proportional refresh path closed):
    the view groups by the (c_nationkey, c_mktsegment) TUPLE and
    refreshes under ``strategy='merge'`` — dead tuples equality-delete
    (the entry keys on both columns), changed tuples MERGE through the
    composite-key ``merge_upsert``, untouched groups' files never open.
    DML history: append (v1), merge-on-read delete (v2), equality
    delete by a SINGLE source column (v3 — kills every segment of
    nations 3/7, so whole key-tuple families die at once). The max
    aggregate forces the dirty-extreme recompute down the composite
    semi-join path. The oracle aggregates the equivalent end state
    directly; the hash breaks if tuple identity is lost anywhere
    (e.g. keys matched per-column instead of per-tuple).

    At 100 TB: a composite-key view (billions of (dim1, dim2) groups)
    now pays write cost = changed tuples per refresh, not VIEW size —
    the same contract the single-key path has had since round 10."""
    from reactivestreams_kinesis_spark.operators.matview import (
        create_materialized_view,
        read_materialized_view,
        refresh_materialized_view,
    )
    from reactivestreams_kinesis_spark.operators.snapshots import (
        delete_by_key,
        delete_where,
        snapshot_commit,
    )

    base = load_table(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_nationkey",
        "c_mktsegment",
        F.col("c_acctbal").cast("decimal(12,2)").alias("bal"),
    )
    ins = load_table(spark, sf_dir, "nation").select(
        (F.lit(2000000) + F.col("n_nationkey")).cast("bigint").alias("c_custkey"),
        F.col("n_nationkey").alias("c_nationkey"),
        F.lit("SYNTH").alias("c_mktsegment"),
        F.col("n_nationkey").cast("decimal(12,2)").alias("bal"),
    )
    t = scratch_dir("rsk_mvck_src")
    v = scratch_dir("rsk_mvck_view")
    snapshot_commit(base.repartitionByRange(8, "c_custkey"), t)            # v0
    create_materialized_view(
        spark,
        v,
        t,
        group_by=["c_nationkey", "c_mktsegment"],
        aggs={
            "n_rows": ("count", None),
            "sum_bal": ("sum", "bal"),
            "hi_bal": ("max", "bal"),
        },
    )
    snapshot_commit(ins, t)                                                # v1
    delete_where(spark, t, [("bal", "<", 0.0)], strategy="merge_on_read")  # v2
    keys = spark.createDataFrame([(3,), (7,)], "c_nationkey int")
    delete_by_key(spark, t, keys, "c_nationkey")                           # v3
    refresh_materialized_view(spark, v, strategy="merge")
    mv = read_materialized_view(spark, v)
    return mv.select(
        "c_nationkey",
        "c_mktsegment",
        "n_rows",
        F.round(F.col("sum_bal").cast("double"), 2).alias("sum_bal"),
        F.round(F.col("hi_bal").cast("double"), 2).alias("hi_bal"),
    )


@register(
    "rel_mv_hist_quantile",
    oracle="""
    WITH all_rows AS (
        SELECT c_custkey, c_nationkey, CAST(c_acctbal AS DOUBLE) AS bal
        FROM customer
        UNION ALL
        SELECT CAST(3000000 + n_nationkey AS BIGINT),
               n_nationkey,
               CAST(n_nationkey * 100 AS DOUBLE)
        FROM nation
    ),
    live1 AS (SELECT * FROM all_rows WHERE NOT (bal < 0.0)),
    live AS (SELECT * FROM live1 WHERE c_nationkey NOT IN (3, 7)),
    b AS (
        SELECT c_nationkey,
               LEAST(GREATEST(CAST(FLOOR((bal - (-1000.0)) / 200.0) AS INT),
                              0), 54) AS b
        FROM live WHERE bal IS NOT NULL
    ),
    c AS (SELECT c_nationkey, b, COUNT(*) AS c FROM b GROUP BY c_nationkey, b),
    r AS (
        SELECT c_nationkey, b, c,
               SUM(c) OVER (PARTITION BY c_nationkey ORDER BY b) AS cum,
               SUM(c) OVER (PARTITION BY c_nationkey) AS total
        FROM c
    )
    SELECT c_nationkey,
           CAST(MAX(total) AS BIGINT) AS n_rows,
           -1000.0 + (MIN(CASE WHEN cum >= GREATEST(CAST(CEIL(0.5 * total)
                              AS BIGINT), 1) THEN b END) + 0.5) * 200.0
               AS p50_bal,
           -1000.0 + (MIN(CASE WHEN cum >= GREATEST(CAST(CEIL(0.9 * total)
                              AS BIGINT), 1) THEN b END) + 0.5) * 200.0
               AS p90_bal
    FROM r GROUP BY c_nationkey
    """,
    tags=("S5", "A1", "A4"),
)
def rel_mv_hist_quantile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INCREMENTAL PERCENTILES — the ``hist_quantile`` materialized-view
    aggregate (operators/matview.py): a per-group fixed-bin histogram of
    the declared value domain whose bin counts are FULLY ABELIAN —
    inserts add, retractions subtract — so unlike min/max/HLL a
    percentile view folds arbitrary DML with sketch arithmetic only:
    no dirty-group marking, no source rescan, ever. DML history: append
    (v1), merge-on-read delete (v2 — retractions subtract from bins,
    including the clamped below-domain bin), equality delete (v3 — whole
    groups die), refreshed under ``strategy='merge'`` (the
    delta-proportional path). The read inverts each group's counts at
    q=0.5 and q=0.9 with two O(bins) codegen folds; the DuckDB oracle
    replicates the binning rule (floor((v-lo)/width) clamped to the edge
    bins) and the inversion rule (midpoint of the first bin whose
    cumulative count reaches ceil(q·total)) term-for-term, so the hash
    breaks if a bin count drifts by one anywhere in the fold.

    At 100 TB: a p99-latency standing view over billions of groups pays
    refresh cost = feed rows × O(bins) codegen sums + the
    aggregate-sized view — never a source scan (the property min/max
    views give up under retraction). Domain here: [-1000, 10000) in 55
    bins of width 200 over TPC-H acctbal."""
    from reactivestreams_kinesis_spark.operators.matview import (
        create_materialized_view,
        read_materialized_view,
        refresh_materialized_view,
    )
    from reactivestreams_kinesis_spark.operators.snapshots import (
        delete_by_key,
        delete_where,
        snapshot_commit,
    )

    base = load_table(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_nationkey",
        F.col("c_acctbal").cast("double").alias("bal"),
    )
    ins = load_table(spark, sf_dir, "nation").select(
        (F.lit(3000000) + F.col("n_nationkey")).cast("bigint").alias("c_custkey"),
        F.col("n_nationkey").alias("c_nationkey"),
        (F.col("n_nationkey") * 100).cast("double").alias("bal"),
    )
    t = scratch_dir("rsk_mvhq_src")
    v = scratch_dir("rsk_mvhq_view")
    hist = {"lo": -1000.0, "hi": 10000.0, "bins": 55}  # width = 200.0 exact
    snapshot_commit(base.repartitionByRange(8, "c_custkey"), t)            # v0
    create_materialized_view(
        spark,
        v,
        t,
        group_by=["c_nationkey"],
        aggs={
            "n_rows": ("count", None),
            "p50_bal": ("hist_quantile", "bal", {"q": 0.5, **hist}),
            "p90_bal": ("hist_quantile", "bal", {"q": 0.9, **hist}),
        },
    )
    snapshot_commit(ins, t)                                                # v1
    delete_where(spark, t, [("bal", "<", 0.0)], strategy="merge_on_read")  # v2
    keys = spark.createDataFrame([(3,), (7,)], "c_nationkey int")
    delete_by_key(spark, t, keys, "c_nationkey")                           # v3
    refresh_materialized_view(spark, v, strategy="merge")
    mv = read_materialized_view(spark, v)
    return mv.select("c_nationkey", "n_rows", "p50_bal", "p90_bal")


@register(
    "rel_mv_join",
    oracle="""
    WITH fact0 AS (
        SELECT o_orderkey, o_custkey,
               CAST(o_totalprice AS DECIMAL(12,2)) AS price
        FROM orders
        UNION ALL
        SELECT CAST(o_orderkey + 9000000 AS BIGINT), o_custkey,
               CAST(o_totalprice AS DECIMAL(12,2))
        FROM orders WHERE o_orderkey <= 80
    ),
    upd AS (
        SELECT o_orderkey, o_custkey,
               CASE WHEN o_orderkey <= 100
                    THEN CAST(price + 5 AS DECIMAL(12,2))
                    ELSE price END AS price
        FROM fact0
    ),
    live AS (SELECT * FROM upd WHERE NOT (price > 300000.0))
    SELECT c.c_nationkey,
           COUNT(*) AS n_orders,
           ROUND(CAST(SUM(l.price) AS DOUBLE), 2) AS rev,
           ROUND(CAST(MAX(l.price) AS DOUBLE), 2) AS hi
    FROM live l JOIN customer c ON l.o_custkey = c.c_custkey
    GROUP BY c.c_nationkey
    """,
    tags=("S5", "J1", "A1"),
)
def rel_mv_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JOIN MATERIALIZED VIEW under the value oracle
    (`operators/matview.py:create_materialized_view_over_join` — the
    denormalized star-schema view): revenue per nation over orders ⋈
    customer, grouped by a DIMENSION attribute, maintained from the
    FACT side's change feed alone with the dimension frozen at its
    pinned version. The fact history runs append + copy-on-write
    update + merge-on-read delete, then ONE refresh folds the enriched
    delta (count/sum arithmetic; max through the dirty recompute over
    the joined relation). The oracle restates the end state as a
    direct join-aggregate over the fixtures; the hash breaks if the
    enrichment drops/doubles a delta row or a retraction enriches
    against the wrong dim state.

    At 100 TB: refresh cost = fact delta ⋈ (pinned) dim + the
    aggregate-sized view — the join the direct query would pay, over
    delta-proportional rows."""
    import os
    import tempfile
    import uuid as _uuid

    from reactivestreams_kinesis_spark.operators.matview import (
        create_materialized_view_over_join,
        read_materialized_view,
        refresh_materialized_view,
    )
    from reactivestreams_kinesis_spark.operators.snapshots import (
        delete_where,
        snapshot_commit,
        update_where,
    )

    fact_df = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        F.col("o_totalprice").cast("decimal(12,2)").alias("price"),
    )
    dim_df = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey"
    )
    u = _uuid.uuid4().hex[:8]
    fact = scratch_dir("rsk_mvj_fact")
    dim = scratch_dir("rsk_mvj_dim")
    view = scratch_dir("rsk_mvj_view")
    snapshot_commit(fact_df.repartitionByRange(8, "o_orderkey"), fact)     # v0
    snapshot_commit(dim_df, dim)
    create_materialized_view_over_join(
        spark,
        view,
        fact,
        dim,
        join_on=("o_custkey", "c_custkey"),
        group_by=["c_nationkey"],
        aggs={
            "n_orders": ("count", None),
            "rev": ("sum", "price"),
            "hi": ("max", "price"),
        },
    )
    snapshot_commit(
        fact_df.filter(F.col("o_orderkey") <= 80).withColumn(
            "o_orderkey",
            (F.col("o_orderkey") + F.lit(9000000)).cast("bigint"),
        ),
        fact,
    )                                                                      # v1
    update_where(
        spark,
        fact,
        [("o_orderkey", "<=", 100)],
        {"price": (F.col("price") + F.lit(5)).cast("decimal(12,2)")},
    )                                                                      # v2
    delete_where(
        spark, fact, [("price", ">", 300000.0)], strategy="merge_on_read"
    )                                                                      # v3
    refresh_materialized_view(spark, view)
    return read_materialized_view(spark, view).select(
        "c_nationkey",
        "n_orders",
        F.round(F.col("rev").cast("double"), 2).alias("rev"),
        F.round(F.col("hi").cast("double"), 2).alias("hi"),
    )


@register(
    "rel_mv_join_dim_delta",
    oracle="""
    WITH fact0 AS (
        SELECT o_orderkey, o_custkey,
               CAST(o_totalprice AS DECIMAL(12,2)) AS price
        FROM orders
    ),
    factf AS (
        SELECT o_orderkey, o_custkey,
               CASE WHEN o_orderkey <= 100
                    THEN CAST(price + 5 AS DECIMAL(12,2))
                    ELSE price END AS price
        FROM fact0
        UNION ALL
        SELECT * FROM (VALUES
            (CAST(9000001 AS BIGINT), CAST(9000001 AS BIGINT),
             CAST(123.45 AS DECIMAL(12,2))),
            (CAST(9000002 AS BIGINT), CAST(42 AS BIGINT),
             CAST(1.55 AS DECIMAL(12,2)))
        ) AS ins(o_orderkey, o_custkey, price)
    ),
    dim1 AS (
        SELECT c_custkey,
               CASE WHEN c_custkey <= 150 THEN 77
                    ELSE c_nationkey END AS c_nationkey
        FROM customer
    ),
    dimf AS (
        SELECT * FROM dim1 WHERE NOT (c_custkey > 1400)
        UNION ALL
        SELECT CAST(9000001 AS BIGINT), 99
    )
    SELECT d.c_nationkey,
           COUNT(*) AS n_orders,
           ROUND(CAST(SUM(f.price) AS DOUBLE), 2) AS rev,
           ROUND(CAST(MAX(f.price) AS DOUBLE), 2) AS hi
    FROM factf f JOIN dimf d ON f.o_custkey = d.c_custkey
    GROUP BY d.c_nationkey
    """,
    tags=("S5", "J1", "A1"),
)
def rel_mv_join_dim_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JOIN MV maintained through DIMENSION changes
    (`operators/matview.py:refresh_materialized_view` with
    ``on_dim_change='incremental'`` — round 12's two-term delta
    algebra V_new = V_old ⊕ γ(ΔF⋈D_pin) ⊕ γ(F_ev⋈ΔD)): the history
    runs an SCD-1 dim UPDATE (customers ≤150 migrate to nation 77), a
    dim DELETE (custkeys >1400 leave the inner-join view), a dim
    INSERT whose key two appended fact rows then reference (the ΔF⋈ΔD
    corner — must land exactly once, through the dim term only), and a
    fact copy-on-write price update — then ONE merge-strategy refresh
    folds both feeds: fact delta enriched against the OLD pin, dim
    delta joined to the full fact at the target version, MAX through
    the dirty recompute at the NEW pin, the advanced pin txn-encoded
    with the commit. The oracle restates the end state as the direct
    join-aggregate; the hash breaks if either delta term double-counts,
    enriches against the wrong dim state, or the pin detaches from the
    folded state.

    At 100 TB: refresh cost = fact delta ⋈ pinned dim + changed-dim-key
    slice of the fact (IN-predicate scan when the key set is bounded —
    manifest/bloom-prunable) + the aggregate-sized view; the dimension
    history never forces a view rebuild."""
    from reactivestreams_kinesis_spark.operators.matview import (
        create_materialized_view_over_join,
        read_materialized_view,
        refresh_materialized_view,
    )
    from reactivestreams_kinesis_spark.operators.snapshots import (
        delete_where,
        snapshot_commit,
        update_where,
    )

    fact_df = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        F.col("o_totalprice").cast("decimal(12,2)").alias("price"),
    )
    dim_df = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey"
    )
    fact = scratch_dir("rsk_mvjd_fact")
    dim = scratch_dir("rsk_mvjd_dim")
    view = scratch_dir("rsk_mvjd_view")
    snapshot_commit(fact_df.repartitionByRange(8, "o_orderkey"), fact)     # v0
    snapshot_commit(dim_df, dim)                                           # dim v0
    create_materialized_view_over_join(
        spark,
        view,
        fact,
        dim,
        join_on=("o_custkey", "c_custkey"),
        group_by=["c_nationkey"],
        aggs={
            "n_orders": ("count", None),
            "rev": ("sum", "price"),
            "hi": ("max", "price"),
        },
    )
    update_where(
        spark, dim, [("c_custkey", "<=", 150)], {"c_nationkey": F.lit(77)}
    )                                                                      # dim v1
    delete_where(spark, dim, [("c_custkey", ">", 1400)])                   # dim v2
    snapshot_commit(
        spark.createDataFrame(
            [(9000001, 99)], "c_custkey bigint, c_nationkey int"
        ),
        dim,
    )                                                                      # dim v3
    update_where(
        spark,
        fact,
        [("o_orderkey", "<=", 100)],
        {"price": (F.col("price") + F.lit(5)).cast("decimal(12,2)")},
    )                                                                      # v1
    snapshot_commit(
        spark.createDataFrame(
            [(9000001, 9000001, "123.45"), (9000002, 42, "1.55")],
            "o_orderkey bigint, o_custkey bigint, price string",
        ).withColumn("price", F.col("price").cast("decimal(12,2)")),
        fact,
    )                                                                      # v2
    refresh_materialized_view(
        spark, view, strategy="merge", on_dim_change="incremental"
    )
    return read_materialized_view(spark, view).select(
        "c_nationkey",
        "n_orders",
        F.round(F.col("rev").cast("double"), 2).alias("rev"),
        F.round(F.col("hi").cast("double"), 2).alias("hi"),
    )


@register(
    "rel_merge_into",
    oracle="""
    WITH src AS (
        SELECT c_custkey AS k, CAST(c_custkey AS DECIMAL(12,2)) AS delta
        FROM customer WHERE c_custkey <= 100
        UNION ALL
        SELECT CAST(1000000 + n_nationkey AS BIGINT),
               CAST(n_nationkey AS DECIMAL(12,2))
        FROM nation
    ),
    tgt AS (
        SELECT c_custkey, c_nationkey,
               CAST(c_acctbal AS DECIMAL(12,2)) AS bal
        FROM customer
    ),
    kept AS (
        SELECT t.c_custkey, t.c_nationkey,
               CASE WHEN s.k IS NOT NULL AND NOT (s.k % 10 = 0)
                    THEN CAST(t.bal + s.delta AS DECIMAL(12,2))
                    ELSE t.bal END AS bal
        FROM tgt t LEFT JOIN src s ON t.c_custkey = s.k
        WHERE NOT (s.k IS NOT NULL AND s.k % 10 = 0)
    ),
    ins AS (
        SELECT s.k AS c_custkey, 99 AS c_nationkey, s.delta AS bal
        FROM src s
        WHERE s.k NOT IN (SELECT c_custkey FROM customer)
    )
    SELECT c_custkey, c_nationkey,
           ROUND(CAST(bal AS DOUBLE), 2) AS bal
    FROM (SELECT * FROM kept UNION ALL SELECT * FROM ins)
    """,
    tags=("S5", "J2", "P4"),
)
def rel_merge_into(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL CONDITIONAL MERGE INTO under the value oracle
    (`operators/merge_into.py` — the ANSI/Delta MERGE statement beyond
    `merge_upsert`'s whole-row upsert): against the customer snapshot,
    one statement runs WHEN MATCHED AND k%10=0 THEN DELETE, WHEN
    MATCHED THEN UPDATE SET bal = t.bal + s.delta (an expression over
    BOTH sides), and WHEN NOT MATCHED THEN INSERT with a projected row.
    The oracle restates the clause algebra as CASE/anti-join SQL over
    the fixtures; the hash breaks if clause order, a condition's NULL
    handling, or the file-granular rewrite drops or doubles a row.

    At 100 TB the mechanics are merge_upsert's: candidate files via
    stats pruning, only files owning a matched key rewrite, optimistic
    publish."""
    import os
    import tempfile
    import uuid as _uuid

    from reactivestreams_kinesis_spark.operators.merge_into import merge_into
    from reactivestreams_kinesis_spark.operators.snapshots import (
        read_snapshot,
        snapshot_commit,
    )

    tgt = load_table(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_nationkey",
        F.col("c_acctbal").cast("decimal(12,2)").alias("bal"),
    )
    src = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") <= 100)
        .select(
            F.col("c_custkey").alias("k"),
            F.col("c_custkey").cast("decimal(12,2)").alias("delta"),
        )
        .unionByName(
            load_table(spark, sf_dir, "nation").select(
                (F.lit(1000000) + F.col("n_nationkey")).cast("bigint").alias("k"),
                F.col("n_nationkey").cast("decimal(12,2)").alias("delta"),
            )
        )
    )
    t = scratch_dir("rsk_mi_q")
    snapshot_commit(tgt.repartitionByRange(8, "c_custkey"), t)
    merge_into(
        spark,
        t,
        src,
        ("c_custkey", "k"),
        when_matched_update={"bal": "CAST(t.bal + s.delta AS DECIMAL(12,2))"},
        when_matched_delete=True,
        matched_delete_condition="s.k % 10 = 0",
        when_not_matched_insert={
            "c_custkey": "s.k",
            "c_nationkey": "CAST(99 AS INT)",
            "bal": "s.delta",
        },
    )
    return read_snapshot(spark, t).select(
        "c_custkey",
        "c_nationkey",
        F.round(F.col("bal").cast("double"), 2).alias("bal"),
    )


@register(
    "rel_merge_into_sql",
    oracle="""
    WITH src AS (
        SELECT c_custkey AS k, CAST(c_nationkey AS DECIMAL(12,2)) AS delta
        FROM customer WHERE c_custkey <= 200
        UNION ALL
        SELECT CAST(2000000 + n_nationkey AS BIGINT),
               CAST(n_nationkey AS DECIMAL(12,2))
        FROM nation
    ),
    tgt AS (
        SELECT c_custkey, c_nationkey,
               CAST(c_acctbal AS DECIMAL(12,2)) AS bal
        FROM customer
    ),
    kept AS (
        SELECT t.c_custkey, t.c_nationkey,
               CASE WHEN s.k IS NOT NULL
                    THEN CAST(t.bal + s.delta AS DECIMAL(12,2))
                    ELSE t.bal END AS bal
        FROM tgt t LEFT JOIN src s ON t.c_custkey = s.k
        WHERE NOT (s.k IS NOT NULL AND s.k % 7 = 0)
    ),
    ins AS (
        SELECT s.k AS c_custkey, 77 AS c_nationkey, s.delta AS bal
        FROM src s
        WHERE s.k NOT IN (SELECT c_custkey FROM customer)
    )
    SELECT c_custkey, c_nationkey,
           ROUND(CAST(bal AS DOUBLE), 2) AS balance
    FROM (SELECT * FROM kept UNION ALL SELECT * FROM ins)
    """,
    tags=("S5", "J2", "P4"),
)
def rel_merge_into_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SQL STATEMENT FRONT-END end-to-end under the value oracle
    (`operators/sql_frontend.py:SnapshotWarehouse`): the LITERAL texts a
    lakehouse user types — MERGE INTO with all three conditional
    clauses, ALTER TABLE RENAME COLUMN, and the final SELECT — execute
    through the dispatcher onto the same operators the Python surface
    proves (`merge_into.py`, `rename_column`, `read_snapshot`). The
    oracle restates the statement algebra over the fixtures; the hash
    breaks if the parser misreads a clause, an alias rewrite corrupts
    an expression, or the rename leaks into stored data.

    At 100 TB the dispatcher adds nothing to the execution path — each
    statement becomes exactly the operator call (stats-pruned MERGE
    rewrite, metadata-only rename), so the cost model is unchanged."""
    import os
    import tempfile
    import uuid as _uuid

    from reactivestreams_kinesis_spark.operators.sql_frontend import (
        SnapshotWarehouse,
    )
    from reactivestreams_kinesis_spark.operators.snapshots import snapshot_commit

    tgt = load_table(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_nationkey",
        F.col("c_acctbal").cast("decimal(12,2)").alias("bal"),
    )
    src = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") <= 200)
        .select(
            F.col("c_custkey").alias("k"),
            F.col("c_nationkey").cast("decimal(12,2)").alias("delta"),
        )
        .unionByName(
            load_table(spark, sf_dir, "nation").select(
                (F.lit(2000000) + F.col("n_nationkey")).cast("bigint").alias("k"),
                F.col("n_nationkey").cast("decimal(12,2)").alias("delta"),
            )
        )
    )
    uid = _uuid.uuid4().hex[:8]
    t = scratch_dir("rsk_misql_q")
    snapshot_commit(tgt.repartitionByRange(8, "c_custkey"), t)
    view = f"__misql_src_{uid}"
    src.createOrReplaceTempView(view)
    wh = SnapshotWarehouse(spark, {"accounts": t})
    wh.sql(
        f"""
        MERGE INTO accounts AS t USING {view} AS u ON t.c_custkey = u.k
        WHEN MATCHED AND u.k % 7 = 0 THEN DELETE
        WHEN MATCHED THEN UPDATE SET bal = CAST(t.bal + u.delta AS DECIMAL(12,2))
        WHEN NOT MATCHED THEN INSERT (c_custkey, c_nationkey, bal)
            VALUES (u.k, CAST(77 AS INT), u.delta)
        """
    )
    wh.sql("ALTER TABLE accounts RENAME COLUMN bal TO balance")
    return wh.sql(
        "SELECT c_custkey, c_nationkey, "
        "ROUND(CAST(balance AS DOUBLE), 2) AS balance FROM accounts"
    )


@register(
    "rel_sql_evolution",
    oracle="""
    WITH all_rows AS (
        SELECT CAST(c_custkey AS BIGINT) AS c_custkey, c_nationkey,
               CAST(c_acctbal AS DECIMAL(12,2)) AS bal
        FROM customer
        UNION ALL
        SELECT CAST(10000000000 + n_nationkey AS BIGINT),
               n_nationkey,
               CAST(n_nationkey AS DECIMAL(12,2))
        FROM nation
    ),
    live AS (SELECT * FROM all_rows WHERE NOT (bal < 0.0)),
    agg AS (
        SELECT c_nationkey,
               COUNT(*) AS n_rows,
               ROUND(CAST(SUM(bal) AS DOUBLE), 2) AS sum_bal,
               CAST(MAX(c_custkey) AS BIGINT) AS hi_key
        FROM live GROUP BY c_nationkey
    ),
    del AS (
        SELECT c_nationkey, COUNT(*) AS n_del
        FROM all_rows WHERE bal < 0.0 GROUP BY c_nationkey
    )
    SELECT agg.c_nationkey, n_rows, sum_bal, hi_key,
           COALESCE(n_del, 0) AS n_del
    FROM agg LEFT JOIN del ON agg.c_nationkey = del.c_nationkey
    """,
    tags=("S5", "P3", "P4"),
)
def rel_sql_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-12 SQL DIALECT COMPLETION under the value oracle — the
    LITERAL statement texts: CREATE TABLE AS SELECT (narrow int key),
    ``ALTER TABLE ... ALTER COLUMN ... TYPE BIGINT`` (metadata-only
    widening — no file rewrite; the narrow-era files read back
    promoted), an INSERT whose keys only fit the widened type, a
    DELETE, and two reads that must agree: the tip aggregate over the
    straddle (narrow files + wide files under one declared schema) and
    the retraction side read through the ``table_changes('t', v, v')``
    table-valued change feed. The oracle restates the end state AND the
    delete set directly from the fixtures; the hash breaks if the widen
    rewrites data, the wide insert truncates, the CDF misses or
    double-counts a retraction, or the TVF range is misread.

    At 100 TB: every statement here is metadata-bounded (widen = one
    manifest write) or delta-proportional (the CDF read) — the SQL
    surface adds no execution cost over the Python operators it
    dispatches to."""
    from reactivestreams_kinesis_spark.operators.sql_frontend import (
        SnapshotWarehouse,
    )

    import uuid as _uuid

    uid = _uuid.uuid4().hex[:8]
    load_table(spark, sf_dir, "customer").createOrReplaceTempView(
        f"__sqlev_cust_{uid}"
    )
    load_table(spark, sf_dir, "nation").createOrReplaceTempView(
        f"__sqlev_nat_{uid}"
    )
    import os

    root = scratch_dir("rsk_sqlev_root")
    os.makedirs(root, exist_ok=True)
    wh = SnapshotWarehouse(spark, {}, root=root)
    wh.sql(
        f"CREATE TABLE cust AS SELECT CAST(c_custkey AS INT) AS c_custkey, "
        f"c_nationkey, CAST(c_acctbal AS DECIMAL(12,2)) AS bal "
        f"FROM __sqlev_cust_{uid}"
    )                                                                   # v0
    wh.sql("ALTER TABLE cust ALTER COLUMN c_custkey TYPE BIGINT")       # v1
    wh.sql(
        f"INSERT INTO cust SELECT CAST(10000000000 + n_nationkey AS BIGINT), "
        f"n_nationkey, CAST(n_nationkey AS DECIMAL(12,2)) "
        f"FROM __sqlev_nat_{uid}"
    )                                                                   # v2
    wh.sql("DELETE FROM cust WHERE bal < 0.0")                          # v3
    return wh.sql(
        """
        WITH agg AS (
            SELECT c_nationkey,
                   COUNT(*) AS n_rows,
                   ROUND(CAST(SUM(bal) AS DOUBLE), 2) AS sum_bal,
                   MAX(c_custkey) AS hi_key
            FROM cust GROUP BY c_nationkey
        ),
        del AS (
            SELECT c_nationkey, COUNT(*) AS n_del
            FROM table_changes('cust', 2, 3)
            WHERE _change_type = 'delete'
            GROUP BY c_nationkey
        )
        SELECT agg.c_nationkey, n_rows, sum_bal, hi_key,
               COALESCE(n_del, CAST(0 AS BIGINT)) AS n_del
        FROM agg LEFT JOIN del ON agg.c_nationkey = del.c_nationkey
        """
    )


@register(
    "rel_shallow_clone",
    oracle="""
    SELECT c_custkey, c_nationkey,
           ROUND(CAST(CASE WHEN c_custkey <= 100
                           THEN CAST(0.0 AS DECIMAL(12,2))
                           ELSE CAST(c_acctbal AS DECIMAL(12,2)) END
                 AS DOUBLE), 2) AS bal
    FROM customer
    WHERE NOT (c_acctbal < 0.0 AND c_custkey > 100)
    """,
    tags=("S5", "P3"),
)
def rel_shallow_clone(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SHALLOW CLONE under the value oracle
    (`operators/snapshots.py:clone_snapshot`): commit customer as the
    source, clone it — ONE manifest write referencing the source's
    files in place, zero data copied — then run a copy-on-write update
    and a merge-on-read delete against the CLONE (local delete files
    over foreign data files) and read the clone's tip. The oracle
    states the clone's end state over the fixtures; the source is
    re-read and asserted bit-identical inside the query (a clone that
    leaked a write into its source would raise here rather than pass
    the hash).

    At 100 TB this is the zero-cost sandbox: clone a production table,
    run destructive experiments, drop the directory — the ownership
    guard means nothing the clone does can touch the source's files."""
    import os
    import tempfile
    import uuid as _uuid

    from reactivestreams_kinesis_spark.operators.snapshots import (
        clone_snapshot,
        delete_where,
        read_snapshot,
        snapshot_commit,
        update_where,
    )

    base = load_table(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_nationkey",
        F.col("c_acctbal").cast("decimal(12,2)").alias("bal"),
    )
    u = _uuid.uuid4().hex[:8]
    src = scratch_dir("rsk_clsrc")
    dst = scratch_dir("rsk_cldst")
    snapshot_commit(base.repartitionByRange(6, "c_custkey"), src)
    clone_snapshot(src, dst)
    update_where(
        spark,
        dst,
        [("c_custkey", "<=", 100)],
        {"bal": F.lit(0).cast("decimal(12,2)")},
    )
    delete_where(spark, dst, [("bal", "<", 0.0)], strategy="merge_on_read")
    # isolation proof inside the correctness gate: the source still
    # answers exactly its original rows
    n_src = read_snapshot(spark, src).count()
    n_base = base.count()
    if n_src != n_base:
        raise AssertionError(
            f"clone leaked into source: {n_src} rows vs {n_base}"
        )
    return read_snapshot(spark, dst).select(
        "c_custkey",
        "c_nationkey",
        F.round(F.col("bal").cast("double"), 2).alias("bal"),
    )


@register(
    "rel_mv_approx_distinct",
    oracle="""
    WITH all_rows AS (
        SELECT c_custkey, c_nationkey FROM customer
        UNION ALL
        SELECT CAST(1000000 + n_nationkey AS BIGINT), n_nationkey FROM nation
    ),
    live AS (SELECT * FROM all_rows WHERE NOT (c_custkey <= 200))
    SELECT c_nationkey,
           COUNT(*) AS n_rows,
           COUNT(DISTINCT c_custkey) AS exact_users,
           CAST(1 AS INT) AS approx_ok
    FROM live
    GROUP BY c_nationkey
    """,
    tags=("S5", "A3", "A1"),
)
def rel_mv_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """APPROX-DISTINCT MATERIALIZED VIEW under the bounds oracle
    (`operators/matview.py` with the ``approx_distinct`` aggregate —
    per-group datasketches HLL state): the view maintains per-nation
    COUNT(*) and a distinct-custkey sketch; the source takes an append
    (sketches UNION in — no source access) and a merge-on-read delete
    (dirty groups recompute their sketch from the pruned source scan),
    then the view's estimate is checked within 10% of the EXACT
    distinct count computed directly — `approx_ok` must be 1 for every
    group, and the exact counts hash against the oracle's SQL. A stale
    sketch (a retraction that failed to dirty its group) fails the
    bound; a lost insert fails the exact column."""
    import os
    import tempfile
    import uuid as _uuid

    from reactivestreams_kinesis_spark.operators.matview import (
        create_materialized_view,
        read_materialized_view,
        refresh_materialized_view,
    )
    from reactivestreams_kinesis_spark.operators.snapshots import (
        delete_where,
        read_snapshot,
        snapshot_commit,
    )

    base = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    ins = load_table(spark, sf_dir, "nation").select(
        (F.lit(1000000) + F.col("n_nationkey")).cast("bigint").alias("c_custkey"),
        F.col("n_nationkey").alias("c_nationkey"),
    )
    u = _uuid.uuid4().hex[:8]
    t = scratch_dir("rsk_mvad")
    v = scratch_dir("rsk_mvadv")
    snapshot_commit(base.repartitionByRange(6, "c_custkey"), t)
    create_materialized_view(
        spark,
        v,
        t,
        group_by=["c_nationkey"],
        aggs={"n_rows": ("count", None), "users": ("approx_distinct", "c_custkey")},
    )
    snapshot_commit(ins, t)                                         # union path
    delete_where(
        spark, t, [("c_custkey", "<=", 200)], strategy="merge_on_read"
    )                                                               # dirty path
    refresh_materialized_view(spark, v)
    mv = read_materialized_view(spark, v)
    exact = (
        read_snapshot(spark, t)
        .groupBy("c_nationkey")
        .agg(F.countDistinct("c_custkey").alias("exact_users"))
    )
    return mv.join(exact, "c_nationkey").select(
        "c_nationkey",
        "n_rows",
        "exact_users",
        (
            F.abs(F.col("users") - F.col("exact_users"))
            <= 0.10 * F.col("exact_users")
        )
        .cast("int")
        .alias("approx_ok"),
    )
