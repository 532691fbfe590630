"""Window functions (SURVEY.md §2.6 W1-W4) — all [MANDATE].

Determinism: ``rank``/``dense_rank`` are value-deterministic under ties;
``row_number``/``ntile``/frames are not, so every such ORDER BY carries a
unique tie-breaker key.

Scale note: a window spec = one shuffle on its partition keys; specs sharing
partitioning reuse the exchange. A window with no PARTITION BY collapses to a
single task — never used here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from reactivestreams_kinesis_spark.catalog import load_table
from reactivestreams_kinesis_spark.queries.registry import register


@register(
    "win_rank_customers",
    oracle="""
    SELECT
        c_custkey,
        c_nationkey,
        c_acctbal,
        RANK()       OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC) AS bal_rank,
        DENSE_RANK() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC) AS bal_dense_rank,
        ROW_NUMBER() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey) AS rn,
        NTILE(4)     OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey) AS quartile,
        CASE WHEN COUNT(*) OVER w_n = 1 THEN CAST(0 AS DOUBLE)
             ELSE CAST((2000000 * (RANK() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal) - 1)
                        + (COUNT(*) OVER w_n - 1))
                       // (2 * (COUNT(*) OVER w_n - 1)) AS DOUBLE) / 1000000
        END AS bal_pct_rank,
        CAST((2000000 * COUNT(*) OVER (PARTITION BY c_nationkey ORDER BY c_acctbal
                                       RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              + COUNT(*) OVER w_n)
             // (2 * COUNT(*) OVER w_n) AS DOUBLE) / 1000000 AS bal_cume_dist
    FROM customer
    WINDOW w_n AS (PARTITION BY c_nationkey)
    """,
    tags=("W1",),
)
def win_rank_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking + distribution functions (W1) partitioned by nation:
    rank/dense_rank/row_number/ntile plus percent_rank/cume_dist. All
    specs share PARTITION BY c_nationkey so they reuse ONE exchange
    (ascending/descending sorts differ, but the shuffle is shared).

    percent_rank/cume_dist are computed by their DEFINING integer ratios
    ((rank-1)/(n-1), ties-inclusive-count/n) with half-up rounding to
    6dp done entirely in bigint micro-units: the sf0.1 oracle run caught
    the native-fn form drifting by 1e-6 — nation 11 holds exactly 640
    customers, so cume_dist values k/640 terminate at 7 decimals and
    ROUND(..., 6) lands on the half boundary, where Spark rounds
    half-up and DuckDB half-even. Integer arithmetic
    (floor((2e6·k + n) / 2n)) is the one formulation both engines agree
    on at EVERY partition size; no rounding-scale choice dodges all
    power-of-two×five partition sizes."""
    customer = load_table(spark, sf_dir, "customer")
    by_bal = Window.partitionBy("c_nationkey").orderBy(F.col("c_acctbal").desc())
    by_bal_key = Window.partitionBy("c_nationkey").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey")
    )
    by_bal_asc = Window.partitionBy("c_nationkey").orderBy("c_acctbal")
    w_n = Window.partitionBy("c_nationkey")
    n = F.count(F.lit(1)).over(w_n)
    r_asc = F.rank().over(by_bal_asc)
    k_cume = F.count(F.lit(1)).over(
        by_bal_asc.rangeBetween(Window.unboundedPreceding, Window.currentRow)
    )

    def micro_ratio(num, den):
        """round-half-up(num/den, 6dp) in exact bigint arithmetic."""
        return (
            ((F.lit(2000000) * num + den) / (F.lit(2) * den))
            .cast("bigint")  # exact: quotient distances from integers >= 1/(2n) >> double ulp
            .cast("double")
            / F.lit(1000000)
        )

    return customer.select(
        "c_custkey",
        "c_nationkey",
        "c_acctbal",
        F.rank().over(by_bal).alias("bal_rank"),
        F.dense_rank().over(by_bal).alias("bal_dense_rank"),
        F.row_number().over(by_bal_key).alias("rn"),
        F.ntile(4).over(by_bal_key).alias("quartile"),
        F.when(n == 1, F.lit(0.0))
        .otherwise(micro_ratio(r_asc - 1, n - 1))
        .alias("bal_pct_rank"),
        micro_ratio(k_cume, n).alias("bal_cume_dist"),
    )


@register(
    "win_lag_lead_events",
    oracle="""
    SELECT
        user_id,
        event_id,
        value,
        LAG(value)  OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_value,
        LEAD(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_value,
        FIRST_VALUE(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS first_type
    FROM events
    """,
    tags=("W2",),
)
def win_lag_lead_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Analytic functions (W2) over per-user event time-lines — values pass
    through untouched so cross-engine parity is bit-exact."""
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return events.select(
        "user_id",
        "event_id",
        "value",
        F.lag("value").over(w).alias("prev_value"),
        F.lead("value").over(w).alias("next_value"),
        F.first("event_type").over(w).alias("first_type"),
    )


_RUNNING = (
    "CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) OVER ("
    "PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey "
    "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)"
)
# Moving average via exact decimal sum / exact count — engines disagree on
# double accumulation inside sliding frames (DuckDB uses a segment tree),
# so AVG(double) OVER a frame is not cross-engine-stable.
_MAVG = (
    "ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) OVER ("
    "PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey "
    "ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE) / COUNT(*) OVER ("
    "PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey "
    "ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 6)"
)


@register(
    "win_running_total",
    oracle=f"""
    SELECT
        o_custkey,
        o_orderkey,
        o_totalprice,
        {_RUNNING} AS running_spend,
        {_MAVG} AS moving_avg_3
    FROM orders
    """,
    tags=("W3",),
    bench=True,
)
def win_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-spec running aggregates (W3). The running sum uses exact
    DECIMAL accumulation (same fragment as the oracle); the 3-row moving
    average sums ≤3 bit-identical doubles left-to-right in both engines so
    it stays exact without rounding."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.select(
        "o_custkey",
        "o_orderkey",
        "o_totalprice",
        F.expr(_RUNNING).alias("running_spend"),
        F.expr(_MAVG).alias("moving_avg_3"),
    )


@register(
    "win_topk_per_group",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice, rn
    FROM (
        SELECT o_custkey, o_orderkey, o_totalprice,
               ROW_NUMBER() OVER (
                   PARTITION BY o_custkey
                   ORDER BY o_totalprice DESC, o_orderkey) AS rn
        FROM orders
    ) t
    WHERE rn <= 3
    """,
    tags=("W4",),
)
def win_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-K per group (W4) — the pattern that also powers similarity top-k
    (X1). Spark ≥3.5 pushes the rn<=3 filter into the window sort
    (WindowGroupLimit) so each partition only keeps K rows."""
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        orders.select(
            "o_custkey",
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).alias("rn"),
        )
        .filter(F.col("rn") <= 3)
    )


@register(
    "win_frames_analytics",
    oracle="""
    SELECT
        o_custkey,
        o_orderkey,
        COUNT(*) OVER (
            PARTITION BY o_custkey ORDER BY o_orderdate
            RANGE BETWEEN INTERVAL 30 DAY PRECEDING AND CURRENT ROW) AS n_orders_30d,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) OVER (
            PARTITION BY o_custkey ORDER BY o_orderdate
            RANGE BETWEEN INTERVAL 30 DAY PRECEDING AND CURRENT ROW) AS DOUBLE)
            AS spend_30d,
        NTH_VALUE(o_orderkey, 2) OVER (
            PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS second_order_key,
        LAST_VALUE(o_orderkey) OVER (
            PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
            ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS final_order_key
    FROM orders
    """,
    tags=("W2", "W3"),
)
def win_frames_analytics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE (value-based) frame aggregates plus nth/last analytics
    (W2+W3) over one shared o_custkey partitioning (one exchange, two
    sort specs). The trailing-30-day count/spend use a RANGE frame —
    defined by the ORDER BY value, so ties contribute to each other's
    frames and the result is deterministic without a tie-break; decimal
    sums keep the money exact across engines. nth_value/last_value use a
    unique (date, key) ordering for determinism."""
    orders = load_table(spark, sf_dir, "orders")
    frame = (
        "PARTITION BY o_custkey ORDER BY o_orderdate "
        "RANGE BETWEEN INTERVAL 30 DAY PRECEDING AND CURRENT ROW"
    )
    running = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    full = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.expr(f"COUNT(*) OVER ({frame})").alias("n_orders_30d"),
        F.expr(
            f"CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) OVER ({frame}) AS DOUBLE)"
        ).alias("spend_30d"),
        F.nth_value("o_orderkey", 2).over(running).alias("second_order_key"),
        F.last("o_orderkey").over(full).alias("final_order_key"),
    )


# --- Funnel analysis (ordered event-sequence matching) ---------------------

FUNNEL_STEPS = ("view", "click", "purchase")


@register(
    "events_funnel",
    oracle="""
    WITH pop AS (SELECT DISTINCT user_id FROM events),
    v AS (
        SELECT user_id, MIN(CAST(ts AS TIMESTAMP)) AS ts1
        FROM events WHERE event_type = 'view' GROUP BY user_id
    ),
    c AS (
        SELECT e.user_id, MIN(CAST(e.ts AS TIMESTAMP)) AS ts2
        FROM events e JOIN v ON e.user_id = v.user_id
         AND CAST(e.ts AS TIMESTAMP) > v.ts1
        WHERE e.event_type = 'click' GROUP BY e.user_id
    ),
    p AS (
        SELECT e.user_id, MIN(CAST(e.ts AS TIMESTAMP)) AS ts3
        FROM events e JOIN c ON e.user_id = c.user_id
         AND CAST(e.ts AS TIMESTAMP) > c.ts2
        WHERE e.event_type = 'purchase' GROUP BY e.user_id
    )
    SELECT steps_completed, COUNT(*) AS n_users,
           CAST(COALESCE(SUM(conv_us), 0) AS BIGINT) AS sum_convert_us
    FROM (
        SELECT pop.user_id,
            CASE WHEN p.user_id IS NOT NULL THEN 3
                 WHEN c.user_id IS NOT NULL THEN 2
                 WHEN v.user_id IS NOT NULL THEN 1
                 ELSE 0 END AS steps_completed,
            CASE WHEN p.user_id IS NOT NULL
                 THEN epoch_us(p.ts3) - epoch_us(v.ts1) END AS conv_us
        FROM pop
        LEFT JOIN v ON pop.user_id = v.user_id
        LEFT JOIN c ON pop.user_id = c.user_id
        LEFT JOIN p ON pop.user_id = p.user_id
    )
    GROUP BY steps_completed
    """,
    tags=("W2", "A1", "A7"),
)
def events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Funnel conversion (ordered event-sequence matching): how many users
    progressed view → click → purchase IN THAT ORDER (strictly increasing
    timestamps — a click before the first view does not count), plus the
    summed first-view→first-qualifying-purchase latency for full
    conversions.

    Scale shape — ONE scan, ONE shuffle: a single groupBy(user) collects
    the sorted per-user step-event sequence (a NULL-skipping CASE inside
    collect_list keeps only step events while still emitting a group row
    for every user, so no separate population branch or join), and
    the funnel state machine runs as a higher-order `aggregate` fold over
    that array (pure codegen, no Python, no joins). Per-user sequences
    are bounded by the step-type filter; a user with millions of step
    events would call for a windowed pre-dedup first. The oracle computes
    the same funnel by the textbook three-way conditional-min join chain
    — an INDEPENDENT algorithm, so agreement checks the semantics, not
    the implementation. Latencies are summed exactly (bigint micros, no
    float averaging)."""
    events = load_table(spark, sf_dir, "events")
    # ONE scan: collect_list skips NULLs, so the CASE keeps only step
    # events while every user (even step-less ones) still gets a group
    # row — no separate population branch, no join (plan-pinned).
    step_struct = (
        "CASE WHEN event_type IN ('"
        + "', '".join(FUNNEL_STEPS)
        + "') THEN struct(ts, event_type) END"
    )
    fold = f"""
        aggregate(
            array_sort(collect_list({step_struct})),
            named_struct('step', 0,
                         'ts1', CAST(NULL AS TIMESTAMP),
                         'tsl', CAST(NULL AS TIMESTAMP)),
            (acc, e) -> CASE
                WHEN acc.step = 0 AND e.event_type = '{FUNNEL_STEPS[0]}'
                    THEN named_struct('step', 1, 'ts1', e.ts, 'tsl', e.ts)
                WHEN acc.step = 1 AND e.event_type = '{FUNNEL_STEPS[1]}'
                     AND e.ts > acc.tsl
                    THEN named_struct('step', 2, 'ts1', acc.ts1, 'tsl', e.ts)
                WHEN acc.step = 2 AND e.event_type = '{FUNNEL_STEPS[2]}'
                     AND e.ts > acc.tsl
                    THEN named_struct('step', 3, 'ts1', acc.ts1, 'tsl', e.ts)
                ELSE acc
            END)
    """
    per_user = events.groupBy("user_id").agg(F.expr(fold).alias("f")).select(
        "user_id",
        F.col("f.step").alias("steps_completed"),
        F.when(
            F.col("f.step") == 3,
            F.unix_micros("f.tsl") - F.unix_micros("f.ts1"),
        ).alias("conv_us"),
    )
    return per_user.groupBy("steps_completed").agg(
        F.count(F.lit(1)).alias("n_users"),
        F.coalesce(F.sum("conv_us"), F.lit(0)).cast("long").alias("sum_convert_us"),
    )


@register(
    "events_cohort_retention",
    oracle="""
    WITH cohort AS (
        SELECT user_id,
               date_trunc('week', MIN(CAST(ts AS TIMESTAMP))) AS cohort_week
        FROM events WHERE event_type = 'signup' GROUP BY user_id
    ),
    activity AS (
        SELECT DISTINCT user_id,
               date_trunc('week', CAST(ts AS TIMESTAMP)) AS act_week
        FROM events
    )
    SELECT c.cohort_week,
           CAST(date_diff('week', c.cohort_week, a.act_week) AS INT)
               AS week_offset,
           COUNT(*) AS n_users
    FROM cohort c
    JOIN activity a ON c.user_id = a.user_id
    WHERE a.act_week >= c.cohort_week
    GROUP BY 1, 2
    """,
    tags=("A1", "A2", "J1"),
)
def events_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: users bucketed by signup week (their
    cohort), counted once per subsequent week of ANY activity — the
    standard (cohort_week, week_offset) retention triangle. Weeks are
    epoch-aligned `date_trunc` so both engines agree on boundaries;
    offsets are whole-week differences of already-truncated stamps
    (exact integers — no float time math).

    Scale shape — ONE scan: a single (user, week) aggregation carrying a
    min-signup-ts flag, the cohort week assigned by a user-partitioned
    window over the weekly rows (reusing the agg's partitioning), then
    the matrix agg over (cohort_week, offset) pairs. The fact table is
    read once where the cohort⋈activity join form read it twice
    (caught by the scan audit)."""
    events = load_table(spark, sf_dir, "events")
    # ONE scan: per-(user, week) rows with a signup flag, then the
    # cohort week arrives by window-min over each user's weeks — the
    # window reuses the aggregation's user-keyed partitioning, so the
    # fact table is read once and shuffled once
    weekly = events.groupBy(
        "user_id", F.date_trunc("week", F.col("ts")).alias("act_week")
    ).agg(
        F.min(
            F.when(F.col("event_type") == "signup", F.col("ts"))
        ).alias("first_signup_ts")
    )
    w = Window.partitionBy("user_id")
    weekly = weekly.withColumn(
        "cohort_week",
        F.date_trunc("week", F.min("first_signup_ts").over(w)),
    )
    return (
        weekly.filter(
            F.col("cohort_week").isNotNull()
            & (F.col("act_week") >= F.col("cohort_week"))
        )
        .groupBy(
            "cohort_week",
            (
                F.floor(
                    (F.unix_micros("act_week") - F.unix_micros("cohort_week"))
                    / (7 * 24 * 3600 * 1_000_000)
                )
            )
            .cast("int")
            .alias("week_offset"),
        )
        .agg(F.count(F.lit(1)).alias("n_users"))
    )



@register(
    "events_transitions",
    oracle="""
    WITH seq AS (
        SELECT user_id, event_type,
               LAG(event_type) OVER (
                   PARTITION BY user_id
                   ORDER BY CAST(ts AS TIMESTAMP), event_id) AS prev_type
        FROM events
    )
    SELECT prev_type, event_type AS next_type, COUNT(*) AS n
    FROM seq
    WHERE prev_type IS NOT NULL
    GROUP BY prev_type, event_type
    """,
    tags=("W2", "A1"),
)
def events_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event transition matrix (Markov-chain counts): for every user's
    time-ordered event sequence, count (previous event → next event)
    pairs — the input to funnel discovery, anomaly scoring ("error after
    purchase spiked"), and next-event models. Ordering carries the
    event_id tie-breaker so simultaneous events sequence identically in
    both engines.

    Scale shape: one window shuffle on user_id (each user's history
    co-locates), then a transition-pair aggregation whose key domain is
    |event_types|² — tiny — so the second agg is map-side dominated."""
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        events.withColumn("prev_type", F.lag("event_type").over(w))
        .filter(F.col("prev_type").isNotNull())
        .groupBy("prev_type", F.col("event_type").alias("next_type"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
