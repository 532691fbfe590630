"""Time-series regularization operators: per-key date-spine densification
(gap fill), last-observation-carried-forward, and linear interpolation.

The reference engine's streaming surface emits per-shard event time-lines
(reference: ShardSubscription.java:139-150 delivers records in event
order); an analytics engine over those time-lines needs the inverse of
sparsity — a dense, regular grid per key — before joins against
calendar-keyed dimensions, window training features, or charting. These
are the classic gap-fill / LOCF / interpolate ops (TimescaleDB's
``time_bucket_gapfill`` + ``locf`` + ``interpolate`` family) expressed
Spark-first.

Scale shape: the spine is built per key with ``sequence(min_day,
max_day)`` + ``explode`` — distributed, no driver-side calendar, no
global cross join against a date dimension (a per-key spine is
|keys| · span rows only where the key is live; a global spine would be
|keys| × |calendar| regardless of activity). The fills are single-pass
window functions over (key, day) — one shuffle, shared by every fill
column. Nothing collects; nothing is quadratic.

Determinism: daily values aggregate as DECIMAL(12,2) sums (exact,
order-independent) and only then cast to DOUBLE; interpolation arithmetic
is written with the SAME operator order in both engines, so IEEE doubles
agree bitwise; final ratios round to 6dp.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from reactivestreams_kinesis_spark.catalog import load_table
from reactivestreams_kinesis_spark.queries.registry import register, register_sql

# Shared oracle CTEs: sparse per-user daily purchase totals, each user's
# observed-span date spine (DuckDB's generate_series is the engine twin
# of Spark's sequence+explode), and the spine←daily left join.
_SPINE_CTES = """
    daily AS (
        SELECT user_id,
               CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE) AS day,
               SUM(CAST(value AS DECIMAL(12,2))) AS day_value
        FROM events
        WHERE event_type = 'purchase'
        GROUP BY 1, 2
    ),
    spine AS (
        SELECT user_id,
               CAST(UNNEST(generate_series(CAST(MIN(day) AS TIMESTAMP),
                                           CAST(MAX(day) AS TIMESTAMP),
                                           INTERVAL 1 DAY)) AS DATE) AS day
        FROM daily
        GROUP BY user_id
    ),
    grid AS (
        SELECT s.user_id, s.day,
               CAST(d.day_value AS DOUBLE) AS day_value
        FROM spine s
        LEFT JOIN daily d ON s.user_id = d.user_id AND s.day = d.day
    )
"""


def _purchase_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark twin of the oracle's ``grid`` CTE: per-user daily purchase
    totals densified onto each user's observed-span date spine, missing
    days NULL. The spine never leaves the executors: sequence(min, max)
    builds each user's day array from its own aggregate row."""
    events = load_table(spark, sf_dir, "events")
    daily = (
        events.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", F.to_date("ts").alias("day"))
        .agg(F.sum(F.col("value").cast("decimal(12,2)")).alias("day_value"))
    )
    spine = (
        daily.groupBy("user_id")
        .agg(F.min("day").alias("d0"), F.max("day").alias("d1"))
        .select("user_id", F.explode(F.sequence("d0", "d1")).alias("day"))
    )
    return spine.join(daily, ["user_id", "day"], "left").select(
        "user_id", "day", F.col("day_value").cast("double").alias("day_value")
    )


@register(
    "ts_gapfill_locf",
    oracle=f"""
    WITH {_SPINE_CTES}
    SELECT user_id, CAST(day AS TIMESTAMP) AS day,
           day_value IS NOT NULL AS observed,
           LAST_VALUE(day_value IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS filled_value
    FROM grid
    """,
    tags=("W2", "P4", "A1"),
)
def ts_gapfill_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap fill + last-observation-carried-forward: densify each user's
    sparse daily purchase totals onto a per-user date spine, then fill
    the holes with the most recent observed value (one IGNORE NULLS
    running window — W2's last() in its ignorenulls form, which is what
    makes LOCF a single pass instead of a self-join per gap).

    The first spine day is observed by construction (the span starts at
    the user's min observed day) so filled_value is never NULL."""
    grid = _purchase_grid(spark, sf_dir)
    w = (
        Window.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return grid.select(
        "user_id",
        F.col("day").cast("timestamp").alias("day"),
        F.col("day_value").isNotNull().alias("observed"),
        F.last("day_value", ignorenulls=True).over(w).alias("filled_value"),
    )


@register(
    "ts_interpolate_linear",
    oracle=f"""
    WITH {_SPINE_CTES},
    fenced AS (
        SELECT user_id, day, day_value,
               LAST_VALUE(day_value IGNORE NULLS) OVER (
                   PARTITION BY user_id ORDER BY day
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_v,
               LAST_VALUE(CASE WHEN day_value IS NOT NULL THEN day END IGNORE NULLS)
                   OVER (PARTITION BY user_id ORDER BY day
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_d,
               FIRST_VALUE(day_value IGNORE NULLS) OVER (
                   PARTITION BY user_id ORDER BY day
                   ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_v,
               FIRST_VALUE(CASE WHEN day_value IS NOT NULL THEN day END IGNORE NULLS)
                   OVER (PARTITION BY user_id ORDER BY day
                         ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_d
        FROM grid
    )
    SELECT user_id, CAST(day AS TIMESTAMP) AS day,
           day_value IS NOT NULL AS observed,
           ROUND(CASE WHEN day_value IS NOT NULL THEN day_value
                      ELSE prev_v + (next_v - prev_v)
                           * CAST(day - prev_d AS DOUBLE)
                           / CAST(next_d - prev_d AS DOUBLE)
                 END, 6) AS interp_value
    FROM fenced
    """,
    tags=("W2", "P4"),
)
def ts_interpolate_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear interpolation across gaps: each missing day gets
    prev + (next - prev) · elapsed/gap from its fencepost observations
    (two IGNORE NULLS windows sharing one (user, day) sort — no
    per-gap self-join). Spine endpoints are observed by construction,
    so every gap is interior and both fenceposts exist.

    Cross-engine parity: the fenceposts are exact (decimal-summed, then
    cast), day arithmetic is integer, and the interpolation expression
    is written with the identical operator order in both engines, so
    the doubles match bitwise before the 6dp round."""
    grid = _purchase_grid(spark, sf_dir)
    w_back = (
        Window.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_fwd = (
        Window.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    obs_day = F.when(F.col("day_value").isNotNull(), F.col("day"))
    fenced = grid.select(
        "user_id",
        "day",
        "day_value",
        F.last("day_value", ignorenulls=True).over(w_back).alias("prev_v"),
        F.last(obs_day, ignorenulls=True).over(w_back).alias("prev_d"),
        F.first("day_value", ignorenulls=True).over(w_fwd).alias("next_v"),
        F.first(obs_day, ignorenulls=True).over(w_fwd).alias("next_d"),
    )
    interp = F.col("prev_v") + (F.col("next_v") - F.col("prev_v")) * F.datediff(
        "day", "prev_d"
    ).cast("double") / F.datediff("next_d", "prev_d").cast("double")
    return fenced.select(
        "user_id",
        F.col("day").cast("timestamp").alias("day"),
        F.col("day_value").isNotNull().alias("observed"),
        F.round(
            F.when(F.col("day_value").isNotNull(), F.col("day_value")).otherwise(
                interp
            ),
            6,
        ).alias("interp_value"),
    )


register_sql(
    "ts_resample_ohlc",
    """
    WITH pts AS (
        SELECT user_id,
               date_trunc('day', CAST(ts AS TIMESTAMP)) AS day,
               value, ts, event_id
        FROM events WHERE event_type = 'purchase'
    ),
    ranked AS (
        SELECT user_id, day, value,
               ROW_NUMBER() OVER (PARTITION BY user_id, day
                                  ORDER BY ts, event_id) AS rn_a,
               ROW_NUMBER() OVER (PARTITION BY user_id, day
                                  ORDER BY ts DESC, event_id DESC) AS rn_d
        FROM pts
    )
    SELECT user_id, day,
           MAX(CASE WHEN rn_a = 1 THEN value END) AS open_value,
           MAX(value) AS high_value,
           MIN(value) AS low_value,
           MAX(CASE WHEN rn_d = 1 THEN value END) AS close_value,
           CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS volume,
           COUNT(*) AS n_trades
    FROM ranked
    GROUP BY user_id, day
    """,
    tables=["events"],
    tags=("A1", "W1", "P4"),
    doc="""Downsample/resample to a regular grain with OHLC semantics —
    the classic financial bar query, and the aggregation dual of the
    gap-fill family above (gap-fill densifies, resample coarsens; both
    regularize an irregular event time-line). open/close are
    first/last-by-event-time via two ROW_NUMBER specs sharing ONE
    (user, day) sort (the deterministic tie-breaker is event_id —
    `first_value` under ties would be engine-dependent); high/low/count
    are plain aggregates; volume is the exact decimal sum. One window
    exchange + one partial-aggregated groupBy on the same key, values
    pass through untouched, so cross-engine parity is bit-exact.""",
)
