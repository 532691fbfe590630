"""Streaming queries under the correctness gate (SURVEY.md §2.9).

These run REAL Structured Streaming queries (file source replay of the
events fixture → AvailableNow → memory sink) and return the captured result
as a DataFrame, so the DuckDB oracle can check streaming semantics end to
end: tumbling-window aggregation (T3), streaming dedup (T6), and the
arbitrary-stateful operator (T7) — each equivalent to a batch aggregate
once the stream is fully drained. Plus the batch sessionization twin of the
session window (T5) as portable gaps-and-islands SQL.

Window-start arithmetic is epoch-aligned in both engines:
Spark ``F.window`` origin is the epoch under a UTC session, and the oracle
recomputes it as ``floor(epoch_us / width) * width``.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from reactivestreams_kinesis_spark.catalog import load_table
from reactivestreams_kinesis_spark.queries.registry import register, scratch_dir
from reactivestreams_kinesis_spark.streaming.records import read_events_stream
from reactivestreams_kinesis_spark.streaming.state import running_user_stats

_6H_US = 6 * 3600 * 1_000_000


def _run_to_memory(df, output_mode: str) -> DataFrame:
    """Drain a streaming DataFrame with AvailableNow into a memory sink and
    return the captured table (completion semantics — F5)."""
    name = f"capture_{uuid.uuid4().hex[:8]}"
    query = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    finished = query.awaitTermination(300)
    if not finished or query.isActive:
        query.stop()
        raise TimeoutError(
            f"streaming drain for {name} did not finish in 300s — "
            "refusing to return a partial table"
        )
    return df.sparkSession.table(name)


@register(
    "stream_window_counts",
    oracle=f"""
    SELECT
        make_timestamp(CAST(floor(epoch_us(CAST(ts AS TIMESTAMP)) / {_6H_US}) AS BIGINT) * {_6H_US})
            AS win_start,
        event_type,
        COUNT(*) AS n,
        CAST(ROUND(SUM(CAST(value AS DECIMAL(18,6))), 6) AS DOUBLE) AS sum_value
    FROM events
    GROUP BY 1, 2
    """,
    tags=("T3", "A8", "T1"),
)
def stream_window_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming tumbling-window aggregation (T3/A8), drained and compared
    to the full batch GROUP BY: a real MicroBatchExecution run — trigger
    (T1/F3), watermark (T2), windowed state — whose final complete-mode
    output must equal the batch answer. Value sums use the decimal-exact
    policy; event times are µs-truncated identically in both engines."""
    stream = read_events_stream(spark, sf_dir)
    windowed = (
        stream.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "6 hours").alias("win"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.expr(
                "CAST(ROUND(SUM(CAST(value AS DECIMAL(18,6))), 6) AS DOUBLE)"
            ).alias("sum_value"),
        )
    )
    captured = _run_to_memory(windowed, "complete")
    return captured.select(
        F.col("win.start").alias("win_start"), "event_type", "n", "sum_value"
    )


@register(
    "stream_dedup_keys",
    oracle="SELECT DISTINCT user_id, event_type FROM events",
    tags=("T6",),
)
def stream_dedup_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming dropDuplicates (T6) across microbatches (rate-capped so
    state genuinely carries between pulls), drained to the batch DISTINCT.
    Output is keys only — first-seen non-key values are arrival-order
    dependent by design, exactly like the reference's at-most-once replay
    (SURVEY §4.3)."""
    stream = read_events_stream(spark, sf_dir, max_files_per_trigger=1)
    deduped = stream.select("user_id", "event_type").dropDuplicates(
        ["user_id", "event_type"]
    )
    return _run_to_memory(deduped, "append")


@register(
    "stream_stateful_user_stats",
    oracle="""
    SELECT user_id, COUNT(*) AS n_events, MAX(value) AS max_value
    FROM events
    GROUP BY user_id
    """,
    tags=("T7",),
)
def stream_stateful_user_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arbitrary stateful operator (T7): applyInPandasWithState running
    per-user stats; the last update per user must equal the batch
    aggregate. Count and max are order-insensitive → exact parity (the
    running double sum is intentionally excluded from the oracle)."""
    stream = read_events_stream(spark, sf_dir)
    stats = running_user_stats(stream)
    captured = _run_to_memory(stats, "update")
    return captured.groupBy("user_id").agg(
        F.max("n_events").alias("n_events"),
        F.max("max_value").alias("max_value"),
    )


_GAP_US = 30 * 60 * 1_000_000


@register(
    "sessionize_events",
    oracle=f"""
    WITH flagged AS (
        SELECT
            user_id,
            event_id,
            epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us,
            CASE WHEN epoch_us(CAST(ts AS TIMESTAMP))
                      - LAG(epoch_us(CAST(ts AS TIMESTAMP))) OVER w > {_GAP_US}
                      OR LAG(epoch_us(CAST(ts AS TIMESTAMP))) OVER w IS NULL
                 THEN 1 ELSE 0 END AS new_session
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    numbered AS (
        SELECT *,
               SUM(new_session) OVER (
                   PARTITION BY user_id ORDER BY ts_us, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
        FROM flagged
    )
    SELECT
        user_id,
        CAST(session_id AS BIGINT) AS session_id,
        COUNT(*) AS n_events,
        make_timestamp(MIN(ts_us)) AS session_start,
        make_timestamp(MAX(ts_us)) AS session_end
    FROM numbered
    GROUP BY user_id, session_id
    """,
    tags=("T5", "W2", "W3"),
)
def sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch sessionization (T5 twin): gaps-and-islands with a 30-minute
    gap — lag to flag session starts, running sum to number sessions, then
    per-session aggregates. The streaming ``session_window`` equivalent is
    asserted in tests/test_streaming.py; this portable form is what both
    engines can agree on exactly (µs integer timestamps, no floats)."""
    events = load_table(spark, sf_dir, "events")
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ts_us = F.unix_micros("ts")
    flagged = events.select(
        "user_id",
        "event_id",
        ts_us.alias("ts_us"),
        F.when(
            (ts_us - F.lag(ts_us).over(w) > _GAP_US)
            | F.lag(ts_us).over(w).isNull(),
            1,
        )
        .otherwise(0)
        .alias("new_session"),
    )
    w_run = (
        Window.partitionBy("user_id")
        .orderBy("ts_us", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    numbered = flagged.withColumn("session_id", F.sum("new_session").over(w_run))
    return numbered.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.timestamp_micros(F.min("ts_us")).alias("session_start"),
        F.timestamp_micros(F.max("ts_us")).alias("session_end"),
    )


_SLIDE_US = 6 * 3600 * 1_000_000  # 6h slide, 12h width → every event in 2 windows


@register(
    "stream_sliding_counts",
    oracle=f"""
    SELECT
        make_timestamp(
            (CAST(floor(epoch_us(CAST(ts AS TIMESTAMP)) / {_SLIDE_US}) AS BIGINT) - k.k)
            * {_SLIDE_US}) AS win_start,
        COUNT(*) AS n
    FROM events
    CROSS JOIN (VALUES (CAST(0 AS BIGINT)), (CAST(1 AS BIGINT))) k(k)
    GROUP BY 1
    """,
    tags=("T4",),
)
def stream_sliding_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming sliding-window counts (T4): 12 h windows sliding every 6 h —
    each event lands in exactly two windows. Drained complete-mode output
    must equal the batch expansion (oracle: cross join with k∈{{0,1}} window
    offsets; windows are epoch-aligned in both engines)."""
    stream = read_events_stream(spark, sf_dir)
    windowed = (
        stream.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "12 hours", "6 hours").alias("win"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    captured = _run_to_memory(windowed, "complete")
    return captured.select(F.col("win.start").alias("win_start"), "n")


from reactivestreams_kinesis_spark.queries.llm_text import (  # noqa: E402
    CMS_HH_ORACLE,
    cms_counters,
    cms_report,
    cms_tokens,
)


@register(
    "stream_heavy_hitters_cms",
    oracle=CMS_HH_ORACLE,  # the batch CMS oracle, verbatim
    tags=("T3", "A3", "X4"),
)
def stream_heavy_hitters_cms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch maintained INCREMENTALLY over a document stream
    (A3/X4 streaming twin of ``text_heavy_hitters_cms``): the (row,
    bucket) counter aggregation runs as a complete-mode streaming agg
    over file-replayed documents — counters are pure adds, so the drained
    streaming state must equal the batch-built sketch bit-for-bit — and
    the estimate report is then computed from the CAPTURED counter table.
    Same oracle as the batch query: if incremental maintenance diverged
    from the batch sketch by one count in one bucket, the value hash
    breaks. This is the production shape for streaming frequency
    tracking: the sketch is the only state (d·w bounded rows), and any
    point-in-time snapshot of it answers heavy-hitter queries."""
    from reactivestreams_kinesis_spark.sources.text_formats import (
        DOCUMENTS_SCHEMA,
    )

    docs_stream = (
        spark.readStream.schema(DOCUMENTS_SCHEMA)
        .option("pathGlobFilter", "documents.parquet")
        .parquet(sf_dir)
    )
    counters = _run_to_memory(cms_counters(cms_tokens(docs_stream)), "complete")
    batch_toks = cms_tokens(load_table(spark, sf_dir, "documents"))
    return cms_report(batch_toks, counters)



@register(
    "stream_dedup_corpus",
    oracle="SELECT DISTINCT MD5(text) AS content_hash FROM documents",
    tags=("T6", "X2"),
)
def stream_dedup_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus exact-dedup as a STREAM (X2's streaming form, distinct from
    the keyed-event dedup of ``stream_dedup_keys``): documents replay
    through the file source, ``dropDuplicates`` on the content hash keeps
    each text's first arrival, and the drained hash set must equal the
    batch DISTINCT — the projection is hashes only, because WHICH
    duplicate row survives depends on arrival order (nondeterministic
    under parallel file reads) while the surviving hash SET does not.
    State = one 32-hex row per distinct text, the same bounded-state
    argument as the batch md5 group-by; in production the watermarked
    variant (``test_dedup_within_watermark``) bounds it further. The
    companion test ``test_incremental_ingest_dedup_vs_history`` composes
    this with a stream-static anti-join against the historical corpus."""
    from reactivestreams_kinesis_spark.sources.text_formats import (
        DOCUMENTS_SCHEMA,
    )

    docs_stream = (
        spark.readStream.schema(DOCUMENTS_SCHEMA)
        .option("pathGlobFilter", "documents.parquet")
        .parquet(sf_dir)
    )
    deduped = docs_stream.select(
        F.md5("text").alias("content_hash")
    ).dropDuplicates(["content_hash"])
    return _run_to_memory(deduped, "append")


@register(
    "stream_static_enrich",
    oracle="""
    SELECT c.c_mktsegment, e.event_type, COUNT(*) AS n,
           CAST(ROUND(SUM(CAST(e.value AS DECIMAL(18,6))), 6) AS DOUBLE) AS sum_value
    FROM events e JOIN customer c ON e.user_id = c.c_custkey
    GROUP BY 1, 2
    """,
    tags=("J8", "S6"),
)
def stream_static_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream–static join (J8): the events stream enriched against the
    static customer dimension — the canonical streaming-ETL shape (facts
    arrive, dimensions sit in the warehouse). The static side is NOT
    pinned broadcast: customer scales with SF, and the repo-wide guard
    (`test_no_pinned_broadcast_on_scaling_frames`) forbids broadcast pins
    on scaling frames — Spark's size estimation broadcasts the small dim
    per microbatch at test SF and degrades to a shuffle join when the
    dimension outgrows the threshold, which is the right plan at both
    ends. The drained join must equal the batch inner join. The
    segment×type rollup happens on the CAPTURED table so the streaming
    stage stays stateless append (per-batch join only — no watermark, no
    state store), exactly how Spark executes stream–static joins in
    production."""
    stream = read_events_stream(spark, sf_dir)
    customer = load_table(spark, sf_dir, "customer")
    joined = stream.join(
        customer,
        stream.user_id == customer.c_custkey,
        "inner",
    ).select("c_mktsegment", "event_type", "value")
    captured = _run_to_memory(joined, "append")
    return captured.groupBy("c_mktsegment", "event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.expr(
            "CAST(ROUND(SUM(CAST(value AS DECIMAL(18,6))), 6) AS DOUBLE)"
        ).alias("sum_value"),
    )


# --- watermark late-data semantics under the oracle (T2) --------------------
#
# Spark's exact late-data rules, pinned empirically (see
# tests/test_streaming.py::test_watermark_boundary_semantics):
#   - the watermark value is milliseconds: floor(max_event_time_us / 1000)
#     minus the delay in ms; the filter literal is that value * 1000 (us);
#   - the filter applied while executing micro-batch N uses the watermark
#     computed from data through batch N-2 (the update commits one batch
#     after the data that produced it);
#   - a late row is dropped iff its window END <= watermark (equality
#     drops);
#   - at the final (no-data) flush, a window is emitted in append mode iff
#     its END <= the final watermark (equality emits).
# The fixture replay is arranged so every one of those rules is visible in
# the answer, and the oracle recomputes them in portable SQL.

_WM_DELAY_MS = 3 * 86400 * 1000  # 3 days
_DAY_US = 86400 * 1_000_000
_T_LATE = "2024-01-26 00:00:00"  # arrival batch 3 = events before this (late)
_T_LOCK = "2024-01-28 00:00:00"  # arrival batch 2 = events from here (locks wm)


def _late_replay_fixture(spark: SparkSession, sf_dir: str) -> str:
    """Materialize the events fixture as a 3-batch arrival history: the
    mid-range bulk arrives first (establishes the watermark), the newest
    slice second (locks that watermark in for late filtering), and the
    oldest slice LAST (the late cohort, straddling the watermark cutoff).
    One file per cohort + maxFilesPerTrigger=1 makes the micro-batch
    sequence deterministic; file mtimes force the replay order."""
    import os

    from reactivestreams_kinesis_spark.sources.text_formats import fixture_cache_dir

    out = fixture_cache_dir(sf_dir, "late_replay", "events")
    marker = os.path.join(out, "_COMPLETE")
    if not os.path.exists(marker):
        ev = load_table(spark, sf_dir, "events")
        cohorts = [
            ("f1", (F.col("ts") >= _T_LATE) & (F.col("ts") < _T_LOCK)),
            ("f2", F.col("ts") >= _T_LOCK),
            ("f3", F.col("ts") < _T_LATE),
        ]
        for i, (name, pred) in enumerate(cohorts):
            sub = os.path.join(out, name)
            ev.filter(pred).coalesce(1).write.mode("overwrite").parquet(sub)
            for root, _, files in os.walk(sub):
                for f in files:
                    t = 1_000_000 + i * 100
                    os.utime(os.path.join(root, f), (t, t))
        with open(marker, "w") as f:
            f.write("ok")
    return out


_WM_ORACLE = f"""
    WITH wm1 AS (
        SELECT (CAST(floor(epoch_us(MAX(ts)) / 1000) AS BIGINT) - {_WM_DELAY_MS}) * 1000 AS us
        FROM events
        WHERE ts >= TIMESTAMP '{_T_LATE}' AND ts < TIMESTAMP '{_T_LOCK}'
    ),
    wmf AS (
        SELECT (CAST(floor(epoch_us(MAX(ts)) / 1000) AS BIGINT) - {_WM_DELAY_MS}) * 1000 AS us
        FROM events
    ),
    kept AS (
        SELECT e.*,
               (CAST(floor(epoch_us(e.ts) / {_DAY_US}) AS BIGINT) + 1) * {_DAY_US} AS win_end_us
        FROM events e
        WHERE e.ts >= TIMESTAMP '{_T_LATE}'
           OR (CAST(floor(epoch_us(e.ts) / {_DAY_US}) AS BIGINT) + 1) * {_DAY_US}
              > (SELECT us FROM wm1)
    )
    SELECT
        make_timestamp(win_end_us - {_DAY_US}) AS win_start,
        event_type,
        COUNT(*) AS n,
        CAST(ROUND(SUM(CAST(value AS DECIMAL(18,6))), 6) AS DOUBLE) AS sum_value
    FROM kept
    WHERE win_end_us <= (SELECT us FROM wmf)
    GROUP BY 1, 2
"""


@register("stream_watermark_late", oracle=_WM_ORACLE, tags=("T2", "T3", "T8"))
def stream_watermark_late(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermark late-data drop (T2) under the value oracle: a
    daily-window append-mode aggregation over a 3-batch replay of the
    events fixture where the OLDEST slice arrives last. The late cohort
    straddles the watermark cutoff, so part of it is genuinely dropped
    (window end <= watermark) and part survives; and append mode only
    emits windows the final watermark has passed — both boundaries are
    recomputed exactly by the oracle SQL from the same fixture (module
    docstring pins the empirical rules, equality behavior included).
    State at scale is bounded by the watermark: expired windows leave the
    store every batch, which is the entire point of T2."""
    src = _late_replay_fixture(spark, sf_dir)
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    )
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/*")
    )
    windowed = (
        stream.withWatermark("ts", "3 days")
        .groupBy(F.window("ts", "1 day").alias("win"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.expr(
                "CAST(ROUND(SUM(CAST(value AS DECIMAL(18,6))), 6) AS DOUBLE)"
            ).alias("sum_value"),
        )
    )
    captured = _run_to_memory(windowed, "append")
    return captured.select(
        F.col("win.start").alias("win_start"), "event_type", "n", "sum_value"
    )


from reactivestreams_kinesis_spark.queries.aggregates import (  # noqa: E402
    ROLLUP_WEEK_ORACLE,
    merge_day_partials_to_week,
)


@register(
    "stream_rollup_merge",
    oracle=ROLLUP_WEEK_ORACLE,  # the batch rollup oracle, verbatim
    tags=("A8", "T3", "A6"),
)
def stream_rollup_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Materialized-rollup maintenance AS A STREAM (A6/A8 — the
    streaming twin of ``agg_rollup_merge``, completing the incremental
    story the same way ``stream_heavy_hitters_cms`` does for sketches):
    the DAY-grain partial-aggregate table (count / decimal sum / min /
    max — all mergeable, so pure adds against the state store) is
    maintained as a complete-mode streaming aggregation over a 3-batch
    replay of the events fixture (the late-arrival fixture, so the
    partials genuinely update across micro-batches, old days included —
    complete mode has no watermark, nothing drops), and the WEEK answer
    is merged from the CAPTURED partial table by the exact same merge
    stage the batch query uses. Same oracle as the batch query: one
    miscounted add in one day partial breaks the value hash. State is
    bounded by days × event_types — the production shape for streaming
    ingest into a rollup table."""
    src = _late_replay_fixture(spark, sf_dir)
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    )
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/*")
    )
    daily = stream.groupBy(
        F.date_trunc("day", "ts").alias("d"), "event_type"
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("value").cast("decimal(18,6)")).alias("sum_dec"),
        F.min("value").alias("min_value"),
        F.max("value").alias("max_value"),
    )
    captured = _run_to_memory(daily, "complete")
    return merge_day_partials_to_week(captured)


@register(
    "stream_stream_join",
    oracle="""
    SELECT b.event_id AS buy_id,
           c.event_id AS click_id,
           b.user_id AS user_id,
           epoch_us(CAST(b.ts AS TIMESTAMP)) - epoch_us(CAST(c.ts AS TIMESTAMP)) AS gap_us
    FROM events b JOIN events c
      ON b.user_id = c.user_id
     AND c.ts <= b.ts
     AND c.ts >= b.ts - INTERVAL 1 HOUR
    WHERE b.event_type = 'purchase' AND c.event_type = 'click'
    """,
    tags=("J9", "T2"),
)
def stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream–stream inner join (J9) under the value oracle — the last
    join id to get a driver row (its mechanics were pinned by
    ``test_stream_stream_join`` since round 3): purchases joined to the
    same user's clicks within the preceding hour, both sides REAL streams
    with watermarks and the event-time range bound Spark requires to
    bound join state (state older than watermark - 1h is evicted every
    batch — the 100 TB property; without the bound both sides' state
    grows forever). Drained AvailableNow the whole fixture arrives before
    any watermark advances, so the emitted pair SET equals the batch
    range join the oracle computes — the same drain-equivalence argument
    that carried J8 (`stream_static_enrich`). Output is per-pair rows
    (ids + µs gap — integers end to end), so one extra or dropped pair
    breaks the value hash."""
    buys = (
        read_events_stream(spark, sf_dir)
        .filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("buy_id"),
            F.col("user_id").alias("b_user"),
            F.col("ts").alias("buy_ts"),
        )
        .withWatermark("buy_ts", "2 hours")
    )
    clicks = (
        read_events_stream(spark, sf_dir)
        .filter(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("click_ts"),
        )
        .withWatermark("click_ts", "2 hours")
    )
    joined = buys.join(
        clicks,
        (F.col("b_user") == F.col("c_user"))
        & (F.col("click_ts") <= F.col("buy_ts"))
        & (F.col("click_ts") >= F.col("buy_ts") - F.expr("INTERVAL 1 HOUR")),
        "inner",
    ).select(
        "buy_id",
        "click_id",
        F.col("b_user").alias("user_id"),
        (F.unix_micros("buy_ts") - F.unix_micros("click_ts")).alias("gap_us"),
    )
    return _run_to_memory(joined, "append")


_SCD2_DIM_CTE = """
    ordered AS (
        SELECT user_id, event_type,
               epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us,
               event_id,
               LAG(event_type) OVER w AS prev_type
        FROM events
        WHERE event_type IN ('signup', 'purchase', 'error')
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    changes AS (
        SELECT user_id, event_type, ts_us, event_id
        FROM ordered
        WHERE prev_type IS NULL OR prev_type <> event_type
    ),
    dim AS (
        SELECT user_id,
               event_type AS attr_value,
               ts_us AS valid_from_us,
               LEAD(ts_us) OVER w2 AS valid_to_us
        FROM changes
        WINDOW w2 AS (PARTITION BY user_id ORDER BY ts_us, event_id)
    )
"""


@register(
    "stream_temporal_enrich",
    oracle=f"""
    WITH {_SCD2_DIM_CTE}
    SELECT d.attr_value,
           e.event_type,
           COUNT(*) AS n,
           CAST(ROUND(SUM(CAST(e.value AS DECIMAL(18,6))), 6) AS DOUBLE) AS sum_value
    FROM events e
    JOIN dim d
      ON e.user_id = d.user_id
     AND epoch_us(CAST(e.ts AS TIMESTAMP)) >= d.valid_from_us
     AND (d.valid_to_us IS NULL OR epoch_us(CAST(e.ts AS TIMESTAMP)) < d.valid_to_us)
    WHERE e.event_type IN ('view', 'click')
    GROUP BY 1, 2
    """,
    tags=("J8", "J6", "W2"),
)
def stream_temporal_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming point-in-time enrichment — the streaming dual of the
    as-of join (J7) and the canonical warehouse-streaming pattern: each
    arriving interaction event (view/click) joins the SCD2 dimension
    version whose validity interval contains its event time. The
    dimension is the user's LIFECYCLE state (last signup/purchase/error
    transition), built by `build_scd2_dimension` — the exact builder
    `rel_scd2_intervals` registers — so this row driver-checks the SCD2
    interval logic too: one wrong interval boundary misroutes events
    between lifecycle versions and breaks the hash. (Building the dim
    from a DIFFERENT event subset than the enriched stream keeps the
    join non-degenerate — enriching a change-log against its own SCD2
    form would tautologically return each event's own type.) Stream–
    static join with an equi-key (user_id) plus interval containment:
    per micro-batch Spark plans it as a batch hash join on the key with
    the containment as a post-join filter — stateless append, no
    watermark needed, which is why temporal enrichment scales where a
    stream–stream join would hold state. Intervals half-open [from, to)
    — an event AT a change point belongs to the new version; inner join
    drops interactions preceding the user's first lifecycle event;
    µs-integer boundaries end to end. The rollup happens on the
    CAPTURED table (as in `stream_static_enrich`) so the streaming
    stage stays a pure per-batch join."""
    from reactivestreams_kinesis_spark.queries.relational import (
        build_scd2_dimension,
    )

    lifecycle = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("signup", "purchase", "error")
    )
    dim = build_scd2_dimension(lifecycle).select(
        F.col("user_id").alias("d_user"), "attr_value", "valid_from_us", "valid_to_us"
    )
    stream = (
        read_events_stream(spark, sf_dir)
        .filter(F.col("event_type").isin("view", "click"))
        .withColumn("ts_us", F.unix_micros("ts"))
    )
    enriched = stream.join(
        dim,
        (F.col("user_id") == F.col("d_user"))
        & (F.col("ts_us") >= F.col("valid_from_us"))
        & (F.col("valid_to_us").isNull() | (F.col("ts_us") < F.col("valid_to_us"))),
        "inner",
    ).select("attr_value", "event_type", "value")
    captured = _run_to_memory(enriched, "append")
    return captured.groupBy("attr_value", "event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.expr(
            "CAST(ROUND(SUM(CAST(value AS DECIMAL(18,6))), 6) AS DOUBLE)"
        ).alias("sum_value"),
    )


@register(
    "stream_snapshot_ingest",
    oracle="SELECT event_id, user_id, event_type FROM events",
    tags=("T9", "S5", "S6"),
)
def stream_snapshot_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming ingest into a SNAPSHOT TABLE under the value oracle
    (T9 + the round-6 manifest protocol): the events fixture replays
    through the file source, ``snapshot_stream_sink`` commits one table
    version per micro-batch under the deterministic txn id
    ``stream-<scope>-<epoch>`` (scope from the shared checkpoint path,
    so concurrent builders of the same cached table stay mutually
    idempotent), and the latest snapshot must equal the source
    EXACTLY — one duplicated replay or half-visible file breaks the
    hash. Exactly-once here is carried by txn idempotence (a replayed
    epoch finds its txn committed and no-ops) rather than the file
    sink's transaction log — the lakehouse variant of the T9 guarantee,
    with reader isolation thrown in (a reader of version N is untouched
    by in-flight commits). The table builds once per fixture into the
    content-fingerprinted cache; concurrent builders are safe because
    the deterministic txn ids make their commits mutually idempotent."""
    import os

    from reactivestreams_kinesis_spark.operators.snapshots import (
        latest_version,
        read_snapshot,
        snapshot_stream_sink,
    )
    from reactivestreams_kinesis_spark.sources.text_formats import (
        fixture_cache_dir,
    )

    table = fixture_cache_dir(sf_dir, "snap_ingest", "events")
    if latest_version(table) is None:
        stream = read_events_stream(spark, sf_dir, max_files_per_trigger=1)
        q = snapshot_stream_sink(
            stream.select("event_id", "user_id", "event_type"),
            table,
            os.path.join(table, "_checkpoint"),
        )
        if not q.awaitTermination(300):
            q.stop()
            raise TimeoutError("snapshot ingest did not drain in 300s")
    return read_snapshot(spark, table)


@register(
    "src_snapshot_table_read",
    oracle="SELECT event_id, user_id, event_type FROM events",
    tags=("S5", "S1"),
)
def src_snapshot_table_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The `snapshot_table` CUSTOM DATA SOURCE under the value oracle
    (S5 — a first-class format implemented through Spark 4's public
    Python Data Source API, `sources/snapshot_source.py`): batch-read
    the manifest-committed ingest table (built by
    `stream_snapshot_ingest`'s sink if this runs first) through
    ``spark.read.format("snapshot_table")`` — planning binds to the
    manifest (uncommitted files invisible, time travel by version), one
    InputPartition per data file read executor-side as Arrow batches.
    Must equal the raw events fixture exactly; distinct read path from
    `read_snapshot` (which unions concrete parquet paths driver-side)."""
    from reactivestreams_kinesis_spark.operators.snapshots import (
        latest_version,
    )
    from reactivestreams_kinesis_spark.sources.snapshot_source import (
        register_snapshot_source,
    )
    from reactivestreams_kinesis_spark.sources.text_formats import (
        fixture_cache_dir,
    )

    table = fixture_cache_dir(sf_dir, "snap_ingest", "events")
    if latest_version(table) is None:
        stream_snapshot_ingest(spark, sf_dir)  # builds + caches the table
    register_snapshot_source(spark)
    return spark.read.format("snapshot_table").option("path", table).load()


_CDC_LWW_ORACLE = """
    SELECT user_id, last_type,
           epoch_us(CAST(last_ts AS TIMESTAMP)) AS last_ts_us
    FROM (
        SELECT user_id, event_type AS last_type, ts AS last_ts,
               ROW_NUMBER() OVER (
                   PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        FROM events
    )
    WHERE rn = 1 AND last_type <> 'error'
    """


def _run_cdc_apply(spark: SparkSession, sf_dir: str, strategy: str) -> DataFrame:
    """Shared CDC-replication runner for the two lakehouse write
    strategies — see `stream_cdc_apply` / `stream_cdc_apply_mor`."""
    import os
    import tempfile
    import uuid as _uuid

    from pyspark.sql import Window

    from reactivestreams_kinesis_spark.operators.snapshots import (
        read_snapshot,
        snapshot_commit,
        snapshot_stream_merge_sink,
    )
    from reactivestreams_kinesis_spark.sources.snapshot_source import (
        register_snapshot_source,
    )

    register_snapshot_source(spark)
    events = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", F.unix_micros("ts").alias("ts_us")
    )
    run = _uuid.uuid4().hex[:8]
    src = scratch_dir("rsk_cdc_src")
    dst = scratch_dir("rsk_cdc_dst")
    ckpt = scratch_dir("rsk_cdc_ckpt")

    # four TIME-ORDERED slices (global ntile over the change order):
    # bounded single-partition window over the fixture — slice BUILD is
    # test scaffolding; the pipeline under test is feed → merge
    sliced = events.withColumn(
        "__slice",
        F.ntile(4).over(Window.orderBy("ts_us", "event_id")),
    )
    for phase in range(1, 5):
        snapshot_commit(
            sliced.filter(F.col("__slice") == phase).drop("__slice"), src
        )
        changes = (
            spark.readStream.format("snapshot_table").option("path", src).load()
        )
        q = snapshot_stream_merge_sink(
            changes,
            dst,
            ckpt,
            key="user_id",
            order_cols=["ts_us", "event_id"],
            delete_predicate=F.col("event_type") == "error",
            strategy=strategy,
        )
        if not q.awaitTermination(300):
            q.stop()
            raise TimeoutError(f"CDC apply phase {phase} did not drain in 300s")
    return read_snapshot(spark, dst).select(
        "user_id",
        F.col("event_type").alias("last_type"),
        F.col("ts_us").alias("last_ts_us"),
    )


@register("stream_cdc_apply", oracle=_CDC_LWW_ORACLE, tags=("T9", "S5", "J8"))
def stream_cdc_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming CDC REPLICATION under the value oracle — the full
    lakehouse pipeline composed from this repo's own primitives: the
    events change log commits to a snapshot table in four time-ordered
    slices, the `snapshot_table` CHANGE FEED streams the versions (table
    versions as offsets, checkpoint resume between phases — four genuine
    epochs, not one availableNow gulp), and
    `snapshot_stream_merge_sink` applies each micro-batch to a derived
    table as a compacted copy-on-write MERGE (latest per user_id by
    (ts, event_id); an 'error' change deletes the key). The final merged
    table must hash-equal the one-shot batch last-writer-wins query —
    a dropped epoch, unordered apply, double-applied replay, or
    wrongly-retained file all break it. At scale every stage is
    file/touched-proportional: the feed reads only appended files, the
    merge rewrites only key-owning files."""
    return _run_cdc_apply(spark, sf_dir, "copy_on_write")


@register(
    "stream_cdc_apply_mor",
    oracle=_CDC_LWW_ORACLE,
    tags=("T9", "S5", "J3"),
)
def stream_cdc_apply_mor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SAME CDC replication as `stream_cdc_apply`, applied
    MERGE-ON-READ (the Flink→Iceberg shape): each micro-batch commits an
    equality delete of its key set and appends the new versions — zero
    table reads, zero rewrites per epoch — and the final read happens
    with ALL four epochs' equality entries still PENDING (un-compacted),
    so the value check exercises the stacked scoped anti-join path
    end-to-end: a scope leak (retracting a later epoch's append), a
    missed retraction, or a double-applied replay all break the hash
    against the identical last-writer-wins oracle. Ingest cost per epoch
    is O(batch) regardless of table size — the write-optimized half of
    the CoW/MoR trade; `compact_snapshot` folds the entries back when
    read amplification matters."""
    return _run_cdc_apply(spark, sf_dir, "merge_on_read")


# the SAME oracle SQL as the batch twin (ts_gapfill_locf) — which is the
# whole claim: stream ≡ batch, bit-exact (no import cycle: timeseries
# imports only the registry)
from reactivestreams_kinesis_spark.queries.timeseries import _SPINE_CTES  # noqa: E402

_GAPFILL_ORACLE = f"""
    WITH {_SPINE_CTES}
    SELECT user_id, CAST(day AS TIMESTAMP) AS day,
           day_value IS NOT NULL AS observed,
           LAST_VALUE(day_value IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS filled_value
    FROM grid
    """


@register(
    "stream_gapfill_locf",
    oracle=_GAPFILL_ORACLE,
    tags=("T7", "W2", "P4"),
)
def stream_gapfill_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING gap fill + LOCF (the stateful twin of the batch
    ``ts_gapfill_locf``, `streaming/state.py:streaming_gapfill_locf`):
    per-user purchase totals arrive OUT OF ORDER across three
    micro-batches (the fixture's purchase rows hash-split into three
    files, one file per trigger — so a user's later days routinely land
    before earlier ones), and a per-key stateful ledger
    (applyInPandasWithState) re-emits the user's dense LOCF grid each
    time new days arrive. The NEWEST emission per key is the converged
    answer; the oracle is the SAME SQL as the batch twin, so the stream
    must land bit-exactly on the batch result regardless of arrival
    order — exact integer-cent accumulation is what makes that
    possible.

    At 100 TB this is the standing shape for late-data regularization:
    state is per-key observed days (not the dense span), emissions are
    span-proportional and touched-keys-only, and the same fold runs
    unchanged under checkpointed fault tolerance (T9)."""
    import os
    import tempfile
    import uuid as _uuid

    from pyspark.sql import Window

    from reactivestreams_kinesis_spark.streaming.state import (
        streaming_gapfill_locf,
    )

    purchases = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .select(
            "event_id",
            "user_id",
            F.datediff(
                F.to_date("ts"), F.lit("1970-01-01").cast("date")
            ).alias("day"),
            # exact integer cents: DECIMAL(12,2)·100 has a zero fraction,
            # so the cast is exact — the int dual of the batch decimal sum
            (F.col("value").cast("decimal(12,2)") * 100)
            .cast("bigint")
            .alias("cents"),
        )
    )
    src = scratch_dir("rsk_gf")
    purchases.repartition(3, "event_id").drop("event_id").write.parquet(src)
    stream = (
        spark.readStream.schema("user_id bigint, day int, cents bigint")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    captured = _run_to_memory(streaming_gapfill_locf(stream), "update")
    w = Window.partitionBy("user_id")
    return (
        captured.withColumn("__mx", F.max("batch_seq").over(w))
        .filter(F.col("batch_seq") == F.col("__mx"))
        .select(
            "user_id",
            F.col("day").cast("timestamp").alias("day"),
            "observed",
            "filled_value",
        )
    )



@register(
    "stream_mv_maintain",
    oracle="""
    WITH all_rows AS (
        SELECT c_custkey, c_nationkey FROM customer
        UNION ALL
        SELECT CAST(1000000 + n_nationkey AS BIGINT), n_nationkey FROM nation
    ),
    live AS (
        SELECT * FROM all_rows
        WHERE NOT (c_custkey > 1000000 AND c_custkey <= 1000012)
          AND c_nationkey NOT IN (4, 11)
    )
    SELECT c_nationkey,
           COUNT(*) AS n_rows,
           CAST(SUM(c_custkey) AS BIGINT) AS sum_key,
           MIN(c_custkey) AS min_key,
           MAX(c_custkey) AS max_key
    FROM live
    GROUP BY c_nationkey
    """,
    tags=("S5", "A8", "A1", "T9"),
)
def stream_mv_maintain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAM-MAINTAINED MATERIALIZED VIEW under the value oracle
    (`operators/matview.py:stream_refresh_materialized_view` — the
    standing form of `rel_mv_incremental`): the view is created at v0,
    the source then takes an append, a merge-on-read position delete,
    and an equality delete, and the CHANGE FEED STREAM (AvailableNow,
    one version per micro-batch — the reference's demand-bounded fetch)
    drives refreshes through foreachBatch until the backlog drains. All
    aggregates are exact integers, so the oracle — the end state
    aggregated directly from the fixtures — is bit-exact; it breaks if
    any epoch double-applies (the refresh txns and the checkpoint
    offsets must compose) or a version is skipped.

    At 100 TB: this is the standing CDC pattern — delta-proportional
    refreshes triggered by the feed, exactly-once under any crash or
    replay, with the view itself a versioned table."""
    import os
    import tempfile
    import uuid as _uuid

    from reactivestreams_kinesis_spark.operators.matview import (
        create_materialized_view,
        read_materialized_view,
        stream_refresh_materialized_view,
    )
    from reactivestreams_kinesis_spark.operators.snapshots import (
        delete_by_key,
        delete_where,
        snapshot_commit,
    )

    base = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    ins = load_table(spark, sf_dir, "nation").select(
        (F.lit(1000000) + F.col("n_nationkey")).cast("bigint").alias("c_custkey"),
        F.col("n_nationkey").alias("c_nationkey"),
    )
    u = _uuid.uuid4().hex[:8]
    t = scratch_dir("rsk_smv_src")
    v = scratch_dir("rsk_smv_view")
    ck = scratch_dir("rsk_smv_ck")
    snapshot_commit(base.repartitionByRange(6, "c_custkey"), t)            # v0
    create_materialized_view(
        spark,
        v,
        t,
        group_by=["c_nationkey"],
        aggs={
            "n_rows": ("count", None),
            "sum_key": ("sum", "c_custkey"),
            "min_key": ("min", "c_custkey"),
            "max_key": ("max", "c_custkey"),
        },
    )
    snapshot_commit(ins, t)                                                # v1
    delete_where(
        spark,
        t,
        [("c_custkey", ">", 1000000), ("c_custkey", "<=", 1000012)],
        strategy="merge_on_read",
    )                                                                      # v2
    keys = spark.createDataFrame([(4,), (11,)], "c_nationkey int")
    delete_by_key(spark, t, keys, "c_nationkey")                           # v3
    q = stream_refresh_materialized_view(spark, v, ck, max_versions_per_trigger=1)
    q.awaitTermination(300)
    return read_materialized_view(spark, v)
