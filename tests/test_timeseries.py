"""Time-series gap-fill contracts beyond the value-oracle mirror
(test_registry_oracle covers bit-exactness; these pin the structural
invariants and the plan shape).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from reactivestreams_kinesis_spark.queries.timeseries import (
    _purchase_grid,
    ts_gapfill_locf,
    ts_interpolate_linear,
)
from reactivestreams_kinesis_spark.plans.inspect import (
    count_exchanges,
    explain_string,
)


def test_spine_contiguous_and_endpoint_observed(spark, sf_dir):
    """Each user's spine covers every day of its observed span exactly
    once, and both span endpoints are observed rows (which is what makes
    LOCF total and every interpolation gap interior)."""
    grid = _purchase_grid(spark, sf_dir)
    per_user = grid.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_days"),
        F.countDistinct("day").alias("n_distinct"),
        (F.datediff(F.max("day"), F.min("day")) + 1).alias("span"),
        F.min(F.struct("day", "day_value")).alias("first"),
        F.max(F.struct("day", "day_value")).alias("last"),
    )
    bad = per_user.filter(
        (F.col("n_days") != F.col("span"))
        | (F.col("n_distinct") != F.col("span"))
        | F.col("first.day_value").isNull()
        | F.col("last.day_value").isNull()
    )
    assert bad.count() == 0


def test_locf_total_and_piecewise_constant(spark, sf_dir):
    """filled_value is never NULL, equals the observed value on observed
    days, and on gap days equals the previous observed day's value."""
    out = ts_gapfill_locf(spark, sf_dir)
    assert out.filter(F.col("filled_value").isNull()).count() == 0
    grid = _purchase_grid(spark, sf_dir).withColumnRenamed("day_value", "raw")
    joined = out.join(
        grid.select("user_id", F.col("day").cast("timestamp").alias("day"), "raw"),
        ["user_id", "day"],
    )
    assert joined.filter(F.col("observed") & (F.col("filled_value") != F.col("raw"))).count() == 0


def test_interpolation_strictly_inside_fenceposts(spark, sf_dir):
    """On gap days the interpolated value lies between the two fencepost
    observations (linear interpolation never extrapolates), and observed
    days pass through (up to the 6dp round)."""
    out = ts_interpolate_linear(spark, sf_dir).filter(~F.col("observed"))
    w_lo = F.least("prev", "next")
    w_hi = F.greatest("prev", "next")
    grid = _purchase_grid(spark, sf_dir)
    from pyspark.sql import Window

    wb = Window.partitionBy("user_id").orderBy("day").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    wf = Window.partitionBy("user_id").orderBy("day").rowsBetween(
        Window.currentRow, Window.unboundedFollowing
    )
    fen = grid.select(
        "user_id",
        F.col("day").cast("timestamp").alias("day"),
        F.last("day_value", ignorenulls=True).over(wb).alias("prev"),
        F.first("day_value", ignorenulls=True).over(wf).alias("next"),
    )
    j = out.join(fen, ["user_id", "day"])
    eps = 1e-6  # the 6dp round can nudge a value onto the boundary
    bad = j.filter(
        (F.col("interp_value") < w_lo - eps) | (F.col("interp_value") > w_hi + eps)
    )
    assert bad.count() == 0
    assert j.count() == out.count()


def test_gapfill_plan_shape(spark, sf_dir):
    """The whole gap-fill is a bounded-exchange plan: daily agg, span
    agg, spine join, one shared window sort — no cartesian product, and
    the two interpolation fill windows (same partitioning + ordering,
    different frames) must not add an exchange over the single-window
    LOCF plan."""
    locf = ts_gapfill_locf(spark, sf_dir)
    interp = ts_interpolate_linear(spark, sf_dir)
    assert "CartesianProduct" not in explain_string(interp)
    n_locf, n_interp = count_exchanges(locf), count_exchanges(interp)
    assert n_locf <= 5, explain_string(locf)
    assert n_interp == n_locf, explain_string(interp)


def test_stream_gapfill_locf_matches_batch(spark, sf_dir):
    """The streaming stateful gap-fill/LOCF twin converges bit-exactly
    to the batch result across a THREE-batch out-of-order replay (the
    purchase rows hash-split into three files, one per trigger, so
    earlier days routinely arrive after later ones), and really did run
    as a multi-batch stateful fold (some key's grid was re-emitted)."""
    from reactivestreams_kinesis_spark.queries.streaming_batch import (
        stream_gapfill_locf,
    )

    streamed = stream_gapfill_locf(spark, sf_dir)
    batch = ts_gapfill_locf(spark, sf_dir)
    assert streamed.exceptAll(batch).count() == 0
    assert batch.exceptAll(streamed).count() == 0
