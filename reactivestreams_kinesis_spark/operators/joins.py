"""Join operators Spark lacks natively (SURVEY.md §2.4 J5-J7).

The reference is single-stream (``ShardPublisher.java:16`` — one
``Publisher<Record>``; no join surface anywhere in its 3 main files), so all
joins are [MANDATE]. Equi/outer/semi/anti/cross joins are native DataFrame
calls used directly in ``queries/joins.py``; this module composes the ones
that need a strategy: the as-of (nearest-prior) join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    payload: list[str],
    how: str = "left",
) -> DataFrame:
    """As-of join (J7): for each left row, attach the payload of the latest
    right row with ``right_ts <= left_ts`` and the same ``on`` key.

    Spark has no native ASOF JOIN (DuckDB does — the oracle uses it), so
    this composes one with the union+last(ignorenulls) merge:

    1. tag right rows (is_right=1) and left rows (is_right=0), union them
       with aligned schemas;
    2. single window per key ordered by (ts, is_right DESC) — at equal
       timestamps the right row sorts first, making the match inclusive;
    3. ``last(payload, ignorenulls=True)`` over an unbounded-preceding frame
       fills the latest right payload forward;
    4. keep only left rows.

    Scale rationale: this is ONE shuffle + sort of |L|+|R| rows — the same
    cost as a sort-merge join — versus the naive equi-join+filter+rank
    composition which materializes |L_k|×|R_k| pairs per key before ranking
    (quadratic in key skew, lethal at 100 TB). Right rows must be unique per
    (key, ts) for a deterministic result — pre-dedup with a row_number if
    they are not.

    ``how='left'`` keeps unmatched left rows (payload nulls), ``'inner'``
    drops them.
    """
    left_cols = left.columns
    # The whole payload travels as ONE nullable struct: per-column
    # last(ignorenulls) would independently skip a NULL payload value and
    # resurrect it from an OLDER right row (or stitch columns from
    # different rows). A struct from a right row is non-null even when
    # every field is NULL, so last(struct) always picks the latest matched
    # right row atomically — and its null-ness doubles as the match flag.
    right_types = dict(right.dtypes)
    struct_type = (
        "struct<" + ", ".join(f"`{c}`:{right_types[c]}" for c in payload) + ">"
    )
    tagged_right = right.select(
        F.col(on).alias(on),
        F.col(right_ts).alias("__ts"),
        F.lit(1).alias("__is_right"),
        F.struct(*[F.col(c) for c in payload]).alias("__payload"),
        *[F.lit(None).cast(dict(left.dtypes)[c]).alias(c) for c in left_cols if c != on],
    )
    tagged_left = left.select(
        F.col(on),
        F.col(left_ts).alias("__ts"),
        F.lit(0).alias("__is_right"),
        F.lit(None).cast(struct_type).alias("__payload"),
        *[F.col(c) for c in left_cols if c != on],
    )
    merged = tagged_right.unionByName(tagged_left)

    w = (
        Window.partitionBy(on)
        .orderBy(F.col("__ts"), F.col("__is_right").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = merged.select(
        "*", F.last("__payload", ignorenulls=True).over(w).alias("__filled")
    )
    out = filled.filter(F.col("__is_right") == 0).select(
        F.col(on),
        *[F.col(c) for c in left_cols if c != on],
        *[F.col(f"__filled.{c}").alias(c) for c in payload],
        F.col("__filled").isNotNull().alias("__matched"),
    )
    if how == "inner":
        out = out.filter(F.col("__matched"))
    return out.drop("__matched")


def salted_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-mitigated equi-join: split each hot left key across ``n_salts``
    sub-partitions and replicate the right side once per salt.

    AQE's skew-join handles skew between existing partitions; salting is
    the stronger remedy when a SINGLE key is so hot one task would still
    own it entirely (the classic null-key / celebrity-entity case at
    100 TB). The salt is derived from a hash of the whole left row —
    deterministic, no rand() — so results are reproducible.

    Cost model: right side is duplicated ``n_salts``× (use on the smaller
    side / after pre-filtering); left rows fan out 1:1. Equivalent rows to
    a plain join — verified in tests.

    Only ``inner`` and ``left`` are supported: in right/full outer modes
    each unmatched right row would surface once per salt replica.
    """
    if how not in ("inner", "left"):
        raise ValueError(
            f"salted_join supports how='inner'/'left', got {how!r} — "
            "right/full would duplicate unmatched right rows per salt"
        )
    salt = F.pmod(F.hash(*[F.col(c) for c in left.columns]), F.lit(n_salts))
    salted_left = left.withColumn("__salt", salt)
    replicated_right = right.crossJoin(
        F.broadcast(
            left.sparkSession.range(n_salts).select(F.col("id").cast("int").alias("__salt"))
        )
    )
    out = salted_left.join(replicated_right, [key, "__salt"], how)
    return out.drop("__salt")


def skew_split_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    how: str = "inner",
    hot_threshold: int = 100_000,
    hot_keys: list | None = None,
    detect: str = "lazy",
) -> DataFrame:
    """Split-treatment equi-join for single-hot-key skew: hot keys route
    through a broadcast of their (few) build rows, everything else
    through a normal shuffle join, and the two branches union.

    The remedy ladder this completes (measured, BASELINE.md round-4
    "Join skew" table): AQE skew-join splits oversized partitions at
    runtime but needs its size thresholds met; whole-table
    ``salted_join`` replicates the ENTIRE build side n_salts× — measured
    5× slower than doing nothing when the build side is 1.5 M rows. The
    split treatment replicates nothing: ``right`` filtered to the hot
    keys is at most |hot_keys| × (build rows per key), which for
    dimension-keyed fact joins (the case where skew hurts) is tiny and
    broadcast-safe regardless of scale factor. That boundedness is the
    CALLER's contract: use this when the build side is ~1:few rows per
    key; an N:N hot key needs aggregation before the join, not a join
    strategy.

    ``hot_keys=None`` detects hot keys per ``detect``:

    - ``detect="lazy"`` (default) keeps the builder lazy: the bounded
      hot-key frame stays IN the plan, broadcast, and both sides split
      via broadcast semi/anti joins against it. No driver action ever
      runs — the detection aggregate executes with the query, and its
      four uses collapse to one evaluation through Spark's broadcast
      exchange reuse (``ReusedExchange``, plan-pinned). The default
      because construction stays job-free: a naive caller building the
      join against a 100 TB fact table must not pay an eager
      full-table count before the query even runs.
    - ``detect="collect"`` runs one count-aggregate job over the probe
      side eagerly — a bounded driver action (≤ |left| / hot_threshold
      keys can exceed the threshold) — and routes via a literal
      ``isin``. One extra job at CONSTRUCTION time, but the returned
      plan is then literal-filtered single-pass; use it when the same
      built plan re-executes many times.

    Pass the known hot keys explicitly (the null-key / celebrity-entity
    case is usually known upfront) to skip detection entirely.

    Only ``inner`` and ``left`` are supported, matching ``salted_join``:
    the branch split is exact for those (a left row lands in exactly one
    branch; unmatched right rows are never emitted).
    """
    if how not in ("inner", "left"):
        raise ValueError(
            f"skew_split_join supports how='inner'/'left', got {how!r}"
        )
    if detect not in ("collect", "lazy"):
        raise ValueError(f"detect must be 'collect' or 'lazy', got {detect!r}")
    if hot_keys is None and detect == "lazy":
        # bounded: at most |left| / hot_threshold keys can exceed the
        # count threshold, independent of scale factor
        hot_key_frame = (
            left.groupBy(key)
            .count()
            .filter(F.col("count") > hot_threshold)
            .select(key)
        )
        hot = F.broadcast(hot_key_frame)
        # null keys never match a semi join, so they fall through to the
        # anti branch — same routing as the eager version's isNull() arm
        hot_left = left.join(hot, key, "semi")
        rest_left = left.join(hot, key, "anti")
        hot_build = right.join(hot, key, "semi")
        rest_right = right.join(hot, key, "anti")
        hot_branch = hot_left.join(F.broadcast(hot_build), key, how)
        rest = rest_left.join(rest_right, key, how)
        return rest.unionByName(hot_branch)
    if hot_keys is None:
        hot_keys = [
            r[0]
            for r in left.groupBy(key)
            .count()
            .filter(F.col("count") > hot_threshold)
            .select(key)
            .collect()
        ]
    if not hot_keys:
        return left.join(right, key, how)
    is_hot = F.col(key).isin(hot_keys)
    hot_build = right.filter(is_hot)
    hot = left.filter(is_hot).join(F.broadcast(hot_build), key, how)
    rest = left.filter(~is_hot | F.col(key).isNull()).join(
        right.filter(~is_hot), key, how
    )
    return rest.unionByName(hot)


def derive_bin_width(
    intervals: DataFrame, start_col: str, end_col: str
) -> float:
    """Data-derived bin width for ``range_join``: the MEDIAN interval
    width, from one small stats aggregate (``percentile_approx``). The
    median keeps the typical interval at ~2 exploded bins — the knob's
    whole job — and is robust to a few huge outlier intervals that would
    drag a mean. Degenerate inputs (empty, all-NULL, or all zero-width
    intervals) fall back to 1.0: binning is EXACT at any width, so the
    fallback can only cost performance, never rows."""
    row = intervals.agg(
        F.percentile_approx(F.col(end_col) - F.col(start_col), 0.5).alias("w")
    ).collect()[0]
    w = row["w"]
    if w is None or float(w) <= 0:
        return 1.0
    return float(w)


def range_join(
    intervals: DataFrame,
    points: DataFrame,
    start_col: str,
    end_col: str,
    point_col: str,
    bin_width: float | None = None,
) -> DataFrame:
    """Exact interval-point range join via binning — the scale path for
    big×big range predicates that Spark otherwise plans as a (broadcast)
    nested-loop join with |intervals| × |points| predicate evaluations.

    Each interval [start, end] explodes to the bins of width ``bin_width``
    it overlaps (``width / bin_width + 1`` rows — the width should sit
    near the typical interval width so this is ~2); each point hashes to
    ONE bin; a bin equi-join produces candidates and the real predicate
    refines them. ``bin_width=None`` (default) derives it from the data
    as the median interval width (``derive_bin_width`` — one small stats
    aggregate, a bounded driver action that runs EAGERLY at
    DataFrame-construction time: with the ``None`` default this builder
    executes a Spark job on call instead of staying lazy — pass
    ``bin_width`` explicitly in plan-only / dry-planning contexts),
    removing the one knob a naive
    caller can set catastrophically: a width 100× below the interval
    width explodes every interval to ~100 bin rows. Pass the constant
    explicitly to keep the plan single-pass when the width is known.
    Exactness holds at ANY width: any (interval, point) pair with
    start ≤ p ≤ end shares the bin floor(p / bin_width), which the
    interval's bin range covers by construction, and duplicate candidates
    are impossible because a point owns exactly one bin. Same trick as
    the LSH band join (X3) and the documented scale path of the
    ``join_range_theta`` query.

    Inner semantics only — compose outer behavior at the call site (e.g.
    left-join the aggregated inner result back to the interval side; see
    ``queries/joins.py:join_range_binned``). Column names must not
    collide between the two sides (rename before calling, as with any
    Spark join).
    """
    if bin_width is None:
        bin_width = derive_bin_width(intervals, start_col, end_col)
    b = F.lit(bin_width)
    binned_intervals = intervals.withColumn(
        "__bin",
        F.explode(
            F.sequence(
                F.floor(F.col(start_col) / b), F.floor(F.col(end_col) / b)
            )
        ),
    )
    binned_points = points.withColumn("__bin", F.floor(F.col(point_col) / b))
    return (
        binned_intervals.join(binned_points, "__bin")
        .filter(F.col(point_col).between(F.col(start_col), F.col(end_col)))
        .drop("__bin")
    )


def dynamic_prune_join(
    spark,
    fact_dir: str,
    dim: DataFrame,
    on: tuple,
    *,
    version: int | None = None,
    max_keys: int = 1024,
    broadcast_dim: bool = True,
) -> DataFrame:
    """DYNAMIC FILE PRUNING for a fact⋈dim join over a snapshot-format
    fact table — the Delta/Databricks DFP / Spark DPP shape, driven by
    the manifest instead of a runtime exchange: evaluate the (already
    filtered) dim side FIRST, derive a compact description of its join
    keys, and plan the fact scan from only the files that can match.

    ``on`` is ``(fact_key, dim_key)``. Two regimes, chosen by the dim's
    observed key cardinality (one bounded driver job — the same budget
    as `skew_split_join`'s eager mode, but over the DIM side, which is
    small by assumption; a 100 TB fact side is never collected):

    - ≤ ``max_keys`` distinct keys: an IN-list predicate prunes fact
      files through every manifest index — partition tuples (a bucket
      layout turns the IN-list into exact bucket hits), min/max stats,
      and column blooms — then re-applies row-exactly in the scan.
    - more: fall back to the dim keys' [min, max] RANGE, which still
      prunes range-clustered fact layouts and never collects more than
      one row.

    The join itself pins a broadcast only in the IN-list regime (the
    observed key cardinality is bounded, and the caller's contract is a
    dimension-sized dim — rows on the order of keys, the star-schema
    shape); the range regime never pins (the dim exceeded the key cap,
    so AQE decides from its runtime size). ``broadcast_dim=False``
    disables the pin entirely. Semantics are exactly ``fact.join(dim,
    fact_key == dim_key, "inner")`` — pruning is planning-time only,
    the predicate re-applies on rows, and NULL keys never match in
    either regime.

    At 100 TB: a selective dim filter (the common star-schema query)
    turns a full fact scan into a handful of file opens BEFORE the join
    runs — the scan plans from metadata, not from a shuffle-time filter
    the way JVM DPP does, so it works through the Python source and the
    native scan alike."""
    from reactivestreams_kinesis_spark.operators.snapshots import (
        read_snapshot,
        scan_snapshot,
    )

    fact_key, dim_key = on
    in_list_regime = False
    keys_df = dim.select(dim_key).where(F.col(dim_key).isNotNull()).distinct()
    sample = [r[0] for r in keys_df.limit(max_keys + 1).collect()]
    if not sample:
        # provably empty join: scan_snapshot with an impossible IN-list
        # returns the fact's empty frame, keeping the schema contract
        fact = scan_snapshot(spark, fact_dir, [(fact_key, "in", ())], version=version)
    elif len(sample) <= max_keys:
        in_list_regime = True
        fact = scan_snapshot(
            spark, fact_dir, [(fact_key, "in", tuple(sample))], version=version
        )
    else:
        lo_hi = dim.agg(
            F.min(dim_key).alias("lo"), F.max(dim_key).alias("hi")
        ).collect()[0]
        if lo_hi["lo"] is None:
            fact = scan_snapshot(
                spark, fact_dir, [(fact_key, "in", ())], version=version
            )
        else:
            fact = scan_snapshot(
                spark,
                fact_dir,
                [(fact_key, ">=", lo_hi["lo"]), (fact_key, "<=", lo_hi["hi"])],
                version=version,
            )
    # bounded_dim: key cardinality observed <= max_keys this call, rows
    # dimension-sized by the documented caller contract (star-schema
    # dim); the range regime never pins — AQE sizes it at runtime
    if broadcast_dim and in_list_regime:
        bounded_dim = dim
        rhs = F.broadcast(bounded_dim)
    else:
        rhs = dim
    return fact.join(rhs, fact[fact_key] == rhs[dim_key], "inner")
