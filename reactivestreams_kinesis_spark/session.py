"""SparkSession factory with scale-aware defaults.

Local harness runs on ``local[$SPARK_GRAFT_CPUS]`` (single JVM); the conf
choices below are the ones that carry to a real multi-executor cluster:
AQE (runtime re-planning, partition coalescing, skew-join splitting),
shuffle partitions sized to parallelism instead of the 200 default, Arrow
for any Python exchange, and UTC session time so timestamp semantics match
the DuckDB oracle.
"""

from __future__ import annotations

import os
from contextlib import contextmanager

from pyspark.sql import DataFrame, SparkSession


def get_spark(
    app_name: str = "reactivestreams-kinesis-spark",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the session.

    ``cpus`` defaults to ``$SPARK_GRAFT_CPUS`` then ``os.cpu_count()``.
    ``shuffle_partitions`` defaults to ``cpus`` — on a 1000-executor cluster
    this would instead be sized ~2-3x total cores / to target ~128-256 MB
    per shuffle partition; AQE coalesces the excess at runtime either way.
    """
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    if shuffle_partitions is None:
        shuffle_partitions = max(cpus, 8)

    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        # INT96 (the legacy default) writes NO row-group min/max stats for
        # timestamps — silently disabling data skipping on every time
        # column this engine writes; micros keeps stats + modern interop
        .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
        # events.ts is TIMESTAMP(NANOS) parquet, which Spark rejects by
        # default; read as int64 nanos and convert in the catalog layer.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # micros-without-tz parquet must read as TimestampType (not NTZ):
        # chrono fns reject NTZ and UTC-session values are identical anyway.
        .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "24g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
    )
    for key, value in (extra_conf or {}).items():
        builder = builder.config(key, value)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


@contextmanager
def released_caches(spark: SparkSession):
    """Scope within which query-internal ``persist()`` caches are allowed
    to accumulate; caches CREATED INSIDE the scope are dropped on exit.

    The registry's lazy-DataFrame contract means operators persist shared
    fan-out intermediates (postings, candidates, survivors) and cannot
    unpersist them before returning — the caller still holds the lazy
    plan. In a one-shot driver run the ContextCleaner reclaims them; a
    long-lived session running many queries (the bench loop, a notebook)
    should wrap each query in this scope so storage memory stays bounded
    instead of drifting until GC catches up.

    Scoping tracks ``DataFrame.persist()`` calls made inside the scope
    and unpersists exactly those on exit — NOT ``clearCache()``, which
    would also drop caches created OUTSIDE the scope (a notebook user's
    own ``df.cache()``, or an enclosing scope's caches on nested use;
    nesting is safe — the outer scope re-unpersisting the inner's
    already-released frames is a no-op). ``unpersist`` removes the
    CacheManager entry too, so a later identical plan can re-cache.
    Locally checkpointed frames are deliberately NOT released: their
    storage is the only copy of the data (no lineage to rebuild from),
    and the ContextCleaner reclaims them when the result plan is
    garbage collected.
    """
    # patch the class that DEFINES persist: in Spark 4 the classic
    # DataFrame overrides the unified-API base, so patching the base
    # would never be hit by classic (JVM-backed) frames
    try:
        from pyspark.sql.classic.dataframe import DataFrame as _DF
    except ImportError:  # pragma: no cover - older/connect-only layouts
        _DF = DataFrame
    tracked: list[DataFrame] = []
    orig_persist = _DF.persist

    def tracking_persist(self: DataFrame, *args, **kwargs) -> DataFrame:
        out = orig_persist(self, *args, **kwargs)
        tracked.append(out)
        return out

    _DF.persist = tracking_persist  # type: ignore[method-assign]
    try:
        yield spark
    finally:
        _DF.persist = orig_persist  # type: ignore[method-assign]
        for df in tracked:
            df.unpersist(blocking=True)


def persist_once(df: DataFrame, *args, **kwargs) -> DataFrame:
    """``persist()`` that no-ops when the plan is ALREADY in the
    CacheManager — the single entry point for query-internal persists.

    Why: the bench's best-of-2 semantics rebuild the same lazy plan and
    re-run it inside one ``released_caches`` scope, so trial 2's persist
    hits trial 1's plan-matched cache entry and the JVM logs ``WARN
    CacheManager: Asked to cache already cached data`` — harmless (the
    second call is a no-op) but noise that can mask a real caching bug.
    Checking ``lookupCachedData`` first keeps bench stderr clean, and the
    skipped persist is still released on scope exit because trial 1's
    call was tracked. Falls back to a plain persist if the internal JVM
    surface ever moves."""
    try:
        jcm = df.sparkSession._jsparkSession.sharedState().cacheManager()
        already = jcm.lookupCachedData(df._jdf).isDefined()
    except Exception:  # pragma: no cover - internal API drift
        already = False
    return df if already else df.persist(*args, **kwargs)


def cached_rdd_count(spark: SparkSession) -> int:
    """Number of RDDs currently holding storage (cached blocks) — the
    observable released_caches() zeroes out; exposed for tests/bench."""
    return len(spark.sparkContext._jsc.sc().getRDDStorageInfo())
