"""reactivestreams_kinesis_spark — a PySpark-native analytics engine.

A from-scratch engine with the query and data-processing capabilities of
``msfrank/reactivestreams-kinesis`` (a Reactive Streams ``Publisher<Record>``
over an AWS Kinesis shard — see ``/root/reference``), re-expressed Spark-first:

- The reference's streaming surface (demand-bounded, offset-seekable,
  limit/take-N, per-shard-ordered record stream; reference
  ``ShardPublisher.java`` / ``ShardSubscription.java``) maps onto Structured
  Streaming (``streaming/`` package).
- The relational / LLM-data-pipeline operator library (mandated beyond the
  reference's surface) is pure DataFrame API + Catalyst — no custom planner
  rules, no RDDs, UDFs only where expressions can't reach
  (``operators/``, ``functions/``, ``queries/``).

Every query operator is registered in ``queries.registry`` with both a PySpark
implementation and (where SQL-expressible) a DuckDB-compatible ANSI-SQL oracle,
so the correctness harness can diff them on the same parquet fixtures.
"""

from reactivestreams_kinesis_spark.session import get_spark, released_caches

__version__ = "0.1.0"


def __getattr__(name):
    """Lazy re-exports of the operator surface (kept lazy so importing the
    package never drags the full query registry in)."""
    if name == "ShardStream":
        from reactivestreams_kinesis_spark.streaming import ShardStream

        return ShardStream
    if name == "asof_join":
        from reactivestreams_kinesis_spark.operators.joins import asof_join

        return asof_join
    if name == "salted_join":
        from reactivestreams_kinesis_spark.operators.joins import salted_join

        return salted_join
    if name == "skew_split_join":
        from reactivestreams_kinesis_spark.operators.joins import skew_split_join

        return skew_split_join
    if name == "extract_features":
        from reactivestreams_kinesis_spark.operators.multimodal import extract_features

        return extract_features
    if name in ("sorted_write", "compact_parquet"):
        from reactivestreams_kinesis_spark.operators import layout

        return getattr(layout, name)
    if name in _SNAPSHOT_OPS:
        from reactivestreams_kinesis_spark.operators import snapshots

        return getattr(snapshots, name)
    if name in _MATVIEW_OPS:
        from reactivestreams_kinesis_spark.operators import matview

        return getattr(matview, name)
    if name == "merge_into":
        from reactivestreams_kinesis_spark.operators.merge_into import merge_into

        return merge_into
    if name == "dynamic_prune_join":
        from reactivestreams_kinesis_spark.operators.joins import dynamic_prune_join

        return dynamic_prune_join
    if name in ("colocated_join", "register_colocated_source"):
        from reactivestreams_kinesis_spark.sources import colocated

        return getattr(colocated, name)
    if name in _ANN_INDEX_OPS:
        from reactivestreams_kinesis_spark.operators import ann_index

        return getattr(ann_index, name)
    if name == "SnapshotWarehouse":
        from reactivestreams_kinesis_spark.operators.sql_frontend import (
            SnapshotWarehouse,
        )

        return SnapshotWarehouse
    if name == "all_queries":
        from reactivestreams_kinesis_spark.queries.registry import all_queries

        return all_queries
    if name in _DEDUP_OPS:
        from reactivestreams_kinesis_spark.queries import llm_dedup

        return getattr(llm_dedup, name)
    if name in _SIM_OPS:
        from reactivestreams_kinesis_spark.queries import llm_similarity

        return getattr(llm_similarity, name)
    if name in _PIPELINE_OPS:
        from reactivestreams_kinesis_spark.queries import llm_pipeline

        return getattr(llm_pipeline, name)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")


# Parameterized (DataFrame-in, DataFrame-out) dedup / similarity operators —
# the tuning-knob surface behind the fixed oracle-checked query instantiations.
_DEDUP_OPS = (
    "shingle_postings",
    "jaccard_pairs",
    "minhash_lsh_candidates",
    "minhash_lsh_pairs",
    "connected_components",
)
_SIM_OPS = ("cosine_topk", "ann_lsh_topk", "ann_ivf_topk")
# Snapshot-table warehouse surface (operators/snapshots.py): commit
# protocol, time travel, DML, constraints, maintenance, streaming sinks.
_SNAPSHOT_OPS = (
    "snapshot_commit",
    "read_snapshot",
    "scan_snapshot",
    "snapshot_changes",
    "latest_version",
    "merge_upsert",
    "delete_where",
    "update_where",
    "add_constraint",
    "set_bloom_columns",
    "prune_files",
    "compact_snapshot",
    "vacuum",
    "vacuum_by_retention",
    "table_stats_summary",
    "describe_history",
    "restore_snapshot",
    "delete_by_key",
    "tag_snapshot",
    "resolve_tag",
    "list_tags",
    "delete_tag",
    "version_at_timestamp",
    "snapshot_files",
    "snapshot_change_feed",
    "SnapshotConflictError",
    "QuietRangeError",
    "snapshot_stream_sink",
    "snapshot_stream_merge_sink",
    "clone_snapshot",
    "rename_column",
    "add_column",
    "alter_column_type",
    "drop_column",
    "set_partition_spec",
    "set_ndv_columns",
    "approx_distinct_count",
    "compaction_advice",
)
# Incremental materialized views (operators/matview.py)
_MATVIEW_OPS = (
    "create_materialized_view",
    "create_materialized_view_over_join",
    "refresh_materialized_view",
    "read_materialized_view",
    "materialized_view_status",
    "stream_refresh_materialized_view",
)
_ANN_INDEX_OPS = (
    "build_ivf_index",
    "probe_ivf_index",
    "append_to_ivf_index",
    "tune_ivf",
)
_PIPELINE_OPS = (
    "pack_assignments",
    "decontaminate",
    "bloom_build",
    "bloom_maybe_contains",
)

__all__ = [
    "get_spark",
    "released_caches",
    "ShardStream",
    "asof_join",
    "salted_join",
    "skew_split_join",
    "extract_features",
    "sorted_write",
    "compact_parquet",
    "all_queries",
    *_DEDUP_OPS,
    *_SIM_OPS,
    *_SNAPSHOT_OPS,
    *_MATVIEW_OPS,
    "merge_into",
    "dynamic_prune_join",
    "colocated_join",
    "register_colocated_source",
    "SnapshotWarehouse",
    *_ANN_INDEX_OPS,
    *_PIPELINE_OPS,
    "__version__",
]
