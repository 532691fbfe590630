"""Physical-plan assertions: the scale properties SURVEY.md §4 promises.

These tests pin the plan shape, not just the answer — a correct query that
scans all columns or shuffles a broadcastable dimension is a regression
here even though the oracle still matches.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from reactivestreams_kinesis_spark.plans.inspect import (
    count_exchanges,
    count_operator,
    explain_string,
    has_operator,
    pushed_filters,
    read_schemas,
)
from reactivestreams_kinesis_spark.queries.registry import all_queries

QUERIES = all_queries()


def test_q01_filter_pushdown_and_pruning(spark, sf_dir):
    df = QUERIES["q01_pricing_summary"].fn(spark, sf_dir)
    filters = pushed_filters(df)
    assert any("l_shipdate" in f for f in filters), filters
    (schema,) = read_schemas(df)
    # only the 7 referenced columns reach the scan — not all 11
    assert schema.count(":") == 7, schema
    assert "l_orderkey" not in schema


def test_projection_prunes_scan(spark, sf_dir):
    df = QUERIES["rel_projection_compute"].fn(spark, sf_dir)
    (schema,) = read_schemas(df)
    assert schema.count(":") == 4, schema


def test_filter_pushdown_predicates(spark, sf_dir):
    df = QUERIES["rel_filter_predicates"].fn(spark, sf_dir)
    filters = pushed_filters(df)
    assert any("c_mktsegment" in f and "In" in f for f in filters), filters
    assert any("c_acctbal" in f for f in filters), filters


def test_q05_broadcasts_dimensions(spark, sf_dir):
    df = QUERIES["q05_local_supplier_volume"].fn(spark, sf_dir)
    # bounded dims (nation/region) are pinned broadcasts; at this SF the
    # size-based planner broadcasts customer/supplier too (no pin needed)
    assert count_operator(df, "BroadcastHashJoin") >= 4
    # at most the fact-fact join shuffles + agg/sort exchanges
    assert count_exchanges(df) <= 4, explain_string(df)


def _broadcast_args(src: str) -> list[str]:
    """Every F.broadcast(...) argument expression in `src`, full text,
    balanced-paren extraction so multi-line and nested calls are covered."""
    args, i, needle = [], 0, "F.broadcast("
    while True:
        j = src.find(needle, i)
        if j < 0:
            return args
        k = j + len(needle)
        depth, end = 1, k
        while depth:
            depth += {"(": 1, ")": -1}.get(src[end], 0)
            end += 1
        args.append(src[k : end - 1].strip())
        i = end


# Broadcast hints are a scale contract: a pin overrides AQE's size-based
# fallback, so ONLY expressions whose size is bounded regardless of scale
# factor may carry one. Each allowlisted root below names a documented
# bounded frame; anything new must be justified here, not just compile.
_BOUNDED_BROADCAST_ROOTS = {
    "nation",  # 25 rows at every SF
    "region",  # 5 rows at every SF
    "n1",  # nation aliases
    "n2",
    "q",  # cosine/LSH query side — documented broadcast contract
    "centroids",  # IVF codebook: n_lists rows
    "pct",  # winsorize percentile rows: bounded by key domain
    "n_docs",  # one-row corpus-size aggregate
    "eval_side",  # decontaminate benchmark grams: fixed id-range split
    "left.sparkSession.range",  # salted-join salt table: n_salts rows
    # skew_split_join hot build rows: |hot_keys| x (build rows per key),
    # bounded by the documented 1:few-per-key caller contract
    "hot_build",
    # skew_split_join lazy detection: ≤ |left| / hot_threshold keys can
    # exceed the count threshold, at any scale factor
    "hot_key_frame",
    # dynamic_prune_join IN-list regime only: key cardinality observed
    # <= max_keys in THIS call, rows dimension-sized by the documented
    # caller contract; the range-fallback regime never pins
    "bounded_dim",
    # _dim_delta_partials bounded-key regime only: the ≤ _DIRTY_PRUNE_CAP
    # probe proved the dim feed's distinct-key set bounded before the pin
    # (rows per key bounded by the SCD-1 churn-per-fold caller contract,
    # same class as hot_build); the over-cap regime stays unpinned for
    # AQE to decide
    "dfeed",
}


def test_no_pinned_broadcast_on_scaling_frames():
    """No F.broadcast() argument may be, or derive from, an SF-scaling
    table — a pin there OOMs executors at the 100 TB target. Checked on
    the full argument expression (not just bare variable names, so
    `F.broadcast(customer.filter(...))` is caught) plus a root-identifier
    allowlist so new pin sites fail until their boundedness is argued.
    Enforced at the source level because at test SF the physical plans
    are identical either way (AQE broadcasts small frames regardless)."""
    import pathlib
    import re

    import reactivestreams_kinesis_spark as pkg

    pdir = pathlib.Path(pkg.__file__).parent
    scaling = ("customer", "supplier", "part", "orders", "lineitem",
               "events", "documents", "embeddings", "docs", "corpus")
    for path in pdir.rglob("*.py"):
        for arg in _broadcast_args(path.read_text()):
            words = set(re.findall(r"[A-Za-z_][A-Za-z0-9_]*", arg))
            hit = words & set(scaling)
            assert not hit, f"{path.name}: F.broadcast over scaling frame {hit}: {arg}"
            # the allowlisted root must be the arg's leading dotted
            # identifier chain (or a dotted prefix of it) — a plain
            # startswith would let root "q" whitelist e.g. "quotes_df"
            chain_match = re.match(
                r"[A-Za-z_][A-Za-z0-9_]*(?:\.[A-Za-z_][A-Za-z0-9_]*)*", arg
            )
            chain = chain_match.group(0) if chain_match else ""
            root = next(
                (
                    r
                    for r in _BOUNDED_BROADCAST_ROOTS
                    if chain == r or chain.startswith(r + ".")
                ),
                None,
            )
            assert root is not None, (
                f"{path.name}: unlisted F.broadcast arg {arg!r} — prove "
                "boundedness and add its root to _BOUNDED_BROADCAST_ROOTS"
            )


def test_topk_is_take_ordered(spark, sf_dir):
    df = QUERIES["sort_topk"].fn(spark, sf_dir)
    assert has_operator(df, "TakeOrderedAndProject")


def test_window_topk_group_limit(spark, sf_dir):
    df = QUERIES["win_topk_per_group"].fn(spark, sf_dir)
    assert has_operator(df, "WindowGroupLimit")


def test_session_scale_confs_pinned(spark):
    """The confs that carry the 100 TB posture (SCALING.md) must survive
    session construction: AQE with partition coalescing and skew-join
    splitting, parquet filter pushdown, bounded split size. A silent
    default regression here changes every plan in the repo."""
    expected = {
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.coalescePartitions.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.parquet.filterPushdown": "true",
        # INT96 timestamps carry no row-group stats -> no data skipping
        "spark.sql.parquet.outputTimestampType": "TIMESTAMP_MICROS",
        "spark.sql.files.maxPartitionBytes": str(128 * 1024 * 1024),
        "spark.sql.session.timeZone": "UTC",
    }
    for key, want in expected.items():
        assert spark.conf.get(key) == want, key


def test_vocab_topk_rank_after_limit(spark, sf_dir):
    """Corpus vocab top-K: the global top-K must be TakeOrderedAndProject
    (per-partition heaps + single merge, never a global sort), and the
    rank window must consume the already-limited K rows — Window as the
    PARENT of the limit in the plan tree — so its unpartitioned sort
    touches K rows regardless of corpus size."""
    df = QUERIES["text_vocab_topk"].fn(spark, sf_dir)
    plan = explain_string(df)
    assert "TakeOrderedAndProject" in plan, plan
    assert plan.index("Window") < plan.index("TakeOrderedAndProject"), plan


def test_cosine_topk_broadcasts_queries(spark, sf_dir):
    df = QUERIES["sim_cosine_topk"].fn(spark, sf_dir)
    # query side broadcast → corpus side never shuffles for the join
    assert has_operator(df, "BroadcastNestedLoopJoin")
    assert has_operator(df, "WindowGroupLimit")


def test_semi_join_stays_semi(spark, sf_dir):
    df = QUERIES["join_semi_anti"].fn(spark, sf_dir)
    plan = explain_string(df)
    assert "LeftSemi" in plan
    assert "LeftAnti" in plan


def test_pack_sequences_window_is_sharded(spark, sf_dir):
    """The packing running-sum must partition by shard — a no-PARTITION-BY
    window collapses to one task (Exchange SinglePartition), the
    single-task bottleneck that breaks at 100 TB."""
    df = QUERIES["pack_sequences"].fn(spark, sf_dir)
    assert "SinglePartition" not in explain_string(df), explain_string(df)


def test_tfidf_construction_is_lazy(spark, sf_dir):
    """Building the TF-IDF plan must fire ZERO Spark jobs: the corpus size
    N is a one-row aggregate inside the plan, not a driver-side count().
    An eager count at construction would be a full corpus scan before the
    query even runs. (First-ever read of a parquet path fires a one-task
    footer job for schema inference — prewarm so that doesn't confound.)"""
    from reactivestreams_kinesis_spark.catalog import load_table

    load_table(spark, sf_dir, "documents")
    sc = spark.sparkContext
    sc.setJobGroup("tfidf-build", "construction must be lazy")
    try:
        QUERIES["text_tfidf_topk"].fn(spark, sf_dir)
        jobs = sc.statusTracker().getJobIdsForGroup("tfidf-build")
        assert list(jobs) == [], f"construction fired jobs: {jobs}"
    finally:
        sc.setLocalProperty("spark.jobGroup.id", None)


def test_whole_stage_codegen_everywhere(spark, sf_dir):
    """Expression-only queries must fuse into WholeStageCodegen spans.
    AQE defers codegen assignment until runtime, so inspect the static plan
    with AQE off — the codegen decision itself is AQE-independent."""
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        for name in [
            "q01_pricing_summary",
            "fn_string",
            "fn_array_vector",
            "text_simhash",
            "text_redact_pii",
        ]:
            df = QUERIES[name].fn(spark, sf_dir)
            plan = explain_string(df, "formatted")
            assert plan.count("codegen id") > 0, f"{name} has no codegen span"
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")


def test_no_python_udf_in_expression_paths(spark, sf_dir):
    """The expression-first policy (§2.11): core operator families contain
    no Python evaluation nodes (BatchEvalPython/ArrowEvalPython)."""
    for name, q in QUERIES.items():
        if name.startswith(("udf_", "multimodal_features", "stream_")):
            continue  # declared Python paths
        plan = explain_string(q.fn(spark, sf_dir))
        assert "EvalPython" not in plan, f"{name} silently uses a Python UDF"


def test_partitioned_write_prunes_on_read(spark, sf_dir, tmp_path):
    """Partition layout → directory pruning: a lang filter over the
    partitioned copy scans only that partition's files."""
    from reactivestreams_kinesis_spark.catalog import load_table
    from reactivestreams_kinesis_spark.streaming.sinks import write_partitioned

    docs = load_table(spark, sf_dir, "documents")
    out = str(tmp_path / "docs_by_lang")
    write_partitioned(docs, out, ["lang"])
    got = spark.read.parquet(out).filter(F.col("lang") == "en")
    plan = explain_string(got, "formatted")
    assert "PartitionFilters: [isnotnull(lang" in plan, plan
    assert got.count() == docs.filter(F.col("lang") == "en").count()


def test_bucketed_join_eliminates_shuffle(spark, sf_dir, tmp_path):
    """Bucketing both join sides on the key removes the fact-fact shuffle
    entirely — the storage-level answer to the one exchange Q5 keeps.
    (SCALING.md 'Joins'; bucket counts must match.)"""
    import uuid as _uuid

    from reactivestreams_kinesis_spark.catalog import load_table

    spark.conf.set("spark.sql.sources.bucketing.enabled", "true")
    suffix = _uuid.uuid4().hex[:8]
    lineitem = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    lt, ot = f"lineitem_b_{suffix}", f"orders_b_{suffix}"
    (lineitem.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey").saveAsTable(lt))
    (orders.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey").saveAsTable(ot))
    try:
        joined = spark.table(lt).join(
            spark.table(ot), F.col("l_orderkey") == F.col("o_orderkey")
        )
        assert count_exchanges(joined) == 0, explain_string(joined, "simple")
        # sanity that count_exchanges can see shuffles at all (the
        # unbucketed join broadcasts at this SF, so probe a groupBy)
        assert count_exchanges(lineitem.groupBy("l_orderkey").count()) > 0
        assert joined.count() == lineitem.join(
            orders, F.col("l_orderkey") == F.col("o_orderkey")
        ).count()
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {lt}")
        spark.sql(f"DROP TABLE IF EXISTS {ot}")


def test_q16_anti_join_and_pushdown(spark, sf_dir):
    """Q16's NOT IN must compile to a (broadcast) anti join — never a
    per-row subquery — and the part predicates must reach the scan."""
    df = QUERIES["q16_parts_supplier_relationship"].fn(spark, sf_dir)
    s = explain_string(df)
    assert "LeftAnti" in s, s
    filters = pushed_filters(df)
    assert any("p_brand" in f for f in filters), filters
    assert any("p_size" in f and "In" in f for f in filters), filters


def test_q20_semi_join_chain(spark, sf_dir):
    """Q20's nested INs must compile to left-semi joins (two of them) so
    only keys flow, never the probed rows."""
    df = QUERIES["q20_potential_promotion"].fn(spark, sf_dir)
    assert explain_string(df).count("LeftSemi") >= 2


def test_decontaminate_broadcasts_eval_grams(spark, sf_dir):
    """Decontamination must broadcast the (tiny) eval-gram set into a semi
    join — a shuffle here would mean the corpus postings get exchanged,
    which is the anti-pattern at 100 TB."""
    df = QUERIES["decontaminate_ngram"].fn(spark, sf_dir)
    s = explain_string(df)
    assert "BroadcastHashJoin LeftSemi" in s, s


def test_range_binned_avoids_nested_loop(spark, sf_dir):
    """The binned range join's whole point: the range predicate must NOT
    plan as a nested-loop join — bin equi-join (hash/sort-merge) + refine
    filter only. The theta form is the documented quadratic baseline."""
    df = QUERIES["join_range_binned"].fn(spark, sf_dir)
    assert not has_operator(df, "BroadcastNestedLoopJoin"), explain_string(df)
    theta = QUERIES["join_range_theta"].fn(spark, sf_dir)
    assert has_operator(theta, "BroadcastNestedLoopJoin")


def test_skew_split_hot_branch_broadcasts(spark, sf_dir):
    """skew_split_join's hot branch must plan as a broadcast join (its
    build side is the hot keys' few rows) while the rest branch stays a
    normal join — i.e. the plan contains BOTH join flavors."""
    df = QUERIES["join_skew_split"].fn(spark, sf_dir)
    assert has_operator(df, "BroadcastHashJoin"), explain_string(df)


def test_cms_counter_build_is_one_partial_agg(spark, sf_dir):
    """The count-min counter build must be ONE aggregation with map-side
    partial aggregation on (i, b): the shuffle then carries at most
    d·w rows per map partition regardless of corpus size — the property
    that makes the sketch cheaper than the exact vocabulary agg it
    approximates. Exactly one shuffle exchange, two HashAggregate phases
    (partial + final), no join anywhere in the counter build."""
    from reactivestreams_kinesis_spark.catalog import load_table
    from reactivestreams_kinesis_spark.queries.llm_text import (
        cms_counters,
        cms_tokens,
    )

    counters = cms_counters(cms_tokens(load_table(spark, sf_dir, "documents")))
    simple = explain_string(counters, "simple")
    assert count_exchanges(counters) == 1
    assert simple.count("HashAggregate") == 2
    assert "partial_count" in simple  # map-side combine before the shuffle
    assert "Join" not in simple
    # and the scan reads ONLY the text column (pruned)
    assert "ReadSchema: struct<text:string>" in simple


def test_skew_profile_single_fact_scan(spark, sf_dir):
    """rel_skew_profile must read the fact table ONCE: rank and global
    stats both derive from windows over the per-key count table, not
    from re-aggregating the fact scan per branch (the CTE-per-branch
    form silently scanned lineitem twice)."""
    plan = explain_string(QUERIES["rel_skew_profile"].fn(spark, sf_dir), "simple")
    assert plan.count("FileScan") == 1


def test_event_analytics_single_scan(spark, sf_dir):
    """events_funnel and events_cohort_retention each read the events
    table ONCE: the funnel folds a NULL-skipping CASE collect_list (no
    population join), the cohort derives its week by window over the
    single (user, week) aggregation. Regressing to a two-branch join
    shape doubles the 100 TB fact scan."""
    for name in ("events_funnel", "events_cohort_retention"):
        plan = explain_string(QUERIES[name].fn(spark, sf_dir), "simple")
        assert plan.count("FileScan") == 1, name
        assert "Join" not in plan, name


def test_rollup_merge_two_level_aggregation(spark, sf_dir):
    """agg_rollup_merge must be exactly the two-level mergeable shape:
    one fact scan, and no more than two shuffle exchanges (day-grain
    partial table, week-grain merge) — a third exchange would mean the
    merge re-derived something from raw events."""
    df = QUERIES["agg_rollup_merge"].fn(spark, sf_dir)
    plan = explain_string(df, "simple")
    assert plan.count("FileScan") == 1
    assert count_exchanges(df) <= 2, explain_string(df)


def test_sample_weighted_uses_window_group_limit(spark, sf_dir):
    """sample_weighted's per-language top-k must push the k-limit into
    WindowGroupLimit (partial top-k per task before the shuffle) — the
    W4 plan property that keeps the 100 TB sort local."""
    df = QUERIES["sample_weighted"].fn(spark, sf_dir)
    assert has_operator(df, "WindowGroupLimit"), explain_string(df)


def test_ivf_int8_no_cartesian_product(spark, sf_dir):
    """sim_ann_ivf_int8: every join keys on centroid_id or vec_id — the
    only nested-loop-style operator allowed is the broadcast codebook
    cross join feeding assignment/probing; a CartesianProduct anywhere
    means the quantized-list equi-join degenerated to all-pairs."""
    df = QUERIES["sim_ann_ivf_int8"].fn(spark, sf_dir)
    plan = explain_string(df, "formatted")
    assert "CartesianProduct" not in plan
    assert "centroid_id" in plan


def test_rewrite_change_feed_plan_bounded(spark, sf_dir, tmp_path):
    """The CoW rewrite diff (`_rewrite_change_rows`) must stay a bounded
    plan: no CartesianProduct, and exchanges bounded by the diff's two
    shuffles (group-by-all-columns, plus the keyed case's key-flag agg
    and join) — a runaway plan here would make the feed cost
    table-proportional instead of rewrite-proportional."""
    from pyspark.sql import functions as F

    from reactivestreams_kinesis_spark.catalog import load_table
    from reactivestreams_kinesis_spark.operators.snapshots import (
        merge_upsert,
        snapshot_change_feed,
        snapshot_commit,
    )

    t = str(tmp_path / "t")
    base = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey", "c_acctbal"
    )
    snapshot_commit(base.repartitionByRange(4, "c_custkey"), t)
    upd = base.filter("c_custkey <= 50").select(
        "c_custkey", "c_nationkey", (F.col("c_acctbal") + 1.0).alias("c_acctbal")
    )
    merge_upsert(spark, t, upd, "c_custkey")
    feed = snapshot_change_feed(spark, t, from_version=0, to_version=1)
    plan = explain_string(feed, "formatted")
    assert "CartesianProduct" not in plan
    assert count_exchanges(feed) <= 5, explain_string(feed)
