"""Producer sink (S3), Kinesis option surface (S1/S2 mapping), multimodal
plumbing (X5), and sketch-accuracy checks (A3)."""

from __future__ import annotations

from pyspark.sql import functions as F

from reactivestreams_kinesis_spark.catalog import load_table
from reactivestreams_kinesis_spark.operators.multimodal import (
    attach_fake_media,
    extract_features,
)
from reactivestreams_kinesis_spark.sources.kinesis import kinesis_options
from reactivestreams_kinesis_spark.streaming.records import (
    RECORD_SCHEMA,
    events_as_records,
)
from reactivestreams_kinesis_spark.streaming.sinks import (
    kinesis_record_sink,
    parquet_record_sink,
)


def test_parquet_record_sink_roundtrip(spark, sf_dir, tmp_path):
    records = events_as_records(spark, sf_dir)
    src = str(tmp_path / "src")
    records.coalesce(1).write.parquet(src)
    stream = spark.readStream.schema(RECORD_SCHEMA).parquet(src)
    q = parquet_record_sink(stream, str(tmp_path / "out"), str(tmp_path / "ckpt"))
    q.awaitTermination(120)
    out = spark.read.schema(RECORD_SCHEMA).parquet(str(tmp_path / "out"))
    assert out.count() == records.count()


def test_kinesis_record_sink_put_batches(spark, sf_dir, tmp_path):
    """The producer pushes ≤500-record chunks with (Data, PartitionKey) —
    the PutRecords shape the reference's seeding code uses one-at-a-time
    (ShardPublisherVerification.scala:42-52). The push runs executor-side
    (foreachPartition, no driver collect), so the double records each call
    as a file in a shared tmp dir — an in-memory list would stay behind in
    the worker processes."""
    import uuid

    records = events_as_records(spark, sf_dir)
    src = str(tmp_path / "src")
    records.coalesce(1).write.parquet(src)
    stream = spark.readStream.schema(RECORD_SCHEMA).parquet(src)

    calls_dir = tmp_path / "calls"
    calls_dir.mkdir()

    def fake_put(stream_name: str, entries: list[dict]) -> None:
        assert len(entries) <= 500
        assert all(isinstance(e["Data"], bytes) and e["PartitionKey"] for e in entries)
        (calls_dir / f"{stream_name}__{uuid.uuid4().hex}").write_text(str(len(entries)))

    q = kinesis_record_sink(stream, "out-stream", fake_put)
    q.awaitTermination(120)
    calls = [(p.name.split("__")[0], int(p.read_text())) for p in calls_dir.iterdir()]
    assert sum(n for _, n in calls) == records.count()
    assert all(name == "out-stream" for name, _ in calls)


def test_kinesis_reader_option_mapping(spark):
    """S1/S2: the builder maps ShardIteratorType names onto connector
    options without touching the network."""
    opts = kinesis_options(
        "reactivestreams-kinesis-test",  # the reference's fixture stream name
        iterator_type="AT_SEQUENCE_NUMBER",
        starting_sequence_number="49541296383533603670305612509442272402935890174985191426",
        max_records_per_fetch=100,
    )
    assert opts["streamName"] == "reactivestreams-kinesis-test"
    assert opts["startingPosition"] == "at_sequence_number"
    assert opts["maxRecordsPerFetch"] == "100"
    import pytest

    with pytest.raises(ValueError):
        kinesis_options("s", iterator_type="BOGUS")


def test_multimodal_feature_batches(spark, sf_dir):
    """X5: mapInPandas feature extraction preserves row count and emits the
    declared schema, with deterministic features."""
    docs = load_table(spark, sf_dir, "documents")
    feats = extract_features(attach_fake_media(docs))
    assert feats.count() == docs.count()
    row = feats.orderBy("doc_id").first()
    assert row.media_type == "image/fake"
    assert row.n_bytes > 0 and len(row.checksum) == 32
    # width/height derive from payload length deterministically
    assert row.width == row.n_bytes % 640 and row.height == row.n_bytes % 480


def test_approx_count_distinct_accuracy(spark, sf_dir):
    """A3: HLL++ sketches are engine-specific (rows-only at the driver) but
    must be within the configured 2% rsd of exact, ~5x tolerance."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    rows = (
        lineitem.groupBy("l_returnflag")
        .agg(
            F.approx_count_distinct("l_partkey", 0.02).alias("approx"),
            F.countDistinct("l_partkey").alias("exact"),
        )
        .collect()
    )
    for r in rows:
        assert abs(r.approx - r.exact) / r.exact < 0.10, r


def test_salted_join_equivalence(spark, sf_dir):
    """Skew salting must be a pure physical rewrite: same rows as the
    plain join, with the hot key spread across n_salts sub-keys."""
    from reactivestreams_kinesis_spark.catalog import load_table
    from reactivestreams_kinesis_spark.operators.joins import salted_join

    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer").withColumnRenamed(
        "c_custkey", "o_custkey"
    )
    plain = orders.join(customer, "o_custkey").select("o_orderkey", "c_name")
    salted = salted_join(orders, customer, "o_custkey", n_salts=8).select(
        "o_orderkey", "c_name"
    )
    assert plain.count() == salted.count()
    assert plain.subtract(salted).count() == 0
    assert salted.subtract(plain).count() == 0


def test_shingles_handle_short_documents(spark):
    """Regression: documents with <3 tokens must shingle to an empty set
    (as DuckDB's range() does) instead of crashing Spark's sequence()/
    element_at with a descending index range."""
    from reactivestreams_kinesis_spark.queries.llm_dedup import _SPARK_SHINGLES

    docs = spark.createDataFrame(
        [(1, "one"), (2, "one two"), (3, "one two three")], "doc_id long, text string"
    )
    got = (
        docs.withColumn("toks", F.split("text", " "))
        .select("doc_id", F.expr(_SPARK_SHINGLES).alias("sh"))
        .collect()
    )
    by_id = {r.doc_id: list(r.sh) for r in got}
    assert by_id[1] == [] and by_id[2] == []
    assert by_id[3] == ["one two three"]


def test_asof_inner_keeps_null_payload_matches(spark):
    """Regression: inner as-of must keep a left row whose matched right row
    carries a NULL payload value (match-existence is not payload-null)."""
    from reactivestreams_kinesis_spark.operators.joins import asof_join

    left = spark.createDataFrame([(1, 10, "L1"), (2, 10, "L2")], "k int, lt int, tag string")
    right = spark.createDataFrame([(1, 5, None), (3, 5, "x")], "k int, rt int, pay string")
    got = asof_join(
        left, right, on="k", left_ts="lt", right_ts="rt", payload=["pay"], how="inner"
    ).collect()
    # k=1 matched (payload NULL) -> kept; k=2 unmatched -> dropped
    assert [(r.k, r.pay) for r in got] == [(1, None)]


def test_salted_join_rejects_outer_modes(spark, sf_dir):
    import pytest

    from reactivestreams_kinesis_spark.catalog import load_table
    from reactivestreams_kinesis_spark.operators.joins import salted_join

    orders = load_table(spark, sf_dir, "orders")
    with pytest.raises(ValueError):
        salted_join(orders, orders, "o_orderkey", how="full")


def test_asof_latest_null_payload_not_resurrected(spark):
    """Regression: when the LATEST matched right row carries a NULL payload
    value, the as-of join must return that NULL — not resurrect the value
    from an older right row (per-column last(ignorenulls) did exactly
    that; the payload now travels as one atomic struct)."""
    from reactivestreams_kinesis_spark.operators.joins import asof_join

    left = spark.createDataFrame([(1, 10)], "k int, lt int")
    right = spark.createDataFrame(
        [(1, 1, "old", 100), (1, 5, None, 200)], "k int, rt int, pay string, amt int"
    )
    got = asof_join(
        left, right, on="k", left_ts="lt", right_ts="rt", payload=["pay", "amt"]
    ).collect()
    # latest match is rt=5 → pay NULL, amt 200 — atomically from that row
    assert [(r.pay, r.amt) for r in got] == [(None, 200)]


def test_minhash_recall_invariant(spark, tmp_path):
    """Structural LSH invariant: documents with IDENTICAL shingle sets have
    identical MinHash signatures, hence identical band keys, hence MUST be
    candidates — and survive exact verify with jaccard == 1.0. Run on a
    synthetic corpus so the invariant is exercised by construction."""
    from reactivestreams_kinesis_spark.queries.registry import all_queries

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows = [
        (1, base, "en", "srcX", len(base)),
        (2, base + " lambda", "en", "srcX", len(base) + 7),   # near-dup of 1
        (3, base, "en", "srcX", len(base)),                   # exact dup of 1
        # shares a 3-shingle prefix with doc 1 (jaccard ~0.2, BELOW the
        # threshold) so the exclusion assertions actually exercise the
        # threshold filter, not just shingle disjointness
        (4, "alpha beta gamma delta epsilon one two three four five six", "en", "srcX", 60),
    ]
    docs_dir = str(tmp_path)
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.parquet(docs_dir + "/documents.parquet")

    pairs = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in all_queries()["dedup_minhash_lsh"].fn(spark, docs_dir).collect()
    }
    assert pairs.get((1, 3)) == 1.0, f"exact dup pair must be recalled: {pairs}"
    # doc 4 DOES share shingles with 1-3 (candidate-able) but sits below
    # the jaccard threshold — the verify stage must reject it
    assert (1, 4) not in pairs and (2, 4) not in pairs and (3, 4) not in pairs


def test_parameterized_operator_knobs(spark, tmp_path):
    """The knob-exposed operator forms (minhash_lsh_pairs, cosine_topk,
    connected_components) must work at NON-default parameters: a wider
    16-hash signature needs the generalized md5-digest chain (4 digests),
    band_size=4 changes banding arithmetic, and k/column-name overrides
    must flow through the similarity path."""
    from reactivestreams_kinesis_spark import (
        connected_components,
        cosine_topk,
        minhash_lsh_pairs,
        shingle_postings,
    )

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    docs = spark.createDataFrame(
        [(1, base), (2, base + " lambda"), (3, base), (10, "unrelated words only here nothing shared at all today")],
        "doc_id long, text string",
    )
    toks = shingle_postings(docs)
    pairs = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in minhash_lsh_pairs(toks, n_hashes=16, band_size=4).collect()
    }
    # identical shingle sets -> identical 16-hash signatures -> recalled
    assert pairs.get((1, 3)) == 1.0
    assert all(10 not in p for p in pairs)

    comps = {
        r.doc_id: r.component_id
        for r in connected_components(
            spark.createDataFrame([(7, 8), (8, 9)], "u long, v long"),
            src_col="u", dst_col="v",
        ).collect()
    }
    assert comps == {7: 7, 8: 7, 9: 7}

    emb = spark.createDataFrame(
        [(i, [float(i == j) for j in range(4)]) for i in range(4)],
        "id long, vec array<float>",
    )
    got = cosine_topk(
        emb, emb, k=1, query_id="id", query_vec="vec",
        corpus_id="id", corpus_vec="vec",
    ).collect()
    # each one-hot vector's nearest neighbor (k=1) is itself, cosine 1.0
    assert {(r.query_id, r.neighbor_id, r.cosine) for r in got} == {
        (i, i, 1.0) for i in range(4)
    }


def test_ngram_ops_handle_short_documents(spark, tmp_path):
    """Regression guard: 1-token documents must not crash the bigram /
    n-gram expressions (Spark sequence() counts down below the gram
    width), and must simply contribute no grams."""
    from reactivestreams_kinesis_spark.queries.registry import all_queries

    rows = [
        (1, "one", "en", "s", 3),
        (69, "eval doc with some shared tokens here today", "en", "s", 43),
        (2, "eval doc with some shared tokens here today exactly", "en", "s", 51),
    ]
    docs_dir = str(tmp_path)
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.parquet(docs_dir + "/documents.parquet")

    rep = {r.doc_id: r.n_bigrams for r in all_queries()["text_repetition"].fn(spark, docs_dir).collect()}
    assert 1 not in rep and rep[2] == 8  # 9 tokens -> 8 bigrams

    # doc 69 is the eval doc (69 % 97 = 69, _EVAL_PRED); doc 2 shares its
    # 5-grams so it must be flagged, doc 1 (too short to gram) must not
    dec = {r.doc_id: r.n_shared for r in all_queries()["decontaminate_ngram"].fn(spark, docs_dir).collect()}
    assert 2 in dec and 1 not in dec


def test_ann_recall_floors(spark, sf_dir):
    """The approximate similarity paths must beat chance against their
    brute-force recall oracle: multi-probe LSH measured 0.52 recall@5 on
    the fixture (single-bucket probing was 0.08 ≈ 1/16 chance), IVF with
    the round-5 Lloyd-learned codebook and nprobe=2 measured 0.52 at
    sf0.001 (strided init alone had been the round-4 0.25-floor case;
    the learned/strided recall-vs-nprobe table lives in BASELINE.md).
    Floors sit below measurement but far above the ~0.08 chance line so
    a probing regression fails loudly."""
    from reactivestreams_kinesis_spark.queries.registry import all_queries

    q = all_queries()
    brute = {
        (r.query_id, r.neighbor_id)
        for r in q["sim_cosine_topk"].fn(spark, sf_dir).collect()
    }
    for name, floor in [("sim_ann_lsh", 0.4), ("sim_ann_ivf", 0.4)]:
        approx = {
            (r.query_id, r.neighbor_id)
            for r in q[name].fn(spark, sf_dir).collect()
        }
        recall = len(brute & approx) / len(brute)
        assert recall >= floor, f"{name} recall@5 {recall:.2f} < {floor}"

    # round-12 tuned configuration (tune_ivf / ANN_RECALL.json: nprobe=8
    # on the learned codebook meets the ≥0.5@5 target at sf0.1 with 19%
    # of the corpus scanned; the query default nprobe=2 sits at 0.23
    # under the 100-pseudo-query harness): the tuned-nprobe arm clears
    # the 0.5 floor on the fixture too — a probing regression that
    # survives the chance-line floors above still fails here
    import os as _os

    from pyspark.sql import functions as F

    from reactivestreams_kinesis_spark.queries.llm_similarity import (
        IVF_STRIDE,
        LLOYD_SAMPLE_SPARK,
        N_QUERIES,
        ann_ivf_topk,
        lloyd_refine,
    )

    emb = spark.read.parquet(_os.path.join(sf_dir, "embeddings.parquet"))
    corpus = emb.filter(F.col("vec_id") >= N_QUERIES).select(
        "vec_id", F.col("embedding").alias("cv")
    )
    queries = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    init = emb.filter(
        (F.col("vec_id") >= N_QUERIES) & (F.col("vec_id") % IVF_STRIDE == 5)
    ).select(F.col("vec_id").alias("centroid_id"), F.col("embedding").alias("centv"))
    cent = lloyd_refine(
        corpus.filter(F.expr(LLOYD_SAMPLE_SPARK)), init
    ).localCheckpoint(eager=True)
    tuned = {
        (r.query_id, r.neighbor_id)
        for r in ann_ivf_topk(queries, corpus, cent, nprobe=8).collect()
    }
    recall8 = len(brute & tuned) / len(brute)
    assert recall8 >= 0.5, f"tuned nprobe=8 recall@5 {recall8:.2f} < 0.5"


def test_released_caches_drops_query_persists(spark, sf_dir):
    """A long-lived session (bench loop, notebook) must be able to run a
    cache-heavy query and get storage memory back: inside the scope the
    query's internal persists materialize; on exit they are all dropped.
    Without the release they would sit until ContextCleaner GC — the
    accumulation ADVICE flagged on repeated registry invocations."""
    from reactivestreams_kinesis_spark.queries.registry import all_queries
    from reactivestreams_kinesis_spark.session import released_caches

    def storage_ids(s):
        return {i.id() for i in s.sparkContext._jsc.sc().getRDDStorageInfo()}

    # start from a clean CacheManager: earlier tests in the shared session
    # may have cached the very same logical plan (CacheManager dedupes by
    # plan), which would mask this query's persists. Compare RDD-id SETS,
    # not counts: surviving localCheckpoint blocks of EARLIER tests can be
    # reclaimed by the ContextCleaner at any moment, which made a
    # count-delta assertion flaky under the full suite.
    spark.catalog.clearCache()
    base_ids = storage_ids(spark)
    with released_caches(spark):
        (
            all_queries()["dedup_minhash_lsh"]
            .fn(spark, sf_dir)
            .write.format("noop")
            .mode("overwrite")
            .save()
        )
        new_ids = storage_ids(spark) - base_ids
        assert new_ids, "query persists never cached"
    assert not (storage_ids(spark) & new_ids), "caches survived the release scope"


def test_kinesis_reader_load_surfaces_connector_error(spark):
    """The kinesis_reader option-assembly path executed end-to-end: with no
    connector jar deployed, .load() must fail with Spark's
    DATA_SOURCE_NOT_FOUND for the 'kinesis' format — proving the reader is
    correctly assembled (options attached, format resolved) right up to
    the single boundary this harness cannot cross (a deployed connector +
    AWS credentials). A deployment that ships the connector jar turns this
    exact call into a live stream; nothing in the module changes."""
    import pytest

    from reactivestreams_kinesis_spark.sources.kinesis import kinesis_reader

    reader = kinesis_reader(
        spark,
        "reactivestreams-kinesis-test",  # the reference's TCK stream name
        iterator_type="AT_SEQUENCE_NUMBER",
        starting_sequence_number="49590338271490256608559692538361571095921575989136588898",
        max_records_per_fetch=100,
    )
    # surfaces as SparkClassNotFoundException through the py4j boundary
    # (not a captured AnalysisException), so match on the error condition
    with pytest.raises(Exception, match="DATA_SOURCE_NOT_FOUND") as exc:
        reader.load()
    assert "kinesis" in str(exc.value)


def test_skew_split_join_equivalence(spark, sf_dir):
    """Split-treatment skew join must be a pure physical rewrite: same
    rows as the plain join for inner AND left modes, with planted hot
    keys and NULL probe keys (a null key must survive a left join and
    vanish from an inner join, same as plain)."""
    from reactivestreams_kinesis_spark.catalog import load_table
    from reactivestreams_kinesis_spark.operators.joins import skew_split_join

    orders = load_table(spark, sf_dir, "orders")
    # plant skew: 30% of orders point at one customer; a few null keys
    skewed = orders.withColumn(
        "o_custkey",
        F.when(F.pmod(F.hash("o_orderkey"), F.lit(10)) < 3, F.lit(7).cast("bigint"))
        .when(F.pmod(F.hash("o_orderkey"), F.lit(97)) == 0, F.lit(None))
        .otherwise(F.col("o_custkey")),
    )
    customer = load_table(spark, sf_dir, "customer").withColumnRenamed(
        "c_custkey", "o_custkey"
    )
    for how in ("inner", "left"):
        plain = skewed.join(customer, "o_custkey", how).select(
            "o_orderkey", "o_custkey", "c_name"
        )
        for hot_keys in (None, [7]):
            split = skew_split_join(
                skewed, customer, "o_custkey", how=how,
                hot_threshold=100, hot_keys=hot_keys,
            ).select("o_orderkey", "o_custkey", "c_name")
            assert plain.count() == split.count(), (how, hot_keys)
            assert plain.subtract(split).count() == 0, (how, hot_keys)
            assert split.subtract(plain).count() == 0, (how, hot_keys)


def test_skew_split_join_lazy_equivalence_and_no_driver_job(spark, sf_dir):
    """detect='lazy' must (a) return the same rows as the plain join and
    the eager split (inner AND left, with planted hot + NULL keys), and
    (b) never run a driver action at construction time — pinned by
    poisoning DataFrame.collect during the builder call."""
    from unittest import mock

    from pyspark.sql import DataFrame

    from reactivestreams_kinesis_spark.catalog import load_table
    from reactivestreams_kinesis_spark.operators.joins import skew_split_join

    orders = load_table(spark, sf_dir, "orders")
    skewed = orders.withColumn(
        "o_custkey",
        F.when(F.pmod(F.hash("o_orderkey"), F.lit(10)) < 3, F.lit(7).cast("bigint"))
        .when(F.pmod(F.hash("o_orderkey"), F.lit(97)) == 0, F.lit(None))
        .otherwise(F.col("o_custkey")),
    )
    customer = load_table(spark, sf_dir, "customer").withColumnRenamed(
        "c_custkey", "o_custkey"
    )
    for how in ("inner", "left"):
        plain = skewed.join(customer, "o_custkey", how).select(
            "o_orderkey", "o_custkey", "c_name"
        )
        with mock.patch.object(
            DataFrame,
            "collect",
            side_effect=AssertionError("lazy detect ran a driver collect"),
        ):
            # detect is deliberately NOT passed: the DEFAULT must be the
            # job-free lazy mode (a naive caller on a 100 TB fact table
            # must not pay an eager full-table count at construction)
            lazy = skew_split_join(
                skewed, customer, "o_custkey", how=how,
                hot_threshold=100,
            ).select("o_orderkey", "o_custkey", "c_name")
        assert plain.count() == lazy.count(), how
        assert plain.subtract(lazy).count() == 0, how
        assert lazy.subtract(plain).count() == 0, how
    # the four in-plan uses of the detection aggregate must collapse via
    # broadcast exchange reuse, not evaluate four times — AQE inserts the
    # reuse at runtime, so execute THIS DataFrame then read its final plan
    lazy.collect()
    executed = lazy._jdf.queryExecution().executedPlan().toString()
    assert "isFinalPlan=true" in executed
    assert "ReusedExchange" in executed


def test_skew_split_join_rejects_outer_modes(spark, sf_dir):
    import pytest

    from reactivestreams_kinesis_spark.catalog import load_table
    from reactivestreams_kinesis_spark.operators.joins import skew_split_join

    orders = load_table(spark, sf_dir, "orders")
    with pytest.raises(ValueError):
        skew_split_join(orders, orders, "o_orderkey", how="full")
    with pytest.raises(ValueError):
        skew_split_join(orders, orders, "o_orderkey", detect="eager")


def test_range_join_binned_equivalence(spark):
    """Binned range join must equal the naive theta join on adversarial
    values: negatives, zero-width intervals, intervals spanning many
    bins, points on bin boundaries, and a deliberately unaligned
    bin_width."""
    from reactivestreams_kinesis_spark.operators.joins import range_join

    intervals = spark.createDataFrame(
        [
            (1, -250.0, -50.0),
            (2, 0.0, 0.0),
            (3, 10.5, 1000.5),
            (4, 99.9, 100.1),
            (5, -1.0, 1.0),
        ],
        "iid int, lo double, hi double",
    )
    points = spark.createDataFrame(
        [
            (i, float(v))
            for i, v in enumerate(
                [-300, -250, -100, -50.0000001, 0, 0.0001, 100, 200, 1000.5, 7]
            )
        ],
        "pid int, v double",
    )
    naive = intervals.join(
        points, points.v.between(intervals.lo, intervals.hi)
    ).select("iid", "pid")
    binned = range_join(intervals, points, "lo", "hi", "v", bin_width=37.0).select(
        "iid", "pid"
    )
    assert sorted(map(tuple, naive.collect())) == sorted(map(tuple, binned.collect()))


def test_range_join_derived_bin_width(spark):
    """A caller omitting bin_width must get the data-derived median
    interval width — on width-200 intervals the auto default picks
    ~200, not a 100×-wrong constant (2.0 would explode every interval
    to ~101 bin rows) — and the auto-mode result must equal the
    explicit-width result exactly (binning is exact at any width, so
    the derivation can only affect performance)."""
    from reactivestreams_kinesis_spark.operators.joins import (
        derive_bin_width,
        range_join,
    )

    intervals = spark.range(200).selectExpr(
        "id AS iid", "CAST(id * 10 AS DOUBLE) AS lo",
        "CAST(id * 10 + 200 AS DOUBLE) AS hi"
    )
    points = spark.range(500).selectExpr("id AS pid", "CAST(id * 5 AS DOUBLE) AS v")
    w = derive_bin_width(intervals, "lo", "hi")
    assert 100.0 <= w <= 400.0, f"derived width {w} far from the 200 median"

    auto = range_join(intervals, points, "lo", "hi", "v").select("iid", "pid")
    explicit = range_join(
        intervals, points, "lo", "hi", "v", bin_width=200.0
    ).select("iid", "pid")
    assert sorted(map(tuple, auto.collect())) == sorted(
        map(tuple, explicit.collect())
    )

    # degenerate inputs: all zero-width / empty -> safe 1.0 fallback
    degen = spark.createDataFrame(
        [(1, 5.0, 5.0), (2, 9.0, 9.0)], "iid int, lo double, hi double"
    )
    assert derive_bin_width(degen, "lo", "hi") == 1.0
    assert derive_bin_width(degen.filter("iid > 99"), "lo", "hi") == 1.0
