"""Round-4 additions: text-format connectors (JSONL/CSV), Bloom-filter
decontamination prefilter, and SemDedup cluster-blocked embedding dedup.
Value parity for all three is carried by the oracle mirror
(test_registry_oracle); these tests pin the properties the oracle cannot
see — prune rates, no-false-negative guarantees, quarantine behavior, and
physical plan shape.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from reactivestreams_kinesis_spark.catalog import load_table
from reactivestreams_kinesis_spark.queries.llm_pipeline import (
    DECONTAM_N,
    _EVAL_PRED,
    _spark_ngrams,
    bloom_build,
    bloom_maybe_contains,
)
from reactivestreams_kinesis_spark.sources.text_formats import (
    documents_as_format,
    read_documents_jsonl,
)


def _grams(df):
    return df.withColumn("toks", F.split("text", " ")).select(
        "doc_id", F.explode(F.expr(_spark_ngrams(DECONTAM_N))).alias("gram")
    )


@pytest.fixture(scope="module")
def bloom_setup(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    eval_grams = _grams(docs.filter(F.expr(_EVAL_PRED)))
    corpus_grams = _grams(docs.filter(~F.expr(_EVAL_PRED)))
    bitmap = bloom_build(eval_grams)
    screened = corpus_grams.withColumn("__bloom", F.lit(bitmap)).filter(
        bloom_maybe_contains("__bloom", "gram")
    )
    return eval_grams, corpus_grams, screened


def test_bloom_no_false_negatives(bloom_setup):
    """Every corpus gram that truly matches an eval gram MUST survive the
    Bloom screen — a false negative would silently leave contamination in
    the training set. Checked exactly: exact-matching grams ⊆ survivors."""
    eval_grams, corpus_grams, screened = bloom_setup
    true_hits = corpus_grams.join(
        eval_grams.select("gram").distinct(), "gram", "left_semi"
    )
    missed = true_hits.join(
        screened.select("doc_id", "gram"), ["doc_id", "gram"], "left_anti"
    ).count()
    assert missed == 0


def test_bloom_prunes_map_side(bloom_setup):
    """The point of the prefilter: ~all non-matching grams die in the map.
    Survivors = true matches + Bloom false positives; with a 16 KiB bitmap
    over the fixture's eval set the FP count must stay near zero, so the
    survivor set collapses to roughly the true-hit set — orders of
    magnitude below the full gram stream."""
    eval_grams, corpus_grams, screened = bloom_setup
    total = corpus_grams.count()
    survivors = screened.count()
    true_hits = corpus_grams.join(
        eval_grams.select("gram").distinct(), "gram", "left_semi"
    ).count()
    false_pos = survivors - true_hits
    assert false_pos >= 0  # no-false-negative sanity from the other side
    # FP budget: k=5, m=2^17 over ≤ a few hundred eval grams → expected FP
    # ~1e-9 per probe; allow a handful for fixture drift, not a fraction
    assert false_pos <= max(5, total // 1000)
    if eval_grams.take(1):  # eval split non-empty at this SF
        assert survivors < total


def test_bloom_screen_is_pre_shuffle(bloom_setup, spark):
    """Plan pin: the Bloom probe must sit in a Filter BEFORE any Exchange
    on the corpus branch — the screen's value is killing grams map-side.
    The physical plan's first Exchange must therefore come after the
    filter containing the xxhash64 probes."""
    _, _, screened = bloom_setup
    plan = screened._jdf.queryExecution().executedPlan().toString()
    assert "xxhash64" in plan
    assert "Exchange" not in plan  # narrow pipeline: scan → explode → filter


def test_jsonl_corrupt_record_quarantine(spark, tmp_path):
    """A malformed line becomes a quarantined row (raw text preserved in
    the corrupt column), never a dropped record or a failed job."""
    p = tmp_path / "docs.jsonl"
    p.write_text(
        '{"doc_id": 1, "text": "a b", "lang": "en", "source": "s", "n_chars": 3}\n'
        "{this is not json}\n"
        '{"doc_id": 2, "text": "c d", "lang": "de", "source": "s", "n_chars": 3}\n'
    )
    df = read_documents_jsonl(spark, str(p), corrupt_col="_corrupt").cache()
    try:
        assert df.count() == 3  # nothing silently dropped
        bad = df.filter(F.col("_corrupt").isNotNull())
        assert bad.count() == 1
        assert bad.first()["_corrupt"] == "{this is not json}"
        good = df.filter(F.col("_corrupt").isNull())
        assert sorted(r["doc_id"] for r in good.collect()) == [1, 2]
    finally:
        df.unpersist()


def test_format_conversion_sharded(spark, sf_dir):
    """The fixture dumps must be sharded multi-file directories (parallel
    readable — a single blob would serialize the 100 TB scan)."""
    out = documents_as_format(spark, sf_dir, "jsonl")
    parts = [f for f in os.listdir(out) if f.startswith("part-")]
    assert len(parts) >= 1
    assert os.path.exists(os.path.join(out, "_SUCCESS"))


def test_semdedup_pair_stage_is_equi_join(spark, sf_dir):
    """Plan pin for sim_semdedup: the intra-cluster pair stage must be an
    equi-join on centroid_id (hash/merge join), never a cartesian product
    — the whole point of deriving the blocking key."""
    from reactivestreams_kinesis_spark.queries.registry import all_queries

    df = all_queries()["sim_semdedup"].fn(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    # the only allowed nested-loop join is the broadcast codebook cross
    # join feeding assignment; the pair stage itself keys on centroid_id
    assert "centroid_id" in plan


def test_semdedup_drop_list_semantics(spark, sf_dir):
    """Every dropped vector reports ≥1 lower-id dup, and the keep-set
    (anti-join) plus drop-set partitions the corpus."""
    from reactivestreams_kinesis_spark.queries.registry import all_queries

    emb = load_table(spark, sf_dir, "embeddings")
    dropped = all_queries()["sim_semdedup"].fn(spark, sf_dir).cache()
    try:
        assert dropped.filter(F.col("n_dups") < 1).count() == 0
        n_total = emb.count()
        n_dropped = dropped.count()
        n_kept = emb.join(dropped, emb.vec_id == dropped.vec_id, "left_anti").count()
        assert n_kept + n_dropped == n_total
    finally:
        dropped.unpersist()


def test_bloom_param_validation():
    """Both Bloom entry points reject an m_bits that is not a positive
    multiple of 64 (positions could exceed the packed word array: build
    IndexError / probe false negative) and k < 1 (everything 'matches')."""
    import pandas as pd  # noqa: F401 — ensures pandas present for DataFrame-less path

    from reactivestreams_kinesis_spark.queries.llm_pipeline import (
        _validate_bloom_params,
    )

    for bad_m in (1000, 0, -64, 63):
        with pytest.raises(ValueError):
            _validate_bloom_params(bad_m, 5)
    with pytest.raises(ValueError):
        _validate_bloom_params(128, 0)
    with pytest.raises(ValueError):
        bloom_maybe_contains("b", "g", m_bits=1000)
    _validate_bloom_params(128, 1)  # ok


def test_conversion_cache_invalidated_by_fixture_change(spark, tmp_path):
    """The cross-process conversion cache must key on fixture CONTENT, not
    just path: regenerate documents.parquet at the same path and the cache
    dir must change (stale dumps are never reused)."""
    from reactivestreams_kinesis_spark.sources.text_formats import _conversion_dir

    sf = str(tmp_path / "sf")
    os.makedirs(sf)
    spark.range(3).selectExpr(
        "id AS doc_id", "'a' AS text", "'en' AS lang", "'s' AS source",
        "1 AS n_chars"
    ).write.parquet(os.path.join(sf, "documents.parquet"))
    first = _conversion_dir(sf, "jsonl")
    # regenerate the fixture in place (new content, same path)
    spark.range(5).selectExpr(
        "id AS doc_id", "'b' AS text", "'en' AS lang", "'s' AS source",
        "1 AS n_chars"
    ).write.mode("overwrite").parquet(os.path.join(sf, "documents.parquet"))
    second = _conversion_dir(sf, "jsonl")
    assert first != second
