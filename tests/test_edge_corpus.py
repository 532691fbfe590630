"""Adversarial-fixture hardening (round-4): the shipped corpus is seed-42
synthetic and too well-behaved — the ``size(toks) < 3`` class of bug in the
shingle path was only caught by accident of fixture precision. This file
makes that systematic: a hand-built pathological ``documents`` table (empty
string, sub-shingle-width docs, 10k-repeat token, one giant unbroken token,
multi-byte unicode, whitespace runs, punctuation-only, exotic-whitespace-only,
exact- and near-dup pairs) run through EVERY documents-table operator's
oracle with the same bit-exact compare the driver uses. A divergence on any
of these is a real operator bug, not fixture noise.
"""

from __future__ import annotations

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from reactivestreams_kinesis_spark.queries.registry import all_queries
from tests.conftest import assert_matches_oracle

# (doc_id, text, lang, source)
EDGE_DOCS = [
    (0, "", "en", "web"),                            # empty string
    (1, "hello", "en", "web"),                       # single token
    (2, "two tokens", "en", "web"),                  # below shingle width
    (3, "exactly three tokens", "en", "books"),      # at the shingle boundary
    (4, ("tok " * 10000).strip(), "en", "web"),      # one token repeated 10k times
    (5, "x" * 50000, "en", "web"),                   # giant unbroken token
    (6, "наïve 文档 🚀 ünïcode テスト résumé façade", "zh", "web"),  # multi-byte
    (7, "  leading\t\ttabs\n\nand   runs  of   whitespace  ", "en", "books"),
    (8, "!!! ??? ... ;;; --- ***", "en", "web"),     # punctuation only
    (9, "the quick brown fox jumps over the lazy dog again and again today",
     "en", "web"),
    (10, "the quick brown fox jumps over the lazy dog again and again today",
     "en", "web"),                                   # exact dup of 9
    (11, "the quick brown fox jumps over the lazy dog again and again zoology",
     "en", "books"),                                 # near dup of 9
    (12, "  　", "en", "web"),         # exotic whitespace only
]

# every registered query whose only input table is `documents` — kept as an
# explicit list so a new documents operator must be added here (or the
# audit test below fails), not silently skipped
EDGE_QUERY_NAMES = (
    "text_stats",
    "text_tfidf_topk",
    "text_simhash",
    "text_fingerprint",
    "text_token_regex",
    "text_vocab_topk",
    "text_redact_pii",
    "text_heavy_hitters_cms",
    "stream_heavy_hitters_cms",
    "stream_dedup_corpus",
    "text_repetition",
    "dedup_exact",
    "dedup_jaccard_pairs",
    "dedup_minhash_lsh",
    "dedup_components",
    "dedup_components_lsh",
    "dedup_incremental_lsh",
    "text_chunk_overlap",
    "pipeline_chunk_dedup",
    "sample_hash",
    "sample_weighted",
    "split_train_val_test",
    "mix_corpora",
    "pack_sequences",
    "pipeline_end_to_end",
    "decontaminate_ngram",
    "decontaminate_bloom",
    "src_format_roundtrip",
    "multimodal_plumbing",
    "multimodal_features",
    "udf_pandas_scalar",
    "udf_row_scalar",
    "udf_python_udtf",
    "fn_posexplode",
)


def _edge_embeddings():
    """Adversarial embedding rows (dim 64, float32): zero vectors on BOTH
    the query side (vec_id 0) and the corpus side (vec_id 10) — cosine
    0/0 → NaN, exercising cross-engine NaN ranking; exact duplicates;
    antipodal pairs (cosine exactly −1); uniform 1e30 / 1e-30 magnitudes
    (squares only finite because both engines cast elements to DOUBLE
    before multiplying); and seeded random vectors as filler."""
    import numpy as np

    rng = np.random.RandomState(7)
    dim = 64
    e0 = np.zeros(dim); e0[0] = 1.0
    rows: list[tuple[int, list[float], int]] = []

    def add(vid, vec, label):
        rows.append((vid, [float(x) for x in np.asarray(vec, dtype=np.float32)], label))

    add(0, np.zeros(dim), 0)            # zero-vector QUERY
    add(1, e0, 1)
    add(2, np.full(dim, 1e30), 2)       # huge magnitude
    add(3, np.full(dim, 1e-30), 3)      # tiny magnitude
    add(4, rng.randn(dim), 4)
    add(5, e0, 1)                       # exact dup of query 1
    add(6, -e0, 1)                      # antipodal: cosine exactly -1
    add(7, np.full(dim, 1e30), 2)       # dup of the huge query
    add(8, rng.randn(dim), 3)
    add(9, rng.randn(dim), 4)
    add(10, np.zeros(dim), 5)           # zero-vector CORPUS row
    for vid in range(11, 45):
        add(vid, rng.randn(dim), vid % 10)
    return rows


@pytest.fixture(scope="module")
def edge_dir(tmp_path_factory):
    out = tmp_path_factory.mktemp("edge_sf")
    tbl = pa.table(
        {
            "doc_id": pa.array([r[0] for r in EDGE_DOCS], pa.int64()),
            "text": pa.array([r[1] for r in EDGE_DOCS], pa.string()),
            "lang": pa.array([r[2] for r in EDGE_DOCS], pa.string()),
            "source": pa.array([r[3] for r in EDGE_DOCS], pa.string()),
            "n_chars": pa.array([len(r[1]) for r in EDGE_DOCS], pa.int64()),
        }
    )
    pq.write_table(tbl, str(out / "documents.parquet"))
    emb = _edge_embeddings()
    etbl = pa.table(
        {
            "vec_id": pa.array([r[0] for r in emb], pa.int64()),
            "embedding": pa.array([r[1] for r in emb], pa.list_(pa.float32())),
            "label": pa.array([r[2] for r in emb], pa.int32()),
        }
    )
    pq.write_table(etbl, str(out / "embeddings.parquet"))
    return str(out)


@pytest.fixture(scope="module")
def edge_oracle(edge_dir):
    con = duckdb.connect()
    for t in ("documents", "embeddings"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{edge_dir}/{t}.parquet')"
        )
    yield con
    con.close()


@pytest.mark.parametrize("name", EDGE_QUERY_NAMES)
def test_edge_corpus_matches_oracle(name, spark, edge_dir, edge_oracle):
    q = all_queries()[name]
    df = q.fn(spark, edge_dir)
    if q.oracle is None:
        assert df.count() >= 0
    else:
        assert_matches_oracle(df, edge_oracle, q.oracle)


# embeddings-table operators against the adversarial vectors; enrich also
# reads the edge documents (doc_id ↔ vec_id overlap by construction)
EDGE_EMBED_QUERY_NAMES = (
    "sim_cosine_topk",
    "sim_ann_lsh",
    "sim_ann_ivf",
    "sim_neardup_blocked",
    "sim_semdedup",
    "sim_quantize_int8",
    "sim_ann_ivf_int8",
    "sim_ann_ivf_persisted",
    "sim_embed_enrich",
)


@pytest.mark.parametrize("name", EDGE_EMBED_QUERY_NAMES)
def test_edge_embeddings_match_oracle(name, spark, edge_dir, edge_oracle):
    q = all_queries()[name]
    df = q.fn(spark, edge_dir)
    if q.oracle is None:
        assert df.count() >= 0
    else:
        assert_matches_oracle(df, edge_oracle, q.oracle)


def test_edge_list_covers_all_documents_queries():
    """Audit: any registered query that reads ONLY the documents table must
    be in EDGE_QUERY_NAMES — new documents operators can't silently skip
    the adversarial corpus. Detection is source-level: the query module's
    load_table calls."""
    import inspect
    import re

    queries = all_queries()
    missing = []
    for name, q in queries.items():
        try:
            src = inspect.getsource(inspect.getmodule(q.fn))
        except (OSError, TypeError):
            continue
        fn_src = inspect.getsource(q.fn)
        tables = set(re.findall(r'load_table\(\s*\w+,\s*\w+,\s*"(\w+)"', fn_src))
        # queries built via helpers: fall back to oracle table references
        if not tables and q.oracle:
            tables = {
                t
                for t in ("documents", "embeddings", "lineitem", "orders",
                          "customer", "supplier", "part", "nation", "region",
                          "events")
                if re.search(rf"\b{t}\b", q.oracle)
            }
        if tables == {"documents"} and name not in EDGE_QUERY_NAMES:
            missing.append(name)
        del src
    assert not missing, f"documents-only queries missing from edge corpus: {missing}"
