"""Property-based tests (hypothesis) for the composed operators — the
randomized testing layer the reference lacks entirely (SURVEY §5.3).

Each property pits a distributed composition against a brute-force
in-Python reference on small random inputs: the as-of join against a
per-row linear scan, and the salted join against the plain join. Example
counts are kept small because every example is a real Spark job.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from reactivestreams_kinesis_spark.operators.joins import asof_join, salted_join

_SETTINGS = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)

keys = st.integers(min_value=0, max_value=3)
times = st.integers(min_value=0, max_value=50)


@given(
    lefts=st.lists(st.tuples(keys, times), min_size=1, max_size=15),
    rights=st.lists(st.tuples(keys, times), min_size=0, max_size=15),
)
@_SETTINGS
def test_asof_join_matches_bruteforce(spark, lefts, rights):
    """For every left row, asof_join must attach the max right_ts <= left_ts
    within the key — exactly what a per-row linear scan computes."""
    # de-dup right (key, ts) — the operator's documented precondition
    rights = sorted(set(rights))
    left_df = spark.createDataFrame(
        [(k, t, i) for i, (k, t) in enumerate(lefts)], "k int, lt int, lid int"
    )
    right_df = spark.createDataFrame(rights or [(99, -1)], "k int, rt int")
    if not rights:
        right_df = right_df.filter(F.lit(False))

    got = {
        (r.lid, r.rt)
        for r in asof_join(
            left_df, right_df, on="k", left_ts="lt", right_ts="rt", payload=["rt"]
        ).collect()
    }
    expected = set()
    for lid, (k, lt) in enumerate(lefts):
        candidates = [rt for (rk, rt) in rights if rk == k and rt <= lt]
        expected.add((lid, max(candidates) if candidates else None))
    assert got == expected


@given(
    lefts=st.lists(st.tuples(keys, st.integers(0, 100)), min_size=0, max_size=20),
    rights=st.lists(st.tuples(keys, st.integers(0, 100)), min_size=0, max_size=10),
    n_salts=st.integers(min_value=1, max_value=5),
)
@_SETTINGS
def test_salted_join_matches_plain_join(spark, lefts, rights, n_salts):
    """Salting is a pure physical rewrite: multiset-identical rows to the
    plain inner join for any input and any salt count."""
    left_df = spark.createDataFrame(
        [(k, v) for k, v in lefts] or [(0, 0)], "k int, lv int"
    )
    right_df = spark.createDataFrame(
        [(k, v) for k, v in rights] or [(0, 0)], "k int, rv int"
    )
    if not lefts:
        left_df = left_df.filter(F.lit(False))
    if not rights:
        right_df = right_df.filter(F.lit(False))

    plain = sorted(
        (r.k, r.lv, r.rv)
        for r in left_df.join(right_df, "k").collect()
    )
    salted = sorted(
        (r.k, r.lv, r.rv)
        for r in salted_join(left_df, right_df, "k", n_salts=n_salts).collect()
    )
    assert plain == salted


@given(
    docs=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=40),   # doc id
            st.integers(min_value=0, max_value=30),   # token count
        ),
        min_size=1,
        max_size=25,
        unique_by=lambda t: t[0],
    ),
    ctx=st.integers(min_value=1, max_value=20),
    shard_size=st.integers(min_value=1, max_value=16),
)
@_SETTINGS
def test_pack_assignments_matches_bruteforce(spark, docs, ctx, shard_size):
    """Packing must equal the sequential reference algorithm: within each
    id-range shard, walk docs in id order accumulating token counts; a
    doc's pack index is floor(prior_tokens / ctx). Every doc is assigned
    exactly once and pack ids are the shard-offset form."""
    from reactivestreams_kinesis_spark import pack_assignments

    packs_per_shard = 10_000  # large enough to never collide in-range
    df = spark.createDataFrame(docs, "doc_id long, n_tokens long")
    got = {
        r.doc_id: r.pack_id
        for r in pack_assignments(
            df,
            ctx=ctx,
            shard_size=shard_size,
            packs_per_shard=packs_per_shard,
        ).collect()
    }
    expected = {}
    by_shard: dict[int, list[tuple[int, int]]] = {}
    for did, nt in docs:
        by_shard.setdefault(did // shard_size, []).append((did, nt))
    for shard, members in by_shard.items():
        prior = 0
        for did, nt in sorted(members):
            expected[did] = shard * packs_per_shard + prior // ctx
            prior += nt
    assert got == expected


def test_pack_assignments_overflow_guard(spark):
    """Pack ids are only unique while every within-shard index stays below
    packs_per_shard; the id arithmetic must refuse to overflow into the
    next shard's id space (silent collision) — in-plan, at the boundary."""
    import pytest

    from reactivestreams_kinesis_spark import pack_assignments

    # ctx=2, packs_per_shard=2 → a shard saturates at 4 prior tokens;
    # doc 2 sees prior=4 → index 2 == packs_per_shard → must raise
    docs = spark.createDataFrame(
        [(0, 2), (1, 2), (2, 2)], "doc_id long, n_tokens long"
    )
    with pytest.raises(Exception, match="packs_per_shard"):
        pack_assignments(docs, ctx=2, shard_size=10, packs_per_shard=2).collect()

    # one doc fewer: max index 1 < packs_per_shard — exactly at the legal
    # boundary, must pass and keep the shard-offset id form
    ok = {
        r.doc_id: r.pack_id
        for r in pack_assignments(
            docs.filter("doc_id < 2"), ctx=2, shard_size=10, packs_per_shard=2
        ).collect()
    }
    assert ok == {0: 0, 1: 1}


_comp = st.integers(min_value=0, max_value=3)  # small ints: exact in float32/64


@given(
    corpus=st.lists(
        st.lists(_comp, min_size=3, max_size=3), min_size=1, max_size=12
    ),
    queries=st.lists(
        st.lists(_comp, min_size=3, max_size=3), min_size=1, max_size=3
    ),
    k=st.integers(min_value=1, max_value=4),
)
@_SETTINGS
def test_cosine_topk_matches_bruteforce(spark, corpus, queries, k):
    """Brute-force cosine top-k must equal the per-query argsort by
    (rounded cosine desc, neighbor_id asc). Integer-valued components keep
    dot/norm arithmetic exact in both engines; rounding replicates Spark's
    HALF_UP-on-shortest-decimal ROUND so ties are compared at the same
    6-dp grid the operator ranks on."""
    import math
    from decimal import ROUND_HALF_UP, Decimal

    from reactivestreams_kinesis_spark import cosine_topk

    corpus = [v + [1] for v in corpus]  # trailing 1 ⇒ never a zero vector
    queries = [v + [1] for v in queries]
    cdf = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(corpus)],
        "neighbor_id long, cv array<float>",
    )
    qdf = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(queries)],
        "query_id long, qv array<float>",
    )
    got = sorted(
        (r.query_id, r.neighbor_id, r.cosine)
        for r in cosine_topk(qdf, cdf, k=k).collect()
    )

    def rnd6(x: float) -> float:
        return float(Decimal(repr(x)).quantize(Decimal("0.000001"), ROUND_HALF_UP))

    expected = []
    for qi, qv in enumerate(queries):
        qn = math.sqrt(sum(x * x for x in qv))
        scored = []
        for ci, cv in enumerate(corpus):
            dot = float(sum(x * y for x, y in zip(qv, cv)))
            cn = math.sqrt(sum(x * x for x in cv))
            scored.append((ci, rnd6(dot / (qn * cn))))
        scored.sort(key=lambda t: (-t[1], t[0]))
        expected += [(qi, ci, cos) for ci, cos in scored[:k]]
    assert got == sorted(expected)


_word = st.sampled_from(["a", "b", "c", "d"])  # tiny vocab → real shingle overlaps


@given(
    texts=st.lists(
        st.lists(_word, min_size=0, max_size=8).map(" ".join),
        min_size=1,
        max_size=10,
    ),
    threshold=st.sampled_from([0.3, 0.5, 0.8]),
)
@_SETTINGS
def test_jaccard_pairs_matches_bruteforce(spark, texts, threshold):
    """The inverted-index Jaccard must equal the set-arithmetic definition:
    for every doc pair, |shingles(A) ∩ shingles(B)| / |A ∪ B| >= threshold —
    including <3-token docs (empty shingle set, never paired) and duplicate
    texts (Jaccard exactly 1.0)."""
    from reactivestreams_kinesis_spark.queries.llm_dedup import (
        jaccard_pairs,
        shingle_postings,
    )

    docs = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    got = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in jaccard_pairs(
            shingle_postings(docs), jaccard_threshold=threshold
        ).collect()
    }

    def shingles(t: str) -> set[str]:
        toks = t.split(" ")
        return {
            " ".join(toks[i : i + 3]) for i in range(len(toks) - 2)
        } if len(toks) >= 3 else set()

    expected = {}
    sets = [shingles(t) for t in texts]
    for a in range(len(texts)):
        for b in range(a + 1, len(texts)):
            inter = len(sets[a] & sets[b])
            if inter == 0:
                continue
            jac = inter / len(sets[a] | sets[b])
            if jac >= threshold:
                expected[(a, b)] = round(jac, 6)
    # engine rounds to 6dp after the filter; compare at the same precision
    assert {k: round(v, 6) for k, v in got.items()} == expected


_gram = st.integers(min_value=0, max_value=8)  # tiny gram universe → real overlaps


@given(
    corpus=st.lists(
        st.tuples(st.integers(0, 10), _gram), min_size=0, max_size=30
    ),
    eval_grams=st.lists(_gram, min_size=0, max_size=6),
    min_shared=st.integers(min_value=1, max_value=3),
)
@_SETTINGS
def test_decontaminate_matches_bruteforce(spark, corpus, eval_grams, min_shared):
    """Contamination report must equal the set-arithmetic reference: doc is
    contaminated iff |distinct(doc grams) ∩ eval grams| >= min_shared —
    duplicate postings and duplicate eval grams must not inflate counts."""
    from reactivestreams_kinesis_spark import decontaminate

    corpus_df = spark.createDataFrame(
        [(d, f"g{g}") for d, g in corpus] or [(0, "g0")], "doc_id long, gram string"
    )
    eval_df = spark.createDataFrame(
        [(f"g{g}",) for g in eval_grams] or [("g0",)], "gram string"
    )
    if not corpus:
        corpus_df = corpus_df.filter(F.lit(False))
    if not eval_grams:
        eval_df = eval_df.filter(F.lit(False))

    got = {
        r.doc_id: r.n_shared
        for r in decontaminate(corpus_df, eval_df, min_shared=min_shared).collect()
    }
    eval_set = {f"g{g}" for g in eval_grams}
    by_doc: dict[int, set[str]] = {}
    for d, g in corpus:
        by_doc.setdefault(d, set()).add(f"g{g}")
    expected = {
        d: len(grams & eval_set)
        for d, grams in by_doc.items()
        if len(grams & eval_set) >= min_shared
    }
    assert got == expected


@given(
    edges=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=12),
            st.integers(min_value=0, max_value=12),
        ),
        min_size=1,
        max_size=20,
    )
)
@_SETTINGS
def test_connected_components_matches_union_find(spark, edges):
    """Label propagation must reach the same partition of nodes as a
    driver-side union-find on any random edge list (self-loops and
    duplicate edges included)."""
    from reactivestreams_kinesis_spark import connected_components

    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        parent[find(a)] = find(b)
    expected = {n: min(m for m in parent if find(m) == find(n)) for n in parent}

    df = spark.createDataFrame(edges, "a long, b long")
    got = {
        r.doc_id: r.component_id
        for r in connected_components(df, src_col="a", dst_col="b").collect()
    }
    assert got == expected


def test_connected_components_fixed_rounds(spark, monkeypatch):
    """Fixed-rounds mode must reach the adaptive fixpoint with exactly ONE
    driver-blocking count() per call (the final convergence check on the
    checkpointed result) instead of one per round — the scale contract for
    LSH-band graphs where the caller knows a diameter bound — and must
    raise rather than return a non-fixpoint when the budget is short."""
    import pytest

    from reactivestreams_kinesis_spark import connected_components

    # 0-1-2-3-4-5-6 chain: min-label needs 6 rounds to reach node 6 plus
    # one quiet round as the fixpoint proof (rounds >= diameter + 1);
    # plus a disjoint pair to prove multi-component labeling
    edges = [(i, i + 1) for i in range(6)] + [(10, 11)]
    df = spark.createDataFrame(edges, "a long, b long")
    expected = {
        r.doc_id: r.component_id
        for r in connected_components(df, src_col="a", dst_col="b").collect()
    }

    # patch the CONCRETE class (pyspark.sql.DataFrame is an abstract base
    # in Spark 4; the classic subclass overrides count, so patching the
    # base would never intercept)
    cls = type(df)
    counts = {"n": 0}
    orig_count = cls.count

    def counting(self):
        counts["n"] += 1
        return orig_count(self)

    monkeypatch.setattr(cls, "count", counting)
    fixed = connected_components(df, src_col="a", dst_col="b", rounds=7)
    assert counts["n"] == 1, f"fixed mode ran {counts['n']} blocking counts"
    monkeypatch.undo()

    got = {r.doc_id: r.component_id for r in fixed.collect()}
    assert got == expected

    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(df, src_col="a", dst_col="b", rounds=2)


_gram2 = st.integers(0, 40)


@given(
    corpus=st.lists(st.tuples(st.integers(0, 8), _gram2), min_size=0, max_size=40),
    eval_grams=st.lists(_gram2, min_size=0, max_size=8),
)
@_SETTINGS
def test_bloom_screen_preserves_decontamination(spark, corpus, eval_grams):
    """Bloom prefilter correctness, property form: with a DELIBERATELY
    tiny bitmap (m=1024, k=3 — real false positives), (1) no eval-set
    gram is ever screened out (no false negatives, the safety property),
    and (2) decontaminate over the screened candidates equals
    decontaminate over the full posting set — false positives cost work,
    never correctness."""
    from reactivestreams_kinesis_spark import (
        bloom_build,
        bloom_maybe_contains,
        decontaminate,
    )

    corpus_df = spark.createDataFrame(
        [(d, f"g{g}") for d, g in corpus] or [(0, "g0")], "doc_id long, gram string"
    )
    eval_df = spark.createDataFrame(
        [(f"g{g}",) for g in eval_grams] or [("g0",)], "gram string"
    )
    if not corpus:
        corpus_df = corpus_df.filter(F.lit(False))
    if not eval_grams:
        eval_df = eval_df.filter(F.lit(False))

    bitmap = bloom_build(eval_df, m_bits=1024, k=3)
    screened = corpus_df.withColumn("__bloom", F.lit(bitmap)).filter(
        bloom_maybe_contains("__bloom", "gram", m_bits=1024, k=3)
    ).drop("__bloom")

    eval_set = {f"g{g}" for g in eval_grams}
    survivors = {(r.doc_id, r.gram) for r in screened.collect()}
    for d, g in corpus:
        if f"g{g}" in eval_set:
            assert (d, f"g{g}") in survivors  # no false negatives

    full = {
        (r.doc_id, r.n_shared)
        for r in decontaminate(corpus_df, eval_df).collect()
    }
    via_bloom = {
        (r.doc_id, r.n_shared)
        for r in decontaminate(screened, eval_df).collect()
    }
    assert via_bloom == full


@given(
    toks=st.lists(
        st.text(
            alphabet=st.characters(min_codepoint=33, max_codepoint=0x2FFF),
            min_size=1,
            max_size=6,
        ),
        min_size=1,
        max_size=40,
    )
)
@_SETTINGS
def test_cms_never_undercounts(spark, toks):
    """The count-min invariant on arbitrary (incl. multi-byte) token
    streams: every reported estimate dominates the true count, and the
    exact counts in the report match a Python Counter."""
    from collections import Counter

    from reactivestreams_kinesis_spark.queries.llm_text import (
        cms_counters,
        cms_report,
    )

    toks_df = spark.createDataFrame([(t,) for t in toks], "tok string")
    report = cms_report(toks_df, cms_counters(toks_df)).collect()
    truth = Counter(toks)
    assert report  # at least one token -> non-empty top-k
    for r in report:
        assert r.exact_cnt == truth[r.tok]
        assert r.cms_est >= r.exact_cnt


@given(
    edges=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=12),
            st.integers(min_value=0, max_value=12),
        ),
        min_size=1,
        max_size=20,
    )
)
@_SETTINGS
def test_star_contraction_matches_union_find(spark, edges):
    """Star contraction must reach the same partition as driver-side
    union-find on any random edge list (self-loops and duplicates
    included) — the same property the propagation mode is held to."""
    from reactivestreams_kinesis_spark.queries.llm_dedup import (
        connected_components_star,
    )

    if all(a == b for a, b in edges):
        edges = edges + [(0, 1)]  # star CC needs at least one real edge

    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        parent[find(a)] = find(b)
    expected = {
        n: min(m for m in parent if find(m) == find(n))
        for n in parent
        # pure self-loop nodes never reach the pair graph input contract
        if any(a != b and n in (a, b) for a, b in edges)
    }

    df = spark.createDataFrame(edges, "a long, b long")
    got = {
        r.doc_id: r.component_id
        for r in connected_components_star(df, src_col="a", dst_col="b").collect()
    }
    assert got == expected


def test_star_contraction_chain_round_bound(spark):
    """Round-4 verdict #4: a planted 64-deep dup chain is the diameter
    pathology — min-label propagation needs ~64 rounds (or trips the
    fixed-budget fallback late), star contraction must finish in
    <= 2*log2(n) rounds. Also plants a disjoint pair and a star to prove
    multi-component labeling in the same run."""
    import math

    from reactivestreams_kinesis_spark.queries.llm_dedup import (
        connected_components_star,
    )

    n = 64
    edges = (
        [(i, i + 1) for i in range(n - 1)]
        + [(1000, 1001)]
        + [(2000, 2000 + i) for i in range(1, 5)]
    )
    df = spark.createDataFrame(edges, "a long, b long")
    stats: dict = {}
    labels = {
        r.doc_id: r.component_id
        for r in connected_components_star(
            df, src_col="a", dst_col="b", stats=stats
        ).collect()
    }
    assert all(labels[i] == 0 for i in range(n))
    assert labels[1000] == labels[1001] == 1000
    assert all(labels[2000 + i] == 2000 for i in range(5))
    bound = 2 * int(math.log2(n))
    assert stats["rounds"] <= bound, (
        f"star contraction used {stats['rounds']} rounds on a {n}-chain "
        f"(bound {bound})"
    )


@given(
    ops=st.lists(
        st.one_of(
            st.tuples(st.just("append"), st.integers(1, 3), st.none()),
            st.tuples(st.just("overwrite"), st.integers(1, 3), st.none()),
            st.tuples(st.just("append"), st.integers(1, 3), st.text("ab", min_size=1, max_size=2)),
        ),
        min_size=1,
        max_size=12,
    )
)
@settings(max_examples=60, deadline=None)
def test_manifest_protocol_matches_model(tmp_path_factory, ops):
    """The snapshot commit protocol (publish_manifest) against a pure
    Python model over random op sequences: version monotonicity, file-set
    lineage (append extends parent, overwrite replaces), and txn
    idempotence (a repeated txn id returns the original version and never
    re-publishes). Filesystem-only — no Spark involved, so this drills
    the protocol itself, fast."""
    import os

    from reactivestreams_kinesis_spark.operators.snapshots import (
        _read_manifest,
        latest_version,
        publish_manifest,
    )

    table = str(tmp_path_factory.mktemp("snap_model"))
    model: list[list[str]] = []  # model[v] = expected file set of version v
    txn_seen: dict[str, int] = {}
    counter = 0
    for op, n_files, txn in ops:
        new = []
        for _ in range(n_files):
            rel = f"data-m/f{counter}.parquet"
            counter += 1
            os.makedirs(os.path.join(table, "data-m"), exist_ok=True)
            open(os.path.join(table, rel), "w").close()
            new.append(rel)
        v = publish_manifest(table, new, mode=op, txn_id=txn)
        if txn is not None and txn in txn_seen:
            # idempotent replay: original version, no new manifest
            assert v == txn_seen[txn]
            assert latest_version(table) == len(model) - 1
            continue
        if txn is not None:
            txn_seen[txn] = v
        expected = (model[-1] if (op == "append" and model) else []) + new
        model.append(expected)
        assert v == len(model) - 1
        assert latest_version(table) == v
    for v, expected in enumerate(model):
        assert _read_manifest(table, v)["files"] == expected


@given(
    present=st.lists(
        st.one_of(st.integers(-10**12, 10**12), st.text(min_size=0, max_size=30)),
        min_size=0, max_size=300,
    ),
    absent=st.lists(st.integers(2 * 10**12, 3 * 10**12), min_size=0, max_size=50),
)
@settings(max_examples=60, deadline=None)
def test_manifest_bloom_no_false_negatives(present, absent):
    """The manifest bloom's soundness contract: every inserted value MUST
    test maybe-present (a false negative would silently drop rows from a
    pruned scan); disjoint absent keys mostly test absent (fpp sanity —
    pruning power, not correctness)."""
    from reactivestreams_kinesis_spark.operators.snapshots import (
        _BLOOM_K,
        _bloom_hashes,
        _bloom_key,
        _bloom_maybe_contains,
    )
    import base64

    m = 8192
    while m < 8 * max(1, len(set(present))):
        m *= 2
    bits = bytearray(m // 8)
    for v in present:
        key = _bloom_key(v)
        assert key is not None  # ints and strs are always canonical
        for idx in _bloom_hashes(key, m):
            bits[idx // 8] |= 1 << (idx % 8)
    bloom = {"m": m, "b64": base64.b64encode(bytes(bits)).decode("ascii")}
    for v in present:
        assert _bloom_maybe_contains(bloom, v), v  # soundness: never FN
    distinct_absent = [a for a in set(absent) if a not in set(present)]
    if len(distinct_absent) >= 20:
        fp = sum(_bloom_maybe_contains(bloom, a) for a in distinct_absent)
        assert fp / len(distinct_absent) < 0.5  # loose fpp sanity bound
    assert _BLOOM_K == 5  # pinned: stored blooms embed this geometry
