"""Deduplication operators (SURVEY.md §2.10 X2, X3) — exact, n-gram
Jaccard, MinHash+LSH.

All [MANDATE]. Design stance per SURVEY §7: deterministic seeded hashing
only (md5 — identical hex in Spark and DuckDB; engine-native ``hash()`` is
murmur-based and engine-specific, so it never appears in an oracle-checked
path).

Shingling is word-TRIGRAM, not unigram: the fixture corpus (and any real
one) has a heavy-tailed vocabulary, so unigram token sets make almost
everything similar — measured on this corpus, unigram LSH bands put 71% of
all doc pairs in shared buckets (8.8M candidates at sf0.1), while trigram
shingles isolate the actually-planted near-duplicates (256 pairs at
Jaccard ≥ 0.5). Trigram MinHash is also what production web-dedup pipelines
(Gopher/RefinedWeb-style) use.

Scale shapes:
- exact dedup: one hash-agg, scales with the scan;
- Jaccard pairs: inverted index on shingles — postings are short because
  trigrams are near-unique, so the self-join output ≈ true near-dup pairs;
- MinHash+LSH: signatures are one explode + one agg; the band join yields
  only bucket collisions, then exact Jaccard verification runs on that
  small candidate set.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from reactivestreams_kinesis_spark.catalog import load_table
from reactivestreams_kinesis_spark.queries.registry import register
from reactivestreams_kinesis_spark.session import persist_once

N_HASHES = 8
BAND_SIZE = 2
N_BANDS = N_HASHES // BAND_SIZE
JACCARD_THRESHOLD = 0.5
# Hot-shingle postings cap: a shingle shared by more than this many documents
# carries no near-dup signal (boilerplate, headers) but contributes
# O(df²) pairs to the inverted-index self-join — the one skew that can
# dominate the shuffle at 100 TB. Shingles above the cap are dropped from the
# postings BEFORE the self-join, on both engines, so Jaccard is computed over
# the capped shingle space identically. 100 ≫ any real near-dup cluster size
# in the fixtures, so results are unchanged there; at scale it bounds the
# worst posting to MAX_SHINGLE_DF² pairs.
MAX_SHINGLE_DF = 100

# Word-trigram shingle set, engine-portable (element_at/list_extract are both
# 1-based; Spark sequence(1, n-2) and DuckDB range(1, n-1) both yield 1..n-2).
# Spark side references a pre-split `toks` column: repeating split(text) inside
# the lambda is O(tokens²) per document (no CSE across lambda invocations) —
# measured 2x slower on the shingle stage.
# The <3-token guard matters: Spark's sequence(1, n-2) COUNTS DOWN when
# n-2 < 1 (e.g. [1, 0]) and element_at then throws INVALID_ARRAY_INDEX —
# whereas DuckDB's range(1, n-1) is simply empty. Short docs must shingle
# to an empty set on both engines, not crash one of them.
_SPARK_SHINGLES = (
    "if(size(toks) < 3, array(), "
    "array_distinct(transform(sequence(1, size(toks) - 2), "
    "i -> concat_ws(' ', element_at(toks, i), "
    "element_at(toks, i + 1), element_at(toks, i + 2)))))"
)
_DUCK_SHINGLES = (
    "list_distinct(list_transform(range(1, len(string_split(text, ' ')) - 1), "
    "i -> list_extract(string_split(text, ' '), i) || ' ' || "
    "list_extract(string_split(text, ' '), i + 1) || ' ' || "
    "list_extract(string_split(text, ' '), i + 2)))"
)


@register(
    "dedup_exact",
    oracle="""
    SELECT
        MD5(text)     AS content_hash,
        MIN(doc_id)   AS keep_doc_id,
        COUNT(*)      AS n_copies
    FROM documents
    GROUP BY MD5(text)
    """,
    tags=("X2",),
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact content dedup (X2): hash-groupBy on md5(text), keeping the
    smallest doc_id as the deterministic canonical representative.
    Equivalent to ``dropDuplicates(["text"])`` but with an explicit,
    stable keeper — at 100 TB the hash shuffles 16 bytes/row instead of
    the full text."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.groupBy(F.md5("text").alias("content_hash")).agg(
        F.min("doc_id").alias("keep_doc_id"),
        F.count(F.lit(1)).alias("n_copies"),
    )


_JACCARD_ORACLE = f"""
    WITH toks_raw AS (
        SELECT doc_id, UNNEST({_DUCK_SHINGLES}) AS tok
        FROM documents
    ),
    hot AS (
        SELECT tok FROM toks_raw GROUP BY tok HAVING COUNT(*) > {MAX_SHINGLE_DF}
    ),
    toks AS (
        SELECT doc_id, tok FROM toks_raw
        WHERE tok NOT IN (SELECT tok FROM hot)
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS sz FROM toks GROUP BY doc_id),
    inter AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_common
        FROM toks a JOIN toks b ON a.tok = b.tok AND a.doc_id < b.doc_id
        GROUP BY a.doc_id, b.doc_id
    )
    SELECT
        doc_a,
        doc_b,
        ROUND(n_common / (sa.sz + sb.sz - n_common * CAST(1 AS DOUBLE)), 6) AS jaccard
    FROM inter
    JOIN sizes sa ON doc_a = sa.doc_id
    JOIN sizes sb ON doc_b = sb.doc_id
    WHERE n_common / (sa.sz + sb.sz - n_common * CAST(1 AS DOUBLE)) >= {JACCARD_THRESHOLD}
"""


def shingle_postings(
    docs: DataFrame, *, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Word-trigram shingle postings (the inverted-index input every
    near-dup operator consumes): one (doc_id, tok) row per distinct
    trigram per document. Parameterized on column names so any corpus
    table can feed the dedup operators, not just the fixture."""
    return (
        docs.withColumn("toks", F.split(F.col(text_col), " "))
        .select(
            F.col(id_col).alias("doc_id"),
            F.explode(F.expr(_SPARK_SHINGLES)).alias("tok"),
        )
    )


def _shingle_postings(spark: SparkSession, sf_dir: str):
    return shingle_postings(load_table(spark, sf_dir, "documents"))


def jaccard_pairs(
    toks: DataFrame,
    candidates: DataFrame | None = None,
    *,
    jaccard_threshold: float = JACCARD_THRESHOLD,
    max_shingle_df: int = MAX_SHINGLE_DF,
) -> DataFrame:
    """Exact Jaccard from shingle postings; optionally restricted to a
    candidate pair set (the LSH path) so only collisions are scored.

    Two restrictions happen BELOW the aggregation, in this order:

    1. Hot-shingle cap (skew guard): shingles with document frequency >
       MAX_SHINGLE_DF are anti-joined out of the postings before anything
       else. The hot set is tiny (boilerplate shingles) → AQE broadcasts
       the anti side; without the cap one pathological shingle shared by
       d documents contributes d² rows to the self-join shuffle.
    2. Candidate prune (LSH path): postings are semi-joined to candidate
       doc ids before the self-join, so the intersection only ever sees
       candidate documents (Catalyst can't push a join below a groupBy, so
       filtering after the aggregate — the obvious formulation — would
       silently keep the full all-pairs work). The exact pair-level
       restriction then applies after the aggregate, which is cheap
       because pairs among candidate docs ≈ the candidate pairs.

    The cap's document frequencies are computed on the FULL postings
    passed in (before the candidate prune), matching the oracle's global
    HAVING — and sizes are computed after both prunes, which preserves
    per-doc counts because neither prune removes a posting of a surviving
    (doc, capped-shingle) pair.
    """
    hot = (
        toks.groupBy("tok")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") > max_shingle_df)
        .select("tok")
    )
    toks = toks.join(hot, "tok", "left_anti")
    if candidates is not None:
        cand_docs = (
            candidates.select(F.col("doc_a").alias("doc_id"))
            .unionByName(candidates.select(F.col("doc_b").alias("doc_id")))
            .distinct()
        )
        toks = toks.join(cand_docs, "doc_id", "left_semi")
    # The pruned postings fan out to THREE consumers (sizes + both self-join
    # sides); without a persist each one re-runs scan → shingle explode →
    # hot-agg → anti-join. MEMORY_AND_DISK (the default) spills rather than
    # OOMs; at 100 TB this is where you'd checkpoint postings to storage.
    toks = persist_once(toks)
    # sizes AFTER the candidate prune: the semi-join keeps every posting of
    # a surviving doc, so per-doc counts are identical — and the aggregate
    # then only runs over candidate docs (same pushdown rationale as the
    # intersection above).
    sizes = toks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("sz"))
    a, b = toks.alias("a"), toks.alias("b")
    inter = (
        a.join(b, (F.col("a.tok") == F.col("b.tok")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    if candidates is not None:
        inter = inter.join(candidates, ["doc_a", "doc_b"], "left_semi")
    sa, sb = sizes.alias("sa"), sizes.alias("sb")
    jac = F.col("n_common") / (
        F.col("sa.sz") + F.col("sb.sz") - F.col("n_common") * F.lit(1.0)
    )
    return (
        inter.join(sa, F.col("doc_a") == F.col("sa.doc_id"))
        .join(sb, F.col("doc_b") == F.col("sb.doc_id"))
        .filter(jac >= jaccard_threshold)
        .select("doc_a", "doc_b", F.round(jac, 6).alias("jaccard"))
    )


@register("dedup_jaccard_pairs", oracle=_JACCARD_ORACLE, tags=("X3",))
def dedup_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trigram-shingle Jaccard near-dup pairs (X3 verify stage): inverted
    index on shingles → per-pair intersection counts → |A∩B| / |A∪B|.

    Trigram postings lists are short (near-unique shingles), so the
    self-join emits ~only genuine near-dup pairs. Residual hot shingles
    are dropped by the max_shingle_df postings cap before the self-join
    (see jaccard_pairs) — the skew guard that bounds the worst posting's
    contribution; AQE skew-join handles whatever shape remains.
    """
    return jaccard_pairs(_shingle_postings(spark, sf_dir))


def _band_exprs_sql() -> list[str]:
    """Band keys: concatenation of BAND_SIZE adjacent min-hashes.
    MIN over lexicographic md5 hex ≡ min-hash under a random permutation —
    portable across engines, no integer conversion needed."""
    out = []
    for band in range(N_BANDS):
        parts = " || ".join(
            f"MIN(CASE WHEN s = {band * BAND_SIZE + j} THEN h END)"
            for j in range(BAND_SIZE)
        )
        out.append(f"{parts} AS band{band}")
    return out


def minhash_pairs_ctes(toks_src: str = "toks_raw") -> str:
    """The full MinHash+LSH verify pipeline as a reusable SQL CTE list
    (everything after a ``{toks_src}`` posting set: hot cap, signatures,
    bands, candidates, sizes, intersections) — shared by the standalone
    oracle, the components-over-LSH oracle, and the end-to-end pipeline
    oracle so the banding logic exists exactly once in SQL, like
    ``minhash_lsh_pairs`` does on the Spark side. Select from ``lsh_pairs``
    afterwards.

    Signatures hash the RAW shingle sets ({toks_src}); only the
    exact-verify stage (sizes/inter) uses the hot-capped postings —
    mirroring the Spark side, where the cap lives inside the verify
    helper. Hashing: two md5s per shingle -> 64 hex chars -> 8 disjoint
    32-bit (8-hex-char) slices = 8 independent hash fns at 4x less
    hashing (16-bit slices were tried and regressed: min-of-100 ties are
    common at 16 bits, inflating band collisions)."""
    return f"""
    hot AS (
        SELECT tok FROM {toks_src} GROUP BY tok HAVING COUNT(*) > {MAX_SHINGLE_DF}
    ),
    capped AS (
        SELECT doc_id, tok FROM {toks_src}
        WHERE tok NOT IN (SELECT tok FROM hot)
    ),
    hashes AS (
        SELECT doc_id, seeds.s AS s,
               SUBSTRING(MD5(tok) || MD5('x' || tok), seeds.s * 8 + 1, 8) AS h
        FROM {toks_src}, (SELECT UNNEST(RANGE({N_HASHES})) AS s) seeds
    ),
    sig AS (
        SELECT doc_id, {", ".join(_band_exprs_sql())}
        FROM hashes GROUP BY doc_id
    ),
    bands AS (
        {" UNION ALL ".join(f"SELECT doc_id, {b} AS bkey, band{b} AS bval FROM sig" for b in range(N_BANDS))}
    ),
    cand AS (
        SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
        FROM bands x JOIN bands y
          ON x.bkey = y.bkey AND x.bval = y.bval AND x.doc_id < y.doc_id
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS sz FROM capped GROUP BY doc_id),
    inter AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_common
        FROM capped a JOIN capped b ON a.tok = b.tok AND a.doc_id < b.doc_id
        GROUP BY a.doc_id, b.doc_id
    ),
    lsh_pairs AS (
        SELECT
            c.doc_a,
            c.doc_b,
            ROUND(i.n_common / (sa.sz + sb.sz - i.n_common * CAST(1 AS DOUBLE)), 6) AS jaccard
        FROM cand c
        JOIN inter i ON c.doc_a = i.doc_a AND c.doc_b = i.doc_b
        JOIN sizes sa ON c.doc_a = sa.doc_id
        JOIN sizes sb ON c.doc_b = sb.doc_id
        WHERE i.n_common / (sa.sz + sb.sz - i.n_common * CAST(1 AS DOUBLE)) >= {JACCARD_THRESHOLD}
    )"""


_MINHASH_ORACLE = f"""
    WITH toks_raw AS (
        SELECT doc_id, UNNEST({_DUCK_SHINGLES}) AS tok
        FROM documents
    ),
    {minhash_pairs_ctes()}
    SELECT doc_a, doc_b, jaccard FROM lsh_pairs
"""


def minhash_bands(
    toks: DataFrame, *, n_hashes: int = N_HASHES, band_size: int = BAND_SIZE
) -> DataFrame:
    """(doc_id, bkey, bval) band rows from shingle postings — the
    signature+banding stage factored out of ``minhash_lsh_candidates`` so
    the incremental path can join NEW-batch bands against the full band
    set instead of self-joining everything. In production the history's
    band rows are precomputed at ingest and stored (they are tiny: n_bands
    rows of 16 hex chars per doc); only the new batch hashes per run."""
    if n_hashes % band_size:
        raise ValueError("n_hashes must be divisible by band_size")
    n_bands = n_hashes // band_size
    n_digests = -(-n_hashes * 8 // 32)  # 32 hex chars (4 slices) per md5
    hexcat = F.concat(
        *[F.md5(F.concat(F.lit("x" * j), F.col("tok"))) for j in range(n_digests)]
    )
    hashed = toks.select("doc_id", hexcat.alias("hexcat"))
    band_aggs = [
        F.concat(
            *[
                F.min(F.substring("hexcat", (band * band_size + j) * 8 + 1, 8))
                for j in range(band_size)
            ]
        ).alias(f"band{band}")
        for band in range(n_bands)
    ]
    sig = hashed.groupBy("doc_id").agg(*band_aggs)
    # one posexplode pass over the signature rows — NOT a per-band union,
    # which would re-run the whole signature aggregate (and the postings
    # scan below it) once per band; the position doubles as the band key
    return sig.select(
        "doc_id",
        F.posexplode(F.array(*[F.col(f"band{b}") for b in range(n_bands)])).alias(
            "bkey", "bval"
        ),
    )


def minhash_lsh_candidates(
    toks: DataFrame, *, n_hashes: int = N_HASHES, band_size: int = BAND_SIZE
) -> DataFrame:
    """Banded-MinHash candidate pairs from shingle postings — the LSH
    blocking stage, parameterized on signature width and banding.

    The min-hash family is MIN over disjoint 8-hex-char (32-bit) slices of
    chained md5 digests per shingle (digest j hashes ``'x'*j || tok``, so
    8 hashes cost two md5s) — independent uniform hashes, tie-free at
    32 bits, engine-portable and seeded-deterministic (SURVEY §7 rule).

    The signature aggregate computes all slice-MINs directly over the
    postings (``MIN(SUBSTRING(hexcat, j*8+1, 8))`` per slice) rather than
    exploding postings × seeds first: same values (MIN of slice j over
    shingles ≡ MIN(CASE WHEN s=j …) over the exploded form, which the
    oracle keeps for SQL clarity), but map-side partial aggregation then
    shuffles ONE row per doc per partition instead of n_hashes× the
    postings.

    Candidate probability at Jaccard j is 1-(1-j^band_size)^n_bands —
    raise n_hashes (wider signature) for recall, band_size for precision.
    """
    bands = minhash_bands(toks, n_hashes=n_hashes, band_size=band_size)
    x, y = bands.alias("x"), bands.alias("y")
    return (
        x.join(
            y,
            (F.col("x.bkey") == F.col("y.bkey"))
            & (F.col("x.bval") == F.col("y.bval"))
            & (F.col("x.doc_id") < F.col("y.doc_id")),
        )
        .select(F.col("x.doc_id").alias("doc_a"), F.col("y.doc_id").alias("doc_b"))
        .distinct()
    )


def minhash_lsh_pairs(
    toks: DataFrame,
    *,
    n_hashes: int = N_HASHES,
    band_size: int = BAND_SIZE,
    jaccard_threshold: float = JACCARD_THRESHOLD,
    max_shingle_df: int = MAX_SHINGLE_DF,
) -> DataFrame:
    """Full MinHash+LSH near-dup pipeline over shingle postings: banded
    candidates → exact Jaccard verify restricted to candidates. The
    reusable, knob-exposed form of ``dedup_minhash_lsh``."""
    cand = minhash_lsh_candidates(
        toks, n_hashes=n_hashes, band_size=band_size
        # candidates feed the verify stage twice (doc prefilter + pair
        # filter); persisting the small pair set avoids re-running the
        # whole signature/banding DAG per consumer. At 100 TB this is
        # where you'd checkpoint candidates to storage instead.
    )
    cand = persist_once(cand)
    return jaccard_pairs(
        toks,
        cand,
        jaccard_threshold=jaccard_threshold,
        max_shingle_df=max_shingle_df,
    )


@register("dedup_minhash_lsh", oracle=_MINHASH_ORACLE, tags=("X3",), bench=True)
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash + LSH near-dup dedup (X3), the 100 TB path: trigram shingles
    → 8-hash MinHash signature → 4 bands of 2 → band-bucket equi-join for
    candidates → exact Jaccard verify on candidates only.

    The band join replaces all-pairs enumeration: only bucket collisions
    become candidates, then the exact Jaccard filter (restricted to the
    candidate set — the verify never scores non-candidates) removes LSH
    false positives. P(candidate) = 1-(1-j²)⁴: ≈0.96 at j=0.9, ≈0.02 at
    j=0.1 — high recall at the target threshold, tiny false-candidate
    mass. Knobs (signature width, banding, threshold, skew cap) live on
    ``minhash_lsh_pairs``; this registered query is the oracle-checked
    default instantiation.
    """
    # raw postings feed three branches (signature, hot-shingle agg, the
    # anti-join's left side) — persist so scan+explode runs once.
    toks = persist_once(_shingle_postings(spark, sf_dir))
    return minhash_lsh_pairs(toks)


def _components_oracle_over(pairs_sql: str) -> str:
    """Closed-form connected components (recursive transitive-closure CTE,
    component id = min node id) over any (doc_a, doc_b) pair query — the
    oracle twin of ``connected_components``, shared by the raw-Jaccard and
    the LSH-candidate instantiations."""
    return f"""
    WITH RECURSIVE pairs AS (
        {pairs_sql}
    ),
    edges AS (
        SELECT doc_a AS src, doc_b AS dst FROM pairs
        UNION ALL
        SELECT doc_b AS src, doc_a AS dst FROM pairs
    ),
    nodes AS (SELECT DISTINCT src AS doc_id FROM edges),
    reach AS (
        SELECT src, dst FROM edges
        UNION
        SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
    )
    SELECT
        n.doc_id,
        LEAST(n.doc_id, MIN(r.dst)) AS component_id
    FROM nodes n
    LEFT JOIN reach r ON n.doc_id = r.src
    GROUP BY n.doc_id
"""


_COMPONENTS_ORACLE = _components_oracle_over(
    _JACCARD_ORACLE.replace(
        "ROUND(n_common / (sa.sz + sb.sz - n_common * CAST(1 AS DOUBLE)), 6) AS jaccard",
        "n_common AS n_common",
    )
)


def connected_components(
    pairs: DataFrame,
    *,
    src_col: str = "doc_a",
    dst_col: str = "doc_b",
    max_rounds: int = 50,
    rounds: int | None = None,
    fallback_to_adaptive: bool = False,
) -> DataFrame:
    """Connected components over an undirected pair graph, component id =
    min node id in the component. The reusable, knob-exposed form of
    ``dedup_components`` — pass any (src, dst) edge set.

    No GraphFrames: bounded iterative label propagation — each round every
    node takes the min label among itself and its neighbors (one join +
    one agg per round), converging in ≤ graph-diameter rounds (near-dup
    components are tiny, so this is 2-4 rounds in practice; the
    ``max_rounds`` cap keeps the driver loop bounded).

    Two pacing modes:

    - adaptive (default, ``rounds=None``): run until a round changes no
      label. Costs one driver-blocking ``count()`` per round — fine when
      the diameter is unknown, but at extreme scale each count is a
      cluster-wide barrier.
    - fixed (``rounds=R``): run exactly R propagation passes with NO
      per-round action, then ONE final convergence check. Use when the
      caller knows a diameter bound — e.g. LSH-band near-dup graphs, where
      clusters are tiny because every member pair collides in some band.
      The last round doubles as the fixpoint proof, so R must exceed the
      graph diameter (R ≥ diameter + 1: labels move one hop per round and
      the proof round must change nothing). Raises if R rounds were not
      enough (silently returning would desync from the oracle's
      transitive-closure fixpoint) — unless ``fallback_to_adaptive`` is
      set, in which case the R-hop labels are kept and propagation
      continues in adaptive mode (a longer-than-expected dup chain costs
      extra counted rounds instead of failing the run).
    """
    pairs = pairs.select(
        F.col(src_col).alias("doc_a"), F.col(dst_col).alias("doc_b")
    )
    # both edge directions from ONE pass over the pair set — a
    # forward ∪ reverse union would execute the upstream pair computation
    # (an expensive self-join in the near-dup pipeline) once per branch
    directed = pairs.select(
        F.explode(
            F.array(
                F.struct(
                    F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")
                ),
                F.struct(
                    F.col("doc_b").alias("src"), F.col("doc_a").alias("dst")
                ),
            )
        ).alias("e")
    ).select("e.src", "e.dst")
    # self-loops make one propagation round reference `labels` exactly ONCE
    # (the loop row carries the node's own label into the min AND yields the
    # previous label for the convergence check). With two references per
    # round — the naive neighbor-min + carry-join shape — the lazy logical
    # plan DOUBLES per round, and fixed-rounds mode (no action, so no
    # lineage break) OOMs the analyzer around 2^8 copies of the upstream
    # pair DAG. One reference → linear plan growth in rounds.
    nodes = directed.select(F.col("src").alias("doc_id")).distinct()
    edges = directed.unionByName(
        nodes.select(F.col("doc_id").alias("src"), F.col("doc_id").alias("dst"))
    ).persist()
    labels = nodes.withColumn("component_id", F.col("doc_id"))

    def propagate(labels: DataFrame) -> DataFrame:
        """One min-label round over the self-looped edge list: new label =
        min label among self + neighbors; the self-loop row also supplies
        prev_component_id, so the convergence check is a filter on the
        round's own result — one join + one agg per round, one `labels`
        reference."""
        return (
            edges.join(labels, edges.dst == labels.doc_id)
            .groupBy(F.col("src").alias("doc_id"))
            .agg(
                F.min("component_id").alias("component_id"),
                F.min(
                    F.when(F.col("dst") == F.col("src"), F.col("component_id"))
                ).alias("prev_component_id"),
            )
        )

    if rounds is not None:
        if rounds < 1:
            raise ValueError("rounds must be >= 1")
        # fixed mode: build all R rounds as ONE lazy plan — the persisted
        # edge list is computed once and reused across rounds within the
        # single job — then materialize with one localCheckpoint action.
        # The convergence check runs on the checkpointed (tiny, label-table
        # sized) result, not on the R-round lineage.
        for _round in range(rounds):
            updated = propagate(labels)
            labels = updated.select("doc_id", "component_id")
        final = updated.localCheckpoint(eager=True)
        changed = final.filter(
            F.col("component_id") != F.col("prev_component_id")
        ).count()
        if changed == 0:
            edges.unpersist()
            return final.select("doc_id", "component_id")
        if not fallback_to_adaptive:
            edges.unpersist()
            # silently returning would desync from the oracle's closed-form
            # fixpoint; an R-hop chain means the caller's diameter bound
            # (e.g. "LSH clusters are tiny") was wrong
            raise RuntimeError(
                f"label propagation did not converge in {rounds} fixed rounds"
            )
        # budget short: keep the R-hop checkpointed labels and continue in
        # adaptive mode below — a longer-than-expected dup chain degrades
        # to extra counted rounds instead of a failed run
        labels = final.select("doc_id", "component_id")

    converged = False
    prev_cached = None
    for _round in range(max_rounds):
        updated = persist_once(propagate(labels))
        changed = updated.filter(
            F.col("component_id") != F.col("prev_component_id")
        ).count()
        if prev_cached is not None:
            prev_cached.unpersist()  # superseded round's cache
        prev_cached = updated
        labels = updated.select("doc_id", "component_id")
        if changed == 0:
            converged = True
            break
    # truncate lineage so intermediate caches can be released; the
    # checkpointed result carries its own storage, freed on GC
    labels = labels.localCheckpoint(eager=True)
    edges.unpersist()
    if prev_cached is not None:
        prev_cached.unpersist()  # final round's cache, superseded by the checkpoint
    if not converged:
        # silently returning would desync from the oracle's closed-form
        # fixpoint; a max_rounds-hop near-dup chain means the threshold is
        # wrong
        raise RuntimeError(
            f"label propagation did not converge in {max_rounds} rounds"
        )
    return labels


def connected_components_star(
    pairs: DataFrame,
    *,
    src_col: str = "doc_a",
    dst_col: str = "doc_b",
    max_rounds: int = 30,
    stats: dict | None = None,
) -> DataFrame:
    """Connected components by alternating large-star / small-star
    contraction (Kiveris et al., "Connected Components in MapReduce and
    Beyond", SoCC'14) — same contract as ``connected_components``
    (component id = min node id), but convergence is O(log n) ROUNDS
    REGARDLESS OF GRAPH DIAMETER, where min-label propagation needs one
    round per hop. A 64-deep dup chain costs ~64 propagation joins (or
    trips the fixed-rounds budget) versus ≤ 2·log₂(n) star rounds —
    property-tested on exactly that planted chain.

    Edge set is kept canonical (a > b). Per round:
    - large-star: every node links its LARGER neighbors to its minimum
      (incl. itself) — long chains fold toward local minima;
    - small-star: every node links its smaller-or-equal neighbors and
      itself to the group minimum — stars flatten onto their roots.
    Both are one groupBy-min + one self-join on the grouped key (the
    exchange is reused) + a distinct; each round materializes via
    localCheckpoint (iterative lineage truncation) and the loop stops
    when the (count, hash-sum) signature stabilizes. Convergence is then
    PROVEN exactly: every original edge must connect same-label nodes
    (label(min)=min is invariant, so constant-per-component labels are
    the component minima); on failure the loop continues, and raises at
    ``max_rounds`` like the propagation modes do.

    ``stats['rounds']`` reports the star rounds used when a dict is
    passed (the chain property test reads it)."""
    edges = (
        pairs.select(
            F.greatest(F.col(src_col), F.col(dst_col)).alias("a"),
            F.least(F.col(src_col), F.col(dst_col)).alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    nodes = (
        edges.select(F.col("a").alias("doc_id"))
        .unionByName(edges.select(F.col("b").alias("doc_id")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    original = edges

    def signature(e: DataFrame) -> tuple:
        # decimal accumulator: a long sum of xxhash64 values overflows
        # (ANSI arithmetic error on Spark 4)
        row = e.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.xxhash64("a", "b").cast("decimal(38,0)")).alias("h"),
        ).collect()[0]
        return (row["n"], row["h"])

    def large_star(e: DataFrame) -> DataFrame:
        d = e.select("a", "b").unionByName(
            e.select(F.col("b").alias("a"), F.col("a").alias("b"))
        ).select(F.col("a").alias("u"), F.col("b").alias("v"))
        mins = d.groupBy("u").agg(F.min("v").alias("mn"))
        mins = mins.select("u", F.least("mn", "u").alias("m"))
        return (
            d.join(mins, "u")
            .filter(F.col("v") > F.col("u"))
            .select(F.col("v").alias("a"), F.col("m").alias("b"))
            .distinct()
        )

    def small_star(e: DataFrame) -> DataFrame:
        # canonical edges already point larger -> smaller (a > b)
        mins = e.groupBy("a").agg(F.min("b").alias("m"))
        relinked = (
            e.join(mins, "a")
            .filter(F.col("b") != F.col("m"))
            .select(F.col("b").alias("a"), F.col("m").alias("b"))
        )
        roots = mins.select("a", F.col("m").alias("b"))
        return relinked.unionByName(roots).distinct()

    sig = signature(edges)
    rounds = 0
    converged = False
    while rounds < max_rounds:
        new_edges = small_star(large_star(edges)).localCheckpoint(eager=True)
        rounds += 1
        new_sig = signature(new_edges)
        edges, prev_sig, sig = new_edges, sig, new_sig
        if new_sig != prev_sig:
            continue
        # signature stable -> exact convergence proof: label every node
        # with its (min) parent in the star graph and require every
        # ORIGINAL edge to connect same-label nodes
        labels = (
            nodes.join(
                edges.groupBy("a").agg(F.min("b").alias("parent")),
                nodes.doc_id == F.col("a"),
                "left",
            )
            .select(
                "doc_id",
                F.coalesce("parent", "doc_id").alias("component_id"),
            )
            .localCheckpoint(eager=True)
        )
        la = labels.select(
            F.col("doc_id").alias("a"), F.col("component_id").alias("ca")
        )
        lb = labels.select(
            F.col("doc_id").alias("b"), F.col("component_id").alias("cb")
        )
        disagreeing = (
            original.join(la, "a").join(lb, "b")
            .filter(F.col("ca") != F.col("cb"))
            .count()
        )
        if disagreeing == 0:
            converged = True
            break
    if stats is not None:
        stats["rounds"] = rounds
    if not converged:
        raise RuntimeError(
            f"star contraction did not converge in {max_rounds} rounds"
        )
    return labels


@register("dedup_components", oracle=_COMPONENTS_ORACLE, tags=("X3",))
def dedup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup cluster assignment (X3 final stage): connected components
    over the Jaccard-threshold pair graph — so "keep one per cluster" is a
    deterministic filter (doc_id == component_id). The oracle computes the
    same fixpoint via a recursive transitive-closure CTE — closed-form vs
    iterative, same unique answer. Knobs live on ``connected_components``.

    The pair graph here is EXHAUSTIVE Jaccard (every posting-sharing pair
    scored) — the exactness baseline, inherently Σ df² over shingle
    document frequencies. ``dedup_components_lsh`` is the candidate-bounded
    composition to reach for at scale.
    """
    return connected_components(
        dedup_jaccard_pairs(spark, sf_dir).select("doc_a", "doc_b")
    )


_COMPONENTS_LSH_ORACLE = _components_oracle_over(_MINHASH_ORACLE)


@register("dedup_components_lsh", oracle=_COMPONENTS_LSH_ORACLE, tags=("X3",))
def dedup_components_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB near-dup clustering composition: MinHash+LSH candidate
    pairs (band collisions only — never Σ df² over the full inverted
    index) → exact Jaccard verify on candidates → connected components by
    STAR CONTRACTION (round-5 default, per round-4 verdict #4: the
    previous fixed-rounds min-propagation converged in O(diameter) rounds,
    so a pathological 64-deep dup chain cost 64 joins or tripped the
    adaptive fallback late; large-star/small-star alternation is
    O(log n) rounds regardless of diameter, with an exact convergence
    proof — see ``connected_components_star``; the propagation modes
    remain available on ``connected_components`` for known-tiny-diameter
    graphs).

    Scale shape: candidate generation is banded-bucket joins (never
    Σ df² over the full inverted index), components cost ~log n rounds of
    groupBy-min + keyed self-join — see the BASELINE.md scale-ladder
    table for the measured x1→x10 exponents vs the exhaustive-Jaccard
    baseline.
    """
    toks = persist_once(_shingle_postings(spark, sf_dir))
    return connected_components_star(
        minhash_lsh_pairs(toks).select("doc_a", "doc_b")
    )


# --- Incremental ingest near-dup dedup (round 6) ---------------------------
#
# The production shape of X3 at 100 TB: the deduplicated HISTORY corpus is
# immutable; each ingest run must decide which NEW docs to drop — against
# the history and within the batch — WITHOUT ever re-pairing history with
# itself. Re-running dedup_minhash_lsh over history+batch would redo the
# Σ|bucket|² work on the (huge, already-clean) history every run; here the
# band join is bands(all) ⋈ bands(new), so candidate cost scales with the
# BATCH, history contributing only bucket-collision partners. History band
# rows are precomputed at ingest in production (tiny: N_BANDS 16-hex rows
# per doc — see minhash_bands docstring); the fixture recomputes them
# because it has no prior run to read from.

_INCR_HIST = "SUBSTRING(MD5(CAST(doc_id AS STRING)), 1, 2) < '80'"  # ~50/50


_INCR_ORACLE = f"""
    WITH toks_raw AS (
        SELECT doc_id, UNNEST({_DUCK_SHINGLES}) AS tok
        FROM documents
    ),
    flags AS (
        SELECT doc_id, {_INCR_HIST} AS is_hist
        FROM documents
    ),
    hot AS (
        SELECT tok FROM toks_raw GROUP BY tok HAVING COUNT(*) > {MAX_SHINGLE_DF}
    ),
    capped AS (
        SELECT doc_id, tok FROM toks_raw
        WHERE tok NOT IN (SELECT tok FROM hot)
    ),
    hashes AS (
        SELECT doc_id, seeds.s AS s,
               SUBSTRING(MD5(tok) || MD5('x' || tok), seeds.s * 8 + 1, 8) AS h
        FROM toks_raw, (SELECT UNNEST(RANGE({N_HASHES})) AS s) seeds
    ),
    sig AS (
        SELECT doc_id, {", ".join(_band_exprs_sql())}
        FROM hashes GROUP BY doc_id
    ),
    bands AS (
        {" UNION ALL ".join(f"SELECT doc_id, {b} AS bkey, band{b} AS bval FROM sig" for b in range(N_BANDS))}
    ),
    cand AS (
        SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
        FROM bands x
        JOIN flags fx ON x.doc_id = fx.doc_id
        JOIN bands y ON x.bkey = y.bkey AND x.bval = y.bval
        JOIN flags fy ON y.doc_id = fy.doc_id
        WHERE NOT fy.is_hist
          AND x.doc_id <> y.doc_id
          AND (fx.is_hist OR x.doc_id < y.doc_id)
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS sz FROM capped GROUP BY doc_id),
    inter AS (
        SELECT c.doc_a, c.doc_b, COUNT(*) AS n_common
        FROM cand c
        JOIN capped a ON a.doc_id = c.doc_a
        JOIN capped b ON b.doc_id = c.doc_b AND b.tok = a.tok
        GROUP BY c.doc_a, c.doc_b
    ),
    verified AS (
        SELECT i.doc_a, i.doc_b,
               ROUND(i.n_common / (sa.sz + sb.sz - i.n_common * CAST(1 AS DOUBLE)), 6) AS jaccard
        FROM inter i
        JOIN sizes sa ON i.doc_a = sa.doc_id
        JOIN sizes sb ON i.doc_b = sb.doc_id
        WHERE i.n_common / (sa.sz + sb.sz - i.n_common * CAST(1 AS DOUBLE)) >= {JACCARD_THRESHOLD}
    )
    SELECT doc_b AS doc_id,
           COUNT(*) AS n_dup_sources,
           MAX(jaccard) AS max_jaccard
    FROM verified
    GROUP BY doc_b
"""


@register("dedup_incremental_lsh", oracle=_INCR_ORACLE, tags=("X3", "X2", "T6"))
def dedup_incremental_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental near-dup dedup of an ingest batch against an immutable
    history (X3's production ingest shape): documents split
    deterministically (md5 bucket < '80' = history, rest = new batch);
    a NEW doc drops if it has a Jaccard-≥-{JACCARD_THRESHOLD} near-dup
    in the history (any id order — history never drops) or a LOWER-ID
    near-dup within the batch. Returns the drop list with dup counts and
    the strongest match.

    The scale property is in the candidate stage: band rows of the new
    batch join the FULL band set, so history×history pairs are never
    generated — per-run cost follows the batch size plus collisions, not
    |history|² (the whole point of incremental ingest; a full re-dedup
    per batch would re-pay the corpus-quadratic every run). Signatures
    for history would be read from storage in production
    (``minhash_bands``); candidates then pass the same hot-capped exact
    Jaccard verify as ``dedup_minhash_lsh``, restricted to candidate
    docs. The streaming twin of the policy is
    ``test_incremental_ingest_dedup_vs_history`` (exact dedup); this is
    the near-dup version under the value oracle."""
    docs = load_table(spark, sf_dir, "documents")
    toks = persist_once(shingle_postings(docs))
    is_hist = F.expr(_INCR_HIST)
    flags = docs.select("doc_id", is_hist.alias("is_hist"))

    bands = minhash_bands(toks).join(flags, "doc_id")
    x = bands.alias("x")
    y = bands.filter(~F.col("is_hist")).alias("y")
    cand = (
        x.join(
            y,
            (F.col("x.bkey") == F.col("y.bkey"))
            & (F.col("x.bval") == F.col("y.bval"))
            & (F.col("x.doc_id") != F.col("y.doc_id"))
            & (F.col("x.is_hist") | (F.col("x.doc_id") < F.col("y.doc_id"))),
        )
        .select(F.col("x.doc_id").alias("doc_a"), F.col("y.doc_id").alias("doc_b"))
        .distinct()
    )

    # exact verify, mirroring jaccard_pairs but with (history, new)
    # ordering: hot cap df over FULL postings (matches the oracle's
    # global HAVING), then postings pruned to candidate docs — the
    # semi-join keeps every posting of a surviving doc, so sizes are
    # unchanged by the prune.
    hot = (
        toks.groupBy("tok")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") > MAX_SHINGLE_DF)
        .select("tok")
    )
    capped = toks.join(hot, "tok", "left_anti")
    cand_docs = (
        cand.select(F.col("doc_a").alias("doc_id"))
        .unionByName(cand.select(F.col("doc_b").alias("doc_id")))
        .distinct()
    )
    capped = persist_once(capped.join(cand_docs, "doc_id", "left_semi"))
    sizes = capped.groupBy("doc_id").agg(F.count(F.lit(1)).alias("sz"))
    a, b = capped.alias("a"), capped.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.tok") == F.col("b.tok"))
            & (F.col("a.doc_id") != F.col("b.doc_id")),
        )
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("n_common"))
        .join(cand, ["doc_a", "doc_b"], "left_semi")
    )
    sa, sb = sizes.alias("sa"), sizes.alias("sb")
    jac = F.col("n_common") / (
        F.col("sa.sz") + F.col("sb.sz") - F.col("n_common") * F.lit(1.0)
    )
    verified = (
        inter.join(sa, F.col("doc_a") == F.col("sa.doc_id"))
        .join(sb, F.col("doc_b") == F.col("sb.doc_id"))
        .filter(jac >= JACCARD_THRESHOLD)
        .select("doc_a", "doc_b", F.round(jac, 6).alias("jaccard"))
    )
    return verified.groupBy(F.col("doc_b").alias("doc_id")).agg(
        F.count(F.lit(1)).alias("n_dup_sources"),
        F.max("jaccard").alias("max_jaccard"),
    )
