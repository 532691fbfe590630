"""Snapshot isolation + time travel over plain parquet (round 6): the
lakehouse commit protocol reduced to its primitives.

``spark.read.parquet(dir)`` couples readers to the DIRECTORY LISTING, so
any rewrite (compaction, overwrite) races every concurrent reader — the
failure mode ``compact_parquet``'s in-place guard exists to reject. The
real fix at 100 TB is the one Delta/Iceberg/Hudi all share: data files
are IMMUTABLE and a tiny manifest names the exact file set of each table
version. Readers bind to a manifest, never a listing; writers publish a
new manifest ATOMICALLY (``open(..., 'x')`` — exclusive create is the
commit point, the file-system analogue of a log append); losers of a
version race retry against the new tip (optimistic concurrency). Old
versions stay readable (time travel) until an explicit ``vacuum``.

Everything here is driver-side metadata handling of a BOUNDED manifest
(file names, not data) plus plain DataFrame writes — no new execution
machinery, which is the point: snapshot semantics are a property of how
file sets are PUBLISHED, not of the engine. Local-filesystem paths (the
harness has no object store); on S3 the exclusive-create commit point
would be a conditional PUT, same protocol.
"""

from __future__ import annotations

import json
import os
import time
import uuid
from collections import OrderedDict

from pyspark.sql import DataFrame, SparkSession

_SNAPDIR = "_snapshots"


class SnapshotConflictError(RuntimeError):
    """Raised when an optimistic commit loses its race: the table tip
    moved past the version the commit's file set was computed against.
    Append commits never raise it (they re-read the tip and compose);
    REWRITE commits (merge/delete/update/compaction) must, because their
    untouched-file list came from the old tip — publishing anyway would
    silently drop the concurrent commit's changes (the lost-update
    anomaly Delta/Iceberg abort on). Callers retry by re-running the
    whole operation against the new tip."""


class QuietRangeError(ValueError):
    """Raised by ``snapshot_change_feed`` when the requested version
    range contains commits but NO row-level changes (reorg/rename/
    metadata-only commits): the live row set at the range's two ends is
    provably identical. A dedicated subtype so consumers (the MV
    refresher) can treat exactly this case as "advance the watermark
    over unchanged state" — any OTHER ValueError from feed derivation
    must propagate, never be mistaken for quiet."""


# Safe numeric widening chains (the Delta type-widening set this repo
# supports): byte → short → int → long, and float → double. Spark 4's
# vectorized parquet reader promotes a narrower file column to the
# declared wider type natively, and pyarrow casts losslessly — so a
# widened table needs NO file rewrite; each file keeps its written type
# and readers declare the manifest's (wide) type.
_WIDEN_RANK = {"byte": 0, "short": 1, "integer": 2, "long": 3}
_WIDEN_RANK_F = {"float": 0, "double": 1}


def _wider_type(a, b):
    """The wider of two Spark DataTypes when they sit on one widening
    chain, else None (incompatible change). Decimals widen to their
    least upper bound — max integer digits + max scale, which Spark 4's
    vectorized parquet reader (and the source's pyarrow cast path)
    promotes files to losslessly — refused only when that bound exceeds
    decimal(38). Checked BEFORE the typeName shortcut: every decimal
    shares the name 'decimal', and treating decimal(13,2) as equal to
    decimal(12,2) once published a table whose declared schema couldn't
    read its own files."""
    from pyspark.sql.types import DecimalType

    if isinstance(a, DecimalType) and isinstance(b, DecimalType):
        if (a.precision, a.scale) == (b.precision, b.scale):
            return a
        scale = max(a.scale, b.scale)
        int_digits = max(a.precision - a.scale, b.precision - b.scale)
        if int_digits + scale > 38:
            return None  # no decimal can hold both ranges losslessly
        return DecimalType(int_digits + scale, scale)
    an, bn = a.typeName(), b.typeName()
    if an == bn:
        return a
    for rank in (_WIDEN_RANK, _WIDEN_RANK_F):
        if an in rank and bn in rank:
            return a if rank[an] >= rank[bn] else b
    return None


def _merge_schema(parent: dict | None, new: dict | None) -> dict | None:
    """Widen a parent manifest schema with the new commit's columns:
    ADD-COLUMN evolution, plus TYPE WIDENING along the safe numeric
    chains (byte→short→int→long, float→double) — the merged type is the
    wider of the two, so a narrow append under a widened table keeps the
    wide type and a wider append widens it; any other type change
    raises (it is a table rewrite, not a commit side effect). Field
    order is parent-first so existing readers see a stable prefix."""
    if parent is None or new is None:
        return new if parent is None else parent
    from pyspark.sql.types import StructField, StructType

    ps = StructType.fromJson(parent)
    ns = StructType.fromJson(new)
    by_name = {f.name: f for f in ps.fields}
    out = list(ps.fields)
    for f in ns.fields:
        have = by_name.get(f.name)
        if have is None:
            # an added column is NULL in every pre-evolution file, so it
            # is nullable at the table level even if this commit's df
            # wasn't (e.g. a non-null literal)
            out.append(StructField(f.name, f.dataType, nullable=True))
        elif have.dataType != f.dataType:
            w = _wider_type(have.dataType, f.dataType)
            if w is None:
                raise ValueError(
                    f"schema evolution cannot change column {f.name!r}: "
                    f"{have.dataType.simpleString()} -> "
                    f"{f.dataType.simpleString()} (only widening along "
                    "byte->short->int->long and float->double is legal)"
                )
            if w != have.dataType:
                i = next(
                    j for j, pf in enumerate(out) if pf.name == f.name
                )
                out[i] = StructField(f.name, w, out[i].nullable, out[i].metadata)
    return StructType(out).jsonValue()


# ---- physical column mapping (rename support) -----------------------------
#
# A manifest may carry ``"phys"``: a logical→physical name map for its
# schema fields (only non-identity entries are stored; absent = identity,
# which keeps every pre-mapping manifest valid). PHYSICAL names are the
# column names actually written into parquet files and are IMMUTABLE once
# assigned — RENAME COLUMN changes only the logical name (one manifest
# write), and re-adding a previously dropped name mints a FRESH physical
# name so old files' bytes can never resurrect (the tombstone refusal
# this replaces). Everything file-side keys on physical names forever:
# per-file min/max stats, bloom filters, NDV sketches, equality-delete
# key columns. Readers translate once at the scan boundary
# (``_read_data_files`` reads physical and aliases back to logical);
# predicates translate at prune and pushdown. Same design as Delta
# column mapping / Iceberg field ids, reduced to the manifest primitives.


def _phys_map(manifest: dict | None) -> dict:
    """The manifest's logical→physical map ({} = identity)."""
    return dict((manifest or {}).get("phys") or {})


def _phys_col(manifest: dict | None, col: str) -> str:
    return _phys_map(manifest).get(col, col)


def _inv_phys(manifest: dict | None) -> dict:
    """physical→logical for the manifest's mapped fields."""
    return {p: l for l, p in _phys_map(manifest).items()}


def _phys_predicates(manifest: dict | None, predicates: list) -> list:
    """(col, op, value) triples translated logical→physical — the form
    file stats, blooms and pyarrow filters understand."""
    phys = _phys_map(manifest)
    return [(phys.get(c, c), op, v) for (c, op, v) in predicates]


def _mint_physical(logical: str, used: set) -> str:
    """A fresh physical name for a NEW logical column: the logical name
    itself when free, else the first ``name#N`` not colliding with any
    in-use or tombstoned physical name. Deterministic given ``used`` —
    two racing commits that both re-add the same dropped column against
    the same parent mint the SAME name, so the race stays benign."""
    if logical not in used:
        return logical
    n = 1
    while f"{logical}#{n}" in used:
        n += 1
    return f"{logical}#{n}"


def _used_physical(manifest: dict | None) -> set:
    """Every physical name minting must avoid: the resolved physical of
    each current schema field, plus every tombstoned (dropped) physical
    — those bytes may still live in retained files."""
    m = manifest or {}
    phys = _phys_map(m)
    used = set(m.get("dropped_cols") or [])
    if m.get("schema") is not None:
        used.update(phys.get(f["name"], f["name"]) for f in m["schema"]["fields"])
    return used


def _physical_struct(schema_json: dict, phys: dict):
    """The declared schema with field names translated to physical —
    what the parquet files actually contain."""
    from pyspark.sql.types import StructField, StructType

    st = StructType.fromJson(schema_json)
    return StructType(
        [
            StructField(phys.get(f.name, f.name), f.dataType, f.nullable, f.metadata)
            for f in st.fields
        ]
    )


def _to_physical_df(df: DataFrame, phys: dict) -> DataFrame:
    """Alias a logical-named DataFrame to physical names for writing.
    Identity maps return ``df`` unchanged (no plan node added)."""
    if not any(phys.get(c, c) != c for c in df.columns):
        return df
    from pyspark.sql import functions as F

    return df.select(*[F.col(c).alias(phys.get(c, c)) for c in df.columns])


def _commit_phys(
    parent_manifest: dict | None, field_names, *, reset: bool = False
) -> dict:
    """The FULL logical→physical map a commit's files are written under:
    existing fields keep the parent's assignment, new fields mint
    (identity unless the name is tombstoned or collides with an in-use
    physical). ``reset=True`` (full overwrite — no retained files) maps
    everything identity: the new files own every value."""
    if reset or parent_manifest is None:
        return {n: n for n in field_names}
    base = _phys_map(parent_manifest)
    parent_fields = (
        {f["name"] for f in parent_manifest["schema"]["fields"]}
        if parent_manifest.get("schema") is not None
        else set()
    )
    used = _used_physical(parent_manifest)
    out = {}
    for n in field_names:
        if n in parent_fields:
            out[n] = base.get(n, n)
        else:
            p = _mint_physical(n, used)
            used.add(p)
            out[n] = p
    return out


def _strip_identity(phys: dict) -> dict:
    return {l: p for l, p in phys.items() if l != p}


# ---- partition spec (Iceberg-style hidden partitioning) -------------------
#
# A manifest may carry ``"partition_spec"``: a list of transforms
# ``{"col": <physical name>, "kind": "identity"|"day"|"bucket",
# "n": <buckets>}``. Writers CLUSTER each commit on the transform
# expressions and record every data file's distinct partition TUPLES in
# its per-file stats blob (``__pvals``); ``prune_files`` matches
# predicates against the tuples BEFORE the min/max stats. This is the
# Iceberg model, deliberately not the hive one: the manifest is the
# index, so files keep ALL columns and a flat layout (no
# directory-name coupling, no partition columns stripped from parquet),
# and a file the writer could not keep tuple-tight simply records more
# tuples — pruning stays exact, never a filter. The bucket transform
# uses crc32(cast(col as string)) % n, computable identically by the
# Spark expression at write time and by plain Python at prune time.


def _norm_partition_by(partition_by) -> list[dict]:
    """User spec → canonical entries (logical col names at this stage)."""
    out = []
    for e in partition_by:
        if isinstance(e, str):
            out.append({"col": e, "kind": "identity"})
        elif len(e) == 2:
            col, kind = e
            if kind not in ("identity", "day"):
                raise ValueError(f"unknown partition transform: {kind!r}")
            out.append({"col": col, "kind": kind})
        else:
            col, kind, n = e
            if kind != "bucket" or int(n) < 1:
                raise ValueError(f"bad partition transform: {e!r}")
            out.append({"col": col, "kind": "bucket", "n": int(n)})
    return out


def _transform_name(e: dict) -> str:
    if e["kind"] == "identity":
        return e["col"]
    if e["kind"] == "day":
        return f"day({e['col']})"
    return f"bucket({e['col']},{e['n']})"


def _transform_expr(e: dict, logical_col: str):
    """The Spark Column computing one transform over LOGICAL names."""
    from pyspark.sql import functions as F

    c = F.col(logical_col)
    if e["kind"] == "identity":
        return c
    if e["kind"] == "day":
        return F.date_format(c, "yyyy-MM-dd")
    return F.pmod(F.crc32(c.cast("string")), F.lit(e["n"])).cast("int")


def _bucket_of(value, n: int) -> int | None:
    """Python twin of the bucket expression — crc32 over Spark's
    cast-to-string canonical form. int/str only (same exactness contract
    as the blooms); anything else returns None (no pruning)."""
    import zlib

    if type(value) is bool or not isinstance(value, (int, str)):
        return None
    return zlib.crc32(str(value).encode()) % n


def _day_of(value) -> str | None:
    """ISO day string of a predicate value (datetime/date/ISO string),
    or None when it can't be derived — pruning then skips it."""
    import datetime as _dt

    if isinstance(value, _dt.datetime):
        return value.date().isoformat()
    if isinstance(value, _dt.date):
        return value.isoformat()
    if isinstance(value, str) and len(value) >= 10:
        head = value[:10]
        try:
            _dt.date.fromisoformat(head)
            return head
        except ValueError:
            return None
    return None


def _compute_pvals(spark, table_dir: str, rel_paths, spec, schema=None) -> dict:
    """Per-file distinct partition tuples for a commit's NEW files — one
    column-pruned distinct-aggregate over exactly those files (the same
    commit-proportional budget as the footer-stats pass). The staged
    files hold PHYSICAL names, which is what spec entries store, so the
    transforms apply directly. Keys are transform names; values
    JSON-safe scalars. ``schema`` (the staged files' physical struct,
    known to every committer) skips parquet schema inference — otherwise
    a footer-reading Spark job per partitioned commit."""
    if not spec or not rel_paths:
        return {}
    paths = [os.path.join(table_dir, f) for f in rel_paths]
    exprs = [
        _transform_expr(e, e["col"]).alias(_transform_name(e)) for e in spec
    ]
    reader = spark.read if schema is None else spark.read.schema(schema)
    rows = (
        reader.parquet(*paths)
        .select(_rel_path_expr().alias("__f"), *exprs)
        .distinct()
        .collect()
    )
    # every staged file gets an entry — a file with NO tuples is provably
    # empty and prunable by any predicate ([] ≠ "unrecorded", which stays
    # None and never prunes)
    out: dict = {f: [] for f in rel_paths}
    names = [_transform_name(e) for e in spec]
    for r in rows:
        tup = {}
        for n in names:
            v = r[n]
            if v is not None and not isinstance(v, (int, float, str, bool)):
                v = str(v)
            tup[n] = v
        out.setdefault(r["__f"], []).append(tup)
    return out


def _pvals_exclude(pvals, spec: list, col: str, op: str, value) -> bool:
    """True iff the file's recorded partition tuples PROVE no row can
    satisfy ``col op value`` (col already physical). Conservative:
    None (unrecorded — pre-spec or sink-written file) keeps the file;
    an EMPTY recorded list means the file provably holds no rows."""
    if pvals is None:
        return False
    if pvals == []:
        return True
    for e in spec:
        if e["col"] != col:
            continue
        name = _transform_name(e)
        vals = [t.get(name) for t in pvals]
        if any(v is None for v in vals):
            continue  # NULL partition or unrecorded: cannot prove absence
        if e["kind"] == "identity":
            sat = _op_satisfiable(vals, op, value)
        elif e["kind"] == "bucket":
            if op == "=":
                b = _bucket_of(value, e["n"])
                sat = b is None or b in vals
            elif op == "in":
                bs = [_bucket_of(x, e["n"]) for x in value]
                sat = any(b is None for b in bs) or bool(set(bs) & set(vals))
            else:
                sat = True
        else:  # day: compare at day granularity (conservative at edges)
            if op == "in":
                days = [_day_of(x) for x in value]
                sat = any(d is None for d in days) or bool(set(days) & set(vals))
            else:
                d = _day_of(value)
                if d is None:
                    sat = True
                elif op == "=":
                    sat = d in vals
                elif op in (">", ">="):
                    sat = any(x >= d for x in vals)
                else:  # <, <=
                    sat = any(x <= d for x in vals)
        if not sat:
            return True
    return False


def _op_satisfiable(vals: list, op: str, value) -> bool:
    try:
        if op == "=":
            return value in vals
        if op == "in":
            return bool(set(vals) & set(value))
        if op == ">":
            return any(x > value for x in vals)
        if op == ">=":
            return any(x >= value for x in vals)
        if op == "<":
            return any(x < value for x in vals)
        if op == "<=":
            return any(x <= value for x in vals)
    except TypeError:
        return True  # incomparable types: keep the file
    return True


def _manifest_path(table_dir: str, version: int) -> str:
    return os.path.join(table_dir, _SNAPDIR, f"v{version:09d}.json")


# Tip cache: every operation (reads, commits, refreshes, the streaming
# source's per-trigger poll) starts with ``latest_version``, whose
# directory listing grows with the table's version count — at 100 TB
# that is one object-store LIST per plan build / per micro-batch poll.
# Validated by the manifest DIRECTORY's mtime_ns: publishing or
# vacuuming a manifest updates it, including from another process.
# Because filesystem timestamps can be coarser than the commit cadence,
# an entry is only STORED when the directory's mtime is already older
# than _TIP_RACY_NS at store time (the "racily clean" discipline of
# index-based build tools): a second commit landing inside the same
# timestamp granule as the listed state can therefore never hide behind
# an unchanged mtime — a fresh directory is simply re-listed every call,
# which is exactly the uncached behavior.
_TIP_CACHE: "OrderedDict[str, tuple[int, int | None]]" = OrderedDict()
_TIP_CACHE_MAX = 1024
_TIP_RACY_NS = 100_000_000  # 100 ms, far above any fs timestamp granularity


def latest_version(table_dir: str) -> int | None:
    """Highest committed version, or None for an empty table. One stat of
    the manifest directory on the steady-state path (one listing on the
    first call or after any commit/vacuum — see ``_TIP_CACHE``)."""
    snap = os.path.join(table_dir, _SNAPDIR)
    if not os.path.isdir(snap):
        _TIP_CACHE.pop(snap, None)
        return None
    st = os.stat(snap)
    hit = _TIP_CACHE.get(snap)
    if hit is not None and hit[0] == st.st_mtime_ns:
        _TIP_CACHE.move_to_end(snap)
        return hit[1]
    versions = [
        int(f[1:-5]) for f in os.listdir(snap) if f.startswith("v") and f.endswith(".json")
    ]
    tip = max(versions) if versions else None
    if time.time_ns() - st.st_mtime_ns > _TIP_RACY_NS:
        _TIP_CACHE[snap] = (st.st_mtime_ns, tip)
        _TIP_CACHE.move_to_end(snap)
        while len(_TIP_CACHE) > _TIP_CACHE_MAX:
            _TIP_CACHE.popitem(last=False)
    else:
        _TIP_CACHE.pop(snap, None)
    return tip


# Parsed-manifest cache, keyed by path and validated by (mtime_ns, size).
# A manifest file is immutable once published (``publish_manifest`` creates
# it with O_EXCL and nothing rewrites it), so a fresh stat per read is the
# entire coherence protocol: any out-of-band rewrite (tests simulate legacy
# manifests that way) changes mtime/size and misses. Why it exists: a
# manifest's JSON grows with the table's file count, and plan construction
# re-parses it constantly — every read/targeting scan parses the tip, a
# change-feed parses one per version, ``find_txn`` walks ALL of them on
# every idempotent commit, and the streaming source re-plans per
# micro-batch. At 100 TB that is re-deserializing a multi-MB file list per
# plan build; with the cache it is one ``stat`` round trip instead
# (production formats solve this with manifest-list indirection; same
# contract). Entries are shared read-only dicts — every consumer
# copies before mutating (``publish_manifest`` builds fresh dicts) and
# ``test_manifest_cache_never_observes_mutation`` pins that discipline.
_MANIFEST_CACHE: "OrderedDict[str, tuple[int, int, dict]]" = OrderedDict()
_MANIFEST_CACHE_MAX = 1024


def _read_manifest(table_dir: str, version: int) -> dict:
    path = _manifest_path(table_dir, version)
    st = os.stat(path)
    hit = _MANIFEST_CACHE.get(path)
    if hit is not None and hit[0] == st.st_mtime_ns and hit[1] == st.st_size:
        _MANIFEST_CACHE.move_to_end(path)
        return hit[2]
    with open(path) as f:
        m = json.load(f)
    _MANIFEST_CACHE[path] = (st.st_mtime_ns, st.st_size, m)
    _MANIFEST_CACHE.move_to_end(path)
    while len(_MANIFEST_CACHE) > _MANIFEST_CACHE_MAX:
        _MANIFEST_CACHE.popitem(last=False)
    return m


def _data_path(table_dir: str, manifest: dict | None, rel: str) -> str:
    """Absolute path of a manifest data file. Normally
    ``table_dir/rel``; a SHALLOW CLONE's manifest carries a
    ``file_bases`` map for files it references in the SOURCE table's
    directory (``clone_snapshot``) — the file keys stay table-relative
    everywhere (DV refs, targeting, change feeds compare rel paths),
    only RESOLUTION consults the base."""
    base = ((manifest or {}).get("file_bases") or {}).get(rel)
    return os.path.join(base or table_dir, rel)


def _data_paths(table_dir: str, manifest: dict | None, rels) -> list[str]:
    return [_data_path(table_dir, manifest, f) for f in rels]


def _tiled_data_paths(table_dir: str, manifest: dict | None, rels) -> list[str]:
    """Scan paths for the given manifest files, collapsed to whole COMMIT
    DIRECTORIES wherever the requested files are exactly a directory's
    physical parquet contents — checked by one driver-side listing per
    candidate dir, the same LIST the scan itself performs. Read planning
    then costs one LIST per commit dir instead of one stat per file (at
    100 TB: K object-store LISTs for a K-commit table instead of one
    round trip per data file, per plan build), and a many-file table
    usually stays under spark.sql.sources.parallelPartitionDiscovery.
    threshold (32) in dir form, skipping the parallel-listing Spark job
    that fires at every plan build above it. Any mismatch — a
    clone-resolved base, a pruned subset, a dir partially rewritten by
    DML — keeps those files as exact file paths: a missed collapse,
    never a wrong row. Commit dirs are immutable once published (every
    commit writes a fresh ``data-<uuid>`` dir), so the check cannot race
    a writer."""
    bases = (manifest or {}).get("file_bases") or {}
    out: list[str] = []
    by_dir: dict[str, list[str]] = {}
    order: list[tuple[str, object]] = []  # ("dir", d) / ("file", rel)
    for f in rels:
        if "/" in f and not bases.get(f):
            d = f.rsplit("/", 1)[0]
            if d not in by_dir:
                order.append(("dir", d))
            by_dir.setdefault(d, []).append(f)
        else:
            order.append(("file", f))
    for kind, item in order:
        if kind == "file":
            out.append(_data_path(table_dir, manifest, item))
            continue
        d = item
        fs = by_dir[d]
        dpath = os.path.join(table_dir, d)
        try:
            physical = sorted(
                f"{d}/{name}"
                for name in os.listdir(dpath)
                if name.endswith(".parquet")
            )
        except OSError:
            physical = None
        if physical is not None and physical == sorted(fs):
            out.append(dpath)
        else:
            out.extend(_data_path(table_dir, manifest, f) for f in fs)
    return out


# Txn index: every idempotent commit (each ``merge_upsert``, each MV
# refresh phase, every ``txn_id``-bearing DML) probes ``find_txn``, which
# used to stat-and-check one manifest per historical version per call —
# O(versions) metadata round trips at 100 TB, the last piece of the
# "production keeps a txn index" boundary (the parse side was already
# closed by the stat-validated manifest cache). The index maps txn id →
# version per table, built incrementally: only versions ABOVE the last
# call's anchor are read. The anchor is the (mtime_ns, size) fingerprint
# of the highest manifest already indexed — manifests are immutable once
# published, so an unchanged anchor means the versions at-or-below it
# are still the ones indexed (a table recreated at the same path changes
# the anchor and resets the entry). A HIT is re-verified through the
# stat-validated ``_read_manifest`` before being returned, so an
# out-of-band rewrite of that manifest (legacy-simulation tests) or a
# vacuumed version can never return a stale answer; a MISS trusts
# published-manifest immutability below the anchor exactly as every
# reader of a published manifest does.
_TXN_INDEX: "OrderedDict[str, tuple[int, int, int, dict[str, int]]]" = OrderedDict()
_TXN_INDEX_MAX = 512


def find_txn(table_dir: str, txn_id: str) -> int | None:
    """Version committed under ``txn_id``, or None — the idempotent-commit
    replay probe (a txn id appears in at most one manifest). Amortized
    O(new versions since the last call) instead of O(all versions); see
    ``_TXN_INDEX``."""
    tip = latest_version(table_dir)
    if tip is None:
        _TXN_INDEX.pop(table_dir, None)
        return None
    # fast path (round 13): the tip manifest carries the cumulative
    # txn→version map (publish_manifest writes it on every commit), so a
    # cold-process probe is ONE stat-validated tip parse instead of a
    # walk over all versions. The hit still re-verifies through the
    # named version's own manifest below, so vacuumed versions and
    # out-of-band rewrites behave exactly as the walk did. Manifests
    # without the key (legacy tables) fall through to the walk.
    tip_m = _read_manifest(table_dir, tip)
    tip_txns = tip_m.get("txns")
    if tip_txns is not None:
        v = tip_txns.get(txn_id)
        if v is None:
            return None
        try:
            if _read_manifest(table_dir, v).get("txn") == txn_id:
                return v
        except OSError:
            pass
        return None
    entry = _TXN_INDEX.get(table_dir)
    scanned, txns = -1, {}
    if entry is not None:
        e_scanned, e_mtime, e_size, e_txns = entry
        try:
            st = os.stat(_manifest_path(table_dir, e_scanned))
            if e_scanned <= tip and st.st_mtime_ns == e_mtime and st.st_size == e_size:
                scanned, txns = e_scanned, e_txns
        except OSError:
            pass  # anchor vacuumed or table recreated: rebuild from scratch
    if scanned < tip:
        for v in range(scanned + 1, tip + 1):
            mp = _manifest_path(table_dir, v)
            if not os.path.exists(mp):
                continue  # vacuumed gap
            t = _read_manifest(table_dir, v).get("txn")
            if t is not None:
                txns[t] = v
        try:
            st = os.stat(_manifest_path(table_dir, tip))
            _TXN_INDEX[table_dir] = (tip, st.st_mtime_ns, st.st_size, txns)
        except OSError:
            _TXN_INDEX.pop(table_dir, None)
    if table_dir in _TXN_INDEX:
        _TXN_INDEX.move_to_end(table_dir)
    while len(_TXN_INDEX) > _TXN_INDEX_MAX:
        _TXN_INDEX.popitem(last=False)
    v = txns.get(txn_id)
    if v is None:
        return None
    # hit verification: one stat-validated parse — exact under rewrites
    # and vacuum (the map may briefly hold entries for vacuumed versions;
    # they are never returned)
    try:
        if _read_manifest(table_dir, v).get("txn") == txn_id:
            return v
    except OSError:
        pass
    return None


def _file_stats(path: str) -> dict:
    """Per-file min/max/null-count from the parquet FOOTER — pure metadata,
    no data read: row-group statistics aggregated per top-level column.
    Only JSON-safe primitive stats are kept (int/float/str/bool); columns
    without usable statistics simply don't appear (and are never pruned
    on). Cost per commit is one footer read per NEW file, driver-side and
    bounded — the same metadata pass any lakehouse commit performs."""
    import pyarrow.parquet as pq

    md = pq.ParquetFile(path).metadata
    mins: dict = {}
    maxs: dict = {}
    nulls: dict = {}
    bad: set = set()  # any row group without usable stats disqualifies
    for rg in range(md.num_row_groups):
        row_group = md.row_group(rg)
        for ci in range(row_group.num_columns):
            col = row_group.column(ci)
            name = col.path_in_schema
            if "." in name:  # nested leaves: skip (prune on top-level only)
                continue
            st = col.statistics
            if st is None or not st.has_min_max:
                bad.add(name)
                continue
            try:
                mn, mx = st.min, st.max
            except Exception:
                # pyarrow can't materialize stats for every physical type
                # (e.g. FIXED_LEN_BYTE_ARRAY decimals raise
                # ArrowNotImplementedError) — such a column just never
                # prunes, same as any other stat-less column
                bad.add(name)
                continue
            if not isinstance(mn, (int, float, str, bool)) or isinstance(
                mn, bytes
            ):
                bad.add(name)
                continue
            nulls[name] = nulls.get(name, 0) + (st.null_count or 0)
            mins[name] = mn if name not in mins else min(mins[name], mn)
            maxs[name] = mx if name not in maxs else max(maxs[name], mx)
    out = {}
    for c in mins:
        if c not in bad:
            out[c] = {"min": mins[c], "max": maxs[c], "nulls": nulls.get(c, 0)}
    out["__rows"] = md.num_rows  # file row count: metadata-only COUNT(*)
    return out


def set_bloom_columns(spark: SparkSession, table_dir: str, cols: list[str]) -> int:
    """Declare per-file BLOOM FILTER columns (int/string keys): every
    later commit builds a small bloom over each new file's values for
    these columns, stored in the manifest beside the min/max stats.
    Blooms close the skipping gap min/max can't: on a hash-scattered
    layout every file's [min, max] spans the key domain, so a point
    lookup prunes nothing by range — but a key is genuinely IN only a
    few files, and the bloom proves definite absence for the rest.
    Publishing is a metadata-only version (existing files simply have no
    bloom yet — pruning stays conservative for them until a rewrite).
    Float columns are refused: binary-exact value canonicalization is
    only sound for integers and strings."""
    tip = latest_version(table_dir)
    if tip is None:
        raise FileNotFoundError(f"no snapshots in {table_dir!r}")
    manifest = _read_manifest(table_dir, tip)
    if manifest.get("schema") is not None:
        from pyspark.sql.types import StructType

        schema = StructType.fromJson(manifest["schema"])
        for c in cols:
            if c in schema.fieldNames() and schema[c].dataType.simpleString() in (
                "float",
                "double",
            ):
                raise ValueError(f"bloom column {c!r} is floating-point")
    # require_parent: a concurrent commit between read and publish would
    # otherwise race this metadata edit (same lost-update shape as DML)
    return publish_manifest(
        table_dir,
        [],
        mode="append",
        schema=manifest.get("schema"),
        # stored PHYSICAL: blooms are built by reading file columns
        bloom_cols=[_phys_col(manifest, c) for c in cols],
        require_parent=tip,
    )


_BLOOM_K = 5
_MERGE_BLOOM_PROBE_CAP = 5000  # max distinct update keys to bloom-probe


def _bloom_key(value) -> str | None:
    """Canonical bloom key for ``value``, or None when the value is not a
    supported EXACT key type. Strictly int (not bool) or str — a float
    probe like 5.0 or a bool like True is SQL-equal to int 5 / 1 but
    str()-canonicalizes differently ('5.0', 'True' vs '5', '1'), so
    probing it against an int-built bloom would wrongly prove absence
    and turn pruning into a filter. Such probes return None and fall
    through to the (type-coercing, conservative) min/max check."""
    if type(value) is bool:
        return None
    if isinstance(value, str):
        return value
    try:
        import numpy as np

        if isinstance(value, np.integer):
            return str(int(value))
        if isinstance(value, (np.floating, np.bool_)):
            return None
    except ImportError:
        pass
    if isinstance(value, int):
        return str(value)
    return None


def _bloom_hashes(key: str, m: int) -> list[int]:
    """k deterministic bit indexes for a canonical key (``_bloom_key``)
    via double hashing over the md5 halves."""
    import hashlib

    d = hashlib.md5(key.encode("utf-8")).digest()
    h1 = int.from_bytes(d[:8], "big")
    h2 = int.from_bytes(d[8:], "big") | 1
    return [(h1 + i * h2) % m for i in range(_BLOOM_K)]


def _file_bloom(path: str, col: str) -> dict | None:
    """Build the bloom for one column of one staged file: read just that
    column with pyarrow, size the bitmap at ~8 bits/distinct value
    (power of two, ≥8192 → fpp ≈ 3% at k=5), set k bits per value.
    Returns {"m": bits, "b64": bitmap} or None if the column is absent
    or non-key-typed."""
    import base64

    import pyarrow.parquet as pq

    pf = pq.ParquetFile(path)
    if col not in pf.schema_arrow.names:
        return None
    values = pf.read(columns=[col]).column(col)
    keys = [_bloom_key(v) for v in values.to_pylist() if v is not None]
    if any(k is None for k in keys):
        return None  # non-key-typed column (bool/float/...): no bloom
    m = 8192
    while m < 8 * max(1, len(set(keys))):
        m *= 2
    bits = bytearray(m // 8)
    for k in keys:
        for idx in _bloom_hashes(k, m):
            bits[idx // 8] |= 1 << (idx % 8)
    return {"m": m, "b64": base64.b64encode(bytes(bits)).decode("ascii")}


def _bloom_maybe_contains(bloom: dict, value) -> bool:
    """Maybe-present test; a value outside the canonical key domain
    returns True (cannot prove absence — conservative)."""
    import base64

    key = _bloom_key(value)
    if key is None:
        return True
    bits = base64.b64decode(bloom["b64"])
    return all(
        bits[idx // 8] & (1 << (idx % 8))
        for idx in _bloom_hashes(key, bloom["m"])
    )


_HLL_P = 9  # 2^9 = 512 registers: ±4.6% standard error, ~512 B/sketch


def _hll_add(regs: bytearray, key: str) -> None:
    """Fold one canonical key (``_bloom_key`` domain) into an HLL
    register array: md5-derived 64-bit hash, low ``_HLL_P`` bits pick
    the register, the rank of the remaining bits' leading 1 updates it.
    md5 keeps the sketch deterministic across processes and engines —
    the same property the blooms rely on."""
    import hashlib

    h = int.from_bytes(hashlib.md5(key.encode("utf-8")).digest()[:8], "big")
    idx = h & ((1 << _HLL_P) - 1)
    w = h >> _HLL_P
    rho = (64 - _HLL_P) - w.bit_length() + 1
    if rho > regs[idx]:
        regs[idx] = rho


def _hll_estimate(regs: bytearray) -> int:
    """Standard HyperLogLog estimate with the small-range linear-counting
    correction — the only two regimes these bounded sketches see."""
    import math

    m = len(regs)
    alpha = 0.7213 / (1 + 1.079 / m)
    est = alpha * m * m / sum(2.0 ** -r for r in regs)
    zeros = regs.count(0)
    if est <= 2.5 * m and zeros:
        est = m * math.log(m / zeros)
    return int(round(est))


def _hll_merge(sketches: list[dict]) -> bytearray:
    """Union of HLL sketches = element-wise register max — EXACTLY the
    sketch that would have been built over the concatenated inputs,
    which is what makes per-file sketches composable into table-level
    statistics without rescanning anything."""
    import base64

    merged = bytearray(1 << _HLL_P)
    for sk in sketches:
        if sk.get("p") != _HLL_P:
            # a sketch from a different precision cannot union with
            # these registers; callers treat the column as uncovered
            raise ValueError(f"ndv sketch precision {sk.get('p')} != {_HLL_P}")
        regs = base64.b64decode(sk["b64"])
        for i, r in enumerate(regs):
            if r > merged[i]:
                merged[i] = r
    return merged


def _file_ndv(path: str, col: str) -> dict | None:
    """HLL distinct-count sketch for one column of one staged file: read
    just that column, canonicalize like the blooms (int/str only — a
    float NDV column is refused at declaration), fold the DISTINCT
    values. Returns {"p": precision, "b64": registers} or None when the
    column is absent or non-key-typed."""
    import base64

    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    pf = pq.ParquetFile(path)
    if col not in pf.schema_arrow.names:
        return None
    values = pc.unique(pf.read(columns=[col]).column(col))
    regs = bytearray(1 << _HLL_P)
    for v in values.to_pylist():
        if v is None:
            continue
        key = _bloom_key(v)
        if key is None:
            return None  # non-key-typed column: no sketch
        _hll_add(regs, key)
    return {"p": _HLL_P, "b64": base64.b64encode(bytes(regs)).decode("ascii")}


def set_ndv_columns(spark: SparkSession, table_dir: str, cols: list[str]) -> int:
    """Declare per-file NDV (HyperLogLog) SKETCH columns: every later
    commit folds each new file's distinct values for these columns into
    a 512-register HLL stored beside the min/max stats. What blooms are
    to point lookups, NDV sketches are to CARDINALITY questions the
    bounds can't answer: ``table_stats_summary`` union-merges them into
    an approximate table distinct count with zero I/O, and merge
    targeting consults the per-file/table NDV ratio to decide whether
    bloom-probing can prune at all (``_key_overlap_factor`` — on a
    layout where every file holds most key values, probing is pure
    overhead). Publishing is a metadata-only version; pre-declaration
    files simply have no sketch yet (consumers stay conservative).
    Float columns are refused, same canonicalization contract as the
    blooms."""
    tip = latest_version(table_dir)
    if tip is None:
        raise FileNotFoundError(f"no snapshots in {table_dir!r}")
    manifest = _read_manifest(table_dir, tip)
    if manifest.get("schema") is not None:
        from pyspark.sql.types import StructType

        schema = StructType.fromJson(manifest["schema"])
        for c in cols:
            if c in schema.fieldNames() and schema[c].dataType.simpleString() in (
                "float",
                "double",
            ):
                raise ValueError(f"ndv sketch column {c!r} is floating-point")
    return publish_manifest(
        table_dir,
        [],
        mode="append",
        schema=manifest.get("schema"),
        # stored PHYSICAL: sketches are built by reading file columns
        ndv_cols=[_phys_col(manifest, c) for c in cols],
        require_parent=tip,
    )


def approx_distinct_count(
    table_dir: str, col: str, version: int | None = None
) -> int | None:
    """Approximate table-level distinct count for a declared NDV column,
    union-merged from the per-file sketches — zero I/O beyond the
    manifest read. None when any file lacks the sketch (a partial union
    is only a lower bound, and this surface doesn't return guesses) or
    when deletes are pending (removed rows may have held distinct
    values; compaction restores the answer)."""
    tip = latest_version(table_dir)
    if tip is None:
        raise FileNotFoundError(f"no snapshots in {table_dir!r}")
    manifest = _read_manifest(table_dir, tip if version is None else version)
    if manifest.get("dv_counts") or manifest.get("eq_deletes"):
        return None
    stats = manifest.get("stats") or {}
    col = _phys_col(manifest, col)  # sketches key on physical names
    sketches = [
        (stats.get(f) or {}).get(col, {}).get("ndv") for f in manifest["files"]
    ]
    if not sketches or any(s is None for s in sketches):
        return None
    try:
        return _hll_estimate(_hll_merge(sketches))
    except ValueError:
        return None  # mixed precisions: treat as uncovered


def _key_overlap_factor(manifest: dict, col: str) -> float | None:
    """How many files the average key value appears in, estimated purely
    from the per-file NDV sketches: Σ_f ndv(f) / ndv(union). ≈1 means
    the files PARTITION the key space (a clustered/bucketed layout —
    per-key pruning like bloom probing works); ≈|files| means every key
    is in every file (probing can prune nothing). None when any file
    lacks a sketch. ``col`` is logical; sketches key on physical."""
    stats = manifest.get("stats") or {}
    col = _phys_col(manifest, col)
    sketches = [
        (stats.get(f) or {}).get(col, {}).get("ndv") for f in manifest["files"]
    ]
    if not sketches or any(s is None for s in sketches):
        return None
    try:
        union = _hll_estimate(_hll_merge(sketches))
    except ValueError:
        return None  # mixed precisions: treat as uncovered
    if union <= 0:
        return None
    return sum(_hll_estimate(_hll_merge([s])) for s in sketches) / union


def _stats_exclude(stats: dict, col: str, op: str, value) -> bool:
    """True iff the file's [min, max] PROVES no row satisfies
    ``col op value``. Unknown columns/ops keep the file — pruning is an
    optimization, never a filter."""
    cs = stats.get(col)
    if cs is None:
        return False
    if cs.get("bloom") is not None and op in ("=", "in"):
        vals = value if op == "in" else (value,)
        try:
            if all(not _bloom_maybe_contains(cs["bloom"], v) for v in vals):
                return True  # definite absence for every probed key
        except Exception:
            pass  # malformed bloom: fall through to range check
    if "min" not in cs:
        return False
    mn, mx = cs["min"], cs["max"]
    try:
        if op == "=":
            return value < mn or value > mx
        if op == "in":
            return all(v < mn or v > mx for v in value)
        if op == ">":
            return mx <= value
        if op == ">=":
            return mx < value
        if op == "<":
            return mn >= value
        if op == "<=":
            return mn > value
    except TypeError:
        return False  # incomparable types (schema drift): keep the file
    return False


def _commit_stats(table_dir: str, rel_paths) -> dict:
    """Per-file stats for a commit's new files: footer min/max/nulls
    always, plus blooms for the table's declared bloom columns (one
    column read per file per bloom col — proportional to the COMMIT, the
    same cost contract as the footer pass)."""
    tip = latest_version(table_dir)
    bloom_cols: list = []
    ndv_cols: list = []
    if tip is not None:
        tip_manifest = _read_manifest(table_dir, tip)
        bloom_cols = tip_manifest.get("bloom_cols") or []
        ndv_cols = tip_manifest.get("ndv_cols") or []
    out = {}
    for f in rel_paths:
        p = os.path.join(table_dir, f)
        st = _file_stats(p)
        for c in bloom_cols:
            bl = _file_bloom(p, c)
            if bl is not None:
                st.setdefault(c, {})["bloom"] = bl
        for c in ndv_cols:
            sk = _file_ndv(p, c)
            if sk is not None:
                st.setdefault(c, {})["ndv"] = sk
        out[f] = st
    return out


def prune_files(manifest: dict, predicates: list[tuple]) -> list[str]:
    """Manifest-level data skipping: the files of ``manifest`` that MIGHT
    contain a row satisfying every ``(col, op, value)`` predicate
    (op ∈ =, <, <=, >, >=; conjunctive). Files without stats always
    survive. Pure driver-side metadata — the 100 TB point: a selective
    scan plans against the manifest's stats and never LISTS, let alone
    reads, the excluded files, exactly the Iceberg/Delta skipping model.
    Predicates name LOGICAL columns; stats are keyed by the files'
    PHYSICAL names — translated here, the one prune boundary. Tables
    with a declared PARTITION SPEC prune on the recorded per-file
    partition tuples first (exact membership, stronger than min/max on
    clustered layouts), then fall through to the stats."""
    stats = manifest.get("stats") or {}
    spec = manifest.get("partition_spec") or []
    predicates = _phys_predicates(manifest, predicates)
    return [
        f
        for f in manifest["files"]
        if not any(
            _pvals_exclude(
                (stats.get(f) or {}).get("__pvals"), spec, c, op, v
            )
            or _stats_exclude(stats.get(f, {}), c, op, v)
            for (c, op, v) in predicates
        )
    ]


def scan_snapshot(
    spark: SparkSession,
    table_dir: str,
    predicates: list[tuple],
    version: int | None = None,
) -> DataFrame:
    """Predicate-pruned snapshot read: ``prune_files`` drops files whose
    stats exclude the conjunction, the survivors read under the declared
    schema, and the SAME predicates re-apply as DataFrame filters (the
    stats prune is file-granular; row exactness stays with the engine).
    Equivalent rows to ``read_snapshot(...).filter(...)`` always —
    including under deletion vectors (the survivors read routes through
    the DV anti-join; stats pruning stays sound because DVs only shrink
    a file's live content)."""
    from pyspark.sql.types import StructType

    tip = latest_version(table_dir)
    if tip is None:
        raise FileNotFoundError(f"no snapshots in {table_dir!r}")
    version = tip if version is None else version
    manifest = _read_manifest(table_dir, version)
    survivors = prune_files(manifest, predicates)
    if not survivors:
        # provably empty: an empty frame with the version's schema
        if manifest.get("schema") is not None:
            schema = StructType.fromJson(manifest["schema"])
            return spark.createDataFrame([], schema)
        return spark.read.parquet(
            os.path.join(table_dir, manifest["files"][0])
        ).limit(0)
    df = _read_data_files(spark, table_dir, manifest, survivors)
    return df.filter(_predicate_match(predicates))


def _check_constraints(df: DataFrame, constraints: dict | None) -> None:
    """Enforce the table's CHECK constraints on ``df`` (the rows being
    committed): one aggregate pass counting violations of every
    constraint at once. SQL CHECK semantics — a row violates only when
    the expression is FALSE; NULL/UNKNOWN passes. Raises with the
    per-constraint violation counts; the caller's staged files become
    vacuum debris, the table is untouched."""
    if not constraints:
        return
    from pyspark.sql import functions as F

    row = df.agg(
        *[
            F.sum(
                F.when(~F.coalesce(F.expr(e), F.lit(True)), 1).otherwise(0)
            ).alias(n)
            for n, e in constraints.items()
        ]
    ).collect()[0]
    bad = {n: int(row[n]) for n in constraints if (row[n] or 0) > 0}
    if bad:
        raise ValueError(f"CHECK constraint violation (rows per constraint): {bad}")


def _constraint_observation(
    df: DataFrame, constraints: dict | None, table_schema: dict | None = None
):
    """Attach the CHECK-violation counters to ``df`` as an Observation so
    the commit's WRITE job computes them in-stream — the staged files are
    then never re-read for validation (at scale that re-read is a second
    full pass over every rewritten byte). Returns ``(df, observation)``;
    the observation is ``None`` — keeping the read-back path — when the
    table has no constraints, when a constraint does not resolve against
    ``df``'s columns (an append narrower than the evolved table schema:
    the missing column must evaluate as NULL, which only the table-schema
    staged read provides), or when ``table_schema`` declares a DIFFERENT
    type than ``df`` carries for any shared column (a widened table fed a
    narrower append: SQL CHECK evaluates under the TABLE's types, and
    e.g. integer arithmetic that overflows under the narrow type but not
    the wide one would otherwise make the two paths disagree). Counters
    use the same expression shape as ``_check_constraints`` (violate only
    on FALSE; NULL passes), so whenever the observation IS used the two
    paths cannot diverge."""
    if not constraints:
        return df, None
    from pyspark.sql import Observation
    from pyspark.sql import functions as F

    if table_schema is not None:
        declared = {
            f["name"]: f["type"] for f in table_schema.get("fields", [])
        }
        for f in df.schema.fields:
            want = declared.get(f.name)
            if want is not None and want != f.dataType.jsonValue():
                return df, None
    try:
        # resolution probe (driver-side analysis only, no job): raises
        # when a referenced column is absent from this commit's frame
        df.select(*[F.expr(e) for e in constraints.values()])
    except Exception:
        return df, None
    obs = Observation(f"chk-{uuid.uuid4().hex[:8]}")
    return (
        df.observe(
            obs,
            *[
                F.sum(
                    F.when(~F.coalesce(F.expr(e), F.lit(True)), 1).otherwise(0)
                ).alias(n)
                for n, e in constraints.items()
            ],
        ),
        obs,
    )


def _raise_observed_violations(obs, constraints: dict) -> None:
    """The post-write half of ``_constraint_observation``: read the
    observed counters (already computed by the write job) and fail the
    commit exactly like ``_check_constraints`` — before the manifest
    publishes, staged files become vacuum debris."""
    row = obs.get
    bad = {n: int(row[n]) for n in constraints if (row.get(n) or 0) > 0}
    if bad:
        raise ValueError(f"CHECK constraint violation (rows per constraint): {bad}")


def add_constraint(
    spark: SparkSession, table_dir: str, name: str, expr: str
) -> int:
    """Attach a named CHECK constraint (a SQL boolean expression over the
    table's columns) — the Delta `ALTER TABLE ADD CONSTRAINT` shape. The
    CURRENT data validates first (one aggregate pass; a violating add is
    refused), then a metadata-only version publishes carrying the
    constraint; every later commit — append, merge, delete, update —
    validates exactly its NEW/rewritten rows against the table's
    constraints before its manifest publishes, so committed data always
    satisfies them without ever re-scanning old files."""
    tip = latest_version(table_dir)
    if tip is None:
        raise FileNotFoundError(f"no snapshots in {table_dir!r}")
    manifest = _read_manifest(table_dir, tip)
    merged = {**(manifest.get("constraints") or {}), name: expr}
    _check_constraints(read_snapshot(spark, table_dir, tip), {name: expr})
    # require_parent: the merged map was computed from THIS tip; a
    # concurrent add_constraint would otherwise be silently dropped
    return publish_manifest(
        table_dir,
        [],
        mode="append",
        schema=manifest.get("schema"),
        constraints=merged,
        require_parent=tip,
    )


def drop_constraint(table_dir: str, name: str) -> int:
    """Detach a named CHECK constraint — the Delta `ALTER TABLE DROP
    CONSTRAINT` shape, and the documented prerequisite for
    ``drop_column`` on a constrained column. Metadata-only: one
    manifest publishes the remaining constraint map (an empty map
    clears the table's constraint metadata entirely); existing data is
    untouched and later commits simply stop validating the dropped
    rule. Unknown names raise — silently 'dropping' a typo would leave
    the caller believing a real constraint was removed."""
    tip = latest_version(table_dir)
    if tip is None:
        raise FileNotFoundError(f"no snapshots in {table_dir!r}")
    manifest = _read_manifest(table_dir, tip)
    have = dict(manifest.get("constraints") or {})
    if name not in have:
        raise ValueError(
            f"no CHECK constraint named {name!r} on this table "
            f"(have: {sorted(have) or 'none'})"
        )
    del have[name]
    return publish_manifest(
        table_dir,
        [],
        mode="append",
        schema=manifest.get("schema"),
        constraints=have,
        require_parent=tip,
    )


def snapshot_commit(
    df: DataFrame,
    table_dir: str,
    *,
    mode: str = "append",
    txn_id: str | None = None,
    require_parent: int | None = None,
    change: dict | None = None,
    partition_by: list | None = None,
) -> int:
    """Commit ``df`` as a new table version and return it.

    Data files land under a uuid'd subdirectory first (invisible to every
    reader — nothing references them yet), then the manifest naming the
    version's COMPLETE file set (previous files + new for ``append``, new
    only for ``overwrite``) is published with an exclusive create. A
    concurrent committer racing for the same version number loses the
    create and retries against the new tip, re-reading the parent file
    set — append semantics compose under the race, which is exactly what
    a listing-coupled write cannot offer. Crash before the manifest
    publish leaves only unreferenced files (reclaimed by ``vacuum``),
    never a half-visible table.

    ``txn_id`` makes the commit IDEMPOTENT: if any manifest already
    carries the id, that version is returned without writing — the
    Delta-style contract that lets a streaming ``foreachBatch`` replay an
    epoch after a crash without duplicating rows (the checkpoint replays
    the batch; the txn check makes the replay a no-op). The id is checked
    again inside the publish loop, so even two racing replays of the same
    epoch commit exactly once.

    The commit records ``df``'s schema in the manifest; an append whose
    df carries NEW columns widens the table schema (add-column
    evolution, ``_merge_schema``) — readers of the new version see the
    new column as NULL for pre-evolution files, old versions read their
    own schema unchanged."""
    if txn_id is not None:
        done = find_txn(table_dir, txn_id)
        if done is not None:
            return done
    pre_tip = latest_version(table_dir)
    pre_manifest = None if pre_tip is None else _read_manifest(table_dir, pre_tip)
    # physical column mapping: existing fields write under the table's
    # assigned physical names; NEW fields mint (identity unless the name
    # is tombstoned — re-add-after-drop gets a fresh physical, so old
    # files' bytes can never resurrect). A full overwrite resets to
    # identity: its files own every value.
    phys = _commit_phys(
        pre_manifest, df.schema.fieldNames(), reset=(mode == "overwrite")
    )
    # partition spec: ``partition_by`` declares it (first commit, or an
    # overwrite — Iceberg-style evolution: later files follow the new
    # spec, retained metadata keeps old files' tuples); appends inherit
    # the table's. Spec entries store PHYSICAL names (rename-proof).
    spec_param: list | None = None
    inherited_spec = (pre_manifest or {}).get("partition_spec") or []
    if partition_by is not None:
        norm = _norm_partition_by(partition_by)
        missing = [e["col"] for e in norm if e["col"] not in df.columns]
        if missing:
            raise ValueError(f"partition columns not in the commit: {missing}")
        for e in norm:
            tn = df.schema[e["col"]].dataType.typeName()
            ok = (
                tn in ("date", "timestamp", "timestamp_ntz")
                if e["kind"] == "day"
                else tn in ("byte", "short", "integer", "long", "string")
            )
            if not ok:
                raise ValueError(
                    f"partition transform {e['kind']!r} does not support "
                    f"column {e['col']!r} of type {tn} (day needs "
                    "date/timestamp; identity/bucket need int/string — "
                    "the same exactness contract as the blooms)"
                )
        spec_param = [
            {**e, "col": phys.get(e["col"], e["col"])} for e in norm
        ]
        if (
            mode == "append"
            and inherited_spec
            and spec_param != inherited_spec
        ):
            raise ValueError(
                "an append cannot change the partition spec — evolve it "
                "first with set_partition_spec (metadata-only) or a "
                "mode='overwrite' commit"
            )
        active_spec = spec_param
    else:
        # no declaration: appends AND plain overwrites keep the table's
        # spec (publish inherits when the param stays None)
        active_spec = inherited_spec
        if mode == "overwrite" and inherited_spec:
            # a full overwrite resets the physical mapping to identity,
            # so the carried spec must follow: old-physical → logical
            # (which IS the new physical). Recorded explicitly so the
            # published manifest's spec matches its own files.
            pre_inv = _inv_phys(pre_manifest)
            active_spec = [
                {**e, "col": pre_inv.get(e["col"], e["col"])}
                for e in inherited_spec
            ]
            spec_param = active_spec
    inv = {p: l for l, p in phys.items()}
    write_df = df
    if active_spec and all(
        inv.get(e["col"], e["col"]) in df.columns for e in active_spec
    ):
        # cluster the commit on the transform tuple so files stay
        # tuple-tight — files that still straddle tuples just record
        # more of them (pruning is tuple-exact either way). The explicit
        # partition count keeps AQE from coalescing the clustering
        # shuffle back into one mixed file; empty buckets write nothing.
        n_part = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions"))
        write_df = df.repartition(
            n_part,
            *[
                _transform_expr(e, inv.get(e["col"], e["col"]))
                for e in active_spec
            ],
        )
    # validation happens IN the write job when possible: the violation
    # counters ride the write as an Observation over the same rows, so
    # the staged files are never re-read (one full pass saved per
    # constrained commit). The pre-write constraint set must match the
    # post-write tip's for the observed counters to be authoritative —
    # any drift (a concurrent commit changed constraints mid-write)
    # falls back to the exact staged-read validation below.
    write_df, chk_obs = _constraint_observation(
        write_df,
        (pre_manifest or {}).get("constraints"),
        table_schema=(pre_manifest or {}).get("schema"),
    )
    commit_dir = os.path.join(table_dir, f"data-{uuid.uuid4().hex[:12]}")
    _to_physical_df(write_df, phys).write.parquet(commit_dir)
    new_files = sorted(
        os.path.join(os.path.basename(commit_dir), f)
        for f in os.listdir(commit_dir)
        if f.endswith(".parquet")
    )
    tip = latest_version(table_dir)
    if tip is not None:
        # validate exactly the NEW rows against table constraints, under
        # the TABLE's widened schema: an append narrower than the
        # evolved table must evaluate a constraint on the missing column
        # as NULL (SQL CHECK passes), not fail resolution. Constraints
        # are LOGICAL expressions: the staged files hold physical names,
        # so declare physical and alias back before checking.
        tip_manifest = _read_manifest(table_dir, tip)
        tip_constraints = tip_manifest.get("constraints")
        if chk_obs is not None and tip == pre_tip:
            # the write job already counted violations over these rows
            _raise_observed_violations(chk_obs, tip_constraints or {})
        elif tip_constraints:
            staged = df.sparkSession.read
            table_schema = _merge_schema(
                tip_manifest.get("schema"), df.schema.jsonValue()
            )
            table_phys = {**_phys_map(tip_manifest), **phys}
            if table_schema is not None:
                staged = staged.schema(
                    _physical_struct(table_schema, table_phys)
                )
            staged_df = staged.parquet(commit_dir)
            inv = {p: l for l, p in table_phys.items()}
            from pyspark.sql import functions as F

            staged_df = staged_df.select(
                *[F.col(c).alias(inv.get(c, c)) for c in staged_df.columns]
            )
            _check_constraints(staged_df, tip_constraints)
    new_stats = _commit_stats(table_dir, new_files)
    if active_spec:
        pvals = _compute_pvals(
            df.sparkSession, table_dir, new_files, active_spec,
            schema=_physical_struct(df.schema.jsonValue(), phys),
        )
        for f, tuples in pvals.items():
            new_stats.setdefault(f, {})["__pvals"] = tuples
    return publish_manifest(
        table_dir,
        new_files,
        mode=mode,
        txn_id=txn_id,
        schema=df.schema.jsonValue(),
        new_stats=new_stats,
        require_parent=require_parent,
        change=change,
        phys=phys,
        partition_spec=spec_param,
    )


def _position_delete_targets(table_dir: str, delete_files: list[str]) -> set[str]:
    """Distinct data files named by a set of position-delete parquet
    files — one bounded single-column read per delete file."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    targeted: set[str] = set()
    for f in delete_files:
        col = pq.read_table(
            os.path.join(table_dir, f), columns=["file"]
        ).column("file")
        targeted.update(pc.unique(col).to_pylist())
    return targeted


def publish_manifest(
    table_dir: str,
    new_files: list[str],
    *,
    mode: str = "append",
    txn_id: str | None = None,
    schema: dict | None = None,
    base_files: list[str] | None = None,
    new_stats: dict | None = None,
    constraints: dict | None = None,
    bloom_cols: list | None = None,
    ndv_cols: list | None = None,
    dropped_cols: list | None = None,
    replace_schema: bool = False,
    require_parent: int | None = None,
    delete_files: list[str] | None = None,
    dv_counts: dict | None = None,
    eq_deletes: list | None = None,
    change: dict | None = None,
    phys: dict | None = None,
    partition_spec: list | None = None,
    file_bases: dict | None = None,
) -> int:
    """The commit protocol proper, decoupled from HOW the data files were
    written (``snapshot_commit`` writes them with a DataFrame write; the
    ``snapshot_table`` custom sink's executor tasks write them with
    pyarrow and hand the names here). ``new_files`` are table-relative
    paths that already exist on disk; this publishes the manifest making
    them visible, with the exclusive-create/retry/txn semantics described
    on ``snapshot_commit``.

    ``schema`` (a StructType.jsonValue dict) is recorded in the manifest;
    appends merge it with the parent's via ``_merge_schema`` (re-merged
    against the CURRENT tip on every retry of the race loop, so a
    concurrent evolution composes). ``base_files`` (overwrite mode only)
    lets a copy-on-write commit RETAIN named parent files alongside the
    new ones — the MERGE primitive: the published set is base + new.

    ``require_parent`` is the optimistic-concurrency guard for REWRITE
    commits: if the tip is no longer that version at publish time, raise
    ``SnapshotConflictError`` instead of retrying — the commit's
    retained-file list was computed against the stale tip and publishing
    would lose the concurrent commit's changes. Appends never need it.

    ``new_stats`` maps each new file to its footer min/max stats
    (``_file_stats``); the manifest carries per-file stats forward
    (appends extend the parent's, retained base files keep theirs) so
    ``prune_files``/``scan_snapshot`` can skip files at plan time.

    DELETION VECTORS (merge-on-read): mode ``"delete"`` publishes a
    version whose DATA file set is the parent's verbatim plus new
    position-delete files (``delete_files`` — table-relative parquet of
    (file, pos) rows; ``dv_counts`` maps each data file to its newly
    deleted row count, summed with the parent's). ``append`` inherits
    the parent's DV set untouched (new files have no deleted rows);
    ``overwrite`` CLEARS it unless the caller passes ``delete_files`` /
    ``dv_counts`` explicitly (a copy-on-write rewrite that retains
    base files must carry their still-pending DVs — `_commit_rewrite`
    does). Stats stay sound under DVs: a deleted row only SHRINKS a
    file's live content, so footer min/max remain correct bounds for
    pruning (they may fail to prune a file whose matches are all
    deleted — a perf miss, never a wrong row).

    EQUALITY DELETES (``eq_deletes``) are the second merge-on-read form
    (Iceberg v2 equality deletes): each entry is
    ``{"key_cols": [...], "delete_files": [...], "files": [...]}``
    (plus ``key_schema``, the written key struct, since it was added —
    readers declare it instead of re-reading a key-file footer per
    entry at plan time) — key rows recorded as parquet, applied by
    readers as a key anti-join
    but ONLY to the entry's ``files`` (the data files present when the
    delete committed), which is what scopes the delete to rows that
    EXISTED at delete time: later appends of the same key are new rows
    and stay visible. ``delete`` mode appends entries to the parent's;
    ``append`` inherits them verbatim (the new files are absent from
    every entry's scope); ``overwrite`` clears them unless the caller
    carries them (``_commit_rewrite`` intersects each entry's scope with
    the retained files)."""
    if mode not in ("append", "overwrite", "delete"):
        raise ValueError(f"unsupported snapshot mode: {mode!r}")
    if base_files and mode != "overwrite":
        raise ValueError("base_files is a copy-on-write overwrite feature")
    if mode == "append" and (delete_files or dv_counts or eq_deletes):
        raise ValueError("appends never add deletion vectors")
    if mode == "delete" and new_files:
        raise ValueError("a delete commit adds no data files")
    if mode == "delete" and not (delete_files or eq_deletes):
        raise ValueError("a delete commit needs position or equality deletes")
    if mode == "delete" and delete_files:
        # the reader's delete-free fast path (snapshot_source routes a
        # file through the DV anti-join ONLY when dv_counts says it has
        # deleted rows) depends on this invariant: a position-delete
        # commit whose counts don't cover its targeted files would make
        # readers silently skip those deletes. Enforce at the protocol
        # boundary — one bounded column read of the new position files
        # (the `file` column only), the same order of work the commit's
        # own stats pass already did.
        targeted = _position_delete_targets(table_dir, delete_files)
        uncovered = sorted(
            f for f in targeted if not (dv_counts or {}).get(f)
        )
        if uncovered:
            raise ValueError(
                "position-delete commit lacks dv_counts entries for the "
                f"files its delete set targets: {uncovered} — readers key "
                "the merge-on-read path off dv_counts, so an uncovered "
                "file would silently keep its deleted rows"
            )
    os.makedirs(os.path.join(table_dir, _SNAPDIR), exist_ok=True)
    while True:
        tip = latest_version(table_dir)
        if txn_id is not None:
            done = find_txn(table_dir, txn_id)
            if done is not None:
                return done  # a racing twin of this txn won; our files
                # are orphans until vacuum(clean_orphans=True)
        if require_parent is not None and tip != require_parent:
            raise SnapshotConflictError(
                f"tip moved to v{tip} since this rewrite read v{require_parent}; "
                "re-run the operation against the new tip"
            )
        version = 0 if tip is None else tip + 1
        out_schema = schema
        out_stats = dict(new_stats or {})
        # table-level metadata (constraints) inherits across every commit
        # kind unless this publish explicitly replaces it
        out_constraints = constraints
        out_bloom_cols = bloom_cols
        out_ndv_cols = ndv_cols
        out_dropped = dropped_cols
        tip_manifest = None if tip is None else _read_manifest(table_dir, tip)
        if tip_manifest is not None:
            if out_constraints is None:
                out_constraints = tip_manifest.get("constraints")
            if out_bloom_cols is None:
                out_bloom_cols = tip_manifest.get("bloom_cols")
            if out_ndv_cols is None:
                out_ndv_cols = tip_manifest.get("ndv_cols")
            if out_dropped is None:
                out_dropped = tip_manifest.get("dropped_cols")
        # partition spec inherits like constraints; [] explicitly clears
        out_pspec = partition_spec
        if out_pspec is None and tip_manifest is not None:
            out_pspec = tip_manifest.get("partition_spec")
        # physical column mapping: the caller's map names what its FILES
        # actually contain, so a disagreement with the (possibly moved)
        # tip's assignment is a real write conflict, not something a
        # retry loop may paper over. None inherits the tip's map
        # (metadata-only commits); {} resets to identity (full
        # overwrite: the new files own every value).
        tip_phys = _phys_map(tip_manifest)
        if phys is None:
            out_phys = dict(tip_phys)  # inherit (plain metadata commits)
        elif new_files and (mode != "overwrite" or base_files):
            # files exist on disk under the caller's map: a tip that
            # remapped a shared logical name since is a real write
            # conflict, not something the retry loop may paper over
            for l, p in phys.items():
                if l in tip_phys and tip_phys[l] != p:
                    raise SnapshotConflictError(
                        f"column {l!r} was remapped to physical "
                        f"{tip_phys[l]!r} since this commit's files "
                        f"were written under {p!r} — re-run against "
                        "the new tip"
                    )
            out_phys = {**tip_phys, **phys}
        else:
            # authoritative replace: a full overwrite's files own every
            # value (identity reset), and metadata-only commits
            # (rename/drop/restore) publish their exact map
            out_phys = dict(phys)
        out_phys = _strip_identity(out_phys)
        out_deletes = list(delete_files or [])
        out_dvc = dict(dv_counts or {})
        out_eq = list(eq_deletes or [])
        if mode == "append" and tip_manifest is not None:
            files = tip_manifest["files"] + new_files
            out_schema = (
                schema
                if replace_schema
                else _merge_schema(tip_manifest.get("schema"), schema)
            )
            out_stats = {**(tip_manifest.get("stats") or {}), **out_stats}
            out_deletes = list(tip_manifest.get("delete_files") or [])
            out_dvc = dict(tip_manifest.get("dv_counts") or {})
            out_eq = list(tip_manifest.get("eq_deletes") or [])
        elif mode == "delete":
            if tip_manifest is None:
                raise FileNotFoundError(f"no snapshots in {table_dir!r}")
            files = list(tip_manifest["files"])
            if out_schema is None:
                out_schema = tip_manifest.get("schema")
            out_stats = dict(tip_manifest.get("stats") or {})
            out_deletes = list(tip_manifest.get("delete_files") or []) + out_deletes
            parent_dvc = dict(tip_manifest.get("dv_counts") or {})
            for f, n in (dv_counts or {}).items():
                parent_dvc[f] = parent_dvc.get(f, 0) + n
            out_dvc = parent_dvc
            out_eq = list(tip_manifest.get("eq_deletes") or []) + out_eq
        else:
            files = list(base_files or []) + list(new_files)
            if base_files and tip_manifest is not None:
                parent_stats = tip_manifest.get("stats") or {}
                out_stats.update(
                    {f: parent_stats[f] for f in base_files if f in parent_stats}
                )
            if not base_files and out_dropped and out_schema is not None:
                # a FULL overwrite references no pre-drop files, so a
                # reintroduced PHYSICAL name carries no resurrection
                # hazard — the new files own every value. Clear its
                # tombstone (CoW rewrites keep base_files and the guard).
                reintroduced = {
                    out_phys.get(f["name"], f["name"])
                    for f in out_schema["fields"]
                }
                out_dropped = [
                    c for c in out_dropped if c not in reintroduced
                ] or None
        if out_schema is not None:
            # the map describes exactly the current schema's fields;
            # entries for dropped/renamed-away logical names are dead
            out_phys = {
                l: p
                for l, p in out_phys.items()
                if l in {f["name"] for f in out_schema["fields"]}
            }
        if out_dropped and out_schema is not None:
            # physical column mapping invariant: no schema field may
            # RESOLVE to a tombstoned physical name — a file written
            # before the DROP still holds those bytes, so reading them
            # under a re-added logical name would resurrect old values.
            # Callers that mint via _commit_phys/_mint_physical never
            # trip this; it guards direct publish_manifest misuse.
            conflict = sorted(
                {
                    out_phys.get(f["name"], f["name"])
                    for f in out_schema["fields"]
                }
                & set(out_dropped)
            )
            if conflict:
                raise ValueError(
                    f"physical column(s) {conflict} are tombstoned (dropped "
                    "while retained files still hold their bytes) — re-adding "
                    "a column must mint a fresh physical name "
                    "(_commit_phys), or restore a pre-drop version"
                )
        # shallow-clone file bases (rel path → foreign base dir) follow
        # their files: retained files keep their entry, files no longer
        # referenced (rewritten locally) drop it — a clone becomes
        # self-contained exactly as fast as its data rewrites
        out_bases = dict(file_bases or {})
        if tip_manifest is not None:
            parent_bases = tip_manifest.get("file_bases") or {}
            out_bases = {**parent_bases, **out_bases}
        out_bases = {f: b for f, b in out_bases.items() if f in set(files)}
        # cumulative txn→version index (round 13): every manifest carries
        # the full retained txn-id map, so find_txn is O(1) round trips
        # even in a cold process (production formats keep this in
        # checkpoint metadata). A legacy parent without the key seeds the
        # map with one walk — the same walk find_txn's fallback pays per
        # process today, paid once here and never again for this table.
        # Entries are (id → version) pairs: growth is bytes per commit.
        if tip_manifest is not None:
            parent_txns = tip_manifest.get("txns")
            if parent_txns is None:
                parent_txns = {}
                for v_ in range(0, tip + 1):
                    if not os.path.exists(_manifest_path(table_dir, v_)):
                        continue  # vacuumed gap
                    t_ = _read_manifest(table_dir, v_).get("txn")
                    if t_ is not None:
                        parent_txns[t_] = v_
            out_txns = dict(parent_txns)
        else:
            out_txns = {}
        if txn_id is not None:
            out_txns[txn_id] = version
        manifest = {
            "version": version,
            "parent": tip,
            "op": mode,
            "files": files,
        }
        if out_bases:
            manifest["file_bases"] = out_bases
        if out_deletes:
            manifest["delete_files"] = out_deletes
        if out_dvc:
            manifest["dv_counts"] = out_dvc
        if out_eq:
            manifest["eq_deletes"] = out_eq
        if out_schema is not None:
            manifest["schema"] = out_schema
        if out_stats:
            manifest["stats"] = out_stats
        if out_constraints:
            manifest["constraints"] = out_constraints
        if out_bloom_cols:
            manifest["bloom_cols"] = out_bloom_cols
        if out_ndv_cols:
            manifest["ndv_cols"] = out_ndv_cols
        if out_dropped:
            manifest["dropped_cols"] = out_dropped
        if out_phys:
            manifest["phys"] = out_phys
        if out_pspec:
            manifest["partition_spec"] = out_pspec
        if change is not None:
            manifest["change"] = change
        if txn_id is not None:
            manifest["txn"] = txn_id
        # always present on new manifests (even empty): the KEY's
        # presence is find_txn's completeness signal — a legacy manifest
        # lacks it entirely and routes to the incremental walk
        manifest["txns"] = out_txns
        try:
            # exclusive create IS the commit point: exactly one writer can
            # create v{N}; a loser re-reads the tip and retries
            with open(_manifest_path(table_dir, version), "x") as f:
                json.dump(manifest, f)
            return version
        except FileExistsError:
            continue


def read_snapshot(
    spark: SparkSession, table_dir: str, version: int | None = None
) -> DataFrame:
    """The table AS OF ``version`` (default: latest) — reads exactly the
    manifest's file set, so a concurrent compaction/overwrite/append
    publishing v(N+1) cannot change or break this reader. When the
    manifest carries a schema (every commit since schema evolution
    landed), the read DECLARES it: files written before an add-column
    evolution simply surface NULL for the new column — each version
    reads with ITS OWN schema, which is what makes evolution and time
    travel compose. Manifests from before the schema field fall back to
    footer inference (uniform-schema tables, unchanged behavior). A
    version carrying DELETION VECTORS reads through the DV anti-join
    (``_read_data_files``) — merge-on-read deletes apply at scan time,
    each version with exactly ITS OWN delete set, so time travel
    composes with DVs too; DV-free versions keep the plain scan plan."""
    tip = latest_version(table_dir)
    if tip is None:
        raise FileNotFoundError(f"no snapshots in {table_dir!r}")
    version = tip if version is None else version
    manifest = _read_manifest(table_dir, version)
    if not manifest["files"]:
        raise ValueError(f"version {version} is empty")
    return _read_data_files(spark, table_dir, manifest, manifest["files"])


def snapshot_changes(
    spark: SparkSession,
    table_dir: str,
    *,
    from_version: int,
    to_version: int | None = None,
) -> DataFrame:
    """Rows ADDED between two versions — incremental consumption (the
    batch CDC feed every downstream ETL actually wants: "give me what's
    new since the version I last processed" instead of a full re-read).
    The file sets answer it structurally: appended files are
    ``manifest[to].files − manifest[from].files``, so the delta read
    scans exactly the new data and nothing else, at any table size.
    Only append lineage is supported — an ``overwrite``/compaction
    commit in the range rewrites history rather than extending it, and
    silently diffing across one would misreport removed rows as absent
    and compacted rows as new; the caller must restart from a full read
    there (the same contract Delta's change feed enforces)."""
    tip = latest_version(table_dir)
    if tip is None:
        raise FileNotFoundError(f"no snapshots in {table_dir!r}")
    to_version = tip if to_version is None else to_version
    if not 0 <= from_version <= to_version <= tip:
        raise ValueError(f"bad version range {from_version}..{to_version} (tip {tip})")
    # per-version walk so a REORG commit (compaction/clustering — row set
    # provably unchanged, Delta's dataChange=false) is skipped instead of
    # killing the incremental read: appended files accumulate from the
    # append commits only, and a reorg's rewritten files are never
    # misreported as new rows
    seen = set(_read_manifest(table_dir, from_version)["files"])
    new_rel: list[str] = []
    for v in range(from_version + 1, to_version + 1):
        m = _read_manifest(table_dir, v)
        if m["op"] != "append":
            if (m.get("change") or {}).get("kind") == "reorg":
                seen.update(m["files"])
                continue
            raise ValueError(
                f"version {v} is not an append — incremental read cannot "
                "cross an overwrite/compaction; restart from a full read"
            )
        for f in m["files"]:
            if f not in seen:
                seen.add(f)
                new_rel.append(f)
    if not new_rel:
        raise ValueError(f"no files added in {from_version}..{to_version}")
    # declared read under the TO version's schema/mapping: column names
    # surface logical-at-to (physical names are stable, so files written
    # before a mid-range rename read correctly under the new name)
    return _read_plain(
        spark, table_dir, _read_manifest(table_dir, to_version), new_rel
    )


def _schema_field_names(mf: dict) -> list:
    return [f["name"] for f in (mf.get("schema") or {}).get("fields", [])]


def _logical_to_end_maps(
    table_dir: str,
    from_version: int,
    to_version: int,
    read_manifest=None,
) -> dict:
    """Per-version map {logical-name-at-v → logical-name-at-to_version},
    composed backward one version STEP at a time: within a stable
    physical namespace (append/delete/metadata commits) columns
    correspond by PHYSICAL name — that is what carries a rename — while
    an overwrite-op commit may RESET the namespace (a full
    snapshot_commit(mode='overwrite'), compaction) and always preserves
    logical names, so the step across it matches by NAME. A single
    end-manifest inverse cannot cross the reset: a rename followed by a
    compaction used to surface pre-rename change-feed inserts
    NULL-padded under the new name (caught by the replay property
    test). A column dropped before the end simply has no entry. Pure
    metadata — one manifest read per version (``read_manifest`` lets a
    range-walking caller share its parsed-manifest cache: feed plan
    construction otherwise parses each manifest ~3× per range, and a
    manifest's file list grows with the table)."""
    read = read_manifest or (lambda v: _read_manifest(table_dir, v))
    end_manifest = read(to_version)
    to_end: dict[int, dict] = {
        to_version: {c: c for c in _schema_field_names(end_manifest)}
    }
    m_next = end_manifest
    for mv in range(to_version - 1, from_version - 1, -1):
        if not os.path.exists(_manifest_path(table_dir, mv)):
            break  # callers' own range guards fail loudly for gaps
        m_v = read(mv)
        nxt = to_end[mv + 1]
        if m_next["op"] == "overwrite":
            step = {c: c for c in _schema_field_names(m_v)}
        else:
            phys_v = _phys_map(m_v)
            inv_next = _inv_phys(m_next)
            step = {
                c: inv_next.get(phys_v.get(c, c), phys_v.get(c, c))
                for c in _schema_field_names(m_v)
            }
        to_end[mv] = {c: nxt[n] for c, n in step.items() if n in nxt}
        m_next = m_v
    return to_end


def snapshot_change_feed(
    spark: SparkSession,
    table_dir: str,
    *,
    from_version: int,
    to_version: int | None = None,
) -> DataFrame:
    """The CHANGE DATA FEED (Delta's ``readChangeFeed`` shape):
    every row-level change between two versions, stamped with
    ``_change_type`` (``insert`` | ``delete`` | ``update_preimage`` |
    ``update_postimage``) and ``_commit_version`` — the feed a
    downstream incremental materialization consumes when it must react
    to RETRACTIONS, not just additions (``snapshot_changes`` stays the
    cheaper inserts-only form).

    Supported lineage — the FULL commit vocabulary: ``append`` commits
    emit their new files' rows as inserts; ``delete`` commits (both
    merge-on-read forms) emit exactly the rows they retract — for
    position deletes, the parent version's rows at the NEW (file, pos)
    pairs (the scan is restricted to the files the delta names); for
    equality deletes, the parent-LIVE rows matching the new entries'
    keys within their scope (reading through the parent manifest
    applies all prior deletes, so a row never retracts twice).
    ``overwrite`` commits split by their recorded change kind
    (``_rewrite_change_rows``): a ``reorg`` (compaction/clustering)
    preserves the live row set and emits nothing, and copy-on-write DML
    rewrites (``merge_upsert`` / ``update_where`` / ``delete_where``)
    emit their row-level diff with update pre/postimages where the
    commit recorded a pairing — Delta's readChangeFeed vocabulary.

    Change extraction is delta-proportional at any table size: insert
    cost is the appended files, delete cost is a semi-join of the
    delta's target files against the bounded delete set, rewrite cost
    is a multiset diff of exactly the rewritten files.

    Replay invariant (pinned by tests): applying the feed to the
    starting version — insert/update_postimage added,
    delete/update_preimage removed — reproduces the ending version."""
    from pyspark.sql import functions as F

    tip = latest_version(table_dir)
    if tip is None:
        raise FileNotFoundError(f"no snapshots in {table_dir!r}")
    to_version = tip if to_version is None else to_version
    if not 0 <= from_version <= to_version <= tip:
        raise ValueError(f"bad version range {from_version}..{to_version} (tip {tip})")

    parts: list[DataFrame] = []
    # the feed surfaces the ENDING version's logical names. Each part's
    # columns remap logical-at-its-version → logical-at-end via maps
    # COMPOSED one version step at a time: within a stable physical
    # namespace (append/delete/metadata commits) columns correspond by
    # PHYSICAL name — that is what carries a rename — while an
    # overwrite-op commit may RESET the physical namespace
    # (snapshot_commit(mode="overwrite"), compaction) and always
    # preserves logical names, so the step across it matches by NAME.
    # A single end-manifest inverse cannot cross the reset: a rename
    # followed by a compaction used to surface pre-rename inserts
    # NULL-padded under the new name (caught by the replay property
    # test) because the pre-rename physical no longer appeared in the
    # ending map.
    _mcache: dict[int, dict] = {}

    def _m(mv: int) -> dict:
        # one parse per manifest per feed call: the range walk below and
        # _logical_to_end_maps otherwise each re-parse every manifest,
        # whose file list grows with the table (O(range × files) JSON)
        if mv not in _mcache:
            _mcache[mv] = _read_manifest(table_dir, mv)
        return _mcache[mv]

    to_end = _logical_to_end_maps(
        table_dir, from_version, to_version, read_manifest=_m
    )

    def remap(df: DataFrame, version: int) -> DataFrame:
        mp = to_end.get(version) or {}
        renames = {c: mp.get(c, c) for c in df.columns}
        if all(new == c for c, new in renames.items()):
            return df
        return df.select(
            *[F.col(c).alias(new) for c, new in renames.items()]
        )

    def stamp(df: DataFrame, kind: str, v: int) -> DataFrame:
        return df.withColumn("_change_type", F.lit(kind)).withColumn(
            "_commit_version", F.lit(v).cast("long")
        )

    # consecutive append commits with the same column mapping batch into
    # ONE scan part: a V-append range used to union V single-version
    # scans — V plan-built subtrees and V separately scheduled scan
    # stages whose files can't pack into shared splits (measured 0.015 s
    # plan-build per version plus a per-version task wave; a 64-append
    # feed planned 504 single-file tasks). The batched part reads every
    # run file in one scan and derives `_commit_version` from the file's
    # commit directory (each append commit writes its files under one
    # fresh `data-<uuid>` dir, so the dir identifies the version).
    # Result rows are identical; a schema/rename/remap change inside the
    # range breaks the run (flush) so evolution semantics stay exactly
    # the per-version path's.
    append_run: list[tuple[int, dict, list[str]]] = []

    def _run_compatible(m: dict, v: int) -> bool:
        v0, m0, _ = append_run[0]
        return (
            m.get("schema") == m0.get("schema")
            and _phys_map(m) == _phys_map(m0)
            and (to_end.get(v) or {}) == (to_end.get(v0) or {})
        )

    def _flush_appends() -> None:
        if not append_run:
            return
        if len(append_run) == 1:
            v, m, new_rel = append_run[0]
            parts.append(
                stamp(remap(_read_plain(spark, table_dir, m, new_rel), v), "insert", v)
            )
            append_run.clear()
            return
        v0, m0, _ = append_run[0]
        # pass COMMIT DIRECTORIES, not files, where a version's new files
        # are exactly its fresh `data-<uuid>` dir's contents (always true
        # for an append this module wrote): V dir paths list far cheaper
        # than V×F file paths — one relation over >32 explicit paths pays
        # a parallel-listing Spark job per plan build. Any version whose
        # files don't tile whole local dirs (a foreign manifest edit, a
        # clone-resolved base) falls back to its exact file list.
        paths: list[str] = []
        for _v, _m, fs in append_run:
            dset = {f.split("/", 1)[0] for f in fs}
            dirs = sorted(dset)
            bases = _m.get("file_bases") or {}
            tiles = sorted(
                f for f in _m["files"] if f.split("/", 1)[0] in dset
            ) == sorted(fs)
            if tiles and not any(bases.get(f) for f in fs):
                paths.extend(os.path.join(table_dir, d_) for d_ in dirs)
            else:
                paths.extend(_data_paths(table_dir, _m, fs))
        df = _declared_reader(spark, m0).parquet(*paths)
        inv = _inv_phys(m0)
        dir_to_v: dict[str, int] = {}
        unique_dirs = True
        for _v, _m, fs in append_run:
            for d_ in {f.split("/", 1)[0] for f in fs}:
                if dir_to_v.setdefault(d_, _v) != _v:
                    unique_dirs = False  # never happens for uuid dirs; stay exact
        if unique_dirs:
            ver_expr = F.create_map(
                *[x for d_, _v in dir_to_v.items() for x in (F.lit(d_), F.lit(_v))]
            )[F.element_at(F.split(F.col("_metadata.file_path"), "/"), -2)]
        else:
            ver_expr = F.create_map(
                *[
                    x
                    for _v, _m, fs in append_run
                    for f in fs
                    for x in (F.lit(f), F.lit(_v))
                ]
            )[_rel_path_expr()]
        out = df.select(
            *[F.col(c).alias(inv.get(c, c)) for c in df.columns]
        ) if inv else df
        parts.append(
            remap(out, v0)
            .withColumn("_change_type", F.lit("insert"))
            .withColumn(
                "_commit_version",
                # the coalesce fallback is unreachable (the scan reads
                # exactly the run's files, every one keyed in the map);
                # it pins the column non-nullable, matching the
                # per-version `lit(v)` stamp exactly
                F.coalesce(ver_expr, F.lit(v0)).cast("long"),
            )
        )
        append_run.clear()

    for v in range(from_version + 1, to_version + 1):
        if not os.path.exists(_manifest_path(table_dir, v)) or not os.path.exists(
            _manifest_path(table_dir, v - 1)
        ):
            # change derivation diffs each version against its parent;
            # a vacuumed manifest in range would silently truncate the feed
            raise ValueError(
                f"change feed needs manifests v{v - 1} and v{v}, but the "
                "range crosses vacuumed history — restart from a retained "
                "from_version"
            )
        m = _m(v)
        parent = _m(v - 1)
        if m["op"] == "append":
            base = set(parent["files"])
            new_rel = [f for f in m["files"] if f not in base]
            if new_rel:
                # appended files carry no positions and sit outside every
                # equality scope — a plain declared-schema read suffices;
                # buffered so consecutive compatible appends share a scan
                if append_run and not _run_compatible(m, v):
                    _flush_appends()
                append_run.append((v, m, new_rel))
        elif m["op"] == "delete":
            # round 13: a delete version does NOT break the append run.
            # Its retraction parts read through the PARENT manifest
            # (captured below) and the run's insert parts read the run
            # files' own commit dirs — neither depends on feed-walk
            # order, and the union is unordered (every row carries
            # _commit_version). Interleaved delete/append history (the
            # CDC MoR catch-up shape) therefore keeps ONE batched
            # insert scan per compatible run instead of one per append.
            parent_dvc = parent.get("dv_counts") or {}
            delta_dv = [
                f
                for f in m.get("delete_files") or []
                if f not in set(parent.get("delete_files") or [])
            ]
            if delta_dv:
                # only files whose deleted count grew can hold retractions
                grew = [
                    f
                    for f, n in (m.get("dv_counts") or {}).items()
                    if n > parent_dvc.get(f, 0)
                ]
                scan = _read_data_files(
                    spark,
                    table_dir,
                    parent,
                    [f for f in parent["files"] if f in set(grew)],
                    keep_file_col="__cf_file",
                    keep_pos_col="__cf_pos",
                )
                pos = spark.read.schema(_dv_schema()).parquet(
                    *[os.path.join(table_dir, f) for f in delta_dv]
                ).select(
                    F.col("file").alias("__cf_file"), F.col("pos").alias("__cf_pos")
                )
                parts.append(
                    stamp(
                        remap(
                            scan.join(
                                pos, ["__cf_file", "__cf_pos"], "semi"
                            ).drop("__cf_file", "__cf_pos"),
                            v - 1,
                        ),
                        "delete",
                        v,
                    )
                )
            n_parent_eq = len(parent.get("eq_deletes") or [])
            parent_inv = _inv_phys(parent)
            for entry in (m.get("eq_deletes") or [])[n_parent_eq:]:
                scan = _read_data_files(
                    spark,
                    table_dir,
                    parent,
                    [f for f in parent["files"] if f in set(entry["files"])],
                )
                # key files store PHYSICAL names; the scan surfaces the
                # parent's LOGICAL names — translate the key side
                join_cols = [parent_inv.get(k, k) for k in entry["key_cols"]]
                keys = (
                    spark.read.schema(_eq_keys_schema(table_dir, entry)).parquet(
                        *_tiled_data_paths(table_dir, None, entry["delete_files"])
                    )
                    .select(
                        *[
                            F.col(k).alias(parent_inv.get(k, k))
                            for k in entry["key_cols"]
                        ]
                    )
                    .distinct()
                )
                parts.append(
                    stamp(
                        # USING-join moves key columns first; restore the
                        # data order so every part aligns
                        remap(
                            scan.join(keys, join_cols, "semi").select(
                                *scan.columns
                            ),
                            v - 1,
                        ),
                        "delete",
                        v,
                    )
                )
        else:
            # rewrite/metadata versions keep the append run open too:
            # the diff reads exactly its own (m, parent) manifests, and
            # a rewrite that resets the physical namespace or remaps
            # columns breaks the run at the NEXT append via
            # _run_compatible. Run files stay readable — data files are
            # immutable until vacuum, which cannot run mid-feed.
            parts.extend(
                remap(p_df, v)
                for p_df in _rewrite_change_rows(spark, table_dir, m, parent, v)
            )
    _flush_appends()
    if not parts:
        raise QuietRangeError(f"no changes in {from_version}..{to_version}")
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p, allowMissingColumns=True)
    # the feed's data columns follow the ENDING version's declared
    # schema (Delta's readChangeFeed contract): a column dropped inside
    # the range disappears from earlier parts too, one added inside the
    # range pads NULL for parts that predate it
    end_schema = _m(to_version).get("schema")
    if end_schema is not None:
        from pyspark.sql.types import StructType

        fields = StructType.fromJson(end_schema).fields
        out = out.select(
            *[
                F.col(f.name)
                if f.name in out.columns
                else F.lit(None).cast(f.dataType).alias(f.name)
                for f in fields
            ],
            "_change_type",
            "_commit_version",
        )
    return out


def _rewrite_change_rows(
    spark: SparkSession, table_dir: str, m: dict, parent: dict, v: int
) -> list[DataFrame]:
    """Change rows of ONE copy-on-write rewrite commit (op=overwrite)
    for the change feed, derived by a distributed multiset diff: the
    dropped files' parent-LIVE rows (one side) against the replacement
    files' rows (the other), group-by-all-columns with a signed count —
    verbatim-rewritten survivors cancel exactly, residue with negative
    delta retracts, positive delta inserts, each expanded back to its
    multiplicity.

    The manifest's recorded change kind refines the labels:
    ``reorg`` (compaction/clustering) provably preserves the live row
    set and emits nothing — the feed crosses it silently (Delta's
    dataChange=false contract); ``update`` (update_where: every
    differing row IS a modified row) labels the old side
    ``update_preimage`` and the new side ``update_postimage``;
    a recorded ``key`` (merge_upsert) pairs by key membership — keys on
    both sides are updates, old-only deletes, new-only inserts. An
    untagged overwrite (a user's full ``mode("overwrite")`` write)
    falls back to plain delete/insert — still replay-exact.

    Cost is bounded by the REWRITTEN data (for targeted DML, the
    touched-file set): one shuffle to group the diff, plus — only in
    the keyed case — one key-level aggregation joined back. At 100 TB
    a full-table overwrite through the feed is a full diff, which is
    what it semantically is."""
    from pyspark.sql import functions as F

    change = m.get("change") or {}
    if change.get("kind") == "reorg":
        return []
    old_rel = [f for f in parent["files"] if f not in set(m["files"])]
    new_rel = [f for f in m["files"] if f not in set(parent["files"])]
    old_df = (
        _read_data_files(spark, table_dir, parent, old_rel) if old_rel else None
    )
    new_df = (
        _read_plain(spark, table_dir, m, new_rel) if new_rel else None
    )
    if old_df is None and new_df is None:
        return []
    if old_df is not None and new_df is not None:
        cols = list(new_df.columns) + [
            c for c in old_df.columns if c not in set(new_df.columns)
        ]
        sided = old_df.withColumn("__side", F.lit(-1)).unionByName(
            new_df.withColumn("__side", F.lit(1)), allowMissingColumns=True
        )
    elif old_df is not None:
        cols, sided = list(old_df.columns), old_df.withColumn("__side", F.lit(-1))
    else:
        cols, sided = list(new_df.columns), new_df.withColumn("__side", F.lit(1))
    delta = (
        sided.groupBy(*cols)
        .agg(F.sum("__side").alias("__d"))
        .filter(F.col("__d") != 0)
    )
    kind, key = change.get("kind"), change.get("key")
    keys = [key] if isinstance(key, str) else list(key or [])
    if kind == "update":
        ctype = F.when(
            F.col("__d") < 0, F.lit("update_preimage")
        ).otherwise(F.lit("update_postimage"))
    elif keys and all(k in cols for k in keys):
        flags = delta.groupBy(*keys).agg(
            F.max((F.col("__d") < 0).cast("int")).alias("__has_old"),
            F.max((F.col("__d") > 0).cast("int")).alias("__has_new"),
        )
        delta = delta.join(flags, keys)
        ctype = F.when(
            F.col("__d") < 0,
            F.when(
                F.col("__has_new") == 1, F.lit("update_preimage")
            ).otherwise(F.lit("delete")),
        ).otherwise(
            F.when(
                F.col("__has_old") == 1, F.lit("update_postimage")
            ).otherwise(F.lit("insert"))
        )
    else:
        ctype = F.when(F.col("__d") < 0, F.lit("delete")).otherwise(
            F.lit("insert")
        )
    out = (
        delta.withColumn("_change_type", ctype)
        .withColumn("__i", F.explode(F.expr("sequence(1, abs(__d))")))
        .select(*cols, "_change_type")
        .withColumn("_commit_version", F.lit(v).cast("long"))
    )
    return [out]


def compact_snapshot(
    spark: SparkSession,
    table_dir: str,
    *,
    target_file_bytes: int = 128 * 1024 * 1024,
    cluster_by: list[str] | None = None,
    zorder: bool = False,
    bits: int = 16,
    small_file_bytes: int | None = None,
) -> int:
    """Compaction as a COMMIT: rewrite the current version's file set
    into files sized near ``target_file_bytes`` and publish the result as
    a new version. Old versions keep reading their old (immutable) files
    — this is how compaction becomes safe under concurrent readers, the
    guarantee ``compact_parquet``'s in-place guard can only approximate
    by refusing the dangerous case. File count derives from actual bytes
    (same rule as ``compact_parquet``).

    ``cluster_by`` makes the rewrite ALSO a clustering pass (the
    OPTIMIZE ... ZORDER BY shape): range-partition + sort on the columns
    (or on their Morton interleaving with ``zorder=True``, the
    `interleaved_write` lever), so each rewritten file covers a tight
    range and the manifest stats recorded at publish turn into an
    effective prune index — compaction is exactly when clustering is
    cheapest, the rows are being rewritten anyway.

    ``small_file_bytes`` switches to INCREMENTAL (bin-pack) compaction —
    the only shape that survives 100 TB: files at or above the threshold
    are RETAINED verbatim (never read, never rewritten; their pending
    merge-on-read deletes carry into the new manifest), and only the
    small-file tail — streaming epoch commits, narrow merges — rewrites,
    bin-packed toward ``target_file_bytes``. Cost is proportional to the
    small tail, not the table; run it frequently and reserve the full
    rewrite for re-clustering. Rewritten files materialize THEIR deletes
    during the read (the rewrite routes through the DV/eq-aware scan),
    so incremental compaction also incrementally drains the delete
    backlog. Fewer than two small files → nothing to pack, no-op (the
    current version number returns)."""
    import math

    if small_file_bytes is not None and (cluster_by or zorder):
        # incremental bin-packing concatenates the small tail verbatim;
        # it cannot honor a clustering request (clustering requires the
        # FULL rewrite so ranges stay globally tight) — silently doing
        # plain packing would hand back an unclustered table
        raise ValueError(
            "small_file_bytes (incremental bin-pack) cannot be combined "
            "with cluster_by/zorder — clustering needs the full rewrite"
        )
    tip = latest_version(table_dir)
    if tip is None:
        raise FileNotFoundError(f"no snapshots in {table_dir!r}")
    manifest = _read_manifest(table_dir, tip)

    if small_file_bytes is not None:
        sizes = {
            f: os.path.getsize(_data_path(table_dir, manifest, f))
            for f in manifest["files"]
        }
        small = [f for f, b in sizes.items() if b < small_file_bytes]
        if len(small) < 2:
            return tip
        retained = [f for f in manifest["files"] if f not in set(small)]
        n_files = max(
            1, math.ceil(sum(sizes[f] for f in small) / target_file_bytes)
        )
        packed = _read_data_files(spark, table_dir, manifest, small).repartition(
            n_files
        )
        return _commit_rewrite(
            table_dir,
            packed,
            untouched=retained,
            schema=manifest.get("schema"),
            txn_id=None,
            require_parent=tip,
            parent_manifest=manifest,
            change={"kind": "reorg"},
        )

    paths = _data_paths(table_dir, manifest, manifest["files"])
    total = sum(os.path.getsize(p) for p in paths)
    n_files = max(1, math.ceil(total / target_file_bytes))
    df = read_snapshot(spark, table_dir, tip)
    if not cluster_by:
        compacted = df.repartition(n_files)
    elif zorder:
        from pyspark.sql import functions as F

        from reactivestreams_kinesis_spark.operators.layout import zorder_expr

        stats = df.agg(
            *[F.min(c).alias(f"min_{c}") for c in cluster_by],
            *[F.max(c).alias(f"max_{c}") for c in cluster_by],
        ).collect()[0]
        mins = {c: stats[f"min_{c}"] for c in cluster_by}
        maxs = {c: stats[f"max_{c}"] for c in cluster_by}
        compacted = (
            df.withColumn("__z", zorder_expr(cluster_by, mins, maxs, bits=bits))
            .repartitionByRange(n_files, "__z")
            .sortWithinPartitions("__z")
            .drop("__z")
        )
    else:
        compacted = df.repartitionByRange(n_files, *cluster_by).sortWithinPartitions(
            *cluster_by
        )
    # conflict-guarded: a concurrent append between the compaction's read
    # and its publish would otherwise be silently dropped
    return snapshot_commit(
        compacted,
        table_dir,
        mode="overwrite",
        require_parent=tip,
        change={"kind": "reorg"},
    )


def merge_upsert(
    spark: SparkSession,
    table_dir: str,
    updates: DataFrame,
    key: str | list[str],
    *,
    delete_col: str | None = None,
    txn_id: str | None = None,
    strategy: str = "copy_on_write",
    precomputed_stats: dict | None = None,
) -> int:
    """MERGE (upsert + optional delete) as a COPY-ON-WRITE commit — the
    Delta/Iceberg MERGE INTO reduced to the manifest primitives. Matched
    keys take the update row (last-writer-wins), unmatched update keys
    insert, and rows flagged true in ``delete_col`` delete their key.

    ``strategy="merge_on_read"`` applies the same semantics as an
    equality-delete + append instead (the batch dual of
    ``snapshot_stream_merge_sink``'s MoR mode): retract every update key
    (``delete_by_key`` — scoped to current files, O(|keys|), no data
    read), then append the non-delete rows. Cost is O(batch) regardless
    of table size; readers pay the scoped anti-join until compaction.
    The two commits carry per-phase txn ids derived from ``txn_id``, so
    a replay after a crash between them is exactly-once.

    The scale property is FILE granularity: one pass over the current
    version (semi-join against the bounded distinct update keys) names
    the files that contain a matched key; ONLY those files rewrite —
    their surviving rows (anti-join) plus all upserts become the new
    files, and the published manifest is (untouched files, verbatim) +
    (new files). A merge touching 0.1% of files costs 0.1% of a full
    rewrite, at any table size; untouched data is never read twice nor
    rewritten. The touched-file list is the one driver-side action,
    bounded by the manifest's file count — metadata, not data.

    Update columns absent from the table (or vice versa) widen through
    the same add-column evolution as append commits: survivors and
    upserts union by name with missing columns NULL. ``updates`` must
    carry at most ONE row per key — duplicated keys are refused (the
    Delta/Iceberg multiple-match error): which duplicate wins is the
    caller's ordering decision, made BEFORE the merge
    (``snapshot_stream_merge_sink`` compacts each batch that way).

    Publishes with ``op=overwrite`` — a merge rewrites history, so
    incremental readers (``snapshot_changes``, the streaming source)
    correctly refuse to diff across it, exactly like compaction.

    ``key`` may be a LIST of columns (composite equality key): the
    touched-file targeting, duplicate guard, and survivor anti-join all
    range over the key tuple; the stats pre-prune intersects each
    column's [min, max] envelope (conservative, still sound), while the
    bloom probe stays single-column (per-file blooms hash one column).

    ``precomputed_stats`` lets a caller that ALREADY aggregated
    ``updates`` (the MV merge refresh fuses these into its probe pass)
    skip the one stats job this function otherwise runs: a mapping with
    ``rows`` (row count), ``n`` (distinct key tuples) and per key column
    ``lo{i}``/``hi{i}`` (min/max, None when all-NULL). The values MUST
    be exact for ``updates`` — a wrong ``n`` voids the duplicate-key
    guard and wrong bounds mistarget the stats pre-prune — the same
    caller-proves-it contract as ``txn_id``."""
    if strategy not in ("copy_on_write", "merge_on_read"):
        raise ValueError(f"unknown merge strategy: {strategy!r}")
    kcols = [key] if isinstance(key, str) else list(key)
    if not kcols:
        raise ValueError("merge_upsert needs at least one key column")
    tip = latest_version(table_dir)
    if tip is None:
        raise FileNotFoundError(f"no snapshots in {table_dir!r}")
    if txn_id is not None:
        done = find_txn(table_dir, txn_id)
        if done is not None:
            return done
    manifest = _read_manifest(table_dir, tip)
    upd_keys = updates.select(*kcols).distinct()

    from pyspark.sql import functions as F

    # one bounded stats job serves both strategies: the duplicate-key
    # guard (both), and the per-column [min, max] prune bounds (COW) —
    # skipped entirely when the caller supplied the same numbers
    if precomputed_stats is not None:
        bounds = precomputed_stats
    else:
        stat_exprs = [
            F.count(F.lit(1)).alias("rows"),
            F.countDistinct(*kcols).alias("n"),
        ]
        for i, k in enumerate(kcols):
            stat_exprs.append(F.min(k).alias(f"lo{i}"))
            stat_exprs.append(F.max(k).alias(f"hi{i}"))
        bounds = updates.agg(*stat_exprs).collect()[0]
    if bounds["rows"] > bounds["n"]:
        # Delta/Iceberg MERGE raise on multiple matches per key; silently
        # inserting both rows would corrupt key uniqueness
        raise ValueError(
            f"merge_upsert: updates carry {bounds['rows'] - bounds['n']} "
            f"extra row(s) for duplicated {kcols!r} values — compact the "
            "batch to one row per key first (last-writer-wins is the "
            "CALLER's ordering decision; see snapshot_stream_merge_sink)"
        )

    if strategy == "merge_on_read":
        a_txn = f"{txn_id}-morA" if txn_id else None
        if a_txn is not None:
            done = find_txn(table_dir, a_txn)
            if done is not None:
                return done
        delete_by_key(
            spark,
            table_dir,
            upd_keys,
            kcols,
            txn_id=f"{txn_id}-morD" if txn_id else None,
        )
        if delete_col is not None:
            keep = updates.filter(
                ~F.coalesce(F.col(delete_col), F.lit(False))
            ).drop(delete_col)
        else:
            keep = updates
        if keep.isEmpty():
            return latest_version(table_dir)
        return snapshot_commit(keep, table_dir, txn_id=a_txn)

    # stats pre-prune: files wholly outside the update keys' [min, max]
    # cannot own a match, so the exact targeting scan reads only the
    # overlapping candidates — for range-localized updates (the common
    # CDC case on a clustered table) targeting becomes candidate-
    # proportional instead of table-proportional. Scattered keys, where
    # the range spans everything, fall to the per-file BLOOMS when the
    # table declares them and the key set is small enough to probe
    # (≤ _MERGE_BLOOM_PROBE_CAP values — bounded driver data, checked by
    # the same stats job). Keys neither localized nor bloomed degrade
    # gracefully to the full targeting scan.
    candidates = manifest["files"]
    range_preds = [
        p
        for i, k in enumerate(kcols)
        if bounds[f"lo{i}"] is not None
        for p in ((k, ">=", bounds[f"lo{i}"]), (k, "<=", bounds[f"hi{i}"]))
    ]
    if range_preds:
        candidates = prune_files(manifest, range_preds)
        table_stats = manifest.get("stats") or {}
        # NDV-sketch gate on the probe: when the per-file/table distinct
        # ratio says the average key lives in most files (an unclustered
        # layout with repeated keys), bloom probing cannot prune — skip
        # the collect+probe entirely. No sketches → stay optimistic.
        # Composite keys skip the probe: per-file blooms hash ONE column.
        overlap = (
            _key_overlap_factor(manifest, kcols[0]) if len(kcols) == 1 else None
        )
        probe_can_prune = overlap is None or len(manifest["files"]) < 2 or (
            overlap <= max(2.0, 0.5 * len(manifest["files"]))
        )
        if (
            len(kcols) == 1
            and probe_can_prune
            and bounds["n"] <= _MERGE_BLOOM_PROBE_CAP
            and any(
                table_stats.get(f, {})
                .get(_phys_col(manifest, kcols[0]), {})
                .get("bloom")
                for f in candidates
            )
        ):
            probe_keys = [r[0] for r in upd_keys.collect()]
            candidates = prune_files(manifest, [(kcols[0], "in", probe_keys)])
    # name the files owning a matched key: bounded driver list (≤ |files|).
    # DV-aware scan — a key whose rows are all DV-deleted is an INSERT,
    # not a match, and must not drag its file into the rewrite
    touched: set = set()
    if candidates:
        cand_df = _read_data_files(
            spark, table_dir, manifest, candidates, keep_file_col="__file"
        )
        touched_rows = (
            cand_df.join(upd_keys, kcols, "semi")
            .select("__file")
            .distinct()
            .collect()
        )
        touched = {r["__file"] for r in touched_rows}
    untouched = [f for f in manifest["files"] if f not in touched]

    if delete_col is not None:
        # NULL flag = not a delete (the row upserts normally); a bare
        # ~col would silently drop the row from BOTH branches and
        # delete its key
        upserts = updates.filter(
            ~F.coalesce(F.col(delete_col), F.lit(False))
        ).drop(delete_col)
    else:
        upserts = updates
    if touched:
        touched_list = [f for f in manifest["files"] if f in touched]
        survivors = _read_data_files(
            spark, table_dir, manifest, touched_list
        ).join(upd_keys, kcols, "anti")
        rewrite = survivors.unionByName(upserts, allowMissingColumns=True)
    else:
        rewrite = upserts
    return _commit_rewrite(
        table_dir,
        rewrite,
        untouched=untouched,
        schema=_merge_schema(manifest.get("schema"), rewrite.schema.jsonValue()),
        txn_id=txn_id,
        require_parent=tip,
        parent_manifest=manifest,
        change={"kind": "rewrite", "key": kcols[0] if len(kcols) == 1 else kcols},
    )


def _rel_from_uri(uri: str) -> str:
    """input_file_name URI → table-relative manifest path: manifests
    store ``<data-dir>/<part file>``, the last two path components."""
    return "/".join(uri.split("/")[-2:])


def _rel_path_expr():
    """The in-plan twin of ``_rel_from_uri``: a Column mapping the scan's
    ``_metadata.file_path`` URI to the table-relative manifest path
    (last two components) — evaluated executor-side, no driver action."""
    from pyspark.sql import functions as F

    parts = F.split(F.col("_metadata.file_path"), "/")
    return F.concat_ws("/", F.element_at(parts, -2), F.element_at(parts, -1))


# Position-delete (DV) files are written by this module with exactly this
# shape (delete_where merge_on_read / compaction carry): declaring it at
# every DV read skips parquet schema inference — which otherwise fires a
# footer-reading Spark job PER PLAN CONSTRUCTION on every read of a table
# with pending DVs (each read_snapshot/feed/DML targeting scan paid one).
def _dv_schema():
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    return StructType(
        [StructField("file", StringType()), StructField("pos", LongType())]
    )


def _eq_keys_schema(table_dir: str, entry: dict):
    """Declared schema for an equality-delete entry's key files.

    Entries written since the ``key_schema`` field exist carry it in the
    manifest (``delete_by_key`` records the exact struct it wrote), so
    this is a pure dict lookup — no I/O at plan time. Older entries fall
    back to the FILE's own footer via pyarrow (metadata-only driver
    read, no Spark job) — exact under type widening, where the
    manifest's current declared type may be wider than what older key
    files hold. All files of one entry come from one write, so one
    footer suffices. At 100 TB the recorded form matters: the fallback
    is an object-store round trip per pending entry on EVERY plan build
    of a table with pending equality deletes."""
    recorded = entry.get("key_schema")
    if recorded is not None:
        from pyspark.sql.types import StructType

        return StructType.fromJson(recorded)
    import pyarrow.parquet as pq
    from pyspark.sql.pandas.types import from_arrow_schema

    return from_arrow_schema(
        pq.read_schema(os.path.join(table_dir, entry["delete_files"][0]))
    )


def _read_data_files(
    spark: SparkSession,
    table_dir: str,
    manifest: dict,
    rel_files: list[str],
    *,
    keep_file_col: str | None = None,
    keep_pos_col: str | None = None,
):
    """THE data-file read every snapshot consumer routes through: the
    given manifest files under the declared schema, with the version's
    DELETION VECTORS applied (merge-on-read). DV application is one
    anti-join of the scan against the bounded (file, pos) delete set on
    ``(_metadata.file_path relativized, _metadata.row_index)`` — the
    fact side never shuffles (the DV side is sized by DELETED rows, so
    AQE broadcasts it in every realistic regime; no pinned broadcast —
    an adversarial mass-delete must not OOM the driver, it just turns
    into a shuffle join). Tables without DVs take the exact pre-DV plan:
    a plain declared-schema parquet scan, zero overhead.

    EQUALITY DELETES apply after the positional ones (both are
    subtractive, order is immaterial): one key anti-join per pending
    entry, scoped to the entry's ``files`` via a file-membership
    conjunct in the join condition — rows in files appended AFTER the
    delete never match, which is the semantics that lets a deleted key
    be re-inserted. Entry count is bounded by deletes-since-compaction;
    each key set is sized by deleted KEYS, so AQE broadcasts it.

    ``keep_file_col`` / ``keep_pos_col`` additionally surface the
    table-relative file path and the in-file row position as columns
    (the DML targeting passes and the merge-on-read delete writer need
    them); otherwise the result carries exactly the data columns."""
    from pyspark.sql import functions as F

    reader = _declared_reader(spark, manifest)
    paths = _tiled_data_paths(table_dir, manifest, rel_files)
    df = reader.parquet(*paths)
    # the scan surfaces PHYSICAL column names (what the files hold);
    # delete application below joins on physical (equality-delete key
    # files store physical names), then the final select aliases back
    # to the version's LOGICAL names — the ONE translation boundary
    inv = _inv_phys(manifest)
    dv_files = manifest.get("delete_files") or []
    # entries whose scope intersects the files actually being read
    eq_entries = [
        e
        for e in (manifest.get("eq_deletes") or [])
        if set(e["files"]) & set(rel_files)
    ]
    if not dv_files and not eq_entries and keep_file_col is None and keep_pos_col is None:
        if inv:
            return df.select(
                *[F.col(c).alias(inv.get(c, c)) for c in df.columns]
            )
        return df
    out_cols = [
        F.col(c).alias(inv.get(c, c)) if c in inv else F.col(c)
        for c in df.columns
    ]
    df = df.withColumn("__snap_file", _rel_path_expr()).withColumn(
        "__snap_pos", F.col("_metadata.row_index")
    )
    if keep_file_col is not None:
        out_cols.append(keep_file_col)
        df = df.withColumn(keep_file_col, F.col("__snap_file"))
    if keep_pos_col is not None:
        out_cols.append(keep_pos_col)
        df = df.withColumn(keep_pos_col, F.col("__snap_pos"))
    if dv_files:
        # manifest=None: DV refs never resolve through clone bases (they
        # are written by this table's own commits) — identical resolution
        # to the former table_dir join, tiled to whole dv-* dirs
        dv = spark.read.schema(_dv_schema()).parquet(
            *_tiled_data_paths(table_dir, None, dv_files)
        ).select(F.col("file").alias("__dv_file"), F.col("pos").alias("__dv_pos"))
        df = df.join(
            dv,
            (F.col("__snap_file") == F.col("__dv_file"))
            & (F.col("__snap_pos") == F.col("__dv_pos")),
            "left_anti",
        )
    # stacked entries coalesce into ONE anti-join per congruence group —
    # same key columns, same EFFECTIVE scope (raw scope ∩ files being
    # read: the membership conjunct only ever tests files in this scan),
    # same key-file types (pre-widening key files keep their narrower
    # footer type; mixed-type groups stay separate so the equality keeps
    # its widen-both-sides coercion, never a truncating cast). K deletes
    # between compactions used to chain K anti-joins — K broadcast
    # builds and K probe passes over the scan (measured 3.7 s at K=48 on
    # a 200k-row local table); subtractive applications commute, so a
    # group's key sets union first and the scan pays one join per group.
    rel_set = set(rel_files)
    groups: dict[tuple, list[tuple[dict, object]]] = {}
    for entry in eq_entries:
        schema = _eq_keys_schema(table_dir, entry)
        type_key = tuple(
            schema[k].dataType.simpleString() for k in entry["key_cols"]
        )
        group = (
            tuple(entry["key_cols"]),
            frozenset(entry["files"]) & rel_set,
            type_key,
        )
        groups.setdefault(group, []).append((entry, schema))
    for (key_cols, scope, _), members in groups.items():
        if all(s == members[0][1] for _e, s in members[1:]):
            # one write path produced every key file in the group and
            # their full schemas agree — one scan over all of them
            keys = spark.read.schema(members[0][1]).parquet(
                *_tiled_data_paths(
                    table_dir,
                    None,
                    [
                        f
                        for entry, _s in members
                        for f in entry["delete_files"]
                    ],
                )
            ).select(*[F.col(k).alias(f"__eq_{k}") for k in key_cols])
        else:
            keys = None
            for entry, schema in members:
                part = spark.read.schema(schema).parquet(
                    *_tiled_data_paths(table_dir, None, entry["delete_files"])
                ).select(
                    *[F.col(k).alias(f"__eq_{k}") for k in key_cols]
                )
                keys = part if keys is None else keys.unionByName(part)
        keys = keys.distinct()
        cond = F.col("__snap_file").isin(sorted(scope))
        for k in key_cols:
            cond = cond & (df[k] == F.col(f"__eq_{k}"))
        df = df.join(keys, cond, "left_anti")
    return df.select(*out_cols)


def _declared_reader(spark: SparkSession, manifest: dict):
    """A DataFrameReader declaring the manifest's schema when present
    (evolution-aware reads), plain otherwise. The declared names are
    PHYSICAL (what the files hold) — callers alias back to logical, or
    use ``_read_plain``/``_read_data_files`` which do it for them."""
    reader = spark.read
    if manifest.get("schema") is not None:
        reader = reader.schema(
            _physical_struct(manifest["schema"], _phys_map(manifest))
        )
    return reader


def _read_plain(
    spark: SparkSession, table_dir: str, manifest: dict, rel_files: list[str]
) -> DataFrame:
    """Declared-schema read of the given files WITHOUT delete
    application, surfacing LOGICAL column names — the light path for
    files known to sit outside every DV/equality scope (fresh appends in
    the change feeds)."""
    from pyspark.sql import functions as F

    df = _declared_reader(spark, manifest).parquet(
        *_tiled_data_paths(table_dir, manifest, rel_files)
    )
    inv = _inv_phys(manifest)
    if not inv:
        return df
    return df.select(*[F.col(c).alias(inv.get(c, c)) for c in df.columns])


def _predicate_match(predicates: list[tuple]):
    """Conjunctive (col, op, value) triples → a null-safe boolean Column
    (NULL comparisons count as non-matching, the DML contract). The ONE
    translation of the predicate format — `scan_snapshot`, `delete_where`
    and `update_where` all filter through it, so the op set cannot
    diverge from what `prune_files` skips on."""
    import operator as _pyop

    from pyspark.sql import functions as F

    ops = {"=": _pyop.eq, ">": _pyop.gt, ">=": _pyop.ge, "<": _pyop.lt, "<=": _pyop.le}
    cond = F.lit(True)
    for c, op, v in predicates:
        if op == "in":
            cond = cond & F.col(c).isin(list(v))
        else:
            cond = cond & ops[op](F.col(c), F.lit(v))
    return F.coalesce(cond, F.lit(False))


def _target_files(
    spark: SparkSession, table_dir: str, manifest: dict, predicates: list[tuple]
):
    """The predicate-DML file-targeting pass shared by ``delete_where``
    and ``update_where``: stats exclusion (``prune_files``, metadata)
    then ONE exact scan of the candidates naming files that truly hold a
    match. The scan applies the version's deletion vectors, so a file
    whose only matching rows are already DV-deleted is correctly NOT
    touched. Returns (matches_column, touched_set, untouched_list), or
    None when nothing can match."""
    candidates = prune_files(manifest, predicates)
    if not candidates:
        return None
    matches = _predicate_match(predicates)
    cand_df = _read_data_files(
        spark, table_dir, manifest, candidates, keep_file_col="__file"
    )
    touched_rows = (
        cand_df.filter(matches).select("__file").distinct().collect()
    )
    touched = {r["__file"] for r in touched_rows}
    if not touched:
        return None
    untouched = [f for f in manifest["files"] if f not in touched]
    return matches, touched, untouched


def _commit_rewrite(
    table_dir: str,
    df: DataFrame,
    *,
    untouched: list[str],
    schema: dict | None,
    txn_id: str | None,
    require_parent: int | None = None,
    parent_manifest: dict | None = None,
    change: dict | None = None,
) -> int:
    """Write ``df`` as the rewrite files of a copy-on-write commit and
    publish (overwrite op) with the untouched files retained and footer
    stats recorded for the new files. The rewritten rows validate against
    the table's CHECK constraints before the manifest publishes (the
    retained files already satisfied them at their own commit).

    ``parent_manifest`` (the version the rewrite targeted) lets the
    commit CARRY the deletion vectors still pending on retained files:
    rewritten files had their DVs applied during the read (so their DV
    entries drop), untouched files keep theirs — the delete-file set
    carries whenever any retained file still has deleted rows. Equality
    entries carry the same way, each entry's scope intersected with the
    retained files (an entry whose scoped files all rewrote drops)."""
    # rewrites retain parent files, so existing fields MUST keep the
    # parent's physical assignment; fields the rewrite adds (merge
    # widening) mint against the parent's tombstones
    phys = _commit_phys(parent_manifest, df.schema.fieldNames())
    inv = {p: l for l, p in phys.items()}
    spec = (parent_manifest or {}).get("partition_spec") or []
    write_df = df
    if spec and all(inv.get(e["col"], e["col"]) in df.columns for e in spec):
        # keep the rewrite's files on the table's declared layout (the
        # explicit count defeats AQE's coalesce-to-one on small rewrites)
        write_df = df.repartition(
            int(df.sparkSession.conf.get("spark.sql.shuffle.partitions")),
            *[_transform_expr(e, inv.get(e["col"], e["col"])) for e in spec],
        )
    # violation counters ride the write job (no staged re-read — at
    # scale that second pass re-reads every rewritten byte); a tip that
    # moved mid-write falls back to the exact staged-read validation.
    # No type gate here: a rewrite's df is produced by reading the table,
    # so its types ARE the declared types. parent_manifest is reused when
    # it IS the pre-write tip (every DML caller passes it at that tip) so
    # the common case re-parses no manifest at all.
    pre_tip = latest_version(table_dir)
    if pre_tip is None:
        pre_tip_manifest = None
    elif require_parent == pre_tip and parent_manifest is not None:
        pre_tip_manifest = parent_manifest
    else:
        pre_tip_manifest = _read_manifest(table_dir, pre_tip)
    write_df, chk_obs = _constraint_observation(
        write_df, (pre_tip_manifest or {}).get("constraints")
    )
    commit_dir = os.path.join(table_dir, f"data-{uuid.uuid4().hex[:12]}")
    _to_physical_df(write_df, phys).write.parquet(commit_dir)
    new_files = sorted(
        os.path.join(os.path.basename(commit_dir), f)
        for f in os.listdir(commit_dir)
        if f.endswith(".parquet")
    )
    tip = latest_version(table_dir)
    if tip is not None:
        tip_constraints = (
            pre_tip_manifest if tip == pre_tip and pre_tip_manifest is not None
            else _read_manifest(table_dir, tip)
        ).get("constraints")
        if chk_obs is not None and tip == pre_tip:
            _raise_observed_violations(chk_obs, tip_constraints or {})
        elif tip_constraints:
            from pyspark.sql import functions as F

            # declared read of the just-written files: their schema is
            # known exactly (df under physical names), so inference would
            # be a wasted footer job per rewrite commit
            staged = df.sparkSession.read.schema(
                _physical_struct(df.schema.jsonValue(), phys)
            ).parquet(commit_dir)
            inv = {p: l for l, p in phys.items()}
            staged = staged.select(
                *[F.col(c).alias(inv.get(c, c)) for c in staged.columns]
            )
            _check_constraints(staged, tip_constraints)
    carried_dvc = {
        f: n
        for f, n in ((parent_manifest or {}).get("dv_counts") or {}).items()
        if f in set(untouched)
    }
    carried_dv_files = (
        (parent_manifest or {}).get("delete_files") if carried_dvc else None
    )
    carried_eq = []
    for e in (parent_manifest or {}).get("eq_deletes") or []:
        still = [f for f in e["files"] if f in set(untouched)]
        if still:
            carried_eq.append({**e, "files": still})
    new_stats = _commit_stats(table_dir, new_files)
    if spec:
        for f, tuples in _compute_pvals(
            df.sparkSession, table_dir, new_files, spec,
            schema=_physical_struct(df.schema.jsonValue(), phys),
        ).items():
            new_stats.setdefault(f, {})["__pvals"] = tuples
    return publish_manifest(
        table_dir,
        new_files,
        mode="overwrite",
        txn_id=txn_id,
        schema=schema,
        base_files=untouched,
        new_stats=new_stats,
        require_parent=require_parent,
        delete_files=carried_dv_files,
        dv_counts=carried_dvc or None,
        eq_deletes=carried_eq or None,
        change=change,
        phys=phys,
    )


def delete_where(
    spark: SparkSession,
    table_dir: str,
    predicates: list[tuple],
    *,
    txn_id: str | None = None,
    strategy: str = "copy_on_write",
) -> int:
    """DELETE by predicate (the DML triple's third leg beside append and
    ``merge_upsert``), in either lakehouse strategy:

    ``copy_on_write`` (default) — two-stage file targeting keeps the
    rewrite minimal: the manifest stats first EXCLUDE files whose
    min/max prove no row matches (``prune_files`` — pure metadata), then
    one scan of the surviving candidates names the files that actually
    contain a match; ONLY those rewrite, keeping their non-matching
    rows. Untouched files — stats-excluded or match-free — carry into
    the new manifest verbatim.

    ``merge_on_read`` — DELETION VECTORS (the Delta DV / Iceberg
    position-delete shape): NO data file rewrites at all. One scan of
    the stats-surviving candidates records the matching rows' positions
    — ``(file, pos)`` from the scan's own ``_metadata.row_index`` — as
    small position-delete parquet files, and a metadata commit
    (op ``delete``) attaches them to the table. Every reader applies
    them as an anti-join at scan time (``_read_data_files``); a later
    ``compact_snapshot`` materializes them back to clean files. Write
    cost is proportional to DELETED rows, not touched files — the right
    strategy for frequent small deletes (GDPR erasure, CDC retractions)
    on 100 TB tables, trading a bounded read-side anti-join until the
    next compaction. Stacked MoR deletes compose: the candidate scan
    itself is DV-aware, so re-deleting an already-deleted row cannot
    double-record its position.

    ``predicates`` are conjunctive ``(col, op, value)`` triples (the
    ``scan_snapshot`` format). Deletion is exact under both strategies:
    rows where the conjunction is TRUE go; FALSE or NULL stay. A delete
    matching nothing publishes nothing and returns the current version;
    txn ids make replays no-op; both strategies conflict-guard against
    a concurrent rewrite (``require_parent``)."""
    from pyspark.sql import functions as F

    if strategy not in ("copy_on_write", "merge_on_read"):
        raise ValueError(f"unknown delete strategy: {strategy!r}")
    tip = latest_version(table_dir)
    if tip is None:
        raise FileNotFoundError(f"no snapshots in {table_dir!r}")
    if txn_id is not None:
        done = find_txn(table_dir, txn_id)
        if done is not None:
            return done
    manifest = _read_manifest(table_dir, tip)
    if strategy == "merge_on_read":
        candidates = prune_files(manifest, predicates)
        if not candidates:
            return tip
        matches = _predicate_match(predicates)
        cand = _read_data_files(
            spark,
            table_dir,
            manifest,
            candidates,
            keep_file_col="__file",
            keep_pos_col="__pos",
        )
        positions = cand.filter(matches).select(
            F.col("__file").alias("file"), F.col("__pos").alias("pos")
        )
        dv_dir = os.path.join(table_dir, f"dv-{uuid.uuid4().hex[:12]}")
        positions.write.parquet(dv_dir)
        dv_files = sorted(
            os.path.join(os.path.basename(dv_dir), f)
            for f in os.listdir(dv_dir)
            if f.endswith(".parquet")
        )
        # per-data-file deleted-row counts: bounded driver list
        # (≤ |files|) — keeps the metadata-only COUNT(*) exact under DVs
        counts = {
            r["file"]: r["n"]
            for r in spark.read.schema(_dv_schema()).parquet(dv_dir)
            .groupBy("file")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
        if not counts:  # nothing matched: remove the empty staging dir
            import shutil

            shutil.rmtree(dv_dir, ignore_errors=True)
            return tip
        return publish_manifest(
            table_dir,
            [],
            mode="delete",
            txn_id=txn_id,
            delete_files=dv_files,
            dv_counts=counts,
            require_parent=tip,
        )
    targets = _target_files(spark, table_dir, manifest, predicates)
    if targets is None:
        return tip
    matches, touched, untouched = targets
    keep_df = _read_data_files(
        spark, table_dir, manifest, [f for f in manifest["files"] if f in touched]
    ).filter(~matches)
    return _commit_rewrite(
        table_dir,
        keep_df,
        untouched=untouched,
        schema=manifest.get("schema"),
        txn_id=txn_id,
        require_parent=tip,
        parent_manifest=manifest,
        change={"kind": "rewrite"},
    )


def delete_by_key(
    spark: SparkSession,
    table_dir: str,
    keys: DataFrame,
    key_cols: list[str] | str,
    *,
    txn_id: str | None = None,
) -> int:
    """EQUALITY DELETE (Iceberg v2's second merge-on-read form): remove
    every row whose ``key_cols`` tuple appears in ``keys``, by committing
    the key set itself — NO data file is rewritten AND no data file is
    even READ. Where the positional form (``delete_where(strategy=
    "merge_on_read")``) pays one candidate scan to resolve positions,
    this commits in O(|keys|): write the distinct key rows as parquet,
    publish a ``delete`` manifest whose equality entry records the key
    columns, the key files, and the SCOPE — the data files present at
    commit time. Readers apply a key anti-join restricted to that scope,
    so rows of the same key appended LATER stay visible (the CDC
    retract-then-reinsert pattern); compaction materializes pending
    entries back to clean files.

    This is the cheapest possible 100 TB delete: a GDPR erasure of k
    users costs k rows of parquet and one manifest write, deferring all
    data I/O to the next compaction. The trade: per-file deleted-row
    counts are unknowable without a scan, so ``table_stats_summary``
    withholds the metadata-only COUNT while equality deletes are pending
    (positions keep it exact; this form does not).

    NULL-keyed rows in ``keys`` are dropped (SQL equality semantics — a
    NULL key matches nothing). A ``txn_id`` makes replays no-op. The
    commit conflict-guards against concurrent rewrites."""
    from pyspark.sql import functions as F

    kcols = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    tip = latest_version(table_dir)
    if tip is None:
        raise FileNotFoundError(f"no snapshots in {table_dir!r}")
    if txn_id is not None:
        done = find_txn(table_dir, txn_id)
        if done is not None:
            return done
    manifest = _read_manifest(table_dir, tip)
    if not manifest["files"]:
        # an equality entry is scoped to the data files present at commit
        # time; with zero files the delete can never match anything, and
        # the legacy footer-derived schema below would have no footer to
        # read — publish nothing, return the tip unchanged
        return tip
    if manifest.get("schema") is not None:
        from pyspark.sql.types import StructType

        declared = {
            f.name: f.dataType
            for f in StructType.fromJson(manifest["schema"]).fields
        }
    else:
        # legacy schema-less manifest: derive the column types from a
        # data-file FOOTER (metadata-only) — mismatched key types (int32
        # keys vs an int64 column) must still cast, because the
        # snapshot_table source's Arrow hash-join kernel requires exact
        # type equality at read time
        import pyarrow.parquet as pq
        from pyspark.sql.pandas.types import from_arrow_schema

        footer = from_arrow_schema(
            pq.read_schema(os.path.join(table_dir, manifest["files"][0]))
        )
        declared = {f.name: f.dataType for f in footer.fields}
    missing = [k for k in kcols if k not in declared]
    if missing:
        raise ValueError(f"key columns not in table schema: {missing}")
    # align key types to the table's declared types: the DataFrame
    # anti-join would auto-cast, but the snapshot_table source's
    # Arrow hash-join kernel requires exact type equality. Key files
    # store PHYSICAL column names (stable across renames — an entry
    # keyed on a column later renamed still applies exactly); readers
    # translate at their scan boundary.
    phys = _phys_map(manifest)
    key_exprs = [
        F.col(k).cast(declared[k]).alias(phys.get(k, k)) for k in kcols
    ]
    kcols_phys = [phys.get(k, k) for k in kcols]
    key_rows = keys.select(*key_exprs).na.drop(how="any").distinct()
    eq_dir = os.path.join(table_dir, f"eqdv-{uuid.uuid4().hex[:12]}")
    key_rows.write.parquet(eq_dir)
    eq_files = sorted(
        os.path.join(os.path.basename(eq_dir), f)
        for f in os.listdir(eq_dir)
        if f.endswith(".parquet")
    )
    # footer-metadata row count (no data read): an empty key set deletes
    # nothing — remove the staging dir and publish nothing
    import pyarrow.parquet as pq

    n_keys = sum(
        pq.ParquetFile(os.path.join(table_dir, f)).metadata.num_rows
        for f in eq_files
    )
    if n_keys == 0:
        import shutil

        shutil.rmtree(eq_dir, ignore_errors=True)
        return tip
    return publish_manifest(
        table_dir,
        [],
        mode="delete",
        txn_id=txn_id,
        eq_deletes=[
            {
                "key_cols": kcols_phys,
                "delete_files": eq_files,
                "files": list(manifest["files"]),
                # the exact struct written above — readers declare it
                # instead of re-reading a key-file footer per entry at
                # every plan build (_eq_keys_schema)
                "key_schema": key_rows.schema.jsonValue(),
            }
        ],
        require_parent=tip,
    )


def update_where(
    spark: SparkSession,
    table_dir: str,
    predicates: list[tuple],
    assignments: dict[str, object],
    *,
    txn_id: str | None = None,
) -> int:
    """UPDATE ... SET ... WHERE as a copy-on-write commit — the last leg
    of the DML family (append / merge / delete / update). Same two-stage
    file targeting as ``delete_where``: manifest stats exclude files that
    cannot match, one exact scan names the files that do, ONLY those
    rewrite — matching rows get ``assignments`` applied (each value a
    Column expression or a literal; expressions may reference the row's
    own columns, e.g. ``{"bal": F.col("bal") * 1.1}``), non-matching rows
    in the same files rewrite unchanged. Untouched files carry verbatim;
    no-match updates publish nothing; txn ids make replays no-op.
    Assignments cannot change a column's type (same contract as schema
    evolution: a type change is a table rewrite)."""
    from pyspark.sql import functions as F

    tip = latest_version(table_dir)
    if tip is None:
        raise FileNotFoundError(f"no snapshots in {table_dir!r}")
    if txn_id is not None:
        done = find_txn(table_dir, txn_id)
        if done is not None:
            return done
    manifest = _read_manifest(table_dir, tip)
    targets = _target_files(spark, table_dir, manifest, predicates)
    if targets is None:
        return tip
    matches, touched, untouched = targets
    base = _read_data_files(
        spark, table_dir, manifest, [f for f in manifest["files"] if f in touched]
    )
    unknown = [c for c in assignments if c not in base.columns]
    if unknown:
        raise ValueError(f"update_where assigns unknown columns: {unknown}")
    rewritten = base.select(
        *[
            F.when(
                matches,
                assignments[c]
                if hasattr(assignments[c], "cast")
                else F.lit(assignments[c]),
            )
            .otherwise(F.col(c))
            .cast(base.schema[c].dataType)
            .alias(c)
            if c in assignments
            else F.col(c)
            for c in base.columns
        ]
    )
    return _commit_rewrite(
        table_dir,
        rewritten,
        untouched=untouched,
        schema=manifest.get("schema"),
        txn_id=txn_id,
        require_parent=tip,
        parent_manifest=manifest,
        change={"kind": "update"},
    )


def _tag_path(table_dir: str, name: str) -> str:
    import re

    if not re.fullmatch(r"[A-Za-z0-9][A-Za-z0-9._-]*", name):
        raise ValueError(f"invalid tag name: {name!r}")
    return os.path.join(table_dir, _SNAPDIR, f"tag-{name}.json")


def tag_snapshot(table_dir: str, name: str, version: int | None = None) -> int:
    """Create an IMMUTABLE named ref to a version (Iceberg tags / git
    tags for tables): ``tag-<name>`` pins ``version`` (default: the
    tip). Tags are exclusive-create — re-tagging an existing name
    refuses (delete first), the same no-silent-movement contract as the
    commit protocol — and a tagged version is EXEMPT from vacuum: its
    manifest and files stay until the tag is deleted, whatever the
    retention window says. That is the reproducibility primitive a
    training pipeline needs — tag the corpus version a model trained on
    and the exact bytes remain readable for as long as the tag lives,
    while untagged history ages out normally. Cost: one tiny JSON write;
    nothing is copied."""
    tip = latest_version(table_dir)
    if tip is None:
        raise FileNotFoundError(f"no snapshots in {table_dir!r}")
    version = tip if version is None else version
    if not os.path.exists(_manifest_path(table_dir, version)):
        raise FileNotFoundError(f"version {version} is not retained")
    try:
        with open(_tag_path(table_dir, name), "x") as f:
            json.dump({"version": version}, f)
    except FileExistsError:
        raise ValueError(
            f"tag {name!r} already exists (tags are immutable; delete_tag first)"
        ) from None
    return version


def resolve_tag(table_dir: str, name: str) -> int:
    """Tag name -> pinned version (for ``read_snapshot(spark, dir,
    resolve_tag(dir, name))`` / ``restore_snapshot`` composition)."""
    path = _tag_path(table_dir, name)
    if not os.path.exists(path):
        raise FileNotFoundError(f"no tag {name!r} in {table_dir!r}")
    with open(path) as f:
        return json.load(f)["version"]


def list_tags(table_dir: str) -> dict:
    """All tags as {name: version}, name-sorted."""
    snap = os.path.join(table_dir, _SNAPDIR)
    out = {}
    if os.path.isdir(snap):
        for f in sorted(os.listdir(snap)):
            if f.startswith("tag-") and f.endswith(".json"):
                with open(os.path.join(snap, f)) as fh:
                    out[f[4:-5]] = json.load(fh)["version"]
    return out


def delete_tag(table_dir: str, name: str) -> None:
    """Drop a tag; the pinned version becomes ordinary history and ages
    out at the next vacuum like any other."""
    path = _tag_path(table_dir, name)
    if not os.path.exists(path):
        raise FileNotFoundError(f"no tag {name!r} in {table_dir!r}")
    os.remove(path)


def vacuum(
    table_dir: str,
    *,
    keep_from_version: int,
    clean_orphans: bool = False,
    dry_run: bool = False,
) -> list[str]:
    """Delete data files unreferenced by every version >=
    ``keep_from_version`` and drop the older manifests — the explicit,
    separate step that makes time travel a RETENTION POLICY rather than
    unbounded storage. Returns the deleted file paths. Never touches a
    file any retained version references.

    ``clean_orphans`` additionally removes data files referenced by NO
    manifest at all — debris of crashed or race-losing commits. Only safe
    when no commit is in flight (an in-flight commit's files are by
    definition unreferenced until its manifest publishes); production
    systems gate this on a modification-time retention window instead.

    Delete files (positional DVs and equality-delete key files)
    participate exactly like data files: one referenced by any retained
    version is live; those only old manifests referenced are removed
    with them. TAGGED versions (``tag_snapshot``) are pinned: their
    manifests and files survive any retention window until the tag is
    deleted.

    ``dry_run`` computes and returns the would-delete file list without
    removing anything (files or manifests) — the Delta ``VACUUM ...
    DRY RUN`` shape: retention is destructive and irreversible, so the
    operator exposes the look-before-you-leap form."""
    tip = latest_version(table_dir)
    if tip is None or keep_from_version > tip:
        raise ValueError(f"keep_from_version {keep_from_version} beyond tip {tip}")
    pinned = set(list_tags(table_dir).values())
    retained = set(range(keep_from_version, tip + 1)) | pinned
    live: set[str] = set()
    for v in sorted(retained):
        if not os.path.exists(_manifest_path(table_dir, v)):
            continue
        m = _read_manifest(table_dir, v)
        live.update(m["files"])
        live.update(m.get("delete_files") or [])
        live.update(
            f for e in (m.get("eq_deletes") or []) for f in e["delete_files"]
        )
    deleted = []
    for v in range(keep_from_version):
        if v in pinned:
            continue
        mp = _manifest_path(table_dir, v)
        if not os.path.exists(mp):
            continue
        m = _read_manifest(table_dir, v)
        eq_files = [
            f for e in (m.get("eq_deletes") or []) for f in e["delete_files"]
        ]
        for f in m["files"] + (m.get("delete_files") or []) + eq_files:
            if f not in live:
                p = os.path.abspath(_data_path(table_dir, m, f))
                # ownership guard: a shallow clone's manifest references
                # files in the SOURCE table's directory — retention on
                # the clone must never delete what it doesn't own
                if not p.startswith(os.path.abspath(table_dir) + os.sep):
                    continue
                if os.path.exists(p):
                    if not dry_run:
                        os.remove(p)
                    deleted.append(p)
        if not dry_run:
            os.remove(mp)
    if clean_orphans:
        for d in os.listdir(table_dir):
            if not (d.startswith("data-") or d.startswith(("dv-", "eqdv-"))):
                continue
            for f in os.listdir(os.path.join(table_dir, d)):
                rel = os.path.join(d, f)
                if f.endswith(".parquet") and rel not in live:
                    p = os.path.join(table_dir, rel)
                    if not dry_run:
                        os.remove(p)
                    deleted.append(p)
    return deleted


def snapshot_stream_merge_sink(
    changes: DataFrame,
    table_dir: str,
    checkpoint_dir: str,
    *,
    key: str,
    order_cols: list[str],
    delete_predicate=None,
    txn_scope: str | None = None,
    strategy: str = "copy_on_write",
):
    """Streaming CDC APPLY: maintain a snapshot table as the merged view
    of a change stream — each micro-batch compacts to one row per key
    (latest by ``order_cols``, descending) and applies under
    deterministic txn ids (scope: ``stream_txn_scope`` — two independent
    change streams on one table never collide on epoch numbers); rows
    whose compacted form satisfies ``delete_predicate`` delete their
    key. Replayed epochs no-op (txn idempotence), and cross-batch
    last-writer-wins holds whenever the stream delivers changes in
    ``order_cols`` order across batches (true for the `snapshot_table`
    change feed, whose offsets are the table's own ordered versions).

    ``strategy`` picks the lakehouse write shape:

    ``copy_on_write`` (default) — each batch applies as one
    ``merge_upsert`` (txn ``merge-<scope>-<epoch>``): the Delta
    "streaming upsert with foreachBatch" pattern. Per-batch cost is the
    touched-files rewrite — read-optimized, write pays.

    ``merge_on_read`` — the Flink→Iceberg CDC shape: each batch commits
    an EQUALITY DELETE of its key set (``delete_by_key``, txn
    ``morD-<scope>-<epoch>``) retracting any prior version of the keys,
    then APPENDS the surviving rows (txn ``morA-<scope>-<epoch>``).
    ZERO table reads and zero rewrites per epoch — ingest cost is
    O(batch), independent of table size — while readers pay one scoped
    key anti-join per un-compacted epoch; run ``compact_snapshot``
    periodically to fold the entries (the exact Iceberg maintenance
    contract). The two commits are individually idempotent, so a crash
    between them replays safely: the delete no-ops, the append lands.

    The per-batch compaction shuffles only the BATCH on the merge key.
    Returns the started query (AvailableNow)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    if strategy not in ("copy_on_write", "merge_on_read"):
        raise ValueError(f"unknown merge sink strategy: {strategy!r}")
    scope = stream_txn_scope(checkpoint_dir) if txn_scope is None else txn_scope

    def apply_batch(batch: DataFrame, epoch_id: int) -> None:
        if batch.isEmpty():
            return
        w = Window.partitionBy(key).orderBy(
            *[F.col(c).desc() for c in order_cols]
        )
        compacted = (
            batch.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
        )
        txn = f"merge-{scope}-{epoch_id}"
        if delete_predicate is not None:
            compacted = compacted.withColumn(
                "__del", F.coalesce(delete_predicate, F.lit(False))
            )
            del_col = "__del"
        else:
            del_col = None
        keep = (
            compacted.filter(~F.col(del_col)).drop(del_col)
            if del_col
            else compacted
        )
        if latest_version(table_dir) is None:
            snapshot_commit(keep, table_dir, txn_id=txn)
        else:
            # strategy="merge_on_read" retracts every key this batch
            # touches as an equality delete scoped to the files that
            # exist NOW, then appends the new versions (which land after
            # the delete's scope and therefore stay visible) — both
            # phases under per-phase txn ids merge_upsert derives
            merge_upsert(
                batch.sparkSession,
                table_dir,
                compacted,
                key,
                delete_col=del_col,
                txn_id=txn,
                strategy=strategy,
            )

    return (
        changes.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def stream_txn_scope(checkpoint_dir: str) -> str:
    """Stable per-stream txn namespace, derived from the checkpoint path
    — the value Delta makes the user pick as ``txnAppId``. Epoch numbers
    are only unique WITHIN one logical stream (one checkpoint); two
    different streams appending to the same table would otherwise both
    commit 'epoch 0' and the second's batch would be silently swallowed
    as a replay. Stable across restarts of the same checkpoint (that is
    what makes crash replays no-op); the unsolvable residue — deleting a
    checkpoint but reusing its exact path — is the same caveat Delta's
    txnAppId carries, and callers can pass an explicit scope instead."""
    import hashlib

    return hashlib.md5(os.path.abspath(checkpoint_dir).encode()).hexdigest()[:8]


def snapshot_stream_sink(
    records: DataFrame,
    table_dir: str,
    checkpoint_dir: str,
    *,
    txn_scope: str | None = None,
):
    """Streaming ingest into a snapshot table with EXACTLY-ONCE appends:
    ``foreachBatch`` commits each micro-batch under the deterministic txn
    id ``stream-<scope>-<epoch>`` (scope: ``stream_txn_scope``), so a
    post-crash replay of an epoch (Spark's at-least-once foreachBatch
    contract) finds the txn already committed and no-ops — the
    idempotence turning at-least-once into exactly-once, the same
    protocol the file sink's transaction log implements and Delta's
    ``txnAppId``/``txnVersion`` exposes — while a DIFFERENT stream
    (different checkpoint) appending to the same table never collides.
    Readers meanwhile get a consistent version per micro-batch instead
    of seeing half-written files appear mid-listing. Returns the started
    StreamingQuery (AvailableNow)."""
    scope = stream_txn_scope(checkpoint_dir) if txn_scope is None else txn_scope

    def commit_batch(batch: DataFrame, epoch_id: int) -> None:
        snapshot_commit(
            batch, table_dir, mode="append", txn_id=f"stream-{scope}-{epoch_id}"
        )

    return (
        records.writeStream.foreachBatch(commit_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def vacuum_by_retention(
    table_dir: str,
    *,
    retention_seconds: float,
    now: float | None = None,
    clean_orphans: bool = False,
    dry_run: bool = False,
) -> list[str]:
    """Time-based retention on top of ``vacuum``: keep every version
    whose manifest was PUBLISHED within the window (commit mtime — the
    exclusive-create timestamp), drop older history. This is the policy
    shape production tables actually run ("7 days of time travel"),
    mapped onto the version-based primitive: find the oldest version
    still inside the window and delegate. The tip always survives, even
    if older than the window — a retention sweep must never delete the
    current table. ``now`` is injectable for deterministic tests."""
    import time as _time

    now = _time.time() if now is None else now
    cutoff = now - retention_seconds
    tip = latest_version(table_dir)
    if tip is None:
        raise FileNotFoundError(f"no snapshots in {table_dir!r}")
    keep_from = tip
    for v in range(tip, -1, -1):
        mp = _manifest_path(table_dir, v)
        if not os.path.exists(mp):
            break
        if os.path.getmtime(mp) >= cutoff:
            keep_from = v
        else:
            break
    return vacuum(
        table_dir,
        keep_from_version=keep_from,
        clean_orphans=clean_orphans,
        dry_run=dry_run,
    )


def table_stats_summary(table_dir: str, version: int | None = None) -> dict:
    """Metadata-only table statistics — the Iceberg/Delta trick of
    answering ``COUNT(*)`` / ``MIN`` / ``MAX`` from the manifest without
    scanning a byte of data: fold the per-file stats. Returns
    ``{"rows": n | None, "columns": {col: {"min", "max", "nulls"}}}``;
    ``rows`` is None when any file predates stats recording (the honest
    answer — a partial count would be wrong), and a column appears only
    when EVERY file carries its stats (a per-file min/max can bound the
    table only if no file is missing). Cost: zero I/O beyond the one
    manifest read.

    Deletion vectors: ``rows`` stays EXACT (per-file footer counts minus
    the manifest's per-file deleted-position counts — both metadata),
    but per-column min/max are withheld for a version with pending DVs:
    a deleted row may have held the extremum, so the folded values are
    only bounds, and this surface promises exact answers. Compaction
    materializes the DVs and restores the columns. EQUALITY deletes
    withhold ``rows`` as well — their per-file deleted counts are
    unknowable without a scan (the price of the zero-scan delete);
    compaction restores everything."""
    tip = latest_version(table_dir)
    if tip is None:
        raise FileNotFoundError(f"no snapshots in {table_dir!r}")
    manifest = _read_manifest(table_dir, tip if version is None else version)
    stats = manifest.get("stats") or {}
    files = manifest["files"]
    dv_counts = manifest.get("dv_counts") or {}
    eq_pending = bool(manifest.get("eq_deletes"))
    per_file = [stats.get(f) for f in files]
    rows = None
    if not eq_pending and all(s is not None and "__rows" in s for s in per_file):
        rows = sum(s["__rows"] for s in per_file) - sum(dv_counts.values())
    columns: dict = {}
    if dv_counts or eq_pending:
        return {"rows": rows, "columns": columns}
    inv = _inv_phys(manifest)  # stats key on physical; report logical
    if per_file and all(s is not None for s in per_file):
        shared = set.intersection(
            *(set(k for k in s if k != "__rows" and "min" in s[k]) for s in per_file)
        ) if per_file else set()
        for c in sorted(shared):
            columns[inv.get(c, c)] = {
                "min": min(s[c]["min"] for s in per_file),
                "max": max(s[c]["max"] for s in per_file),
                "nulls": sum(s[c].get("nulls", 0) for s in per_file),
            }
        # union-merged HLL sketches → approximate table distinct counts,
        # still zero I/O; a column reports only when EVERY file carries
        # its sketch (a partial union is just a lower bound)
        for c in manifest.get("ndv_cols") or []:
            sketches = [(s.get(c) or {}).get("ndv") for s in per_file]
            if sketches and all(sk is not None for sk in sketches):
                try:
                    columns.setdefault(inv.get(c, c), {})[
                        "approx_ndv"
                    ] = _hll_estimate(_hll_merge(sketches))
                except ValueError:
                    pass  # mixed precisions: column stays uncovered
    return {"rows": rows, "columns": columns}


def add_column(
    table_dir: str, col: str, dtype: str, *, txn_id: str | None = None
) -> int:
    """ALTER TABLE ... ADD COLUMN as a METADATA-ONLY commit: widen the
    declared schema with a nullable ``col`` of ``dtype`` (a DDL string,
    e.g. ``"double"``) — every existing file surfaces NULL for it under
    the declared-schema read, exactly like the implicit add-column
    evolution an append with new columns performs, but without writing
    any data. The explicit form exists so a schema can evolve AHEAD of
    the first data that uses it (the usual migration order). Re-adding
    a DROPPED name is legal and mints a FRESH physical name, so old
    files' bytes surface as NULL, never as resurrected values (the
    physical-column-mapping contract; see ``rename_column``)."""
    from pyspark.sql.types import StructField, StructType, _parse_datatype_string

    tip = latest_version(table_dir)
    if tip is None:
        raise FileNotFoundError(f"no snapshots in {table_dir!r}")
    if txn_id is not None:
        done = find_txn(table_dir, txn_id)
        if done is not None:
            return done
    manifest = _read_manifest(table_dir, tip)
    if manifest.get("schema") is None:
        raise ValueError(
            "add_column needs a declared table schema (commit once with a "
            "schema-bearing writer first)"
        )
    schema = StructType.fromJson(manifest["schema"])
    if col in schema.fieldNames():
        raise ValueError(f"column {col!r} already exists")
    widened = StructType(
        list(schema.fields)
        + [StructField(col, _parse_datatype_string(dtype), nullable=True)]
    ).jsonValue()
    phys = _phys_map(manifest)
    phys[col] = _mint_physical(col, _used_physical(manifest))
    return publish_manifest(
        table_dir,
        [],
        mode="append",
        txn_id=txn_id,
        schema=widened,
        replace_schema=True,
        require_parent=tip,
        phys=phys,
    )


def alter_column_type(
    table_dir: str, col: str, dtype: str, *, txn_id: str | None = None
) -> int:
    """ALTER TABLE ... ALTER COLUMN ... TYPE as a METADATA-ONLY commit:
    widen the declared type of ``col`` to ``dtype`` along the safe
    chains (byte→short→int→long, float→double, decimal least-upper-
    bound — exactly ``_wider_type``'s vocabulary, the same oracle the
    implicit append-widening uses). No data file rewrites: files keep
    their written (narrow) types and the declared-schema read promotes
    them at scan time (Spark 4's vectorized parquet reader; the
    snapshot_table source's pyarrow cast path). The explicit form
    exists so a schema can widen AHEAD of the first wide data — the
    usual migration order — instead of as an append side effect.

    Narrowing or cross-chain changes refuse loudly (they are a table
    rewrite, not a commit side effect). Re-declaring the CURRENT type
    is a no-op returning the tip unchanged."""
    from pyspark.sql.types import StructField, StructType, _parse_datatype_string

    tip = latest_version(table_dir)
    if tip is None:
        raise FileNotFoundError(f"no snapshots in {table_dir!r}")
    if txn_id is not None:
        done = find_txn(table_dir, txn_id)
        if done is not None:
            return done
    manifest = _read_manifest(table_dir, tip)
    if manifest.get("schema") is None:
        raise ValueError(
            "alter_column_type needs a declared table schema (commit once "
            "with a schema-bearing writer first)"
        )
    schema = StructType.fromJson(manifest["schema"])
    if col not in schema.fieldNames():
        raise ValueError(f"column {col!r} is not in the table schema")
    target = _parse_datatype_string(dtype)
    have = schema[col].dataType
    if target == have:
        return tip
    w = _wider_type(have, target)
    if w is None or w != target:
        raise ValueError(
            f"cannot alter column {col!r}: {have.simpleString()} -> "
            f"{target.simpleString()} is not a widening along "
            "byte->short->int->long, float->double, or a decimal "
            "least-upper-bound (narrowing/cross-chain changes rewrite "
            "data — use a CTAS)"
        )
    widened = StructType(
        [
            StructField(f.name, target if f.name == col else f.dataType,
                        f.nullable, f.metadata)
            for f in schema.fields
        ]
    ).jsonValue()
    return publish_manifest(
        table_dir,
        [],
        mode="append",
        txn_id=txn_id,
        schema=widened,
        replace_schema=True,
        require_parent=tip,
    )


def drop_column(table_dir: str, col: str, *, txn_id: str | None = None) -> int:
    """ALTER TABLE ... DROP COLUMN as a METADATA-ONLY commit: publish a
    new version whose declared schema omits ``col`` — no data file is
    touched (declared-schema reads already project the manifest schema,
    so every reader stops seeing the column immediately), and time
    travel still shows it in pre-drop versions, which read with their
    own schema.

    The dropped column's PHYSICAL name is recorded as a TOMBSTONE
    (``dropped_cols``): retained files still hold its bytes, so no
    later column may ever RESOLVE to that physical name — re-adding
    the same logical name mints a fresh physical (``add_column`` /
    append evolution), reading NULL instead of resurrected values;
    RESTORE to a pre-drop version clears the tombstone (explicit user
    intent to get the column back). Same contract as Delta column
    mapping / Iceberg field ids.

    Guards: refuses while a table CHECK constraint references the
    column (drop the constraint first) and while pending EQUALITY
    deletes key on it (readers still need the column for the anti-join
    — compact first). Declared bloom/NDV sketch lists shed the column
    automatically. Cost: one manifest write, at any table size."""
    import re

    tip = latest_version(table_dir)
    if tip is None:
        raise FileNotFoundError(f"no snapshots in {table_dir!r}")
    if txn_id is not None:
        done = find_txn(table_dir, txn_id)
        if done is not None:
            return done
    manifest = _read_manifest(table_dir, tip)
    if manifest.get("schema") is None:
        raise ValueError(
            "drop_column needs a declared table schema (legacy schema-less "
            "manifests read from file footers, which still hold the column)"
        )
    from pyspark.sql.types import StructType

    schema = StructType.fromJson(manifest["schema"])
    if col not in schema.fieldNames():
        raise ValueError(f"column {col!r} is not in the table schema")
    if len(schema.fields) == 1:
        raise ValueError("cannot drop the table's only column")
    word = re.compile(rf"\b{re.escape(col)}\b")
    offending = [
        name
        for name, expr in (manifest.get("constraints") or {}).items()
        if word.search(expr)
    ]
    if offending:
        raise ValueError(
            f"column {col!r} is referenced by CHECK constraint(s) "
            f"{offending} — drop them first"
        )
    pcol = _phys_col(manifest, col)
    keyed = [
        e for e in manifest.get("eq_deletes") or [] if pcol in e["key_cols"]
    ]
    if keyed:
        raise ValueError(
            f"column {col!r} keys {len(keyed)} pending equality-delete "
            "entr(ies) — compact_snapshot first to materialize them"
        )
    in_spec = [
        e
        for e in manifest.get("partition_spec") or []
        if e["col"] == pcol
    ]
    if in_spec:
        raise ValueError(
            f"column {col!r} is a partition column ({_transform_name(in_spec[0])})"
            " — evolve the spec with a mode='overwrite' commit first"
        )
    narrowed = StructType(
        [f for f in schema.fields if f.name != col]
    ).jsonValue()
    # an [] explicitly CLEARS a declared list (None would inherit the
    # tip's, resurrecting the dropped column in it); both lists key on
    # PHYSICAL names, as does the tombstone
    trim = lambda cols: [c for c in cols if c != pcol]  # noqa: E731
    bloom = manifest.get("bloom_cols")
    ndv = manifest.get("ndv_cols")
    phys = _phys_map(manifest)
    phys.pop(col, None)
    return publish_manifest(
        table_dir,
        [],
        mode="append",
        txn_id=txn_id,
        schema=narrowed,
        replace_schema=True,
        dropped_cols=sorted(set(manifest.get("dropped_cols") or []) | {pcol}),
        bloom_cols=trim(bloom) if bloom else None,
        ndv_cols=trim(ndv) if ndv else None,
        require_parent=tip,
        phys=phys,
    )


def set_partition_spec(
    table_dir: str, partition_by: list, *, txn_id: str | None = None
) -> int:
    """PARTITION EVOLUTION as a METADATA-ONLY commit (Iceberg's model):
    declare a new spec — identity / ``(col, "day")`` / ``(col,
    "bucket", n)`` entries over the CURRENT logical names — and only
    files written AFTER it follow the new layout and record its
    tuples. Old files keep the tuples they recorded under the old spec;
    because ``prune_files`` matches tuples BY TRANSFORM NAME, a file
    without the current spec's names simply never partition-prunes
    (min/max stats still apply) — sound by construction, no rewrite at
    any size. ``partition_by=[]`` clears the spec (later commits stop
    clustering/recording). Run ``compact_snapshot`` afterwards to
    migrate old files onto the new layout when pruning them matters.

    Guards: columns must exist in the declared schema with the
    transform's supported types (same contract as the commit-time
    declaration). Spec entries store PHYSICAL names, so the evolution
    composes with RENAME."""
    tip = latest_version(table_dir)
    if tip is None:
        raise FileNotFoundError(f"no snapshots in {table_dir!r}")
    if txn_id is not None:
        done = find_txn(table_dir, txn_id)
        if done is not None:
            return done
    manifest = _read_manifest(table_dir, tip)
    if manifest.get("schema") is None:
        raise ValueError(
            "set_partition_spec needs a declared table schema"
        )
    from pyspark.sql.types import StructType

    schema = StructType.fromJson(manifest["schema"])
    norm = _norm_partition_by(partition_by)
    missing = [e["col"] for e in norm if e["col"] not in schema.fieldNames()]
    if missing:
        raise ValueError(f"partition columns not in the table: {missing}")
    for e in norm:
        tn = schema[e["col"]].dataType.typeName()
        ok = (
            tn in ("date", "timestamp", "timestamp_ntz")
            if e["kind"] == "day"
            else tn in ("byte", "short", "integer", "long", "string")
        )
        if not ok:
            raise ValueError(
                f"partition transform {e['kind']!r} does not support "
                f"column {e['col']!r} of type {tn}"
            )
    phys = _phys_map(manifest)
    spec = [{**e, "col": phys.get(e["col"], e["col"])} for e in norm]
    return publish_manifest(
        table_dir,
        [],
        mode="append",
        txn_id=txn_id,
        schema=manifest.get("schema"),
        require_parent=tip,
        partition_spec=spec,  # [] explicitly clears
    )


def rename_column(
    table_dir: str, old: str, new: str, *, txn_id: str | None = None
) -> int:
    """ALTER TABLE ... RENAME COLUMN as a METADATA-ONLY commit, enabled
    by physical column mapping: the schema field takes the new LOGICAL
    name while its PHYSICAL name — the column name actually inside every
    parquet file, immutable since the column was created — stays put in
    the manifest's ``phys`` map. No data file is touched at any table
    size; readers translate once at the scan boundary
    (``_read_data_files``); per-file stats, blooms, NDV sketches, and
    pending equality-delete keys all key on the physical name, so every
    prune and delete keeps applying exactly across the rename; time
    travel shows each version under its own names; the change feed
    crosses a mid-range rename by physical identity (pre-rename rows
    surface under the ending name). The Delta column-mapping / Iceberg
    field-id behavior, reduced to the manifest primitives
    (reference scope note: the reference engine is a stream publisher
    with no table format — this lives on the mandated warehouse layer).

    Guards: ``old`` must exist, ``new`` must not (a swap is two
    renames through a temp name); CHECK constraints referencing ``old``
    refuse (their SQL text would silently stop matching rows — rewrite
    the constraint first); legacy schema-less manifests refuse.
    Renaming TO a previously dropped name is fine: the dropped
    tombstone guards the PHYSICAL name, which a rename never reuses."""
    import re

    tip = latest_version(table_dir)
    if tip is None:
        raise FileNotFoundError(f"no snapshots in {table_dir!r}")
    if txn_id is not None:
        done = find_txn(table_dir, txn_id)
        if done is not None:
            return done
    manifest = _read_manifest(table_dir, tip)
    if manifest.get("schema") is None:
        raise ValueError(
            "rename_column needs a declared table schema (legacy "
            "schema-less manifests read from file footers, which hold "
            "only physical names)"
        )
    from pyspark.sql.types import StructField, StructType

    schema = StructType.fromJson(manifest["schema"])
    if old not in schema.fieldNames():
        raise ValueError(f"column {old!r} is not in the table schema")
    if new in schema.fieldNames():
        raise ValueError(f"column {new!r} already exists")
    word = re.compile(rf"\b{re.escape(old)}\b")
    offending = [
        name
        for name, expr in (manifest.get("constraints") or {}).items()
        if word.search(expr)
    ]
    if offending:
        raise ValueError(
            f"column {old!r} is referenced by CHECK constraint(s) "
            f"{offending} — drop and re-add them under the new name"
        )
    renamed = StructType(
        [
            StructField(new, f.dataType, f.nullable, f.metadata)
            if f.name == old
            else f
            for f in schema.fields
        ]
    ).jsonValue()
    phys = _phys_map(manifest)
    phys[new] = phys.pop(old, old)  # physical identity is preserved
    return publish_manifest(
        table_dir,
        [],
        mode="append",
        txn_id=txn_id,
        schema=renamed,
        replace_schema=True,
        require_parent=tip,
        phys=phys,
    )


def compaction_advice(
    table_dir: str,
    *,
    small_file_bytes: int = 32 * 1024 * 1024,
    max_delete_generations: int = 4,
    max_deleted_fraction: float = 0.05,
) -> dict:
    """WHEN to run maintenance, answered from metadata alone — the
    decision half of the Iceberg/Delta maintenance contract
    (``compact_snapshot`` is the action half). Zero data I/O: file
    sizes stat the named files, everything else folds the manifest.

    Returns ``{"bin_pack": bool, "materialize_deletes": bool,
    "reasons": [...], ...metrics}``:

    - ``bin_pack`` — the small-file tail (files under
      ``small_file_bytes``) is worth folding: ≥2 small files AND the
      tail is either many files (>25% of the table's file count) or
      enough of them that per-task overhead dominates their reads.
      Streaming epoch commits and narrow merges grow this tail; run
      ``compact_snapshot(small_file_bytes=...)`` — tail-proportional.
    - ``materialize_deletes`` — the merge-on-read backlog is worth
      folding: pending delete GENERATIONS (distinct delete commits
      still unmaterialized — each adds an anti-join to every read)
      exceed ``max_delete_generations``, or position-deleted rows
      exceed ``max_deleted_fraction`` of the table, or any equality
      entries are pending (they also suppress metadata-only COUNT and
      stats). Run ``compact_snapshot`` (full or incremental — rewritten
      files drain their deletes either way).

    The thresholds are deliberately coarse: the read tax and the
    compaction cost both scale with the same quantities the metrics
    report, so callers tune against their own read/write ratio —
    DV_BENCH/CDC_BENCH record the measured shape of that trade."""
    tip = latest_version(table_dir)
    if tip is None:
        raise FileNotFoundError(f"no snapshots in {table_dir!r}")
    manifest = _read_manifest(table_dir, tip)
    stats = manifest.get("stats") or {}
    sizes = {
        f: os.path.getsize(_data_path(table_dir, manifest, f))
        for f in manifest["files"]
        if os.path.exists(_data_path(table_dir, manifest, f))
    }
    small = [f for f, b in sizes.items() if b < small_file_bytes]
    # delete generations: distinct delete-file directories still pending
    # (each MoR commit stages its positions under one dv-* dir)
    dv_dirs = {f.split(os.sep)[0] for f in manifest.get("delete_files") or []}
    eq_entries = manifest.get("eq_deletes") or []
    generations = len(dv_dirs) + len(eq_entries)
    deleted = sum((manifest.get("dv_counts") or {}).values())
    total_rows = None
    if all("__rows" in (stats.get(f) or {}) for f in manifest["files"]):
        total_rows = sum(stats[f]["__rows"] for f in manifest["files"])
    deleted_fraction = (
        deleted / total_rows if total_rows else (1.0 if deleted else 0.0)
    )

    reasons: list[str] = []
    # ≥2 small files AND (the tail is >25% of the table's files, OR an
    # absolute count — 8+ — where per-task scheduling overhead dominates
    # the reads regardless of how big the table is)
    bin_pack = len(small) >= 2 and (
        len(small) * 4 > len(manifest["files"]) or len(small) >= 8
    )
    if bin_pack:
        reasons.append(
            f"{len(small)} files under {small_file_bytes}B "
            f"({len(manifest['files'])} total) — per-task overhead dominates"
        )
    materialize = False
    if generations > max_delete_generations:
        materialize = True
        reasons.append(
            f"{generations} pending delete generations — every read pays "
            "one anti-join per generation"
        )
    if deleted_fraction > max_deleted_fraction:
        materialize = True
        reasons.append(
            f"{deleted_fraction:.1%} of rows position-deleted — scans "
            "decode then discard them"
        )
    if eq_entries:
        materialize = True
        reasons.append(
            f"{len(eq_entries)} equality entries pending — metadata COUNT "
            "and column stats are suppressed until materialized"
        )
    return {
        "bin_pack": bin_pack,
        "materialize_deletes": materialize,
        "reasons": reasons,
        "n_files": len(manifest["files"]),
        "small_files": len(small),
        "small_bytes": sum(sizes[f] for f in small),
        "delete_generations": generations,
        "deleted_rows": deleted,
        "deleted_fraction": round(deleted_fraction, 4),
    }


def restore_snapshot(table_dir: str, version: int) -> int:
    """RESTORE TABLE ... TO VERSION AS OF — publish a NEW version whose
    content is an old version's, as pure metadata: the new manifest
    names the old version's (immutable, still-retained) file set, its
    schema, its stats, and its deletion vectors verbatim. No data file
    is read, copied, or rewritten — undoing a bad merge on a 100 TB
    table costs one manifest write, and the bad version stays in history
    for audit (this is a roll-FORWARD, not a history rewrite).

    Publishes as an ``overwrite`` op (the file set diverges from the
    tip's lineage, so incremental readers correctly refuse to diff
    across it) under the optimistic-concurrency guard. Requires the
    target version's manifest and files to still be retained (un-vacuumed)
    — restore reaches exactly as far back as the retention policy keeps.
    Table-level constraints/bloom declarations stay the TIP's (metadata
    follows the table, content follows the restored version); like
    Delta's RESTORE, the restored rows are not re-validated against
    constraints added after they were first committed."""
    tip = latest_version(table_dir)
    if tip is None:
        raise FileNotFoundError(f"no snapshots in {table_dir!r}")
    if not os.path.exists(_manifest_path(table_dir, version)):
        raise FileNotFoundError(
            f"version {version} is not retained (vacuumed?) in {table_dir!r}"
        )
    m = _read_manifest(table_dir, version)
    eq_files = [
        f for e in (m.get("eq_deletes") or []) for f in e["delete_files"]
    ]
    missing = [
        f
        for f in m["files"] + (m.get("delete_files") or []) + eq_files
        if not os.path.exists(_data_path(table_dir, m, f))
    ]
    if missing:
        raise FileNotFoundError(
            f"cannot restore v{version}: {len(missing)} referenced file(s) "
            f"were vacuumed (first: {missing[0]!r})"
        )
    stats = m.get("stats") or {}
    # a restore that brings back a later-DROPPED column clears its
    # tombstone: the user explicitly asked for the pre-drop content, so
    # the old files' values are the intended answer, not a resurrection.
    # Tombstones and resolution are PHYSICAL names.
    tip_dropped = _read_manifest(table_dir, tip).get("dropped_cols") or []
    m_phys = _phys_map(m)
    restored_phys = (
        {m_phys.get(f["name"], f["name"]) for f in m["schema"]["fields"]}
        if m.get("schema") is not None
        else set()
    )
    return publish_manifest(
        table_dir,
        [],
        mode="overwrite",
        schema=m.get("schema"),
        base_files=m["files"],
        new_stats={f: stats[f] for f in m["files"] if f in stats},
        delete_files=m.get("delete_files"),
        dv_counts=m.get("dv_counts"),
        eq_deletes=m.get("eq_deletes"),
        dropped_cols=[c for c in tip_dropped if c not in restored_phys],
        require_parent=tip,
        phys=m_phys,  # the restored version's own mapping, verbatim
        partition_spec=m.get("partition_spec") or [],  # ditto, [] clears
    )


def snapshot_files(
    spark: SparkSession, table_dir: str, version: int | None = None
) -> DataFrame:
    """The FILES metadata table (Iceberg's ``.files`` / Delta's DESCRIBE
    DETAIL granularity): one row per data file of a version — path,
    on-disk bytes, footer row count, pending merge-on-read deleted-row
    count (positional; equality deletes are scoped by entry, not
    per-file countable), and the per-column min/max stats as a JSON
    string. Pure manifest metadata — no data file opens — which is what
    makes it the operational surface for small-file diagnosis ("do I
    need compaction?"), skew checks, and prune-rate debugging: the same
    facts the planner skips files with, queryable as a DataFrame.

    Driver-builds one row per file (bounded by |files|, the same budget
    every manifest operation here already spends); at extreme file
    counts a production system would shard the manifest itself — this
    repo's manifest is one JSON document by design (SURVEY §7)."""
    import json as _json

    from pyspark.sql.types import (
        LongType,
        StringType,
        StructField,
        StructType,
    )

    tip = latest_version(table_dir)
    if tip is None:
        raise FileNotFoundError(f"no snapshots in {table_dir!r}")
    version = tip if version is None else version
    m = _read_manifest(table_dir, version)
    stats = m.get("stats") or {}
    dv_counts = m.get("dv_counts") or {}
    rows = []
    for f in m["files"]:
        p = _data_path(table_dir, m, f)
        s = dict(stats.get(f) or {})
        n_rows = s.pop("__rows", None)
        pvals = s.pop("__pvals", None)
        rows.append(
            (
                version,
                f,
                os.path.getsize(p) if os.path.exists(p) else None,
                n_rows,
                dv_counts.get(f, 0),
                _json.dumps(s, sort_keys=True, default=str) if s else None,
                _json.dumps(pvals, sort_keys=True, default=str)
                if pvals is not None
                else None,
            )
        )
    schema = StructType(
        [
            StructField("version", LongType()),
            StructField("file", StringType()),
            StructField("bytes", LongType()),
            StructField("rows", LongType()),
            StructField("deleted_rows", LongType()),
            StructField("stats_json", StringType()),
            StructField("partition_json", StringType()),
        ]
    )
    return spark.createDataFrame(rows, schema)


def version_at_timestamp(table_dir: str, ts: float) -> int:
    """TIMESTAMP AS OF: the latest RETAINED version whose manifest was
    published at or before unix-seconds ``ts`` — the timestamp half of
    time travel (``read_snapshot(spark, dir, version_at_timestamp(dir,
    ts))``), resolved from the same commit-mtime clock
    ``vacuum_by_retention`` keys its windows on (the exclusive-create
    timestamp IS the commit point, so mtimes are monotone in version on
    any one filesystem). Raises if every retained version is newer —
    asking for a time before the table existed (or before the retention
    horizon) must fail loudly, not silently serve the oldest survivor."""
    tip = latest_version(table_dir)
    if tip is None:
        raise FileNotFoundError(f"no snapshots in {table_dir!r}")
    best = None
    for v in range(tip + 1):
        mp = _manifest_path(table_dir, v)
        if os.path.exists(mp) and os.path.getmtime(mp) <= ts:
            best = v
    if best is None:
        raise ValueError(
            f"no retained version at or before ts={ts} in {table_dir!r}"
        )
    return best


def _schema_delta(parent_m: dict | None, m: dict) -> str | None:
    """Human-readable schema change of one commit vs its parent — the
    DESCRIBE HISTORY column that makes evolution auditable. Uses the
    phys maps to tell a RENAME (same physical, new logical) from a
    drop+add pair; widenings report both types. None = no change."""
    if m.get("schema") is None or (parent_m or {}).get("schema") is None:
        return None
    p_fields = {f["name"]: f["type"] for f in parent_m["schema"]["fields"]}
    n_fields = {f["name"]: f["type"] for f in m["schema"]["fields"]}
    p_phys = _phys_map(parent_m)
    n_phys = _phys_map(m)
    p_by_phys = {p_phys.get(n, n): n for n in p_fields}
    out = []
    for name, typ in n_fields.items():
        if name in p_fields:
            if p_fields[name] != typ:
                out.append(f"widen {name} {p_fields[name]}->{typ}")
            continue
        phys = n_phys.get(name, name)
        old = p_by_phys.get(phys)
        if old is not None and old not in n_fields:
            out.append(f"rename {old}->{name}")
        else:
            out.append(f"add {name} {typ}")
    renamed_away = {
        p_by_phys[ph]
        for ph in (n_phys.get(n, n) for n in n_fields)
        if ph in p_by_phys
    }
    for name in p_fields:
        if name not in n_fields and name not in renamed_away:
            out.append(f"drop {name}")
    return ", ".join(sorted(out)) or None


def describe_history(spark: SparkSession, table_dir: str) -> DataFrame:
    """DESCRIBE HISTORY as a DataFrame: one row per retained version —
    op, parent, file count, total bytes, row count (when stats carry
    it), txn id, the commit's SCHEMA CHANGE (add/drop/rename/widen,
    derived through the phys map so a rename reads as a rename, not a
    drop+add), and the declared partition spec. Pure manifest metadata;
    byte sizes stat only the version's own files. The audit surface
    every lakehouse table exposes, for this repo's commit protocol."""
    tip = latest_version(table_dir)
    if tip is None:
        raise FileNotFoundError(f"no snapshots in {table_dir!r}")
    rows = []
    for v in range(tip + 1):
        mp = _manifest_path(table_dir, v)
        if not os.path.exists(mp):
            continue  # vacuumed
        m = _read_manifest(table_dir, v)
        stats = m.get("stats") or {}
        n_rows = None
        if (
            m["files"]
            and not m.get("eq_deletes")
            and all("__rows" in stats.get(f, {}) for f in m["files"])
        ):
            n_rows = sum(stats[f]["__rows"] for f in m["files"]) - sum(
                (m.get("dv_counts") or {}).values()
            )
        total = 0
        for f in m["files"]:
            p = _data_path(table_dir, m, f)
            if os.path.exists(p):
                total += os.path.getsize(p)
        parent_m = None
        if v > 0 and os.path.exists(_manifest_path(table_dir, v - 1)):
            parent_m = _read_manifest(table_dir, v - 1)
        pspec = m.get("partition_spec")
        rows.append(
            (
                v,
                m.get("parent"),
                m["op"],
                (m.get("change") or {}).get("kind"),
                len(m["files"]),
                total,
                n_rows,
                m.get("txn"),
                _schema_delta(parent_m, m),
                ", ".join(_transform_name(e) for e in pspec) if pspec else None,
            )
        )
    return spark.createDataFrame(
        rows,
        "version int, parent int, op string, change_kind string, "
        "n_files int, total_bytes bigint, n_rows bigint, txn string, "
        "schema_change string, partition string",
    )


def clone_snapshot(
    src_dir: str, dst_dir: str, *, version: int | None = None
) -> int:
    """SHALLOW CLONE (Delta's ``CREATE TABLE ... SHALLOW CLONE``): a new
    table whose v0 manifest references the SOURCE's data files in place
    — one metadata write at any table size, zero data copied. The clone
    then evolves independently: appends/DML/compaction write its own
    files (a copy-on-write rewrite that drops a foreign file simply
    stops referencing it), the source never sees the clone's commits,
    and retention on the clone NEVER deletes foreign files (the vacuum
    ownership guard) — dropping the clone directory is always safe.

    Mechanics: file keys stay table-relative (so every rel-path
    comparison — targeting scans, change-feed diffs, partition tuples,
    stats/blooms/NDV — works unchanged); a manifest-level
    ``file_bases`` map records which files resolve in the source's
    directory, consulted only at path-resolution time and carried
    forward per retained file (``publish_manifest``), so the clone
    becomes self-contained exactly as fast as its data rewrites.
    Cloning a clone composes (entries keep pointing at the ORIGINAL
    owner). Inherited metadata: schema, physical column mapping,
    per-file stats/blooms/NDV/partition tuples, partition spec,
    constraints, drop tombstones.

    Refused: a source version with PENDING merge-on-read state
    (position/equality delete files) — their file references are not
    clone-aware; run ``compact_snapshot`` on the source (or clone an
    older clean version) first. The source must also outlive the
    clone's interest in the shared files: vacuuming the SOURCE can
    delete files the clone still references (the same caveat Delta
    documents); ``restore_snapshot``-style existence checks fail loudly
    if that happens."""
    sv = latest_version(src_dir) if version is None else version
    if sv is None:
        raise FileNotFoundError(f"no snapshots in {src_dir!r}")
    m = _read_manifest(src_dir, sv)
    if m.get("delete_files") or m.get("eq_deletes"):
        raise ValueError(
            f"cannot shallow-clone {src_dir!r}@v{sv}: pending merge-on-read "
            "deletes (delete files are not clone-aware) — compact_snapshot "
            "the source first, or clone a version without pending deletes"
        )
    if latest_version(dst_dir) is not None:
        raise FileExistsError(f"{dst_dir!r} already holds a table")
    src_abs = os.path.abspath(src_dir)
    parent_bases = m.get("file_bases") or {}
    bases = {f: parent_bases.get(f, src_abs) for f in m["files"]}
    return publish_manifest(
        dst_dir,
        list(m["files"]),
        mode="overwrite",
        schema=m.get("schema"),
        new_stats=dict(m.get("stats") or {}),
        constraints=m.get("constraints"),
        bloom_cols=m.get("bloom_cols"),
        ndv_cols=m.get("ndv_cols"),
        dropped_cols=m.get("dropped_cols"),
        phys=dict(m.get("phys") or {}),
        partition_spec=m.get("partition_spec"),
        file_bases=bases,
        change={"kind": "clone", "source": src_abs, "source_version": sv},
    )
