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
import uuid

from pyspark.sql import DataFrame, SparkSession

_SNAPDIR = "_snapshots"


def _manifest_path(table_dir: str, version: int) -> str:
    return os.path.join(table_dir, _SNAPDIR, f"v{version:09d}.json")


def latest_version(table_dir: str) -> int | None:
    """Highest committed version, or None for an empty table. One listing
    of the manifest directory (bounded: one small file per commit)."""
    snap = os.path.join(table_dir, _SNAPDIR)
    if not os.path.isdir(snap):
        return None
    versions = [
        int(f[1:-5]) for f in os.listdir(snap) if f.startswith("v") and f.endswith(".json")
    ]
    return max(versions) if versions else None


def _read_manifest(table_dir: str, version: int) -> dict:
    with open(_manifest_path(table_dir, version)) as f:
        return json.load(f)


def snapshot_commit(
    df: DataFrame,
    table_dir: str,
    *,
    mode: str = "append",
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
    never a half-visible table."""
    if mode not in ("append", "overwrite"):
        raise ValueError(f"unsupported snapshot mode: {mode!r}")
    os.makedirs(os.path.join(table_dir, _SNAPDIR), exist_ok=True)
    commit_dir = os.path.join(table_dir, f"data-{uuid.uuid4().hex[:12]}")
    df.write.parquet(commit_dir)
    new_files = sorted(
        os.path.join(os.path.basename(commit_dir), f)
        for f in os.listdir(commit_dir)
        if f.endswith(".parquet")
    )
    while True:
        tip = latest_version(table_dir)
        version = 0 if tip is None else tip + 1
        if mode == "append" and tip is not None:
            files = _read_manifest(table_dir, tip)["files"] + new_files
        else:
            files = list(new_files)
        manifest = {
            "version": version,
            "parent": tip,
            "op": mode,
            "files": files,
        }
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
    publishing v(N+1) cannot change or break this reader."""
    tip = latest_version(table_dir)
    if tip is None:
        raise FileNotFoundError(f"no snapshots in {table_dir!r}")
    version = tip if version is None else version
    manifest = _read_manifest(table_dir, version)
    paths = [os.path.join(table_dir, f) for f in manifest["files"]]
    if not paths:
        raise ValueError(f"version {version} is empty")
    return spark.read.parquet(*paths)


def compact_snapshot(
    spark: SparkSession,
    table_dir: str,
    *,
    target_file_bytes: int = 128 * 1024 * 1024,
) -> int:
    """Compaction as a COMMIT: rewrite the current version's file set
    into files sized near ``target_file_bytes`` and publish the result as
    a new version. Old versions keep reading their old (immutable) files
    — this is how compaction becomes safe under concurrent readers, the
    guarantee ``compact_parquet``'s in-place guard can only approximate
    by refusing the dangerous case. File count derives from actual bytes
    (same rule as ``compact_parquet``)."""
    import math

    tip = latest_version(table_dir)
    if tip is None:
        raise FileNotFoundError(f"no snapshots in {table_dir!r}")
    manifest = _read_manifest(table_dir, tip)
    paths = [os.path.join(table_dir, f) for f in manifest["files"]]
    total = sum(os.path.getsize(p) for p in paths)
    n_files = max(1, math.ceil(total / target_file_bytes))
    compacted = spark.read.parquet(*paths).repartition(n_files)
    return snapshot_commit(compacted, table_dir, mode="overwrite")


def vacuum(table_dir: str, *, keep_from_version: int) -> list[str]:
    """Delete data files unreferenced by every version >=
    ``keep_from_version`` and drop the older manifests — the explicit,
    separate step that makes time travel a RETENTION POLICY rather than
    unbounded storage. Returns the deleted file paths. Never touches a
    file any retained version references."""
    tip = latest_version(table_dir)
    if tip is None or keep_from_version > tip:
        raise ValueError(f"keep_from_version {keep_from_version} beyond tip {tip}")
    live: set[str] = set()
    for v in range(keep_from_version, tip + 1):
        live.update(_read_manifest(table_dir, v)["files"])
    deleted = []
    for v in range(keep_from_version):
        mp = _manifest_path(table_dir, v)
        if not os.path.exists(mp):
            continue
        for f in _read_manifest(table_dir, v)["files"]:
            if f not in live:
                p = os.path.join(table_dir, f)
                if os.path.exists(p):
                    os.remove(p)
                    deleted.append(p)
        os.remove(mp)
    return deleted
