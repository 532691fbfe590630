"""`snapshot_table` — a custom Spark DataSource over manifest-committed
tables (round 6), batch AND streaming, via the public Python Data Source
API (`pyspark.sql.datasource`, Spark 4).

Why a custom source: the built-in parquet reader binds to a directory
LISTING, so it sees a snapshot table's uncommitted files (data lands
before the manifest publishes) and can't time-travel; and the built-in
file STREAM source would likewise surface pre-commit files. This source
binds every read to a MANIFEST:

- batch: ``spark.read.format("snapshot_table").option("path", dir)``
  reads exactly the tip version's file set (``option("version", n)`` for
  time travel) — same contract as ``read_snapshot``, expressed as a
  first-class format.
- streaming: ``spark.readStream.format("snapshot_table")`` follows the
  table's APPEND lineage with **table versions as streaming offsets** —
  each micro-batch covers the files added by versions (start, end], the
  checkpoint stores the last processed version, and restart resumes
  from it exactly-once. Uncommitted files are invisible by construction
  (only manifest-referenced files are ever planned), which the plain
  file source cannot promise. An overwrite/compaction in range fails the
  read loudly (history rewrite — same rule as ``snapshot_changes``).

Scale shape: planning touches only manifests (file NAMES); each data
file is one ``InputPartition`` read executor-side as Arrow record
batches (pyarrow), so read parallelism tracks the file count exactly
like the native reader.
"""

from __future__ import annotations

import os
from typing import Iterator, Sequence

from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceArrowWriter,
    DataSourceReader,
    DataSourceStreamArrowWriter,
    DataSourceStreamReader,
    InputPartition,
    WriterCommitMessage,
)
from pyspark.sql.types import StructType

from reactivestreams_kinesis_spark.operators.snapshots import (
    _data_path,
    _manifest_path,
    _read_manifest,
    latest_version,
    publish_manifest,
)


# Per-task ceiling for the single-partition rewrite_diff read: one CoW
# rewrite commit's old+new parquet bytes must fit one executor. Beyond
# this, the distributed `snapshot_change_feed` operator is the right tool.
_REWRITE_DIFF_MAX_BYTES = int(
    os.environ.get("SNAPSHOT_REWRITE_DIFF_MAX_BYTES", 4 * 2**30)
)


class _FilePartition(InputPartition):
    def __init__(self, path: str, rel: str | None = None, dv_paths=None, eq=None):
        self.path = path
        # merge-on-read deletes: the file's table-relative name, the
        # version's position-delete files (absolute), and the equality
        # entries scoped to THIS file ([{key_cols, paths}]) — applied
        # task-side
        self.rel = rel
        self.dv_paths = dv_paths
        self.eq = eq


def _version_files(table_dir: str, version: int) -> list[str]:
    return [
        os.path.join(table_dir, f)
        for f in _read_manifest(table_dir, version)["files"]
    ]


def _strip_file_scheme(path: str) -> str:
    """Local-path form of a possibly file-URI path option. Spark's SQL
    surface (CREATE TABLE ... USING snapshot_table OPTIONS (path ...))
    qualifies the option to ``file:/...`` before the source sees it; the
    manifest layer works on plain OS paths."""
    if path.startswith("file://"):
        return path[len("file://"):] or "/"
    if path.startswith("file:"):
        return path[len("file:"):]
    return path


def _read_parquet_batches(path: str, arrow_schema=None, read_names=None) -> Iterator:
    """Executor-side file read: Arrow record batches straight from the
    parquet file (zero row-by-row Python). With ``arrow_schema`` (the
    table's DECLARED schema), batches are padded to it — a file written
    before an add-column evolution surfaces NULL for the newer columns,
    same contract as `read_snapshot`'s declared-schema read.

    ``read_names`` (physical column mapping): the file-side name for
    each ``arrow_schema`` field, parallel to its fields — files hold
    PHYSICAL names; the yielded batches carry the LOGICAL schema. None
    = identity (no rename history)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    pf = pq.ParquetFile(path)
    identity = read_names is None or list(read_names) == list(arrow_schema.names)
    if arrow_schema is None or (identity and pf.schema_arrow.equals(arrow_schema)):
        yield from pf.iter_batches()
        return
    names = list(arrow_schema.names) if read_names is None else list(read_names)
    present = set(pf.schema_arrow.names)
    cols = [n for n in names if n in present]
    for b in pf.iter_batches(columns=cols):
        by_name = {n: b.column(i) for i, n in enumerate(b.schema.names)}
        arrays = [
            by_name[pn].cast(f.type)
            if pn in by_name
            else pa.nulls(b.num_rows, f.type)
            for f, pn in zip(arrow_schema, names)
        ]
        yield pa.RecordBatch.from_arrays(arrays, schema=arrow_schema)


class SnapshotTableDataSource(DataSource):
    """See module docstring. Options: ``path`` (table dir, required);
    ``version`` (batch time travel, default tip); ``startingVersion``
    (stream resume point — first batch covers startingVersion+1..tip,
    default -1 = the table's full history)."""

    @classmethod
    def name(cls) -> str:
        return "snapshot_table"

    def _table_dir(self) -> str:
        path = self.options.get("path")
        if not path:
            raise ValueError("snapshot_table requires .option('path', <table dir>)")
        return _strip_file_scheme(path)

    def _change_feed(self) -> bool:
        return str(self.options.get("changeFeed", "")).lower() in ("1", "true")

    def schema(self) -> StructType:
        from pyspark.sql.pandas.types import from_arrow_schema
        from pyspark.sql.types import LongType, StringType, StructField

        import pyarrow.parquet as pq

        table_dir = self._table_dir()
        tip = latest_version(table_dir)
        if tip is None:
            raise FileNotFoundError(f"no snapshots in {table_dir!r}")
        if self._change_feed():
            # the feed's data columns follow the ENDING version's
            # declared schema (earlier commits' rows pad NULL for
            # later-added columns, same contract as the batch operator)
            version = int(self.options.get("endingVersion", tip))
        else:
            version = int(self.options.get("version", tip))
        manifest = _read_manifest(table_dir, version)
        if manifest.get("schema") is not None:
            # the version's DECLARED schema (add-column evolution): the
            # source of truth over any single file's footer
            st = StructType.fromJson(manifest["schema"])
        else:
            files = _version_files(table_dir, version)
            st = from_arrow_schema(pq.read_schema(files[0]))
        if self._change_feed():
            st = StructType(
                list(st.fields)
                + [
                    StructField("_change_type", StringType()),
                    StructField("_commit_version", LongType()),
                ]
            )
        return st

    def reader(self, schema: StructType) -> DataSourceReader:
        table_dir = self._table_dir()
        tip = latest_version(table_dir)
        if self._change_feed():
            # batch CHANGE DATA FEED: the same per-version planning the
            # streaming form uses, over an explicit (startingVersion,
            # endingVersion] range — startingVersion is EXCLUSIVE (the
            # stream-offset convention this source already documents),
            # default -1 = the full history including v0's inserts
            sv = int(self.options.get("startingVersion", -1))
            ev = int(self.options.get("endingVersion", tip))
            if not -1 <= sv <= ev <= tip:
                raise ValueError(
                    f"bad changeFeed range {sv}..{ev} (tip {tip})"
                )
            return _SnapshotCDFBatchReader(table_dir, sv, ev, schema)
        version = int(self.options.get("version", tip))
        # filterPushdown: explicit option wins both ways; otherwise the
        # default is version-gated — ON once the Spark build's Python DS
        # scan owns its read info (see _pushdown_default_on), OFF on
        # 4.1.x where the shared mutable readInfo replays a filtered
        # scan for an unfiltered query (silent wrong answer, regression-
        # pinned by test_snapshot_source_no_stale_filter_reuse)
        opt = self.options.get("filterPushdown")
        if opt is None:
            push = _pushdown_default_on()
        else:
            push = str(opt).lower() in ("1", "true")
        cls = _PushdownSnapshotBatchReader if push else _SnapshotBatchReader
        return cls(table_dir, _read_manifest(table_dir, version), schema)

    def streamReader(self, schema: StructType) -> DataSourceStreamReader:
        table_dir = self._table_dir()
        tip = latest_version(table_dir)
        phys = (
            _read_manifest(table_dir, tip).get("phys") if tip is not None else None
        )
        mvt = self.options.get("maxVersionsPerTrigger")
        mbt = self.options.get("maxBytesPerTrigger")
        return _SnapshotStreamReader(
            table_dir,
            int(self.options.get("startingVersion", -1)),
            schema,
            change_feed=self._change_feed(),
            phys=phys,
            max_versions=None if mvt is None else int(mvt),
            max_bytes=None if mbt is None else int(mbt),
        )

    def writer(self, schema: StructType, overwrite: bool):
        return _SnapshotBatchWriter(self._table_dir(), overwrite, schema)

    def streamWriter(self, schema: StructType, overwrite: bool):
        return _SnapshotStreamWriter(
            self._table_dir(), schema, self.options.get("txnScope", "default")
        )


def _pushdown_default_on(version: str | None = None) -> bool:
    """Whether filter pushdown is safe to enable BY DEFAULT on this
    Spark build. Spark 4.1.x shares ONE mutable
    ``PythonDataSourceReadInfo`` across plans of a relation
    (``PythonDataSourceV2.readInfo``), so a pushdown-consuming reader
    silently replays a FILTERED scan for a later unfiltered query on
    the same loaded DataFrame — reproduced and regression-pinned in
    ``test_snapshot_source_no_stale_filter_reuse``. Scans own their
    read info from 4.2 on, so the default flips there; 4.1.x (and
    anything unparsable) stays opt-in via
    ``.option("filterPushdown", "true")`` — and an explicit option
    always overrides this gate in either direction."""
    if version is None:
        import pyspark

        version = pyspark.__version__
    try:
        parts = version.split(".")
        major, minor = int(parts[0]), int("".join(
            ch for ch in parts[1] if ch.isdigit()
        ) or 0)
    except (ValueError, IndexError):
        return False  # unparsable build string: stay safe, opt-in only
    return (major, minor) >= (4, 2)


_SIMPLE = (int, float, str, bool)


def _convert_filter(f) -> tuple | None:
    """Spark Filter → a picklable (op, column, value) triple, or None if
    we don't handle it (Spark then applies it itself). Only top-level
    columns and simple scalar values — timestamps/decimals/nested paths
    stay Spark-side so exactness can't drift through a conversion."""
    from pyspark.sql import datasource as ds

    attr = getattr(f, "attribute", None)
    if attr is None or len(attr) != 1:
        return None
    col = attr[0]
    if isinstance(f, ds.IsNull):
        return ("isnull", col, None)
    if isinstance(f, ds.IsNotNull):
        return ("notnull", col, None)
    v = getattr(f, "value", None)
    if isinstance(f, ds.In):
        if not all(isinstance(x, _SIMPLE) for x in v):
            return None
        return ("in", col, tuple(v))
    if not isinstance(v, _SIMPLE):
        return None
    ops = {
        ds.EqualTo: "eq",
        ds.GreaterThan: "gt",
        ds.GreaterThanOrEqual: "gte",
        ds.LessThan: "lt",
        ds.LessThanOrEqual: "lte",
    }
    op = ops.get(type(f))
    return (op, col, v) if op else None


def _arrow_expr(triples: Sequence[tuple]):
    import pyarrow.dataset as pads

    expr = None
    for op, col, v in triples:
        fld = pads.field(col)
        e = {
            "eq": lambda: fld == v,
            "gt": lambda: fld > v,
            "gte": lambda: fld >= v,
            "lt": lambda: fld < v,
            "lte": lambda: fld <= v,
            "in": lambda: fld.isin(list(v)),
            "isnull": lambda: fld.is_null(),
            "notnull": lambda: ~fld.is_null(),
        }[op]()
        expr = e if expr is None else expr & e
    return expr


_PRUNE_OPS = {"eq": "=", "gt": ">", "gte": ">=", "lt": "<", "lte": "<=", "in": "in"}


class _SnapshotBatchReader(DataSourceReader):
    def __init__(
        self,
        table_dir: str,
        manifest: dict,
        schema: StructType | None = None,
    ):
        self._dir = table_dir
        self._manifest = manifest
        self._schema = schema
        self._pushed: list[tuple] = []

    def _arrow_schema(self):
        if self._schema is None:
            return None
        from pyspark.sql.pandas.types import to_arrow_schema

        return to_arrow_schema(self._schema)

    def _phys(self) -> dict:
        return dict(self._manifest.get("phys") or {})

    def _read_names(self):
        """File-side (physical) name per declared field, or None when the
        table has no rename history (identity mapping)."""
        phys = self._phys()
        if not phys or self._schema is None:
            return None
        return [phys.get(f.name, f.name) for f in self._schema.fields]

    def _pushed_physical(self) -> list:
        """Pushed (op, col, value) triples with columns translated to the
        files' physical names — the form pyarrow filters understand."""
        phys = self._phys()
        return [(op, phys.get(c, c), v) for (op, c, v) in self._pushed]

    def partitions(self) -> Sequence[InputPartition]:
        """One InputPartition per data file — after MANIFEST-STATS
        pruning: pushed predicates that the per-file min/max provably
        exclude drop the file from planning entirely (no task, no open,
        no footer read), the skipping layer ABOVE the row-group pruning
        the pyarrow filter does inside surviving files."""
        from reactivestreams_kinesis_spark.operators.snapshots import prune_files

        preds = [
            (col, _PRUNE_OPS[op], v)
            for (op, col, v) in self._pushed
            if op in _PRUNE_OPS
        ]
        files = prune_files(self._manifest, preds) if preds else self._manifest["files"]
        dv_files = self._manifest.get("delete_files") or []
        dv_paths = [os.path.join(self._dir, f) for f in dv_files] or None
        # only files with recorded deleted positions route through the
        # delete-aware read; a delete-free file keeps the fast path with
        # parquet-level predicate pushdown and never opens the DV set.
        # publish_manifest enforces that every position-delete commit
        # carries covering dv_counts; a manifest written before that
        # invariant existed fails SAFE — empty counts with a non-empty
        # delete set route EVERY file through the DV path (slow but
        # correct) instead of silently resurrecting deleted rows
        dv_counts = self._manifest.get("dv_counts") or {}
        if dv_paths and not dv_counts:
            dv_counts = {f: 1 for f in files}
        eq_entries = self._manifest.get("eq_deletes") or []

        inv = {p: l for l, p in self._phys().items()}

        def eq_for(rel):
            # key files store PHYSICAL names; the task's data batches
            # surface LOGICAL — join_cols carries the translation
            scoped = [
                {
                    "key_cols": e["key_cols"],
                    "join_cols": [inv.get(k, k) for k in e["key_cols"]],
                    "paths": [os.path.join(self._dir, p) for p in e["delete_files"]],
                }
                for e in eq_entries
                if rel in set(e["files"])
            ]
            return scoped or None

        return [
            _FilePartition(
                _data_path(self._dir, self._manifest, f),
                rel=f,
                dv_paths=dv_paths if dv_counts.get(f, 0) > 0 else None,
                eq=eq_for(f),
            )
            for f in files
        ]

    def read(self, partition: _FilePartition) -> Iterator:
        if partition is None:  # stats pruned every file: empty scan
            return
        if partition.dv_paths or partition.eq:
            yield from self._read_with_deletes(partition)
            return
        if self._pushed:
            import pyarrow as pa
            import pyarrow.dataset as pads

            # pyarrow dataset does the evolution padding itself when the
            # declared schema names columns a file lacks (reads as null).
            # The dataset runs under PHYSICAL names (what the file and
            # the translated filter know); batches rename to logical.
            logical = self._arrow_schema()
            read_names = self._read_names()
            if read_names is None:
                dset = pads.dataset(
                    partition.path, format="parquet", schema=logical
                )
                yield from dset.to_batches(filter=_arrow_expr(self._pushed))
                return
            phys_schema = pa.schema(
                [
                    pa.field(pn, f.type, f.nullable)
                    for f, pn in zip(logical, read_names)
                ]
            )
            dset = pads.dataset(
                partition.path, format="parquet", schema=phys_schema
            )
            for b in dset.to_batches(filter=_arrow_expr(self._pushed_physical())):
                yield pa.RecordBatch.from_arrays(list(b.columns), schema=logical)
        else:
            yield from _read_parquet_batches(
                partition.path, self._arrow_schema(), self._read_names()
            )

    def _read_with_deletes(self, partition: _FilePartition) -> Iterator:
        """Merge-on-read path: drop THIS file's deleted positions while
        streaming its batches, anti-join away equality-deleted keys
        (Arrow hash-join kernel, per scoped entry), then apply any
        pushed filter. Positions
        must be computed against the RAW file row order, so the pushed
        filter cannot go down into the parquet read here — it applies
        per-batch after the position mask (Arrow compute, still
        vectorized, still executor-side; the manifest-stats file pruning
        above is unaffected). Each task reads only ITS file's positions
        from the DV set — a parquet column filter on the bounded
        position-delete files."""
        import numpy as np
        import pyarrow as pa
        import pyarrow.dataset as pads

        deleted = np.empty(0, dtype=np.int64)
        if partition.dv_paths:
            dv = pads.dataset(partition.dv_paths, format="parquet").to_table(
                filter=pads.field("file") == partition.rel, columns=["pos"]
            )
            deleted = np.sort(dv.column("pos").to_numpy(zero_copy_only=False))
        # equality keys scoped to this file, loaded once per task; key
        # files hold physical names — rename to the data batches' logical
        eq_keys = []
        data_schema = self._arrow_schema()
        for e in partition.eq or []:
            kinv = dict(zip(e["key_cols"], e.get("join_cols") or e["key_cols"]))
            eq_keys.append(_eq_keys_for_join(e, kinv, data_schema))
        pushed = _arrow_expr(self._pushed) if self._pushed else None
        off = 0
        for batch in _read_parquet_batches(
            partition.path, self._arrow_schema(), self._read_names()
        ):
            n = batch.num_rows
            if deleted.size:
                keep = ~np.isin(np.arange(off, off + n), deleted)
                off += n
                if keep.all():
                    out = batch
                else:
                    out = batch.filter(pa.array(keep))
            else:
                out = batch
            tbl = pa.Table.from_batches([out])
            for kcols, keys_tbl in eq_keys:
                # vectorized anti-join on the key columns (Arrow kernel)
                tbl = tbl.join(keys_tbl, keys=kcols, join_type="left anti")
            if pushed is not None:
                tbl = tbl.filter(pushed)
            if tbl.num_rows:
                yield from tbl.to_batches()


class _PushdownSnapshotBatchReader(_SnapshotBatchReader):
    """The batch reader WITH ``pushFilters`` — selected only by
    ``.option("filterPushdown", "true")``, deliberately opt-in.

    Why opt-in: Spark 4.1.2's JVM side keeps ONE mutable
    ``PythonDataSourceReadInfo`` per relation
    (``PythonDataSourceV2.readInfo`` — ``PythonScanBuilder``'s pushdown
    planning overwrites it, ``PythonBatch.planInputPartitions`` reuses
    it via ``getOrCreateReadInfo``). Re-using one loaded DataFrame first
    under a pushable filter and then without one replays the FILTERED
    scan for the unfiltered query — a silent wrong answer upstream of
    any source code. Repro: ``df = load(); df.filter(c < 0).count();
    df.count()`` → the second count returns the filtered count. A
    reader that never consumes filters always plans the full file set,
    so the cache reuse is harmless — that is the default class. Opt in
    only where each loaded DataFrame lives under a single filter
    context (or on a Spark build whose scan owns its read info); the
    native-parquet batch surface (``read_snapshot``/``scan_snapshot``)
    keeps full Catalyst pushdown either way."""

    def pushFilters(self, filters):
        """Real pushdown (Spark 4.1 Python DS API): supported predicates
        become a pyarrow dataset filter evaluated executor-side —
        parquet row-group statistics prune before decode, exactly like
        the native scan's PushedFilters. Handled filters are consumed
        (not returned), unhandled ones stay with Spark."""
        unhandled = []
        for f in filters:
            triple = _convert_filter(f)
            if triple is None:
                unhandled.append(f)
            else:
                self._pushed.append(triple)
        return unhandled


class _CDFPartition(InputPartition):
    """One change-feed work unit: (version, file, kind). ``kind`` is
    ``insert`` (a file appended at ``version``), ``pos_delete`` (emit
    this file's rows at the version's NEW delete positions),
    ``eq_delete`` (emit this file's parent-live rows matching the
    version's new equality keys) or ``rewrite_diff`` (a copy-on-write
    rewrite commit: multiset-diff the dropped files' parent-live rows
    against the replacement files). Everything a task needs travels in
    the partition — absolute paths only, no driver state."""

    def __init__(self, kind, path, rel, version, parent_dv=None,
                 parent_eq=None, delta_dv=None, delta_keys=None,
                 old_files=None, new_files=None, change_key=None,
                 change_kind=None, read_names=None, read_names_old=None):
        self.kind = kind
        self.path = path
        self.rel = rel
        self.version = version
        self.parent_dv = parent_dv      # parent's position files (abs)
        self.parent_eq = parent_eq      # [{key_cols, paths}] scoped to rel
        self.delta_dv = delta_dv        # THIS version's new position files
        self.delta_keys = delta_keys    # (key_cols, paths) for eq deltas
        # rewrite_diff fields: dropped files as (rel, abs) so parent DVs
        # and eq scopes can apply per file; replacements as abs paths
        self.old_files = old_files
        self.new_files = new_files
        self.change_key = change_key    # pairing key ("rewrite" w/ key)
        self.change_kind = change_kind  # "update" | "rewrite" | None
        # file-side (physical-at-version) column name per ENDING schema
        # field — planned per version so a rename followed by an
        # overwrite-op physical reset resolves correctly; None falls
        # back to the reader's end-manifest mapping (legacy manifests)
        self.read_names = read_names
        self.read_names_old = read_names_old  # rewrite_diff old side


def _plan_cdf_partitions(table_dir: str, sv: int, ev: int) -> list[_CDFPartition]:
    """CHANGE DATA FEED planning shared by the streaming and batch
    readers: one pass over the manifests of versions (sv, ev], emitting
    per-file work units (pure metadata — no data file is opened).

    ``append`` → one ``insert`` partition per new file. ``delete`` (both
    merge-on-read forms) → retraction partitions bounded by the delta's
    delete files. ``overwrite`` is split by the manifest's recorded
    change kind (``publish_manifest(change=...)``): a ``reorg``
    (compaction/clustering) provably preserves the live row set and
    emits NOTHING — the feed crosses it silently, Delta's
    dataChange=false contract; any other rewrite plans ONE
    ``rewrite_diff`` partition that multiset-diffs the dropped files'
    parent-live rows against the replacement files (cost bounded by the
    rewritten data, which for targeted DML is the touched-file set, not
    the table). A vacuumed version in range raises — its changes are
    unreconstructable, and silently skipping would emit an incomplete
    feed."""
    from reactivestreams_kinesis_spark.operators.snapshots import (
        _logical_to_end_maps,
        _phys_map,
        _schema_field_names,
    )

    # per-version file-side names for the ENDING schema's fields: the
    # step-composed maps resolve renames across overwrite-op physical
    # resets (see _logical_to_end_maps); an end field with no pre-image
    # at v reads a guaranteed-absent name, padding NULL — never an old
    # physical column's bytes
    end_fields: list = []
    maps: dict = {}
    if os.path.exists(_manifest_path(table_dir, ev)):
        end_fields = _schema_field_names(_read_manifest(table_dir, ev))
        if end_fields:
            maps = _logical_to_end_maps(table_dir, max(sv, 0), ev)
    _rn_cache: dict = {}

    def rn(v: int):
        if not end_fields:
            return None  # legacy schema-less manifests: reader fallback
        if v not in _rn_cache:
            mp = maps.get(v)
            if mp is None:
                _rn_cache[v] = None
            else:
                inv_end = {e: c for c, e in mp.items()}
                phys_v = _phys_map(_read_manifest(table_dir, v))
                _rn_cache[v] = [
                    phys_v.get(inv_end[f], inv_end[f])
                    if f in inv_end
                    else f"__absent__{f}"
                    for f in end_fields
                ]
        return _rn_cache[v]

    out: list[_CDFPartition] = []
    for v in range(max(sv + 1, 0), ev + 1):
        if not os.path.exists(_manifest_path(table_dir, v)):
            raise ValueError(
                f"snapshot_table change feed: version {v} was vacuumed; "
                "restart the stream from a retained startingVersion"
            )
        if v > 0 and not os.path.exists(_manifest_path(table_dir, v - 1)):
            # every change derivation diffs against the PARENT manifest
            raise ValueError(
                f"snapshot_table change feed: version {v}'s parent "
                f"manifest v{v - 1} was vacuumed; restart the stream "
                "from a retained startingVersion"
            )
        m = _read_manifest(table_dir, v)
        if v == 0 or m["op"] == "append":
            base: set = set()
            if v > 0:
                base = set(_read_manifest(table_dir, v - 1)["files"])
            for f in m["files"]:
                if f not in base:
                    out.append(
                        _CDFPartition(
                            "insert", _data_path(table_dir, m, f), f, v,
                            read_names=rn(v),
                        )
                    )
            continue
        if m["op"] != "delete":
            change = m.get("change") or {}
            if change.get("kind") == "reorg":
                continue  # row set unchanged: nothing to emit
            parent = _read_manifest(table_dir, v - 1)
            old_rel = [
                f for f in parent["files"] if f not in set(m["files"])
            ]
            new_rel = [
                f for f in m["files"] if f not in set(parent["files"])
            ]
            out.append(
                _CDFPartition(
                    "rewrite_diff",
                    None,
                    None,
                    v,
                    parent_dv=[
                        os.path.join(table_dir, f)
                        for f in parent.get("delete_files") or []
                    ]
                    or None,
                    parent_eq=[
                        {
                            "key_cols": e["key_cols"],
                            "paths": [
                                os.path.join(table_dir, x)
                                for x in e["delete_files"]
                            ],
                            "files": list(e["files"]),
                        }
                        for e in parent.get("eq_deletes") or []
                    ]
                    or None,
                    old_files=[
                        (f, _data_path(table_dir, parent, f)) for f in old_rel
                    ],
                    new_files=[_data_path(table_dir, m, f) for f in new_rel],
                    # recorded logical-at-commit → PHYSICAL (stable),
                    # translated back to the reader's logical at read time
                    change_key=(m.get("phys") or {}).get(
                        change.get("key"), change.get("key")
                    ),
                    change_kind=change.get("kind"),
                    read_names=rn(v),
                    read_names_old=rn(v - 1),
                )
            )
            continue
        parent = _read_manifest(table_dir, v - 1)
        p_dv = [os.path.join(table_dir, f)
                for f in parent.get("delete_files") or []] or None
        p_eq_all = parent.get("eq_deletes") or []

        def p_eq_for(rel):
            scoped = [
                {
                    "key_cols": e["key_cols"],
                    "paths": [os.path.join(table_dir, x)
                              for x in e["delete_files"]],
                }
                for e in p_eq_all
                if rel in set(e["files"])
            ]
            return scoped or None

        parent_dvc = parent.get("dv_counts") or {}
        delta_dv = [
            f
            for f in m.get("delete_files") or []
            if f not in set(parent.get("delete_files") or [])
        ]
        if delta_dv:
            delta_paths = [os.path.join(table_dir, f) for f in delta_dv]
            grew = [
                f
                for f, n in (m.get("dv_counts") or {}).items()
                if n > parent_dvc.get(f, 0)
            ]
            for f in grew:
                out.append(
                    _CDFPartition(
                        "pos_delete",
                        _data_path(table_dir, m, f),
                        f,
                        v,
                        delta_dv=delta_paths,
                        read_names=rn(v),
                    )
                )
        for entry in (m.get("eq_deletes") or [])[len(p_eq_all):]:
            keys = (
                entry["key_cols"],
                [os.path.join(table_dir, x) for x in entry["delete_files"]],
            )
            for f in entry["files"]:
                out.append(
                    _CDFPartition(
                        "eq_delete",
                        _data_path(table_dir, m, f),
                        f,
                        v,
                        parent_dv=p_dv,
                        parent_eq=p_eq_for(f),
                        delta_keys=keys,
                        read_names=rn(v),
                    )
                )
    return out


class _SnapshotStreamReader(DataSourceStreamReader):
    """Offsets are table versions: ``{"version": N}`` = processed through
    manifest N. Planning a batch (start, end] lists the files in
    manifest[end] that manifest[start] lacks — pure manifest metadata,
    executor reads untouched. Append-only lineage is enforced per
    planned range.

    ``change_feed=True`` streams the CHANGE DATA FEED instead (the
    streaming twin of ``snapshot_change_feed``): appends plan insert
    partitions, delete commits plan retraction partitions — each task
    re-derives its file's retracted rows from the bounded delete files —
    and every emitted batch carries ``_change_type`` /
    ``_commit_version``. The feed crosses rewrite commits too: reorgs
    (compaction) emit nothing, copy-on-write DML rewrites plan a
    ``rewrite_diff`` partition (see ``_read_rewrite_diff``).

    Caveat — AvailableNow with a trigger cap: Spark executes Python
    data sources under AvailableNow as a SINGLE batch, so a capped run
    drains at most one cap's worth and stops; pair the caps with a
    processing-time trigger for a standing drain, or loop AvailableNow
    runs over the same checkpoint (``stream_refresh_materialized_view``
    does exactly that) until caught up."""

    def __init__(
        self,
        table_dir: str,
        starting_version: int,
        schema: StructType | None = None,
        change_feed: bool = False,
        phys: dict | None = None,
        max_versions: int | None = None,
        max_bytes: int | None = None,
    ):
        self._dir = table_dir
        self._start = starting_version
        self._schema = schema
        self._cdf = change_feed
        # logical→physical map bound at stream registration. Physical
        # names are immutable, so files from ANY version in range read
        # correctly under it; a rename mid-stream only changes logical
        # names, which a running stream's schema is fixed to anyway.
        self._phys = dict(phys or {})
        # demand-bounded admission control (maxVersionsPerTrigger): the
        # Python DS API exposes no ReadLimit, so the cap is implemented
        # as latestOffset-side cursor advancement — each answer moves at
        # most ``max_versions`` past the last offset this reader has
        # seen. ``_cursor`` is None until the reader learns a REAL
        # offset; an unanchored answer below the checkpointed offset
        # would be POISON — Spark 4.1 plans the backwards batch without
        # complaint and commits its end, regressing the offset log and
        # silently re-emitting already-committed versions (measured
        # with a probe source). Anchoring is safe anyway, because of
        # two measured engine behaviors (both trigger modes):
        # - FRESH start: latestOffset is prefetched before
        #   initialOffset, but no checkpoint exists, so ``_start`` (the
        #   very offset initialOffset will return) is the true anchor —
        #   capping from it bounds the FIRST batch over a deep backlog.
        # - RESTART: the engine reconstructs the last checkpointed
        #   batch via partitions(committed, committed) BEFORE its first
        #   latestOffset call, so the cursor is already anchored at the
        #   checkpoint when admission is first consulted.
        # Together: every batch of every run is capped, and no answer
        # can fall below a checkpointed offset.
        if max_versions is not None and max_versions < 1:
            raise ValueError(
                f"maxVersionsPerTrigger must be >= 1, got {max_versions}"
            )
        if max_bytes is not None and max_bytes < 1:
            raise ValueError(
                f"maxBytesPerTrigger must be >= 1, got {max_bytes}"
            )
        self._max_versions = max_versions
        self._max_bytes = max_bytes
        self._cursor: int | None = None

    def _advance_cursor(self, version: int) -> None:
        if self._cursor is None or version > self._cursor:
            self._cursor = version

    def initialOffset(self) -> dict:
        self._advance_cursor(self._start)
        return {"version": self._start}

    def latestOffset(self) -> dict:
        tip = latest_version(self._dir)
        target = self._start if tip is None else tip
        # unanchored = fresh start (a restart anchors via the engine's
        # partitions(committed, committed) reconstruction first): the
        # starting version is the true admission anchor, so even the
        # cold-start backlog drains in capped batches
        cursor = self._start if self._cursor is None else self._cursor
        if target > cursor:
            if self._max_versions is not None:
                target = min(target, cursor + self._max_versions)
            if self._max_bytes is not None:
                target = self._bytes_bounded_end(cursor, target)
        self._advance_cursor(target)
        return {"version": target}

    def _bytes_bounded_end(self, cursor: int, target: int) -> int:
        """maxBytesPerTrigger: advance version-by-version, accumulating
        each version's NEW data-file bytes (manifest names + one stat
        per new file — bounded by the admitted window), and stop before
        the cap is crossed. Always admits at least one version so an
        oversized single commit cannot stall the stream (Delta's
        maxBytesPerTrigger is the same soft cap)."""
        prev_files: set | None = None
        if cursor >= 0 and os.path.exists(_manifest_path(self._dir, cursor)):
            prev_files = set(_read_manifest(self._dir, cursor)["files"])
        end, total = cursor, 0
        for v in range(cursor + 1, target + 1):
            if not os.path.exists(_manifest_path(self._dir, v)):
                return target  # vacuumed range: partitions() fails loudly
            m = _read_manifest(self._dir, v)
            new = [
                f for f in m["files"] if prev_files is None or f not in prev_files
            ]
            nbytes = sum(
                os.path.getsize(_data_path(self._dir, m, f))
                for f in new
                if os.path.exists(_data_path(self._dir, m, f))
            )
            if end > cursor and total + nbytes > self._max_bytes:
                break
            total += nbytes
            end = v
            prev_files = set(m["files"])
        return end

    def partitions(self, start: dict, end: dict) -> Sequence[InputPartition]:
        sv, ev = start["version"], end["version"]
        if ev < sv:
            # a strictly backwards batch can only come from an offset
            # answer that regressed below the checkpoint (the poison the
            # admission anchoring prevents — its safety rests on the
            # measured engine behavior that a restart reconstructs
            # partitions(committed, committed) before the first
            # latestOffset; this tripwire turns a future engine change
            # from silent version re-emission into a loud stop)
            raise RuntimeError(
                f"snapshot_table stream: planned batch runs backwards "
                f"({sv} -> {ev}) — the offset log regressed below the "
                "checkpoint; refusing to re-emit committed versions"
            )
        self._advance_cursor(ev)
        if ev == sv:
            return []
        if self._cdf:
            return self._cdf_partitions(sv, ev)
        # per-version walk: appends contribute their new files; a reorg
        # commit (compaction/clustering, recorded change kind) adds no
        # rows and is SKIPPED — Delta's dataChange=false contract, so a
        # maintenance compaction never kills the stream; its rewritten
        # files are never emitted (their rows already streamed from the
        # original appends). Any other non-append still fails loudly
        # (history rewrite).
        out: list[_FilePartition] = []
        seen: set = set()
        if sv >= 0:
            # a checkpointed resume MUST anchor on its base manifest: with
            # an empty `seen`, every file in the first retained manifest
            # would re-emit as new rows (silent whole-table duplication).
            # Mirror _plan_cdf_partitions and fail loudly instead; only a
            # fresh start (sv == -1) may walk past vacuumed history.
            if not os.path.exists(_manifest_path(self._dir, sv)):
                raise ValueError(
                    f"snapshot_table stream: checkpointed version {sv}'s "
                    "manifest was vacuumed; restart the stream from a "
                    "retained startingVersion"
                )
            seen = set(_read_manifest(self._dir, sv)["files"])
        for v in range(max(sv + 1, 0), ev + 1):
            if not os.path.exists(_manifest_path(self._dir, v)):
                if sv >= 0:
                    raise ValueError(
                        f"snapshot_table stream: version {v} was vacuumed "
                        f"inside the planned range ({sv}, {ev}]; restart "
                        "the stream from a retained startingVersion"
                    )
                continue  # fresh start: vacuumed prefix below first manifest
            m = _read_manifest(self._dir, v)
            if v > 0 and m["op"] != "append":
                if (m.get("change") or {}).get("kind") == "reorg":
                    seen.update(m["files"])
                    continue
                raise ValueError(
                    f"snapshot_table stream: version {v} is not an append — "
                    "streaming cannot cross an overwrite/compaction"
                )
            for f in m["files"]:
                if f not in seen:
                    seen.add(f)
                    out.append(_FilePartition(_data_path(self._dir, m, f)))
        return out

    def _cdf_partitions(self, sv: int, ev: int) -> Sequence[InputPartition]:
        return _plan_cdf_partitions(self._dir, sv, ev)

    def _data_arrow_schema(self):
        if self._schema is None:
            return None
        from pyspark.sql.pandas.types import to_arrow_schema
        from pyspark.sql.types import StructType

        if self._cdf:
            # strip the two feed columns: files hold only data columns
            return to_arrow_schema(
                StructType(
                    [
                        f
                        for f in self._schema.fields
                        if f.name not in ("_change_type", "_commit_version")
                    ]
                )
            )
        return to_arrow_schema(self._schema)

    def _data_read_names(self, arrow_schema):
        if not self._phys or arrow_schema is None:
            return None
        return [self._phys.get(n, n) for n in arrow_schema.names]

    def read(self, partition) -> Iterator:
        arrow_schema = self._data_arrow_schema()
        read_names = self._data_read_names(arrow_schema)
        if not self._cdf:
            yield from _read_parquet_batches(
                partition.path, arrow_schema, read_names
            )
            return
        yield from _read_cdf_partition(partition, arrow_schema, read_names)

    def commit(self, end: dict) -> None:
        # offsets live in the streaming checkpoint; nothing to release —
        # but the committed end is a safe admission-control anchor
        self._advance_cursor(end["version"])


def _cdf_stamped(tbl, kind: str, version: int):
    import pyarrow as pa

    if tbl.num_rows == 0:
        return
    tbl = tbl.append_column(
        "_change_type", pa.array([kind] * tbl.num_rows, pa.string())
    ).append_column(
        "_commit_version",
        pa.array([version] * tbl.num_rows, pa.int64()),
    )
    yield from tbl.to_batches()


def _dv_positions(paths, rel):
    """Sorted deleted positions recorded for ``rel`` across the given
    position-delete parquet files — a bounded single-column read."""
    import numpy as np
    import pyarrow.dataset as pads

    t = pads.dataset(paths, format="parquet").to_table(
        filter=pads.field("file") == rel, columns=["pos"]
    )
    return np.sort(t.column("pos").to_numpy(zero_copy_only=False))


def _eq_keys_for_join(e, inv, data_schema=None):
    """An equality entry's key table, renamed physical→logical so it
    joins the (logical-named) data batches, and cast to the data
    schema's types — a key file written before a TYPE WIDENING holds the
    narrow type, and the Arrow hash-join kernel needs exact equality."""
    import pyarrow as pa
    import pyarrow.dataset as pads

    keys = pads.dataset(e["paths"], format="parquet").to_table(
        columns=e["key_cols"]
    )
    join_cols = [inv.get(k, k) for k in e["key_cols"]]
    if join_cols != list(e["key_cols"]):
        keys = keys.rename_columns(join_cols)
    if data_schema is not None:
        want = {f.name: f.type for f in data_schema}
        if any(
            c in want and keys.schema.field(c).type != want[c]
            for c in join_cols
        ):
            keys = keys.cast(
                pa.schema(
                    [
                        pa.field(c, want.get(c, keys.schema.field(c).type))
                        for c in keys.schema.names
                    ]
                )
            )
    return join_cols, keys


def _parent_live_table(rel, path, parent_dv, parent_eq, arrow_schema,
                       read_names=None):
    """One dropped file's rows as they were LIVE at the parent version:
    position deletes masked out, scoped equality deletes anti-joined."""
    import numpy as np
    import pyarrow as pa

    inv = (
        {pn: ln for ln, pn in zip(arrow_schema.names, read_names)}
        if read_names is not None
        else {}
    )
    dead = (
        _dv_positions(parent_dv, rel)
        if parent_dv
        else np.empty(0, np.int64)
    )
    batches = []
    off = 0
    for batch in _read_parquet_batches(path, arrow_schema, read_names):
        n = batch.num_rows
        if dead.size:
            keep = ~np.isin(np.arange(off, off + n), dead)
            batch = batch if keep.all() else batch.filter(pa.array(keep))
        off += n
        batches.append(batch)
    if batches:
        tbl = pa.Table.from_batches(batches)
    else:
        tbl = pa.Table.from_batches([], schema=arrow_schema)
    for e in parent_eq or []:
        if e.get("files") is not None and rel not in set(e["files"]):
            continue
        join_cols, keys = _eq_keys_for_join(e, inv, arrow_schema)
        tbl = tbl.join(keys, keys=join_cols, join_type="left anti")
    return tbl


def _read_rewrite_diff(
    p: _CDFPartition, arrow_schema, read_names=None, read_names_old=None
) -> Iterator:
    """Change rows of ONE copy-on-write rewrite commit, derived by
    multiset-diffing the dropped files' parent-live rows against their
    replacement files (both padded to the declared schema):

    - rows only in the old side retract, rows only in the new side
      insert — verbatim-rewritten survivors cancel exactly;
    - ``change_kind == "update"`` (update_where: every differing row IS
      a modified row) labels old-excess ``update_preimage`` and
      new-excess ``update_postimage``;
    - a recorded ``change_key`` (merge_upsert) pairs by key membership:
      keys present on both sides are updates, old-only keys deletes,
      new-only keys inserts.

    The diff itself runs in DuckDB over the Arrow tables (EXCEPT ALL —
    exact multiset semantics, NULL- and NaN-safe), executor-side. Cost
    is bounded by the REWRITTEN data: for targeted DML that is the
    touched-file set; a full-table overwrite through the feed is a
    full diff, which is what it semantically is. The batch operator
    ``snapshot_change_feed`` computes the same diff as a distributed
    Spark plan — use it when rewrites dominate."""
    import pyarrow as pa
    import pyarrow.compute as pc

    import duckdb

    # one rewrite commit = ONE task: both sides of the diff materialize in
    # this executor's memory. Targeted DML touches a bounded file set, but
    # a huge CoW rewrite or full-table overwrite consumed through the
    # source would OOM the task — fail with a pointer to the distributed
    # twin instead of dying mid-read.
    total_bytes = sum(
        os.path.getsize(path)
        for path in [pp for _, pp in (p.old_files or [])]
        + list(p.new_files or [])
        if os.path.exists(path)
    )
    if total_bytes > _REWRITE_DIFF_MAX_BYTES:
        raise ValueError(
            f"rewrite commit v{p.version} touches "
            f"{total_bytes / 2**30:.1f} GiB of parquet — too large to "
            "diff inside one task. Read this range with the distributed "
            "snapshot_change_feed operator instead, or raise "
            "SNAPSHOT_REWRITE_DIFF_MAX_BYTES."
        )

    if arrow_schema is None:
        # schema-less legacy manifest: fall back to a data-file footer
        import pyarrow.parquet as pq

        src = p.old_files[0][1] if p.old_files else p.new_files[0]
        arrow_schema = pq.read_schema(src)
    old = (
        pa.concat_tables(
            [
                _parent_live_table(
                    rel, path, p.parent_dv, p.parent_eq, arrow_schema,
                    read_names if read_names_old is None else read_names_old,
                )
                for rel, path in p.old_files
            ]
        )
        if p.old_files
        else pa.Table.from_batches([], schema=arrow_schema)
    )
    new_batches: list = []
    for path in p.new_files or []:
        new_batches.extend(_read_parquet_batches(path, arrow_schema, read_names))
    new = (
        pa.Table.from_batches(new_batches)
        if new_batches
        else pa.Table.from_batches([], schema=arrow_schema)
    )
    con = duckdb.connect()
    con.register("t_old", old)
    con.register("t_new", new)
    dels = con.execute(
        "SELECT * FROM t_old EXCEPT ALL SELECT * FROM t_new"
    ).arrow().cast(old.schema)
    ins = con.execute(
        "SELECT * FROM t_new EXCEPT ALL SELECT * FROM t_old"
    ).arrow().cast(old.schema)
    if p.change_kind == "update":
        yield from _cdf_stamped(dels, "update_preimage", p.version)
        yield from _cdf_stamped(ins, "update_postimage", p.version)
        return
    # change_key is recorded PHYSICAL at plan time; the diff tables carry
    # logical names — translate before pairing
    inv = (
        {pn: ln for ln, pn in zip(arrow_schema.names, read_names)}
        if read_names is not None
        else {}
    )
    change_key = inv.get(p.change_key, p.change_key) if p.change_key else None
    if change_key and change_key in old.schema.names:
        k = change_key
        old_keys = pc.unique(dels.column(k))
        new_keys = pc.unique(ins.column(k))
        upd_d = dels.filter(pc.is_in(dels.column(k), value_set=new_keys))
        del_d = dels.filter(
            pc.invert(pc.is_in(dels.column(k), value_set=new_keys))
        )
        upd_i = ins.filter(pc.is_in(ins.column(k), value_set=old_keys))
        ins_i = ins.filter(
            pc.invert(pc.is_in(ins.column(k), value_set=old_keys))
        )
        yield from _cdf_stamped(upd_d, "update_preimage", p.version)
        yield from _cdf_stamped(upd_i, "update_postimage", p.version)
        yield from _cdf_stamped(del_d, "delete", p.version)
        yield from _cdf_stamped(ins_i, "insert", p.version)
        return
    yield from _cdf_stamped(dels, "delete", p.version)
    yield from _cdf_stamped(ins, "insert", p.version)


def _read_cdf_partition(p: _CDFPartition, arrow_schema, read_names=None) -> Iterator:
    import numpy as np
    import pyarrow as pa

    if p.kind == "empty":
        return  # quiet-range sentinel: zero rows, matching readChangeFeed
    if p.read_names is not None:
        read_names = p.read_names  # per-version plan beats the end fallback

    if p.kind == "insert":
        for batch in _read_parquet_batches(p.path, arrow_schema, read_names):
            yield from _cdf_stamped(
                pa.Table.from_batches([batch]), "insert", p.version
            )
        return

    if p.kind == "rewrite_diff":
        yield from _read_rewrite_diff(
            p, arrow_schema, read_names,
            p.read_names_old if p.read_names_old is not None else read_names,
        )
        return

    if p.kind == "pos_delete":
        # rows at THIS version's new positions (parent-live by
        # construction: the delete's own candidate scan was
        # parent-aware)
        delta = _dv_positions(p.delta_dv, p.rel)
        off = 0
        for batch in _read_parquet_batches(p.path, arrow_schema, read_names):
            n = batch.num_rows
            take = np.isin(np.arange(off, off + n), delta)
            off += n
            if take.any():
                tbl = pa.Table.from_batches([batch.filter(pa.array(take))])
                yield from _cdf_stamped(tbl, "delete", p.version)
        return

    # eq_delete: parent-LIVE rows of this file matching the new keys.
    # Key files hold PHYSICAL names; the data batches surface logical —
    # rename every key table before joining.
    inv = (
        {pn: ln for ln, pn in zip(arrow_schema.names, read_names)}
        if read_names is not None
        else {}
    )
    parent_dead = (
        _dv_positions(p.parent_dv, p.rel)
        if p.parent_dv
        else np.empty(0, np.int64)
    )
    kcols, kpaths = p.delta_keys
    join_cols, keys_tbl = _eq_keys_for_join(
        {"key_cols": kcols, "paths": kpaths}, inv, arrow_schema
    )
    off = 0
    for batch in _read_parquet_batches(p.path, arrow_schema, read_names):
        n = batch.num_rows
        if parent_dead.size:
            keep = ~np.isin(np.arange(off, off + n), parent_dead)
            off += n
            batch = batch if keep.all() else batch.filter(pa.array(keep))
        else:
            off += n
        tbl = pa.Table.from_batches([batch])
        for e in p.parent_eq or []:
            pj, pk = _eq_keys_for_join(e, inv, arrow_schema)
            tbl = tbl.join(pk, keys=pj, join_type="left anti")
        tbl = tbl.join(keys_tbl, keys=join_cols, join_type="left semi")
        yield from _cdf_stamped(tbl, "delete", p.version)


class _SnapshotCDFBatchReader(DataSourceReader):
    """Batch CHANGE DATA FEED: ``spark.read.format("snapshot_table")
    .option("changeFeed", "true")`` plans the SAME per-version work
    units as the streaming form over an explicit version range and
    stamps every row with ``_change_type`` / ``_commit_version`` —
    never a null-padded plain read. ``startingVersion`` is EXCLUSIVE
    (default -1 = full history), ``endingVersion`` inclusive (default
    tip) — the same convention as the streaming offsets and the
    ``snapshot_change_feed`` operator this mirrors."""

    def __init__(self, table_dir: str, sv: int, ev: int, schema: StructType):
        self._dir = table_dir
        self._sv = sv
        self._ev = ev
        self._schema = schema
        # ENDING version's logical→physical map: physical names are
        # stable, so every in-range file (even pre-rename) reads under it
        self._phys = dict(
            _read_manifest(table_dir, ev).get("phys") or {}
        ) if os.path.exists(_manifest_path(table_dir, ev)) else {}

    def partitions(self) -> Sequence[InputPartition]:
        parts = _plan_cdf_partitions(self._dir, self._sv, self._ev)
        if not parts:
            # quiet range (no commits, or only no-op reorgs): Delta's
            # readChangeFeed returns an EMPTY DataFrame here, so pollers
            # get zero rows instead of having to catch an exception. One
            # sentinel partition whose read() yields nothing keeps the
            # Python DS contract (non-empty partition list) intact.
            return [_CDFPartition("empty", None, None, self._sv)]
        return parts

    def read(self, partition: _CDFPartition) -> Iterator:
        from pyspark.sql.pandas.types import to_arrow_schema
        from pyspark.sql.types import StructType as _St

        arrow_schema = to_arrow_schema(
            _St(
                [
                    f
                    for f in self._schema.fields
                    if f.name not in ("_change_type", "_commit_version")
                ]
            )
        )
        read_names = (
            [self._phys.get(n, n) for n in arrow_schema.names]
            if self._phys
            else None
        )
        yield from _read_cdf_partition(partition, arrow_schema, read_names)


@dataclass
class _FileMessage(WriterCommitMessage):
    """Executor → driver: the one file this task staged (None if the
    partition was empty)."""

    rel_path: str | None
    rows: int


def _stage_partition(table_dir: str, batches, phys: dict | None = None) -> _FileMessage:
    """Executor-side: stream this task's Arrow batches into ONE staged
    parquet file under ``data-tasks/``. The file is INVISIBLE until the
    driver's commit publishes a manifest referencing it — which is the
    whole two-phase protocol: task failures/speculative duplicates leave
    only unreferenced files (vacuum debris), never partial table state.
    ``phys`` renames the incoming (logical) batch columns to the table's
    physical names before they hit parquet."""
    import uuid as _uuid

    import pyarrow.parquet as pq

    phys = phys or {}
    writer = None
    rel = os.path.join("data-tasks", f"part-{_uuid.uuid4().hex}.parquet")
    path = os.path.join(table_dir, rel)
    rows = 0
    try:
        for batch in batches:
            if phys and any(phys.get(n, n) != n for n in batch.schema.names):
                batch = batch.rename_columns(
                    [phys.get(n, n) for n in batch.schema.names]
                )
            if writer is None:
                os.makedirs(os.path.dirname(path), exist_ok=True)
                writer = pq.ParquetWriter(path, batch.schema)
            writer.write_batch(batch)
            rows += batch.num_rows
    finally:
        if writer is not None:
            writer.close()
    return _FileMessage(rel_path=rel if rows else None, rows=rows)


def _writer_phys(table_dir: str, schema: StructType | None, reset: bool = False) -> dict:
    """The full logical→physical map a sink write runs under, computed
    at writer CONSTRUCTION (driver-side) so executor tasks can rename
    batches before staging. Same rules as snapshot_commit: existing
    fields keep the table's assignment, new fields mint, full overwrite
    resets to identity."""
    from reactivestreams_kinesis_spark.operators.snapshots import (
        _commit_phys,
        _read_manifest,
        latest_version,
    )

    names = [] if schema is None else [f.name for f in schema.fields]
    tip = latest_version(table_dir)
    manifest = None if tip is None else _read_manifest(table_dir, tip)
    return _commit_phys(manifest, names, reset=reset)


def _staged_stats(table_dir: str, rel_paths) -> dict:
    """Footer stats (+ declared blooms) for the staged files at commit
    time — driver-side here because the harness is single-machine; on a
    real cluster each task would report its file's stats inside the
    WriterCommitMessage (same protocol, stats ride the messages instead
    of a re-read). When the table declares a PARTITION SPEC, each
    staged file's distinct partition tuples are recorded too (the
    sink's commit hook has no SparkSession, so the tuples come from a
    DuckDB distinct over exactly the new files — same bounded budget
    as the constraint check); sink tasks don't cluster, so a file may
    record several tuples — pruning stays exact either way."""
    from reactivestreams_kinesis_spark.operators.snapshots import (
        _commit_stats,
        _read_manifest,
        latest_version,
    )

    stats = _commit_stats(table_dir, rel_paths)
    tip = latest_version(table_dir)
    spec = (
        _read_manifest(table_dir, tip).get("partition_spec")
        if tip is not None
        else None
    )
    if spec:
        for f, tuples in _staged_pvals(table_dir, rel_paths, spec).items():
            stats.setdefault(f, {})["__pvals"] = tuples
    return stats


def _staged_pvals(table_dir: str, rel_paths, spec) -> dict:
    """DuckDB twin of `_compute_pvals` for the sink's session-less
    commit hook: per-file distinct partition tuples over the staged
    (physical-named) files. Bucket values compute in Python (zlib.crc32
    over the string form — the same portable definition the Spark
    expression and the prune path use)."""
    import zlib

    import duckdb

    from reactivestreams_kinesis_spark.operators.snapshots import (
        _transform_name,
    )

    con = duckdb.connect()
    out: dict = {f: [] for f in rel_paths}
    for rel in rel_paths:
        path = os.path.join(table_dir, rel)
        cols = []
        for e in spec:
            if e["kind"] == "day":
                cols.append(f"strftime(CAST(\"{e['col']}\" AS DATE), '%Y-%m-%d')")
            else:  # identity and bucket both need the raw value
                cols.append(f'"{e["col"]}"')
        rows = con.execute(
            f"SELECT DISTINCT {', '.join(cols)} FROM read_parquet(?)", [path]
        ).fetchall()
        seen = set()
        for r in rows:
            tup = {}
            for e, v in zip(spec, r):
                if e["kind"] == "bucket":
                    v = (
                        zlib.crc32(str(v).encode()) % e["n"]
                        if v is not None
                        else None
                    )
                elif v is not None and not isinstance(
                    v, (int, float, str, bool)
                ):
                    v = str(v)
                tup[_transform_name(e)] = v
            key = tuple(sorted(tup.items(), key=lambda kv: kv[0]))
            if key not in seen:  # bucket collapse can merge raw tuples
                seen.add(key)
                out[rel].append(tup)
    return out


def _validate_staged(
    table_dir: str, rel_paths, writer_schema_json, writer_phys: dict | None = None
) -> None:
    """Enforce the table's CHECK constraints on the staged files before
    the manifest publishes — the same commit-time contract
    ``snapshot_commit`` honors; without this the sink API would be a
    constraint bypass. The sink's ``commit`` hook runs in a worker
    process with NO SparkSession, so validation runs on the embedded
    local engine (DuckDB) straight over the staged parquet — bounded to
    THIS commit's files, and sound because constraints live in the
    repo's shared SQL dialect by policy (the same dual-dialect contract
    every oracle depends on). Columns of the table schema absent from
    the staged files project as NULL, so a narrower write evaluates a
    constraint on an evolved column as NULL → pass (SQL CHECK). Raising
    here aborts the commit: Spark calls the writer's ``abort``, which
    removes the staged files."""
    from reactivestreams_kinesis_spark.operators.snapshots import (
        _merge_schema,
        _read_manifest,
        latest_version,
    )

    tip = latest_version(table_dir)
    if tip is None or not rel_paths:
        return
    manifest = _read_manifest(table_dir, tip)
    constraints = manifest.get("constraints")
    if not constraints:
        return
    try:
        import duckdb
    except ImportError:
        raise RuntimeError(
            "snapshot_table commit: CHECK constraints exist but no local "
            "engine is available to validate them in the sink's commit "
            "hook — write via snapshot_commit instead"
        )
    import pyarrow.parquet as pq

    paths = [os.path.join(table_dir, f) for f in rel_paths]
    present = set(pq.read_schema(paths[0]).names)
    table_schema = _merge_schema(manifest.get("schema"), writer_schema_json)
    table_cols = (
        [f["name"] for f in table_schema["fields"]]
        if table_schema is not None
        else sorted(present)
    )
    # staged files hold PHYSICAL names; constraints are LOGICAL exprs —
    # project each logical column from its physical (or NULL if absent)
    phys = {**(manifest.get("phys") or {}), **(writer_phys or {})}
    sel = ", ".join(
        f'"{phys.get(c, c)}" AS "{c}"'
        if phys.get(c, c) in present
        else f'NULL AS "{c}"'
        for c in table_cols
    )
    con = duckdb.connect()
    staged = f"(SELECT {sel} FROM read_parquet({paths!r}))"
    bad = {}
    for name, expr in constraints.items():
        count = con.execute(
            f"SELECT COUNT(*) FROM {staged} WHERE NOT COALESCE(({expr}), TRUE)"
        ).fetchone()[0]
        if count:
            bad[name] = int(count)
    if bad:
        raise ValueError(
            f"CHECK constraint violation (rows per constraint): {bad}"
        )


def _clean_staged(table_dir: str, messages) -> None:
    for m in messages:
        if m is not None and m.rel_path:
            p = os.path.join(table_dir, m.rel_path)
            if os.path.exists(p):
                os.remove(p)


class _SnapshotBatchWriter(DataSourceArrowWriter):
    """``df.write.format("snapshot_table")``: tasks stage files, the
    driver's commit publishes ONE manifest — an atomic all-or-nothing
    batch write with snapshot semantics (mode('overwrite') → an
    overwrite commit; default append)."""

    def __init__(
        self, table_dir: str, overwrite: bool, schema: StructType | None = None
    ):
        self._dir = table_dir
        self._mode = "overwrite" if overwrite else "append"
        self._schema = None if schema is None else schema.jsonValue()
        self._phys = _writer_phys(
            table_dir, schema, reset=(self._mode == "overwrite")
        )

    def write(self, iterator) -> _FileMessage:
        return _stage_partition(self._dir, iterator, self._phys)

    def commit(self, messages) -> None:
        files = sorted(m.rel_path for m in messages if m and m.rel_path)
        _validate_staged(self._dir, files, self._schema, self._phys)
        publish_manifest(
            self._dir,
            files,
            mode=self._mode,
            schema=self._schema,
            new_stats=_staged_stats(self._dir, files),
            phys=self._phys,
        )

    def abort(self, messages) -> None:
        _clean_staged(self._dir, messages)


class _SnapshotStreamWriter(DataSourceStreamArrowWriter):
    """``writeStream.format("snapshot_table")``: one manifest per
    micro-batch, committed under the deterministic txn id
    ``dsw-<txnScope>-<batchId>`` — a replayed epoch (foreachBatch-style
    at-least-once) finds its txn published and no-ops, making the sink
    exactly-once end to end through the PUBLIC sink API rather than a
    foreachBatch closure. Empty batches publish nothing. A SECOND
    independent stream writing the same table must pass a distinct
    ``.option("txnScope", ...)`` (Delta's txnAppId contract): batch ids
    restart from 0 per query, so an unscoped second stream would collide
    with the first's epoch 0 and be swallowed as a replay."""

    def __init__(
        self,
        table_dir: str,
        schema: StructType | None = None,
        txn_scope: str = "default",
    ):
        self._dir = table_dir
        self._schema = None if schema is None else schema.jsonValue()
        self._scope = txn_scope
        self._phys = _writer_phys(table_dir, schema)

    def write(self, iterator) -> _FileMessage:
        return _stage_partition(self._dir, iterator, self._phys)

    def commit(self, messages, batchId: int) -> None:
        files = sorted(m.rel_path for m in messages if m and m.rel_path)
        if files:
            _validate_staged(self._dir, files, self._schema, self._phys)
            publish_manifest(
                self._dir,
                files,
                mode="append",
                txn_id=f"dsw-{self._scope}-{batchId}",
                schema=self._schema,
                new_stats=_staged_stats(self._dir, files),
                phys=self._phys,
            )

    def abort(self, messages, batchId: int) -> None:
        _clean_staged(self._dir, messages)


def register_snapshot_source(spark) -> None:
    """Register the format with a session (idempotent):
    ``spark.read.format("snapshot_table")`` afterwards. The session conf
    enables Python-source pushdown, but the DEFAULT batch reader does
    not implement ``pushFilters`` — source-level pushdown is per-read
    opt-in via ``.option("filterPushdown", "true")``, because of the
    Spark 4.1.2 relation-level readInfo cache documented on
    ``_PushdownSnapshotBatchReader`` (a consumed filter poisons later
    unfiltered reuse of the same DataFrame)."""
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(SnapshotTableDataSource)
