"""Shuffle-free co-located join over two bucket-partitioned snapshot
tables — the storage-partitioned join (Spark SPJ / Iceberg
bucket-to-bucket) re-expressed through the Python Data Source API.

When two snapshot tables declare the SAME bucket transform on their
join keys (``partition_by=[(key, "bucket", N)]``), row equality implies
bucket equality, so the join decomposes into N independent per-bucket
joins with NO exchange of either table: one input partition per bucket
reads that bucket's files from BOTH sides (through the full read stack
— declared schema, physical column mapping, deletion vectors, equality
deletes) and joins them with Arrow's hash-join kernel inside the task.
The physical plan is a bare ``BatchScan`` — zero shuffles, zero sorts —
where the generic plan exchanges both sides on the key.

At 100 TB this is the difference between shuffling two fact tables and
streaming N bounded bucket pairs: wall-clock scales with the largest
bucket, network cost is zero, and AQE has nothing to fix. The price is
layout discipline — both tables bucketed with the same N at write time
— which is exactly the trade Iceberg/Delta users make for SPJ.

Files whose recorded partition tuples straddle several buckets (or
files from before the spec declaration / an older spec — partition
evolution keeps their metadata) degrade safely: they are read in every
bucket they may contain and row-filtered by the bucket function
(crc32 of the key's canonical string form — the Python twin of the
manifest's transform, ``operators/snapshots._bucket_of``). Tight
layouts (the writer clusters each commit on the transform tuple) skip
the filter entirely.

Join types: inner / left_semi / left_anti / left_outer / right_outer /
full_outer. A NULL key matches nothing (SQL equality): null-key rows
drop from inner/semi and surface exactly once from the side an
anti/outer join preserves (one designated partition owns each side's
null rows). Non-key column-name collisions are refused at plan time
(project with ``leftColumns``/``rightColumns`` instead — which also
prunes the parquet reads to exactly the named columns).

Bucket-count mismatch: when one table is bucketed kN-ways and the other
N-ways (one count divides the other — the Iceberg SPJ compatibility
rule), the join plans at the COARSER count: ``crc32(k) % kN ≡ b``
implies ``crc32(k) % N ≡ b % N``, so each coarse task reads the finer
side's k child buckets. Incommensurable counts are refused.

Bucket-local aggregation (round 12): ``colocated_groupby`` — the
aggregation sibling of the co-located join. When the GROUP BY keys
include the table's bucket column, every row of a group lives in one
bucket, so each bucket task's aggregate IS the final answer: no
exchange of partial-aggregate rows at all. The generic plan's partial →
exchange → final shape is cheap when groups are few, but a
high-cardinality group-by (billions of groups at 100 TB — per-user,
per-document rollups) shuffles one row per group per upstream
partition; bucket-local finalization deletes that network stage
entirely. This is exactly what Spark grants natively-bucketed tables
via ``outputPartitioning`` — which the Python Data Source API cannot
declare — re-created by doing the (vectorized, Arrow-kernel) aggregation
inside the scan. Two-phase within each task: per-batch Arrow
``group_by`` partials, one merge per bucket — memory is bounded by
groups-per-bucket, never rows. NULL group keys form SQL's null group
(straddler files route them to exactly one owner partition); AVG is
kept as exact sum+count partials and divided at the end.

Fused join + aggregation: ``colocated_join_agg`` composes the two —
the per-entity star rollup (``SELECT keys, aggs FROM l JOIN r ON k
GROUP BY keys`` with the join key among the group keys) runs join AND
final aggregate inside each bucket task: zero exchanges end to end,
where the generic plan shuffles both tables for the join and then one
partial row per group. Inner joins only (outer padding and null-row
ownership interact with grouping), and ``leftSplit`` refuses to
compose (a chunked group would finalize twice).
"""

from __future__ import annotations

import os
from collections.abc import Iterator, Sequence
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition
from pyspark.sql.types import StructField, StructType

_JOIN_TYPES = {
    "inner", "left_semi", "left_anti", "left_outer", "right_outer", "full_outer",
}
# join types that emit left / right rows even without a match
_KEEPS_LEFT = {"left_anti", "left_outer", "full_outer"}
_KEEPS_RIGHT = {"right_outer", "full_outer"}
# the Python bucket function's exactness contract (str(v) must equal
# Spark's cast-to-string) — mirrors operators/snapshots._bucket_of
_EXACT_KEY_TYPES = {"tinyint", "smallint", "int", "bigint", "string"}

from reactivestreams_kinesis_spark.operators.snapshots import (
    _inv_phys,
    _read_manifest,
    _transform_name,
    latest_version,
    prune_files,
)
from reactivestreams_kinesis_spark.sources.snapshot_source import (
    _SnapshotBatchReader,
    _strip_file_scheme,
)


@dataclass
class _SideFiles:
    """One table's contribution to one bucket's task."""

    table_dir: str
    phys: dict
    schema: StructType  # projected LOGICAL read schema (key included)
    key: str
    files: list = field(default_factory=list)  # [(FilePartition, tight)]
    # scan_snapshot-style (col, op, value) predicates, already consumed
    # for FILE pruning at plan time; re-applied row-exactly in-task
    predicates: list = field(default_factory=list)


# scan-predicate op → the snapshot source's arrow-filter op vocabulary
_ARROW_OPS = {"=": "eq", ">": "gt", ">=": "gte", "<": "lt", "<=": "lte", "in": "in"}


@dataclass
class _BucketPartition(InputPartition):
    bucket: int | None  # None = sentinel empty partition
    n: int
    left: _SideFiles | None = None
    right: _SideFiles | None = None
    join_type: str = "inner"
    # exactly ONE partition owns each side's NULL-key rows from
    # straddling files — they belong to no bucket, but anti/outer joins
    # must emit them (exactly once)
    owns_nulls: bool = False
    owns_right_nulls: bool = False


def _bucket_mask(col, n: int, b: int, keep_nulls: bool = False):
    """Arrow boolean mask: rows of ``col`` whose bucket is ``b`` — the
    Python twin of the manifest transform (pmod(crc32(cast(k as
    string)), n)). Runs only for straddling files. NULL keys belong to
    no bucket; ``keep_nulls`` routes them to the one partition that
    owns them (anti/outer semantics)."""
    import zlib

    import pyarrow as pa

    return pa.array(
        [
            (keep_nulls if v is None
             else zlib.crc32(str(v).encode()) % n == b)
            for v in col.to_pylist()
        ],
        type=pa.bool_(),
    )


def _spec_bucket_entry(manifest: dict, key: str) -> dict:
    """The manifest's bucket transform over logical ``key`` (spec
    entries store PHYSICAL names — rename-proof), or a loud refusal:
    without a shared bucket layout there is nothing co-located about
    this join and the generic exchange join is the right plan."""
    inv = _inv_phys(manifest)
    for e in manifest.get("partition_spec") or []:
        if e.get("kind") == "bucket" and inv.get(e["col"], e["col"]) == key:
            return e
    raise ValueError(
        f"table has no bucket partition spec on {key!r} — colocated_join "
        "needs both tables committed with partition_by=[(key, 'bucket', N)] "
        "(same N); use a regular join otherwise"
    )


def _side_plan(table_dir: str, version: int, key: str, columns, predicates=None) -> tuple:
    """Driver-side planning for one table: projected read schema,
    per-file partitions (DV/eq-delete wired by the snapshot reader's own
    planner) pruned by any side predicates (manifest stats / partition
    tuples / blooms — the same `prune_files` every scan uses), and each
    file's bucket assignment from the manifest's recorded partition
    tuples."""
    manifest = _read_manifest(table_dir, version)
    if manifest.get("schema") is None:
        raise ValueError(
            f"{table_dir!r} has no declared schema — colocated_join needs "
            "schema-carrying manifests"
        )
    full = StructType.fromJson(manifest["schema"])
    names = [f.name for f in full.fields]
    if key not in names:
        raise ValueError(f"join key {key!r} not in {table_dir!r} columns {names}")
    keep = list(columns) if columns else names
    missing = [c for c in keep if c not in names]
    if missing:
        raise ValueError(f"projected columns not in {table_dir!r}: {missing}")
    if key not in keep:
        keep = [key, *keep]
    proj = StructType([f for f in full.fields if f.name in set(keep)])

    entry = _spec_bucket_entry(manifest, key)
    n = int(entry["n"])
    bname = _transform_name(entry)

    predicates = list(predicates or [])
    bad_cols = [c for (c, _, _) in predicates if c not in set(keep)]
    if bad_cols:
        raise ValueError(
            f"predicate columns not in the projected read: {bad_cols}"
        )
    side = _SideFiles(
        table_dir=table_dir,
        phys=dict(manifest.get("phys") or {}),
        schema=proj,
        key=key,
        predicates=predicates,
    )
    # the snapshot reader's own partition planner wires DV paths and
    # scoped equality deletes per file — the join reads through the
    # exact same merge-on-read stack as a plain scan
    fps = _SnapshotBatchReader(table_dir, manifest, proj).partitions()
    if predicates:
        survivors = set(prune_files(manifest, predicates))
        fps = [fp for fp in fps if fp.rel in survivors]
    stats = manifest.get("stats") or {}
    by_bucket: dict[int, list] = {}
    straddlers: list = []  # (fp) readable in EVERY bucket, row-filtered
    for fp in fps:
        pvals = (stats.get(fp.rel) or {}).get("__pvals")
        if pvals == []:
            continue  # provably empty file
        buckets = set()
        unknown = pvals is None
        for tup in pvals or []:
            b = tup.get(bname)
            if b is None:
                unknown = True  # pre-spec or different-spec era file
                break
            buckets.add(int(b))
        if unknown:
            straddlers.append(fp)
        else:
            tight = len(buckets) == 1
            for b in buckets:
                by_bucket.setdefault(b, []).append((fp, tight))
    if straddlers:
        # straddling files are row-filtered by the PYTHON bucket twin,
        # whose str(v) is only guaranteed to equal Spark's
        # cast-to-string for integers and strings (same exactness
        # contract as _bucket_of / the blooms). Other key types (float
        # 1e20 → '1e+20' vs '1.0E20', bool True → 'True' vs 'true')
        # would silently route rows to the wrong bucket and DROP them
        # from the join — refuse at plan time instead.
        kt = {f.name: f.dataType for f in proj.fields}[key].simpleString()
        if kt not in _EXACT_KEY_TYPES:
            raise ValueError(
                f"colocated_join: {table_dir!r} has files without exact "
                f"bucket metadata (pre-spec or straddling commits) and the "
                f"join key {key!r} is {kt} — the row-level bucket filter is "
                f"only exact for {sorted(_EXACT_KEY_TYPES)}; compact the "
                "table onto the bucket spec or use a regular join"
            )
    return side, n, by_bucket, straddlers


class ColocatedJoinDataSource(DataSource):
    """``spark.read.format("snapshot_colocated_join")`` options:
    ``leftPath``/``rightPath`` (table dirs), ``leftKey``/``rightKey``
    (logical join columns; ``key`` sets both), optional
    ``leftVersion``/``rightVersion`` time travel, optional
    ``leftColumns``/``rightColumns`` comma-separated projections
    (pruned down to the parquet reads)."""

    @classmethod
    def name(cls) -> str:
        return "snapshot_colocated_join"

    def _opt(self, name: str, required: bool = False):
        v = self.options.get(name)
        if required and not v:
            raise ValueError(f"snapshot_colocated_join requires .option({name!r}, ...)")
        return v

    def _plan_inputs(self):
        ldir = _strip_file_scheme(self._opt("leftPath", required=True))
        rdir = _strip_file_scheme(self._opt("rightPath", required=True))
        lkey = self._opt("leftKey") or self._opt("key")
        rkey = self._opt("rightKey") or self._opt("key")
        if not lkey or not rkey:
            raise ValueError(
                "snapshot_colocated_join requires .option('key', <col>) or "
                "both leftKey/rightKey"
            )
        lv = self._opt("leftVersion")
        rv = self._opt("rightVersion")
        lv = latest_version(ldir) if lv is None else int(lv)
        rv = latest_version(rdir) if rv is None else int(rv)
        if lv is None or rv is None:
            raise FileNotFoundError("no snapshots in one of the join inputs")
        cols = lambda s: [c.strip() for c in s.split(",")] if s else None

        def preds(s):
            if not s:
                return None
            import json

            out = []
            for c, op, v in json.loads(s):
                out.append((c, op, tuple(v) if isinstance(v, list) else v))
            return out

        return (
            (ldir, lv, lkey, cols(self._opt("leftColumns")), preds(self._opt("leftWhere"))),
            (rdir, rv, rkey, cols(self._opt("rightColumns")), preds(self._opt("rightWhere"))),
        )

    def _join_type(self) -> str:
        jt = (self._opt("joinType") or "inner").lower()
        if jt not in _JOIN_TYPES:
            raise ValueError(
                f"unsupported joinType {jt!r} (supported: {sorted(_JOIN_TYPES)})"
            )
        return jt

    def _left_split(self) -> int | None:
        v = self._opt("leftSplit")
        if v is None:
            return None
        n = int(v)
        if n < 1:
            raise ValueError("leftSplit must be >= 1")
        return n

    def _agg_spec(self):
        """Optional fused aggregation over the joined relation
        (``aggGroupBy`` + ``aggSpec`` options): the group keys must
        include the LEFT join key — that inclusion pins every group to
        one bucket, which is what makes per-bucket finalization exact —
        and only the inner join composes (outer padding/null ownership
        interacts with grouping; anti/semi aggregate the left side,
        which plain colocated_groupby already covers)."""
        import json

        gb = self._opt("aggGroupBy")
        sp = self._opt("aggSpec")
        if not gb and not sp:
            return None
        if not (gb and sp):
            raise ValueError(
                "fused aggregation needs BOTH aggGroupBy and aggSpec"
            )
        keys = [c.strip() for c in gb.split(",")]
        aggs = []
        for name, fn, col in json.loads(sp):
            fn = fn.lower()
            if fn not in _AGG_FNS:
                raise ValueError(
                    f"unsupported aggregate {fn!r} for {name!r} "
                    f"(supported: {list(_AGG_FNS)})"
                )
            if col is None and fn != "count":
                raise ValueError(f"{name!r}: only count supports col=None")
            aggs.append((name, fn, col))
        if not aggs:
            raise ValueError("aggSpec must name at least one aggregate")
        names = [n for n, _f, _c in aggs]
        dup = sorted({n for n in names if names.count(n) > 1 or n in keys})
        if dup:
            raise ValueError(f"aggregate output names collide: {dup}")
        return keys, aggs

    def _joined_schema(self) -> StructType:
        (ldir, lv, lkey, lcols, lw), (rdir, rv, rkey, rcols, rw) = self._plan_inputs()
        jt = self._join_type()
        left, _, _, _ = _side_plan(ldir, lv, lkey, lcols, lw)
        if jt in ("left_semi", "left_anti"):
            return left.schema  # existence tests surface left rows only
        right, _, _, _ = _side_plan(rdir, rv, rkey, rcols, rw)
        lfields = list(left.schema.fields)
        rfields = [f for f in right.schema.fields if f.name != rkey]
        if jt in ("left_outer", "full_outer"):
            # unmatched left rows pad NULL on the right side
            rfields = [
                StructField(f.name, f.dataType, nullable=True) for f in rfields
            ]
        if jt in ("right_outer", "full_outer"):
            # unmatched right rows pad NULL on the left side (the output
            # key column is the coalesced join key, NULL only for
            # null-key rows — but unmatched-right padding makes every
            # left field nullable in the declared shape)
            lfields = [
                StructField(f.name, f.dataType, nullable=True) for f in lfields
            ]
        out = lfields + rfields
        names = [f.name for f in out]
        dup = sorted({c for c in names if names.count(c) > 1})
        if dup:
            raise ValueError(
                f"column name collision across join sides: {dup} — project "
                "with leftColumns/rightColumns options"
            )
        return StructType(out)

    def schema(self) -> StructType:
        joined = self._joined_schema()
        agg = self._agg_spec()
        if agg is None:
            return joined
        keys, aggs = agg
        jt = self._join_type()
        (_ld, _lv, lkey, _lc, _lwp), _r = self._plan_inputs()
        if jt != "inner":
            raise ValueError(
                "fused aggregation composes with joinType=inner only"
            )
        if lkey not in keys:
            raise ValueError(
                f"fused aggregation needs the left join key {lkey!r} among "
                f"the group keys {keys} — that is what pins each group to "
                "one bucket"
            )
        by_name = {f.name: f for f in joined.fields}
        missing = [k for k in keys if k not in by_name] + [
            c for _n, _f, c in aggs if c is not None and c not in by_name
        ]
        if missing:
            raise ValueError(
                f"fused-aggregation columns not in the joined relation: "
                f"{sorted(set(missing))} (available: {list(by_name)})"
            )
        fields = [
            StructField(k, by_name[k].dataType, nullable=True) for k in keys
        ]
        for name, fn, col in aggs:
            dt = by_name[col].dataType if col is not None else None
            fields.append(StructField(name, _agg_out_type(fn, dt), nullable=True))
        return StructType(fields)

    def reader(self, schema: StructType) -> DataSourceReader:
        left, right = self._plan_inputs()
        jt = self._join_type()
        split = self._left_split()
        if split is not None and jt in _KEEPS_RIGHT:
            raise ValueError(
                "leftSplit cannot compose with right_outer/full_outer: each "
                "left chunk would re-emit the right bucket's unmatched rows "
                "once per chunk"
            )
        agg = self._agg_spec()
        if agg is not None:
            self.schema()  # re-run the fused-agg eligibility checks loudly
            if split is not None:
                raise ValueError(
                    "leftSplit cannot compose with fused aggregation: a "
                    "group's left rows may span chunks, and per-chunk "
                    "finalization would emit the group twice"
                )
        return _ColocatedJoinReader(left, right, schema, jt, split, agg)


class _ColocatedJoinReader(DataSourceReader):
    def __init__(
        self,
        left,
        right,
        schema: StructType,
        join_type: str = "inner",
        left_split: int | None = None,
        agg=None,
    ):
        self._left = left
        self._right = right
        self._schema = schema
        self._join_type = join_type
        self._left_split = left_split
        self._agg = agg  # (group_keys, aggs) for the fused rollup

    def partitions(self) -> Sequence[InputPartition]:
        lside, ln, lbuckets, lstrad = _side_plan(*self._left)
        rside, rn, rbuckets, rstrad = _side_plan(*self._right)
        jt = self._join_type
        if ln != rn:
            # compatible mismatch (one count divides the other): plan at
            # the COARSER count — crc32(k) % kN ≡ b implies
            # crc32(k) % N ≡ b % N, so a coarse task reads the finer
            # side's k child buckets; file tightness survives (a file
            # within one child bucket is within one coarse bucket), and
            # the straddler row filter runs at the coarse modulus
            hi, lo = max(ln, rn), min(ln, rn)
            if hi % lo != 0:
                raise ValueError(
                    f"bucket counts differ ({ln} vs {rn}) and neither "
                    "divides the other — co-location needs the same N or "
                    "a kN/N pair on the two tables"
                )

            def coarsen(by_bucket: dict) -> dict:
                # per-FILE collapse, not per-entry: a multi-bucket file
                # (its commit's clustering packed several child buckets
                # into one output file) appears under EACH child bucket;
                # children congruent mod lo would land the same coarse
                # task twice and double its rows. Collapse to the file's
                # coarse-bucket SET — tight iff that set is a singleton
                # (then every row provably belongs to the one coarse
                # bucket and the row filter is skipped).
                per_file: dict[str, list] = {}
                for b in sorted(by_bucket):
                    for fp, _tight in by_bucket[b]:
                        ent = per_file.setdefault(fp.rel, [fp, set()])
                        ent[1].add(b % lo)
                out: dict[int, list] = {}
                for fp, coarse in per_file.values():
                    tight = len(coarse) == 1
                    for cb in sorted(coarse):
                        out.setdefault(cb, []).append((fp, tight))
                return out

            if ln > lo:
                lbuckets = coarsen(lbuckets)
            if rn > lo:
                rbuckets = coarsen(rbuckets)
            n = lo
        else:
            n = ln
        # a side with straddler/unknown files may hold EVERY bucket, so
        # those files join into each candidate bucket under the row
        # filter. inner/semi need both sides present; anti/outer emit
        # a preserved side's rows even where the other has nothing
        lcand = set(lbuckets) | (set(range(n)) if lstrad else set())
        rcand = set(rbuckets) | (set(range(n)) if rstrad else set())
        if jt in ("left_anti", "left_outer"):
            live = sorted(lcand)
        elif jt == "right_outer":
            live = sorted(rcand)
        elif jt == "full_outer":
            live = sorted(lcand | rcand)
        else:
            live = sorted(lcand & rcand)
        parts: list[InputPartition] = []
        null_owner_assigned = False
        right_null_owner_assigned = False
        split = self._left_split
        for b in live:
            rf = _SideFiles(
                rside.table_dir, rside.phys, rside.schema, rside.key,
                predicates=rside.predicates,
            )
            rf.files = list(rbuckets.get(b, [])) + [(fp, False) for fp in rstrad]
            # skew control: a hot bucket's TIGHT left files split across
            # tasks (each left row lives in exactly one chunk, so every
            # left-preserving join type stays row-local given the full
            # right bucket); straddlers ride with chunk 0 only — they
            # are per-bucket row-filtered, so spreading them over chunks
            # would re-emit their rows once per chunk
            tight_files = list(lbuckets.get(b, []))
            chunks = (
                [tight_files[i : i + split] for i in range(0, len(tight_files), split)]
                if split and len(tight_files) > split
                else [tight_files]
            )
            strad_files = [(fp, False) for fp in lstrad]
            for ci, chunk in enumerate(chunks):
                lf = _SideFiles(
                    lside.table_dir, lside.phys, lside.schema, lside.key,
                    predicates=lside.predicates,
                )
                lf.files = list(chunk) + (strad_files if ci == 0 else [])
                has_l, has_r = bool(lf.files), bool(rf.files)
                if jt in ("left_anti", "left_outer"):
                    include = has_l
                elif jt == "right_outer":
                    include = has_r and (has_l or ci == 0)
                elif jt == "full_outer":
                    include = (has_l or has_r) and (has_l or ci == 0)
                else:  # inner / left_semi
                    include = has_l and has_r
                if include:
                    owns = (
                        jt in _KEEPS_LEFT
                        and has_l
                        and ci == 0
                        and not null_owner_assigned
                    )
                    null_owner_assigned = null_owner_assigned or owns
                    owns_r = (
                        jt in _KEEPS_RIGHT
                        and has_r
                        and ci == 0
                        and not right_null_owner_assigned
                    )
                    right_null_owner_assigned = right_null_owner_assigned or owns_r
                    parts.append(
                        _BucketPartition(
                            b, n, lf, rf, join_type=jt,
                            owns_nulls=owns, owns_right_nulls=owns_r,
                        )
                    )
        if not parts:
            # provably empty join — one sentinel keeps the Python DS
            # contract (non-empty partition list), reads as zero rows
            return [_BucketPartition(None, n, join_type=jt)]
        return parts

    def _side_table(
        self,
        side: _SideFiles,
        bucket: int,
        n: int,
        *,
        keep_null_keys: bool = False,
    ):
        """Read one side's bucket: every file through the snapshot
        reader's full per-file path (declared schema, physical names,
        DV mask, equality anti-join), straddlers row-filtered to the
        bucket. NULL keys drop unless this partition owns them
        (anti/outer left side — a null key matches nothing but the row
        itself must surface)."""
        import pyarrow as pa
        from pyspark.sql.pandas.types import to_arrow_schema

        arrow_schema = to_arrow_schema(side.schema)
        # a light reader carrying exactly what the per-file read path
        # consumes: dir, physical map, declared schema (no pushdown)
        rdr = _SnapshotBatchReader(
            side.table_dir, {"files": [], "phys": side.phys}, side.schema
        )
        batches = []
        for fp, tight in side.files:
            for b in rdr.read(fp):
                if not tight:
                    mask = _bucket_mask(
                        b.column(side.key), n, bucket, keep_nulls=keep_null_keys
                    )
                    b = b.filter(mask)
                if b.num_rows:
                    batches.append(b)
        if not batches:
            return pa.Table.from_batches([], schema=arrow_schema)
        tbl = pa.Table.from_batches(batches)
        if side.predicates:
            # the predicates already pruned FILES at plan time; the
            # row-exact re-apply happens here (Arrow kernel, logical
            # names — batches are already renamed)
            from reactivestreams_kinesis_spark.sources.snapshot_source import (
                _arrow_expr,
            )

            triples = [
                (_ARROW_OPS[op], c, v) for (c, op, v) in side.predicates
            ]
            tbl = tbl.filter(_arrow_expr(triples))
        if not keep_null_keys and tbl.column(side.key).null_count:
            import pyarrow.compute as pc

            tbl = tbl.filter(pc.is_valid(tbl.column(side.key)))
        return tbl

    def read(self, partition: _BucketPartition) -> Iterator:
        if partition.bucket is None:
            return
        import pyarrow as pa
        from pyspark.sql.pandas.types import to_arrow_schema

        jt = partition.join_type
        keeps_left = jt in _KEEPS_LEFT
        keeps_right = jt in _KEEPS_RIGHT
        left = self._side_table(
            partition.left,
            partition.bucket,
            partition.n,
            keep_null_keys=keeps_left and partition.owns_nulls,
        )
        if left.num_rows == 0 and not keeps_right:
            return
        right = self._side_table(
            partition.right,
            partition.bucket,
            partition.n,
            # null right keys match nothing but right_outer/full_outer
            # must surface them — exactly once, from the owner partition
            keep_null_keys=keeps_right and partition.owns_right_nulls,
        )
        if right.num_rows == 0 and not keeps_left and jt != "right_outer":
            return  # inner/semi: nothing can match
        if right.num_rows == 0 and jt == "right_outer":
            return  # right outer preserves only right rows
        if jt in ("left_semi", "left_anti"):
            # existence test against the right KEYS only
            rkeys = right.select([partition.right.key]).rename_columns(
                [partition.left.key]
            )
            joined = left.join(
                rkeys.group_by(partition.left.key).aggregate([]),
                keys=[partition.left.key],
                join_type="left semi" if jt == "left_semi" else "left anti",
            )
        else:
            # Arrow's hash join already gives SQL null semantics: a NULL
            # key matches nothing, and outer types emit each side's
            # null-key rows unmatched (null never equals null)
            arrow_jt = {
                "inner": "inner",
                "left_outer": "left outer",
                "right_outer": "right outer",
                "full_outer": "full outer",
            }[jt]
            joined = left.join(
                right,
                keys=[partition.left.key],
                right_keys=[partition.right.key],
                join_type=arrow_jt,
            )
            if jt == "right_outer" and partition.right.key != partition.left.key:
                # arrow names a right-outer's coalesced key after the
                # RIGHT side; the declared output schema keys on the left
                joined = joined.rename_columns(
                    [
                        partition.left.key if c == partition.right.key else c
                        for c in joined.column_names
                    ]
                )
        if joined.num_rows == 0:
            return
        out_schema = to_arrow_schema(self._schema)
        if self._agg is not None:
            # fused rollup: the per-bucket joined relation aggregates
            # in-task (group keys include the join key, so every group
            # is bucket-local and this IS the final answer)
            keys, aggs = self._agg
            partial = _partial_spec(aggs)
            final = _merge_partials(
                [_partial_agg(joined, keys, partial)], keys, partial
            )
            yield from _finalize_agg(final, keys, aggs, out_schema).to_batches()
            return
        cols = [joined.column(f.name).cast(f.type) for f in out_schema]
        yield from pa.Table.from_arrays(cols, schema=out_schema).to_batches()


def register_colocated_source(spark: SparkSession) -> None:
    """Idempotent registration (same pattern as register_snapshot_source)."""
    spark.dataSource.register(ColocatedJoinDataSource)


def colocated_join(
    spark: SparkSession,
    left_dir: str,
    right_dir: str,
    *,
    left_key: str,
    right_key: str | None = None,
    how: str = "inner",
    left_columns: list[str] | None = None,
    right_columns: list[str] | None = None,
    left_where: list | None = None,
    right_where: list | None = None,
    left_version: int | None = None,
    right_version: int | None = None,
    left_split: int | None = None,
) -> DataFrame:
    """The convenience wrapper: register + read. ``how`` is one of
    inner / left_semi / left_anti / left_outer / right_outer /
    full_outer — semi/anti surface left columns only; the others drop
    the right key column (``df.join(other, on=key)`` shape, the output
    key coalesced across sides for right/full outer). NULL keys match
    nothing, so they vanish from inner/semi and surface (exactly once)
    from the side an anti/outer preserves, the SQL contract.
    ``left_split`` caps the tight left files per task (skew control: a
    hot bucket fans out over ceil(files/split) tasks, each joining its
    slice against the full right bucket — wall-clock stops being
    bounded by the largest bucket, at the price of re-reading that
    bucket's right side per slice); it refuses to compose with
    right/full outer (chunking would re-emit unmatched right rows)."""
    register_colocated_source(spark)
    r = (
        spark.read.format("snapshot_colocated_join")
        .option("leftPath", left_dir)
        .option("rightPath", right_dir)
        .option("leftKey", left_key)
        .option("rightKey", right_key or left_key)
        .option("joinType", how)
    )
    if left_columns:
        r = r.option("leftColumns", ",".join(left_columns))
    if right_columns:
        r = r.option("rightColumns", ",".join(right_columns))
    if left_where or right_where:
        import json

        to_json = lambda ps: json.dumps(
            [[c, op, list(v) if isinstance(v, tuple) else v] for c, op, v in ps]
        )
        if left_where:
            r = r.option("leftWhere", to_json(left_where))
        if right_where:
            r = r.option("rightWhere", to_json(right_where))
    if left_version is not None:
        r = r.option("leftVersion", str(left_version))
    if right_version is not None:
        r = r.option("rightVersion", str(right_version))
    if left_split is not None:
        r = r.option("leftSplit", str(left_split))
    return r.load()


# ---- bucket-local aggregation (round 12) -----------------------------------

_AGG_FNS = ("count", "sum", "min", "max", "avg")


def _agg_out_type(fn: str, dt):
    """Declared Spark output type per aggregate — Spark's own widening
    rules where they matter at refresh scale: integral SUM widens to
    bigint (overflow headroom), decimal SUM gains 10 digits of
    precision (capped at 38), AVG divides exactly-kept sum/count into a
    double (DuckDB's avg shape, documented)."""
    from pyspark.sql.types import (
        DecimalType,
        DoubleType,
        FloatType,
        LongType,
    )

    if fn == "count":
        return LongType()
    if fn == "avg":
        return DoubleType()
    if fn == "sum":
        if isinstance(dt, DecimalType):
            return DecimalType(min(38, dt.precision + 10), dt.scale)
        if isinstance(dt, (FloatType, DoubleType)):
            return DoubleType()
        return LongType()
    return dt  # min / max


class BucketedAggDataSource(DataSource):
    """``spark.read.format("snapshot_bucketed_agg")`` options: ``path``
    (table dir), ``groupBy`` (comma-separated; must include the table's
    bucket column), ``aggs`` (JSON ``[[name, fn, col|null], ...]`` with
    fn in count|sum|min|max|avg; col null = COUNT(*)), optional
    ``version`` time travel and ``where`` (JSON scan-predicate triples,
    file-pruned at plan time and re-applied row-exactly in-task)."""

    @classmethod
    def name(cls) -> str:
        return "snapshot_bucketed_agg"

    def _opt(self, name: str, required: bool = False):
        v = self.options.get(name)
        if required and not v:
            raise ValueError(
                f"snapshot_bucketed_agg requires .option({name!r}, ...)"
            )
        return v

    def _spec(self):
        import json

        table_dir = _strip_file_scheme(self._opt("path", required=True))
        group_by = [c.strip() for c in self._opt("groupBy", required=True).split(",")]
        aggs = []
        for item in json.loads(self._opt("aggs", required=True)):
            name, fn, col = item
            fn = fn.lower()
            if fn not in _AGG_FNS:
                raise ValueError(
                    f"unsupported aggregate {fn!r} for {name!r} "
                    f"(supported: {list(_AGG_FNS)})"
                )
            if col is None and fn != "count":
                raise ValueError(f"{name!r}: only count supports col=None")
            aggs.append((name, fn, col))
        if not aggs:
            raise ValueError("snapshot_bucketed_agg needs at least one aggregate")
        dup = sorted(
            {n for n, _f, _c in aggs
             if [x[0] for x in aggs].count(n) > 1 or n in group_by}
        )
        if dup:
            raise ValueError(f"aggregate output names collide: {dup}")
        version = self._opt("version")
        version = latest_version(table_dir) if version is None else int(version)
        if version is None:
            raise FileNotFoundError(f"no snapshots in {table_dir!r}")
        preds = None
        w = self._opt("where")
        if w:
            preds = [
                (c, op, tuple(v) if isinstance(v, list) else v)
                for c, op, v in json.loads(w)
            ]
        # the bucket column: any group key carrying a bucket transform.
        # With the bucket key among the GROUP BY keys, a group's rows
        # share it — hence share a bucket — hence finalize locally.
        manifest = _read_manifest(table_dir, version)
        bucket_key = None
        for g in group_by:
            try:
                _spec_bucket_entry(manifest, g)
                bucket_key = g
                break
            except ValueError:
                continue
        if bucket_key is None:
            raise ValueError(
                f"no GROUP BY column of {group_by} carries a bucket "
                "partition spec — bucket-local aggregation needs the "
                "bucket key among the group keys; use a regular groupBy "
                "otherwise"
            )
        need = list(group_by)
        for _n, _f, c in aggs:
            if c is not None and c not in need:
                need.append(c)
        for (c, _op, _v) in preds or []:
            if c not in need:
                need.append(c)
        return table_dir, version, bucket_key, group_by, aggs, need, preds

    def schema(self) -> StructType:
        table_dir, version, bucket_key, group_by, aggs, need, preds = self._spec()
        side, _n, _bb, _st = _side_plan(table_dir, version, bucket_key, need, preds)
        by_name = {f.name: f for f in side.schema.fields}
        missing = [g for g in group_by if g not in by_name]
        if missing:
            raise ValueError(f"group keys not in {table_dir!r}: {missing}")
        fields = [
            StructField(g, by_name[g].dataType, nullable=True) for g in group_by
        ]
        for name, fn, col in aggs:
            dt = by_name[col].dataType if col is not None else None
            fields.append(
                StructField(name, _agg_out_type(fn, dt), nullable=True)
            )
        return StructType(fields)

    def reader(self, schema: StructType) -> DataSourceReader:
        return _BucketedAggReader(self._spec(), schema)


@dataclass
class _AggPartition(InputPartition):
    bucket: int | None  # None = sentinel empty partition
    n: int
    side: _SideFiles | None = None
    group_by: list = field(default_factory=list)
    aggs: list = field(default_factory=list)
    owns_nulls: bool = False


def _partial_spec(aggs) -> dict:
    """One Arrow aggregate per DISTINCT (fn-ish, col) — shared across
    output names; AVG decomposed into exact sum + valid-count.
    Returns {partial_col_name: (col, arrow_fn)}."""
    partial: dict[str, tuple] = {}
    for _name, fn, col in aggs:
        if fn == "count" and col is None:
            partial["__cnt_all"] = (None, "count_all")
        elif fn == "count":
            partial[f"__cnt__{col}"] = (col, "count")
        elif fn in ("sum", "avg"):
            partial[f"__sum__{col}"] = (col, "sum")
            if fn == "avg":
                partial[f"__cnt__{col}"] = (col, "count")
        else:
            partial[f"__{fn}__{col}"] = (col, fn)
    return partial


def _partial_agg(tbl, keys: list, partial: dict):
    """Per-batch partial aggregate. Arrow puts the keys first, then
    results named "{col}_{fn}" / "count_all" in spec order — rename
    positionally to the stable partial names."""
    specs, names = [], []
    for pname, (col, afn) in partial.items():
        specs.append(([] if col is None else col, afn))
        names.append(pname)
    out = tbl.group_by(keys, use_threads=False).aggregate(specs)
    return out.rename_columns(
        list(out.column_names[: len(out.column_names) - len(names)]) + names
    )


def _merge_partials(partials: list, keys: list, partial: dict):
    """Merge stage: sums and counts add, extremes fold — renamed back
    to the partial names."""
    import pyarrow as pa

    merged = pa.concat_tables(partials)
    mspecs, mnames = [], []
    for pname, (col, afn) in partial.items():
        if afn in ("count", "count_all", "sum"):
            mspecs.append((pname, "sum"))
        else:
            mspecs.append((pname, afn))
        mnames.append(pname)
    final = merged.group_by(keys, use_threads=False).aggregate(mspecs)
    return final.rename_columns(
        list(final.column_names[: len(final.column_names) - len(mnames)])
        + mnames
    )


def _finalize_agg(final, keys: list, aggs, out_schema):
    """Map the merged partial state onto the declared output schema:
    AVG divides its exact sum/count pair (NULL at count 0 — the SQL
    contract), SUM keeps Arrow's null-at-zero-valid, everything casts
    to the declared type."""
    import pyarrow as pa
    import pyarrow.compute as pc

    cols = []
    keyset = set(keys)
    for f in out_schema:
        if f.name in keyset:
            cols.append(final.column(f.name).cast(f.type))
            continue
        fn, col = next(
            (a_fn, a_col) for a_name, a_fn, a_col in aggs if a_name == f.name
        )
        if fn == "count" and col is None:
            arr = final.column("__cnt_all")
        elif fn == "count":
            arr = final.column(f"__cnt__{col}")
        elif fn == "sum":
            arr = final.column(f"__sum__{col}")
        elif fn == "avg":
            s = final.column(f"__sum__{col}")
            c = final.column(f"__cnt__{col}")
            arr = pc.if_else(
                pc.equal(c, pa.scalar(0, c.type)),
                pa.scalar(None, pa.float64()),
                pc.divide(pc.cast(s, pa.float64()), pc.cast(c, pa.float64())),
            )
        else:
            arr = final.column(f"__{fn}__{col}")
        cols.append(pc.cast(arr, f.type) if arr.type != f.type else arr)
    return pa.Table.from_arrays(
        [c.combine_chunks() if hasattr(c, "combine_chunks") else c for c in cols],
        schema=out_schema,
    )


class _BucketedAggReader(DataSourceReader):
    def __init__(self, spec, schema: StructType):
        (self._dir, self._version, self._key, self._group_by,
         self._aggs, self._need, self._preds) = spec
        self._schema = schema

    def partitions(self) -> Sequence[InputPartition]:
        side, n, by_bucket, straddlers = _side_plan(
            self._dir, self._version, self._key, self._need, self._preds
        )
        cand = set(by_bucket) | (set(range(n)) if straddlers else set())
        parts: list[InputPartition] = []
        strad_files = [(fp, False) for fp in straddlers]
        owner_assigned = False
        for b in sorted(cand):
            sf = _SideFiles(
                side.table_dir, side.phys, side.schema, side.key,
                predicates=side.predicates,
            )
            sf.files = list(by_bucket.get(b, [])) + strad_files
            if not sf.files:
                continue
            # exactly one partition owns straddlers' NULL-key rows: a
            # NULL bucket key belongs to no bucket but SQL GROUP BY
            # must surface it as the null group, exactly once
            owns = not owner_assigned
            owner_assigned = True
            parts.append(
                _AggPartition(
                    b, n, sf, list(self._group_by), list(self._aggs), owns
                )
            )
        if not parts:
            return [_AggPartition(None, 0)]
        return parts

    def read(self, partition: _AggPartition) -> Iterator:
        if partition.bucket is None:
            return
        import pyarrow as pa
        from pyspark.sql.pandas.types import to_arrow_schema

        side = partition.side
        keys = partition.group_by
        rdr = _SnapshotBatchReader(
            side.table_dir, {"files": [], "phys": side.phys}, side.schema
        )
        partial = _partial_spec(partition.aggs)
        partials = []
        for fp, tight in side.files:
            # one partial per FILE, not per batch: entity-grained
            # rollups (groups ~ rows) get no reduction from partials,
            # so each extra group_by pass is pure overhead; per-file
            # granularity keeps memory bounded by max(file rows,
            # groups-per-bucket) while cutting the pass count to the
            # file count
            batches = []
            for b in rdr.read(fp):
                if not tight:
                    b = b.filter(
                        _bucket_mask(
                            b.column(side.key), partition.n, partition.bucket,
                            keep_nulls=partition.owns_nulls,
                        )
                    )
                if b.num_rows:
                    batches.append(b)
            if not batches:
                continue
            tbl = pa.Table.from_batches(batches)
            if side.predicates:
                from reactivestreams_kinesis_spark.sources.snapshot_source import (
                    _arrow_expr,
                )

                triples = [
                    (_ARROW_OPS[op], c, v) for (c, op, v) in side.predicates
                ]
                tbl = tbl.filter(_arrow_expr(triples))
            if tbl.num_rows:
                partials.append(_partial_agg(tbl, keys, partial))
        if not partials:
            return
        final = _merge_partials(partials, keys, partial)
        yield from _finalize_agg(
            final, keys, partition.aggs, to_arrow_schema(self._schema)
        ).to_batches()


def register_bucketed_agg_source(spark: SparkSession) -> None:
    """Idempotent registration (same pattern as register_snapshot_source)."""
    spark.dataSource.register(BucketedAggDataSource)


def colocated_groupby(
    spark: SparkSession,
    table_dir: str,
    *,
    group_by: list[str],
    aggs: dict,
    where: list | None = None,
    version: int | None = None,
) -> DataFrame:
    """Zero-exchange GROUP BY over a bucket-partitioned snapshot table:
    ``group_by`` must include the bucket column (that inclusion is what
    makes per-bucket finalization exact — every group lives wholly in
    one bucket); ``aggs`` is ``{out_name: (fn, col)}`` with fn in
    count|sum|min|max|avg (col=None with count is COUNT(*)); ``where``
    takes scan-predicate triples (file-pruned, then row-exact).

    The physical plan is a bare BatchScan — the aggregation happens
    inside the scan via Arrow's vectorized group_by kernel, two-phase
    per task (per-batch partials → one merge), so task memory follows
    groups-per-bucket, not rows. The generic alternative shuffles one
    partial row per (group, upstream partition); at billion-group
    cardinalities that exchange IS the query cost — this plan deletes
    it."""
    import json

    register_bucketed_agg_source(spark)
    r = (
        spark.read.format("snapshot_bucketed_agg")
        .option("path", table_dir)
        .option("groupBy", ",".join(group_by))
        .option(
            "aggs",
            json.dumps([[n, fn, col] for n, (fn, col) in aggs.items()]),
        )
    )
    if where:
        r = r.option(
            "where",
            json.dumps(
                [[c, op, list(v) if isinstance(v, tuple) else v] for c, op, v in where]
            ),
        )
    if version is not None:
        r = r.option("version", str(version))
    return r.load()


def colocated_join_agg(
    spark: SparkSession,
    left_dir: str,
    right_dir: str,
    *,
    left_key: str,
    right_key: str | None = None,
    group_by: list[str],
    aggs: dict,
    left_columns: list[str] | None = None,
    right_columns: list[str] | None = None,
    left_where: list | None = None,
    right_where: list | None = None,
    left_version: int | None = None,
    right_version: int | None = None,
) -> DataFrame:
    """The FUSED star rollup: inner co-located join + bucket-local
    aggregation in ONE in-task pass — ``SELECT <keys>, <aggs> FROM l
    JOIN r ON l.k = r.k GROUP BY <keys>`` with ZERO exchanges end to
    end, for group keys that include the join key (per-entity rollups:
    "revenue and order count per customer with customer attributes").
    The generic plan shuffles both tables for the join and then
    shuffles one partial row per group for the aggregate; at
    entity-grained cardinality (groups ~ left rows) both exchanges move
    table-scale volume, and this plan deletes both. ``aggs`` is
    ``{out_name: (fn, col)}`` over the joined relation's columns, fn in
    count|sum|min|max|avg. Composes with per-side projections,
    predicates, and time travel; refuses non-inner joins and
    ``left_split`` (a chunked group would finalize twice)."""
    import json

    register_colocated_source(spark)
    r = (
        spark.read.format("snapshot_colocated_join")
        .option("leftPath", left_dir)
        .option("rightPath", right_dir)
        .option("leftKey", left_key)
        .option("rightKey", right_key or left_key)
        .option("joinType", "inner")
        .option("aggGroupBy", ",".join(group_by))
        .option(
            "aggSpec",
            json.dumps([[n, fn, col] for n, (fn, col) in aggs.items()]),
        )
    )
    if left_columns:
        r = r.option("leftColumns", ",".join(left_columns))
    if right_columns:
        r = r.option("rightColumns", ",".join(right_columns))
    if left_where or right_where:
        to_json = lambda ps: json.dumps(
            [[c, op, list(v) if isinstance(v, tuple) else v] for c, op, v in ps]
        )
        if left_where:
            r = r.option("leftWhere", to_json(left_where))
        if right_where:
            r = r.option("rightWhere", to_json(right_where))
    if left_version is not None:
        r = r.option("leftVersion", str(left_version))
    if right_version is not None:
        r = r.option("rightVersion", str(right_version))
    return r.load()
