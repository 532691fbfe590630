"""Table-layout operators (round 4): sorted writes proved via parquet
footer min/max intervals, compaction proved via file sizes — both
verified at the STORAGE level (pyarrow footer reads), not just "the data
survived", because the scan-cost win lives entirely in the footers.
"""

from __future__ import annotations

import os

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from reactivestreams_kinesis_spark.catalog import load_table
from reactivestreams_kinesis_spark.operators.layout import (
    compact_parquet,
    sorted_write,
)


def _rowgroup_intervals(out_dir: str, col: str) -> list[tuple]:
    """(min, max) of `col` for every row group in every file."""
    spans = []
    for f in os.listdir(out_dir):
        if not f.endswith(".parquet"):
            continue
        meta = pq.ParquetFile(os.path.join(out_dir, f)).metadata
        idx = meta.schema.names.index(col)
        for rg in range(meta.num_row_groups):
            stats = meta.row_group(rg).column(idx).statistics
            spans.append((stats.min, stats.max))
    return spans


def test_sorted_write_produces_tight_rowgroups(spark, sf_dir, tmp_path):
    """Clustered layout: after sorted_write on l_shipdate, row-group
    min/max intervals must be near-disjoint slices of the key domain —
    each covering a small fraction — instead of every row group spanning
    the whole domain (the unsorted baseline, also measured here). This is
    the property parquet row-group skipping prunes on."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_shipdate", "l_extendedprice"
    )
    lo, hi = li.agg(F.min("l_shipdate"), F.max("l_shipdate")).first()
    domain = (hi - lo).total_seconds() or 1.0

    unsorted_dir = str(tmp_path / "unsorted")
    li.repartition(8).write.parquet(unsorted_dir)
    sorted_dir = str(tmp_path / "sorted")
    sorted_write(li, sorted_dir, "l_shipdate", n_files=8)

    def avg_span(d):
        spans = _rowgroup_intervals(d, "l_shipdate")
        return sum((b - a).total_seconds() for a, b in spans) / len(spans) / domain

    unsorted_frac = avg_span(unsorted_dir)
    sorted_frac = avg_span(sorted_dir)
    # hash-shuffled row groups span ~the whole domain; range+sorted ones
    # must cover a small slice (1/8 of the domain at 8 files, plus skew)
    assert unsorted_frac > 0.9
    assert sorted_frac < 0.25
    # and nothing was lost in the rewrite
    assert spark.read.parquet(sorted_dir).count() == li.count()


def test_sorted_layout_skips_rowgroups_at_scan(spark, sf_dir, tmp_path):
    """End-to-end: a range scan over the clustered layout reads fewer
    rows out of parquet than over the unsorted one (numOutputRows of the
    scan node reflects row-group pruning)."""
    li = load_table(spark, sf_dir, "lineitem").select("l_shipdate", "l_extendedprice")
    sorted_dir = str(tmp_path / "scan_sorted")
    sorted_write(li, sorted_dir, "l_shipdate", n_files=8)

    pred = "l_shipdate >= TIMESTAMP '1995-01-01' AND l_shipdate < TIMESTAMP '1995-02-01'"
    df = spark.read.parquet(sorted_dir).filter(pred)
    n = df.count()
    # correctness of the pruned read
    assert n == li.filter(pred).count()
    # storage-level proof: at least one whole file's footer interval
    # misses the month, so its row groups can't have been read
    spans = _rowgroup_intervals(sorted_dir, "l_shipdate")
    import datetime

    tz = spans[0][0].tzinfo  # stats carry the file's UTC offset
    jan = (
        datetime.datetime(1995, 1, 1, tzinfo=tz),
        datetime.datetime(1995, 2, 1, tzinfo=tz),
    )
    outside = [s for s in spans if s[1] < jan[0] or s[0] >= jan[1]]
    assert outside, "clustering failed: every row group overlaps the probe month"


def test_compact_parquet_reduces_file_count(spark, sf_dir, tmp_path):
    """Compaction: a directory of many tiny files becomes few
    near-target-size files with identical content; file count derives
    from BYTES, not input file count."""
    li = load_table(spark, sf_dir, "lineitem")
    small_dir = str(tmp_path / "small")
    li.repartition(64).write.parquet(small_dir)  # 64 tiny files
    n_small = len([f for f in os.listdir(small_dir) if f.endswith(".parquet")])
    assert n_small == 64

    out_dir = str(tmp_path / "compacted")
    total = sum(
        os.path.getsize(os.path.join(small_dir, f))
        for f in os.listdir(small_dir)
        if f.endswith(".parquet")
    )
    # target ~ half the data -> expect 2 files
    n = compact_parquet(spark, small_dir, out_dir, target_file_bytes=total // 2 + 1)
    n_out = len([f for f in os.listdir(out_dir) if f.endswith(".parquet")])
    assert n == n_out == 2
    a = spark.read.parquet(small_dir)
    b = spark.read.parquet(out_dir)
    assert a.count() == b.count()
    assert a.subtract(b).count() == 0 and b.subtract(a).count() == 0


def test_compact_with_clustering_restores_sort(spark, sf_dir, tmp_path):
    """Compaction with cluster_col re-sorts while it rewrites."""
    li = load_table(spark, sf_dir, "lineitem").select("l_shipdate", "l_orderkey")
    small_dir = str(tmp_path / "small2")
    li.repartition(32).write.parquet(small_dir)
    out_dir = str(tmp_path / "compacted2")
    compact_parquet(
        spark, small_dir, out_dir, target_file_bytes=1 << 40, cluster_col="l_shipdate"
    )
    spans = _rowgroup_intervals(out_dir, "l_shipdate")
    # single target file; its row groups must be internally ordered:
    # non-overlapping consecutive (min, max) intervals when sorted by min
    spans.sort()
    for (a_min, a_max), (b_min, b_max) in zip(spans, spans[1:]):
        assert a_max <= b_min or a_max == b_max  # tight or touching


def test_compact_parquet_rejects_in_place(spark, sf_dir, tmp_path):
    """Compacting a directory onto itself would have Spark delete the
    input mid-write; the helper rejects it before any I/O."""
    import pytest

    d = str(tmp_path / "inplace")
    load_table(spark, sf_dir, "region").write.parquet(d)
    with pytest.raises(ValueError, match="cannot write over its input"):
        compact_parquet(spark, d, d)


def _band_overlap_fractions(out_dir, col, bands):
    """Fraction of row groups a band-predicate scan must read, per band."""
    spans = _rowgroup_intervals(out_dir, col)
    return [
        sum(1 for lo, hi in spans if not (hi < b[0] or lo > b[1])) / len(spans)
        for b in bands
    ]


def test_interleaved_write_skips_on_both_dimensions(spark, sf_dir, tmp_path):
    """Z-order vs linear sort for multi-dimensional data skipping: a
    linear sort prunes its own column (~selectivity) but reads 100% of
    row groups when the filter is on the OTHER column; the interleaved
    layout must prune meaningfully on EITHER column from one layout —
    the measured sf0.1 table lives in SCALING.md (z reads ~30% on either
    single-column band vs 100% for the wrong linear layout, and beats
    both on the two-predicate box)."""
    from reactivestreams_kinesis_spark.operators.layout import interleaved_write

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_quantity"
    )
    pk_hi = li.agg(F.max("l_partkey")).collect()[0][0]
    sk_hi = li.agg(F.max("l_suppkey")).collect()[0][0]
    # 10%-selective bands at several positions, avoiding domain edges
    positions = [0.05, 0.15, 0.3, 0.6, 0.8]
    pk_bands = [(int(pk_hi * f), int(pk_hi * (f + 0.1))) for f in positions]
    sk_bands = [(int(sk_hi * f), int(sk_hi * (f + 0.1))) for f in positions]

    lin_dir = str(tmp_path / "lin_pk")
    sorted_write(li, lin_dir, "l_partkey", n_files=32)
    z_dir = str(tmp_path / "zorder")
    interleaved_write(li, z_dir, ["l_partkey", "l_suppkey"], n_files=32)

    # content identical regardless of layout
    a, b = spark.read.parquet(lin_dir), spark.read.parquet(z_dir)
    assert a.count() == b.count() and a.subtract(b).count() == 0

    mean = lambda v: sum(v) / len(v)
    # linear layout: great on its own column, useless on the other
    lin_own = mean(_band_overlap_fractions(lin_dir, "l_partkey", pk_bands))
    lin_other = mean(_band_overlap_fractions(lin_dir, "l_suppkey", sk_bands))
    assert lin_own <= 0.3
    assert lin_other >= 0.95, "linear sort should not prune the unsorted column"
    # z-order: meaningful pruning on BOTH columns from one layout
    z_pk = mean(_band_overlap_fractions(z_dir, "l_partkey", pk_bands))
    z_sk = mean(_band_overlap_fractions(z_dir, "l_suppkey", sk_bands))
    assert z_pk <= 0.6 and z_sk <= 0.6, (z_pk, z_sk)
    # mixed single-column workload: z strictly beats the linear layout
    assert (z_pk + z_sk) / 2 < (lin_own + lin_other) / 2


def _naive_morton(cells: list[int], bits: int) -> int:
    """Reference interleave (bit-at-a-time) the branchless paths must match."""
    k, out = len(cells), 0
    for b in range(bits):
        for i, c in enumerate(cells):
            out |= ((c >> b) & 1) << (b * k + i)
    return out


def test_zorder3_branchless_matches_reference(spark, sf_dir):
    """The k=3 magic-mask spread is bit-identical to the naive interleave
    at both the default 16 and the maximal 21 bits, and never reaches the
    BIGINT sign bit (21 x 3 = 63)."""
    from reactivestreams_kinesis_spark.operators.layout import zorder_expr

    li = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey", "l_suppkey", "l_quantity")
        .limit(500)
    )
    bounds = li.agg(
        *[F.min(c).alias(f"lo_{c}") for c in ("l_partkey", "l_suppkey", "l_quantity")],
        *[F.max(c).alias(f"hi_{c}") for c in ("l_partkey", "l_suppkey", "l_quantity")],
    ).first()
    cols = ["l_partkey", "l_suppkey", "l_quantity"]
    mins = {c: bounds[f"lo_{c}"] for c in cols}
    maxs = {c: bounds[f"hi_{c}"] for c in cols}

    def py_cell(v, lo, hi, bits):
        span = float(hi) - float(lo) if hi > lo else 1.0
        return min((1 << bits) - 1, int(((float(v) - float(lo)) / span) * (1 << bits)))

    for bits in (16, 21):
        rows = li.withColumn("z", zorder_expr(cols, mins, maxs, bits=bits)).collect()
        assert rows
        for r in rows:
            cells = [py_cell(r[c], mins[c], maxs[c], bits) for c in cols]
            assert r["z"] == _naive_morton(cells, bits), (bits, r)
            assert r["z"] >= 0


def test_zorder_bits_autoreduce_stays_sign_safe(spark, sf_dir):
    """4 cluster columns at the default bits=16 would interleave into bit
    63 (the sign) and invert the sort for high cells; zorder_expr must
    auto-reduce to 63 // k bits instead of emitting negative keys."""
    from reactivestreams_kinesis_spark.operators.layout import zorder_expr

    li = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber")
        .limit(500)
    )
    cols = ["l_orderkey", "l_partkey", "l_suppkey", "l_linenumber"]
    bounds = li.agg(
        *[F.min(c).alias(f"lo_{c}") for c in cols],
        *[F.max(c).alias(f"hi_{c}") for c in cols],
    ).first()
    mins = {c: bounds[f"lo_{c}"] for c in cols}
    maxs = {c: bounds[f"hi_{c}"] for c in cols}
    # force every column to its top grid cell to probe the high bits
    top = li.withColumn("z", zorder_expr(cols, mins, {c: mins[c] for c in cols}, bits=16))
    vals = [r["z"] for r in top.select("z").collect()]
    assert vals and all(v >= 0 for v in vals)
    assert max(v.bit_length() for v in vals) <= 60  # 15 bits x 4 cols


def test_interleaved_write_skips_three_dimensions(spark, sf_dir, tmp_path):
    """k=3 Z-order (the new branchless path): one layout must prune
    meaningfully on EACH of the three columns, where a linear sort prunes
    only its own; measured sf0.1 three-predicate-box numbers in
    SCALING.md."""
    from reactivestreams_kinesis_spark.operators.layout import interleaved_write

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_quantity", "l_extendedprice"
    )
    cols = ["l_partkey", "l_suppkey", "l_quantity"]
    his = li.agg(*[F.max(c).alias(c) for c in cols]).first()
    positions = [0.05, 0.3, 0.6]
    bands = {
        c: [(type(his[c])(float(his[c]) * f), type(his[c])(float(his[c]) * (f + 0.15))) for f in positions]
        for c in cols
    }

    lin_dir = str(tmp_path / "lin3")
    sorted_write(li, lin_dir, "l_partkey", n_files=32)
    z_dir = str(tmp_path / "z3")
    interleaved_write(li, z_dir, cols, n_files=32)

    a, b = spark.read.parquet(lin_dir), spark.read.parquet(z_dir)
    assert a.count() == b.count() and a.subtract(b).count() == 0

    mean = lambda v: sum(v) / len(v)
    fracs = {c: mean(_band_overlap_fractions(z_dir, c, bands[c])) for c in cols}
    # linear layout reads ~everything on the two unsorted columns
    assert mean(_band_overlap_fractions(lin_dir, "l_suppkey", bands["l_suppkey"])) >= 0.95
    # z-order prunes on every clustered dimension (k=3 dilutes per-column
    # locality vs k=2, so the bar is looser than the 2-D test's 0.6)
    for c in cols:
        assert fracs[c] <= 0.8, fracs


def test_partitioned_write_with_clustering(spark, sf_dir, tmp_path):
    """layout.partitioned_write: hive directories per partition value,
    and with cluster_col the row groups INSIDE each directory carry tight
    min/max intervals — directory pruning and row-group pruning from one
    write."""
    from reactivestreams_kinesis_spark.operators.layout import partitioned_write

    docs = load_table(spark, sf_dir, "documents")
    out = str(tmp_path / "docs_part")
    partitioned_write(docs, out, ["lang"], cluster_col="n_chars")
    langs = [r["lang"] for r in docs.select("lang").distinct().collect()]
    dirs = [d for d in os.listdir(out) if d.startswith("lang=")]
    assert sorted(dirs) == sorted(f"lang={l}" for l in langs)
    # read back with a partition filter: plan prunes at directory level
    got = spark.read.parquet(out).filter(F.col("lang") == langs[0])
    from reactivestreams_kinesis_spark.plans.inspect import explain_string

    plan = explain_string(got, "formatted")
    assert "PartitionFilters: [isnotnull(lang" in plan
    assert got.count() == docs.filter(F.col("lang") == langs[0]).count()
    # row groups within one partition dir are internally ordered on n_chars
    one = os.path.join(out, dirs[0])
    spans = sorted(_rowgroup_intervals(one, "n_chars"))
    for (_, a_max), (b_min, _) in zip(spans, spans[1:]):
        assert a_max <= b_min
