"""Table-layout maintenance: sorted writes for data skipping, and
small-file compaction.

At 100 TB the scan is the dominant cost, and the two levers that cut it
without touching a query are both WRITE-side:

- **Sorted (clustered) writes**: parquet stores per-row-group min/max for
  every column; a scan with a range predicate skips every row group whose
  interval misses it. That only works if the writer clustered rows so the
  intervals are NARROW — `repartitionByRange` + `sortWithinPartitions` on
  the filter column makes each row group cover a tiny slice of the key
  domain instead of all of it. (Spark's scan does this skipping natively;
  the win is entirely in the layout.)
- **Compaction**: streaming ingestion and fine-grained partitioning leave
  thousands of KB-sized files; every one costs a task, a footer read, and
  a name-node/list call. Compaction rewrites a directory to files sized
  near the scan's split size (`spark.sql.files.maxPartitionBytes`) so task
  count tracks BYTES, not file count.

Both are plain DataFrame writes — no new execution machinery — which is
the point: layout is a property of how you WRITE, enforced here and
verified by reading parquet footers in the tests.
"""

from __future__ import annotations

import math
import os

from pyspark.sql import DataFrame


def sorted_write(
    df: DataFrame,
    out_dir: str,
    cluster_col: str,
    *,
    n_files: int | None = None,
) -> str:
    """Write ``df`` clustered on ``cluster_col``: range-partition so each
    output file owns a contiguous key slice, then sort within partitions
    so every parquet row group's min/max interval is tight. A later scan
    filtering on ``cluster_col`` prunes at three levels — directory
    (if also partitioned), file (footer min/max), row group — all from
    this one write-side decision. ``n_files`` defaults to the current
    shuffle parallelism."""
    writer = df
    if n_files is not None:
        writer = writer.repartitionByRange(n_files, cluster_col)
    else:
        writer = writer.repartitionByRange(cluster_col)
    writer.sortWithinPartitions(cluster_col).write.mode("overwrite").parquet(out_dir)
    return out_dir


def compact_parquet(
    spark,
    in_dir: str,
    out_dir: str,
    *,
    target_file_bytes: int = 128 * 1024 * 1024,
    cluster_col: str | None = None,
) -> int:
    """Rewrite a parquet directory into files sized near
    ``target_file_bytes`` (default = the scan split size, so one task per
    file on read). File count is computed from the directory's actual
    bytes — never from file count, which is exactly the number compaction
    exists to fix. With ``cluster_col`` the rewrite also restores
    clustering (compaction is the natural moment to re-sort). Returns the
    number of files written.

    ``in_dir``/``out_dir`` must be LOCAL filesystem paths: the byte-size
    walk uses ``os.walk`` (object-store URIs would need the Hadoop
    FileSystem API instead), and compaction must never write over the
    directory it is reading — Spark fails mid-write on that, after
    having deleted output, so it is rejected up front."""
    if os.path.abspath(in_dir) == os.path.abspath(out_dir):
        raise ValueError(
            f"compact_parquet cannot write over its input: {in_dir!r} — "
            "compact into a sibling directory, then swap"
        )
    total = sum(
        os.path.getsize(os.path.join(root, f))
        for root, _, files in os.walk(in_dir)
        for f in files
        if f.endswith(".parquet")
    )
    n_files = max(1, math.ceil(total / target_file_bytes))
    df = spark.read.parquet(in_dir)
    if cluster_col is not None:
        sorted_write(df, out_dir, cluster_col, n_files=n_files)
    else:
        df.repartition(n_files).write.mode("overwrite").parquet(out_dir)
    return n_files
