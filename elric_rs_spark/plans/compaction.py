"""Small-file compaction — the table-maintenance pass every long-lived
100 TB parquet table needs (streaming sinks and fine-grained ingest leave
thousands of KB-sized files; scan planning, footer reads, and shuffle
fan-in all degrade with file count).

`compact` rewrites a parquet directory into ~target-sized files, optionally
range-clustered on a sort column so the rewritten layout ALSO gains
min/max skipping on that column (the cheap sibling of the Z-order write in
plans/zorder.py — one dimension instead of two, but file-count-driven).

Sizing uses the source's on-disk bytes (local filesystem walk here; on a
cluster the same numbers come from the FileSystem listing the scan already
performs). Row-group-level rewrite is parquet-internal and out of scope —
file-level repacking is what Spark controls and what fixes the planner.
"""

from __future__ import annotations

import math
import os

from pyspark.sql import DataFrame, SparkSession


def dir_parquet_bytes(path: str) -> int:
    """Total bytes of *.parquet files under `path`, recursively — a
    Hive-partitioned table (partitionBy output) keeps its files in
    key=value subdirectories, so a flat listdir would report 0 bytes
    and silently collapse the whole table to one file."""
    total = 0
    n_files = 0
    for root, _dirs, names in os.walk(path):
        for name in names:
            if name.endswith(".parquet"):
                total += os.path.getsize(os.path.join(root, name))
                n_files += 1
    if n_files == 0:
        raise FileNotFoundError(f"no *.parquet files under {path!r}")
    return total


def compact(
    spark: SparkSession,
    src_dir: str,
    out_dir: str,
    target_bytes: int = 128 * 1024 * 1024,
    sort_col: str | None = None,
) -> int:
    """Rewrite `src_dir` into ceil(source_bytes / target_bytes) files at
    `out_dir`. With `sort_col`, files are range-partitioned and sorted on
    it (disjoint min/max ranges -> per-file skipping on that column);
    without, a plain round-robin repartition balances file sizes.
    Returns the file count written."""
    df: DataFrame = spark.read.parquet(src_dir)
    n_files = max(1, math.ceil(dir_parquet_bytes(src_dir) / target_bytes))
    if sort_col is not None:
        out = df.repartitionByRange(n_files, sort_col).sortWithinPartitions(
            sort_col
        )
    else:
        out = df.repartition(n_files)
    out.write.mode("overwrite").parquet(out_dir)
    return sum(
        1
        for root, _dirs, names in os.walk(out_dir)
        for n in names
        if n.endswith(".parquet")
    )
