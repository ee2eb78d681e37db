"""Z-order (Morton) clustering for multi-dimensional data skipping.

Parquet row-group pruning is min/max based: sorting a table by ONE
column gives tight min/max ranges (and so real skipping) on that column
only. When queries filter on TWO independent dimensions (lang AND
source, date AND domain, cell AND label), the standard lakehouse answer
is Z-ordering: interleave the bits of the dimension keys into one Morton
code and sort by it, so every file/row-group covers a small rectangle of
the key space and BOTH dimensions get usable min/max bounds.

Spark has no native ZORDER BY (Delta/Iceberg expose it as a table
service); the interleaving is ~10 lines of built-in expressions, so this
module provides it for plain parquet: `zorder_key(cols)` builds the
Morton code (each column rank-compressed to ZBITS bits, bits
interleaved), and `write_zordered` repartitions by range on the code and
sorts within partitions — every output file then holds a contiguous
Z-range. Everything is JVM-side integer expressions in whole-stage
codegen; no UDFs.

Pinned by tests/test_scale_patterns.py::TestZOrder: after a Z-ordered
write, a filter on EITHER dimension reads a strict subset of row groups
(parquet num-row-groups-read metrics), where a single-column sort skips
on that column only.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

ZBITS = 8  # bits per dimension: 256 distinct cells per dim is plenty of
# skipping resolution; more bits = finer rectangles, longer codes


def _to_bucket(col: Column, n_bits: int = ZBITS) -> Column:
    """Rank-free bucketing of an arbitrary column into [0, 2^n_bits):
    every column is HASHED into its bucket (a true rank-compression
    needs a pass over the data). Hashing keeps the property that makes
    min/max skipping work for EQUALITY predicates — equal values share
    a bucket — but sacrifices rectangle locality for RANGE predicates
    on that dimension; rank-compress externally first if you need
    range skipping."""
    bucket = F.pmod(F.xxhash64(col), F.lit(1 << n_bits))
    return bucket.cast("long")


def zorder_key(*cols: Column, n_bits: int = ZBITS) -> Column:
    """Morton code: interleave the low `n_bits` of each column's bucket,
    column 0 taking the most significant position of each bit group."""
    buckets = [_to_bucket(c, n_bits) for c in cols]
    k = len(buckets)
    # Spark's shiftleft masks the shift count to 6 bits: a position >= 64
    # silently wraps onto low bits and corrupts the code; position 63 is
    # the sign bit, which would split the curve at the range boundary.
    if k * n_bits >= 64:
        raise ValueError(
            f"zorder_key: {k} cols x {n_bits} bits = {k * n_bits} bits "
            "does not fit a signed 64-bit code; lower n_bits"
        )
    code: Column = F.lit(0).cast("long")
    for bit in range(n_bits - 1, -1, -1):
        for i, b in enumerate(buckets):
            out_pos = bit * k + (k - 1 - i)
            code = code + F.shiftleft(
                F.shiftrightunsigned(b, bit).bitwiseAND(F.lit(1)), out_pos
            )
    return code


def write_zordered(
    df: DataFrame, path: str, cols: list[str], n_files: int = 8
) -> None:
    """Write `df` as parquet clustered by the Z-order of `cols`:
    repartitionByRange on the Morton code (contiguous Z-ranges per
    file) + sortWithinPartitions (tight row-group bounds inside each
    file). The code column itself is dropped — it is layout, not data."""
    keyed = df.withColumn("__z", zorder_key(*[F.col(c) for c in cols]))
    (
        keyed.repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )
