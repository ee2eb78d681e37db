"""Vector (embedding) expression library — cosine/dot/norm over
array<double> columns with built-in higher-order functions.

Scale note: HOF lambdas evaluate interpreted (outside whole-stage
codegen). At 64 dims that costs microseconds per row and avoids any
Python boundary, which is the right trade; for 1k+-dim embeddings at
full cluster scale, swap `dot` for a vectorized Pandas-UDF (numpy
matmul over Arrow batches) — the call sites keep the same shape.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def as_double(col) -> Column:
    return F.transform(col, lambda x: x.cast("double"))


def dot(a, b) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda s, v: s + v
    )


def norm_l2(a) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda s, v: s + v * v))


def cosine(a, b) -> Column:
    return dot(a, b) / (norm_l2(a) * norm_l2(b))
