"""Skew-mitigation join helpers (the 100 TB salting pattern).

AQE's skew-join splitting (on in session.py) handles most skew at
runtime; explicit salting is the declarative fallback for the pathological
case — one hot key dominating a shuffle — and for engines/plans where AQE
can't split (e.g. aggregations over a hot group key).

`salted_join`: replicate the small side SALT times, scatter the large
side's hot rows across salt buckets, join on (key, salt). The shuffle key
becomes (key, salt) — the hot key's rows spread over SALT reducers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    large: DataFrame,
    small: DataFrame,
    key: str,
    how: str = "inner",
    salt: int = 16,
) -> DataFrame:
    """Join `large` ⋈ `small` on `key` with an explicit salt of width
    `salt`. The small side is replicated `salt` times (explode of a
    literal range — cheap when the small side is dimension-sized); the
    large side gets a uniform pseudo-random salt derived from its own row
    hash (deterministic, no RNG state). Result columns = the plain join's
    columns; the salt column never leaks."""
    salted_small = small.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    salted_large = large.withColumn(
        "__salt", F.pmod(F.xxhash64(*large.columns), F.lit(salt)).cast("int")
    )
    return salted_large.join(salted_small, [key, "__salt"], how).drop("__salt")
