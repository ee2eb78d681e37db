"""Query registry.

Every operator exposes itself as a named query `(spark, sf_dir) -> DataFrame`
plus (when SQL-expressible) a DuckDB oracle SQL string over the same parquet
tables. The driver's correctness gate runs both sides at sf0.01 and compares
row-count + schema + order-insensitive value hash, so:

- alias every computed column identically in Spark and SQL;
- round floating aggregates the same way on both sides (sum -> 2dp,
  avg/ratio -> 6dp) so ULP-level differences from summation order can't
  flip the hash;
- break ranking ties on a unique key so top-k membership is deterministic.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a query; `oracle=None` marks it rows-only (non-SQL-expressible)."""

    def deco(fn: QueryFn) -> QueryFn:
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle.strip()
        return fn

    return deco


def load_all() -> None:
    """Import every operator module so registrations run."""
    from elric_rs_spark.operators import (  # noqa: F401
        aggregates,
        catalog,
        cursor,
        dedup,
        joins,
        maps,
        multimodal,
        scalars,
        setops,
        similarity,
        streaming_batch,
        text,
        typed_cast,
        windows,
    )
