"""Correlated-subquery surface via the SQL entry point.

Two things are exercised here that the DataFrame-API queries don't cover:
(1) `spark.sql` as a first-class way in (the engine's declared surface is
DataFrame AND SQL), and (2) Catalyst's subquery decorrelation — EXISTS
rewrites to a left-semi join and a correlated scalar aggregate rewrites to
an aggregated join, so the executed plans shard exactly like the explicit
join queries (no per-row re-execution of the inner query anywhere).

The SAME SQL text is the DuckDB oracle: both engines run the identical
ANSI statement, so these queries also pin dialect compatibility.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from elric_rs_spark.registry import query
from elric_rs_spark.tables import register_views

_EXISTS_SQL = """
SELECT c_custkey, c_name
FROM customer c
WHERE EXISTS (
  SELECT 1 FROM orders o
  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 450000
)
"""

_SCALAR_SQL = """
SELECT o_orderkey, o_custkey
FROM orders o
WHERE o_totalprice > 2 * (
  SELECT avg(o2.o_totalprice) FROM orders o2
  WHERE o2.o_custkey = o.o_custkey
)
"""

_NOT_EXISTS_SQL = """
SELECT c_custkey, c_mktsegment
FROM customer c
WHERE NOT EXISTS (
  SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
)
"""


@query("q_subquery_exists", oracle=_EXISTS_SQL)
def q_subquery_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS — decorrelated by Catalyst into a left-semi join
    on o_custkey with the o_totalprice predicate pushed below it."""
    register_views(spark, sf_dir)
    return spark.sql(_EXISTS_SQL)


@query("q_subquery_not_exists", oracle=_NOT_EXISTS_SQL)
def q_subquery_not_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated NOT EXISTS — the left-anti join form."""
    register_views(spark, sf_dir)
    return spark.sql(_NOT_EXISTS_SQL)


@query("q_subquery_scalar", oracle=_SCALAR_SQL)
def q_subquery_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar aggregate (orders above 2x their customer's
    average) — decorrelated into one per-customer aggregate joined back,
    never a per-row inner query."""
    register_views(spark, sf_dir)
    return spark.sql(_SCALAR_SQL)
