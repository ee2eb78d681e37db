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


_BIG_ORDERS_SQL = """
SELECT c.c_name, o.o_orderkey,
       CAST(round(o.o_totalprice * 100) AS BIGINT) AS total_cents,
       CAST(sum(l.l_quantity) AS BIGINT) AS sum_qty
FROM customer c
JOIN orders o ON o.o_custkey = c.c_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE o.o_orderkey IN (
  SELECT l_orderkey FROM lineitem
  GROUP BY l_orderkey
  HAVING sum(l_quantity) > 250
)
GROUP BY c.c_name, o.o_orderkey, o.o_totalprice
"""


@query("q_subquery_bigorders", oracle=_BIG_ORDERS_SQL)
def q_subquery_bigorders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape (large-volume orders): an IN subquery over a
    grouped HAVING, joined back through customer. Catalyst plans the IN
    as a left-semi join against the pre-aggregated order list — the fact
    table is aggregated down BEFORE the three-way join, so at 100 TB the
    heavy join inputs are order-grain, not lineitem-grain. Quantities
    are integral doubles; their sums are exact and cast to BIGINT for a
    representation-stable compare."""
    register_views(spark, sf_dir)
    return spark.sql(_BIG_ORDERS_SQL)


_IDLE_RICH_SQL = """
SELECT c.c_nationkey % 7 AS cohort,
       CAST(count(*) AS BIGINT) AS n_custs,
       CAST(sum(CAST(round(c.c_acctbal * 100) AS BIGINT)) AS BIGINT)
         AS acctbal_cents
FROM customer c
WHERE c.c_acctbal > (
    SELECT avg(c2.c_acctbal) FROM customer c2 WHERE c2.c_acctbal > 0
  )
  AND NOT EXISTS (
    SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
  )
GROUP BY c.c_nationkey % 7
"""


@query("q_subquery_idlerich", oracle=_IDLE_RICH_SQL)
def q_subquery_idlerich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape (global-customer potential): an UNCORRELATED
    scalar subquery (broadcast as a literal after one aggregate pass),
    an anti join against orders, and a derived-key rollup. The scalar
    avg compares raw doubles on both engines — identical inputs, one
    avg, same IEEE result — while the SUMMED money column goes through
    integer cents. Anti join + scalar broadcast both shard: no per-row
    subquery execution anywhere in the plan."""
    register_views(spark, sf_dir)
    return spark.sql(_IDLE_RICH_SQL)


_LATERAL_SQL = """
SELECT c.c_custkey, t.o_orderkey, t.cents
FROM customer c,
LATERAL (
  SELECT o.o_orderkey, CAST(round(o.o_totalprice * 100) AS BIGINT) AS cents
  FROM orders o
  WHERE o.o_custkey = c.c_custkey
  ORDER BY o.o_totalprice DESC, o.o_orderkey
  LIMIT 2
) t
WHERE c.c_custkey < 300
"""


@query("q_subquery_lateral", oracle=_LATERAL_SQL)
def q_subquery_lateral(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL derived table with ORDER BY + LIMIT (the
    top-N-per-row join SQL:99 shape). Catalyst decorrelates the
    per-customer top-2 into a window/rank over ONE join — no per-row
    inner-query execution — which is exactly the rewrite a user would
    otherwise hand-write with row_number. Identical ANSI text runs on
    DuckDB as the oracle, pinning dialect compatibility for LATERAL."""
    register_views(spark, sf_dir)
    return spark.sql(_LATERAL_SQL)
