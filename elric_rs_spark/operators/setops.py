"""Sort+limit (top-k, SURVEY.md X10 / S7) and set operations (X11).

Top-k in Spark is `orderBy().limit(k)` — physically a TakeOrderedAndProject
that keeps only k rows per partition before the single-stage merge, so it
never materializes a global sort at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from elric_rs_spark.registry import query
from elric_rs_spark.tables import load_table


@query(
    "q_topk",
    oracle="""
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 10
""",
)
def q_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k (X10): 10 most expensive orders, unique-key tiebreak."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(10)
    )


@query(
    "q_setops",
    oracle="""
SELECT 'no_orders' AS tag, c_custkey AS custkey FROM (
  SELECT c_custkey FROM customer
  EXCEPT
  SELECT o_custkey FROM orders
)
UNION ALL
SELECT 'both_status' AS tag, custkey FROM (
  SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
  INTERSECT
  SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O'
)
""",
)
def q_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set operations (X11): EXCEPT + INTERSECT branches unioned with tags.
    Spark's except/intersect are the SQL DISTINCT variants, matching the
    oracle's EXCEPT/INTERSECT."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    no_orders = (
        c.select(F.col("c_custkey").alias("custkey"))
        .exceptAll(o.select(F.col("o_custkey").alias("custkey")))
        .distinct()
        .select(F.lit("no_orders").alias("tag"), "custkey")
    )
    both_status = (
        o.filter(F.col("o_orderstatus") == "F")
        .select(F.col("o_custkey").alias("custkey"))
        .intersect(o.filter(F.col("o_orderstatus") == "O").select(F.col("o_custkey").alias("custkey")))
        .select(F.lit("both_status").alias("tag"), "custkey")
    )
    return no_orders.union(both_status)


@query(
    "q_distinct",
    oracle="""
SELECT DISTINCT o_orderstatus, o_orderpriority
FROM orders
""",
)
def q_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DISTINCT projection — a hash aggregate with no aggregates."""
    o = load_table(spark, sf_dir, "orders")
    return o.select("o_orderstatus", "o_orderpriority").distinct()
