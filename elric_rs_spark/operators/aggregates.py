"""Hash aggregates (SURVEY.md X5-X7, T4).

All pure `groupBy().agg()` built-ins: Catalyst plans partial (map-side)
aggregation before the shuffle, so at 100 TB the shuffle carries one row
per (partition, group), not per input row. No UDFs in this path — the whole
pipeline stays inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from elric_rs_spark.registry import query
from elric_rs_spark.tables import load_table


@query(
    "q_agg_tpch1",
    oracle="""
SELECT
  l_returnflag,
  l_linestatus,
  round(sum(l_quantity), 2) AS sum_qty,
  round(sum(l_extendedprice), 2) AS sum_base_price,
  round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
  round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
  round(avg(l_quantity), 6) AS avg_qty,
  round(avg(l_extendedprice), 6) AS avg_price,
  round(avg(l_discount), 6) AS avg_disc,
  count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
""",
)
def q_agg_tpch1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: the flagship multi-aggregate hash aggregation.

    Scale: filter + 9 aggregates over 2 low-cardinality keys -> partial agg
    reduces ~everything map-side; shuffle is a handful of rows.
    """
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(charge), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 6).alias("avg_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@query(
    "q_groupby_count",
    oracle="""
SELECT event_type, count(*) AS n_events, count(DISTINCT user_id) AS n_users
FROM events
GROUP BY event_type
""",
)
def q_groupby_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split-by-table grouping semantics (ref loader.rs:231-247): the
    reference partitions a change-set by target table name; relationally
    that is a groupBy on the routing key."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
    )


@query(
    "q_agg_rollup",
    oracle="""
SELECT
  l_returnflag,
  l_linestatus,
  round(sum(l_quantity), 2) AS sum_qty,
  count(*) AS n_rows
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
""",
)
def q_agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rollup aggregation (X6): grand total + per-flag subtotals + leaves."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        F.count(F.lit(1)).alias("n_rows"),
    )


@query(
    "q_agg_cube",
    oracle="""
SELECT
  o_orderstatus,
  o_orderpriority,
  round(sum(o_totalprice), 2) AS sum_price,
  count(*) AS n_orders
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
""",
)
def q_agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cube aggregation (X6): all grouping-set combinations."""
    o = load_table(spark, sf_dir, "orders")
    return o.cube("o_orderstatus", "o_orderpriority").agg(
        F.round(F.sum("o_totalprice"), 2).alias("sum_price"),
        F.count(F.lit(1)).alias("n_orders"),
    )


@query("q_agg_approx")  # rows-only: HLL sketch differs from DuckDB's estimator
def q_agg_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct (X7): HyperLogLog++ sketch. At 100 TB this is
    the only sane way to count distincts — mergeable fixed-size sketch, no
    exact-distinct shuffle explosion."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_orderkey", 0.01).alias("approx_orders"),
        F.approx_count_distinct("l_partkey", 0.01).alias("approx_parts"),
    )


@query(
    "q_agg_stats",
    oracle="""
SELECT
  event_type,
  round(avg(value), 6) AS avg_value,
  round(stddev_samp(value), 6) AS std_value,
  round(min(value), 2) AS min_value,
  round(max(value), 2) AS max_value,
  round(percentile_cont(0.5) WITHIN GROUP (ORDER BY value), 6) AS median_value
FROM events
GROUP BY event_type
""",
)
def q_agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregates incl. exact median (percentile)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.round(F.avg("value"), 6).alias("avg_value"),
        F.round(F.stddev_samp("value"), 6).alias("std_value"),
        F.round(F.min("value"), 2).alias("min_value"),
        F.round(F.max("value"), 2).alias("max_value"),
        F.round(F.percentile("value", F.lit(0.5)), 6).alias("median_value"),
    )
