"""Correlated-subquery surface via the SQL entry point.

Two things are exercised here that the DataFrame-API queries don't cover:
(1) `spark.sql` as a first-class way in (the engine's declared surface is
DataFrame AND SQL), and (2) Catalyst's subquery decorrelation — EXISTS
rewrites to a left-semi join and a correlated scalar aggregate rewrites to
an aggregated join, so the executed plans shard exactly like the explicit
join queries (no per-row re-execution of the inner query anywhere).

The SAME SQL text is the DuckDB oracle: both engines run the identical
ANSI statement, so these queries also pin dialect compatibility.
(One exception: q_waiting_suppliers keeps the SQL as its oracle but runs
the DataFrame window form on Spark — Catalyst inlines a twice-referenced
CTE into two full lineitem joins, so the shared-SQL form would double the
fact scan; see its docstring.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from elric_rs_spark.registry import query
from elric_rs_spark.tables import load_table, register_views

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


_PRIORITY_WAIT_SQL = """
SELECT o_orderpriority, count(*) AS n_orders
FROM orders o
WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
  AND o.o_orderdate <  TIMESTAMP '1996-07-01'
  AND EXISTS (
    SELECT 1 FROM lineitem l
    WHERE l.l_orderkey = o.o_orderkey
      AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
  )
GROUP BY o_orderpriority
"""


@query("q_priority_waiting", oracle=_PRIORITY_WAIT_SQL)
def q_priority_waiting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape (order priority checking): correlated EXISTS whose
    inner predicate is NON-EQUI on the correlation row (shipped more
    than 60 days after this order's own orderdate — the fixture has no
    commitdate/receiptdate, so lateness is ship-vs-order lag). Catalyst
    decorrelates to a left-semi sort-merge join on l_orderkey with the
    lag predicate as an extra join condition, then a tiny 5-group
    count. At 100 TB both sides shard on orderkey; the date filter
    prunes the orders scan before the join (PushedFilters)."""
    register_views(spark, sf_dir)
    return spark.sql(_PRIORITY_WAIT_SQL)


_SMALL_QTY_SQL = """
WITH pa AS (
  SELECT l_partkey,
         CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
         count(*) AS n
  FROM lineitem GROUP BY l_partkey
)
SELECT CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)) AS BIGINT)
         AS rev_cents,
       count(*) AS n_lines
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey AND p.p_brand = 'Brand#1'
JOIN pa ON pa.l_partkey = l.l_partkey
WHERE 2 * CAST(l.l_quantity AS BIGINT) * pa.n < pa.sum_qty
"""


@query("q_small_qty_revenue", oracle=_SMALL_QTY_SQL)
def q_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape (small-quantity-order revenue): the classic
    correlated per-part average (l_quantity < 0.5 * avg over the same
    part) written in its decorrelated form — aggregate once per
    partkey, join back. The threshold is cross-multiplied
    (2*qty*n < sum_qty) so the comparison is exact BIGINT arithmetic
    instead of an order-dependent float average; quantities are
    integral in the fixture (asserted in tests). Plan: one partial-agg
    shuffle on l_partkey for `pa`, one partkey-shuffle join back
    (bucketing co-locates both at scale), brand dimension broadcast,
    single-row final aggregate."""
    register_views(spark, sf_dir)
    return spark.sql(_SMALL_QTY_SQL)


_EXCESS_SUPPLIER_SQL = """
WITH sq AS (
  SELECT l.l_suppkey,
         CAST(sum(CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS widget_qty
  FROM lineitem l
  JOIN part p ON p.p_partkey = l.l_partkey
  WHERE p.p_name LIKE '%widget%'
    AND l.l_shipdate >= TIMESTAMP '1996-01-01'
    AND l.l_shipdate <  TIMESTAMP '1997-01-01'
  GROUP BY l.l_suppkey
)
SELECT s.s_suppkey, s.s_name, sq.widget_qty
FROM supplier s JOIN sq ON sq.l_suppkey = s.s_suppkey
WHERE sq.widget_qty > 50
"""


@query("q_excess_supplier", oracle=_EXCESS_SUPPLIER_SQL)
def q_excess_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape (potential part promotion): suppliers whose
    shipped volume of a part-name family over a year exceeds a
    threshold (the fixture has no partsupp, so availqty is replaced by
    a fixed floor). The nested-IN original decorrelates to exactly
    this: filter facts, aggregate per supplier, semi-join the supplier
    dimension. The LIKE filter and date range prune the fact scan; the
    per-supplier aggregate is map-side combined; the supplier join is
    broadcast-sized (dimension)."""
    register_views(spark, sf_dir)
    return spark.sql(_EXCESS_SUPPLIER_SQL)


_WAITING_SUPPLIER_SQL = """
WITH per_os AS (
  SELECT l.l_orderkey, l.l_suppkey,
         max(CASE WHEN l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
                  THEN 1 ELSE 0 END) AS is_late,
         sum(CASE WHEN l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
                  THEN 1 ELSE 0 END) AS n_late_lines
  FROM lineitem l
  JOIN orders o ON o.o_orderkey = l.l_orderkey AND o.o_orderstatus = 'F'
  GROUP BY l.l_orderkey, l.l_suppkey
),
per_o AS (
  SELECT l_orderkey, count(*) AS n_supp, sum(is_late) AS n_late_supp
  FROM per_os GROUP BY l_orderkey
)
SELECT s.s_suppkey, s.s_name, CAST(sum(p.n_late_lines) AS BIGINT) AS numwait
FROM per_os p
JOIN per_o po ON po.l_orderkey = p.l_orderkey
JOIN supplier s ON s.s_suppkey = p.l_suppkey
WHERE p.is_late = 1 AND po.n_supp >= 2 AND po.n_late_supp = 1
GROUP BY s.s_suppkey, s.s_name
ORDER BY numwait DESC, s_suppkey
LIMIT 10
"""


@query("q_waiting_suppliers", oracle=_WAITING_SUPPLIER_SQL)
def q_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape (suppliers who kept orders waiting): the
    hardest correlated query in the suite — EXISTS (another supplier
    contributed to the same order) AND NOT EXISTS (any OTHER supplier
    was also late) — in its scalable decorrelated form. The Spark side
    is the DataFrame window form rather than the oracle's twice-
    referenced CTE: Spark inlines CTEs, so the SQL text would scan and
    join lineitem TWICE (measured: 9 scans, one ReusedExchange); here
    the per-(order, supplier) aggregate is computed once and the
    per-order rollup (n_supp, n_late_supp) comes from window aggregates
    over it — one lineitem pass, one orderkey-window shuffle, then a
    row-local waiting filter (self late, n_supp >= 2, n_late_supp = 1).
    Lateness is ship-vs-order lag (no commitdate/receiptdate in the
    fixture); top-10 is TakeOrdered, tie-broken on s_suppkey."""
    from pyspark.sql import Window

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    ).select("o_orderkey", "o_orderdate")
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    late = F.when(
        F.col("l_shipdate") > F.expr("o_orderdate + INTERVAL 60 DAY"), 1
    ).otherwise(0)
    per_os = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("l_orderkey", "l_suppkey")
        .agg(F.max(late).alias("is_late"), F.sum(late).alias("n_late_lines"))
    )
    w = Window.partitionBy("l_orderkey")
    per = per_os.select(
        "l_orderkey",
        "l_suppkey",
        "is_late",
        "n_late_lines",
        F.count(F.lit(1)).over(w).alias("n_supp"),
        F.sum("is_late").over(w).alias("n_late_supp"),
    )
    waiting = per.filter(
        (F.col("is_late") == 1) & (F.col("n_supp") >= 2) & (F.col("n_late_supp") == 1)
    )
    return (
        waiting.join(F.broadcast(s), waiting.l_suppkey == s.s_suppkey)
        .groupBy("s_suppkey", "s_name")
        .agg(F.sum("n_late_lines").cast("long").alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_suppkey")
        .limit(10)
    )
