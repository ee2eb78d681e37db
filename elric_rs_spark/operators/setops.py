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


SKYLINE_BUCKETS = 32


def _skyline_pass(df: DataFrame, bucketed: bool) -> DataFrame:
    """One skyline pass over (p_partkey, cents, p_size): keep rows not
    dominated WITHIN the (optional) bucket. A strictly-cheaper point
    with size <= mine dominates me (RANGE frame min over cents < mine);
    a same-price point with strictly smaller size dominates me (group
    min). Equal (cents, size) duplicates dominate neither way — kept."""
    from pyspark.sql import Window

    part_cols = ["bucket"] if bucketed else []
    w_cheap = (
        Window.partitionBy(*part_cols)
        .orderBy("cents")
        .rangeBetween(Window.unboundedPreceding, -1)
    )
    w_grp = Window.partitionBy(*part_cols, "cents")
    return (
        df.withColumn("min_cheap", F.min("p_size").over(w_cheap))
        .withColumn("min_grp", F.min("p_size").over(w_grp))
        .filter(
            (F.col("min_cheap").isNull() | (F.col("p_size") < F.col("min_cheap")))
            & (F.col("p_size") == F.col("min_grp"))
        )
        .drop("min_cheap", "min_grp")
    )


@query(
    "q_skyline",
    oracle="""
WITH pts AS (
  SELECT p_partkey,
         CAST(round(p_retailprice * 100) AS BIGINT) AS cents,
         p_size
  FROM part
)
SELECT p.p_partkey, p.cents, CAST(p.p_size AS INTEGER) AS p_size
FROM pts p
WHERE NOT EXISTS (
  SELECT 1 FROM pts q
  WHERE q.cents <= p.cents AND q.p_size <= p.p_size
    AND (q.cents < p.cents OR q.p_size < p.p_size)
)
""",
)
def q_skyline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-D skyline / Pareto frontier (Börzsönyi et al. 2001, ICDE —
    public method): the parts no other part dominates on
    (retail price, size), both minimized — the multi-criteria
    shortlist shape ("no cheaper-and-smaller alternative exists").
    Exact-cents prices so dominance never touches a float.

    Scale shape — skyline-of-skylines, NOT the O(n²) pairwise test the
    oracle runs: phase 1 computes a local skyline inside each of 32
    hash buckets (keyed windows: a sort per bucket; any globally
    non-dominated point is also locally non-dominated, so the union of
    local skylines is a correct candidate superset); phase 2 re-runs
    the identical pass globally over ONLY the candidates (bounded by
    buckets x per-bucket frontier size — the one unpartitioned window
    runs on that small set by construction, same stance as
    q_pack_shards' offset table). The strictly-cheaper dominance probe
    is a RANGE frame over integer cents, never a self-join.

    Worst-case caveat (ADVICE r04): "small by construction" assumes a
    benign distribution. On ANTI-CORRELATED data (price strictly
    decreasing in size) every point is its bucket's local frontier, so
    phase 2's single partition degrades to O(n) rows through one
    window — correct, but the driver-side sort becomes the bottleneck.
    The at-scale escape is to RECURSE: re-bucket the candidate set and
    repeat phase 1 until the survivor count fits one partition (each
    round shrinks benign data geometrically; truly anti-correlated
    data is irreducible — its skyline IS O(n), and no algorithm
    returns less than its output)."""
    p = load_table(spark, sf_dir, "part")
    pts = p.select(
        "p_partkey",
        F.round(F.col("p_retailprice") * 100).cast("long").alias("cents"),
        "p_size",
    )
    local = _skyline_pass(
        pts.withColumn("bucket", F.col("p_partkey") % SKYLINE_BUCKETS),
        bucketed=True,
    ).drop("bucket")
    return _skyline_pass(local, bucketed=False).select(
        "p_partkey", "cents", "p_size"
    )


# --- sharded top-k with error certificates (TPUT shape) ----------------
#
# TakeOrdered answers top-k when rows are cheap to rank locally; when
# the RANKING METRIC itself is a per-key aggregate over a sharded store
# (total spend per customer across 1000 shards), the naive plan
# shuffles every key's partials. The threshold algorithm (TPUT /
# Fagin's TA family) ships only each shard's local top-M plus the M-th
# value as a threshold certificate: a key's true total is bounded below
# by the partials that DID ship and above by adding each missing
# shard's threshold. The output carries the proof — `proven = 1` rows
# are guaranteed top-K regardless of what the unshipped tail contains.
TOPK_SHARDS = 8
TOPK_M = 50  # per-shard candidates shipped
TOPK_K = 10


@query(
    "q_topk_sharded",
    oracle=f"""
WITH partials AS (
  SELECT o_orderkey % {TOPK_SHARDS} AS shard, o_custkey AS cust,
         CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
           AS partial
  FROM orders GROUP BY 1, 2
),
ranked AS (
  SELECT shard, cust, partial,
         row_number() OVER (PARTITION BY shard
                            ORDER BY partial DESC, cust) AS rn,
         count(*) OVER (PARTITION BY shard) AS n_in_shard
  FROM partials
),
retained AS (SELECT * FROM ranked WHERE rn <= {TOPK_M}),
thr AS (
  SELECT shard,
         CASE WHEN max(n_in_shard) > {TOPK_M}
              THEN min(partial) ELSE 0 END AS t_eff
  FROM retained GROUP BY shard
),
tot AS (SELECT CAST(sum(t_eff) AS BIGINT) AS total_thr FROM thr),
cand AS (
  SELECT r.cust,
         CAST(sum(r.partial) AS BIGINT) AS lo_cents,
         CAST(sum(t.t_eff) AS BIGINT) AS seen_thr,
         CAST(count(*) AS BIGINT) AS n_shards_seen
  FROM retained r JOIN thr t ON r.shard = t.shard
  GROUP BY r.cust
),
bounded AS (
  SELECT c.cust, c.lo_cents,
         c.lo_cents + x.total_thr - c.seen_thr AS hi_cents,
         c.n_shards_seen,
         row_number() OVER (ORDER BY c.lo_cents DESC, c.cust) AS rnk,
         x.total_thr
  FROM cand c CROSS JOIN tot x
),
cut AS (
  SELECT greatest(coalesce(max(CASE WHEN rnk > {TOPK_K} THEN hi_cents END),
                           0),
                  max(total_thr)) AS max_other
  FROM bounded
)
SELECT b.rnk, b.cust, b.lo_cents, b.hi_cents, b.n_shards_seen,
       CASE WHEN b.lo_cents >= m.max_other THEN 1 ELSE 0 END AS proven
FROM bounded b CROSS JOIN cut m
WHERE b.rnk <= {TOPK_K}
ORDER BY b.rnk
""",
)
def q_topk_sharded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed top-{TOPK_K} customers by total spend from
    {TOPK_SHARDS} row-sharded partials, TPUT-style: each shard ships
    its local top-{TOPK_M} (partial, key) rows plus its {TOPK_M}-th
    value as a threshold certificate; the combiner bounds every
    candidate's true total from those alone. `lo_cents` <= truth <=
    `hi_cents`; `proven = 1` means the row's lower bound beats every
    other candidate's (and every unseen key's) upper bound — a
    correctness certificate computed WITHOUT ever shuffling the full
    per-key aggregate.

    Scale shape: the per-(shard, key) partial aggregate is map-side
    combinable; the per-shard top-M windows ship M rows per shard, so
    the combiner input is S x M rows regardless of key cardinality —
    at 1000 shards that is 50k rows where the naive plan exchanges
    every customer. A shard with fewer than M keys retains them all
    and contributes threshold 0 (its absence is exact, not bounded).
    All arithmetic exact BIGINT cents; unique-key tiebreaks everywhere.

    Honest-certificate note: the fixture's spend distribution is
    UNIFORM (customer totals sit within one order-magnitude of the
    per-shard M-th threshold), so at this M every row reports
    proven = 0 — the correct TPUT answer for flat data, and exactly
    the signal a consumer uses to raise M or fall back to the exact
    per-key aggregate. On Zipf-skewed metrics (term frequencies, URL
    hits — the production heavy-hitter case) the head keys' lower
    bounds clear the thresholds and the certificate fires; the bounds
    themselves are valid for ANY distribution, which is what the
    property test pins (exact total inside [lo, hi] for every row).
    """
    o = load_table(spark, sf_dir, "orders")
    from pyspark.sql import Window

    partials = (
        o.select(
            (F.col("o_orderkey") % TOPK_SHARDS).alias("shard"),
            F.col("o_custkey").alias("cust"),
            F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
        )
        .groupBy("shard", "cust")
        .agg(F.sum("cents").alias("partial"))
    )
    ws = Window.partitionBy("shard")
    ranked = partials.select(
        "shard",
        "cust",
        "partial",
        F.row_number()
        .over(ws.orderBy(F.col("partial").desc(), "cust"))
        .alias("rn"),
        F.count(F.lit(1)).over(ws).alias("n_in_shard"),
    )
    retained = ranked.filter(F.col("rn") <= TOPK_M)
    thr = retained.groupBy("shard").agg(
        F.when(F.max("n_in_shard") > TOPK_M, F.min("partial"))
        .otherwise(F.lit(0))
        .alias("t_eff")
    )
    tot = thr.agg(F.sum("t_eff").alias("total_thr"))
    cand = (
        retained.join(F.broadcast(thr), "shard")
        .groupBy("cust")
        .agg(
            F.sum("partial").alias("lo_cents"),
            F.sum("t_eff").alias("seen_thr"),
            F.count(F.lit(1)).alias("n_shards_seen"),
        )
    )
    bounded = (
        cand.crossJoin(F.broadcast(tot))
        .withColumn(
            "hi_cents", F.col("lo_cents") + F.col("total_thr") - F.col("seen_thr")
        )
        .withColumn(
            "rnk",
            F.row_number().over(
                Window.orderBy(F.col("lo_cents").desc(), "cust")
            ),
        )
    )
    cut = bounded.agg(
        F.greatest(
            F.coalesce(
                F.max(F.when(F.col("rnk") > TOPK_K, F.col("hi_cents"))),
                F.lit(0),
            ),
            F.max("total_thr"),
        ).alias("max_other")
    )
    return (
        bounded.filter(F.col("rnk") <= TOPK_K)
        .crossJoin(F.broadcast(cut))
        .select(
            "rnk",
            "cust",
            "lo_cents",
            "hi_cents",
            "n_shards_seen",
            F.when(F.col("lo_cents") >= F.col("max_other"), 1)
            .otherwise(0)
            .alias("proven"),
        )
        .orderBy("rnk")
    )
