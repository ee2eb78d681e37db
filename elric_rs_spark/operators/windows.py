"""Window functions (SURVEY.md X8-X9) and time windows (X13-X14).

Window functions shuffle once on the partition key, then sort within
partitions; at scale the partition key (customer, user) must be
high-cardinality — these are. Time windows are expressed with the built-in
`window()` / `session_window()` generators, identical in batch and
Structured Streaming, so the same code serves `q_stream_window` batch
oracles and the live streaming path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from elric_rs_spark.registry import query
from elric_rs_spark.tables import load_table


@query(
    "q_window_rank",
    oracle="""
SELECT * FROM (
  SELECT
    o_custkey,
    o_orderkey,
    o_totalprice,
    row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn,
    rank()       OVER (PARTITION BY o_custkey ORDER BY o_orderstatus) AS status_rank,
    dense_rank() OVER (PARTITION BY o_custkey ORDER BY o_orderpriority) AS prio_drank
  FROM orders
) t WHERE rn <= 3
""",
)
def q_window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking windows (X8): top-3 orders per customer by price.
    row_number's ORDER BY carries a unique tiebreaker (o_orderkey) so the
    result is deterministic across engines."""
    o = load_table(spark, sf_dir, "orders")
    by_price = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    by_status = Window.partitionBy("o_custkey").orderBy("o_orderstatus")
    by_prio = Window.partitionBy("o_custkey").orderBy("o_orderpriority")
    return (
        o.select(
            "o_custkey",
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(by_price).alias("rn"),
            F.rank().over(by_status).alias("status_rank"),
            F.dense_rank().over(by_prio).alias("prio_drank"),
        )
        .filter(F.col("rn") <= 3)
    )


@query(
    "q_window_frame",
    oracle="""
SELECT
  o_custkey,
  o_orderkey,
  round(sum(o_totalprice) OVER (
    PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_total,
  round(lag(o_totalprice, 1) OVER (
    PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey), 2) AS prev_price,
  round(lead(o_totalprice, 1) OVER (
    PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey), 2) AS next_price,
  round(avg(o_totalprice) OVER (
    PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
    ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 6) AS moving_avg3
FROM orders
""",
)
def q_window_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Analytic frames (X9): running total, lag/lead, moving average."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    mov = w.rowsBetween(-2, Window.currentRow)
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.sum("o_totalprice").over(run), 2).alias("running_total"),
        F.round(F.lag("o_totalprice", 1).over(w), 2).alias("prev_price"),
        F.round(F.lead("o_totalprice", 1).over(w), 2).alias("next_price"),
        F.round(F.avg("o_totalprice").over(mov), 6).alias("moving_avg3"),
    )


@query(
    "q_stream_window",
    oracle="""
SELECT
  date_trunc('hour', ts) AS window_start,
  date_trunc('hour', ts) + INTERVAL 1 HOUR AS window_end,
  event_type,
  count(*) AS n_events,
  round(sum(value), 2) AS sum_value
FROM events
GROUP BY 1, 2, 3
""",
)
def q_stream_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling event-time window (X13) via the built-in `window()`
    generator — the exact expression used with `withWatermark` in the
    streaming path (see elric_rs_spark/streaming), run here in batch so the
    oracle can check it."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


@query(
    "q_window_sliding",
    oracle="""
SELECT
  make_timestamp(CAST(((floor(epoch(ts) / 300) - off) * 300) AS BIGINT) * 1000000) AS window_start,
  count(*) AS n_events,
  round(sum(value), 2) AS sum_value
FROM events
CROSS JOIN (VALUES (0), (1)) AS offsets(off)
GROUP BY 1
""",
)
def q_window_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding window (X13): 10-minute windows sliding every 5 minutes.
    Each event lands in exactly two windows; the oracle reproduces that by
    exploding each row into its two window starts."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "10 minutes", "5 minutes").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "n_events",
            "sum_value",
        )
    )


@query(
    "q_session_window",
    oracle="""
WITH flagged AS (
  SELECT
    user_id, ts, value, event_id,
    CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
              >= INTERVAL 30 MINUTE
         OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
         THEN 1 ELSE 0 END AS is_new
  FROM events
),
sessions AS (
  SELECT user_id, ts, value, event_id,
         sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess_id
  FROM flagged
)
SELECT
  user_id,
  min(ts) AS session_start,
  max(ts) + INTERVAL 30 MINUTE AS session_end,
  count(*) AS n_events,
  round(sum(value), 2) AS sum_value
FROM sessions
GROUP BY user_id, sess_id
""",
)
def q_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session window (X14): 30-minute-gap sessions per user via the
    built-in `session_window()`. The oracle is the classic gaps-and-islands
    rewrite; Spark's session end = last event + gap, reproduced there."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id", F.session_window("ts", "30 minutes").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "sum_value",
        )
    )


@query(
    "q_window_dist",
    oracle="""
SELECT o_orderkey, o_custkey,
       ntile(4) OVER w AS quartile,
       round(percent_rank() OVER w, 6) AS pct_rank,
       round(cume_dist() OVER w, 6) AS cume
FROM orders
WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey)
""",
)
def q_window_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution window functions (X8 extension): ntile quartiles,
    percent_rank, cume_dist over per-priority price order — the
    percentile-bucketing shape behind score normalization and outlier
    capping. Ties broken on the unique key so every engine computes the
    identical permutation; one window sort keyed by the partition
    column, the same shuffle class as q_window_rank."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy("o_totalprice", "o_orderkey")
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.ntile(4).over(w).alias("quartile"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
    )


@query(
    "q_window_nth",
    oracle="""
SELECT o_orderkey, o_custkey,
       CAST(round(first_value(o_totalprice) OVER w * 100) AS BIGINT)
         AS first_cents,
       CAST(round(nth_value(o_totalprice, 2) OVER w * 100) AS BIGINT)
         AS second_cents,
       CAST(round(last_value(o_totalprice) OVER w * 100) AS BIGINT)
         AS last_cents
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
""",
)
def q_window_nth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Navigation value functions (X9 extension): first_value /
    nth_value(2) / last_value over the customer's full order history —
    the first-purchase / second-purchase / latest-purchase projection
    behind LTV features. The frame is explicitly UNBOUNDED...FOLLOWING
    (last_value under the default frame is the CURRENT row — a classic
    silent-wrong-answer); ordering ties break on the unique key. Money
    values compare as integer cents. One keyed window sort, same shuffle
    class as q_window_rank."""
    o = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    def over_cents(fn_col: F.Column) -> F.Column:
        return F.round(fn_col * 100).cast("long")

    return o.select(
        "o_orderkey",
        "o_custkey",
        over_cents(F.first("o_totalprice").over(w)).alias("first_cents"),
        over_cents(F.nth_value("o_totalprice", 2).over(w)).alias("second_cents"),
        over_cents(F.last("o_totalprice").over(w)).alias("last_cents"),
    )


@query(
    "q_window_range",
    oracle="""
SELECT o_orderkey, o_custkey,
       CAST(count(*) OVER w AS BIGINT) AS n_30d,
       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) OVER w AS BIGINT)
         AS cents_30d
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate
             RANGE BETWEEN INTERVAL 30 DAY PRECEDING AND CURRENT ROW)
""",
)
def q_window_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE-frame window (X9 extension): per order, the customer's
    trailing-30-day order count and revenue — the rolling-feature shape
    behind churn/velocity features. RANGE frames bound by VALUE distance
    (all orders within 30 days), not row count, and include peers (same
    orderdate rows share a frame) — semantics identical on both engines.
    Spark's rangeBetween needs a numeric ordering key, so the timestamp
    becomes epoch-days (orderdates are midnight-aligned, making
    INTERVAL 30 DAY and 30 epoch-days the same frame). One keyed window
    sort on o_custkey; no self-join — the naive equivalent is an
    interval self-join (q_join_range's shape) at 10x the cost."""
    o = load_table(spark, sf_dir, "orders")
    days = F.datediff(F.col("o_orderdate"), F.lit("1970-01-01").cast("date"))
    w = Window.partitionBy("o_custkey").orderBy(days).rangeBetween(-30, 0)
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.count(F.lit(1)).over(w).alias("n_30d"),
        F.sum(cents).over(w).alias("cents_30d"),
    )
