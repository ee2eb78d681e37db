"""Advanced time-series analytics: time-weighted averages, LTTB
downsampling, and classical seasonal decomposition.

The reference engine feeds event streams to ClickHouse and leaves this
layer downstream (SURVEY.md §2.3); these are the canonical hypertable
analytics a standalone engine owns (the TimescaleDB
time_weight/lttb/seasonality toolbox, re-expressed as single-pass
DataFrame plans). Shared scale shape: the corpus collapses to an
entity- or day-grain aggregate in one map-side-combinable pass, and
every subsequent window/join runs over that bounded series — only the
first exchange is data-proportional.

All arithmetic is exact BIGINT (microseconds x cents, day-index x
dollars) with one final round-6dp double ratio, so DuckDB replays each
query bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from elric_rs_spark.operators.temporal import _us
from elric_rs_spark.registry import query
from elric_rs_spark.tables import load_table

LTTB_BUCKETS = 30  # downsample target: one point per bucket


@query(
    "q_time_weighted_avg",
    oracle="""
WITH u AS (
  SELECT user_id, epoch_us(ts) AS t_us,
         CAST(round(value * 100) AS BIGINT) AS cents,
         lead(epoch_us(ts)) OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS next_us
  FROM events
)
SELECT user_id,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(next_us - t_us) FILTER (WHERE next_us IS NOT NULL)
            AS BIGINT) AS total_us,
       round(CAST(sum(cents * (next_us - t_us))
                    FILTER (WHERE next_us IS NOT NULL) AS DOUBLE)
             / CAST(sum(next_us - t_us)
                    FILTER (WHERE next_us IS NOT NULL) AS DOUBLE),
             6) AS twap_cents
FROM u
GROUP BY user_id
HAVING count(*) >= 2
   AND sum(next_us - t_us) FILTER (WHERE next_us IS NOT NULL) > 0
ORDER BY user_id
""",
)
def q_time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average (TimescaleDB time_weight / OHLC-adjacent
    TWAP) of each user's event value stream: each observation holds
    (LOCF) until the user's next event, and the average weights values
    by exact microsecond holding time — the correct aggregate for
    irregularly-sampled gauges, where the naive mean over-counts
    burst-sampled periods.

    ONE shuffle on user_id serves both the lead() window and the
    groupBy (Spark keeps the partitioning, no second exchange); the
    weighted sum is exact BIGINT (cents x microseconds stays under
    2^63 for any per-entity span below ~2.9M value-days) and the
    single division rounds to 6dp identically on both engines.
    Single-event users carry no holding interval and are dropped by
    the HAVING on both sides; so are users whose every event shares
    one timestamp (total_us = 0 — a 0/0 twap is meaningless and NaN
    != NaN would trip float parity; ADVICE r06)."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    u = ev.select(
        "user_id",
        _us("ts").alias("t_us"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
        F.lead(_us("ts")).over(w).alias("next_us"),
    )
    dur = F.when(F.col("next_us").isNotNull(), F.col("next_us") - F.col("t_us"))
    return (
        u.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(dur).alias("total_us"),
            F.sum(F.col("cents") * dur).alias("weighted"),
        )
        .filter((F.col("n_events") >= 2) & (F.col("total_us") > 0))
        .select(
            "user_id",
            "n_events",
            "total_us",
            F.round(
                F.col("weighted").cast("double") / F.col("total_us").cast("double"),
                6,
            ).alias("twap_cents"),
        )
        .orderBy("user_id")
    )


# Shared oracle CTE: the daily order-revenue series in whole dollars
# with a 0-based day index — the input both q_lttb_downsample and
# q_seasonal_decompose consume. Dollars (not cents) keep the LTTB area
# cross-products inside BIGINT through ~sf10 per the headroom audit in
# the docstring; the one constant to rescale beyond that is the
# round() divisor here.
_DAILY_SQL = """daily AS (
  SELECT CAST(date_trunc('day', o_orderdate) AS DATE) AS day,
         CAST(sum(CAST(round(o_totalprice) AS BIGINT)) AS BIGINT) AS v
  FROM orders GROUP BY 1
),
bounds AS (
  SELECT min(day) AS d0,
         CAST(date_diff('day', min(day), max(day)) + 1 AS BIGINT) AS span
  FROM daily
),
pts AS (
  SELECT day, v,
         CAST(date_diff('day', b.d0, day) AS BIGINT) AS idx,
         CAST(date_diff('day', b.d0, day) AS BIGINT)
           * {nb} // b.span AS bucket
  FROM daily, bounds b
)"""


def _daily_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(day, v, idx, bucket): the daily dollars series with day index
    and LTTB bucket assignment — the Spark twin of _DAILY_SQL."""
    o = load_table(spark, sf_dir, "orders")
    daily = o.groupBy(
        F.to_date(F.date_trunc("day", "o_orderdate")).alias("day")
    ).agg(F.sum(F.round("o_totalprice").cast("long")).alias("v"))
    bounds = daily.agg(
        F.min("day").alias("d0"),
        (F.datediff(F.max("day"), F.min("day")) + 1).cast("long").alias("span"),
    )
    return (
        daily.crossJoin(F.broadcast(bounds))
        .withColumn("idx", F.datediff("day", "d0").cast("long"))
        .withColumn("bucket", F.expr(f"(idx * {LTTB_BUCKETS}) div span"))
        .drop("d0", "span")
    )


@query(
    "q_lttb_downsample",
    oracle=f"""
WITH {_DAILY_SQL.format(nb=LTTB_BUCKETS)},
stats AS (
  SELECT bucket,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(idx) AS BIGINT) AS st,
         CAST(sum(v) AS BIGINT) AS sv
  FROM pts GROUP BY bucket
),
nb AS (
  SELECT bucket, n, st, sv,
         lag(n) OVER w AS np, lag(st) OVER w AS tp, lag(sv) OVER w AS vp,
         lead(n) OVER w AS nn, lead(st) OVER w AS tn, lead(sv) OVER w AS vn
  FROM stats WINDOW w AS (ORDER BY bucket)
),
br AS (SELECT min(bucket) AS b_min, max(bucket) AS b_max FROM stats),
cand AS (
  SELECT p.bucket, p.day, p.v, p.idx, s.n,
         CASE WHEN s.np IS NULL OR s.nn IS NULL THEN 0
              ELSE abs((s.tp * s.nn - s.tn * s.np) * (p.v * s.np - s.vp)
                       - (s.tp - p.idx * s.np) * (s.vn * s.np - s.vp * s.nn))
         END AS area,
         b.b_min, b.b_max
  FROM pts p JOIN nb s ON p.bucket = s.bucket CROSS JOIN br b
),
sel AS (
  SELECT bucket, day, v, n, area,
         row_number() OVER (
           PARTITION BY bucket
           ORDER BY CASE WHEN bucket = b_min THEN idx
                         WHEN bucket = b_max THEN -idx
                         ELSE -area END,
                    idx
         ) AS rn
  FROM cand
)
SELECT bucket, day, v AS v_dollars, n AS n_in_bucket, area AS area_scaled
FROM sel WHERE rn = 1
ORDER BY bucket
""",
)
def q_lttb_downsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Largest-Triangle-Three-Buckets downsampling of the daily
    order-revenue series to {LTTB_BUCKETS} points (Steinarsson 2013 —
    the TimescaleDB `lttb()` hyperfunction): per bucket, keep the point
    forming the largest triangle against its neighbor buckets, which
    preserves spikes and shape where per-bucket averaging flattens
    them.

    This is the bucketed-anchor PARALLEL variant: the canonical
    algorithm anchors each triangle at the previously SELECTED point
    (a sequential dependency no distributed plan can honor), the
    standard relaxation anchors at the neighbor buckets' centroids —
    each bucket then selects independently. Areas are exact BIGINT
    cross-products of the raw per-bucket sums (the centroid fractions
    multiply through, so no division ever happens before the argmax);
    first/last buckets pin the series endpoints per the paper. Headroom
    audit: |area| <= (max_idx*n)^2-ish ~ (2.4e3*80)*(80*daily_dollars);
    daily revenue in whole dollars holds under 2^63 through ~sf10 —
    one rescale constant (_DAILY_SQL round divisor) beyond that.

    Scale shape: the corpus collapses to day grain in one pass; stats,
    neighbor window and the selection window all run over <= 2400-row
    / {LTTB_BUCKETS}-group bounded sets; the bounds and bucket-range
    rows broadcast. The unpartitioned lag/lead window runs over
    {LTTB_BUCKETS} rows by construction."""
    pts = _daily_points(spark, sf_dir)
    stats = pts.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("idx").alias("st"),
        F.sum("v").alias("sv"),
    )
    w = Window.orderBy("bucket")
    nb = stats.select(
        "bucket",
        "n",
        "st",
        "sv",
        F.lag("n").over(w).alias("np"),
        F.lag("st").over(w).alias("tp"),
        F.lag("sv").over(w).alias("vp"),
        F.lead("n").over(w).alias("nn"),
        F.lead("st").over(w).alias("tn"),
        F.lead("sv").over(w).alias("vn"),
    )
    br = stats.agg(F.min("bucket").alias("b_min"), F.max("bucket").alias("b_max"))
    area = F.when(
        F.col("np").isNull() | F.col("nn").isNull(), F.lit(0).cast("long")
    ).otherwise(
        F.abs(
            (F.col("tp") * F.col("nn") - F.col("tn") * F.col("np"))
            * (F.col("v") * F.col("np") - F.col("vp"))
            - (F.col("tp") - F.col("idx") * F.col("np"))
            * (F.col("vn") * F.col("np") - F.col("vp") * F.col("nn"))
        )
    )
    cand = (
        pts.join(F.broadcast(nb), "bucket")
        .crossJoin(F.broadcast(br))
        .withColumn("area", area)
    )
    order_key = (
        F.when(F.col("bucket") == F.col("b_min"), F.col("idx"))
        .when(F.col("bucket") == F.col("b_max"), -F.col("idx"))
        .otherwise(-F.col("area"))
    )
    sel = cand.withColumn(
        "rn",
        F.row_number().over(
            Window.partitionBy("bucket").orderBy(order_key, "idx")
        ),
    )
    return (
        sel.filter(F.col("rn") == 1)
        .select(
            "bucket",
            "day",
            F.col("v").alias("v_dollars"),
            F.col("n").alias("n_in_bucket"),
            F.col("area").alias("area_scaled"),
        )
        .orderBy("bucket")
    )


@query(
    "q_seasonal_decompose",
    oracle="""
WITH daily AS (
  SELECT CAST(date_trunc('day', o_orderdate) AS DATE) AS day,
         CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
           AS cents
  FROM orders GROUP BY 1
),
bounds AS (SELECT min(day) AS d0, max(day) AS d1 FROM daily),
dense AS (
  SELECT CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE)
           AS day
  FROM bounds
),
filled AS (
  SELECT d.day, CAST(coalesce(a.cents, 0) AS BIGINT) AS cents
  FROM dense d LEFT JOIN daily a ON d.day = a.day
),
ma AS (
  SELECT day, cents,
         CAST(sum(cents) OVER w AS BIGINT) AS s7,
         CAST(count(*) OVER w AS BIGINT) AS c7
  FROM filled
  WINDOW w AS (ORDER BY day ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
),
interior AS (
  SELECT day, cents,
         cents * 1000 - (s7 * 1000 // 7) AS resid_milli
  FROM ma WHERE c7 = 7
),
dows AS (
  SELECT isodow(day) AS dow,
         CAST(count(*) AS BIGINT) AS n_days,
         CAST(sum(cents) AS BIGINT) AS sum_cents,
         CAST(sum(resid_milli) AS BIGINT) AS sum_resid_milli
  FROM interior GROUP BY isodow(day)
),
tot AS (
  SELECT CAST(sum(n_days) AS BIGINT) AS n_all,
         CAST(sum(sum_cents) AS BIGINT) AS sum_all
  FROM dows
)
SELECT d.dow, d.n_days, d.sum_resid_milli,
       round((CAST(d.sum_cents AS DOUBLE) * CAST(t.n_all AS DOUBLE))
             / (CAST(d.n_days AS DOUBLE) * CAST(t.sum_all AS DOUBLE)),
             6) AS seasonal_index
FROM dows d CROSS JOIN tot t
ORDER BY d.dow
""",
)
def q_seasonal_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classical weekly seasonal decomposition of daily order revenue
    (the moving-average method: trend = centered 7-day MA over the
    gap-filled calendar, seasonal = per-ISO-weekday residual): the
    detrended residual mass and the seasonal index (weekday mean /
    overall mean) for each of the 7 weekdays.

    The calendar is densified exactly like q_gap_fill (zero-filled
    missing days — a centered MA over a sparse series silently shrinks
    its window otherwise), edge days with a short window are excluded
    by the c7 = 7 gate on both engines, and the trend uses floor
    division on positive BIGINTs (Spark div == DuckDB //), so
    resid_milli is exact. Weekday alignment: DuckDB isodow (1 = Mon)
    vs Spark dayofweek (1 = Sun) is reconciled by the +5 mod 7 shift.

    Scale shape: corpus -> day grain in one combinable pass; the dense
    calendar, MA window and weekday rollup all run over the ~2400-row
    series; the final index divides two exact sums once, in an
    identical double-op order on both engines."""
    o = load_table(spark, sf_dir, "orders")
    daily = o.groupBy(
        F.to_date(F.date_trunc("day", "o_orderdate")).alias("day")
    ).agg(F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("cents"))
    bounds = daily.agg(F.min("day").alias("d0"), F.max("day").alias("d1"))
    dense = bounds.select(
        F.explode(F.sequence("d0", "d1", F.expr("interval 1 day"))).alias("day")
    )
    filled = dense.join(daily, "day", "left").select(
        "day", F.coalesce("cents", F.lit(0)).cast("long").alias("cents")
    )
    w = Window.orderBy("day").rowsBetween(-3, 3)
    ma = filled.select(
        "day",
        "cents",
        F.sum("cents").over(w).alias("s7"),
        F.count(F.lit(1)).over(w).alias("c7"),
    )
    interior = ma.filter(F.col("c7") == 7).select(
        "day",
        "cents",
        (F.col("cents") * 1000 - F.expr("(s7 * 1000) div 7")).alias("resid_milli"),
    )
    iso_dow = ((F.dayofweek("day") + 5) % 7 + 1).alias("dow")
    dows = interior.groupBy(iso_dow).agg(
        F.count(F.lit(1)).alias("n_days"),
        F.sum("cents").alias("sum_cents"),
        F.sum("resid_milli").alias("sum_resid_milli"),
    )
    tot = dows.agg(
        F.sum("n_days").alias("n_all"), F.sum("sum_cents").alias("sum_all")
    )
    return (
        dows.crossJoin(F.broadcast(tot))
        .select(
            "dow",
            "n_days",
            "sum_resid_milli",
            F.round(
                (F.col("sum_cents").cast("double") * F.col("n_all").cast("double"))
                / (F.col("n_days").cast("double") * F.col("sum_all").cast("double")),
                6,
            ).alias("seasonal_index"),
        )
        .orderBy("dow")
    )
