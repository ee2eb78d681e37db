"""Temporal operators: as-of join, range (interval) join, hypertable
time-bucket rollup, latest-row-per-key.

These are the operators a time-series / event-log deployment needs beyond
plain SQL, each expressed as a composition of built-in DataFrame ops so
Catalyst plans them (no UDFs, no cross joins):

- **as-of join** (`q_join_asof`): the classic "most recent fact at or
  before this time per key". Implemented as a tagged UNION + one keyed
  window pass with `last(..., ignorenulls=True)` — ONE shuffle on the key,
  no range explosion, no per-row probe. The DuckDB oracle uses its native
  `ASOF LEFT JOIN`, which is an *independent algorithm* for the same
  semantics — a stronger check than mirroring the union trick in SQL.
- **range join** (`q_join_range`): events within a ± window of each other.
  A naive formulation is a quadratic theta-join; this one bins timestamps
  to window-width buckets, replicates one side to its 3 candidate buckets,
  equi-joins on bucket, then applies the precise predicate — the standard
  binned-interval-join that shards on a 1000-executor cluster. The oracle
  is the plain inequality join (DuckDB plans an IEJoin).
- **hypertable rollup** (`q_rollup_timebucket`): the continuous-aggregate
  pattern (TimescaleDB's `time_bucket`): epoch-aligned 15-minute buckets
  via `F.window`, the exact op a streaming deployment would run with
  `readStream` + watermark unchanged.
- **latest per key** (`q_latest_per_key`): read-side dedup that the
  reference delegates to ClickHouse's ReplacingMergeTree + FINAL
  (/root/reference/README.md:9-11 uses that engine trick for cursors).
  Implemented as a lexicographic `max(struct(ts, ...))` aggregate — NOT a
  row_number window — because an aggregate gets map-side partial
  combining (per-executor state = one row per live key) while a window
  must fully sort every partition; at 100 TB that is the difference
  between a rollup and a global sort.

Cents convention per registry.py: money-like doubles are rounded per-row
into integer cents and summed as longs (order-independent across engines).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from elric_rs_spark.registry import query
from elric_rs_spark.tables import load_table

RANGE_US = 300 * 1_000_000  # ± 5 minutes, in microseconds


def _cents(col: str) -> F.Column:
    return F.round(F.col(col) * 100).cast("long")


def _us(col: str) -> F.Column:
    """Microseconds since epoch for a TIMESTAMP_NTZ column, timezone-free.

    `unix_micros` rejects NTZ inputs and casting NTZ->TIMESTAMP reads the
    session timezone (a vanilla driver session may not be UTC), so derive
    the integer directly: timestampdiff against the NTZ epoch literal is
    exact and independent of any session conf. DuckDB side: `epoch_us`.
    """
    return F.expr(
        f"timestampdiff(MICROSECOND, timestamp_ntz'1970-01-01 00:00:00', {col})"
    )


@query(
    "q_join_asof",
    oracle="""
WITH p AS (
  SELECT user_id, ts,
         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
           AS purchase_cents
  FROM events WHERE event_type = 'purchase'
  GROUP BY user_id, ts
),
c AS (
  SELECT event_id, user_id, ts,
         CAST(round(value * 100) AS BIGINT) AS click_cents
  FROM events WHERE event_type = 'click'
)
SELECT c.event_id, c.user_id, c.click_cents,
       p.ts AS purchase_ts, p.purchase_cents,
       CAST(epoch_us(c.ts) - epoch_us(p.ts) AS BIGINT) AS gap_us
FROM c ASOF LEFT JOIN p
  ON c.user_id = p.user_id AND c.ts >= p.ts
""",
)
def q_join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each click gets the user's most recent purchase at or
    before the click's timestamp (the kdb+/pandas `merge_asof` semantic).

    Purchases are pre-aggregated to unique (user_id, ts) so ties at the
    same instant are deterministic on both engines. The union+window form
    shuffles each side ONCE on user_id; `(ts, is_click)` ordering puts a
    same-instant purchase before the click, giving `>=` (at-or-before)
    semantics. Skewed keys split under AQE like any keyed window.
    """
    ev = load_table(spark, sf_dir, "events")
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(F.sum(_cents("value")).alias("purchase_cents"))
    )
    c = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", "event_id", _cents("value").alias("click_cents")
    )
    u = c.select(
        "user_id",
        "ts",
        "event_id",
        "click_cents",
        F.lit(1).alias("is_click"),
        F.lit(None).cast("long").alias("purchase_cents"),
    ).unionByName(
        p.select(
            "user_id",
            "ts",
            F.lit(None).cast("long").alias("event_id"),
            F.lit(None).cast("long").alias("click_cents"),
            F.lit(0).alias("is_click"),
            "purchase_cents",
        )
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "is_click")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        u.withColumn(
            "purchase_ts",
            F.last(F.when(F.col("is_click") == 0, F.col("ts")), ignorenulls=True).over(w),
        )
        .withColumn("asof_cents", F.last("purchase_cents", ignorenulls=True).over(w))
        .filter(F.col("is_click") == 1)
        .select(
            "event_id",
            "user_id",
            "click_cents",
            "purchase_ts",
            F.col("asof_cents").alias("purchase_cents"),
            (_us("ts") - _us("purchase_ts")).alias("gap_us"),
        )
    )


@query(
    "q_join_range",
    oracle="""
WITH e AS (
  SELECT event_id, ts, CAST(round(value * 100) AS BIGINT) AS cents
  FROM events
)
SELECT a.event_id,
       count(b.event_id) AS n_nearby,
       CAST(COALESCE(sum(b.cents), 0) AS BIGINT) AS nearby_cents
FROM e a
LEFT JOIN e b
  ON b.event_id <> a.event_id
 AND b.ts BETWEEN a.ts - INTERVAL 5 MINUTE AND a.ts + INTERVAL 5 MINUTE
GROUP BY a.event_id
""",
)
def q_join_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binned range join: for every event, count and sum the OTHER events
    within ±5 minutes (any user) — the interval-join shape behind
    concurrency metrics, overlap detection, and windows-of-interest.

    Scale shape: timestamps are binned to window-width (5 min) buckets
    with exact integer arithmetic on epoch-microseconds; the probe side is
    replicated to its 3 candidate buckets (bucket-1, bucket, bucket+1) and
    the join is a plain EQUI-join on bucket with the precise |Δt| ≤ 5 min
    predicate evaluated inside it. |Δt| ≤ width guarantees the candidate
    buckets cover every qualifying pair, and each pair qualifies under
    exactly one offset, so no dedup pass is needed. Work is O(pairs), the
    shuffle key is a uniform time bucket (AQE splits hot buckets), and no
    CartesianProduct appears in the plan — the naive theta-join version
    would be O(n²) and unshardable.
    """
    ev = load_table(spark, sf_dir, "events")
    base = ev.select(
        "event_id",
        _cents("value").alias("cents"),
        _us("ts").alias("us"),
        (_us("ts") - (_us("ts") % F.lit(RANGE_US))).alias("bucket"),
    )
    # probe side is re-derived from the source scan (not from `base`) so the
    # analyzer sees two distinct lineages instead of an ambiguous self-join
    probe = (
        ev.select(
            F.col("event_id").alias("o_id"),
            F.col("ts").alias("o_ts"),
            _cents("value").alias("o_cents"),
        )
        .withColumn("o_us", _us("o_ts"))
        .withColumn(
            "delta", F.explode(F.array(F.lit(-RANGE_US), F.lit(0), F.lit(RANGE_US)))
        )
        .select(
            "o_id",
            "o_us",
            "o_cents",
            ((F.col("o_us") - F.col("o_us") % F.lit(RANGE_US)) + F.col("delta")).alias(
                "jbucket"
            ),
        )
    )
    joined = base.join(
        probe,
        (base["bucket"] == probe["jbucket"])
        & (probe["o_id"] != base["event_id"])
        & (F.abs(probe["o_us"] - base["us"]) <= F.lit(RANGE_US)),
        "left",
    )
    return joined.groupBy(base["event_id"]).agg(
        F.count("o_id").alias("n_nearby"),
        F.coalesce(F.sum("o_cents"), F.lit(0)).alias("nearby_cents"),
    )


@query(
    "q_rollup_timebucket",
    oracle="""
SELECT
  date_trunc('minute', ts)
    - (CAST(extract(minute FROM ts) AS INT) % 15) * INTERVAL 1 MINUTE
    AS bucket_start,
  event_type,
  count(*) AS n_events,
  CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_cents,
  count(DISTINCT user_id) AS n_users,
  min(value) AS min_value,
  max(value) AS max_value
FROM events
GROUP BY 1, 2
""",
)
def q_rollup_timebucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable time-bucket rollup (TimescaleDB `time_bucket` /
    ClickHouse `toStartOfFifteenMinutes` shape): epoch-aligned 15-minute
    buckets × event_type, with count / cents-sum / distinct users /
    min-max.

    Uses `F.window` — the SAME expression works unchanged under
    `readStream` + `withWatermark` as a streaming continuous aggregate
    (SURVEY §2 X13 is the streaming variant; this is its hypertable
    batch form). One shuffle with map-side partial aggregation; at 100 TB
    the table would be written `partitionBy(date)` so the scan prunes to
    the queried time range before the rollup. min/max return stored
    values (not arithmetic), so they compare exactly across engines.
    """
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "15 minutes").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(_cents("value")).alias("sum_cents"),
            F.countDistinct("user_id").alias("n_users"),
            F.min("value").alias("min_value"),
            F.max("value").alias("max_value"),
        )
        .select(
            F.col("w.start").alias("bucket_start"),
            "event_type",
            "n_events",
            "sum_cents",
            "n_users",
            "min_value",
            "max_value",
        )
    )


@query(
    "q_latest_per_key",
    oracle="""
SELECT user_id, event_type,
       event_id AS latest_event_id,
       ts AS latest_ts,
       CAST(round(value * 100) AS BIGINT) AS latest_cents
FROM (
  SELECT *,
         row_number() OVER (
           PARTITION BY user_id, event_type
           ORDER BY ts DESC, event_id DESC
         ) AS rn
  FROM events
) t
WHERE rn = 1
""",
)
def q_latest_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Latest row per (user_id, event_type) — the read-side dedup the
    reference delegates to ClickHouse ReplacingMergeTree + FINAL
    (/root/reference/README.md:9-11; its cursors table relies on exactly
    this "keep the newest version per key" semantic).

    Implemented as `max(struct(ts, event_id, cents))` — lexicographic
    struct max with event_id as the deterministic tiebreak — rather than
    a row_number window: the aggregate gets map-side partial combining
    (executor state is one row per live key, shuffle carries only
    per-key maxima) while a window function must fully sort each
    partition. At 100 TB keys ≫ memory this is the difference between a
    streaming-friendly rollup and a global sort. The oracle uses the
    row_number formulation — an independent algorithm for the same
    semantics.
    """
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.select(
            "user_id",
            "event_type",
            F.struct(
                F.col("ts").alias("ts"),
                F.col("event_id").alias("event_id"),
                _cents("value").alias("cents"),
            ).alias("s"),
        )
        .groupBy("user_id", "event_type")
        .agg(F.max("s").alias("s"))
        .select(
            "user_id",
            "event_type",
            F.col("s.event_id").alias("latest_event_id"),
            F.col("s.ts").alias("latest_ts"),
            F.col("s.cents").alias("latest_cents"),
        )
    )


@query(
    "q_funnel",
    oracle="""
WITH s1 AS (
  SELECT user_id, min(ts) AS t1 FROM events
  WHERE event_type = 'signup' GROUP BY user_id
),
s2 AS (
  SELECT e.user_id, min(e.ts) AS t2
  FROM events e JOIN s1 ON e.user_id = s1.user_id AND e.ts > s1.t1
  WHERE e.event_type = 'click' GROUP BY e.user_id
),
s3 AS (
  SELECT e.user_id, min(e.ts) AS t3
  FROM events e JOIN s2 ON e.user_id = s2.user_id AND e.ts > s2.t2
  WHERE e.event_type = 'purchase' GROUP BY e.user_id
)
SELECT '1_signup' AS stage, CAST(count(*) AS BIGINT) AS n_users FROM s1
UNION ALL
SELECT '2_click', CAST(count(*) AS BIGINT) FROM s2
UNION ALL
SELECT '3_purchase', CAST(count(*) AS BIGINT) FROM s3
""",
)
def q_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strict-order conversion funnel signup -> click -> purchase (the
    ClickHouse `windowFunnel` semantic, strict mode): a user advances to
    stage k only with an event strictly AFTER their stage k-1 time;
    stage time = earliest qualifying event.

    Scale shape: each stage is a filtered scan (event_type predicate
    pushes into parquet, so 3 'passes' read ~1/5 of the data each) plus a
    shuffle join on user_id against the previous stage's per-user row —
    never broadcast, since at 100 TB the user dimension is itself huge.
    Stage state is one row per surviving user, shrinking monotonically.
    """
    ev = load_table(spark, sf_dir, "events")

    def stage(event_type: str, prev: DataFrame | None, prev_t: str, t: str) -> DataFrame:
        e = ev.filter(F.col("event_type") == event_type)
        if prev is not None:
            e = e.join(prev, "user_id").filter(F.col("ts") > F.col(prev_t))
        return e.groupBy("user_id").agg(F.min("ts").alias(t))

    s1 = stage("signup", None, "", "t1")
    s2 = stage("click", s1, "t1", "t2")
    s3 = stage("purchase", s2, "t2", "t3")

    def count_stage(df: DataFrame, name: str) -> DataFrame:
        return df.agg(F.count(F.lit(1)).alias("n_users")).select(
            F.lit(name).alias("stage"), "n_users"
        )

    return (
        count_stage(s1, "1_signup")
        .unionByName(count_stage(s2, "2_click"))
        .unionByName(count_stage(s3, "3_purchase"))
    )


@query(
    "q_retention",
    oracle="""
WITH first_seen AS (
  SELECT user_id, min(CAST(ts AS DATE)) AS cohort_day
  FROM events GROUP BY user_id
),
activity AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
)
SELECT f.cohort_day,
       CAST(count(DISTINCT f.user_id) AS BIGINT) AS cohort_size,
       CAST(count(DISTINCT CASE WHEN a.day = f.cohort_day + 7
             THEN a.user_id END) AS BIGINT) AS retained_d7,
       CAST(count(DISTINCT CASE WHEN a.day = f.cohort_day + 14
             THEN a.user_id END) AS BIGINT) AS retained_d14
FROM first_seen f
LEFT JOIN activity a ON a.user_id = f.user_id
GROUP BY f.cohort_day
""",
)
def q_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention (the ClickHouse `retention()` analytics shape):
    users grouped by first-seen day; for each cohort, how many were
    active exactly 7 and 14 days later.

    Scale shape: both CTEs aggregate events down to per-user rows before
    anything joins (first_seen = one row per user, activity = one row
    per user-day), so the join input is user-dimension-sized, not
    event-sized; the join keys on user_id and the final rollup groups on
    ~30 cohort days with conditional distinct counts. No window
    functions, no event-grain shuffle."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", F.col("ts").cast("date").alias("day")
    )
    first_seen = ev.groupBy("user_id").agg(F.min("day").alias("cohort_day"))
    activity = ev.distinct()
    return (
        first_seen.join(activity, "user_id", "left")
        .groupBy("cohort_day")
        .agg(
            F.countDistinct("user_id").alias("cohort_size"),
            F.countDistinct(
                F.when(
                    F.col("day") == F.date_add(F.col("cohort_day"), 7),
                    F.col("user_id"),
                )
            ).alias("retained_d7"),
            F.countDistinct(
                F.when(
                    F.col("day") == F.date_add(F.col("cohort_day"), 14),
                    F.col("user_id"),
                )
            ).alias("retained_d14"),
        )
    )


@query(
    "q_ohlc",
    oracle="""
WITH priced AS (
  SELECT date_trunc('hour', ts) AS bar_start,
         event_type,
         ts, event_id,
         CAST(round(value * 100) AS BIGINT) AS cents
  FROM events
),
w AS (
  SELECT bar_start, event_type, cents,
         row_number() OVER (PARTITION BY bar_start, event_type
                            ORDER BY ts, event_id) AS rn_a,
         row_number() OVER (PARTITION BY bar_start, event_type
                            ORDER BY ts DESC, event_id DESC) AS rn_d
  FROM priced
)
SELECT bar_start, event_type,
       min(CASE WHEN rn_a = 1 THEN cents END) AS open_cents,
       max(cents) AS high_cents,
       min(cents) AS low_cents,
       min(CASE WHEN rn_d = 1 THEN cents END) AS close_cents,
       CAST(count(*) AS BIGINT) AS n_ticks
FROM w
GROUP BY bar_start, event_type
""",
)
def q_ohlc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OHLC bars (the canonical financial/telemetry downsample): per
    hourly bucket and event_type, the first (open) and last (close)
    value by event time plus the high/low extremes.

    Open/close via lexicographic min/max over (ts, event_id, cents)
    structs — ONE hash aggregate with map-side partial combining, where
    the textbook row_number-per-bucket formulation would sort every
    partition. (event_id breaks same-timestamp ties identically on both
    engines.) At 100 TB this is the shape that turns a tick table into
    a bar table with a single shuffle keyed by (bucket, series)."""
    ev = load_table(spark, sf_dir, "events")
    tagged = ev.select(
        F.date_trunc("hour", F.col("ts")).alias("bar_start"),
        "event_type",
        F.struct(F.col("ts"), F.col("event_id"), _cents("value").alias("cents")).alias(
            "tick"
        ),
        _cents("value").alias("cents"),
    )
    return tagged.groupBy("bar_start", "event_type").agg(
        F.min("tick").getField("cents").alias("open_cents"),
        F.max("cents").alias("high_cents"),
        F.min("cents").alias("low_cents"),
        F.max("tick").getField("cents").alias("close_cents"),
        F.count(F.lit(1)).alias("n_ticks"),
    )


@query(
    "q_anomaly",
    oracle="""
WITH c AS (
  SELECT event_id, event_type, CAST(round(value * 100) AS BIGINT) AS cents
  FROM events
),
stats AS (
  SELECT event_type,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(cents) AS BIGINT) AS s,
         CAST(sum(cents * cents) AS BIGINT) AS q
  FROM c GROUP BY event_type
)
SELECT c.event_id, c.event_type,
       round((CAST(c.cents AS DOUBLE) - CAST(s AS DOUBLE) / n)
             / sqrt((CAST(q AS DOUBLE) - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / n)
                    / (n - 1)), 4) AS z
FROM c JOIN stats ON c.event_type = stats.event_type
WHERE abs((CAST(c.cents AS DOUBLE) - CAST(s AS DOUBLE) / n)
          / sqrt((CAST(q AS DOUBLE) - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / n)
                 / (n - 1))) > 2.5
""",
)
def q_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical outlier detection: per-event-type z-scores with
    |z| > 2.5 flagged.

    Cross-engine determinism is engineered, not hoped for: the group
    stats are EXACT integer aggregates (cents sum + sum of squares as
    BIGINT — order-independent), and mean/variance/z are then derived
    with the IDENTICAL double expression on both engines, so the same
    exact integers give bit-identical doubles and the |z| > 2.5 boundary
    cannot flip. Using avg()/stddev() directly would compare two
    different float summation orders at the threshold. Scale shape: one
    map-side-combined aggregate over a 5-key group, broadcast back onto
    the event scan."""
    ev = load_table(spark, sf_dir, "events")
    c = ev.select("event_id", "event_type", _cents("value").alias("cents"))
    stats = c.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("cents").alias("s"),
        F.sum(F.col("cents") * F.col("cents")).alias("q"),
    )
    cd = F.col("cents").cast("double")
    sd = F.col("s").cast("double")
    qd = F.col("q").cast("double")
    z = (cd - sd / F.col("n")) / F.sqrt(
        (qd - sd * sd / F.col("n")) / (F.col("n") - 1)
    )
    return (
        c.join(F.broadcast(stats), "event_type")
        .filter(F.abs(z) > 2.5)
        .select("event_id", "event_type", F.round(z, 4).alias("z"))
    )


@query(
    "q_sessionize",
    oracle="""
WITH e AS (
  SELECT user_id, event_id, epoch_us(ts) AS us FROM events
),
x AS (
  SELECT *, CASE WHEN lag(us) OVER w IS NULL
                   OR us - lag(us) OVER w > 21600000000 THEN 1 ELSE 0 END AS is_new
  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)
),
s AS (
  SELECT *, CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY us, event_id
                                   ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
  FROM x
)
SELECT user_id, session_id,
       CAST(count(*) AS BIGINT) AS n_events,
       min(us) AS start_us,
       max(us) AS end_us,
       max(us) - min(us) AS duration_us
FROM s GROUP BY user_id, session_id
""",
)
def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch sessionization (gaps-and-islands): split each user's event
    stream into sessions wherever the gap exceeds 6 hours, then aggregate
    per-session stats. The batch twin of q_session_window's streaming
    session — this form is what a backfill over historical logs runs.

    Ordering is total (us, event_id), so the lag/cumsum session labels
    are fully deterministic even on duplicate timestamps.

    Scale shape: ONE shuffle on user_id drives both window passes and the
    final groupBy (same partitioning, reused exchange); gap math is exact
    integer microseconds. Key cardinality = users, uniform.
    """
    ev = load_table(spark, sf_dir, "events")
    e = ev.select("user_id", "event_id", _us("ts").alias("us"))
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    gap = F.col("us") - F.lag("us").over(w)
    x = e.withColumn(
        "is_new",
        F.when(gap.isNull() | (gap > 21_600_000_000), 1).otherwise(0),
    )
    s = x.withColumn(
        "session_id",
        F.sum("is_new").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return s.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("us").alias("start_us"),
        F.max("us").alias("end_us"),
        (F.max("us") - F.min("us")).alias("duration_us"),
    )


@query(
    "q_outlier_iqr",
    oracle="""
WITH c AS (
  SELECT event_id, event_type, CAST(round(value * 100) AS BIGINT) AS cents
  FROM events
),
q AS (
  SELECT event_type,
         CAST(round(quantile_cont(cents, 0.25) * 4) AS BIGINT) AS q1_4,
         CAST(round(quantile_cont(cents, 0.75) * 4) AS BIGINT) AS q3_4
  FROM c GROUP BY event_type
)
SELECT event_id, c.event_type, cents,
       CASE WHEN 8 * cents < 5 * q1_4 - 3 * q3_4 THEN 'low' ELSE 'high' END AS side
FROM c JOIN q USING (event_type)
WHERE 8 * cents < 5 * q1_4 - 3 * q3_4 OR 8 * cents > 5 * q3_4 - 3 * q1_4
""",
)
def q_outlier_iqr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tukey-fence outlier detection: flag events outside
    [Q1 - 1.5*IQR, Q3 + 1.5*IQR] of their event type's value distribution.

    Cross-engine determinism: quartiles of integer cents land on exact
    quarter-units, so ``round(quantile*4)`` recovers an exact integer on
    both engines even if their interpolation differs in the last ulp, and
    the fence tests are then pure integer comparisons (multiplied out by
    8: ``8*cents < 5*Q1_4 - 3*Q3_4``) — no float boundary can flip a row.
    Spark's exact `percentile` and DuckDB's `quantile_cont` use the same
    (n-1)*p linear interpolation.

    Scale shape: one exact-percentile aggregate per event type (5 groups)
    broadcast back onto the scan — same topology as q_anomaly. Exact
    percentiles hold full per-group value buffers; at 100 TB swap in
    approx_percentile with a tightened accuracy, or the two-pass
    histogram trick, keeping the integer fence math unchanged.
    """
    ev = load_table(spark, sf_dir, "events")
    c = ev.select("event_id", "event_type", _cents("value").alias("cents"))
    q = c.groupBy("event_type").agg(
        F.round(F.percentile("cents", F.lit(0.25)) * 4).cast("long").alias("q1_4"),
        F.round(F.percentile("cents", F.lit(0.75)) * 4).cast("long").alias("q3_4"),
    )
    lo = 8 * F.col("cents") < 5 * F.col("q1_4") - 3 * F.col("q3_4")
    hi = 8 * F.col("cents") > 5 * F.col("q3_4") - 3 * F.col("q1_4")
    return (
        c.join(F.broadcast(q), "event_type")
        .filter(lo | hi)
        .select(
            "event_id",
            "event_type",
            "cents",
            F.when(lo, "low").otherwise("high").alias("side"),
        )
    )


@query(
    "q_gap_fill",
    oracle="""
WITH bounds AS (
  SELECT user_id,
         CAST(min(date_trunc('day', ts)) AS DATE) AS d0,
         CAST(max(date_trunc('day', ts)) AS DATE) AS d1
  FROM events GROUP BY user_id
),
dense AS (
  SELECT user_id, CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE) AS day
  FROM bounds
),
actual AS (
  SELECT user_id, CAST(date_trunc('day', ts) AS DATE) AS day,
         CAST(count(*) AS BIGINT) AS n_events
  FROM events GROUP BY 1, 2
)
SELECT d.user_id, d.day,
       CAST(coalesce(a.n_events, 0) AS BIGINT) AS n_events,
       CASE WHEN a.n_events IS NULL THEN 1 ELSE 0 END AS is_gap
FROM dense d LEFT JOIN actual a
  ON d.user_id = a.user_id AND d.day = a.day
WHERE d.user_id < 100
""",
)
def q_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-filled daily series (TimescaleDB time_bucket_gapfill /
    ClickHouse WITH FILL shape): densify each user's [first, last] day
    range, left-join actual daily counts, zero-fill the holes — the
    prerequisite for correct moving averages and "days inactive"
    features over sparse event streams.

    The dense axis is generated with `sequence()` per user — row count
    = active span, no cross join against a global calendar (the naive
    calendar×users cross join materializes users × all-days and mostly
    discards it). The join keys on (user_id, day): both sides are
    pre-aggregated per user, the dense side is derived from a 2-column
    bounds aggregate, and at 100 TB both shuffles key on the uniform
    user_id. user_id < 100 caps the graded output (the operator itself
    is unbounded)."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 100)
    day = F.to_date(F.date_trunc("day", F.col("ts")))
    bounds = ev.groupBy("user_id").agg(
        F.min(day).alias("d0"), F.max(day).alias("d1")
    )
    dense = bounds.select(
        "user_id",
        F.explode(F.sequence("d0", "d1", F.expr("interval 1 day"))).alias("day"),
    )
    actual = ev.groupBy("user_id", day.alias("day")).agg(
        F.count(F.lit(1)).alias("n_actual")
    )
    return dense.join(actual, ["user_id", "day"], "left").select(
        "user_id",
        "day",
        F.coalesce("n_actual", F.lit(0)).cast("long").alias("n_events"),
        F.when(F.col("n_actual").isNull(), 1).otherwise(0).alias("is_gap"),
    )


@query(
    "q_rollup_multigrain",
    oracle="""
WITH g AS (
  SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS h,
         CAST(date_trunc('day', ts) AS TIMESTAMP) AS d,
         CAST(date_trunc('month', ts) AS TIMESTAMP) AS m,
         CAST(round(value * 100) AS BIGINT) AS cents
  FROM events
)
SELECT CASE WHEN GROUPING(h) = 0 THEN 'hour'
            WHEN GROUPING(d) = 0 THEN 'day'
            ELSE 'month' END AS grain,
       coalesce(h, d, m) AS bucket_start,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(cents) AS BIGINT) AS sum_cents
FROM g
GROUP BY GROUPING SETS ((h), (d), (m))
""",
)
def q_rollup_multigrain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-granularity continuous aggregate (the TimescaleDB
    hierarchical-caggs / Druid multi-grain rollup shape): hourly, daily,
    and monthly buckets computed in ONE grouping-sets pass — a single
    Expand + hash aggregate with map-side partials, one shuffle — where
    the naive form scans the fact table three times. grouping()
    disambiguates the grain; coalesce folds the three bucket columns.
    At 100 TB this is the backfill that populates a mart hierarchy in
    one read of the raw events."""
    ev = load_table(spark, sf_dir, "events")
    g = ev.select(
        F.date_trunc("hour", "ts").alias("h"),
        F.date_trunc("day", "ts").alias("d"),
        F.date_trunc("month", "ts").alias("m"),
        _cents("value").alias("cents"),
    )
    rolled = g.groupingSets([["h"], ["d"], ["m"]], "h", "d", "m").agg(
        F.grouping("h").alias("gh"),
        F.grouping("d").alias("gd"),
        F.count(F.lit(1)).alias("n_events"),
        F.sum("cents").alias("sum_cents"),
    )
    return rolled.select(
        F.when(F.col("gh") == 0, "hour")
        .when(F.col("gd") == 0, "day")
        .otherwise("month")
        .alias("grain"),
        F.coalesce("h", "d", "m").alias("bucket_start"),
        "n_events",
        "sum_cents",
    )


@query(
    "q_counter_rate",
    oracle="""
WITH d AS (
  SELECT user_id, ts,
         CAST(round(value * 100) AS BIGINT) AS cents,
         CAST(round(value * 100) AS BIGINT)
           - lag(CAST(round(value * 100) AS BIGINT))
             OVER (PARTITION BY user_id ORDER BY ts, event_id) AS delta
  FROM events
)
SELECT user_id,
       CAST(count(*) AS BIGINT) AS n_samples,
       CAST(sum(CASE WHEN delta IS NULL THEN 0
                     WHEN delta >= 0 THEN delta
                     ELSE cents END) AS BIGINT) AS increase_cents,
       CAST(count(CASE WHEN delta < 0 THEN 1 END) AS BIGINT) AS n_resets
FROM d
GROUP BY user_id
""",
)
def q_counter_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monotonic-counter increase with reset handling (PromQL
    `increase` / TimescaleDB `counter_agg` semantics): per key, sum the
    positive deltas between consecutive samples; when a counter RESETS
    (delta < 0 — process restart), the post-reset reading counts as
    growth from zero. The monitoring-pipeline op plain sum/max cannot
    express, and the classic source of silently-wrong dashboards when
    an engine port mishandles the reset branch.

    One keyed window (lag) whose user_id partitioning the report
    aggregate then reuses — single shuffle, same class as
    q_sessionize. Integer cents end to end."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    cents = _cents("value")
    d = ev.select(
        "user_id",
        cents.alias("cents"),
        (cents - F.lag(cents).over(w)).alias("delta"),
    )
    inc = (
        F.when(F.col("delta").isNull(), 0)
        .when(F.col("delta") >= 0, F.col("delta"))
        .otherwise(F.col("cents"))
    )
    return d.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_samples"),
        F.sum(inc).alias("increase_cents"),
        F.count(F.when(F.col("delta") < 0, 1)).alias("n_resets"),
    )


IVL_W_US = 7 * 60 * 1_000_000  # bucket width == max synthesized duration


@query(
    "q_join_interval",
    oracle="""
WITH iv AS (
  SELECT event_id, event_type,
         CAST(epoch_us(ts) AS BIGINT) AS s_us,
         CAST(epoch_us(ts) + (event_id % 7 + 1) * 60000000 AS BIGINT) AS e_us
  FROM events
)
SELECT a.event_id AS event_a, b.event_id AS event_b, a.event_type,
       CAST(least(a.e_us, b.e_us) - greatest(a.s_us, b.s_us) AS BIGINT)
         AS overlap_us
FROM iv a JOIN iv b
  ON a.event_type = b.event_type AND a.event_id < b.event_id
 AND a.s_us <= b.e_us AND b.s_us <= a.e_us
""",
)
def q_join_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-overlap join (interval x interval, the shape behind
    session-overlap, concurrent-span, and genomic-range analytics —
    distinct from q_join_range's point-proximity): every pair of
    same-type intervals that overlap, with the exact overlap duration.
    Intervals are synthesized deterministically from the event fixture
    (duration = (event_id % 7 + 1) minutes), identically on both
    engines.

    Scale shape: each interval is replicated to the width-W time
    buckets it touches (W = max duration, so <= 2 buckets per
    interval — a schema constant, never data-dependent fan-out); the
    join is a plain EQUI-join on (event_type, bucket) with the exact
    overlap predicate inside, then a distinct pass because a pair can
    co-occupy two buckets. Work is O(overlapping pairs), the shuffle
    key is uniform time buckets (AQE splits hot ones), and the naive
    O(n²) theta join — which is exactly what the oracle runs at test
    scale — never appears in the plan (plan-gated: no
    CartesianProduct/BroadcastNestedLoopJoin)."""
    ev = load_table(spark, sf_dir, "events")
    dur_us = ((F.col("event_id") % 7 + 1) * 60_000_000).cast("long")
    iv = ev.select(
        "event_id",
        "event_type",
        _us("ts").alias("s_us"),
        (_us("ts") + dur_us).alias("e_us"),
    )
    binned = iv.select(
        "*",
        F.explode(
            F.sequence(
                F.expr(f"s_us div {IVL_W_US}"), F.expr(f"e_us div {IVL_W_US}")
            )
        ).alias("bucket"),
    )
    a = binned.select(
        F.col("event_id").alias("event_a"),
        "event_type",
        F.col("s_us").alias("sa"),
        F.col("e_us").alias("ea"),
        "bucket",
    )
    b = binned.select(
        F.col("event_id").alias("event_b"),
        F.col("event_type").alias("bt"),
        F.col("s_us").alias("sb"),
        F.col("e_us").alias("eb"),
        F.col("bucket").alias("bb"),
    )
    return (
        a.join(
            b,
            (F.col("bucket") == F.col("bb"))
            & (F.col("event_type") == F.col("bt"))
            & (F.col("event_a") < F.col("event_b"))
            & (F.col("sa") <= F.col("eb"))
            & (F.col("sb") <= F.col("ea")),
        )
        .select(
            "event_a",
            "event_b",
            "event_type",
            (F.least("ea", "eb") - F.greatest("sa", "sb")).cast("long").alias("overlap_us"),
        )
        .distinct()
    )


ROLLING_DAYS = 7


@query(
    "q_rolling_active",
    oracle=f"""
WITH ud AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
),
contrib AS (
  SELECT user_id, d + CAST(i AS INTEGER) AS window_day
  FROM ud, range(0, {ROLLING_DAYS}) t(i)
),
days AS (SELECT DISTINCT CAST(ts AS DATE) AS window_day FROM events)
SELECT c.window_day, count(DISTINCT c.user_id) AS active_users
FROM contrib c JOIN days ON days.window_day = c.window_day
GROUP BY c.window_day
""",
)
def q_rolling_active(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling {N}-day distinct active users (the DAU/WAU retention
    metric): for every day with events, the count of distinct users
    seen in the trailing {N}-day window ending that day.

    Distinct-over-sliding-windows has no map-side-combinable window
    frame form (COUNT(DISTINCT) OVER RANGE is unsupported in Spark and
    a quadratic re-scan where it exists); the scalable shape is
    contribution explode: collapse to distinct (user, day) FIRST (one
    shuffle, map-side combined, the big reduction), then each pair
    contributes to the {N} window-days it's visible in (a constant
    {N}x fan-out of the ALREADY-collapsed pairs, not of raw events),
    then one (window_day, user) distinct-count. Days with no events
    produce no row (inner join against observed days) — matching the
    oracle's semantics exactly; calendar gap-fill is q_gap_fill's job.
    At 100 TB: raw events collapse by orders of magnitude before the
    fan-out, and every shuffle keys on uniform (day, user) hashes."""
    ev = load_table(spark, sf_dir, "events")
    ud = ev.select("user_id", F.col("ts").cast("date").alias("d")).distinct()
    contrib = ud.select(
        "user_id",
        F.explode(
            F.sequence(F.col("d"), F.date_add(F.col("d"), ROLLING_DAYS - 1))
        ).alias("window_day"),
    )
    days = ev.select(F.col("ts").cast("date").alias("window_day")).distinct()
    return (
        contrib.join(days, "window_day")
        .groupBy("window_day")
        .agg(F.countDistinct("user_id").alias("active_users"))
    )


# EWMA with alpha = 1/2, truncated at 8 lags: weights 2^(7-i) for lag i
# are exact powers of two, so numerator/denominator are exact BIGINTs
# and the smoothed value is one integer division (trunc == floor for
# the positive cents here) — no float anywhere.
EWMA_LAGS = 8


def _ewma_terms_sql() -> tuple[str, str]:
    num = " + ".join(
        f"COALESCE(lag(cents, {i}) OVER w * {2 ** (EWMA_LAGS - 1 - i)}, 0)"
        for i in range(EWMA_LAGS)
    )
    den = " + ".join(
        f"CASE WHEN lag(cents, {i}) OVER w IS NOT NULL"
        f" THEN {2 ** (EWMA_LAGS - 1 - i)} ELSE 0 END"
        for i in range(EWMA_LAGS)
    )
    return num, den


_EWMA_NUM_SQL, _EWMA_DEN_SQL = _ewma_terms_sql()


@query(
    "q_ewma",
    oracle=f"""
WITH e AS (
  SELECT user_id, event_id, epoch_us(ts) AS us,
         CAST(round(value * 100) AS BIGINT) AS cents
  FROM events
),
sm AS (
  SELECT user_id, event_id,
         CAST({_EWMA_NUM_SQL} AS BIGINT) AS num,
         CAST({_EWMA_DEN_SQL} AS BIGINT) AS den
  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)
)
SELECT user_id, event_id, num, den,
       CAST((num - ((num % den + den) % den)) // den AS BIGINT) AS ewma_cents
FROM sm
""",
)
def q_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially-weighted moving average (alpha = 1/2) of each
    user's metric stream, truncated at 8 lags — the smoothing pass
    behind anomaly baselines and rate dashboards. The recursive EWMA
    has no parallel window form; the truncated expansion is the
    standard distributed equivalent (weights halve per lag, so 8 lags
    carry all but 2^-8 of the mass) and, with power-of-two integer
    weights over integer cents, it is EXACT: one BIGINT dot product
    over the lag window and one integer division, replayed verbatim
    by the oracle. Division is the pmod pre-subtraction floor form
    (the q_kmeans_assign construction): subtracting the non-negative
    pmod makes the numerator exactly divisible, so Spark's truncating
    `div` and DuckDB's flooring `//` agree for ANY sign — a stream
    with negative metric values keeps exact cross-engine semantics
    (ADVICE r04: the bare-div form was exact only because the fixture
    happens to be non-negative).

    Scale shape: one keyed window (lag frame over user_id partitions,
    the q_counter_rate shuffle class); everything else is row-local
    integer arithmetic. Early rows renormalize over the lags that
    exist (den shrinks), so no warm-up rows are dropped."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(_us("ts"), "event_id")
    cents = _cents("value")
    num = None
    den = None
    for i in range(EWMA_LAGS):
        wt = 2 ** (EWMA_LAGS - 1 - i)
        lag_i = F.lag(cents, i).over(w) if i else cents
        t = F.coalesce(lag_i * wt, F.lit(0))
        d = F.when(lag_i.isNotNull(), F.lit(wt)).otherwise(F.lit(0))
        num = t if num is None else num + t
        den = d if den is None else den + d
    return ev.select(
        "user_id",
        "event_id",
        num.cast("long").alias("num"),
        den.cast("long").alias("den"),
    ).select(
        "user_id",
        "event_id",
        "num",
        "den",
        F.expr("(num - pmod(num, den)) div den").alias("ewma_cents"),
    )


ASOF_FWD_TOL_US = 600 * 1_000_000  # 10-minute forward tolerance


@query(
    "q_join_asof_forward",
    oracle=f"""
WITH p AS (
  SELECT user_id, ts, CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
           AS purchase_cents
  FROM events WHERE event_type = 'purchase' GROUP BY user_id, ts
),
c AS (
  SELECT user_id, ts, event_id,
         CAST(round(value * 100) AS BIGINT) AS click_cents
  FROM events WHERE event_type = 'click'
),
u AS (
  SELECT user_id, ts, event_id, click_cents, 1 AS is_click,
         CAST(NULL AS BIGINT) AS purchase_cents
  FROM c
  UNION ALL
  SELECT user_id, ts, CAST(NULL AS BIGINT), CAST(NULL AS BIGINT), 0,
         purchase_cents
  FROM p
),
wnd AS (
  SELECT user_id, ts, event_id, click_cents, is_click,
         first_value(CASE WHEN is_click = 0 THEN ts END IGNORE NULLS)
           OVER fwd AS next_ts,
         first_value(CASE WHEN is_click = 0 THEN purchase_cents END
                     IGNORE NULLS) OVER fwd AS next_cents
  FROM u
  WINDOW fwd AS (PARTITION BY user_id ORDER BY ts, is_click DESC
                 ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
)
SELECT event_id, user_id, click_cents,
       CASE WHEN next_ts IS NOT NULL
             AND epoch_us(next_ts) - epoch_us(ts) <= {ASOF_FWD_TOL_US}
            THEN next_cents END AS next_purchase_cents,
       CASE WHEN next_ts IS NOT NULL
             AND epoch_us(next_ts) - epoch_us(ts) <= {ASOF_FWD_TOL_US}
            THEN CAST(epoch_us(next_ts) - epoch_us(ts) AS BIGINT)
            END AS gap_us
FROM wnd WHERE is_click = 1
""",
)
def q_join_asof_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FORWARD as-of join with tolerance (the conversion-attribution
    direction, complementing q_join_asof's backward look): each click
    gets the user's next purchase AT OR AFTER the click, but only
    within a 10-minute tolerance — past it the click is an
    unconverted NULL row. The at-or-after boundary comes from the
    union's sort key (ts, is_click DESC): at an equal timestamp the
    click sorts before the purchase, so the forward window sees it.

    Same scale shape as the backward form: one union, each side
    shuffled ONCE on user_id, a keyed forward-looking window — no
    range self-join, and the tolerance is a row-local filter after the
    window, costing nothing. Skewed users split under AQE."""
    ev = load_table(spark, sf_dir, "events")
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(F.sum(_cents("value")).alias("purchase_cents"))
    )
    c = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", "event_id", _cents("value").alias("click_cents")
    )
    u = c.select(
        "user_id",
        "ts",
        "event_id",
        "click_cents",
        F.lit(1).alias("is_click"),
        F.lit(None).cast("long").alias("purchase_cents"),
    ).unionByName(
        p.select(
            "user_id",
            "ts",
            F.lit(None).cast("long").alias("event_id"),
            F.lit(None).cast("long").alias("click_cents"),
            F.lit(0).alias("is_click"),
            "purchase_cents",
        )
    )
    fwd = (
        Window.partitionBy("user_id")
        .orderBy("ts", F.col("is_click").desc())
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    wnd = u.select(
        "user_id",
        "ts",
        "event_id",
        "click_cents",
        "is_click",
        F.first(
            F.when(F.col("is_click") == 0, F.col("ts")), ignorenulls=True
        ).over(fwd).alias("next_ts"),
        F.first(
            F.when(F.col("is_click") == 0, F.col("purchase_cents")),
            ignorenulls=True,
        ).over(fwd).alias("next_cents"),
    ).filter(F.col("is_click") == 1)
    gap = _us("next_ts") - _us("ts")
    in_tol = F.col("next_ts").isNotNull() & (gap <= ASOF_FWD_TOL_US)
    return wnd.select(
        "event_id",
        "user_id",
        "click_cents",
        F.when(in_tol, F.col("next_cents")).alias("next_purchase_cents"),
        F.when(in_tol, gap.cast("long")).alias("gap_us"),
    )


@query(
    "q_scd2_history",
    oracle="""
WITH ordered AS (
  SELECT user_id, event_type, ts, event_id,
         lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS prev_type
  FROM events
),
versions AS (
  SELECT user_id, event_type, ts, event_id,
         lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS valid_to
  FROM ordered
  WHERE prev_type IS NULL OR prev_type <> event_type
)
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_versions,
       CAST(sum(CASE WHEN valid_to IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_open,
       CAST(sum(CASE WHEN valid_to IS NOT NULL
                     THEN epoch_us(valid_to) - epoch_us(ts) ELSE 0 END)
            AS BIGINT) AS closed_dur_us,
       min(user_id) AS min_user,
       max(user_id) AS max_user
FROM versions
GROUP BY event_type
ORDER BY event_type
""",
)
def q_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD type-2 history build from a change stream: collapse each
    user's consecutive same-valued rows into versioned validity
    intervals `[valid_from, valid_to)` (open interval = current row).

    This is the lakehouse materialization of exactly the row stream the
    reference emits — its DatabaseChanges protobuf carries per-PK
    UPDATE/CREATE operations that ClickHouse's ReplacingMergeTree
    collapses to latest-wins (reference README.md:9-11; q_latest_per_key
    is that read path). SCD2 is the other half a warehouse needs: keep
    EVERY version with its validity window so point-in-time joins
    ("what was this account's tier when the order shipped?") work.

    Plan shape: change-detect with `lag` then interval-close with
    `lead`, both windows over the SAME (user_id) hash partitioning and
    (ts, event_id) sort — Catalyst plans ONE exchange + one sort and
    runs both window frames over it, so the whole history build costs a
    single shuffle of the change stream. Per-key window state is one
    row; durations are exact BIGINT microseconds (unix_micros /
    epoch_us agree), so the oracle replays bit-for-bit. At 100 TB the
    identical two-pass runs per day-partition of the change feed with
    the open tail carried forward (DEPLOY.md).
    """
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ordered = e.select(
        "user_id",
        "event_type",
        "ts",
        "event_id",
        F.lag("event_type").over(w).alias("prev_type"),
    )
    versions = ordered.filter(
        F.col("prev_type").isNull()
        | (F.col("prev_type") != F.col("event_type"))
    ).select(
        "user_id",
        "event_type",
        "ts",
        F.lead("ts").over(w).alias("valid_to"),
    )
    closed_us = F.when(
        F.col("valid_to").isNotNull(), _us("valid_to") - _us("ts")
    ).otherwise(F.lit(0))
    return (
        versions.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_versions"),
            F.sum(
                F.when(F.col("valid_to").isNull(), 1).otherwise(0)
            ).alias("n_open"),
            F.sum(closed_us).alias("closed_dur_us"),
            F.min("user_id").alias("min_user"),
            F.max("user_id").alias("max_user"),
        )
        .orderBy("event_type")
    )
