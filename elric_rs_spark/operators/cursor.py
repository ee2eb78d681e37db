"""Cursor persistence / recovery semantics (SURVEY.md S6/S7, T9).

The reference persists `Cursor{id, cursor, block_num, block_id}` per flushed
block (ref loader.rs:195-210) and recovers the latest one with
`SELECT ... ORDER BY block_num DESC` taking the first row
(ref main.rs:299-310); insert-latest-wins dedup is delegated to a
ReplacingMergeTree engine (ref README.md:9-11). Both patterns are expressed
here over the `events` fixture: `event_id` plays block_num, `user_id` plays
the cursor id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from elric_rs_spark.registry import query
from elric_rs_spark.tables import load_table


@query(
    "q_topk_cursor",
    oracle="""
SELECT event_id, ts, user_id, event_type
FROM events
ORDER BY event_id DESC
LIMIT 1
""",
)
def q_topk_cursor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S7 cursor recovery: global latest row by ordering key — a sort+limit
    (top-1) that Spark executes as TakeOrdered, never a full sort."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.select("event_id", "ts", "user_id", "event_type")
        .orderBy(F.col("event_id").desc())
        .limit(1)
    )


@query(
    "q_cursor_latest",
    oracle="""
SELECT user_id, event_id AS latest_event_id, ts AS latest_ts
FROM (
  SELECT user_id, event_id, ts,
         row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn
  FROM events
) t
WHERE rn = 1
""",
)
def q_cursor_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S6/T9 insert-latest-wins recovery: per cursor-id, the row with the
    highest block number survives (ReplacingMergeTree semantics,
    ref README.md:9-11). Window top-1 per key; at scale this is one shuffle
    on the key with partial ordering — no global sort."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("event_id").desc())
    return (
        ev.select(
            "user_id",
            F.col("event_id").alias("latest_event_id"),
            F.col("ts").alias("latest_ts"),
            F.row_number().over(w).alias("rn"),
        )
        .filter(F.col("rn") == 1)
        .drop("rn")
    )
