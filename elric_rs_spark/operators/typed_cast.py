"""Typed-cast round-trip query (SURVEY.md T5/T6 — `q_typed_cast`).

Lifts fixture rows into the reference's all-strings map representation,
then runs the engine's typed_cast back to a ClickHouse-style schema. The
oracle is a plain typed SELECT — proving string->typed parity end to end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from elric_rs_spark.cast import typed_cast
from elric_rs_spark.operators.maps import fields_to_map
from elric_rs_spark.registry import query
from elric_rs_spark.tables import load_table

# ClickHouse-style declared schema for the events stand-in table
# (shape mirrors the ERC-20 example at ref main.rs:333-366).
EVENTS_CH_SCHEMA = {
    "event_id": "UInt64",
    "user_id": "Int64",
    "event_type": "String",
    "value": "Float64",
    "ts": "DateTime",
}


@query(
    "q_typed_cast",
    oracle="""
SELECT
  CAST(event_id AS BIGINT) AS event_id,
  event_type,
  CAST(floor(epoch(ts)) AS BIGINT) AS ts_epoch,
  user_id,
  round(value, 6) AS value
FROM events
""",
)
def q_typed_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T5: row -> all-strings map -> typed columns (alphabetical order).

    The cast pipeline itself exercises the full reference type surface
    (UInt64 -> Decimal(20,0), RFC3339 string -> DateTime); the RETURNED
    projection re-normalizes to hash-robust primitives (BIGINT event_id,
    epoch-seconds ts) so the driver's value hash compares numbers, not
    representations. Decimal/FixedString rendering stays covered by
    tests/test_cast.py."""
    ev = load_table(spark, sf_dir, "events")
    m = fields_to_map(
        ("event_id", F.col("event_id")),
        ("user_id", F.col("user_id")),
        ("event_type", F.col("event_type")),
        ("value", F.col("value")),
        # RFC3339 form, as the upstream change stream would carry it
        ("ts", F.date_format("ts", "yyyy-MM-dd'T'HH:mm:ss.SSSSSS")),
    )
    mapped = ev.select(m.alias("fields"))
    typed = typed_cast(mapped, "fields", EVENTS_CH_SCHEMA, mode="strict")
    # round the float that went through a string round-trip
    return typed.select(
        F.col("event_id").cast("long").alias("event_id"),
        "event_type",
        F.unix_timestamp("ts").alias("ts_epoch"),
        "user_id",
        F.round("value", 6).alias("value"),
    )


@query(
    "q_cast_quarantine",
    oracle="""
SELECT
  event_id,
  'event_type' AS malformed_col
FROM events
WHERE try_cast(event_type AS INTEGER) IS NULL AND event_type IS NOT NULL
""",
)
def q_cast_quarantine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The permissive-mode quarantine path (cast.typed_cast_split) as a
    checkable query: declare event_type as UInt32 — every textual value is
    malformed — and return the quarantined rows with the offending column
    name. At 100 TB this split is how one bad row avoids killing a 6-hour
    job without silently vanishing (the reference instead panics,
    ref table_info.rs:85-153)."""
    from elric_rs_spark.cast import typed_cast_split

    ev = load_table(spark, sf_dir, "events")
    m = fields_to_map(
        ("event_id", F.col("event_id")),
        ("event_type", F.col("event_type")),
    )
    mapped = ev.select(F.col("event_id").alias("event_id"), m.alias("fields"))
    good, quar = typed_cast_split(
        mapped, "fields", {"event_id": "UInt64", "event_type": "UInt32"}
    )
    return quar.select(
        "event_id", F.explode("_malformed_cols").alias("malformed_col")
    )
