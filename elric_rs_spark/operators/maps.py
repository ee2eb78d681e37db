"""Field-map projection and PK merge (SURVEY.md T2/T3).

The reference folds each TableChange's `Vec<Field{name,new_value}>` into a
string->string map (convert_field_to_hash, ref main.rs:291-297, dropping
old_value) and merges a composite primary key into the same map while
ignoring a single Pk (ref loader.rs:143-149). Here those semantics run as
pure Spark map expressions: rows are lifted into the all-strings map form,
transformed, and projected back out — the oracle checks the round-trip.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from elric_rs_spark.registry import query
from elric_rs_spark.tables import load_table


def fields_to_map(*name_value_pairs) -> F.Column:
    """`Vec<Field{name, new_value}>` -> map, dropping old_value
    (ref main.rs:291-297). Pairs are (literal-name, column) tuples."""
    entries = [
        F.struct(F.lit(name).alias("name"), value.cast("string").alias("new_value"))
        for name, value in name_value_pairs
    ]
    return F.map_from_entries(F.array(*entries))


# Doubles are lifted into the string map as exact integer cents, NOT via a
# bare string cast: Spark renders doubles with Java Double.toString
# ('1.0E7') and DuckDB with '%g'-style ('10000000.0'), so engine-default
# rendering is data-dependent oracle fragility (ADVICE r03) — it only
# happened to agree on the fixture's [0.01, 490.02] range.
def _cents_str(col) -> F.Column:
    return F.round(col * 100).cast("long")


@query(
    "q_map_project",
    oracle="""
SELECT
  event_id,
  event_type,
  CAST(CAST(round(value * 100) AS BIGINT) AS VARCHAR) AS value_str
FROM events
""",
)
def q_map_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T2: lift row fields into the all-strings map, then project entries
    back out. Oracle = identity, proving the map round-trip is lossless.
    The double lifts as deterministic integer-cent strings (see
    _cents_str)."""
    ev = load_table(spark, sf_dir, "events")
    m = fields_to_map(
        ("event_type", F.col("event_type")),
        ("value", _cents_str(F.col("value"))),
    )
    return ev.select(
        "event_id",
        m.getItem("event_type").alias("event_type"),
        m.getItem("value").alias("value_str"),
    )


@query(
    "q_map_concat",
    oracle="""
SELECT
  event_id,
  event_type,
  CAST(event_id AS VARCHAR) AS pk_event_id,
  CAST(user_id AS VARCHAR) AS pk_user_id
FROM events
""",
)
def q_map_concat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T3: merge a composite-PK map into the field map (ref
    loader.rs:143-146); a single scalar Pk would be ignored
    (ref loader.rs:147). HashMap::extend is last-wins on duplicate keys;
    instead of flipping the session-wide mapKeyDedupPolicy conf (a
    cross-query side effect), drop pk-shadowed field keys with map_filter
    before map_concat — policy-independent, same reference semantics
    (the pattern streaming/pipeline.py decode_changes uses)."""
    ev = load_table(spark, sf_dir, "events")
    fields = fields_to_map(("event_type", F.col("event_type")))
    composite_pk = fields_to_map(
        ("pk_event_id", F.col("event_id")),
        ("pk_user_id", F.col("user_id")),
    )
    fields_clean = F.map_filter(
        fields, lambda k, _v: ~F.map_contains_key(composite_pk, k)
    )
    merged = F.map_concat(fields_clean, composite_pk)
    return ev.select(
        "event_id",
        merged.getItem("event_type").alias("event_type"),
        merged.getItem("pk_event_id").alias("pk_event_id"),
        merged.getItem("pk_user_id").alias("pk_user_id"),
    )


@query(
    "q_map_explode",
    oracle="""
WITH entries AS (
  SELECT 'event_type' AS key, event_type AS val FROM events
  UNION ALL
  SELECT 'value', CAST(CAST(round(value * 100) AS BIGINT) AS VARCHAR) FROM events
  UNION ALL
  SELECT 'user', CAST(user_id AS VARCHAR) FROM events
)
SELECT key,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(count(DISTINCT val) AS BIGINT) AS n_values,
       min(val) AS min_val,
       max(val) AS max_val
FROM entries
GROUP BY key
""",
)
def q_map_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map-entry explosion (T2 surface widening): the all-strings field
    map is fanned out into (key, value) entry rows — the inverse of
    `fields_to_map` — then profiled per key. This is the schemaless-
    ingest introspection query ("what fields arrive, with how many
    distinct values?") a dynamic-schema loader runs before declaring
    sink DDL (ref table_info.rs discovers the inverse direction).
    explode(map) is a codegen generator — rows fan out 3× with no
    shuffle until the per-key aggregate; key cardinality (= field
    count) bounds the final state."""
    ev = load_table(spark, sf_dir, "events")
    m = fields_to_map(
        ("event_type", F.col("event_type")),
        ("value", _cents_str(F.col("value"))),
        ("user", F.col("user_id")),
    )
    entries = ev.select(F.explode(m).alias("key", "val"))
    return entries.groupBy("key").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct("val").alias("n_values"),
        F.min("val").alias("min_val"),
        F.max("val").alias("max_val"),
    )
