"""Scalar function surface (SURVEY.md X12): string / date / math / JSON.

All built-in `pyspark.sql.functions` — JVM expressions inside whole-stage
codegen, no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from elric_rs_spark.registry import query
from elric_rs_spark.tables import load_table


@query(
    "q_scalar_string",
    oracle="""
SELECT
  p_partkey,
  upper(p_brand) AS brand_upper,
  substring(p_name, 1, 8) AS name_prefix,
  concat_ws('|', p_brand, p_type) AS brand_type,
  length(p_name) AS name_len,
  replace(p_type, ' ', '_') AS type_snake,
  CASE WHEN p_name LIKE '%el%' THEN 1 ELSE 0 END AS has_el
FROM part
""",
)
def q_scalar_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String functions: upper/substring/concat_ws/length/replace/like."""
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_brand").alias("brand_upper"),
        F.substring("p_name", 1, 8).alias("name_prefix"),
        F.concat_ws("|", "p_brand", "p_type").alias("brand_type"),
        F.length("p_name").alias("name_len"),
        F.replace(F.col("p_type"), F.lit(" "), F.lit("_")).alias("type_snake"),
        F.when(F.col("p_name").like("%el%"), 1).otherwise(0).alias("has_el"),
    )


@query(
    "q_scalar_date",
    oracle="""
SELECT
  o_orderkey,
  CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS order_month,
  year(o_orderdate) AS order_year,
  month(o_orderdate) AS order_month_num,
  dayofweek(o_orderdate) AS order_dow,
  date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS days_since_epoch0,
  CAST(o_orderdate + INTERVAL 90 DAY AS TIMESTAMP) AS due_date
FROM orders
""",
)
def q_scalar_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time functions: trunc/extract/diff/add.

    Note: DuckDB dayofweek() is 0=Sunday..6; Spark dayofweek() is
    1=Sunday..7 — bridged with -1 on the Spark side.
    """
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.date_trunc("month", "o_orderdate").alias("order_month"),
        F.year("o_orderdate").alias("order_year"),
        F.month("o_orderdate").alias("order_month_num"),
        (F.dayofweek("o_orderdate") - F.lit(1)).alias("order_dow"),
        F.datediff(F.to_date("o_orderdate"), F.lit("1995-01-01").cast("date")).alias(
            "days_since_epoch0"
        ),
        (F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")).alias("due_date"),
    )


@query(
    "q_scalar_math",
    oracle="""
SELECT
  l_orderkey,
  l_linenumber,
  round(sqrt(l_extendedprice), 6) AS price_sqrt,
  round(ln(l_extendedprice + 1), 6) AS price_ln,
  round(pow(l_quantity, 2), 2) AS qty_sq,
  CAST(floor(l_extendedprice / 1000) AS BIGINT) AS price_bucket,
  abs(l_discount - 0.05) > 0.03 AS extreme_discount,
  l_quantity % 7 AS qty_mod7
FROM lineitem
""",
)
def q_scalar_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math functions: sqrt/ln/pow/floor/abs/mod."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.sqrt("l_extendedprice"), 6).alias("price_sqrt"),
        F.round(F.log(F.col("l_extendedprice") + 1), 6).alias("price_ln"),
        F.round(F.pow("l_quantity", F.lit(2)), 2).alias("qty_sq"),
        F.floor(F.col("l_extendedprice") / 1000).alias("price_bucket"),
        (F.abs(F.col("l_discount") - 0.05) > 0.03).alias("extreme_discount"),
        (F.col("l_quantity") % 7).alias("qty_mod7"),
    )


@query(
    "q_scalar_json",
    oracle="""
SELECT
  event_type,
  count(*) AS n_high,
  CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k
FROM events
WHERE CAST(json_extract_string(props, '$.k') AS BIGINT) > 50
GROUP BY event_type
""",
)
def q_scalar_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON extraction (X12): filter + aggregate on a JSON field."""
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return (
        ev.filter(k > 50)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_high"),
            F.sum(k).alias("sum_k"),
        )
    )


@query(
    "q_decode_props",
    oracle="""
SELECT
  event_id,
  event_type,
  CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val
FROM events
""",
)
def q_decode_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Payload decode (T1 stand-in): the reference protobuf-decodes each
    block's `Any` payload into typed changes (ref loader.rs:128-129); here
    the JSON `props` column plays the opaque payload and `from_json`
    the decoder."""
    from pyspark.sql.types import LongType, StructField, StructType

    ev = load_table(spark, sf_dir, "events")
    schema = StructType([StructField("k", LongType())])
    return ev.select(
        "event_id",
        "event_type",
        F.from_json("props", schema).getField("k").alias("k_val"),
    )


@query(
    "q_explode_pos",
    oracle="""
SELECT doc_id, unnest(range(len(words))) AS pos, unnest(words) AS word
FROM (
  SELECT doc_id, string_split(text, ' ') AS words
  FROM documents WHERE doc_id < 20
)
""",
)
def q_explode_pos(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Positional explode (lateral-view shape): one row per (doc, word
    position). posexplode keeps the ordinal that a plain explode loses —
    the shape every tokenize/chunk pipeline needs; generator output stays
    inside codegen (no UDF)."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 20)
    return d.select(
        "doc_id",
        F.posexplode(F.split("text", " ")).alias("pos", "word"),
    ).select("doc_id", F.col("pos").cast("long").alias("pos"), "word")


@query(
    "q_scalar_regex",
    oracle="""
SELECT event_type,
       CAST(count(CASE WHEN regexp_matches(props, '"k":\\s*[0-9]*[02468]\\b')
                  THEN 1 END) AS BIGINT) AS n_even_k,
       min(regexp_extract(props, '[0-9]+')) AS first_num_min,
       max(regexp_extract(props, '[0-9]+')) AS first_num_max
FROM events
GROUP BY event_type
""",
)
def q_scalar_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex function surface (X12): match-count + extract aggregation.

    Patterns stay inside the POSIX-common subset (character classes,
    quantifiers, word boundary) that Java regex (Spark) and RE2-style
    engines (DuckDB) interpret identically — engine-portable regex means
    no backrefs, no lookaround, no engine-specific classes. rlike/
    regexp_extract are codegen'd JVM calls, embarrassingly parallel."""
    ev = load_table(spark, sf_dir, "events")
    even_k = F.col("props").rlike('"k":\\s*[0-9]*[02468]\\b')
    first_num = F.regexp_extract("props", "[0-9]+", 0)
    return ev.groupBy("event_type").agg(
        F.count(F.when(even_k, 1)).alias("n_even_k"),
        F.min(first_num).alias("first_num_min"),
        F.max(first_num).alias("first_num_max"),
    )


@query(
    "q_scalar_array",
    oracle="""
WITH t AS (
  SELECT doc_id, string_split(trim(text), ' ') AS toks
  FROM documents WHERE doc_id < 50
)
SELECT doc_id,
       CAST(len(toks) AS INT) AS n_toks,
       array_to_string(list_sort(toks[1:3]), '|') AS first3_sorted,
       CAST(len(list_distinct(toks)) AS INT) AS n_distinct,
       CAST(len(list_filter(toks, x -> length(x) > 4)) AS INT) AS n_long,
       array_to_string(list_reverse(toks)[1:2], '|') AS last2_rev
FROM t
""",
)
def q_scalar_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array/higher-order function surface (X12): slice, sort, distinct,
    filter-lambda, reverse — the list-manipulation core, all Catalyst
    built-ins evaluated row-locally (array columns never shuffle as
    join keys here; string renderings keep the oracle comparison scalar
    and representation-stable)."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
    toks = F.split(F.trim(F.col("text")), " ")
    return d.select(
        "doc_id",
        F.size(toks).alias("n_toks"),
        F.array_join(F.array_sort(F.slice(toks, 1, 3)), "|").alias("first3_sorted"),
        F.size(F.array_distinct(toks)).alias("n_distinct"),
        F.size(F.filter(toks, lambda x: F.length(x) > 4)).alias("n_long"),
        F.array_join(F.slice(F.reverse(toks), 1, 2), "|").alias("last2_rev"),
    )


@query(
    "q_scalar_bitwise",
    oracle="""
SELECT event_id,
       CAST(event_id & 255 AS BIGINT) AS low_byte,
       CAST(xor(event_id, 2863311530) AS BIGINT) AS xored,
       CAST(event_id << 2 AS BIGINT) AS shifted,
       CAST(bit_count(CAST(event_id AS BIGINT)) AS BIGINT) AS popcount
FROM events
WHERE event_id < 1000
""",
)
def q_scalar_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise scalar surface (X12 extension): AND / XOR / shift /
    popcount — the primitives under hash partitioning, bloom probes, and
    bitmap indexes. All codegen'd JVM intrinsics; the pushed event_id
    predicate reaches the scan. Operands stay far below 2^62 so shifts
    cannot overflow under ANSI."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("event_id") < 1000)
    return ev.select(
        "event_id",
        F.col("event_id").bitwiseAND(F.lit(255)).cast("long").alias("low_byte"),
        F.col("event_id").bitwiseXOR(F.lit(2863311530)).cast("long").alias("xored"),
        F.shiftleft(F.col("event_id"), 2).cast("long").alias("shifted"),
        F.bit_count(F.col("event_id").cast("long")).cast("long").alias("popcount"),
    )


@query(
    "q_scalar_null",
    oracle="""
SELECT c_custkey,
       coalesce(nullif(c_mktsegment, 'MACHINERY'), 'OTHER') AS seg_or_other,
       CASE WHEN c_acctbal < 0 THEN NULL
            ELSE CAST(round(c_acctbal * 100) AS BIGINT) END AS pos_cents,
       coalesce(CASE WHEN c_acctbal < 0 THEN NULL
                     ELSE CAST(round(c_acctbal * 100) AS BIGINT) END,
                -1) AS pos_cents_filled,
       CAST(c_acctbal IS NULL OR c_acctbal < 0 AS BOOLEAN) AS flagged
FROM customer
""",
)
def q_scalar_null(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL-handling scalar surface (X12 extension): nullif / coalesce /
    CASE-to-NULL / boolean null-safe predicates — the semantics that
    silently corrupt pipelines when an engine disagrees (SQL three-valued
    logic). All codegen'd; NULL propagation is identical across engines
    by the standard, which this query pins."""
    c = load_table(spark, sf_dir, "customer")
    cents = F.round(F.col("c_acctbal") * 100).cast("long")
    pos = F.when(F.col("c_acctbal") < 0, F.lit(None)).otherwise(cents)
    return c.select(
        "c_custkey",
        F.coalesce(
            F.nullif(F.col("c_mktsegment"), F.lit("MACHINERY")), F.lit("OTHER")
        ).alias("seg_or_other"),
        pos.alias("pos_cents"),
        F.coalesce(pos, F.lit(-1)).alias("pos_cents_filled"),
        (F.col("c_acctbal").isNull() | (F.col("c_acctbal") < 0)).alias("flagged"),
    )
