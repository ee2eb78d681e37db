"""Catalog/schema discovery (SURVEY.md S9/S10).

The reference discovers its sink schema at startup: tables from
`system.tables` excluding views/system/temporary (ref table_info.rs:244-267)
and columns from `information_schema.columns` ordered alphabetically by
column name (ref table_info.rs:216-242; re-sorted at main.rs:183 — the
alphabetical insert-tuple order is a load-bearing semantic, §2.4).

Here the "catalog" is the fixture directory: table metadata is *derived*
from the live parquet schemas (true dynamic discovery — nothing hardcoded
on the Spark side), while the oracle pins the expected result.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from elric_rs_spark.registry import query
from elric_rs_spark.tables import TABLES, load_table

# Stand-ins for the rows the reference filters OUT of system.tables
# (ref table_info.rs:252-258: engine None / temporary / system db / views).
_EXCLUDED_CATALOG_ROWS = [
    ("system", "tables", "SystemLog", 1),
    ("system", "columns", "SystemLog", 1),
    ("default", "my_view", "View", 0),
    ("default", "tmp_scratch", "Memory", 1),
]


@query(
    "q_catalog_tables",
    oracle="""
SELECT table_schema, table_name
FROM (
  VALUES
    ('default', 'customer',  'MergeTree', 0),
    ('default', 'documents', 'MergeTree', 0),
    ('default', 'embeddings','MergeTree', 0),
    ('default', 'events',    'MergeTree', 0),
    ('default', 'lineitem',  'MergeTree', 0),
    ('default', 'nation',    'MergeTree', 0),
    ('default', 'orders',    'MergeTree', 0),
    ('default', 'part',      'MergeTree', 0),
    ('default', 'region',    'MergeTree', 0),
    ('default', 'supplier',  'MergeTree', 0),
    ('system',  'tables',    'SystemLog', 1),
    ('system',  'columns',   'SystemLog', 1),
    ('default', 'my_view',   'View',      0),
    ('default', 'tmp_scratch','Memory',   1)
) AS t(table_schema, table_name, engine, is_temporary)
WHERE table_schema != 'system'
  AND engine != 'View'
  AND is_temporary = 0
ORDER BY table_name
""",
)
def q_catalog_tables(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S9: enumerate loadable tables, excluding system/view/temporary rows
    exactly as the reference's system.tables query does."""
    rows = [("default", name, "MergeTree", 0) for name in sorted(TABLES)]
    rows += _EXCLUDED_CATALOG_ROWS
    df = spark.createDataFrame(
        rows, "table_schema string, table_name string, engine string, is_temporary int"
    )
    return (
        df.filter(
            (F.col("table_schema") != "system")
            & (F.col("engine") != "View")
            & (F.col("is_temporary") == 0)
        )
        .select("table_schema", "table_name")
        .orderBy("table_name")
    )


@query(
    "q_catalog_columns",
    oracle="""
SELECT table_name, column_name, ordinal
FROM (
  VALUES
    ('lineitem', 'l_discount', 1), ('lineitem', 'l_extendedprice', 2),
    ('lineitem', 'l_linenumber', 3), ('lineitem', 'l_linestatus', 4),
    ('lineitem', 'l_orderkey', 5), ('lineitem', 'l_partkey', 6),
    ('lineitem', 'l_quantity', 7), ('lineitem', 'l_returnflag', 8),
    ('lineitem', 'l_shipdate', 9), ('lineitem', 'l_suppkey', 10),
    ('lineitem', 'l_tax', 11),
    ('orders', 'o_custkey', 1), ('orders', 'o_orderdate', 2),
    ('orders', 'o_orderkey', 3), ('orders', 'o_orderpriority', 4),
    ('orders', 'o_orderstatus', 5), ('orders', 'o_totalprice', 6)
) AS t(table_name, column_name, ordinal)
""",
)
def q_catalog_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S10: per-table column list discovered from the live parquet schema,
    ordered alphabetically by column name with ordinal positions — the
    reference's load-bearing alphabetical insert order (§2.4). The oracle
    pins the expectation; the Spark side derives it dynamically."""
    rows = []
    for table in ("lineitem", "orders"):
        schema = load_table(spark, sf_dir, table).schema
        for i, col_name in enumerate(sorted(f.name for f in schema.fields), start=1):
            rows.append((table, col_name, i))
    return spark.createDataFrame(rows, "table_name string, column_name string, ordinal int")


_PROFILE_COLS = (
    "l_orderkey", "l_partkey", "l_suppkey", "l_linenumber", "l_quantity",
    "l_extendedprice", "l_discount", "l_tax", "l_returnflag",
    "l_linestatus", "l_shipdate",
)

_PROFILE_ORACLE = "\nUNION ALL\n".join(
    f"SELECT '{c}' AS column_name, CAST(count(*) AS BIGINT) AS n_rows, "
    f"CAST(count(*) - count({c}) AS BIGINT) AS n_nulls, "
    f"CAST(count(DISTINCT {c}) AS BIGINT) AS n_distinct FROM lineitem"
    for c in _PROFILE_COLS
)


@query("q_profile", oracle=_PROFILE_ORACLE)
def q_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Table profiling (the ANALYZE / data-quality surface): per-column
    row, null, and exact distinct counts for every lineitem column, as
    one long-format result.

    ONE scan computes all 33 aggregates (vs the oracle's 11 scans —
    DuckDB re-reads per UNION branch); the exact multi-column distinct
    makes Spark expand the input 11x before the aggregate, which is the
    oracle-checkable form. At 100 TB you swap count(DISTINCT) for
    approx_count_distinct and the expand disappears — one pass, one
    HLL sketch per column; the declared contract (long-format profile)
    is unchanged. `stack` unpivots the single wide row row-locally."""
    li = load_table(spark, sf_dir, "lineitem")
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in _PROFILE_COLS:
        aggs.append(F.count(c).alias(f"nn_{c}"))
        aggs.append(F.countDistinct(c).alias(f"nd_{c}"))
    wide = li.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', n_rows, n_rows - nn_{c}, nd_{c}" for c in _PROFILE_COLS
    )
    return wide.selectExpr(
        f"stack({len(_PROFILE_COLS)}, {stack_args}) "
        "AS (column_name, n_rows, n_nulls, n_distinct)"
    )
