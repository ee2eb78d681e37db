"""Local replica of the driver's DuckDB-oracle correctness gate.

Runs each Spark query and its oracle SQL on the same parquet tables and
compares row count, column names, and order-insensitive values. Values
are normalized (floats kept exact — both sides round explicitly in-query;
timestamps to naive datetime; Decimal to str) so any driver-side hashing
scheme built on the raw values will agree when this comparator does.
"""

from __future__ import annotations

import datetime
import math
from decimal import Decimal

import duckdb

from elric_rs_spark.tables import TABLES


def hash_risky_columns(spark_df) -> list[str]:
    """Columns whose RETURNED type is hash-fragile under a string-hashing
    driver comparator, even when values are semantically identical.

    Round-1 lesson (VERDICT r01 "What's wrong" #1): q_typed_cast returned
    DECIMAL(20,0) — every row repr-identical between Spark and DuckDB
    locally, yet the driver's value hash differed, because decimal/float32
    rendering is representation-dependent across the two clients' pandas
    conversions. Queries must re-normalize such columns to
    BIGINT/DOUBLE/STRING in the returned projection; the cast fidelity
    itself belongs in pytest assertions.

    Round-3 lesson (VERDICT r03 "What's wrong" #1): ArrayType/MapType
    output columns crash the driver's pandas canonicalizer outright
    (`sort_values` on a list column raises `TypeError: unhashable type`).
    q_inverted_index and q_dedup_clusters both ERR'd on this. Queries
    must array_join such columns to a delimiter-string.
    """
    from pyspark.sql import types as T

    risky = []
    for f in spark_df.schema.fields:
        if isinstance(f.dataType, (T.DecimalType, T.FloatType)):
            risky.append(f"{f.name}:{f.dataType.simpleString()}")
        elif isinstance(f.dataType, (T.ArrayType, T.MapType, T.StructType)):
            risky.append(f"{f.name}:{f.dataType.simpleString()} (unhashable)")
    return risky


def oracle_risky_types(sql: str, sf_dir: str) -> list[str]:
    """DuckDB-side output types that are hash-fragile under the driver.

    Round-2 lesson (VERDICT r02 "What's wrong" #1): DuckDB widens
    sum(BIGINT) to HUGEINT (INT128). fetchall() yields plain Python ints,
    so value comparison passes locally — but the driver's hasher renders
    HUGEINT differently from Spark's int64 and the hash fails. The
    widening is only visible on the relation's .types, never in the
    fetched values; oracles must CAST(sum(...) AS BIGINT). Same story for
    DECIMAL and FLOAT (float32) outputs.
    """
    con = duckdb.connect()
    try:
        for t in TABLES:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
            )
        rel = con.sql(sql)
        risky = []
        for name, dtype in zip(rel.columns, rel.types):
            ds = str(dtype).upper()
            if ds in ("HUGEINT", "UHUGEINT", "FLOAT") or ds.startswith("DECIMAL"):
                risky.append(f"{name}:{ds}")
        return risky
    finally:
        con.close()


def run_oracle(sql: str, sf_dir: str):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    cur = con.execute(sql)
    cols = [d[0] for d in cur.description]
    rows = cur.fetchall()
    con.close()
    return cols, rows


def _norm_val(v):
    if v is None:
        return None
    if isinstance(v, Decimal):
        return str(v.normalize())
    if isinstance(v, bool):
        return bool(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == 0.0 and math.copysign(1.0, v) < 0:
            return "-0.0"  # distinct from 0.0 under any string hash
        return v
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_norm_val(x) for x in v)
    if isinstance(v, (bytes, bytearray)):
        return bytes(v).hex()
    return v


def normalize(cols: list[str], rows: list[tuple]):
    """Sort columns by name (driver behavior), then rows."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    sorted_cols = [cols[i] for i in order]
    out = sorted(
        (tuple(_norm_val(r[i]) for i in order) for r in rows), key=repr
    )
    return sorted_cols, out


def compare(name: str, spark_df, oracle_sql: str, sf_dir: str) -> list[str]:
    """Return list of mismatch descriptions (empty = pass)."""
    problems: list[str] = []
    risky = hash_risky_columns(spark_df)
    if risky:
        problems.append(
            f"{name}: hash-risky output types {risky} — re-normalize to "
            "BIGINT/DOUBLE/STRING in the returned projection"
        )
    o_risky = oracle_risky_types(oracle_sql, sf_dir)
    if o_risky:
        problems.append(
            f"{name}: hash-risky ORACLE output types {o_risky} — wrap the "
            "aggregate in CAST(... AS BIGINT/DOUBLE) in the oracle SQL "
            "(DuckDB widens sum(BIGINT) to HUGEINT; invisible in fetchall)"
        )
    s_cols = spark_df.columns
    s_rows = [tuple(r) for r in spark_df.collect()]
    o_cols, o_rows = run_oracle(oracle_sql, sf_dir)

    if sorted(s_cols) != sorted(o_cols):
        problems.append(f"{name}: columns differ spark={sorted(s_cols)} oracle={sorted(o_cols)}")
        return problems
    if len(s_rows) != len(o_rows):
        problems.append(f"{name}: row count spark={len(s_rows)} oracle={len(o_rows)}")

    _, sn = normalize(s_cols, s_rows)
    _, on = normalize(o_cols, o_rows)
    if sn != on:
        diff_count = 0
        for a, b in zip(sn, on):
            if a != b:
                diff_count += 1
                if diff_count <= 3:
                    problems.append(f"{name}: row diff\n  spark={a}\n  oracle={b}")
        if len(sn) != len(on):
            problems.append(f"{name}: normalized length {len(sn)} vs {len(on)}")
        elif diff_count > 3:
            problems.append(f"{name}: {diff_count} differing rows total")
        elif diff_count == 0 and sn != on:
            problems.append(f"{name}: ordering anomaly")
    return problems
