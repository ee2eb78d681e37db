"""Fixture table loading.

The driver's synthetic star schema (TESTDATA.md): TPC-H-ish tables plus an
`events` stream stand-in, `documents` and `embeddings` for the LLM-pipeline
operators. Loaded as plain parquet scans so Catalyst gets predicate
pushdown + column pruning for free.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


_NS_CACHE_DIR = "/root/repo/.scratch/us_parquet_cache"


def _microsecond_copy(path: str) -> str:
    """Some fixture files carry TIMESTAMP(NANOS) columns, which Spark's
    parquet reader rejects outright (PARQUET_TYPE_ILLEGAL) unless the
    session was *created* with the legacy nanosAsLong conf — not an option
    when the caller owns the session. Convert ns -> us once via pyarrow
    into a content-addressed cache and read that. Truncation matches what
    DuckDB/Python expose (microseconds)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    st = os.stat(path)
    key = f"{path.replace('/', '_')}_{st.st_mtime_ns}_{st.st_size}"
    out = os.path.join(_NS_CACHE_DIR, key)
    done = os.path.join(out, "_SUCCESS")
    if not os.path.exists(done):
        os.makedirs(out, exist_ok=True)
        table = pq.read_table(path)
        fields = []
        for f in table.schema:
            if pa.types.is_timestamp(f.type) and f.type.unit == "ns":
                fields.append(pa.field(f.name, pa.timestamp("us", tz=f.type.tz)))
            else:
                fields.append(f)
        table = table.cast(pa.schema(fields), safe=False)
        pq.write_table(table, os.path.join(out, "part-0.parquet"))
        open(done, "w").close()
    return out


def _has_nanos(path: str) -> bool:
    import pyarrow.parquet as pq

    schema = pq.read_schema(path)
    import pyarrow as pa

    return any(
        pa.types.is_timestamp(f.type) and f.type.unit == "ns" for f in schema
    )


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    path = f"{sf_dir}/{name}.parquet"
    if _has_nanos(path):
        path = _microsecond_copy(path)
    return spark.read.parquet(path)


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Register every fixture table as a temp view (for spark.sql paths)."""
    dfs = load_tables(spark, sf_dir)
    for name, df in dfs.items():
        df.createOrReplaceTempView(name)
    return dfs
