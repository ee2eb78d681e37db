"""Per-table fan-out sink + cursor checkpointing (SURVEY.md S5/S6/T9).

Reference semantics: one streaming inserter per target table, rows routed
by table name (ref loader.rs:49-60, 231-247); after each flushed block the
cursor row {id, cursor, block_num, block_id} is written (ref
loader.rs:195-210) — data first, cursor second, so a crash can repeat a
block but never lose data that the cursor claims is done (at-least-once).

Spark form: `writeStream.foreachBatch(...)`. Inside a batch:
1. decode + typed-cast the payload,
2. split by table and append each group to its sink,
3. write the max cursor per stream to the cursors sink.
The (query_id, epoch_id) pair makes retried batches idempotent when the
sink is a ReplacingMergeTree / MERGE-capable target; for the parquet test
sink we tag rows with epoch_id so replays are detectable.

The ClickHouse-specific wiring (JDBC url, async_insert=1,
wait_for_async_insert=0, LZ4) is config in `clickhouse_writer_options`;
with no live ClickHouse in this container, the JDBC path is exercised only
through its options-dict unit test, and parquet stands in everywhere else.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def clickhouse_writer_options(url: str) -> dict[str, str]:
    """Writer options mirroring the reference's insert tuning
    (ref loader.rs:56-58: 15s period; Cargo.toml:21: LZ4)."""
    return {
        "url": url,
        "driver": "com.clickhouse.jdbc.ClickHouseDriver",
        "async_insert": "1",
        "wait_for_async_insert": "0",
        "compress": "lz4",
        "batchsize": "100000",
        "isolationLevel": "NONE",
    }


@dataclass
class PerTableParquetSink:
    """Test sink: routes rows by `table` column into per-table parquet dirs
    and appends the cursor row per epoch — the reference's topology with
    parquet standing in for ClickHouse."""

    base_dir: str
    tables_written: set = field(default_factory=set)

    def write_batch(self, batch_df: DataFrame, epoch_id: int) -> None:
        batch_df = batch_df.withColumn("epoch_id", F.lit(epoch_id)).cache()
        try:
            # T4 split-by-table fan-out (ref loader.rs:231-247)
            tables = [r[0] for r in batch_df.select("table").distinct().collect()]
            for t in sorted(tables):
                (
                    batch_df.filter(F.col("table") == t)
                    .drop("table")
                    .write.mode("append")
                    .parquet(f"{self.base_dir}/data/{t}")
                )
                self.tables_written.add(t)
            # S6 cursor write AFTER data (ref loader.rs:119-122 ordering)
            cursor = (
                batch_df.groupBy("stream_id")
                .agg(
                    F.max_by("cursor", "block_num").alias("cursor"),
                    F.max("block_num").alias("block_num"),
                    F.max_by("block_id", "block_num").alias("block_id"),
                )
                .withColumn("epoch_id", F.lit(epoch_id))
            )
            cursor.write.mode("append").parquet(f"{self.base_dir}/cursors")
        finally:
            batch_df.unpersist()


def read_exactly_once(
    spark, base_dir: str, table: str, pk_cols: list[str] | tuple[str, ...]
) -> DataFrame:
    """Exactly-once READ view over the at-least-once sink (SURVEY.md §7
    risk 2). foreachBatch can replay a completed epoch after a crash; the
    sink appends the same rows again tagged with the SAME epoch_id. The
    reference delegates replay collapse to ClickHouse ReplacingMergeTree
    ordered by the primary key (ref README.md:9-11); the parquet analogue
    is dedup-on-read keyed by (epoch_id, block_num, *pk): replayed rows
    tie on the full key, while distinct changes inside one block differ in
    their PK columns. At scale this is a window-free dropDuplicates — one
    hash aggregate on a uniform composite key.

    pk_cols is REQUIRED (pass the table's ordering key): deduping on
    (epoch_id, block_num) alone would collapse distinct same-block
    changes. A table with no PK and no possibility of two identical
    legitimate rows may pass all non-key columns explicitly."""
    if not pk_cols:
        raise ValueError(
            "read_exactly_once needs the table's pk/ordering columns — "
            "deduping on (epoch_id, block_num) alone collapses distinct "
            "changes within a block"
        )
    df = spark.read.parquet(f"{base_dir}/data/{table}")
    return df.dropDuplicates(["epoch_id", "block_num", *pk_cols])


def load_persisted_cursor(spark, base_dir: str, stream_id: str) -> str | None:
    """S7 cursor recovery (ref main.rs:299-310): latest cursor by block_num."""
    try:
        df = spark.read.parquet(f"{base_dir}/cursors")
    except Exception:
        return None
    rows = (
        df.filter(F.col("stream_id") == stream_id)
        .orderBy(F.col("block_num").desc())
        .limit(1)
        .collect()
    )
    return rows[0].cursor if rows else None
