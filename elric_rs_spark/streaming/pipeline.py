"""The full reference topology as ONE Structured Streaming pipeline
(SURVEY.md §3 lifecycle): block stream -> finality buffer (T7/T8) ->
change-set decode (T1) -> field-map + composite-PK merge (T2/T3) ->
split-by-table (T4) -> typed cast in alphabetical column order (T5/T6) ->
per-table sink + cursor checkpoint, data first (S5/S6/T9).

Two decode paths produce the same (table, fields, pk) intermediate and
share the merge/cast/sink stages:
- `decode_changes` — JSON stand-in payloads (`[{"table": t, "fields":
  {..}, "pk": {..}}, ...]`), pure Catalyst via `from_json`;
- `decode_changes_protobuf` — real `DatabaseChanges` wire bytes
  (base64 in the payload column), decoded by the pure-Python wire
  reader in functions/protowire.py inside an Arrow-batched
  `mapInPandas` kernel — the faithful equivalent of
  `DatabaseChanges::decode` (ref loader.rs:128-129) with no protobuf
  toolchain dependency.

Semantic gotchas preserved (SURVEY.md §2.4):
- composite PK merged into the field map, single PK ignored
  (ref loader.rs:143-149) — a single-entry pk map is assumed to already
  be among the fields;
- operation kind never inspected: append-only sink (ref loader.rs:140-156);
- alphabetical insert column order (ref main.rs:183, table_info.rs:204-208);
- cursor written AFTER the block's data (ref loader.rs:111-125).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from elric_rs_spark.cast import typed_cast
from elric_rs_spark.streaming.finality import apply_finality_stateful

CHANGES_JSON_SCHEMA = (
    "array<struct<table: string, fields: map<string,string>, "
    "pk: map<string,string>>>"
)


def _merged_row_map(fields, pk) -> F.Column:
    """T3: single PK ignored / composite merged (ref loader.rs:143-149).
    HashMap::extend is LAST-wins on duplicate keys; Spark's map_concat
    default policy is EXCEPTION, so drop pk-shadowed field keys first —
    policy-independent, exact reference semantics."""
    fields_clean = F.map_filter(fields, lambda k, v: ~F.map_contains_key(pk, k))
    return F.when(
        pk.isNull() | (F.size(F.map_keys(pk)) <= 1), fields
    ).otherwise(F.map_concat(fields_clean, pk))


def decode_changes(block_df: DataFrame, mode: str = "strict") -> DataFrame:
    """T1+T2+T3: payload -> one row per table-change with the merged
    string->string field map. Pure Catalyst (from_json + explode +
    map_concat) — whole-stage codegen, no Python.

    Malformed-payload policy (the reference PANICS on a decode failure,
    loader.rs:128-131 `expect`): mode='strict' raises on the first
    non-null payload that fails to parse — fail-fast reference parity;
    mode='permissive' drops malformed rows (use `decode_errors` to
    quarantine them for inspection, the same split discipline as the
    typed-cast quarantine)."""
    parsed = F.from_json("payload", CHANGES_JSON_SCHEMA)
    if mode == "strict":
        # the guard must live INSIDE a consumed expression — a separate
        # guard column would be pruned by Catalyst before it evaluates
        # raise_error in the matched branch, the PARSED value in the
        # otherwise — one from_json per row, not a parse-check-reparse
        parsed = F.when(
            F.col("payload").isNotNull() & parsed.isNull(),
            F.raise_error(
                F.concat(
                    F.lit("malformed change payload at block "),
                    F.col("block_num").cast("string"),
                )
            ).cast(CHANGES_JSON_SCHEMA),
        ).otherwise(parsed)
    changes = block_df.select(
        "stream_id",
        "block_num",
        "block_id",
        "cursor",
        F.explode(parsed).alias("c"),
    )
    merged = _merged_row_map(F.col("c.fields"), F.col("c.pk"))
    return changes.select(
        "stream_id",
        "block_num",
        "block_id",
        "cursor",
        F.col("c.table").alias("table"),
        merged.alias("row_map"),
    )


def decode_errors(block_df: DataFrame) -> DataFrame:
    """The quarantine half of mode='permissive': rows whose non-null
    payload failed to parse, with full provenance (stream/block/cursor)
    — same split discipline as cast.py's quarantine (T5)."""
    parsed = F.from_json("payload", CHANGES_JSON_SCHEMA)
    return block_df.filter(F.col("payload").isNotNull() & parsed.isNull()).select(
        "stream_id", "block_num", "block_id", "cursor", "payload"
    )


_PROTO_CHANGES_SCHEMA = (
    "stream_id string, block_num long, block_id string, cursor string, "
    "table string, fields map<string,string>, pk map<string,string>"
)


def decode_changes_protobuf(block_df: DataFrame) -> DataFrame:
    """T1 on the real wire format: payload = base64 `DatabaseChanges`
    protobuf bytes, decoded by functions/protowire.py in one Arrow-batched
    mapInPandas pass (the sanctioned Python path — batch transfer, no
    per-row pickling). Emits the same (table, fields, pk) intermediate as
    the JSON path, then the SAME Catalyst merge stage, so pk semantics
    cannot drift between decoders."""
    import base64

    from elric_rs_spark.functions.protowire import table_change_rows

    def _decode(batches):
        for pdf in batches:
            out = {k: [] for k in (
                "stream_id", "block_num", "block_id", "cursor",
                "table", "fields", "pk",
            )}
            for row in pdf.itertuples(index=False):
                raw = base64.b64decode(row.payload) if row.payload else b""
                for tc in table_change_rows(raw):
                    out["stream_id"].append(row.stream_id)
                    out["block_num"].append(row.block_num)
                    out["block_id"].append(row.block_id)
                    out["cursor"].append(row.cursor)
                    out["table"].append(tc["table"])
                    out["fields"].append(tc["fields"])
                    out["pk"].append(tc["pk"])
            import pandas as pd

            yield pd.DataFrame(out)

    cols = ["stream_id", "block_num", "block_id", "cursor", "payload"]
    changes = block_df.select(*cols).mapInPandas(_decode, _PROTO_CHANGES_SCHEMA)
    merged = _merged_row_map(F.col("fields"), F.col("pk"))
    return changes.select(
        "stream_id",
        "block_num",
        "block_id",
        "cursor",
        "table",
        merged.alias("row_map"),
    )


def dedup_block_stream(stream: DataFrame, within: str = "1 hour") -> DataFrame:
    """Collapse at-least-once upstream deliveries pre-sink: a reconnect
    resumes from the last cursor and can re-deliver blocks already landed
    (the reference tolerates this by delegating dedup to ClickHouse
    ReplacingMergeTree, README.md:9-11). Streaming-native form:
    `dropDuplicatesWithinWatermark` keyed by (stream_id, block_num,
    block_id) with an event-time watermark on block_ts — state is bounded
    by the watermark horizon instead of growing forever, which is the
    only dedup shape that survives an unbounded stream."""
    return stream.withWatermark("block_ts", within).dropDuplicatesWithinWatermark(
        ["stream_id", "block_num", "block_id"]
    )


class TypedPerTableSink:
    """S5/S6/T9 with the reference's typed-cast stage: route change rows
    by table, cast each table's string map to its declared schema
    (alphabetical column order), append to the per-table sink, then write
    the max cursor per stream — data first, cursor second, so a crash can
    repeat a block but never lose data the cursor claims is done."""

    def __init__(self, base_dir: str, table_schemas: dict[str, dict[str, str]],
                 mode: str = "strict", decode=decode_changes):
        import inspect

        self.base_dir = base_dir
        self.table_schemas = table_schemas
        self.mode = mode
        self.decode = decode  # decode_changes (JSON) or decode_changes_protobuf
        # thread the sink's strict/permissive mode into the decoder when
        # it supports one — a permissive sink must not die on the first
        # malformed payload before the cast stage ever sees it
        self._decode_takes_mode = "mode" in inspect.signature(decode).parameters

    def write_batch(self, block_df: DataFrame, epoch_id: int) -> None:
        block_df = block_df.cache()
        try:
            decoded = (
                self.decode(block_df, mode=self.mode)
                if self._decode_takes_mode
                else self.decode(block_df)
            )
            changes = decoded.cache()
            try:
                for t, schema in sorted(self.table_schemas.items()):
                    rows = changes.filter(F.col("table") == t).select(
                        "stream_id", "block_num", "block_id", "row_map"
                    )
                    typed = typed_cast(rows, "row_map", schema, mode=self.mode)
                    (
                        typed.withColumn("epoch_id", F.lit(epoch_id))
                        .write.mode("append")
                        .parquet(f"{self.base_dir}/data/{t}")
                    )
                # cursor AFTER all table writes (ref loader.rs:111-125)
                cursor = (
                    block_df.groupBy("stream_id")
                    .agg(
                        F.max_by("cursor", "block_num").alias("cursor"),
                        F.max("block_num").alias("block_num"),
                        F.max_by("block_id", "block_num").alias("block_id"),
                    )
                    .withColumn("epoch_id", F.lit(epoch_id))
                )
                cursor.write.mode("append").parquet(f"{self.base_dir}/cursors")
            finally:
                changes.unpersist()
        finally:
            block_df.unpersist()


def run_pipeline(
    spark,
    landing_dir: str,
    checkpoint_dir: str,
    sink: TypedPerTableSink,
    available_now: bool = True,
    state_partitions: int = 4,
):
    """Wire the whole topology: tail the landing dir, run stateful
    finality, fan out through the typed per-table sink. Returns the
    started StreamingQuery.

    `state_partitions` sizes the stateful operator's shuffle: state
    parallelism is bounded by the number of DISTINCT STREAMS (the
    groupBy key), not cores — and every state partition costs a state
    store instance plus a Python state-server round trip PER
    MICRO-BATCH, even when empty (measured: 4 micro-batches over one
    stream = 45 s at 32 partitions vs 24 s at 4). Structured Streaming
    reads `spark.sql.shuffle.partitions` once at first query start and
    pins it in the checkpoint, so the conf is set around `.start()` and
    restored immediately — later batches use the checkpointed value;
    batch queries on the session are unaffected.

    100x-state note: the default HDFS-backed state store keeps every
    stream's buffer on the executor HEAP. At production state sizes
    (many streams x deep finality windows), switch the session to the
    RocksDB provider before the FIRST start — state then lives on local
    disk with incremental checkpointing:
      spark.sql.streaming.stateStore.providerClass =
        org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider
      spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled = true
    The provider is pinned in the checkpoint like the shuffle-partition
    count, so it must be chosen at topology birth, not on restart.
    Crash-recovery contract (kill -> restart on the same checkpoint:
    state restored, no loss, read-view exactly-once) is proven in
    tests/test_pipeline.py::TestCheckpointRestart."""
    from elric_rs_spark.streaming.source import read_block_stream

    stream = read_block_stream(spark, landing_dir)
    finalized = apply_finality_stateful(stream)
    writer = (
        finalized.writeStream.foreachBatch(sink.write_batch)
        .outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    else:
        # the reference's 15s insert cadence (ref loader.rs:58)
        writer = writer.trigger(processingTime="15 seconds")
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(state_partitions))
    try:
        return writer.start()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
