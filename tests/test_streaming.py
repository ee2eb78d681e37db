"""Streaming-core tests mirroring the reference's own loader tests
(ref loader.rs:272-402: test_undo_block_signal, test_buffer,
test_process_data) plus Spark-native end-to-end checks:

- FinalityBuffer state machine (pure Python, exact reference semantics)
- ReconnectingReader backoff/resume (ref substreams_stream.rs:53-149)
- applyInPandasWithState finality op on a real Structured Streaming query
- PerTableParquetSink fan-out + cursor write ordering + recovery
"""

from __future__ import annotations

import pathlib
import tempfile

import pytest
from pyspark.sql import functions as F

from elric_rs_spark.streaming.finality import (
    Block,
    FinalityBuffer,
    apply_finality_stateful,
)
from elric_rs_spark.streaming.sink import (
    PerTableParquetSink,
    clickhouse_writer_options,
    load_persisted_cursor,
)
from elric_rs_spark.streaming.source import (
    BLOCK_STREAM_SCHEMA,
    FatalStreamError,
    ReconnectingReader,
    demux,
    fixture_replay,
    land_blocks,
    read_block_stream,
)


def mk_block(num: int, final_height: int) -> Block:
    return Block(num, f"blk-{num:08d}", str(num), final_height)


# ---------------------------------------------------------------------------
# 1. FinalityBuffer — the reference's three loader tests, translated.
# ---------------------------------------------------------------------------


class TestFinalityBuffer:
    def test_undo_block_signal(self):
        """ref loader.rs:272-302: buffer blocks 0..=12 (none final), undo at
        8 -> buffer holds exactly 0..=8."""
        buf = FinalityBuffer()
        for n in range(13):
            buf.push(mk_block(n, final_height=0))
        # one overflow flush happened at the 13th push (cap 12)
        assert [b.block_num for b in buf.buffer] == list(range(1, 13))
        dropped = buf.undo(last_valid_block=8)
        assert dropped == 4
        assert [b.block_num for b in buf.buffer] == list(range(1, 9))

    def test_buffer_final_passthrough(self):
        """ref loader.rs:304-350 (a): already-final blocks emit immediately,
        one by one; buffer stays empty."""
        buf = FinalityBuffer()
        for n in range(5):
            out = buf.push(mk_block(n, final_height=n))
            assert [b.block_num for b in out] == [n]
        assert buf.buffer == []

    def test_buffer_holds_nonfinal(self):
        """ref loader.rs:327-338 (b): 12 non-final blocks all buffer.
        Blocks are numbered from 1 (as in the reference test) because
        block 0 against watermark 0 is final by 0 <= 0."""
        buf = FinalityBuffer()
        emitted = []
        for n in range(1, 13):
            emitted += buf.push(mk_block(n, final_height=0))
        assert emitted == []
        assert len(buf.buffer) == 12

    def test_buffer_overflow_flush(self):
        """ref loader.rs:339-349 (c): a 13th non-final block forces the
        oldest out (bounded memory beats strict finality, loader.rs:92-101)."""
        buf = FinalityBuffer()
        for n in range(1, 13):
            buf.push(mk_block(n, final_height=0))
        out = buf.push(mk_block(14, final_height=0))
        assert [b.block_num for b in out] == [1]
        assert len(buf.buffer) == 12

    def test_watermark_prefix_emission(self):
        """A rising final_block_height flushes exactly the <=-watermark
        prefix (ref loader.rs:82-91)."""
        buf = FinalityBuffer()
        for n in range(1, 7):
            buf.push(mk_block(n, final_height=0))
        out = buf.push(mk_block(7, final_height=3))
        assert [b.block_num for b in out] == [1, 2, 3]
        assert [b.block_num for b in buf.buffer] == [4, 5, 6, 7]

    def test_undo_never_touches_emitted(self):
        """Undo drops only buffered rows; what was emitted stays emitted
        (ref loader.rs:177-193 + README.md:16 design intent)."""
        buf = FinalityBuffer()
        emitted = []
        for n in range(6):
            emitted += buf.push(mk_block(n, final_height=2))
        assert [b.block_num for b in emitted] == [0, 1, 2]
        buf.undo(last_valid_block=0)  # below everything emitted
        assert [b.block_num for b in emitted] == [0, 1, 2]  # unchanged
        assert buf.buffer == []


# ---------------------------------------------------------------------------
# 2. ReconnectingReader — backoff / cursor-resume / fatal classification.
# ---------------------------------------------------------------------------


class TestReconnectingReader:
    def test_resumes_from_latest_cursor(self):
        seen_cursors = []

        def connect(cursor):
            seen_cursors.append(cursor)
            start = int(cursor) + 1 if cursor else 0
            for n in range(start, start + 3):
                yield {"msg_type": "new", "block_num": n, "cursor": str(n)}
            if len(seen_cursors) < 3:
                raise ConnectionError("flaky upstream")

        sleeps = []
        reader = ReconnectingReader(connect=connect, sleep=sleeps.append)
        nums = [m["block_num"] for m in reader]
        # 3 connects, each resuming one past the last delivered cursor
        assert seen_cursors == [None, "2", "5"]
        assert nums == list(range(9))
        assert len(sleeps) == 2  # one backoff per reconnect

    def test_backoff_doubles_and_resets_on_progress(self):
        attempts = []

        def connect(cursor):
            attempts.append(cursor)
            if len(attempts) <= 3:
                raise ConnectionError("down")  # no progress: backoff grows
            yield {"msg_type": "new", "block_num": 0, "cursor": "0"}

        sleeps = []
        reader = ReconnectingReader(connect=connect, sleep=sleeps.append)
        list(reader)
        assert sleeps == [0.010, 0.020, 0.040]

    def test_fatal_error_not_retried(self):
        def connect(cursor):
            raise FatalStreamError("Unauthenticated")
            yield  # pragma: no cover

        reader = ReconnectingReader(connect=connect, sleep=lambda s: None)
        with pytest.raises(FatalStreamError):
            list(reader)

    def test_demux_drops_progress_and_session(self):
        msgs = [
            {"msg_type": "session"},
            {"msg_type": "new", "block_num": 1},
            {"msg_type": "progress"},
            {"msg_type": "undo", "last_valid_block": 0},
        ]
        assert [m["msg_type"] for m in demux(msgs)] == ["new", "undo"]


# ---------------------------------------------------------------------------
# 3. End-to-end: landing dir -> readStream -> stateful finality -> memory
#    sink (the Spark-native form of ref loader.rs:358-402 test_process_data).
# ---------------------------------------------------------------------------


@pytest.fixture()
def tmpdir():
    with tempfile.TemporaryDirectory(prefix="elric_stream_") as d:
        yield d


def _blocks(spark, n_blocks: int, reorg_depth: int, undo_at=None, undo_to=None):
    msgs = []
    for n in range(n_blocks):
        msgs.append(
            {
                "stream_id": "s1",
                "msg_type": "new",
                "block_num": n,
                "block_id": f"blk-{n:08d}",
                "block_ts": None,
                "cursor": str(n),
                "final_block_height": max(n - reorg_depth, 0),
                "last_valid_block": None,
                "payload": f'{{"v": {n}}}',
            }
        )
        if undo_at is not None and n == undo_at:
            msgs.append(
                {
                    "stream_id": "s1",
                    "msg_type": "undo",
                    "block_num": n,
                    "block_id": None,
                    "block_ts": None,
                    "cursor": None,
                    "final_block_height": None,
                    "last_valid_block": undo_to,
                    "payload": None,
                }
            )
    return msgs


def _run_stream(spark, landing, checkpoint, sink_name):
    stream = read_block_stream(spark, landing)
    finalized = apply_finality_stateful(stream)
    q = (
        finalized.writeStream.format("memory")
        .queryName(sink_name)
        .outputMode("append")
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.table(sink_name)


class TestStatefulFinalityStreaming:
    def test_finality_end_to_end(self, spark, tmpdir):
        """40 blocks, watermark trails by 5: every block with block_num <=
        final watermark of the last message must be emitted, in order, and
        nothing above the tail watermark unless overflow-flushed."""
        landing = f"{tmpdir}/landing"
        n = land_blocks(spark, _blocks(spark, 40, reorg_depth=5), landing)
        assert n == 40
        got = _run_stream(spark, landing, f"{tmpdir}/ckpt", "fin_e2e")
        nums = [r.block_num for r in got.orderBy("block_num").collect()]
        # final watermark at block 39 is 34 -> 0..=34 emitted via finality;
        # buffer holds 35..39 (5 rows < cap 12, no overflow).
        assert nums == list(range(35))

    def test_undo_in_stream(self, spark, tmpdir):
        """Undo at block 20 back to 15: blocks 16..20 (buffered, non-final)
        are retracted and never reach the sink until re-announced."""
        landing = f"{tmpdir}/landing"
        # reorg_depth 25 -> watermark 0 for the first 25 blocks: everything
        # below the undo point is still buffered when the undo arrives.
        land_blocks(
            spark, _blocks(spark, 21, reorg_depth=25, undo_at=20, undo_to=15), landing
        )
        got = _run_stream(spark, landing, f"{tmpdir}/ckpt", "fin_undo")
        # nothing became final (watermark stayed 0 -> only block 0 emitted)
        nums = [r.block_num for r in got.orderBy("block_num").collect()]
        assert 16 not in nums and 20 not in nums

    def test_reorg_replacement_ordering(self, spark, tmpdir):
        """Undo + same-numbered replacement blocks inside ONE micro-batch
        must apply in arrival order. block_num alone cannot order this: the
        undo row carries block_num 7, the dropped block is 7, and the
        post-reorg chain re-announces 6/7 — a block_num sort (or an
        unstable sort on ties) could drop the replacements or keep the
        stale blocks. The seq column stamped by land_blocks makes the
        kernel replay exact arrival order (ADVICE r01 finality flag)."""

        def new(n, bid, fh=0):
            return {
                "stream_id": "s1",
                "msg_type": "new",
                "block_num": n,
                "block_id": bid,
                "block_ts": None,
                "cursor": str(n),
                "final_block_height": fh,
                "last_valid_block": None,
                "payload": None,
            }

        msgs = [new(n, f"blk-{n}") for n in range(8)]
        msgs.append(
            {
                "stream_id": "s1",
                "msg_type": "undo",
                "block_num": 7,
                "block_id": None,
                "block_ts": None,
                "cursor": None,
                "final_block_height": None,
                "last_valid_block": 5,
                "payload": None,
            }
        )
        msgs += [new(6, "blk-R6"), new(7, "blk-R7"), new(8, "blk-8", fh=8)]
        landing = f"{tmpdir}/landing"
        land_blocks(spark, msgs, landing)
        got = _run_stream(spark, landing, f"{tmpdir}/ckpt", "fin_reorg")
        rows = got.collect()
        ids = {r.block_num: r.block_id for r in rows}
        assert ids[6] == "blk-R6" and ids[7] == "blk-R7"
        assert len(rows) == 9  # 0..8 exactly once, reorged ids for 6/7

    def test_transform_with_state_form(self, spark, tmpdir):
        """apply_finality_tws (Spark 4 transformWithStateInPandas, typed
        ListState, RocksDB state store) must produce exactly the same
        finality semantics as the applyInPandasWithState form — including
        an in-batch undo with same-numbered replacement blocks.

        Skipped without the python protobuf package: TWS's own
        state-server protocol requires google.protobuf (the driver worker
        dies in initialization without it — environment constraint, same
        root cause as the gated .spkg/grpc extras)."""
        pytest.importorskip("google.protobuf.descriptor")
        from elric_rs_spark.streaming.finality import apply_finality_tws

        conf_key = "spark.sql.streaming.stateStore.providerClass"
        prev = spark.conf.get(conf_key, None)
        spark.conf.set(
            conf_key,
            "org.apache.spark.sql.execution.streaming.state."
            "RocksDBStateStoreProvider",
        )
        try:
            landing = f"{tmpdir}/landing"
            msgs = _blocks(spark, 21, reorg_depth=25, undo_at=20, undo_to=15)
            msgs += _blocks(spark, 40, reorg_depth=5)[21:]
            land_blocks(spark, msgs, landing)
            stream = read_block_stream(spark, landing)
            q = (
                apply_finality_tws(stream)
                .writeStream.format("memory")
                .queryName("fin_tws")
                .outputMode("append")
                .option("checkpointLocation", f"{tmpdir}/ckpt")
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(120)
            nums = sorted(
                r.block_num for r in spark.table("fin_tws").collect()
            )
            # undo at 20 back to 15 dropped 16..20 from the buffer; the
            # final watermark (block 39 -> 34) flushes 0..34 minus those
            assert nums == [n for n in range(35) if not (15 < n <= 20)]
        finally:
            if prev is None:
                spark.conf.unset(conf_key)
            else:
                spark.conf.set(conf_key, prev)

    def test_seq_continues_across_process_restart(self, spark, tmpdir):
        """The arrival counter must resume from the max seq already in the
        landing dir after a process restart — a counter restarting at 0
        would interleave post-restart rows before pre-restart ones in the
        seq sort, recreating the reorg misordering seq exists to fix."""
        from elric_rs_spark.streaming import source as src

        landing = f"{tmpdir}/landing"
        land_blocks(spark, _blocks(spark, 5, reorg_depth=3), landing)
        src._DIR_SEQ.clear()  # simulate a fresh process
        land_blocks(spark, _blocks(spark, 5, reorg_depth=3), landing)
        seqs = sorted(
            r.seq for r in spark.read.schema(BLOCK_STREAM_SCHEMA)
            .parquet(landing).select("seq").collect()
        )
        assert len(seqs) == 10 and len(set(seqs)) == 10  # no overlap
        assert seqs == list(range(seqs[0], seqs[0] + 10))  # contiguous

    def test_stream_dedup_of_reconnect_replays(self, spark, tmpdir):
        """A reconnect re-delivers blocks already seen (at-least-once
        upstream). dedup_block_stream must collapse the replays inside
        the watermark horizon so each block reaches the sink once."""
        import datetime

        from elric_rs_spark.streaming.pipeline import dedup_block_stream

        base = datetime.datetime(2024, 8, 7, 12, 0, 0)

        def blk(n):
            return {
                "stream_id": "s1",
                "msg_type": "new",
                "block_num": n,
                "block_id": f"blk-{n}",
                "block_ts": base + datetime.timedelta(minutes=n),
                "cursor": str(n),
                "final_block_height": n,
                "last_valid_block": None,
                "payload": None,
            }

        # blocks 0..9, then a reconnect replays 7..9 (cursor overlap)
        msgs = [blk(n) for n in range(10)] + [blk(n) for n in range(7, 10)]
        landing = f"{tmpdir}/landing"
        land_blocks(spark, msgs, landing)
        stream = read_block_stream(spark, landing)
        q = (
            dedup_block_stream(stream)
            .writeStream.format("memory")
            .queryName("dedup_stream")
            .outputMode("append")
            .option("checkpointLocation", f"{tmpdir}/ckpt")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        nums = sorted(r.block_num for r in spark.table("dedup_stream").collect())
        assert nums == list(range(10))  # replays collapsed, no gaps

    def test_fixture_replay_shape(self, spark):
        msgs = fixture_replay(spark, "/root/testdata/sf0.001", undo_at=50)
        assert any(m["msg_type"] == "undo" for m in msgs)
        news = [m for m in msgs if m["msg_type"] == "new"]
        assert all(
            m["final_block_height"] == max(m["block_num"] - 12, 0) for m in news
        )


# ---------------------------------------------------------------------------
# 4. Sink: per-table fan-out, data-then-cursor ordering, cursor recovery.
# ---------------------------------------------------------------------------


class TestSink:
    def test_fanout_and_cursor_recovery(self, spark, tmpdir):
        sink = PerTableParquetSink(base_dir=tmpdir)
        batch = spark.createDataFrame(
            [
                ("s1", "transfers", 7, "blk-7", "7", '{"v":7}'),
                ("s1", "approvals", 7, "blk-7", "7", '{"v":7}'),
                ("s1", "transfers", 8, "blk-8", "8", '{"v":8}'),
            ],
            "stream_id string, table string, block_num long, block_id string, "
            "cursor string, payload string",
        )
        sink.write_batch(batch, epoch_id=0)
        assert sink.tables_written == {"transfers", "approvals"}
        transfers = spark.read.parquet(f"{tmpdir}/data/transfers")
        assert transfers.count() == 2
        assert "table" not in transfers.columns
        # S7 recovery: latest cursor by block_num (ref main.rs:299-310)
        assert load_persisted_cursor(spark, tmpdir, "s1") == "8"
        assert load_persisted_cursor(spark, tmpdir, "nope") is None

    def test_epoch_replay_detectable(self, spark, tmpdir):
        """Retried epochs re-append with the same epoch_id, so exact-once
        consumers can dedup on (epoch_id, block_num) — the parquet analogue
        of ReplacingMergeTree idempotence (README.md:9-11)."""
        sink = PerTableParquetSink(base_dir=tmpdir)
        batch = spark.createDataFrame(
            [("s1", "t", 1, "b1", "1", "x")],
            "stream_id string, table string, block_num long, block_id string, "
            "cursor string, payload string",
        )
        sink.write_batch(batch, epoch_id=5)
        sink.write_batch(batch, epoch_id=5)  # replay
        df = spark.read.parquet(f"{tmpdir}/data/t")
        assert df.count() == 2
        dedup = df.dropDuplicates(["epoch_id", "block_num"])
        assert dedup.count() == 1

    def test_cursor_never_ahead_of_data(self, spark, tmpdir):
        """T9 ordering: the cursor row is written only after the data write
        of the same epoch succeeded — verified here by checking both sides
        exist for the epoch (the write order is enforced in write_batch)."""
        sink = PerTableParquetSink(base_dir=tmpdir)
        batch = spark.createDataFrame(
            [("s1", "t", 3, "b3", "3", "x")],
            "stream_id string, table string, block_num long, block_id string, "
            "cursor string, payload string",
        )
        sink.write_batch(batch, epoch_id=1)
        cursors = spark.read.parquet(f"{tmpdir}/cursors")
        data = spark.read.parquet(f"{tmpdir}/data/t")
        assert cursors.filter(F.col("epoch_id") == 1).count() == 1
        assert data.filter(F.col("epoch_id") == 1).count() == 1

    def test_clickhouse_options_parity(self):
        opts = clickhouse_writer_options("jdbc:clickhouse://localhost:8123/db")
        # ref loader.rs:56-58 streamed async inserts; Cargo.toml:21 LZ4
        assert opts["async_insert"] == "1"
        assert opts["wait_for_async_insert"] == "0"
        assert opts["compress"] == "lz4"


class TestRestartRecovery:
    def test_state_survives_restart(self, spark, tmpdir):
        """SURVEY.md §7 risk 3: buffered (non-final) blocks must live in
        the checkpointed state store, not driver memory. Run 1 buffers
        blocks whose watermark hasn't caught up; run 2 (same checkpoint,
        new query) lands the rest of the stream and must emit the blocks
        run 1 buffered — no gaps, no duplicates across both runs."""
        landing = f"{tmpdir}/landing"
        ckpt = f"{tmpdir}/ckpt"
        out = f"{tmpdir}/out"
        msgs = _blocks(spark, 40, reorg_depth=5)

        def run_once(batch):
            land_blocks(spark, batch, landing)
            stream = read_block_stream(spark, landing)
            finalized = apply_finality_stateful(stream)
            q = (
                finalized.writeStream.format("parquet")
                .option("path", out)
                .option("checkpointLocation", ckpt)
                .outputMode("append")
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(120)

        run_once(msgs[:20])  # watermark reaches 14: 0..14 emitted, 15..19 in state
        first = sorted(
            r.block_num for r in spark.read.parquet(out).collect()
        )
        assert first == list(range(15))

        run_once(msgs[20:])  # watermark reaches 34: 15..34 emitted from state
        final = sorted(r.block_num for r in spark.read.parquet(out).collect())
        assert final == list(range(35)), "gap or duplicate after restart"


class TestMultiStreamState:
    def test_keyed_state_is_independent(self, spark, tmpdir):
        """applyInPandasWithState keys state by stream_id: stream A's
        watermark progress must not flush stream B's buffer. This is the
        scale-out story — thousands of independent streams, each with its
        own <=12-block state, sharded across executors by key."""
        landing = f"{tmpdir}/landing"
        msgs = []
        for sid, depth in (("sA", 5), ("sB", 1000)):  # sB never finalizes
            for n in range(20):
                msgs.append(
                    {
                        "stream_id": sid,
                        "msg_type": "new",
                        "block_num": n,
                        "block_id": f"{sid}-{n}",
                        "block_ts": None,
                        "cursor": str(n),
                        "final_block_height": max(n - depth, 0),
                        "last_valid_block": None,
                        "payload": None,
                    }
                )
        land_blocks(spark, msgs, landing)
        got = _run_stream(spark, landing, f"{tmpdir}/ckpt", "fin_multi")
        by_stream = {
            r.stream_id: r.n
            for r in got.groupBy("stream_id").agg(F.count("*").alias("n")).collect()
        }
        # sA: watermark reached 14 -> 15 finalized; plus overflow flushes
        # past the 12-cap never happen (buffer holds 5). sB: watermark 0 ->
        # only block 0 final; 19 buffered > cap 12 -> 7 overflow-flushed.
        assert by_stream["sA"] == 15
        assert by_stream["sB"] == 8  # block 0 + 7 overflow


class TestSummingMart:
    """Incremental continuous-aggregate maintenance (streaming/mart.py):
    append-only per-epoch partial sums, merge-on-read — the
    SummingMergeTree delegation trick (ref README.md:9-11) applied to
    aggregates."""

    def _run(self, spark, landing, ckpt, mart):
        stream = read_block_stream(spark, landing)
        q = (
            stream.filter(F.col("msg_type") == "new")
            .writeStream.foreachBatch(mart.write_batch)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    def _blocks(self, lo, hi):
        import datetime

        base = datetime.datetime(2024, 8, 7, 12, 0, 0)
        return [
            {
                "stream_id": f"s{n % 3}",
                "msg_type": "new",
                "block_num": n,
                "block_id": f"blk-{n}",
                "block_ts": base + datetime.timedelta(minutes=n),
                "cursor": str(n),
                "final_block_height": n,
                "last_valid_block": None,
                "payload": None,
            }
            for n in range(lo, hi)
        ]

    def test_incremental_equals_batch(self, spark, tmpdir):
        from elric_rs_spark.streaming.mart import SummingMart

        landing = f"{tmpdir}/landing"
        mart = SummingMart(tmpdir, ["stream_id"], "block_num")
        # wave 1
        land_blocks(spark, self._blocks(0, 40), landing)
        self._run(spark, landing, f"{tmpdir}/ckpt", mart)
        # wave 2 arrives later; SAME checkpoint continues incrementally
        land_blocks(spark, self._blocks(40, 100), landing)
        self._run(spark, landing, f"{tmpdir}/ckpt", mart)

        got = {
            r.stream_id: (r.sum_block_num, r.n_rows)
            for r in mart.read(spark).collect()
        }
        expect = {}
        for n in range(100):
            k = f"s{n % 3}"
            s, c = expect.get(k, (0, 0))
            expect[k] = (s + n, c + 1)
        assert got == expect

        # replayed epoch: re-append epoch 0's partials verbatim (the
        # crash-replay shape) — merge-on-read must collapse them
        parts = spark.read.parquet(mart.path)
        e0 = parts.filter(F.col("epoch_id") == parts.agg(F.min("epoch_id")).collect()[0][0])
        e0.write.mode("append").parquet(mart.path)
        got2 = {
            r.stream_id: (r.sum_block_num, r.n_rows)
            for r in mart.read(spark).collect()
        }
        assert got2 == expect

        # pin e0's rows before compaction deletes its backing files
        e0 = spark.createDataFrame(e0.collect(), e0.schema)

        # compaction preserves the merged result and shrinks partials
        n_before = spark.read.parquet(mart.path).count()
        mart.compact(spark)
        n_after = spark.read.parquet(mart.path).count()
        assert n_after <= n_before and n_after == len(expect)
        got3 = {
            r.stream_id: (r.sum_block_num, r.n_rows)
            for r in mart.read(spark).collect()
        }
        assert got3 == expect

        # replay AFTER compaction (ADVICE r03, medium): a crashed run's
        # last epoch was folded by compact() but never checkpoint-
        # committed, so the restarted stream re-appends the same
        # partials; they no longer tie with any (key, epoch) row, and
        # without the compaction watermark read() would double-count
        e0.write.mode("append").parquet(mart.path)
        got4 = {
            r.stream_id: (r.sum_block_num, r.n_rows)
            for r in mart.read(spark).collect()
        }
        assert got4 == expect
        # a genuinely NEW epoch (> watermark) still lands normally
        new_epoch = e0.withColumn("epoch_id", F.lit(10_000))
        new_epoch.write.mode("append").parquet(mart.path)
        got5 = {
            r.stream_id: (r.sum_block_num, r.n_rows)
            for r in mart.read(spark).collect()
        }
        e0_rows = {r.stream_id: (r.partial_sum, r.partial_n) for r in e0.collect()}
        expect5 = {
            k: (s + e0_rows[k][0], c + e0_rows[k][1]) if k in e0_rows else (s, c)
            for k, (s, c) in expect.items()
        }
        assert got5 == expect5


class TestStreamStreamIntervalJoin:
    """Stream-stream INNER join with watermarks + a time-range condition
    (the attribution join: each purchase matches clicks by the same user
    in the preceding 5 minutes). Spark buffers both sides in state and
    expires rows past the watermark — the engine-native form of the
    batch q_join_asof/q_join_range family, and the shape a streaming
    enrichment of two live feeds takes at scale. Pins that the session's
    config allows stream-stream state joins and that the time-range
    predicate bounds state (no unconstrained cross-buffer)."""

    def test_attribution_join(self, spark, tmpdir):
        import datetime

        clicks_dir = f"{tmpdir}/clicks"
        purchases_dir = f"{tmpdir}/purchases"
        T0 = datetime.datetime(2024, 3, 1, 12, 0, 0)
        M = datetime.timedelta(minutes=1)
        clicks = [
            (1, T0, 100),            # matches purchase at +3m
            (1, T0 + 10 * M, 101),   # no purchase within 5m after
            (2, T0, 102),            # matches purchase at +5m (inclusive)
            (3, T0 + 2 * M, 103),    # purchase BEFORE click -> no match
        ]
        purchases = [
            (1, T0 + 3 * M, 50.0),
            (2, T0 + 5 * M, 70.0),
            (3, T0 + 1 * M, 99.0),
        ]
        spark.createDataFrame(
            clicks, "user_id long, ts timestamp, click_id long"
        ).write.parquet(clicks_dir)
        spark.createDataFrame(
            purchases, "user_id long, ts timestamp, amount double"
        ).write.parquet(purchases_dir)

        c = (
            spark.readStream.schema("user_id long, ts timestamp, click_id long")
            .parquet(clicks_dir)
            .withWatermark("ts", "10 minutes")
            .select("user_id", F.col("ts").alias("click_ts"), "click_id")
        )
        p = (
            spark.readStream.schema("user_id long, ts timestamp, amount double")
            .parquet(purchases_dir)
            .withWatermark("ts", "10 minutes")
            .select(F.col("user_id").alias("p_user"), F.col("ts").alias("p_ts"), "amount")
        )
        joined = c.join(
            p,
            (F.col("user_id") == F.col("p_user"))
            & (F.col("p_ts") >= F.col("click_ts"))
            & (F.col("p_ts") <= F.col("click_ts") + F.expr("INTERVAL 5 MINUTES")),
        )
        q = (
            joined.writeStream.format("memory")
            .queryName("attr_join")
            .outputMode("append")
            .option("checkpointLocation", f"{tmpdir}/ckpt_ss")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        got = sorted(
            (r.click_id, r.amount) for r in spark.table("attr_join").collect()
        )
        assert got == [(100, 50.0), (102, 70.0)]
