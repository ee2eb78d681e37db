"""Mock-ClickHouse HTTP round-trip for the S5 sink (VERDICT r04
next-round #4) — the Spark twin of the reference's recording-mock loader
test (ref loader.rs:358-402): a local HTTP server records every INSERT
the sink posts; assertions cover typed RowBinary round-trips,
alphabetical column order, per-partition data inserts arriving BEFORE
the cursor insert, and epoch-tagged replay idempotence. No live
ClickHouse anywhere.
"""

from __future__ import annotations

import threading
import urllib.parse
from datetime import date, datetime
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest

from elric_rs_spark.streaming.http_sink import (
    ClickHouseHttpInserter,
    PerTableHttpSink,
    decode_row_binary,
    encode_row_binary,
    insert_statement,
)


class _Recorder:
    """Thread-safe (query, body) log — the test's `test::Mock`."""

    def __init__(self):
        self.lock = threading.Lock()
        self.requests: list[tuple[str, bytes]] = []

    def record(self, query: str, body: bytes) -> None:
        with self.lock:
            self.requests.append((query, body))

    def tables_in_order(self) -> list[str]:
        out = []
        for q, _ in self.requests:
            out.append(q.split("INSERT INTO ", 1)[1].split(" ", 1)[0])
        return out


@pytest.fixture()
def mock_clickhouse():
    rec = _Recorder()

    class Handler(BaseHTTPRequestHandler):
        def do_POST(self):
            q = urllib.parse.parse_qs(
                urllib.parse.urlparse(self.path).query
            ).get("query", [""])[0]
            body = self.rfile.read(int(self.headers.get("Content-Length", 0)))
            rec.record(q, body)
            self.send_response(200)
            self.end_headers()

        def log_message(self, *a):  # quiet
            pass

    srv = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        yield f"http://127.0.0.1:{srv.server_port}", rec
    finally:
        srv.shutdown()
        srv.server_close()


class TestRowBinaryCodec:
    def test_round_trip_all_types(self):
        ch = ["Int64", "Float64", "String", "Date32", "DateTime64(6)", "UInt8"]
        nl = [False, True, False, False, False, False]
        rows = [
            (1, 2.5, "héllo", date(2024, 2, 29), datetime(2024, 1, 2, 3, 4, 5, 123456), 1),
            (-9007199254740993, None, "", date(1969, 12, 31), datetime(1970, 1, 1), 0),
        ]
        assert decode_row_binary(encode_row_binary(rows, ch, nl), ch, nl) == rows

    def test_long_string_uleb128(self):
        s = "x" * 300  # length needs 2 ULEB128 bytes
        body = encode_row_binary([(s,)], ["String"], [False])
        assert body[:2] == bytes([0xAC, 0x02])
        assert decode_row_binary(body, ["String"], [False]) == [(s,)]

    def test_null_in_non_nullable_raises(self):
        with pytest.raises(ValueError, match="NULL"):
            encode_row_binary([(None,)], ["Int64"], [False])


class TestHttpInserter:
    def test_insert_statement_and_wire(self, mock_clickhouse):
        endpoint, rec = mock_clickhouse
        ins = ClickHouseHttpInserter(
            endpoint, "transfers", ["amount", "block_num"],
            ["Int64", "Int64"], [False, False],
        )
        ins.insert([(10, 7), (20, 8)])
        assert len(rec.requests) == 1
        q, body = rec.requests[0]
        assert q == "INSERT INTO transfers (amount, block_num) FORMAT RowBinary"
        assert decode_row_binary(body, ["Int64", "Int64"], [False, False]) == [
            (10, 7), (20, 8),
        ]

    def test_empty_block_posts_nothing(self, mock_clickhouse):
        endpoint, rec = mock_clickhouse
        ins = ClickHouseHttpInserter(endpoint, "t", ["a"], ["Int64"], [False])
        ins.insert([])
        assert rec.requests == []


class TestPerTableHttpSinkRoundTrip:
    def _batch(self, spark):
        return spark.createDataFrame(
            [
                ("s1", "transfers", 7, "blk-7", "7", '{"v":7}'),
                ("s1", "approvals", 7, "blk-7", "7", '{"v":7}'),
                ("s1", "transfers", 8, "blk-8", "8", '{"v":8}'),
            ],
            "stream_id string, table string, block_num long, block_id string, "
            "cursor string, payload string",
        )

    def test_fanout_types_order_and_cursor_last(self, spark, mock_clickhouse):
        endpoint, rec = mock_clickhouse
        sink = PerTableHttpSink(endpoint)
        sink.write_batch(self._batch(spark), epoch_id=3)
        assert sink.tables_written == {"approvals", "transfers"}

        order = rec.tables_in_order()
        # data inserts first (any per-partition interleaving), the one
        # cursor insert strictly LAST (ref loader.rs:119-122 ordering)
        assert order[-1] == "cursors"
        assert set(order[:-1]) == {"approvals", "transfers"}

        # alphabetical column order in every INSERT (T5 contract)
        for q, _ in rec.requests:
            cols = q.split("(", 1)[1].split(")", 1)[0].split(", ")
            assert cols == sorted(cols), q

        # typed round-trip of the transfers rows
        data_cols = ["block_id", "block_num", "cursor", "epoch_id", "payload", "stream_id"]
        ch = ["String", "Int64", "String", "Int64", "String", "String"]
        nl = [True, True, True, False, True, True]
        got = []
        for q, body in rec.requests:
            if q.startswith("INSERT INTO transfers "):
                assert q == insert_statement("transfers", data_cols, ch, nl)
                got += decode_row_binary(body, ch, nl)
        assert sorted(got) == [
            ("blk-7", 7, "7", 3, '{"v":7}', "s1"),
            ("blk-8", 8, "8", 3, '{"v":8}', "s1"),
        ]

        # cursor payload: max cursor by block_num, epoch-tagged
        cq, cbody = rec.requests[-1]
        ccols = ["block_id", "block_num", "cursor", "epoch_id", "stream_id"]
        cch = ["String", "Int64", "String", "Int64", "String"]
        cnl = [True, True, True, False, True]
        assert cq == insert_statement("cursors", ccols, cch, cnl)
        assert decode_row_binary(cbody, cch, cnl) == [("blk-8", 8, "8", 3, "s1")]

    def test_epoch_replay_reposts_same_rows(self, spark, mock_clickhouse):
        """foreachBatch replays a completed epoch after a crash: the sink
        posts byte-identical blocks tagged with the SAME epoch_id, so a
        ReplacingMergeTree target collapses them (at-least-once wire,
        exactly-once read — same contract the parquet sink proves via
        read_exactly_once)."""
        endpoint, rec = mock_clickhouse
        sink = PerTableHttpSink(endpoint)
        batch = self._batch(spark)
        sink.write_batch(batch, epoch_id=5)
        first = sorted(rec.requests)
        rec.requests.clear()
        sink.write_batch(batch, epoch_id=5)  # replay
        assert sorted(rec.requests) == first
