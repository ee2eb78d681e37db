"""Wire-level tests for the pure-Python protobuf decoder (T1/S4).

Fixture bytes are HAND-ENCODED here with minimal encoder helpers — no
protobuf library on either side — so the decoder is checked against the
wire format spec itself, not against its own inverse assumptions' source.
The end-to-end test feeds real DatabaseChanges bytes through the full
streaming pipeline (finality -> protobuf decode -> PK merge -> typed cast
-> per-table sink), mirroring the reference's test_process_data
(ref loader.rs:358-402) on the actual wire format (ref loader.rs:128-129).
"""

from __future__ import annotations

import base64
import tempfile

import pytest

from elric_rs_spark.functions.protowire import (
    ProtoWireError,
    decode_block_scoped_data,
    decode_block_undo_signal,
    decode_database_changes,
    decode_package,
    decode_response,
    iter_fields,
    read_varint,
    table_change_rows,
)

# ---------------------------------------------------------------------------
# minimal wire ENCODER (test-side only)
# ---------------------------------------------------------------------------


def enc_varint(v: int) -> bytes:
    out = bytearray()
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def enc_tag(field_no: int, wire_type: int) -> bytes:
    return enc_varint((field_no << 3) | wire_type)


def enc_varint_field(field_no: int, v: int) -> bytes:
    return enc_tag(field_no, 0) + enc_varint(v)


def enc_sub(field_no: int, payload: bytes) -> bytes:
    """Length-delimited field (submessage / string / bytes)."""
    return enc_tag(field_no, 2) + enc_varint(len(payload)) + payload


def enc_str(field_no: int, s: str) -> bytes:
    return enc_sub(field_no, s.encode())


def enc_field(name: str, new_value: str, old_value: str = "") -> bytes:
    body = enc_str(1, name) + enc_str(2, new_value)
    if old_value:
        body += enc_str(3, old_value)
    return body


def enc_map_entry(k: str, v: str) -> bytes:
    return enc_str(1, k) + enc_str(2, v)


def enc_table_change(
    table: str,
    fields: dict[str, str],
    composite_pk: dict[str, str] | None = None,
    single_pk: str | None = None,
    ordinal: int = 0,
    operation: int = 1,
) -> bytes:
    body = enc_str(1, table)
    if single_pk is not None:
        body += enc_str(2, single_pk)
    if ordinal:
        body += enc_varint_field(3, ordinal)
    body += enc_varint_field(4, operation)
    if composite_pk is not None:
        cpk = b"".join(enc_sub(1, enc_map_entry(k, v)) for k, v in composite_pk.items())
        body += enc_sub(5, cpk)
    for n, v in fields.items():
        body += enc_sub(6, enc_field(n, v, old_value="stale"))
    return body


def enc_database_changes(*table_changes: bytes) -> bytes:
    return b"".join(enc_sub(1, tc) for tc in table_changes)


# ---------------------------------------------------------------------------
# primitives
# ---------------------------------------------------------------------------


class TestWirePrimitives:
    def test_varint_roundtrip(self):
        for v in (0, 1, 127, 128, 300, 2**32, 2**63, 2**64 - 1):
            got, i = read_varint(enc_varint(v), 0)
            assert got == v and i == len(enc_varint(v))

    def test_truncated_varint(self):
        with pytest.raises(ProtoWireError):
            read_varint(b"\x80", 0)

    def test_truncated_length_delimited(self):
        with pytest.raises(ProtoWireError):
            list(iter_fields(enc_tag(1, 2) + enc_varint(10) + b"abc"))

    def test_unknown_fields_skipped(self):
        """proto3 forward compatibility: unknown varint/fixed64/fixed32
        fields must be skipped, not break the decode."""
        buf = (
            enc_varint_field(99, 7)
            + enc_tag(98, 1) + (1234).to_bytes(8, "little")
            + enc_tag(97, 5) + (56).to_bytes(4, "little")
            + enc_str(1, "x")
        )
        fields = list(iter_fields(buf))
        assert [f[0] for f in fields] == [99, 98, 97, 1]
        assert fields[3][2] == b"x"


# ---------------------------------------------------------------------------
# DatabaseChanges (T1)
# ---------------------------------------------------------------------------


class TestDatabaseChanges:
    def test_composite_pk_and_fields(self):
        raw = enc_database_changes(
            enc_table_change(
                "transfers",
                {"amount": "100", "to": "0xabc"},
                composite_pk={"evt_tx_hash": "0x7", "evt_index": "3"},
                ordinal=42,
                operation=2,
            )
        )
        (tc,) = decode_database_changes(raw)
        assert tc["table"] == "transfers"
        assert tc["composite_pk"] == {"evt_tx_hash": "0x7", "evt_index": "3"}
        assert tc["pk"] is None
        assert tc["ordinal"] == 42 and tc["operation"] == "update"
        assert {f["name"]: f["new_value"] for f in tc["fields"]} == {
            "amount": "100",
            "to": "0xabc",
        }
        # old_value present on the wire, preserved at decode level
        assert all(f["old_value"] == "stale" for f in tc["fields"])

    def test_row_contract_drops_old_value_and_single_pk(self):
        """table_change_rows folds to the engine contract: fields map
        drops old_value (ref main.rs:291-297); a single scalar pk becomes
        an empty map because the reference ignores it (ref loader.rs:147)."""
        raw = enc_database_changes(
            enc_table_change("t1", {"a": "1"}, single_pk="ignored"),
            enc_table_change("t2", {"b": "2"}, composite_pk={"k": "v"}),
        )
        rows = table_change_rows(raw)
        assert rows == [
            {"table": "t1", "fields": {"a": "1"}, "pk": {}},
            {"table": "t2", "fields": {"b": "2"}, "pk": {"k": "v"}},
        ]

    def test_empty_changes(self):
        assert decode_database_changes(b"") == []


# ---------------------------------------------------------------------------
# Substreams envelope (S1/S3)
# ---------------------------------------------------------------------------


def enc_block_scoped_data(num: int, cursor: str, final_height: int, payload: bytes) -> bytes:
    any_msg = enc_str(1, "type.googleapis.com/sf.substreams.sink.database.v1.DatabaseChanges") + enc_sub(2, payload)
    output = enc_str(1, "db_out") + enc_sub(2, any_msg)
    clock = enc_str(1, f"blk-{num}") + enc_varint_field(2, num) + enc_sub(
        3, enc_varint_field(1, 1722988800 + num)
    )
    return (
        enc_sub(1, output)
        + enc_sub(2, clock)
        + enc_str(3, cursor)
        + enc_varint_field(4, final_height)
    )


class TestEnvelope:
    def test_block_scoped_data(self):
        changes = enc_database_changes(enc_table_change("t", {"a": "1"}))
        raw = enc_block_scoped_data(7, "cur-7", 3, changes)
        got = decode_block_scoped_data(raw)
        assert got["clock"]["number"] == 7 and got["clock"]["id"] == "blk-7"
        assert got["cursor"] == "cur-7" and got["final_block_height"] == 3
        assert table_change_rows(got["payload"]) == [
            {"table": "t", "fields": {"a": "1"}, "pk": {}}
        ]

    def test_undo_signal(self):
        block_ref = enc_str(1, "blk-5") + enc_varint_field(2, 5)
        raw = enc_sub(1, block_ref) + enc_str(2, "cur-5")
        got = decode_block_undo_signal(raw)
        assert got["last_valid_block"] == 5
        assert got["last_valid_cursor"] == "cur-5"

    def test_response_demux(self):
        """S3: the oneof classifies to the same msg_type vocabulary the
        source demux uses (ref substreams_stream.rs:158-216)."""
        data = enc_block_scoped_data(1, "c", 0, b"")
        assert decode_response(enc_sub(3, data))["msg_type"] == "new"
        undo = enc_sub(1, enc_varint_field(2, 5)) + enc_str(2, "c")
        assert decode_response(enc_sub(4, undo))["msg_type"] == "undo"
        assert decode_response(enc_sub(1, b""))["msg_type"] == "session"
        assert decode_response(enc_sub(2, b""))["msg_type"] == "progress"
        assert decode_response(enc_sub(10, b""))["msg_type"] == "skip"


class TestPackage:
    def test_decode_package(self):
        module = (
            enc_str(1, "db_out")
            + enc_sub(2, enc_str(1, "proto:DatabaseChanges"))
            + enc_varint_field(8, 100)
        )
        meta = enc_str(1, "v1.2.3") + enc_str(3, "my-subgraph")
        pkg = (
            enc_varint_field(5, 1)
            + enc_sub(6, enc_sub(1, module))
            + enc_sub(8, meta)
            + enc_str(9, "mainnet")
            + enc_str(11, "db_out")
        )
        got = decode_package(pkg)
        assert got["version"] == 1
        assert got["network"] == "mainnet" and got["sink_module"] == "db_out"
        assert got["modules"] == [
            {
                "name": "db_out",
                "kind": "map",
                "output_type": "proto:DatabaseChanges",
                "binary_index": 0,
                "binary_entrypoint": "",
                "initial_block": 100,
            }
        ]
        assert got["package_meta"] == [
            {"version": "v1.2.3", "url": "", "name": "my-subgraph"}
        ]


# ---------------------------------------------------------------------------
# end-to-end: protobuf payloads through the full pipeline
# ---------------------------------------------------------------------------


@pytest.fixture()
def tmpdir():
    with tempfile.TemporaryDirectory(prefix="elric_proto_") as d:
        yield d


class TestDecoderParity:
    def test_json_and_protobuf_paths_agree(self, spark):
        """The same logical change-set fed through decode_changes (JSON
        stand-in) and decode_changes_protobuf (wire bytes) must produce
        IDENTICAL downstream rows — the gate against decoder drift."""
        import json

        from elric_rs_spark.streaming.pipeline import (
            decode_changes,
            decode_changes_protobuf,
        )

        logical = [
            {"table": "t1", "fields": {"a": "1", "b": "x"},
             "pk": {"k1": "p1", "k2": "p2"}},
            {"table": "t2", "fields": {"a": "shadow", "c": "3"},
             "pk": {"a": "pk_wins", "k": "v"}},
            {"table": "t3", "fields": {"only": "field"}, "pk": {}},
        ]
        base = ("s1", 1, "b1", "c1")
        json_df = spark.createDataFrame(
            [(*base, json.dumps(logical))],
            "stream_id string, block_num long, block_id string, "
            "cursor string, payload string",
        )
        wire = enc_database_changes(
            enc_table_change("t1", {"a": "1", "b": "x"},
                             composite_pk={"k1": "p1", "k2": "p2"}),
            enc_table_change("t2", {"a": "shadow", "c": "3"},
                             composite_pk={"a": "pk_wins", "k": "v"}),
            enc_table_change("t3", {"only": "field"}),
        )
        proto_df = spark.createDataFrame(
            [(*base, base64.b64encode(wire).decode())],
            "stream_id string, block_num long, block_id string, "
            "cursor string, payload string",
        )

        def rows(df):
            return sorted(
                (r.table, r.block_num, sorted(r.row_map.items()))
                for r in df.collect()
            )

        assert rows(decode_changes(json_df)) == rows(
            decode_changes_protobuf(proto_df)
        )


class TestProtobufPipeline:
    def test_process_data_end_to_end(self, spark, tmpdir):
        """The reference's test_process_data on the REAL wire format:
        hand-encoded DatabaseChanges bytes ride the block stream as base64
        payloads, the mapInPandas wire decoder replaces from_json, and
        every downstream stage (PK merge, typed cast, per-table sink,
        cursor) is unchanged and asserted on."""
        from pyspark.sql import functions as F

        from elric_rs_spark.streaming.pipeline import (
            TypedPerTableSink,
            decode_changes_protobuf,
            run_pipeline,
        )
        from elric_rs_spark.streaming.sink import load_persisted_cursor
        from elric_rs_spark.streaming.source import land_blocks

        def payload(n: int) -> str:
            raw = enc_database_changes(
                enc_table_change(
                    "transfers",
                    {"amount": str(n * 10), "memo": f"m{n}"},
                    composite_pk={"evt_tx_hash": f"0x{n:x}", "evt_index": str(n)},
                ),
                enc_table_change(
                    "approvals",
                    {"owner": f"o{n}", "amount": str(n)},
                    single_pk="SHOULD_BE_IGNORED",
                ),
            )
            return base64.b64encode(raw).decode()

        msgs = [
            {
                "stream_id": "s1",
                "msg_type": "new",
                "block_num": n,
                "block_id": f"blk-{n:08d}",
                "block_ts": None,
                "cursor": str(n),
                "final_block_height": max(n - 3, 0),
                "last_valid_block": None,
                "payload": payload(n),
            }
            for n in range(10)
        ]
        landing, ckpt, out = (f"{tmpdir}/{d}" for d in ("landing", "ckpt", "out"))
        land_blocks(spark, msgs, landing)
        sink = TypedPerTableSink(
            out,
            {
                "transfers": {
                    "amount": "UInt64",
                    "memo": "String",
                    "evt_tx_hash": "String",
                    "evt_index": "UInt32",
                },
                "approvals": {"owner": "String", "amount": "UInt64"},
            },
            decode=decode_changes_protobuf,
        )
        q = run_pipeline(spark, landing, ckpt, sink)
        q.awaitTermination(120)

        transfers = spark.read.parquet(f"{out}/data/transfers")
        # watermark at block 9 is 6 -> blocks 0..6 finalized
        assert sorted(r.block_num for r in transfers.collect()) == list(range(7))
        row = transfers.filter(F.col("block_num") == 5).collect()[0]
        assert row.amount == 50  # typed from wire string
        assert row.evt_tx_hash == "0x5" and row.evt_index == 5  # composite PK merged
        approvals = spark.read.parquet(f"{out}/data/approvals")
        arow = approvals.filter(F.col("block_num") == 5).collect()[0]
        assert arow.owner == "o5"  # single PK ignored, field kept
        assert load_persisted_cursor(spark, out, "s1") == "6"
