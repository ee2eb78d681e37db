"""Minimal pure-Python protobuf wire-format decoder (SURVEY.md T1/S4).

The reference decodes its change payloads with prost:
`DatabaseChanges::decode(any.value.as_ref())` (ref loader.rs:128-129),
where the message types come from the public `substreams-database-change`
crate v1.2.1 (ref Cargo.toml:20) in package
`sf.substreams.sink.database.v1`:

    message DatabaseChanges { repeated TableChange table_changes = 1; }
    message TableChange {
      string table = 1;
      oneof primary_key { string pk = 2; CompositePrimaryKey composite_pk = 5; }
      uint64 ordinal = 3;
      Operation operation = 4;      // UNSET=0 CREATE=1 UPDATE=2 DELETE=3
      repeated Field fields = 6;
    }
    message CompositePrimaryKey { map<string, string> keys = 1; }
    message Field { string name = 1; string new_value = 2; string old_value = 3; }

The container has no protobuf toolchain, so this module implements the
four wire types of the protobuf encoding (varint / fixed64 /
length-delimited / fixed32) and hand-rolled decoders for exactly the
messages the engine consumes: DatabaseChanges (T1), the Substreams
response envelope (S1/S3: Response, BlockScopedData, BlockUndoSignal,
Clock, Any — tags per ref pb/sf.substreams.rpc.v2.rs:55-141) and the
`.spkg` Package (S4: tags per ref pb/sf.substreams.v1.rs:209-229).

Decoding follows proto3 rules the engine relies on: unknown fields are
skipped (forward compatibility), later scalar occurrences win, repeated
message fields append, map fields are repeated entry messages with
key=1/value=2. Strings decode as UTF-8 with surrogate-safe replacement
(the sink layer treats every value as an opaque string anyway).
"""

from __future__ import annotations

from typing import Iterator

WIRE_VARINT = 0
WIRE_FIXED64 = 1
WIRE_LEN = 2
WIRE_FIXED32 = 5

OPERATIONS = {0: "unset", 1: "create", 2: "update", 3: "delete"}


class ProtoWireError(ValueError):
    """Malformed wire data (truncated varint/field, bad wire type)."""


def read_varint(buf: bytes, i: int) -> tuple[int, int]:
    """Decode one base-128 varint at offset i; return (value, next_i)."""
    val = 0
    shift = 0
    while True:
        if i >= len(buf):
            raise ProtoWireError("truncated varint")
        b = buf[i]
        i += 1
        val |= (b & 0x7F) << shift
        if not b & 0x80:
            return val, i
        shift += 7
        if shift >= 70:
            raise ProtoWireError("varint exceeds 10 bytes")


def iter_fields(buf: bytes) -> Iterator[tuple[int, int, object]]:
    """Yield (field_number, wire_type, raw_value) for one message body.

    raw_value is int for varint/fixed; bytes for length-delimited.
    Groups (wire types 3/4) are proto2-era and rejected."""
    i = 0
    n = len(buf)
    while i < n:
        tag, i = read_varint(buf, i)
        field_no, wt = tag >> 3, tag & 0x7
        if field_no == 0:
            raise ProtoWireError("field number 0")
        if wt == WIRE_VARINT:
            val, i = read_varint(buf, i)
        elif wt == WIRE_FIXED64:
            if i + 8 > n:
                raise ProtoWireError("truncated fixed64")
            val = int.from_bytes(buf[i : i + 8], "little")
            i += 8
        elif wt == WIRE_LEN:
            ln, i = read_varint(buf, i)
            if i + ln > n:
                raise ProtoWireError("truncated length-delimited field")
            val = buf[i : i + ln]
            i += ln
        elif wt == WIRE_FIXED32:
            if i + 4 > n:
                raise ProtoWireError("truncated fixed32")
            val = int.from_bytes(buf[i : i + 4], "little")
            i += 4
        else:
            raise ProtoWireError(f"unsupported wire type {wt}")
        yield field_no, wt, val


def _utf8(b: bytes) -> str:
    return b.decode("utf-8", errors="replace")


def _string_map(buf: bytes) -> dict[str, str]:
    """map<string,string>: repeated entry messages with key=1, value=2."""
    out: dict[str, str] = {}
    for fno, wt, val in iter_fields(buf):
        if fno != 1 or wt != WIRE_LEN:
            continue
        k = v = ""
        for efno, ewt, eval_ in iter_fields(val):
            if efno == 1 and ewt == WIRE_LEN:
                k = _utf8(eval_)
            elif efno == 2 and ewt == WIRE_LEN:
                v = _utf8(eval_)
        out[k] = v
    return out


# ---------------------------------------------------------------------------
# sf.substreams.sink.database.v1 (T1 — ref loader.rs:128-129)
# ---------------------------------------------------------------------------


def decode_field(buf: bytes) -> dict:
    f = {"name": "", "new_value": "", "old_value": ""}
    for fno, wt, val in iter_fields(buf):
        if wt != WIRE_LEN:
            continue
        if fno == 1:
            f["name"] = _utf8(val)
        elif fno == 2:
            f["new_value"] = _utf8(val)
        elif fno == 3:
            f["old_value"] = _utf8(val)
    return f


def decode_table_change(buf: bytes) -> dict:
    tc = {
        "table": "",
        "pk": None,  # str (single) — silently ignored downstream
        "composite_pk": None,  # dict (merged downstream, ref loader.rs:143-149)
        "ordinal": 0,
        "operation": "unset",
        "fields": [],
    }
    for fno, wt, val in iter_fields(buf):
        if fno == 1 and wt == WIRE_LEN:
            tc["table"] = _utf8(val)
        elif fno == 2 and wt == WIRE_LEN:
            tc["pk"] = _utf8(val)
            tc["composite_pk"] = None  # oneof: later field wins
        elif fno == 3 and wt == WIRE_VARINT:
            tc["ordinal"] = val
        elif fno == 4 and wt == WIRE_VARINT:
            tc["operation"] = OPERATIONS.get(val, "unset")
        elif fno == 5 and wt == WIRE_LEN:
            tc["composite_pk"] = _string_map(val)
            tc["pk"] = None
        elif fno == 6 and wt == WIRE_LEN:
            tc["fields"].append(decode_field(val))
    return tc


def decode_database_changes(buf: bytes) -> list[dict]:
    """`DatabaseChanges` bytes -> list of table-change dicts."""
    return [
        decode_table_change(val)
        for fno, wt, val in iter_fields(buf)
        if fno == 1 and wt == WIRE_LEN
    ]


def table_change_rows(buf: bytes) -> list[dict]:
    """Decode + fold to the engine's downstream contract: one dict per
    change with `table`, `fields` (name -> new_value, old_value dropped —
    ref main.rs:291-297) and `pk` (composite keys as a map; a single
    scalar pk becomes an EMPTY map because the reference silently ignores
    it, ref loader.rs:147). Matches the JSON stand-in structure consumed
    by streaming/pipeline.decode_changes, so either decode path feeds the
    same merge/cast/sink stages."""
    rows = []
    for tc in decode_database_changes(buf):
        rows.append(
            {
                "table": tc["table"],
                "fields": {f["name"]: f["new_value"] for f in tc["fields"]},
                "pk": dict(tc["composite_pk"]) if tc["composite_pk"] else {},
            }
        )
    return rows


# ---------------------------------------------------------------------------
# sf.substreams.rpc.v2 envelope (S1/S3 — ref pb/sf.substreams.rpc.v2.rs)
# ---------------------------------------------------------------------------


def decode_any(buf: bytes) -> dict:
    """google.protobuf.Any: type_url=1, value=2."""
    out = {"type_url": "", "value": b""}
    for fno, wt, val in iter_fields(buf):
        if fno == 1 and wt == WIRE_LEN:
            out["type_url"] = _utf8(val)
        elif fno == 2 and wt == WIRE_LEN:
            out["value"] = val
    return out


def decode_clock(buf: bytes) -> dict:
    """sf.substreams.v1.Clock: id=1, number=2, timestamp=3
    (ref pb/sf.substreams.v1.rs:252-261). Timestamp is the well-known
    google.protobuf.Timestamp (seconds=1, nanos=2)."""
    out = {"id": "", "number": 0, "timestamp": None}
    for fno, wt, val in iter_fields(buf):
        if fno == 1 and wt == WIRE_LEN:
            out["id"] = _utf8(val)
        elif fno == 2 and wt == WIRE_VARINT:
            out["number"] = val
        elif fno == 3 and wt == WIRE_LEN:
            secs = nanos = 0
            for tfno, twt, tval in iter_fields(val):
                if tfno == 1 and twt == WIRE_VARINT:
                    secs = tval
                elif tfno == 2 and twt == WIRE_VARINT:
                    nanos = tval
            out["timestamp"] = secs + nanos / 1e9
    return out


def decode_block_scoped_data(buf: bytes) -> dict:
    """BlockScopedData: output=1 (MapModuleOutput), clock=2, cursor=3,
    final_block_height=4 (ref pb/sf.substreams.rpc.v2.rs:84-100). The
    payload is output.map_output (an Any) — its value carries the
    DatabaseChanges bytes."""
    out = {"clock": None, "cursor": "", "final_block_height": 0, "payload": b""}
    for fno, wt, val in iter_fields(buf):
        if fno == 1 and wt == WIRE_LEN:
            for mfno, mwt, mval in iter_fields(val):
                if mfno == 2 and mwt == WIRE_LEN:  # map_output Any
                    out["payload"] = decode_any(mval)["value"]
        elif fno == 2 and wt == WIRE_LEN:
            out["clock"] = decode_clock(val)
        elif fno == 3 and wt == WIRE_LEN:
            out["cursor"] = _utf8(val)
        elif fno == 4 and wt == WIRE_VARINT:
            out["final_block_height"] = val
    return out


def decode_block_undo_signal(buf: bytes) -> dict:
    """BlockUndoSignal: last_valid_block=1 (BlockRef: id=1, number=2),
    last_valid_cursor=2 (ref pb/sf.substreams.rpc.v2.rs:73-83)."""
    out = {"last_valid_block": 0, "last_valid_block_id": "", "last_valid_cursor": ""}
    for fno, wt, val in iter_fields(buf):
        if fno == 1 and wt == WIRE_LEN:
            for bfno, bwt, bval in iter_fields(val):
                if bfno == 1 and bwt == WIRE_LEN:
                    out["last_valid_block_id"] = _utf8(bval)
                elif bfno == 2 and bwt == WIRE_VARINT:
                    out["last_valid_block"] = bval
        elif fno == 2 and wt == WIRE_LEN:
            out["last_valid_cursor"] = _utf8(val)
    return out


def decode_response(buf: bytes) -> dict:
    """Response oneof (ref pb/sf.substreams.rpc.v2.rs:55-71):
    session=1 / progress=2 / block_scoped_data=3 / block_undo_signal=4 /
    debug snapshots=10,11. Returns the S3 demux classification directly:
    msg_type in {new, undo, session, progress, skip}."""
    for fno, wt, val in iter_fields(buf):
        if wt != WIRE_LEN:
            continue
        if fno == 3:
            return {"msg_type": "new", **decode_block_scoped_data(val)}
        if fno == 4:
            return {"msg_type": "undo", **decode_block_undo_signal(val)}
        if fno == 1:
            return {"msg_type": "session"}
        if fno == 2:
            return {"msg_type": "progress"}
    return {"msg_type": "skip"}


# ---------------------------------------------------------------------------
# sf.substreams.v1.Package (S4 — ref main.rs:312-315)
# ---------------------------------------------------------------------------


def decode_module(buf: bytes) -> dict:
    """Module: name=1, kind_map=2 / kind_store=3 (oneof), binary_index=4,
    binary_entrypoint=5, initial_block=8 (ref pb/sf.substreams.v1.rs:21-46).
    kind_map carries output_type=1 — what the loader needs to find the
    database-changes module."""
    m = {
        "name": "",
        "kind": "unset",
        "output_type": "",
        "binary_index": 0,
        "binary_entrypoint": "",
        "initial_block": 0,
    }
    for fno, wt, val in iter_fields(buf):
        if fno == 1 and wt == WIRE_LEN:
            m["name"] = _utf8(val)
        elif fno == 2 and wt == WIRE_LEN:
            m["kind"] = "map"
            for kfno, kwt, kval in iter_fields(val):
                if kfno == 1 and kwt == WIRE_LEN:
                    m["output_type"] = _utf8(kval)
        elif fno == 3 and wt == WIRE_LEN:
            m["kind"] = "store"
            for kfno, kwt, kval in iter_fields(val):
                if kfno == 2 and kwt == WIRE_LEN:
                    m["output_type"] = _utf8(kval)
        elif fno == 4 and wt == WIRE_VARINT:
            m["binary_index"] = val
        elif fno == 5 and wt == WIRE_LEN:
            m["binary_entrypoint"] = _utf8(val)
        elif fno == 8 and wt == WIRE_VARINT:
            m["initial_block"] = val
    return m


def decode_package(buf: bytes) -> dict:
    """Package: version=5, modules=6 (Modules{modules=1}), package_meta=8
    (PackageMetadata{version=1,url=2,name=3}), network=9, sink_module=11
    (ref pb/sf.substreams.v1.rs:209-229). proto_files (tag 1, descriptor
    blobs) are skipped — the engine does not compile WASM modules."""
    pkg = {
        "version": 0,
        "modules": [],
        "modules_raw": b"",  # verbatim Modules bytes, re-embedded in Request
        "package_meta": [],
        "network": "",
        "sink_module": "",
    }
    for fno, wt, val in iter_fields(buf):
        if fno == 5 and wt == WIRE_VARINT:
            pkg["version"] = val
        elif fno == 6 and wt == WIRE_LEN:
            pkg["modules_raw"] = val
            for mfno, mwt, mval in iter_fields(val):
                if mfno == 1 and mwt == WIRE_LEN:
                    pkg["modules"].append(decode_module(mval))
        elif fno == 8 and wt == WIRE_LEN:
            meta = {"version": "", "url": "", "name": ""}
            for pfno, pwt, pval in iter_fields(val):
                if pwt != WIRE_LEN:
                    continue
                if pfno == 1:
                    meta["version"] = _utf8(pval)
                elif pfno == 2:
                    meta["url"] = _utf8(pval)
                elif pfno == 3:
                    meta["name"] = _utf8(pval)
            pkg["package_meta"].append(meta)
        elif fno == 9 and wt == WIRE_LEN:
            pkg["network"] = _utf8(val)
        elif fno == 11 and wt == WIRE_LEN:
            pkg["sink_module"] = _utf8(val)
    return pkg


# ---------------------------------------------------------------------------
# Request encoder (S1 — the one message the client SENDS;
# tags per ref pb/sf.substreams.rpc.v2.rs:4-43, values per
# ref substreams_stream.rs:72-85)
# ---------------------------------------------------------------------------


def write_varint(v: int) -> bytes:
    """Encode one varint; negative ints use 64-bit two's complement
    (proto int64 rule — always 10 bytes when negative)."""
    v &= (1 << 64) - 1
    out = bytearray()
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _write_tag(field_no: int, wire_type: int) -> bytes:
    return write_varint((field_no << 3) | wire_type)


def _write_varint_field(field_no: int, v: int) -> bytes:
    return b"" if v == 0 else _write_tag(field_no, WIRE_VARINT) + write_varint(v)


def _write_len_field(field_no: int, payload: bytes) -> bytes:
    if not payload:
        return b""
    return _write_tag(field_no, WIRE_LEN) + write_varint(len(payload)) + payload


def encode_request(
    start_block_num: int = 0,
    start_cursor: str = "",
    stop_block_num: int = 0,
    output_module: str = "",
    modules_raw: bytes = b"",
    final_blocks_only: bool = False,
    production_mode: bool = True,
) -> bytes:
    """`sf.substreams.rpc.v2.Request` wire bytes. Defaults mirror the
    reference's hardcoded choices: final_blocks_only=false (finality is
    enforced client-side by T7, ref substreams_stream.rs:76) and
    production_mode=true (forward-parallel server execution,
    ref substreams_stream.rs:83). `modules_raw` is the verbatim Modules
    submessage from the .spkg (decode_package()["modules_raw"])."""
    return (
        _write_varint_field(1, start_block_num)
        + _write_len_field(2, start_cursor.encode())
        + _write_varint_field(3, stop_block_num)
        + _write_varint_field(4, int(final_blocks_only))
        + _write_varint_field(5, int(production_mode))
        + _write_len_field(6, output_module.encode())
        + _write_len_field(7, modules_raw)
    )
