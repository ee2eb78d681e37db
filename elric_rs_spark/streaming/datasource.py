"""Substreams block source as a first-class PySpark Data Source
(SURVEY.md S1/S2 — the Spark-native transport surface).

PySpark 4's Python Data Source API lets the block stream plug into
Structured Streaming as `spark.readStream.format("substreams")` instead
of the reader-thread + parquet-landing-dir topology (source.py — still
the deployment of choice when upstream liveness must be decoupled from
micro-batch cadence). The API maps 1:1 onto the reference's semantics:

- Spark's **offset log** checkpoints `{"seq", "cursor"}` per micro-batch
  — the same opaque-cursor resume the reference persists to its
  `cursors` table (ref loader.rs:195-210, main.rs:299-310). On restart
  Spark hands back the last committed offset and the reader reconnects
  from that cursor; no sink-side cursor scan needed (ours remains for
  reference parity).
- The reader runs ON THE DRIVER (SimpleDataSourceStreamReader): a
  Substreams endpoint is a single-consumer gRPC stream — the same
  topology as the reference's one stream consumer (ref main.rs:150-233).
  Parallelism belongs downstream (the per-table fan-out), not in the
  source.
- Reconnect/backoff/fatal-auth semantics come from the SAME
  ReconnectingReader used by the landing-dir path (source.py:44-120,
  ref substreams_stream.rs:53-149).

Two transports, chosen by options:
- `fixture_sf_dir`: deterministic replay built from events.parquet
  (read via pyarrow — no Spark needed inside the reader), optional
  `undo_at` reorg injection.
- `transport_factory`: dotted `module:callable` path resolved by
  import; called as `factory(cursor)` and must return an iterator of
  message dicts (the gRPC adapter in transport.py has this contract).
  Options are strings because Data Source options travel through SQL
  conf — the factory path keeps injection test-friendly without
  pickling live objects.
"""

from __future__ import annotations

import importlib
import itertools
from collections.abc import Iterator
from typing import Any

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    SimpleDataSourceStreamReader,
)
from pyspark.sql.types import StructType

from elric_rs_spark.streaming.source import BLOCK_STREAM_SCHEMA, ReconnectingReader, demux

_FIELDS = [f.split()[0] for f in BLOCK_STREAM_SCHEMA.split(", ")]


def _fixture_messages(options: dict) -> list[dict]:
    """fixture_replay's message stream, derived from events.parquet with
    pyarrow only (the reader must not depend on a SparkSession). The
    per-message dict shape comes from the SAME builders the landing-dir
    replay uses (source.fixture_new_message/fixture_undo_message)."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from elric_rs_spark.streaming.source import fixture_stream_from_rows

    sf_dir = options["fixture_sf_dir"]
    reorg_depth = int(options.get("reorg_depth", "12"))
    undo_at = int(options["undo_at"]) if "undo_at" in options else None
    t = pq.read_table(f"{sf_dir}/events.parquet", columns=["event_id", "ts", "props"])
    # fixture parquet carries TIMESTAMP(NANOS); downstream schema is µs —
    # truncate exactly as tables.load_table's ns->µs cache copy does
    t = t.set_column(
        1,
        "ts",
        pc.cast(
            t.column("ts"),
            options=pc.CastOptions(target_type=pa.timestamp("us"), allow_time_truncate=True),
        ),
    )
    rows = sorted(t.to_pylist(), key=lambda r: r["event_id"])
    return fixture_stream_from_rows(
        ((r["event_id"], r["ts"], r["props"]) for r in rows),
        reorg_depth,
        undo_at,
    )


def _resolve_factory(path: str, extra_sys_path: str | None = None):
    """Resolve `module:callable`. The stream reader executes in Spark's
    Python data-source runner process, whose sys.path is the bare
    driver interpreter — `factory_sys_path` lets deployments point at
    the directory that holds their transport module."""
    if extra_sys_path:
        import sys

        if extra_sys_path not in sys.path:
            sys.path.insert(0, extra_sys_path)
    mod, _, attr = path.partition(":")
    return getattr(importlib.import_module(mod), attr)


class SubstreamsStreamReader(SimpleDataSourceStreamReader):
    """Driver-side stream reader: offset = {"seq": int, "cursor": str}.

    `read(start)` returns at most `batch_size` messages per micro-batch.
    Fixture mode is seq-addressable (the deterministic replay list);
    live-factory mode holds ONE open ReconnectingReader and drains it
    incrementally — it connects lazily FROM THE CHECKPOINTED CURSOR, so
    a driver restart resumes mid-stream instead of re-reading from
    genesis, and nothing is ever materialized beyond the current chunk.
    `readBetweenOffsets` replays a committed range after failure: exact
    for the fixture; for a live factory it reconnects at the range's
    start cursor (Substreams replay is deterministic for a cursor range).
    A quiet live stream blocks read() until messages arrive — production
    factories should yield in bounded chunks (the transport layer owns
    liveness, same as the reference's single stream consumer).
    """

    def __init__(self, options: dict) -> None:
        self.batch_size = int(options.get("batch_size", "256"))
        self.options = dict(options)
        self._messages: list[dict] | None = None  # fixture mode
        self._live: Iterator[dict] | None = None  # factory mode
        self._live_seq = 0

    # -- message supply -------------------------------------------------
    def _fixture_mode(self) -> bool:
        return "fixture_sf_dir" in self.options

    def _all_messages(self) -> list[dict]:
        if self._messages is None:
            self._messages = list(demux(_fixture_messages(self.options)))
        return self._messages

    def _connect_live(self, cursor: str | None) -> Iterator[dict]:
        factory = _resolve_factory(
            self.options["transport_factory"],
            self.options.get("factory_sys_path"),
        )
        return iter(
            demux(ReconnectingReader(connect=factory, latest_cursor=cursor or None))
        )

    # -- offset protocol ------------------------------------------------
    def initialOffset(self) -> dict:
        return {"seq": 0, "cursor": ""}

    @staticmethod
    def _chunk_cursor(chunk: list[dict], prev: str) -> str:
        for m in reversed(chunk):
            if m.get("cursor"):
                return m["cursor"]
        return prev

    def read(self, start: dict) -> tuple[Iterator[tuple], dict]:
        i = int(start["seq"])
        if self._fixture_mode():
            chunk = self._all_messages()[i : i + self.batch_size]
        else:
            if self._live is None or self._live_seq != i:
                # fresh process or offset rewind: (re)connect from the
                # checkpointed cursor, the reference's resume semantic
                self._live = self._connect_live(start.get("cursor"))
                self._live_seq = i
            chunk = list(itertools.islice(self._live, self.batch_size))
            self._live_seq = i + len(chunk)
        end = {
            "seq": i + len(chunk),
            "cursor": self._chunk_cursor(chunk, start.get("cursor", "")),
        }
        return iter([self._row(m, i + j) for j, m in enumerate(chunk)]), end

    def readBetweenOffsets(self, start: dict, end: dict) -> Iterator[tuple]:
        lo, hi = int(start["seq"]), int(end["seq"])
        if self._fixture_mode():
            msgs = self._all_messages()[lo:hi]
        else:
            replay = self._connect_live(start.get("cursor"))
            msgs = list(itertools.islice(replay, hi - lo))
        return iter([self._row(m, lo + j) for j, m in enumerate(msgs)])

    def commit(self, end: dict) -> None:
        # Spark's offset log is the durable cursor store; nothing to do.
        pass

    # -- row shaping ----------------------------------------------------
    @staticmethod
    def _row(m: dict, seq: int) -> tuple:
        vals: list[Any] = [m.get(f) for f in _FIELDS[:-1]]
        vals.append(seq)
        return tuple(vals)


class SubstreamsBatchReader(DataSourceReader):
    """Batch form: the full replay as one scan (backfill / test oracle).
    Works for either transport; a live factory must be FINITE here (a
    batch scan has no offset to stop at)."""

    def __init__(self, options: dict) -> None:
        self.options = dict(options)

    def read(self, partition) -> Iterator[tuple]:
        if "fixture_sf_dir" in self.options:
            msgs = list(demux(_fixture_messages(self.options)))
        elif "transport_factory" in self.options:
            factory = _resolve_factory(
                self.options["transport_factory"],
                self.options.get("factory_sys_path"),
            )
            msgs = list(demux(ReconnectingReader(connect=factory)))
        else:
            raise ValueError(
                "substreams source needs fixture_sf_dir or transport_factory"
            )
        return iter(
            [SubstreamsStreamReader._row(m, i) for i, m in enumerate(msgs)]
        )


class SubstreamsDataSource(DataSource):
    """`spark.read[Stream].format("substreams")` — see module docstring."""

    @classmethod
    def name(cls) -> str:
        return "substreams"

    def schema(self) -> str:
        return BLOCK_STREAM_SCHEMA

    def reader(self, schema: StructType) -> DataSourceReader:
        return SubstreamsBatchReader(self.options)

    def simpleStreamReader(self, schema: StructType) -> SimpleDataSourceStreamReader:
        return SubstreamsStreamReader(self.options)


def register(spark) -> None:
    spark.dataSource.register(SubstreamsDataSource)
