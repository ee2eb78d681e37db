"""Finality buffering + undo/reorg handling (SURVEY.md T7/T8).

Reference semantics (ref loader.rs:24, 82-109, 177-193):
- Keep an ordered buffer of not-yet-final blocks, capped at 12.
- On each new block: append; emit (flush to sink) the prefix of buffered
  blocks whose block_num <= the incoming final_block_height watermark.
- If the buffer still exceeds the cap, force-emit oldest blocks even if
  not final — bounded memory beats strict finality (ref loader.rs:92-101).
- On an undo signal (last_valid_block): drop buffered blocks with
  block_num > last_valid_block. Already-emitted blocks are unaffected —
  undo only ever touches pre-sink state (ref loader.rs:177-193).

Two implementations:
1. `FinalityBuffer` — the pure-Python state machine. Used directly in
   foreachBatch (single-consumer, exactly the reference's topology) and
   unit-tested against the reference's own three loader tests.
2. `apply_finality_stateful` — the distributed form via
   `transformWithStateInPandas`-style `applyInPandasWithState`, keyed by
   stream id, state = the buffered blocks. Scales to many independent
   streams; each stream's buffer is tiny (<=12 rows) so state stays small
   no matter the data volume.
"""

from __future__ import annotations

from dataclasses import dataclass, field

REORG_BUFFER_LEN = 12  # ref loader.rs:24 (BUFFER_LEN)


@dataclass
class Block:
    block_num: int
    block_id: str
    cursor: str
    final_block_height: int
    payload: object = None


@dataclass
class FinalityBuffer:
    """Single-stream finality state machine (ref loader.rs:82-109)."""

    buffer_len: int = REORG_BUFFER_LEN
    buffer: list[Block] = field(default_factory=list)

    def push(self, block: Block) -> list[Block]:
        """Append a block; return the blocks that became final (flushable).

        Mirrors get_final_blocks_from_buffer: (1) emit the prefix with
        block_num <= the incoming watermark; (2) overflow-emit the oldest
        blocks past the cap even if not final.
        """
        self.buffer.append(block)
        final: list[Block] = []
        # (1) finality prefix
        while self.buffer and self.buffer[0].block_num <= block.final_block_height:
            final.append(self.buffer.pop(0))
        # (2) bounded-memory overflow flush (ref loader.rs:92-101)
        while len(self.buffer) > self.buffer_len:
            final.append(self.buffer.pop(0))
        return final

    def undo(self, last_valid_block: int) -> int:
        """Drop buffered blocks above last_valid_block (ref loader.rs:177-193).
        Returns how many were dropped. Emitted blocks are never touched."""
        before = len(self.buffer)
        self.buffer = [b for b in self.buffer if b.block_num <= last_valid_block]
        return before - len(self.buffer)


# ---------------------------------------------------------------------------
# Distributed form: applyInPandasWithState over a keyed block stream.
# ---------------------------------------------------------------------------

FINALITY_OUTPUT_SCHEMA = (
    "stream_id string, block_num long, block_id string, cursor string, "
    "final_block_height long, payload string"
)
FINALITY_STATE_SCHEMA = (
    "block_num array<long>, block_id array<string>, cursor array<string>, "
    "final_height array<long>, payload array<string>"
)


def _replay_pdf(buf: FinalityBuffer, pdf, stream_id: str) -> list[tuple]:
    """Shared kernel: replay one pandas frame of messages through the
    buffer, returning flushed output tuples.

    Arrival order, not block order: block numbers repeat in the reorg
    case (an undo shares the dropped block's number; replacement blocks
    reuse numbers), and pandas' default quicksort is unstable. `seq` is
    the source's monotonic arrival counter. Rows with null seq (data
    landed by a pre-seq writer) sort FIRST in their original frame order
    (they were landed earlier; stable sort preserves file order within
    them). Frames with NO usable seq at all (column absent, or present
    but all-null) fall back to a stable block_num sort — a sort is still
    mandatory there because Spark gives no row-order guarantee after the
    groupBy shuffle."""
    if "seq" in pdf.columns and pdf["seq"].notna().any():
        pdf = pdf.sort_values("seq", kind="stable", na_position="first")
    else:
        pdf = pdf.sort_values("block_num", kind="stable")
    out_rows: list[tuple] = []
    for row in pdf.itertuples(index=False):
        if getattr(row, "msg_type", "new") == "undo":
            buf.undo(int(row.last_valid_block))
            continue
        flushed = buf.push(
            Block(
                int(row.block_num),
                str(row.block_id),
                str(row.cursor),
                int(row.final_block_height),
                getattr(row, "payload", None),
            )
        )
        out_rows.extend(
            (
                stream_id,
                b.block_num,
                b.block_id,
                b.cursor,
                b.final_block_height,
                b.payload,
            )
            for b in flushed
        )
    return out_rows


_OUTPUT_COLS = [
    "stream_id",
    "block_num",
    "block_id",
    "cursor",
    "final_block_height",
    "payload",
]


def _finality_func(key, pdf_iter, state):
    """Grouped-map-with-state kernel: replays FinalityBuffer per stream key.

    Input rows must arrive in block order within the micro-batch (the
    source guarantees per-stream ordering via `seq`). Undo signals are
    rows with msg_type='undo' and last_valid_block set.
    """
    import pandas as pd

    (stream_id,) = key
    if state.exists:
        nums, ids, curs, heights, payloads = state.get
        buf = FinalityBuffer(
            buffer=[
                Block(n, i, c, h, p)
                for n, i, c, h, p in zip(nums, ids, curs, heights, payloads)
            ]
        )
    else:
        buf = FinalityBuffer()

    out_rows: list[tuple] = []
    for pdf in pdf_iter:
        out_rows.extend(_replay_pdf(buf, pdf, stream_id))

    state.update(
        (
            [b.block_num for b in buf.buffer],
            [b.block_id for b in buf.buffer],
            [b.cursor for b in buf.buffer],
            [b.final_block_height for b in buf.buffer],
            [b.payload for b in buf.buffer],
        )
    )
    yield pd.DataFrame(out_rows, columns=_OUTPUT_COLS)


def apply_finality_stateful(block_df):
    """Wire the finality kernel onto a (streaming or batch-test) DataFrame
    with columns (stream_id, msg_type, block_num, block_id, cursor,
    final_block_height, last_valid_block)."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    return block_df.groupBy("stream_id").applyInPandasWithState(
        _finality_func,
        outputStructType=FINALITY_OUTPUT_SCHEMA,
        stateStructType=FINALITY_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# ---------------------------------------------------------------------------
# transformWithStateInPandas form (Spark 4's successor API): typed
# ListState instead of one packed state tuple, same replay kernel.
# Runtime requirements: the RocksDB state store provider
# (spark.sql.streaming.stateStore.providerClass=...RocksDBStateStoreProvider)
# AND the python `protobuf` package — TWS's state-server protocol itself
# speaks protobuf (verified: absent protobuf fails the driver worker with
# "cannot import google.protobuf.descriptor"). This container has no
# protobuf, so the TWS form is tested where available and the
# applyInPandasWithState form (above) remains the default everywhere.
# ---------------------------------------------------------------------------

_TWS_STATE_SCHEMA = (
    "block_num long, block_id string, cursor string, "
    "final_height long, payload string"
)


try:
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )
except ImportError:  # pragma: no cover - pre-4.0 PySpark
    # The TWS API is optional; its absence must not take down the
    # applyInPandasWithState form or FinalityBuffer (apply_finality_tws
    # itself will fail loudly at call time).
    class StatefulProcessor:  # type: ignore[no-redef]
        pass

    StatefulProcessorHandle = object  # type: ignore[assignment]


class FinalityProcessor(StatefulProcessor):
    """T7/T8 on transformWithStateInPandas: the buffered blocks live in a
    typed ListState (one row per buffered block) instead of
    applyInPandasWithState's single packed tuple — clearer state evolution
    and per-element append semantics at scale. Module-level class: the TWS
    driver worker pickles the processor instance."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._buf = handle.getListState("buffer", _TWS_STATE_SCHEMA)

    def handleInputRows(self, key, rows, timerValues):
        import pandas as pd

        (stream_id,) = key
        buf = FinalityBuffer(
            buffer=[Block(*t) for t in self._buf.get()]
            if self._buf.exists()
            else []
        )
        out_rows: list[tuple] = []
        for pdf in rows:
            out_rows.extend(_replay_pdf(buf, pdf, stream_id))
        if buf.buffer:
            self._buf.put(
                [
                    (b.block_num, b.block_id, b.cursor, b.final_block_height,
                     b.payload)
                    for b in buf.buffer
                ]
            )
        else:
            # put([]) is rejected by the state store
            # (ILLEGAL_STATE_STORE_VALUE.EMPTY_LIST_VALUE); a drained
            # buffer — everything flushed or undone — must clear() instead
            self._buf.clear()
        yield pd.DataFrame(out_rows, columns=_OUTPUT_COLS)

    def close(self) -> None:
        pass


def apply_finality_tws(block_df):
    """transformWithStateInPandas form of apply_finality_stateful — same
    input/output contract, state in a typed ListState."""
    return block_df.groupBy("stream_id").transformWithStateInPandas(
        statefulProcessor=FinalityProcessor(),
        outputStructType=FINALITY_OUTPUT_SCHEMA,
        outputMode="Append",
        timeMode="None",
    )
