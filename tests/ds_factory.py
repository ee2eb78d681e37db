"""Importable transport factory for the substreams Data Source tests:
the `transport_factory` option resolves to `ds_factory:connect` at
runtime (driver-side). Contract: connect(cursor) -> iterator of message
dicts, resuming AFTER the cursor like a real Substreams endpoint."""

from __future__ import annotations

import datetime

BASE = datetime.datetime(2024, 8, 7, 12, 0, 0)
N = 40


def connect(cursor: str | None):
    start = int(cursor) + 1 if cursor else 0
    for i in range(start, N):
        yield {
            "stream_id": "fake",
            "msg_type": "new",
            "block_num": i,
            "block_id": f"b{i}",
            "block_ts": BASE + datetime.timedelta(seconds=i),
            "cursor": str(i),
            "final_block_height": max(i - 12, 0),
            "last_valid_block": None,
            "payload": '{"k": %d}' % i,
        }
