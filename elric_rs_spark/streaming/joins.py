"""Stream-stream interval join (the attribution-join shape).

Structured Streaming can join two UNBOUNDED streams when the join
condition bounds how long a row must be buffered: an equality key plus a
time-range constraint between the two event times. With watermarks on
both inputs, Spark derives the state-retention bound per side and evicts
join state as the watermark advances — without the range condition the
join state would grow forever.

The same expression is valid in batch (where it is an ordinary
equi+range join), which is what makes it testable: the streaming result
must equal the batch evaluation over the same landed data
(tests/test_stream_windows.py::TestStreamStreamJoin).

Reference anchor: the reference engine has no stream-stream join (its
only stream is single-consumer block data, /root/reference/src/loader.rs)
— this is part of the beyond-reference streaming surface, same family as
the windowed aggregates (SURVEY §2 X13/X14).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    left_ts: str,
    right_ts: str,
    max_delay: str = "10 minutes",
) -> DataFrame:
    """Inner-join `right` rows to `left` rows with the same key where
    `right_ts` falls in `[left_ts, left_ts + max_delay]`.

    Works identically in batch and streaming; for streaming inputs the
    caller applies `withWatermark` to BOTH sides first (the watermark
    delay + `max_delay` together bound the buffered state — left rows
    can be dropped once the right watermark passes `left_ts + max_delay`).
    Column names of the two inputs must be disjoint so the joined row
    carries both sides unambiguously (rename before calling).

    At scale this is a shuffle on the key for both sides; in streaming,
    state is hash-partitioned by the same key, so hot keys split exactly
    like a batch skew join (AQE in batch, more shuffle partitions in
    streaming).
    """
    cond = (
        (left[left_key] == right[right_key])
        & (right[right_ts] >= left[left_ts])
        & (right[right_ts] <= left[left_ts] + F.expr(f"INTERVAL {max_delay}"))
    )
    return left.join(right, cond, "inner")
