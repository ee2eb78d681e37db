"""Ingest-time near-dup: stream == batch equivalence (VERDICT r07 #4).

The incremental foreachBatch probe (streaming/ingest_dedup.py) must
reproduce `q_dedup_stream_batch` — the batch per-doc ingest-order
verdict over the full corpus — exactly, when micro-batches arrive in
doc_id order. Plus planted tests for the bucket-cap freeze and the
replay/ordering guards that TPC-H-shaped data never exercises.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from elric_rs_spark import registry
from elric_rs_spark.streaming.ingest_dedup import (
    IngestDedupIndex,
    run_ingest_dedup_stream,
)

registry.load_all()

SF_DIR = "/root/testdata/sf0.001"
N_BATCHES = 4


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_stream_equals_batch(spark, tmp_path):
    """Full corpus through 4 id-ordered micro-batches == the batch
    verdict query, value-exact (including rounded Jaccard)."""
    docs = (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .select("doc_id", "text")
        .orderBy("doc_id")
    )
    n = docs.count()
    per = (n + N_BATCHES - 1) // N_BATCHES
    landing = tmp_path / "landing"
    landing.mkdir()
    # one parquet FILE per micro-batch, written in id order; file names
    # sort in delivery order so maxFilesPerTrigger=1 tails them 0,1,2,3
    pdf = docs.toPandas()
    for b in range(N_BATCHES):
        chunk = pdf.iloc[b * per : (b + 1) * per]
        if len(chunk):
            chunk.to_parquet(landing / f"batch_{b:04d}.parquet", index=False)

    index = run_ingest_dedup_stream(
        spark,
        str(landing),
        str(tmp_path / "state"),
        str(tmp_path / "ckpt"),
    )
    got = _rows(index.read_verdicts(spark))
    want = _rows(registry.QUERIES["q_dedup_stream_batch"](spark, SF_DIR))
    assert got == want
    assert len(got) > 0, "fixture produced no near-dup verdicts: vacuous test"


def _mk_batch(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


DUP_TEXT = "the quick brown fox jumps over the lazy dog again and again"


def test_bucket_cap_freezes_incremental_index(spark, tmp_path):
    """cap=2: identical docs 0,1 land in batch 0 and fill every bucket;
    identical docs 2,3 in batch 1 must be REJECTED by the frozen
    buckets — no verdicts, no index growth — matching the batch slice
    rule (pairs only among the lowest-cap ids of a bucket)."""
    idx = IngestDedupIndex(str(tmp_path / "state"), cap=2)
    idx.process_batch(
        _mk_batch(spark, [(0, DUP_TEXT), (1, DUP_TEXT)]), epoch_id=0
    )
    v0 = _rows(idx.read_verdicts(spark))
    assert [r[:3] for r in v0] == [(1, 1, 0)]  # doc 1 dups doc 0
    assert v0[0][3] == 1.0
    idx.process_batch(
        _mk_batch(spark, [(2, DUP_TEXT), (3, DUP_TEXT)]), epoch_id=1
    )
    # frozen buckets: docs 2,3 generate nothing and are not admitted
    assert _rows(idx.read_verdicts(spark)) == v0
    members = idx.read_index(spark).select("doc_id").distinct()
    assert sorted(r[0] for r in members.collect()) == [0, 1]


def test_replayed_epoch_is_absorbed(spark, tmp_path):
    """Re-delivering a committed epoch (same epoch_id) must not change
    verdicts or index state — the crash-replay contract."""
    idx = IngestDedupIndex(str(tmp_path / "state"))
    b0 = _mk_batch(spark, [(0, DUP_TEXT), (1, DUP_TEXT)])
    idx.process_batch(b0, epoch_id=0)
    before = _rows(idx.read_verdicts(spark))
    idx.process_batch(b0, epoch_id=0)  # replay: watermark short-circuits
    assert _rows(idx.read_verdicts(spark)) == before


def test_out_of_order_batch_rejected(spark, tmp_path):
    """Arrival order is the equivalence precondition; a batch whose ids
    regress below the watermark must fail loudly, not corrupt state."""
    idx = IngestDedupIndex(str(tmp_path / "state"))
    idx.process_batch(_mk_batch(spark, [(10, DUP_TEXT)]), epoch_id=0)
    with pytest.raises(ValueError, match="ingest order violation"):
        idx.process_batch(_mk_batch(spark, [(5, DUP_TEXT)]), epoch_id=1)


def test_single_member_new_bucket_is_admitted(spark, tmp_path):
    """A bucket first touched by ONE batch doc has no pairs, but its
    member must still enter the index — the next batch's identical doc
    has to find it."""
    idx = IngestDedupIndex(str(tmp_path / "state"))
    idx.process_batch(_mk_batch(spark, [(0, DUP_TEXT)]), epoch_id=0)
    assert _rows(idx.read_verdicts(spark)) == []
    idx.process_batch(_mk_batch(spark, [(1, DUP_TEXT)]), epoch_id=1)
    v = _rows(idx.read_verdicts(spark))
    assert [r[:3] for r in v] == [(1, 1, 0)]


def test_verdicts_match_oracle_sql(spark, tmp_path):
    """The registry key's own oracle replays the stream result too:
    run the DuckDB oracle for q_dedup_stream_batch and compare against
    the STREAMED verdicts — closing the triangle (stream == batch ==
    oracle)."""
    import sys

    sys.path.insert(0, "tests")
    from oracle_harness import run_oracle

    docs = (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .select("doc_id", "text")
        .orderBy("doc_id")
    )
    pdf = docs.toPandas()
    landing = tmp_path / "landing"
    landing.mkdir()
    per = (len(pdf) + 1) // 2
    for b in range(2):
        chunk = pdf.iloc[b * per : (b + 1) * per]
        if len(chunk):
            chunk.to_parquet(landing / f"batch_{b:04d}.parquet", index=False)
    index = run_ingest_dedup_stream(
        spark, str(landing), str(tmp_path / "state"), str(tmp_path / "ckpt")
    )
    got = _rows(
        index.read_verdicts(spark).select(
            "doc_id", "n_earlier_dups", "first_partner", "best_jaccard"
        )
    )
    cols, rows = run_oracle(registry.ORACLES["q_dedup_stream_batch"], SF_DIR)
    order = [cols.index(c) for c in
             ("doc_id", "n_earlier_dups", "first_partner", "best_jaccard")]
    want = sorted(tuple(r[i] for i in order) for r in rows)
    assert [g[:3] for g in got] == [w[:3] for w in want]
    for g, w in zip(got, want):
        assert g[3] == pytest.approx(w[3], abs=1e-6)
