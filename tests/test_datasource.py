"""Substreams Python Data Source (streaming/datasource.py): batch scan,
streaming drain, exact offset-checkpoint resume, and the injectable
transport path — Spark's offset log standing in for the reference's
cursors-table resume (ref loader.rs:195-210)."""

from __future__ import annotations

import tempfile
import time

import pytest

from elric_rs_spark.streaming.datasource import register

SF = "/root/testdata/sf0.001"


@pytest.fixture()
def tmpdir():
    with tempfile.TemporaryDirectory(prefix="elric_ds_") as d:
        yield d


@pytest.fixture(scope="module", autouse=True)
def _register(request):
    spark = request.getfixturevalue("spark")
    register(spark)


class TestSubstreamsDataSource:
    def test_batch_scan(self, spark):
        df = (
            spark.read.format("substreams")
            .option("fixture_sf_dir", SF)
            .option("undo_at", "500")
            .load()
        )
        assert df.filter("msg_type = 'undo'").count() == 1
        n_new = df.filter("msg_type = 'new'").count()
        assert n_new > 0
        # seq is a dense total arrival order
        mx, dist, cnt = df.selectExpr(
            "max(seq)", "count(distinct seq)", "count(*)"
        ).first()
        assert mx == cnt - 1 and dist == cnt

    def test_stream_full_drain_continuous(self, spark, tmpdir):
        q = (
            spark.readStream.format("substreams")
            .option("fixture_sf_dir", SF)
            .option("undo_at", "500")
            .load()
            .writeStream.format("parquet")
            .option("path", f"{tmpdir}/out")
            .outputMode("append")
            .option("checkpointLocation", f"{tmpdir}/ckpt")
            .trigger(processingTime="1 second")
            .start()
        )
        want = (
            spark.read.format("substreams")
            .option("fixture_sf_dir", SF)
            .option("undo_at", "500")
            .load()
            .count()
        )
        got = -1
        for _ in range(90):
            time.sleep(2)
            try:
                n = spark.read.parquet(f"{tmpdir}/out").count()
            except Exception:
                continue
            if n == want:
                got = n
                break
        q.stop()
        assert got == want

    def test_offset_checkpoint_resume_no_duplicates(self, spark, tmpdir):
        """Repeated availableNow runs advance through the stream via the
        checkpointed {"seq", "cursor"} offset — never re-emitting a row,
        and adding nothing once drained (exactly-once at the source)."""

        def run_once():
            q = (
                spark.readStream.format("substreams")
                .option("fixture_sf_dir", SF)
                .load()
                .writeStream.format("parquet")
                .option("path", f"{tmpdir}/out")
                .outputMode("append")
                .option("checkpointLocation", f"{tmpdir}/ckpt")
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(120)
            return spark.read.parquet(f"{tmpdir}/out")

        counts = []
        for _ in range(8):
            df = run_once()
            counts.append(df.count())
            if len(counts) >= 2 and counts[-1] == counts[-2]:
                break
        total = spark.read.format("substreams").option("fixture_sf_dir", SF).load().count()
        assert counts[-1] == total
        assert sorted(counts) == counts  # monotone advance
        df = spark.read.parquet(f"{tmpdir}/out")
        mx, dist, cnt = df.selectExpr("max(seq)", "count(distinct seq)", "count(*)").first()
        assert cnt == total and dist == total and mx == total - 1

    def test_transport_factory_cursor_resume(self, spark, tmpdir):
        """transport_factory option: the reader drives ReconnectingReader
        over an imported connect(cursor) factory — the gRPC adapter's
        contract. Repeated availableNow runs must RESUME FROM THE
        CHECKPOINTED CURSOR (each restart is a fresh reader process, so
        the factory is re-called with the last committed cursor — the
        reference's cursors-table semantic) until the finite stream
        drains, with every block exactly once."""
        import ds_factory

        def run_once():
            q = (
                spark.readStream.format("substreams")
                .option("transport_factory", "ds_factory:connect")
                .option("factory_sys_path", "/root/repo/tests")
                .option("batch_size", "16")
                .load()
                .writeStream.format("parquet")
                .option("path", f"{tmpdir}/out")
                .outputMode("append")
                .option("checkpointLocation", f"{tmpdir}/ckpt")
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(120)
            return spark.read.parquet(f"{tmpdir}/out").count()

        counts = [run_once()]
        for _ in range(7):
            counts.append(run_once())
            if counts[-1] == counts[-2]:
                break
        assert counts[-1] == ds_factory.N  # full drain across restarts
        df = spark.read.parquet(f"{tmpdir}/out")
        assert df.filter("msg_type != 'new'").count() == 0
        # exactly-once: every block number present exactly once
        assert df.select("block_num").distinct().count() == ds_factory.N

    def test_full_topology_over_datasource(self, spark, tmpdir):
        """The Data Source feeds the SAME downstream topology as the
        landing-dir path: stateful finality + typed per-table sink. The
        fixture stream has no table-change payloads, so the typed sink is
        exercised via the finality output schema only — blocks behind the
        watermark land, the tail stays buffered."""
        from elric_rs_spark.streaming.finality import apply_finality_stateful

        src = (
            spark.readStream.format("substreams")
            .option("fixture_sf_dir", SF)
            .load()
        )
        q = (
            apply_finality_stateful(src)
            .writeStream.format("parquet")
            .option("path", f"{tmpdir}/out")
            .outputMode("append")
            .option("checkpointLocation", f"{tmpdir}/ckpt")
            .trigger(processingTime="1 second")
            .start()
        )
        total = (
            spark.read.format("substreams").option("fixture_sf_dir", SF).load().count()
        )
        got = -1
        for _ in range(90):
            time.sleep(2)
            try:
                n = spark.read.parquet(f"{tmpdir}/out").count()
            except Exception:
                continue
            if n >= total - 12:  # reorg buffer may hold the tail
                got = n
                break
        q.stop()
        # every block at/behind the final watermark was emitted exactly once
        df = spark.read.parquet(f"{tmpdir}/out")
        assert got >= total - 12
        assert df.select("block_num").distinct().count() == df.count()
