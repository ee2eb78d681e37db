"""Ingest-time near-duplicate detection (VERDICT r07 #4): the streaming
twin of the batch portable-MinHash dedup, run as a foreachBatch probe of
each new micro-batch against a PERSISTED band index.

A 100 TB training-data pipeline does not re-run corpus-wide dedup per
delivery; it keeps a fingerprint index and judges each arriving document
against what it has already accepted (reference topology: the cursor-
persisted incremental sink of loader.rs:111-125 — state lives next to
the data, each batch advances it transactionally). This module composes
the EXISTING batch kernels into that incremental path:

- band signatures per new doc: `portable_band_signatures`
  (operators/dedup.py) — the row-local half of the portable pipeline,
  bit-identical to what the batch query computes;
- candidate generation: (band, sig) probe of the persisted index with
  the same PMH_BUCKET_CAP keep-lowest-ids rule;
- verification: exact word-3-gram Jaccard >= 0.5 against the persisted
  gram store, the batch threshold.

EQUIVALENCE CONTRACT (tests/test_streaming_dedup.py): when micro-batches
arrive in doc_id order, the union of per-batch verdicts equals
`q_dedup_stream_batch` run batch-side on the full corpus. The claim is
sound because every stage is prefix-stable under id-ordered arrival:
signatures are row-local; the cap admits the lowest `cap` ids of each
bucket, and ids arrive ascending, so a bucket frozen at `cap` members
holds exactly the members the batch slice would keep; Jaccard is
pairwise. Arrival order is ENFORCED (watermark file, ValueError on
regression) — out-of-order delivery belongs upstream in the finality
buffer (streaming/finality.py), which releases blocks in order.

Scale shape per batch: batch-side work is batch-sized (signatures,
grams); the index probe is a broadcast-semi join (batch bands broadcast,
index scanned — no index shuffle); the bucket re-slice groups ONLY the
affected buckets (left-semi pruned), each bounded at cap + batch
members. The index store is BUCKETED (round 9, VERDICT r08 #2): rows
land under ``pbucket=K/`` directory partitions where
``pbucket = pmod(xxhash64(band, sig), N_INDEX_BUCKETS)``, and the probe
computes the batch's touched pbucket set (bounded by
N_INDEX_BUCKETS, one batch-sized collect) and reads the index through
an ``isin`` partition filter — PartitionFilters in the scan, untouched
buckets never leave disk (plan-gated in tests/test_streaming_dedup.py).
At 100 TB the same layout holds with a larger N_INDEX_BUCKETS (or
Delta + z-order on sig); probe cost tracks batch size, not index size.
Crash replay: every append is epoch-tagged and every read
de-duplicates, so a replayed foreachBatch epoch (deterministic
recompute) is absorbed — the SummingMart idempotency pattern
(streaming/mart.py).

Long-run maintenance: appends leave one file per touched bucket per
EPOCH, so probe file-count grows with delivery count; ``compact_state``
(round 9) folds the stores back to one file per bucket between
deliveries — the routine part-merge every long-lived streaming table
needs. Replay-safe without a fold watermark because all three stores
hold membership facts absorbed by the readers' distinct().
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from elric_rs_spark.functions.hashing import word_ngrams
from elric_rs_spark.operators.dedup import (
    PMH_BUCKET_CAP,
    portable_band_signatures,
)

# index-store directory partitions: pmod(xxhash64(band, sig), N).
# 64 keeps sf-scale state at a few files per bucket; the 100 TB form
# raises this with index size (target: one bucket ~ one task's worth
# of index rows, so a batch probe reads |touched buckets| ~ batch-band
# count files, independent of total index size).
N_INDEX_BUCKETS = 64

# reserved epoch id stamped on compaction-folded rows (the SummingMart
# convention, streaming/mart.py); real foreachBatch epochs are >= 0
COMPACTED_EPOCH = -1

INDEX_SCHEMA = StructType(
    [
        StructField("band", LongType()),
        StructField("sig", StringType()),
        StructField("doc_id", LongType()),
        StructField("epoch_id", LongType()),
        StructField("pbucket", LongType()),
    ]
)

VERDICT_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_earlier_dups", LongType()),
        StructField("first_partner", LongType()),
        StructField("best_jaccard", DoubleType()),
        StructField("epoch_id", LongType()),
    ]
)


class IngestDedupIndex:
    """Persisted near-dup state: band index + gram store + verdicts,
    all epoch-tagged parquet under `base_dir`. One instance per
    pipeline; `process_batch` is the foreachBatch handler."""

    def __init__(self, base_dir: str, cap: int = PMH_BUCKET_CAP):
        self.base = base_dir.rstrip("/")
        self.cap = cap
        self.index_path = f"{self.base}/band_index"
        self.grams_path = f"{self.base}/gram_store"
        self.verdicts_path = f"{self.base}/verdicts"
        self._watermark_path = f"{self.base}/ingest_watermark"
        # per-epoch probe accounting (index-growth curve: probe wall vs
        # persisted state size — the number that predicts 100 TB probe
        # cost). Driver-side bookkeeping only; no effect on results.
        self.epoch_stats: list[dict] = []

    def _state_bytes(self, path: str) -> int:
        total = 0
        for root, _, names in os.walk(path):
            for n in names:
                try:
                    total += os.path.getsize(os.path.join(root, n))
                except OSError:
                    pass
        return total

    # -- watermark: enforce the id-ordered-arrival precondition --------
    def _read_watermark(self) -> tuple[int, int]:
        """(max_doc_id_seen, last_epoch). -1/-1 before the first batch."""
        try:
            with open(self._watermark_path) as f:
                a, b = f.read().strip().split(":")
                return int(a), int(b)
        except (FileNotFoundError, ValueError):
            return -1, -1

    def _write_watermark(self, max_id: int, epoch_id: int) -> None:
        os.makedirs(self.base, exist_ok=True)
        tmp = f"{self._watermark_path}.tmp"
        with open(tmp, "w") as f:
            f.write(f"{max_id}:{epoch_id}")
        os.replace(tmp, self._watermark_path)

    # -- persisted-state readers (replay-absorbing) --------------------
    @staticmethod
    def _guard_missing(path: str) -> None:
        """ADVICE r9 crash-consistency guard: a missing store with a
        compaction sibling on disk means compact_state died mid-swap —
        the state EXISTS (in __compact and/or __old) and reading it as
        empty would silently lose dedup history. Fail loudly instead."""
        for suffix in ("__compact", "__old"):
            if os.path.isdir(path + suffix):
                raise RuntimeError(
                    f"store {path} is missing but {path + suffix} exists: "
                    "compact_state was interrupted mid-swap; rename the "
                    "sibling back into place before resuming ingest"
                )

    def _read_or_empty(self, spark: SparkSession, path: str, schema) -> DataFrame:
        if os.path.isdir(path):
            return spark.read.schema(schema).parquet(path)
        self._guard_missing(path)
        return spark.createDataFrame([], schema)

    def read_index(
        self, spark: SparkSession, pbuckets: list[int] | None = None
    ) -> DataFrame:
        """(band, sig, doc_id) membership; distinct absorbs epoch
        replays (a replayed epoch appends identical rows). With
        `pbuckets`, the scan carries an ``isin`` PartitionFilter over
        the ``pbucket=K/`` layout — only touched bucket directories are
        read (the probe path; plan-gated)."""
        df = self._read_or_empty(spark, self.index_path, INDEX_SCHEMA)
        if pbuckets is not None:
            df = df.filter(F.col("pbucket").isin([int(b) for b in pbuckets]))
        return df.select("band", "sig", "doc_id").distinct()

    def read_grams(self, spark: SparkSession) -> DataFrame:
        if os.path.isdir(self.grams_path):
            # one gram-array row per doc; replays duplicate whole rows
            return (
                spark.read.parquet(self.grams_path)
                .select("doc_id", "g")
                .dropDuplicates(["doc_id"])
            )
        self._guard_missing(self.grams_path)
        from pyspark.sql.types import ArrayType

        gs = StructType(
            [
                StructField("doc_id", LongType()),
                StructField("g", ArrayType(StringType())),
            ]
        )
        return spark.createDataFrame([], gs)

    def read_verdicts(self, spark: SparkSession) -> DataFrame:
        """Union of per-batch verdicts: (doc_id, n_earlier_dups,
        first_partner, best_jaccard) — the q_dedup_stream_batch
        contract columns."""
        return (
            self._read_or_empty(spark, self.verdicts_path, VERDICT_SCHEMA)
            .select("doc_id", "n_earlier_dups", "first_partner", "best_jaccard")
            .distinct()
        )

    # -- the foreachBatch handler --------------------------------------
    def process_batch(self, batch_df: DataFrame, epoch_id: int) -> None:
        """Judge `batch_df` (doc_id, text) against the persisted index,
        append verdicts, admit new docs to the index. All heavy work is
        DataFrame-plan; the only collects are two one-row scalars
        (batch id range) used for the ordering guard."""
        import time as _time

        spark = batch_df.sparkSession
        t_epoch = _time.monotonic()
        idx_bytes_before = self._state_bytes(self.index_path)
        grams_bytes_before = self._state_bytes(self.grams_path)
        rng = batch_df.agg(
            F.min("doc_id").alias("lo"),
            F.max("doc_id").alias("hi"),
            F.count(F.lit(1)).alias("n"),
        ).collect()[0]
        if rng["n"] == 0:
            return
        max_seen, last_epoch = self._read_watermark()
        if epoch_id == last_epoch:
            # foreachBatch replay of a committed epoch (crash between
            # our appends and the checkpoint commit): recompute is
            # deterministic and reads de-duplicate, so re-running is
            # safe — but skipping is cheaper.
            return
        if rng["lo"] <= max_seen:
            raise ValueError(
                f"ingest order violation: batch min doc_id {rng['lo']} <= "
                f"watermark {max_seen}; the stream==batch equivalence "
                "requires id-ordered arrival (order upstream via the "
                "finality buffer)"
            )

        grams_b = batch_df.select(
            "doc_id", F.array_distinct(word_ngrams(F.col("text"), 3)).alias("g")
        ).filter(F.size("g") > 0)
        pb = F.pmod(F.xxhash64("band", "sig"), F.lit(N_INDEX_BUCKETS))
        # localCheckpoint: bands_b feeds four consumers (pbucket collect,
        # touched probe, member union, single admission) — materialize
        # the batch-sized signature set once instead of re-hashing 4x
        bands_b = (
            portable_band_signatures(spark, grams_b)
            .withColumn("pbucket", pb)
            .localCheckpoint()
        )
        # the probe's partition-pruning key set: bounded by
        # N_INDEX_BUCKETS values, one batch-sized driver collect (the
        # same bookkeeping class as the ordering-guard scalars above)
        touched_pb = [
            r["pbucket"]
            for r in bands_b.select("pbucket").distinct().collect()
        ]
        idx = self.read_index(spark, pbuckets=touched_pb)
        # existing members of AFFECTED buckets only (left-semi prune);
        # the batch band set is small — broadcast it, never shuffle the
        # index
        touched = bands_b.select("band", "sig").distinct()
        existing = idx.join(F.broadcast(touched), ["band", "sig"], "left_semi")
        members = existing.unionByName(bands_b.select("band", "sig", "doc_id"))
        # the batch cap rule, incrementally: sorted member slice per
        # bucket. Existing ids are all < batch ids (watermark guard), so
        # existing members always survive the slice — admission only
        # fills the remaining cap slots, lowest batch ids first.
        ds = F.slice(F.array_sort(F.collect_set("doc_id")), 1, self.cap)
        buckets = (
            members.groupBy("band", "sig")
            .agg(ds.alias("ds"))
            .filter(F.size("ds") > 1)
        )
        pair_expr = F.flatten(
            F.transform(
                F.col("ds"),
                lambda x, i: F.transform(
                    F.slice(F.col("ds"), i + 2, F.size(F.col("ds"))),
                    lambda y: F.struct(x.alias("doc_a"), y.alias("doc_b")),
                ),
            )
        )
        lo = int(rng["lo"])
        cand = (
            buckets.select(F.explode(pair_expr).alias("p"))
            .select("p.doc_a", "p.doc_b")
            # only pairs whose LATER member is in this batch are new;
            # earlier-earlier pairs were emitted by previous epochs
            .filter(F.col("doc_b") >= lo)
            .distinct()
        )
        # exact Jaccard verification against gram sets: doc_a may be an
        # index doc (gram store) or an earlier batch doc (batch grams).
        # dropDuplicates: after a crash between the gram-store append and
        # the watermark write, the replayed epoch reads its own batch docs
        # from the store AND unions grams_b — without the dedup, ga holds
        # two rows per batch doc and same-batch pairs join twice, doubling
        # n_earlier_dups into a divergent verdict row.
        grams_all = (
            self.read_grams(spark)
            .unionByName(grams_b)
            .dropDuplicates(["doc_id"])
        )
        ga = grams_all.select(F.col("doc_id").alias("doc_a"), F.col("g").alias("ga"))
        gb = grams_b.select(F.col("doc_id").alias("doc_b"), F.col("g").alias("gb"))
        inter = F.size(F.array_intersect("ga", "gb")).cast("double")
        union = F.size(F.array_union("ga", "gb"))
        pairs = (
            cand.join(ga, "doc_a")
            .join(gb, "doc_b")
            .filter(inter / union >= 0.5)
            .select("doc_a", "doc_b", F.round(inter / union, 6).alias("jaccard"))
        )
        verdicts = (
            pairs.groupBy(F.col("doc_b").alias("doc_id"))
            .agg(
                F.count(F.lit(1)).alias("n_earlier_dups"),
                F.min("doc_a").alias("first_partner"),
                F.max("jaccard").alias("best_jaccard"),
            )
            .withColumn("epoch_id", F.lit(int(epoch_id)))
        )
        # admitted newcomers = slice members that are batch docs
        admitted = (
            buckets.select("band", "sig", F.explode("ds").alias("doc_id"))
            .filter(F.col("doc_id") >= lo)
            .withColumn("epoch_id", F.lit(int(epoch_id)))
        )
        # buckets touched for the FIRST time by a single batch doc never
        # enter `buckets` (size 1 filter) — admit those members too, or
        # the next batch would miss them
        singles = (
            bands_b.join(
                members.groupBy("band", "sig")
                .agg(F.count(F.lit(1)).alias("n"))
                .filter(F.col("n") > 1)
                .select("band", "sig"),
                ["band", "sig"],
                "left_anti",
            )
            .select("band", "sig", "doc_id")
            .withColumn("epoch_id", F.lit(int(epoch_id)))
        )
        verdicts.write.mode("append").parquet(self.verdicts_path)
        # repartition on the partition key first: hash-partitioning puts
        # each pbucket's rows in exactly ONE task, so the dynamic-
        # partition write emits at most one file per touched bucket per
        # epoch. Without it every shuffle task writes a sliver into
        # every bucket dir — measured 2.8x wall blowup from file-count
        # explosion (~2k files/epoch) at the sf0.1 calibration scale.
        (
            admitted.unionByName(singles)
            .withColumn("pbucket", pb)
            .repartition("pbucket")
            .write.mode("append")
            .partitionBy("pbucket")
            .parquet(self.index_path)
        )
        grams_b.withColumn("epoch_id", F.lit(int(epoch_id))).write.mode(
            "append"
        ).parquet(self.grams_path)
        self._write_watermark(int(rng["hi"]), int(epoch_id))
        self.epoch_stats.append(
            {
                "epoch_id": int(epoch_id),
                "n_docs": int(rng["n"]),
                "wall_sec": round(_time.monotonic() - t_epoch, 2),
                "index_bytes_before": idx_bytes_before,
                "grams_bytes_before": grams_bytes_before,
            }
        )


    # -- table maintenance ----------------------------------------------
    def compact_state(self, spark: SparkSession) -> dict:
        """Fold the epoch-appended stores: band index to ONE file per
        pbucket, gram store and verdicts to ~128 MB-target files.

        Why a long-lived pipeline needs this: every epoch appends at
        most one file per TOUCHED bucket, so after E deliveries a probe
        that partition-prunes to B buckets still opens O(B*E) files —
        footer reads and scan planning grow with delivery count even
        though the pruned BYTES stay batch-proportional. Folding
        restores O(B) files per probe. Run it between deliveries (e.g.
        every N epochs); at 100 TB this is the routine part-merge every
        streaming table needs (plans/compaction.py rationale).

        Why it is replay-safe WITHOUT SummingMart's watermark dance
        (mart.py:69-91): index/gram/verdict rows are MEMBERSHIP FACTS,
        not summed partials — every reader distincts or dropDuplicates,
        so a crash-replayed epoch appending duplicate rows after a fold
        is absorbed exactly as before, and the fold itself only
        collapses physical duplicates. The ingest watermark file is
        untouched, so the ordering guard and the committed-epoch
        short-circuit behave identically. NOT safe concurrently with an
        active writer on the same base_dir (same contract as
        SummingMart.compact)."""
        import math
        import shutil

        stats: dict = {}
        fold_epoch = F.lit(int(COMPACTED_EPOCH))

        def _n_files(path: str) -> int:
            return sum(
                1
                for root, _d, names in os.walk(path)
                for n in names
                if n.endswith(".parquet")
            )

        def _swap_in(tmp: str, dst: str) -> None:
            """Crash-safe store swap (ADVICE r9): the old rmtree-then-move
            left a window where the store path was MISSING and readers
            silently treated the state as empty. Move the old dir aside
            first, move tmp into place, then delete the aside copy — a
            crash in any window leaves either the main dir intact or a
            `__compact` sibling that _read_or_empty refuses to read past,
            so lost-state can only fail LOUDLY, never silently."""
            old = f"{dst}__old"
            if os.path.isdir(old):
                shutil.rmtree(old)  # leftover from a prior completed swap
            os.rename(dst, old)
            os.rename(tmp, dst)
            shutil.rmtree(old)

        if os.path.isdir(self.index_path):
            before = _n_files(self.index_path)
            folded = (
                spark.read.schema(INDEX_SCHEMA)
                .parquet(self.index_path)
                .dropDuplicates(["band", "sig", "doc_id"])
                .withColumn("epoch_id", fold_epoch)
            )
            tmp = f"{self.index_path}__compact"
            # hash-partition on the layout key: each pbucket lands in
            # exactly one task -> exactly one file per bucket dir (the
            # same file-count rule as the process_batch append)
            (
                folded.repartition("pbucket")
                .write.mode("overwrite")
                .partitionBy("pbucket")
                .parquet(tmp)
            )
            # aside-swap (crash-safe; an object store would write a
            # versioned prefix + manifest instead)
            _swap_in(tmp, self.index_path)
            stats["index_files"] = (before, _n_files(self.index_path))

        # verdicts dedup on ALL contract columns (ADVICE r9): keying on
        # doc_id alone would silently collapse a divergent replayed
        # verdict row — exactly the divergence read_verdicts().distinct()
        # exists to surface — so compaction folds physical duplicates
        # only and then ASSERTS one row per doc_id, failing loudly on a
        # real divergence instead of picking an arbitrary winner.
        for path, key, label in (
            (self.grams_path, ["doc_id"], "grams_files"),
            (
                self.verdicts_path,
                ["doc_id", "n_earlier_dups", "first_partner", "best_jaccard"],
                "verdicts_files",
            ),
        ):
            if not os.path.isdir(path):
                continue
            before = _n_files(path)
            df = spark.read.parquet(path).dropDuplicates(key)
            if label == "verdicts_files":
                div = (
                    df.groupBy("doc_id")
                    .agg(F.count(F.lit(1)).alias("n"))
                    .filter(F.col("n") > 1)
                    .limit(1)
                    .collect()
                )
                if div:
                    raise RuntimeError(
                        f"verdict divergence for doc_id={div[0]['doc_id']}: "
                        "a replayed epoch produced conflicting verdict rows; "
                        "refusing to compact (inspect read_verdicts() output)"
                    )
            if "epoch_id" in df.columns:
                df = df.withColumn("epoch_id", fold_epoch)
            n_out = max(1, math.ceil(self._state_bytes(path) / (128 << 20)))
            tmp = f"{path}__compact"
            df.repartition(n_out).write.mode("overwrite").parquet(tmp)
            _swap_in(tmp, path)
            stats[label] = (before, _n_files(path))
        return stats


def run_ingest_dedup_stream(
    spark: SparkSession,
    landing_dir: str,
    state_dir: str,
    checkpoint_dir: str,
    cap: int = PMH_BUCKET_CAP,
    max_files_per_trigger: int = 1,
) -> IngestDedupIndex:
    """Tail `landing_dir` (parquet doc deliveries, id-ordered) through
    the incremental near-dup probe with availableNow semantics; returns
    the index handle for verdict reads. The production form replaces
    the trigger with a continuous one and puts the finality buffer
    upstream; the topology is identical.

    Delivery-order requirement: Spark's FileStreamSource orders files by
    MODIFICATION TIME, not name — writers must give landing files
    strictly increasing mtimes (os.utime with an incrementing timestamp)
    or same-mtime files may be delivered out of id order and trip the
    watermark ValueError (loud, but avoidable)."""
    doc_schema = StructType(
        [StructField("doc_id", LongType()), StructField("text", StringType())]
    )
    index = IngestDedupIndex(state_dir, cap=cap)
    (
        spark.readStream.schema(doc_schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(landing_dir)
        .writeStream.foreachBatch(index.process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
    return index
