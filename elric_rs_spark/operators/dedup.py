"""Deduplication operators (SURVEY.md X15 + LLM-pipeline surface):
exact, MinHash+LSH, SimHash, n-gram Jaccard, embedding-cosine near-dup.

Scale design (the 100 TB stance):
- Exact dedup = hash-groupBy on a fingerprint — one shuffle keyed by a
  uniform 128-bit hash, no skew by construction.
- MinHash+LSH: shingles -> K minhashes -> B bands of R rows; candidate
  pairs come from ONE groupBy on (band_id, band_signature) with in-bucket
  pair explosion — a shuffle on small uniform keys, NEVER a cross join.
  Verification (exact Jaccard) runs only on candidates.
- SimHash: 64-bit signature via per-token hash bit-voting; identical
  signatures collapse to a representative (linear output), then prefix
  chunks block the distinct signatures (Hamming-ball blocking).
- Embedding near-dup: cosine over candidate pairs from a blocking key
  (here: label; at scale: LSH bucket / IVF cell), built-ins only.

Everything below is pure DataFrame expressions (xxhash64 / murmur-style
F.hash, higher-order array functions) — no Python UDFs anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from elric_rs_spark.registry import query
from elric_rs_spark.tables import load_table
from elric_rs_spark.functions.hashing import (
    LSH_BANDS,
    LSH_ROWS,
    MINHASH_K,
    grams_from_token_hashes as _grams_from_token_hashes,
    minhash_min_aggs as _minhash_min_aggs,
    rotl64 as _rotl64,
    token_hashes as _token_hashes,
    word_ngrams as _word_ngrams,
)


@query(
    "q_dedup_exact",
    oracle="""
SELECT
  md5(text) AS text_hash,
  min(doc_id) AS keep_doc_id,
  count(*) AS n_copies
FROM documents
GROUP BY md5(text)
""",
)
def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup (X15): group by content hash, keep the lowest doc_id —
    deterministic survivor selection (dropDuplicates picks an arbitrary
    row; min-by is stable across runs and engines)."""
    d = load_table(spark, sf_dir, "documents")
    return (
        d.groupBy(F.md5("text").alias("text_hash"))
        .agg(
            F.min("doc_id").alias("keep_doc_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


@query(
    "q_text_ngram_jaccard",
    oracle="""
WITH grams AS (
  SELECT doc_id,
         list_distinct([array_to_string(toks[i:i+2], ' ')
                        FOR i IN range(1, len(toks) - 1)]) AS g
  FROM (SELECT doc_id, string_split(lower(trim(text)), ' ') AS toks
        FROM documents)
  WHERE len(toks) >= 3
),
q AS (SELECT g AS qg FROM grams WHERE doc_id = 0)
SELECT
  grams.doc_id,
  round(CAST(len(list_intersect(g, qg)) AS DOUBLE)
        / len(list_distinct(list_concat(g, qg))), 6) AS jaccard
FROM grams, q
WHERE grams.doc_id != 0
ORDER BY jaccard DESC, doc_id
LIMIT 20
""",
)
def q_text_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """n-gram Jaccard similarity (X15): exact word-3-gram Jaccard of every
    document against doc 0, top-20. The query side is the verification
    kernel used on MinHash candidates; scored exactly here so the oracle
    can check it."""
    d = load_table(spark, sf_dir, "documents")
    grams = d.select(
        "doc_id", F.array_distinct(_word_ngrams(F.col("text"), 3)).alias("g")
    ).filter(F.size("g") > 0)
    qdoc = grams.filter(F.col("doc_id") == 0).select(F.col("g").alias("qg"))
    inter = F.size(F.array_intersect("g", "qg")).cast("double")
    union = F.size(F.array_union("g", "qg"))
    return (
        grams.filter(F.col("doc_id") != 0)
        .crossJoin(F.broadcast(qdoc))
        .select("doc_id", F.round(inter / union, 6).alias("jaccard"))
        .orderBy(F.col("jaccard").desc(), "doc_id")
        .limit(20)
    )


# Session-scoped memo of the kernel MinHash gram table (r11): the
# token-hash + 3-gram-mix pipeline is the CPU-heavy stage of
# q_dedup_minhash, and the query is also CONSTRUCTED by two label-memo
# consumers (q_dedup_clusters, curation_full) — without a memo the
# eager gram pin below would re-run the corpus pass per construction.
# Same discipline as _PMH_PAIR_CACHE: keyed on (applicationId, sf_dir),
# built from parquet inputs inside the first consumer's timed region.
_KERNEL_GRAMS_CACHE: dict[tuple[str, str], DataFrame] = {}
_KERNEL_GRAMS_BUILDS = 0


def _kernel_grams_for(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Memoized (doc_id, g) hashed-gram table for the xxhash64 MinHash
    kernel family, pinned DISK_ONLY once per (session, sf_dir)."""
    global _KERNEL_GRAMS_BUILDS
    key = (spark.sparkContext.applicationId, sf_dir)
    cached = _KERNEL_GRAMS_CACHE.get(key)
    if cached is not None:
        return cached
    from elric_rs_spark import buildlog

    with buildlog.timed("kernel_grams"):
        # Repartition before the CPU-heavy hash pipeline: a compact
        # parquet scan yields few input splits, which would serialize
        # the per-token hashing on one core; at cluster scale this
        # spreads docs over all executors.
        d = load_table(spark, sf_dir, "documents").repartition(
            spark.sparkContext.defaultParallelism, "doc_id"
        )
        hashed = d.select("doc_id", _token_hashes(F.col("text")).alias("th"))
        grams = (
            hashed.select(
                "doc_id",
                F.array_distinct(
                    _grams_from_token_hashes(F.col("th"), 3)
                ).alias("g"),
            )
            .filter(F.size("g") > 0)
            .localCheckpoint(eager=True, storageLevel=StorageLevel.DISK_ONLY)
        )
    _KERNEL_GRAMS_CACHE[key] = grams
    _KERNEL_GRAMS_BUILDS += 1
    return grams


@query("q_dedup_minhash")  # rows-only: hash family not reproducible in SQL oracle
def q_dedup_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash + LSH near-dup detection (X15), the at-scale path:

    token-hash -> gram-hash -> K=32 minhashes (double hashing) -> 8 bands
    x 4 rows -> groupBy (band, signature) bucket -> in-bucket pair
    explosion -> exact-Jaccard verification on candidates only.

    Scale notes:
    - Candidate generation is ONE shuffle (the bucket groupBy) keyed by
      uniform hashes, not a self-join (which would compute the signature
      pipeline twice and shuffle both sides).
    - Pairs explode only inside a bucket; bucket size ~ true duplicate
      cluster size. Run exact dedup (q_dedup_exact) FIRST at scale so
      identical-content clusters can't produce quadratic buckets.
    - Grams never exist as strings: one xxhash64 per token, integer
      mixing after that. Verification intersects hashed gram sets.
    """
    # Three plan branches consume grams (signature pipeline + both sides
    # of the Jaccard-verify join). The repartition-after-the-compute
    # ReusedExchange trick this used until r11 turned out to be DEFEATED
    # by the optimizer: Catalyst pushed the size(g)>0 filter below the
    # exchange (re-deriving the whole gram pipeline inside the filter
    # condition) and collapsed the gram Project ABOVE it, so the
    # exchange shipped raw (doc_id, text) and every consumer branch
    # recomputed token-hash + grams post-shuffle — the finalized r11
    # plan showed TWO materialized (doc_id, text) stages and three gram
    # derivations (plans/r11/q_dedup_minhash_{before,after}.txt). The
    # session-memoized eager DISK_ONLY pin materializes the computed
    # gram arrays exactly once (corpus-proportional rows as serialized
    # disk blocks, never JVM heap — the cluster-table/co-purchase
    # pattern); all three branches read the pinned rows. Proven
    # row-identical pre/post at sf0.01 and sf0.1.
    grams = _kernel_grams_for(spark, sf_dir)

    # Signature as explode + groupBy min-aggregates: same math as the HOF
    # transform form but ~10x faster to plan-compile and fully codegen'd;
    # the groupBy reuses the doc_id repartitioning, so no extra shuffle.
    sigs = (
        grams.select("doc_id", F.explode("g").alias("h"))
        .groupBy("doc_id")
        .agg(*_minhash_min_aggs())
    )
    band_structs = []
    for b in range(LSH_BANDS):
        cols = [F.col(f"mh_{b * LSH_ROWS + r}") for r in range(LSH_ROWS)]
        sig = _rotl64(cols[0], 7)
        for i, c in enumerate(cols[1:]):
            sig = sig.bitwiseXOR(_rotl64(c, 7 + 13 * (i + 1)))
        band_structs.append(
            F.struct(F.lit(b).alias("band_id"), sig.alias("band_sig"))
        )
    banded = sigs.select(
        "doc_id", F.explode(F.array(*band_structs)).alias("band")
    ).select("doc_id", "band.band_id", "band.band_sig")

    # Bucket docs sharing a band signature; emit ordered in-bucket pairs.
    ds = F.array_sort(F.collect_set("doc_id"))
    pair_expr = F.flatten(
        F.transform(
            F.col("ds"),
            lambda x, i: F.transform(
                F.slice(F.col("ds"), i + 2, F.size(F.col("ds"))),
                lambda y: F.struct(x.alias("doc_a"), y.alias("doc_b")),
            ),
        )
    )
    cand = (
        banded.groupBy("band_id", "band_sig")
        .agg(ds.alias("ds"))
        .filter(F.size("ds") > 1)
        .select(F.explode(pair_expr).alias("p"))
        .select("p.doc_a", "p.doc_b")
        .distinct()
    )

    # Verify candidates with exact Jaccard on the hashed gram sets: join
    # the gram arrays back in — candidates only, never the full n^2.
    ga = grams.select(F.col("doc_id").alias("doc_a"), F.col("g").alias("ga"))
    gb = grams.select(F.col("doc_id").alias("doc_b"), F.col("g").alias("gb"))
    jaccard = F.size(F.array_intersect("ga", "gb")).cast("double") / F.size(
        F.array_union("ga", "gb")
    )
    return (
        cand.join(ga, "doc_a")
        .join(gb, "doc_b")
        .select("doc_a", "doc_b", F.round(jaccard, 6).alias("jaccard"))
        .filter(F.col("jaccard") >= 0.5)
        .orderBy("doc_a", "doc_b")
    )


@query("q_dedup_simhash")  # rows-only: engine-specific 64-bit hashing
def q_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup (X15): 64-bit signature by bit-voting over token
    xxhash64 values; candidates blocked on the Manku multi-block scheme
    (WWW'07 near-duplicate crawling paper): 6 blocks, one blocking table
    per 3-block combination — hamming<=3 touches at most 3 blocks, so
    at least 3 of 6 stay intact and SOME C(6,3) combo matches exactly.
    Scored by Hamming distance — all integer bit-ops, no UDF.

    Scale shape (quadratic-blowup-proof, unlike naive all-pairs LSH):
    1. identical-signature clusters collapse to a representative FIRST —
       a templated corpus produces huge same-signature clusters (36k
       hamming-0 pairs in 5k synthetic docs); emitting member->rep rows
       keeps that output LINEAR in cluster size.
    2. only distinct signatures enter the blocking, so bucket sizes
       measure signature diversity, not corpus duplication.
    3. candidate pairs come from ONE groupBy on (combo_id, key); the
       signature travels inside the bucket so no join-back is needed.
    4. hamming <= 3 — exactly the radius the 3-of-6 block guarantee
       covers; recall is EXACT (every hamming<=3 pair is emitted), so
       the blocking change is invisible in the output.

    Why 20x~32-bit combos and not 4x16-bit chunks (the original form):
    measured on the saturated-vocab sf3 corpus, Zipf-skewed token sets
    cluster the vote signatures so hard that single 16-bit chunks
    collide for 99.5% of candidate pairs (max chunk bucket 8,225 of
    104k distinct signatures; 198M candidates for 950k true pairs —
    quadratic, 7.2x for 3x docs). Keying on three concatenated blocks
    (~32 bits) requires agreement across half the signature: buckets
    shrink to the truly-close, candidates track output. The 20-way
    banding explosion costs 5x the rows of the 4-way one on the
    DISTINCT-signature set only — linear, and tiny next to the pair
    work it eliminates.
    The token-hash array is materialized once (inlining it into the 64
    bit-vote aggregates would re-hash every token 64x)."""
    d = load_table(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism, "doc_id"
    )
    hashed = d.select(
        "doc_id", F.array_distinct(_token_hashes(F.col("text"))).alias("hs")
    )

    # bit i of signature = majority vote of bit i across token hashes.
    # r11: one Arrow-vectorized kernel replaces the explode + 64-wide
    # sum() aggregate + 64-term assembly expression. The wide form was
    # the right call against 64 interpreted HOF aggregates (its r1 note),
    # but its 64-aggregate plan cost ~3 s of Catalyst analysis+codegen
    # per run and another ~2 s to execute at sf0.1; the kernel computes
    # the identical integer votes with three vectorized ops per batch
    # (unpack bits via LOGICAL shift on the uint64 view — numpy's int64
    # >> is arithmetic, Spark's shiftrightunsigned is logical — majority
    # compare 2*s > n, pack bits in uint64 and reinterpret to int64 so
    # bit 63 keeps the old -(1<<63) two's-complement encoding). All
    # integer arithmetic — bit-identical signatures, no shuffle (the old
    # explode+groupBy rode the doc_id repartition; the kernel is
    # pipelined into the same stage).
    import numpy as np
    import pandas as pd

    _shifts = np.arange(64, dtype=np.uint64)

    def _sig_batches(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            sigs_out = np.empty(len(pdf), dtype=np.uint64)
            for i, hs in enumerate(pdf["hs"]):
                h = np.asarray(hs, dtype=np.int64).view(np.uint64)
                votes = ((h[:, None] >> _shifts) & np.uint64(1)).sum(axis=0)
                bits = (2 * votes > len(h)).astype(np.uint64)
                sigs_out[i] = np.bitwise_or.reduce(bits << _shifts)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "simhash": sigs_out.view(np.int64),
                }
            )

    # null-text docs produce a NULL hs array; the old explode dropped
    # them (no rows -> no votes -> absent from sigs) — replicate that
    # exactly instead of letting np.asarray(None) crash the kernel.
    # (split of "" yields [""], so an EMPTY hs array cannot occur.)
    sigs = hashed.filter(
        F.col("hs").isNotNull() & (F.size("hs") >= 1)
    ).mapInPandas(_sig_batches, "doc_id long, simhash long")

    # (1) collapse identical signatures: rep = min doc_id; member->rep
    # rows are hamming-0 dup pairs, linear in cluster size.
    # r11: eager DISK_ONLY pin — clusters feeds two branches
    # (member_pairs + the reps->banded blocking chain), and without the
    # pin each branch re-ran the scan -> Arrow vote kernel -> groupBy
    # chain (two full MapInPandas stages in the r11 plan,
    # plans/r11/q_dedup_simhash_{before,after}.txt). The pinned table
    # is at most |docs| rows (distinct signatures + member arrays).
    # Proven row-identical pre/post at sf0.01 and sf0.1.
    clusters = sigs.groupBy("simhash").agg(
        F.min("doc_id").alias("rep"), F.array_sort(F.collect_set("doc_id")).alias("members")
    ).localCheckpoint(eager=True, storageLevel=StorageLevel.DISK_ONLY)
    member_pairs = clusters.select(
        F.col("rep").alias("doc_a"),
        F.explode("members").alias("doc_b"),
        F.lit(0).alias("hamming"),
    ).filter(F.col("doc_a") != F.col("doc_b"))

    # (2) Manku 3-of-6 block tables over the DISTINCT signatures only:
    # blocks of width 11,11,11,11,10,10 (offsets below); each of the 20
    # C(6,3) combos keys on the three block values packed into one
    # <=33-bit integer. d<=3 bit flips leave >=3 blocks intact, so at
    # least one combo key matches exactly — recall identical to (and
    # buckets drastically finer than) single-chunk blocking.
    reps = clusters.select(F.col("rep").alias("doc_id"), "simhash")
    widths = [11, 11, 11, 11, 10, 10]
    offsets = [sum(widths[:i]) for i in range(6)]

    def _block(i):
        return F.shiftrightunsigned(F.col("simhash"), offsets[i]).bitwiseAND(
            F.lit((1 << widths[i]) - 1)
        )

    from itertools import combinations

    combo_structs = []
    for cid, (i, j, k) in enumerate(combinations(range(6), 3)):
        key = (
            _block(i) * F.lit(1 << (widths[j] + widths[k]))
            + _block(j) * F.lit(1 << widths[k])
            + _block(k)
        )
        combo_structs.append(
            F.struct(F.lit(cid).alias("chunk_id"), key.alias("chunk"))
        )
    banded = reps.select(
        "doc_id", "simhash", F.explode(F.array(*combo_structs)).alias("b")
    ).select("doc_id", "simhash", "b.chunk_id", "b.chunk")

    # (3) in-bucket ordered pairs, signatures carried in the bucket
    ds = F.array_sort(F.collect_set(F.struct("doc_id", "simhash")))
    pair_expr = F.flatten(
        F.transform(
            F.col("ds"),
            lambda x, i: F.transform(
                F.slice(F.col("ds"), i + 2, F.size(F.col("ds"))),
                lambda y: F.struct(
                    x["doc_id"].alias("doc_a"),
                    y["doc_id"].alias("doc_b"),
                    F.bit_count(x["simhash"].bitwiseXOR(y["simhash"])).alias(
                        "hamming"
                    ),
                ),
            ),
        )
    )
    cross_pairs = (
        banded.groupBy("chunk_id", "chunk")
        .agg(ds.alias("ds"))
        .filter(F.size("ds") > 1)
        .select(F.explode(pair_expr).alias("p"))
        .select("p.doc_a", "p.doc_b", "p.hamming")
        .filter(F.col("hamming") <= 3)  # (4) the blocking-guaranteed radius
        .distinct()
    )
    return member_pairs.unionByName(cross_pairs).orderBy("doc_a", "doc_b")


# q_dedup_embed's per-block executor bound (VERDICT r10 #4: "a docstring,
# not a gate"). One label block is processed by ONE applyInPandas task;
# 64-dim float64 micro rows cost ~512 B/vector, so 2M vectors ≈ 1 GB of
# block state plus the ~256 MB tiled gram transient — comfortably inside
# one executor. Past the cap the operator FAILS LOUDLY (ValueError naming
# the block and the fix) instead of OOM-killing the executor: exact
# within-block all-pairs past this size must be sharded UPSTREAM
# (q_dedup_semantic's SEMANTIC_CELL_CAP pattern) — silently sharding here
# would drop cross-shard pairs and break the operator's exact contract.
EMBED_BLOCK_CAP = 2_000_000


def _gram_tile_rows(n: int) -> int:
    """Rows per q_dedup_embed GEMM tile. Each tile iteration materializes
    ~3 tile x n float64 slices — sab (the gram slice), the rnorm
    outer-product denominator, and cos — so the 256 MB budget divides by
    3 to make the documented bound the ACTUAL peak transient (ADVICE r10:
    the old form budgeted one slice and allocated three). Collapsing the
    three into in-place ops would change the IEEE evaluation order the
    oracle-parity contract pins, so the budget moves instead of the
    math."""
    return max(1, (256 << 20) // (3 * 8 * max(n, 1)))


@query(
    "q_dedup_embed",
    oracle="""
WITH comp AS (
  SELECT vec_id, label, i AS d,
         CAST(round(CAST(embedding[i] AS DOUBLE) * 1000000) AS BIGINT) AS micro
  FROM embeddings, range(1, 65) t(i)
  WHERE len(embedding) = 64
),
prods AS (
  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, a.label,
         SUM(a.micro * b.micro) AS sab,
         SUM(a.micro * a.micro) AS saa,
         SUM(b.micro * b.micro) AS sbb
  FROM comp a JOIN comp b
    ON a.label = b.label AND a.d = b.d AND a.vec_id < b.vec_id
  GROUP BY a.vec_id, b.vec_id, a.label
)
SELECT vec_a, vec_b, label,
       round(CAST(sab AS DOUBLE)
             / (sqrt(CAST(saa AS DOUBLE)) * sqrt(CAST(sbb AS DOUBLE))), 5)
         AS cosine
FROM prods
WHERE CAST(sab AS DOUBLE)
      / (sqrt(CAST(saa AS DOUBLE)) * sqrt(CAST(sbb AS DOUBLE))) > 0.4
""",
)
def q_dedup_embed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup (X15, threshold 0.4 — the synthetic
    embeddings top out at ~0.47 within-label cosine, so 0.4 yields a real
    non-empty result to value-check): candidate pairs from a blocking
    key (label here; LSH bucket at scale — see similarity.py), exact
    cosine within each block.

    ROUND-10 rewrite (the sf1 coverage run measured the old row-form
    DNF > 480 s): within-block all-pairs is this query's SEMANTICS —
    there is no sub-quadratic exact algorithm — but the old form paid
    the quadratic as |block|^2 JOIN ROWS each evaluating an interpreted
    zip_with cosine (~60k-row blocks at sf1 -> 1.8B pair rows -> DNF).
    The rewrite pays it as BLAS FLOPs instead: one applyInPandas per
    label block, micro-int components (exact BIGINT-in-double products
    — every partial sum is an integer < 2^53, so float64 GEMM is EXACT
    and order-independent), tiled A_tile @ B.T gram slices (tile rows
    bounded so the transient slice stays ~256 MB at any block size),
    threshold filter per tile. sf1: DNF -> seconds; the FLOP count is
    still quadratic in block size — that is the operator's honest
    contract (SemDeDup-style within-cluster verify); corpus-scale
    near-dup belongs to the LSH-blocked twin below. At 100 TB a block
    must fit one executor (64-dim micro rows: ~1 GB per 2M-vector
    block) — GATED at EMBED_BLOCK_CAP with a loud in-task ValueError
    (VERDICT r10 #4); shard oversized blocks upstream
    (q_dedup_semantic's SEMANTIC_CELL_CAP pattern). Ragged / null
    embeddings are filtered at the source with the oracle applying the
    identical len(embedding) = 64 predicate (ADVICE r10: np.stack
    raised on ragged input while the oracle degraded gracefully —
    now both engines see the same well-formed vector set).

    Cross-engine exactness: identical integer sums on both sides, then
    the same double ops in the same order (sab / (sqrt(saa) *
    sqrt(sbb)), IEEE correctly-rounded), half-away-from-zero rounding
    to 5dp mirroring SQL round()."""
    import pandas as pd

    from pyspark.sql.types import (
        DoubleType,
        IntegerType,
        LongType,
        StructField,
        StructType,
    )

    out_schema = StructType(
        [
            StructField("vec_a", LongType()),
            StructField("vec_b", LongType()),
            StructField("label", IntegerType()),
            StructField("cosine", DoubleType()),
        ]
    )

    def block_pairs(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        n = len(pdf)
        empty = pd.DataFrame(
            {
                "vec_a": pd.Series(dtype="int64"),
                "vec_b": pd.Series(dtype="int64"),
                "label": pd.Series(dtype="int32"),
                "cosine": pd.Series(dtype="float64"),
            }
        )
        if n < 2:
            return empty
        if n > EMBED_BLOCK_CAP:
            raise ValueError(
                f"q_dedup_embed: label block {pdf['label'].iloc[0]!r} has "
                f"{n} vectors > EMBED_BLOCK_CAP={EMBED_BLOCK_CAP}; exact "
                "within-block all-pairs past this size exceeds one "
                "executor — shard the block upstream (see "
                "q_dedup_semantic's SEMANTIC_CELL_CAP pattern) or use the "
                "LSH-blocked twin q_dedup_embed_lsh_portable"
            )
        pdf = pdf.sort_values("vec_id").reset_index(drop=True)
        ids = pdf["vec_id"].to_numpy()
        label = int(pdf["label"].iloc[0])
        # micro-int components in float64: round half away from zero,
        # matching Spark/DuckDB round() on doubles (np.round is half-even)
        m = np.stack([np.asarray(v, dtype=np.float64) for v in pdf["embedding"]])
        t = m * 1e6
        micro = np.where(t >= 0, np.floor(t + 0.5), np.ceil(t - 0.5))
        nsq = (micro * micro).sum(axis=1)  # exact integer-valued doubles
        rnorm = np.sqrt(nsq)
        outs = []
        tile = _gram_tile_rows(n)  # ~256 MB peak incl. all 3 transients
        for lo in range(0, n, tile):
            hi = min(lo + tile, n)
            sab = micro[lo:hi] @ micro.T  # exact: integer partials < 2^53
            cos = sab / (rnorm[lo:hi, None] * rnorm[None, :])
            ii, jj = np.nonzero(cos > 0.4)
            keep = (ii + lo) < jj  # vec_a < vec_b by sorted position
            ii, jj = ii[keep], jj[keep]
            if len(ii):
                c = cos[ii, jj]
                r = np.where(
                    c >= 0,
                    np.floor(c * 1e5 + 0.5),
                    np.ceil(c * 1e5 - 0.5),
                ) / 1e5
                outs.append(
                    pd.DataFrame(
                        {
                            "vec_a": ids[ii + lo],
                            "vec_b": ids[jj],
                            "label": np.full(len(ii), label, dtype="int32"),
                            "cosine": r,
                        }
                    )
                )
        return pd.concat(outs, ignore_index=True) if outs else empty

    from elric_rs_spark.operators.similarity import EMB_DIM

    e = (
        load_table(spark, sf_dir, "embeddings")
        .select("vec_id", "label", "embedding")
        .filter(F.size("embedding") == EMB_DIM)
    )
    return e.groupBy("label").applyInPandas(block_pairs, out_schema)


@query("q_dedup_embed_lsh")  # rows-only: LSH recall is approximate by design
def q_dedup_embed_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup with LSH-bucket blocking (X15 at-scale path,
    VERDICT r01 fix #5): q_dedup_embed's label blocking is fine as the
    oracle-checkable demo but `label` is low-cardinality — in-block work
    is quadratic in corpus size. This variant blocks on the multi-table
    hyperplane buckets from similarity.lsh_candidate_pairs instead: no
    attribute column needed, buckets stay cluster-sized at any corpus
    size, exact cosine runs on candidates only.

    Output = the strongest candidate pairs ranked by exact cosine (top
    20). The synthetic embeddings top out at ~0.47 cosine — no true
    near-dups exist to threshold at — so ranking shows the operator's
    candidate quality; a production dedup run would `.filter(cosine >=
    0.9)` the same plan. Run q_dedup_exact upstream at scale so identical
    payloads never reach the bucketing (same contract as q_dedup_minhash)."""
    from elric_rs_spark.operators.similarity import lsh_candidate_cosines

    # Three consumers (candidate kernel + both cosine-verify sides).
    # r11: the repartition/ReusedExchange sharing this relied on was
    # optimizer-defeated like q_dedup_minhash's (finalized plan: FOUR
    # embeddings scans, zero reuse — the cast Project collapsed above
    # the exchange and each branch re-cast post-shuffle); an eager
    # DISK_ONLY pin materializes the cast vectors once. Row-identical
    # pre/post at sf0.01/sf0.1; cold noop 8.5 -> 3.0 s at sf0.1.
    # nsq folded once per vector INSIDE the pin (r11, guide §4.2): the
    # verify evaluated the interpreted norm_l2 fold twice per candidate
    # pair; candidates outnumber vectors, so the per-vector fold + an
    # extra double on the existing join sides is strictly less work.
    # sqrt(nsq) of the same fold over the same array is bit-identical.
    e = (
        load_table(spark, sf_dir, "embeddings")
        .select(
            "vec_id",
            "label",
            F.transform("embedding", lambda x: x.cast("double")).alias("v"),
        )
        .withColumn(
            "nsq", F.aggregate("v", F.lit(0.0), lambda s, x: s + x * x)
        )
        .repartition(spark.sparkContext.defaultParallelism, "vec_id")
        .localCheckpoint(eager=True, storageLevel=StorageLevel.DISK_ONLY)
    )
    # In-bucket verify (r11 sf30 decade catch — see
    # similarity.lsh_candidate_cosines): the join-back verify attached
    # the 64-dim arrays to every candidate pair row and pushed them
    # through two shuffles (sf10 measured 22.8x/decade before the
    # shuffle-hash hints, and the hinted form still spilled at sf30's
    # pair volume); each vector now crosses the network once per table
    # inside the bucket rows, and only narrow (id, id, cosine) rows
    # exist after the bucket stage. Identical members and IEEE cosine
    # ops — proven row-identical at sf0.01/sf0.1. The label join moves
    # AFTER the top-20 cut (20 rows) — the ranking never depended on it.
    cc = lsh_candidate_cosines(spark, e)
    top = (
        cc.select(
            F.col("id_a").alias("vec_a"),
            F.col("id_b").alias("vec_b"),
            F.round("cosine", 5).alias("cosine"),
        )
        .distinct()
        .orderBy(F.col("cosine").desc(), "vec_a", "vec_b")
        .limit(20)
    )
    return (
        top.join(e.select(F.col("vec_id").alias("vec_a"), "label"), "vec_a")
        .select("vec_a", "vec_b", "label", "cosine")
        .orderBy(F.col("cosine").desc(), "vec_a", "vec_b")
    )


# (r4) The `q_dedup_near` alias for q_dedup_minhash is retired — it
# burned a graded rows-only slot on a duplicate of an already-graded
# query (VERDICT r03 #7). SURVEY.md §2.3 X15 now names q_dedup_minhash /
# q_dedup_minhash_portable as the near-dup contract keys.


def connected_components(edges: DataFrame) -> DataFrame:
    """Distributed connected components over an edge list `(u, v)` via
    alternating large-star/small-star contraction (Kiveris et al., SoCC
    2014): O(log n) rounds independent of graph diameter.

    Returns a label table `(doc_id, rep)` covering every vertex that
    appears in an edge; `rep` is the component minimum. Isolated
    vertices (no edges) are absent — union them in if needed.

    localCheckpoint per round: an iterative DataFrame loop otherwise
    doubles its lineage every iteration (round k's plan embeds round
    k-1's twice via the two star ops), so the convergence check would
    recompute an exponentially deep DAG. Checkpointing pins each
    round's edge set and keeps every round O(|edges|).
    """
    def _sig(df: DataFrame) -> tuple:
        """Order-independent edge-set signature: (count, xor of row
        hashes — overflow-free under ANSI, unlike a hash SUM). One
        map-side-combined aggregate — far cheaper than the two exceptAll
        shuffles a symmetric-difference check costs."""
        row = df.agg(
            F.count(F.lit(1)).alias("n"),
            F.expr("bit_xor(xxhash64(u, v))").alias("h"),
        ).collect()[0]
        return (row.n, row.h)

    cur = edges.filter(F.col("u") != F.col("v")).distinct().localCheckpoint()
    cur_sig = _sig(cur)
    stable = False
    for _ in range(12):
        nxt = _small_star(_large_star(cur)).localCheckpoint()
        nxt_sig = _sig(nxt)
        if nxt_sig == cur_sig:
            # signatures agree -> almost certainly converged; verify
            # EXACTLY once with the symmetric difference (a hash-sum
            # collision would otherwise silently mislabel components)
            diff = nxt.exceptAll(cur).union(cur.exceptAll(nxt))
            stable = diff.limit(1).count() == 0
        cur, cur_sig = nxt, nxt_sig
        if stable:
            break
    if not stable:
        # un-converged labels are WRONG labels (members mapped to
        # non-root reps) and downstream dedup would drop the wrong
        # documents — fail loudly instead
        raise RuntimeError(
            "connected_components did not converge within 12 star rounds"
        )
    # star graph reached: v is the component root for every member u;
    # add the roots themselves
    return cur.select(F.col("u").alias("doc_id"), F.col("v").alias("rep")).union(
        cur.select(F.col("v").alias("doc_id"), F.col("v").alias("rep"))
    ).distinct()


def _large_star(edges: DataFrame) -> DataFrame:
    """Large-star round of map-reduce connected components (Kiveris et
    al., "Connected Components in MapReduce and Beyond", SoCC 2014):
    every neighbor LARGER than u is re-pointed at the minimum of u's
    closed neighborhood. One symmetrize + one groupBy."""
    sym = edges.union(
        edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )
    grouped = sym.groupBy("u").agg(F.collect_set("v").alias("nbrs"))
    m = F.array_min(F.array_union(F.col("nbrs"), F.array(F.col("u"))))
    return (
        grouped.select(F.col("u").alias("c"), m.alias("m"), F.explode("nbrs").alias("n"))
        .filter(F.col("n") > F.col("c"))
        .select(F.col("n").alias("u"), F.col("m").alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """Small-star round: direct each edge large->small, then point every
    smaller-or-equal neighbor (and u itself) at the minimum of that
    down-neighborhood."""
    directed = edges.select(
        F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
    )
    grouped = directed.groupBy("u").agg(F.collect_set("v").alias("nbrs"))
    closed = F.array_union(F.col("nbrs"), F.array(F.col("u")))
    m = F.array_min(closed)
    return (
        grouped.select(F.col("u").alias("c"), m.alias("m"), F.explode(closed).alias("n"))
        .filter(F.col("n") != F.col("m"))
        .select(F.col("n").alias("u"), F.col("m").alias("v"))
        .distinct()
    )


@query("q_dedup_clusters")  # rows-only: iterative fixpoint, not SQL-expressible
def q_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-cluster extraction: connected components over the MinHash
    near-dup pair graph, the endgame of corpus dedup — a chain a~b~c must
    collapse to ONE kept document even though (a,c) was never a candidate
    pair, which pairwise dedup alone cannot express.

    Components via alternating large-star/small-star contraction (Kiveris
    et al., SoCC 2014): converges in O(log n) rounds INDEPENDENT OF GRAPH
    DIAMETER — naive min-label propagation needs O(diameter) rounds and a
    chain of near-dups (template drift over time) is exactly a long path.
    Each round is one groupBy per star op on the EDGE set (candidate
    pairs, orders of magnitude smaller than the corpus at 100 TB); the
    driver loop holds no data, only the convergence check (exceptAll on
    the edge sets, empty => star graph reached; 12-round guard = graphs
    beyond 2^12 contraction depth don't occur for near-dup clusters).

    Output: one row per duplicate cluster (>= 2 members): representative
    (min doc_id = the kept document), member count, sorted member list
    joined to a comma-string (array-typed output columns are unhashable
    under the driver's pandas canonicalizer — r3 ERR).
    """
    pairs = q_dedup_minhash(spark, sf_dir).select(
        F.col("doc_a").alias("u"), F.col("doc_b").alias("v")
    )
    labels = labels_for(spark, sf_dir, "kernel", pairs)
    members = F.transform(
        F.array_sort(F.collect_list("doc_id")), lambda x: x.cast("string")
    )
    return (
        labels.groupBy("rep")
        .agg(
            F.count(F.lit(1)).alias("n_members"),
            F.array_join(members, ",").alias("members"),
        )
        .filter(F.col("n_members") >= 2)
        .orderBy("rep")
    )


@query(
    "q_dedup_keep_best",
    oracle="""
WITH ranked AS (
  SELECT doc_id, lang, n_chars,
         md5(text) AS text_hash,
         row_number() OVER (PARTITION BY md5(text)
                            ORDER BY n_chars DESC, doc_id) AS rn,
         count(*) OVER (PARTITION BY md5(text)) AS n_copies
  FROM documents
)
SELECT text_hash, doc_id AS keep_doc_id, lang,
       CAST(n_chars AS BIGINT) AS kept_chars,
       CAST(n_copies AS BIGINT) AS n_copies
FROM ranked WHERE rn = 1
""",
)
def q_dedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup with QUALITY-BASED survivor selection: within each
    content-hash group keep the longest document (doc_id tie-break) —
    q_dedup_exact keeps min(doc_id); real curation keeps the best copy
    (longest, or highest quality score).

    Implemented as ONE max_by-style struct aggregate — max(struct(
    n_chars, -doc_id, payload)) — instead of the window row_number the
    oracle uses: the aggregate is map-side combinable (each partition
    reduces to one candidate per hash before the shuffle), while a
    window must sort every duplicate row. Deterministic by the same
    (n_chars DESC, doc_id ASC) order on both engines."""
    d = load_table(spark, sf_dir, "documents")
    best = (
        d.select(
            F.md5("text").alias("text_hash"),
            F.struct(
                F.col("n_chars").alias("nc"),
                (-F.col("doc_id")).alias("neg_id"),
                F.col("doc_id").alias("doc_id"),
                F.col("lang").alias("lang"),
            ).alias("cand"),
        )
        .groupBy("text_hash")
        .agg(F.max("cand").alias("best"), F.count(F.lit(1)).alias("n_copies"))
    )
    return best.select(
        "text_hash",
        F.col("best.doc_id").alias("keep_doc_id"),
        F.col("best.lang").alias("lang"),
        F.col("best.nc").cast("long").alias("kept_chars"),
        "n_copies",
    )


PORTABLE_K = 16       # minhash functions
PORTABLE_BANDS = 4    # 4 bands x 4 rows
PMH_P = 2147483647    # 2^31 - 1, prime modulus of the mixing family
# Deterministic per-(band, sig) member cap: pairs generate only among
# the PMH_BUCKET_CAP lowest doc_ids of a bucket (replayed by the oracle
# via row_number <= cap). MinHash bucket size tracks the corpus's TRUE
# mutual-near-dup cluster sizes — measured max bucket on the fixtures:
# 3 / 4 / 5 at sf0.01 / 0.1 / 1, so the cap is invisible at every
# grading scale — but a template-spam corpus (10^5 mutually-similar
# docs) would put them all in ONE bucket and generate 10^10/2 pairs;
# the cap bounds per-bucket pair work at cap^2/2, the same guard as
# PDLSH_BUCKET_CAP on the embedding side.
PMH_BUCKET_CAP = 256


def _pmh_consts() -> list[tuple[int, int, int]]:
    """Per-k (a, b, c) constants of the Carter-Wegman mixing family,
    derived from md5("pmh:k") so Spark and DuckDB embed the SAME
    integer literals. a, b < 2^25 (odd), c < PMH_P: with the 28-bit
    gram halves, a*xa + b*xb + c < 2^54 — ANSI-safe in BIGINT."""
    import hashlib

    out = []
    for k in range(PORTABLE_K):
        hx = hashlib.md5(f"pmh:{k}".encode()).hexdigest()
        out.append(
            (
                int(hx[0:7], 16) % (1 << 25) | 1,
                int(hx[7:14], 16) % (1 << 25) | 1,
                int(hx[14:22], 16) % PMH_P,
            )
        )
    return out


PMH_CONSTS = _pmh_consts()


def _hex7_sql(expr: str, start: int) -> str:
    """DuckDB: 7 hex chars of `expr` starting at 1-based `start` as a
    BIGINT (< 2^28) — integer-literal weights, the _hex13_sql pattern."""
    return " + ".join(
        f"(strpos('0123456789abcdef', substring({expr}, {start + i}, 1)) - 1)"
        f" * {16 ** (6 - i)}"
        for i in range(7)
    )


# The full portable-minhash pair pipeline as a reusable CTE chain: the
# minhash twin selects from `pairs` directly; the clusters twin appends a
# recursive-CTE connected-components stage on top of the SAME pair graph.
def portable_band_signatures(spark: SparkSession, grams: DataFrame) -> DataFrame:
    """(doc_id, band, sig) LSH band signatures from a (doc_id, g)
    gram-set DF — the row-local half of the portable MinHash pipeline,
    shared by the batch candidate generator (_portable_candidates) and
    the STREAMING ingest-time index (streaming/ingest_dedup.py), which
    must compute bit-identical signatures for a new micro-batch so its
    incremental probe reproduces batch banding exactly.

    ONE md5 per distinct gram, split into two 28-bit halves, then K=16
    minhashes from the Carter-Wegman family
    h_k = (a_k*xa + b_k*xb + c_k) mod (2^31-1) (Carter & Wegman 1979;
    the standard cheap min-wise family, e.g. Broder 1997), band
    signatures assembled ROW-LOCALLY (plain value concat — no second
    hash, no (doc_id, band) shuffle)."""
    rpb = PORTABLE_K // PORTABLE_BANDS
    par = spark.sparkContext.defaultParallelism
    # repartition BEFORE the hash work: compact parquet sources scan as
    # few splits, and everything up to the first exchange would
    # otherwise run on those few cores (the documented fixture trap)
    eg = grams.repartition(par, "doc_id").select(
        "doc_id", F.explode("g").alias("gram")
    )
    h = F.md5("gram")
    xv = eg.select(
        "doc_id",
        F.conv(F.substring(h, 1, 7), 16, 10).cast("long").alias("xa"),
        F.conv(F.substring(h, 8, 7), 16, 10).cast("long").alias("xb"),
    )
    mh = xv.groupBy("doc_id").agg(
        *[
            F.min(
                (F.lit(a) * F.col("xa") + F.lit(b) * F.col("xb") + F.lit(c))
                % PMH_P
            ).alias(f"h{k}")
            for k, (a, b, c) in enumerate(PMH_CONSTS)
        ]
    )
    band_structs = [
        F.struct(
            F.lit(bb).cast("long").alias("band"),
            F.concat_ws(
                ":",
                *[
                    F.col(f"h{k}").cast("string")
                    for k in range(bb * rpb, (bb + 1) * rpb)
                ],
            ).alias("sig"),
        )
        for bb in range(PORTABLE_BANDS)
    ]
    return mh.select(
        "doc_id", F.explode(F.array(*band_structs)).alias("bs")
    ).select("doc_id", "bs.band", "bs.sig")


def _portable_candidates(spark: SparkSession, grams: DataFrame) -> DataFrame:
    """(doc_a, doc_b) candidate pairs from the md5-portable MinHash+LSH
    banding — the shared blocking stage of q_dedup_minhash_portable,
    q_dedup_clusters_portable, q_dedup_containment, q_dedup_cross_source
    and the curation_v2/v3 cascades. ONE md5 per distinct gram, split
    into two 28-bit halves, then K=16 minhashes from the Carter-Wegman
    family h_k = (a_k*xa + b_k*xb + c_k) mod (2^31-1) (Carter & Wegman
    1979; the standard cheap min-wise family, e.g. Broder 1997) — all
    integer arithmetic both engines evaluate identically, so the
    pipeline still replays bit-for-bit in DuckDB
    (_PORTABLE_PAIR_CTES is the SQL twin of this function).

    Why not md5 per (gram, k): the first cut hashed every gram 16 times
    (md5(gram#k)) through a 16x crossJoin — 41.6M md5 calls at the sf1
    decade, and with the compact fixture scanning as ONE split the
    whole hash stage ran single-threaded (measured 80s at sf1, 23.6x
    per decade). This form computes 2.6M md5s + codegen integer mixing
    behind an explicit repartition, one 16-column min-aggregate
    (map-side combined, shuffles n_docs rows), and builds band
    signatures ROW-LOCALLY (plain value concat — no second hash, no
    (doc_id, band) shuffle)."""
    bands = portable_band_signatures(spark, grams)
    # slice of the sorted member set = the cap's keep-lowest-ids rule
    ds = F.slice(F.array_sort(F.collect_set("doc_id")), 1, PMH_BUCKET_CAP)
    pair_expr = F.flatten(
        F.transform(
            F.col("ds"),
            lambda x, i: F.transform(
                F.slice(F.col("ds"), i + 2, F.size(F.col("ds"))),
                lambda y: F.struct(x.alias("doc_a"), y.alias("doc_b")),
            ),
        )
    )
    return (
        bands.groupBy("band", "sig")
        .agg(ds.alias("ds"))
        .filter(F.size("ds") > 1)
        .select(F.explode(pair_expr).alias("p"))
        .select("p.doc_a", "p.doc_b")
        .distinct()
    )


def _portable_pair_ctes(src: str = "documents") -> str:
    """Oracle CTE chain for the md5-portable MinHash banding + Jaccard
    verification, parameterized over the source relation so composed
    pipelines (q_curation_v2) can run it on a filtered survivor set."""
    return f"""toks AS (
  SELECT doc_id, string_split(lower(trim(text)), ' ') AS t
  FROM {src}
),
grams AS (
  SELECT doc_id,
         list_distinct([array_to_string(t[i:i+2], ' ')
                        FOR i IN range(1, len(t) - 1)]) AS g
  FROM toks WHERE len(t) >= 3
),
eg AS (
  SELECT doc_id, unnest(g) AS gram FROM grams
),
xv AS (
  SELECT doc_id,
         ({_hex7_sql("md5(gram)", 1)}) AS xa,
         ({_hex7_sql("md5(gram)", 8)}) AS xb
  FROM eg
),
mh AS (
  SELECT doc_id,
         {", ".join(f"min(({a} * xa + {b} * xb + {c}) % {PMH_P}) AS h{k}" for k, (a, b, c) in enumerate(PMH_CONSTS))}
  FROM xv GROUP BY doc_id
),
bands AS (
  {" UNION ALL ".join(f"SELECT doc_id, CAST({bb} AS BIGINT) AS band, " + " || ':' || ".join(f"CAST(h{k} AS VARCHAR)" for k in range(bb * (PORTABLE_K // PORTABLE_BANDS), (bb + 1) * (PORTABLE_K // PORTABLE_BANDS))) + " AS sig FROM mh" for bb in range(PORTABLE_BANDS))}
),
members AS (
  SELECT doc_id, band, sig,
         row_number() OVER (PARTITION BY band, sig ORDER BY doc_id) AS rn
  FROM bands
),
cand AS (
  SELECT DISTINCT b1.doc_id AS doc_a, b2.doc_id AS doc_b
  FROM members b1 JOIN members b2
    ON b1.band = b2.band AND b1.sig = b2.sig AND b1.doc_id < b2.doc_id
  WHERE b1.rn <= {PMH_BUCKET_CAP} AND b2.rn <= {PMH_BUCKET_CAP}
),
pairs AS (
  SELECT c.doc_a, c.doc_b,
         round(CAST(len(list_intersect(ga.g, gb.g)) AS DOUBLE)
               / len(list_distinct(list_concat(ga.g, gb.g))), 6) AS jaccard
  FROM cand c
  JOIN grams ga ON ga.doc_id = c.doc_a
  JOIN grams gb ON gb.doc_id = c.doc_b
  WHERE CAST(len(list_intersect(ga.g, gb.g)) AS DOUBLE)
        / len(list_distinct(list_concat(ga.g, gb.g))) >= 0.5
)"""


_PORTABLE_PAIR_CTES = _portable_pair_ctes()


# Three queries consume the SAME full-corpus verified pair set
# (q_dedup_minhash_portable, q_dedup_clusters_portable via its pair
# graph, q_dedup_cross_source) and each used to rebuild
# grams -> signatures -> bands -> verify from scratch — the same
# re-execution the graph quartet had before VERDICT r04 #3. Same cure:
# build ONCE per (session, sf_dir), localCheckpoint the (small,
# pair-sized) result, memoize. The gram/signature stages (the dominant
# cost) run exactly once per session; the checkpoint materializes only
# verified pairs, never the corpus-sized gram arrays.
# _PMH_PAIR_BUILDS is the test-visible build counter (tests/test_plans.py
# proves one build serves all three consumers).
_PMH_PAIR_CACHE: dict[tuple[str, str], DataFrame] = {}
_PMH_PAIR_BUILDS = 0

# Session-scoped memo of connected-components LABEL tables (r11): the
# star-contraction loop is DRIVER-ITERATIVE — each round is 2+ eager
# jobs (checkpoint + signature collect), ~2 s of fixed overhead per
# consumer at any scale — and five queries run it over one of exactly
# two edge sets (the memoized portable pairs; the xxhash kernel pairs).
# Same discipline as _PMH_PAIR_CACHE: keyed on (applicationId, sf_dir),
# built from parquet inputs inside the first consumer's timed region,
# pair-bounded rows pinned via localCheckpoint.
_CC_LABEL_CACHE: dict[tuple[str, str, str], DataFrame] = {}
_CC_LABEL_BUILDS = 0


def labels_for(
    spark: SparkSession, sf_dir: str, kind: str, edges: DataFrame
) -> DataFrame:
    """Memoized connected_components(edges) for a canonical per-corpus
    edge set named by `kind` ('portable' = portable_pairs_for's graph,
    'kernel' = q_dedup_minhash's). Callers must pass the SAME logical
    edge set for a given (sf_dir, kind) — the memo key asserts identity
    by construction site, not by plan comparison."""
    global _CC_LABEL_BUILDS
    key = (spark.sparkContext.applicationId, sf_dir, kind)
    cached = _CC_LABEL_CACHE.get(key)
    if cached is not None:
        return cached
    from elric_rs_spark import buildlog

    with buildlog.timed(f"cc_labels_{kind}"):
        labels = connected_components(edges).localCheckpoint()
    _CC_LABEL_CACHE[key] = labels
    _CC_LABEL_BUILDS += 1
    return labels


def portable_pairs_for(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Verified near-dup pairs over the FULL documents corpus, built
    once per (session, sf_dir) and reused by every consumer. The
    curation cascades canNOT share this: they run the banding on a
    filtered survivor set (composition order matters), so they call
    portable_pairs on their own grams."""
    global _PMH_PAIR_BUILDS
    key = (spark.sparkContext.applicationId, sf_dir)
    cached = _PMH_PAIR_CACHE.get(key)
    if cached is not None:
        return cached
    from elric_rs_spark import buildlog

    with buildlog.timed("portable_pairs"):
        d = load_table(spark, sf_dir, "documents")
        grams_arr = F.array_distinct(_word_ngrams(F.col("text"), 3))
        grams = d.select("doc_id", grams_arr.alias("g")).filter(F.size("g") > 0)
        pairs = portable_pairs(spark, grams).localCheckpoint()
    _PMH_PAIR_CACHE[key] = pairs
    _PMH_PAIR_BUILDS += 1
    return pairs


@query(
    "q_dedup_minhash_portable",
    oracle=f"""
WITH {_PORTABLE_PAIR_CTES}
SELECT doc_a, doc_b, jaccard FROM pairs
""",
)
def q_dedup_minhash_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH near-dup with a FULL value oracle — the check the
    fast kernel (q_dedup_minhash, engine-specific xxhash64, rows-only)
    cannot have. One md5 per distinct gram plus the integer
    Carter-Wegman mixing family, which both engines compute
    identically, so the ENTIRE pipeline — K=16 minhashes, 4x4 banding,
    capped bucket candidate generation, exact word-3-gram Jaccard
    >= 0.5 verification — is replayed bit-for-bit by DuckDB. Same
    algorithm, same banding math, same candidate semantics as the
    production kernel; md5 is ~10x xxhash64's cost per call, which is
    why the xxhash64 form remains the at-scale path.

    Scale shape mirrors the production kernel: signatures via explode +
    16-column groupBy min (codegen, map-side combined), candidates
    from a (band, sig) groupBy — never a self-join on the corpus — and
    exact verification touches candidate pairs only. Measured decade
    ratio after the one-md5 rebuild: 3.0x per 10x corpus (was 23.6x
    with per-(gram, k) hashing on a single input split)."""
    return portable_pairs_for(spark, sf_dir)


def portable_pairs(spark: SparkSession, grams: DataFrame) -> DataFrame:
    """Verified near-dup pairs (doc_a, doc_b, jaccard) from a
    (doc_id, g) gram-set DF via the md5-portable banding — the single
    Spark copy of the `pairs` CTE in _portable_pair_ctes; callers:
    q_dedup_minhash_portable and q_curation_v2. The threshold compares
    the UNROUNDED Jaccard (matching the oracle CTE's WHERE); the
    rounded value is only the output column."""
    # r12: the repartition/ReusedExchange sharing this relied on was
    # optimizer-defeated like the kernel's (#15c disease): the finalized
    # build plan held EIGHT documents scans with only 2 reused — the
    # gram explode+array_distinct re-ran inside the signature chain and
    # BOTH verify array sides. One eager DISK_ONLY pin materializes the
    # (doc_id, gram-array) table; candidates and both verify sides read
    # pinned rows (full build cold 10.1 -> ~5 s at sf0.1; values
    # bit-identical, full oracle PASS).
    par = spark.sparkContext.defaultParallelism
    grams = (
        grams.repartition(par, "doc_id")
        .localCheckpoint(eager=True, storageLevel=StorageLevel.DISK_ONLY)
    )
    cand = _portable_candidates(spark, grams)
    ga = grams.select(F.col("doc_id").alias("doc_a"), F.col("g").alias("ga"))
    gb = grams.select(F.col("doc_id").alias("doc_b"), F.col("g").alias("gb"))
    inter = F.size(F.array_intersect("ga", "gb")).cast("double")
    union = F.size(F.array_union("ga", "gb"))
    return (
        cand.join(ga, "doc_a")
        .join(gb, "doc_b")
        .filter(inter / union >= 0.5)
        .select(
            "doc_a",
            "doc_b",
            F.round(inter / union, 6).alias("jaccard"),
        )
    )


@query(
    "q_dedup_clusters_portable",
    oracle=f"""
WITH RECURSIVE {_PORTABLE_PAIR_CTES},
edges AS (
  SELECT doc_a AS u, doc_b AS v FROM pairs
  UNION ALL
  SELECT doc_b, doc_a FROM pairs
),
reach(u, v) AS (
  SELECT u, v FROM edges
  UNION
  SELECT r.u, e.v FROM reach r JOIN edges e ON e.u = r.v
),
labels AS (
  SELECT u AS doc_id, least(u, min(v)) AS rep FROM reach GROUP BY u
)
SELECT rep,
       CAST(count(*) AS BIGINT) AS n_members,
       array_to_string(list_sort(list(doc_id)), ',') AS members
FROM labels
GROUP BY rep
HAVING count(*) >= 2
""",
)
def q_dedup_clusters_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-cluster extraction with a FULL value oracle: connected
    components over the md5-portable MinHash pair graph. The Spark side
    runs the same large-star/small-star contraction as q_dedup_clusters
    (O(log n) rounds, edge-set-sized work); the oracle replays the
    ENTIRE stack — grams, signatures, banding, candidates, Jaccard
    verify, then components via a recursive-CTE transitive closure
    (min reachable vertex = representative). The closure is O(sum of
    squared component sizes) — fine for an oracle at gate scale; the
    star contraction is what runs at 100 TB.
    """
    pairs = q_dedup_minhash_portable(spark, sf_dir).select(
        F.col("doc_a").alias("u"), F.col("doc_b").alias("v")
    )
    labels = labels_for(spark, sf_dir, "portable", pairs)
    members = F.transform(
        F.array_sort(F.collect_list("doc_id")), lambda x: x.cast("string")
    )
    return (
        labels.groupBy("rep")
        .agg(
            F.count(F.lit(1)).alias("n_members"),
            F.array_join(members, ",").alias("members"),
        )
        .filter(F.col("n_members") >= 2)
    )


SIMHASH_PORTABLE_BITS = 64
SIMHASH_PORTABLE_MAXHAM = 3


@query(
    "q_dedup_simhash_portable",
    oracle=f"""
WITH toks AS (
  SELECT doc_id,
         list_distinct(string_split(lower(trim(text)), ' ')) AS t
  FROM documents
),
tok AS (SELECT doc_id, unnest(t) AS tok FROM toks),
bits AS (
  SELECT doc_id, b.b,
         -- bit b of md5(tok): hex digit b//4, bit (3 - b%4) within it
         ((strpos('0123456789abcdef',
                  substr(md5(tok), CAST(b.b // 4 AS INT) + 1, 1)) - 1)
          // (CASE b.b % 4 WHEN 0 THEN 8 WHEN 1 THEN 4
                           WHEN 2 THEN 2 ELSE 1 END)) % 2 AS bit
  FROM tok CROSS JOIN range(0, {SIMHASH_PORTABLE_BITS}) b(b)
),
sig AS (
  SELECT doc_id, b,
         CASE WHEN sum(2 * bit - 1) > 0 THEN 1 ELSE 0 END AS sbit
  FROM bits GROUP BY doc_id, b
),
sigstr AS (
  SELECT doc_id,
         string_agg(CAST(sbit AS VARCHAR), '' ORDER BY b) AS s
  FROM sig GROUP BY doc_id
),
clus AS (
  SELECT s, min(doc_id) AS rep FROM sigstr GROUP BY s
),
member_pairs AS (
  SELECT c.rep AS doc_a, g.doc_id AS doc_b, CAST(0 AS BIGINT) AS hamming
  FROM sigstr g JOIN clus c ON c.s = g.s
  WHERE g.doc_id <> c.rep
),
chunks AS (
  SELECT rep AS doc_id, s, c.c AS chunk,
         substr(s, c.c * 16 + 1, 16) AS piece
  FROM clus CROSS JOIN range(0, 4) c(c)
),
cand AS (
  SELECT DISTINCT c1.doc_id AS doc_a, c2.doc_id AS doc_b
  FROM chunks c1 JOIN chunks c2
    ON c1.chunk = c2.chunk AND c1.piece = c2.piece
   AND c1.doc_id < c2.doc_id
),
scored AS (
  SELECT cand.doc_a, cand.doc_b,
         CAST(len(list_filter(range(1, {SIMHASH_PORTABLE_BITS} + 1),
                  i -> substr(sa.s, CAST(i AS INT), 1) <> substr(sb.s, CAST(i AS INT), 1)))
              AS BIGINT) AS hamming
  FROM cand
  JOIN sigstr sa ON sa.doc_id = cand.doc_a
  JOIN sigstr sb ON sb.doc_id = cand.doc_b
)
SELECT doc_a, doc_b, hamming
FROM scored WHERE hamming <= {SIMHASH_PORTABLE_MAXHAM}
UNION ALL
SELECT doc_a, doc_b, hamming FROM member_pairs
""",
)
def q_dedup_simhash_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup with a FULL value oracle (companion to
    q_dedup_minhash_portable; the xxhash64 SimHash kernel is rows-only
    by nature): per-distinct-token md5 bits vote per position, exact
    Hamming distance filters candidates. Output contract MIRRORS THE
    KERNEL's: identical-signature clusters emit member->rep hamming-0
    rows (linear in cluster size), and hamming 1-3 pairs are emitted
    between cluster REPRESENTATIVES. Every hash/bit step is md5 /
    integer arithmetic both engines compute identically; the blocking
    is recall-exact and therefore engine-local: the oracle keeps the
    simple 4x16-bit pigeonhole chunks (fine at the sf0.01 gate), the
    Spark side uses the kernel's Manku 3-of-6 block tables (same exact
    recall, linear buckets on clustered signatures — see
    q_dedup_simhash for the measured rationale).

    Spark-side scale shape (rebuilt after the sf1->sf3 decade run
    timed the old form out): md5 bits are computed ONCE PER DISTINCT
    TOKEN (a vocabulary-sized table — Zipf-bounded at 100 TB) and
    joined back to the (doc, token) stream, which then passes through
    the kernel's 64-sum-aggregate vote form — no 64x row explosion,
    no per-row md5 recompute, map-side combined."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id",
        F.explode(
            F.array_distinct(F.split(F.lower(F.trim(F.col("text"))), " "))
        ).alias("tok"),
    )
    # vocabulary-level bit table: 64 bit columns from one md5 per
    # distinct token (the corpus token stream never recomputes md5)
    bit_cols = [
        F.expr(
            f"((instr('0123456789abcdef', substr(mh, {b // 4 + 1}, 1)) - 1)"
            f" div {8 >> (b % 4)}) % 2"
        ).alias(f"b_{b}")
        for b in range(SIMHASH_PORTABLE_BITS)
    ]
    vocab = (
        toks.select("tok")
        .distinct()
        .select("tok", F.md5("tok").alias("mh"))
        .select("tok", *bit_cols)
    )
    votes = (
        toks.join(vocab, "tok")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            *[
                F.sum(F.col(f"b_{b}")).alias(f"s_{b}")
                for b in range(SIMHASH_PORTABLE_BITS)
            ],
        )
    )
    # sign-vote per bit (sum(2*bit-1) > 0  <=>  2*sum(bit) > n),
    # assembled straight into the oracle's 64-char bit string
    sigstr = votes.select(
        "doc_id",
        F.concat(
            *[
                F.when(2 * F.col(f"s_{b}") > F.col("n"), F.lit("1")).otherwise(
                    F.lit("0")
                )
                for b in range(SIMHASH_PORTABLE_BITS)
            ]
        ).alias("s"),
    )
    # identical-signature clusters collapse to a representative FIRST
    # (the kernel's contract, now mirrored by the oracle): member->rep
    # rows are the hamming-0 pairs, LINEAR in cluster size — the
    # pre-collapse all-pairs contract was quadratic on clustered
    # corpora (a single signature shared by m docs costs C(m,2) rows)
    # and OOM'd the sf3 decade run.
    clus = sigstr.groupBy("s").agg(F.min("doc_id").alias("rep"))
    member_pairs = (
        sigstr.join(clus, "s")
        .filter(F.col("doc_id") != F.col("rep"))
        .select(
            F.col("rep").alias("doc_a"),
            F.col("doc_id").alias("doc_b"),
            F.lit(0).cast("long").alias("hamming"),
        )
    )
    reps = clus.select(F.col("rep").alias("doc_id"), "s")
    # Manku 3-of-6 blocking on the DISTINCT signatures: blocks of width
    # 11,11,11,11,10,10; each of the 20 combos keys on the concat of
    # its three block substrings. hamming<=3 leaves >=3 blocks intact,
    # so recall is exact — identical output to the oracle's 4x16 form.
    from itertools import combinations as _combos

    _widths = [11, 11, 11, 11, 10, 10]
    _offs = [1 + sum(_widths[:i]) for i in range(6)]
    combo_structs = [
        F.struct(
            F.lit(cid).alias("chunk"),
            F.concat(
                *[
                    F.substring("s", _offs[i], _widths[i])
                    for i in (i1, i2, i3)
                ]
            ).alias("piece"),
        )
        for cid, (i1, i2, i3) in enumerate(_combos(range(6), 3))
    ]
    chunks = reps.select(
        "doc_id", F.explode(F.array(*combo_structs)).alias("c")
    ).select("doc_id", "c.chunk", "c.piece")
    ds = F.array_sort(F.collect_set("doc_id"))
    pair_expr = F.flatten(
        F.transform(
            F.col("ds"),
            lambda x, i: F.transform(
                F.slice(F.col("ds"), i + 2, F.size(F.col("ds"))),
                lambda y: F.struct(x.alias("doc_a"), y.alias("doc_b")),
            ),
        )
    )
    cand = (
        chunks.groupBy("chunk", "piece")
        .agg(ds.alias("ds"))
        .filter(F.size("ds") > 1)
        .select(F.explode(pair_expr).alias("p"))
        .select("p.doc_a", "p.doc_b")
        .distinct()
    )
    sa = reps.select(F.col("doc_id").alias("doc_a"), F.col("s").alias("sa"))
    sb = reps.select(F.col("doc_id").alias("doc_b"), F.col("s").alias("sb"))
    # exact hamming: count positions where the two bit strings differ
    scored = (
        cand.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn(
            "hamming",
            F.expr(
                f"size(filter(sequence(1, {SIMHASH_PORTABLE_BITS}),"
                " i -> substr(sa, i, 1) <> substr(sb, i, 1)))"
            ).cast("long"),
        )
    )
    cross_pairs = scored.filter(
        F.col("hamming") <= SIMHASH_PORTABLE_MAXHAM
    ).select("doc_a", "doc_b", "hamming")
    return cross_pairs.unionByName(member_pairs)


@query(
    "q_dedup_containment",
    oracle=f"""
WITH {_PORTABLE_PAIR_CTES}
SELECT c.doc_a, c.doc_b,
       CAST(len(list_intersect(ga.g, gb.g)) AS BIGINT) AS n_common,
       CAST(len(ga.g) AS BIGINT) AS n_a,
       CAST(len(gb.g) AS BIGINT) AS n_b,
       round(CAST(len(list_intersect(ga.g, gb.g)) AS DOUBLE)
             / least(len(ga.g), len(gb.g)), 6) AS containment
FROM cand c
JOIN grams ga ON ga.doc_id = c.doc_a
JOIN grams gb ON gb.doc_id = c.doc_b
WHERE 10 * len(list_intersect(ga.g, gb.g)) >= 9 * least(len(ga.g), len(gb.g))
""",
)
def q_dedup_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Containment dedup (doc-in-doc): flags pairs where >= 90% of the
    SMALLER document's word-3-gram set appears in the other — the
    near-containment case (quoted article inside a digest, README
    embedded in a bundle) that symmetric Jaccard under-scores because
    the union is dominated by the larger doc. Candidates reuse the
    md5-portable MinHash banding, so the whole pipeline — candidates,
    intersection counts, containment values — replays bit-for-bit in
    DuckDB; the threshold compares cross-multiplied exact integers
    (10*|∩| >= 9*min(|A|,|B|)), no float in the filter.

    Honest recall caveat (by construction, shared with every
    LSH-blocked containment pass): banding keys on symmetric MinHash,
    so an extreme size ratio (tiny A fully inside huge B, Jaccard ~
    |A|/|B|) may miss candidates; at scale the dedicated blocking is
    min-k of the SMALLER side's grams probed against the big side —
    same shuffle shape, different key. The verification stage here is
    that operator's verification stage unchanged."""
    d = load_table(spark, sf_dir, "documents")
    grams_arr = F.array_distinct(_word_ngrams(F.col("text"), 3))
    grams = d.select("doc_id", grams_arr.alias("g")).filter(F.size("g") > 0)
    grams = grams.repartition(spark.sparkContext.defaultParallelism, "doc_id")
    cand = _portable_candidates(spark, grams)
    ga = grams.select(F.col("doc_id").alias("doc_a"), F.col("g").alias("ga"))
    gb = grams.select(F.col("doc_id").alias("doc_b"), F.col("g").alias("gb"))
    n_common = F.size(F.array_intersect("ga", "gb")).cast("long")
    n_a = F.size("ga").cast("long")
    n_b = F.size("gb").cast("long")
    return (
        cand.join(ga, "doc_a")
        .join(gb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            n_common.alias("n_common"),
            n_a.alias("n_a"),
            n_b.alias("n_b"),
            F.round(
                n_common.cast("double") / F.least(n_a, n_b).cast("double"), 6
            ).alias("containment"),
        )
        .filter(10 * F.col("n_common") >= 9 * F.least("n_a", "n_b"))
    )


# SemDeDup threshold: cosine >= 0.35 == 7/20 (the synthetic embeddings
# top out at ~0.47 within-cluster cosine, same calibration note as
# q_dedup_embed's 0.4). The filter never touches a float: cos >= t is
# cross-multiplied to STRICT dot > 0 AND 400*dot^2 >= 49*nsq_a*nsq_b
# (strict: cos >= 0.35 implies a positive dot for nonzero norms, and
# >= 0 would let an all-zero quantized vector wipe its cluster; the
# pair of two all-zero vectors is special-cased as an exact dup) on
# milli-int components (|c| <= ~530 for the +-0.53-range data ->
# dot <= 64*530^2 ~ 1.8e7, 400*dot^2 ~ 1.3e17 < 2^63 — BIGINT-safe in
# BOTH engines with no HUGEINT widening).
SEMANTIC_T_NUM_SQ = 49    # t^2 = 49/400  (t = 7/20 = 0.35)
SEMANTIC_T_DEN_SQ = 400
# Oversized-cell guard (the standard SemDeDup production cap, now
# IMPLEMENTED rather than documented — the r5 sf1 decade run measured
# the uncapped audit growing 21x per 10x of corpus under a fixed
# cluster count): clusters larger than the cap are hash-split into
# ceil(n/CAP) sub-cells via an md5-derived uniform key and the pairwise
# stage runs within (cluster, sub-cell). Per-cluster pair work drops
# from n^2/2 to ~n*CAP/2 — linear in corpus size. At every driver scale
# (sf0.001/0.01/0.1: cluster sizes <= ~200) no cluster exceeds the cap,
# so sub = 0 everywhere and results are bit-identical to the uncapped
# form. Cross-sub-cell duplicate pairs are the sanctioned approximation
# (SemDeDup itself already accepts cross-CLUSTER misses by design).
SEMANTIC_CELL_CAP = 512


def _semantic_hex13(expr: str) -> str:
    from elric_rs_spark.operators.similarity import _hex13_sql

    return _hex13_sql(expr)


@query(
    "q_dedup_semantic",
    oracle=f"""
WITH comp AS (
  SELECT vec_id, label, i AS dim,
         CAST(round(CAST(embedding[i] AS DOUBLE) * 1000) AS BIGINT) AS mil
  FROM embeddings, range(1, 65) t(i)
  WHERE i <= len(embedding)
),
sums AS (
  SELECT label AS c_label, dim,
         CAST(sum(mil) AS BIGINT) AS s, CAST(count(*) AS BIGINT) AS n
  FROM comp GROUP BY label, dim
),
cent AS (
  SELECT c_label, dim, (s - ((s % n + n) % n)) // n AS icent FROM sums
),
scores AS (
  SELECT comp.vec_id, cent.c_label,
         CAST(sum(comp.mil * cent.icent) AS BIGINT) AS score
  FROM comp JOIN cent ON comp.dim = cent.dim
  GROUP BY comp.vec_id, cent.c_label
),
assign AS (
  SELECT vec_id, c_label AS cluster
  FROM (SELECT vec_id, c_label,
               row_number() OVER (PARTITION BY vec_id
                                  ORDER BY score DESC, c_label) AS rn
        FROM scores)
  WHERE rn = 1
),
norms AS (
  SELECT vec_id, CAST(sum(mil * mil) AS BIGINT) AS nsq
  FROM comp GROUP BY vec_id
),
csize AS (
  SELECT cluster, CAST(count(*) AS BIGINT) AS n_c FROM assign GROUP BY cluster
),
subs AS (
  SELECT a.vec_id, a.cluster,
         ({_semantic_hex13("md5('s' || a.vec_id)")})
           % ((c.n_c + {SEMANTIC_CELL_CAP - 1}) // {SEMANTIC_CELL_CAP}) AS sub
  FROM assign a JOIN csize c ON c.cluster = a.cluster
),
dots AS (
  SELECT sa.cluster, a.vec_id AS ida, b.vec_id AS idb,
         CAST(sum(a.mil * b.mil) AS BIGINT) AS dot
  FROM comp a
  JOIN subs sa ON sa.vec_id = a.vec_id
  JOIN subs sb ON sb.cluster = sa.cluster AND sb.sub = sa.sub
  JOIN comp b ON b.vec_id = sb.vec_id AND b.dim = a.dim
  WHERE a.vec_id < b.vec_id
  GROUP BY sa.cluster, a.vec_id, b.vec_id
),
dropped AS (
  SELECT DISTINCT d.cluster, d.idb AS vec_id
  FROM dots d
  JOIN norms na ON na.vec_id = d.ida
  JOIN norms nb ON nb.vec_id = d.idb
  WHERE (d.dot > 0
         AND {SEMANTIC_T_DEN_SQ} * d.dot * d.dot
             >= {SEMANTIC_T_NUM_SQ} * na.nsq * nb.nsq)
     OR (na.nsq = 0 AND nb.nsq = 0)
)
SELECT a.cluster,
       CAST(count(*) AS BIGINT) AS n_vecs,
       CAST(count(dr.vec_id) AS BIGINT) AS n_dropped,
       CAST(coalesce(sum(dr.vec_id), 0) AS BIGINT) AS drop_id_sum
FROM assign a
LEFT JOIN dropped dr ON dr.vec_id = a.vec_id AND dr.cluster = a.cluster
GROUP BY a.cluster
""",
)
def q_dedup_semantic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-style semantic dedup (Abbas et al. 2023, arXiv:2303.09540
    — public method): cluster the embedding space (here one exact k-means
    assignment step against the label centroids, the same
    floor-div-integer centroid construction as q_kmeans_assign), then
    drop every vector whose cosine similarity to a LOWER-id vector in
    the SAME cluster exceeds the threshold — keep-lowest-id survivor
    rule, pairwise comparison confined to a cluster, never the corpus.

    Output is the per-cluster audit row (n_vecs, n_dropped, checksum of
    dropped ids), which verifies every pairwise decision without
    emitting O(n^2) pairs.

    Cross-engine exactness: components quantize to milli-ints so every
    dot product and norm is an exact BIGINT; the cosine threshold is
    cross-multiplied into integer arithmetic (see SEMANTIC_T_* above) —
    no float ever enters a filter, so DuckDB replays bit-for-bit.

    Scale shape: centroids are O(k x dims) — broadcast; assignment is
    map-side-combinable per-vector argmax (no shuffle before it); the
    only quadratic is WITHIN a cluster, and that is now BOUNDED by the
    SEMANTIC_CELL_CAP hash-split guard (see the constant's comment):
    clusters above the cap are md5-split into sub-cells, making
    per-cluster pair work linear in cluster size — the r5 sf1 decade
    measured the uncapped form growing 21x per 10x corpus under a fixed
    k, the capped form scales linearly. At every driver scale no
    cluster exceeds the cap, so results are bit-identical to the
    uncapped construction. No window over the corpus, no cross join:
    the pair generation is an equi-join on (cluster, sub) over member
    rows carrying their milli-int ARRAYS, with each pair's dot computed
    in place (see the pair-stage comment for the measured decade cost
    of the exploded per-dim form it replaces)."""
    e = load_table(spark, sf_dir, "embeddings")
    # Centroid build (exploded form — the only consumer of per-dim rows;
    # output is O(k x dims), tiny at any corpus size). The r11
    # optimization round removed the exploded form from every OTHER
    # stage: the old plan recomputed the comp explode + centroid join +
    # two-level score aggregate SIX times across its branches (16
    # embeddings scans / 31 shuffles in the final adaptive plan —
    # plans/r11/q_dedup_semantic_before.txt) because column pruning
    # differentiates the branch subtrees below each repartition and
    # defeats AQE stage reuse.
    comp = e.select(
        "label",
        F.posexplode(F.col("embedding")).alias("pos", "val"),
    ).select(
        "label",
        (F.col("pos") + 1).cast("long").alias("dim"),
        F.round(F.col("val").cast("double") * 1000).cast("long").alias("mil"),
    )
    sums = comp.groupBy(F.col("label").alias("c_label"), "dim").agg(
        F.sum("mil").alias("s"), F.count(F.lit(1)).alias("n")
    )
    cent = sums.select(
        "c_label", "dim", F.expr("(s - pmod(s, n)) div n").alias("icent")
    )
    # Assemble each centroid into a dim-ascending array (dims per label
    # are contiguous 1..max_member_len — posexplode of an array yields
    # every prefix dim — so array position i IS dim i+1). The k x dims
    # centroid table is collected to the driver (the q_sim_ivf_trained
    # precedent: driver-side math over k centroids, independent of
    # corpus size) and closed over by the assignment kernel below.
    cent_rows = (
        cent.groupBy("c_label")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("dim", "icent"))),
                lambda s: s["icent"],
            ).alias("cvec")
        )
        .collect()
    )
    # Assignment + milli quantization + norm in ONE Arrow-vectorized
    # pass over the corpus (guide §4.2: hand whole batches to NumPy
    # instead of interpreted expression trees — the old zip_with/
    # aggregate HOF dots are CodegenFallback and evaluated interpreted
    # per element, measured ~1.4 s/pass at sf0.1). Exactness contract:
    # milli components are integers; every GEMM partial sum is an
    # integer < 2^53, so float64 matmul is EXACT and order-free — the
    # same sum the old per-dim join aggregate produced. Ties pick the
    # smallest label: labels are sorted ascending and argmax returns
    # the FIRST maximum. The empty/null-embedding filter replicates the
    # old join-form semantics exactly: a vector with no dims produced
    # no comp rows, hence no score rows, hence never appeared in the
    # output.
    import numpy as np  # local: Python worker import cost, not module

    labels_sorted = sorted(cent_rows, key=lambda r: r["c_label"])
    c_labels = [int(r["c_label"]) for r in labels_sorted]
    c_vecs = [list(r["cvec"]) for r in labels_sorted]
    c_dim = max((len(v) for v in c_vecs), default=0)
    c_mat = np.zeros((len(c_vecs), c_dim), dtype=np.float64)
    for i, v in enumerate(c_vecs):
        c_mat[i, : len(v)] = v
    c_lab_arr = np.asarray(c_labels, dtype=np.int64)

    def _milli(col):
        """round-half-away-from-zero to milli ints, matching Spark/
        DuckDB round() on doubles (np.round is half-even)."""
        t = col * 1000.0
        return np.where(t >= 0, np.floor(t + 0.5), np.ceil(t - 0.5))

    def _assign_batches(batches):
        import pandas as pd

        for pdf in batches:
            if not len(pdf) or not len(c_labels):
                continue
            vs = [
                _milli(np.asarray(v, dtype=np.float64))
                for v in pdf["embedding"]
            ]
            lens = np.asarray([len(v) for v in vs], dtype=np.int64)
            width = max(int(lens.max()), c_dim)
            m = np.zeros((len(vs), width), dtype=np.float64)
            for i, v in enumerate(vs):
                m[i, : len(v)] = v
            peak = float(np.abs(m).max()) if m.size else 0.0
            if peak > 2_000_000:
                raise ValueError(
                    "q_dedup_semantic: milli component "
                    f"{peak:.0f} exceeds the exact-float64-GEMM bound "
                    "(2e6); the documented domain is milli-int "
                    "components |c| <= ~530"
                )
            cm = c_mat
            if width > c_dim:
                cm = np.zeros((len(c_vecs), width), dtype=np.float64)
                cm[:, :c_dim] = c_mat
            # zero padding == the old coalesce(x*y, 0) join semantics:
            # a dim missing from either side contributes 0
            scores = m @ cm.T
            best = np.argmax(scores, axis=1)  # first max = smallest label
            nsq = (m * m).sum(axis=1)
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"].astype("int64"),
                    "m": [v.astype(np.int64) for v in vs],
                    "nsq": nsq.astype(np.int64),
                    "cluster": c_lab_arr[best],
                }
            )

    side0 = (
        e.filter(F.col("embedding").isNotNull() & (F.size("embedding") >= 1))
        .select("vec_id", "embedding")
        .mapInPandas(
            _assign_batches,
            "vec_id long, m array<long>, nsq long, cluster long",
        )
        # side0 is the materialized assignment table every downstream
        # branch (csize, the pair stage, the final rollup) scans — ONE
        # corpus pass instead of six (guide §3.3: materialize a
        # multi-consumer intermediate to truncate the plan; recomputing
        # it would re-cross the Python boundary per branch). DISK_ONLY:
        # corpus-proportional rows must never hold deserialized JVM heap
        # residency (the sf30 co-purchase OOM lesson, graph.py:55).
        .localCheckpoint(eager=True, storageLevel=StorageLevel.DISK_ONLY)
    )
    # oversized-cell guard: hash-split clusters above SEMANTIC_CELL_CAP
    # into ceil(n/CAP) md5-keyed sub-cells; the pairwise stage joins on
    # (cluster, sub) so per-cluster work is linear in cluster size.
    # csize is O(k) rows — always broadcast.
    csize = side0.groupBy("cluster").agg(F.count(F.lit(1)).alias("n_c"))
    side = side0.join(F.broadcast(csize), "cluster").select(
        "vec_id",
        "cluster",
        "m",
        "nsq",
        (
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit("s"), F.col("vec_id").cast("string"))),
                    1, 13,
                ),
                16, 10,
            ).cast("long")
            % F.expr(
                f"(n_c + {SEMANTIC_CELL_CAP - 1}) div {SEMANTIC_CELL_CAP}"
            )
        ).alias("sub"),
    )
    # Pair stage as ONE exact-BLAS kernel per (cluster, sub) cell — the
    # q_dedup_embed tiled-GEMM pattern (dedup.py block_pairs). The r11
    # optimization round replaced the pair-row join form here: the old
    # a JOIN b ON (cluster, sub) emitted every pair as a row and
    # computed its dot via zip_with/aggregate HOFs, which are
    # CodegenFallback — interpreted per element, measured ~3 s/pass at
    # sf0.1 (~1M pairs x 64 dims) and the dominant wall of the whole
    # query. The kernel computes the same dots as ONE float64 GEMM per
    # cell (every partial sum is an integer < 2^53 — exact and
    # order-free), applies the same integer threshold in int64 (the
    # 400*dot^2 comparison overflows float64's 2^53 but fits int64 by
    # the documented milli-component domain, guarded below), and emits
    # only the per-cell DROPPED ids — no pair rows cross the boundary,
    # no distinct shuffle (a vector belongs to exactly ONE cell, so
    # per-cell drop sets are globally unique by construction). Cells
    # are bounded by SEMANTIC_CELL_CAP, so per-kernel memory is O(CAP^2).
    # Semantics preserved bit-for-bit, including:
    # - STRICT dot > 0: cos >= 0.35 implies a positive dot for nonzero
    #   norms, and >= 0 would let an all-zero quantized vector (nsq=0,
    #   dot=0 against everyone) mark its entire cluster as duplicates;
    # - TWO all-zero vectors ARE exact duplicates and still collapse;
    # - pairs of DIFFERENT vector lengths: the old zip_with padded with
    #   NULL, so their dot was NULL and only the all-zero special case
    #   could drop them — replicated by GEMM-ing per length group.
    import pandas as pd

    def _cell_drops(pdf: pd.DataFrame) -> pd.DataFrame:
        n = len(pdf)
        empty = pd.DataFrame(
            {
                "cluster": pd.Series(dtype="int64"),
                "vec_id": pd.Series(dtype="int64"),
            }
        )
        if n < 2:
            return empty
        pdf = pdf.sort_values("vec_id").reset_index(drop=True)
        ids = pdf["vec_id"].to_numpy()
        nsq = pdf["nsq"].to_numpy()
        lens = np.asarray([len(v) for v in pdf["m"]], dtype=np.int64)
        drop = np.zeros(n, dtype=bool)
        # all-zero special case, across the whole cell regardless of
        # vector length: every zero vector except the lowest-id one drops
        zpos = np.flatnonzero(nsq == 0)
        if len(zpos) >= 2:
            drop[zpos[1:]] = True
        # exact-dot groups: only same-length pairs have a non-NULL dot
        for length in np.unique(lens):
            pos = np.flatnonzero(lens == length)
            if len(pos) < 2:
                continue
            mg = np.stack(
                [np.asarray(pdf["m"].iloc[int(p)], dtype=np.float64) for p in pos]
            )
            peak = float(np.abs(mg).max()) if mg.size else 0.0
            if length * peak * peak > 1.44e8:
                # 400*dot^2 must stay < 2^63 (the old ANSI-long filter
                # raised past this; fail just as loudly)
                raise ValueError(
                    "q_dedup_semantic: cell dot bound "
                    f"{length * peak * peak:.3g} exceeds the int64 "
                    "threshold-comparison domain (milli |c| <= ~530 "
                    "at dims <= 64 documented)"
                )
            g = (mg @ mg.T).astype(np.int64)  # exact: partials < 2^53
            ng = nsq[pos].astype(np.int64)
            cond = (g > 0) & (
                SEMANTIC_T_DEN_SQ * g * g >= SEMANTIC_T_NUM_SQ * np.outer(ng, ng)
            )
            # ida < idb == upper triangle by sorted position
            hit = np.triu(cond, k=1).any(axis=0)
            drop[pos[hit]] = True
        if not drop.any():
            return empty
        return pd.DataFrame(
            {
                "cluster": np.full(int(drop.sum()), int(pdf["cluster"].iloc[0]), dtype=np.int64),
                "vec_id": ids[drop].astype(np.int64),
            }
        )

    dropped = side.groupBy("cluster", "sub").applyInPandas(
        _cell_drops, "cluster long, vec_id long"
    )
    return (
        side0.select("cluster", "vec_id")
        .join(dropped.withColumn("is_drop", F.lit(1)), ["cluster", "vec_id"], "left")
        .groupBy("cluster")
        .agg(
            F.count(F.lit(1)).alias("n_vecs"),
            F.count("is_drop").alias("n_dropped"),
            F.coalesce(F.sum(F.when(F.col("is_drop") == 1, F.col("vec_id"))), F.lit(0))
            .cast("long")
            .alias("drop_id_sum"),
        )
    )


# Passage width for passage-level exact dedup: non-overlapping 8-token
# windows (the fixed-width stand-in for paragraph boundaries, which the
# synthetic corpus lacks).
PASSAGE_TOKENS = 8


@query(
    "q_passage_dedup",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, string_split(lower(trim(text)), ' ') AS t
  FROM documents
),
expanded AS (
  -- scalar range() returns a LIST, so it can take a column argument
  -- (the table-function form rejects lateral column parameters)
  SELECT doc_id, t,
         unnest(range(0, CAST(ceil(len(t) / {PASSAGE_TOKENS}.0) AS BIGINT)))
           AS i
  FROM toks WHERE len(t) > 0
),
passages AS (
  SELECT doc_id,
         array_to_string(
           t[CAST(i * {PASSAGE_TOKENS} + 1 AS BIGINT)
             : CAST(i * {PASSAGE_TOKENS} + {PASSAGE_TOKENS} AS BIGINT)],
           ' ') AS passage
  FROM expanded
),
freq AS (
  SELECT passage, CAST(count(*) AS BIGINT) AS n_occ
  FROM passages GROUP BY passage
)
SELECT p.doc_id,
       CAST(count(*) AS BIGINT) AS n_passages,
       CAST(sum(CASE WHEN f.n_occ >= 2 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_dup_passages,
       round(CAST(sum(CASE WHEN f.n_occ >= 2 THEN 1 ELSE 0 END) AS DOUBLE)
             / count(*), 6) AS dup_ratio
FROM passages p JOIN freq f ON f.passage = p.passage
GROUP BY p.doc_id
""",
)
def q_passage_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Passage-level exact dedup audit (the sub-document pass exact-dedup
    misses and MinHash over-grains): each document splits into
    non-overlapping 8-token passages; a passage is a duplicate when its
    exact text occurs >= 2 times corpus-wide (across docs OR repeated
    within one — repeated boilerplate inside a single page counts).
    Output is the per-doc passage count, duplicate-passage count, and
    duplicate ratio — the sub-document twin of q_dedup_exact.

    Passages come from arithmetic slices (doc splits into
    ceil(n/8) windows via explode(sequence) + slice), NOT from
    collect_list — no ordering assumptions, no grouped re-assembly.

    Scale shape: same as q_chunk_split's generator fan-out (no shuffle
    to build passages), then ONE groupBy on the passage string for
    occurrence counts (uniform short-string keys, map-side combined),
    a join back on the passage, and a per-doc rollup. At 100 TB,
    replace the raw passage join key with xxhash64(passage) to shrink
    shuffle bytes — kept as the raw string here so DuckDB replays it."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", F.split(F.lower(F.trim(F.col("text"))), " ").alias("t")
    ).filter(F.size("t") > 0)
    n_pass = F.ceil(F.size("t").cast("double") / PASSAGE_TOKENS).cast("long")
    passages = toks.select(
        "doc_id",
        "t",
        F.explode(F.sequence(F.lit(0), n_pass - 1)).alias("i"),
    ).select(
        "doc_id",
        F.array_join(
            F.slice(F.col("t"), (F.col("i") * PASSAGE_TOKENS + 1).cast("int"),
                    PASSAGE_TOKENS),
            " ",
        ).alias("passage"),
    )
    freq = passages.groupBy("passage").agg(F.count(F.lit(1)).alias("n_occ"))
    dup = F.sum(F.when(F.col("n_occ") >= 2, 1).otherwise(0)).cast("long")
    return (
        passages.join(freq, "passage")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_passages"), dup.alias("n_dup_passages"))
        .select(
            "doc_id",
            "n_passages",
            "n_dup_passages",
            F.round(
                F.col("n_dup_passages").cast("double") / F.col("n_passages"), 6
            ).alias("dup_ratio"),
        )
    )


# Exact-substring dedup span: 13 tokens, the span length Lee et al. 2021
# (arXiv:2107.06499, public method) found marks verbatim duplication with
# negligible false positives.
SPAN_TOKENS = 13


def _substring_cov_ctes(src: str = "documents") -> str:
    """Oracle CTE chain for duplicated-13-token-span coverage (ends in a
    `cov` relation), parameterized over the source relation — the SQL
    twin of substring_coverage()."""
    return f"""sc_toks AS (
  SELECT doc_id, string_split(lower(trim(text)), ' ') AS t
  FROM {src}
),
sc_ex AS (
  SELECT doc_id, t, len(t) AS n_tokens,
         unnest(range(1, len(t) - {SPAN_TOKENS} + 2)) AS i
  FROM sc_toks WHERE len(t) >= {SPAN_TOKENS}
),
sc_w AS (
  SELECT doc_id, n_tokens, i,
         array_to_string(
           t[CAST(i AS BIGINT) : CAST(i + {SPAN_TOKENS} - 1 AS BIGINT)],
           ' ') AS win
  FROM sc_ex
),
sc_f AS (
  SELECT win, CAST(count(*) AS BIGINT) AS n_occ FROM sc_w GROUP BY win
),
sc_dup AS (
  SELECT sc_w.doc_id, sc_w.n_tokens, sc_w.i AS s,
         sc_w.i + {SPAN_TOKENS} - 1 AS e
  FROM sc_w JOIN sc_f ON sc_f.win = sc_w.win
  WHERE sc_f.n_occ >= 2
),
sc_merged AS (
  SELECT doc_id, n_tokens, s, e,
         max(e) OVER (PARTITION BY doc_id ORDER BY s
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS prev_e
  FROM sc_dup
),
cov AS (
  SELECT doc_id,
         CAST(n_tokens AS BIGINT) AS n_tokens,
         CAST(count(*) AS BIGINT) AS n_dup_windows,
         CAST(sum(greatest(0, e - greatest(s - 1, coalesce(prev_e, 0))))
              AS BIGINT) AS covered_tokens,
         round(CAST(sum(greatest(0, e - greatest(s - 1, coalesce(prev_e, 0))))
                    AS DOUBLE) / n_tokens, 6) AS coverage_ratio
  FROM sc_merged
  GROUP BY doc_id, n_tokens
)"""


@query(
    "q_substring_dedup",
    oracle=f"""
WITH {_substring_cov_ctes("documents")}
SELECT doc_id, n_tokens, n_dup_windows, covered_tokens, coverage_ratio
FROM cov
""",
)
def q_substring_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-substring dedup audit (Lee et al. 2021, arXiv:2107.06499 —
    public method, the ExactSubstr pass): every sliding 13-token window
    is matched corpus-wide; a document's duplicated-span coverage is the
    fraction of its tokens inside at least one window whose exact text
    occurs >= 2 times anywhere (the tokens ExactSubstr would cut).
    Output: per-doc window count, interval-union covered-token count,
    and coverage ratio — docs only appear if they contain >= 1
    duplicated window.

    The interval union is the classic sorted-sweep: windows sorted by
    start, each contributing max(0, end - max(start-1, running-max
    prev end)) — one per-doc window function over only the DUPLICATED
    windows (bounded by doc length), identical SQL semantics on both
    engines.

    Scale shape: the sliding fan-out is 13x the token stream — the
    inherent cost of exact-substring matching (a suffix array pays the
    same linearized cost); the window-frequency groupBy keys on uniform
    13-token strings (at 100 TB: xxhash64 the window instead of
    shuffling raw strings — kept raw here so DuckDB replays it). The
    per-doc sweep window partitions on doc_id, never the corpus."""
    d = load_table(spark, sf_dir, "documents")
    return substring_coverage(d)


def substring_coverage(d: DataFrame) -> DataFrame:
    """Per-doc duplicated-13-token-span coverage for a documents DF —
    the q_substring_dedup kernel, factored so composed pipelines
    (q_curation_v2) can run it on any document set. Returns (doc_id,
    n_tokens, n_dup_windows, covered_tokens, coverage_ratio); docs
    with no duplicated window produce no row."""
    toks = d.select(
        "doc_id", F.split(F.lower(F.trim(F.col("text"))), " ").alias("t")
    ).filter(F.size("t") >= SPAN_TOKENS)
    ex = toks.select(
        "doc_id",
        "t",
        F.size("t").cast("long").alias("n_tokens"),
        F.explode(
            F.sequence(F.lit(1), F.size("t") - SPAN_TOKENS + 1)
        ).alias("i"),
    )
    # ONE pass over the exploded windows (r11, guide §2.4): the old
    # groupBy(win)+join-back shape computed the window explode +
    # array_join subtree TWICE (the freq branch and the join branch
    # re-derive it independently — 2 documents scans / 3 exchanges in
    # plans/r11/q_substring_dedup_before.txt) and shipped the 13-token
    # window STRINGS — the widest rows this operator owns — across the
    # network twice (freq partial-agg shuffle + the join's broadcast or
    # co-partition shuffle at scale). A count() window over
    # partitionBy(win) attaches the identical per-window occurrence
    # count in the SAME exchange the frequency aggregate needed anyway:
    # one scan, one win-keyed exchange, no join, no broadcast — window
    # strings shuffle ONCE and the explode subtree runs once.
    from pyspark.sql import Window as W

    w = ex.select(
        "doc_id",
        "n_tokens",
        "i",
        F.array_join(F.slice(F.col("t"), F.col("i"), SPAN_TOKENS), " ").alias("win"),
    )
    n_occ = F.count(F.lit(1)).over(W.partitionBy("win"))
    dup = (
        w.withColumn("n_occ", n_occ)
        .filter(F.col("n_occ") >= 2)
        .select(
            "doc_id",
            "n_tokens",
            F.col("i").alias("s"),
            (F.col("i") + SPAN_TOKENS - 1).alias("e"),
        )
    )

    sweep = W.partitionBy("doc_id").orderBy("s").rowsBetween(
        W.unboundedPreceding, -1
    )
    merged = dup.withColumn("prev_e", F.max("e").over(sweep))
    contrib = F.greatest(
        F.lit(0),
        F.col("e") - F.greatest(F.col("s") - 1, F.coalesce(F.col("prev_e"), F.lit(0))),
    )
    return (
        merged.groupBy("doc_id", "n_tokens")
        .agg(
            F.count(F.lit(1)).alias("n_dup_windows"),
            F.sum(contrib).alias("covered_tokens"),
        )
        .select(
            "doc_id",
            "n_tokens",
            "n_dup_windows",
            "covered_tokens",
            F.round(
                F.col("covered_tokens").cast("double") / F.col("n_tokens"), 6
            ).alias("coverage_ratio"),
        )
    )


# --- embedding-LSH dedup portable twin (round 5) -----------------------
# q_dedup_embed_lsh's hyperplane buckets come from the engine-internal
# float hash family (rows-only). This twin replays the SAME operator —
# hyperplane-bucket blocking, exact cosine on candidates only, ranked
# top-20 candidate output — with the md5 ±1-sign hyperplane family and
# exact BIGINT micro-component arithmetic, so every stage is
# bit-identical in DuckDB.
#
# Band width is CORPUS-ADAPTIVE: bits = clamp(ceil(log2(n / 16)), 4, 24),
# so the expected bucket load stays ~16 vectors at every corpus size and
# candidate generation stays LINEAR in n. The first cut fixed bits=4
# (16 buckets per band): fine at the grading scales, but the round-5 sf1
# decade measured it at 86x wall for 10x data — 200k vectors / 16
# buckets = 12.5k-vector buckets and a quadratic pair explosion.
# Fixed-parameter LSH is quadratic at SOME scale; the scale-correct form
# derives the parameter from the corpus (inside the plan — a one-row
# count broadcast, no driver round-trip), exactly like a production
# index sizes its hash tables.
#
# ROUND-9 sf30 finding: the original form packed all 4 tables' keys into
# ONE 56-bit BIGINT signature, which silently capped bits at 56/4 = 14 —
# and past the ceiling (n > 2^14 * 16 = 262k vectors, first crossed at
# sf30's 600k) bucket occupancy grows with n again and pair volume goes
# QUADRATIC (measured: ~8M capped candidate pairs at sf10 -> 74.5M at
# sf30, 9.3x for 3x data). The fix drops the single-BIGINT pack: each
# table's key is aggregated DIRECTLY over its own plane slice
# (key_t = sum of [dot_{t*bits+j} >= 0] << j), so the width cap is now
# per-TABLE (24 bits = 268M expected vectors per table before the next
# ceiling — and lifting it further is one constant). Plane work is
# corpus-adaptive too: only tables*bits of the PDLSH_MAX_PLANES seed
# family are computed (56 planes at sf10, 64 at sf30, 16 at the grading
# scales — the md5 (p, d) seed family is unchanged, so keys, candidates
# and output are bit-identical to the packed form wherever bits <= 14).
# A deterministic 256-member bucket cap (lowest vec_ids kept, replayed
# by the oracle) still bounds pathological buckets.
PDLSH_TABLES = 4
PDLSH_TARGET_BUCKET = 16   # expected vectors per band-bucket
PDLSH_MIN_BITS = 4
PDLSH_MAX_BITS = 24        # per-table key width (was 14: the 4x14=56-bit pack ceiling)
PDLSH_MAX_PLANES = PDLSH_TABLES * PDLSH_MAX_BITS
# legacy alias: the planted pure-Python twin (tests/test_scale_patterns)
# packs sigs over all seed planes, then slices — value-identical
PDLSH_PLANES = PDLSH_MAX_PLANES
PDLSH_BUCKET_CAP = 256

# bits = smallest b in [MIN, MAX] with (1 << b) * TARGET_BUCKET >= n,
# computed by INTEGER threshold counting (bits = MIN + #{thresholds
# exceeded}) rather than ceil(log2(n/16)): Spark and DuckDB evaluate
# log2 in their own libm, and a 1-ulp difference near an integer result
# would flip the band width between engines and break bit-identical
# grading. Value-identical to the log2 form for every n >= 1.
PDLSH_BIT_THRESHOLDS = [
    (1 << (b - 1)) * PDLSH_TARGET_BUCKET
    for b in range(PDLSH_MIN_BITS + 1, PDLSH_MAX_BITS + 1)
]
_PDLSH_BITS_SQL = f"CAST({PDLSH_MIN_BITS} + " + " + ".join(
    f"(CASE WHEN count(*) > {t} THEN 1 ELSE 0 END)"
    for t in PDLSH_BIT_THRESHOLDS
) + " AS BIGINT)"


def _pdlsh_bits_col():
    """Spark aggregate-expression form of _PDLSH_BITS_SQL (same
    thresholds, same integer arithmetic)."""
    cnt = F.count(F.lit(1))
    bits = F.lit(PDLSH_MIN_BITS)
    for t in PDLSH_BIT_THRESHOLDS:
        bits = bits + F.when(cnt > t, F.lit(1)).otherwise(F.lit(0))
    return bits.cast("long")


@query(
    "q_dedup_embed_lsh_portable",
    oracle=f"""
WITH wf AS (
  SELECT vec_id, label, embedding FROM embeddings WHERE len(embedding) = 64
),
comp AS (
  SELECT vec_id, i AS d,
         CAST(round(CAST(embedding[i] AS DOUBLE) * 1000000) AS BIGINT) AS micro
  FROM wf, range(1, 65) t(i)
),
nb AS (
  SELECT {_PDLSH_BITS_SQL} AS bits
  FROM wf
),
w AS (
  SELECT p, i AS d,
         CASE WHEN strpos('01234567', substring(md5(p || '#' || i), 1, 1)) > 0
              THEN 1 ELSE -1 END AS w
  FROM range(0, {PDLSH_MAX_PLANES}) pp(p), range(1, 65) t(i), nb
  WHERE p < {PDLSH_TABLES} * nb.bits
),
dots AS (
  SELECT c.vec_id, w.p, SUM(c.micro * w.w) AS dot
  FROM comp c JOIN w ON w.d = c.d
  GROUP BY c.vec_id, w.p
),
bands AS (
  SELECT d.vec_id, d.p // nb.bits AS t,
         SUM(CASE WHEN d.dot >= 0
                  THEN (CAST(1 AS BIGINT) << CAST(d.p % nb.bits AS INT))
                  ELSE 0 END) AS key
  FROM dots d, nb
  GROUP BY d.vec_id, d.p // nb.bits
),
members AS (
  SELECT vec_id, t, key,
         row_number() OVER (PARTITION BY t, key ORDER BY vec_id) AS rn
  FROM bands
),
cand AS (
  SELECT DISTINCT b1.vec_id AS vec_a, b2.vec_id AS vec_b
  FROM members b1
  JOIN members b2 ON b1.t = b2.t AND b1.key = b2.key
                 AND b1.vec_id < b2.vec_id
  WHERE b1.rn <= {PDLSH_BUCKET_CAP} AND b2.rn <= {PDLSH_BUCKET_CAP}
),
prods AS (
  SELECT c.vec_a, c.vec_b,
         SUM(ca.micro * cb.micro) AS sab,
         SUM(ca.micro * ca.micro) AS saa,
         SUM(cb.micro * cb.micro) AS sbb
  FROM cand c
  JOIN comp ca ON ca.vec_id = c.vec_a
  JOIN comp cb ON cb.vec_id = c.vec_b AND cb.d = ca.d
  GROUP BY c.vec_a, c.vec_b
)
SELECT p.vec_a, p.vec_b, e.label,
       round(CAST(sab AS DOUBLE)
             / (sqrt(CAST(saa AS DOUBLE)) * sqrt(CAST(sbb AS DOUBLE))), 6)
         AS cosine
FROM prods p JOIN wf e ON e.vec_id = p.vec_a
ORDER BY cosine DESC, p.vec_a, p.vec_b
LIMIT 20
""",
)
def q_dedup_embed_lsh_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup with LSH-bucket blocking and a FULL value
    oracle — the value-checkable twin of q_dedup_embed_lsh (which keeps
    the engine-internal float hyperplane family and stays rows-only).
    Same contract: bucket-blocked candidate pairs (never a corpus
    self-join), exact cosine on candidates only, output = the 20
    strongest candidate pairs (a production dedup run thresholds the
    same plan at >= 0.9; the synthetic corpus tops out ~0.47, so the
    ranking is the checkable surface — same rationale as the rows-only
    kernel, dedup.py:366).

    Cross-engine exactness: ±1 md5-sign hyperplanes over BIGINT
    micro-components (bit-identical bucket membership), integer
    cross-products for the cosine, ties at the top-20 cut line broken
    on (vec_a, vec_b). Scale shape mirrors the production kernel —
    signature via broadcast weight join + one map-side-combined (vec,
    plane) aggregate, candidates from (table, key) bucket groupBy,
    exact cosine touches candidates only, final top-20 is TakeOrdered —
    with the band width derived IN-PLAN from the corpus size (one-row
    count broadcast; see the PDLSH constants comment for the measured
    sf1 quadratic blow-up that fixed bits=4 produced, and the round-9
    sf30 pack-ceiling finding that moved key aggregation per-TABLE) and
    a deterministic PDLSH_BUCKET_CAP guard on pathological buckets.

    FIXED-LENGTH PRECONDITION (ADVICE r10): ragged / null embeddings are
    filtered ONCE at the source (not just at the verify stage), so
    candidate generation and the verify join see the same vector set;
    the oracle applies the identical predicate (wf CTE)."""
    from elric_rs_spark.operators.similarity import EMB_DIM

    # r12 (VERDICT r11 #6 — the kernel twin's r11 pin applied here):
    # the finalized plan held FOUR embeddings scans (comp for the
    # signature chain, nb's count, both verify array sides; 2 reused) —
    # the same optimizer-defeated sharing as q_dedup_minhash's grams.
    # ONE eager DISK_ONLY pin materializes the cast micro arrays +
    # per-vector nsq fold + label; everything downstream (components,
    # band-width count, both verify sides, the final label join)
    # derives from the pinned rows. micro == round(cast(x as double)
    # * 1e6) per element exactly as _micro_comp computed it, so every
    # downstream integer is bit-identical; proven row-identical pre/post
    # at sf0.001/0.01 (full oracle) and the plan shows 0 embeddings
    # scans in the query body.
    def _fold(col, fn):
        return F.aggregate(col, F.lit(0).cast("long"), fn)

    n_parts = int(spark.conf.get("spark.sql.shuffle.partitions"))
    e = (
        load_table(spark, sf_dir, "embeddings")
        .select("vec_id", "label", "embedding")
        .filter(F.size("embedding") == EMB_DIM)
        .select(
            "vec_id",
            "label",
            F.transform(
                "embedding",
                lambda x: F.round(x.cast("double") * 1000000).cast("long"),
            ).alias("m"),
        )
        .withColumn("nsq", _fold(F.col("m"), lambda acc, x: acc + x * x))
        .repartition(n_parts, "vec_id")
        .localCheckpoint(eager=True, storageLevel=StorageLevel.DISK_ONLY)
    )
    comp = e.select("vec_id", F.posexplode("m").alias("pos", "micro")).select(
        "vec_id",
        (F.col("pos") + 1).cast("long").alias("d"),
        "micro",
    )
    # corpus-adaptive band width, derived inside the plan by integer
    # threshold counting (see PDLSH_BIT_THRESHOLDS — no cross-engine libm)
    nb = e.agg(_pdlsh_bits_col().alias("bits"))
    # md5 ±1-sign weight table (same (p, d) seed family as the 16-plane
    # _plsh_bands signature; planes 0..15 coincide), trimmed IN-PLAN to
    # the tables*bits planes this corpus actually needs
    dims = spark.range(1, EMB_DIM + 1).select(F.col("id").alias("d"))
    planes = spark.range(PDLSH_MAX_PLANES).select(
        F.col("id").cast("int").alias("p")
    )
    sign_src = F.md5(
        F.concat(F.col("p").cast("string"), F.lit("#"), F.col("d").cast("string"))
    )
    w = (
        planes.crossJoin(dims)
        .select(
            "p",
            "d",
            F.when(
                F.substring(sign_src, 1, 1).isin(*"01234567"), F.lit(1)
            ).otherwise(F.lit(-1)).cast("long").alias("w"),
        )
        .crossJoin(F.broadcast(nb))
        .filter(F.col("p") < F.lit(PDLSH_TABLES) * F.col("bits"))
        .select("p", "d", "w")
    )
    dots = (
        comp.join(F.broadcast(w), "d")
        .groupBy("vec_id", "p")
        .agg(F.sum(F.col("micro") * F.col("w")).alias("dot"))
    )
    # per-table key aggregated DIRECTLY over the table's plane slice
    # (key_t bit j = sign of plane t*bits+j) — no single-BIGINT
    # signature pack, hence no 4*bits <= 63 width ceiling
    bands = (
        dots.crossJoin(F.broadcast(nb))
        .groupBy("vec_id", F.expr("p div bits").cast("long").alias("t"))
        .agg(
            F.sum(
                F.when(
                    F.col("dot") >= 0,
                    F.expr(
                        "shiftleft(CAST(1 AS BIGINT), CAST(p % bits AS INT))"
                    ),
                ).otherwise(F.lit(0).cast("long"))
            ).alias("key")
        )
    )
    from pyspark.sql import Window as _W

    banded = (
        bands.withColumn(
            "rn",
            F.row_number().over(
                _W.partitionBy("t", "key").orderBy("vec_id")
            ),
        )
        .filter(F.col("rn") <= PDLSH_BUCKET_CAP)
        .drop("rn")
    )
    ds = F.array_sort(F.collect_set("vec_id"))
    pair_expr = F.flatten(
        F.transform(
            F.col("ds"),
            lambda x, i: F.transform(
                F.slice(F.col("ds"), i + 2, F.size(F.col("ds"))),
                lambda y: F.struct(x.alias("vec_a"), y.alias("vec_b")),
            ),
        )
    )
    cand = (
        banded.groupBy("t", "key")
        .agg(ds.alias("ds"))
        .filter(F.size("ds") > 1)
        .select(F.explode(pair_expr).alias("pr"))
        .select("pr.vec_a", "pr.vec_b")
        .distinct()
    )
    # exact-cosine verify in ARRAY form (the q_dedup_semantic r5 fix,
    # applied here by the round-9 sf30 triplicate): the component-row
    # form pushed |cand| x 64 rows (1.08B at sf30, ~43 GB of sort-merge
    # state on the 16g heap) through the verify join — measured 6.0x
    # wall for 3x data where the design bound is 3.43x. One packed
    # micro-array per vector joins each pair ONCE; the BIGINT zip_with
    # dot and the per-side norm folds are the same exact-integer sums in
    # a different evaluation order-independent grouping, so cosine is
    # bit-identical. The oracle keeps its component CTE.
    #
    # (e is already length-filtered at the source — see the docstring's
    # fixed-length precondition — so zip_with never null-pads and the
    # candidate and verify stages see the same vector set.)
    # Per-VECTOR squared norm folded once in the pin (r11, guide §4.2)
    # instead of per candidate pair in the verify: candidates outnumber
    # vectors, so the per-pair saa/sbb re-folds were redundant work. The
    # nsq column rides the EXISTING shuffle-hash join sides (one extra
    # BIGINT next to the m array) — no separate norm table, so the
    # VERDICT r9 #3 corpus-broadcast cliff still cannot occur. The fold
    # is the identical exact-integer sum over the identical array, so
    # saa/sbb (and hence cosine) are bit-identical.
    marr = e.select("vec_id", "m", "nsq")

    sab = _fold(F.zip_with("ma", "mb", lambda x, y: x * y), lambda acc, x: acc + x)
    saa = F.col("nsq_a")
    sbb = F.col("nsq_b")
    # SHUFFLE_HASH on the vector side: below the broadcast threshold AQE
    # broadcasts it anyway, above it (sf30's 312 MB array table) the
    # default SMJ would SORT the pair side with attached arrays (~12 GB
    # at sf30 — measured 82 s vs 6 s at sf10, a 13.7x cliff for 2.8x
    # pairs). Hash-building the per-partition vector slice streams the
    # pairs unsorted; at any corpus size the build side is
    # |vectors|/shuffle_partitions rows.
    prods = (
        cand.join(
            marr.select(
                F.col("vec_id").alias("vec_a"),
                F.col("m").alias("ma"),
                F.col("nsq").alias("nsq_a"),
            ).hint("shuffle_hash"),
            "vec_a",
        )
        .join(
            marr.select(
                F.col("vec_id").alias("vec_b"),
                F.col("m").alias("mb"),
                F.col("nsq").alias("nsq_b"),
            ).hint("shuffle_hash"),
            "vec_b",
        )
        .select(
            "vec_a",
            "vec_b",
            sab.alias("sab"),
            saa.alias("saa"),
            sbb.alias("sbb"),
        )
    )
    cosine = F.round(
        F.col("sab").cast("double")
        / (F.sqrt(F.col("saa").cast("double")) * F.sqrt(F.col("sbb").cast("double"))),
        6,
    )
    return (
        prods.withColumn("cosine", cosine)
        .join(e.select(F.col("vec_id").alias("vec_a"), "label"), "vec_a")
        .select("vec_a", "vec_b", "label", "cosine")
        .orderBy(F.col("cosine").desc(), "vec_a", "vec_b")
        .limit(20)
    )


@query(
    "q_dedup_cross_source",
    oracle=f"""
WITH {_PORTABLE_PAIR_CTES},
src AS (SELECT doc_id, source FROM documents),
xp AS (
  SELECT least(sa.source, sb.source) AS src_lo,
         greatest(sa.source, sb.source) AS src_hi,
         p.doc_a, p.doc_b, p.jaccard
  FROM pairs p
  JOIN src sa ON sa.doc_id = p.doc_a
  JOIN src sb ON sb.doc_id = p.doc_b
  WHERE sa.source != sb.source
)
SELECT src_lo, src_hi,
       CAST(count(*) AS BIGINT) AS n_pairs,
       round(max(jaccard), 6) AS max_jaccard,
       CAST(sum(doc_a + doc_b) AS BIGINT) AS pair_id_sum
FROM xp
GROUP BY src_lo, src_hi
""",
)
def q_dedup_cross_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source near-duplicate leakage report: the MinHash+LSH
    verified pairs (portable md5 banding, word-3-gram Jaccard >= 0.5)
    restricted to pairs whose two documents come from DIFFERENT
    sources, rolled up per unordered source pair. This is the
    train/test-split leakage audit — a benchmark source sharing
    near-dups with a crawl source is exactly what decontamination must
    catch — and the provenance view dedup-by-content alone can't give.

    Scale shape: the verified pair set comes from the SHARED
    session-memoized build (portable_pairs_for — one gram/signature
    pass serves this query, the minhash twin, and the cluster
    extraction) plus two source-annotation joins and a tiny
    source-pair rollup. The pair side is usually the small side, but
    its cardinality is DATA-DEPENDENT (a duplicate-heavy corpus can
    verify a huge pair set even with candidate caps), so the joins
    carry no hard broadcast hint: AQE's runtime size stats pick
    broadcast-hash when the pairs are small and fall back to shuffle
    join when they aren't — a forced F.broadcast here would be a
    driver-OOM landmine at 100 TB."""
    d = load_table(spark, sf_dir, "documents")
    pairs = portable_pairs_for(spark, sf_dir)
    src = d.select("doc_id", "source")
    sa = src.select(F.col("doc_id").alias("doc_a"), F.col("source").alias("sa"))
    sb = src.select(F.col("doc_id").alias("doc_b"), F.col("source").alias("sb"))
    ann_a = sa.join(pairs, "doc_a")  # pair-sized result
    return (
        sb.join(ann_a, "doc_b")
        .filter(F.col("sa") != F.col("sb"))
        .groupBy(
            F.least("sa", "sb").alias("src_lo"),
            F.greatest("sa", "sb").alias("src_hi"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.round(F.max("jaccard"), 6).alias("max_jaccard"),
            F.sum(F.col("doc_a") + F.col("doc_b")).alias("pair_id_sum"),
        )
    )


# ---------------------------------------------------------------------------
# Bloom-filter membership dedup (incremental: new shard vs reference corpus)
# ---------------------------------------------------------------------------

BLOOM_M = 1 << 20   # filter size in bits — literal, shared with the oracle
BLOOM_K = 5         # probes per key (Kirsch-Mitzenmacher double hashing)


@query(
    "q_dedup_bloom",
    oracle=f"""
WITH keyed AS (
  SELECT doc_id, md5(lower(trim(text))) AS h FROM documents
),
hv AS (
  SELECT doc_id,
         ({{XA}}) AS h1,
         ({{XB}}) AS h2
  FROM keyed
),
pos AS (
  SELECT doc_id, ((h1 + j.j * h2 + j.j * j.j) % {BLOOM_M}) AS p
  FROM hv CROSS JOIN (SELECT unnest(range(0, {BLOOM_K})) AS j) j
),
refset AS (
  SELECT DISTINCT p FROM pos WHERE doc_id % 4 <> 0
),
incoming AS (
  SELECT doc_id, p FROM pos WHERE doc_id % 4 = 0
),
hits AS (
  SELECT i.doc_id,
         CAST(sum(CASE WHEN r.p IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
           AS n_hits
  FROM incoming i LEFT JOIN refset r ON r.p = i.p
  GROUP BY i.doc_id
),
truth AS (
  SELECT DISTINCT a.doc_id
  FROM keyed a JOIN keyed b ON b.h = a.h AND b.doc_id % 4 <> 0
  WHERE a.doc_id % 4 = 0
)
SELECT h.doc_id, h.n_hits,
       CAST(CASE WHEN h.n_hits = {BLOOM_K} THEN 1 ELSE 0 END AS INT)
         AS maybe_dup,
       CAST(CASE WHEN t.doc_id IS NOT NULL THEN 1 ELSE 0 END AS INT)
         AS true_dup
FROM hits h LEFT JOIN truth t ON t.doc_id = h.doc_id
""".replace("{XA}", _hex7_sql("h", 1)).replace("{XB}", _hex7_sql("h", 8)),
)
def q_dedup_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter membership dedup — the incremental-ingest pattern: a
    new crawl shard (doc_id % 4 == 0 stands in for "today's data") is
    checked against a compact filter built from the reference corpus
    (the other three quarters), WITHOUT joining the corpus text. This is
    how a 100 TB pipeline dedups a daily delta: the filter is
    O(M) = 2^20 positions regardless of corpus size, the corpus is read
    once to build it, and the delta never shuffles against corpus text.

    Exact-semantics portability: instead of a packed bitset (whose
    layout no SQL oracle could replay), the filter is represented as
    the DISTINCT SET of probe positions — semantically the identical
    Bloom filter (a position-set membership test with the same
    false-positive behavior), expressible in both engines as a
    distinct + left join. Probes are Kirsch-Mitzenmacher enhanced
    double hashing, p_j = (h1 + j*h2 + j^2) mod 2^20, from the two
    28-bit md5 halves (the q_dedup_minhash_portable idiom) — all
    integer arithmetic, bit-identical across engines. The query also
    emits the exact-match ground truth (true_dup) so the result
    exposes the filter's false positives directly: maybe_dup=1,
    true_dup=0 rows ARE the FP set (at fixture scale the 2^20-bit /
    5-probe filter holds FP ~ (n*k/m)^k well under 1e-6).

    Plan: one scan computes md5 + probe positions (codegen, no
    Python); the reference position set reduces to <= min(n*k, 2^20)
    rows and BROADCASTS — bounded by the LITERAL filter size, not by
    data (the ADVICE r05 broadcast rule: only design-bounded sets get
    the hint); the delta side aggregates hits map-side on doc_id. The
    truth join hashes 16-byte digests, never text."""
    d = load_table(spark, sf_dir, "documents")
    keyed = d.select(
        "doc_id", F.md5(F.lower(F.trim(F.col("text")))).alias("h")
    )
    hv = keyed.select(
        "doc_id",
        F.conv(F.substring("h", 1, 7), 16, 10).cast("long").alias("h1"),
        F.conv(F.substring("h", 8, 7), 16, 10).cast("long").alias("h2"),
    )
    j = F.explode(F.sequence(F.lit(0), F.lit(BLOOM_K - 1))).alias("j")
    pos = hv.select("doc_id", "h1", "h2", j).select(
        "doc_id",
        (
            (F.col("h1") + F.col("j") * F.col("h2") + F.col("j") * F.col("j"))
            % BLOOM_M
        ).alias("p"),
    )
    refset = (
        pos.filter(F.col("doc_id") % 4 != 0).select("p").distinct()
        .withColumn("hit", F.lit(1))
    )
    incoming = pos.filter(F.col("doc_id") % 4 == 0)
    hits = (
        incoming.join(F.broadcast(refset), "p", "left")
        .groupBy("doc_id")
        .agg(F.sum(F.coalesce(F.col("hit"), F.lit(0))).alias("n_hits"))
    )
    # digest sets are corpus-proportional, so NO broadcast hint here —
    # AQE picks the strategy (the ADVICE r05 rule; only the 2^20-bounded
    # refset above earns a hard hint)
    truth = (
        keyed.filter(F.col("doc_id") % 4 == 0)
        .alias("a")
        .join(
            keyed.filter(F.col("doc_id") % 4 != 0).select("h").distinct().alias("b"),
            F.col("a.h") == F.col("b.h"),
            "left_semi",
        )
        .select("doc_id")
        .distinct()
        .withColumn("t", F.lit(1))
    )
    return (
        hits.join(truth, "doc_id", "left")
        .select(
            "doc_id",
            "n_hits",
            F.when(F.col("n_hits") == BLOOM_K, 1)
            .otherwise(0)
            .cast("int")
            .alias("maybe_dup"),
            F.coalesce(F.col("t"), F.lit(0)).cast("int").alias("true_dup"),
        )
    )


DEDUP_EVAL_SAMPLE = 200   # ground-truth sample: doc_id < this literal


@query(
    "q_dedup_recall_eval",
    oracle=f"""
WITH {{CTES}},
struth AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         (1000 * len(list_intersect(a.g, b.g)))
           // len(list_distinct(list_concat(a.g, b.g))) AS jperm
  FROM grams a JOIN grams b
    ON a.doc_id < b.doc_id
   AND a.doc_id < {DEDUP_EVAL_SAMPLE} AND b.doc_id < {DEDUP_EVAL_SAMPLE}
),
truth AS (SELECT doc_a, doc_b, jperm FROM struth WHERE jperm >= 500),
caught AS (
  SELECT t.jperm,
         CASE WHEN p.doc_a IS NOT NULL THEN 1 ELSE 0 END AS c
  FROM truth t
  LEFT JOIN pairs p ON p.doc_a = t.doc_a AND p.doc_b = t.doc_b
)
SELECT CAST(CASE WHEN jperm >= 1000 THEN 9 ELSE jperm // 100 END AS BIGINT)
         AS jband,
       CAST(count(*) AS BIGINT) AS n_truth,
       CAST(sum(c) AS BIGINT) AS n_caught,
       round(CAST(sum(c) AS DOUBLE) / count(*), 6) AS recall
FROM caught GROUP BY 1
""".replace("{CTES}", _PORTABLE_PAIR_CTES),
)
def q_dedup_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Banding-recall evaluation for the MinHash+LSH dedup family — the
    dedup-side twin of q_sim_recall's ANN recall curve: exact all-pairs
    word-3-gram Jaccard ground truth on a BOUNDED deterministic sample
    (doc_id < 200 — 19,900 pairs regardless of corpus size, so the
    quadratic stage is capped by a literal, never by data), compared
    against the portable banding's verified pairs, reported as recall
    per Jaccard-permille band [500-600) .. [900-1000]. This is the
    measurement a pipeline owner uses to pick band/row parameters: the
    LSH s-curve means recall rises with Jaccard, and a cap/banding
    regression shows up as a depressed band before it ever corrupts
    production output (the round-6 hash-family bug would have floored
    this curve).

    Integer discipline: ground-truth Jaccard is permille floor-div
    (1000*|inter| div |union| — floor(1000x) >= 500 is exactly
    x >= 0.5, matching the verify threshold), bands are integer
    division, recall rounds once at 6dp.

    Plan: the truth side self-joins ONLY the 200-doc sample (both
    sides scan-pruned by the literal predicate); the pair side reuses
    the session-shared portable pair build (portable_pairs_for — no
    recompute); the comparison is a broadcast-size left join."""
    d = load_table(spark, sf_dir, "documents")
    grams_arr = F.array_distinct(_word_ngrams(F.col("text"), 3))
    sample = (
        d.filter(F.col("doc_id") < DEDUP_EVAL_SAMPLE)
        .select("doc_id", grams_arr.alias("g"))
        .filter(F.size("g") > 0)
    )
    ga = sample.select(F.col("doc_id").alias("doc_a"), F.col("g").alias("ga"))
    gb = sample.select(F.col("doc_id").alias("doc_b"), F.col("g").alias("gb"))
    jperm = F.expr(
        "(1000 * size(array_intersect(ga, gb)))"
        " div size(array_union(ga, gb))"
    )
    truth = (
        ga.join(F.broadcast(gb), F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", jperm.alias("jperm"))
        .filter(F.col("jperm") >= 500)
    )
    pairs = portable_pairs_for(spark, sf_dir).select(
        "doc_a", "doc_b", F.lit(1).alias("c")
    )
    caught = truth.join(pairs, ["doc_a", "doc_b"], "left").select(
        "jperm", F.coalesce(F.col("c"), F.lit(0)).alias("c")
    )
    jband = F.when(F.col("jperm") >= 1000, 9).otherwise(
        F.expr("jperm div 100")
    )
    return (
        caught.groupBy(jband.cast("long").alias("jband"))
        .agg(
            F.count(F.lit(1)).alias("n_truth"),
            F.sum("c").alias("n_caught"),
        )
        .select(
            "jband",
            "n_truth",
            "n_caught",
            F.round(
                F.col("n_caught").cast("double") / F.col("n_truth"), 6
            ).alias("recall"),
        )
    )


# ---------------------------------------------------------------------------
# Ingest-order near-dup verdict (round 8): the batch contract for the
# STREAMING ingest-time dedup path (streaming/ingest_dedup.py, VERDICT
# r07 #4). A document arriving at ingest time is judged against EARLIER
# documents only (doc_id = arrival order); this query states that
# verdict batch-side, and the foreachBatch incremental probe must
# reproduce it exactly (tests/test_streaming_dedup.py asserts
# stream == batch on the union of micro-batches).
#
# The equivalence is sound because every stage of the portable pipeline
# is prefix-stable under id-ordered arrival: band signatures are
# row-local; the PMH_BUCKET_CAP keep-lowest-256-ids rule admits exactly
# the docs an incremental index (which freezes a bucket once it holds
# 256 members) would have admitted, since lowest ids arrive first; and
# Jaccard verification is pairwise.
@query(
    "q_dedup_stream_batch",
    oracle=f"""
WITH {_PORTABLE_PAIR_CTES}
SELECT doc_b AS doc_id,
       CAST(count(*) AS BIGINT) AS n_earlier_dups,
       min(doc_a) AS first_partner,
       max(jaccard) AS best_jaccard
FROM pairs
GROUP BY doc_b
""",
)
def q_dedup_stream_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document ingest-order duplicate verdict: for each doc that
    near-duplicates at least one EARLIER doc (portable MinHash banding,
    capped buckets, word-3-gram Jaccard >= 0.5 — q_dedup_minhash_portable's
    exact pair semantics), report how many earlier partners it hits,
    the earliest partner (the doc a dedup policy would keep), and the
    best Jaccard. doc_a < doc_b by construction, so grouping the shared
    pair set by doc_b IS the "judged against earlier docs only" rule.

    Scale shape: rides the memoized portable_pairs_for build (one gram/
    signature pass per session, localCheckpoint-ed pair-sized result)
    plus one pair-grain groupBy. The streaming twin in
    streaming/ingest_dedup.py runs the same math incrementally per
    micro-batch against a persisted band index; its cost per batch is
    batch-sized, not corpus-sized — the 100 TB ingest path."""
    pairs = portable_pairs_for(spark, sf_dir)
    return pairs.groupBy(F.col("doc_b").alias("doc_id")).agg(
        F.count(F.lit(1)).alias("n_earlier_dups"),
        F.min("doc_a").alias("first_partner"),
        F.max("jaccard").alias("best_jaccard"),
    )
