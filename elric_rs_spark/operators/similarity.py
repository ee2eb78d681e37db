"""Similarity search over embeddings (SURVEY.md X16).

Two paths, as a real 100 TB pipeline needs both:
- `q_sim_topk`: brute-force cosine top-k against a query vector — the
  exact baseline. One broadcast of the query vector, one linear scan, a
  TakeOrdered top-k. No shuffle of the corpus. This is what you run when
  k*queries is small and you need exact results.
- `q_sim_lsh`: random-hyperplane LSH bucketing (sign of dot with H fixed
  hyperplanes -> H-bit bucket key). Neighbor candidates share a bucket;
  the expensive cosine runs per-bucket only. At 1000 executors the bucket
  join is a shuffle on small uniform keys — the IVF/LSH scale path.

Both are pure built-ins: zip_with + aggregate for the dot products.
Hyperplanes are derived deterministically from xxhash64 of (dim, plane)
so results are reproducible with no RNG state anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from elric_rs_spark.registry import query
from elric_rs_spark.tables import load_table
from elric_rs_spark.functions.vector import (
    as_double as _as_double,
    dot as _dot,
    norm_l2 as _norm,
)

EMB_DIM = 64
# Multi-table banding: 4 independent tables x 16 hyperplanes each. One
# 64-bit sign signature is computed per vector; each 16-bit chunk is one
# table's bucket key. 16-bit keys make buckets cluster-sized (2^16 keys
# per table) instead of the round-1 quadratic 2^8=256-bucket layout.
LSH_TABLES = 4
LSH_TABLE_BITS = 16
LSH_PLANES = LSH_TABLES * LSH_TABLE_BITS  # 64


@query(
    "q_sim_topk",
    oracle="""
WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
q AS (SELECT v AS qv FROM e WHERE vec_id = 0)
SELECT
  e.vec_id,
  e.label,
  round(list_dot_product(e.v, q.qv)
        / (sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(q.qv, q.qv))), 6)
    AS cosine
FROM e, q
WHERE e.vec_id != 0
ORDER BY cosine DESC, vec_id
LIMIT 10
""",
)
def q_sim_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-10 neighbors of vec_id=0 (X16 baseline).
    Ties broken on vec_id; similarity rounded before ranking so the
    ordering is stable across engines."""
    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "label", _as_double("embedding").alias("v")
    )
    q = e.filter(F.col("vec_id") == 0).select(F.col("v").alias("qv"))
    cosine = F.round(
        _dot(F.col("v"), F.col("qv")) / (_norm(F.col("v")) * _norm(F.col("qv"))), 6
    )
    return (
        e.filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(q))
        .select("vec_id", "label", cosine.alias("cosine"))
        .orderBy(F.col("cosine").desc(), "vec_id")
        .limit(10)
    )


def _hyperplanes(n_planes: int = LSH_PLANES):
    """n_planes deterministic pseudo-random hyperplanes as array literals:
    component (p, d) = hash-derived value in [-1, 1]. Extending n_planes
    never changes existing planes (the seed is per-(p, d))."""

    def h64(p: int, d: int) -> float:
        # splitmix64-ish deterministic scramble -> [-1, 1]
        x = (p * 0x9E3779B97F4A7C15 + d * 0xBF58476D1CE4E5B9 + 0x94D049BB133111EB) % (1 << 64)
        x ^= x >> 30
        x = (x * 0xBF58476D1CE4E5B9) % (1 << 64)
        x ^= x >> 27
        x = (x * 0x94D049BB133111EB) % (1 << 64)
        x ^= x >> 31
        return (x / float((1 << 64) - 1)) * 2.0 - 1.0

    return [[h64(p, d) for d in range(EMB_DIM)] for p in range(n_planes)]


def _plane_df(spark: SparkSession, n_planes: int = LSH_PLANES):
    """The hyperplanes as a broadcastable (p, d, w) long-form table —
    the matmul-by-join layout (plane id, dimension, weight)."""
    rows = [
        (p, d, w)
        for p, row in enumerate(_hyperplanes(n_planes))
        for d, w in enumerate(row)
    ]
    return spark.createDataFrame(rows, "p int, d int, w double")


def hyperplane_signatures(spark: SparkSession, vecs: DataFrame,
                          id_col: str = "vec_id", vec_col: str = "v") -> DataFrame:
    """64-bit sign signature per vector (bit p = sign of dot with plane p),
    computed as a broadcast matmul: posexplode dims -> broadcast-join the
    plane table -> groupBy (id, p) partial-sum -> bit_or assembly.

    Why not 64 per-plane `dot()` expressions: HOF lambdas evaluate
    interpreted and a 64-wide dot tree is both slow to plan-compile and
    slow to run (round-1 measured trap). The join form stays in
    whole-stage codegen with map-side combine, and at cluster scale the
    only shuffle is the (id, p) partial-sum reusing the id partitioning."""
    el = vecs.select(id_col, F.posexplode(vec_col).alias("d", "val"))
    dots = (
        el.join(F.broadcast(_plane_df(spark)), "d")
        .groupBy(id_col, "p")
        .agg(F.sum(F.col("val") * F.col("w")).alias("dot"))
    )
    # shiftleft() in the Python API takes only a literal shift; the SQL
    # form accepts a column for the per-row plane index
    bit = F.when(
        F.col("dot") >= 0, F.expr("shiftleft(CAST(1 AS BIGINT), p)")
    ).otherwise(F.lit(0).cast("long"))
    return dots.groupBy(id_col).agg(F.bit_or(bit).alias("sig"))


def lsh_band_keys(sig_df: DataFrame, id_col: str = "vec_id") -> DataFrame:
    """Explode the 64-bit signature into LSH_TABLES (t, key) band rows —
    one 16-bit chunk per independent table (same pigeonhole shape as
    SimHash's chunk blocking in dedup.py)."""
    mask = (1 << LSH_TABLE_BITS) - 1
    chunk_structs = [
        F.struct(
            F.lit(t).alias("t"),
            F.shiftrightunsigned("sig", LSH_TABLE_BITS * t)
            .bitwiseAND(F.lit(mask))
            .alias("key"),
        )
        for t in range(LSH_TABLES)
    ]
    return sig_df.select(
        id_col, F.explode(F.array(*chunk_structs)).alias("b")
    ).select(id_col, "b.t", "b.key")


def _lsh_banded(spark: SparkSession, vecs: DataFrame, id_col: str,
                vec_col: str, nb: DataFrame, carry: str | None) -> DataFrame:
    """(id, t, key [, vec, nsq]) band rows from the shared Arrow GEMM
    banding kernel (see lsh_candidate_pairs for the geometry). With
    `carry` (an nsq column name) the kernel ALSO passes the vector and
    its prefolded squared norm through — one array copy per (vector,
    table), so downstream bucket verify never joins arrays onto pair
    rows (lsh_candidate_cosines)."""
    import numpy as np

    from elric_rs_spark.operators.dedup import PDLSH_MAX_PLANES, PDLSH_TABLES

    planes_np = np.asarray(_hyperplanes(PDLSH_MAX_PLANES), dtype=np.float64)

    def _band_batches(batches):
        import pandas as pd

        for pdf in batches:
            if not len(pdf):
                continue
            bits = int(pdf["bits"].iloc[0])
            pl = planes_np[: PDLSH_TABLES * bits]
            dim = pl.shape[1]
            v = np.zeros((len(pdf), dim), dtype=np.float64)
            for i, arr in enumerate(pdf[vec_col]):
                a = np.asarray(arr, dtype=np.float64)[:dim]
                v[i, : len(a)] = a
            dots = v @ pl.T  # (n, tables*bits)
            signs = dots >= 0
            weights = 1 << np.arange(bits, dtype=np.int64)
            ids = pdf[id_col].astype("int64")
            out = []
            for t in range(PDLSH_TABLES):
                key = (signs[:, t * bits : (t + 1) * bits] * weights).sum(
                    axis=1
                )
                frame = {id_col: ids, "t": np.int64(t), "key": key.astype(np.int64)}
                if carry is not None:
                    frame[vec_col] = pdf[vec_col]
                    frame[carry] = pdf[carry]
                out.append(pd.DataFrame(frame))
            yield pd.concat(out, ignore_index=True)

    cols = [id_col, vec_col] + ([carry] if carry is not None else [])
    schema = f"{id_col} long, t long, key long"
    if carry is not None:
        schema += f", {vec_col} array<double>, {carry} double"
    return (
        vecs.filter(F.col(vec_col).isNotNull() & (F.size(vec_col) >= 1))
        .select(*cols)
        .crossJoin(F.broadcast(nb))
        .mapInPandas(_band_batches, schema)
    )


def lsh_candidate_cosines(spark: SparkSession, vecs: DataFrame,
                          id_col: str = "vec_id", vec_col: str = "v",
                          nsq_col: str = "nsq") -> DataFrame:
    """(id_a, id_b, cosine) — lsh_candidate_pairs' candidates with the
    exact cosine computed IN-BUCKET (r11 sf30 decade catch, guide §2.2
    shuffle fewer bytes): the join-back verify attached the 512-byte
    vector arrays to every candidate pair row and pushed them through
    TWO shuffles (~25 GB at sf30's 23M pairs — an in-memory-to-spill
    step between sf10 and sf30, measured 15.3x for 3x data). Here each
    vector crosses the network ONCE PER TABLE inside the bucket rows
    (4 x |vectors| x ~530 B — corpus-linear with a constant factor),
    pairs explode with both vectors in hand, and only narrow
    (id_a, id_b, cosine) rows exist after the bucket stage.

    Values: bucket membership is the identical array_sort + 256-cap
    over the identical band keys (the struct sort keys on the unique id
    field), and the cosine is the identical zip_with-fold dot over the
    identical arrays with the identical prefolded-nsq norms — the same
    IEEE operations in the same order, so every (pair, cosine) is
    bit-identical to the join-back form. A pair can surface from up to
    PDLSH_TABLES buckets, always with the identical cosine — callers
    dedup and apply their own rounding/threshold."""
    nb = vecs.agg(_pdlsh_bits_col_imported().alias("bits"))
    banded = _lsh_banded(spark, vecs, id_col, vec_col, nb, carry=nsq_col)
    ds = F.slice(
        F.array_sort(F.collect_set(F.struct(id_col, vec_col, nsq_col))),
        1,
        256,
    )

    def _cos(x, y):
        dot = F.aggregate(
            F.zip_with(x[vec_col], y[vec_col], lambda a, b: a * b),
            F.lit(0.0),
            lambda s, v: s + v,
        )
        return dot / (F.sqrt(x[nsq_col]) * F.sqrt(y[nsq_col]))

    pair_expr = F.flatten(
        F.transform(
            F.col("ds"),
            lambda x, i: F.transform(
                F.slice(F.col("ds"), i + 2, F.size(F.col("ds"))),
                lambda y: F.struct(
                    x[id_col].alias("id_a"),
                    y[id_col].alias("id_b"),
                    _cos(x, y).alias("cosine"),
                ),
            ),
        )
    )
    return (
        banded.groupBy("t", "key")
        .agg(ds.alias("ds"))
        .filter(F.size("ds") > 1)
        .select(F.explode(pair_expr).alias("p"))
        .select("p.id_a", "p.id_b", "p.cosine")
    )


def _pdlsh_bits_col_imported():
    from elric_rs_spark.operators.dedup import _pdlsh_bits_col

    return _pdlsh_bits_col()


def lsh_candidate_pairs(spark: SparkSession, vecs: DataFrame,
                        id_col: str = "vec_id", vec_col: str = "v") -> DataFrame:
    """Candidate near-neighbor pairs (id_a, id_b) from multi-table LSH:
    bucket on each table's sign key, explode ordered in-bucket pairs,
    distinct across tables. ONE groupBy per stage, no self-join.

    Band width is CORPUS-ADAPTIVE (round-10, VERDICT r9 #4): the kernel
    shares the PDLSH integer-threshold rule from dedup.py — bits =
    smallest b in [4, 24] with (1 << b) * 16 >= n, derived IN-PLAN from
    a one-row count — so expected bucket load stays ~PDLSH_TARGET_BUCKET
    at any corpus size up to the 268M-vector per-table ceiling; the
    round-9 form's FIXED 16-bit keys went quadratic past ~1M vectors
    (the same pack-ceiling class the sf30 decade caught in the portable
    twin). Per-table keys are aggregated directly over each table's
    plane slice (key_t bit j = sign of plane t*bits+j), never packed
    into one 64-bit signature, so there is no 4*bits <= 63 ceiling. The
    hyperplane family stays the engine-internal float h64 seed (planes
    0..63 coincide with the legacy hyperplane_signatures planes); only
    the banding geometry is shared with the md5-sign portable twin.

    The 256-member deterministic cap (lowest ids kept — the
    PDLSH_BUCKET_CAP rule) bounds pathological buckets. Honesty note
    (ADVICE r9): under the old fixed 16-bit width the cap DID bind at
    sf30 (max observed bucket ~434 > 256, silently dropping candidates
    in this rows-only kernel); with adaptive width the expected max
    bucket is back near the ~16-member target and the cap is a
    worst-case guard again, not a working truncation."""
    from elric_rs_spark.operators.dedup import (
        PDLSH_MAX_PLANES,
        PDLSH_TABLES,
        _pdlsh_bits_col,
    )

    nb = vecs.agg(_pdlsh_bits_col().alias("bits"))
    # Band keys in ONE Arrow-vectorized pass (r11, guide §4.2): the old
    # form exploded every vector to 64 dim rows, broadcast-joined the
    # plane table (96 matches per dim row -> ~6k intermediate rows PER
    # VECTOR through codegen) and paid two keyed aggregates (dot
    # partial-sum, band assembly) — 3 exchanges and the dominant cost of
    # both LSH kernels at any scale. The kernel computes the same plane
    # dots as one float64 GEMM per batch against the identical
    # _hyperplanes(p, d) weights (same h64 seed function, imported
    # directly) and packs sign bits per table — zero exchanges, and the
    # Python boundary carries only (id, vector) in and (id, t, key) out.
    # The corpus-adaptive bits value stays IN-PLAN: the one-row nb
    # aggregate rides in on a broadcast and every batch reads it from
    # its first row. Empty/null vectors are filtered exactly as the
    # explode form dropped them (no dim rows -> no dots -> no bands).
    banded = _lsh_banded(spark, vecs, id_col, vec_col, nb, carry=None)
    ds = F.slice(F.array_sort(F.collect_set(id_col)), 1, 256)
    pair_expr = F.flatten(
        F.transform(
            F.col("ds"),
            lambda x, i: F.transform(
                F.slice(F.col("ds"), i + 2, F.size(F.col("ds"))),
                lambda y: F.struct(x.alias("id_a"), y.alias("id_b")),
            ),
        )
    )
    return (
        banded.groupBy("t", "key")
        .agg(ds.alias("ds"))
        .filter(F.size("ds") > 1)
        .select(F.explode(pair_expr).alias("p"))
        .select("p.id_a", "p.id_b")
        .distinct()
    )


@query("q_sim_lsh")  # rows-only: bucket recall is approximate by design
def q_sim_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Random-hyperplane LSH ANN (X16 scale path), round-2 redesign of the
    round-1 quadratic version (VERDICT r01 "What's wrong" #3):

    1. collapse EXACT-duplicate vectors to a representative first
       (xxhash64 of the array; the SimHash trick from dedup.py) — a
       templated corpus cannot explode any bucket with identical rows;
    2. 4 independent tables x 16-plane sign buckets via one 64-bit
       signature (hyperplane_signatures — broadcast matmul, codegen);
    3. candidates from ONE groupBy per (table, key) bucket — never an
       all-pairs self-join;
    4. exact cosine verification on candidates only, >= 0.35.
    Collapsed members rejoin as (rep, member, cosine 1.0) rows.

    Recall is tuned for near-DUPLICATES (the dedup regime): per table a
    pair collides with prob p^16 where p = 1 - theta/pi, so recall
    1-(1-p^16)^4 is ~0.8 at cosine 0.98, ~0.3 at 0.9, negligible by 0.5.
    Mid-similarity mining (cosine ~0.4) is deliberately out of scope for
    banding — that regime belongs to q_sim_ivf's probe search, which
    bounds work by cells probed instead of collision luck."""
    e = (
        load_table(spark, sf_dir, "embeddings")
        .select("vec_id", _as_double("embedding").alias("v"))
        .repartition(spark.sparkContext.defaultParallelism, "vec_id")
    )
    # clusters feeds FOUR branches (the banding kernel via reps, both
    # verify join sides, member_pairs). ReusedExchange shares only the
    # groupBy's SHUFFLE FILES — the collect_set aggregate itself re-ran
    # per branch (~0.6 s x 3 extra at sf0.1, measured r11; at scale,
    # three extra corpus-sized aggregates). One DISK_ONLY checkpoint
    # truncates the plan so every branch reads the materialized rows
    # (the q_dedup_semantic side0 pattern — corpus-proportional rows
    # never hold deserialized JVM heap).
    clusters = (
        e.groupBy(F.xxhash64("v").alias("vh"))
        .agg(
            F.min("vec_id").alias("rep"),
            F.array_sort(F.collect_set("vec_id")).alias("members"),
            F.first("v").alias("v"),
        )
        .localCheckpoint(eager=True, storageLevel=StorageLevel.DISK_ONLY)
    )
    member_pairs = clusters.select(
        F.col("rep").alias("vec_a"),
        F.explode("members").alias("vec_b"),
        F.lit(1.0).alias("cosine"),
    ).filter(F.col("vec_a") != F.col("vec_b"))

    # Current topology: the checkpointed clusters table feeds the
    # banding kernel (via reps) and member_pairs; the cosine verify
    # happens in-bucket inside lsh_candidate_cosines, so there are no
    # verify join-backs. Deliberately NOT .persist(): caching pins the
    # plan and disables AQE inside it (measured 6.7s vs 2.4s on a
    # vanilla 200-shuffle-partition session); the DISK_ONLY checkpoint
    # materializes rows without holding JVM heap.
    # Per-VECTOR squared norm folded once here instead of per candidate
    # pair in the verify (r11, guide §4.2): norm_l2 is an interpreted
    # HOF fold, and the verify evaluated it TWICE per pair — at any
    # scale candidates outnumber vectors, so 2/3 of the verify's
    # interpreted fold work was redundant. nsq rides the existing join
    # sides as one extra double (no new table, no broadcast — the r9 #3
    # corpus-broadcast lesson does not apply); sqrt(nsq) of the same
    # fold over the same array is bit-identical to the old norm_l2.
    nsq = F.aggregate("v", F.lit(0.0), lambda s, x: s + x * x)
    reps = clusters.select(F.col("rep").alias("vec_id"), "v", nsq.alias("nsq"))
    # In-bucket verify (r11 sf30 decade catch — see
    # lsh_candidate_cosines): the join-back verify attached the 64-dim
    # arrays to every pair row and pushed them through two shuffles
    # (~25 GB at sf30's 23M pairs — an in-memory-to-spill step measured
    # 15.3x for 3x data even WITH shuffle-hash hints); each vector now
    # crosses the network once per table inside the bucket rows, and
    # only narrow (id, id, cosine) rows exist after the bucket stage.
    # Same members (identical array_sort + 256 cap), same IEEE cosine
    # ops — proven row-identical at sf0.01/sf0.1.
    cc = lsh_candidate_cosines(spark, reps)
    cross_pairs = (
        cc.select(
            F.col("id_a").alias("vec_a"),
            F.col("id_b").alias("vec_b"),
            F.round("cosine", 6).alias("cosine"),
        )
        .filter(F.col("cosine") >= 0.35)
        .distinct()
    )
    return member_pairs.unionByName(cross_pairs).orderBy("vec_a", "vec_b")


IVF_CELLS = 16
IVF_NPROBE = 4


def _anchors(n: int = IVF_CELLS):
    """Deterministic pseudo-random anchor vectors — the IVF coarse
    quantizer's centroids — from the same splitmix scramble as the LSH
    hyperplanes; reproducible, no RNG state, no training pass. A real
    deployment would k-means these; anchor quality changes recall, not
    the plan shape."""

    def h64(p: int, d: int) -> float:
        x = (p * 0x9E3779B97F4A7C15 + d * 0xBF58476D1CE4E5B9 + 0x94D049BB133111EB) % (1 << 64)
        x ^= x >> 30
        x = (x * 0xBF58476D1CE4E5B9) % (1 << 64)
        x ^= x >> 27
        x = (x * 0x94D049BB133111EB) % (1 << 64)
        x ^= x >> 31
        return (x / float((1 << 64) - 1)) * 2.0 - 1.0

    return [[h64(p + 1000, d) for d in range(EMB_DIM)] for p in range(n)]


@query("q_sim_ivf_trained")  # rows-only: ANN recall is approximate by design
def q_sim_ivf_trained(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN with a TRAINED coarse quantizer (X16): k-means centroids
    from spark.ml replace q_sim_ivf's hash-derived anchors (which that
    query keeps as the zero-dependency baseline). Deterministic via fixed
    seed.

    Scale shape: the fit runs over a bounded deterministic sample (at
    100 TB you train the quantizer on ~1e5 sampled vectors, never the
    corpus; here the corpus IS sample-sized); cell assignment is one
    model.transform projection; the probe list is driver-side math over
    k=16 centroids (k floats, independent of corpus size) folded into an
    `isin` filter — with the corpus written partitionBy(cell), that
    filter is partition pruning at the scan."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "label", _as_double("embedding").alias("v")
    )
    feats = e.withColumn("features", array_to_vector("v"))
    # bounded fit: at 100 TB the quantizer trains on the first ~1e5
    # vectors (or a .sample(fraction) tuned to corpus size), never the
    # full corpus
    model = KMeans(k=IVF_CELLS, seed=7, maxIter=10).fit(feats.limit(100_000))
    cells = model.transform(feats).withColumnRenamed("prediction", "cell")

    # probe: the query's IVF_NPROBE nearest centroids — k-sized driver math
    qrow = e.filter(F.col("vec_id") == 0).select("v").head()
    if qrow is None:
        # no query vector in this corpus: empty result, not a crash —
        # schema derived from the SAME plan so it matches the non-empty
        # branch exactly (label's type comes from the table)
        return cells.filter(F.lit(False)).select(
            "vec_id", "label", F.col("cell").cast("long").alias("cell"),
            F.lit(0.0).alias("cosine"),
        )
    qv = qrow[0]
    dists = [
        (sum((a - b) ** 2 for a, b in zip(c, qv)), i)
        for i, c in enumerate(model.clusterCenters())
    ]
    probe_cells = [i for _, i in sorted(dists)[:IVF_NPROBE]]

    qcol = F.array(*[F.lit(float(x)) for x in qv])
    cosine = F.round(_dot(F.col("v"), qcol) / (_norm(F.col("v")) * _norm(qcol)), 6)
    return (
        cells.filter(F.col("cell").isin(probe_cells))
        .filter(F.col("vec_id") != 0)
        .select("vec_id", "label", F.col("cell").cast("long").alias("cell"),
                cosine.alias("cosine"))
        .orderBy(F.col("cosine").desc(), "vec_id")
        .limit(10)
    )


@query("q_sim_ivf")  # rows-only: ANN recall is approximate by design
def q_sim_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN (X16 scale path #2): every vector is assigned to its
    nearest-by-dot anchor cell (an inverted file); the query probes only
    its IVF_NPROBE best cells, so the exact cosine touches ~nprobe/cells
    of the corpus instead of all of it.

    Scale shape: cell assignment is one linear projection (no shuffle);
    probing is a broadcast left-semi join on cell id. At 100 TB, with the
    corpus written `partitionBy(cell)`, the same semi-join becomes
    partition pruning — the scan skips non-probed cells at the source."""
    anchors = _anchors()
    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "label", _as_double("embedding").alias("v")
    )
    dots = F.array(
        *[_dot(F.col("v"), F.array(*[F.lit(x) for x in a])) for a in anchors]
    )
    # materialize dots once; `cell` derives from the column, not from a
    # second copy of the 16x64 anchor literal tree
    scored = e.withColumn("dots", dots)
    cells = scored.select(
        "vec_id",
        "label",
        "v",
        "dots",
        F.array_position(F.col("dots"), F.array_max("dots")).alias("cell"),
    )

    # probe list: the query's IVF_NPROBE highest-dot cells (1-based ids)
    probe = (
        cells.filter(F.col("vec_id") == 0)
        .select(
            F.explode(
                F.slice(
                    F.array_sort(
                        F.transform(
                            "dots",
                            lambda d, i: F.struct(
                                (-d).alias("negd"), (i + 1).alias("cell")
                            ),
                        )
                    ),
                    1,
                    IVF_NPROBE,
                )
            ).alias("pc")
        )
        .select(F.col("pc.cell").cast("long").alias("cell"))
    )

    cand = cells.filter(F.col("vec_id") != 0).join(
        F.broadcast(probe), "cell", "left_semi"
    )
    qv = cells.filter(F.col("vec_id") == 0).select(F.col("v").alias("qv"))
    cosine = F.round(
        _dot(F.col("v"), F.col("qv")) / (_norm(F.col("v")) * _norm(F.col("qv"))), 6
    )
    return (
        cand.crossJoin(F.broadcast(qv))
        .select("vec_id", "label", "cell", cosine.alias("cosine"))
        .orderBy(F.col("cosine").desc(), "vec_id")
        .limit(10)
    )


@query(
    "q_embed_quantize",
    oracle="""
WITH d AS (
  SELECT vec_id,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
),
s AS (
  SELECT vec_id, v,
         list_max(list_transform(v, x -> abs(x))) AS maxabs
  FROM d
),
q AS (
  SELECT vec_id, maxabs,
         list_transform(v, x -> CAST(round(x * 127.0 / maxabs) AS BIGINT)) AS qv
  FROM s
  WHERE maxabs > 0
)
SELECT vec_id,
       round(maxabs, 6) AS maxabs,
       CAST(list_min(qv) AS BIGINT) AS q_min,
       CAST(list_max(qv) AS BIGINT) AS q_max,
       CAST(list_sum(qv) AS BIGINT) AS q_sum,
       CAST(list_sum(list_transform(qv, x -> abs(x))) AS BIGINT) AS q_l1
FROM q
ORDER BY vec_id
LIMIT 100
""",
)
def q_embed_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric int8 scalar quantization of embeddings (the standard
    4x ANN-index compression): per-vector scale = 127 / max|v|,
    q_i = round(v_i * scale) in [-127, 127].

    Embarrassingly parallel array math, no shuffle except the final
    top-100 TakeOrdered (which exists only to keep the oracle row set
    bounded). Float32 inputs are widened to DOUBLE on BOTH engines
    before any arithmetic — float32 ops differ across engines, doubles
    widened from the same float32 bits do not. The checked columns are
    integer summaries of the full quantized vector, so the oracle
    verifies every element's rounding without hashing a float array."""
    e = load_table(spark, sf_dir, "embeddings")
    v = _as_double(F.col("embedding"))
    maxabs = F.array_max(F.transform(v, lambda x: F.abs(x)))
    d = e.select("vec_id", v.alias("v"), maxabs.alias("maxabs")).filter(
        F.col("maxabs") > 0
    )
    qv = F.transform(
        F.col("v"), lambda x: F.round(x * 127.0 / F.col("maxabs")).cast("long")
    )
    d = d.select("vec_id", F.round("maxabs", 6).alias("maxabs"), qv.alias("qv"))
    zero = F.lit(0).cast("long")
    return (
        d.select(
            "vec_id",
            "maxabs",
            F.array_min("qv").alias("q_min"),
            F.array_max("qv").alias("q_max"),
            F.aggregate("qv", zero, lambda acc, x: acc + x).alias("q_sum"),
            F.aggregate("qv", zero, lambda acc, x: acc + F.abs(x)).alias("q_l1"),
        )
        .orderBy("vec_id")
        .limit(100)
    )


@query(
    "q_embed_centroid",
    oracle="""
WITH comp AS (
  SELECT label, i AS dim,
         CAST(round(CAST(embedding[i] AS DOUBLE) * 1000000) AS BIGINT) AS micro
  FROM embeddings, range(1, 65) t(i)
  WHERE i <= len(embedding)
)
SELECT label, CAST(dim AS BIGINT) AS dim,
       CAST(count(*) AS BIGINT) AS n,
       round(CAST(sum(micro) AS DOUBLE) / 1000000 / count(*), 6) AS centroid
FROM comp GROUP BY label, dim
""",
)
def q_embed_centroid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label embedding centroids (the k-means update step / class
    prototype computation), one row per (label, dimension).

    Cross-engine determinism: each float component is scaled to an exact
    integer (micro-units) BEFORE summing, so the sum is order-independent
    — summing raw doubles would make the centroid depend on partition
    order. The final division happens once, identically, on both engines.

    Scale shape: posexplode fans each vector into 64 component rows, then
    ONE map-side-combined groupBy on (label, dim) — 640 output groups
    regardless of corpus size; no joins, no windows. This is the same
    aggregate shape a distributed k-means iteration uses, so it stands in
    for the q_sim_ivf_trained assignment step at full scale.
    """
    e = load_table(spark, sf_dir, "embeddings")
    comp = e.select(
        "label", F.posexplode(F.col("embedding")).alias("pos", "val")
    ).select(
        "label",
        (F.col("pos") + 1).cast("long").alias("dim"),
        F.round(F.col("val").cast("double") * 1000000).cast("long").alias("micro"),
    )
    return comp.groupBy("label", "dim").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(
            F.sum("micro").cast("double") / 1000000 / F.count(F.lit(1)), 6
        ).alias("centroid"),
    )


@query(
    "q_kmeans_assign",
    oracle="""
WITH comp AS (
  SELECT vec_id, label, i AS dim,
         CAST(round(CAST(embedding[i] AS DOUBLE) * 1000000) AS BIGINT) AS micro
  FROM embeddings, range(1, 65) t(i)
  WHERE i <= len(embedding)
),
sums AS (
  SELECT label AS c_label, dim,
         CAST(sum(micro) AS BIGINT) AS s,
         CAST(count(*) AS BIGINT) AS n
  FROM comp GROUP BY label, dim
),
cent AS (
  SELECT c_label, dim, (s - ((s % n + n) % n)) // n AS icent FROM sums
),
scores AS (
  SELECT comp.vec_id, comp.label, cent.c_label,
         CAST(sum(comp.micro * cent.icent) AS BIGINT) AS score
  FROM comp JOIN cent ON comp.dim = cent.dim
  GROUP BY comp.vec_id, comp.label, cent.c_label
),
best AS (
  SELECT vec_id, label, c_label,
         row_number() OVER (PARTITION BY vec_id
                            ORDER BY score DESC, c_label) AS rn
  FROM scores
)
SELECT label AS true_label,
       c_label AS assigned_label,
       CAST(count(*) AS BIGINT) AS n_vecs
FROM best WHERE rn = 1
GROUP BY label, c_label
""",
)
def q_kmeans_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-means ASSIGNMENT step (q_embed_centroid is the UPDATE step):
    every embedding is assigned to its max-dot-product label centroid;
    output is the (true label × assigned label) confusion matrix — the
    one-Lloyd-iteration diagnostic of cluster coherence.

    Cross-engine exactness: components quantize to micro-int, centroids
    to floor-divided integer components via `(s - pmod(s, n)) div n` —
    subtracting the non-negative pmod makes the numerator exactly
    divisible, so the truncating integer `div` equals the floor with NO
    float round-trip (a `/`-then-cast form silently diverges from the
    exact quotient once |s| approaches 2^53; ADVICE r03). Bare `div` or
    DuckDB `//` alone are not portable for negative sums (truncate vs
    floor), hence the pmod pre-subtraction on both sides. Each dot
    product is an exact BIGINT sum
    (|micro| < 2^21, 64 dims × 10 centroids < 2^48 — ANSI-safe).
    Argmax breaks ties on the smaller label via one max(struct).

    Scale shape: the centroid table is O(labels × dims) — broadcast; the
    fan-out is rows × labels with NO shuffle until the per-vector argmax
    aggregate (map-side combinable: one struct-max per vec per
    partition), then a tiny confusion-matrix rollup. The same plan runs
    a billion vectors: no windows, no self-joins."""
    e = load_table(spark, sf_dir, "embeddings")
    comp = e.select(
        "vec_id",
        "label",
        F.posexplode(F.col("embedding")).alias("pos", "val"),
    ).select(
        "vec_id",
        "label",
        (F.col("pos") + 1).cast("long").alias("dim"),
        F.round(F.col("val").cast("double") * 1000000).cast("long").alias("micro"),
    )
    sums = comp.groupBy(F.col("label").alias("c_label"), "dim").agg(
        F.sum("micro").alias("s"), F.count(F.lit(1)).alias("n")
    )
    cent = sums.select(
        "c_label",
        "dim",
        F.expr("(s - pmod(s, n)) div n").alias("icent"),
    )
    scores = (
        comp.join(F.broadcast(cent), "dim")
        .groupBy("vec_id", "label", "c_label")
        .agg(F.sum(F.col("micro") * F.col("icent")).alias("score"))
    )
    best = scores.groupBy("vec_id", "label").agg(
        F.max(F.struct(F.col("score"), (-F.col("c_label")).alias("neg_label"))).alias(
            "top"
        )
    )
    return (
        best.select(
            F.col("label").alias("true_label"),
            (-F.col("top.neg_label")).cast("bigint").alias("assigned_label"),
        )
        .groupBy("true_label", "assigned_label")
        .agg(F.count(F.lit(1)).alias("n_vecs"))
    )


PQ_M = 8       # subvectors per embedding (64 dims -> 8 dims each)
PQ_K = 16      # codes per subspace
# engine-portable bucket hash (pure BIGINT arithmetic, same constants as
# operators/sampling.py): vec_id -> training bucket in [0, PQ_K)
_PQ_BUCKET = f"((vec_id % 1000003) * 2654435761 + 12345) % 4294967296 % {PQ_K}"


@query(
    "q_pq_encode",
    oracle=f"""
WITH comp AS (
  SELECT vec_id, label,
         ((i - 1) // 8) AS m, i AS dim,
         CAST({_PQ_BUCKET} AS BIGINT) AS bucket,
         CAST(round(CAST(embedding[i] AS DOUBLE) * 1000000) AS BIGINT) AS micro
  FROM embeddings, range(1, 65) t(i)
  WHERE i <= len(embedding)
),
book AS (
  SELECT m, bucket AS code, dim,
         (CAST(sum(micro) AS BIGINT)
          - ((CAST(sum(micro) AS BIGINT) % count(*) + count(*)) % count(*)))
         // count(*) AS icent
  FROM comp GROUP BY m, bucket, dim
),
dists AS (
  SELECT c.vec_id, c.m, b.code,
         CAST(sum((c.micro - b.icent) * (c.micro - b.icent)) AS BIGINT) AS sse
  FROM comp c JOIN book b ON c.m = b.m AND c.dim = b.dim
  GROUP BY c.vec_id, c.m, b.code
),
best AS (
  SELECT vec_id, m, code, sse,
         row_number() OVER (PARTITION BY vec_id, m
                            ORDER BY sse, code) AS rn
  FROM dists
)
SELECT m, code,
       CAST(count(*) AS BIGINT) AS n_vecs,
       CAST(sum(sse) AS BIGINT) AS total_sse
FROM best WHERE rn = 1
GROUP BY m, code
""",
)
def q_pq_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product quantization encode (the IVF-PQ memory-compression step:
    Jégou et al. 2011, public): each 64-dim embedding splits into M=8
    subvectors; each subvector is assigned its nearest of K=16 codebook
    centroids, so a vector compresses to M codes (8 bytes). Output is
    the per-(subspace, code) occupancy + total squared quantization
    error — the codebook-balance/distortion diagnostic run before
    committing a codebook.

    Determinism: codebooks come from hash-bucket training (the same
    portable multiplicative hash as deterministic sampling — NOT
    engine-specific xxhash), centroid components are floor-div integers,
    distances are exact BIGINT SSEs, argmin ties break on code. The
    oracle replays the identical integer pipeline.

    Scale shape: the codebook is M*K*8 = 1024 small rows — broadcast;
    encode is explode + broadcast join + two keyed aggregates (the
    argmin is a max(struct) — map-side combinable). No pairwise
    vector-vector work anywhere; a billion vectors encode in one pass."""
    e = load_table(spark, sf_dir, "embeddings")
    comp = e.select(
        "vec_id",
        F.posexplode(F.col("embedding")).alias("pos", "val"),
    ).select(
        "vec_id",
        F.expr("pos div 8").alias("m"),
        (F.col("pos") + 1).cast("long").alias("dim"),
        F.expr(_PQ_BUCKET).cast("long").alias("bucket"),
        F.round(F.col("val").cast("double") * 1000000).cast("long").alias("micro"),
    )
    book = (
        comp.groupBy("m", F.col("bucket").alias("code"), "dim")
        .agg(F.sum("micro").alias("s"), F.count(F.lit(1)).alias("n"))
        .select(
            "m",
            "code",
            "dim",
            F.expr("(s - pmod(s, n)) div n").alias("icent"),
        )
    )
    diff = F.col("micro") - F.col("icent")
    dists = (
        comp.join(F.broadcast(book), ["m", "dim"])
        .groupBy("vec_id", "m", "code")
        .agg(F.sum(diff * diff).alias("sse"))
    )
    best = dists.groupBy("vec_id", "m").agg(
        F.min(F.struct(F.col("sse"), F.col("code"))).alias("top")
    )
    return (
        best.select(
            "m",
            F.col("top.code").alias("code"),
            F.col("top.sse").alias("sse"),
        )
        .groupBy("m", "code")
        .agg(
            F.count(F.lit(1)).alias("n_vecs"),
            F.sum("sse").alias("total_sse"),
        )
    )


# --- md5-portable twins for the LSH / IVF family (VERDICT r03 #6) -------
#
# q_sim_lsh and q_sim_ivf are rows-only: their hyperplanes/anchors derive
# from xxhash64/splitmix64 scrambles DuckDB cannot replay. These twins
# re-derive every random quantity from md5-over-strings (identical in both
# engines) and keep every dot product in exact BIGINT micro-units, so the
# FULL pipeline — signatures, buckets, candidates, probe selection, cosine
# values — replays bit-for-bit in SQL. Same algorithm, same banding /
# probe math, same candidate semantics as the production kernels; md5 is
# ~3x the hash cost, which is why the xxhash64 forms stay the at-scale
# path (the exact trade q_dedup_minhash_portable documents).

PLSH_PLANES = 16   # 2 tables x 8-bit sign chunks
PLSH_TABLES = 2
PLSH_BITS = 8
PLSH_THRESHOLD = 0.35  # same verify threshold as q_sim_lsh

# Corpus-adaptive band width for q_sim_lsh_portable (round-10: the sf10
# coverage run measured the fixed 2x8-bit layout at 21.4 s (sf1) -> DNF
# > 900 s (sf10) — 256 buckets/table means ~2,300-member buckets at
# 600k vectors and a quadratic in-bucket pair explosion; the same
# fixed-parameter-LSH class as dedup.py's round-5 finding). Same
# integer-threshold rule as the PDLSH twin (see the PDLSH constants
# comment in dedup.py for why threshold counting instead of
# ceil(log2())), with MIN_BITS = 8 so every corpus up to 4,096 vectors
# — including both driver grading scales — keeps the original 2x8-bit
# keys and BIT-IDENTICAL output.
PLSH_MIN_BITS = 8
PLSH_MAX_BITS = 24
PLSH_TARGET_BUCKET = 16
PLSH_MAX_PLANES = PLSH_TABLES * PLSH_MAX_BITS
PLSH_BUCKET_CAP = 256
PLSH_BIT_THRESHOLDS = [
    (1 << (b - 1)) * PLSH_TARGET_BUCKET
    for b in range(PLSH_MIN_BITS + 1, PLSH_MAX_BITS + 1)
]
_PLSH_BITS_SQL = f"CAST({PLSH_MIN_BITS} + " + " + ".join(
    f"(CASE WHEN count(*) > {t} THEN 1 ELSE 0 END)"
    for t in PLSH_BIT_THRESHOLDS
) + " AS BIGINT)"


def _plsh_bits_col():
    """Spark aggregate-expression form of _PLSH_BITS_SQL (same
    thresholds, same integer arithmetic)."""
    cnt = F.count(F.lit(1))
    bits = F.lit(PLSH_MIN_BITS)
    for t in PLSH_BIT_THRESHOLDS:
        bits = bits + F.when(cnt > t, F.lit(1)).otherwise(F.lit(0))
    return bits.cast("long")


def _hex13_sql(expr: str) -> str:
    """DuckDB: first 13 hex chars of md5-expression `expr` as a BIGINT
    (< 2^52) — all INTEGER-LITERAL weights so the arithmetic never
    leaves BIGINT (the q_agg_approx_portable construction)."""
    return " + ".join(
        f"(strpos('0123456789abcdef', substring({expr}, {i}, 1)) - 1)"
        f" * {16 ** (13 - i)}"
        for i in range(1, 14)
    )


def _micro_comp(e: DataFrame) -> DataFrame:
    """(vec_id, d, micro): 1-based dimension index, component scaled to
    exact integer micro-units — BIGINT from here on, so every downstream
    sum is order-independent and engine-exact.

    The input is repartitioned on vec_id BEFORE the explode: parallelism
    of every downstream expansion (the 64x dim fan-out, then plane/anchor
    fan-outs of 16-900x) must never key off the WRITER's file/row-group
    layout. The round-9 sf30 decade caught exactly that: embeddings
    parquet written as ONE row group put the whole 2.15B-row 56-plane
    expansion of q_dedup_embed_lsh_portable into a single task (53+ min
    on one core before the kill; 21 of 22 scan splits were empty). The
    exchange moved is just the raw (vec_id, embedding) rows — orders of
    magnitude smaller than what it parallelizes — and branching plans
    share it via ReusedExchange. Partition count = the session's
    data-proportional spark.sql.shuffle.partitions (session.py rule)."""
    n_parts = int(e.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    return e.repartition(n_parts, "vec_id").select(
        "vec_id", F.posexplode(F.col("embedding")).alias("pos", "val")
    ).select(
        "vec_id",
        (F.col("pos") + 1).cast("long").alias("d"),
        F.round(F.col("val").cast("double") * 1000000).cast("long").alias("micro"),
    )


def _plsh_bands(
    spark: SparkSession,
    comp: DataFrame,
    tables: int = PLSH_TABLES,
    bits: int = PLSH_BITS,
) -> DataFrame:
    """(vec_id, t, key) band rows of the md5-portable sign-hyperplane
    signature — the shared blocking stage of q_sim_lsh_portable and
    q_sim_recall. Hyperplane component (p, d) is a ±1 sign from one md5
    hex digit; dots run over exact BIGINT micro-components, so band
    membership is bit-identical across engines. The SAME 16-plane
    signature can be re-banded: (tables, bits) chooses the
    precision/recall point — q_sim_lsh_portable uses 2x8-bit (high
    precision), q_sim_recall measures the 4x4-bit layout."""
    dims = spark.range(1, EMB_DIM + 1).select(F.col("id").alias("d"))
    planes = spark.range(PLSH_PLANES).select(F.col("id").cast("int").alias("p"))
    sign_src = F.md5(
        F.concat(F.col("p").cast("string"), F.lit("#"), F.col("d").cast("string"))
    )
    w = planes.crossJoin(dims).select(
        "p",
        "d",
        F.when(
            F.substring(sign_src, 1, 1).isin(*"01234567"), F.lit(1)
        ).otherwise(F.lit(-1)).cast("long").alias("w"),
    )
    dots = (
        comp.join(F.broadcast(w), "d")
        .groupBy("vec_id", "p")
        .agg(F.sum(F.col("micro") * F.col("w")).alias("dot"))
    )
    sig = dots.groupBy("vec_id").agg(
        F.sum(
            F.when(
                F.col("dot") >= 0, F.expr("shiftleft(CAST(1 AS BIGINT), p)")
            ).otherwise(F.lit(0).cast("long"))
        ).alias("sig")
    )
    mask = (1 << bits) - 1
    chunks = [
        F.struct(
            F.lit(t).alias("t"),
            F.shiftrightunsigned("sig", bits * t)
            .bitwiseAND(F.lit(mask))
            .alias("key"),
        )
        for t in range(tables)
    ]
    return sig.select(
        "vec_id", F.explode(F.array(*chunks)).alias("b")
    ).select("vec_id", "b.t", "b.key")


@query(
    "q_sim_lsh_portable",
    oracle=f"""
WITH wf AS (
  SELECT vec_id, embedding FROM embeddings WHERE len(embedding) = 64
),
comp AS (
  SELECT vec_id, i AS d,
         CAST(round(CAST(embedding[i] AS DOUBLE) * 1000000) AS BIGINT) AS micro
  FROM wf, range(1, 65) t(i)
),
nb AS (
  SELECT {_PLSH_BITS_SQL} AS bits
  FROM wf
),
w AS (
  SELECT p, i AS d,
         CASE WHEN strpos('01234567', substring(md5(p || '#' || i), 1, 1)) > 0
              THEN 1 ELSE -1 END AS w
  FROM range(0, {PLSH_MAX_PLANES}) pp(p), range(1, 65) t(i), nb
  WHERE p < {PLSH_TABLES} * nb.bits
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
  WHERE b1.rn <= {PLSH_BUCKET_CAP} AND b2.rn <= {PLSH_BUCKET_CAP}
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
SELECT vec_a, vec_b,
       round(CAST(sab AS DOUBLE)
             / (sqrt(CAST(saa AS DOUBLE)) * sqrt(CAST(sbb AS DOUBLE))), 6)
         AS cosine
FROM prods
WHERE round(CAST(sab AS DOUBLE)
            / (sqrt(CAST(saa AS DOUBLE)) * sqrt(CAST(sbb AS DOUBLE))), 6)
      >= {PLSH_THRESHOLD}
""",
)
def q_sim_lsh_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sign-hyperplane LSH with a FULL value oracle — the value-checkable
    twin of q_sim_lsh. Hyperplane component (p, d) is a ±1 sign drawn
    from one md5 hex digit; the signed dot runs over exact BIGINT
    micro-components, so bucket membership is bit-identical across
    engines; candidate verification is exact-integer cosine. ±1-component
    hyperplanes are themselves a standard random-projection family, so
    this is a real LSH, not a mock.

    ROUND-10 rewrite (the deferred sf10 coverage run measured the fixed
    2x8-bit form at 21.4 s sf1 -> DNF > 900 s sf10): band width is now
    CORPUS-ADAPTIVE with per-table key aggregation — the identical
    geometry as q_dedup_embed_lsh_portable (see the PDLSH constants
    comment in dedup.py), with MIN_BITS = 8 so both grading scales keep
    the original keys and bit-identical output — plus the 256-member
    deterministic bucket cap (lowest vec_ids, replayed by the oracle)
    and the ARRAY-FORM verify from the round-9 sf30 work: one packed
    BIGINT micro-array per vector joins each candidate pair once via
    SHUFFLE_HASH (build side = |vectors|/partitions at any scale; the
    old component-row form pushed |cand| x 64 rows through two
    sort-merge joins), with sab/saa/sbb folded inline from the arrays
    the pair rows already carry (never a corpus-sized norm broadcast —
    VERDICT r9 #3).

    FIXED-LENGTH PRECONDITION (ADVICE r10): ragged / null embeddings are
    filtered ONCE at the source, so candidate generation and the verify
    join see the same vector set — the previous form filtered only the
    verify side, silently dropping candidate pairs a ragged vector had
    seeded. The oracle applies the identical predicate (wf CTE), so both
    engines agree even on malformed corpora (a no-op on well-formed
    ones)."""
    e = (
        load_table(spark, sf_dir, "embeddings")
        .select("vec_id", "embedding")
        .filter(F.size("embedding") == EMB_DIM)
    )
    comp = _micro_comp(e)
    nb = e.agg(_plsh_bits_col().alias("bits"))
    dims = spark.range(1, EMB_DIM + 1).select(F.col("id").alias("d"))
    planes = spark.range(PLSH_MAX_PLANES).select(F.col("id").cast("int").alias("p"))
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
        .filter(F.col("p") < F.lit(PLSH_TABLES) * F.col("bits"))
        .select("p", "d", "w")
    )
    dots = (
        comp.join(F.broadcast(w), "d")
        .groupBy("vec_id", "p")
        .agg(F.sum(F.col("micro") * F.col("w")).alias("dot"))
    )
    bands = (
        dots.crossJoin(F.broadcast(nb))
        .groupBy("vec_id", F.expr("p div bits").cast("long").alias("t"))
        .agg(
            F.sum(
                F.when(
                    F.col("dot") >= 0,
                    F.expr("shiftleft(CAST(1 AS BIGINT), CAST(p % bits AS INT))"),
                ).otherwise(F.lit(0).cast("long"))
            ).alias("key")
        )
    )
    from pyspark.sql import Window as _W

    banded = (
        bands.withColumn(
            "rn",
            F.row_number().over(_W.partitionBy("t", "key").orderBy("vec_id")),
        )
        .filter(F.col("rn") <= PLSH_BUCKET_CAP)
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
    # array-form verify (e is already length-filtered at the source, so
    # zip_with never null-pads and Spark/oracle see the same vector set)
    marr = e.select(
        "vec_id",
        F.transform(
            "embedding",
            lambda x: F.round(x.cast("double") * 1000000).cast("long"),
        ).alias("m"),
    )

    def _fold(col, fn):
        return F.aggregate(col, F.lit(0).cast("long"), fn)

    sab = _fold(F.zip_with("ma", "mb", lambda x, y: x * y), lambda acc, x: acc + x)
    saa = _fold(F.col("ma"), lambda acc, x: acc + x * x)
    sbb = _fold(F.col("mb"), lambda acc, x: acc + x * x)
    prods = (
        cand.join(
            marr.select(F.col("vec_id").alias("vec_a"), F.col("m").alias("ma"))
            .hint("shuffle_hash"),
            "vec_a",
        )
        .join(
            marr.select(F.col("vec_id").alias("vec_b"), F.col("m").alias("mb"))
            .hint("shuffle_hash"),
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
        .filter(F.col("cosine") >= PLSH_THRESHOLD)
        .select("vec_a", "vec_b", "cosine")
    )


PIVF_CELLS = 16
PIVF_NPROBE = 4
PIVF_MOD = 2_000_001  # anchor components uniform in [-1e6, 1e6]


def _pivf_anchors(spark: SparkSession) -> DataFrame:
    """(c, d, a): md5-derived coarse-anchor components, uniform integers
    in [-1e6, 1e6] — O(cells x dims) rows, always broadcast."""
    cs = spark.range(PIVF_CELLS).select(F.col("id").cast("int").alias("c"))
    dims = spark.range(1, EMB_DIM + 1).select(F.col("id").alias("d"))
    hx = F.md5(
        F.concat(
            F.lit("a"), F.col("c").cast("string"), F.lit("#"), F.col("d").cast("string")
        )
    )
    return cs.crossJoin(dims).select(
        "c",
        "d",
        (
            F.conv(F.substring(hx, 1, 13), 16, 10).cast("long") % PIVF_MOD - 1000000
        ).alias("a"),
    )


# The coarse assignment (vec x cell exact dots) is shared by three graded
# consumers (q_sim_ivf_portable, q_sim_ivf_curve, q_sim_ivfpq) and each
# used to recompute it from the raw embeddings — the same re-execution the
# graph quartet (VERDICT r04 #3) and the portable MinHash pair build
# (VERDICT r05 #4) had. Same cure: build once per (session, sf_dir),
# localCheckpoint the (n_vecs x cells)-row result, memoize. The
# production analogue is a stored assignment table written next to the
# IVF index. _PIVF_CELLDOTS_BUILDS is the test-visible build counter
# (tests/test_plans.py proves one build serves all three consumers).
_PIVF_CELLDOTS_CACHE: dict[tuple[str, str], DataFrame] = {}
_PIVF_CELLDOTS_BUILDS = 0


def pivf_celldots_for(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Memoized (vec_id, c, dot) coarse-assignment table over the full
    embeddings corpus, built once per (session, sf_dir)."""
    global _PIVF_CELLDOTS_BUILDS
    key = (spark.sparkContext.applicationId, sf_dir)
    cached = _PIVF_CELLDOTS_CACHE.get(key)
    if cached is not None:
        return cached
    from elric_rs_spark import buildlog

    with buildlog.timed("pivf_celldots"):
        e = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
        out = _pivf_celldots(spark, _micro_comp(e)).localCheckpoint()
    _PIVF_CELLDOTS_CACHE[key] = out
    _PIVF_CELLDOTS_BUILDS += 1
    return out


def _pivf_celldots(spark: SparkSession, comp: DataFrame) -> DataFrame:
    """(vec_id, c, dot): exact BIGINT dot of every vector against every
    md5-derived coarse anchor — the shared assignment stage of
    q_sim_ivf_portable and q_sim_ivf_curve. Anchors broadcast
    (O(cells x dims)); the aggregate is map-side combined."""
    anchors = _pivf_anchors(spark)
    return (
        comp.join(F.broadcast(anchors), "d")
        .groupBy("vec_id", "c")
        .agg(F.sum(F.col("micro") * F.col("a")).alias("dot"))
    )


@query(
    "q_sim_ivf_portable",
    oracle=f"""
WITH comp AS (
  SELECT vec_id, i AS d,
         CAST(round(CAST(embedding[i] AS DOUBLE) * 1000000) AS BIGINT) AS micro
  FROM embeddings, range(1, 65) t(i)
  WHERE i <= len(embedding)
),
h AS (
  SELECT c, i AS d, md5('a' || c || '#' || i) AS hx
  FROM range(0, {PIVF_CELLS}) cc(c), range(1, 65) t(i)
),
anchors AS (
  SELECT c, d, ({_hex13_sql('hx')}) % {PIVF_MOD} - 1000000 AS a FROM h
),
celldots AS (
  SELECT comp.vec_id, a.c, SUM(comp.micro * a.a) AS dot
  FROM comp JOIN anchors a ON a.d = comp.d
  GROUP BY comp.vec_id, a.c
),
ranked AS (
  SELECT vec_id, c, dot,
         row_number() OVER (PARTITION BY vec_id ORDER BY dot DESC, c) AS rn
  FROM celldots
),
vcell AS (SELECT vec_id, CAST(c AS BIGINT) AS cell FROM ranked WHERE rn = 1),
probe AS (SELECT CAST(c AS BIGINT) AS cell FROM ranked
          WHERE vec_id = 0 AND rn <= {PIVF_NPROBE}),
qc AS (SELECT d, micro FROM comp WHERE vec_id = 0),
prods AS (
  SELECT comp.vec_id,
         SUM(comp.micro * qc.micro) AS svq,
         SUM(comp.micro * comp.micro) AS svv,
         SUM(qc.micro * qc.micro) AS sqq
  FROM comp JOIN qc ON qc.d = comp.d
  WHERE comp.vec_id != 0
  GROUP BY comp.vec_id
)
SELECT p.vec_id, e.label, v.cell,
       round(CAST(svq AS DOUBLE)
             / (sqrt(CAST(svv AS DOUBLE)) * sqrt(CAST(sqq AS DOUBLE))), 6)
         AS cosine
FROM prods p
JOIN vcell v ON v.vec_id = p.vec_id
JOIN probe ON probe.cell = v.cell
JOIN embeddings e ON e.vec_id = p.vec_id
ORDER BY cosine DESC, p.vec_id
LIMIT 10
""",
)
def q_sim_ivf_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN with a FULL value oracle — the value-checkable twin of
    q_sim_ivf. Anchor component (c, d) is an md5-derived integer uniform
    in [-1e6, 1e6]; cell assignment is an exact-BIGINT argmax (tie to
    the smaller cell id); the probe list is the query's PIVF_NPROBE best
    cells by the same exact dot, and the verified cosine runs on integer
    micro-components — every stage replays bit-for-bit in DuckDB.

    Scale shape mirrors q_sim_ivf: anchors are an O(cells x dims)
    broadcast; assignment is one map-side-combinable (vec, cell)
    aggregate; probing is a broadcast semi-join (partition pruning when
    the corpus is written partitionBy(cell)); exact cosine touches
    probed cells only; the final top-10 is a TakeOrdered, not a global
    sort."""
    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "label", "embedding"
    )
    comp = _micro_comp(e)
    celldots = pivf_celldots_for(spark, sf_dir)
    best = celldots.groupBy("vec_id").agg(
        F.max(F.struct(F.col("dot"), (-F.col("c")).alias("nc"))).alias("top")
    )
    vcell = best.select("vec_id", (-F.col("top.nc")).cast("long").alias("cell"))
    probe = (
        celldots.filter(F.col("vec_id") == 0)
        .orderBy(F.col("dot").desc(), "c")
        .limit(PIVF_NPROBE)
        .select(F.col("c").cast("long").alias("cell"))
    )
    qc = comp.filter(F.col("vec_id") == 0).select("d", F.col("micro").alias("qmicro"))
    prods = (
        comp.filter(F.col("vec_id") != 0)
        .join(F.broadcast(qc), "d")
        .groupBy("vec_id")
        .agg(
            F.sum(F.col("micro") * F.col("qmicro")).alias("svq"),
            F.sum(F.col("micro") * F.col("micro")).alias("svv"),
            F.sum(F.col("qmicro") * F.col("qmicro")).alias("sqq"),
        )
    )
    cosine = F.round(
        F.col("svq").cast("double")
        / (F.sqrt(F.col("svv").cast("double")) * F.sqrt(F.col("sqq").cast("double"))),
        6,
    )
    return (
        prods.join(vcell, "vec_id")
        .join(F.broadcast(probe), "cell", "left_semi")
        .join(e.select("vec_id", "label"), "vec_id")
        .select("vec_id", "label", "cell", cosine.alias("cosine"))
        .orderBy(F.col("cosine").desc(), "vec_id")
        .limit(10)
    )


OUTLIER_MAD_K = 2  # flag |normsq - median| > K * MAD


@query(
    "q_embed_outlier",
    oracle=f"""
WITH comp AS (
  SELECT vec_id, i AS d,
         CAST(round(CAST(embedding[i] AS DOUBLE) * 1000000) AS BIGINT) AS micro
  FROM embeddings, range(1, 65) t(i)
  WHERE i <= len(embedding)
),
norms AS (SELECT vec_id, CAST(SUM(micro * micro) AS BIGINT) AS normsq
          FROM comp GROUP BY vec_id),
m AS (SELECT percentile_cont(0.5) WITHIN GROUP (ORDER BY normsq) AS med FROM norms),
d AS (SELECT vec_id, normsq, abs(normsq - med) AS dev FROM norms, m),
mm AS (SELECT percentile_cont(0.5) WITHIN GROUP (ORDER BY dev) AS mad FROM d)
SELECT vec_id, normsq, round(dev / mad, 6) AS mad_ratio
FROM d, mm
WHERE mad > 0 AND dev > {OUTLIER_MAD_K} * mad
""",
)
def q_embed_outlier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-norm outlier filter (the "broken encoder output" gate a
    training pipeline runs before indexing): robust median/MAD flagging
    on the exact-integer squared norm. Mean/stddev are NOT used — the
    squared-norm second moment overflows BIGINT (normsq^2 ~ 2^88) and a
    float variance would be partition-order-dependent; the median of
    exact BIGINTs interpolates identically in both engines.

    Scale shape: norms are one map-side-combined aggregate; the two
    medians here are EXACT single-group percentiles (fine at gate
    scale, and what the oracle can replay) — the 100 TB kernel swaps
    them for approx_percentile, which changes two scalars, not the
    plan. Flagging is a broadcast of two one-row tables."""
    e = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    comp = _micro_comp(e)
    norms = comp.groupBy("vec_id").agg(
        F.sum(F.col("micro") * F.col("micro")).alias("normsq")
    )
    med = norms.agg(F.percentile("normsq", F.lit(0.5)).alias("med"))
    d = norms.crossJoin(F.broadcast(med)).withColumn(
        "dev", F.abs(F.col("normsq") - F.col("med"))
    )
    mad = d.agg(F.percentile("dev", F.lit(0.5)).alias("mad"))
    return (
        d.crossJoin(F.broadcast(mad))
        .filter((F.col("mad") > 0) & (F.col("dev") > OUTLIER_MAD_K * F.col("mad")))
        .select(
            "vec_id",
            "normsq",
            F.round(F.col("dev") / F.col("mad"), 6).alias("mad_ratio"),
        )
    )


RECALL_QUERIES = 10  # vec_id < 10 are the evaluation query set
RECALL_K = 10
# Re-band the 16-plane signature into 4 tables x 4-bit keys for the
# measurement: the 2x8-bit production layout admits almost no
# candidates on near-orthogonal synthetic vectors, which would make
# recall degenerate-zero instead of a meaningful operating point.
RECALL_TABLES = 4
RECALL_BITS = 4


def _recall_ground_truth(comp: DataFrame):
    """(scored, exact): exact integer-cosine scores of every corpus
    vector against the fixed RECALL_QUERIES probe set, and the exact
    top-RECALL_K per query — the shared ground-truth stage of
    q_sim_recall and q_sim_ivf_curve. Broadcast of the constant-Q query
    side; cosine rounded once to 6dp, ranks tie-broken on vec_id."""
    norms = comp.groupBy("vec_id").agg(
        F.sum(F.col("micro") * F.col("micro")).alias("nn")
    )
    qcomp = comp.filter(F.col("vec_id") < RECALL_QUERIES).select(
        F.col("vec_id").alias("q_id"), "d", F.col("micro").alias("qmicro")
    )
    scores = (
        comp.join(F.broadcast(qcomp), "d")
        .filter(F.col("vec_id") != F.col("q_id"))
        .groupBy("q_id", "vec_id")
        .agg(F.sum(F.col("qmicro") * F.col("micro")).alias("sab"))
    )
    qnorms = norms.filter(F.col("vec_id") < RECALL_QUERIES).select(
        F.col("vec_id").alias("q_id"), F.col("nn").alias("qnn")
    )
    scored = (
        scores.join(F.broadcast(qnorms), "q_id")
        .join(norms, "vec_id")
        .select(
            "q_id",
            "vec_id",
            F.round(
                F.col("sab").cast("double")
                / (
                    F.sqrt(F.col("qnn").cast("double"))
                    * F.sqrt(F.col("nn").cast("double"))
                ),
                6,
            ).alias("cosine"),
        )
    )
    # materialize the scored table once: exact ranking, candidate
    # scoring, and the per-level rankings all consume it, and without a
    # checkpoint each consumer re-plans the whole broadcast-matmul
    # subtree (measured: 22-26 shuffles across q_sim_recall /
    # q_sim_ivf_curve vs 17-20 after this plus the band/rank checkpoints) — the same lineage-truncation
    # discipline as q_pagerank; an evaluation harness would persist its
    # ground truth as a table anyway
    scored = scored.localCheckpoint()
    wnd = Window.partitionBy("q_id").orderBy(F.col("cosine").desc(), "vec_id")
    exact = (
        scored.withColumn("rn", F.row_number().over(wnd))
        .filter(F.col("rn") <= RECALL_K)
        .select("q_id", "vec_id")
    )
    return scored, exact


@query(
    "q_sim_recall",
    oracle=f"""
WITH comp AS (
  SELECT vec_id, i AS d,
         CAST(round(CAST(embedding[i] AS DOUBLE) * 1000000) AS BIGINT) AS micro
  FROM embeddings, range(1, 65) t(i)
  WHERE i <= len(embedding)
),
w AS (
  SELECT p, i AS d,
         CASE WHEN strpos('01234567', substring(md5(p || '#' || i), 1, 1)) > 0
              THEN 1 ELSE -1 END AS w
  FROM range(0, {PLSH_PLANES}) pp(p), range(1, 65) t(i)
),
dots AS (
  SELECT c.vec_id, w.p, SUM(c.micro * w.w) AS dot
  FROM comp c JOIN w ON w.d = c.d
  GROUP BY c.vec_id, w.p
),
sig AS (
  SELECT vec_id,
         SUM(CASE WHEN dot >= 0 THEN (CAST(1 AS BIGINT) << p) ELSE 0 END) AS sig
  FROM dots GROUP BY vec_id
),
bands AS (
  SELECT vec_id, t, (sig >> ({RECALL_BITS} * t)) & {(1 << RECALL_BITS) - 1} AS key
  FROM sig, range(0, {RECALL_TABLES}) tt(t)
),
norms AS (SELECT vec_id, SUM(micro * micro) AS nn FROM comp GROUP BY vec_id),
scores AS (
  SELECT qc.vec_id AS q_id, c.vec_id AS vec_id, SUM(qc.micro * c.micro) AS sab
  FROM comp qc JOIN comp c ON c.d = qc.d AND c.vec_id <> qc.vec_id
  WHERE qc.vec_id < {RECALL_QUERIES}
  GROUP BY 1, 2
),
scored AS (
  SELECT s.q_id, s.vec_id,
         round(CAST(s.sab AS DOUBLE)
               / (sqrt(CAST(nq.nn AS DOUBLE)) * sqrt(CAST(nv.nn AS DOUBLE))), 6)
           AS cosine
  FROM scores s
  JOIN norms nq ON nq.vec_id = s.q_id
  JOIN norms nv ON nv.vec_id = s.vec_id
),
exact AS (
  SELECT q_id, vec_id FROM (
    SELECT q_id, vec_id,
           row_number() OVER (PARTITION BY q_id ORDER BY cosine DESC, vec_id) AS rn
    FROM scored) WHERE rn <= {RECALL_K}
),
qcand AS (
  SELECT DISTINCT bq.vec_id AS q_id, bv.vec_id AS vec_id
  FROM bands bq
  JOIN bands bv ON bv.t = bq.t AND bv.key = bq.key AND bv.vec_id <> bq.vec_id
  WHERE bq.vec_id < {RECALL_QUERIES}
),
approx AS (
  SELECT q_id, vec_id FROM (
    SELECT sc.q_id, sc.vec_id,
           row_number() OVER (PARTITION BY sc.q_id
                              ORDER BY sc.cosine DESC, sc.vec_id) AS rn
    FROM scored sc JOIN qcand qc ON qc.q_id = sc.q_id AND qc.vec_id = sc.vec_id
  ) WHERE rn <= {RECALL_K}
),
ncand AS (SELECT q_id, count(*) AS n_cand FROM qcand GROUP BY q_id),
hits AS (
  SELECT e.q_id, count(*) AS n_hits
  FROM exact e JOIN approx a ON a.q_id = e.q_id AND a.vec_id = e.vec_id
  GROUP BY e.q_id
)
SELECT q.q_id,
       CAST(coalesce(nc.n_cand, 0) AS BIGINT) AS n_cand,
       CAST(coalesce(h.n_hits, 0) AS BIGINT) AS n_hits,
       round(coalesce(h.n_hits, 0) / {RECALL_K}.0, 6) AS recall_at_{RECALL_K}
FROM (SELECT DISTINCT vec_id AS q_id FROM comp WHERE vec_id < {RECALL_QUERIES}) q
LEFT JOIN ncand nc ON nc.q_id = q.q_id
LEFT JOIN hits h ON h.q_id = q.q_id
""",
)
def q_sim_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN quality evaluation: recall@{K} of the portable sign-hyperplane
    LSH against exact brute-force cosine, for a fixed 10-query probe set
    — the measurement every ANN deployment runs before trusting its
    index (Faiss-style recall evaluation, expressed relationally).

    Both sides are deterministic: exact integer micro-dot products,
    cosine rounded once to 6dp, ranks tie-broken on vec_id — so the
    oracle replays ground truth, candidates, and the recall numbers
    bit-for-bit. Scale shape: ground truth is O(Q·N) with a FIXED
    sampled query set (the standard evaluation harness — Q is a
    constant, not a corpus fraction), candidates come from the band
    join (bucket-bounded, never a corpus self-join), and every stage is
    map-side-combinable aggregates + broadcast of the Q-sized side."""
    e = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    comp = _micro_comp(e)
    banded = _plsh_bands(spark, comp, RECALL_TABLES, RECALL_BITS).localCheckpoint()
    scored, exact = _recall_ground_truth(comp)
    wnd = Window.partitionBy("q_id").orderBy(F.col("cosine").desc(), "vec_id")
    qbands = banded.filter(F.col("vec_id") < RECALL_QUERIES).select(
        F.col("vec_id").alias("q_id"), "t", "key"
    )
    qcand = (
        banded.join(F.broadcast(qbands), ["t", "key"])
        .filter(F.col("vec_id") != F.col("q_id"))
        .select("q_id", "vec_id")
        .distinct()
    )
    approx = (
        scored.join(qcand, ["q_id", "vec_id"])
        .withColumn("rn", F.row_number().over(wnd))
        .filter(F.col("rn") <= RECALL_K)
        .select("q_id", "vec_id")
    )
    ncand = qcand.groupBy("q_id").agg(F.count(F.lit(1)).alias("n_cand"))
    hits = exact.join(approx, ["q_id", "vec_id"]).groupBy("q_id").agg(
        F.count(F.lit(1)).alias("n_hits")
    )
    qset = comp.filter(F.col("vec_id") < RECALL_QUERIES).select(
        F.col("vec_id").alias("q_id")
    ).distinct()
    return (
        qset.join(ncand, "q_id", "left")
        .join(hits, "q_id", "left")
        .select(
            "q_id",
            F.coalesce("n_cand", F.lit(0)).cast("long").alias("n_cand"),
            F.coalesce("n_hits", F.lit(0)).cast("long").alias("n_hits"),
            F.round(
                F.coalesce("n_hits", F.lit(0)) / float(RECALL_K), 6
            ).alias(f"recall_at_{RECALL_K}"),
        )
    )


CURVE_LEVELS = (1, 2, 4, 8)  # nprobe operating points swept by the curve


@query(
    "q_sim_ivf_curve",
    oracle=f"""
WITH comp AS (
  SELECT vec_id, i AS d,
         CAST(round(CAST(embedding[i] AS DOUBLE) * 1000000) AS BIGINT) AS micro
  FROM embeddings, range(1, 65) t(i)
  WHERE i <= len(embedding)
),
h AS (
  SELECT c, i AS d, md5('a' || c || '#' || i) AS hx
  FROM range(0, {PIVF_CELLS}) cc(c), range(1, 65) t(i)
),
anchors AS (
  SELECT c, d, ({_hex13_sql('hx')}) % {PIVF_MOD} - 1000000 AS a FROM h
),
celldots AS (
  SELECT comp.vec_id, a.c, SUM(comp.micro * a.a) AS dot
  FROM comp JOIN anchors a ON a.d = comp.d
  GROUP BY comp.vec_id, a.c
),
ranked AS (
  SELECT vec_id, c, dot,
         row_number() OVER (PARTITION BY vec_id ORDER BY dot DESC, c) AS rn
  FROM celldots
),
vcell AS (SELECT vec_id, c AS cell FROM ranked WHERE rn = 1),
qrank AS (SELECT vec_id AS q_id, c AS cell, rn AS probe_rank
          FROM ranked WHERE vec_id < {RECALL_QUERIES}),
norms AS (SELECT vec_id, SUM(micro * micro) AS nn FROM comp GROUP BY vec_id),
scores AS (
  SELECT qc.vec_id AS q_id, c.vec_id AS vec_id, SUM(qc.micro * c.micro) AS sab
  FROM comp qc JOIN comp c ON c.d = qc.d AND c.vec_id <> qc.vec_id
  WHERE qc.vec_id < {RECALL_QUERIES}
  GROUP BY 1, 2
),
scored AS (
  SELECT s.q_id, s.vec_id,
         round(CAST(s.sab AS DOUBLE)
               / (sqrt(CAST(nq.nn AS DOUBLE)) * sqrt(CAST(nv.nn AS DOUBLE))), 6)
           AS cosine
  FROM scores s
  JOIN norms nq ON nq.vec_id = s.q_id
  JOIN norms nv ON nv.vec_id = s.vec_id
),
exact AS (
  SELECT q_id, vec_id FROM (
    SELECT q_id, vec_id,
           row_number() OVER (PARTITION BY q_id ORDER BY cosine DESC, vec_id) AS rn
    FROM scored) WHERE rn <= {RECALL_K}
),
cand AS (
  SELECT s.q_id, s.vec_id, s.cosine, qr.probe_rank
  FROM scored s
  JOIN vcell v ON v.vec_id = s.vec_id
  JOIN qrank qr ON qr.q_id = s.q_id AND qr.cell = v.cell
),
lv AS (SELECT CAST(unnest([{", ".join(str(x) for x in CURVE_LEVELS)}]) AS BIGINT) AS nprobe),
cl AS (
  SELECT l.nprobe, c.q_id, c.vec_id, c.cosine
  FROM cand c JOIN lv l ON c.probe_rank <= l.nprobe
),
approx AS (
  SELECT nprobe, q_id, vec_id FROM (
    SELECT nprobe, q_id, vec_id,
           row_number() OVER (PARTITION BY nprobe, q_id
                              ORDER BY cosine DESC, vec_id) AS rn
    FROM cl) WHERE rn <= {RECALL_K}
),
hits AS (
  SELECT a.nprobe, count(*) AS total_hits
  FROM approx a JOIN exact e ON e.q_id = a.q_id AND e.vec_id = a.vec_id
  GROUP BY a.nprobe
),
ncand AS (SELECT nprobe, count(*) AS n_cand_total FROM cl GROUP BY nprobe)
SELECT l.nprobe,
       CAST(coalesce(h.total_hits, 0) AS BIGINT) AS total_hits,
       CAST(coalesce(nc.n_cand_total, 0) AS BIGINT) AS n_cand_total,
       round(coalesce(h.total_hits, 0)
             / ({RECALL_QUERIES} * {RECALL_K}.0), 6) AS mean_recall
FROM lv l
LEFT JOIN hits h ON h.nprobe = l.nprobe
LEFT JOIN ncand nc ON nc.nprobe = l.nprobe
""",
)
def q_sim_ivf_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF tuning curve: recall@10 and candidate volume at nprobe in
    (1, 2, 4, 8), averaged over the fixed 10-query probe set — the
    recall/cost trade-off sweep every IVF deployment runs to choose its
    probe count (Faiss nprobe tuning, expressed relationally). Recall
    must be non-decreasing in nprobe (asserted as a property test).

    One pass computes everything: each candidate (query, vector) pair
    carries the PROBE RANK of the vector's cell in the query's cell
    ordering; level membership is then `probe_rank <= nprobe`, so the 4
    operating points share the assignment, ground-truth, and scoring
    stages instead of re-running the index 4 times. Every quantity is
    exact-integer or once-rounded, so DuckDB replays the full curve
    bit-for-bit. Scale shape: constant-Q evaluation harness — broadcast
    query set, map-side-combinable aggregates, no corpus self-join."""
    e = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    comp = _micro_comp(e)
    celldots = pivf_celldots_for(spark, sf_dir)
    cw = Window.partitionBy("vec_id").orderBy(F.col("dot").desc(), "c")
    ranked = celldots.withColumn("rn", F.row_number().over(cw)).localCheckpoint()
    vcell = ranked.filter(F.col("rn") == 1).select("vec_id", F.col("c").alias("cell"))
    qrank = ranked.filter(F.col("vec_id") < RECALL_QUERIES).select(
        F.col("vec_id").alias("q_id"),
        F.col("c").alias("cell"),
        F.col("rn").alias("probe_rank"),
    )
    scored, exact = _recall_ground_truth(comp)
    cand = (
        scored.join(vcell, "vec_id")
        .join(F.broadcast(qrank), ["q_id", "cell"])
        .select("q_id", "vec_id", "cosine", "probe_rank")
    )
    lv = spark.createDataFrame(
        [(int(x),) for x in CURVE_LEVELS], "nprobe long"
    )
    cl = cand.join(
        F.broadcast(lv), F.col("probe_rank") <= F.col("nprobe")
    ).select("nprobe", "q_id", "vec_id", "cosine")
    aw = Window.partitionBy("nprobe", "q_id").orderBy(
        F.col("cosine").desc(), "vec_id"
    )
    approx = (
        cl.withColumn("rn", F.row_number().over(aw))
        .filter(F.col("rn") <= RECALL_K)
        .select("nprobe", "q_id", "vec_id")
    )
    hits = approx.join(exact, ["q_id", "vec_id"]).groupBy("nprobe").agg(
        F.count(F.lit(1)).alias("total_hits")
    )
    ncand = cl.groupBy("nprobe").agg(F.count(F.lit(1)).alias("n_cand_total"))
    return (
        lv.join(hits, "nprobe", "left")
        .join(ncand, "nprobe", "left")
        .select(
            "nprobe",
            F.coalesce("total_hits", F.lit(0)).cast("long").alias("total_hits"),
            F.coalesce("n_cand_total", F.lit(0)).cast("long").alias("n_cand_total"),
            F.round(
                F.coalesce("total_hits", F.lit(0))
                / float(RECALL_QUERIES * RECALL_K),
                6,
            ).alias("mean_recall"),
        )
    )


# Matryoshka head width: energy retained by the first 16 of 64 dims —
# the truncation-QA number a matryoshka-embedding pipeline checks before
# switching ANN search to the cheap prefix.
MRL_HEAD_DIMS = 16


@query(
    "q_embed_norm",
    oracle=f"""
WITH comp AS (
  SELECT vec_id, i AS dim,
         CAST(round(CAST(embedding[i] AS DOUBLE) * 1000000) AS BIGINT) AS micro
  FROM embeddings, range(1, 65) t(i)
  WHERE i <= len(embedding)
)
SELECT vec_id,
       CAST(sum(micro * micro) AS BIGINT) AS ssq_full,
       CAST(sum(CASE WHEN dim <= {MRL_HEAD_DIMS}
                     THEN micro * micro ELSE 0 END) AS BIGINT) AS ssq_head,
       round(CAST(sum(CASE WHEN dim <= {MRL_HEAD_DIMS}
                           THEN micro * micro ELSE 0 END) AS DOUBLE)
             / sum(micro * micro), 6) AS head_energy_ratio
FROM comp
GROUP BY vec_id
HAVING sum(micro * micro) > 0
""",
)
def q_embed_norm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding norm / matryoshka-truncation QA (Kusupati et al. 2022,
    arXiv:2205.13147 — public method): per-vector L2 energy of the full
    64-dim embedding and of its first-16-dim head, plus the head's
    retained-energy ratio — the go/no-go number before an ANN index
    switches to truncated prefixes. Sums of squares are exact BIGINTs on
    micro-int components (64 * (2^20)^2 < 2^46), so only the final ratio
    is floating and it rounds at 6dp on both engines.

    Scale shape: zero shuffles — per-row array math (posexplode + one
    map-side-combinable groupBy on vec_id, which AQE coalesces back to
    the input partitioning); no joins, no windows, runs at any corpus
    size as a pure scan."""
    e = load_table(spark, sf_dir, "embeddings")
    comp = e.select(
        "vec_id", F.posexplode(F.col("embedding")).alias("pos", "val")
    ).select(
        "vec_id",
        (F.col("pos") + 1).cast("long").alias("dim"),
        F.round(F.col("val").cast("double") * 1000000).cast("long").alias("micro"),
    )
    sq = F.col("micro") * F.col("micro")
    head_sq = F.when(F.col("dim") <= MRL_HEAD_DIMS, sq).otherwise(F.lit(0))
    return (
        comp.groupBy("vec_id")
        .agg(
            F.sum(sq).alias("ssq_full"),
            F.sum(head_sq).alias("ssq_head"),
        )
        .filter(F.col("ssq_full") > 0)
        .select(
            "vec_id",
            "ssq_full",
            "ssq_head",
            F.round(
                F.col("ssq_head").cast("double") / F.col("ssq_full"), 6
            ).alias("head_energy_ratio"),
        )
    )


# --- trained-IVF portable twin (round 5) -------------------------------
# q_sim_ivf_trained's spark.ml KMeans is engine-internal (float Lloyd
# iterations, seed-dependent init) and therefore rows-only. This twin
# replays the SAME algorithm — Lloyd's k-means: assign to nearest
# centroid by squared L2, recompute centroids as member means — in
# exact BIGINT arithmetic that DuckDB reproduces bit-for-bit:
# md5-derived integer init centroids, integer squared distances,
# pmod-floor-divided integer centroid updates (the q_kmeans_assign
# construction). Two full Lloyd iterations are UNROLLED (same stages as
# CTEs on the oracle side); empty cells keep their previous centroid.
KM_CELLS = 8
KM_INIT_MOD = PIVF_MOD  # init components uniform in [-1e6, 1e6]


def _km_assign(comp: DataFrame, cent: DataFrame) -> DataFrame:
    """(vec_id, c, sse): nearest centroid by exact-BIGINT squared L2,
    tie to the smaller cell id. |micro - m| < 3e6, squared < 9e12, x64
    dims < 6e14 — ANSI-safe. Centroids broadcast; the distance aggregate
    is map-side combinable; argmin is one struct-max per vector."""
    dists = (
        comp.join(F.broadcast(cent), "d")
        .groupBy("vec_id", "c")
        .agg(
            F.sum(
                (F.col("micro") - F.col("m")) * (F.col("micro") - F.col("m"))
            ).alias("sse")
        )
    )
    best = dists.groupBy("vec_id").agg(
        F.max(
            F.struct(
                (-F.col("sse")).alias("neg_sse"),
                (-F.col("c")).alias("neg_c"),
                F.col("sse"),
            )
        ).alias("top")
    )
    return best.select(
        "vec_id",
        (-F.col("top.neg_c")).cast("long").alias("c"),
        F.col("top.sse").alias("sse"),
    )


def _km_update(comp: DataFrame, assign: DataFrame, cent_prev: DataFrame) -> DataFrame:
    """New centroid (c, d, m) = pmod-floor-divided integer mean of the
    members' micro-components; cells with no members keep their previous
    centroid (the COALESCE branch — standard empty-cluster handling)."""
    sums = (
        comp.join(assign.select("vec_id", "c"), "vec_id")
        .groupBy("c", "d")
        .agg(F.sum("micro").alias("s"), F.count(F.lit(1)).alias("n"))
    )
    upd = sums.select(
        "c", "d", F.expr("(s - pmod(s, n)) div n").alias("m_new")
    )
    return (
        cent_prev.withColumnRenamed("m", "m_prev")
        .join(upd, ["c", "d"], "left")
        .select("c", "d", F.coalesce("m_new", "m_prev").alias("m"))
    )


_KM_CENT0_SQL = f"""
h0 AS (
  SELECT c, i AS d, md5('k' || c || '#' || i) AS hx
  FROM range(0, {KM_CELLS}) cc(c), range(1, 65) t(i)
),
cent0 AS (SELECT c, d, ({_hex13_sql('hx')}) % {KM_INIT_MOD} - 1000000 AS m FROM h0)
"""


def _km_sql_iter(i: int) -> str:
    """One unrolled Lloyd iteration as oracle CTEs: dists{i} / as{i}
    (assignment under cent{i-1}) then sums{i} / cent{i} (update)."""
    p = i - 1
    return f"""
dists{i} AS (
  SELECT comp.vec_id, c{p}.c,
         CAST(SUM((comp.micro - c{p}.m) * (comp.micro - c{p}.m)) AS BIGINT) AS sse
  FROM comp JOIN cent{p} c{p} ON c{p}.d = comp.d
  GROUP BY comp.vec_id, c{p}.c
),
as{i} AS (
  SELECT vec_id, c, sse FROM (
    SELECT vec_id, c, sse,
           row_number() OVER (PARTITION BY vec_id ORDER BY sse, c) AS rn
    FROM dists{i}
  ) WHERE rn = 1
),
sums{i} AS (
  SELECT a.c, comp.d, CAST(SUM(comp.micro) AS BIGINT) AS s,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM comp JOIN as{i} a ON a.vec_id = comp.vec_id
  GROUP BY a.c, comp.d
),
cent{i} AS (
  SELECT c0.c, c0.d,
         COALESCE((s.s - ((s.s % s.n + s.n) % s.n)) // s.n, c0.m) AS m
  FROM cent{i-1} c0 LEFT JOIN sums{i} s ON s.c = c0.c AND s.d = c0.d
)"""


@query(
    "q_sim_ivf_trained_portable",
    oracle=f"""
WITH comp AS (
  SELECT vec_id, i AS d,
         CAST(round(CAST(embedding[i] AS DOUBLE) * 1000000) AS BIGINT) AS micro
  FROM embeddings, range(1, 65) t(i)
  WHERE i <= len(embedding)
),
{_KM_CENT0_SQL.strip().rstrip()},
{_km_sql_iter(1).strip()},
{_km_sql_iter(2).strip()},
final AS (
  SELECT vec_id, c, sse FROM (
    SELECT comp2.vec_id, comp2.c, comp2.sse,
           row_number() OVER (PARTITION BY comp2.vec_id
                              ORDER BY comp2.sse, comp2.c) AS rn
    FROM (
      SELECT comp.vec_id, c2.c,
             CAST(SUM((comp.micro - c2.m) * (comp.micro - c2.m)) AS BIGINT) AS sse
      FROM comp JOIN cent2 c2 ON c2.d = comp.d
      GROUP BY comp.vec_id, c2.c
    ) comp2
  ) WHERE rn = 1
)
SELECT CAST(c AS BIGINT) AS cell,
       CAST(COUNT(*) AS BIGINT) AS n_vecs,
       (CAST(SUM(sse) AS BIGINT)
        - ((CAST(SUM(sse) AS BIGINT) % COUNT(*) + COUNT(*)) % COUNT(*)))
       // COUNT(*) AS avg_sse
FROM final
GROUP BY c
""",
)
def q_sim_ivf_trained_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trained-IVF coarse quantizer with a FULL value oracle — the
    value-checkable twin of q_sim_ivf_trained (which keeps spark.ml
    KMeans and stays rows-only; ref README.md:12's ANN surface). Same
    algorithm, engine-exact arithmetic: md5-seeded integer init
    centroids, two UNROLLED Lloyd iterations (exact-BIGINT squared-L2
    assignment with tie-to-smaller-cell, pmod-floor-divided integer
    centroid means, empty cells keep their previous centroid), then a
    final assignment under the trained centroids. Output is the per-cell
    training summary (cell, n_vecs, avg_sse) — cell populations AND
    within-cell distortion, so a wrong assignment OR a wrong centroid
    update fails the value hash.

    Scale shape: centroids are O(cells x dims) — always broadcast; each
    assignment is one map-side-combinable (vec, cell) aggregate; each
    update is one (cell, dim) aggregate over corpus rows. Iterations
    are a fixed constant (2 here; production trains on a bounded sample
    like q_sim_ivf_trained, so iteration cost is sample-sized, never
    corpus-sized). avg_sse is floor-divided per cell — a per-cell MEAN,
    not a raw sum, so the statistic stays in BIGINT range at any corpus
    size (a raw SSE sum would overflow near ~3e4 vecs/cell x 6e14)."""
    e = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    comp = _micro_comp(e)

    cells = spark.range(KM_CELLS).select(F.col("id").cast("int").alias("c"))
    dims = spark.range(1, EMB_DIM + 1).select(F.col("id").alias("d"))
    hx = F.md5(
        F.concat(F.lit("k"), F.col("c").cast("string"), F.lit("#"),
                 F.col("d").cast("string"))
    )
    cent = cells.crossJoin(dims).select(
        "c", "d",
        (F.conv(F.substring(hx, 1, 13), 16, 10).cast("long") % KM_INIT_MOD
         - 1000000).alias("m"),
    )
    # r11 measured-and-rejected (guide §1.1 empirical loop): pinning
    # cent per iteration (localCheckpoint) looks like it should cut the
    # compounding re-derivation (7 initial-plan scans for 2 unrolled
    # iterations), but Catalyst's static BroadcastExchange reuse already
    # dedupes the repeated centroid builds at runtime — the pins only
    # added eager-job round-trips (warm noop total 2.56 s -> 2.75 s at
    # sf0.1, same-load A/B). At production iteration counts training
    # runs on a bounded SAMPLE (see docstring), so the unrolled-lineage
    # cost is sample-sized, never corpus-sized.
    #
    # r11 measured-and-rejected #2: a full exact-GEMM mapInPandas
    # rewrite (the q_dedup_semantic pattern — one kernel pass per
    # iteration emitting <= cells x dims partials, packed-centroid
    # broadcasts, oracle PASS at sf0.001/0.01/0.1, finalized plan 3
    # MapInPandas + 3 ReusedExchange) measured ~2x SLOWER warm at sf0.1
    # in two independent A/Bs (noop execute 4.2-6.1 s vs 1.8-3.1 s row
    # form): at 8 cells x 64 dims the assignment is only ~512
    # codegen-combinable FLOPs per vector, far too little arithmetic to
    # pay three Python/Arrow boundary crossings + an eager pin. The
    # GEMM kernels earn their boundary cost on quadratic pair work
    # (semantic/embed dedup), not on per-row linear passes against a
    # broadcast this small.
    for _ in range(2):  # unrolled on the oracle side as _km_sql_iter(1..2)
        assign = _km_assign(comp, cent)
        cent = _km_update(comp, assign, cent)
    final = _km_assign(comp, cent)
    return (
        final.groupBy(F.col("c").cast("long").alias("cell"))
        .agg(F.sum("sse").alias("ssum"), F.count(F.lit(1)).alias("n_vecs"))
        .select(
            "cell",
            "n_vecs",
            F.expr("(ssum - pmod(ssum, n_vecs)) div n_vecs").alias("avg_sse"),
        )
    )


# --- MMR diversified rerank (round 5) ----------------------------------
# Retrieval that feeds training-data selection or RAG wants relevant AND
# non-redundant results; Maximal Marginal Relevance (Carbonell &
# Goldstein 1998, SIGIR — public method) greedily picks
# argmax_x [ lambda*rel(q,x) - (1-lambda)*max_{s in S} sim(x,s) ].
# With lambda = 1/2 the argmax is equivalently over rel - max_sim in one
# shared integer unit. Retrieval stage: exact top-M candidates per query
# (swap in the IVF/LSH path at scale); rerank stage: k=3 greedy steps
# unrolled as deterministic window-argmax rounds over the M candidates.
MMR_QUERIES = 4   # query vectors: vec_id 0..3
MMR_CAND = 8      # candidates reranked per query
MMR_ORACLE = f"""
WITH comp AS (
  SELECT vec_id, i AS dim,
         CAST(round(CAST(embedding[i] AS DOUBLE) * 1000000) AS BIGINT)
           AS micro
  FROM embeddings, range(1, 65) t(i)
  WHERE i <= len(embedding)
),
q AS (SELECT vec_id AS qid, dim, micro AS qmicro FROM comp
      WHERE vec_id < {MMR_QUERIES}),
rel AS (
  SELECT q.qid, c.vec_id, CAST(sum(c.micro * q.qmicro) AS BIGINT) AS rel
  FROM comp c JOIN q ON c.dim = q.dim
  WHERE c.vec_id != q.qid
  GROUP BY q.qid, c.vec_id
),
cand AS (
  SELECT qid, vec_id, rel FROM (
    SELECT qid, vec_id, rel,
           row_number() OVER (PARTITION BY qid
                              ORDER BY rel DESC, vec_id) AS rn
    FROM rel
  ) WHERE rn <= {MMR_CAND}
),
ids AS (SELECT DISTINCT vec_id FROM cand),
pd AS (
  SELECT a.vec_id AS a, b.vec_id AS b,
         CAST(sum(a.micro * b.micro) AS BIGINT) AS d
  FROM comp a JOIN comp b ON a.dim = b.dim
  WHERE a.vec_id IN (SELECT vec_id FROM ids)
    AND b.vec_id IN (SELECT vec_id FROM ids)
    AND a.vec_id != b.vec_id
  GROUP BY a.vec_id, b.vec_id
),
s1 AS (
  SELECT qid, vec_id AS s1_id, rel AS s1_score FROM (
    SELECT qid, vec_id, rel,
           row_number() OVER (PARTITION BY qid
                              ORDER BY rel DESC, vec_id) AS rn
    FROM cand
  ) WHERE rn = 1
),
s2 AS (
  SELECT qid, vec_id AS s2_id, score AS s2_score FROM (
    SELECT c.qid, c.vec_id, c.rel - pd.d AS score,
           row_number() OVER (PARTITION BY c.qid
                              ORDER BY c.rel - pd.d DESC, c.vec_id) AS rn
    FROM cand c
    JOIN s1 ON s1.qid = c.qid AND c.vec_id != s1.s1_id
    JOIN pd ON pd.a = c.vec_id AND pd.b = s1.s1_id
  ) WHERE rn = 1
),
s3 AS (
  SELECT qid, vec_id AS s3_id, score AS s3_score FROM (
    SELECT c.qid, c.vec_id,
           c.rel - greatest(p1.d, p2.d) AS score,
           row_number() OVER (
             PARTITION BY c.qid
             ORDER BY c.rel - greatest(p1.d, p2.d) DESC, c.vec_id) AS rn
    FROM cand c
    JOIN s1 ON s1.qid = c.qid
    JOIN s2 ON s2.qid = c.qid
      AND c.vec_id != s1.s1_id AND c.vec_id != s2.s2_id
    JOIN pd p1 ON p1.a = c.vec_id AND p1.b = s1.s1_id
    JOIN pd p2 ON p2.a = c.vec_id AND p2.b = s2.s2_id
  ) WHERE rn = 1
)
SELECT qid, CAST(pick AS BIGINT) AS pick, vec_id, mmr_score FROM (
  SELECT qid, 1 AS pick, s1_id AS vec_id, s1_score AS mmr_score FROM s1
  UNION ALL
  SELECT qid, 2, s2_id, s2_score FROM s2
  UNION ALL
  SELECT qid, 3, s3_id, s3_score FROM s3
)
"""


@query("q_mmr_diversify", oracle=MMR_ORACLE)
def q_mmr_diversify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MMR diversified rerank: for each of 4 query vectors, the exact
    top-8 candidates by micro-int dot product are greedily reranked into
    3 picks maximizing marginal relevance (lambda = 1/2, so each step's
    objective is rel - max dot-to-selected in one shared integer unit).
    Ties break on vec_id; every quantity is exact BIGINT (micro-int
    components, |micro| < 2^21, 64-dim dots < 2^48), so Spark and the
    oracle agree bit-for-bit.

    Scale shape: the retrieval stage is the q_sim_topk pattern (a
    broadcast O(queries x dim) table against one corpus scan, map-side
    combinable per-(qid, vec) dot aggregation, per-query top-M window
    over M<<corpus rows); at 100 TB you swap in the IVF probe for the
    scan without touching the rerank. The rerank stage only ever sees
    queries x M rows and a <= (queries*M)^2-row pairwise-dot table —
    corpus-independent, and each greedy step is a keyed window over M
    rows, not an iterative driver loop."""
    e = load_table(spark, sf_dir, "embeddings")
    comp = e.select(
        "vec_id",
        F.posexplode(_as_double(F.col("embedding"))).alias("dim", "val"),
    ).select(
        "vec_id", "dim",
        F.round(F.col("val") * 1000000).cast("long").alias("micro"),
    )
    qcomp = (
        comp.filter(F.col("vec_id") < MMR_QUERIES)
        .select(
            F.col("vec_id").alias("qid"), "dim",
            F.col("micro").alias("qmicro"),
        )
    )
    rel = (
        comp.join(F.broadcast(qcomp), "dim")
        .filter(F.col("vec_id") != F.col("qid"))
        .groupBy("qid", "vec_id")
        .agg(F.sum(F.col("micro") * F.col("qmicro")).alias("rel"))
    )
    w_rel = Window.partitionBy("qid").orderBy(F.col("rel").desc(), "vec_id")
    # r11 (guide §3.3/§5): cand and pd are QUERY-sized (<= queries*M and
    # <= (queries*M)^2 rows) but every consumer below re-derived them
    # from scratch — cand feeds ids/s1/step2/step3 and pd feeds
    # step2/step3 twice, so the initial plan re-ran the corpus
    # posexplode+dot subtree 19x per side (38 embeddings scans, 77
    # exchanges — plans/r11/q_mmr_diversify_before.txt). Materializing
    # the two tiny tables truncates every branch: exactly TWO corpus
    # passes remain (rel's dot aggregate, cc's candidate gather), and
    # the greedy rerank runs over pinned local rows.
    cand = (
        rel.withColumn("rn", F.row_number().over(w_rel))
        .filter(F.col("rn") <= MMR_CAND)
        .drop("rn")
        .localCheckpoint(eager=True)
    )
    # pairwise dots over the union candidate set: <= (queries*M)^2 rows.
    # cc (candidate components, <= queries*M x dim rows) feeds BOTH pd
    # join sides — pin it so the gather pass runs once, not twice.
    # r12 (VERDICT r11 #4): gather by joining the UN-exploded embedding
    # rows first, THEN posexplode the <= queries*M survivors — the old
    # form joined against `comp` (the full-corpus posexplode), so the
    # gather re-ran the 64x row explosion over every vector; Catalyst
    # cannot push a join below a Generate. One corpus-scan's I/O is
    # still paid (no pruning index), but the explode+shuffle work is
    # now candidate-sized, not corpus-sized.
    ids = cand.select("vec_id").distinct()
    cc = (
        e.join(F.broadcast(ids), "vec_id")
        .select(
            "vec_id",
            F.posexplode(_as_double(F.col("embedding"))).alias("dim", "val"),
        )
        .select(
            "vec_id", "dim",
            F.round(F.col("val") * 1000000).cast("long").alias("micro"),
        )
        .localCheckpoint(eager=True)
    )
    pd = (
        cc.select(F.col("vec_id").alias("a"), "dim", F.col("micro").alias("ma"))
        .join(
            F.broadcast(
                cc.select(
                    F.col("vec_id").alias("b"), "dim",
                    F.col("micro").alias("mb"),
                )
            ),
            "dim",
        )
        .filter(F.col("a") != F.col("b"))
        .groupBy("a", "b")
        .agg(F.sum(F.col("ma") * F.col("mb")).alias("d"))
        .localCheckpoint(eager=True)
    )
    s1 = (
        cand.withColumn("rn", F.row_number().over(w_rel))
        .filter(F.col("rn") == 1)
        .select("qid", F.col("vec_id").alias("s1_id"), F.col("rel").alias("s1_score"))
    )
    step2 = (
        cand.join(F.broadcast(s1), "qid")
        .filter(F.col("vec_id") != F.col("s1_id"))
        .join(
            F.broadcast(pd),
            (F.col("vec_id") == F.col("a")) & (F.col("s1_id") == F.col("b")),
        )
        .select("qid", "vec_id", (F.col("rel") - F.col("d")).alias("score"))
    )
    w_sc = Window.partitionBy("qid").orderBy(F.col("score").desc(), "vec_id")
    s2 = (
        step2.withColumn("rn", F.row_number().over(w_sc))
        .filter(F.col("rn") == 1)
        .select("qid", F.col("vec_id").alias("s2_id"), F.col("score").alias("s2_score"))
    )
    pd1 = pd.select(F.col("a").alias("a1"), F.col("b").alias("b1"), F.col("d").alias("d1"))
    pd2 = pd.select(F.col("a").alias("a2"), F.col("b").alias("b2"), F.col("d").alias("d2"))
    step3 = (
        cand.join(F.broadcast(s1), "qid")
        .join(F.broadcast(s2), "qid")
        .filter(
            (F.col("vec_id") != F.col("s1_id"))
            & (F.col("vec_id") != F.col("s2_id"))
        )
        .join(
            F.broadcast(pd1),
            (F.col("vec_id") == F.col("a1")) & (F.col("s1_id") == F.col("b1")),
        )
        .join(
            F.broadcast(pd2),
            (F.col("vec_id") == F.col("a2")) & (F.col("s2_id") == F.col("b2")),
        )
        .select(
            "qid", "vec_id",
            (F.col("rel") - F.greatest(F.col("d1"), F.col("d2"))).alias("score"),
        )
    )
    s3 = (
        step3.withColumn("rn", F.row_number().over(w_sc))
        .filter(F.col("rn") == 1)
        .select("qid", F.col("vec_id").alias("s3_id"), F.col("score").alias("s3_score"))
    )
    one = lambda n: F.lit(n).cast("long")  # noqa: E731
    return (
        s1.select("qid", one(1).alias("pick"), F.col("s1_id").alias("vec_id"),
                  F.col("s1_score").alias("mmr_score"))
        .unionAll(
            s2.select("qid", one(2).alias("pick"), F.col("s2_id").alias("vec_id"),
                      F.col("s2_score").alias("mmr_score"))
        )
        .unionAll(
            s3.select("qid", one(3).alias("pick"), F.col("s3_id").alias("vec_id"),
                      F.col("s3_score").alias("mmr_score"))
        )
    )


PQ_SEARCH_QUERIES = 4   # query vectors: vec_id in [0, PQ_SEARCH_QUERIES)
PQ_SEARCH_TOPK = 10


@query(
    "q_sim_pq_search",
    oracle=f"""
WITH comp AS (
  SELECT vec_id,
         ((i - 1) // 8) AS m, i AS dim,
         CAST({_PQ_BUCKET} AS BIGINT) AS bucket,
         CAST(round(CAST(embedding[i] AS DOUBLE) * 1000000) AS BIGINT) AS micro
  FROM embeddings, range(1, 65) t(i)
  WHERE i <= len(embedding)
),
book AS (
  SELECT m, bucket AS code, dim,
         (CAST(sum(micro) AS BIGINT)
          - ((CAST(sum(micro) AS BIGINT) % count(*) + count(*)) % count(*)))
         // count(*) AS icent
  FROM comp GROUP BY m, bucket, dim
),
dists AS (
  SELECT c.vec_id, c.m, b.code,
         CAST(sum((c.micro - b.icent) * (c.micro - b.icent)) AS BIGINT) AS sse
  FROM comp c JOIN book b ON c.m = b.m AND c.dim = b.dim
  GROUP BY c.vec_id, c.m, b.code
),
codes AS (
  SELECT vec_id, m, code FROM (
    SELECT vec_id, m, code,
           row_number() OVER (PARTITION BY vec_id, m
                              ORDER BY sse, code) AS rn
    FROM dists
  ) WHERE rn = 1
),
lut AS (
  SELECT q.vec_id AS qid, b.m, b.code,
         CAST(sum((q.micro - b.icent) * (q.micro - b.icent)) AS BIGINT)
           AS part
  FROM comp q JOIN book b ON q.m = b.m AND q.dim = b.dim
  WHERE q.vec_id < {PQ_SEARCH_QUERIES}
  GROUP BY q.vec_id, b.m, b.code
),
adc AS (
  SELECT l.qid, c.vec_id, CAST(sum(l.part) AS BIGINT) AS adc
  FROM codes c JOIN lut l ON l.m = c.m AND l.code = c.code
  WHERE c.vec_id <> l.qid
  GROUP BY l.qid, c.vec_id
)
SELECT qid, CAST(rn AS BIGINT) AS rank, vec_id, adc FROM (
  SELECT qid, vec_id, adc,
         row_number() OVER (PARTITION BY qid ORDER BY adc, vec_id) AS rn
  FROM adc
) WHERE rn <= {PQ_SEARCH_TOPK}
""",
)
def q_sim_pq_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ asymmetric-distance (ADC) top-k search — the query half of the
    product-quantization story (Jégou et al. 2011 §III-B; q_pq_encode
    is the build half): the corpus is represented ONLY by its M=8
    one-byte codes, and each query precomputes an M x K lookup table of
    exact subspace distances to the codebook; a corpus vector's
    approximate distance is then the sum of 8 table lookups — no
    corpus-side float math at query time. This is THE memory-bound ANN
    layout at 100 TB: 8 bytes/vector instead of 256, and search cost is
    a code join, not a vector scan.

    Determinism: same hash-bucket codebook, floor-div integer centroids
    and exact BIGINT squared distances as q_pq_encode; ADC sums and the
    (adc, vec_id) rank order replay bit-for-bit in the oracle.

    Scale shape: codebook (1,024 rows) and per-query LUTs
    (queries x 8 x 16 rows) broadcast — both bounded by PQ geometry,
    not data. The corpus-proportional cost is the ENCODE, not the
    search: the broadcast codebook join fans each component row out to
    its K = 16 candidate codes before the (vec, m, code) SSE aggregate
    — N x dims x K multiply-adds, map-side combined; that is the same
    multiply count FAISS spends in BLAS for PQ encode, and it amortizes
    across every later query because search touches only the 8-byte
    codes (a broadcast-LUT join + map-side ADC reduce + query-
    partitioned top-k window over an aggregate-shrunk set). At 100 TB
    the codes are a stored table written once by the encode job; the
    per-query cost is independent of vector width."""
    e = load_table(spark, sf_dir, "embeddings")
    comp = e.select(
        "vec_id",
        F.posexplode(F.col("embedding")).alias("pos", "val"),
    ).select(
        "vec_id",
        F.expr("pos div 8").alias("m"),
        (F.col("pos") + 1).cast("long").alias("dim"),
        F.expr(_PQ_BUCKET).cast("long").alias("bucket"),
        F.round(F.col("val").cast("double") * 1000000).cast("long").alias("micro"),
    )
    book = (
        comp.groupBy("m", F.col("bucket").alias("code"), "dim")
        .agg(F.sum("micro").alias("s"), F.count(F.lit(1)).alias("n"))
        .select(
            "m",
            "code",
            "dim",
            F.expr("(s - pmod(s, n)) div n").alias("icent"),
        )
    )
    diff = F.col("micro") - F.col("icent")
    dists = (
        comp.join(F.broadcast(book), ["m", "dim"])
        .groupBy("vec_id", "m", "code")
        .agg(F.sum(diff * diff).alias("sse"))
    )
    codes = (
        dists.groupBy("vec_id", "m")
        .agg(F.min(F.struct(F.col("sse"), F.col("code"))).alias("top"))
        .select("vec_id", "m", F.col("top.code").alias("code"))
    )
    qdiff = F.col("micro") - F.col("icent")
    lut = (
        comp.filter(F.col("vec_id") < PQ_SEARCH_QUERIES)
        .join(F.broadcast(book), ["m", "dim"])
        .groupBy(F.col("vec_id").alias("qid"), "m", "code")
        .agg(F.sum(qdiff * qdiff).alias("part"))
    )
    adc = (
        codes.join(F.broadcast(lut), ["m", "code"])
        .filter(F.col("vec_id") != F.col("qid"))
        .groupBy("qid", "vec_id")
        .agg(F.sum("part").alias("adc"))
    )
    w = Window.partitionBy("qid").orderBy("adc", "vec_id")
    return (
        adc.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= PQ_SEARCH_TOPK)
        .select("qid", "rank", "vec_id", "adc")
    )


# ---------------------------------------------------------------------------
# IVF-PQ combined search (Jégou et al. 2011 §V, the FAISS IVFPQ layout):
# coarse IVF cells prune the corpus to nprobe cells; within them, vectors
# are represented only by PQ codes of their RESIDUAL (vector minus its
# cell's anchor), and the query builds one ADC lookup table PER PROBED CELL
# (its residual differs per cell). This is the composition of
# q_sim_ivf_portable (coarse stage) and q_sim_pq_search (fine stage), and
# the standard memory layout for billion-scale ANN: 8 code bytes per vector
# plus a cell id, with per-cell partition pruning on the probe.
IVFPQ_TOPK = 10


@query(
    "q_sim_ivfpq",
    oracle=f"""
WITH comp AS (
  SELECT vec_id, i AS d,
         CAST(round(CAST(embedding[i] AS DOUBLE) * 1000000) AS BIGINT) AS micro
  FROM embeddings, range(1, 65) t(i)
  WHERE i <= len(embedding)
),
h AS (
  SELECT c, i AS d, md5('a' || c || '#' || i) AS hx
  FROM range(0, {PIVF_CELLS}) cc(c), range(1, 65) t(i)
),
anchors AS (
  SELECT c, d, ({_hex13_sql('hx')}) % {PIVF_MOD} - 1000000 AS a FROM h
),
celldots AS (
  SELECT comp.vec_id, a.c, SUM(comp.micro * a.a) AS dot
  FROM comp JOIN anchors a ON a.d = comp.d
  GROUP BY comp.vec_id, a.c
),
ranked AS (
  SELECT vec_id, c, dot,
         row_number() OVER (PARTITION BY vec_id ORDER BY dot DESC, c) AS rn
  FROM celldots
),
vcell AS (SELECT vec_id, c AS cell FROM ranked WHERE rn = 1),
probe AS (SELECT c AS cell FROM ranked
          WHERE vec_id = 0 AND rn <= {PIVF_NPROBE}),
res AS (
  SELECT comp.vec_id AS vec_id, comp.d AS d, ((comp.d - 1) // 8) AS m,
         CAST({_PQ_BUCKET.replace("vec_id", "comp.vec_id")} AS BIGINT) AS bucket,
         comp.micro - a.a AS rm
  FROM comp
  JOIN vcell v ON v.vec_id = comp.vec_id
  JOIN anchors a ON a.c = v.cell AND a.d = comp.d
),
book AS (
  SELECT m, bucket AS code, d,
         (CAST(sum(rm) AS BIGINT)
          - ((CAST(sum(rm) AS BIGINT) % count(*) + count(*)) % count(*)))
         // count(*) AS icent
  FROM res GROUP BY m, bucket, d
),
dists AS (
  SELECT r.vec_id, r.m, b.code,
         CAST(sum((r.rm - b.icent) * (r.rm - b.icent)) AS BIGINT) AS sse
  FROM res r JOIN book b ON r.m = b.m AND r.d = b.d
  GROUP BY r.vec_id, r.m, b.code
),
codes AS (
  SELECT vec_id, m, code FROM (
    SELECT vec_id, m, code,
           row_number() OVER (PARTITION BY vec_id, m
                              ORDER BY sse, code) AS rn
    FROM dists
  ) WHERE rn = 1
),
qres AS (
  SELECT p.cell, comp.d, ((comp.d - 1) // 8) AS m, comp.micro - a.a AS qr
  FROM comp
  JOIN probe p ON comp.vec_id = 0
  JOIN anchors a ON a.c = p.cell AND a.d = comp.d
),
lut AS (
  SELECT q.cell, b.m, b.code,
         CAST(sum((q.qr - b.icent) * (q.qr - b.icent)) AS BIGINT) AS part
  FROM qres q JOIN book b ON q.m = b.m AND q.d = b.d
  GROUP BY q.cell, b.m, b.code
),
adc AS (
  SELECT c.vec_id, l.cell, CAST(sum(l.part) AS BIGINT) AS adc
  FROM codes c
  JOIN vcell v ON v.vec_id = c.vec_id
  JOIN lut l ON l.cell = v.cell AND l.m = c.m AND l.code = c.code
  WHERE c.vec_id <> 0
  GROUP BY c.vec_id, l.cell
)
SELECT CAST(rn AS BIGINT) AS rank, vec_id, CAST(cell AS BIGINT) AS cell, adc
FROM (
  SELECT vec_id, cell, adc,
         row_number() OVER (ORDER BY adc, vec_id) AS rn
  FROM adc
) WHERE rn <= {IVFPQ_TOPK}
""",
)
def q_sim_ivfpq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ residual-coded ANN search — the billion-scale composition
    (Jégou 2011 §V / FAISS IVFPQ): coarse md5-anchor cells prune to the
    query's {PIVF_NPROBE} probed cells; within them the corpus exists
    only as 8 PQ codes of the cell-residual, and the query scores by
    asymmetric distance through a per-probed-cell lookup table. Every
    stage is the already-verified integer arithmetic of
    q_sim_ivf_portable (coarse) and q_sim_pq_search (fine), so the full
    two-level index replays bit-for-bit in DuckDB.

    Scale shape: anchors (cells x dims) and the per-cell LUTs
    (nprobe x 8 x 16 rows) broadcast — both bounded by index geometry;
    residual encoding is one broadcast join + two map-side-combined
    aggregates over the corpus; at serving scale the (cell, m, code)
    table is written partitionBy(cell) so the probe semi-join becomes
    partition pruning (the q_sim_ivf stored-index pattern), and the ADC
    join touches only nprobe/cells of the data. Final top-k is a
    TakeOrdered over the aggregate-shrunk candidate set."""
    e = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    comp = _micro_comp(e)
    celldots = pivf_celldots_for(spark, sf_dir)
    best = celldots.groupBy("vec_id").agg(
        F.max(F.struct(F.col("dot"), (-F.col("c")).alias("nc"))).alias("top")
    )
    # r11 measured-and-rejected (guide §1.1): DISK_ONLY-pinning vcell /
    # res and the tiny codebook (the 9-initial-plan-scan reading of
    # plans/r11/q_sim_ivfpq_before.txt) REGRESSED the warm noop total
    # 2.07 s -> 4.58 s at sf0.1 in a same-load A/B: the repeated book
    # broadcasts already dedupe via static BroadcastExchange reuse and
    # celldots is session-memoized, so the pins only bought disk
    # round-trips. The initial-plan scan count overstates executed work
    # here — left in the re-derived form deliberately.
    vcell = best.select("vec_id", (-F.col("top.nc")).cast("int").alias("cell"))
    probe = (
        celldots.filter(F.col("vec_id") == 0)
        .orderBy(F.col("dot").desc(), "c")
        .limit(PIVF_NPROBE)
        .select(F.col("c").alias("cell"))
    )
    anchors = _pivf_anchors(spark)
    res = (
        comp.join(vcell, "vec_id")
        .join(
            F.broadcast(anchors.withColumnRenamed("c", "cell")),
            ["cell", "d"],
        )
        .select(
            "vec_id",
            "cell",
            "d",
            F.expr("(d - 1) div 8").alias("m"),
            F.expr(_PQ_BUCKET).cast("long").alias("bucket"),
            (F.col("micro") - F.col("a")).alias("rm"),
        )
    )
    book = (
        res.groupBy("m", F.col("bucket").alias("code"), "d")
        .agg(F.sum("rm").alias("s"), F.count(F.lit(1)).alias("n"))
        .select("m", "code", "d", F.expr("(s - pmod(s, n)) div n").alias("icent"))
    )
    rdiff = F.col("rm") - F.col("icent")
    dists = (
        res.join(F.broadcast(book), ["m", "d"])
        .groupBy("vec_id", "m", "code")
        .agg(F.sum(rdiff * rdiff).alias("sse"))
    )
    codes = (
        dists.groupBy("vec_id", "m")
        .agg(F.min(F.struct(F.col("sse"), F.col("code"))).alias("top"))
        .select("vec_id", "m", F.col("top.code").alias("code"))
    )
    qres = (
        comp.filter(F.col("vec_id") == 0)
        .crossJoin(F.broadcast(probe))
        .join(
            F.broadcast(anchors.withColumnRenamed("c", "cell")),
            ["cell", "d"],
        )
        .select(
            "cell",
            "d",
            F.expr("(d - 1) div 8").alias("m"),
            (F.col("micro") - F.col("a")).alias("qr"),
        )
    )
    qdiff = F.col("qr") - F.col("icent")
    lut = (
        qres.join(F.broadcast(book), ["m", "d"])
        .groupBy("cell", "m", "code")
        .agg(F.sum(qdiff * qdiff).alias("part"))
    )
    adc = (
        codes.filter(F.col("vec_id") != 0)
        .join(vcell, "vec_id")
        .join(F.broadcast(lut), ["cell", "m", "code"])
        .groupBy("vec_id", "cell")
        .agg(F.sum("part").alias("adc"))
    )
    top = adc.orderBy("adc", "vec_id").limit(IVFPQ_TOPK)
    w = Window.orderBy("adc", "vec_id")
    return top.select(
        F.row_number().over(w).cast("long").alias("rank"),
        "vec_id",
        F.col("cell").cast("long").alias("cell"),
        "adc",
    )


# ---------------------------------------------------------------------------
# Johnson-Lindenstrauss random projection (Achlioptas 2001's ±1 database-
# friendly form): k = 16 projection rows with deterministic md5-derived
# signs compress 64-dim embeddings 4x while preserving pairwise geometry
# to O(sqrt(log n / k)) distortion — the standard cheap pre-filter in
# front of exact rerank, and a distinct primitive from the codebook
# methods (PQ/int8) because it needs NO training pass over the corpus.
RP_K = 16
RP_QUERY = 0
RP_TOPK = 10


@query(
    "q_embed_rp",
    oracle=f"""
WITH comp AS (
  SELECT vec_id, i AS d,
         CAST(round(CAST(embedding[i] AS DOUBLE) * 1000000) AS BIGINT) AS micro
  FROM embeddings, range(1, 65) t(i)
  WHERE i <= len(embedding)
),
signs AS (
  SELECT j, i AS d,
         1 - 2 * (({_hex13_sql("md5('r' || j || '#' || i)")}) % 2) AS r
  FROM range(0, {RP_K}) jj(j), range(1, 65) t(i)
),
proj AS (
  SELECT comp.vec_id, s.j, CAST(SUM(comp.micro * s.r) AS BIGINT) AS p
  FROM comp JOIN signs s ON s.d = comp.d
  GROUP BY comp.vec_id, s.j
),
qp AS (SELECT j, p AS qv FROM proj WHERE vec_id = {RP_QUERY}),
scores AS (
  SELECT proj.vec_id,
         CAST(SUM(proj.p * qp.qv) AS BIGINT) AS pdot,
         CAST(SUM(proj.p * proj.p) AS BIGINT) AS pvv,
         CAST(SUM(qp.qv * qp.qv) AS BIGINT) AS pqq
  FROM proj JOIN qp ON qp.j = proj.j
  WHERE proj.vec_id <> {RP_QUERY}
  GROUP BY proj.vec_id
),
exact AS (
  SELECT comp.vec_id,
         CAST(SUM(comp.micro * qc.micro) AS BIGINT) AS svq,
         CAST(SUM(comp.micro * comp.micro) AS BIGINT) AS svv,
         CAST(SUM(qc.micro * qc.micro) AS BIGINT) AS sqq
  FROM comp JOIN (SELECT d, micro FROM comp WHERE vec_id = {RP_QUERY}) qc
    ON qc.d = comp.d
  WHERE comp.vec_id <> {RP_QUERY}
  GROUP BY comp.vec_id
)
SELECT CAST(rn AS BIGINT) AS rank, vec_id, proj_cosine, exact_cosine FROM (
  SELECT s.vec_id,
         round(CAST(s.pdot AS DOUBLE)
               / (sqrt(CAST(s.pvv AS DOUBLE)) * sqrt(CAST(s.pqq AS DOUBLE))),
               6) AS proj_cosine,
         round(CAST(e.svq AS DOUBLE)
               / (sqrt(CAST(e.svv AS DOUBLE)) * sqrt(CAST(e.sqq AS DOUBLE))),
               6) AS exact_cosine,
         row_number() OVER (
           ORDER BY round(CAST(s.pdot AS DOUBLE)
                    / (sqrt(CAST(s.pvv AS DOUBLE)) * sqrt(CAST(s.pqq AS DOUBLE))),
                    6) DESC, s.vec_id) AS rn
  FROM scores s JOIN exact e ON e.vec_id = s.vec_id
) WHERE rn <= {RP_TOPK}
""",
)
def q_embed_rp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Johnson-Lindenstrauss ±1 random projection (Achlioptas 2001):
    project 64-dim embeddings to {RP_K} dims with md5-derived signs —
    no training pass, 4x compression — then score the query's top-10 by
    PROJECTED cosine, reporting the exact cosine alongside so the JL
    distortion is visible in the result (the acceptance check a
    pre-filter deployment runs).

    Scale shape: the sign matrix is a {RP_K} x 64 literal-bounded
    broadcast; projection is one map-side-combinable (vec, j) aggregate
    over the component explode — corpus-linear, shuffle-free until the
    16-row-per-vector aggregate; scoring joins the 16-row query
    projection broadcast-style. Integer dots both sides; the only
    rounding is the final 6dp cosine, identical in both engines.
    """
    e = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    comp = _micro_comp(e)
    js = spark.range(RP_K).select(F.col("id").cast("int").alias("j"))
    dims = spark.range(1, EMB_DIM + 1).select(F.col("id").alias("d"))
    hx = F.md5(
        F.concat(
            F.lit("r"), F.col("j").cast("string"), F.lit("#"), F.col("d").cast("string")
        )
    )
    signs = js.crossJoin(dims).select(
        "j",
        "d",
        (
            F.lit(1)
            - F.lit(2) * (F.conv(F.substring(hx, 1, 13), 16, 10).cast("long") % 2)
        ).alias("r"),
    )
    proj = (
        comp.join(F.broadcast(signs), "d")
        .groupBy("vec_id", "j")
        .agg(F.sum(F.col("micro") * F.col("r")).alias("p"))
    )
    qp = proj.filter(F.col("vec_id") == RP_QUERY).select("j", F.col("p").alias("qv"))
    scores = (
        proj.filter(F.col("vec_id") != RP_QUERY)
        .join(F.broadcast(qp), "j")
        .groupBy("vec_id")
        .agg(
            F.sum(F.col("p") * F.col("qv")).alias("pdot"),
            F.sum(F.col("p") * F.col("p")).alias("pvv"),
            F.sum(F.col("qv") * F.col("qv")).alias("pqq"),
        )
    )
    qc = comp.filter(F.col("vec_id") == RP_QUERY).select(
        "d", F.col("micro").alias("qmicro")
    )
    exact = (
        comp.filter(F.col("vec_id") != RP_QUERY)
        .join(F.broadcast(qc), "d")
        .groupBy("vec_id")
        .agg(
            F.sum(F.col("micro") * F.col("qmicro")).alias("svq"),
            F.sum(F.col("micro") * F.col("micro")).alias("svv"),
            F.sum(F.col("qmicro") * F.col("qmicro")).alias("sqq"),
        )
    )
    pcos = F.col("pdot").cast("double") / (
        F.sqrt(F.col("pvv").cast("double")) * F.sqrt(F.col("pqq").cast("double"))
    )
    ecos = F.col("svq").cast("double") / (
        F.sqrt(F.col("svv").cast("double")) * F.sqrt(F.col("sqq").cast("double"))
    )
    joined = scores.join(exact, "vec_id").select(
        "vec_id",
        F.round(pcos, 6).alias("proj_cosine"),
        F.round(ecos, 6).alias("exact_cosine"),
    )
    top = joined.orderBy(F.col("proj_cosine").desc(), "vec_id").limit(RP_TOPK)
    w = Window.orderBy(F.col("proj_cosine").desc(), "vec_id")
    return top.select(
        F.row_number().over(w).cast("long").alias("rank"),
        "vec_id",
        "proj_cosine",
        "exact_cosine",
    )
