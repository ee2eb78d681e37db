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

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from elric_rs_spark.registry import query
from elric_rs_spark.tables import load_table
from elric_rs_spark.functions.vector import (
    as_double as _as_double,
    dot as _dot,
    norm_l2 as _norm,
)

EMB_DIM = 64
LSH_PLANES = 8


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


def _hyperplanes():
    """LSH_PLANES deterministic pseudo-random hyperplanes as array literals:
    component (p, d) = hash-derived value in [-1, 1]."""
    import struct

    def h64(p: int, d: int) -> float:
        # splitmix64-ish deterministic scramble -> [-1, 1]
        x = (p * 0x9E3779B97F4A7C15 + d * 0xBF58476D1CE4E5B9 + 0x94D049BB133111EB) % (1 << 64)
        x ^= x >> 30
        x = (x * 0xBF58476D1CE4E5B9) % (1 << 64)
        x ^= x >> 27
        x = (x * 0x94D049BB133111EB) % (1 << 64)
        x ^= x >> 31
        return (x / float((1 << 64) - 1)) * 2.0 - 1.0

    return [[h64(p, d) for d in range(EMB_DIM)] for p in range(LSH_PLANES)]


@query("q_sim_lsh")  # rows-only: bucket recall is approximate by design
def q_sim_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Random-hyperplane LSH ANN (X16 scale path): 8-bit sign bucket ->
    per-bucket pairwise cosine >= 0.35. The bucket self-join replaces the
    n^2 cross join; at 100 TB rows only meet if they collide in a bucket."""
    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", _as_double("embedding").alias("v")
    )
    planes = _hyperplanes()
    bucket = F.lit(0)
    for i, plane in enumerate(planes):
        p = F.array(*[F.lit(x) for x in plane])
        bucket = bucket + F.when(_dot(F.col("v"), p) >= 0, F.lit(1 << i)).otherwise(0)
    buck = e.withColumn("bucket", bucket)
    a, b = buck.alias("a"), buck.alias("b")
    cosine = _dot(F.col("a.v"), F.col("b.v")) / (_norm(F.col("a.v")) * _norm(F.col("b.v")))
    return (
        a.join(b, (F.col("a.bucket") == F.col("b.bucket")) & (F.col("a.vec_id") < F.col("b.vec_id")))
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            F.col("a.bucket").alias("bucket"),
            F.round(cosine, 6).alias("cosine"),
        )
        .filter(F.col("cosine") >= 0.35)
        .orderBy("vec_a", "vec_b")
    )


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
