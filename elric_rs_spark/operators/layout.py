"""Data-layout operators: Z-order clustering and rendezvous-hash
sharding — the physical-placement levers of a 100 TB deployment.

The reference loads rows into ClickHouse and delegates layout to the
MergeTree ORDER BY key (schema DDL, setup.rs — see SURVEY.md §2.2 S8);
on a data lake the engine itself owns placement. Two canonical levers:

- **Z-order (Morton) clustering**: bit-interleave two (or more) key
  dimensions into one sort key, then range-partition the write on it.
  Every output file then covers a small rectangle in BOTH dimensions,
  so parquet min/max footer stats prune scans filtered on EITHER key —
  the standard multi-dimensional clustering trick (Delta OPTIMIZE
  ZORDER, Iceberg sort orders are the public implementations).
- **Rendezvous (highest-random-weight) sharding**: doc → shard by
  argmax over shards of hash(doc, shard). Stateless, coordination-free
  and minimally disruptive: growing n→n+1 shards moves only ~1/(n+1)
  of keys (vs ~all keys for mod-n), which is what you want when
  re-sharding a 100 TB corpus store.

Everything is exact BIGINT arithmetic (floor-division bit extraction,
multiplicative mixing bounded under 2^63), so DuckDB replays each
query bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from elric_rs_spark.registry import query
from elric_rs_spark.tables import load_table

# 8 bits per dimension -> 16-bit z-value; 32 range buckets of width 2048
Z_BITS = 8
Z_BUCKETS = 32
_Z_BUCKET_W = (1 << (2 * Z_BITS)) // Z_BUCKETS


def _interleave_sql(p: str, s: str, fd: str) -> str:
    """SQL for the 16-bit Morton interleave of two 8-bit values.

    Pure floor-division/modulo bit extraction; `fd` is the dialect's
    floor-division operator (`//` DuckDB, `div` Spark) — identical on
    the non-negative operands used here, and the rest of the generated
    expression text is shared by both engines via this one builder.
    """
    terms = []
    for i in range(Z_BITS):
        terms.append(f"(({p} {fd} {1 << i}) % 2) * {1 << (2 * i)}")
        terms.append(f"(({s} {fd} {1 << i}) % 2) * {1 << (2 * i + 1)}")
    return " + ".join(terms)


def _z_expr(fd: str) -> str:
    return _interleave_sql(
        f"(l_partkey % {1 << Z_BITS})", f"(l_suppkey % {1 << Z_BITS})", fd
    )


@query(
    "q_zorder_layout",
    oracle=f"""
WITH z AS (
  SELECT l_partkey % {1 << Z_BITS} AS pb,
         l_suppkey % {1 << Z_BITS} AS sb,
         ({_z_expr("//")}) // {_Z_BUCKET_W} AS bucket
  FROM lineitem
)
SELECT bucket,
       CAST(count(*) AS BIGINT) AS n_rows,
       min(pb) AS p_min, max(pb) AS p_max,
       min(sb) AS s_min, max(sb) AS s_max
FROM z
GROUP BY bucket
ORDER BY bucket
""",
)
def q_zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order clustering audit: Morton-interleave (part, supplier)
    buckets into a 16-bit z-value, range-bucket the fact table on it,
    and report each bucket's min/max span in BOTH source dimensions.

    The spans are the point: a z-range bucket of width 2048 covers a
    ~45x45 rectangle of the 256x256 key grid, so per-file footer stats
    prune ~97% of files for a point filter on EITHER dimension — vs a
    single-key sort where the second dimension's span is the full
    domain. At 100 TB the write path is
    `df.withColumn("z", ...).repartitionByRange(N, "z").sortWithinPartitions("z")
    .write.parquet(...)`; this query is the audit that proves the
    clustering quality those footer stats will deliver (the same
    aggregation a lakehouse OPTIMIZE job logs). One shuffle (the
    32-key bucket groupBy, map-side combined); the z-value itself is
    scan-local integer arithmetic in whole-stage codegen.
    """
    li = load_table(spark, sf_dir, "lineitem")
    z = li.select(
        F.expr(f"l_partkey % {1 << Z_BITS}").alias("pb"),
        F.expr(f"l_suppkey % {1 << Z_BITS}").alias("sb"),
        F.expr(f"({_z_expr('div')}) div {_Z_BUCKET_W}").alias("bucket"),
    )
    return (
        z.groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("pb").alias("p_min"),
            F.max("pb").alias("p_max"),
            F.min("sb").alias("s_min"),
            F.max("sb").alias("s_max"),
        )
        .orderBy("bucket")
    )


# Rendezvous mixing constants: per-(key, shard) score is a Knuth-style
# multiplicative mix folded into a prime field first so the product
# stays far under 2^63: (1e6-scale residue) * 2.6e9 ~ 2.6e15.
HRW_PRIME = 1_000_003
HRW_MIX = 2_654_435_761
HRW_SHARDS = 8


def _hrw_score_sql(key: str, shard: str) -> str:
    """Score expression: fold (key, shard) into the prime field FIRST,
    then run TWO fold-and-multiply rounds and wrap mod 2^32. The
    pre-fold makes the score non-monotone in the shard index (a naive
    `key * (MIX + shard)` is linear in shard, so argmax degenerates to
    "always the last shard"); the second round kills the residual ramp
    one multiplicative round leaves on sequential keys (measured on
    sequential doc_ids: one round skews shard loads ~3x, two rounds
    hold max/min under 1.6x). The trailing `* 16 + shard` embeds the
    shard id in the low bits so argmax ties are impossible and both
    engines pick the identical winner. Max intermediate
    ~(1e6 * 2.7e9) = 2.7e15 << 2^63."""
    r1 = (
        f"((((({key}) * 8191 + (({shard}) + 1) * 524287) % {HRW_PRIME})"
        f" * {HRW_MIX}) % 4294967296)"
    )
    return f"((({r1} % {HRW_PRIME}) * 48271) % 4294967296) * 16 + ({shard})"


@query(
    "q_shard_rendezvous",
    oracle=f"""
WITH s8 AS (
  SELECT doc_id, n_chars,
         arg_max(sh, {_hrw_score_sql("doc_id", "sh")}) AS shard
  FROM documents, range(0, {HRW_SHARDS}) r(sh)
  GROUP BY doc_id, n_chars
),
s9 AS (
  SELECT doc_id,
         arg_max(sh, {_hrw_score_sql("doc_id", "sh")}) AS shard
  FROM documents, range(0, {HRW_SHARDS + 1}) r(sh)
  GROUP BY doc_id
)
SELECT s8.shard,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(s8.n_chars) AS BIGINT) AS sum_chars,
       CAST(sum(CASE WHEN s8.shard <> s9.shard THEN 1 ELSE 0 END) AS BIGINT)
         AS moved_at_9
FROM s8 JOIN s9 ON s8.doc_id = s9.doc_id
GROUP BY s8.shard
ORDER BY s8.shard
""",
)
def q_shard_rendezvous(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rendezvous (HRW) shard assignment + resize-stability audit.

    Each document goes to `argmax over shards of mix(doc_id, shard)` —
    stateless per-row arithmetic (8 mixes + one max_by over an inline
    8-element array), no shuffle, no shard directory to coordinate.
    The query assigns the corpus at 8 shards AND at 9, then reports
    per-shard balance plus how many docs move on the resize: HRW's
    guarantee is ~n/(n+1) stay put (vs mod-n hashing where ~8/9 of all
    docs relocate). `moved_at_9` makes that contract measurable — at
    100 TB this number IS the re-shard network bill.

    Spark side inlines both assignments per row (posexplode-free:
    max_by over an array of structs stays in whole-stage codegen), so
    the only shuffle is the final 8-key balance groupBy.
    """
    d = load_table(spark, sf_dir, "documents")

    def assign(n_shards: int) -> F.Column:
        scores = [
            F.struct(
                F.expr(_hrw_score_sql("doc_id", str(sh))).alias("score"),
                F.lit(sh).alias("sh"),
            )
            for sh in range(n_shards)
        ]
        return F.array_max(F.array(*scores)).getField("sh")

    assigned = d.select(
        "doc_id",
        "n_chars",
        assign(HRW_SHARDS).alias("shard"),
        assign(HRW_SHARDS + 1).alias("shard9"),
    )
    return (
        assigned.groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("sum_chars"),
            F.sum(
                F.when(F.col("shard") != F.col("shard9"), 1).otherwise(0)
            ).alias("moved_at_9"),
        )
        .orderBy("shard")
    )
