"""Bucketed-table co-located joins — the shuffle-elimination layout for
repeated fact-fact joins at 100 TB.

The reference has no relational layer, so this is pure beyond-reference
scale engineering: a lineitem ⋈ orders join shuffles BOTH fact tables on
orderkey every single run. When the join is run repeatedly (daily marts,
incremental backfills), the standard Spark answer is to pay the shuffle
ONCE at write time: `bucketBy(N, key)` + `sortBy(key)` persists each
table pre-hash-partitioned into N buckets of the join key, and every
subsequent join planner-matches the two bucket layouts — SortMergeJoin
with ZERO Exchange on either side (and with sortBy, zero Sort).

Rules that make bucket joins actually fire (all encoded here, all
pinned by tests/test_plans.py::TestBucketedJoin):

- both sides bucketed on the JOIN KEY with the SAME bucket count
  (mismatched counts read as unbucketed in Spark <3.1; compatible
  multiples still cost a one-sided coalesce);
- `spark.sql.sources.bucketing.enabled` (default true) and
  autoBroadcastJoinThreshold not swallowing the join (a broadcast join
  ignores bucketing — fine, but then bucketing bought nothing);
- the scan must read the bucket column un-transformed (f(key) = key);
- bucket pruning: an equality filter on the bucket key prunes to ONE
  bucket file per partition — visible as `Bucketed: true, SelectedBucket`
  in the scan node.

At 100 TB: N buckets ≈ table_size / target_partition_size (e.g. 100 TB /
256 MB ≈ 400k buckets is too many files — in practice bucket the JOINED
GRAIN, e.g. 4096-32768 buckets, and let each bucket hold multiple
row-groups; AQE cannot split a skewed bucket, so bucket counts must keep
the hottest key's bucket under executor memory).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    num_buckets: int,
    sort: bool = True,
) -> None:
    """Persist `df` as a managed parquet table bucketed (and bucket-sorted)
    on `key`. The one-time shuffle paid here is the shuffle every future
    join on `key` skips."""
    writer = df.write.mode("overwrite").format("parquet").bucketBy(num_buckets, key)
    if sort:
        writer = writer.sortBy(key)
    writer.saveAsTable(table)


def bucketed_tables(
    spark: SparkSession,
    sf_dir: str,
    num_buckets: int = 8,
    prefix: str = "bkt",
) -> tuple[str, str]:
    """Materialize lineitem + orders bucketed on orderkey (idempotent per
    session); returns the two table names."""
    from elric_rs_spark.tables import load_table

    li_t, o_t = f"{prefix}_lineitem", f"{prefix}_orders"
    if not spark.catalog.tableExists(li_t):
        write_bucketed(
            load_table(spark, sf_dir, "lineitem").select(
                "l_orderkey", "l_quantity", "l_extendedprice", "l_discount"
            ),
            li_t,
            "l_orderkey",
            num_buckets,
        )
    if not spark.catalog.tableExists(o_t):
        write_bucketed(
            load_table(spark, sf_dir, "orders").select(
                "o_orderkey", "o_orderpriority", "o_totalprice"
            ),
            o_t,
            "o_orderkey",
            num_buckets,
        )
    return li_t, o_t


def colocated_join(spark: SparkSession, li_t: str, o_t: str) -> DataFrame:
    """The repeated-run join that bucketing pays for: lineitem ⋈ orders
    on orderkey with a per-priority revenue rollup. With both sides
    bucketed+sorted on the key, the plan is SortMergeJoin with no
    Exchange and no Sort below it."""
    from pyspark.sql import functions as F

    li = spark.table(li_t)
    o = spark.table(o_t)
    cents = F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100).cast(
        "long"
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.sum(cents).alias("revenue_cents"),
        )
    )
