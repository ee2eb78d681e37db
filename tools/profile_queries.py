"""Per-query construct/execute phase profile in ONE warm JVM.

Usage: python tools/profile_queries.py q1,q2,... [reps]
For each query: runs `reps` construct+noop-execute cycles and prints
per-rep times. Rep0 includes that query's first-execution costs (plan
codegen, JIT, Python worker spawn); the later reps approximate the
steady-state data cost. The DIFFERENCE is per-query fixed overhead —
the part a 100 TB run amortizes but a bench row pays in full.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from elric_rs_spark import registry  # noqa: E402
from elric_rs_spark.session import get_spark, shuffle_partitions_for  # noqa: E402


def main() -> None:
    qcsv = sys.argv[1]
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    if "SPARK_GRAFT_SHUFFLE_PARTITIONS" not in os.environ:
        os.environ["SPARK_GRAFT_SHUFFLE_PARTITIONS"] = str(
            shuffle_partitions_for(sf_dir)
        )
    registry.load_all()
    spark = get_spark("elric_rs_spark_profile")
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()
    for name in [q.strip() for q in qcsv.split(",") if q.strip()]:
        row = [name]
        for rep in range(reps):
            t0 = time.perf_counter()
            df = registry.QUERIES[name](spark, sf_dir)
            t1 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            t2 = time.perf_counter()
            row.append(f"r{rep}: c={t1 - t0:.2f} x={t2 - t1:.2f}")
        print("  ".join(row), flush=True)


if __name__ == "__main__":
    main()
