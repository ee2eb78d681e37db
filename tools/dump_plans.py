"""Dump .explain("formatted") for a list of registry queries to files.

Usage: python tools/dump_plans.py <out_dir> <suffix> q1,q2,... [--final]
Writes <out_dir>/<query>_<suffix>.txt for each query. Uses the same
session/shuffle-partition setup as bench.py so the captured plan is the
one the driver's bench would execute. Default is the initial AQE plan
(no execution). With --final the query is executed (collect) first so
the AdaptiveSparkPlan is finalized — ReusedExchange / AQEShuffleRead /
runtime join rewrites only appear in the final plan.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from elric_rs_spark import registry  # noqa: E402
from elric_rs_spark.session import get_spark, shuffle_partitions_for  # noqa: E402


def main() -> None:
    final = "--final" in sys.argv
    args = [a for a in sys.argv[1:] if a != "--final"]
    out_dir, suffix, qcsv = args[0], args[1], args[2]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    if "SPARK_GRAFT_SHUFFLE_PARTITIONS" not in os.environ:
        os.environ["SPARK_GRAFT_SHUFFLE_PARTITIONS"] = str(
            shuffle_partitions_for(sf_dir)
        )
    registry.load_all()
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("elric_rs_spark_plans")
    for name in [q.strip() for q in qcsv.split(",") if q.strip()]:
        df = registry.QUERIES[name](spark, sf_dir)
        if final:
            df.collect()  # finalize the AdaptiveSparkPlan in df's own QueryExecution
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path} ({len(plan)} chars)")


if __name__ == "__main__":
    main()
