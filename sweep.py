"""Local replica of the driver's full correctness sweep (VERDICT r01 #2).

Runs EVERY `queries()` entry in registration order — exactly the order the
driver grades in — on a vanilla SparkSession at the gate scale (sf0.01 by
default), timing construct+collect per query. The round-1 driver sweep was
cut off by its time budget right after q_typed_cast; this harness is the
feedback loop for keeping the whole set inside any budget: contract keys
first (registry.load_all order) and per-query cold cost low.

Usage: python sweep.py [sf_dir]   -> one JSON line + per-query breakdown.
"""

from __future__ import annotations

import json
import sys
import time


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entry

    queries = entry.queries()  # registration order (dicts preserve it)
    t_all = time.monotonic()
    per: dict[str, float] = {}
    for name, fn in queries.items():
        t0 = time.monotonic()
        n = len(fn(spark, sf_dir).collect())
        per[name] = round(time.monotonic() - t0, 2)
        print(f"{per[name]:7.2f}s {name} ({n} rows)", file=sys.stderr, flush=True)
    total = round(time.monotonic() - t_all, 2)
    print(json.dumps({"metric": "sweep_all_queries", "value": total,
                      "unit": "sec", "n_queries": len(per), "sf_dir": sf_dir,
                      "queries": per}))


if __name__ == "__main__":
    main()
