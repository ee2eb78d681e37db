"""Finalized-plan audit over many registry queries (OPTIMIZATION_r11 #18.6).

The q_dedup_minhash lesson: INITIAL AQE plans can show a shared exchange
that the optimizer later defeats (filter pushdown + project collapse),
so multi-consumer sharing must be audited on the FINALIZED plan — after
execution. This tool executes each query through the noop sink, then
reads the finalized plan and reports the operator counts that matter
for duplicated-work detection:

  scans   = parquet FileScans (a multi-consumer query re-deriving its
            source shows >1 scan of the same table)
  exch    = shuffle Exchanges (hashpartitioning / rangepartitioning)
  reuse   = ReusedExchange nodes (sharing that actually fired)
  bcast   = BroadcastExchanges
  pandas  = MapInPandas / ArrowEvalPython / FlatMapGroupsInPandas chains
  rdd     = ExistingRDD / LogicalRDD reads (pinned intermediates)

Usage: python tools/final_plan_audit.py [q1,q2,...|ALL] [out.tsv]
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from elric_rs_spark import registry  # noqa: E402
from elric_rs_spark.session import get_spark, shuffle_partitions_for  # noqa: E402


def counts(plan: str) -> dict:
    body = plan.split("\n\n", 1)[0]  # node tree only, not the details
    return {
        "scans": len(re.findall(r"Scan parquet", body)),
        # formatted trees name nodes bare ("+- Exchange (13)"); count
        # shuffle exchanges as Exchange nodes that are not Broadcast/Reused
        "exch": len(re.findall(r"(?<!Broadcast)(?<!Reused)Exchange", body)),
        "reuse": len(re.findall(r"ReusedExchange", body)),
        "bcast": len(re.findall(r"BroadcastExchange", body)),
        "pandas": len(
            re.findall(
                r"MapInPandas|ArrowEvalPython|FlatMapGroupsInPandas", body
            )
        ),
        "rdd": len(re.findall(r"Scan ExistingRDD", body)),
    }


def main() -> None:
    qcsv = sys.argv[1] if len(sys.argv) > 1 else "ALL"
    out_path = sys.argv[2] if len(sys.argv) > 2 else None
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    if "SPARK_GRAFT_SHUFFLE_PARTITIONS" not in os.environ:
        os.environ["SPARK_GRAFT_SHUFFLE_PARTITIONS"] = str(
            shuffle_partitions_for(sf_dir)
        )
    registry.load_all()
    if qcsv == "ALL":
        import bench

        names = list(bench.HEADLINE)
    else:
        names = [q.strip() for q in qcsv.split(",") if q.strip()]
    spark = get_spark("elric_rs_spark_plan_audit")
    rows = []
    for name in names:
        try:
            df = registry.QUERIES[name](spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            c = counts(plan)
        except Exception as exc:  # noqa: BLE001 — audit must survive one bad key
            print(f"{name}\tERROR\t{exc}", flush=True)
            continue
        rows.append((name, c))
        print(
            f"{name}\tscans={c['scans']}\texch={c['exch']}\treuse={c['reuse']}"
            f"\tbcast={c['bcast']}\tpandas={c['pandas']}\trdd={c['rdd']}",
            flush=True,
        )
    if out_path:
        with open(out_path, "w") as fh:
            fh.write("query\tscans\texch\treuse\tbcast\tpandas\trdd\n")
            for name, c in rows:
                fh.write(
                    f"{name}\t{c['scans']}\t{c['exch']}\t{c['reuse']}"
                    f"\t{c['bcast']}\t{c['pandas']}\t{c['rdd']}\n"
                )


if __name__ == "__main__":
    main()
