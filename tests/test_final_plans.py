"""FINALIZED-plan gates for the multi-consumer/pinned queries
(VERDICT r11 #10).

The r11 q_dedup_minhash lesson: initial AQE plans can show shared
exchanges that the optimizer later defeats (filter pushdown + project
collapse split the subtrees), so every sharing/pinning claim must be
asserted on the plan AFTER execution. These gates execute each query
through the noop sink and bound the parquet-scan count of the finalized
plan — the single number that regresses when a pin or memo silently
stops covering a branch (each uncovered branch re-derives its source
and adds scans).

Budgets are the EXACT finalized counts measured at sf0.001 on the r12
tree (tools/final_plan_audit.py); they are scale-stable because every
entry counts structural source scans, not AQE partitioning artifacts.
A failure here means a plan regression, not flakiness: investigate with
`python tools/final_plan_audit.py <query>` before touching the budget.
"""

from __future__ import annotations

import re

import pytest

from elric_rs_spark.registry import QUERIES, load_all

load_all()

SF_DIR = "/root/testdata/sf0.001"

# query -> max parquet scans allowed in the FINALIZED plan
FINAL_SCAN_BUDGET = {
    # fully pinned bodies: every source read goes through a session pin
    "q_dedup_minhash_portable": 0,
    "q_dedup_embed_lsh_portable": 0,
    "q_curation_v4": 0,
    "q_curation_v5": 0,
    "q_mmr_diversify": 0,
    "q_dedup_minhash": 0,
    "q_dedup_simhash": 0,
    "q_sim_lsh": 0,
    "q_dedup_embed_lsh": 0,
    "q_graph_triangles": 0,
    "q_agg_approx_portable": 0,
    "q_dedup_clusters_portable": 0,
    "q_sketch_union": 0,
    "q_sketch_intersect": 0,
    "q_dedup_winnow": 0,
    "q_dedup_semantic": 0,
    # bounded honest scans (pruned annotation/report sides)
    "q_pagerank": 1,         # supplier name join; edges ride the pin
    "q_winnow_fingerprint": 1,  # pruned n_grams scan + pinned sel
    "q_substring_dedup": 1,
    "q_ngram_novelty": 1,
    "q_curation_v2": 1,      # one corpus scan into the pinned survivor set
    "q_dedup_cross_source": 2,  # two pruned (doc_id, source) sides
    "q_join_bloom": 4,       # one materialized fact pass + report joins
}


def final_plan(spark, name: str) -> str:
    df = QUERIES[name](spark, SF_DIR)
    df.write.format("noop").mode("overwrite").save()
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


@pytest.mark.parametrize("name", sorted(FINAL_SCAN_BUDGET))
def test_final_plan_scan_budget(spark, name):
    plan = final_plan(spark, name)
    body = plan.split("\n\n", 1)[0]
    scans = len(re.findall(r"Scan parquet", body))
    assert scans <= FINAL_SCAN_BUDGET[name], (
        f"{name}: {scans} parquet scans in the FINALIZED plan exceeds "
        f"budget {FINAL_SCAN_BUDGET[name]} — a pin/memo stopped covering "
        "a branch (see tools/final_plan_audit.py)\n" + body
    )
