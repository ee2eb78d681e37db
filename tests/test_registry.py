"""Registration-order contract tests.

The driver grades EXACTLY the first 50 queries in registration order
(verified rounds 1-2: set(first-50) == set(graded rows)), so iteration
order of registry.QUERIES is part of the correctness surface: a module
refactor that reorders imports must not silently evict a query from the
grading window.
"""

from __future__ import annotations

from elric_rs_spark import registry

registry.load_all()


def test_grading_order_names_are_registered():
    missing = [q for q in registry.GRADING_ORDER if q not in registry.QUERIES]
    assert not missing, f"GRADING_ORDER references unknown queries: {missing}"


def test_grading_order_has_no_duplicates():
    seen = set()
    dups = [q for q in registry.GRADING_ORDER if q in seen or seen.add(q)]
    assert not dups, f"duplicate GRADING_ORDER entries: {dups}"


def test_registry_iteration_leads_with_grading_order():
    ordered = list(registry.QUERIES)
    n = len(registry.GRADING_ORDER)
    assert ordered[:n] == registry.GRADING_ORDER


def test_first_50_covers_never_graded_round5_additions():
    """The round-6 grading window must contain every query without a
    green driver row in ANY round (VERDICT r05 next-round #1 — the 16
    round-5 additions that registered past the round-5 window), and
    every slot must be oracle-backed (no slots on rows-only keys; their
    value contracts are carried by graded portable twins)."""
    front = list(registry.QUERIES)[:50]
    must_grade = {
        "q_top_supplier", "q_sketch_union", "q_sketch_quantile",
        "q_join_asof_forward", "q_pack_padding", "q_token_pretokenize",
        "q_winnow_fingerprint", "q_dedup_winnow",
        "q_sim_ivf_trained_portable", "q_mmr_diversify",
        "q_dedup_embed_lsh_portable", "q_dedup_cross_source",
        "q_quality_logit", "q_quality_calibration",
        "q_token_budget_mix", "q_curation_v3",
    }
    evicted = must_grade - set(front)
    assert not evicted, f"evicted from the 50-query grading window: {evicted}"
    rows_only = [q for q in front if q not in registry.ORACLES]
    assert not rows_only, f"rows-only keys occupy grading slots: {rows_only}"


def test_every_query_has_callable_and_oracle_alignment():
    for name, fn in registry.QUERIES.items():
        assert callable(fn), name
    stray = set(registry.ORACLES) - set(registry.QUERIES)
    assert not stray, f"oracles without queries: {stray}"
