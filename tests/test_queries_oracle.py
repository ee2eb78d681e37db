"""Every registered query runs; every oracle-backed query matches DuckDB.

This mirrors the driver's t2 gate (sf0.01) but runs at sf0.001 by default
for speed; set ORACLE_SF_DIR=/root/testdata/sf0.01 for the full-fidelity
pass (done before each commit of new queries).
"""

from __future__ import annotations

import os

import pytest

from elric_rs_spark import registry

registry.load_all()

SF_DIR = os.environ.get("ORACLE_SF_DIR", "/root/testdata/sf0.001")

from tests.oracle_harness import compare, hash_risky_columns  # noqa: E402

ALL_QUERIES = sorted(registry.QUERIES)
ORACLE_QUERIES = sorted(registry.ORACLES)
ROWS_ONLY = sorted(set(ALL_QUERIES) - set(ORACLE_QUERIES))


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_query_matches_oracle(spark, name):
    df = registry.QUERIES[name](spark, SF_DIR)
    problems = compare(name, df, registry.ORACLES[name], SF_DIR)
    assert not problems, "\n".join(problems)


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_query_runs(spark, name):
    """The driver canonicalizes rows-only output too (pandas sort_values
    over every column), so even without an oracle the schema must be
    hash-friendly — r3's q_dedup_clusters ERR'd on an array column
    despite being rows-only."""
    df = registry.QUERIES[name](spark, SF_DIR)
    risky = [
        r
        for r in hash_risky_columns(df)
        # binary payload columns are the multimodal queries' whole point;
        # the driver hex-encodes bytes fine — only container types crash
        if "unhashable" in r
    ]
    assert not risky, f"{name}: driver-canonicalizer-unsafe columns {risky}"
    rows = df.collect()
    assert rows is not None
    assert len(df.columns) > 0
