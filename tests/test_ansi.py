"""ANSI-mode sweep (VERDICT r01 next #7).

Spark 4 defaults `spark.sql.ansi.enabled=true`, so the entire oracle suite
already runs under ANSI semantics — strict casts, overflow errors. This
sweep proves the OTHER direction: every registered query returns the same
result with ANSI off (legacy permissive casts), i.e. no query silently
depends on either mode's cast/overflow behavior. Queries use try_cast at
every string->typed boundary (types.cast_expr), which is mode-independent;
this is the regression gate for that invariant.
"""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.001"

QUERIES = entrymod.queries()


def _rows(df):
    return sorted(repr(r) for r in df.collect())


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_same_result_both_ansi_modes(spark, name):
    q = QUERIES[name]
    assert spark.conf.get("spark.sql.ansi.enabled") == "true"  # Spark 4 default
    ansi_rows = _rows(q(spark, SF_DIR))
    spark.conf.set("spark.sql.ansi.enabled", "false")
    try:
        legacy_rows = _rows(q(spark, SF_DIR))
    finally:
        spark.conf.set("spark.sql.ansi.enabled", "true")
    assert ansi_rows == legacy_rows, f"{name}: ANSI/legacy divergence"
