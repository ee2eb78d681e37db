"""Physical-plan inspection utilities — the feedback loop for the
"would this survive 100x scale" question. Used by tests/test_plans.py to
hold every registered query to plan-level invariants (broadcast where
expected, filters pushed to the scan, no row-at-a-time Python, no
cartesian products), and at the REPL for `.explain`-style iteration.
"""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import DataFrame

# Arrow-batched Python operators — the sanctioned slow path
ARROW_PYTHON_NODES = (
    "ArrowEvalPython",
    "MapInPandas",
    "FlatMapGroupsInPandas",
    "FlatMapGroupsInPandasWithState",
)


def physical_plan(df: DataFrame) -> str:
    """Executed (post-AQE-planning) physical plan as text."""
    return df._jdf.queryExecution().executedPlan().toString()


def formatted_plan(df: DataFrame) -> str:
    """The `.explain('formatted')` output, captured as a string."""
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def has_node(df: DataFrame, node: str) -> bool:
    return node in physical_plan(df)


def uses_broadcast_join(df: DataFrame) -> bool:
    p = physical_plan(df)
    return "BroadcastHashJoin" in p or "BroadcastNestedLoopJoin" in p


def uses_row_python(df: DataFrame) -> bool:
    """True if the plan contains row-at-a-time Python (BatchEvalPython) —
    the unsanctioned slow path; Arrow-batched nodes don't count."""
    return "BatchEvalPython" in physical_plan(df)


def uses_cartesian(df: DataFrame) -> bool:
    return "CartesianProduct" in physical_plan(df)


def uses_whole_stage_codegen(df: DataFrame) -> bool:
    """`executedPlan().toString()` marks codegen stages with `*(N) ` node
    prefixes (the literal 'WholeStageCodegen' only appears in other render
    modes)."""
    p = physical_plan(df)
    return "*(" in p or "WholeStageCodegen" in p


def pushed_filters(df: DataFrame) -> list[str]:
    """PushedFilters entries from every scan in the formatted plan."""
    out: list[str] = []
    for line in formatted_plan(df).splitlines():
        line = line.strip()
        if line.startswith("PushedFilters:"):
            body = line.split(":", 1)[1].strip().strip("[]")
            out.extend(s.strip() for s in body.split(",") if s.strip())
    return out


def read_schemas(df: DataFrame) -> list[str]:
    """ReadSchema entries (one per file scan) — what the scan actually
    reads; a scan reading all columns for a narrow projection is a
    column-pruning failure."""
    return [
        line.strip().split(":", 1)[1].strip()
        for line in formatted_plan(df).splitlines()
        if line.strip().startswith("ReadSchema:")
    ]


def count_shuffles(df: DataFrame) -> int:
    """TRUE shuffle exchanges (hash/single/range partitioning) in the
    physical plan — BroadcastExchange and ReusedExchange excluded. The
    number that must stay bounded for a plan to survive 1000 executors."""
    import re

    return len(
        re.findall(
            r"Exchange (hashpartitioning|SinglePartition|rangepartitioning)",
            physical_plan(df),
        )
    )


def broadcast_exchange_inputs(df: DataFrame) -> list[list[str]]:
    """Column-name lists of every BroadcastExchange node's input, parsed
    from the formatted plan's detail sections. The 100 TB gate built on
    this: NO broadcast may carry a per-row corpus column (a per-vector
    or per-doc id) — a broadcast table must be dimension-, aggregate-,
    or constant-sized, never corpus-proportional (the round-9 embed-LSH
    norm-broadcast cliff, VERDICT r9 #3)."""
    import re

    out: list[list[str]] = []
    lines = formatted_plan(df).splitlines()
    for i, line in enumerate(lines):
        if not re.match(r"^\(\d+\) BroadcastExchange", line.strip()):
            continue
        for j in range(i + 1, min(i + 4, len(lines))):
            detail = lines[j].strip()
            if detail.startswith("Input"):
                body = detail.split(":", 1)[1].strip().strip("[]")
                cols = [
                    re.sub(r"#\d+L?", "", c.strip())
                    for c in body.split(",")
                    if c.strip()
                ]
                out.append(cols)
                break
    return out
