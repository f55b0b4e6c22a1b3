"""Plan-inspection helpers: assert the physical plan is the one we want
(pushdown reached the scan, dims broadcast, codegen wide) — used by
tests and the perf harness. These are assertions about Catalyst
output, not plan rewrites (the optimizer needs no help when the query
is declarative — SURVEY.md section 4.3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def physical_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), "formatted"
    )


def assert_pushed_filters(df: DataFrame, *fragments: str) -> None:
    """Assert every fragment appears in a PushedFilters list of the scan."""
    plan = physical_plan(df)
    import re

    pushed = " ".join(re.findall(r"PushedFilters: \[[^\]]*\]", plan))
    for frag in fragments:
        assert frag in pushed, f"filter {frag!r} not pushed to scan; plan:\n{plan}"


def assert_broadcast_join(df: DataFrame, expect: int = 1) -> None:
    plan = physical_plan(df)
    n = plan.count("BroadcastHashJoin") + plan.count("BroadcastNestedLoopJoin")
    assert n >= expect, f"expected >= {expect} broadcast joins; plan:\n{plan}"


def assert_no_cartesian(df: DataFrame) -> None:
    plan = physical_plan(df)
    assert "CartesianProduct" not in plan, f"cartesian product in plan:\n{plan}"


def codegen_stage_count(df: DataFrame) -> int:
    """Number of WholeStageCodegen subtrees (codegen explain mode; the
    formatted mode hides codegen annotation under AQE)."""
    text = df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), "codegen"
    )
    import re

    m = re.search(r"Found (\d+) WholeStageCodegen", text)
    return int(m.group(1)) if m else 0
