"""Plan inspection helpers: make "did Catalyst do what we want?" checkable.

Used by tests and by humans iterating on operators — asserting that filters
reached the scan (``PushedFilters``), that small dims broadcast, and counting
shuffles (``Exchange`` nodes), per the scale checklist in SURVEY §4.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), mode
    )


def audit_plan(df: DataFrame) -> dict[str, object]:
    """Summarize scale-relevant physical-plan facts."""
    plan = explain_str(df, "formatted")
    # codegen spans only show in simple mode
    simple = explain_str(df, "simple")
    return {
        "num_exchanges": plan.count("Exchange"),
        "num_broadcasts": plan.count("BroadcastExchange"),
        "has_pushed_filters": "PushedFilters: [" in plan and "PushedFilters: []" not in plan,
        "wholestage_codegen": "WholeStageCodegen" in simple,
        "plan": plan,
    }
