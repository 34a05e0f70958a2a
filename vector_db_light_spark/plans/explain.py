"""Helpers to inspect Catalyst physical plans programmatically.

Used by tests to pin the plan shapes that matter at 100 TB: top-k must plan
TakeOrderedAndProject (no global sort), small-side joins must broadcast
(no shuffle of the big table), and parquet scans must show pushed filters /
pruned schemas.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def explain_string(df: DataFrame, mode: str = "formatted") -> str:
    qe = df._jdf.queryExecution()  # noqa: SLF001 — no public accessor
    jvm = df.sparkSession._jvm  # noqa: SLF001
    explain_mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString(mode)
    return qe.explainString(explain_mode)


def assert_in_plan(df: DataFrame, *needles: str) -> None:
    plan = explain_string(df)
    missing = [n for n in needles if n not in plan]
    if missing:
        raise AssertionError(f"plan missing {missing}; got:\n{plan}")


def assert_not_in_plan(df: DataFrame, *needles: str) -> None:
    plan = explain_string(df)
    present = [n for n in needles if n in plan]
    if present:
        raise AssertionError(f"plan unexpectedly contains {present}; got:\n{plan}")
