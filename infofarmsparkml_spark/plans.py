"""Physical-plan inspection helpers — used by the plan-shape tests
(SURVEY.md §5.7) to assert that Catalyst produced the plan we'd
want at 100 TB: filters pushed into the parquet scan, columns
pruned, small sides broadcast, top-k as TakeOrderedAndProject,
wide WholeStageCodegen spans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    """The explain output as a string (df.explain prints JVM-side)."""
    jdf = df._jdf
    jvm = df.sparkSession._jvm
    explain_mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString(mode)
    return jdf.queryExecution().explainString(explain_mode)


def assert_in_plan(df: DataFrame, *needles: str, mode: str = "formatted") -> str:
    plan = explain_str(df, mode)
    missing = [n for n in needles if n not in plan]
    if missing:
        raise AssertionError(
            f"plan is missing {missing}; got:\n{plan[:4000]}"
        )
    return plan
