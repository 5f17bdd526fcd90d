"""Physical-plan inspection: assert the plan you wanted, not just the
answer you got.

At 100 TB the difference between a pushed filter and a post-scan filter, or
a broadcast and a shuffle join, is the whole job.  These helpers parse
``.explain("formatted")`` output so tests can pin plan shape (see
tests/test_plans.py): PushedFilters reach the scan, projections prune the
read schema, small dims broadcast, and shuffle counts stay at the expected
minimum.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), mode
    )


def pushed_filters(df: DataFrame) -> list[str]:
    """All PushedFilters entries across scans in the formatted plan."""
    text = explain_str(df)
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[(.*?)\]", text):
        body = m.group(1).strip()
        if body:
            out.extend(p.strip() for p in body.split(","))
    return out


def read_schema_columns(df: DataFrame) -> list[list[str]]:
    """Column lists actually read by each parquet scan (pruning check)."""
    text = explain_str(df)
    scans: list[list[str]] = []
    for m in re.finditer(r"ReadSchema: struct<(.*?)>", text):
        body = m.group(1)
        scans.append([c.split(":")[0].strip() for c in body.split(",") if c])
    return scans


def op_count(df: DataFrame, operator: str) -> int:
    """Count physical-plan operators by their formatted-mode detail header
    ``(n) OperatorName`` — the tree section would double-count."""
    return len(re.findall(rf"\(\d+\) {operator}\b", explain_str(df)))


def codegen_span_count(df: DataFrame) -> int:
    """Distinct WholeStageCodegen spans (``*(n)`` markers) in the final
    physical plan.  Executes the DataFrame: under AQE the plan is finalized
    lazily and the pre-execution explain shows no codegen nodes at all.
    Spans should be wide and few — every break is a codegen boundary the
    row-based fallback pays for at scale."""
    df.collect()
    text = explain_str(df, "simple").split("== Initial Plan ==")[0]
    return len(set(re.findall(r"\*\((\d+)\)", text)))


def has_broadcast_join(df: DataFrame) -> bool:
    return (
        op_count(df, "BroadcastHashJoin") > 0
        or op_count(df, "BroadcastNestedLoopJoin") > 0
    )


def shuffle_count(df: DataFrame) -> int:
    """Number of shuffle Exchange operators in the physical plan
    (BroadcastExchange not included — broadcasts are the point)."""
    return op_count(df, "Exchange")
