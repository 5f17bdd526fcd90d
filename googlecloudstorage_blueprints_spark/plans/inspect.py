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


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in explain_str(df) or (
        "BroadcastNestedLoopJoin" in explain_str(df)
    )


def shuffle_count(df: DataFrame) -> int:
    """Number of Exchange operators in the physical plan."""
    return len(re.findall(r"\bExchange\b", explain_str(df)))
