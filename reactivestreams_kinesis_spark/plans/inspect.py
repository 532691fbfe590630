"""Physical plan inspection helpers (SURVEY.md §4).

The reference has no planner (§4.1 — its only planning is three constants);
our planner is Catalyst, so "is this operator scale-ready?" is a property
of the physical plan: filters pushed to the scan, dimensions broadcast,
no stray exchanges, codegen fused. These helpers make those properties
assertable in tests instead of hoped-for — the planner is part of the
tested surface.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def explain_string(df: DataFrame, mode: str = "formatted") -> str:
    """The text ``df.explain(mode)`` would print, as a value."""
    spark = df.sparkSession
    return spark._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), mode
    )


def pushed_filters(df: DataFrame) -> list[str]:
    """All PushedFilters entries across the plan's parquet scans."""
    plan = explain_string(df, "formatted")
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", plan):
        out.extend(f.strip() for f in m.group(1).split(",") if f.strip())
    return out


def read_schemas(df: DataFrame) -> list[str]:
    """ReadSchema clauses — what each scan actually reads (column pruning)."""
    plan = explain_string(df, "formatted")
    return [m.group(1) for m in re.finditer(r"ReadSchema: (struct<[^>]*>)", plan)]


def has_operator(df: DataFrame, operator: str) -> bool:
    """Whether the physical plan contains the named operator (e.g.
    'BroadcastHashJoin', 'TakeOrderedAndProject', 'WindowGroupLimit')."""
    return operator in explain_string(df, "formatted")


def count_operator(df: DataFrame, operator: str) -> int:
    return explain_string(df, "formatted").count(operator)


def count_exchanges(df: DataFrame) -> int:
    """Number of shuffle exchanges in the plan — THE scale cost driver.
    Broadcast exchanges are excluded (they ship the small side only).

    Uses simple-mode explain: formatted mode renders exchanges as
    '(n) Exchange' with the partitioning on a separate Arguments line, so
    grepping it for 'Exchange hashpartitioning' silently matches nothing
    (found the hard way — the original formatted-mode version always
    returned 0)."""
    plan = explain_string(df, "simple")
    return len(re.findall(r"Exchange (?:hashpartitioning|rangepartitioning)", plan))
