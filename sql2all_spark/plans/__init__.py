"""Physical-plan introspection helpers.

The reference has no plan IR at all (SURVEY.md §3: SQL string → driver rows
→ Arrow batches); in this engine Catalyst owns planning, and these helpers
make its decisions inspectable/assertable — used by the plan-audit tests to
pin scan pushdown, broadcast choices, and aggregation shape, and available
to users debugging a slow query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def physical_plan(df: DataFrame) -> str:
    """The final (post-AQE-planning) physical plan as text."""
    return df._jdf.queryExecution().executedPlan().toString()


def optimized_plan(df: DataFrame) -> str:
    """Catalyst's optimized logical plan as text."""
    return df._jdf.queryExecution().optimizedPlan().toString()


def pushed_filters(df: DataFrame) -> list[str]:
    """Every ``PushedFilters: [...]`` block found in the scan nodes."""
    plan = physical_plan(df)
    out = []
    for seg in plan.split("PushedFilters: [")[1:]:
        out.append(seg.split("]", 1)[0])
    return out


def scan_schemas(df: DataFrame) -> list[str]:
    """Every ``ReadSchema: ...`` scan projection — what actually gets read."""
    plan = physical_plan(df)
    return [seg.split("\n", 1)[0].strip() for seg in plan.split("ReadSchema: ")[1:]]


def join_kinds(df: DataFrame) -> dict[str, int]:
    """Counts of each physical join operator in the plan."""
    plan = physical_plan(df)
    kinds = [
        "BroadcastHashJoin",
        "SortMergeJoin",
        "ShuffledHashJoin",
        "BroadcastNestedLoopJoin",
        "CartesianProduct",
    ]
    return {k: plan.count(k) for k in kinds if plan.count(k)}


def shuffle_count(df: DataFrame) -> int:
    """Number of shuffle exchanges — the scale-limiting resource."""
    return physical_plan(df).count("Exchange hashpartitioning") + physical_plan(
        df
    ).count("Exchange rangepartitioning")
