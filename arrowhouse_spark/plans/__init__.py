from arrowhouse_spark.plans.inspect import (
    PlanCheckError,
    PlanReport,
    broadcast_joins,
    check_plan,
    codegen_stage_count,
    exchange_count,
    plan_text,
    pushed_filters,
    read_schemas,
    report,
)

__all__ = [
    "PlanCheckError",
    "PlanReport",
    "broadcast_joins",
    "check_plan",
    "codegen_stage_count",
    "exchange_count",
    "plan_text",
    "pushed_filters",
    "read_schemas",
    "report",
]
