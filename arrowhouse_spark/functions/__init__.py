"""Function registry: scalar ops, ClickHouse-semantics aggregates, hashing."""

from arrowhouse_spark.functions.scalar import build_scalar
from arrowhouse_spark.functions.aggregates import build_aggregate

__all__ = ["build_scalar", "build_aggregate"]
