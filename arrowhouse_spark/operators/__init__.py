"""Operator families (SURVEY.md §2.5-2.6 parity + §'beyond the reference'
data-pipeline operators)."""

from arrowhouse_spark.operators.sort import (
    SortKey,
    sort,
    sort_within_partitions,
    check_sorted,
    is_sorted_and_unique,
    reverse_batches,
)
from arrowhouse_spark.operators.merge import merge_sorted, replace_merge
from arrowhouse_spark.operators.setops import concat, union_parallel, intersect, except_all

__all__ = [
    "SortKey",
    "sort",
    "sort_within_partitions",
    "check_sorted",
    "is_sorted_and_unique",
    "reverse_batches",
    "merge_sorted",
    "replace_merge",
    "concat",
    "union_parallel",
    "intersect",
    "except_all",
]
