"""Set operations / parallel composition (SURVEY.md §2.6).

``concat`` ≡ ConcatBlockInputStream (order-preserving sequential UNION ALL,
/root/reference/DataStreams/ConcatBlockInputStream.h:13-50); ``union_parallel``
≡ UnionBlockInputStream (parallel drain, arbitrary interleave,
DataStreams/UnionBlockInputStream.h:23-233) — in Spark BOTH are ``unionAll``:
the scheduler runs all input partitions in parallel (the reference's
ParallelInputsProcessor thread pool is the task scheduler, §2.6), and order is
only observable through a subsequent sort anyway.

Intersect/except are absent in the reference; Spark supplies them natively
(capability superset, §2.6 last row).
"""

from __future__ import annotations

from functools import reduce
from typing import Sequence

from pyspark.sql import DataFrame


def concat(dfs: Sequence[DataFrame]) -> DataFrame:
    """Order-preserving UNION ALL of same-schema relations."""
    if not dfs:
        raise ValueError("concat needs at least one input")
    return reduce(lambda a, b: a.unionAll(b), dfs)


def union_parallel(dfs: Sequence[DataFrame]) -> DataFrame:
    """Parallel UNION ALL — identical plan to concat; Spark parallelism is
    native (one task per input partition, no bounded queue to manage)."""
    return concat(dfs)


def intersect(a: DataFrame, b: DataFrame, distinct: bool = True) -> DataFrame:
    return a.intersect(b) if distinct else a.intersectAll(b)


def except_all(a: DataFrame, b: DataFrame, distinct: bool = False) -> DataFrame:
    return a.exceptAll(b) if not distinct else a.subtract(b)
