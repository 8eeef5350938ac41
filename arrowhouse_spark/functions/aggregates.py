"""ClickHouse-semantics aggregate builders.

The reference's enabled aggregate set is count/sum/avg/min/max/any
(/root/reference/AggregateFunctions/IAggregateFunction.h:454-473). All map to
Spark built-ins; what needs care is result-type widening and null semantics
(SURVEY.md §1.3):

  - sum widens per ClickHouse rules (AggregateFunctionSum.h:281-318): signed →
    int64 (Spark native), unsigned → uint64 → DecimalType(20,0) cast here,
    float → double (native).
  - avg returns double for all numerics (AggregateFunctionAvg.h:48) — Spark
    native for int/float; decimal inputs are cast.
  - when all inputs are NULL, sum/min/max/any return NULL (has()-flag,
    AggregateFunctionSum.h:258-264) — Spark native.
  - count(col) counts non-nulls (AggregateFunctionCount.h:50-61) ≡ F.count(col);
    the arg-less form counts rows ≡ F.count("*"). Reference returns uint64; we
    keep LongType (a count cannot exceed int64) — documented deviation.
  - any ≡ first non-null value seen, nondeterministic
    (AggregateFunctionMinMaxAny.h:527-535,565-590) ≡ F.any_value(ignoreNulls).
  - global aggregate over empty input yields one row (count=0, others NULL,
    Aggregator.cpp:571-577); keyed aggregate over empty input yields zero rows —
    both are Spark-native behaviors (verified in tests/test_aggregates.py).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

from arrowhouse_spark.program import AggOp, AggregateAssign
from arrowhouse_spark.types import SUM_RESULT_TYPE


def ch_count(col: str | None = None) -> Column:
    return F.count(F.col(col)) if col else F.count(F.lit(1))


def ch_sum(col: str, source_type: str | None = None) -> Column:
    c = F.sum(F.col(col))
    if source_type is not None:
        want = SUM_RESULT_TYPE.get(source_type)
        if want is not None:
            return c.cast(want)
    return c


def ch_avg(col: str) -> Column:
    return F.avg(F.col(col)).cast(T.DoubleType())


def ch_min(col: str) -> Column:
    return F.min(F.col(col))


def ch_max(col: str) -> Column:
    return F.max(F.col(col))


def ch_any(col: str) -> Column:
    return F.any_value(F.col(col), True)


def build_aggregate(agg: AggregateAssign) -> Column:
    """Build the aliased Column for one ``AggregateAssign``."""
    op = agg.op
    if op is AggOp.COUNT:
        c = ch_count(agg.column)
    elif op is AggOp.SUM:
        if agg.column is None:
            raise ValueError("sum requires a column")
        c = ch_sum(agg.column, agg.source_type)
    elif op is AggOp.AVG:
        if agg.column is None:
            raise ValueError("avg requires a column")
        c = ch_avg(agg.column)
    elif op is AggOp.MIN:
        c = ch_min(_req(agg))
    elif op is AggOp.MAX:
        c = ch_max(_req(agg))
    elif op is AggOp.ANY:
        c = ch_any(_req(agg))
    else:  # pragma: no cover
        raise ValueError(f"unsupported aggregate: {op}")
    return c.alias(agg.name)


def _req(agg: AggregateAssign) -> str:
    if agg.column is None:
        raise ValueError(f"{agg.op} requires a column")
    return agg.column
