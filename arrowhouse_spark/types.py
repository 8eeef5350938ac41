"""Type policy: Arrow/ClickHouse types → Spark SQL types.

The reference operates on Arrow types including unsigned integers
(/root/reference/arrow_clickhouse_types.h:74-139, YdbModes/switch_type.h:19-96).
Spark has no unsigned types, so this module fixes ONE policy (SURVEY.md §7
"What's hard" #1, FIXTURES.md preamble):

    uint8  -> ShortType       (always fits)
    uint16 -> IntegerType     (always fits)
    uint32 -> LongType        (always fits)
    uint64 -> DecimalType(20,0)  (full range; LongType would overflow > 2^63-1)

Aggregate result-type widening follows ClickHouse rules, not Spark defaults
(/root/reference/AggregateFunctions/AggregateFunctionSum.h:281-318,
AggregateFunctionAvg.h:48, AggregateFunctionCount.h:32-35):

    sum(int8..int64)  -> int64      (Spark native: sum(integral) -> LongType — match)
    sum(uint8..32)    -> uint64     -> DecimalType(20,0) via explicit cast
    sum(float/double) -> double     (Spark native — match)
    sum(duration)     -> duration   (Spark: sum over DayTimeIntervalType — native)
    avg(numeric)      -> double     (Spark native for integral/float — match;
                                     Spark avg(decimal) returns decimal → cast)
    count             -> uint64     (we keep Spark's LongType; a count cannot
                                     overflow int64 in practice — documented deviation)
    min/max/any       -> input type (Spark native — match)
"""

from __future__ import annotations

from pyspark.sql import types as T

# Arrow type name -> Spark type for the unsigned policy.
UNSIGNED_TO_SPARK: dict[str, T.DataType] = {
    "uint8": T.ShortType(),
    "uint16": T.IntegerType(),
    "uint32": T.LongType(),
    "uint64": T.DecimalType(20, 0),
}

# Spark type a ClickHouse `sum` result should have, keyed by *source* logical type.
SUM_RESULT_TYPE: dict[str, T.DataType] = {
    "int8": T.LongType(),
    "int16": T.LongType(),
    "int32": T.LongType(),
    "int64": T.LongType(),
    "uint8": T.DecimalType(20, 0),
    "uint16": T.DecimalType(20, 0),
    "uint32": T.DecimalType(20, 0),
    "uint64": T.DecimalType(20, 0),
    "float32": T.DoubleType(),
    "float64": T.DoubleType(),
}

#: Arrow type names the reference's type switch dispatches on
#: (YdbModes/switch_type.h:19-96). Nested types fall through to unsupported
#: there (:79-93) and are likewise out of parity scope here — though Spark
#: supports them natively as a superset.
SUPPORTED_ARROW_TYPES = frozenset(
    {
        "bool",
        "int8",
        "int16",
        "int32",
        "int64",
        "uint8",
        "uint16",
        "uint32",
        "uint64",
        "float16",
        "float32",
        "float64",
        "binary",
        "large_binary",
        "fixed_size_binary",
        "utf8",
        "large_utf8",
        "timestamp[us]",
        "duration[us]",
        "date32",
        "date64",
        "time32",
        "time64",
        "month_interval",
        "decimal128",
    }
)


def spark_type_for(arrow_name: str) -> T.DataType:
    """Map an arrow type name (as used by the reference) to the Spark type."""
    mapping: dict[str, T.DataType] = {
        "bool": T.BooleanType(),
        "int8": T.ByteType(),
        "int16": T.ShortType(),
        "int32": T.IntegerType(),
        "int64": T.LongType(),
        "float16": T.FloatType(),
        "float32": T.FloatType(),
        "float64": T.DoubleType(),
        "binary": T.BinaryType(),
        "large_binary": T.BinaryType(),
        "fixed_size_binary": T.BinaryType(),
        "utf8": T.StringType(),
        "large_utf8": T.StringType(),
        "timestamp[us]": T.TimestampType(),
        "duration[us]": T.DayTimeIntervalType(),
        "date32": T.DateType(),
        "date64": T.DateType(),
        # Spark has no time-of-day type; the reference uses time32/time64 for
        # compare/sort only (YdbModes/switch_type.h:58-69), so an
        # order-preserving integral count-since-midnight (in the arrow type's
        # own unit — values are non-negative and bounded by one day, so
        # ordering is exactly the time ordering) carries full parity for
        # every operation the reference performs on them.
        "time32": T.IntegerType(),
        "time64": T.LongType(),
        "month_interval": T.YearMonthIntervalType(),
        "decimal128": T.DecimalType(38, 10),
        **UNSIGNED_TO_SPARK,
    }
    if arrow_name not in mapping:
        raise TypeError(f"unsupported arrow type for engine: {arrow_name}")
    return mapping[arrow_name]
