"""Scalar-op registry: ``Op`` → Spark ``Column`` expression.

This is the Spark analog of the reference's arrow-compute name mapping
(getFunctionName, /root/reference/YdbModes/SsaProgram.cpp:52-196) and arity
validation (validateOperation, SsaProgram.cpp:198-288). Every op compiles to a
built-in ``pyspark.sql.functions`` expression — JVM-side, inside whole-stage
codegen; there are no Python UDFs on this path.

Semantics notes (parity with arrow compute, SURVEY.md §2.2):
  - DIVIDE on integers: arrow ``divide`` is integer division; Spark ``/`` is
    always double. We match arrow: integral inputs use ``F.try_divide`` +
    truncation toward zero; floats use plain ``/``.
  - Checked arithmetic (*_not_null): arrow raises on overflow/div-zero. Spark's
    declarative equivalent is ``try_add``/... which yields NULL; we expose the
    NULL flavor (run with ``spark.sql.ansi.enabled=true`` to get raising
    semantics engine-wide).
  - MATCH_LIKE/MATCH_SUBSTRING/STARTS_WITH/ENDS_WITH accept
    ``options={"ignore_case": True}`` ≡ MatchSubstringOptions
    (tests/ut_ssa_step.cpp:159-185,574-602).
  - MODULO is disabled in the reference (SsaProgram.cpp:112-121); we provide
    Spark's ``%`` (sign follows dividend, like C/ClickHouse).
"""

from __future__ import annotations

from typing import Any, Callable, Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

from arrowhouse_spark.program import Op


def _like(col: Column, pattern: str, ignore_case: bool) -> Column:
    return col.ilike(pattern) if ignore_case else col.like(pattern)


def _contains(col: Column, pattern: str, ignore_case: bool) -> Column:
    if ignore_case:
        return F.contains(F.lower(col), F.lit(pattern.lower()))
    return F.contains(col, F.lit(pattern))


def _starts_with(col: Column, pattern: str, ignore_case: bool) -> Column:
    if ignore_case:
        return F.startswith(F.lower(col), F.lit(pattern.lower()))
    return col.startswith(pattern)


def _ends_with(col: Column, pattern: str, ignore_case: bool) -> Column:
    if ignore_case:
        return F.endswith(F.lower(col), F.lit(pattern.lower()))
    return col.endswith(pattern)


_CASTS: dict[Op, T.DataType] = {
    Op.CAST_BOOLEAN: T.BooleanType(),
    Op.CAST_INT8: T.ByteType(),
    Op.CAST_INT16: T.ShortType(),
    Op.CAST_INT32: T.IntegerType(),
    Op.CAST_INT64: T.LongType(),
    # unsigned casts follow the engine type policy (types.UNSIGNED_TO_SPARK)
    Op.CAST_UINT8: T.ShortType(),
    Op.CAST_UINT16: T.IntegerType(),
    Op.CAST_UINT32: T.LongType(),
    Op.CAST_UINT64: T.DecimalType(20, 0),
    Op.CAST_FLOAT: T.FloatType(),
    Op.CAST_DOUBLE: T.DoubleType(),
    Op.CAST_BINARY: T.BinaryType(),
    Op.CAST_STRING: T.StringType(),
    Op.CAST_TIMESTAMP: T.TimestampType(),
}

_UNARY: dict[Op, Callable[[Column], Column]] = {
    Op.IS_VALID: lambda c: c.isNotNull(),
    Op.IS_NULL: lambda c: c.isNull(),
    Op.INVERT: lambda c: ~c,
    Op.ABS: F.abs,
    Op.NEGATE: lambda c: -c,
    Op.BINARY_LENGTH: F.octet_length,
    Op.FLOOR: F.floor,
    Op.CEIL: F.ceil,
    Op.SQRT: F.sqrt,
    Op.EXP: F.exp,
    Op.LN: F.log,
    Op.LOG10: F.log10,
    Op.SIN: F.sin,
    Op.COS: F.cos,
    Op.TAN: F.tan,
    Op.SINH: F.sinh,
    Op.COSH: F.cosh,
    Op.TANH: F.tanh,
    Op.ASIN: F.asin,
    Op.ACOS: F.acos,
    Op.ATAN: F.atan,
    Op.SIGN: F.signum,
}

_BINARY: dict[Op, Callable[[Column, Column], Column]] = {
    Op.EQUAL: lambda a, b: a == b,
    Op.NOT_EQUAL: lambda a, b: a != b,
    Op.LESS: lambda a, b: a < b,
    Op.LESS_EQUAL: lambda a, b: a <= b,
    Op.GREATER: lambda a, b: a > b,
    Op.GREATER_EQUAL: lambda a, b: a >= b,
    Op.AND: lambda a, b: a & b,
    Op.OR: lambda a, b: a | b,
    Op.XOR: lambda a, b: a != b,  # boolean xor
    Op.ADD: lambda a, b: a + b,
    Op.SUBTRACT: lambda a, b: a - b,
    Op.MULTIPLY: lambda a, b: a * b,
    Op.MODULO: lambda a, b: a % b,
    Op.ADD_NOT_NULL: F.try_add,
    Op.SUBTRACT_NOT_NULL: F.try_subtract,
    Op.MULTIPLY_NOT_NULL: F.try_multiply,
    Op.DIVIDE_NOT_NULL: F.try_divide,
}

_STRING_PRED: dict[Op, Callable[[Column, str, bool], Column]] = {
    Op.MATCH_SUBSTRING: _contains,
    Op.MATCH_LIKE: _like,
    Op.STARTS_WITH: _starts_with,
    Op.ENDS_WITH: _ends_with,
}


def build_scalar(op: Op, args: Sequence[Column], options: dict[str, Any]) -> Column:
    """Build the Column expression for ``op(*args)`` with ``options``."""
    if op in _CASTS:
        _need(op, args, 1)
        return args[0].cast(_CASTS[op])
    if op in _STRING_PRED:
        _need(op, args, 1)
        pattern = options.get("pattern")
        if pattern is None:
            raise ValueError(f"{op}: options['pattern'] required")
        return _STRING_PRED[op](args[0], pattern, bool(options.get("ignore_case")))
    if op is Op.DIVIDE:
        _need(op, args, 2)
        a, b = args
        if options.get("integer"):
            # arrow integer division truncates toward zero
            return (F.try_divide(a, b)).cast(T.LongType())
        return a / b
    if op is Op.ROUND:
        _need(op, args, 1)
        return F.round(args[0], int(options.get("ndigits", 0)))
    if op is Op.TRUNC:
        _need(op, args, 1)
        # numeric truncation toward zero (arrow `trunc`)
        c = args[0]
        return F.when(c >= 0, F.floor(c)).otherwise(F.ceil(c))
    if op in _UNARY:
        _need(op, args, 1)
        return _UNARY[op](args[0])
    if op in _BINARY:
        _need(op, args, 2)
        return _BINARY[op](args[0], args[1])
    raise ValueError(f"unsupported scalar op: {op}")


def _need(op: Op, args: Sequence[Column], n: int) -> None:
    """Arity validation ≡ validateOperation (SsaProgram.cpp:198-288)."""
    if len(args) != n:
        raise ValueError(f"{op}: expected {n} argument(s), got {len(args)}")
