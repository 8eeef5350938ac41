"""The SSA query-program API — the engine's primary query surface.

Mirrors the reference's ``Program`` / ``ProgramStep`` / ``Assign`` model
(/root/reference/YdbModes/SsaProgram.h:118-289) as plain dataclasses:

  - a ``ProgramStep`` has a *non-decreasing column set* until its projection:
    assignes add named derived columns, filters reference boolean columns by
    name, group-by replaces the batch with keys+aggregates, projection prunes
    (execution order assigns → filters → aggregates → projection,
    SsaProgram.cpp:715-743);
  - an ``Assign`` is (result name, operation, argument column names | constant)
    — exactly the reference's IR of (arrow-compute function name, args, options)
    (SsaProgram.cpp:364-397);
  - ``GroupBy`` with keys and no aggregates is DISTINCT (SsaProgram.h:239,
    Aggregator.cpp:289-300).

The compiler (``arrowhouse_spark.compile``) turns a ``Program`` into DataFrame
transformations, so Catalyst sees ONE declarative plan across all steps and can
push filters into the scan, prune columns, and collapse projections — the
optimizations the reference leaves to the program author (SsaProgram.h:225-233).
"""

from __future__ import annotations

import enum
from dataclasses import dataclass, field
from typing import Any, Sequence


class Op(enum.Enum):
    """Scalar operation inventory ≡ the reference's ``EOperation`` enum
    (/root/reference/YdbModes/SsaProgram.h:10-96) restricted to the enabled set
    (getFunctionName, SsaProgram.cpp:52-196), plus the Spark-free superset the
    survey recommends exposing (§2.2 'Disabled' row).
    """

    # casts (SsaProgram.cpp:56-71)
    CAST_BOOLEAN = "cast_boolean"
    CAST_INT8 = "cast_int8"
    CAST_INT16 = "cast_int16"
    CAST_INT32 = "cast_int32"
    CAST_INT64 = "cast_int64"
    CAST_UINT8 = "cast_uint8"
    CAST_UINT16 = "cast_uint16"
    CAST_UINT32 = "cast_uint32"
    CAST_UINT64 = "cast_uint64"
    CAST_FLOAT = "cast_float"
    CAST_DOUBLE = "cast_double"
    CAST_BINARY = "cast_binary"
    CAST_STRING = "cast_string"
    CAST_TIMESTAMP = "cast_timestamp"
    # null tests (SsaProgram.cpp:73-76)
    IS_VALID = "is_valid"
    IS_NULL = "is_null"
    # comparisons (SsaProgram.cpp:78-89)
    EQUAL = "equal"
    NOT_EQUAL = "not_equal"
    LESS = "less"
    LESS_EQUAL = "less_equal"
    GREATER = "greater"
    GREATER_EQUAL = "greater_equal"
    # boolean (SsaProgram.cpp:91-98) — AND/OR are Kleene-null like Spark's
    INVERT = "invert"
    AND = "and"
    OR = "or"
    XOR = "xor"
    # arithmetic (SsaProgram.cpp:100-111); MODULO declared but disabled in the
    # reference (SsaProgram.h:50, SsaProgram.cpp:112-121) — we enable it (pmod
    # semantics documented in functions.scalar).
    ADD = "add"
    SUBTRACT = "subtract"
    MULTIPLY = "multiply"
    DIVIDE = "divide"
    ABS = "abs"
    NEGATE = "negate"
    MODULO = "modulo"
    # checked arithmetic (SsaProgram.cpp:122-129): arrow `*_checked` raises on
    # overflow / div-by-zero. Spark mapping: try_* returns NULL instead; the
    # compiler exposes the try_* (NULL) flavor — see functions.scalar.
    ADD_NOT_NULL = "add_not_null"
    SUBTRACT_NOT_NULL = "subtract_not_null"
    MULTIPLY_NOT_NULL = "multiply_not_null"
    DIVIDE_NOT_NULL = "divide_not_null"
    # string predicates (SsaProgram.cpp:131-140); ignore_case via options
    # (tests/ut_ssa_step.cpp:159-185,574-602)
    BINARY_LENGTH = "binary_length"
    MATCH_SUBSTRING = "match_substring"
    MATCH_LIKE = "match_like"
    STARTS_WITH = "starts_with"
    ENDS_WITH = "ends_with"
    # rounding (SsaProgram.h:88-91, SsaProgram.cpp:175-182)
    FLOOR = "floor"
    CEIL = "ceil"
    TRUNC = "trunc"
    ROUND = "round"
    # --- superset: declared-but-#if0 math in the reference (SsaProgram.h:68-86),
    # trivially available in Spark (SURVEY.md §2.2 last row)
    SQRT = "sqrt"
    EXP = "exp"
    LN = "ln"
    LOG10 = "log10"
    SIN = "sin"
    COS = "cos"
    TAN = "tan"
    SINH = "sinh"
    COSH = "cosh"
    TANH = "tanh"
    ASIN = "asin"
    ACOS = "acos"
    ATAN = "atan"
    SIGN = "sign"


class AggOp(enum.Enum):
    """Aggregate inventory ≡ the enabled ``AggFunctionId`` set
    (/root/reference/AggregateFunctions/IAggregateFunction.h:454-473; everything
    else there is commented out)."""

    COUNT = "count"
    SUM = "sum"
    AVG = "avg"
    MIN = "min"
    MAX = "max"
    ANY = "any"  # "Some": first value seen, nondeterministic (MinMaxAny.h:527-535)


@dataclass(frozen=True)
class Assign:
    """One derived column: ``name := op(*arguments)`` or ``name := constant``.

    Mirrors the reference ``Assign`` (SsaProgram.h:118-194): ctors take either
    (name, operation, arguments[, options]) or (name, constant-value).
    ``options`` carries e.g. ``{"ignore_case": True}`` for the LIKE family
    (MatchSubstringOptions) or ``{"ndigits": 2}`` for ROUND.
    """

    name: str
    op: Op | None = None
    arguments: tuple[str, ...] = ()
    constant: Any = None
    options: dict[str, Any] = field(default_factory=dict)

    def __post_init__(self) -> None:
        if (self.op is None) == (self.constant is None) and self.constant is None:
            raise ValueError(f"Assign {self.name!r}: need an op or a constant")

    # hashability with a dict field is not needed; dataclass frozen keeps API tidy
    def __hash__(self) -> int:  # pragma: no cover
        return hash((self.name, self.op, self.arguments, repr(self.constant)))


def const(name: str, value: Any) -> Assign:
    """Constant assign — reference ``Assign(name, value)`` ctors
    (SsaProgram.h:135-178)."""
    return Assign(name=name, constant=value)


@dataclass(frozen=True)
class AggregateAssign:
    """One aggregate: result column ``name`` = ``op(column)``.

    ≡ the reference ``AggregateDescription`` {function, arguments, result name}
    (arrow_clickhouse_types.h:144-153). ``column=None`` is the arg-less
    ``count(*)`` form. ``source_type`` optionally tags the argument's logical
    arrow type to apply ClickHouse result widening (types.SUM_RESULT_TYPE).
    """

    name: str
    op: AggOp
    column: str | None = None
    source_type: str | None = None


@dataclass(frozen=True)
class GroupBy:
    """Keys + aggregates. Empty aggregates ⇒ DISTINCT on keys
    (SsaProgram.h:239); empty keys + aggregates ⇒ global aggregation (one row
    even on empty input, Aggregator.cpp:571-577)."""

    keys: tuple[str, ...] = ()
    aggregates: tuple[AggregateAssign, ...] = ()


@dataclass(frozen=True)
class ProgramStep:
    """assignes → filters → group_by → projection (SsaProgram.cpp:715-743).

    ``filters`` are names of boolean columns (typically produced by this step's
    assignes), AND-combined and applied once (SsaProgram.cpp:615-678).
    ``projection`` keeps/reorders the listed columns (SsaProgram.cpp:680-713).
    """

    assignes: tuple[Assign, ...] = ()
    filters: tuple[str, ...] = ()
    group_by: GroupBy | None = None
    projection: tuple[str, ...] = ()


@dataclass(frozen=True)
class Program:
    """An ordered list of steps applied to one input relation
    (Program::applyTo, SsaProgram.h:272-288)."""

    steps: tuple[ProgramStep, ...] = ()
