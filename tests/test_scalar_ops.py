"""Scalar-op matrix mirroring ut_ssa_step.cpp FilterTest chains (:120-157):
binary-op chains res1 = op1(x,y); res2 = op2(res1,z) per type, checked
arithmetic NULL-flavor, null tests, boolean ops, math superset."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import types as T

from arrowhouse_spark import Assign, Op, Program, ProgramStep, apply_program
from arrowhouse_spark.functions.scalar import build_scalar
from pyspark.sql import functions as F


def _chain(spark, rows, schema, op1, op2):
    df = spark.createDataFrame(rows, schema)
    prog = Program(
        steps=(
            ProgramStep(
                assignes=(
                    Assign("res1", op1, ("x", "y")),
                    Assign("res2", op2, ("res1", "z")),
                ),
                projection=("res1", "res2"),
            ),
        )
    )
    return apply_program(df, prog).collect()


@pytest.mark.parametrize(
    "op1,op2,expected",
    [
        (Op.ADD, Op.ADD, (30, 130)),
        (Op.SUBTRACT, Op.MULTIPLY, (-10, -1000)),
        (Op.MULTIPLY, Op.SUBTRACT, (200, 100)),
    ],
)
def test_arith_chains(spark, op1, op2, expected):
    rows = [(10, 20, 100)]
    out = _chain(spark, rows, "x: long, y: long, z: long", op1, op2)
    assert (out[0].res1, out[0].res2) == expected


def test_divide_flavors(spark):
    df = spark.createDataFrame([(7, 2)], "x: long, y: long")
    int_div = build_scalar(Op.DIVIDE, [F.col("x"), F.col("y")], {"integer": True})
    flt_div = build_scalar(Op.DIVIDE, [F.col("x"), F.col("y")], {})
    row = df.select(int_div.alias("i"), flt_div.alias("f")).collect()[0]
    assert row.i == 3 and abs(row.f - 3.5) < 1e-12


def test_checked_arithmetic_null_flavor(spark):
    # try_* returns NULL on overflow / div-by-zero (arrow *_checked raises;
    # ANSI mode gives the raising flavor for the unchecked ops)
    df = spark.createDataFrame(
        [(9223372036854775807, 1, 0)], "x: long, y: long, z: long"
    )
    prog = Program(
        steps=(
            ProgramStep(
                assignes=(
                    Assign("ov", Op.ADD_NOT_NULL, ("x", "y")),
                    Assign("dz", Op.DIVIDE_NOT_NULL, ("y", "z")),
                    Assign("ok", Op.MULTIPLY_NOT_NULL, ("y", "y")),
                ),
                projection=("ov", "dz", "ok"),
            ),
        )
    )
    row = apply_program(df, prog).collect()[0]
    assert row.ov is None and row.dz is None and row.ok == 1


def test_null_tests_and_boolean_ops(spark):
    schema = T.StructType(
        [T.StructField("x", T.LongType()), T.StructField("b1", T.BooleanType()),
         T.StructField("b2", T.BooleanType())]
    )
    df = spark.createDataFrame(
        [(1, True, False), (None, True, True), (2, False, False)], schema
    )
    prog = Program(
        steps=(
            ProgramStep(
                assignes=(
                    Assign("valid", Op.IS_VALID, ("x",)),
                    Assign("isnull", Op.IS_NULL, ("x",)),
                    Assign("nb", Op.INVERT, ("b1",)),
                    Assign("conj", Op.AND, ("b1", "b2")),
                    Assign("disj", Op.OR, ("b1", "b2")),
                    Assign("exor", Op.XOR, ("b1", "b2")),
                ),
            ),
        )
    )
    rows = apply_program(df, prog).collect()
    assert [r.valid for r in rows] == [True, False, True]
    assert [r.isnull for r in rows] == [False, True, False]
    assert [r.nb for r in rows] == [False, False, True]
    assert [r.conj for r in rows] == [False, True, False]
    assert [r.disj for r in rows] == [True, True, False]
    assert [r.exor for r in rows] == [True, False, False]


def test_math_superset(spark):
    df = spark.createDataFrame([(4.0,)], "x: double")
    prog = Program(
        steps=(
            ProgramStep(
                assignes=(
                    Assign("r", Op.SQRT, ("x",)),
                    Assign("e", Op.EXP, ("x",)),
                    Assign("l", Op.LN, ("x",)),
                    Assign("s", Op.SIGN, ("x",)),
                ),
                projection=("r", "e", "l", "s"),
            ),
        )
    )
    row = apply_program(df, prog).collect()[0]
    assert row.r == 2.0
    assert abs(row.e - math.exp(4)) < 1e-9
    assert abs(row.l - math.log(4)) < 1e-12
    assert row.s == 1.0


def test_every_op_compiles_and_executes(spark):
    """Registry-drift guard: every declared Op must build through
    build_scalar AND execute on a real row (catches ops that reference
    functions missing from this Spark version)."""
    from pyspark.sql import functions as F

    from arrowhouse_spark.functions.scalar import build_scalar
    from arrowhouse_spark.program import Op

    df = spark.createDataFrame(
        [(3, 2, 0.75, "abc", True, False, "2024-01-01 00:00:00")],
        "i: int, j: int, x: double, s: string, p: boolean, q: boolean, t: string",
    )
    num, num2, dbl = F.col("i"), F.col("j"), F.col("x")
    string, b1, b2 = F.col("s"), F.col("p"), F.col("q")
    pattern = {"pattern": "b"}

    cases: dict[Op, tuple] = {}
    for op in Op:
        name = op.value
        if op is Op.CAST_BINARY:
            # ANSI: binary casts only from string/binary (arrow is the same)
            cases[op] = ([string], {})
        elif op is Op.CAST_TIMESTAMP:
            cases[op] = ([F.col("t")], {})
        elif name.startswith("cast_"):
            cases[op] = ([num], {})
        elif op in (Op.IS_VALID, Op.IS_NULL):
            cases[op] = ([num], {})
        elif op in (Op.EQUAL, Op.NOT_EQUAL, Op.LESS, Op.LESS_EQUAL, Op.GREATER, Op.GREATER_EQUAL):
            cases[op] = ([num, num2], {})
        elif op in (Op.AND, Op.OR, Op.XOR):
            cases[op] = ([b1, b2], {})
        elif op is Op.INVERT:
            cases[op] = ([b1], {})
        elif op in (Op.ADD, Op.SUBTRACT, Op.MULTIPLY, Op.DIVIDE, Op.MODULO,
                    Op.ADD_NOT_NULL, Op.SUBTRACT_NOT_NULL, Op.MULTIPLY_NOT_NULL,
                    Op.DIVIDE_NOT_NULL):
            cases[op] = ([num, num2], {})
        elif op in (Op.ABS, Op.NEGATE):
            cases[op] = ([num], {})
        elif op is Op.BINARY_LENGTH:
            cases[op] = ([string], {})
        elif op in (Op.MATCH_SUBSTRING, Op.MATCH_LIKE, Op.STARTS_WITH, Op.ENDS_WITH):
            cases[op] = ([string], pattern)
        elif op in (Op.FLOOR, Op.CEIL, Op.TRUNC, Op.ROUND):
            cases[op] = ([dbl], {})
        else:  # superset math
            cases[op] = ([dbl], {})

    missing = [op for op in Op if op not in cases]
    assert not missing
    cols = [build_scalar(op, list(args), opts).alias(f"c{i}")
            for i, (op, (args, opts)) in enumerate(cases.items())]
    row = df.select(*cols).collect()[0]
    assert len(row) == len(list(Op))
