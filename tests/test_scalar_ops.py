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
