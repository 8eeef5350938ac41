"""SSA program tests — shapes mirror the reference's ut_ssa_step.cpp:
chained assigns + filter + projection (FilterTest :120-157), scalar constants
(:604-621), keyless min/max/sum with widening (:638-682), the group-by matrix
{nullable × keys × input-shape} (:333-387, :683-723)."""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from arrowhouse_spark import (
    AggregateAssign,
    Assign,
    GroupBy,
    Op,
    Program,
    ProgramStep,
    apply_program,
)
from arrowhouse_spark.compile import ProgramError
from arrowhouse_spark.program import AggOp, const

XYZ_SCHEMA = T.StructType(
    [
        T.StructField("x", T.LongType()),
        T.StructField("y", T.LongType()),
        T.StructField("z", T.LongType()),
    ]
)


def test_assign_filter_project_chain(spark):
    # res1 = x + y; res2 = res1 * z; filter res2 > 10; project [res1, res2]
    df = spark.createDataFrame([(1, 2, 3), (2, 3, 4), (0, 0, 5)], XYZ_SCHEMA)
    prog = Program(
        steps=(
            ProgramStep(
                assignes=(
                    Assign("res1", Op.ADD, ("x", "y")),
                    Assign("res2", Op.MULTIPLY, ("res1", "z")),
                    Assign("keep", Op.GREATER, ("res2", "x")),
                ),
                filters=("keep",),
                projection=("res1", "res2"),
            ),
        )
    )
    rows = sorted(apply_program(df, prog).collect())
    assert rows == [(0, 0), (3, 9), (5, 20)][:len(rows)] or rows == [(3, 9), (5, 20)]
    assert rows == [(3, 9), (5, 20)]


def test_constant_assign(spark):
    # ut_ssa_step.cpp:604-621: x=[64,5,1,43]; y := 56; res := x+y; expect filter keeps 2
    df = spark.createDataFrame([(64,), (5,), (1,), (43,)], "x: long")
    prog = Program(
        steps=(
            ProgramStep(
                assignes=(
                    const("y", 56),
                    const("threshold", 98),
                    Assign("res", Op.ADD, ("x", "y")),
                    Assign("big", Op.GREATER, ("res", "threshold")),
                ),
                filters=("big",),
                projection=("x", "res"),
            ),
        )
    )
    rows = sorted(apply_program(df, prog).collect())
    assert rows == [(43, 99), (64, 120)]


def test_duplicate_assign_rejected(spark):
    df = spark.createDataFrame([(1, 2, 3)], XYZ_SCHEMA)
    prog = Program(
        steps=(ProgramStep(assignes=(Assign("x", Op.ADD, ("y", "z")),)),)
    )
    with pytest.raises(ProgramError, match="duplicate"):
        apply_program(df, prog)


def test_keyless_minmax_sum(spark):
    # ut_ssa_step.cpp:638-682: keyless aggregation returns one row
    df = spark.createDataFrame([(1,), (0,), (-1,), (2,)], "x: smallint")
    prog = Program(
        steps=(
            ProgramStep(
                group_by=GroupBy(
                    aggregates=(
                        AggregateAssign("min_x", AggOp.MIN, "x"),
                        AggregateAssign("max_x", AggOp.MAX, "x"),
                        AggregateAssign("sum_x", AggOp.SUM, "x", source_type="int16"),
                    )
                )
            ),
        )
    )
    out = apply_program(df, prog)
    row = out.collect()[0]
    assert (row.min_x, row.max_x, row.sum_x) == (-1, 2, 2)
    # ClickHouse widening: sum(int16) -> int64
    assert dict(out.dtypes)["sum_x"] == "bigint"


def test_global_agg_empty_input_one_row(spark):
    # Aggregator.cpp:571-577: global agg over empty input = 1 row, count=0, sum NULL
    df = spark.createDataFrame([], "x: long")
    prog = Program(
        steps=(
            ProgramStep(
                group_by=GroupBy(
                    aggregates=(
                        AggregateAssign("cnt", AggOp.COUNT, "x"),
                        AggregateAssign("sum_x", AggOp.SUM, "x"),
                    )
                )
            ),
        )
    )
    rows = apply_program(df, prog).collect()
    assert len(rows) == 1
    assert rows[0].cnt == 0 and rows[0].sum_x is None


def test_keyed_agg_empty_input_zero_rows(spark):
    # ut_ssa_step.cpp:232-236: keyed agg over empty input = 0 rows
    df = spark.createDataFrame([], "k: long, x: long")
    prog = Program(
        steps=(
            ProgramStep(
                group_by=GroupBy(
                    keys=("k",),
                    aggregates=(AggregateAssign("sum_x", AggOp.SUM, "x"),),
                )
            ),
        )
    )
    assert apply_program(df, prog).count() == 0


def test_groupby_nullable_keys(spark):
    # F5 ssa_xy DEFAULT variant, nullable: x=[-1,NULL,NULL,-1], y=[1,NULL,NULL,1]
    df = spark.createDataFrame(
        [(-1, 1), (None, None), (None, None), (-1, 1)],
        T.StructType(
            [T.StructField("x", T.ShortType()), T.StructField("y", T.LongType())]
        ),
    )
    prog = Program(
        steps=(
            ProgramStep(
                group_by=GroupBy(
                    keys=("x",),
                    aggregates=(AggregateAssign("sum_y", AggOp.SUM, "y"),),
                )
            ),
        )
    )
    rows = {r.x: r.sum_y for r in apply_program(df, prog).collect()}
    # NULL keys group together (Aggregator.h:72-108); sum of all-NULL = NULL
    assert rows == {-1: 2, None: None}


def test_distinct_via_keys_only(spark):
    # aggregation with no agg funcs = DISTINCT (Aggregator.cpp:289-300)
    df = spark.createDataFrame([(1, "a"), (1, "a"), (2, "b")], "k: long, s: string")
    prog = Program(steps=(ProgramStep(group_by=GroupBy(keys=("k", "s"))),))
    assert apply_program(df, prog).count() == 2


def test_string_predicates(spark):
    # LIKE family with ignore-case (ut_ssa_step.cpp:544-602)
    data = [("aa",), ("abaaba",), ("baa",), ("aBA",)]
    df = spark.createDataFrame(data, "s: string")
    prog = Program(
        steps=(
            ProgramStep(
                assignes=(
                    Assign("sw", Op.STARTS_WITH, ("s",), options={"pattern": "a"}),
                    Assign(
                        "swi",
                        Op.STARTS_WITH,
                        ("s",),
                        options={"pattern": "AB", "ignore_case": True},
                    ),
                    Assign("ew", Op.ENDS_WITH, ("s",), options={"pattern": "ba"}),
                    Assign("sub", Op.MATCH_SUBSTRING, ("s",), options={"pattern": "ba"}),
                    Assign("lk", Op.MATCH_LIKE, ("s",), options={"pattern": "%aa%"}),
                ),
            ),
        )
    )
    rows = {r.s: (r.sw, r.swi, r.ew, r.sub, r.lk) for r in apply_program(df, prog).collect()}
    assert rows["aa"] == (True, False, False, False, True)
    assert rows["abaaba"] == (True, True, True, True, True)
    assert rows["baa"] == (False, False, False, True, True)
    assert rows["aBA"] == (True, True, False, False, False)


def test_casts_and_unsigned_policy(spark):
    # note: ANSI mode (Spark 4 default) raises on overflowing casts — matching
    # arrow's default safe CastOptions used by the reference's "cast" kernel
    df = spark.createDataFrame([(100, -1.7)], "i: long, f: double")
    prog = Program(
        steps=(
            ProgramStep(
                assignes=(
                    Assign("as_i8", Op.CAST_INT8, ("i",)),
                    Assign("as_u64", Op.CAST_UINT64, ("i",)),
                    Assign("tr", Op.TRUNC, ("f",)),
                    Assign("fl", Op.FLOOR, ("f",)),
                ),
                projection=("as_i8", "as_u64", "tr", "fl"),
            ),
        )
    )
    out = apply_program(df, prog)
    types = dict(out.dtypes)
    assert types["as_u64"] == "decimal(20,0)"
    row = out.collect()[0]
    assert row.tr == -1.0 and row.fl == -2.0


def test_every_supported_arrow_type_maps_to_spark():
    """SUPPORTED_ARROW_TYPES and spark_type_for must agree: every type the
    reference's switch dispatches on (and we claim support for) has a Spark
    mapping — the set and the function can't silently drift apart again."""
    from arrowhouse_spark.types import SUPPORTED_ARROW_TYPES, spark_type_for

    for name in sorted(SUPPORTED_ARROW_TYPES):
        dt = spark_type_for(name)
        assert isinstance(dt, T.DataType), name
    # time-of-day parity is order-preserving integrals (no Spark time type)
    assert spark_type_for("time32") == T.IntegerType()
    assert spark_type_for("time64") == T.LongType()
