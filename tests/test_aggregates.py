"""Aggregation tests mirroring the reference's ut_aggregator.cpp shapes:
the F1 agg_block fixture (1000 rows, key moduli 9/7/5/3) where expected GROUP
BY cardinalities are products of the key moduli (ut_aggregator.cpp:238-243),
and count/min/max/any/sum/avg over every viable column (:216-359)."""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from arrowhouse_spark import AggregateAssign, GroupBy, Program, ProgramStep, apply_program
from arrowhouse_spark.program import AggOp

STRINGS5 = ["abc", "def", "abcd", "defg", "ac"]
STRINGS3 = ["abc", "def", "abcd"]


@pytest.fixture(scope="module")
def agg_block(spark):
    # F1: i16 = i%9, ui32 = i%7 (uint32→long policy), s1 = strings5[i%5],
    # s2 = strings3[i%3]; binary columns like the reference's arrow::binary()
    schema = T.StructType(
        [
            T.StructField("i16", T.ShortType()),
            T.StructField("ui32", T.LongType()),
            T.StructField("s1", T.BinaryType()),
            T.StructField("s2", T.BinaryType()),
        ]
    )
    rows = [
        (i % 9, i % 7, STRINGS5[i % 5].encode(), STRINGS3[i % 3].encode())
        for i in range(1000)
    ]
    return spark.createDataFrame(rows, schema)


def _gb(df, keys, aggs):
    prog = Program(steps=(ProgramStep(group_by=GroupBy(keys=keys, aggregates=aggs)),))
    return apply_program(df, prog)


@pytest.mark.parametrize(
    "keys,expected_groups",
    [
        (("i16", "ui32"), 63),          # 9*7
        (("ui32", "i16"), 63),
        (("i16", "s1"), 45),            # 9*5
        (("s1", "i16"), 45),
        (("s1", "s2"), 15),             # 5*3
        (("i16", "ui32", "s1", "s2"), 315),  # lcm-structure product (9*7*5 via i mod)
    ],
)
def test_groupby_cardinalities(agg_block, keys, expected_groups):
    out = _gb(
        agg_block, keys, (AggregateAssign("cnt", AggOp.COUNT),)
    )
    assert out.count() == expected_groups


def test_groupby_counts_sum_to_total(agg_block):
    out = _gb(agg_block, ("i16", "ui32"), (AggregateAssign("cnt", AggOp.COUNT),))
    assert sum(r.cnt for r in out.collect()) == 1000


def test_keyless_all_aggs(agg_block):
    out = _gb(
        agg_block,
        (),
        (
            AggregateAssign("cnt", AggOp.COUNT),
            AggregateAssign("cnt_s1", AggOp.COUNT, "s1"),
            AggregateAssign("sum_i16", AggOp.SUM, "i16", source_type="int16"),
            AggregateAssign("sum_ui32", AggOp.SUM, "ui32", source_type="uint32"),
            AggregateAssign("avg_i16", AggOp.AVG, "i16"),
            AggregateAssign("min_i16", AggOp.MIN, "i16"),
            AggregateAssign("max_i16", AggOp.MAX, "i16"),
            AggregateAssign("min_s1", AggOp.MIN, "s1"),
            AggregateAssign("max_s1", AggOp.MAX, "s1"),
            AggregateAssign("any_s2", AggOp.ANY, "s2"),
        ),
    )
    row = out.collect()[0]
    # i%9 over 1000 rows: 112 full cycles minus tail → sum computable directly
    exp_sum_i16 = sum(i % 9 for i in range(1000))
    exp_sum_ui32 = sum(i % 7 for i in range(1000))
    assert row.cnt == 1000 and row.cnt_s1 == 1000
    assert row.sum_i16 == exp_sum_i16
    assert int(row.sum_ui32) == exp_sum_ui32
    assert abs(row.avg_i16 - exp_sum_i16 / 1000) < 1e-12
    assert row.min_i16 == 0 and row.max_i16 == 8
    # binary min/max: unsigned-lexicographic like arrow/CompositeKey
    assert bytes(row.min_s1) == b"abc" and bytes(row.max_s1) == b"defg"
    assert bytes(row.any_s2) in {s.encode() for s in STRINGS3}
    # widening: sum(uint32) → uint64 policy type decimal(20,0)
    assert dict(out.dtypes)["sum_ui32"] == "decimal(20,0)"
    assert dict(out.dtypes)["avg_i16"] == "double"


def test_grouped_min_max_per_group(agg_block):
    out = _gb(
        agg_block,
        ("i16",),
        (
            AggregateAssign("mn", AggOp.MIN, "ui32"),
            AggregateAssign("mx", AggOp.MAX, "ui32"),
            AggregateAssign("cnt", AggOp.COUNT),
        ),
    )
    rows = {r.i16: (r.mn, r.mx, r.cnt) for r in out.collect()}
    assert len(rows) == 9
    for k, (mn, mx, cnt) in rows.items():
        vals = [i % 7 for i in range(1000) if i % 9 == k]
        assert (mn, mx, cnt) == (min(vals), max(vals), len(vals))


def test_duration_sum_avg_keep_interval_type(spark):
    """sum(duration)→duration, avg(duration)→duration (ClickHouse widening,
    AggregateFunctionSum.h:311-312 maps arrow duration[us] to
    DayTimeIntervalType per types.py)."""
    import datetime as dt

    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    rows = [
        (1, dt.timedelta(seconds=90)),
        (1, dt.timedelta(seconds=30)),
        (2, None),
    ]
    schema = T.StructType(
        [
            T.StructField("k", T.LongType()),
            T.StructField("d", T.DayTimeIntervalType()),
        ]
    )
    df = spark.createDataFrame(rows, schema)
    out = df.groupBy("k").agg(
        F.sum("d").alias("sum_d"), F.avg("d").alias("avg_d")
    )
    types = dict((f.name, f.dataType) for f in out.schema.fields)
    assert isinstance(types["sum_d"], T.DayTimeIntervalType)
    assert isinstance(types["avg_d"], T.DayTimeIntervalType)
    got = {r.k: (r.sum_d, r.avg_d) for r in out.collect()}
    assert got[1] == (dt.timedelta(seconds=120), dt.timedelta(seconds=60))
    # all-NULL group: sum/avg return NULL (has()-flag semantics,
    # AggregateFunctionSum.h:258-264)
    assert got[2] == (None, None)
