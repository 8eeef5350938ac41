"""Sort / merge / replace tests — fixtures F3 (sort1000) and F4 (snapshots)
from FIXTURES.md, mirroring /root/reference/YdbModes/tests/ut_modes.cpp:
  - sort by (i8,i16,i32) restores v = row index (:355-377, :402-427)
  - k-way merge of overlapping sorted runs is globally sorted, 751 rows (:454-490)
  - replace-merge of 4 overlapping 400-row snapshots keeps exactly 1000 unique
    rows with per-snap survivor counts {0:200, 1:200, 2:200, 3:400} (:529-569)
  - reversed variant emits descending (:571-612)
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import types as T
from pyspark.sql import functions as F

from arrowhouse_spark.operators import (
    SortKey,
    check_sorted,
    concat,
    except_all,
    intersect,
    is_sorted_and_unique,
    merge_sorted,
    replace_merge,
    sort,
)
from arrowhouse_spark.operators.merge import replace_merge_agg

def _f3_schema(*extra: T.StructField) -> T.StructType:
    # fresh instance each call — StructType.add mutates in place
    return T.StructType(
        [
            T.StructField("i8", T.ByteType()),
            T.StructField("i16", T.ShortType()),
            T.StructField("i32", T.IntegerType()),
            *extra,
        ]
    )


def _f3_rows(lo: int, hi: int):
    # v in [lo,hi) decomposed: i8=v/100, i16=(v%100)/10, i32=v%10 (ut_modes.cpp:275-292)
    return [(v // 100, (v % 100) // 10, v % 10) for v in range(lo, hi)]


KEYS = [SortKey("i8"), SortKey("i16"), SortKey("i32")]


def test_sort_restores_order(spark):
    rows = _f3_rows(0, 1000)
    random.Random(42).shuffle(rows)
    df = spark.createDataFrame(rows, _f3_schema())
    out = sort(df, KEYS).collect()
    assert [r.i8 * 100 + r.i16 * 10 + r.i32 for r in out] == list(range(1000))


def test_merge_sorted_overlapping_runs(spark):
    # slices [0,100) [100,300) [200,600) [500,550) [600,601) → 751 rows, sorted
    slices = [(0, 100), (100, 300), (200, 600), (500, 550), (600, 601)]
    dfs = [spark.createDataFrame(_f3_rows(lo, hi), _f3_schema()) for lo, hi in slices]
    merged = merge_sorted(dfs, KEYS)
    vals = [r.i8 * 100 + r.i16 * 10 + r.i32 for r in merged.collect()]
    assert len(vals) == 751
    assert vals == sorted(vals)
    check_sorted(merged, KEYS)


def test_replace_merge_snapshots(spark):
    # F4: 4 overlapping 400-row snapshots; sort {keys ASC, snap DESC};
    # replace by keys → 1000 unique rows, survivors {0:200,1:200,2:200,3:400}
    schema = _f3_schema(T.StructField("snap", T.LongType()))
    slices = [(0, 400), (200, 600), (400, 800), (600, 1000)]
    dfs = [
        spark.createDataFrame(
            [(*r, s) for r in _f3_rows(lo, hi)], schema
        )
        for s, (lo, hi) in enumerate(slices)
    ]
    out = replace_merge(
        dfs,
        replace_key=("i8", "i16", "i32"),
        sort_keys=KEYS + [SortKey("snap", ascending=False)],
    )
    rows = out.collect()
    assert len(rows) == 1000
    vals = [r.i8 * 100 + r.i16 * 10 + r.i32 for r in rows]
    assert vals == list(range(1000))  # unique, ascending
    survivors: dict[int, int] = {}
    for r in rows:
        survivors[r.snap] = survivors.get(r.snap, 0) + 1
    assert survivors == {0: 200, 1: 200, 2: 200, 3: 400}


def test_replace_merge_reversed(spark):
    schema = _f3_schema(T.StructField("snap", T.LongType()))
    slices = [(0, 400), (200, 600), (400, 800), (600, 1000)]
    dfs = [
        spark.createDataFrame([(*r, s) for r in _f3_rows(lo, hi)], schema)
        for s, (lo, hi) in enumerate(slices)
    ]
    out = replace_merge(
        dfs,
        replace_key=("i8", "i16", "i32"),
        sort_keys=KEYS + [SortKey("snap", ascending=False)],
        reverse=True,
    )
    vals = [r.i8 * 100 + r.i16 * 10 + r.i32 for r in out.collect()]
    assert vals == list(range(999, -1, -1))


def test_replace_merge_source_order_tiebreak(spark):
    # equal sort keys break by source order: first source wins
    schema = T.StructType(
        [T.StructField("k", T.LongType()), T.StructField("who", T.StringType())]
    )
    a = spark.createDataFrame([(1, "a")], schema)
    b = spark.createDataFrame([(1, "b")], schema)
    out = replace_merge([a, b], replace_key=("k",), sort_keys=[SortKey("k")])
    assert out.collect()[0].who == "a"
    out2 = replace_merge([b, a], replace_key=("k",), sort_keys=[SortKey("k")])
    assert out2.collect()[0].who == "b"


def test_replace_merge_agg_matches_window(spark):
    schema = _f3_schema(T.StructField("snap", T.LongType()), T.StructField("val", T.LongType()))
    slices = [(0, 400), (200, 600)]
    dfs = [
        spark.createDataFrame(
            [(*r, s, s * 1000 + i) for i, r in enumerate(_f3_rows(lo, hi))], schema
        )
        for s, (lo, hi) in enumerate(slices)
    ]
    win = replace_merge(
        dfs,
        replace_key=("i8", "i16", "i32"),
        sort_keys=KEYS + [SortKey("snap", ascending=False)],
    ).select("i8", "i16", "i32", "snap", "val")
    agg = replace_merge_agg(
        dfs, replace_key=("i8", "i16", "i32"), version_col="snap", value_cols=["val"]
    ).select("i8", "i16", "i32", "snap", "val")
    assert sorted(map(tuple, win.collect())) == sorted(map(tuple, agg.collect()))


def test_check_sorted_raises_on_unsorted(spark):
    df = spark.createDataFrame([(2,), (1,)], "x: long").coalesce(1)
    with pytest.raises(AssertionError, match="not sorted"):
        check_sorted(df, ["x"])


def test_is_sorted_and_unique(spark):
    df = sort(spark.createDataFrame([(1,), (2,), (3,)], "x: long"), ["x"])
    assert is_sorted_and_unique(df, ["x"])
    dup = sort(spark.createDataFrame([(1,), (1,)], "x: long"), ["x"])
    assert not is_sorted_and_unique(dup, ["x"])


def test_concat_and_setops(spark):
    a = spark.createDataFrame([(1,), (2,), (2,)], "x: long")
    b = spark.createDataFrame([(2,), (3,)], "x: long")
    assert concat([a, b]).count() == 5
    assert sorted(r.x for r in intersect(a, b).collect()) == [2]
    assert sorted(r.x for r in except_all(a, b).collect()) == [1, 2]


def test_replace_merge_order_col_stable_under_repartition(spark):
    """With an explicit order_col, the winner per key is identical across
    arbitrary partition layouts — tie-break #3 no longer depends on
    monotonically_increasing_id's physical layout."""
    rows = [(k, 1, seq, f"v{k}-{seq}") for k in range(20) for seq in range(5)]
    base = spark.createDataFrame(rows, "k: long, ver: long, seq: long, val: string")
    # all rows tie on (replace_key, sort_keys, source): only seq disambiguates
    expected = {r.k: r.val for r in base.filter("seq = 0").collect()}
    for n in (1, 3, 7, 32):
        out = replace_merge(
            [base.repartition(n)],
            replace_key=("k",),
            sort_keys=[SortKey("ver")],
            order_col="seq",
        )
        got = {r.k: r.val for r in out.collect()}
        assert got == expected, f"layout repartition({n}) changed winners"


def test_replace_merge_stable_when_keys_disambiguate(spark):
    """Whenever sort_keys + source fully disambiguate (no intra-source ties),
    the result must be layout-independent even WITHOUT order_col."""
    rows = [(k, ver, f"v{k}-{ver}") for k in range(20) for ver in range(5)]
    a = spark.createDataFrame(rows[: len(rows) // 2], "k: long, ver: long, val: string")
    b = spark.createDataFrame(rows[len(rows) // 2 :], "k: long, ver: long, val: string")
    ref = {
        (r.k): (r.ver, r.val)
        for r in replace_merge(
            [a, b], replace_key=("k",), sort_keys=[SortKey("ver", ascending=False)]
        ).collect()
    }
    for n in (1, 5, 32):
        got = {
            (r.k): (r.ver, r.val)
            for r in replace_merge(
                [a.repartition(n), b.repartition(n)],
                replace_key=("k",),
                sort_keys=[SortKey("ver", ascending=False)],
            ).collect()
        }
        assert got == ref, f"layout repartition({n}) changed a disambiguated winner"
