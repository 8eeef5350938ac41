"""Approximate GROUP BY (max_rows_to_group_by / OverflowMode) tests —
the custom operator for Aggregator.cpp:531-550 semantics, deterministic
distributed variant."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from arrowhouse_spark.operators.groupby_limit import (
    GroupByLimitExceeded,
    OverflowMode,
    group_by_limited,
)


@pytest.fixture(scope="module")
def skewed(spark):
    # key k appears 10*(5-k) times for k in 0..4 → weights 50,40,30,20,10
    rows = [(k, float(i)) for k in range(5) for i in range(10 * (5 - k))]
    return spark.createDataFrame(rows, "k: long, v: double")


def test_throw_under_limit_ok(skewed):
    out = group_by_limited(
        skewed, ["k"], {"n": F.count(F.lit(1)), "s": F.sum("v")}, max_rows=10,
        mode=OverflowMode.THROW,
    )
    assert out.count() == 5


def test_throw_over_limit_raises(skewed):
    with pytest.raises(GroupByLimitExceeded):
        group_by_limited(
            skewed, ["k"], {"n": F.count(F.lit(1))}, max_rows=3,
            mode=OverflowMode.THROW,
        )


def test_any_keeps_heaviest_keys(skewed):
    out = group_by_limited(
        skewed, ["k"], {"n": F.count(F.lit(1)), "s": F.sum("v")}, max_rows=3
    )
    rows = {r.k: r.n for r in out.collect()}
    # heaviest 3 keys by count: 0 (50), 1 (40), 2 (30)
    assert rows == {0: 50, 1: 40, 2: 30}


def test_any_overflow_row(skewed):
    out = group_by_limited(
        skewed,
        ["k"],
        {"n": F.count(F.lit(1)), "s": F.sum("v"), "mx": F.max("v")},
        max_rows=3,
        overflow_row=True,
    )
    rows = out.collect()
    assert len(rows) == 4
    ov = [r for r in rows if r["__overflow"]][0]
    # dropped keys 3 (20 rows, v 0..19) and 4 (10 rows, v 0..9)
    assert ov.k is None and ov.n == 30
    assert ov.s == sum(range(20)) + sum(range(10))
    assert ov.mx == 19.0


def test_any_deterministic_tiebreak(spark):
    # equal weights → key order decides
    df = spark.createDataFrame([(k, 1.0) for k in range(6)], "k: long, v: double")
    out = group_by_limited(df, ["k"], {"n": F.count(F.lit(1))}, max_rows=3)
    assert sorted(r.k for r in out.collect()) == [0, 1, 2]
