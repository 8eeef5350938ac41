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


def test_break_stops_at_cap_and_differs_from_any(spark):
    """BREAK = first-seen keys with PARTIAL aggregates (stop consuming),
    vs ANY = heaviest keys fully aggregated. Crafted so both the key set
    and the kept keys' aggregates differ."""
    from arrowhouse_spark.operators.groupby_limit import OverflowMode

    rows = [
        (1, "A", 1.0), (2, "B", 1.0), (3, "C", 1.0), (4, "A", 1.0),
        (5, "D", 1.0), (6, "D", 1.0), (7, "D", 1.0), (8, "D", 1.0),
    ]
    df = spark.createDataFrame(rows, "ord: long, k: string, v: double")
    brk = group_by_limited(
        df, ["k"], {"n": F.count(F.lit(1))}, max_rows=3,
        mode=OverflowMode.BREAK, order_col="ord",
    )
    got = {r.k: r.n for r in brk.collect()}
    # 4th distinct key D first appears at ord=5 → prefix is ord < 5:
    # A twice, B once, C once — and D (the heaviest key!) absent entirely
    assert got == {"A": 2, "B": 1, "C": 1}
    any_got = {
        r.k: r.n
        for r in group_by_limited(
            df, ["k"], {"n": F.count(F.lit(1))}, max_rows=3
        ).collect()
    }
    # ANY keeps the heaviest keys (D) and aggregates them fully
    assert any_got == {"D": 4, "A": 2, "B": 1}
    assert set(any_got) != set(got)


def test_break_no_stop_when_under_limit(spark):
    from arrowhouse_spark.operators.groupby_limit import OverflowMode

    df = spark.createDataFrame(
        [(1, "A", 1.0), (2, "B", 2.0), (3, "A", 3.0)], "ord: long, k: string, v: double"
    )
    out = group_by_limited(
        df, ["k"], {"s": F.sum("v")}, max_rows=2,
        mode=OverflowMode.BREAK, order_col="ord",
    )
    # only 2 distinct keys ≤ max_rows: the whole input aggregates
    assert {r.k: r.s for r in out.collect()} == {"A": 4.0, "B": 2.0}


def test_break_requires_order_col(spark):
    import pytest

    from arrowhouse_spark.operators.groupby_limit import OverflowMode

    df = spark.createDataFrame([(1, "A", 1.0)], "ord: long, k: string, v: double")
    with pytest.raises(ValueError, match="order_col"):
        group_by_limited(
            df, ["k"], {"s": F.sum("v")}, max_rows=1, mode=OverflowMode.BREAK
        )


def test_any_arrival_first_seen_keys_win(spark):
    """Arrival-order ANY (Aggregator.cpp:361-369 find-only path): first
    max_rows distinct keys in order_col order claim the slots; their LATE
    rows still aggregate (unlike BREAK's partials); later keys overflow."""
    from arrowhouse_spark.operators.groupby_limit import OverflowMode

    # stream: A(1) B(2) A(3) D(4) B(5) D(6) D(7) C(8) D(9) A(10)
    rows = [
        (1, "A", 1.0), (2, "B", 2.0), (3, "A", 3.0), (4, "D", 4.0),
        (5, "B", 5.0), (6, "D", 6.0), (7, "D", 7.0), (8, "C", 8.0),
        (9, "D", 9.0), (10, "A", 10.0),
    ]
    df = spark.createDataFrame(rows, "ord: long, k: string, v: double")
    out = group_by_limited(
        df, ["k"], {"n": F.count(F.lit(1)), "s": F.sum("v")}, max_rows=2,
        mode=OverflowMode.ANY, order_col="ord", overflow_row=True,
    ).collect()
    kept = {r.k: (r.n, r.s) for r in out if not r["__overflow"]}
    # first 2 keys seen are A, B — D is heavier (4 rows) but arrived 3rd;
    # A's row at ord=10 (long after the table filled) still aggregates
    assert kept == {"A": (3, 14.0), "B": (2, 7.0)}
    [ov] = [r for r in out if r["__overflow"]]
    assert (ov.n, ov.s) == (5, 34.0)  # D's 4 rows + C's 1 row
    assert ov.k is None

    # without overflow_row: just the kept keys, fully aggregated
    out2 = group_by_limited(
        df, ["k"], {"n": F.count(F.lit(1))}, max_rows=2,
        mode=OverflowMode.ANY, order_col="ord",
    )
    assert {r.k: r.n for r in out2.collect()} == {"A": 3, "B": 2}

    # under the limit: identical to a plain group-by
    out3 = group_by_limited(
        df, ["k"], {"n": F.count(F.lit(1))}, max_rows=10,
        mode=OverflowMode.ANY, order_col="ord",
    )
    assert {r.k: r.n for r in out3.collect()} == {"A": 3, "B": 2, "D": 4, "C": 1}


def test_overflow_row_absent_when_nothing_overflows(spark):
    """overflow_row=True with <= max_rows distinct keys: the anti-join is
    empty, and the global re-aggregate over it must NOT surface as a
    spurious all-null overflow row (count 0 / null sums) — in either the
    heaviest-keys path or the arrival-order path."""
    df = spark.createDataFrame(
        [(k, float(k), k) for k in range(3)], "k: long, v: double, ord: long"
    )
    aggs = {"n": F.count(F.lit(1)), "s": F.sum("v")}
    heaviest = group_by_limited(
        df, ["k"], aggs, max_rows=5, overflow_row=True
    ).collect()
    assert len(heaviest) == 3
    assert not any(r["__overflow"] for r in heaviest)
    arrival = group_by_limited(
        df, ["k"], aggs, max_rows=5, mode=OverflowMode.ANY,
        order_col="ord", overflow_row=True,
    ).collect()
    assert len(arrival) == 3
    assert not any(r["__overflow"] for r in arrival)
