from __future__ import annotations

import datetime as dt

from arrowhouse_spark.operators.merge import scd2_from_log


import pytest

pytestmark = pytest.mark.slow  # full tier: streaming/property/e2e (see pytest.ini)


def _ts(h: int) -> dt.datetime:
    return dt.datetime(2024, 1, 1, h)


def _build(spark, rows):
    df = spark.createDataFrame(rows, "k string, ts timestamp, attr string, eid int")
    return scd2_from_log(
        df, key_cols=["k"], ts_col="ts", attr_col="attr", tie_col="eid"
    )


def test_scd2_collapses_runs_and_closes_intervals(spark):
    rows = [
        ("a", _ts(0), "x", 1),
        ("a", _ts(1), "x", 2),  # same run — collapsed
        ("a", _ts(2), "y", 3),  # new run
        ("a", _ts(3), "x", 4),  # x AGAIN: a new run, not merged with the first
        ("b", _ts(5), "z", 5),
    ]
    got = {
        (r["k"], r["valid_from"].hour): (r["attr"], r["valid_to"], r["is_current"])
        for r in _build(spark, rows).collect()
    }
    assert got[("a", 0)] == ("x", _ts(2), False)
    assert got[("a", 2)] == ("y", _ts(3), False)
    assert got[("a", 3)] == ("x", None, True)
    assert got[("b", 5)] == ("z", None, True)
    assert len(got) == 4


def test_scd2_tie_break_and_null_runs(spark):
    # equal timestamps order by tie; NULL attr forms a run of its own
    rows = [
        ("a", _ts(0), None, 2),
        ("a", _ts(0), "x", 1),  # tie=1 comes FIRST despite arrival order
        ("a", _ts(1), None, 3),  # NULL run continues? no — x is between
    ]
    out = sorted(
        _build(spark, rows).collect(), key=lambda r: (r["valid_from"], r["attr"] or "")
    )
    # runs under (ts,eid) order: x(eid1) -> null(eid2) -> null(eid3) collapses
    # into two runs; sorted output puts the NULL-attr run first ("" < "x")
    assert len(out) == 2
    assert out[0]["attr"] is None and out[0]["is_current"]
    assert out[1]["attr"] == "x" and not out[1]["is_current"]
    assert out[1]["valid_to"] == _ts(0)  # closed by the null run's start


def test_scd2_open_end_sentinel(spark):
    rows = [("a", _ts(0), "x", 1)]
    df = spark.createDataFrame(rows, "k string, ts timestamp, attr string, eid int")
    out = scd2_from_log(
        df,
        key_cols=["k"],
        ts_col="ts",
        attr_col="attr",
        tie_col="eid",
        open_end="9999-12-31 00:00:00",
    ).collect()
    assert out[0]["valid_to"] == dt.datetime(9999, 12, 31)
    assert out[0]["is_current"]
