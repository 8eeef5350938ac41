from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from arrowhouse_spark.operators.timeseries import gapfill_locf, ohlc_downsample


def _ts(h: int, m: int = 0) -> dt.datetime:
    return dt.datetime(2024, 1, 1, h, m)


def test_ohlc_tie_breaks_on_tie_col(spark):
    # two rows share the bucket's min timestamp: open must be the one with
    # the SMALLER tie (event id), independent of arrival order
    df = spark.createDataFrame(
        [
            ("a", _ts(0, 5), 2, 20.0),
            ("a", _ts(0, 5), 1, 10.0),
            ("a", _ts(0, 40), 3, 99.0),
            ("a", _ts(0, 50), 4, 5.0),
            ("b", _ts(3, 0), 5, 7.0),
        ],
        "k string, ts timestamp, eid int, v double",
    )
    out = {
        r["k"]
        + "|"
        + r["bucket_ts"].strftime("%H"): (
            r["open"],
            r["high"],
            r["low"],
            r["close"],
            r["n"],
        )
        for r in ohlc_downsample(
            df, key_col="k", ts_col="ts", value_col="v", tie_col="eid"
        ).collect()
    }
    assert out["a|00"] == (10.0, 99.0, 5.0, 5.0, 4)
    assert out["b|03"] == (7.0, 7.0, 7.0, 7.0, 1)


def test_gapfill_locf_fills_holes_per_key(spark):
    df = spark.createDataFrame(
        [
            ("a", _ts(0, 10), 1, 1.0),
            ("a", _ts(0, 50), 2, 2.0),  # same bucket: last-by-(ts,tie) wins
            ("a", _ts(3, 0), 3, 9.0),  # hours 1,2 are holes
            ("b", _ts(5, 0), 4, 4.0),  # single-bucket series: no spine growth
        ],
        "k string, ts timestamp, eid int, v double",
    )
    rows = {
        (r["k"], r["bucket_ts"].hour): (r["v_filled"], r["filled"])
        for r in gapfill_locf(
            df, key_col="k", ts_col="ts", value_col="v", tie_col="eid"
        ).collect()
    }
    assert rows[("a", 0)] == (2.0, False)
    assert rows[("a", 1)] == (2.0, True)  # carried forward
    assert rows[("a", 2)] == (2.0, True)
    assert rows[("a", 3)] == (9.0, False)
    assert rows[("b", 5)] == (4.0, False)
    assert len(rows) == 5  # spine is min..max per key, nothing beyond


def test_gapfill_spine_is_bounded_by_buckets_not_events(spark):
    # 100 events in ONE bucket -> spine stays 1 row: no event-count blowup
    df = spark.createDataFrame(
        [("a", _ts(0, 0) + dt.timedelta(seconds=i), i, float(i)) for i in range(100)],
        "k string, ts timestamp, eid int, v double",
    )
    out = gapfill_locf(df, key_col="k", ts_col="ts", value_col="v", tie_col="eid")
    assert out.count() == 1
    r = out.collect()[0]
    assert r["v_filled"] == 99.0 and not r["filled"]
