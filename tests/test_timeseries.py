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


def test_rolling_mean_bounded_frame(spark):
    rows = [("a", i, float(i)) for i in range(10)]
    df = spark.createDataFrame(rows, "k string, t int, v double")
    from arrowhouse_spark.operators.timeseries import rolling_mean

    out = {
        r["t"]: r["rolling_mean"]
        for r in rolling_mean(
            df, key_cols=["k"], order_col="t", value_col="v", window_rows=3
        ).collect()
    }
    assert out[0] == 0.0
    assert out[1] == 0.5  # mean(0,1)
    assert out[5] == 4.0  # mean(3,4,5)
    assert out[9] == 8.0


def test_rolling_rejects_unknown_stat(spark):
    import pytest as _pytest

    from arrowhouse_spark.operators.timeseries import rolling_mean

    with _pytest.raises(ValueError, match="stat"):
        rolling_mean(
            spark.range(1), key_cols=[], order_col="id", value_col="id",
            stat="median",
        )


def test_winsorize_clips_to_group_quantiles(spark):
    vals = [float(v) for v in range(1, 101)]  # 1..100
    df = spark.createDataFrame([("a", v) for v in vals], "k string, v double")
    from arrowhouse_spark.operators.timeseries import winsorize

    out = winsorize(df, key_cols=["k"], value_col="v", lower=0.1, upper=0.9)
    rows = {r["v"]: r["winsorized"] for r in out.collect()}
    # interpolated p10 of 1..100 = 10.9, p90 = 90.1 (rounded 6dp)
    assert rows[1.0] == 10.9
    assert rows[100.0] == 90.1
    assert rows[50.0] == 50.0


def test_ewma_hand_checked_and_truncation(spark):
    import pytest

    from arrowhouse_spark.operators.timeseries import ewma

    df = spark.createDataFrame(
        [("a", 1, 10.0), ("a", 2, 20.0), ("a", 3, 40.0), ("b", 9, 7.0)],
        "k string, seq int, v double",
    )
    # alpha=0.25 -> weights 1, .75, .5625 newest-first, normalized
    out = {
        (r["k"], r["seq"]): r["ewma"]
        for r in ewma(df, ["k"], ["seq"], "v", alpha=0.25).collect()
    }
    assert out[("a", 1)] == 10.0
    assert out[("a", 2)] == round(27.5 / 1.75, 6)
    assert out[("a", 3)] == round(60.625 / 2.3125, 6)
    assert out[("b", 9)] == 7.0  # keys independent

    # lookback truncation: L=2 drops the oldest term entirely
    out2 = {
        (r["k"], r["seq"]): r["ewma"]
        for r in ewma(df, ["k"], ["seq"], "v", alpha=0.25, lookback=2).collect()
    }
    assert out2[("a", 3)] == round(55.0 / 1.75, 6)

    with pytest.raises(ValueError):
        ewma(df, ["k"], ["seq"], "v", alpha=1.5)

    # |value| >= 1e7 overflows the exact DECIMAL(22,15) term: must RAISE
    # loudly (round-8 advice), never silently null the term
    big = spark.createDataFrame([("a", 1, 1e7)], "k string, seq int, v double")
    with pytest.raises(Exception, match="overflows the exact"):
        ewma(big, ["k"], ["seq"], "v").collect()

    # NULL values still pass through (collect_list drops them)
    withnull = spark.createDataFrame(
        [("a", 1, 10.0), ("a", 2, None)], "k string, seq int, v double"
    )
    outn = {
        r["seq"]: r["ewma"]
        for r in ewma(withnull, ["k"], ["seq"], "v").collect()
    }
    assert outn[1] == 10.0 and outn[2] == 10.0
    with pytest.raises(ValueError):
        ewma(df, ["k"], ["seq"], "v", lookback=0)


def test_gapfill_lerp_interpolates_and_carries_tail(spark):
    from arrowhouse_spark.operators.timeseries import gapfill_lerp

    df = spark.createDataFrame(
        [
            ("a", _ts(0), 1, 10.0),
            ("a", _ts(3), 2, 40.0),   # hours 1,2 are gaps: expect 20, 30
            ("a", _ts(5), 3, 40.0),   # hour 4 gap: lerp flat 40
            ("b", _ts(2), 4, 7.0),
        ],
        "k string, ts timestamp, eid int, v double",
    )
    out = {
        (r["k"], r["bucket_ts"].hour): (r["v_lerp"], r["filled"])
        for r in gapfill_lerp(
            df, key_col="k", ts_col="ts", value_col="v", tie_col="eid"
        ).collect()
    }
    assert out[("a", 0)] == (10.0, False)
    assert out[("a", 1)] == (20.0, True)
    assert out[("a", 2)] == (30.0, True)
    assert out[("a", 3)] == (40.0, False)
    assert out[("a", 4)] == (40.0, True)
    assert out[("a", 5)] == (40.0, False)
    assert out[("b", 2)] == (7.0, False)


def test_seasonal_profile_hand_checked(spark):
    import datetime as dt

    from pyspark.sql import functions as F

    from arrowhouse_spark.operators.timeseries import seasonal_profile

    base = dt.datetime(2024, 1, 1)
    # key a: hour 0 -> values 10, 20 (mean 15); hour 1 -> 30 (mean 30);
    # level = 60/3 = 20 -> devs -5 and +10
    rows = [
        ("a", base.replace(hour=0, minute=5), 10.0),
        ("a", base.replace(hour=0, minute=50), 20.0),
        ("a", base.replace(hour=1), 30.0),
        ("b", base.replace(hour=3), 7.0),
    ]
    df = spark.createDataFrame(rows, "k string, ts timestamp, v double")
    out = {
        (r.k, r.bucket): (r.n, r.seasonal_mean, r.level, r.seasonal_dev)
        for r in seasonal_profile(df, ["k"], "ts", "v").collect()
    }
    assert out[("a", 0)] == (2, 15.0, 20.0, -5.0)
    assert out[("a", 1)] == (1, 30.0, 20.0, 10.0)
    assert out[("b", 3)] == (1, 7.0, 7.0, 0.0)
    # seasonal devs weighted by n must sum to ~0 per key (decomposition
    # identity: sum n_b * (mean_b - level) = 0)
    tot = sum(n * dev for (k, _), (n, _, _, dev) in out.items() if k == "a")
    assert abs(tot) < 1e-5


def test_ewma_last_matches_per_row_form(spark):
    import pytest

    from pyspark.sql import functions as F
    from arrowhouse_spark.operators.timeseries import ewma, ewma_last

    # 3 keys x up to 40 rows (beyond lookback=32), deterministic values,
    # interleaved NULLs, so the tail fold, the truncation boundary, and
    # the null-skip rule are all exercised
    rows = []
    for k in range(3):
        n = (17, 40, 1)[k]
        for i in range(n):
            v = None if (k == 1 and i % 7 == 3) else float((i * 31 + k) % 90 - 40)
            rows.append((f"k{k}", i, v))
    df = spark.createDataFrame(rows, "k string, seq int, v double")

    per_row = ewma(df, ["k"], ["seq"], "v", alpha=0.25, lookback=32,
                   out_col="__e")
    expected = {
        (r["k"]): (r["n"], r["last_e"])
        for r in per_row.groupBy("k").agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.max(F.struct("seq", "__e"))["__e"].alias("last_e"),
        ).collect()
    }
    got = {
        r["k"]: (r["n_rows"], r["ewma"])
        for r in ewma_last(df, ["k"], ["seq"], "v", alpha=0.25,
                           lookback=32).collect()
    }
    assert got == expected

    # same validation surface as the per-row form
    with pytest.raises(ValueError):
        ewma_last(df, ["k"], ["seq"], "v", alpha=1.5)
    with pytest.raises(ValueError):
        ewma_last(df, ["k"], ["seq"], "v", lookback=0)
    big = spark.createDataFrame([("a", 1, 1e7), ("a", 2, 1.0)],
                                "k string, seq int, v double")
    # out-of-range guard fires for EVERY row, not only the folded tail
    with pytest.raises(Exception, match="overflows the exact"):
        ewma_last(big, ["k"], ["seq"], "v", lookback=1).collect()
