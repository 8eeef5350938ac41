"""profile (operators/profile.py) vs hand-computed stats."""

from __future__ import annotations

from arrowhouse_spark.operators.profile import profile


def test_profile_mixed_columns(spark):
    df = spark.createDataFrame(
        [(1, 2.5, "b"), (2, None, "a"), (2, 7.5, None), (4, 7.5, "c")],
        "k long, v double, s string",
    )
    rows = {r["column"]: r for r in profile(df).collect()}
    assert set(rows) == {"k", "v", "s"}
    k = rows["k"]
    assert (k.n_rows, k.n_null, k.n_distinct) == (4, 0, 3)
    assert (k.min_num, k.max_num, k.min_str, k.max_str) == (1.0, 4.0, None, None)
    v = rows["v"]
    assert (v.n_null, v.n_distinct, v.min_num, v.max_num) == (1, 2, 2.5, 7.5)
    s = rows["s"]
    assert (s.n_null, s.n_distinct, s.min_str, s.max_str) == (1, 3, "a", "c")
    assert s.min_num is None and s.max_num is None


def test_profile_approx_mode_runs(spark):
    df = spark.range(100).toDF("k")
    rows = profile(df, exact_distinct=False).collect()
    assert rows[0].n_rows == 100
    # HLL estimate is close on 100 distinct longs
    assert abs(rows[0].n_distinct - 100) <= 5
