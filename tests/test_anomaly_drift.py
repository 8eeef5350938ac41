from __future__ import annotations

import math

import pytest

from arrowhouse_spark.operators.profile import psi_drift
from arrowhouse_spark.operators.timeseries import zscore_outliers


def test_zscore_flags_the_planted_outlier(spark):
    vals = [10.0] * 20 + [10.5] * 20 + [1000.0]
    rows = [("a", v) for v in vals] + [("b", 5.0)]
    df = spark.createDataFrame(rows, "k string, v double")
    out = zscore_outliers(df, key_cols=["k"], value_col="v", threshold=3.0)
    flagged = [r["v"] for r in out.filter("is_outlier").collect()]
    assert flagged == [1000.0]
    # single-row key: sigma = 0 -> never flagged, zscore NULL not crash
    b = out.filter("k = 'b'").collect()[0]
    assert b["is_outlier"] is False and b["zscore"] is None


def test_zscore_matches_closed_form(spark):
    import statistics

    vals = [1.0, 2.0, 3.0, 4.0, 100.0]
    df = spark.createDataFrame([("a", v) for v in vals], "k string, v double")
    out = {r["v"]: r["zscore"] for r in zscore_outliers(df, ["k"], "v").collect()}
    mu = statistics.fmean(vals)
    sigma = math.sqrt(sum((v - mu) ** 2 for v in vals) / len(vals))
    for v in vals:
        assert out[v] == pytest.approx(round((v - mu) / sigma, 6), abs=1e-6)


def test_psi_drift_identical_distributions_near_zero(spark):
    ref = spark.createDataFrame([("x",)] * 50 + [("y",)] * 50, "c string")
    out = psi_drift(ref, ref, cat_col="c").collect()
    assert all(abs(r["psi_term"]) < 1e-9 for r in out)


def test_psi_drift_detects_shift_and_handles_one_sided_category(spark):
    ref = spark.createDataFrame([("x",)] * 90 + [("y",)] * 10, "c string")
    cur = spark.createDataFrame([("x",)] * 10 + [("z",)] * 90, "c string")
    rows = {r["cat"]: r for r in psi_drift(ref, cur, cat_col="c").collect()}
    total = sum(r["psi_term"] for r in rows.values())
    assert total > 0.25  # "shifted" by the standard PSI convention
    assert set(rows) == {"x", "y", "z"}
    assert rows["y"]["n_cur"] == 0 and rows["z"]["n_ref"] == 0
    for r in rows.values():  # smoothing keeps one-sided categories finite
        assert math.isfinite(r["psi_term"])
