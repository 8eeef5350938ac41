from __future__ import annotations

import numpy as np
import pytest

from arrowhouse_spark.operators.pca import (
    embedding_covariance,
    pca_fit,
    pca_project,
)


def _df(spark, x):
    return spark.createDataFrame(
        [(i, [float(v) for v in row]) for i, row in enumerate(x)],
        "id long, embedding array<double>",
    )


def test_covariance_matches_numpy(spark):
    rng = np.random.default_rng(3)
    x = rng.normal(size=(200, 5))
    got = {
        (r["i"], r["j"]): r["cov"]
        for r in embedding_covariance(_df(spark, x), dims=5).collect()
    }
    want = np.cov(x, rowvar=False, bias=True)
    assert len(got) == 15  # upper triangle of 5x5
    for (i, j), v in got.items():
        assert v == pytest.approx(want[i, j], abs=1e-12)


def test_pca_fit_recovers_dominant_direction(spark):
    rng = np.random.default_rng(4)
    direction = np.array([3.0, 4.0, 0.0]) / 5.0
    x = rng.normal(size=(500, 1)) * direction * 10 + rng.normal(
        size=(500, 3)
    ) * 0.01
    fit = pca_fit(_df(spark, x), k=2)
    c0 = fit["components"][0]
    assert abs(abs(np.dot(c0, direction)) - 1.0) < 1e-3
    assert fit["explained_variance"][0] > 100 * fit["explained_variance"][1]
    assert fit["total_variance"] == pytest.approx(
        np.cov(x, rowvar=False, bias=True).trace(), rel=1e-9
    )


def test_pca_project_matches_numpy_dot(spark):
    rng = np.random.default_rng(5)
    x = rng.normal(size=(50, 6))
    fit = pca_fit(_df(spark, x), k=3)
    out = pca_project(_df(spark, x), fit["components"]).collect()
    comps = fit["components"]
    for r in out:
        want = comps @ np.array(r["embedding"])
        for m in range(3):
            assert r[f"pc{m}"] == pytest.approx(round(want[m], 6), abs=1e-6)


def test_pca_sign_pin_is_deterministic(spark):
    rng = np.random.default_rng(6)
    x = rng.normal(size=(100, 4))
    a = pca_fit(_df(spark, x), k=2)["components"]
    b = pca_fit(_df(spark, x), k=2)["components"]
    assert np.allclose(a, b)
    for comp in a:  # convention: largest-|.| coordinate is positive
        assert comp[np.argmax(np.abs(comp))] > 0
