from __future__ import annotations

import numpy as np
import pytest

from arrowhouse_spark.operators.text import zipf_fit


def _np_zipf(texts):
    from collections import Counter

    freq = Counter(t for s in texts for t in s.split() if t)
    classes = Counter(freq.values())
    pts = []
    for f, n in classes.items():
        cum_before = sum(n2 for f2, n2 in classes.items() if f2 > f)
        midrank = cum_before + (n + 1) / 2.0
        pts.append((np.log(midrank), np.log(f), float(n)))
    x, y, w = map(np.array, zip(*pts))
    sw, swx, swy = w.sum(), (w * x).sum(), (w * y).sum()
    swxy, swx2 = (w * x * y).sum(), (w * x * x).sum()
    slope = (sw * swxy - swx * swy) / (sw * swx2 - swx * swx)
    inter = (swy - slope * swx) / sw
    return slope, inter, len(freq), sum(freq.values())


def test_zipf_fit_matches_dense_model(spark):
    texts = [
        "a a a a b b c",
        "a b b c d e",
        "a c  d",  # double space: empty tokens filtered
    ]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    r = zipf_fit(df).collect()[0]
    slope, inter, vocab, occ = _np_zipf(texts)
    assert r["zipf_slope"] == pytest.approx(round(slope, 6), abs=2e-6)
    assert r["zipf_intercept"] == pytest.approx(round(inter, 6), abs=2e-6)
    assert r["n_vocab"] == vocab
    assert r["n_occurrences"] == occ


def test_zipf_natural_corpus_slope_is_negative(spark, sf_dir):
    df = spark.read.parquet(f"{sf_dir}/documents.parquet")
    r = zipf_fit(df).collect()[0]
    assert r["zipf_slope"] < 0  # higher rank -> lower frequency, always
    assert r["n_vocab"] >= 1
