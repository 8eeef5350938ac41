"""As-of join and sessionization tests (join/window superset operators —
the reference has neither joins, SURVEY.md §2.4, nor event-time notions,
§2.8)."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from arrowhouse_spark.operators.asof import asof_join
from arrowhouse_spark.operators.sessions import session_stats, sessionize


def _ts(m: int) -> dt.datetime:
    return dt.datetime(2024, 1, 1, 0, m, 0)


@pytest.fixture()
def quotes(spark):
    return spark.createDataFrame(
        [
            ("A", _ts(0), 10.0),
            ("A", _ts(5), 11.0),
            ("A", _ts(10), 12.0),
            ("B", _ts(3), 100.0),
        ],
        "sym: string, ts: timestamp, px: double",
    )


@pytest.fixture()
def trades(spark):
    return spark.createDataFrame(
        [
            ("A", _ts(4), 7),   # latest quote at-or-before :04 → 10.0
            ("A", _ts(5), 8),   # exact match :05 → 11.0 (≥ semantics)
            ("A", _ts(20), 9),  # → 12.0
            ("B", _ts(2), 1),   # before any B quote → NULL
            ("C", _ts(1), 2),   # no C quotes → NULL
        ],
        "sym: string, ts: timestamp, qty: int",
    )


def test_asof_backward_basic(spark, trades, quotes):
    out = asof_join(trades, quotes, on="ts", by=["sym"], value_cols=["px"])
    got = {r.qty: r.asof_px for r in out.collect()}
    assert got == {7: 10.0, 8: 11.0, 9: 12.0, 1: None, 2: None}


def test_asof_backward_strict(spark, trades, quotes):
    out = asof_join(
        trades, quotes, on="ts", by=["sym"], value_cols=["px"],
        allow_exact_matches=False,
    )
    got = {r.qty: r.asof_px for r in out.collect()}
    # exact-ts quote (:05 → 11.0) now invisible; previous one (10.0) matches
    assert got == {7: 10.0, 8: 10.0, 9: 12.0, 1: None, 2: None}


def test_asof_forward(spark, trades, quotes):
    out = asof_join(
        trades, quotes, on="ts", by=["sym"], value_cols=["px"],
        direction="forward",
    )
    got = {r.qty: r.asof_px for r in out.collect()}
    # earliest quote at-or-after each trade
    assert got == {7: 11.0, 8: 11.0, 9: None, 1: 100.0, 2: None}


def test_asof_preserves_left_row_count(spark, trades, quotes):
    out = asof_join(trades, quotes, on="ts", by=["sym"], value_cols=["px"])
    assert out.count() == trades.count()
    assert set(out.columns) == set(trades.columns) | {"asof_px"}


def test_asof_plan_is_single_window_no_join(spark, trades, quotes):
    from arrowhouse_spark.plans import report

    r = report(asof_join(trades, quotes, on="ts", by=["sym"], value_cols=["px"]))
    assert not r.has_cartesian and r.sortmerge_joins == 0
    assert not r.has_global_window  # window is partitioned by the keys


def test_sessionize_gaps(spark):
    df = spark.createDataFrame(
        [
            (1, _ts(0)), (1, _ts(1)), (1, _ts(2)),     # session 0
            (1, _ts(30)), (1, _ts(31)),                # session 1 (28-min gap)
            (2, _ts(0)),                               # own key → session 0
        ],
        "user_id: long, ts: timestamp",
    )
    out = sessionize(df, "ts", ["user_id"], gap_seconds=600)
    got = sorted((r.user_id, r.ts.minute, r.session_id) for r in out.collect())
    assert got == [
        (1, 0, 0), (1, 1, 0), (1, 2, 0), (1, 30, 1), (1, 31, 1), (2, 0, 0),
    ]


def test_session_stats(spark):
    df = spark.createDataFrame(
        [(1, _ts(0)), (1, _ts(5)), (1, _ts(40))],
        "user_id: long, ts: timestamp",
    )
    rows = {
        r.session_id: (r.n_events, r.duration_s)
        for r in session_stats(df, "ts", ["user_id"], gap_seconds=600).collect()
    }
    assert rows == {0: (2, 300.0), 1: (1, 0.0)}


def test_ivf_exhaustive_probe_equals_brute_force(spark, sf_dir):
    from arrowhouse_spark.operators.similarity import ann_cosine_ivf, cosine_topk_query

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = emb.filter(F.col("vec_id") == 0).collect()[0].embedding
    exact = [(r.vec_id, r.cos_sim) for r in cosine_topk_query(emb, q, k=5).collect()]
    ivf = [
        (r.vec_id, r.cos_sim)
        for r in ann_cosine_ivf(emb, q, k=5, n_centroids=4, nprobe=4).collect()
    ]
    assert ivf == exact  # probing every cell degrades to exact brute force


def test_ivf_partial_probe_is_subset_and_finds_self(spark, sf_dir):
    from arrowhouse_spark.operators.similarity import ann_cosine_ivf

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = emb.filter(F.col("vec_id") == 0).collect()[0].embedding
    rows = ann_cosine_ivf(emb, q, k=5, n_centroids=4, nprobe=1).collect()
    assert rows[0].vec_id == 0 and abs(rows[0].cos_sim - 1.0) < 1e-5
