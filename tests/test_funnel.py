"""funnel_steps (operators/funnel.py) vs a per-user Python replay model."""

from __future__ import annotations

import random

from arrowhouse_spark.operators.funnel import funnel_steps


def _model(events, steps, window=None):
    """t_k = min ts of a step-k event at/after t_{k-1} (and within
    t_1 + window for k ≥ 2) — the operator's cascaded-min semantics."""
    by_user = {}
    for u, t, ts in events:
        by_user.setdefault(u, []).append((ts, t))
    out = {}
    for u, evs in by_user.items():
        prev = None
        start = None
        count = 0
        for step in steps:
            cands = [
                ts
                for ts, t in evs
                if t == step
                and (prev is None or ts >= prev)
                and (window is None or prev is None or ts <= start + window)
            ]
            if not cands:
                break
            prev = min(cands)
            if start is None:
                start = prev
            count += 1
        if count:
            out[u] = count
    return out


def test_funnel_matches_model(spark):
    rng = random.Random(9)
    types = ["signup", "click", "purchase", "other"]
    events = [
        (rng.randint(0, 40), rng.choice(types), rng.randint(0, 1000))
        for _ in range(600)
    ]
    df = spark.createDataFrame(events, "user_id long, event_type string, ts long")
    steps = ["signup", "click", "purchase"]
    got = {
        r.user_id: r.max_step
        for r in funnel_steps(df, steps).collect()
    }
    assert got == _model(events, steps)


def test_funnel_requires_order(spark):
    # click before signup must not count as step 2
    df = spark.createDataFrame(
        [(1, "click", 10), (1, "signup", 20), (2, "signup", 5), (2, "click", 6)],
        "user_id long, event_type string, ts long",
    )
    got = {
        r.user_id: r.max_step
        for r in funnel_steps(df, ["signup", "click"]).collect()
    }
    assert got == {1: 1, 2: 2}


def test_funnel_window_bound(spark):
    df = spark.createDataFrame(
        [(1, "signup", 0), (1, "click", 500), (2, "signup", 0), (2, "click", 50)],
        "user_id long, event_type string, ts long",
    )
    got = {
        r.user_id: r.max_step
        for r in funnel_steps(df, ["signup", "click"], window=100).collect()
    }
    assert got == {1: 1, 2: 2}
