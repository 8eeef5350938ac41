"""Hand-checked tests for gaps-and-islands, interval-union coverage, and
k-anonymity release (operators/intervals.py, operators/privacy.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from arrowhouse_spark.operators.intervals import (
    gaps_islands,
    interval_union_length,
)
from arrowhouse_spark.operators.privacy import kanon_release


def test_gaps_islands_hand_checked(spark):
    # user a: runs [1,2,3], [7], [9,10]; user b: single run [4,5]
    rows = [("a", s) for s in (1, 2, 3, 7, 9, 10)] + [("b", 4), ("b", 5)]
    df = spark.createDataFrame(rows, "k string, seq long")
    got = {
        (r.k, r.st_start): (r.st_end, r.st_len)
        for r in gaps_islands(df, ["k"], "seq", out_prefix="st").collect()
    }
    assert got == {
        ("a", 1): (3, 3),
        ("a", 7): (7, 1),
        ("a", 9): (10, 2),
        ("b", 4): (5, 2),
    }


def test_interval_union_length_hand_checked(spark):
    # user a: [0,10) [5,15) overlap -> [0,15); [20,30) touching [30,40)
    # merge (half-open); [100,101) isolated => covered 15+20+1=36, 3 runs
    rows = [
        ("a", 0, 10), ("a", 5, 15), ("a", 20, 30), ("a", 30, 40),
        ("a", 100, 101),
        # user b: containment [0,100) ⊃ [10,20) => 100, 1 run
        ("b", 0, 100), ("b", 10, 20),
    ]
    df = spark.createDataFrame(rows, "k string, s long, e long")
    got = {
        r.k: (r.covered, r.n_intervals)
        for r in interval_union_length(df, ["k"], "s", "e").collect()
    }
    assert got == {"a": (36, 3), "b": (100, 1)}


def test_interval_union_is_partition_invariant(spark):
    import random

    rng = random.Random(9)
    rows = [
        ("u%d" % rng.randrange(3), s := rng.randrange(1000), s + rng.randrange(1, 50))
        for _ in range(500)
    ]
    df = spark.createDataFrame(rows, "k string, s long, e long")
    a = sorted(
        map(tuple, interval_union_length(df, ["k"], "s", "e").collect())
    )
    b = sorted(
        map(
            tuple,
            interval_union_length(
                df.repartition(7, "e"), ["k"], "s", "e"
            ).collect(),
        )
    )
    # python model: merge per key
    from collections import defaultdict

    by = defaultdict(list)
    for k, s, e in rows:
        by[k].append((s, e))
    want = []
    for k, iv in by.items():
        iv.sort()
        runs = []
        for s, e in iv:
            if runs and s <= runs[-1][1]:
                runs[-1][1] = max(runs[-1][1], e)
            else:
                runs.append([s, e])
        want.append((k, sum(e - s for s, e in runs), len(runs)))
    assert a == b == sorted(want)


def test_kanon_release_hand_checked(spark):
    # group (x): users 1,2,3 (>=3 kept at k=3); group (y): users 1,2 only
    # (suppressed); group (z): user 9 (suppressed). Suppressed row counts
    # DISTINCT individuals across suppressed groups: {1,2,9} = 3.
    rows = [
        ("x", 1, 10.0), ("x", 2, 10.0), ("x", 3, 10.0), ("x", 1, 5.0),
        ("y", 1, 1.0), ("y", 2, 1.0),
        ("z", 9, 7.0),
    ]
    df = spark.createDataFrame(rows, "g string, uid long, v double")
    out = kanon_release(
        df, ["g"], "uid",
        {"n_rows": F.count(F.lit(1)).cast("long"), "sv": F.sum("v")},
        k=3,
    ).collect()
    kept = {r.g: (r.n_individuals, r.n_rows, r.sv, r.suppressed) for r in out}
    assert kept["x"] == (3, 4, 35.0, False)
    assert kept["__suppressed__"] == (3, 3, 9.0, True)
    assert set(kept) == {"x", "__suppressed__"}
    # totals reconcile
    assert sum(r.sv for r in out) == sum(v for _, _, v in rows)

    # all-kept input: no empty remainder row
    out2 = kanon_release(
        df.filter(F.col("g") == "x"), ["g"], "uid",
        {"n_rows": F.count(F.lit(1)).cast("long")}, k=3,
    ).collect()
    assert [r.g for r in out2] == ["x"]

    with pytest.raises(ValueError):
        kanon_release(df, ["g"], "uid", {}, k=0)


def test_attribution_position_based_reconciles(spark, sf_dir):
    """U-shaped credits must reconcile exactly: every purchase hands out
    exactly 1,000,000 millionths (incl. the unattributed bucket), so the
    integer total equals 1e6 x purchase count."""
    from pyspark.sql import functions as F

    from arrowhouse_spark import suite

    out = suite._QUERIES["attribution_position_based"](spark, sf_dir)
    total_credit = out.agg(F.sum("credit_millionths")).first()[0]
    ev = suite._events(spark, sf_dir)
    n_purch = ev.filter(F.col("event_type") == "purchase").count()
    assert total_credit == 1_000_000 * n_purch
    rows = out.collect()
    assert all(r.credit_millionths > 0 and r.revenue_micro >= 0 for r in rows)
    assert {r.channel for r in rows} <= {
        "email", "search", "social", "direct", "unattributed"
    }
