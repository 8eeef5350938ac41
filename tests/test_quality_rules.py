from __future__ import annotations

import pytest

from arrowhouse_spark.operators.quality import dq_check


def _report(spark, rules, rows=None):
    rows = rows or [
        (1, "F", 10.0, "ok-1"),
        (2, "O", 20.0, "ok-2"),
        (2, "X", -5.0, "bad!"),
        (None, None, None, None),
    ]
    df = spark.createDataFrame(rows, "k long, status string, v double, tag string")
    out = dq_check(df, rules).collect()
    return {(r["rule"], r["col"]): (r["violations"], r["passed"]) for r in out}


def test_dq_rules_count_violations_exactly(spark):
    got = _report(
        spark,
        [
            ("not_null", "k"),
            ("unique", "k"),          # k=2 twice -> 1 violation
            ("in_set", "status", ("F", "O")),
            ("range", "v", 0, 100),
            ("regex", "tag", "ok-[0-9]"),
        ],
    )
    assert got[("not_null", "k")] == (1, False)
    assert got[("unique", "k")] == (1, False)
    assert got[("in_set", "status")] == (1, False)  # 'X'; NULL ignored
    assert got[("range", "v")] == (1, False)  # -5; NULL ignored
    assert got[("regex", "tag")] == (1, False)  # 'bad!'; NULL ignored
    assert len(got) == 5


def test_dq_clean_table_passes_everything(spark):
    rows = [(1, "F", 1.0, "ok-1"), (2, "O", 2.0, "ok-2")]
    got = _report(
        spark,
        [("not_null", "k"), ("unique", "k"), ("range", "v", 0, 10)],
        rows=rows,
    )
    assert all(v == (0, True) for v in got.values())


def test_dq_regex_is_full_match(spark):
    # 'ok-1x' contains the pattern but must NOT fully match
    rows = [(1, "F", 1.0, "ok-1x")]
    got = _report(spark, [("regex", "tag", "ok-[0-9]")], rows=rows)
    assert got[("regex", "tag")] == (1, False)


def test_dq_empty_relation_reports_zero_not_null(spark):
    df = spark.createDataFrame([], "k long, status string, v double, tag string")
    out = dq_check(df, [("not_null", "k"), ("unique", "k")]).collect()
    assert [(r["violations"], r["passed"]) for r in out] == [(0, True)] * 2


def test_dq_unknown_rule_rejected(spark):
    df = spark.range(1)
    with pytest.raises(ValueError, match="unknown dq rule"):
        dq_check(df, [("median_drift", "id")]).collect()
