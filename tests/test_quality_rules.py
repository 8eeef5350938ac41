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


def test_linear_classifier_score_hand_checked(spark):
    """Logit = sum of bucket weights over tokens (+bias), exact integers;
    unknown buckets contribute 0 (the hashing-trick has no OOV)."""
    from pyspark.sql import functions as F

    from arrowhouse_spark.operators.quality import linear_classifier_score
    from arrowhouse_spark.operators.sampling import hash_bucket

    docs = spark.createDataFrame(
        [(1, "aa bb aa"), (2, "cc"), (3, ""), (4, "   "), (5, None)],
        "doc_id long, text string",
    )
    # derive each token's true bucket with the same function, then give
    # aa weight 5, bb weight -2, cc weight 0 (absent from the table)
    toks = spark.createDataFrame([("aa",), ("bb",), ("cc",)], "t string")
    bmap = {
        r.t: r.bucket
        for r in toks.select(
            "t", hash_bucket(F.col("t"), 1024, salt="clf").alias("bucket")
        ).collect()
    }
    weights = spark.createDataFrame(
        [(bmap["aa"], 5), (bmap["bb"], -2)], "bucket long, w long"
    )
    out = {
        r.doc_id: (r.logit, r.n_tokens)
        for r in linear_classifier_score(
            docs, "text", weights, ["doc_id"], bias=-1
        ).collect()
    }
    assert out[1] == (5 + 5 - 2 - 1, 3)  # two aa, one bb, bias
    assert out[2] == (-1, 1)             # cc unweighted -> bias only
    # empty / whitespace / null text: a bias-only row, NOT a dropped doc
    # (a silent drop would bypass any downstream keep/drop threshold)
    assert out[3] == (-1, 0)
    assert out[4] == (-1, 0)
    assert out[5] == (-1, 0)
    assert len(out) == 5
