"""Python UDTF surface (operators/udtf_ops.py): the LATERAL table
function and its declarative gaps-and-islands twin must be row-identical
— the UDTF carries the Spark-4 API parity, the declarative form carries
the 100 TB plan (doc-partitioned windows + one keyed aggregate)."""

from __future__ import annotations

from arrowhouse_spark.operators.udtf_ops import (
    token_runs_declarative,
    token_runs_udtf_table,
)

SF_DIR = "/root/testdata/sf0.001"


def _rows(df):
    return sorted(
        (r["doc_id"], r["start_pos"], r["token"], r["run_len"])
        for r in df.collect()
    )


def test_token_runs_hand_case(spark):
    df = spark.createDataFrame(
        [
            (1, "a a a b b c"),  # runs: a x3 @0, b x2 @3
            (2, "  x  x y  "),  # irregular spacing: x x @0 in filtered list
            (3, "solo tokens only here"),  # no runs
            (4, None),  # null text -> no rows
            (5, "End end END"),  # case folding -> one run of 3
        ],
        "doc_id long, text string",
    )
    want = [(1, 0, "a", 3), (1, 3, "b", 2), (2, 0, "x", 2), (5, 0, "end", 3)]
    assert _rows(token_runs_declarative(df)) == want
    assert _rows(token_runs_udtf_table(df)) == want


def test_token_runs_udtf_matches_declarative_on_fixture(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    dec = _rows(token_runs_declarative(docs))
    udtf = _rows(token_runs_udtf_table(docs))
    assert dec == udtf
    assert len(dec) > 0  # the fixture's small vocab guarantees runs exist


def test_token_runs_min_run_threshold(spark):
    df = spark.createDataFrame(
        [(1, "a a a b b c c c c")], "doc_id long, text string"
    )
    got = _rows(token_runs_declarative(df, min_run=3))
    assert got == [(1, 0, "a", 3), (1, 5, "c", 4)]
