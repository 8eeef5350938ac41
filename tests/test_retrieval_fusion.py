from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def test_rrf_fuse_combines_and_keeps_per_list_ranks(spark):
    from arrowhouse_spark.operators.text import rrf_fuse

    a = spark.createDataFrame([(1, 1), (2, 2), (3, 3)], "doc_id long, rank int")
    b = spark.createDataFrame([(3, 1), (1, 2), (9, 3)], "doc_id long, rank int")
    out = rrf_fuse([("lex", a), ("dense", b)], c=60, k=10).collect()
    got = {r["doc_id"]: r for r in out}
    # doc 1: 1/61 + 1/62; doc 3: 1/63 + 1/61; doc 2 lex-only; doc 9 dense-only
    assert got[1]["rrf_score"] == pytest.approx(
        round(1 / 61 + 1 / 62, 9), abs=1e-12
    )
    assert got[3]["rrf_score"] == pytest.approx(
        round(1 / 63 + 1 / 61, 9), abs=1e-12
    )
    assert got[2]["dense_rank"] is None and got[2]["lex_rank"] == 2
    assert got[9]["lex_rank"] is None and got[9]["dense_rank"] == 3
    # ordering: 1 (0.0325..) > 3 (0.0322..) > singles
    ordered = [r["doc_id"] for r in out]
    assert ordered[:2] == [1, 3]


def test_rrf_fuse_empty_rankings_rejected(spark):
    from arrowhouse_spark.operators.text import rrf_fuse

    with pytest.raises(ValueError, match="at least one"):
        rrf_fuse([])


def test_rrf_fuse_topk_truncates_deterministically(spark):
    from arrowhouse_spark.operators.text import rrf_fuse

    # all equal scores -> tie-break on doc_id ascending, k=3
    a = spark.createDataFrame(
        [(i, 1) for i in (5, 2, 9, 1)], "doc_id long, rank int"
    )
    out = rrf_fuse([("only", a)], k=3).collect()
    assert [r["doc_id"] for r in out] == [1, 2, 5]


def test_ancestor_rollup_matches_python_model(spark):
    from arrowhouse_spark.operators.graph import ancestor_rollup

    n = 13
    df = spark.createDataFrame(
        [(i, float(i)) for i in range(n)], "id long, v double"
    )
    out = {
        r["ancestor"]: (r["n_subtree"], r["sum_v"], r["max_depth_below"])
        for r in ancestor_rollup(
            df,
            id_col="id",
            parent_expr="cur DIV 10",
            value_col="v",
            root_pred="cur = 0",
        ).collect()
    }
    # python model: every node contributes to each ancestor on its chain
    want: dict[int, list[float]] = {}
    for i in range(n):
        cur, depth = i, 0
        while True:
            st = want.setdefault(cur, [0, 0.0, 0])
            st[0] += 1
            st[1] += float(i)
            st[2] = max(st[2], depth)
            if cur == 0:
                break
            cur, depth = cur // 10, depth + 1
    assert set(out) == set(want)
    for k, (cnt, sv, dep) in want.items():
        assert out[k][0] == cnt
        assert out[k][1] == pytest.approx(sv)
        assert out[k][2] == dep


def test_ancestor_rollup_cur_substring_identifiers_untouched(spark):
    # round-7 advice: the 'cur' rewrite must be word-boundary, so an
    # expression whose identifiers merely CONTAIN the letters (a column
    # named 'curve') compiles instead of corrupting to '(cur)ve'
    from arrowhouse_spark.operators.graph import ancestor_rollup

    df = spark.createDataFrame(
        [(i, float(i), 10) for i in range(13)], "id long, v double, curve int"
    )
    # greatest(cur DIV 10, cur - cur) exercises cur twice; 'curve' never
    # appears in the fragment but a naive substring rewrite of a fragment
    # like this one's docstring example showed would break it
    out = ancestor_rollup(
        df.select("id", "v"),
        id_col="id",
        parent_expr="greatest(cur DIV 10, cur - cur)",
        value_col="v",
        root_pred="cur = 0",
    ).collect()
    assert {r["ancestor"] for r in out} == {0, 1, 10, 11, 12} | set(range(2, 10))
    # and a fragment that actually CONTAINS a cur-prefixed identifier:
    # current_date() is a zero-arg SQL function whose name must survive
    got = ancestor_rollup(
        df.select("id", "v"),
        id_col="id",
        parent_expr="cur DIV (10 + 0 * year(current_date()))",
        value_col="v",
        root_pred="cur = 0",
    ).collect()
    assert len(got) == len(out)


def test_mmr_topk_hand_checked_diversity_beats_plain_topk(spark):
    """Two near-identical high-relevance vectors: plain top-2 takes both,
    MMR must take one of them plus the diverse lower-relevance vector."""
    from pyspark.sql import functions as F

    from arrowhouse_spark.operators.similarity import mmr_topk

    # query (1, 0.5); a & b nearly identical high relevance; c orthogonal
    # to them but relevant via the y-axis -> wins round 2 on diversity
    rows = [
        (1, [1.0, 0.0]),      # a: s = 1000*1000 = 1e6 (quantized)
        (2, [0.999, 0.0]),    # b: s = 999000, pen vs a = 999000 -> score 0
        (3, [0.0, 0.9]),      # c: s = 900*500 = 450000, pen vs a = 0
    ]
    vecs = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    q = spark.createDataFrame(
        [(0, [1.0, 0.5])], "vec_id long, embedding array<double>"
    )
    out = {r.rank: (r.vec_id, r.s, r.penalty, r.score)
           for r in mmr_topk(vecs, q, k=3, pool_n=10).collect()}
    assert out[1] == (1, 1000000, 0, 1000000)
    # round 2: c (450000 - 0) beats b (999000 - 999000 = 0)
    assert out[2] == (3, 450000, 0, 450000)
    # round 3: b remains; penalty = max(dot(b,a)=999000, dot(b,c)=0)
    assert out[3] == (2, 999000, 999000, 0)

    # plain top-2 by relevance would have been {1, 2}: MMR diverges
    picks = [r.vec_id for r in mmr_topk(vecs, q, k=2, pool_n=10).collect()]
    assert set(picks) == {1, 3}
