from __future__ import annotations

import pytest

from arrowhouse_spark.operators.graph import bfs_levels
from arrowhouse_spark.operators.merge import merge_into


def _target(spark):
    return spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)],
        "k long, name string, price double",
    )


def test_merge_into_update_insert_delete(spark):
    src = spark.createDataFrame(
        [(2, 99.0, False), (3, 0.0, True), (9, 42.0, False)],
        "k long, price double, is_del boolean",
    )
    out = {
        r["k"]: (r["name"], r["price"])
        for r in merge_into(
            _target(spark), src, key_cols=["k"], delete_col="is_del"
        ).collect()
    }
    assert out[1] == ("a", 10.0)  # untouched
    assert out[2] == ("b", 99.0)  # updated price, name carried
    assert 3 not in out  # deleted
    assert out[9] == (None, 42.0)  # inserted; non-source cols NULL
    assert len(out) == 3


def test_merge_into_delete_of_absent_key_is_noop(spark):
    src = spark.createDataFrame([(7, 1.0, True)], "k long, price double, is_del boolean")
    out = merge_into(_target(spark), src, key_cols=["k"], delete_col="is_del")
    assert out.count() == 3  # nothing inserted, nothing removed


def test_merge_into_keep_mode_still_inserts_source_values(spark):
    # round-7 advice: 'keep' governs MATCHED rows only — unmatched source
    # rows must insert the SOURCE values, not NULLs from the absent target
    src = spark.createDataFrame(
        [(2, 99.0, False), (9, 42.0, False)],
        "k long, price double, is_del boolean",
    )
    out = {
        r["k"]: (r["name"], r["price"])
        for r in merge_into(
            _target(spark), src, key_cols=["k"],
            when_matched="keep", delete_col="is_del",
        ).collect()
    }
    assert out[2] == ("b", 20.0)  # matched row kept untouched
    assert out[9] == (None, 42.0)  # inserted row carries SOURCE price
    assert len(out) == 4


def test_merge_into_duplicate_source_key_raises(spark):
    src = spark.createDataFrame(
        [(2, 1.0, False), (2, 2.0, False)], "k long, price double, is_del boolean"
    )
    with pytest.raises(Exception, match="duplicate source key"):
        merge_into(_target(spark), src, key_cols=["k"], delete_col="is_del").collect()


def _bfs(spark, edges, seeds, max_hops=6):
    e = spark.createDataFrame(edges, "src long, dst long")
    s = spark.createDataFrame([(x,) for x in seeds], "src long")
    return {
        r["id"]: r["dist"] for r in bfs_levels(e, s, max_hops=max_hops).collect()
    }


def test_bfs_levels_chain_and_unreachable(spark):
    # 1 -> 2 -> 3 -> 4, island 9
    got = _bfs(spark, [(1, 2), (2, 3), (3, 4), (9, 9)], [1])
    assert got == {1: 0, 2: 1, 3: 2, 4: 3}


def test_bfs_min_distance_wins_on_multiple_paths(spark):
    # two paths to 4: 1->2->4 (2 hops) and 1->3->5->4 (3 hops) -> dist 2
    got = _bfs(spark, [(1, 2), (2, 4), (1, 3), (3, 5), (5, 4)], [1])
    assert got[4] == 2 and got[5] == 2


def test_bfs_multi_source_and_hop_cap(spark):
    got = _bfs(spark, [(1, 2), (2, 3), (3, 4)], [1, 3], max_hops=1)
    assert got == {1: 0, 3: 0, 2: 1, 4: 1}  # capped: nothing at dist 2


def _tri(spark, edges):
    from arrowhouse_spark.operators.graph import triangle_count

    df = spark.createDataFrame(edges, "src long, dst long")
    return triangle_count(df).collect()[0]["n_triangles"]


def test_triangle_count_basic(spark):
    # one triangle 1-2-3 plus a dangling edge
    assert _tri(spark, [(1, 2), (2, 3), (3, 1), (3, 4)]) == 1


def test_triangle_count_direction_parallel_and_self_loops_collapse(spark):
    edges = [(1, 2), (2, 1), (2, 3), (3, 1), (1, 1), (2, 3), (3, 2)]
    assert _tri(spark, edges) == 1


def test_triangle_count_k4_has_four(spark):
    import itertools

    edges = [(a, b) for a, b in itertools.combinations([1, 2, 3, 4], 2)]
    assert _tri(spark, edges) == 4


def test_triangle_count_square_has_none(spark):
    assert _tri(spark, [(1, 2), (2, 3), (3, 4), (4, 1)]) == 0
