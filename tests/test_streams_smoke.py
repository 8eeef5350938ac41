"""One test per trivial stream/source ≡ gtest_streams_smoke.cpp (:30-156):
Null/One/BlocksList/Concat/FilterColumns/Reverse/Union paths."""

from __future__ import annotations

from pyspark.sql import types as T

from arrowhouse_spark.operators import concat, reverse_batches, union_parallel
from arrowhouse_spark.sources import blocks_list, null_source, one_block
from arrowhouse_spark.sources.parquet import read_parquet

SCHEMA = T.StructType(
    [T.StructField("a", T.LongType()), T.StructField("b", T.StringType())]
)


import pytest

pytestmark = pytest.mark.slow  # full tier: streaming/property/e2e (see pytest.ini)


def test_null_source(spark):
    df = null_source(spark, SCHEMA)
    assert df.count() == 0 and df.schema == SCHEMA


def test_one_block(spark):
    df = one_block(spark, [(1, "x"), (2, "y")], SCHEMA)
    assert df.count() == 2


def test_blocks_list(spark):
    df = blocks_list(spark, [[(1, "x")], [(2, "y")], [(3, "z")]], SCHEMA)
    assert sorted(r.a for r in df.collect()) == [1, 2, 3]


def test_blocks_list_empty(spark):
    df = blocks_list(spark, [], SCHEMA)
    assert df.count() == 0


def test_concat_order_preserving(spark):
    a = one_block(spark, [(1, "x")], SCHEMA)
    b = one_block(spark, [(2, "y")], SCHEMA)
    assert [r.a for r in concat([a, b]).coalesce(1).collect()] == [1, 2]


def test_union_parallel(spark):
    parts = [one_block(spark, [(i, "v")], SCHEMA) for i in range(5)]
    assert union_parallel(parts).count() == 5


def test_filter_columns(spark, sf_dir):
    # FilterColumnsBlockInputStream ≡ column selection at the source
    df = read_parquet(spark, f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_quantity"])
    assert df.columns == ["l_orderkey", "l_quantity"]


def test_reverse_batches(spark):
    df = one_block(spark, [(i, "v") for i in range(10)], SCHEMA).coalesce(1)
    out = reverse_batches(df).collect()
    assert [r.a for r in out] == list(range(9, -1, -1))


def test_csv_jsonl_roundtrip(spark, tmp_path):
    from pyspark.sql import types as T

    from arrowhouse_spark.sources.text_formats import (
        read_csv,
        read_jsonl,
        write_csv,
        write_jsonl,
    )

    schema = T.StructType(
        [T.StructField("k", T.LongType()), T.StructField("v", T.StringType())]
    )
    df = spark.createDataFrame([(1, "a"), (2, "b")], schema)
    p_csv, p_json = str(tmp_path / "c"), str(tmp_path / "j")
    write_csv(df, p_csv)
    write_jsonl(df, p_json)
    assert sorted(r.k for r in read_csv(spark, p_csv, schema).collect()) == [1, 2]
    assert sorted(r.v for r in read_jsonl(spark, p_json, schema).collect()) == ["a", "b"]


def test_orc_round_trip_with_pushdown(spark, tmp_path):
    """ORC round trip preserves values; a filtered re-read pushes the
    predicate to the ORC scan (PushedFilters non-empty)."""
    from arrowhouse_spark.sources.text_formats import read_orc, write_orc

    df = spark.createDataFrame(
        [(1, "a", 1.5), (2, "b", -2.0), (3, "c", 0.25)],
        "id: long, s: string, v: double",
    )
    p = str(tmp_path / "t.orc")
    write_orc(df, p)
    back = read_orc(spark, p, df.schema)
    assert sorted(tuple(r) for r in back.collect()) == sorted(
        tuple(r) for r in df.collect()
    )
    plan = (
        back.filter("v > 0")._jdf.queryExecution().executedPlan().toString()
    )
    assert "PushedFilters: [" in plan and "IsNotNull(v)" in plan
