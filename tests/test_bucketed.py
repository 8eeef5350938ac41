"""Bucketed-table co-location: the join and the aggregation on the bucket
key must plan with ZERO shuffle exchanges — the write-side layout contract
that replaces repeated fact-table shuffles at 100 TB."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from arrowhouse_spark.plans import report
from arrowhouse_spark.sources.bucketed import co_located_join, write_bucketed


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_dir):
    # AQE coalescing must not repartition bucketed reads; disabling broadcast
    # forces the join to prove co-location rather than hide behind a broadcast
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_quantity"
    )
    o = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_totalprice"
    )
    write_bucketed(li, "t_lineitem_b", ["l_orderkey"], 4, sort_cols=["l_orderkey"])
    write_bucketed(
        o.withColumnRenamed("o_orderkey", "l_orderkey"),
        "t_orders_b",
        ["l_orderkey"],
        4,
        sort_cols=["l_orderkey"],
    )
    yield "t_lineitem_b", "t_orders_b"
    spark.sql("DROP TABLE IF EXISTS t_lineitem_b")
    spark.sql("DROP TABLE IF EXISTS t_orders_b")


def test_bucketed_join_has_no_exchange(spark, bucketed_tables):
    lt, rt = bucketed_tables
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = co_located_join(spark, lt, rt, ["l_orderkey"])
        r = report(j)
        assert r.exchanges == 0, f"bucketed join still shuffles: {r.operators}"
        assert r.sortmerge_joins == 1
        assert j.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_bucketed_groupby_has_no_exchange(spark, bucketed_tables):
    lt, _ = bucketed_tables
    agg = spark.table(lt).groupBy("l_orderkey").agg(F.sum("l_quantity").alias("q"))
    r = report(agg)
    assert r.exchanges == 0, f"bucketed groupBy still shuffles: {r.operators}"
    assert agg.count() > 0


def test_bucketed_join_matches_unbucketed(spark, sf_dir, bucketed_tables):
    lt, rt = bucketed_tables
    j = co_located_join(spark, lt, rt, ["l_orderkey"])
    got = j.agg(F.round(F.sum("l_quantity"), 2), F.count(F.lit(1))).collect()[0]
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    exp = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .agg(F.round(F.sum("l_quantity"), 2), F.count(F.lit(1)))
        .collect()[0]
    )
    assert tuple(got) == tuple(exp)


def test_bucketed_band_store_probe_no_store_exchange(spark):
    """The incremental-MinHash ops claim (SCALE.md): 'the store written
    bucketed by (band, bucket) co-locates the daily batch against years of
    history without moving it'. Prove it: write the band index as a table
    bucketed by (band, bucket) and plan the store-probe join — the STORE
    side must read with NO shuffle exchange (only the small daily-batch
    side exchanges to match the bucketing)."""
    from arrowhouse_spark.operators.dedup import (
        minhash_band_index,
        minhash_signature,
    )
    from arrowhouse_spark.sources.bucketed import write_bucketed

    hist = spark.createDataFrame(
        [(i, " ".join(f"h{i}_{j}" for j in range(30))) for i in range(40)],
        ["doc_id", "text"],
    )
    idx = minhash_band_index(minhash_signature(hist))
    spark.sql("DROP TABLE IF EXISTS t_band_store_b")
    write_bucketed(idx, "t_band_store_b", ["band", "bucket"], 4)
    try:
        store = spark.table("t_band_store_b")
        day = spark.createDataFrame(
            [(100, " ".join(f"d{j}" for j in range(30)))],
            ["doc_id", "text"],
        )
        day_idx = minhash_band_index(minhash_signature(day))
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            def probe_against(rel):
                return day_idx.alias("l").join(
                    rel.alias("r").withColumnRenamed("doc_id", "r_id"),
                    ["band", "bucket"],
                )

            bucketed = report(probe_against(store))
            # bucketed probe: exactly the DAY side's two exchanges remain
            # (shingle_relation's internal repartition-by-doc_id + the
            # join-key shuffle); the store side reads its buckets in place
            assert bucketed.exchanges == 2, bucketed.operators
            # differential: the identical probe against the store computed
            # in-flight (unbucketed) pays the store side's own two
            # exchanges on top — the shuffles the at-rest layout eliminates
            unbucketed = report(probe_against(idx))
            assert unbucketed.exchanges == 4, unbucketed.operators
            assert (
                bucketed.sortmerge_joins >= 1
                or "ShuffledHashJoin" in bucketed.operators
            )
        finally:
            spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    finally:
        spark.sql("DROP TABLE IF EXISTS t_band_store_b")
