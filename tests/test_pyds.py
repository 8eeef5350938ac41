"""Custom Python DataSource (sources/pyds.py): registration, deterministic
generation, partition planning, source-side filter pushdown, streaming."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from arrowhouse_spark.sources.pyds import (
    _SynthEventsReader,
    _row,
    register_synth_events,
)


@pytest.fixture()
def synth(spark):
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    register_synth_events(spark)
    return spark


def test_batch_read_is_deterministic_and_partitioned(synth):
    df = (
        synth.read.format("synth_events")
        .option("n_rows", "1000")
        .option("shard_rows", "250")
        .load()
    )
    assert df.count() == 1000
    assert df.rdd.getNumPartitions() == 4
    got = {r["event_id"]: tuple(r) for r in df.filter("event_id < 5").collect()}
    for i in range(5):
        assert got[i] == _row(i, 100)


def test_push_filters_shrinks_planned_partitions(synth):
    from pyspark.sql.datasource import (
        GreaterThanOrEqual,
        IsNotNull,
        LessThan,
    )

    r = _SynthEventsReader({"n_rows": "1000", "shard_rows": "250"})
    residual = list(
        r.pushFilters(
            [
                GreaterThanOrEqual(("event_id",), 900),
                LessThan(("event_id",), 950),
                IsNotNull(("event_id",)),
            ]
        )
    )
    assert residual == []  # all three consumed at the source
    assert (r.lo, r.hi) == (900, 950)
    assert len(r.partitions()) == 1  # vs 4 unfiltered
    # end-to-end: the filtered scan returns exactly the python model
    df = (
        synth.read.format("synth_events")
        .option("n_rows", "1000")
        .load()
        .filter("event_id >= 900 and event_id < 950")
    )
    assert df.count() == 50
    assert {r["event_id"] for r in df.collect()} == set(range(900, 950))


def test_unsupported_filter_stays_residual_and_correct(synth):
    from pyspark.sql.datasource import EqualTo

    r = _SynthEventsReader({"n_rows": "1000"})
    residual = list(r.pushFilters([EqualTo(("user_id",), 7)]))
    assert len(residual) == 1  # user_id predicate is Spark's to apply
    df = (
        synth.read.format("synth_events")
        .option("n_rows", "1000")
        .load()
        .filter("user_id = 7")
    )
    want = sum(1 for i in range(1000) if _row(i, 100)[1] == 7)
    assert df.count() == want


def test_stream_reader_drains_to_batch_parity(synth):
    sdf = (
        synth.readStream.format("synth_events")
        .option("n_rows", "300")
        .option("batch_rows", "120")
        .load()
    )
    q = (
        sdf.groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("sv"))
        .writeStream.format("memory")
        .queryName("pyds_parity")
        .outputMode("complete")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    streamed = {
        r["event_type"]: (r["n"], round(r["sv"], 6))
        for r in synth.sql("SELECT * FROM pyds_parity").collect()
    }
    batch = {
        r["event_type"]: (r["n"], round(r["sv"], 6))
        for r in synth.read.format("synth_events")
        .option("n_rows", "300")
        .load()
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("sv"))
        .collect()
    }
    assert streamed == batch
