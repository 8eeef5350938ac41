"""Structured-Streaming operator tests: file-source micro-batches through the
streaming dedup / replace-latest / windowed-agg operators into memory sinks."""

from __future__ import annotations

import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from arrowhouse_spark.streaming import (
    read_parquet_stream,
    stream_dedup_exact,
    stream_replace_latest,
    stream_sessionize,
    stream_windowed_agg,
)

EVENT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("event_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("value", T.DoubleType()),
    ]
)


pytestmark = pytest.mark.slow  # full tier: streaming/property/e2e (see pytest.ini)


@pytest.fixture()
def stream_dir(spark):
    d = tempfile.mkdtemp(prefix="ah_stream_")
    import datetime as dt

    base = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows1 = [
        (1, 10, "a", base, 1.0),
        (1, 11, "b", base + dt.timedelta(minutes=5), 2.0),
        (2, 12, "a", base + dt.timedelta(minutes=10), 3.0),
        (1, 10, "a", base, 1.0),  # exact dup of event 10
    ]
    rows2 = [
        (1, 13, "c", base + dt.timedelta(minutes=90), 4.0),
        (2, 9, "z", base + dt.timedelta(minutes=1), 5.0),  # older version for user 2
    ]
    spark.createDataFrame(rows1, EVENT_SCHEMA).coalesce(1).write.parquet(f"{d}/b1")
    spark.createDataFrame(rows2, EVENT_SCHEMA).coalesce(1).write.parquet(f"{d}/b2")
    # single source dir with both files
    src = f"{d}/src"
    os.makedirs(src)
    for sub in ("b1", "b2"):
        for f_ in os.listdir(f"{d}/{sub}"):
            if f_.endswith(".parquet"):
                shutil.copy(f"{d}/{sub}/{f_}", f"{src}/{sub}_{f_}")
    yield src
    shutil.rmtree(d, ignore_errors=True)


def _run_to_memory(sdf, name: str, mode: str):
    q = (
        sdf.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return q


def test_stream_dedup_exact(spark, stream_dir):
    sdf = read_parquet_stream(spark, stream_dir, EVENT_SCHEMA)
    out = stream_dedup_exact(sdf, ["user_id", "event_id"], "ts")
    _run_to_memory(out, "dedup_sink", "append")
    rows = spark.sql("SELECT * FROM dedup_sink").collect()
    # 6 input rows, one exact duplicate removed
    assert len(rows) == 5
    assert len({(r.user_id, r.event_id) for r in rows}) == 5


def test_stream_replace_latest(spark, stream_dir):
    sdf = read_parquet_stream(spark, stream_dir, EVENT_SCHEMA)
    out = stream_replace_latest(
        sdf, key_col="user_id", version_col="event_id", value_cols=["event_type"]
    )
    _run_to_memory(out, "replace_sink", "update")
    rows = spark.sql(
        "SELECT user_id, event_type, event_id FROM replace_sink"
    ).collect()
    # final state per user: user 1 -> event 13 'c'; user 2 -> event 12 'a'
    # (event 9 must NOT replace 12 despite arriving later)
    final = {}
    for r in rows:
        final[r.user_id] = (r.event_type, r.event_id)
    assert final[1] == ("c", 13)
    assert final[2] == ("a", 12)


def test_stream_windowed_agg(spark, stream_dir):
    sdf = read_parquet_stream(spark, stream_dir, EVENT_SCHEMA)
    out = stream_windowed_agg(sdf, "ts", "1 hour", "2 hours")
    _run_to_memory(out, "window_sink", "append" if False else "update")
    rows = spark.sql("SELECT * FROM window_sink").collect()
    got = {str(r.window_start): (r.n, r.sum_value) for r in rows}
    # hour 0: events 10,11,12,9 + dup of 10 (dedup NOT applied here) = 5 rows
    assert got["2024-01-01 00:00:00"] == (5, 12.0)
    # hour 1: event 13
    assert got["2024-01-01 01:00:00"] == (1, 4.0)


def test_stream_sessionize(spark, stream_dir):
    from arrowhouse_spark.streaming import stream_sessionize

    sdf = read_parquet_stream(spark, stream_dir, EVENT_SCHEMA)
    out = stream_sessionize(sdf, "ts", ["user_id"], gap="30 minutes")
    q = (
        out.writeStream.format("memory")
        .queryName("sess_out")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("select * from sess_out").collect()
    got = {(r.user_id, r.n_events) for r in rows}
    # user 1: events at :00,:05 (one session incl. the dup row) then :90
    # (own session); user 2: :01 and :10 merge into one session
    assert (1, 3) in got and (1, 1) in got and (2, 2) in got
    assert len(rows) == 3


def test_stream_interval_join(spark, stream_dir):
    from arrowhouse_spark.streaming import stream_interval_join

    # left = "a" events, right = everything else, matched per user within 1h
    # before the left event
    sdf = read_parquet_stream(spark, stream_dir, EVENT_SCHEMA)
    left = (
        sdf.filter(F.col("event_type") == "a")
        .select("user_id", F.col("event_id").alias("a_id"), F.col("ts").alias("a_ts"))
    )
    right = (
        sdf.filter(F.col("event_type") != "a")
        .select("user_id", F.col("event_id").alias("o_id"), F.col("ts").alias("o_ts"))
    )
    out = stream_interval_join(
        left, right, keys=["user_id"], left_ts="a_ts", right_ts="o_ts",
        lookback="1 hour",
    )
    q = (
        out.writeStream.format("memory")
        .queryName("sj_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("select * from sj_out").collect()
    got = {(r.user_id, r.a_id, r.o_id) for r in rows}
    # user 2: "a" at :10 (id 12) sees "z" at :01 (id 9); the duplicated "a"
    # row (id 10, user 1) precedes every non-"a" user-1 event, so no match.
    assert got == {(2, 12, 9)}


# ---------------------------------------------------------------------------
# Per-batch golden tests: fixed input files, one file per micro-batch (file
# mtimes force the order), every batch's exact output pinned — the streaming
# semantics are asserted as tightly as the batch operators' oracles.
# ---------------------------------------------------------------------------


@pytest.fixture()
def ordered_stream_dir(spark):
    """Two parquet files with explicit mtimes so the file source reads b1
    then b2, one per micro-batch under maxFilesPerTrigger=1."""
    import datetime as dt
    import time

    d = tempfile.mkdtemp(prefix="ah_golden_")
    base = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows1 = [
        (1, 10, "a", base, 1.0),
        (1, 11, "b", base + dt.timedelta(minutes=5), 2.0),
        (2, 12, "a", base + dt.timedelta(minutes=10), 3.0),
        (1, 10, "a", base, 1.0),  # exact dup of event 10
    ]
    rows2 = [
        (1, 13, "c", base + dt.timedelta(minutes=90), 4.0),
        (2, 9, "z", base + dt.timedelta(minutes=1), 5.0),  # stale for user 2
    ]
    src = f"{d}/src"
    os.makedirs(src)
    now = time.time()
    for i, rows in enumerate([rows1, rows2], start=1):
        tmp = f"{d}/b{i}"
        spark.createDataFrame(rows, EVENT_SCHEMA).coalesce(1).write.parquet(tmp)
        [pf] = [f_ for f_ in os.listdir(tmp) if f_.endswith(".parquet")]
        dst = f"{src}/b{i}.parquet"
        shutil.copy(f"{tmp}/{pf}", dst)
        os.utime(dst, (now - 3600 + i * 60, now - 3600 + i * 60))
    yield src
    shutil.rmtree(d, ignore_errors=True)


def _collect_batches(spark, sdf, mode: str):
    """Run one file per micro-batch; return {batch_id: sorted row tuples}
    for non-empty batches (no-data watermark-commit batches are dropped)."""
    batches: dict[int, list[tuple]] = {}

    def sink(bdf, bid):
        rows = [tuple(r) for r in bdf.collect()]
        if rows:
            batches[int(bid)] = sorted(rows, key=repr)

    q = (
        sdf.writeStream.foreachBatch(sink)
        .outputMode(mode)
        .option("maxFilesPerTrigger", 1)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return batches


def test_stream_replace_latest_per_batch_golden(spark, ordered_stream_dir):
    """Batch 1: per-key winners of file b1. Batch 2: user 1 upgraded by
    event 13; user 2 re-emits its UNCHANGED winner (stale event 9 must not
    replace 12) — the exact update-mode contract, pinned per batch."""
    sdf = (
        spark.readStream.schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(ordered_stream_dir)
    )
    out = stream_replace_latest(
        sdf, key_col="user_id", version_col="event_id", value_cols=["event_type"]
    )
    batches = _collect_batches(spark, out, "update")
    assert len(batches) == 2, f"expected 2 data batches, got {sorted(batches)}"
    b0, b1 = (batches[k] for k in sorted(batches))
    assert sorted(b0) == [(1, "b", 11), (2, "a", 12)]
    assert sorted(b1) == [(1, "c", 13), (2, "a", 12)]


def test_stream_sessionize_per_batch_golden(spark, ordered_stream_dir):
    """Session-window aggregation only supports append/complete output;
    complete mode re-emits the full session table per batch, so the golden
    pins the exact growth: batch 1 = the two b1 sessions (session end =
    last event + gap; the dup row counts — dedup is a separate operator).
    Batch 2 pins BOTH cross-batch behaviors: user 1 opens a new disjoint
    session, while user 2's late :01 event merges BACKWARD into its open
    session (start moves earlier, aggregates absorb the late row)."""
    sdf = (
        spark.readStream.schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(ordered_stream_dir)
    )
    out = stream_sessionize(sdf, "ts", ["user_id"], gap="30 minutes")
    batches = _collect_batches(spark, out, "complete")
    assert len(batches) == 2, f"expected 2 data batches, got {sorted(batches)}"
    b0, b1 = (batches[k] for k in sorted(batches))

    def fmt(rows):
        return sorted(
            (r[2], str(r[0]), str(r[1]), r[3], r[4]) for r in rows
        )  # (user, start, end, n, sum)

    s1 = (1, "2024-01-01 00:00:00", "2024-01-01 00:35:00", 3, 4.0)
    s2_open = (2, "2024-01-01 00:10:00", "2024-01-01 00:40:00", 1, 3.0)
    s2_merged = (2, "2024-01-01 00:01:00", "2024-01-01 00:40:00", 2, 8.0)
    s3 = (1, "2024-01-01 01:30:00", "2024-01-01 02:00:00", 1, 4.0)
    assert fmt(b0) == [s1, s2_open]
    assert fmt(b1) == [s1, s3, s2_merged]


def test_stream_interval_join_per_batch_golden(spark, ordered_stream_dir):
    """Stream-stream interval join, one file per micro-batch: batch 1 has no
    qualifying (right.ts <= left.ts) pair — its output must be EMPTY, not
    deferred; batch 2 delivers exactly the one in-window pair when the
    stale-but-in-lookback right row arrives."""
    from arrowhouse_spark.streaming import stream_interval_join

    sdf = (
        spark.readStream.schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(ordered_stream_dir)
    )
    left = sdf.filter(F.col("event_type") == "a").select(
        "user_id", F.col("event_id").alias("a_id"), F.col("ts").alias("a_ts")
    )
    right = sdf.filter(F.col("event_type") != "a").select(
        "user_id", F.col("event_id").alias("o_id"), F.col("ts").alias("o_ts")
    )
    out = stream_interval_join(
        left, right, keys=["user_id"], left_ts="a_ts", right_ts="o_ts",
        lookback="1 hour",
    )
    batches = _collect_batches(spark, out, "append")
    # batch 0 emitted nothing (dropped as empty); batch 1 carries the pair
    assert list(batches) == [1], f"got batches {sorted(batches)}"
    assert [(r[0], r[1], r[3]) for r in batches[1]] == [(2, 12, 9)]


def test_stream_pii_scrub_stateless_map(spark):
    """pii_scrub is a pure map-side projection, so it must compose with
    Structured Streaming unchanged (no state, no watermark) — the shape a
    streaming ingest pipeline uses to redact before landing."""
    import shutil
    import tempfile

    from arrowhouse_spark.operators.text import pii_scrub

    d = tempfile.mkdtemp(prefix="ah_pii_stream_")
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
        ]
    )
    try:
        spark.createDataFrame(
            [(1, "mail a@b.io now"), (2, "host 10.0.0.1 ok"), (3, "clean")],
            schema,
        ).coalesce(1).write.parquet(f"{d}/src")
        sdf = spark.readStream.schema(schema).parquet(f"{d}/src")
        out = pii_scrub(sdf)
        _run_to_memory(out, "pii_sink", "append")
        rows = {r.doc_id: r for r in spark.sql("SELECT * FROM pii_sink").collect()}
        assert rows[1].text_clean == "mail <EMAIL> now" and rows[1].n_email == 1
        assert rows[2].text_clean == "host <IPV4> ok" and rows[2].n_ipv4 == 1
        assert rows[3].n_pii == 0
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_stream_dedup_first_seen_per_batch_golden(spark, tmp_path):
    """Unbounded-horizon first-winner dedup: batch 1 emits one row per new
    fingerprint (min id wins within the batch: doc 3's 'x' loses to doc 1);
    batch 2 drops the cross-batch duplicate (doc 4 = 'x') and emits only
    the genuinely new content — the dedup_incremental contract, streaming."""
    from arrowhouse_spark.streaming import stream_dedup_first_seen

    d = str(tmp_path / "docs_stream")
    schema = "doc_id long, text string"
    spark.createDataFrame(
        [(3, "x"), (1, "x"), (2, "y")], schema
    ).coalesce(1).write.parquet(d + "/b1")
    spark.createDataFrame(
        [(4, "x"), (5, "z")], schema
    ).coalesce(1).write.parquet(d + "/b2")
    import glob
    import os
    import shutil
    import time

    # one file per micro-batch: the file source orders by MODIFICATION TIME,
    # not name, so pin explicit mtimes (same trick as ordered_stream_dir)
    files = sorted(glob.glob(d + "/b*/part-*.parquet"))
    os.makedirs(d + "/in")
    now = time.time()
    for i, f in enumerate(files):
        dst = d + f"/in/{i:03d}.parquet"
        shutil.copy(f, dst)
        os.utime(dst, (now - 3600 + i * 60, now - 3600 + i * 60))

    sdf = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(d + "/in")
    )
    out = stream_dedup_first_seen(sdf)
    batches = _collect_batches(spark, out, "update")
    assert len(batches) == 2, f"expected 2 data batches, got {sorted(batches)}"
    b0, b1 = (batches[k] for k in sorted(batches))
    assert sorted((r[1], r[2]) for r in b0) == [(1, "x"), (2, "y")]
    assert sorted((r[1], r[2]) for r in b1) == [(5, "z")]
    # fingerprints match the batch operator's normalization
    from arrowhouse_spark.operators.text import fingerprint

    fps = {
        r.text: r.fp
        for r in fingerprint(
            spark.createDataFrame([(1, "x"), (2, "y"), (5, "z")], schema)
        ).collect()
    }
    for r in list(b0) + list(b1):
        assert r[0] == fps[r[2]]


def test_stream_trending_terms_per_batch_golden(spark, tmp_path):
    """Windowed term counts, one file per micro-batch: batch 1 counts its
    window's tokens; batch 2 (same event-time window) re-emits the updated
    counts for exactly the touched tokens — update-mode contract."""
    import datetime as dt
    import glob
    import os
    import shutil
    import time

    from arrowhouse_spark.streaming import stream_trending_terms

    d = str(tmp_path / "terms_stream")
    schema = "doc_id long, text string, ts timestamp"
    base = dt.datetime(2024, 1, 1, 0, 0, 0)
    spark.createDataFrame(
        [(1, "spark spark duck", base), (2, "spark row", base)], schema
    ).coalesce(1).write.parquet(d + "/b1")
    spark.createDataFrame(
        [(3, "duck duck goose", base + dt.timedelta(minutes=5))], schema
    ).coalesce(1).write.parquet(d + "/b2")
    files = sorted(glob.glob(d + "/b*/part-*.parquet"))
    os.makedirs(d + "/in")
    now = time.time()
    for i, f in enumerate(files):
        dst = d + f"/in/{i:03d}.parquet"
        shutil.copy(f, dst)
        os.utime(dst, (now - 3600 + i * 60, now - 3600 + i * 60))

    sdf = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(d + "/in")
    )
    out = stream_trending_terms(sdf, window_duration="1 hour")
    batches = _collect_batches(spark, out, "update")
    assert len(batches) == 2, f"expected 2 data batches, got {sorted(batches)}"
    b0, b1 = (batches[k] for k in sorted(batches))
    assert sorted((r[1], r[2]) for r in b0) == [
        ("duck", 1), ("row", 1), ("spark", 3)
    ]
    # same window updated: only touched tokens re-emit, with merged counts
    assert sorted((r[1], r[2]) for r in b1) == [("duck", 3), ("goose", 1)]


def test_stream_minhash_neardup_batches_and_parity(spark, tmp_path):
    """Streaming MinHash near-dup (the continuous minhash_incremental):
    batch 2's near-dup of a batch-1 SURVIVOR is dropped by the store probe,
    batch 3's exact copy of a batch-2 survivor likewise, while genuinely
    new content always survives — and every batch's survivor set equals a
    sequential replay of the BATCH operator against the accumulating
    store (parity by construction; this pins the store wiring)."""
    import glob
    import os
    import shutil
    import time

    from arrowhouse_spark.operators.dedup import minhash_incremental
    from arrowhouse_spark.streaming import stream_minhash_neardup

    base_a = " ".join(f"alpha{i}" for i in range(50))
    near_a = base_a.replace("alpha7", "edited", 1)
    text_b = " ".join(f"beta{i}" for i in range(50))
    near_b = text_b.replace("beta3", "changed", 1)
    text_c = " ".join(f"gamma{i}" for i in range(50))
    text_d = " ".join(f"delta{i}" for i in range(50))
    schema = "doc_id long, text string"
    batches = [
        [(1, base_a), (2, text_b)],
        [(3, near_a), (4, text_c)],
        [(5, text_c), (6, near_b), (7, text_d)],
    ]

    d = str(tmp_path / "mh_stream")
    os.makedirs(d + "/in")
    now = time.time()
    for i, rows in enumerate(batches):
        spark.createDataFrame(rows, schema).coalesce(1).write.parquet(
            d + f"/b{i}"
        )
        f = glob.glob(d + f"/b{i}/part-*.parquet")[0]
        dst = d + f"/in/{i:03d}.parquet"
        shutil.copy(f, dst)
        os.utime(dst, (now - 3600 + i * 60, now - 3600 + i * 60))

    sdf = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(d + "/in")
    )
    q = stream_minhash_neardup(
        sdf,
        store_path=d + "/store",
        out_path=d + "/out",
        checkpoint_path=d + "/ckpt",
        threshold=0.5,
    )
    q.awaitTermination(180)

    out = spark.read.parquet(d + "/out")
    got = {
        r.batch_id: set()
        for r in out.select("batch_id").distinct().collect()
    }
    for r in out.collect():
        got[r.batch_id].add(r.doc_id)
    assert got == {0: {1, 2}, 1: {4}, 2: {7}}

    # sequential replay of the batch operator over the same batches
    store = None
    for i, rows in enumerate(batches):
        bdf = spark.createDataFrame(rows, schema)
        if store is None:
            surv = minhash_incremental(
                bdf,
                spark.createDataFrame(
                    [],
                    "doc_id long, minhash array<bigint>, band int, bucket long",
                ),
                threshold=0.5,
            )
        else:
            surv = minhash_incremental(bdf, store, threshold=0.5)
        ids = {r.doc_id for r in surv.select("doc_id").distinct().collect()}
        assert ids == got[i], f"batch {i}: stream {got[i]} != batch {ids}"
        store = surv if store is None else store.unionByName(surv)

    # the persisted store is exactly the survivors' band-index rows
    store_ids = {
        r.doc_id
        for r in spark.read.parquet(d + "/store").select("doc_id").distinct().collect()
    }
    assert store_ids == {1, 2, 4, 7}


def test_stream_replace_latest_matches_batch_on_union(spark, ordered_stream_dir):
    """End-to-end batch equivalence (round-5 verdict item 7): the streaming
    operator's FINAL per-key state (last update-mode emit per key) must
    equal operators/merge.py:replace_merge_agg run on the union of all
    micro-batches — the same contract stream_dedup_first_seen already pins
    for exact dedup."""
    from arrowhouse_spark.operators.merge import replace_merge_agg
    from arrowhouse_spark.streaming import stream_replace_latest

    sdf = (
        spark.readStream.schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(ordered_stream_dir)
    )
    out = stream_replace_latest(
        sdf, key_col="user_id", version_col="event_id", value_cols=["event_type"]
    )
    batches = _collect_batches(spark, out, "update")
    final: dict[int, tuple] = {}
    for bid in sorted(batches):
        for user_id, event_type, event_id in batches[bid]:
            final[user_id] = (user_id, event_type, event_id)

    union = spark.read.schema(EVENT_SCHEMA).parquet(ordered_stream_dir)
    batch_final = {
        r.user_id: (r.user_id, r.event_type, r.event_id)
        for r in replace_merge_agg(
            [union], ["user_id"], "event_id", ["event_type"]
        ).collect()
    }
    assert final == batch_final


def test_stream_interval_join_matches_batch_on_union(spark, ordered_stream_dir):
    """End-to-end batch equivalence for the stream-stream interval join:
    the union of all append-mode emits must equal operators/rangejoin.py:
    range_join on the replayed union — points = left rows, intervals =
    [right_ts, right_ts + lookback], same keys (the two operators express
    the identical predicate right_ts <= left_ts <= right_ts + lookback)."""
    from arrowhouse_spark.operators.rangejoin import range_join
    from arrowhouse_spark.streaming import stream_interval_join

    sdf = (
        spark.readStream.schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(ordered_stream_dir)
    )
    left_s = sdf.filter(F.col("event_type") == "a").select(
        "user_id", F.col("event_id").alias("a_id"), F.col("ts").alias("a_ts")
    )
    right_s = sdf.filter(F.col("event_type") != "a").select(
        "user_id", F.col("event_id").alias("o_id"), F.col("ts").alias("o_ts")
    )
    out = stream_interval_join(
        left_s, right_s, keys=["user_id"], left_ts="a_ts", right_ts="o_ts",
        lookback="1 hour",
    )
    batches = _collect_batches(spark, out, "append")
    stream_pairs = sorted(
        (r[0], r[1], r[3]) for b in batches.values() for r in b
    )

    union = spark.read.schema(EVENT_SCHEMA).parquet(ordered_stream_dir)
    hour_us = 3600 * 1_000_000
    points = union.filter(F.col("event_type") == "a").select(
        "user_id",
        F.col("event_id").alias("a_id"),
        F.unix_micros("ts").alias("a_us"),
    )
    intervals = union.filter(F.col("event_type") != "a").select(
        "user_id",
        F.col("event_id").alias("o_id"),
        F.unix_micros("ts").alias("lo_us"),
        (F.unix_micros("ts") + F.lit(hour_us)).alias("hi_us"),
    )
    joined = range_join(
        points, intervals, "a_us", "lo_us", "hi_us",
        by=["user_id"], bucket_width=hour_us,
    )
    batch_pairs = sorted(
        (r.user_id, r.a_id, r.o_id) for r in joined.collect()
    )
    assert stream_pairs == batch_pairs and len(batch_pairs) >= 1


def test_stream_minhash_batch_retry_idempotent(spark, tmp_path):
    """Round-6 advice: foreachBatch is at-least-once, so a replayed batch
    must (a) not probe the rows its failed attempt wrote (which would drop
    every doc) and (b) replace — not duplicate — its own output. Simulated
    by invoking the module-level batch processor twice with the same
    batch_id."""
    from arrowhouse_spark.streaming.replace import _minhash_process_batch

    d = str(tmp_path / "mh_retry")
    schema = "doc_id long, text string"
    b0 = spark.createDataFrame(
        [(1, " ".join(f"alpha{i}" for i in range(50)))], schema
    )
    near = " ".join(f"alpha{i}" for i in range(50)).replace("alpha7", "x", 1)
    b1 = spark.createDataFrame(
        [(3, near), (4, " ".join(f"beta{i}" for i in range(50)))], schema
    )
    kw = dict(store_path=d + "/store", out_path=d + "/out", threshold=0.5)
    _minhash_process_batch(b0, 0, **kw)
    _minhash_process_batch(b1, 1, **kw)

    def snapshot():
        out = spark.read.parquet(d + "/out")
        store = spark.read.parquet(d + "/store")
        return (
            sorted((r.batch_id, r.doc_id) for r in out.collect()),
            store.count(),
            sorted(
                r.doc_id
                for r in store.select("doc_id").distinct().collect()
            ),
        )

    first = snapshot()
    assert [p[1] for p in first[0]] == [1, 4]  # near-dup 3 dropped
    # the retry: same batch, same id — at-least-once replay
    _minhash_process_batch(b1, 1, **kw)
    assert snapshot() == first


def test_minhash_batch_missing_store_with_history_raises(spark, tmp_path):
    """Round-7 advice: if the band store vanishes (e.g. a reader landing
    inside compact_band_store's two-rename swap window) while batch_id
    indicates committed history, the batch must FAIL loudly — falling back
    to an empty index would silently re-admit every near-duplicate."""
    import shutil

    import pytest

    from arrowhouse_spark.streaming.replace import _minhash_process_batch

    d = str(tmp_path / "mh_missing")
    schema = "doc_id long, text string"
    doc = " ".join(f"alpha{i}" for i in range(50))
    kw = dict(store_path=d + "/store", out_path=d + "/out", threshold=0.5)
    _minhash_process_batch(spark.createDataFrame([(1, doc)], schema), 0, **kw)
    shutil.rmtree(d + "/store")
    with pytest.raises(RuntimeError, match="committed history"):
        _minhash_process_batch(
            spark.createDataFrame([(2, doc)], schema), 1, **kw
        )
    # batch 0 with no store remains the legitimate bootstrap path
    _minhash_process_batch(spark.createDataFrame([(1, doc)], schema), 0, **kw)


def test_compact_band_store_probe_invariant(spark, tmp_path):
    """Round-6 verdict #4: compaction rewrites the appended band store as
    few (band,bucket)-clustered files under one collapsed batch_id
    partition — the row multiset and any future batch's probe verdict
    must be IDENTICAL pre/post, and the file count must shrink."""
    from arrowhouse_spark.operators.dedup import minhash_incremental
    from arrowhouse_spark.streaming.replace import (
        _minhash_process_batch,
        compact_band_store,
    )

    d = str(tmp_path / "mh_compact")
    schema = "doc_id long, text string"
    mk = lambda i: " ".join(f"w{i}_{j}" for j in range(50))
    kw = dict(store_path=d + "/store", out_path=d + "/out", threshold=0.5)
    # several small appends -> many small files
    for b in range(4):
        _minhash_process_batch(
            spark.createDataFrame([(b * 10 + 1, mk(b))], schema), b, **kw
        )

    def probe():
        store = (
            spark.read.parquet(d + "/store")
            .filter(F.col("batch_id") < 99)
            .drop("batch_id")
        )
        probe_df = spark.createDataFrame(
            [(901, mk(1).replace("w1_3", "edit", 1)), (902, mk(99))], schema
        )
        surv = minhash_incremental(probe_df, store, threshold=0.5)
        return sorted(
            r.doc_id for r in surv.select("doc_id").distinct().collect()
        )

    before_rows = sorted(
        tuple(r) for r in spark.read.parquet(d + "/store")
        .select("doc_id", "band", "bucket").collect()
    )
    before_probe = probe()
    assert before_probe == [902]  # near-dup of batch-1 survivor dropped

    stats = compact_band_store(spark, d + "/store", n_files=2)
    assert stats["files_before"] > stats["files_after"]
    after_rows = sorted(
        tuple(r) for r in spark.read.parquet(d + "/store")
        .select("doc_id", "band", "bucket").collect()
    )
    assert after_rows == before_rows
    assert probe() == before_probe
    # collapsed history still precedes any future batch id
    assert (
        spark.read.parquet(d + "/store")
        .select(F.max("batch_id")).collect()[0][0] == 3
    )
    # and a post-compaction append keeps working
    _minhash_process_batch(
        spark.createDataFrame([(41, mk(40))], schema), 4, **kw
    )
    assert (
        spark.read.parquet(d + "/store")
        .select("doc_id").distinct().count() == 5
    )


def test_stream_windowed_agg_matches_batch_on_union(spark, ordered_stream_dir):
    """End-to-end batch equivalence for the windowed aggregation: in
    complete mode the memory sink holds the FULL aggregate state after the
    availableNow drain, which must equal the plain batch window aggregate
    over the union of all micro-batches (completing the equivalence set:
    replace-latest, interval-join, first-seen, minhash — round-6; windowed
    agg, sessionize — this round)."""
    from arrowhouse_spark.streaming import stream_windowed_agg

    sdf = (
        spark.readStream.schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(ordered_stream_dir)
    )
    out = stream_windowed_agg(sdf, ts_col="ts", window_duration="1 hour")
    q = _run_to_memory(out, "wagg_union", "complete")
    try:
        got = sorted(
            (r.window_start, r.n, r.sum_value)
            for r in spark.table("wagg_union").collect()
        )
    finally:
        q.stop()

    union = spark.read.schema(EVENT_SCHEMA).parquet(ordered_stream_dir)
    want = sorted(
        (r.window_start, r.n, r.sum_value)
        for r in union.groupBy(F.window("ts", "1 hour"))
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("sum_value"))
        .select(F.col("window.start").alias("window_start"), "n", "sum_value")
        .collect()
    )
    assert got == want and len(want) >= 2


def test_stream_sessionize_matches_batch_sessions_on_union(
    spark, ordered_stream_dir
):
    """End-to-end batch equivalence for streaming sessionization, against
    the INDEPENDENT batch implementation (operators/sessions.py's
    lag-window model, itself property-tested vs a python reference):
    complete-mode session_window state after the drain must equal
    session_stats on the union — same (key, start, end, count) tuples.
    The fixture has no exact-boundary gaps (where the two models'
    open/closed interval conventions legitimately differ)."""
    from arrowhouse_spark.operators.sessions import session_stats
    from arrowhouse_spark.streaming import stream_sessionize

    sdf = (
        spark.readStream.schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(ordered_stream_dir)
    )
    out = stream_sessionize(
        sdf, ts_col="ts", key_cols=["user_id"], gap="30 minutes"
    )
    q = _run_to_memory(out, "sess_union", "complete")
    try:
        got = sorted(
            (r.user_id, r.session_start, r.n_events)
            for r in spark.table("sess_union").collect()
        )
    finally:
        q.stop()

    union = spark.read.schema(EVENT_SCHEMA).parquet(ordered_stream_dir)
    want = sorted(
        (r.user_id, r.session_start, r.n_events)
        for r in session_stats(
            union, ts_col="ts", key_cols=["user_id"], gap_seconds=1800
        ).collect()
    )
    assert got == want and len(want) >= 2


def test_stream_minhash_resumes_after_compaction(spark, tmp_path):
    """Ops e2e for compact_band_store: drain the stream, compact the band
    store BETWEEN triggers (collapsing batch partitions into one), then
    feed a new file and resume from the SAME checkpoint — the resumed
    batch must probe the full compacted history (a near-dup of a
    pre-compaction survivor still drops) and fresh content still
    survives."""
    import glob
    import os
    import shutil
    import time

    from arrowhouse_spark.streaming import stream_minhash_neardup
    from arrowhouse_spark.streaming.replace import compact_band_store

    d = str(tmp_path / "mh_resume")
    schema = "doc_id long, text string"
    mk = lambda p: " ".join(f"{p}{j}" for j in range(50))
    os.makedirs(d + "/in")

    def feed(i, rows):
        spark.createDataFrame(rows, schema).coalesce(1).write.parquet(
            d + f"/b{i}"
        )
        f = glob.glob(d + f"/b{i}/part-*.parquet")[0]
        dst = d + f"/in/{i:03d}.parquet"
        shutil.copy(f, dst)
        now = time.time()
        os.utime(dst, (now - 3600 + i * 60, now - 3600 + i * 60))

    def drain():
        sdf = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(d + "/in")
        )
        q = stream_minhash_neardup(
            sdf,
            store_path=d + "/store",
            out_path=d + "/out",
            checkpoint_path=d + "/ckpt",
            threshold=0.5,
        )
        q.awaitTermination(180)

    feed(0, [(1, mk("alpha")), (2, mk("beta"))])
    feed(1, [(3, mk("gamma"))])
    drain()
    stats = compact_band_store(spark, d + "/store", n_files=2)
    assert stats["rows"] > 0

    # resume: near-dup of doc 1 (batch 0, pre-compaction) must drop; new
    # content survives
    feed(2, [(4, mk("alpha").replace("alpha7", "x", 1)), (5, mk("delta"))])
    drain()
    out = spark.read.parquet(d + "/out")
    got = {r.batch_id: set() for r in out.select("batch_id").distinct().collect()}
    for r in out.collect():
        got[r.batch_id].add(r.doc_id)
    assert got == {0: {1, 2}, 1: {3}, 2: {5}}


def test_stream_shard_export_matches_batch(spark, tmp_path):
    """Continuous shard export: the streamed store's manifest equals a
    one-shot batch export of the replayed union, and re-delivering a batch
    (at-least-once retry) leaves the store byte-identical — the dynamic
    (shard, ingest_batch) overwrite makes the sink idempotent."""
    import glob
    import os
    import shutil
    import time

    from arrowhouse_spark.sources.shards import (
        shard_manifest,
        write_training_shards,
    )
    from arrowhouse_spark.streaming.replace import (
        _shard_export_batch,
        stream_shard_export,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    batches = [
        docs.filter(F.col("doc_id") % 3 == k).select("doc_id", "text")
        for k in range(3)
    ]
    d = str(tmp_path / "sse")
    os.makedirs(d + "/in")
    now = time.time()
    for i, b in enumerate(batches):
        b.coalesce(1).write.parquet(d + f"/b{i}")
        f = glob.glob(d + f"/b{i}/part-*.parquet")[0]
        dst = d + f"/in/{i:03d}.parquet"
        shutil.copy(f, dst)
        os.utime(dst, (now - 3600 + i * 60, now - 3600 + i * 60))

    sdf = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(d + "/in")
    )
    q = stream_shard_export(
        sdf, store_path=d + "/store", checkpoint_path=d + "/ckpt", n_shards=8
    )
    q.awaitTermination(180)

    ref = str(tmp_path / "oneshot")
    write_training_shards(docs.select("doc_id", "text"), ref, n_shards=8)

    def rows(path):
        return {
            r.shard: (r.n_docs, r.n_tokens, r.n_bytes, r.xor_checksum)
            for r in shard_manifest(spark, path).collect()
        }

    streamed = rows(d + "/store")
    assert streamed == rows(ref)

    # simulate an at-least-once re-delivery of batch 1: store unchanged
    _shard_export_batch(batches[1], 1, d + "/store", 8, "doc_id", "shard")
    assert rows(d + "/store") == streamed


def test_compact_band_store_then_replay_of_newest_batch(spark, tmp_path):
    """The at-least-once hole compaction must not widen: if the newest
    batch J committed its store write but not its checkpoint, J is
    REPLAYED after a restart — and an operator may have compacted in
    between. History folds to batch_id=-1 but J's partition is never
    merged, so the replay still probes the full history and its dynamic
    overwrite replaces only partition J. State must equal the no-crash
    run exactly."""
    from arrowhouse_spark.streaming.replace import (
        _minhash_process_batch,
        compact_band_store,
    )

    d = str(tmp_path / "mh_replay_compact")
    schema = "doc_id long, text string"
    mk = lambda s: " ".join(f"{s}{j}" for j in range(50))
    kw = dict(store_path=d + "/store", out_path=d + "/out", threshold=0.5)
    b1 = spark.createDataFrame(
        [(3, mk("alpha").replace("alpha7", "x", 1)), (4, mk("beta"))], schema
    )
    _minhash_process_batch(
        spark.createDataFrame([(1, mk("alpha"))], schema), 0, **kw
    )
    _minhash_process_batch(b1, 1, **kw)  # store write landed...

    def snapshot():
        out = spark.read.parquet(d + "/out")
        store = spark.read.parquet(d + "/store")
        return (
            sorted((r.batch_id, r.doc_id) for r in out.collect()),
            sorted(
                tuple(r)
                for r in store.select("doc_id", "band", "bucket").collect()
            ),
        )

    first = snapshot()
    assert [p[1] for p in first[0]] == [1, 4]  # near-dup 3 dropped

    compact_band_store(spark, d + "/store", n_files=2)
    # history is at -1, newest batch kept under its own id
    ids = sorted(
        r.batch_id
        for r in spark.read.parquet(d + "/store")
        .select("batch_id").distinct().collect()
    )
    assert ids == [-1, 1]

    # ...but the checkpoint didn't: batch 1 replays post-compaction
    _minhash_process_batch(b1, 1, **kw)
    assert snapshot() == first


def test_stream_hopping_window_matches_batch_on_union(spark, ordered_stream_dir):
    """Batch equivalence for the HOPPING form of stream_windowed_agg
    (slide < window: each event feeds two overlapping 2h/1h windows):
    complete-mode state after the drain must equal the batch sliding
    window over the union — the streaming twin of the
    events_hopping_window suite query."""
    from arrowhouse_spark.streaming import stream_windowed_agg

    sdf = (
        spark.readStream.schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(ordered_stream_dir)
    )
    out = stream_windowed_agg(
        sdf, ts_col="ts", window_duration="2 hours", slide_duration="1 hour"
    )
    q = _run_to_memory(out, "whop_union", "complete")
    try:
        got = sorted(
            (r.window_start, r.n, r.sum_value)
            for r in spark.table("whop_union").collect()
        )
    finally:
        q.stop()

    union = spark.read.schema(EVENT_SCHEMA).parquet(ordered_stream_dir)
    want = sorted(
        (r.window_start, r.n, r.sum_value)
        for r in union.groupBy(F.window("ts", "2 hours", "1 hour"))
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("sum_value"))
        .select(F.col("window.start").alias("window_start"), "n", "sum_value")
        .collect()
    )
    assert got == want and len(want) >= 3
    # overlap really happened: total windowed rows ≈ 2× the event count
    assert sum(n for _, n, _ in want) == 2 * union.count()


def test_stream_ohlc_matches_batch_on_union(spark, ordered_stream_dir):
    """Batch equivalence for streaming OHLC: complete-mode state after the
    availableNow drain must equal operators/timeseries.py:ohlc_downsample
    (the INDEPENDENT batch implementation) on the union of micro-batches —
    including the struct-ordered open/close tie-break on the duplicated
    timestamp in batch 1."""
    from arrowhouse_spark.operators.timeseries import ohlc_downsample
    from arrowhouse_spark.streaming import stream_ohlc

    sdf = (
        spark.readStream.schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(ordered_stream_dir)
    )
    out = stream_ohlc(
        sdf, ts_col="ts", key_col="user_id", value_col="value", tie_col="event_id"
    )
    q = _run_to_memory(out, "ohlc_union", "complete")
    try:
        got = sorted(tuple(r) for r in spark.table("ohlc_union").collect())
    finally:
        q.stop()

    union = spark.read.schema(EVENT_SCHEMA).parquet(ordered_stream_dir)
    want = sorted(
        tuple(r)
        for r in ohlc_downsample(
            union, key_col="user_id", ts_col="ts", value_col="value",
            tie_col="event_id",
        )
        .select(
            F.col("bucket_ts"), "user_id", "open", "high", "low", "close",
            "n", "sum_value",
        )
        .collect()
    )
    assert got == want and len(want) >= 3


def test_stream_dq_check_matches_batch_on_union(spark, ordered_stream_dir):
    """dq_check is a plain aggregation, so it runs UNCHANGED on a
    streaming relation in complete mode (including the count-distinct
    uniqueness rule, if supported by the streaming planner): the drained
    report must equal the batch report on the union — quality contracts
    monitored continuously with zero new operator code."""
    from arrowhouse_spark.operators.quality import dq_check

    rules = [
        ("not_null", "user_id"),
        ("in_set", "event_type", ("a", "b", "c", "z")),
        ("range", "value", 0.0, 4.5),
    ]
    sdf = (
        spark.readStream.schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(ordered_stream_dir)
    )
    out = dq_check(sdf, rules)
    q = _run_to_memory(out, "dq_union", "complete")
    try:
        got = sorted(tuple(r) for r in spark.table("dq_union").collect())
    finally:
        q.stop()
    union = spark.read.schema(EVENT_SCHEMA).parquet(ordered_stream_dir)
    want = sorted(tuple(r) for r in dq_check(union, rules).collect())
    assert got == want and len(want) == 3
    # the fixture plants one violation: value 5.0 breaks the range rule
    by_rule = {r[1]: r[3] for r in got}
    assert by_rule["range"] == 1


def test_stream_cms_state_matches_batch_sketch(spark, stream_dir):
    # the streaming sketch's complete-mode state after draining all
    # micro-batches must equal the BATCH sketch over the union exactly
    # (counter sums are associative) — and probing it must give the same
    # estimates the batch path gives
    from arrowhouse_spark.operators.aggstate import (
        cms_point_estimate,
        cms_state,
    )
    from arrowhouse_spark.streaming import read_parquet_stream, stream_cms

    sdf = read_parquet_stream(spark, stream_dir, EVENT_SCHEMA)
    out = stream_cms(sdf, "user_id", depth=4, width=64)
    _run_to_memory(out, "cms_sink", "complete")
    streamed = spark.sql("SELECT row, bucket, cnt FROM cms_sink")
    batch = cms_state(
        spark.read.schema(EVENT_SCHEMA).parquet(stream_dir),
        keys=[],
        value_col="user_id",
        depth=4,
        width=64,
    )
    assert streamed.exceptAll(batch).count() == 0
    assert batch.exceptAll(streamed).count() == 0
    probes = spark.createDataFrame([(1,), (2,), (3,)], "user_id long")
    est = {
        r["user_id"]: r["est"]
        for r in cms_point_estimate(
            streamed, probes, "user_id", depth=4, width=64
        ).collect()
    }
    # fixture: user 1 has 4 rows (incl. dup), user 2 has 2, user 3 none
    assert est[1] >= 4 and est[2] >= 2 and est[3] >= 0


def test_stream_hist_state_matches_batch_and_quantile(spark, stream_dir):
    from arrowhouse_spark.operators.aggstate import hist_quantile, hist_state
    from arrowhouse_spark.streaming import read_parquet_stream, stream_hist

    sdf = read_parquet_stream(spark, stream_dir, EVENT_SCHEMA)
    out = stream_hist(sdf, "value", bins=10, lo=0.0, hi=10.0)
    _run_to_memory(out, "hist_sink", "complete")
    streamed = spark.sql("SELECT bin, cnt FROM hist_sink")
    batch = hist_state(
        spark.read.schema(EVENT_SCHEMA).parquet(stream_dir),
        keys=[], value_col="value", bins=10, lo=0.0, hi=10.0,
    )
    assert streamed.exceptAll(batch).count() == 0
    assert batch.exceptAll(streamed).count() == 0
    est = {
        r["q"]: r["est"]
        for r in hist_quantile(streamed, [0.5], bins=10, lo=0.0, hi=10.0).collect()
    }
    # fixture values: 1,2,3,1,4,5 -> median estimate inside [1,4]
    assert 1.0 <= est[0.5] <= 4.0


def test_stream_bitmap_distinct_matches_exact(spark, stream_dir):
    from arrowhouse_spark.streaming import (
        read_parquet_stream,
        stream_bitmap_distinct,
    )

    sdf = read_parquet_stream(spark, stream_dir, EVENT_SCHEMA)
    out = stream_bitmap_distinct(sdf, "event_id", group_cols=["user_id"])
    _run_to_memory(out, "bm_sink", "complete")
    got = {
        r["user_id"]: r["n"]
        for r in spark.sql(
            "SELECT user_id, sum(n_in_bucket) AS n FROM bm_sink GROUP BY 1"
        ).collect()
    }
    exact = {
        r["user_id"]: r["n"]
        for r in spark.read.schema(EVENT_SCHEMA)
        .parquet(stream_dir)
        .groupBy("user_id")
        .agg(F.count_distinct("event_id").alias("n"))
        .collect()
    }
    assert got == exact


def test_stream_scd2_incremental_matches_batch_and_retry(spark, tmp_path):
    """Round-8: continuous SCD2 maintenance. The bucket-partitioned store
    after N batches must equal one batch scd2_from_log over the union of
    all delivered events — including a LATE event that lands inside a
    CLOSED interval (the per-key full-history rebuild) — and re-applying
    a delivered batch must be a no-op (idempotence by construction)."""
    from arrowhouse_spark.operators.merge import scd2_from_log
    from arrowhouse_spark.streaming.replace import _scd2_process_batch

    d = str(tmp_path / "scd2")
    schema = "user_id long, ts timestamp, plan string, event_id long"

    def mk(rows):
        return spark.createDataFrame(
            [(u, f"2024-01-0{t} 00:00:00", a, e) for u, t, a, e in rows],
            "user_id long, ts string, plan string, event_id long",
        ).withColumn("ts", F.col("ts").cast("timestamp"))

    b0 = mk([(1, 1, "free", 10), (1, 3, "pro", 11), (2, 1, "free", 12)])
    b1 = mk([(1, 5, "free", 13), (2, 4, "team", 14)])
    # late event INSIDE user 1's closed [01-01, 01-03) interval: splits it
    b2 = mk([(1, 2, "pro", 15)])
    kw = dict(
        store_path=d + "/store", key_cols=["user_id"], ts_col="ts",
        attr_col="plan", tie_col="event_id", n_buckets=4,
    )
    _scd2_process_batch(b0, 0, **kw)
    _scd2_process_batch(b1, 1, **kw)
    _scd2_process_batch(b2, 2, **kw)

    def snapshot():
        return sorted(
            (r.user_id, r.plan, str(r.valid_from), str(r.valid_to),
             r.is_current)
            for r in spark.read.parquet(d + "/store").collect()
        )

    union = b0.unionByName(b1).unionByName(b2)
    want = sorted(
        (r.user_id, r.plan, str(r.valid_from), str(r.valid_to), r.is_current)
        for r in scd2_from_log(
            union, key_cols=["user_id"], ts_col="ts", attr_col="plan",
            tie_col="event_id",
        ).collect()
    )
    got = snapshot()
    assert got == want
    # the late event split the run sequence: user 1 is free,pro,free —
    # with pro's interval starting at the LATE ts (01-02), not 01-03
    u1 = [(a, f) for (u, a, f, _t, _c) in got if u == 1]
    assert ("pro", "2024-01-02 00:00:00") in u1
    # at-least-once: re-applying batch 2 must change nothing
    _scd2_process_batch(b2, 2, **kw)
    assert snapshot() == got
    # a missing store with committed history must fail loudly (same
    # contract as the minhash band store)
    import shutil

    import pytest

    shutil.rmtree(d + "/store")
    with pytest.raises(RuntimeError, match="committed history"):
        _scd2_process_batch(b2, 3, **kw)


def test_stream_scd2_availablenow_drain(spark, tmp_path):
    """End-to-end through the streaming engine: a file-source availableNow
    drain through stream_scd2 leaves the same store the direct batch
    calls build."""
    from arrowhouse_spark.streaming.replace import stream_scd2

    d = str(tmp_path / "scd2s")
    rows = [
        (1, "2024-01-01 00:00:00", "free", 10),
        (1, "2024-01-03 00:00:00", "pro", 11),
        (2, "2024-01-01 00:00:00", "free", 12),
    ]
    src = spark.createDataFrame(
        rows, "user_id long, ts string, plan string, event_id long"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    src.write.parquet(d + "/in")
    sdf = spark.readStream.schema(src.schema).parquet(d + "/in")
    q = stream_scd2(
        sdf, d + "/store", d + "/ckpt", key_cols=["user_id"],
        ts_col="ts", attr_col="plan", tie_col="event_id", n_buckets=4,
    )
    q.awaitTermination(120)
    got = sorted(
        (r.user_id, r.plan, r.is_current)
        for r in spark.read.parquet(d + "/store").collect()
    )
    assert got == [(1, "free", False), (1, "pro", True), (2, "free", True)]


def test_stream_bloom_matches_batch_state_and_probe(spark, stream_dir):
    from arrowhouse_spark.operators.aggstate import bloom_probe, bloom_state
    from arrowhouse_spark.streaming.replace import stream_bloom

    sdf = read_parquet_stream(spark, stream_dir, EVENT_SCHEMA)
    out = stream_bloom(sdf.select("event_id"), "event_id")
    _run_to_memory(out, "bloom_sink", "complete")
    got = {
        (r["word"], r["bits"])
        for r in spark.sql("SELECT word, bits FROM bloom_sink").collect()
    }
    batch = spark.read.schema(EVENT_SCHEMA).parquet(stream_dir)
    want = {
        (r["word"], r["bits"])
        for r in bloom_state(batch.select("event_id"), [], "event_id").collect()
    }
    assert got == want  # streamed filter == batch filter, word for word

    # probing the streamed state never false-negatives a seen event id
    state = spark.sql("SELECT word, bits FROM bloom_sink")
    probes = spark.createDataFrame([(i,) for i in range(8, 16)], "q long")
    verdicts = {
        r["q"]: r["member"] for r in bloom_probe(state, probes, "q").collect()
    }
    for seen in (9, 10, 11, 12, 13):
        assert verdicts[seen]


def test_stream_ewma_matches_batch_recurrence(spark, stream_dir):
    from arrowhouse_spark.operators.timeseries import ewma
    from arrowhouse_spark.streaming.replace import stream_ewma

    sdf = read_parquet_stream(spark, stream_dir, EVENT_SCHEMA)
    out = stream_ewma(sdf, "user_id", "ts", "value", alpha=0.25)
    _run_to_memory(out, "ewma_sink", "update")
    # update mode: keep the LAST emission per user (max n_events)
    rows = spark.sql(
        "SELECT user_id, max_by(ewma, n_events) AS ewma, max(n_events) AS n "
        "FROM ewma_sink GROUP BY user_id"
    ).collect()
    got = {r["user_id"]: (r["n"], round(r["ewma"], 9)) for r in rows}

    # batch reference: series shorter than the lookback -> truncated form
    # equals the untruncated recurrence exactly
    batch = spark.read.schema(EVENT_SCHEMA).parquet(stream_dir)
    bt = ewma(
        batch, ["user_id"], ["ts"], "value",
        alpha=0.25, lookback=32, round_dp=9,
    )
    last = bt.groupBy("user_id").agg(
        F.max(F.struct("ts", "ewma"))["ewma"].alias("ewma"),
        F.count(F.lit(1)).alias("n"),
    )
    want = {r["user_id"]: (r["n"], r["ewma"]) for r in last.collect()}
    # NOTE the duplicated event row in b1 is real input to both sides
    assert got == want


def test_stream_ewma_rejects_bad_alpha(spark, stream_dir):
    from arrowhouse_spark.streaming.replace import stream_ewma

    sdf = read_parquet_stream(spark, stream_dir, EVENT_SCHEMA)
    with pytest.raises(ValueError):
        stream_ewma(sdf, "user_id", "ts", "value", alpha=0.0)


def test_stream_ewma_per_batch_golden_arrival_order(spark, ordered_stream_dir):
    """Two micro-batches pin the ARRIVAL-order contract: user 2's batch-2
    event has an OLDER ts than its batch-1 event, and the recurrence must
    fold it second anyway (cross-batch order is arrival order; only
    within-batch rows sort by order_col)."""
    from arrowhouse_spark.streaming.replace import stream_ewma

    sdf = (
        spark.readStream.schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(ordered_stream_dir)
    )
    out = stream_ewma(sdf, "user_id", "ts", "value", alpha=0.25)
    q = (
        out.writeStream.format("memory")
        .queryName("ewma_golden_sink")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = {
        (r["user_id"], r["n_events"]): round(r["ewma"], 9)
        for r in spark.sql("SELECT * FROM ewma_golden_sink").collect()
    }
    # batch 1 — user 1 folds 1.0, 1.0(dup row), 2.0 in ts order:
    #   u = 3.3125, s = 2.3125
    assert rows[(1, 3)] == round(3.3125 / 2.3125, 9)
    assert rows[(2, 1)] == 3.0
    # batch 2 — user 1 folds 4.0; user 2 folds the STALE-ts 5.0 second
    assert rows[(1, 4)] == round(
        (4.0 + 0.75 * 3.3125) / (1.0 + 0.75 * 2.3125), 9
    )
    assert rows[(2, 2)] == round((5.0 + 0.75 * 3.0) / 1.75, 9)


def test_stream_pareto_frontier_folds_and_ledger_skips_replay(spark, tmp_path):
    from arrowhouse_spark.operators.skyline import pareto_frontier
    from arrowhouse_spark.streaming.replace import (
        _pareto_process_batch,
        stream_pareto,
    )

    PT = "x double, y long, pid long"
    src = str(tmp_path / "src")
    os.makedirs(src)
    store = str(tmp_path / "front")
    b1 = [(10.0, 5, 1), (12.0, 7, 2), (25.0, 1, 3)]
    # batch 2: (9,6) dominates (10,5); (12,7) repeats -> n_rows 2
    b2 = [(9.0, 6, 4), (30.0, 9, 5), (12.0, 7, 6)]
    import time as _t

    now = _t.time()
    for i, rows in enumerate([b1, b2], start=1):
        tmpd = str(tmp_path / f"b{i}")
        spark.createDataFrame(rows, PT).coalesce(1).write.parquet(tmpd)
        [pf] = [f_ for f_ in os.listdir(tmpd) if f_.endswith(".parquet")]
        dst = f"{src}/b{i}.parquet"
        shutil.copy(f"{tmpd}/{pf}", dst)
        os.utime(dst, (now - 600 + i * 60, now - 600 + i * 60))

    sdf = (
        spark.readStream.schema(PT)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = stream_pareto(
        sdf, store, min_col="x", max_col="y", id_col="pid",
        checkpoint_path=str(tmp_path / "ck"),
    )
    q.awaitTermination(120)

    got = {
        (r["x"], r["y"]): (r["n_rows"], r["min_id"])
        for r in spark.read.parquet(store).collect()
    }
    assert got == {(9.0, 6): (1, 4), (12.0, 7): (2, 2), (30.0, 9): (1, 5)}

    # parity with the batch operator over the full union
    union = spark.createDataFrame(b1 + b2, PT)
    batch = {
        (r["x"], r["y"]): (r["n_rows"], r["min_id"])
        for r in pareto_frontier(union, "x", "y", "pid").collect()
    }
    assert got == batch

    # replaying an already-folded batch id is a no-op (ledger guard)
    run_key = os.path.abspath(str(tmp_path / "ck"))
    _pareto_process_batch(
        spark.createDataFrame(b2, PT), 1, store, "x", "y", "pid",
        run_key=run_key,
    )
    again = {
        (r["x"], r["y"]): (r["n_rows"], r["min_id"])
        for r in spark.read.parquet(store).collect()
    }
    assert again == got

    # pairing the store with a DIFFERENT checkpoint lineage fails loudly
    # (batch ids restart at 0 under a fresh checkpoint: the old monotone
    # guard would have silently dropped every new batch)
    import pytest as _pytest

    with _pytest.raises(ValueError, match="checkpoint lineage"):
        _pareto_process_batch(
            spark.createDataFrame(b2, PT), 0, store, "x", "y", "pid",
            run_key=os.path.abspath(str(tmp_path / "ck_fresh")),
        )
    assert {
        (r["x"], r["y"]): (r["n_rows"], r["min_id"])
        for r in spark.read.parquet(store).collect()
    } == got


def test_stream_kmv_matches_batch_estimate(spark, tmp_path):
    """stream_kmv after all batches == kmv_estimate over the union (the
    MIN-set state is order-free and idempotent; batch 2 re-delivers some
    batch-1 values to prove it)."""
    from arrowhouse_spark.operators.aggstate import kmv_estimate, kmv_state
    from arrowhouse_spark.streaming import stream_kmv

    PT = "g string, v long"
    b1 = [("g1", v) for v in range(40)] + [("g2", v) for v in range(10)]
    b2 = (
        [("g1", v) for v in range(30, 70)]  # 30..39 re-delivered
        + [("g2", v) for v in range(10)]    # all re-delivered
    )
    src = str(tmp_path / "src")
    os.makedirs(src)
    import time as _t

    now = _t.time()
    for i, rows in enumerate([b1, b2], start=1):
        tmpd = str(tmp_path / f"b{i}")
        spark.createDataFrame(rows, PT).coalesce(1).write.parquet(tmpd)
        [pf] = [f_ for f_ in os.listdir(tmpd) if f_.endswith(".parquet")]
        dst = f"{src}/b{i}.parquet"
        shutil.copy(f"{tmpd}/{pf}", dst)
        os.utime(dst, (now - 600 + i * 60, now - 600 + i * 60))

    sdf = (
        spark.readStream.schema(PT).option("maxFilesPerTrigger", 1).parquet(src)
    )
    q = (
        stream_kmv(sdf, "g", "v", k=16)
        .writeStream.format("memory")
        .queryName("kmv_sink")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    # the final state per key: n_state is non-decreasing and u_k (the k-th
    # minimum) only shrinks as the set grows, so est is monotone — the
    # latest update is the (n_state, est) maximum
    rows = spark.sql(
        "SELECT * FROM (SELECT *, row_number() OVER "
        "(PARTITION BY g ORDER BY n_state DESC, est DESC) AS rn "
        "FROM kmv_sink) WHERE rn = 1"
    ).collect()
    got = {r.g: (r.n_state, r.est) for r in rows}

    union = spark.createDataFrame(b1 + b2, PT)
    batch = {
        r.g: (r.n_state, r.est)
        for r in kmv_estimate(
            kmv_state(union, ["g"], "v", k=16), ["g"], k=16
        ).collect()
    }
    assert got == batch
    # g2 never filled (10 distinct): exact count
    assert got["g2"] == (10, 10.0)


def test_stream_pareto_adopts_legacy_int_ledger(spark, tmp_path):
    """A pre-run_key ledger is a bare int ('7') — which is VALID JSON, so
    json.loads returns an int and the dict path must fall through to the
    legacy branch (AttributeError in the except tuple), adopting the
    recorded last_batch instead of crashing the first keyed fold."""
    from arrowhouse_spark.streaming.replace import _pareto_process_batch

    PT = "x double, y long, pid long"
    store = str(tmp_path / "front")
    run_key = str(tmp_path / "ck")
    _pareto_process_batch(
        spark.createDataFrame([(10.0, 5, 1), (25.0, 1, 3)], PT),
        7, store, "x", "y", "pid", run_key=run_key,
    )
    # rewrite the ledger in the legacy str(batch_id) format
    with open(store + "__last_batch", "w") as fh:
        fh.write("7")

    def snap():
        return {
            (r["x"], r["y"]): (r["n_rows"], r["min_id"])
            for r in spark.read.parquet(store).collect()
        }

    before = snap()
    # replayed batch (id <= legacy last_batch): adopted ledger skips it
    _pareto_process_batch(
        spark.createDataFrame([(1.0, 99, 9)], PT),
        7, store, "x", "y", "pid", run_key=run_key,
    )
    assert snap() == before
    # a NEW batch id folds normally after adoption
    _pareto_process_batch(
        spark.createDataFrame([(9.0, 6, 4)], PT),
        8, store, "x", "y", "pid", run_key=run_key,
    )
    after = snap()
    assert (9.0, 6) in after and (10.0, 5) not in after  # dominated
    # and the ledger is upgraded to the keyed format
    import json as _json

    rec = _json.loads(open(store + "__last_batch").read())
    assert rec["run_key"] == run_key and rec["last_batch"] == 8


def test_stream_components_matches_batch_cc(spark, tmp_path):
    """After every micro-batch the label store equals one batch CC over
    all edges delivered so far — including a cross-batch component merge —
    and replaying the stream over the same files is a no-op (empty deltas,
    no store write)."""
    from arrowhouse_spark.operators.components import connected_components
    from arrowhouse_spark.streaming.replace import stream_components

    ET = "src long, dst long"
    srcdir = str(tmp_path / "edges")
    os.makedirs(srcdir)
    b1 = [(1, 2), (2, 3), (10, 11)]
    b2 = [(3, 10), (20, 21)]  # merges the two day-1 clusters
    import time as _t

    now = _t.time()
    for i, rows in enumerate([b1, b2], start=1):
        tmpd = str(tmp_path / f"b{i}")
        spark.createDataFrame(rows, ET).coalesce(1).write.parquet(tmpd)
        [pf] = [f for f in os.listdir(tmpd) if f.endswith(".parquet")]
        dstp = f"{srcdir}/b{i}.parquet"
        shutil.copy(f"{tmpd}/{pf}", dstp)
        os.utime(dstp, (now - 600 + i * 60, now - 600 + i * 60))

    store = str(tmp_path / "labels")
    q = stream_components(
        spark.readStream.schema(ET).option("maxFilesPerTrigger", 1).parquet(srcdir),
        store,
        checkpoint_path=str(tmp_path / "ck"),
    )
    q.awaitTermination(120)

    got = {
        r.id: r.component
        for r in spark.read.parquet(store).select("id", "component").collect()
    }
    full = {
        r.id: r.component
        for r in connected_components(spark.createDataFrame(b1 + b2, ET)).collect()
    }
    assert got == full and full[11] == 1 and full[21] == 20

    # replay: a fresh stream over the SAME files converges to the same
    # store without any write (empty deltas — no ledger needed)
    def snap():
        out = {}
        for root, _, files in os.walk(store):
            for f in files:
                p = os.path.join(root, f)
                out[p] = os.path.getmtime(p)
        return out

    before = snap()
    q2 = stream_components(
        spark.readStream.schema(ET).option("maxFilesPerTrigger", 1).parquet(srcdir),
        store,
        checkpoint_path=str(tmp_path / "ck2"),
    )
    q2.awaitTermination(120)
    assert snap() == before


def test_stream_pareto_unreadable_ledger_refuses(spark, tmp_path):
    """A ledger that is neither the keyed JSON nor a bare int (e.g. a
    partially-written '{"run_key": "k"}') must refuse loudly instead of
    adopting last_batch=-1 and double-counting replays."""
    from arrowhouse_spark.streaming.replace import _pareto_process_batch

    PT = "x double, y long, pid long"
    store = str(tmp_path / "front")
    _pareto_process_batch(
        spark.createDataFrame([(10.0, 5, 1)], PT), 0, store, "x", "y", "pid",
        run_key="k",
    )
    with open(store + "__last_batch", "w") as fh:
        fh.write('{"run_key": "k"}')  # missing last_batch
    import pytest as _pytest

    with _pytest.raises(ValueError, match="unreadable"):
        _pareto_process_batch(
            spark.createDataFrame([(9.0, 6, 2)], PT), 1, store, "x", "y",
            "pid", run_key="k",
        )


def test_stream_ivf_append_matches_batch_store(spark, tmp_path):
    """Streaming IVF maintenance: after the stream drains, the store
    equals ivf_store_init + batch appends over the same vectors, a
    replayed stream appends nothing, and probing all cells is exact."""
    from pyspark.sql import functions as F

    from arrowhouse_spark.operators.similarity import (
        cosine_topk_query,
        ivf_store_init,
        ivf_store_topk,
    )
    from arrowhouse_spark.streaming.replace import stream_ivf_append

    dim = 8
    base = spark.range(120).select(
        F.col("id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(0), F.lit(dim - 1)),
            lambda j: (
                (F.pmod(F.xxhash64("id", j), F.lit(2001)) - F.lit(1000))
                / F.lit(1000.0)
            ).cast("double"),
        ).alias("embedding"),
    ).localCheckpoint()
    init = base.filter(F.col("vec_id") < 40)
    b1 = base.filter((F.col("vec_id") >= 40) & (F.col("vec_id") < 80))
    b2 = base.filter(F.col("vec_id") >= 80)

    store = str(tmp_path / "ivfs")
    ivf_store_init(init, store, n_centroids=4)

    srcdir = str(tmp_path / "vecs")
    os.makedirs(srcdir)
    import time as _t

    now = _t.time()
    for i, part in enumerate([b1, b2], start=1):
        tmpd = str(tmp_path / f"vb{i}")
        part.coalesce(1).write.parquet(tmpd)
        [pf] = [f for f in os.listdir(tmpd) if f.endswith(".parquet")]
        dstp = f"{srcdir}/b{i}.parquet"
        shutil.copy(f"{tmpd}/{pf}", dstp)
        os.utime(dstp, (now - 600 + i * 60, now - 600 + i * 60))

    schema = "vec_id long, embedding array<double>"
    q = stream_ivf_append(
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(srcdir),
        store,
        checkpoint_path=str(tmp_path / "ck"),
    )
    q.awaitTermination(120)

    got_ids = sorted(
        r.vec_id for r in spark.read.parquet(store + "/postings").collect()
    )
    assert got_ids == list(range(120))  # no loss, no duplicates

    qv = [0.3] * dim
    got = [(r.vec_id, r.cos_sim) for r in ivf_store_topk(spark, store, qv, k=10, nprobe=4).collect()]
    exp = [(r.vec_id, r.cos_sim) for r in cosine_topk_query(base, qv, k=10).collect()]
    assert got == exp

    # replayed stream: fresh checkpoint, same files — appends nothing
    import os as _os

    def files():
        out = {}
        for root, _, fs in _os.walk(store + "/postings"):
            for f in fs:
                p = _os.path.join(root, f)
                out[p] = _os.path.getmtime(p)
        return out

    before = files()
    q2 = stream_ivf_append(
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(srcdir),
        store,
        checkpoint_path=str(tmp_path / "ck2"),
    )
    q2.awaitTermination(120)
    assert files() == before


def test_stream_ivf_upsert_moves_vectors(spark, tmp_path):
    """Streaming upsert maintenance: a micro-batch stream that re-delivers
    known ids with CHANGED vectors leaves the store content-equal to a
    from-scratch rebuild over the final vectors (single residency per id),
    and a replayed stream is content-idempotent."""
    from pyspark.sql import functions as F

    from arrowhouse_spark.operators.similarity import ivf_store_init
    from arrowhouse_spark.streaming.replace import stream_ivf_upsert

    dim = 8
    base = spark.range(90).select(
        F.col("id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(0), F.lit(dim - 1)),
            lambda j: (
                (F.pmod(F.xxhash64("id", j), F.lit(2001)) - F.lit(1000))
                / F.lit(1000.0)
            ).cast("double"),
        ).alias("embedding"),
    ).localCheckpoint()
    store = str(tmp_path / "ivfs")
    ivf_store_init(base, store, n_centroids=4)

    # batch 1: new ids 90..99; batch 2: ids 0..29 with FLIPPED vectors
    fresh = spark.range(90, 100).select(
        F.col("id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(0), F.lit(dim - 1)),
            lambda j: (
                (F.pmod(F.xxhash64("id", j), F.lit(2001)) - F.lit(1000))
                / F.lit(1000.0)
            ).cast("double"),
        ).alias("embedding"),
    )
    moved = base.filter(F.col("vec_id") < 30).select(
        "vec_id", F.transform("embedding", lambda x: -x).alias("embedding")
    )

    srcdir = str(tmp_path / "vecs")
    os.makedirs(srcdir)
    import time as _t

    now = _t.time()
    for i, part in enumerate([fresh, moved], start=1):
        tmpd = str(tmp_path / f"vb{i}")
        part.coalesce(1).write.parquet(tmpd)
        [pf] = [f for f in os.listdir(tmpd) if f.endswith(".parquet")]
        dstp = f"{srcdir}/b{i}.parquet"
        shutil.copy(f"{tmpd}/{pf}", dstp)
        os.utime(dstp, (now - 600 + i * 60, now - 600 + i * 60))

    schema = "vec_id long, embedding array<double>"
    q = stream_ivf_upsert(
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(srcdir),
        store,
        checkpoint_path=str(tmp_path / "ck"),
    )
    q.awaitTermination(120)

    def postings():
        return {
            (r.vec_id, r.centroid, tuple(r.embedding))
            for r in spark.read.parquet(store + "/postings").collect()
        }

    got = postings()
    # single residency for every id; moved ids carry the flipped vector
    ids = sorted(p[0] for p in got)
    assert ids == list(range(100))
    # batch-twin oracle: same init, batch upserts of the same batches
    # (a from-scratch init over the final vectors would sample DIFFERENT
    # centroids — the quantizer is frozen at init, so parity is against
    # the batch operator under the same quantizer)
    from arrowhouse_spark.operators.similarity import ivf_store_upsert

    store2 = str(tmp_path / "batch_twin")
    ivf_store_init(base, store2, n_centroids=4)
    ivf_store_upsert(fresh, store2)
    ivf_store_upsert(moved, store2)
    twin = {
        (r.vec_id, r.centroid, tuple(r.embedding))
        for r in spark.read.parquet(store2 + "/postings").collect()
    }
    assert got == twin
    moved_set = {r.vec_id for r in moved.select("vec_id").collect()}
    for vid, _c, emb in got:
        if vid in moved_set:
            base_emb = tuple(
                base.filter(F.col("vec_id") == vid).collect()[0]["embedding"]
            )
            assert emb == tuple(-x for x in base_emb)
            break  # one spot-check is enough; full parity is the twin

    # replay with a fresh checkpoint: content-idempotent
    q2 = stream_ivf_upsert(
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(srcdir),
        store,
        checkpoint_path=str(tmp_path / "ck2"),
    )
    q2.awaitTermination(120)
    assert postings() == got


def test_band_store_retract_forgets_and_prunes(spark, tmp_path):
    """GDPR retraction on the minhash band store: a retracted doc's band
    rows vanish (future batches re-admit its near-dups), only partitions
    holding a retracted row are rewritten, retracting everything removes
    the store dir, and the legacy unpartitioned layout rewrites whole."""
    import os

    from arrowhouse_spark.streaming.replace import (
        _minhash_process_batch,
        band_store_retract,
    )

    DT = "doc_id long, text string"
    base = "the quick brown fox jumps over the lazy dog again and again"
    docs1 = [(1, base), (2, "completely different words entirely here now ok")]
    docs2 = [(11, base + " x")]  # near-dup of doc 1 -> dropped by batch 2
    store = str(tmp_path / "band_store")
    out = str(tmp_path / "out")
    _minhash_process_batch(
        spark.createDataFrame(docs1, DT), 0, store, out, threshold=0.5
    )
    _minhash_process_batch(
        spark.createDataFrame(docs2, DT), 1, store, out, threshold=0.5
    )
    kept_b2 = {
        r.doc_id
        for r in spark.read.parquet(out).filter("batch_id = 1").collect()
    }
    assert kept_b2 == set()  # 11 dropped as near-dup of stored doc 1

    def files():
        o = {}
        for root, _, fs in os.walk(store):
            for f in fs:
                p = os.path.join(root, f)
                o[p] = os.path.getmtime(p)
        return o

    before = files()
    removed = band_store_retract(spark, store, [1])
    assert removed > 0
    left = {r.doc_id for r in spark.read.parquet(store).collect()}
    assert left == {2}
    # doc 2's batch-0 rows share doc 1's partition (batch 0) — but batch
    # 1's partition (empty: no survivors) was never touched; with only
    # batch 0 present all partitions were hit, so just check rows moved
    # correctly, then prove the retraction EFFECT: re-delivering the
    # near-dup in a later batch now SURVIVES (nothing to match against)
    _minhash_process_batch(
        spark.createDataFrame(docs2, DT), 2, store, out, threshold=0.5
    )
    kept_b3 = {
        r.doc_id
        for r in spark.read.parquet(out).filter("batch_id = 2").collect()
    }
    assert kept_b3 == {11}
    # unknown ids are a no-op
    assert band_store_retract(spark, store, [999]) == 0
    # full drain removes the store dir
    assert band_store_retract(spark, store, [2, 11]) > 0
    assert not os.path.exists(store)

    # legacy unpartitioned layout: plain band-index relation on disk
    legacy = str(tmp_path / "legacy_store")
    spark.createDataFrame(
        [(1, 100, 0, 7), (2, 200, 0, 9)],
        "doc_id long, minhash long, band int, bucket long",
    ).write.parquet(legacy)
    assert band_store_retract(spark, legacy, [1]) == 1
    assert {r.doc_id for r in spark.read.parquet(legacy).collect()} == {2}


def test_band_store_retract_shuffle_regime_matches_broadcast(
    spark, tmp_path, monkeypatch
):
    """band_store_retract's id-set joins are count-gated (idgate,
    round-11 verdict #1): identical surviving band rows whether the id
    set rides a broadcast hint or a plain shuffle join (limit forced to
    0), on both the batch_id-partitioned and legacy layouts."""
    from arrowhouse_spark.operators import idgate
    from arrowhouse_spark.streaming.replace import band_store_retract

    rows = [
        (d, d * 100 + b, b, (d * 7 + b) % 5, d % 3)
        for d in range(1, 21)
        for b in range(4)
    ]
    SCHEMA = "doc_id long, minhash long, band int, bucket long, batch_id int"
    victims = [2, 5, 13, 19]

    def build_and_retract(path: str, partitioned: bool):
        df = spark.createDataFrame(rows, SCHEMA)
        if partitioned:
            df.write.partitionBy("batch_id").parquet(path)
        else:
            df.drop("batch_id").write.parquet(path)
        removed = band_store_retract(spark, path, victims)
        left = sorted(
            (r.doc_id, r.minhash, r.band, r.bucket)
            for r in spark.read.parquet(path).collect()
        )
        return removed, left

    rem_b, left_b = build_and_retract(str(tmp_path / "p_bcast"), True)
    lrem_b, lleft_b = build_and_retract(str(tmp_path / "l_bcast"), False)
    monkeypatch.setattr(idgate, "BROADCAST_ID_LIMIT", 0)
    rem_s, left_s = build_and_retract(str(tmp_path / "p_shuf"), True)
    lrem_s, lleft_s = build_and_retract(str(tmp_path / "l_shuf"), False)
    assert rem_b == rem_s == len(victims) * 4
    assert left_b == left_s
    assert lrem_b == lrem_s and lleft_b == lleft_s
    assert not any(t[0] in victims for t in left_b)


def test_scd2_store_retract_forgets_history(spark, tmp_path):
    """GDPR retraction on the persistent SCD2 store: a retracted key's
    ENTIRE validity-interval history vanishes, other keys' histories are
    untouched (and keep folding), the locate needs no n_buckets (kb read
    off the store's own rows), unknown keys no-op, both broadcast-gate
    regimes are identical, and a full drain removes the store dir."""
    import os

    from arrowhouse_spark.operators import idgate
    from arrowhouse_spark.operators.forget import forget_ids
    from arrowhouse_spark.streaming.replace import (
        _scd2_process_batch,
        scd2_store_retract,
    )

    def mk(rows):
        return spark.createDataFrame(
            [(u, f"2024-01-0{t} 00:00:00", a, e) for u, t, a, e in rows],
            "user_id long, ts string, plan string, event_id long",
        ).withColumn("ts", F.col("ts").cast("timestamp"))

    def build(store):
        kw = dict(
            store_path=store, key_cols=["user_id"], ts_col="ts",
            attr_col="plan", tie_col="event_id", n_buckets=4,
        )
        _scd2_process_batch(
            mk([(1, 1, "free", 10), (1, 3, "pro", 11), (2, 1, "free", 12),
                (3, 2, "team", 13), (4, 1, "free", 14)]),
            0, **kw,
        )
        return kw

    def users(store):
        return sorted(
            {r.user_id for r in spark.read.parquet(store).collect()}
        )

    store = str(tmp_path / "scd2_store")
    kw = build(store)
    assert users(store) == [1, 2, 3, 4]

    removed = scd2_store_retract(spark, store, [1, 99])
    assert removed == 2  # user 1 had two history rows; 99 unknown
    assert users(store) == [2, 3, 4]
    # the store still folds for surviving keys after the rewrite
    _scd2_process_batch(mk([(2, 5, "pro", 20)]), 1, **kw)
    rows2 = sorted(
        (r.plan, str(r.valid_from))
        for r in spark.read.parquet(store)
        .filter(F.col("user_id") == 2)
        .collect()
    )
    assert rows2 == [
        ("free", "2024-01-01 00:00:00"),
        ("pro", "2024-01-05 00:00:00"),
    ]
    assert scd2_store_retract(spark, store, [999]) == 0  # no-op

    # shuffle regime (gate forced off) produces the identical store
    store_s = str(tmp_path / "scd2_shuffle")
    build(store_s)
    import pytest

    mp = pytest.MonkeyPatch()
    try:
        mp.setattr(idgate, "BROADCAST_ID_LIMIT", 0)
        assert scd2_store_retract(spark, store_s, [1, 99]) == 2
    finally:
        mp.undo()
    assert users(store_s) == [2, 3, 4]

    # forget_ids drives it as the 'scd2' manifest kind; full drain
    # removes the dir and the re-run no-ops (recovery contract)
    manifest = [{"path": store, "kind": "scd2"}]
    got = forget_ids(spark, manifest, [2, 3, 4]).collect()[0]
    assert (got.kind, got.rows_removed) == ("scd2", 4)
    assert not os.path.exists(store)
    again = forget_ids(spark, manifest, [2, 3, 4]).collect()[0]
    assert again.rows_removed == 0
