"""write_training_shards / shard_manifest (sources/shards.py): determinism,
one file per shard, checksum sensitivity, and shard partition-pruning."""

from __future__ import annotations

import glob
import os

from pyspark.sql import functions as F

from arrowhouse_spark.sources.shards import shard_manifest, write_training_shards

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


import pytest

pytestmark = pytest.mark.slow  # full tier: streaming/property/e2e (see pytest.ini)


def _docs(spark):
    return spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))


def _manifest_rows(spark, path):
    return {
        r.shard: (r.n_docs, r.n_tokens, r.n_bytes, r.xor_checksum)
        for r in shard_manifest(spark, path).collect()
    }


def test_shards_deterministic_across_writes(spark, tmp_path):
    docs = _docs(spark)
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    write_training_shards(docs, a, n_shards=8)
    write_training_shards(docs.orderBy(F.rand(7)), b, n_shards=8)
    ma, mb = _manifest_rows(spark, a), _manifest_rows(spark, b)
    assert ma == mb and len(ma) == 8
    assert sum(v[0] for v in ma.values()) == docs.count()


def test_shards_one_file_per_shard(spark, tmp_path):
    p = str(tmp_path / "s")
    write_training_shards(_docs(spark), p, n_shards=8)
    for k in range(8):
        files = glob.glob(os.path.join(p, f"shard={k}", "*.parquet"))
        assert len(files) == 1, (k, files)


def test_shards_checksum_flips_on_single_byte(spark, tmp_path):
    docs = _docs(spark)
    clean, dirty = str(tmp_path / "c"), str(tmp_path / "d")
    write_training_shards(docs, clean, n_shards=8)
    victim = docs.select(F.min("doc_id")).first()[0]
    mutated = docs.withColumn(
        "text",
        F.when(F.col("doc_id") == victim, F.concat(F.col("text"), F.lit("!")))
        .otherwise(F.col("text")),
    )
    write_training_shards(mutated, dirty, n_shards=8)
    mc, md = _manifest_rows(spark, clean), _manifest_rows(spark, dirty)
    diff = [k for k in mc if mc[k] != md[k]]
    assert len(diff) == 1  # exactly the victim's shard changed
    k = diff[0]
    assert mc[k][0] == md[k][0]  # same docs
    assert mc[k][3] != md[k][3]  # checksum flipped
    assert md[k][2] == mc[k][2] + 1  # one extra byte


def test_shards_read_prunes_partitions(spark, tmp_path):
    p = str(tmp_path / "pr")
    write_training_shards(_docs(spark), p, n_shards=8)
    one = spark.read.parquet(p).filter(F.col("shard") == 3)
    plan = one._jdf.queryExecution().executedPlan().toString()
    # the shard predicate must be a partition filter on the scan, and the
    # pruned read must return only shard-3 rows
    assert "PartitionFilters" in plan and "shard" in plan
    assert one.select(F.count_distinct("shard")).first()[0] == 1


def test_shards_append_equals_union(spark, tmp_path):
    # incremental daily export: day-2 appended into the store must produce
    # the same manifest as a one-shot export of the union (counts additive,
    # XOR checksum order-insensitive), and each shard gains one file per day
    docs = _docs(spark)
    day1 = docs.filter(F.col("doc_id") % 2 == 0)
    day2 = docs.filter(F.col("doc_id") % 2 == 1)
    inc, oneshot = str(tmp_path / "inc"), str(tmp_path / "one")
    write_training_shards(day1, inc, n_shards=8)
    write_training_shards(day2, inc, n_shards=8, mode="append")
    write_training_shards(docs, oneshot, n_shards=8)
    assert _manifest_rows(spark, inc) == _manifest_rows(spark, oneshot)
    files = glob.glob(os.path.join(inc, "shard=0", "*.parquet"))
    assert len(files) == 2  # one file per ingest day


def test_shard_store_retract_and_manifest_recertifies(spark, tmp_path):
    """GDPR retraction on the training-shard export: a retracted doc's
    row vanishes from its shard, untouched shards keep their files
    byte-for-byte (mtime check), the rewritten shard stays one sorted
    file, the re-read manifest re-certifies the post-forget state
    (counts and checksum change for exactly the touched shards), unknown
    ids no-op, both broadcast-gate regimes match, and a full drain
    removes the directory."""
    import os

    from arrowhouse_spark.operators import idgate
    from arrowhouse_spark.sources.shards import (
        shard_manifest,
        shard_store_retract,
        write_training_shards,
    )

    docs = spark.createDataFrame(
        [(i, f"doc body number {i} with words") for i in range(40)],
        "doc_id long, text string",
    )
    path = str(tmp_path / "shards")
    write_training_shards(docs, path, n_shards=4)
    before = {r.shard: r for r in shard_manifest(spark, path).collect()}
    victims = [3, 17]
    vshards = {
        r.shard
        for r in spark.read.parquet(path)
        .filter(F.col("doc_id").isin(victims))
        .select("shard")
        .distinct()
        .collect()
    }

    def files():
        out = {}
        for root, _, fs in os.walk(path):
            for f in fs:
                p = os.path.join(root, f)
                out[p] = os.path.getmtime(p)
        return out

    snap = files()
    assert shard_store_retract(spark, path, victims) == 2
    after_files = files()
    for p, t in snap.items():
        shard = next((int(seg.split("=")[1]) for seg in p.split(os.sep)
                      if seg.startswith("shard=")), None)
        if shard is not None and shard not in vshards:
            assert after_files.get(p) == t, f"untouched shard rewritten: {p}"
    left = {r.doc_id for r in spark.read.parquet(path).collect()}
    assert left == set(range(40)) - set(victims)
    # one file per rewritten shard (byte-stable layout preserved)
    for s in vshards:
        n = len([f for f in os.listdir(f"{path}/shard={s}")
                 if f.endswith(".parquet")])
        assert n == 1
    after = {r.shard: r for r in shard_manifest(spark, path).collect()}
    for s, row in after.items():
        if s in vshards:
            assert row.n_docs < before[s].n_docs
            assert row.xor_checksum != before[s].xor_checksum
        else:
            assert (row.n_docs, row.xor_checksum) == (
                before[s].n_docs,
                before[s].xor_checksum,
            )
    assert shard_store_retract(spark, path, [999]) == 0  # unknown no-op

    # shuffle regime identical
    path2 = str(tmp_path / "shards2")
    write_training_shards(docs, path2, n_shards=4)
    import pytest

    mp = pytest.MonkeyPatch()
    try:
        mp.setattr(idgate, "BROADCAST_ID_LIMIT", 0)
        assert shard_store_retract(spark, path2, victims) == 2
    finally:
        mp.undo()
    assert {r.doc_id for r in spark.read.parquet(path2).collect()} == left

    # full drain removes the export directory
    assert shard_store_retract(spark, path, sorted(left)) == len(left)
    assert not os.path.exists(path)
