"""Sequence-packing tests: deterministic bucket/pack assignment, budget
boundary semantics, oversized docs, fill stats."""

from __future__ import annotations

from pyspark.sql import functions as F

from arrowhouse_spark.operators.packing import pack_sequences, pack_stats


def _docs(spark, sizes):
    rows = [(i, " ".join(["w"] * n)) for i, n in enumerate(sizes)]
    return spark.createDataFrame(rows, "doc_id: long, text: string")


def test_pack_single_bucket_boundaries(spark):
    """With one bucket the FFD order and boundary rule are fully explicit:
    docs sort by tokens desc then id, a doc joins the pack where its run
    starts."""
    df = _docs(spark, [50, 40, 30, 20, 10])  # ids 0..4
    out = {
        r.doc_id: (r.pack_id, r.pack_off)
        for r in pack_sequences(df, budget=60, n_buckets=1).collect()
    }
    # order: 50(id0) 40(id1) 30(id2) 20(id3) 10(id4); starts 0,50,90,120,140
    assert out == {0: (0, 0), 1: (0, 50), 2: (1, 30), 3: (2, 0), 4: (2, 20)}


def test_pack_oversized_doc_gets_own_start(spark):
    df = _docs(spark, [500, 5])
    out = {
        r.doc_id: r.pack_id for r in pack_sequences(df, budget=100, n_buckets=1).collect()
    }
    assert out[0] == 0 and out[1] == 5  # big doc spans packs 0-4; next starts at 5


def test_pack_never_crosses_bucket_and_is_layout_stable(spark):
    df = _docs(spark, [7] * 200)
    a = {(r.doc_id): (r.bucket, r.pack_id) for r in pack_sequences(df, 50).collect()}
    b = {
        (r.doc_id): (r.bucket, r.pack_id)
        for r in pack_sequences(df.repartition(13), 50).collect()
    }
    assert a == b  # hash bucket + deterministic order → layout-independent


def test_pack_stats_fill(spark):
    df = _docs(spark, [50, 40, 30, 20, 10])
    packed = pack_sequences(df, budget=60, n_buckets=1)
    st = {r.pack_id: (r.n_docs, r.pack_tokens, r.fill_ratio) for r in pack_stats(packed, 60).collect()}
    assert st == {0: (2, 90, 1.5), 1: (1, 30, 0.5), 2: (2, 30, 0.5)}


def test_pack_rejects_bad_budget(spark):
    import pytest

    with pytest.raises(ValueError):
        pack_sequences(_docs(spark, [3]), budget=0)


def test_pack_duplicate_ids_get_per_row_cumsum(spark):
    """Non-unique id_col makes full-ordering ties: the window must use a
    ROWS frame so each row still gets its own running sum. Under the default
    RANGE frame all four peer rows would share cum=40 → start=30 → one pack
    of 4 docs."""
    rows = [(7, " ".join(["w"] * 10))] * 4  # same id, same n_tokens
    df = spark.createDataFrame(rows, "doc_id: long, text: string")
    packed = pack_sequences(df, budget=20, n_buckets=1)
    st = {
        r.pack_id: (r.n_docs, r.pack_tokens)
        for r in pack_stats(packed, 20).collect()
    }
    assert st == {0: (2, 20), 1: (2, 20)}
    # per-row starts are 0,10,20,30 → offsets 0,10,0,10
    offs = sorted(r.pack_off for r in packed.collect())
    assert offs == [0, 0, 10, 10]
