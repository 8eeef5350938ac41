from __future__ import annotations

import pytest

from arrowhouse_spark.operators.clustering import kmeans_lloyd


def test_kmeans_separates_two_obvious_blobs(spark):
    # blob A around (0,0), blob B around (10,10); seeds are ids 1 and 2 —
    # one in each blob, so one iteration already lands the right split
    rows = [
        (1, [0.0, 0.1]),
        (2, [10.0, 10.0]),
        (3, [0.2, -0.1]),
        (4, [9.8, 10.2]),
        (5, [0.1, 0.0]),
        (6, [10.1, 9.9]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, vec array<float>")
    out = kmeans_lloyd(df, "vec_id", "vec", k=2, iters=2).collect()
    got = {r["vec_id"]: r["cluster_id"] for r in out}
    assert got == {1: 1, 3: 1, 5: 1, 2: 2, 4: 2, 6: 2}
    # members sit near their centroid: squared distance is small
    assert all(float(r["sqdist"]) < 0.1 for r in out)


def test_kmeans_deterministic_under_repartitioning(spark):
    import random

    rng = random.Random(11)
    rows = [
        (i, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(60)
    ]
    df = spark.createDataFrame(rows, "vec_id long, vec array<float>")
    a = sorted(
        (r["vec_id"], r["cluster_id"], str(r["sqdist"]))
        for r in kmeans_lloyd(df, "vec_id", "vec", k=3, iters=2).collect()
    )
    b = sorted(
        (r["vec_id"], r["cluster_id"], str(r["sqdist"]))
        for r in kmeans_lloyd(
            df.repartition(7), "vec_id", "vec", k=3, iters=2
        ).collect()
    )
    assert a == b


def test_kmeans_rejects_bad_params(spark):
    df = spark.createDataFrame([(1, [1.0])], "vec_id long, vec array<float>")
    with pytest.raises(ValueError):
        kmeans_lloyd(df, "vec_id", "vec", k=0)
    with pytest.raises(ValueError):
        kmeans_lloyd(df, "vec_id", "vec", iters=0)


def test_pq_adc_query_ranks_first_and_dupes_tie(spark):
    import random

    from arrowhouse_spark.operators.clustering import pq_adc_topk

    rng = random.Random(3)
    base = [rng.uniform(-1, 1) for _ in range(32)]
    rows = [(0, base), (7, list(base))]  # 7 is an exact duplicate of the query
    rows += [
        (i, [rng.uniform(-1, 1) for _ in range(32)]) for i in range(1, 40) if i != 7
    ]
    df = spark.createDataFrame(rows, "vec_id long, vec array<float>")
    got = pq_adc_topk(df, "vec_id", "vec", subdim=8, k_cb=3, k=5).collect()
    # the query's own codes minimize every per-subspace table entry, so the
    # query (min id) must rank first; its exact duplicate shares all codes
    # hence the identical ADC, and follows on the id tie-break
    assert [r["vec_id"] for r in got[:2]] == [0, 7]
    assert got[0]["adc_dist"] == got[1]["adc_dist"]
    assert all(r["adc_dist"] >= 0 for r in got)


def test_pq_adc_deterministic_under_repartitioning(spark):
    import random

    from arrowhouse_spark.operators.clustering import pq_adc_topk

    rng = random.Random(9)
    rows = [
        (i, [rng.uniform(-1, 1) for _ in range(16)]) for i in range(50)
    ]
    df = spark.createDataFrame(rows, "vec_id long, vec array<float>")
    a = [tuple(r) for r in pq_adc_topk(df, "vec_id", "vec", subdim=4).collect()]
    b = [
        tuple(r)
        for r in pq_adc_topk(df.repartition(11), "vec_id", "vec", subdim=4).collect()
    ]
    assert a == b


def test_pq_adc_rejects_bad_params(spark):
    import pytest

    from arrowhouse_spark.operators.clustering import pq_adc_topk

    df = spark.createDataFrame([(1, [1.0])], "vec_id long, vec array<float>")
    with pytest.raises(ValueError):
        pq_adc_topk(df, "vec_id", "vec", subdim=0)


def test_ivf_store_init_append_query_drift(spark, tmp_path):
    """Persistent IVF index lifecycle: init on batch 1, append batch 2
    (frozen centroids), idempotent re-append, exact parity at
    nprobe=n_centroids, partition-pruned probes, drift report."""
    import os

    from pyspark.sql import functions as F

    from arrowhouse_spark.operators.similarity import (
        cosine_topk_query,
        ivf_store_append,
        ivf_store_drift,
        ivf_store_init,
        ivf_store_topk,
    )

    n, dim = 300, 8
    base = spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(0), F.lit(dim - 1)),
            lambda j: (
                (F.pmod(F.xxhash64("id", j), F.lit(2001)) - F.lit(1000))
                / F.lit(1000.0)
            ).cast("double"),
        ).alias("embedding"),
    ).localCheckpoint()
    b1 = base.filter(F.col("vec_id") % 3 == 0)
    b2 = base.filter(F.col("vec_id") % 3 != 0)

    store = str(tmp_path / "ivf")
    ivf_store_init(b1, store, n_centroids=4)
    appended = ivf_store_append(b2, store)
    assert appended.count() == b2.count()

    # idempotent: the same batch again appends nothing, files unchanged
    def files():
        out = {}
        for root, _, fs in os.walk(store + "/postings"):
            for f in fs:
                p = os.path.join(root, f)
                out[p] = os.path.getmtime(p)
        return out

    before = files()
    again = ivf_store_append(b2, store)
    assert again.count() == 0 and files() == before

    # nprobe = n_centroids is exact brute force over the union
    qv = [float(j % 3 - 1) for j in range(dim)]
    got = [
        (r.vec_id, r.cos_sim)
        for r in ivf_store_topk(spark, store, qv, k=15, nprobe=4).collect()
    ]
    exp = [
        (r.vec_id, r.cos_sim)
        for r in cosine_topk_query(base, qv, k=15).collect()
    ]
    assert got == exp

    # pruned probe: only the probed cells' partitions are scanned
    cand = ivf_store_topk(spark, store, qv, k=5, nprobe=1)
    plan = cand._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "centroid" in plan

    # drift: global row present, per-cell rows cover the batch
    d = {r.centroid: (r.n, r.mean_best_cos) for r in
         ivf_store_drift(spark, store, b2).collect()}
    assert -1 in d and d[-1][0] == b2.count()
    assert sum(v[0] for c, v in d.items() if c >= 0) == b2.count()
