"""Runtime bloom-filter join pruning — the 100 TB shuffle-join technique.

When a selective dimension filter feeds a SHUFFLE join, Spark's
InjectRuntimeFilter builds a bloom filter from the dimension's join keys
and pushes `might_contain(...)` onto the FACT side's scan — rows that
cannot match are dropped before the fact-side shuffle, which at 100 TB
is the difference between shuffling the whole fact table and shuffling
the matching fraction. The feature is deliberately threshold-gated to
the big-data regime (`applicationSideScanSizeThreshold` defaults to
10GB, far above any test fixture), so these tests lower the gate — via
scoped runtime confs restored after each assertion (optimization
happens at plan-access/action time, INSIDE the scope) — to pin (a) the
injection fires, (b) results are IDENTICAL with and without it: the
filter is semantically transparent (false positives only pre-filter;
the join stays exact).

Not a registered bench query: the shuffle-join context needs
autoBroadcastJoinThreshold=-1, which would reshape every later query in
the shared 141-query bench session; the mechanism is proven here with
scoped confs, with the doctrine recorded in SCALE.md.
"""

from __future__ import annotations

from contextlib import contextmanager

from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.01"

_BLOOM_CONFS = {
    "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
    "spark.sql.optimizer.runtime.bloomFilter."
    "applicationSideScanSizeThreshold": "0",
    "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "100MB",
    "spark.sql.autoBroadcastJoinThreshold": "-1",
}


@contextmanager
def _bloom_confs(spark):
    old = {}
    for k, v in _BLOOM_CONFS.items():
        try:
            old[k] = spark.conf.get(k)
        except Exception:  # noqa: BLE001 — unset conf
            old[k] = None
        spark.conf.set(k, v)
    try:
        yield
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def _revenue(spark):
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    return (
        li.join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("l_extendedprice"), 2).alias("rev"),
        )
    )


def test_bloom_filter_injected_on_selective_shuffle_join(spark):
    with _bloom_confs(spark):
        df = _revenue(spark)
        # executedPlan() optimizes NOW, inside the conf scope
        plan = df._jdf.queryExecution().executedPlan().toString()  # noqa: SLF001
    assert "bloom_filter_agg" in plan  # built from the dim's join keys
    assert "might_contain" in plan  # pushed onto the fact side
    assert "ShuffledHashJoin" in plan or "SortMergeJoin" in plan


def test_bloom_filter_is_semantically_transparent(spark):
    with _bloom_confs(spark):
        with_bloom = sorted(tuple(r) for r in _revenue(spark).collect())
    without = sorted(tuple(r) for r in _revenue(spark).collect())
    assert with_bloom == without
    assert len(with_bloom) == 1
