"""Bucketed tables — shuffle-free co-located joins and aggregations.

The reference ships partial-aggregate state between nodes and lets the host
system own placement (design note /root/reference/Aggregator.cpp:661-663);
Spark's equivalent placement contract is bucketing: write both tables
hash-bucketed on the join/group key, and every later join or aggregation on
that key runs with NO shuffle exchange — at 100 TB this converts the
dominant repeated cost (re-shuffling a fact table per query) into a one-time
write-side layout. tests/test_bucketed.py asserts the no-Exchange plan.

local[32] note: buckets ≈ 2–4× cores; on a cluster, buckets should be sized
so one bucket ≈ one HDFS/object-store block (128–512 MB) per table.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: Sequence[str],
    n_buckets: int = 8,
    sort_cols: Sequence[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a bucketed (and optionally per-bucket sorted) table.
    Sorting by the key additionally removes the Sort below a sort-merge join
    (full co-location: neither shuffle nor sort at read time)."""
    w = df.write.mode(mode).bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.format("parquet").saveAsTable(table)


def co_located_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: Sequence[str],
    how: str = "inner",
) -> DataFrame:
    """Join two tables bucketed on the same keys with the same bucket count —
    plans as a zero-Exchange sort-merge join."""
    return spark.table(left_table).join(spark.table(right_table), list(on), how)
