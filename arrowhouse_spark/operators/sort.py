"""Sort family ≡ the reference's YdbModes sort operators.

- ``sort``            ≡ full sort (MergeSortingBlockInputStream,
  /root/reference/DataStreams/MergeSortingBlockInputStream.cpp:10-90 — whose
  external spill is stubbed there; Spark's external sort is native, so the
  engine *gains* spill).
- ``sort_within_partitions`` ≡ batch-local sort (SortingBlockInputStream,
  YdbModes/SortingBlockInputStream.cpp:8-24 — sorts each batch independently).
- ``check_sorted``    ≡ CheckSortedBlockInputStream
  (YdbModes/CheckSortedBlockInputStream.cpp:9-57) — assertion helper.
- ``is_sorted_and_unique`` ≡ YdbModes/helpers.cpp:66-134 predicates.
- ``reverse_batches`` ≡ ReverseBlockInputStream
  (DataStreams/ReverseBlockInputStream.cpp:6-33) — batch-local row reversal,
  test-fidelity only, via mapInArrow (no JVM round-trip per row).

Scale notes: ``sort`` is Spark's range-partitioned external sort (sample →
range boundaries → shuffle → per-partition sort) — the distributed k-way merge
the reference runs single-node. ``orderBy().limit(k)`` compiles to
TakeOrderedAndProject (no full sort at all).

The reference supports ASC only and leaves NULL direction as a TODO
(Common/SortDescription.h:15-18, SortingBlockInputStream throws on DESC);
this engine supports both directions and explicit null placement — a superset.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Iterator, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class SortKey:
    """≡ SortDescription entry {column_name, direction} (Common/SortDescription.h:10-22),
    plus the nulls placement the reference leaves TODO."""

    column: str
    ascending: bool = True
    nulls_first: bool | None = None  # None = Spark default (first ASC, last DESC)

    def to_column(self) -> Column:
        c = F.col(self.column)
        if self.ascending:
            if self.nulls_first is None:
                return c.asc()
            return c.asc_nulls_first() if self.nulls_first else c.asc_nulls_last()
        if self.nulls_first is None:
            return c.desc()
        return c.desc_nulls_first() if self.nulls_first else c.desc_nulls_last()


def _cols(keys: Sequence[SortKey | str]) -> list[Column]:
    return [k.to_column() if isinstance(k, SortKey) else F.col(k).asc() for k in keys]


def sort(df: DataFrame, keys: Sequence[SortKey | str]) -> DataFrame:
    """Total sort of the relation (distributed range sort)."""
    return df.orderBy(*_cols(keys))


def top_k(df: DataFrame, keys: Sequence[SortKey | str], k: int) -> DataFrame:
    """orderBy + limit ⇒ TakeOrderedAndProject: each partition keeps a k-heap,
    driver merges — no global sort/shuffle. The reference has no LIMIT operator
    (SURVEY.md §2.5 last row); this is the Spark-free superset."""
    return df.orderBy(*_cols(keys)).limit(k)


def sort_within_partitions(df: DataFrame, keys: Sequence[SortKey | str]) -> DataFrame:
    """Partition-local sort, no shuffle ≡ per-batch SortingBlockInputStream."""
    return df.sortWithinPartitions(*_cols(keys))


def check_sorted(df: DataFrame, keys: Sequence[SortKey | str]) -> None:
    """Raise if ``df`` (in its current row order) is not sorted by ``keys``.

    Test/assertion helper ≡ CheckSortedBlockInputStream. Uses a single-partition
    window (fine for test data; do not call on 100 TB — like the reference's
    stream, it is a correctness gate, not a production operator).
    """
    from pyspark.sql import Window

    # Compare each row's physical position with its rank under the requested
    # order; any divergence (beyond tie reordering, broken by position) means
    # the flow is unsorted.
    w = Window.orderBy(F.monotonically_increasing_id())
    df2 = df.withColumn("__pos", F.row_number().over(w))
    w2 = Window.orderBy(*_cols(keys), F.col("__pos"))
    df3 = df2.withColumn("__rank", F.row_number().over(w2))
    violations = df3.filter(F.col("__pos") != F.col("__rank")).count()
    if violations:
        raise AssertionError(f"stream not sorted: {violations} rows out of order")


def is_sorted_and_unique(df: DataFrame, keys: Sequence[str]) -> bool:
    """≡ IsSortedAndUnique (helpers.cpp:66-134): sorted ascending with no
    duplicate keys. Distributed implementation: duplicate keys are detected by
    groupBy; sortedness by check_sorted."""
    dups = df.groupBy(*keys).count().filter(F.col("count") > 1).limit(1).count()
    if dups:
        return False
    try:
        check_sorted(df, list(keys))
    except AssertionError:
        return False
    return True


def reverse_batches(df: DataFrame) -> DataFrame:
    """Reverse row order within each Arrow batch ≡ ReverseBlockInputStream.
    Batch-local semantics preserved via mapInArrow (zero-copy per batch)."""

    def _rev(batches: Iterator["pyarrow.RecordBatch"]) -> Iterator["pyarrow.RecordBatch"]:  # noqa: F821
        import pyarrow as pa

        for b in batches:
            idx = pa.array(range(len(b) - 1, -1, -1), type=pa.int64())
            yield b.take(idx)

    return df.mapInArrow(_rev, df.schema)
