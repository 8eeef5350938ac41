"""In-memory sources ≡ One/BlocksList/Null block input streams
(/root/reference/DataStreams/OneBlockInputStream.h:17-46,
BlocksListBlockInputStream.h:13-39, NullBlockInputStream.h).

The reference's streams emit fixed in-memory Arrow batches; the Spark analog is
``spark.createDataFrame`` with an explicit schema (the engine keeps the
reference's explicit-``getHeader()`` discipline: schema is always declared,
never inferred — IBlockInputStream.h:117-123).
"""

from __future__ import annotations

from collections.abc import Iterable, Sequence
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def one_block(spark: SparkSession, rows: Sequence[Any], schema: T.StructType) -> DataFrame:
    """A single batch emitted once ≡ OneBlockInputStream."""
    return spark.createDataFrame(rows, schema)


def blocks_list(
    spark: SparkSession, blocks: Iterable[Sequence[Any]], schema: T.StructType
) -> DataFrame:
    """A list of batches ≡ BlocksListBlockInputStream. Order-preserving
    concatenation (UNION ALL semantics, like ConcatBlockInputStream)."""
    dfs = [spark.createDataFrame(b, schema) for b in blocks]
    if not dfs:
        return null_source(spark, schema)
    out = dfs[0]
    for d in dfs[1:]:
        out = out.unionAll(d)
    return out


def null_source(spark: SparkSession, schema: T.StructType) -> DataFrame:
    """Empty source with a header ≡ NullBlockInputStream."""
    return spark.createDataFrame([], schema)


def null_sink(df: DataFrame) -> None:
    """Discarding sink ≡ NullBlockOutputStream — executes the plan, drops rows."""
    df.write.format("noop").mode("overwrite").save()
