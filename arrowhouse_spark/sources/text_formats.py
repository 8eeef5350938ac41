"""CSV / JSON-lines sources (capability superset — the reference reads only
Parquet + in-memory batches, SURVEY.md §2.1; Spark's readers come free and
keep the explicit-schema discipline)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def read_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    header: bool = True,
    delimiter: str = ",",
) -> DataFrame:
    """Schema is required (never inferred — inference reads the data twice and
    can drift between runs; the reference's getHeader contract applies)."""
    return (
        spark.read.schema(schema)
        .option("header", header)
        .option("delimiter", delimiter)
        .csv(path)
    )


def read_jsonl(spark: SparkSession, path: str, schema: T.StructType) -> DataFrame:
    return spark.read.schema(schema).json(path)


def write_csv(
    df: DataFrame,
    path: str,
    header: bool = True,
    delimiter: str = ",",
    mode: str = "overwrite",
) -> None:
    """Sink ≡ IBlockOutputStream (DataStreams/IBlockOutputStream.h:17-55);
    the reference's copyNToOne N-sources-to-one-sink composition is Spark's
    N-partitions-to-files write, no mutex needed (GuardedBlockOutputStream
    is the task-commit protocol here)."""
    df.write.mode(mode).option("header", header).option("delimiter", delimiter).csv(path)


def write_jsonl(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).json(path)


def read_orc(spark: SparkSession, path: str, schema: T.StructType) -> DataFrame:
    """ORC source (columnar sibling of the parquet path — same pushdown and
    pruning guarantees via Spark's native vectorized ORC reader; schema
    explicit per the getHeader discipline)."""
    return spark.read.schema(schema).orc(path)


def write_orc(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """ORC sink, task-commit protocol as with the parquet writer."""
    df.write.mode(mode).orc(path)
