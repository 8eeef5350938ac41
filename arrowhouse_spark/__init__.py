"""arrowhouse_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of 4ertus2/ArrowHouse (ClickHouse GROUP-BY engine +
DataStreams operators over Arrow), re-expressed Spark-first.

The reference (read-only at /root/reference) is a C++ library exposing:
  1. an SSA-style per-batch query ``Program`` (assign → filter → group-by →
     project; YdbModes/SsaProgram.h:234-289),
  2. composable pull-based ``IBlockInputStream`` operator trees
     (DataStreams/IBlockInputStream.h:24-124),
  3. ClickHouse aggregate functions bridged into arrow::compute
     (AggregateFunctions/AggregateFunctionWrapper.h:13-250).

This package re-expresses those capabilities as *declarative DataFrame programs*
so Catalyst/Tungsten supply the physical machinery the reference hand-rolls
(hash aggregation, sorts, spill, parallelism — see SURVEY.md §4). Nothing here
is a translation of the C++ execution engine.

Layout:
  program / compile   — the SSA Program API and its compiler to DataFrame ops
  functions/          — scalar-op registry, ClickHouse-semantics aggregates, hashing
  operators/          — sort/merge/replace, set ops, dedup, similarity, text analysis
  sources/            — parquet / in-memory sources and sinks
  streaming/          — Structured-Streaming variants (replace-merge as stateful dedup)
"""

from arrowhouse_spark.session import get_spark
from arrowhouse_spark.program import (
    Assign,
    AggregateAssign,
    GroupBy,
    Op,
    Program,
    ProgramStep,
)
from arrowhouse_spark.compile import apply_program

__all__ = [
    "get_spark",
    "Assign",
    "AggregateAssign",
    "GroupBy",
    "Op",
    "Program",
    "ProgramStep",
    "apply_program",
]

__version__ = "0.1.0"
