"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

All query definitions live in ``arrowhouse_spark.suite`` — one registry entry
per implemented capability from SURVEY.md §2 + the data-pipeline extensions.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from arrowhouse_spark import suite


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1 pricing summary as an SSA program) on
    /root/testdata/sf0.001; driver checks rows>0. Looked up through the
    registry (the function moved into the suite package's foundation
    chunk in round 9 — registry access is the stable address)."""
    return suite._QUERIES["q1_pricing_summary"](
        spark, "/root/testdata/sf0.001"
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return suite.queries()


def oracle_sql() -> dict[str, str]:
    return suite.oracle_sql()
