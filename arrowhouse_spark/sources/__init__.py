"""Sources and sinks (SURVEY.md §2.1)."""

from arrowhouse_spark.sources.parquet import read_parquet, load_tables
from arrowhouse_spark.sources.memory import one_block, blocks_list, null_source

__all__ = ["read_parquet", "load_tables", "one_block", "blocks_list", "null_source"]
