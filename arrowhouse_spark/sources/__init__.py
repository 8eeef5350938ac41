"""Sources and sinks (SURVEY.md §2.1)."""

from arrowhouse_spark.sources.binaryfile import read_binary_dir, read_binary_files
from arrowhouse_spark.sources.memory import blocks_list, null_source, one_block
from arrowhouse_spark.sources.parquet import load_tables, read_parquet

__all__ = [
    "blocks_list",
    "load_tables",
    "null_source",
    "one_block",
    "read_binary_dir",
    "read_binary_files",
    "read_parquet",
]
