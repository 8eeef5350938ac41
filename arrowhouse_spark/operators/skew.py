"""Skew mitigation — explicit salting for the operations AQE can't fix.

Plain aggregates are skew-immune (map-side partial aggregation bounds any
reducer by distinct keys) and AQE splits skewed JOIN partitions, but
COUNT(DISTINCT v) over a hot key concentrates every distinct value of that
key on one reducer: Spark plans it as Expand + two aggregations keyed on
(key, v), so a key holding 10⁹ distinct values becomes one 10⁹-row hash
table. ``salted_count_distinct`` shards that state exactly: distinct values
partition cleanly by hash(v) % salt (a value lands in exactly one shard), so
per-shard COUNT(DISTINCT) then SUM is exact, with per-reducer state bounded
by distinct/salt.

This is the engine's template for explicit salting in general: inject a
bounded salt column derived from a hash, aggregate at (key, salt), then
re-aggregate at key with a combining function that is exact for the sharded
statistic (count-distinct: sum; min/max: min/max; sum/count: sum).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_count_distinct(
    df: DataFrame,
    keys: Sequence[str],
    value_col: str,
    out: str = "n_distinct",
    salt: int = 32,
) -> DataFrame:
    """Exact COUNT(DISTINCT value_col) per key with per-reducer state bounded
    by distinct/salt. NULL values are not counted (SQL semantics)."""
    keys = list(keys)
    salt_col = F.pmod(F.xxhash64(F.col(value_col)), F.lit(salt))
    per_shard = (
        df.filter(F.col(value_col).isNotNull())
        .groupBy(*keys, salt_col.alias("__salt"))
        .agg(F.count_distinct(F.col(value_col)).alias("__part"))
    )
    return per_shard.groupBy(*keys).agg(F.sum("__part").alias(out))
