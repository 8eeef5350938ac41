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


def heavy_hitters(
    df: DataFrame,
    col: str,
    k: int = 20,
    summary_size: int | None = None,
) -> DataFrame:
    """EXACT frequent items: every value with count > N/k, with its exact
    count — the hot-key detector that decides when salting/skew handling is
    needed, in bounded memory at any scale.

    Two passes (the standard distributed Misra-Gries scheme):
      1. candidates — per-partition Misra-Gries summaries of ``summary_size``
         (default 4k) counters via mapInArrow-style batches in mapInPandas;
         memory is O(summary_size) per partition regardless of input size.
         Any value with global count > N/k must exceed n_p/k in at least one
         partition, so the union of partition summaries is a guaranteed
         superset of the true hitters.
      2. verify — exact recount of the (tiny) candidate set: candidates ship
         as a broadcast hash, the recount is a map-side semi-join + one
         aggregation keyed by candidate value. The final filter
         count > N/k makes the output EXACT and deterministic — false
         candidates from pass 1 are dropped, so the result never depends on
         partitioning.

    Returns (value, cnt) for hitters, ordered nowhere (caller sorts).
    """
    from collections.abc import Iterator

    cap = summary_size or 4 * k

    def _mg(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
        import pandas as pd

        counters: dict = {}
        for pdf in batches:
            for v in pdf["__v"]:
                if v in counters:
                    counters[v] += 1
                elif len(counters) < cap:
                    counters[v] = 1
                else:
                    # decrement-all step, dropping zeros (classic MG)
                    dead = []
                    for key in counters:
                        counters[key] -= 1
                        if counters[key] == 0:
                            dead.append(key)
                    for key in dead:
                        del counters[key]
        yield pd.DataFrame({"__v": list(counters.keys())})

    src = df.select(F.col(col).alias("__v")).filter(F.col("__v").isNotNull())
    cand = (
        src.mapInPandas(_mg, src.schema)
        .distinct()
    )
    n_total = src.select(F.count(F.lit(1)).alias("__n"))
    counts = (
        src.join(F.broadcast(cand), "__v")
        .groupBy("__v")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    return (
        counts.crossJoin(F.broadcast(n_total))
        .filter(F.col("cnt") * k > F.col("__n"))
        .select(F.col("__v").alias("value"), "cnt")
    )
