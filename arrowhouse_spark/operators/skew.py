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


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    on: Sequence[str],
    how: str = "inner",
    salt: int = 16,
    force_shuffle: bool = False,
) -> DataFrame:
    """Skew-safe equi-join: shard the fact side's hot keys across ``salt``
    reducers by joining on (keys..., salt), where the fact row's salt is a
    deterministic hash of its full row and the dim side is replicated to
    every salt value. Results are EXACTLY the plain join's — salting only
    re-partitions the work (each fact row meets each matching dim row at
    exactly one salt value).

    This is the manual form of AQE's skew-join split for when AQE can't
    apply: sort-merge joins feeding an order-sensitive consumer,
    non-shuffle-join plans, or a dim side too big to broadcast but small
    enough to replicate x salt. ``how`` supports inner/left (the dim side
    is the replicated one, so right/full would multiply unmatched dim
    rows — rejected).

    Cost model (100 TB doctrine): dim bytes x salt extra shuffle input in
    exchange for the hot key's reducer shrinking by 1/salt. The explode
    is map-side (sequence+explode, no UDF); both join inputs stay keyed
    on (keys..., __salt), so the join itself is an ordinary shuffled
    hash/sort-merge join with a salt-wide key.
    """
    if how not in ("inner", "left"):
        raise ValueError(
            "salted_join replicates the dim side; only inner/left keep "
            f"join semantics exact (got {how!r})"
        )
    on = list(on)
    fact_salted = fact.withColumn(
        "__salt",
        F.pmod(F.xxhash64(*[F.col(c) for c in fact.columns]), F.lit(salt)),
    )
    dim_salted = dim.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)).cast("array<long>"))
    )
    if force_shuffle:
        # salting only helps a SHUFFLED join — if the dim fits the
        # broadcast threshold Spark would broadcast it and the salt is
        # moot (and harmless); the hint pins the shuffled-hash path so
        # small-scale runs exercise the plan the operator exists for
        dim_salted = dim_salted.hint("shuffle_hash")
    return fact_salted.join(dim_salted, [*on, "__salt"], how).drop("__salt")
