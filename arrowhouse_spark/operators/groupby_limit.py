"""Approximate GROUP BY with a key-cardinality limit ≡ the reference's
``max_rows_to_group_by`` + ``OverflowMode`` (/root/reference/
arrow_clickhouse_types.h:24-34; checkLimits Aggregator.cpp:531-550;
find-only path executeImplBatch Aggregator.cpp:361-369).

Reference semantics: once the hash table reaches max_rows,
  THROW — abort the query;
  BREAK — stop consuming input, return the partial aggregates accumulated
          so far (arrival-order dependent!);
  ANY   — keep aggregating rows whose key is already present, ignore new keys
          (arrival-order dependent!), optionally folding the rest into one
          ``overflow_row``.

Distributed design (SURVEY.md §4 item 1): arrival order is not meaningful
across shuffles, so the order-dependent modes get DETERMINISTIC analogues:

ANY without ``order_col`` picks the ``max_rows`` heaviest keys (count,
tie-break by key) and aggregates the remainder into the overflow row when
requested. Same bounded-output guarantee, deterministic instead of
arrival-dependent.

ANY with ``order_col`` replays the reference's ARRIVAL-ORDER semantics
exactly, against that explicit order (the BREAK contract): once the hash
table holds max_rows keys, a row with a NEW key is rejected while rows of
already-present keys keep aggregating to end-of-stream — so the kept key
set is precisely the keys whose FIRST occurrence ranks among the max_rows
earliest, and every row of a kept key aggregates no matter how late it
arrives. That definition is order-dependent but not physical-arrival-
dependent, which makes it replayable by any engine (the oracle is plain
SQL: rank keys by min(order_col), keep the first max_rows, aggregate all
their rows; the rest fold into the overflow row). On a single-partition
stream ordered by order_col this is bit-for-bit the reference's behavior
(executeImplBatch's find-only path, Aggregator.cpp:361-369).

BREAK replays "stop at the cap" against an EXPLICIT deterministic order
(``order_col``, caller-supplied — same contract as replace_merge's order
column): the consumed prefix is every row strictly before the first
occurrence of the (max_rows+1)-th distinct key in that order, i.e. the
exact moment the reference's hash table would overflow. Keys in the output
are the first max_rows keys SEEN (not the heaviest), and kept keys' rows
after the stop point are NOT aggregated — "return what is", made
deterministic.

Plan shapes:
  THROW/ANY (2 passes over the pre-aggregated keys, not the input):
  1. full groupBy (partial→final; output is bounded by TRUE key cardinality);
  2. top-k select the max_rows heaviest keys (TakeOrderedAndProject — per-
     partition top-k then driver merge, never a global sort/window), and find
     the dropped tail with a broadcast anti-join against the kept key set.
  Pass 1 is exactly the cost of the plain group-by; pass 2 operates on its
  (already reduced) output with no extra shuffle — at 100 TB the dominant
  cost is unchanged and the output bound is enforced exactly.

  BREAK (2 passes over the input):
  1. per-key min(order_col) (partial→final, shuffles (key, ord) only) →
     TakeOrderedAndProject of the max_rows+1 smallest first-occurrences →
     one-row stop threshold, broadcast;
  2. prefix filter (ord < threshold) → plain groupBy. The threshold join is
     a 1-row broadcast nested loop; both heavy passes are ordinary keyed
     aggregations, so the shape holds at any scale.
"""

from __future__ import annotations

import enum
from functools import reduce
from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


class OverflowMode(enum.Enum):
    THROW = "throw"
    BREAK = "break"
    ANY = "any"


class GroupByLimitExceeded(Exception):
    """≡ the THROW mode's "too many rows" error (Aggregator.cpp:538-543)."""


def group_by_limited(
    df: DataFrame,
    keys: Sequence[str],
    aggs: dict[str, Column],
    max_rows: int,
    mode: OverflowMode = OverflowMode.ANY,
    overflow_row: bool = False,
    order_col: str | None = None,
) -> DataFrame:
    """GROUP BY with at most ``max_rows`` output groups.

    ``aggs`` maps result name → UNALIASED aggregate Column built from
    re-aggregable functions (sum/count/min/max — the merge step reuses them).
    With ``overflow_row=True`` one extra row with NULL keys carries the
    aggregate of all dropped groups (≡ the reference's params.overflow_row;
    note NULL keys are distinguishable from real NULL-key groups only by the
    ``__overflow`` marker column kept in the output).

    ``mode=BREAK`` requires ``order_col`` — a non-null column defining the
    deterministic consumption order the stop point is measured against (see
    module docstring); only rows strictly before the first occurrence of
    the (max_rows+1)-th distinct key are aggregated.

    ``mode=ANY`` with ``order_col`` selects the reference's arrival-order
    semantics (first max_rows keys to appear in that order win, ALL their
    rows aggregate); without it, the deterministic heaviest-keys analogue.
    """
    if mode is OverflowMode.BREAK:
        if order_col is None:
            raise ValueError(
                "OverflowMode.BREAK needs an explicit order_col: a "
                "deterministic 'stop consuming' point is undefined without "
                "a row order"
            )
        return _group_by_break(df, keys, aggs, max_rows, order_col)
    if mode is OverflowMode.ANY and order_col is not None:
        return _group_by_any_arrival(
            df, keys, aggs, max_rows, order_col, overflow_row
        )
    agg_cols = [c.alias(n) for n, c in aggs.items()]
    full = df.groupBy(*keys).agg(
        *agg_cols, F.count(F.lit(1)).alias("__group_weight")
    )

    if mode is OverflowMode.THROW:
        n = full.limit(max_rows + 1).count()
        if n > max_rows:
            raise GroupByLimitExceeded(
                f"GROUP BY produced more than max_rows={max_rows} groups"
            )
        return full.drop("__group_weight")

    # ANY: deterministic heaviest-keys selection. orderBy().limit() compiles
    # to TakeOrderedAndProject (per-partition top-k, driver merge of k rows per
    # partition) — no global sort, no single-partition window, holds at any
    # group cardinality since only max_rows rows ever leave the partitions.
    kept_full = full.orderBy(
        F.col("__group_weight").desc(), *[F.col(k).asc_nulls_last() for k in keys]
    ).limit(max_rows)
    kept = kept_full.drop("__group_weight")
    if not overflow_row:
        return kept
    kept = kept.withColumn("__overflow", F.lit(False))
    # dropped tail = all groups minus the kept key set; kept is ≤ max_rows rows
    # so the anti-join broadcasts. Null-safe equality keeps NULL-key groups
    # matched (groupBy groups NULLs together, plain "=" would never match them).
    kept_keys = kept_full.select(*[F.col(k).alias(f"__kept_{k}") for k in keys])
    cond = reduce(
        lambda a, b: a & b,
        [F.col(k).eqNullSafe(F.col(f"__kept_{k}")) for k in keys],
    )
    dropped = full.join(F.broadcast(kept_keys), cond, "left_anti")
    # re-aggregate the dropped groups' aggregates into one row. sum/count fold
    # by sum; min/max fold by min/max — the caller's agg exprs are re-applied
    # to the partial columns where that is sound (sum,count,min,max,any).
    # The __n_dropped filter removes the all-null row a global agg emits
    # over an EMPTY anti-join (<= max_rows distinct keys: nothing
    # overflowed, so no overflow row — the kanon_release n_individuals
    # discipline).
    merged = (
        dropped.agg(
            F.count(F.lit(1)).alias("__n_dropped"),
            *[_refold(n, c).alias(n) for n, c in aggs.items()],
        )
        .filter(F.col("__n_dropped") > 0)
        .drop("__n_dropped")
    )
    for k in keys:
        merged = merged.withColumn(k, F.lit(None).cast(dict(df.dtypes)[k] if k in dict(df.dtypes) else "string"))
    merged = merged.withColumn("__overflow", F.lit(True))
    return kept.unionByName(merged.select(*kept.columns))


def _group_by_any_arrival(
    df: DataFrame,
    keys: Sequence[str],
    aggs: dict[str, Column],
    max_rows: int,
    order_col: str,
    overflow_row: bool,
) -> DataFrame:
    """Arrival-order ANY (module docstring): the kept keys are those whose
    first occurrence in ``order_col`` order ranks in the earliest
    ``max_rows``; every row of a kept key aggregates (late rows of present
    keys are accepted — the reference's find-only path), every row of a
    rejected key folds into the overflow row when requested.

    Plan: per-key min(order_col) (one keyed agg over (key, ord) pairs) →
    TakeOrderedAndProject of the max_rows earliest firsts → ≤max_rows-row
    broadcast semi/anti joins → plain groupBy. Two keyed aggregations and
    a bounded broadcast; no global sort, no window — holds at any scale."""
    ord_ = F.col(order_col)
    kept_keys = (
        df.groupBy(*keys)
        .agg(F.min(ord_).alias("__fp"))
        .orderBy(F.col("__fp").asc(), *[F.col(k).asc_nulls_last() for k in keys])
        .limit(max_rows)
        .select(*[F.col(k).alias(f"__kept_{k}") for k in keys])
    )
    cond = reduce(
        lambda a, b: a & b,
        [F.col(k).eqNullSafe(F.col(f"__kept_{k}")) for k in keys],
    )
    agg_cols = [c.alias(n) for n, c in aggs.items()]
    kept = (
        df.join(F.broadcast(kept_keys), cond, "left_semi")
        .groupBy(*keys)
        .agg(*agg_cols)
    )
    if not overflow_row:
        return kept
    kept = kept.withColumn("__overflow", F.lit(False))
    dtypes = dict(df.dtypes)
    # __n_dropped filter: with <= max_rows distinct keys the anti-join is
    # empty and a global agg would still emit one all-null row — no
    # overflow means no overflow row (same guard as the heaviest-keys path)
    merged = (
        df.join(F.broadcast(kept_keys), cond, "left_anti")
        .agg(F.count(F.lit(1)).alias("__n_dropped"), *agg_cols)
        .filter(F.col("__n_dropped") > 0)
        .drop("__n_dropped")
    )
    for k in keys:
        merged = merged.withColumn(
            k, F.lit(None).cast(dtypes.get(k, "string"))
        )
    merged = merged.withColumn("__overflow", F.lit(True))
    return kept.unionByName(merged.select(*kept.columns))


def _group_by_break(
    df: DataFrame,
    keys: Sequence[str],
    aggs: dict[str, Column],
    max_rows: int,
    order_col: str,
) -> DataFrame:
    """Deterministic BREAK (see module docstring): aggregate the prefix of
    ``order_col``-ordered rows that ends where the (max_rows+1)-th distinct
    key first appears. With ≤ max_rows distinct keys the whole input
    aggregates (no stop point — the reference never hits the limit)."""
    ord_ = F.col(order_col)
    first_pos = df.groupBy(*keys).agg(F.min(ord_).alias("__fp"))
    # the (max_rows+1) smallest first-occurrences: TakeOrderedAndProject,
    # never a global sort. If max_rows+1 groups exist, the largest of them
    # IS the stop position; with fewer groups there is no stop.
    cut = (
        first_pos.orderBy(F.col("__fp").asc())
        .limit(max_rows + 1)
        .agg(
            F.when(
                F.count(F.lit(1)) == max_rows + 1, F.max("__fp")
            ).alias("__cut")
        )
    )
    prefix = df.join(F.broadcast(cut)).filter(
        F.col("__cut").isNull() | (ord_ < F.col("__cut"))
    )
    return prefix.groupBy(*keys).agg(*[c.alias(n) for n, c in aggs.items()])


def _refold(name: str, original: Column) -> Column:
    """Fold partial aggregate column ``name`` across dropped groups. Sound for
    the reference's aggregate set: sum→sum, count→sum, min→min, max→max,
    any→any_value. Detected from the expression string."""
    s = str(original)
    col = F.col(name)
    low = s.lower()
    if low.startswith("column<'count("):
        return F.sum(col)
    if low.startswith("column<'min("):
        return F.min(col)
    if low.startswith("column<'max("):
        return F.max(col)
    if low.startswith("column<'any_value(") or low.startswith("column<'first("):
        return F.any_value(col, True)
    return F.sum(col)  # sum and sum-like
