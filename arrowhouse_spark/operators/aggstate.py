"""User-visible mergeable aggregate state — the Spark-first analog of the
reference's partial-aggregation surface.

The reference materializes partial aggregates as a REAL column users can
store and re-merge: ``ColumnAggregateFunction`` (an Arrow extension type
holding per-group state, ``Columns/ColumnAggregateFunction.h:16-107``),
produced by ``final=false`` aggregation and consumed by
``mergeStream``/``mergeBlocks`` (``Aggregator.cpp:745-773, 1281-1472``);
``tests/ut_aggregator.cpp:133-149`` pins the two-phase pipeline
(partial -> merge-final) against single-shot results. Spark performs the
same split internally (partial HashAggregate -> shuffle -> final) but
hides the state; SURVEY.md §4 maps the *internal* path and marks explicit
state shipping "skip". These helpers restore the USER-VISIBLE form for
the one case production pipelines need it: incremental rollups — compute
per-partition (e.g. per-day) state rows once, store them, and fold new
days in without rescanning history (ClickHouse's AggregatingMergeTree
``-State``/``-Merge`` combinator pattern).

Design: states are PLAIN COLUMNS (count as long, sum/min/max as the value
type), not opaque blobs — mergeable with ordinary built-in aggregates, so
the merge step is itself whole-stage-codegen'd and the stored rollup
stays queryable/prunably partitioned at rest. avg ships as (sum, count)
and finalizes as sum/count, exactly the reference's avg state
(``AggregateFunctions/`` avg = sum+count pair).

Supported ops: count, sum, min, max, avg — the reference's own mergeable
set minus ``any`` (its arrival-order nondeterminism is the documented
OverflowMode-style exclusion; a deterministic ``min``-flavored any is
just ``min``).

Scale: per-increment state rows are one keyed aggregate over the new
partition only; the merge aggregates state rows whose cardinality is
(keys x increments) — history-scan-free. Both phases are single keyed
shuffles with map-side partials.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_STATE_OPS = ("count", "sum", "min", "max", "avg")


def _check(ops: Sequence[tuple[str, str]]) -> None:
    for _col, op in ops:
        if op not in _STATE_OPS:
            raise ValueError(f"unsupported state op {op!r}; one of {_STATE_OPS}")


def agg_state(
    df: DataFrame,
    keys: Sequence[str],
    ops: Sequence[tuple[str, str]],
) -> DataFrame:
    """Partial-aggregate state rows: one row per key tuple with mergeable
    state columns ``<op>_<col>`` (avg contributes ``sum_``/``count_``).
    Typically called per increment (day/batch) with the increment id in
    ``keys`` so states append to a partitioned rollup table."""
    _check(ops)
    aggs = {}
    for col, op in ops:
        if op == "count":
            aggs[f"count_{col}"] = F.count(F.col(col))
        elif op == "sum":
            aggs[f"sum_{col}"] = F.sum(F.col(col))
        elif op == "min":
            aggs[f"min_{col}"] = F.min(F.col(col))
        elif op == "max":
            aggs[f"max_{col}"] = F.max(F.col(col))
        elif op == "avg":
            aggs.setdefault(f"sum_{col}", F.sum(F.col(col)))
            aggs.setdefault(f"count_{col}", F.count(F.col(col)))
    return df.groupBy(*keys).agg(
        *[expr.alias(name) for name, expr in aggs.items()]
    )


def agg_merge(
    states: DataFrame,
    keys: Sequence[str],
    ops: Sequence[tuple[str, str]],
) -> DataFrame:
    """Fold state rows to final values by the surviving ``keys`` (drop the
    increment id from ``keys`` to roll increments up). Merge rules are the
    reference's (`Aggregator.cpp` mergeStream): count/sum re-SUM, min/max
    re-MIN/MAX, avg finalizes as merged sum / merged count."""
    _check(ops)
    merged: dict[str, object] = {}
    finals: list = []
    for col, op in ops:
        if op in ("count", "sum") or op == "avg":
            if op in ("count", "avg") and f"count_{col}" not in merged:
                merged[f"count_{col}"] = F.sum(F.col(f"count_{col}"))
            if op in ("sum", "avg") and f"sum_{col}" not in merged:
                merged[f"sum_{col}"] = F.sum(F.col(f"sum_{col}"))
        elif op == "min":
            merged[f"min_{col}"] = F.min(F.col(f"min_{col}"))
        elif op == "max":
            merged[f"max_{col}"] = F.max(F.col(f"max_{col}"))
    out = states.groupBy(*keys).agg(
        *[expr.alias(name) for name, expr in merged.items()]
    )
    drop_helpers: set[str] = set()
    for col, op in ops:
        if op == "avg":
            finals.append(
                (F.col(f"sum_{col}") / F.col(f"count_{col}")).alias(f"avg_{col}")
            )
            if ("count" not in [o for c, o in ops if c == col]):
                drop_helpers.add(f"count_{col}")
            if ("sum" not in [o for c, o in ops if c == col]):
                drop_helpers.add(f"sum_{col}")
    if finals:
        out = out.select("*", *finals).drop(*drop_helpers)
    return out


def hll_state(
    df: DataFrame,
    keys: Sequence[str],
    value_col: str,
    lg_config_k: int = 14,
    out: str = "hll_sketch",
) -> DataFrame:
    """Mergeable approximate-distinct state: one Datasketches HLL sketch
    (binary column) per key tuple — the approximate member of the
    agg_state family, and the closest Spark analog to the reference's
    opaque ColumnAggregateFunction states (here the blob IS opaque,
    unlike the plain-column exact states). Store per increment; merging
    is register-wise max, so fold order can never change the result."""
    return df.groupBy(*keys).agg(
        F.hll_sketch_agg(F.col(value_col), F.lit(lg_config_k)).alias(out)
    )


def hll_merge(
    states: DataFrame,
    keys: Sequence[str],
    state_col: str = "hll_sketch",
    out: str = "approx_distinct",
) -> DataFrame:
    """Fold HLL states by the surviving ``keys`` and finalize to the
    distinct estimate. Union of sketches over partitions of the data is
    EXACTLY the sketch of the whole (register-wise max), so
    merge-then-estimate equals direct-estimate deterministically — the
    contract the oracle query pins."""
    return states.groupBy(*keys).agg(
        F.hll_sketch_estimate(
            F.hll_union_agg(F.col(state_col), F.lit(False))
        ).alias(out)
    )
