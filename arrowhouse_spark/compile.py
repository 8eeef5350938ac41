"""Compiler: SSA ``Program`` → DataFrame transformations.

≡ ``ProgramStep::apply`` (/root/reference/YdbModes/SsaProgram.cpp:715-743):
for each step, assignes → filters → group-by → projection. Differences that are
the point of a Spark-first design:

  - The whole program compiles to ONE lazy DataFrame plan; Catalyst AND-merges
    and pushes the filters into the scan, prunes columns end-to-end, and
    collapses projections — the late-materialization and needed-column logic
    the reference implements by hand (SsaProgram.cpp:615-678) falls out for
    free, and *better* (pushdown reaches parquet row groups).
  - Aggregation compiles to groupBy().agg(); Tungsten plans the partial →
    shuffle → final two-phase execution the reference implements via
    AggregatingBlockInputStream + MergingAggregatedBlockInputStream
    (SURVEY.md §3.2) — at cluster scale this is the map-side-combine +
    shuffle-by-key layout that keeps 100-TB group-bys bounded by distinct-key
    cardinality, not input size.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from arrowhouse_spark.functions.aggregates import build_aggregate
from arrowhouse_spark.functions.scalar import build_scalar
from arrowhouse_spark.program import Assign, GroupBy, Program, ProgramStep


class ProgramError(ValueError):
    """Invalid program (duplicate assign, missing column, bad arity)."""


def _apply_assignes(df: DataFrame, assignes: tuple[Assign, ...]) -> DataFrame:
    # Duplicate-name rejection ≡ SsaProgram.cpp:488-489 ("duplicate column name").
    existing = set(df.columns)
    exprs: list[tuple[str, Column]] = []
    for a in assignes:
        if a.name in existing:
            raise ProgramError(f"duplicate assign name: {a.name!r}")
        existing.add(a.name)
        if a.op is None:
            col = F.lit(a.constant)
        else:
            missing = [c for c in a.arguments if c not in existing]
            if missing:
                raise ProgramError(f"assign {a.name!r}: unknown column(s) {missing}")
            col = build_scalar(a.op, [F.col(c) for c in a.arguments], a.options)
        exprs.append((a.name, col))
        # withColumns once at the end would disallow later assigns referring to
        # earlier ones in the same step; apply sequentially instead — Catalyst
        # collapses the projection chain into one.
        df = df.withColumn(a.name, col)
    return df


def _apply_filters(df: DataFrame, filters: tuple[str, ...]) -> DataFrame:
    # Filters are boolean COLUMN NAMES, AND-combined into one mask and applied
    # once ≡ SsaProgram.cpp:615-678 (AND-combining :34-45).
    if not filters:
        return df
    for name in filters:
        if name not in df.columns:
            raise ProgramError(f"filter column not found: {name!r}")
    mask = reduce(lambda a, b: a & b, (F.col(n) for n in filters))
    return df.filter(mask)


def _apply_group_by(df: DataFrame, gb: GroupBy) -> DataFrame:
    for k in gb.keys:
        if k not in df.columns:
            raise ProgramError(f"group-by key not found: {k!r}")
    if not gb.aggregates:
        if not gb.keys:
            raise ProgramError("group-by needs keys or aggregates")
        # keys-only aggregation ⇒ DISTINCT (Aggregator.cpp:289-300)
        return df.select(*gb.keys).distinct()
    aggs = [build_aggregate(a) for a in gb.aggregates]
    if gb.keys:
        return df.groupBy(*gb.keys).agg(*aggs)
    # global aggregation: one row even over empty input (Aggregator.cpp:571-577)
    return df.agg(*aggs)


def _apply_projection(df: DataFrame, projection: tuple[str, ...]) -> DataFrame:
    if not projection:
        return df
    missing = [c for c in projection if c not in df.columns]
    if missing:
        raise ProgramError(f"projection column(s) not found: {missing}")
    return df.select(*projection)


def apply_step(df: DataFrame, step: ProgramStep) -> DataFrame:
    df = _apply_assignes(df, step.assignes)
    df = _apply_filters(df, step.filters)
    if step.group_by is not None:
        df = _apply_group_by(df, step.group_by)
    df = _apply_projection(df, step.projection)
    return df


def apply_program(df: DataFrame, program: Program) -> DataFrame:
    """Apply a full program ≡ applyProgram (SsaProgram.h:291-295)."""
    for step in program.steps:
        df = apply_step(df, step)
    return df
