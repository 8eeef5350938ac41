"""Physical-plan inspection and assertion helpers.

The reference engine has no optimizer; its efficiency properties are
hand-built into each operator — filters applied once with late
materialization (/root/reference/YdbModes/SsaProgram.cpp:615-678), column
pruning through projections and Parquet column indices
(/root/reference/DataStreams/ParquetBlockInputStream.cpp:24-38), and
two-phase partial→final aggregation
(/root/reference/Aggregator.cpp:745-773, 1281-1472). In this engine those
properties come from Catalyst, so they are *checked*, not hand-built: these
helpers parse `explain("formatted")` output and assert a compiled DataFrame
kept the plan shape a 100 TB run needs — predicate pushdown reaching the
scan, pruned ReadSchema, broadcast joins for small dims, whole-stage codegen
over the hot expressions, and no accidental cartesian products or
single-partition windows.

Used by tests/test_plans.py and tools/plan_report.py (which writes PLANS.md).
"""

from __future__ import annotations

import contextlib
import io
import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame


class PlanCheckError(AssertionError):
    """A physical plan lacks a property the engine's scale design requires."""


def plan_text(df: DataFrame, mode: str = "formatted") -> str:
    """The explain output as a string (df.explain prints to stdout)."""
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode=mode)
    return buf.getvalue()


def pushed_filters(df: DataFrame) -> list[str]:
    """Every non-empty PushedFilters entry across the plan's file scans —
    evidence the filter reached the Parquet reader (row-group pruning), the
    Spark-native form of the reference's caller-supplied row-group indices."""
    text = plan_text(df)
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", text):
        body = m.group(1).strip()
        if body:
            out.extend(s.strip() for s in body.split(","))
    return out


def read_schemas(df: DataFrame) -> list[list[str]]:
    """Column lists actually read by each file scan (ReadSchema) — evidence
    of column pruning: a 2-column query must not scan 16 columns."""
    text = plan_text(df)
    out: list[list[str]] = []
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", text):
        cols = [c.split(":")[0].strip() for c in m.group(1).split(",") if c.strip()]
        out.append(cols)
    return out


def _tree_ops(text: str) -> list[str]:
    """Operator names from the plan tree. An executed AQE plan prints BOTH
    '== Final Plan ==' and '== Initial Plan ==' trees — only the final one
    (the plan that actually ran) is counted."""
    m = re.search(r"^\(1\) ", text, re.M)
    tree = text[: m.start()] if m else text
    if "== Final Plan ==" in tree:
        tree = tree.split("== Final Plan ==")[1].split("== Initial Plan ==")[0]
    # a tree line is glyphs (+- : * whitespace) + op name + qualifiers + (id);
    # the op name is the FIRST token ("BroadcastHashJoin Inner BuildRight (16)")
    ops = []
    for line in tree.splitlines():
        lm = re.match(r"^[\s+\-:*]*([A-Za-z][A-Za-z0-9]*).*\(\d+\)", line)
        if lm:
            ops.append(lm.group(1))
    return ops


def broadcast_joins(df: DataFrame) -> int:
    return sum(
        1
        for op in _tree_ops(plan_text(df))
        if op in ("BroadcastHashJoin", "BroadcastNestedLoopJoin")
    )


def exchange_count(df: DataFrame) -> int:
    """Number of shuffle exchanges — the scale-limiting operations. Broadcast
    exchanges are excluded (they ship a bounded small side)."""
    return sum(1 for op in _tree_ops(plan_text(df)) if op == "Exchange")


def codegen_stage_count(df: DataFrame) -> int:
    # AQE plans only annotate codegen ids once finalized (after an action on
    # this same DataFrame); non-AQE and executed plans show them in formatted
    # mode. Fall back to codegen-mode subtree count for simple plans.
    ids = set(re.findall(r"\[codegen id : (\d+)\]", plan_text(df)))
    if ids:
        return len(ids)
    m = re.search(
        r"Found (\d+) WholeStageCodegen subtrees", plan_text(df, mode="codegen")
    )
    return int(m.group(1)) if m else 0


@dataclass
class PlanReport:
    """Summary of the physical properties a reviewer cares about."""

    operators: list[str] = field(default_factory=list)
    pushed_filters: list[str] = field(default_factory=list)
    read_schemas: list[list[str]] = field(default_factory=list)
    broadcast_joins: int = 0
    sortmerge_joins: int = 0
    exchanges: int = 0
    codegen_stages: int = 0
    has_cartesian: bool = False
    has_global_window: bool = False
    has_take_ordered: bool = False
    partial_final_agg: bool = False


def report(df: DataFrame) -> PlanReport:
    text = plan_text(df)
    ops = _tree_ops(text)
    n_agg = sum(1 for op in ops if op in ("HashAggregate", "ObjectHashAggregate", "SortAggregate"))
    return PlanReport(
        operators=ops,
        pushed_filters=pushed_filters(df),
        read_schemas=read_schemas(df),
        broadcast_joins=sum(1 for op in ops if op == "BroadcastHashJoin"),
        sortmerge_joins=sum(1 for op in ops if op == "SortMergeJoin"),
        exchanges=sum(1 for op in ops if op == "Exchange"),
        codegen_stages=codegen_stage_count(df),
        has_cartesian="CartesianProduct" in text,
        # a Window whose partition spec is empty funnels ALL rows through one
        # task — fatal at scale; 'Window' + 'windowspecdefinition()' with no
        # partition columns shows up as 'windowspecdefinition(<order>' only
        has_global_window=bool(
            re.search(r"windowspecdefinition\((?:[^,()]+ (?:ASC|DESC))", text)
        ),
        has_take_ordered="TakeOrderedAndProject" in text,
        partial_final_agg=n_agg >= 2,
    )


def runtime_exchange_reuse(df: DataFrame) -> int:
    """Execute the plan and count ReusedExchange / reused-query-stage nodes
    in the FINAL adaptive plan. Exchange reuse is AQE-dynamic: a composed
    pipeline whose stages all grow from one shared repartition subtree shows
    N identical scan legs in the STATIC explain, but at runtime Spark
    materializes that exchange's shuffle files once and every other consumer
    becomes a ReusedExchange reader — this is the scan-sharing evidence the
    static ReadSchema count cannot show."""
    df.count()
    text = df._jdf.queryExecution().executedPlan().toString()
    return (
        text.count("ReusedExchange")
        + text.count("ReusedQueryStage")
        + text.count("TableCacheQueryStage")
    )


def check_plan(
    df: DataFrame,
    require_pushed_filters: bool = False,
    max_read_columns: int | None = None,
    require_broadcast_join: bool = False,
    forbid_cartesian: bool = True,
    forbid_global_window: bool = True,
    forbid_sortmerge_join: bool = False,
) -> PlanReport:
    """Assert the plan properties that make an operator hold at 100 TB.
    Raises PlanCheckError naming the violated property."""
    r = report(df)
    if require_pushed_filters and not r.pushed_filters:
        raise PlanCheckError("no PushedFilters reached the scan")
    if max_read_columns is not None:
        for cols in r.read_schemas:
            if len(cols) > max_read_columns:
                raise PlanCheckError(
                    f"scan reads {len(cols)} columns {cols} — pruning failed "
                    f"(expected ≤ {max_read_columns})"
                )
    if require_broadcast_join and r.broadcast_joins == 0:
        raise PlanCheckError("expected a broadcast join; plan has none")
    if forbid_cartesian and r.has_cartesian:
        raise PlanCheckError("plan contains CartesianProduct")
    if forbid_global_window and r.has_global_window:
        raise PlanCheckError(
            "plan contains an unpartitioned Window (single-task bottleneck)"
        )
    if forbid_sortmerge_join and r.sortmerge_joins:
        raise PlanCheckError("plan contains SortMergeJoin where broadcast expected")
    return r
