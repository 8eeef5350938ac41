"""Data-layout clustering — Z-order (Morton) keys for multi-dimensional
data skipping.

A 100 TB table pruned on ONE column is solved by partitioning/sorting on
it; pruned on TWO-plus correlated dimensions (tenant x time, user x key,
lat x lon) it needs a space-filling curve: rewrite the table ordered by
the interleaved-bit Morton code and min/max row-group statistics become
selective on EVERY participating column at once (the Delta/Iceberg
OPTIMIZE ZORDER mechanism, public description in the Delta Lake docs and
the Boncz/Databricks literature). The reference engine has no layout
optimizer — extension surface in the same spirit as the shard exporter
(sources/shards.py): the operators that make parquet-at-rest scan fast.

Everything here is exact integer arithmetic — quantization uses
(x - min) * (2^bits - 1) DIV (max - min) on BIGINT, so the same key comes
out of any engine (the float form differs in the last ulp between
engines/SIMD paths and would flip bucket boundaries). Float dimensions
should be pre-bucketed to ints by the caller (e.g. cast(price * 100)).

Scale notes: the min/max bounds are ONE 1-row aggregate collected
driver-side (model-sized) and inlined as literals into a map-side
bit-interleave expression (pure codegen — 2 x bits shift/or terms, no
UDF, no join); the observed span picks the quantization arithmetic
(BIGINT when provably overflow-free, DECIMAL(38,0) otherwise — see
_quant_expr); the rewrite itself is repartitionByRange(zvalue) + write,
Spark's native range shuffle. Nothing global anywhere.
"""

from __future__ import annotations

from functools import reduce
from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _quant_expr(c: str, mn, mx, qmax: int) -> Column:
    """Exact integer quantization (x - mn) * qmax DIV (mx - mn) with the
    bounds inlined as DRIVER-SIDE literals (the 1-row min/max agg is
    model-sized — collecting it lets the span decide the arithmetic):

    - DIV, never /: long / long is DOUBLE in Spark and the float quotient
      differs from other engines in the last ulp at bucket boundaries.
    Collecting the bounds makes zorder_value/hilbert_value EAGER at call
    time (one min/max scan job even if the returned DataFrame is never
    executed) and freezes the bounds at call — acceptable here because
    every caller executes the plan it builds and layout rewrites run over
    immutable snapshots; callers composing throwaway plans should pass a
    LIMIT 0 frame or build the expression themselves.

    - span * qmax <= 2^63 - 1 (checked EXACTLY in Python, no overflow):
      plain BIGINT shift/mask-speed arithmetic — the common case, and the
      round-10 decimal tax removed (hilbert_vs_zorder_locality regression).
    - wider spans (epoch-micros at bits >= 13, full-range signed columns
      where mx - mn itself overflows BIGINT): DECIMAL(38,0) intermediates,
      exact for any long inputs (<= 29 digits), DIV still returns BIGINT.
    - degenerate/empty span quantizes every non-NULL value to 0
      (NULL still propagates, as in the live-span branches).

    The input is CLAMPED to [mn, mx] in the expression itself
    (least(greatest(x, mn), mx)), so if the frozen bounds go stale — the
    plan is executed after the underlying data changed, or reused across a
    rewrite — an out-of-range value lands in the edge bucket (0 or qmax)
    instead of wrapping under non-ANSI BIGINT arithmetic into a corrupt
    key. The clamp also PROVES the BIGINT branch overflow-free: after it,
    (x - mn) * qmax <= span * qmax, which the Python check bounded.

    NULL inputs stay NULL: Spark's least/greatest SKIP nulls (they would
    quantize a NULL row to the min edge), so the clamp is guarded by an
    explicit CASE WHEN {c} IS NULL — preserving the pre-clamp arithmetic's
    NULL propagation so a NULL dimension yields a NULL layout key, exactly
    as any engine replaying the unclamped expression computes it."""
    if mn is None or mx is None or mx == mn:
        # Degenerate/empty span: every non-NULL value quantizes to bucket 0,
        # but NULL still propagates — the same contract as the live-span
        # branches (a literal 0 here would give NULL rows a non-NULL key on
        # constant-plus-NULL columns, diverging from any oracle replay).
        return F.expr(
            f"CASE WHEN {c} IS NULL THEN NULL ELSE CAST(0 AS BIGINT) END"
        )
    span = int(mx) - int(mn)  # Python ints: exact for any long bounds
    if span * qmax <= (1 << 63) - 1:
        cl = f"least(greatest(CAST({c} AS BIGINT), {mn}), {mx})"
        return F.expr(
            f"CASE WHEN {c} IS NULL THEN NULL "
            f"ELSE (({cl} - ({mn})) * {qmax}) DIV {span} END"
        )
    cl = (
        f"least(greatest(CAST({c} AS DECIMAL(38,0)), "
        f"CAST({mn} AS DECIMAL(38,0))), CAST({mx} AS DECIMAL(38,0)))"
    )
    return F.expr(
        f"CASE WHEN {c} IS NULL THEN NULL "
        f"ELSE (({cl} - ({mn})) * {qmax}) DIV "
        f"(CAST({mx} AS DECIMAL(38,0)) - ({mn})) END"
    )


def zorder_value(
    df: DataFrame,
    cols: Sequence[str],
    bits: int = 16,
    out_col: str = "zvalue",
) -> DataFrame:
    """Append the Morton code of ``cols`` (integer columns) as ``out_col``.

    Each column is quantized to ``bits`` bits over its observed [min, max]
    (exact integer arithmetic), then bits are interleaved column-major:
    bit b of column i lands at position b * len(cols) + i. Total code
    width bits * len(cols) must fit a signed long (<= 62).
    """
    cols = list(cols)
    if bits * len(cols) > 62:
        raise ValueError(
            f"zvalue would need {bits * len(cols)} bits; reduce bits or cols"
        )
    if df is not None:
        bad = [
            c
            for c in cols
            if df.schema[c].dataType.typeName() in ("double", "float")
            or df.schema[c].dataType.typeName().startswith("decimal")
        ]
        if bad:
            raise TypeError(
                f"zorder_value needs integer columns; {bad} are fractional "
                "— the long cast would truncate silently and engines "
                "disagree on float boundaries. Pre-bucket them "
                "(e.g. cast(price * 100 as long)) first."
            )
    brow = df.agg(
        *[
            a
            for c in cols
            for a in (
                F.min(F.col(c).cast("long")).alias(f"__mn_{c}"),
                F.max(F.col(c).cast("long")).alias(f"__mx_{c}"),
            )
        ]
    ).collect()[0]
    qmax = (1 << bits) - 1
    quantized: list[Column] = [
        _quant_expr(c, brow[f"__mn_{c}"], brow[f"__mx_{c}"], qmax)
        for c in cols
    ]
    terms: list[Column] = []
    for b in range(bits):
        for i, q in enumerate(quantized):
            pos = b * len(cols) + i
            terms.append(
                F.shiftleft(F.shiftright(q, b).bitwiseAND(F.lit(1)), pos)
            )
    z = reduce(lambda a, t: a.bitwiseOR(t), terms)
    return df.withColumn(out_col, z)


def zorder_repartition(
    df: DataFrame,
    cols: Sequence[str],
    num_partitions: int,
    bits: int = 16,
) -> DataFrame:
    """Range-repartition by the Morton code — the layout rewrite: write
    the result and every file's min/max stats are selective on all
    ``cols`` simultaneously. The zvalue column is kept so the write can
    also sortWithinPartitions on it for row-group-level skipping."""
    return zorder_value(df, cols, bits=bits).repartitionByRange(
        num_partitions, F.col("zvalue")
    )


def layout_manifest(
    df: DataFrame,
    bucket_col: Column | str,
    stat_cols: Sequence[str],
) -> DataFrame:
    """Per-bucket file-statistics manifest: row count plus min/max of every
    ``stat_col`` — what a lakehouse writes per data file and what a
    scan's predicate pruning consults. One keyed aggregate; pair with
    :func:`zorder_value`'s bucket (zvalue >> shift) to see multi-column
    min/max tighten, or with any 1-D layout key to see them NOT tighten
    on the other columns (the measurable difference
    ``zorder_pruning_stats`` pins)."""
    b = F.col(bucket_col) if isinstance(bucket_col, str) else bucket_col
    return df.groupBy(b.alias("bucket")).agg(
        F.count(F.lit(1)).alias("n_rows"),
        *[
            a
            for c in stat_cols
            for a in (
                F.min(F.col(c)).alias(f"min_{c}"),
                F.max(F.col(c)).alias(f"max_{c}"),
            )
        ],
    )


def hilbert_value(
    df: DataFrame,
    col_x: str,
    col_y: str,
    bits: int = 8,
    out_col: str = "hvalue",
) -> DataFrame:
    """Append the 2-D HILBERT curve index of (col_x, col_y) as ``out_col``
    — the space-filling curve with strictly better locality than Morton
    (Z-order's diagonal jumps split clusters across files; Hilbert's
    unit-step curve keeps every quantized neighborhood contiguous, the
    reason Iceberg/Delta expose it next to ZORDER).

    Both integer columns quantize to ``bits`` bits over their observed
    [min, max] with exact BIGINT DIV (the zorder_value discipline), then
    the canonical xy2d loop (public-domain form, e.g. Wikipedia
    "Hilbert curve", after Hamilton 2006's compact algorithm) unrolls to
    ``bits`` static expression steps:

        for s in 2^(bits-1) .. 1:            # one unrolled step each
            rx, ry = (x & s) > 0, (y & s) > 0
            d += s*s * ((3*rx) XOR ry)
            if ry == 0:                      # quadrant rotation
                if rx == 1: x, y = N-1-x, N-1-y
                x, y = y, x

    Every operation is integer shift/mask/add on identical inputs, so the
    key is bit-exact on any engine — the oracle replays the same unroll.

    Scale: one 1-row min/max aggregate broadcast into a pure-codegen
    map-side expression (the unroll is ~bits*10 integer ops per row, no
    UDF, no shuffle); pair with repartitionByRange(hvalue) +
    layout_manifest exactly like zorder_value."""
    if bits < 1 or bits > 31:
        raise ValueError(f"need 1 <= bits <= 31, got {bits}")
    for c in (col_x, col_y):
        t = df.schema[c].dataType.typeName()
        if t in ("double", "float") or t.startswith("decimal"):
            raise TypeError(
                f"hilbert_value needs integer columns; {c} is {t} — "
                "pre-bucket it (e.g. cast(v * 100 as long)) first"
            )
    brow = df.agg(
        F.min(F.col(col_x).cast("long")).alias("__mn_x"),
        F.max(F.col(col_x).cast("long")).alias("__mx_x"),
        F.min(F.col(col_y).cast("long")).alias("__mn_y"),
        F.max(F.col(col_y).cast("long")).alias("__mx_y"),
    ).collect()[0]
    qmax = (1 << bits) - 1
    wb = df

    def quant(c: str, mn_key: str, mx_key: str) -> Column:
        # span-conditional arithmetic (see _quant_expr): BIGINT when the
        # observed span proves it safe, DECIMAL(38,0) only for spans where
        # span * qmax > 2^63 (hilbert allows bits up to 31, so epoch-millis
        # spans still trip it)
        return _quant_expr(c, brow[mn_key], brow[mx_key], qmax)

    n1 = F.lit((1 << bits) - 1)  # N-1 for the reflection
    # Each unrolled step binds (x, y, d) to NAMED columns: inlining them as
    # nested expressions instead grows the tree ~5x per step (x' and y'
    # each reference both predecessors several times) and Catalyst analysis
    # on the 5^bits-node tree never returns. withColumns evaluates every
    # expression against the PRE-update row — the simultaneous assignment
    # the algorithm needs — and CollapseProject keeps the steps separate
    # because merging would duplicate non-cheap expressions.
    cur = wb.withColumns(
        {
            "__hx": quant(col_x, "__mn_x", "__mx_x"),
            "__hy": quant(col_y, "__mn_y", "__mx_y"),
            "__hd": F.lit(0).cast("long"),
        }
    )
    hx, hy, hd = F.col("__hx"), F.col("__hy"), F.col("__hd")
    for i in range(bits - 1, -1, -1):
        s = 1 << i
        rx = F.shiftright(hx, i).bitwiseAND(F.lit(1))
        ry = F.shiftright(hy, i).bitwiseAND(F.lit(1))
        refl_x = F.when(rx == 1, n1 - hx).otherwise(hx)
        refl_y = F.when(rx == 1, n1 - hy).otherwise(hy)
        cur = cur.withColumns(
            {
                "__hd": hd
                + F.lit(s * s).cast("long")
                * (F.lit(3) * rx).bitwiseXOR(ry).cast("long"),
                "__hx": F.when(ry == 0, refl_y).otherwise(hx),
                "__hy": F.when(ry == 0, refl_x).otherwise(hy),
            }
        )
    return cur.withColumn(out_col, hd).drop("__hx", "__hy", "__hd")
