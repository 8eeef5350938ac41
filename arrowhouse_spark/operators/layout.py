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

Scale notes: the min/max bounds are ONE 1-row aggregate broadcast to a
map-side bit-interleave expression (pure codegen — 2 x bits shift/or
terms, no UDF); the rewrite itself is repartitionByRange(zvalue) + write,
Spark's native range shuffle. Nothing global anywhere.
"""

from __future__ import annotations

from functools import reduce
from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


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
    bounds = df.agg(
        *[
            a
            for c in cols
            for a in (
                F.min(F.col(c).cast("long")).alias(f"__mn_{c}"),
                F.max(F.col(c).cast("long")).alias(f"__mx_{c}"),
            )
        ]
    )
    qmax = (1 << bits) - 1
    with_bounds = df.crossJoin(F.broadcast(bounds))
    quantized: list[Column] = []
    for c in cols:
        span = F.col(f"__mx_{c}") - F.col(f"__mn_{c}")
        # DIV (not /): long / long is DOUBLE in Spark and the float quotient
        # differs from other engines in the last ulp at bucket boundaries
        q = F.when(span == F.lit(0), F.lit(0).cast("long")).otherwise(
            F.expr(
                f"((CAST({c} AS BIGINT) - __mn_{c}) * {qmax}) DIV "
                f"(__mx_{c} - __mn_{c})"
            )
        )
        quantized.append(q)
    terms: list[Column] = []
    for b in range(bits):
        for i, q in enumerate(quantized):
            pos = b * len(cols) + i
            terms.append(
                F.shiftleft(F.shiftright(q, b).bitwiseAND(F.lit(1)), pos)
            )
    z = reduce(lambda a, t: a.bitwiseOR(t), terms)
    return with_bounds.withColumn(out_col, z).drop(
        *[f"__mn_{c}" for c in cols], *[f"__mx_{c}" for c in cols]
    )


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
