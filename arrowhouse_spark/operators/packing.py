"""Token-budget sequence packing for LLM training pipelines.

Not present in the reference (its surface stops at scalar kernels +
aggregation); this is the capability extension the project brief requires:
grouping documents into fixed-token-budget training sequences ("packs") so
the trainer wastes no padding.

Optimal bin packing is NP-hard and globally sequential; the scalable,
DETERMINISTIC approximation here is the standard two-level scheme:

  1. scatter docs into ``n_buckets`` hash buckets (a pack never crosses a
     bucket, so buckets process independently — the parallelism unit);
  2. inside a bucket, order docs by (n_tokens desc, id) — first-fit-
     decreasing order, the classic 11/9-OPT heuristic ordering — and cut
     contiguous packs from the running token sum: a doc starts a new pack
     when its run would otherwise start past a budget boundary.

A doc belongs to the pack where its tokens BEGIN (floor((cumsum - n) /
budget)), so each pack holds a contiguous run of the per-bucket order and
overflows the budget by at most its last doc (consumers either span the
boundary — the usual trainer behavior — or truncate). Docs longer than the
budget land alone in their own pack.

Scale: one shuffle (by bucket) + a per-bucket window — never an
unpartitioned window. Pack assignment is pure SQL (no UDF), so the whole
plan stays in whole-stage codegen, and every step is reproducible from the
data alone (hash bucket + deterministic order), which makes re-runs and
incremental rebuilds stable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from arrowhouse_spark.operators.sampling import hash_bucket
from arrowhouse_spark.operators.text import tokens


def pack_sequences(
    df: DataFrame,
    budget: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 32,
    tokens_col: str | None = None,
) -> DataFrame:
    """Assign each document to a training pack of ~``budget`` tokens.

    Returns (id_col, n_tokens, bucket, pack_id, pack_off): ``pack_id`` is
    local to the bucket, ``pack_off`` is the doc's token offset inside its
    pack. Global pack identity is the (bucket, pack_id) pair.

    ``tokens_col`` names an already-tokenized array column on ``df`` (the
    pipeline scan-sharing seam — only its size is read here).
    """
    if budget <= 0:
        raise ValueError("budget must be positive")
    tok_expr = F.col(tokens_col) if tokens_col else tokens(text_col)
    d = df.select(
        F.col(id_col),
        F.size(tok_expr).alias("n_tokens"),
        # md5-prefix bucketing (operators/sampling.py): engine-independent,
        # so packs are reproducible outside Spark too
        hash_bucket(id_col, n_buckets, salt="pack"),
    )
    # explicit ROWS frame: the default RANGE frame makes peer rows (ties on
    # the full ordering) share one cumsum, so correctness would silently
    # hinge on id_col being unique — ROWS matches the oracle's ROWS clause
    # and is tie-safe for any id_col
    w = (
        Window.partitionBy("bucket")
        .orderBy(F.col("n_tokens").desc(), F.col(id_col).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum("n_tokens").over(w)
    d = d.withColumn("__start", cum - F.col("n_tokens"))
    return d.select(
        id_col,
        "n_tokens",
        "bucket",
        F.floor(F.col("__start") / F.lit(budget)).alias("pack_id"),
        (
            F.col("__start")
            - F.floor(F.col("__start") / F.lit(budget)) * F.lit(budget)
        ).alias("pack_off"),
    )


def pack_stats(packed: DataFrame, budget: int) -> DataFrame:
    """Per-pack fill statistics for a :func:`pack_sequences` result:
    (bucket, pack_id, n_docs, pack_tokens, fill_ratio). ``fill_ratio`` > 1
    marks boundary-spanning packs (see module docstring)."""
    return (
        packed.groupBy("bucket", "pack_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("pack_tokens"),
        )
        .withColumn(
            "fill_ratio", F.round(F.col("pack_tokens") / F.lit(budget), 4)
        )
    )
