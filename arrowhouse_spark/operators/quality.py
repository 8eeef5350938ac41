"""Declarative data-quality constraint checking — a Deequ-lite.

Production tables ship with contracts (keys unique, measures in range,
codes from a dictionary, mandatory fields present); a 100 TB pipeline
needs those verified in ONE pass, not one scan per rule. ``dq_check``
compiles a rule list into a single aggregate: every rule becomes a
conditional-count expression (plus a count-distinct pair for uniqueness),
so the whole contract costs one keyed-less aggregation with map-side
partials — the same one-pass-many-signals doctrine as
operators/profile.py's column profiler, specialized to pass/fail
contracts. (Public prior art: AWS Deequ / Great Expectations;
implementation here is original and declarative-Spark.)

Rule forms (tuples):
  ("not_null", col)              — no NULLs in col
  ("unique", col)                — col values are distinct (NULLs ignored,
                                   SQL-style: uniqueness is about values)
  ("in_set", col, (v1, v2, ...)) — every non-null value in the set
  ("range", col, lo, hi)         — every non-null value in [lo, hi]
  ("regex", col, pattern)        — every non-null value fully matches

Violations are ROWS for row-scoped rules; for ``unique`` the violation
count is n_rows_with_value - n_distinct_values (0 when unique). The
report is long-format (rule, col, violations, passed) so it lands in a
monitoring table / alert join directly.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _violation_expr(rule: tuple) -> Column:
    kind, col = rule[0], rule[1]
    c = F.col(col)
    if kind == "not_null":
        return F.sum(F.when(c.isNull(), 1).otherwise(0))
    if kind == "in_set":
        vals = [F.lit(v) for v in rule[2]]
        if not vals:
            # empty accepted-set: every non-null value violates (isin()
            # with zero args would throw at plan time instead)
            return F.sum(F.when(c.isNotNull(), 1).otherwise(0))
        return F.sum(F.when(c.isNotNull() & ~c.isin(*vals), 1).otherwise(0))
    if kind == "range":
        lo, hi = rule[2], rule[3]
        return F.sum(
            F.when(c.isNotNull() & ((c < lo) | (c > hi)), 1).otherwise(0)
        )
    if kind == "regex":
        return F.sum(
            F.when(
                c.isNotNull() & ~c.rlike(f"^(?:{rule[2]})$"), 1
            ).otherwise(0)
        )
    raise ValueError(f"unknown dq rule kind {kind!r}")


def dq_check(df: DataFrame, rules: Sequence[tuple]) -> DataFrame:
    """Evaluate every rule in ONE aggregation pass; returns the
    long-format report (rule, col, violations, passed), ordered by the
    rule list via an explicit index so output is deterministic."""
    aggs: list[Column] = []
    names: list[tuple[int, str, str]] = []
    for i, rule in enumerate(rules):
        kind, col = rule[0], rule[1]
        if kind == "unique":
            aggs.append(
                (
                    F.count(F.col(col)) - F.count_distinct(F.col(col))
                ).alias(f"__v{i}")
            )
        else:
            aggs.append(_violation_expr(rule).cast("long").alias(f"__v{i}"))
        names.append((i, kind, col))
    wide = df.agg(*aggs)
    report = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(i).alias("rule_idx"),
                    F.lit(kind).alias("rule"),
                    F.lit(col).alias("col"),
                    F.coalesce(F.col(f"__v{i}"), F.lit(0)).alias(
                        "violations"
                    ),
                )
                for i, kind, col in names
            ]
        )
    ).alias("r")
    return (
        wide.select(report)
        .select(
            F.col("r.rule_idx").alias("rule_idx"),
            F.col("r.rule").alias("rule"),
            F.col("r.col").alias("col"),
            F.col("r.violations").alias("violations"),
            (F.col("r.violations") == 0).alias("passed"),
        )
    )


def linear_classifier_score(
    docs: DataFrame,
    text_col: str,
    weights: DataFrame,
    id_cols: Sequence[str],
    n_buckets: int = 1024,
    bias: int = 0,
    out: str = "logit",
) -> DataFrame:
    """Score documents with a PRETRAINED linear bag-of-words classifier —
    the inference half of the fastText/logistic quality-filter pattern
    every pretraining pipeline runs (CCNet/Gopher-style: train a small
    classifier offline, score the whole corpus with it, keep
    logit > threshold). Features are hashing-trick token counts
    (operators/sampling.py:hash_bucket, no vocabulary table, no OOV);
    ``weights`` is a (bucket, w) relation with INTEGER weights — model
    weights quantize to integers at inference time, so the per-doc logit
    ``Σ_b count_b·w_b + bias`` is exact integer arithmetic and the score
    (and every keep/drop decision) is bit-identical on any engine — no
    sigmoid is needed for thresholding (sigmoid is monotone; the exp
    would differ in the last ulp across libms).

    Plan: map-side explode+bucket → ONE broadcast join against the
    n_buckets-row weight table (the model is dimension-sized by
    definition) → one keyed sum per doc. At 100 TB the classifier costs
    one shuffle on the doc id — the same shape as token counting."""
    ids = list(id_cols)
    # explode_outer, not explode: a doc whose text is null/empty/whitespace
    # has an empty token array, and plain explode would DROP its row — the
    # doc would get no logit at all (not even bias) and silently bypass any
    # downstream keep/drop threshold. The outer null-token row contributes
    # logit = bias, n_tokens = 0 (count/sum below are null-token-aware).
    toks = docs.select(
        *ids,
        F.explode_outer(
            F.filter(F.split(F.col(text_col), " "), lambda t: t != "")
        ).alias("__tok"),
    )
    from arrowhouse_spark.operators.sampling import hash_bucket

    bucketed = toks.select(
        *ids,
        "__tok",
        hash_bucket(F.col("__tok"), n_buckets, salt="clf").alias("bucket"),
    )
    w = weights.select("bucket", F.col("w").cast("long").alias("__w"))
    return (
        bucketed.join(F.broadcast(w), "bucket", "left")
        .groupBy(*ids)
        .agg(
            (
                F.sum(
                    F.when(
                        F.col("__tok").isNotNull(),
                        F.coalesce("__w", F.lit(0)),
                    ).otherwise(F.lit(0))
                )
                + F.lit(int(bias))
            )
            .cast("long")
            .alias(out),
            F.count(F.col("__tok")).cast("long").alias("n_tokens"),
        )
    )
