"""Privacy-aware aggregate release: k-anonymity suppression.

A released rollup must not expose groups backed by fewer than k distinct
individuals; small groups are folded into one suppressed remainder row so
the released TOTALS still reconcile (the GDPR-family companion to
suite's gdpr_purge_audit — that query audits deletion propagation, this
operator gates what aggregates may leave the platform at all).

Reference parity note: no counterpart in the reference (capability
superset). Pure two-aggregate composition — no Python, no window.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def kanon_release(
    df: DataFrame,
    keys: Sequence[str],
    individual_col: str,
    aggs: dict[str, Column],
    k: int,
    suppressed_label: str = "__suppressed__",
) -> DataFrame:
    """GROUP BY ``keys`` releasing only groups with >= ``k`` distinct
    ``individual_col`` values; all smaller groups are re-aggregated into
    ONE remainder row whose key columns carry ``suppressed_label``
    (string keys) so the release reconciles to the unsuppressed totals. Output adds
    ``n_individuals`` (distinct count backing each row; for the
    suppressed row, distinct individuals across ALL suppressed groups —
    an individual spanning two small groups counts once) and
    ``suppressed`` (bool marker, distinguishing the remainder row from a
    real group that happens to carry the label).

    ``aggs`` maps output name → aggregate Column built from distributive
    functions (sum/count/min/max): the suppressed row re-applies them to
    the suppressed groups' ROWS (never refolds partials), so it is exact.

    Plan: one keyed agg to find small groups (partial→final), a broadcast
    semi/anti split of the input on the ≤|groups| small-key relation, and
    the two releases — at scale the dominant cost stays the one groupBy
    the plain rollup would pay; the small-key relation is bounded by the
    group count, not the row count.
    """
    if k < 1:
        raise ValueError(f"need k >= 1, got {k}")
    keys = list(keys)
    agg_cols = [c.alias(n) for n, c in aggs.items()]
    counts = df.groupBy(*keys).agg(
        F.countDistinct(individual_col).alias("__nind")
    )
    small = counts.filter(F.col("__nind") < k).select(
        *[F.col(kc).alias(f"__sm_{kc}") for kc in keys]
    )
    cond = None
    for kc in keys:
        c = F.col(kc).eqNullSafe(F.col(f"__sm_{kc}"))
        cond = c if cond is None else (cond & c)
    kept = (
        df.join(F.broadcast(small), cond, "left_anti")
        .groupBy(*keys)
        .agg(
            F.countDistinct(individual_col).alias("n_individuals"),
            *agg_cols,
        )
        .withColumn("suppressed", F.lit(False))
    )
    supp = (
        df.join(F.broadcast(small), cond, "left_semi")
        .agg(F.countDistinct(individual_col).alias("n_individuals"), *agg_cols)
        .withColumn("suppressed", F.lit(True))
    )
    for kc in keys:
        supp = supp.withColumn(kc, F.lit(suppressed_label))
    # an all-kept input leaves supp with n_individuals = 0: drop the row so
    # releases never carry an empty remainder
    supp = supp.filter(F.col("n_individuals") > 0)
    return kept.unionByName(supp.select(*kept.columns))
