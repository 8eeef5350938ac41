"""Corpus snapshot diffing — the day-over-day change report a managed
training corpus publishes between ingest runs (which documents were added,
removed, or re-crawled with changed content, and which are byte-stable).

Not in the reference (its surface stops at single-snapshot streams); this is
one of the dataset-ops extensions the project brief requires. Built entirely
from one keyed full-outer join over content fingerprints, so the shuffle
carries (id, 32-byte md5) pairs — never document text — and at 100 TB both
snapshots arrive bucketed by the id column, turning the join into a
co-located sort-merge with no network text movement at all.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from arrowhouse_spark.operators.text import fingerprint


def snapshot_diff(
    old_df: DataFrame,
    new_df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Diff two corpus snapshots by document id + content fingerprint.

    Returns one row per id present in either snapshot with ``status`` in
    {'added', 'removed', 'changed', 'unchanged'} — 'changed' means the id
    survived but its normalized content fingerprint (md5 of
    lower/trim/whitespace-collapsed text, the exact-dedup key) differs.

    Plan shape: two pruned scans → map-side fingerprint → ONE full-outer
    shuffle keyed on the id. The fingerprint is computed before the join,
    so the exchanged rows are fixed-width; the status expression is pure
    codegen on the joined row."""
    o = fingerprint(old_df, text_col=text_col, out="__fp_old").select(
        F.col(id_col), "__fp_old", F.lit(True).alias("__in_old")
    )
    n = fingerprint(new_df, text_col=text_col, out="__fp_new").select(
        F.col(id_col), "__fp_new", F.lit(True).alias("__in_new")
    )
    # presence via explicit markers (NOT fp nullness — a present document
    # with NULL text has a NULL fingerprint and must not read as absent);
    # content equality is null-safe for the same reason.
    status = (
        F.when(F.col("__in_old").isNull(), F.lit("added"))
        .when(F.col("__in_new").isNull(), F.lit("removed"))
        .when(
            F.col("__fp_old").eqNullSafe(F.col("__fp_new")), F.lit("unchanged")
        )
        .otherwise(F.lit("changed"))
    )
    return o.join(n, id_col, "full_outer").select(
        F.col(id_col), status.alias("status")
    )
