"""Sorted merge and replace-merge (versioned upsert) ≡ MergingSortedInputStream
(/root/reference/YdbModes/MergingSortedInputStream.cpp:104-307).

The reference k-way-merges N pre-sorted streams with a binary heap of
SortCursors; in *Replace* mode it skips rows whose ``replace_key`` equals the
previously emitted key, keeping the FIRST row in sort order per key — a
versioned upsert (ClickHouse ReplacingMergeTree semantics). Ties between equal
sort keys break by SOURCE ORDER (SortCursor::GreaterAt falls back to the
stream's ``order``, YdbModes/SortCursor.h:84-114).

Spark-first design (SURVEY.md §4 item 2):
- ``merge_sorted``  = unionAll + orderBy. Declaratively identical to a k-way
  merge of sorted runs; physically Spark range-partitions and sorts — at
  1000 executors this is the *distributed* version of the same merge, and the
  pre-sortedness of inputs makes the per-partition sort nearly linear.
- ``replace_merge`` = window ``row_number() == 1`` over
  partitionBy(replace_key) orderBy(sort_keys, source_id, batch_position).
  The explicit ``source_id`` column reproduces the reference's source-order
  tie-break deterministically (SURVEY.md §7 "What's hard" #3) — NOT
  ``dropDuplicates``, which has no order guarantee.

Scale: replace_merge is one shuffle by replace_key; with AQE skew-join/
coalescing on, a skewed key degrades to a hot partition — for known-hot keys
pre-aggregate with ``max_by`` instead (same semantics when the sort key is a
single version column; exposed as ``replace_merge_agg``).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from arrowhouse_spark.operators.sort import SortKey, _cols


def merge_sorted(
    dfs: Sequence[DataFrame],
    keys: Sequence[SortKey | str],
) -> DataFrame:
    """k-way merge of sorted relations ≡ MergingSortedInputStream (no replace).

    ``max_batch_rows`` from the reference is output-batch sizing, an execution
    detail Spark owns (spark.sql.files / arrow batch size), so it has no API
    here.
    """
    if not dfs:
        raise ValueError("merge_sorted needs at least one input")
    out = dfs[0]
    for d in dfs[1:]:
        out = out.unionAll(d)
    return out.orderBy(*_cols(keys))


def replace_merge(
    dfs: Sequence[DataFrame],
    replace_key: Sequence[str],
    sort_keys: Sequence[SortKey | str],
    reverse: bool = False,
    order_col: str | None = None,
) -> DataFrame:
    """Versioned upsert: keep the first row per ``replace_key`` in the order
    given by ``sort_keys`` (then source order, then batch position).

    ≡ Replace mode of MergingSortedInputStream (MergeImpl replace logic
    :227-289); ``reverse`` ≡ the reference's reverse flag (emit descending).

    Tie-break #3 ("position within source") needs a row order, which a
    distributed relation does not inherently have. When the caller HAS one —
    an ingestion sequence number, a file offset, a kafka offset — pass it as
    ``order_col`` and the result is stable under any partition layout.
    Without it, position falls back to ``monotonically_increasing_id()``:
    deterministic for a fixed partition layout (and exactly the reference's
    cursor order when each input is a single in-order batch, as in the
    single-partition case), but NOT stable under repartitioning — rows equal
    in (replace_key, sort_keys, source) may then resolve differently across
    layouts. The reference has the same property: its tie-break is physical
    arrival order, which a shuffled re-run would also change.
    """
    if not dfs:
        raise ValueError("replace_merge needs at least one input")
    tagged = []
    for i, d in enumerate(dfs):
        # __src = source order (tie-break #2); __pos = position within source
        # (tie-break #3, ≡ the cursor's row order inside one stream).
        pos = F.col(order_col) if order_col else F.monotonically_increasing_id()
        tagged.append(d.withColumn("__src", F.lit(i)).withColumn("__pos", pos))
    out = tagged[0]
    for d in tagged[1:]:
        out = out.unionAll(d)

    order = _cols(sort_keys) + [F.col("__src").asc(), F.col("__pos").asc()]
    w = Window.partitionBy(*[F.col(c) for c in replace_key]).orderBy(*order)
    winner = (
        out.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn", "__src", "__pos")
    )
    if reverse:
        final_order = [
            SortKey(
                sk.column, not sk.ascending, sk.nulls_first
            ).to_column()
            for sk in (k if isinstance(k, SortKey) else SortKey(k) for k in sort_keys)
        ]
    else:
        final_order = _cols(sort_keys)
    return winner.orderBy(*final_order)


def replace_merge_agg(
    dfs: Sequence[DataFrame],
    replace_key: Sequence[str],
    version_col: str,
    value_cols: Sequence[str],
) -> DataFrame:
    """Skew-robust replace for the common single-version-column case:
    ``max_by(value, version)`` per key — partial aggregation combines map-side,
    so a hot replace_key never concentrates all its rows on one reducer the
    way a window would."""
    if not dfs:
        raise ValueError("replace_merge_agg needs at least one input")
    out = dfs[0]
    for d in dfs[1:]:
        out = out.unionAll(d)
    aggs = [F.max_by(F.col(c), F.col(version_col)).alias(c) for c in value_cols]
    aggs.append(F.max(F.col(version_col)).alias(version_col))
    return out.groupBy(*replace_key).agg(*aggs)


def scd2_from_log(
    df: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    attr_col: str,
    tie_col: str,
    open_end: str | None = None,
    keep_cols: Sequence[str] = (),
) -> DataFrame:
    """Build a slowly-changing-dimension type-2 history from a change log.

    The dual of replace_merge: where Replace mode keeps only the LATEST
    version per key (ClickHouse ReplacingMergeTree — see module docstring),
    SCD2 keeps EVERY distinct run of the tracked attribute as a validity
    interval. Input is an event/change log; output is one row per
    consecutive run of ``attr_col`` per key:

      key..., attr, valid_from (run's first ts), valid_to (next run's
      first ts; NULL or ``open_end`` for the current run), is_current.

    Rows within a key are ordered by (ts, tie) — ``tie_col`` must be
    unique per row so runs are deterministic under equal timestamps.
    Consecutive equal attribute values collapse into one interval
    (NULL-safe: a NULL attr run is a run like any other, via ``eqNullSafe``).

    Plan shape: TWO per-key ordered windows (lag to mark run starts on the
    full log, lead to close intervals on the — much smaller — run-start
    relation). Both windows partition by the dimension key; nothing global.
    At 100 TB this is the standard lakehouse history-build: one shuffle by
    key, window state bounded by a key's events.

    ``keep_cols`` pass extra columns through FROM THE RUN-START ROW (the
    row whose (ts, tie) opens the interval) — streaming/replace.py's
    incremental maintenance keeps the tie and store bucket this way so a
    stored interval can be converted back into its originating event.
    """
    keys = [F.col(k) for k in key_cols]
    w_log = Window.partitionBy(*keys).orderBy(F.col(ts_col), F.col(tie_col))
    prev = F.lag(F.col(attr_col)).over(w_log)
    prev_seen = F.lag(F.lit(True)).over(w_log)  # distinguishes first row
    starts = df.withColumn(
        "__new_run",
        prev_seen.isNull() | ~F.col(attr_col).eqNullSafe(prev),
    ).filter(F.col("__new_run"))
    w_runs = Window.partitionBy(*keys).orderBy(F.col(ts_col), F.col(tie_col))
    nxt = F.lead(F.col(ts_col)).over(w_runs)
    out = starts.select(
        *key_cols,
        F.col(attr_col),
        F.col(ts_col).alias("valid_from"),
        nxt.alias("valid_to"),
        nxt.isNull().alias("is_current"),
        *[F.col(c) for c in keep_cols],
    )
    if open_end is not None:
        out = out.withColumn(
            "valid_to",
            F.coalesce(F.col("valid_to"), F.lit(open_end).cast("timestamp")),
        )
    return out


def merge_into(
    target: DataFrame,
    source: DataFrame,
    key_cols: Sequence[str],
    when_matched: str = "update",
    delete_col: str | None = None,
) -> DataFrame:
    """Relational MERGE INTO (upsert): apply a change-set ``source`` to
    ``target`` by key — matched rows update (or delete when the source
    row's ``delete_col`` is true), unmatched source rows insert, untouched
    target rows carry over. The lakehouse write-side primitive
    (Delta/Iceberg MERGE; ClickHouse reaches the same end state through
    ReplacingMergeTree — replace_merge above is the READ-side resolution
    of the same upsert; this is the eager form that materializes the
    resolved table).

    ``source`` must be key-unique (the standard MERGE precondition —
    multiple matches per target row are ambiguous; Delta raises exactly
    here). Enforced IN the plan: the per-key source count guards the
    delete/update flag with raise_error, and because that flag is always
    consumed (the delete filter), Catalyst cannot prune the check away.

    Plan: one per-key source window (count) + ONE full-outer keyed join +
    coalesce projection — both sides shuffle by key once; bucketed tables
    co-locate it. No global state anywhere.
    """
    if when_matched not in ("update", "keep"):
        raise ValueError(
            f"when_matched must be 'update' or 'keep', got {when_matched!r}"
        )
    keys = list(key_cols)
    data_cols = [c for c in target.columns if c not in keys]
    s_cols = [c for c in source.columns if c not in keys and c != delete_col]
    w = Window.partitionBy(*[F.col(k) for k in keys])
    del_base = (
        F.col(delete_col) if delete_col is not None else F.lit(False)
    )
    del_guarded = F.when(
        F.count(F.lit(1)).over(w) > 1,
        F.raise_error(
            F.concat(
                F.lit("merge_into: duplicate source key "),
                F.concat_ws(",", *[F.col(k).cast("string") for k in keys]),
            )
        ).cast("boolean"),
    ).otherwise(del_base)
    srel = source.select(
        *[F.col(k).alias(f"__sk_{k}") for k in keys],
        *[F.col(c).alias(f"__s_{c}") for c in s_cols],
        del_guarded.alias("__s_del"),
    )
    trel = target.select(
        *[F.col(k).alias(f"__tk_{k}") for k in keys],
        *[F.col(c).alias(f"__t_{c}") for c in data_cols],
    )
    cond = None
    for k in keys:
        c = F.col(f"__tk_{k}") == F.col(f"__sk_{k}")
        cond = c if cond is None else (cond & c)
    joined = trel.join(srel, cond, "full_outer")
    src_present = F.col(f"__sk_{keys[0]}").isNotNull()
    tgt_present = F.col(f"__tk_{keys[0]}").isNotNull()
    out_cols = [
        F.coalesce(F.col(f"__sk_{k}"), F.col(f"__tk_{k}")).alias(k)
        for k in keys
    ]
    for c in data_cols:
        if c in s_cols and when_matched == "update":
            out_cols.append(
                F.when(src_present, F.col(f"__s_{c}"))
                .otherwise(F.col(f"__t_{c}"))
                .alias(c)
            )
        elif c in s_cols:
            # 'keep' governs MATCHED rows only — standard MERGE still
            # inserts the SOURCE values for unmatched source rows (the
            # matched-clause policy never applies to the insert branch)
            out_cols.append(
                F.when(src_present & ~tgt_present, F.col(f"__s_{c}"))
                .otherwise(F.col(f"__t_{c}"))
                .alias(c)
            )
        else:
            out_cols.append(F.col(f"__t_{c}").alias(c))
    return joined.filter(
        ~F.coalesce(src_present & F.col("__s_del"), F.lit(False))
    ).select(*out_cols)
