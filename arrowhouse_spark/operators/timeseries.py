"""Time-series downsampling and gap-filling over event streams.

The reference engine's sorted-stream operators (reference
``DataStreams/MergeSortingBlockInputStream.h``, ``YdbModes/``
replace-merge — see operators/merge.py for the parity surface) exist to
serve exactly this workload shape: ordered event logs reduced to
per-key, per-bucket summaries. These two operators are the Spark-first
extension of that family for analytics/feature pipelines:

- ``ohlc_downsample`` — per (key, time-bucket) OPEN/HIGH/LOW/CLOSE
  summary (the canonical market-data / metrics resample). Open and
  close are selected by a total order (ts, tiebreak) carried INSIDE a
  struct aggregate, so the result is deterministic even when multiple
  rows share a timestamp — the same arrival-order-free discipline as
  operators/merge.py's replace_merge_agg.
- ``gapfill_locf`` — regularize each key's series onto a fixed-step
  time spine (min..max observed bucket) and fill holes by
  last-observation-carried-forward. The spine is GENERATED map-side
  per key (one sequence + explode after a keyed min/max aggregate);
  the fill is a per-key ordered window, never a global one.

Scale notes (100 TB doctrine):
- ohlc is ONE keyed aggregation — map-side partial aggregation applies,
  shuffle width is (key, bucket, 4 doubles + count), source-size-free
  after the partial.
- gapfill's spine size is keys x buckets, independent of the event
  count; the only shuffles are the keyed bounds aggregate, the
  observed-bucket aggregate (same key), and the per-key window sort.
  Both window and joins are partitioned by the series key — no global
  ordering anywhere.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def ohlc_downsample(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    tie_col: str,
    bucket: str = "hour",
) -> DataFrame:
    """Downsample to per-(key, bucket) OHLC rows.

    ``open``/``close`` are the values of the first/last row within the
    bucket under the total order (ts, tie) — ``tie_col`` must be unique
    per row (an event id) so the selection is deterministic under equal
    timestamps. Implemented as min/max over a (ts, tie, value) struct:
    one Tungsten aggregate, no window, no self-join.
    """
    ordered = F.struct(
        F.col(ts_col).alias("ts"),
        F.col(tie_col).alias("tie"),
        F.col(value_col).alias("v"),
    )
    return (
        df.groupBy(
            F.col(key_col),
            F.date_trunc(bucket, F.col(ts_col)).alias("bucket_ts"),
        )
        .agg(
            F.min(ordered).getField("v").alias("open"),
            F.round(F.max(F.col(value_col)), 2).alias("high"),
            F.round(F.min(F.col(value_col)), 2).alias("low"),
            F.max(ordered).getField("v").alias("close"),
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum(F.col(value_col)), 2).alias("sum_value"),
        )
        .withColumn("open", F.round("open", 2))
        .withColumn("close", F.round("close", 2))
    )


def gapfill_locf(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    tie_col: str,
    step: str = "1 hour",
    bucket: str = "hour",
) -> DataFrame:
    """Regularize each key's series to a fixed-step spine with LOCF fill.

    Output: one row per (key, spine bucket) from the key's first to last
    observed bucket, with
      - ``v_filled``: the bucket's last observed value, or the most
        recent earlier bucket's value when the bucket is empty (LOCF);
      - ``filled``: true iff the bucket had no observation.

    Plan shape: keyed observed-aggregate (last value per bucket via the
    same struct-max discipline as :func:`ohlc_downsample`), keyed
    min/max bounds, a map-side ``sequence``+``explode`` spine, a keyed
    left join spine<-observed, and ONE per-key ordered window for the
    carry-forward. Spine cardinality is keys x buckets — independent of
    event volume, so the explode cannot amplify a 100 TB input.
    """
    from arrowhouse_spark.session import shuffle_parts

    n_part = shuffle_parts(df.sparkSession)
    k = F.col(key_col)
    b = F.date_trunc(bucket, F.col(ts_col))
    ordered = F.struct(
        F.col(ts_col).alias("ts"),
        F.col(tie_col).alias("tie"),
        F.col(value_col).alias("v"),
    )
    # Pin the post-aggregate partitioning on the series key, at session
    # width (explicit count — AQE never coalesces a user-pinned one):
    # the checkpoint scan reports UnknownPartitioning, so without the pin
    # the spine bounds, the fill join and the LOCF window each inserted
    # an ENSURE_REQUIREMENTS exchange carrying so few bytes that AQE
    # coalesced them to ONE partition — every key's window serialized on
    # one core. hashpartitioning(key) satisfies all three requirements,
    # so ONE shared exchange (ReusedExchange) serves the whole tail. The
    # pinned relation is bucket-sized (keys × buckets, volume-free) and
    # the width is the session's configured shuffle_parts, not a local
    # constant. (An additional pre-aggregate pin on the raw events was
    # A/B-measured WORSE — it re-shuffles what map-side partials shrink.)
    observed = (
        df.groupBy(k.alias(key_col), b.alias("bucket_ts"))
        .agg(F.max(ordered).getField("v").alias("v_obs"))
        .localCheckpoint(eager=False)  # referenced by spine AND the fill join
        # the checkpoint scan reports UnknownPartitioning, so re-pin on
        # top of it; both consumers share this one exchange (ReusedExchange)
        .repartition(n_part, key_col)
    )
    spine = (
        observed.groupBy(key_col)
        .agg(
            F.min("bucket_ts").alias("mn"),
            F.max("bucket_ts").alias("mx"),
        )
        .select(
            key_col,
            F.explode(
                F.sequence(
                    F.col("mn"),
                    F.col("mx"),
                    F.expr(f"INTERVAL {step}"),
                )
            ).alias("bucket_ts"),
        )
    )
    w = (
        Window.partitionBy(key_col)
        .orderBy("bucket_ts")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        spine.join(observed, [key_col, "bucket_ts"], "left")
        .withColumn(
            "v_filled", F.round(F.last("v_obs", ignorenulls=True).over(w), 2)
        )
        .withColumn("filled", F.col("v_obs").isNull())
        .drop("v_obs")
    )


def decayed_agg(
    df: DataFrame,
    key_cols,
    ts_col: str,
    value_col: str,
    half_life_hours: float = 24.0 * 7,
    round_dp: int = 6,
) -> DataFrame:
    """Exponentially time-decayed per-key score: Σ v · 2^(-Δt/half_life),
    Δt measured back from the GLOBAL max timestamp — the standard
    recency-weighted rollup (trending/engagement scores; the batch analog
    of stream_trending_terms' per-window decay, with a closed-form weight
    instead of window buckets).

    The anchor t_max is a 1-row broadcast aggregate (never a driver
    scalar); the weight is pure map-side codegen (integer epoch diff →
    one pow), so the whole operator is ONE keyed aggregate with map-side
    partials.

    Determinism (two distinct round-7 lessons, both driver-caught):
    - Δt uses FRACTIONAL epoch seconds (``timestamp.cast("double")``,
      microsecond precision), never ``unix_timestamp`` — the latter
      truncates to whole seconds, a systematic per-row weight bias
      (~3.5e-7 relative at sf0.01) against any engine that keeps the
      fraction.
    - A sum of exponentially-scaled doubles is the
      associativity-sensitive shape — at sf0.01 the per-type sums land
      as close as 4e-8 to a 6-dp rounding boundary while Spark's
      partial-agg combine order varies run to run. Each term is
      therefore quantized to DECIMAL(38,9) BEFORE the sum: decimal
      addition is exact and associative, so the aggregate is
      bit-identical under any partial ordering (and matches an engine
      that sums in a single thread). The 9-dp per-term quantization
      (≤5e-10 per row) is far below the 6-dp output precision.
    """
    key_cols = list(key_cols)
    anchor = df.agg(F.max(F.col(ts_col)).alias("__tmax"))
    w = F.pow(
        F.lit(2.0),
        -(
            (
                F.col("__tmax").cast("double")
                - F.col(ts_col).cast("double")
            )
            / F.lit(half_life_hours * 3600.0)
        ),
    )
    q = "decimal(38,9)"
    return (
        df.crossJoin(F.broadcast(anchor))
        .groupBy(*key_cols)
        .agg(
            F.round(F.sum((F.col(value_col) * w).cast(q)), round_dp)
            .cast("double")
            .alias("decayed_sum"),
            F.round(F.sum(w.cast(q)), round_dp)
            .cast("double")
            .alias("decayed_count"),
            F.count(F.lit(1)).alias("n"),
        )
    )


def zscore_outliers(
    df: DataFrame,
    key_cols,
    value_col: str,
    threshold: float = 3.0,
    round_dp: int = 6,
) -> DataFrame:
    """Per-key z-score outlier flagging — the metrics-monitoring primitive
    (flag events whose value sits beyond ``threshold`` population standard
    deviations from the key's mean).

    Plan: ONE keyed aggregate to per-key (mean, stddev_pop) + a broadcast
    join back — never a window (per-row windows with unbounded frames
    re-sort every key; the stats relation is keys-sized and broadcasts).
    Population stddev (not sample) so the z of a 1-row key is NULL→not
    flagged rather than divide-by-zero. Returns the input plus
    ``zscore`` (rounded) and ``is_outlier``.
    """
    key_cols = list(key_cols)
    stats = df.groupBy(*key_cols).agg(
        F.avg(F.col(value_col)).alias("__mu"),
        F.stddev_pop(F.col(value_col)).alias("__sigma"),
    )
    z = F.when(
        F.col("__sigma") > 0,
        (F.col(value_col) - F.col("__mu")) / F.col("__sigma"),
    )
    return (
        df.join(F.broadcast(stats), key_cols)
        .withColumn("zscore", F.round(z, round_dp))
        .withColumn(
            "is_outlier",
            F.coalesce(F.abs(z) > threshold, F.lit(False)),
        )
        .drop("__mu", "__sigma")
    )


def rolling_mean(
    df: DataFrame,
    key_cols,
    order_col: str,
    value_col: str,
    window_rows: int = 7,
    round_dp: int = 2,
    out_col: str = "rolling_mean",
    stat: str = "mean",
) -> DataFrame:
    """Trailing moving ``stat`` ("mean" or "sum") over the ``window_rows``
    most recent rows per key (current row inclusive) — the smoothing
    everyone applies to the gapfill_locf output before charting/alerting.
    ONE per-key ordered window with a BOUNDED rows frame, so per-row
    state is window_rows values regardless of series length (an
    unbounded frame would be the running-sum shape instead — that exists
    as window_running_sum).

    Cross-engine note: a mean of d-decimal inputs lands on .xx5 rounding
    boundaries where engines' tie rules differ (half-up vs half-even —
    one row in 105k flipped in the oracle gate); a rolling SUM of
    d-decimal inputs stays ON the d-decimal grid, so the oracle query
    uses stat="sum". The mean form is for in-pipeline use."""
    if stat not in ("mean", "sum"):
        raise ValueError(f"stat must be mean|sum, got {stat!r}")
    key_cols = list(key_cols)
    w = (
        Window.partitionBy(*key_cols)
        .orderBy(F.col(order_col))
        .rowsBetween(-(window_rows - 1), Window.currentRow)
    )
    agg = F.avg if stat == "mean" else F.sum
    return df.withColumn(
        out_col, F.round(agg(F.col(value_col)).over(w), round_dp)
    )


def winsorize(
    df: DataFrame,
    key_cols,
    value_col: str,
    lower: float = 0.01,
    upper: float = 0.99,
    out_col: str = "winsorized",
) -> DataFrame:
    """Per-key winsorization: clip ``value_col`` to the key's
    [``lower``, ``upper``] interpolated quantiles — the standard outlier
    treatment before averaging/regression (the destructive complement of
    zscore_outliers, which only flags). ONE keyed quantile aggregate
    broadcast back + a map-side clip; quantiles are rounded to 6 dp
    before clipping so both engines clip at identical boundaries."""
    key_cols = list(key_cols)
    q = df.groupBy(*key_cols).agg(
        F.round(F.percentile(F.col(value_col), F.lit(lower)), 6).alias("__lo"),
        F.round(F.percentile(F.col(value_col), F.lit(upper)), 6).alias("__hi"),
    )
    return (
        df.join(F.broadcast(q), key_cols)
        .withColumn(
            out_col,
            F.least(F.greatest(F.col(value_col), F.col("__lo")), F.col("__hi")),
        )
        .drop("__lo", "__hi")
    )


def ewma(
    df: DataFrame,
    key_cols,
    order_cols,
    value_col: str,
    alpha: float = 0.25,
    lookback: int = 32,
    out_col: str = "ewma",
    round_dp: int = 6,
) -> DataFrame:
    """Per-key exponentially-weighted moving average with exact finite
    support: ``ewma_n = sum_{j<L} (1-a)^j x_{n-j} / sum_{j<L} (1-a)^j``
    (the normalized-weights EWMA truncated at ``lookback`` terms — the
    alpha factor cancels under normalization; terms beyond L=32 carry
    weight <= 0.75^32 ~ 1e-4 of the head and are DEFINED out of the
    operator so both engines compute the identical finite formula).

    The textbook recurrence ``y_n = a*x_n + (1-a)*y_{n-1}`` is a
    sequential scan no engine aggregates associatively; the truncated
    form makes it a bounded per-key window: collect the last L values in
    frame order, fold newest-first. Determinism doctrine
    (decayed_event_score / source_entropy_report precedent): the weight
    ladder is built by repeated double multiplication (0.75^j is exactly
    representable for j <= 31 — 3^31 < 2^53 — so every step is exact),
    each weighted term is quantized to DECIMAL(38,15) and summed
    EXACTLY, so the result is combine-order-free and bit-reproducible
    across partitionings; the final ratio is one double division,
    rounded.

    Scale: ONE per-key window whose frame state is <= L values per row —
    series-length-free; the only shuffle is the key partitioning. No
    Python, no global window.

    Domain: ``|value| < 1e7`` (each weighted term must fit
    DECIMAL(22,15) exactly). Out-of-range values RAISE at execution
    time via a per-row guard — without it the decimal cast would (ANSI
    off) silently null the term and corrupt the average. NULL values
    pass through (collect_list drops them, as before).
    """
    if not 0 < alpha < 1:
        raise ValueError(f"need 0 < alpha < 1, got {alpha}")
    if lookback < 1 or (1 - alpha) ** (lookback - 1) == 0:
        raise ValueError(f"bad lookback {lookback} for alpha {alpha}")
    key_cols, order_cols = list(key_cols), list(order_cols)
    w = (
        Window.partitionBy(*key_cols)
        .orderBy(*[F.col(c) for c in order_cols])
        .rowsBetween(-(lookback - 1), Window.currentRow)
    )
    v = F.col(value_col)
    checked = F.when(v.isNull() | (F.abs(v.cast("double")) < 1e7), v).otherwise(
        F.raise_error(
            F.concat(
                F.lit(f"ewma: |{value_col}| >= 1e7 overflows the exact "
                      "DECIMAL(22,15) term (value="),
                v.cast("string"),
                F.lit(")"),
            )
        )
    )
    # frame order is oldest..newest; fold newest-first so the weight
    # ladder starts at 1 on the current row
    arr = F.reverse(F.collect_list(checked).over(w))
    # accumulator DECIMAL(37,15) + term DECIMAL(22,15) sums to (38,15)
    # with NO scale reduction (Spark widens precision on add; at (38,15)
    # inputs it would drop to scale 14 and round mid-fold); the cast back
    # to (37,15) is exact for any |value| < 1e7 per term, so every
    # partial sum is the mathematically exact decimal the oracle's
    # DECIMAL(38,15) SUM also produces.
    acc_t, term_t = "decimal(37,15)", "decimal(22,15)"
    zero = F.struct(
        F.lit(0).cast(acc_t).alias("s"),
        F.lit(0).cast(acc_t).alias("ws"),
        F.lit(1.0).alias("w"),
    )
    acc = F.aggregate(
        arr,
        zero,
        lambda a, x: F.struct(
            (a["s"] + (a["w"] * x).cast(term_t)).cast(acc_t).alias("s"),
            (a["ws"] + a["w"].cast(term_t)).cast(acc_t).alias("ws"),
            (a["w"] * F.lit(1.0 - alpha)).alias("w"),
        ),
    )
    return df.withColumn(
        out_col,
        F.round(acc["s"].cast("double") / acc["ws"].cast("double"), round_dp),
    )


def ewma_last(
    df: DataFrame,
    key_cols,
    order_cols,
    value_col: str,
    alpha: float = 0.25,
    lookback: int = 32,
    out_col: str = "ewma",
    round_dp: int = 6,
    count_col: str = "n_rows",
) -> DataFrame:
    """Per-key EWMA of the LAST row only — the aggregation form of
    :func:`ewma` for callers that keep just each key's final smoothed
    value (the events_ewma_last shape). Produces one row per key:
    ``count_col`` (total rows, long) and ``out_col`` (the EWMA the
    per-row form would assign to the key's last row in ``order_cols``
    order).

    Identical arithmetic to :func:`ewma` — the same exact-double weight
    ladder, the same DECIMAL(37,15)/(22,15) quantized fold, the same
    overflow guard applied to EVERY row (not only the folded tail), the
    same newest-first fold over the last ``lookback`` rows' non-null
    values — so the result is bit-identical to
    ``ewma(df, ...)`` + "pick the last row per key" (pinned in
    tests/test_timeseries.py). What changes is the COST: the per-row
    form materializes a ``lookback``-element array and runs the decimal
    fold for every input row only to discard all but one per key; this
    form tags rows with one descending-order ``row_number`` (same keyed
    window, same single shuffle) and folds ONCE per key inside the
    keyed aggregation — work drops from O(rows × lookback) to
    O(rows + keys × lookback) with the identical plan shape (one keyed
    window + one keyed rollup sharing the partitioning; guide §1.2:
    don't compute things you throw away).

    Same domain contract as :func:`ewma`: ``|value| < 1e7`` enforced
    per row, NULL values pass through without consuming a weight."""
    if not 0 < alpha < 1:
        raise ValueError(f"need 0 < alpha < 1, got {alpha}")
    if lookback < 1 or (1 - alpha) ** (lookback - 1) == 0:
        raise ValueError(f"bad lookback {lookback} for alpha {alpha}")
    key_cols, order_cols = list(key_cols), list(order_cols)
    v = F.col(value_col)
    checked = F.when(v.isNull() | (F.abs(v.cast("double")) < 1e7), v).otherwise(
        F.raise_error(
            F.concat(
                F.lit(f"ewma: |{value_col}| >= 1e7 overflows the exact "
                      "DECIMAL(22,15) term (value="),
                v.cast("string"),
                F.lit(")"),
            )
        )
    )
    w_desc = Window.partitionBy(*key_cols).orderBy(
        *[F.col(c).desc() for c in order_cols]
    )
    tagged = df.select(
        *key_cols,
        checked.cast("double").alias("__v"),
        F.row_number().over(w_desc).alias("__rn"),
    )
    # newest-first tail: rn 1..lookback ascending == the reverse() frame
    # order of the per-row form; nulls are dropped BEFORE the fold (they
    # never consume a weight), exactly as collect_list drops them there
    tail = F.sort_array(
        F.collect_list(
            F.when(
                (F.col("__rn") <= lookback) & F.col("__v").isNotNull(),
                F.struct(F.col("__rn").alias("rn"), F.col("__v").alias("v")),
            )
        )
    )
    acc_t, term_t = "decimal(37,15)", "decimal(22,15)"
    zero = F.struct(
        F.lit(0).cast(acc_t).alias("s"),
        F.lit(0).cast(acc_t).alias("ws"),
        F.lit(1.0).alias("w"),
    )
    acc = F.aggregate(
        tail,
        zero,
        lambda a, m: F.struct(
            (a["s"] + (a["w"] * m["v"]).cast(term_t)).cast(acc_t).alias("s"),
            (a["ws"] + a["w"].cast(term_t)).cast(acc_t).alias("ws"),
            (a["w"] * F.lit(1.0 - alpha)).alias("w"),
        ),
    )
    return tagged.groupBy(*key_cols).agg(
        F.count(F.lit(1)).cast("long").alias(count_col),
        F.round(
            acc["s"].cast("double") / acc["ws"].cast("double"), round_dp
        ).alias(out_col),
    )


def gapfill_lerp(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    tie_col: str,
    step: str = "1 hour",
    bucket: str = "hour",
) -> DataFrame:
    """Regularize each key's series to a fixed-step spine with LINEAR
    interpolation — the smooth sibling of :func:`gapfill_locf` (LOCF
    draws staircases; metrics dashboards and feature pipelines usually
    want the line between observations). Output per (key, spine bucket):
    ``v_lerp`` (the interpolated value, 6 dp) and ``filled`` (true iff
    the bucket had no observation).

    Interpolation between the previous and next OBSERVED buckets uses
    exact integer epoch-second offsets, so the lerp ratio and therefore
    the double expression ``p + (n - p) * ratio`` is engine-identical
    (observed endpoint values are 2-dp-rounded first, the locf
    discipline). Trailing buckets after the last observation carry it
    forward (there is nothing to interpolate toward).

    Plan: the gapfill_locf shape plus ONE extra per-key window direction
    — keyed observed aggregate, keyed bounds, map-side spine explode,
    keyed left join, and two per-key ordered windows (backward last +
    forward first, both partitioned); spine cardinality is keys x
    buckets, volume-free."""
    from arrowhouse_spark.session import shuffle_parts

    n_part = shuffle_parts(df.sparkSession)
    k = F.col(key_col)
    b = F.date_trunc(bucket, F.col(ts_col))
    ordered = F.struct(
        F.col(ts_col).alias("ts"),
        F.col(tie_col).alias("tie"),
        F.col(value_col).alias("v"),
    )
    # same key-partitioning pin as gapfill_locf (see its comment)
    observed = (
        df.groupBy(k.alias(key_col), b.alias("bucket_ts"))
        .agg(F.round(F.max(ordered).getField("v"), 2).alias("v_obs"))
        .localCheckpoint(eager=False)  # referenced by spine AND the fill join
        .repartition(n_part, key_col)
    )
    spine = (
        observed.groupBy(key_col)
        .agg(F.min("bucket_ts").alias("mn"), F.max("bucket_ts").alias("mx"))
        .select(
            key_col,
            F.explode(
                F.sequence(F.col("mn"), F.col("mx"), F.expr(f"INTERVAL {step}"))
            ).alias("bucket_ts"),
        )
    )
    wb = (
        Window.partitionBy(key_col)
        .orderBy("bucket_ts")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # the forward fill as first() over (currentRow, unboundedFollowing)
    # is a SHRINKING frame — Spark's window exec re-evaluates those from
    # scratch per row (no incremental state), O(frame²) per key; the
    # identical semantics as last() over a GROWING frame in DESCENDING
    # order runs incrementally (bench: 21.5s → window cost gone)
    wf = (
        Window.partitionBy(key_col)
        .orderBy(F.col("bucket_ts").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    obs = F.when(
        F.col("v_obs").isNotNull(),
        F.struct(
            F.unix_timestamp("bucket_ts").alias("ots"),
            F.col("v_obs").alias("ov"),
        ),
    )
    joined = (
        spine.join(observed, [key_col, "bucket_ts"], "left")
        .withColumn("__prev", F.last(obs, ignorenulls=True).over(wb))
        .withColumn("__next", F.last(obs, ignorenulls=True).over(wf))
    )
    t = F.unix_timestamp("bucket_ts")
    p, n = F.col("__prev"), F.col("__next")
    ratio = (t - p["ots"]).cast("double") / (n["ots"] - p["ots"]).cast(
        "double"
    )
    lerp = F.when(
        n.isNotNull() & (n["ots"] != p["ots"]),
        p["ov"] + (n["ov"] - p["ov"]) * ratio,
    ).otherwise(p["ov"])
    # 6-dp quantization hazard, measured: 2-dp endpoints lerped across
    # power-of-two hour gaps produce values EXACTLY on the x.xxxxxx5
    # midpoint (113 rows in 105k at sf0.01), and engines quantize a
    # double to 6 dp through different machinery (shortest-repr
    # BigDecimal HALF_UP vs scaled llround) that disagrees in DIRECTION
    # on those binary near-midpoints. The 1e-9 nudge pushes the whole
    # midpoint family decisively up on every engine; values off the
    # boundary (>1e-8 away) are unaffected at 6 dp.
    return (
        joined.withColumn(
            "v_lerp",
            (lerp + F.lit(1e-9)).cast("decimal(18,6)").cast("double"),
        )
        .withColumn("filled", F.col("v_obs").isNull())
        .select(key_col, "bucket_ts", "v_lerp", "filled")
    )


def seasonal_profile(
    df: DataFrame,
    key_cols,
    ts_col: str,
    value_col: str,
    period_expr: Column | None = None,
    out_prefix: str = "seasonal",
) -> DataFrame:
    """Additive seasonal decomposition by period-bucket averaging — the
    classical-decomposition baseline (value = level + seasonal + residual
    with seasonal = per-bucket mean deviation from the key's level):
    anomaly detectors subtract it before thresholding so "every evening
    is busy" stops tripping the alarm, and capacity models read the
    profile directly. ``period_expr`` buckets the timestamp (default:
    hour-of-day 0..23).

    Exactness doctrine: means are exact-decimal ratios — sums accumulate
    as DECIMAL(38,2) (inputs cast to (18,2)) and each mean is ONE double
    division of engine-identical operands, so any engine reproduces every
    output bit-for-bit (no float summation anywhere). The 6-dp rounding
    adds the +1e-9 NUDGE (decimal-quantization doctrine): a mean
    cents/n lands EXACTLY on a 6-dp midpoint whenever v2(n) = 5 (e.g.
    n = 32 rows in a bucket), and engines round midpoints in different
    directions; the nudge moves every such value off the boundary
    identically on both sides.

    Returns one row per (keys, bucket): n, bucket mean, the key's overall
    level, and the seasonal deviation (bucket mean − level), all rounded
    at 6 dp AFTER the exact division.

    Plan: two keyed aggregates (per-bucket partials → final; the level by
    re-aggregating the bucket sums, so the scan is read ONCE) + a
    broadcast join of the keys-sized level relation. No window."""
    keys = list(key_cols)
    per = period_expr if period_expr is not None else F.hour(F.col(ts_col))
    v = F.col(value_col).cast("decimal(18,2)")
    bucket = (
        df.select(*keys, per.alias("bucket"), v.alias("__v"))
        .groupBy(*keys, "bucket")
        .agg(F.count(F.lit(1)).alias("__n"), F.sum("__v").alias("__s"))
    )
    level = bucket.groupBy(*keys).agg(
        (F.sum("__s").cast("double") / F.sum("__n").cast("double")).alias(
            "__lvl"
        )
    )
    mean = F.col("__s").cast("double") / F.col("__n").cast("double")
    nudge = F.lit(1e-9)
    return (
        bucket.join(F.broadcast(level), keys)
        .select(
            *keys,
            "bucket",
            F.col("__n").cast("long").alias("n"),
            F.round(mean + nudge, 6).alias(f"{out_prefix}_mean"),
            F.round(F.col("__lvl") + nudge, 6).alias("level"),
            F.round(mean - F.col("__lvl") + nudge, 6).alias(
                f"{out_prefix}_dev"
            ),
        )
    )
