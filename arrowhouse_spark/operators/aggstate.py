"""User-visible mergeable aggregate state — the Spark-first analog of the
reference's partial-aggregation surface.

The reference materializes partial aggregates as a REAL column users can
store and re-merge: ``ColumnAggregateFunction`` (an Arrow extension type
holding per-group state, ``Columns/ColumnAggregateFunction.h:16-107``),
produced by ``final=false`` aggregation and consumed by
``mergeStream``/``mergeBlocks`` (``Aggregator.cpp:745-773, 1281-1472``);
``tests/ut_aggregator.cpp:133-149`` pins the two-phase pipeline
(partial -> merge-final) against single-shot results. Spark performs the
same split internally (partial HashAggregate -> shuffle -> final) but
hides the state; SURVEY.md §4 maps the *internal* path and marks explicit
state shipping "skip". These helpers restore the USER-VISIBLE form for
the one case production pipelines need it: incremental rollups — compute
per-partition (e.g. per-day) state rows once, store them, and fold new
days in without rescanning history (ClickHouse's AggregatingMergeTree
``-State``/``-Merge`` combinator pattern).

Design: states are PLAIN COLUMNS (count as long, sum/min/max as the value
type), not opaque blobs — mergeable with ordinary built-in aggregates, so
the merge step is itself whole-stage-codegen'd and the stored rollup
stays queryable/prunably partitioned at rest. avg ships as (sum, count)
and finalizes as sum/count, exactly the reference's avg state
(``AggregateFunctions/`` avg = sum+count pair).

Supported ops: count, sum, min, max, avg — the reference's own mergeable
set minus ``any`` (its arrival-order nondeterminism is the documented
OverflowMode-style exclusion; a deterministic ``min``-flavored any is
just ``min``).

Scale: per-increment state rows are one keyed aggregate over the new
partition only; the merge aggregates state rows whose cardinality is
(keys x increments) — history-scan-free. Both phases are single keyed
shuffles with map-side partials.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_STATE_OPS = ("count", "sum", "min", "max", "avg")


def _check(ops: Sequence[tuple[str, str]]) -> None:
    for _col, op in ops:
        if op not in _STATE_OPS:
            raise ValueError(f"unsupported state op {op!r}; one of {_STATE_OPS}")


def agg_state(
    df: DataFrame,
    keys: Sequence[str],
    ops: Sequence[tuple[str, str]],
) -> DataFrame:
    """Partial-aggregate state rows: one row per key tuple with mergeable
    state columns ``<op>_<col>`` (avg contributes ``sum_``/``count_``).
    Typically called per increment (day/batch) with the increment id in
    ``keys`` so states append to a partitioned rollup table."""
    _check(ops)
    aggs = {}
    for col, op in ops:
        if op == "count":
            aggs[f"count_{col}"] = F.count(F.col(col))
        elif op == "sum":
            aggs[f"sum_{col}"] = F.sum(F.col(col))
        elif op == "min":
            aggs[f"min_{col}"] = F.min(F.col(col))
        elif op == "max":
            aggs[f"max_{col}"] = F.max(F.col(col))
        elif op == "avg":
            aggs.setdefault(f"sum_{col}", F.sum(F.col(col)))
            aggs.setdefault(f"count_{col}", F.count(F.col(col)))
    return df.groupBy(*keys).agg(
        *[expr.alias(name) for name, expr in aggs.items()]
    )


def agg_merge(
    states: DataFrame,
    keys: Sequence[str],
    ops: Sequence[tuple[str, str]],
) -> DataFrame:
    """Fold state rows to final values by the surviving ``keys`` (drop the
    increment id from ``keys`` to roll increments up). Merge rules are the
    reference's (`Aggregator.cpp` mergeStream): count/sum re-SUM, min/max
    re-MIN/MAX, avg finalizes as merged sum / merged count."""
    _check(ops)
    merged: dict[str, object] = {}
    finals: list = []
    for col, op in ops:
        if op in ("count", "sum") or op == "avg":
            if op in ("count", "avg") and f"count_{col}" not in merged:
                merged[f"count_{col}"] = F.sum(F.col(f"count_{col}"))
            if op in ("sum", "avg") and f"sum_{col}" not in merged:
                merged[f"sum_{col}"] = F.sum(F.col(f"sum_{col}"))
        elif op == "min":
            merged[f"min_{col}"] = F.min(F.col(f"min_{col}"))
        elif op == "max":
            merged[f"max_{col}"] = F.max(F.col(f"max_{col}"))
    out = states.groupBy(*keys).agg(
        *[expr.alias(name) for name, expr in merged.items()]
    )
    drop_helpers: set[str] = set()
    for col, op in ops:
        if op == "avg":
            finals.append(
                (F.col(f"sum_{col}") / F.col(f"count_{col}")).alias(f"avg_{col}")
            )
            if ("count" not in [o for c, o in ops if c == col]):
                drop_helpers.add(f"count_{col}")
            if ("sum" not in [o for c, o in ops if c == col]):
                drop_helpers.add(f"sum_{col}")
    if finals:
        out = out.select("*", *finals).drop(*drop_helpers)
    return out


def hll_state(
    df: DataFrame,
    keys: Sequence[str],
    value_col: str,
    lg_config_k: int = 14,
    out: str = "hll_sketch",
) -> DataFrame:
    """Mergeable approximate-distinct state: one Datasketches HLL sketch
    (binary column) per key tuple — the approximate member of the
    agg_state family, and the closest Spark analog to the reference's
    opaque ColumnAggregateFunction states (here the blob IS opaque,
    unlike the plain-column exact states). Store per increment; merging
    is register-wise max, so fold order can never change the result."""
    return df.groupBy(*keys).agg(
        F.hll_sketch_agg(F.col(value_col), F.lit(lg_config_k)).alias(out)
    )


_CMS_P = 1_000_000_007  # prime modulus; (p-1)^2 ~ 1.0e18 fits a signed long
# fixed pairwise-independent affine rows (a, b), a != 0, both < p — shared
# verbatim by the SQL oracle so bucket assignment is engine-identical
_CMS_ROWS = ((999_983, 7_920), (999_979, 15_839), (999_961, 23_758), (999_959, 31_677))


def _cms_bucket(col, a: int, b: int, width: int):
    """Affine bucket ((a * (x mod p) + b) mod p) mod w in exact BIGINT
    arithmetic — every step stays under 2^63, no float anywhere, so any
    engine computes the identical bucket."""
    x = F.pmod(F.col(col).cast("long"), F.lit(_CMS_P))
    return F.pmod(F.pmod(F.lit(a) * x + F.lit(b), F.lit(_CMS_P)), F.lit(width))


def _cms_check_numeric(df: DataFrame, value_col: str) -> None:
    # a string column would cast to NULL long and every row would pile
    # into one NULL bucket — silently wrong; require the caller to
    # pre-hash (F.xxhash64) non-numeric keys, ClickHouse-style
    t = df.schema[value_col].dataType.typeName()
    if t in ("string", "binary", "boolean"):
        raise TypeError(
            f"cms value column {value_col!r} is {t}; pre-hash it to a long "
            "first (e.g. F.xxhash64(col)) — the affine bucket map needs an "
            "integer domain"
        )


def cms_state(
    df: DataFrame,
    keys: Sequence[str],
    value_col: str,
    depth: int = 4,
    width: int = 512,
) -> DataFrame:
    """Mergeable count-min-sketch state (Cormode/Muthukrishnan CM sketch):
    per key tuple, ``depth`` x ``width`` counters as PLAIN ROWS
    (row, bucket, cnt) — the frequency-sketch member of the agg_state
    family, complementing hll_state (distinct) and the exact states.
    Plain rows keep the merge a built-in SUM (codegen, map-side partials)
    and the stored sketch queryable/partitionable at rest; state size is
    bounded by keys x depth x width regardless of data volume.

    The bucket hash is an exact-integer affine map with fixed public
    constants, so a SQL oracle (or another engine) reproduces the sketch
    bit-for-bit — same doctrine as layout.py's integer quantization."""
    if depth > len(_CMS_ROWS):
        raise ValueError(f"depth <= {len(_CMS_ROWS)}; got {depth}")
    _cms_check_numeric(df, value_col)
    buckets = F.array(
        *[_cms_bucket(value_col, a, b, width) for a, b in _CMS_ROWS[:depth]]
    )
    exploded = df.select(
        *keys, F.posexplode(buckets).alias("row", "bucket")
    )
    return exploded.groupBy(*keys, "row", "bucket").agg(
        F.count(F.lit(1)).alias("cnt")
    )


def cms_merge(states: DataFrame, keys: Sequence[str]) -> DataFrame:
    """Fold CM-sketch states by the surviving ``keys``: counter-wise SUM.
    Addition is associative/commutative, so fold order and increment
    partitioning can never change the merged sketch — merge-then-query
    equals direct-build-then-query exactly (the contract the oracle
    replays)."""
    return states.groupBy(*keys, "row", "bucket").agg(
        F.sum("cnt").alias("cnt")
    )


def cms_point_estimate(
    states: DataFrame,
    probes: DataFrame,
    probe_col: str,
    depth: int = 4,
    width: int = 512,
    out: str = "est",
) -> DataFrame:
    """Point-frequency estimates for a (small) probe relation against a
    merged keyless sketch: min over depth rows of the probed counters —
    the CM guarantee est >= true always holds. The probe side re-derives
    its buckets with the same fixed constants and broadcast-joins the
    state (depth x width rows); missing counters read as 0.

    ``states`` must be a KEYLESS sketch — exactly (row, bucket, cnt).
    cms_state/cms_merge readily produce keyed (per-group) states, and
    joining one here on (row, bucket) alone would silently SUM counters
    across all key groups, inflating every estimate; fold the keys away
    with ``cms_merge(states, keys=[])`` first (or filter to one key)."""
    if depth > len(_CMS_ROWS):
        raise ValueError(f"depth <= {len(_CMS_ROWS)}; got {depth}")
    if set(states.columns) != {"row", "bucket", "cnt"}:
        raise ValueError(
            "cms_point_estimate requires a keyless state with columns "
            f"(row, bucket, cnt); got {states.columns} — fold keyed "
            "states with cms_merge(states, keys=[]) first"
        )
    _cms_check_numeric(probes, probe_col)
    buckets = F.array(
        *[_cms_bucket(probe_col, a, b, width) for a, b in _CMS_ROWS[:depth]]
    )
    probe_h = probes.select(
        F.col(probe_col), F.posexplode(buckets).alias("row", "bucket")
    )
    joined = probe_h.join(F.broadcast(states), ["row", "bucket"], "left")
    per_row = joined.groupBy(probe_col).agg(
        F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias(out)
    )
    return per_row


def hll_merge(
    states: DataFrame,
    keys: Sequence[str],
    state_col: str = "hll_sketch",
    out: str = "approx_distinct",
) -> DataFrame:
    """Fold HLL states by the surviving ``keys`` and finalize to the
    distinct estimate. Union of sketches over partitions of the data is
    EXACTLY the sketch of the whole (register-wise max), so
    merge-then-estimate equals direct-estimate deterministically — the
    contract the oracle query pins."""
    return states.groupBy(*keys).agg(
        F.hll_sketch_estimate(
            F.hll_union_agg(F.col(state_col), F.lit(False))
        ).alias(out)
    )


def hist_state(
    df: DataFrame,
    keys: Sequence[str],
    value_col: str,
    bins: int = 250,
    lo: float = 0.0,
    hi: float = 1000.0,
) -> DataFrame:
    """Mergeable fixed-grid histogram state — the QUANTILE member of the
    mergeable family (exact = agg_state, distinct = hll_state, frequency
    = cms_state): per key tuple, equi-width bin counts over the FIXED
    domain [lo, hi) as plain (bin, cnt) rows. The grid must be fixed up
    front (a data-derived range would give increments incompatible
    grids — the same reason t-digest/KLL carry their own compression
    parameters); out-of-domain values clamp to the edge bins. Quantile
    estimates from the merged state carry error <= one bin width —
    (hi-lo)/bins, chosen by the caller to match their tolerance.

    The bin map is a fixed-order double expression (floor(((x-lo)*bins)
    /(hi-lo)) clamped), so any IEEE-754 engine reproduces the state
    bit-for-bit — the replay-oracle doctrine."""
    b = F.floor(
        ((F.col(value_col) - F.lit(lo)) * F.lit(float(bins))) / F.lit(hi - lo)
    )
    b = F.least(F.greatest(b, F.lit(0)), F.lit(bins - 1)).cast("int")
    return (
        df.filter(F.col(value_col).isNotNull())
        .groupBy(*keys, b.alias("bin"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def hist_merge(states: DataFrame, keys: Sequence[str]) -> DataFrame:
    """Fold histogram states by the surviving ``keys``: bin-wise SUM
    (associative — merge-then-estimate ≡ direct-build, same contract as
    cms_merge)."""
    return states.groupBy(*keys, "bin").agg(F.sum("cnt").alias("cnt"))


def hist_quantile(
    states: DataFrame,
    qs: Sequence[float],
    bins: int = 250,
    lo: float = 0.0,
    hi: float = 1000.0,
    keys: Sequence[str] = (),
) -> DataFrame:
    """Quantile estimates from a (merged) histogram state, one output row
    per key tuple x q: linear interpolation inside the covering bin,
    est = lo + (bin + (q*total - cum_before)/cnt) * binwidth. Everything
    is a fixed-order double expression over the tiny state relation
    (keys x bins rows): cumulative counts via the broadcast theta
    self-join (the bm25/zipf rank pattern — no unpartitioned window),
    quantile targets as an exploded literal array. Error <= binwidth by
    construction; pin it against the exact percentile where affordable."""
    width = (hi - lo) / bins
    kcols = list(keys)
    # `states` is referenced three times below (broadcast side, join
    # base, totals); callers pass merged-state subtrees, so cut once
    states = states.localCheckpoint(eager=False)
    t = states.select(
        *[F.col(k).alias(f"__k_{k}") for k in kcols],
        F.col("bin").alias("__bin2"),
        F.col("cnt").alias("__cnt2"),
    )
    cond = F.col("__bin2") < F.col("bin")
    for k in kcols:
        cond = cond & (F.col(f"__k_{k}") == F.col(k))
    cum = (
        states.join(F.broadcast(t), cond, "left")
        .groupBy(*kcols, "bin", "cnt")
        .agg(F.coalesce(F.sum("__cnt2"), F.lit(0)).alias("cum_before"))
    )
    total = states.groupBy(*kcols).agg(F.sum("cnt").alias("total"))
    if kcols:
        cum = cum.join(F.broadcast(total), kcols)
    else:
        cum = cum.crossJoin(F.broadcast(total))
    qrel = cum.select(
        "*", F.explode(F.array(*[F.lit(float(q)) for q in qs])).alias("q")
    )
    target = F.col("q") * F.col("total")
    # q <= 0 needs its own branch: target=0 can never satisfy
    # cum_before < 0, so the row would silently vanish. The q=0 estimate
    # is the low edge of the FIRST populated bin (cum_before == 0; state
    # rows always have cnt >= 1), where the interpolation term is 0 and
    # est reduces to lo + bin*width. An EMPTY state yields no rows for
    # any q — there is no quantile of nothing.
    hit = qrel.filter(
        F.when(target <= F.lit(0.0), F.col("cum_before") == 0).otherwise(
            (F.col("cum_before") < target)
            & ((F.col("cum_before") + F.col("cnt")) >= target)
        )
    )
    est = F.lit(lo) + (
        F.col("bin") + (target - F.col("cum_before")) / F.col("cnt")
    ) * F.lit(width)
    return hit.select(*kcols, "q", est.alias("est"))


_BLOOM_BITS_PER_WORD = 62  # bit index 0..61 keeps 1<<bit strictly positive
# in signed-64 arithmetic on every engine (no sign-bit / overflow edge)


def _bloom_pos(col, a: int, b: int, m_bits: int):
    """Bit position via the same exact-BIGINT affine map as the CM sketch
    (_cms_bucket) — fixed public constants, reproducible by any engine."""
    x = F.pmod(F.col(col).cast("long"), F.lit(_CMS_P))
    return F.pmod(F.pmod(F.lit(a) * x + F.lit(b), F.lit(_CMS_P)), F.lit(m_bits))


def bloom_state(
    df: DataFrame,
    keys: Sequence[str],
    value_col: str,
    depth: int = 4,
    n_words: int = 256,
) -> DataFrame:
    """Mergeable Bloom-filter membership state (Bloom 1970) — the
    membership member of the agg_state family (exact/HLL-distinct/
    CMS-frequency/histogram-quantile/bitmap): per key tuple, an
    ``n_words`` x 62-bit filter stored as PLAIN ROWS (word, bits) so the
    merge is a built-in BIT_OR (codegen, map-side partials) and the
    stored filter stays queryable/partitionable at rest. Absent word
    rows are all-zero words — state size is bounded by occupancy, never
    allocated dense.

    ``depth`` hash functions are the CM sketch's exact-integer affine
    rows over ``m = n_words*62`` bits, so a SQL oracle reproduces every
    set bit exactly; OR is idempotent + associative/commutative, so
    retried or re-partitioned increments can never change the filter —
    merge-then-probe equals direct-build-then-probe bit-for-bit.
    Contract: probes of true members always return true (no false
    negatives); false-positive rate ~ (1 - e^{-kn/m})^k."""
    if depth > len(_CMS_ROWS):
        raise ValueError(f"depth <= {len(_CMS_ROWS)}; got {depth}")
    if n_words < 1:
        raise ValueError(f"need n_words >= 1, got {n_words}")
    _cms_check_numeric(df, value_col)
    m_bits = n_words * _BLOOM_BITS_PER_WORD
    pos = F.array(
        *[_bloom_pos(value_col, a, b, m_bits) for a, b in _CMS_ROWS[:depth]]
    )
    exploded = df.select(*keys, F.explode(pos).alias("p"))
    word = F.floor(F.col("p") / _BLOOM_BITS_PER_WORD).cast("long")
    bit = F.pmod(F.col("p"), F.lit(_BLOOM_BITS_PER_WORD)).cast("int")
    return (
        exploded.select(
            *keys,
            word.alias("word"),
            bit.alias("__bit"),
        )
        # shiftleft needs a column shift amount -> SQL expression form
        .withColumn("__b", F.expr("shiftleft(CAST(1 AS BIGINT), __bit)"))
        .groupBy(*keys, "word")
        .agg(F.bit_or("__b").alias("bits"))
    )


def bloom_merge(states: DataFrame, keys: Sequence[str]) -> DataFrame:
    """Fold Bloom states by the surviving ``keys``: word-wise BIT_OR.
    Idempotent and associative — any increment partitioning or retry
    folds to the identical filter."""
    return states.groupBy(*keys, "word").agg(F.bit_or("bits").alias("bits"))


def bloom_probe(
    states: DataFrame,
    probes: DataFrame,
    probe_col: str,
    depth: int = 4,
    n_words: int = 256,
    out: str = "member",
) -> DataFrame:
    """Membership probes against a merged KEYLESS filter: re-derive the
    ``depth`` bit positions with the same fixed constants, broadcast-join
    the state's word rows, and report true iff EVERY probed bit is set
    (missing word rows read as zero words). Guaranteed no false
    negatives; false positives bounded by the filter's occupancy.

    ``states`` must be exactly (word, bits) — keyed states would
    silently OR across key groups; fold keys away with
    ``bloom_merge(states, keys=[])`` first."""
    if depth > len(_CMS_ROWS):
        raise ValueError(f"depth <= {len(_CMS_ROWS)}; got {depth}")
    if set(states.columns) != {"word", "bits"}:
        raise ValueError(
            "bloom_probe requires a keyless state with columns "
            f"(word, bits); got {states.columns} — fold keyed states "
            "with bloom_merge(states, keys=[]) first"
        )
    _cms_check_numeric(probes, probe_col)
    m_bits = n_words * _BLOOM_BITS_PER_WORD
    pos = F.array(
        *[_bloom_pos(probe_col, a, b, m_bits) for a, b in _CMS_ROWS[:depth]]
    )
    probe_h = probes.select(F.col(probe_col), F.explode(pos).alias("p"))
    word = F.floor(F.col("p") / _BLOOM_BITS_PER_WORD).cast("long")
    bit = F.pmod(F.col("p"), F.lit(_BLOOM_BITS_PER_WORD)).cast("int")
    probe_b = probe_h.select(
        F.col(probe_col), word.alias("word"), bit.alias("bit")
    )
    joined = probe_b.join(F.broadcast(states), ["word"], "left")
    hit = (
        F.coalesce(
            F.expr("shiftright(bits, bit) & CAST(1 AS BIGINT)"), F.lit(0)
        )
        == 1
    )
    return joined.groupBy(probe_col).agg(
        (F.min(hit.cast("int")) == 1).alias(out)
    )


# fixed affine ladder for the MinHash signature rows — documented public
# constants, enumerable by an oracle as a linear formula of the row index
# (a_r != 0 and both < _CMS_P for every r < 1000)
_MH_A = 999_983
_MH_A_STEP = 1_000
_MH_B = 123
_MH_B_STEP = 7_919


def _mh_token_int(col) -> "Column":  # noqa: F821 — doc type
    """Token string -> 32-bit integer via the md5-prefix idiom
    (sampling.py:hash_bucket) — engine-replayable, unlike xxhash."""
    return F.conv(
        F.substring(F.md5(F.col(col).cast("string")), 1, 8), 16, 10
    ).cast("long")


def minhash_sig_state(
    df: DataFrame,
    keys: Sequence[str],
    token_col: str,
    depth: int = 32,
) -> DataFrame:
    """Mergeable MinHash SIGNATURE state (Broder 1997) — the
    set-similarity member of the agg_state family: per key tuple,
    ``depth`` rows (r, minv) where minv is the minimum of the r-th
    affine hash over the key's token set. MIN is associative,
    commutative, and idempotent, so signatures merge by row-wise MIN
    across any partitioning/retry — merge-then-estimate equals
    direct-build exactly, and the state is ``depth`` rows per key
    FOREVER (the bounded sketch of an unbounded token set).

    Distinct from operators/dedup.py's per-DOCUMENT minhash (near-dup
    banding): this sketches arbitrary KEY GROUPS (sources, days,
    shards) for cross-group Jaccard ESTIMATES — "how much does
    yesterday's crawl overlap today's" without holding either token
    set. The hash ladder is affine over the md5-prefix token integer
    with fixed public constants (a_r = 999983 - 1000r,
    b_r = 123 + 7919r mod p=1e9+7), so a SQL oracle replays every
    signature cell bit-for-bit."""
    if depth < 1 or depth > 999:
        raise ValueError(f"need 1 <= depth <= 999, got {depth}")
    # MIN over a set is duplicate-invariant, so dedupe (key, token) BEFORE
    # the depth-explode: one extra keyed shuffle shrinks the exploded
    # relation by the corpus's token-duplication factor x depth (measured
    # 46s -> linear-in-distinct at 30x without it; the explode is the
    # dominant cost at depth 32)
    distinct_toks = df.select(*keys, F.col(token_col).alias("__tok")).distinct()
    x = _mh_token_int("__tok")
    hashes = F.array(
        *[
            F.pmod(
                F.lit(_MH_A - _MH_A_STEP * r) * F.pmod(x, F.lit(_CMS_P))
                + F.lit(_MH_B + _MH_B_STEP * r),
                F.lit(_CMS_P),
            )
            for r in range(depth)
        ]
    )
    exploded = distinct_toks.select(
        *keys, F.posexplode(hashes).alias("r", "__h")
    )
    return exploded.groupBy(*keys, "r").agg(F.min("__h").alias("minv"))


def minhash_sig_merge(states: DataFrame, keys: Sequence[str]) -> DataFrame:
    """Fold signature states by the surviving ``keys``: row-wise MIN —
    idempotent and associative, any fold order gives the same sketch."""
    return states.groupBy(*keys, "r").agg(F.min("minv").alias("minv"))


def minhash_sig_jaccard(states: DataFrame, key_col: str) -> DataFrame:
    """Pairwise Jaccard ESTIMATES between every two key groups of a
    single-key signature relation: est = (matching rows)/(comparable
    rows) — the collision probability of per-row minima equals the
    Jaccard index (Broder). Returns (key_a, key_b, est) for
    key_a < key_b.

    The denominator is DERIVED from the state itself (the count of r
    values the two keys share in the join), never caller-supplied: a
    state built with depth=32 but estimated with a claimed depth=16
    would silently double every estimate. For same-depth states the
    derived count equals that depth; for states of unequal depth it is
    the shared prefix — the only rows with comparable minima.

    The signature relation is key-count x depth rows — broadcast-sized
    for any sane group count; the pairwise join is (groups x depth)²
    /2 on the r-equality key, corpus-size-free."""
    a = states.select(
        F.col(key_col).alias("key_a"), "r", F.col("minv").alias("__ma")
    )
    b = states.select(
        F.col(key_col).alias("key_b"), "r", F.col("minv").alias("__mb")
    )
    pairs = a.join(F.broadcast(b), "r").filter(F.col("key_a") < F.col("key_b"))
    return pairs.groupBy("key_a", "key_b").agg(
        (
            F.sum(F.when(F.col("__ma") == F.col("__mb"), 1).otherwise(0))
            / F.count(F.lit(1)).cast("double")
        ).alias("est")
    )


def cms_inner_product(
    state_a: DataFrame, state_b: DataFrame, out: str = "est"
) -> DataFrame:
    """Join-size estimation from two KEYLESS CM sketches (Cormode &
    Muthukrishnan's inner-product estimate): for each hash row r,
    sum counter products over shared buckets; the estimate is the MIN
    across rows and NEVER underestimates the true equi-join cardinality
    Σ_k n_a(k)·n_b(k) — the sketch-algebra primitive a planner uses to
    size a shuffle join from two already-stored daily sketches without
    touching either table. Pure integer arithmetic end-to-end, so any
    engine reproduces the estimate bit-for-bit. Returns one row
    (``out`` BIGINT). Plan: one (row, bucket) equi-join of two
    depth×width relations + two tiny aggregates — corpus-size-free."""
    for nm, st in (("state_a", state_a), ("state_b", state_b)):
        if set(st.columns) != {"row", "bucket", "cnt"}:
            raise ValueError(
                f"cms_inner_product requires keyless states; {nm} has "
                f"{st.columns} — fold keys away with cms_merge(st, keys=[])"
            )
    a = state_a.select("row", "bucket", F.col("cnt").alias("__ca"))
    b = state_b.select("row", "bucket", F.col("cnt").alias("__cb"))
    per_row = (
        a.join(b, ["row", "bucket"])
        .groupBy("row")
        .agg(F.sum(F.col("__ca") * F.col("__cb")).alias("__ip"))
    )
    return per_row.agg(F.min("__ip").cast("long").alias(out))


_TWO64 = "18446744073709551616"  # 2^64, exactly representable in decimal(20,0)


def _kmv_u(hash_col: Column) -> Column:
    """Spark xxhash64 as its UNSIGNED value in DECIMAL(20,0) — exact
    two's-complement reinterpretation (h<0 → h + 2^64). The KMV order
    statistic needs the unsigned ordering; decimals keep it exact where a
    double would collapse nearby hashes."""
    d = hash_col.cast("decimal(20,0)")
    return (
        F.when(hash_col < 0, d + F.lit(_TWO64).cast("decimal(21,0)"))
        .otherwise(d)
        .cast("decimal(20,0)")
    )


def kmv_state(
    df: DataFrame, keys: Sequence[str], value_col: str, k: int = 64
) -> DataFrame:
    """KMV (k-minimum-values, a.k.a. bottom-k / theta-sketch family)
    distinct-count state: per key group, the k smallest DISTINCT unsigned
    xxhash64 values of ``value_col`` (hashed via Spark's JVM xxhash64
    seed-42 over the string form — the repo's DuckDB replay model makes
    the whole sketch oracle-replayable bit-for-bit). Unlike HLL, KMV
    states support SET ALGEBRA: union = merge-and-truncate, and the
    Jaccard/intersection estimators below. Bacon et al. / Beyer et al.
    (K-Minimum Values synopses) are the public references.

    State relation: (keys..., r in 1..k, u DECIMAL(20,0)) — plain columns,
    mergeable, idempotent under re-insertion (MIN-set of a set).

    Scale: distinct (keys, u) first (the shuffle carries 8-byte hashes),
    then ONE key-partitioned window truncates to k rows per key — state
    size k x groups forever."""
    if k < 2:
        raise ValueError(f"need k >= 2, got {k}")
    keys = list(keys)
    u = _kmv_u(F.xxhash64(F.col(value_col).cast("string")))
    dist = df.select(*keys, u.alias("u")).distinct()
    w = Window.partitionBy(*keys).orderBy(F.col("u").asc())
    return (
        dist.withColumn("r", F.row_number().over(w))
        .filter(F.col("r") <= k)
        .select(*keys, "r", "u")
    )


def kmv_merge(
    states: DataFrame, keys: Sequence[str], k: int = 64
) -> DataFrame:
    """Fold KMV states by the surviving ``keys``: distinct union of the
    hash sets, re-truncated to the k smallest — associative, commutative,
    idempotent (any fold order gives the same sketch).

    k coupling: merging with a k SMALLER than the states were built with
    is sound set algebra (the bottom-k of bottom-K sets, K >= k, is the
    true bottom-k); merging with a LARGER k is NOT (two bottom-64 sets do
    not contain the true bottom-128) and is undetectable here — never
    grow k after states exist."""
    keys = list(keys)
    dist = states.select(*keys, "u").distinct()
    w = Window.partitionBy(*keys).orderBy(F.col("u").asc())
    return (
        dist.withColumn("r", F.row_number().over(w))
        .filter(F.col("r") <= k)
        .select(*keys, "r", "u")
    )


def kmv_estimate(
    state: DataFrame, keys: Sequence[str], k: int = 64, out: str = "est"
) -> DataFrame:
    """Distinct-count estimate per key: exact |state| when the sketch
    never filled (n < k), else the order-statistic estimator
    (k-1) * 2^64 / u_k (u_k = the k-th smallest = max of the state).
    Deterministic cross-engine: u_k is an exact decimal both engines cast
    to the SAME double, and (k-1)*2^64 is exactly representable.

    ``k`` MUST be the k the state was built with (kmv_state/kmv_merge's
    default is also 64): the estimator's filled-vs-underfilled test and
    denominator both hang off it. A state built with a LARGER k is
    detected and raises (its r ranks exceed k); a state built with a
    SMALLER k is indistinguishable from an underfilled one and silently
    undercounts — keep k consistent across the state's whole lifecycle."""
    keys = list(keys)
    two64 = float(int(_TWO64))
    return state.groupBy(*keys).agg(
        F.count(F.lit(1)).cast("long").alias("n_state"),
        F.round(
            F.when(
                F.max("r") > k,
                F.raise_error(
                    F.concat(
                        F.lit("kmv_estimate: state holds rank r="),
                        F.max("r").cast("string"),
                        F.lit(
                            f" > k={k}; it was built with a larger k —"
                            " pass the k the state was built with"
                        ),
                    )
                ).cast("double"),
            )
            .when(
                F.count(F.lit(1)) < k,
                F.count(F.lit(1)).cast("double"),
            )
            .otherwise(
                F.lit(float(k - 1) * two64) / F.max("u").cast("double")
            ),
            2,
        ).alias(out),
    )


def kmv_union_intersect(
    state_a: DataFrame,
    state_b: DataFrame,
    k: int = 64,
) -> DataFrame:
    """Set-algebra estimates from two KEYLESS KMV states (fold keys away
    with kmv_merge(st, keys=[]) first): the union sketch is the k
    smallest of the combined hash sets; Jaccard = |hashes of the union
    sketch present in BOTH inputs| / |union sketch| (the standard KMV
    resemblance estimator); intersection = jaccard * union_est. One row
    out: (n_union_state, union_est, jaccard, intersect_est). Everything
    up to the two final double ops is exact integer/decimal arithmetic.

    Scale: states are k rows each — every join here is broadcast-trivial;
    the operator composes with daily kmv_state shards exactly like the
    HLL/CMS merge families."""
    a = state_a.select(F.col("u").alias("u")).distinct()
    b = state_b.select(F.col("u").alias("u")).distinct()
    uni = a.unionByName(b).distinct()
    # k smallest of a <=2k-row relation: TakeOrderedAndProject, no window
    union_state = uni.orderBy(F.col("u").asc()).limit(k)
    marked = (
        union_state.join(
            a.withColumn("__ina", F.lit(1)), "u", "left"
        ).join(b.withColumn("__inb", F.lit(1)), "u", "left")
    )
    two64 = float(int(_TWO64))
    agg = marked.agg(
        F.count(F.lit(1)).cast("long").alias("n_union_state"),
        F.max("u").alias("__umax"),
        F.sum(
            (F.col("__ina").isNotNull() & F.col("__inb").isNotNull()).cast(
                "long"
            )
        ).alias("__both"),
    )
    union_est = F.when(
        F.col("n_union_state") < k, F.col("n_union_state").cast("double")
    ).otherwise(F.lit(float(k - 1) * two64) / F.col("__umax").cast("double"))
    return agg.select(
        "n_union_state",
        F.round(union_est, 2).alias("union_est"),
        F.round(
            F.col("__both").cast("double") / F.col("n_union_state"), 6
        ).alias("jaccard"),
        F.round(
            (F.col("__both").cast("double") / F.col("n_union_state"))
            * union_est,
            2,
        ).alias("intersect_est"),
    )
