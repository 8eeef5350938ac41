"""Deterministic sampling / dataset-split operators for training-data
pipelines (BASELINE.json north star; the reference has no sampling surface —
its closest notion is the GROUP BY overflow knob, SURVEY.md §2.3).

Everything here is hash-deterministic, not RNG-based: the same row always
lands in the same bucket/split regardless of partitioning, executor count, or
retries — the property training pipelines need for stable held-out sets and
reproducible subsets. The hash is an md5 prefix so an independent engine
(DuckDB oracle) reproduces assignments bit-for-bit.

Scale notes:
  - ``hash_bucket`` / ``hash_sample`` / ``train_test_split`` are pure
    map-side column expressions — no shuffle, no state; they survive any
    repartitioning and stream through at scan speed.
  - ``stratified_sample_exact`` takes exactly ceil(frac·n) rows per stratum
    via a per-stratum window — one shuffle keyed by the strata; a single
    giant stratum serializes into one task, so at 100 TB use it for
    bounded-cardinality strata (language, source, shard) and fall back to
    ``hash_sample`` (approximate fraction, no shuffle) otherwise.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def hash_bucket(col: Column | str, n_buckets: int, salt: str = "") -> Column:
    """Stable bucket id in [0, n_buckets) from an md5 prefix of the salted
    key. 8 hex chars = 32 bits of hash — bucket skew ~ 1/sqrt(2^32) —
    and reproducible in any engine with md5 (the DuckDB oracle)."""
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit(salt), _c(col).cast("string"))), 1, 8),
        16,
        10,
    ).cast("long")
    return (h % n_buckets).alias("bucket")


def hash_sample(
    df: DataFrame,
    key: Column | str,
    frac: float,
    salt: str = "sample",
    n_buckets: int = 10_000,
) -> DataFrame:
    """Approximate-fraction deterministic sample: keep rows whose hash bucket
    falls below frac·n_buckets. Map-side only — the scale path."""
    return df.filter(hash_bucket(key, n_buckets, salt) < int(round(frac * n_buckets)))


def train_test_split(
    df: DataFrame,
    key: Column | str,
    test_frac: float = 0.1,
    salt: str = "split",
    n_buckets: int = 1_000,
) -> tuple[DataFrame, DataFrame]:
    """(train, test) with a stable per-key assignment: a key is in test iff
    its bucket < test_frac·n_buckets. Keys never migrate between splits when
    the data grows — the property that prevents test-set leakage across
    pipeline runs."""
    cut = int(round(test_frac * n_buckets))
    b = hash_bucket(key, n_buckets, salt)
    return df.filter(b >= cut), df.filter(b < cut)


def stratified_sample_exact(
    df: DataFrame,
    strata: Sequence[str],
    frac: float,
    key: str,
    salt: str = "strata",
) -> DataFrame:
    """Exactly ceil(frac·n) rows per stratum, chosen deterministically: rows
    rank by (md5(salt‖key), key) inside each stratum and the top fraction
    survives. One shuffle keyed by the strata columns."""
    h = F.md5(F.concat(F.lit(salt), _c(key).cast("string")))
    w = Window.partitionBy(*strata).orderBy(h, F.col(key))
    cnt = Window.partitionBy(*strata)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .withColumn("__n", F.count(F.lit(1)).over(cnt))
        .filter(F.col("__rn") <= F.ceil(F.lit(frac) * F.col("__n")))
        .drop("__rn", "__n")
    )
