"""Structured-Streaming operators (capability superset — the reference has no
streaming runtime, SURVEY.md §2.8; its replace/versioned-merge semantic is the
one with a natural continuous analog)."""

from arrowhouse_spark.streaming.replace import (
    read_parquet_stream,
    stream_bitmap_distinct,
    stream_cms,
    stream_kmv,
    stream_dedup_exact,
    stream_dedup_first_seen,
    stream_hist,
    stream_interval_join,
    stream_bloom,
    stream_ewma,
    stream_minhash_neardup,
    stream_ohlc,
    stream_pareto,
    stream_scd2,
    stream_replace_latest,
    stream_sessionize,
    stream_shard_export,
    stream_trending_terms,
    stream_windowed_agg,
)

__all__ = [
    "read_parquet_stream",
    "stream_bitmap_distinct",
    "stream_cms",
    "stream_kmv",
    "stream_dedup_exact",
    "stream_dedup_first_seen",
    "stream_hist",
    "stream_interval_join",
    "stream_bloom",
    "stream_ewma",
    "stream_minhash_neardup",
    "stream_ohlc",
    "stream_pareto",
    "stream_replace_latest",
    "stream_scd2",
    "stream_sessionize",
    "stream_shard_export",
    "stream_trending_terms",
    "stream_windowed_agg",
]
