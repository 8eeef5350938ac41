"""Function registry: scalar ops, ClickHouse-semantics aggregates, hashing."""

from arrowhouse_spark.functions.scalar import build_scalar
from arrowhouse_spark.functions.aggregates import build_aggregate
from arrowhouse_spark.functions.hashing import (
    city_hash64,
    hash128to64,
    int_hash32,
    int_hash64,
    xxhash64,
)
from arrowhouse_spark.functions.cityhash import city_hash64_str
from arrowhouse_spark.functions.xxhash import xx_hash32_str, xx_hash64_str

__all__ = [
    "build_scalar",
    "build_aggregate",
    "city_hash64",
    "city_hash64_str",
    "hash128to64",
    "int_hash32",
    "int_hash64",
    "xx_hash32_str",
    "xx_hash64_str",
    "xxhash64",
]
