"""Hash functions ≡ /root/reference/Functions/FunctionsHashing.h:15-118
(IntHash32/64, CityHash64, xxHash32/64, XXH3, wyHash64).

In the reference these back the aggregation hash tables — machinery Spark's
Tungsten owns. The user-visible survivors are exposed here as thin wrappers
over Spark built-ins (JVM-side, codegen-friendly); they also power the
dedup/LSH operators, where a *seeded* 64-bit hash family is required.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def xxhash64(*cols: Column | str, seed: int | None = None) -> Column:
    """xxHash64 ≡ FunctionsHashing.h xxHash64. ``seed`` prepends a literal so
    one column yields an independent hash family member per seed (the basis of
    the minhash signature in operators.dedup)."""
    cs = [F.col(c) if isinstance(c, str) else c for c in cols]
    if seed is not None:
        cs = [F.lit(seed), *cs]
    return F.xxhash64(*cs)


def hash32(*cols: Column | str) -> Column:
    """Murmur3 32-bit (Spark's F.hash) ≈ IntHash32 role."""
    return F.hash(*[F.col(c) if isinstance(c, str) else c for c in cols])


def md5_hex(col: Column | str) -> Column:
    """Content fingerprint usable cross-engine (DuckDB md5 matches bit-for-bit;
    used by dedup_exact so the correctness oracle can reproduce it)."""
    return F.md5((F.col(col) if isinstance(col, str) else col).cast("binary"))


def sha256_hex(col: Column | str) -> Column:
    return F.sha2((F.col(col) if isinstance(col, str) else col).cast("binary"), 256)
