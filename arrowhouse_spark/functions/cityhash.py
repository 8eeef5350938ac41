"""CityHash64 (CityHash v1.0.2, Pike & Alakuijala — public-domain Google
library) — bit-exact port of the string path of the reference's cityHash64
(/root/reference/Functions/FunctionsHashing.h:42-51; algorithm at
/root/reference/contrib/cityhash102/src/city.cc:121-243).

Split by input kind, matching the reference exactly:
  - integer columns: the reference sets ``use_int_hash_for_pods = true``, so
    cityHash64 over PODs is intHash64 — already bit-exact JVM-side in
    functions/hashing.int_hash64; multi-column combining is Hash128to64
    (hashing.hash128to64, also JVM-side codegen).
  - string/binary columns: the real CityHash64 byte algorithm, which is
    irreducibly imperative (length-class branches + a 64-byte block loop with
    56 bytes of rolling state). It runs here as an Arrow-batched pandas UDF —
    the documented exception to built-ins-first: there is no declarative
    decomposition, and Arrow batching keeps the transfer cost per-batch, not
    per-row. This is a compatibility surface (ClickHouse users porting
    ``cityHash64(str)`` calls), NOT the engine's hot hashing path — dedup/LSH
    hash with the JVM-side xxhash64.

Correctness strategy: tests/test_hashing.py cross-checks this scalar port
against an independently written numpy-vectorized implementation over random
inputs at every length-class boundary, and the suite's ``city_hash_str_parity``
query checks the ≤16-byte paths bit-for-bit against a DuckDB arithmetic model.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_M64 = (1 << 64) - 1

K0 = 0xC3A5C85C97CB3127
K1 = 0xB492B66FBE98F273
K2 = 0x9AE16A3B2F90404F
K3 = 0xC949D7C7509E6557
K_MUL = 0x9DDFEA08EB382D69


def _rot(v: int, s: int) -> int:
    """64-bit right-rotate; s==0 returns v (city.cc Rotate avoids shift-by-64)."""
    if s == 0:
        return v
    return ((v >> s) | (v << (64 - s))) & _M64


def _rot_al1(v: int, s: int) -> int:
    """RotateByAtLeast1 — caller guarantees s in [1, 63]."""
    return ((v >> s) | (v << (64 - s))) & _M64


def _shift_mix(v: int) -> int:
    return v ^ (v >> 47)


def hash128to64_py(lo: int, hi: int) -> int:
    """Hash128to64 (city.h:104-113): murmur-inspired 128→64 fold."""
    a = ((lo ^ hi) * K_MUL) & _M64
    a ^= a >> 47
    b = ((hi ^ a) * K_MUL) & _M64
    b ^= b >> 47
    return (b * K_MUL) & _M64


def _hash_len16(u: int, v: int) -> int:
    return hash128to64_py(u, v)


def _fetch64(s: bytes, i: int) -> int:
    return int.from_bytes(s[i : i + 8], "little")


def _fetch32(s: bytes, i: int) -> int:
    return int.from_bytes(s[i : i + 4], "little")


def _hash_len_0to16(s: bytes, n: int) -> int:
    if n > 8:
        a = _fetch64(s, 0)
        b = _fetch64(s, n - 8)
        return _hash_len16(a, _rot_al1((b + n) & _M64, n)) ^ b
    if n >= 4:
        a = _fetch32(s, 0)
        return _hash_len16((n + (a << 3)) & _M64, _fetch32(s, n - 4))
    if n > 0:
        a, b, c = s[0], s[n >> 1], s[n - 1]
        y = (a + (b << 8)) & 0xFFFFFFFF
        z = (n + (c << 2)) & 0xFFFFFFFF
        return (_shift_mix((y * K2) & _M64 ^ (z * K3) & _M64) * K2) & _M64
    return K2


def _hash_len_17to32(s: bytes, n: int) -> int:
    a = (_fetch64(s, 0) * K1) & _M64
    b = _fetch64(s, 8)
    c = (_fetch64(s, n - 8) * K2) & _M64
    d = (_fetch64(s, n - 16) * K0) & _M64
    return _hash_len16(
        (_rot((a - b) & _M64, 43) + _rot(c, 30) + d) & _M64,
        (a + _rot(b ^ K3, 20) - c + n) & _M64,
    )


def _weak_hash_len32_with_seeds(
    w: int, x: int, y: int, z: int, a: int, b: int
) -> tuple[int, int]:
    a = (a + w) & _M64
    b = _rot((b + a + z) & _M64, 21)
    c = a
    a = (a + x + y) & _M64
    b = (b + _rot(a, 44)) & _M64
    return (a + z) & _M64, (b + c) & _M64


def _weak32(s: bytes, i: int, a: int, b: int) -> tuple[int, int]:
    return _weak_hash_len32_with_seeds(
        _fetch64(s, i), _fetch64(s, i + 8), _fetch64(s, i + 16), _fetch64(s, i + 24), a, b
    )


def _hash_len_33to64(s: bytes, n: int) -> int:
    z = _fetch64(s, 24)
    a = (_fetch64(s, 0) + (n + _fetch64(s, n - 16)) * K0) & _M64
    b = _rot((a + z) & _M64, 52)
    c = _rot(a, 37)
    a = (a + _fetch64(s, 8)) & _M64
    c = (c + _rot(a, 7)) & _M64
    a = (a + _fetch64(s, 16)) & _M64
    vf = (a + z) & _M64
    vs = (b + _rot(a, 31) + c) & _M64
    a = (_fetch64(s, 16) + _fetch64(s, n - 32)) & _M64
    z = _fetch64(s, n - 8)
    b = _rot((a + z) & _M64, 52)
    c = _rot(a, 37)
    a = (a + _fetch64(s, n - 24)) & _M64
    c = (c + _rot(a, 7)) & _M64
    a = (a + _fetch64(s, n - 16)) & _M64
    wf = (a + z) & _M64
    ws = (b + _rot(a, 31) + c) & _M64
    r = _shift_mix(((vf + ws) * K2 + (wf + vs) * K0) & _M64)
    return (_shift_mix((r * K0 + vs) & _M64) * K2) & _M64


def city_hash64_py(s: bytes) -> int:
    """CityHash64 over bytes — exact uint64 result (city.cc:206-243)."""
    n = len(s)
    if n <= 32:
        if n <= 16:
            return _hash_len_0to16(s, n)
        return _hash_len_17to32(s, n)
    if n <= 64:
        return _hash_len_33to64(s, n)

    x = _fetch64(s, 0)
    y = _fetch64(s, n - 16) ^ K1
    z = _fetch64(s, n - 56) ^ K0
    v = _weak32(s, n - 64, n, y)
    w = _weak32(s, n - 32, (n * K1) & _M64, K0)
    z = (z + _shift_mix(v[1]) * K1) & _M64
    x = (_rot((z + x) & _M64, 39) * K1) & _M64
    y = (_rot(y, 33) * K1) & _M64

    pos = 0
    rem = (n - 1) & ~63
    while True:
        x = (_rot((x + y + v[0] + _fetch64(s, pos + 16)) & _M64, 37) * K1) & _M64
        y = (_rot((y + v[1] + _fetch64(s, pos + 48)) & _M64, 42) * K1) & _M64
        x ^= w[1]
        y ^= v[0]
        z = _rot(z ^ w[0], 33)
        v = _weak32(s, pos, (v[1] * K1) & _M64, (x + w[0]) & _M64)
        w = _weak32(s, pos + 32, (z + w[1]) & _M64, y)
        z, x = x, z
        pos += 64
        rem -= 64
        if rem == 0:
            break
    return _hash_len16(
        (_hash_len16(v[0], w[0]) + _shift_mix(y) * K1 + z) & _M64,
        (_hash_len16(v[1], w[1]) + x) & _M64,
    )


def city_hash64_str(col: Column | str) -> Column:
    """cityHash64 over a string/binary column (Arrow-batched pandas UDF).
    Returns the uint64 bit pattern as a Spark long; NULL in → NULL out.

    Inside each Arrow batch, equal-length values hash through the
    numpy-vectorized kernel (_hashkernels.city_hash64_np — branch structure
    depends only on length, so a length-group is pure array math); rare
    lengths fall back to the scalar reference port above. Both kernels are
    cross-checked in tests/test_hashing.py."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    from arrowhouse_spark.functions._hashkernels import city_hash64_np, hash_batch

    def _city(vals):
        bs = [
            None
            if v is None
            else (bytes(v) if isinstance(v, (bytes, bytearray)) else str(v).encode("utf-8"))
            for v in vals
        ]
        out = [
            None if h is None else (h - (1 << 64) if h >= (1 << 63) else h)
            for h in hash_batch(bs, city_hash64_np, city_hash64_py)
        ]
        return pd.Series(out, dtype="Int64")

    _city.__annotations__ = {"vals": pd.Series, "return": pd.Series}
    udf = pandas_udf(_city, "long")
    return udf(F.col(col) if isinstance(col, str) else col)
