"""XXH3-64 — bit-exact port of the reference's xxh3 surface
(/root/reference/Functions/FunctionsHashing.h:89-104: ``XXH3_64bits(s, len)``,
i.e. seed 0 with the default 192-byte secret) from the PUBLIC xxHash
specification (Yann Collet, BSD-2; the v0.8+ algorithm is frozen).

The reference vendors xxHash as a git submodule that is not checked out in
this snapshot (/root/reference/contrib/xxHash/ is empty), so in-tree parity
is untestable — but the algorithm and its default secret are fully public.
Ground truth for the pytest vectors was generated in-container by compiling
a tiny C program against the same public xxhash.h that PyArrow vendors
(pyarrow/include/arrow/vendored/xxhash/xxhash.h), covering every length
class: 0 / 1-3 / 4-8 / 9-16 / 17-128 / 129-240 / >240 incl. multi-block.

Like CityHash64/xxHash64-seed0, the byte algorithm is irreducibly
imperative → numpy-free pure-Python kernel behind an Arrow-batched pandas
UDF. This is the ClickHouse-compatibility surface, NOT the engine's hot
hashing path (dedup/LSH run on JVM F.xxhash64).

wyHash64: its vendored submodule is also empty AND wyhash changed
algorithms incompatibly across public versions (v1-v4 final), so without
the pinned submodule commit a "bit-exact" claim is unverifiable. It is
covered as an explicitly LABELED SUPERSET (the public wyhash_final
construction, self-pinned vectors, no upstream-parity claim) in
functions/wyhash.py.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_M32 = (1 << 32) - 1
_M64 = (1 << 64) - 1

P32_1 = 0x9E3779B1
P32_2 = 0x85EBCA77
P32_3 = 0xC2B2AE3D
P64_1 = 0x9E3779B185EBCA87
P64_2 = 0xC2B2AE3D27D4EB4F
P64_3 = 0x165667B19E3779F9
P64_4 = 0x85EBCA77C2B2AE63
P64_5 = 0x27D4EB2F165667C5

# The public default secret (XXH3_kSecret, 192 bytes) — verified byte-for-byte
# against the PyArrow-vendored public header.
K_SECRET = bytes.fromhex(
    "b8fe6c3923a44bbe7c01812cf721ad1cded46de9839097db7240a4a4b7b3671f"
    "cb79e64eccc0e578825ad07dccff7221b8084674f743248ee03590e6813a264c"
    "3c2852bb91c300cb88d0658b1b532ea371644897a20df94e3819ef46a9deacd8"
    "a8fa763fe39c343ff9dcbbc7c70b4f1d8a51e04bcdb45931c89f7ec9d9787364"
    "eac5ac8334d3ebc3c581a0fffa1363eb170ddd51b7f0da49d316552629d4689e"
    "2b16be587d47a1fc8ff8b8d17ad031ce45cb3a8f95160428afd7fbcabb4b407e"
)

_MIDSIZE_STARTOFFSET = 3
_MIDSIZE_LASTOFFSET = 17
_SECRET_SIZE_MIN = 136
_SECRET_LASTACC_START = 7
_SECRET_MERGEACCS_START = 11
_STRIPE_LEN = 64


def _rotl64(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M64


def _rd32(b: bytes, i: int) -> int:
    return int.from_bytes(b[i : i + 4], "little")


def _rd64(b: bytes, i: int) -> int:
    return int.from_bytes(b[i : i + 8], "little")


def _mul128_fold64(a: int, b: int) -> int:
    p = a * b
    return (p & _M64) ^ (p >> 64)


def _xxh64_avalanche(h: int) -> int:
    h ^= h >> 33
    h = (h * P64_2) & _M64
    h ^= h >> 29
    h = (h * P64_3) & _M64
    h ^= h >> 32
    return h


def _xxh3_avalanche(h: int) -> int:
    h ^= h >> 37
    h = (h * 0x165667919E3779F9) & _M64
    h ^= h >> 32
    return h


def _rrmxmx(h: int, length: int) -> int:
    h ^= _rotl64(h, 49) ^ _rotl64(h, 24)
    h = (h * 0x9FB21C651E98DF25) & _M64
    h ^= (h >> 35) + length
    h &= _M64
    h = (h * 0x9FB21C651E98DF25) & _M64
    return h ^ (h >> 28)


def _mix16(data: bytes, di: int, secret: bytes, si: int, seed: int) -> int:
    lo = _rd64(data, di) ^ ((_rd64(secret, si) + seed) & _M64)
    hi = _rd64(data, di + 8) ^ ((_rd64(secret, si + 8) - seed) & _M64)
    return _mul128_fold64(lo, hi)


def _len_0to16(data: bytes, n: int, secret: bytes, seed: int) -> int:
    if n > 8:
        bf1 = ((_rd64(secret, 24) ^ _rd64(secret, 32)) + seed) & _M64
        bf2 = ((_rd64(secret, 40) ^ _rd64(secret, 48)) - seed) & _M64
        lo = _rd64(data, 0) ^ bf1
        hi = _rd64(data, n - 8) ^ bf2
        bswap_lo = int.from_bytes(lo.to_bytes(8, "little"), "big")
        acc = (n + bswap_lo + hi + _mul128_fold64(lo, hi)) & _M64
        return _xxh3_avalanche(acc)
    if n >= 4:
        # spec: seed64 ^= swap32(lo32(seed64)) << 32 — identity at seed 0,
        # the only supported configuration (guarded in xxh3_64_py)
        in1 = _rd32(data, 0)
        in2 = _rd32(data, n - 4)
        bitflip = ((_rd64(secret, 8) ^ _rd64(secret, 16)) - seed) & _M64
        input64 = (in2 + (in1 << 32)) & _M64
        return _rrmxmx(input64 ^ bitflip, n)
    if n > 0:
        c1, c2, c3 = data[0], data[n >> 1], data[n - 1]
        combined = ((c1 << 16) | (c2 << 24) | c3 | (n << 8)) & _M32
        bitflip = ((_rd32(secret, 0) ^ _rd32(secret, 4)) + seed) & _M64
        return _xxh64_avalanche(combined ^ bitflip)
    return _xxh64_avalanche(seed ^ _rd64(secret, 56) ^ _rd64(secret, 64))


def _len_17to128(data: bytes, n: int, secret: bytes, seed: int) -> int:
    acc = (n * P64_1) & _M64
    if n > 32:
        if n > 64:
            if n > 96:
                acc += _mix16(data, 48, secret, 96, seed)
                acc += _mix16(data, n - 64, secret, 112, seed)
            acc += _mix16(data, 32, secret, 64, seed)
            acc += _mix16(data, n - 48, secret, 80, seed)
        acc += _mix16(data, 16, secret, 32, seed)
        acc += _mix16(data, n - 32, secret, 48, seed)
    acc += _mix16(data, 0, secret, 0, seed)
    acc += _mix16(data, n - 16, secret, 16, seed)
    return _xxh3_avalanche(acc & _M64)


def _len_129to240(data: bytes, n: int, secret: bytes, seed: int) -> int:
    acc = (n * P64_1) & _M64
    rounds = n // 16
    for i in range(8):
        acc += _mix16(data, 16 * i, secret, 16 * i, seed)
    acc = _xxh3_avalanche(acc & _M64)
    for i in range(8, rounds):
        acc += _mix16(data, 16 * i, secret, 16 * (i - 8) + _MIDSIZE_STARTOFFSET, seed)
    acc += _mix16(data, n - 16, secret, _SECRET_SIZE_MIN - _MIDSIZE_LASTOFFSET, seed)
    return _xxh3_avalanche(acc & _M64)


def _accumulate_512(acc: list[int], data: bytes, di: int, secret: bytes, si: int):
    for i in range(8):
        dv = _rd64(data, di + 8 * i)
        dk = dv ^ _rd64(secret, si + 8 * i)
        acc[i ^ 1] = (acc[i ^ 1] + dv) & _M64
        acc[i] = (acc[i] + (dk & _M32) * (dk >> 32)) & _M64


def _scramble(acc: list[int], secret: bytes, si: int):
    for i in range(8):
        a = acc[i]
        a ^= a >> 47
        a ^= _rd64(secret, si + 8 * i)
        acc[i] = (a * P32_1) & _M64


def _hash_long(data: bytes, n: int, secret: bytes) -> int:
    # XXH3_INIT_ACC lane order (note 32/64 interleave at lanes 5/6)
    acc = [P32_3, P64_1, P64_2, P64_3, P64_4, P32_2, P64_5, P32_1]
    secret_size = len(secret)
    stripes_per_block = (secret_size - _STRIPE_LEN) // 8
    block_len = _STRIPE_LEN * stripes_per_block
    nb_blocks = (n - 1) // block_len
    for b in range(nb_blocks):
        for s in range(stripes_per_block):
            _accumulate_512(acc, data, b * block_len + s * _STRIPE_LEN, secret, 8 * s)
        _scramble(acc, secret, secret_size - _STRIPE_LEN)
    nb_stripes = ((n - 1) - block_len * nb_blocks) // _STRIPE_LEN
    for s in range(nb_stripes):
        _accumulate_512(
            acc, data, nb_blocks * block_len + s * _STRIPE_LEN, secret, 8 * s
        )
    _accumulate_512(
        acc, data, n - _STRIPE_LEN, secret, secret_size - _STRIPE_LEN - _SECRET_LASTACC_START
    )
    result = (n * P64_1) & _M64
    for i in range(4):
        result += _mul128_fold64(
            acc[2 * i] ^ _rd64(secret, _SECRET_MERGEACCS_START + 16 * i),
            acc[2 * i + 1] ^ _rd64(secret, _SECRET_MERGEACCS_START + 16 * i + 8),
        )
    return _xxh3_avalanche(result & _M64)


def xxh3_64_py(data: bytes, seed: int = 0) -> int:
    """XXH3-64 of raw bytes. Only seed 0 (the reference's configuration) is
    supported: non-zero seeds derive a custom secret in the long path, which
    this surface does not need."""
    if seed != 0:
        raise NotImplementedError("xxh3_64_py supports seed 0 only")
    n = len(data)
    if n <= 16:
        return _len_0to16(data, n, K_SECRET, 0)
    if n <= 128:
        return _len_17to128(data, n, K_SECRET, 0)
    if n <= 240:
        return _len_129to240(data, n, K_SECRET, 0)
    return _hash_long(data, n, K_SECRET)


def xxh3_64_str(col: Column | str) -> Column:
    """XXH3-64 over a string/binary column ≡ the reference's ``xxh3``
    function (FunctionsHashing.h:89-104). Returns the uint64 bit pattern as
    a Spark long. Arrow-batched pandas UDF — compatibility surface only.

    Inside each batch, equal-length values hash through the numpy kernel
    (_hashkernels.xxh3_64_np — XXH3's branch structure depends only on
    length); rare lengths fall back to the scalar port above. Cross-checked
    in tests/test_xxh3.py."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    from arrowhouse_spark.functions._hashkernels import hash_batch, xxh3_64_np

    def _hash(vals):
        bs = [
            None
            if v is None
            else (bytes(v) if isinstance(v, (bytes, bytearray)) else str(v).encode("utf-8"))
            for v in vals
        ]
        out = [
            None if h is None else (h - (1 << 64) if h >= (1 << 63) else h)
            for h in hash_batch(bs, xxh3_64_np, xxh3_64_py)
        ]
        return pd.Series(out, dtype="Int64")

    _hash.__annotations__ = {"vals": pd.Series, "return": pd.Series}
    return pandas_udf(_hash, "long")(F.col(col) if isinstance(col, str) else col)


def xxh3_combine(h1: Column, h2: Column) -> Column:
    """Multi-column combining ≡ ImplXXH3::combineHashes = Hash128to64
    (FunctionsHashing.h:98-102) — JVM-side via functions.hashing."""
    from arrowhouse_spark.functions.hashing import hash128to64

    return hash128to64(h1, h2)
