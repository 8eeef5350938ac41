"""Numpy-vectorized batch kernels for the byte-level compatibility hashes
(CityHash64, xxHash32/64 seed-0).

The scalar ports in cityhash.py / xxhash.py are the reference kernels; these
vectorized twins exist because per-row Python inside a pandas UDF is the one
remaining interpreter loop on that surface. The trick: every branch in these
algorithms depends ONLY on the byte length, so strings of equal length follow
an identical instruction path — group a batch by length, pack each group into
a (rows, n) uint8 matrix, and the whole group hashes with ~n/8 numpy ops
regardless of row count. Rare lengths (small groups) fall back to the scalar
kernel; both paths are cross-checked against each other in
tests/test_hashing.py.

All arithmetic is native modular uint64/uint32 (numpy wraps silently on
array ops), mirroring the C semantics the scalar ports emulate with masks.
"""

from __future__ import annotations

from typing import Callable, Sequence

import numpy as np

U64 = np.uint64
U32 = np.uint32


def _rot64(x: np.ndarray, s: int) -> np.ndarray:
    if s == 0:
        return x
    return (x >> U64(s)) | (x << U64(64 - s))


def _rotl64(x: np.ndarray, s: int) -> np.ndarray:
    if s == 0:
        return x
    return (x << U64(s)) | (x >> U64(64 - s))


def _rotl32(x: np.ndarray, s: int) -> np.ndarray:
    if s == 0:
        return x
    return (x << U32(s)) | (x >> U32(32 - s))


def _f64(mat: np.ndarray, i: int) -> np.ndarray:
    return np.ascontiguousarray(mat[:, i : i + 8]).view("<u8")[:, 0]


def _f32(mat: np.ndarray, i: int) -> np.ndarray:
    return np.ascontiguousarray(mat[:, i : i + 4]).view("<u4")[:, 0]


def _f32_64(mat: np.ndarray, i: int) -> np.ndarray:
    return _f32(mat, i).astype(np.uint64)


# --------------------------------------------------------------------------
# CityHash64 (v1.0.2) — vectorized mirror of cityhash.city_hash64_py
# --------------------------------------------------------------------------

_K0 = U64(0xC3A5C85C97CB3127)
_K1 = U64(0xB492B66FBE98F273)
_K2 = U64(0x9AE16A3B2F90404F)
_K3 = U64(0xC949D7C7509E6557)
_K_MUL = U64(0x9DDFEA08EB382D69)


def _shift_mix(v: np.ndarray) -> np.ndarray:
    return v ^ (v >> U64(47))


def _hash_len16_np(u: np.ndarray, v: np.ndarray) -> np.ndarray:
    a = (u ^ v) * _K_MUL
    a ^= a >> U64(47)
    b = (v ^ a) * _K_MUL
    b ^= b >> U64(47)
    return b * _K_MUL


def _weak32_np(mat, i, a, b):
    w, x, y, z = _f64(mat, i), _f64(mat, i + 8), _f64(mat, i + 16), _f64(mat, i + 24)
    a = a + w
    b = _rot64(b + a + z, 21)
    c = a
    a = a + x + y
    b = b + _rot64(a, 44)
    return a + z, b + c


def city_hash64_np(mat: np.ndarray) -> np.ndarray:
    """(rows, n) uint8 → uint64 CityHash64 per row; n is the group length."""
    rows, n = mat.shape
    if n == 0:
        return np.full(rows, _K2, dtype=np.uint64)
    if n <= 16:
        if n > 8:
            a = _f64(mat, 0)
            b = _f64(mat, n - 8)
            # RotateByAtLeast1(b + n, n) — n in [9,16] so the shift is valid
            bn = b + U64(n)
            rot = (bn >> U64(n)) | (bn << U64(64 - n))
            return _hash_len16_np(a, rot) ^ b
        if n >= 4:
            a = _f32_64(mat, 0)
            return _hash_len16_np(U64(n) + (a << U64(3)), _f32_64(mat, n - 4))
        a = mat[:, 0].astype(np.uint32)
        b = mat[:, n >> 1].astype(np.uint32)
        c = mat[:, n - 1].astype(np.uint32)
        y = (a + (b << U32(8))).astype(np.uint64)
        z = (U32(n) + (c << U32(2))).astype(np.uint64)
        return _shift_mix((y * _K2) ^ (z * _K3)) * _K2
    if n <= 32:
        a = _f64(mat, 0) * _K1
        b = _f64(mat, 8)
        c = _f64(mat, n - 8) * _K2
        d = _f64(mat, n - 16) * _K0
        return _hash_len16_np(
            _rot64(a - b, 43) + _rot64(c, 30) + d,
            a + _rot64(b ^ _K3, 20) - c + U64(n),
        )
    if n <= 64:
        z = _f64(mat, 24)
        a = _f64(mat, 0) + (U64(n) + _f64(mat, n - 16)) * _K0
        b = _rot64(a + z, 52)
        c = _rot64(a, 37)
        a = a + _f64(mat, 8)
        c = c + _rot64(a, 7)
        a = a + _f64(mat, 16)
        vf = a + z
        vs = b + _rot64(a, 31) + c
        a = _f64(mat, 16) + _f64(mat, n - 32)
        z = _f64(mat, n - 8)
        b = _rot64(a + z, 52)
        c = _rot64(a, 37)
        a = a + _f64(mat, n - 24)
        c = c + _rot64(a, 7)
        a = a + _f64(mat, n - 16)
        wf = a + z
        ws = b + _rot64(a, 31) + c
        r = _shift_mix((vf + ws) * _K2 + (wf + vs) * _K0)
        return _shift_mix(r * _K0 + vs) * _K2

    x = _f64(mat, 0)
    y = _f64(mat, n - 16) ^ _K1
    z = _f64(mat, n - 56) ^ _K0
    # scalar init arithmetic in python ints (numpy SCALAR ops warn on wrap)
    n_k1 = (n * int(_K1)) & 0xFFFFFFFFFFFFFFFF
    v0, v1 = _weak32_np(mat, n - 64, np.full(rows, U64(n)), y)
    w0, w1 = _weak32_np(mat, n - 32, np.full(rows, n_k1, dtype=np.uint64), np.full(rows, _K0))
    z = z + _shift_mix(v1) * _K1
    x = _rot64(z + x, 39) * _K1
    y = _rot64(y, 33) * _K1

    pos = 0
    rem = (n - 1) & ~63
    while True:
        x = _rot64(x + y + v0 + _f64(mat, pos + 16), 37) * _K1
        y = _rot64(y + v1 + _f64(mat, pos + 48), 42) * _K1
        x ^= w1
        y ^= v0
        z = _rot64(z ^ w0, 33)
        v0, v1 = _weak32_np(mat, pos, v1 * _K1, x + w0)
        w0, w1 = _weak32_np(mat, pos + 32, z + w1, y)
        z, x = x, z
        pos += 64
        rem -= 64
        if rem == 0:
            break
    return _hash_len16_np(
        _hash_len16_np(v0, w0) + _shift_mix(y) * _K1 + z,
        _hash_len16_np(v1, w1) + x,
    )


# --------------------------------------------------------------------------
# xxHash64 / xxHash32 — vectorized mirrors of xxhash.xxh64_py / xxh32_py
# --------------------------------------------------------------------------

_P64_1 = U64(0x9E3779B185EBCA87)
_P64_2 = U64(0xC2B2AE3D27D4EB4F)
_P64_3 = U64(0x165667B19E3779F9)
_P64_4 = U64(0x85EBCA77C2B2AE63)
_P64_5 = U64(0x27D4EB2F165667C5)

_P32_1 = U32(2654435761)
_P32_2 = U32(2246822519)
_P32_3 = U32(3266489917)
_P32_4 = U32(668265263)
_P32_5 = U32(374761393)


def _xxh64_round_np(acc: np.ndarray, lane: np.ndarray) -> np.ndarray:
    return _rotl64(acc + lane * _P64_2, 31) * _P64_1


def xxh64_np(mat: np.ndarray, seed: int = 0) -> np.ndarray:
    rows, n = mat.shape
    m64 = 0xFFFFFFFFFFFFFFFF
    i = 0
    if n >= 32:
        v1 = np.full(rows, (seed + int(_P64_1) + int(_P64_2)) & m64, dtype=np.uint64)
        v2 = np.full(rows, (seed + int(_P64_2)) & m64, dtype=np.uint64)
        v3 = np.full(rows, seed & m64, dtype=np.uint64)
        v4 = np.full(rows, (seed - int(_P64_1)) & m64, dtype=np.uint64)
        while i <= n - 32:
            v1 = _xxh64_round_np(v1, _f64(mat, i))
            v2 = _xxh64_round_np(v2, _f64(mat, i + 8))
            v3 = _xxh64_round_np(v3, _f64(mat, i + 16))
            v4 = _xxh64_round_np(v4, _f64(mat, i + 24))
            i += 32
        h = _rotl64(v1, 1) + _rotl64(v2, 7) + _rotl64(v3, 12) + _rotl64(v4, 18)
        for v in (v1, v2, v3, v4):
            h = (h ^ _xxh64_round_np(np.zeros(rows, np.uint64), v)) * _P64_1 + _P64_4
    else:
        h = np.full(rows, (seed + int(_P64_5)) & m64, dtype=np.uint64)
    h = h + U64(n)
    while i <= n - 8:
        h ^= _xxh64_round_np(np.zeros(rows, np.uint64), _f64(mat, i))
        h = _rotl64(h, 27) * _P64_1 + _P64_4
        i += 8
    if i <= n - 4:
        h ^= _f32_64(mat, i) * _P64_1
        h = _rotl64(h, 23) * _P64_2 + _P64_3
        i += 4
    while i < n:
        h ^= mat[:, i].astype(np.uint64) * _P64_5
        h = _rotl64(h, 11) * _P64_1
        i += 1
    h ^= h >> U64(33)
    h = h * _P64_2
    h ^= h >> U64(29)
    h = h * _P64_3
    h ^= h >> U64(32)
    return h


def xxh32_np(mat: np.ndarray, seed: int = 0) -> np.ndarray:
    rows, n = mat.shape
    m32 = 0xFFFFFFFF
    i = 0
    if n >= 16:
        v1 = np.full(rows, (seed + int(_P32_1) + int(_P32_2)) & m32, dtype=np.uint32)
        v2 = np.full(rows, (seed + int(_P32_2)) & m32, dtype=np.uint32)
        v3 = np.full(rows, seed & m32, dtype=np.uint32)
        v4 = np.full(rows, (seed - int(_P32_1)) & m32, dtype=np.uint32)
        while i <= n - 16:
            v1 = _rotl32(v1 + _f32(mat, i) * _P32_2, 13) * _P32_1
            v2 = _rotl32(v2 + _f32(mat, i + 4) * _P32_2, 13) * _P32_1
            v3 = _rotl32(v3 + _f32(mat, i + 8) * _P32_2, 13) * _P32_1
            v4 = _rotl32(v4 + _f32(mat, i + 12) * _P32_2, 13) * _P32_1
            i += 16
        h = _rotl32(v1, 1) + _rotl32(v2, 7) + _rotl32(v3, 12) + _rotl32(v4, 18)
    else:
        h = np.full(rows, (seed + int(_P32_5)) & m32, dtype=np.uint32)
    h = h + U32(n)
    while i <= n - 4:
        h = _rotl32(h + _f32(mat, i) * _P32_3, 17) * _P32_4
        i += 4
    while i < n:
        h = _rotl32(h + mat[:, i].astype(np.uint32) * _P32_5, 11) * _P32_1
        i += 1
    h ^= h >> U32(15)
    h = h * _P32_2
    h ^= h >> U32(13)
    h = h * _P32_3
    h ^= h >> U32(16)
    return h


# --------------------------------------------------------------------------
# XXH3-64 (seed 0, default secret) — vectorized mirror of xxh3.xxh3_64_py.
# Same length-only branch structure as the kernels above: every if/loop in
# XXH3 depends on len(input) alone, so an equal-length group is pure array
# math. Secret words are compile-time constants at seed 0.
# --------------------------------------------------------------------------

_X3_AVMUL = U64(0x165667919E3779F9)
_X3_RRM = U64(0x9FB21C651E98DF25)
_X3_M32 = U64(0xFFFFFFFF)


def _x3_secret() -> bytes:
    # deferred: xxh3.py imports this module inside its UDF builders only,
    # so a lazy import here cannot form a cycle
    from arrowhouse_spark.functions.xxh3 import K_SECRET

    return K_SECRET


def _x3_s64(i: int) -> np.uint64:
    return U64(int.from_bytes(_x3_secret()[i : i + 8], "little"))


def _x3_s32(i: int) -> int:
    return int.from_bytes(_x3_secret()[i : i + 4], "little")


def _mul128_fold64_np(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Per-row (a*b) lo64 ^ hi64 via 32-bit limb decomposition (numpy has no
    128-bit ints). No limb sum overflows uint64: cross < 2^64 - 1."""
    lo = a * b
    a_lo, a_hi = a & _X3_M32, a >> U64(32)
    b_lo, b_hi = b & _X3_M32, b >> U64(32)
    ll = a_lo * b_lo
    cross = (ll >> U64(32)) + ((a_hi * b_lo) & _X3_M32) + a_lo * b_hi
    hi = a_hi * b_hi + ((a_hi * b_lo) >> U64(32)) + (cross >> U64(32))
    return lo ^ hi


def _x3_avalanche_np(h: np.ndarray) -> np.ndarray:
    h = h ^ (h >> U64(37))
    h = h * _X3_AVMUL
    return h ^ (h >> U64(32))


def _x3_xxh64_avalanche_np(h: np.ndarray) -> np.ndarray:
    h = h ^ (h >> U64(33))
    h = h * _P64_2
    h ^= h >> U64(29)
    h = h * _P64_3
    return h ^ (h >> U64(32))


def _x3_rrmxmx_np(h: np.ndarray, n: int) -> np.ndarray:
    h = h ^ (_rotl64(h, 49) ^ _rotl64(h, 24))
    h = h * _X3_RRM
    h ^= (h >> U64(35)) + U64(n)
    h = h * _X3_RRM
    return h ^ (h >> U64(28))


def _x3_mix16_np(mat: np.ndarray, di: int, si: int) -> np.ndarray:
    lo = _f64(mat, di) ^ _x3_s64(si)
    hi = _f64(mat, di + 8) ^ _x3_s64(si + 8)
    return _mul128_fold64_np(lo, hi)


def _x3_0to16_np(mat: np.ndarray, rows: int, n: int) -> np.ndarray:
    if n > 8:
        lo = _f64(mat, 0) ^ (_x3_s64(24) ^ _x3_s64(32))
        hi = _f64(mat, n - 8) ^ (_x3_s64(40) ^ _x3_s64(48))
        acc = U64(n) + lo.byteswap() + hi + _mul128_fold64_np(lo, hi)
        return _x3_avalanche_np(acc)
    if n >= 4:
        input64 = _f32_64(mat, n - 4) + (_f32_64(mat, 0) << U64(32))
        bitflip = _x3_s64(8) ^ _x3_s64(16)
        return _x3_rrmxmx_np(input64 ^ bitflip, n)
    if n > 0:
        c1 = mat[:, 0].astype(np.uint64)
        c2 = mat[:, n >> 1].astype(np.uint64)
        c3 = mat[:, n - 1].astype(np.uint64)
        combined = (c1 << U64(16)) | (c2 << U64(24)) | c3 | U64(n << 8)
        bitflip = U64((_x3_s32(0) ^ _x3_s32(4)) & 0xFFFFFFFFFFFFFFFF)
        return _x3_xxh64_avalanche_np(combined ^ bitflip)
    const = np.full(rows, _x3_s64(56) ^ _x3_s64(64), dtype=np.uint64)
    return _x3_xxh64_avalanche_np(const)


def _x3_17to128_np(mat: np.ndarray, rows: int, n: int) -> np.ndarray:
    acc = np.full(rows, (n * int(_P64_1)) & 0xFFFFFFFFFFFFFFFF, dtype=np.uint64)
    if n > 32:
        if n > 64:
            if n > 96:
                acc = acc + _x3_mix16_np(mat, 48, 96)
                acc = acc + _x3_mix16_np(mat, n - 64, 112)
            acc = acc + _x3_mix16_np(mat, 32, 64)
            acc = acc + _x3_mix16_np(mat, n - 48, 80)
        acc = acc + _x3_mix16_np(mat, 16, 32)
        acc = acc + _x3_mix16_np(mat, n - 32, 48)
    acc = acc + _x3_mix16_np(mat, 0, 0)
    acc = acc + _x3_mix16_np(mat, n - 16, 16)
    return _x3_avalanche_np(acc)


def _x3_129to240_np(mat: np.ndarray, rows: int, n: int) -> np.ndarray:
    acc = np.full(rows, (n * int(_P64_1)) & 0xFFFFFFFFFFFFFFFF, dtype=np.uint64)
    for i in range(8):
        acc = acc + _x3_mix16_np(mat, 16 * i, 16 * i)
    acc = _x3_avalanche_np(acc)
    for i in range(8, n // 16):
        acc = acc + _x3_mix16_np(mat, 16 * i, 16 * (i - 8) + 3)
    acc = acc + _x3_mix16_np(mat, n - 16, 136 - 17)
    return _x3_avalanche_np(acc)


def _x3_accumulate_512_np(acc: list[np.ndarray], mat: np.ndarray, di: int, si: int):
    for i in range(8):
        dv = _f64(mat, di + 8 * i)
        dk = dv ^ _x3_s64(si + 8 * i)
        acc[i ^ 1] = acc[i ^ 1] + dv
        acc[i] = acc[i] + (dk & _X3_M32) * (dk >> U64(32))


def _x3_long_np(mat: np.ndarray, rows: int, n: int) -> np.ndarray:
    init = [
        0xC2B2AE3D, int(_P64_1), int(_P64_2), int(_P64_3),
        int(_P64_4), 0x85EBCA77, int(_P64_5), 0x9E3779B1,
    ]
    acc = [np.full(rows, v, dtype=np.uint64) for v in init]
    secret_size = len(_x3_secret())
    stripes_per_block = (secret_size - 64) // 8
    block_len = 64 * stripes_per_block
    nb_blocks = (n - 1) // block_len
    for b in range(nb_blocks):
        for s in range(stripes_per_block):
            _x3_accumulate_512_np(acc, mat, b * block_len + s * 64, 8 * s)
        for i in range(8):  # scramble
            a = acc[i]
            a = a ^ (a >> U64(47))
            a = a ^ _x3_s64(secret_size - 64 + 8 * i)
            acc[i] = a * U64(0x9E3779B1)
    nb_stripes = ((n - 1) - block_len * nb_blocks) // 64
    for s in range(nb_stripes):
        _x3_accumulate_512_np(acc, mat, nb_blocks * block_len + s * 64, 8 * s)
    _x3_accumulate_512_np(acc, mat, n - 64, secret_size - 64 - 7)
    result = np.full(rows, (n * int(_P64_1)) & 0xFFFFFFFFFFFFFFFF, dtype=np.uint64)
    for i in range(4):
        result = result + _mul128_fold64_np(
            acc[2 * i] ^ _x3_s64(11 + 16 * i),
            acc[2 * i + 1] ^ _x3_s64(11 + 16 * i + 8),
        )
    return _x3_avalanche_np(result)


def xxh3_64_np(mat: np.ndarray) -> np.ndarray:
    """(rows, n) uint8 → uint64 XXH3-64 (seed 0) per row."""
    rows, n = mat.shape
    if n <= 16:
        return _x3_0to16_np(mat, rows, n)
    if n <= 128:
        return _x3_17to128_np(mat, rows, n)
    if n <= 240:
        return _x3_129to240_np(mat, rows, n)
    return _x3_long_np(mat, rows, n)


# --------------------------------------------------------------------------
# Batch driver: group by length, vectorize big groups, scalar the tail
# --------------------------------------------------------------------------


def hash_batch(
    vals: Sequence[bytes | None],
    fixed_fn: Callable[[np.ndarray], np.ndarray],
    scalar_fn: Callable[[bytes], int],
    min_group: int = 4,
) -> list[int | None]:
    """Hash a batch of optional byte strings. Equal-length values vectorize
    through ``fixed_fn`` (one (rows, n) matrix per length); groups smaller
    than ``min_group`` use ``scalar_fn`` (matrix-packing overhead dominates
    below that)."""
    out: list[int | None] = [None] * len(vals)
    groups: dict[int, list[int]] = {}
    for idx, b in enumerate(vals):
        if b is not None:
            groups.setdefault(len(b), []).append(idx)
    for n, idxs in groups.items():
        if len(idxs) < min_group:
            for i in idxs:
                out[i] = scalar_fn(vals[i])
            continue
        if n == 0:
            mat = np.zeros((len(idxs), 0), dtype=np.uint8)
        else:
            mat = np.frombuffer(
                b"".join(vals[i] for i in idxs), dtype=np.uint8
            ).reshape(len(idxs), n)
        for i, h in zip(idxs, fixed_fn(mat).tolist()):
            out[i] = h
    return out


# --------------------------------------------------------------------------
# SipHash-2-4 — vectorized mirror of siphash.siphash64_py (public spec;
# the reference vendors the same algorithm as internal hash-table
# machinery, Common/SipHash.h). All rows in ``mat`` share one length, so
# the word count and tail shape are uniform → the whole batch advances the
# four-lane state with ~n/8 numpy ops.
# --------------------------------------------------------------------------


def _siprounds_np(v0, v1, v2, v3, rounds: int):
    for _ in range(rounds):
        v0 = v0 + v1
        v1 = _rotl64(v1, 13) ^ v0
        v0 = _rotl64(v0, 32)
        v2 = v2 + v3
        v3 = _rotl64(v3, 16) ^ v2
        v0 = v0 + v3
        v3 = _rotl64(v3, 21) ^ v0
        v2 = v2 + v1
        v1 = _rotl64(v1, 17) ^ v2
        v2 = _rotl64(v2, 32)
    return v0, v1, v2, v3


def _siphash_final_state_np(mat: np.ndarray, k0: int, k1: int):
    """Post-finalization (v0, v1, v2, v3) lanes for a batch of equal-
    length messages — shared by the 64-bit and 128-bit emissions."""
    rows, n = mat.shape
    # mask to 64 bits so this kernel and siphash64_py agree for ANY
    # Python-int key (U64() raises OverflowError above 2^64 otherwise)
    k0 &= (1 << 64) - 1
    k1 &= (1 << 64) - 1
    v0 = np.full(rows, U64(0x736F6D6570736575) ^ U64(k0), dtype=np.uint64)
    v1 = np.full(rows, U64(0x646F72616E646F6D) ^ U64(k1), dtype=np.uint64)
    v2 = np.full(rows, U64(0x6C7967656E657261) ^ U64(k0), dtype=np.uint64)
    v3 = np.full(rows, U64(0x7465646279746573) ^ U64(k1), dtype=np.uint64)
    i = 0
    while i + 8 <= n:
        m = _f64(mat, i)
        v3 = v3 ^ m
        v0, v1, v2, v3 = _siprounds_np(v0, v1, v2, v3, 2)
        v0 = v0 ^ m
        i += 8
    tail = np.zeros((rows, 8), dtype=np.uint8)
    if n - i:
        tail[:, : n - i] = mat[:, i:]
    tail[:, 7] = n & 0xFF
    m = tail.view("<u8")[:, 0]
    v3 = v3 ^ m
    v0, v1, v2, v3 = _siprounds_np(v0, v1, v2, v3, 2)
    v0 = v0 ^ m
    v2 = v2 ^ U64(0xFF)
    v0, v1, v2, v3 = _siprounds_np(v0, v1, v2, v3, 4)
    return v0, v1, v2, v3


def siphash64_np(mat: np.ndarray, k0: int = 0, k1: int = 0) -> np.ndarray:
    v0, v1, v2, v3 = _siphash_final_state_np(mat, k0, k1)
    return v0 ^ v1 ^ v2 ^ v3


def siphash128_np(mat: np.ndarray, k0: int = 0, k1: int = 0) -> np.ndarray:
    """Batch 128-bit emission (lowercase-hex strings of the 16-byte
    digest: little-endian lo = v0^v1, then hi = v2^v3 — the reference's
    get128 memory layout, SipHash.h:158-162). Hex keeps the column a
    plain Spark string; the rounds stay fully vectorized, only the
    final formatting is per-row."""
    v0, v1, v2, v3 = _siphash_final_state_np(mat, k0, k1)
    lo = (v0 ^ v1).astype("<u8")
    hi = (v2 ^ v3).astype("<u8")
    buf = np.empty((len(lo), 16), dtype=np.uint8)
    buf[:, :8] = lo.view(np.uint8).reshape(-1, 8)
    buf[:, 8:] = hi.view(np.uint8).reshape(-1, 8)
    return np.array([row.tobytes().hex() for row in buf], dtype=object)
