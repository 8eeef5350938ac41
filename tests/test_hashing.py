"""Bit-exact parity tests for the IntHash32/IntHash64 column expressions
(reference: /root/reference/Functions/FunctionsHashing.h:15-30,
/root/reference/Common/HashTable/Hash.h:31-40,371-384) against an exact
Python model of the same mixes."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from arrowhouse_spark.functions import hashing

M64 = (1 << 64) - 1


def model_int_hash64(v: int) -> int:
    x = (v & M64) ^ 0x4CF2D2BAAE6DA887
    x ^= x >> 33
    x = (x * 0xFF51AFD7ED558CCD) & M64
    x ^= x >> 33
    x = (x * 0xC4CEB9FE1A85EC53) & M64
    x ^= x >> 33
    return x


def model_int_hash32(v: int) -> int:
    key = (v & M64) ^ 0x75D9543DE018BF45
    key = ((~key & M64) + ((key << 18) & M64)) & M64
    key ^= (key >> 31) | ((key << 33) & M64)
    key = (key * 21) & M64
    key ^= (key >> 11) | ((key << 53) & M64)
    key = (key + ((key << 6) & M64)) & M64
    key ^= (key >> 22) | ((key << 42) & M64)
    return key & 0xFFFFFFFF


def _signed(u: int) -> int:
    return u - (1 << 64) if u >= 1 << 63 else u


def test_int_hash_bit_exact(spark):
    rng = random.Random(7)
    vals = [0, 1, -1, 2**63 - 1, -(2**63), 42, 0xDEADBEEF] + [
        rng.randint(-(2**63), 2**63 - 1) for _ in range(200)
    ]
    df = spark.createDataFrame([(v,) for v in vals], "x long")
    rows = df.select(
        "x",
        hashing.int_hash64("x").alias("h64"),
        hashing.int_hash32("x").alias("h32"),
    ).collect()
    assert len(rows) == len(vals)
    for r in rows:
        assert r.h64 == _signed(model_int_hash64(r.x & M64)), r.x
        assert r.h32 == model_int_hash32(r.x & M64), r.x


def test_vectorized_kernels_match_scalar_ports():
    """The numpy length-group kernels behind the string-hash UDFs must be
    bit-identical to the scalar reference ports at every length-class
    boundary (incl. empty, tails, single/multi stripe, 64-byte blocks)."""
    import numpy as np

    from arrowhouse_spark.functions._hashkernels import (
        city_hash64_np,
        hash_batch,
        xxh32_np,
        xxh64_np,
    )
    from arrowhouse_spark.functions.cityhash import city_hash64_py
    from arrowhouse_spark.functions.xxhash import xxh32_py, xxh64_py

    rng = random.Random(13)
    lens = [0, 1, 3, 4, 7, 8, 9, 15, 16, 17, 31, 32, 33, 63, 64, 65, 127, 128, 129, 256, 300]
    for n in lens:
        data = [bytes(rng.randrange(256) for _ in range(n)) for _ in range(4)]
        mat = (
            np.frombuffer(b"".join(data), dtype=np.uint8).reshape(4, n)
            if n
            else np.zeros((4, 0), dtype=np.uint8)
        )
        for k in range(4):
            assert int(city_hash64_np(mat)[k]) == city_hash64_py(data[k]), n
            assert int(xxh64_np(mat)[k]) == xxh64_py(data[k]), n
            assert int(xxh64_np(mat, 42)[k]) == xxh64_py(data[k], 42), n
            assert int(xxh32_np(mat)[k]) == xxh32_py(data[k]), n
    # mixed batch: None propagation + rare-length scalar fallback
    vals = [None, b"", b"abc", b"abc", b"abc", b"abc", bytes(range(77))]
    out = hash_batch(vals, city_hash64_np, city_hash64_py)
    assert out[0] is None
    assert all(out[i] == city_hash64_py(vals[i]) for i in range(1, 7))


def test_int_hash_narrow_zero_extension(spark):
    """Reference POD semantics: a negative int32 is bit_cast into a
    zero-initialized UInt64 (zero extension), not sign-extended. With
    input_width=32 the hash of int32 -5 must equal the hash of the long
    0xFFFFFFFB, and must differ from the sign-extended default."""
    df = spark.createDataFrame([(-5,)], "x int")
    r = df.select(
        hashing.int_hash64("x", 32).alias("hz"),
        hashing.int_hash64("x").alias("hs"),
        hashing.int_hash64(F.lit((1 << 32) - 5).cast("long")).alias("href"),
        hashing.city_hash64("x", "x", input_widths=[32, 32]).alias("cz"),
        hashing.city_hash64(
            F.lit((1 << 32) - 5).cast("long"), F.lit((1 << 32) - 5).cast("long")
        ).alias("cref"),
    ).collect()[0]
    assert r.hz == r.href
    assert r.hz != r.hs
    assert r.cz == r.cref


def test_int_hash_null_propagates(spark):
    df = spark.createDataFrame([(None,), (5,)], "x long")
    rows = {
        r.x: (r.h64, r.h32)
        for r in df.select(
            "x",
            hashing.int_hash64("x").alias("h64"),
            hashing.int_hash32("x").alias("h32"),
        ).collect()
    }
    assert rows[None] == (None, None)
    assert rows[5] == (
        _signed(model_int_hash64(5)),
        model_int_hash32(5),
    )


def test_wrap_helpers_match_python(spark):
    rng = random.Random(11)
    pairs = [(rng.randint(-(2**63), 2**63 - 1), rng.randint(0, M64)) for _ in range(50)]
    df = spark.createDataFrame([(a,) for a, _ in pairs], "a long")
    for i, (a, c) in enumerate(pairs[:5]):
        got = (
            spark.createDataFrame([(a,)], "a long")
            .select(hashing._wrap_mul_const(F.col("a"), c).alias("m"))
            .collect()[0]
            .m
        )
        assert got == _signed(((a & M64) * c) & M64), (a, c, i)


# --- CityHash64 (cityhash102) -------------------------------------------------

def model_hash128to64(lo: int, hi: int) -> int:
    """Independent re-derivation of Hash128to64 for cross-checking the
    column expression and the scalar port."""
    k_mul = 0x9DDFEA08EB382D69
    a = ((lo ^ hi) * k_mul) & M64
    a ^= a >> 47
    b = ((hi ^ a) * k_mul) & M64
    b ^= b >> 47
    return (b * k_mul) & M64


def test_hash128to64_column_matches_model(spark):
    from arrowhouse_spark.functions.cityhash import hash128to64_py

    rng = random.Random(7)
    pairs = [(rng.randint(0, M64), rng.randint(0, M64)) for _ in range(40)]
    df = spark.createDataFrame([(_signed(a), _signed(b)) for a, b in pairs], "a long, b long")
    rows = df.select(
        "a", "b", hashing.hash128to64(F.col("a"), F.col("b")).alias("h")
    ).collect()
    for r in rows:
        lo, hi = r.a & M64, r.b & M64
        expect = model_hash128to64(lo, hi)
        assert r.h == _signed(expect)
        assert hash128to64_py(lo, hi) == expect


def test_city_hash64_int_combines_with_int_hash(spark):
    """cityHash64 over PODs == intHash64 per column + Hash128to64 fold
    (FunctionsHashing.h:42-51, use_int_hash_for_pods)."""
    df = spark.createDataFrame([(3, 17), (-5, 0), (2**40, 7)], "a long, b long")
    rows = df.select(
        "a", "b", hashing.city_hash64("a", "b").alias("h")
    ).collect()
    for r in rows:
        expect = model_hash128to64(
            model_int_hash64(r.a & M64), model_int_hash64(r.b & M64)
        )
        assert r.h == _signed(expect)


def test_city_hash64_str_boundary_lengths(spark):
    """UDF vs the scalar port at every length-class boundary, incl. the
    block-loop entry (65) and multi-block (129, 200); empty string == k2."""
    from arrowhouse_spark.functions.cityhash import (
        K2,
        city_hash64_py,
        city_hash64_str,
    )

    assert city_hash64_py(b"") == K2
    rng = random.Random(3)
    lens = [0, 1, 2, 3, 4, 7, 8, 9, 15, 16, 17, 31, 32, 33, 63, 64, 65, 100, 128, 129, 160, 200]
    vals = [
        "".join(chr(rng.randint(32, 126)) for _ in range(n)) for n in lens
    ]
    df = spark.createDataFrame([(v,) for v in vals], "s string")
    rows = df.select("s", city_hash64_str("s").alias("h")).collect()
    for r in rows:
        assert r.h == _signed(city_hash64_py(r.s.encode())), len(r.s)


def test_city_hash64_str_null_and_unicode(spark):
    from arrowhouse_spark.functions.cityhash import city_hash64_py, city_hash64_str

    df = spark.createDataFrame([(None,), ("héllo wörld ünïcode",)], "s string")
    rows = {r.s: r.h for r in df.select("s", city_hash64_str("s").alias("h")).collect()}
    assert rows[None] is None
    s = "héllo wörld ünïcode"
    assert rows[s] == _signed(city_hash64_py(s.encode("utf-8")))


# --- xxHash32 / xxHash64 ------------------------------------------------------

def test_xxh64_seed42_matches_spark_jvm(spark):
    """Independent ground truth: the Python port at seed 42 must reproduce
    Spark's JVM XxHash64 on UTF-8 bytes across all length classes."""
    from arrowhouse_spark.functions.xxhash import xxh64_py

    rng = random.Random(5)
    strs = ["", "a", "abc", "x" * 31, "y" * 32, "z" * 33, "w" * 100] + [
        "".join(chr(rng.randint(32, 126)) for _ in range(rng.randint(0, 200)))
        for _ in range(20)
    ]
    df = spark.createDataFrame([(s,) for s in strs], "s string")
    for r in df.select("s", F.xxhash64("s").alias("h")).collect():
        assert r.h == _signed(xxh64_py(r.s.encode(), seed=42)), len(r.s)


def test_xx_hash_str_udfs_match_python(spark):
    from arrowhouse_spark.functions.xxhash import (
        xx_hash32_str,
        xx_hash64_str,
        xxh32_py,
        xxh64_py,
    )

    rng = random.Random(9)
    lens = [0, 1, 3, 4, 7, 8, 15, 16, 17, 31, 32, 33, 45, 64, 100]
    vals = ["".join(chr(rng.randint(32, 126)) for _ in range(n)) for n in lens]
    df = spark.createDataFrame([(v,) for v in vals], "s string")
    rows = df.select(
        "s", xx_hash32_str("s").alias("h32"), xx_hash64_str("s").alias("h64")
    ).collect()
    for r in rows:
        b = r.s.encode()
        assert r.h32 == xxh32_py(b, 0), len(r.s)
        assert r.h64 == _signed(xxh64_py(b, 0)), len(r.s)


def test_xx_hash_null_propagates(spark):
    from arrowhouse_spark.functions.xxhash import xx_hash32_str, xx_hash64_str

    df = spark.createDataFrame([(None,), ("q",)], "s string")
    rows = {r.s: (r.a, r.b) for r in df.select(
        "s", xx_hash32_str("s").alias("a"), xx_hash64_str("s").alias("b")
    ).collect()}
    assert rows[None] == (None, None)
    assert rows["q"][0] is not None and rows["q"][1] is not None


def test_siphash24_official_vectors_and_kernels(spark):
    """SipHash-2-4 (functions/siphash.py — the reference's internal
    Common/SipHash.h algorithm exposed as a labeled-superset column
    function): the scalar port reproduces the PUBLISHED ground truth —
    the paper's worked example and the reference-implementation vectors
    for the empty/1-byte/8-byte messages — and the numpy batch kernel is
    bit-exact against the scalar port across every tail length, word
    count, and key shape, including through the distributed column API."""
    import random

    import numpy as np

    from arrowhouse_spark.functions._hashkernels import siphash64_np
    from arrowhouse_spark.functions.siphash import (
        sip_hash64_str,
        siphash64_py,
    )

    k0, k1 = 0x0706050403020100, 0x0F0E0D0C0B0A0908
    msg = bytes(range(64))
    assert siphash64_py(b"", k0, k1) == 0x726FDB47DD0E0E31
    assert siphash64_py(msg[:1], k0, k1) == 0x74F839C593DC67FD
    assert siphash64_py(msg[:8], k0, k1) == 0x93F5F5799A932462
    # the SipHash paper's Appendix worked example
    assert siphash64_py(msg[:15], k0, k1) == 0xA129CA6149BE45E5

    rng = random.Random(7)
    for n in list(range(0, 25)) + [63, 64, 65, 300]:
        rows = [bytes(rng.randrange(256) for _ in range(n)) for _ in range(4)]
        mat = (
            np.frombuffer(b"".join(rows), dtype=np.uint8).reshape(4, n)
            if n
            else np.zeros((4, 0), dtype=np.uint8)
        )
        for key in [(0, 0), (k0, k1), (2**63 + 11, 987654321)]:
            assert siphash64_np(mat, *key).tolist() == [
                siphash64_py(r, *key) for r in rows
            ]

    # distributed column API: strings UTF-8, NULLs pass through
    df = spark.createDataFrame(
        [(1, "hello world"), (2, ""), (3, None)], "i int, s string"
    )
    got = {
        r.i: r.h
        for r in df.select("i", sip_hash64_str("s").alias("h")).collect()
    }
    exp0 = siphash64_py(b"hello world")
    assert got[1] == (exp0 - (1 << 64) if exp0 >= (1 << 63) else exp0)
    exp1 = siphash64_py(b"")
    assert got[2] == (exp1 - (1 << 64) if exp1 >= (1 << 63) else exp1)
    assert got[3] is None


def test_siphash128_emission_fold_invariant_and_kernels(spark):
    """The reference's 128-bit SipHash (SipHash.h:158-172 get128) emits
    lo = v0^v1, hi = v2^v3 from the SAME state as the 64-bit digest —
    so lo XOR hi must equal the 64-bit digest for EVERY input, which
    pins the split emission against the paper's PUBLISHED 64-bit
    vectors (any state error flips the 64-bit side, any emission error
    flips the fold). Scalar and numpy kernels must agree bit-exactly;
    the column API hex-encodes the 16-byte get128 buffer order."""
    import random

    import numpy as np

    from arrowhouse_spark.functions._hashkernels import siphash128_np
    from arrowhouse_spark.functions.siphash import (
        sip_hash128_str,
        siphash64_py,
        siphash128_py,
    )

    k0, k1 = 0x0706050403020100, 0x0F0E0D0C0B0A0908
    # the paper's worked example: the full digest's fold must equal the
    # published 64-bit vector
    msg15 = bytes(range(15))
    d = siphash128_py(msg15, k0, k1)
    lo = int.from_bytes(d[:8], "little")
    hi = int.from_bytes(d[8:], "little")
    assert lo ^ hi == 0xA129CA6149BE45E5

    rng = random.Random(3)
    for n in list(range(0, 25)) + [63, 64, 65, 300]:
        rows = [bytes(rng.randrange(256) for _ in range(n)) for _ in range(4)]
        mat = (
            np.frombuffer(b"".join(rows), dtype=np.uint8).reshape(4, n)
            if n
            else np.zeros((4, 0), dtype=np.uint8)
        )
        for key in [(0, 0), (k0, k1)]:
            hexes = siphash128_np(mat, *key).tolist()
            for r, h in zip(rows, hexes):
                dig = siphash128_py(r, *key)
                assert dig.hex() == h
                l = int.from_bytes(dig[:8], "little")
                u = int.from_bytes(dig[8:], "little")
                assert l ^ u == siphash64_py(r, *key)

    df = spark.createDataFrame(
        [(1, "hello world"), (2, ""), (3, None)], "i int, s string"
    )
    got = {
        r.i: r.h
        for r in df.select("i", sip_hash128_str("s").alias("h")).collect()
    }
    assert got[1] == siphash128_py(b"hello world").hex()
    assert got[2] == siphash128_py(b"").hex()
    assert got[3] is None


def test_siphash_oversized_key_masks_identically_in_both_kernels():
    """Keys >= 2^64 must mask to 64 bits in BOTH kernels (round-12
    ADVICE): pre-fix the scalar path silently leaked high key bits
    through _rotl's right shift while the numpy U64() cast raised
    OverflowError — so the same sip_hash64_str call could crash or
    silently diverge depending on batch length-grouping."""
    import numpy as np

    from arrowhouse_spark.functions._hashkernels import siphash64_np
    from arrowhouse_spark.functions.siphash import siphash64_py

    msg = b"mask me"
    big_k0 = (1 << 64) + 12345
    big_k1 = (7 << 64) + 999
    assert siphash64_py(msg, big_k0, big_k1) == siphash64_py(msg, 12345, 999)
    mat = np.frombuffer(msg, dtype=np.uint8).reshape(1, len(msg))
    assert siphash64_np(mat, big_k0, big_k1).tolist() == [
        siphash64_py(msg, 12345, 999)
    ]
