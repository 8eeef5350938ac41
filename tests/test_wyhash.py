"""wyHash64 superset tests. The reference's wyhash submodule is EMPTY
(/root/reference/contrib/wyhash/) and wyhash changed incompatibly across
public versions, so there is no upstream ground truth to pin against
(functions/wyhash.py docstring documents the labeled-superset contract).
What IS testable: (a) the scalar and numpy kernels — written independently —
agree on every length class; (b) the Spark column reproduces the pinned
self-generated vectors the oracle uses; (c) the seeded flavor and the
little-endian combine layout behave per the wyhash_final construction and
the reference's combineHashesFunc (FunctionsHashing.h:33-40)."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from arrowhouse_spark.functions.wyhash import (
    WYP,
    wy_hash64_str,
    wyhash64_np,
    wyhash64_py,
    wyhash_combine,
)


def _buf(n: int) -> bytes:
    return bytes((33 + ((i * 31 + 7) % 94)) for i in range(n))


def test_scalar_and_numpy_kernels_agree_everywhere():
    """Independent implementations (python ints vs 32-bit-limb numpy) must
    agree across every branch: empty, _wyr3, 4-16 dual-read, 16-byte tail
    loop, 48-byte three-lane loop (+continuation, odd remainders)."""
    import random

    rng = random.Random(11)
    for n in list(range(0, 132)) + [150, 192, 240, 333, 1024, 4096]:
        data = [bytes(rng.randrange(256) for _ in range(n)) for _ in range(4)]
        mat = (
            np.frombuffer(b"".join(data), dtype=np.uint8).reshape(4, n)
            if n
            else np.zeros((4, 0), np.uint8)
        )
        assert [wyhash64_py(d) for d in data] == wyhash64_np(mat).tolist(), n


def test_seed_changes_hash_consistently():
    m = np.frombuffer(_buf(29), dtype=np.uint8).reshape(1, 29)
    assert wyhash64_py(_buf(29), 42) == wyhash64_np(m, 42).tolist()[0]
    assert wyhash64_py(_buf(29), 42) != wyhash64_py(_buf(29), 0)


def test_column_matches_pinned_vectors(spark):
    from arrowhouse_spark.suite import _WYHASH_LENS_HASHES

    buf = "".join(chr(33 + ((i * 31 + 7) % 94)) for i in range(2048))
    df = spark.createDataFrame(
        [(n, buf[:n]) for n, _ in _WYHASH_LENS_HASHES], "n int, s string"
    )
    got = {r.n: r.h for r in df.select("n", wy_hash64_str("s").alias("h")).collect()}
    assert got == dict(_WYHASH_LENS_HASHES)


def test_column_null_propagates(spark):
    df = spark.createDataFrame([("x",), (None,)], "s string")
    rows = df.select(wy_hash64_str("s").alias("h")).collect()
    assert rows[0].h is not None and rows[1].h is None


def test_combine_is_little_endian_concat(spark):
    """combineHashes ≡ wyhash over the LE 16-byte pair (combineHashesFunc):
    pin the Spark combine column against a direct scalar recomputation."""
    h1, h2 = -123456789123456789, 987654321987654321
    packed = (h1 & ((1 << 64) - 1)).to_bytes(8, "little") + (
        h2 & ((1 << 64) - 1)
    ).to_bytes(8, "little")
    want = wyhash64_py(packed)
    want = want - (1 << 64) if want >= (1 << 63) else want
    df = spark.createDataFrame([(h1, h2), (None, h2)], "a long, b long")
    rows = df.select(wyhash_combine(F.col("a"), F.col("b")).alias("h")).collect()
    assert rows[0].h == want
    assert rows[1].h is None  # null operand propagates


def test_secret_is_final_v4():
    assert WYP[0] == 0x2D358DCCAA6C78A5 and len(WYP) == 4
