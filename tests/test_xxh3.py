"""XXH3-64 vector tests. Ground truth generated in-container by compiling a
C probe against the PUBLIC xxhash.h vendored by PyArrow
(pyarrow/include/arrow/vendored/xxhash/xxhash.h, the frozen v0.8 algorithm):
inputs buf[i] = (i*31+7) & 0xFF at every length-class boundary, plus ASCII
strings. The reference calls XXH3_64bits(s, len) — seed 0, default secret
(/root/reference/Functions/FunctionsHashing.h:89-104)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from arrowhouse_spark.functions.xxh3 import xxh3_64_py, xxh3_64_str

# (length, XXH3_64bits(buf, length)) with buf[i] = (i*31+7) & 0xFF —
# covers: empty / 1-3 / 4-8 / 9-16 / 17-128 / 129-240 / >240 one-block
# partial stripes / exactly-one-block / multi-block (1024, 2048)
LEN_VECTORS = [
    (0, 0x2D06800538D394C2),
    (1, 0x4C5CCA45D0F4811F),
    (2, 0xA7E250C97710FF27),
    (3, 0x15F7093B173D005C),
    (4, 0xDCA012F95811B6B9),
    (5, 0xB290CAFC7B254345),
    (7, 0x7561869C23DA3C1B),
    (8, 0xDEC6A9A43575982E),
    (9, 0xCBE393399F17FFBD),
    (11, 0x32F214DF8EED29C2),
    (15, 0x545E19990471DC37),
    (16, 0x7E484C18D74895D0),
    (17, 0x208BDE5EE2BED407),
    (31, 0xA937652B0119CA11),
    (32, 0x03DF0AC5255D1446),
    (63, 0x76D4EEC1F092847F),
    (64, 0xDD30702AB46B3745),
    (96, 0xD245CD2541582982),
    (128, 0xF92B70EAA21A6288),
    (129, 0xF8F76713F2BB60FA),
    (130, 0x303A2C3823C3C34A),
    (160, 0xC90911FFCEF461E2),
    (192, 0x084028FA06F01D30),
    (240, 0xCCC7375172C41F03),
    (241, 0x0B3B630948CE4A00),
    (256, 0xEC85B75BAFE6CA74),
    (384, 0x205F2DE015D3BACD),
    (512, 0xEFC2E52D1C2FFBAA),
    (1023, 0xF0D330CE2B3300FB),
    (1024, 0x23BC880EBF0D29C6),
    (2048, 0x19F6F9C987331373),
]

STR_VECTORS = [
    ("", 0x2D06800538D394C2),
    ("a", 0xE6C632B61E964E1F),
    ("abc", 0x78AF5F94892F3950),
    ("hello world", 0xD447B1EA40E6988B),
    ("the quick brown fox jumps over the lazy dog", 0xE4541A9CACF545AA),
]

BUF = bytes((i * 31 + 7) & 0xFF for i in range(2048))


def test_xxh3_python_kernel_matches_vectors():
    for n, expect in LEN_VECTORS:
        assert xxh3_64_py(BUF[:n]) == expect, f"len={n}"
    for s, expect in STR_VECTORS:
        assert xxh3_64_py(s.encode("utf-8")) == expect, s


def test_xxh3_column_matches_vectors(spark):
    df = spark.createDataFrame([(s,) for s, _ in STR_VECTORS], "s string")
    got = {
        r.s: r.h & ((1 << 64) - 1)
        for r in df.select("s", xxh3_64_str("s").alias("h")).collect()
    }
    assert got == {s: e for s, e in STR_VECTORS}


def test_xxh3_column_null_propagates(spark):
    df = spark.createDataFrame([(None,), ("x",)], "s string")
    rows = {r.s: r.h for r in df.select("s", xxh3_64_str("s").alias("h")).collect()}
    assert rows[None] is None and rows["x"] is not None


def test_xxh3_seed_guard():
    with pytest.raises(NotImplementedError):
        xxh3_64_py(b"abc", seed=1)


def test_xxh3_combine_is_hash128to64(spark):
    """Multi-column combining matches the reference's Hash128to64 chain."""
    from arrowhouse_spark.functions.xxh3 import xxh3_combine

    df = spark.createDataFrame([(1, 2)], "a long, b long")
    out = df.select(
        xxh3_combine(F.col("a"), F.col("b")).alias("c"),
    ).collect()[0]
    # Hash128to64(1, 2) computed by the pinned python model in test_hashing
    from tests.test_hashing import model_hash128to64

    assert out.c & ((1 << 64) - 1) == model_hash128to64(1, 2)


def test_xxh3_numpy_kernel_matches_scalar():
    """The length-grouped numpy kernel and the scalar reference port must
    agree on every branch class (0 / 1-3 / 4-8 / 9-16 / 17-128 / 129-240 /
    long incl. multi-block) — same contract as the CityHash/xxHash twins."""
    import random

    import numpy as np

    from arrowhouse_spark.functions._hashkernels import hash_batch, xxh3_64_np

    rng = random.Random(7)
    lengths = list(range(0, 20)) + [31, 32, 33, 64, 100, 128, 129, 200, 240,
                                    241, 256, 512, 1025, 4096]
    for n in lengths:
        vals = [bytes(rng.randrange(256) for _ in range(n)) for _ in range(4)]
        mat = (
            np.frombuffer(b"".join(vals), dtype=np.uint8).reshape(4, n)
            if n
            else np.zeros((4, 0), dtype=np.uint8)
        )
        assert xxh3_64_np(mat).tolist() == [xxh3_64_py(v) for v in vals], n
    # mixed-length batch with nulls through the shared driver
    vals = [None] + [
        bytes(rng.randrange(256) for _ in range(rng.choice(lengths)))
        for _ in range(100)
    ]
    got = hash_batch(vals, xxh3_64_np, xxh3_64_py)
    assert got[0] is None
    assert all(h == xxh3_64_py(v) for h, v in zip(got[1:], vals[1:]))
