"""Multimodal (image/audio/video) column plumbing for training-data pipelines.

Media are opaque ``binary`` payload columns + typed metadata (BASELINE.json
north star). The Spark-side contract is what this module makes real and
tested: schema, Arrow-batched UDF signatures, partition sizing. The actual
codec work is STUBBED — the image/audio libraries are not in this container —
behind ``_decode_image_real`` which raises NotImplementedError; the default
path uses a deterministic fake decoder over a tiny self-describing header so
tests exercise the full distributed plumbing with verifiable outputs.

Scale notes: payload columns dominate row size, so
  - media tables should be written with small ``maxRecordsPerFile`` /
    row-group sizes (a 100 MB row group with 100 KB payloads is 1k rows);
  - ``mapInPandas`` streams Arrow batches — peak executor memory is
    O(arrow batch bytes), tune ``spark.sql.execution.arrow.maxRecordsPerBatch``
    down (e.g. 64) for media tables;
  - feature extraction outputs (small fixed-size vectors) should be written to
    a SEPARATE table joined by id, so downstream reads never touch payloads.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: media table schema: opaque payload + typed metadata
MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), False),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("duration_ms", T.IntegerType()),
                    T.StructField("sample_rate", T.IntegerType()),
                ]
            ),
        ),
    ]
)

#: fake payload header: magic 'AHMM' + u16 width + u16 height (see make_fake_payload)
_MAGIC = b"AHMM"


def make_fake_payload(width: int, height: int, seed: int = 0) -> bytes:
    """Deterministic self-describing fake media payload for tests: header +
    (width*height) pseudo-pixel bytes."""
    body = bytes(((x * 31 + seed) % 251) for x in range(width * height))
    return _MAGIC + struct.pack("<HH", width, height) + body


def make_fake_payloads(
    df: DataFrame, id_col: str = "media_id", width_mod: int = 5, height_mod: int = 7
) -> DataFrame:
    """Distributed fixture builder: (id) → (media_id, payload) with
    width=8+id%width_mod, height=8+id%height_mod, seed=id. Runs as an
    Arrow-batched mapInPandas so fixture generation scales with the input
    (no driver-side collect — the production ingest shape)."""

    def _run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
        import pandas as pd

        for pdf in batches:
            ids = [int(i) for i in pdf[id_col]]
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "payload": [
                        make_fake_payload(8 + i % width_mod, 8 + i % height_mod, seed=i)
                        for i in ids
                    ],
                }
            )

    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("payload", T.BinaryType()),
        ]
    )
    return df.select(F.col(id_col).cast("long").alias(id_col)).mapInPandas(
        _run, out_schema
    )


#: stable error surface for the stubbed codec path — pinned by
#: tests/test_multimodal.py so the seam cannot rot silently
IMAGE_CODEC_UNAVAILABLE_MSG = (
    "image codec libraries not installed (pip install pillow); "
    "decode_images(use_real_codec=True) needs a real decoder"
)


def _decode_image_real(payload: bytes) -> tuple[int, int, float]:
    """Real decoder seam: decodes any PIL-readable payload (PNG/JPEG/…) to
    (width, height, mean_gray_pixel) when pillow is installed — the same
    contract as the fake decoder, so the two are interchangeable inside
    decode_images. Raises NotImplementedError with a STABLE message when no
    codec library is present (this container); libvips/ffmpeg swap in here."""
    try:
        from io import BytesIO

        from PIL import Image
    except ImportError as e:
        raise NotImplementedError(IMAGE_CODEC_UNAVAILABLE_MSG) from e
    with Image.open(BytesIO(payload)) as im:
        gray = im.convert("L")
        w, h = gray.size
        data = gray.tobytes()
        return w, h, sum(data) / max(len(data), 1)


def _decode_image_fake(payload: bytes) -> tuple[int, int, float]:
    """Deterministic fake decode: parse the AHMM header, 'decode' pixels as
    raw bytes, return (width, height, mean_pixel)."""
    if payload[:4] != _MAGIC:
        raise ValueError("bad magic")
    w, h = struct.unpack("<HH", payload[4:8])
    pixels = payload[8 : 8 + w * h]
    mean = sum(pixels) / max(len(pixels), 1)
    return w, h, mean


DECODE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("mean_pixel", T.DoubleType()),
    ]
)


def decode_images(df: DataFrame, use_real_codec: bool = False) -> DataFrame:
    """Decode payloads → per-media features via mapInPandas (Arrow batches).

    The UDF signature, batch iteration, and output schema are the production
    shape; only the innermost decode call is stubbed."""
    decode = _decode_image_real if use_real_codec else _decode_image_fake

    def _run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
        import pandas as pd

        for pdf in batches:
            out = {"media_id": [], "width": [], "height": [], "mean_pixel": []}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                w, h, mean = decode(bytes(payload))
                out["media_id"].append(mid)
                out["width"].append(w)
                out["height"].append(h)
                out["mean_pixel"].append(mean)
            yield pd.DataFrame(out)

    return df.select("media_id", "payload").mapInPandas(_run, DECODE_SCHEMA)


RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
    ]
)


def resize_images(df: DataFrame, max_side: int) -> DataFrame:
    """'Resize' = downsample the fake pixel grid by integer stride so the
    longer side ≤ max_side; emits a new payload (same header format). Real
    implementation would call the codec; the distributed shape — payload in,
    payload out, bounded batches — is identical."""

    def _run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
        import pandas as pd

        for pdf in batches:
            ids, payloads = [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                payload = bytes(payload)
                w, h, _ = _decode_image_fake(payload)
                stride = max(1, -(-max(w, h) // max_side))  # ceil div
                nw, nh = max(1, w // stride), max(1, h // stride)
                body = payload[8:]
                resized = bytes(
                    body[(y * stride) * w + (x * stride)]
                    for y in range(nh)
                    for x in range(nw)
                )
                payloads.append(_MAGIC + struct.pack("<HH", nw, nh) + resized)
                ids.append(mid)
            yield pd.DataFrame({"media_id": ids, "payload": payloads})

    return df.select("media_id", "payload").mapInPandas(_run, RESIZE_SCHEMA)


def frame_sample(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame sampling contract: one output row per sampled frame
    (media_id, frame_idx, ts_ms, payload). The fake treats each height-row of
    the pixel grid as one 'frame' at 25 fps."""
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("frame_idx", T.IntegerType()),
            T.StructField("ts_ms", T.IntegerType()),
            T.StructField("payload", T.BinaryType()),
        ]
    )

    def _run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
        import pandas as pd

        frame_interval_ms = 40  # 25 fps
        step = max(1, every_ms // frame_interval_ms)
        for pdf in batches:
            rows = {"media_id": [], "frame_idx": [], "ts_ms": [], "payload": []}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                payload = bytes(payload)
                w, h, _ = _decode_image_fake(payload)
                body = payload[8:]
                for fi in range(0, h, step):
                    rows["media_id"].append(mid)
                    rows["frame_idx"].append(fi)
                    rows["ts_ms"].append(fi * frame_interval_ms)
                    rows["payload"].append(
                        _MAGIC + struct.pack("<HH", w, 1) + body[fi * w : (fi + 1) * w]
                    )
            yield pd.DataFrame(rows)

    return df.select("media_id", "payload").mapInPandas(_run, out_schema)
