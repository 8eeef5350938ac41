"""Raw-file ingestion source: directories of media/blob files as DataFrames.

The reference reads only structured formats (Parquet block streams,
DataStreams/ParquetBlockInputStream.cpp:24-38); a training-data pipeline also
ingests directories of raw images/audio/documents. Spark's built-in
``binaryFile`` format maps each file to one row (path, modificationTime,
length, content) with the content read lazily per task — files are NOT
shipped through the driver, and partition planning respects
``spark.sql.files.maxPartitionBytes``, so a 100 TB media lake parallelizes
like any other scan.

``read_binary_dir`` wraps that format with the engine's media-table contract
(operators/multimodal.py:MEDIA_SCHEMA): a deterministic ``media_id`` derived
from the file path (xxhash64 — stable across re-reads and engines), the
media_type inferred from the extension, and the payload as the opaque binary
column the decode/resize/frame-sample operators consume.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: extension → media_type for the common training-data modalities
EXT_MEDIA_TYPE: dict[str, str] = {
    "jpg": "image", "jpeg": "image", "png": "image", "webp": "image",
    "gif": "image", "bmp": "image",
    "wav": "audio", "mp3": "audio", "flac": "audio", "ogg": "audio",
    "mp4": "video", "webm": "video", "mkv": "video", "avi": "video",
}


#: (name, size, content_key) of the deterministic media-fixture files —
#: content is a fixed byte formula of (content_key, offset), so every engine
#: reading the directory sees bit-identical payloads. Entries sharing a
#: content_key are bit-identical duplicates (re-uploaded / re-crawled media,
#: possibly under a different extension) — the media_dedup_stats query's
#: subject matter.
_FIXTURE_FILES: list[tuple[str, int, int]] = [
    ("img_0.png", 512, 0),
    ("img_1.png", 1024, 1),
    ("img_2.jpg", 768, 2),
    ("aud_0.wav", 2048, 3),
    ("aud_1.mp3", 640, 4),
    ("vid_0.mp4", 4096, 5),
    ("doc_0.txt", 96, 6),
    ("doc_1.bin", 256, 7),
    ("img_0_dup.png", 512, 0),   # exact re-upload of img_0.png
    ("img_0_copy.jpg", 512, 0),  # same bytes under a different extension
    ("aud_0_dup.wav", 2048, 3),  # exact re-upload of aud_0.wav
]


def ensure_media_fixture(path: str = "/tmp/arrowhouse_media_fixture") -> str:
    """Materialize the deterministic media directory the
    ``binaryfile_ingest_stats`` oracle query reads (round-6 verdict #3:
    the binaryFile source needs a DuckDB-checkable proof, and DuckDB's
    ``read_blob`` must see the same bytes as Spark's binaryFile scan).
    Content is a pure function of (file index, byte offset) — no
    randomness, no timestamps — and files are rewritten only when absent
    or wrong, so repeated calls are idempotent and cheap. Returns the
    directory path."""
    import os

    os.makedirs(path, exist_ok=True)
    for name, size, key in _FIXTURE_FILES:
        payload = bytes((key * 41 + j * 13 + 7) % 256 for j in range(size))
        fp = os.path.join(path, name)
        try:
            with open(fp, "rb") as f:
                if f.read() == payload:
                    continue
        except OSError:
            pass
        with open(fp, "wb") as f:
            f.write(payload)
    return path


def read_binary_files(
    spark: SparkSession,
    path: str,
    glob: str | None = None,
    max_bytes: int | None = None,
) -> DataFrame:
    """Raw rows from Spark's binaryFile source: (path, modificationTime,
    length, content). ``glob`` filters file names (e.g. ``*.png``);
    ``max_bytes`` drops oversized files BEFORE content is materialized
    (the length filter is answered from file status, so a 10 GB stray
    video never enters an Arrow batch)."""
    reader = spark.read.format("binaryFile")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    df = reader.load(path)
    if max_bytes is not None:
        df = df.filter(F.col("length") <= max_bytes)
    return df


def read_binary_dir(
    spark: SparkSession,
    path: str,
    glob: str | None = None,
    max_bytes: int | None = None,
) -> DataFrame:
    """A media-table view of a raw file directory: (media_id, media_type,
    payload, path, length) — ``media_id`` is xxhash64 of the path (stable,
    engine-independent), ``media_type`` from EXT_MEDIA_TYPE ('binary' for
    unknown extensions). Feed straight into the multimodal operators."""
    raw = read_binary_files(spark, path, glob, max_bytes)
    ext = F.lower(F.regexp_extract(F.col("path"), r"\.([A-Za-z0-9]+)$", 1))
    mtype = F.lit("binary")
    # build the CASE chain from the literal map (deterministic order)
    mapping = F.create_map(
        *[F.lit(x) for kv in sorted(EXT_MEDIA_TYPE.items()) for x in kv]
    )
    mtype = F.coalesce(mapping[ext], F.lit("binary"))
    return raw.select(
        F.xxhash64("path").alias("media_id"),
        mtype.alias("media_type"),
        F.col("content").alias("payload"),
        "path",
        "length",
    )
