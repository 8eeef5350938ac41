"""Multimodal plumbing tests: binary payload columns through mapInPandas
decode/resize/frame-sample with the deterministic fake codec."""

from __future__ import annotations

import pytest

from arrowhouse_spark.operators.multimodal import (
    DECODE_SCHEMA,
    MEDIA_SCHEMA,
    decode_images,
    frame_sample,
    make_fake_payload,
    resize_images,
)


@pytest.fixture(scope="module")
def media(spark):
    rows = [
        (1, "image", make_fake_payload(8, 6, seed=1), (8, 6, None, None)),
        (2, "image", make_fake_payload(16, 4, seed=2), (16, 4, None, None)),
        (3, "video", make_fake_payload(4, 100, seed=3), (4, 100, 4000, None)),
    ]
    return spark.createDataFrame(rows, MEDIA_SCHEMA).repartition(2)


def test_decode_images(media):
    out = {r.media_id: r for r in decode_images(media).collect()}
    assert out[1].width == 8 and out[1].height == 6
    assert out[2].width == 16 and out[2].height == 4
    # deterministic fake: mean pixel reproducible driver-side
    exp = sum(((x * 31 + 1) % 251) for x in range(48)) / 48
    assert abs(out[1].mean_pixel - exp) < 1e-9


def test_decode_real_codec_stubbed(media):
    """Contract test for the real-codec seam so it can't silently rot: the
    plan (schema) is identical to the fake-codec path, and execution fails
    with the pinned NotImplementedError message."""
    out = decode_images(media, use_real_codec=True)
    assert out.schema == DECODE_SCHEMA
    with pytest.raises(Exception, match="image codec libraries not installed"):
        out.collect()


def test_resize_images(media):
    resized = resize_images(media, max_side=4)
    dec = {r.media_id: r for r in decode_images(resized).collect()}
    assert dec[1].width <= 4 and dec[1].height <= 4
    assert dec[2].width <= 4 and dec[2].height <= 4


def test_frame_sample(media):
    frames = frame_sample(media.filter("media_type = 'video'"), every_ms=1000).collect()
    # 100 'frames' at 25fps sampled every 1000ms → step 25 → frames 0,25,50,75
    assert [f.frame_idx for f in sorted(frames, key=lambda r: r.frame_idx)] == [0, 25, 50, 75]
    assert all(f.ts_ms == f.frame_idx * 40 for f in frames)


def _pil_available() -> bool:
    try:
        import PIL  # noqa: F401

        return True
    except ImportError:
        return False


def test_decode_schema_pinned():
    """Every schema the decode/resize/frame-sample contract exposes, pinned
    field-by-field so drift in names/types/nullability is a test failure,
    not a silent downstream break."""
    from arrowhouse_spark.operators.multimodal import RESIZE_SCHEMA

    assert [(f.name, f.dataType.simpleString()) for f in DECODE_SCHEMA.fields] == [
        ("media_id", "bigint"),
        ("width", "int"),
        ("height", "int"),
        ("mean_pixel", "double"),
    ]
    assert [(f.name, f.dataType.simpleString()) for f in RESIZE_SCHEMA.fields] == [
        ("media_id", "bigint"),
        ("payload", "binary"),
    ]
    assert [(f.name, f.dataType.simpleString(), f.nullable) for f in MEDIA_SCHEMA.fields] == [
        ("media_id", "bigint", False),
        ("media_type", "string", False),
        ("payload", "binary", False),
        ("meta", "struct<width:int,height:int,duration_ms:int,sample_rate:int>", True),
    ]


@pytest.mark.skipif(_pil_available(), reason="codec present: stub surface n/a")
def test_real_codec_error_surface_pinned():
    """Without pillow, formats outside the built-in decoders (PNG and
    baseline-gray JPEG) must raise NotImplementedError with the EXACT
    pinned message; a PNG-magic payload with no chunks is a malformed
    PNG and a truncated JPEG a malformed JPEG — loud codec errors, not
    a missing-codec message."""
    from arrowhouse_spark.operators.multimodal import (
        IMAGE_CODEC_UNAVAILABLE_MSG,
        _decode_image_real,
    )

    with pytest.raises(NotImplementedError) as ei:
        _decode_image_real(b"RIFF\x00\x00\x00\x00WEBPVP8 ")  # WebP magic
    assert str(ei.value) == IMAGE_CODEC_UNAVAILABLE_MSG
    with pytest.raises(ValueError, match="missing IHDR"):
        _decode_image_real(b"\x89PNG\r\n\x1a\n")
    with pytest.raises(ValueError, match="truncated"):
        _decode_image_real(b"\xff\xd8\xff\xe0\x00\x10JFIF")  # JPEG magic


def test_real_codec_decodes_png_pure_stdlib(spark):
    """The real-codec path decodes ACTUAL spec-conformant PNG bytes in this
    container — gray, RGB, and RGBA — through the same distributed
    mapInPandas plumbing, with the exact classic ITU-R 601-2 integer-luma
    means (PNG always uses this decoder — never pillow, whose rounded
    fixed-point luma differs — so results are environment-independent)."""
    from arrowhouse_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        make_png_payload,
    )

    def exp_mean(w, h, seed, ctype):
        ch = {0: 1, 2: 3, 6: 4}[ctype]
        tot = 0
        for y in range(h):
            line = [((x * 31 + y * 57 + seed) % 251) for x in range(w * ch)]
            if ctype == 0:
                tot += sum(line)
            else:
                for i in range(0, w * ch, ch):
                    tot += (
                        line[i] * 299 + line[i + 1] * 587 + line[i + 2] * 114
                    ) // 1000
        return tot / (w * h)

    rows = [
        (1, "image", make_png_payload(8, 6, seed=1, color_type=0), (8, 6, None, None)),
        (2, "image", make_png_payload(5, 9, seed=2, color_type=2), (5, 9, None, None)),
        (3, "image", make_png_payload(7, 3, seed=3, color_type=6), (7, 3, None, None)),
    ]
    df = spark.createDataFrame(rows, MEDIA_SCHEMA)
    got = {r.media_id: r for r in decode_images(df, use_real_codec=True).collect()}
    assert (got[1].width, got[1].height) == (8, 6)
    assert (got[2].width, got[2].height) == (5, 9)
    assert (got[3].width, got[3].height) == (7, 3)
    for mid, (w, h, seed, ct) in {1: (8, 6, 1, 0), 2: (5, 9, 2, 2), 3: (7, 3, 3, 6)}.items():
        assert abs(got[mid].mean_pixel - exp_mean(w, h, seed, ct)) < 1e-9


def test_png_pure_decoder_all_filter_types():
    """Scanline unfiltering for every PNG filter (None/Sub/Up/Average/
    Paeth): FORWARD-filter known grayscale pixels per the W3C spec, wrap
    them in a valid PNG, and require the decoder to recover the exact
    mean of the original pixels."""
    import struct as _struct
    import zlib

    from arrowhouse_spark.operators.multimodal import _decode_png_pure

    w, h = 6, 5
    pix = [[(x * 7 + y * 13 + 3) % 256 for x in range(w)] for y in range(h)]

    def paeth(a, b, c):
        p = a + b - c
        pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
        return a if pa <= pb and pa <= pc else (b if pb <= pc else c)

    raw = bytearray()
    for y, ftype in enumerate([0, 1, 2, 3, 4]):
        raw.append(ftype)
        prev = pix[y - 1] if y > 0 else [0] * w
        for x in range(w):
            cur = pix[y][x]
            a = pix[y][x - 1] if x > 0 else 0
            b = prev[x]
            c = prev[x - 1] if x > 0 else 0
            if ftype == 0:
                f = cur
            elif ftype == 1:
                f = cur - a
            elif ftype == 2:
                f = cur - b
            elif ftype == 3:
                f = cur - (a + b) // 2
            else:
                f = cur - paeth(a, b, c)
            raw.append(f & 0xFF)

    def chunk(tag, body):
        return (
            _struct.pack(">I", len(body)) + tag + body
            + _struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
        )

    png = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", _struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )
    dw, dh, mean = _decode_png_pure(png)
    exp = sum(sum(r) for r in pix) / (w * h)
    assert (dw, dh) == (w, h) and abs(mean - exp) < 1e-9
    # unsupported sub-byte depths fall to the stable codec-unavailable
    # seam (16-bit and Adam7 decode natively as of round 12)
    bad = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", _struct.pack(">IIBBBBB", 2, 2, 4, 0, 0, 0, 0))
    )
    with pytest.raises(NotImplementedError):
        _decode_png_pure(bad)


@pytest.mark.skipif(not _pil_available(), reason="pillow not installed")
def test_real_codec_decodes_png(spark):
    """With pillow present, PNG must STILL decode via the built-in pure
    decoder (pillow's convert('L') luma differs bit-wise; PNG never
    routes through it) — a grayscale PNG authored BY pillow decodes to
    the same values either way, pinning the routing."""
    from io import BytesIO

    from PIL import Image

    from arrowhouse_spark.operators.multimodal import MEDIA_SCHEMA

    img = Image.new("L", (8, 6))
    img.putdata([(x * 31 + 1) % 251 for x in range(48)])
    buf = BytesIO()
    img.save(buf, format="PNG")
    rows = [(1, "image", buf.getvalue(), (8, 6, None, None))]
    df = spark.createDataFrame(rows, MEDIA_SCHEMA)
    [r] = decode_images(df, use_real_codec=True).collect()
    exp = sum((x * 31 + 1) % 251 for x in range(48)) / 48
    assert (r.width, r.height) == (8, 6) and abs(r.mean_pixel - exp) < 1e-9


def test_binaryfile_source_to_media_table(spark, tmp_path):
    """Directory-of-raw-files ingestion: binaryFile rows become the media
    table the multimodal operators consume — stable path-hash ids, extension
    media types, length filter answered from file status, glob filter."""
    from arrowhouse_spark.operators.multimodal import decode_images, make_fake_payload
    from arrowhouse_spark.sources import read_binary_dir, read_binary_files

    d = tmp_path / "media"
    d.mkdir()
    (d / "a.png").write_bytes(make_fake_payload(8, 6, seed=1))
    (d / "b.jpg").write_bytes(make_fake_payload(4, 4, seed=2))
    (d / "c.wav").write_bytes(b"\x00" * 64)
    (d / "d.xyz").write_bytes(b"?" * 2000)

    media = read_binary_dir(spark, str(d))
    rows = {r.path.rsplit("/", 1)[-1]: r for r in media.collect()}
    assert rows["a.png"].media_type == "image"
    assert rows["b.jpg"].media_type == "image"
    assert rows["c.wav"].media_type == "audio"
    assert rows["d.xyz"].media_type == "binary"
    assert len({r.media_id for r in rows.values()}) == 4  # distinct stable ids
    assert rows["c.wav"].length == 64

    # the media table feeds the decode operator directly
    imgs = media.filter(media.media_type == "image").select("media_id", "payload")
    decoded = {r.media_id: (r.width, r.height) for r in decode_images(imgs).collect()}
    assert sorted(decoded.values()) == [(4, 4), (8, 6)]

    # max_bytes: status-level filter, glob: name filter
    assert read_binary_files(spark, str(d), max_bytes=100).count() == 3
    assert read_binary_files(spark, str(d), glob="*.png").count() == 1


def test_dhash64_matches_brute_model_and_flags_neardups(spark):
    """dhash64 vs an independent per-pixel model (explicit block loops,
    no numpy indexing tricks); a sparsely-perturbed image stays within a
    small hamming of its anchor while an unrelated image does not; the
    banded pair join surfaces exactly the near pair."""
    import numpy as np

    from arrowhouse_spark.operators.multimodal import (
        dhash64,
        dhash_neardup_pairs,
        encode_png_gray,
        image_dhash,
    )

    def model(g):
        h, w = g.shape
        sums = [[0] * 9 for _ in range(8)]
        cnts = [[0] * 9 for _ in range(8)]
        for y in range(h):
            for x in range(w):
                sums[y * 8 // h][x * 9 // w] += int(g[y, x])
                cnts[y * 8 // h][x * 9 // w] += 1
        m = [[sums[r][c] // cnts[r][c] for c in range(9)] for r in range(8)]
        v = 0
        for r in range(8):
            for c in range(8):
                if m[r][c] > m[r][c + 1]:
                    k = r * 8 + c
                    v += (1 << k) if k < 63 else -(1 << 63)
        return v

    rng = np.random.RandomState(7)
    for w, h in [(9, 8), (12, 10), (15, 12), (64, 48)]:
        g = rng.randint(0, 256, size=(h, w)).astype(np.uint8)
        assert dhash64(g) == model(g)

    base = rng.randint(0, 256, size=(24, 36)).astype(np.uint8)
    near = base.copy()
    near[::5, ::7] = np.minimum(near[::5, ::7].astype(int) + 2, 255).astype(np.uint8)
    other = rng.randint(0, 256, size=(24, 36)).astype(np.uint8)
    hb, hn, ho = dhash64(base), dhash64(near), dhash64(other)
    ham = lambda a, b: bin((a ^ b) & ((1 << 64) - 1)).count("1")  # noqa: E731
    assert ham(hb, hn) <= 6 < ham(hb, ho)

    rows = [
        (1, "image", encode_png_gray(base), (36, 24, None, None)),
        (2, "image", encode_png_gray(near), (36, 24, None, None)),
        (3, "image", encode_png_gray(other), (36, 24, None, None)),
    ]
    from arrowhouse_spark.operators.multimodal import MEDIA_SCHEMA

    df = spark.createDataFrame(rows, MEDIA_SCHEMA)
    hashed = image_dhash(df)
    got = {r.media_id: r.dhash for r in hashed.collect()}
    assert got == {1: hb, 2: hn, 3: ho}  # real PNG round-trip preserved
    pairs = dhash_neardup_pairs(hashed, max_hamming=6).collect()
    assert [(r.id_a, r.id_b) for r in pairs] == [(1, 2)]

    with pytest.raises(ValueError, match="h >= 8"):
        dhash64(np.zeros((4, 20), dtype=np.uint8))


def test_decode_audio_real_wav_roundtrip(spark):
    """Stdlib RIFF/WAVE round-trip: known PCM16 samples encode, decode
    distributed, and the exact integer features (duration DIV, energy,
    peak) match a driver-side model; non-PCM16 payloads raise."""
    import numpy as np

    from arrowhouse_spark.operators.multimodal import (
        decode_audio,
        make_wav_payload,
    )

    rows = []
    exp = {}
    for mid, (n, sr, seed) in {1: (800, 8000, 3), 2: (1200, 16000, 7)}.items():
        rows.append((mid, make_wav_payload(n, sr, seed=seed)))
        i = np.arange(n, dtype=np.int64)
        s = ((i * i * 7 + i * 13 + seed * 101) % 65536) - 32768
        exp[mid] = (sr, n, n * 1000 // sr, int((s * s).sum()), int(np.abs(s).max()))
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    got = {
        r.media_id: (r.sample_rate, r.n_samples, r.duration_ms, r.sum_sq, r.peak)
        for r in decode_audio(df).collect()
    }
    assert got == exp

    # stereo decodes via the documented floor-div downmix (round-11
    # verdict #4): features equal the driver-side model over
    # floor((ch0 + ch1) / 2), negatives rounding toward -inf
    n2, sr2, seed2 = 600, 8000, 5
    st = spark.createDataFrame(
        [(3, make_wav_payload(n2, sr2, seed=seed2, n_channels=2))],
        "media_id long, payload binary",
    )
    i = np.arange(n2, dtype=np.int64)
    chans = [
        ((i * i * 7 + i * 13 + c * 29 + seed2 * 101) % 65536) - 32768
        for c in (0, 1)
    ]
    mono = (chans[0] + chans[1]) // 2
    r = decode_audio(st).collect()[0]
    assert (r.sample_rate, r.n_samples, r.duration_ms) == (
        sr2,
        n2,
        n2 * 1000 // sr2,
    )
    assert r.sum_sq == int((mono * mono).sum())
    assert r.peak == int(np.abs(mono).max())

    # encodings outside the decoded set (here: MP3-in-WAV, tag 0x55 —
    # float and IMA/MS ADPCM decode built-in since round 13) keep wave's
    # stable unknown-format rejection — the remaining compressed seam
    import io
    import struct
    import wave

    fmt = struct.pack("<HHIIHH", 0x55, 1, 8000, 32000, 4, 0)  # MP3 tag 0x55
    data = b"\x00" * 32
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    payload = b"RIFF" + struct.pack("<I", len(body)) + body
    bad = spark.createDataFrame([(9, payload)], "media_id long, payload binary")
    with pytest.raises(Exception, match="(?i)unknown format|PCM"):
        decode_audio(bad).collect()


def test_decode_audio_all_pcm_widths(spark):
    """Round-12 verdict #5: 8-bit (unsigned, recentred), 24-bit (3-byte
    packed, sign-extended) and 32-bit PCM all decode built-in, mono and
    multi-channel, with features equal to the closed-form sample model at
    each width's scale. A wrong sign-extension or an unsigned-8 misread
    flips sum_sq/peak immediately (the formula spans both signs)."""
    import numpy as np

    from arrowhouse_spark.operators.multimodal import (
        _wav_read_mono,
        decode_audio,
        make_wav_payload,
    )

    rows, exp = [], {}
    mid = 0
    for width in (1, 3, 4):
        for ch in (1, 2):
            mid += 1
            n, sr, seed = 400 + 10 * mid, 8000, mid
            rows.append(
                (mid, make_wav_payload(n, sr, seed=seed, n_channels=ch, sampwidth=width))
            )
            full = 1 << (8 * width)
            i = np.arange(n, dtype=np.int64)[:, None]
            c = np.arange(ch, dtype=np.int64)[None, :]
            s = ((i * i * 7 + i * 13 + c * 29 + seed * 101) % full) - full // 2
            mono = s.sum(axis=1) // ch
            exp[mid] = (
                sr,
                n,
                n * 1000 // sr,
                # arbitrary-precision model with the documented INT64_MAX
                # saturation: numpy int64 wraps on the 32-bit width's Σs²
                # — the engine's hi/lo split does not, and the BIGINT
                # emission pins at 2^63−1 when the true sum escapes int64
                min(sum(int(v) * int(v) for v in mono), 2**63 - 1),
                int(np.abs(mono).max()),
            )
            # the shared reader agrees with the model directly too
            _, _, got_s = _wav_read_mono(rows[-1][1])
            assert np.array_equal(got_s, mono)
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    got = {
        r.media_id: (r.sample_rate, r.n_samples, r.duration_ms, r.sum_sq, r.peak)
        for r in decode_audio(df).collect()
    }
    assert got == exp


def test_decode_audio_32bit_energy_no_int64_wrap(spark):
    """Review regression: Σs² for 32-bit PCM escapes int64 after a
    handful of full-scale samples — four samples at 2^31−1 plus one at
    INT32_MIN must SATURATE sum_sq at INT64_MAX (the documented BIGINT
    emission policy — the round-13 DECIMAL(38,0) emission failed the
    driver's value hash and was reverted) and yield peak 2^31 (one past
    int32, hence BIGINT), never a silently wrapped negative int64 /
    overflowed int32."""
    import io
    import struct
    import wave

    from arrowhouse_spark.operators.multimodal import decode_audio

    samples = [2**31 - 1] * 4 + [-(2**31)]
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(4)
        w.setframerate(8000)
        w.writeframes(struct.pack("<5i", *samples))
    df = spark.createDataFrame([(1, buf.getvalue())], "media_id long, payload binary")
    r = decode_audio(df).collect()[0]
    true_energy = sum(s * s for s in samples)
    assert true_energy > 2**63  # the case int64 cannot hold
    assert r.sum_sq == 2**63 - 1  # saturated, NOT wrapped negative
    assert r.sum_sq > 0
    assert r.peak == 2**31


def test_float_wav_decode_matches_quantization_model():
    """IEEE-float WAV (tag 3, and EXTENSIBLE-wrapped) decodes by
    quantizing onto the PCM16 grid: clip(rint(f*32768), ±full-scale).
    The fixture stores k/256 floats, so the decode must equal k*128
    exactly at both widths, wrapped or not, mono and stereo (floor-div
    downmix AFTER per-channel quantization)."""
    import numpy as np

    from arrowhouse_spark.operators.multimodal import (
        _wav_read_mono,
        make_float_wav_payload,
    )

    for bits in (32, 64):
        for ext in (False, True):
            for ch in (1, 2):
                n, seed = 123, 5
                p = make_float_wav_payload(
                    n, 16000, seed=seed, n_channels=ch, bits=bits,
                    extensible=ext,
                )
                sr, nf, s = _wav_read_mono(p)
                i = np.arange(n, dtype=np.int64)[:, None]
                c = np.arange(ch, dtype=np.int64)[None, :]
                k = (i * i * 7 + i * 13 + c * 29 + seed * 101) % 512 - 256
                mono = (k * 128).sum(axis=1) // ch
                assert (sr, nf) == (16000, n)
                assert np.array_equal(s, mono), (bits, ext, ch)


def test_float_wav_out_of_range_clips_to_full_scale():
    """Floats outside [-1, 1] clip to full scale instead of wrapping —
    real float masters carry inter-sample overs."""
    import struct

    import numpy as np

    from arrowhouse_spark.operators.multimodal import (
        _KS_GUID_TAIL,
        _riff_wrap,
        _wav_read_mono,
    )

    f = np.array([1.5, -2.0, 0.25, -1.0], dtype="<f4")
    fmt = struct.pack("<HHIIHHH", 3, 1, 8000, 32000, 4, 32, 0)
    sr, n, s = _wav_read_mono(_riff_wrap(fmt, f.tobytes(), 4))
    assert list(s) == [32767, -32768, 8192, -32768]
    assert _KS_GUID_TAIL[0:2] == b"\x00\x00"  # tail constant sanity
    # NaN is corruption, not clippable signal: its int64 cast is
    # platform-defined (INT64_MIN on x86, 0 on ARM) — must fail loudly
    bad = np.array([0.5, float("nan")], dtype="<f4")
    with pytest.raises(ValueError, match="non-finite"):
        _wav_read_mono(_riff_wrap(fmt, bad.tobytes(), 2))


def test_extensible_wrapped_pcm_unwraps_to_plain_decode():
    """WAVE_FORMAT_EXTENSIBLE (tag 0xFFFE) wrapping integer PCM — the
    modern container for >16-bit masters — must decode identically to
    the plain tag-1 file with the same frames; a wrong GUID tail is
    refused (wave's unknown-format error surfaces)."""
    import struct

    import numpy as np
    import pytest
    import wave as _wave

    from arrowhouse_spark.operators.multimodal import (
        _KS_GUID_TAIL,
        _riff_wrap,
        _wav_read_mono,
        make_wav_payload,
    )

    n, seed, width, ch = 200, 9, 3, 2
    plain = make_wav_payload(n, 16000, seed=seed, n_channels=ch, sampwidth=width)
    _, _, want = _wav_read_mono(plain)
    # re-wrap the same frames under an EXTENSIBLE fmt
    import io

    with _wave.open(io.BytesIO(plain), "rb") as w:
        frames = w.readframes(n)
    base = struct.pack(
        "<HHIIHH", 0xFFFE, ch, 16000, 16000 * ch * width, ch * width,
        8 * width,
    )
    fmt = base + struct.pack("<HHI", 22, 8 * width, 0) + (
        struct.pack("<H", 1) + _KS_GUID_TAIL
    )
    sr, nf, got = _wav_read_mono(_riff_wrap(fmt, frames, n))
    assert (sr, nf) == (16000, n)
    assert np.array_equal(got, want)
    # corrupt GUID tail -> not ours -> wave's stable error re-raised
    bad = fmt[:28] + b"\xde\xad" + fmt[30:]
    with pytest.raises(_wave.Error):
        _wav_read_mono(_riff_wrap(bad, frames, n))


def test_ima_adpcm_decode_bit_exact_vs_audioop_and_fact_trim():
    """Mono IMA ADPCM (tag 0x11) decodes via the published DVI
    recursion — pinned BIT-EXACT against stdlib audioop's Intel/DVI
    implementation per block (audioop packs HIGH nibble first, WAV low
    first, and audioop does not emit the header seed sample — the test
    repacks and prepends accordingly). The fact chunk trims the
    zero-padded final block, so n_samples NOT a multiple of
    samples-per-block round-trips exactly."""
    import math

    import numpy as np

    audioop = pytest.importorskip("audioop")

    from arrowhouse_spark.operators.multimodal import (
        _wav_read_mono,
        make_ima_adpcm_wav_payload,
    )

    spb = 17
    for seed, n in ((0, 100), (3, 85), (11, 170), (29, 35)):
        p = make_ima_adpcm_wav_payload(n, seed=seed)
        sr, nf, s = _wav_read_mono(p)
        assert (sr, nf, len(s)) == (8000, n, n)
        ref = []
        for b in range(math.ceil(n / spb)):
            pred = (seed * 101 + b * 17) % 65536 - 32768
            idx = (seed + b * 7) % 89
            nibs = [
                ((i * i * 3 + i * 7 + seed * 13) % 16 if i < n else 0)
                for i in (b * spb + j for j in range(1, spb))
            ]
            packed = bytes(
                (first << 4) | second
                for first, second in zip(nibs[0::2], nibs[1::2])
            )
            lin, _ = audioop.adpcm2lin(packed, 2, (pred, idx))
            ref.append(pred)
            ref.extend(np.frombuffer(lin, dtype="<i2").astype(np.int64))
        assert np.array_equal(s, np.array(ref[:n]))


def test_ima_adpcm_guards_are_loud():
    """Multi-channel ADPCM raises the stable NotImplementedError seam;
    a data chunk that is not a whole number of blocks and an
    inconsistent geometry each fail loudly."""
    import struct

    import pytest as _pytest

    from arrowhouse_spark.operators.multimodal import (
        _ima_adpcm_expand,
        _riff_wrap,
        _wav_read_mono,
        make_ima_adpcm_wav_payload,
    )

    p = make_ima_adpcm_wav_payload(50, seed=1)
    # flip the channel count in the fmt chunk (offset: RIFF12+8 + 2)
    stereo = p[:22] + struct.pack("<H", 2) + p[24:]
    with _pytest.raises(NotImplementedError, match="multi-channel IMA"):
        _wav_read_mono(stereo)
    with _pytest.raises(ValueError, match="whole number of blocks"):
        _ima_adpcm_expand(b"\x00" * 13, 12, 17)
    with _pytest.raises(ValueError, match="geometry"):
        _ima_adpcm_expand(b"\x00" * 12, 12, 99)
    # corrupt header step index (> 88) fails loudly, like the MS path's
    # predictor index — never a silent clamp into plausible garbage
    with _pytest.raises(ValueError, match="step index"):
        _ima_adpcm_expand(b"\x00\x00\x59\x00" + b"\x00" * 8, 12, 17)


def test_avi_audio_stream_decodes_via_wav_dispatch():
    """The container seam composes with the complete WAV tag dispatch:
    an AVI's 'auds' stream (strf IS a WAVEFORMATEX) extracted and
    decoded must equal the standalone WAV decode of the same fixture
    stream — for PCM16 and mu-law via the builder, and for IMA ADPCM by
    splicing a real ADPCM WAV's fmt/data into the container (chunk
    boundaries mid-block exercise the concatenation path; the fact trim
    rides the strh dwLength). The video leg keeps decoding with a
    second stream present; an AVI without audio fails loudly."""
    import struct as _struct

    import numpy as np

    from arrowhouse_spark.operators.multimodal import (
        _build_avi_container,
        _decode_avi_gray_frames,
        _extract_avi_audio,
        _wav_read_mono,
        make_avi_audio_payload,
        make_avi_payload,
        make_g711_wav_payload,
        make_ima_adpcm_wav_payload,
        make_wav_payload,
    )

    for codec, mk in (
        ("pcm16", lambda n, sr, sd: make_wav_payload(n, sr, seed=sd)),
        ("mulaw", lambda n, sr, sd: make_g711_wav_payload(n, sr, seed=sd, law="mu")),
    ):
        for n, seed in ((333, 4), (7, 9)):
            p = make_avi_audio_payload(n, 8000, seed=seed, codec=codec)
            assert _extract_avi_audio(p)[2].tolist() == _wav_read_mono(
                mk(n, 8000, seed)
            )[2].tolist(), (codec, n)
            us, w, h, grays = _decode_avi_gray_frames(p)
            assert (w, h, len(grays)) == (8, 8, 2)

    # IMA ADPCM through the container: rip fmt/data from a real ADPCM
    # WAV, split the block stream at a NON-block boundary, re-wrap as AVI
    n, seed = 85, 3
    wav = make_ima_adpcm_wav_payload(n, seed=seed)
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(wav):
        tag = wav[pos : pos + 4]
        (ln,) = _struct.unpack("<I", wav[pos + 4 : pos + 8])
        if tag == b"fmt ":
            fmt = wav[pos + 8 : pos + 8 + ln]
        elif tag == b"data":
            data = wav[pos + 8 : pos + 8 + ln]
        pos += 8 + ln + (ln & 1)
    chunks = [data[:7], data[7:30], data[30:]]  # mid-block splits
    avi = _build_avi_container(
        8, 8, 40000, [b"\x00" * (28 * 8)], handler=b"DIB ", bitcount=24,
        compression=0, frame_tag=b"00db", audio=(fmt, chunks, n),
    )
    got = _extract_avi_audio(avi)
    want = _wav_read_mono(wav)
    assert got[0] == want[0] and got[1] == want[1] == n
    assert np.array_equal(got[2], want[2])

    with pytest.raises(ValueError, match="no audio"):
        _extract_avi_audio(make_avi_payload(8, 8, 2))


def test_ms_adpcm_decode_matches_spec_replay_and_guards():
    """Mono MS ADPCM (tag 2) decodes via the published Microsoft
    recursion — an INDEPENDENT sample-by-sample replay of the spec
    pseudocode (trunc(base/256) C-division, signed-nibble delta taps,
    int16 clamp, adaptation table with the delta>=16 floor, seed
    samples emitted older-first) must match the engine bit-exactly,
    including the fact-chunk trim of the padded final block. Stereo and
    bad geometry fail loudly."""
    import struct as _struct

    import numpy as np

    from arrowhouse_spark.operators.multimodal import (
        _MS_ADAPT,
        _MS_COEF,
        _ms_adpcm_expand,
        _wav_read_mono,
        make_ms_adpcm_wav_payload,
    )

    def ref(n, seed, ba=16):
        import math

        spb = (ba - 7) * 2 + 2
        out = []
        for b in range(math.ceil(n / spb)):
            c1, c2 = _MS_COEF[(seed + b) % 7]
            delta = 16 + (seed * 7 + b * 11) % 240
            s1 = (seed * 101 + b * 17) % 65536 - 32768
            s2 = (seed * 59 + b * 23) % 65536 - 32768
            out += [s2, s1]
            for j in range(2, spb):
                i = b * spb + j
                nib = (i * i * 3 + i * 7 + seed * 13) % 16 if i < n else 0
                signed = nib - 16 if nib >= 8 else nib
                base = s1 * c1 + s2 * c2
                base = -((-base) // 256) if base < 0 else base // 256
                pred = max(-32768, min(32767, base + signed * delta))
                s2, s1 = s1, pred
                delta = max(16, (_MS_ADAPT[nib] * delta) >> 8)
                out.append(pred)
        return np.array(out[:n], dtype=np.int64)

    for seed, n in ((0, 100), (3, 77), (11, 200), (29, 30)):
        p = make_ms_adpcm_wav_payload(n, seed=seed)
        sr, nf, s = _wav_read_mono(p)
        assert (sr, nf, len(s)) == (8000, n, n)
        assert np.array_equal(s, ref(n, seed)), seed

    stereo = p[:22] + _struct.pack("<H", 2) + p[24:]
    with pytest.raises(NotImplementedError, match="multi-channel MS"):
        _wav_read_mono(stereo)
    with pytest.raises(ValueError, match="whole number of blocks"):
        _ms_adpcm_expand(b"\x00" * 17, 16, 20)
    with pytest.raises(ValueError, match="predictor index"):
        _ms_adpcm_expand(b"\x09" + b"\x00" * 15, 16, 20)


@pytest.mark.skipif(_pil_available(), reason="codec present")
def test_image_dhash_non_png_hits_codec_seam():
    """image_dhash routes through the real-codec seam: payloads outside
    the built-in decoders (here: a CMYK-ish 4-component JPEG; gray AND
    color YCbCr JPEG now decode built-in) without pillow raise the
    stable unavailable-codec message, a WebP-ish unknown format
    likewise, and corrupt JPEG bytes fail loudly through the codec's
    own error instead."""
    import numpy as np

    from arrowhouse_spark.operators.jpeg import encode_jpeg_gray
    from arrowhouse_spark.operators.multimodal import (
        IMAGE_CODEC_UNAVAILABLE_MSG,
        _decode_image_gray_real,
    )

    p = encode_jpeg_gray(np.full((8, 8), 7, dtype=np.uint8))
    i = p.find(b"\xff\xc0")
    cmyk = p[: i + 9] + b"\x04" + p[i + 10 :]
    with pytest.raises(NotImplementedError) as ei:
        _decode_image_gray_real(cmyk)
    assert str(ei.value) == IMAGE_CODEC_UNAVAILABLE_MSG
    with pytest.raises(NotImplementedError) as ei:
        _decode_image_gray_real(b"RIFF\x00\x00\x00\x00WEBPVP8 ")
    assert str(ei.value) == IMAGE_CODEC_UNAVAILABLE_MSG
    with pytest.raises(ValueError, match="truncated"):
        _decode_image_gray_real(b"\xff\xd8\xff\xe0\x00\x10JFIF")


def test_image_seam_decodes_gray_jpeg_builtin(spark):
    """Baseline-gray JPEG images decode through the image seam with NO
    external library: decode_images(use_real_codec=True) features match
    the flat-block formula exactly (the bit-exact regime), and the gray
    grid composes with dhash64 like any PNG."""
    import numpy as np

    from arrowhouse_spark.operators.jpeg import encode_jpeg_gray
    from arrowhouse_spark.operators.multimodal import (
        _decode_image_gray_real,
        decode_images,
        dhash64,
    )

    rows, exp = [], {}
    for mid in (1, 2, 3):
        bw, bh = 2 + mid % 3, 1 + mid % 2
        vals = (np.arange(bw)[None, :] * 37 + np.arange(bh)[:, None] * 53 + mid) % 256
        img = np.kron(vals, np.ones((8, 8), dtype=int)).astype(np.uint8)
        rows.append((mid, encode_jpeg_gray(img)))
        exp[mid] = (bw * 8, bh * 8, int(vals.sum()) * 64)
        # grid-level: seam output is the exact pixel grid
        assert np.array_equal(_decode_image_gray_real(rows[-1][1]), img)
        assert isinstance(dhash64(img), int)
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    got = {
        r.media_id: (
            r.width,
            r.height,
            round(r.mean_pixel * r.width * r.height),
        )
        for r in decode_images(df, use_real_codec=True).collect()
    }
    assert got == exp


def test_dhash_incremental_store_and_batch_rules(spark):
    """Cross-store drop (near the historical anchor), within-batch greedy
    keep-first (lower id wins), unrelated survivor passes; surviving
    index rows appended to the store drop a replayed batch entirely."""
    import numpy as np

    from arrowhouse_spark.operators.multimodal import (
        dhash64,
        dhash_band_index,
        dhash_incremental,
    )

    rng = np.random.RandomState(3)
    anchor = rng.randint(0, 256, size=(16, 24)).astype(np.uint8)
    near = anchor.copy()
    near[::6, ::8] = np.minimum(near[::6, ::8].astype(int) + 2, 255).astype(np.uint8)
    twin_a = rng.randint(0, 256, size=(16, 24)).astype(np.uint8)
    other = rng.randint(0, 256, size=(16, 24)).astype(np.uint8)

    store_hashes = spark.createDataFrame(
        [(1, dhash64(anchor))], "media_id long, dhash long"
    )
    store_idx = dhash_band_index(store_hashes)
    batch = spark.createDataFrame(
        [
            (10, dhash64(near)),     # drops vs store anchor
            (11, dhash64(twin_a)),   # survives (lower id of the twin pair)
            (12, dhash64(twin_a)),   # drops vs batch-mate 11
            (13, dhash64(other)),    # survives
        ],
        "media_id long, dhash long",
    )
    surv = dhash_incremental(batch, store_idx, max_hamming=6)
    assert sorted({r.media_id for r in surv.collect()}) == [11, 13]

    # advance the store with the survivors: a replayed batch fully drops
    new_store = store_idx.unionByName(surv)
    again = dhash_incremental(batch, new_store, max_hamming=6)
    assert again.count() == 0


def test_png_unfilter_c_kernel_bitexact_vs_pure_loop():
    """The ctypes Average/Paeth kernel must reproduce the pure per-byte
    loop BIT-EXACT on adversarial random scanlines for every bpp the
    decoder supports (gray 1, gray+alpha 2, RGB 3, RGBA 4); skipped only
    where no C compiler exists (the decoder then uses the pure loop)."""
    import numpy as np
    import pytest

    from arrowhouse_spark.operators.multimodal import (
        _get_unfilter_lib,
        _unfilter_py,
    )

    lib = _get_unfilter_lib()
    if lib is None:
        pytest.skip("no C compiler available; pure loop is the only path")
    import ctypes

    u8p = ctypes.POINTER(ctypes.c_ubyte)
    rng = np.random.RandomState(7)
    for bpp in (1, 2, 3, 4):
        for width in (1, 2, 9, 64):
            stride = width * bpp
            for ftype in (3, 4):
                raw = rng.randint(0, 256, stride).astype(np.uint8)
                prev = rng.randint(0, 256, stride).astype(np.uint8)
                expect = raw.copy()
                _unfilter_py(expect, prev, ftype, bpp)
                got = raw.copy()
                fn = lib.unfilter_avg if ftype == 3 else lib.unfilter_paeth
                fn(
                    got.ctypes.data_as(u8p),
                    prev.ctypes.data_as(u8p),
                    stride,
                    bpp,
                )
                assert np.array_equal(got, expect), (bpp, width, ftype)


def test_png_sub_filter_accumulate_matches_pure_loop():
    """Filter 1 (Sub) now decodes via a per-lane uint8 cumsum; pin it
    against the per-byte recurrence on random RGB scanlines."""
    import numpy as np

    rng = np.random.RandomState(11)
    for channels in (1, 2, 3, 4):
        width = 37
        stride = width * channels
        raw = rng.randint(0, 256, stride).astype(np.uint8)
        expect = raw.copy()
        for i in range(stride):
            a = int(expect[i - channels]) if i >= channels else 0
            expect[i] = (int(raw[i]) + a) & 0xFF
        got = raw.copy()
        lanes = got.reshape(width, channels)
        np.add.accumulate(lanes, axis=0, out=lanes)
        assert np.array_equal(got, expect), channels


def test_avi_container_roundtrip_and_frame_sample_real(spark):
    """REAL AVI parsing end-to-end: distributed fixture build →
    frame_sample_real → per-frame integer luma features replayed in
    Python from the pixel formula; DIB bottom-up order is certified by
    row0_sum (the top row differs from the bottom row), padded row
    strides are exercised (w=5 ⇒ 15-byte rows padded to 16), and the
    stable unavailable-codec / not-an-AVI errors are pinned."""
    from collections.abc import Iterator

    import numpy as np
    import pytest
    from pyspark.sql import functions as F

    from arrowhouse_spark.operators.multimodal import (
        VIDEO_CODEC_UNAVAILABLE_MSG,
        _decode_avi_gray_frames,
        frame_sample_real,
        make_avi_payload,
    )

    def _build(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
        import pandas as pd

        for pdf in batches:
            ids = [int(i) for i in pdf["media_id"]]
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "payload": [
                        make_avi_payload(4 + i % 3, 5 + i % 4, 6 + i % 7, seed=i)
                        for i in ids
                    ],
                }
            )

    media = (
        spark.range(12)
        .select(F.col("id").alias("media_id"))
        .mapInPandas(_build, "media_id long, payload binary")
    )
    rows = {
        (r.media_id, r.frame_idx): r
        for r in frame_sample_real(media, every_ms=200).collect()
    }

    def luma(i, f, w, h):
        g = np.zeros((h, w), dtype=np.int64)
        for y in range(h):
            for x in range(w):
                b = ((x * 3 + 0) * 31 + y * 57 + f * 11 + i) % 251
                gg = ((x * 3 + 1) * 31 + y * 57 + f * 11 + i) % 251
                r = ((x * 3 + 2) * 31 + y * 57 + f * 11 + i) % 251
                g[y, x] = (r * 299 + gg * 587 + b * 114) // 1000
        return g

    n_expected = 0
    for i in range(12):
        w, h, nf = 4 + i % 3, 5 + i % 4, 6 + i % 7
        for f in range(0, nf, 5):  # step = 200ms * 1000 / 40000us = 5
            n_expected += 1
            r = rows[(i, f)]
            g = luma(i, f, w, h)
            assert (r.width, r.height) == (w, h)
            assert r.ts_ms == f * 40
            assert r.gray_total == int(g.sum())
            assert r.row0_sum == int(g[0].sum())  # flip-sensitive
    assert len(rows) == n_expected

    # compressed / non-24-bit streams refuse with the stable message
    p = bytearray(make_avi_payload(4, 4, 1))
    at = p.find(b"strf") + 8
    p[at + 16 : at + 20] = (1).to_bytes(4, "little")  # biCompression = RLE
    with pytest.raises(NotImplementedError, match="video codec unavailable"):
        _decode_avi_gray_frames(bytes(p))
    assert "AVI" in VIDEO_CODEC_UNAVAILABLE_MSG
    with pytest.raises(ValueError, match="not an AVI"):
        _decode_avi_gray_frames(b"RIFFxxxxWAVE")


def test_audio_fingerprint_planted_shift_recall(spark):
    """audio_fingerprint64 + the generic banding operators recover every
    planted time-shifted clip: 20 anchors, each with a 5-sample-delayed
    variant, all pairs found at hamming <= 8 while the fingerprint space
    stays discriminative (anchor hashes differ). Also pins the < 65
    sample refusal."""
    import io
    import wave
    from collections.abc import Iterator

    import numpy as np
    import pytest
    from pyspark.sql import functions as F

    from arrowhouse_spark.operators.multimodal import (
        audio_fingerprint,
        audio_fingerprint64,
        dhash_neardup_pairs,
    )

    def clip(a: int, off: int) -> bytes:
        run, seed = 24 + (a % 5) * 8, a * 13 % 97
        n = 65 * run
        idx = (np.arange(n) + off) // run
        s = ((idx * (11 + seed % 83) + seed * 7) % 501) - 250
        buf = io.BytesIO()
        with wave.open(buf, "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(16000)
            w.writeframes(s.astype("<i2").tobytes())
        return buf.getvalue()

    def _build(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
        import pandas as pd

        for pdf in batches:
            ids = [int(i) for i in pdf["media_id"]]
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "payload": [
                        clip(i // 2, 5 if i % 2 else 0) for i in ids
                    ],
                }
            )

    media = (
        spark.range(40)
        .select(F.col("id").alias("media_id"))
        .mapInPandas(_build, "media_id long, payload binary")
    )
    hashed = audio_fingerprint(media).localCheckpoint()
    fps = {r.media_id: r.afp for r in hashed.collect()}
    assert len(set(fps[i] for i in range(0, 40, 2))) > 15  # discriminative
    pairs = {
        (r.id_a, r.id_b): r.hamming
        for r in dhash_neardup_pairs(
            hashed, id_col="media_id", hash_col="afp", max_hamming=8
        ).collect()
    }
    for a in range(0, 40, 2):  # every planted (anchor, variant) pair found
        assert (a, a + 1) in pairs, f"missed planted pair {a}"

    with pytest.raises(ValueError, match=">= 65 samples"):
        audio_fingerprint64(np.zeros(64, dtype=np.int64))


def test_video_frames_compose_with_image_dhash_seam():
    """Sampled AVI frames are plain gray grids sharing the PNG seam's
    luma, so the image perceptual pipeline applies to them unchanged:
    dhash64 over a decoded frame equals dhash64 over a PNG of the same
    pixels — the cross-modality composition the seam design promises."""
    import numpy as np

    from arrowhouse_spark.operators.multimodal import (
        _decode_avi_gray_frames,
        _decode_png_gray,
        dhash64,
        encode_png_gray,
        make_avi_payload,
    )

    p = make_avi_payload(12, 9, 3, seed=5)
    _, _, _, grays = _decode_avi_gray_frames(p)
    for g in grays:
        png = encode_png_gray(g)
        assert np.array_equal(_decode_png_gray(png), g)
        assert dhash64(_decode_png_gray(png)) == dhash64(g)


def test_audio_fingerprint_incremental_band_store(spark):
    """The afp column drives dhash_band_index/dhash_incremental unchanged
    (hash-column-generic banding): a new batch drops clips whose
    fingerprint is within max_hamming of the persistent store OR of a
    lower-id batch-mate, and survivors' index rows advance the store —
    the daily-ingest form for audio corpora."""
    import io
    import wave
    from collections.abc import Iterator

    import numpy as np
    from pyspark.sql import functions as F

    from arrowhouse_spark.operators.multimodal import (
        audio_fingerprint,
        dhash_band_index,
        dhash_incremental,
    )

    def clip(a: int, off: int) -> bytes:
        run, seed = 24 + (a % 5) * 8, a * 13 % 97
        n = 65 * run
        idx = (np.arange(n) + off) // run
        s = ((idx * (11 + seed % 83) + seed * 7) % 501) - 250
        buf = io.BytesIO()
        with wave.open(buf, "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(16000)
            w.writeframes(s.astype("<i2").tobytes())
        return buf.getvalue()

    def media(rows):  # [(media_id, anchor, off)]
        def _b(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
            import pandas as pd

            m = {mid: (a, off) for mid, a, off in rows}
            for pdf in batches:
                ids = [int(i) for i in pdf["media_id"]]
                yield pd.DataFrame(
                    {"media_id": ids, "payload": [clip(*m[i]) for i in ids]}
                )

        return (
            spark.createDataFrame([(r[0],) for r in rows], "media_id long")
            .mapInPandas(_b, "media_id long, payload binary")
        )

    # day 1: anchors 0..9 → store index
    day1 = audio_fingerprint(media([(i, i, 0) for i in range(10)]))
    store = dhash_band_index(day1, "media_id", "afp").localCheckpoint()
    # day 2: 100..104 shifted twins of anchors 0..4 (must drop vs store),
    # 110/111 a fresh anchor and ITS shifted twin (within-batch greedy),
    # 120 a fresh singleton far from every stored hash (survives)
    day2 = audio_fingerprint(
        media(
            [(100 + i, i, 5) for i in range(5)]
            + [(110, 40, 0), (111, 40, 5), (120, 41, 0)]
        )
    )
    surv = dhash_incremental(
        day2, store, id_col="media_id", hash_col="afp", max_hamming=8
    )
    kept = {r.media_id for r in surv.select("media_id").distinct().collect()}
    assert kept == {110, 120}
    # survivors advance the store; replaying day 2 now drops everything
    store2 = store.unionByName(surv).localCheckpoint()
    again = dhash_incremental(
        day2, store2, id_col="media_id", hash_col="afp", max_hamming=8
    )
    assert again.select("media_id").distinct().count() == 0


def test_avi_parser_skips_audio_stream_strf():
    """Review fix, pinned: a standard AVI carries a SECOND strl for the
    audio stream whose strf is a WAVEFORMATEX — the parser must take the
    BITMAPINFOHEADER from the 'vids' strl only, not clobber it with
    audio bytes (which refused a perfectly decodable file)."""
    import struct as _struct

    import numpy as np

    from arrowhouse_spark.operators.multimodal import (
        _decode_avi_gray_frames,
        make_avi_payload,
    )

    base = make_avi_payload(5, 4, 2, seed=9)
    # splice an audio strl (strh 'auds' + strf WAVEFORMATEX) after the
    # video strl, inside the hdrl LIST
    def chunk(tag, body):
        pad = b"\x00" if len(body) % 2 else b""
        return tag + _struct.pack("<I", len(body)) + body + pad

    wfx = _struct.pack("<HHIIHH", 1, 1, 16000, 32000, 2, 16)
    strh_a = b"auds" + b"\x00" * 52
    auds = chunk(
        b"LIST", b"strl" + chunk(b"strh", strh_a) + chunk(b"strf", wfx)
    )
    movi_at = base.find(b"LIST", 12)
    # find the movi LIST (the hdrl LIST comes first at offset 12)
    pos = 12
    hdrl_start = None
    while pos + 8 <= len(base):
        tag = base[pos : pos + 4]
        (ln,) = _struct.unpack("<I", base[pos + 4 : pos + 8])
        if tag == b"LIST" and base[pos + 8 : pos + 12] == b"hdrl":
            hdrl_start, hdrl_len = pos, ln
            break
        pos += 8 + ln + (ln & 1)
    assert hdrl_start is not None
    hdrl_end = hdrl_start + 8 + hdrl_len
    spliced = bytearray(base[:hdrl_end] + auds + base[hdrl_end:])
    # grow the hdrl LIST and RIFF sizes to cover the splice
    new_hdrl_len = hdrl_len + len(auds)
    spliced[hdrl_start + 4 : hdrl_start + 8] = _struct.pack("<I", new_hdrl_len)
    spliced[4:8] = _struct.pack("<I", len(spliced) - 8)

    uspf, w, h, grays = _decode_avi_gray_frames(bytes(spliced))
    _, w0, h0, grays0 = _decode_avi_gray_frames(base)
    assert (w, h) == (w0, h0) == (5, 4)
    assert all(np.array_equal(a, b) for a, b in zip(grays, grays0))


def test_avi_parser_rejects_corrupt_containers_with_stable_errors():
    """Corrupt AVI containers fail LOUDLY with the module's stable decode
    errors (round-11 ADVICE): an oversized declared chunk length raises
    'truncated AVI chunk' (Python slicing would otherwise clamp and
    silently drop frames), and a frame chunk whose byte count disagrees
    with row_stride x height raises 'AVI frame size mismatch' instead of
    an opaque numpy error."""
    import struct

    import pytest

    from arrowhouse_spark.operators.multimodal import (
        _decode_avi_gray_frames,
        make_avi_payload,
    )

    good = make_avi_payload(4, 3, 2, seed=1)
    assert len(_decode_avi_gray_frames(good)[3]) == 2

    # oversized declared length on the first frame chunk: the body would
    # run past the enclosing movi LIST
    p = bytearray(good)
    at = p.find(b"00db")
    (ln,) = struct.unpack("<I", p[at + 4 : at + 8])
    p[at + 4 : at + 8] = struct.pack("<I", ln + 10_000)
    with pytest.raises(ValueError, match="truncated AVI chunk"):
        _decode_avi_gray_frames(bytes(p))

    # header/payload disagreement: biHeight claims one more row than the
    # frame chunks carry — the frame-size check must name it, not let an
    # opaque numpy reshape error (or a silent short decode) through
    p2 = bytearray(good)
    at2 = p2.find(b"strf") + 8  # BITMAPINFOHEADER start
    p2[at2 + 8 : at2 + 12] = struct.pack("<i", 4)  # biHeight 3 → 4
    with pytest.raises(ValueError, match="AVI frame size mismatch"):
        _decode_avi_gray_frames(bytes(p2))

    # truncated header chunk: avih shorter than its struct
    p3 = bytearray(good)
    at3 = p3.find(b"avih")
    p3[at3 + 4 : at3 + 8] = struct.pack("<I", 2)
    with pytest.raises(ValueError, match="truncated AVI chunk"):
        _decode_avi_gray_frames(bytes(p3))


def test_png_unfilter_fallback_warns_once_without_compiler(monkeypatch):
    """A compiler-less executor decodes Paeth rows ~20x slower; that
    cliff must be OBSERVABLE (round-11 verdict #6): the first
    _get_unfilter_lib() miss emits one RuntimeWarning naming the reason,
    later calls stay silent (per-process latch)."""
    import shutil
    import warnings

    import pytest

    from arrowhouse_spark.operators import multimodal as mm

    monkeypatch.setattr(mm, "_UNFILTER_LIB", None)
    monkeypatch.setattr(mm, "_UNFILTER_TRIED", False)
    monkeypatch.setattr(shutil, "which", lambda *_a, **_k: None)
    with pytest.warns(RuntimeWarning, match="C unfilter kernel unavailable"):
        assert mm._get_unfilter_lib() is None
    # latched: the second call neither warns nor retries the compile
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        assert mm._get_unfilter_lib() is None


def test_png_palette_decode_matches_model():
    """Palette PNGs (color type 3 — round-11 verdict #4) decode via the
    PLTE → shared-ITU-R-601-2-luma lookup: the pixel grid equals the
    closed-form index→RGB→luma model, and a palette image missing its
    PLTE (or indexing past it) refuses with a stable error."""
    import struct

    import numpy as np
    import pytest

    from arrowhouse_spark.operators.multimodal import (
        _decode_png_gray,
        _png_palette_rgb,
        make_png_payload,
    )

    w, h, seed = 7, 5, 11
    g = _decode_png_gray(make_png_payload(w, h, seed=seed, color_type=3))
    exp = np.empty((h, w), dtype=np.uint8)
    for y in range(h):
        for x in range(w):
            idx = (x * 31 + y * 57 + seed) % 251
            r, gg, b = _png_palette_rgb(idx)
            exp[y, x] = (r * 299 + gg * 587 + b * 114) // 1000
    assert (g == exp).all()

    # strip the PLTE chunk: the decoder must refuse, not crash opaquely
    payload = make_png_payload(4, 4, color_type=3)
    at = payload.find(b"PLTE") - 4  # chunk length precedes the tag
    (ln,) = struct.unpack(">I", payload[at : at + 4])
    no_plte = payload[:at] + payload[at + 12 + ln :]
    with pytest.raises(ValueError, match="PNG missing PLTE"):
        _decode_png_gray(no_plte)

    # index past a SHORT palette refuses with the stable message
    short = bytearray(make_png_payload(4, 4, seed=200, color_type=3))
    at = short.find(b"PLTE") - 4
    # shrink the palette to 2 entries (6 bytes), fixing length + crc span
    import zlib

    body = bytes(short[at + 8 : at + 8 + 6])
    new_chunk = (
        struct.pack(">I", 6)
        + b"PLTE"
        + body
        + struct.pack(">I", zlib.crc32(b"PLTE" + body) & 0xFFFFFFFF)
    )
    (old_ln,) = struct.unpack(">I", bytes(short[at : at + 4]))
    trimmed = bytes(short[:at]) + new_chunk + bytes(short[at + 12 + old_ln :])
    with pytest.raises(ValueError, match="palette index out of range"):
        _decode_png_gray(trimmed)


def test_png_16bit_and_adam7_decode_match_model():
    """16-bit and Adam7-interlaced PNGs (the remaining stdlib-reachable
    codec gaps from round-11's superset note): for every color type and
    depth the interlaced grid equals the sequential grid (pixel values
    are storage-order-invariant) and both equal the closed-form sample
    model (16-bit reduces to its high byte)."""
    import numpy as np

    from arrowhouse_spark.operators.multimodal import (
        _decode_png_gray,
        _png_palette_rgb,
        make_png_payload,
    )

    def model(w, h, seed, ctype, depth):
        ch = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}[ctype]

        def sample(x, c, y):
            s = x * ch + c
            if depth == 8:
                return (s * 31 + y * 57 + seed) % 251
            return ((s * 523 + y * 771 + seed * 13) % 65536) >> 8

        g = np.empty((h, w), dtype=np.uint8)
        for y in range(h):
            for x in range(w):
                if ctype == 0:
                    g[y, x] = sample(x, 0, y)
                elif ctype == 3:
                    r, gg, b = _png_palette_rgb(sample(x, 0, y))
                    g[y, x] = (r * 299 + gg * 587 + b * 114) // 1000
                elif ctype == 4:
                    g[y, x] = sample(x, 0, y)
                else:
                    g[y, x] = (
                        sample(x, 0, y) * 299
                        + sample(x, 1, y) * 587
                        + sample(x, 2, y) * 114
                    ) // 1000
        return g

    # w/h below, at, and above 8 exercise empty and partial Adam7 passes
    cases = [
        (0, 8), (0, 16), (2, 8), (2, 16), (6, 8), (6, 16), (4, 16), (3, 8),
    ]
    for ctype, depth in cases:
        for w, h in [(3, 5), (8, 8), (13, 9)]:
            seq = _decode_png_gray(
                make_png_payload(w, h, seed=9, color_type=ctype, depth=depth)
            )
            lace = _decode_png_gray(
                make_png_payload(
                    w, h, seed=9, color_type=ctype, depth=depth, interlace=1
                )
            )
            exp = model(w, h, 9, ctype, depth)
            assert (seq == exp).all(), (ctype, depth, w, h, "sequential")
            assert (lace == exp).all(), (ctype, depth, w, h, "adam7")


def test_png_16bit_all_filter_types_roundtrip():
    """16-bit scanline unfiltering uses bpp = 2 bytes per pixel unit:
    FORWARD-filter known 16-bit gray samples per the spec (byte
    arithmetic with a 2-byte left offset) across all five filter types
    and require the decoder to recover the exact high-byte grid."""
    import struct as _struct
    import zlib

    import numpy as np

    from arrowhouse_spark.operators.multimodal import _decode_png_gray

    w, h = 6, 5
    val = [[(x * 4099 + y * 257 + 77) % 65536 for x in range(w)] for y in range(h)]
    rows = [
        b"".join(val[y][x].to_bytes(2, "big") for x in range(w))
        for y in range(h)
    ]

    def paeth(a, b, c):
        p = a + b - c
        pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
        return a if pa <= pb and pa <= pc else (b if pb <= pc else c)

    raw = bytearray()
    bpp = 2
    for y, ftype in enumerate([0, 1, 2, 3, 4]):
        raw.append(ftype)
        cur = rows[y]
        prev = rows[y - 1] if y > 0 else bytes(len(cur))
        for i in range(len(cur)):
            a = cur[i - bpp] if i >= bpp else 0
            b = prev[i]
            c = prev[i - bpp] if i >= bpp else 0
            if ftype == 0:
                f = cur[i]
            elif ftype == 1:
                f = cur[i] - a
            elif ftype == 2:
                f = cur[i] - b
            elif ftype == 3:
                f = cur[i] - (a + b) // 2
            else:
                f = cur[i] - paeth(a, b, c)
            raw.append(f & 0xFF)

    def chunk(tag, body):
        return (
            _struct.pack(">I", len(body)) + tag + body
            + _struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
        )

    png = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", _struct.pack(">IIBBBBB", w, h, 16, 0, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )
    got = _decode_png_gray(png)
    exp = np.array([[v >> 8 for v in row] for row in val], dtype=np.uint8)
    assert (got == exp).all()


def test_audio_fingerprint_stereo_downmix(spark):
    """audio_fingerprint accepts multi-channel PCM16 by reusing
    decode_audio's documented floor-div downmix before hashing — the
    fingerprint equals audio_fingerprint64 over the downmixed model
    signal, and a dual-mono clip (both channels identical) hashes
    exactly like its mono master."""
    import numpy as np

    from arrowhouse_spark.operators.multimodal import (
        audio_fingerprint,
        audio_fingerprint64,
        make_wav_payload,
    )

    n, sr, seed = 800, 8000, 9
    df = spark.createDataFrame(
        [(1, make_wav_payload(n, sr, seed=seed, n_channels=2))],
        "media_id long, payload binary",
    )
    i = np.arange(n, dtype=np.int64)
    ch = [
        ((i * i * 7 + i * 13 + c * 29 + seed * 101) % 65536) - 32768
        for c in (0, 1)
    ]
    mono = (ch[0] + ch[1]) // 2
    r = audio_fingerprint(df).collect()[0]
    assert r.afp == audio_fingerprint64(mono)

    # dual-mono == mono master: identical channels downmix to themselves
    import io
    import wave

    buf = io.BytesIO()
    s = ch[0].astype("<i2")
    inter = np.empty(2 * n, dtype="<i2")
    inter[0::2] = s
    inter[1::2] = s
    with wave.open(buf, "wb") as w:
        w.setnchannels(2)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(inter.tobytes())
    both = spark.createDataFrame(
        [
            (1, buf.getvalue()),
            (2, make_wav_payload(n, sr, seed=seed, n_channels=1)),
        ],
        "media_id long, payload binary",
    )
    got = {r.media_id: r.afp for r in audio_fingerprint(both).collect()}
    assert got[1] == got[2]


def test_g711_wav_decode(spark):
    """G.711 µ-law / A-law WAV (the telephony encodings wave refuses)
    decode through the RIFF fallback: expansion is BIT-EXACT against
    stdlib audioop over all 256 codes, the container path applies the
    shared channel policy, and decode_audio features match the
    coded-byte model end to end."""
    import warnings

    import numpy as np

    from arrowhouse_spark.operators.multimodal import (
        _g711_expand,
        _wav_read_mono,
        decode_audio,
        make_g711_wav_payload,
    )

    with warnings.catch_warnings():
        warnings.simplefilter("ignore", DeprecationWarning)
        import audioop

    bs = bytes(range(256))
    assert np.array_equal(
        _g711_expand(bs, 7), np.frombuffer(audioop.ulaw2lin(bs, 2), "<i2")
    )
    assert np.array_equal(
        _g711_expand(bs, 6), np.frombuffer(audioop.alaw2lin(bs, 2), "<i2")
    )

    rows, exp = [], {}
    mid = 0
    for law, tag in (("mu", 7), ("a", 6)):
        for ch in (1, 2):
            mid += 1
            n, seed = 200 + mid * 10, mid
            rows.append(
                (mid, make_g711_wav_payload(n, 8000, seed=seed, law=law, n_channels=ch))
            )
            i = np.arange(n)[:, None]
            c = np.arange(ch)[None, :]
            coded = ((i * i * 5 + i * 37 + c * 29 + seed * 11) % 256).astype(np.uint8)
            s = _g711_expand(coded.tobytes(), tag).reshape(n, ch).sum(axis=1) // ch
            exp[mid] = (8000, n, n * 1000 // 8000, int((s * s).sum()), int(np.abs(s).max()))
            _, _, got_s = _wav_read_mono(rows[-1][1])
            assert np.array_equal(got_s, s)
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    got = {
        r.media_id: (r.sample_rate, r.n_samples, r.duration_ms, r.sum_sq, r.peak)
        for r in decode_audio(df).collect()
    }
    assert got == exp

    with pytest.raises(ValueError, match="law must be"):
        make_g711_wav_payload(10, law="g729")
