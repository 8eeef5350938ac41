"""Baseline-gray JPEG codec + MJPEG AVI seam (round-12 verdict #2).

The codec is self-contained (operators/jpeg.py), so these tests pin it
three ways: coefficient-level Huffman/zigzag round-trips, pixel-level
bounds at the near-lossless quant, and BIT-EXACT flat-block round-trips
(the oracle-fixture regime). The MJPEG AVI tests prove the container
routing end to end including the stable error surface.
"""

import numpy as np
import pytest

from arrowhouse_spark.operators.jpeg import (
    JPEGUnsupportedError,
    decode_jpeg_gray,
    encode_jpeg_gray,
)


def _strip_dht(p: bytes) -> bytes:
    """Drop every DHT segment — the classic MJPEG quirk."""
    import struct

    out = bytearray(p[:2])
    i = 2
    while i + 2 <= len(p):
        m = p[i + 1]
        if m == 0xDA:
            out += p[i:]
            break
        seglen = struct.unpack(">H", p[i + 2 : i + 4])[0]
        if m != 0xC4:
            out += p[i : i + 2 + seglen]
        i += 2 + seglen
    return bytes(out)


def test_flat_blocks_roundtrip_bit_exact():
    """Images whose 8x8 blocks are constant survive encode->decode
    EXACTLY with the all-ones quant table (lone DC coefficient, no
    rounding) — the contract the MJPEG oracle fixtures rely on."""
    rng = np.random.RandomState(7)
    for _ in range(8):
        bh, bw = rng.randint(1, 7), rng.randint(1, 7)
        vals = rng.randint(0, 256, (bh, bw))
        img = np.kron(vals, np.ones((8, 8), dtype=int)).astype(np.uint8)
        out = decode_jpeg_gray(encode_jpeg_gray(img))
        assert np.array_equal(out, img)


def test_gray_with_color_sampling_factors_decodes():
    """Review regression (T.81 A.2.3): a single-component scan is
    non-interleaved — the MCU is one data unit and sampling factors are
    meaningless. jpegtran -grayscale output keeps the luma 2x2 factors,
    so patching the SOF sampling byte 0x11 -> 0x22 (and 0x21) must
    decode to the SAME pixels, not raise mid-scan."""
    rng = np.random.RandomState(11)
    img = rng.randint(0, 256, (24, 40)).astype(np.uint8)
    p = encode_jpeg_gray(img)
    base = decode_jpeg_gray(p)
    sof = p.index(b"\xff\xc0")
    # SOF0: marker(2) len(2) prec(1) h(2) w(2) nf(1) comp_id(1) sampling(1)
    samp_at = sof + 11
    assert p[samp_at] == 0x11
    for factors in (0x22, 0x21, 0x12, 0x44):
        patched = p[:samp_at] + bytes([factors]) + p[samp_at + 1 :]
        assert np.array_equal(decode_jpeg_gray(patched), base)


def test_arbitrary_image_near_lossless_and_cropped():
    """Non-multiple-of-8 dims pad on encode and crop on decode; with the
    all-ones quant the only loss is coefficient rounding (max pixel
    error a few counts). Exercises every AC size 1..10 statistically."""
    rng = np.random.RandomState(3)
    for shape in [(1, 1), (7, 9), (37, 53), (64, 16)]:
        img = rng.randint(0, 256, shape).astype(np.uint8)
        out = decode_jpeg_gray(encode_jpeg_gray(img))
        assert out.shape == img.shape
        assert np.abs(out.astype(int) - img.astype(int)).max() <= 3


def test_lossy_quant_table_applies():
    """A coarse quant table actually quantizes (reconstruction error
    grows) and survives the DQT round-trip including zigzag storage."""
    rng = np.random.RandomState(11)
    img = rng.randint(0, 256, (32, 32)).astype(np.uint8)
    q = np.full((8, 8), 32, dtype=int)
    exact = decode_jpeg_gray(encode_jpeg_gray(img))
    coarse = decode_jpeg_gray(encode_jpeg_gray(img, quant=q))
    err_exact = np.abs(exact.astype(int) - img.astype(int)).mean()
    err_coarse = np.abs(coarse.astype(int) - img.astype(int)).mean()
    assert err_coarse > err_exact + 1.0
    with pytest.raises(ValueError, match="quant table"):
        encode_jpeg_gray(img, quant=np.zeros((8, 8), dtype=int))


def test_missing_dht_falls_back_to_annex_k():
    """Stripping DHT (the MJPEG-without-DHT quirk) decodes identically —
    the encoder uses the same Annex K tables the decoder defaults to."""
    rng = np.random.RandomState(5)
    img = rng.randint(0, 256, (24, 40)).astype(np.uint8)
    p = encode_jpeg_gray(img)
    stripped = _strip_dht(p)
    assert len(stripped) < len(p)
    assert np.array_equal(decode_jpeg_gray(p), decode_jpeg_gray(stripped))


def test_unsupported_and_corrupt_payloads_stable_errors():
    import struct

    img = np.full((8, 8), 130, dtype=np.uint8)
    p = encode_jpeg_gray(img)
    i = p.find(b"\xff\xc0")
    # 4-component (CMYK-ish) SOF -> unsupported, routed to the codec seam
    cmyk = p[: i + 9] + b"\x04" + p[i + 10 :]
    with pytest.raises(JPEGUnsupportedError, match="CMYK"):
        decode_jpeg_gray(cmyk)
    # merely PATCHING the count leaves the segment short of its three
    # component specs -> malformed, loud
    short = p[: i + 9] + b"\x03" + p[i + 10 :]
    with pytest.raises(ValueError, match="truncated JPEG SOF"):
        decode_jpeg_gray(short)
    # a VALID 3-component SOF whose scan stays single-component: the
    # non-interleaved multi-scan shape the built-in decoder refuses
    import struct

    sof3 = (
        b"\xff\xc0"
        + struct.pack(">HBHHB", 17, 8, 8, 8, 3)
        + bytes((1, 0x11, 0, 2, 0x11, 0, 3, 0x11, 0))
    )
    j = p.find(b"\xff\xc0")
    seglen = struct.unpack(">H", p[j + 2 : j + 4])[0]
    color = p[:j] + sof3 + p[j + 2 + seglen :]
    with pytest.raises(JPEGUnsupportedError, match="multi-scan"):
        decode_jpeg_gray(color)
    # progressive SOF2 -> unsupported
    prog = p[:i] + b"\xff\xc2" + p[i + 2 :]
    with pytest.raises(JPEGUnsupportedError, match="progressive"):
        decode_jpeg_gray(prog)
    # sampling factor 0 -> malformed, loud
    sub = p[: i + 11] + b"\x08" + p[i + 12 :]
    with pytest.raises(ValueError, match="sampling factors"):
        decode_jpeg_gray(sub)
    # not a JPEG at all / truncated scan -> loud ValueError
    with pytest.raises(ValueError, match="not a JPEG"):
        decode_jpeg_gray(b"RIFF1234")
    with pytest.raises(ValueError, match="truncated"):
        decode_jpeg_gray(p[:-4])
    # declared segment length past the payload end
    j = p.find(b"\xff\xdb")
    huge = p[: j + 2] + struct.pack(">H", 60000) + p[j + 4 :]
    with pytest.raises(ValueError, match="truncated JPEG segment"):
        decode_jpeg_gray(huge)


def test_sixteen_bit_dqt_decodes():
    """pq=1 (16-bit) quantization tables parse: re-emit the all-ones
    table as 16-bit words and decode identically."""
    import struct

    img = np.kron(
        np.arange(6).reshape(2, 3) * 40, np.ones((8, 8), dtype=int)
    ).astype(np.uint8)
    p = encode_jpeg_gray(img)
    j = p.find(b"\xff\xdb")
    seglen = struct.unpack(">H", p[j + 2 : j + 4])[0]
    assert seglen == 67
    body = p[j + 4 : j + 2 + seglen]
    q_zz = body[1:65]
    wide = b"\x10" + b"".join(struct.pack(">H", b) for b in q_zz)
    repl = b"\xff\xdb" + struct.pack(">H", 2 + len(wide)) + wide
    p16 = p[:j] + repl + p[j + 2 + seglen :]
    assert np.array_equal(decode_jpeg_gray(p16), decode_jpeg_gray(p))


def test_restart_markers_honored():
    """A scan rebuilt with DRI + RSTn markers every 2 MCUs decodes to the
    same pixels: predictors reset, bit reader re-aligns. Built by
    re-encoding per-MCU with the encoder's own bit writer."""
    import struct

    from arrowhouse_spark.operators.jpeg import (
        _AC_ENC,
        _BitWriter,
        _DC_ENC,
        _category,
    )

    vals = np.array([[10, 250, 3], [128, 77, 200]])
    img = np.kron(vals, np.ones((8, 8), dtype=int)).astype(np.uint8)
    p = encode_jpeg_gray(img)

    # rebuild the entropy segment: flat blocks -> DC-only MCUs, with a
    # restart every 2 MCUs and the DC predictor reset each interval
    flat = vals.reshape(-1)  # MCU order is row-major over blocks
    chunks = []
    for start in range(0, 6, 2):
        bw = _BitWriter()
        pred = 0
        for v in flat[start : start + 2]:
            dc = 8 * (int(v) - 128)
            diff = dc - pred
            pred = dc
            s = _category(diff)
            code, ln = _DC_ENC[s]
            bw.write(code, ln)
            if s:
                bw.write(diff if diff >= 0 else diff + (1 << s) - 1, s)
            code, ln = _AC_ENC[0x00]  # EOB
            bw.write(code, ln)
        bw.flush()
        chunks.append(bytes(bw.buf))
    scan = (
        chunks[0]
        + b"\xff\xd0"
        + chunks[1]
        + b"\xff\xd1"
        + chunks[2]
    )
    sos_at = p.find(b"\xff\xda")
    sos_len = struct.unpack(">H", p[sos_at + 2 : sos_at + 4])[0]
    dri = b"\xff\xdd" + struct.pack(">HH", 4, 2)
    p_rst = (
        p[:sos_at]
        + dri
        + p[sos_at : sos_at + 2 + sos_len]
        + scan
        + b"\xff\xd9"
    )
    assert np.array_equal(decode_jpeg_gray(p_rst), img)
    # out-of-sequence restart -> loud error
    bad = p_rst.replace(b"\xff\xd1", b"\xff\xd5")
    with pytest.raises(ValueError, match="restart marker"):
        decode_jpeg_gray(bad)


def test_mjpeg_avi_end_to_end_and_frame_sample():
    """The MJPEG AVI path: container parses, every frame decodes
    bit-exactly to the block formula, frame_sample_real features match a
    driver-side model including the flip-sensitive top-row sum."""
    from arrowhouse_spark.operators.multimodal import (
        _decode_avi_gray_frames,
        make_mjpeg_avi_payload,
    )

    p = make_mjpeg_avi_payload(40, 24, 5, seed=13, us_per_frame=40000)
    uspf, w, h, grays = _decode_avi_gray_frames(p)
    assert (uspf, w, h, len(grays)) == (40000, 40, 24, 5)
    bx = np.arange(5)[None, :]
    by = np.arange(3)[:, None]
    for f, g in enumerate(grays):
        vals = (bx * 37 + by * 53 + f * 11 + 13) % 256
        exp = np.kron(vals, np.ones((8, 8), dtype=int)).astype(np.uint8)
        assert np.array_equal(g, exp)


def test_mjpeg_avi_frame_dim_mismatch_loud():
    """A frame whose decoded dimensions disagree with the strf header
    fails loudly (never a silently mis-shaped grid): build the container
    directly around an 8x8 JPEG while declaring 16x16."""
    from arrowhouse_spark.operators.multimodal import (
        _MJPG_FOURCC,
        _build_avi_container,
        _decode_avi_gray_frames,
    )

    frame = encode_jpeg_gray(np.full((8, 8), 5, dtype=np.uint8))
    p = _build_avi_container(
        16, 16, 40000, [frame],
        handler=b"MJPG", bitcount=24, compression=_MJPG_FOURCC,
        frame_tag=b"00dc",
    )
    with pytest.raises(ValueError, match="AVI frame size mismatch"):
        _decode_avi_gray_frames(p)


def _pil_available() -> bool:
    try:
        import PIL  # noqa: F401

        return True
    except ImportError:
        return False


@pytest.mark.skipif(_pil_available(), reason="codec present")
def test_mjpeg_unsupported_frame_hits_codec_seam():
    """An MJPEG frame outside the built-in baseline scope (here: SOF
    patched to 4 components, CMYK-ish) routes to the optional-pillow
    seam and, without pillow, raises the STABLE video-codec-unavailable
    message. Color YCbCr frames decode BUILT-IN and never hit the seam."""
    from arrowhouse_spark.operators.multimodal import (
        VIDEO_CODEC_UNAVAILABLE_MSG,
        _decode_mjpeg_frame_gray,
    )

    img = np.full((8, 8), 99, dtype=np.uint8)
    p = encode_jpeg_gray(img)
    i = p.find(b"\xff\xc0")
    cmyk = p[: i + 9] + b"\x04" + p[i + 10 :]
    with pytest.raises(NotImplementedError) as ei:
        _decode_mjpeg_frame_gray(cmyk)
    assert str(ei.value) == VIDEO_CODEC_UNAVAILABLE_MSG


def test_color_jpeg_roundtrips():
    """3-component YCbCr decode: gray-content color images (R==G==B,
    flat 8x8 luma blocks) round-trip the Y plane BIT-EXACTLY at 4:4:4,
    4:2:2 and 4:2:0; true-color content returns the JFIF luma within
    coefficient-rounding error; stripping DHT decodes identically (the
    Annex K by-table-id default pairing matches the encoder's tables)."""
    from arrowhouse_spark.operators.jpeg import encode_jpeg_color

    rng = np.random.RandomState(19)
    vals = rng.randint(0, 256, (3, 5))
    g = np.kron(vals, np.ones((8, 8), dtype=int)).astype(np.uint8)
    rgb = np.stack([g, g, g], axis=-1)
    for samp in [(1, 1), (2, 1), (2, 2)]:
        p = encode_jpeg_color(rgb, sampling=samp)
        out = decode_jpeg_gray(p)
        assert out.shape == g.shape
        assert np.array_equal(out, g), samp
        # the MJPEG quirk on a COLOR file: defaults must pair by table id
        assert np.array_equal(decode_jpeg_gray(_strip_dht(p)), g), samp

    rgbc = rng.randint(0, 256, (24, 40, 3)).astype(np.uint8)
    out = decode_jpeg_gray(encode_jpeg_color(rgbc, sampling=(2, 2)))
    yref = np.rint(
        0.299 * rgbc[..., 0] + 0.587 * rgbc[..., 1] + 0.114 * rgbc[..., 2]
    )
    assert np.abs(out.astype(float) - yref).max() <= 3
    # non-multiple-of-MCU dims pad on encode and crop on decode
    odd = rng.randint(0, 256, (19, 21, 3)).astype(np.uint8)
    out = decode_jpeg_gray(encode_jpeg_color(odd, sampling=(2, 2)))
    assert out.shape == (19, 21)


def test_color_jpeg_through_image_seam_builtin():
    """The image seam decodes COLOR JPEG with no external library: the
    gray grid is the Y plane (the engine's 601-luma contract), identical
    for a color encode and a gray encode of the same gray content."""
    from arrowhouse_spark.operators.jpeg import encode_jpeg_color
    from arrowhouse_spark.operators.multimodal import _decode_image_gray_real

    vals = (np.arange(4)[None, :] * 41 + np.arange(2)[:, None] * 67 + 5) % 256
    g = np.kron(vals, np.ones((8, 8), dtype=int)).astype(np.uint8)
    rgb = np.stack([g, g, g], axis=-1)
    a = _decode_image_gray_real(encode_jpeg_color(rgb, sampling=(2, 2)))
    b = _decode_image_gray_real(encode_jpeg_gray(g))
    assert np.array_equal(a, g) and np.array_equal(b, g)


def test_mjpeg_color_avi_end_to_end():
    """Color (YCbCr 4:2:0) MJPEG AVI decodes built-in: every frame's Y
    plane equals the block formula bit-exactly — certifying interleaved
    MCU walking and chroma-block skipping inside the container path."""
    from arrowhouse_spark.operators.multimodal import (
        _decode_avi_gray_frames,
        make_mjpeg_avi_payload,
    )

    p = make_mjpeg_avi_payload(32, 16, 4, seed=21, color=True)
    uspf, w, h, grays = _decode_avi_gray_frames(p)
    assert (uspf, w, h, len(grays)) == (40000, 32, 16, 4)
    bx = np.arange(4)[None, :]
    by = np.arange(2)[:, None]
    for f, g in enumerate(grays):
        vals = (bx * 37 + by * 53 + f * 11 + 21) % 256
        exp = np.kron(vals, np.ones((8, 8), dtype=int)).astype(np.uint8)
        assert np.array_equal(g, exp)
    with pytest.raises(ValueError, match="multiple-of-16"):
        make_mjpeg_avi_payload(24, 16, 1, color=True)
