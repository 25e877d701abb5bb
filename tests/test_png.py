"""PNG codec (multimodal/png.py, r8) units: lossless roundtrips
across shapes and color types, filter-path coverage, decoder-only
paths (palette, gray+alpha) over hand-built streams, malformed/CRC
rejection, the documented interlace/bit-depth boundary, dispatch
through decode_media, and the registry audit face."""

import struct
import zlib

import numpy as np
import pytest

from doeecommerce_datapipeline_spark.multimodal.png import (
    PNG_SIGNATURE,
    _chunk,
    decode_png,
    encode_png,
)


def _noise(h, w, ch=3, seed=0):
    rng = np.random.default_rng(seed)
    shape = (h, w) if ch == 1 else (h, w, ch)
    return rng.integers(0, 256, size=shape).astype(np.uint8)


def _extract_idat(data: bytes) -> bytes:
    pos, idat = len(PNG_SIGNATURE), b""
    while pos + 8 <= len(data):
        (ln,) = struct.unpack_from(">I", data, pos)
        if data[pos + 4 : pos + 8] == b"IDAT":
            idat += data[pos + 8 : pos + 8 + ln]
        pos += 12 + ln
    return idat


def test_roundtrip_rgb_exact():
    for h, w in [(1, 1), (8, 8), (17, 31), (40, 25)]:
        img = _noise(h, w, seed=h * 100 + w)
        dec = decode_png(encode_png(img))
        assert dec.shape == (h, w, 3)
        assert np.array_equal(dec, img)


def test_roundtrip_gray_and_rgba_exact():
    g = _noise(13, 9, ch=1, seed=3)
    assert np.array_equal(decode_png(encode_png(g)), g)
    a = _noise(11, 14, ch=4, seed=4)
    assert np.array_equal(decode_png(encode_png(a)), a)


def test_encoder_exercises_all_five_filters():
    """The min-SAD heuristic must actually pick every filter type on
    noise input — otherwise the decoder's Sub/Up/Average/Paeth paths
    go untested by roundtrips."""
    img = _noise(40, 40, seed=7)
    raw = zlib.decompress(_extract_idat(encode_png(img)))
    stride = 40 * 3 + 1
    used = {raw[i] for i in range(0, len(raw), stride)}
    assert used == {0, 1, 2, 3, 4}


def test_deterministic_bytes():
    img = _noise(20, 20, seed=9)
    assert encode_png(img) == encode_png(img)


def test_palette_decode_hand_built():
    """Decoder-only path: a hand-built color-type-3 stream expands
    through PLTE to RGB."""
    palette = np.array(
        [[255, 0, 0], [0, 255, 0], [0, 0, 255], [9, 8, 7]], dtype=np.uint8
    )
    idx = np.array([[0, 1, 2], [3, 2, 1]], dtype=np.uint8)
    h, w = idx.shape
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 3, 0, 0, 0)
    scan = b"".join(b"\x00" + idx[y].tobytes() for y in range(h))
    data = (
        PNG_SIGNATURE
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"PLTE", palette.tobytes())
        + _chunk(b"IDAT", zlib.compress(scan))
        + _chunk(b"IEND", b"")
    )
    assert np.array_equal(decode_png(data), palette[idx])


def test_gray_alpha_decode_hand_built():
    px = np.array([[[10, 200], [30, 40]]], dtype=np.uint8)  # (1,2,2)
    ihdr = struct.pack(">IIBBBBB", 2, 1, 8, 4, 0, 0, 0)
    scan = b"\x00" + px.reshape(-1).tobytes()
    data = (
        PNG_SIGNATURE
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(scan))
        + _chunk(b"IEND", b"")
    )
    assert np.array_equal(decode_png(data), px)


def test_multi_idat_streams_concatenate():
    img = _noise(16, 16, seed=11)
    enc = encode_png(img)
    idat = _extract_idat(enc)
    cut = len(idat) // 2
    rebuilt = (
        PNG_SIGNATURE
        + _chunk(b"IHDR", struct.pack(">IIBBBBB", 16, 16, 8, 2, 0, 0, 0))
        + _chunk(b"IDAT", idat[:cut])
        + _chunk(b"IDAT", idat[cut:])
        + _chunk(b"IEND", b"")
    )
    assert np.array_equal(decode_png(rebuilt), img)


def test_rejects_malformed_and_boundary():
    img = _noise(8, 8, seed=13)
    enc = bytearray(encode_png(img))
    with pytest.raises(ValueError):
        decode_png(b"not a png")
    # CRC corruption inside IHDR
    bad = enc.copy()
    bad[16] ^= 0xFF
    with pytest.raises(ValueError):
        decode_png(bytes(bad))
    # truncation mid-IDAT
    with pytest.raises(ValueError):
        decode_png(bytes(enc[: len(enc) - 20]))
    # interlace flag -> documented boundary (rebuild CRC so the
    # boundary check is what fires, not the CRC check)
    ihdr = struct.pack(">IIBBBBB", 8, 8, 8, 2, 0, 0, 1)
    data = (
        PNG_SIGNATURE
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(b"\x00" * (8 * 25)))
        + _chunk(b"IEND", b"")
    )
    with pytest.raises(NotImplementedError):
        decode_png(data)
    # 16-bit depth -> documented boundary
    ihdr16 = struct.pack(">IIBBBBB", 8, 8, 16, 2, 0, 0, 0)
    data16 = (
        PNG_SIGNATURE
        + _chunk(b"IHDR", ihdr16)
        + _chunk(b"IDAT", zlib.compress(b"\x00" * 8))
        + _chunk(b"IEND", b"")
    )
    with pytest.raises(NotImplementedError):
        decode_png(data16)


def test_decode_media_dispatches_png(spark):
    from doeecommerce_datapipeline_spark.multimodal.decode import (
        decode_media,
    )

    img = _noise(6, 10, seed=17)
    rows = [(1, "image", "image/png", bytearray(encode_png(img)), None)]
    df = spark.createDataFrame(
        rows,
        "media_id long, kind string, mime string, payload binary, "
        "meta struct<width:int,height:int,duration_ms:long>",
    )
    out = decode_media(df, real_decode=True).collect()
    assert len(out) == 1
    feats = out[0]["features"]
    assert feats[0] == 1.0  # image tag
    assert (feats[1], feats[2]) == (10.0, 6.0)  # width, height


def test_registry_face_flags_all_true(spark):
    import __spark_entry__ as em

    rows = em.queries()["png_roundtrip_audit"](
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert rows
    for r in rows:
        assert r.magic_ok and r.dims_match and r.lossless_ok


def _unfilter_reference(data, w, h, ch):
    """Independent scalar unfilter straight from the PNG spec (no
    numpy lane tricks) — the cross-check for the vectorized
    implementation."""
    stride = w * ch
    recon = [[0] * stride for _ in range(h)]
    pos = 0
    for y in range(h):
        f = data[pos]
        raw = data[pos + 1 : pos + 1 + stride]
        pos += 1 + stride
        for i in range(stride):
            a = recon[y][i - ch] if i >= ch else 0
            b = recon[y - 1][i] if y else 0
            c = recon[y - 1][i - ch] if (y and i >= ch) else 0
            if f == 0:
                v = raw[i]
            elif f == 1:
                v = raw[i] + a
            elif f == 2:
                v = raw[i] + b
            elif f == 3:
                v = raw[i] + (a + b) // 2
            elif f == 4:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                v = raw[i] + pred
            else:
                raise ValueError(f)
            recon[y][i] = v % 256
    return np.array(recon, dtype=np.uint8)


def test_unfilter_matches_scalar_reference():
    """Vectorized unfilter (cumsum-lane Sub, vectorized Up) ==
    spec-literal scalar reference on random filtered streams, every
    filter type x channel count."""
    from doeecommerce_datapipeline_spark.multimodal.png import _unfilter

    rng = np.random.default_rng(21)
    for ch in (1, 2, 3, 4):
        for trial in range(6):
            h, w = int(rng.integers(1, 12)), int(rng.integers(1, 12))
            stride = w * ch
            data = bytearray()
            for y in range(h):
                data.append(int(rng.integers(0, 5)))  # random filter
                data += bytes(rng.integers(0, 256, stride, dtype=np.uint8))
            got = _unfilter(bytes(data), w, h, ch)
            want = _unfilter_reference(bytes(data), w, h, ch)
            assert np.array_equal(got, want.reshape(h, stride)), (ch, trial)
