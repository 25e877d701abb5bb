"""Baseline JPEG codec (multimodal/jpeg.py): roundtrip accuracy over
4:4:4, 4:2:0, grayscale, and restart-marker layouts; malformed/
non-baseline rejection; and the registry audit face end-to-end."""

import numpy as np
import pytest

from doeecommerce_datapipeline_spark.multimodal.jpeg import (
    decode_baseline_jpeg,
    encode_baseline_jpeg,
)

SF = "/root/testdata/sf0.001"


def _gradient(h, w):
    yy, xx = np.mgrid[0:h, 0:w]
    return np.stack(
        [(yy * 6) % 256, (xx * 7) % 256, (yy * 3 + xx * 2) % 256],
        axis=-1,
    ).astype(np.uint8)


def test_roundtrip_444_accuracy():
    img = _gradient(24, 31)
    for q, bound in ((95, 8), (85, 16), (50, 32)):
        dec = decode_baseline_jpeg(encode_baseline_jpeg(img, quality=q))
        assert dec.shape == img.shape and dec.dtype == np.uint8
        err = np.abs(dec.astype(int) - img.astype(int)).max()
        assert err <= bound, f"q{q}: max err {err} > {bound}"


def test_roundtrip_non_multiple_of_8_dims():
    # dims that need edge padding in every direction
    for h, w in ((7, 9), (8, 8), (17, 33), (1, 1)):
        img = _gradient(h, w)
        dec = decode_baseline_jpeg(encode_baseline_jpeg(img, quality=90))
        assert dec.shape == (h, w, 3)


def test_roundtrip_420_subsampling():
    """4:2:0 exercises the general MCU walk (4 Y blocks per MCU) and
    the chroma upsampler; luma survives almost exactly, chroma within
    box-average loss on a smooth image."""
    img = _gradient(37, 45)
    dec = decode_baseline_jpeg(
        encode_baseline_jpeg(img, quality=90, subsample_420=True)
    )
    assert dec.shape == img.shape
    lum = lambda a: (  # noqa: E731
        0.299 * a[..., 0] + 0.587 * a[..., 1] + 0.114 * a[..., 2]
    )
    assert np.abs(lum(dec.astype(float)) - lum(img.astype(float))).mean() < 4


def test_restart_markers_bit_identical():
    """RSTn emission + the decoder's predictor reset / realignment
    must not change a single decoded pixel vs the no-restart stream."""
    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, (18, 22, 3), dtype=np.uint8)
    for sub in (False, True):
        base = decode_baseline_jpeg(
            encode_baseline_jpeg(img, 85, subsample_420=sub)
        )
        for ri in (1, 3):
            with_rst = decode_baseline_jpeg(
                encode_baseline_jpeg(
                    img, 85, subsample_420=sub, restart_interval=ri
                )
            )
            assert np.array_equal(base, with_rst)


def test_grayscale_roundtrip():
    g = ((np.arange(24)[:, None] * 11 + np.arange(31) * 5) % 256).astype(
        np.uint8
    )
    dec = decode_baseline_jpeg(encode_baseline_jpeg(g, quality=90))
    assert dec.shape == g.shape and dec.ndim == 2
    assert np.abs(dec.astype(int) - g.astype(int)).max() <= 16


def test_deterministic_bytes_and_pixels():
    img = _gradient(16, 16)
    a, b = encode_baseline_jpeg(img, 90), encode_baseline_jpeg(img, 90)
    assert a == b
    assert np.array_equal(decode_baseline_jpeg(a), decode_baseline_jpeg(b))


def test_rejects_non_baseline_and_malformed():
    img = _gradient(8, 8)
    data = bytearray(encode_baseline_jpeg(img, 90))
    sof = data.find(b"\xff\xc0")
    assert sof >= 0
    data[sof + 1] = 0xC2  # rewrite SOF0 -> SOF2 (progressive)
    with pytest.raises(NotImplementedError):
        decode_baseline_jpeg(bytes(data))
    with pytest.raises(ValueError):
        decode_baseline_jpeg(b"not a jpeg at all")


def test_decode_media_dispatches_jpeg(spark):
    """The generic decode seam recognizes JPEG magic and emits the
    PPM-compatible feature layout (tag=1, width, height, maxval)."""
    from doeecommerce_datapipeline_spark.multimodal.decode import (
        decode_media,
    )

    img = _gradient(12, 19)
    payload = encode_baseline_jpeg(img, 90)
    df = spark.createDataFrame(
        [(1, "image", "image/jpeg", bytearray(payload), None)],
        "media_id long, kind string, mime string, payload binary, "
        "meta struct<width:int,height:int,duration_ms:long>",
    )
    row = decode_media(df, real_decode=True).collect()[0]
    f = row["features"]
    assert f[0] == 1.0 and f[1] == 19.0 and f[2] == 12.0 and f[3] == 255.0
    assert 0.0 <= f[9] <= 1.0  # mean luminance normalized


def test_registry_face_flags_all_true(spark):
    from doeecommerce_datapipeline_spark.multimodal.media import (
        jpeg_roundtrip_audit,
    )

    rows = jpeg_roundtrip_audit(spark, SF).collect()
    assert len(rows) > 0
    assert all(
        r["magic_ok"] and r["dims_match"] and r["max_err_le_bound"]
        for r in rows
    )


def test_resize_jpeg_real_pixels(spark):
    """The real resize stage: decode -> nearest-neighbor resample ->
    re-encode. Output payloads are valid JPEGs at the target dims and
    the resampled content tracks the source (exact index-map
    comparison on a flat-color image, where resampling is lossless up
    to codec error)."""
    from doeecommerce_datapipeline_spark.multimodal.decode import (
        resize_jpeg,
    )

    flat = np.full((20, 28, 3), 100, dtype=np.uint8)
    grad = _gradient(20, 28)
    rows = [
        (1, bytearray(encode_baseline_jpeg(flat, 90))),
        (2, bytearray(encode_baseline_jpeg(grad, 90))),
    ]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    got = {
        r["media_id"]: r for r in resize_jpeg(df, 9, 7).collect()
    }
    assert set(got) == {1, 2}
    for mid, r in got.items():
        assert (r["out_w"], r["out_h"]) == (9, 7)
        assert r["n_bytes_in"] > 0 and r["n_bytes_out"] > 0
        dec = decode_baseline_jpeg(bytes(r["payload"]))
        assert dec.shape == (7, 9, 3)
    # flat image survives the whole pipeline within codec error
    dec1 = decode_baseline_jpeg(bytes(got[1]["payload"]))
    assert np.abs(dec1.astype(int) - 100).max() <= 8


def test_resize_jpeg_rejects_bad_dims(spark):
    from doeecommerce_datapipeline_spark.multimodal.decode import (
        resize_jpeg,
    )

    df = spark.createDataFrame([(1, bytearray(b""))], "media_id long, payload binary")
    with pytest.raises(ValueError):
        resize_jpeg(df, 0, 4)


def test_fill_bytes_between_segments_tolerated():
    """B.1.1.2 padding: 0xFF fill bytes before a marker id must not
    desynchronize the segment walk (r8 ADVICE fix)."""
    img = _gradient(12, 12)
    data = bytes(encode_baseline_jpeg(img, 90))
    base = decode_baseline_jpeg(data)
    # inject fill bytes before the DQT, DHT, and SOF markers
    padded = data
    for marker in (b"\xff\xdb", b"\xff\xc4", b"\xff\xc0"):
        i = padded.find(marker)
        assert i >= 0
        padded = padded[:i] + b"\xff\xff\xff" + padded[i:]
    got = decode_baseline_jpeg(padded)
    assert np.array_equal(got, base)


def test_truncated_scan_raises_valueerror():
    """The documented malformed-stream contract is ValueError, even
    when the failure surfaces inside the entropy-coded scan (r8
    ADVICE fix: EOFError stays internal to the bit reader)."""
    img = _gradient(24, 24)
    data = bytes(encode_baseline_jpeg(img, 90))
    sos = data.find(b"\xff\xda")
    assert sos >= 0
    # cut the stream mid-scan (keep the headers + a few scan bytes)
    truncated = data[: sos + 20]
    with pytest.raises(ValueError):
        decode_baseline_jpeg(truncated)
    # garble the scan so a marker appears mid-MCU: also ValueError
    cut = data[: len(data) // 2] + b"\xff\xc0" + data[len(data) // 2 + 2 :]
    try:
        decode_baseline_jpeg(cut)
    except ValueError:
        pass
    except NotImplementedError:
        pass  # the garbled byte may masquerade as a SOF marker
