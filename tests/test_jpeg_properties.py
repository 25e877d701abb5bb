"""Property-based tests (hypothesis) for the baseline JPEG codec and
the Luhn validator — randomized inputs catch the corner the fixture
grid misses (odd dims x subsampling x restart interactions, digit
patterns around the checksum boundary)."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st


def _random_img(draw, max_dim=33):
    h = draw(st.integers(1, max_dim))
    w = draw(st.integers(1, max_dim))
    seed = draw(st.integers(0, 2**31 - 1))
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, (h, w, 3), dtype=np.uint8)


@st.composite
def _imgs(draw):
    return _random_img(draw)


@settings(max_examples=30, deadline=None)
@given(img=_imgs(), quality=st.integers(30, 95))
def test_roundtrip_shape_and_type_any_dims(img, quality):
    from doeecommerce_datapipeline_spark.multimodal.jpeg import (
        decode_baseline_jpeg,
        encode_baseline_jpeg,
    )

    dec = decode_baseline_jpeg(encode_baseline_jpeg(img, quality=quality))
    assert dec.shape == img.shape and dec.dtype == np.uint8


@settings(max_examples=20, deadline=None)
@given(
    img=_imgs(),
    sub=st.booleans(),
    ri=st.integers(1, 5),
)
def test_restart_streams_decode_identically(img, sub, ri):
    """For ANY image/layout, the RSTn-segmented stream must decode to
    exactly the same pixels as the unsegmented one (predictor reset +
    byte realignment are lossless plumbing)."""
    from doeecommerce_datapipeline_spark.multimodal.jpeg import (
        decode_baseline_jpeg,
        encode_baseline_jpeg,
    )

    base = decode_baseline_jpeg(
        encode_baseline_jpeg(img, 85, subsample_420=sub)
    )
    seg = decode_baseline_jpeg(
        encode_baseline_jpeg(img, 85, subsample_420=sub, restart_interval=ri)
    )
    assert np.array_equal(base, seg)


@settings(max_examples=30, deadline=None)
@given(img=_imgs())
def test_high_quality_444_error_bound(img):
    """At quality 90, 4:4:4: reconstruction error on arbitrary noise
    stays within the quantization budget (measured max 46 on the
    fixture corpus; 96 — the audit contract, decode.JPEG_MAX_ABS_ERR —
    covers the randomized worst case with margin while still failing
    hard on a real codec bug, which lands >=128)."""
    from doeecommerce_datapipeline_spark.multimodal.jpeg import (
        decode_baseline_jpeg,
        encode_baseline_jpeg,
    )

    dec = decode_baseline_jpeg(encode_baseline_jpeg(img, 90))
    assert np.abs(dec.astype(int) - img.astype(int)).max() <= 96


def _luhn_reference(digits: str) -> bool:
    """Textbook Luhn over a digit string (rightmost digit is the check
    digit) — an independent implementation to pin the Spark fold."""
    total = 0
    for i, ch in enumerate(reversed(digits)):
        d = int(ch)
        if i % 2 == 1:
            d *= 2
            if d > 9:
                d -= 9
        total += d
    return total % 10 == 0


@settings(max_examples=25, deadline=None)
@given(
    nums=st.lists(
        st.integers(0, 10**16 - 1), min_size=1, max_size=8, unique=True
    )
)
def test_luhn_fold_matches_reference(spark, nums):
    """The Spark transform/aggregate Luhn fold must agree with the
    textbook implementation on arbitrary 16-digit candidates."""
    from pyspark.sql import functions as F

    from doeecommerce_datapipeline_spark.operators.pii import luhn_valid

    cands = []
    for n in nums:
        d = f"{n:016d}"
        cands.append(f"{d[:4]}-{d[4:8]}-{d[8:12]}-{d[12:]}")
    df = spark.createDataFrame([(c,) for c in cands], "cand string")
    got = {
        r["cand"]: r["ok"]
        for r in df.select(
            "cand", luhn_valid(F.col("cand")).alias("ok")
        ).collect()
    }
    for c in cands:
        assert got[c] == _luhn_reference(c.replace("-", "")), c


@settings(max_examples=40, deadline=None)
@given(
    img=_imgs(),
    ch=st.sampled_from([1, 3, 4]),
    level=st.integers(1, 9),
)
def test_png_roundtrip_lossless_any_dims(img, ch, level):
    """PNG (r8): encode->decode is EXACT for every shape, channel
    count, and zlib level — lossless is the whole contract, so any
    single-byte divergence is a filter/unfilter bug."""
    from doeecommerce_datapipeline_spark.multimodal.png import (
        decode_png,
        encode_png,
    )

    if ch == 1:
        src = img[:, :, 0]
    elif ch == 3:
        src = img
    else:
        src = np.concatenate([img, img[:, :, :1]], axis=2)
    dec = decode_png(encode_png(src, level=level))
    assert dec.shape == src.shape and dec.dtype == np.uint8
    assert np.array_equal(dec, src)
