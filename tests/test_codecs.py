"""The multimodal codec seam with a REAL codec: the dependency-free PNG
decoder (functions/codecs.py) registered through ``register_codec`` and
driven through the actual ``image_features`` mapInPandas plumbing —
proving the "production codecs swap in without plumbing changes" claim
with genuine image decoding, not a stub."""

from __future__ import annotations

import numpy as np
import pytest

from sql_query_engine_rs_spark.functions.codecs import (
    png_decode_pixels,
    png_encode,
    png_image_decode,
)


def _rng_pixels(h, w, ch, seed):
    rng = np.random.RandomState(seed)
    return rng.randint(0, 256, size=(h, w, ch), dtype=np.uint8)


@pytest.mark.parametrize("filter_type", [0, 1, 2, 4])
@pytest.mark.parametrize("channels", [1, 2, 3, 4])
def test_png_roundtrip_all_filters(filter_type, channels):
    """Every supported channel count survives encode->decode bit-exactly
    under each scanline filter — the un-filter paths (None/Sub/Up/Paeth)
    each reconstruct the same ground-truth pixels."""
    px = _rng_pixels(13, 7, channels, seed=filter_type * 10 + channels)
    payload = png_encode(px, filter_type=filter_type)
    w, h, ch, decoded = png_decode_pixels(payload)
    assert (w, h, ch) == (7, 13, channels)
    assert np.array_equal(decoded, px)


def test_png_decode_rejects_non_png():
    with pytest.raises(ValueError):
        png_decode_pixels(b"definitely not a png")


def test_png_feature_contract():
    """The image_decode-contract wrapper computes its features from ACTUAL
    pixel values: a constant-color image yields exactly that color's
    normalized mean, zero std, min == max."""
    px = np.full((4, 6, 3), 51, dtype=np.uint8)  # 51/255 = 0.2
    w, h, feat = png_image_decode(png_encode(px))
    assert (w, h) == (6, 4)
    assert len(feat) == 8
    r, g, b, a, mean, std, mn, mx = feat
    assert r == g == b == pytest.approx(0.2)
    assert a == 0.0  # absent channel
    assert mean == pytest.approx(0.2) and std == 0.0
    assert mn == mx == pytest.approx(0.2)


def test_real_codec_through_spark_seam(spark):
    """register_codec("image_decode", png_image_decode) + the unchanged
    image_features plumbing: Spark decodes real PNG bytes inside the
    Arrow-batched mapInPandas stage and the emitted rows hash-match the
    locally computed ground truth."""
    from sql_query_engine_rs_spark.functions.multimodal import (
        image_features,
        register_codec,
        reset_codec,
    )

    items = []
    expected = {}
    for i in range(6):
        px = _rng_pixels(8 + i, 5 + i, [1, 2, 3, 4][i % 4], seed=100 + i)
        payload = png_encode(px, filter_type=[0, 1, 2, 4][i % 4])
        items.append((i, bytearray(payload)))
        expected[i] = png_image_decode(payload)

    df = spark.createDataFrame(items, "item_id long, payload binary")
    register_codec("image_decode", png_image_decode)
    try:
        rows = image_features(df).collect()
    finally:
        reset_codec("image_decode")
    assert len(rows) == 6
    for r in rows:
        w, h, feat = expected[r.item_id]
        assert (r.width, r.height) == (w, h)
        assert [pytest.approx(f, abs=1e-6) for f in feat] == list(r.feature)
    # and after reset, the stub is back (seam restores cleanly)
    stub_rows = image_features(df).collect()
    assert any(
        (r.width, r.height) != (expected[r.item_id][0], expected[r.item_id][1])
        for r in stub_rows
    )
