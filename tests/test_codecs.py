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


# ------------------------------------------------------------- WAV / audio

from sql_query_engine_rs_spark.functions.codecs import wav_decode_pcm, wav_encode


@pytest.mark.parametrize("bits,channels", [(8, 1), (16, 1), (16, 2)])
def test_wav_roundtrip(bits, channels):
    """8/16-bit mono and 16-bit stereo survive encode->decode exactly
    (stereo downmixed by integer mean, floor semantics)."""
    rng = np.random.RandomState(bits * 10 + channels)
    lo, hi = (-128, 128) if bits == 8 else (-32768, 32768)
    s = rng.randint(lo, hi, 640 * channels)
    decoded = wav_decode_pcm(wav_encode(s, bits=bits, channels=channels))
    if channels == 1:
        assert np.array_equal(decoded, s)
    else:
        assert np.array_equal(decoded, s.reshape(-1, channels).sum(axis=1) // channels)


def test_wav_decode_rejects_non_wav():
    with pytest.raises(ValueError):
        wav_decode_pcm(b"not audio at all, sorry")
    with pytest.raises(NotImplementedError):
        # float32 WAV (format tag 3) is out of scope for the minimal codec
        bad = bytearray(wav_encode(np.zeros(4, dtype=np.int64)))
        bad[20] = 3
        wav_decode_pcm(bytes(bad))


def test_real_wav_codec_through_spark_seam(spark):
    """register_codec("audio_pcm", wav_decode_pcm) + the unchanged
    audio_features plumbing: Spark parses real RIFF/WAVE bytes inside the
    Arrow-batched mapInPandas stage; rows match a local replay of the
    integer-domain window math on the decoded samples."""
    import math

    from sql_query_engine_rs_spark.functions.multimodal import (
        audio_features,
        register_codec,
        reset_codec,
    )

    window_ms, sample_rate = 500, 8000
    spw = sample_rate * window_ms // 1000
    items, expected = [], {}
    for i in range(4):
        rng = np.random.RandomState(300 + i)
        n = spw * (i + 1) + (i * 37)  # ragged tails across items
        s = rng.randint(-32768, 32768, n)
        payload = wav_encode(s, sample_rate=sample_rate, bits=16)
        items.append((i, bytearray(payload)))
        rows = []
        pcm = wav_decode_pcm(payload)
        for w in range(max(1, len(pcm) // spw)):
            seg = pcm[w * spw : (w + 1) * spw]
            sum_sq = int((seg * seg).sum())
            neg = seg < 0
            rows.append(
                (w, w * window_ms, math.sqrt(sum_sq / (len(seg) * 16384.0)),
                 int(np.sum(neg[1:] != neg[:-1])))
            )
        expected[i] = rows
    df = spark.createDataFrame(items, "item_id long, payload binary")
    register_codec("audio_pcm", wav_decode_pcm)
    try:
        got = audio_features(df, window_ms=window_ms, sample_rate=sample_rate).collect()
    finally:
        reset_codec("audio_pcm")
    assert len(got) == sum(len(v) for v in expected.values())
    for r in got:
        w, start_ms, rms, zc = expected[r.item_id][r.window_idx]
        assert (r.start_ms, r.zero_crossings) == (start_ms, zc)
        assert r.rms == pytest.approx(rms, abs=1e-12)

def test_real_codec_under_driver_value_hash(spark):
    """The real-PNG seam under the DRIVER's exact comparison, not approx:
    rows canonicalized the way the correctness gate canonicalizes them
    (column-name sort, floats rounded to 9dp, arrays stringified) must be
    IDENTICAL to a local replay of png_image_decode on the same payloads —
    the same bar a registered stub-codec oracle row has to clear, applied
    to genuine decoded bytes (r9 verdict item 7)."""
    import math

    from sql_query_engine_rs_spark.functions.multimodal import (
        image_features,
        register_codec,
        reset_codec,
    )

    def normalize(value):
        if value is None:
            return None
        if isinstance(value, bool):
            return float(value)
        if isinstance(value, float):
            return "NaN" if math.isnan(value) else round(value, 9)
        if isinstance(value, int):
            return value
        return str(value)

    def canonical(rows, columns):
        order = sorted(range(len(columns)), key=lambda i: columns[i])
        out = [tuple(normalize(row[i]) for i in order) for row in rows]
        return sorted(out, key=lambda r: tuple((x is None, str(x)) for x in r))

    items, local = [], []
    for i in range(8):
        px = _rng_pixels(6 + i, 4 + i, [1, 2, 3, 4][i % 4], seed=900 + i)
        payload = png_encode(px, filter_type=[0, 1, 2, 4][i % 4])
        items.append((i, bytearray(payload)))
        w, h, feat = png_image_decode(payload)
        # the plumbing's feature column is array<float> (float32): the
        # local replay must round-trip through float32 the same way or
        # the stringified canonical form diverges in the widened digits
        local.append((i, w, h, len(payload), [float(np.float32(f)) for f in feat]))

    df = spark.createDataFrame(items, "item_id long, payload binary")
    register_codec("image_decode", png_image_decode)
    try:
        got = image_features(df)
        cols = got.columns
        srows = [tuple(r) for r in got.collect()]
    finally:
        reset_codec("image_decode")
    want_cols = ["item_id", "width", "height", "n_bytes", "feature"]
    assert sorted(cols) == sorted(want_cols)
    want = [tuple(rec[want_cols.index(c)] for c in cols) for rec in local]
    assert canonical(srows, cols) == canonical(want, cols)
