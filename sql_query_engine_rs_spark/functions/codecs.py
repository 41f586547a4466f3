"""Real media codecs for the multimodal seam — dependency-free.

``multimodal.py``'s plumbing (Arrow-batched mapInPandas, schemas,
partitioning) ships with deterministic STUB kernels because PIL/ffmpeg are
not in this container. This module proves the ``register_codec`` seam with
a REAL codec that needs nothing beyond the standard library: a PNG decoder
(zlib inflate + per-scanline un-filtering per the PNG spec, RFC 2083) that
parses actual image bytes into pixels, plus the matching minimal encoder
used by tests to build fixtures.

``png_image_decode`` satisfies the ``image_decode`` kernel contract
((payload) -> (width, height, feature list)) and slots into
``image_features`` via ``register_codec("image_decode", png_image_decode)``
— no Spark-side changes, which is exactly the claim the registry makes.
With PIL available, a production deployment would register
``lambda p: pil_decode(p)`` the same way; the contract and plumbing are
identical.

Supported PNG subset: 8-bit depth, non-interlaced, color types 0 (gray),
2 (RGB), 4 (gray+alpha), 6 (RGBA). Palette and 16-bit images raise
``NotImplementedError`` — a real pipeline routes those to a fuller decoder;
the subset here covers what the tests (and most ML thumbnail pipelines)
emit.
"""

from __future__ import annotations

import struct
import zlib

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def png_decode_pixels(payload: bytes):
    """Decode PNG bytes to (width, height, channels, pixel ndarray).

    The ndarray is uint8 with shape (height, width, channels). Implements
    the real format: chunk walk, IHDR parse, IDAT concatenation, zlib
    inflate, and all five scanline filters (None/Sub/Up/Average/Paeth).
    """
    import numpy as np

    if payload[:8] != _PNG_SIG:
        raise ValueError("not a PNG payload")
    pos = 8
    width = height = bit_depth = color_type = interlace = None
    idat = bytearray()
    while pos < len(payload):
        (length,) = struct.unpack(">I", payload[pos : pos + 4])
        ctype = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + length]
        pos += 12 + length  # length + type + data + crc
        if ctype == b"IHDR":
            width, height, bit_depth, color_type, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", data
            )
        elif ctype == b"IDAT":
            idat.extend(data)
        elif ctype == b"IEND":
            break
    if width is None:
        raise ValueError("PNG missing IHDR")
    if bit_depth != 8 or interlace != 0 or color_type not in _CHANNELS:
        raise NotImplementedError(
            f"PNG subset: bit_depth=8, non-interlaced, color_type in {sorted(_CHANNELS)}"
            f" (got depth={bit_depth}, interlace={interlace}, color={color_type})"
        )
    ch = _CHANNELS[color_type]
    raw = zlib.decompress(bytes(idat))
    stride = width * ch
    if len(raw) != height * (stride + 1):
        raise ValueError("PNG IDAT size mismatch")
    out = np.zeros((height, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int32)
    for y in range(height):
        off = y * (stride + 1)
        ftype = raw[off]
        line = np.frombuffer(raw, dtype=np.uint8, count=stride, offset=off + 1).astype(
            np.int32
        )
        if ftype == 0:  # None
            cur = line
        elif ftype == 1:  # Sub
            cur = line.copy()
            for x in range(ch, stride):
                cur[x] = (cur[x] + cur[x - ch]) & 0xFF
        elif ftype == 2:  # Up
            cur = (line + prev) & 0xFF
        elif ftype == 3:  # Average
            cur = line.copy()
            for x in range(stride):
                left = cur[x - ch] if x >= ch else 0
                cur[x] = (cur[x] + ((left + prev[x]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            cur = line.copy()
            for x in range(stride):
                left = cur[x - ch] if x >= ch else 0
                ul = prev[x - ch] if x >= ch else 0
                cur[x] = (cur[x] + _paeth(int(left), int(prev[x]), int(ul))) & 0xFF
        else:
            raise ValueError(f"bad PNG filter type {ftype}")
        out[y] = cur.astype(np.uint8)
        prev = cur
    return width, height, ch, out.reshape(height, width, ch)


def png_image_decode(payload: bytes) -> tuple[int, int, list[float]]:
    """``image_decode`` codec-contract wrapper over the real PNG decoder.

    Feature vector (8 floats, all in [0, 1], from ACTUAL pixel values):
    per-channel means for up to 4 channels (absent channels 0.0), then
    overall mean, std, min, max — the cheap image-quality signals a
    multimodal curation pass filters on (all-black/all-white detection,
    contrast flooring) before any model sees the bytes.
    """
    import numpy as np

    _w, _h, ch, px = png_decode_pixels(payload)
    flat = px.astype(np.float64) / 255.0
    chan_means = [float(flat[:, :, c].mean()) for c in range(ch)]
    chan_means += [0.0] * (4 - len(chan_means))
    feature = chan_means + [
        float(flat.mean()),
        float(flat.std()),
        float(flat.min()),
        float(flat.max()),
    ]
    return _w, _h, [round(f, 6) for f in feature]


def _chunk(ctype: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


def png_encode(pixels, filter_type: int = 0) -> bytes:
    """Minimal PNG encoder (test-fixture side of the codec pair).

    ``pixels``: uint8 ndarray (height, width, channels) with channels in
    {1, 2, 3, 4}. ``filter_type`` applies one filter to every scanline —
    tests use 0/1/2/4 to exercise each un-filter path in the decoder
    against the same pixel ground truth.
    """
    import numpy as np

    px = np.asarray(pixels, dtype=np.uint8)
    height, width, ch = px.shape
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[ch]
    stride = width * ch
    flat = px.reshape(height, stride).astype(np.int32)
    lines = bytearray()
    for y in range(height):
        cur = flat[y]
        prev = flat[y - 1] if y > 0 else np.zeros(stride, dtype=np.int32)
        if filter_type == 0:
            enc = cur
        elif filter_type == 1:
            left = np.concatenate([np.zeros(ch, dtype=np.int32), cur[:-ch]])
            enc = (cur - left) & 0xFF
        elif filter_type == 2:
            enc = (cur - prev) & 0xFF
        elif filter_type == 4:
            enc = cur.copy()
            for x in range(stride):
                left = int(cur[x - ch]) if x >= ch else 0
                ul = int(prev[x - ch]) if x >= ch else 0
                enc[x] = (int(cur[x]) - _paeth(left, int(prev[x]), ul)) & 0xFF
        else:
            raise ValueError(f"unsupported encoder filter {filter_type}")
        lines.append(filter_type)
        lines.extend(enc.astype(np.uint8).tobytes())
    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    return (
        _PNG_SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(lines)))
        + _chunk(b"IEND", b"")
    )


# ---------------------------------------------------------------- WAV / PCM

def wav_decode_pcm(payload: bytes):
    """RIFF/WAVE PCM decoder satisfying the ``audio_pcm`` kernel contract
    ((payload) -> int64 numpy array of mono samples). Dependency-free:
    chunk-walks the RIFF container, accepts PCM (format tag 1) at 8-bit
    unsigned or 16-bit signed little-endian, any channel count (multi-
    channel is downmixed by integer mean — floor division, deterministic on
    any platform). Registered via ``register_codec("audio_pcm",
    wav_decode_pcm)`` it drives real audio bytes through the unchanged
    ``audio_features`` windowed-RMS plumbing; a soundfile/librosa kernel
    swaps in the same way for compressed formats."""
    import numpy as np

    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        (size,) = struct.unpack("<I", payload[pos + 4 : pos + 8])
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("missing fmt/data chunk")
    audio_fmt, n_ch = struct.unpack("<HH", fmt[:4])
    (bits,) = struct.unpack("<H", fmt[14:16])
    if audio_fmt != 1 or bits not in (8, 16):
        raise NotImplementedError("only PCM 8/16-bit supported")
    if bits == 8:
        x = np.frombuffer(data, dtype=np.uint8).astype(np.int64) - 128
    else:
        x = np.frombuffer(data[: len(data) // 2 * 2], dtype="<i2").astype(np.int64)
    if n_ch > 1:
        x = x[: len(x) // n_ch * n_ch].reshape(-1, n_ch).sum(axis=1) // n_ch
    return x


def wav_encode(samples, sample_rate: int = 8000, bits: int = 16, channels: int = 1) -> bytes:
    """Minimal WAV writer for test fixtures: int samples (interleaved if
    ``channels`` > 1) -> RIFF/WAVE PCM bytes."""
    import numpy as np

    x = np.asarray(samples)
    if bits == 8:
        frames = (x + 128).astype(np.uint8).tobytes()
    elif bits == 16:
        frames = x.astype("<i2").tobytes()
    else:
        raise ValueError("bits must be 8 or 16")
    block = channels * bits // 8
    fmt = struct.pack("<HHIIHH", 1, channels, sample_rate, sample_rate * block, block, bits)
    body = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(frames)) + frames + (b"\0" if len(frames) & 1 else b"")
    return b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body
