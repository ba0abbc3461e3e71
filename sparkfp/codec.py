"""Vectorized PCM codecs.

The clip table carries opaque ``bytes`` + a ``codec`` tag
(BASELINE.json input_hint). Two codecs are real (pure numpy, fully
vectorized): ``pcm_s16le`` (16-bit little-endian linear PCM) and
``ulaw`` (G.711 mu-law, 8-bit). Anything else (mp3/ogg/aac would need
external decoder libs not present in this container) is stubbed behind
:class:`UnsupportedCodec` with the Spark-side plumbing kept real —
the decode UDF dispatches on the codec column per batch.

Decode invariant (input_hint): decoded PCM must match the
synthesizer's ground truth at SNR >= 30 dB; pcm_s16le round-trips at
~90 dB, ulaw at ~35 dB.
"""

from __future__ import annotations

import numpy as np

_ULAW_BIAS = 0x84
_ULAW_CLIP = 32635


class UnsupportedCodec(NotImplementedError):
    """Raised for codecs that need external decoder libraries.

    The engine treats these columns as opaque binary and keeps the
    schema/partitioning/UDF plumbing identical; only the inner
    decode call is stubbed (multimodal strategy, SURVEY.md §7).
    """


def encode(pcm: np.ndarray, codec: str) -> bytes:
    """float32 [-1,1] -> bytes under the named codec."""
    if codec == "pcm_s16le":
        return _f32_to_s16(pcm).tobytes()
    if codec == "ulaw":
        return _linear_to_ulaw(_f32_to_s16(pcm)).tobytes()
    raise UnsupportedCodec(codec)


def decode(raw: bytes, codec: str) -> np.ndarray:
    """bytes -> float32 PCM in [-1,1]. Fully vectorized numpy."""
    if codec == "pcm_s16le":
        return np.frombuffer(raw, dtype="<i2").astype(np.float32) / 32768.0
    if codec == "ulaw":
        s16 = _ulaw_to_linear(np.frombuffer(raw, dtype=np.uint8))
        return s16.astype(np.float32) / 32768.0
    raise UnsupportedCodec(codec)


def _f32_to_s16(pcm: np.ndarray) -> np.ndarray:
    return np.clip(np.asarray(pcm, dtype=np.float64) * 32767.0, -32768, 32767).astype(
        "<i2"
    )


def _linear_to_ulaw(s16: np.ndarray) -> np.ndarray:
    """G.711 mu-law compress (vectorized port of the public spec)."""
    x = s16.astype(np.int32)
    sign = np.where(x < 0, 0x80, 0x00).astype(np.uint8)
    mag = np.clip(np.abs(x), 0, _ULAW_CLIP) + _ULAW_BIAS
    exp = (np.floor(np.log2(mag)) - 7).clip(0, 7).astype(np.int32)
    mant = (mag >> (exp + 3)) & 0x0F
    return (~(sign | (exp.astype(np.uint8) << 4) | mant.astype(np.uint8))).astype(
        np.uint8
    )


def _ulaw_to_linear(u: np.ndarray) -> np.ndarray:
    """G.711 mu-law expand (vectorized)."""
    u = (~u).astype(np.int32)
    sign = u & 0x80
    exp = (u >> 4) & 0x07
    mant = u & 0x0F
    mag = ((mant << 3) + _ULAW_BIAS) << exp
    mag = mag - _ULAW_BIAS
    return np.where(sign != 0, -mag, mag).astype(np.int16)


# ----------------------- image codecs (pure numpy, public formats) ---
#
# BMP (Windows DIB, BITMAPINFOHEADER) and PPM (netpbm P6) are
# uncompressed public formats decodable with numpy alone — they make
# the multimodal frame path REAL for image rows in this container,
# shrinking the deterministic-fake surface to jpeg/video (which need
# Pillow/ffmpeg). Both decoders return HxWx3 uint8 RGB.

IMAGE_CODECS = {"bmp", "ppm"}

_BMP_FILE_HEADER = 14
_BMP_INFO_HEADER = 40


def encode_image(img: np.ndarray, codec: str) -> bytes:
    """HxWx3 uint8 RGB -> bytes (bmp: 24-bit BI_RGB bottom-up; ppm: P6)."""
    img = np.ascontiguousarray(img, dtype=np.uint8)
    if img.ndim != 3 or img.shape[2] != 3:
        raise ValueError(f"expected HxWx3 RGB, got shape {img.shape}")
    h, w, _ = img.shape
    if codec == "bmp":
        stride = (3 * w + 3) // 4 * 4
        rows = np.zeros((h, stride), dtype=np.uint8)
        rows[:, : 3 * w] = img[::-1, :, ::-1].reshape(h, 3 * w)  # bottom-up BGR
        pix = rows.tobytes()
        off = _BMP_FILE_HEADER + _BMP_INFO_HEADER
        import struct

        header = struct.pack("<2sIHHI", b"BM", off + len(pix), 0, 0, off)
        info = struct.pack(
            "<IiiHHIIiiII", _BMP_INFO_HEADER, w, h, 1, 24, 0, len(pix), 2835, 2835, 0, 0
        )
        return header + info + pix
    if codec == "ppm":
        return b"P6\n%d %d\n255\n" % (w, h) + img.tobytes()
    raise UnsupportedCodec(codec)


def decode_image(raw: bytes, codec: str) -> np.ndarray:
    """bytes -> HxWx3 uint8 RGB. BMP supports 24/32-bit uncompressed
    (BI_RGB), bottom-up and top-down; PPM supports binary P6 with
    comments. Vectorized: one frombuffer + strided reshape per image."""
    if codec == "bmp":
        return _decode_bmp(raw)
    if codec == "ppm":
        return _decode_ppm(raw)
    raise UnsupportedCodec(codec)


def _decode_bmp(raw: bytes) -> np.ndarray:
    import struct

    if len(raw) < _BMP_FILE_HEADER + _BMP_INFO_HEADER or raw[:2] != b"BM":
        raise ValueError("not a BMP file")
    (off,) = struct.unpack_from("<I", raw, 10)
    hdr_size, w, h_signed, _planes, bpp, comp = struct.unpack_from(
        "<IiiHHI", raw, _BMP_FILE_HEADER
    )
    if hdr_size < _BMP_INFO_HEADER:
        raise ValueError(f"unsupported BMP header size {hdr_size}")
    if comp != 0:
        raise UnsupportedCodec(f"bmp compression {comp}")
    if bpp not in (24, 32):
        raise UnsupportedCodec(f"bmp {bpp}bpp")
    top_down = h_signed < 0
    h = -h_signed if top_down else h_signed
    if w <= 0 or h <= 0:
        raise ValueError(f"bad BMP dimensions {w}x{h_signed}")
    nch = bpp // 8
    stride = (nch * w + 3) // 4 * 4
    end = off + stride * h
    if end > len(raw):
        raise ValueError("truncated BMP pixel data")
    rows = np.frombuffer(raw, dtype=np.uint8, count=stride * h, offset=off)
    rows = rows.reshape(h, stride)[:, : nch * w].reshape(h, w, nch)
    rgb = rows[:, :, 2::-1]  # BGR(A) -> RGB, alpha dropped
    if not top_down:
        rgb = rgb[::-1]
    return np.ascontiguousarray(rgb)


def _decode_ppm(raw: bytes) -> np.ndarray:
    if raw[:2] != b"P6":
        raise ValueError("not a binary PPM (P6) file")
    # header = magic, width, height, maxval as whitespace-separated
    # tokens; '#' comments run to end of line. Exactly one whitespace
    # byte follows maxval before the pixel data.
    pos, tokens = 2, []
    while len(tokens) < 3:
        while pos < len(raw) and raw[pos : pos + 1].isspace():
            pos += 1
        if pos < len(raw) and raw[pos : pos + 1] == b"#":
            while pos < len(raw) and raw[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(raw) and not raw[pos : pos + 1].isspace():
            pos += 1
        if pos == start:
            raise ValueError("truncated PPM header")
        tokens.append(raw[start:pos])
    pos += 1  # the single whitespace after maxval
    w, h, maxval = (int(t) for t in tokens)
    if maxval != 255:
        raise UnsupportedCodec(f"ppm maxval {maxval}")
    need = 3 * w * h
    if len(raw) - pos < need:
        raise ValueError("truncated PPM pixel data")
    return (
        np.frombuffer(raw, dtype=np.uint8, count=need, offset=pos)
        .reshape(h, w, 3)
        .copy()
    )


def snr_db(reference: np.ndarray, decoded: np.ndarray) -> float:
    """Signal-to-noise ratio of `decoded` against ground-truth `reference`."""
    n = min(len(reference), len(decoded))
    ref = np.asarray(reference[:n], dtype=np.float64)
    err = ref - np.asarray(decoded[:n], dtype=np.float64)
    p_sig = float(np.mean(ref**2))
    p_err = float(np.mean(err**2))
    if p_err == 0:
        return float("inf")
    return 10.0 * np.log10(p_sig / max(p_err, 1e-30))
