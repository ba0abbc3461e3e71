"""Vectorized PCM codecs.

The clip table carries opaque ``bytes`` + a ``codec`` tag
(BASELINE.json input_hint). Real codecs (pure numpy, vectorized):
``pcm_s16le``, ``ulaw`` / ``alaw`` (G.711), ``wav`` (RIFF: integer
PCM 8/16/24/32-bit, IEEE float32/64, G.711 payload tags 6/7, and
WAVE_FORMAT_EXTENSIBLE routing), ``adpcm`` (IMA ADPCM in RIFF),
``aiff`` / ``au`` (the big-endian Mac/Sun containers),
``mp1`` / ``mp2`` (MPEG-1 Audio
Layers I and II, sparkfp/mpeg_audio.py), and ``flac`` (lossless,
sparkfp/flac.py). What's left (mp3 Layer III / ogg / aac would need
external decoder libs not present in this container) is stubbed
behind :class:`UnsupportedCodec` with the Spark-side plumbing kept
real — the decode UDF dispatches on the codec column per batch.

Decode invariant (input_hint): decoded PCM must match the
synthesizer's ground truth at SNR >= 30 dB; pcm_s16le and flac
round-trip at ~90 dB (bit-exact at s16), ulaw at ~35 dB, mp1 at
~40 dB (320 kbps).
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


def encode(pcm: np.ndarray, codec: str, sr_hz: int = 8000) -> bytes:
    """float32 [-1,1] -> bytes under the named codec."""
    if codec == "pcm_s16le":
        return _f32_to_s16(pcm).tobytes()
    if codec == "ulaw":
        return _linear_to_ulaw(_f32_to_s16(pcm)).tobytes()
    if codec == "alaw":
        return _linear_to_alaw(_f32_to_s16(pcm)).tobytes()
    if codec == "wav":
        return _encode_wav(_f32_to_s16(pcm), sr_hz)
    if codec == "adpcm":
        return _encode_adpcm_wav(_f32_to_s16(pcm), sr_hz)
    if codec == "aiff":
        return encode_aiff(pcm, sr_hz)
    if codec == "au":
        return encode_au(pcm, sr_hz)
    if codec == "mp1":
        from . import mpeg_audio  # deferred: mpeg_audio imports back

        return mpeg_audio.encode_mp1(pcm, sr_hz)
    if codec == "mp2":
        from . import mpeg_audio  # deferred: mpeg_audio imports back

        return mpeg_audio.encode_mp2(pcm, sr_hz)
    if codec == "flac":
        from . import flac  # deferred: flac imports back

        return flac.encode_flac(pcm, sr_hz)
    raise UnsupportedCodec(codec)


def decode(raw: bytes, codec: str) -> np.ndarray:
    """bytes -> float32 PCM in [-1,1]. Fully vectorized numpy."""
    if codec == "pcm_s16le":
        return np.frombuffer(raw, dtype="<i2").astype(np.float32) / 32768.0
    if codec == "ulaw":
        s16 = _ulaw_to_linear(np.frombuffer(raw, dtype=np.uint8))
        return s16.astype(np.float32) / 32768.0
    if codec == "alaw":
        s16 = _alaw_to_linear(np.frombuffer(raw, dtype=np.uint8))
        return s16.astype(np.float32) / 32768.0
    if codec in ("wav", "adpcm"):
        # both live in a RIFF/WAVE container; the chunk walk routes on
        # the fmt tag (1 = linear PCM, 0x11 = IMA ADPCM)
        return _decode_wav(raw)
    if codec == "aiff":
        return _decode_aiff(raw)
    if codec == "au":
        return _decode_au(raw)
    if codec == "mp1":
        from . import mpeg_audio  # deferred: mpeg_audio imports back

        return mpeg_audio.decode_mp1(raw)[0]
    if codec == "mp2":
        from . import mpeg_audio  # deferred: mpeg_audio imports back

        return mpeg_audio.decode_mp2(raw)[0]
    if codec == "flac":
        from . import flac  # deferred: flac imports back

        return flac.decode_flac(raw)[0]
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


def _linear_to_alaw(s16: np.ndarray) -> np.ndarray:
    """G.711 A-law compress, vectorized port of the published
    reference formulation (13-bit arithmetic-shift magnitude,
    segment search over {0x1F..0xFFF}, even bits inverted)."""
    p13 = s16.astype(np.int32) >> 3  # arithmetic shift, like the spec
    positive = p13 >= 0
    mag = np.where(positive, p13, -p13 - 1)
    # segment ends are (32 << s) - 1: seg = s iff mag >= 32 << (s-1)
    seg = np.zeros_like(mag)
    for s in range(1, 8):
        seg = np.where(mag >= (32 << (s - 1)), s, seg)
    sat = mag > 0xFFF  # beyond the top segment saturates to 0x7F
    mant = np.where(seg < 2, (mag >> 1) & 0x0F, (mag >> seg) & 0x0F)
    aval = np.where(sat, 0x7F, (seg << 4) | mant)
    mask = np.where(positive, 0xD5, 0x55)
    return (aval ^ mask).astype(np.uint8)


def _alaw_to_linear(a: np.ndarray) -> np.ndarray:
    """G.711 A-law expand (vectorized): mag = (mant<<4)+8 in segment 0,
    ((mant<<4)+0x108)<<(seg-1) above; sign bit SET means positive."""
    v = a.astype(np.int32) ^ 0x55
    seg = (v >> 4) & 0x07
    mant = v & 0x0F
    mag = np.where(
        seg == 0,
        (mant << 4) + 8,
        ((mant << 4) + 0x108) << np.maximum(seg - 1, 0),
    )
    return np.where(v & 0x80, mag, -mag).astype(np.int16)


def _encode_wav(s16: np.ndarray, sr_hz: int) -> bytes:
    """Mono 16-bit PCM RIFF/WAVE container."""
    import struct

    data = s16.astype("<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, sr_hz, sr_hz * 2, 2, 16)
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


# WAVE_FORMAT_EXTENSIBLE SubFormat GUIDs are <effective tag:2 LE
# bytes> + this fixed 14-byte suffix (Microsoft media-type namespace)
_WAVE_EXT_GUID_SUFFIX = (
    b"\x00\x00\x00\x00\x10\x00\x80\x00\x00\xaa\x00\x38\x9b\x71"
)


def _decode_wav(raw: bytes) -> np.ndarray:
    """RIFF/WAVE chunk walk -> float32 PCM in [-1,1]. Supports mono or
    multi-channel integer PCM at 8/16/24/32 bit (format tag 1), IEEE
    float32/float64 (tag 3), G.711 A-law/mu-law payloads (tags 6/7),
    mono IMA ADPCM (tag 0x11), and WAVE_FORMAT_EXTENSIBLE (0xFFFE)
    routed on the SubFormat GUID — the shapes a mixed web corpus of
    RIFF files actually contains. Channels are averaged to mono,
    matching the decode contract's single-series output.
    Foreign-writer extras (LIST/fact chunks, padded sizes) are
    skipped by the chunk walk."""
    import struct

    if len(raw) < 12 or raw[:4] != b"RIFF" or raw[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos, fmt, data, fact = 12, None, None, None
    while pos + 8 <= len(raw):
        cid = raw[pos: pos + 4]
        (size,) = struct.unpack_from("<I", raw, pos + 4)
        body = raw[pos + 8: pos + 8 + size]
        if len(body) < size:
            raise ValueError("truncated WAV chunk")
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            data = body
        elif cid == b"fact" and size >= 4:
            (fact,) = struct.unpack_from("<I", body, 0)
        pos += 8 + size + (size & 1)  # RIFF chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("missing WAV fmt/data chunk")
    if len(fmt) < 16:
        # an honestly-declared short fmt chunk passes the truncation
        # check above but would raise struct.error here — keep the
        # ValueError contract the media path catches per-row
        raise ValueError(f"short WAV fmt chunk ({len(fmt)} bytes)")
    tag, nch, _sr, _bps_avg, block, bits = struct.unpack_from("<HHIIHH", fmt, 0)
    if tag == 0xFFFE:
        # extensible: cbSize(2) validBits(2) channelMask(4) GUID(16)
        if len(fmt) < 40:
            raise ValueError(f"short extensible WAV fmt chunk ({len(fmt)})")
        guid = fmt[24:40]
        if guid[2:] != _WAVE_EXT_GUID_SUFFIX:
            raise UnsupportedCodec(f"wav extensible SubFormat {guid.hex()}")
        (tag,) = struct.unpack_from("<H", guid, 0)
    if tag == 0x11 and bits == 4:
        if nch != 1:
            raise UnsupportedCodec(f"{nch}-channel IMA ADPCM")
        return _decode_adpcm_blocks(data, block, fact)
    if nch < 1:
        raise ValueError(f"bad WAV channel count {nch}")
    if tag == 1 and bits == 16:
        # the original path, kept byte-identical (fixtures pin it):
        # integer channel mean first, then one normalize
        pcm = np.frombuffer(data, dtype="<i2", count=len(data) // 2)
        if nch > 1:
            pcm = pcm[: len(pcm) - len(pcm) % nch].reshape(-1, nch).mean(axis=1)
        return (pcm.astype(np.float32) / 32768.0).astype(np.float32)
    if tag == 1 and bits == 8:
        # 8-bit PCM is unsigned with 128 = silence, per the RIFF spec
        f = (np.frombuffer(data, dtype=np.uint8).astype(np.float64) - 128.0) / 128.0
    elif tag == 1 and bits == 24:
        b = np.frombuffer(data, dtype=np.uint8, count=len(data) - len(data) % 3)
        b = b.reshape(-1, 3).astype(np.int32)
        s = b[:, 0] | (b[:, 1] << 8) | (b[:, 2] << 16)
        s = np.where(s >= 1 << 23, s - (1 << 24), s)  # sign-extend
        f = s.astype(np.float64) / float(1 << 23)
    elif tag == 1 and bits == 32:
        f = np.frombuffer(data, dtype="<i4").astype(np.float64) / float(1 << 31)
    elif tag == 3 and bits == 32:
        f = np.frombuffer(data, dtype="<f4").astype(np.float64)
    elif tag == 3 and bits == 64:
        f = np.frombuffer(data, dtype="<f8").astype(np.float64)
    elif tag == 6 and bits == 8:
        f = _alaw_to_linear(np.frombuffer(data, dtype=np.uint8)).astype(
            np.float64) / 32768.0
    elif tag == 7 and bits == 8:
        f = _ulaw_to_linear(np.frombuffer(data, dtype=np.uint8)).astype(
            np.float64) / 32768.0
    else:
        raise UnsupportedCodec(f"wav format tag {tag} / {bits}-bit")
    if nch > 1:
        f = f[: len(f) - len(f) % nch].reshape(-1, nch).mean(axis=1)
    return f.astype(np.float32)


def encode_wav_variant(
    pcm: np.ndarray,
    sr_hz: int = 8000,
    bits: int = 16,
    sample_format: str = "pcm",
    extensible: bool = False,
) -> bytes:
    """float32/float64 [-1,1] -> RIFF/WAVE bytes in one of the breadth
    formats ``_decode_wav`` accepts: integer PCM at 8/16/24/32 bit
    (``sample_format='pcm'``), IEEE float32/64 (``'float'``), or G.711
    payloads (``'alaw'``/``'ulaw'``, 8-bit). ``pcm`` is ``(n,)`` mono
    or ``(n, nch)`` multi-channel (interleaved on write).
    ``extensible=True`` wraps the format in WAVE_FORMAT_EXTENSIBLE
    (tag 0xFFFE + SubFormat GUID), the container modern writers emit
    for >16-bit or multi-channel files."""
    import struct

    x = np.asarray(pcm, dtype=np.float64)
    if x.ndim == 1:
        x = x[:, None]
    nch = x.shape[1]
    if sample_format == "pcm" and bits == 8:
        tag = 1
        payload = (
            np.clip(np.round(x * 127.0) + 128.0, 0, 255)
            .astype(np.uint8).tobytes()
        )
    elif sample_format == "pcm" and bits == 16:
        tag = 1
        payload = _f32_to_s16(x.ravel()).tobytes()
    elif sample_format == "pcm" and bits == 24:
        tag = 1
        s = np.clip(
            np.round(x * float((1 << 23) - 1)), -(1 << 23), (1 << 23) - 1
        ).astype(np.int32).ravel()
        u = np.where(s < 0, s + (1 << 24), s).astype(np.uint32)
        out = np.empty((len(u), 3), dtype=np.uint8)
        out[:, 0] = u & 0xFF
        out[:, 1] = (u >> 8) & 0xFF
        out[:, 2] = (u >> 16) & 0xFF
        payload = out.tobytes()
    elif sample_format == "pcm" and bits == 32:
        tag = 1
        payload = np.clip(
            np.round(x * float((1 << 31) - 1)), -(1 << 31), (1 << 31) - 1
        ).astype("<i4").ravel().tobytes()
    elif sample_format == "float" and bits == 32:
        tag = 3
        payload = x.astype("<f4").ravel().tobytes()
    elif sample_format == "float" and bits == 64:
        tag = 3
        payload = x.astype("<f8").ravel().tobytes()
    elif sample_format == "alaw" and bits == 8:
        tag = 6
        payload = _linear_to_alaw(_f32_to_s16(x.ravel())).tobytes()
    elif sample_format == "ulaw" and bits == 8:
        tag = 7
        payload = _linear_to_ulaw(_f32_to_s16(x.ravel())).tobytes()
    else:
        raise ValueError(f"unsupported wav variant {sample_format}/{bits}")
    block = nch * bits // 8
    if extensible:
        guid = struct.pack("<H", tag) + _WAVE_EXT_GUID_SUFFIX
        fmt = struct.pack(
            "<HHIIHHHHI", 0xFFFE, nch, sr_hz, sr_hz * block, block, bits,
            22, bits, 0,
        ) + guid
    else:
        fmt = struct.pack("<HHIIHH", tag, nch, sr_hz, sr_hz * block, block, bits)
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(payload)) + payload
    )
    if len(payload) & 1:
        body += b"\x00"  # RIFF word alignment pad
    return b"RIFF" + struct.pack("<I", len(body)) + body


# ----------------------- IMA/DVI ADPCM (WAVE format tag 0x11) -------
#
# 4-bit adaptive-delta coding, the classic telephony/game format: each
# 256-byte block is an independent chain (4-byte header = seed
# predictor + step index, then 504 nibbles), so the engine vectorizes
# ACROSS blocks — numpy arrays hold every block's predictor/step state
# and the only Python loop is the 504 in-block positions, exactly the
# lockstep trick a 10^12-clip cluster run needs (per-clip nibble loops
# would be the slow path). The quantizer tables below are the spec
# contract (IMA ADPCM reference algorithm); the oracle restates them
# independently. Reference parity anchor: the reference treats codecs
# as an opaque decode boundary (src/flink_job/serialization.py:14-20).

_IMA_STEPS = np.array([
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31,
    34, 37, 41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143,
    157, 173, 190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494,
    544, 598, 658, 724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552,
    1707, 1878, 2066, 2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428,
    4871, 5358, 5894, 6484, 7132, 7845, 8630, 9493, 10442, 11487,
    12635, 13899, 15289, 16818, 18500, 20350, 22385, 24623, 27086,
    29794, 32767,
], dtype=np.int32)
_IMA_INDEX = np.array([-1, -1, -1, -1, 2, 4, 6, 8], dtype=np.int32)
_ADPCM_BLOCK = 256  # bytes/block: 4 header + 252 data -> 505 samples


def _adpcm_reconstruct(pred, idx, code):
    """One IMA step for a vector of blocks: dequantize `code` against
    each block's current step, update predictor + step index."""
    step = _IMA_STEPS[idx]
    diffq = (
        (step >> 3)
        + np.where(code & 4, step, 0)
        + np.where(code & 2, step >> 1, 0)
        + np.where(code & 1, step >> 2, 0)
    )
    pred = np.clip(pred + np.where(code & 8, -diffq, diffq), -32768, 32767)
    idx = np.clip(idx + _IMA_INDEX[code & 7], 0, 88)
    return pred, idx


def _encode_adpcm_wav(s16: np.ndarray, sr_hz: int) -> bytes:
    import struct

    spb = 1 + (_ADPCM_BLOCK - 4) * 2  # 505 samples/block
    x = s16.astype(np.int32)
    n = len(x)
    n_blocks = max((n + spb - 1) // spb, 0)
    if n_blocks:
        # pad the tail block by repeating the last sample (zero deltas)
        x = np.pad(x, (0, n_blocks * spb - n), mode="edge")
    blocks = x.reshape(n_blocks, spb)
    pred = blocks[:, 0].copy()
    # per-block initial step index: match the block's typical
    # sample-to-sample delta against the step table (blocks stay
    # independent, which is what makes the lockstep encode possible)
    if spb > 1 and n_blocks:
        typ = np.abs(np.diff(blocks, axis=1)).mean(axis=1)
    else:
        typ = np.zeros(n_blocks)
    idx = np.clip(
        np.searchsorted(_IMA_STEPS, typ), 0, 88
    ).astype(np.int32)
    idx0 = idx.copy()
    codes = np.zeros((n_blocks, spb - 1), dtype=np.uint8)
    for t in range(1, spb):
        step = _IMA_STEPS[idx]
        diff = blocks[:, t] - pred
        sign = diff < 0
        ad = np.abs(diff)
        b4 = ad >= step
        ad = ad - np.where(b4, step, 0)
        h = step >> 1
        b2 = ad >= h
        ad = ad - np.where(b2, h, 0)
        b1 = ad >= (step >> 2)
        code = (
            np.where(b4, 4, 0) | np.where(b2, 2, 0) | np.where(b1, 1, 0)
        ).astype(np.int32)
        codes[:, t - 1] = (code | np.where(sign, 8, 0)).astype(np.uint8)
        pred, idx = _adpcm_reconstruct(
            pred, idx, code | np.where(sign, 8, 0)
        )
    # assemble blocks: header (seed int16 LE, step idx, 0) + packed
    # nibbles, low nibble first
    out = np.zeros((n_blocks, _ADPCM_BLOCK), dtype=np.uint8)
    seed = blocks[:, 0] & 0xFFFF
    out[:, 0] = seed & 0xFF
    out[:, 1] = seed >> 8
    out[:, 2] = idx0
    out[:, 4:] = codes[:, 0::2] | (codes[:, 1::2] << 4)
    data = out.tobytes()
    byte_rate = max(int(sr_hz * _ADPCM_BLOCK / spb), 1)
    fmt = struct.pack(
        "<HHIIHHHH", 0x11, 1, sr_hz, byte_rate, _ADPCM_BLOCK, 4, 2, spb
    )
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"fact" + struct.pack("<II", 4, n)
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _decode_adpcm_blocks(
    data: bytes, block_align: int, fact: int | None
) -> np.ndarray:
    if block_align < 5:
        raise ValueError(f"bad IMA ADPCM block align {block_align}")
    n_blocks = len(data) // block_align
    total = n_blocks * (1 + (block_align - 4) * 2)
    if fact is not None and fact > total:
        raise ValueError("IMA ADPCM data shorter than fact sample count")
    if n_blocks == 0:
        return np.zeros(0, dtype=np.float32)
    blk = np.frombuffer(
        data[: n_blocks * block_align], dtype=np.uint8
    ).reshape(n_blocks, block_align)
    pred = blk[:, 0].astype(np.int32) | (blk[:, 1].astype(np.int32) << 8)
    pred = np.where(pred >= 32768, pred - 65536, pred)
    idx = blk[:, 2].astype(np.int32)
    if (idx > 88).any():
        raise ValueError("IMA ADPCM step index out of range")
    nib = blk[:, 4:].astype(np.int32)
    codes = np.empty((n_blocks, (block_align - 4) * 2), dtype=np.int32)
    codes[:, 0::2] = nib & 0xF
    codes[:, 1::2] = nib >> 4
    out = np.empty((n_blocks, codes.shape[1] + 1), dtype=np.int32)
    out[:, 0] = pred
    for t in range(codes.shape[1]):
        pred, idx = _adpcm_reconstruct(pred, idx, codes[:, t])
        out[:, t + 1] = pred
    flat = out.reshape(-1)
    if fact is not None:
        flat = flat[:fact]
    return (flat.astype(np.float32) / 32768.0).astype(np.float32)


# ----------------------- image codecs (pure numpy, public formats) ---
#
# BMP (Windows DIB, BITMAPINFOHEADER), PPM (netpbm P6), PNG (stdlib
# zlib inflate + numpy unfiltering), and baseline JPEG (pure-numpy
# huffman + IDCT, sparkfp/jpeg.py) are public formats decodable with
# no external libraries — they make the multimodal frame path REAL for
# image rows in this container, shrinking the deterministic-fake
# surface to video (which needs ffmpeg). All decoders return HxWx3
# uint8 RGB.

IMAGE_CODECS = {"bmp", "ppm", "png", "jpeg", "gif"}

_BMP_FILE_HEADER = 14
_BMP_INFO_HEADER = 40


def encode_image(
    img: np.ndarray, codec: str, png_filter: int = 0,
    png_interlace: bool = False, png_palette: bool = False,
) -> bytes:
    """HxWx3 uint8 RGB -> bytes (bmp: 24-bit BI_RGB bottom-up; ppm: P6;
    png: 8-bit RGB, every scanline under ``png_filter`` 0-4 — the
    filter knob exists so tests can exercise each PNG unfilter path;
    ``png_interlace`` emits Adam7; ``png_palette`` emits indexed
    color)."""
    img = np.ascontiguousarray(img, dtype=np.uint8)
    if img.ndim != 3 or img.shape[2] != 3:
        raise ValueError(f"expected HxWx3 RGB, got shape {img.shape}")
    h, w, _ = img.shape
    if codec == "png":
        return _encode_png(img, png_filter, png_interlace, png_palette)
    if codec == "jpeg":
        from . import jpeg as _jpeg

        return _jpeg.encode_jpeg(img)
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
    if codec == "gif":
        from . import gif as _gif

        return _gif.encode_gif(img)
    raise UnsupportedCodec(codec)


def decode_image(raw: bytes, codec: str) -> np.ndarray:
    """bytes -> HxWx3 uint8 RGB. BMP supports 24/32-bit uncompressed
    (BI_RGB), bottom-up and top-down; PPM supports binary P6 with
    comments; PNG supports 8-bit gray/RGB/RGBA, non-interlaced, all
    five scanline filters. BMP/PPM are one frombuffer + strided
    reshape; PNG is zlib inflate + per-row numpy unfiltering."""
    if codec == "bmp":
        return _decode_bmp(raw)
    if codec == "ppm":
        return _decode_ppm(raw)
    if codec == "png":
        return _decode_png(raw)
    if codec == "jpeg":
        from . import jpeg as _jpeg

        return _jpeg.decode_jpeg(raw)
    if codec == "gif":
        from . import gif as _gif

        return _gif.decode_gif(raw)
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


_PNG_SIG = b"\x89PNG\r\n\x1a\n"
# color type -> samples per pixel. 3 = palette: one index byte per
# pixel, mapped through the PLTE chunk after unfilter; 4 = gray+alpha.
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _decode_png(raw: bytes) -> np.ndarray:
    """Pure-Python PNG decode: chunk walk with CRC verification, zlib
    inflate of the IDAT stream, then per-scanline reconstruction of
    all five filter types (None/Sub/Up/Average/Paeth). Sub uses a
    per-channel modular cumsum; Average/Paeth carry a true left
    dependence so those rows run a scalar loop — acceptable because
    filtered rows are a per-image cost inside an Arrow batch, and this
    container has no C decoder to call."""
    import struct
    import zlib

    if raw[:8] != _PNG_SIG:
        raise ValueError("not a PNG file")
    pos, ihdr, idat, plte, saw_iend = 8, None, [], None, False
    while pos + 8 <= len(raw):
        (ln,) = struct.unpack_from(">I", raw, pos)
        ctype = raw[pos + 4: pos + 8]
        data = raw[pos + 8: pos + 8 + ln]
        if len(data) < ln or pos + 12 + ln > len(raw):
            raise ValueError("truncated PNG chunk")
        (crc,) = struct.unpack_from(">I", raw, pos + 8 + ln)
        if crc != (zlib.crc32(ctype + data) & 0xFFFFFFFF):
            raise ValueError(f"bad PNG CRC in {ctype!r} chunk")
        pos += 12 + ln
        if ctype == b"IHDR":
            ihdr = data
        elif ctype == b"IDAT":
            idat.append(data)
        elif ctype == b"PLTE":
            plte = data
        elif ctype == b"IEND":
            saw_iend = True
            break
    if ihdr is None or len(ihdr) != 13 or not idat or not saw_iend:
        raise ValueError("missing PNG IHDR/IDAT/IEND")
    w, h, depth, color, comp, filt, interlace = struct.unpack(">IIBBBBB", ihdr)
    if depth not in (8, 16) or (depth, color) == (16, 3):
        # 1/2/4-bit packed depths stay gated; 16-bit palette is
        # invalid per the spec
        raise UnsupportedCodec(f"png bit depth {depth} / color {color}")
    if color not in _PNG_CHANNELS:
        raise UnsupportedCodec(f"png color type {color}")
    if interlace not in (0, 1):
        raise ValueError(f"bad PNG interlace method {interlace}")
    if comp != 0 or filt != 0:
        raise ValueError(f"bad PNG compression/filter method {comp}/{filt}")
    if w <= 0 or h <= 0:
        raise ValueError(f"bad PNG dimensions {w}x{h}")
    try:
        dec = zlib.decompress(b"".join(idat))
    except zlib.error as e:
        raise ValueError(f"bad PNG deflate stream: {e}") from e
    nch = _PNG_CHANNELS[color]
    bypp = nch * (depth // 8)  # filter distance is BYTES per pixel
    if interlace:
        # Adam7: seven independently-filtered reduced images,
        # scattered back onto the (x0 + i*dx, y0 + j*dy) grids
        img3 = np.zeros((h, w, bypp), dtype=np.uint8)
        off = 0
        for x0, y0, dx, dy in _ADAM7:
            pw = (w - x0 + dx - 1) // dx
            ph = (h - y0 + dy - 1) // dy
            if pw <= 0 or ph <= 0:
                continue
            pstride = pw * bypp
            need = ph * (1 + pstride)
            if len(dec) - off < need:
                raise ValueError("PNG pixel data length mismatch")
            lines = np.frombuffer(
                dec, dtype=np.uint8, count=need, offset=off
            ).reshape(ph, 1 + pstride)
            img3[y0::dy, x0::dx] = _png_unfilter(lines, bypp).reshape(
                ph, pw, bypp
            )
            off += need
        if off != len(dec):
            raise ValueError("PNG pixel data length mismatch")
        img = img3
    else:
        stride = w * bypp
        if len(dec) != h * (1 + stride):
            raise ValueError("PNG pixel data length mismatch")
        lines = np.frombuffer(dec, dtype=np.uint8).reshape(h, 1 + stride)
        img = _png_unfilter(lines, bypp).reshape(h, w, bypp)
    if depth == 16:
        # samples are big-endian uint16: keep the high byte (the
        # standard 16 -> 8 downscale, v >> 8)
        img = np.ascontiguousarray(img.reshape(h, w, nch, 2)[:, :, :, 0])
    if color == 3:
        if plte is None or len(plte) == 0 or len(plte) % 3:
            raise ValueError("missing or malformed PLTE chunk")
        palette = np.frombuffer(plte, dtype=np.uint8).reshape(-1, 3)
        idx = img.reshape(h, w)
        if int(idx.max()) >= len(palette):
            raise ValueError("PNG palette index out of range")
        img = palette[idx]
    elif nch == 1:
        img = np.repeat(img.reshape(h, w, 1), 3, axis=2)
    elif color == 4:
        # gray+alpha: replicate gray, drop alpha
        img = np.repeat(img[:, :, :1], 3, axis=2)
    elif nch == 4:
        img = img[:, :, :3]  # alpha dropped, matching the BMP 32bpp path
    return np.ascontiguousarray(img)


# Adam7 pass grid: (x offset, y offset, x stride, y stride)
_ADAM7 = (
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
)


def _png_unfilter(lines: np.ndarray, nch: int) -> np.ndarray:
    """(n, 1+stride) filter-byte-led scanlines -> (n, stride) pixels.
    Sub uses a per-channel modular cumsum; Average/Paeth carry a true
    left dependence so those rows run a scalar loop — acceptable
    because filtered rows are a per-image cost inside an Arrow batch,
    and this container has no C decoder to call."""
    h, stride = lines.shape[0], lines.shape[1] - 1
    ftypes, data = lines[:, 0], lines[:, 1:]
    recon = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        f, line = int(ftypes[y]), data[y]
        if f == 0:
            cur = line.copy()
        elif f == 1:  # Sub: modular cumsum per channel offset
            cur = np.empty(stride, dtype=np.uint8)
            for o in range(nch):
                cur[o::nch] = np.cumsum(
                    line[o::nch], dtype=np.int64
                ).astype(np.uint8)
        elif f == 2:  # Up
            cur = line + prev  # uint8 addition wraps mod 256
        elif f == 3:  # Average
            cur = np.empty(stride, dtype=np.uint8)
            for i in range(stride):
                left = int(cur[i - nch]) if i >= nch else 0
                cur[i] = (int(line[i]) + (left + int(prev[i])) // 2) & 0xFF
        elif f == 4:  # Paeth
            cur = np.empty(stride, dtype=np.uint8)
            for i in range(stride):
                a = int(cur[i - nch]) if i >= nch else 0
                b, c = int(prev[i]), int(prev[i - nch]) if i >= nch else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
                cur[i] = (int(line[i]) + pred) & 0xFF
        else:
            raise ValueError(f"bad PNG scanline filter type {f}")
        recon[y] = cur
        prev = cur
    return recon


def _png_filter_pass(img: np.ndarray, png_filter: int) -> bytes:
    """One (sub-)image -> filter-byte-led scanline bytes, every line
    under `png_filter` (0-4); vectorized from the original pixels."""
    h, w, nch = img.shape
    flat = np.ascontiguousarray(img).reshape(h, w * nch).astype(np.int32)
    left = np.zeros_like(flat)
    left[:, nch:] = flat[:, :-nch]
    up = np.zeros_like(flat)
    up[1:] = flat[:-1]
    upleft = np.zeros_like(flat)
    upleft[1:, nch:] = flat[:-1, :-nch]
    if png_filter == 0:
        filtered = flat
    elif png_filter == 1:
        filtered = flat - left
    elif png_filter == 2:
        filtered = flat - up
    elif png_filter == 3:
        filtered = flat - (left + up) // 2
    else:  # Paeth
        p = left + up - upleft
        pa, pb, pc = np.abs(p - left), np.abs(p - up), np.abs(p - upleft)
        pred = np.where(
            (pa <= pb) & (pa <= pc), left, np.where(pb <= pc, up, upleft)
        )
        filtered = flat - pred
    scan = np.concatenate(
        [np.full((h, 1), png_filter, dtype=np.uint8),
         (filtered & 0xFF).astype(np.uint8)],
        axis=1,
    )
    return scan.tobytes()


def _encode_png(
    img: np.ndarray, png_filter: int, interlace: bool = False,
    palette: bool = False,
) -> bytes:
    """8-bit PNG with every scanline filtered under `png_filter` (0-4)
    — the filter knob lets tests drive each decoder reconstruction
    path. `interlace` emits Adam7 (each of the seven reduced images
    filtered independently, per the spec); `palette` emits indexed
    color (type 3, PLTE chunk) for images with <= 256 distinct
    colors."""
    import struct
    import zlib

    if png_filter not in (0, 1, 2, 3, 4):
        raise ValueError(f"png_filter must be 0-4, got {png_filter}")
    h, w, _ = img.shape
    plte = b""
    if palette:
        pal, inv = np.unique(img.reshape(-1, 3), axis=0, return_inverse=True)
        if len(pal) > 256:
            raise ValueError(
                f"palette PNG needs <= 256 distinct colors, got {len(pal)}"
            )
        src = inv.astype(np.uint8).reshape(h, w, 1)
        color, plte = 3, pal.astype(np.uint8).tobytes()
    else:
        src, color = img, 2
    if interlace:
        scan = b"".join(
            _png_filter_pass(src[y0::dy, x0::dx], png_filter)
            for x0, y0, dx, dy in _ADAM7
            if src[y0::dy, x0::dx].size
        )
    else:
        scan = _png_filter_pass(src, png_filter)

    def chunk(ctype: bytes, payload: bytes) -> bytes:
        return (
            struct.pack(">I", len(payload)) + ctype + payload
            + struct.pack(">I", zlib.crc32(ctype + payload) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, int(interlace))
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + (chunk(b"PLTE", plte) if palette else b"")
        + chunk(b"IDAT", zlib.compress(scan))
        + chunk(b"IEND", b"")
    )


# ------------------------- AIFF (big-endian IFF) and Sun AU (.snd)
#
# The two classic big-endian audio containers a mixed web corpus still
# carries: AIFF (Mac/pro-audio; IFF FORM chunks, sample rate as an
# 80-bit IEEE 754 extended float) and AU (Sun/NeXT; fixed 24-byte
# header, encoding ids). Same decode contract as WAV: float32 mono in
# [-1,1], channel mean, ValueError for malformed bytes and
# UnsupportedCodec for valid-but-unimplemented encodings.


def _f80_from_rate(sr: int) -> bytes:
    """Integer sample rate -> 80-bit IEEE 754 extended (AIFF COMM)."""
    import struct

    if sr <= 0:
        raise ValueError(f"bad sample rate {sr}")
    exp = sr.bit_length() - 1
    mant = sr << (63 - exp)  # explicit integer bit at mantissa MSB
    return struct.pack(">HQ", 16383 + exp, mant)


def _rate_from_f80(b: bytes) -> int:
    """80-bit IEEE 754 extended -> integer sample rate (rounded)."""
    import struct

    se, mant = struct.unpack(">HQ", b)
    exp = (se & 0x7FFF) - 16383 - 63
    if se & 0x8000 or mant == 0:
        raise ValueError("bad AIFF sample rate")
    rate = mant * 2.0 ** exp
    if not (0 < rate < 2 ** 31):
        raise ValueError("bad AIFF sample rate")
    return int(round(rate))


def encode_aiff(pcm: np.ndarray, sr_hz: int = 8000) -> bytes:
    """float PCM (``(n,)`` mono or ``(n, nch)``) -> AIFF 16-bit
    big-endian PCM."""
    import struct

    x = np.asarray(pcm, dtype=np.float64)
    if x.ndim == 1:
        x = x[:, None]
    n, nch = x.shape
    data = _f32_to_s16(x.ravel()).astype(">i2").tobytes()
    comm = struct.pack(">hIh", nch, n, 16) + _f80_from_rate(sr_hz)
    ssnd = struct.pack(">II", 0, 0) + data
    body = (
        b"AIFF"
        + b"COMM" + struct.pack(">I", len(comm)) + comm
        + b"SSND" + struct.pack(">I", len(ssnd)) + ssnd
        + (b"\x00" if len(ssnd) & 1 else b"")
    )
    return b"FORM" + struct.pack(">I", len(body)) + body


def _decode_aiff(raw: bytes) -> np.ndarray:
    """AIFF chunk walk -> float32 mono PCM (channel mean)."""
    import struct

    if len(raw) < 12 or raw[:4] != b"FORM" or raw[8:12] != b"AIFF":
        raise ValueError("not an AIFF file")
    pos, comm, ssnd = 12, None, None
    while pos + 8 <= len(raw):
        cid = raw[pos: pos + 4]
        (size,) = struct.unpack_from(">I", raw, pos + 4)
        body = raw[pos + 8: pos + 8 + size]
        if len(body) < size:
            raise ValueError("truncated AIFF chunk")
        if cid == b"COMM":
            comm = body
        elif cid == b"SSND":
            ssnd = body
        pos += 8 + size + (size & 1)  # IFF chunks are word-aligned
    if comm is None or ssnd is None:
        raise ValueError("missing AIFF COMM/SSND chunk")
    if len(comm) < 18:
        raise ValueError(f"short AIFF COMM chunk ({len(comm)} bytes)")
    nch, n_frames, bits = struct.unpack_from(">hIh", comm, 0)
    _rate_from_f80(comm[8:18])  # validates; rate itself rides the table
    if nch < 1:
        raise ValueError(f"bad AIFF channel count {nch}")
    if bits != 16:
        raise UnsupportedCodec(f"AIFF {bits}-bit PCM")
    if len(ssnd) < 8:
        raise ValueError("short AIFF SSND chunk")
    (offset,) = struct.unpack_from(">I", ssnd, 0)
    data = ssnd[8 + offset:]
    pcm = np.frombuffer(data, dtype=">i2", count=len(data) // 2)
    pcm = pcm[: min(len(pcm), n_frames * nch)]
    f = pcm.astype(np.float64) / 32768.0
    if nch > 1:
        f = f[: len(f) - len(f) % nch].reshape(-1, nch).mean(axis=1)
    return f.astype(np.float32)


_AU_MAGIC = b".snd"
# AU encoding ids (public Sun/NeXT header spec)
_AU_ULAW, _AU_PCM8, _AU_PCM16, _AU_F32, _AU_ALAW = 1, 2, 3, 6, 27


def encode_au(
    pcm: np.ndarray, sr_hz: int = 8000, encoding: int = _AU_PCM16
) -> bytes:
    """float PCM (``(n,)`` or ``(n, nch)``) -> Sun AU. Encodings:
    1 = G.711 mu-law, 2 = 8-bit SIGNED PCM (unlike WAV's unsigned),
    3 = 16-bit big-endian PCM, 6 = float32 BE, 27 = G.711 A-law."""
    import struct

    x = np.asarray(pcm, dtype=np.float64)
    if x.ndim == 1:
        x = x[:, None]
    nch = x.shape[1]
    flat = x.ravel()
    if encoding == _AU_ULAW:
        data = _linear_to_ulaw(_f32_to_s16(flat)).tobytes()
    elif encoding == _AU_PCM8:
        data = np.clip(np.round(flat * 127.0), -128, 127).astype(
            np.int8).tobytes()
    elif encoding == _AU_PCM16:
        data = _f32_to_s16(flat).astype(">i2").tobytes()
    elif encoding == _AU_F32:
        data = flat.astype(">f4").tobytes()
    elif encoding == _AU_ALAW:
        data = _linear_to_alaw(_f32_to_s16(flat)).tobytes()
    else:
        raise ValueError(f"unsupported AU encoding {encoding}")
    hdr = struct.pack(">4sIIIII", _AU_MAGIC, 24, len(data), encoding,
                      sr_hz, nch)
    return hdr + data


def _decode_au(raw: bytes) -> np.ndarray:
    """Sun AU header parse -> float32 mono PCM (channel mean)."""
    import struct

    if len(raw) < 24 or raw[:4] != _AU_MAGIC:
        raise ValueError("not a Sun AU file")
    _, offset, dsize, enc, _sr, nch = struct.unpack_from(">4sIIIII", raw, 0)
    if offset < 24 or offset > len(raw):
        raise ValueError(f"bad AU data offset {offset}")
    if nch < 1:
        raise ValueError(f"bad AU channel count {nch}")
    data = raw[offset:]
    if dsize != 0xFFFFFFFF:  # all-ones means "unknown length"
        if dsize > len(data):
            raise ValueError("truncated AU data")
        data = data[:dsize]
    if enc == _AU_ULAW:
        f = _ulaw_to_linear(np.frombuffer(data, dtype=np.uint8)).astype(
            np.float64) / 32768.0
    elif enc == _AU_PCM8:
        f = np.frombuffer(data, dtype=np.int8).astype(np.float64) / 128.0
    elif enc == _AU_PCM16:
        f = np.frombuffer(
            data, dtype=">i2", count=len(data) // 2
        ).astype(np.float64) / 32768.0
    elif enc == _AU_F32:
        f = np.frombuffer(
            data, dtype=">f4", count=len(data) // 4
        ).astype(np.float64)
    elif enc == _AU_ALAW:
        f = _alaw_to_linear(np.frombuffer(data, dtype=np.uint8)).astype(
            np.float64) / 32768.0
    else:
        raise UnsupportedCodec(f"AU encoding {enc}")
    if nch > 1:
        f = f[: len(f) - len(f) % nch].reshape(-1, nch).mean(axis=1)
    return f.astype(np.float32)


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
