"""Independent oracle for the audio fingerprint chain.

This module is a from-scratch second implementation of the landmark
DSP + matcher semantics, used ONLY to generate the committed
`fixtures/*_expected.parquet` oracles and to verify the engine in
pytest. It deliberately shares **no code** with `sparkfp/`:

- decode: `struct` loop for PCM, a table built from the ITU-T G.711
  expansion formula for mu-law (vs the engine's vectorized
  `np.frombuffer` / bit-twiddling paths in sparkfp/codec.py);
- spectrogram: direct DFT (explicit complex-exponential matrix, no
  `np.fft`), float64 end-to-end (vs the engine's strided float32
  `rfft` in sparkfp/dsp.py);
- peaks / landmark pairs: naive O(frames x bands x bins) and
  O(n_peaks x fan_out) Python loops (vs the engine's vectorized
  argmax / shifted-slice pairing);
- matcher: plain-dict offset-histogram voting (vs the engine's
  groupBy/window plan and the fused searchsorted matcher).

The analysis parameters are restated here from the published scheme
(Wang 2003 constellation hashing) — they are the *contract*, so both
implementations declare them independently; a test cross-checks they
agree. Reference parity anchor: the reference's flatMap->window->probe
semantics (src/flink_job/job.py:63-82,
src/postprocess/save_fingerprints.py:140-153).

If this oracle and the engine ever disagree, the engine is wrong (or
the contract changed intentionally — then update BOTH and regenerate
fixtures via tools/gen_audio_fixtures.py).
"""

from __future__ import annotations

import math
import struct
import zlib
from collections import Counter
from decimal import ROUND_HALF_UP, Decimal

import numpy as np

# ---- contract constants (restated, not imported) ----
N_FFT = 512
HOP = 256
N_BANDS = 6
PEAK_FACTOR = 2.0
FAN_OUT = 5
MAX_DT_FRAMES = 32
OFFSET_BIN_MS = 100
MIN_VOTES = 200
MIN_SCORE = 50.0


def round_half_up(x: float, digits: int) -> float:
    """Spark's ROUND(col, n): HALF_UP on the shortest decimal repr of
    the double (BigDecimal.valueOf semantics)."""
    q = Decimal(1).scaleb(-digits)
    # `+ 0.0` normalizes IEEE -0.0 -> +0.0: Java BigDecimal (Spark ROUND)
    # has no negative zero, while Python Decimal preserves the sign bit on
    # values like -0.00002 rounded to 3 dp. The driver's value hash is
    # sign-bit sensitive, so the oracle must match Spark here.
    return float(Decimal(repr(float(x))).quantize(q, rounding=ROUND_HALF_UP)) + 0.0


# ------------------------------------------------------------- decode


def _ulaw_expand_table() -> list[int]:
    """ITU-T G.711 mu-law expansion, one byte at a time from the spec
    formula: magnitude = ((mantissa << 3) + 132) << exponent, minus the
    132 bias, sign from the top bit (byte stored complemented)."""
    table = []
    for byte in range(256):
        u = (~byte) & 0xFF
        exponent = (u >> 4) & 0x07
        mantissa = u & 0x0F
        magnitude = (((mantissa << 3) + 132) << exponent) - 132
        table.append(-magnitude if (u & 0x80) else magnitude)
    return table


_ULAW_TABLE = _ulaw_expand_table()


def _alaw_expand_table() -> list[int]:
    """ITU-T G.711 A-law expansion, byte at a time from the spec
    formula (even bits stored inverted; sign bit SET is positive)."""
    table = []
    for byte in range(256):
        v = byte ^ 0x55
        seg = (v >> 4) & 0x07
        t = (v & 0x0F) << 4
        if seg == 0:
            t += 8
        else:
            t = (t + 0x108) << (seg - 1)
        table.append(t if (v & 0x80) else -t)
    return table


_ALAW_TABLE = _alaw_expand_table()


def _decode_wav_scalar(raw: bytes) -> list[float]:
    """Scalar RIFF/WAVE walk: struct reads, per-sample loop, channel
    mean in float64 — independent of the engine's frombuffer path."""
    if raw[:4] != b"RIFF" or raw[8:12] != b"WAVE":
        raise ValueError("oracle: not RIFF/WAVE")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(raw):
        cid = raw[pos: pos + 4]
        size = struct.unpack_from("<I", raw, pos + 4)[0]
        body = raw[pos + 8: pos + 8 + size]
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            data = body
        pos += 8 + size + (size % 2)
    if fmt is None or data is None:
        raise ValueError("oracle: missing fmt/data")
    tag, nch = struct.unpack_from("<HH", fmt, 0)
    bits = struct.unpack_from("<H", fmt, 14)[0]
    if tag != 1 or bits != 16:
        raise ValueError("oracle handles 16-bit PCM wav only")
    samples = [s[0] for s in struct.iter_unpack("<h", data[: len(data) - len(data) % 2])]
    n_frames = len(samples) // nch
    out = []
    for i in range(n_frames):
        frame = samples[i * nch: (i + 1) * nch]
        out.append((sum(frame) / nch) / 32768.0)
    return out


def decode(raw: bytes, codec_name: str) -> list[float]:
    """bytes -> PCM floats in [-1, 1]; scalar loops, float64."""
    if codec_name == "pcm_s16le":
        return [s[0] / 32768.0 for s in struct.iter_unpack("<h", raw)]
    if codec_name == "ulaw":
        return [_ULAW_TABLE[b] / 32768.0 for b in raw]
    if codec_name == "alaw":
        return [_ALAW_TABLE[b] / 32768.0 for b in raw]
    if codec_name == "wav":
        return _decode_wav_scalar(raw)
    raise ValueError(f"oracle cannot decode codec {codec_name!r}")


# --------------------------------------------------------- spectrogram

_DFT = None  # cached (N_FFT x N_FFT//2+1) complex exponential matrix


def _dft_matrix() -> np.ndarray:
    global _DFT
    if _DFT is None:
        n = np.arange(N_FFT, dtype=np.float64)
        k = np.arange(N_FFT // 2 + 1, dtype=np.float64)
        _DFT = np.exp(-2j * math.pi * np.outer(n, k) / N_FFT)
    return _DFT


def spectrogram(pcm: list[float]) -> np.ndarray:
    """Direct-DFT magnitude spectrogram (frames x N_FFT//2+1), float64.

    Hann window from the closed form w[i] = 0.5 - 0.5 cos(2 pi i/(N-1)).
    """
    x = list(pcm)
    if len(x) < N_FFT:
        x = x + [0.0] * (N_FFT - len(x))
    win = [0.5 - 0.5 * math.cos(2.0 * math.pi * i / (N_FFT - 1)) for i in range(N_FFT)]
    n_frames = 1 + (len(x) - N_FFT) // HOP
    dft = _dft_matrix()
    frames = np.empty((n_frames, N_FFT), dtype=np.float64)
    for f in range(n_frames):
        seg = x[f * HOP : f * HOP + N_FFT]
        frames[f, :] = [s * w for s, w in zip(seg, win)]
    return np.abs(frames @ dft)


# --------------------------------------------------------------- peaks


def band_edges() -> list[int]:
    """Geometric band boundaries over bins [2, N_FFT//2+1], rounded
    half-to-even, deduplicated — restated from the contract."""
    lo, hi = 2.0, float(N_FFT // 2 + 1)
    vals = [lo * (hi / lo) ** (i / N_BANDS) for i in range(N_BANDS + 1)]
    out: list[int] = []
    for v in vals:
        r = round(v)
        if r not in out:
            out.append(r)
    return sorted(out)


def peaks(mag: np.ndarray) -> list[tuple[int, int]]:
    """Per-frame, per-band maxima above 2x the global mean magnitude.

    Naive scan; returns (frame, bin) sorted by (frame, bin)."""
    if mag.size == 0:
        return []
    total = 0.0
    for row in mag:
        for v in row:
            total += float(v)
    thresh = PEAK_FACTOR * (total / mag.size)
    edges = band_edges()
    out: list[tuple[int, int]] = []
    for f in range(mag.shape[0]):
        for b in range(len(edges) - 1):
            lo, hi = edges[b], edges[b + 1]
            if hi <= lo:
                continue
            best_bin, best_val = -1, -1.0
            for k in range(lo, min(hi, mag.shape[1])):
                v = float(mag[f, k])
                if v > best_val:
                    best_bin, best_val = k, v
            if best_bin >= 0 and best_val > thresh:
                out.append((f, best_bin))
    out.sort()
    return out


# ----------------------------------------------------------- landmarks


def landmarks(pks: list[tuple[int, int]], sr_hz: int) -> list[tuple[int, int]]:
    """Anchor-target pairs over the next FAN_OUT peaks (by index), dt in
    (0, MAX_DT_FRAMES]; hash = (f_a << 19) | (f_t << 10) | dt.

    Returns [(hash, t_ms)] with t_ms = floor(frame * HOP * 1000 / sr)."""
    out = []
    n = len(pks)
    for i in range(n):
        fr_a, bin_a = pks[i]
        for j in range(i + 1, min(i + FAN_OUT + 1, n)):
            fr_t, bin_t = pks[j]
            dt = fr_t - fr_a
            if dt <= 0 or dt > MAX_DT_FRAMES:
                continue
            h = (bin_a << 19) | (bin_t << 10) | dt
            t_ms = (fr_a * HOP * 1000) // sr_hz
            out.append((h, t_ms))
    return out


def clip_landmarks(raw: bytes, codec_name: str, sr_hz: int) -> list[tuple[int, int]]:
    return landmarks(peaks(spectrogram(decode(raw, codec_name))), sr_hz)


# --------------------------------------------------------------- match


def build_index(
    tracks: list[tuple[str, bytes, str, int]],
) -> dict[int, list[tuple[str, int]]]:
    """[(track_id, bytes, codec, sr)] -> hash -> [(track_id, t_track_ms)]."""
    idx: dict[int, list[tuple[str, int]]] = {}
    for tid, raw, codec_name, sr in tracks:
        for h, t in clip_landmarks(raw, codec_name, sr):
            idx.setdefault(h, []).append((tid, t))
    return idx


def _trunc_div(v: int, d: int) -> int:
    """Truncate-toward-zero division (Spark (x / d).cast(long))."""
    return abs(v) // d * (1 if v >= 0 else -1)


def match_clip(
    lms: list[tuple[int, int]],
    index: dict[int, list[tuple[str, int]]],
    dur_ms: int,
    bin_ms: int = OFFSET_BIN_MS,
    min_votes: int = MIN_VOTES,
    min_score: float = MIN_SCORE,
) -> tuple[str, int, int, float] | None:
    """Offset-histogram vote over a plain dict; best by
    (-votes, track_id, offset_bin); thresholds as in the contract.

    Returns (matched_track, offset_ms, vote_count, score) or None."""
    votes: Counter = Counter()
    for h, t_ms in lms:
        for tid, t_track in index.get(h, ()):
            votes[(tid, _trunc_div(t_track - t_ms, bin_ms))] += 1
    if not votes:
        return None
    best_n = max(votes.values())
    tid, obin = min(k for k, n in votes.items() if n == best_n)
    score = best_n / (dur_ms / 1000.0)
    if best_n < min_votes or score < min_score:
        return None
    return tid, obin * bin_ms, best_n, score


# ------------------------------------------------- multimodal features


def byte_features(raw: bytes) -> tuple[int, float, float, float]:
    """(n_bytes, mean, shannon entropy bits, zero ratio) — scalar math."""
    n = len(raw)
    if n == 0:
        return 0, 0.0, 0.0, 0.0
    counts = Counter(raw)
    mean = sum(b * c for b, c in counts.items()) / n
    entropy = -sum((c / n) * math.log2(c / n) for c in counts.values())
    return n, mean, entropy, counts.get(0, 0) / n


def decode_bmp_pixels(raw: bytes) -> list[float]:
    """Independent scalar BMP parse (24-bit BI_RGB, bottom-up or
    top-down): struct reads + per-pixel loops, nothing shared with the
    engine's strided-numpy decoder. Returns the RGB channel values in
    row-major top-down order as floats."""
    if raw[:2] != b"BM":
        raise ValueError("not BMP")
    off = struct.unpack_from("<I", raw, 10)[0]
    w = struct.unpack_from("<i", raw, 18)[0]
    h_signed = struct.unpack_from("<i", raw, 22)[0]
    bpp = struct.unpack_from("<H", raw, 28)[0]
    comp = struct.unpack_from("<I", raw, 30)[0]
    if bpp != 24 or comp != 0:
        raise ValueError(f"oracle handles 24bpp BI_RGB only, got {bpp}/{comp}")
    h = abs(h_signed)
    stride = ((3 * w + 3) // 4) * 4
    vals: list[float] = []
    for row in range(h):
        # stored bottom-up unless height is negative
        src_row = row if h_signed < 0 else h - 1 - row
        base = off + src_row * stride
        for x in range(w):
            b, g, r = raw[base + 3 * x : base + 3 * x + 3]
            vals.extend((float(r), float(g), float(b)))
    return vals


def _paeth(a: int, b: int, c: int) -> int:
    """Paeth predictor, restated scalar from the PNG spec (RFC 2083)."""
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def decode_png_pixels(raw: bytes) -> list[float]:
    """Independent scalar PNG parse (8-bit RGB, non-interlaced): manual
    chunk walk, stdlib zlib inflate (the spec's DEFLATE is the public
    contract, not engine code), then byte-at-a-time unfiltering with a
    scalar Paeth — nothing shared with the engine's vectorized
    cumsum/strided reconstruction. Returns RGB values row-major."""
    if raw[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("not PNG")
    pos, idat, hdr = 8, b"", None
    while pos + 12 <= len(raw):
        ln = int.from_bytes(raw[pos: pos + 4], "big")
        ctype = raw[pos + 4: pos + 8]
        body = raw[pos + 8: pos + 8 + ln]
        if zlib.crc32(ctype + body) != int.from_bytes(
            raw[pos + 8 + ln: pos + 12 + ln], "big"
        ):
            raise ValueError("png crc mismatch")
        if ctype == b"IHDR":
            hdr = body
        elif ctype == b"IDAT":
            idat += body
        elif ctype == b"IEND":
            break
        pos += 12 + ln
    if hdr is None:
        raise ValueError("png missing IHDR")
    w = int.from_bytes(hdr[0:4], "big")
    h = int.from_bytes(hdr[4:8], "big")
    depth, color = hdr[8], hdr[9]
    if depth != 8 or color != 2 or hdr[12] != 0:
        raise ValueError("oracle handles 8-bit RGB non-interlaced only")
    dec = zlib.decompress(idat)
    stride = 3 * w
    if len(dec) != h * (stride + 1):
        raise ValueError("png data length mismatch")
    vals: list[float] = []
    prev = [0] * stride
    for y in range(h):
        base = y * (stride + 1)
        ftype = dec[base]
        cur = [0] * stride
        for i in range(stride):
            x = dec[base + 1 + i]
            a = cur[i - 3] if i >= 3 else 0
            b = prev[i]
            c = prev[i - 3] if i >= 3 else 0
            if ftype == 0:
                r = x
            elif ftype == 1:
                r = x + a
            elif ftype == 2:
                r = x + b
            elif ftype == 3:
                r = x + (a + b) // 2
            elif ftype == 4:
                r = x + _paeth(a, b, c)
            else:
                raise ValueError(f"png filter {ftype}")
            cur[i] = r % 256
        vals.extend(float(v) for v in cur)
        prev = cur
    return vals


def frame_features(
    raw: bytes, codec_name: str
) -> tuple[float, float, bool]:
    """(frame_mean, frame_std, decoded). Audio decodes via the oracle
    decoders; bmp and png via the oracle's scalar parsers (REAL image
    decodes — the engine's numpy BMP/PNG decoders are verified against
    them); h264 (video — the one remaining fake boundary) follows the
    documented deterministic-fake spec (Philox keyed on the first 8
    payload bytes, 16x16x3 uint8) — the fake's *spec* is shared, its
    surrounding code is not. jpeg decodes for real in the engine
    (sparkfp/jpeg.py) but has no scalar twin here yet, so jpeg rows are
    pytest-gated (round-trip PSNR + spec-table checks), not
    fixture-gated."""
    if codec_name in ("pcm_s16le", "ulaw", "alaw", "wav"):
        vals = decode(raw, codec_name)
    elif codec_name == "bmp":
        vals = decode_bmp_pixels(raw)
    elif codec_name == "png":
        vals = decode_png_pixels(raw)
    elif codec_name == "h264":
        key = int.from_bytes(raw[:8].ljust(8, b"\0"), "little")
        # explicit uint64 dtype: a plain [int, 0] list detours through
        # float64 inside numpy and silently rounds the key
        rng = np.random.Generator(
            np.random.Philox(key=np.array([key, 0], dtype=np.uint64))
        )
        vals = [
            float(v)
            for v in rng.integers(0, 256, size=(16, 16, 3), dtype=np.uint8).ravel()
        ]
    else:
        return float("nan"), float("nan"), False
    n = len(vals)
    mean = sum(vals) / n
    var = sum((v - mean) ** 2 for v in vals) / n
    return mean, math.sqrt(var), True
