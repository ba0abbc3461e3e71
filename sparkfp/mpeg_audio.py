"""MPEG-1 Audio Layer I ("mp1") codec in pure numpy.

Shrinks the engine's unsupported-audio-codec surface (mp3/ogg/aac)
by one real member of the MPEG family: clips tagged ``codec='mp1'``
now decode for real through the same per-batch dispatch as
pcm/ulaw/alaw/wav/adpcm (the opaque-bytes decode boundary the engine
grafts from the reference's pickle deserialization,
src/flink_job/serialization.py:14-20).

What is ISO/IEC 11172-3 bit-exact here (all closed-form, no spec
tables copied):

- frame header (syncword / version / layer / bitrate index / sample
  rate index / padding / mode / emphasis) and Layer I frame sizing
  (``slots = 12 * bitrate / sample_rate``, 4-byte slots);
- Layer I side info: 4-bit bit-allocation code per subband
  (0 = silent, n = n+1 bits, 15 forbidden) and 6-bit scalefactor
  indices into the 2.0 * 2^(-idx/3) geometric table;
- Layer I sample coding: nb-bit codes at 2^nb - 1 levels (all-ones
  forbidden, anti sync-emulation) with the spec's closed-form
  requantization  s'' = (2^nb / (2^nb - 1)) * (s''' + 2^(1-nb)),
  s''' = code / 2^(nb-1) - 1;
- the 32-band modulation phases: analysis
  cos((2k+1)(i-16) pi/64) over a newest-first 512-sample window and
  synthesis cos((2k+1)(n+16) pi/64), i.e. the exact cosine structure
  the ISO analysis (C-window + Y-fold + M matrix) and synthesis
  (V-FIFO + U-shuffle + D window) dataflows compute, collapsed to
  direct matrix form. End-to-end filterbank delay is 481 samples,
  matching the ISO filterbank.

What is NOT bit-exact: the 512-tap window itself. ISO Table C.1/B.3
is a numerically-designed table with no closed form; copying 512
half-remembered constants would be fabrication, so this codec uses a
documented near-perfect-reconstruction prototype instead — a
root-raised-cosine pulse (alpha=1, symbol period 64 = 2M samples),
whose |H(w)|^2 is exactly power-complementary at the pi/32 band
shift. Measured reconstruction error of the analysis+synthesis pair
is ~ -42 dB (test_mp1_filterbank_near_pr), far inside the engine's
SNR >= 30 dB decode contract (BASELINE.json input_hint). A foreign
ISO decoder reading these frames sees the correct phase structure
but a slightly different band shape — bounded window mismatch, not
garbage; a foreign ISO *stream* decodes here with the same bound.

Error contract (matches codec.py / gif.py / video.py): malformed
bytes raise ValueError; valid-but-unimplemented streams (Layer II/
III, MPEG-2 LSF, stereo modes, free-format bitrate) raise
UnsupportedCodec. Never struct.error/IndexError — one corrupt row
must quarantine, not kill the Spark task (multimodal decode-error
contract).
"""

from __future__ import annotations

import numpy as np

from .codec import UnsupportedCodec

_M = 32          # subbands
_TAPS = 512      # prototype length
_GRANULES = 12   # Layer I: 12 granules x 32 subbands = 384 samples/frame
_SAMPLES_PER_FRAME = _M * _GRANULES
_DELAY = 481     # analysis+synthesis delay, samples (ISO filterbank value)

# MPEG-1 Layer I bitrate table (kbps); index 0 = free format, 15 forbidden
_BITRATES = (0, 32, 64, 96, 128, 160, 192, 224, 256,
             288, 320, 352, 384, 416, 448)
_SAMPLE_RATES = (44100, 48000, 32000)  # index 3 reserved

# scalefactor table: sf[idx] = 2.0 * 2^(-idx/3), idx 0..62 (63 invalid)
_SCALEFACTORS = 2.0 * 2.0 ** (-np.arange(63) / 3.0)


def _prototype() -> np.ndarray:
    """Root-raised-cosine near-PR prototype (see module docstring)."""
    alpha, period = 1.0, 64.0
    t = np.arange(_TAPS) - (_TAPS - 1) / 2  # half-integers: no singularities
    num = (np.sin(np.pi * (1 - alpha) * t / period)
           + (4 * alpha * t / period) * np.cos(np.pi * (1 + alpha) * t / period))
    den = (np.pi * t / period) * (1 - (4 * alpha * t / period) ** 2)
    h = num / den
    return h / h.sum()


def _filterbank() -> tuple[np.ndarray, np.ndarray, float]:
    h = _prototype()
    k = np.arange(_M)[:, None]
    i = np.arange(_TAPS)[None, :]
    analysis = h * np.cos((2 * k + 1) * (i - 16) * np.pi / 64)   # (32, 512), age-indexed
    synthesis = h * np.cos((2 * k + 1) * (i + 16) * np.pi / 64)  # (32, 512), time-indexed
    # exact pass-through gain of the pair, measured on an impulse at
    # import (deterministic closed computation, not a magic constant)
    imp = np.zeros(4 * _TAPS)
    imp[2 * _TAPS] = 1.0
    sub = _analyze(imp, analysis, len(imp) // _M)
    y = _synthesize(sub, synthesis)
    gain = float(y[2 * _TAPS + _DELAY])
    return analysis, synthesis / gain, gain


def _analyze(x: np.ndarray, analysis: np.ndarray, n_granules: int) -> np.ndarray:
    """PCM -> (n_granules, 32) subband samples, fully vectorized."""
    xp = np.concatenate([np.zeros(_TAPS - _M), x])
    win = np.lib.stride_tricks.sliding_window_view(xp, _TAPS)[::_M][:n_granules]
    return win[:, ::-1] @ analysis.T  # newest-first window, one matmul


def _synthesize(sub: np.ndarray, synthesis: np.ndarray) -> np.ndarray:
    """(T, 32) subband samples -> PCM of length 32*T (delay included)."""
    n_granules = sub.shape[0]
    contrib = sub @ synthesis  # (T, 512)
    y = np.zeros(_M * n_granules + _TAPS)
    for j in range(_TAPS // _M):  # 16 overlap-add shifts, vectorized inside
        y[_M * j: _M * j + _M * n_granules] += (
            contrib[:, _M * j: _M * (j + 1)].ravel()
        )
    return y[: _M * n_granules]


_ANALYSIS, _SYNTHESIS, _FB_GAIN = _filterbank()


# ------------------------------------------------------------ bit packing


def _bits_of(vals: np.ndarray, width: int) -> np.ndarray:
    """uint array -> (len, width) MSB-first bit matrix (uint8 0/1)."""
    shifts = np.arange(width - 1, -1, -1, dtype=np.uint32)
    return ((vals[:, None].astype(np.uint64) >> shifts) & 1).astype(np.uint8)


def _uint_from_bits(bits: np.ndarray) -> np.ndarray:
    """(..., width) MSB-first bit matrix -> uint array."""
    width = bits.shape[-1]
    weights = (1 << np.arange(width - 1, -1, -1)).astype(np.int64)
    return bits.astype(np.int64) @ weights


# ------------------------------------------------------------ encode


def _allocate_bits(energy: np.ndarray, budget: int) -> np.ndarray:
    """Greedy per-subband bit allocation (encoder freedom, not spec).

    Repeatedly gives one more quantization bit to the subband with the
    highest remaining noise estimate (energy / 4^nb); activating a
    silent subband costs 6 scalefactor bits + 12 2-bit samples,
    deepening an active one costs 12 bits. Deterministic tie-break by
    subband index (argmax takes the first maximum).
    """
    # plain-scalar heap loop: 32 elements x <= 450 steps — numpy's
    # per-op overhead would dominate at this size
    import heapq

    noise = [float(e) + 1e-30 for e in energy]
    nb = [0] * _M
    heap = [(-noise[i], i) for i in range(_M)]
    heapq.heapify(heap)
    while heap:
        neg_gain, sb = heapq.heappop(heap)
        cur = nb[sb]
        cost = 6 + 2 * _GRANULES if cur == 0 else _GRANULES
        if cost > budget:
            continue  # budget only shrinks: drop, cheaper sbs may fit
        nb[sb] = 2 if cur == 0 else cur + 1
        budget -= cost
        if nb[sb] < 15:
            heapq.heappush(heap, (-(noise[sb] / 4.0 ** nb[sb]), sb))
    return np.asarray(nb, dtype=np.int64)


def encode_mp1(pcm: np.ndarray, sr_hz: int, bitrate_kbps: int = 320) -> bytes:
    """float32/float64 PCM in [-1, 1] -> MPEG-1 Layer I mono frames.

    The input is zero-padded so that, after the decoder drops the
    481-sample filterbank delay, the decoded stream covers every input
    sample (decode length = n_frames*384 - 481 >= len(pcm); trailing
    samples beyond len(pcm) are near-silent pad).
    """
    pcm = np.asarray(pcm, dtype=np.float64)
    if pcm.ndim != 1:
        raise ValueError(f"encode_mp1 expects mono 1-D PCM, got {pcm.shape}")
    if sr_hz not in _SAMPLE_RATES:
        raise UnsupportedCodec(
            f"mp1 sample rate {sr_hz} (MPEG-1 allows 32000/44100/48000)"
        )
    if bitrate_kbps not in _BITRATES or bitrate_kbps == 0:
        raise ValueError(f"mp1 bitrate {bitrate_kbps} not in the Layer I table")
    if 12 * bitrate_kbps * 1000 % sr_hz:
        # 44.1 kHz needs padding-bit alternation; this encoder only
        # emits integral-slot combinations (decoder handles padded
        # foreign frames fine)
        raise UnsupportedCodec(
            f"mp1 encoder needs integral slots; {bitrate_kbps} kbps at {sr_hz} Hz"
        )
    slots = 12 * bitrate_kbps * 1000 // sr_hz
    frame_bits = slots * 32
    n = len(pcm)
    n_frames = max(1, -(-(n + _DELAY) // _SAMPLES_PER_FRAME))
    x = np.zeros(n_frames * _SAMPLES_PER_FRAME)
    x[:n] = np.clip(pcm, -1.0, 1.0)
    sub = _analyze(x, _ANALYSIS, n_frames * _GRANULES)
    sub = sub.reshape(n_frames, _GRANULES, _M)

    header = np.zeros(32, dtype=np.uint8)
    header[:11] = 1                                   # syncword (11 bits)
    header[11:13] = (1, 1)                            # MPEG-1
    header[13:15] = (1, 1)                            # Layer I
    header[15] = 1                                    # protection: no CRC
    br_idx = _BITRATES.index(bitrate_kbps)
    header[16:20] = _bits_of(np.array([br_idx]), 4)[0]
    header[20:22] = _bits_of(np.array([_SAMPLE_RATES.index(sr_hz)]), 2)[0]
    # padding 0 (bit 22), private 0 (bit 23)
    header[24:26] = (1, 1)                            # mode: single channel
    # mode_ext 00 (26-27), copyright 0 (28)
    header[29] = 1                                    # original
    # emphasis 00 (30-31)

    out = bytearray()
    for f in range(n_frames):
        frame_sub = sub[f]                            # (12, 32)
        maxabs = np.abs(frame_sub).max(axis=0)        # (32,)
        energy = (frame_sub ** 2).sum(axis=0)
        budget = frame_bits - 32 - 4 * _M
        nb = _allocate_bits(energy, budget)
        active = np.flatnonzero(nb)
        # smallest scalefactor covering the frame's peak (table is
        # decreasing; _SCALEFACTORS[0] = 2.0 bounds the filterbank gain)
        sf_idx = np.clip(
            (_SCALEFACTORS[None, :] >= maxabs[:, None]).sum(axis=1) - 1, 0, 62
        )
        bits = np.zeros(frame_bits, dtype=np.uint8)
        bits[:32] = header
        pos = 32
        alloc_code = np.where(nb > 0, nb - 1, 0)
        bits[pos: pos + 4 * _M] = _bits_of(alloc_code, 4).ravel()
        pos += 4 * _M
        if active.size:
            bits[pos: pos + 6 * active.size] = (
                _bits_of(sf_idx[active], 6).ravel()
            )
            pos += 6 * active.size
            sf = _SCALEFACTORS[sf_idx[active]]
            nba = nb[active]
            levels = (1 << nba) - 1
            # invert s'' = (2^nb/(2^nb-1)) (s''' + 2^(1-nb)),
            # s''' = code/2^(nb-1) - 1
            v = frame_sub[:, active] / sf                 # (12, n_active)
            s3 = v * (levels / (1 << nba)) - 2.0 ** (1 - nba)
            code = np.floor((s3 + 1.0) * (1 << (nba - 1)) + 0.5)
            code = np.clip(code, 0, levels - 1).astype(np.int64)
            # granule-major, subband-minor sample order (Layer I):
            # build each subband's (12, nb) bit block once, concat along
            # the subband axis, ravel -> the whole sample region
            blocks = [
                _bits_of(code[:, j], int(w)) for j, w in enumerate(nba)
            ]
            region = np.concatenate(blocks, axis=1).ravel()
            bits[pos: pos + region.size] = region
            pos += region.size
        if pos > frame_bits:
            raise AssertionError("mp1 frame overflow — allocator bug")
        out.extend(np.packbits(bits).tobytes())
    return bytes(out)


# ------------------------------------------------------------ decode


def _parse_header(raw: bytes, pos: int) -> dict:
    if pos + 4 > len(raw):
        raise ValueError("truncated mp1 frame header")
    b = np.unpackbits(np.frombuffer(raw[pos: pos + 4], dtype=np.uint8))
    if not b[:11].all():
        raise ValueError("lost MPEG audio frame sync")
    version = (int(b[11]), int(b[12]))
    if version == (0, 1):
        raise ValueError("reserved MPEG version id")
    if version != (1, 1):
        raise UnsupportedCodec("MPEG-2/2.5 LSF audio")
    layer = (int(b[13]), int(b[14]))
    if layer == (0, 0):
        raise ValueError("reserved MPEG layer id")
    if layer != (1, 1):
        raise UnsupportedCodec("MPEG-1 Layer II/III audio")
    crc_present = b[15] == 0
    br_idx = int(_uint_from_bits(b[16:20]))
    if br_idx == 15:
        raise ValueError("forbidden mp1 bitrate index 15")
    if br_idx == 0:
        raise UnsupportedCodec("mp1 free-format bitrate")
    sr_idx = int(_uint_from_bits(b[20:22]))
    if sr_idx == 3:
        raise ValueError("reserved mp1 sample rate index")
    padding = int(b[22])
    mode = (int(b[24]), int(b[25]))
    if mode != (1, 1):
        raise UnsupportedCodec("mp1 stereo/joint/dual modes (mono only)")
    sr = _SAMPLE_RATES[sr_idx]
    slots = 12 * _BITRATES[br_idx] * 1000 // sr + padding
    return {"sr": sr, "frame_bytes": slots * 4, "crc": crc_present}


def _decode_frame(bits: np.ndarray, crc_present: bool) -> np.ndarray:
    """Payload bits (after the 32-bit header) -> (12, 32) subbands."""
    pos = 16 if crc_present else 0  # CRC-16 skipped, not verified
    if pos + 4 * _M > len(bits):
        raise ValueError("truncated mp1 frame: no room for allocation")
    alloc = _uint_from_bits(bits[pos: pos + 4 * _M].reshape(_M, 4))
    pos += 4 * _M
    if (alloc == 15).any():
        raise ValueError("forbidden mp1 allocation code 15")
    nb = np.where(alloc > 0, alloc + 1, 0)
    active = np.flatnonzero(nb)
    sub = np.zeros((_GRANULES, _M))
    if not active.size:
        return sub
    if pos + 6 * active.size > len(bits):
        raise ValueError("truncated mp1 frame: no room for scalefactors")
    sf_idx = _uint_from_bits(bits[pos: pos + 6 * active.size].reshape(-1, 6))
    pos += 6 * active.size
    if (sf_idx > 62).any():
        raise ValueError("invalid mp1 scalefactor index 63")
    nba = nb[active]
    per_granule = int(nba.sum())
    if pos + _GRANULES * per_granule > len(bits):
        raise ValueError("truncated mp1 frame: no room for samples")
    # sample-region bit offsets for every (granule, active subband):
    # granule-major layout, widths vary per subband -> cumsum
    starts_in_granule = np.concatenate([[0], np.cumsum(nba)[:-1]])
    offs = (pos + np.arange(_GRANULES)[:, None] * per_granule
            + starts_in_granule[None, :])               # (12, n_active)
    codes = np.zeros((_GRANULES, active.size), dtype=np.int64)
    for j, w in enumerate(nba):
        idx = offs[:, j][:, None] + np.arange(int(w))[None, :]
        codes[:, j] = _uint_from_bits(bits[idx])
    levels = (1 << nba) - 1
    if (codes == levels[None, :]).any():
        raise ValueError("forbidden all-ones mp1 sample code")
    s3 = codes / (1 << (nba - 1)).astype(np.float64) - 1.0
    s2 = ((1 << nba) / levels).astype(np.float64) * (s3 + 2.0 ** (1 - nba))
    sub[:, active] = s2 * _SCALEFACTORS[sf_idx][None, :]
    return sub


def decode_mp1(raw: bytes) -> tuple[np.ndarray, int]:
    """MPEG-1 Layer I mono frames -> (float32 PCM in [-1, 1], sample rate).

    The 481-sample filterbank delay is dropped, so sample 0 of the
    output aligns with sample 0 of the encoder's input; output length
    is n_frames*384 - 481 (up to 383 trailing pad samples relative to
    the original signal — real mp1 frames carry no length field).
    """
    if len(raw) < 4:
        raise ValueError("mp1 stream shorter than one frame header")
    pos, sr = 0, None
    frames = []
    while pos < len(raw):
        hdr = _parse_header(raw, pos)
        if sr is None:
            sr = hdr["sr"]
        elif hdr["sr"] != sr:
            raise ValueError("mp1 sample rate changes mid-stream")
        if pos + hdr["frame_bytes"] > len(raw):
            raise ValueError("truncated mp1 frame body")
        payload = np.unpackbits(
            np.frombuffer(raw[pos + 4: pos + hdr["frame_bytes"]], dtype=np.uint8)
        )
        frames.append(_decode_frame(payload, hdr["crc"]))
        pos += hdr["frame_bytes"]
    sub = np.concatenate(frames, axis=0)
    y = _synthesize(sub, _SYNTHESIS)
    return y[_DELAY:].astype(np.float32), int(sr)
