"""MPEG-1 Audio Layer I ("mp1") and Layer II ("mp2") codecs in pure
numpy.

Shrinks the engine's unsupported-audio-codec surface (mp3/ogg/aac)
by two real members of the MPEG family: clips tagged ``codec='mp1'``
or ``codec='mp2'`` now decode for real through the same per-batch
dispatch as pcm/ulaw/alaw/wav/adpcm (the opaque-bytes decode boundary
the engine grafts from the reference's pickle deserialization,
src/flink_job/serialization.py:14-20). Layer II (the DAB/DVB
broadcast codec) shares the Layer I filterbank; its frame syntax and
quantizer structure live in the Layer II section below.

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
bytes raise ValueError; valid-but-unimplemented streams (Layer III,
MPEG-2 LSF, stereo modes, free-format bitrate, Layer II low-bitrate
table classes) raise UnsupportedCodec. Never struct.error/IndexError
— one corrupt row must quarantine, not kill the Spark task
(multimodal decode-error contract).
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


# ===================================================== Layer II ("mp2")
#
# Layer II (ISO/IEC 11172-3, 2.4.1.6 / 2.4.2.2 / B.2) extends Layer I:
# 1152 samples per frame (3 parts x 12 granules-of-3), one-byte slots,
# per-subband quantizer MENUS selected by an allocation table keyed on
# (sample rate, bitrate per channel), scalefactor-selection info
# (SCFSI) sharing scalefactors across the three parts, and GROUPED
# quantization for 3/5/9-level quantizers (three samples in one
# 5/7/10-bit code).
#
# Spec constants vs closed form (same policy as the Layer I section):
# - Tables B.2a (sblimit 27) and B.2b (sblimit 30) are spec constants,
#   cited like JPEG's Annex K: the per-band quantizer menus below are
#   the published tables, not derived. Streams whose (rate, bitrate)
#   class selects the low-bitrate tables B.2c/d raise UnsupportedCodec.
# - Table B.4 (requantization C/D coefficients) is NOT copied: for
#   every Layer II quantizer the C/D composition with the n-bit s'''
#   representation collapses to the uniform mid-tread lattice
#       s'' = (2c - L + 1) / L,   c in {0..L-1}
#   (proof: ungrouped L = 2^n - 1 gives C = 2^n/L, D = 2^(1-n), so
#   C*(c/2^(n-1) - 1 + D) = (2c - L + 1)/L; grouped L in {3,5,9} gives
#   C = 2^n/L, D = 1/2, same algebra). The codec quantizes/requantizes
#   on that closed-form lattice directly — bit-exact with the table.

_BITRATES_L2 = (0, 32, 48, 56, 64, 80, 96, 112, 128, 160,
                192, 224, 256, 320, 384)
_GRANULES_L2 = 12          # triplet-granules per frame
_PARTS = 3                 # scalefactor parts (12 samples each)
_SAMPLES_PER_FRAME_L2 = _M * _GRANULES_L2 * _PARTS  # 1152

# quantizer menus (ISO B.2a/b band groups); levels per allocation step
_MENU_LOW = (3, 7, 15, 31, 63, 127, 255, 511, 1023, 2047, 4095,
             8191, 16383, 32767, 65535)            # sb 0-2,  nbal 4
_MENU_MID = (3, 5, 7, 9, 15, 31, 63, 127, 255, 511, 1023, 2047,
             4095, 65535)                          # sb 3-10, nbal 4
_MENU_HIGH = (3, 5, 7, 9, 15, 31, 65535)           # sb 11-22, nbal 3
_MENU_TOP = (3, 5, 65535)                          # sb 23+,  nbal 2


def _b2_table(sblimit: int) -> list[tuple]:
    """Per-subband (nbal, menu) rows for ISO Table B.2a (sblimit 27)
    or B.2b (sblimit 30) — same band structure, longer tail."""
    rows = [(4, _MENU_LOW)] * 3 + [(4, _MENU_MID)] * 8 + [(3, _MENU_HIGH)] * 12
    rows += [(2, _MENU_TOP)] * (sblimit - 23)
    return rows[:sblimit]


def _l2_table_for(sr_hz: int, bitrate_kbps: int) -> list[tuple]:
    """ISO 2.4.2.2 allocation-table selection for MONO streams:
    48 kHz -> B.2a; 44.1/32 kHz at >= 56 kbps/ch -> B.2b; the
    low-bitrate classes (<= 48 kbps/ch -> B.2c/d) are unsupported."""
    if bitrate_kbps <= 48:
        raise UnsupportedCodec(
            f"mp2 low-bitrate table class ({bitrate_kbps} kbps/ch)"
        )
    if sr_hz == 48000 or bitrate_kbps <= 80:
        return _b2_table(27)
    return _b2_table(27) if sr_hz == 48000 else _b2_table(30)


def _group_width(levels: int) -> int:
    """Bits per triplet: grouped 3/5/9-level quantizers pack three
    samples into one base-L code (5/7/10 bits); others send three
    n-bit codes, n = log2(levels + 1)."""
    if levels == 3:
        return 5
    if levels == 5:
        return 7
    if levels == 9:
        return 10
    return 3 * int(levels + 1).bit_length() - 3


def _allocate_bits_l2(
    energy: np.ndarray, budget: int, table: list[tuple]
) -> np.ndarray:
    """Greedy menu-walk allocation (encoder freedom, not spec): give
    the next quantizer step to the subband with the best noise
    reduction PER BIT. Unlike Layer I's uniform +1-bit steps, Layer II
    menus have wildly uneven steps (the 2-bit TOP menu jumps 5 ->
    65535 levels, +41 bits/triplet), so ranking by absolute noise
    would burn hundreds of bits silencing near-silent high subbands
    while the dominant band sits coarse — benefit/cost ranking is the
    correct greedy for non-uniform step menus. Step cost is the true
    bit delta (triplet-width delta x 12 granules; activation also
    pays 2 SCFSI + up to 18 scalefactor bits)."""
    import heapq

    sblimit = len(table)
    step = [0] * sblimit  # 0 = silent, k = menu index k-1 active
    noise = [float(e) + 1e-30 for e in energy[:sblimit]]

    def entry(sb: int):
        """(neg benefit-per-bit, cost, sb) for sb's next menu step."""
        menu = table[sb][1]
        cur = step[sb]
        if cur >= len(menu):
            return None
        lv_next = menu[cur]
        n_cur = noise[sb] if cur == 0 else noise[sb] / menu[cur - 1] ** 2
        n_next = noise[sb] / (lv_next * lv_next)
        width_now = _group_width(menu[cur - 1]) if cur else 0
        cost = _GRANULES_L2 * (_group_width(lv_next) - width_now)
        if cur == 0:
            cost += 2 + 6 * _PARTS  # scfsi + worst-case scalefactors
        return (-(n_cur - n_next) / cost, cost, sb)

    heap = [e for e in (entry(sb) for sb in range(sblimit)) if e]
    heapq.heapify(heap)
    while heap:
        _, cost, sb = heapq.heappop(heap)
        if cost > budget:
            continue  # budget only shrinks; cheaper steps may still fit
        step[sb] += 1
        budget -= cost
        nxt = entry(sb)
        if nxt:
            heapq.heappush(heap, nxt)
    return np.asarray(step, dtype=np.int64)


def encode_mp2(pcm: np.ndarray, sr_hz: int, bitrate_kbps: int = 192) -> bytes:
    """float PCM in [-1, 1] -> MPEG-1 Layer II mono frames (1152
    samples each; one-byte slots, slots = 144 * bitrate / sample_rate).
    Same delay/padding contract as encode_mp1."""
    pcm = np.asarray(pcm, dtype=np.float64)
    if pcm.ndim != 1:
        raise ValueError(f"encode_mp2 expects mono 1-D PCM, got {pcm.shape}")
    if sr_hz not in _SAMPLE_RATES:
        raise UnsupportedCodec(
            f"mp2 sample rate {sr_hz} (MPEG-1 allows 32000/44100/48000)"
        )
    if bitrate_kbps not in _BITRATES_L2 or bitrate_kbps == 0:
        raise ValueError(f"mp2 bitrate {bitrate_kbps} not in the Layer II table")
    if 144 * bitrate_kbps * 1000 % sr_hz:
        raise UnsupportedCodec(
            f"mp2 encoder needs integral slots; {bitrate_kbps} kbps at {sr_hz} Hz"
        )
    table = _l2_table_for(sr_hz, bitrate_kbps)
    sblimit = len(table)
    frame_bits = (144 * bitrate_kbps * 1000 // sr_hz) * 8
    n = len(pcm)
    n_frames = max(1, -(-(n + _DELAY) // _SAMPLES_PER_FRAME_L2))
    x = np.zeros(n_frames * _SAMPLES_PER_FRAME_L2)
    x[:n] = np.clip(pcm, -1.0, 1.0)
    sub = _analyze(x, _ANALYSIS, n_frames * _GRANULES_L2 * _PARTS)
    sub = sub.reshape(n_frames, _PARTS * _GRANULES_L2, _M)

    header = np.zeros(32, dtype=np.uint8)
    header[:11] = 1                                   # syncword
    header[11:13] = (1, 1)                            # MPEG-1
    header[13:15] = (1, 0)                            # Layer II
    header[15] = 1                                    # no CRC
    header[16:20] = _bits_of(
        np.array([_BITRATES_L2.index(bitrate_kbps)]), 4)[0]
    header[20:22] = _bits_of(np.array([_SAMPLE_RATES.index(sr_hz)]), 2)[0]
    header[24:26] = (1, 1)                            # single channel
    header[29] = 1                                    # original

    nbal = np.asarray([t[0] for t in table])
    out = bytearray()
    for f in range(n_frames):
        frame_sub = sub[f]                            # (36, 32)
        energy = (frame_sub ** 2).sum(axis=0)
        budget = frame_bits - 32 - int(nbal.sum())
        step = _allocate_bits_l2(energy, budget, table)
        bits = np.zeros(frame_bits, dtype=np.uint8)
        bits[:32] = header
        pos = 32
        for sb in range(sblimit):                     # allocation field
            w = table[sb][0]
            bits[pos: pos + w] = _bits_of(np.array([step[sb]]), w)[0]
            pos += w
        active = [sb for sb in range(sblimit) if step[sb]]
        # per-part scalefactors; SCFSI 2 when one index covers the
        # frame, else 0 (all three sent) — both always-valid patterns
        parts = frame_sub.reshape(_PARTS, _GRANULES_L2, _M)
        peak = np.abs(parts).max(axis=1)              # (3, 32)
        sf_idx = np.clip(
            (_SCALEFACTORS[None, None, :] >= peak[:, :, None]).sum(axis=2) - 1,
            0, 62,
        )                                             # (3, 32)
        scfsi = {sb: (2 if sf_idx[0, sb] == sf_idx[1, sb] == sf_idx[2, sb]
                      else 0) for sb in active}
        for sb in active:
            bits[pos: pos + 2] = _bits_of(np.array([scfsi[sb]]), 2)[0]
            pos += 2
        for sb in active:
            sent = [sf_idx[0, sb]] if scfsi[sb] == 2 else sf_idx[:, sb]
            for v in np.atleast_1d(sent):
                bits[pos: pos + 6] = _bits_of(np.array([v]), 6)[0]
                pos += 6
        # samples: granule-major (12 triplets), subband-minor
        for sb in active:
            menu = table[sb][1]
            lv = menu[step[sb] - 1]
            sf = _SCALEFACTORS[sf_idx[:, sb]]         # (3,)
            v = frame_sub[:, sb].reshape(_PARTS, _GRANULES_L2) / sf[:, None]
            c = np.clip(
                np.floor((v + 1.0) * lv / 2.0), 0, lv - 1
            ).astype(np.int64).reshape(_PARTS * _GRANULES_L2)
            trip = c.reshape(_GRANULES_L2 * _PARTS // 3, 3)
            if lv in (3, 5, 9):
                code = trip[:, 0] + lv * trip[:, 1] + lv * lv * trip[:, 2]
                codes_bits = _bits_of(code, _group_width(lv))
            else:
                w1 = int(lv + 1).bit_length() - 1
                codes_bits = _bits_of(trip.ravel(), w1).reshape(
                    trip.shape[0], 3 * w1
                )
            step_w = codes_bits.shape[1]
            # interleave into the granule-major layout via offsets
            stride = sum(
                _group_width(table[s][1][step[s] - 1]) for s in active
            )
            start = sum(
                _group_width(table[s][1][step[s] - 1])
                for s in active if s < sb
            )
            offs = (pos + np.arange(_GRANULES_L2) * stride + start)
            idx = offs[:, None] + np.arange(step_w)[None, :]
            bits[idx.ravel()] = codes_bits.ravel()
        if active:
            pos += _GRANULES_L2 * sum(
                _group_width(table[s][1][step[s] - 1]) for s in active
            )
        if pos > frame_bits:
            raise AssertionError("mp2 frame overflow — allocator bug")
        out.extend(np.packbits(bits).tobytes())
    return bytes(out)


def _parse_header_l2(raw: bytes, pos: int) -> dict:
    """Layer II header parse; shares the Layer I checks but accepts
    layer code (1,0) and the Layer II bitrate table / slot size."""
    if pos + 4 > len(raw):
        raise ValueError("truncated mp2 frame header")
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
    if layer != (1, 0):
        raise UnsupportedCodec("not a Layer II stream")
    crc_present = b[15] == 0
    br_idx = int(_uint_from_bits(b[16:20]))
    if br_idx == 15:
        raise ValueError("forbidden mp2 bitrate index 15")
    if br_idx == 0:
        raise UnsupportedCodec("mp2 free-format bitrate")
    sr_idx = int(_uint_from_bits(b[20:22]))
    if sr_idx == 3:
        raise ValueError("reserved mp2 sample rate index")
    padding = int(b[22])
    mode = (int(b[24]), int(b[25]))
    if mode != (1, 1):
        raise UnsupportedCodec("mp2 stereo/joint/dual modes (mono only)")
    sr = _SAMPLE_RATES[sr_idx]
    kbps = _BITRATES_L2[br_idx]
    _l2_table_for(sr, kbps)  # reject low-bitrate table classes early
    return {
        "sr": sr,
        "frame_bytes": 144 * kbps * 1000 // sr + padding,
        "crc": crc_present,
        "kbps": kbps,
    }


def _decode_frame_l2(bits: np.ndarray, hdr: dict) -> np.ndarray:
    """Payload bits (after the header) -> (36, 32) subband samples."""
    table = _l2_table_for(hdr["sr"], hdr["kbps"])
    sblimit = len(table)
    pos = 16 if hdr["crc"] else 0
    step = np.zeros(sblimit, dtype=np.int64)
    for sb in range(sblimit):                         # allocation field
        w = table[sb][0]
        if pos + w > len(bits):
            raise ValueError("truncated mp2 frame: no room for allocation")
        step[sb] = int(_uint_from_bits(bits[pos: pos + w]))
        if step[sb] >= len(table[sb][1]) + 1:
            raise ValueError(
                f"mp2 allocation {step[sb]} exceeds subband {sb} menu"
            )
        pos += w
    active = np.flatnonzero(step)
    sub = np.zeros((_PARTS * _GRANULES_L2, _M))
    if not active.size:
        return sub
    if pos + 2 * active.size > len(bits):
        raise ValueError("truncated mp2 frame: no room for scfsi")
    scfsi = _uint_from_bits(bits[pos: pos + 2 * active.size].reshape(-1, 2))
    pos += 2 * active.size
    n_sf = np.where(scfsi == 0, 3, np.where(scfsi == 2, 1, 2))
    if pos + 6 * int(n_sf.sum()) > len(bits):
        raise ValueError("truncated mp2 frame: no room for scalefactors")
    sf_part = np.zeros((_PARTS, active.size), dtype=np.int64)
    for j, sb in enumerate(active):
        sent = _uint_from_bits(
            bits[pos: pos + 6 * int(n_sf[j])].reshape(-1, 6)
        )
        pos += 6 * int(n_sf[j])
        if (sent > 62).any():
            raise ValueError("invalid mp2 scalefactor index 63")
        if scfsi[j] == 0:
            sf_part[:, j] = sent
        elif scfsi[j] == 2:
            sf_part[:, j] = sent[0]
        elif scfsi[j] == 1:                           # parts {0,1} | {2}
            sf_part[0, j] = sf_part[1, j] = sent[0]
            sf_part[2, j] = sent[1]
        else:                                         # parts {0} | {1,2}
            sf_part[0, j] = sent[0]
            sf_part[1, j] = sf_part[2, j] = sent[1]
    widths = np.asarray(
        [_group_width(table[sb][1][step[sb] - 1]) for sb in active]
    )
    stride = int(widths.sum())
    if pos + _GRANULES_L2 * stride > len(bits):
        raise ValueError("truncated mp2 frame: no room for samples")
    starts = np.concatenate([[0], np.cumsum(widths)[:-1]])
    for j, sb in enumerate(active):
        lv = table[sb][1][step[sb] - 1]
        offs = pos + np.arange(_GRANULES_L2) * stride + starts[j]
        w = int(widths[j])
        raw_codes = _uint_from_bits(
            bits[offs[:, None] + np.arange(w)[None, :]]
        )
        if lv in (3, 5, 9):
            if (raw_codes >= lv ** 3).any():
                raise ValueError("mp2 grouped code out of range")
            trip = np.stack(
                [raw_codes % lv, (raw_codes // lv) % lv, raw_codes // (lv * lv)],
                axis=1,
            )
        else:
            w1 = w // 3
            trip = _uint_from_bits(
                bits[
                    (offs[:, None] + w1 * np.arange(3)[None, :])[:, :, None]
                    + np.arange(w1)[None, None, :]
                ]
            )
            if (trip == lv).any():
                raise ValueError("forbidden all-ones mp2 sample code")
        samples = trip.reshape(_PARTS * _GRANULES_L2)  # (36,)
        # closed-form Table B.4 lattice (see section comment)
        s2 = (2.0 * samples - lv + 1.0) / lv
        part = np.arange(_PARTS * _GRANULES_L2) // _GRANULES_L2
        sub[:, sb] = s2 * _SCALEFACTORS[sf_part[part, j]]
    return sub


def decode_mp2(raw: bytes) -> tuple[np.ndarray, int]:
    """MPEG-1 Layer II mono frames -> (float32 PCM, sample rate); the
    481-sample filterbank delay is dropped (same contract as
    decode_mp1)."""
    if len(raw) < 4:
        raise ValueError("mp2 stream shorter than one frame header")
    pos, sr = 0, None
    frames = []
    while pos < len(raw):
        hdr = _parse_header_l2(raw, pos)
        if sr is None:
            sr = hdr["sr"]
        elif hdr["sr"] != sr:
            raise ValueError("mp2 sample rate changes mid-stream")
        if pos + hdr["frame_bytes"] > len(raw):
            raise ValueError("truncated mp2 frame body")
        payload = np.unpackbits(
            np.frombuffer(raw[pos + 4: pos + hdr["frame_bytes"]], dtype=np.uint8)
        )
        frames.append(_decode_frame_l2(payload, hdr))
        pos += hdr["frame_bytes"]
    sub = np.concatenate(frames, axis=0)
    y = _synthesize(sub, _SYNTHESIS)
    return y[_DELAY:].astype(np.float32), int(sr)
