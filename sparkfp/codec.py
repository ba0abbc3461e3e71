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
