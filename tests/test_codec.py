"""Codec round-trip invariants (BASELINE.json input_hint: SNR >= 30 dB)."""

import numpy as np
import pytest

from sparkfp import codec


def _signal(n=8000, seed=7):
    rng = np.random.Generator(np.random.Philox(key=[seed, 0]))
    t = np.arange(n) / 8000.0
    pcm = 0.4 * np.sin(2 * np.pi * 440 * t) + 0.2 * np.sin(2 * np.pi * 1200 * t)
    pcm += 0.02 * rng.standard_normal(n)
    return np.clip(pcm, -1, 1).astype(np.float32)


def test_pcm_s16le_roundtrip_snr():
    pcm = _signal()
    out = codec.decode(codec.encode(pcm, "pcm_s16le"), "pcm_s16le")
    assert len(out) == len(pcm)
    assert codec.snr_db(pcm, out) >= 80.0  # 16-bit quantization ~90 dB


def test_ulaw_roundtrip_snr():
    pcm = _signal()
    out = codec.decode(codec.encode(pcm, "ulaw"), "ulaw")
    assert len(out) == len(pcm)
    assert codec.snr_db(pcm, out) >= 30.0  # the input_hint floor


def test_unsupported_codec_is_stubbed():
    with pytest.raises(codec.UnsupportedCodec):
        codec.decode(b"\x00\x01", "mp3")
    with pytest.raises(codec.UnsupportedCodec):
        codec.encode(np.zeros(10, dtype=np.float32), "aac")


def test_decode_is_deterministic():
    pcm = _signal()
    raw = codec.encode(pcm, "ulaw")
    a = codec.decode(raw, "ulaw")
    b = codec.decode(raw, "ulaw")
    assert np.array_equal(a, b)
