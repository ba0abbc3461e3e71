"""Audio DSP: STFT, constellation peaks, combinatorial landmark hashes.

This is the graft analog of the reference's flatMap unnest
(src/flink_job/job.py:63-75): 1 clip -> N landmark hashes. All math
is numpy (vectorized per clip, batched per Arrow batch); the Spark
boundary is `mapInPandas`, so the JVM<->Python transfer is columnar
Arrow, never per-row pickling (the reference's per-record Beam
round-trip is the throughput ceiling we remove).

The landmark scheme follows the published Shazam constellation
approach (Wang 2003, "An Industrial-Strength Audio Search Algorithm"):
spectrogram -> per-band spectral peaks -> anchor/target pairs ->
hash = (f_anchor, f_target, dt) packed into an int64.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from . import codec, schema

# fixed analysis parameters — must be identical for index build and probe
N_FFT = 512
HOP = 256
N_BANDS = 6
PEAK_FACTOR = 2.0  # band peak must exceed PEAK_FACTOR * frame-set mean magnitude
FAN_OUT = 5  # targets per anchor
MAX_DT_FRAMES = 32  # pairing window
SR_REF = 8000  # canonical analysis rate: clips at any sr_hz normalize here
RESAMPLE_HALF_TAPS = 16  # windowed-sinc kernel half-width at the wider band


def resample(
    pcm: np.ndarray, sr_in: int, sr_out: int,
    half_taps: int = RESAMPLE_HALF_TAPS,
) -> np.ndarray:
    """Windowed-sinc fractional resampler, fully vectorized.

    The input-table contract carries a per-clip ``sr_hz`` column — a
    web-scale corpus is mixed-rate, so probe clips must be normalized
    to SR_REF before the STFT or their landmark hashes live in a
    different bin space than the index. Kernel: Hann-windowed sinc at
    cutoff min(1, sr_out/sr_in) (anti-aliasing when downsampling, with
    the kernel widened by 1/cutoff to keep the transition band
    proportional), edge-hold padding, per-output-sample DC
    normalization. Output time axis is preserved (t_out = t_in), so
    match offsets stay in source-track milliseconds. The gather matrix
    is built in bounded chunks to keep per-clip memory flat inside
    Arrow workers."""
    if sr_in == sr_out:
        return np.asarray(pcm, dtype=np.float32)
    if sr_in <= 0 or sr_out <= 0:
        raise ValueError(f"bad sample rates {sr_in} -> {sr_out}")
    x = np.asarray(pcm, dtype=np.float64)
    n_in = len(x)
    n_out = int(round(n_in * sr_out / sr_in))
    if n_in == 0 or n_out == 0:
        return np.zeros(0, dtype=np.float32)
    cutoff = min(1.0, sr_out / sr_in)
    h_taps = int(np.ceil(half_taps / cutoff))
    k = np.arange(-h_taps + 1, h_taps + 1, dtype=np.float64)
    out = np.empty(n_out, dtype=np.float64)
    for lo in range(0, n_out, 65536):
        hi = min(lo + 65536, n_out)
        t = np.arange(lo, hi, dtype=np.float64) * (sr_in / sr_out)
        i0 = np.floor(t).astype(np.int64)
        frac = t - i0
        d = k[None, :] - frac[:, None]
        kern = cutoff * np.sinc(cutoff * d)
        kern *= np.where(
            np.abs(d) < h_taps, 0.5 + 0.5 * np.cos(np.pi * d / h_taps), 0.0
        )
        kern /= kern.sum(axis=1, keepdims=True)
        idx = np.clip(i0[:, None] + k[None, :].astype(np.int64), 0, n_in - 1)
        out[lo:hi] = (x[idx] * kern).sum(axis=1)
    return out.astype(np.float32)


def stft_mag(pcm: np.ndarray, n_fft: int = N_FFT, hop: int = HOP) -> np.ndarray:
    """Magnitude spectrogram, frames x (n_fft//2+1). Pure numpy (strided)."""
    if len(pcm) < n_fft:
        pcm = np.pad(pcm, (0, n_fft - len(pcm)))
    n_frames = 1 + (len(pcm) - n_fft) // hop
    strides = (pcm.strides[0] * hop, pcm.strides[0])
    frames = np.lib.stride_tricks.as_strided(
        pcm, shape=(n_frames, n_fft), strides=strides
    )
    win = np.hanning(n_fft).astype(np.float32)
    return np.abs(np.fft.rfft(frames * win, axis=1)).astype(np.float32)


_BAND_EDGES = np.unique(
    np.round(np.geomspace(2, N_FFT // 2 + 1, N_BANDS + 1)).astype(int)
)


def constellation_peaks(mag: np.ndarray) -> np.ndarray:
    """Per-frame, per-log-band spectral maxima above an adaptive threshold.

    Returns int32 array of (frame, bin) pairs, frame-ordered. Band
    maxima are robust to the sub-hop frame misalignment between an
    excerpt and its source track: a steady tone peaks in the same bin
    either way, which is what makes the hashes reproducible.
    """
    if mag.size == 0:
        return np.empty((0, 2), dtype=np.int32)
    thresh = PEAK_FACTOR * float(mag.mean())
    out_frames, out_bins = [], []
    for b in range(len(_BAND_EDGES) - 1):
        lo, hi = _BAND_EDGES[b], _BAND_EDGES[b + 1]
        band = mag[:, lo:hi]
        if band.shape[1] == 0:
            continue
        idx = band.argmax(axis=1)
        val = band[np.arange(band.shape[0]), idx]
        keep = val > thresh
        out_frames.append(np.nonzero(keep)[0])
        out_bins.append(idx[keep] + lo)
    if not out_frames:
        return np.empty((0, 2), dtype=np.int32)
    frames = np.concatenate(out_frames)
    bins = np.concatenate(out_bins)
    order = np.lexsort((bins, frames))
    return np.stack([frames[order], bins[order]], axis=1).astype(np.int32)


def landmark_hashes(peaks: np.ndarray, sr_hz: int) -> tuple[np.ndarray, np.ndarray]:
    """Anchor-target combinatorial hashes.

    hash = (f_anchor << 19) | (f_target << 10) | dt_frames  (fits int64;
    bins < 512 -> 9 bits each, dt <= MAX_DT_FRAMES -> 10 bits)
    Returns (hashes int64, t_ms int32 anchor offsets).
    """
    n = len(peaks)
    if n == 0:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int32)
    frames = peaks[:, 0].astype(np.int64)
    bins = peaks[:, 1].astype(np.int64)
    hashes, t_out = [], []
    # vectorized per fan-out step: pair peak i with peaks i+1 .. i+FAN_OUT
    for k in range(1, FAN_OUT + 1):
        if n <= k:
            break
        fa, ft = bins[:-k], bins[k:]
        dt = frames[k:] - frames[:-k]
        ok = (dt > 0) & (dt <= MAX_DT_FRAMES)
        h = (fa[ok] << 19) | (ft[ok] << 10) | dt[ok]
        hashes.append(h)
        t_out.append(frames[:-k][ok])
    if not hashes:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int32)
    h = np.concatenate(hashes)
    t_frames = np.concatenate(t_out)
    t_ms = (t_frames * HOP * 1000 // sr_hz).astype(np.int32)
    return h.astype(np.int64), t_ms


def extract_clip_landmarks(
    raw: bytes, codec_name: str, sr_hz: int
) -> tuple[np.ndarray, np.ndarray]:
    """bytes -> (hashes, t_ms). The full per-clip DSP chain; clips at
    any sample rate normalize to SR_REF first (mixed-rate corpus
    support — hashes must share one STFT bin space with the index)."""
    pcm = codec.decode(raw, codec_name)
    if sr_hz != SR_REF:
        pcm = resample(pcm, sr_hz, SR_REF)
    mag = stft_mag(pcm)
    peaks = constellation_peaks(mag)
    return landmark_hashes(peaks, SR_REF)


def extract_clip_landmarks_safe(
    raw: bytes, codec_name: str, sr_hz: int
) -> tuple[np.ndarray, np.ndarray, bool]:
    """(hashes, t_ms, ok). The per-row error contract at corpus scale:
    one corrupt blob or unknown codec among 10^12 clips must surface
    as ok=False for THAT row, never as a task failure that kills the
    batch (same contract the media path pins in
    multimodal.frame_sample_features; decoders are fuzz-tested to
    raise exactly ValueError/UnsupportedCodec)."""
    try:
        h, t = extract_clip_landmarks(raw, codec_name, sr_hz)
        return h, t, True
    except (ValueError, codec.UnsupportedCodec):
        return (
            np.empty(0, dtype=np.int64),
            np.empty(0, dtype=np.int32),
            False,
        )


def quarantine_clips(clips: DataFrame, id_col: str = "clip_id") -> DataFrame:
    """(clip_id, reason) for every row the landmark chain cannot
    decode — the accounting side of the skip policy, so dropped rows
    are observable instead of silently vanishing from the corpus."""
    out_schema = "clip_id string, reason string"
    cols = [id_col, "bytes", "sr_hz", "codec"]

    def scan(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for cid, raw, sr, cname in zip(
                pdf[id_col], pdf["bytes"], pdf["sr_hz"], pdf["codec"]
            ):
                try:
                    extract_clip_landmarks(bytes(raw), cname, int(sr))
                except (ValueError, codec.UnsupportedCodec) as e:
                    rows.append((cid, f"{type(e).__name__}: {e}"))
            yield pd.DataFrame(rows, columns=["clip_id", "reason"])

    return clips.select(*cols).mapInPandas(scan, out_schema)


# ---------------------------------------------------------------- Spark plumbing


def landmarks(clips: DataFrame, id_col: str = "clip_id") -> DataFrame:
    """clips(clip_id, bytes, sr_hz, codec, event_ms) -> landmark rows.

    Arrow-batched mapInPandas: the stage is stateless and embarrassingly
    parallel, so it scales linearly with cores/executors — the property
    the N-vs-4N scaling criterion leans on.
    """
    cols = [id_col, "bytes", "sr_hz", "codec", "event_ms"]

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, hs, ts, evs = [], [], [], []
            for cid, raw, sr, cname, ev in zip(
                pdf[id_col], pdf["bytes"], pdf["sr_hz"], pdf["codec"], pdf["event_ms"]
            ):
                # skip-with-accounting: corrupt rows emit no landmarks
                # (quarantine_clips lists them) instead of failing the task
                h, t, _ok = extract_clip_landmarks_safe(raw, cname, int(sr))
                if len(h) == 0:
                    continue
                ids.append(np.full(len(h), cid, dtype=object))
                hs.append(h)
                ts.append(t)
                evs.append(np.full(len(h), int(ev), dtype=np.int64))
            if not ids:
                yield pd.DataFrame(
                    {
                        "clip_id": pd.Series([], dtype=object),
                        "hash": pd.Series([], dtype=np.int64),
                        "t_ms": pd.Series([], dtype=np.int32),
                        "event_ms": pd.Series([], dtype=np.int64),
                    }
                )
                continue
            yield pd.DataFrame(
                {
                    "clip_id": np.concatenate(ids),
                    "hash": np.concatenate(hs),
                    "t_ms": np.concatenate(ts),
                    "event_ms": np.concatenate(evs),
                }
            )

    return clips.select(*cols).mapInPandas(extract, schema.LANDMARK)
