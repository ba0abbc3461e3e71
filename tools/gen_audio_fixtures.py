"""Regenerate the committed oracle fixtures for the audio/multimodal
driver queries (audio_match, audio_landmarks, media_byte_features,
media_frame_features).

The expected values are computed by the **independent oracle**
(tools/dsp_oracle.py — direct-DFT spectrogram, naive peak/pair/vote
loops, scalar decoders; zero code shared with sparkfp/), NOT by the
engine, so the driver's rows/schema/value-hash gate verifies the
engine against independently-coded ground truth rather than pinning
its own output. The inputs are the same deterministic seeded synth
rows (sparkfp/synth.py) the queries in __spark_entry__.py construct —
synth is the data *generator*, not the system under test.

tests/test_dsp_oracle.py asserts engine == oracle == committed
fixture; rerun this script (and review the diff!) after any
intentional contract change to the DSP/matcher.

Usage: python tools/gen_audio_fixtures.py
"""

from __future__ import annotations

import hashlib
import os
import sys
from collections import Counter

import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import tools.dsp_oracle as orc  # noqa: E402
from sparkfp import codec, jpeg, synth  # noqa: E402  (input construction only)

FIXTURE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "fixtures"
)

# input shapes — keep in lockstep with the queries in __spark_entry__.py
N_TRACKS = 4
N_MATCH_CLIPS = 24
N_LANDMARK_CLIPS = 16
N_BYTE_CLIPS = 16
N_FRAME_CLIPS = 8
N_FRAME_IMAGES = 2  # h264 fake-boundary rows (was 4; jpeg/mjpeg are real now)
N_FRAME_BMPS = 4
N_FRAME_PNGS = 4
N_FRAME_JPEGS = 2
N_FRAME_MJPEGS = 2


def _clip(i: int, track_ids: list[str]) -> tuple:
    return synth.clip_row(f"clip_{i:08d}", track_ids)


def gen_audio_match(track_ids: list[str]) -> pd.DataFrame:
    tracks = [
        (t, codec.encode(synth.track_pcm(t), "pcm_s16le"), "pcm_s16le", synth.SR_HZ)
        for t in track_ids
    ]
    index = orc.build_index(tracks)
    rows = []
    probes = [_clip(i, track_ids) for i in range(N_MATCH_CLIPS)]
    # foreign-rate probes (16 k / 22.05 k analytic excerpts): the
    # oracle normalizes them through its scalar-sinc resampler — the
    # engine's mixed-rate path is thereby driver-hash-gated
    probes += synth.mixed_rate_clip_rows(track_ids)
    for cid, raw, sr, dur, cname, _, _ in probes:
        m = orc.match_clip(orc.clip_landmarks(raw, cname, sr), index, dur)
        if m is not None:
            rows.append((cid, m[0], m[1], m[2], orc.round_half_up(m[3], 4)))
    return pd.DataFrame(
        rows, columns=["clip_id", "matched_track", "offset_ms", "vote_count", "score"]
    ).astype({"offset_ms": "int64", "vote_count": "int64", "score": "float64"})


def gen_audio_landmarks(track_ids: list[str]) -> pd.DataFrame:
    rows = []
    for i in range(N_LANDMARK_CLIPS):
        cid, raw, sr, _, cname, _, _ = _clip(i, track_ids)
        lms = orc.clip_landmarks(raw, cname, sr)
        rows.append((cid, len(lms), len({h for h, _ in lms})))
    return pd.DataFrame(
        rows, columns=["clip_id", "n_landmarks", "n_distinct_hashes"]
    ).astype({"n_landmarks": "int64", "n_distinct_hashes": "int64"})


def gen_media_byte_features(track_ids: list[str]) -> pd.DataFrame:
    rows = []
    for i in range(N_BYTE_CLIPS):
        cid, raw, _, _, _, _, _ = _clip(i, track_ids)
        n, mean, ent, zr = orc.byte_features(raw)
        rows.append(
            (
                cid,
                n,
                orc.round_half_up(mean, 4),
                orc.round_half_up(ent, 4),
                orc.round_half_up(zr, 4),
            )
        )
    return pd.DataFrame(
        rows,
        columns=["media_id", "n_bytes", "byte_mean", "byte_entropy", "zero_ratio"],
    ).astype({"n_bytes": "int64"})


def frame_feature_inputs(track_ids: list[str]) -> list[tuple[str, bytes, str]]:
    items = [
        (f"clip_{i:08d}", _clip(i, track_ids)[1], "pcm_s16le")
        for i in range(N_FRAME_CLIPS)
    ]
    # one row per companded/containered audio codec: engine vectorized
    # decode vs the oracle's spec-table / struct-walk scalar decoders
    items += [
        (f"{cname}_00",
         synth.clip_row(f"{cname}_00", track_ids, codec_name=cname)[1], cname)
        for cname in ("alaw", "wav", "adpcm")
    ]
    # WAV format-breadth rows: 24-bit WAVE_FORMAT_EXTENSIBLE stereo
    # (decorrelated channels -> the channel mean is load-bearing) and
    # IEEE float32 — engine vectorized byte assembly vs the oracle's
    # per-sample struct walk
    import numpy as np  # input construction only

    _seg = synth.track_pcm(track_ids[0])[:12000]
    items += [
        ("wav24_00",
         codec.encode_wav_variant(
             np.stack([_seg, -0.5 * _seg], axis=1), synth.SR_HZ,
             bits=24, extensible=True,
         ), "wav"),
        ("wavf32_00",
         codec.encode_wav_variant(
             _seg, synth.SR_HZ, bits=32, sample_format="float",
         ), "wav"),
    ]
    # frame-codec rows: reuse the mixed-rate probes' bytes so
    # construction stays shared with the audio_match foreign-rate
    # rows — mp1 (lossy; oracle = scalar frame walk + triple-loop
    # synthesis filterbank) and flac (lossless; oracle = scalar
    # bit reader + binomial predictor recurrences)
    items += [
        (row[0], row[1], row[4])
        for row in synth.mixed_rate_clip_rows(track_ids)
        if row[4] in ("mp1", "flac")
    ]
    # MPEG-1 Layer II row (grouped quantizers + SCFSI + the B.2b
    # allocation table): engine offset-gather decode vs the oracle's
    # scalar per-bit frame walk
    items += [
        ("mp2_00",
         codec.encode(
             synth.track_pcm(track_ids[2], sr_hz=32000)[:32000],
             "mp2", sr_hz=32000,
         ), "mp2"),
    ]
    # big-endian container rows: AIFF (stereo, channel mean) and Sun
    # AU (A-law payload) — engine frombuffer vs scalar struct walks
    _aseg = synth.track_pcm(track_ids[3])[:12000]
    items += [
        ("aiff_00",
         codec.encode_aiff(
             np.stack([_aseg, -0.5 * _aseg], axis=1), synth.SR_HZ
         ), "aiff"),
        ("au_00", codec.encode_au(_aseg, synth.SR_HZ, encoding=27), "au"),
    ]
    # h264 = the remaining deterministic-fake boundary (needs ffmpeg)
    items += [
        (f"img_{i:02d}", hashlib.md5(b"img%d" % i).digest() * 64, "h264")
        for i in range(N_FRAME_IMAGES)
    ]
    # real lossy rows: baseline JPEG (one 4:4:4, one 4:2:0) and MJPEG
    # video (one AVI container, one raw concatenated stream) — the
    # oracle decodes them with its own scalar T.81 decoder + container
    # walk, so the lossy image AND video decode paths are fixture-gated
    items += [
        (f"jpg_{i:02d}",
         synth.image_bytes(f"jpg_{i:02d}", "jpeg"),  # encode_image: 4:4:4
         "jpeg")
        for i in range(N_FRAME_JPEGS - 1)
    ] + [
        ("jpg_sub",
         jpeg.encode_jpeg(
             synth.image_pixels("jpg_sub"), quality=85, subsample=True
         ),
         "jpeg"),
        # progressive (SOF2): the oracle decodes the actual SOF2 bytes
        # with its own scalar spectral-selection/successive-approximation
        # scan decoder — a genuine second implementation of T.81 G.2
        ("jpg_prog",
         jpeg.encode_jpeg(
             synth.image_pixels("jpg_prog"), quality=85, progressive=True
         ),
         "jpeg"),
    ]
    items += [
        ("mjv_avi", synth.mjpeg_bytes("mjv_avi", n_frames=3), "mjpeg"),
        ("mjv_raw",
         synth.mjpeg_bytes("mjv_raw", n_frames=2, container="raw",
                           subsample=True, quality=85),
         "mjpeg"),
    ]
    # real BMP/PNG rows: bytes come from the shared synth generator
    # (input construction), but the oracle decodes them with its own
    # scalar parsers — a genuine engine-vs-oracle image decode
    # comparison; each PNG row uses a different scanline filter
    # (Sub/Up/Average/Paeth) so every reconstruction path is gated
    items += [
        (f"bmp_{i:02d}", synth.image_bytes(f"bmp_{i:02d}"), "bmp")
        for i in range(N_FRAME_BMPS)
    ]
    items += [
        (f"png_{i:02d}",
         synth.image_bytes(f"png_{i:02d}", "png", png_filter=i + 1), "png")
        for i in range(N_FRAME_PNGS)
    ]
    # Adam7 interlaced PNG: the engine's strided-scatter pass walk vs
    # the oracle's scalar per-pass grid placement; and indexed-color
    # (PLTE) with the engine's np.unique palette vs the oracle's
    # scalar per-index expansion
    items += [
        ("png_il",
         synth.image_bytes("png_il", "png", png_filter=4,
                           png_interlace=True), "png"),
        ("png_pal",
         codec.encode_image(
             synth.paletted_pixels("png_pal"), "png", png_filter=1,
             png_palette=True,
         ), "png"),
        # foreign-writer shapes our encoder does not emit: 16-bit
        # grayscale (high-byte downscale) and 8-bit gray+alpha, both
        # Sub-filtered at byte distance 2
        ("png_g16", synth.png_foreign_bytes("png_g16", "gray16"), "png"),
        ("png_ga", synth.png_foreign_bytes("png_ga", "ga"), "png"),
    ]
    # real GIF rows (LZW indexed color): one sequential, one 4-pass
    # interlaced — the oracle decodes both with its own chain-table LZW
    # and scalar de-interlace walk
    from sparkfp import gif as _gif  # input construction only

    items += [
        ("gif_00", _gif.encode_gif(synth.paletted_pixels("gif_00")), "gif"),
        ("gif_il",
         _gif.encode_gif(
             synth.paletted_pixels("gif_il", h=33, n_colors=256),
             interlace=True,
         ),
         "gif"),
    ]
    return items


def gen_media_frame_features(track_ids: list[str]) -> pd.DataFrame:
    rows = []
    for mid, raw, cname in frame_feature_inputs(track_ids):
        mean, std, decoded = orc.frame_features(raw, cname)
        rows.append(
            (
                mid,
                orc.round_half_up(mean, 4) if decoded else None,
                orc.round_half_up(std, 4) if decoded else None,
                decoded,
            )
        )
    return pd.DataFrame(
        rows, columns=["media_id", "frame_mean", "frame_std", "decoded"]
    ).astype({"frame_mean": "float64", "frame_std": "float64", "decoded": "bool"})


GENERATORS = {
    "audio_match": gen_audio_match,
    "audio_landmarks": gen_audio_landmarks,
    "media_byte_features": gen_media_byte_features,
    "media_frame_features": gen_media_frame_features,
}


def generate(name: str) -> pd.DataFrame:
    """Oracle-expected table for one fixture query, sorted canonically."""
    pdf = GENERATORS[name](synth.default_track_ids(N_TRACKS))
    _count_check = Counter(pdf.columns)
    assert all(v == 1 for v in _count_check.values())
    return pdf.sort_values(list(pdf.columns)).reset_index(drop=True)


def main() -> None:
    os.makedirs(FIXTURE_DIR, exist_ok=True)
    for name in GENERATORS:
        pdf = generate(name)
        path = os.path.join(FIXTURE_DIR, f"{name}_expected.parquet")
        pdf.to_parquet(path, index=False)
        print(f"wrote {path}: {len(pdf)} rows, dtypes={dict(pdf.dtypes.astype(str))}")


if __name__ == "__main__":
    main()
