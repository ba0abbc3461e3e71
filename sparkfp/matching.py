"""Fingerprint index build + match join + offset-histogram voting.

Graft analog of the reference's fingerprint<->readings window
correlation (src/postprocess/save_fingerprints.py:66-153): the
reference buffers raw readings per key and probes each fingerprint
against them; here live clip landmarks probe a reference track index,
and matches are ranked by offset-histogram votes (Wang 2003 §3.2).

Scale design:
- The index is an Iceberg/parquet table laid out by ``hash`` so the
  probe side shuffles once on the same key and the join is local.
  On this sandbox it is small enough to **broadcast**, which removes
  the shuffle entirely; at 100 TB / millions of tracks the
  ``broadcast=False`` path keeps a bucketed sort-merge/shuffle-hash
  join with AQE skew splitting.
- Landmark hashes are Zipf-ish (common note pairs are hot keys).
  The vote aggregation is a two-phase salted aggregate: partial
  counts per (clip, track, offset, salt) then merge — Spark's
  partial aggregation handles phase 1 automatically since the group
  key includes clip_id (high cardinality); explicit salting is only
  needed for the join build side, handled by AQE skew-join.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window

from . import dsp

OFFSET_BIN_MS = 100
# Measured separation on the synthetic corpus (768 clips, 8 tracks):
# true matches: >= 1543 votes, score (votes/sec of audio) >= 468;
# noise clips: <= 28 votes, score <= 5.8. Thresholds sit roughly an
# order of magnitude inside the gap on each side.
MIN_VOTES = 200
MIN_SCORE = 50.0


def build_index(tracks: DataFrame) -> DataFrame:
    """tracks(track_id, bytes, sr_hz, codec, ...) -> (hash, track_id, t_track_ms).

    Same DSP chain as the probe side (dsp.landmarks) so hashes align.
    """
    lm = dsp.landmarks(
        tracks.withColumnRenamed("track_id", "clip_id"), id_col="clip_id"
    )
    return lm.select(
        "hash",
        F.col("clip_id").alias("track_id"),
        F.col("t_ms").alias("t_track_ms"),
    )


def write_index(index: DataFrame, path: str, buckets: int = 32) -> None:
    """Persist the index laid out by hash for join locality.

    (Iceberg `bucket(N, hash)` on a real cluster; parquet repartitioned
    by hash here — same co-location property for the shuffle join.)
    """
    index.repartition(buckets, "hash").write.mode("overwrite").parquet(path)


def match(
    landmarks: DataFrame,
    index: DataFrame,
    bin_ms: int = OFFSET_BIN_MS,
    min_votes: int = MIN_VOTES,
    min_score: float = MIN_SCORE,
    broadcast_index: bool = True,
    clip_meta: DataFrame | None = None,
) -> DataFrame:
    """Probe landmarks against the index; emit one best match per clip.

    (clip_id, matched_track, offset_ms, vote_count[, score]) where
    score = votes per second of clip audio (needs ``clip_meta`` with
    (clip_id, dur_ms); joined only against the tiny match result, so
    the landmark branch is computed exactly once — no second
    extraction pass). Noise clips fail min_votes / min_score.
    """
    idx = F.broadcast(index) if broadcast_index else index
    joined = landmarks.join(idx, "hash").select(
        "clip_id",
        "track_id",
        (
            (F.col("t_track_ms") - F.col("t_ms")) / bin_ms
        ).cast("long").alias("offset_bin"),
    )
    votes = joined.groupBy("clip_id", "track_id", "offset_bin").agg(
        F.count("*").alias("vote_count")
    )
    w = Window.partitionBy("clip_id").orderBy(
        F.desc("vote_count"), F.asc("track_id"), F.asc("offset_bin")
    )
    best = (
        votes.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
        .filter(F.col("vote_count") >= min_votes)
        .select(
            "clip_id",
            F.col("track_id").alias("matched_track"),
            (F.col("offset_bin") * bin_ms).alias("offset_ms"),
            "vote_count",
        )
    )
    if clip_meta is None:
        return best
    meta = clip_meta.select("clip_id", "dur_ms")
    return (
        best.join(meta, "clip_id")
        .withColumn("score", F.col("vote_count") / (F.col("dur_ms") / 1000.0))
        .drop("dur_ms")
        .filter(F.col("score") >= min_score)
    )


def index_arrays(index: DataFrame):
    """Collect the index into sorted numpy arrays for the fused matcher.

    Returns (sorted_hashes int64, track_codes int32, track_names list,
    t_track_ms int32). At 10^12-clip scale the index itself is still
    small (one row per track landmark); it ships to executors once as
    a Spark broadcast variable, exactly like the relational
    broadcast-hash-join build side.
    """
    import numpy as np

    pdf = index.toPandas()
    names = sorted(pdf["track_id"].unique().tolist())
    code = {t: i for i, t in enumerate(names)}
    h = pdf["hash"].to_numpy(np.int64)
    order = np.argsort(h, kind="stable")
    return (
        h[order],
        pdf["track_id"].map(code).to_numpy(np.int32)[order],
        names,
        pdf["t_track_ms"].to_numpy(np.int64)[order],
    )


def match_clips_fused(
    clips: DataFrame,
    index: DataFrame,
    bin_ms: int = OFFSET_BIN_MS,
    min_votes: int = MIN_VOTES,
    min_score: float = MIN_SCORE,
) -> DataFrame:
    """Fused per-clip matcher: decode -> landmarks -> index probe ->
    offset-histogram vote -> top-1, all inside one Arrow stage.

    The relational pipeline shuffles every joined vote row
    (~25k rows/clip); since votes are aggregated per clip and a clip's
    landmarks are computed where the clip's bytes already sit, the
    whole match is per-partition-local given a broadcast index. Zero
    shuffles, embarrassingly parallel — this is the scale path the
    N-vs-4N criterion measures. `match()` remains the general path for
    a non-broadcastable index (bucketed shuffle join).

    Parallelism comes from the SOURCE layout (Iceberg bucket(clip_id)
    partitioning / enough files): no repartition is inserted here —
    shuffling raw clip bytes through disk would serialize the job on
    shared storage. Repartition upstream only if the scan yields fewer
    partitions than cores.

    Verified equal to the relational matcher in tests/test_matching.py.
    """
    import numpy as np
    import pandas as pd

    from . import dsp

    sc = clips.sparkSession.sparkContext
    bc = sc.broadcast(index_arrays(index))

    def run(batches):
        sh, codes, names, t_track = bc.value
        n_tracks = len(names)
        # run-length view of the sorted hash index, built once per task:
        # run_mult[p] = multiplicity of the hash run starting at p. One
        # left-searchsorted then replaces the left+right pair (the left
        # insertion point of a present hash is always its run start) —
        # measured 0.35 -> 0.17 ms/clip on the probe.
        if len(sh):
            starts = np.flatnonzero(np.r_[True, sh[1:] != sh[:-1]])
            run_mult = np.zeros(len(sh), dtype=np.int64)
            run_mult[starts] = np.diff(np.r_[starts, len(sh)])
        else:
            run_mult = np.zeros(0, dtype=np.int64)
        for pdf in batches:
            out = []
            for cid, raw, sr, cname, dur in zip(
                pdf["clip_id"].tolist(), pdf["bytes"].tolist(),
                pdf["sr_hz"].tolist(), pdf["codec"].tolist(),
                pdf["dur_ms"].tolist(),
            ):
                # per-row error contract: corrupt blobs yield no match
                # row (see dsp.quarantine_clips) instead of a task kill
                h, t, _ok = dsp.extract_clip_landmarks_safe(
                    bytes(raw), cname, int(sr)
                )
                if len(h) == 0 or not len(sh):
                    continue
                lo = np.minimum(np.searchsorted(sh, h), len(sh) - 1)
                mult = np.where(sh[lo] == h, run_mult[lo], 0)
                if mult.sum() == 0:
                    continue
                cand = np.repeat(lo, mult) + _ranges_offsets(mult)
                t_anchor = np.repeat(t.astype(np.int64), mult)
                # trunc-toward-zero to match Spark's (x / bin).cast(long):
                # int floor-div, +1 on negative non-exact quotients
                d = t_track[cand] - t_anchor
                offset_bin = d // bin_ms + ((d < 0) & (d % bin_ms != 0))
                # compact vote key (track_code, offset) — lexicographic
                # order identical to the old code*2^32 + offset + 2^30
                # packing, so the min-tie-break winner is unchanged;
                # bincount over the small dense key space replaces the
                # sort inside np.unique (0.35 -> ~0.05 ms/clip)
                omin = offset_bin.min()
                shifted = offset_bin - omin
                span = int(shifted.max()) + 1
                key = codes[cand].astype(np.int64) * span + shifted
                counts = np.bincount(key)
                votes = int(counts.max())
                # deterministic tie-break: smallest (track, offset) among
                # max = first index at the max count
                winner = int(np.flatnonzero(counts == votes)[0])
                track = names[winner // span]
                off = (winner % span + int(omin)) * bin_ms
                score = votes / (int(dur) / 1000.0)
                if votes >= min_votes and score >= min_score:
                    out.append((cid, track, off, votes, score))
            yield pd.DataFrame(
                out,
                columns=[
                    "clip_id", "matched_track", "offset_ms", "vote_count", "score"
                ],
            )

    return clips.mapInPandas(
        run,
        "clip_id string, matched_track string, offset_ms long, "
        "vote_count long, score double",
    )


def _ranges_offsets(counts):
    """[3,0,2] -> [0,1,2,0,1]: per-range local offsets, vectorized."""
    import numpy as np

    total = int(counts.sum())
    out = np.arange(total, dtype=np.int64)
    starts = np.repeat(np.cumsum(counts) - counts, counts)
    return out - starts


def match_pipeline(
    clips: DataFrame,
    index: DataFrame,
    bin_ms: int = OFFSET_BIN_MS,
    min_votes: int = MIN_VOTES,
    min_score: float = MIN_SCORE,
    broadcast_index: bool = True,
) -> DataFrame:
    """clips -> landmarks -> match rows (one stage chain, single shuffle
    at the vote aggregation when the index is broadcast)."""
    return match(
        dsp.landmarks(clips),
        index,
        bin_ms=bin_ms,
        min_votes=min_votes,
        min_score=min_score,
        broadcast_index=broadcast_index,
        clip_meta=clips,
    )


# ------------------------------------------------- audio near-duplicates


def near_dup_audio_pairs(
    clips: DataFrame,
    min_jaccard: float = 0.2,
    max_hash_df: int = 64,
    id_col: str = "clip_id",
) -> DataFrame:
    """Fingerprint-based audio near-duplicate pairs.

    A training-data pipeline over 10^12 clips must drop re-encodes of
    the same recording (other codec, other sample rate, re-compressed)
    before they skew the corpus. Landmark hashes are exactly the right
    invariant: decode -> resample-to-SR_REF -> constellation hashes
    survive G.711/ADPCM recompression and rate conversion, so two
    encodings of one recording share most of their hash sets while
    distinct recordings share almost none (Wang 2003's robustness
    property, reused for dedup instead of lookup).

    Plan (all relational, shuffle-bounded):
      landmarks -> distinct (clip, hash)
        -> drop hub hashes with document frequency > ``max_hash_df``
           (a hash shared by many clips carries no pair information
           but would quadratically inflate the self-join — the
           standard posting-list cap; at 10^12 clips this cap is what
           keeps the join linear in corpus size)
        -> self-join on hash (co-partitioned by the join key)
        -> per-pair shared-hash count
        -> Jaccard vs each clip's distinct-hash count, threshold.

    Returns (clip_a, clip_b, shared, jaccard), clip_a < clip_b.
    Reference parity anchor: the same landmark chain the reference
    builds its lookup index from (src/flink_job/job.py:63-75) — dedup
    is the index join turned on the corpus itself.
    """
    lm = dsp.landmarks(clips, id_col=id_col)
    h = lm.select(F.col(id_col).alias("cid"), "hash").distinct()
    rare = h.groupBy("hash").agg(F.count("*").alias("df")).where(
        F.col("df") <= max_hash_df
    )
    h = h.join(rare.select("hash"), "hash")
    sizes = h.groupBy("cid").agg(F.count("*").alias("n_hashes"))
    a, b = h.alias("a"), h.alias("b")
    pairs = (
        a.join(b, "hash")
        .where(F.col("a.cid") < F.col("b.cid"))
        .groupBy(
            F.col("a.cid").alias("clip_a"), F.col("b.cid").alias("clip_b")
        )
        .agg(F.count("*").alias("shared"))
    )
    out = (
        pairs.join(
            sizes.select(
                F.col("cid").alias("clip_a"), F.col("n_hashes").alias("n_a")
            ),
            "clip_a",
        )
        .join(
            sizes.select(
                F.col("cid").alias("clip_b"), F.col("n_hashes").alias("n_b")
            ),
            "clip_b",
        )
        .withColumn(
            "jaccard",
            F.col("shared")
            / (F.col("n_a") + F.col("n_b") - F.col("shared")),
        )
        .where(F.col("jaccard") >= min_jaccard)
    )
    return out.select("clip_a", "clip_b", "shared", F.round("jaccard", 6).alias("jaccard"))


def clip_signatures(
    clips: DataFrame, id_col: str = "clip_id", n_hashes: int = 16
) -> DataFrame:
    """(clip_id, event_ms, sig) — MinHash signature over each clip's
    distinct landmark-hash set, computed INSIDE the same Arrow pass as
    landmark extraction (decode -> resample -> STFT -> hashes ->
    minhash per row). No shuffle and no stateful aggregation, so the
    stage is streaming-safe and embarrassingly parallel — the property
    the banded suppressor needs upstream of its keyed state.

    Hash scheme is the same contract as the text MinHash
    (sparkfp/dedup.py minhash_signature_udf): md5 hex of
    ``"{i}:{value}"``, lexicographic min, with the landmark hash's
    decimal string as the value — so dedup.lsh_bands consumes the
    signature unchanged. Clips with zero landmarks are dropped (an
    empty fingerprint cannot claim a band).
    """
    import hashlib
    from collections.abc import Iterator

    out_schema = T.StructType(
        [
            T.StructField("clip_id", T.StringType(), False),
            T.StructField("event_ms", T.LongType(), False),
            T.StructField("sig", T.ArrayType(T.StringType()), False),
        ]
    )
    cols = [id_col, "bytes", "sr_hz", "codec", "event_ms"]

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for cid, raw, sr, cname, ev in zip(
                pdf[id_col], pdf["bytes"], pdf["sr_hz"], pdf["codec"],
                pdf["event_ms"],
            ):
                h, _, _ok = dsp.extract_clip_landmarks_safe(
                    bytes(raw), cname, int(sr)
                )
                if len(h) == 0:
                    continue
                mins: list[str | None] = [None] * n_hashes
                for v in set(h.tolist()):
                    for i in range(n_hashes):
                        d = hashlib.md5(f"{i}:{v}".encode()).hexdigest()
                        if mins[i] is None or d < mins[i]:
                            mins[i] = d
                out.append((cid, int(ev), mins))
            if not out:
                yield pd.DataFrame(
                    {
                        "clip_id": pd.Series([], dtype=object),
                        "event_ms": pd.Series([], dtype="int64"),
                        "sig": pd.Series([], dtype=object),
                    }
                )
                continue
            yield pd.DataFrame(out, columns=["clip_id", "event_ms", "sig"])

    return clips.select(*cols).mapInPandas(extract, out_schema)


def banded_clips(
    clips: DataFrame,
    id_col: str = "clip_id",
    n_hashes: int = 16,
    n_bands: int = 4,
) -> DataFrame:
    """(clip_id, event_ms, band_idx, band): the audio bander for the
    generic near-dup suppressors (dedup.suppress_from_banded and the
    streaming band-claim state op). dedup.lsh_bands runs over the
    ALREADY-materialized signature column (the Python eval node is a
    plan barrier), the same plan shape the text path uses to stay in
    whole-stage codegen through the posexplode."""
    from . import dedup

    sig = clip_signatures(clips, id_col, n_hashes)
    return sig.select(
        F.col("clip_id").alias(id_col),
        "event_ms",
        F.posexplode(
            dedup.lsh_bands(F.col("sig"), n_bands, n_hashes // n_bands)
        ).alias("band_idx", "band"),
    )


def near_dup_clips_batch(
    clips: DataFrame,
    id_col: str = "clip_id",
    n_hashes: int = 16,
    n_bands: int = 4,
) -> DataFrame:
    """Greedy first-wins audio near-dup filter, batch form: a clip
    survives iff it is the earliest (event_ms, id tiebreak) on every
    one of its landmark-minhash LSH bands. Re-encodes and resampled
    copies of a recording land on the same bands (their landmark sets
    nearly coincide), so only the first-seen copy survives."""
    from . import dedup

    banded = banded_clips(clips, id_col, n_hashes, n_bands)
    return dedup.suppress_from_banded(clips, banded, id_col, "event_ms")


def near_dup_clips_stream(
    stream: DataFrame,
    id_col: str = "clip_id",
    watermark: str = "10 seconds",
    n_hashes: int = 16,
    n_bands: int = 4,
    claims: DataFrame | None = None,
) -> DataFrame:
    """Streaming twin of near_dup_clips_batch: the audio bander plugged
    into the generic band-claim stateful suppressor (watermark-ordered
    release, strict t < wm, epoch claims compaction — see
    dedup.near_dup_band_verdicts_stream). Collapse per-clip with
    dedup.collapse_band_verdicts(..., n_bands)."""
    from . import dedup

    return dedup.near_dup_band_verdicts_stream(
        stream, id_col, None, "event_ms",
        watermark=watermark, n_hashes=n_hashes, n_bands=n_bands,
        claims=claims,
        bander=lambda s: banded_clips(s, id_col, n_hashes, n_bands),
    )
