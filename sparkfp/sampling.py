"""Deterministic sampling operators for training-data pipelines.

Real corpus construction needs reproducible subsampling — downsample
an over-represented domain/language, cap documents per source, draw a
fixed-size eval split — and it must give the SAME sample on every
rerun, on any cluster size, with no coordination. The standard
`df.sample()` is seed-stable only per partition layout, which a
repartition or AQE re-plan silently changes; these operators instead
derive each row's fate from a cryptographic hash of its OWN id, so
membership is a pure function of (id, seed):

- :func:`hash_sample` — Bernoulli(p) via md5(seed:id) < p * 2^128.
  A pure filter: no shuffle, pushes below everything, linear scan at
  any scale, and any SQL engine reproduces it bit-for-bit.
- :func:`reservoir_per_key` — exactly-k-per-stratum via the k
  smallest md5 priorities per key: one shuffle on the strata key,
  partial top-k map-side. The distributed analog of a per-key
  reservoir sample (uniform without replacement) with a deterministic
  priority stream instead of RNG state.

Reference anchor: the reference has no sampling stage (its pandas
scripts slice head(n) — src/postprocess/llm_data_prep.py-style ad hoc
cuts); these are the scale-correct replacements.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

# md5 hex is 128 bits; compare on the first 15 hex chars (60 bits) so
# the threshold fits errorlessly in a BIGINT/double in every engine.
_PRIO_HEX_CHARS = 15
_PRIO_SPACE = 16 ** _PRIO_HEX_CHARS


def sample_priority(id_col: str | Column, seed: int) -> Column:
    """Deterministic per-row priority in [0, 16^15): the first 15 hex
    chars of md5("seed:id") as a BIGINT. Uniform, reproducible in any
    engine with md5 (DuckDB oracle: identical expression)."""
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    return F.conv(
        F.substring(F.md5(F.concat_ws(":", F.lit(str(seed)), c.cast("string"))), 1,
                    _PRIO_HEX_CHARS),
        16, 10,
    ).cast("long")


def hash_sample(
    df: DataFrame, id_col: str, fraction: float, seed: int = 42
) -> DataFrame:
    """Deterministic Bernoulli(fraction) sample: keep rows whose hash
    priority falls below fraction of the priority space.

    Scale: a pure Column filter — no shuffle, no state, independent of
    partitioning, so the SAME rows survive on 1 core or 1000 executors
    and on every rerun. E[|sample|] = fraction * n with ~binomial
    deviation; use :func:`reservoir_per_key` for exact counts.
    """
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction!r}")
    threshold = int(fraction * _PRIO_SPACE)
    return df.filter(sample_priority(id_col, seed) < F.lit(threshold))


def reservoir_per_key(
    df: DataFrame,
    key_cols: list[str],
    id_col: str,
    k: int,
    seed: int = 42,
) -> DataFrame:
    """Exactly min(k, |stratum|) rows per stratum, uniform without
    replacement: rank rows within each key by hash priority (id
    tiebreak for the measure-zero collision case) and keep the top k.

    Scale: one shuffle on the strata key; the window's rank is
    computed after a partial sort per partition, and with Zipf strata
    the hot key's sort is O(n log n) in its own partition — for
    planet-hot strata, pre-filter with :func:`hash_sample` at a safe
    oversampling fraction first, then exact-cut here.
    """
    if k < 0:
        raise ValueError(f"k must be >= 0, got {k!r}")
    w = Window.partitionBy(*key_cols).orderBy(
        sample_priority(id_col, seed).asc(), F.col(id_col).asc()
    )
    rn = "_prio_rn"
    while rn in df.columns:  # never clobber a caller column
        rn += "_"
    return (
        df.withColumn(rn, F.row_number().over(w))
        .filter(F.col(rn) <= k)
        .drop(rn)
    )
