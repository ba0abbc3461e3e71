"""Similarity search over embedding columns.

- brute-force cosine top-k (exact baseline; one broadcast of the
  query set, no shuffle on the corpus side)
- random-hyperplane LSH bucketing (the scale path: candidates only
  from matching signature buckets, then exact re-rank)

The hyperplanes are deterministic (seeded numpy), shipped as literal
arrays into the plan, so results are reproducible across runs and
cluster sizes.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .dedup import cosine


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    query_id_col: str | None = None,
    k: int = 5,
) -> DataFrame:
    """Exact top-k neighbors per query by cosine.

    Plan shape: broadcast(queries) x corpus scan -> cosine (JVM
    higher-order fns) -> per-query row_number top-k. The corpus is
    scanned once with no shuffle; only the (n_queries x k) result
    shuffles. Ties break on neighbor id for determinism.
    """
    query_id_col = query_id_col or id_col
    q = queries.select(
        F.col(query_id_col).alias("query_id"), F.col(vec_col).alias("qv")
    )
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"))
    scored = (
        c.join(F.broadcast(q), F.col("neighbor_id") != F.col("query_id"))
        .withColumn("cos", F.round(cosine(F.col("qv"), F.col("cv")), 6))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos", "rank")
    )


def hyperplanes(dim: int, n_planes: int = 16, seed: int = 42) -> np.ndarray:
    rng = np.random.Generator(np.random.Philox(key=[np.uint64(seed), np.uint64(dim)]))
    return rng.standard_normal((n_planes, dim)).astype(np.float64)


def lsh_signature(vec_col: Column, planes: np.ndarray) -> Column:
    """Sign-bit signature: bit p set where dot(vec, plane_p) > 0."""
    sig = F.lit(0).cast("long")
    for p, plane in enumerate(planes):
        lits = F.array(*[F.lit(float(x)) for x in plane])
        dot = F.aggregate(
            F.zip_with(vec_col, lits, lambda x, y: x.cast("double") * y),
            F.lit(0.0),
            lambda s, x: s + x,
        )
        sig = sig + F.when(dot > 0, F.lit(2**p)).otherwise(F.lit(0))
    return sig


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    dim: int,
    k: int = 5,
    n_planes: int = 12,
    n_tables: int = 3,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: candidates share an LSH signature in >= 1 of
    n_tables hash tables; exact cosine re-ranks candidates only.

    At corpus scale N, expected candidates per query ~ N / 2^n_planes
    per table — the knob that makes ANN tractable at 10^12 rows.
    """
    tables = [hyperplanes(dim, n_planes, seed + t) for t in range(n_tables)]
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"))
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"))
    for t, planes in enumerate(tables):
        c = c.withColumn(f"sig{t}", lsh_signature(F.col("cv"), planes))
        q = q.withColumn(f"sig{t}", lsh_signature(F.col("qv"), planes))
    cond = None
    for t in range(n_tables):
        eq = F.col(f"c.sig{t}") == F.col(f"q.sig{t}")
        cond = eq if cond is None else (cond | eq)
    cand = c.alias("c").join(F.broadcast(q.alias("q")), cond & (
        F.col("c.neighbor_id") != F.col("q.query_id")
    ))
    scored = cand.withColumn("cos", F.round(cosine(F.col("q.qv"), F.col("c.cv")), 6))
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos", "rank")
    )
