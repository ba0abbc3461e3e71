"""Deduplication operators for large-scale training-data pipelines.

Exact (hash-groupBy), MinHash + LSH banding, SimHash, n-gram Jaccard,
and embedding-cosine near-dup. All hashing is md5-based so an external
SQL oracle (DuckDB) can reproduce every intermediate bit-for-bit —
no engine-specific hash functions on the result path.

Scale design:
- exact dedup: one shuffle on the content hash; at 100 TB this is a
  groupBy over a ~64-char key — AQE coalesces the post-shuffle
  partitions.
- MinHash-LSH: signatures are computed scan-side (no shuffle), the
  only shuffle is the band-bucket self-join; band buckets with a
  single doc never materialize a pair. Candidate verification
  (true Jaccard) touches only candidate pairs, not the n^2 space.
- SimHash: bit-vote aggregation is a single groupBy over doc_id
  (map-side combinable); near-dup candidates join on 8-bit chunks
  (pigeonhole: hamming<=3 over 32 bits implies one equal chunk).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# ---------------------------------------------------------------- exact


def content_hash(*cols: str) -> Column:
    return F.md5(F.concat_ws("\x1f", *[F.col(c) for c in cols]))


def exact_duplicate_groups(df: DataFrame, id_col: str, *content_cols: str) -> DataFrame:
    """Groups of byte-identical rows: (content_hash, n_dups, keeper_id).

    keeper = min id; rows with n_dups == 1 are unique."""
    return (
        df.withColumn("content_hash", content_hash(*content_cols))
        .groupBy("content_hash")
        .agg(
            F.count("*").alias("n_dups"),
            F.min(id_col).alias("keeper_id"),
        )
    )


def exact_dedup(df: DataFrame, id_col: str, *content_cols: str) -> DataFrame:
    """Keep one row (min id) per distinct content."""
    groups = exact_duplicate_groups(df, id_col, *content_cols).select(
        F.col("keeper_id").alias(id_col)
    )
    return df.join(groups, id_col, "left_semi")


# ---------------------------------------------------------------- tokens / shingles


def tokens_col(text: str | Column) -> Column:
    c = F.col(text) if isinstance(text, str) else text
    return F.split(F.trim(c), r"\s+")


def shingles_col(text: str | Column, k: int = 3) -> Column:
    """Word k-gram shingles (array<string>, may repeat)."""
    toks = tokens_col(text)
    n = F.size(toks)
    idx = F.sequence(F.lit(1), F.greatest(n - (k - 1), F.lit(1)))
    return F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i, k)))


# ---------------------------------------------------------------- MinHash + LSH


def minhash_signature(text: str | Column, n_hashes: int = 16, k: int = 3) -> Column:
    """Array of n md5-min hex strings over the shingle set.

    minhash_i = min over shingles of md5(i || ':' || shingle); min is
    lexicographic on the hex string, which any SQL engine reproduces.
    """
    sh = shingles_col(text, k)

    # NB: the transform lambda must be single-arg — a two-arg lambda is
    # interpreted by Spark as (element, index).
    def min_hash(i: int) -> Column:
        prefix = str(i)
        return F.array_min(
            F.transform(sh, lambda s: F.md5(F.concat_ws(":", F.lit(prefix), s)))
        )

    return F.array(*[min_hash(i) for i in range(n_hashes)])


def lsh_bands(sig: Column, n_bands: int = 4, rows_per_band: int = 4) -> Column:
    """Band keys: md5 of the concatenated signature slice per band."""
    return F.array(
        *[
            F.md5(
                F.concat_ws(
                    "|", *[F.element_at(sig, b * rows_per_band + r + 1) for r in range(rows_per_band)]
                )
            )
            for b in range(n_bands)
        ]
    )


def minhash_lsh_candidates(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n_hashes: int = 16,
    n_bands: int = 4,
    k: int = 3,
) -> DataFrame:
    """Candidate near-dup pairs (id_a < id_b) sharing >= 1 LSH band."""
    rows_per_band = n_hashes // n_bands
    sig = minhash_signature(text_col, n_hashes, k)
    banded = df.select(
        F.col(id_col),
        F.posexplode(lsh_bands(sig, n_bands, rows_per_band)).alias("band_idx", "band"),
    )
    a, b = banded.alias("a"), banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band") == F.col("b.band"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b")
        )
        .distinct()
    )


# ---------------------------------------------------------------- n-gram Jaccard


def jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float = 0.5,
    k: int = 1,
    candidates: DataFrame | None = None,
) -> DataFrame:
    """Pairs with token/shingle-set Jaccard >= threshold.

    With `candidates` (e.g. from minhash_lsh_candidates) only those
    pairs are verified; otherwise the token-overlap self-join prunes
    the n^2 space to pairs sharing at least one shingle.
    """
    sets = df.select(
        F.col(id_col).alias("id"),
        F.explode(F.array_distinct(shingles_col(text_col, k))).alias("tok"),
    )
    sizes = sets.groupBy("id").agg(F.count("*").alias("n"))
    a, b = sets.alias("a"), sets.alias("b")
    shared = (
        a.join(b, (F.col("a.tok") == F.col("b.tok")) & (F.col("a.id") < F.col("b.id")))
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count("*").alias("shared"))
    )
    if candidates is not None:
        shared = shared.join(candidates, ["id_a", "id_b"], "left_semi")
    na = sizes.select(F.col("id").alias("id_a"), F.col("n").alias("n_a"))
    nb = sizes.select(F.col("id").alias("id_b"), F.col("n").alias("n_b"))
    return (
        shared.join(na, "id_a")
        .join(nb, "id_b")
        .withColumn(
            "jaccard",
            F.col("shared") / (F.col("n_a") + F.col("n_b") - F.col("shared")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "shared", "jaccard")
    )


# ---------------------------------------------------------------- SimHash


def _hex_to_long(hexcol: Column) -> Column:
    return F.conv(hexcol, 16, 10).cast("long")


def simhash(df: DataFrame, id_col: str, text_col: str, bits: int = 32) -> DataFrame:
    """Per-doc SimHash: each distinct token votes its md5-derived bits.

    token value = first 8 hex chars of md5 (32 bits); bit b adds +1 or
    -1; the fingerprint sets bit b where the vote is positive. Fully
    reproducible in ANSI SQL (md5 + hex->int + bit arithmetic).
    """
    toks = df.select(
        F.col(id_col),
        F.explode(F.array_distinct(tokens_col(text_col))).alias("tok"),
    ).withColumn("h", _hex_to_long(F.substring(F.md5("tok"), 1, 8)))
    votes = toks.groupBy(id_col).agg(
        *[
            F.sum(
                F.when(F.shiftright(F.col("h"), b).bitwiseAND(1) == 1, 1).otherwise(-1)
            ).alias(f"v{b}")
            for b in range(bits)
        ]
    )
    fp = None
    for b in range(bits):
        term = F.when(F.col(f"v{b}") > 0, F.lit(2**b)).otherwise(F.lit(0))
        fp = term if fp is None else fp + term
    return votes.select(F.col(id_col), fp.cast("long").alias("simhash"))


def simhash_near_pairs(
    sims: DataFrame, id_col: str, max_hamming: int = 3, bits: int = 32
) -> DataFrame:
    """Near-dup pairs by Hamming distance, chunk-join pruned
    (hamming <= 3 over 4 chunks -> some chunk equal, pigeonhole)."""
    n_chunks = 4
    chunk_bits = bits // n_chunks
    chunks = sims.select(
        F.col(id_col).alias("id"),
        F.col("simhash"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("c"),
                        F.shiftright(F.col("simhash"), c * chunk_bits)
                        .bitwiseAND((1 << chunk_bits) - 1)
                        .alias("v"),
                    )
                    for c in range(n_chunks)
                ]
            )
        ).alias("ch"),
    ).select("id", "simhash", F.col("ch.c").alias("c"), F.col("ch.v").alias("v"))
    a, b = chunks.alias("a"), chunks.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.c") == F.col("b.c"))
            & (F.col("a.v") == F.col("b.v"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.simhash").alias("sh_a"),
            F.col("b.simhash").alias("sh_b"),
        )
        .distinct()
    )
    ham = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return (
        cand.withColumn("hamming", ham)
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


# ---------------------------------------------------------------- embeddings


def cosine(a: Column, b: Column) -> Column:
    """Exact cosine over two array<float/double> columns, JVM-side
    (zip_with + aggregate higher-order functions — no UDF)."""
    da = F.transform(a, lambda x: x.cast("double"))
    db = F.transform(b, lambda x: x.cast("double"))
    dot = F.aggregate(F.zip_with(da, db, lambda x, y: x * y), F.lit(0.0), lambda s, x: s + x)
    na = F.sqrt(F.aggregate(da, F.lit(0.0), lambda s, x: s + x * x))
    nb = F.sqrt(F.aggregate(db, F.lit(0.0), lambda s, x: s + x * x))
    return dot / (na * nb)


def embedding_near_pairs(
    df: DataFrame, id_col: str, vec_col: str, threshold: float = 0.95
) -> DataFrame:
    """Embedding-cosine near-dup pairs (brute force; LSH-bucketed
    variant in sparkfp.similarity for the scale path)."""
    a = df.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
    b = df.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .withColumn("cos", cosine(F.col("va"), F.col("vb")))
        .filter(F.col("cos") >= threshold)
        .select("id_a", "id_b", F.round("cos", 6).alias("cos"))
    )
