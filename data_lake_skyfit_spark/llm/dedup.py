"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard,
embedding-cosine — the training-data pipeline's dedup toolbox
(SURVEY.md §7.5 north-star extension).

Scale design (100 TB):
- exact dedup shuffles an 8-byte xxhash64 fingerprint, not documents;
- MinHash-LSH is the scale path for near-dup: candidates come from
  band-bucket equi-joins (shuffle ∝ n·bands), never an n² cross join;
- the brute-force Jaccard pairer exists as the small-data oracle of
  record and for verification joins;
- everything is built-in higher-order functions / joins — no Python UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import fingerprint64
from .text import shingles_expr, tokens_expr

__all__ = [
    "exact_duplicates",
    "exact_dedup",
    "jaccard_pairs_bruteforce",
    "minhash_signature_expr",
    "minhash_lsh_pairs",
    "simhash_bits",
    "embedding_cosine_pairs",
]


# ---------------------------------------------------------------------------
# Exact dedup
# ---------------------------------------------------------------------------


def exact_duplicates(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Groups of byte-identical documents: (content_hash, canonical_id,
    n_copies). Only the fingerprint and id shuffle."""
    return (
        df.select(F.col(id_col), fingerprint64(text_col).alias("content_hash"))
        .groupBy("content_hash")
        .agg(F.min(id_col).alias("canonical_id"), F.count(F.lit(1)).alias("n_copies"))
    )


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep one row per distinct content (lowest id wins)."""
    keep = (
        df.select(F.col(id_col).alias("__id"), fingerprint64(text_col).alias("__h"))
        .groupBy("__h")
        .agg(F.min("__id").alias(id_col))
        .drop("__h")
    )
    return df.join(keep, id_col, "left_semi")


# ---------------------------------------------------------------------------
# n-gram Jaccard (brute force — the correctness oracle / verifier)
# ---------------------------------------------------------------------------


def _with_shingles(df: DataFrame, text_col: str, id_col: str, n: int) -> DataFrame:
    return df.select(F.col(id_col).alias("id"), shingles_expr(text_col, n).alias("sh"))


def _jaccard(a: Column, b: Column) -> Column:
    inter = F.size(F.array_intersect(a, b))
    union = F.size(F.array_union(a, b))
    return inter / union


def jaccard_pairs_bruteforce(
    df: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.8,
) -> DataFrame:
    """All-pairs n-gram-set Jaccard ≥ threshold. O(n²) — use only at
    test scale or as the verification join; the scale path is
    minhash_lsh_pairs."""
    s = _with_shingles(df, text_col, id_col, n)
    a = s.alias("a")
    b = s.alias("b")
    j = _jaccard(F.col("a.sh"), F.col("b.sh"))
    return (
        a.join(b, F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("a_id"),
            F.col("b.id").alias("b_id"),
            F.round(j, 4).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


# ---------------------------------------------------------------------------
# MinHash + LSH (the scale path)
# ---------------------------------------------------------------------------


def minhash_signature_expr(shingles: Column, num_perm: int = 128) -> Column:
    """num_perm-wide MinHash signature: sig[i] = min over shingles of
    xxhash64(i, shingle). Deterministic, JVM-native, no Python."""
    return F.transform(
        F.sequence(F.lit(0), F.lit(num_perm - 1)),
        lambda i: F.array_min(F.transform(shingles, lambda s: F.xxhash64(i, s))),
    )


def minhash_lsh_pairs(
    df: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    num_perm: int = 128,
    bands: int = 32,
    threshold: float = 0.8,
) -> DataFrame:
    """Near-duplicate pairs via MinHash banding.

    Pipeline: shingle → signature → split into `bands` bands of
    num_perm/bands rows → hash each band → equi-join docs sharing a
    (band, hash) bucket → verify candidates with exact Jaccard ≥
    threshold. Candidate generation is a shuffle on band hashes
    (linear in corpus size); only candidate pairs — a vanishing
    fraction at scale — pay the exact-verification cost.
    """
    rows = num_perm // bands
    s = _with_shingles(df, text_col, id_col, n).filter(F.size("sh") > 0)
    sig = s.select("id", "sh", minhash_signature_expr(F.col("sh"), num_perm).alias("sig"))

    band_entries = sig.select(
        "id",
        "sh",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.struct(
                    b.alias("band"),
                    F.xxhash64(b, F.slice("sig", b * rows + 1, rows)).alias("bucket"),
                ),
            )
        ).alias("bb"),
    ).select("id", "sh", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))

    a = band_entries.alias("a")
    b = band_entries.alias("b")
    candidates = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("a_id"),
            F.col("b.id").alias("b_id"),
            F.col("a.sh").alias("a_sh"),
            F.col("b.sh").alias("b_sh"),
        )
        .dropDuplicates(["a_id", "b_id"])
    )

    j = _jaccard(F.col("a_sh"), F.col("b_sh"))
    return (
        candidates.select("a_id", "b_id", F.round(j, 4).alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


def simhash_bits(
    df: DataFrame, *, text_col: str = "text", id_col: str = "doc_id", nbits: int = 64
) -> DataFrame:
    """64-bit SimHash as a bitstring column (doc_id, simhash).

    Token bit source: hex-digit parity of md5(token) ++ md5(token||'#')
    (64 hex chars → 64 bits) — chosen because it is reproducible in any
    engine with md5/substring (the DuckDB oracle uses the same
    construction), unlike engine-private hash functions. Weight = token
    multiplicity. bit_j = 1 iff Σ weight·(2·parity−1) ≥ 0.
    """
    toks = (
        df.select(F.col(id_col).alias("id"), F.explode(tokens_expr(text_col)).alias("tok"))
        .groupBy("id", "tok")
        .agg(F.count(F.lit(1)).alias("w"))
    )
    h = F.concat(F.md5(F.col("tok")), F.md5(F.concat(F.col("tok"), F.lit("#"))))
    per_pos = toks.select(
        "id",
        "w",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(1), F.lit(nbits)),
                lambda j: (F.instr(F.lit("0123456789abcdef"), F.substring(h, j, 1)) - 1) % 2,
            )
        ).alias("pos", "parity"),
    )
    sums = per_pos.groupBy("id", "pos").agg(
        F.sum(F.col("w") * (F.col("parity") * 2 - 1)).alias("s")
    )
    bits = sums.select(
        "id",
        "pos",
        F.when(F.col("s") >= 0, F.lit("1")).otherwise(F.lit("0")).alias("bit"),
    )
    return bits.groupBy("id").agg(
        F.concat_ws(
            "",
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "bit"))), lambda x: x.getField("bit")
            ),
        ).alias("simhash")
    ).withColumnRenamed("id", id_col)


# ---------------------------------------------------------------------------
# Embedding-cosine near-dup
# ---------------------------------------------------------------------------


def _as_double(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.transform(c, lambda x: x.cast("double"))


def dot_expr(a: Column, b: Column) -> Column:
    """Sequential-fold dot product over double arrays (JVM-side)."""
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v)


def norm_expr(a: Column) -> Column:
    return F.sqrt(dot_expr(a, a))


def embedding_cosine_pairs(
    df: DataFrame,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.9,
) -> DataFrame:
    """All-pairs cosine ≥ threshold over an embedding column. Norms are
    precomputed once per vector; the pairing is a cross join — suitable
    for verification scale. The ANN path (similarity.lsh_topk) is the
    scale variant."""
    v = df.select(
        F.col(id_col).alias("id"), _as_double(vec_col).alias("e")
    ).withColumn("nrm", norm_expr(F.col("e")))
    a, b = v.alias("a"), v.alias("b")
    cos = dot_expr(F.col("a.e"), F.col("b.e")) / (F.col("a.nrm") * F.col("b.nrm"))
    return (
        a.join(b, F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("a_id"),
            F.col("b.id").alias("b_id"),
            F.round(cos, 4).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )
