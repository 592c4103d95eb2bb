"""Deduplication operators for the documents pipeline.

Five dedup families, each a first-class operator designed for 100 TB:

- exact: hash-groupBy on the content (or its md5 fingerprint) — one
  shuffle on the fingerprint, min-id wins (deterministic).
- n-gram Jaccard: banded pairwise shingle-set similarity — exact
  similarity inside candidate bands; quadratic only within a band.
- MinHash + LSH: shingle → k minhashes → b bands of r rows →
  bucket-join candidates → verify with exact Jaccard. The scale path:
  cost is ~(docs × k) hashing + a shuffle per band union, never a
  cross join.
- SimHash: 64-bit weighted token-hash signature; candidates share at
  least one of four 16-bit chunks (pigeonhole: hamming distance ≤ 3
  guarantees a shared chunk), verified by exact hamming distance.
- embedding cosine: near-dup by vector similarity (see similarity.py
  for the kernel).

Hashing uses Spark's ``xxhash64`` with per-permutation seed mixing —
deterministic across runs/partitionings, JVM-side, no Python UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from pypgsync_spark.functions.text import content_fingerprint, tokens, word_shingles

# Large Mersenne prime for minhash universe; xxhash64 output is mixed
# per-permutation with distinct literal seeds.
_MERSENNE_61 = (1 << 61) - 1


def dedup_exact(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", normalized: bool = True
) -> DataFrame:
    """Keep one row per distinct content: the row with the minimum id
    (deterministic, oracle-friendly — ``dropDuplicates`` would keep an
    arbitrary row). Shuffles once on the fingerprint, not the full text."""
    fp = content_fingerprint(F.col(text_col)) if normalized else F.md5(F.col(text_col))
    w = Window.partitionBy(fp).orderBy(F.col(id_col))
    return (
        df.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") == 1).drop("__rn")
    )


def with_shingles(
    df: DataFrame, text_col: str = "text", n: int = 3, out: str = "shingles"
) -> DataFrame:
    return df.withColumn(out, word_shingles(tokens(F.col(text_col)), n))


def jaccard(a: Column, b: Column) -> Column:
    """Exact Jaccard similarity of two distinct-element arrays."""
    inter = F.size(F.array_intersect(a, b))
    union = F.size(F.array_union(a, b))
    return inter / F.greatest(union, F.lit(1))


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.3,
    band_width: int | None = 50,
) -> DataFrame:
    """Pairs (id_a < id_b, jaccard) above ``threshold``.

    ``band_width`` bounds the candidate pairs to ids within a window of
    each other — the sf-fixture stand-in for a real blocking key
    (at 100 TB use :func:`minhash_lsh_pairs`, which needs no such
    assumption). ``band_width=None`` does the full cross product.
    """
    s = with_shingles(df.select(id_col, text_col), text_col, n)
    a = s.select(F.col(id_col).alias("id_a"), F.col("shingles").alias("sh_a"))
    b = s.select(F.col(id_col).alias("id_b"), F.col("shingles").alias("sh_b"))
    cond = F.col("id_a") < F.col("id_b")
    if band_width is not None:
        cond = cond & (F.col("id_b") <= F.col("id_a") + band_width)
    return (
        a.join(b, cond)
        .withColumn("jaccard", F.round(jaccard(F.col("sh_a"), F.col("sh_b")), 6))
        .filter(F.col("jaccard") > threshold)
        .select("id_a", "id_b", "jaccard")
    )


def minhash_signature(shingles: Column, num_perm: int) -> Column:
    """Array of ``num_perm`` minhash values of a distinct-shingle array.

    Permutation i = min over shingles of
    ``pmod(xxhash64(concat(seed_i, shingle)), 2^61-1)``. All JVM-side
    expression work; cost is O(|shingles| * num_perm) per doc with no
    shuffle.
    """
    return F.array(
        *[
            F.array_min(
                F.transform(
                    shingles,
                    lambda s, i=i: F.pmod(
                        F.xxhash64(F.concat(F.lit(f"perm{i}:"), s)), F.lit(_MERSENNE_61)
                    ),
                )
            )
            for i in range(num_perm)
        ]
    )


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_perm: int = 64,
    bands: int = 16,
    threshold: float = 0.3,
) -> DataFrame:
    """MinHash-LSH near-dup pairs, verified with exact Jaccard.

    Pipeline: shingle → signature(num_perm) → for each of ``bands``
    bands hash the band's rows into a bucket key → union band tables →
    self-join on (band, bucket) → distinct candidate pairs → exact
    Jaccard filter. With num_perm=64, bands=16 (r=4), the S-curve
    midpoint sits near j≈(1/16)^(1/4)≈0.5; candidates well below
    threshold are discarded by the exact check.

    Scale: every stage is a narrow map except the bucket self-join,
    which shuffles on (band, bucket) — skew-safe because identical
    buckets are near-dup groups, bounded by AQE skew splitting.
    """
    if num_perm % bands != 0:
        raise ValueError(f"bands ({bands}) must divide num_perm ({num_perm})")
    r = num_perm // bands
    s = with_shingles(df.select(id_col, text_col), text_col, n)
    sig = s.select(
        F.col(id_col).alias("id"),
        F.col("shingles"),
        minhash_signature(F.col("shingles"), num_perm).alias("sig"),
    )
    # band key rows: (band, bucket_hash, id) — one pass, explode-free
    band_cols = [
        F.struct(
            F.lit(bi).alias("band"),
            F.xxhash64(F.concat_ws(",", *[F.element_at(F.col("sig"), bi * r + j + 1).cast("string") for j in range(r)])).alias("bucket"),
        )
        for bi in range(bands)
    ]
    buckets = sig.select("id", "shingles", F.explode(F.array(*band_cols)).alias("bk")).select(
        "id", "shingles", F.col("bk.band").alias("band"), F.col("bk.bucket").alias("bucket")
    )
    left = buckets.select(
        F.col("band"), F.col("bucket"), F.col("id").alias("id_a"), F.col("shingles").alias("sh_a")
    )
    right = buckets.select(
        F.col("band"), F.col("bucket"), F.col("id").alias("id_b"), F.col("shingles").alias("sh_b")
    )
    cand = (
        left.join(right, on=["band", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "sh_a", "sh_b")
        .dropDuplicates(["id_a", "id_b"])
    )
    return (
        cand.withColumn("jaccard", F.round(jaccard(F.col("sh_a"), F.col("sh_b")), 6))
        .filter(F.col("jaccard") > threshold)
        .select("id_a", "id_b", "jaccard")
    )


def simhash64(toks: Column) -> Column:
    """64-bit SimHash of a token array.

    For each bit position j, sum +1/-1 votes of each distinct token's
    xxhash64 bit j; bit j of the result is 1 iff the vote is positive.
    Expressed as a single aggregate expression over the token array —
    no explode, no shuffle.
    """
    distinct = F.array_distinct(toks)
    hashes = F.transform(distinct, lambda t: F.xxhash64(t))

    def bit_vote(j: int) -> Column:
        # vote_j = sum over tokens of (2*bit_j - 1)
        return F.aggregate(
            hashes,
            F.lit(0),
            lambda acc, h: acc
            + (F.shiftright(h, j).bitwiseAND(F.lit(1)) * 2 - 1).cast("int"),
        )

    out = F.lit(0).cast("long")
    for j in range(64):
        out = out + F.when(bit_vote(j) > 0, F.lit(1).cast("long") * (1 << j) if j < 63 else F.lit(-(1 << 63)).cast("long")).otherwise(F.lit(0).cast("long"))
    return out


def hamming64(a: Column, b: Column) -> Column:
    """Hamming distance between two 64-bit signatures via bit_count(xor)."""
    return F.bit_count(a.bitwiseXOR(b))


def simhash_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
) -> DataFrame:
    """Near-dup pairs by SimHash with chunk-LSH candidate generation.

    Signature split into 4 × 16-bit chunks; any pair within hamming
    distance 3 shares at least one exact chunk (pigeonhole), so the
    join on (chunk_index, chunk_value) finds all such pairs without a
    cross join. Verified by exact hamming distance.
    """
    s = df.select(
        F.col(id_col).alias("id"), simhash64(tokens(F.col(text_col))).alias("sig")
    )
    chunks = s.select(
        "id",
        "sig",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("ci"),
                        F.shiftrightunsigned(F.col("sig"), 16 * i)
                        .bitwiseAND(F.lit(0xFFFF))
                        .alias("cv"),
                    )
                    for i in range(4)
                ]
            )
        ).alias("ch"),
    ).select("id", "sig", F.col("ch.ci").alias("ci"), F.col("ch.cv").alias("cv"))
    left = chunks.select("ci", "cv", F.col("id").alias("id_a"), F.col("sig").alias("sig_a"))
    right = chunks.select("ci", "cv", F.col("id").alias("id_b"), F.col("sig").alias("sig_b"))
    return (
        left.join(right, on=["ci", "cv"])
        .filter(F.col("id_a") < F.col("id_b"))
        .dropDuplicates(["id_a", "id_b"])
        .withColumn("hamming", hamming64(F.col("sig_a"), F.col("sig_b")))
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )
