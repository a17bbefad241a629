"""Deduplication operators for large-scale text pipelines.

All operators are pure DataFrame compositions (JVM-side, shuffle-aware)
— no Python in the hot path except where noted.  Designed for 10^12-doc
scale:

* exact dedup       — hash-groupBy on a content digest; survivor = min
  doc_id per group (one shuffle on the digest).
* MinHash + LSH     — shingle -> k minhash values (xxhash64 with k salts,
  computed via explode + groupBy min) -> band buckets -> self-join on
  (band, bucket-hash) -> exact-Jaccard verification of candidates only.
  The band join is the classic sub-quadratic near-dup path.
* SimHash           — 64-bit sign-aggregated token hashes; near-dups =
  same value (or Hamming <= r via rotations, TODO).
* n-gram Jaccard    — exact pairwise within a blocking key (use only as
  verification or on small blocks; quadratic per block).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _tokens(col):
    """Whitespace tokens (documents corpus is pre-normalized); for raw
    web text, swap in the analysis tokenizer upstream."""
    return F.split(F.trim(col), r"\s+")


def shingles(col, n: int = 3):
    """n-token shingles as strings: transform over a token-index
    sequence — stays in whole-stage codegen."""
    toks = _tokens(col)
    k = F.greatest(F.size(toks) - (n - 1), F.lit(0))
    return F.when(k <= 0, F.array()).otherwise(
        F.transform(
            F.sequence(F.lit(0), k - 1),
            lambda i: F.concat_ws(
                " ", *[F.element_at(toks, (i + j + 1).cast("int")) for j in range(n)]
            ),
        )
    )


def exact_dedup(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Survivors after exact-content dedup: min id per content digest.
    Returns the original rows of the survivors."""
    digest = F.md5(F.col(text_col)).alias("_digest")
    keep = (
        df.select(F.col(id_col), digest)
        .groupBy("_digest")
        .agg(F.min(id_col).alias(id_col))
        .select(id_col)
    )
    return df.join(keep, id_col, "left_semi")


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 64,
    shingle_n: int = 3,
) -> DataFrame:
    """(id, sig ARRAY<LONG>) — k minhash values per doc.

    sig[i] = min over shingles of xxhash64(shingle, salt_i).  Computed
    columnar: explode distinct shingles, build the k-hash array per
    shingle, groupBy(id) with element-wise array min via zip_with
    aggregate — one shuffle, no Python."""
    sh = df.select(
        F.col(id_col), F.explode(F.array_distinct(shingles(F.col(text_col), shingle_n))).alias("_sh")
    )
    hashes = F.array(
        *[F.xxhash64(F.col("_sh"), F.lit(i)) for i in range(num_hashes)]
    ).alias("_h")
    per_shingle = sh.select(id_col, hashes)
    zero = F.array(*[F.lit(2**63 - 1)] * num_hashes)
    return per_shingle.groupBy(id_col).agg(
        F.aggregate(
            F.collect_list("_h"),
            zero,
            lambda acc, h: F.zip_with(acc, h, lambda a, b: F.least(a, b)),
        ).alias("sig")
    )


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 64,
    bands: int = 16,
    shingle_n: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Near-duplicate pairs (id_a < id_b, jaccard) via banded LSH with
    exact-Jaccard verification of the candidates."""
    rows_per_band = num_hashes // bands
    sigs = minhash_signatures(df, text_col, id_col, num_hashes, shingle_n)
    band_cols = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(b).alias("band"),
                    F.xxhash64(
                        *[
                            F.element_at("sig", b * rows_per_band + r + 1)
                            for r in range(rows_per_band)
                        ]
                    ).alias("bucket"),
                )
                for b in range(bands)
            ]
        )
    ).alias("bb")
    buckets = sigs.select(F.col(id_col), band_cols).select(
        id_col, F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket")
    )
    left = buckets.alias("l")
    right = buckets.alias("r")
    cand = (
        left.join(
            right,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.bucket") == F.col("r.bucket"))
            & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")),
        )
        .select(
            F.col(f"l.{id_col}").alias("id_a"), F.col(f"r.{id_col}").alias("id_b")
        )
        .distinct()
    )
    sh = df.select(
        F.col(id_col),
        F.array_distinct(shingles(F.col(text_col), shingle_n)).alias("_sh"),
    )
    a = sh.select(F.col(id_col).alias("id_a"), F.col("_sh").alias("_sha"))
    b = sh.select(F.col(id_col).alias("id_b"), F.col("_sh").alias("_shb"))
    verified = (
        cand.join(a, "id_a")
        .join(b, "id_b")
        .withColumn(
            "jaccard",
            F.size(F.array_intersect("_sha", "_shb"))
            / F.size(F.array_union("_sha", "_shb")),
        )
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )
    return verified


def simhash(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", bits: int = 64
) -> DataFrame:
    """(id, simhash LONG) — sign-aggregate of per-token 64-bit hashes.

    bit_i(doc) = 1 if sum over tokens of (+1 if bit_i(xxhash64(tok))
    else -1) > 0.  Computed via explode + groupBy sum of bit vectors."""
    toks = df.select(
        F.col(id_col), F.explode(_tokens(F.col(text_col))).alias("_t")
    ).where(F.col("_t") != "")
    h = F.xxhash64("_t")
    bit_vec = F.array(
        *[
            F.when(
                h.bitwiseAND(F.shiftleft(F.lit(1).cast("long"), i)) != 0,
                F.lit(1),
            ).otherwise(F.lit(-1))
            for i in range(bits)
        ]
    )
    summed = toks.select(id_col, bit_vec.alias("_bits")).groupBy(id_col).agg(
        F.aggregate(
            F.collect_list("_bits"),
            F.array(*[F.lit(0)] * bits),
            lambda acc, v: F.zip_with(acc, v, lambda a, b: a + b),
        ).alias("_sums")
    )
    value = F.lit(0).cast("long")
    for i in range(bits):
        bit = -(1 << 63) if i == 63 else (1 << i)  # signed-long bit 63
        value = value.bitwiseOR(
            F.when(F.element_at("_sums", i + 1) > 0, F.lit(bit).cast("long"))
            .otherwise(F.lit(0).cast("long"))
        )
    return summed.select(id_col, value.alias("simhash"))


def ngram_jaccard_pairs(
    df: DataFrame,
    block_col: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
    threshold: float = 0.1,
) -> DataFrame:
    """Exact pairwise n-gram Jaccard within a blocking key — the
    verification primitive (quadratic per block; block wisely)."""
    sh = df.select(
        F.col(id_col),
        F.col(block_col).alias("_blk"),
        F.array_distinct(shingles(F.col(text_col), shingle_n)).alias("_sh"),
    )
    a = sh.select(
        F.col("_blk"), F.col(id_col).alias("id_a"), F.col("_sh").alias("_sha")
    )
    b = sh.select(
        F.col("_blk"), F.col(id_col).alias("id_b"), F.col("_sh").alias("_shb")
    )
    return (
        a.join(b, "_blk")
        .where(F.col("id_a") < F.col("id_b"))
        .withColumn(
            "jaccard",
            F.size(F.array_intersect("_sha", "_shb"))
            / F.size(F.array_union("_sha", "_shb")),
        )
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))
    )
