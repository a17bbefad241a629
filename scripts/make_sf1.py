"""Deterministic sf1-scale synthetic tables (100k docs / 50k vectors /
1M events — 10x the sf0.1 driver bench, 200x the sf0.01 oracle gate),
written OUTSIDE the read-only /root/testdata to /dev/shm by default.

Same shape as the driver-generated testdata (TESTDATA.md): the same
31-token vocabulary, langs, src0..src19 sources, event types and value
range — so every oracle_sql() entry runs unchanged against it.  All
columns derive from xxhash64(id, salt) column expressions: no RNG, no
driver-side loops, reproducible across runs/partitionings, and the
generation itself is a ~1-second distributed job (the honest stand-in
for reading an Iceberg lake table at this scale).

Usage: python scripts/make_sf1.py [out_dir] [n_docs]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from searchlite_spark import get_spark

VOCAB = [
    "a", "agg", "batch", "big", "column", "customer", "data", "dup",
    "fast", "filter", "group", "hash", "join", "key", "line", "merge",
    "order", "part", "query", "row", "scan", "slow", "small", "sort",
    "spark", "stream", "table", "the", "value", "vector", "window",
]
LANGS = ["en", "en", "en", "en", "zh", "zh", "es", "es", "de", "fr"]
TYPES = ["click", "view", "purchase", "signup", "error"]


def _pick(arr: list[str], *hash_cols):
    lit = F.array(*[F.lit(x) for x in arr])
    return F.element_at(lit, (F.pmod(F.xxhash64(*hash_cols), len(arr)) + 1).cast("int"))


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else "/dev/shm/searchlite_sf1"
    n_docs = int(sys.argv[2]) if len(sys.argv) > 2 else 100_000
    n_vecs = n_docs // 2
    n_events = n_docs * 10
    spark = get_spark(
        "make_sf1", cores=os.environ.get("SPARK_GRAFT_CPUS", "16"),
        shuffle_partitions=32,
    )

    docs = spark.range(n_docs).select(F.col("id").alias("doc_id"))
    # planted duplicate clusters (so dedup/near-dup checks are NOT
    # vacuous at scale): ~5% of docs with id >= 1000 take their text
    # from a deterministic head doc in [0, 1000); half verbatim (exact
    # dups), half with one appended token (near dups, Jaccard >= ~0.7).
    n_heads = min(1000, max(1, n_docs // 100))
    is_dup = (F.col("doc_id") >= n_heads) & (
        F.pmod(F.xxhash64("doc_id", F.lit(31)), 20) == 0
    )
    head = F.pmod(F.xxhash64("doc_id", F.lit(33)), n_heads)
    base_id = F.when(is_dup, head).otherwise(F.col("doc_id"))
    ntok = F.pmod(F.xxhash64(base_id, F.lit(1)), 90) + 10
    vocab = F.array(*[F.lit(w) for w in VOCAB])
    text = F.array_join(
        F.transform(
            F.sequence(F.lit(0), (ntok - 1).cast("int")),
            lambda i: F.element_at(
                vocab,
                (F.pmod(F.xxhash64(base_id, i), len(VOCAB)) + 1).cast(
                    "int"
                ),
            ),
        ),
        " ",
    )
    near_tail = F.concat(
        F.lit(" "),
        F.element_at(
            vocab,
            (F.pmod(F.xxhash64("doc_id", F.lit(37)), len(VOCAB)) + 1).cast(
                "int"
            ),
        ),
    )
    text = F.when(
        is_dup & (F.pmod(F.xxhash64("doc_id", F.lit(35)), 2) == 0),
        F.concat(text, near_tail),
    ).otherwise(text)
    docs = docs.select(
        "doc_id",
        text.alias("text"),
        _pick(LANGS, "doc_id", F.lit(2)).alias("lang"),
        F.concat(
            F.lit("src"), F.pmod(F.xxhash64("doc_id", F.lit(3)), 20)
        ).alias("source"),
    ).withColumn("n_chars", F.length("text"))
    docs.repartition(32, "doc_id").write.mode("overwrite").parquet(
        os.path.join(out, "documents.parquet")
    )

    emb = spark.range(n_vecs).select(F.col("id").alias("vec_id"))
    # same planting for vectors: ~5% near-copies of a head vector
    # (tiny deterministic perturbation -> cosine ~0.9999) so
    # embedding-cosine near-dup retrieval has real positives at scale
    v_heads = min(1000, max(1, n_vecs // 100))
    v_dup = (F.col("vec_id") >= v_heads) & (
        F.pmod(F.xxhash64("vec_id", F.lit(41)), 20) == 0
    )
    v_base = F.when(v_dup, F.pmod(F.xxhash64("vec_id", F.lit(43)), v_heads)).otherwise(
        F.col("vec_id")
    )
    vec = F.transform(
        F.sequence(F.lit(0), F.lit(63)),
        lambda j: (
            F.xxhash64(v_base, j).cast("double") / F.lit(float(2**63))
            + F.when(
                v_dup,
                F.xxhash64(F.col("vec_id"), j, F.lit(47)).cast("double")
                / F.lit(float(2**63))
                * 0.005,
            ).otherwise(F.lit(0.0))
        ).cast("float"),
    )
    emb = emb.select(
        "vec_id",
        vec.alias("embedding"),
        F.pmod(F.xxhash64("vec_id", F.lit(99)), 10).cast("int").alias("label"),
    )
    emb.repartition(16, "vec_id").write.mode("overwrite").parquet(
        os.path.join(out, "embeddings.parquet")
    )

    base_us = 1_704_067_200_000_000  # 2024-01-01T00:00:00Z
    span_us = 30 * 86_400_000_000  # 30 days
    ev = spark.range(n_events).select(F.col("id").alias("event_id"))
    ev = ev.select(
        "event_id",
        F.timestamp_micros(
            (F.lit(base_us) + F.pmod(F.xxhash64("event_id", F.lit(7)), span_us))
        )
        .cast("timestamp_ntz")
        .alias("ts"),
        F.pmod(F.xxhash64("event_id", F.lit(11)), 1500).alias("user_id"),
        _pick(TYPES, "event_id", F.lit(5)).alias("event_type"),
        ((F.pmod(F.xxhash64("event_id", F.lit(13)), 49_000) + 1) / 100.0).alias(
            "value"
        ),
        F.lit("{}").alias("props"),
    )
    ev.repartition(32, "event_id").write.mode("overwrite").parquet(
        os.path.join(out, "events.parquet")
    )
    print(
        f"wrote {out}: documents={n_docs} embeddings={n_vecs} "
        f"events={n_events}"
    )
    spark.stop()


if __name__ == "__main__":
    main()
