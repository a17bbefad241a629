"""Deterministic synthetic Common-Crawl-style corpus (input_hint shape).

Columns: (url STRING unique, warc_ts TIMESTAMP, html BINARY,
text STRING, lang STRING) — FIXTURES.md F1.  Generation is seeded and
order-stable; the extracted ``text`` is byte-identical per url across
runs (the per-row invariant).  Generated distributed (mapInPandas over
a range), so any scale works without driver memory.

Vocabulary from the reference's tests/examples
(searchlite-core/tests/pruning.rs:46, examples/pruning.rs:17-19) with a
Zipf-ish skew so head-term posting lists exist (skew/salting paths need
them).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

VOCAB = [
    "rust", "search", "engine", "fast", "tiny", "wand", "bmw",
    "sqlite", "index", "language", "systems", "programming",
]

_LANGS = ["en"] * 9 + ["de"]


def make_corpus(
    spark: SparkSession,
    n_docs: int,
    seed: int = 42,
    min_tokens: int = 6,
    max_tokens: int = 12,
    partitions: int | None = None,
) -> DataFrame:
    if partitions is None:
        partitions = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    base = spark.range(0, n_docs, 1, partitions)

    vocab = list(VOCAB)
    langs = list(_LANGS)
    lo, hi = min_tokens, max_tokens

    def gen(batches):
        import random

        import pandas as pd

        base_ts = 1704067200  # 2024-01-01T00:00:00Z
        for pdf in batches:
            ids = pdf["id"].tolist()
            urls, tss, htmls, texts, lls = [], [], [], [], []
            # NOTE: url embeds the zero-padded index, so lexicographic
            # url order == numeric id order; `doc_id` can therefore be
            # used directly with build_index(id_mode="column") and is
            # provably identical to the reference's BTreeMap ordering.
            for i in ids:
                rng = random.Random((seed << 20) ^ i)  # per-row seed: order-stable
                n = rng.randint(lo, hi)
                # Zipf-ish: exponential index into the vocab
                words = [
                    vocab[min(int(rng.expovariate(0.45)), len(vocab) - 1)]
                    for _ in range(n)
                ]
                text = " ".join(words)
                url = f"https://example-{i:09d}.test/page"
                urls.append(url)
                tss.append(pd.Timestamp(base_ts + i, unit="s", tz="UTC"))
                htmls.append(b"<html><body>" + text.encode() + b"</body></html>")
                texts.append(text)
                lls.append(langs[rng.randint(0, len(langs) - 1)])
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "url": urls,
                    "warc_ts": tss,
                    "html": htmls,
                    "text": texts,
                    "lang": lls,
                }
            )

    return base.mapInPandas(
        gen,
        "doc_id LONG, url STRING, warc_ts TIMESTAMP, html BINARY, text STRING, lang STRING",
    )


def corpus_index_schema():
    """The reference schema for F1 parity fixtures (FIXTURES.md)."""
    from searchlite_spark.index import IndexSchema, KeywordField, NumericField, TextField

    return IndexSchema(
        doc_id_field="url",
        text_fields=(TextField("text"),),
        keyword_fields=(KeywordField("lang"),),
        numeric_fields=(NumericField("warc_ts_ms"),),
    )


def with_warc_ts_ms(df: DataFrame) -> DataFrame:
    from pyspark.sql import functions as F

    return df.withColumn(
        "warc_ts_ms", (F.unix_timestamp("warc_ts") * 1000).cast("long")
    )
