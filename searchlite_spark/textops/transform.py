"""Document transforms for training-data preparation: fixed-size
passage chunking and PII redaction.

Both are pure column expressions (chunking ends in one generator
explode) — map-side only, no shuffle, so they run at scan bandwidth
regardless of corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from searchlite_spark.textops.dedup import bind_once

# Deliberately simple, RE2-and-Java-compatible patterns — the contract
# is deterministic redaction, not perfect PII recall.  Order matters:
# emails are redacted before phone numbers so digits inside an already
# redacted token can't re-match.
PII_PATTERNS = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"),
    ("ipv4", r"\b(\d{1,3}\.){3}\d{1,3}\b"),
    ("phone", r"\+\d{7,15}\b"),
)


def chunk_documents(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_tokens: int = 512,
    overlap: int = 0,
) -> DataFrame:
    """Split each document into whitespace-token windows of
    ``chunk_tokens`` with ``overlap`` tokens shared between adjacent
    chunks.  Returns ``(id_col, chunk_id, chunk_text, n_tokens)`` —
    one output row per chunk, ``chunk_id`` 0-based in document order.

    The last chunk keeps whatever remains (>= 1 token); a document
    shorter than one window yields exactly one chunk.  Chunk count is
    ``ceil((n - overlap) / stride)`` with ``stride = chunk_tokens -
    overlap`` — every token lands in at least one chunk and chunk
    starts advance uniformly, the standard LLM-pretraining windowing.
    """
    if overlap >= chunk_tokens:
        raise ValueError("overlap must be smaller than chunk_tokens")
    stride = chunk_tokens - overlap
    toks_expr = F.filter(
        F.split(F.trim(F.col(text_col)), r"\s+"), lambda t: t != ""
    )

    # bind the token array once per row — referencing the split()
    # expression inside the chunk lambda would re-tokenize the document
    # for every chunk (see dedup.bind_once)
    def build(toks):
        n_chunks = F.greatest(
            F.lit(1),
            F.ceil((F.size(toks) - F.lit(overlap)).cast("double") / stride).cast(
                "int"
            ),
        )
        return F.transform(
            F.sequence(F.lit(0), n_chunks - 1),
            lambda i: F.slice(toks, i * stride + 1, chunk_tokens),
        )

    chunks = bind_once(toks_expr, build)
    exploded = df.select(
        F.col(id_col), F.posexplode(chunks).alias("chunk_id", "_toks")
    )
    return exploded.select(
        id_col,
        "chunk_id",
        F.array_join("_toks", " ").alias("chunk_text"),
        F.size("_toks").alias("n_tokens"),
    )


def redact_pii(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    patterns=PII_PATTERNS,
    token: str = "[{kind}]",
) -> DataFrame:
    """Replace every match of each PII pattern with a typed placeholder
    (``[email]``, ``[ipv4]``, ``[phone]``) and report per-kind match
    counts so the pipeline can audit redaction volume.  Counts are
    taken BEFORE any replacement; patterns then apply in declaration
    order to the running text.
    """
    text = F.col(text_col)
    counts = [
        F.regexp_count(text, F.lit(pat)).alias(f"n_{kind}")
        for kind, pat in patterns
    ]
    redacted = text
    for kind, pat in patterns:
        redacted = F.regexp_replace(redacted, pat, token.format(kind=kind))
    return df.select(
        F.col(id_col), redacted.alias(text_col), *counts
    )
