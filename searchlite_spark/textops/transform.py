"""Document transforms for training-data preparation: fixed-size
passage chunking, PII redaction, and training-sequence packing.

Chunking and redaction are pure column expressions (chunking ends in
one generator explode) — map-side only, no shuffle, so they run at
scan bandwidth regardless of corpus size.  Packing needs one global
prefix sum; see ``pack_sequences`` for the two-phase pattern that
computes it without ever funneling rows through a single partition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F, types as T

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


def pack_sequences(
    df: DataFrame,
    budget: int = 2048,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_tokens_col: str | None = None,
    num_partitions: int | None = None,
) -> DataFrame:
    """GPT-style training-sequence packing: concatenate every document's
    tokens in ``id_col`` order into one virtual stream, then split the
    stream into packs of exactly ``budget`` tokens (the last pack keeps
    the remainder).  A document that straddles a pack boundary is split
    across packs — no padding, no discarded tokens, the standard
    concat-and-chunk layout for LLM pretraining batches.

    Returns one row per (document, pack) overlap:
    ``(pack_id, <id_col>, slice_start, slice_len)`` — token ``i`` of a
    document with ``slice_start <= i < slice_start + slice_len`` for
    pack ``p`` belongs to training sequence ``p``.  Invariants: every
    pack except the last sums to exactly ``budget``; each document's
    slices are contiguous, start at 0, and sum to its token count;
    empty documents (0 tokens) are dropped.

    Token counts come from ``n_tokens_col`` when given (pre-tokenized
    pipelines), else from whitespace-splitting ``text_col`` with the
    same tokenization as :func:`chunk_documents`.

    Scale notes (the reason this is not one ``Window.orderBy``): a
    global running sum via an un-partitioned window moves EVERY row
    into a single partition — the canonical Spark scale-killer.
    Instead the prefix sum is two-phase over a slim ``(id, n)``
    projection (~16 bytes/doc, locally checkpointed so the tokenize
    scan runs once and the blocks die with the returned plan):

    1. range-partition + sort by ``id_col``; one tiny job collects the
       per-partition token totals (``num_partitions`` rows) and the
       driver turns them into per-partition start offsets;
    2. an Arrow ``mapInPandas`` kernel streams each partition in order,
       adding its offset to the partition-local running sum — zero
       additional exchange, every partition independent.

    The output depends only on document order, never on partition
    boundaries, so any partition count gives identical packs.
    """
    if budget <= 0:
        raise ValueError("budget must be a positive token count")
    if num_partitions is None:
        num_partitions = int(
            df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32")
        )
    if n_tokens_col is not None:
        n = F.col(n_tokens_col).cast("long")
    else:
        n = F.size(
            F.filter(F.split(F.trim(F.col(text_col)), r"\s+"), lambda t: t != "")
        ).cast("long")
    slim = (
        df.select(F.col(id_col), n.alias("n"))
        .where(F.col("n") > 0)
        .repartitionByRange(num_partitions, id_col)
        .sortWithinPartitions(id_col)
    )

    # localCheckpoint: the offsets job and the kernel job must see the
    # SAME materialized partitions (and the tokenize scan should run
    # once).  Not persist(): CacheManager entries live until an
    # explicit unpersist that the caller cannot issue (the handle is
    # function-local), which would leak executor storage per call in a
    # long-lived session; checkpoint blocks are GC-cleaned with the
    # returned plan.
    slim = slim.localCheckpoint(eager=True)
    totals = (
        slim.select(F.spark_partition_id().alias("pid"), "n")
        .groupBy("pid")
        .agg(F.sum("n").alias("total"))
        .collect()
    )
    by_pid = {int(r["pid"]): int(r["total"]) for r in totals}
    offsets: dict[int, int] = {}
    acc = 0
    for pid in sorted(by_pid):  # range partitions are ordered by key
        offsets[pid] = acc
        acc += by_pid[pid]

    out_type = T.StructType(
        [slim.schema[id_col], T.StructField("n", T.LongType(), False),
         T.StructField("start", T.LongType(), False)]
    )

    def running_sum(iterator):
        from pyspark import TaskContext

        running = offsets.get(TaskContext.get().partitionId(), 0)
        for pdf in iterator:
            counts = pdf["n"].to_numpy()
            ends = counts.cumsum()
            pdf = pdf.assign(start=running + ends - counts)
            running += int(ends[-1]) if len(ends) else 0
            yield pdf

    spans = slim.mapInPandas(running_sum, out_type)

    start, nn = F.col("start"), F.col("n")
    # integer division keeps pack ids exact past 2^53 total tokens,
    # where float floor(start/budget) would round
    first = F.expr(f"start DIV {int(budget)}")
    last = F.expr(f"(start + n - 1) DIV {int(budget)}")
    packed = spans.select(
        F.col(id_col), start, nn,
        F.explode(F.sequence(first, last)).alias("pack_id"),
    )
    lo = F.greatest(start, F.col("pack_id") * budget)
    hi = F.least(start + nn, (F.col("pack_id") + 1) * budget)
    return packed.select(
        "pack_id",
        id_col,
        (lo - start).alias("slice_start"),
        (hi - lo).alias("slice_len"),
    )
