"""Block-packed postings with block-max metadata (the WAND/BMW layout).

Reference model: per term, fixed 128-entry blocks with per-block
``max_doc_id`` and ``max_tf`` persisted next to the entries
(searchlite-core/src/index/postings.rs:78-129).  Re-expression here:
**one Parquet row per (term, block)** —

    term        STRING   "field:token"
    block_id    LONG     first doc_id in the block (sort key within term)
    n           INT      entries in the block (<= block_size)
    max_doc_id  LONG     block-max metadata ...
    max_tf      INT      ... used by BMW block skipping
    doc_ids     BINARY   delta+varint packed, sorted ascending
    tfs         BINARY   varint packed

Why rows-per-block and not one row per term: at 10^12 docs a head
term's posting list has ~10^11 entries — a single row (or a single
groupBy(term) task) is impossible.  Blocks bound both row size and
task size, and because the flat postings are already globally
range-sorted by (term, doc_id), packing is a **shuffle-free**
``mapInPandas`` over the sorted partitions: consecutive same-term rows
are chunked into <=block_size blocks locally.  A term that spans a
partition boundary just gets one short block at the edge — block-max
pruning correctness does not depend on block geometry (the reference
itself re-blocks on the fly for custom ``bmw_block_size``,
query/wand.rs:305-330).

Parquet row-group min/max statistics on ``term`` double as the term
dictionary seek: a query for k terms prunes to the few row groups
whose [min_term, max_term] ranges cover them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, types as T

from searchlite_spark.index.codec import encode_deltas, encode_varints

BLOCK_SCHEMA = T.StructType(
    [
        T.StructField("term", T.StringType(), False),
        T.StructField("block_id", T.LongType(), False),
        T.StructField("n", T.IntegerType(), False),
        T.StructField("max_doc_id", T.LongType(), False),
        T.StructField("max_tf", T.IntegerType(), False),
        T.StructField("doc_ids", T.BinaryType(), False),
        T.StructField("tfs", T.BinaryType(), False),
        # per-entry doc length (field token count) — makes blocks
        # self-contained for scoring (no docs-table join in the kernel)
        T.StructField("dls", T.BinaryType(), False),
    ]
)


def pack_partition(batches, block_size: int):
    """Pack an iterator of (term, doc_id, tf)-sorted pandas batches into
    block rows.  Carries an open run across batch boundaries so blocks
    are full-size within a partition.

    Tolerates doc_id *regressions* inside a same-term stream: Spark may
    bin-pack several per-file-sorted parquet files into one scan task,
    and file order is by size, not doc range — so the last term of one
    file can continue in the next file with a smaller doc_id.  A run is
    closed whenever doc_id fails to increase; the resulting same-term
    blocks have disjoint doc ranges and the query kernel re-sorts blocks
    by (term, block_id), so correctness is unaffected.  ``flush`` also
    asserts each emitted block is strictly ascending — a violated block
    would silently break BMW interval skipping."""
    import numpy as np
    import pandas as pd

    run_term: str | None = None
    run_last_doc: int = -1
    run_docs: list[np.ndarray] = []
    run_tfs: list[np.ndarray] = []
    run_dls: list[np.ndarray] = []

    def flush(term, docs_parts, tfs_parts, dls_parts, out):
        docs = np.concatenate(docs_parts)
        tfs = np.concatenate(tfs_parts)
        dls = np.concatenate(dls_parts)
        if len(docs) > 1 and not bool(np.all(np.diff(docs) > 0)):
            raise ValueError(
                f"pack_partition: non-ascending doc_ids in run for term "
                f"{term!r} — input violates the per-partition "
                f"(term, doc_id) sort contract"
            )
        for s in range(0, len(docs), block_size):
            d = docs[s : s + block_size]
            t = tfs[s : s + block_size]
            l = dls[s : s + block_size]
            out.append(
                (
                    term,
                    int(d[0]),
                    len(d),
                    int(d[-1]),
                    int(t.max()),
                    encode_deltas(d.astype(np.uint64)),
                    encode_varints(t.astype(np.uint64)),
                    encode_varints(l.astype(np.uint64)),
                )
            )

    cols = ["term", "block_id", "n", "max_doc_id", "max_tf", "doc_ids", "tfs", "dls"]
    for pdf in batches:
        out: list[tuple] = []
        terms = pdf["term"].to_numpy()
        doc_ids = pdf["doc_id"].to_numpy()
        tfs = pdf["tf"].to_numpy()
        dls = pdf["dl"].to_numpy()
        if len(terms) == 0:
            continue
        # boundaries of equal-term ascending runs within this batch: a
        # run ends on term change OR doc_id regression (file-concat seam)
        change = (
            np.nonzero((terms[1:] != terms[:-1]) | (doc_ids[1:] <= doc_ids[:-1]))[0]
            + 1
        )
        bounds = np.concatenate(([0], change, [len(terms)]))
        for bi in range(len(bounds) - 1):
            lo, hi = bounds[bi], bounds[bi + 1]
            term = terms[lo]
            if run_term is not None and (
                term != run_term or int(doc_ids[lo]) <= run_last_doc
            ):
                flush(run_term, run_docs, run_tfs, run_dls, out)
                run_docs, run_tfs, run_dls = [], [], []
            run_term = term
            run_last_doc = int(doc_ids[hi - 1])
            run_docs.append(doc_ids[lo:hi])
            run_tfs.append(tfs[lo:hi])
            run_dls.append(dls[lo:hi])
            if hi < len(terms):  # run is closed within this batch
                flush(run_term, run_docs, run_tfs, run_dls, out)
                run_term, run_docs, run_tfs, run_dls = None, [], [], []
        if out:
            yield pd.DataFrame(dict(zip(cols, map(list, zip(*out)))))
    if run_term is not None:
        out = []
        flush(run_term, run_docs, run_tfs, run_dls, out)
        yield pd.DataFrame(dict(zip(cols, map(list, zip(*out)))))


def build_block_postings(
    spark: SparkSession,
    postings: DataFrame,
    out_path: str,
    block_size: int = 128,
    num_partitions: int | None = None,
) -> DataFrame:
    """``postings`` must be sorted by (term, doc_id) **within each scan
    partition** — as written by ``build_index``'s
    ``sortWithinPartitions("term", "doc_id")`` — so packing needs no
    shuffle.  Global range order is NOT required: under the hash(term,
    doc-chunk) layout a term's postings may appear in several files /
    partitions, and ``pack_partition`` closes a run at every file-concat
    seam (doc_id regression), emitting disjoint same-term blocks that the
    query kernel re-sorts by (term, block_id)."""
    src = postings.select("term", "doc_id", "tf", "dl")
    packed = src.mapInPandas(
        lambda it: pack_partition(it, block_size), BLOCK_SCHEMA
    )
    packed.write.mode("overwrite").parquet(out_path)
    return spark.read.parquet(out_path)
