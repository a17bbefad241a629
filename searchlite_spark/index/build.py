"""Index build: corpus DataFrame -> inverted-index tables.

The Spark-first re-expression of the reference's segment write
(searchlite-core/src/index/segment.rs:603-933):

1. deterministic dense doc_id assignment ordered by the doc-key string
   (the reference assigns ordinals in BTreeMap doc-id order,
   api/writer.rs:126-189) — done scalably with a range repartition +
   per-partition offsets, NOT a single-partition window;
2. Arrow-batched tokenization (``mapInPandas``) emitting per-(doc,term)
   partial postings (tf + positions) — the per-doc aggregation happens
   inside the pandas batch, so the shuffle moves (doc,term) rows, not
   raw tokens;
3. ONE deterministic shuffle of the flat postings by
   hash(term, doc-id-chunk) + a per-partition (term, doc_id) sort —
   the doc-chunk salt splits hot head terms ("the") across
   ~num_partitions reducers, rare terms stay whole, every parquet row
   group covers a tight term range (min/max pruning = dictionary
   seek), and — unlike a range repartition — no sampling job re-runs
   the tokenize lineage;
4. the term dictionary and global stats via partial/final hash
   aggregation (map-side combine absorbs head-term skew);
5. block-packed postings with block-max metadata + delta+varint
   payloads for the WAND kernel (see ``index/blocks.py``) — here the
   packing groupBy key is (term, block_group) so no single task ever
   owns a whole hot term's postings.

All statistics are global ("single-segment" scope, SURVEY.md §1.5).
"""

from __future__ import annotations

import time
import uuid

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

from searchlite_spark.analysis.tokenizers import normalize_keyword, tokenize_values
from searchlite_spark.index.catalog import Index, write_manifest
from searchlite_spark.index.schema import IndexSchema

POSTING_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("field", T.StringType(), False),
        T.StructField("term", T.StringType(), False),
        T.StructField("tf", T.IntegerType(), False),
        T.StructField("positions", T.ArrayType(T.IntegerType()), True),
        # per-(doc, field) token count, denormalized into every posting
        # row so BM25 scoring and the WAND kernel never join the docs
        # table (the reference reads `_len:<field>` fast fields per doc;
        # denormalization is the columnar equivalent — it dictionary/RLE
        # compresses to almost nothing in Parquet)
        T.StructField("dl", T.IntegerType(), False),
    ]
)


def assign_doc_ids(
    df: DataFrame, key: str, num_partitions: int | None = None
) -> DataFrame:
    """Dense doc_id = rank of the row in the global `key` order.

    Scalable two-pass: range-repartition by key, count rows per
    partition (tiny collect), then window *within* each partition with
    the partition's cumulative offset.  Avoids the classic
    single-partition ``row_number() OVER (ORDER BY key)`` trap.
    """
    from pyspark.sql import Window as W

    spark = df.sparkSession
    if num_partitions is None:
        num_partitions = max(df.rdd.getNumPartitions(), 8)
    ranged = df.repartitionByRange(num_partitions, F.col(key)).withColumn(
        "_pid", F.spark_partition_id()
    )
    from pyspark import StorageLevel

    # serialized disk cache (tmpfs local dir): id stability across the
    # counting pass and the downstream consumers without pinning full
    # rows in JVM heap
    ranged = ranged.persist(StorageLevel.DISK_ONLY)
    counts = {
        r["_pid"]: r["cnt"]
        for r in ranged.groupBy("_pid").agg(F.count("*").alias("cnt")).collect()
    }
    offsets, acc = {}, 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    offsets_df = spark.createDataFrame(
        [(int(p), int(o)) for p, o in offsets.items()], "_pid INT, _offset LONG"
    )
    w = W.partitionBy("_pid").orderBy(key)
    out = (
        ranged.join(F.broadcast(offsets_df), "_pid")
        .withColumn(
            "doc_id", F.row_number().over(w).cast("long") + F.col("_offset") - 1
        )
        .drop("_pid", "_offset")
    )
    return out


def tokenize_postings(
    docs: DataFrame, schema: IndexSchema, positions: bool = True
) -> DataFrame:
    """docs(doc_id, <fields>) -> flat postings (doc_id, field, term, tf, positions).

    term keys are ``"{field}:{token}"`` like the reference
    (segment.rs:674-679).  Keywords are ASCII-lowercased and
    de-duplicated per doc, indexed at position 0 with no positions kept
    (segment.rs:700-723).  positions=False (the reference's
    enable_positions=false IndexOptions, index/mod.rs:225,
    segment.rs:569-585) emits NULL position lists — tf/dl/BM25 are
    unchanged, phrase queries match nothing (phrase.rs:16-18 empty-
    positions contract).
    """
    text_fields = [(t.name, schema.index_analyzer_for(t.name)) for t in schema.text_fields]
    kw_fields = schema.keyword_field_names
    cols = ["doc_id"] + [n for n, _ in text_fields] + kw_fields

    def emit(batches):
        import pandas as pd

        for pdf in batches:
            out_doc, out_field, out_term, out_tf, out_pos = [], [], [], [], []
            out_dl: list[int] = []
            doc_ids = pdf["doc_id"].to_numpy()
            for fname, analyzer in text_fields:
                col = pdf[fname]
                for i, raw in enumerate(col):
                    if raw is None:
                        continue
                    if isinstance(raw, str):
                        toks = analyzer(raw)
                    else:  # multi-valued text field
                        toks = tokenize_values(
                            list(raw), lambda s, _a=analyzer: _a(s)
                        )
                    if not toks:
                        continue
                    agg: dict[str, list[int]] = {}
                    for tok, pos in toks:
                        agg.setdefault(tok, []).append(pos)
                    did = doc_ids[i]
                    dl = len(toks)
                    prefix = fname + ":"
                    for tok, poss in agg.items():
                        out_doc.append(did)
                        out_field.append(fname)
                        out_term.append(prefix + tok)
                        out_tf.append(len(poss))
                        out_pos.append(poss if positions else None)
                        out_dl.append(dl)
            for fname in kw_fields:
                col = pdf[fname]
                for i, raw in enumerate(col):
                    if raw is None:
                        continue
                    vals = [raw] if isinstance(raw, str) else list(raw)
                    seen = set()
                    did = doc_ids[i]
                    prefix = fname + ":"
                    for v in vals:
                        if v is None:
                            continue
                        norm = normalize_keyword(str(v))
                        if norm in seen:
                            continue
                        seen.add(norm)
                        out_doc.append(did)
                        out_field.append(fname)
                        out_term.append(prefix + norm)
                        out_tf.append(1)
                        out_pos.append([0] if positions else None)
                        out_dl.append(0)  # keywords: avgdl=0 => norm=1
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(out_doc, dtype="int64"),
                    "field": pd.Series(out_field, dtype="object"),
                    "term": pd.Series(out_term, dtype="object"),
                    "tf": pd.Series(out_tf, dtype="int32"),
                    "positions": pd.Series(out_pos, dtype="object"),
                    "dl": pd.Series(out_dl, dtype="int32"),
                }
            )

    return docs.select(*cols).mapInPandas(emit, POSTING_SCHEMA)


# ---------------------------------------------------------------------------
# Vectorized tokenize path (plain default analyzer)
#
# The Arrow-batched Python tokenizer above calls ``analyzer(raw)`` per
# document string — per-token Python (regex match objects, tuples, dict
# inserts) plus a slow pandas-object→Arrow conversion of the positions
# lists.  For the DEFAULT analyzer (alnum-run split + ASCII-only lower,
# tokenizer.rs:7-29) the whole pipeline vectorizes:
#
#   * tokenization = codegen'd column algebra (split/filter/translate);
#   * the per-(doc, term) aggregation = pyarrow's C++ hash group-by
#     over the flattened token buffer inside ``mapInArrow`` — token
#     strings move zero-copy from the JVM, positions/doc ids come from
#     the list offsets via numpy, and the output ListArray is built
#     natively (never through pandas object columns);
#   * keyword fields are pure column expressions (1-2 rows per doc).
#
# Measured at 800k docs × ~90 tokens (8 cores, this sandbox): the
# alternatives — per-token-row shuffle + sorted-run pack (9× shuffle
# rows), Spark collect_list group-by, pandas groupby — were 1.7-5×
# slower end-to-end.  Round-3 re-measurement at 2.4M docs: the Arrow
# path tokenizes 2.6× faster than the Python analyzer path, and the
# tokenize output is persisted (MEMORY_AND_DISK) before the range
# shuffle so the partitioner's sampling pass does NOT re-run the
# tokenize lineage (the round-2 double-tokenize was ~45% of build wall
# time and flattened the N->4N scaling curve).

# Must mirror the PYTHON query-time analyzer exactly (tokenizers.py
# _ALNUM_RUN == str.isalnum == L* ∪ Nd ∪ Nl ∪ No).  NOT Java's
# \p{IsAlphabetic}: that derived property additionally includes
# Other_Alphabetic combining marks (Devanagari matras, Thai vowels,
# Hebrew niqqud, Arabic harakat), so the index path would keep words
# whole where query analysis splits them — zero recall on those
# scripts (round-2 advice, verified with 'नमस्ते दुनिया').
_SQL_SPLIT_PATTERN = r"[^\p{L}\p{Nd}\p{Nl}\p{No}]+"
_UPPER = "ABCDEFGHIJKLMNOPQRSTUVWXYZ"
_LOWER = "abcdefghijklmnopqrstuvwxyz"


def sql_tokenize_eligible(docs: DataFrame, schema: IndexSchema) -> bool:
    """True when every text field uses the plain default analyzer on a
    scalar string column (custom filter chains and multi-valued text
    keep the Python path, which implements the position-gap rule)."""
    for t in schema.text_fields:
        a = schema.index_analyzer_for(t.name)
        if a.tokenizer != "default" or a.filters:
            return False
        if isinstance(docs.schema[t.name].dataType, T.ArrayType):
            return False
    return True


def _keyword_posting_rows_sql(
    docs: DataFrame, schema: IndexSchema, positions: bool = True
) -> DataFrame | None:
    """Keyword postings as pure column expressions: ASCII-lowercased,
    de-duplicated per doc, tf=1 at position 0, dl=0 (segment.rs:700-723).
    positions=False writes NULL like the text rows (the reference's
    PostingsWriter drops positions for every term when disabled,
    segment.rs:833)."""
    frames: list[DataFrame] = []
    for k in schema.keyword_fields:
        col = F.col(k.name)
        if isinstance(docs.schema[k.name].dataType, T.ArrayType):
            vals = F.array_distinct(
                F.transform(col, lambda v: F.translate(v.cast("string"), _UPPER, _LOWER))
            )
            base = docs.select("doc_id", F.explode(vals).alias("_v"))
        else:
            base = docs.select(
                "doc_id", F.translate(col.cast("string"), _UPPER, _LOWER).alias("_v")
            )
        frames.append(
            base.where(F.col("_v").isNotNull()).select(
                "doc_id",
                F.lit(k.name).alias("field"),
                F.concat(F.lit(k.name + ":"), F.col("_v")).alias("term"),
                F.lit(1).cast("int").alias("tf"),
                (
                    F.array(F.lit(0).cast("int"))
                    if positions
                    else F.lit(None).cast("array<int>")
                ).alias("positions"),
                F.lit(0).cast("int").alias("dl"),
            )
        )
    if not frames:
        return None
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f)
    return out


def _make_arrow_pack_kernel(text_fields: list[str], positions: bool = True):
    """mapInArrow kernel: (doc_id, _toks_<field>...) -> POSTING rows.

    All heavy lifting is C: list offsets -> numpy repeat for doc ids /
    positions / dl, pyarrow hash group-by for the (doc, term)
    aggregation, native ListArray output.  positions=False skips the
    position arithmetic and the list aggregation entirely (NULL
    positions column) — the enable_positions=false build path."""

    def kernel(batches):
        import numpy as np
        import pyarrow as pa
        import pyarrow.compute as pc

        # one Spark task slot == one CPU: pyarrow's default pool spawns
        # os.cpu_count() threads PER python worker, so 8 concurrent
        # tasks would run 8×32 compute threads — oversubscription that
        # destroys multi-core scaling.  Pin to 1; Spark provides the
        # parallelism.
        try:
            pa.set_cpu_count(1)
            pa.set_io_thread_count(1)
        except Exception:
            pass

        for rb in batches:
            doc_np = rb.column(rb.schema.get_field_index("doc_id")).to_numpy(
                zero_copy_only=False
            )
            for fname in text_fields:
                arr = rb.column(rb.schema.get_field_index("_toks_" + fname))
                offsets = arr.offsets.to_numpy(zero_copy_only=False)
                counts = np.diff(offsets)
                if len(arr.values) == 0:
                    continue
                # ASCII-only lowercase (A-Z only; 'É' stays 'É' like the
                # reference's to_ascii_lowercase) — vectorized C here is
                # cheaper than translate()/transform() on the JVM side
                flat = pc.ascii_lower(arr.values)
                doc = np.repeat(doc_np, counts)
                dl = np.repeat(counts.astype(np.int32), counts)
                cols = {
                    "doc_id": pa.array(doc, pa.int64()),
                    "term": flat,
                    "dl": pa.array(dl, pa.int32()),
                }
                if positions:
                    pos = (
                        np.arange(len(flat), dtype=np.int64)
                        - np.repeat(offsets[:-1], counts)
                    ).astype(np.int32)
                    cols["pos"] = pa.array(pos, pa.int32())
                t2 = pa.table(cols)
                # use_threads=False keeps rows in order -> positions
                # accumulate ascending within each (doc, term) group
                aggs = (
                    [("pos", "list"), ("pos", "count"), ("dl", "min")]
                    if positions
                    else [("dl", "count"), ("dl", "min")]
                )
                agg = pa.TableGroupBy(
                    t2, ["doc_id", "term"], use_threads=False
                ).aggregate(aggs)
                n = len(agg)
                tf_col = agg.column("pos_count" if positions else "dl_count")
                pos_col = (
                    agg.column("pos_list").combine_chunks()
                    if positions
                    else pa.nulls(n, pa.list_(pa.int32()))
                )
                term_full = pc.binary_join_element_wise(
                    pa.scalar(fname + ":"), agg.column("term").cast(pa.string()), pa.scalar("")
                )
                yield pa.record_batch(
                    [
                        agg.column("doc_id").combine_chunks(),
                        pa.array([fname] * n, pa.string()),
                        term_full.combine_chunks(),
                        tf_col.cast(pa.int32()).combine_chunks(),
                        pos_col,
                        agg.column("dl_min").cast(pa.int32()).combine_chunks(),
                    ],
                    names=["doc_id", "field", "term", "tf", "positions", "dl"],
                )

    return kernel


def tokenize_postings_arrow(
    docs: DataFrame, schema: IndexSchema, positions: bool = True
) -> DataFrame:
    """Vectorized tokenize -> POSTING_SCHEMA rows (plain default
    analyzer only; assert with sql_tokenize_eligible first)."""
    text_names = schema.text_field_names
    cols = [F.col("doc_id")]
    for fname in text_names:
        # JVM side does ONLY split+filter; the ASCII-only lowercase
        # happens in the kernel via pyarrow's ascii_lower (vectorized C,
        # exactly the reference's to_ascii_lowercase semantics —
        # tokenizer.rs:7-29).  Measured: JVM translate() added ~45% to
        # the tokenize stage; transform(translate) per element was 2x.
        toks = F.filter(
            F.split(F.col(fname), _SQL_SPLIT_PATTERN, -1),
            lambda x: x != F.lit(""),
        )
        cols.append(F.coalesce(toks, F.array()).alias("_toks_" + fname))
    out = None
    if text_names:
        out = docs.select(*cols).mapInArrow(
            _make_arrow_pack_kernel(text_names, positions), POSTING_SCHEMA
        )
    kw = _keyword_posting_rows_sql(docs, schema, positions)
    if kw is not None:
        out = kw if out is None else out.unionByName(kw)
    return out


# RE2 class syntax: \pL == \p{L}; the class must mirror
# _SQL_SPLIT_PATTERN exactly (same Unicode general categories)
_RE2_SPLIT_PATTERN = r"[^\pL\p{Nd}\p{Nl}\p{No}]+"


def _make_arrow_split_kernel(text_fields: list[str], positions: bool = True):
    """mapInArrow kernel over RAW text columns: RE2 split (C++),
    empty-token drop, ASCII lowercase, per-(doc, term) tf/positions
    aggregation — the whole analysis chain in one Arrow pass, nothing
    but the raw text crosses the JVM->Python boundary.
    positions=False (enable_positions=false): no position arithmetic,
    no list aggregation, NULL positions column."""

    def kernel(batches):
        import numpy as np
        import pyarrow as pa
        import pyarrow.compute as pc

        try:
            pa.set_cpu_count(1)
            pa.set_io_thread_count(1)
        except Exception:
            pass

        for rb in batches:
            doc_np = rb.column(rb.schema.get_field_index("doc_id")).to_numpy(
                zero_copy_only=False
            )
            for fname in text_fields:
                col = rb.column(rb.schema.get_field_index(fname))
                col = pc.fill_null(col, "")
                toks = pc.split_pattern_regex(col, _RE2_SPLIT_PATTERN)
                toks = toks.combine_chunks() if isinstance(
                    toks, pa.ChunkedArray
                ) else toks
                offsets = toks.offsets.to_numpy(zero_copy_only=False)
                flat = toks.values
                if len(flat) == 0:
                    continue
                # boundary splits yield "" tokens — drop them while
                # keeping doc attribution
                mask = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
                counts_raw = np.diff(offsets)
                doc_idx = np.repeat(
                    np.arange(len(doc_np), dtype=np.int64), counts_raw
                )[mask]
                flat = pc.ascii_lower(flat.filter(pa.array(mask)))
                counts = np.bincount(doc_idx, minlength=len(doc_np))
                dl = np.repeat(counts.astype(np.int32), counts)
                cols = {
                    "doc_id": pa.array(doc_np[doc_idx], pa.int64()),
                    "term": flat,
                    "dl": pa.array(dl, pa.int32()),
                }
                if positions:
                    starts = np.concatenate(([0], np.cumsum(counts)[:-1]))
                    pos = (
                        np.arange(len(doc_idx), dtype=np.int64)
                        - np.repeat(starts, counts)
                    ).astype(np.int32)
                    cols["pos"] = pa.array(pos, pa.int32())
                t2 = pa.table(cols)
                aggs = (
                    [("pos", "list"), ("pos", "count"), ("dl", "min")]
                    if positions
                    else [("dl", "count"), ("dl", "min")]
                )
                agg = pa.TableGroupBy(
                    t2, ["doc_id", "term"], use_threads=False
                ).aggregate(aggs)
                n = len(agg)
                tf_col = agg.column("pos_count" if positions else "dl_count")
                pos_col = (
                    agg.column("pos_list").combine_chunks()
                    if positions
                    else pa.nulls(n, pa.list_(pa.int32()))
                )
                term_full = pc.binary_join_element_wise(
                    pa.scalar(fname + ":"),
                    agg.column("term").cast(pa.string()),
                    pa.scalar(""),
                )
                yield pa.record_batch(
                    [
                        agg.column("doc_id").combine_chunks(),
                        pa.array([fname] * n, pa.string()),
                        term_full.combine_chunks(),
                        tf_col.cast(pa.int32()).combine_chunks(),
                        pos_col,
                        agg.column("dl_min").cast(pa.int32()).combine_chunks(),
                    ],
                    names=["doc_id", "field", "term", "tf", "positions", "dl"],
                )

    return kernel


def tokenize_postings_arrow_re2(
    docs: DataFrame, schema: IndexSchema, positions: bool = True
) -> DataFrame:
    """Variant of tokenize_postings_arrow with the regex split ALSO in
    the Arrow kernel (RE2): the JVM ships raw text only."""
    text_names = schema.text_field_names
    out = None
    if text_names:
        out = docs.select("doc_id", *text_names).mapInArrow(
            _make_arrow_split_kernel(text_names, positions), POSTING_SCHEMA
        )
    kw = _keyword_posting_rows_sql(docs, schema, positions)
    if kw is not None:
        out = kw if out is None else out.unionByName(kw)
    return out


def tokenize_postings_best(
    docs: DataFrame, schema: IndexSchema, positions: bool = True
) -> tuple[DataFrame, bool]:
    """(postings_df, vectorized?) — the Arrow path when eligible, else
    the Python analyzer path.

    The RE2 kernel variant is the default vectorized path: measured
    ~10-30% faster than the JVM-split variant at 2.4M docs (the JVM
    regexp split + token-array materialization cost more than RE2 in
    the kernel), exact row parity verified (hash over 518k posting
    rows incl. positions)."""
    if sql_tokenize_eligible(docs, schema):
        return tokenize_postings_arrow_re2(docs, schema, positions), True
    return tokenize_postings(docs, schema, positions), False


def compute_stats(terms_df: DataFrame, n_docs: int, text_names) -> dict:
    """Global stats from the term dictionary: avgdl = f32(Σ cf) / f32(N)
    (segment.rs compute_avg_lengths — the float32 division is
    oracle-parity-critical; this is the ONE place it lives, shared by
    build / append / rewrite so the three paths cannot drift)."""
    import numpy as np

    text_names = list(text_names)
    totals_rows = (
        terms_df.where(F.col("field").isin(text_names))
        .groupBy("field")
        .agg(F.sum("cf").alias("total"))
        .collect()
        if text_names
        else []
    )
    totals = {r["field"]: int(r["total"]) for r in totals_rows}
    return {
        "n_docs": int(n_docs),
        "avgdl": {
            f: float(np.float32(totals.get(f, 0)) / np.float32(n_docs))
            if n_docs
            else 0.0
            for f in text_names
        },
        "total_tokens": {f: totals.get(f, 0) for f in text_names},
    }


def build_index(
    spark: SparkSession,
    corpus: DataFrame,
    schema: IndexSchema,
    out_dir: str,
    num_partitions: int | None = None,
    block_size: int = 128,
    build_blocks: bool = True,
    checkpoint: bool = False,
    input_snapshot: str | None = None,
    id_mode: str = "assign",
    store_columns: list[str] | None = None,
    docs_layout: str = "range",
    postings_layout: str = "hash",
    enable_positions: bool = True,
    bm25_k1: float = 0.9,
    bm25_b: float = 0.4,
) -> Index:
    """id_mode="assign": dense doc ids in doc-key string order (the
    reference's BTreeMap commit order, writer.rs:126-189).
    id_mode="column": the key column already IS a unique BIGINT doc id —
    use it directly (saves the global ordering pass).
    store_columns: restrict the docs table (docstore) to these columns —
    e.g. exclude raw `html` blobs that live in the source lake anyway
    (the reference's stored:false flag, manifest.rs).
    docs_layout: "range" re-sorts the docstore by doc_id (row-group
    pruning for top-k fetches); "copy" writes a straight projection with
    NO shuffle — use when the input is already doc_id-clustered (e.g. an
    Iceberg table partitioned/ordered on the id), which at 100 TB is the
    only sane choice: never re-shuffle the raw-text lake.
    postings_layout: "hash" (default) shuffles postings by
    hash(term, doc_id-chunk) — one deterministic exchange, no sampling
    job, head terms split across ~num_partitions chunks (skew defused),
    each partition term-sorted so parquet row-group min/max still gives
    dictionary-seek pruning.  "range" is the round-2 layout
    (repartitionByRange by (term, doc_id)) — globally term-sorted files,
    but the range partitioner's SAMPLING job forces either a second
    tokenize pass or a full cache scan; measured slower at every scale
    tried, kept for comparison.
    enable_positions: False = the reference's IndexOptions
    enable_positions=false (api/types.rs:19, segment.rs:569-585): the
    postings' ``positions`` column is written NULL — smaller index,
    same tf/dl/BM25, and phrase queries match nothing (the
    phrase.rs:16-18 empty-positions contract).  Recorded in the
    manifest so appends/rebuilds keep the layout consistent.
    bm25_k1 / bm25_b: per-index scoring parameters (the reference's
    IndexOptions bm25_k1/bm25_b, api/types.rs:20-21; defaults from
    searchlite-cli/src/main.rs:196-197).  Stored in the manifest and
    read by every scoring path (brute, WAND, BMW, batch) at query
    time — nothing in the index LAYOUT depends on them (blocks keep
    raw max_tf), so they are free to differ between indexes."""
    if bm25_k1 < 0:
        raise ValueError(f"bm25_k1 must be >= 0, got {bm25_k1}")
    if not (0.0 <= bm25_b <= 1.0):
        raise ValueError(f"bm25_b must be in [0, 1], got {bm25_b}")
    t0 = time.time()
    phases: dict[str, float] = {}
    _last = [t0]

    def _mark(name: str) -> None:
        now = time.time()
        phases[name] = round(now - _last[0], 3)
        _last[0] = now

    # size-adaptive layout (guide §6: output files sized by BYTES, not
    # by a core-count constant): when the caller does not pin
    # num_partitions, the three table writes repartition WITHOUT a fixed
    # partition number so AQE's byte-based coalescing
    # (advisoryPartitionSizeInBytes) picks the reducer/file count from
    # the actual shuffle size — a 10 MB index lands in 1-2 files per
    # table instead of 32 ~300 KB ones (every query scan stage was
    # paying 32 tasks of scheduling for kilobytes of work), while a
    # 100 TB build gets ~advisory-sized files from the same rule.  The
    # map-side tokenize parallelism is unaffected (it follows input
    # splits).  Explicit num_partitions keeps the old fixed layout.
    adaptive_layout = num_partitions is None
    if num_partitions is None:
        num_partitions = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))

    from pyspark import StorageLevel

    persisted = False
    if id_mode == "column":
        # a pre-assigned `doc_id` BIGINT column wins; otherwise the key
        # column itself must be castable to BIGINT.  NO cache: each
        # downstream pass (tokenize, docstore) re-scans the columnar
        # source with column pruning — strictly cheaper than pinning
        # the full rows (incl. html blobs) in executor memory, which
        # measurably ANTI-scales (8 concurrent tasks fighting a fat row
        # cache for heap: postings phase 150 s vs 29 s uncached at 8
        # cores, 2.4M docs).  At 100 TB caching the raw corpus is not
        # even an option.
        docs = corpus
        if "doc_id" not in corpus.columns:
            docs = docs.withColumn("doc_id", F.col(schema.doc_id_field).cast("long"))
        n_docs = docs.count()  # parquet footer count — no data scan
    else:
        docs = assign_doc_ids(corpus, schema.doc_id_field, num_partitions)
        # assign mode: the id assignment (range shuffle + window) must
        # not recompute per downstream pass — cache SERIALIZED on disk
        # (spark.local.dir is tmpfs here): no JVM heap pressure, none
        # of the row-cache GC thrash that flattens scaling
        docs = docs.persist(StorageLevel.DISK_ONLY)
        persisted = True
        n_docs = docs.count()
    _mark("ids")

    postings_path = f"{out_dir}/postings"
    postings_flat, vectorized = tokenize_postings_best(
        docs, schema, positions=enable_positions
    )
    if postings_layout == "hash":
        # Single deterministic exchange: hash(term, doc-chunk).  The
        # doc-chunk salt splits a head term ("the", df≈n_docs) across
        # ~num_partitions reducers — no single task ever owns a whole
        # hot posting list — while rare terms stay whole.  Within each
        # partition rows are (term, doc_id)-sorted, so every parquet
        # row group covers one tight term range (min/max pruning seeks
        # like a term dictionary) and doc ids are ascending per term
        # (delta encoding + block packing need nothing else).  Unlike
        # repartitionByRange there is NO sampling job, so the tokenize
        # lineage runs exactly once with no cache materialization.
        chunk_w = max(n_docs // num_partitions, 1)
        salt = (F.col("doc_id") / F.lit(int(chunk_w))).cast("long")
        if adaptive_layout:
            # reducer/file count derived from the DOC COUNT (the
            # postings row count is ~n_docs * avgdl — known-shaped
            # before the tokenize runs), capped at the configured
            # shuffle width: a 5k-doc index writes 1 file, a 50k-doc
            # one ~6 (parallel sort+encode instead of one 2-second
            # task), and at cluster scale the cap (a per-deployment
            # setting) governs.  Pure byte-based AQE coalescing was
            # measured to serialize this stage: ~40 MB of shuffled
            # postings is one advisory-sized reducer but seconds of
            # sort + parquet encode.
            dpr = int(
                spark.conf.get("spark.searchlite.build.docsPerReducer", "8000")
            )
            n_red = max(1, min(num_partitions, 1 + int(n_docs) // dpr))
            postings_sorted = postings_flat.repartition(
                n_red, F.col("term"), salt
            ).sortWithinPartitions("term", "doc_id")
        else:
            postings_sorted = postings_flat.repartition(
                num_partitions, F.col("term"), salt
            ).sortWithinPartitions("term", "doc_id")
        postings_sorted.write.mode("overwrite").parquet(postings_path)
    else:
        # round-2 layout: globally range-sorted files.  The range
        # partitioner SAMPLES its child, which would re-run the whole
        # tokenize lineage (measured ~45% of round-2 build wall time) —
        # persist so the tokenizer runs once.
        postings_flat = postings_flat.persist(StorageLevel.MEMORY_AND_DISK)
        postings_sorted = postings_flat.repartitionByRange(
            num_partitions, "term", "doc_id"
        ).sortWithinPartitions("term", "doc_id")
        postings_sorted.write.mode("overwrite").parquet(postings_path)
        postings_flat.unpersist()
    postings = spark.read.parquet(postings_path)
    _mark("postings")

    # docs table = the docstore + fast fields (corpus columns + doc_id).
    # Per-doc lengths live denormalized in postings/blocks (`dl`), so no
    # dl pivot/join is needed here — the reference's `_len:<field>` fast
    # fields have no separate materialization.
    text_names = schema.text_field_names
    docs_path = f"{out_dir}/docs"
    docs_store = docs
    if store_columns is not None:
        keep = ["doc_id"] + [c for c in store_columns if c in docs.columns]
        docs_store = docs.select(*dict.fromkeys(keep))
    if docs_layout == "copy":
        docs_store.write.mode("overwrite").parquet(docs_path)
    elif adaptive_layout:
        docs_store.repartitionByRange(F.col("doc_id")).sortWithinPartitions(
            "doc_id"
        ).write.mode("overwrite").parquet(docs_path)
    else:
        docs_store.repartitionByRange(num_partitions, "doc_id").sortWithinPartitions(
            "doc_id"
        ).write.mode("overwrite").parquet(docs_path)
    _mark("docs")

    # Term dictionary: df / collection frequency / max tf.  Map-side
    # partial aggregation absorbs head-term skew.
    terms_path = f"{out_dir}/terms"
    terms_agg = postings.groupBy("term").agg(
        F.first("field").alias("field"),
        F.count("*").alias("df"),
        F.sum("tf").alias("cf"),
        F.max("tf").alias("max_tf"),
    )
    # range partitioning (not hash) is load-bearing here: range-disjoint
    # files mean a term-IN dictionary probe touches ONE file's footer on
    # a multi-file dictionary instead of all of them.  The range
    # sampler's re-execution of the aggregate was measured negligible
    # (terms phase unchanged at 0.44 s), so both layouts keep it.
    if adaptive_layout:
        terms_agg = terms_agg.repartitionByRange(F.col("term"))
    else:
        terms_agg = terms_agg.repartitionByRange(
            max(num_partitions // 4, 1), "term"
        )
    (
        terms_agg.sortWithinPartitions("term")
        .write.mode("overwrite")
        .parquet(terms_path)
    )
    terms_df = spark.read.parquet(terms_path)
    _mark("terms")

    # Global stats (single-segment scope): Σ dl per field = Σ tf = Σ cf
    # — aggregated from the (tiny) term dictionary just written, NOT a
    # second scan of the full postings table (fuses a serial barrier
    # out of the build's critical path).
    stats = compute_stats(terms_df, n_docs, text_names)
    # committed id high-water mark: appends assign/validate new ids
    # against THIS (manifest-sourced, atomically committed) value, so a
    # torn append's rows — present in the files but never committed —
    # can neither shift replayed id assignment nor pass the column-mode
    # guard silently; repair() drops rows above it (one tiny agg on the
    # in-memory docs frame)
    mx = docs.agg(F.max("doc_id").alias("m")).first()["m"]
    stats["max_doc_id"] = int(mx) if mx is not None else -1
    _mark("totals")

    if build_blocks:
        from searchlite_spark.index.blocks import build_block_postings

        build_block_postings(
            spark, postings, f"{out_dir}/blocks", block_size=block_size,
            num_partitions=num_partitions,
        )
        _mark("blocks")

    build_secs = time.time() - t0
    manifest = {
        "format_version": 1,
        "schema": schema.to_dict(),
        "stats": stats,
        "block_size": block_size,
        "options": {
            "enable_positions": bool(enable_positions),
            "bm25_k1": float(bm25_k1),
            "bm25_b": float(bm25_b),
        },
        "metrics": {
            "build_secs": round(build_secs, 3),
            "n_docs": int(n_docs),
            "docs_per_sec": round(n_docs / build_secs, 1) if build_secs else None,
            "num_partitions": num_partitions,
            "phase_secs": phases,
        },
        "lineage": {
            "input_snapshot": input_snapshot,
            "built_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
            # unique per build: the cursor generation tag must change on
            # every rebuild, even one landing in the same wall-clock
            # second with the same doc count
            "build_id": uuid.uuid4().hex,
        },
    }
    write_manifest(out_dir, manifest)
    if persisted:
        docs.unpersist()
    return Index(path=out_dir, spark=spark)
