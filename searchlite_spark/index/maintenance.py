"""Index maintenance: delete-by-id and compaction as filtered rewrites.

The reference deletes documents through its writer (tombstones applied
at segment merge, searchlite-core/src/api/writer.rs delete paths) and
reclaims space by compaction.  A Spark-first batch index is an
immutable snapshot, so both operations are the SAME primitive: rewrite
the index without the deleted docs and recompute the derived tables —
postings and docs are *filtered* (never re-tokenized: the expensive
analysis work is reused), while the term dictionary, global BM25
statistics (df/avgdl change when docs leave!) and block-max metadata
are recomputed from the filtered postings.  The output is
score-identical to a fresh build over the remaining corpus.

At 100 TB this is an anti-join against a (small, broadcast) tombstone
set plus shuffle-free filtered copies — no tokenization, no
(term, doc_id) re-shuffle (filtering preserves the range-sorted layout
within files).
"""

from __future__ import annotations

import os
import time

from pyspark.sql import SparkSession, functions as F

from searchlite_spark.index.catalog import Index, write_manifest


def delete_by_id(
    spark: SparkSession,
    index_path: str,
    out_path: str,
    doc_ids: list[int],
    num_partitions: int | None = None,
) -> Index:
    """New index at ``out_path`` without ``doc_ids``.

    BM25 parity: df, cf, max_tf, n_docs and float32 avgdl are all
    recomputed, so queries against the result are rank-and-score
    identical to a fresh build over the surviving corpus."""
    return _rewrite(spark, index_path, out_path, list(doc_ids), num_partitions)


def compact(
    spark: SparkSession,
    index_path: str,
    out_path: str,
    num_partitions: int | None = None,
) -> Index:
    """Compaction = the empty delete: rewrites every table (dropping
    dead files / small fragments), repacks the block-max postings, and
    APPLIES any pending tombstones (stats recomputed over survivors —
    the reference's tombstones-at-segment-merge reconciliation)."""
    return _rewrite(spark, index_path, out_path, [], num_partitions)


_VERSIONED_TABLES = ("docs", "postings", "terms", "blocks")


def gc_stale_tables(index_path: str) -> list[str]:
    """Remove table directories the CURRENT manifest does not
    reference: versions superseded by a later in-place compaction, and
    dirs orphaned by a crash between table write and manifest commit.
    Safe by construction — the pointed-to dirs are never touched, and
    anything unreferenced is invisible to every reader that opens the
    index now.  Called at the START of the next compaction, so readers
    still draining the PREVIOUS snapshot keep their files for a whole
    generation (the append-path terms GC is more eager; compaction can
    afford the grace period because its superseded copy is the large
    one)."""
    import os
    import shutil

    manifest = Index(index_path, None).manifest  # manifest read is file-only
    families = _VERSIONED_TABLES + ("tombstones",)
    keep = {manifest.get(f"{t}_dir", t) for t in families}
    removed = []
    for name in os.listdir(index_path):
        base = name.split("_v", 1)[0]
        if base not in families:
            continue
        if name in keep or not os.path.isdir(os.path.join(index_path, name)):
            continue
        shutil.rmtree(os.path.join(index_path, name), ignore_errors=True)
        removed.append(name)
    return removed


def compact_in_place(
    spark: SparkSession,
    index_path: str,
    num_partitions: int | None = None,
) -> Index:
    """Compaction that leaves the index at its own path with ZERO
    reader downtime: tables are rewritten into fresh ``<table>_v<uuid>``
    dirs and one atomic manifest write flips every pointer.  Open
    readers (e.g. the HTTP server's cached Searcher, or another
    process) keep serving the old snapshot from the old dirs; the old
    dirs are reclaimed by the NEXT compaction's gc_stale_tables, by
    which point that snapshot's readers are a full generation stale.
    Disk holds at most two generations between compactions — the price
    of snapshot isolation, same trade the reference makes keeping old
    segments until merge completes."""
    import os
    import shutil
    import uuid as _uuid

    gc_stale_tables(index_path)
    out = _rewrite(
        spark, index_path, index_path, [], num_partitions,
        version=_uuid.uuid4().hex,
    )
    # legacy layout guard: a PLAIN "tombstones" dir (pre-pointer era)
    # was just folded into the rewrite, but has_tombstones() would
    # still see it as live and wrongly re-filter — remove it now.
    # Pointer-era tombstones_v* dirs instead get the one-generation
    # grace period via the next gc_stale_tables (old-snapshot readers
    # need them to keep masking deletes).
    plain = os.path.join(index_path, "tombstones")
    if os.path.isdir(plain):
        shutil.rmtree(plain, ignore_errors=True)
    return out


# hard ceiling on the pending tombstone set: queries stay correct at
# any size (the set is only ever broadcast-anti-joined / cogrouped —
# the broadcast stages ≤ this many longs on the driver once, never a
# per-query closure), but a large fraction of dead rows means
# every query pays scan+filter for documents that can never match —
# the reference's segment model has the same pressure (too many
# tombstones => merge).  Compact to clear.
MAX_TOMBSTONES = 1_000_000


def stage_tombstone_set(
    spark: SparkSession, index: Index, doc_ids: list[int]
) -> tuple[str | None, int]:
    """Write the NEW full tombstone set (existing ∪ ``doc_ids``) to a
    fresh versioned dir ``tombstones_v<uuid>`` under the index path,
    WITHOUT touching the manifest — the staged set stays invisible
    until a caller commits the ``tombstones_dir`` pointer (the
    reference's model exactly: deleted_docs live inside the manifest,
    api/writer.rs:152-162 merge then one atomic manifest store).

    Returns ``(dirname, total)``; ``(None, existing)`` when every id is
    already tombstoned (nothing to commit).  Callers: tombstone_delete
    commits the pointer itself; IndexWriter.commit passes it into the
    SAME atomic manifest write as its document append."""
    ids = sorted({int(i) for i in doc_ids})
    if not ids:
        existing = (
            index.tombstones().select("doc_id").distinct().count()
            if index.has_tombstones()
            else 0
        )
        return None, existing
    new_df = spark.createDataFrame([(i,) for i in ids], "doc_id LONG")
    existing = 0
    full = new_df
    if index.has_tombstones():
        # dedupe against what's already recorded (idempotent retries
        # must not inflate the cap) — one distributed anti-join, no
        # driver roundtrip of the existing set
        tomb = index.tombstones().select("doc_id").distinct()
        existing = tomb.count()
        new_df = new_df.join(tomb, "doc_id", "left_anti")
        full = tomb.unionByName(new_df)
    n_new = new_df.count()
    if existing + n_new > MAX_TOMBSTONES:
        raise ValueError(
            f"tombstone set would exceed {MAX_TOMBSTONES}; run compact() "
            "to fold tombstones into a rewrite first"
        )
    if n_new == 0:
        return None, existing
    import uuid as _uuid

    dirname = f"tombstones_v{_uuid.uuid4().hex}"
    # the full set is rewritten per delete batch — capped at
    # MAX_TOMBSTONES longs (~8 MB), so the copy is trivial and buys
    # single-pointer snapshot reads (no file-list bookkeeping)
    full.coalesce(1).write.parquet(f"{index.path}/{dirname}")
    return dirname, existing + n_new


def expire_snapshots(path: str, keep_last: int = 2) -> list[int]:
    """Prune the snapshot log (Iceberg's ``expire_snapshots``): drop all
    but the newest ``keep_last`` snapshot manifest copies, always
    retaining the CURRENT version's copy.  Returns the expired version
    numbers, oldest first.

    Data-dir lifecycle is deliberately NOT coupled to the log: table
    dirs are reclaimed by the existing generation GC
    (``gc_stale_tables`` at the next compaction; eager ``terms_v*`` /
    ``tombstones_v*`` GC on append/delete commits), so snapshots never
    pin disk — the trade is that a logged snapshot older than one GC
    generation raises :class:`SnapshotExpiredError` on read
    (``list_snapshots`` shows it ``readable=False`` first)."""
    import os
    import re

    keep_last = max(int(keep_last), 1)
    snap_dir = os.path.join(path, "snapshots")
    if not os.path.isdir(snap_dir):
        return []
    current = Index(path, None).manifest.get("version")
    files = []
    for name in sorted(os.listdir(snap_dir)):
        m = re.fullmatch(r"v(\d+)\.json", name)
        if m:
            files.append((int(m.group(1)), name))
    expired = []
    for version, name in files[: max(len(files) - keep_last, 0)]:
        if version == current:
            continue
        try:
            os.remove(os.path.join(snap_dir, name))
            expired.append(version)
        except OSError:
            pass
    return expired


def gc_tombstone_dirs(path: str, keep: str | None) -> None:
    """Post-commit GC of superseded / orphaned tombstone sets (same
    best-effort contract as the terms_v* GC in append_documents:
    in-process readers holding the old snapshot should re-open)."""
    import os
    import shutil

    for name in os.listdir(path):
        stale = (
            name == "tombstones" or name.startswith("tombstones_v")
        ) and name != keep
        if stale:
            shutil.rmtree(os.path.join(path, name), ignore_errors=True)


def tombstone_delete(
    spark: SparkSession, index: Index, doc_ids: list[int]
) -> Index:
    """In-place delete: record ``doc_ids`` as tombstones — NO rewrite.

    The reference's writer marks deletes as tombstones applied lazily at
    segment merge (api/writer.rs delete paths); until then, readers
    filter tombstoned docs but score with the SEGMENT'S ORIGINAL df /
    avgdl.  Same contract here: searches never return tombstoned docs,
    but BM25 statistics stay those of the last build/compact — run
    ``compact`` to reconcile stats and reclaim space.  Cost: one tiny
    versioned parquet write, independent of corpus size.

    Bumps the manifest build_id so open cursors go stale."""
    import uuid as _uuid

    index = Index(path=index.path, spark=spark)  # fresh manifest view
    dirname, total = stage_tombstone_set(spark, index, doc_ids)
    if dirname is None:
        return Index(path=index.path, spark=spark)
    manifest = dict(index.manifest)
    manifest["tombstones_dir"] = dirname
    lineage = dict(manifest.get("lineage") or {})
    lineage["build_id"] = _uuid.uuid4().hex
    lineage["tombstones"] = total
    manifest["lineage"] = lineage
    write_manifest(index.path, manifest)
    gc_tombstone_dirs(index.path, keep=dirname)
    return Index(path=index.path, spark=spark)


def repair(
    spark: SparkSession,
    index_path: str,
    out_path: str,
    num_partitions: int | None = None,
) -> Index:
    """Recover from a torn append (append.py crash-window note: a
    failed append can leave postings/docstore rows whose manifest never
    committed).

    Three cleanups on top of compact's rewrite:

    1. rows ABOVE the manifest's committed ``stats.max_doc_id``
       high-water mark are dropped from postings and docs — appends
       assign monotonically increasing ids and commit the mark in the
       manifest LAST, so anything above it is by definition an
       uncommitted torn batch;
    2. orphan postings whose doc never landed (legacy/partial windows
       the high-water mark can't see, e.g. manifests predating the
       mark) are dropped via a broadcast anti-join;
    3. byte-identical duplicate-id rows (a torn ASSIGN-mode batch that
       was re-appended without repairing first rewrites the same ids)
       are deduplicated — detected first with one slim aggregate so the
       common clean case never pays the dropDuplicates shuffle.

    The output equals a fresh build over the documents that fully
    committed."""
    return _rewrite(
        spark, index_path, out_path, [], num_partitions,
        drop_orphan_postings=True, drop_uncommitted=True,
    )


def _rewrite(
    spark: SparkSession,
    index_path: str,
    out_path: str,
    doc_ids: list[int],
    num_partitions: int | None,
    drop_orphan_postings: bool = False,
    drop_uncommitted: bool = False,
    version: str | None = None,
) -> Index:
    """version=None: plain table names (docs/postings/terms/blocks) —
    the out-of-place rewrite.  version=<uuid>: every table lands in
    ``<table>_v<uuid>`` and the manifest records the pointers, which
    makes ``out_path == index_path`` safe (in-place compaction): the
    source snapshot's directories are untouched, and the atomic
    manifest write is the only visibility flip — the same contract the
    versioned term dictionary has had since the append path."""
    t0 = time.time()
    src = Index(index_path, spark)
    manifest = dict(src.manifest)
    if version is None and os.path.abspath(out_path) == os.path.abspath(index_path):
        raise ValueError(
            "in-place rewrite requires versioned table dirs "
            "(use compact_in_place / pass version=)"
        )
    suffix = f"_v{version}" if version else ""
    tdir = {t: f"{t}{suffix}" for t in ("docs", "postings", "terms", "blocks")}
    if num_partitions is None:
        num_partitions = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))

    postings = src.postings()
    docs = src.docs()
    if drop_uncommitted:
        committed_max = manifest.get("stats", {}).get("max_doc_id")
        if committed_max is not None:
            # torn-batch rows sit above the committed high-water mark —
            # a per-file filter, no shuffle
            postings = postings.where(F.col("doc_id") <= int(committed_max))
            docs = docs.where(F.col("doc_id") <= int(committed_max))
        dup = (
            docs.groupBy("doc_id").count().where(F.col("count") > 1).limit(1)
        ).count()
        if dup:
            # same-id duplicates are byte-identical replays (append.py
            # crash note), so FULL-ROW dedup removes exactly the replay
            # copies; the shuffle runs only when detected
            docs = docs.dropDuplicates()
            postings = postings.dropDuplicates()
    dead = spark.createDataFrame(
        [(int(i),) for i in doc_ids] or [], "doc_id LONG"
    )
    if src.has_tombstones():
        # fold pending tombstones into the rewrite (the reference's
        # apply-at-merge) — the output is tombstone-free
        dead = dead.unionByName(src.tombstones().select("doc_id"))
    if doc_ids or src.has_tombstones():
        ids_df = F.broadcast(dead.distinct())
        postings = postings.join(ids_df, "doc_id", "left_anti")
        docs = docs.join(ids_df, "doc_id", "left_anti")
    if drop_orphan_postings:
        # torn-append recovery: drop postings whose document never
        # committed.  The orphan id set is tiny by construction (at most
        # one torn batch), so compute it first and broadcast the
        # anti-join — a direct semi-join against the full docstore would
        # shuffle-sort the postings and destroy the per-file
        # (term, doc_id) layout the no-shuffle copy below relies on.
        orphans = F.broadcast(
            postings.select("doc_id")
            .distinct()
            .join(docs.select("doc_id"), "doc_id", "left_anti")
        )
        postings = postings.join(orphans, "doc_id", "left_anti")

    # filtered copies: no shuffle — per-file filters preserve the
    # (term, doc_id) / doc_id sorted layout
    postings.write.mode("overwrite").parquet(f"{out_path}/{tdir['postings']}")
    docs.write.mode("overwrite").parquet(f"{out_path}/{tdir['docs']}")
    new_postings = spark.read.parquet(f"{out_path}/{tdir['postings']}")
    new_docs = spark.read.parquet(f"{out_path}/{tdir['docs']}")

    (
        new_postings.groupBy("term")
        .agg(
            F.first("field").alias("field"),
            F.count("*").alias("df"),
            F.sum("tf").alias("cf"),
            F.max("tf").alias("max_tf"),
        )
        .repartitionByRange(max(num_partitions // 4, 1), "term")
        .sortWithinPartitions("term")
        .write.mode("overwrite")
        .parquet(f"{out_path}/{tdir['terms']}")
    )
    terms_df = spark.read.parquet(f"{out_path}/{tdir['terms']}")

    agg = new_docs.agg(
        F.count("*").alias("n"), F.max("doc_id").alias("mx")
    ).first()
    n_docs = int(agg["n"])
    text_names = [t["name"] for t in manifest["schema"]["text_fields"]]
    from searchlite_spark.index.build import compute_stats

    stats = compute_stats(terms_df, n_docs, text_names)
    stats["max_doc_id"] = int(agg["mx"]) if agg["mx"] is not None else -1

    if src.has_blocks():
        from searchlite_spark.index.blocks import build_block_postings

        build_block_postings(
            spark,
            new_postings,
            f"{out_path}/{tdir['blocks']}",
            block_size=int(manifest.get("block_size", 128)),
            num_partitions=num_partitions,
        )

    import uuid as _uuid

    manifest["stats"] = stats
    # point every table at the freshly-written version (plain names
    # when version is None — the catalog defaults make that a no-op
    # for pre-pointer manifests)
    for t, d in tdir.items():
        manifest[f"{t}_dir"] = d
    # tombstones were folded into the rewrite — the output has none
    manifest.pop("tombstones_dir", None)
    manifest.setdefault("lineage", {})
    lineage = dict(
        manifest["lineage"],
        compacted_from=index_path,
        deleted_ids=len(doc_ids),
        rewritten_at=time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        # the rewrite IS a new generation: docs and stats changed, so
        # cursors minted against the source must go stale
        build_id=_uuid.uuid4().hex,
    )
    # the output is tombstone-free; don't carry the stale counter
    lineage.pop("tombstones", None)
    manifest["lineage"] = lineage
    manifest.setdefault("metrics", {})["rewrite_secs"] = round(time.time() - t0, 3)
    write_manifest(out_path, manifest)
    return Index(path=out_path, spark=spark)


def verify_text_invariant(
    index: Index,
    source: "DataFrame",  # noqa: F821 — pyspark DataFrame
    key_col: str = "url",
    text_col: str = "text",
    sample: float | None = None,
) -> dict:
    """Enforce the per-row invariant: the docstore's extracted ``text``
    is byte-identical to the source lake's, per ``key_col``.

    One distributed pass: inner-join docstore to source on the key and
    compare xxhash64 of the text bytes (no text ever reaches the
    driver); also counts keys on either side without a partner.
    ``sample`` (0..1] verifies a deterministic hash-based subset — at
    10^12 rows a 1% sample per build is the practical cadence, with
    full sweeps on demand.

    Returns {"checked", "mismatched", "missing_in_index",
    "missing_in_source"}; raises ValueError when any text differs.
    """
    docs = index.docs().select(
        F.col(key_col), F.xxhash64(F.col(text_col)).alias("_h_idx")
    )
    src = source.select(
        F.col(key_col), F.xxhash64(F.col(text_col)).alias("_h_src")
    )
    if sample is not None:
        if not (0.0 < sample <= 1.0):
            raise ValueError("sample must be in (0, 1]")
        # deterministic draw both sides agree on: hash of the key
        pred = (
            F.pmod(F.xxhash64(F.col(key_col)), F.lit(1_000_000)) 
            < F.lit(int(sample * 1_000_000))
        )
        docs, src = docs.where(pred), src.where(pred)
    joined = docs.join(src, key_col, "full_outer")
    row = joined.agg(
        F.count("*").alias("total"),
        F.sum(
            (F.col("_h_idx").isNotNull() & F.col("_h_src").isNotNull()
             & (F.col("_h_idx") != F.col("_h_src"))).cast("long")
        ).alias("mismatched"),
        F.sum(F.col("_h_idx").isNull().cast("long")).alias("missing_in_index"),
        F.sum(F.col("_h_src").isNull().cast("long")).alias("missing_in_source"),
    ).collect()[0]
    out = {
        "checked": int(row["total"]),
        "mismatched": int(row["mismatched"] or 0),
        "missing_in_index": int(row["missing_in_index"] or 0),
        "missing_in_source": int(row["missing_in_source"] or 0),
    }
    if out["mismatched"]:
        raise ValueError(
            f"text invariant violated: {out['mismatched']} of "
            f"{out['checked']} rows have text differing from the source "
            f"(per-{key_col} byte identity)"
        )
    return out
