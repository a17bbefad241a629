"""Incremental append: new documents become new index *files*, not a
rebuild.

Reference model: the writer buffers adds in a WAL and commits them as a
NEW SEGMENT, visible atomically on commit (searchlite-core/src/api/
writer.rs:106-239); readers merge segment statistics at query time.
Spark-first re-expression: the postings / docs / blocks tables are
directories of immutable parquet files, so a commit is an
**Iceberg-style file append** —

* tokenize ONLY the new batch (cost ∝ batch size);
* shuffle the batch's postings with the same hash(term, doc-chunk)
  layout and ``mode("append")`` them next to the existing files —
  query-time term seeks prune row groups per file, so old and new
  postings coexist without any rewrite;
* pack block-max blocks for the batch only and append them
  (the query kernel re-sorts blocks by (term, block_id); the batch's
  doc ids are strictly greater than every existing id, so the new
  blocks are disjoint doc ranges of the same terms);
* the term dictionary and global stats are the one part that must
  MERGE (df/cf/max_tf are per-term totals): old ∪ batch-delta is
  re-aggregated and atomically swapped in.  Cost ∝ |vocabulary|, which
  is sublinear in corpus size — the reference pays the same merge in
  its reader's multi-segment stat union.

BM25 parity with a full rebuild: df, cf, max_tf, n_docs and the
float32 avgdl are recomputed over old+new, so scores are identical to
re-indexing the concatenated corpus (the pytest contract).  Appends
bump the manifest ``build_id``, so open cursors correctly go stale.

Crash semantics (the manifest is the commit point, written LAST in one
atomic rename):

* the term dictionary is VERSIONED through the manifest
  (``terms_v<uuid>`` + ``terms_dir`` pointer committed together), so a
  reader can never observe a missing or half-merged dictionary;
* id assignment and the column-mode id guard use the manifest's
  committed ``stats.max_doc_id`` high-water mark, NOT a docstore scan
  — a torn append's rows (files written, manifest not) cannot shift a
  replayed batch's ids, so a replay rewrites the SAME ids instead of
  minting silent same-content-new-id duplicates;
* ``maintenance.repair()`` drops every row above the committed
  high-water mark (plus orphan postings and, as a belt-and-braces net,
  byte-identical duplicate-id rows), restoring exactly the committed
  state — run it before re-appending after a mid-append crash, the
  same torn-commit discipline as any file-append lake writer.
"""

from __future__ import annotations

import os
import shutil
import time
import uuid

from pyspark.sql import DataFrame, SparkSession, functions as F

from searchlite_spark.index.build import assign_doc_ids, tokenize_postings_best
from searchlite_spark.index.catalog import Index, write_manifest


def append_documents(
    spark: SparkSession,
    index: Index,
    corpus: DataFrame,
    num_partitions: int | None = None,
    id_mode: str = "assign",
    lineage_extra: dict | None = None,
    manifest_extra: dict | None = None,
) -> Index:
    """Append ``corpus`` to ``index`` in place; returns a fresh Index
    handle (re-open Searchers to see the new snapshot).

    id_mode="assign": new dense ids continue after the current max id,
    ordered by the batch's doc-key order.  id_mode="column": the key
    column is the BIGINT id; every batch id must exceed the current max
    (checked — overlapping ids would corrupt postings merges).
    lineage_extra: merged into the manifest lineage in the SAME atomic
    write as the stats — callers (streaming) use it to record a commit
    tag that cannot be separated from the commit itself.
    manifest_extra: merged into the manifest TOP LEVEL in that same
    atomic write — IndexWriter.commit uses it to flip the
    ``tombstones_dir`` pointer together with the append, so upsert
    deletes and their replacement docs become visible in one commit
    (the reference's single manifest store, api/writer.rs:196-207)."""
    from pyspark import StorageLevel

    t0 = time.time()
    # re-open the index from disk: Index caches its manifest per handle,
    # and appending twice through one stale handle would compute
    # n_docs/avgdl from pre-first-append stats
    index = Index(path=index.path, spark=spark)
    schema = index.schema
    manifest = dict(index.manifest)
    path = index.path
    if num_partitions is None:
        num_partitions = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))

    # committed high-water mark from the MANIFEST (not a docstore scan):
    # correct under torn appends (uncommitted rows in the files must not
    # shift replayed id assignment) and free at any corpus size.  Legacy
    # manifests without the field fall back to the scan once; the append
    # then records it.
    old_max = manifest.get("stats", {}).get("max_doc_id")
    if old_max is None:
        old_max = index.docs().agg(F.max("doc_id").alias("m")).first()["m"]
        old_max = -1 if old_max is None else int(old_max)
    old_max = int(old_max)

    if id_mode == "column":
        docs = corpus
        if "doc_id" not in corpus.columns:
            docs = docs.withColumn(
                "doc_id", F.col(schema.doc_id_field).cast("long")
            )
        # one aggregate validates the whole batch: no id at/below the
        # current max, no NULLs (failed casts), no duplicates — any of
        # these would silently corrupt postings merges
        chk = docs.agg(
            F.count("*").alias("n"),
            F.count_distinct("doc_id").alias("nd"),
            F.sum(F.col("doc_id").isNull().cast("long")).alias("nulls"),
            F.min("doc_id").alias("mn"),
            F.max("doc_id").alias("mx"),
        ).first()
        if int(chk["nulls"] or 0) > 0:
            raise ValueError(
                "append_documents(id_mode='column'): batch has NULL "
                "doc_id (non-castable key values)"
            )
        if chk["mn"] is not None and int(chk["mn"]) <= old_max:
            raise ValueError(
                f"append_documents(id_mode='column'): batch contains "
                f"doc_id <= current max ({old_max}); ids must be new"
            )
        if int(chk["nd"]) != int(chk["n"]):
            raise ValueError(
                "append_documents(id_mode='column'): batch contains "
                "duplicate doc_ids"
            )
        n_new = int(chk["n"])
        new_max = int(chk["mx"]) if chk["mx"] is not None else old_max
    else:
        docs = assign_doc_ids(corpus, schema.doc_id_field, num_partitions)
        docs = docs.withColumn("doc_id", F.col("doc_id") + F.lit(old_max + 1))
        n_new = docs.count()
        new_max = old_max + n_new  # dense assignment
    if n_new == 0:
        return Index(path=path, spark=spark)

    # ---- batch postings: same hash(term, doc-chunk) layout; the
    # positions option comes from the MANIFEST so appends to an
    # enable_positions=false index stay positionless (the reference
    # threads writer options from the shared IndexOptions the same way,
    # api/writer.rs:172) ----
    enable_positions = bool(
        manifest.get("options", {}).get("enable_positions", True)
    )
    postings_flat, _ = tokenize_postings_best(
        docs, schema, positions=enable_positions
    )
    chunk_w = max(n_new // num_partitions, 1)
    salt = (F.col("doc_id") / F.lit(int(chunk_w))).cast("long")
    batch_postings = postings_flat.repartition(
        num_partitions, F.col("term"), salt
    ).sortWithinPartitions("term", "doc_id")
    # reused by three consumers (postings write, term deltas, blocks) —
    # serialized disk cache, same rationale as the full build
    batch_postings = batch_postings.persist(StorageLevel.DISK_ONLY)
    try:
        batch_postings.write.mode("append").parquet(
            f"{path}/{index.table_dir('postings')}"
        )

        # ---- docstore append (schema-aligned with the existing files;
        # range-clustered by doc_id like the base build, so the
        # appended files keep tight row-group min/max for id fetches) ----
        store_cols = index.docs().columns
        docs.select(*store_cols).repartitionByRange(
            max(num_partitions // 4, 1), "doc_id"
        ).sortWithinPartitions("doc_id").write.mode("append").parquet(
            f"{path}/{index.table_dir('docs')}"
        )

        # ---- term dictionary merge (cost ∝ vocabulary) ----
        delta = batch_postings.groupBy("term").agg(
            F.first("field").alias("field"),
            F.count("*").alias("df"),
            F.sum("tf").alias("cf"),
            F.max("tf").alias("max_tf"),
        )
        merged = (
            index.terms()
            .unionByName(delta)
            .groupBy("term")
            .agg(
                F.first("field").alias("field"),
                F.sum("df").alias("df"),
                F.sum("cf").alias("cf"),
                F.max("max_tf").alias("max_tf"),
            )
            .repartitionByRange(max(num_partitions // 4, 1), "term")
            .sortWithinPartitions("term")
        )
        # versioned dictionary: the new version becomes visible only
        # through the manifest pointer committed below — no rmtree
        # window where an index has no terms table
        commit_id = uuid.uuid4().hex
        new_terms_dir = f"terms_v{commit_id}"
        merged.write.mode("overwrite").parquet(f"{path}/{new_terms_dir}")
        terms_df = spark.read.parquet(f"{path}/{new_terms_dir}")

        # ---- blocks for the batch only ----
        if index.has_blocks():
            from searchlite_spark.index.blocks import BLOCK_SCHEMA, pack_partition

            block_size = int(manifest.get("block_size", 128))
            batch_postings.select("term", "doc_id", "tf", "dl").mapInPandas(
                lambda it: pack_partition(it, block_size), BLOCK_SCHEMA
            ).write.mode("append").parquet(
                f"{path}/{index.table_dir('blocks')}"
            )
    finally:
        batch_postings.unpersist()

    # ---- stats + manifest (written last) ----
    from searchlite_spark.index.build import compute_stats

    n_docs = int(manifest["stats"]["n_docs"]) + int(n_new)
    manifest["stats"] = compute_stats(terms_df, n_docs, schema.text_field_names)
    manifest["stats"]["max_doc_id"] = int(new_max)
    manifest["terms_dir"] = new_terms_dir
    lineage = dict(manifest.get("lineage") or {})
    lineage["build_id"] = commit_id
    lineage.setdefault("appends", []).append(
        {
            "n_docs": int(n_new),
            "at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
            "secs": round(time.time() - t0, 3),
        }
    )
    if lineage_extra:
        lineage.update(lineage_extra)
    manifest["lineage"] = lineage
    if manifest_extra:
        manifest.update(manifest_extra)
    write_manifest(path, manifest)
    # GC: the superseded dictionary version (and any version orphaned by
    # an earlier crash between commit and cleanup).  Post-commit and
    # best-effort — a crash here only leaves an unreferenced dir that
    # the next append removes.  In-process readers holding the OLD
    # snapshot should re-open (same contract as the previous
    # rmtree+rename swap, minus its missing-table window).
    for name in os.listdir(path):
        stale = (
            name == "terms" and new_terms_dir != "terms"
        ) or (name.startswith("terms_v") and name != new_terms_dir)
        if stale:
            shutil.rmtree(os.path.join(path, name), ignore_errors=True)
    return Index(path=path, spark=spark)


def upsert_documents(
    spark: SparkSession,
    index: Index,
    corpus: DataFrame,
    num_partitions: int | None = None,
) -> Index:
    """Replace-or-add by doc KEY (``schema.doc_id_field``) — the
    reference writer's upsert: a re-added key replaces the previous
    document, visible on commit (api/writer.rs:106-239 BTreeMap commit
    order).  Spark-first: tombstone the current internal ids whose key
    appears in the batch (one broadcast semi-join + a tiny parquet
    append, maintenance.tombstone_delete), then ``append_documents``
    the batch with FRESH ids after the current max.

    Until ``compact``, BM25 stats include both the dead and the live
    version (tombstone contract — stats reconcile at merge); searches
    only ever see the live one.  Cost ∝ batch size."""
    index = Index(path=index.path, spark=spark)  # fresh manifest view
    key = index.schema.doc_id_field
    docs = index.docs()
    if key not in docs.columns:
        raise ValueError(
            f"upsert_documents: key column {key!r} is not stored in the "
            "docstore"
        )
    # a batch with the same key twice has no defined "last write" in an
    # unordered DataFrame — reject instead of silently keeping both
    # (the reference's BTreeMap keeps the last *inserted*, an order a
    # DataFrame cannot express)
    kc = corpus.agg(
        F.count("*").alias("n"), F.count_distinct(key).alias("nd")
    ).first()
    if int(kc["n"]) != int(kc["nd"]):
        raise ValueError(
            "upsert_documents: batch contains duplicate keys — "
            "pre-deduplicate to one row per key (no row order exists to "
            "pick a 'last' version)"
        )
    batch_keys = corpus.select(F.col(key).alias("_k")).distinct()
    existing = [
        r["doc_id"]
        for r in docs.join(
            F.broadcast(batch_keys), F.col(key) == F.col("_k"), "inner"
        )
        .select("doc_id")
        .collect()
    ]
    idx = index
    if existing:
        from searchlite_spark.index.maintenance import tombstone_delete

        idx = tombstone_delete(spark, index, existing)
    return append_documents(
        spark, idx, corpus, num_partitions=num_partitions, id_mode="assign"
    )
