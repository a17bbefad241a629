"""Transactional index writer: buffered adds/deletes, atomic commit,
rollback, crash recovery.

Reference model (searchlite-core/src/api/writer.rs): ``IndexWriter``
appends every add/delete to a WAL *before* buffering it (writer.rs:75-105),
``commit`` folds the pending ops in order — a re-added key replaces the
live document, a delete tombstones it, last op per key wins
(writer.rs:127-150 BTreeMap fold) — writes the survivors as ONE new
segment and stores manifest + WAL commit mark atomically
(writer.rs:196-207); ``rollback`` clears pending ops and truncates the
WAL (writer.rs:241-246); a writer re-opened after a crash recovers the
pending (uncommitted) ops from the WAL (writer.rs:37-72
``last_pending_ops``).

Spark-first re-expression: the WAL is a directory of per-op files under
``<index>/wal/`` — adds are parquet batches written by Spark (the
``_SUCCESS`` marker is the "synced" bit: a torn add op has none and is
discarded on recovery, the same contract as replaying only complete WAL
records), deletes are tiny JSON key lists written atomically
(tmp+rename).  ``commit`` folds the ops DISTRIBUTED — a window over the
op sequence number picks the last add per key, a max-aggregate over the
delete ops drops keys deleted after their last add — then stages the
live-version tombstones (maintenance.stage_tombstone_set) and appends
the folded batch, committing the tombstone pointer and the new docs in
ONE atomic manifest write (append.py ``manifest_extra``).  Nothing here
collects document data to the driver; only the affected internal ids
(bounded by maintenance.MAX_TOMBSTONES) ever leave the cluster.

Isolation: single writer per index, enforced with a pid lock file;
readers see the pre-commit snapshot until the manifest flips, exactly
like the reference's manifest-swap readers.
"""

from __future__ import annotations

import json
import os
import shutil
import warnings
from functools import reduce

from pyspark.sql import DataFrame, SparkSession, functions as F

from searchlite_spark.index.catalog import Index, write_manifest

_WAL_DIR = "wal"
_LOCK = ".writer.lock"


class IndexWriter:
    """Buffered, WAL-backed writer over a key-addressed index.

    The index's ``schema.doc_id_field`` is the document KEY (the
    reference's string _id): re-adding a key replaces the previous
    version on commit, deleting removes it.  Internal dense ``doc_id``s
    are assigned at commit in key order (the reference writes the new
    segment from a key-sorted BTreeMap, writer.rs:169-189).

    Indexes whose key IS the internal id column (``id_mode="column"``
    builds keyed on ``doc_id``) cannot express replace-by-key — use
    ``append_documents(id_mode="column")`` / ``tombstone_delete``
    directly for those.
    """

    def __init__(self, spark: SparkSession, index_path: str):
        self.spark = spark
        self.path = index_path
        index = Index(path=index_path, spark=spark)
        self.schema = index.schema
        if self.schema.doc_id_field == "doc_id":
            raise ValueError(
                "IndexWriter requires a key-addressed index "
                "(doc_id_field != internal 'doc_id'); id-addressed "
                "corpora should use append_documents(id_mode='column') "
                "and tombstone_delete directly"
            )
        self._store_cols = [c for c in index.docs().columns if c != "doc_id"]
        self._wal = os.path.join(index_path, _WAL_DIR)
        os.makedirs(self._wal, exist_ok=True)
        self._acquire_lock()
        # (seq, kind, payload): kind "add" -> parquet dir path,
        # kind "delete" -> list of keys
        self._ops: list[tuple[int, str, object]] = []
        self._recover_pending()

    # ---- lifecycle ----------------------------------------------------

    def _acquire_lock(self) -> None:
        lock = os.path.join(self._wal, _LOCK)
        pid = os.getpid()
        try:
            fd = os.open(lock, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
            with os.fdopen(fd, "w") as f:
                f.write(str(pid))
        except FileExistsError:
            try:
                with open(lock) as f:
                    holder = int(f.read().strip() or "0")
            except (OSError, ValueError):
                holder = 0
            alive = False
            if holder and holder != pid:
                try:
                    os.kill(holder, 0)
                    alive = True
                except (ProcessLookupError, PermissionError):
                    alive = False
            if alive:
                raise RuntimeError(
                    f"another IndexWriter (pid {holder}) holds the "
                    f"writer lock on {self.path}"
                )
            # stale lock (dead pid) or re-open from this process: take over
            with open(lock, "w") as f:
                f.write(str(pid))
        self._lock_path = lock

    def close(self) -> None:
        """Release the writer lock.  Pending (uncommitted) ops STAY in
        the WAL — a new writer recovers them, the reference's
        sync-on-drop contract (writer.rs:249-260)."""
        try:
            os.remove(self._lock_path)
        except OSError:
            pass

    def __enter__(self) -> "IndexWriter":
        return self

    def __exit__(self, *exc) -> None:
        self.close()

    def _recover_pending(self) -> None:
        ops: list[tuple[int, str, object]] = []
        for name in sorted(os.listdir(self._wal)):
            full = os.path.join(self._wal, name)
            if name.endswith(".add.parquet"):
                seq = int(name.split(".", 1)[0])
                if os.path.exists(os.path.join(full, "_SUCCESS")):
                    ops.append((seq, "add", full))
                else:
                    # torn add op: the write never finished syncing —
                    # drop it, like the reference replaying only
                    # complete WAL records
                    warnings.warn(
                        f"IndexWriter: discarding torn add op {name}",
                        RuntimeWarning,
                    )
                    shutil.rmtree(full, ignore_errors=True)
            elif name.endswith(".delete.json"):
                seq = int(name.split(".", 1)[0])
                with open(full) as f:
                    ops.append((seq, "delete", json.load(f)["keys"]))
        ops.sort(key=lambda t: t[0])
        self._ops = ops

    def _next_seq(self) -> int:
        return (max((s for s, _, _ in self._ops), default=-1)) + 1

    # ---- buffered ops --------------------------------------------------

    def add_documents(self, docs: DataFrame) -> int:
        """Buffer a batch of documents; returns the batch row count.

        Validates against the index schema before touching the WAL
        (the reference validates each doc on add, writer.rs:75-78):
        every docstore column must be present, no extras, and the key
        must be unique and non-null WITHIN the batch (rows of one
        unordered DataFrame have no 'last write' — split conflicting
        versions across add_documents calls, where the op order decides).
        """
        key = self.schema.doc_id_field
        have, want = set(docs.columns), set(self._store_cols)
        if have != want:
            missing, extra = sorted(want - have), sorted(have - want)
            raise ValueError(
                f"add_documents: batch columns do not match the index "
                f"schema (missing: {missing}, unknown: {extra})"
            )
        chk = docs.agg(
            F.count("*").alias("n"),
            F.count_distinct(key).alias("nd"),
            F.sum(F.col(key).isNull().cast("long")).alias("nulls"),
        ).first()
        n = int(chk["n"])
        if int(chk["nulls"] or 0) > 0:
            raise ValueError("add_documents: batch has NULL keys")
        if int(chk["nd"]) != n:
            raise ValueError(
                "add_documents: batch contains duplicate keys — later "
                "versions must go in a later add_documents call (op "
                "order defines last-wins)"
            )
        if n == 0:
            return 0
        seq = self._next_seq()
        dest = os.path.join(self._wal, f"{seq:06d}.add.parquet")
        docs.select(*self._store_cols).write.parquet(dest)
        self._ops.append((seq, "add", dest))
        return n

    def add_document(self, doc: dict) -> int:
        """Single-doc convenience (the reference API's unit of work)."""
        from pyspark.sql.types import StructType

        base = Index(path=self.path, spark=self.spark).docs().schema
        fields = [f for f in base.fields if f.name in self._store_cols]
        unknown = sorted(set(doc) - {f.name for f in fields})
        if unknown:
            raise ValueError(f"add_document: unknown fields {unknown}")
        row = tuple(doc.get(f.name) for f in fields)
        df = self.spark.createDataFrame([row], StructType(fields))
        return self.add_documents(df)

    def delete_documents(self, keys: list) -> None:
        """Buffer deletes by document key (WAL-journaled, applied on
        commit; deleting an absent key is a no-op like the reference)."""
        keys = list(keys)
        if not keys:
            return
        if any(k is None for k in keys):
            raise ValueError("delete_documents: NULL key")
        seq = self._next_seq()
        dest = os.path.join(self._wal, f"{seq:06d}.delete.json")
        tmp = dest + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"keys": keys}, f)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, dest)
        self._ops.append((seq, "delete", keys))

    def delete_document(self, key) -> None:
        self.delete_documents([key])

    def pending_ops(self) -> list[dict]:
        """Summaries of the buffered (uncommitted) ops, in order."""
        out = []
        for seq, kind, payload in self._ops:
            if kind == "add":
                out.append({"seq": seq, "op": "add", "path": payload})
            else:
                out.append(
                    {"seq": seq, "op": "delete", "n_keys": len(payload)}
                )
        return out

    # ---- commit / rollback ----------------------------------------------

    def _folded_adds(self, key: str, key_type: str):
        """(folded_adds_df | None, affected_keys_df | None): the last
        add per key minus keys deleted after it, and every key any op
        touched (whose live version must be tombstoned)."""
        add_ops = [(s, p) for s, k, p in self._ops if k == "add"]
        del_ops = [(s, p) for s, k, p in self._ops if k == "delete"]
        latest = None
        affected = None
        if add_ops:
            parts = [
                self.spark.read.parquet(p).withColumn("_wseq", F.lit(s))
                for s, p in add_ops
            ]
            allq = reduce(lambda a, b: a.unionByName(b), parts)
            from pyspark.sql import Window as W

            w = W.partitionBy(key).orderBy(F.col("_wseq").desc())
            latest = (
                allq.withColumn("_rn", F.row_number().over(w))
                .where(F.col("_rn") == 1)
                .drop("_rn")
            )
            affected = allq.select(F.col(key).alias("_k")).distinct()
        if del_ops:
            rows = [(str(k), s) for s, keys in del_ops for k in keys]
            dels = self.spark.createDataFrame(
                rows, "_dkey STRING, _dseq LONG"
            ).select(
                F.col("_dkey").cast(key_type).alias("_dkey"), "_dseq"
            )
            dk = dels.select(F.col("_dkey").alias("_k")).distinct()
            affected = dk if affected is None else affected.unionByName(dk).distinct()
            if latest is not None:
                max_del = dels.groupBy("_dkey").agg(
                    F.max("_dseq").alias("_dseq")
                )
                latest = (
                    latest.join(
                        max_del, latest[key] == max_del["_dkey"], "left"
                    )
                    .where(
                        F.col("_dseq").isNull()
                        | (F.col("_wseq") > F.col("_dseq"))
                    )
                    .drop("_dkey", "_dseq")
                )
        if latest is not None:
            latest = latest.drop("_wseq")
        return latest, affected

    def commit(self) -> Index:
        """Apply the buffered ops atomically; returns a fresh Index
        handle (re-open Searchers to see the new snapshot).

        One manifest write makes tombstoned old versions and their
        replacements visible TOGETHER (writer.rs:196-207's atomic
        manifest store).  Empty pending set is a no-op.  A crash before
        the manifest write leaves the committed snapshot intact and the
        WAL pending — re-open the writer and commit again (staged
        tombstone sets and torn appended files are invisible until the
        pointer flips; run maintenance.repair() before retrying after a
        mid-append crash, the same discipline as append_documents)."""
        from searchlite_spark.index.append import append_documents
        from searchlite_spark.index.maintenance import (
            gc_tombstone_dirs,
            stage_tombstone_set,
            tombstone_delete,
        )

        index = Index(path=self.path, spark=self.spark)
        if not self._ops:
            return index
        key = self.schema.doc_id_field
        docs = index.docs()
        key_type = dict(docs.dtypes)[key]
        folded, affected = self._folded_adds(key, key_type)

        live_ids: list[int] = []
        if affected is not None:
            live_ids = [
                r["doc_id"]
                for r in docs.join(
                    F.broadcast(affected), docs[key] == F.col("_k"), "inner"
                )
                .select("doc_id")
                .collect()
            ]
        n_adds = folded.count() if folded is not None else 0

        if n_adds == 0:
            out = (
                tombstone_delete(self.spark, index, live_ids)
                if live_ids
                else index
            )
        else:
            dirname, total = (None, 0)
            if live_ids:
                dirname, total = stage_tombstone_set(
                    self.spark, index, live_ids
                )
            out = append_documents(
                self.spark,
                index,
                folded,
                id_mode="assign",
                lineage_extra=(
                    {"tombstones": total} if dirname else None
                ),
                manifest_extra=(
                    {"tombstones_dir": dirname} if dirname else None
                ),
            )
            if dirname:
                gc_tombstone_dirs(self.path, keep=dirname)
        self._clear_wal()
        return out

    def rollback(self) -> None:
        """Discard every pending op and truncate the WAL
        (writer.rs:241-246)."""
        self._clear_wal()

    def _clear_wal(self) -> None:
        for name in os.listdir(self._wal):
            if name == _LOCK:
                continue
            full = os.path.join(self._wal, name)
            if os.path.isdir(full):
                shutil.rmtree(full, ignore_errors=True)
            else:
                try:
                    os.remove(full)
                except OSError:
                    pass
        self._ops = []
