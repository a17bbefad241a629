"""Index layout on storage + reader handles.

An index is a directory of Parquet tables plus a JSON manifest —
functionally the reference's ``manifest + immutable segments``
(searchlite-core/src/index/manifest.rs:14-35) re-expressed as a lake
layout.  Single-"segment" semantics: all BM25 statistics are global
(the parity target — see SURVEY.md §1.5).

    <dir>/
      manifest.json        schema, stats, build metrics, lineage
      docs/                corpus + doc_id + per-field token lengths
      postings/            (term, doc_id, tf, positions)  range-sorted by (term, doc_id)
      terms/               (term, df, cf, max_tf)         the term dictionary
      blocks/              (term, block_id, max_doc_id, max_tf, n, doc_ids, tfs)
                           block-packed postings with block-max metadata for WAND
      checkpoints/         per-partition build lineage markers (resume)

On a real cluster these would be Iceberg tables (atomic snapshot
commit); plain Parquet directories + an atomically-renamed manifest
give the same semantics in this sandbox.
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass
class Index:
    path: str
    spark: SparkSession

    @property
    def manifest(self) -> dict:
        if not hasattr(self, "_manifest"):
            with open(os.path.join(self.path, "manifest.json")) as f:
                self._manifest = json.load(f)
        return self._manifest

    @property
    def schema(self):
        from searchlite_spark.index.schema import IndexSchema

        return IndexSchema.from_dict(self.manifest["schema"])

    @property
    def stats(self) -> dict:
        """Global stats: {"n_docs": N, "avgdl": {field: float},
        "total_tokens": {field: int}} — single-segment scope."""
        return self.manifest["stats"]

    @property
    def options(self) -> dict:
        """Index-level build options (the reference's IndexOptions,
        api/types.rs:15-24).  Pre-option manifests imply the defaults."""
        return {
            "enable_positions": True,
            "bm25_k1": 0.9,
            "bm25_b": 0.4,
            **self.manifest.get("options", {}),
        }

    def table_dir(self, name: str) -> str:
        """Relative directory of a table, resolved through the
        manifest's versioned pointer (``<name>_dir``) when present.
        Every table is versioned the way the term dictionary has been
        since round 6 (``terms_v<uuid>``): a rewrite lands in fresh
        ``<table>_v<uuid>`` dirs and ONE atomic manifest write flips
        all pointers — readers holding the old manifest keep reading
        the old dirs (true snapshot isolation), and in-place compaction
        never breaks an in-flight query the way a rename-swap of the
        index directory would (the old snapshot's file listings
        survive untouched until the NEXT compaction GCs them)."""
        return self.manifest.get(f"{name}_dir", name)

    def docs(self) -> DataFrame:
        return self.spark.read.parquet(
            os.path.join(self.path, self.table_dir("docs"))
        )

    def postings(self) -> DataFrame:
        return self.spark.read.parquet(
            os.path.join(self.path, self.table_dir("postings"))
        )

    def terms(self) -> DataFrame:
        # the term dictionary was the FIRST versioned table (appends
        # must rewrite it wholesale); table_dir generalizes the pattern
        return self.spark.read.parquet(
            os.path.join(self.path, self.table_dir("terms"))
        )

    def blocks(self) -> DataFrame:
        return self.spark.read.parquet(
            os.path.join(self.path, self.table_dir("blocks"))
        )

    def has_blocks(self) -> bool:
        return os.path.isdir(os.path.join(self.path, self.table_dir("blocks")))

    def tombstones(self) -> DataFrame:
        # like the term dictionary, the tombstone set is versioned
        # through the manifest (the reference keeps deleted_docs INSIDE
        # the manifest's segment metas, manifest.rs SegmentMeta): a
        # delete writes a fresh full set to tombstones_v<uuid> and the
        # pointer commits in one atomic manifest write, so readers see
        # deletes-with-their-adds or neither — an orphan set from a
        # crashed writer commit is invisible.  Legacy layout (plain
        # "tombstones" dir, no pointer) stays readable.
        d = self.manifest.get("tombstones_dir")
        if d:
            return self.spark.read.parquet(os.path.join(self.path, d))
        return self.spark.read.parquet(os.path.join(self.path, "tombstones"))

    def has_tombstones(self) -> bool:
        if self.manifest.get("tombstones_dir"):
            return True
        return os.path.isdir(os.path.join(self.path, "tombstones"))


def write_manifest(path: str, manifest: dict) -> None:
    """Atomic manifest commit (write + rename), mirroring the
    reference's atomic_write (searchlite-core/src/storage/mod.rs:104-117).

    Every commit is also a SNAPSHOT: the manifest gets a monotonically
    increasing ``version`` (previous committed version + 1) and an
    immutable copy lands in ``snapshots/v<version>.json`` AFTER the
    current pointer flips — a crash between the two leaves the commit
    fully readable as current, merely not time-travelable (the
    snapshot log is an add-on, never the source of truth).  This is
    the Iceberg snapshot-log model re-expressed over the existing
    versioned-table-pointer layout: because rewrites land in fresh
    ``<table>_v<uuid>`` dirs and old dirs survive until the next GC
    generation, a retained snapshot manifest keeps resolving to real
    files for a full generation (see ``Index.at_version`` /
    ``maintenance.expire_snapshots``)."""
    os.makedirs(path, exist_ok=True)
    prev = 0
    cur = os.path.join(path, "manifest.json")
    if os.path.exists(cur):
        try:
            with open(cur) as f:
                prev = int(json.load(f).get("version", 0))
        except (OSError, ValueError):
            prev = 0
    manifest["version"] = prev + 1
    manifest["committed_at_ms"] = time.time_ns() // 1_000_000
    body = json.dumps(manifest, indent=2, default=str)
    tmp = os.path.join(path, f".manifest.{os.getpid()}.{time.time_ns()}.tmp")
    with open(tmp, "w") as f:
        f.write(body)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, cur)
    # best-effort snapshot copy (same bytes, atomic rename) — current
    # readers never depend on it
    try:
        snap_dir = os.path.join(path, "snapshots")
        os.makedirs(snap_dir, exist_ok=True)
        stmp = os.path.join(
            snap_dir, f".v{manifest['version']}.{time.time_ns()}.tmp"
        )
        with open(stmp, "w") as f:
            f.write(body)
        os.replace(stmp, _snapshot_file(path, manifest["version"]))
    except OSError:
        pass


def _snapshot_file(path: str, version: int) -> str:
    return os.path.join(path, "snapshots", f"v{int(version):08d}.json")


class SnapshotExpiredError(RuntimeError):
    """Raised when a time-travel read targets a snapshot whose manifest
    copy or referenced table directories have been garbage-collected
    (by a later compaction's ``gc_stale_tables``, the append/delete
    paths' eager ``terms_v*``/``tombstones_v*`` GC, or
    ``expire_snapshots``)."""


def load_snapshot(path: str, spark: SparkSession, version: int) -> Index:
    """Open an index AS OF a committed snapshot (Iceberg-style time
    travel).  The returned ``Index`` reads every table through the
    snapshot manifest's versioned pointers, so searches over it are
    byte-for-byte the results that snapshot served when it was current
    — deletes, appends, and compactions committed later are invisible.

    Raises :class:`SnapshotExpiredError` when the snapshot's manifest
    copy is gone or any table dir it references was reclaimed; the
    durability window is one GC generation (document-table rewrites
    survive until the NEXT ``compact_in_place``; superseded
    ``terms_v*`` / ``tombstones_v*`` sets are reclaimed eagerly at the
    next append/delete commit)."""
    sf = _snapshot_file(path, version)
    if not os.path.exists(sf):
        raise SnapshotExpiredError(
            f"snapshot v{version} of {path}: no manifest copy at {sf} "
            "(expired, or committed before the snapshot log existed)"
        )
    with open(sf) as f:
        manifest = json.load(f)
    reason = _snapshot_expiry_reason(path, manifest)
    if reason:
        raise SnapshotExpiredError(f"snapshot v{version} of {path}: {reason}")
    idx = Index(path=path, spark=spark)
    idx._manifest = manifest
    return idx


def _snapshot_expiry_reason(path: str, manifest: dict) -> str | None:
    """Why a snapshot manifest can no longer serve exact-as-of reads:

    1. a referenced table dir was garbage-collected, or
    2. a LATER commit appended IN PLACE into a docs/postings dir this
       snapshot references (appends add parquet files to the live dirs
       rather than copy-on-write — the right call at scale, but it
       means the files under an old snapshot's pointers are no longer
       that snapshot's bytes; detected by any later logged manifest —
       or the current one — sharing a dir with a different doc
       high-water mark).  ``expire_snapshots`` only ever drops a PREFIX
       of the log, so every commit later than a retained snapshot is
       itself visible to this scan."""
    missing = _missing_snapshot_dirs(path, manifest)
    if missing:
        return (
            f"table dirs {missing} were garbage-collected by a later "
            "commit; only snapshots within one GC generation are readable"
        )
    version = int(manifest.get("version", 0))
    mine = {
        t: manifest.get(f"{t}_dir", t) for t in ("docs", "postings")
    }
    my_mark = (manifest.get("stats") or {}).get("max_doc_id")
    laters = []
    try:
        with open(os.path.join(path, "manifest.json")) as f:
            laters.append(json.load(f))
    except (OSError, ValueError):
        pass
    snap_dir = os.path.join(path, "snapshots")
    if os.path.isdir(snap_dir):
        for name in sorted(os.listdir(snap_dir)):
            if name.startswith("v") and name.endswith(".json"):
                try:
                    with open(os.path.join(snap_dir, name)) as f:
                        laters.append(json.load(f))
                except (OSError, ValueError):
                    continue
    for m2 in laters:
        if int(m2.get("version", 0)) <= version:
            continue
        mark2 = (m2.get("stats") or {}).get("max_doc_id")
        for t, d in mine.items():
            if m2.get(f"{t}_dir", t) == d and mark2 != my_mark:
                return (
                    f"a later commit (v{m2.get('version')}) appended in "
                    f"place into this snapshot's {t} dir ({d}); in-place "
                    "appends invalidate earlier snapshots"
                )
    return None


def _missing_snapshot_dirs(path: str, manifest: dict) -> list[str]:
    """Table dirs a snapshot manifest resolves to that no longer exist.
    ``docs``/``postings``/``terms`` are load-bearing for every search;
    a dangling ``tombstones_dir`` would silently RESURRECT deleted docs,
    so it is load-bearing too.  ``blocks`` is an optional accelerator —
    ``has_blocks`` already degrades to brute/WAND when absent."""
    required = ["docs", "postings", "terms"]
    dirs = [manifest.get(f"{t}_dir", t) for t in required]
    tomb = manifest.get("tombstones_dir")
    if tomb:
        dirs.append(tomb)
    return [d for d in dirs if not os.path.isdir(os.path.join(path, d))]


def list_snapshots(path: str) -> list[dict]:
    """The snapshot log, oldest first: one row per retained committed
    version — ``{version, committed_at_ms, n_docs, current, readable}``.
    ``readable`` reflects whether every table dir the snapshot
    references still exists (time travel will succeed)."""
    snap_dir = os.path.join(path, "snapshots")
    current = None
    try:
        with open(os.path.join(path, "manifest.json")) as f:
            current = int(json.load(f).get("version", 0))
    except (OSError, ValueError):
        pass
    out = []
    if os.path.isdir(snap_dir):
        for name in sorted(os.listdir(snap_dir)):
            if not (name.startswith("v") and name.endswith(".json")):
                continue
            try:
                with open(os.path.join(snap_dir, name)) as f:
                    m = json.load(f)
            except (OSError, ValueError):
                continue
            readable = _snapshot_expiry_reason(path, m) is None
            out.append(
                {
                    "version": int(m.get("version", 0)),
                    "committed_at_ms": m.get("committed_at_ms"),
                    "n_docs": (m.get("stats") or {}).get("n_docs"),
                    "current": int(m.get("version", 0)) == current,
                    "readable": readable,
                }
            )
    return out
