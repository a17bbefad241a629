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
    reference's atomic_write (searchlite-core/src/storage/mod.rs:104-117)."""
    os.makedirs(path, exist_ok=True)
    tmp = os.path.join(path, f".manifest.{os.getpid()}.{time.time_ns()}.tmp")
    with open(tmp, "w") as f:
        json.dump(manifest, f, indent=2, default=str)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, os.path.join(path, "manifest.json"))
