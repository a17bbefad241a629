"""Snapshot time travel (Iceberg snapshot-log model over the versioned
table pointers): every manifest commit is a numbered snapshot; reads AS
OF an old version serve exactly what that snapshot served when current;
expired snapshots fail loudly, never silently wrong (a dangling
tombstone set must NOT resurrect deletes)."""

from __future__ import annotations

import os
import shutil

import pytest
from pyspark.sql import functions as F

from searchlite_spark.index import (
    IndexSchema,
    KeywordField,
    NumericField,
    SnapshotExpiredError,
    TextField,
    build_index,
    list_snapshots,
    load_snapshot,
)
from searchlite_spark.index.append import append_documents
from searchlite_spark.index.catalog import Index
from searchlite_spark.index.maintenance import (
    compact_in_place,
    expire_snapshots,
    gc_stale_tables,
    tombstone_delete,
)
from searchlite_spark.query import Searcher

SCHEMA = IndexSchema(
    doc_id_field="doc_id",
    text_fields=(TextField("body"),),
    keyword_fields=(KeywordField("lang"),),
    numeric_fields=(NumericField("n"),),
)


def _corpus(spark, ids):
    rows = [
        (i, " ".join(["alpha", "beta", "gamma", "delta"][: 1 + i % 4] * (1 + i % 3)),
         "en" if i % 2 else "de", i * 10)
        for i in ids
    ]
    return spark.createDataFrame(rows, "doc_id LONG, body STRING, lang STRING, n LONG")


def _ids(searcher, query):
    return [
        r["doc_id"]
        for r in searcher.match_set({"query": query})
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .collect()
    ]


@pytest.fixture()
def path(tmp_path_factory):
    return str(tmp_path_factory.mktemp("snap_idx"))


def test_commits_are_numbered_snapshots(spark, path):
    idx = build_index(spark, _corpus(spark, range(20)), SCHEMA, path,
                      num_partitions=2, id_mode="column")
    assert idx.manifest["version"] == 1
    idx = tombstone_delete(spark, idx, [0, 2])
    assert idx.manifest["version"] == 2
    log = list_snapshots(path)
    assert [s["version"] for s in log] == [1, 2]
    assert log[-1]["current"] and not log[0]["current"]
    assert all(s["readable"] for s in log)
    assert log[0]["n_docs"] == 20


def test_time_travel_over_tombstone_delete(spark, path):
    build_index(spark, _corpus(spark, range(20)), SCHEMA, path,
                num_partitions=2, id_mode="column")
    now = Index(path, spark)
    v1 = now.manifest["version"]
    victims = _ids(Searcher(now), "alpha")[:3]
    tombstone_delete(spark, now, victims)
    cur = Searcher(Index(path, spark))
    old = Searcher(load_snapshot(path, spark, v1))
    cur_ids, old_ids = _ids(cur, "alpha"), _ids(old, "alpha")
    assert not set(victims) & set(cur_ids)
    assert set(victims) <= set(old_ids)
    # the snapshot read is exactly the pre-delete result set
    assert sorted(old_ids) == sorted(cur_ids + victims)


def test_append_expires_prior_snapshots_loudly(spark, path):
    """Appends land parquet files INSIDE the live docs/postings dirs
    (no copy-on-write — the right call at scale), so a pre-append
    snapshot's pointers no longer resolve to that snapshot's bytes.
    The contract is fail-loud, never silently-serve-appended-rows —
    and it must hold even if the eager terms-dir GC ever grows a grace
    generation (the in-place-append detection is explicit, not a side
    effect of the terms GC)."""
    build_index(spark, _corpus(spark, range(10)), SCHEMA, path,
                num_partitions=2, id_mode="column")
    v1 = Index(path, spark).manifest["version"]
    append_documents(spark, Index(path, spark), _corpus(spark, range(100, 105)),
                     id_mode="column")
    assert Index(path, spark).manifest["version"] > v1
    with pytest.raises(SnapshotExpiredError):
        load_snapshot(path, spark, v1)
    assert list_snapshots(path)[0]["readable"] is False
    # current sees the appended docs
    assert set(range(100, 105)) <= set(_ids(Searcher(Index(path, spark)), "alpha"))


def test_append_expiry_is_explicit_not_terms_gc(spark, path, tmp_path_factory):
    """Simulate a lazy terms GC: restore the pre-append terms dir after
    an append — the snapshot must STILL refuse to read (the appended
    postings/docs files are visible under its pointers)."""
    build_index(spark, _corpus(spark, range(10)), SCHEMA, path,
                num_partitions=2, id_mode="column")
    idx = Index(path, spark)
    v1 = idx.manifest["version"]
    terms_rel = idx.table_dir("terms")
    saved = str(tmp_path_factory.mktemp("terms_saved"))
    shutil.copytree(os.path.join(path, terms_rel), saved, dirs_exist_ok=True)
    append_documents(spark, idx, _corpus(spark, range(100, 103)),
                     id_mode="column")
    shutil.copytree(saved, os.path.join(path, terms_rel), dirs_exist_ok=True)
    with pytest.raises(SnapshotExpiredError, match="appended in place"):
        load_snapshot(path, spark, v1)


def test_expired_snapshot_fails_loudly_not_wrong(spark, path):
    """A GC'd tombstone set must raise, never resurrect deletes."""
    idx = build_index(spark, _corpus(spark, range(12)), SCHEMA, path,
                      num_partitions=2, id_mode="column")
    idx = tombstone_delete(spark, idx, [1])
    v2 = idx.manifest["version"]
    # a later delete eagerly GCs v2's tombstones_v* dir
    idx = tombstone_delete(spark, idx, [3])
    with pytest.raises(SnapshotExpiredError):
        load_snapshot(path, spark, v2)
    assert [s["version"] for s in list_snapshots(path) if not s["readable"]] == [v2]


def test_snapshot_survives_one_compaction_generation(spark, path):
    build_index(spark, _corpus(spark, range(16)), SCHEMA, path,
                num_partitions=2, id_mode="column")
    v1 = Index(path, spark).manifest["version"]
    compact_in_place(spark, path, num_partitions=2)
    # one generation of grace: v1's dirs still on disk
    old = Searcher(load_snapshot(path, spark, v1))
    assert len(_ids(old, "alpha")) == 16
    # the NEXT compaction's GC reclaims them
    compact_in_place(spark, path, num_partitions=2)
    gc_stale_tables(path)
    with pytest.raises(SnapshotExpiredError):
        load_snapshot(path, spark, v1)


def test_expire_snapshots_prunes_log_keeps_current(spark, path):
    idx = build_index(spark, _corpus(spark, range(8)), SCHEMA, path,
                      num_partitions=2, id_mode="column")
    for d in ([0], [2], [4]):
        idx = tombstone_delete(spark, idx, d)
    assert len(list_snapshots(path)) == 4
    expired = expire_snapshots(path, keep_last=2)
    assert expired == [1, 2]
    log = list_snapshots(path)
    assert [s["version"] for s in log] == [3, 4]
    assert log[-1]["current"]
    with pytest.raises(SnapshotExpiredError):
        load_snapshot(path, spark, 1)
    # keep_last larger than the log is a no-op
    assert expire_snapshots(path, keep_last=10) == []


def test_missing_log_and_legacy_manifest(spark, path):
    """Pre-snapshot-log indexes: list is empty, time travel raises."""
    build_index(spark, _corpus(spark, range(5)), SCHEMA, path,
                num_partitions=2, id_mode="column")
    shutil.rmtree(os.path.join(path, "snapshots"))
    assert list_snapshots(path) == []
    with pytest.raises(SnapshotExpiredError):
        load_snapshot(path, spark, 1)
    # current reads are unaffected
    assert len(_ids(Searcher(Index(path, spark)), "alpha")) == 5
