"""Transactional IndexWriter (reference: api/writer.rs — WAL-buffered
add/delete, last-op-wins fold on commit, rollback, crash recovery).

Contract under test: after commit()+compact(), the index is
search-identical to a fresh build over the folded corpus; rollback and
re-open recover/discard pending ops exactly like the reference's
WAL replay (writer.rs:37-72) and rollback (writer.rs:241-246).
"""

import os

import pytest

from searchlite_spark.query import Searcher


def _corpus(spark, rows):
    return spark.createDataFrame(
        rows, "_id STRING, body STRING, lang STRING"
    )


BASE = [
    ("a1", "rust systems programming language fast", "en"),
    ("a2", "python scripting language easy data", "en"),
    ("a3", "search engine index postings fast", "de"),
    ("a4", "spark distributed query engine", "en"),
]


@pytest.fixture()
def schemas():
    from searchlite_spark.index import IndexSchema, KeywordField, TextField

    return IndexSchema(
        doc_id_field="_id",
        text_fields=(TextField("body"),),
        keyword_fields=(KeywordField("lang"),),
    )


def _build(spark, schemas, path, rows=BASE):
    from searchlite_spark.index import build_index

    return build_index(
        spark, _corpus(spark, rows), schemas, path, num_partitions=2,
        block_size=4,
    )


def _hits(index, query, spark=None):
    # compare by the stored KEY (internal dense ids legitimately differ
    # between a committed+compacted index and a fresh rebuild)
    res = Searcher(index).search({"query": query, "limit": 10})
    return [
        (h["fields"]["_id"], round(h["score"], 6)) for h in res["hits"]
    ]


def _keys(index):
    # live view: raw docstore minus tombstones (the engine's filter)
    d = index.docs().select("_id", "doc_id")
    if index.has_tombstones():
        d = d.join(
            index.tombstones().select("doc_id"), "doc_id", "left_anti"
        )
    return sorted(r["_id"] for r in d.collect())


def test_commit_equals_rebuild_over_folded_corpus(
    spark, schemas, tmp_path_factory
):
    """add new + overwrite + delete + delete-then-re-add in one txn,
    then compact: search-identical to a fresh build of the fold."""
    from searchlite_spark.index import IndexWriter
    from searchlite_spark.index.catalog import Index
    from searchlite_spark.index.maintenance import compact

    p = str(tmp_path_factory.mktemp("writer_txn"))
    full = str(tmp_path_factory.mktemp("writer_txn_full"))
    out = str(tmp_path_factory.mktemp("writer_txn_out"))
    _build(spark, schemas, p)

    with IndexWriter(spark, p) as w:
        # op 0: two new docs + an overwrite of a2
        w.add_documents(
            _corpus(
                spark,
                [
                    ("b1", "rust search engine fast index", "en"),
                    ("b2", "distributed systems programming spark", "de"),
                    ("a2", "python replaced body data index", "en"),
                ],
            )
        )
        # op 1: delete one base doc and one doc added above
        w.delete_documents(["a3", "b2"])
        # op 2: re-add a deleted key (delete happened EARLIER -> lives)
        w.add_documents(
            _corpus(spark, [("b2", "language model data index", "de")])
        )
        idx = w.commit()
        assert w.pending_ops() == []

    assert _keys(idx) == ["a1", "a2", "a4", "b1", "b2"]
    idx2 = compact(spark, p, out)

    folded = [
        ("a1", "rust systems programming language fast", "en"),
        ("a2", "python replaced body data index", "en"),
        ("a4", "spark distributed query engine", "en"),
        ("b1", "rust search engine fast index", "en"),
        ("b2", "language model data index", "de"),
    ]
    ref = _build(spark, schemas, full, folded)
    for q in ["rust", "fast index", "language", "data -python"]:
        got = {k: s for k, s in _hits(idx2, q)}
        want = {k: s for k, s in _hits(ref, q)}
        assert got == want, q
    # scoring-relevant stats identical; max_doc_id legitimately differs
    # (compact preserves internal ids, a fresh build is dense)
    s2, sr = dict(idx2.stats), dict(ref.stats)
    s2.pop("max_doc_id"), sr.pop("max_doc_id")
    assert s2 == sr


def test_pre_compact_visibility_and_stale_stats(
    spark, schemas, tmp_path_factory
):
    """Before compaction: searches never see old versions or deleted
    docs, but BM25 stats remain those of the last build (tombstone
    contract, same as tombstone_delete)."""
    from searchlite_spark.index import IndexWriter
    from searchlite_spark.index.catalog import Index

    p = str(tmp_path_factory.mktemp("writer_vis"))
    idx0 = _build(spark, schemas, p)
    stats0 = dict(idx0.stats)
    with IndexWriter(spark, p) as w:
        w.add_documents(
            _corpus(spark, [("a1", "replaced rust body entirely", "en")])
        )
        w.delete_document("a4")
        idx = w.commit()
    assert _keys(idx) == ["a1", "a2", "a3"]
    hits = dict(_hits(idx, "rust"))
    assert set(hits) == {"a1"}
    # "spark" only appeared in the deleted a4
    assert _hits(idx, "spark") == []
    # dead versions still counted until compact reconciles
    assert idx.stats["n_docs"] == stats0["n_docs"] + 1


def test_rollback_clears_pending_and_wal(spark, schemas, tmp_path_factory):
    from searchlite_spark.index import IndexWriter

    p = str(tmp_path_factory.mktemp("writer_rb"))
    _build(spark, schemas, p)
    w = IndexWriter(spark, p)
    w.add_documents(_corpus(spark, [("z1", "zzz body", "en")]))
    w.delete_document("a1")
    assert len(w.pending_ops()) == 2
    w.rollback()
    assert w.pending_ops() == []
    idx = w.commit()  # empty commit: no-op
    w.close()
    assert _keys(idx) == ["a1", "a2", "a3", "a4"]
    # a fresh writer sees no pending ops either
    with IndexWriter(spark, p) as w2:
        assert w2.pending_ops() == []


def test_crash_recovery_replays_pending_ops(
    spark, schemas, tmp_path_factory
):
    """Writer 'crashes' (close without commit): a new writer recovers
    the WAL'd ops and commit applies them (writer.rs:37-72)."""
    from searchlite_spark.index import IndexWriter

    p = str(tmp_path_factory.mktemp("writer_crash"))
    _build(spark, schemas, p)
    w = IndexWriter(spark, p)
    w.add_documents(_corpus(spark, [("c1", "recovered doc body", "en")]))
    w.delete_document("a2")
    w.close()  # no commit — ops stay journaled

    with IndexWriter(spark, p) as w2:
        ops = w2.pending_ops()
        assert [o["op"] for o in ops] == ["add", "delete"]
        idx = w2.commit()
    assert _keys(idx) == ["a1", "a3", "a4", "c1"]


def test_torn_add_op_is_discarded(spark, schemas, tmp_path_factory):
    """An add op without _SUCCESS (crash mid-write) is dropped on
    recovery — only fully synced WAL records replay."""
    from searchlite_spark.index import IndexWriter

    p = str(tmp_path_factory.mktemp("writer_torn"))
    _build(spark, schemas, p)
    w = IndexWriter(spark, p)
    w.add_documents(_corpus(spark, [("t1", "torn doc body", "en")]))
    w.close()
    os.remove(os.path.join(p, "wal", "000000.add.parquet", "_SUCCESS"))
    with pytest.warns(RuntimeWarning, match="torn add op"):
        w2 = IndexWriter(spark, p)
    assert w2.pending_ops() == []
    w2.close()


def test_writer_lock_excludes_second_writer(
    spark, schemas, tmp_path_factory
):
    from searchlite_spark.index import IndexWriter

    p = str(tmp_path_factory.mktemp("writer_lock"))
    _build(spark, schemas, p)
    w = IndexWriter(spark, p)
    # simulate a DIFFERENT live process holding the lock (same-pid
    # re-open legitimately takes over)
    import subprocess

    other = subprocess.Popen(["sleep", "30"])
    try:
        with open(os.path.join(p, "wal", ".writer.lock"), "w") as f:
            f.write(str(other.pid))
        with pytest.raises(RuntimeError, match="another IndexWriter"):
            IndexWriter(spark, p)
    finally:
        other.kill()
        other.wait()
    w.close()


def test_validation_rejects_bad_batches(spark, schemas, tmp_path_factory):
    from searchlite_spark.index import IndexWriter

    p = str(tmp_path_factory.mktemp("writer_val"))
    _build(spark, schemas, p)
    with IndexWriter(spark, p) as w:
        with pytest.raises(ValueError, match="duplicate keys"):
            w.add_documents(
                _corpus(
                    spark,
                    [("d1", "one", "en"), ("d1", "two", "en")],
                )
            )
        with pytest.raises(ValueError, match="do not match"):
            w.add_documents(
                spark.createDataFrame(
                    [("d1", "body only")], "_id STRING, body STRING"
                )
            )
        with pytest.raises(ValueError, match="unknown fields"):
            w.add_document({"_id": "d1", "body": "x", "nope": 1})
        with pytest.raises(ValueError, match="NULL key"):
            w.delete_documents(["ok", None])
        assert w.pending_ops() == []  # nothing journaled by rejects


def test_add_document_convenience_and_empty_commit(
    spark, schemas, tmp_path_factory
):
    from searchlite_spark.index import IndexWriter

    p = str(tmp_path_factory.mktemp("writer_single"))
    _build(spark, schemas, p)
    with IndexWriter(spark, p) as w:
        n = w.add_document(
            {"_id": "s1", "body": "single rust document", "lang": "en"}
        )
        assert n == 1
        idx = w.commit()
    assert "s1" in _keys(idx)
    hits = dict(_hits(idx, "single"))
    assert set(hits) == {"s1"}


def test_delete_only_commit_and_absent_key_noop(
    spark, schemas, tmp_path_factory
):
    from searchlite_spark.index import IndexWriter

    p = str(tmp_path_factory.mktemp("writer_del"))
    _build(spark, schemas, p)
    with IndexWriter(spark, p) as w:
        w.delete_documents(["a1", "never-existed"])
        idx = w.commit()
    assert _keys(idx) == ["a2", "a3", "a4"]
    assert _hits(idx, "rust") == []


def test_orphan_tombstone_set_is_invisible(spark, schemas, tmp_path_factory):
    """A staged tombstones_v* dir whose pointer never committed (crash
    mid-commit) must not affect readers — manifest-gated snapshot."""
    from searchlite_spark.index.catalog import Index
    from searchlite_spark.index.maintenance import stage_tombstone_set

    p = str(tmp_path_factory.mktemp("writer_orphan"))
    idx = _build(spark, schemas, p)
    dirname, total = stage_tombstone_set(spark, idx, [0, 1, 2, 3])
    assert dirname and total == 4
    idx2 = Index(path=p, spark=spark)
    assert not idx2.has_tombstones()
    assert len(_hits(idx2, "language")) > 0
