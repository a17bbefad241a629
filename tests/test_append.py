"""Incremental append (reference: new-segment-per-commit,
api/writer.rs:106-239): build + append must be search-identical to a
full rebuild over the concatenated corpus, and append work must scale
with the batch, not the corpus."""

import pytest

from searchlite_spark.query import Searcher


def _corpus(spark, rows):
    return spark.createDataFrame(rows, "doc_id LONG, body STRING, lang STRING")


ROWS_A = [
    (0, "rust systems programming language fast", "en"),
    (1, "python scripting language easy data", "en"),
    (2, "search engine index postings fast", "de"),
    (3, "spark distributed query engine", "en"),
]
ROWS_B = [
    (10, "rust search engine fast index", "en"),
    (11, "distributed systems programming spark", "de"),
    (12, "language model data index", "en"),
]


@pytest.fixture(scope="module")
def schemas():
    from searchlite_spark.index import IndexSchema, KeywordField, TextField

    return IndexSchema(
        doc_id_field="doc_id",
        text_fields=(TextField("body"),),
        keyword_fields=(KeywordField("lang"),),
    )


def _search_all(searcher, queries):
    out = {}
    for q in queries:
        res = searcher.search({"query": q, "limit": 10})
        out[q] = [
            (h["doc_id"], round(h["score"], 6)) for h in res["hits"]
        ]
    return out


QUERIES = ["rust", "fast index", "language", "spark -engine", '"search engine"']


def test_append_equals_full_rebuild(spark, tmp_path_factory, schemas):
    from searchlite_spark.index import append_documents, build_index
    from searchlite_spark.index.catalog import Index

    inc_path = str(tmp_path_factory.mktemp("append_inc"))
    full_path = str(tmp_path_factory.mktemp("append_full"))

    idx = build_index(
        spark, _corpus(spark, ROWS_A), schemas, inc_path,
        num_partitions=2, id_mode="column", block_size=4,
    )
    gen_before = idx.manifest["lineage"]["build_id"]
    idx2 = append_documents(
        spark, idx, _corpus(spark, ROWS_B), num_partitions=2,
        id_mode="column",
    )
    full = build_index(
        spark, _corpus(spark, ROWS_A + ROWS_B), schemas, full_path,
        num_partitions=2, id_mode="column", block_size=4,
    )

    # stats parity (df/cf/avgdl recomputed over old+new)
    assert idx2.stats == full.stats
    inc_terms = {
        (r["term"], r["df"], r["cf"], r["max_tf"])
        for r in idx2.terms().collect()
    }
    full_terms = {
        (r["term"], r["df"], r["cf"], r["max_tf"])
        for r in full.terms().collect()
    }
    assert inc_terms == full_terms

    # search parity: identical ids AND scores on every plan flavor
    s_inc, s_full = Searcher(idx2), Searcher(full)
    assert _search_all(s_inc, QUERIES) == _search_all(s_full, QUERIES)

    # kernel path reads the appended blocks (old + new doc ranges)
    for execution in ("wand", "bmw"):
        a = [
            (r["doc_id"], round(r["score"], 6))
            for r in s_inc.topk({"query": "rust fast", "limit": 5,
                                 "execution": execution}).collect()
        ]
        b = [
            (r["doc_id"], round(r["score"], 6))
            for r in s_full.topk({"query": "rust fast", "limit": 5,
                                  "execution": execution}).collect()
        ]
        assert a == b
        assert s_inc.last_execution == execution

    # append bumped the generation (open cursors must go stale)
    assert idx2.manifest["lineage"]["build_id"] != gen_before
    assert idx2.manifest["lineage"]["appends"][0]["n_docs"] == len(ROWS_B)


def test_append_assign_mode_and_id_guard(spark, tmp_path_factory, schemas):
    from searchlite_spark.index import append_documents, build_index

    path = str(tmp_path_factory.mktemp("append_assign"))
    idx = build_index(
        spark, _corpus(spark, ROWS_A), schemas, path,
        num_partitions=2, id_mode="column",
    )
    # assign mode: new ids continue after the current max
    batch = spark.createDataFrame(
        [("kz", "zebra quantum rust", "en"), ("ka", "alpha rust", "en")],
        "doc_id STRING, body STRING, lang STRING",
    )
    from searchlite_spark.index import IndexSchema, KeywordField, TextField

    idx2 = append_documents(spark, idx, batch, num_partitions=2)
    new_ids = sorted(
        r["doc_id"] for r in idx2.docs().where("doc_id > 3").collect()
    )
    assert new_ids == [4, 5]  # dense, after old max, in key order
    s = Searcher(idx2)
    res = s.search({"query": "zebra", "limit": 5})
    assert [h["doc_id"] for h in res["hits"]] == [5]  # kz sorts after ka

    # column mode rejects overlapping ids
    with pytest.raises(ValueError, match="doc_id <= current max"):
        append_documents(
            spark, idx2,
            _corpus(spark, [(1, "dup id", "en")]),
            id_mode="column",
        )


def test_tombstone_delete_and_compact(spark, tmp_path_factory, schemas):
    """In-place tombstone deletes (writer.rs tombstones-at-merge): hits
    exclude deleted docs immediately on every path, BM25 stats stay the
    snapshot's until compact() reconciles them."""
    from searchlite_spark.index import build_index
    from searchlite_spark.index.catalog import Index
    from searchlite_spark.index.maintenance import compact, tombstone_delete

    path = str(tmp_path_factory.mktemp("tomb"))
    idx = build_index(
        spark, _corpus(spark, ROWS_A + ROWS_B), schemas, path,
        num_partitions=2, id_mode="column", block_size=4,
    )
    s0 = Searcher(idx)
    before = {h["doc_id"]: h["score"]
              for h in s0.search({"query": "rust", "limit": 10})["hits"]}
    assert 0 in before and 10 in before

    idx2 = tombstone_delete(spark, idx, [0, 2])
    s1 = Searcher(idx2)
    res = s1.search({"query": "rust", "limit": 10})
    got = {h["doc_id"]: h["score"] for h in res["hits"]}
    assert 0 not in got and 2 not in got
    # stale-stats contract: survivors keep their ORIGINAL scores
    assert got[10] == before[10]
    expected_live = [d for d in before if d not in (0, 2)]
    assert res["total_hits_estimate"] == len(expected_live)
    # kernel path masks tombstones too (and must not let them hold
    # top-k slots): brute == wand == bmw on the filtered index
    brute = [(r["doc_id"], round(r["score"], 6)) for r in
             s1.topk({"query": "rust", "limit": 3, "execution": "bm25"}).collect()]
    for ex in ("wand", "bmw"):
        kern = [(r["doc_id"], round(r["score"], 6)) for r in
                s1.topk({"query": "rust", "limit": 3, "execution": ex}).collect()]
        assert kern == brute, ex
        assert s1.last_execution == ex
    assert all(d not in (0, 2) for d, _ in brute)

    # aggregations run over the filtered match set
    from searchlite_spark.query.aggs import run_aggregations

    m = s1.match_set({"query": "rust"})
    out = run_aggregations(m, s1.docs,
                           {"l": {"type": "terms", "field": "lang"}})
    assert sum(b["doc_count"] for b in out["l"]["buckets"]) == len(got)

    # compact folds tombstones in; result == fresh build over survivors
    out_path = str(tmp_path_factory.mktemp("tomb_compacted"))
    compacted = compact(spark, path, out_path)
    survivors = [r for r in ROWS_A + ROWS_B if r[0] not in (0, 2)]
    fresh_path = str(tmp_path_factory.mktemp("tomb_fresh"))
    fresh = build_index(spark, _corpus(spark, survivors), schemas,
                        fresh_path, num_partitions=2, id_mode="column",
                        block_size=4)
    assert compacted.stats == fresh.stats
    assert not compacted.has_tombstones()
    sc_, sf_ = Searcher(compacted), Searcher(fresh)
    assert _search_all(sc_, QUERIES) == _search_all(sf_, QUERIES)


def test_upsert_replaces_by_key(spark, tmp_path_factory):
    """upsert = tombstone old version + append new version with a fresh
    id (writer.rs BTreeMap replace): searches see only the live doc."""
    from searchlite_spark.index import (
        IndexSchema, KeywordField, TextField, build_index, upsert_documents,
    )

    schema = IndexSchema(
        doc_id_field="_id",
        text_fields=(TextField("body"),),
        keyword_fields=(KeywordField("lang"),),
    )
    rows = [
        ("a", "rust systems language", "en"),
        ("b", "python scripting language", "en"),
        ("c", "spark engine", "de"),
    ]
    corpus = spark.createDataFrame(rows, "_id STRING, body STRING, lang STRING")
    path = str(tmp_path_factory.mktemp("upsert"))
    idx = build_index(spark, corpus, schema, path, num_partitions=2)

    batch = spark.createDataFrame(
        [("b", "golang compiled language fresh", "en"),
         ("d", "new document rust", "en")],
        "_id STRING, body STRING, lang STRING",
    )
    idx2 = upsert_documents(spark, idx, batch)
    s = Searcher(idx2)
    # old version of b is invisible; new version + new doc d are live
    assert not s.search({"query": "python", "limit": 5})["hits"]
    got = s.search({"query": "golang", "limit": 5})["hits"]
    assert [h["fields"]["_id"] for h in got] == ["b"]
    got_d = s.search({"query": "document", "limit": 5})["hits"]
    assert [h["fields"]["_id"] for h in got_d] == ["d"]
    # every live key exactly once in the visible docstore
    live = sorted(r["_id"] for r in s.docstore.select("_id").collect())
    assert live == ["a", "b", "c", "d"]


def test_review_fixes_guards(spark, tmp_path_factory, schemas):
    """Round-4 review fixes: rewrite bumps generation, append rejects
    dup/NULL batch ids, double-append through one handle is correct,
    upsert rejects duplicate batch keys, tombstone retries stay
    idempotent under the cap accounting."""
    from searchlite_spark.index import append_documents, build_index, upsert_documents
    from searchlite_spark.index.catalog import Index
    from searchlite_spark.index.maintenance import (
        delete_by_id, tombstone_delete,
    )

    path = str(tmp_path_factory.mktemp("guards"))
    idx = build_index(spark, _corpus(spark, ROWS_A), schemas, path,
                      num_partitions=2, id_mode="column")
    gen0 = idx.manifest["lineage"]["build_id"]

    # delete_by_id rewrite = new generation
    out = str(tmp_path_factory.mktemp("guards_del"))
    idx_del = delete_by_id(spark, path, out, [0])
    assert idx_del.manifest["lineage"]["build_id"] != gen0

    # duplicate ids in a column-mode batch are rejected
    with pytest.raises(ValueError, match="duplicate doc_ids"):
        append_documents(
            spark, idx,
            _corpus(spark, [(100, "x y", "en"), (100, "y z", "en")]),
            id_mode="column",
        )
    # NULL ids are rejected
    from searchlite_spark.index import IndexSchema, KeywordField, TextField
    import pyspark.sql.functions as F

    nb = spark.createDataFrame(
        [("x y", "en")], "body STRING, lang STRING"
    ).withColumn("doc_id", F.lit(None).cast("long"))
    with pytest.raises(ValueError, match="NULL doc_id"):
        append_documents(spark, idx, nb, id_mode="column")

    # double-append through the SAME handle: stats equal a full rebuild
    b1 = _corpus(spark, [(100, "alpha beta", "en")])
    b2 = _corpus(spark, [(200, "gamma delta", "en")])
    append_documents(spark, idx, b1, id_mode="column")
    idx2 = append_documents(spark, idx, b2, id_mode="column")  # stale handle
    full = build_index(
        spark,
        _corpus(spark, ROWS_A + [(100, "alpha beta", "en"),
                                 (200, "gamma delta", "en")]),
        schemas, str(tmp_path_factory.mktemp("guards_full")),
        num_partitions=2, id_mode="column",
    )
    assert idx2.stats == full.stats

    # upsert rejects duplicate batch keys
    schema_k = IndexSchema(doc_id_field="_id",
                           text_fields=(TextField("body"),),
                           keyword_fields=(KeywordField("lang"),))
    kpath = str(tmp_path_factory.mktemp("guards_up"))
    kidx = build_index(
        spark,
        spark.createDataFrame([("a", "one", "en")],
                              "_id STRING, body STRING, lang STRING"),
        schema_k, kpath, num_partitions=2,
    )
    dup = spark.createDataFrame(
        [("a", "two", "en"), ("a", "three", "en")],
        "_id STRING, body STRING, lang STRING",
    )
    with pytest.raises(ValueError, match="duplicate keys"):
        upsert_documents(spark, kidx, dup)

    # tombstone retry idempotency: same ids twice -> count stays 2
    t1 = tombstone_delete(spark, Index(path, spark), [1, 3])
    t2 = tombstone_delete(spark, Index(path, spark), [1, 3])
    assert t2.manifest["lineage"]["tombstones"] == 2
    assert t2.tombstones().distinct().count() == 2



def test_repair_recovers_torn_append(spark, tmp_path_factory, schemas):
    """Crash window: postings files committed but the docstore write
    never ran.  repair() drops the orphan postings and rebuilds derived
    tables — output identical to a fresh build over the surviving
    corpus."""
    from searchlite_spark.index import build_index
    from searchlite_spark.index.maintenance import repair

    path = str(tmp_path_factory.mktemp("torn"))
    idx = build_index(spark, _corpus(spark, ROWS_A), schemas, path,
                      num_partitions=2, id_mode="column", block_size=4)

    # simulate the torn append: ghost postings for doc 999 whose
    # document never landed in the docstore
    ghost = spark.createDataFrame(
        [(999, "body", "body:rust", 3, [0, 1, 2], 3)],
        "doc_id LONG, field STRING, term STRING, tf INT, "
        "positions ARRAY<INT>, dl INT",
    )
    ghost.write.mode("append").parquet(f"{path}/postings")
    # the corruption is visible before repair: df inflated
    assert idx.postings().where("doc_id = 999").count() == 1

    out = str(tmp_path_factory.mktemp("torn_repaired"))
    fixed = repair(spark, path, out)
    assert fixed.postings().where("doc_id = 999").count() == 0

    fresh = build_index(spark, _corpus(spark, ROWS_A), schemas,
                        str(tmp_path_factory.mktemp("torn_fresh")),
                        num_partitions=2, id_mode="column", block_size=4)
    assert fixed.stats == fresh.stats
    sr, sf = Searcher(fixed), Searcher(fresh)
    assert _search_all(sr, QUERIES) == _search_all(sf, QUERIES)


def test_tombstone_scale_no_driver_materialization(spark, tmp_path_factory, schemas):
    """500k tombstones must never reach the driver on the query path:
    Searcher.__init__ does zero collect/toPandas (the set stays a
    parquet-backed DataFrame, broadcast-anti-joined for flat postings
    and bucket-cogrouped into the WAND/BMW kernel), and the kernel
    paths still return brute-identical tombstone-free results.

    The oversized set is written to the tombstone table directly (the
    public tombstone_delete write path caps at MAX_TOMBSTONES by
    design; the reader must stay scale-safe regardless of how the
    table got big)."""
    from pyspark.sql import DataFrame, functions as F

    from searchlite_spark.index import build_index
    from searchlite_spark.index.catalog import Index

    path = str(tmp_path_factory.mktemp("tomb_scale"))
    build_index(
        spark, _corpus(spark, ROWS_A + ROWS_B), schemas, path,
        num_partitions=2, id_mode="column", block_size=4,
    )
    # 500k tombstones: two real ids + 499,998 ids not in the index
    spark.range(499_998).select(
        (F.col("id") + 1_000_000).alias("doc_id")
    ).unionByName(
        spark.createDataFrame([(0,), (2,)], "doc_id LONG")
    ).write.mode("overwrite").parquet(f"{path}/tombstones")

    calls = {"n": 0}
    orig_collect, orig_topandas = DataFrame.collect, DataFrame.toPandas

    def counting_collect(self):
        calls["n"] += 1
        return orig_collect(self)

    def counting_topandas(self):
        calls["n"] += 1
        return orig_topandas(self)

    DataFrame.collect, DataFrame.toPandas = counting_collect, counting_topandas
    try:
        s = Searcher(Index(path, spark))
    finally:
        DataFrame.collect, DataFrame.toPandas = orig_collect, orig_topandas
    assert calls["n"] == 0, "Searcher.__init__ materialized a DataFrame"
    assert s._tombstones is not None and isinstance(s._tombstones, DataFrame)

    brute = [(r["doc_id"], round(r["score"], 6)) for r in
             s.topk({"query": "rust", "limit": 5, "execution": "bm25"}).collect()]
    assert brute and all(d not in (0, 2) for d, _ in brute)
    for ex in ("wand", "bmw"):
        kern = [(r["doc_id"], round(r["score"], 6)) for r in
                s.topk({"query": "rust", "limit": 5, "execution": ex}).collect()]
        assert kern == brute, ex
        assert s.last_execution == ex


def test_assign_replay_after_torn_append_is_repairable(
    spark, tmp_path_factory, schemas
):
    """Round-4 advisory window: an ASSIGN-mode append crashes after its
    file writes but before the manifest commit, and the batch replays.
    Because id assignment derives from the manifest's committed
    max_doc_id (not the torn files), the replay rewrites the SAME ids —
    no silent fresh-id duplicates — the torn state is loud
    (TornAppendError at stream start), and repair() restores exactly
    the clean single-append index."""
    import shutil

    import pytest as _pytest

    from searchlite_spark.index import build_index
    from searchlite_spark.index.append import append_documents
    from searchlite_spark.index.catalog import Index
    from searchlite_spark.index.maintenance import repair
    from searchlite_spark.streaming import TornAppendError, check_no_torn_append

    path = str(tmp_path_factory.mktemp("torn_assign"))
    idx = build_index(spark, _corpus(spark, ROWS_A), schemas, path,
                      num_partitions=2, id_mode="column", block_size=4)
    # snapshot the committed state (manifest + terms dir) to tear back to
    save = str(tmp_path_factory.mktemp("torn_assign_save"))
    shutil.copy(f"{path}/manifest.json", f"{save}/manifest.json")
    shutil.copytree(f"{path}/terms", f"{save}/terms")

    batch = _corpus(spark, ROWS_B)
    append_documents(spark, idx, batch, num_partitions=2, id_mode="assign")
    clean = Index(path, spark)
    clean_stats = dict(clean.stats)
    s_clean = _search_all(Searcher(clean), QUERIES)

    # ---- tear: files of the append stay, manifest+terms roll back ----
    shutil.copy(f"{save}/manifest.json", f"{path}/manifest.json")
    shutil.rmtree(f"{path}/terms", ignore_errors=True)
    shutil.copytree(f"{save}/terms", f"{path}/terms")

    with _pytest.raises(TornAppendError):
        check_no_torn_append(spark, path)

    # ---- replay without repairing first: SAME ids, duplicate rows ----
    append_documents(
        spark, Index(path, spark), batch, num_partitions=2, id_mode="assign"
    )
    dirty = Index(path, spark)
    assert dirty.docs().count() == len(ROWS_A) + 2 * len(ROWS_B)
    dup_ids = (
        dirty.docs().groupBy("doc_id").count().where("count > 1").count()
    )
    assert dup_ids == len(ROWS_B)  # replays share ids: detectable

    # ---- repair dedupes the byte-identical replays ----
    out = str(tmp_path_factory.mktemp("torn_assign_repaired"))
    fixed = repair(spark, path, out)
    assert fixed.docs().count() == len(ROWS_A) + len(ROWS_B)
    assert {k: v for k, v in fixed.stats.items()} == clean_stats
    assert _search_all(Searcher(fixed), QUERIES) == s_clean
    check_no_torn_append(spark, out)  # clean
