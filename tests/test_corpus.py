"""F1 synthetic Common-Crawl corpus invariants (FIXTURES.md):
deterministic per-row generation (byte-identical text per url across
runs and partitionings) and id-mode equivalence."""

import pytest


def test_text_byte_identical_across_partitionings(spark):
    from searchlite_spark.corpus import make_corpus

    a = {r["url"]: r["text"] for r in make_corpus(spark, 200, partitions=2).collect()}
    b = {r["url"]: r["text"] for r in make_corpus(spark, 200, partitions=7).collect()}
    assert a == b
    assert len(a) == 200
    # html embeds the same bytes
    rows = make_corpus(spark, 5, partitions=1).collect()
    for r in rows:
        assert bytes(r["html"]) == b"<html><body>" + r["text"].encode() + b"</body></html>"


def test_url_order_equals_id_order(spark):
    from searchlite_spark.corpus import make_corpus

    rows = make_corpus(spark, 300, partitions=3).select("doc_id", "url").collect()
    by_url = sorted(rows, key=lambda r: r["url"])
    assert [r["doc_id"] for r in by_url] == sorted(r["doc_id"] for r in rows)


def test_assign_ids_match_column_ids(spark):
    """id_mode="assign" (BTreeMap-order parity) must give the same ids
    as the precomputed column for this corpus."""
    from searchlite_spark.corpus import make_corpus
    from searchlite_spark.index.build import assign_doc_ids

    corpus = make_corpus(spark, 250, partitions=4)
    assigned = assign_doc_ids(
        corpus.withColumnRenamed("doc_id", "orig_id"), "url", 4
    )
    rows = assigned.select("orig_id", "doc_id").collect()
    assert all(r["orig_id"] == r["doc_id"] for r in rows)
