"""CLI surface tests (searchlite-cli/src/main.rs parity).

Pure-function coverage (schema translation, upsert fold, sort parsing,
value coercion) plus one end-to-end lifecycle over a real index:
init -> add (upsert fold) -> commit -> search -> delete -> commit ->
compact -> search.
"""

import json
import os

import pytest

from searchlite_spark import cli
from pyspark.sql import types as T


# ---------------------------------------------------------------------------
# schema translation
# ---------------------------------------------------------------------------


REF_SCHEMA = {
    "doc_id_field": "_id",
    "analyzers": [
        {
            "name": "en",
            "tokenizer": "default",
            "filters": [
                {"lowercase": True},
                {"stopwords": "en"},
                {"stemmer": "english"},
                {"edge_ngram": {"min": 2, "max": 4}},
            ],
        }
    ],
    "text_fields": [
        {"name": "body", "analyzer": "en", "stored": True, "indexed": True},
        # deprecated alias `tokenizer` (index-schema.json text_field allOf)
        {"name": "title", "tokenizer": "default", "stored": True, "indexed": True},
        # store-only text column
        {"name": "raw", "analyzer": "default", "stored": True, "indexed": False},
        {
            "name": "suggest",
            "analyzer": "default",
            "stored": True,
            "indexed": True,
            "search_as_you_type": {"min_gram": 2, "max_gram": 6},
        },
    ],
    "keyword_fields": [
        {"name": "lang", "stored": True, "indexed": True, "fast": True}
    ],
    "numeric_fields": [
        {"name": "year", "i64": True, "fast": True},
        {"name": "rating", "i64": False, "fast": True},
    ],
    "nested_fields": [
        {
            "name": "authors",
            "fields": [
                {"type": "keyword", "name": "name", "stored": True,
                 "indexed": True, "fast": True},
                {"type": "numeric", "name": "rank", "i64": True, "fast": True},
                {"type": "object", "name": "affil",
                 "fields": [{"type": "text", "name": "org", "analyzer": "default",
                             "stored": True, "indexed": True}]},
            ],
        }
    ],
}


def test_load_schema_reference_shape():
    schema, corpus_type = cli.load_schema(REF_SCHEMA)
    assert schema.doc_id_field == "_id"
    # indexed:false text field stays out of the index schema but keeps
    # its corpus column
    assert schema.text_field_names == ["body", "title", "suggest"]
    assert "raw" in corpus_type.fieldNames()
    assert schema.keyword_field_names == ["lang"]
    assert [n.i64 for n in schema.numeric_fields] == [True, False]
    # analyzer filter chain translated from single-key reference objects
    an = schema.analyzer("en")
    assert [k for k, _ in an.filters] == [
        "lowercase", "stopwords", "stemmer", "edge_ngram"]
    # search_as_you_type adds the trailing edge_ngram only at index time
    idx_an = schema.index_analyzer_for("suggest")
    assert idx_an.filters and idx_an.filters[-1] == ("edge_ngram", (2, 6))
    assert schema.search_analyzer_for("suggest").filters == ()
    # column types
    by_name = {f.name: f.dataType for f in corpus_type.fields}
    assert isinstance(by_name["lang"], T.ArrayType)
    assert isinstance(by_name["year"], T.LongType)
    assert isinstance(by_name["rating"], T.DoubleType)
    authors = by_name["authors"]
    assert isinstance(authors, T.ArrayType)
    inner = {f.name: f.dataType for f in authors.elementType.fields}
    assert isinstance(inner["rank"], T.LongType)
    assert isinstance(inner["affil"], T.ArrayType)  # object -> nested array


def test_load_schema_rejects_vectors_and_bad_filters():
    with pytest.raises(cli.SchemaError, match="textops"):
        cli.load_schema({"vector_fields": [{"name": "v", "dim": 4,
                                            "metric": "Cosine"}]})
    bad = {"doc_id_field": "_id",
           "analyzers": [{"name": "x", "tokenizer": "default",
                          "filters": [{"reverse": True}]}],
           "text_fields": [{"name": "t", "analyzer": "x",
                            "stored": True, "indexed": True}]}
    with pytest.raises(cli.SchemaError, match="unknown token filter"):
        cli.load_schema(bad)


def test_fold_last_wins_and_sort_parse():
    docs = [{"_id": "a", "v": 1}, {"_id": "b", "v": 2}, {"_id": "a", "v": 3}]
    folded = cli.fold_last_wins(docs, "_id")
    assert {d["_id"]: d["v"] for d in folded} == {"a": 3, "b": 2}
    with pytest.raises(ValueError, match="missing key"):
        cli.fold_last_wins([{"v": 1}], "_id")
    assert cli.parse_sort("year:desc, title") == [
        {"field": "year", "order": "desc"}, {"field": "title"}]
    assert cli.parse_sort(None) is None
    with pytest.raises(SystemExit):
        cli.parse_sort("year:down")


def test_coerce_rejects_wrong_types(spark):
    ct = T.StructType([
        T.StructField("_id", T.StringType(), False),
        T.StructField("lang", T.ArrayType(T.StringType()), True),
        T.StructField("year", T.LongType(), True),
    ])
    df = cli.docs_to_df(
        spark, [{"_id": "a", "lang": "en", "year": 2000}], ct)
    row = df.first()
    assert row["lang"] == ["en"]  # scalar keyword wrapped
    with pytest.raises(ValueError, match="unknown fields"):
        cli.docs_to_df(spark, [{"_id": "a", "nope": 1}], ct)
    with pytest.raises(ValueError, match="expected an integer"):
        cli.docs_to_df(spark, [{"_id": "a", "year": "2000"}], ct)


# ---------------------------------------------------------------------------
# end-to-end lifecycle
# ---------------------------------------------------------------------------


def _run(capsys, spark, argv):
    rc = cli.main(argv, spark=spark)
    assert rc == 0
    return json.loads(capsys.readouterr().out)


def test_cli_lifecycle(spark, tmp_path, capsys):
    idx = str(tmp_path / "idx")
    schema_path = tmp_path / "schema.json"
    schema_path.write_text(json.dumps({
        "doc_id_field": "_id",
        "text_fields": [{"name": "body", "analyzer": "default",
                         "stored": True, "indexed": True}],
        "keyword_fields": [{"name": "lang", "stored": True,
                            "indexed": True, "fast": True}],
        "numeric_fields": [{"name": "year", "i64": True, "fast": True}],
    }))
    out = _run(capsys, spark, ["init", idx, str(schema_path)])
    assert out["created"] is True
    # re-init refuses (the reference errors when the index exists)
    with pytest.raises(SystemExit):
        cli.main(["init", idx, str(schema_path)], spark=spark)

    # empty index searches cleanly
    out = _run(capsys, spark, ["search", idx, "-q", "rust"])
    assert out["hits"] == [] and out["total_hits_estimate"] == 0

    docs = tmp_path / "docs.jsonl"
    docs.write_text("\n".join(json.dumps(d) for d in [
        {"_id": "a", "body": "rust is a fast systems language",
         "lang": "en", "year": 2015},
        {"_id": "b", "body": "python is easy to learn",
         "lang": ["en", "scripting"], "year": 1991},
        {"_id": "c", "body": "rust draft", "lang": "de", "year": 2015},
        # same key later in the file wins (writer.rs:127-150 fold)
        {"_id": "c", "body": "rust ist schnell", "lang": "de", "year": 2015},
    ]))
    assert _run(capsys, spark, ["add", idx, str(docs)]) == {"queued": 3}
    assert _run(capsys, spark, ["commit", idx]) == {"committed": True}

    out = _run(capsys, spark, ["search", idx, "-q", "rust", "--return-stored"])
    got = {h["fields"]["_id"]: h["fields"]["body"] for h in out["hits"]}
    assert set(got) == {"a", "c"}
    assert got["c"] == "rust ist schnell"  # last line won
    assert out["hits"][0]["score"] >= out["hits"][1]["score"]

    # update = upsert alias
    upd = tmp_path / "upd.jsonl"
    upd.write_text(json.dumps({"_id": "a", "body": "golang now",
                               "lang": "en", "year": 2020}))
    assert _run(capsys, spark, ["update", idx, str(upd)]) == {"queued": 1}
    assert _run(capsys, spark, ["commit", idx]) == {"committed": True}
    out = _run(capsys, spark, ["search", idx, "-q", "rust"])
    assert {h["fields"]["_id"] for h in out["hits"]} == {"c"}

    # sorted search goes through match-only mode
    out = _run(capsys, spark, ["search", idx, "-q", "rust OR python",
                               "--sort", "year:asc", "--limit", "5"])
    years = [h["fields"]["year"] for h in out["hits"]]
    assert years == sorted(years)

    # delete + commit
    ids = tmp_path / "ids.txt"
    ids.write_text("c\n")
    assert _run(capsys, spark, ["delete", idx, str(ids)]) == {"queued": 1}
    assert _run(capsys, spark, ["commit", idx]) == {"committed": True}
    out = _run(capsys, spark, ["search", idx, "-q", "rust"])
    assert out["hits"] == []

    # inspect + compact keep the index queryable
    out = _run(capsys, spark, ["inspect", idx])
    # 3 original + the upserted `a` version; superseded/deleted rows
    # stay tombstoned in the snapshot until compaction merges them out
    assert out["manifest"]["stats"]["n_docs"] == 4
    assert _run(capsys, spark, ["compact", idx]) == {"compacted": True}
    out = _run(capsys, spark, ["inspect", idx])
    assert out["manifest"]["stats"]["n_docs"] == 2  # tombstone applied
    out = _run(capsys, spark, ["search", idx, "-q", "python"])
    assert [h["fields"]["_id"] for h in out["hits"]] == ["b"]

    # request-file path and validation errors
    req = tmp_path / "req.json"
    req.write_text(json.dumps({"query": "python", "limit": 1,
                               "return_stored": True}))
    out = _run(capsys, spark, ["search", idx, "--request", str(req)])
    assert len(out["hits"]) == 1
    with pytest.raises(SystemExit):
        cli.main(["search", idx, "-q", "x", "--limit", "0"], spark=spark)
    with pytest.raises(SystemExit):
        cli.main(["search", idx], spark=spark)  # no query, no request


def test_cli_delete_validates_ids(spark, tmp_path):
    ids = tmp_path / "ids.txt"
    ids.write_text("ok\nbad\x01id\n")
    with pytest.raises(SystemExit, match="invalid id"):
        cli.cmd_delete(spark, str(tmp_path / "nowhere"), str(ids))
    empty = tmp_path / "empty.txt"
    empty.write_text("\n")
    with pytest.raises(SystemExit, match="no document ids"):
        cli.cmd_delete(spark, str(tmp_path / "nowhere"), str(empty))


def test_cli_snapshots_and_as_of(spark, tmp_path, capsys):
    """`snapshots` lists the commit log; `search --as-of N` serves the
    pre-delete snapshot through the CLI."""
    idx = str(tmp_path / "tt_idx")
    schema_path = tmp_path / "schema.json"
    schema_path.write_text(json.dumps({
        "doc_id_field": "_id",
        "text_fields": [{"name": "body", "analyzer": "default",
                         "stored": True, "indexed": True}],
    }))
    _run(capsys, spark, ["init", idx, str(schema_path)])
    docs = tmp_path / "docs.jsonl"
    docs.write_text("\n".join(json.dumps(d) for d in [
        {"_id": "a", "body": "rust is fast"},
        {"_id": "b", "body": "rust is safe"},
    ]))
    _run(capsys, spark, ["add", idx, str(docs)])
    _run(capsys, spark, ["commit", idx])

    log = _run(capsys, spark, ["snapshots", idx])["snapshots"]
    assert log and log[-1]["current"] is True
    v_pre = log[-1]["version"]

    ids = tmp_path / "ids.txt"
    ids.write_text("a\n")
    _run(capsys, spark, ["delete", idx, str(ids)])
    _run(capsys, spark, ["commit", idx])

    cur = _run(capsys, spark, ["search", idx, "-q", "rust",
                               "--return-stored"])
    assert {h["fields"]["_id"] for h in cur["hits"]} == {"b"}
    old = _run(capsys, spark, ["search", idx, "-q", "rust",
                               "--return-stored", "--as-of", str(v_pre)])
    assert {h["fields"]["_id"] for h in old["hits"]} == {"a", "b"}

    # expired / never-committed versions fail loudly
    from searchlite_spark.index.catalog import SnapshotExpiredError
    with pytest.raises(SnapshotExpiredError):
        cli.main(["search", idx, "-q", "rust", "--as-of", "99999"],
                 spark=spark)
