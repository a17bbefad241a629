"""Command-line surface: the reference's ``searchlite`` binary re-hosted
on Spark.

Mirrors searchlite-cli/src/main.rs:33-105 subcommand-for-subcommand:

    init <index> <schema.json>       create an empty index from a schema
    add <index> <docs.jsonl>         queue documents (upsert) into the WAL
    update <index> <docs.jsonl>      alias of add (main.rs:113 routes both
                                     to cmd_add)
    delete <index> <ids.txt>         queue deletes by document id
    commit <index>                   fold + persist pending WAL ops
    search <index> -q ... [flags]    run a query, print the response JSON
    http --index <index> [...]       serve the HTTP API (http_api.py)
    inspect <index>                  print the manifest
    snapshots <index>                list the snapshot log (time travel)
    compact <index>                  rewrite the index applying tombstones

``search --as-of N`` is a lake-layout extension (no reference
equivalent): it serves the query from committed snapshot N via
catalog.load_snapshot, failing loudly when the snapshot has expired.

Differences from the reference, all Spark-shaped and documented inline:

* ``add`` reads the whole JSONL file into ONE DataFrame batch (one WAL
  op, one Spark job) instead of one ``add_document`` call per line —
  last-line-wins per key is folded up front so commit-time semantics
  match the reference's per-op BTreeMap fold (writer.rs:127-150)
  exactly.
* keyword fields are stored as ``array<string>`` columns (single
  string values are wrapped on ingest) so single- and multi-valued
  keyword documents share one column type.
* the reference's ``--vector*`` search flags are intentionally absent:
  dense-vector retrieval is served by ``searchlite_spark.textops``
  (hybrid_multi_topk / ann / ivf / pq) over embedding tables, not by
  the inverted-index CLI — the same redirect the request validator
  gives for ``vector_query`` (query/validate.py:69-78).

Schema files use the REFERENCE's published shape
(index-schema.json / searchlite-core/src/api/types.rs Schema):
``{doc_id_field, analyzers, text_fields, keyword_fields,
numeric_fields, nested_fields}`` with per-field ``stored / indexed /
fast / nullable`` flags.  ``stored``/``fast`` are accepted and ignored
(every Parquet column is both — schema.py module docstring);
``indexed: false`` text/keyword fields stay store-only columns.
``vector_fields`` are rejected with the textops redirect.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

from pyspark.sql import types as T

from searchlite_spark.index.schema import (
    IndexSchema,
    KeywordField,
    NumericField,
    TextField,
)


# ---------------------------------------------------------------------------
# schema translation (reference index-schema.json -> IndexSchema + types)
# ---------------------------------------------------------------------------


class SchemaError(ValueError):
    """Malformed or unsupported schema JSON."""


def _ref_filters_to_repo(filters: list) -> list[dict]:
    """Reference token-filter objects are single-key discriminated
    unions ({"lowercase": true} / {"stopwords": "en"} / {"stemmer":
    "english"} / {"synonyms": [...]} / {"edge_ngram": {min,max}},
    index-schema.json $defs/token_filter); the repo's build_analyzer
    takes {"type": ..., ...} dicts."""
    out: list[dict] = []
    for f in filters or []:
        if isinstance(f, dict) and "type" in f:
            out.append(f)  # already repo-shaped
            continue
        if not isinstance(f, dict) or len(f) != 1:
            raise SchemaError(f"token filter must be a single-key object, got {f!r}")
        (kind, cfg), = f.items()
        if kind == "lowercase":
            out.append({"type": "lowercase"})
        elif kind == "stopwords":
            out.append({"type": "stopwords", "stopwords": cfg})
        elif kind == "stemmer":
            out.append({"type": "stemmer", "language": cfg})
        elif kind == "synonyms":
            out.append({"type": "synonyms", "rules": cfg})
        elif kind == "edge_ngram":
            out.append({"type": "edge_ngram", "min": cfg["min"], "max": cfg["max"]})
        else:
            raise SchemaError(f"unknown token filter `{kind}`")
    return out


def _text_field(tf: dict) -> TextField:
    # `tokenizer` / `search_tokenizer` are the schema's deprecated
    # aliases (index-schema.json text_field allOf)
    analyzer = tf.get("analyzer") or tf.get("tokenizer") or "default"
    search = tf.get("search_analyzer") or tf.get("search_tokenizer")
    sayt = tf.get("search_as_you_type")
    grams = None
    if sayt:
        if isinstance(sayt, dict):
            grams = (int(sayt.get("min_gram", 1)), int(sayt.get("max_gram", 15)))
        else:  # repo to_dict shape: [min, max]
            grams = (int(sayt[0]), int(sayt[1]))
    return TextField(
        name=tf["name"],
        analyzer=analyzer,
        search_analyzer=search,
        search_as_you_type=grams,
    )


def _nested_struct_type(fields: list[dict]) -> T.ArrayType:
    """A nested_field declaration becomes an ARRAY<STRUCT<...>> corpus
    column — the repo's native nested representation (Nested filters
    run exists() over it, query/filters.py)."""
    members = []
    for p in fields or []:
        kind = p.get("type")
        if kind in ("text", "keyword"):
            members.append(T.StructField(p["name"], T.StringType(), True))
        elif kind == "numeric":
            dt = T.LongType() if p.get("i64", True) else T.DoubleType()
            members.append(T.StructField(p["name"], dt, True))
        elif kind == "object":
            members.append(
                T.StructField(p["name"], _nested_struct_type(p.get("fields")), True)
            )
        else:
            raise SchemaError(f"unknown nested field type `{kind}`")
    return T.ArrayType(T.StructType(members), True)


def load_schema(d: dict) -> tuple[IndexSchema, T.StructType]:
    """Translate a reference-shaped schema dict into (IndexSchema,
    corpus StructType).  The StructType is the empty-index column
    layout: doc key STRING, text STRING, keyword ARRAY<STRING>,
    numeric LONG/DOUBLE, nested ARRAY<STRUCT>."""
    if d.get("vector_fields"):
        raise SchemaError(
            "vector_fields are served by searchlite_spark.textops "
            "(hybrid_multi_topk / ivf / pq) over embedding tables, not "
            "by the inverted index"
        )
    key = d.get("doc_id_field", "_id")
    analyzers = []
    for a in d.get("analyzers") or []:
        analyzers.append(
            (
                a["name"],
                {
                    "tokenizer": a.get("tokenizer", "default"),
                    "filters": _ref_filters_to_repo(a.get("filters")),
                },
            )
        )
    texts, keywords, numerics = [], [], []
    cols: list[T.StructField] = [T.StructField(key, T.StringType(), False)]
    for tf in d.get("text_fields") or []:
        if tf.get("indexed", True):
            texts.append(_text_field(tf))
        cols.append(T.StructField(tf["name"], T.StringType(), True))
    for kf in d.get("keyword_fields") or []:
        if kf.get("indexed", True):
            keywords.append(KeywordField(kf["name"]))
        cols.append(
            T.StructField(kf["name"], T.ArrayType(T.StringType(), True), True)
        )
    for nf in d.get("numeric_fields") or []:
        i64 = bool(nf.get("i64", True))
        numerics.append(NumericField(nf["name"], i64=i64))
        dt = T.LongType() if i64 else T.DoubleType()
        cols.append(T.StructField(nf["name"], dt, True))
    for obj in d.get("nested_fields") or []:
        cols.append(
            T.StructField(obj["name"], _nested_struct_type(obj.get("fields")), True)
        )
    schema = IndexSchema(
        doc_id_field=key,
        text_fields=tuple(texts),
        keyword_fields=tuple(keywords),
        numeric_fields=tuple(numerics),
        analyzers=tuple(analyzers),
    )
    # fail fast on bad analyzer configs (the reference validates at
    # IndexBuilder::create)
    for t in schema.text_fields:
        schema.index_analyzer_for(t.name)
        schema.search_analyzer_for(t.name)
    return schema, T.StructType(cols)


# ---------------------------------------------------------------------------
# document coercion (JSON values -> corpus column types)
# ---------------------------------------------------------------------------


def _coerce(value, dtype):
    if value is None:
        return None
    if isinstance(dtype, T.ArrayType):
        if isinstance(dtype.elementType, T.StringType) and isinstance(value, str):
            return [value]  # single keyword -> one-element list
        if not isinstance(value, (list, tuple)):
            raise ValueError(f"expected an array, got {value!r}")
        return [_coerce(v, dtype.elementType) for v in value]
    if isinstance(dtype, T.StructType):
        if not isinstance(value, dict):
            raise ValueError(f"expected an object, got {value!r}")
        unknown = sorted(set(value) - {f.name for f in dtype.fields})
        if unknown:
            raise ValueError(f"unknown nested fields {unknown}")
        return tuple(_coerce(value.get(f.name), f.dataType) for f in dtype.fields)
    if isinstance(dtype, T.StringType):
        if not isinstance(value, str):
            raise ValueError(f"expected a string, got {value!r}")
        return value
    if isinstance(dtype, T.LongType):
        if isinstance(value, bool) or not isinstance(value, int):
            raise ValueError(f"expected an integer, got {value!r}")
        return value
    if isinstance(dtype, T.DoubleType):
        if isinstance(value, bool) or not isinstance(value, (int, float)):
            raise ValueError(f"expected a number, got {value!r}")
        return float(value)
    return value


def docs_to_df(spark, docs: list[dict], corpus_type: T.StructType):
    """One DataFrame from parsed JSON docs, validated field-by-field
    (the reference validates each document on add, writer.rs:75-78)."""
    names = {f.name for f in corpus_type.fields}
    rows = []
    for i, doc in enumerate(docs):
        if not isinstance(doc, dict):
            raise ValueError(f"document {i} must be a JSON object")
        unknown = sorted(set(doc) - names)
        if unknown:
            raise ValueError(f"document {i}: unknown fields {unknown}")
        try:
            rows.append(
                tuple(_coerce(doc.get(f.name), f.dataType) for f in corpus_type.fields)
            )
        except ValueError as e:
            raise ValueError(f"document {i}: {e}") from e
    return spark.createDataFrame(rows, corpus_type)


def fold_last_wins(docs: list[dict], key: str) -> list[dict]:
    """Later lines replace earlier ones for the same key — the
    reference's op-order fold (writer.rs:127-150) applied up front so
    the whole file can ship as one duplicate-free WAL batch."""
    byk: dict = {}
    for doc in docs:
        k = doc.get(key)
        if k is None:
            raise ValueError(f"document missing key field `{key}`")
        byk[k] = doc
    return list(byk.values())


# ---------------------------------------------------------------------------
# commands
# ---------------------------------------------------------------------------


def _spark(existing=None):
    if existing is not None:
        return existing
    from searchlite_spark.session import get_spark

    return get_spark("searchlite_cli")


def create_index(spark, index: str, raw_schema: dict) -> None:
    """Empty index from a reference-shaped schema dict (the
    IndexBuilder::create equivalent, api/builder.rs)."""
    schema, corpus_type = load_schema(raw_schema)
    from searchlite_spark.index.build import build_index

    empty = spark.createDataFrame([], corpus_type)
    build_index(spark, empty, schema, index, num_partitions=1)
    # remember the full corpus column types: adds must recreate exactly
    # this layout even for columns an empty build can't infer back
    # (nested structs), and nullable/i64 flags must not drift
    _write_corpus_type(index, corpus_type)


def cmd_init(spark, index: str, schema_path: str) -> dict:
    if os.path.exists(os.path.join(index, "manifest.json")):
        raise SystemExit(f"error: index already exists at {index}")
    with open(schema_path) as f:
        raw = json.load(f)
    create_index(spark, index, raw)
    return {"created": True, "index": index}


def _write_corpus_type(index: str, corpus_type: T.StructType) -> None:
    with open(os.path.join(index, "corpus_type.json"), "w") as f:
        json.dump(json.loads(corpus_type.json()), f, indent=2)


def corpus_type_of(spark, index: str) -> T.StructType:
    p = os.path.join(index, "corpus_type.json")
    if os.path.exists(p):
        with open(p) as f:
            return T.StructType.fromJson(json.load(f))
    # index built by the library API: derive from the docs table
    from searchlite_spark.index.catalog import Index

    full = Index(path=index, spark=spark).docs().schema
    return T.StructType([f for f in full.fields if f.name != "doc_id"])


def _read_jsonl(path: str) -> list[dict]:
    docs = []
    with open(path) as f:
        for line_no, line in enumerate(f, start=1):
            line = line.strip()
            if not line:
                continue
            try:
                docs.append(json.loads(line))
            except json.JSONDecodeError as e:
                raise SystemExit(f"error: invalid JSON on line {line_no}: {e}")
    return docs


def cmd_add(spark, index: str, doc_path: str) -> dict:
    from searchlite_spark.index.writer import IndexWriter

    docs = _read_jsonl(doc_path)
    if not docs:
        return {"queued": 0}
    corpus_type = corpus_type_of(spark, index)
    with IndexWriter(spark, index) as w:
        folded = fold_last_wins(docs, w.schema.doc_id_field)
        df = docs_to_df(spark, folded, corpus_type)
        n = w.add_documents(df)
    return {"queued": n}


def check_ids(ids: list) -> None:
    """The ONE id-validation contract shared by the CLI and the HTTP
    surface (main.rs:276-278 / searchlite-http lib.rs:718-744
    validate_ids): no empties, no surrounding whitespace, no control
    characters (incl. DEL).  Raises ValueError; callers map it to
    their own error envelope."""
    if not isinstance(ids, list) or not all(isinstance(i, str) for i in ids):
        raise ValueError("ids must be an array of strings")
    for idx, raw in enumerate(ids):
        if not raw.strip():
            raise ValueError(f"id at position {idx} is empty")
        if raw != raw.strip():
            raise ValueError(
                f"id at position {idx} has leading or trailing whitespace"
            )
        if any(ord(c) < 32 or ord(c) == 127 for c in raw):
            raise ValueError(f"id at position {idx} contains control characters")


def cmd_delete(spark, index: str, ids_path: str) -> dict:
    from searchlite_spark.index.writer import IndexWriter

    with open(ids_path) as f:
        ids = [ln.strip() for ln in f if ln.strip()]
    if not ids:
        raise SystemExit("error: no document ids provided")
    try:
        check_ids(ids)
    except ValueError as e:
        raise SystemExit(f"error: invalid id ({e})")
    with IndexWriter(spark, index) as w:
        w.delete_documents(ids)
    return {"queued": len(ids)}


def cmd_commit(spark, index: str) -> dict:
    from searchlite_spark.index.writer import IndexWriter

    with IndexWriter(spark, index) as w:
        w.commit()
    return {"committed": True}


def cmd_inspect(spark, index: str) -> dict:
    from searchlite_spark.index.catalog import Index

    return {"manifest": Index(path=index, spark=spark).manifest}


def cmd_compact(spark, index: str) -> dict:
    """In-place compaction with zero reader downtime: every table is
    rewritten into fresh versioned dirs and ONE atomic manifest write
    flips the pointers (maintenance.compact_in_place) — open readers
    keep their snapshot, sidecars (corpus_type.json) stay in place,
    and superseded dirs are reclaimed by the next compaction."""
    from searchlite_spark.index.maintenance import compact_in_place

    compact_in_place(spark, index)
    return {"compacted": True}


def parse_sort(raw: str | None) -> list[dict] | None:
    """`field:asc,other:desc` -> sort specs (main.rs:472-497)."""
    if not raw:
        return None
    out = []
    for clause in raw.split(","):
        clause = clause.strip()
        if not clause:
            continue
        field, _, order = clause.partition(":")
        spec = {"field": field}
        if order:
            if order.lower() not in ("asc", "desc"):
                raise SystemExit(
                    f"error: invalid sort order `{order}` (expected asc or desc)"
                )
            spec["order"] = order.lower()
        out.append(spec)
    return out or None


def build_search_request(args) -> dict:
    """CLI flags -> request dict (main.rs:307-404
    build_search_request_from_cli)."""
    if args.request and args.request_stdin:
        raise SystemExit("error: --request conflicts with --request-stdin")
    if args.request:
        with open(args.request) as f:
            req = json.load(f)
    elif args.request_stdin:
        req = json.load(sys.stdin)
    else:
        if args.query is None:
            raise SystemExit(
                "error: search query is required unless --request or "
                "--request-stdin is provided"
            )
        if args.limit <= 0:
            raise SystemExit(
                "error: search limit must be greater than zero "
                "(set --limit to a positive number)"
            )
        aggs = None
        if args.aggs and args.aggs_file:
            raise SystemExit("error: --aggs conflicts with --aggs-file")
        raw_aggs = args.aggs
        if args.aggs_file:
            with open(args.aggs_file) as f:
                raw_aggs = f.read()
        if raw_aggs and raw_aggs.strip():
            aggs = json.loads(raw_aggs)
        req = {
            "query": args.query,
            "limit": args.limit,
            "execution": args.execution.lower(),
            "return_hits": not args.no_return_hits,
        }
        if args.bmw_block_size is not None:
            req["bmw_block_size"] = args.bmw_block_size
        if args.fields:
            req["fields"] = [s.strip() for s in args.fields.split(",") if s.strip()]
        if args.return_stored:
            req["return_stored"] = True
        if args.highlight:
            req["highlight_field"] = args.highlight
        if args.cursor:
            req["cursor"] = args.cursor
        sort = parse_sort(args.sort)
        if sort:
            req["sort"] = sort
        if aggs:
            req["aggs"] = aggs
    if not isinstance(req, dict) or int(req.get("limit", 10) or 0) <= 0:
        raise SystemExit("error: search request must set limit > 0")
    return req


def cmd_search(spark, index: str, request: dict, as_of: int | None = None) -> dict:
    from searchlite_spark.index.catalog import Index, load_snapshot
    from searchlite_spark.query.engine import Searcher

    if as_of is not None:
        # time-travel read: serve exactly what snapshot `as_of` served
        # when it was current (expired snapshots raise, never lie)
        return Searcher(load_snapshot(index, spark, as_of)).search(request)
    return Searcher(Index(path=index, spark=spark)).search(request)


def cmd_snapshots(spark, index: str) -> dict:
    from searchlite_spark.index.catalog import list_snapshots

    return {"snapshots": list_snapshots(index)}


def jsonable(value):
    """Response dicts carry pyspark Rows for nested stored fields;
    the wire wants JSON objects (the reference stores documents as
    serde_json values, so nested fields round-trip as objects)."""
    from pyspark.sql import Row

    if isinstance(value, Row):
        return {k: jsonable(v) for k, v in value.asDict().items()}
    if isinstance(value, dict):
        return {k: jsonable(v) for k, v in value.items()}
    if isinstance(value, (list, tuple)):
        return [jsonable(v) for v in value]
    return value


# ---------------------------------------------------------------------------
# argv plumbing
# ---------------------------------------------------------------------------


def _parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="searchlite-spark", description="PySpark search engine CLI"
    )
    sub = p.add_subparsers(dest="command", required=True)

    sp = sub.add_parser("init", help="initialize a new index with a schema")
    sp.add_argument("index")
    sp.add_argument("schema")

    for name, hlp in (
        ("add", "add documents from a JSONL file"),
        ("update", "update (upsert) documents from a JSONL file"),
    ):
        sp = sub.add_parser(name, help=hlp)
        sp.add_argument("index")
        sp.add_argument("doc")

    sp = sub.add_parser("delete", help="delete documents by id (newline list)")
    sp.add_argument("index")
    sp.add_argument("ids")

    sp = sub.add_parser("commit", help="commit pending documents")
    sp.add_argument("index")

    sp = sub.add_parser("search", help="execute a search query")
    sp.add_argument("index")
    sp.add_argument("-q", "--query")
    sp.add_argument("--limit", type=int, default=10)
    sp.add_argument("--execution", default="wand")
    sp.add_argument("--bmw-block-size", type=int, default=None)
    sp.add_argument("--fields")
    sp.add_argument("--return-stored", action="store_true")
    sp.add_argument("--highlight")
    sp.add_argument("--cursor")
    sp.add_argument("--no-return-hits", action="store_true")
    sp.add_argument("--sort")
    sp.add_argument("--request")
    sp.add_argument("--request-stdin", action="store_true")
    sp.add_argument("--aggs")
    sp.add_argument("--aggs-file")
    sp.add_argument(
        "--as-of", type=int, default=None,
        help="time-travel: search the index as of a committed snapshot version",
    )

    sp = sub.add_parser("http", help="start the HTTP server for a single index")
    sp.add_argument("--index", required=True)
    sp.add_argument("--bind", default="127.0.0.1:8080")
    sp.add_argument("--require-existing-index", action="store_true")
    sp.add_argument("--refresh-on-commit", action="store_true")
    sp.add_argument("--max-body-bytes", type=int, default=50 * 1024 * 1024)

    sp = sub.add_parser("inspect", help="inspect manifest and stats")
    sp.add_argument("index")

    sp = sub.add_parser("snapshots", help="list the index's snapshot log")
    sp.add_argument("index")

    sp = sub.add_parser("compact", help="compact the index")
    sp.add_argument("index")

    return p


def main(argv: list[str] | None = None, spark=None) -> int:
    args = _parser().parse_args(argv)
    cmd = args.command
    if cmd == "http":
        from searchlite_spark.http_api import ServeArgs, serve

        serve(
            ServeArgs(
                index=args.index,
                bind=args.bind,
                require_existing_index=args.require_existing_index,
                refresh_on_commit=args.refresh_on_commit,
                max_body_bytes=args.max_body_bytes,
            ),
            spark=_spark(spark),
        )
        return 0
    s = _spark(spark)
    if cmd == "init":
        out = cmd_init(s, args.index, args.schema)
    elif cmd in ("add", "update"):
        out = cmd_add(s, args.index, args.doc)
    elif cmd == "delete":
        out = cmd_delete(s, args.index, args.ids)
    elif cmd == "commit":
        out = cmd_commit(s, args.index)
    elif cmd == "search":
        out = cmd_search(s, args.index, build_search_request(args), as_of=args.as_of)
    elif cmd == "inspect":
        out = cmd_inspect(s, args.index)
    elif cmd == "snapshots":
        out = cmd_snapshots(s, args.index)
    elif cmd == "compact":
        out = cmd_compact(s, args.index)
    else:  # pragma: no cover — argparse enforces the choices
        raise SystemExit(f"unknown command {cmd}")
    print(json.dumps(jsonable(out), indent=2, default=str))
    return 0


if __name__ == "__main__":  # pragma: no cover
    sys.exit(main())
