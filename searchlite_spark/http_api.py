"""HTTP surface: the reference's ``searchlite-http`` service re-hosted
on Spark — same routes, same JSON request/response/error contracts.

Route table (searchlite-http/src/lib.rs:327-338):

    GET  /healthz    {"status": "ok"}
    POST /init       body = schema JSON          -> {"created": true}
    POST /add        body = NDJSON documents     -> {"queued": N}
    POST /bulk       body = {"docs": [...]}      -> {"queued": N}
    POST /delete     body = {"ids": [...]}       -> {"queued": N}
    POST /commit                                 -> {"committed": true}
    POST /refresh                                -> {"refreshed": true}
    POST /compact                                -> {"compacted": true}
    POST /search     body = search request JSON  -> search response
                     ?as_of=N serves from committed snapshot N
                     (time travel; 410 snapshot_expired when GC'd)
    GET  /inspect                                -> {"manifest": {...}}
    GET  /snapshots                              -> {"snapshots": [...]}
    GET  /stats      {documents, deleted_documents, segments,
                      committed_at, index_uuid, index_path}

Errors are the reference's envelope (lib.rs:110-121):
``{"error": {"type": "...", "reason": "..."}}`` with the same kinds
(index_exists 409, invalid_document / missing_documents / invalid_id /
missing_ids / invalid_limit / search_failed 400, index_missing 404,
oversized bodies 413).

Concurrency model, mapped from the reference's AppState
(lib.rs:84-92 + 229-295): ONE writer lock serializes every mutating
route (the reference holds ``writer_lock`` across add/bulk/delete/
commit/compact); searches run lock-free against the current reader
snapshot.  The "reader" here is a cached ``Searcher`` over the current
manifest — ``/refresh`` (and ``/commit`` with ``refresh_on_commit``)
swaps in a fresh one, exactly the reference's reader-reload contract
(lib.rs:559-563 trigger_reader_refresh).  Spark-side: a Searcher pins
only the slim fast-field projection and the term dictionary
(query/engine.py:120-127), so the swap unpersists the old snapshot's
cache before replacing it.

Implementation is stdlib-only (http.server.ThreadingHTTPServer) — the
sandbox has no web framework, and the handler work is all
request-shaping; query execution happens in Spark either way.
"""

from __future__ import annotations

import json
import threading
import time
from dataclasses import dataclass
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import urlparse

import os


@dataclass
class ServeArgs:
    """lib.rs:44-83 ServeArgs (the flags that exist in a single-process
    Python server; per-request timeouts/concurrency caps belong to the
    fronting proxy here)."""

    index: str
    bind: str = "127.0.0.1:8080"
    require_existing_index: bool = False
    refresh_on_commit: bool = False
    max_body_bytes: int = 50 * 1024 * 1024


class HttpError(Exception):
    def __init__(self, status: int, kind: str, reason: str):
        super().__init__(reason)
        self.status = status
        self.kind = kind
        self.reason = reason


def _bad_request(kind: str, reason: str) -> HttpError:
    return HttpError(400, kind, reason)


class AppState:
    def __init__(self, args: ServeArgs, spark):
        self.args = args
        self.spark = spark
        self.index_path = args.index
        self.writer_lock = threading.Lock()
        self._searcher = None
        self._searcher_lock = threading.Lock()
        if args.require_existing_index and not self.manifest_exists():
            raise FileNotFoundError(
                f"index does not exist at {args.index} "
                "(started with require_existing_index)"
            )

    def manifest_exists(self) -> bool:
        return os.path.exists(os.path.join(self.index_path, "manifest.json"))

    def require_index(self):
        from searchlite_spark.index.catalog import Index

        if not self.manifest_exists():
            raise HttpError(
                404, "index_missing", "index does not exist at this path"
            )
        return Index(path=self.index_path, spark=self.spark)

    def searcher(self):
        """Current reader snapshot; built lazily, swapped by refresh()."""
        from searchlite_spark.query.engine import Searcher

        with self._searcher_lock:
            if self._searcher is None:
                self._searcher = Searcher(self.require_index())
            return self._searcher

    def refresh(self) -> None:
        """Reader reload (lib.rs trigger_reader_refresh): drop the old
        snapshot's pinned DataFrames, next search builds a fresh
        Searcher over the current manifest."""
        with self._searcher_lock:
            old, self._searcher = self._searcher, None
        if old is not None:
            for df in (old.docs, old.terms):
                try:
                    df.unpersist()
                except Exception:
                    pass


def _parse_ndjson(body: bytes) -> list[dict]:
    docs = []
    try:
        text = body.decode("utf-8")
    except UnicodeDecodeError as e:
        raise _bad_request("invalid_document", f"request body is not UTF-8: {e}")
    for line_no, line in enumerate(text.splitlines(), start=1):
        line = line.strip()
        if not line:
            continue
        try:
            value = json.loads(line)
        except json.JSONDecodeError as e:
            raise _bad_request(
                "invalid_document",
                f"invalid JSON document on NDJSON line {line_no}: {e}",
            )
        if not isinstance(value, dict):
            raise _bad_request(
                "invalid_document",
                "document must be a JSON object with fields at the top level",
            )
        docs.append(value)
    return docs


def _validate_ids(ids) -> None:
    """lib.rs:718-744 validate_ids — the shared contract lives in
    cli.check_ids so the CLI and HTTP surfaces cannot drift."""
    from searchlite_spark.cli import check_ids

    try:
        check_ids(ids)
    except ValueError as e:
        raise _bad_request("invalid_id", str(e))


def _queue_documents(state: AppState, docs: list[dict]) -> int:
    """Shared /add + /bulk tail: fold last-wins, one WAL batch, writer
    lock held (the reference queues per doc under the same lock;
    the fold preserves its op-order commit semantics — cli.py)."""
    from searchlite_spark.cli import corpus_type_of, docs_to_df, fold_last_wins
    from searchlite_spark.index.writer import IndexWriter

    # index existence is checked even for an empty batch: a missing
    # index must 404 on every index-scoped route, not report queued: 0
    index = state.require_index()
    if not docs:
        return 0
    with state.writer_lock:
        try:
            with IndexWriter(state.spark, index.path) as w:
                folded = fold_last_wins(docs, w.schema.doc_id_field)
                df = docs_to_df(
                    state.spark, folded, corpus_type_of(state.spark, index.path)
                )
                return w.add_documents(df)
        except HttpError:
            raise
        except ValueError as e:
            raise _bad_request("add_failed", str(e))


def handle(
    state: AppState, method: str, path: str, body: bytes, query: str = ""
) -> tuple[int, dict]:
    """Route one request; returns (status, response json dict).
    Pure request-shaping — kept free of socket plumbing so tests can
    drive it directly and the BaseHTTPRequestHandler stays thin.
    ``query`` is the raw URL query string (time-travel search uses
    ``/search?as_of=N``; the JSON body stays exactly the reference's
    search-request contract)."""
    if method == "GET" and path == "/healthz":
        return 200, {"status": "ok"}

    if method == "POST" and path == "/init":
        schema_json = _parse_json_body(body, "schema")
        if state.manifest_exists():
            raise HttpError(409, "index_exists", "index already exists at this path")
        from searchlite_spark.cli import create_index

        try:
            create_index(state.spark, state.index_path, schema_json)
        except (ValueError, KeyError, TypeError) as e:
            # ValueError covers SchemaError AND the schema module's own
            # fail-fast errors (unknown analyzer, bad edge_ngram grams)
            raise _bad_request("init_failed", str(e))
        return 200, {"created": True}

    if method == "POST" and path == "/add":
        docs = _parse_ndjson(body)
        return 200, {"queued": _queue_documents(state, docs)}

    if method == "POST" and path == "/bulk":
        payload = _parse_json_body(body, "bulk request")
        docs = payload.get("docs")
        if not docs:
            raise _bad_request(
                "missing_documents", "docs array must contain at least one document"
            )
        if not isinstance(docs, list) or not all(isinstance(d, dict) for d in docs):
            raise _bad_request(
                "invalid_document",
                "document must be a JSON object with fields at the top level",
            )
        return 200, {"queued": _queue_documents(state, docs)}

    if method == "POST" and path == "/delete":
        payload = _parse_json_body(body, "delete request")
        ids = payload.get("ids")
        if not ids:
            raise _bad_request(
                "missing_ids", "ids array must contain at least one document id"
            )
        _validate_ids(ids)
        index = state.require_index()
        from searchlite_spark.index.writer import IndexWriter

        with state.writer_lock:
            with IndexWriter(state.spark, index.path) as w:
                w.delete_documents(ids)
        return 200, {"queued": len(ids)}

    if method == "POST" and path == "/commit":
        index = state.require_index()
        from searchlite_spark.index.writer import IndexWriter

        with state.writer_lock:
            with IndexWriter(state.spark, index.path) as w:
                w.commit()
        if state.args.refresh_on_commit:
            state.refresh()
        return 200, {"committed": True}

    if method == "POST" and path == "/refresh":
        state.require_index()
        state.refresh()
        return 200, {"refreshed": True}

    if method == "POST" and path == "/compact":
        state.require_index()
        from searchlite_spark.index.maintenance import compact_in_place

        with state.writer_lock:
            # versioned-table rewrite: the old snapshot's dirs survive
            # until the NEXT compaction, so searches running (or even
            # mid-flight) on the cached reader never lose their files;
            # refresh() just swaps new requests onto the new snapshot
            compact_in_place(state.spark, state.index_path)
            state.refresh()
        return 200, {"compacted": True}

    if method == "POST" and path == "/search":
        request = _parse_json_body(body, "search request")
        limit = request.get("limit", 10)
        if not isinstance(limit, int) or isinstance(limit, bool) or limit <= 0:
            raise _bad_request(
                "invalid_limit",
                "invalid limit: must be greater than zero "
                "(set limit to a positive integer)",
            )
        from searchlite_spark.query.validate import RequestValidationError

        searcher = state.searcher
        as_of = _parse_as_of(query)
        if as_of is not None:
            from searchlite_spark.index.catalog import (
                SnapshotExpiredError,
                load_snapshot,
            )
            from searchlite_spark.query.engine import Searcher

            state.require_index()
            try:
                snap = load_snapshot(state.index_path, state.spark, as_of)
            except SnapshotExpiredError as e:
                # 410 Gone: the snapshot existed but is no longer
                # servable — never silently fall back to current
                raise HttpError(410, "snapshot_expired", str(e))
            searcher = lambda: Searcher(snap)  # noqa: E731
        try:
            result = searcher().search(request)
        except RequestValidationError as e:
            raise _bad_request("search_failed", str(e))
        except ValueError as e:
            raise _bad_request("search_failed", str(e))
        return 200, result

    if method == "GET" and path == "/inspect":
        return 200, {"manifest": state.require_index().manifest}

    if method == "GET" and path == "/snapshots":
        from searchlite_spark.index.catalog import list_snapshots

        state.require_index()
        return 200, {"snapshots": list_snapshots(state.index_path)}

    if method == "GET" and path == "/stats":
        index = state.require_index()
        manifest = index.manifest
        deleted = 0
        if index.has_tombstones():
            deleted = index.tombstones().count()
        lineage = manifest.get("lineage", {}) or {}
        appends = lineage.get("appends", []) or []
        committed_at = (
            (appends[-1].get("at") if appends else None)
            or lineage.get("built_at")
            or ""
        )
        return 200, {
            # live documents: the manifest's stats are snapshot-scoped
            # (tombstones apply at merge), so subtract the pending set
            "documents": int(manifest["stats"]["n_docs"]) - int(deleted),
            "deleted_documents": int(deleted),
            # the lake layout is logically single-segment (all BM25
            # stats are global, catalog.py module docstring); each
            # append commit adds files within that one segment
            "segments": 1,
            "committed_at": committed_at,
            "index_uuid": lineage.get("build_id") or "",
            "index_path": state.index_path,
        }

    raise HttpError(404, "not_found", f"no route for {method} {path}")


def _parse_as_of(query: str) -> int | None:
    """``as_of=N`` from the URL query string; absent -> None, malformed
    or non-positive -> 400 (a typo'd version must not silently search
    current)."""
    if not query:
        return None
    from urllib.parse import parse_qs

    vals = parse_qs(query).get("as_of")
    if not vals:
        return None
    try:
        v = int(vals[-1])
    except ValueError:
        v = 0
    if v <= 0:
        raise _bad_request(
            "invalid_as_of", "as_of must be a positive snapshot version"
        )
    return v


def _parse_json_body(body: bytes, what: str) -> dict:
    try:
        value = json.loads(body.decode("utf-8") or "null")
    except (json.JSONDecodeError, UnicodeDecodeError) as e:
        raise _bad_request("invalid_json", f"invalid {what} JSON: {e}")
    if not isinstance(value, dict):
        raise _bad_request("invalid_json", f"{what} must be a JSON object")
    return value


class _Handler(BaseHTTPRequestHandler):
    # set by make_server
    state: AppState = None  # type: ignore[assignment]
    protocol_version = "HTTP/1.1"

    def log_message(self, fmt, *args):  # quiet; the CLI prints the bind line
        pass

    def _respond(self, status: int, payload: dict) -> None:
        from searchlite_spark.cli import jsonable

        data = json.dumps(jsonable(payload), default=str).encode("utf-8")
        self.send_response(status)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(data)))
        self.end_headers()
        self.wfile.write(data)

    def _error(self, status: int, kind: str, reason: str) -> None:
        self._respond(status, {"error": {"type": kind, "reason": reason}})

    def _serve(self, method: str) -> None:
        parsed = urlparse(self.path)
        path, query = parsed.path, parsed.query
        length = int(self.headers.get("Content-Length") or 0)
        if length > self.state.args.max_body_bytes:
            # lib.rs:346-360 map_413.  The oversized body is NOT read:
            # close the connection so unread bytes can't be parsed as
            # the next request on a keep-alive socket
            self.close_connection = True
            self._error(413, "payload_too_large", "request body exceeds the limit")
            return
        body = self.rfile.read(length) if length else b""
        try:
            status, payload = handle(self.state, method, path, body, query)
            self._respond(status, payload)
        except HttpError as e:
            self._error(e.status, e.kind, e.reason)
        except Exception as e:  # the reference maps join/IO errors to 500
            self._error(500, "internal", str(e))

    def do_GET(self):  # noqa: N802 (stdlib handler naming)
        self._serve("GET")

    def do_POST(self):  # noqa: N802
        self._serve("POST")


def make_server(args: ServeArgs, spark) -> ThreadingHTTPServer:
    state = AppState(args, spark)
    host, _, port = args.bind.rpartition(":")
    handler = type("BoundHandler", (_Handler,), {"state": state})
    return ThreadingHTTPServer((host or "127.0.0.1", int(port)), handler)


def serve(args: ServeArgs, spark) -> None:  # pragma: no cover — CLI path
    server = make_server(args, spark)
    host, port = server.server_address[:2]
    print(f"searchlite-spark http listening on {host}:{port} index={args.index}")
    started = time.time()
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        print(f"shutting down after {time.time() - started:.0f}s")
    finally:
        server.server_close()
