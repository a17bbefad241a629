"""HTTP surface tests (searchlite-http/src/lib.rs parity): the route
table, response bodies, and error envelope over a real served index."""

import json
import threading
import urllib.error
import urllib.request

import pytest

from searchlite_spark.http_api import ServeArgs, make_server


@pytest.fixture(scope="module")
def served(spark, tmp_path_factory):
    idx = str(tmp_path_factory.mktemp("http_idx") / "idx")
    server = make_server(ServeArgs(index=idx, bind="127.0.0.1:0"), spark)
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    base = f"http://127.0.0.1:{server.server_address[1]}"

    def call(method, path, body=None, raw=None):
        data = raw if raw is not None else (
            json.dumps(body).encode() if body is not None else None)
        req = urllib.request.Request(base + path, data=data, method=method)
        try:
            with urllib.request.urlopen(req, timeout=300) as r:
                return r.status, json.loads(r.read())
        except urllib.error.HTTPError as e:
            return e.code, json.loads(e.read())

    yield call
    server.shutdown()
    server.server_close()


SCHEMA = {
    "doc_id_field": "_id",
    "text_fields": [{"name": "body", "analyzer": "default",
                     "stored": True, "indexed": True}],
    "keyword_fields": [{"name": "lang", "stored": True,
                        "indexed": True, "fast": True}],
    "numeric_fields": [{"name": "year", "i64": True, "fast": True}],
}


def test_http_lifecycle(served):
    call = served
    assert call("GET", "/healthz") == (200, {"status": "ok"})

    # routes that need an index 404 before /init (require_index,
    # lib.rs:281-295)
    status, body = call("POST", "/search", {"query": "x", "limit": 5})
    assert status == 404 and body["error"]["type"] == "index_missing"

    assert call("POST", "/init", SCHEMA) == (200, {"created": True})
    status, body = call("POST", "/init", SCHEMA)
    assert status == 409 and body["error"]["type"] == "index_exists"

    # /add takes NDJSON; /bulk takes {"docs": [...]}
    nd = (b'{"_id": "a", "body": "rust is fast", "lang": "en", "year": 2015}\n'
          b'\n'
          b'{"_id": "b", "body": "python is easy", "lang": "en", "year": 1991}\n')
    assert call("POST", "/add", raw=nd) == (200, {"queued": 2})
    assert call("POST", "/bulk", {"docs": [
        {"_id": "c", "body": "rust forever", "lang": "de", "year": 2020}
    ]}) == (200, {"queued": 1})
    assert call("POST", "/commit") == (200, {"committed": True})

    status, resp = call("POST", "/search", {"query": "rust", "limit": 10,
                                            "return_stored": True})
    assert status == 200
    assert {h["fields"]["_id"] for h in resp["hits"]} == {"a", "c"}
    assert resp["hits"][0]["score"] >= resp["hits"][1]["score"]

    status, stats = call("GET", "/stats")
    assert status == 200
    assert stats["documents"] == 3 and stats["deleted_documents"] == 0
    assert stats["index_uuid"] and stats["committed_at"]

    # delete + commit; the reader snapshot is stale until /refresh
    # (refresh_on_commit=false, the reference default)
    assert call("POST", "/delete", {"ids": ["a"]}) == (200, {"queued": 1})
    assert call("POST", "/commit") == (200, {"committed": True})
    _, stale = call("POST", "/search", {"query": "rust", "limit": 10})
    assert stale["total_hits_estimate"] == 2
    assert call("POST", "/refresh") == (200, {"refreshed": True})
    _, fresh = call("POST", "/search", {"query": "rust", "limit": 10})
    assert fresh["total_hits_estimate"] == 1

    _, stats = call("GET", "/stats")
    assert stats["documents"] == 2 and stats["deleted_documents"] == 1

    assert call("POST", "/compact") == (200, {"compacted": True})
    _, stats = call("GET", "/stats")
    assert stats["documents"] == 2 and stats["deleted_documents"] == 0

    status, body = call("GET", "/inspect")
    assert status == 200 and body["manifest"]["stats"]["n_docs"] == 2

    _, resp = call("POST", "/search", {"query": "python", "limit": 10,
                                       "return_stored": True})
    assert [h["fields"]["_id"] for h in resp["hits"]] == ["b"]


def test_http_error_envelope(served):
    call = served
    cases = [
        # (method, path, body/raw, expected status, expected error type)
        ("POST", "/search", {"query": "x", "limit": 0}, 400, "invalid_limit"),
        ("POST", "/search", {"query": "x", "limit": 2, "nope": 1},
         400, "search_failed"),
        ("POST", "/bulk", {"docs": []}, 400, "missing_documents"),
        ("POST", "/delete", {"ids": []}, 400, "missing_ids"),
        ("POST", "/delete", {"ids": ["a\x01b"]}, 400, "invalid_id"),
        ("POST", "/delete", {"ids": [" padded "]}, 400, "invalid_id"),
        ("GET", "/nope", None, 404, "not_found"),
    ]
    for method, path, body, want_status, want_type in cases:
        status, resp = call(method, path, body)
        assert status == want_status, (path, resp)
        assert resp["error"]["type"] == want_type, (path, resp)
    # NDJSON parse errors carry the line number (lib.rs:440-447)
    status, resp = call("POST", "/add", raw=b'{"_id": "x"}\n{oops\n')
    assert status == 400
    assert resp["error"]["type"] == "invalid_document"
    assert "line 2" in resp["error"]["reason"]
    # unknown document fields are an add_failed (writer validation)
    status, resp = call(
        "POST", "/bulk",
        {"docs": [{"_id": "x", "body": "t", "lang": "en",
                   "year": 1, "extra": True}]})
    assert status == 400 and resp["error"]["type"] == "add_failed"


def test_http_max_body(spark, tmp_path):
    server = make_server(
        ServeArgs(index=str(tmp_path / "i"), bind="127.0.0.1:0",
                  max_body_bytes=64),
        spark,
    )
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    try:
        url = f"http://127.0.0.1:{server.server_address[1]}/add"
        req = urllib.request.Request(url, data=b"x" * 100, method="POST")
        with pytest.raises(urllib.error.HTTPError) as e:
            urllib.request.urlopen(req, timeout=60)
        assert e.value.code == 413
        assert json.loads(e.value.read())["error"]["type"] == "payload_too_large"
    finally:
        server.shutdown()
        server.server_close()


def test_require_existing_index(spark, tmp_path):
    with pytest.raises(FileNotFoundError):
        make_server(
            ServeArgs(index=str(tmp_path / "missing"), bind="127.0.0.1:0",
                      require_existing_index=True),
            spark,
        )


def test_http_review_fixes(served):
    """Regression cases from the session-4 review: error-contract gaps
    that previously leaked 500s or bypassed checks."""
    call = served
    # schema errors beyond SchemaError (unknown analyzer -> plain
    # ValueError from the schema module) must map to 400, not 500 —
    # exercised via a second server with no index yet
    # (this served index exists, so /init 409s; see below test)
    # invalid UTF-8 NDJSON -> 400 invalid_document, not 500 internal
    status, resp = call("POST", "/add", raw=b"\xff\xfe{}")
    assert status == 400 and resp["error"]["type"] == "invalid_document"
    assert "UTF-8" in resp["error"]["reason"]
    # DEL (0x7f) rejected — the id contract is shared with the CLI
    status, resp = call("POST", "/delete", {"ids": ["a\x7fb"]})
    assert status == 400 and resp["error"]["type"] == "invalid_id"


def test_http_missing_index_and_bad_schema(spark, tmp_path):
    import threading

    server = make_server(
        ServeArgs(index=str(tmp_path / "idx"), bind="127.0.0.1:0"), spark)
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    base = f"http://127.0.0.1:{server.server_address[1]}"

    def call(method, path, body=None, raw=None):
        data = raw if raw is not None else (
            json.dumps(body).encode() if body is not None else None)
        req = urllib.request.Request(base + path, data=data, method=method)
        try:
            with urllib.request.urlopen(req, timeout=300) as r:
                return r.status, json.loads(r.read())
        except urllib.error.HTTPError as e:
            return e.code, json.loads(e.read())

    try:
        # an EMPTY /add body must still 404 on a missing index, never
        # 200 {"queued": 0}
        status, resp = call("POST", "/add", raw=b"\n\n")
        assert status == 404 and resp["error"]["type"] == "index_missing"
        # unknown analyzer raises the schema module's plain ValueError:
        # must be 400 init_failed, not 500 internal
        status, resp = call("POST", "/init", {
            "doc_id_field": "_id",
            "text_fields": [{"name": "t", "analyzer": "nope",
                             "stored": True, "indexed": True}],
        })
        assert status == 400 and resp["error"]["type"] == "init_failed"
        assert "unknown analyzer" in resp["error"]["reason"]
        # a failed init must leave no index behind
        status, _ = call("GET", "/stats")
        assert status == 404
    finally:
        server.shutdown()
        server.server_close()


def test_http_time_travel(spark, tmp_path):
    """/snapshots lists the commit log; /search?as_of=N serves the
    pre-delete snapshot; expired/absent versions are 410, malformed
    400 — never a silent fallback to current."""
    idx = str(tmp_path / "tt_idx")
    server = make_server(ServeArgs(index=idx, bind="127.0.0.1:0"), spark)
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    base = f"http://127.0.0.1:{server.server_address[1]}"

    def call(method, path, body=None, raw=None):
        data = raw if raw is not None else (
            json.dumps(body).encode() if body is not None else None)
        req = urllib.request.Request(base + path, data=data, method=method)
        try:
            with urllib.request.urlopen(req, timeout=300) as r:
                return r.status, json.loads(r.read())
        except urllib.error.HTTPError as e:
            return e.code, json.loads(e.read())

    try:
        assert call("POST", "/init", SCHEMA) == (200, {"created": True})
        nd = (b'{"_id": "a", "body": "rust is fast", "lang": "en", "year": 1}\n'
              b'{"_id": "b", "body": "rust is safe", "lang": "en", "year": 2}\n')
        assert call("POST", "/add", raw=nd) == (200, {"queued": 2})
        assert call("POST", "/commit") == (200, {"committed": True})

        status, log = call("GET", "/snapshots")
        assert status == 200 and log["snapshots"]
        v_pre = log["snapshots"][-1]["version"]
        assert log["snapshots"][-1]["current"] is True

        assert call("POST", "/delete", {"ids": ["a"]}) == (200, {"queued": 1})
        assert call("POST", "/commit") == (200, {"committed": True})
        assert call("POST", "/refresh") == (200, {"refreshed": True})

        _, cur = call("POST", "/search", {"query": "rust", "limit": 10,
                                          "return_stored": True})
        assert {h["fields"]["_id"] for h in cur["hits"]} == {"b"}
        status, old = call(
            "POST", f"/search?as_of={v_pre}",
            {"query": "rust", "limit": 10, "return_stored": True})
        assert status == 200
        assert {h["fields"]["_id"] for h in old["hits"]} == {"a", "b"}

        # the snapshot log grew and marks the new current
        _, log2 = call("GET", "/snapshots")
        versions = [s["version"] for s in log2["snapshots"]]
        assert versions == sorted(versions) and len(versions) >= 2

        status, resp = call("POST", "/search?as_of=0", {"query": "rust"})
        assert status == 400 and resp["error"]["type"] == "invalid_as_of"
        status, resp = call("POST", "/search?as_of=oops", {"query": "rust"})
        assert status == 400 and resp["error"]["type"] == "invalid_as_of"
        status, resp = call("POST", "/search?as_of=99999", {"query": "rust"})
        assert status == 410 and resp["error"]["type"] == "snapshot_expired"
    finally:
        server.shutdown()
        server.server_close()
