"""Request-contract validation — the Spark-side mirror of the
reference's published API contract (`search-request.schema.json`; the
HTTP surface rejects bodies serde cannot deserialize,
searchlite-http/src/lib.rs /search route).

Every check runs BEFORE any Spark job is planned, so a malformed
request fails in milliseconds with a precise message instead of a
silently-ignored block (the "typo'd `rescor` returns unrescored hits"
class of wrong answer).  Two deliberate deltas from the reference,
both stricter:

* unknown TOP-LEVEL keys are rejected.  The schema publishes
  ``additionalProperties: true`` and serde ignores unknown fields, so
  the reference silently drops them — exactly the silent-wrong-answer
  trap this module exists to close.  Known-but-unserved keys
  (``vector_query``/``vector_filter``, served here by
  textops.hybrid_multi_topk) get a pointed redirect instead of a
  generic "unknown key".
* nested blocks whose schema says ``additionalProperties: false``
  (sort specs, highlight, highlight fields, collapse, inner_hits,
  rescore, fuzzy) reject unknown keys too, per the schema.

Repo extensions accepted beyond the schema: ``search_after`` (keyset
pagination values), ``track_total_hits`` (bool | int),
``aggregations`` as an alias of ``aggs``, ``filter`` as a LIST of
nodes (the reference takes one node; a list is implicit And —
filters.rs compile_filters), and plain-string sort entries.
"""

from __future__ import annotations

from typing import Any


class RequestValidationError(ValueError):
    """Malformed search request — raised before any job is planned."""


_EXECUTIONS = ("bm25", "wand", "bmw")
_RESCORE_MODES = ("total", "sum", "multiply", "max", "min")

# key -> validator(value) (None = checked elsewhere / any shape)
_KNOWN_KEYS = (
    "query",
    "fields",
    "filter",
    "limit",
    "return_hits",
    "candidate_size",
    "sort",
    "cursor",
    "search_after",
    "execution",
    "bmw_block_size",
    "fuzzy",
    "return_stored",
    "highlight_field",
    "highlight",
    "collapse",
    "aggs",
    "aggregations",
    "suggest",
    "rescore",
    "explain",
    "profile",
    "track_total_hits",
)

_REDIRECTS = {
    "vector_query": (
        "`vector_query` is served by "
        "searchlite_spark.textops.hybrid_multi_topk in this engine"
    ),
    "vector_filter": (
        "`vector_filter` is served by "
        "searchlite_spark.textops.hybrid_multi_topk in this engine"
    ),
}


def _err(msg: str) -> RequestValidationError:
    return RequestValidationError(msg)


def _require(cond: bool, msg: str) -> None:
    if not cond:
        raise _err(msg)


def _is_int(v: Any) -> bool:
    return isinstance(v, int) and not isinstance(v, bool)


def _check_keys(body: dict, allowed: tuple, where: str) -> None:
    unknown = [k for k in body if k not in allowed]
    if unknown:
        raise _err(
            f"unknown key `{unknown[0]}` in {where} "
            f"(allowed: {', '.join(sorted(allowed))})"
        )


def _check_sort_spec(s: Any, where: str) -> None:
    if isinstance(s, str):
        return  # repo extension: bare field name, order asc
    _require(
        isinstance(s, dict),
        f"{where} entries must be a field name or "
        "{'field': ..., 'order': 'asc'|'desc'}",
    )
    _check_keys(s, ("field", "order"), where)
    _require("field" in s, f"{where} entry missing required `field`")
    _require(isinstance(s["field"], str), f"{where} `field` must be a string")
    if "order" in s:
        _require(
            s["order"] in ("asc", "desc"),
            f"{where} `order` must be 'asc' or 'desc'",
        )


def _check_filter_node(node: Any, where: str) -> None:
    _require(
        isinstance(node, dict) and len(node) == 1,
        f"{where} must be a single-key filter node "
        "(KeywordEq / KeywordIn / I64Range / F64Range / And / Or / Not "
        "/ Nested)",
    )


def validate_request(request: Any) -> None:
    """Raise RequestValidationError on any shape the engine would not
    serve exactly as written.  Deep aggregation validation stays in
    aggs.validate_aggregations (called on the job path); this covers
    the rest of the request surface."""
    _require(isinstance(request, dict), "search request must be a dict")
    for k in request:
        if k in _REDIRECTS:
            raise _err(_REDIRECTS[k])
        if k not in _KNOWN_KEYS:
            raise _err(
                f"unknown top-level request key `{k}` "
                f"(allowed: {', '.join(sorted(_KNOWN_KEYS))})"
            )
    _require("query" in request, "search request missing required `query`")
    q = request["query"]
    _require(
        isinstance(q, (str, dict)),
        "`query` must be a query string or a structured query node",
    )

    if request.get("fields") is not None:
        f = request["fields"]
        _require(
            isinstance(f, (list, tuple))
            and all(isinstance(x, str) for x in f),
            "`fields` must be a list of field names",
        )
    if request.get("filter") is not None:
        flt = request["filter"]
        if isinstance(flt, dict):
            _check_filter_node(flt, "`filter`")
        else:
            _require(
                isinstance(flt, (list, tuple)),
                "`filter` must be a filter node or a list of filter nodes",
            )
            for node in flt:
                _check_filter_node(node, "`filter` entry")
    if "limit" in request:
        _require(
            _is_int(request["limit"]) and request["limit"] >= 1,
            "`limit` must be an integer >= 1",
        )
    for k in ("return_hits", "return_stored", "explain", "profile"):
        if k in request:
            _require(isinstance(request[k], bool), f"`{k}` must be a boolean")
    if request.get("candidate_size") is not None:
        _require(
            _is_int(request["candidate_size"])
            and request["candidate_size"] >= 1,
            "`candidate_size` must be an integer >= 1",
        )
    if request.get("sort") is not None:
        _require(
            isinstance(request["sort"], (list, tuple)),
            "`sort` must be a list of sort specs",
        )
        for s in request["sort"]:
            _check_sort_spec(s, "`sort`")
    if request.get("cursor") is not None:
        _require(isinstance(request["cursor"], str), "`cursor` must be a string")
    if request.get("search_after") is not None:
        sa = request["search_after"]
        if isinstance(sa, dict):
            # generation-tagged cursor form (engine search() returns
            # resp["cursor"] = {"values": [...], "generation": ...};
            # feeding it back verbatim is the documented resume path —
            # staleness itself is checked by _apply_search_after)
            _require(
                isinstance(sa.get("values"), (list, tuple)),
                "`search_after` cursor dict must carry a `values` list",
            )
        else:
            _require(
                isinstance(sa, (list, tuple)),
                "`search_after` must be the previous page's sort values "
                "or the cursor dict from the previous response",
            )
    if "execution" in request:
        _require(
            request["execution"] in _EXECUTIONS,
            f"`execution` must be one of {_EXECUTIONS}",
        )
    if request.get("bmw_block_size") is not None:
        _require(
            _is_int(request["bmw_block_size"]) and request["bmw_block_size"] >= 1,
            "`bmw_block_size` must be an integer >= 1",
        )
    if request.get("fuzzy") is not None:
        fz = request["fuzzy"]
        _require(isinstance(fz, dict), "`fuzzy` must be an options object")
        _check_keys(
            fz,
            ("max_edits", "prefix_length", "max_expansions", "min_length"),
            "`fuzzy`",
        )
        for k, v in fz.items():
            _require(_is_int(v) and v >= 0, f"`fuzzy.{k}` must be an integer >= 0")
    if request.get("highlight_field") is not None:
        _require(
            isinstance(request["highlight_field"], str),
            "`highlight_field` must be a field name",
        )
    if request.get("highlight") is not None:
        hl = request["highlight"]
        _require(isinstance(hl, dict), "`highlight` must be an object")
        _check_keys(
            hl,
            ("fields", "pre_tag", "post_tag", "fragment_size",
             "number_of_fragments"),
            "`highlight`",
        )
        _require(
            isinstance(hl.get("fields", {}), dict),
            "`highlight.fields` must map field names to options",
        )
        for fname, cfg in (hl.get("fields") or {}).items():
            _require(
                isinstance(cfg, dict),
                f"`highlight.fields.{fname}` must be an options object",
            )
            _check_keys(
                cfg,
                ("pre_tag", "post_tag", "fragment_size",
                 "number_of_fragments"),
                f"`highlight.fields.{fname}`",
            )
            for k in ("pre_tag", "post_tag"):
                if k in cfg:
                    _require(
                        isinstance(cfg[k], str),
                        f"`highlight.fields.{fname}.{k}` must be a string",
                    )
            for k in ("fragment_size", "number_of_fragments"):
                if k in cfg:
                    _require(
                        _is_int(cfg[k]) and cfg[k] >= 1,
                        f"`highlight.fields.{fname}.{k}` must be an "
                        "integer >= 1",
                    )
    if request.get("collapse") is not None:
        col = request["collapse"]
        _require(isinstance(col, dict), "`collapse` must be an object")
        _check_keys(col, ("field", "inner_hits"), "`collapse`")
        _require("field" in col, "`collapse` missing required `field`")
        _require(
            isinstance(col["field"], str), "`collapse.field` must be a string"
        )
        if col.get("inner_hits") is not None:
            ih = col["inner_hits"]
            _require(
                isinstance(ih, dict), "`collapse.inner_hits` must be an object"
            )
            _check_keys(ih, ("size", "from", "sort"), "`collapse.inner_hits`")
            for k in ("size", "from"):
                if k in ih:
                    _require(
                        _is_int(ih[k]) and ih[k] >= 0,
                        f"`collapse.inner_hits.{k}` must be an integer >= 0",
                    )
            if ih.get("sort") is not None:
                _require(
                    isinstance(ih["sort"], (list, tuple)),
                    "`collapse.inner_hits.sort` must be a list",
                )
                for s in ih["sort"]:
                    _check_sort_spec(s, "`collapse.inner_hits.sort`")
    for key in ("aggs", "aggregations"):
        if request.get(key) is not None:
            _require(
                isinstance(request[key], dict)
                and all(isinstance(v, dict) for v in request[key].values()),
                f"`{key}` must map names to aggregation objects",
            )
    if request.get("suggest") is not None:
        sug = request["suggest"]
        _require(
            isinstance(sug, dict), "`suggest` must map names to suggesters"
        )
        for name, cfg in sug.items():
            _require(
                isinstance(cfg, dict), f"`suggest.{name}` must be an object"
            )
            _check_keys(
                cfg, ("type", "field", "prefix", "size", "fuzzy"),
                f"`suggest.{name}`",
            )
            _require(
                "field" in cfg and "prefix" in cfg,
                f"`suggest.{name}` requires `field` and `prefix`",
            )
            _require(
                isinstance(cfg["field"], str)
                and isinstance(cfg["prefix"], str),
                f"`suggest.{name}` field/prefix must be strings",
            )
            if "size" in cfg:
                _require(
                    _is_int(cfg["size"]) and cfg["size"] >= 1,
                    f"`suggest.{name}.size` must be an integer >= 1",
                )
    if request.get("rescore") is not None:
        rs = request["rescore"]
        _require(isinstance(rs, dict), "`rescore` must be an object")
        _check_keys(rs, ("window_size", "query", "score_mode"), "`rescore`")
        _require(
            "window_size" in rs and "query" in rs,
            "`rescore` requires `window_size` and `query`",
        )
        _require(
            _is_int(rs["window_size"]) and rs["window_size"] >= 1,
            "`rescore.window_size` must be an integer >= 1",
        )
        _require(
            isinstance(rs["query"], (str, dict)),
            "`rescore.query` must be a query string or node",
        )
        if "score_mode" in rs:
            _require(
                rs["score_mode"] in _RESCORE_MODES,
                f"`rescore.score_mode` must be one of {_RESCORE_MODES}",
            )
    if "track_total_hits" in request:
        t = request["track_total_hits"]
        _require(
            isinstance(t, bool) or _is_int(t),
            "`track_total_hits` must be a boolean or an integer cap",
        )
