"""Aggregation request-validation matrix (reader.rs:3641-3975 parity):
field-kind checks, sampling exclusivity/ranges, histogram interval and
bounds rules, date_histogram interval grammar, top_hits sort checks.
Pure config validation — no Spark session involved."""

from __future__ import annotations

import pytest

from searchlite_spark.index import (
    IndexSchema,
    KeywordField,
    NumericField,
    TextField,
)
from searchlite_spark.query.aggs import (
    AggregationConfigError,
    validate_aggregations,
)

SCHEMA = IndexSchema(
    doc_id_field="doc_id",
    text_fields=(TextField("text"),),
    keyword_fields=(KeywordField("lang"),),
    numeric_fields=(NumericField("rank"), NumericField("ts")),
)


def ok(aggs):
    validate_aggregations(SCHEMA, aggs)


def bad(aggs, match):
    with pytest.raises(AggregationConfigError, match=match):
        validate_aggregations(SCHEMA, aggs)


# ---- field-kind checks -------------------------------------------------

def test_terms_requires_keyword():
    ok({"a": {"terms": {"field": "lang"}}})
    bad({"a": {"terms": {"field": "rank"}}}, "fast keyword")
    bad({"a": {"terms": {"field": "text"}}}, "fast keyword")
    bad({"a": {"terms": {"field": "nope"}}}, "fast keyword")


def test_numeric_aggs_require_numeric():
    for kind in ("histogram", "range", "stats", "extended_stats",
                 "value_count", "percentiles", "percentile_ranks"):
        body = {"field": "lang"}
        if kind == "histogram":
            body["interval"] = 1
        bad({"a": {kind: body}}, "fast numeric")
    ok({"a": {"stats": {"field": "rank"}}})


def test_cardinality_accepts_both_kinds():
    ok({"a": {"cardinality": {"field": "lang"}}})
    ok({"a": {"cardinality": {"field": "rank"}}})
    bad({"a": {"cardinality": {"field": "text"}}}, "keyword or numeric")


def test_subaggs_validated_recursively():
    bad(
        {"a": {"terms": {"field": "lang",
                         "aggs": {"s": {"stats": {"field": "lang"}}}}}},
        "fast numeric",
    )


# ---- sampling ---------------------------------------------------------

def test_sampling_exclusivity_and_ranges():
    bad({"a": {"terms": {"field": "lang",
                         "sampling": {"size": 10, "probability": 0.5}}}},
        "both size and probability")
    bad({"a": {"terms": {"field": "lang",
                         "sampling": {"probability": 1.5}}}},
        "between 0 and 1")
    bad({"a": {"terms": {"field": "lang", "sampling": {"size": 0}}}},
        "greater than 0")
    bad({"a": {"terms": {"field": "lang", "sampling": {"seed": 42}}}},
        "seed requires")
    ok({"a": {"terms": {"field": "lang",
                        "sampling": {"probability": 0.5, "seed": 42}}}})


# ---- histogram --------------------------------------------------------

def test_histogram_interval_and_bounds():
    bad({"a": {"histogram": {"field": "rank", "interval": 0}}},
        "interval > 0")
    bad({"a": {"histogram": {"field": "rank", "interval": 5,
                             "extended_bounds": {"min": 9, "max": 1}}}},
        "min > max")
    bad({"a": {"histogram": {"field": "rank", "interval": 5,
                             "hard_bounds": {"min": 0, "max": 10},
                             "extended_bounds": {"min": -5, "max": 5}}}},
        "within hard_bounds")
    ok({"a": {"histogram": {"field": "rank", "interval": 5,
                            "hard_bounds": {"min": 0, "max": 10},
                            "extended_bounds": {"min": 2, "max": 8}}}})


# ---- date_histogram ---------------------------------------------------

def test_date_histogram_interval_grammar():
    bad({"a": {"date_histogram": {"field": "ts"}}},
        "calendar_interval.*or.*fixed_interval")
    bad({"a": {"date_histogram": {"field": "ts",
                                  "calendar_interval": "fortnight"}}},
        "not supported")
    bad({"a": {"date_histogram": {"field": "ts",
                                  "fixed_interval": "10 parsecs"}}},
        "is invalid")
    bad({"a": {"date_histogram": {"field": "ts", "fixed_interval": "1h",
                                  "offset": "whenever"}}},
        "offset")
    ok({"a": {"date_histogram": {"field": "ts",
                                 "calendar_interval": "month"}}})
    ok({"a": {"date_histogram": {"field": "ts", "fixed_interval": "30m"}}})


def test_date_histogram_bounds_parse_and_order():
    bad({"a": {"date_histogram": {"field": "ts", "fixed_interval": "1d",
                                  "extended_bounds": {"min": "not a date",
                                                      "max": "2024-01-01"}}}},
        "valid date/number")
    bad({"a": {"date_histogram": {"field": "ts", "fixed_interval": "1d",
                                  "extended_bounds": {"min": "2024-02-01",
                                                      "max": "2024-01-01"}}}},
        "min > max")
    ok({"a": {"date_histogram": {"field": "ts", "fixed_interval": "1d",
                                 "extended_bounds": {"min": "2024-01-01",
                                                     "max": "2024-02-01"}}}})


# ---- composite / top_hits / pipelines ---------------------------------

def test_composite_sources_checked():
    bad({"a": {"composite": {
        "sources": [{"type": "terms", "name": "t", "field": "rank"}]}}},
        "fast keyword")
    ok({"a": {"composite": {
        "sources": [{"type": "terms", "name": "t", "field": "lang"},
                    {"type": "histogram", "name": "h", "field": "rank",
                     "interval": 5}]}}})


def test_top_hits_sort_fields_checked():
    bad({"a": {"top_hits": {"sort": [{"field": "text"}]}}},
        "not sortable")
    ok({"a": {"top_hits": {"sort": [{"field": "rank", "order": "desc"},
                                    "_score"]}}})


def test_pipelines_and_unknown():
    ok({"a": {"derivative": {"buckets_path": "x>y"}}})
    bad({"a": {"frobnicate": {"field": "lang"}}}, "unsupported aggregation")


# ---- significant_terms background_filter (aggs/mod.rs:240-282) ----------

def test_background_filter_validates_before_any_job():
    ok({"a": {"significant_terms": {"field": "lang", "background_filter": [
        {"KeywordEq": {"field": "lang", "value": "en"}}]}}})
    ok({"a": {"significant_terms": {"field": "lang", "background_filter": [
        {"And": [{"I64Range": {"field": "rank", "min": 0, "max": 5}},
                 {"Not": {"KeywordIn": {"field": "lang", "values": ["en"]}}}]}]}}})
    # not a list
    bad({"a": {"significant_terms": {"field": "lang",
        "background_filter": {"KeywordEq": {"field": "lang", "value": "en"}}}}},
        "must be a list")
    # unknown node kind
    bad({"a": {"significant_terms": {"field": "lang", "background_filter": [
        {"Regex": {"field": "lang", "value": "e.*"}}]}}}, "unsupported filter")
    # leaf missing a required body key
    bad({"a": {"significant_terms": {"field": "lang", "background_filter": [
        {"I64Range": {"field": "rank", "min": 0}}]}}}, "missing")
    # Nested without path/filter
    bad({"a": {"significant_terms": {"field": "lang", "background_filter": [
        {"Nested": {"path": "props"}}]}}}, "requires")
