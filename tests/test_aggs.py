"""Aggregation semantics vs reference tests/aggregations.rs flavors:
exact expected buckets, the date_histogram fixed-interval ceil quirk,
composite pagination, pipeline aggs."""

import pytest

from searchlite_spark.query import Searcher
from searchlite_spark.query.aggs import run_aggregations

DAY = 86_400_000


@pytest.fixture(scope="module")
def agg_index(spark, tmp_path_factory):
    from searchlite_spark.index import (
        IndexSchema, KeywordField, NumericField, TextField, build_index,
    )

    rows = []
    # 12 docs: tag cycles a,a,b; score = i*10; ts = i days + 1ms
    for i in range(12):
        tag = ["alpha", "alpha", "beta"][i % 3]
        rows.append((f"d{i:02d}", "rust systems", tag, i * 10, i * DAY + 1))
    corpus = spark.createDataFrame(
        rows, "_id STRING, body STRING, tag STRING, score LONG, ts_ms LONG"
    )
    schema = IndexSchema(
        doc_id_field="_id",
        text_fields=(TextField("body"),),
        keyword_fields=(KeywordField("tag"),),
        numeric_fields=(NumericField("score"), NumericField("ts_ms")),
    )
    out = str(tmp_path_factory.mktemp("agg_index"))
    return build_index(spark, corpus, schema, out, num_partitions=2)


@pytest.fixture(scope="module")
def s(agg_index):
    return Searcher(agg_index)


@pytest.fixture(scope="module")
def matches(s):
    m = s.match_set({"query": "rust"})
    m = m.persist()
    m.count()
    return m


def test_terms_with_sub_stats(s, matches):
    out = run_aggregations(
        matches, s.docs,
        {"tags": {"type": "terms", "field": "tag", "size": 10,
                  "aggs": {"sc": {"type": "stats", "field": "score"}}}},
    )
    buckets = out["tags"]["buckets"]
    assert [(b["key"], b["doc_count"]) for b in buckets] == [
        ("alpha", 8), ("beta", 4),
    ]
    alpha = buckets[0]["sc"]
    # alpha docs: i in 0,1,3,4,6,7,9,10 -> scores 0,10,30,40,60,70,90,100
    assert alpha["count"] == 8
    assert alpha["min"] == 0.0 and alpha["max"] == 100.0
    assert alpha["sum"] == 400.0
    assert abs(alpha["avg"] - 50.0) < 1e-9


def test_histogram_floor_and_bounds(s, matches):
    out = run_aggregations(
        matches, s.docs,
        {"h": {"type": "histogram", "field": "score", "interval": 50.0,
               "extended_bounds": {"min": 0, "max": 149}}},
    )
    buckets = out["h"]["buckets"]
    # scores 0..110 step 10: bucket 0 -> 5 docs (0-40), 50 -> 5, 100 -> 2, 150 scaffolded? 149 -> floor=2*50=100; bounds up to key 100
    assert [(b["key"], b["doc_count"]) for b in buckets] == [
        (0.0, 5), (50.0, 5), (100.0, 2),
    ]


def test_date_histogram_fixed_ceil_quirk(s, matches):
    out = run_aggregations(
        matches, s.docs,
        {"dh": {"type": "date_histogram", "field": "ts_ms", "interval": "1d"}},
    )
    buckets = out["dh"]["buckets"]
    # ts = i*DAY + 1 -> ceil((i*DAY+1)/DAY) = i+1 -> key (i+1)*DAY: the
    # reference's ceil quirk (aggs/mod.rs:3391-3395)
    assert buckets[0]["key"] == DAY
    assert len(buckets) == 12
    assert all(b["doc_count"] == 1 for b in buckets)


def test_date_histogram_calendar_month(s, matches):
    out = run_aggregations(
        matches, s.docs,
        {"dh": {"type": "date_histogram", "field": "ts_ms", "interval": "month"}},
    )
    buckets = out["dh"]["buckets"]
    # days 0..11 of Jan 1970 -> one month bucket at epoch 0
    assert [(b["key"], b["doc_count"]) for b in buckets] == [(0, 12)]


def test_range_buckets(s, matches):
    out = run_aggregations(
        matches, s.docs,
        {"r": {"type": "range", "field": "score",
               "ranges": [{"key": "lo", "to": 40},
                          {"key": "mid", "from": 50, "to": 80},
                          {"key": "hi", "from": 90}]}},
    )
    assert [(b["key"], b["doc_count"]) for b in out["r"]["buckets"]] == [
        ("lo", 5), ("mid", 4), ("hi", 3),
    ]


def test_composite_pagination(s, matches):
    spec = {"c": {"type": "composite", "size": 3,
                  "sources": [{"type": "terms", "name": "t", "field": "tag"},
                              {"type": "histogram", "name": "h",
                               "field": "score", "interval": 60.0}]}}
    out1 = run_aggregations(matches, s.docs, spec)
    b1 = out1["c"]["buckets"]
    assert len(b1) == 3
    after = out1["c"]["after_key"]
    spec2 = {"c": {"type": "composite", "size": 10, "after": after,
                   "sources": spec["c"]["sources"]}}
    out2 = run_aggregations(matches, s.docs, spec2)
    b2 = out2["c"]["buckets"]
    keys1 = [(b["key"]["t"], b["key"]["h"]) for b in b1]
    keys2 = [(b["key"]["t"], b["key"]["h"]) for b in b2]
    assert keys1 + keys2 == sorted(set(keys1 + keys2))
    assert not set(keys1) & set(keys2)


def test_cardinality_and_value_count(s, matches):
    out = run_aggregations(
        matches, s.docs,
        {"c": {"type": "cardinality", "field": "tag"},
         "v": {"type": "value_count", "field": "tag"}},
    )
    assert out["c"]["value"] == 2
    assert out["v"]["value"] == 12


def test_percentile_ranks(s, matches):
    out = run_aggregations(
        matches, s.docs,
        {"pr": {"type": "percentile_ranks", "field": "score", "values": [50, 110]}},
    )
    vals = out["pr"]["values"]
    assert abs(vals["50.0"] - (6 / 12 * 100)) < 1e-9
    assert abs(vals["110.0"] - 100.0) < 1e-9


def test_significant_terms(s):
    m = s.match_set({
        "query": {"type": "bool", "must": [{"type": "term", "field": "body", "value": "rust"}],
                  "filter": [{"I64Range": {"field": "score", "min": 0, "max": 20}}]},
    })
    out = run_aggregations(m, s.docs, {"sig": {"type": "significant_terms", "field": "tag"}})
    buckets = out["sig"]["buckets"]
    # fg: scores 0,10,20 -> tags alpha,alpha,beta; alpha 2/3 vs bg 8/12 -> 1.0; beta 1/3 vs 4/12 -> 1.0
    by_key = {b["key"]: b for b in buckets}
    assert by_key["alpha"]["doc_count"] == 2
    assert abs(by_key["alpha"]["score"] - 1.0) < 1e-9


def test_significant_terms_background_filter(s):
    """Filtered background set (aggs/mod.rs:240-282): fg = rust docs
    with score 0..20 (tags alpha x2, beta x1); bg = docs with score
    0..30 (alpha x3, beta x1, bg_total 4) — the filtered ratios differ
    from the full-corpus ones, so a wrong background is caught."""
    m = s.match_set({
        "query": {"type": "bool", "must": [{"type": "term", "field": "body", "value": "rust"}],
                  "filter": [{"I64Range": {"field": "score", "min": 0, "max": 20}}]},
    })
    out = run_aggregations(m, s.docs, {"sig": {
        "type": "significant_terms", "field": "tag",
        "background_filter": [{"I64Range": {"field": "score", "min": 0, "max": 30}}],
    }})
    by_key = {b["key"]: b for b in out["sig"]["buckets"]}
    # alpha: (2/3)/(3/4) = 8/9; beta: (1/3)/(1/4) = 4/3
    assert by_key["alpha"]["bg_count"] == 3
    assert abs(by_key["alpha"]["score"] - 8 / 9) < 1e-9
    assert by_key["beta"]["bg_count"] == 1
    assert abs(by_key["beta"]["score"] - 4 / 3) < 1e-9
    # beta outranks alpha under the filtered background
    assert out["sig"]["buckets"][0]["key"] == "beta"


def test_significant_terms_background_filter_zero_bg(s):
    """A foreground key absent from the filtered background keeps its
    bucket with bg_count=0 and score=0.0 (mod.rs:2527-2531)."""
    m = s.match_set({
        "query": {"type": "bool", "must": [{"type": "term", "field": "body", "value": "rust"}],
                  "filter": [{"I64Range": {"field": "score", "min": 0, "max": 20}}]},
    })
    out = run_aggregations(m, s.docs, {"sig": {
        "type": "significant_terms", "field": "tag",
        "background_filter": [{"KeywordEq": {"field": "tag", "value": "alpha"}}],
    }})
    by_key = {b["key"]: b for b in out["sig"]["buckets"]}
    assert by_key["beta"]["bg_count"] == 0
    assert by_key["beta"]["score"] == 0.0
    assert by_key["alpha"]["score"] > 0.0


def test_pipeline_derivative_and_moving_avg(s, matches):
    out = run_aggregations(
        matches, s.docs,
        {"h": {"type": "histogram", "field": "score", "interval": 40.0,
               "aggs": {"m": {"type": "avg", "field": "score"}}},
         "d": {"type": "derivative", "buckets_path": "h>m"},
         "ma": {"type": "moving_avg", "buckets_path": "h>_count", "window": 2}},
    )
    buckets = out["h"]["buckets"]
    # buckets: 0(0-30:4 docs avg 15), 40(40-70:4 avg 55), 80(80-110:4 avg 95)
    assert [b["doc_count"] for b in buckets] == [4, 4, 4]
    assert "d" not in buckets[0]
    assert abs(buckets[1]["d"]["value"] - 40.0) < 1e-9
    assert abs(buckets[2]["d"]["value"] - 40.0) < 1e-9
    assert abs(buckets[0]["ma"]["value"] - 4.0) < 1e-9


def test_pipeline_avg_sum_bucket_and_script(s, matches):
    out = run_aggregations(
        matches, s.docs,
        {"h": {"type": "histogram", "field": "score", "interval": 40.0,
               "aggs": {"m": {"type": "sum", "field": "score"}}},
         "ab": {"type": "avg_bucket", "buckets_path": "h>m"},
         "sb": {"type": "sum_bucket", "buckets_path": "h>m"},
         "bs": {"type": "bucket_script",
                "buckets_path": {"total": "h>m", "n": "h>_count"},
                "script": "total / n"}},
    )
    # sums: 60, 220, 380
    assert abs(out["ab"]["value"] - (60 + 220 + 380) / 3) < 1e-9
    assert abs(out["sb"]["value"] - 660.0) < 1e-9
    buckets = out["h"]["buckets"]
    assert abs(buckets[0]["bs"]["value"] - 15.0) < 1e-9


def test_bucket_sort_pipeline(s, matches):
    out = run_aggregations(
        matches, s.docs,
        {"h": {"type": "histogram", "field": "score", "interval": 40.0},
         "srt": {"type": "bucket_sort", "buckets_path": "h>_count",
                 "sort": [{"field": "_key", "order": "desc"}], "size": 2}},
    )
    keys = [b["key"] for b in out["h"]["buckets"]]
    assert keys == [80.0, 40.0]


def test_top_hits(s, matches):
    out = run_aggregations(
        matches, s.docs,
        {"th": {"type": "top_hits", "size": 2,
                "sort": [{"field": "score", "order": "desc"}]}},
    )
    hits = out["th"]["hits"]
    assert len(hits) == 2


def test_rare_terms(s, matches):
    out = run_aggregations(
        matches, s.docs, {"rt": {"type": "rare_terms", "field": "tag",
                                 "max_doc_count": 4}}
    )
    assert [(b["key"], b["doc_count"]) for b in out["rt"]["buckets"]] == [
        ("beta", 4)
    ]


def test_histogram_bucket_cap_overflow(s, matches, monkeypatch):
    """Histogram-family finalize is capped at MAX_BUCKETS (reference
    hard-caps at 10k, aggs/mod.rs:43) — over-cap raises instead of
    materializing unbounded buckets on the driver."""
    from searchlite_spark.query import aggs as A

    monkeypatch.setattr(A, "MAX_BUCKETS", 5)
    with pytest.raises(A.TooManyBucketsError, match="more than 5 buckets"):
        run_aggregations(
            matches, s.docs,
            {"h": {"type": "histogram", "field": "score", "interval": 10.0}},
        )
    with pytest.raises(A.TooManyBucketsError):
        run_aggregations(
            matches, s.docs,
            {"dh": {"type": "date_histogram", "field": "ts_ms",
                    "interval": "1d"}},
        )
    with pytest.raises(A.TooManyBucketsError, match="extended_bounds"):
        # 3 real buckets (under the cap) but the bounds span 21 scaffolded
        run_aggregations(
            matches, s.docs,
            {"h": {"type": "histogram", "field": "score", "interval": 50.0,
                   "extended_bounds": {"min": 0, "max": 1000}}},
        )
    # at/below the cap still works
    monkeypatch.setattr(A, "MAX_BUCKETS", 10_000)
    out = run_aggregations(
        matches, s.docs,
        {"h": {"type": "histogram", "field": "score", "interval": 10.0}},
    )
    assert len(out["h"]["buckets"]) == 12


def test_date_histogram_string_offset(s, matches):
    """validate_aggregations admits offset "1h"; the executor must parse
    it (was: unhandled ValueError)."""
    out = run_aggregations(
        matches, s.docs,
        {"dh": {"type": "date_histogram", "field": "ts_ms",
                "interval": "1d", "offset": "1h"}},
    )
    assert out["dh"]["buckets"]  # parsed and executed
    HOUR = 3_600_000
    # every key is shifted onto the offset grid
    assert all((b["key"] - HOUR) % DAY == 0 for b in out["dh"]["buckets"])
