"""Gopher-style repetition/quality signals and URL canonicalization.

Hand-computed expectations — the formulas are the contract, so each
signal is pinned on a document where the value is derivable on paper.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from searchlite_spark.textops import (
    gopher_quality,
    repetition_stats,
    url_dedup,
    url_normalize,
)


def _one(df):
    rows = df.collect()
    assert len(rows) == 1
    return rows[0].asDict()


def test_repetition_dup_lines(spark):
    # 4 lines, "hello world" twice -> dup_line_frac 2/4, chars 22/48
    docs = spark.createDataFrame(
        [(1, "a b a b a b c d\nhello world\nhello world\nunique line")],
        "doc_id long, text string",
    )
    r = _one(repetition_stats(docs))
    assert r["dup_line_frac"] == 0.5
    assert r["dup_line_char_frac"] == 0.4583  # floor(22/48 * 1e4)/1e4


def test_repetition_top_ngram(spark):
    # "x x" appears 3x overlapping in "x x x x": mass 3*3=9, text 7 chars -> capped? 9/7>1 -> 1.0
    docs = spark.createDataFrame([(1, "x x x x")], "doc_id long, text string")
    r = _one(repetition_stats(docs, top_ngram=2, dup_ngram=3))
    assert r["top_ngram_char_frac"] == 1.0
    # 3-grams: "x x x" twice -> dup mass 2*5=10 -> capped 1.0
    assert r["dup_ngram_char_frac"] == 1.0


def test_repetition_no_repeats(spark):
    docs = spark.createDataFrame(
        [(1, "one two three four five")], "doc_id long, text string"
    )
    r = _one(repetition_stats(docs))
    assert r["dup_line_frac"] == 0.0
    assert r["dup_line_char_frac"] == 0.0
    assert r["dup_ngram_char_frac"] == 0.0
    # every 2-gram occurs once; max char mass is "three four" = 10 of 23
    assert r["top_ngram_char_frac"] == 0.4347


def test_repetition_empty(spark):
    docs = spark.createDataFrame([(1, "")], "doc_id long, text string")
    r = _one(repetition_stats(docs))
    assert all(
        r[k] == 0.0
        for k in (
            "dup_line_frac",
            "dup_line_char_frac",
            "top_ngram_char_frac",
            "dup_ngram_char_frac",
        )
    )


def test_gopher_signals(spark):
    text = "the quick brown fox jumps over that lazy dog with ### energy"
    docs = spark.createDataFrame([(1, text)], "doc_id long, text string")
    r = _one(gopher_quality(docs, min_words=5))
    assert r["n_words"] == 12
    # 49 word chars / 12 words
    assert r["mean_word_len"] == 4.0833
    assert r["alpha_frac"] == 0.9166  # "###" has no alpha
    assert r["symbol_ratio"] == 0.25  # 3 '#' / 12 words
    assert r["stop_hits"] == 3  # the, that, with
    assert r["keep"] is False  # symbol_ratio > 0.1


def test_gopher_keep_happy_path(spark):
    text = (
        "the committee said that all members have agreed to proceed "
        "with the plan and review it again next quarter"
    )
    docs = spark.createDataFrame([(1, text)], "doc_id long, text string")
    r = _one(gopher_quality(docs, min_words=5))
    assert r["keep"] is True


def test_gopher_bullet_and_ellipsis_lines(spark):
    text = "- first bullet\n- second bullet\nreal sentence continues..."
    docs = spark.createDataFrame([(1, text)], "doc_id long, text string")
    r = _one(gopher_quality(docs, min_words=1))
    assert r["bullet_frac"] == 0.6666
    assert r["ellipsis_frac"] == 0.3333


def test_url_normalize_variants(spark):
    cases = [
        ("HTTP://Example.COM:80/a/b/?utm_source=x&b=2&a=1#frag",
         "http://example.com/a/b?a=1&b=2"),
        ("https://Example.com:443/", "https://example.com/"),
        ("https://example.com", "https://example.com/"),
        ("http://example.com:8080/a", "http://example.com:8080/a"),
        ("https://example.com:80/a", "https://example.com:80/a"),  # not default for https
        ("http://example.com/a?fbclid=zzz", "http://example.com/a"),
        ("http://example.com/?gclid=1&x=2", "http://example.com/?x=2"),
    ]
    df = spark.createDataFrame([(u,) for u, _ in cases], "url string")
    got = [
        r["n"]
        for r in df.select(url_normalize(F.col("url")).alias("n")).collect()
    ]
    assert got == [want for _, want in cases]


def test_url_dedup_latest_wins(spark):
    rows = [
        (1, "http://a.com/x", 100),
        (2, "HTTP://A.COM:80/x", 300),  # same canonical, freshest
        (3, "http://a.com/x/", 200),
        (4, "http://b.com/y", 50),
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string, warc_ts long")
    out = {
        r["canonical_url"]: r["doc_id"]
        for r in url_dedup(df, "url", "warc_ts", "doc_id").collect()
    }
    assert out == {"http://a.com/x": 2, "http://b.com/y": 4}


def test_url_dedup_tie_breaks_on_id(spark):
    rows = [
        (7, "http://a.com/x", 100),
        (9, "http://a.com/x#f", 100),
        (8, "http://a.com/x/", 100),
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string, warc_ts long")
    (r,) = url_dedup(df, "url", "warc_ts", "doc_id").collect()
    assert r["doc_id"] == 9
