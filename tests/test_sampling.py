"""Domain-mixture sampling and per-stratum token budgets
(textops/sampling.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from searchlite_spark.textops import (
    mixture_fractions,
    sample_by_fractions,
    sample_tokens,
)


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [(i, "src%d" % (i % 3), ("tok " * (1 + i % 5)).strip())
            for i in range(3000)]
    return spark.createDataFrame(rows, "doc_id LONG, source STRING, text STRING")


def test_mixture_fractions_arithmetic():
    # the scarce stratum binds: wiki keeps everything, web downsamples
    fr = mixture_fractions({"wiki": 100, "web": 1000}, {"wiki": 1, "web": 1})
    assert fr == {"wiki": 1.0, "web": pytest.approx(0.1)}
    # strata absent from the target are dropped from the result
    fr2 = mixture_fractions({"a": 10, "b": 10, "c": 5}, {"a": 2, "b": 1})
    assert fr2 == {"a": 1.0, "b": pytest.approx(0.5)}
    with pytest.raises(ValueError, match="no observed documents"):
        mixture_fractions({"a": 10}, {"a": 1, "ghost": 1})
    with pytest.raises(ValueError, match="positive weight"):
        mixture_fractions({"a": 10}, {"a": 0})


def test_sample_by_fractions_deterministic(corpus):
    fr = {"src0": 1.0, "src1": 0.5}
    s = sample_by_fractions(corpus, "source", fr, seed=7)
    counts = {r["source"]: r["cnt"] for r in
              s.groupBy("source").agg(F.count("*").alias("cnt")).collect()}
    assert counts["src0"] == 1000          # fraction 1.0 keeps all
    assert "src2" not in counts            # unlisted stratum dropped
    assert 400 < counts["src1"] < 600      # ~half, md5-uniform
    # same seed, different partitioning -> byte-identical subset
    # (sampleBy's RNG cannot promise this; the md5 draw does)
    s2 = sample_by_fractions(corpus.repartition(13), "source", fr, seed=7)
    assert sorted(r["doc_id"] for r in s.collect()) == \
        sorted(r["doc_id"] for r in s2.collect())
    # a different seed draws a different subset
    s3 = sample_by_fractions(corpus, "source", fr, seed=8)
    assert sorted(r["doc_id"] for r in s3.collect()) != \
        sorted(r["doc_id"] for r in s.collect())
    with pytest.raises(ValueError, match="in \\[0, 1\\]"):
        sample_by_fractions(corpus, "source", {"src0": 1.5})


def _offline_replay(rows, budgets):
    expect, cum = [], {}
    for r in rows:  # rows pre-sorted by (source, doc_id)
        b = budgets.get(r["source"])
        if b is None:
            continue
        before = cum.get(r["source"], 0)
        if before < b:
            expect.append((r["doc_id"], r["source"], r["n"], before))
        cum[r["source"]] = before + r["n"]
    return sorted(expect)


def test_sample_tokens_exact_and_partition_independent(corpus):
    ordered = corpus.select(
        "doc_id", "source",
        F.size(F.split("text", r"\s+")).alias("n"),
    ).orderBy("source", "doc_id").collect()

    got = sorted(map(tuple, sample_tokens(corpus, 50, strata_col="source")
                     .collect()))
    assert got == _offline_replay(ordered, {s: 50 for s in
                                            ("src0", "src1", "src2")})
    # budget is a floor: every stratum reaches >= 50 tokens and the
    # crossing doc is kept (tokens_before < budget)
    agg = {r["source"]: r for r in
           sample_tokens(corpus, 50, strata_col="source")
           .groupBy("source")
           .agg(F.sum("n_tokens").alias("tok"),
                F.max("tokens_before").alias("mb")).collect()}
    for r in agg.values():
        assert r["tok"] >= 50 and r["mb"] < 50

    # per-stratum dict budgets + unlisted strata dropped + any
    # partition count gives the identical subset
    budgets = {"src0": 50, "src2": 30}
    for parts in (1, 3, 16):
        got2 = sorted(map(tuple, sample_tokens(
            corpus, budgets, strata_col="source",
            num_partitions=parts).collect()))
        assert got2 == _offline_replay(ordered, budgets)
    with pytest.raises(ValueError, match="positive"):
        sample_tokens(corpus, 0, strata_col="source")
    with pytest.raises(ValueError, match="positive"):
        sample_tokens(corpus, {"src0": -1}, strata_col="source")


def test_sample_tokens_pretokenized_col(corpus):
    pre = corpus.withColumn("nt", F.size(F.split("text", r"\s+")))
    a = sorted(map(tuple, sample_tokens(
        corpus, 40, strata_col="source").collect()))
    b = sorted(map(tuple, sample_tokens(
        pre, 40, strata_col="source", n_tokens_col="nt").collect()))
    assert a == b


def test_sample_tokens_null_strata_dropped(spark):
    rows = [(1, "a", "x y z"), (2, None, "x y"), (3, "a", "x")]
    df = spark.createDataFrame(rows, "doc_id LONG, source STRING, text STRING")
    got = sorted(map(tuple, sample_tokens(df, 100, strata_col="source")
                     .collect()))
    assert got == [(1, "a", 3, 0), (3, "a", 1, 3)]  # NULL stratum gone


def test_sample_by_fractions_many_strata(spark):
    """The stratum lookup is a literal map, not a CASE WHEN chain —
    a 2000-stratum mixture must plan and run."""
    rows = [(i, "d%d" % (i % 2000)) for i in range(4000)]
    df = spark.createDataFrame(rows, "doc_id LONG, source STRING")
    fr = {("d%d" % s): 1.0 for s in range(2000)}
    assert sample_by_fractions(df, "source", fr).count() == 4000


def test_assign_splits_deterministic_and_partitioning(spark):
    import hashlib

    from searchlite_spark.textops import assign_splits

    df = spark.createDataFrame(
        [(i, f"t{i}") for i in range(500)], "doc_id LONG, text STRING"
    )
    w = {"train": 0.8, "val": 0.1, "test": 0.1}
    a = {r["doc_id"]: r["split"] for r in assign_splits(df, w).collect()}
    b = {r["doc_id"]: r["split"]
         for r in assign_splits(df.repartition(13), w).collect()}
    assert a == b
    # offline replay of the draw and thresholds (same arithmetic)
    t1 = 0.8 / 1.0
    t2 = t1 + 0.1 / 1.0
    for i, s in a.items():
        u = int(hashlib.md5(f"0:{i}".encode()).hexdigest()[:15], 16) / float(1 << 60)
        want = "train" if u < t1 else ("val" if u < t2 else "test")
        assert s == want, i
    # rough proportions
    from collections import Counter
    c = Counter(a.values())
    assert 330 < c["train"] < 470 and c["val"] > 10 and c["test"] > 10


def test_assign_splits_validation(spark):
    import pytest as _pt

    from searchlite_spark.textops import assign_splits

    df = spark.createDataFrame([(0, "x")], "doc_id LONG, text STRING")
    with _pt.raises(ValueError):
        assign_splits(df, {})
    with _pt.raises(ValueError):
        assign_splits(df, {"a": -1.0})
    with _pt.raises(ValueError):
        assign_splits(df, {"a": 0.0})
    one = assign_splits(df, {"only": 3.0}).collect()
    assert one[0]["split"] == "only"


def test_sample_n_per_stratum_exact_and_offline(spark):
    import hashlib

    from searchlite_spark.textops import sample_n_per_stratum

    rows = [(i, ["a", "b", "c"][i % 3] if i % 17 else None) for i in range(400)]
    df = spark.createDataFrame(rows, "doc_id LONG, lang STRING")
    out = sample_n_per_stratum(df, 7, strata_col="lang").collect()
    got = {}
    for r in out:
        got.setdefault(r["lang"], []).append(r["doc_id"])

    def u(i):
        return int(hashlib.md5(f"0:{i}".encode()).hexdigest()[:15], 16) / float(1 << 60)

    want = {}
    for i, lang in rows:
        if lang is not None:
            want.setdefault(lang, []).append(i)
    for lang, ids in want.items():
        ids.sort(key=lambda i: (u(i), i))
        assert sorted(got[lang]) == sorted(ids[:7]), lang
    # partition invariance
    out2 = sample_n_per_stratum(df.repartition(11), 7, strata_col="lang").collect()
    assert sorted((r["lang"], r["doc_id"]) for r in out2) == sorted(
        (r["lang"], r["doc_id"]) for r in out)


def test_sample_n_per_stratum_small_and_starved(spark):
    from searchlite_spark.textops import sample_n_per_stratum

    df = spark.createDataFrame(
        [(i, "x" if i < 3 else "y") for i in range(200)],
        "doc_id LONG, lang STRING",
    )
    # stratum x has 3 < n=5 rows -> all 3 returned
    out = sample_n_per_stratum(df, 5, strata_col="lang").collect()
    xs = [r for r in out if r["lang"] == "x"]
    ys = [r for r in out if r["lang"] == "y"]
    assert len(xs) == 3 and len(ys) == 5
    # a degenerate prefilter margin starves every stratum -> the exact
    # fallback must still deliver the true top-n
    starved = sample_n_per_stratum(
        df, 5, strata_col="lang", prefilter_margin=1e-9
    ).collect()
    assert sorted((r["lang"], r["doc_id"]) for r in starved) == sorted(
        (r["lang"], r["doc_id"]) for r in out)
