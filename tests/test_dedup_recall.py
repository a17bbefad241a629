"""Recall/behavior tests for the near-duplicate operators on a seeded
corpus with PLANTED near-dup pairs — row counts alone can't tell a
working LSH from a broken one (round-1 verdict gap).
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from searchlite_spark.textops import (
    minhash_lsh_pairs,
    simhash_near_pairs,
)

N_BASE = 80
N_DUP = 40
DOC_LEN = 120


def _corpus_rows():
    rng = random.Random(7)
    vocab = [f"w{i}" for i in range(500)]
    rows = []
    planted = []
    for i in range(N_BASE):
        toks = [rng.choice(vocab) for _ in range(DOC_LEN)]
        rows.append((i, " ".join(toks)))
        if i < N_DUP:
            dup = list(toks)
            for _ in range(2):  # perturb 2 tokens -> shingle jaccard ~0.9
                dup[rng.randrange(DOC_LEN)] = rng.choice(vocab)
            rows.append((1000 + i, " ".join(dup)))
            planted.append((i, 1000 + i))
    return rows, planted


@pytest.fixture(scope="module")
def corpus(spark):
    rows, planted = _corpus_rows()
    return spark.createDataFrame(rows, "doc_id LONG, text STRING"), planted


def test_minhash_lsh_recall(spark, corpus):
    df, planted = corpus
    got = {
        (r["id_a"], r["id_b"])
        for r in minhash_lsh_pairs(df, threshold=0.6).collect()
    }
    hit = sum(1 for p in planted if p in got)
    recall = hit / len(planted)
    assert recall >= 0.95, f"recall {recall} over {len(planted)} planted pairs"
    # verification step: every reported pair really clears the threshold
    for r in minhash_lsh_pairs(df, threshold=0.6).collect():
        assert r["jaccard"] >= 0.6


def test_minhash_hot_bucket_cap(spark, corpus):
    """A boilerplate cluster larger than the cap is dropped (exact-dedup
    territory) without hurting recall of the genuine near-dups."""
    df, planted = corpus
    boiler = spark.createDataFrame(
        [(5000 + i, "boiler plate page empty nav footer " * 20) for i in range(50)],
        "doc_id LONG, text STRING",
    )
    got = {
        (r["id_a"], r["id_b"])
        for r in minhash_lsh_pairs(
            df.unionByName(boiler), threshold=0.6, max_bucket_size=20
        ).collect()
    }
    assert not any(a >= 5000 and b >= 5000 for a, b in got)
    hit = sum(1 for p in planted if p in got)
    assert hit / len(planted) >= 0.95


def test_bucket_cap_warns_when_it_drops(spark, corpus):
    """Silent truncation is a recall change: when the cap actually
    fires, a RuntimeWarning must name the operator and the dropped
    group count; with no oversized buckets, no warning."""
    import warnings as w

    df, _ = corpus
    boiler = spark.createDataFrame(
        [(5000 + i, "boiler plate page empty nav footer " * 20) for i in range(50)],
        "doc_id LONG, text STRING",
    )
    with w.catch_warnings(record=True) as caught:
        w.simplefilter("always")
        minhash_lsh_pairs(df.unionByName(boiler), threshold=0.6, max_bucket_size=20)
    msgs = [str(c.message) for c in caught if c.category is RuntimeWarning]
    assert any("minhash_lsh_pairs" in m and "dropped" in m for m in msgs)

    with w.catch_warnings(record=True) as caught:
        w.simplefilter("always")
        minhash_lsh_pairs(df, threshold=0.6, max_bucket_size=10_000)
    assert not [c for c in caught if c.category is RuntimeWarning]


def test_simhash_near_pairs_recall(spark, corpus):
    df, planted = corpus
    out = simhash_near_pairs(df, max_hamming=12).collect()
    got = {(r["id_a"], r["id_b"]) for r in out}
    hit = sum(1 for p in planted if p in got)
    assert hit / len(planted) >= 0.9, f"{hit}/{len(planted)}"
    for r in out:
        assert 0 <= r["hamming"] <= 12


def test_simhash_identical_docs_hamming_zero(spark):
    df = spark.createDataFrame(
        [(1, "alpha beta gamma delta"), (2, "alpha beta gamma delta"),
         (3, "totally different words here entirely unrelated")],
        "doc_id LONG, text STRING",
    )
    out = {(r["id_a"], r["id_b"]): r["hamming"]
           for r in simhash_near_pairs(df, max_hamming=3).collect()}
    assert out.get((1, 2)) == 0
    assert not any(k for k in out if 3 in k)


def test_lsh_ann_recall_on_clustered_vectors(spark):
    """LSH ANN with multiprobe recovers the brute-force top-k on
    clustered data (recall was previously untested beyond smoke)."""
    import random

    from searchlite_spark.textops import cosine_topk, lsh_ann_topk

    rng = random.Random(11)
    dim = 16
    query = [1.0] * dim
    rows = []
    for i in range(100):  # near cluster: query + small noise
        rows.append((i, [1.0 + rng.uniform(-0.05, 0.05) for _ in range(dim)]))
    for i in range(100, 200):  # far: random signs
        rows.append((i, [rng.choice([-1.0, 1.0]) * rng.uniform(0.5, 1.5)
                         for _ in range(dim)]))
    df = spark.createDataFrame(rows, "vec_id LONG, embedding ARRAY<DOUBLE>")
    brute = [r["vec_id"] for r in cosine_topk(df, query, k=10).collect()]
    approx = [r["vec_id"]
              for r in lsh_ann_topk(df, query, k=10, planes=8,
                                    multiprobe=8).collect()]
    recall = len(set(brute) & set(approx)) / 10
    assert recall >= 0.8, f"recall {recall}: brute={brute} approx={approx}"


def test_quantized_cosine_matches_reference_rule(spark):
    """int8 quantization parity with quant.rs:1-3: (v*127) as i8 —
    saturating, truncating toward zero — and the quantized ranking
    tracks the exact cosine ranking on well-separated vectors."""
    import numpy as np

    from searchlite_spark.textops import (
        cosine_topk,
        quantize_embeddings,
        quantize_query,
        quantized_cosine_topk,
    )

    rng = np.random.default_rng(7)
    base = rng.normal(size=(3, 16))
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    rows = []
    for i in range(90):
        v = base[i % 3] + rng.normal(scale=0.05, size=16)
        v /= np.linalg.norm(v)
        rows.append((i, [float(x) for x in v]))
    # edge values exercise saturation + truncation
    rows.append((900, [1.5, -1.5] + [0.0] * 14))
    df = spark.createDataFrame(rows, "vec_id LONG, embedding ARRAY<DOUBLE>")

    # column quantizer == reference rule computed in numpy
    got = {
        r["vec_id"]: r["embedding_q"]
        for r in quantize_embeddings(df).select("vec_id", "embedding_q").collect()
    }
    for vid, vec in rows:
        expect = [max(min(int(x * 127.0), 127), -128) for x in vec]
        assert got[vid] == expect, vid
    assert got[900][:2] == [127, -128]  # saturated
    assert quantize_query(rows[0][1]) == [
        max(min(int(x * 127.0), 127), -128) for x in rows[0][1]
    ]

    # quantized top-k ≈ exact top-k on separated clusters
    q = rows[0][1]
    exact = [r["vec_id"] for r in cosine_topk(df, q, k=10).collect()]
    quant = [r["vec_id"] for r in quantized_cosine_topk(df, q, k=10).collect()]
    assert len(set(exact) & set(quant)) >= 8


def test_lsh_bucket_table_partition_pruning(spark, tmp_path_factory):
    """The scale claim of the LSH layout: written partitionBy(tbl,
    bucket), a probe reads only the probed partitions — visible as
    PartitionFilters on the scan, not a full-table scan."""
    import io
    import contextlib

    import numpy as np
    from pyspark.sql import functions as F

    from searchlite_spark.textops.similarity import lsh_bucket_table

    rng = np.random.default_rng(3)
    rows = [(i, [float(x) for x in rng.normal(size=8)]) for i in range(400)]
    df = spark.createDataFrame(rows, "vec_id LONG, embedding ARRAY<DOUBLE>")
    out = str(tmp_path_factory.mktemp("lsh_layout"))
    lsh_bucket_table(df, dim=8, planes=4, tables=2).write.partitionBy(
        "tbl", "bucket"
    ).mode("overwrite").parquet(out)

    table = spark.read.parquet(out)
    probe = table.where((F.col("tbl") == 0) & F.col("bucket").isin([3, 5]))
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        probe.explain("formatted")
    plan = buf.getvalue()
    assert "PartitionFilters" in plan
    # the partition predicates must reach the scan (not a post-filter)
    pf_line = next(l for l in plan.splitlines() if "PartitionFilters" in l)
    assert "tbl" in pf_line and "bucket" in pf_line
    # and the probe answers correctly
    got = probe.select("vec_id", "tbl", "bucket").collect()
    assert got and all(r["tbl"] == 0 and r["bucket"] in (3, 5) for r in got)
