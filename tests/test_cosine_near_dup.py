"""Embedding-cosine near-duplicate pairs (the vector-space member of
the dedup family): planted-pair recall, exact-verify precision, and
hot-bucket cap behavior.
"""

from __future__ import annotations

import math
import random
import warnings

import pytest
from pyspark.sql import functions as F

from searchlite_spark.textops import cosine_near_pairs

DIM = 16
N_BASE = 60
N_DUP = 30


def _vec_rows():
    rng = random.Random(11)
    rows = []
    planted = []
    for i in range(N_BASE):
        v = [rng.gauss(0, 1) for _ in range(DIM)]
        rows.append((i, [float(x) for x in v]))
        if i < N_DUP:
            # small perturbation: cosine stays ~0.99
            d = [x + rng.gauss(0, 0.02) for x in v]
            rows.append((1000 + i, [float(x) for x in d]))
            planted.append((i, 1000 + i))
    return rows, planted


@pytest.fixture(scope="module")
def vecs(spark):
    rows, planted = _vec_rows()
    return (
        spark.createDataFrame(rows, "vec_id LONG, embedding ARRAY<FLOAT>"),
        planted,
    )


def test_exact_copies_found_with_certainty(spark, vecs):
    """Identical vectors share every LSH signature deterministically —
    every planted exact copy MUST appear regardless of table count."""
    df, _ = vecs
    base = df.where(F.col("vec_id") < 1000)
    doubled = base.unionByName(
        base.select((F.col("vec_id") + 5000).alias("vec_id"), "embedding")
    )
    pairs = cosine_near_pairs(doubled, threshold=0.99, tables=2)
    got = {
        (r["id_a"], r["id_b"])
        for r in pairs.where(F.col("id_b") == F.col("id_a") + 5000).collect()
    }
    assert got == {(i, i + 5000) for i in range(N_BASE)}


def test_near_dup_recall_and_precision(spark, vecs):
    df, planted = vecs
    out = cosine_near_pairs(df, threshold=0.95).collect()
    got = {(r["id_a"], r["id_b"]) for r in out}
    hit = sum(1 for p in planted if p in got)
    recall = hit / len(planted)
    assert recall >= 0.8, f"recall {recall} over {len(planted)} planted pairs"
    # exact verify: every reported cosine really clears the threshold
    for r in out:
        assert r["cosine"] >= 0.95


def test_threshold_is_exact(spark, vecs):
    """Orthogonal-ish random pairs never survive a high threshold even
    when LSH happens to bucket them together (verify is exact)."""
    df, planted = vecs
    out = cosine_near_pairs(df, threshold=0.95).collect()
    ids = {(r["id_a"], r["id_b"]) for r in out}
    base_pairs = {p for p in ids if p[0] < 1000 and p[1] < 1000}
    for a, b in base_pairs:
        ra = df.where(F.col("vec_id") == a).first()["embedding"]
        rb = df.where(F.col("vec_id") == b).first()["embedding"]
        dot = sum(x * y for x, y in zip(ra, rb))
        na = math.sqrt(sum(x * x for x in ra))
        nb = math.sqrt(sum(x * x for x in rb))
        assert dot / (na * nb) >= 0.95


def test_zero_vectors_excluded(spark):
    rows = [(1, [0.0] * DIM), (2, [0.0] * DIM), (3, [1.0] * DIM)]
    df = spark.createDataFrame(rows, "vec_id LONG, embedding ARRAY<FLOAT>")
    out = cosine_near_pairs(df, threshold=0.5).collect()
    assert out == []


def test_hot_bucket_cap_warns(spark):
    """A mega-cluster of identical vectors exceeds max_bucket_size: its
    pairs are dropped loudly (RuntimeWarning), not silently."""
    rows = [(i, [1.0] * DIM) for i in range(40)]
    df = spark.createDataFrame(rows, "vec_id LONG, embedding ARRAY<FLOAT>")
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        out = cosine_near_pairs(df, threshold=0.9, max_bucket_size=10)
        assert out.count() == 0
        assert any("cosine_near_pairs" in str(x.message) for x in w)
    # uncapped finds all C(40,2) pairs
    full = cosine_near_pairs(df, threshold=0.9, max_bucket_size=None)
    assert full.count() == 40 * 39 // 2
