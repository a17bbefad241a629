"""PCA train/project: numpy parity, component orthonormality and
variance ordering, sign determinism, projection-fold exactness, the
sampled-training path, and validation."""

from __future__ import annotations

import math
import random

import numpy as np
import pytest

from searchlite_spark.textops import pca_project, pca_train

DIM = 12
N = 300


def _rows(seed=5):
    rng = random.Random(seed)
    # anisotropic data: variance concentrated in two planted directions
    d1 = [1.0 if i % 2 == 0 else 0.5 for i in range(DIM)]
    d2 = [(-1.0) ** i * (0.3 + 0.1 * i) for i in range(DIM)]
    rows = []
    for i in range(N):
        a, b = rng.gauss(0, 3), rng.gauss(0, 1.5)
        v = [
            a * d1[j] + b * d2[j] + rng.gauss(0, 0.1) + 0.7
            for j in range(DIM)
        ]
        rows.append((i, v))
    return rows


@pytest.fixture(scope="module")
def vecs(spark):
    return spark.createDataFrame(
        _rows(), "vec_id LONG, embedding ARRAY<DOUBLE>"
    )


def test_matches_numpy(spark, vecs):
    m = pca_train(vecs, k=3)
    x = np.array([v for _, v in _rows()])
    mean = x.mean(axis=0)
    cov = (x.T @ x) / len(x) - np.outer(mean, mean)
    evals, evecs = np.linalg.eigh(cov)
    order = np.argsort(evals)[::-1][:3]
    assert np.allclose(m["mean"], mean, atol=1e-9)
    for got, i in zip(m["components"], order):
        want = evecs[:, i]
        j = int(np.argmax(np.abs(want)))
        if want[j] < 0:
            want = -want
        assert np.allclose(got, want, atol=1e-7)
    assert np.allclose(
        m["explained_variance"], sorted(evals, reverse=True)[:3], atol=1e-9
    )


def test_components_orthonormal_and_ordered(spark, vecs):
    m = pca_train(vecs, k=4)
    c = np.array(m["components"])
    assert np.allclose(c @ c.T, np.eye(4), atol=1e-8)
    ev = m["explained_variance"]
    assert ev == sorted(ev, reverse=True)
    # planted structure: two dominant directions
    assert ev[0] > ev[2] * 10 and ev[1] > ev[2] * 10


def test_projection_matches_numpy(spark, vecs):
    m = pca_train(vecs, k=3)
    out = {
        r["vec_id"]: list(r["proj"])
        for r in pca_project(vecs, m).collect()
    }
    x = {i: np.array(v) for i, v in _rows()}
    mean = np.array(m["mean"])
    c = np.array(m["components"])
    for i, v in x.items():
        want = c @ (v - mean)
        assert np.allclose(out[i], want, atol=1e-9), i


def test_projection_variance_concentrates(spark, vecs):
    m = pca_train(vecs, k=2)
    proj = np.array(
        [r["proj"] for r in pca_project(vecs, m).collect()]
    )
    total_in = np.array([v for _, v in _rows()]).var(axis=0).sum()
    kept = proj.var(axis=0).sum()
    assert kept / total_in > 0.95  # planted: 2 directions carry ~all


def test_sampled_training_is_deterministic(spark, vecs):
    a = pca_train(vecs, k=2, sample_size=150)
    b = pca_train(vecs.repartition(7), k=2, sample_size=150)
    assert a["mean"] == pytest.approx(b["mean"], abs=1e-12)
    for ca, cb in zip(a["components"], b["components"]):
        assert ca == pytest.approx(cb, abs=1e-9)


def test_validation(spark, vecs):
    with pytest.raises(ValueError):
        pca_train(vecs, k=0)
    with pytest.raises(ValueError):
        pca_train(vecs, k=DIM + 1)
    empty = spark.createDataFrame([], "vec_id LONG, embedding ARRAY<DOUBLE>")
    with pytest.raises(ValueError):
        pca_train(empty, k=2)
