"""Product quantization: train/encode/ADC correctness and the
compression contract (textops/pq.py)."""

import math
import random

import numpy as np
import pytest
from pyspark.sql import functions as F


def _clustered(spark, n=2000, dim=16, centers=20, seed=0):
    """Deterministic clustered unit vectors (same recipe as the ANN
    recall benches): center + small noise, L2-normalized."""
    rng = random.Random(seed)
    cs = [
        [rng.gauss(0, 1) for _ in range(dim)] for _ in range(centers)
    ]
    rows = []
    for i in range(n):
        c = cs[i % centers]
        v = [x + rng.gauss(0, 0.15) for x in c]
        nrm = math.sqrt(sum(x * x for x in v))
        rows.append((i, [x / nrm for x in v]))
    return rows, spark.createDataFrame(rows, "vec_id LONG, embedding ARRAY<DOUBLE>")


@pytest.fixture(scope="module")
def pq_setup(spark):
    from searchlite_spark.textops import pq_encode, pq_train

    rows, df = _clustered(spark)
    cb = pq_train(df, m=4, n_codes=32, iters=4, sample_size=None)
    cb_rows = cb.collect()
    codes = pq_encode(df, cb)
    return rows, df, cb, cb_rows, codes


def test_codebook_shape_and_determinism(spark, pq_setup):
    from searchlite_spark.textops import pq_train

    rows, df, cb, cb_rows, _ = pq_setup
    assert len(cb_rows) == 4 * 32
    assert {int(r["sub_id"]) for r in cb_rows} == set(range(4))
    # retrain on a different partitioning -> same codebook (±1 ulp agg order)
    cb2 = {
        (int(r["sub_id"]), int(r["code"])): r["centroid"]
        for r in pq_train(
            df.repartition(7), m=4, n_codes=32, iters=4, sample_size=None
        ).collect()
    }
    for r in cb_rows:
        got = cb2[(int(r["sub_id"]), int(r["code"]))]
        assert np.allclose(r["centroid"], got, atol=1e-9)


def test_encode_matches_numpy_argmin(pq_setup):
    rows, df, cb, cb_rows, codes = pq_setup
    book = {}
    for r in cb_rows:
        book.setdefault(int(r["sub_id"]), {})[int(r["code"])] = np.array(
            r["centroid"]
        )
    got = {int(r["vec_id"]): list(r["codes"]) for r in codes.collect()}
    d_sub = 4
    for vid, vec in rows[:200]:
        v = np.array(vec)
        for j in range(4):
            sv = v[j * d_sub:(j + 1) * d_sub]
            dists = [
                (float(((sv - book[j][c]) ** 2).sum()), c)
                for c in sorted(book[j])
            ]
            want = min(dists)[1]  # ties to lowest code
            assert got[vid][j] == want, (vid, j)


def test_adc_score_matches_lut_recompute(pq_setup):
    from searchlite_spark.textops import pq_lut, pq_topk

    rows, df, cb, cb_rows, codes = pq_setup
    q = rows[5][1]
    out = pq_topk(codes, cb, q, k=15).collect()
    lut = pq_lut(cb_rows, q, m=4, n_codes=32)
    by_id = {int(r["vec_id"]): list(r["codes"]) for r in codes.collect()}
    for r in out:
        want = sum(lut[j][by_id[int(r["vec_id"])][j]] for j in range(4))
        assert abs(r["score"] - want) < 1e-9


def test_adc_retrieves_the_right_neighborhood(pq_setup):
    """Raw ADC's guarantee on clustered data: every top-10 hit comes
    from the query's own cluster (the quantization error is small
    against INTER-cluster distances).  Rank WITHIN a tight cluster is
    quantization-noise-limited — the textbook PQ regime — which is
    exactly what the refine stage is for (next test)."""
    from searchlite_spark.textops import pq_topk

    rows, df, cb, cb_rows, codes = pq_setup
    for qi in (3, 77, 501):
        q = rows[qi][1]
        adc = [int(r["vec_id"]) for r in pq_topk(codes, cb, q, k=10).collect()]
        assert len(adc) == 10
        same_cluster = sum(1 for a in adc if a % 20 == qi % 20)
        assert same_cluster == 10, (qi, adc)


def test_refine_recovers_exact_topk(pq_setup):
    from searchlite_spark.textops import pq_topk
    from searchlite_spark.textops.similarity import cosine_topk

    rows, df, cb, cb_rows, codes = pq_setup
    q = rows[42][1]
    refined = [
        int(r["vec_id"])
        for r in pq_topk(
            codes, cb, q, k=10, refine=df, refine_k=100
        ).collect()
    ]
    exact = [int(r["vec_id"]) for r in cosine_topk(df, q, k=10).collect()]
    assert len(set(refined) & set(exact)) >= 9


def test_persisted_index_roundtrip(spark, tmp_path, pq_setup):
    from searchlite_spark.textops import pq_index_build, pq_index_search, pq_topk

    rows, df, cb, cb_rows, codes = pq_setup
    out = str(tmp_path / "pqidx")
    pq_index_build(df, out, m=4, n_codes=32, iters=4, sample_size=None)
    q = rows[9][1]
    got = [
        (int(r["vec_id"]), round(r["score"], 6))
        for r in pq_index_search(spark, out, q, k=10).collect()
    ]
    want = [
        (int(r["vec_id"]), round(r["score"], 6))
        for r in pq_topk(codes, cb, q, k=10).collect()
    ]
    assert got == want
    # compression: m INT codes per vector vs dim doubles
    n_code_rows = spark.read.parquet(out + "/codes").count()
    assert n_code_rows == len(rows)


def test_dim_not_divisible_raises(spark):
    from searchlite_spark.textops import pq_train

    df = spark.createDataFrame(
        [(1, [1.0, 2.0, 3.0])], "vec_id LONG, embedding ARRAY<DOUBLE>"
    )
    with pytest.raises(ValueError, match="not divisible"):
        pq_train(df, m=2, n_codes=2, iters=1, sample_size=None)


def test_ivfpq_composition(spark, pq_setup):
    """The canonical IVF-PQ layout from the existing public pieces:
    ivf_assign partitions the corpus into cells, pq_encode compresses
    within, and a query ADC-scans ONLY the probed cells' codes.  The
    composed result must equal plain ADC restricted to those cells
    (same scoring, smaller candidate set), and the probed candidate
    pool must actually shrink."""
    from pyspark.sql import functions as F

    from searchlite_spark.textops import ivf_assign, ivf_train, pq_topk
    from searchlite_spark.textops.similarity import _probe_cells

    rows, df, cb, cb_rows, codes = pq_setup
    centroids = ivf_train(df, k_lists=8, iters=3, sample_size=None)
    assigned = ivf_assign(df, centroids).select("vec_id", "list_id")
    codes_cells = codes.join(assigned, "vec_id")

    q = rows[17][1]
    probes = _probe_cells(q, centroids, nprobe=2)
    pool = codes_cells.where(F.col("list_id").isin(probes)).drop("list_id")
    n_pool = pool.count()
    assert 0 < n_pool < len(rows)  # really pruned

    got = [
        (int(r["vec_id"]), round(r["score"], 9))
        for r in pq_topk(pool, cb, q, k=10).collect()
    ]
    want = [
        (int(r["vec_id"]), round(r["score"], 9))
        for r in pq_topk(codes, cb, q, k=10).collect()
        if int(r["vec_id"]) in {int(x["vec_id"]) for x in pool.collect()}
    ]
    # composed == unrestricted ADC filtered to the probed cells
    assert got[: len(want)] == want[: len(got)]
    # the query's own vector sits in the first probe cell, so the ADC
    # winner over the probed cells matches the global ADC winner
    global_top = pq_topk(codes, cb, q, k=1).collect()[0]
    if int(global_top["vec_id"]) in {v for v, _ in got}:
        assert got[0][0] == int(global_top["vec_id"])
