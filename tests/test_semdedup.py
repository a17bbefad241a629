"""SemDeDup (semantic dedup over embeddings): deterministic drop
decisions, exact-copy certainty, the keep='far'/'near' ordering
contract, the max_cluster_rank cap, and an offline numpy replay of the
upper-triangular rule.

The operator is beyond the reference (Abbas et al. 2023,
arXiv:2303.09540); the rule verified here is the same one the driver
oracle replays in SQL from the persisted assignment table.
"""

from __future__ import annotations

import math
import random
import warnings

import pytest

from searchlite_spark.textops import semantic_dedup

DIM = 16


def _unit(v):
    n = math.sqrt(sum(x * x for x in v))
    return [x / n for x in v]


def _rows(n=120, clusters=4, seed=3):
    rng = random.Random(seed)
    centers = [
        _unit([rng.gauss(0, 1) for _ in range(DIM)]) for _ in range(clusters)
    ]
    sigma = 0.35 / math.sqrt(DIM)
    rows = []
    for i in range(n):
        c = centers[i % clusters]
        rows.append(
            (i, _unit([x + rng.gauss(0, sigma) for x in c]))
        )
    return rows


@pytest.fixture(scope="module")
def base(spark):
    return spark.createDataFrame(
        _rows(), "vec_id LONG, embedding ARRAY<DOUBLE>"
    )


def _offline(rows, centroids, eps, keep="far"):
    """Numpy-free replay of the rule: assign -> rank -> drop if any
    predecessor in the cluster has cosine >= eps."""

    def dot(a, b):
        s = 0.0
        for x, y in zip(a, b):
            s += float(x) * float(y)
        return s

    def cos(a, b):
        return dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b)))

    assigned = []
    for i, v in rows:
        d = [
            (sum((float(x) - float(c)) ** 2 for x, c in zip(v, cen)), li)
            for li, cen in enumerate(centroids)
        ]
        li = min(d)[1]
        assigned.append((i, v, li, cos(v, centroids[li])))
    out = {}
    for li in {a[2] for a in assigned}:
        cell = [a for a in assigned if a[2] == li]
        rev = keep == "near"
        cell.sort(key=lambda a: (-a[3] if rev else a[3], a[0]))
        for pos, (i, v, _, _) in enumerate(cell):
            prior = [cos(v, cell[j][1]) for j in range(pos)]
            mx = max(prior) if prior else None
            out[i] = (li, pos + 1, mx, mx is None or mx < eps)
    return out


def test_matches_offline_replay(spark, base):
    rows = _rows()
    from searchlite_spark.textops import ivf_train

    cents = ivf_train(base, k_lists=4, iters=3)
    got = {
        r["vec_id"]: (r["list_id"], r["rank"], r["max_prior_sim"], r["kept"])
        for r in semantic_dedup(
            base, eps=0.96, k_lists=4, iters=3, centroids=cents
        ).collect()
    }
    want = _offline(rows, cents, 0.96)
    assert set(got) == set(want)
    for i in got:
        gl, gr, gm, gk = got[i]
        wl, wr, wm, wk = want[i]
        assert (gl, gr, gk) == (wl, wr, wk), i
        if wm is None:
            assert gm is None
        else:
            # default kernel is arrow/BLAS: ulp-level reassociation vs
            # the offline python fold
            assert gm == pytest.approx(wm, abs=1e-9)


def test_exact_copies_dropped_with_certainty(spark, base):
    """5 planted exact copies of row 0: copies tie on centroid-cosine
    bit-for-bit, id-ascending rank keeps exactly ONE of the six
    (original id 0 under either keep mode), cosine 1.0 >= eps drops
    the rest."""
    v0 = _rows()[0][1]
    copies = spark.createDataFrame(
        [(1000 + j, v0) for j in range(5)],
        "vec_id LONG, embedding ARRAY<DOUBLE>",
    )
    aug = base.unionByName(copies)
    out = semantic_dedup(aug, eps=0.99, k_lists=4, iters=3)
    fam = {r["vec_id"]: r for r in out.collect() if r["vec_id"] in
           {0, 1000, 1001, 1002, 1003, 1004}}
    assert len(fam) == 6
    kept = [i for i, r in fam.items() if r["kept"]]
    assert kept == [0]
    for i in (1000, 1001, 1002, 1003, 1004):
        assert fam[i]["max_prior_sim"] == pytest.approx(1.0, abs=1e-12)


def test_keep_near_reverses_rank_order(spark, base):
    far = semantic_dedup(base, eps=2.0, k_lists=4, iters=3, keep="far")
    near = semantic_dedup(base, eps=2.0, k_lists=4, iters=3, keep="near")
    # eps=2.0 -> nothing dropped; ranks within a cluster must be exact
    # mirrors of each other (no centroid-cosine ties in random data)
    f = {r["vec_id"]: (r["list_id"], r["rank"]) for r in far.collect()}
    n = {r["vec_id"]: (r["list_id"], r["rank"]) for r in near.collect()}
    sizes = {}
    for li, _ in f.values():
        sizes[li] = sizes.get(li, 0) + 1
    for i in f:
        assert f[i][0] == n[i][0]
        assert n[i][1] == sizes[f[i][0]] - f[i][1] + 1
    for r in far.collect():
        assert r["kept"]


def test_partitioning_invariance(spark, base):
    a = semantic_dedup(base, eps=0.96, k_lists=4, iters=3)
    b = semantic_dedup(
        base.repartition(13), eps=0.96, k_lists=4, iters=3
    )
    ka = sorted((r["vec_id"], r["kept"], r["rank"]) for r in a.collect())
    kb = sorted((r["vec_id"], r["kept"], r["rank"]) for r in b.collect())
    assert ka == kb


def test_max_cluster_rank_caps_predecessors_and_warns(spark, base):
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        out = semantic_dedup(
            base, eps=0.90, k_lists=4, iters=3, max_cluster_rank=5
        ).collect()
        assert any("max_cluster_rank" in str(x.message) for x in w)
    # capped run can only MISS drops (predecessors beyond rank 5 are
    # invisible), never add them
    full = {
        r["vec_id"]: r
        for r in semantic_dedup(base, eps=0.90, k_lists=4, iters=3).collect()
    }
    assert len(out) == len(full)
    for r in out:
        if not r["kept"]:
            assert not full[r["vec_id"]]["kept"]


def test_arrow_kernel_equals_fold_kernel(spark, base):
    """The BLAS speed path and the oracle-exact fold path must agree
    on every decision (rank, kept) and to 1e-9 on the signal."""
    from searchlite_spark.textops import ivf_train

    cents = ivf_train(base, k_lists=4, iters=3)
    a = {r["vec_id"]: r for r in semantic_dedup(
        base, eps=0.96, centroids=cents, kernel="arrow").collect()}
    f = {r["vec_id"]: r for r in semantic_dedup(
        base, eps=0.96, centroids=cents, kernel="fold").collect()}
    assert set(a) == set(f)
    for i in a:
        assert (a[i]["list_id"], a[i]["rank"], a[i]["kept"]) == (
            f[i]["list_id"], f[i]["rank"], f[i]["kept"]), i
        if f[i]["max_prior_sim"] is None:
            assert a[i]["max_prior_sim"] is None
        else:
            assert a[i]["max_prior_sim"] == pytest.approx(
                f[i]["max_prior_sim"], abs=1e-9)


def test_kernel_validation(spark, base):
    with pytest.raises(ValueError):
        semantic_dedup(base, kernel="numpy")


def test_zero_norm_excluded(spark):
    df = spark.createDataFrame(
        [(0, [1.0] * DIM), (1, [0.0] * DIM), (2, [1.0] * DIM)],
        "vec_id LONG, embedding ARRAY<DOUBLE>",
    )
    out = semantic_dedup(df, eps=0.99, k_lists=1, iters=1)
    ids = {r["vec_id"]: r for r in out.collect()}
    assert set(ids) == {0, 2}
    assert ids[0]["kept"] and not ids[2]["kept"]
