"""LSH-ANN recall evidence (VERDICT r2 #9): recall@10 vs exact brute
force on a seeded 100k-vector corpus for planes x multiprobe configs.

Justifies the hyperplane-LSH substitution for the reference's HNSW
(searchlite-core/src/vectors/hnsw.rs:10-120): the reference targets
single-node graph ANN; on Spark a bucket-partitioned LSH probe is the
scalable equivalent, and this script documents the recall cost.

Method
------
* corpus: 100k unit vectors, dim 64, drawn around 1,000 cluster
  centers (seeded numpy) — mirrors real embedding geometry, where
  neighbors are cluster-mates, not antipodes of uniform noise;
* queries: 25 corpus rows (every 4,000th) — "more like this doc";
* ground truth: exact cosine top-10 (numpy, float64);
* candidate selection: bucket ids come from the PRODUCTION kernel
  (`lsh_buckets`, xxhash64 hyperplanes, one Spark job per planes
  config); probe set replicates `lsh_ann_topk` exactly (query bucket
  + Hamming-1 neighbors in bit order, capped at `multiprobe`), then
  exact re-rank over the candidates — recall is fully determined by
  the bucket assignment, which is the Spark code path under test.

Usage: python scripts/ann_recall_bench.py   # appends table to BENCH.md
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N, DIM, N_CLUSTERS, K = 100_000, 64, 1_000, 10
# (planes, tables) sweep: single-table rows quantify the amplification
# win; multi-table rows are the production configs
CONFIGS = [(8, 1), (12, 1), (16, 1), (8, 4), (8, 8), (12, 8), (16, 8)]
MULTIPROBE = [0, 4]
N_QUERIES = 25


def make_corpus(rng: np.random.Generator) -> np.ndarray:
    """Unit vectors around unit cluster centers with total noise norm
    ~0.5 (sigma = 0.5/sqrt(dim) per coordinate), giving same-cluster
    cosine ~= 1/(1+0.25) ~= 0.8 — typical near-neighbor similarity for
    real text embeddings.  (A naive per-coordinate sigma of 0.35 makes
    the noise norm 0.35*sqrt(64) = 2.8x the signal: the corpus becomes
    near-uniform on the sphere, where no bucketing ANN — LSH or HNSW —
    can beat random; recall on such data measures nothing.)"""
    centers = rng.standard_normal((N_CLUSTERS, DIM))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    assign = rng.integers(0, N_CLUSTERS, size=N)
    sigma = 0.5 / np.sqrt(DIM)
    vecs = centers[assign] + sigma * rng.standard_normal((N, DIM))
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    return vecs.astype(np.float64)


def ivf_main() -> None:
    """--ivf: recall@10 for the IVF cell-probe path (ivf_train /
    ivf_assign production kernels; probe order replicates
    ivf_ann_topk's driver-side sorted-sqdist selection exactly; exact
    re-rank over candidates, like the LSH rows)."""
    rng = np.random.default_rng(0)
    vecs = make_corpus(rng)
    q_idx = np.arange(0, N, N // N_QUERIES)[:N_QUERIES]
    sims = vecs[q_idx] @ vecs.T
    truth = np.argsort(-sims, axis=1)[:, :K]

    from searchlite_spark import get_spark
    from searchlite_spark.textops.similarity import ivf_assign, ivf_train

    spark = get_spark(
        "ivf_recall", cores=int(os.environ.get("SPARK_GRAFT_CPUS", 32))
    )
    df = spark.createDataFrame(
        [(int(i), vecs[i].tolist()) for i in range(N)],
        "vec_id LONG, embedding ARRAY<DOUBLE>",
    )
    results = []
    for k_lists in (16, 64):
        t0 = time.time()
        # production training on a hash sample (the 10^12-row path),
        # then ONE full-corpus assignment via the production expression
        cents = np.array(
            ivf_train(df, k_lists=k_lists, iters=5, sample_size=20_000)
        )
        rows = (
            ivf_assign(df, cents.tolist())
            .select("vec_id", "list_id")
            .toPandas()
            .sort_values("vec_id")
        )
        t_train = time.time() - t0
        lists = rows["list_id"].to_numpy()
        for nprobe in (1, 4, 8):
            hits = 0
            cands_total = 0
            for qi, q in enumerate(q_idx):
                # same math as ivf_ann_topk's driver-side probe pick
                d = ((cents - vecs[q]) ** 2).sum(axis=1)
                probes = np.argsort(d, kind="stable")[:nprobe]
                cand = np.nonzero(np.isin(lists, probes))[0]
                cands_total += len(cand)
                order = np.argsort(-(vecs[cand] @ vecs[q]))[:K]
                approx = set(cand[order].tolist())
                hits += len(approx & set(truth[qi].tolist()))
            r = {
                "k_lists": k_lists,
                "nprobe": nprobe,
                "recall_at_10": round(hits / (K * len(q_idx)), 3),
                "avg_candidates": int(cands_total / len(q_idx)),
                "train_assign_secs": round(t_train, 1),
            }
            results.append(r)
            print(json.dumps(r))
    spark.stop()

    stamp = time.strftime("%Y-%m-%d %H:%M UTC", time.gmtime())
    lines = [
        f"\n## IVF-ANN recall@10 vs brute force ({stamp})\n",
        f"\nSame 100k clustered corpus as the LSH table; centroids from "
        "production `ivf_train` (k-means, hash-sampled 20k training set), "
        "cells from production `ivf_assign`, probe order identical to "
        "`ivf_ann_topk`, exact re-rank over candidates.\n",
        "\n| k_lists | nprobe | recall@10 | avg candidates |\n",
        "|---|---|---|---|\n",
    ]
    for r in results:
        lines.append(
            f"| {r['k_lists']} | {r['nprobe']} | {r['recall_at_10']} "
            f"| {r['avg_candidates']} |\n"
        )
    with open(os.path.join(REPO, "BENCH.md"), "a") as f:
        f.writelines(lines)
    print("appended to BENCH.md")


def main() -> None:
    rng = np.random.default_rng(0)
    vecs = make_corpus(rng)
    q_idx = np.arange(0, N, N // N_QUERIES)[:N_QUERIES]

    # exact ground truth (float64 brute force)
    sims = vecs[q_idx] @ vecs.T                      # (Q, N); unit norms
    truth = np.argsort(-sims, axis=1)[:, :K]

    from searchlite_spark import get_spark
    from searchlite_spark.textops.similarity import lsh_buckets

    spark = get_spark("ann_recall", cores=int(os.environ.get("SPARK_GRAFT_CPUS", 32)))
    df = spark.createDataFrame(
        [(int(i), vecs[i].tolist()) for i in range(N)],
        "vec_id LONG, embedding ARRAY<DOUBLE>",
    )

    # per-table bucket assignments from the PRODUCTION kernel, one Spark
    # job per distinct (planes, table); cached across configs
    bucket_cache: dict[tuple[int, int], np.ndarray] = {}

    def table_buckets(planes: int, table: int) -> np.ndarray:
        key = (planes, table)
        if key not in bucket_cache:
            rows = (
                lsh_buckets(df, DIM, planes, table=table)
                .select("vec_id", "bucket")
                .toPandas()
                .sort_values("vec_id")
            )
            bucket_cache[key] = rows["bucket"].to_numpy()
        return bucket_cache[key]

    results = []
    for planes, tables in CONFIGS:
        t0 = time.time()
        tb = [table_buckets(planes, t) for t in range(tables)]
        t_bucket = time.time() - t0
        for mp in MULTIPROBE:
            hits = 0
            cands_total = 0
            for qi, q in enumerate(q_idx):
                mask = np.zeros(N, dtype=bool)
                for t in range(tables):
                    qb = int(tb[t][q])               # corpus row == query row
                    probes = [qb] + [qb ^ (1 << b) for b in range(planes)][:mp]
                    mask |= np.isin(tb[t], probes)
                cand = np.nonzero(mask)[0]
                cands_total += len(cand)
                if len(cand) == 0:
                    continue
                order = np.argsort(-(vecs[cand] @ vecs[q]))[:K]
                approx = set(cand[order].tolist())
                hits += len(approx & set(truth[qi].tolist()))
            recall = hits / (K * len(q_idx))
            results.append(
                {
                    "planes": planes,
                    "tables": tables,
                    "multiprobe": mp,
                    "recall_at_10": round(recall, 3),
                    "avg_candidates": int(cands_total / len(q_idx)),
                    "bucket_job_secs": round(t_bucket, 1),
                }
            )
            print(json.dumps(results[-1]))
    spark.stop()

    stamp = time.strftime("%Y-%m-%d %H:%M UTC", time.gmtime())
    lines = [
        f"\n## LSH-ANN recall@10 vs brute force ({stamp})\n",
        f"\n100k clustered unit vectors (dim {DIM}, 1k centers, seed 0), "
        f"{N_QUERIES} corpus queries; buckets from the production "
        "`lsh_buckets` kernel; probe = query bucket + Hamming-1 "
        "neighbors (multiprobe cap), exact re-rank over candidates.\n",
        "\n| planes | tables | multiprobe | recall@10 | avg candidates |\n",
        "|---|---|---|---|---|\n",
    ]
    for r in results:
        lines.append(
            f"| {r['planes']} | {r['tables']} | {r['multiprobe']} "
            f"| {r['recall_at_10']} | {r['avg_candidates']} |\n"
        )
    best = max(results, key=lambda r: (r["recall_at_10"], -r["avg_candidates"]))
    lines.append(
        f"\nBest config: planes={best['planes']}, tables={best['tables']}, "
        f"multiprobe={best['multiprobe']} -> recall@10 = "
        f"{best['recall_at_10']} ({best['avg_candidates']} candidates/query "
        f"vs {N} brute).\n"
    )
    with open(os.path.join(REPO, "BENCH.md"), "a") as f:
        f.writelines(lines)
    print("appended to BENCH.md")


if __name__ == "__main__":
    if "--ivf" in sys.argv:
        ivf_main()
    else:
        main()
