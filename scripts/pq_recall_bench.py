"""PQ recall/compression sweep on clustered unit vectors (the same
corpus recipe as the LSH/IVF recall benches): raw-ADC recall@10,
refined recall@10 (exact re-rank of the top 4k ADC candidates), and
the storage ratio, across m.

Usage: python scripts/pq_recall_bench.py [n_vecs] [dim] [centers]
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from searchlite_spark import get_spark


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    dim = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    centers = int(sys.argv[3]) if len(sys.argv) > 3 else 20_000
    spark = get_spark(
        "pq_recall", cores=os.environ.get("SPARK_GRAFT_CPUS", "16")
    )
    from searchlite_spark.textops import pq_encode, pq_topk, pq_train
    from searchlite_spark.textops.similarity import cosine_topk

    # deterministic clustered vectors: center(xxhash) + noise(xxhash)
    base = spark.range(n).select(F.col("id").alias("vec_id"))
    cid = F.pmod(F.xxhash64("vec_id", F.lit(1)), centers)
    raw = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda j: (
            F.xxhash64(cid, j, F.lit(2)).cast("double") / F.lit(float(2**63))
            + F.xxhash64(F.col("vec_id"), j, F.lit(3)).cast("double")
            / F.lit(float(2**63))
            * 0.15
        ),
    )
    nrm = F.sqrt(
        F.aggregate(
            F.transform(raw, lambda x: x * x), F.lit(0.0), lambda a, x: a + x
        )
    )
    df = base.select(
        "vec_id", F.transform(raw, lambda x: x / nrm).alias("embedding")
    ).persist()
    df.count()

    queries = [r["embedding"] for r in df.limit(25).collect()]
    exact = {}
    for i, q in enumerate(queries):
        exact[i] = [
            int(r["vec_id"]) for r in cosine_topk(df, q, k=10).collect()
        ]

    results = []
    for m in (4, 8, 16):
        cb = pq_train(df, m=m, n_codes=256, iters=4, sample_size=20_000)
        codes = pq_encode(df, cb).persist()
        codes.count()
        raw_hits = ref_hits = 0
        t0 = time.time()
        for i, q in enumerate(queries):
            adc = {
                int(r["vec_id"]) for r in pq_topk(codes, cb, q, k=10).collect()
            }
            raw_hits += len(adc & set(exact[i]))
        adc_secs = time.time() - t0
        for i, q in enumerate(queries):
            ref = {
                int(r["vec_id"])
                for r in pq_topk(
                    codes, cb, q, k=10, refine=df, refine_k=40
                ).collect()
            }
            ref_hits += len(ref & set(exact[i]))
        results.append(
            {
                "m": m,
                "recall10_adc": round(raw_hits / (10 * len(queries)), 3),
                "recall10_refined": round(ref_hits / (10 * len(queries)), 3),
                "bytes_per_vec": m,  # n_codes=256 -> 1 byte/code
                "compression_vs_f32": round(dim * 4 / m, 1),
                "adc_secs_per_query": round(adc_secs / len(queries), 3),
            }
        )
        codes.unpersist()
        print(json.dumps(results[-1]))
    print(json.dumps({"n_vecs": n, "dim": dim, "centers": centers,
                      "sweep": results}))
    spark.stop()


if __name__ == "__main__":
    main()
