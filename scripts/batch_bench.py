"""Query THROUGHPUT: sequential single-query submission vs one
batched pass (query/batch.py::batch_topk).

The reference engine's single-node throughput comes from zero
scheduling overhead per query; Spark pays ~0.3-1 s of job overhead per
submitted action, so sequential submission caps at a few queries/sec
no matter the cluster.  batch_topk amortizes one job across the whole
query set — this script measures both on the same index and prints the
ratio.

Usage: python scripts/batch_bench.py [sf_dir] [n_queries]
"""

from __future__ import annotations

import json
import os
import random
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

VOCAB = [
    "a", "agg", "batch", "big", "column", "customer", "data", "dup",
    "fast", "filter", "group", "hash", "join", "key", "line", "merge",
    "order", "part", "query", "row", "scan", "slow", "small", "sort",
    "spark", "stream", "table", "the", "value", "vector", "window",
]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/dev/shm/searchlite_sf1"
    n_queries = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    os.environ["SPARK_GRAFT_SF_DIR"] = sf_dir

    from searchlite_spark import get_spark
    from searchlite_spark.query import batch_topk
    import bench

    spark = get_spark(
        "batch_bench", cores=os.environ.get("SPARK_GRAFT_CPUS", "32")
    )
    searcher, idx, _ = bench.build_and_searcher(spark)
    n_docs = idx.stats["n_docs"]

    rng = random.Random(7)
    reqs = {
        f"q{i}": {"query": " ".join(rng.sample(VOCAB, rng.randint(1, 4)))}
        for i in range(n_queries)
    }

    # warm both paths once (JIT/codegen/python workers)
    searcher.topk({"query": "spark", "limit": 10}).collect()
    batch_topk(searcher, {"w": {"query": "spark"}}, k=10).collect()

    t0 = time.time()
    seq_rows = 0
    for req in reqs.values():
        seq_rows += len(searcher.topk({**req, "limit": 10}).collect())
    seq_secs = time.time() - t0

    t0 = time.time()
    batch_rows = len(batch_topk(searcher, reqs, k=10).collect())
    batch_secs = time.time() - t0

    out = {
        "sf": sf_dir,
        "n_docs": n_docs,
        "n_queries": n_queries,
        "sequential_secs": round(seq_secs, 2),
        "sequential_qps": round(n_queries / seq_secs, 2),
        "batch_secs": round(batch_secs, 2),
        "batch_qps": round(n_queries / batch_secs, 2),
        "speedup": round(seq_secs / batch_secs, 1),
        "rows": {"sequential": seq_rows, "batch": batch_rows},
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
