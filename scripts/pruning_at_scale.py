"""Pruning-equivalence invariant at corpus scale (reference
tests/pruning.rs:44-104): brute-force BM25, WAND and BMW must return
identical top-k ids and scores (±1e-5) — re-checked on a ≥100k-doc
corpus, where f32 accumulation order, block seams and θ-seeding are
actually stressed, not just the 400-doc pytest fixture.

Builds (or reuses) the bench index for the given sf_dir, runs a seeded
query mix across all three execution modes, asserts equality, and
prints per-mode median latency.

Usage: python scripts/pruning_at_scale.py [sf_dir] [n_queries]
"""

from __future__ import annotations

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


def _median(xs):
    s = sorted(xs)
    n = len(s)
    return s[n // 2] if n % 2 else (s[n // 2 - 1] + s[n // 2]) / 2.0


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/dev/shm/searchlite_sf1"
    n_queries = int(sys.argv[2]) if len(sys.argv) > 2 else 12
    os.environ["SPARK_GRAFT_SF_DIR"] = sf_dir

    from searchlite_spark import get_spark
    import bench

    spark = get_spark(
        "pruning_at_scale", cores=os.environ.get("SPARK_GRAFT_CPUS", "16")
    )
    searcher, idx, build_secs = bench.build_and_searcher(spark)
    n_docs = idx.stats["n_docs"]
    print(f"{sf_dir}: {n_docs} docs"
          + (f", built in {build_secs:.1f}s" if build_secs else " (reused index)"))

    rng = random.Random(42)
    queries = [
        " ".join(rng.sample(VOCAB, rng.randint(1, 4))) for _ in range(n_queries)
    ]
    lat: dict[str, list[float]] = {"brute": [], "wand": [], "bmw": []}
    failures = 0
    for q in queries:
        results = {}
        for mode in ("brute", "wand", "bmw"):
            t0 = time.time()
            df = searcher._try_wand(
                {"query": q, "limit": 10, "execution": "bmw"}, 10, mode
            )
            rows = [(r["doc_id"], r["score"]) for r in df.collect()]
            lat[mode].append(time.time() - t0)
            results[mode] = rows
        brute, wand, bmw = results["brute"], results["wand"], results["bmw"]
        ok = (
            len(brute) == len(wand) == len(bmw)
            and all(
                bd == wd == md and abs(bs - ws) < 1e-5 and abs(bs - ms) < 1e-5
                for (bd, bs), (wd, ws), (md, ms) in zip(brute, wand, bmw)
            )
        )
        if not ok:
            failures += 1
            print(f"MISMATCH {q!r}:\n  brute={brute}\n  wand={wand}\n  bmw={bmw}")
        else:
            print(f"OK   {q!r}: top1={brute[0] if brute else None}")
    for mode, xs in lat.items():
        print(f"{mode}: median {_median(xs):.3f}s over {len(xs)} queries")
    print(f"{failures} failures / {n_queries} queries")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
