"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": <total suite secs>, "unit": "sec",
   "queries": {name: secs, ...}, "sf": ...,
   "build": {...}, "scaling": {...}?}

Scaling evidence (north rule: throughput efficiency >= 0.8 from N to
4N): run `python bench.py --scaling` — it re-runs the index build in
two subprocesses at local[N] and local[4N] on the same input and
reports throughput at both plus efficiency.  (Also written to
BENCH.md by scripts/scaling_bench.py.)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

HEADLINE = [
    ("bm25_topk", {"query": "spark query window", "limit": 10}),
    ("bm25_bool_must", {"query": {"type": "bool", "must": [
        {"type": "term", "field": "text", "value": "window"},
        {"type": "term", "field": "text", "value": "scan"}]}, "limit": 10}),
    ("bm25_filter", {"query": "merge sort",
                     "filter": [{"KeywordEq": {"field": "lang", "value": "en"}}],
                     "limit": 10}),
    ("phrase", {"query": '"fast key"', "limit": 10}),
    ("negation", {"query": "spark -query", "limit": 10}),
    ("prefix", {"query": {"type": "prefix", "field": "text", "value": "s"}, "limit": 10}),
]

AGGS = [
    ("agg_terms_lang", {"query": "spark"}, {"langs": {"terms": {"field": "lang", "size": 10}}}),
    ("agg_histogram", {"query": "merge"}, {"h": {"histogram": {"field": "n_chars", "interval": 100}}}),
]


def build_and_searcher(spark, rebuild=False):
    from searchlite_spark.index import (
        IndexSchema, KeywordField, NumericField, TextField, build_index,
    )
    from searchlite_spark.index.catalog import Index
    from searchlite_spark.query import Searcher

    tag = os.path.basename(os.path.normpath(SF_DIR))
    out = f"/tmp/searchlite_bench/{tag}"
    schema = IndexSchema(
        doc_id_field="doc_id",
        text_fields=(TextField("text"),),
        keyword_fields=(KeywordField("lang"), KeywordField("source")),
        numeric_fields=(NumericField("n_chars"),),
    )
    build_secs = None
    if rebuild or not os.path.exists(os.path.join(out, "manifest.json")):
        corpus = spark.read.parquet(f"{SF_DIR}/documents.parquet")
        t0 = time.time()
        idx = build_index(spark, corpus, schema, out, id_mode="column")
        build_secs = time.time() - t0
    idx = Index(out, spark)
    return Searcher(idx), idx, build_secs


KERNEL = [
    # the engine's default execution path (block-max pruned kernel)
    ("bm25_topk_bmw", {"query": "spark query window", "limit": 10,
                       "execution": "bmw"}),
    ("bm25_topk_wand", {"query": "spark query window", "limit": 10,
                        "execution": "wand"}),
]


def _median(xs: list[float]) -> float:
    s = sorted(xs)
    n = len(s)
    return s[n // 2] if n % 2 else (s[n // 2 - 1] + s[n // 2]) / 2.0


def run_query_suite(searcher, iterations=3):
    """Per-query MEDIAN of `iterations` runs (single-shot samples on
    this shared host swing 2-3x with load; see BENCH.md).  The raw
    per-run samples are kept so the spread is externally visible."""
    from searchlite_spark.query.aggs import run_aggregations

    times: dict[str, float] = {}
    runs: dict[str, list[float]] = {}

    def _timed(name, fn):
        samples = []
        for _ in range(iterations):
            t0 = time.time()
            fn()
            samples.append(round(time.time() - t0, 4))
        runs[name] = samples
        times[name] = round(_median(samples), 4)

    from pyspark.sql import functions as F

    for name, req in HEADLINE:
        _timed(
            name,
            lambda req=req: searcher.match_set(req)
            .orderBy(F.desc("score"), F.asc("doc_id"))
            .limit(int(req.get("limit", 10)))
            .collect(),
        )
    for name, req in KERNEL:
        _timed(name, lambda req=req: searcher.topk(req).collect())
    for name, req, aggs in AGGS:
        _timed(
            name,
            lambda req=req, aggs=aggs: run_aggregations(
                searcher.match_set(req), searcher.docs, aggs
            ),
        )
    return times, runs


BATCH_VOCAB = [
    "a", "agg", "batch", "big", "column", "customer", "data", "dup",
    "fast", "filter", "group", "hash", "join", "key", "line", "merge",
    "order", "part", "query", "row", "scan", "slow", "small", "sort",
    "spark", "stream", "table", "the", "value", "vector", "window",
]


def run_batch_throughput(searcher, n_queries=64, k=10):
    """Batched multi-query throughput (query/batch.py): N seeded
    queries in ONE pass; reported as queries/sec so the per-round
    bench records the engine's throughput mode, not just per-query
    latency."""
    import random

    from searchlite_spark.query import batch_topk

    rng = random.Random(7)
    reqs = {
        f"q{i}": {"query": " ".join(rng.sample(BATCH_VOCAB, rng.randint(1, 4)))}
        for i in range(n_queries)
    }
    batch_topk(searcher, {"w": {"query": "spark"}}, k=k).collect()  # warm
    t0 = time.time()
    rows = len(batch_topk(searcher, reqs, k=k).collect())
    secs = time.time() - t0
    return {
        "n_queries": n_queries,
        "secs": round(secs, 2),
        "qps": round(n_queries / secs, 2),
        "rows": rows,
    }


def main():
    if "--scaling" in sys.argv:
        from scripts.scaling_bench import run_scaling

        print(json.dumps(run_scaling(SF_DIR)))
        return
    from searchlite_spark import get_spark

    spark = get_spark("bench", cores=CPUS, shuffle_partitions=max(CPUS, 8))
    # build TWICE (fresh output dir each time) and report both samples:
    # single-shot build times on this shared host are noise-dominated
    # (BENCH.md r4 note) — the min of two is the comparable number, the
    # spread between them is the visible noise floor.
    build_runs = []
    for _ in range(2):
        searcher, idx, build_secs = build_and_searcher(spark, rebuild=True)
        build_runs.append(round(build_secs, 2))
    n_docs = idx.stats["n_docs"]
    times, runs = run_query_suite(searcher)
    total = round(sum(times.values()), 4)
    batch = run_batch_throughput(searcher)
    best_build = min(build_runs)
    out = {
        "metric": "searchlite_spark query suite wall time",
        "value": total,
        "unit": "sec",
        "queries": times,
        "query_runs": runs,
        "sf": SF_DIR,
        "build": {
            "secs": best_build,
            "runs": build_runs,
            "n_docs": n_docs,
            "docs_per_sec": round(n_docs / best_build, 1) if best_build else None,
        },
        "batch": batch,
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
