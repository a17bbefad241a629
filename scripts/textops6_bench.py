"""Throughput of the session-6 operators at 1M docs / 500k vectors
(the /dev/shm sf10 tables): DSIR selection, BPE train+encode,
duplicated-span removal, the hashed-vs-literal duplicated-window
comparison, bigram LM cross-entropy, SemDeDup, and PCA.  Times each op
end-to-end with a noop sink (full compute, no collect cost).

Results are appended to BENCH.md INCREMENTALLY (one line per op, the
section header first) and shuffle files are released between ops
(drop refs -> Python GC -> JVM GC): a single-JVM bench accumulates
every op's shuffle/spill in spark.local.dir until the ContextCleaner
notices, which on a tmpfs local dir OOM-killed the first run of this
script at ~72 GB.  Real clusters have the same lifecycle (shuffle
files live until their RDD is GC'd) — long pipelines should drop
DataFrame refs between stages exactly like this.

Usage: python scripts/textops6_bench.py [sf_dir] [cores]
"""

from __future__ import annotations

import gc
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from searchlite_spark import get_spark  # noqa: E402


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/dev/shm/searchlite_sf10"
    cores = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    os.environ.setdefault("SPARK_DRIVER_MEMORY", "24g")
    spark = get_spark("textops6-bench", cores=cores, shuffle_partitions=32)
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet")).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    n_docs = docs.count()
    n_vecs = emb.count()

    from searchlite_spark.textops import (
        bigram_cross_entropy,
        bpe_encode,
        bpe_train,
        drop_duplicated_spans,
        dsir_select,
        duplicate_window_stats,
        pca_project,
        pca_train,
        semantic_dedup,
    )

    def sink(df):
        df.write.format("noop").mode("overwrite").save()

    bench_path = os.path.join(REPO, "BENCH.md")
    stamp = time.strftime("%Y-%m-%d %H:%M UTC", time.gmtime())
    with open(bench_path, "a") as f:
        f.write(
            f"\n## Session-6 textops throughput {stamp}\n\n"
            f"{n_docs:,} docs / {n_vecs:,} vectors (sf10, /dev/shm), "
            f"local[{cores}], noop sink, incremental rows (a crashed op\n"
            f"leaves earlier rows in place):\n\n"
            f"| op | rows | secs | rows/sec |\n|---|---|---|---|\n"
        )

    results = {}

    def bench(name, fn, n):
        t0 = time.time()
        fn()
        secs = round(time.time() - t0, 2)
        results[name] = {"secs": secs, "rows_per_sec": round(n / secs)}
        print(f"{name}: {secs}s = {results[name]['rows_per_sec']:,}/s",
              file=sys.stderr)
        with open(bench_path, "a") as f:
            f.write(f"| {name} | {n:,} | {secs} | "
                    f"{results[name]['rows_per_sec']:,} |\n")
        # release this op's shuffle files before the next one runs
        gc.collect()
        spark.sparkContext._jvm.System.gc()

    target = docs.where(F.lower("lang") == "en")
    bench("dsir_select_top10k", lambda: sink(
        dsir_select(docs, target, n=10_000, buckets=10_000)), n_docs)

    merges_box = {}

    def train():
        merges_box["m"] = bpe_train(docs, num_merges=200, min_pair_count=2)

    bench("bpe_train_200", train, n_docs)
    bench("bpe_encode", lambda: sink(
        bpe_encode(docs, merges_box["m"])), n_docs)

    bench("dup_window_literal", lambda: sink(
        duplicate_window_stats(docs, window=8)), n_docs)
    bench("dup_window_hashed", lambda: sink(
        duplicate_window_stats(docs, window=8, hash_keys=True)), n_docs)
    bench("drop_dup_spans", lambda: sink(
        drop_duplicated_spans(docs, window=8)), n_docs)
    bench("bigram_cross_entropy", lambda: sink(
        bigram_cross_entropy(docs)), n_docs)

    model_box = {}

    def pca_tr():
        model_box["m"] = pca_train(emb, k=8, sample_size=100_000)

    bench("pca_train_k8", pca_tr, n_vecs)
    bench("pca_project_k8", lambda: sink(
        pca_project(emb, model_box["m"])), n_vecs)

    # SemDeDup pair work is sum(c^2)/2 over cells: 200k vectors in 512
    # cells ~= 39M pairwise cosines (the operator's own playbook —
    # k_lists scales with N to keep cells bounded)
    semi = emb.where(F.col("vec_id") % 5 < 2)
    n_semi = semi.count()
    bench("semantic_dedup_k512", lambda: sink(
        semantic_dedup(semi, eps=0.95, k_lists=512, iters=2,
                       sample_size=50_000)), n_semi)

    line = json.dumps({
        "metric": "session-6 textops throughput",
        "n_docs": n_docs, "n_vecs": n_vecs, "cores": cores,
        "ops": results,
    })
    print(line)
    spark.stop()


if __name__ == "__main__":
    main()
