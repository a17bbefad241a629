"""Throughput of the session-6 operators at 1M docs / 500k vectors
(the /dev/shm sf10 tables): DSIR selection, BPE train+encode,
duplicated-span removal, the hashed-vs-literal duplicated-window
comparison, bigram LM cross-entropy, SemDeDup, and PCA.  Times each op
end-to-end with a noop sink (full compute, no collect cost) and
appends one BENCH.md section + prints one JSON line.

Usage: python scripts/textops6_bench.py [sf_dir] [cores]
"""

from __future__ import annotations

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

    results = {}

    def bench(name, fn, n):
        t0 = time.time()
        fn()
        secs = round(time.time() - t0, 2)
        results[name] = {"secs": secs, "rows_per_sec": round(n / secs)}
        print(f"{name}: {secs}s = {results[name]['rows_per_sec']:,}/s",
              file=sys.stderr)

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

    bench("semantic_dedup_k512", lambda: sink(
        semantic_dedup(emb, eps=0.95, k_lists=512, iters=2,
                       sample_size=50_000)), n_vecs)

    line = json.dumps({
        "metric": "session-6 textops throughput",
        "n_docs": n_docs, "n_vecs": n_vecs, "cores": cores,
        "ops": results,
    })
    print(line)

    stamp = time.strftime("%Y-%m-%d %H:%M UTC", time.gmtime())
    rows = "\n".join(
        f"| {name} | {r['secs']} | {r['rows_per_sec']:,} |"
        for name, r in results.items()
    )
    with open(os.path.join(REPO, "BENCH.md"), "a") as f:
        f.write(
            f"\n## Session-6 textops throughput {stamp}\n\n"
            f"{n_docs:,} docs / {n_vecs:,} vectors (sf10, /dev/shm), "
            f"local[{cores}], noop sink:\n\n"
            f"| op | secs | rows/sec |\n|---|---|---|\n{rows}\n"
        )
    spark.stop()


if __name__ == "__main__":
    main()
