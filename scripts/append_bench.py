"""Append-cost evidence: incremental `append_documents` must cost
~batch-sized work, not corpus-sized work.

Method: build a base index over N docs, then append a batch of N/24
docs, then full-rebuild over N + N/24 — all on the same session and
tmpfs.  Report all three wall times; the claim holds if
append_secs << rebuild_secs (and roughly tracks batch/corpus ratio,
plus the fixed term-dictionary merge which is ∝ vocabulary).

Usage: python scripts/append_bench.py [n_docs] [cores]
Appends a section to BENCH.md and prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 2_400_000
    cores = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    batch = n_docs // 24

    from searchlite_spark import get_spark
    from searchlite_spark.corpus import corpus_index_schema, make_corpus, with_warc_ts_ms
    from searchlite_spark.index import append_documents, build_index

    spark = get_spark("append_bench", cores=cores, shuffle_partitions=32,
                      extra_conf={
                          "spark.sql.files.maxPartitionBytes": "8m",
                          "spark.sql.adaptive.coalescePartitions.enabled": "false",
                      })
    src = f"/dev/shm/searchlite_scale/corpus_{n_docs}"
    if not os.path.exists(src + "/_SUCCESS"):
        with_warc_ts_ms(
            make_corpus(spark, n_docs, partitions=32, min_tokens=60, max_tokens=120)
        ).write.mode("overwrite").parquet(src)
    corpus = spark.read.parquet(src)
    batch_src = f"/dev/shm/searchlite_scale/append_batch_{batch}"
    if not os.path.exists(batch_src + "/_SUCCESS"):
        from pyspark.sql import functions as F

        with_warc_ts_ms(
            make_corpus(spark, batch, partitions=8, min_tokens=60,
                        max_tokens=120, seed=99)
        ).withColumn("doc_id", F.col("doc_id") + n_docs + 1).write.mode(
            "overwrite"
        ).parquet(batch_src)
    batch_df = spark.read.parquet(batch_src)
    store = ["url", "warc_ts", "text", "lang", "warc_ts_ms"]

    # warmup
    build_index(spark, corpus.limit(2000), corpus_index_schema(),
                "/dev/shm/searchlite_scale/ab_warm", id_mode="column",
                num_partitions=8)

    t0 = time.time()
    idx = build_index(spark, corpus, corpus_index_schema(),
                      "/dev/shm/searchlite_scale/ab_base", id_mode="column",
                      num_partitions=32, store_columns=store,
                      docs_layout="copy")
    base_secs = time.time() - t0

    t0 = time.time()
    append_documents(spark, idx, batch_df, id_mode="column")
    append_secs = time.time() - t0

    t0 = time.time()
    build_index(spark, corpus.unionByName(batch_df.select(*corpus.columns)),
                corpus_index_schema(),
                "/dev/shm/searchlite_scale/ab_full", id_mode="column",
                num_partitions=32, store_columns=store, docs_layout="copy")
    rebuild_secs = time.time() - t0

    out = {
        "metric": "incremental append cost vs full rebuild",
        "n_docs": n_docs, "batch": batch, "cores": cores,
        "base_build_secs": round(base_secs, 2),
        "append_secs": round(append_secs, 2),
        "rebuild_secs": round(rebuild_secs, 2),
        "append_over_rebuild": round(append_secs / rebuild_secs, 3),
        "batch_over_corpus": round(batch / (n_docs + batch), 3),
    }
    print(json.dumps(out))
    stamp = time.strftime("%Y-%m-%d %H:%M UTC", time.gmtime())
    with open(os.path.join(REPO, "BENCH.md"), "a") as f:
        f.write(
            f"\n## Append-cost run {stamp}\n\n"
            f"{n_docs} base docs + {batch} appended, {cores} cores:\n\n"
            f"| op | secs |\n|---|---|\n"
            f"| base build ({n_docs}) | {out['base_build_secs']} |\n"
            f"| append ({batch}) | {out['append_secs']} |\n"
            f"| full rebuild ({n_docs + batch}) | {out['rebuild_secs']} |\n\n"
            f"append/rebuild = **{out['append_over_rebuild']}** vs batch/corpus"
            f" = {out['batch_over_corpus']} — append pays batch-sized tokenize"
            f"/shuffle plus the vocabulary-sized term-dict merge.\n"
        )


if __name__ == "__main__":
    main()
