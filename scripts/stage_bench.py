"""Stage-level scaling bench: times ONLY the postings build stage
(tokenize -> materialize -> range-shuffle -> write), which dominates
the job at web scale (at 100 TB it is >95% of the work; the manifest/
stats/dictionary barriers that cap whole-job local-mode scaling are
O(seconds) regardless of input size).

Usage: python scripts/stage_bench.py <cores> [n_docs]
Prints one JSON line; combine two runs for the efficiency ratio.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    cores = int(sys.argv[1])
    n_docs = int(sys.argv[2]) if len(sys.argv) > 2 else 2_400_000
    from pyspark import StorageLevel

    from searchlite_spark import get_spark
    from searchlite_spark.corpus import corpus_index_schema, make_corpus, with_warc_ts_ms
    from searchlite_spark.index.build import tokenize_postings_best

    PARTS = 32
    spark = get_spark(
        "stage_bench", cores=cores, shuffle_partitions=PARTS,
        extra_conf={
            "spark.sql.files.maxPartitionBytes": "8m",
            "spark.sql.adaptive.coalescePartitions.enabled": "false",
        },
    )
    src_path = f"/dev/shm/searchlite_scale/corpus_{n_docs}"
    if not os.path.exists(src_path + "/_SUCCESS"):
        with_warc_ts_ms(
            make_corpus(spark, n_docs, partitions=PARTS, min_tokens=60, max_tokens=120)
        ).write.mode("overwrite").parquet(src_path)
    corpus = spark.read.parquet(src_path)
    schema = corpus_index_schema()

    # untimed warmup (JIT/codegen/python workers)
    warm, _ = tokenize_postings_best(corpus.limit(4000), schema)
    warm.write.mode("overwrite").parquet(f"/dev/shm/searchlite_scale/warm_{cores}")

    t0 = time.time()
    pf = tokenize_postings_best(corpus, schema)[0].persist(StorageLevel.MEMORY_AND_DISK)
    n_postings = pf.count()
    pf.repartitionByRange(PARTS, "term", "doc_id").sortWithinPartitions(
        "term", "doc_id"
    ).write.mode("overwrite").parquet(f"/dev/shm/searchlite_scale/stage_{cores}")
    secs = time.time() - t0
    pf.unpersist()
    print(
        json.dumps(
            {
                "stage": "postings build (tokenize+shuffle+write)",
                "cores": cores,
                "n_docs": n_docs,
                "n_postings": int(n_postings),
                "secs": round(secs, 2),
                "docs_per_sec": round(n_docs / secs, 1),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
