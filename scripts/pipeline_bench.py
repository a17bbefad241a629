"""Throughput of the training-data pipeline ops at millions-of-docs
scale: measures each operator end-to-end with a noop sink (full
computation, no collect cost) over the same /dev/shm corpus the
scaling bench uses, and prints one JSON line + appends BENCH.md.

Usage: python scripts/pipeline_bench.py [n_docs] [cores]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from searchlite_spark import get_spark  # noqa: E402
from searchlite_spark.corpus import make_corpus  # noqa: E402


def main():
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 2_400_000
    cores = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    spark = get_spark("pipeline-bench", cores=cores, shuffle_partitions=32)
    src = f"/dev/shm/searchlite_scale/corpus_{n_docs}"
    if not os.path.exists(src):
        make_corpus(
            spark, n_docs, partitions=32, min_tokens=60, max_tokens=120
        ).write.mode("overwrite").parquet(src)
    corpus = spark.read.parquet(src).selectExpr(
        "url", "text", "xxhash64(url) AS doc_id"
    )

    from searchlite_spark.textops import (
        chunk_documents,
        exact_dedup,
        gopher_quality,
        langid,
        line_dedup,
        redact_pii,
        repetition_stats,
    )

    def sink(df):
        df.write.format("noop").mode("overwrite").save()

    ops = {
        "repetition_stats": lambda: sink(repetition_stats(corpus)),
        "gopher_quality": lambda: sink(gopher_quality(corpus)),
        "langid": lambda: sink(langid(corpus)),
        "redact_pii": lambda: sink(redact_pii(corpus)),
        "chunk_documents": lambda: sink(
            chunk_documents(corpus, chunk_tokens=64, overlap=8)
        ),
        "exact_dedup": lambda: sink(exact_dedup(corpus, text_col="text")),
        "line_dedup": lambda: sink(
            line_dedup(
                corpus.selectExpr(
                    "doc_id", "replace(text, ' the ', '\n') AS text"
                )
            )
        ),
    }

    # warm the JVM/scan path once so the first op doesn't eat JIT cost
    corpus.count()
    results = {}
    for name, fn in ops.items():
        t0 = time.time()
        fn()
        secs = round(time.time() - t0, 2)
        results[name] = {
            "secs": secs,
            "docs_per_sec": round(n_docs / secs),
        }
        print(f"{name}: {secs}s = {results[name]['docs_per_sec']} docs/s",
              file=sys.stderr)

    line = json.dumps(
        {"metric": "pipeline-op throughput", "n_docs": n_docs,
         "cores": cores, "ops": results}
    )
    print(line)

    stamp = time.strftime("%Y-%m-%d %H:%M UTC", time.gmtime())
    rows = "\n".join(
        f"| {name} | {r['secs']} | {r['docs_per_sec']:,} |"
        for name, r in results.items()
    )
    with open(os.path.join(REPO, "BENCH.md"), "a") as f:
        f.write(
            f"\n## Pipeline-op throughput {stamp}\n\n"
            f"{n_docs:,} docs (60-120 tokens each), local[{cores}], noop sink\n"
            f"(full compute, no collect):\n\n"
            f"| op | secs | docs/sec |\n|---|---|---|\n{rows}\n"
        )
    spark.stop()


if __name__ == "__main__":
    main()
