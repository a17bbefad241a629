"""Scaling-efficiency evidence (north rule): run the SAME index build
at two parallelism levels (local[N] vs local[4N] standing in for N vs
4N executors) and report throughput at both + efficiency =
T(N) / T(4N) / 4 ... i.e. speedup/4.

Usage: python scripts/scaling_bench.py [sf_dir] [N]
Writes/updates BENCH.md and prints one JSON line.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import sys, os, time, json
sys.path.insert(0, {repo!r})
from searchlite_spark import get_spark
from searchlite_spark.corpus import make_corpus, corpus_index_schema, with_warc_ts_ms
from searchlite_spark.index import build_index
cores = int(sys.argv[1]); n_docs = int(sys.argv[2]); out = sys.argv[3]
# identical plan at both levels: same partition count, same input file.
# Small-file splits + no AQE coalescing: at this (tiny, local) scale the
# default 128MB splits would cap every stage at 2-4 tasks regardless of
# cores — partition-count, not resources, would be the limiter.  On a
# real 100TB input the defaults already yield thousands of splits.
PARTS = 32
spark = get_spark("scale", cores=cores, shuffle_partitions=PARTS, extra_conf={{
    "spark.sql.files.maxPartitionBytes": "8m",
    "spark.sql.adaptive.coalescePartitions.enabled": "false",
}})
src_path = f"/dev/shm/searchlite_scale/corpus_{{n_docs}}"
if not os.path.exists(src_path + "/_SUCCESS"):
    # corpus materialized once, outside the timed window (the real
    # input is an Iceberg table, not an in-flight generator)
    with_warc_ts_ms(
        make_corpus(spark, n_docs, partitions=PARTS, min_tokens=60, max_tokens=120)
    ).write.mode("overwrite").parquet(src_path)
corpus = spark.read.parquet(src_path)
# untimed warmup: a tiny build exercises codegen/JIT, parquet readers
# and python workers — clusters are long-running, so steady-state is
# the honest thing to time
from searchlite_spark.index import build_index as _b
_b(spark, corpus.limit(2000), corpus_index_schema(), out + "_warm",
   id_mode="column", num_partitions=8)
t0 = time.time()
idx = build_index(spark, corpus, corpus_index_schema(), out, id_mode="column",
                  num_partitions=PARTS,
                  store_columns=["url", "warc_ts", "text", "lang", "warc_ts_ms"],
                  # the synthetic corpus is written doc_id-clustered
                  # (spark.range partitions), like an id-partitioned
                  # Iceberg lake table: straight-copy the docstore
                  docs_layout="copy")
secs = time.time() - t0
print(json.dumps({{"cores": cores, "secs": secs, "n_docs": idx.stats["n_docs"]}}))
spark.stop()
"""


def _run_child(cores: int, n_docs: int, out: str) -> dict:
    code = CHILD.format(repo=REPO)
    r = subprocess.run(
        [sys.executable, "-c", code, str(cores), str(n_docs), out],
        capture_output=True, text=True, timeout=3600,
    )
    lines = [l for l in r.stdout.strip().splitlines() if l.startswith("{")]
    if not lines:
        raise RuntimeError(f"child failed: {r.stderr[-2000:]}")
    return json.loads(lines[-1])


def run_scaling(sf_dir: str, n: int = 2, n_docs: int = 2_400_000, repeats: int = 3) -> dict:
    """Interleave N / 4N runs; report the MEDIAN of each level (plus
    every sample and the best-of for reference).  The sandbox host
    carries fluctuating external load, so single wall timings are noisy
    — median-of-N is the honest central estimate; best-of is the
    contention-filtered bound."""
    import statistics

    runs_n, runs_4n = [], []
    for _ in range(repeats):
        runs_n.append(_run_child(n, n_docs, f"/dev/shm/searchlite_scale/n{n}"))
        runs_4n.append(_run_child(4 * n, n_docs, f"/dev/shm/searchlite_scale/n{4*n}"))
    secs_n = sorted(r["secs"] for r in runs_n)
    secs_4n = sorted(r["secs"] for r in runs_4n)
    med_n = statistics.median(secs_n)
    med_4n = statistics.median(secs_4n)
    nd = runs_n[0]["n_docs"]
    tput_n = nd / med_n
    tput_4n = nd / med_4n
    eff = tput_4n / (4 * tput_n)
    eff_best = (nd / secs_4n[0]) / (4 * (nd / secs_n[0]))
    out = {
        "metric": "index-build scaling efficiency N->4N (median-of-%d)" % repeats,
        "value": round(eff, 3),
        "unit": "efficiency",
        "sf": sf_dir, "n_docs_input": nd,
        "n_cores": n,
        "throughput_n": round(tput_n, 1),
        "throughput_4n": round(tput_4n, 1),
        "secs_n": round(med_n, 2),
        "secs_4n": round(med_4n, 2),
        "samples_n": [round(s, 2) for s in secs_n],
        "samples_4n": [round(s, 2) for s in secs_4n],
        "efficiency_best_of": round(eff_best, 3),
        "n_docs": nd,
    }
    return out


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    repeats = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    res = run_scaling(sf_dir, n, repeats=repeats)
    print(json.dumps(res))
    stamp = time.strftime("%Y-%m-%d %H:%M UTC", time.gmtime())
    with open(os.path.join(REPO, "BENCH.md"), "a") as f:
        f.write(
            f"\n## Scaling run {stamp}\n\n"
            f"| cores | build secs | docs/sec |\n|---|---|---|\n"
            f"| {res['n_cores']} | {res['secs_n']} | {res['throughput_n']} |\n"
            f"| {4*res['n_cores']} | {res['secs_4n']} | {res['throughput_4n']} |\n\n"
            f"Efficiency N->4N: **{res['value']}** (target >= 0.8) at {sf_dir}\n"
        )


if __name__ == "__main__":
    main()
