"""Multi-JVM scaling evidence: the same index build on Spark
``local-cluster`` — separate executor JVMs on one host — at N vs 4N
executors.

Why this exists: the primary scaling numbers (BENCH.md) use local[N]
vs local[4N], i.e. task-parallelism inside ONE JVM.  That leaves a
confound: is the sub-linear tail at higher core counts a property of
the build (bad), or of one JVM's allocator/GC and the host's single
DRAM bus (environmental)?  ``local-cluster[W, C, mem]`` launches W
standalone worker JVMs with C cores each — the closest a single box
gets to real executors: separate heaps, separate GC, separate Python
worker pools, shuffle over the block manager between processes.

Experiment: W=1 vs W=4 workers at 1 core each (N=1 executor -> 4N=4
executors), matching the recorded single-JVM 1-vs-4-core runs so the
two tables are directly comparable.

Usage: python scripts/scaling_cluster_bench.py [n_docs] [repeats]
Appends to BENCH.md and prints one JSON line.
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import sys, os, time, json
sys.path.insert(0, {repo!r})
workers = int(sys.argv[1]); cores = int(sys.argv[2]); n_docs = int(sys.argv[3])
out = sys.argv[4]
from pyspark.sql import SparkSession
PARTS = 32
# ship the package to the executor python workers exactly as a real
# cluster submit would: spark-submit --py-files dist/searchlite_spark.zip
# (the executors are separate JVMs here — they do NOT inherit the
# driver's sys.path like local[*] does)
pyzip = os.path.join({repo!r}, "dist", "searchlite_spark.zip")
builder = (
    SparkSession.builder
    .master(f"local-cluster[{{workers}},{{cores}},8192]")
    .appName("scale-cluster")
    .config("spark.submit.pyFiles", pyzip)
    .config("spark.sql.shuffle.partitions", str(PARTS))
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.adaptive.coalescePartitions.enabled", "false")
    .config("spark.sql.files.maxPartitionBytes", "8m")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.execution.arrow.pyspark.enabled", "true")
    .config("spark.driver.memory", "6g")
    .config("spark.executor.memory", "6g")
    .config("spark.ui.enabled", "false")
    .config("spark.local.dir", "/dev/shm/spark_local")
)
spark = builder.getOrCreate()
spark.sparkContext.setLogLevel("WARN")
from searchlite_spark.corpus import make_corpus, corpus_index_schema, with_warc_ts_ms
from searchlite_spark.index import build_index
src_path = f"/dev/shm/searchlite_scale/corpus_{{n_docs}}"
if not os.path.exists(src_path + "/_SUCCESS"):
    with_warc_ts_ms(
        make_corpus(spark, n_docs, partitions=PARTS, min_tokens=60, max_tokens=120)
    ).write.mode("overwrite").parquet(src_path)
corpus = spark.read.parquet(src_path)
# untimed warmup (codegen/JIT, parquet readers, python workers)
build_index(spark, corpus.limit(2000), corpus_index_schema(), out + "_warm",
            id_mode="column", num_partitions=8)
t0 = time.time()
idx = build_index(spark, corpus, corpus_index_schema(), out, id_mode="column",
                  num_partitions=PARTS,
                  store_columns=["url", "warc_ts", "text", "lang", "warc_ts_ms"],
                  docs_layout="copy")
secs = time.time() - t0
print(json.dumps({{"workers": workers, "cores": cores, "secs": secs,
                   "n_docs": idx.stats["n_docs"]}}))
spark.stop()
"""


def _run_child(workers: int, cores: int, n_docs: int, out: str) -> dict:
    code = CHILD.format(repo=REPO)
    r = subprocess.run(
        [sys.executable, "-c", code, str(workers), str(cores), str(n_docs), out],
        capture_output=True, text=True, timeout=3600,
    )
    lines = [l for l in r.stdout.strip().splitlines() if l.startswith("{")]
    if not lines:
        raise RuntimeError(f"child failed: {r.stderr[-2000:]}")
    return json.loads(lines[-1])


def wait_for_quiet(l1_max: float = 2.0, l5_max: float = 4.0, timeout: int = 1800):
    """The host carries external load; gate timing runs on loadavg."""
    t0 = time.time()
    while time.time() - t0 < timeout:
        with open("/proc/loadavg") as f:
            l1, l5 = map(float, f.read().split()[:2])
        if l1 < l1_max and l5 < l5_max:
            return
        time.sleep(20)


def run_cluster_scaling(n_docs: int = 2_400_000, repeats: int = 3,
                        cores_per_worker: int = 1) -> dict:
    runs_n, runs_4n = [], []
    for _ in range(repeats):
        wait_for_quiet()
        runs_n.append(
            _run_child(1, cores_per_worker, n_docs,
                       "/dev/shm/searchlite_scale/cw1")
        )
        wait_for_quiet()
        runs_4n.append(
            _run_child(4, cores_per_worker, n_docs,
                       "/dev/shm/searchlite_scale/cw4")
        )
    secs_n = sorted(r["secs"] for r in runs_n)
    secs_4n = sorted(r["secs"] for r in runs_4n)
    med_n, med_4n = statistics.median(secs_n), statistics.median(secs_4n)
    nd = runs_n[0]["n_docs"]
    eff = (nd / med_4n) / (4 * (nd / med_n))
    return {
        "metric": "index-build scaling efficiency, separate executor "
                  "JVMs (local-cluster), N=1 -> 4N=4 workers x "
                  f"{cores_per_worker} core, median-of-{repeats}",
        "value": round(eff, 3),
        "unit": "efficiency",
        "n_docs": nd,
        "secs_n": round(med_n, 2),
        "secs_4n": round(med_4n, 2),
        "throughput_n": round(nd / med_n, 1),
        "throughput_4n": round(nd / med_4n, 1),
        "samples_n": [round(s, 2) for s in secs_n],
        "samples_4n": [round(s, 2) for s in secs_4n],
        "efficiency_best_of": round((nd / secs_4n[0]) / (4 * (nd / secs_n[0])), 3),
    }


def main():
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 2_400_000
    repeats = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    res = run_cluster_scaling(n_docs, repeats)
    print(json.dumps(res))
    stamp = time.strftime("%Y-%m-%d %H:%M UTC", time.gmtime())
    with open(os.path.join(REPO, "BENCH.md"), "a") as f:
        f.write(
            f"\n## Multi-JVM scaling run (local-cluster) {stamp}\n\n"
            f"Separate executor JVMs (standalone workers), 1 core each —"
            f" {res['n_docs']} docs:\n\n"
            f"| executors | build secs (median) | docs/sec | samples |\n"
            f"|---|---|---|---|\n"
            f"| 1 | {res['secs_n']} | {res['throughput_n']} | {res['samples_n']} |\n"
            f"| 4 | {res['secs_4n']} | {res['throughput_4n']} | {res['samples_4n']} |\n\n"
            f"Efficiency N->4N executors: **{res['value']}** median-of-"
            f"{len(res['samples_n'])} (best-of {res['efficiency_best_of']});"
            f" target >= 0.8.\n"
        )


if __name__ == "__main__":
    main()
