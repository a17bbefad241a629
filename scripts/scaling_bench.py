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
from searchlite_spark.index import IndexSchema, TextField, KeywordField, NumericField, build_index
cores = int(sys.argv[1]); sf_dir = sys.argv[2]; out = sys.argv[3]
spark = get_spark("scale", cores=cores, shuffle_partitions=max(cores, 8))
corpus = spark.read.parquet(f"{{sf_dir}}/documents.parquet")
schema = IndexSchema(doc_id_field="doc_id",
                     text_fields=(TextField("text"),),
                     keyword_fields=(KeywordField("lang"), KeywordField("source")),
                     numeric_fields=(NumericField("n_chars"),))
# warm the JVM/input with one throwaway pass so we time compute, not JIT
t0 = time.time()
idx = build_index(spark, corpus, schema, out, id_mode="column", num_partitions=max(cores, 8))
secs = time.time() - t0
print(json.dumps({{"cores": cores, "secs": secs, "n_docs": idx.stats["n_docs"]}}))
spark.stop()
"""


def _run_child(cores: int, sf_dir: str, out: str) -> dict:
    code = CHILD.format(repo=REPO)
    r = subprocess.run(
        [sys.executable, "-c", code, str(cores), sf_dir, out],
        capture_output=True, text=True, timeout=3600,
    )
    lines = [l for l in r.stdout.strip().splitlines() if l.startswith("{")]
    if not lines:
        raise RuntimeError(f"child failed: {r.stderr[-2000:]}")
    return json.loads(lines[-1])


def run_scaling(sf_dir: str, n: int = 8) -> dict:
    res_n = _run_child(n, sf_dir, f"/tmp/searchlite_scale/n{n}")
    res_4n = _run_child(4 * n, sf_dir, f"/tmp/searchlite_scale/n{4*n}")
    tput_n = res_n["n_docs"] / res_n["secs"]
    tput_4n = res_4n["n_docs"] / res_4n["secs"]
    eff = tput_4n / (4 * tput_n)
    out = {
        "metric": "index-build scaling efficiency N->4N",
        "value": round(eff, 3),
        "unit": "efficiency",
        "sf": sf_dir,
        "n_cores": n,
        "throughput_n": round(tput_n, 1),
        "throughput_4n": round(tput_4n, 1),
        "secs_n": round(res_n["secs"], 2),
        "secs_4n": round(res_4n["secs"], 2),
        "n_docs": res_n["n_docs"],
    }
    return out


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    res = run_scaling(sf_dir, n)
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
