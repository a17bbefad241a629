"""Extra benchmarks for the optimization rounds (bench.py is FROZEN).

Measures, per guide §1.4, the bench queries through a noop sink (every
column of every row computed, no collect conversion), plus a
fixed-overhead floor probe: the wall time of a minimal 2-stage AQE
query (tiny scan -> exchange -> 1-row result), which bounds what ANY
per-query optimization can reach on this harness.

Usage: SPARK_GRAFT_SF_DIR=... python bench_extra.py
Prints one JSON line {"noop": {...}, "floor_secs": ..., "host_load": ...}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import bench as B  # frozen harness: reuse its query set + builder

_median = B._median  # the recorded numbers are defined by the frozen helper


def main():
    from pyspark.sql import functions as F

    from searchlite_spark import get_spark

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("bench_extra", cores=cpus, shuffle_partitions=max(cpus, 8))
    searcher, idx, _ = B.build_and_searcher(spark, rebuild=False)
    sc = spark.sparkContext

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    out = {}
    for name, req in B.HEADLINE:
        def mk(req=req):
            return (
                searcher.match_set(req)
                .orderBy(F.desc("score"), F.asc("doc_id"))
                .limit(int(req.get("limit", 10)))
            )
        noop(mk())  # warm
        samples = []
        for _ in range(3):
            sc.setJobDescription(f"noop:{name}")
            t0 = time.time()
            noop(mk())
            samples.append(round(time.time() - t0, 4))
            sc.setJobDescription(None)
        out[name] = round(_median(samples), 4)
    for name, req in B.KERNEL:
        noop(searcher.topk(req))
        samples = []
        for _ in range(3):
            t0 = time.time()
            noop(searcher.topk(req))
            samples.append(round(time.time() - t0, 4))
        out[name] = round(_median(samples), 4)

    # floor probe: tiny parquet scan -> exchange -> 1-row agg, fresh
    # plan per run (like the bench), so it pays the same AQE stage
    # submission + py4j costs with near-zero data
    probe_dir = "/tmp/bench_extra_probe"
    spark.range(1000).withColumn("k", F.col("id") % 7).write.mode(
        "overwrite"
    ).parquet(probe_dir)

    def probe():
        df = (
            spark.read.parquet(probe_dir)
            .groupBy("k")
            .agg(F.sum("id").alias("s"))
            .orderBy(F.desc("s"))
            .limit(3)
        )
        df.collect()

    probe()
    floors = []
    for _ in range(5):
        t0 = time.time()
        probe()
        floors.append(round(time.time() - t0, 4))

    load = None
    try:
        with open("/proc/loadavg") as f:
            load = float(f.read().split()[0])
    except OSError:
        pass
    print(
        json.dumps(
            {
                "noop": out,
                "floor_secs": round(_median(floors), 4),
                "floor_runs": floors,
                "host_load": load,
                "sf": os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
