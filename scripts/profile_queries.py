"""Per-query profiling for the optimization round (guide §1):

For every bench query: run warm, record wall time, Spark JOB COUNT
(statusTracker per job group — each job is ~30-100 ms of fixed local
scheduling cost, so job count is the latency floor driver), and dump
`.explain("formatted")` to plans/r07/<name>_<tag>.txt.

Usage: python scripts/profile_queries.py [before|after] [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TAG = sys.argv[1] if len(sys.argv) > 1 else "before"
SF_DIR = sys.argv[2] if len(sys.argv) > 2 else os.environ.get(
    "SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0"
)
os.environ["SPARK_GRAFT_SF_DIR"] = SF_DIR
PLANS_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "plans", "r07")


def main():
    import bench as B
    from searchlite_spark import get_spark
    from searchlite_spark.query.aggs import run_aggregations
    from pyspark.sql import functions as F

    os.makedirs(PLANS_DIR, exist_ok=True)
    spark = get_spark("profile", cores=int(os.environ.get("SPARK_GRAFT_CPUS", "32")),
                      shuffle_partitions=max(int(os.environ.get("SPARK_GRAFT_CPUS", "32")), 8))
    searcher, idx, _ = B.build_and_searcher(spark, rebuild=False)
    sc = spark.sparkContext
    tracker = sc.statusTracker()

    def df_for(name):
        for qn, req in B.HEADLINE:
            if qn == name:
                return (
                    searcher.match_set(req)
                    .orderBy(F.desc("score"), F.asc("doc_id"))
                    .limit(int(req.get("limit", 10)))
                )
        for qn, req in B.KERNEL:
            if qn == name:
                return searcher.topk(req)
        return None

    names = [n for n, _ in B.HEADLINE] + [n for n, _ in B.KERNEL]
    results = []
    for name in names:
        df = df_for(name)
        # warm twice (plan cache + shuffle warm)
        df.collect()
        df = df_for(name)
        df.collect()
        samples = []
        jobs = None
        for it in range(3):
            df = df_for(name)
            group = f"{name}-{it}"
            sc.setJobGroup(group, name)
            t0 = time.time()
            df.collect()
            samples.append(time.time() - t0)
            jobs = len(tracker.getJobIdsForGroup(group))
            sc.setJobGroup(None, None)
        with open(os.path.join(PLANS_DIR, f"{name}_{TAG}.txt"), "w") as f:
            f.write(df_for(name)._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))
        results.append((name, min(samples), sorted(samples), jobs))
        print(f"{name:24s} min={min(samples):.3f}s jobs={jobs} samples={[round(s,3) for s in samples]}")

    # aggs: run_aggregations collects internally; time + jobs only
    for name, req, aggs in B.AGGS:
        run_aggregations(searcher.match_set(req), searcher.docs, aggs)
        samples = []
        jobs = None
        for it in range(3):
            group = f"{name}-{it}"
            sc.setJobGroup(group, name)
            t0 = time.time()
            run_aggregations(searcher.match_set(req), searcher.docs, aggs)
            samples.append(time.time() - t0)
            jobs = len(tracker.getJobIdsForGroup(group))
            sc.setJobGroup(None, None)
        print(f"{name:24s} min={min(samples):.3f}s jobs={jobs} samples={[round(s,3) for s in samples]}")

    spark.stop()


if __name__ == "__main__":
    main()
