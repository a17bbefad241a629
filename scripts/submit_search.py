"""spark-submit entrypoint for queries against a built index.

    spark-submit --py-files dist/searchlite_spark.zip \\
        scripts/submit_search.py --index /data/index \\
        --request '{"query": "rust language", "limit": 5}'
"""

from __future__ import annotations

import argparse
import json


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--index", required=True)
    ap.add_argument("--request", required=True, help="SearchRequest JSON")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName("searchlite_spark_search").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    from searchlite_spark.index.catalog import Index
    from searchlite_spark.query import Searcher

    searcher = Searcher(Index(args.index, spark))
    result = searcher.search(json.loads(args.request))
    print(json.dumps(result, default=str))
    spark.stop()


if __name__ == "__main__":
    main()
