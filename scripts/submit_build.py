"""spark-submit entrypoint for the index build.

Usage (cluster or local):

    scripts/make_pyfiles.sh        # builds dist/searchlite_spark.zip
    spark-submit \\
        --py-files dist/searchlite_spark.zip \\
        scripts/submit_build.py \\
        --input  /data/corpus.parquet \\
        --output /data/index \\
        --doc-id-field url \\
        --text-fields text \\
        --keyword-fields lang \\
        [--resumable --chunks 64] [--id-mode assign|column]

The session comes from spark-submit (master/executors configured
there); this script only declares the job.
"""

from __future__ import annotations

import argparse
import json


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--doc-id-field", default="url")
    ap.add_argument("--text-fields", default="text")
    ap.add_argument("--keyword-fields", default="")
    ap.add_argument("--numeric-fields", default="")
    ap.add_argument("--id-mode", default="assign", choices=["assign", "column"])
    ap.add_argument("--block-size", type=int, default=128)
    ap.add_argument("--resumable", action="store_true")
    ap.add_argument("--chunks", type=int, default=16)
    ap.add_argument("--num-partitions", type=int, default=None)
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName("searchlite_spark_build").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    from searchlite_spark.index import (
        IndexSchema, KeywordField, NumericField, TextField,
    )

    schema = IndexSchema(
        doc_id_field=args.doc_id_field,
        text_fields=tuple(
            TextField(f) for f in args.text_fields.split(",") if f
        ),
        keyword_fields=tuple(
            KeywordField(f) for f in args.keyword_fields.split(",") if f
        ),
        numeric_fields=tuple(
            NumericField(f) for f in args.numeric_fields.split(",") if f
        ),
    )
    corpus = spark.read.parquet(args.input)
    if args.resumable:
        from searchlite_spark.index.resume import build_index_resumable

        idx = build_index_resumable(
            spark, corpus, schema, args.output,
            chunks=args.chunks, block_size=args.block_size,
            id_mode=args.id_mode, num_partitions=args.num_partitions,
        )
    else:
        from searchlite_spark.index import build_index

        idx = build_index(
            spark, corpus, schema, args.output,
            block_size=args.block_size, id_mode=args.id_mode,
            num_partitions=args.num_partitions,
        )
    print(json.dumps(idx.manifest["metrics"], default=str))
    spark.stop()


if __name__ == "__main__":
    main()
