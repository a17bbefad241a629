"""End-to-end drive of the public surface: build an index over real
testdata, run searches, and exercise the dedup-cluster family.

Usage: python scripts/verify_drive.py [sf_dir]
"""
import shutil
import sys
import tempfile

sys.path.insert(0, "/root/repo")

from searchlite_spark import get_spark
from searchlite_spark.index import (
    IndexSchema,
    KeywordField,
    NumericField,
    TextField,
    build_index,
)
from searchlite_spark.query import Searcher


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("verify", cores=8, shuffle_partitions=8)
    corpus = spark.read.parquet(f"{sf_dir}/documents.parquet")
    schema = IndexSchema(
        doc_id_field="doc_id",
        text_fields=(TextField("text"),),
        keyword_fields=(KeywordField("lang"), KeywordField("source")),
        numeric_fields=(NumericField("n_chars"),),
    )
    idx_dir = tempfile.mkdtemp(prefix="verify_idx_")
    shutil.rmtree(idx_dir, ignore_errors=True)
    idx = build_index(spark, corpus, schema, idx_dir, num_partitions=8)
    s = Searcher(idx)
    r1 = s.search({"query": "spark query window", "limit": 5})
    print("q1 hits", len(r1["hits"]), [h["doc_id"] for h in r1["hits"]])
    r2 = s.search({"query": '"fast key"', "limit": 3})
    print("q2 phrase hits", len(r2["hits"]))
    r3 = s.search(
        {
            "query": "spark -query",
            "filter": [{"KeywordEq": {"field": "lang", "value": "EN"}}],
        }
    )
    print("q3 hits", len(r3["hits"]))

    from searchlite_spark.textops import (
        connected_components,
        line_dedup,
        near_dedup_survivors,
        ngram_jaccard_pairs,
    )

    pairs = ngram_jaccard_pairs(corpus, "source", threshold=0.015)
    comp = connected_components(pairs)
    print("components rows", comp.count())
    surv = near_dedup_survivors(corpus.select("doc_id", "text"), pairs)
    print("survivors", surv.count(), "of", corpus.count())
    ld = line_dedup(
        corpus.selectExpr("doc_id", "replace(text, ' the ', '\\n') as text"),
        min_docs=2,
    )
    print(
        "line_dedup rows",
        ld.count(),
        "removed total",
        ld.agg({"lines_removed": "sum"}).first()[0],
    )
    from searchlite_spark.textops import (
        chunk_documents,
        gopher_quality,
        redact_pii,
        repetition_stats,
    )

    print("chunks", chunk_documents(corpus, chunk_tokens=8, overlap=2).count())
    print(
        "gopher keep",
        gopher_quality(corpus, min_words=25, min_stop_hits=1)
        .groupBy("keep")
        .count()
        .collect(),
    )
    print("repetition rows", repetition_stats(corpus).count())
    print(
        "redact emails",
        redact_pii(corpus).agg({"n_email": "sum"}).first()[0],
    )
    from searchlite_spark.textops import decontaminate, minhash_dedup

    probes = corpus.where("doc_id < 5").select("text")
    print("decontaminated survivors", decontaminate(corpus, probes, n=5).count())
    print("minhash_dedup survivors", minhash_dedup(corpus).count())
    spark.stop()
    shutil.rmtree(idx_dir, ignore_errors=True)
    print("VERIFY-OK")


if __name__ == "__main__":
    main()
