import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def spark():
    from searchlite_spark.session import get_spark

    s = get_spark("searchlite_spark_tests", cores=os.environ.get("SPARK_GRAFT_CPUS", "8"),
                  shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def tiny_corpus(spark):
    """The reference's docs.jsonl-style 3-doc corpus (F2)."""
    rows = [
        ("doc1", "Rust is a systems programming language fast and safe", "en", 2015),
        ("doc2", "Python is a programming language that is easy to learn", "en", 1991),
        ("doc3", "Die Programmiersprache Rust ist schnell", "de", 2015),
    ]
    return spark.createDataFrame(rows, "_id STRING, body STRING, lang STRING, year LONG")


@pytest.fixture(scope="session")
def tiny_index(spark, tiny_corpus, tmp_path_factory):
    from searchlite_spark.index import IndexSchema, TextField, KeywordField, NumericField, build_index

    schema = IndexSchema(
        doc_id_field="_id",
        text_fields=(TextField("body"),),
        keyword_fields=(KeywordField("lang"),),
        numeric_fields=(NumericField("year"),),
    )
    out = str(tmp_path_factory.mktemp("tiny_index"))
    return build_index(spark, tiny_corpus, schema, out, num_partitions=2)
