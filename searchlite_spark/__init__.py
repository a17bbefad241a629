"""searchlite_spark — a PySpark-native inverted-index build + BM25 query engine.

A brand-new engine (NOT a port) with the query and data-processing
capabilities of the reference Rust engine ``davidkelley/searchlite``
(a SQLite-flavored Lucene: segmented inverted index, BM25 ranking with
WAND/BMW pruning, ES-style query AST, fast-field filters and
aggregations).  Everything here is re-expressed Spark-first:

* index build = a batch DataFrame job (tokenize via Arrow-batched
  pandas functions -> explode -> partial per-partition posting merge ->
  shuffle by term -> final posting lists + delta+varint payload with
  block-max metadata), persisted as Parquet tables
  (``postings``, ``docmeta``, ``stats``, ``manifest``);
* queries = a small planner that compiles the reference's request JSON
  into DataFrame plans (broadcast the query terms, join postings,
  score with a float32 BM25 column expression, top-k via
  ``ORDER BY score DESC, doc_id ASC LIMIT k``), with a block-max WAND
  kernel in ``mapInPandas`` for the pruned path;
* aggregations = stock ``groupBy`` partial/final aggregation.

Parity contract (see SURVEY.md §7.0): default tokenizer splits on
non-alphanumeric and ASCII-lowercases (reference
``searchlite-core/src/analysis/tokenizer.rs:7-29``); BM25 is
``idf = max(ln((N-df+0.5)/(df+0.5)), 0) + 1`` with k1=0.9, b=0.4
(``searchlite-core/src/query/bm25.rs:1-6``,
``searchlite-cli/src/main.rs:196-197``), float32, ties broken by
doc_id ascending (``searchlite-core/src/query/wand.rs:30-37``).
"""

__version__ = "0.1.0"

from searchlite_spark.session import get_spark  # noqa: F401
