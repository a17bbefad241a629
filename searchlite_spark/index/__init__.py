from searchlite_spark.index.schema import IndexSchema, TextField, KeywordField, NumericField  # noqa: F401
from searchlite_spark.index.catalog import (  # noqa: F401
    Index,
    SnapshotExpiredError,
    list_snapshots,
    load_snapshot,
)
from searchlite_spark.index.build import build_index, assign_doc_ids  # noqa: F401
from searchlite_spark.index.append import append_documents, upsert_documents  # noqa: F401
from searchlite_spark.index.writer import IndexWriter  # noqa: F401
