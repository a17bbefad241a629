from searchlite_spark.query.engine import Searcher  # noqa: F401
from searchlite_spark.query.batch import (  # noqa: F401
    BatchUnsupportedQuery,
    batch_topk,
)
