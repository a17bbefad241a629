from searchlite_spark.query.engine import Searcher  # noqa: F401
