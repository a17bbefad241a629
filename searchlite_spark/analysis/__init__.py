from searchlite_spark.analysis.tokenizers import (  # noqa: F401
    default_tokenize,
    unicode_tokenize,
    whitespace_tokenize,
    tokenize_values,
    normalize_keyword,
)
from searchlite_spark.analysis.analyzer import Analyzer, build_analyzer  # noqa: F401
