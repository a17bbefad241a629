"""Golden tests from the reference's analyzer/tokenizer test cases
(FIXTURES.md F6; tokenizer.rs:61-90, analyzer.rs:479-570)."""

from searchlite_spark.analysis.analyzer import Analyzer, build_analyzer
from searchlite_spark.analysis.tokenizers import (
    default_tokenize,
    normalize_keyword,
    tokenize_values,
    unicode_tokenize,
    whitespace_tokenize,
)


def test_default_tokenizer_golden():
    assert default_tokenize("Rust: systems programming language") == [
        ("rust", 0),
        ("systems", 1),
        ("programming", 2),
        ("language", 3),
    ]


def test_default_tokenizer_ascii_only_lowercase():
    # 'É' stays 'É' under ASCII-only lowercase (tokenizer.rs:13)
    assert default_tokenize("CAFÉ Bar") == [("cafÉ", 0), ("bar", 1)]


def test_default_tokenizer_underscore_splits():
    # '_' is not alphanumeric for char::is_alphanumeric
    assert default_tokenize("foo_bar") == [("foo", 0), ("bar", 1)]


def test_default_tokenizer_numbers():
    assert default_tokenize("abc123 42") == [("abc123", 0), ("42", 1)]


def test_unicode_tokenizer_nfkc_casefold():
    # NFKC folds the ﬂ ligature; full lowercase folds É
    assert unicode_tokenize("CAFÉ ﬂavor") == [("café", 0), ("flavor", 1)]


def test_whitespace_tokenizer():
    assert whitespace_tokenize("  Foo  BAR\tbaz ") == [
        ("Foo", 0),
        ("BAR", 1),
        ("baz", 2),
    ]


def test_multi_value_position_gap():
    # positions continue at max_pos + 1 (segment.rs:663-692)
    assert tokenize_values(["a b", "c"]) == [("a", 0), ("b", 1), ("c", 2)]
    # empty value advances by 1
    assert tokenize_values(["a", "", "c"]) == [("a", 0), ("c", 2)]


def test_keyword_normalization():
    assert normalize_keyword("HelloWORLD") == "helloworld"
    assert normalize_keyword("ÉCLAIR") == "ÉCLAIR".translate(
        str.maketrans("ABCDEFGHIJKLMNOPQRSTUVWXYZ", "abcdefghijklmnopqrstuvwxyz")
    )


def test_stopwords_filter():
    a = build_analyzer({"tokenizer": "default", "filters": [{"type": "stopwords", "stopwords": "en"}]})
    assert a("the quick brown fox") == [("quick", 0), ("brown", 1), ("fox", 2)]


def test_stemmer_filter():
    a = build_analyzer({"tokenizer": "default", "filters": [{"type": "stemmer", "language": "english"}]})
    assert a("running runners") == [("run", 0), ("runner", 1)]


def test_synonyms_same_position():
    a = build_analyzer(
        {
            "tokenizer": "default",
            "filters": [
                {"type": "synonyms", "rules": [{"from": ["nyc"], "to": ["new", "york"]}]}
            ],
        }
    )
    assert a("nyc subway") == [("nyc", 0), ("new", 0), ("york", 0), ("subway", 1)]


def test_edge_ngram():
    a = build_analyzer(
        {"tokenizer": "default", "filters": [{"type": "edge_ngram", "min": 1, "max": 3}]}
    )
    assert a("rust") == [("r", 0), ("ru", 0), ("rus", 0)]


def test_resequencing_after_stopwords():
    # positions renumbered densely after filtering
    a = build_analyzer(
        {"tokenizer": "default", "filters": [{"type": "stopwords", "stopwords": ["b"]}]}
    )
    assert a("a b c") == [("a", 0), ("c", 1)]


def test_default_analyzer_no_filters():
    a = Analyzer()
    assert a("Hello, World!") == [("hello", 0), ("world", 1)]


def test_porter2_samples():
    from searchlite_spark.analysis.porter2 import stem

    cases = {
        "running": "run",
        "runners": "runner",
        "consign": "consign",
        "consigned": "consign",
        "consolation": "consol",
        "generalization": "general",
        "agreement": "agreement",
        "happily": "happili",
        "skies": "sky",
        "dying": "die",
        "news": "news",
        "cats": "cat",
        "ties": "tie",
        "cries": "cri",
        "exceed": "exceed",
        "hopping": "hop",
        "hoping": "hope",
    }
    for w, expect in cases.items():
        assert stem(w) == expect, f"{w}: {stem(w)} != {expect}"
