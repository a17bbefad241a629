"""Property test: the Arrow/RE2 build-time tokenizer kernel must agree
with the Python query-time analyzer on randomized text — the cross-path
parity whose violation was round 2's highest-severity bug (a term
indexed under a different key than the query analyzes to never
matches).

Runs WITHOUT Spark: the kernel is a plain function over pyarrow record
batches, so hypothesis can drive hundreds of examples cheaply.

Alphabet note: realistic web-text classes (latin incl. accents, CJK,
Arabic, Devanagari + combining marks, digits, punctuation, whitespace).
Truly pathological Numeric_Type corners (symbols whose isnumeric()
differs from their general category, e.g. some Tibetan half-digits) are
deliberately out of alphabet — the engine's contract is parity on web
text, pinned by the golden tests; this property extends the goldens
with randomized composition of those classes."""

from hypothesis import given, settings, strategies as st

ALPHABET = (
    "abcXYZéüñß日本語中文عربىहिन्दी़ॅกำ0123456789 \t\n.,;:!?-_'\"()[]<>/@#%&*+=«»“”"
)

texts = st.lists(
    st.text(alphabet=ALPHABET, max_size=80), min_size=1, max_size=6
)


def _expected(texts_list):
    from searchlite_spark.analysis.tokenizers import default_tokenize

    out = {}
    for doc_id, text in enumerate(texts_list):
        toks = default_tokenize(text)
        dl = len(toks)
        per = {}
        for t, p in toks:
            per.setdefault(t, []).append(p)
        for t, ps in per.items():
            out[(doc_id, f"body:{t}")] = (len(ps), tuple(ps), dl)
    return out


def _kernel_out(texts_list):
    import pyarrow as pa

    from searchlite_spark.index.build import _make_arrow_split_kernel

    rb = pa.record_batch(
        {
            "doc_id": pa.array(range(len(texts_list)), pa.int64()),
            "body": pa.array(texts_list, pa.string()),
        }
    )
    out = {}
    for batch in _make_arrow_split_kernel(("body",))(iter([rb])):
        t = pa.Table.from_batches([batch])
        for row in t.to_pylist():
            out[(row["doc_id"], row["term"])] = (
                row["tf"],
                tuple(row["positions"]),
                row["dl"],
            )
    return out


@given(texts)
@settings(max_examples=250, deadline=None)
def test_arrow_kernel_matches_python_analyzer(texts_list):
    assert _kernel_out(texts_list) == _expected(texts_list)


def test_kernel_parity_known_hard_cases():
    """The round-3 combining-mark regression class, pinned."""
    cases = [
        ["हिन्दी में पाठ"],           # Devanagari with matras
        ["éclair café"],  # combining acute
        ["ÅNGSTRÖM Ångström"],        # non-ASCII uppercase stays
        ["a_b c-d", "_", "__x__"],    # underscore is a separator
        ["", "   ", "\n\t"],          # empty / whitespace-only docs
        ["ｆｕｌｌｗｉｄｔｈ１２３"],   # fullwidth forms
    ]
    for c in cases:
        assert _kernel_out(c) == _expected(c), c
