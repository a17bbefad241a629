"""Tokenizers with token/position parity to the reference engine.

Reference semantics (cited for the parity audit, not copied — the
reference is Rust):

* ``default``  — scan chars; alphanumeric chars (Unicode ``is_alphanumeric``)
  accumulate into the current token with **ASCII-only** lowercasing
  (``to_ascii_lowercase``: 'É' stays 'É'); any other char closes the
  token; positions are dense token ordinals.
  (searchlite-core/src/analysis/tokenizer.rs:7-29)
* ``unicode``  — NFKC normalize, UAX-29 word segmentation, full Unicode
  lowercase.  (tokenizer.rs:32-42)
* ``whitespace`` — split on Unicode whitespace, no case folding.
  (tokenizer.rs:45-54)
* multi-value fields: successive values continue positions at
  ``max_pos + 1`` (or +1 if the value produced no tokens).
  (searchlite-core/src/index/segment.rs:663-692)
* keyword normalization: ASCII lowercase + de-dup per doc.
  (segment.rs:700-723)

These are plain-Python-per-string functions (regex scanning is C-speed)
invoked from Arrow-batched ``mapInPandas`` / pandas UDFs — never from
row-at-a-time Spark UDFs.
"""

from __future__ import annotations

import re
import unicodedata

# Runs of Unicode alphanumerics.  Python's \w == str.isalnum() chars plus
# underscore, so [^\W_] is exactly the isalnum() char class, which matches
# Rust's char::is_alphanumeric (Alphabetic | Nd | Nl | No) for all
# practical inputs.
_ALNUM_RUN = re.compile(r"[^\W_]+", re.UNICODE)

# ASCII-only lowercase: A-Z -> a-z, everything else (incl. 'É') untouched.
_ASCII_LOWER = str.maketrans(
    "ABCDEFGHIJKLMNOPQRSTUVWXYZ", "abcdefghijklmnopqrstuvwxyz"
)

_WS = re.compile(r"\s+", re.UNICODE)


def ascii_lower(s: str) -> str:
    return s.translate(_ASCII_LOWER)


def default_tokenize(text: str) -> list[tuple[str, int]]:
    """Split on non-alphanumerics, ASCII-lowercase; dense positions."""
    return [
        (m.group(0).translate(_ASCII_LOWER), i)
        for i, m in enumerate(_ALNUM_RUN.finditer(text))
    ]


def unicode_tokenize(text: str) -> list[tuple[str, int]]:
    """NFKC normalize -> word segments -> full lowercase.

    Word segmentation approximates UAX-29 with alphanumeric runs joined
    across medial apostrophes ('), which matches ``unicode_words`` for
    ordinary prose.
    """
    norm = unicodedata.normalize("NFKC", text)
    toks = _UNI_WORD.findall(norm)
    return [(t.lower(), i) for i, t in enumerate(toks)]


_UNI_WORD = re.compile(r"[^\W_]+(?:['’][^\W_]+)*", re.UNICODE)


def whitespace_tokenize(text: str) -> list[tuple[str, int]]:
    return [(t, i) for i, t in enumerate(_WS.split(text.strip())) if t]


TOKENIZERS = {
    "default": default_tokenize,
    "unicode": unicode_tokenize,
    "whitespace": whitespace_tokenize,
}


def tokenize_values(
    values: list[str], tokenize=default_tokenize
) -> list[tuple[str, int]]:
    """Tokenize a multi-valued field with the reference's position-gap
    rule: each subsequent value continues at ``max_pos + 1``, or +1 when
    a value emitted no tokens (segment.rs:663-692)."""
    out: list[tuple[str, int]] = []
    offset = 0
    for v in values:
        toks = tokenize(v)
        if toks:
            out.extend((t, offset + p) for t, p in toks)
            offset += toks[-1][1] + 1
        else:
            offset += 1
    return out


def normalize_keyword(value: str) -> str:
    """Keyword index normalization: ASCII-only lowercase
    (segment.rs:700-712; util/normalizer.rs)."""
    return value.translate(_ASCII_LOWER)
