"""Analyzer = tokenizer + ordered token-filter chain + position resequencing.

Mirrors the reference's analysis pipeline semantics
(searchlite-core/src/analysis/analyzer.rs:22-28):

    tokens = tokenizer(text)
    for f in filters: tokens = f(tokens)
    resequence_positions(tokens)

Filter semantics (analyzer.rs:356-477):

* ``lowercase``  — full Unicode lowercase.
* ``stopwords``  — drop tokens in set; named list ``en`` is the
  reference's built-in 119-word list (copied below — it is data, not
  code).
* ``stemmer``    — Snowball English only.
* ``synonyms``   — multi-token ``from`` -> ``to`` expansion at the
  first matched token's position; originals kept; first matching rule
  wins; scan continues after the matched span.
* ``edge_ngram`` — per token emit char prefixes min..=max (clamped to
  token length), same position.
* resequencing   — renumber positions densely; tokens sharing a source
  position share the output position.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from searchlite_spark.analysis import porter2
from searchlite_spark.analysis.tokenizers import TOKENIZERS

# The reference's built-in English stopword list
# (searchlite-core/src/analysis/analyzer.rs ENGLISH_STOPWORDS — verbatim
# data so stopword filtering matches token-for-token).
ENGLISH_STOPWORDS = frozenset(
    """a about after all also an and another any are as at be because been
    before being between both but by came can come could did do each for
    from get got had has have he her here him himself his how if in into
    is it like make many me might more most much must my never now of on
    only or other our out over said same see should since some still such
    take than that the their them then there these they this those through
    to too under up use very want was way we well were what when where
    which while who will with would you your""".split()
)

Token = tuple[str, int]  # (text, position)


def _lowercase(tokens: list[Token]) -> list[Token]:
    return [(t.lower(), p) for t, p in tokens]


def _stopwords(tokens: list[Token], words: frozenset[str]) -> list[Token]:
    return [(t, p) for t, p in tokens if t not in words]


def _stem(tokens: list[Token]) -> list[Token]:
    return [(porter2.stem(t), p) for t, p in tokens]


def _synonyms(tokens: list[Token], rules: list[tuple[list[str], list[str]]]) -> list[Token]:
    if not rules:
        return tokens
    out: list[Token] = []
    i = 0
    n = len(tokens)
    while i < n:
        matched = False
        for frm, to in rules:
            m = len(frm)
            if m == 0 or i + m > n:
                continue
            if all(frm[j] == tokens[i + j][0] for j in range(m)):
                out.extend(tokens[i : i + m])
                pos = tokens[i][1]
                out.extend((t, pos) for t in to)
                i += m
                matched = True
                break
        if not matched:
            out.append(tokens[i])
            i += 1
    return out


def _edge_ngram(tokens: list[Token], mn: int, mx: int) -> list[Token]:
    out: list[Token] = []
    for t, p in tokens:
        ln = len(t)
        hi = min(mx, ln)
        lo = min(mn, hi)
        if lo == 0 or hi == 0:
            continue
        for size in range(lo, hi + 1):
            out.append((t[:size], p))
    return out


def _resequence(tokens: list[Token]) -> list[Token]:
    out: list[Token] = []
    last_src: int | None = None
    nxt = 0
    for t, p in tokens:
        if last_src != p:
            out.append((t, nxt))
            last_src = p
            nxt += 1
        else:
            out.append((t, nxt - 1))
    return out


@dataclass(frozen=True)
class Analyzer:
    """Callable analyzer; hashable/picklable so it ships to executors."""

    tokenizer: str = "default"
    filters: tuple = field(default_factory=tuple)  # tuple of (kind, cfg)

    def __call__(self, text: str) -> list[Token]:
        tokens = TOKENIZERS[self.tokenizer](text)
        for kind, cfg in self.filters:
            if kind == "lowercase":
                tokens = _lowercase(tokens)
            elif kind == "stopwords":
                tokens = _stopwords(tokens, cfg)
            elif kind == "stemmer":
                tokens = _stem(tokens)
            elif kind == "synonyms":
                tokens = _synonyms(tokens, list(cfg))
            elif kind == "edge_ngram":
                tokens = _edge_ngram(tokens, cfg[0], cfg[1])
            else:  # pragma: no cover
                raise ValueError(f"unknown token filter `{kind}`")
        return _resequence(tokens)

    def lowercases(self) -> bool:
        """Whether pattern inputs should be lowercased
        (analyzer.rs:33-46 normalize_pattern)."""
        return self.tokenizer in ("default", "unicode") or any(
            k == "lowercase" for k, _ in self.filters
        )


def build_analyzer(defn: dict | None) -> Analyzer:
    """Build from a schema-JSON analyzer definition, e.g.
    ``{"tokenizer": "default", "filters": [{"type": "stopwords",
    "stopwords": "en"}, {"type": "stemmer", "language": "english"}]}``.
    """
    if defn is None:
        return Analyzer()
    tok = defn.get("tokenizer", "default")
    if tok not in TOKENIZERS:
        raise ValueError(f"unknown tokenizer `{tok}`")
    filters: list[tuple] = []
    for f in defn.get("filters", []):
        if isinstance(f, str):
            f = {"type": f}
        kind = f["type"]
        if kind == "lowercase":
            filters.append(("lowercase", None))
        elif kind == "stopwords":
            cfg = f.get("stopwords", "en")
            if isinstance(cfg, str):
                if cfg.lower() not in ("en", "english"):
                    raise ValueError(f"unsupported stopword list `{cfg}`")
                words = ENGLISH_STOPWORDS
            else:
                words = frozenset(cfg)
            filters.append(("stopwords", words))
        elif kind == "stemmer":
            lang = str(f.get("language", "english")).lower()
            if lang not in ("en", "eng", "english"):
                raise ValueError(f"unsupported stemmer language `{lang}`")
            filters.append(("stemmer", None))
        elif kind == "synonyms":
            rules = tuple(
                (tuple(r["from"]), tuple(r["to"])) for r in f.get("rules", [])
            )
            filters.append(("synonyms", rules))
        elif kind == "edge_ngram":
            mn, mx = int(f.get("min", 1)), int(f.get("max", 2))
            if mn <= 0 or mx <= 0:
                raise ValueError("edge_ngram min and max must be positive")
            if mn > mx:
                raise ValueError("edge_ngram min must be <= max")
            filters.append(("edge_ngram", (mn, mx)))
        else:
            raise ValueError(f"unknown token filter `{kind}`")
    return Analyzer(tokenizer=tok, filters=tuple(filters))
