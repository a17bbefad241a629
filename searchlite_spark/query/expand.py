"""Term-group expansion: raw query terms -> qualified posting keys.

Re-expresses the reference's ``expand_term_groups``
(searchlite-core/src/api/reader.rs:1020-1099):

* text fields:   analyze the term with the *search* analyzer; each
  distinct token becomes a key ``field:token``;
* keyword fields: ASCII-lowercase the term;
* prefix/wildcard/regex: expand against the term dictionary in term
  order, capped at max_expansions (reader.rs:1164-1373) — here a
  pushed-down LIKE/RLIKE scan on the sorted ``terms`` table, collected
  driver-side (bounded to <= max_expansions rows);
* fuzzy (request-level, reader.rs:1394-1465): exact + dictionary terms
  within bounded Levenshtein distance, weight x 1/(distance+1)
  (defaults: max_edits 1, prefix_length 1, max_expansions 50,
  min_length 3 — api/types.rs:621-635).

Weight per qualified term = group boost x field boost; duplicate keys
later sum their weights (reader.rs:2971-2983, applied in the executor).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, functions as F

from searchlite_spark.analysis.tokenizers import normalize_keyword
from searchlite_spark.index.schema import IndexSchema
from searchlite_spark.query.plan import QualifiedTerm, TermGroupSpec
from searchlite_spark.query.planner import PlanBuilder


def bounded_levenshtein(a: str, b: str, max_edits: int) -> int | None:
    la, lb = len(a), len(b)
    if abs(la - lb) > max_edits:
        return None
    if la == 0:
        return lb if lb <= max_edits else None
    if lb == 0:
        return la if la <= max_edits else None
    prev = list(range(lb + 1))
    for i, ca in enumerate(a):
        curr = [i + 1] + [0] * lb
        row_min = curr[0]
        for j, cb in enumerate(b):
            cost = 0 if ca == cb else 1
            val = min(prev[j + 1] + 1, curr[j] + 1, prev[j] + cost)
            curr[j + 1] = val
            row_min = min(row_min, val)
        if row_min > max_edits:
            return None
        prev = curr
    return prev[lb] if prev[lb] <= max_edits else None


def _wildcard_to_like(pattern: str) -> str:
    out = []
    for ch in pattern:
        if ch == "*":
            out.append("%")
        elif ch == "?":
            out.append("_")
        elif ch in ("%", "_", "\\"):
            out.append("\\" + ch)
        else:
            out.append(ch)
    return "".join(out)


def _literal_prefix(pattern: str) -> str:
    return re.split(r"[*?]", pattern, 1)[0]


def _regex_literal_prefix(pattern: str) -> str:
    """Leading literal chars of a regex (util/regex.rs:5-8 equivalent)."""
    out = []
    for ch in pattern:
        if ch.isalnum():
            out.append(ch)
        else:
            break
    return "".join(out)


class DictionaryExpander:
    """Capped expansions against the sorted terms table."""

    def __init__(self, terms_df: DataFrame):
        self.terms_df = terms_df

    def prefix(self, field: str, prefix: str, cap: int) -> list[str]:
        key_prefix = f"{field}:{prefix}"
        rows = (
            self.terms_df.where(
                F.col("term").startswith(key_prefix) & (F.length("term") > len(field) + 1)
            )
            .select("term")
            .orderBy("term")
            .limit(cap)
            .collect()
        )
        return [r["term"] for r in rows]

    def wildcard(self, field: str, pattern: str, cap: int) -> list[str]:
        lit = _literal_prefix(pattern)
        like = _wildcard_to_like(pattern)
        cond = F.col("term").startswith(f"{field}:{lit}") & F.col("term").like(
            f"{field}:{like}"
        )
        rows = (
            self.terms_df.where(cond & (F.length("term") > len(field) + 1))
            .select("term")
            .orderBy("term")
            .limit(cap)
            .collect()
        )
        return [r["term"] for r in rows]

    def regex(self, field: str, pattern: str, cap: int) -> list[str]:
        re.compile(pattern)  # validate like the reference (errors propagate)
        lit = _regex_literal_prefix(pattern)
        anchored = f"^(?:{pattern})$"
        cond = F.col("term").startswith(f"{field}:{lit}")
        rows = (
            self.terms_df.where(cond & (F.length("term") > len(field) + 1))
            .select("term")
            .where(
                F.regexp_extract(
                    F.expr(f"substring(term, {len(field) + 2})"), anchored, 0
                )
                != ""
            )
            .orderBy("term")
            .limit(cap)
            .collect()
        )
        return [r["term"] for r in rows]

    def fuzzy(
        self, field: str, token: str, prefix: str, max_edits: int, cap: int
    ) -> list[tuple[str, int]]:
        """Dictionary terms within Levenshtein distance [1, max_edits] of
        ``token`` sharing ``prefix``, in term order, capped at ``cap``.

        Fully distributed (reader.rs:1394-1465 bounded-DP equivalent):
        the prefix range scan, length prefilter, and thresholded
        ``levenshtein(…, threshold)`` all run in Spark; only the <= cap
        winners are collected — never the raw dictionary range (at web
        scale a 1-char prefix covers tens of millions of terms).
        """
        fplen = len(field) + 1
        rows = (
            self.terms_df.where(F.col("term").startswith(f"{field}:{prefix}"))
            .select("term", F.col("term").substr(fplen + 1, 1 << 20).alias("_cand"))
            .where(
                (F.length("_cand") > 0)
                & (F.col("_cand") != token)
                & (
                    F.abs(F.length("_cand") - F.lit(len(token)))
                    <= F.lit(max_edits)
                )
            )
            .withColumn(
                "_dist", F.levenshtein(F.lit(token), F.col("_cand"), max_edits)
            )
            .where((F.col("_dist") >= 1) & (F.col("_dist") <= max_edits))
            .select("term", "_dist")
            .orderBy("term")
            .limit(cap)
            .collect()
        )
        return [(r["term"], int(r["_dist"])) for r in rows]


class _GroupExpansion:
    """Accumulates one group's match keys + scoring terms."""

    def __init__(self, group, expander, fuzzy, out_qualified):
        self.g = group
        self.expander = expander
        self.fuzzy = fuzzy
        self.qualified = out_qualified
        self.keys: list[str] = []
        self.seen: set[str] = set()

    def _push_key(self, key: str):
        if key not in self.seen:
            self.seen.add(key)
            self.keys.append(key)

    def _push_scored(self, key: str, field: str, weight: float, leaf: int):
        self.qualified.append(QualifiedTerm(key, field, weight, leaf))

    def expand_one(self, field: str, token: str, mode: str, weight: float, leaf):
        score = self.g.score and leaf is not None
        if mode == "exact":
            key = f"{field}:{token}"
            if score:
                if self.fuzzy and min(int(self.fuzzy.get("max_edits", 1)), 2) > 0:
                    self._expand_fuzzy(field, token, weight, leaf, key)
                else:
                    self._push_scored(key, field, weight, leaf)
                    self._push_key(key)
            else:
                self._push_key(key)
            return
        cap = self.g.expansion[1]
        if self.expander is None:
            return
        if mode == "prefix":
            exp = self.expander.prefix(field, token, cap)
        elif mode == "wildcard":
            exp = self.expander.wildcard(field, token, cap)
        elif mode == "regex":
            exp = self.expander.regex(field, token, cap)
        else:  # pragma: no cover
            raise ValueError(mode)
        for key in exp:
            if score:
                self._push_scored(key, field, weight, leaf)
            self._push_key(key)

    def _expand_fuzzy(self, field, token, weight, leaf, exact_key):
        # reader.rs:1394-1465
        self._push_scored(exact_key, field, weight, leaf)
        self._push_key(exact_key)
        max_edits = min(int(self.fuzzy.get("max_edits", 1)), 2)
        min_length = int(self.fuzzy.get("min_length", 3))
        max_exp = int(self.fuzzy.get("max_expansions", 50))
        prefix_length = int(self.fuzzy.get("prefix_length", 1))
        if len(token) < min_length or max_exp == 0 or self.expander is None:
            return
        prefix = token[: min(prefix_length, len(token))]
        for key, dist in self.expander.fuzzy(
            field, token, prefix, max_edits, max_exp
        ):
            self._push_scored(key, field, weight / (dist + 1.0), leaf)
            self._push_key(key)


def expand_groups(
    builder: PlanBuilder,
    schema: IndexSchema,
    expander: DictionaryExpander | None,
    fuzzy: dict | None = None,
) -> tuple[list[TermGroupSpec], list[QualifiedTerm]]:
    qualified: list[QualifiedTerm] = []
    groups: list[TermGroupSpec] = []
    if isinstance(fuzzy, bool):  # `"fuzzy": true` == all-defaults
        fuzzy = {"max_edits": 1} if fuzzy else None
    for g in builder.raw_groups:
        ge = _GroupExpansion(g, expander, fuzzy, qualified)
        mode = g.expansion[0]
        for fs in g.fields:
            leaf = fs.leaf if fs.leaf is not None else g.leaf
            weight = g.boost * fs.boost
            try:
                kind = schema.field_kind(fs.field)
            except ValueError:
                continue
            if kind == "numeric":
                continue
            if kind == "text":
                analyzer = schema.search_analyzer_for(fs.field)
                if mode == "exact":
                    tokens = [t for t, _ in analyzer(g.term)]
                else:
                    toks = [t for t, _ in analyzer(g.term)]
                    if len(toks) == 1:
                        tokens = toks
                    else:
                        # patterns get split by analyzers; fall back to
                        # the raw pattern with light normalization
                        # (reader.rs:1101-1116)
                        tokens = [
                            g.term.lower() if analyzer.lowercases() else g.term
                        ]
                seen_tokens: set[str] = set()
                for tok in tokens:
                    if tok in seen_tokens:
                        continue
                    seen_tokens.add(tok)
                    ge.expand_one(fs.field, tok, mode, weight, leaf)
            else:  # keyword
                ge.expand_one(fs.field, normalize_keyword(g.term), mode, weight, leaf)
        groups.append(TermGroupSpec(g.group_id, ge.keys))
    return groups, qualified
