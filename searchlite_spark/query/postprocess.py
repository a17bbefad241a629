"""Post-retrieval operators: collapse, rescore, suggest, highlight.

These operate on the top-k window (small) or the term dictionary —
collapse is the exception and runs as a window function over the full
match set (reference reader.rs:3499-3595 groups the collected hits;
Spark's ``row_number() OVER (PARTITION BY field)`` is the distributed
equivalent).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, Window as W, functions as F, types as T

DEFAULT_SUGGEST_SCAN = 64
MAX_SUGGEST_CANDIDATES = 256


# ---- collapse ---------------------------------------------------------------


def collapse_hits(
    searcher,
    scored: DataFrame,
    field: str,
    sort_cols: list,
    inner_size: int = 0,
    inner_from: int = 0,
    group_order_exprs: list | None = None,
) -> tuple[DataFrame, DataFrame | None]:
    """Returns (representatives, inner_hits|None).

    Representative = best hit per group under the main sort; docs with
    NULL collapse value are dropped; multi-valued fields are rejected
    (reader.rs:3583-3590).

    ``group_order_exprs``: optional list of ASCENDING-orderable column
    expressions encoding a hit's position in the incoming stream.  When
    given, each representative carries ``_gpos`` = the group's MINIMUM
    position struct — the reference emits groups in order of their
    FIRST member (reader.rs collapse_hits `order` vec), which differs
    from representative-key order only when rescore's window block has
    reordered hits.  A per-group min is one hash aggregate — no global
    row_number, so no single-partition window at scale."""
    docs = searcher.docs
    if isinstance(docs.schema[field].dataType, T.ArrayType):
        multi = docs.where(F.size(F.col(field)) > 1).limit(1).count()
        if multi:
            raise ValueError(f"collapse field `{field}` must be single-valued")
        key_col = F.element_at(F.col(field), 1)
    else:
        key_col = F.col(field)
    joined = scored.join(
        docs.select("doc_id", key_col.alias("_ckey")), "doc_id"
    ).where(F.col("_ckey").isNotNull())
    w = W.partitionBy("_ckey").orderBy(*sort_cols)
    ranked = joined.withColumn("_crn", F.row_number().over(w))
    if group_order_exprs is not None:
        pos = F.struct(
            *[e.alias(f"_p{i}") for i, e in enumerate(group_order_exprs)]
        )
        ranked = ranked.withColumn(
            "_gpos", F.min(pos).over(W.partitionBy("_ckey"))
        )
    reps = ranked.where(F.col("_crn") == 1).drop("_crn")
    inner = None
    if inner_size > 0:
        inner = ranked.where(
            (F.col("_crn") > 1 + inner_from)
            & (F.col("_crn") <= 1 + inner_from + inner_size)
        ).drop("_crn")
    return reps, inner


# ---- rescore ----------------------------------------------------------------


def combine_rescore(mode: str, orig, rescore):
    if mode in ("total", "sum"):
        return orig + rescore
    if mode == "multiply":
        return orig * rescore
    if mode == "max":
        return F.greatest(orig, rescore)
    if mode == "min":
        return F.least(orig, rescore)
    raise ValueError(f"unknown rescore mode `{mode}`")


def rescore_hits(
    searcher, ordered_hits: DataFrame, rescore_req: dict, limit: int
) -> DataFrame:
    """Re-scores the top window_size hits with a second query
    (reader.rs:3238-3398): hits matching the rescore query get
    combined scores; non-matching keep their original score; hits the
    rescore scorer drops (min_score etc.) are removed; only the window
    re-sorts."""
    window = int(rescore_req["window_size"])
    mode = (rescore_req.get("score_mode") or "total").lower()
    # passenger columns (_sk_*, anything the caller stacked on) ride
    # through untouched — collapse runs AFTER rescore (reference order,
    # reader.rs:2786 then 2830) and needs them
    extra = [c for c in ordered_hits.columns if c not in ("doc_id", "score")]
    win = ordered_hits.limit(window)
    rest = ordered_hits.join(win.select("doc_id"), "doc_id", "left_anti")
    # keep_dropped: matched-but-dropped hits come back with NULL score
    # and must be REMOVED; absent docs didn't match and keep their
    # original score (reader.rs:3357-3361,3386-3393)
    rescored = searcher._matched_scored(
        {"query": rescore_req["query"]},
        doc_subset=win.select("doc_id"),
        keep_dropped=True,
    ).select("doc_id", F.col("score").alias("_rscore"), F.lit(True).alias("_rmatched"))
    combined = win.join(rescored, "doc_id", "left")
    combined = combined.where(
        F.col("_rmatched").isNull() | F.col("_rscore").isNotNull()
    ).select(
        "doc_id",
        F.when(
            F.col("_rscore").isNotNull(),
            combine_rescore(mode, F.col("score"), F.col("_rscore")),
        )
        .otherwise(F.col("score"))
        .alias("score"),
        *extra,
        F.lit(True).alias("_win"),
    )
    # only the window re-sorts; it stays ahead of the rest as a block
    # (reader.rs:3394-3397)
    return combined.unionByName(rest.withColumn("_win", F.lit(False)))


# ---- suggest ----------------------------------------------------------------


def suggest_completion(
    searcher, field: str, prefix: str, size: int = 5, fuzzy: dict | None = None
) -> list[dict]:
    """Completion suggester over the term dictionary
    (reader.rs:1785-1998): score = Σ df (fuzzy: Σ df/(dist+1)), sorted
    score desc then text asc."""
    terms = searcher.terms
    fplen = len(field) + 1
    if fuzzy is None:
        cap = max(min(size * 5, MAX_SUGGEST_CANDIDATES), DEFAULT_SUGGEST_SCAN)
        rows = (
            terms.where(
                F.col("term").startswith(f"{field}:{prefix}")
                & (F.length("term") > fplen)
                & (F.col("df") > 0)
            )
            .select(
                F.expr(f"substring(term, {fplen + 1})").alias("text"),
                F.col("df"),
            )
            .orderBy("text")
            .limit(cap)
            .collect()
        )
        cands = [
            {"text": r["text"], "doc_freq": int(r["df"]), "score": float(r["df"])}
            for r in rows
        ]
    else:
        term_len = len(prefix)
        max_edits = min(int(fuzzy.get("max_edits", 1)), 2)
        min_length = int(fuzzy.get("min_length", 3))
        max_exp = int(fuzzy.get("max_expansions", 50))
        if term_len < min_length or max_exp == 0 or max_edits == 0:
            return []
        pre = prefix[: min(int(fuzzy.get("prefix_length", 1)), term_len)]
        cap = max(min(max_exp, MAX_SUGGEST_CANDIDATES), size)
        # fully distributed (reader.rs:1951-1998 equivalent): length
        # prefilter + thresholded levenshtein run in Spark; only the
        # <= cap winners (in text order) are collected, never the raw
        # prefix range
        rows = (
            terms.where(
                F.col("term").startswith(f"{field}:{pre}")
                & (F.length("term") > fplen)
                & (F.col("df") > 0)
            )
            .select(F.expr(f"substring(term, {fplen + 1})").alias("text"), "df")
            .where(F.abs(F.length("text") - F.lit(term_len)) <= F.lit(max_edits))
            .withColumn(
                "_dist", F.levenshtein(F.lit(prefix), F.col("text"), max_edits)
            )
            .where(F.col("_dist") >= 0)
            .orderBy("text")
            .limit(cap)
            .collect()
        )
        cands = [
            {
                "text": r["text"],
                "doc_freq": int(r["df"]),
                "score": float(r["df"]) / (int(r["_dist"]) + 1.0),
            }
            for r in rows
        ]
    cands.sort(key=lambda c: (-c["score"], c["text"]))
    return cands[:size]


# ---- highlight --------------------------------------------------------------


def highlight_fragments(
    text: str,
    terms: list[str],
    phrases: list[list[str]],
    pre_tag: str = "<em>",
    post_tag: str = "</em>",
    fragment_size: int = 160,
    number_of_fragments: int = 3,
) -> list[str]:
    """Phrase-aware token-boundary highlighting
    (searchlite-core/src/index/highlight.rs:11-80)."""
    if not text or (not terms and not phrases):
        return []
    patterns = []
    for phrase in phrases:
        if phrase:
            patterns.append(r"\b" + r"\W+".join(re.escape(p) for p in phrase) + r"\b")
    for term in terms:
        if term:
            patterns.append(r"\b" + re.escape(term) + r"\b")
    if not patterns:
        return []
    rx = re.compile("|".join(patterns), re.IGNORECASE)
    out = []
    offset = 0
    for _ in range(number_of_fragments):
        m = rx.search(text, offset)
        if not m:
            break
        start = max(m.start() - fragment_size // 2, 0)
        end = min(len(text), start + fragment_size)
        fragment = text[start:end]
        out.append(rx.sub(lambda c: f"{pre_tag}{c.group(0)}{post_tag}", fragment))
        offset = m.end()
    return out


def make_snippet(text: str, terms: list[str], phrases: list[list[str]]) -> str | None:
    frags = highlight_fragments(
        text, terms, phrases, "**", "**", 120, 1
    )
    return frags[-1] if frags else None
