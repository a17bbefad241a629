"""Web-corpus cleanup signals: Gopher-style repetition stats, a
document-quality filter, and URL canonicalization + dedup.

The per-document counters (``repetition_stats``, ``gopher_quality``)
are Arrow-batched ``mapInPandas`` kernels — map-side only, no shuffle,
one pass per document.  They were first written as pure column
expressions with higher-order functions (transform/aggregate/filter),
which is the wrong hot path twice over: Spark evaluates HOF lambdas
interpreted (never whole-stage codegen), and a lambda that closes over
the tokenize *expression* re-evaluates it per array element — O(n²)
per row (measured: 20k docs took 430 s as an expression; the kernel
does 2.4M docs in seconds).  The URL ops stay native string
expressions (regexp_*, codegen) — they are genuinely cheap per row.

The exact formulas are the deterministic contract (each is checked
against a DuckDB SQL oracle); they follow the published Gopher /
MassiveText heuristics (Rae et al. 2021, appendix A) in spirit, with
ties and overlap-capping resolved explicitly where the paper is
ambiguous.
"""

from __future__ import annotations

import math
import re
from collections import Counter

from pyspark.sql import Column, DataFrame, functions as F

# Gopher's "must contain 2 of" stop list (public, Rae et al. 2021 A1.1).
GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")

# Query parameters that never change page identity (tracking only).
TRACKING_PARAMS = ("utm_", "fbclid", "gclid", "msclkid", "ref_src")

_WS = re.compile(r"\s+")


def _q4(num: float, den: float) -> float:
    """floor(num/den * 1e4)/1e4 in IEEE double — identical on the SQL
    oracle side, and floor (not round) so half-way cases can't split
    between engines."""
    if den <= 0:
        return 0.0
    return math.floor(num / den * 10000.0) / 10000.0


def _id_schema(df: DataFrame, id_col: str) -> str:
    return f"{id_col} {df.schema[id_col].dataType.simpleString()}"


def repetition_stats(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    top_ngram: int = 2,
    dup_ngram: int = 3,
    line_sep: str = "\n",
) -> DataFrame:
    """Per-document repetition signals (Gopher A1.1 family):

    - ``dup_line_frac``: occurrences of repeated lines / lines (a line
      is repeated if its trimmed form occurs more than once in the
      document; every occurrence counts).
    - ``dup_line_char_frac``: chars in repeated lines / chars in all
      lines.
    - ``top_ngram_char_frac``: chars covered by the most repeated word
      ``top_ngram``-gram (count x gram length, overlapping occurrences
      all counted) / total text chars, capped at 1.0.  Ties resolve by
      char mass, not by which gram — deterministic.
    - ``dup_ngram_char_frac``: chars in all occurrences of repeated
      ``dup_ngram``-grams / total chars, capped at 1.0 (overlapping
      grams double-count; the cap is the documented resolution).

    One Counter pass per document inside an Arrow batch — no shuffle,
    cost linear in document length.
    """
    schema = (
        f"{_id_schema(df, id_col)}, dup_line_frac double,"
        " dup_line_char_frac double, top_ngram_char_frac double,"
        " dup_ngram_char_frac double"
    )

    def kernel(batches):
        import pandas as pd

        for pdf in batches:
            ids = pdf[id_col]
            o1, o2, o3, o4 = [], [], [], []
            for text in pdf[text_col]:
                text = text or ""
                total = len(text)

                lines = [l for l in (s.strip() for s in text.split(line_sep)) if l]
                lc = Counter(lines)
                n_lines = len(lines)
                line_chars = sum(len(l) for l in lines)
                dupcnt = sum(c for c in lc.values() if c > 1)
                dupchars = sum(c * len(l) for l, c in lc.items() if c > 1)
                o1.append(_q4(dupcnt, n_lines))
                o2.append(_q4(dupchars, line_chars))

                toks = [t for t in _WS.split(text.strip()) if t]

                def grams(n):
                    if len(toks) < n:
                        return Counter()
                    return Counter(
                        " ".join(toks[i : i + n])
                        for i in range(len(toks) - n + 1)
                    )

                tg = grams(top_ngram)
                top = max((c * len(g) for g, c in tg.items()), default=0)
                o3.append(min(_q4(top, total), 1.0))
                dg = grams(dup_ngram)
                dup = sum(c * len(g) for g, c in dg.items() if c > 1)
                o4.append(min(_q4(dup, total), 1.0))
            yield pd.DataFrame(
                {
                    id_col: ids,
                    "dup_line_frac": o1,
                    "dup_line_char_frac": o2,
                    "top_ngram_char_frac": o3,
                    "dup_ngram_char_frac": o4,
                }
            )

    return df.select(id_col, text_col).mapInPandas(kernel, schema)


def gopher_quality(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_ratio: float = 0.1,
    max_bullet_frac: float = 0.9,
    max_ellipsis_frac: float = 0.3,
    min_alpha_frac: float = 0.8,
    min_stop_hits: int = 2,
    line_sep: str = "\n",
) -> DataFrame:
    """Gopher document-quality signals + the keep decision
    (Rae et al. 2021 A1.1, thresholds overridable).  Returns one row
    per document: the raw signals and ``keep`` so callers can audit
    why a document was dropped rather than just losing it.  ``keep``
    compares the UNQUANTIZED ratios against the thresholds; the
    reported signal columns are floor-quantized at 4dp.
    """
    schema = (
        f"{_id_schema(df, id_col)}, n_words int, mean_word_len double,"
        " alpha_frac double, symbol_ratio double, bullet_frac double,"
        " ellipsis_frac double, stop_hits int, keep boolean"
    )
    stop = GOPHER_STOPWORDS
    alpha = re.compile(r"[a-zA-Z]")

    def kernel(batches):
        import pandas as pd

        for pdf in batches:
            rows = []
            for doc_id, text in zip(pdf[id_col], pdf[text_col]):
                text = text or ""
                toks = [t for t in _WS.split(text.strip()) if t]
                nw = len(toks)
                wchars = sum(len(t) for t in toks)
                mean_wl = wchars / nw if nw else 0.0
                nalpha = sum(1 for t in toks if alpha.search(t))
                alpha_frac = nalpha / nw if nw else 0.0
                nsym = text.count("#") + text.count("...") + text.count("…")
                symbol_ratio = nsym / nw if nw else 0.0
                tokset = set(toks)
                stop_hits = sum(1 for s in stop if s in tokset)

                lines = [l for l in (s.strip() for s in text.split(line_sep)) if l]
                nl = len(lines)
                bullets = sum(1 for l in lines if l[0] in "-*•")
                ell = sum(
                    1 for l in lines if l.endswith("...") or l.endswith("…")
                )
                bullet_frac = bullets / nl if nl else 0.0
                ellipsis_frac = ell / nl if nl else 0.0

                keep = (
                    min_words <= nw <= max_words
                    and min_mean_word_len <= mean_wl <= max_mean_word_len
                    and symbol_ratio <= max_symbol_ratio
                    and bullet_frac <= max_bullet_frac
                    and ellipsis_frac <= max_ellipsis_frac
                    and alpha_frac >= min_alpha_frac
                    and stop_hits >= min_stop_hits
                )
                rows.append(
                    (
                        doc_id,
                        nw,
                        _q4(wchars, nw),
                        _q4(nalpha, nw),
                        _q4(nsym, nw),
                        _q4(bullets, nl),
                        _q4(ell, nl),
                        stop_hits,
                        keep,
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    id_col, "n_words", "mean_word_len", "alpha_frac",
                    "symbol_ratio", "bullet_frac", "ellipsis_frac",
                    "stop_hits", "keep",
                ],
            )

    return df.select(id_col, text_col).mapInPandas(kernel, schema)


def url_normalize(col: Column) -> Column:
    """Canonical URL: lowercase scheme+host, default port stripped,
    fragment dropped, tracking query params removed and the rest
    sorted, trailing slash trimmed from non-root paths.  Pure string
    expressions (codegen) — the canonical form IS the dedup key at
    10^12 rows, so it must be cheap and deterministic.
    """
    scheme = F.lower(F.regexp_extract(col, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    rest = F.regexp_replace(col, r"^[A-Za-z][A-Za-z0-9+.-]*://", "")
    rest = F.regexp_replace(rest, r"#.*$", "")  # fragment
    hostport = F.lower(F.regexp_extract(rest, r"^([^/?]*)", 1))
    # strip the port only when it is the scheme's default
    host = F.when(
        ((scheme == "http") & hostport.endswith(":80"))
        | ((scheme == "https") & hostport.endswith(":443")),
        F.regexp_replace(hostport, r":\d+$", ""),
    ).otherwise(hostport)
    path = F.regexp_extract(rest, r"^[^/?]*([^?]*)", 1)
    path = F.when(path == "", F.lit("/")).otherwise(
        F.when(
            (F.length(path) > 1) & path.endswith("/"),
            F.regexp_replace(path, r"/$", ""),
        ).otherwise(path)
    )
    query = F.regexp_extract(rest, r"\?(.*)$", 1)

    def _tracking(p: Column) -> Column:
        hit = F.lit(False)
        for prefix in TRACKING_PARAMS:
            hit = hit | p.startswith(prefix)
        return hit

    params = F.filter(F.split(query, "&"), lambda p: (p != "") & ~_tracking(p))
    qnorm = F.array_join(F.array_sort(params), "&")
    return F.concat(
        scheme,
        F.lit("://"),
        host,
        path,
        F.when(qnorm != "", F.concat(F.lit("?"), qnorm)).otherwise(F.lit("")),
    )


def url_dedup(
    df: DataFrame,
    url_col: str = "url",
    ts_col: str = "warc_ts",
    id_col: str | None = None,
) -> DataFrame:
    """One row per canonical URL — the freshest crawl wins (max
    ``ts_col``; ties break on the largest ``id_col`` when given, else
    the largest raw url string, so the winner is always unique).
    Single hash aggregation on the canonical url: max_by with a struct
    ordering key, map-side combinable, no window function and no sort
    of the full corpus.
    """
    norm = url_normalize(F.col(url_col)).alias("canonical_url")
    tie = F.col(id_col) if id_col else F.col(url_col)
    payload = F.struct(*[F.col(c) for c in df.columns])
    return (
        df.select(norm, F.struct(F.col(ts_col), tie.alias("_tie")).alias("_ord"),
                  payload.alias("_row"))
        .groupBy("canonical_url")
        .agg(F.max_by("_row", "_ord").alias("_row"))
        .select("canonical_url", "_row.*")
    )
