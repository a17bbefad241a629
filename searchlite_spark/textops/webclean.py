"""Web-corpus cleanup signals: Gopher-style repetition stats, a
document-quality filter, and URL canonicalization + dedup.

Everything except ``url_dedup``'s final aggregation is a pure column
expression — no shuffle, no UDF, codegen end-to-end — so the signals
run at ingest bandwidth on 100 TB.  The repetition counters use a
sort-then-scan trick (``array_sort`` + ``aggregate`` with a struct
accumulator) instead of explode+groupBy, keeping per-row cost linear
in document length and avoiding a (doc, ngram) shuffle entirely.

The exact formulas are the deterministic contract (each is checked
against a DuckDB SQL oracle); they follow the published Gopher /
MassiveText heuristics (Rae et al. 2021, appendix A) in spirit, with
ties and overlap-capping resolved explicitly where the paper is
ambiguous.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# Gopher's "must contain 2 of" stop list (public, Rae et al. 2021 A1.1).
GOPHER_STOPWORDS = ["the", "be", "to", "of", "and", "that", "have", "with"]

# Query parameters that never change page identity (tracking only).
TRACKING_PARAMS = ("utm_", "fbclid", "gclid", "msclkid", "ref_src")


def _words(col: Column) -> Column:
    return F.filter(F.split(F.trim(col), r"\s+"), lambda t: t != "")


def _ngrams(words: Column, n: int) -> Column:
    """Overlapping word n-grams as space-joined strings (empty array
    when the document has fewer than ``n`` words)."""
    return F.when(
        F.size(words) >= n,
        F.transform(
            F.sequence(F.lit(0), F.size(words) - n),
            lambda i: F.concat_ws(" ", F.slice(words, i + 1, n)),
        ),
    ).otherwise(F.array().cast("array<string>"))


def _run_stats(sorted_arr: Column) -> Column:
    """Linear scan over a sorted array: returns a struct with
    ``top`` = max over distinct values of count*length (the
    char-mass of the most repeated value, deterministic under ties)
    and ``dup`` = total chars in values that occur more than once
    (every occurrence counted).  `length+1` counts the joining
    space/newline a repeated value drags along; the +1 cancels in
    fractions of the same construction on the oracle side.
    """
    zero = F.struct(
        F.lit("").alias("prev"),
        F.lit(0).cast("long").alias("run"),
        F.lit(0).cast("long").alias("top"),
        F.lit(0).cast("long").alias("dup"),
        F.lit(0).cast("long").alias("dupcnt"),
    )

    def step(acc, x):
        is_new = acc["prev"] != x
        run = F.when(is_new, F.lit(1).cast("long")).otherwise(acc["run"] + 1)
        mass = run * (F.length(x).cast("long"))
        top = F.greatest(acc["top"], mass)
        # add this occurrence's chars to dup once the run hits 2; the
        # 2nd element must retroactively add the 1st's chars too
        dup = F.when(run == 2, acc["dup"] + 2 * F.length(x)).otherwise(
            F.when(run > 2, acc["dup"] + F.length(x)).otherwise(acc["dup"])
        )
        dupcnt = F.when(run == 2, acc["dupcnt"] + 2).otherwise(
            F.when(run > 2, acc["dupcnt"] + 1).otherwise(acc["dupcnt"])
        )
        return F.struct(
            x.alias("prev"),
            run.alias("run"),
            top.alias("top"),
            dup.alias("dup"),
            dupcnt.alias("dupcnt"),
        )

    return F.aggregate(sorted_arr, zero, step)


def repetition_stats(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    top_ngram: int = 2,
    dup_ngram: int = 3,
    line_sep: str = "\n",
) -> DataFrame:
    """Per-document repetition signals (Gopher A1.1 family):

    - ``dup_line_frac``: duplicate lines / lines (a line is duplicate
      if its trimmed form occurs more than once in the document; every
      occurrence of a repeated line counts).
    - ``dup_line_char_frac``: chars in duplicate lines / chars in all
      lines.
    - ``top_ngram_char_frac``: chars covered by the most repeated
      word ``top_ngram``-gram (count x gram length, overlapping
      occurrences all counted) / total text chars, capped at 1.0.
      Ties resolve by char mass, not by which gram — deterministic.
    - ``dup_ngram_char_frac``: chars in all occurrences of repeated
      ``dup_ngram``-grams / total chars, capped at 1.0 (overlapping
      grams double-count; the cap is the documented resolution).

    All four are computed without a shuffle: sort the per-row array,
    scan it once with a struct accumulator.
    """
    text = F.col(text_col)
    words = _words(text)
    total_chars = F.length(text).cast("long")

    lines = F.filter(
        F.transform(F.split(text, line_sep), lambda l: F.trim(l)),
        lambda l: l != "",
    )
    n_lines = F.size(lines)
    line_chars = F.aggregate(
        F.transform(lines, lambda l: F.length(l).cast("long")),
        F.lit(0).cast("long"),
        lambda a, x: a + x,
    )
    lstats = _run_stats(F.array_sort(lines))

    tstats = _run_stats(F.array_sort(_ngrams(words, top_ngram)))
    dstats = _run_stats(F.array_sort(_ngrams(words, dup_ngram)))

    def frac(num, den):
        return F.when(den > 0, F.floor(num.cast("double") / den * 10000.0) / 10000.0
                      ).otherwise(F.lit(0.0))

    return df.select(
        F.col(id_col),
        frac(lstats["dupcnt"], n_lines.cast("long")).alias("dup_line_frac"),
        frac(lstats["dup"], line_chars).alias("dup_line_char_frac"),
        F.least(frac(tstats["top"], total_chars), F.lit(1.0)).alias(
            "top_ngram_char_frac"
        ),
        F.least(frac(dstats["dup"], total_chars), F.lit(1.0)).alias(
            "dup_ngram_char_frac"
        ),
    )


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
    why a document was dropped rather than just losing it.
    """
    text = F.col(text_col)
    words = _words(text)
    n_words = F.size(words)
    word_chars = F.aggregate(
        F.transform(words, lambda w: F.length(w).cast("long")),
        F.lit(0).cast("long"),
        lambda a, x: a + x,
    )
    mean_wl = F.when(n_words > 0, word_chars.cast("double") / n_words).otherwise(
        F.lit(0.0)
    )
    n_alpha = F.size(F.filter(words, lambda w: w.rlike("[a-zA-Z]")))
    alpha_frac = F.when(n_words > 0, n_alpha.cast("double") / n_words).otherwise(
        F.lit(0.0)
    )
    n_hash = F.length(text) - F.length(F.replace(text, F.lit("#"), F.lit("")))
    n_ellipsis = F.floor(
        (F.length(text) - F.length(F.replace(text, F.lit("..."), F.lit("")))) / 3
    ) + (F.length(text) - F.length(F.replace(text, F.lit("…"), F.lit(""))))
    symbol_ratio = F.when(
        n_words > 0, (n_hash + n_ellipsis).cast("double") / n_words
    ).otherwise(F.lit(0.0))

    lines = F.filter(
        F.transform(F.split(text, line_sep), lambda l: F.trim(l)),
        lambda l: l != "",
    )
    n_lines = F.size(lines)
    bullet = F.size(
        F.filter(
            lines,
            lambda l: l.startswith("-") | l.startswith("*") | l.startswith("•"),
        )
    )
    ell_end = F.size(
        F.filter(lines, lambda l: l.endswith("...") | l.endswith("…"))
    )
    bullet_frac = F.when(n_lines > 0, bullet.cast("double") / n_lines).otherwise(
        F.lit(0.0)
    )
    ellipsis_frac = F.when(n_lines > 0, ell_end.cast("double") / n_lines).otherwise(
        F.lit(0.0)
    )
    stop_hits = F.size(
        F.filter(
            F.array(*[F.lit(s) for s in GOPHER_STOPWORDS]),
            lambda s: F.array_contains(words, s),
        )
    )
    keep = (
        (n_words >= min_words)
        & (n_words <= max_words)
        & (mean_wl >= min_mean_word_len)
        & (mean_wl <= max_mean_word_len)
        & (symbol_ratio <= max_symbol_ratio)
        & (bullet_frac <= max_bullet_frac)
        & (ellipsis_frac <= max_ellipsis_frac)
        & (alpha_frac >= min_alpha_frac)
        & (stop_hits >= min_stop_hits)
    )

    def q4(c):
        return F.floor(c * 10000.0) / 10000.0

    return df.select(
        F.col(id_col),
        n_words.alias("n_words"),
        q4(mean_wl).alias("mean_word_len"),
        q4(alpha_frac).alias("alpha_frac"),
        q4(symbol_ratio).alias("symbol_ratio"),
        q4(bullet_frac).alias("bullet_frac"),
        q4(ellipsis_frac).alias("ellipsis_frac"),
        stop_hits.alias("stop_hits"),
        keep.alias("keep"),
    )


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
