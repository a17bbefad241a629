"""HTML → text extraction as pure column expressions.

The ingest contract (BASELINE.json input_hint) is an Iceberg table of
Common-Crawl-style pages ``(url, warc_ts, html BINARY, text, lang)``
whose ``text`` is the *extracted* body, byte-identical per url on every
run — the per-row invariant the reference enforces.  This module is
the extraction step of that pipeline, Spark-first: decode + strip runs
entirely in the scan stage via codegen'd ``regexp_replace`` — no
shuffle, no Python, no UDF — so at 100 TB it fuses with the column
pruning of whatever consumes the text.

Determinism note: the transform is a pure function of the html bytes
(fixed regex set, fixed entity table, fixed whitespace collapse), so
re-running extraction always reproduces the same text —
``verify_extraction`` checks that distributed (xxhash64 compare; no
text reaches the driver), the same discipline as
``index.maintenance.verify_text_invariant``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# decode order matters: `&amp;` LAST, so "&amp;lt;" correctly yields
# the literal text "&lt;" instead of double-decoding to "<"
_ENTITIES = [
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&nbsp;", " "),
    ("&amp;", "&"),
]


def extract_text_col(html_col):
    """Column expression: html BINARY/STRING -> extracted text STRING.

    Pipeline (fixed, deterministic): utf-8 decode -> drop <script>/
    <style>/<!-- --> blocks -> strip all tags -> decode the core
    entities -> collapse whitespace runs to single spaces -> trim."""
    s = F.col(html_col).cast("string") if isinstance(html_col, str) else html_col.cast("string")
    # backreference: a <script> block must close with </script> (a
    # "</style>" inside a script string must not terminate it)
    s = F.regexp_replace(s, r"(?is)<(script|style)[^>]*>.*?</\1>", " ")
    s = F.regexp_replace(s, r"(?s)<!--.*?-->", " ")
    s = F.regexp_replace(s, r"(?s)<[^>]*>", " ")
    for ent, ch in _ENTITIES:
        s = F.regexp_replace(s, ent, ch)
    return F.trim(F.regexp_replace(s, r"\s+", " "))


def extract_text(
    df: DataFrame, html_col: str = "html", out_col: str = "text"
) -> DataFrame:
    """Add/replace ``out_col`` with the extracted text of ``html_col``."""
    return df.withColumn(out_col, extract_text_col(html_col))


def verify_extraction(
    df: DataFrame,
    html_col: str = "html",
    text_col: str = "text",
    key_col: str = "url",
) -> dict:
    """Per-row invariant check: re-extracting ``html_col`` reproduces
    ``text_col`` byte-for-byte.  One distributed pass comparing
    xxhash64 of both sides; raises on any mismatch, returns
    {"checked", "mismatched"}."""
    ext = extract_text_col(html_col)
    row = df.agg(
        F.count("*").alias("total"),
        F.sum(
            (F.xxhash64(ext) != F.xxhash64(F.col(text_col))).cast("long")
        ).alias("mismatched"),
    ).first()
    out = {"checked": int(row["total"]), "mismatched": int(row["mismatched"] or 0)}
    if out["mismatched"]:
        bad = (
            df.where(F.xxhash64(ext) != F.xxhash64(F.col(text_col)))
            .select(key_col)
            .limit(5)
            .collect()
        )
        raise ValueError(
            f"extraction invariant violated for {out['mismatched']} rows "
            f"(e.g. {[r[key_col] for r in bad]})"
        )
    return out
