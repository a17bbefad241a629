"""Text-analysis operators: token stats, quality scoring, language ID,
document fingerprinting.  All pure column expressions (codegen'd,
shuffle-free) so they run at ingest bandwidth on 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# Small high-frequency function-word profiles per language (public
# knowledge).  Keep lists short and fixed — they are part of the
# deterministic contract.
LANG_PROFILES = {
    "en": ["the", "of", "and", "to", "in", "is", "that", "it", "was", "for"],
    "de": ["der", "die", "und", "das", "ist", "nicht", "ein", "mit", "von", "zu"],
    "fr": ["le", "la", "et", "les", "des", "est", "un", "une", "du", "que"],
    "es": ["el", "la", "que", "de", "los", "es", "un", "una", "por", "con"],
}

STOPWORD_SAMPLE = LANG_PROFILES["en"]


def _tokens(col):
    return F.filter(F.split(F.trim(col), r"\s+"), lambda t: t != "")


def token_stats(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(id, n_tokens, n_distinct, mean_token_len) — whitespace + a
    BPE-ish sub-token count (runs of <=4 chars) as n_subtokens."""
    toks = _tokens(F.col(text_col))
    n_tokens = F.size(toks)
    n_distinct = F.size(F.array_distinct(toks))
    total_chars = F.aggregate(
        F.transform(toks, lambda t: F.length(t)), F.lit(0), lambda a, x: a + x
    )
    mean_len = F.when(n_tokens > 0, total_chars.cast("double") / n_tokens).otherwise(
        F.lit(0.0)
    )
    # BPE-ish proxy: ceil(len/4) pieces per token
    n_sub = F.aggregate(
        F.transform(toks, lambda t: F.ceil(F.length(t) / 4.0).cast("int")),
        F.lit(0),
        lambda a, x: a + x,
    )
    return df.select(
        F.col(id_col),
        n_tokens.alias("n_tokens"),
        n_distinct.alias("n_distinct"),
        F.round(mean_len, 4).alias("mean_token_len"),
        n_sub.alias("n_subtokens"),
    )


def quality_score(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(id, quality DOUBLE in [0,1]) — deterministic heuristic:
    0.4 * type-token ratio + 0.3 * length saturation (n/100 capped)
    + 0.3 * (1 - stopword excess).  The exact formula is the contract
    (tested against a SQL oracle), not a claim of linguistic truth."""
    toks = _tokens(F.col(text_col))
    n = F.size(toks)
    ttr = F.when(n > 0, F.size(F.array_distinct(toks)).cast("double") / n).otherwise(
        F.lit(0.0)
    )
    sat = F.least(n.cast("double") / F.lit(100.0), F.lit(1.0))
    sw = F.size(
        F.filter(toks, lambda t: t.isin(STOPWORD_SAMPLE))
    )
    sw_ratio = F.when(n > 0, sw.cast("double") / n).otherwise(F.lit(0.0))
    q = 0.4 * ttr + 0.3 * sat + 0.3 * (1.0 - F.least(sw_ratio * 2.0, F.lit(1.0)))
    # floor-quantize instead of round: engines disagree on half-rounding
    # (HALF_UP vs HALF_EVEN) and ratio-of-small-ints scores hit halves
    q4 = F.floor(q * 10000.0) / 10000.0
    return df.select(F.col(id_col), q4.alias("quality"))


def langid(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(id, pred_lang) — argmax of function-word profile hits; ties
    break by profile order en > de > fr > es.  A real n-gram model
    would drop in here; the operator contract (deterministic argmax
    over per-language token-hit counts) is what matters for the
    pipeline."""
    toks = _tokens(F.col(text_col))
    scores = []
    for lang, words in LANG_PROFILES.items():
        hits = F.size(F.filter(toks, lambda t: t.isin(words)))
        scores.append((lang, hits))
    best = F.lit("en")
    best_score = F.lit(-1)
    for lang, s in reversed(scores):  # reversed so earlier profiles win ties
        cond = s >= best_score
        best = F.when(cond, F.lit(lang)).otherwise(best)
        best_score = F.when(cond, s).otherwise(best_score)
    return df.select(F.col(id_col), best.alias("pred_lang"))


def collocations_pmi(
    df: DataFrame,
    text_col: str = "text",
    min_count: int = 5,
    top_k: int = 20,
) -> DataFrame:
    """(w1, w2, c12, pmi_r) — top-k adjacent-bigram collocations by
    pointwise mutual information (phrase mining for corpus analysis):

        pmi = ln( (c12 / Nb) / ((c1 / Nt) * (c2 / Nt)) )

    over whitespace tokens, where c1/c2/c12 are unigram/bigram counts,
    Nt total tokens, Nb total bigrams.  Bigrams with c12 < min_count
    are noise-filtered (PMI is unstable at low counts).  Ranked by
    pmi rounded to 4 decimals (ties broken by bigram text, so the
    ordering is deterministic and engine-portable).

    100-TB shape: the text column never shuffles — per-doc token
    arrays explode map-side into two hash aggregates (both map-side
    partial, so head-token skew collapses before the exchange), then
    the min_count-filtered bigram table joins the unigram dictionary
    twice (AQE picks broadcast when the vocabulary is small) and the
    two scalar totals ride in as broadcast single-row joins — no
    driver collect anywhere."""
    toks = _tokens(F.col(text_col))
    tdf = df.select(toks.alias("toks"))
    # uni feeds THREE consumers (u1, u2, Nt) and big_all TWO (Nb, the
    # filtered bigram table); without a lineage cut Catalyst would
    # re-tokenize the whole corpus once per consumer — five full scans
    # instead of two.  localCheckpoint materializes each count table
    # once (vocabulary-sized, not corpus-sized) and the blocks die
    # with the returned plan.
    uni = (
        tdf.select(F.explode("toks").alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("c"))
        .localCheckpoint()
    )
    bigrams = tdf.select(
        F.explode(
            F.expr(
                "transform(slice(toks, 1, greatest(size(toks) - 1, 0)),"
                " (t, i) -> struct(t AS w1, toks[i + 1] AS w2))"
            )
        ).alias("bg")
    ).select("bg.w1", "bg.w2")
    big_all = (
        bigrams.groupBy("w1", "w2")
        .agg(F.count("*").alias("c12"))
        .localCheckpoint()
    )
    nt = uni.agg(F.sum("c").cast("double").alias("nt"))
    nb = big_all.agg(F.sum("c12").cast("double").alias("nb"))
    u1 = uni.select(F.col("w").alias("w1"), F.col("c").alias("c1"))
    u2 = uni.select(F.col("w").alias("w2"), F.col("c").alias("c2"))
    pmi = F.log(
        (F.col("c12") / F.col("nb"))
        / ((F.col("c1") / F.col("nt")) * (F.col("c2") / F.col("nt")))
    )
    return (
        big_all.where(F.col("c12") >= min_count)
        .join(u1, "w1")
        .join(u2, "w2")
        .crossJoin(F.broadcast(nt))
        .crossJoin(F.broadcast(nb))
        .select(
            "w1", "w2", "c12", F.round(pmi, 4).alias("pmi_r")
        )
        .orderBy(F.desc("pmi_r"), "w1", "w2")
        .limit(top_k)
    )


def unigram_cross_entropy(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, n_tokens, ce_r) — per-document cross-entropy under the
    corpus's own unigram distribution (the CCNet-style perplexity
    quality signal: documents far from the corpus distribution score
    high and are filter candidates):

        ce = -(1/n) * sum_i ln( c(w_i) / Nt )

    where c(w) is the corpus unigram count and Nt total tokens.  No
    smoothing is needed — every scored token is in the corpus by
    construction (score-other-corpus variants would add it at the
    join).  ce is rounded to 4 decimals (engine-portable).

    100-TB shape: the unigram table is built with one map-side-partial
    aggregate and localCheckpoint'ed (it feeds both the Nt total and
    the scoring join); scoring is explode -> hash join against the
    vocabulary-sized table -> per-doc re-aggregate.  The text column
    never shuffles; docs with zero tokens are kept with NULL ce (they
    are exactly the docs a perplexity filter must flag, not drop)."""
    toks = _tokens(F.col(text_col))
    tokens = df.select(F.col(id_col), F.explode(toks).alias("w"))
    uni = (
        tokens.groupBy("w").agg(F.count("*").alias("c")).localCheckpoint()
    )
    nt = uni.agg(F.sum("c").cast("double").alias("nt"))
    scored = (
        tokens.join(uni, "w")
        .crossJoin(F.broadcast(nt))
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_tokens"),
            (-F.avg(F.log(F.col("c") / F.col("nt")))).alias("ce"),
        )
    )
    empties = (
        df.select(F.col(id_col))
        .where(F.size(toks) == 0)
        .select(
            F.col(id_col),
            F.lit(0).cast("long").alias("n_tokens"),
            F.lit(None).cast("double").alias("ce"),
        )
    )
    return scored.unionByName(empties).select(
        id_col, "n_tokens", F.round("ce", 4).alias("ce_r")
    )


def bigram_cross_entropy(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    interp: float = 0.7,
) -> DataFrame:
    """(id, n_tokens, ce_r) — per-document cross-entropy under a
    Jelinek-Mercer interpolated bigram model of the corpus itself (one
    step up the n-gram ladder from ``unigram_cross_entropy``; CCNet
    uses a 5-gram KenLM — the interpolation is what keeps unseen
    bigrams finite):

        p(w_i | w_{i-1}) = interp * c(w_{i-1} w_i)/c(w_{i-1})
                         + (1 - interp) * c(w_i)/Nt
        ce = -(1/n) * [ ln(c(w_1)/Nt) + sum_{i>1} ln p(w_i|w_{i-1}) ]

    (the first token is scored by the unigram model).  ``interp`` must
    be in [0, 1): at 1.0 an unseen cross-doc bigram would hit ln(0).

    100-TB shape mirrors unigram_cross_entropy: unigram + bigram count
    tables built map-side-partial and localCheckpoint'ed; scoring is
    one explode of (prev, cur) pairs derived from the token array (no
    lag window — NO shuffle of the token stream) joined against the
    two dictionaries, then a per-doc re-aggregate.  Zero-token docs
    keep NULL ce."""
    lam = float(interp)
    if not (0.0 <= lam < 1.0):
        raise ValueError("interp must be in [0, 1)")
    toks = _tokens(F.col(text_col))

    def build(tcol):
        n = F.size(tcol)
        return F.when(n <= 0, F.array()).otherwise(
            F.transform(
                F.sequence(F.lit(0), n - 1),
                lambda i: F.struct(
                    F.when(
                        i > 0, F.element_at(tcol, i.cast("int"))
                    ).alias("prev"),
                    F.element_at(tcol, (i + 1).cast("int")).alias("cur"),
                ),
            )
        )

    from searchlite_spark.textops.dedup import bind_once

    pairs = df.select(
        F.col(id_col), F.explode(bind_once(toks, build)).alias("_p")
    ).select(
        F.col(id_col),
        F.col("_p.prev").alias("prev"),
        F.col("_p.cur").alias("cur"),
    )
    uni = (
        pairs.groupBy(F.col("cur").alias("w"))
        .agg(F.count("*").alias("c"))
        .localCheckpoint()
    )
    big = (
        pairs.where(F.col("prev").isNotNull())
        .groupBy("prev", "cur")
        .agg(F.count("*").alias("c12"))
        .localCheckpoint()
    )
    nt = uni.agg(F.sum("c").cast("double").alias("nt"))
    u_cur = uni.select(F.col("w").alias("cur"), F.col("c").alias("c2"))
    u_prev = uni.select(F.col("w").alias("prev"), F.col("c").alias("c1"))
    j = (
        pairs.join(u_cur, "cur")
        .join(u_prev, "prev", "left")
        .join(big, ["prev", "cur"], "left")
        .crossJoin(F.broadcast(nt))
    )
    p_uni = F.col("c2") / F.col("nt")
    p_int = (
        F.lit(lam) * (F.coalesce(F.col("c12"), F.lit(0)) / F.col("c1"))
        + F.lit(1.0 - lam) * p_uni
    )
    logp = F.when(F.col("prev").isNull(), F.log(p_uni)).otherwise(
        F.log(p_int)
    )
    scored = j.groupBy(id_col).agg(
        F.count("*").alias("n_tokens"),
        (-F.avg(logp)).alias("ce"),
    )
    empties = (
        df.select(F.col(id_col))
        .where(F.size(toks) == 0)
        .select(
            F.col(id_col),
            F.lit(0).cast("long").alias("n_tokens"),
            F.lit(None).cast("double").alias("ce"),
        )
    )
    return scored.unionByName(empties).select(
        id_col, "n_tokens", F.round("ce", 4).alias("ce_r")
    )


def doc_fingerprint(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(id, fingerprint LONG) — rolling polynomial hash over tokens:
    acc = (acc * 131 + tval) mod (2^31 - 1), where tval =
    31 * len(token) + ascii(first char).  Order-sensitive (a true
    rolling hash), overflow-free in 64-bit, and expressible identically
    in any SQL engine (the oracle contract)."""
    toks = _tokens(F.col(text_col))
    mod = F.lit(2147483647)
    fp = F.aggregate(
        toks,
        F.lit(0).cast("long"),
        lambda acc, t: (
            acc * 131 + (F.length(t) * 31 + F.ascii(F.substring(t, 1, 1))).cast("long")
        )
        % mod,
    )
    return df.select(F.col(id_col), fp.alias("fingerprint"))
