"""Corpus composition ops for training-data preparation: domain-mixture
sampling and per-domain token budgets.

A pretraining corpus is rarely used as-found: sources are re-weighted
toward a target mixture (e.g. more encyclopedic text, less raw crawl)
and capped at a token budget per source.  Both ops here are exactly
reproducible — the sampling draw is the engine's deterministic
md5-uniform (query/aggs.py ``sample_uniform``, the same function the
oracled ``sampler`` aggregation uses), and the token cap is a prefix
sum in document order — so any SQL engine can replay the exact subset,
and re-running on a different cluster/partitioning yields the same
corpus.

Scale notes: ``sample_by_fractions`` is a pure map-side filter (no
shuffle at all).  ``sample_tokens`` needs one ordered prefix sum PER
STRATUM; like ``transform.pack_sequences`` it refuses the
single-partition ``Window.orderBy`` trap and uses the two-phase
pattern — range-partition by (stratum, id), collect per-(partition,
stratum) totals (≤ partitions + strata rows), then a zero-exchange
Arrow kernel adds per-stratum offsets to partition-local grouped
cumsums.  A stratum spanning many partitions parallelizes; a hot
stratum never funnels through one task.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F, types as T

from searchlite_spark.query.aggs import sample_uniform


def mixture_fractions(observed: dict, target: dict) -> dict:
    """Per-stratum keep fractions that reshape ``observed`` counts into
    the ``target`` mixture, taking the LARGEST corpus achievable
    without upsampling: the binding stratum (smallest observed/target
    ratio) keeps fraction 1.0 and every other stratum downsamples to
    match.  Strata absent from ``target`` get fraction 0.0 (dropped).
    Upsampling (fractions > 1) is out of scope by construction —
    ``sample_by_fractions`` is a filter and cannot repeat rows.

    Pure driver-side arithmetic over a tiny {stratum: count} dict —
    counts come from one ``groupBy(stratum).count()`` over the corpus.
    """
    tw = {k: float(v) for k, v in target.items() if float(v) > 0}
    if not tw:
        raise ValueError("target mixture must have at least one positive weight")
    missing = sorted(k for k in tw if not observed.get(k))
    if missing:
        raise ValueError(f"target strata with no observed documents: {missing}")
    total_w = sum(tw.values())
    # T = output size; bounded by the stratum that runs out first —
    # that stratum's fraction is exactly 1.0, so no fraction exceeds 1
    t_max = min(observed[k] / (w / total_w) for k, w in tw.items())
    return {k: min((w / total_w) * t_max / observed[k], 1.0)
            for k, w in tw.items()}


def sample_by_fractions(
    df: DataFrame,
    strata_col: str,
    fractions: dict,
    id_col: str = "doc_id",
    seed: int = 0,
) -> DataFrame:
    """Deterministic stratified sampling: a row of stratum ``s`` is
    kept iff ``u(seed, id) < fractions[s]`` with the md5-uniform draw
    (query/aggs.py sample_uniform — SQL-replayable, partition- and
    cluster-size-independent, unlike ``DataFrame.sampleBy``'s RNG).
    Strata absent from ``fractions`` are dropped.  Map-side only —
    composes with ``mixture_fractions`` for exact domain re-weighting:

        counts = {r[0]: r[1] for r in
                  df.groupBy("source").count().collect()}
        mixed = sample_by_fractions(
            df, "source", mixture_fractions(counts, {"wiki": 2, "web": 1}))
    """
    if not fractions:
        raise ValueError("fractions must name at least one stratum")
    for k, v in fractions.items():
        if not (0.0 <= float(v) <= 1.0):
            raise ValueError(f"fraction for stratum {k!r} must be in [0, 1]")
    # a literal-map lookup, not a chained CASE WHEN: thousands of
    # strata (per-domain mixtures) would otherwise build an expression
    # tree thousands of levels deep and blow up codegen
    frac_col = F.coalesce(
        _literal_map(fractions, strata_col, float), F.lit(0.0)
    )
    return df.where(sample_uniform(id_col=id_col, seed=seed) < frac_col)


def _literal_map(mapping: dict, key_col: str, cast):
    """map<literal...>[col] lookup column; NULL for absent keys."""
    pairs = []
    for k, v in mapping.items():
        pairs.append(F.lit(k))
        pairs.append(F.lit(cast(v)))
    return F.create_map(*pairs)[F.col(key_col)]


def sample_tokens(
    df: DataFrame,
    token_budget,
    strata_col: str = "source",
    text_col: str = "text",
    id_col: str = "doc_id",
    n_tokens_col: str | None = None,
    num_partitions: int | None = None,
) -> DataFrame:
    """Per-stratum token budget: take documents in ``id_col`` order
    within each stratum until the budget is reached.  A document is
    kept iff the stratum's token count BEFORE it is below the budget,
    so the crossing document is included (the budget is a floor: you
    get at least ``token_budget`` tokens per stratum when the stratum
    has them, overshooting by at most one document).

    ``token_budget`` is an int (same budget for every stratum) or a
    {stratum: budget} dict — dict strata only, others dropped.

    Returns ``(<id_col>, <strata_col>, n_tokens, tokens_before)`` for
    the kept documents.  Rows with a NULL stratum are dropped.  Token counts follow ``n_tokens_col`` when
    given, else whitespace tokenization (chunk_documents/pack_sequences
    compatible).  Deterministic and partition-independent: the subset
    depends only on (stratum, id) order.
    """
    if isinstance(token_budget, dict):
        budgets = {k: int(v) for k, v in token_budget.items()}
        if any(v <= 0 for v in budgets.values()):
            raise ValueError("every token budget must be positive")
    else:
        budgets = None
        if int(token_budget) <= 0:
            raise ValueError("token_budget must be positive")
    if num_partitions is None:
        num_partitions = int(
            df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32")
        )
    if n_tokens_col is not None:
        n = F.col(n_tokens_col).cast("long")
    else:
        n = F.size(
            F.filter(F.split(F.trim(F.col(text_col)), r"\s+"), lambda t: t != "")
        ).cast("long")
    slim = df.select(
        F.col(strata_col).cast("string").alias("_stratum"),
        F.col(id_col),
        n.alias("n_tokens"),
    ).where(
        # NULL strata are dropped, not crashed on: they have no budget
        # entry and would poison both the driver-side offset sort and
        # the kernel's pandas groupby
        F.col("n_tokens") > 0
    ).where(F.col("_stratum").isNotNull())
    if budgets is not None:
        slim = slim.where(F.col("_stratum").isin(*budgets.keys()))
    slim = (
        slim.repartitionByRange(num_partitions, "_stratum", id_col)
        .sortWithinPartitions("_stratum", id_col)
    )
    # localCheckpoint (not persist): the offsets job and the kernel job
    # must read the SAME materialized partitions, and the blocks must
    # die with the plan — a CacheManager persist survives until an
    # explicit unpersist the caller can't issue (the handle is
    # function-local), leaking executor storage per call in long-lived
    # sessions.  Locally-checkpointed blocks are GC-cleaned when the
    # returned plan is dropped.
    slim = slim.localCheckpoint(eager=True)
    totals = (
        slim.select(F.spark_partition_id().alias("pid"), "_stratum", "n_tokens")
        .groupBy("pid", "_stratum")
        .agg(F.sum("n_tokens").alias("total"))
        .collect()
    )
    # per-stratum running offsets in partition order (range partitions
    # are ordered by key, so pid order IS (stratum, id) order)
    offsets: dict[int, dict[str, int]] = {}
    acc: dict[str, int] = {}
    for r in sorted(totals, key=lambda r: (r["_stratum"], int(r["pid"]))):
        offsets.setdefault(int(r["pid"]), {})[r["_stratum"]] = acc.get(
            r["_stratum"], 0
        )
        acc[r["_stratum"]] = acc.get(r["_stratum"], 0) + int(r["total"])

    out_type = T.StructType(
        [
            T.StructField("_stratum", T.StringType(), False),
            slim.schema[id_col],
            T.StructField("n_tokens", T.LongType(), False),
            T.StructField("tokens_before", T.LongType(), False),
        ]
    )

    def grouped_running_sum(iterator):
        from pyspark import TaskContext

        running = dict(offsets.get(TaskContext.get().partitionId(), {}))
        for pdf in iterator:
            counts = pdf["n_tokens"].to_numpy()
            # exclusive prefix sum within each stratum, in row order
            local = pdf.groupby("_stratum", sort=False)["n_tokens"].cumsum() - counts
            base = pdf["_stratum"].map(lambda s: running.get(s, 0)).to_numpy()
            pdf = pdf.assign(tokens_before=local.to_numpy() + base)
            for s, tot in pdf.groupby("_stratum", sort=False)["n_tokens"].sum().items():
                running[s] = running.get(s, 0) + int(tot)
            yield pdf

    spans = slim.mapInPandas(grouped_running_sum, out_type)
    if budgets is not None:
        # literal-map lookup for the same codegen-depth reason as
        # sample_by_fractions; rows were already filtered to budget
        # strata so the lookup never misses
        keep = F.col("tokens_before") < _literal_map(budgets, "_stratum", int)
    else:
        keep = F.col("tokens_before") < F.lit(int(token_budget))
    return spans.where(keep).select(
        F.col(id_col),
        F.col("_stratum").alias(strata_col),
        "n_tokens",
        "tokens_before",
    )


# ---------------------------------------------------------------------------
# DSIR — Data Selection with Importance Resampling (Xie et al. 2023,
# arXiv:2302.03169): select raw-corpus documents whose hashed-n-gram
# distribution looks like a target corpus, via importance weights under
# bag-of-hashed-grams models plus a Gumbel top-k draw.
# ---------------------------------------------------------------------------


def _hash_bucket(gram_col, buckets: int):
    """Feature hash: top 60 bits of md5(gram) mod ``buckets`` — md5
    (not xxhash64) so the exact bucket is expressible in ANSI SQL, the
    same portability rule as ``sample_uniform``."""
    return (
        F.conv(F.substring(F.md5(gram_col), 1, 15), 16, 10)
        .cast("long")
        % F.lit(int(buckets))
    )


def _doc_grams(
    df: DataFrame, text_col: str, id_col: str | None = None
) -> DataFrame:
    """(id?, gram) — word unigrams + space-joined bigrams (the DSIR
    feature set).  Unigrams contain no spaces, so the two levels cannot
    collide as strings.  ``id_col=None`` drops the id (corpus-level
    counting needs only the gram stream)."""
    from searchlite_spark.textops.dedup import _tokens, shingles

    uni = F.filter(_tokens(F.col(text_col)), lambda x: x != "")
    grams = F.concat(uni, shingles(F.col(text_col), 2))
    cols = [] if id_col is None else [F.col(id_col)]
    return df.select(*cols, F.explode(grams).alias("_gram"))


def dsir_bucket_logratio(
    df: DataFrame,
    target_df: DataFrame,
    text_col: str = "text",
    buckets: int = 10_000,
    smoothing: float = 1.0,
) -> DataFrame:
    """Per-bucket log importance ratio ``ln p_target(b) - ln p_raw(b)``
    over the hashed-gram buckets, with add-``smoothing`` estimates:
    ``p(b) = (count_b + a) / (total + a * buckets)``.  Returns one row
    per bucket in [0, buckets): ``(bucket LONG, log_ratio DOUBLE)``.

    Scale shape: the text column never shuffles — each corpus is read
    once, grams are hashed map-side, and the only exchanges carry
    (bucket, count) pairs bounded by ``buckets`` after map-side partial
    aggregation.  The result is ``buckets`` rows — broadcastable by
    construction (the 10^12-doc playbook: buckets ~ 10^4-10^6).
    """
    B = int(buckets)
    a = float(smoothing)
    if B <= 0:
        raise ValueError("buckets must be positive")
    if a <= 0:
        raise ValueError("smoothing must be positive (zero-count buckets)")
    spark = df.sparkSession

    def _counts(d, alias):
        return (
            _doc_grams(d, text_col)
            .groupBy(_hash_bucket(F.col("_gram"), B).alias("bucket"))
            .agg(F.count("*").alias(alias))
        )

    raw = _counts(df, "_cr")
    tgt = _counts(target_df, "_ct")
    raw_total = raw.agg(F.sum("_cr").alias("_tr"))
    tgt_total = tgt.agg(F.sum("_ct").alias("_tt"))
    all_b = spark.range(B).select(F.col("id").alias("bucket"))
    j = (
        all_b.join(raw, "bucket", "left")
        .join(tgt, "bucket", "left")
        .crossJoin(F.broadcast(raw_total))
        .crossJoin(F.broadcast(tgt_total))
    )
    cr = F.coalesce(F.col("_cr"), F.lit(0)).cast("double")
    ct = F.coalesce(F.col("_ct"), F.lit(0)).cast("double")
    tr = F.coalesce(F.col("_tr"), F.lit(0)).cast("double")
    tt = F.coalesce(F.col("_tt"), F.lit(0)).cast("double")
    # composed EXACTLY as the SQL oracle replays it (term order matters
    # at the ulp level): (ln(ct+a) - ln(Tt+aB)) - (ln(cr+a) - ln(Tr+aB))
    lr = (
        F.log(ct + F.lit(a)) - F.log(tt + F.lit(a * B))
    ) - (F.log(cr + F.lit(a)) - F.log(tr + F.lit(a * B)))
    return j.select("bucket", lr.alias("log_ratio"))


def dsir_weights(
    df: DataFrame,
    target_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    buckets: int = 10_000,
    smoothing: float = 1.0,
    logratio_df: DataFrame | None = None,
) -> DataFrame:
    """Per-document DSIR log importance weight: the sum over the doc's
    hashed grams of the bucket log-ratio.  Documents with zero grams
    get weight 0.0 (kept eligible — selection then rides on the Gumbel
    noise alone).  Returns ``(<id_col>, logw DOUBLE)`` for EVERY input
    row.

    Pass ``logratio_df`` (from ``dsir_bucket_logratio``) to reuse a
    ratio table across corpora shards; by default it is computed from
    (df, target_df).  The join against the ratio table is broadcast
    (``buckets`` rows); per-doc aggregation is a hash aggregate keyed
    on (id, bucket) then id — text itself never shuffles.
    """
    if logratio_df is None:
        logratio_df = dsir_bucket_logratio(
            df, target_df, text_col, buckets, smoothing
        )
    per = (
        _doc_grams(df, text_col, id_col)
        .groupBy(
            F.col(id_col),
            _hash_bucket(F.col("_gram"), int(buckets)).alias("bucket"),
        )
        .agg(F.count("*").alias("_n"))
        .join(F.broadcast(logratio_df), "bucket")
        .groupBy(id_col)
        .agg(F.sum(F.col("_n") * F.col("log_ratio")).alias("logw"))
    )
    return (
        df.select(id_col)
        .join(per, id_col, "left")
        .select(id_col, F.coalesce(F.col("logw"), F.lit(0.0)).alias("logw"))
    )


def dsir_select(
    df: DataFrame,
    target_df: DataFrame,
    n: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    buckets: int = 10_000,
    smoothing: float = 1.0,
    seed: int = 0,
) -> DataFrame:
    """DSIR selection: importance resampling WITHOUT replacement via
    the Gumbel top-k trick — rank by ``logw + Gumbel(seed, id)`` and
    take the top ``n``; equivalent to drawing n docs without
    replacement with probability proportional to the importance weight
    (Vieira 2014).  The Gumbel draw is the engine's deterministic
    md5-uniform shifted to the open interval ((h+0.5)/2^60), so the
    whole selection is partition-independent and SQL-replayable.

    Ranking uses the 4-decimal-rounded key with an id tie-break (the
    collocations_pmi portable-ordering rule: per-doc float sums are
    hash-aggregation-order dependent at the ulp level, so full-
    precision ORDER BY would not be engine-portable).

    Returns the selected ``(<id_col>, logw, key)`` rows, ``logw`` and
    ``key`` rounded to 4 decimals, ordered by (key DESC, id ASC).
    """
    w = dsir_weights(df, target_df, text_col, id_col, buckets, smoothing)
    h = F.conv(
        F.substring(
            F.md5(
                F.concat(
                    F.lit(str(int(seed))), F.lit(":"),
                    F.col(id_col).cast("string"),
                )
            ),
            1,
            15,
        ),
        16,
        10,
    ).cast("double")
    u = (h + F.lit(0.5)) / F.lit(float(1 << 60))
    key = F.col("logw") + (-F.log(-F.log(u)))
    return (
        w.select(
            F.col(id_col),
            F.round("logw", 4).alias("logw"),
            F.round(key, 4).alias("key"),
        )
        .orderBy(F.col("key").desc(), F.col(id_col).asc())
        .limit(int(n))
    )


def assign_splits(
    df: DataFrame,
    weights: dict,
    id_col: str = "doc_id",
    seed: int = 0,
    out_col: str = "split",
) -> DataFrame:
    """Deterministic train/val/test splitting: adds ``out_col`` naming
    the split, chosen by where the md5-uniform draw u(seed, id) falls
    among the cumulative normalized ``weights`` (insertion order).
    Every row gets exactly one split; the assignment depends only on
    (seed, id) — stable across partitionings, cluster sizes, reruns,
    and engines (the same draw the oracled ``sampler`` agg replays in
    SQL).  Map-side only: no shuffle, no sampling job.

    Float contract for oracle replay: thresholds are the literal
    left-to-right partial sums of the normalized weights — replay them
    with the SAME additions (e.g. ``u < 0.98 + 0.01``), not a
    pre-folded decimal, or the boundary ulp differs.
    """
    if not weights:
        raise ValueError("weights must name at least one split")
    total = 0.0
    for k, v in weights.items():
        if float(v) < 0:
            raise ValueError(f"split weight for {k!r} must be >= 0")
        total += float(v)
    if total <= 0:
        raise ValueError("split weights must sum to a positive value")
    u = sample_uniform(id_col=id_col, seed=seed)
    names = list(weights)
    expr = None
    cum = 0.0
    for name in names[:-1]:
        cum = cum + float(weights[name]) / total
        cond = u < F.lit(cum)
        expr = (
            F.when(cond, F.lit(name))
            if expr is None
            else expr.when(cond, F.lit(name))
        )
    last = F.lit(names[-1])
    out = last if expr is None else expr.otherwise(last)
    return df.withColumn(out_col, out)


def sample_n_per_stratum(
    df: DataFrame,
    n: int,
    strata_col: str = "lang",
    id_col: str = "doc_id",
    seed: int = 0,
    prefilter_margin: float = 20.0,
) -> DataFrame:
    """Exact-size deterministic per-stratum sample: the ``n`` rows with
    the smallest ``(u(seed, id), id)`` per stratum — fixed-size eval /
    holdout sets that are stable across partitionings, reruns, and
    engines (same md5 draw as ``assign_splits``).  Strata with fewer
    than ``n`` rows return all their rows.

    Skew shape: a naive per-stratum ``row_number`` window funnels a hot
    stratum through ONE task.  Instead the draw itself prunes first:
    with stratum count c, rows with ``u >= margin * n / c`` cannot be
    in the top n except with probability exp(-Theta(n * margin)) —
    so one counts job sets a per-stratum threshold, the window runs
    over the ~margin*n survivors per stratum, and an exact shortfall
    check re-runs any stratum the filter starved (never observed at
    margin 20, but correctness must not rest on a tail bound).
    NULL strata are dropped.
    """
    from pyspark.sql.window import Window

    if int(n) <= 0:
        raise ValueError("n must be positive")
    base = df.where(F.col(strata_col).isNotNull())
    u = sample_uniform(id_col=id_col, seed=seed)
    counts = base.groupBy(strata_col).agg(F.count("*").alias("_c"))
    thr = F.least(
        F.lit(1.0),
        F.lit(float(prefilter_margin) * int(n)) / F.col("_c"),
    )
    cand = base.join(F.broadcast(counts), strata_col).where(u < thr)

    def top_n(src):
        w = Window.partitionBy(strata_col).orderBy(
            u.asc(), F.col(id_col).asc()
        )
        return (
            src.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") <= int(n))
            .drop("_rn", "_c")
        )

    # localCheckpoint: the shortfall-check job below and the returned
    # plan must not EACH re-run the prefilter + window (the window was
    # executed twice per call; the checkpointed blocks die with the
    # returned plan)
    picked = top_n(cand).localCheckpoint(eager=False)
    got = picked.groupBy(strata_col).agg(F.count("*").alias("_g"))
    short = (
        counts.join(got, strata_col, "left")
        .where(
            F.coalesce(F.col("_g"), F.lit(0))
            < F.least(F.lit(int(n)), F.col("_c"))
        )
        .select(strata_col)
        .collect()
    )
    if short:
        redo = [r[0] for r in short]
        full = top_n(
            base.join(F.broadcast(counts), strata_col).where(
                F.col(strata_col).isin(redo)
            )
        )
        picked = picked.where(~F.col(strata_col).isin(redo)).unionByName(full)
    return picked
