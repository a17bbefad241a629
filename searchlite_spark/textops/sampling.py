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
