"""Batched multi-query BM25 execution — N queries scored in ONE
distributed pass.

Why this exists: the reference engine (searchlite-core) answers a
single query in microseconds because it pays no scheduling cost; on
Spark, each query submitted alone pays fixed job overhead (~0.3-1 s)
that dwarfs the scoring work at any corpus size.  Sequential
single-query submission therefore caps throughput at ~1-3 queries/sec
regardless of cluster size — the *wrong* shape for the engine's actual
production duty (query logs, relevance evaluation, offline reranking,
decontamination probes: thousands of queries over one snapshot).  The
Spark-idiomatic answer is to make the QUERY SET a dimension of the
plan: one postings scan with a pushed ``term IN (union of all query
terms)`` filter, one broadcast join against the per-query term table,
one partial-aggregated shuffle, and a salted two-phase per-query
top-k.  Per-query cost amortizes to milliseconds; throughput scales
with executors instead of being serialized behind the driver.

Semantics: each request is evaluated exactly like the single-query
scored-OR path (BM25 sum over matched terms, duplicate keys sum
weights — reader.rs:2971-2983; f32 score-space tie-break score desc,
doc_id asc — the engine's ranking contract), so ``batch_topk`` results
are row-identical to calling ``Searcher.topk`` per request.  Requests
outside the scored-OR class (phrases, negation, filters, score hooks,
msm > 1) raise ``BatchUnsupportedQuery`` — they belong on the
single-query path, which supports them fully.

Scale notes (the 100-TB check):
* postings are scanned ONCE for the whole batch, with the union term
  set pushed to parquet (``PushedFilters: In(term, ...)``) — B queries
  sharing head terms do not multiply scan cost;
* the per-(query, doc) aggregation is a map-side-combined hash
  aggregate: a doc matching t terms of q emits one row after partial
  aggregation, never t;
* per-query top-k never funnels a query's full match set through one
  partition: Spark's rank-limit pushdown (WindowGroupLimit, Partial
  before the exchange / Final after) keeps at most k rows per query
  from EACH of the S upstream partitions — the aggregate output is
  hash(query, doc)-partitioned, so a head-term query's matches are
  spread S-ways and at most S*k rows per query cross the final
  exchange, bounded regardless of df (plan shape pinned in
  tests/test_batch.py::test_batch_plan_bounds_topk);
* the per-query term table is O(batch * terms) driver-side rows —
  thousands of queries fit in one broadcast; term stats come from the
  Searcher's cached dictionary lookups (one bounded job for unseen
  terms, zero for repeats).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from searchlite_spark.query import plan as P
from searchlite_spark.query.expand import expand_groups
from searchlite_spark.query.planner import build_query_plan


class BatchUnsupportedQuery(ValueError):
    """Request shape not expressible as a weighted scored-OR — run it
    through the single-query Searcher path instead."""


def _weighted_terms(searcher, request: dict) -> dict[str, tuple[float, str]]:
    """{key: (summed weight, field)} for a scored-OR request; raises
    BatchUnsupportedQuery for anything the batch path cannot express
    with single-query-identical semantics (mirrors the WAND router's
    eligibility checks, engine.py::_try_wand)."""
    from searchlite_spark.query.validate import validate_request

    validate_request(request)  # same contract gate as search()/topk()
    plan, builder = build_query_plan(request, searcher.schema)
    m = plan.matcher
    if isinstance(m, P.QueryStringMatcher):
        if m.phrase_groups or m.not_term_groups or not m.term_groups:
            raise BatchUnsupportedQuery(
                "batch_topk: phrases/negation are single-query features"
            )
        if (m.minimum_should_match or 1) > 1:
            raise BatchUnsupportedQuery(
                "batch_topk: minimum_should_match > 1 is not a scored-OR"
            )
    elif not isinstance(m, P.TermGroupRef):
        raise BatchUnsupportedQuery(
            f"batch_topk: unsupported matcher {type(m).__name__}"
        )
    if plan.root_filter or not P.is_pure_sum(plan.score_expr):
        raise BatchUnsupportedQuery(
            "batch_topk: filters/custom scoring are single-query features"
        )
    if P.needs_score_hook(plan.score_node):
        raise BatchUnsupportedQuery("batch_topk: score hooks unsupported")
    _, qualified = expand_groups(
        builder, searcher.schema, searcher.expander, request.get("fuzzy")
    )
    weights: dict[str, tuple[float, str]] = {}
    for qt in qualified:
        w, _ = weights.get(qt.key, (0.0, qt.field))
        weights[qt.key] = (w + qt.weight, qt.field)
    return weights


def batch_topk(
    searcher,
    requests: dict[str, dict] | list[tuple[str, dict]],
    k: int = 10,
) -> DataFrame:
    """Evaluate many scored-OR requests in one distributed pass.

    requests: {query_id: request} (or (query_id, request) pairs);
    each request is the same dict shape ``Searcher.topk`` accepts.
    Returns (query_id, doc_id, score, rank) with rank 1..k per query,
    ordered within each query exactly like the single-query engine
    (f32 score desc, doc_id asc).  Queries with no matching terms
    simply produce no rows (same as an empty single-query result).
    A member's own ``limit`` overrides ``k`` for that query (the rank
    window still runs at the batch maximum — a LITERAL, so Catalyst's
    WindowGroupLimit pushdown stays engaged — with a per-query filter
    on top).
    """
    if isinstance(requests, dict):
        items = list(requests.items())
    else:
        items = list(requests)
    if not items:
        raise ValueError("batch_topk: empty request batch")
    if k <= 0:
        raise ValueError("batch_topk: k must be positive")

    spark = searcher.spark
    per_query = {qid: _weighted_terms(searcher, req) for qid, req in items}
    # limit <= 0 never reaches here: validate_request (called per
    # member above) already rejects it
    k_by_query = {
        str(qid): int(req.get("limit", k)) for qid, req in items
    }
    max_k = max(k_by_query.values())

    from searchlite_spark.localrel import local_df

    all_keys = sorted({key for wt in per_query.values() for key in wt})
    if not all_keys:
        return local_df(
            spark, [], "query_id STRING, doc_id LONG, score DOUBLE, rank INT"
        )
    stats = searcher._term_stats_for(all_keys)  # cached; one bounded job
    avgdl_map = searcher.stats["avgdl"]
    n_docs = int(searcher.stats["n_docs"])

    # queries ride the plan as dense INT ordinals (_qx): the string id
    # would otherwise be hashed/compared on EVERY joined posting row and
    # shuffled twice; the int halves the agg-key bytes and the string
    # comes back via a tiny broadcast join over the <= S*k ranked rows
    qx_of = {str(qid): i for i, (qid, _req) in enumerate(items)}
    rows = []
    total_joined = 0
    for qid, wt in per_query.items():
        for key, (weight, field) in wt.items():
            df_t, _ = stats[key]
            if df_t <= 0:
                continue  # absent term scores nothing (engine parity)
            total_joined += df_t
            rows.append(
                (
                    qx_of[str(qid)],
                    key,
                    float(weight),
                    int(df_t),
                    float(avgdl_map.get(field, 0.0)),
                )
            )
    if not rows:
        return local_df(
            spark, [], "query_id STRING, doc_id LONG, score DOUBLE, rank INT"
        )
    qterms = local_df(
        spark, rows, "_qx INT, term STRING, weight DOUBLE, df LONG, avgdl DOUBLE"
    )

    live_keys = sorted({r[1] for r in rows})
    # ONE pushed-down scan covers the whole batch
    postings = searcher.postings.where(F.col("term").isin(live_keys)).select(
        "term", "doc_id", "tf", "dl"
    )
    # the scan's task count follows FILE bytes, but the work after the
    # broadcast join is ~Σ df(term) per referencing query rows of BM25
    # arithmetic — orders of magnitude more rows than the scan's — so a
    # size-packed scan (few big files) would run the whole batch on one
    # or two tasks.  We know the joined row count EXACTLY from the
    # dictionary dfs; repartition the slim scan output to a row-derived
    # width (scale-adaptive, capped at spark.sql.shuffle.partitions)
    # before fanning out the per-query contributions.
    rows_per_task = int(
        spark.conf.get("spark.searchlite.batch.rowsPerTask", "250000")
    )
    parts_cap = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    nparts = max(1, min(parts_cap, int(total_joined // rows_per_task) + 1))
    if nparts > 1:
        postings = postings.repartition(nparts)
    joined = postings.join(F.broadcast(qterms), "term")
    live_qx = sorted({r[0] for r in rows})

    # per-posting BM25 contribution — the single-query brute formula
    # (bm25.py docstring; double precision, codegen'd), weighted.
    # (Kept in EXACTLY the single-query association order — folding the
    # per-term constants driver-side was measured a wash here, the
    # stage is shuffle/agg-bound, and 1-ulp drift breaks the
    # row-identical-to-topk contract.)
    tf = F.col("tf").cast("double")
    dfc = F.col("df").cast("double")
    idf = F.greatest(
        F.log((F.lit(float(n_docs)) - dfc + 0.5) / (dfc + 0.5)), F.lit(0.0)
    ) + F.lit(1.0)
    dl_eff = F.when(F.col("dl") > 0, F.col("dl").cast("double")).otherwise(
        F.greatest(F.col("avgdl"), F.lit(1.0))
    )
    norm = F.when(F.col("avgdl") > 0, dl_eff / F.col("avgdl")).otherwise(
        F.lit(1.0)
    )
    k1, b = searcher.k1, searcher.b
    denom = F.greatest(tf + F.lit(k1) * (1.0 - b + b * norm), F.lit(1e-6))
    contrib = F.col("weight") * idf * (tf * (k1 + 1.0)) / denom

    # (A packed single-long (qx, doc) agg key — guide §2.3 "narrower
    # types" — was tried and A/B-measured at 1M docs: no reproducible
    # win over the two-column codegen hash agg; reverted for
    # simplicity.)
    scored = joined.select("_qx", "doc_id", contrib.alias("c"))
    # The final aggregation + rank window are CPU-bound over
    # ~total_joined rows, so byte-based AQE coalescing can
    # under-parallelize them (measured: the 64-query bench batch
    # coalesced to 2 reduce tasks, 4x the wall time).  A pinned
    # repartition on the agg key fixes that — but it also moves the
    # exchange BELOW the partial aggregate, shipping raw per-(query,
    # term, doc) rows instead of map-side-combined ones.  So pin ONLY
    # when AQE's byte-derived width would fall short of the row-derived
    # target: at real scale the shuffle bytes alone yield >= nparts
    # advisory-sized reducers and the plain groupBy keeps its map-side
    # combine ("one row after partial aggregation, never t").
    def _size_bytes(v: str) -> int:
        v = v.strip().lower()
        for suf, mul in (("k", 1 << 10), ("m", 1 << 20), ("g", 1 << 30),
                         ("b", 1)):
            if v.endswith(suf):
                return int(float(v[: -len(suf)])) * mul
        return int(v)

    advisory = _size_bytes(
        spark.conf.get("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64m")
    )
    est_shuffle_bytes = total_joined * 24  # qx INT + doc LONG + sum DOUBLE
    aqe_parts = max(1, est_shuffle_bytes // max(advisory, 1))
    if nparts > 1 and aqe_parts < nparts:
        scored = scored.repartition(nparts, "_qx", "doc_id")
    scored = scored.groupBy("_qx", "doc_id").agg(
        F.sum("c").alias("score")
    )

    # per-query top-k: a rank-filtered window, which Catalyst rewrites
    # to WindowGroupLimit(Partial) -> Exchange -> WindowGroupLimit(
    # Final) — i.e. a distributed partial top-k, <= S*k rows per query
    # ever cross the exchange (see module docstring / test pin)
    order = [
        F.col("score").cast("float").desc(),
        F.col("doc_id").asc(),
    ]
    w = Window.partitionBy("_qx").orderBy(*order)
    ranked = scored.withColumn("rank", F.row_number().over(w)).where(
        F.col("rank") <= max_k  # literal -> WindowGroupLimit stays on
    )
    if len(set(k_by_query.values())) > 1:
        k_map = F.create_map(
            *[
                x
                for qid, kq in k_by_query.items()
                for x in (F.lit(qx_of[qid]), F.lit(kq))
            ]
        )
        ranked = ranked.where(F.col("rank") <= k_map[F.col("_qx")])
    live = set(live_qx)
    qnames = local_df(
        spark,
        [(qx, qid) for qid, qx in qx_of.items() if qx in live],
        "_qx INT, query_id STRING",
    )
    return ranked.join(F.broadcast(qnames), "_qx").select(
        "query_id", "doc_id", "score", "rank"
    )
