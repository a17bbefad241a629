"""Distributed block-max WAND top-k kernel.

The reference's WAND/BMW (searchlite-core/src/query/wand.rs:659-903) is
a doc-at-a-time pivot loop with per-term upper bounds and per-block
max-tf skipping (blocks built in postings.rs:84-111).  A sequential
DAAT loop doesn't distribute, so this kernel re-expresses the same
pruning idea in Spark's execution model:

1. **Threshold seed** (tiny job): exactly score the highest-upper-bound
   query term's postings and take the k-th best score as θ₀.  θ₀ is a
   lower bound of the true top-k threshold, so pruning with it is
   lossless (the reference grows θ as the heap fills; we pre-seed it).

2. **Block-max interval sweep** (per doc-range bucket, metadata only —
   no payload decode): candidate blocks are bucketed by doc-id range
   (blocks spanning a boundary are duplicated and masked).  Within a
   bucket, a numpy interval sweep over [block_id, max_doc_id] ranges
   accumulates Σ_t ub_t — per-block BM25 upper bound from the
   persisted block-max metadata (BMW) or the term-level bound (WAND) —
   and keeps only doc ranges where the bound ≥ θ₀.  Whole compressed
   blocks outside surviving ranges are never decoded — the distributed
   analogue of `skip_to_block` (wand.rs:874-892).

3. **Exact re-score**: decode surviving blocks (delta+varint → numpy),
   `np.add.at` the per-posting BM25 contributions, local top-k per
   bucket, then a global `ORDER BY score DESC, doc_id ASC LIMIT k`
   over ≤ buckets × k rows.

Equivalence invariant (reference tests/pruning.rs:44-104): brute, WAND
and BMW return identical ids and scores to the brute-force scorer —
verified in tests/test_pruning.py.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, functions as F

from searchlite_spark.query.bm25 import B_DEFAULT, K1_DEFAULT

KERNEL_SCHEMA = "doc_id LONG, score DOUBLE"


def term_upper_bound(weight, df, max_tf, n_docs, k1=K1_DEFAULT, b=B_DEFAULT):
    """UB of weight * bm25(tf<=max_tf, dl>=0): denom >= tf + k1*(1-b)."""
    idf = max(math.log((n_docs - df + 0.5) / (df + 0.5)), 0.0) + 1.0
    tf = float(max_tf)
    return weight * idf * (tf * (k1 + 1.0)) / max(tf + k1 * (1.0 - b), 1e-6)


def wand_topk(
    spark,
    blocks: DataFrame,
    key_meta: dict[str, dict],
    n_docs: int,
    avgdl: dict[str, float],
    k: int,
    mode: str = "bmw",
    bucket_width: int | None = None,
    k1: float = K1_DEFAULT,
    b: float = B_DEFAULT,
    postings: DataFrame | None = None,
    counters: dict | None = None,
    theta_cache: dict | None = None,
    exclude: DataFrame | None = None,
) -> DataFrame:
    """key_meta: {key: {"weight", "df", "max_tf", "field"}}.
    Returns (doc_id, score) — exact top-k of Σ_t weight_t * bm25_t.

    postings: when given, the threshold seed runs as a small distributed
    job over the seed term's postings (pushed-down term filter) instead
    of a driver-side decode — no df cap, no θ=0 fallback for head terms.
    counters: optional dict of Spark accumulators
    {"blocks_candidate", "blocks_decoded", "docs_scored"} — the pruning
    observability surface (mirrors the reference's profile counters,
    wand.rs:45-50); incremented inside the kernel when provided.
    exclude: optional DataFrame of tombstoned ``doc_id`` — routed to the
    kernel as the second side of a bucket-cogrouped applyInPandas, so
    deleted docs are masked after block decode WITHOUT ever
    materializing the tombstone set on the driver (each kernel task
    sees only its own bucket's tombstones; blocks are immutable packed
    payloads the row-level anti-join cannot reach inside)."""
    keys = sorted(key_meta)
    if not keys:
        from searchlite_spark.localrel import local_df

        return local_df(spark, [], KERNEL_SCHEMA)
    nparts = None
    if bucket_width is None:
        # kernel parallelism follows DOC COUNT, not shuffle bytes: the
        # kernel is CPU-bound numpy over compressed blocks, so AQE's
        # byte-based coalescing (tuned for I/O-bound reducers) would
        # under-parallelize it — a 1M-doc bucket shuffle is only ~50 MB
        # but seconds of decode.  Explicitly pinning the partition count
        # (scale-adaptive: ~docsPerTask docs per kernel task, capped at
        # spark.sql.shuffle.partitions) keeps tiny indexes on ONE task
        # (no 32-way scheduling for kilobytes) and big ones parallel.
        parts = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
        docs_per_task = int(
            spark.conf.get("spark.searchlite.wand.docsPerTask", "250000")
        )
        nparts = max(1, min(parts, (n_docs + docs_per_task - 1) // docs_per_task))
        bucket_width = max(n_docs // (nparts * 2), 1024)

    # ---- 1. threshold seed from the highest-UB term ----
    ubs = {
        key: term_upper_bound(
            m["weight"], m["df"], m["max_tf"], n_docs, k1, b
        )
        for key, m in key_meta.items()
    }
    if mode == "brute":
        theta = 0.0  # decode + score everything (the kernel oracle)
    else:
        seed_key = max(ubs, key=ubs.get)
        # θ depends only on the seed term's immutable postings and
        # (weight, k, k1, b) — cacheable across queries on a snapshot
        ck = (seed_key, float(key_meta[seed_key]["weight"]), k, k1, b)
        if theta_cache is not None and ck in theta_cache:
            theta = theta_cache[ck]
        elif postings is not None:
            theta = _seed_threshold_distributed(
                postings, key_meta[seed_key], seed_key, avgdl, n_docs, k, k1, b
            )
            if theta_cache is not None:
                theta_cache[ck] = theta
        else:
            # no postings handle: run unpruned (still exact; theta only
            # controls skipping)
            theta = 0.0

    # ---- 2+3. bucketed kernel ----
    cand = blocks.where(F.col("term").isin(keys)).select(
        "term", "block_id", "n", "max_doc_id", "max_tf", "doc_ids", "tfs", "dls"
    )
    w = F.lit(bucket_width)
    bucketed = cand.withColumn(
        "bucket",
        F.explode(
            F.sequence(
                (F.col("block_id") / w).cast("long"),
                (F.col("max_doc_id") / w).cast("long"),
            )
        ),
    )

    meta = {
        key: {
            "weight": float(m["weight"]),
            "df": float(m["df"]),
            "avgdl": float(avgdl.get(m["field"], 0.0)),
            "ub": float(ubs[key]),
        }
        for key, m in key_meta.items()
    }
    idf = {
        key: max(math.log((n_docs - m["df"] + 0.5) / (m["df"] + 0.5)), 0.0) + 1.0
        for key, m in key_meta.items()
    }
    for key in meta:
        meta[key]["idf"] = float(idf[key])

    kernel = _make_kernel(meta, theta, k, mode, bucket_width, k1, b, counters)
    if nparts is not None:
        # user-pinned partition count: groupBy reuses this exact hash
        # partitioning (no second exchange) and AQE leaves it alone
        bucketed = bucketed.repartition(nparts, "bucket")
    out_schema = "bucket LONG, doc_id LONG, score DOUBLE"
    if exclude is not None:
        # tombstones flow to the kernel as cogrouped per-bucket rows —
        # a distributed shuffle on the same bucket key, never a
        # driver-side list (at 100x tombstone volume a closure list is
        # a driver-memory + task-serialization tax on every query)
        ex_bucketed = exclude.select(
            (F.col("doc_id") / w).cast("long").alias("bucket"),
            F.col("doc_id").cast("long").alias("doc_id"),
        )

        def cokernel(left, right):
            import numpy as np
            import pandas as pd

            if len(left) == 0:
                # tombstone-only bucket: no blocks, nothing to score
                return pd.DataFrame(
                    {"bucket": [], "doc_id": [], "score": []}
                ).astype(
                    {"bucket": "int64", "doc_id": "int64", "score": "float64"}
                )
            ex = (
                right["doc_id"].to_numpy(dtype=np.int64)
                if len(right)
                else None
            )
            return kernel(left, ex)

        local = (
            bucketed.groupBy("bucket")
            .cogroup(ex_bucketed.groupBy("bucket"))
            .applyInPandas(cokernel, out_schema)
        )
    else:
        # single-arg wrapper: applyInPandas inspects arity and would
        # treat the 2-arg kernel(pdf, exclude=None) as (key, pdf)
        local = bucketed.groupBy("bucket").applyInPandas(
            lambda pdf: kernel(pdf), out_schema
        )
    return (
        local.orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
        .select("doc_id", "score")
    )


def _seed_threshold_distributed(
    postings, m, key, avgdl, n_docs, k, k1, b
) -> float:
    """k-th best exact score of the seed term, computed as a tiny
    distributed job: pushed-down term scan -> codegen'd BM25 column ->
    ORDER BY LIMIT k.  Replaces the driver-side payload decode — no
    posting bytes ever reach the driver, and head terms (df in the
    billions at 100 TB) seed just as well as rare ones."""
    import math as _math

    from pyspark.sql import functions as F

    if m["df"] < k:
        return 0.0
    av = float(avgdl.get(m["field"], 0.0))
    idf = max(_math.log((n_docs - m["df"] + 0.5) / (m["df"] + 0.5)), 0.0) + 1.0
    tf = F.col("tf").cast("double")
    dl_eff = F.when(F.col("dl") > 0, F.col("dl").cast("double")).otherwise(
        F.lit(max(av, 1.0))
    )
    norm = dl_eff / F.lit(av) if av > 0 else F.lit(1.0)
    denom = F.greatest(tf + F.lit(k1) * (1.0 - b + b * norm), F.lit(1e-6))
    score = F.lit(float(m["weight"]) * idf) * (tf * (k1 + 1.0)) / denom
    rows = (
        postings.where(F.col("term") == key)
        .select(score.alias("s"))
        .orderBy(F.desc("s"))
        .limit(k)
        .collect()
    )
    if len(rows) < k:
        return 0.0
    return float(rows[-1]["s"])


def _make_kernel(meta, theta, k, mode, bucket_width, k1, b, counters=None):
    """Returns kernel(pdf, exclude=None): exclude is this bucket's
    tombstoned doc ids (numpy int64, supplied per-task by the cogroup
    in wand_topk) — masked out after decode, before scoring, so deleted
    docs never occupy top-k slots."""

    def kernel(pdf, exclude=None):
        import numpy as np
        import pandas as pd

        from searchlite_spark.index.codec import decode_deltas, decode_varints

        # deterministic block order => deterministic per-doc fp sum order
        pdf = pdf.sort_values(["term", "block_id"], kind="mergesort").reset_index(
            drop=True
        )
        bucket = int(pdf["bucket"].iloc[0])
        lo, hi = bucket * bucket_width, (bucket + 1) * bucket_width - 1

        # ---- interval sweep over block-max metadata (no decode) ----
        starts = np.maximum(pdf["block_id"].to_numpy(), lo)
        ends = np.minimum(pdf["max_doc_id"].to_numpy(), hi)
        terms = pdf["term"].to_numpy()

        if theta > 0:
            if mode == "bmw":
                # per-block UB from persisted block-max tf
                block_ubs = np.empty(len(pdf), dtype=np.float64)
                maxtfs = pdf["max_tf"].to_numpy()
                for i in range(len(pdf)):
                    m = meta[terms[i]]
                    tf = float(maxtfs[i])
                    block_ubs[i] = (
                        m["weight"]
                        * m["idf"]
                        * (tf * (k1 + 1.0))
                        / max(tf + k1 * (1.0 - b), 1e-6)
                    )
            else:  # wand: term-level UB for every block
                block_ubs = np.array(
                    [meta[t]["ub"] for t in terms], dtype=np.float64
                )
            # sweep: +ub at start, -ub after end; ranges where the
            # running sum >= theta survive
            ev_pos = np.concatenate([starts, ends + 1])
            ev_val = np.concatenate([block_ubs, -block_ubs])
            order = np.argsort(ev_pos, kind="stable")
            ev_pos, ev_val = ev_pos[order], ev_val[order]
            run = np.cumsum(ev_val)
            # positions where bound >= theta between ev_pos[i], ev_pos[i+1])
            ok = run >= theta - 1e-9
            if not ok.any():
                if counters is not None:
                    counters["blocks_candidate"].add(int(len(pdf)))
                return pd.DataFrame(
                    {"bucket": [], "doc_id": [], "score": []}
                ).astype({"bucket": "int64", "doc_id": "int64", "score": "float64"})
            seg_lo = ev_pos[ok]
            nxt = np.empty_like(ev_pos)
            nxt[:-1] = ev_pos[1:]
            nxt[-1] = hi + 1
            seg_hi = nxt[ok] - 1
            # block survives if it overlaps any surviving segment
            surv = np.zeros(len(pdf), dtype=bool)
            j = np.searchsorted(seg_lo, starts, side="right") - 1
            for i in range(len(pdf)):
                jj = j[i]
                if jj >= 0 and seg_hi[jj] >= starts[i]:
                    surv[i] = True
                    continue
                jj += 1
                if jj < len(seg_lo) and seg_lo[jj] <= ends[i]:
                    surv[i] = True
            cover_lo, cover_hi = seg_lo, seg_hi
        else:
            surv = np.ones(len(pdf), dtype=bool)
            cover_lo = np.array([lo])
            cover_hi = np.array([hi])

        # ---- decode surviving blocks, exact score ----
        if counters is not None:
            counters["blocks_candidate"].add(int(len(pdf)))
            counters["blocks_decoded"].add(int(surv.sum()))
        width = hi - lo + 1
        acc = np.zeros(width, dtype=np.float64)
        touched = np.zeros(width, dtype=bool)
        idxs = np.nonzero(surv)[0]
        if len(idxs):
            # batch decode: concatenate surviving payloads per column and
            # decode ONCE (LEB128 streams concatenate safely — the last
            # byte of each value/block has the high bit clear).  The only
            # per-block fixup is re-basing the doc-id delta cumsum at
            # block starts; everything else is flat numpy over all
            # entries in (term, block_id) order, preserving the per-doc
            # fp accumulation order of the per-block loop it replaces.
            docs_col = pdf["doc_ids"].to_numpy()
            tfs_col = pdf["tfs"].to_numpy()
            dls_col = pdf["dls"].to_numpy()
            ns = pdf["n"].to_numpy().astype(np.int64)
            surv_ns = ns[idxs]
            total = int(surv_ns.sum())
            deltas = decode_varints(
                b"".join(bytes(docs_col[i]) for i in idxs), total
            )
            ends_ix = np.cumsum(surv_ns)
            starts_ix = ends_ix - surv_ns
            run = np.cumsum(deltas)
            # per-block cumsum: subtract the running total carried in
            # from the previous block (first entry of each block is the
            # absolute doc id)
            carry = np.zeros(total, dtype=np.uint64)
            carry[starts_ix[1:]] = run[starts_ix[1:] - 1]
            dids = (run - np.repeat(carry[starts_ix], surv_ns)).astype(np.int64)
            tfs = decode_varints(
                b"".join(bytes(tfs_col[i]) for i in idxs), total
            ).astype(np.float64)
            dls = decode_varints(
                b"".join(bytes(dls_col[i]) for i in idxs), total
            ).astype(np.float64)
            surv_terms = terms[idxs]
            wi = np.repeat(
                np.array([meta[t]["weight"] * meta[t]["idf"] for t in surv_terms]),
                surv_ns,
            )
            av = np.repeat(
                np.array([meta[t]["avgdl"] for t in surv_terms]), surv_ns
            )
            mask = (dids >= lo) & (dids <= hi)
            if exclude is not None:
                mask &= ~np.isin(dids, exclude, assume_unique=False)
            dids, tfs, dls = dids[mask], tfs[mask], dls[mask]
            wi, av = wi[mask], av[mask]
            dl_eff = np.where(dls > 0, dls, np.maximum(av, 1.0))
            norm = np.where(av > 0, dl_eff / np.maximum(av, 1e-300), 1.0)
            denom = np.maximum(tfs + k1 * (1.0 - b + b * norm), 1e-6)
            contrib = wi * (tfs * (k1 + 1.0)) / denom
            off = dids - lo
            np.add.at(acc, off, contrib)
            touched[off] = True

        # restrict to docs inside surviving coverage (others can't beat θ)
        doc_off = np.nonzero(touched)[0]
        if counters is not None:
            counters["docs_scored"].add(int(len(doc_off)))
        if len(doc_off) == 0:
            return pd.DataFrame({"bucket": [], "doc_id": [], "score": []}).astype(
                {"bucket": "int64", "doc_id": "int64", "score": "float64"}
            )
        doc_ids = doc_off + lo
        scores = acc[doc_off]
        if theta > 0:
            keep = scores >= theta - 1e-9
            doc_ids, scores = doc_ids[keep], scores[keep]
        # local top-k, tie-break doc_id asc (wand.rs:30-37)
        if len(scores) > k:
            order = np.lexsort((doc_ids, -scores))[:k]
            doc_ids, scores = doc_ids[order], scores[order]
        return pd.DataFrame(
            {
                "bucket": np.full(len(doc_ids), bucket, dtype=np.int64),
                "doc_id": doc_ids.astype(np.int64),
                "score": scores,
            }
        )

    return kernel
