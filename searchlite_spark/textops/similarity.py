"""Similarity search over an embedding column (ARRAY<FLOAT>).

* ``cosine_topk``  — brute-force cosine top-k: exact baseline.  The dot
  product stays JVM-side (``zip_with`` + ``aggregate`` in double
  precision); top-k is ``ORDER BY LIMIT`` (TakeOrdered — no full sort).
* ``lsh_ann_topk`` — the scale path: random-hyperplane LSH bucketing;
  probe only the query's bucket (+ optional multi-probe neighbors),
  re-rank candidates exactly.  At 10^12 rows the bucketed table is
  written partitioned by bucket so a probe prunes to a few files.

Deterministic hyperplanes: seeded from xxhash64 of (plane, dim) — no
RNG state, reproducible across runs and engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def cosine_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """(id, cosine DOUBLE) — exact brute-force top-k."""
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    import math

    qn = math.sqrt(sum(float(x) * float(x) for x in query_vec))
    cos = _dot(F.col(vec_col), q) / (_norm(F.col(vec_col)) * F.lit(qn))
    return (
        df.select(F.col(id_col), cos.alias("cosine"))
        .orderBy(F.col("cosine").desc(), F.col(id_col).asc())
        .limit(k)
    )


def quantize_embeddings(
    df: DataFrame, vec_col: str = "embedding", out_col: str = "embedding_q"
) -> DataFrame:
    """Scalar int8 quantization of an embedding column — the
    reference's quantizer (vectors/quant.rs:1-3: ``(v * 127.0) as i8``,
    i.e. saturate to [-128, 127] and truncate toward zero) as a pure
    column expression.  4x smaller vectors; at 10^12 rows the quantized
    column is what ships through shuffles and candidate re-ranks, the
    f32 originals stay in the base table for final re-scoring."""
    q = F.transform(
        F.col(vec_col),
        lambda x: F.least(
            F.greatest(x.cast("double") * 127.0, F.lit(-128.0)), F.lit(127.0)
        ).cast("tinyint"),
    )
    return df.withColumn(out_col, q)


def quantize_query(query_vec: list[float]) -> list[int]:
    """Driver-side twin of ``quantize_embeddings`` (same saturating
    truncation — Python int() truncates toward zero like Rust ``as``)."""
    return [max(min(int(float(v) * 127.0), 127), -128) for v in query_vec]


def quantized_cosine_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """(id, qcos DOUBLE) — brute-force top-k over int8-quantized
    vectors: both sides quantized with the reference rule, integer dot
    product rescaled by 1/127².  This is the cheap first-pass ranking
    (4x less data moved, integer multiply-adds); callers re-rank the
    short candidate list with ``cosine_topk`` over the f32 originals
    when exactness matters.  Deterministic — oracle-checkable."""
    qq = quantize_query(query_vec)
    qcol = F.array(*[F.lit(int(v)).cast("int") for v in qq])
    quantized = quantize_embeddings(df, vec_col, "_q")
    dot = F.aggregate(
        F.zip_with(F.col("_q"), qcol, lambda a, b: a.cast("int") * b),
        F.lit(0),
        lambda acc, x: acc + x,
    )
    score = dot.cast("double") / F.lit(127.0 * 127.0)
    return (
        quantized.select(F.col(id_col), score.alias("qcos"))
        .orderBy(F.col("qcos").desc(), F.col(id_col).asc())
        .limit(k)
    )


def hybrid_topk(
    searcher,
    query,
    emb: DataFrame,
    query_vec: list[float],
    k: int = 10,
    alpha: float = 0.5,
    candidate_k: int = 100,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Hybrid BM25 + vector retrieval (the reference's `vector` query
    node blend, api/reader.rs:226-254 compute_hybrid_score +
    vectors/mod.rs:122-129 blend_scores):

    * candidates = BM25 matches ∪ vector top-``candidate_k``;
    * score = alpha·bm25 + (1-alpha)·cosine, with bm25=0 for
      vector-only candidates and cosine=-1.0 for docs outside the
      vector candidate set (missing_vector_score, reader.rs:218-223);
    * alpha>=1 degenerates to pure BM25, alpha<=0 to pure vector
      (vector-only candidates).

    The join key is the embedding id == doc id.  Both legs are
    independent distributed jobs; the merge is a full-outer join on
    doc_id over (|bm25 matches| + candidate_k) rows."""
    if alpha <= 0.0:
        vs = cosine_topk(emb, query_vec, candidate_k, vec_col, id_col)
        out = vs.select(
            F.col(id_col).alias("doc_id"), F.col("cosine").alias("score")
        )
        return (
            out.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)
        )
    bm = searcher.match_set({"query": query}).select(
        "doc_id", F.col("score").alias("_bm25")
    )
    if alpha >= 1.0:
        return (
            bm.select("doc_id", F.col("_bm25").alias("score"))
            .orderBy(F.desc("score"), F.asc("doc_id"))
            .limit(k)
        )
    vs = cosine_topk(emb, query_vec, candidate_k, vec_col, id_col).select(
        F.col(id_col).alias("doc_id"), F.col("cosine").alias("_vec")
    )
    merged = bm.join(vs, "doc_id", "full_outer").select(
        "doc_id",
        (
            F.lit(float(alpha)) * F.coalesce(F.col("_bm25"), F.lit(0.0))
            + F.lit(1.0 - float(alpha))
            * F.coalesce(F.col("_vec"), F.lit(-1.0))
        ).alias("score"),
    )
    return merged.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)


MAX_VECTOR_CLAUSES = 8  # reader.rs:134


def hybrid_multi_topk(
    searcher,
    emb: DataFrame,
    clauses: list[dict],
    query=None,
    k: int = 10,
    candidate_k: int = 100,
    doc_filter: list[dict] | None = None,
    vector_filter: list[dict] | None = None,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Filtered, multi-clause hybrid retrieval — the full shape of the
    reference's vector query surface (reader.rs:2000-2183 build plan,
    2379-2473 candidate collection with root/vector filters,
    2474-2537 merge, 226-254 compute_hybrid_score):

    * ``clauses``: up to MAX_VECTOR_CLAUSES dicts
      ``{"vector": [...], "alpha": 0..1 (default 0.5), "boost": >=0
      (default 1.0)}``.  Per clause, per candidate doc:
      ``blended = alpha*bm25 + (1-alpha)*vec`` with the reference's
      degenerate ends (alpha>=1 -> pure bm25, alpha<=0 -> pure vector);
      the final score is the MEAN of the per-clause blends
      (compute_hybrid_score's ``blended_sum / clauses.len()``).
    * missing scores: bm25=0.0 for vector-only candidates, vec=-1.0
      (cosine missing_vector_score, reader.rs:218-223) for docs outside
      a clause's candidate set; the missing sentinel is NOT boosted —
      boost multiplies only real scores, before per-clause truncation
      (collect_vector_maps ``vscore *= clause.boost``).
    * ``doc_filter`` (the request root filter) constrains BOTH legs;
      ``vector_filter`` constrains only the vector candidates.  Both
      apply BEFORE the per-clause top-``candidate_k`` truncation, as in
      collect_vector_maps — filter-then-truncate, so a filtered search
      still returns ``candidate_k`` survivors per clause, not the
      filtered remnant of an unfiltered top-k.
    * if every clause has alpha<=0 the query is vector-only: docs with
      no vector score are dropped (merge_vector_hits's
      ``all_vector_only`` guard) and the BM25 job never runs.

    Scale shape: the candidate filters are a semi-join of the embedding
    table against the filtered doc-id set (co-partitioned on the id,
    AQE broadcasts whichever side is small); each clause is an
    independent TakeOrdered over the filtered embeddings (swap in
    lsh_ann_topk/ivf_index_search candidates for the brute scan at
    10^12 rows — the blend is agnostic to how candidates were found);
    the merge is a full-outer join over <= |bm25| + n_clauses*k rows.
    """
    if not clauses:
        raise ValueError("hybrid_multi_topk: at least one vector clause")
    if len(clauses) > MAX_VECTOR_CLAUSES:
        raise ValueError(
            f"too many vector clauses: got {len(clauses)}, "
            f"max supported {MAX_VECTOR_CLAUSES}"
        )
    import math

    for c in clauses:
        alpha = float(c.get("alpha", 0.5))
        boost = float(c.get("boost", 1.0))
        if not (0.0 <= alpha <= 1.0) or not math.isfinite(alpha):
            raise ValueError(
                "vector alpha must be a finite value between 0 and 1 "
                "inclusive"
            )
        if boost < 0.0 or not math.isfinite(boost):
            raise ValueError("vector boost must be finite and non-negative")

    from searchlite_spark.query.filters import compile_filters

    cand_src = emb
    vf = list(doc_filter or []) + list(vector_filter or [])
    if vf:
        allowed = searcher.docs.where(
            compile_filters(searcher.docs, vf)
        ).select(F.col("doc_id").alias(id_col))
        cand_src = emb.join(allowed, id_col, "semi")

    legs = []
    for i, c in enumerate(clauses):
        boost = float(c.get("boost", 1.0))
        if boost == 0.0:
            # reference truncation sorts by BOOSTED score then id; with
            # boost=0 every score ties, so candidates are the first
            # candidate_k by id (collect_vector_maps's tie-break)
            vs = (
                cand_src.select(
                    F.col(id_col).alias("doc_id"),
                    F.lit(0.0).alias(f"_vec{i}"),
                )
                .orderBy(F.asc("doc_id"))
                .limit(candidate_k)
            )
        else:
            # boost > 0 rescales without reordering, so boosting after
            # the top-k truncation selects the same candidate set as
            # the reference's boost-before-sort
            vs = cosine_topk(
                cand_src, list(c["vector"]), candidate_k, vec_col, id_col
            ).select(
                F.col(id_col).alias("doc_id"),
                (F.col("cosine") * F.lit(boost)).alias(f"_vec{i}"),
            )
        legs.append(vs)

    alphas = [float(c.get("alpha", 0.5)) for c in clauses]
    vector_only = all(a <= 0.0 for a in alphas)
    if vector_only or query is None:
        merged = legs[0]
        for leg in legs[1:]:
            merged = merged.join(leg, "doc_id", "full_outer")
        merged = merged.withColumn("_bm25", F.lit(0.0))
    else:
        req = {"query": query}
        if doc_filter:
            req["filter"] = list(doc_filter)
        bm = searcher.match_set(req).select(
            "doc_id", F.col("score").alias("_bm25")
        )
        merged = bm
        for leg in legs:
            merged = merged.join(leg, "doc_id", "full_outer")
        merged = merged.withColumn(
            "_bm25", F.coalesce(F.col("_bm25"), F.lit(0.0))
        )
    blend_sum = F.lit(0.0)
    for i, alpha in enumerate(alphas):
        vec_i = F.coalesce(F.col(f"_vec{i}"), F.lit(-1.0))
        if alpha >= 1.0:
            blended = F.col("_bm25")
        elif alpha <= 0.0:
            blended = vec_i
        else:
            blended = (
                F.lit(alpha) * F.col("_bm25") + F.lit(1.0 - alpha) * vec_i
            )
        blend_sum = blend_sum + blended
    score = blend_sum / F.lit(float(len(clauses)))
    out = merged.select("doc_id", score.alias("score"))
    return out.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)


def _hyperplane_sign(vec_col, plane: int, dim: int):
    """Deterministic pseudo-random hyperplane: weight(plane, j) =
    xxhash64(plane, j) scaled to [-1, 1]."""
    weights = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda j: (
            F.xxhash64(F.lit(plane), j).cast("double") / F.lit(float(2**63))
        ),
    )
    proj = F.aggregate(
        F.zip_with(vec_col, weights, lambda x, w: x.cast("double") * w),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return F.when(proj >= 0, F.lit(1)).otherwise(F.lit(0))


def lsh_buckets(
    df: DataFrame,
    dim: int,
    planes: int = 8,
    vec_col: str = "embedding",
    table: int = 0,
) -> DataFrame:
    """Adds a ``bucket`` column = packed sign bits of `planes` random
    hyperplane projections (hash table number `table` — each table uses
    an independent hyperplane family).  Write ``partitionBy("bucket")``
    for probe-time file pruning at scale."""
    bucket = F.lit(0)
    for p in range(planes):
        bucket = bucket * 2 + _hyperplane_sign(
            F.col(vec_col), table * planes + p, dim
        )
    return df.withColumn("bucket", bucket)


def lsh_bucket_table(
    df: DataFrame,
    dim: int,
    planes: int = 8,
    tables: int = 8,
    vec_col: str = "embedding",
) -> DataFrame:
    """Exploded multi-table layout: one row per (input row, table) with
    columns ``tbl`` and ``bucket``.  At 10^12 rows this is THE index
    layout: one pass over the vectors computes all table signatures,
    written ``partitionBy("tbl", "bucket")`` so a probe reads exactly
    `tables` × (1+multiprobe) file partitions — no shuffle at query
    time.  Storage cost = `tables`× ids (vectors stay in the base
    table; join back on id for re-rank)."""
    sigs = F.array(
        *[
            F.struct(
                F.lit(t).alias("tbl"),
                _pack_bucket(F.col(vec_col), dim, planes, t).alias("bucket"),
            )
            for t in range(tables)
        ]
    )
    return df.withColumn("_sig", F.explode(sigs)).select(
        *df.columns, F.col("_sig.tbl").alias("tbl"),
        F.col("_sig.bucket").alias("bucket"),
    )


def _pack_bucket(vec_col, dim: int, planes: int, table: int):
    bucket = F.lit(0)
    for p in range(planes):
        bucket = bucket * 2 + _hyperplane_sign(vec_col, table * planes + p, dim)
    return bucket


def lsh_ann_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    planes: int | None = None,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    multiprobe: int = 4,
    tables: int = 8,
    n_rows: int | None = None,
    target_bucket_size: int = 2000,
) -> DataFrame:
    """Approximate top-k via multi-table hyperplane LSH: candidates =
    union over `tables` independent hash tables of the query's bucket
    (+ Hamming-1 neighbors when multiprobe>0), re-ranked exactly.

    One table of b sign bits collides clustered neighbors with
    probability p^b (p = 1 - angle/pi), which tops out near ~0.3 recall
    at useful bucket sizes; L independent tables lift recall to
    1-(1-p^b)^L — the standard LSH amplification (and the distributed
    stand-in for the reference's HNSW graph, vectors/hnsw.rs:10-120,
    which needs single-node random access).  Measured on 100k clustered
    vectors, neighbor cosine ~0.8 (scripts/ann_recall_bench.py):
    planes=8, tables=8, multiprobe=4 -> recall@10 = 0.98 examining 16%
    of the corpus; planes=12, tables=8 -> 0.80 at 1.3%.  Candidates
    stay bounded: tables x (1+multiprobe) buckets of ~N/2^planes rows
    each — at larger N raise `planes` to hold the bucket size (not the
    bucket count) constant and raise `tables`/`multiprobe` to buy the
    recall back.

    Defaults are the bench-measured >=0.9-recall config (multiprobe=4,
    tables=8; recall@10 = 0.98).  `planes` auto-scales when the caller
    passes `n_rows` (its known/estimated corpus size):
    ceil(log2(n_rows / target_bucket_size)), floored at 8 — holding
    bucket size ~constant as N grows, per the guidance above."""
    if planes is None:
        if n_rows is not None and n_rows > 0:
            import math

            planes = max(8, math.ceil(math.log2(max(n_rows / target_bucket_size, 2.0))))
        else:
            planes = 8
    dim = len(query_vec)
    spark = df.sparkSession
    qdf = spark.createDataFrame(
        [(list(map(float, query_vec)),)], f"{vec_col} ARRAY<DOUBLE>"
    )
    # query signatures computed with the same Spark expressions via a
    # 1-row DataFrame (keeps the arithmetic identical to the corpus)
    qsig = lsh_bucket_table(qdf, dim, planes, tables, vec_col).collect()
    sig = lsh_bucket_table(df, dim, planes, tables, vec_col)
    cond = F.lit(False)
    for r in qsig:
        qbucket = r["bucket"]
        probes = [qbucket]
        if multiprobe > 0:
            probes += [qbucket ^ (1 << b) for b in range(planes)][:multiprobe]
        cond = cond | (
            (F.col("tbl") == r["tbl"]) & F.col("bucket").isin(probes)
        )
    # one pass over the corpus (against the partitioned layout this is
    # partition pruning, not a scan); dedup ids matched by >1 table
    cand = sig.where(cond).select(*df.columns).dropDuplicates([id_col])
    return cosine_topk(cand, query_vec, k, vec_col, id_col)


def cosine_near_pairs(
    df: DataFrame,
    threshold: float = 0.9,
    dim: int | None = None,
    planes: int = 8,
    tables: int = 8,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    max_bucket_size: int | None = 1000,
    warn_on_drop: bool = True,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs ``(id_a < id_b, cosine)``:
    the vector-space member of the dedup family (exact / minhash /
    simhash / n-gram-jaccard live in textops.dedup).

    Candidate generation is the same multi-table hyperplane LSH used by
    ``lsh_ann_topk``: a pair collides in one table of b sign bits with
    probability p^b (p = 1 - angle/pi) and in >=1 of L tables with
    1-(1-p^b)^L, so recall is tunable with `tables`; EXACT duplicates
    (identical vectors) share every signature deterministically and are
    found with certainty.  Verification is exact double-precision
    cosine, so precision is exact: no pair below `threshold` survives.

    Scale shape mirrors minhash_lsh_pairs: one pass computes all table
    signatures, the self-join is per (tbl, bucket) with the same
    oversized-bucket cap (default 1000; a bucket of m rows is an m²
    join — zero-vector/boilerplate-embedding clusters must never launch
    one), dropped groups warn via the shared funnel.  Zero-norm vectors
    are excluded (cosine undefined).
    """
    from searchlite_spark.textops.dedup import _cap_buckets

    if dim is None:
        first = df.select(vec_col).first()
        if first is None:
            return df.sparkSession.createDataFrame(
                [], f"id_a LONG, id_b LONG, cosine DOUBLE"
            )
        dim = len(first[0])
    vecs = df.select(F.col(id_col), F.col(vec_col)).where(
        _norm(F.col(vec_col)) > 0
    )
    sig = lsh_bucket_table(vecs, dim, planes, tables, vec_col).select(
        id_col, "tbl", "bucket"
    )
    if max_bucket_size is not None:
        sig = _cap_buckets(
            sig, ["tbl", "bucket"], max_bucket_size,
            "cosine_near_pairs", warn_on_drop,
        )
    left = sig.alias("l")
    right = sig.alias("r")
    cand = (
        left.join(
            right,
            (F.col("l.tbl") == F.col("r.tbl"))
            & (F.col("l.bucket") == F.col("r.bucket"))
            & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")),
        )
        .select(
            F.col(f"l.{id_col}").alias("id_a"),
            F.col(f"r.{id_col}").alias("id_b"),
        )
        .distinct()
    )
    a = vecs.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("_va"))
    b = vecs.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("_vb"))
    cos = _dot(F.col("_va"), F.col("_vb")) / (
        _norm(F.col("_va")) * _norm(F.col("_vb"))
    )
    return (
        cand.join(a, "id_a")
        .join(b, "id_b")
        .withColumn("cosine", cos)
        .where(F.col("cosine") >= F.lit(float(threshold)))
        .select("id_a", "id_b", "cosine")
    )


# ---------------------------------------------------------------------------
# IVF (inverted-file) ANN — the cell-probe alternative to hyperplane LSH.
#
# Reference parity note: the reference's ANN structure is a single-node
# HNSW graph (vectors/hnsw.rs:10-120).  A graph walk needs random access
# to neighbors and so does not distribute; the two standard distributed
# substitutes are hash buckets (lsh_ann_topk above) and learned cells
# (this).  IVF usually beats LSH on recall-per-candidate because cells
# follow the data distribution instead of random hyperplanes.
# ---------------------------------------------------------------------------


def _probe_cells(
    query_vec: list[float], centroids: list[list[float]], nprobe: int
) -> list[int]:
    """Driver-side probe selection: indices of the ``nprobe`` centroids
    nearest the query, ties broken by cell index.  The left-to-right
    fold order MUST stay bit-for-bit identical to ``_sqdist_to`` — the
    exact-copy-in-first-probe-cell determinism guarantee of both IVF
    search paths depends on driver and executor computing the same
    nearest cell."""
    dists = []
    for i, c in enumerate(centroids):
        s = 0.0
        for x, y in zip(query_vec, c):
            s = s + (float(x) - float(y)) * (float(x) - float(y))
        dists.append((s, i))
    return [i for _, i in sorted(dists)[: max(1, int(nprobe))]]


def _sqdist_to(vec_col, centroid: list[float]):
    """Squared L2 distance to a literal centroid — JVM-side fold, one
    term per dimension, left-to-right (the same IEEE-double sequence a
    Python loop produces, so driver-side query/centroid math matches
    exactly)."""
    carr = F.array(*[F.lit(float(x)) for x in centroid])
    return F.aggregate(
        F.zip_with(
            vec_col,
            carr,
            lambda x, c: (x.cast("double") - c) * (x.cast("double") - c),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _nearest_list(vec_col, centroids: list[list[float]]):
    """0-based index of the nearest centroid; ties break to the LOWEST
    index (array_position returns the first exact match of the min)."""
    d = F.array(*[_sqdist_to(vec_col, c) for c in centroids])
    return (F.array_position(d, F.array_min(d)) - 1).cast("int")


def ivf_train(
    df: DataFrame,
    k_lists: int = 16,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    iters: int = 5,
    sample_size: int | None = None,
) -> list[list[float]]:
    """Deterministic Lloyd k-means: returns `k_lists` centroids
    (driver-side list — k×dim doubles, small by construction).

    * init: the `k_lists` rows with smallest xxhash64(id) — a seedless,
      engine-reproducible sample (TakeOrdered, no shuffle);
    * each iteration: assign via the broadcast-literal argmin
      expression, recompute means with ONE posexplode + hash aggregate
      (map-side combinable — per-reducer state is k_lists × dim sums);
      an emptied cell keeps its previous centroid;
    * `sample_size`: at 10^12 rows training must not scan the corpus
      per iteration — pass e.g. 1_000_000 and the same xxhash64 order
      statistic picks a deterministic training subset; assignment of
      the full corpus happens once, in ivf_assign.
    """
    vecs = df.select(
        F.col(id_col).alias("_id"),
        F.col(vec_col).cast("array<double>").alias("_v"),
    ).where(F.col(vec_col).isNotNull())
    persisted = None
    if sample_size is not None:
        # persist the sample: the lazy TakeOrdered plan would otherwise
        # re-run the full-corpus sort once per k-means iteration (plus
        # init), defeating the whole point of sampling at 10^12 rows
        vecs = (
            vecs.orderBy(F.xxhash64("_id"), F.col("_id"))
            .limit(int(sample_size))
            .persist()
        )
        persisted = vecs
    try:
        init = (
            vecs.orderBy(F.xxhash64("_id"), F.col("_id"))
            .limit(int(k_lists))
            .collect()
        )
        centroids = [list(r["_v"]) for r in init]
        if not centroids:
            raise ValueError("ivf_train: empty input")
        for _ in range(int(iters)):
            assigned = vecs.select(
                _nearest_list(F.col("_v"), centroids).alias("_list"), "_v"
            )
            sums = (
                assigned.select(
                    "_list", F.posexplode("_v").alias("_pos", "_x")
                )
                .groupBy("_list", "_pos")
                .agg(F.sum("_x").alias("_s"), F.count("*").alias("_n"))
                .collect()
            )
            by_list: dict[int, dict[int, tuple[float, int]]] = {}
            for r in sums:
                by_list.setdefault(r["_list"], {})[r["_pos"]] = (
                    r["_s"],
                    r["_n"],
                )
            new = []
            for i, old in enumerate(centroids):
                cell = by_list.get(i)
                if not cell:
                    new.append(old)  # emptied cell: keep the previous mean
                else:
                    new.append(
                        [cell[j][0] / cell[j][1] for j in range(len(old))]
                    )
            centroids = new
    finally:
        if persisted is not None:
            persisted.unpersist()
    return centroids


# Above this many cells the literal-expression k-means (k×dim literals
# in ONE Catalyst expression + a k×dim driver collect per iteration)
# stops being reasonable; ivf_index_build switches to the DataFrame
# path.  128×64 ≈ 8k literals compiles in ms; 4096×64 ≈ 262k does not.
LITERAL_KMEANS_MAX = 128


def _sqdist_cols(a, b):
    """Squared L2 between two array columns — same left-to-right
    zip_with fold as ``_sqdist_to``, so literal-centroid and
    DataFrame-centroid assignment compute bit-identical distances."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, c: (x - c) * (x - c)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def ivf_train_df(
    df: DataFrame,
    k_lists: int,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    iters: int = 5,
    sample_size: int | None = None,
) -> DataFrame:
    """Fully-distributed Lloyd k-means: centroids live in a DataFrame
    ``(list_id INT, centroid ARRAY<DOUBLE>)`` for the whole training
    loop — NOTHING is collected to the driver, per iteration or at the
    end.  This is the large-``k_lists`` path: the literal-expression
    ``ivf_train`` builds a k×dim-literal argmin expression and collects
    k×dim sums per iteration, both fine at k<=~128 but a
    Catalyst-compile and driver bottleneck at the 10^12-row playbook's
    k_lists ≈ N / target_cell_size (thousands to millions of cells).

    * init: the k smallest-xxhash64 rows (TakeOrdered over the corpus,
      then a row_number over just those k rows), matching ivf_train's
      deterministic seedless sample;
    * assign: crossJoin(vecs × centroids) + min_by over
      (distance, list_id) — the same left-to-right double fold as the
      literal path, ties to the lowest cell; N×k pairs, fully
      distributed, map-side only after the centroid broadcast (AQE
      broadcasts the k-row side);
    * update: posexplode + hash aggregate per (cell, dim) — k×dim rows,
      map-side combinable — reassembled into arrays; emptied cells keep
      their previous centroid via a right join;
    * lineage is cut per iteration with localCheckpoint (eager), the
      standard iterative-algorithm hygiene (same as
      connected_components) — without it the plan doubles each round.

    FP note vs ivf_train: per-pair distances are bit-identical, but the
    per-cell mean sums in executor-hash-aggregate order instead of the
    driver dict's, so centroids can differ by ~1 ulp; tests compare
    with tolerance.
    """
    vecs = df.select(
        F.col(id_col).alias("_id"),
        F.col(vec_col).cast("array<double>").alias("_v"),
    ).where(F.col(vec_col).isNotNull())
    if sample_size is not None:
        vecs = (
            vecs.orderBy(F.xxhash64("_id"), F.col("_id"))
            .limit(int(sample_size))
        )
    vecs = vecs.localCheckpoint(eager=True)
    from pyspark.sql.window import Window as _W

    init = vecs.orderBy(F.xxhash64("_id"), F.col("_id")).limit(int(k_lists))
    # row_number over the k init rows only (tiny single partition)
    centroids = init.select(
        (
            F.row_number().over(
                _W.orderBy(F.xxhash64("_id"), F.col("_id"))
            )
            - 1
        ).alias("list_id"),
        F.col("_v").alias("centroid"),
    ).localCheckpoint(eager=True)
    for _ in range(int(iters)):
        pairs = vecs.crossJoin(F.broadcast(centroids))
        d = _sqdist_cols(F.col("_v"), F.col("centroid"))
        assigned = (
            pairs.groupBy("_id")
            .agg(
                F.min(
                    F.struct(
                        d.alias("_d"), F.col("list_id").alias("_l")
                    )
                ).alias("_best"),
                F.first("_v").alias("_v"),
            )
            .select(
                F.col("_best._l").alias("list_id"), F.col("_v")
            )
        )
        sums = (
            assigned.select(
                "list_id", F.posexplode("_v").alias("_pos", "_x")
            )
            .groupBy("list_id", "_pos")
            .agg(F.sum("_x").alias("_s"), F.count("*").alias("_n"))
        )
        means = (
            sums.groupBy("list_id")
            .agg(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.struct(
                                F.col("_pos"), (F.col("_s") / F.col("_n")).alias("_m")
                            )
                        )
                    ),
                    lambda s: s["_m"],
                ).alias("_new")
            )
        )
        nxt = (
            centroids.join(means, "list_id", "left")
            .select(
                "list_id",
                F.coalesce(F.col("_new"), F.col("centroid")).alias(
                    "centroid"
                ),
            )
            .localCheckpoint(eager=True)
        )
        centroids = nxt
    return centroids


def ivf_assign_df(
    df: DataFrame,
    centroids: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    list_col: str = "list_id",
) -> DataFrame:
    """DataFrame-centroids twin of ivf_assign: nearest cell via the
    broadcast crossJoin argmin (ties to the lowest cell).  One pass
    over the corpus; at scale write the result partitionBy(list_col)."""
    cen = F.broadcast(
        centroids.select(
            F.col("list_id").alias("_cl"), F.col("centroid").alias("_cc")
        )
    )
    pairs = df.withColumn(
        "_vd", F.col(vec_col).cast("array<double>")
    ).crossJoin(cen)
    d = _sqdist_cols(F.col("_vd"), F.col("_cc"))
    best = (
        pairs.groupBy(id_col)
        .agg(
            F.min(
                F.struct(d.alias("_d"), F.col("_cl").alias("_l"))
            ).alias("_best"),
            *[
                F.first(c).alias(c)
                for c in df.columns
                if c != id_col
            ],
        )
        .select(*df.columns, F.col("_best._l").alias(list_col))
    )
    return best


def ivf_assign(
    df: DataFrame,
    centroids: list[list[float]],
    vec_col: str = "embedding",
    list_col: str = "list_id",
) -> DataFrame:
    """Adds `list_col` = index of the nearest centroid.  At scale this
    is the one full pass over the corpus; write the result
    ``partitionBy(list_col)`` so ivf_ann_topk probes become partition-
    pruned file reads (nprobe directories), never a scan or shuffle."""
    return df.withColumn(
        list_col,
        _nearest_list(F.col(vec_col).cast("array<double>"), centroids),
    )


def ivf_ann_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    centroids: list[list[float]] | None = None,
    k_lists: int = 16,
    nprobe: int = 4,
    iters: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    sample_size: int | None = None,
) -> DataFrame:
    """Approximate top-k via IVF cell probing: assign the corpus to
    `k_lists` k-means cells, probe the `nprobe` cells nearest the
    query, re-rank candidates with exact cosine.

    Determinism: training init and tie-breaks are hash-ordered (no
    RNG); the query→centroid distances are computed driver-side with
    the same left-to-right double arithmetic as the corpus-side
    expression, so an exact copy of the query vector is ALWAYS assigned
    to the query's first probe cell — identical vectors are found with
    certainty, like lsh_ann_topk's same-signature guarantee.

    Scale shape (10^12 rows): train on a hash `sample_size` (one small
    TakeOrdered + `iters` sampled passes), assign once with ivf_assign
    and persist partitioned by cell, then each query reads nprobe
    cells of ~N/k_lists rows.  Recall/cost dial: raise `k_lists` to
    hold cell size constant (k_lists ≈ N / target_cell_size) and buy
    recall back with `nprobe` — same playbook as lsh_ann_topk's
    planes/tables, but cells track the data distribution, so a SINGLE
    probe is already useful (measured on 100k clustered vectors,
    scripts/ann_recall_bench.py --ivf: recall@10 = 0.82 examining 1.6%
    at k_lists=64 nprobe=1 — one partition-pruned directory read, no
    multi-table union; 0.96 at ~13% with nprobe=8; 0.99 at 25% with
    k_lists=16 nprobe=4.  LSH's best = 0.98 at 16% but needs 8 tables,
    i.e. 8× the stored index)."""
    if centroids is None:
        centroids = ivf_train(
            df, k_lists, vec_col, id_col, iters, sample_size
        )
    probes = _probe_cells(query_vec, centroids, nprobe)
    assigned = ivf_assign(df, centroids, vec_col, "_ivf_list")
    cand = assigned.where(F.col("_ivf_list").isin(probes)).select(
        *df.columns
    )
    return cosine_topk(cand, query_vec, k, vec_col, id_col)


def ivf_index_build(
    df: DataFrame,
    out_dir: str,
    k_lists: int = 16,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    iters: int = 5,
    sample_size: int | None = None,
    centroids: list[list[float]] | None = None,
) -> list[list[float]]:
    """Persist an IVF index: the corpus written ``partitionBy(list_id)``
    (one directory per cell) plus a ``centroids.json`` sidecar.  This is
    the 10^12-row layout ivf_ann_topk's docstring promises: train once
    (optionally on a hash sample), assign once, and every later query
    reads only its nprobe cell directories — Spark's partition pruning
    turns the probe into a file-list operation, no scan and no shuffle.
    Returns the centroids (also saved in the sidecar).

    Routing: k_lists <= LITERAL_KMEANS_MAX uses the literal-expression
    trainer/assigner (fewer jobs, no crossJoin); above it, training and
    assignment stay fully distributed (ivf_train_df / ivf_assign_df —
    centroids never hit the driver during iterations) and only the
    FINAL centroids are collected once for the probe sidecar (k×dim
    doubles, e.g. 2 MB at 4096×64)."""
    import json
    import os

    if centroids is None:
        if int(k_lists) <= LITERAL_KMEANS_MAX:
            centroids = ivf_train(
                df, k_lists, vec_col, id_col, iters, sample_size
            )
        else:
            cdf = ivf_train_df(
                df, k_lists, vec_col, id_col, iters, sample_size
            )
            (
                ivf_assign_df(df, cdf, vec_col, id_col, "list_id")
                .write.mode("overwrite")
                .partitionBy("list_id")
                .parquet(os.path.join(out_dir, "cells"))
            )
            rows = cdf.orderBy("list_id").collect()  # once, for probes
            centroids = [list(r["centroid"]) for r in rows]
            with open(os.path.join(out_dir, "centroids.json"), "w") as f:
                json.dump(centroids, f)
            return centroids
    (
        ivf_assign(df, centroids, vec_col, "list_id")
        .write.mode("overwrite")
        .partitionBy("list_id")
        .parquet(os.path.join(out_dir, "cells"))
    )
    with open(os.path.join(out_dir, "centroids.json"), "w") as f:
        json.dump(centroids, f)
    return centroids


def ivf_index_search(
    spark,
    index_dir: str,
    query_vec: list[float],
    k: int = 10,
    nprobe: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Top-k over a persisted IVF index.  Probe cells are chosen
    driver-side from the sidecar centroids (same double arithmetic as
    ivf_ann_topk), then ``list_id IN (probes)`` on the cell-partitioned
    parquet prunes the read to nprobe directories — verify with
    ``.inputFiles()`` or the PartitionFilters line in ``.explain()``."""
    import json
    import os

    with open(os.path.join(index_dir, "centroids.json")) as f:
        centroids = json.load(f)
    probes = _probe_cells(query_vec, centroids, nprobe)
    cells = spark.read.parquet(os.path.join(index_dir, "cells"))
    cand = cells.where(F.col("list_id").isin(probes))
    return cosine_topk(cand, query_vec, k, vec_col, id_col)


def _kmeans_np(
    df: DataFrame,
    k: int,
    iters: int,
    vec_col: str,
    id_col: str,
    sample_size: int | None,
) -> list[list[float]]:
    """Driver-side numpy Lloyd over a deterministic hash-ordered
    sample (the same xxhash64 order statistic as ivf_train, the same
    bounded-sample playbook as pca_train/bpe_train): collect <=
    sample_size rows once, run k-means in BLAS.  At 50k x 64 x k=512
    this is ~3 GFLOP — milliseconds, where the interpreted-fold
    crossJoin trainer needs minutes.  Ties (argmin) break to the
    lowest cell index, matching _nearest_list/_sqdist_cols."""
    import numpy as np

    vecs = df.select(
        F.col(id_col).alias("_id"),
        F.col(vec_col).cast("array<double>").alias("_v"),
    ).where(F.col(vec_col).isNotNull())
    # sample_size=None caps training at 1M rows (unlike the fold-path
    # ivf_train, which trains on the full input) — the cap bounds
    # driver memory; pass an explicit sample_size to change it
    # (ADVICE r6: the divergence between the two trainers is now
    # documented and short samples warn instead of silently returning
    # fewer centroids)
    cap = int(sample_size) if sample_size is not None else 1_000_000
    rows = (
        vecs.orderBy(F.xxhash64("_id"), F.col("_id")).limit(cap).collect()
    )
    if not rows:
        raise ValueError("semantic_dedup: empty input")
    if len(rows) < int(k):
        import warnings

        warnings.warn(
            f"_kmeans_np: only {len(rows)} training rows for k={k}; "
            f"returning {len(rows)} centroids",
            RuntimeWarning,
            stacklevel=2,
        )
    x = np.array([list(r["_v"]) for r in rows], dtype=np.float64)
    cents = x[: int(k)].copy()
    x2 = (x * x).sum(axis=1)
    for _ in range(int(iters)):
        d = (
            x2[:, None]
            - 2.0 * (x @ cents.T)
            + (cents * cents).sum(axis=1)[None, :]
        )
        assign = d.argmin(axis=1)
        for c in range(cents.shape[0]):
            members = x[assign == c]
            if len(members):
                cents[c] = members.mean(axis=0)
    return [[float(v) for v in c] for c in cents]


def semantic_dedup(
    df: DataFrame,
    eps: float = 0.95,
    k_lists: int = 16,
    iters: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    centroids: list[list[float]] | None = None,
    sample_size: int | None = None,
    keep: str = "far",
    max_cluster_rank: int | None = None,
    warn_on_overflow: bool = True,
    kernel: str = "arrow",
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic
    deduplication by k-means clustering + within-cluster pairwise
    cosine.  A document is DROPPED when some document ranked before it
    in its cluster has cosine similarity >= ``eps`` — the paper's
    upper-triangular rule, which needs only pairwise sims against
    predecessors, never a sequential greedy pass, so it distributes.

    Ranking inside a cluster (``keep``):
      * ``"far"`` (paper default): ascending cosine-to-centroid — the
        LEAST prototypical member of a duplicate group survives, which
        the paper found preserves diversity;
      * ``"near"``: descending — keep the most prototypical.
    Ties (exact copies share a centroid-cosine bit-for-bit) break by
    ascending id, so the decision is deterministic across runs,
    partitionings, and engines.

    Returns one row per non-zero-norm input row:
    ``(id, list_id, rank, max_prior_sim DOUBLE?, kept BOOLEAN)`` —
    ``max_prior_sim`` is NULL for a cluster's first-ranked row.  The
    full per-row signal is returned (not just survivors) so callers
    can audit the eps margin before committing to a drop.

    Scale shape (10^12 rows): one assignment pass (broadcast-argmin,
    ``ivf_assign_df``), one window + one self-join both keyed on
    ``list_id``, one hash aggregate keyed on id.  Per-cluster work is
    O(c^2) with c ~= N / k_lists, so k_lists must scale with N
    (k_lists ~= N / target_cell_size, same playbook as IVF) — that
    also keeps the join-key cardinality high enough to spread.  For
    skewed clusterings ``max_cluster_rank`` caps the predecessor side
    of the pair join (rows ranked beyond it are still *checked*
    against the first ``max_cluster_rank`` predecessors but never
    serve as predecessors themselves — a recall cap on detectable
    duplicate pairs, NOT a correctness change for the capped prefix);
    overflowing clusters raise a RuntimeWarning unless
    ``warn_on_overflow=False``.  Zero-norm vectors are excluded
    (cosine undefined), matching cosine_near_pairs.

    ``kernel`` picks the inner math:
      * ``"arrow"`` (default): numpy/BLAS — driver-sample k-means
        (``_kmeans_np``), a mapInPandas argmin assignment, and a
        per-cell applyInPandas blockwise matmul for the predecessor
        maxima (per-group state = one cell's c x dim matrix — the
        same bounded-cell contract as the pair join).  Measured ~50x
        faster than the fold path at 200k x 64 / k=512 (BENCH.md);
        values can differ from the fold path by ulps (SIMD/FMA
        reassociation), which flips a decision only when a pair sits
        within fp error of ``eps``.
      * ``"fold"``: pure column expressions whose left-to-right
        zip_with folds are BIT-IDENTICAL to the external oracle's SQL
        replay — the driver correctness row runs this path; pytest
        pins arrow == fold decisions on clustered test data.
    """
    import warnings

    if keep not in ("far", "near"):
        raise ValueError(f"semantic_dedup: keep must be 'far'|'near', got {keep!r}")
    if kernel not in ("arrow", "fold"):
        raise ValueError(f"semantic_dedup: kernel must be 'arrow'|'fold', got {kernel!r}")
    vecs = df.select(
        F.col(id_col),
        F.col(vec_col).cast("array<double>").alias("_v"),
    ).where(_norm(F.col(vec_col)) > 0)
    spark = df.sparkSession
    from pyspark.sql.window import Window

    if kernel == "arrow":
        import numpy as np
        import pandas as pd

        if centroids is None:
            centroids = _kmeans_np(
                vecs, k_lists, iters, "_v", id_col, sample_size
            )
        C = np.array([list(c) for c in centroids], dtype=np.float64)
        c2 = (C * C).sum(axis=1)
        cn = np.sqrt(c2)

        def assign_batches(batches):
            for b in batches:
                if not len(b):
                    continue
                X = np.array(b["_v"].tolist(), dtype=np.float64)
                x2 = (X * X).sum(axis=1)
                G = X @ C.T
                D = x2[:, None] - 2.0 * G + c2[None, :]
                a = D.argmin(axis=1)  # first min = lowest cell, the tie rule
                ccos = G[np.arange(len(a)), a] / (np.sqrt(x2) * cn[a])
                yield pd.DataFrame(
                    {
                        id_col: b[id_col],
                        "list_id": a.astype("int32"),
                        "_ccos": ccos,
                        "_v": b["_v"],
                    }
                )

        id_ddl = vecs.schema[id_col].dataType.simpleString()
        with_cos = vecs.mapInPandas(
            assign_batches,
            f"{id_col} {id_ddl}, list_id INT, _ccos DOUBLE, _v ARRAY<DOUBLE>",
        )
    else:
        if centroids is None:
            if int(k_lists) <= LITERAL_KMEANS_MAX:
                centroids = ivf_train(
                    vecs, k_lists, "_v", id_col, iters, sample_size
                )
                cdf = None
            else:
                cdf = ivf_train_df(
                    vecs, k_lists, "_v", id_col, iters, sample_size
                )
        else:
            cdf = None
        if cdf is None:
            cdf = spark.createDataFrame(
                [(i, [float(x) for x in c]) for i, c in enumerate(centroids)],
                "list_id INT, centroid ARRAY<DOUBLE>",
            )
        assigned = ivf_assign_df(vecs, cdf, "_v", id_col, "list_id")
        ccos = _dot(F.col("_v"), F.col("centroid")) / (
            _norm(F.col("_v")) * _norm(F.col("centroid"))
        )
        with_cos = (
            assigned.join(F.broadcast(cdf), "list_id")
            .select(id_col, "list_id", "_v", ccos.alias("_ccos"))
        )
    order = (
        [F.col("_ccos").asc(), F.col(id_col).asc()]
        if keep == "far"
        else [F.col("_ccos").desc(), F.col(id_col).asc()]
    )
    # localCheckpoint: the pair stage consumes ranked on BOTH sides
    # (fold) or needs a stable shuffled input (arrow), and Catalyst
    # does not reuse the assignment+window subtree across self-join
    # aliases — without the cut the corpus would be assigned and
    # ranked twice (verified in PLANS.md)
    ranked = with_cos.select(
        id_col,
        "list_id",
        "_v",
        _norm(F.col("_v")).alias("_nrm"),
        F.row_number()
        .over(Window.partitionBy("list_id").orderBy(*order))
        .alias("rank"),
    ).localCheckpoint()
    if max_cluster_rank is not None and warn_on_overflow:
        over = (
            ranked.where(F.col("rank") > int(max_cluster_rank))
            .agg(
                F.countDistinct("list_id").alias("clusters"),
                F.count("*").alias("rows"),
            )
            .first()
        )
        if int(over["clusters"] or 0) > 0:
            warnings.warn(
                f"semantic_dedup: {over['clusters']} cluster(s) exceed "
                f"max_cluster_rank={max_cluster_rank} ({over['rows']} rows "
                "beyond the cap); those rows cannot be detected as "
                "predecessors of later duplicates. Raise k_lists so cells "
                "stay under the cap, or raise/disable max_cluster_rank.",
                RuntimeWarning,
                stacklevel=2,
            )
    if kernel == "arrow":
        import numpy as np
        import pandas as pd

        cap_rank = int(max_cluster_rank) if max_cluster_rank else None

        def cell_prior(pdf):
            pdf = pdf.sort_values("rank")
            n = len(pdf)
            X = np.array(pdf["_v"].tolist(), dtype=np.float64)
            N = X / np.linalg.norm(X, axis=1, keepdims=True)
            p = n if cap_rank is None else min(cap_rank, n)
            pred = N[:p]
            out: list = [None] * n
            B = 2048
            for s in range(1, n, B):
                e = min(s + B, n)
                G = pred @ N[s:e].T
                for ci in range(e - s):
                    m = min(s + ci, pred.shape[0])
                    if m > 0:
                        out[s + ci] = float(G[:m, ci].max())
            return pd.DataFrame(
                {id_col: pdf[id_col], "max_prior_sim": out}
            )

        # the per-cell matmul is CPU-bound (BLAS over every ranked
        # vector), so pin the exchange at the configured shuffle width
        # instead of letting byte-based AQE coalescing fold ~MBs of
        # vectors onto one task (cells are many — hash spreads them)
        cells_cap = int(
            ranked.sparkSession.conf.get("spark.sql.shuffle.partitions", "32")
        )
        id_ddl = ranked.schema[id_col].dataType.simpleString()
        prior = (
            ranked.select(id_col, "list_id", "_v", "rank")
            .repartition(cells_cap, "list_id")
            .groupBy("list_id")
            .applyInPandas(
                cell_prior, f"{id_col} {id_ddl}, max_prior_sim DOUBLE"
            )
        )
    else:
        left = ranked.alias("l")
        right = ranked.alias("r")
        pred = F.col("l.rank") < F.col("r.rank")
        if max_cluster_rank is not None:
            pred = pred & (F.col("l.rank") <= int(max_cluster_rank))
        sim = _dot(F.col("l._v"), F.col("r._v")) / (
            F.col("l._nrm") * F.col("r._nrm")
        )
        prior = (
            left.join(right, (F.col("l.list_id") == F.col("r.list_id")) & pred)
            .groupBy(F.col(f"r.{id_col}").alias(id_col))
            .agg(F.max(sim).alias("max_prior_sim"))
        )
    return (
        ranked.join(prior, id_col, "left")
        .select(
            id_col,
            "list_id",
            "rank",
            "max_prior_sim",
            (
                F.col("max_prior_sim").isNull()
                | (F.col("max_prior_sim") < F.lit(float(eps)))
            ).alias("kept"),
        )
    )
