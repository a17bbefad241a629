"""Product quantization (PQ) — the canonical billion-vector ANN
compression (Jégou, Douze, Schmid, "Product Quantization for Nearest
Neighbor Search", TPAMI 2011).

A dim-d vector is split into ``m`` contiguous subvectors; each
subspace gets its own k-means codebook of ``n_codes`` centroids, and a
vector is stored as ``m`` small codes (one byte each at n_codes=256) —
a 64-dim float32 embedding compresses 256 B → 8 B (32×).  Queries
score compressed vectors WITHOUT decompressing them via asymmetric
distance computation (ADC): precompute a lookup table
``lut[sub][code] = <query_sub, centroid[sub][code]>`` (m × n_codes
dots, driver-side, microseconds), then a vector's approximate inner
product is just ``sum_j lut[j][codes[j]]`` — m array lookups per
candidate, no float vector touched.

Spark shape (the 100-TB check):
* training runs ONE distributed Lloyd loop over all m subspaces at
  once — subvectors are exploded to (sub_id, subvec) rows and the
  codebook lives in a DataFrame keyed (sub_id, code), same pattern as
  ``ivf_train_df``: broadcast-join assign, hash-aggregate update,
  localCheckpoint per iteration, nothing collected until the final
  (m × n_codes)-row codebook (bounded: 2048 rows at m=8);
* encoding is a broadcast join + min_by argmin per (vector, subspace)
  — map-side after the codebook broadcast, one shuffle to reassemble
  the m codes into an array per vector;
* ADC scoring is a pure column expression over the codes array
  (zip_with against an m × n_codes literal LUT, whole-stage-codegen'd)
  followed by TakeOrderedAndProject — ONE scan of the (tiny) codes
  table, no shuffle;
* optional exact re-rank (``refine``) joins only the top candidates
  back to the full vectors — the standard PQ + refine pipeline.

ADC approximates the INNER PRODUCT; for cosine search, L2-normalize
the corpus and query first (planted-cluster recall measured in
tests/test_pq.py; scripts/pq_recall_bench.py sweeps m).  Compose with
IVF for the full IVF-PQ layout: ``ivf_assign`` partitions, PQ
compresses within cells.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _subspaces(vec_col, dim: int, m: int):
    """ARRAY of m contiguous subvectors (1-based F.slice)."""
    d_sub = dim // m
    return F.array(
        *[F.slice(vec_col, j * d_sub + 1, d_sub) for j in range(m)]
    )


def _check_dims(dim: int, m: int) -> None:
    if dim % m != 0:
        raise ValueError(f"pq: dim {dim} not divisible by m {m}")


def _vec_dim(df: DataFrame, vec_col: str) -> int:
    row = df.select(F.size(vec_col).alias("d")).first()
    if row is None or row["d"] is None:
        raise ValueError("pq: empty input or NULL vectors")
    return int(row["d"])


def pq_train(
    df: DataFrame,
    m: int = 8,
    n_codes: int = 256,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    iters: int = 5,
    sample_size: int | None = 20_000,
) -> DataFrame:
    """Train per-subspace codebooks; returns a DataFrame
    ``(sub_id INT, code INT, centroid ARRAY<DOUBLE>)`` — m × n_codes
    rows.  Deterministic: init codes are the n_codes smallest-xxhash64
    sample rows per subspace (same hash-sample convention as
    ivf_train), and every reduction is an order-insensitive hash
    aggregate."""
    spark = df.sparkSession
    dim = _vec_dim(df, vec_col)
    _check_dims(dim, m)

    vecs = df.select(
        F.col(id_col).alias("_id"),
        F.col(vec_col).cast("array<double>").alias("_v"),
    ).where(F.col(vec_col).isNotNull())
    if sample_size is not None:
        vecs = vecs.orderBy(F.xxhash64("_id"), F.col("_id")).limit(
            int(sample_size)
        )
    subs = vecs.select(
        "_id",
        F.posexplode(_subspaces(F.col("_v"), dim, m)).alias("sub_id", "_sv"),
    ).localCheckpoint(eager=True)

    from pyspark.sql.window import Window as _W

    # init: the n_codes smallest-hash sample rows, per subspace (the
    # hash order is id-based, so every subspace seeds from the same
    # sample rows — deterministic under any partitioning)
    init_w = _W.partitionBy("sub_id").orderBy(F.xxhash64("_id"), F.col("_id"))
    codebook = (
        subs.withColumn("_r", F.row_number().over(init_w))
        .where(F.col("_r") <= int(n_codes))
        .select(
            "sub_id", (F.col("_r") - 1).alias("code"),
            F.col("_sv").alias("centroid"),
        )
        .localCheckpoint(eager=True)
    )

    sqd = F.aggregate(
        F.zip_with(
            F.col("_sv"), F.col("centroid"), lambda a, b: (a - b) * (a - b)
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    for _ in range(int(iters)):
        assigned = (
            subs.join(F.broadcast(codebook), "sub_id")
            .groupBy("_id", "sub_id")
            .agg(
                F.min(
                    F.struct(sqd.alias("_d"), F.col("code").alias("_c"))
                ).alias("_best"),
                F.first("_sv").alias("_sv"),
            )
            .select("sub_id", F.col("_best._c").alias("code"), "_sv")
        )
        sums = (
            assigned.select(
                "sub_id", "code", F.posexplode("_sv").alias("_pos", "_x")
            )
            .groupBy("sub_id", "code", "_pos")
            .agg(F.sum("_x").alias("_s"), F.count("*").alias("_n"))
        )
        means = sums.groupBy("sub_id", "code").agg(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.struct(
                            F.col("_pos"),
                            (F.col("_s") / F.col("_n")).alias("_m"),
                        )
                    )
                ),
                lambda s: s["_m"],
            ).alias("_new")
        )
        codebook = (
            codebook.join(means, ["sub_id", "code"], "left")
            .select(
                "sub_id", "code",
                F.coalesce(F.col("_new"), F.col("centroid")).alias("centroid"),
            )
            .localCheckpoint(eager=True)
        )
    return codebook


def pq_encode(
    df: DataFrame,
    codebook: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """(id, codes ARRAY<INT>) — per-subspace argmin against the
    codebook; codes[j] is subspace j's nearest centroid (ties to the
    lowest code, matching the trainer's assign)."""
    dim = _vec_dim(df, vec_col)
    m = codebook.agg(F.max("sub_id")).first()[0]
    if m is None:
        raise ValueError("pq_encode: empty codebook")
    m = int(m) + 1
    _check_dims(dim, m)
    subs = df.select(
        F.col(id_col),
        F.posexplode(
            _subspaces(F.col(vec_col).cast("array<double>"), dim, m)
        ).alias("sub_id", "_sv"),
    )
    sqd = F.aggregate(
        F.zip_with(
            F.col("_sv"), F.col("centroid"), lambda a, b: (a - b) * (a - b)
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    per_sub = (
        subs.join(F.broadcast(codebook), "sub_id")
        .groupBy(id_col, "sub_id")
        .agg(
            F.min(
                F.struct(sqd.alias("_d"), F.col("code").alias("_c"))
            ).alias("_best")
        )
        .select(id_col, "sub_id", F.col("_best._c").alias("code"))
    )
    return per_sub.groupBy(id_col).agg(
        F.transform(
            F.array_sort(
                F.collect_list(F.struct(F.col("sub_id"), F.col("code")))
            ),
            lambda s: s["code"],
        ).alias("codes")
    )


def pq_lut(
    codebook_rows: list, query_vec: list[float], m: int, n_codes: int
) -> list[list[float]]:
    """lut[sub][code] = <query_sub, centroid> from COLLECTED codebook
    rows (m × n_codes — bounded; the one driver-side step of ADC)."""
    dim = len(query_vec)
    d_sub = dim // m
    lut = [[0.0] * n_codes for _ in range(m)]
    for r in codebook_rows:
        j, c = int(r["sub_id"]), int(r["code"])
        q_sub = query_vec[j * d_sub:(j + 1) * d_sub]
        lut[j][c] = float(
            sum(a * b for a, b in zip(q_sub, r["centroid"]))
        )
    return lut


def pq_topk(
    encoded: DataFrame,
    codebook: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    refine: DataFrame | None = None,
    refine_k: int | None = None,
    vec_col: str = "embedding",
) -> DataFrame:
    """ADC top-k over PQ codes: (id, score) by approximate inner
    product, ties id asc.  With ``refine`` (the original vectors),
    the top ``refine_k`` (default 4k) ADC candidates are re-ranked by
    exact cosine — returns (id, cosine) instead."""
    rows = codebook.collect()  # m × n_codes, bounded
    if not rows:
        raise ValueError("pq_topk: empty codebook")
    m = max(int(r["sub_id"]) for r in rows) + 1
    n_codes = max(int(r["code"]) for r in rows) + 1
    lut = pq_lut(rows, [float(x) for x in query_vec], m, n_codes)
    lut_lit = F.array(
        *[F.array(*[F.lit(v) for v in sub]) for sub in lut]
    )
    score = F.aggregate(
        F.zip_with(
            F.col("codes"),
            lut_lit,
            lambda c, sub_lut: F.element_at(sub_lut, c.cast("int") + 1),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    adc = encoded.select(F.col(id_col), score.alias("score"))
    if refine is None:
        return adc.orderBy(F.col("score").desc(), F.col(id_col).asc()).limit(k)
    cand = adc.orderBy(F.col("score").desc(), F.col(id_col).asc()).limit(
        int(refine_k or 4 * k)
    )
    from searchlite_spark.textops.similarity import cosine_topk

    pool = refine.join(cand.select(id_col), id_col, "left_semi")
    return cosine_topk(pool, query_vec, k=k, vec_col=vec_col, id_col=id_col)


def pq_index_build(
    df: DataFrame,
    out_dir: str,
    m: int = 8,
    n_codes: int = 256,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    iters: int = 5,
    sample_size: int | None = 20_000,
) -> None:
    """Persist the PQ layout: ``codebook/`` (m × n_codes rows) and
    ``codes/`` (one m-byte-equivalent row per vector) as parquet —
    32× smaller than the float32 vectors they stand in for, and
    directly replayable by any SQL engine (the driver oracle reads
    both tables and recomputes ADC end-to-end)."""
    cb = pq_train(
        df, m=m, n_codes=n_codes, vec_col=vec_col, id_col=id_col,
        iters=iters, sample_size=sample_size,
    )
    cb.write.mode("overwrite").parquet(f"{out_dir}/codebook")
    spark = df.sparkSession
    cb_disk = spark.read.parquet(f"{out_dir}/codebook")
    pq_encode(df, cb_disk, vec_col=vec_col, id_col=id_col).write.mode(
        "overwrite"
    ).parquet(f"{out_dir}/codes")


def pq_index_search(
    spark,
    index_dir: str,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
) -> DataFrame:
    """ADC top-k against a persisted PQ index."""
    cb = spark.read.parquet(f"{index_dir}/codebook")
    codes = spark.read.parquet(f"{index_dir}/codes")
    return pq_topk(codes, cb, query_vec, k=k, id_col=id_col)
