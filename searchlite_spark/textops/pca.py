"""PCA dimensionality reduction for embedding columns (Pearson 1901 /
the standard truncated eigendecomposition; the classic pre-step for
SemDeDup-style clustering and cheaper ANN over 10^12-row corpora).

Scale split, same shape as the BPE trainer: the ONLY corpus-scale work
is one pass accumulating per-partition first/second moments (an Arrow
kernel holding a dim-vector and a dim x dim matrix per partition — for
dim=1024 that is 8 MB, independent of row count); the driver sums
<= num_partitions such blocks and eigendecomposes the dim x dim
covariance with numpy (dim <= a few thousand by assumption — beyond
that you shard the feature axis, out of scope here).  Projection is a
pure JVM column expression (zip_with/aggregate folds, no UDF), so it
codegens and the oracle can replay it bit-for-bit.

Float caveat (documented, pytest-scoped): moment sums accumulate in
partition order, so centroids/eigenvectors can move by ulps across
partitionings.  Train once, PERSIST mean+components, and treat the
artifact as the source of truth — the driver oracle replays projection
from the persisted artifact, and numpy parity is pinned in tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def pca_train(
    df: DataFrame,
    k: int,
    vec_col: str = "embedding",
    sample_size: int | None = None,
    id_col: str = "vec_id",
) -> dict:
    """Train a k-component PCA: returns ``{"mean": [dim], "components":
    [k][dim], "explained_variance": [k]}``.

    * one ``mapInArrow`` pass yields per-partition ``(n, sum, outer)``
      moment blocks; the driver sums them and eigendecomposes the
      covariance (``numpy.linalg.eigh`` — symmetric, deterministic);
    * components are the top-k eigenvectors, each sign-normalized so
      its largest-|coordinate| entry is positive (eigh's sign is
      arbitrary; this pins it);
    * ``sample_size``: the xxhash64 order statistic picks a
      deterministic training subset (the ivf_train convention) so a
      10^12-row corpus trains on a bounded sample in one TakeOrdered.
    """
    import numpy as np
    import pyarrow as pa

    vecs = df.select(
        F.col(id_col).alias("_id"),
        F.col(vec_col).cast("array<double>").alias("_v"),
    ).where(F.col(vec_col).isNotNull())
    if sample_size is not None:
        vecs = vecs.orderBy(F.xxhash64("_id"), F.col("_id")).limit(
            int(sample_size)
        )
    first = vecs.select("_v").first()
    if first is None:
        raise ValueError("pca_train: empty input")
    dim = len(first[0])
    if not (0 < int(k) <= dim):
        raise ValueError(f"pca_train: k must be in [1, dim={dim}]")

    def moments(batches):
        n = 0
        s = np.zeros(dim, dtype=np.float64)
        o = np.zeros((dim, dim), dtype=np.float64)
        for b in batches:
            col = b.column(b.schema.get_field_index("_v"))
            flat = np.asarray(col.flatten(), dtype=np.float64)
            m = flat.reshape(-1, dim)
            n += m.shape[0]
            s += m.sum(axis=0)
            o += m.T @ m
        yield pa.RecordBatch.from_pydict(
            {
                "n": pa.array([n], pa.int64()),
                "s": pa.array([s.tolist()], pa.list_(pa.float64())),
                "o": pa.array([o.reshape(-1).tolist()], pa.list_(pa.float64())),
            }
        )

    parts = vecs.mapInArrow(
        moments, "n LONG, s ARRAY<DOUBLE>, o ARRAY<DOUBLE>"
    ).collect()
    n = sum(r["n"] for r in parts)
    if n == 0:
        raise ValueError("pca_train: empty input")
    s = np.zeros(dim)
    o = np.zeros((dim, dim))
    for r in parts:
        if r["n"]:
            s += np.array(r["s"])
            o += np.array(r["o"]).reshape(dim, dim)
    mean = s / n
    cov = o / n - np.outer(mean, mean)
    evals, evecs = np.linalg.eigh(cov)  # ascending
    idx = np.argsort(evals)[::-1][: int(k)]
    comps = []
    for i in idx:
        v = evecs[:, i]
        j = int(np.argmax(np.abs(v)))
        if v[j] < 0:
            v = -v
        comps.append([float(x) for x in v])
    return {
        "mean": [float(x) for x in mean],
        "components": comps,
        "explained_variance": [float(max(evals[i], 0.0)) for i in idx],
    }


def _proj_dot(vec_col, mean: list[float], comp: list[float]):
    """dot(vec - mean, comp) as the left-to-right JVM fold — the same
    IEEE-double sequence as DuckDB's ``list_sum`` over the element
    comprehension, so persisted-artifact replay is bit-identical."""
    m = F.array(*[F.lit(float(x)) for x in mean])
    c = F.array(*[F.lit(float(x)) for x in comp])
    centered = F.zip_with(vec_col, m, lambda x, y: x - y)
    return F.aggregate(
        F.zip_with(centered, c, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def pca_project(
    df: DataFrame,
    model: dict,
    vec_col: str = "embedding",
    out_col: str = "proj",
) -> DataFrame:
    """Adds ``out_col`` = the k-dim projection ``(v - mean) @ C^T`` as
    ARRAY<DOUBLE>.  Pure column expressions (k x dim literals — fine to
    k*dim ~ 10^5, the same budget as the literal k-means); map-side
    only, no shuffle, codegens with the surrounding plan."""
    mean = model["mean"]
    comps = model["components"]
    v = F.col(vec_col).cast("array<double>")
    return df.withColumn(
        out_col, F.array(*[_proj_dot(v, mean, c) for c in comps])
    )
