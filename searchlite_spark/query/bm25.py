"""BM25 scoring — the reference formula (searchlite-core/src/query/bm25.rs:1-6):

    idf   = max(ln((N - df + 0.5) / (df + 0.5)), 0) + 1
    norm  = dl / avgdl          (1 when avgdl == 0)
    score = idf * tf * (k1 + 1) / max(tf + k1 * (1 - b + b * norm), 1e-6)

Defaults k1 = 0.9, b = 0.4 (searchlite-cli/src/main.rs:196-197).
Doc-length fallback: dl <= 0 or missing -> max(avgdl, 1)
(query/wand.rs:77-85).

Two implementations:
* a Spark Column expression (double precision, whole-stage-codegen'd)
  for the DataFrame brute-force path and SQL oracles;
* a numpy float32 kernel bit-matching the reference's f32 arithmetic
  for the WAND path and parity tests.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, functions as F

K1_DEFAULT = 0.9
B_DEFAULT = 0.4


def bm25_col(
    tf: Column,
    df: Column,
    dl: Column,
    avgdl: float,
    n_docs: int,
    k1: float = K1_DEFAULT,
    b: float = B_DEFAULT,
) -> Column:
    """Double-precision BM25 column expression (stats are literals —
    they are global scalars under single-segment semantics)."""
    idf = F.greatest(
        F.log((F.lit(float(n_docs)) - df + 0.5) / (df + 0.5)), F.lit(0.0)
    ) + F.lit(1.0)
    dl_eff = F.when(dl > 0, dl.cast("double")).otherwise(
        F.lit(max(float(avgdl), 1.0))
    )
    norm = dl_eff / F.lit(float(avgdl)) if avgdl > 0 else F.lit(1.0)
    denom = F.greatest(tf + F.lit(k1) * (1.0 - b + b * norm), F.lit(1e-6))
    return idf * (tf.cast("double") * (k1 + 1.0)) / denom


def bm25_np(
    tf: np.ndarray,
    df: np.ndarray,
    dl: np.ndarray,
    avgdl: float,
    n_docs: float,
    k1: float = K1_DEFAULT,
    b: float = B_DEFAULT,
) -> np.ndarray:
    """float32 BM25, same operation order as the reference."""
    f32 = np.float32
    tf = tf.astype(f32, copy=False)
    df = df.astype(f32, copy=False)
    n = f32(n_docs)
    k1 = f32(k1)
    b = f32(b)
    avgdl = f32(avgdl)
    one = f32(1.0)
    idf = np.maximum(np.log((n - df + f32(0.5)) / (df + f32(0.5))).astype(f32), f32(0.0)) + one
    dl_eff = np.where(dl > 0, dl.astype(f32, copy=False), np.maximum(avgdl, one))
    norm = dl_eff / avgdl if avgdl > 0 else np.ones_like(dl_eff, dtype=f32)
    denom = np.maximum(tf + k1 * (one - b + b * norm), f32(1e-6)).astype(f32)
    return (idf * (tf * (k1 + one)) / denom).astype(f32)


def bm25_sql(
    tf: str,
    df: str,
    dl: str,
    avgdl: float,
    n_docs: int,
    k1: float = K1_DEFAULT,
    b: float = B_DEFAULT,
) -> str:
    """The same formula as an ANSI-SQL string (for DuckDB oracles)."""
    norm = f"(CASE WHEN {dl} > 0 THEN CAST({dl} AS DOUBLE) ELSE {max(float(avgdl), 1.0)!r} END) / {float(avgdl)!r}" if avgdl > 0 else "1.0"
    return (
        f"(greatest(ln(({float(n_docs)!r} - {df} + 0.5) / ({df} + 0.5)), 0.0) + 1.0)"
        f" * (CAST({tf} AS DOUBLE) * {k1 + 1.0!r})"
        f" / greatest({tf} + {k1!r} * (1.0 - {b!r} + {b!r} * {norm}), 1e-6)"
    )
