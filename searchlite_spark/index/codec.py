"""Delta + varint posting payload codec, numpy-vectorized.

Functionally equivalent to the reference's posting entry encoding
(searchlite-core/src/index/postings.rs:113-127: varint doc ids, varint
tfs, delta-varint positions) but laid out column-wise per block —
doc_ids are delta-coded then varint-packed, tfs varint-packed — so a
block decodes into flat numpy arrays with no per-entry branching.

LEB128 varint: little-endian 7-bit groups, high bit = continuation.
"""

from __future__ import annotations

import numpy as np

_SHIFTS = np.arange(0, 70, 7, dtype=np.uint64)


def encode_varints(values: np.ndarray) -> bytes:
    """Vectorized LEB128 encode of a uint64 array."""
    if len(values) == 0:
        return b""
    v = values.astype(np.uint64, copy=False)
    # bytes needed per value: ceil(bitlen/7), min 1
    nbytes = np.ones(len(v), dtype=np.int64)
    tmp = v >> np.uint64(7)
    while tmp.any():
        nbytes += (tmp != 0).astype(np.int64)
        tmp >>= np.uint64(7)
    total = int(nbytes.sum())
    out = np.empty(total, dtype=np.uint8)
    # byte slot index for each output byte
    ends = np.cumsum(nbytes)
    starts = ends - nbytes
    # for each of up to 10 byte positions, scatter
    max_len = int(nbytes.max())
    for k in range(max_len):
        mask = nbytes > k
        idx = starts[mask] + k
        chunk = (v[mask] >> (np.uint64(7) * np.uint64(k))) & np.uint64(0x7F)
        cont = (nbytes[mask] > (k + 1)).astype(np.uint8) << 7
        out[idx] = chunk.astype(np.uint8) | cont
    return out.tobytes()


def decode_varints(buf: bytes, count: int | None = None) -> np.ndarray:
    """Vectorized LEB128 decode -> uint64 array."""
    if not buf:
        return np.empty(0, dtype=np.uint64)
    raw = np.frombuffer(buf, dtype=np.uint8)
    cont = (raw & 0x80) != 0
    # value start positions: index 0 and any byte following a non-continuation byte
    is_start = np.empty(len(raw), dtype=bool)
    is_start[0] = True
    is_start[1:] = ~cont[:-1]
    starts = np.nonzero(is_start)[0]
    n = len(starts)
    lengths = np.empty(n, dtype=np.int64)
    lengths[:-1] = np.diff(starts)
    lengths[-1] = len(raw) - starts[-1]
    payload = (raw & 0x7F).astype(np.uint64)
    values = np.zeros(n, dtype=np.uint64)
    max_len = int(lengths.max())
    for k in range(max_len):
        mask = lengths > k
        values[mask] |= payload[starts[mask] + k] << _SHIFTS[k]
    if count is not None and n != count:
        raise ValueError(f"expected {count} varints, decoded {n}")
    return values


def encode_deltas(sorted_values: np.ndarray) -> bytes:
    """Delta-code a sorted uint64 array (first value absolute) then varint."""
    v = sorted_values.astype(np.uint64, copy=False)
    if len(v) == 0:
        return b""
    deltas = np.empty_like(v)
    deltas[0] = v[0]
    np.subtract(v[1:], v[:-1], out=deltas[1:])
    return encode_varints(deltas)


def decode_deltas(buf: bytes, count: int | None = None) -> np.ndarray:
    deltas = decode_varints(buf, count)
    return np.cumsum(deltas, dtype=np.uint64)
