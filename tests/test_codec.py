import numpy as np
from hypothesis import given, settings, strategies as st

from searchlite_spark.index.codec import (
    decode_deltas,
    decode_varints,
    encode_deltas,
    encode_varints,
)


def test_varint_roundtrip_simple():
    vals = np.array([0, 1, 127, 128, 300, 2**32, 2**56 + 5], dtype=np.uint64)
    assert (decode_varints(encode_varints(vals)) == vals).all()


def test_varint_empty():
    assert encode_varints(np.empty(0, dtype=np.uint64)) == b""
    assert len(decode_varints(b"")) == 0


def test_delta_roundtrip():
    vals = np.array([3, 7, 8, 100, 10_000_000_000], dtype=np.uint64)
    assert (decode_deltas(encode_deltas(vals)) == vals).all()


@given(
    st.lists(st.integers(min_value=0, max_value=2**63 - 1), max_size=300)
)
@settings(max_examples=50, deadline=None)
def test_varint_roundtrip_property(xs):
    vals = np.array(xs, dtype=np.uint64)
    out = decode_varints(encode_varints(vals))
    assert (out == vals).all()


@given(
    st.lists(st.integers(min_value=0, max_value=2**40), min_size=1, max_size=300)
)
@settings(max_examples=50, deadline=None)
def test_delta_roundtrip_property(xs):
    vals = np.array(sorted(xs), dtype=np.uint64)
    out = decode_deltas(encode_deltas(vals))
    assert (out == vals).all()
