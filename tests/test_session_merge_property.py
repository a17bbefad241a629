"""Property test for the pure core of stateful sessionization:
merge_session_intervals must be arrival-order independent and agree
with the obvious offline gap-sessionization of the sorted timestamps.
No Spark session required."""

from hypothesis import given, settings
from hypothesis import strategies as st

from searchlite_spark.streaming import merge_session_intervals


def offline_sessions(ts, gap):
    """Reference model: gap-sessionize the sorted timestamps."""
    ts = sorted(ts)
    out = []
    start = end = ts[0]
    n = 1
    for t in ts[1:]:
        if t - end <= gap:
            end = t
            n += 1
        else:
            out.append((start, end, n))
            start = end = t
            n = 1
    out.append((start, end, n))
    return out


@settings(max_examples=300, deadline=None)
@given(
    ts=st.lists(
        st.integers(min_value=0, max_value=10_000), min_size=1, max_size=60
    ),
    gap=st.integers(min_value=0, max_value=2_000),
    order=st.randoms(use_true_random=False),
)
def test_merge_matches_offline_model_any_order(ts, gap, order):
    shuffled = list(ts)
    order.shuffle(shuffled)
    got = merge_session_intervals([(t, t, 1) for t in shuffled], gap)
    assert got == offline_sessions(ts, gap)


@settings(max_examples=200, deadline=None)
@given(
    ts=st.lists(
        st.integers(min_value=0, max_value=10_000), min_size=2, max_size=60
    ),
    gap=st.integers(min_value=0, max_value=2_000),
    cut=st.integers(min_value=1, max_value=59),
)
def test_open_state_interval_composes_like_raw_events(ts, gap, cut):
    """Processing a prefix into an open-session interval and then
    merging the suffix against it gives the same sessions as merging
    everything at once — the exactness of the streaming decomposition,
    PROVIDED the suffix cannot close a session the prefix already
    emitted (which the watermark guarantees: only the LAST prefix
    session is still open)."""
    cut = min(cut, len(ts) - 1)
    prefix, suffix = sorted(ts)[:cut], sorted(ts)[cut:]
    pre = merge_session_intervals([(t, t, 1) for t in prefix], gap)
    # the streaming operator keeps only the last (open) session in
    # state; earlier ones were emitted.  Feed open + suffix back in.
    open_session = pre[-1]
    re = merge_session_intervals(
        [open_session] + [(t, t, 1) for t in suffix], gap
    )
    assert pre[:-1] + re == offline_sessions(ts, gap)
