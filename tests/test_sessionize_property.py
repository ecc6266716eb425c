"""Property tests for the streaming session fold (no Spark needed).

The invariant that makes applyInPandasWithState sessionization correct:
folding a user's time-ordered events through GroupState in ANY number of
micro-batches yields exactly the sessions of a one-shot fold — batch
boundaries are invisible. hypothesis drives random gap sequences and
random slicings; the one-shot fold itself is checked against an
independent straightforward sessionizer.
"""

from hypothesis import given, settings
from hypothesis import strategies as st

from entitysummarization_spark.streaming.events import fold_user_events

GAP_US = 30 * 60 * 1_000_000


def reference_sessions(ts: list[int]) -> list[tuple[int, int, int, int]]:
    """Independent spec: split sorted timestamps on gaps > GAP_US."""
    out = []
    for t in ts:
        if out and t - out[-1][3] <= GAP_US:
            sid, n, st, _ = out[-1]
            out[-1] = (sid, n + 1, st, t)
        else:
            out.append((len(out) + 1, 1, t, t))
    return out


@st.composite
def event_times(draw):
    """Sorted µs timestamps with gaps straddling the threshold: mix of
    in-session gaps, exactly-threshold gaps (edge: NOT a new session),
    threshold+1 (edge: new session), and large gaps."""
    gaps = draw(st.lists(
        st.one_of(
            st.integers(0, GAP_US),            # same session (≤ gap)
            st.just(GAP_US),                   # boundary: still same
            st.just(GAP_US + 1),               # boundary: splits
            st.integers(GAP_US + 1, 10 * GAP_US),
        ),
        min_size=0, max_size=40,
    ))
    t, out = 1_700_000_000_000_000, []
    for g in gaps:
        out.append(t)
        t += g
    if gaps:
        out.append(t)
    return out


@st.composite
def sliced(draw):
    ts = draw(event_times())
    n_cuts = draw(st.integers(0, 5))
    cuts = sorted(draw(st.lists(
        st.integers(0, len(ts)), min_size=n_cuts, max_size=n_cuts)))
    bounds = [0] + cuts + [len(ts)]
    return ts, [ts[bounds[i]:bounds[i + 1]] for i in range(len(bounds) - 1)]


@given(sliced())
@settings(max_examples=300, deadline=None)
def test_fold_is_slice_invariant(data):
    ts, slices = data
    one_closed, one_open = fold_user_events((0, 0, None, None), ts, GAP_US)

    state = (0, 0, None, None)
    inc_closed = []
    for s in slices:
        closed, state = fold_user_events(state, s, GAP_US)
        inc_closed.extend(closed)

    assert inc_closed == one_closed
    assert state == one_open


@given(event_times())
@settings(max_examples=300, deadline=None)
def test_fold_matches_reference_spec(ts):
    closed, open_ = fold_user_events((0, 0, None, None), ts, GAP_US)
    all_sessions = closed + ([open_] if open_[2] is not None else [])
    assert [tuple(s) for s in all_sessions] == reference_sessions(ts)
    # conservation: every event lands in exactly one session
    assert sum(s[1] for s in all_sessions) == len(ts)
