"""Watermarked stateful sessionization — late/out-of-order cross-batch
events (round-2 verdict item 7).

Three layers:
  1. unit tests of the pure reconciliation core (fold_pending);
  2. a hypothesis property: ANY watermark-respecting out-of-order slicing
     of an event set, folded batch-by-batch with the simulated watermark,
     yields exactly the one-shot batch sessionization;
  3. the real Structured-Streaming path: shuffled parquet slices (events
     arrive out of time order across micro-batches, within the watermark
     delay) → applyInPandasWithState(EventTimeTimeout) → equals batch
     sessionize.
"""

import os

import numpy as np
import pandas as pd
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from entitysummarization_spark.streaming.events import (
    final_sessions_watermarked,
    fold_pending,
    run_stream_once,
    sessionize,
    stateful_sessionize_watermarked,
    stream_events_from_parquet,
)

GAP_US = 10 * 1_000_000  # 10 s gap for the pure-core tests
KEY = ["user_id", "session_id"]
COLS = KEY + ["n_events", "start_us", "end_us"]


# ------------------------------------------------------------- pure core
def test_fold_pending_splits_and_finalizes():
    ts = [0, 1_000_000, 30_000_000, 31_000_000, 80_000_000]
    # watermark far past everything: both sessions + tail finalize
    fin, prov, pending, sid = fold_pending(ts, 10**12, GAP_US, 1)
    assert fin == [
        (1, 2, 0, 1_000_000),
        (2, 2, 30_000_000, 31_000_000),
        (3, 1, 80_000_000, 80_000_000),
    ]
    assert prov == [] and pending == [] and sid == 4


def test_fold_pending_holds_sessions_inside_horizon():
    ts = [0, 1_000_000, 30_000_000]
    wm = 35_000_000  # second session's end (30s) is within wm - gap? 30 < 25? no
    fin, prov, pending, sid = fold_pending(ts, wm, GAP_US, 1)
    # first session end=1s < wm-gap=25s → final; second stays provisional
    assert fin == [(1, 2, 0, 1_000_000)]
    assert prov == [(2, 1, 30_000_000, 30_000_000)]
    assert pending == [30_000_000] and sid == 2


def test_fold_pending_late_event_merges_provisional_sessions():
    # two provisional sessions 11 s apart; a late event in between closes
    # the gap — recomputation over the buffer must merge them into ONE
    ts = [0, 11_000_000]
    fin, prov, pending, sid = fold_pending(ts, 0, GAP_US, 1)
    assert len(prov) == 2
    merged_ts = sorted(ts + [5_500_000])
    fin, prov, pending, sid = fold_pending(merged_ts, 0, GAP_US, 1)
    assert fin == [] and len(prov) == 1
    assert prov[0] == (1, 3, 0, 11_000_000)


# ------------------------------------------------- property: any slicing
@st.composite
def _event_stream(draw):
    n = draw(st.integers(min_value=1, max_value=40))
    gaps = draw(
        st.lists(
            st.integers(min_value=0, max_value=30_000_000),
            min_size=n, max_size=n,
        )
    )
    ts = np.cumsum(np.asarray(gaps, dtype=np.int64)).tolist()
    delay = draw(st.integers(min_value=0, max_value=40_000_000))
    # arrival order: each event may be delayed so it arrives after later
    # events, as long as it is never older than the watermark at arrival.
    # Model: arrival_time = ts + per-event lateness ≤ delay; watermark at
    # any point = max(ts of ARRIVED events) - delay, so lateness ≤ delay
    # guarantees the event is still ≥ watermark when it shows up.
    lateness = draw(
        st.lists(
            st.integers(min_value=0, max_value=delay),
            min_size=n, max_size=n,
        )
    )
    arrivals = sorted(range(n), key=lambda i: (ts[i] + lateness[i], i))
    n_batches = draw(st.integers(min_value=1, max_value=6))
    cut_points = sorted(
        draw(
            st.lists(
                st.integers(min_value=0, max_value=n),
                min_size=n_batches - 1, max_size=n_batches - 1,
            )
        )
    )
    batches = []
    prev = 0
    for c in cut_points + [n]:
        batches.append([ts[i] for i in arrivals[prev:c]])
        prev = c
    return ts, delay, batches


@given(_event_stream())
@settings(max_examples=120, deadline=None)
def test_any_watermark_respecting_slicing_matches_batch(case):
    ts, delay, batches = case
    # one-shot truth
    truth_fin, truth_prov, _, _ = fold_pending(sorted(ts), 10**15, GAP_US, 1)
    assert truth_prov == []
    # simulate micro-batches: Spark's watermark = max event time seen in
    # PREVIOUS batches - delay (advances between batches)
    wm = -(10**15)
    seen_max = None
    pending, next_sid = [], 1
    finals = []
    for b in batches:
        fin, prov, pending, next_sid = fold_pending(
            sorted(pending + b), wm, GAP_US, next_sid
        )
        finals += fin
        if b:
            m = max(b)
            seen_max = m if seen_max is None else max(seen_max, m)
        if seen_max is not None:
            wm = seen_max - delay
    # end-of-stream flush (event-time timeout with wm → ∞)
    fin, prov, pending, next_sid = fold_pending(pending, 10**15, GAP_US, next_sid)
    finals += fin
    assert prov == [] and pending == []
    assert finals == truth_fin


# ------------------------------------------------------ streaming path
GAP_MIN = 30


def _sorted(pdf):
    return pdf.sort_values(KEY, ignore_index=True)[COLS]


def _late_events() -> pd.DataFrame:
    """4 users × 48 events, >30-min session breaks every 11th event."""
    rows, eid = [], 0
    for u in range(4):
        t = np.datetime64("2024-03-01T00:00:00") + np.timedelta64(u * 3, "m")
        for i in range(48):
            gap_m = 45 if (i + u) % 11 == 0 and i else 5
            t = t + np.timedelta64(gap_m, "m")
            rows.append((eid, t, u, "click"))
            eid += 1
    pdf = pd.DataFrame(rows, columns=["event_id", "ts", "user_id", "event_type"])
    pdf["ts"] = pdf["ts"].astype("datetime64[us]")
    return pdf


@pytest.fixture(scope="module")
def late_sliced(tmp_path_factory):
    """Events sliced into 4 files where each file's contents are shuffled
    and events from adjacent time windows are swapped ACROSS files (late
    by up to one window = 2 h ≤ the 4 h watermark delay) — the delivery
    pattern plain stateful_sessionize's ordered-delivery contract forbids."""
    pdf = _late_events()
    rng = np.random.RandomState(23)
    pdf = pdf.sort_values(["ts", "event_id"], ignore_index=True)
    n = len(pdf)
    cuts = [0, n // 4, n // 2, 3 * n // 4, n]
    slices = [
        pdf.iloc[cuts[i]:cuts[i + 1]].copy() for i in range(4)
    ]
    # swap ~20% of each adjacent boundary across slices → genuinely late
    for i in range(3):
        k = max(1, len(slices[i]) // 5)
        tail = slices[i].tail(k)
        head = slices[i + 1].head(k)
        slices[i] = pd.concat([slices[i].iloc[:-k], head])
        slices[i + 1] = pd.concat([tail, slices[i + 1].iloc[k:]])
    d = tmp_path_factory.mktemp("events_late")
    for i, s in enumerate(slices):
        s = s.sample(frac=1.0, random_state=rng).reset_index(drop=True)
        p = d / f"{i:03d}.parquet"
        s.to_parquet(p, index=False)
        os.utime(p, (1_700_000_000 + i * 60, 1_700_000_000 + i * 60))
    return str(d), pdf


def test_watermarked_sessionize_handles_late_events(spark, late_sliced):
    d, pdf = late_sliced
    expected = _sorted(
        sessionize(spark.createDataFrame(pdf), gap_minutes=GAP_MIN).toPandas()
    )
    stream = stream_events_from_parquet(spark, d, max_files=1)
    emitted = run_stream_once(
        stateful_sessionize_watermarked(
            stream, gap_minutes=GAP_MIN, watermark="4 hours"
        ),
        "wm_sess_test", output_mode="update",
    )
    got = _sorted(final_sessions_watermarked(emitted).toPandas())
    pd.testing.assert_frame_equal(got, expected)


def test_watermarked_matches_plain_on_ordered_input(spark, sf_dir, tmp_path):
    """On perfectly ordered input the watermarked variant must equal the
    batch truth too (no behavior tax for the late-data safety)."""
    os.symlink(f"{sf_dir}/events.parquet", tmp_path / "part-0.parquet")
    stream = stream_events_from_parquet(spark, str(tmp_path), max_files=10**6)
    emitted = run_stream_once(
        stateful_sessionize_watermarked(stream, gap_minutes=GAP_MIN),
        "wm_sess_ordered", output_mode="update",
    )
    got = _sorted(final_sessions_watermarked(emitted).toPandas())
    batch = spark.read.parquet(f"{sf_dir}/events.parquet")
    expected = _sorted(sessionize(batch, gap_minutes=GAP_MIN).toPandas())
    pd.testing.assert_frame_equal(got, expected)
