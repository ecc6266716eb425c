"""applyInPandasWithState sessionization (streaming) ≡ batch sessionize.

The stream is fed as time-sliced parquet files (maxFilesPerTrigger=1), so
each user's events arrive in non-decreasing event-time across micro-batches
— the contract stateful_sessionize documents. State must carry open
sessions across batch boundaries: the synthetic fixture is built so many
sessions straddle the slice cuts (guard test below), which only match the
batch result if the fold genuinely resumes from GroupState.

The driver-visible twin runs the same operator over the testdata events
table (single availableNow batch) against the `sessions` DuckDB oracle.
"""

import os

import numpy as np
import pandas as pd
import pytest

from entitysummarization_spark.streaming.events import (
    final_sessions,
    run_stream_once,
    sessionize,
    stateful_sessionize,
    stream_events_from_parquet,
)

KEY = ["user_id", "session_id"]
COLS = KEY + ["n_events", "start_us", "end_us"]
GAP_MIN = 30


def _sorted(pdf):
    return pdf.sort_values(KEY, ignore_index=True)[COLS]


def _make_events() -> pd.DataFrame:
    """5 users × 60 events; mostly 5-minute gaps with a >30-minute break
    every 13th event → multi-event sessions at staggered phases, so slicing
    the global timeline in thirds cuts through open sessions."""
    rows = []
    eid = 0
    for u in range(5):
        t = np.datetime64("2024-03-01T00:00:00") + np.timedelta64(u * 7, "m")
        for i in range(60):
            gap_m = 45 if (i + u) % 13 == 0 and i else 5
            t = t + np.timedelta64(gap_m, "m")
            rows.append((eid, t, u, "click"))
            eid += 1
    pdf = pd.DataFrame(rows, columns=["event_id", "ts", "user_id", "event_type"])
    # µs precision: parquet TIMESTAMP(NANOS) is illegal for the Spark reader
    pdf["ts"] = pdf["ts"].astype("datetime64[us]")
    return pdf.sort_values(["ts", "event_id"], kind="mergesort",
                           ignore_index=True)


@pytest.fixture(scope="module")
def dense_events():
    return _make_events()


@pytest.fixture(scope="module")
def sliced_dir(dense_events, tmp_path_factory):
    """The dense events split into 3 parquet files on global time order
    (distinct mtimes so the file source replays them oldest-first)."""
    d = tmp_path_factory.mktemp("events_sliced")
    pdf = dense_events
    cuts = [0, len(pdf) // 3, 2 * len(pdf) // 3, len(pdf)]
    for i in range(3):
        p = d / f"{i:03d}.parquet"
        pdf.iloc[cuts[i]:cuts[i + 1]].to_parquet(p, index=False)
        os.utime(p, (1_700_000_000 + i * 60, 1_700_000_000 + i * 60))
    return str(d)


def test_stateful_sessionize_multibatch_matches_batch(spark, dense_events,
                                                      sliced_dir):
    batch = spark.createDataFrame(dense_events)
    expected = _sorted(sessionize(batch, gap_minutes=GAP_MIN).toPandas())
    assert expected["n_events"].max() > 1, "fixture should have real sessions"

    stream = stream_events_from_parquet(spark, sliced_dir, max_files=1)
    assert stream.isStreaming
    emitted = run_stream_once(
        stateful_sessionize(stream, gap_minutes=GAP_MIN),
        "stateful_sess_test", output_mode="update",
    )
    got = _sorted(final_sessions(emitted).toPandas())
    pd.testing.assert_frame_equal(got, expected)


def test_sessions_actually_span_batches(spark, dense_events):
    """Guard that the fixture exercises cross-batch state: sessions whose
    [start, end] straddles a slice cut, per cut."""
    batch = spark.createDataFrame(dense_events)
    sess = sessionize(batch, gap_minutes=GAP_MIN).toPandas()
    ts_us = dense_events["ts"].astype("datetime64[ns]").astype("int64") // 1000
    for frac in (1, 2):
        cut = int(ts_us.iloc[len(dense_events) * frac // 3])
        spanning = sess[(sess["start_us"] < cut) & (sess["end_us"] >= cut)]
        assert len(spanning) > 0, f"no session crosses slice cut {frac}"


def test_stateful_sessionize_matches_testdata_oracle(spark, sf_dir, tmp_path):
    """Same operator over the driver's events table, single availableNow
    batch — must equal the exact batch sessionization (the shared oracle)."""
    os.symlink(f"{sf_dir}/events.parquet", tmp_path / "part-0.parquet")
    stream = stream_events_from_parquet(spark, str(tmp_path), max_files=10**6)
    emitted = run_stream_once(
        stateful_sessionize(stream, gap_minutes=GAP_MIN),
        "stateful_sess_oracle", output_mode="update",
    )
    got = _sorted(final_sessions(emitted).toPandas())
    batch = spark.read.parquet(f"{sf_dir}/events.parquet")
    expected = _sorted(sessionize(batch, gap_minutes=GAP_MIN).toPandas())
    pd.testing.assert_frame_equal(got, expected)


def test_first_touch_stream_matches_batch(spark, dense_events, sliced_dir):
    """first_touch: multi-micro-batch streaming aggregation ≡ batch plan.
    The min-over-(ts, event_id)-struct winner must be stable across batch
    boundaries (state carries one struct + count per group)."""
    from entitysummarization_spark.streaming.events import first_touch

    batch = spark.createDataFrame(dense_events)
    cols = ["user_id", "event_type", "first_ts_us", "first_event_id",
            "n_events"]
    expected = (
        first_touch(batch).toPandas()
        .sort_values(["user_id", "event_type"], ignore_index=True)[cols]
    )
    stream = stream_events_from_parquet(spark, sliced_dir, max_files=1)
    got = (
        run_stream_once(first_touch(stream), "first_touch_test",
                        output_mode="complete")
        .toPandas()
        .sort_values(["user_id", "event_type"], ignore_index=True)[cols]
    )
    pd.testing.assert_frame_equal(got, expected)
