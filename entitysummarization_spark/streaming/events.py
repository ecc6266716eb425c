"""Structured-Streaming operators over the events stream.

The reference is batch-only (file-rename markers, S14) — these are the
Spark-first equivalents a continuously-fed KG pipeline needs. Every
transformation is defined once and applied to either a batch DataFrame or
a readStream DataFrame (identical plans; watermarking only applies when
streaming).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window


def windowed_event_counts(events: DataFrame, watermark: str | None = None) -> DataFrame:
    """Tumbling 1-hour counts per event_type.

    Output (window_start_s: long, event_type, n) — epoch seconds so batch,
    streaming, and the DuckDB oracle agree byte-for-byte.
    """
    df = events
    if events.isStreaming:
        # watermarks require TIMESTAMP (with zone); NTZ parquet cols are
        # reinterpreted under the UTC session TZ — same instant semantics
        df = df.withColumn("ts", F.col("ts").cast("timestamp"))
        if watermark:
            df = df.withWatermark("ts", watermark)
    return (
        df.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").cast("long").alias("n"))
        .select(
            F.unix_timestamp(F.col("w.start")).alias("window_start_s"),
            "event_type",
            "n",
        )
    )


def sessionize(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Gap-based sessionization (batch form): a new session starts when a
    user's inter-event gap exceeds ``gap_minutes``.

    Output (user_id, session_id, n_events, start_s, end_s). The streaming
    twin is applyInPandasWithState keyed by user — the batch form is the
    oracle-checkable one; see stateful_sessionize for the streaming path.
    """
    order = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # microsecond precision (TIMESTAMP_NTZ → LTZ under UTC session TZ →
    # unix_micros) so gap comparison matches engines that keep sub-second
    ts_us = F.unix_micros(F.col("ts").cast("timestamp"))
    gap = ts_us - F.lag(ts_us).over(order)
    marked = events.withColumn(
        "_new",
        F.when(gap.isNull() | (gap > gap_minutes * 60 * 1_000_000), F.lit(1))
        .otherwise(F.lit(0)),
    )
    run = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, 0
    )
    sess = marked.withColumn("session_id", F.sum("_new").over(run).cast("long"))
    return sess.groupBy("user_id", "session_id").agg(
        F.count("*").cast("long").alias("n_events"),
        F.unix_micros(F.min("ts").cast("timestamp")).alias("start_us"),
        F.unix_micros(F.max("ts").cast("timestamp")).alias("end_us"),
    )


SESSION_SCHEMA = (
    "user_id long, session_id long, n_events long, start_us long, end_us long"
)
_STATE_SCHEMA = "session_id long, n_events long, start_us long, end_us long"


def fold_user_events(
    state: tuple[int, int, int | None, int | None],
    ts_us_sorted: list[int],
    gap_us: int,
) -> tuple[list[tuple[int, int, int, int]], tuple[int, int, int, int]]:
    """Pure per-user session fold — the exact logic applyInPandasWithState
    runs per micro-batch, factored out so the cross-batch property (fold
    over ANY time-ordered slicing ≡ one-shot fold) is unit-testable
    without a streaming harness.

    ``state`` = (session_id, n_events, start_us, end_us) of the OPEN
    session (session_id 0 = no state yet). Returns (closed_sessions,
    new_open_state); closed rows are (session_id, n_events, start, end).
    """
    sid, n, st, en = state
    closed: list[tuple[int, int, int, int]] = []
    for t in ts_us_sorted:
        t = int(t)
        if st is None:
            sid, n, st, en = sid + 1, 1, t, t
        elif t - en > gap_us:
            closed.append((sid, n, st, en))
            sid, n, st, en = sid + 1, 1, t, t
        else:
            n, en = n + 1, t
    return closed, (sid, n, st, en)


def stateful_sessionize(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Streaming twin of :func:`sessionize` — a custom stateful operator via
    ``applyInPandasWithState`` keyed by ``user_id``.

    Per-user GroupState = the OPEN session (session_id, n_events, start_us,
    end_us). Each micro-batch folds its (in-batch-sorted) events into the
    state: a gap > ``gap_minutes`` closes the open session and starts the
    next. Every session touched in a batch is emitted with its cumulative
    stats; ``n_events`` is monotone per session, so the LAST emission per
    (user_id, session_id) is the final answer — reduce with
    :func:`final_sessions`. Cross-batch correctness assumes the source
    delivers each user's events in non-decreasing event time across
    batches (time-sliced files / watermark-ordered upstream); late
    cross-batch events would need watermark + reconciliation, which the
    batch form handles exactly.

    Scale shape: state is one tiny row per ACTIVE user (closed sessions
    leave the state store), partitioned by the groupBy key — no global
    structure, no driver involvement.
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    gap_us = gap_minutes * 60 * 1_000_000

    def fold(key, pdfs, state):
        import pandas as pd

        (user_id,) = key
        cur = state.get if state.exists else (0, 0, None, None)
        ts_sorted: list[int] = []
        chunks = [p for p in pdfs if len(p)]
        if chunks:
            batch = pd.concat(chunks, ignore_index=True)
            ts = batch["ts"]
            if getattr(ts.dt, "tz", None) is not None:
                # convert to UTC BEFORE dropping the zone: bare tz_localize
                # keeps the local wall-clock digits, so under a non-UTC
                # session timezone the epoch math would diverge from the
                # batch path's unix_micros by the UTC offset
                ts = ts.dt.tz_convert("UTC").tz_localize(None)
            # normalize to ns first: Arrow hands Spark UDFs datetime64[ns],
            # but parquet read via pandas yields datetime64[us] — a bare
            # astype(int64) would be off by 1000× depending on the source
            batch = batch.assign(
                _us=ts.astype("datetime64[ns]").astype("int64") // 1000
            )
            batch = batch.sort_values(["_us", "event_id"], kind="mergesort")
            ts_sorted = list(batch["_us"])
        closed, cur = fold_user_events(cur, ts_sorted, gap_us)
        rows = [(user_id, *c) for c in closed]
        if cur[2] is not None:
            rows.append((user_id, *cur))
            state.update(cur)
        yield pd.DataFrame(
            rows,
            columns=["user_id", "session_id", "n_events", "start_us", "end_us"],
        )

    return events.groupBy("user_id").applyInPandasWithState(
        fold,
        outputStructType=SESSION_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


WM_SESSION_SCHEMA = SESSION_SCHEMA + ", final boolean, emit_seq long"
_WM_STATE_SCHEMA = (
    "next_sid long, emit_seq long, pending_us array<long>"
)


def fold_pending(
    pending_sorted: list[int],
    wm_us: int,
    gap_us: int,
    next_sid: int,
) -> tuple[list[tuple], list[tuple], list[int], int]:
    """Pure watermark-reconciliation core of
    :func:`stateful_sessionize_watermarked`, factored out so the
    late-data property (any watermark-respecting slicing ≡ batch
    sessionize) is testable without a streaming harness.

    ``pending_sorted`` = every buffered event time (µs) not yet part of a
    finalized session, merged with the current batch and sorted. Sessions
    are recomputed over the buffer each call — that is what makes a LATE
    (out-of-order, but within-watermark) event land correctly: it can
    extend a provisional session or merge two of them, because nothing it
    could touch has been finalized yet. A session is FINAL only once no
    in-watermark event can still merge into it: end_us < wm_us − gap_us
    (merging needs t − end ≤ gap and any future t ≥ wm).

    Returns (final_rows, provisional_rows, new_pending, new_next_sid);
    rows are (session_id, n_events, start_us, end_us). Final session ids
    are assigned in time order as sessions finalize, so they equal the
    batch path's 1..n numbering.
    """
    sessions: list[list[int]] = []  # [n, start, end, first_idx, last_idx]
    for i, t in enumerate(pending_sorted):
        t = int(t)
        if not sessions or t - sessions[-1][2] > gap_us:
            sessions.append([1, t, t, i, i])
        else:
            s = sessions[-1]
            s[0] += 1
            s[2] = t
            s[4] = i
    final_rows, provisional_rows = [], []
    new_pending = pending_sorted
    sid = next_sid
    cut = 0
    for s in sessions:
        if s[2] < wm_us - gap_us:
            final_rows.append((sid, s[0], s[1], s[2]))
            cut = s[4] + 1
            sid += 1
        else:
            provisional_rows.append((sid + len(provisional_rows), s[0], s[1], s[2]))
    if cut:
        new_pending = pending_sorted[cut:]
    return final_rows, provisional_rows, list(new_pending), sid


def stateful_sessionize_watermarked(
    events: DataFrame,
    gap_minutes: int = 30,
    watermark: str = "30 minutes",
) -> DataFrame:
    """Late-data-safe streaming sessionization: watermark + reconciliation
    (the round-2 verdict's item 7 — :func:`stateful_sessionize` assumes
    per-user time-ordered delivery; this variant does not).

    Semantics: events may arrive out of order across micro-batches up to
    the ``watermark`` delay. Per-user state buffers every event time still
    inside the reconciliation horizon (anything newer than
    watermark − gap); sessions are recomputed over the buffer each batch,
    so a late event extends or MERGES provisional sessions correctly. A
    session is emitted ``final = true`` exactly once, when the watermark
    guarantees no in-horizon event can join it; until then emissions are
    provisional (``final = false``) corrections. Event-time timeout flushes
    users whose stream went quiet (their state wakes when the watermark
    passes end + gap). Reduce with :func:`final_sessions_watermarked`.

    Scale shape: state per ACTIVE user = one int pair + the event times of
    at most the trailing (gap + watermark-delay) window — bounded by the
    late-data horizon, not by history; finalized events leave the buffer.
    Events older than the watermark are dropped by Spark before the state
    op (standard watermark contract).
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    gap_us = gap_minutes * 60 * 1_000_000

    def fold(key, pdfs, state):
        import pandas as pd

        (user_id,) = key
        next_sid, emit_seq, pending = (
            state.get if state.exists else (1, 0, [])
        )
        pending = list(pending)
        for p in pdfs:
            if not len(p):
                continue
            ts = p["ts"]
            if getattr(ts.dt, "tz", None) is not None:
                ts = ts.dt.tz_convert("UTC").tz_localize(None)
            pending += list(
                ts.astype("datetime64[ns]").astype("int64") // 1000
            )
        pending.sort()
        wm_us = state.getCurrentWatermarkMs() * 1000
        final_rows, prov_rows, pending, next_sid = fold_pending(
            pending, wm_us, gap_us, next_sid
        )
        emit_seq += 1
        rows = [(user_id, *r, True, emit_seq) for r in final_rows]
        rows += [(user_id, *r, False, emit_seq) for r in prov_rows]
        if pending:
            state.update((next_sid, emit_seq, pending))
            # wake this user when the watermark passes its last event's
            # merge horizon so the tail session finalizes without traffic
            state.setTimeoutTimestamp(pending[-1] // 1000 + gap_us // 1000 + 1)
        else:
            state.remove()
        yield pd.DataFrame(
            rows,
            columns=[
                "user_id", "session_id", "n_events", "start_us", "end_us",
                "final", "emit_seq",
            ],
        )

    df = events.withColumn("ts", F.col("ts").cast("timestamp")).withWatermark(
        "ts", watermark
    )
    return df.groupBy("user_id").applyInPandasWithState(
        fold,
        outputStructType=WM_SESSION_SCHEMA,
        stateStructType=_WM_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


def final_sessions_watermarked(emitted: DataFrame) -> DataFrame:
    """Reduce the update-mode emissions of
    :func:`stateful_sessionize_watermarked` to one row per session:
    final rows are authoritative (emitted exactly once); for sessions the
    stream ended on, only each user's LAST emission batch holds the
    current provisional picture (earlier provisional rows may have been
    merged away by late events), so provisional rows are taken from
    max(emit_seq) per user only."""
    # rename the aggregation's key: both join inputs share lineage (the
    # sink table joined to its own groupBy), which otherwise trips the
    # conflicting-attribute check
    last_seq = emitted.groupBy(F.col("user_id").alias("_uid")).agg(
        F.max("emit_seq").alias("_last")
    )
    finals = emitted.filter(F.col("final"))
    tail = (
        emitted.join(last_seq, emitted["user_id"] == last_seq["_uid"])
        .filter(~F.col("final") & (F.col("emit_seq") == F.col("_last")))
    )
    return (
        finals.unionByName(tail, allowMissingColumns=True)
        .select("user_id", "session_id", "n_events", "start_us", "end_us")
    )


def final_sessions(emitted: DataFrame) -> DataFrame:
    """Reduce the update-mode emissions of :func:`stateful_sessionize` to
    one final row per session (n_events is monotone per session; start is
    fixed at open; end is monotone)."""
    return emitted.groupBy("user_id", "session_id").agg(
        F.max("n_events").cast("long").alias("n_events"),
        F.min("start_us").cast("long").alias("start_us"),
        F.max("end_us").cast("long").alias("end_us"),
    )


def first_touch(events: DataFrame, watermark: str | None = None) -> DataFrame:
    """First-touch attribution per (user, event_type): the earliest event
    (by ts, then event_id — a total order, so batch, streaming, and the
    DuckDB oracle agree exactly) plus the group's event count. Output
    (user_id, event_type, first_ts_us, first_event_id, n_events).

    Streaming: a stateful aggregation in update mode — state per group is
    ONE (ts, event_id) struct + a count, so the store is bounded by the
    number of live groups, not by events; `min` over the struct makes the
    winner arrival-order-independent inside a micro-batch (a bare
    dropDuplicates keeps whichever copy reaches the state store first —
    not reproducible cross-engine). The same plan runs on a batch frame.
    """
    df = events
    if events.isStreaming:
        df = df.withColumn("ts", F.col("ts").cast("timestamp"))
        if watermark:
            df = df.withWatermark("ts", watermark)
    ts_us = F.unix_micros(F.col("ts").cast("timestamp"))
    first = F.min(
        F.struct(ts_us.alias("t"), F.col("event_id").alias("e"))
    ).alias("f")
    return (
        df.groupBy("user_id", "event_type")
        .agg(first, F.count("*").cast("long").alias("n_events"))
        .select(
            "user_id",
            "event_type",
            F.col("f.t").alias("first_ts_us"),
            F.col("f.e").alias("first_event_id"),
            "n_events",
        )
    )


def stream_events_from_parquet(
    spark: SparkSession, path: str, max_files: int = 1
) -> DataFrame:
    """readStream over a parquet directory (schema inferred from a batch
    probe — streaming sources need an explicit schema)."""
    schema = spark.read.parquet(path).schema
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files)
        .parquet(path)
    )


def run_stream_once(
    stream_df: DataFrame, query_name: str, output_mode: str = "complete"
) -> DataFrame:
    """Execute a streaming plan with availableNow → in-memory sink →
    return the final result as a batch DataFrame (test/bench harness).
    Use ``output_mode="update"`` for applyInPandasWithState plans (their
    sink collects every emission; reduce with :func:`final_sessions`)."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    spark = stream_df.sparkSession
    return spark.sql(f"SELECT * FROM {query_name}")
