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


def final_sessions(emitted: DataFrame) -> DataFrame:
    """Reduce the update-mode emissions of :func:`stateful_sessionize` to
    one final row per session (n_events is monotone per session; start is
    fixed at open; end is monotone)."""
    return emitted.groupBy("user_id", "session_id").agg(
        F.max("n_events").cast("long").alias("n_events"),
        F.min("start_us").cast("long").alias("start_us"),
        F.max("end_us").cast("long").alias("end_us"),
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
