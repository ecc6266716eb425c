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


def run_stream_once(stream_df: DataFrame, query_name: str) -> DataFrame:
    """Execute a streaming plan with availableNow → in-memory sink →
    return the final result as a batch DataFrame (test/bench harness)."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    spark = stream_df.sparkSession
    return spark.sql(f"SELECT * FROM {query_name}")
