"""Structured Streaming surface.

The reference is purely batch (SURVEY.md §2.9 — no watermarks, windows,
or stateful operators anywhere in it); its streaming-adjacent notion is
resumable incremental batch. This module exists for completeness of the
engine: the same windowed aggregation the batch path exposes
(queries.ev_tumbling_counts) expressed over readStream, so an ingest
surface (e.g. incremental document drops for mention detection) can run
incrementally with exactly-once file-source semantics.

Batch/stream parity is tested in tests/test_streaming.py: an
availableNow trigger over the same parquet yields the same rows as the
batch aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

EVENTS_SCHEMA = T.StructType([
    T.StructField("event_id", T.LongType()),
    T.StructField("ts", T.TimestampType()),
    T.StructField("user_id", T.LongType()),
    T.StructField("event_type", T.StringType()),
    T.StructField("value", T.DoubleType()),
    T.StructField("props", T.StringType()),
])


def read_events_stream(spark: SparkSession, path: str) -> DataFrame:
    return (spark.readStream
            .schema(EVENTS_SCHEMA)
            .parquet(path))


def windowed_counts(events: DataFrame,
                    watermark: str = "1 hour") -> DataFrame:
    """Tumbling 1-hour window counts with late-data watermark; identical
    semantics to the batch ev_tumbling_counts query."""
    src = events
    if events.isStreaming:
        src = events.withWatermark("ts", watermark)
    return (src.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
            .agg(F.count("*").alias("n_events"),
                 F.round(F.sum("value"), 4).alias("sum_value"))
            .select(F.col("w.start").alias("window_start"), "event_type",
                    "n_events", "sum_value"))


def deduped_stream(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Streaming exact dedup on event_id within the watermark horizon —
    the streaming twin of dedup.exact_duplicates."""
    return (events.withWatermark("ts", watermark)
            .dropDuplicates(["event_id"]))


def run_available_now(stream_df: DataFrame, query_name: str,
                      checkpoint_dir: str, timeout_sec: int = 120):
    """Drain everything currently available into an in-memory table
    (exactly-once over the file source), then stop."""
    q = (stream_df.writeStream
         .format("memory")
         .queryName(query_name)
         .outputMode("complete" if stream_df.isStreaming else "append")
         .option("checkpointLocation", checkpoint_dir)
         .trigger(availableNow=True)
         .start())
    q.awaitTermination(timeout_sec)
    return q
