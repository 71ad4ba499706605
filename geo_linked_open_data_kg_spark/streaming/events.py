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


def session_windows(events: DataFrame, gap: str = "30 minutes",
                    watermark: str = "2 hours") -> DataFrame:
    """Gap-based session windows via the BUILT-IN session_window — the
    Spark-first shape for plain sessionization (works identically in
    batch and streaming; the lag+running-sum batch twin is
    queries.ev_sessionization). Custom state is reserved for semantics
    the built-in can't express (see sessionize_capped)."""
    src = events
    if events.isStreaming:
        src = events.withWatermark("ts", watermark)
    return (src.groupBy(F.session_window("ts", gap).alias("w"), "user_id")
            .agg(F.count("*").alias("n_events"))
            .select("user_id", F.col("w.start").alias("session_start"),
                    "n_events"))


SESSION_CAP_SCHEMA = T.StructType([
    T.StructField("user_id", T.LongType()),
    T.StructField("session_start", T.TimestampType()),
    T.StructField("session_end", T.TimestampType()),
    T.StructField("n_events", T.IntegerType()),
])

SESSION_CAP_STATE = T.StructType([
    T.StructField("start_s", T.LongType()),
    T.StructField("last_s", T.LongType()),
    T.StructField("n", T.IntegerType()),
])


def make_capped_session_fn(gap_minutes: int = 30,
                           max_session_minutes: int = 240):
    """Session semantics the built-in session_window CANNOT express:
    gap-based sessions that additionally SPLIT when a session exceeds a
    maximum duration (billing/abuse-control sessionization). Implemented
    as a custom stateful operator for applyInPandasWithState; the batch
    twin runs the same walk via applyInPandas (sessionize_capped_batch).

    Cross-microbatch disorder (an event admitted inside the watermark
    but older than the stored state) is guarded — the state walk never
    moves last_s backward, so session_end >= session_start always holds:
    - t within [start_s, last_s]: counted into the open session;
    - t older than start_s by <= gap (and within cap): the session
      start extends back to t (still one gap-connected run);
    - older still: the event belongs to a session horizon that gap
      semantics already closed — emitted as its own singleton session.
    """
    import pandas as pd

    gap_s = gap_minutes * 60
    cap_s = max_session_minutes * 60

    def fn(key, pdfs, state):
        (user_id,) = key
        if state.exists:
            start_s, last_s, n = state.get
        else:
            start_s = last_s = None
            n = 0
        closed = []
        if state.hasTimedOut:
            if n:
                closed.append((user_id, start_s, last_s, n))
            state.remove()
        else:
            ts_all = pd.concat([pdf["ts"] for pdf in pdfs]).sort_values()
            for t in (ts_all.astype("int64") // 10**9).tolist():
                if n == 0:
                    start_s = last_s = t
                    n = 1
                elif t < start_s:
                    # late arrival older than the open session (possible
                    # only across microbatches; in-batch input is sorted)
                    if start_s - t <= gap_s and last_s - t <= cap_s:
                        start_s = t
                        n += 1
                    else:
                        closed.append((user_id, t, t, 1))
                elif t <= last_s:
                    n += 1  # in-session late arrival; bounds unchanged
                elif t - last_s > gap_s or t - start_s > cap_s:
                    closed.append((user_id, start_s, last_s, n))
                    start_s = last_s = t
                    n = 1
                else:
                    last_s = t
                    n += 1
            state.update((start_s, last_s, n))
            state.setTimeoutTimestamp((last_s + gap_s) * 1000)
        if closed:
            out = pd.DataFrame(closed, columns=["user_id", "session_start",
                                                "session_end", "n_events"])
            out["session_start"] = pd.to_datetime(out["session_start"], unit="s")
            out["session_end"] = pd.to_datetime(out["session_end"], unit="s")
            yield out

    return fn


def sessionize_capped_stream(events: DataFrame, gap_minutes: int = 30,
                             max_session_minutes: int = 240,
                             watermark: str = "2 hours") -> DataFrame:
    """Streaming gap+cap sessionization: custom state per user via
    applyInPandasWithState, sessions flushed by event-time timeout as
    the watermark passes the gap horizon."""
    from pyspark.sql.streaming.state import GroupStateTimeout
    fn = make_capped_session_fn(gap_minutes, max_session_minutes)
    return (events.withWatermark("ts", watermark)
            .groupBy("user_id")
            .applyInPandasWithState(
                fn, SESSION_CAP_SCHEMA, SESSION_CAP_STATE,
                "append", GroupStateTimeout.EventTimeTimeout))


def sessionize_capped_batch(events: DataFrame, gap_minutes: int = 30,
                            max_session_minutes: int = 240) -> DataFrame:
    """Batch twin of sessionize_capped_stream: identical session walk
    per user via applyInPandas (all sessions close at end-of-input)."""
    import pandas as pd

    gap_s = gap_minutes * 60
    cap_s = max_session_minutes * 60

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        user_id = pdf["user_id"].iloc[0]
        closed = []
        start_s = last_s = None
        n = 0
        for t in (pdf["ts"].sort_values().astype("int64") // 10**9).tolist():
            if n == 0:
                start_s = last_s = t
                n = 1
            elif t - last_s > gap_s or t - start_s > cap_s:
                closed.append((user_id, start_s, last_s, n))
                start_s = last_s = t
                n = 1
            else:
                last_s = t
                n += 1
        if n:
            closed.append((user_id, start_s, last_s, n))
        out = pd.DataFrame(closed, columns=["user_id", "session_start",
                                            "session_end", "n_events"])
        out["session_start"] = pd.to_datetime(out["session_start"], unit="s")
        out["session_end"] = pd.to_datetime(out["session_end"], unit="s")
        return out

    return (events.select("user_id", F.col("ts").cast("timestamp").alias("ts"))
            .groupBy("user_id").applyInPandas(fn, SESSION_CAP_SCHEMA))


def run_available_now(stream_df: DataFrame, query_name: str,
                      checkpoint_dir: str, timeout_sec: int = 120,
                      output_mode: str | None = None):
    """Drain everything currently available into an in-memory table
    (exactly-once over the file source), then stop. Default output mode:
    complete for aggregations; pass "append" for stateful flatMap ops."""
    q = (stream_df.writeStream
         .format("memory")
         .queryName(query_name)
         .outputMode(output_mode or "complete")
         .option("checkpointLocation", checkpoint_dir)
         .trigger(availableNow=True)
         .start())
    q.awaitTermination(timeout_sec)
    return q
