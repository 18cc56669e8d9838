"""Streaming sessionization: watermarked session-window aggregation.

The batch engine sessionizes with a lag/window pipeline
(plans/entry_queries.q_sessionize); this is the Structured Streaming
counterpart: ``session_window`` grouping with a watermark, emitting a
session row once the watermark passes its close (append mode) — the
standard late-data-tolerant shape for an events stream that never ends.

Boundary semantics (pinned by the test): ``session_window`` extends a
session through an event landing at exactly ``last_event + gap`` — a
new session opens only when the gap is strictly greater.  This matches
the batch query's ``lag``-based formula (gap > threshold opens a new
session), so the streaming and batch sessionizers agree everywhere,
including the exact-boundary case.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

EVENT_SCHEMA = "event_id long, user_id long, event_type string, ts timestamp"


def streaming_sessionize(
    spark: SparkSession,
    input_glob: str,
    checkpoint_dir: str,
    out_dir: str,
    gap: str = "30 minutes",
    watermark: str = "10 minutes",
    schema: str = EVENT_SCHEMA,
) -> None:
    """Drain all available input files once (Trigger.AvailableNow),
    appending CLOSED sessions to ``out_dir`` as parquet (append mode: a
    session is emitted only when the watermark passes its end —
    exactly-once per session, resumable from the checkpoint across
    drains)."""
    stream = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(
        input_glob
    )
    agg = (
        stream.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), F.col("user_id"))
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
        )
        .select("user_id", "n_events", "session_start", "session_end")
    )
    q = (
        agg.writeStream.format("parquet")
        .option("path", out_dir)
        .outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def sessions_table(spark: SparkSession, out_dir: str) -> DataFrame:
    return spark.read.parquet(out_dir)
