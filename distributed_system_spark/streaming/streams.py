"""File-source streams over the `events` table with windowed
aggregations, watermarks, and stateful dedup (SURVEY.md §2.C row C9;
A19 analog — new files in the directory are the event callbacks).

Every transformation here is expressed so that running it on the
batch DataFrame gives the same answer as running it through the
stream (the basis of both the pytest streaming suite and the
batch-oracle registry entries in queries/streaming_q.py).

Scale notes: windowed aggs shuffle once on (key, window); watermarks
bound state size — without one, session/dedup state grows without
limit at 100 TB/day. File-source streams scale by listing only new
files per microbatch (maxFilesPerTrigger throttles backfill).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

# The driver's events.parquet stores ts as TIMESTAMP(NANOS); with
# spark.sql.legacy.parquet.nanosAsLong (set in session.py) it arrives
# as int64 — streams need the schema up front.
EVENTS_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", LongType()),  # nanoseconds (nanosAsLong)
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("props", StringType()),
    ]
)


def _stage_dir(sf_dir: str) -> str:
    """The file-stream source watches a DIRECTORY (files arriving in
    it are the A19 events), but the driver ships events as one file —
    so symlink it into a per-sf staging dir under /tmp."""
    import hashlib
    import os

    src = f"{sf_dir.rstrip('/')}/events.parquet"
    tag = hashlib.md5(src.encode()).hexdigest()[:12]
    stage = f"/tmp/dss-events-stream-{tag}"
    os.makedirs(stage, exist_ok=True)
    link = os.path.join(stage, "events-000.parquet")
    if not os.path.exists(link):
        os.symlink(src, link)
    return stage


def events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """readStream over the events parquet: each new file that lands is
    an A19-style event batch. Derives the same ts_ns/ts columns as the
    batch loader so stream and batch plans are interchangeable."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(_stage_dir(sf_dir))
    )
    return raw.withColumnRenamed("ts", "ts_ns").withColumn(
        "ts", F.timestamp_micros(F.expr("ts_ns div 1000"))
    )


def tumbling_counts(
    events: DataFrame, width: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """Per-type tumbling-window counts/sums; the watermark drops
    late data and lets the store evict closed windows."""
    src = events.withWatermark("ts", watermark) if events.isStreaming else events
    return (
        src.groupBy(F.window("ts", width).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.round(F.sum(F.col("value").cast("decimal(18,4)")), 2)
            .cast("double")
            .alias("sum_value"),
        )
        .select(
            F.unix_micros(F.col("w.start")).alias("win_start_us"),
            "event_type",
            "cnt",
            "sum_value",
        )
    )


def sliding_counts(
    events: DataFrame,
    width: str = "1 hour",
    slide: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Sliding windows: each event lands in width/slide windows."""
    src = events.withWatermark("ts", watermark) if events.isStreaming else events
    return (
        src.groupBy(F.window("ts", width, slide).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(
            F.unix_micros(F.col("w.start")).alias("win_start_us"),
            "event_type",
            "cnt",
        )
    )


def session_counts(
    events: DataFrame, gap: str = "10 minutes", watermark: str = "2 hours"
) -> DataFrame:
    """Per-user session windows (gap-based). session_window works in
    both batch and streaming, so one definition serves the oracle
    check and the live stream."""
    src = events.withWatermark("ts", watermark) if events.isStreaming else events
    return (
        src.groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.unix_micros(F.col("w.start")).alias("session_start_us"),
            F.unix_micros(F.col("w.end")).alias("session_end_us"),
            "n_events",
        )
    )


def dedup_stream(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Stateful dedup on event_id: keeps the first arrival, drops
    replays inside the watermark horizon (exactly-once-per-id — the
    streaming face of A5's committed-pair dedup)."""
    src = events.withWatermark("ts", watermark) if events.isStreaming else events
    return src.dropDuplicates(["event_id"])


def run_available_now(
    sdf: DataFrame, name: str, output_mode: str = "complete"
) -> DataFrame:
    """Drain a stream with the available-now trigger into a memory
    sink and return the result table — the batch-bounded way to test
    streaming semantics. Aggregations want mode 'complete';
    row-preserving streams (dedup) want 'append'."""
    q = (
        sdf.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return sdf.sparkSession.table(name)
