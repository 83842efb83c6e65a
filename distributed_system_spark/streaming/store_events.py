"""Streaming delivery of DatasetStore op events — the analog of the
reference's metadata-keyed SDFS callbacks (on_put / on_append /
on_get / on_del, mock_sdfs_master.cpp:35-111; sdfs.h:12-16).

The store writes one JSON file per operation into ``_dss_events/``
(sources/store.py::_log_event); a file-source stream over that
directory IS the callback bus: each microbatch delivers exactly the
new operations, and a metadata-key filter reproduces the reference's
watched-key subscription (callbacks fire only for files whose
metadata contains a registered key).

Scale: the event log is append-only small JSON; a production store
would emit to a log service (Kafka-style) and this reader's contract
— schema + watched-key filter — would not change.
"""

from __future__ import annotations

from functools import reduce

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

STORE_EVENT_SCHEMA = (
    "op string, path string, piece long, ts long, "
    "metadata map<string,string>"
)


def _watch_filter(
    df: DataFrame,
    ops: list[str] | None,
    watched_keys: list[str] | None,
) -> DataFrame:
    if ops:
        df = df.filter(F.col("op").isin(list(ops)))
    if watched_keys:
        # reference: a callback fires iff the file's metadata contains
        # one of the subscription's keys (mock_sdfs_master.cpp:41-66)
        hit = reduce(
            lambda a, b: a | b,
            [F.map_contains_key("metadata", k) for k in watched_keys],
        )
        df = df.filter(hit)
    return df


def store_event_stream(
    spark: SparkSession,
    events_path: str,
    ops: list[str] | None = None,
    watched_keys: list[str] | None = None,
) -> DataFrame:
    """readStream over a store's event log (``store.events_path()``),
    optionally restricted to op types and watched metadata keys."""
    df = spark.readStream.schema(STORE_EVENT_SCHEMA).json(events_path)
    return _watch_filter(df, ops, watched_keys)


def store_events_batch(
    spark: SparkSession,
    events_path: str,
    ops: list[str] | None = None,
    watched_keys: list[str] | None = None,
) -> DataFrame:
    """Batch view of the same log (audit queries; stream-batch parity
    tests)."""
    df = spark.read.schema(STORE_EVENT_SCHEMA).json(events_path)
    return _watch_filter(df, ops, watched_keys)
