"""Structured-Streaming analogs of the reference's event layer.

The reference's only "streaming" is metadata-keyed event callbacks
fired on SDFS put/append/get/del (A19, mock_sdfs_master.cpp:35-111)
and a 500 ms-poll shared-config watch (A20,
shared_configuration.cpp:30-96). The idiomatic Spark mapping:

- A19 → a file-source stream: new files arriving in a directory ARE
  the put/append events; watermarked windowed aggregations and
  stateful dedup replace the callback bodies (streams.py).
- A20 → a polled config table with change callbacks (config_watch.py).
"""

from distributed_system_spark.streaming.config_watch import ConfigWatcher
from distributed_system_spark.streaming.streams import (
    dedup_stream,
    events_stream,
    run_available_now,
    session_counts,
    sliding_counts,
    tumbling_counts,
)

__all__ = [
    "ConfigWatcher",
    "dedup_stream",
    "events_stream",
    "run_available_now",
    "session_counts",
    "sliding_counts",
    "tumbling_counts",
]
