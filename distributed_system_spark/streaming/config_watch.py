"""Shared-configuration watch — the A20 analog
(shared_configuration.cpp:30-96).

The reference stores each config key as an SDFS file and polls every
500 ms, firing callbacks on change. Here: each key is one JSON file
in a config directory, written atomically (temp + rename, the same
trick as the reference's SDFS writes, mock_sdfs_client.cpp:192-202),
and a watcher thread polls and fires callbacks on changed values.

Config data is KB-scale metadata, not table data: a local/shared
POSIX path is appropriate (on a real cluster, point it at a fuse/NFS
mount or swap the three os calls for the Hadoop FS API). Values are
capped at 8192 bytes like the reference (shared_configuration.h:9).
"""

from __future__ import annotations

import json
import os
import tempfile
import threading
from collections.abc import Callable

MAX_VALUE_BYTES = 8192  # shared_configuration.h:9


class ConfigWatcher:
    """Poll-based key/value config with change callbacks."""

    def __init__(self, config_dir: str, poll_interval: float = 0.5) -> None:
        self.config_dir = config_dir
        self.poll_interval = poll_interval
        self._watches: dict[str, list[Callable[[str, str | None], None]]] = {}
        self._last_seen: dict[str, str | None] = {}
        self._stop = threading.Event()
        self._thread: threading.Thread | None = None
        os.makedirs(config_dir, exist_ok=True)

    def _path(self, key: str) -> str:
        # Escape path separators like the reference escapes SDFS paths
        # (sdfs.cpp:34-48).
        safe = key.replace("%", "%%").replace("/", "%|")
        return os.path.join(self.config_dir, f"{safe}.json")

    def set_value(self, key: str, value: str) -> None:
        if len(value.encode()) > MAX_VALUE_BYTES:
            raise ValueError(
                f"value for {key!r} exceeds {MAX_VALUE_BYTES} bytes"
            )
        fd, tmp = tempfile.mkstemp(dir=self.config_dir)
        with os.fdopen(fd, "w") as f:
            json.dump({"value": value}, f)
        os.replace(tmp, self._path(key))  # atomic, like put's rename

    def get_value(self, key: str) -> str | None:
        try:
            with open(self._path(key)) as f:
                return json.load(f)["value"]
        except FileNotFoundError:
            return None

    def watch_value(
        self, key: str, callback: Callable[[str, str | None], None]
    ) -> None:
        """Register a callback fired (key, new_value) on each change,
        including first observation — matching the reference's
        dedup'd change notification (tests/shared_configuration.cpp:52-96).
        """
        self._watches.setdefault(key, []).append(callback)
        self._last_seen.setdefault(key, self.get_value(key))

    def _poll_once(self) -> None:
        for key, callbacks in self._watches.items():
            value = self.get_value(key)
            if value != self._last_seen.get(key):
                self._last_seen[key] = value
                for cb in callbacks:
                    cb(key, value)

    def start(self) -> None:
        if self._thread is not None:
            return
        self._stop.clear()

        def loop() -> None:
            while not self._stop.wait(self.poll_interval):
                self._poll_once()

        self._thread = threading.Thread(target=loop, daemon=True)
        self._thread.start()

    def stop(self) -> None:
        self._stop.set()
        if self._thread is not None:
            self._thread.join()
            self._thread = None
