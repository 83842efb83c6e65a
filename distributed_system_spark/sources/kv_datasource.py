"""The reference's KV piece-file wire format as a first-class Spark
source/sink (Python DataSource API, Spark 4).

Format parity: a piece file is newline-terminated text lines, each
``"<key> <value>"`` split at the FIRST space — key contains no spaces,
value no newlines (processor.cpp:27-37); a dataset is a directory of
piece files appended independently by workers (mj_worker.cpp:360-387).
Lines without a space are protocol errors — the reference fails the
job (mj_worker.cpp:318-327); this reader surfaces them as NULL
key/value so callers can fail or filter explicitly, matching
``functions/kv.kv_decode``.

Scale design: one InputPartition per piece file, so a dataset written
by N workers reads back N-way parallel with zero planning state on the
driver beyond the file list; the writer emits one piece per task
(write-to-temp + atomic rename, so failed/speculative tasks never
leave half pieces — the A5 exactly-once commit shape), which is
exactly how the reference's workers append their shard outputs.
"""

from __future__ import annotations

import os
import uuid
from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    InputPartition,
    WriterCommitMessage,
)


class KVPieceDataSource(DataSource):
    """``spark.read.format("kvpieces").option("path", dir)`` /
    ``df.write.format("kvpieces")`` for reference-format KV datasets."""

    @classmethod
    def name(cls) -> str:
        return "kvpieces"

    def schema(self) -> str:
        return "key string, value string, piece string"

    def reader(self, schema) -> "KVPieceReader":  # noqa: ANN001
        return KVPieceReader(self.options)

    def writer(self, schema, overwrite: bool) -> "KVPieceWriter":  # noqa: ANN001
        path = self.options["path"]
        if overwrite and os.path.isdir(path):
            # driver-side, before any task runs: overwrite = replace
            # the dataset, not interleave with stale pieces
            for f in os.listdir(path):
                if not f.startswith("_"):
                    os.unlink(os.path.join(path, f))
        return KVPieceWriter(self.options)


class _PieceFile(InputPartition):
    def __init__(self, path: str) -> None:
        self.path = path


class KVPieceReader(DataSourceReader):
    def __init__(self, options) -> None:  # noqa: ANN001
        self.path = options["path"]

    def partitions(self) -> Sequence[InputPartition]:
        # one partition per piece: the dataset's parallelism IS its
        # piece count, mirroring per-worker shard appends
        return [
            _PieceFile(os.path.join(self.path, f))
            for f in sorted(os.listdir(self.path))
            if not f.startswith(("_", "."))
        ]

    def read(self, partition: _PieceFile) -> Iterator[tuple]:
        piece = os.path.basename(partition.path)
        with open(partition.path, encoding="utf-8") as fh:
            for line in fh:
                line = line.rstrip("\n")
                i = line.find(" ")
                if i <= 0:
                    # protocol error (no space / empty key): NULLs,
                    # per kv_decode — caller decides fail vs filter
                    yield (None, None, piece)
                else:
                    yield (line[:i], line[i + 1 :], piece)


class _PieceCommit(WriterCommitMessage):
    def __init__(self, piece: str) -> None:
        self.piece = piece


class KVPieceWriter(DataSourceWriter):
    def __init__(self, options) -> None:  # noqa: ANN001
        self.path = options["path"]

    def write(self, iterator) -> _PieceCommit:  # noqa: ANN001
        os.makedirs(self.path, exist_ok=True)
        name = f"piece-{uuid.uuid4().hex}.kv"
        tmp = os.path.join(self.path, "." + name)
        with open(tmp, "w", encoding="utf-8") as fh:
            for row in iterator:
                if row[0] is None or row[1] is None:
                    raise ValueError("kvpieces: NULL key/value not encodable")
                if " " in row[0]:
                    raise ValueError(f"kvpieces: key contains space: {row[0]!r}")
                fh.write(f"{row[0]} {row[1]}\n")
        # atomic publish: a failed/speculative task leaves only a
        # dot-file the reader skips (A5 exactly-once commit shape)
        os.rename(tmp, os.path.join(self.path, name))
        return _PieceCommit(name)


def register_kv_datasource(spark) -> None:  # noqa: ANN001
    """Idempotently register the format on this session."""
    try:
        spark.dataSource.register(KVPieceDataSource)
    except Exception as exc:  # noqa: BLE001
        if "already" not in str(exc).lower():
            raise
