"""DatasetStore — the reference's SDFS file semantics on Spark datasets.

The reference's live storage layer (mock_sdfs_client.cpp) models a file
as an ordered list of numbered *pieces*: ``put`` resets to one piece,
``append`` adds a piece, ``get`` concatenates all pieces in order
(mock_sdfs_client.h:58-63; mock_sdfs_client.cpp:102-110, 285-288).
Directories hold files/subdirs with ``mkdir/rmdir/ls_files/ls_dirs``
(sdfs_client.h:32-37), and each file carries a string→string metadata
map written atomically with put/append (sdfs.h:8).

Spark-native mapping (not a port):

- file      → a dataset (directory of parquet/text part-files)
- put       → ``mode("overwrite")`` write
- append    → ``mode("append")`` write (each append = new part files,
              exactly the reference's new-piece semantics)
- get       → ``spark.read`` over the directory (Spark concatenates)
- metadata  → a ``_metadata.json`` sidecar (the reference's per-file
              map; Spark table properties at catalog scale)
- ls_files / ls_dirs / get_num_shards → filesystem listing

Atomicity/exactly-once (the reference's append-permission protocol,
mj_master.cpp:158-194) is inherited from Spark's output committer:
task attempts write to staging paths and commit by rename, so replayed
tasks never double-append — asserted in tests rather than rebuilt.

SCOPE: the dataset reads/writes go through Spark (any Hadoop-compatible
FS), but the catalog operations (ls/del/metadata sidecar) use local
POSIX calls — this store is a **local-mode test double of SDFS**, like
the reference's own mock (its networked SDFS is dead code,
sdfs_client.cpp is fully commented out). Query paths never depend on
it; on a cluster, replace the catalog calls with the Hadoop FileSystem
API or a real catalog.
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession

_META_NAME = "_dss_metadata.json"


class DatasetStore:
    """Hierarchical dataset store rooted at a base directory.

    Paths use the reference's hierarchical form (``dir/sub/name``).
    Format is parquet by default; ``format="text"`` matches the
    reference's newline-record model (one string column ``value``).
    """

    def __init__(self, spark: SparkSession, root: str, fmt: str = "parquet"):
        self.spark = spark
        self.root = root.rstrip("/")
        self.fmt = fmt
        os.makedirs(self.root, exist_ok=True)

    # -- path helpers -------------------------------------------------
    def _abs(self, path: str) -> str:
        path = path.strip("/")
        if ".." in path.split("/"):
            raise ValueError(f"path escapes store root: {path!r}")
        return f"{self.root}/{path}"

    def exists(self, path: str) -> bool:
        return os.path.exists(self._abs(path))

    # -- file ops (put/append/get/del — sdfs_client.h:20-31) ----------
    def put(self, df: DataFrame, path: str, metadata: dict[str, str] | None = None) -> None:
        """Overwrite dataset `path` with df (reference: put resets
        pieces to 1, mock_sdfs_client.cpp:102-110)."""
        writer = df.write.format(self.fmt).mode("overwrite")
        writer.save(self._abs(path))
        self._write_sidecar(path, pieces=1, user=metadata or {})

    def append(self, df: DataFrame, path: str, metadata: dict[str, str] | None = None) -> None:
        """Append a new piece (reference: append → num_pieces++).

        The sidecar read-merge-replace assumes a single writer per
        dataset (the reference serializes via its master; Spark jobs
        via the driver). Concurrent appends from separate drivers
        need external coordination.
        """
        df.write.format(self.fmt).mode("append").save(self._abs(path))
        side = self._read_sidecar(path)
        user = side.get("user", {})
        if metadata:
            user.update(metadata)
        self._write_sidecar(
            path, pieces=int(side.get("pieces", 0)) + 1, user=user
        )

    def compact(self, path: str, target_partitions: int = 1) -> int:
        """Merge all pieces into ``target_partitions`` files and reset
        the piece count to 1 — the put-after-appends pattern readers
        of a many-piece file want (the reference compacts implicitly
        whenever a client gets then re-puts, mock_sdfs_client.cpp:
        275-303 then 187-265).

        At scale this is the small-files compaction every append-heavy
        table needs: N appends leave O(N x tasks) files whose per-file
        open/footer cost dominates scans; coalescing to size-targeted
        partitions restores scan throughput. Returns the part-file
        count before compaction (for the caller's bookkeeping).

        Single-writer, like append: compaction is a maintenance op,
        not a concurrent-write protocol.
        """
        before = len(
            [
                f
                for f in os.listdir(self._abs(path))
                if not f.startswith(("_", "."))
            ]
        )
        meta = self.get_metadata(path)
        df = self.get(path).coalesce(target_partitions)
        # stage-then-swap: never leave the dataset half-overwritten if
        # the rewrite dies mid-way (the committer protects each write;
        # the swap protects the read path between the two writes)
        staged = self._abs(path) + ".compacting"
        df.write.format(self.fmt).mode("overwrite").save(staged)
        final = self._abs(path)
        old = final + ".old"
        # Swap via rename-aside (not rmtree-then-rename): the dataset
        # is only ever absent for the instant between two renames, a
        # crash strands a complete copy at *.old / *.compacting (both
        # ignored by listings and cleaned up on the next compact), and
        # no state loses data.
        if os.path.exists(old):
            shutil.rmtree(old)
        os.rename(final, old)
        os.rename(staged, final)
        shutil.rmtree(old)
        self._write_sidecar(path, pieces=1, user=meta)
        return before

    def get(self, path: str) -> DataFrame:
        """Read the dataset; Spark concatenates all pieces/part-files."""
        return self.spark.read.format(self.fmt).load(self._abs(path))

    def delete(self, path: str) -> None:
        target = self._abs(path)
        if os.path.exists(target):
            shutil.rmtree(target)

    # -- directory ops (sdfs_client.h:32-39) ---------------------------
    def mkdir(self, path: str) -> None:
        os.makedirs(self._abs(path), exist_ok=True)

    def rmdir(self, path: str) -> None:
        self.delete(path)

    def ls_files(self, path: str = "") -> list[str]:
        """Datasets directly under `path` (dirs containing part files)."""
        base = self._abs(path) if path else self.root
        if not os.path.isdir(base):
            return []
        out = []
        for name in sorted(os.listdir(base)):
            if name.endswith((".compacting", ".old")):
                continue  # interrupted-compact leftovers, not datasets
            full = os.path.join(base, name)
            if os.path.isdir(full) and any(
                f.startswith("part-") or f == "_SUCCESS" for f in os.listdir(full)
            ):
                out.append(name)
        return out

    def ls_dirs(self, path: str = "") -> list[str]:
        base = self._abs(path) if path else self.root
        if not os.path.isdir(base):
            return []
        return sorted(
            name
            for name in os.listdir(base)
            if os.path.isdir(os.path.join(base, name))
            and not name.endswith((".compacting", ".old"))
            and not any(
                f.startswith("part-") or f == "_SUCCESS"
                for f in os.listdir(os.path.join(base, name))
            )
        )

    def get_num_shards(self, path: str) -> int:
        """Logical piece count: 1 after put, +1 per append — the
        reference's num_pieces semantics (mock_sdfs_client.cpp:527-543).
        One put/append can emit many physical part files, so the count
        lives in the sidecar, not the file listing; datasets written
        by other tools (no sidecar) fall back to the part-file count.
        """
        side = self._read_sidecar(path)
        if "pieces" in side:
            return int(side["pieces"])
        base = self._abs(path)
        if not os.path.isdir(base):
            return 0
        return sum(1 for f in os.listdir(base) if f.startswith("part-"))

    # -- metadata (sdfs.h:8; mock_sdfs_client.cpp:204, 245) ------------
    def _write_sidecar(
        self, path: str, pieces: int, user: dict[str, str]
    ) -> None:
        os.makedirs(self._abs(path), exist_ok=True)
        tmp = os.path.join(self._abs(path), _META_NAME + ".tmp")
        with open(tmp, "w") as fh:
            json.dump({"pieces": pieces, "user": user}, fh)
        # Atomic replace mirrors the reference's temp-file + rename
        # write protocol (mock_sdfs_client.cpp:192-202).
        os.replace(tmp, os.path.join(self._abs(path), _META_NAME))

    def _read_sidecar(self, path: str) -> dict:
        meta_path = os.path.join(self._abs(path), _META_NAME)
        if not os.path.exists(meta_path):
            return {}
        with open(meta_path) as fh:
            return json.load(fh)

    def get_metadata(self, path: str) -> dict[str, str]:
        return self._read_sidecar(path).get("user", {})
