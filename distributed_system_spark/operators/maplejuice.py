"""The MapleJuice operator pair (reference: Maple = map+group-by-key,
Juice = reduce-per-key) re-expressed Spark-first.

Reference semantics being reproduced:

- **Maple** (A3; processor.cpp:15-41, exec loop mj_worker.cpp:310-333):
  the user exe runs once per input *file*, reads all its lines, and
  emits ``"<key> <value>"`` lines; the framework groups values by key.
  The Spark analog runs the user function once per Arrow batch (the
  batch is the "file": a contiguous chunk of one input split) via
  ``mapInPandas`` — per-batch combining inside the function is exactly
  the reference's map-side combine (B3, wc_maple.cpp:24-43).
- **Juice** (A6; processor.cpp:43-64): the user exe runs once per key
  with all that key's values, emitting final lines. Spark analog:
  ``groupBy(key).applyInPandas`` — one shuffle on the key, then the
  reduce function sees the complete value set per key.
- **Partitioners** (A7-A9; partitioner.cpp:24-98): round-robin → plain
  ``repartition(n)``; hash → ``repartition(n, col)`` (Spark applies
  the modulo the reference forgot at partitioner.cpp:50); range →
  ``repartitionByRange(n, col)`` (sampling-based, the scalable version
  of the reference's sort-all-filenames).
- **Streaming line pipe** (A21; mj_worker.cpp:452-491): ``rdd.pipe``
  is the exact analog — lines stream through the child process with
  constant memory, exe-fidelity mode for user programs.
- **Per-key bucket sink** (A4; mj_worker.cpp:354-365): the reference
  writes one SDFS file per distinct key. At 100 TB that's a
  small-files bomb, so the sink hashes keys into a bounded number of
  bucket directories (``partitionBy("mj_bucket")``) — the logical
  per-key grouping survives (a key lives in exactly one bucket) while
  the file count stays O(buckets × tasks), not O(distinct keys).

Scale notes: both operators are Arrow-batched (never row-at-a-time
Python), the juice shuffle is a single hash partitioning on the key,
and skewed keys are handled by AQE's skew-join/partition-split (on in
session.py). Exactly-once (A5/A11) is inherited from Spark's task
retry + output committer; tests assert idempotence rather than
reimplementing the reference's append-permission protocol
(mj_master.cpp:158-194).
"""

from __future__ import annotations

from collections.abc import Callable, Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame

MapleFn = Callable[[Iterable[str]], Iterable[tuple[str, str]]]
JuiceFn = Callable[[str, list[str]], Iterable[tuple[str, str]]]

KV_SCHEMA = "key string, value string"


def maple(lines: DataFrame, fn: MapleFn) -> DataFrame:
    """Run ``fn`` over batches of lines, yielding (key, value) rows.

    ``lines`` must have a single string column (one row per record,
    the reference's newline-delimited text model, processor.h:23-24).
    ``fn`` receives an iterable of lines — "the file" — and yields
    ``(key, value)`` string pairs; emitting each key once per batch
    with a combined value is the map-side-combine idiom the reference
    word count uses (wc_maple.cpp:24-43).
    """
    if len(lines.columns) != 1:
        raise ValueError(
            f"maple input must have exactly one column, got {lines.columns}"
        )
    col = lines.columns[0]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pairs = list(fn(pdf[col].tolist()))
            yield pd.DataFrame(pairs, columns=["key", "value"]).astype(str)

    return lines.mapInPandas(run, KV_SCHEMA)


def juice(
    kv: DataFrame, fn: JuiceFn, num_partitions: int | None = None
) -> DataFrame:
    """Reduce each key's complete value list with ``fn``.

    ``kv`` must have (key, value) string columns. One shuffle on the
    key (the reference's per-key intermediate files, mj_worker.cpp:
    354-365), then ``fn(key, values)`` yields final (key, value)
    pairs — the reference routes these to ``<dest>/output``
    (processor.cpp:43-54); here they stay a DataFrame for composition.
    """
    if set(kv.columns) != {"key", "value"}:
        raise ValueError(f"juice input must be (key, value), got {kv.columns}")

    def reduce_group(pdf: pd.DataFrame) -> pd.DataFrame:
        key = pdf["key"].iloc[0]
        pairs = list(fn(key, pdf["value"].tolist()))
        return pd.DataFrame(pairs, columns=["key", "value"]).astype(str)

    grouped = (
        kv.repartition(num_partitions, "key") if num_partitions else kv
    )
    return grouped.groupBy("key").applyInPandas(reduce_group, KV_SCHEMA)


# --- Partitioners (A7-A9; partitioner.cpp:24-98) --------------------------


def partition_round_robin(df: DataFrame, n: int) -> DataFrame:
    """A7: no-key repartition — Spark's round-robin distribution."""
    return df.repartition(n)


def partition_by_hash(df: DataFrame, n: int, *cols: str) -> DataFrame:
    """A8: hash-partition on columns. (Spark applies the modulo the
    reference's hash partitioner forgot, partitioner.cpp:50.)"""
    return df.repartition(n, *cols)


def partition_by_range(df: DataFrame, n: int, *cols: str) -> DataFrame:
    """A9: contiguous sorted ranges via sampling — the scalable form of
    the reference's sort-all-then-chunk (partitioner.cpp:57-98)."""
    return df.repartitionByRange(n, *cols)


# --- Exe fidelity: streaming line pipe (A21) ------------------------------


def pipe_lines(lines: DataFrame, command: str) -> DataFrame:
    """Stream records through a user command, one line per record —
    the exact analog of run_command (mj_worker.cpp:452-491): stdout
    lines are consumed as produced, constant memory.

    The RDD hop is deliberate: this is the one operator whose contract
    is "run an arbitrary user executable", which no Column expression
    expresses. Everything else in the engine stays DataFrame-side.

    ``checkCode=True`` mirrors A13 (mj_worker.cpp:318-327): a nonzero
    exe exit fails the task → job, instead of silently dropping output.
    """
    if len(lines.columns) != 1:
        raise ValueError(
            f"pipe input must have exactly one column, got {lines.columns}"
        )
    spark = lines.sparkSession
    piped = lines.rdd.map(lambda row: row[0]).pipe(command, checkCode=True)
    return spark.createDataFrame(piped.map(lambda ln: (ln,)), "line string")


# --- Per-key bucket sink (A4) ---------------------------------------------


def write_keyed_buckets(
    kv: DataFrame, path: str, num_buckets: int = 256, mode: str = "overwrite"
) -> None:
    """Materialize (key, value) rows grouped by key, hash-bucketed.

    The reference writes one file per distinct key (mj_worker.cpp:
    354-365) — at 100 TB and high key cardinality that is a
    small-files bomb, so keys are hashed into ``num_buckets``
    partition directories instead; each key maps to exactly one
    bucket, so per-key locality survives for downstream readers.
    """
    import pyspark.sql.functions as F

    (
        kv.withColumn("mj_bucket", F.pmod(F.hash("key"), F.lit(num_buckets)))
        .repartition("mj_bucket")
        .sortWithinPartitions("key")
        .write.partitionBy("mj_bucket")
        .mode(mode)
        .parquet(path)
    )
