"""Distributed-built Bloom filter broadcast as a runtime join pre-filter.

The pattern Spark's own runtime row-level filtering
(``spark.sql.optimizer.runtime.bloomFilter.enabled``) applies
JVM-side, materialized explicitly: build a Bloom filter over the
small (dimension) side's join keys, broadcast it inside an
Arrow-batched Pandas UDF closure, and drop big-side rows that cannot
match *before* they reach the join.  False positives are possible and
harmless — the exact join afterwards removes them — so the final
result is exact; false negatives are impossible (every inserted key
probes the same ``k`` bit positions it set).

The bit array is BUILT DISTRIBUTED (``bloom_from_df``): each
partition folds its keys into a local m-bit array inside one
Arrow-batched ``mapInPandas`` pass, and the driver only ever OR-folds
the fixed-size partials — it never holds the key list.  Driver/
closure state is exactly m/8 bytes (12 bits/key packed), so the
filter scales with the chosen m, not with however many raw keys the
dimension subset happens to contain at a larger SF.

Hashing is splitmix64 (public-domain finalizer constants), fully
vectorized in numpy over each Arrow batch — no per-row Python.  The
double-hashing scheme h_i = h1 + i*h2 (Kirsch–Mitzenmacher) derives
the ``k`` probe positions from two base hashes.  Bits are packed
8-per-byte (uint8) both in transit and in the probe closure.

Reference capability analog: the reference prunes work by routing
keys to their shard before fetching (hash partitioner,
partitioner.cpp); a Bloom runtime filter is the same
"cheap membership check before expensive movement" idea applied to a
join's build side.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

_SEED_A = 0x9E3779B97F4A7C15
_SEED_B = 0xC2B2AE3D27D4EB4F


def _splitmix64(x: np.ndarray, seed: int) -> np.ndarray:
    """Vectorized splitmix64 finalizer over uint64 values."""
    with np.errstate(over="ignore"):
        z = x + np.uint64(seed)
        z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        return z ^ (z >> np.uint64(31))


def _set_bits(packed: np.ndarray, keys: np.ndarray, m: int, k: int) -> None:
    """Fold int64 ``keys`` into the packed (uint8) m-bit array."""
    x = keys.view(np.uint64)
    h1 = _splitmix64(x, _SEED_A)
    h2 = _splitmix64(x, _SEED_B) | np.uint64(1)
    with np.errstate(over="ignore"):
        for i in range(k):
            idx = ((h1 + np.uint64(i) * h2) % np.uint64(m)).astype(
                np.int64
            )
            np.bitwise_or.at(
                packed, idx >> 3, np.uint8(1) << (idx & 7).astype(np.uint8)
            )


def build_bloom(
    keys: np.ndarray | list[int], bits_per_key: int = 12, k: int = 6
) -> tuple[np.ndarray, int]:
    """Build a PACKED Bloom bit array from int64 join keys (local
    form, for tests and already-materialized key lists).

    Returns ``(packed, m)`` where ``packed`` is a uint8 array of
    ceil(m/8) bytes.  At 12 bits/key with k=6 the false-positive rate
    is ~0.3%; m scales linearly with the build side, which by
    construction is the broadcast-small side of the join.
    """
    arr = np.asarray(keys, dtype=np.int64)
    m = max(64, bits_per_key * max(1, arr.size))
    packed = np.zeros((m + 7) // 8, dtype=np.uint8)
    _set_bits(packed, arr, m, k)
    return packed, m


_TREE_FANIN = 64


def bloom_from_df(
    df: DataFrame, col: str, bits_per_key: int = 12, k: int = 6
) -> tuple[np.ndarray, int]:
    """DISTRIBUTED Bloom build over a DataFrame column.

    Two passes, neither of which ships keys to the driver: a count()
    (parquet-metadata cheap) fixes m, then one Arrow-batched
    ``mapInPandas`` pass folds each partition's keys into a local
    packed m-bit array and emits it as a single binary row.  The
    partials (m/8 bytes each — at the 12-bits/key default that is
    ~1.5 bytes per build-side key TOTAL, the same bounded size
    regardless of how many keys a partition holds) are OR-folded as a
    TREE: while more than ``_TREE_FANIN`` partials remain, they are
    repartitioned ~FANIN-to-1 and OR-ed inside executors, a log-step
    reduction that composes into the same single job.  The driver
    therefore collects at most ``_TREE_FANIN`` partials no matter the
    executor count — at 100 k input partitions and a 100 MB filter
    the flat fold would have shipped ~10 TB to the driver; the tree
    ships <=64 partials per level into executors and <=64 to the
    driver.  (Reference analog: the commit fan-in the MapleJuice
    master serializes one-at-a-time, mj_master.cpp:59-70.)
    """
    keyed = df.select(F.col(col).cast("long").alias("key")).na.drop()
    n = keyed.count()
    m = max(64, bits_per_key * max(1, n))
    nbytes = (m + 7) // 8

    def partial(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        acc = np.zeros(nbytes, dtype=np.uint8)
        seen = False
        for pdf in batches:
            keys = pdf["key"].dropna().to_numpy(dtype=np.int64)
            if keys.size:
                _set_bits(acc, keys, m, k)
                seen = True
        if seen:
            yield pd.DataFrame({"bloom": [acc.tobytes()]})

    def or_fold(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        acc = np.zeros(nbytes, dtype=np.uint8)
        seen = False
        for pdf in batches:
            for buf in pdf["bloom"]:
                acc |= np.frombuffer(buf, dtype=np.uint8)
                seen = True
        if seen:
            yield pd.DataFrame({"bloom": [acc.tobytes()]})

    partials = keyed.mapInPandas(partial, schema="bloom binary")
    width = keyed.rdd.getNumPartitions()  # upper bound on partial count
    while width > _TREE_FANIN:
        width = -(-width // _TREE_FANIN)
        partials = partials.repartition(width).mapInPandas(
            or_fold, schema="bloom binary"
        )
    packed = np.zeros(nbytes, dtype=np.uint8)
    for r in partials.collect():
        packed |= np.frombuffer(r["bloom"], dtype=np.uint8)
    return packed, m


def might_contain(packed: np.ndarray, m: int, k: int = 6):
    """Pandas-UDF factory: boolean membership test for an int64 column.

    The packed bit array rides the UDF closure (broadcast once per
    executor by Spark's task serialization — m/8 bytes); each Arrow
    batch is probed with ``k`` vectorized gathers — no per-row Python.
    """

    @F.pandas_udf("boolean")
    def _might(s: pd.Series) -> pd.Series:
        # NULL keys probe as False instead of crashing the task: a
        # nullable join key is the common case for a runtime filter,
        # and NaN -> int64 raises in numpy.  (A null never equi-joins
        # anyway, so False is also the semantically-pruning answer.)
        null = s.isna().to_numpy()
        x = (
            s.fillna(0).to_numpy(dtype=np.int64).view(np.uint64)
        )
        h1 = _splitmix64(x, _SEED_A)
        h2 = _splitmix64(x, _SEED_B) | np.uint64(1)
        ok = np.ones(x.size, dtype=bool)
        with np.errstate(over="ignore"):
            for i in range(k):
                idx = ((h1 + np.uint64(i) * h2) % np.uint64(m)).astype(
                    np.int64
                )
                ok &= (
                    packed[idx >> 3] >> (idx & 7).astype(np.uint8)
                ) & np.uint8(1) > 0
        ok &= ~null
        return pd.Series(ok)

    return _might


def bloom_prune(col: Column | str, keys: list[int], bits_per_key: int = 12,
                k: int = 6) -> Column:
    """Convenience: a boolean Column that is True iff ``col`` might be
    one of ``keys`` (no false negatives).  Local-build form; for a
    DataFrame build side use ``bloom_prune_df``."""
    packed, m = build_bloom(keys, bits_per_key=bits_per_key, k=k)
    c = F.col(col) if isinstance(col, str) else col
    return might_contain(packed, m, k=k)(c)


def bloom_prune_df(
    col: Column | str,
    build: DataFrame,
    build_col: str,
    bits_per_key: int = 12,
    k: int = 6,
) -> Column:
    """Boolean Column pruning ``col`` against a DISTRIBUTED-built
    Bloom filter over ``build[build_col]`` — the key list never
    reaches the driver (see ``bloom_from_df``)."""
    packed, m = bloom_from_df(build, build_col, bits_per_key=bits_per_key, k=k)
    c = F.col(col) if isinstance(col, str) else col
    return might_contain(packed, m, k=k)(c)
