"""Driver-built Bloom filter broadcast as a runtime join pre-filter.

The pattern Spark's own runtime row-level filtering
(``spark.sql.optimizer.runtime.bloomFilter.enabled``) applies
JVM-side, materialized explicitly: build a Bloom filter over the
small (dimension) side's join keys, broadcast it inside an
Arrow-batched Pandas UDF closure, and drop big-side rows that cannot
match *before* they reach the join.  False positives are possible and
harmless — the exact join afterwards removes them — so the final
result is exact; false negatives are impossible (every inserted key
probes the same ``k`` bit positions it set).

Hashing is splitmix64 (public-domain finalizer constants), fully
vectorized in numpy over each Arrow batch — no per-row Python.  The
double-hashing scheme h_i = h1 + i*h2 (Kirsch–Mitzenmacher) derives
the ``k`` probe positions from two base hashes.

Reference capability analog: the reference prunes work by routing
keys to their shard before fetching (hash partitioner,
partitioner.cpp); a Bloom runtime filter is the same
"cheap membership check before expensive movement" idea applied to a
join's build side.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import Column

_SEED_A = 0x9E3779B97F4A7C15
_SEED_B = 0xC2B2AE3D27D4EB4F


def _splitmix64(x: np.ndarray, seed: int) -> np.ndarray:
    """Vectorized splitmix64 finalizer over uint64 values."""
    with np.errstate(over="ignore"):
        z = x + np.uint64(seed)
        z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        return z ^ (z >> np.uint64(31))


def build_bloom(
    keys: np.ndarray | list[int], bits_per_key: int = 12, k: int = 6
) -> tuple[np.ndarray, int]:
    """Build a Bloom bit array from int64 join keys.

    Returns ``(bits, m)`` where ``bits`` is a bool array of size
    ``m``.  At 12 bits/key with k=6 the false-positive rate is
    ~0.3%; m scales linearly with the build side, which by
    construction is the broadcast-small side of the join.
    """
    arr = np.asarray(keys, dtype=np.int64).view(np.uint64)
    m = max(64, bits_per_key * max(1, arr.size))
    bits = np.zeros(m, dtype=bool)
    h1 = _splitmix64(arr, _SEED_A)
    h2 = _splitmix64(arr, _SEED_B) | np.uint64(1)
    with np.errstate(over="ignore"):
        for i in range(k):
            bits[((h1 + np.uint64(i) * h2) % np.uint64(m)).astype(np.int64)] = True
    return bits, m


def might_contain(bits: np.ndarray, m: int, k: int = 6):
    """Pandas-UDF factory: boolean membership test for an int64 column.

    The bit array rides the UDF closure (broadcast once per executor
    by Spark's task serialization); each Arrow batch is probed with
    ``k`` vectorized gathers — no per-row Python.
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
                ok &= bits[idx]
        ok &= ~null
        return pd.Series(ok)

    return _might


def bloom_prune(col: Column | str, keys: list[int], bits_per_key: int = 12,
                k: int = 6) -> Column:
    """Convenience: a boolean Column that is True iff ``col`` might be
    one of ``keys`` (no false negatives)."""
    bits, m = build_bloom(keys, bits_per_key=bits_per_key, k=k)
    c = F.col(col) if isinstance(col, str) else col
    return might_contain(bits, m, k=k)(c)
