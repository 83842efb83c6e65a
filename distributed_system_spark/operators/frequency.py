"""Frequency estimation: distributed Misra-Gries heavy hitters.

The 100 TB problem this solves: a plain ``groupBy(key).count()`` over
a high-cardinality key shuffles one row per distinct key — 10^10 keys
means a 10^10-row exchange to find the 50 that matter.  The classic
two-pass fix (Misra-Gries summaries per partition, merge, exact-count
only the candidates):

1. **Candidate pass** — each partition keeps at most ``k`` counters
   (mergeable Misra-Gries): any key with global frequency >= n/k is
   GUARANTEED to survive in at least one partition's summary (if a key
   is globally s-heavy it is locally s-heavy somewhere, by averaging,
   and local MG with k >= 1/s counters never drops a locally s-heavy
   key).  Output: O(partitions x k) candidate keys — no shuffle, one
   linear scan through an Arrow-batched ``mapInPandas``.
2. **Verify pass** — broadcast the (tiny) candidate set, semi-join the
   raw rows against it (the filter evaluates at the scan, so only
   heavy keys' rows reach the aggregation), exact-count, and keep keys
   meeting the support threshold.

The final answer is EXACT (the sketch only prunes, never decides), so
the DuckDB oracle is a plain GROUP BY + HAVING — soundness of the
pruning is what the oracle comparison proves.

This is candidate generation + exact verification — the same shape as
the LSH dedup operators (operators/dedup.py) and the reference's
sort-then-diff testing philosophy: approximate structures may narrow,
only exact math may answer.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame


def misra_gries_candidates(df: DataFrame, col: str, k: int) -> DataFrame:
    """One candidate-key row per surviving Misra-Gries counter per
    partition — a guaranteed superset of every key with global
    frequency >= n/k.

    Batch-merge form of MG (each Arrow batch's exact ``value_counts``
    is merged into the counter dict, then the dict is trimmed back to
    ``k`` entries by subtracting the (k+1)-largest count): merging
    exact sub-summaries and trimming preserves the MG error bound
    (total undercount <= n_local/k per partition), so the superset
    guarantee holds while the per-row work stays vectorized.
    """

    def mg(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters: dict[str, int] = {}
        for pdf in batches:
            vc = pdf[col].value_counts()
            for key, cnt in vc.items():
                counters[key] = counters.get(key, 0) + int(cnt)
            if len(counters) > k:
                # subtract the (k+1)-th largest count from everyone;
                # drops at least all but k keys, undercounts the rest
                # by exactly that decrement (the MG invariant)
                cut = sorted(counters.values(), reverse=True)[k]
                counters = {
                    key: c - cut for key, c in counters.items() if c > cut
                }
        yield pd.DataFrame({"cand": list(counters.keys())})

    return df.mapInPandas(mg, "cand string")


def heavy_hitters(
    df: DataFrame,
    col: Column | str,
    support_pct: int = 1,
) -> DataFrame:
    """(key, cnt) for every key whose frequency is >= support_pct% of
    all rows — exact counts, sketch-pruned.

    ``support_pct`` is an integer percent so the threshold compare
    stays in integer arithmetic (cnt * 100 >= n * support_pct) —
    portable across engines with no float rounding at the boundary.
    """
    colname = col if isinstance(col, str) else "key"
    src = df.select(
        (F.col(col) if isinstance(col, str) else col).alias(colname)
    )
    # k = ceil(100 / support_pct) counters guarantee the superset
    k = -(-100 // support_pct)
    cands = misra_gries_candidates(src, colname, k).distinct()
    total = src.agg(F.count(F.lit(1)).alias("n"))
    exact = (
        src.join(F.broadcast(cands), src[colname] == cands["cand"], "semi")
        .groupBy(colname)
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    return (
        exact.crossJoin(F.broadcast(total))
        .filter(F.col("cnt") * 100 >= F.col("n") * support_pct)
        .select(F.col(colname).alias("key"), "cnt")
    )
