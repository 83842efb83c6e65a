"""BPE-style merge learning over the corpus — tokenizer training as
an iterative Spark job (word-pair variant: the corpus is word-level,
so merges join adjacent WORD pairs; the algorithm is byte-pair
encoding's exactly, one abstraction level up).

Each round: count adjacent token pairs corpus-wide (one groupBy),
take the arg-max pair (count desc, then lexicographic — fully
deterministic), apply it left-to-right non-overlapping to every
document via a sequential fold *inside* `F.aggregate` (no UDF, no
per-row Python), repeat.  The driver holds only the k learned merges
— same driver-state contract as k-means' k·d centroids
(similarity_q.py).  Lineage is cut with localCheckpoint per round
(the CC-clustering pattern, dedup.py) so round r never re-runs
rounds 1..r-1's folds.

Not SQL-expressible (k data-dependent sequential passes), so the
registered query is a rows-only driver check; exactness is pinned by
`tests/test_bpe.py`, which replays the full algorithm in pure Python
on the same corpus and demands the identical merge list, counts, and
re-tokenized corpus.

Reference capability analog: the reference's wc_maple exe tokenizes
with a fixed splitter (wc_maple.cpp); learned-merge tokenization is
the trainable extension an LLM data pipeline needs from the same
scan+count machinery.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

# Joiner for merged tokens; corpus tokens are space-split words, so
# '+' cannot collide with an existing token boundary.
JOIN = "+"


def apply_merge(toks: Column | str, w1: str, w2: str) -> Column:
    """Array column with every adjacent (w1, w2) pair merged
    left-to-right, non-overlapping — the classic BPE application
    pass, as a sequential fold in `aggregate` (state = emitted
    prefix + one pending token; JVM-side, no UDF)."""
    t = F.col(toks) if isinstance(toks, str) else toks
    merged = F.lit(w1 + JOIN + w2)
    init = F.struct(
        F.array().cast("array<string>").alias("acc"),
        F.try_element_at(t, F.lit(1)).alias("pend"),  # NULL if empty
    )
    step = lambda st, x: F.when(  # noqa: E731
        (st["pend"] == F.lit(w1)) & (x == F.lit(w2)),
        F.struct(st["acc"].alias("acc"), merged.alias("pend")),
    ).otherwise(
        F.struct(
            F.concat(st["acc"], F.array(st["pend"])).alias("acc"),
            x.alias("pend"),
        )
    )
    finish = lambda st: F.when(  # noqa: E731
        st["pend"].isNull(), st["acc"]
    ).otherwise(F.concat(st["acc"], F.array(st["pend"])))
    return F.aggregate(
        F.slice(t, 2, F.greatest(F.size(t) - 1, F.lit(0))),
        init,
        step,
        finish,
    )


def pair_counts(docs: DataFrame, toks_col: str = "toks") -> DataFrame:
    """(w1, w2, cnt) adjacent-pair counts over the whole corpus —
    one flatMap-shaped explode + one partial/final groupBy."""
    grams = F.transform(
        F.sequence(F.lit(1), F.size(toks_col) - 1),
        lambda i: F.struct(
            F.element_at(toks_col, i).alias("w1"),
            F.element_at(toks_col, i + 1).alias("w2"),
        ),
    )
    # Guard docs with < 2 tokens (sequence(1, 0) would descend).
    pairs = docs.filter(F.size(toks_col) >= 2).select(
        F.explode(grams).alias("g")
    )
    return pairs.groupBy("g.w1", "g.w2").agg(
        F.count(F.lit(1)).alias("cnt")
    )


def learn_merges(
    docs: DataFrame, k: int, text_col: str = "text"
) -> tuple[list[tuple[int, str, str, int]], DataFrame]:
    """Learn the top-k merges; return (merges, re-tokenized corpus).

    merges is [(rank, w1, w2, pair_count_at_merge_time)], rank 1-based
    in learning order.  Ties break (cnt desc, w1 asc, w2 asc) —
    deterministic regardless of partitioning.
    """
    cur = docs.select(
        "*", F.split(text_col, " ", -1).alias("toks")
    ).localCheckpoint(eager=False)
    merges: list[tuple[int, str, str, int]] = []
    for rank in range(1, k + 1):
        top = (
            pair_counts(cur)
            .orderBy(F.col("cnt").desc(), "w1", "w2")
            .limit(1)
            .collect()
        )
        if not top:
            break
        w1, w2, cnt = top[0]["w1"], top[0]["w2"], top[0]["cnt"]
        merges.append((rank, w1, w2, int(cnt)))
        cur = cur.withColumn(
            "toks", apply_merge("toks", w1, w2)
        ).localCheckpoint(eager=False)
    return merges, cur
