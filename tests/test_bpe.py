"""BPE merge learning vs a pure-Python reference replay: identical
merge lists AND identical re-tokenized corpus on the real sf0.001
documents — the rows-only query's exactness proof."""

from __future__ import annotations

from collections import Counter

import pyspark.sql.functions as F

from distributed_system_spark.operators.bpe import (
    JOIN,
    apply_merge,
    learn_merges,
)


def _py_apply(toks: list[str], w1: str, w2: str) -> list[str]:
    out, pend = [], toks[0] if toks else None
    for x in toks[1:]:
        if pend == w1 and x == w2:
            pend = w1 + JOIN + w2
        else:
            out.append(pend)
            pend = x
    if pend is not None:
        out.append(pend)
    return out


def _py_learn(texts: dict[int, str], k: int):
    corpus = {i: t.split(" ") for i, t in texts.items()}
    merges = []
    for rank in range(1, k + 1):
        counts: Counter = Counter()
        for toks in corpus.values():
            for a, b in zip(toks, toks[1:]):
                counts[(a, b)] += 1
        if not counts:
            break
        (w1, w2), cnt = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        merges.append((rank, w1, w2, cnt))
        corpus = {i: _py_apply(t, w1, w2) for i, t in corpus.items()}
    return merges, corpus


def test_apply_merge_fold_semantics(spark):
    rows = [
        (1, ["a", "b", "a", "b"]),      # two disjoint merges
        (2, ["a", "a", "a"]),           # overlap: left-to-right
        (3, ["a"]),                     # single token
        (4, []),                        # empty
        (5, ["x", "a", "b", "b", "a"]),  # merge mid-sequence
    ]
    df = spark.createDataFrame(rows, "id INT, toks ARRAY<STRING>")
    got = {
        r.id: r.m
        for r in df.select(
            "id", apply_merge("toks", "a", "b").alias("m")
        ).collect()
    }
    assert got[1] == ["a+b", "a+b"]
    assert got[3] == ["a"]
    assert got[4] == []
    assert got[5] == ["x", "a+b", "b", "a"]
    # Overlap uses (a, a):
    got2 = {
        r.id: r.m
        for r in df.select(
            "id", apply_merge("toks", "a", "a").alias("m")
        ).collect()
    }
    assert got2[2] == ["a+a", "a"]


def test_learned_merges_match_python_reference(spark, sf_dir):
    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "text")
    )
    texts = {r.doc_id: r.text for r in docs.collect()}
    py_merges, py_corpus = _py_learn(texts, k=5)
    sp_merges, sp_corpus = learn_merges(docs, k=5)
    assert sp_merges == py_merges
    # The re-tokenized corpus matches doc-for-doc.
    got = {
        r.doc_id: list(r.toks)
        for r in sp_corpus.select("doc_id", "toks").collect()
    }
    assert got == py_corpus
    # Learned pair counts decrease (or tie) with rank.
    cnts = [m[3] for m in sp_merges]
    assert all(a >= b for a, b in zip(cnts, cnts[1:]))
