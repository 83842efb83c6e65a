"""Tests for retrieval/LM scoring queries and the Bloom runtime
filter: BM25 ranking sanity, bigram-LM probability properties, and
the Bloom filter's no-false-negative guarantee + pruning power."""

from __future__ import annotations

import numpy as np
import pyspark.sql.functions as F
import pytest

from distributed_system_spark.operators.bloom import (
    bloom_from_df,
    bloom_prune,
    build_bloom,
    might_contain,
)
from distributed_system_spark.queries import load_all


@pytest.fixture(scope="module")
def registry():
    return load_all()


def test_bm25_topk_ranked_and_bounded(spark, sf_dir, registry):
    rows = registry["text_bm25_topk"].fn(spark, sf_dir).collect()
    assert 0 < len(rows) <= 20
    # Ranks are 1..n and scores non-increasing along them.
    ranks = [r.rnk for r in rows]
    assert sorted(ranks) == list(range(1, len(rows) + 1))
    by_rank = sorted(rows, key=lambda r: r.rnk)
    scores = [r.score for r in by_rank]
    assert all(a >= b for a, b in zip(scores, scores[1:]))
    assert all(r.score > 0 for r in rows)


def test_lm_bigram_nll_is_valid_log_prob(spark, sf_dir, registry):
    df = registry["text_lm_bigram_nll"].fn(spark, sf_dir)
    rows = df.collect()
    assert rows
    # Add-one smoothing: every bigram probability is in (0, 1), so
    # each per-doc average NLL is strictly positive and finite.
    assert all(r.avg_nll > 0 for r in rows)
    assert all(np.isfinite(r.avg_nll) for r in rows)
    # Docs with >= 2 tokens all appear exactly once.
    n_docs_with_bigrams = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .filter(F.size(F.split("text", " ", -1)) >= 2)
        .count()
    )
    assert len(rows) == n_docs_with_bigrams


def test_lm_bigram_nll_tolerates_one_token_docs(spark, tmp_path):
    """Regression (ADVICE r4): a 1-token doc made sequence(1, size-1)
    descend to [1, 0], and element_at(toks, 0) threw
    INVALID_ARRAY_INDEX_IN_ELEMENT_AT, killing the whole query.  Such
    docs must instead drop out (no bigrams), matching the oracle's
    silent unnest-of-empty behavior."""
    registry = load_all()
    docs = spark.createDataFrame(
        [
            (1, "one", "en", "web", 3),
            (2, "", "en", "web", 0),
            (3, "two tokens here", "en", "web", 15),
            (4, "a b a b", "en", "web", 7),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    docs.write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet")
    )
    rows = registry["text_lm_bigram_nll"].fn(spark, str(tmp_path)).collect()
    assert sorted(r.doc_id for r in rows) == [3, 4]
    assert all(np.isfinite(r.avg_nll) and r.avg_nll > 0 for r in rows)


def test_bloom_no_false_negatives_and_low_fp_rate(spark):
    # `spark` is unused directly, but might_contain() builds a
    # pandas_udf whose DDL parse needs a live SparkContext — without
    # the fixture this test only passes when another test created one
    # first (order-dependent under -k subsets).
    rng = np.random.default_rng(7)
    members = rng.choice(10**9, size=2000, replace=False).astype(np.int64)
    bits, m = build_bloom(members)
    # Probe members and non-members through the same numpy path the
    # UDF uses (call the pandas_udf's wrapped function directly).
    import pandas as pd

    udf_fn = might_contain(bits, m)
    inner = udf_fn.func  # the underlying pandas function
    got = inner(pd.Series(members))
    assert bool(got.all()), "Bloom filter produced a false negative"
    non_members = (members.max() + 1 + np.arange(20000)).astype(np.int64)
    fp = inner(pd.Series(non_members)).to_numpy().mean()
    assert fp < 0.02, f"false-positive rate too high: {fp}"
    # NULL keys (ADVICE r4): must return False, not crash the batch —
    # a nullable join key is the common case for a runtime filter.
    mixed = pd.Series([float(members[0]), None, float(members[1]), None])
    got_mixed = inner(mixed).to_numpy()
    assert got_mixed.tolist() == [True, False, True, False]


def test_distributed_bloom_build_equals_local(spark):
    """bloom_from_df (per-partition partials OR-folded, key list never
    on the driver) must produce EXACTLY the bit array of the local
    build_bloom over the same keys — same m, same packed bytes — so
    every membership guarantee proven for the local form transfers.
    NULL keys in the build column are dropped, not hashed."""
    keys = [3, 17, 90001, -5, 2**40 + 7]
    df = spark.createDataFrame(
        [(k,) for k in keys] + [(None,)], "k long"
    ).repartition(4)
    dist_bits, dist_m = bloom_from_df(df, "k")
    local_bits, local_m = build_bloom(np.array(keys, dtype=np.int64))
    assert dist_m == local_m
    assert np.array_equal(dist_bits, local_bits)


def test_bloom_tree_fold_equals_local(spark, monkeypatch):
    """The log-step tree OR-fold (taken whenever partial count exceeds
    _TREE_FANIN — forced here with fan-in 2 over 16 partitions, two
    tree levels) must produce the identical bit array to the local
    build: OR is associative/commutative, so the reduction shape must
    be invisible in the result."""
    from distributed_system_spark.operators import bloom as bloom_mod

    monkeypatch.setattr(bloom_mod, "_TREE_FANIN", 2)
    keys = list(range(0, 3000, 7))
    df = spark.createDataFrame(
        [(k,) for k in keys], "k long"
    ).repartition(16)
    dist_bits, dist_m = bloom_mod.bloom_from_df(df, "k")
    local_bits, local_m = build_bloom(np.array(keys, dtype=np.int64))
    assert dist_m == local_m
    assert np.array_equal(dist_bits, local_bits)


def test_join_bloom_prune_exact_and_pruning(spark, sf_dir, registry):
    # The registered query's result must equal the plain semi-join.
    got = registry["join_bloom_prune"].fn(spark, sf_dir).collect()
    supp = (
        spark.read.parquet(f"{sf_dir}/supplier.parquet")
        .filter(F.col("s_nationkey") <= 4)
        .select("s_suppkey")
    )
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    expect = {
        (r.l_suppkey, r.n_items)
        for r in li.join(
            F.broadcast(supp),
            li["l_suppkey"] == supp["s_suppkey"],
            "left_semi",
        )
        .groupBy("l_suppkey")
        .agg(F.count(F.lit(1)).alias("n_items"))
        .collect()
    }
    assert {(r.l_suppkey, r.n_items) for r in got} == expect

    # The Bloom pre-filter actually prunes: survivors are a superset
    # of true matches but a strict subset of the full fact table.
    keys = [r[0] for r in supp.collect()]
    survivors = li.filter(bloom_prune("l_suppkey", keys)).count()
    true_matches = li.join(
        F.broadcast(supp), li["l_suppkey"] == supp["s_suppkey"], "left_semi"
    ).count()
    total = li.count()
    assert true_matches <= survivors < total


def test_dq_expectations_pass_on_clean_data(spark, sf_dir, registry):
    rows = registry["dq_expectations"].fn(spark, sf_dir).collect()
    assert len(rows) == 6
    by_name = {r.check_name: r for r in rows}
    # The driver-generated orders table satisfies every expectation.
    for name, r in by_name.items():
        assert r.passed, f"{name}: metric={r.metric} < {r.threshold}"
        assert 0.0 <= r.metric <= 1.0


def test_reachability_bfs_hops_are_bfs_distances(spark, sf_dir, registry):
    rows = registry["reachability_bfs"].fn(spark, sf_dir).collect()
    hops = {r.node: r.hops for r in rows}
    assert hops.get("signup") == 0
    assert all(0 <= h <= 4 for h in hops.values())
    # Every reported node is a real event type.
    types = {
        r.event_type
        for r in spark.read.parquet(f"{sf_dir}/events.parquet")
        .select("event_type")
        .distinct()
        .collect()
    }
    assert set(hops) <= types


def test_token_ids_roundtrip_decode(spark, sf_dir, registry):
    out = registry["text_token_ids"].fn(spark, sf_dir)
    docs = {
        r.doc_id: r.text
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    }
    # Rebuild the frequency-ranked vocab independently and decode.
    from collections import Counter

    counts = Counter(
        tok for text in docs.values() for tok in text.split(" ")
    )
    ranked = sorted(counts, key=lambda t: (-counts[t], t))
    id2tok = {i + 1: t for i, t in enumerate(ranked)}
    for r in out.limit(50).collect():
        decoded = " ".join(
            id2tok[int(i)] for i in r.token_ids.split(",")
        )
        assert decoded == docs[r.doc_id]
        assert r.n_tokens == len(docs[r.doc_id].split(" "))


def test_containment_prefix_filter_is_lossless(spark):
    """containment_pairs must find exactly the pairs an exhaustive
    all-pairs scan finds — the prefix filter may only prune
    non-qualifying candidates — and containment is directional."""
    from distributed_system_spark.operators.dedup import (
        containment_pairs,
        doc_tokens,
    )

    rows = [
        (1, "a b c d e f g h i j"),          # base
        (2, "a b c d e f g h i j k l"),      # superset of 1
        (3, "a b c d e f g h i x"),          # 9/10 of 1's tokens
        (4, "z y x w v u t s r q"),          # unrelated
        (5, "a b c"),                        # tiny subset of 1 and 2
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    toks = doc_tokens(docs)
    got = {
        (r.id_a, r.id_b): r.containment
        for r in containment_pairs(toks, 0.9).collect()
    }
    # Exhaustive reference: python sets.
    sets = {i: set(t.split()) for i, t in rows}
    expect = {}
    for a in sets:
        for b in sets:
            if a == b:
                continue
            c = round(len(sets[a] & sets[b]) / len(sets[a]), 6)
            if c >= 0.9:
                expect[(a, b)] = c
    assert got == expect
    # Directionality spot-checks: 1 ⊂ 2 fully, but 2 ⊄ 1.
    assert got[(1, 2)] == 1.0 and (2, 1) not in got
    assert got[(5, 1)] == 1.0 and (1, 5) not in got


def test_hybrid_rrf_fuses_both_rankings(spark, sf_dir, registry):
    rows = registry["search_hybrid_rrf"].fn(spark, sf_dir).collect()
    assert len(rows) == 20
    by_rank = sorted(rows, key=lambda r: r.rnk)
    scores = [r.rrf for r in by_rank]
    assert all(a >= b for a, b in zip(scores, scores[1:]))
    # Max possible RRF = 1/61 + 1/61; docs in only one list score
    # at most 1/61 — a doc ranked #1 in both systems must beat any
    # single-system doc.
    assert all(0 < s <= round(2 / 61, 6) + 1e-9 for s in scores)
    # Fusion really uses both systems: at least one fused doc must
    # come from each source top-50 list.
    bm = {
        r.doc_id
        for r in registry["text_bm25_topk"].fn(spark, sf_dir).collect()
    }
    fused = {r.doc_id for r in rows}
    assert fused & bm, "no BM25 docs survived fusion"
    assert fused - bm, "fusion is just the BM25 list"


def test_entropy_bounds_and_extremes(spark, sf_dir, registry):
    import math

    from distributed_system_spark.queries.retrieval_q import text_entropy

    rows = text_entropy(spark, sf_dir).collect()
    assert rows
    # 0 <= H <= ln(n_tokens) for every doc.
    for r in rows:
        assert -1e-6 <= r.entropy <= math.log(r.n_tokens) + 1e-6  # 6-dec rounding
    # Extremes on a synthetic pair: all-same tokens → 0; all-distinct
    # tokens → ln(n).
    docs = spark.createDataFrame(
        [(1, "x x x x x x x x"), (2, "a b c d e f g h")],
        ["doc_id", "text"],
    )
    import os
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        docs.write.parquet(os.path.join(d, "documents.parquet"))
        got = {
            r.doc_id: r.entropy
            for r in text_entropy(spark, d).collect()
        }
    assert got[1] == 0.0
    assert abs(got[2] - round(math.log(8), 6)) < 1e-9
