"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR
(default sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": ..., "value": total_sec, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ...}

Each query is executed with a noop sink (computes every output
column, excludes sink cost) after one warmup action to absorb JVM/
codegen startup.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from distributed_system_spark.queries import load_all  # noqa: E402
from distributed_system_spark.session import get_spark  # noqa: E402

HEADLINE = [
    "wordcount",          # flagship (reference's only workload)
    "mj_wordcount",       # same, through the maple→juice fidelity layer
    "q1_pricing",         # heaviest scan+agg (TPC-H Q1 shape)
    "q3_shipping_priority",  # 3-table join + agg + top-k (TPC-H Q3 shape)
    "q5_local_supplier_volume",  # 6-table join (TPC-H Q5 shape)
    "q10_returned_items", # selective join + agg + top-k (TPC-H Q10 shape)
    "q6_revenue_forecast",  # pure scan+filter+agg (TPC-H Q6 shape, IO-bound)
    "q9_product_profit",  # 5-table join, profit rollup (TPC-H Q9 shape)
    "q18_large_volume",   # HAVING over grouped fact + join-back (TPC-H Q18)
    "q21_waiting_supplier",  # correlated EXISTS/NOT-EXISTS (TPC-H Q21)
    "join_broadcast",     # 3-way broadcast dim join
    "join_sortmerge",     # fact-fact SMJ
    "topk_per_group",     # join + agg + window
    "window_running",     # running-total window over orders
    "dedup_simhash",      # simhash fingerprints over documents
    "text_fingerprint",   # sampled-shingle fingerprints (sparse at scale)
    "ann_topk_cosine",    # brute-force ANN over embeddings
    "kmeans_clusters",    # iterative Lloyd assignment over embeddings
    "doc_chunking",       # token-window chunking (LLM prep, shuffle-free)
    "win_session",        # session windows over events
    "embedding_neardup",  # banded-LSH cosine near-dup (the fuzzy-dedup
                          # representative: bounded candidates by design)
    "simhash_neardup",    # 64-bit simhash banded near-dup pairs (166k
                          # true near-dups at sf0.1 — the 16-bit form
                          # emitted 7.1M birthday-collision pairs and
                          # was unbenchable; 64 bits fixed the output)
    "dedup_minhash_ctrl", # MinHash+LSH on the controlled-dup-rate
                          # derived corpus (large vocab, ~5% true dups)
    "freq_heavy_hitters", # Misra-Gries sketch pass + exact verify
    "text_bm25_topk",     # BM25 ranked retrieval (inverted-index shape)
    "search_hybrid_rrf",  # BM25 + dense-cosine reciprocal-rank fusion
    "text_lm_bigram_nll", # bigram-LM perplexity gate (CCNet shape)
    "join_bloom_prune",   # Bloom runtime filter ahead of the join
    "curation_pipeline",  # FLAGSHIP: the end-to-end gate→exact-dedup→
                          # fuzzy-dedup→split composition — the one
                          # number that answers "what does a curation
                          # pass cost" (reference analog: the 5-node
                          # E2E budget, tests/maplejuice.cpp:208-210)
    "dedup_incremental",  # new-batch-vs-signature-index dedup (the
                          # steady-state ingestion shape: never
                          # re-dedups history)
    "curation_pipeline_ctrl",  # the flagship on the controlled-dup
                          # corpus: the honest wall-time of a full
                          # curation pass (the raw-corpus flagship
                          # above measures the output-quadratic
                          # degeneracy of the synthetic table as much
                          # as the plan — keep both numbers)
    "hard_negative_mining",  # cell-partitioned contrastive mining
                          # (embedding training-data prep; hyperplane-
                          # signature cells sized from corpus count —
                          # SCALE.md round-6 third-decade note)
    "drift_psi",          # the standing PSI drift monitor — benched
                          # to show monitoring is ~free (one scan
                          # into 10 counters)
    # -- round-8 additions (one-time total-seconds rebaseline: the
    # round-over-round regression gate keys on per-query deltas, so
    # new names simply have no delta their first round) --
    "lsh_neardup_prod",   # pinned-knob production near-dup contract
                          # (planted-twin corpus, exact-recall oracle)
    "lsh_neardup_adaptive",  # the production entry: corpus-count-
                          # derived band width (ceil(log2 n)+6)
    "ann_index_upsert",   # incremental ANN postings maintenance
                          # (delta-only assignment == full rebuild)
    "prep_pipeline",      # training-data prep flagship: filter ->
                          # split -> decontaminate -> pack -> report
                          # in ONE plan
    "ann_mutual_knn_graph",  # mutual-kNN graph over adaptive cells
                          # with the provable top-k gram prune
    "eval_set_builder",   # round-8 FLAGSHIP: gate -> dedup ->
                          # stratified split -> decontaminate ->
                          # pack, the eval-side of prep_pipeline
    "crossmodal_dedup_pipeline",  # round-8 FLAGSHIP: image pHash +
                          # text simhash pair sets -> multimodal
                          # drop list in one plan
    "dedup_incremental_ctrl",  # standing-index steady state on the
                          # controlled corpus (the honest incremental
                          # wall; the raw-corpus variant above is
                          # candidate-degenerate by data design)
]
# NOT here: dedup_minhash_lsh / dedup_ngram_jaccard.  They are correct
# (oracle-green at the driver's sf0.01) but this synthetic corpus has a
# ~31-word vocabulary, so at sf0.1 nearly every doc pair is a TRUE
# >=0.8-Jaccard duplicate (ngram: 3.0M qualifying pairs from 5k docs,
# 128 s even with prefix filtering) — output-quadratic is inherent to
# the data, not the plan. Real corpora (large vocab, few dups) keep
# both near-linear; embedding_neardup and simhash_neardup above measure
# the same bucketed candidate machinery on data with a sane dup rate,
# and dedup_minhash_ctrl covers MinHash-LSH on a controlled-dup-rate
# derived corpus (queries/dedup_q.py: _ctrl_corpus).


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    registry = load_all()
    spark = get_spark("bench")
    # warmup: JVM + codegen + FS metadata
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()

    times: dict[str, float] = {}
    for name in HEADLINE:
        q = registry[name]
        t0 = time.time()
        q.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        times[name] = round(time.time() - t0, 3)

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    out = {
        "metric": "headline_queries_total",
        "value": round(sum(times.values()), 3),
        "unit": "sec",
        "queries": times,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }
    prior = _latest_prior_times()
    if prior:
        deltas = {
            name: round(t / prior[name], 2)
            for name, t in times.items()
            if name in prior and prior[name] > 0
        }
        out["deltas"] = deltas  # this-run / prior-round ratio per query
        out["regressions"] = sorted(
            name for name, r in deltas.items() if r > 1.5
        )
    print(json.dumps(out))
    return 0


def _latest_prior_times() -> dict[str, float]:
    """Per-query seconds from the newest BENCH_r{N}.json the driver
    recorded, for round-over-round regression tracking."""
    import glob
    import re

    best: tuple[int, dict[str, float]] | None = None
    here = os.path.dirname(os.path.abspath(__file__))
    for path in glob.glob(os.path.join(here, "BENCH_r*.json")):
        m = re.search(r"BENCH_r(\d+)\.json$", path)
        if not m:
            continue
        try:
            with open(path) as fh:
                parsed = json.load(fh).get("parsed") or {}
            queries = parsed.get("queries") or {}
        except (OSError, json.JSONDecodeError):
            continue
        rnd = int(m.group(1))
        if queries and (best is None or rnd > best[0]):
            best = (rnd, queries)
    return best[1] if best else {}


if __name__ == "__main__":
    sys.exit(main())
