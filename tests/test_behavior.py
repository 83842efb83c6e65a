"""Semantic invariants for the behavioral / training-prep operators —
properties that must hold at any SF, independent of the oracle hash.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from distributed_system_spark.queries.behavior import sessionize_events
from distributed_system_spark.queries.text_q import (
    dataset_split,
    weighted_sample,
)
from distributed_system_spark.sources.tables import load_table

_GAP_US = 1_800_000_000


def test_sessions_partition_events_and_respect_gap(spark, sf_dir):
    """Sessions must (a) partition the event stream — counts sum to the
    table total — and (b) never contain an intra-session gap larger
    than the 30-minute threshold, nor sit closer than the threshold to
    the user's neighboring session."""
    sessions = sessionize_events(spark, sf_dir).collect()
    ev = load_table(spark, sf_dir, "events")
    assert sum(r["n_events"] for r in sessions) == ev.count()

    # per-user, sessions ordered by start must be separated by > gap
    by_user: dict[int, list] = {}
    for r in sessions:
        by_user.setdefault(r["user_id"], []).append(r)
    for user, rows in by_user.items():
        rows.sort(key=lambda r: r["start_us"])
        for a, b in zip(rows, rows[1:]):
            assert b["start_us"] - a["end_us"] > _GAP_US, (user, a, b)

    # event-level: consecutive events inside one user's session are
    # within the gap (recomputed directly from the raw events)
    raw = (
        ev.select("user_id", F.expr("ts_ns div 1000").alias("ts_us"))
        .collect()
    )
    per_user_ts: dict[int, list[int]] = {}
    for r in raw:
        per_user_ts.setdefault(r["user_id"], []).append(r["ts_us"])
    for user, rows in by_user.items():
        ts = sorted(per_user_ts[user])
        # session boundaries recomputed naively must match session count
        n_sessions = 1 + sum(
            1 for a, b in zip(ts, ts[1:]) if b - a > _GAP_US
        )
        assert n_sessions == len(rows), user


def test_dataset_split_partitions_and_proportions(spark, sf_dir):
    """The split must cover every document exactly once and land near
    the designed 80/10/10 (md5 buckets: 205/25/26 of 256)."""
    rows = {r["split"]: r for r in dataset_split(spark, sf_dir).collect()}
    total = load_table(spark, sf_dir, "documents").count()
    assert sum(r["n_docs"] for r in rows.values()) == total
    frac = rows["train"]["n_docs"] / total
    assert 0.70 <= frac <= 0.90, frac
    assert set(rows) == {"train", "val", "test"}


def test_weighted_sample_respects_weights(spark, sf_dir):
    """Longer documents must be sampled at a higher rate than shorter
    ones (acceptance probability is proportional to n_chars), and the
    sample must be reproducible run to run."""
    docs = load_table(spark, sf_dir, "documents")
    kept = weighted_sample(spark, sf_dir)
    kept_ids = {r["doc_id"] for r in kept.collect()}
    again = {r["doc_id"] for r in weighted_sample(spark, sf_dir).collect()}
    assert kept_ids == again  # deterministic

    med = docs.agg(
        F.expr("percentile(n_chars, 0.5)").alias("m")
    ).first()["m"]
    short = docs.filter(F.col("n_chars") <= med)
    long_ = docs.filter(F.col("n_chars") > med)
    short_rate = (
        short.filter(F.col("doc_id").isin(kept_ids)).count()
        / max(short.count(), 1)
    )
    long_rate = (
        long_.filter(F.col("doc_id").isin(kept_ids)).count()
        / max(long_.count(), 1)
    )
    assert long_rate > short_rate, (short_rate, long_rate)


def test_merge_upsert_one_row_per_key(spark, sf_dir):
    """MERGE contract: exactly one output row per key — synthetic
    insert keys are negated custkeys, so they can never collide with a
    real customer at any SF (the old +100000 offset could)."""
    from distributed_system_spark.queries import load_all

    out = load_all()["merge_upsert"].fn(spark, sf_dir)
    assert out.groupBy("custkey").count().filter("count > 1").count() == 0
    inserts = out.filter("op = 'insert'")
    assert inserts.filter("custkey >= 0").count() == 0


def test_pagerank_is_a_probability_distribution(spark, sf_dir):
    """With every node having out-edges (no dangling mass), the rank
    vector must stay a probability distribution through the
    iterations, and every rank must be positive."""
    from distributed_system_spark.queries.behavior import (
        pagerank_transitions,
    )

    rows = pagerank_transitions(spark, sf_dir).collect()
    assert len(rows) == 5  # one rank per event type
    total = sum(r["pagerank"] for r in rows)
    assert abs(total - 1.0) < 1e-6
    assert all(r["pagerank"] > 0 for r in rows)
