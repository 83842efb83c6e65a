"""UDF-surface and approximate-aggregate properties."""

from __future__ import annotations

from distributed_system_spark.queries.udf_q import approx_distinct


def test_approx_percentile_within_tolerance(spark, sf_dir):
    """approx_percentile (the 100 TB path — no per-group sort) must
    land near the exact interpolated percentile."""
    import pyspark.sql.functions as F

    from distributed_system_spark.sources.tables import load_table

    li = load_table(spark, sf_dir, "lineitem")
    rows = li.groupBy("l_returnflag").agg(
        F.percentile("l_extendedprice", F.lit(0.5)).alias("exact"),
        F.expr(
            "approx_percentile(l_extendedprice, 0.5, 1000)"
        ).alias("approx"),
    ).collect()
    assert rows
    for r in rows:
        assert abs(r["approx"] - r["exact"]) <= 0.02 * abs(r["exact"]) + 1


def test_approx_count_distinct_within_rsd(spark, sf_dir):
    """HLL++ estimate must land near the exact distinct count (rsd
    0.02 configured; assert a loose 10% to avoid flaky tails).  The
    query's own output certifies the contract as a boolean (so the
    oracle hash-checks it); this test re-derives the raw estimate to
    keep the estimate-level bound pinned too."""
    import pyspark.sql.functions as F

    from distributed_system_spark.sources.tables import load_table

    rows = approx_distinct(spark, sf_dir).collect()
    assert rows
    assert all(r["within_rel_err"] for r in rows)
    li = load_table(spark, sf_dir, "lineitem")
    raw = {
        r["l_returnflag"]: r
        for r in li.groupBy("l_returnflag")
        .agg(
            F.approx_count_distinct("l_partkey", rsd=0.02).alias("approx"),
            F.countDistinct("l_partkey").alias("exact"),
        )
        .collect()
    }
    for r in raw.values():
        assert abs(r["approx"] - r["exact"]) <= max(1, 0.10 * r["exact"])


def test_hll_sketch_rollup_accuracy_and_merge(spark, sf_dir):
    """DataSketches HLL: per-type estimates within 5% of exact, and
    the merged (union) sketch estimate within 5% of the true global
    distinct-user count — the re-aggregation property that makes
    sketches the 100 TB rollup primitive."""
    import pyspark.sql.functions as F

    from distributed_system_spark.queries.udf_q import hll_mergeable_rollup
    from distributed_system_spark.sources.tables import load_table

    rows = {r["event_type"]: r for r in
            hll_mergeable_rollup(spark, sf_dir).collect()}
    assert "ALL" in rows and len(rows) >= 2
    assert all(r["within_rel_err"] for r in rows.values())
    ev = load_table(spark, sf_dir, "events")
    # estimate-level bounds, re-derived raw (the query itself now
    # certifies them as booleans so the oracle can hash-check)
    raw = {
        r["event_type"]: r
        for r in ev.groupBy("event_type")
        .agg(
            F.hll_sketch_estimate(
                F.hll_sketch_agg("user_id", F.lit(14))
            ).alias("approx_users"),
            F.countDistinct("user_id").alias("exact_users"),
        )
        .collect()
    }
    for r in raw.values():
        exact = r["exact_users"]
        assert abs(r["approx_users"] - exact) <= max(1, 0.05 * exact), r
    true_global = ev.select("user_id").distinct().count()
    # the re-aggregation property: UNION-merging the per-type
    # sketches estimates the true global as well as sketching the
    # union directly
    merged = (
        ev.groupBy("event_type")
        .agg(F.hll_sketch_agg("user_id", F.lit(14)).alias("sk"))
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("m"))
        .collect()[0]["m"]
    )
    direct = (
        ev.agg(
            F.hll_sketch_estimate(
                F.hll_sketch_agg("user_id", F.lit(14))
            ).alias("m")
        ).collect()[0]["m"]
    )
    assert abs(merged - true_global) <= max(1, 0.05 * true_global)
    assert abs(direct - true_global) <= max(1, 0.05 * true_global)


def test_misra_gries_superset_guarantee_under_skew(spark):
    """The MG candidate pass must NEVER lose a key meeting the support
    threshold, however the rows are partitioned.  Adversarial fixture:
    one key exactly AT 1% support, a sea of near-unique noise keys to
    force constant counter eviction, heavy keys spread across
    partitions; verified over several partitionings."""
    import pyspark.sql.functions as F

    from distributed_system_spark.operators.frequency import (
        heavy_hitters,
        misra_gries_candidates,
    )

    n = 10_000
    rows = (
        [("at_threshold",)] * 100          # exactly 1.0%
        + [("heavy_a",)] * 900             # 9%
        + [("heavy_b",)] * 500             # 5%
        + [(f"noise_{i}",) for i in range(n - 1500)]
    )
    df = spark.createDataFrame(rows, "tok string")
    want = {("heavy_a", 900), ("heavy_b", 500), ("at_threshold", 100)}
    for parts in (1, 4, 13):
        src = df.repartition(parts, F.rand(seed=parts))
        got = {
            (r["key"], r["cnt"])
            for r in heavy_hitters(src, "tok", support_pct=1).collect()
        }
        assert got == want, (parts, got)
        # candidate set stays sketch-sized, not cardinality-sized
        n_cand = misra_gries_candidates(
            src.select(F.col("tok")), "tok", 100
        ).distinct().count()
        assert n_cand <= parts * 100, (parts, n_cand)
