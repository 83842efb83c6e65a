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
    0.02 configured; assert a loose 10% to avoid flaky tails)."""
    rows = approx_distinct(spark, sf_dir).collect()
    assert rows
    for r in rows:
        exact = r["exact_parts"]
        assert abs(r["approx_parts"] - exact) <= max(1, 0.10 * exact)
