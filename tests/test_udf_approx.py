"""UDF-surface and approximate-aggregate properties."""

from __future__ import annotations

from distributed_system_spark.queries.udf_q import approx_distinct


def test_approx_count_distinct_within_rsd(spark, sf_dir):
    """HLL++ estimate must land near the exact distinct count (rsd
    0.02 configured; assert a loose 10% to avoid flaky tails)."""
    rows = approx_distinct(spark, sf_dir).collect()
    assert rows
    for r in rows:
        exact = r["exact_parts"]
        assert abs(r["approx_parts"] - exact) <= max(1, 0.10 * exact)
