"""Bucketed-table co-located joins: pre-shuffling fact tables into the
same bucket layout removes the per-query shuffle entirely — the Spark
analog of the reference pre-partitioning its input files per worker
(partitioner.cpp) so each node processes its own slice.

At 100 TB this is the difference between shuffling both fact tables on
every join and shuffling each exactly once at write time.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from distributed_system_spark.sources.tables import load_table


def _final_plan(df) -> str:
    df.collect()
    return (
        df._jdf.queryExecution()
        .executedPlan()
        .toString()
        .split("== Initial Plan ==")[0]
    )


def test_bucketed_join_is_shuffle_free(spark, sf_dir):
    for t in ("b_orders", "b_lineitem"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
    load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus"
    ).write.bucketBy(8, "o_orderkey").sortBy("o_orderkey").mode(
        "overwrite"
    ).saveAsTable("b_orders")
    load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice"
    ).write.bucketBy(8, "l_orderkey").sortBy("l_orderkey").mode(
        "overwrite"
    ).saveAsTable("b_lineitem")
    try:
        joined = (
            spark.table("b_lineitem")
            .hint("merge")
            .join(
                spark.table("b_orders"),
                F.col("l_orderkey") == F.col("o_orderkey"),
            )
        )
        plan = _final_plan(joined)
        assert "SortMergeJoin" in plan, plan
        assert "Exchange" not in plan, plan  # co-located: zero shuffles
        # same join on the raw (unbucketed) parquet shuffles both sides
        raw = (
            load_table(spark, sf_dir, "lineitem")
            .select("l_orderkey", "l_extendedprice")
            .hint("merge")
            .join(
                load_table(spark, sf_dir, "orders").select(
                    "o_orderkey", "o_orderstatus"
                ),
                F.col("l_orderkey") == F.col("o_orderkey"),
            )
        )
        assert "Exchange" in _final_plan(raw)
        # and the bucketed join returns the same row count
        assert joined.count() == raw.count()
    finally:
        for t in ("b_orders", "b_lineitem"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")
