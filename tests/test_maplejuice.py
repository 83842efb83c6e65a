"""MapleJuice fidelity — the reference's golden-output invariant
(tests/maplejuice.cpp:249-255): maple→juice word count equals the
direct DataFrame result, order-insensitively; plus partitioners,
pipe, and the bucketed sink."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from distributed_system_spark.operators.maplejuice import (
    juice,
    maple,
    partition_by_hash,
    partition_by_range,
    partition_round_robin,
    pipe_lines,
    write_keyed_buckets,
)
from distributed_system_spark.queries.maplejuice_q import (
    doc_lines,
    wc_juice_fn,
    wc_maple_fn,
)
from distributed_system_spark.queries.wordcount_q import wordcount_df
from distributed_system_spark.sources.tables import load_table


def test_maple_juice_equals_direct_wordcount(spark, sf_dir):
    kv = maple(doc_lines(spark, sf_dir), wc_maple_fn)
    mj = juice(partition_by_hash(kv, 8, "key"), wc_juice_fn).select(
        F.col("key").alias("word"), F.col("value").cast("bigint").alias("cnt")
    )
    direct = wordcount_df(load_table(spark, sf_dir, "documents"))
    assert sorted(map(tuple, mj.collect())) == sorted(
        map(tuple, direct.collect())
    )


def test_juice_sees_complete_value_set(spark):
    kv = spark.createDataFrame(
        [("k1", "1"), ("k1", "2"), ("k2", "5"), ("k1", "bad")],
        "key string, value string",
    )
    out = juice(kv, wc_juice_fn).collect()
    assert sorted(map(tuple, out)) == [("k1", "3"), ("k2", "5")]


def test_partitioners_set_partition_counts(spark):
    df = spark.range(100).withColumn("k", F.col("id") % 7)
    assert partition_round_robin(df, 5).rdd.getNumPartitions() == 5
    assert partition_by_hash(df, 4, "k").rdd.getNumPartitions() == 4
    assert partition_by_range(df, 3, "k").rdd.getNumPartitions() <= 3


def test_hash_partitioner_colocates_keys(spark):
    """A8 without the reference's missing-modulo bug: same key, same
    partition."""
    df = spark.range(1000).withColumn("k", (F.col("id") % 13).cast("string"))
    parts = (
        partition_by_hash(df, 4, "k")
        .withColumn("pid", F.spark_partition_id())
        .groupBy("k")
        .agg(F.countDistinct("pid").alias("np"))
        .filter(F.col("np") > 1)
        .count()
    )
    assert parts == 0


def test_pipe_identity_and_failure(spark, sf_dir):
    lines = doc_lines(spark, sf_dir).limit(5)
    assert pipe_lines(lines, "cat").count() == 5
    with pytest.raises(Exception):  # noqa: B017 — Py4J wraps the task error
        pipe_lines(lines, "false").count()  # nonzero exit → job fails (A13)


def test_job_chaining_through_materialized_intermediate(
    spark, sf_dir, tmp_path
):
    """A22 (tests/maplejuice.cpp:243-247): maple's materialized output
    dir is juice's input dir — two separate jobs with a storage
    barrier, equal to the fused single-DAG result."""
    kv = maple(doc_lines(spark, sf_dir), wc_maple_fn)
    path = str(tmp_path / "intermediate")
    write_keyed_buckets(kv, path, num_buckets=8)  # job 1: maple + sink
    readback = spark.read.parquet(path).select("key", "value")
    chained = juice(readback, wc_juice_fn)  # job 2: juice from storage
    fused = juice(kv, wc_juice_fn)
    assert sorted(map(tuple, chained.collect())) == sorted(
        map(tuple, fused.collect())
    )


def test_bucket_sink_key_locality_and_idempotence(spark, sf_dir, tmp_path):
    kv = maple(doc_lines(spark, sf_dir), wc_maple_fn)
    path = str(tmp_path / "buckets")
    write_keyed_buckets(kv, path, num_buckets=8)
    first = sorted(
        map(tuple, spark.read.parquet(path).select("key", "value").collect())
    )
    multi = (
        spark.read.parquet(path)
        .groupBy("key")
        .agg(F.countDistinct("mj_bucket").alias("nb"))
        .filter(F.col("nb") > 1)
        .count()
    )
    assert multi == 0  # every key in exactly one bucket
    write_keyed_buckets(kv, path, num_buckets=8)  # idempotent overwrite
    second = sorted(
        map(tuple, spark.read.parquet(path).select("key", "value").collect())
    )
    assert first == second
