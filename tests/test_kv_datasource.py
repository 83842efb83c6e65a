"""The reference's KV piece-file format as a Spark DataSource
(sources/kv_datasource.py): round-trip, format parity with
functions/kv, per-piece parallelism, protocol-error surfacing."""

from __future__ import annotations

import os

import pyspark.sql.functions as F
import pytest

from distributed_system_spark.functions.kv import kv_decode
from distributed_system_spark.sources.kv_datasource import (
    register_kv_datasource,
)


def test_kv_roundtrip_with_spaces_in_value(spark, tmp_path):
    register_kv_datasource(spark)
    df = spark.createDataFrame(
        [("alpha", "1"), ("beta", "two words"), ("gamma", "x y z")],
        "key string, value string",
    )
    path = str(tmp_path / "kv")
    df.write.format("kvpieces").mode("append").option("path", path).save()
    back = spark.read.format("kvpieces").option("path", path).load()
    assert sorted((r["key"], r["value"]) for r in back.collect()) == [
        ("alpha", "1"),
        ("beta", "two words"),
        ("gamma", "x y z"),
    ]


def test_kv_reader_matches_kv_decode_on_raw_piece(spark, tmp_path):
    """The DataSource must parse exactly like the Column-level
    kv_decode: first-space split, malformed lines -> NULL key/value."""
    path = tmp_path / "kv"
    path.mkdir()
    raw = "a 1\nb two words\nmalformed_no_space\nc 3\n"
    (path / "piece-0.kv").write_text(raw)
    register_kv_datasource(spark)
    via_ds = (
        spark.read.format("kvpieces")
        .option("path", str(path))
        .load()
        .select("key", "value")
    )
    via_decode = (
        spark.read.text(str(path))
        .select(kv_decode("value").alias("kv"))
        .select(F.col("kv.key").alias("key"), F.col("kv.value").alias("value"))
    )
    assert sorted(map(tuple, via_ds.collect()), key=str) == sorted(
        map(tuple, via_decode.collect()), key=str
    )


def test_kv_write_one_piece_per_task_and_overwrite(spark, tmp_path):
    register_kv_datasource(spark)
    df = spark.range(100).select(
        F.concat(F.lit("k"), F.col("id")).alias("key"),
        F.col("id").cast("string").alias("value"),
    ).repartition(4)
    path = str(tmp_path / "kv")
    df.write.format("kvpieces").mode("append").option("path", path).save()
    pieces = [f for f in os.listdir(path) if not f.startswith((".", "_"))]
    assert len(pieces) == 4  # one piece per writer task
    back = spark.read.format("kvpieces").option("path", path).load()
    assert back.count() == 100
    # per-piece parallelism: the scan has as many partitions as pieces
    assert back.rdd.getNumPartitions() == 4
    # overwrite replaces the dataset, never interleaves stale pieces
    df.limit(10).repartition(1).write.format("kvpieces").mode(
        "overwrite"
    ).option("path", path).save()
    back2 = spark.read.format("kvpieces").option("path", path).load()
    assert back2.count() == 10
    assert len([f for f in os.listdir(path) if not f.startswith((".", "_"))]) == 1


def test_kv_writer_rejects_invalid_keys(spark, tmp_path):
    register_kv_datasource(spark)
    df = spark.createDataFrame(
        [("bad key", "v")], "key string, value string"
    )
    with pytest.raises(Exception, match="space"):
        df.write.format("kvpieces").mode("append").option(
            "path", str(tmp_path / "kv")
        ).save()
