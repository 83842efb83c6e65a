"""KV codec edge cases — processor.cpp:27-37 semantics: split at the
FIRST space; a line with no space is a protocol error (the reference
fails the job, mj_worker.cpp:318-327; we surface NULLs)."""

from __future__ import annotations

import pyspark.sql.functions as F

from distributed_system_spark.functions.kv import kv_decode, kv_encode


def _decode_one(spark, line):
    row = (
        spark.createDataFrame([(line,)], "line string")
        .select(kv_decode("line").alias("kv"))
        .select("kv.key", "kv.value")
        .first()
    )
    return row["key"], row["value"]


def test_decode_splits_at_first_space(spark):
    assert _decode_one(spark, "k v1 v2") == ("k", "v1 v2")


def test_decode_no_space_is_error(spark):
    assert _decode_one(spark, "nospace") == (None, None)


def test_decode_empty_value(spark):
    # "k " → key "k", empty value (the reference allows empty values)
    assert _decode_one(spark, "k ") == ("k", "")


def test_decode_leading_space_means_empty_key(spark):
    assert _decode_one(spark, " v") == ("", "v")


def test_roundtrip(spark):
    df = spark.createDataFrame(
        [("k1", "v with spaces"), ("k2", "")], "key string, value string"
    )
    out = (
        df.select(kv_encode("key", "value").alias("line"))
        .select(kv_decode("line").alias("kv"))
        .select("kv.key", "kv.value")
        .collect()
    )
    assert sorted(map(tuple, out)) == [("k1", "v with spaces"), ("k2", "")]


def test_encode_null_value_yields_null_line(spark):
    df = spark.createDataFrame([("k", None)], "key string, value string")
    out = df.select(kv_encode("key", "value").alias("line")).first()
    assert out["line"] is None  # concat (not concat_ws): bad rows explicit
