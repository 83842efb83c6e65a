"""Loaders for the driver's star-schema parquet tables.

The reference's unit of input is "a directory of files" enumerated via
``ls_files`` (mj_master.cpp:337-342, mock_sdfs_client.cpp:485-504); the
Spark analog is a parquet dataset directory read declaratively so that
Catalyst gets pushdown/pruning for free.

``events`` needs special handling: the engine's contract is a
``ts_ns`` bigint (epoch nanoseconds — timezone-proof for arithmetic
and oracle comparison) plus a ``ts`` microsecond TIMESTAMP for
window/watermark operators. Driver testdata generations have shipped
``ts`` both as parquet TIMESTAMP(NANOS) (arrives as int64 under
``spark.sql.legacy.parquet.nanosAsLong``) and as TIMESTAMP(MICROS)
(arrives as timestamp_ntz); :func:`canonical_event_time` normalizes
either shape to the same two columns.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = "/root/testdata/sf0.001"


def table_path(sf_dir: str, name: str) -> str:
    return f"{sf_dir.rstrip('/')}/{name}.parquet"


def canonical_event_time(raw: DataFrame) -> DataFrame:
    """Normalize an events frame's ``ts`` to the engine contract:
    columns ``ts_ns`` (bigint epoch nanos, in ``ts``'s original
    position) and ``ts`` (microsecond TIMESTAMP, appended last).

    Handles every ``ts`` physical type the driver has shipped:
    bigint (TIMESTAMP(NANOS) via nanosAsLong) and timestamp /
    timestamp_ntz (TIMESTAMP(MICROS)). The ntz→ltz cast is exact
    because the session timezone is pinned to UTC (session.py).
    Works on batch and streaming frames alike.
    """
    ts_type = dict(raw.dtypes)["ts"]
    if ts_type == "bigint":
        return raw.withColumnRenamed("ts", "ts_ns").withColumn(
            "ts", F.timestamp_micros(F.expr("ts_ns div 1000"))
        )
    out = raw.withColumn("ts", F.col("ts").cast("timestamp")).withColumn(
        "ts_ns", F.unix_micros("ts") * F.lit(1000)
    )
    return out.select(
        *[("ts_ns" if c == "ts" else c) for c in raw.columns], "ts"
    )


def load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw = spark.read.parquet(table_path(sf_dir, "events"))
    return canonical_event_time(raw)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    if name == "events":
        return load_events(spark, sf_dir)
    return spark.read.parquet(table_path(sf_dir, name))


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view for spark.sql queries."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
