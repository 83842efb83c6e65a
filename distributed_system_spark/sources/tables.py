"""Loaders for the driver's star-schema parquet tables.

The reference's unit of input is "a directory of files" enumerated via
``ls_files`` (mj_master.cpp:337-342, mock_sdfs_client.cpp:485-504); the
Spark analog is a parquet dataset directory read declaratively so that
Catalyst gets pushdown/pruning for free.

``events`` needs special handling: the driver wrote its ``ts`` column
as parquet TIMESTAMP(NANOS), which Spark's reader rejects. With
``spark.sql.legacy.parquet.nanosAsLong`` the column arrives as int64
nanoseconds; we keep it as ``ts_ns`` (timezone-proof for arithmetic
and oracle comparison) and derive ``ts`` (microsecond timestamp) for
window/watermark operators.
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


def load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw = spark.read.parquet(table_path(sf_dir, "events"))
    return raw.withColumnRenamed("ts", "ts_ns").withColumn(
        "ts", F.timestamp_micros(F.expr("ts_ns div 1000"))
    )


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
