"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship word count (the reference's only
shipped workload, mje/src/wc_maple.cpp + wc_juice.cpp) at sf0.001.
``queries()`` / ``oracle_sql()`` expose the full registry from
``distributed_system_spark.queries`` — one entry per implemented
operator from SURVEY.md §2, each oracle being equivalent ANSI SQL
runnable by DuckDB on the same parquet tables.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from distributed_system_spark.queries import oracle_sqls, spark_queries
from distributed_system_spark.queries.wordcount_q import wordcount
from distributed_system_spark.session import tune_session

SF_SMOKE_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return wordcount(tune_session(spark), SF_SMOKE_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    qs = spark_queries()
    return {
        name: (lambda spark, sf_dir, _fn=fn: _fn(tune_session(spark), sf_dir))
        for name, fn in qs.items()
    }


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL oracle per queries() key (omitted for
    non-SQL-expressible ops → driver records a rows-only check)."""
    return oracle_sqls()
