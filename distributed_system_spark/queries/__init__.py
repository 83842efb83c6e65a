"""Named query registry driving ``__spark_entry__.queries()``.

Each registered query is the Spark-first implementation of one
operator (or operator family) from SURVEY.md §2, paired — where the
semantics are SQL-expressible — with an ANSI-SQL oracle that DuckDB
runs on the same parquet tables.  The driver compares row count,
schema, and an order-insensitive value hash, so every computed column
is aliased identically on both sides and float aggregates are rounded
to a fixed scale on both sides.

The reference's own correctness strategy is the same idea: golden
outputs diffed order-insensitively after an external ``sort``
(tests/maplejuice.cpp:249-255).
"""

from __future__ import annotations

import importlib
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class Query:
    """One registered query: Spark implementation + optional oracle."""

    name: str
    fn: QueryFn
    oracle: str | None = None
    tags: tuple[str, ...] = field(default_factory=tuple)


REGISTRY: dict[str, Query] = {}

# Submodules that self-register queries on import.
_MODULES = (
    "distributed_system_spark.queries.wordcount_q",
    "distributed_system_spark.queries.relational",
    "distributed_system_spark.queries.analytics",
    "distributed_system_spark.queries.tpch2",
    "distributed_system_spark.queries.joins",
    "distributed_system_spark.queries.windows",
    "distributed_system_spark.queries.scalars",
    "distributed_system_spark.queries.maplejuice_q",
    "distributed_system_spark.queries.dedup_q",
    "distributed_system_spark.queries.similarity_q",
    "distributed_system_spark.queries.text_q",
    "distributed_system_spark.queries.multimodal_q",
    "distributed_system_spark.queries.streaming_q",
    "distributed_system_spark.queries.timeseries",
    "distributed_system_spark.queries.behavior",
    "distributed_system_spark.queries.udf_q",
)


def register(
    name: str, oracle: str | None = None, tags: tuple[str, ...] = ()
) -> Callable[[QueryFn], QueryFn]:
    """Decorator: add a query to the registry."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        REGISTRY[name] = Query(name=name, fn=fn, oracle=oracle, tags=tags)
        return fn

    return deco


def load_all() -> dict[str, Query]:
    """Import every query module (idempotent) and return the registry."""
    for mod in _MODULES:
        try:
            importlib.import_module(mod)
        except ModuleNotFoundError as exc:
            # Only tolerate a missing *registry* module (not yet built);
            # a missing third-party dep inside one should surface.
            if mod.rsplit(".", 1)[-1] not in str(exc):
                raise
    return REGISTRY


def spark_queries() -> dict[str, QueryFn]:
    return {name: q.fn for name, q in load_all().items()}


def oracle_sqls() -> dict[str, str]:
    return {
        name: q.oracle for name, q in load_all().items() if q.oracle is not None
    }
