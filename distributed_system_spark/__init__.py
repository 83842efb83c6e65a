"""distributed_system_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the query and data-processing
capabilities of the reference system (glaba/distributed-system, a
C++17 MapReduce-style stack: SDFS distributed file store + MapleJuice
map/reduce engine) as an idiomatic Apache Spark application.

Design stance (see SURVEY.md §7): the reference's membership /
election / replication layers are *the platform* in Spark terms — the
cluster manager owns them. What this package provides is the query
surface:

- ``sources``   — dataset IO with the reference's put/append/get
  semantics (SDFS pieces ⇒ files of a dataset directory).
- ``functions`` — the reference's record/KV codec and word-count
  scalar semantics as Column expressions.
- ``operators`` — MapleJuice fidelity layer (maple/juice over
  DataFrames), partitioner analogs, relational extensions (as-of
  join, range join, top-k), and the LLM-data-pipeline operators
  (dedup, similarity search, multimodal, text analysis).
- ``streaming`` — Structured Streaming analogs of the reference's
  metadata-keyed file-event callbacks (sdfs_master.h:18-21).
- ``queries``   — the named query registry driving
  ``__spark_entry__.queries()`` / ``oracle_sql()``.
"""

from distributed_system_spark.session import get_spark, tune_session

__all__ = ["get_spark", "tune_session"]

__version__ = "0.1.0"
