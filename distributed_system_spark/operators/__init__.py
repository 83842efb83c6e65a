"""Engine operators: the MapleJuice fidelity layer and the
LLM-data-pipeline operator library (dedup, similarity, text, multimodal).
"""

from distributed_system_spark.operators.maplejuice import (
    juice,
    maple,
    partition_by_hash,
    partition_by_range,
    partition_round_robin,
    pipe_lines,
    write_keyed_buckets,
)

__all__ = [
    "juice",
    "maple",
    "partition_by_hash",
    "partition_by_range",
    "partition_round_robin",
    "pipe_lines",
    "write_keyed_buckets",
]
