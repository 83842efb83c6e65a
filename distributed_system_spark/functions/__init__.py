from distributed_system_spark.functions.kv import kv_decode, kv_encode
from distributed_system_spark.functions.wordcount import (
    sanitize_token,
    split_lines,
    tokenize_line,
)

__all__ = [
    "kv_decode",
    "kv_encode",
    "sanitize_token",
    "split_lines",
    "tokenize_line",
]
