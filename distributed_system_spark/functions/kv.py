"""The reference's record/KV codec as Column expressions.

A record is one newline-terminated text line; a key-value pair is the
line ``"<key> <value>"`` split at the FIRST space — key contains no
spaces, value no newlines (processor.cpp:27-37). Lines without a space
are protocol errors (process_line returns false → job failure,
mj_worker.cpp:318-327); ``kv_decode`` surfaces them as NULL key/value
so callers can fail or filter explicitly.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column


def kv_encode(key: Column | str, value: Column | str) -> Column:
    """(key, value) → the wire line ``"<key> <value>"``.

    Uses ``concat`` (not ``concat_ws``) so a NULL key or value yields a
    NULL line — bad records stay explicit, mirroring kv_decode's NULLs
    for protocol errors.
    """
    k = F.col(key) if isinstance(key, str) else key
    v = F.col(value) if isinstance(value, str) else value
    return F.concat(k, F.lit(" "), v)


def kv_decode(line: Column | str) -> Column:
    """Wire line → struct(key, value), split at the first space.

    Mirrors maple_processor::process_line: ``key = line[0:first_space]``,
    ``value = line[first_space+1:]``; no space → invalid (NULLs).
    """
    col = F.col(line) if isinstance(line, str) else line
    pos = F.instr(col, " ")
    key = F.when(pos > 0, F.substring(col, F.lit(1), pos - 1))
    value = F.when(pos > 0, F.substring(col, pos + 1, F.length(col)))
    return F.struct(key.alias("key"), value.alias("value"))
