"""Output-schema contract for every registered query.

The external harness canonicalizes each query's result with pandas
(sort columns by name, then sort rows by every column).  pandas
cannot lexsort a column of numpy arrays or dicts, so a top-level
``array<...>`` / ``map<...>`` / ``struct<...>`` column makes an
otherwise-correct query un-checkable — exactly what happened to
``embedding_quantize_int8`` in round 4 (right answer, red row).

This test makes that failure class structurally impossible: every
registered query must emit only atomic top-level column types.
Queries that compute arrays serialize them with the repo convention
``F.array_join(F.transform(col, cast string), ",")`` and match it in
the oracle with ``array_to_string(col, ',')`` (see ``agg_arrays``,
``text_token_ids``, ``embedding_quantize_int8``).
"""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from distributed_system_spark.queries import load_all

REGISTRY = load_all()

_ATOMIC = (
    T.StringType,
    T.BooleanType,
    T.ByteType,
    T.ShortType,
    T.IntegerType,
    T.LongType,
    T.FloatType,
    T.DoubleType,
    T.DecimalType,
    T.DateType,
    T.TimestampType,
    T.TimestampNTZType,
    T.BinaryType,
    T.NullType,
)


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_query_schema_is_sortable(spark, sf_dir, name):
    """Every top-level column must be an atomic (pandas-sortable)
    type.  Violators should serialize arrays via the array_join
    convention documented in this module's docstring."""
    df = REGISTRY[name].fn(spark, sf_dir)
    bad = [
        f"{f.name}: {f.dataType.simpleString()}"
        for f in df.schema.fields
        if not isinstance(f.dataType, _ATOMIC)
    ]
    assert not bad, (
        f"{name} emits non-atomic top-level columns {bad}; join arrays "
        "into strings with F.array_join(...) and array_to_string(...) "
        "in the oracle (the agg_arrays convention)"
    )
