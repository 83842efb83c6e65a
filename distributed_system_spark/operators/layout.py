"""Data-layout helpers: Z-order (Morton) clustering for
multi-dimensional row-group skipping.

A single-column sort gives perfect parquet min/max locality on that
column and none on any other; interleaving the bits of two (or more)
key columns into one Morton value and range-sorting by it gives
*both* columns partial locality — each row group covers a small tile
of the (a, b) plane, so predicates on either column (or both) skip
most groups.  This is the technique Delta/Iceberg expose as
``OPTIMIZE ... ZORDER BY``; here it is plain Column math + a
repartitionByRange write, usable on any parquet table.

All expressions are JVM Column ops (shift/mask/or) — no UDF; the
only full-table work is one min/max aggregate (for bucket scaling)
and the range-partitioned write itself.  Skewed columns would swap
the linear scaling for approx-quantile boundaries; there is never a
global-window rank (the classic unscalable way to bucket).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame


def scale_bucket(col: Column, lo: float, hi: float, bits: int) -> Column:
    """Linear bucket of ``col`` from [lo, hi] into [0, 2^bits)."""
    n = 1 << bits
    pos = (col - F.lit(lo)) / F.lit(max(hi - lo, 1e-12))
    return F.least(
        F.greatest((pos * n).cast("long"), F.lit(0)), F.lit(n - 1)
    )


def morton_interleave(a: Column, b: Column, bits: int = 16) -> Column:
    """Interleave the low ``bits`` of ``a`` and ``b``:
    result bit 2i = a bit i, bit 2i+1 = b bit i."""
    z = F.lit(0).cast("long")
    for i in range(bits):
        abit = F.shiftright(a, i).bitwiseAND(F.lit(1))
        bbit = F.shiftright(b, i).bitwiseAND(F.lit(1))
        z = z.bitwiseOR(F.shiftleft(abit, 2 * i)).bitwiseOR(
            F.shiftleft(bbit, 2 * i + 1)
        )
    return z


def write_zordered(
    df: DataFrame,
    path: str,
    col_a: str,
    col_b: str,
    n_files: int = 8,
    bits: int = 8,
    **write_options: str,
) -> None:
    """Write ``df`` Z-ordered on (col_a, col_b): scale both columns
    into 2^bits buckets (one min/max pass), interleave into a Morton
    value, range-partition and sort by it, drop the helper column."""
    bounds = df.agg(
        F.min(col_a).alias("a_lo"),
        F.max(col_a).alias("a_hi"),
        F.min(col_b).alias("b_lo"),
        F.max(col_b).alias("b_hi"),
    ).first()
    z = morton_interleave(
        scale_bucket(
            F.col(col_a).cast("double"),
            float(bounds["a_lo"]),
            float(bounds["a_hi"]),
            bits,
        ),
        scale_bucket(
            F.col(col_b).cast("double"),
            float(bounds["b_lo"]),
            float(bounds["b_hi"]),
            bits,
        ),
        bits,
    )
    (
        df.withColumn("_z", z)
        .repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.options(**write_options)
        .mode("overwrite")
        .parquet(path)
    )
