"""Write-side clustering: range-partition + sort-within-partitions
produces parquet row groups with tight, nearly disjoint min/max
stats, so a time-range scan can skip most of the file bytes — the
layout lever that turns a 100 TB full scan into a targeted read.
The reference's SDFS has no notion of this (files are opaque byte
pieces, mock_sdfs_client.cpp:187-303); it's what a columnar,
stats-aware format buys.
"""

from __future__ import annotations

import glob

import pyarrow.parquet as pq
import pyspark.sql.functions as F

from distributed_system_spark.sources.tables import load_table


def _shipdate_intervals(directory: str) -> list[tuple]:
    """(min, max) of l_shipdate for every row group in every file."""
    out = []
    for path in sorted(glob.glob(f"{directory}/*.parquet")):
        meta = pq.ParquetFile(path).metadata
        idx = meta.schema.names.index("l_shipdate")
        for rg in range(meta.num_row_groups):
            st = meta.row_group(rg).column(idx).statistics
            out.append((st.min, st.max))
    return out


def test_range_clustered_write_enables_rowgroup_skipping(spark, tmp_path):
    # sf0.01 (60k rows): enough data for several 64 KB row groups per
    # file; the fixture SF (sf0.001) fits one group per file.
    li = load_table(spark, "/root/testdata/sf0.01", "lineitem").select(
        "l_orderkey", "l_shipdate", "l_extendedprice"
    )
    small_groups = {"parquet.block.size": str(64 * 1024)}

    unsorted_dir = str(tmp_path / "unsorted")
    (
        li.repartition(4)
        .write.options(**small_groups)
        .mode("overwrite")
        .parquet(unsorted_dir)
    )
    clustered_dir = str(tmp_path / "clustered")
    (
        li.repartitionByRange(4, "l_shipdate")
        .sortWithinPartitions("l_shipdate")
        .write.options(**small_groups)
        .mode("overwrite")
        .parquet(clustered_dir)
    )

    lo = li.selectExpr("min(l_shipdate)").first()[0]
    hi = li.selectExpr("max(l_shipdate)").first()[0]
    span_us = (hi - lo).total_seconds()
    probe_lo = lo + (hi - lo) / 2
    probe_hi = lo + (hi - lo) * 11 / 20  # a 5%-of-span probe window

    def candidates(intervals):
        return sum(
            1 for mn, mx in intervals if mx >= probe_lo and mn <= probe_hi
        )

    un = _shipdate_intervals(unsorted_dir)
    cl = _shipdate_intervals(clustered_dir)
    assert len(un) >= 8 and len(cl) >= 8, (len(un), len(cl))

    # random layout: essentially every row group spans the whole
    # timeline, so none can be skipped for the probe window
    assert candidates(un) == len(un)
    # clustered layout: the probe window touches a small minority
    assert candidates(cl) <= max(2, len(cl) // 4), (candidates(cl), len(cl))

    # and the clustered intervals are individually tight: average
    # width a small fraction of the total span (random ones span ~all)
    avg_cl = sum((mx - mn).total_seconds() for mn, mx in cl) / len(cl)
    avg_un = sum((mx - mn).total_seconds() for mn, mx in un) / len(un)
    assert avg_cl < 0.2 * span_us < avg_un

    # correctness unchanged by layout
    n_direct = li.filter(
        (F.col("l_shipdate") >= probe_lo) & (F.col("l_shipdate") <= probe_hi)
    ).count()
    n_clustered = (
        spark.read.parquet(clustered_dir)
        .filter(
            (F.col("l_shipdate") >= probe_lo)
            & (F.col("l_shipdate") <= probe_hi)
        )
        .count()
    )
    assert n_direct == n_clustered


def _col_intervals(directory: str, col: str) -> list[tuple]:
    out = []
    for path in sorted(glob.glob(f"{directory}/*.parquet")):
        meta = pq.ParquetFile(path).metadata
        idx = meta.schema.names.index(col)
        for rg in range(meta.num_row_groups):
            st = meta.row_group(rg).column(idx).statistics
            out.append((st.min, st.max))
    return out


def test_zorder_skips_on_both_columns(spark, tmp_path):
    """Z-ordering on (l_orderkey, l_partkey) must let a narrow
    predicate on EITHER column skip row groups, where a plain
    single-column sort only skips on its own column."""
    from distributed_system_spark.operators.layout import write_zordered
    from distributed_system_spark.sources.tables import load_table

    li = load_table(spark, "/root/testdata/sf0.01", "lineitem").select(
        "l_orderkey", "l_partkey", "l_extendedprice"
    )
    opts = {"parquet.block.size": str(64 * 1024)}

    single_dir = str(tmp_path / "single")
    (
        li.repartitionByRange(4, "l_orderkey")
        .sortWithinPartitions("l_orderkey")
        .write.options(**opts)
        .mode("overwrite")
        .parquet(single_dir)
    )
    z_dir = str(tmp_path / "zorder")
    write_zordered(li, z_dir, "l_orderkey", "l_partkey", **opts)

    # identical contents either way
    assert (
        spark.read.parquet(z_dir).count() == li.count()
    )

    def candidates(intervals, lo, hi):
        return sum(1 for mn, mx in intervals if mx >= lo and mn <= hi)

    # a ~5% window on each column
    ok_span = (1, 750)        # orderkeys ~0..15000
    pk_span = (1, 100)        # partkeys  ~0..2000

    s_ok = _col_intervals(single_dir, "l_orderkey")
    s_pk = _col_intervals(single_dir, "l_partkey")
    z_ok = _col_intervals(z_dir, "l_orderkey")
    z_pk = _col_intervals(z_dir, "l_partkey")
    assert len(z_ok) >= 8

    # single-column sort: skips on its sort column, not the other
    assert candidates(s_ok, *ok_span) <= len(s_ok) // 2
    assert candidates(s_pk, *pk_span) == len(s_pk)

    # z-order: skips on BOTH columns
    assert candidates(z_ok, *ok_span) <= len(z_ok) // 2, (
        candidates(z_ok, *ok_span), len(z_ok)
    )
    assert candidates(z_pk, *pk_span) <= len(z_pk) // 2, (
        candidates(z_pk, *pk_span), len(z_pk)
    )
