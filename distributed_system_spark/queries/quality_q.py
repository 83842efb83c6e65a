"""Data-quality expectation checks (Deequ/Great-Expectations shape):
declarative per-column constraints evaluated in ONE scan, emitted as
one row per check with the measured metric and a pass/fail verdict.

At 100 TB this is the gate a curation pipeline runs before admitting
a new batch: all metrics reduce in a single partial+final aggregate
over the table — adding checks adds columns to the aggregate, never
scans.

Reference capability analog: the reference validates job output by
diffing against goldens after the run (tests/maplejuice.cpp:249-255);
expectation checks are the standing, production form of the same
contract.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from distributed_system_spark.queries import register
from distributed_system_spark.sources.tables import load_table

# (check_name, metric SQL over the one-row aggregate, threshold)
_PRIORITY_RE = "^[1-5]-[A-Z ]+$"


@register(
    "dq_expectations",
    oracle=f"""
WITH m AS (
  SELECT
    count(*) AS n,
    count(o_custkey) AS n_custkey,
    count(DISTINCT o_orderkey) AS n_uniq_key,
    count(CASE WHEN o_totalprice >= 0 THEN 1 END) AS n_nonneg,
    count(CASE WHEN o_orderstatus IN ('O','F','P') THEN 1 END) AS n_status,
    count(CASE WHEN regexp_full_match(o_orderpriority, '[1-5]-[A-Z ]+')
          THEN 1 END) AS n_prio,
    count(CASE WHEN o_orderdate BETWEEN TIMESTAMP '1992-01-01 00:00:00'
               AND TIMESTAMP '2005-12-31 00:00:00' THEN 1 END) AS n_date
  FROM orders
)
SELECT check_name, metric, threshold, metric >= threshold AS passed
FROM (
  SELECT 'completeness_o_custkey' AS check_name,
         round(CAST(n_custkey AS DOUBLE) / n, 6) AS metric,
         1.0 AS threshold FROM m
  UNION ALL
  SELECT 'uniqueness_o_orderkey',
         round(CAST(n_uniq_key AS DOUBLE) / n, 6), 1.0 FROM m
  UNION ALL
  SELECT 'nonneg_o_totalprice',
         round(CAST(n_nonneg AS DOUBLE) / n, 6), 1.0 FROM m
  UNION ALL
  SELECT 'domain_o_orderstatus',
         round(CAST(n_status AS DOUBLE) / n, 6), 1.0 FROM m
  UNION ALL
  SELECT 'pattern_o_orderpriority',
         round(CAST(n_prio AS DOUBLE) / n, 6), 1.0 FROM m
  UNION ALL
  SELECT 'bounds_o_orderdate',
         round(CAST(n_date AS DOUBLE) / n, 6), 0.99 FROM m
)
""",
    tags=("C4", "quality", "expectations"),
)
def dq_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Six expectation checks over `orders` in one aggregate scan:
    completeness, key uniqueness, value bounds, domain membership,
    format pattern, and date-range containment."""
    orders = load_table(spark, sf_dir, "orders")

    def rate(cond):
        return F.count(F.when(cond, F.lit(1)))

    m = orders.agg(
        F.count(F.lit(1)).alias("n"),
        F.count("o_custkey").alias("n_custkey"),
        F.countDistinct("o_orderkey").alias("n_uniq_key"),
        rate(F.col("o_totalprice") >= 0).alias("n_nonneg"),
        rate(F.col("o_orderstatus").isin("O", "F", "P")).alias("n_status"),
        rate(F.col("o_orderpriority").rlike(_PRIORITY_RE)).alias("n_prio"),
        rate(
            F.col("o_orderdate").between(
                F.lit("1992-01-01 00:00:00").cast("timestamp"),
                F.lit("2005-12-31 00:00:00").cast("timestamp"),
            )
        ).alias("n_date"),
    )
    checks = (
        ("completeness_o_custkey", "n_custkey", 1.0),
        ("uniqueness_o_orderkey", "n_uniq_key", 1.0),
        ("nonneg_o_totalprice", "n_nonneg", 1.0),
        ("domain_o_orderstatus", "n_status", 1.0),
        ("pattern_o_orderpriority", "n_prio", 1.0),
        ("bounds_o_orderdate", "n_date", 0.99),
    )
    stack_args = ", ".join(
        f"'{name}', round(CAST({num} AS DOUBLE) / n, 6), "
        f"CAST({thr} AS DOUBLE)"
        for name, num, thr in checks
    )
    rows = m.selectExpr(
        f"stack({len(checks)}, {stack_args})"
        " AS (check_name, metric, threshold)"
    )
    return rows.withColumn(
        "passed", F.col("metric") >= F.col("threshold")
    )


@register(
    "ri_orphan_audit",
    oracle="""
WITH l AS (
  SELECT count(*) AS n,
         CAST(count(*) FILTER (o.o_orderkey IS NULL) AS BIGINT) AS o_orph,
         CAST(count(*) FILTER (p.p_partkey  IS NULL) AS BIGINT) AS p_orph,
         CAST(count(*) FILTER (s.s_suppkey  IS NULL) AS BIGINT) AS s_orph
  FROM lineitem li
  LEFT JOIN (SELECT DISTINCT o_orderkey FROM orders) o
         ON li.l_orderkey = o.o_orderkey
  LEFT JOIN (SELECT DISTINCT p_partkey FROM part) p
         ON li.l_partkey = p.p_partkey
  LEFT JOIN (SELECT DISTINCT s_suppkey FROM supplier) s
         ON li.l_suppkey = s.s_suppkey
), o2 AS (
  SELECT count(*) AS n,
         CAST(count(*) FILTER (c.c_custkey IS NULL) AS BIGINT) AS c_orph
  FROM orders o
  LEFT JOIN (SELECT DISTINCT c_custkey FROM customer) c
         ON o.o_custkey = c.c_custkey
)
SELECT 'lineitem.l_orderkey -> orders' AS fk, l.n AS child_rows,
       l.o_orph AS orphan_rows FROM l
UNION ALL SELECT 'lineitem.l_partkey -> part', l.n, l.p_orph FROM l
UNION ALL SELECT 'lineitem.l_suppkey -> supplier', l.n, l.s_orph FROM l
UNION ALL SELECT 'orders.o_custkey -> customer', o2.n, o2.c_orph FROM o2
""",
    tags=("C3", "C4", "data-quality", "referential-integrity"),
)
def ri_orphan_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity audit: orphan counts for every foreign-key
    edge of the star schema (lineitem→orders/part/supplier,
    orders→customer), one row per edge.  The companion to
    dq_expectations: expectations gate single-table invariants, this
    gates the CROSS-table ones a curation pipeline must hold before
    publishing (a join key pointing nowhere silently drops rows from
    every downstream inner join).

    At 100 TB: all three lineitem edges are audited in ONE fact scan —
    each parent contributes only its distinct key column (dimension
    keys broadcast; the orders key column shuffles on the join key
    like any fact-fact equi-join), and the verdict reduces in a single
    partial+final aggregate.  Adding an edge adds a join of one key
    column, never another fact scan."""
    li = load_table(spark, sf_dir, "lineitem")
    okeys = (
        load_table(spark, sf_dir, "orders")
        .select("o_orderkey")
        .distinct()
    )
    pkeys = (
        load_table(spark, sf_dir, "part").select("p_partkey").distinct()
    )
    skeys = (
        load_table(spark, sf_dir, "supplier")
        .select("s_suppkey")
        .distinct()
    )
    lagg = (
        li.join(okeys, li.l_orderkey == okeys.o_orderkey, "left")
        .join(F.broadcast(pkeys), li.l_partkey == pkeys.p_partkey, "left")
        .join(F.broadcast(skeys), li.l_suppkey == skeys.s_suppkey, "left")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.count_if(F.col("o_orderkey").isNull()).alias("o_orph"),
            F.count_if(F.col("p_partkey").isNull()).alias("p_orph"),
            F.count_if(F.col("s_suppkey").isNull()).alias("s_orph"),
        )
    )
    ckeys = (
        load_table(spark, sf_dir, "customer")
        .select("c_custkey")
        .distinct()
    )
    oagg = (
        load_table(spark, sf_dir, "orders")
        .join(ckeys, F.col("o_custkey") == ckeys.c_custkey, "left")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.count_if(F.col("c_custkey").isNull()).alias("c_orph"),
        )
    )
    lrows = lagg.selectExpr(
        "stack(3,"
        " 'lineitem.l_orderkey -> orders', n, o_orph,"
        " 'lineitem.l_partkey -> part', n, p_orph,"
        " 'lineitem.l_suppkey -> supplier', n, s_orph"
        ") AS (fk, child_rows, orphan_rows)"
    )
    orows = oagg.selectExpr(
        "stack(1, 'orders.o_custkey -> customer', n, c_orph)"
        " AS (fk, child_rows, orphan_rows)"
    )
    return lrows.unionByName(orows)


@register(
    "k_anonymity_audit",
    oracle="""
SELECT CAST(c_nationkey AS BIGINT) AS nationkey,
       c_mktsegment AS segment,
       count(*) AS group_n,
       count(*) >= 10 AS meets_k,
       CAST(count(DISTINCT CASE WHEN c_acctbal < 0 THEN 1 ELSE 0 END)
            AS BIGINT) AS l_diversity,
       count(DISTINCT CASE WHEN c_acctbal < 0 THEN 1 ELSE 0 END) >= 2
         AS meets_l
FROM customer
GROUP BY c_nationkey, c_mktsegment
""",
    tags=("C4", "privacy", "data-quality"),
)
def k_anonymity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Privacy audit before publishing a derived dataset: k-anonymity
    group sizes over the quasi-identifier pair (nation, market
    segment) — any group smaller than k = 10 re-identifies its
    members — plus l-diversity of a sensitive attribute (the
    negative-balance flag) within each group: a group where everyone
    shares the sensitive value leaks it even at large k.  The check a
    curation pipeline runs on metadata columns before a corpus (or
    its per-source stats) ships.

    At 100 TB: one partial+final aggregate over the QI key (the
    distinct-aggregate expands to the standard two-phase plan,
    bounded by |QI| x 2 partial rows) — audit cost is independent of
    how many checks ride the same scan."""
    cust = load_table(spark, sf_dir, "customer")
    sens = F.when(F.col("c_acctbal") < 0, 1).otherwise(0)
    return cust.groupBy(
        F.col("c_nationkey").cast("long").alias("nationkey"),
        F.col("c_mktsegment").alias("segment"),
    ).agg(
        F.count(F.lit(1)).alias("group_n"),
        (F.count(F.lit(1)) >= 10).alias("meets_k"),
        F.countDistinct(sens).cast("long").alias("l_diversity"),
        (F.countDistinct(sens) >= 2).alias("meets_l"),
    )


@register(
    "dq_freshness_lag",
    oracle="""
WITH m AS (
  SELECT event_type,
         count(*) AS n_events,
         max(epoch_us(ts)) AS last_us
  FROM events GROUP BY event_type
),
h AS (SELECT max(last_us) AS horizon FROM m)
SELECT event_type, n_events,
       CAST(last_us AS BIGINT) AS last_us,
       CAST((horizon - last_us) // 3600000000 AS BIGINT)
         AS lag_hours,
       (horizon - last_us) > 86400000000 AS stale
FROM m CROSS JOIN h
""",
    tags=("C4", "data-quality", "freshness"),
)
def dq_freshness_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-stream freshness monitor: each event type's most recent
    event vs the corpus horizon (the max across all types — the
    deterministic stand-in for wall-clock now), with a stale flag at
    24 h — the check that catches a dead producer before a training
    snapshot quietly ships without its data.  All integer epoch
    arithmetic.

    At 100 TB: one partial+final max/count aggregate per type (the
    scan reduces map-side); the horizon is a broadcast 1-row scalar.
    On a date-partitioned table the max-ts probe prunes to the
    newest partitions."""
    ev = load_table(spark, sf_dir, "events")
    m = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.max(F.expr("ts_ns div 1000")).alias("last_us"),
    )
    h = m.agg(F.max("last_us").alias("horizon"))
    return m.crossJoin(F.broadcast(h)).select(
        "event_type",
        "n_events",
        F.col("last_us").cast("long").alias("last_us"),
        F.expr("(horizon - last_us) div 3600000000")
        .cast("long")
        .alias("lag_hours"),
        ((F.col("horizon") - F.col("last_us")) > 86_400_000_000).alias(
            "stale"
        ),
    )
