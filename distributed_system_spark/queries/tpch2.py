"""The remaining TPC-H query shapes (Q2/Q4/Q6/Q8/Q9/Q11/Q13/Q15/Q16/
Q17/Q18/Q20/Q21/Q22), adapted to the driver's star schema.

With `analytics.py` (Q1/Q3/Q5/Q7/Q10) and `relational.py`
(Q12/Q14/Q19 shapes) this completes all 22 classic shapes, so the
full decision-support operator vocabulary — EXISTS/NOT-EXISTS semi
and anti joins, correlated aggregate subqueries, scalar-subquery
thresholds, HAVING over grouped facts, nested IN, double aggregation,
ratio-of-conditional-sums — is oracle-checked.

Schema adaptations (the driver's tables have no partsupp, c_phone,
or l_commitdate/l_receiptdate):
- partsupp links are derived as ``SELECT DISTINCT l_partkey,
  l_suppkey FROM lineitem``; supply cost proxies use ``s_acctbal``
  (Q2) / ``0.1 * p_retailprice`` (Q9).
- Q21's "kept orders waiting" becomes "was the strict-last shipper
  in a multi-supplier order" (same EXISTS + NOT-EXISTS shape over
  correlated lineitem aliases).
- Q22's country code becomes ``c_custkey % 7`` and "has no orders"
  becomes "has no orders since 2000-01-01" (every customer has at
  least one order in this data).

Scale notes:
- Derived links / per-part aggregates group on the fact's own key —
  one shuffle, map-side combined, AQE-coalesced.
- Scalar thresholds (Q11/Q15/Q17/Q22) are computed as 1-row
  aggregates and joined with an explicit ``F.broadcast`` crossJoin —
  never a window over a global (empty) partition, which would
  single-partition the fact at 100 TB.
- All decimal-sum rules from ``_util`` apply, so thresholds compare
  the same exact value on both engines.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from distributed_system_spark.queries import register
from distributed_system_spark.queries._util import (
    dsum,
    sql_dsum,
)
from distributed_system_spark.sources.tables import load_table


def _rev() -> F.Column:
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


_SQL_REV = "l_extendedprice * (1 - l_discount)"


@register(
    "q2_min_cost_supplier",
    oracle="""
WITH link AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
cand AS (
  SELECT p_partkey, p_name, p_brand, s_name, s_acctbal, s_nationkey
  FROM part
  JOIN link ON p_partkey = l_partkey
  JOIN supplier ON l_suppkey = s_suppkey
  WHERE p_size = 15
)
SELECT p_partkey, p_name, p_brand, s_name, s_acctbal, n_name
FROM cand JOIN nation ON s_nationkey = n_nationkey
WHERE s_acctbal = (SELECT min(s_acctbal) FROM cand c2
                   WHERE c2.p_partkey = cand.p_partkey)
ORDER BY s_acctbal DESC, p_partkey, s_name
LIMIT 100
""",
    tags=("C3", "C6", "tpch-q2"),
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: per-part minimum-cost supplier via a
    correlated MIN subquery (window-min per part, equality filter)."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_size") == 15)
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    link = li.select("l_partkey", "l_suppkey").distinct()
    cand = (
        link.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .select("p_partkey", "p_name", "p_brand", "s_name", "s_acctbal",
                "s_nationkey")
    )
    w = Window.partitionBy("p_partkey")
    return (
        cand.withColumn("min_bal", F.min("s_acctbal").over(w))
        .filter(F.col("s_acctbal") == F.col("min_bal"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("p_partkey", "p_name", "p_brand", "s_name", "s_acctbal",
                "n_name")
        .orderBy(F.col("s_acctbal").desc(), "p_partkey", "s_name")
        .limit(100)
    )


@register(
    "q4_order_priority",
    oracle="""
SELECT o_orderpriority, count(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1996-04-01 00:00:00'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
GROUP BY o_orderpriority
""",
    tags=("C3", "C4", "tpch-q4"),
)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: EXISTS semi join from orders into lineitem,
    counted by priority."""
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag") == "R"
    )
    return (
        orders.join(li, F.col("o_orderkey") == F.col("l_orderkey"), "leftsemi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


@register(
    "q6_revenue_forecast",
    oracle=f"""
SELECT {sql_dsum('l_extendedprice * l_discount')} AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
""",
    tags=("C2", "C4", "tpch-q6"),
)
def q6_revenue_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: pure scan+filter+agg — every predicate pushes
    to the parquet row groups, no shuffle beyond the 1-row reduce."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    )
    return li.agg(
        dsum(F.col("l_extendedprice") * F.col("l_discount")).alias("revenue")
    )


@register(
    "q8_market_share",
    oracle=f"""
WITH flat AS (
  SELECT year(o_orderdate) AS o_year,
         l_extendedprice * (1 - l_discount) AS volume,
         n2.n_name AS supp_nation
  FROM lineitem
  JOIN part     ON l_partkey = p_partkey
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation n1 ON c_nationkey = n1.n_nationkey
  JOIN region   ON n1.n_regionkey = r_regionkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation n2 ON s_nationkey = n2.n_nationkey
  WHERE r_name = 'AMERICA' AND p_type = 'ECONOMY'
    AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
)
SELECT o_year,
       round(
         CAST(SUM(CAST(CASE WHEN supp_nation = 'NATION_3' THEN volume
                            ELSE 0 END AS DECIMAL(18,4))) AS DOUBLE)
         / CAST(SUM(CAST(volume AS DECIMAL(18,4))) AS DOUBLE), 6
       ) AS mkt_share
FROM flat
GROUP BY o_year
""",
    tags=("C3", "C4", "tpch-q8"),
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: one nation's share of regional volume per
    year — nation joined in two roles, ratio of conditional sums."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_type") == "ECONOMY"
    )
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(
        F.col("r_name") == "AMERICA"
    )
    n1 = nation.select(
        F.col("n_nationkey").alias("n1_key"),
        F.col("n_regionkey").alias("n1_region"),
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("n2_key"),
        F.col("n_name").alias("supp_nation"),
    )
    flat = (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("n1_key"))
        .join(F.broadcast(region), F.col("n1_region") == F.col("r_regionkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("n2_key"))
        .select(
            F.year("o_orderdate").cast("long").alias("o_year"),
            _rev().alias("volume"),
            "supp_nation",
        )
    )
    dec = "decimal(18,4)"
    nation_vol = F.sum(
        F.when(F.col("supp_nation") == "NATION_3", F.col("volume"))
        .otherwise(0.0)
        .cast(dec)
    ).cast("double")
    total_vol = F.sum(F.col("volume").cast(dec)).cast("double")
    return flat.groupBy("o_year").agg(
        F.round(nation_vol / total_vol, 6).alias("mkt_share")
    )


@register(
    "q9_product_profit",
    oracle=f"""
SELECT n_name AS nation, year(o_orderdate) AS o_year,
       {sql_dsum(f'{_SQL_REV} - 0.1 * p_retailprice * l_quantity')} AS profit
FROM lineitem
JOIN part     ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN orders   ON l_orderkey = o_orderkey
JOIN nation   ON s_nationkey = n_nationkey
WHERE p_name LIKE '%red%'
GROUP BY n_name, year(o_orderdate)
""",
    tags=("C3", "C4", "tpch-q9"),
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: profit by supplier nation and year.  Supply
    cost is proxied as ``0.1 * p_retailprice`` per unit (no partsupp
    table in this schema)."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_name").like("%red%")
    )
    supp = load_table(spark, sf_dir, "supplier")
    orders = load_table(spark, sf_dir, "orders")
    nation = load_table(spark, sf_dir, "nation")
    profit = _rev() - 0.1 * F.col("p_retailprice") * F.col("l_quantity")
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("o_year"),
        )
        .agg(dsum(profit).alias("profit"))
    )


@register(
    "q11_important_parts",
    oracle="""
WITH pv AS (
  SELECT l_partkey AS partkey,
         SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4)))
           AS val
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation   ON s_nationkey = n_nationkey
  WHERE n_name = 'NATION_3'
  GROUP BY l_partkey
)
SELECT partkey, CAST(round(val, 2) AS DOUBLE) AS part_value
FROM pv
WHERE CAST(val AS DOUBLE) >
      (SELECT CAST(SUM(val) AS DOUBLE) * 0.001 FROM pv)
""",
    tags=("C4", "tpch-q11"),
)
def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: parts whose value exceeds a fraction of the
    global total — HAVING over a scalar subquery.  The scalar is a
    1-row agg broadcast into a crossJoin (never a global window)."""
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation").filter(
        F.col("n_name") == "NATION_3"
    )
    pv = (
        li.join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(F.col("l_partkey").alias("partkey"))
        .agg(F.sum(_rev().cast("decimal(18,4)")).alias("val"))
    )
    thresh = pv.agg(
        (F.sum("val").cast("double") * 0.001).alias("threshold")
    )
    return (
        pv.crossJoin(F.broadcast(thresh))
        .filter(F.col("val").cast("double") > F.col("threshold"))
        .select(
            "partkey",
            F.round("val", 2).cast("double").alias("part_value"),
        )
    )


@register(
    "q13_customer_distribution",
    oracle="""
SELECT c_count, count(*) AS custdist
FROM (
  SELECT c_custkey, count(o_orderkey) AS c_count
  FROM customer LEFT JOIN orders
    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
  GROUP BY c_custkey
)
GROUP BY c_count
""",
    tags=("C3", "C4", "tpch-q13"),
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: order-count distribution — left outer join
    with a join-side predicate, then double aggregation."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    per_cust = (
        cust.join(
            orders,
            (F.col("c_custkey") == F.col("o_custkey"))
            & (F.col("o_orderpriority") != "1-URGENT"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(
        F.count(F.lit(1)).alias("custdist")
    )


@register(
    "q15_top_supplier",
    oracle="""
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4)))
           AS total_rev
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name,
       CAST(round(total_rev, 2) AS DOUBLE) AS total_revenue
FROM supplier JOIN revenue ON s_suppkey = supplier_no
WHERE total_rev = (SELECT max(total_rev) FROM revenue)
""",
    tags=("C4", "tpch-q15"),
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: supplier(s) achieving the max quarterly
    revenue — view + scalar MAX + equality join.  The exact decimal
    sum makes the max-equality deterministic on both engines."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    supp = load_table(spark, sf_dir, "supplier")
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(_rev().cast("decimal(18,4)")).alias("total_rev")
    )
    top = revenue.agg(F.max("total_rev").alias("max_rev"))
    return (
        revenue.crossJoin(F.broadcast(top))
        .filter(F.col("total_rev") == F.col("max_rev"))
        .join(F.broadcast(supp), F.col("s_suppkey") == F.col("supplier_no"))
        .select(
            "s_suppkey",
            "s_name",
            F.round("total_rev", 2).cast("double").alias("total_revenue"),
        )
    )


@register(
    "q16_supplier_part_counts",
    oracle="""
WITH link AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
SELECT p_brand, p_type, p_size,
       count(DISTINCT l_suppkey) AS supplier_cnt
FROM link JOIN part ON p_partkey = l_partkey
WHERE p_brand <> 'Brand#1'
  AND p_size IN (1, 5, 9, 15, 23, 36, 45)
  AND l_suppkey NOT IN
      (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_type, p_size
""",
    tags=("C3", "C4", "tpch-q16"),
)
def q16_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: distinct supplier counts per part group with
    a NOT-IN supplier exclusion (anti join; s_suppkey is non-null so
    the null-aware special case is vacuous)."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & F.col("p_size").isin(1, 5, 9, 15, 23, 36, 45)
    )
    bad = load_table(spark, sf_dir, "supplier").filter(
        F.col("s_acctbal") < 0
    ).select("s_suppkey")
    link = li.select("l_partkey", "l_suppkey").distinct()
    return (
        link.join(bad, F.col("l_suppkey") == F.col("s_suppkey"), "left_anti")
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@register(
    "q17_small_quantity",
    oracle="""
WITH pa AS (
  SELECT l_partkey AS a_pk,
         round(CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE)
               / count(*), 6) AS avg_qty
  FROM lineitem GROUP BY l_partkey
)
SELECT CAST(round(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) / 7.0, 2)
            AS DOUBLE) AS avg_yearly
FROM lineitem
JOIN part ON p_partkey = l_partkey
JOIN pa   ON a_pk = l_partkey
WHERE p_brand = 'Brand#3' AND l_quantity < 0.2 * avg_qty
""",
    tags=("C3", "C4", "tpch-q17"),
)
def q17_small_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: revenue of small-quantity line items, where
    "small" is a correlated per-part average — implemented as a
    per-part agg joined back to the fact (two passes, no correlated
    re-execution)."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_brand") == "Brand#3"
    )
    pa = li.groupBy(F.col("l_partkey").alias("a_pk")).agg(
        F.round(
            F.sum(F.col("l_quantity").cast("decimal(18,4)")).cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("avg_qty")
    )
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(pa, F.col("a_pk") == F.col("l_partkey"))
        .filter(F.col("l_quantity") < 0.2 * F.col("avg_qty"))
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice").cast("decimal(18,4)")) / 7.0,
                2,
            )
            .cast("double")
            .alias("avg_yearly")
        )
    )


@register(
    "q18_large_volume",
    oracle="""
WITH big AS (
  SELECT l_orderkey AS bok, SUM(l_quantity) AS sum_qty
  FROM lineitem GROUP BY l_orderkey HAVING SUM(l_quantity) > 300
)
SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice, sum_qty
FROM big
JOIN orders   ON bok = o_orderkey
JOIN customer ON o_custkey = c_custkey
""",
    tags=("C3", "C4", "tpch-q18"),
)
def q18_large_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: large-volume orders — HAVING over a grouped
    fact, joined back to orders and customers.  Quantities are
    integer-valued doubles, so the plain double sum is exact."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    big = (
        li.groupBy(F.col("l_orderkey").alias("bok"))
        .agg(F.sum("l_quantity").alias("sum_qty"))
        .filter(F.col("sum_qty") > 300)
    )
    return (
        big.join(orders, F.col("bok") == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .select("c_name", "c_custkey", "o_orderkey", "o_orderdate",
                "o_totalprice", "sum_qty")
    )


@register(
    "q20_part_shippers",
    oracle="""
SELECT s_name, s_acctbal
FROM supplier
WHERE s_suppkey IN (
  SELECT l_suppkey
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE p_name LIKE 'red%'
  GROUP BY l_suppkey, l_partkey
  HAVING SUM(l_quantity) > 90
)
""",
    tags=("C3", "C4", "tpch-q20"),
)
def q20_part_shippers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: nested IN — suppliers who moved significant
    volume of a part family (grouped HAVING inside a semi join)."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_name").like("red%")
    )
    supp = load_table(spark, sf_dir, "supplier")
    movers = (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .filter(F.col("qty") > 90)
        .select("l_suppkey")
    )
    return supp.join(
        movers, F.col("s_suppkey") == F.col("l_suppkey"), "leftsemi"
    ).select("s_name", "s_acctbal")


@register(
    "q21_waiting_supplier",
    oracle="""
SELECT s_name, count(*) AS numwait
FROM lineitem l1
JOIN orders   ON o_orderkey = l1.l_orderkey AND o_orderstatus = 'F'
JOIN supplier ON s_suppkey = l1.l_suppkey
WHERE EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lineitem l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.l_shipdate >= l1.l_shipdate)
GROUP BY s_name
""",
    tags=("C3", "C4", "tpch-q21"),
)
def q21_waiting_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: correlated EXISTS + NOT-EXISTS over lineitem
    aliases — here "the strict-last shipper in a multi-supplier
    finished order" (no commit/receipt dates in this schema).  Both
    correlations are equi on l_orderkey (hash join + residual), so
    the plan shuffles lineitem on its natural key, never a cartesian.
    """
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    )
    supp = load_table(spark, sf_dir, "supplier")
    l1 = li.select(
        F.col("l_orderkey").alias("ok"),
        F.col("l_suppkey").alias("sk"),
        F.col("l_shipdate").alias("sd"),
    )
    l2 = li.select(
        F.col("l_orderkey").alias("ok2"), F.col("l_suppkey").alias("sk2")
    )
    l3 = li.select(
        F.col("l_orderkey").alias("ok3"),
        F.col("l_suppkey").alias("sk3"),
        F.col("l_shipdate").alias("sd3"),
    )
    return (
        l1.join(
            l2,
            (F.col("ok") == F.col("ok2")) & (F.col("sk") != F.col("sk2")),
            "leftsemi",
        )
        .join(
            l3,
            (F.col("ok") == F.col("ok3"))
            & (F.col("sk") != F.col("sk3"))
            & (F.col("sd3") >= F.col("sd")),
            "left_anti",
        )
        .join(orders, F.col("ok") == F.col("o_orderkey"))
        .join(F.broadcast(supp), F.col("sk") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )


@register(
    "q22_global_sales",
    oracle="""
WITH base AS (
  SELECT c_custkey, c_custkey % 7 AS cntrycode, c_acctbal
  FROM customer
  WHERE c_custkey % 7 IN (1, 2, 4)
),
thresh AS (
  SELECT round(CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE)
               / count(*), 6) AS avg_bal
  FROM base WHERE c_acctbal > 0
),
active AS (
  SELECT DISTINCT o_custkey FROM orders
  WHERE o_orderdate >= TIMESTAMP '2000-01-01 00:00:00'
)
SELECT cntrycode, count(*) AS numcust,
       CAST(round(SUM(CAST(c_acctbal AS DECIMAL(18,4))), 2) AS DOUBLE)
         AS totacctbal
FROM base, thresh
WHERE c_acctbal > avg_bal
  AND c_custkey NOT IN (SELECT o_custkey FROM active)
GROUP BY cntrycode
""",
    tags=("C3", "C4", "tpch-q22"),
)
def q22_global_sales(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: above-average-balance customers with no
    recent orders — scalar AVG subquery + NOT-IN anti join.  Country
    code is ``c_custkey % 7`` and "no orders" is "no orders since
    2000-01-01" (every customer here has at least one order)."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    base = cust.select(
        "c_custkey",
        (F.col("c_custkey") % 7).alias("cntrycode"),
        "c_acctbal",
    ).filter(F.col("cntrycode").isin(1, 2, 4))
    thresh = base.filter(F.col("c_acctbal") > 0).agg(
        F.round(
            F.sum(F.col("c_acctbal").cast("decimal(18,4)")).cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("avg_bal")
    )
    active = (
        orders.filter(
            F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp")
        )
        .select("o_custkey")
        .distinct()
    )
    return (
        base.crossJoin(F.broadcast(thresh))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(active, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy("cntrycode")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            dsum("c_acctbal").alias("totacctbal"),
        )
    )
