"""Window-function surface (SURVEY.md §2.C row C5) + sort/limit/top-k
(row C6).

Every window orders by a compound key ending in a unique column so
rank/lag results are deterministic across engines; float measures are
reduced with the exact-decimal trick from ``_util`` before windowed
sums so Spark's partition order can't perturb the values.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from distributed_system_spark.queries import register
from distributed_system_spark.queries._util import dsum, sql_dsum
from distributed_system_spark.sources.tables import load_table


@register(
    "window_rank",
    oracle="""
SELECT * FROM (
  SELECT c_nationkey, c_custkey, round(c_acctbal, 2) AS acctbal,
         row_number()  OVER w AS rn,
         rank()        OVER w AS rnk,
         dense_rank()  OVER w AS drnk
  FROM customer
  WINDOW w AS (PARTITION BY c_nationkey
               ORDER BY c_acctbal DESC, c_custkey)
) WHERE rn <= 5
""",
    tags=("C5",),
)
def window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey")
    )
    return (
        cust.select(
            "c_nationkey",
            "c_custkey",
            F.round("c_acctbal", 2).alias("acctbal"),
            F.row_number().over(w).cast("long").alias("rn"),
            F.rank().over(w).cast("long").alias("rnk"),
            F.dense_rank().over(w).cast("long").alias("drnk"),
        )
        .filter(F.col("rn") <= 5)
    )


@register(
    "window_lag_lead",
    oracle="""
SELECT event_id, user_id,
       epoch_us(ts) AS ts_us,
       round(value, 4) AS value,
       round(lag(value)  OVER w, 4) AS prev_value,
       round(lead(value) OVER w, 4) AS next_value,
       epoch_us(ts) - lag(epoch_us(ts)) OVER w AS gap_us
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
""",
    tags=("C5",),
)
def window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").withColumn(
        "ts_us", F.expr("ts_ns div 1000")
    )
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    return ev.select(
        "event_id",
        "user_id",
        "ts_us",
        F.round("value", 4).alias("value"),
        F.round(F.lag("value").over(w), 4).alias("prev_value"),
        F.round(F.lead("value").over(w), 4).alias("next_value"),
        (F.col("ts_us") - F.lag("ts_us").over(w)).alias("gap_us"),
    )


@register(
    "window_running",
    oracle="""
SELECT o_custkey, o_orderkey,
       count(*) OVER w AS order_seq,
       round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) OVER w AS DOUBLE), 2)
         AS running_spend
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
""",
    tags=("C5",),
)
def window_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.count(F.lit(1)).over(w).alias("order_seq"),
        F.round(
            F.sum(F.col("o_totalprice").cast("decimal(18,4)")).over(w).cast(
                "double"
            ),
            2,
        ).alias("running_spend"),
    )


@register(
    "window_range_frame",
    oracle="""
SELECT o_orderkey, o_custkey, day_n,
       count(*) OVER w AS n_last30,
       round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) OVER w AS DOUBLE), 2)
         AS spend_last30
FROM (SELECT *, date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE))
               AS day_n
      FROM orders)
WINDOW w AS (PARTITION BY o_custkey ORDER BY day_n
             RANGE BETWEEN 30 PRECEDING AND CURRENT ROW)
""",
    tags=("C5", "range-frame"),
)
def window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame over a day-number ordering: per order, the same
    customer's trailing-30-day order count and spend."""
    orders = load_table(spark, sf_dir, "orders").withColumn(
        "day_n",
        F.datediff(
            F.col("o_orderdate"), F.lit("1995-01-01").cast("date")
        ).cast("long"),
    )
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("day_n")
        .rangeBetween(-30, Window.currentRow)
    )
    return orders.select(
        "o_orderkey",
        "o_custkey",
        "day_n",
        F.count(F.lit(1)).over(w).alias("n_last30"),
        F.round(
            F.sum(F.col("o_totalprice").cast("decimal(18,4)")).over(w).cast(
                "double"
            ),
            2,
        ).alias("spend_last30"),
    )


@register(
    "window_ntile",
    oracle="""
SELECT c_custkey,
       ntile(10)       OVER w AS decile,
       round(percent_rank() OVER w, 6) AS pr,
       round(cume_dist()    OVER w, 6) AS cd
FROM customer
WINDOW w AS (ORDER BY c_acctbal, c_custkey)
""",
    tags=("C5",),
)
def window_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ntile/percent_rank/cume_dist over ONE unpartitioned window —
    deliberately kept as the registry's only full-corpus global
    window, because it is the semantics demo for the rank-function
    family and any partitioning would change the answer.

    At 100 TB this shape (all rows through a single window partition)
    is the one to AVOID: the scalable equivalent of "which decile is
    this row in" is `rfm_segments`' broadcast-quantile-threshold plan
    — compute approx/exact decile cut points in one aggregate pass,
    broadcast the ~10 thresholds back, and assign each row with a
    shuffle-free comparison.  That alternative is exact for fixed
    cut points and never moves the corpus to one task; use it (or a
    range-partitioned window, which Spark lacks natively) whenever
    the decile/percentile label, not the exact global rank, is what
    downstream consumes.

    DECLARED WEAK (same footnote class as ``embedding_neardup``):
    this demo stays registered for the rank-function semantics; the
    production entry is ``window_ntile_bucketed`` below — identical
    oracle, identical answer, partitioned-window plan (plan-asserted
    no corpus-sized SinglePartition exchange)."""
    cust = load_table(spark, sf_dir, "customer")
    w = Window.orderBy("c_acctbal", "c_custkey")
    return cust.select(
        "c_custkey",
        F.ntile(10).over(w).cast("long").alias("decile"),
        F.round(F.percent_rank().over(w), 6).alias("pr"),
        F.round(F.cume_dist().over(w), 6).alias("cd"),
    )


@register(
    "window_ntile_bucketed",
    oracle="""
SELECT c_custkey,
       ntile(10)       OVER w AS decile,
       round(percent_rank() OVER w, 6) AS pr,
       round(cume_dist()    OVER w, 6) AS cd
FROM customer
WINDOW w AS (ORDER BY c_acctbal, c_custkey)
""",
    tags=("C5", "bench"),
)
def window_ntile_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT global ntile/percent_rank/cume_dist with NO corpus-sized
    single-partition window — the scale-safe twin of the
    ``window_ntile`` demo (r10 verdict item #4), same answer
    bit-for-bit (identical oracle).

    Shape (the ``rfm_segments``/``pareto_user_share`` all-integer
    rank-threshold discipline, lifted to exact global ranks):

    1. Range-bucket each row by an ORDER-PRESERVING coarse function of
       the sort key — ``floor(c_acctbal / 100)``, ~110 buckets over
       TPC-H's uniform [-999.99, 9999.99] acctbal domain.  (For an
       unknown distribution the cut points would come from one
       approxQuantile pass instead; the bucketing function is the only
       distribution-dependent piece.)
    2. Per-bucket ``row_number`` over (c_acctbal, c_custkey) — a
       PARTITIONED window, one hash exchange on the bucket id, each
       partition sorts only its own slice.
    3. Per-bucket counts (tiny aggregate, ~110 rows) → prefix-sum
       offsets + grand total via a single-partition window OVER THE
       AGGREGATE ONLY (the ``dataset_curriculum_phases`` idiom — the
       plan's one SinglePartition exchange moves ~110 rows).
    4. Broadcast-join offsets back on the bucket id:
       ``global_rank = offset + local_rank`` — exact, unique (the
       compound key ends in the c_custkey tiebreaker).
    5. All three rank functions are then closed-form in (r, n):
       ntile's uneven-tile rule all-integer (first n%10 tiles take
       ceil(n/10) rows), percent_rank = (r-1)/(n-1), cume_dist = r/n
       (ties impossible under the unique ordering).

    At 100 TB: the corpus crosses one hash exchange (the bucket
    partitioning) instead of collapsing onto a single task; work per
    partition is |bucket| log |bucket|.  Skewed sort keys need only a
    finer/quantile-based bucketing function — the plan is unchanged."""
    cust = load_table(spark, sf_dir, "customer")
    return _exact_global_ranks(
        cust,
        id_col="c_custkey",
        sort_col="c_acctbal",
        bucket=F.floor(F.col("c_acctbal") / 100).cast("int"),
    )


def _exact_global_ranks(
    df: DataFrame, id_col: str, sort_col: str, bucket
) -> DataFrame:
    """The bucketed exact-global-rank machinery behind
    ``window_ntile_bucketed`` (steps 1-5 of its docstring), over any
    (id, sort) pair and order-preserving coarse bucket expression —
    one hash exchange on the bucket id, a prefix-sum aggregate the
    size of the bucket count, a broadcast join-back, and closed-form
    ntile/percent_rank/cume_dist in (rank, n)."""
    bucketed = df.select(id_col, sort_col, bucket.alias("__bucket"))
    lw = Window.partitionBy("__bucket").orderBy(sort_col, id_col)
    local = bucketed.select(
        id_col, "__bucket", F.row_number().over(lw).alias("__lr")
    )
    counts = bucketed.groupBy("__bucket").agg(F.count(F.lit(1)).alias("__c"))
    offsets = counts.select(
        "__bucket",
        (F.sum("__c").over(Window.orderBy("__bucket"))
         - F.col("__c")).alias("__off"),
        F.sum("__c").over(Window.partitionBy()).alias("__n"),
    )
    r = F.col("__off") + F.col("__lr")
    n = F.col("__n")
    q = F.floor(n / 10).cast("long")   # floor tile size
    rem = n % 10                       # first `rem` tiles take q+1 rows
    big_span = rem * (q + 1)
    decile = (
        F.when(r <= big_span, F.floor((r - 1) / (q + 1)))
        .otherwise(rem + F.floor((r - big_span - 1) / q))
        .cast("long")
        + 1
    )
    joined = local.join(F.broadcast(offsets), "__bucket")
    return joined.select(
        id_col,
        decile.alias("decile"),
        F.round(
            F.when(n > 1, (r - 1).cast("double") / (n - 1)).otherwise(0.0), 6
        ).alias("pr"),
        F.round(r.cast("double") / n, 6).alias("cd"),
    )


@register(
    "window_ntile_bucketed_orders",
    oracle="""
SELECT o_orderkey,
       ntile(10)       OVER w AS decile,
       round(percent_rank() OVER w, 6) AS pr,
       round(cume_dist()    OVER w, 6) AS cd
FROM orders
WINDOW w AS (ORDER BY o_totalprice, o_orderkey)
""",
    tags=("C5",),
)
def window_ntile_bucketed_orders(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """``window_ntile_bucketed``'s machinery on a FACT table: exact
    global order-value deciles / percent_rank / cume_dist over
    ``orders`` with no corpus-sized single-partition window.  Exists
    because ``customer`` is a fixed DIMENSION in the manufactured
    scale decades (tools/scaleup.py pins dimensions, as 100 TB
    reality does), so only a fact-table form can decade-measure the
    claim that the corpus crosses one hash exchange while the
    SinglePartition window touches only the ~120-row bucket
    aggregate.  Bucketing: floor(o_totalprice / 5000) — TPC-H total
    prices span ~[800, 600k], so ~120 buckets at every decade (the
    manufactured replicas shift keys, not the price domain), and
    per-bucket work grows linearly with the decade."""
    orders = load_table(spark, sf_dir, "orders")
    return _exact_global_ranks(
        orders,
        id_col="o_orderkey",
        sort_col="o_totalprice",
        bucket=F.floor(F.col("o_totalprice") / 5000).cast("int"),
    )


@register(
    "topk_per_group",
    oracle=f"""
WITH rev AS (
  SELECT p_brand, p_partkey, {sql_dsum('l_extendedprice')} AS revenue
  FROM lineitem JOIN part ON l_partkey = p_partkey
  GROUP BY p_brand, p_partkey
)
SELECT p_brand, p_partkey, revenue
FROM (SELECT *, row_number() OVER (PARTITION BY p_brand
                                   ORDER BY revenue DESC, p_partkey) AS rn
      FROM rev)
WHERE rn <= 3
""",
    tags=("C6",),
)
def topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 parts by revenue per brand — window over a pre-aggregated
    (already rounded, hence engine-stable) measure."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    rev = (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_partkey")
        .agg(dsum("l_extendedprice").alias("revenue"))
    )
    w = Window.partitionBy("p_brand").orderBy(
        F.col("revenue").desc(), F.col("p_partkey")
    )
    return (
        rev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("p_brand", "p_partkey", "revenue")
    )


@register(
    "orderby_limit",
    oracle="""
SELECT o_orderkey, round(o_totalprice, 2) AS o_totalprice
FROM orders
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 10
""",
    tags=("C6", "B9"),
)
def orderby_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k: Spark plans this as TakeOrderedAndProject — a
    per-partition top-k plus a driver merge, never a full sort."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(10)
        .select("o_orderkey", F.round("o_totalprice", 2).alias("o_totalprice"))
    )


@register(
    "window_distribution",
    oracle="""
SELECT o_orderkey,
       o_orderstatus,
       round(percent_rank() OVER w, 6) AS pct_rank,
       round(cume_dist() OVER w, 6) AS cdist,
       first_value(o_orderkey) OVER w AS first_key,
       nth_value(o_orderkey, 3) OVER w AS third_key
FROM orders
WHERE o_orderkey <= 2000
WINDOW w AS (PARTITION BY o_orderstatus
             ORDER BY o_totalprice DESC, o_orderkey)
""",
    tags=("C5", "distribution"),
)
def window_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution window functions (percent_rank / cume_dist) plus
    positional ones (first_value / nth_value) over one deterministic
    ordering — exact rationals, rounded identically on both engines.
    One shuffle on the partition key, like every other window here."""
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderkey") <= 2000
    )
    w = Window.partitionBy("o_orderstatus").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return orders.select(
        "o_orderkey",
        "o_orderstatus",
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cdist"),
        F.first("o_orderkey").over(w).alias("first_key"),
        F.nth_value("o_orderkey", 3).over(w).alias("third_key"),
    )


@register(
    "window_distinct_running",
    oracle=f"""
WITH d AS (
  SELECT event_type,
         (epoch_us(ts) // {24 * 3_600_000_000}) AS day, user_id
  FROM events
),
daily AS (SELECT DISTINCT event_type, day, user_id FROM d)
SELECT event_type, day,
       count(DISTINCT user_id) OVER (
         PARTITION BY event_type ORDER BY day
         RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         AS cum_distinct_users
FROM (SELECT DISTINCT event_type, day FROM daily) g
JOIN daily USING (event_type, day) -- re-expand so the window sees users
QUALIFY row_number() OVER (PARTITION BY event_type, day
                           ORDER BY user_id) = 1
""",
    tags=("C5", "window", "distinct"),
)
def window_distinct_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative DISTINCT count over a window — per event type, how
    many distinct users have been seen through each day.  Spark has no
    count(DISTINCT) window function; the scalable encoding is the
    first-occurrence trick: rank each (type, user) pair by day, keep
    day-of-first-sight, then a plain running SUM of first-sights per
    day — turning a quadratic distinct-window into one dedup groupBy
    plus one ordinary cumulative window.

    At 100 TB: state per (type,user) pair once (not per event), and
    the running sum windows over the tiny (type, day) grid.  The
    oracle uses DuckDB's native distinct-window to prove the encoding
    exact.
    """
    day_us = 24 * 3_600_000_000
    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        (F.expr("ts_ns div 1000") / F.lit(day_us))
        .cast("long")
        .alias("day"),
        "user_id",
    )
    first_seen = ev.groupBy("event_type", "user_id").agg(
        F.min("day").alias("first_day")
    )
    adds = first_seen.groupBy(
        "event_type", F.col("first_day").alias("day")
    ).agg(F.count(F.lit(1)).alias("n_new"))
    days = ev.select("event_type", "day").distinct()
    grid = days.join(adds, ["event_type", "day"], "left").select(
        "event_type", "day", F.coalesce("n_new", F.lit(0)).alias("n_new")
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return grid.select(
        "event_type",
        "day",
        F.sum("n_new").over(w).alias("cum_distinct_users"),
    )


@register(
    "window_first_last",
    oracle="""
SELECT o_custkey, o_orderkey,
       first_value(o_orderkey) OVER w AS first_order,
       last_value(o_orderkey) OVER w AS latest_order,
       nth_value(o_orderkey, 2) OVER w AS second_order,
       CAST(round(CAST(o_totalprice AS DECIMAL(18,4))
             - first_value(CAST(o_totalprice AS DECIMAL(18,4))) OVER w,
             2) AS DOUBLE) AS delta_vs_first
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
""",
    tags=("C5", "window", "first-last"),
)
def window_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first_value / last_value / nth_value over an explicit
    unbounded frame — the frame-navigation trio completing the window
    family (lag/lead, rank, running, range, ntile, distribution,
    distinct-running are separate entries).  The UNBOUNDED FOLLOWING
    frame is the part naive ports get wrong: last_value under the
    default frame is just the current row.  One shuffle on
    o_custkey; price deltas subtract in DECIMAL before rounding."""
    orders = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    price_dec = F.col("o_totalprice").cast("decimal(18,4)")
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.first("o_orderkey").over(w).alias("first_order"),
        F.last("o_orderkey").over(w).alias("latest_order"),
        F.nth_value("o_orderkey", 2).over(w).alias("second_order"),
        F.round(price_dec - F.first(price_dec).over(w), 2)
        .cast("double")
        .alias("delta_vs_first"),
    )
