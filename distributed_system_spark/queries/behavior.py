"""Behavioral / operational analytics over the events stream table:
batch sessionization (the window-function face of C9's session
windows), retention cohorts, and a join-key skew report.

Scale notes:
- Sessionization is two windows and one aggregate, all partitioned by
  user_id — one shuffle on the natural key, no state beyond the
  window frame.  This is the batch twin of `win_session`
  (session_window); at 100 TB/day the streaming form bounds state
  with a watermark while this form is the backfill path.
- The cohort matrix is two grouped passes over events joined on
  user_id (first-activity side is one row per user — broadcastable).
- The skew report is the operational pre-check for the salted-join
  path (`join_skew_salted`): it's how you *find* the keys worth
  salting before a 100 TB join, as a TakeOrderedAndProject (top-k
  heap), never a global sort.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from distributed_system_spark.queries import register
from distributed_system_spark.sources.tables import load_table

_GAP_US = 1_800_000_000  # 30 min session gap


@register(
    "sessionize_events",
    oracle=f"""
WITH e AS (
  SELECT user_id, event_id, epoch_us(ts) AS ts_us FROM events
), g AS (
  SELECT user_id, event_id, ts_us,
         CASE WHEN lag(ts_us) OVER w IS NULL
                   OR ts_us - lag(ts_us) OVER w > {_GAP_US}
              THEN 1 ELSE 0 END AS is_new
  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)
), s AS (
  SELECT user_id, ts_us,
         CAST(SUM(is_new) OVER (PARTITION BY user_id
                                ORDER BY ts_us, event_id
                                ROWS UNBOUNDED PRECEDING) AS BIGINT)
           AS session_id
  FROM g
)
SELECT user_id, session_id, count(*) AS n_events,
       min(ts_us) AS start_us, max(ts_us) AS end_us,
       max(ts_us) - min(ts_us) AS duration_us
FROM s GROUP BY user_id, session_id
""",
    tags=("C5", "C9", "sessionization"),
)
def sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch sessionization: lag-gap flag + running sum assigns session
    ids (30-min gap), then per-session aggregates — the classic
    two-window shape, deterministic via the (ts, event_id) tiebreak."""
    ev = load_table(spark, sf_dir, "events").withColumn(
        "ts_us", F.expr("ts_ns div 1000")
    )
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    flagged = ev.withColumn(
        "is_new",
        F.when(
            F.lag("ts_us").over(w).isNull()
            | (F.col("ts_us") - F.lag("ts_us").over(w) > _GAP_US),
            1,
        ).otherwise(0),
    )
    with_sid = flagged.withColumn(
        "session_id",
        F.sum("is_new").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return with_sid.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("ts_us").alias("start_us"),
        F.max("ts_us").alias("end_us"),
        (F.max("ts_us") - F.min("ts_us")).alias("duration_us"),
    )


@register(
    "retention_cohorts",
    oracle="""
WITH f AS (
  SELECT user_id, date_trunc('week', min(ts)) AS cohort
  FROM events GROUP BY user_id
), a AS (
  SELECT DISTINCT user_id, date_trunc('week', ts) AS wk FROM events
)
SELECT cohort,
       CAST(date_diff('day', cohort, wk) / 7 AS BIGINT) AS week_offset,
       count(*) AS n_active
FROM a JOIN f USING (user_id)
GROUP BY cohort, week_offset
""",
    tags=("C4", "retention"),
)
def retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retention matrix: users bucketed by first-activity week
    (cohort), counted per week-offset of later activity — two grouped
    passes joined on user_id; the per-user cohort side broadcasts."""
    ev = load_table(spark, sf_dir, "events")
    first = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort")
    )
    active = ev.select(
        "user_id", F.date_trunc("week", "ts").alias("wk")
    ).distinct()
    return (
        active.join(F.broadcast(first), "user_id")
        .groupBy(
            "cohort",
            (F.datediff("wk", "cohort") / 7).cast("long").alias(
                "week_offset"
            ),
        )
        .agg(F.count(F.lit(1)).alias("n_active"))
    )


@register(
    "skew_report",
    oracle="""
SELECT l_orderkey, count(*) AS n_rows,
       round(CAST(count(*) AS DOUBLE)
             / (SELECT count(*) FROM lineitem), 9) AS share
FROM lineitem
GROUP BY l_orderkey
ORDER BY n_rows DESC, l_orderkey
LIMIT 20
""",
    tags=("C4", "C6", "skew"),
)
def skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 heaviest join keys with their row share — the
    operational pre-check that decides which keys the salted join
    (`join_skew_salted`) must replicate.  Planned as partial agg +
    TakeOrderedAndProject; the total is a broadcast 1-row scalar."""
    li = load_table(spark, sf_dir, "lineitem")
    per_key = li.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("n_rows")
    )
    total = li.agg(F.count(F.lit(1)).alias("total"))
    return (
        per_key.crossJoin(F.broadcast(total))
        .select(
            "l_orderkey",
            "n_rows",
            F.round(
                F.col("n_rows").cast("double") / F.col("total"), 9
            ).alias("share"),
        )
        .orderBy(F.col("n_rows").desc(), "l_orderkey")
        .limit(20)
    )


@register(
    "funnel_stages",
    oracle="""
WITH e AS (
  SELECT user_id, event_type, epoch_us(ts) AS ts_us FROM events
), v AS (
  SELECT user_id, min(ts_us) AS v_ts FROM e
  WHERE event_type = 'view' GROUP BY user_id
), c AS (
  SELECT e.user_id, min(e.ts_us) AS c_ts
  FROM e JOIN v ON e.user_id = v.user_id
  WHERE e.event_type = 'click' AND e.ts_us > v.v_ts
  GROUP BY e.user_id
), p AS (
  SELECT e.user_id, min(e.ts_us) AS p_ts
  FROM e JOIN c ON e.user_id = c.user_id
  WHERE e.event_type = 'purchase' AND e.ts_us > c.c_ts
  GROUP BY e.user_id
)
SELECT (SELECT count(*) FROM v) AS n_viewed,
       (SELECT count(*) FROM c) AS n_clicked,
       (SELECT count(*) FROM p) AS n_purchased
""",
    tags=("C4", "funnel"),
)
def funnel_stages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel (view → later click → later purchase): each
    stage is a grouped min joined to the previous stage's per-user
    anchor — two equi joins on user_id, no window over the global
    stream, per-user state only."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", F.expr("ts_ns div 1000").alias("ts_us")
    )
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts_us").alias("v_ts"))
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts_us") > F.col("v_ts"))
        .groupBy("user_id")
        .agg(F.min("ts_us").alias("c_ts"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts_us") > F.col("c_ts"))
        .groupBy("user_id")
        .agg(F.min("ts_us").alias("p_ts"))
    )
    return (
        v.agg(F.count(F.lit(1)).alias("n_viewed"))
        .crossJoin(c.agg(F.count(F.lit(1)).alias("n_clicked")))
        .crossJoin(p.agg(F.count(F.lit(1)).alias("n_purchased")))
    )


@register(
    "cdc_latest_per_key",
    oracle="""
SELECT user_id, event_type, event_id AS last_event_id,
       ts_us AS last_ts_us, value AS last_value
FROM (
  SELECT user_id, event_type, event_id, epoch_us(ts) AS ts_us, value,
         row_number() OVER (PARTITION BY user_id, event_type
                            ORDER BY epoch_us(ts) DESC, event_id DESC)
           AS rn
  FROM events
) WHERE rn = 1
""",
    tags=("C5", "cdc"),
)
def cdc_latest_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep-latest compaction per (user, type) — the CDC upsert twin
    of `stream_dedup_first`'s keep-first: one row_number window on
    the natural key, deterministic via the (ts, event_id) tiebreak.
    At scale this is the merge-on-read compaction pass every
    change-capture table needs."""
    ev = load_table(spark, sf_dir, "events").withColumn(
        "ts_us", F.expr("ts_ns div 1000")
    )
    w = Window.partitionBy("user_id", "event_type").orderBy(
        F.col("ts_us").desc(), F.col("event_id").desc()
    )
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            "event_type",
            F.col("event_id").alias("last_event_id"),
            F.col("ts_us").alias("last_ts_us"),
            F.col("value").alias("last_value"),
        )
    )


@register(
    "merge_upsert",
    oracle="""
WITH spend AS (
  SELECT o_custkey,
         CAST(round(SUM(CAST(o_totalprice AS DECIMAL(18,4))), 2) AS DOUBLE)
           AS spend
  FROM orders
  WHERE o_orderdate >= TIMESTAMP '2001-01-01 00:00:00'
  GROUP BY o_custkey
), changes AS (
  SELECT o_custkey AS key, spend FROM spend
  UNION ALL
  SELECT -o_custkey AS key, spend FROM spend
  WHERE o_custkey % 97 = 0
)
SELECT COALESCE(c.c_custkey, ch.key) AS custkey,
       CAST(round(CAST(
         CASE WHEN c.c_custkey IS NULL THEN ch.spend
              WHEN ch.key IS NULL THEN c.c_acctbal
              ELSE c.c_acctbal + ch.spend END AS DECIMAL(18,4)), 2)
         AS DOUBLE) AS acctbal,
       CASE WHEN c.c_custkey IS NULL THEN 'insert'
            WHEN ch.key IS NULL THEN 'keep'
            ELSE 'update' END AS op
FROM customer c FULL OUTER JOIN changes ch ON c.c_custkey = ch.key
""",
    tags=("C3", "merge", "cdc"),
)
def merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE INTO semantics (the Delta/Iceberg upsert) as a full outer
    join: matched rows update (balance + recent spend), unmatched
    change rows insert, unmatched base rows keep.  One shuffle on the
    merge key; at lakehouse scale the same plan runs per partition
    after AQE prunes untouched files — the reference's closest analog
    is SDFS put-overwrite (A14), which can only replace whole files."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    spend = (
        orders.filter(
            F.col("o_orderdate") >= F.lit("2001-01-01").cast("timestamp")
        )
        .groupBy("o_custkey")
        .agg(
            F.round(
                F.sum(F.col("o_totalprice").cast("decimal(18,4)")), 2
            ).cast("double").alias("spend")
        )
    )
    # Synthetic insert keys are NEGATED custkeys: custkeys are
    # positive at every SF, so an insert key can never collide with a
    # real c_custkey (a +100000 offset would at SFs where custkeys
    # exceed it, silently fanning out the full outer join).
    inserts = spend.filter(F.col("o_custkey") % 97 == 0).select(
        (-F.col("o_custkey")).alias("key"), "spend"
    )
    changes = spend.select(
        F.col("o_custkey").alias("key"), "spend"
    ).unionByName(inserts)
    merged = cust.join(changes, cust["c_custkey"] == changes["key"], "full")
    new_bal = (
        F.when(F.col("c_custkey").isNull(), F.col("spend"))
        .when(F.col("key").isNull(), F.col("c_acctbal"))
        .otherwise(F.col("c_acctbal") + F.col("spend"))
    )
    return merged.select(
        F.coalesce("c_custkey", "key").alias("custkey"),
        F.round(new_bal.cast("decimal(18,4)"), 2)
        .cast("double")
        .alias("acctbal"),
        F.when(F.col("c_custkey").isNull(), "insert")
        .when(F.col("key").isNull(), "keep")
        .otherwise("update")
        .alias("op"),
    )


@register(
    "event_transitions",
    oracle="""
WITH seq AS (
  SELECT user_id, event_type, epoch_us(ts) AS ts_us, event_id,
         lead(event_type) OVER (PARTITION BY user_id
                                ORDER BY epoch_us(ts), event_id)
           AS next_type
  FROM events
)
SELECT event_type AS from_type, next_type AS to_type,
       count(*) AS cnt,
       round(CAST(count(*) AS DOUBLE)
             / SUM(count(*)) OVER (PARTITION BY event_type), 6) AS p
FROM seq
WHERE next_type IS NOT NULL
GROUP BY event_type, next_type
""",
    tags=("C5", "sequence", "markov"),
)
def event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over each user's event
    sequence: lead() pairs consecutive events, one grouped count, and
    a per-source normalization window over the (tiny) transition
    matrix itself — the sequence-mining shape behind session-flow and
    clickstream analysis."""
    ev = load_table(spark, sf_dir, "events").withColumn(
        "ts_us", F.expr("ts_ns div 1000")
    )
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    seq = ev.withColumn("next_type", F.lead("event_type").over(w)).filter(
        F.col("next_type").isNotNull()
    )
    counts = seq.groupBy(
        F.col("event_type").alias("from_type"),
        F.col("next_type").alias("to_type"),
    ).agg(F.count(F.lit(1)).alias("cnt"))
    norm = Window.partitionBy("from_type")
    return counts.select(
        "from_type",
        "to_type",
        "cnt",
        F.round(
            F.col("cnt").cast("double") / F.sum("cnt").over(norm), 6
        ).alias("p"),
    )


@register(
    "scd2_user_state",
    oracle="""
SELECT user_id,
       value AS state_value,
       epoch_us(ts) AS valid_from_us,
       coalesce(lead(epoch_us(ts)) OVER w, 9223372036854775807)
         AS valid_to_us,
       CASE WHEN lead(epoch_us(ts)) OVER w IS NULL THEN 1 ELSE 0 END
         AS is_current
FROM events
WHERE event_type = 'view'
WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
""",
    tags=("C5", "scd2", "temporal"),
)
def scd2_user_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Type-2 slowly-changing dimension built from a change stream:
    each 'view' event opens a validity interval [ts, next-change) for
    the user's state value; the open interval carries max-long and an
    is_current flag.  One lead() window per user — the standard
    SCD2 build, linear and partitioned by the dimension key."""
    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "view")
        .withColumn("ts_us", F.expr("ts_ns div 1000"))
    )
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    nxt = F.lead("ts_us").over(w)
    return ev.select(
        "user_id",
        F.col("value").alias("state_value"),
        F.col("ts_us").alias("valid_from_us"),
        F.coalesce(nxt, F.lit(9223372036854775807)).alias("valid_to_us"),
        F.when(nxt.isNull(), 1).otherwise(0).alias("is_current"),
    )


@register(
    "join_point_in_time",
    oracle="""
WITH scd AS (
  SELECT user_id,
         value AS state_value,
         epoch_us(ts) AS valid_from_us,
         coalesce(lead(epoch_us(ts)) OVER w, 9223372036854775807)
           AS valid_to_us
  FROM events
  WHERE event_type = 'view'
  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
)
SELECT p.user_id,
       p.event_id AS purchase_id,
       epoch_us(p.ts) AS purchase_ts_us,
       s.state_value,
       s.valid_from_us
FROM events p
JOIN scd s
  ON s.user_id = p.user_id
 AND epoch_us(p.ts) >= s.valid_from_us
 AND epoch_us(p.ts) < s.valid_to_us
WHERE p.event_type = 'purchase'
""",
    tags=("C3", "temporal", "point-in-time"),
)
def join_point_in_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time (temporal) join: enrich each purchase with the
    state interval valid AT its timestamp — the warehouse
    as-of-history join that keeps training features leak-free (no
    future state leaks into a past example).  The interval sides
    equi-join on user_id first, so Catalyst keeps a hash join with
    the range predicates as post-join filters — never a cartesian;
    intervals are non-overlapping by construction so each purchase
    matches at most one row."""
    ev = load_table(spark, sf_dir, "events").withColumn(
        "ts_us", F.expr("ts_ns div 1000")
    )
    scd = scd2_user_state(spark, sf_dir)
    p = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("purchase_id"),
        F.col("ts_us").alias("purchase_ts_us"),
    )
    return (
        p.join(scd, "user_id")
        .filter(
            (F.col("purchase_ts_us") >= F.col("valid_from_us"))
            & (F.col("purchase_ts_us") < F.col("valid_to_us"))
        )
        .select(
            "user_id",
            "purchase_id",
            "purchase_ts_us",
            "state_value",
            "valid_from_us",
        )
    )


# One PageRank iteration as SQL: rank r_v' = 0.15/N + 0.85 * sum over
# in-edges of round(r_u * w / outw_u, 12), the per-edge contribution
# rounded so both engines sum IDENTICAL doubles (exactly, in DECIMAL).
_PR_ITER_SQL = """
{out} AS (
  SELECT n.node,
         round(0.15 / (SELECT n FROM params)
               + 0.85 * coalesce(s.sum_c, 0), 10) AS r
  FROM nodes n LEFT JOIN (
    SELECT e.dst AS node,
           CAST(sum(CAST(round({prev}.r * e.w / o.ow, 12)
                         AS DECIMAL(28,12))) AS DOUBLE) AS sum_c
    FROM edges e
    JOIN {prev} ON {prev}.node = e.src
    JOIN outw o ON o.src = e.src
    GROUP BY e.dst) s ON s.node = n.node
)"""


@register(
    "pagerank_transitions",
    oracle=f"""
WITH seq AS (
  SELECT event_type,
         lead(event_type) OVER (PARTITION BY user_id
                                ORDER BY epoch_us(ts), event_id) AS next_type
  FROM events
),
edges AS (
  SELECT event_type AS src, next_type AS dst, count(*) AS w
  FROM seq WHERE next_type IS NOT NULL GROUP BY 1, 2
),
nodes AS (SELECT DISTINCT event_type AS node FROM events),
params AS (SELECT count(*) AS n FROM nodes),
outw AS (SELECT src, sum(w) AS ow FROM edges GROUP BY src),
r0 AS (SELECT node, round(1.0 / (SELECT n FROM params), 10) AS r FROM nodes),
{_PR_ITER_SQL.format(out="it1", prev="r0")},
{_PR_ITER_SQL.format(out="it2", prev="it1")},
{_PR_ITER_SQL.format(out="it3", prev="it2")}
SELECT node, r AS pagerank FROM it3
""",
    tags=("graph", "iterative", "pagerank"),
)
def pagerank_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted PageRank (damping 0.85, 3 iterations) over the
    event-type transition graph — the second iterative graph algorithm
    after connected components, exercising the loop-as-repeated-joins
    shape with a FULLY value-checked oracle (the recursive fixpoint
    CC's oracle checks only labels; here every rank matches to 10
    decimals because per-edge contributions are rounded then summed
    exactly in DECIMAL, so float summation order cannot differ).

    At 100 TB: edges are loop-invariant (computed once — one window +
    one groupBy — and at real graph sizes localCheckpointed like CC's);
    each iteration is one edge⋈rank join + one partial-agg groupBy on
    dst, both shuffling on the same node key so a co-partitioning is
    reused across iterations.  The driver holds only the node COUNT
    (one scalar), never the rank vector.
    """
    ev = load_table(spark, sf_dir, "events")
    w_seq = Window.partitionBy("user_id").orderBy(
        F.expr("ts_ns div 1000"), "event_id"
    )
    seq = ev.withColumn("next_type", F.lead("event_type").over(w_seq))
    edges = (
        seq.filter(F.col("next_type").isNotNull())
        .groupBy(
            F.col("event_type").alias("src"), F.col("next_type").alias("dst")
        )
        .agg(F.count(F.lit(1)).alias("w"))
        .localCheckpoint()  # loop-invariant: cut lineage once
    )
    nodes = ev.select(F.col("event_type").alias("node")).distinct()
    n = nodes.count()  # bounded driver-side scalar (node count only)
    outw = edges.groupBy("src").agg(F.sum("w").alias("ow"))
    ranks = nodes.select(
        "node", F.round(F.lit(1.0) / F.lit(n), 10).alias("r")
    )
    for _ in range(3):
        contrib = (
            edges.join(ranks, edges["src"] == ranks["node"])
            .join(outw, "src")
            .select(
                "dst",
                F.round(F.col("r") * F.col("w") / F.col("ow"), 12)
                .cast("decimal(28,12)")
                .alias("c"),
            )
        )
        sums = contrib.groupBy(F.col("dst").alias("node")).agg(
            F.sum("c").cast("double").alias("sum_c")
        )
        ranks = nodes.join(sums, "node", "left").select(
            "node",
            F.round(
                F.lit(0.15) / F.lit(n)
                + F.lit(0.85) * F.coalesce(F.col("sum_c"), F.lit(0.0)),
                10,
            ).alias("r"),
        )
    return ranks.select("node", F.col("r").alias("pagerank"))


# {head} lets the oracle prepend its edge-derivation CTEs inside the
# single WITH RECURSIVE list (one WITH clause per statement).
_REACH_SQL = """
WITH RECURSIVE {head}reach AS (
  SELECT 'signup' AS node, CAST(0 AS BIGINT) AS hops
  UNION ALL
  SELECT e.to_type AS node, r.hops + 1 AS hops
  FROM reach r JOIN {edges} e ON e.from_type = r.node
  WHERE r.hops < 4
)
SELECT node, min(hops) AS hops FROM reach GROUP BY node
"""

_REACH_ORACLE_HEAD = """seq AS (
  SELECT user_id, event_type,
         lead(event_type) OVER (PARTITION BY user_id
                                ORDER BY epoch_us(ts), event_id)
           AS next_type
  FROM events
), edges AS (
  SELECT DISTINCT event_type AS from_type, next_type AS to_type
  FROM seq
  WHERE next_type IS NOT NULL AND next_type <> event_type
), """


@register(
    "reachability_bfs",
    oracle=_REACH_SQL.format(head=_REACH_ORACLE_HEAD, edges="edges"),
    tags=("C3", "graph", "recursive-cte"),
)
def reachability_bfs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Minimum-hop reachability from 'signup' over the observed
    event-type transition graph, via Spark 4's WITH RECURSIVE.

    Scale shape: the per-user lead() window is the only data-sized
    shuffle; the DISTINCT collapses it to the |event_types|²-bounded
    edge set *before* recursion, so each recursive step joins a
    constant-size frontier against a constant-size edge list —
    iteration depth is graph diameter (capped at 4 hops), never data
    volume.  Self-loops are dropped: they can never shorten a path.
    """
    ev = load_table(spark, sf_dir, "events").withColumn(
        "ts_us", F.expr("ts_ns div 1000")
    )
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    edges = (
        ev.withColumn("next_type", F.lead("event_type").over(w))
        .filter(
            F.col("next_type").isNotNull()
            & (F.col("next_type") != F.col("event_type"))
        )
        .select(
            F.col("event_type").alias("from_type"),
            F.col("next_type").alias("to_type"),
        )
        .distinct()
    )
    edges.createOrReplaceTempView("rcte_edges")
    return spark.sql(_REACH_SQL.format(head="", edges="rcte_edges"))


@register(
    "rfm_segments",
    oracle="""
WITH cm AS (
  SELECT o_custkey AS custkey,
         date_diff('day', CAST(max(o_orderdate) AS DATE),
                   DATE '2001-09-01') AS rec,
         count(*) AS freq,
         CAST(round(SUM(CAST(o_totalprice AS DECIMAL(18,4))), 2)
              AS DOUBLE) AS mon
  FROM orders GROUP BY o_custkey
), q AS (
  SELECT quantile_cont(rec, 0.2) AS rt20, quantile_cont(rec, 0.4) AS rt40,
         quantile_cont(rec, 0.6) AS rt60, quantile_cont(rec, 0.8) AS rt80,
         quantile_cont(freq, 0.2) AS ft20, quantile_cont(freq, 0.4) AS ft40,
         quantile_cont(freq, 0.6) AS ft60, quantile_cont(freq, 0.8) AS ft80,
         quantile_cont(mon, 0.2) AS mt20, quantile_cont(mon, 0.4) AS mt40,
         quantile_cont(mon, 0.6) AS mt60, quantile_cont(mon, 0.8) AS mt80
  FROM cm
), scored AS (
  SELECT custkey, rec, freq, mon,
         5 - CAST(rec > rt20 AS INT) - CAST(rec > rt40 AS INT)
           - CAST(rec > rt60 AS INT) - CAST(rec > rt80 AS INT) AS r_score,
         1 + CAST(freq > ft20 AS INT) + CAST(freq > ft40 AS INT)
           + CAST(freq > ft60 AS INT) + CAST(freq > ft80 AS INT) AS f_score,
         1 + CAST(mon > mt20 AS INT) + CAST(mon > mt40 AS INT)
           + CAST(mon > mt60 AS INT) + CAST(mon > mt80 AS INT) AS m_score
  FROM cm, q
)
SELECT custkey, rec, freq, mon, r_score, f_score, m_score,
       CASE WHEN r_score >= 4 AND f_score >= 4 AND m_score >= 4
              THEN 'champion'
            WHEN f_score >= 4 THEN 'loyal'
            WHEN m_score >= 4 THEN 'big_spender'
            WHEN r_score <= 2 AND f_score >= 3 THEN 'at_risk'
            WHEN r_score <= 2 THEN 'hibernating'
            ELSE 'casual' END AS segment
FROM scored
""",
    tags=("C4", "behavioral", "rfm"),
)
def rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM (recency/frequency/monetary) customer segmentation — the
    classic behavioral scoring shape, built scale-safe: per-customer
    metrics are one groupBy; the 12 quintile thresholds are ONE 1-row
    aggregate broadcast back (never a global ntile window, which
    would single-partition all customers); scores are per-row
    threshold comparisons; segments a deterministic CASE ladder.
    Spark's `percentile` ≡ DuckDB's `quantile_cont` bit-for-bit
    (established by `agg_percentiles`)."""
    orders = load_table(spark, sf_dir, "orders")
    cm = orders.groupBy(F.col("o_custkey").alias("custkey")).agg(
        F.datediff(
            F.lit("2001-09-01").cast("date"),
            F.max("o_orderdate").cast("date"),
        ).cast("long").alias("rec"),
        F.count(F.lit(1)).alias("freq"),
        F.round(F.sum(F.col("o_totalprice").cast("decimal(18,4)")), 2)
        .cast("double")
        .alias("mon"),
    )
    q = cm.agg(
        *[
            F.expr(f"percentile({m}, {p})").alias(f"{m[0]}t{int(p * 100)}")
            for m in ("rec", "freq", "mon")
            for p in (0.2, 0.4, 0.6, 0.8)
        ]
    )

    def up(m: str) -> F.Column:
        s = F.lit(1)
        for p in (20, 40, 60, 80):
            s = s + (F.col(m) > F.col(f"{m[0]}t{p}")).cast("int")
        return s

    def down(m: str) -> F.Column:
        s = F.lit(5)
        for p in (20, 40, 60, 80):
            s = s - (F.col(m) > F.col(f"{m[0]}t{p}")).cast("int")
        return s

    scored = cm.crossJoin(F.broadcast(q)).select(
        "custkey",
        "rec",
        "freq",
        "mon",
        down("rec").alias("r_score"),
        up("freq").alias("f_score"),
        up("mon").alias("m_score"),
    )
    seg = (
        F.when(
            (F.col("r_score") >= 4)
            & (F.col("f_score") >= 4)
            & (F.col("m_score") >= 4),
            "champion",
        )
        .when(F.col("f_score") >= 4, "loyal")
        .when(F.col("m_score") >= 4, "big_spender")
        .when((F.col("r_score") <= 2) & (F.col("f_score") >= 3), "at_risk")
        .when(F.col("r_score") <= 2, "hibernating")
        .otherwise("casual")
    )
    return scored.withColumn("segment", seg)


@register(
    "basket_lift_pairs",
    oracle="""
WITH items AS (
  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
), n AS (SELECT count(DISTINCT l_orderkey) AS n_orders FROM lineitem),
part_supp AS (
  SELECT l_partkey, count(*) AS n_a FROM items GROUP BY l_partkey
),
pair_supp AS (
  SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
         count(*) AS n_ab
  FROM items a JOIN items b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY a.l_partkey, b.l_partkey
)
, scored AS (
  SELECT part_a, part_b, n_ab,
         round((CAST(n_ab AS DOUBLE) / n.n_orders)
               / ((CAST(sa.n_a AS DOUBLE) / n.n_orders)
                  * (CAST(sb.n_a AS DOUBLE) / n.n_orders)), 6) AS lift
  FROM pair_supp
  JOIN part_supp sa ON sa.l_partkey = part_a
  JOIN part_supp sb ON sb.l_partkey = part_b
  CROSS JOIN n
  WHERE n_ab >= 3
)
SELECT part_a, part_b, n_ab, lift, rnk FROM (
  SELECT *, row_number() OVER (ORDER BY lift DESC, part_a, part_b) AS rnk
  FROM scored
) WHERE rnk <= 20
""",
    tags=("C4", "basket", "association"),
)
def basket_lift_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket association: top-20 co-purchased part pairs by
    lift = P(a,b) / (P(a)·P(b)), min support 3 orders.

    Scale shape: the within-order self-join is bounded by basket size
    (a handful of lines per order — pairs per order grow with
    basket², never corpus²); the per-part support table scales with
    |parts| (~200k/SF — multi-GB at 100 TB), so it is NOT
    force-broadcast: the threshold/AQE decides, and past it the
    support joins become shuffles on the same part keys the pair
    table is already hashed on.  Only the 1-row order count keeps an
    explicit broadcast hint.  The top-20 is TakeOrdered on the
    rounded lift with a (part_a, part_b) tiebreak.
    """
    li = load_table(spark, sf_dir, "lineitem")
    items = li.select("l_orderkey", "l_partkey").distinct()
    n = li.agg(F.countDistinct("l_orderkey").alias("n_orders"))
    part_supp = items.groupBy("l_partkey").agg(
        F.count(F.lit(1)).alias("n_a")
    )
    a = items.select(
        F.col("l_orderkey"), F.col("l_partkey").alias("part_a")
    )
    b = items.select(
        F.col("l_orderkey"), F.col("l_partkey").alias("part_b")
    )
    pair_supp = (
        a.join(b, "l_orderkey")
        .filter(F.col("part_a") < F.col("part_b"))
        .groupBy("part_a", "part_b")
        .agg(F.count(F.lit(1)).alias("n_ab"))
        .filter(F.col("n_ab") >= 3)
    )
    sa = part_supp.select(
        F.col("l_partkey").alias("part_a"), F.col("n_a").alias("supp_a")
    )
    sb = part_supp.select(
        F.col("l_partkey").alias("part_b"), F.col("n_a").alias("supp_b")
    )
    lift = F.round(
        (F.col("n_ab").cast("double") / F.col("n_orders"))
        / (
            (F.col("supp_a").cast("double") / F.col("n_orders"))
            * (F.col("supp_b").cast("double") / F.col("n_orders"))
        ),
        6,
    )
    scored = (
        pair_supp.join(sa, "part_a")
        .join(sb, "part_b")
        .crossJoin(F.broadcast(n))
        .select("part_a", "part_b", "n_ab", lift.alias("lift"))
    )
    top = scored.orderBy(
        F.col("lift").desc(), "part_a", "part_b"
    ).limit(20)
    w = Window.orderBy(F.col("lift").desc(), "part_a", "part_b")
    return top.withColumn(
        "rnk", F.row_number().over(w).cast("long")
    ).select("part_a", "part_b", "n_ab", "lift", "rnk")


@register(
    "event_path_topk",
    oracle="""
WITH seq AS (
  SELECT user_id, event_type,
         lead(event_type, 1) OVER w AS t2,
         lead(event_type, 2) OVER w AS t3
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
),
paths AS (
  SELECT event_type || ' > ' || t2 || ' > ' || t3 AS path,
         count(*) AS n_paths,
         count(DISTINCT user_id) AS n_users
  FROM seq WHERE t3 IS NOT NULL
  GROUP BY 1
)
SELECT path, n_paths, n_users, rnk FROM (
  SELECT *, row_number() OVER (ORDER BY n_paths DESC, path) AS rnk
  FROM paths
) WHERE rnk <= 20
""",
    tags=("behavior", "paths", "topk"),
)
def event_path_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 three-step user journeys ('view > click > purchase')
    by occurrence count — the path-analysis extension of
    event_transitions' first-order matrix (second-order structure:
    which PAIRS of steps lead where).

    Scale shape: two lead() windows ride ONE shuffle on user_id
    (same partition spec); path counting is a partial-agg groupBy on
    a key space bounded by |event_type|³ (~216), and the final
    ranking window runs over those ≤216 aggregate rows, never raw
    events.  The rank tiebreak is the path string so top-20 edges
    cannot flip between engines.
    """
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.expr("ts_ns div 1000"), "event_id"
    )
    seq = ev.select(
        "user_id",
        "event_type",
        F.lead("event_type", 1).over(w).alias("t2"),
        F.lead("event_type", 2).over(w).alias("t3"),
    ).filter(F.col("t3").isNotNull())
    paths = seq.groupBy(
        F.concat_ws(" > ", "event_type", "t2", "t3").alias("path")
    ).agg(
        F.count(F.lit(1)).alias("n_paths"),
        F.countDistinct("user_id").alias("n_users"),
    )
    wr = Window.orderBy(F.col("n_paths").desc(), "path")
    return (
        paths.withColumn("rnk", F.row_number().over(wr).cast("long"))
        .filter(F.col("rnk") <= 20)
        .select("path", "n_paths", "n_users", "rnk")
    )


@register(
    "attribution_models",
    oracle="""
WITH p AS (
  SELECT event_id, user_id, epoch_us(ts) AS p_us FROM events
  WHERE event_type = 'purchase'
),
c AS (
  SELECT user_id, epoch_us(ts) AS c_us FROM events
  WHERE event_type = 'click'
),
pc AS (
  SELECT p.event_id, p.user_id, p.p_us, c.c_us
  FROM p JOIN c ON p.user_id = c.user_id AND c.c_us <= p.p_us
)
SELECT event_id, user_id,
       min(c_us) AS first_touch_us,
       max(c_us) AS last_touch_us,
       count(*) AS n_touches,
       CAST(round(CAST(1.0 AS DECIMAL(18,9))
             / count(*), 6) AS DOUBLE) AS linear_credit
FROM pc GROUP BY event_id, user_id, p_us
""",
    tags=("behavior", "attribution"),
)
def attribution_models(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three marketing-attribution models in one pass: for each
    purchase, the first-touch click, the last-touch click, and the
    per-touch linear credit (1/n over all preceding clicks by the
    same user).  The multi-model generalization of
    stream_join_attribution's single-window last-touch.

    Scale shape: one hash equi-join on user_id with the time
    predicate as residual (clicks-per-user bounded), one grouped
    aggregate — min/max/count are all partial-agg friendly, so the
    join output never re-shuffles more than once.  Credit division
    is exact DECIMAL then rounded.
    """
    ev = load_table(spark, sf_dir, "events").withColumn(
        "ts_us", F.expr("ts_ns div 1000")
    )
    p = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", F.col("ts_us").alias("p_us")
    )
    c = ev.filter(F.col("event_type") == "click").select(
        "user_id", F.col("ts_us").alias("c_us")
    )
    pc = p.join(c, "user_id").filter(F.col("c_us") <= F.col("p_us"))
    return pc.groupBy("event_id", "user_id", "p_us").agg(
        F.min("c_us").alias("first_touch_us"),
        F.max("c_us").alias("last_touch_us"),
        F.count(F.lit(1)).alias("n_touches"),
        F.round(
            F.lit(1.0).cast("decimal(18,9)") / F.count(F.lit(1)), 6
        )
        .cast("double")
        .alias("linear_credit"),
    ).drop("p_us")


# (T - 1 day, T] activity windows for the two state snapshots, as
# integer epoch-microsecond bounds so both engines compare the SAME
# value the canonical ts carries (ts_ns div 1000) with no timestamp-
# literal truncation hazards at the nanos boundary.
_SNAP_T1_LO_US = 1_705_622_400_000_000  # 2024-01-19 00:00:00 UTC
_SNAP_T1_HI_US = 1_705_708_800_000_000  # 2024-01-20 00:00:00 UTC
_SNAP_T2_LO_US = 1_706_486_400_000_000  # 2024-01-29 00:00:00 UTC
_SNAP_T2_HI_US = 1_706_572_800_000_000  # 2024-01-30 00:00:00 UTC


def _snap_sql(lo: int, hi: int) -> str:
    return f"""
  SELECT user_id, event_id, value FROM (
    SELECT user_id, event_id, value,
           row_number() OVER (PARTITION BY user_id
                              ORDER BY epoch_us(ts) DESC, event_id DESC)
             AS rn
    FROM events
    WHERE epoch_us(ts) > {lo} AND epoch_us(ts) <= {hi}
  ) WHERE rn = 1"""


@register(
    "snapshot_state_diff",
    oracle=f"""
WITH s1 AS ({_snap_sql(_SNAP_T1_LO_US, _SNAP_T1_HI_US)}),
s2 AS ({_snap_sql(_SNAP_T2_LO_US, _SNAP_T2_HI_US)})
SELECT coalesce(s1.user_id, s2.user_id) AS user_id,
       CASE WHEN s1.user_id IS NULL THEN 'added'
            WHEN s2.user_id IS NULL THEN 'removed'
            WHEN s1.event_id <> s2.event_id THEN 'changed'
            ELSE 'unchanged' END AS status,
       s1.event_id AS old_event_id, s2.event_id AS new_event_id,
       s1.value AS old_value, s2.value AS new_value
FROM s1 FULL OUTER JOIN s2 ON s1.user_id = s2.user_id
""",
    tags=("C3", "cdc", "versioning"),
)
def snapshot_state_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dataset-version diff between two point-in-time state snapshots
    — the audit a pipeline runs between table versions ("what changed
    since the last publish?").  A snapshot at T is the per-user
    latest (event_id, value) among events in the (T - 1 day, T]
    activity window; the diff is one full-outer join on the entity
    key classifying each user as added / removed / changed /
    unchanged.

    Reference capability analog: version tracking per SDFS write
    (sdfs.hpp stores per-key version counters; SURVEY.md §2.A18) —
    this is the same "what moved between versions" question asked
    relationally over a whole table.

    At 100 TB: each snapshot is one predicate-pruned scan (the
    activity window prunes partitions when the table is date-
    partitioned, as events tables are) plus a keep-latest window on
    the natural key — the cdc_latest_per_key shape — and the diff
    joins two user-cardinality frames on their shared key, so the
    expensive inputs never leave their key partitioning.  Snapshot
    states would normally be the already-materialized output of the
    CDC compaction, making the diff itself dimension-cheap."""
    ev = load_table(spark, sf_dir, "events").withColumn(
        "ts_us", F.expr("ts_ns div 1000")
    )

    def snap(lo: int, hi: int, pfx: str) -> DataFrame:
        w = Window.partitionBy("user_id").orderBy(
            F.col("ts_us").desc(), F.col("event_id").desc()
        )
        return (
            ev.filter((F.col("ts_us") > lo) & (F.col("ts_us") <= hi))
            .withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select(
                "user_id",
                F.col("event_id").alias(f"{pfx}_event_id"),
                F.col("value").alias(f"{pfx}_value"),
            )
        )

    s1 = snap(_SNAP_T1_LO_US, _SNAP_T1_HI_US, "old")
    s2 = snap(_SNAP_T2_LO_US, _SNAP_T2_HI_US, "new")
    j = s1.withColumnRenamed("user_id", "u1").join(
        s2.withColumnRenamed("user_id", "u2"),
        F.col("u1") == F.col("u2"),
        "full_outer",
    )
    status = (
        F.when(F.col("u1").isNull(), "added")
        .when(F.col("u2").isNull(), "removed")
        .when(F.col("old_event_id") != F.col("new_event_id"), "changed")
        .otherwise("unchanged")
    )
    return j.select(
        F.coalesce("u1", "u2").alias("user_id"),
        status.alias("status"),
        "old_event_id",
        "new_event_id",
        "old_value",
        "new_value",
    )


@register(
    "gaps_islands_streaks",
    oracle="""
WITH ad AS (
  SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS day
  FROM events
),
r AS (
  SELECT user_id, day,
         day - row_number() OVER (PARTITION BY user_id ORDER BY day)
           AS grp
  FROM ad
)
SELECT user_id,
       CAST(min(day) AS BIGINT) AS start_day,
       CAST(max(day) AS BIGINT) AS end_day,
       count(*) AS streak_days
FROM r GROUP BY user_id, grp
""",
    tags=("C5", "behavior", "gaps-islands"),
)
def gaps_islands_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands: each user's runs of CONSECUTIVE active days
    (one row per streak with its start, end, and length), via the
    classic day-minus-row_number island key — consecutive days share
    a constant difference, so the island id falls out of one window
    and one group-by with NO self-join or iteration.  The engagement-
    streak / uptime-run shape; sessionize_events is its
    timestamp-gap sibling.

    Day index is integer epoch-microseconds div 86400e6 — pure
    integer arithmetic, identical in both engines (no timezone or
    date-cast hazards at the nanos boundary).

    At 100 TB: distinct-day dedup, the row_number window, and the
    island group-by all partition by user_id — AQE coalesces them
    onto ONE hash exchange of the (user, day) pairs (already
    activity-compressed: one row per user-day, not per event)."""
    ev = load_table(spark, sf_dir, "events")
    ad = ev.select(
        "user_id", F.expr("ts_ns div 1000 div 86400000000").alias("day")
    ).distinct()
    w = Window.partitionBy("user_id").orderBy("day")
    r = ad.withColumn("grp", F.col("day") - F.row_number().over(w))
    return (
        r.groupBy("user_id", "grp")
        .agg(
            F.min("day").cast("long").alias("start_day"),
            F.max("day").cast("long").alias("end_day"),
            F.count(F.lit(1)).alias("streak_days"),
        )
        .drop("grp")
    )


@register(
    "user_feature_matrix",
    oracle="""
WITH e AS (
  SELECT user_id, event_type, value,
         epoch_us(ts) AS ts_us,
         epoch_us(ts) // 86400000000 AS day
  FROM events
),
g AS (
  SELECT user_id, ts_us,
         CASE WHEN ts_us - lag(ts_us) OVER (PARTITION BY user_id
                                            ORDER BY ts_us)
                   > 1800000000 OR
                   lag(ts_us) OVER (PARTITION BY user_id
                                    ORDER BY ts_us) IS NULL
              THEN 1 ELSE 0 END AS new_sess
  FROM e
),
sess AS (
  SELECT user_id, CAST(SUM(new_sess) AS BIGINT) AS n_sessions
  FROM g GROUP BY user_id
),
mx AS (SELECT max(day) AS maxd FROM e),
f AS (
  SELECT user_id,
         count(*) AS n_events,
         count(DISTINCT day) AS n_active_days,
         count(DISTINCT event_type) AS n_types,
         CAST(round(SUM(CAST(value AS DECIMAL(18,4))), 2) AS DOUBLE)
           AS total_value,
         CAST(round(CAST(CAST(SUM(CAST(value AS DECIMAL(18,4)))
                              AS DOUBLE) / count(*)
                    AS DECIMAL(28,12)), 6) AS DOUBLE) AS mean_value,
         max(day) AS lastd
  FROM e GROUP BY user_id
)
SELECT f.user_id, f.n_events, f.n_active_days, f.n_types,
       f.total_value, f.mean_value,
       CAST(mx.maxd - f.lastd AS BIGINT) AS recency_days,
       s.n_sessions
FROM f JOIN sess s ON f.user_id = s.user_id CROSS JOIN mx
""",
    tags=("C4", "ml-features", "behavior"),
)
def user_feature_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user ML feature assembly in one pass over the event log:
    activity volume, active-day and type cardinalities, exact-decimal
    monetary totals/means, recency vs the corpus horizon, and
    session count (30-minute-gap sessionization) — the feature matrix
    a churn/propensity model trains on, produced by the engine
    instead of a separate feature store.

    At 100 TB: ONE hash exchange on user_id serves both the
    sessionization window and every aggregate (AQE reuses the
    partitioning); the corpus-horizon max is a 1-row broadcast.
    Decimal sums keep the monetary features partition-order-exact."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        "value",
        F.expr("ts_ns div 1000").alias("ts_us"),
        F.expr("ts_ns div 1000 div 86400000000").alias("day"),
    )
    wlag = Window.partitionBy("user_id").orderBy("ts_us")
    new_sess = F.when(
        F.lag("ts_us").over(wlag).isNull()
        | (F.col("ts_us") - F.lag("ts_us").over(wlag) > 1_800_000_000),
        1,
    ).otherwise(0)
    sess = (
        ev.select("user_id", new_sess.alias("new_sess"))
        .groupBy("user_id")
        .agg(F.sum("new_sess").cast("long").alias("n_sessions"))
    )
    dec = F.col("value").cast("decimal(18,4)")
    f = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("day").alias("n_active_days"),
        F.countDistinct("event_type").alias("n_types"),
        F.round(F.sum(dec), 2).cast("double").alias("total_value"),
        F.round(
            (F.sum(dec).cast("double") / F.count(F.lit(1))).cast(
                "decimal(28,12)"
            ),
            6,
        )
        .cast("double")
        .alias("mean_value"),
        F.max("day").alias("lastd"),
    )
    mx = ev.agg(F.max("day").alias("maxd"))
    return (
        f.join(sess, "user_id")
        .crossJoin(F.broadcast(mx))
        .select(
            "user_id",
            "n_events",
            "n_active_days",
            "n_types",
            "total_value",
            "mean_value",
            (F.col("maxd") - F.col("lastd")).cast("long").alias(
                "recency_days"
            ),
            "n_sessions",
        )
    )


_MK_ITER_SQL = """
{out} AS (
  SELECT g.removed, g.node,
         CASE WHEN g.node = 'purchase' THEN 1.0
              WHEN g.node = g.removed THEN 0.0
              ELSE round(coalesce(s.sum_c, 0), 10) END AS p
  FROM grid g LEFT JOIN (
    SELECT {prev}.removed, e.src AS node,
           CAST(sum(CAST(round({prev}.p * e.w / o.ow, 12)
                         AS DECIMAL(28,12))) AS DOUBLE) AS sum_c
    FROM edges e
    JOIN outw o ON o.src = e.src
    JOIN {prev} ON {prev}.node = e.dst
    GROUP BY {prev}.removed, e.src
  ) s ON s.removed = g.removed AND s.node = g.node
)"""

_MK_CHAIN = ",".join(
    _MK_ITER_SQL.format(out=f"it{i+1}", prev=f"it{i}" if i else "p0")
    for i in range(6)
)


@register(
    "attribution_markov_removal",
    oracle=f"""
WITH seq AS (
  SELECT user_id, event_type,
         lead(event_type) OVER (PARTITION BY user_id
                                ORDER BY epoch_us(ts), event_id)
           AS next_type,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY epoch_us(ts), event_id) AS rn
  FROM events
),
edges AS (
  SELECT event_type AS src, next_type AS dst, count(*) AS w
  FROM seq WHERE next_type IS NOT NULL GROUP BY 1, 2
),
outw AS (SELECT src, sum(w) AS ow FROM edges GROUP BY src),
states AS (SELECT DISTINCT event_type AS node FROM events),
rem AS (
  SELECT node AS removed FROM states WHERE node <> 'purchase'
  UNION ALL SELECT '(none)'
),
grid AS (SELECT r.removed, s.node FROM rem r CROSS JOIN states s),
sd AS (
  SELECT event_type AS node, count(*) AS cnt
  FROM seq WHERE rn = 1 GROUP BY 1
),
tots AS (SELECT CAST(SUM(cnt) AS BIGINT) AS total FROM sd),
p0 AS (
  SELECT removed, node,
         CASE WHEN node = 'purchase' THEN 1.0 ELSE 0.0 END AS p
  FROM grid
),
{_MK_CHAIN},
conv AS (
  SELECT i.removed,
         CAST(SUM(CAST(round(sd.cnt * i.p, 12) AS DECIMAL(28,12)))
              AS DOUBLE) / CAST(t.total AS DOUBLE) AS pc
  FROM it6 i JOIN sd ON sd.node = i.node CROSS JOIN tots t
  GROUP BY i.removed, t.total
),
base AS (SELECT pc AS bc FROM conv WHERE removed = '(none)'),
eff AS (
  SELECT c.removed AS channel,
         CAST(round(CAST(c.pc AS DECIMAL(18,12)), 6) AS DOUBLE)
           AS conv_without,
         CAST(round(CAST(b.bc AS DECIMAL(18,12)), 6) AS DOUBLE)
           AS base_conv,
         round(CAST((b.bc - c.pc) / b.bc AS DECIMAL(18,12)), 6) AS eff6
  FROM conv c CROSS JOIN base b WHERE c.removed <> '(none)'
),
sumeff AS (SELECT SUM(CAST(eff6 AS DECIMAL(28,12))) AS se FROM eff)
SELECT channel, conv_without, base_conv,
       CAST(eff6 AS DOUBLE) AS removal_effect,
       CAST(round(CAST(CAST(eff6 AS DOUBLE) / CAST(se AS DOUBLE)
                  AS DECIMAL(18,12)), 6) AS DOUBLE) AS credit
FROM eff CROSS JOIN sumeff
""",
    tags=("graph", "iterative", "attribution"),
)
def attribution_markov_removal(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Markov removal-effect attribution (the data-driven model that
    replaces first/last-touch heuristics): build the event-type
    transition chain with 'purchase' absorbing, estimate each
    journey's 6-step conversion probability by power iteration, and
    credit each channel by how much conversion DROPS when the channel
    is removed (entering it becomes a dead end).  removal_effect_c =
    (P_base - P_without_c) / P_base; credit normalizes effects.

    Cross-engine exactness uses the pagerank_transitions idiom:
    per-edge contributions are rounded to 12 while DOUBLE, summed
    EXACTLY in DECIMAL, and each iteration's state is re-rounded to
    10 — float summation order cannot differ, so all 6 iterations
    match the oracle bit-for-bit.

    At 100 TB: the chain is |event_types|-bounded — the only
    corpus-scale work is the per-user lead() window building edge
    counts and start states; the (removed x node) working set the
    iterations touch is ~|types|^2 rows, and the driver holds NO
    state at all (unlike kmeans' k x d literals, the loop is pure
    DataFrame joins)."""
    ev = load_table(spark, sf_dir, "events")
    w_seq = Window.partitionBy("user_id").orderBy(
        F.expr("ts_ns div 1000"), "event_id"
    )
    seq = ev.select(
        "user_id",
        "event_type",
        F.lead("event_type").over(w_seq).alias("next_type"),
        F.row_number().over(w_seq).alias("rn"),
    )
    edges = (
        seq.filter(F.col("next_type").isNotNull())
        .groupBy(
            F.col("event_type").alias("src"),
            F.col("next_type").alias("dst"),
        )
        .agg(F.count(F.lit(1)).alias("w"))
        .localCheckpoint()
    )
    outw = edges.groupBy("src").agg(F.sum("w").alias("ow"))
    states = ev.select(F.col("event_type").alias("node")).distinct()
    rem = states.filter(F.col("node") != "purchase").select(
        F.col("node").alias("removed")
    ).union(spark.createDataFrame([("(none)",)], "removed string"))
    grid = rem.crossJoin(states).localCheckpoint()
    sd = (
        seq.filter(F.col("rn") == 1)
        .groupBy(F.col("event_type").alias("node"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    p = grid.withColumn(
        "p",
        F.when(F.col("node") == "purchase", F.lit(1.0)).otherwise(
            F.lit(0.0)
        ),
    )
    for _ in range(6):
        contrib = (
            edges.join(outw, "src")
            .join(
                p.select(
                    "removed", F.col("node").alias("dst"), "p"
                ),
                "dst",
            )
            .select(
                "removed",
                F.col("src").alias("node"),
                F.round(F.col("p") * F.col("w") / F.col("ow"), 12)
                .cast("decimal(28,12)")
                .alias("c"),
            )
        )
        sums = contrib.groupBy("removed", "node").agg(
            F.sum("c").cast("double").alias("sum_c")
        )
        p = grid.join(sums, ["removed", "node"], "left").select(
            "removed",
            "node",
            F.when(F.col("node") == "purchase", F.lit(1.0))
            .when(F.col("node") == F.col("removed"), F.lit(0.0))
            .otherwise(
                F.round(F.coalesce(F.col("sum_c"), F.lit(0.0)), 10)
            )
            .alias("p"),
        )
    tots = sd.agg(F.sum("cnt").cast("long").alias("total"))
    conv = (
        p.join(sd, "node")
        .crossJoin(F.broadcast(tots))
        .select(
            "removed",
            "total",
            F.round(F.col("cnt") * F.col("p"), 12)
            .cast("decimal(28,12)")
            .alias("c"),
        )
        .groupBy("removed", "total")
        .agg(
            (
                F.sum("c").cast("double") / F.col("total").cast("double")
            ).alias("pc")
        )
        .select("removed", "pc")
    )
    base = conv.filter(F.col("removed") == "(none)").select(
        F.col("pc").alias("bc")
    )
    eff = (
        conv.filter(F.col("removed") != "(none)")
        .crossJoin(F.broadcast(base))
        .select(
            F.col("removed").alias("channel"),
            F.round(F.col("pc").cast("decimal(18,12)"), 6)
            .cast("double")
            .alias("conv_without"),
            F.round(F.col("bc").cast("decimal(18,12)"), 6)
            .cast("double")
            .alias("base_conv"),
            F.round(
                ((F.col("bc") - F.col("pc")) / F.col("bc")).cast(
                    "decimal(18,12)"
                ),
                6,
            ).alias("eff6"),
        )
    )
    sumeff = eff.agg(
        F.sum(F.col("eff6").cast("decimal(28,12)")).alias("se")
    )
    return eff.crossJoin(F.broadcast(sumeff)).select(
        "channel",
        "conv_without",
        "base_conv",
        F.col("eff6").cast("double").alias("removal_effect"),
        F.round(
            (F.col("eff6").cast("double") / F.col("se").cast("double")).cast(
                "decimal(18,12)"
            ),
            6,
        )
        .cast("double")
        .alias("credit"),
    )


@register(
    "cep_view_to_purchase",
    oracle="""
WITH e AS (
  SELECT user_id, event_type, epoch_us(ts) AS ts_us
  FROM events WHERE event_type IN ('view', 'purchase')
),
w AS (
  SELECT user_id, event_type, ts_us,
         max(CASE WHEN event_type = 'view' THEN ts_us END)
           OVER (PARTITION BY user_id ORDER BY ts_us
                 RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
           AS last_view_us
  FROM e
)
SELECT user_id,
       count(*) AS n_purchases,
       CAST(count(CASE WHEN last_view_us IS NOT NULL THEN 1 END)
            AS BIGINT) AS n_converting,
       CAST(round(CAST(
         CAST(count(CASE WHEN last_view_us IS NOT NULL THEN 1 END)
              AS DOUBLE) / CAST(count(*) AS DOUBLE)
         AS DECIMAL(18,12)), 6) AS DOUBLE) AS convert_rate
FROM w WHERE event_type = 'purchase'
GROUP BY user_id
""",
    tags=("C5", "behavior", "cep"),
)
def cep_view_to_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Complex-event-processing pattern: purchases PRECEDED BY a view
    within one hour by the same user (the MATCH_RECOGNIZE
    'A then B within T' shape), counted per user with the conversion
    rate.  Expressed as ONE range-frame window — the last view
    timestamp inside the trailing hour rides a conditional max, so
    no self-join or per-pattern scan exists.

    At 100 TB: the type filter prunes the scan to the two pattern
    alphabets; one user-keyed exchange serves the window and the
    per-user rollup.  Longer patterns compose by chaining
    conditional window maxes (one per step), still on the same
    exchange."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("view", "purchase")
    )
    e = ev.select(
        "user_id", "event_type", F.expr("ts_ns div 1000").alias("ts_us")
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_us")
        .rangeBetween(-3_600_000_000, 0)
    )
    last_view = F.max(
        F.when(F.col("event_type") == "view", F.col("ts_us"))
    ).over(w)
    p = e.withColumn("last_view_us", last_view).filter(
        F.col("event_type") == "purchase"
    )
    n_conv = F.count(F.when(F.col("last_view_us").isNotNull(), 1))
    return p.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_purchases"),
        n_conv.cast("long").alias("n_converting"),
        F.round(
            (n_conv.cast("double") / F.count(F.lit(1)).cast("double")).cast(
                "decimal(18,12)"
            ),
            6,
        )
        .cast("double")
        .alias("convert_rate"),
    )


@register(
    "cep_latency_percentiles",
    oracle="""
WITH e AS (
  SELECT user_id, event_type, epoch_us(ts) AS ts_us
  FROM events WHERE event_type IN ('view', 'purchase')
),
w AS (
  SELECT user_id, event_type, ts_us,
         max(CASE WHEN event_type = 'view' THEN ts_us END)
           OVER (PARTITION BY user_id ORDER BY ts_us
                 RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
           AS last_view_us
  FROM e
),
lat AS (
  SELECT (ts_us - last_view_us) // 1000 AS latency_ms
  FROM w
  WHERE event_type = 'purchase' AND last_view_us IS NOT NULL
)
SELECT count(*) AS n_conversions,
       quantile_cont(latency_ms, 0.50) AS p50_ms,
       quantile_cont(latency_ms, 0.90) AS p90_ms,
       quantile_cont(latency_ms, 0.99) AS p99_ms,
       CAST(max(latency_ms) AS BIGINT) AS max_ms
FROM lat
""",
    tags=("C5", "behavior", "cep", "latency"),
)
def cep_latency_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-to-convert distribution for the view→purchase pattern:
    exact interpolated p50/p90/p99 of the view-to-purchase latency
    (milliseconds, integer) over all converting purchases — the SLA
    report on top of cep_view_to_purchase's match stream.  Latencies
    are integer microsecond differences; Spark's percentile and
    DuckDB's quantile_cont share the interpolation definition
    (agg_percentiles precedent) so no rounding is needed.

    At 100 TB: same one-exchange pattern window; the percentile is a
    single global aggregate over the (already tiny) match stream —
    production would swap approx_percentile to avoid the exact
    form's per-group sort."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("view", "purchase")
    )
    e = ev.select(
        "user_id", "event_type", F.expr("ts_ns div 1000").alias("ts_us")
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_us")
        .rangeBetween(-3_600_000_000, 0)
    )
    last_view = F.max(
        F.when(F.col("event_type") == "view", F.col("ts_us"))
    ).over(w)
    lat = (
        e.withColumn("last_view_us", last_view)
        .filter(
            (F.col("event_type") == "purchase")
            & F.col("last_view_us").isNotNull()
        )
        .select(
            F.expr("(ts_us - last_view_us) div 1000").alias("latency_ms")
        )
    )
    return lat.agg(
        F.count(F.lit(1)).alias("n_conversions"),
        F.percentile("latency_ms", F.lit(0.50)).alias("p50_ms"),
        F.percentile("latency_ms", F.lit(0.90)).alias("p90_ms"),
        F.percentile("latency_ms", F.lit(0.99)).alias("p99_ms"),
        F.max("latency_ms").cast("long").alias("max_ms"),
    )


@register(
    "gdpr_erasure_audit",
    oracle="""
WITH del AS (
  SELECT DISTINCT user_id FROM events WHERE user_id % 29 = 0
),
a AS (
  SELECT e.event_type,
         count(*) AS n_before,
         CAST(count(CASE WHEN d.user_id IS NULL THEN 1 END) AS BIGINT)
           AS n_after
  FROM events e LEFT JOIN del d ON e.user_id = d.user_id
  GROUP BY e.event_type
)
SELECT event_type, n_before, n_after,
       n_before - n_after AS n_erased,
       CAST((SELECT count(*) FROM del) AS BIGINT) AS n_subjects
FROM a
""",
    tags=("C3", "governance", "privacy"),
)
def gdpr_erasure_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right-to-erasure audit: given a deletion-subject list (here a
    deterministic stand-in: user_id % 29 = 0), the per-stream
    before/after/erased row counts the erasure job must publish as
    its compliance evidence — run BEFORE the destructive rewrite so
    the audit is committed even if the rewrite restarts.

    At 100 TB: the subject list broadcasts (deletion lists are tiny
    vs the corpus) and the audit is one scan with a broadcast-anti
    flag folded into the aggregate; the rewrite itself is the same
    anti-join shape writing with dynamic partition overwrite
    (test_sources pins those semantics)."""
    ev = load_table(spark, sf_dir, "events")
    del_ = (
        ev.filter(F.col("user_id") % 29 == 0)
        .select("user_id")
        .distinct()
    )
    n_subjects = del_.count()  # bounded driver scalar (audit metadata)
    flagged = ev.join(
        F.broadcast(del_.withColumn("is_del", F.lit(1))), "user_id", "left"
    )
    return flagged.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_before"),
        F.count(F.when(F.col("is_del").isNull(), 1))
        .cast("long")
        .alias("n_after"),
        (
            F.count(F.lit(1))
            - F.count(F.when(F.col("is_del").isNull(), 1))
        ).alias("n_erased"),
        F.lit(n_subjects).cast("long").alias("n_subjects"),
    )


@register(
    "conversion_wilson_ci",
    oracle="""
WITH u AS (
  SELECT user_id,
         max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
           AS converted,
         min(epoch_us(ts)) AS first_us
  FROM events GROUP BY user_id
),
g AS (
  SELECT CASE WHEN user_id % 2 = 0 THEN 'A' ELSE 'B' END AS variant,
         converted
  FROM u
),
s AS (
  SELECT variant,
         count(*) AS n,
         CAST(SUM(converted) AS BIGINT) AS conv
  FROM g GROUP BY variant
)
SELECT variant, n, conv,
       CAST(round(CAST(CAST(conv AS DOUBLE) / CAST(n AS DOUBLE)
                  AS DECIMAL(18,12)), 6) AS DOUBLE) AS rate,
       CAST(round(CAST(
         ((CAST(conv AS DOUBLE) / CAST(n AS DOUBLE))
          + 1.9208 / CAST(n AS DOUBLE)
          - 1.96 * sqrt(((CAST(conv AS DOUBLE) / CAST(n AS DOUBLE))
                         * (1.0 - CAST(conv AS DOUBLE)
                                  / CAST(n AS DOUBLE))
                         + 0.9604 / CAST(n AS DOUBLE))
                        / CAST(n AS DOUBLE)))
         / (1.0 + 3.8416 / CAST(n AS DOUBLE))
         AS DECIMAL(18,12)), 6) AS DOUBLE) AS wilson_lo,
       CAST(round(CAST(
         ((CAST(conv AS DOUBLE) / CAST(n AS DOUBLE))
          + 1.9208 / CAST(n AS DOUBLE)
          + 1.96 * sqrt(((CAST(conv AS DOUBLE) / CAST(n AS DOUBLE))
                         * (1.0 - CAST(conv AS DOUBLE)
                                  / CAST(n AS DOUBLE))
                         + 0.9604 / CAST(n AS DOUBLE))
                        / CAST(n AS DOUBLE)))
         / (1.0 + 3.8416 / CAST(n AS DOUBLE))
         AS DECIMAL(18,12)), 6) AS DOUBLE) AS wilson_hi
FROM s
""",
    tags=("C4", "experimentation", "statistics"),
)
def conversion_wilson_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A/B conversion rates with Wilson score intervals (z = 1.96):
    per deterministic variant split (user parity standing in for the
    experiment assignment), user-level conversion rate and the
    interval that stays valid at small n and extreme rates — the
    significance readout an experimentation pipeline publishes
    instead of raw rates.

    Parity: every input is an integer count; the Wilson formula is a
    fixed chain of double ops (sqrt is IEEE-correctly-rounded), so
    both engines compute bit-identical bounds before the one
    DECIMAL rounding.

    At 100 TB: one user-level aggregate (partial max/min map-side),
    one 2-row variant rollup — experiment readouts are counters, not
    scans."""
    ev = load_table(spark, sf_dir, "events")
    u = ev.groupBy("user_id").agg(
        F.max(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).alias("converted")
    )
    g = u.select(
        F.when(F.col("user_id") % 2 == 0, "A").otherwise("B").alias(
            "variant"
        ),
        "converted",
    )
    s = g.groupBy("variant").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("converted").cast("long").alias("conv"),
    )
    nd = F.col("n").cast("double")
    p = F.col("conv").cast("double") / nd
    half = F.lit(1.96) * F.sqrt(
        (p * (F.lit(1.0) - p) + F.lit(0.9604) / nd) / nd
    )
    denom = F.lit(1.0) + F.lit(3.8416) / nd
    center = p + F.lit(1.9208) / nd
    return s.select(
        "variant",
        "n",
        "conv",
        F.round(p.cast("decimal(18,12)"), 6).cast("double").alias("rate"),
        F.round(((center - half) / denom).cast("decimal(18,12)"), 6)
        .cast("double")
        .alias("wilson_lo"),
        F.round(((center + half) / denom).cast("decimal(18,12)"), 6)
        .cast("double")
        .alias("wilson_hi"),
    )


@register(
    "growth_accounting",
    oracle="""
WITH uw AS (
  SELECT DISTINCT user_id,
         epoch_us(ts) // 604800000000 AS wk
  FROM events
),
lagged AS (
  SELECT user_id, wk,
         lag(wk) OVER (PARTITION BY user_id ORDER BY wk) AS prev_wk,
         min(wk) OVER (PARTITION BY user_id) AS first_wk
  FROM uw
)
SELECT CAST(wk AS BIGINT) AS wk,
       count(*) AS n_active,
       CAST(count(CASE WHEN wk = first_wk THEN 1 END) AS BIGINT)
         AS n_new,
       CAST(count(CASE WHEN prev_wk = wk - 1 THEN 1 END) AS BIGINT)
         AS n_retained,
       CAST(count(CASE WHEN prev_wk IS NOT NULL AND prev_wk < wk - 1
                  THEN 1 END) AS BIGINT) AS n_resurrected
FROM lagged GROUP BY wk
""",
    tags=("C5", "behavior", "growth"),
)
def growth_accounting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly growth accounting: every active user classified as NEW
    (first-ever week), RETAINED (active the previous week), or
    RESURRECTED (returning after a gap) — the standard
    growth-decomposition report (churn falls out as last week's
    active minus this week's retained).  Integer epoch-week
    arithmetic throughout.

    At 100 TB: activity compresses to distinct (user, week) rows
    first; the lag/min windows and the weekly rollup ride the same
    user-keyed exchange — the gaps_islands_streaks shape at weekly
    grain."""
    ev = load_table(spark, sf_dir, "events")
    uw = ev.select(
        "user_id",
        F.expr("ts_ns div 1000 div 604800000000").alias("wk"),
    ).distinct()
    wlag = Window.partitionBy("user_id").orderBy("wk")
    wall = Window.partitionBy("user_id")
    lagged = uw.select(
        "user_id",
        "wk",
        F.lag("wk").over(wlag).alias("prev_wk"),
        F.min("wk").over(wall).alias("first_wk"),
    )
    return lagged.groupBy(F.col("wk").cast("long").alias("wk")).agg(
        F.count(F.lit(1)).alias("n_active"),
        F.count(F.when(F.col("wk") == F.col("first_wk"), 1))
        .cast("long")
        .alias("n_new"),
        F.count(F.when(F.col("prev_wk") == F.col("wk") - 1, 1))
        .cast("long")
        .alias("n_retained"),
        F.count(
            F.when(
                F.col("prev_wk").isNotNull()
                & (F.col("prev_wk") < F.col("wk") - 1),
                1,
            )
        )
        .cast("long")
        .alias("n_resurrected"),
    )


@register(
    "pareto_user_share",
    oracle="""
WITH u AS (
  SELECT user_id, count(*) AS n FROM events GROUP BY user_id
),
r AS (
  SELECT user_id, n,
         row_number() OVER (ORDER BY n DESC, user_id) AS rnk,
         count(*) OVER () AS n_users,
         SUM(n) OVER () AS total
  FROM u
),
g AS (
  SELECT CASE WHEN rnk * 10 <= n_users THEN 'top_10pct'
              WHEN rnk * 10 <= n_users * 2 THEN 'next_10pct'
              WHEN rnk * 2 <= n_users THEN 'next_30pct'
              ELSE 'bottom_50pct' END AS cohort,
         n, total
  FROM r
)
SELECT cohort,
       count(*) AS n_users,
       CAST(SUM(n) AS BIGINT) AS n_events,
       CAST(round(CAST(CAST(SUM(n) AS DOUBLE) / CAST(max(total) AS DOUBLE)
                  AS DECIMAL(18,12)), 6) AS DOUBLE) AS share
FROM g GROUP BY cohort
""",
    tags=("C4", "behavior", "concentration"),
)
def pareto_user_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Activity-concentration (Pareto/Lorenz) report: the share of
    all events produced by the top-10%, next-10%, next-30%, and
    bottom-50% of users by activity — the skew readout that predicts
    whether per-user partitioning will hot-spot (feeding
    join_skew_salted / agg_skew_twophase decisions).  Cohort cuts
    are ALL-integer rank thresholds (rank*10 <= n_users), so no
    percentile float exists.

    At 100 TB: the user activity table is one aggregate; the ranking
    window runs over |users| rows (already corpus-compressed) — for
    extreme user counts the rfm_segments broadcast-threshold
    alternative applies, as its docstring documents."""
    ev = load_table(spark, sf_dir, "events")
    u = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("n"))
    w = Window.orderBy(F.col("n").desc(), "user_id")
    wall = Window.partitionBy()
    r = u.select(
        "n",
        F.row_number().over(w).alias("rnk"),
        F.count(F.lit(1)).over(wall).alias("n_users"),
        F.sum("n").over(wall).alias("total"),
    )
    cohort = (
        F.when(F.col("rnk") * 10 <= F.col("n_users"), "top_10pct")
        .when(F.col("rnk") * 10 <= F.col("n_users") * 2, "next_10pct")
        .when(F.col("rnk") * 2 <= F.col("n_users"), "next_30pct")
        .otherwise("bottom_50pct")
    )
    return (
        r.select(cohort.alias("cohort"), "n", "total")
        .groupBy("cohort")
        .agg(
            F.count(F.lit(1)).alias("n_users"),
            F.sum("n").cast("long").alias("n_events"),
            F.round(
                (
                    F.sum("n").cast("double")
                    / F.max("total").cast("double")
                ).cast("decimal(18,12)"),
                6,
            )
            .cast("double")
            .alias("share"),
        )
    )


@register(
    "graph_triangle_count",
    oracle="""
WITH items AS (
  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
),
edges AS (
  SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
  FROM items a JOIN items b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
),
deg AS (
  SELECT p, count(*) AS d FROM (
    SELECT u AS p FROM edges UNION ALL SELECT v AS p FROM edges
  ) GROUP BY p
),
oriented AS (
  SELECT CASE WHEN (du.d < dv.d) OR (du.d = dv.d AND u < v)
              THEN u ELSE v END AS src,
         CASE WHEN (du.d < dv.d) OR (du.d = dv.d AND u < v)
              THEN v ELSE u END AS dst,
         CASE WHEN (du.d < dv.d) OR (du.d = dv.d AND u < v)
              THEN dv.d ELSE du.d END AS dst_d
  FROM edges
  JOIN deg du ON du.p = u
  JOIN deg dv ON dv.p = v
),
tri AS (
  SELECT w1.src AS x, w1.dst AS y, w2.dst AS z
  FROM oriented w1
  JOIN oriented w2 ON w1.src = w2.src
   AND ((w1.dst_d < w2.dst_d)
        OR (w1.dst_d = w2.dst_d AND w1.dst < w2.dst))
  JOIN oriented c ON c.src = w1.dst AND c.dst = w2.dst
),
node_tri AS (
  SELECT p, count(*) AS tri_count FROM (
    SELECT x AS p FROM tri
    UNION ALL SELECT y AS p FROM tri
    UNION ALL SELECT z AS p FROM tri
  ) GROUP BY p
)
SELECT part, tri_count, rnk FROM (
  SELECT p AS part, CAST(tri_count AS BIGINT) AS tri_count,
         row_number() OVER (ORDER BY tri_count DESC, p) AS rnk
  FROM node_tri
) WHERE rnk <= 20
""",
    tags=("C4", "graph", "triangles"),
)
def graph_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact triangle counting on the co-purchase graph (parts are
    nodes, an edge when two parts ever share an order), reported as
    the top-20 parts by triangle participation — the graph-motif
    operator behind clustering-coefficient / community-density
    curation signals, and the third graph rung after
    reachability_bfs (traversal) and pagerank_transitions
    (stationary mass).

    The scale design is the classic degree-ORIENTED wedge count
    (Suri & Vassilvitskii's MapReduce partition trick's successor;
    public textbook algorithm): every edge is directed from its
    lower-(degree, id) endpoint to the higher, which turns the
    triangle {x,y,z} into exactly ONE wedge (x->y, x->z) plus one
    closing-edge probe (y->z), and bounds every out-neighborhood by
    O(sqrt(|E|)) — wedge volume is sum(out_deg^2), not
    sum(deg^2), so the hub that would explode a naive wedge join
    (deg 10^6 -> 10^12 wedges) caps at |E| wedges.  All three hops
    are equi-joins on node keys (no cartesian anywhere,
    plan-asserted); degrees and the orientation predicate are pure
    integers, so both engines build bit-identical edge sets.

    At 100 TB: edge derivation is the basket_lift_pairs shape
    (within-order self-join, bounded by basket size squared); the
    wedge and closure joins shuffle on src/(dst,dst) node keys —
    co-partitioned by the same hash — and the top-20 is TakeOrdered,
    never a global sort.

    Reference analog: the reference ships no graph operators; this
    extends SURVEY §2.C's analytics families the way its MapleJuice
    word-count would need composed map+reduce rounds
    (mj_master.cpp job chaining) to express at all."""
    li = load_table(spark, sf_dir, "lineitem")
    items = li.select("l_orderkey", "l_partkey").distinct()
    a = items.select("l_orderkey", F.col("l_partkey").alias("u"))
    b = items.select("l_orderkey", F.col("l_partkey").alias("v"))
    edges = (
        a.join(b, "l_orderkey")
        .filter(F.col("u") < F.col("v"))
        .select("u", "v")
        .distinct()
    )
    deg = (
        edges.select(F.col("u").alias("p"))
        .unionAll(edges.select(F.col("v").alias("p")))
        .groupBy("p")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    du = deg.select(F.col("p").alias("u"), F.col("d").alias("du"))
    dv = deg.select(F.col("p").alias("v"), F.col("d").alias("dv"))
    fwd = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
    )
    oriented = (
        edges.join(du, "u")
        .join(dv, "v")
        .select(
            F.when(fwd, F.col("u")).otherwise(F.col("v")).alias("src"),
            F.when(fwd, F.col("v")).otherwise(F.col("u")).alias("dst"),
            F.when(fwd, F.col("dv")).otherwise(F.col("du")).alias(
                "dst_d"
            ),
        )
    )
    w1 = oriented.select(
        "src", F.col("dst").alias("y"), F.col("dst_d").alias("y_d")
    )
    w2 = oriented.select(
        "src", F.col("dst").alias("z"), F.col("dst_d").alias("z_d")
    )
    wedges = w1.join(w2, "src").filter(
        (F.col("y_d") < F.col("z_d"))
        | ((F.col("y_d") == F.col("z_d")) & (F.col("y") < F.col("z")))
    )
    closing = oriented.select(
        F.col("src").alias("y"), F.col("dst").alias("z")
    )
    tri = wedges.join(closing, ["y", "z"]).select(
        F.col("src").alias("x"), "y", "z"
    )
    node_tri = (
        tri.select(F.col("x").alias("p"))
        .unionAll(tri.select(F.col("y").alias("p")))
        .unionAll(tri.select(F.col("z").alias("p")))
        .groupBy("p")
        .agg(F.count(F.lit(1)).alias("tri_count"))
    )
    top = node_tri.orderBy(
        F.col("tri_count").desc(), "p"
    ).limit(20)
    w = Window.orderBy(F.col("tri_count").desc(), "p")
    return top.withColumn(
        "rnk", F.row_number().over(w).cast("long")
    ).select(
        F.col("p").alias("part"),
        F.col("tri_count").cast("long").alias("tri_count"),
        "rnk",
    )


@register(
    "event_sequence_pack",
    oracle="""
WITH e AS (
  SELECT user_id, event_id, epoch_us(ts) AS ts_us FROM events
),
r AS (
  SELECT user_id, ts_us,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts_us, event_id) - 1 AS seq_idx
  FROM e
)
SELECT user_id, seq_idx // 32 AS window_id,
       count(*) AS n_events,
       min(ts_us) AS start_us,
       max(ts_us) AS end_us,
       CAST(round(CAST(count(*) / 32.0 AS DECIMAL(18,12)), 6) AS DOUBLE)
         AS fill_rate
FROM r GROUP BY user_id, seq_idx // 32
""",
    tags=("behavior", "llm", "sequence"),
)
def event_sequence_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EVENT-SEQUENCE packing for sequence-model training: each
    user's time-ordered event stream is cut into fixed 32-event
    windows (the context length of a behavioral transformer), with
    per-window counts, time bounds, and fill rate — seq_packing's
    discipline applied to the events table, where the packing key is
    the USER and the order is event time, not an md5 shard.  The
    fill-rate tail (every user's last window) prices the padding an
    epoch wastes, exactly like packing_efficiency does for token
    packing.

    Scale shape: one window per user (single shuffle on user_id,
    the sessionize_events exchange), all-integer sequence indices and
    floor-div window ids, deterministic via the (ts, event_id)
    tiebreak; the aggregate is partial+final on (user, window)."""
    ev = load_table(spark, sf_dir, "events").withColumn(
        "ts_us", F.expr("ts_ns div 1000")
    )
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    r = ev.select(
        "user_id",
        "ts_us",
        (F.row_number().over(w) - 1).alias("seq_idx"),
    ).withColumn("window_id", F.expr("seq_idx div 32"))
    return r.groupBy("user_id", "window_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("ts_us").alias("start_us"),
        F.max("ts_us").alias("end_us"),
        F.round(
            (F.count(F.lit(1)) / F.lit(32.0)).cast("decimal(18,12)"), 6
        )
        .cast("double")
        .alias("fill_rate"),
    )
