"""Time-series operators over `events`: hierarchical rollups
(hourly → daily composed from the hourly pre-aggregate, the
hypertable/continuous-aggregate pattern) and gap filling with
last-observation-carried-forward.

Scale notes:
- The rollup identity (daily = regroup of hourly) is what makes
  materialized continuous aggregates valid: at 100 TB/day you
  maintain the hourly table incrementally (one streaming agg) and
  serve every coarser granularity from it — the raw-events scan
  happens once, not once per granularity. The oracle aggregates the
  RAW table directly, so the green check proves the composition is
  lossless (decimal sums are associative by construction).
- Gap fill generates the dense hour spine with `sequence()` per
  group (no driver loop) and LOCF is one `last(ignorenulls)` window
  — linear, one shuffle on the group key.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from distributed_system_spark.queries import register
from distributed_system_spark.queries._util import davg
from distributed_system_spark.sources.tables import load_table

_HOUR_US = 3_600_000_000
_DAY_US = 24 * _HOUR_US


def _hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The hourly pre-aggregate a continuous rollup would maintain."""
    ev = load_table(spark, sf_dir, "events")
    hour = (F.col("ts_us") - F.col("ts_us") % _HOUR_US).alias("hour_us")
    return (
        ev.withColumn("ts_us", F.expr("ts_ns div 1000"))
        .groupBy(hour, "event_type")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum(F.col("value").cast("decimal(18,4)")).alias("sum_dec"),
        )
    )


@register(
    "ts_rollup_daily_from_hourly",
    oracle=f"""
SELECT (epoch_us(ts) // {_DAY_US}) * {_DAY_US} AS day_us,
       event_type,
       count(*) AS cnt,
       CAST(round(SUM(CAST(value AS DECIMAL(18,4))), 2) AS DOUBLE)
         AS sum_value
FROM events
GROUP BY 1, 2
""",
    tags=("timeseries", "rollup"),
)
def ts_rollup_daily_from_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily rollup computed FROM the hourly pre-aggregate (never from
    raw events) — the continuous-aggregate serving path. Matching the
    raw-table oracle proves hourly → daily composition is lossless."""
    hourly = _hourly(spark, sf_dir)
    day = (F.col("hour_us") - F.col("hour_us") % _DAY_US).alias("day_us")
    return (
        hourly.groupBy(day, "event_type")
        .agg(
            F.sum("cnt").alias("cnt"),
            F.round(F.sum("sum_dec"), 2).cast("double").alias("sum_value"),
        )
    )


@register(
    "ts_gapfill_locf",
    oracle=f"""
WITH h AS (
  SELECT (epoch_us(ts) // {_HOUR_US}) * {_HOUR_US} AS hour_us,
         user_id, count(*) AS cnt
  FROM events WHERE user_id < 10 GROUP BY 1, 2
),
bounds AS (
  SELECT user_id, min(hour_us) AS lo, max(hour_us) AS hi
  FROM h GROUP BY user_id
),
spine AS (
  SELECT user_id, unnest(range(lo, hi + 1, {_HOUR_US})) AS hour_us
  FROM bounds
),
joined AS (
  SELECT s.user_id, s.hour_us, h.cnt
  FROM spine s LEFT JOIN h ON h.user_id = s.user_id
                          AND h.hour_us = s.hour_us
)
SELECT user_id, hour_us,
       coalesce(cnt, 0) AS cnt,
       last_value(cnt IGNORE NULLS) OVER (
         PARTITION BY user_id ORDER BY hour_us
         ROWS UNBOUNDED PRECEDING) AS locf_cnt
FROM joined
""",
    tags=("timeseries", "gapfill", "locf"),
)
def ts_gapfill_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap filling: generate every user's dense hour spine between
    their first and last event with `sequence()` (no driver loop),
    left-join the sparse hourly counts, and carry the last observation
    forward with one `last(ignorenulls)` window."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 10)
    hour = (F.col("ts_us") - F.col("ts_us") % _HOUR_US).alias("hour_us")
    h = (
        ev.withColumn("ts_us", F.expr("ts_ns div 1000"))
        .groupBy("user_id", hour)
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    spine = (
        h.groupBy("user_id")
        .agg(F.min("hour_us").alias("lo"), F.max("hour_us").alias("hi"))
        .select(
            "user_id",
            F.explode(
                F.sequence("lo", "hi", F.lit(_HOUR_US))
            ).alias("hour_us"),
        )
    )
    joined = spine.join(h, ["user_id", "hour_us"], "left")
    w = (
        Window.partitionBy("user_id")
        .orderBy("hour_us")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return joined.select(
        "user_id",
        "hour_us",
        F.coalesce("cnt", F.lit(0)).alias("cnt"),
        F.last("cnt", ignorenulls=True).over(w).alias("locf_cnt"),
    )


@register(
    "sample_deterministic",
    oracle="""
SELECT doc_id, lang
FROM documents
WHERE strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 1, 1))
      <= 3
""",
    tags=("sampling", "pipeline"),
)
def sample_deterministic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reproducible ~3/16 Bernoulli sample keyed on md5(doc_id) — the
    sampling every training-data pipeline needs to be rerunnable:
    membership depends only on the id, not on partitioning, executor
    count, or Spark's RNG (df.sample() is none of those things).
    Pushes down as a deterministic filter; no shuffle."""
    docs = load_table(spark, sf_dir, "documents")
    nibble = F.instr(
        F.lit("0123456789abcdef"),
        F.substring(F.md5(F.col("doc_id").cast("string").cast("binary")), 1, 1),
    )
    return docs.filter(nibble <= 3).select("doc_id", "lang")


@register(
    "sample_stratified_topn",
    oracle="""
SELECT lang, doc_id FROM (
  SELECT lang, doc_id,
         row_number() OVER (PARTITION BY lang
                            ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id)
           AS rn
  FROM documents
) WHERE rn <= 20
""",
    tags=("sampling", "stratified"),
)
def sample_stratified_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified deterministic sample: exactly 20 docs per language,
    chosen by md5 order (uniform, reproducible, engine-portable).
    At 100 TB prefer this over sampleBy(), whose per-partition RNG
    draws are not stable across cluster layouts.

    SKEW-SAFE (round-9): the rank rides ``_lang_bucket_rank`` —
    (lang, md5-prefix bucket) partitions plus broadcast prefix-sum
    offsets — so a language holding half the corpus spreads over 256
    tasks instead of one, and the identical global rank keeps the
    oracle unchanged."""
    from distributed_system_spark.queries.text_q import _lang_bucket_rank

    docs = load_table(spark, sf_dir, "documents")
    return (
        _lang_bucket_rank(docs.select("doc_id", "lang"))
        .filter(F.col("rn") <= 20)
        .select("lang", "doc_id")
    )


@register(
    "ts_similarity_topk",
    oracle="""
WITH hourly AS (
  SELECT user_id, date_trunc('hour', ts) AS hr,
         CAST(round(SUM(CAST(value AS DECIMAL(18,4))), 4) AS DOUBLE) AS s
  FROM events GROUP BY user_id, hr
), q AS (
  SELECT hr, s AS qs FROM hourly WHERE user_id = 0
), j AS (
  SELECT h.user_id, h.s, q.qs
  FROM hourly h JOIN q ON h.hr = q.hr
  WHERE h.user_id <> 0
), stats AS (
  SELECT user_id,
         count(*) AS n,
         CAST(SUM(CAST(s AS DECIMAL(28,8))) AS DOUBLE) AS sx,
         CAST(SUM(CAST(qs AS DECIMAL(28,8))) AS DOUBLE) AS sy,
         CAST(SUM(CAST(s * s AS DECIMAL(28,8))) AS DOUBLE) AS sxx,
         CAST(SUM(CAST(qs * qs AS DECIMAL(28,8))) AS DOUBLE) AS syy,
         CAST(SUM(CAST(s * qs AS DECIMAL(28,8))) AS DOUBLE) AS sxy
  FROM j GROUP BY user_id HAVING count(*) >= 6
)
SELECT user_id,
       round((n * sxy - sx * sy)
             / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)),
             6) AS corr,
       n AS n_hours
FROM stats
ORDER BY corr DESC, user_id
LIMIT 5
""",
    tags=("timeseries", "similarity", "corr"),
)
def ts_similarity_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series similarity search (the distributed pattern from the
    streaming-similarity literature): align every user's hourly value
    series with the query user's on the hour key, reduce each pair to
    the five Pearson sufficient statistics, rank by correlation.

    Scale shape: one groupBy builds the series, one broadcast-able
    join aligns on the query series (bounded: hours x 1 user), one
    groupBy reduces pairs — never a series cross join.  The sufficient
    statistics accumulate in exact DECIMAL (each hourly value is
    4-dp, so products are 8-dp exact), making the correlation — and
    therefore the oracle hash — engine-deterministic; a plain corr()
    aggregate sums doubles in partition order and is not."""
    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        "user_id", F.date_trunc("hour", "ts").alias("hr")
    ).agg(
        F.round(F.sum(F.col("value").cast("decimal(18,4)")), 4)
        .cast("double")
        .alias("s")
    )
    q = hourly.filter(F.col("user_id") == 0).select(
        F.col("hr").alias("qhr"), F.col("s").alias("qs")
    )
    j = hourly.filter(F.col("user_id") != 0).join(
        F.broadcast(q), F.col("hr") == F.col("qhr")
    )
    dec = "decimal(28,8)"
    stats = (
        j.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("s").cast(dec)).cast("double").alias("sx"),
            F.sum(F.col("qs").cast(dec)).cast("double").alias("sy"),
            F.sum((F.col("s") * F.col("s")).cast(dec))
            .cast("double")
            .alias("sxx"),
            F.sum((F.col("qs") * F.col("qs")).cast(dec))
            .cast("double")
            .alias("syy"),
            F.sum((F.col("s") * F.col("qs")).cast(dec))
            .cast("double")
            .alias("sxy"),
        )
        .filter(F.col("n") >= 6)
    )
    corr = F.round(
        (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy"))
        / (
            F.sqrt(F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
            * F.sqrt(F.col("n") * F.col("syy") - F.col("sy") * F.col("sy"))
        ),
        6,
    )
    return (
        stats.select("user_id", corr.alias("corr"), F.col("n").alias("n_hours"))
        .orderBy(F.col("corr").desc(), "user_id")
        .limit(5)
    )


@register(
    "ts_ohlc_bars",
    oracle="""
WITH e AS (
  SELECT event_type, value, epoch_us(ts) AS ts_us,
         (epoch_us(ts) // 3600000000) * 3600000000 AS hr_us,
         lpad(CAST(epoch_us(ts) AS VARCHAR), 20, '0')
           || lpad(CAST(event_id AS VARCHAR), 12, '0') AS okey
  FROM events
)
SELECT event_type, hr_us,
       round(arg_min(value, okey), 4) AS open,
       round(max(value), 4) AS high,
       round(min(value), 4) AS low,
       round(arg_max(value, okey), 4) AS close,
       count(*) AS n_ticks
FROM e
GROUP BY event_type, hr_us
""",
    tags=("timeseries", "ohlc"),
)
def ts_ohlc_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly OHLC bars per event type — the financial-rollup shape:
    open/close are arg-min/arg-max over a zero-padded (ts, event_id)
    string key (unique, so deterministic on tied timestamps — the
    composite-ordering trick when the engine's arg_min takes only a
    scalar), high/low/count are plain aggregates.  One grouped pass;
    bars re-aggregate to daily/weekly by the same shape
    (`ts_rollup_daily_from_hourly`)."""
    ev = load_table(spark, sf_dir, "events").withColumn(
        "ts_us", F.expr("ts_ns div 1000")
    )
    okey = F.concat(
        F.lpad(F.col("ts_us").cast("string"), 20, "0"),
        F.lpad(F.col("event_id").cast("string"), 12, "0"),
    )
    return (
        ev.select(
            "event_type",
            "value",
            (F.expr("ts_us div 3600000000") * 3_600_000_000).alias(
                "hr_us"
            ),
            okey.alias("okey"),
        )
        .groupBy("event_type", "hr_us")
        .agg(
            F.round(F.expr("min_by(value, okey)"), 4).alias("open"),
            F.round(F.max("value"), 4).alias("high"),
            F.round(F.min("value"), 4).alias("low"),
            F.round(F.expr("max_by(value, okey)"), 4).alias("close"),
            F.count(F.lit(1)).alias("n_ticks"),
        )
    )


@register(
    "ts_moving_average",
    oracle="""
WITH daily AS (
  SELECT date_trunc('day', o_orderdate) AS d, count(*) AS n,
         CAST(round(SUM(CAST(o_totalprice AS DECIMAL(18,4))), 2)
              AS DOUBLE) AS rev
  FROM orders GROUP BY d
)
SELECT d, n, rev,
       round(CAST(SUM(CAST(rev AS DECIMAL(28,4))) OVER w AS DOUBLE)
             / count(*) OVER w, 6) AS rev_ma7,
       CAST(count(*) OVER w AS BIGINT) AS n_days_in_window
FROM daily
WINDOW w AS (ORDER BY d ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
""",
    tags=("timeseries", "moving-average"),
)
def ts_moving_average(spark: SparkSession, sf_dir: str) -> DataFrame:
    """7-day trailing moving average over the daily revenue series —
    aggregate first (the series is |days| rows, tiny at any SF), then
    window over the *aggregate*, never over raw facts.  The window is
    unpartitioned by design: it runs on thousands of rows, not
    billions — the aggregate-then-window inversion is exactly what
    makes it scale."""
    orders = load_table(spark, sf_dir, "orders")
    daily = orders.groupBy(
        F.date_trunc("day", "o_orderdate").alias("d")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.round(
            F.sum(F.col("o_totalprice").cast("decimal(18,4)")), 2
        ).cast("double").alias("rev"),
    )
    w = Window.orderBy("d").rowsBetween(-6, 0)
    return daily.select(
        "d",
        "n",
        "rev",
        F.round(
            F.sum(F.col("rev").cast("decimal(28,4)")).over(w).cast("double")
            / F.count(F.lit(1)).over(w),
            6,
        ).alias("rev_ma7"),
        F.count(F.lit(1)).over(w).alias("n_days_in_window"),
    )


@register(
    "ts_anomaly_zscore",
    oracle="""
WITH daily AS (
  SELECT date_trunc('day', o_orderdate) AS d,
         CAST(round(SUM(CAST(o_totalprice AS DECIMAL(18,4))), 2)
              AS DOUBLE) AS rev
  FROM orders GROUP BY d
),
stats AS (
  SELECT d, rev,
         CAST(SUM(CAST(rev AS DECIMAL(28,4))) OVER w AS DOUBLE) AS s1,
         CAST(SUM(CAST(rev AS DECIMAL(38,8))
                  * CAST(rev AS DECIMAL(38,8))) OVER w AS DOUBLE) AS s2,
         CAST(count(*) OVER w AS BIGINT) AS n
  FROM daily
  WINDOW w AS (ORDER BY d ROWS BETWEEN 14 PRECEDING AND CURRENT ROW)
)
SELECT d, rev,
       CASE WHEN n >= 5 AND s2 / n - (s1 / n) * (s1 / n) > 0
            THEN round((rev - s1 / n)
                       / sqrt(s2 / n - (s1 / n) * (s1 / n)), 4)
            END AS z,
       CASE WHEN n >= 5 AND s2 / n - (s1 / n) * (s1 / n) > 0
                 AND abs((rev - s1 / n)
                         / sqrt(s2 / n - (s1 / n) * (s1 / n))) > 2
            THEN 1 ELSE 0 END AS is_anomaly
FROM stats
""",
    tags=("timeseries", "anomaly"),
)
def ts_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling z-score anomaly flags over the daily revenue series: a
    15-day trailing window supplies mean/std from EXACT decimal sums
    (s1, s2), so both engines feed identical doubles into the same
    IEEE expression and the rounded z matches bit-for-bit.  Aggregate
    first, window over the tiny daily series — the same inversion as
    ts_moving_average; warm-up rows (n<5) and zero-variance windows
    yield null z."""
    orders = load_table(spark, sf_dir, "orders")
    daily = orders.groupBy(
        F.date_trunc("day", "o_orderdate").alias("d")
    ).agg(
        F.round(
            F.sum(F.col("o_totalprice").cast("decimal(18,4)")), 2
        ).cast("double").alias("rev"),
    )
    w = Window.orderBy("d").rowsBetween(-14, 0)
    s1 = F.sum(F.col("rev").cast("decimal(28,4)")).over(w).cast("double")
    s2 = (
        F.sum(
            F.col("rev").cast("decimal(38,8)")
            * F.col("rev").cast("decimal(38,8)")
        )
        .over(w)
        .cast("double")
    )
    n = F.count(F.lit(1)).over(w)
    stats = daily.select(
        "d", "rev", s1.alias("s1"), s2.alias("s2"), n.alias("n")
    )
    mean = F.col("s1") / F.col("n")
    var = F.col("s2") / F.col("n") - mean * mean
    z = F.round((F.col("rev") - mean) / F.sqrt(var), 4)
    ok = (F.col("n") >= 5) & (var > 0)
    return stats.select(
        "d",
        "rev",
        F.when(ok, z).alias("z"),
        F.when(ok & (F.abs((F.col("rev") - mean) / F.sqrt(var)) > 2), 1)
        .otherwise(0)
        .alias("is_anomaly"),
    )


@register(
    "ts_interpolate_linear",
    oracle=f"""
WITH h AS (
  SELECT (epoch_us(ts) // {_HOUR_US}) * {_HOUR_US} AS hour_us,
         user_id,
         round(CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE)
               / count(*), 6) AS v
  FROM events WHERE user_id < 10 GROUP BY 1, 2
),
bounds AS (
  SELECT user_id, min(hour_us) AS lo, max(hour_us) AS hi
  FROM h GROUP BY user_id
),
spine AS (
  SELECT user_id, unnest(range(lo, hi + 1, {_HOUR_US})) AS hour_us
  FROM bounds
),
j AS (
  SELECT s.user_id, s.hour_us, h.v
  FROM spine s LEFT JOIN h ON h.user_id = s.user_id
                          AND h.hour_us = s.hour_us
),
w AS (
  SELECT user_id, hour_us, v,
         last_value(v IGNORE NULLS) OVER (
           PARTITION BY user_id ORDER BY hour_us
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
         last_value(CASE WHEN v IS NOT NULL THEN hour_us END IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY hour_us
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pt,
         first_value(v IGNORE NULLS) OVER (
           PARTITION BY user_id ORDER BY hour_us
           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
         first_value(CASE WHEN v IS NOT NULL THEN hour_us END IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY hour_us
                 ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nt
  FROM j
)
SELECT user_id, hour_us, v AS obs,
       CASE WHEN v IS NOT NULL THEN v
            WHEN pv IS NULL THEN nv
            WHEN nv IS NULL THEN pv
            ELSE CAST(round(CAST(pv + (nv - pv)
                       * (CAST(hour_us - pt AS DOUBLE) / (nt - pt))
                       AS DECIMAL(28,12)), 6) AS DOUBLE)
       END AS interp
FROM w
""",
    tags=("timeseries", "gapfill", "interpolate"),
)
def ts_interpolate_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap filling by LINEAR interpolation (the numeric sibling of
    ts_gapfill_locf): dense hour spine per user, then missing hours
    get pv + (nv-pv)·(t-pt)/(nt-pt) between the bracketing
    observations — the resampling a metrics/sensor pipeline applies
    before models that can't see NULLs.  Hourly means are computed in
    exact decimal and every interpolated value re-rounds at 6, so the
    oracle hash-matches despite the float arithmetic.

    At 100 TB: spine generation is sequence()-per-series (no driver
    loop), the four bracketing lookups are IGNORE NULLS windows over
    the same (user, hour) sort — one shuffle, one sort, four frame
    scans; everything stays partitioned by series key.
    """
    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 10)
    hour = (F.col("ts_us") - F.col("ts_us") % _HOUR_US).alias("hour_us")
    h = (
        ev.withColumn("ts_us", F.expr("ts_ns div 1000"))
        .groupBy("user_id", hour)
        .agg(davg("value", 4, 6).alias("v"))
    )
    spine = (
        h.groupBy("user_id")
        .agg(F.min("hour_us").alias("lo"), F.max("hour_us").alias("hi"))
        .select(
            "user_id",
            F.explode(F.sequence("lo", "hi", F.lit(_HOUR_US))).alias(
                "hour_us"
            ),
        )
    )
    j = spine.join(h, ["user_id", "hour_us"], "left")
    wb = (
        Window.partitionBy("user_id")
        .orderBy("hour_us")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wf = (
        Window.partitionBy("user_id")
        .orderBy("hour_us")
        .rowsBetween(0, Window.unboundedFollowing)
    )
    t_obs = F.when(F.col("v").isNotNull(), F.col("hour_us"))
    w = j.select(
        "user_id",
        "hour_us",
        "v",
        F.last("v", ignorenulls=True).over(wb).alias("pv"),
        F.last(t_obs, ignorenulls=True).over(wb).alias("pt"),
        F.first("v", ignorenulls=True).over(wf).alias("nv"),
        F.first(t_obs, ignorenulls=True).over(wf).alias("nt"),
    )
    frac = (F.col("hour_us") - F.col("pt")).cast("double") / (
        F.col("nt") - F.col("pt")
    )
    interp = (
        F.when(F.col("v").isNotNull(), F.col("v"))
        .when(F.col("pv").isNull(), F.col("nv"))
        .when(F.col("nv").isNull(), F.col("pv"))
        .otherwise(
            F.round(
                (F.col("pv") + (F.col("nv") - F.col("pv")) * frac).cast(
                    "decimal(28,12)"
                ),
                6,
            ).cast("double")
        )
    )
    return w.select(
        "user_id", "hour_us", F.col("v").alias("obs"), interp.alias("interp")
    )


@register(
    "ts_seasonal_decompose",
    oracle="""
WITH daily AS (
  SELECT date_trunc('day', o_orderdate) AS d, count(*) AS n
  FROM orders GROUP BY d
),
tr AS (
  SELECT d, n,
         CASE WHEN count(*) OVER w = 7 THEN
           CAST(round(CAST(CAST(SUM(CAST(n AS DECIMAL(28,4))) OVER w
                                AS DOUBLE) / 7 AS DECIMAL(28,12)), 9)
                AS DOUBLE)
         END AS trend,
         CAST(epoch(d) // 86400 AS BIGINT) % 7 AS wd
  FROM daily
  WINDOW w AS (ORDER BY d ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
),
sw AS (
  SELECT wd,
         CAST(round(CAST(CAST(SUM(CAST(n - trend AS DECIMAL(28,9)))
                               AS DOUBLE) / count(*)
                         AS DECIMAL(28,12)), 9) AS DOUBLE) AS s_raw
  FROM tr WHERE trend IS NOT NULL GROUP BY wd
),
sc AS (
  SELECT wd,
         CAST(round(CAST(s_raw AS DECIMAL(28,9))
               - (SELECT CAST(round(CAST(CAST(SUM(CAST(s_raw AS
                      DECIMAL(28,9))) AS DOUBLE) / 7 AS DECIMAL(28,12)),
                      9) AS DECIMAL(28,9)) FROM sw), 9)
              AS DOUBLE) AS seasonal
  FROM sw
)
SELECT tr.d, tr.n, tr.trend, sc.seasonal,
       CAST(round(CAST(tr.n AS DECIMAL(28,9))
             - CAST(tr.trend AS DECIMAL(28,9))
             - CAST(sc.seasonal AS DECIMAL(28,9)), 9) AS DOUBLE)
         AS resid
FROM tr JOIN sc ON sc.wd = tr.wd
WHERE tr.trend IS NOT NULL
""",
    tags=("timeseries", "decomposition"),
)
def ts_seasonal_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classical additive seasonal decomposition of the daily order
    series: trend = centered 7-day moving average (full windows
    only), seasonal = mean-centered weekday effect of the detrended
    series, residual = observed - trend - seasonal.  The anomaly
    detector's missing half: ts_anomaly_zscore flags deviations from
    a rolling mean, this separates the deviation into recurring
    weekday structure vs true surprise.

    Scale shape: aggregate-then-window like ts_moving_average (the
    window runs over |days| rows, never raw facts); the weekday
    effect table is 7 rows, broadcast back.  Weekday indexes via
    epoch-days % 7 (engine-neutral — no dayofweek() origin
    mismatch); every intermediate is rounded then summed in DECIMAL
    so float association cannot flip the 9th digit across engines.
    """
    orders = load_table(spark, sf_dir, "orders")
    daily = orders.groupBy(
        F.date_trunc("day", "o_orderdate").alias("d")
    ).agg(F.count(F.lit(1)).alias("n"))
    w = Window.orderBy("d").rowsBetween(-3, 3)
    trend = F.when(
        F.count(F.lit(1)).over(w) == 7,
        F.round(
            (
                F.sum(F.col("n").cast("decimal(28,4)"))
                .over(w)
                .cast("double")
                / 7
            ).cast("decimal(28,12)"),
            9,
        ).cast("double"),
    )
    tr = daily.select(
        "d",
        "n",
        trend.alias("trend"),
        (
            (F.unix_timestamp("d").cast("long") / F.lit(86400)).cast(
                "long"
            )
            % 7
        ).alias("wd"),
    ).filter(F.col("trend").isNotNull())
    sw = tr.groupBy("wd").agg(
        F.round(
            (
                F.sum(
                    (F.col("n") - F.col("trend")).cast("decimal(28,9)")
                ).cast("double")
                / F.count(F.lit(1))
            ).cast("decimal(28,12)"),
            9,
        )
        .cast("double")
        .alias("s_raw")
    )
    mean_s = sw.agg(
        F.round(
            (
                F.sum(F.col("s_raw").cast("decimal(28,9)")).cast("double")
                / 7
            ).cast("decimal(28,12)"),
            9,
        )
        .cast("decimal(28,9)")
        .alias("ms")
    )
    sc = sw.crossJoin(F.broadcast(mean_s)).select(
        "wd",
        F.round(
            F.col("s_raw").cast("decimal(28,9)") - F.col("ms"), 9
        )
        .cast("double")
        .alias("seasonal"),
    )
    return tr.join(F.broadcast(sc), "wd").select(
        "d",
        "n",
        "trend",
        "seasonal",
        F.round(
            F.col("n").cast("decimal(28,9)")
            - F.col("trend").cast("decimal(28,9)")
            - F.col("seasonal").cast("decimal(28,9)"),
            9,
        )
        .cast("double")
        .alias("resid"),
    )


@register(
    "ts_changepoint_cusum",
    oracle=f"""
WITH d AS (
  SELECT epoch_us(ts) // {_DAY_US} AS day, count(*) AS cnt
  FROM events GROUP BY 1
),
b AS (SELECT min(day) AS lo, max(day) AS hi FROM d),
spine AS (SELECT unnest(range(lo, hi + 1)) AS day FROM b),
j AS (
  SELECT s.day, coalesce(d.cnt, 0) AS c
  FROM spine s LEFT JOIN d USING (day)
),
tot AS (
  SELECT CAST(count(*) AS BIGINT) AS n, CAST(SUM(c) AS BIGINT) AS total
  FROM j
),
t AS (
  SELECT day, c,
         CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS pos,
         CAST(SUM(c) OVER (ORDER BY day) AS BIGINT) AS csum
  FROM j
),
sc AS (
  SELECT day, c, n, total,
         10 * n * csum - 11 * pos * total AS big_t
  FROM t CROSS JOIN tot
),
m AS (
  SELECT day, c, n, total, big_t,
         least(0, min(big_t) OVER (ORDER BY day)) AS mn
  FROM sc
)
SELECT CAST(day AS BIGINT) AS day,
       CAST(c AS BIGINT) AS n_events,
       CAST(round(CAST(CAST(big_t - mn AS DOUBLE)
                       / (10.0 * CAST(n AS DOUBLE))
                  AS DECIMAL(28,12)), 6) AS DOUBLE) AS cusum,
       (big_t - mn) > 30 * total AS alarm
FROM m
""",
    tags=("timeseries", "changepoint", "monitoring"),
)
def ts_changepoint_cusum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-sided CUSUM change-point detection over the daily event
    volume: S_t = max(0, S_(t-1) + c_t - mu - k) with allowance
    k = 0.1*mu, alarm when S_t > 3*mu — the standing upward-shift
    monitor for pipeline volumes (ingest spikes, runaway producers).

    The recursion is NOT directly window-expressible, but the
    clamped sum has the exact closed form S_t = T_t - min(0,
    min_(i<=t) T_i) where T is the UNclamped prefix sum — so two
    windows (cumsum + running min) over the gap-filled day spine
    compute it exactly.  All arithmetic is INTEGER at scale 10n
    (T_t*10n = 10n*cumsum - 11*pos*total), so mean and allowance
    never materialize as floats: the alarm compare is
    (T - min) > 30*total, integers end to end, and the reported
    cusum value is one integer-ratio double.

    At 100 TB: aggregate-first — the fact scan reduces to |days|
    rows before ANY window runs; the unpartitioned windows touch the
    365-row spine only (bounded by the calendar, the documented
    benign class)."""
    ev = load_table(spark, sf_dir, "events")
    d = ev.groupBy(
        F.expr(f"ts_ns div 1000 div {_DAY_US}").alias("day")
    ).agg(F.count(F.lit(1)).alias("cnt"))
    return cusum_from_day_counts(spark, d)


def cusum_from_day_counts(spark: SparkSession, d: DataFrame) -> DataFrame:
    """CUSUM report from a (day, cnt) counter table — the merge-side
    tail shared by the batch monitor (ts_changepoint_cusum) and the
    streaming monitor (stream_cusum_monitor).  Day counters are
    mergeable, so per-batch deltas compose into this tail unchanged
    (the psi_from_bin_counts pattern for change-point detection)."""
    b = d.agg(F.min("day").alias("lo"), F.max("day").alias("hi"))
    spine = b.select(
        F.explode(F.sequence("lo", "hi")).alias("day")
    )
    j = spine.join(d, "day", "left").select(
        "day", F.coalesce("cnt", F.lit(0)).alias("c")
    )
    tot = j.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("c").cast("long").alias("total"),
    )
    wc = Window.orderBy("day").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    t = j.select(
        "day",
        "c",
        F.row_number().over(Window.orderBy("day")).cast("long").alias("pos"),
        F.sum("c").over(wc).cast("long").alias("csum"),
    )
    sc = t.crossJoin(F.broadcast(tot)).select(
        "day",
        "c",
        "n",
        "total",
        (
            F.lit(10) * F.col("n") * F.col("csum")
            - F.lit(11) * F.col("pos") * F.col("total")
        ).alias("big_t"),
    )
    m = sc.select(
        "day",
        "c",
        "n",
        "total",
        "big_t",
        F.least(F.lit(0), F.min("big_t").over(wc)).alias("mn"),
    )
    return m.select(
        F.col("day").cast("long").alias("day"),
        F.col("c").cast("long").alias("n_events"),
        F.round(
            (
                (F.col("big_t") - F.col("mn")).cast("double")
                / (F.lit(10.0) * F.col("n").cast("double"))
            ).cast("decimal(28,12)"),
            6,
        )
        .cast("double")
        .alias("cusum"),
        ((F.col("big_t") - F.col("mn")) > F.lit(30) * F.col("total")).alias(
            "alarm"
        ),
    )


@register(
    "ts_autocorrelation",
    oracle=f"""
WITH d AS (
  SELECT epoch_us(ts) // {_DAY_US} AS day, count(*) AS cnt
  FROM events GROUP BY 1
),
b AS (SELECT min(day) AS lo, max(day) AS hi FROM d),
spine AS (SELECT unnest(range(lo, hi + 1)) AS day FROM b),
j AS (
  SELECT s.day, coalesce(d.cnt, 0) AS c,
         row_number() OVER (ORDER BY s.day) AS pos
  FROM spine s LEFT JOIN d USING (day)
),
tot AS (
  SELECT CAST(count(*) AS BIGINT) AS n, CAST(SUM(c) AS BIGINT) AS s
  FROM j
),
y AS (
  SELECT pos, n * c - s AS yv, n, s FROM j CROSS JOIN tot
),
den AS (SELECT CAST(SUM(yv * yv) AS BIGINT) AS d2 FROM y),
grid AS (SELECT unnest(range(1, 8)) AS k),
num AS (
  SELECT g.k,
         CAST(count(*) AS BIGINT) AS n_pairs,
         CAST(SUM(a.yv * b.yv) AS BIGINT) AS nm
  FROM grid g
  JOIN y a ON TRUE
  JOIN y b ON a.pos = b.pos + g.k
  GROUP BY g.k
)
SELECT CAST(k AS BIGINT) AS lag, n_pairs,
       CAST(round(CAST(CAST(nm AS DOUBLE) / CAST(d2 AS DOUBLE)
                  AS DECIMAL(18,12)), 6) AS DOUBLE) AS acf
FROM num CROSS JOIN den
""",
    tags=("timeseries", "statistics"),
)
def ts_autocorrelation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Autocorrelation function of the daily event volume at lags
    1-7 — the seasonality detector that justifies (or refutes) the
    weekly component ts_seasonal_decompose assumes.  Standard ACF:
    r_k = sum (x_t - mean)(x_(t-k) - mean) / sum (x_t - mean)^2,
    computed EXACTLY by scaling through n (y_t = n*x_t - S is
    integer, r_k = sum y_t y_(t-k) / sum y_t^2) — no float appears
    until the single final division.

    At 100 TB: aggregate-first to |days| rows; the lag pairing is an
    equi-join on the 365-row spine positions — everything after the
    first aggregate is calendar-bounded."""
    ev = load_table(spark, sf_dir, "events")
    d = ev.groupBy(
        F.expr(f"ts_ns div 1000 div {_DAY_US}").alias("day")
    ).agg(F.count(F.lit(1)).alias("cnt"))
    b = d.agg(F.min("day").alias("lo"), F.max("day").alias("hi"))
    spine = b.select(F.explode(F.sequence("lo", "hi")).alias("day"))
    j = (
        spine.join(d, "day", "left")
        .select("day", F.coalesce("cnt", F.lit(0)).alias("c"))
        .withColumn("pos", F.row_number().over(Window.orderBy("day")))
    )
    tot = j.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("c").cast("long").alias("s"),
    )
    y = j.crossJoin(F.broadcast(tot)).select(
        "pos", (F.col("n") * F.col("c") - F.col("s")).alias("yv")
    )
    den = y.agg(F.sum(F.col("yv") * F.col("yv")).cast("long").alias("d2"))
    grid = spark.range(1, 8).select(F.col("id").alias("lag"))
    a = y.select(F.col("pos").alias("pa"), F.col("yv").alias("ya"))
    bb = y.select(F.col("pos").alias("pb"), F.col("yv").alias("yb"))
    num = (
        grid.crossJoin(a)
        .join(bb, F.col("pa") == F.col("pb") + F.col("lag"))
        .groupBy("lag")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_pairs"),
            F.sum(F.col("ya") * F.col("yb")).cast("long").alias("nm"),
        )
    )
    return num.crossJoin(F.broadcast(den)).select(
        F.col("lag").cast("long").alias("lag"),
        "n_pairs",
        F.round(
            (F.col("nm").cast("double") / F.col("d2").cast("double")).cast(
                "decimal(18,12)"
            ),
            6,
        )
        .cast("double")
        .alias("acf"),
    )


@register(
    "ts_hourly_profile",
    oracle=f"""
WITH h AS (
  SELECT (epoch_us(ts) % {_DAY_US}) // {_HOUR_US} AS hour_of_day,
         count(*) AS n
  FROM events GROUP BY 1
),
tot AS (SELECT CAST(SUM(n) AS BIGINT) AS total,
               CAST(max(n) AS BIGINT) AS peak FROM h)
SELECT CAST(hour_of_day AS BIGINT) AS hour_of_day,
       CAST(n AS BIGINT) AS n_events,
       CAST(round(CAST(CAST(n AS DOUBLE) * 24.0 / CAST(total AS DOUBLE)
                  AS DECIMAL(18,12)), 6) AS DOUBLE) AS seasonal_index,
       n = peak AS is_peak
FROM h CROSS JOIN tot
""",
    tags=("timeseries", "seasonality"),
)
def ts_hourly_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hour-of-day seasonality profile: event volume per UTC hour
    with the seasonal index (share x 24 — 1.0 is a flat profile) and
    the peak-hour flag — the intraday companion to
    ts_seasonal_decompose's weekday effect, and the input to
    capacity planning (peak-hour throughput sizes the cluster).
    Integer epoch arithmetic; one 24-row aggregate.

    At 100 TB: a counter aggregate with map-side partials; the
    profile is 24 rows no matter the corpus."""
    ev = load_table(spark, sf_dir, "events")
    h = ev.groupBy(
        F.expr(f"(ts_ns div 1000 % {_DAY_US}) div {_HOUR_US}").alias(
            "hour_of_day"
        )
    ).agg(F.count(F.lit(1)).alias("n"))
    tot = h.agg(
        F.sum("n").cast("long").alias("total"),
        F.max("n").cast("long").alias("peak"),
    )
    return h.crossJoin(F.broadcast(tot)).select(
        F.col("hour_of_day").cast("long").alias("hour_of_day"),
        F.col("n").cast("long").alias("n_events"),
        F.round(
            (
                F.col("n").cast("double")
                * F.lit(24.0)
                / F.col("total").cast("double")
            ).cast("decimal(18,12)"),
            6,
        )
        .cast("double")
        .alias("seasonal_index"),
        (F.col("n") == F.col("peak")).alias("is_peak"),
    )


@register(
    "interval_max_concurrency",
    oracle="""
WITH e AS (
  SELECT event_id, event_type, CAST(ts AS DATE) AS day,
         epoch_us(ts) AS t0, epoch_us(ts) + 300000000 AS t1
  FROM events
),
pts AS (
  SELECT event_type, day, t0 AS t, 1 AS delta, event_id FROM e
  UNION ALL
  SELECT event_type, day, t1 AS t, -1 AS delta, event_id FROM e
),
run AS (
  SELECT event_type, day, delta,
         SUM(delta) OVER (PARTITION BY event_type, day
                          ORDER BY t, delta, event_id
                          ROWS UNBOUNDED PRECEDING) AS conc
  FROM pts
)
SELECT event_type, day,
       CAST(count(CASE WHEN delta = 1 THEN 1 END) AS BIGINT)
         AS n_events,
       CAST(max(conc) AS BIGINT) AS max_concurrent
FROM run GROUP BY event_type, day
""",
    tags=("timeseries", "intervals", "sweepline"),
)
def interval_max_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sweep-line MAX CONCURRENCY: each event occupies a 5-minute
    interval; the classic +1/-1 boundary-point sweep with a running
    sum gives the peak number of simultaneously-open intervals per
    (event_type, UTC start day).  End points are EXCLUSIVE: at a
    shared timestamp the -1 sorts before the +1 (delta ascending in
    the order key), so touching intervals never count as concurrent
    — the same strict-boundary discipline as the session-window
    oracles.  event_id breaks remaining ties, making the running sum
    path (not just its max) deterministic.

    Scale shape: two boundary rows per event, ONE window partitioned
    by (event_type, day) — the sweep is embarrassingly parallel
    across partition keys and never globally sorts (the naive
    interval-overlap self-join is quadratic in the densest hour)."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        "event_type",
        F.to_date(F.timestamp_micros(F.expr("ts_ns div 1000"))).alias(
            "day"
        ),
        F.expr("ts_ns div 1000").alias("t0"),
        (F.expr("ts_ns div 1000") + 300_000_000).alias("t1"),
    )
    pts = ev.select(
        "event_type",
        "day",
        F.explode(
            F.array(
                F.struct(
                    F.col("t0").alias("t"),
                    F.lit(1).alias("delta"),
                    F.col("event_id"),
                ),
                F.struct(
                    F.col("t1").alias("t"),
                    F.lit(-1).alias("delta"),
                    F.col("event_id"),
                ),
            )
        ).alias("p"),
    ).select("event_type", "day", "p.t", "p.delta", "p.event_id")
    w = (
        Window.partitionBy("event_type", "day")
        .orderBy("t", "delta", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    run = pts.withColumn("conc", F.sum("delta").over(w))
    return run.groupBy("event_type", "day").agg(
        F.count(F.when(F.col("delta") == 1, 1))
        .cast("long")
        .alias("n_events"),
        F.max("conc").cast("long").alias("max_concurrent"),
    )


@register(
    "ts_downsample_lttb",
    oracle="""
WITH s AS (
  SELECT user_id, event_id, epoch_us(ts) AS x, value AS y,
         CAST(round(value * 100) AS BIGINT) AS yc,
         row_number() OVER w AS rn,
         count(*) OVER (PARTITION BY user_id) AS n,
         lag(epoch_us(ts)) OVER w AS xp,
         lag(CAST(round(value * 100) AS BIGINT)) OVER w AS ycp,
         lead(epoch_us(ts)) OVER w AS xn,
         lead(CAST(round(value * 100) AS BIGINT)) OVER w AS ycn
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
),
a AS (
  SELECT user_id, event_id, x, y,
         ((rn - 1) * 10) // n AS bucket,
         CASE WHEN xp IS NULL OR xn IS NULL THEN CAST(0 AS BIGINT)
              ELSE abs((xp - xn) * (yc - ycp)
                       - (xp - x) * (ycn - ycp)) END
           AS area_c
  FROM s
),
r AS (
  SELECT user_id, bucket, event_id, x, y, area_c,
         row_number() OVER (PARTITION BY user_id, bucket
                            ORDER BY area_c DESC, event_id) AS pick
  FROM a
)
SELECT user_id, CAST(bucket AS BIGINT) AS bucket, event_id,
       CAST(x AS BIGINT) AS ts_us, y AS value,
       CAST(area_c AS DOUBLE) / 100.0 AS area
FROM r WHERE pick = 1
""",
    tags=("timeseries", "downsample", "lttb"),
)
def ts_downsample_lttb(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Largest-triangle downsampling of each user's value series to
    10 representative points — the dashboard-rendering reduction that
    keeps spikes a uniform stride would erase.  Per point, the
    triangle area against its immediate neighbors (the
    largest-triangle-one-bucket form of LTTB — neighbor-based, so
    every point's score is a pure window expression; classic LTTB's
    previously-selected-point recurrence is sequential by
    construction and cannot parallelize); per (user, time-bucket),
    the max-area point wins, ties broken by event id, series
    endpoints score 0 and win only empty-tie buckets.

    Parity spine: x is integer microseconds and y is quantized to
    integer cents (``round(value*100)`` — the data is 2-decimal, and
    the quantizer is the same deterministic double op in both
    engines), so every triangle area is EXACT bigint arithmetic —
    ``a*b - c*d`` on doubles differs by one ulp between engines at
    the ~1e13 magnitudes these areas reach, which no display
    rounding can mask, and an integer argmax cannot tie-break
    differently.  The reported area divides the exact cents by 100
    in identical double ops.

    At 100 TB: windows and ranks all partition by user_id (no global
    window anywhere); one shuffle on the partition key serves the
    lag/lead pass and the per-bucket rank reuses it — output is a
    fixed 10 rows per user regardless of series length."""
    ev = load_table(spark, sf_dir, "events")
    # Order at MICROSECOND grain on both sides: DuckDB's TIMESTAMP view
    # truncates the nano-grain parquet to us, so a ts_ns order here
    # could disagree on same-us ties.
    w = Window.partitionBy("user_id").orderBy(
        F.expr("ts_ns div 1000"), "event_id"
    )
    yc = F.round(F.col("value") * 100).cast("long")
    s = ev.select(
        "user_id",
        "event_id",
        F.expr("ts_ns div 1000").alias("x"),
        F.col("value").alias("y"),
        yc.alias("yc"),
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1))
        .over(Window.partitionBy("user_id"))
        .alias("n"),
        F.lag(F.expr("ts_ns div 1000")).over(w).alias("xp"),
        F.lag(yc).over(w).alias("ycp"),
        F.lead(F.expr("ts_ns div 1000")).over(w).alias("xn"),
        F.lead(yc).over(w).alias("ycn"),
    )
    area_c = F.when(
        F.col("xp").isNull() | F.col("xn").isNull(),
        F.lit(0).cast("long"),
    ).otherwise(
        F.abs(
            (F.col("xp") - F.col("xn")) * (F.col("yc") - F.col("ycp"))
            - (F.col("xp") - F.col("x")) * (F.col("ycn") - F.col("ycp"))
        )
    )
    a = s.select(
        "user_id",
        "event_id",
        "x",
        "y",
        F.expr("((rn - 1) * 10) div n").alias("bucket"),
        area_c.alias("area_c"),
    )
    pick = Window.partitionBy("user_id", "bucket").orderBy(
        F.col("area_c").desc(), "event_id"
    )
    return (
        a.withColumn("pick", F.row_number().over(pick))
        .filter(F.col("pick") == 1)
        .select(
            "user_id",
            F.col("bucket").cast("long").alias("bucket"),
            "event_id",
            F.col("x").cast("long").alias("ts_us"),
            F.col("y").alias("value"),
            (F.col("area_c").cast("double") / F.lit(100.0)).alias(
                "area"
            ),
        )
    )
