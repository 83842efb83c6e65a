"""Dataset drift and mergeable-profiling monitors.

A 100 TB corpus is never built once: batches arrive, splits are
re-drawn, sources churn.  These queries are the standing monitors a
training-data pipeline runs between versions: distribution drift
between cohorts (PSI), re-aggregatable moment statistics (the
two-level merge that makes per-shard profiling composable), and the
per-source "data card" summary published with every corpus release.

Reference capability analog: the reference's only standing check is
the golden-output diff after a run (tests/maplejuice.cpp:249-255);
drift monitors are the production form of "did the data change in a
way that should block the publish?".
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, SparkSession, Window

from distributed_system_spark.queries import register
from distributed_system_spark.sources.tables import load_table

# The md5-bucket split expression shared with dataset_split /
# contamination_check: first md5 byte < 0xcd => train, < 0xe6 => val,
# else test.  PSI compares train vs test.
_SPLIT_SQL = (
    "CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'cd' "
    "THEN 'train' "
    "WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'e6' "
    "THEN 'val' ELSE 'test' END"
)

_N_BINS = 10
_BIN_WIDTH = 64  # n_chars in [0, 640) covers every SF's corpus


def md5_split_expr() -> Column:
    """The Spark twin of _SPLIT_SQL: md5 first byte < 0xcd => train,
    < 0xe6 => val, else test.  Single definition shared by the batch
    drift queries AND streaming/streams.py's drift_monitor_stream so
    the documented streaming==batch exact-equality contract (both
    feed psi_from_bin_counts against the same oracle) cannot drift."""
    b = F.substring(
        F.md5(F.col("doc_id").cast("string").cast("binary")), 1, 2
    )
    return (
        F.when(b < "cd", "train").when(b < "e6", "val").otherwise("test")
    )


def char_bin_expr() -> Column:
    """n_chars histogram bin: least(_N_BINS-1, n_chars // _BIN_WIDTH).
    Shared with drift_monitor_stream for the same reason as
    :func:`md5_split_expr`."""
    return F.least(
        F.lit(_N_BINS - 1),
        (F.col("n_chars") / F.lit(_BIN_WIDTH)).cast("long"),
    )


def psi_from_bin_counts(spark: SparkSession, counts: DataFrame) -> DataFrame:
    """PSI report from a (bin, r_cnt, c_cnt) counter table — the
    merge-side tail shared by the batch monitor (drift_psi) and the
    streaming monitor (stream_drift_monitor): bin spine join,
    Laplace-smoothed shares, per-term ln rounded while DECIMAL, and
    the 1-row total broadcast back.  Counters are mergeable, so any
    partial aggregation (per batch, per shard, per day) composes into
    this tail unchanged."""
    spine = spark.range(_N_BINS).select(F.col("id").alias("bin"))
    c = spine.join(F.broadcast(counts), "bin", "left").select(
        "bin",
        F.coalesce("r_cnt", F.lit(0)).alias("ref_n"),
        F.coalesce("c_cnt", F.lit(0)).alias("cur_n"),
    )
    tot = c.agg(F.sum("ref_n").alias("nr"), F.sum("cur_n").alias("nc"))
    p = (F.col("ref_n").cast("double") + F.lit(0.5)) / (
        F.col("nr").cast("double") + F.lit(_N_BINS / 2.0)
    )
    q = (F.col("cur_n").cast("double") + F.lit(0.5)) / (
        F.col("nc").cast("double") + F.lit(_N_BINS / 2.0)
    )
    terms = c.crossJoin(F.broadcast(tot)).select(
        "bin", "ref_n", "cur_n", p.alias("p"), q.alias("q")
    )
    rt = terms.select(
        "bin",
        "ref_n",
        "cur_n",
        "p",
        "q",
        F.round(
            ((F.col("p") - F.col("q")) * F.log(F.col("p") / F.col("q")))
            .cast("decimal(18,12)"),
            12,
        ).alias("term"),
    )
    total = rt.agg(
        F.sum(F.col("term").cast("decimal(28,12)")).alias("psi")
    )
    return rt.crossJoin(F.broadcast(total)).select(
        F.col("bin").cast("long").alias("bin"),
        F.col("ref_n").cast("long").alias("ref_n"),
        F.col("cur_n").cast("long").alias("cur_n"),
        F.round(F.col("p").cast("decimal(18,12)"), 6)
        .cast("double")
        .alias("p_ref"),
        F.round(F.col("q").cast("decimal(18,12)"), 6)
        .cast("double")
        .alias("p_cur"),
        F.round("term", 6).cast("double").alias("psi_term"),
        F.round(F.col("psi").cast("decimal(28,12)"), 6)
        .cast("double")
        .alias("psi_total"),
    )


@register(
    "drift_psi",
    oracle=f"""
WITH assign AS (
  SELECT least({_N_BINS - 1}, n_chars // {_BIN_WIDTH}) AS bin,
         {_SPLIT_SQL} AS split
  FROM documents
),
c AS (
  SELECT b.bin,
         coalesce(r.cnt, 0) AS ref_n,
         coalesce(u.cnt, 0) AS cur_n
  FROM (SELECT unnest(range({_N_BINS})) AS bin) b
  LEFT JOIN (SELECT bin, count(*) AS cnt FROM assign
             WHERE split = 'train' GROUP BY bin) r ON b.bin = r.bin
  LEFT JOIN (SELECT bin, count(*) AS cnt FROM assign
             WHERE split = 'test' GROUP BY bin) u ON b.bin = u.bin
),
tot AS (
  SELECT SUM(ref_n) AS nr, SUM(cur_n) AS nc FROM c
),
terms AS (
  SELECT bin, ref_n, cur_n,
         (CAST(ref_n AS DOUBLE) + 0.5)
           / (CAST(nr AS DOUBLE) + {_N_BINS / 2.0}) AS p,
         (CAST(cur_n AS DOUBLE) + 0.5)
           / (CAST(nc AS DOUBLE) + {_N_BINS / 2.0}) AS q
  FROM c CROSS JOIN tot
),
rt AS (
  SELECT bin, ref_n, cur_n, p, q,
         round(CAST((p - q) * ln(p / q) AS DECIMAL(18,12)), 12)
           AS term
  FROM terms
),
total AS (
  SELECT SUM(CAST(term AS DECIMAL(28,12))) AS psi FROM rt
)
SELECT CAST(bin AS BIGINT) AS bin,
       CAST(ref_n AS BIGINT) AS ref_n,
       CAST(cur_n AS BIGINT) AS cur_n,
       CAST(round(CAST(p AS DECIMAL(18,12)), 6) AS DOUBLE) AS p_ref,
       CAST(round(CAST(q AS DECIMAL(18,12)), 6) AS DOUBLE) AS p_cur,
       CAST(round(term, 6) AS DOUBLE) AS psi_term,
       CAST(round(CAST(psi AS DECIMAL(28,12)), 6) AS DOUBLE) AS psi_total
FROM rt CROSS JOIN total
""",
    tags=("llm", "drift", "monitoring"),
)
def drift_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index of the document-length distribution
    between the train and test cohorts of the md5 split — the drift
    monitor a pipeline runs between corpus versions (and, as here,
    the unbiasedness check on a freshly drawn split: an honest md5
    split should score PSI ~ 0; > 0.2 is the conventional
    "investigate" threshold).

    PSI = sum over bins of (p_i - q_i) * ln(p_i / q_i), with
    Laplace-smoothed bin shares (+0.5 per bin) so an empty bin never
    divides by zero.  Fixed-width bins (10 x 64 chars) keep the bin
    edges data-independent — the monitor compares like with like
    across corpus versions, unlike quantile bins which move with the
    data.  Per-term ln computed on identical doubles in both engines,
    then rounded while DECIMAL per the corpus_zipf_slope convention,
    so the cross-engine compare is exact.

    At 100 TB: one scan, one {10}-bin partial+final aggregate per
    cohort (both reduce in the same pass over the bin spine), and a
    1-row total broadcast back — the heavy side never shuffles more
    than 2x10 counters.  Adding monitored features adds bins, never
    scans."""
    docs = load_table(spark, sf_dir, "documents")
    assign = docs.select(
        char_bin_expr().alias("bin"),
        md5_split_expr().alias("split"),
    )
    counts = (
        assign.filter(F.col("split") != "val")
        .groupBy("bin")
        .agg(
            F.count(F.when(F.col("split") == "train", 1)).alias("r_cnt"),
            F.count(F.when(F.col("split") == "test", 1)).alias("c_cnt"),
        )
    )
    return psi_from_bin_counts(spark, counts)


@register(
    "stats_mergeable_moments",
    oracle="""
WITH s AS (
  SELECT lang, count(*) AS n,
         SUM(CAST(n_chars AS DECIMAL(18,4))) AS s1,
         SUM(CAST(n_chars AS DECIMAL(22,4))
             * CAST(n_chars AS DECIMAL(18,4))) AS s2
  FROM documents
  GROUP BY lang
)
SELECT lang,
       CAST(n AS BIGINT) AS n_docs,
       CAST(round(CAST(CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)
                       AS DECIMAL(28,12)), 6) AS DOUBLE) AS mean_chars,
       CAST(round(CAST(
         CAST(CAST(n AS DECIMAL(12,0)) * CAST(s2 AS DECIMAL(24,8))
              - CAST(s1 AS DECIMAL(16,4)) * CAST(s1 AS DECIMAL(16,4))
              AS DOUBLE)
         / CAST(n * n AS DOUBLE) AS DECIMAL(28,12)), 6)
         AS DOUBLE) AS var_chars
FROM s
""",
    tags=("C4", "profiling", "mergeable"),
)
def stats_mergeable_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Re-aggregatable moment statistics: per-language mean and
    population variance of document length computed by a TWO-LEVEL
    merge — shard-local sufficient statistics (n, sum x, sum x^2) in
    exact DECIMAL, then a merge aggregate per language.  The oracle
    computes the same moments in ONE level; equality is the
    mergeability proof — the property that lets a 100 TB pipeline
    profile each ingest batch once and combine per-batch stats
    forever after without rescanning history (float moments do NOT
    have this property: their partition-order-dependent rounding
    makes merged != direct).

    At 100 TB: level 1 reduces inside each shard's partitions
    (map-side partial agg), level 2 merges |langs| x |shards| tiny
    rows; nothing but counters ever shuffles."""
    docs = load_table(spark, sf_dir, "documents")
    x = F.col("n_chars").cast("decimal(18,4)")
    shard = (F.col("doc_id") % 8).alias("shard")
    level1 = docs.groupBy("lang", shard).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).alias("s1"),
        F.sum(x * x).alias("s2"),
    )
    merged = level1.groupBy("lang").agg(
        F.sum("n").alias("n_docs"),
        F.sum("s1").cast("decimal(16,4)").alias("s1"),
        F.sum("s2").cast("decimal(24,8)").alias("s2"),
    )
    n = F.col("n_docs")
    mean = F.col("s1").cast("double") / n.cast("double")
    var_num = (
        n.cast("decimal(12,0)") * F.col("s2")
        - F.col("s1") * F.col("s1")
    ).cast("double")
    return merged.select(
        "lang",
        "n_docs",
        F.round(mean.cast("decimal(28,12)"), 6)
        .cast("double")
        .alias("mean_chars"),
        F.round(
            (var_num / (n * n).cast("double")).cast("decimal(28,12)"), 6
        )
        .cast("double")
        .alias("var_chars"),
    )


@register(
    "dataset_card_stats",
    oracle="""
SELECT source,
       count(*) AS n_docs,
       count(DISTINCT lang) AS n_langs,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars,
       CAST(round(CAST(SUM(CAST(n_chars AS DECIMAL(18,4)))
                       AS DECIMAL(28,4)) / count(*), 2)
            AS DOUBLE) AS avg_chars,
       CAST(round(CAST(count(CASE WHEN n_chars < 100 THEN 1 END)
                       AS DECIMAL(18,6)) / count(*), 6)
            AS DOUBLE) AS short_rate,
       CAST(round(CAST(count(CASE WHEN lang = 'en' THEN 1 END)
                       AS DECIMAL(18,6)) / count(*), 6)
            AS DOUBLE) AS en_rate
FROM documents
GROUP BY source
""",
    tags=("llm", "profiling", "data-card"),
)
def dataset_card_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source "data card": the one-scan summary published with
    every corpus release (doc counts, language spread, size totals,
    short-document rate, English share).  The per-source axis is what
    a mixture designer reads before setting dataset_mix target rates.

    At 100 TB: one partial+final aggregate grouped by the
    low-cardinality source key; count(DISTINCT lang) expands to the
    standard two-phase distinct-aggregate plan, still bounded by
    |source| x |lang| partial rows."""
    docs = load_table(spark, sf_dir, "documents")
    dec = F.col("n_chars").cast("decimal(18,4)")
    return docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct("lang").alias("n_langs"),
        F.sum("n_chars").alias("total_chars"),
        F.round(
            (F.sum(dec).cast("decimal(28,4)") / F.count(F.lit(1))), 2
        )
        .cast("double")
        .alias("avg_chars"),
        F.round(
            F.count(F.when(F.col("n_chars") < 100, 1))
            .cast("decimal(18,6)")
            / F.count(F.lit(1)),
            6,
        )
        .cast("double")
        .alias("short_rate"),
        F.round(
            F.count(F.when(F.col("lang") == "en", 1))
            .cast("decimal(18,6)")
            / F.count(F.lit(1)),
            6,
        )
        .cast("double")
        .alias("en_rate"),
    )


@register(
    "ks_drift",
    oracle=f"""
WITH assign AS (
  SELECT least({_N_BINS - 1}, n_chars // {_BIN_WIDTH}) AS bin,
         {_SPLIT_SQL} AS split
  FROM documents
),
c AS (
  SELECT b.bin,
         coalesce(r.cnt, 0) AS ref_n,
         coalesce(u.cnt, 0) AS cur_n
  FROM (SELECT unnest(range({_N_BINS})) AS bin) b
  LEFT JOIN (SELECT bin, count(*) AS cnt FROM assign
             WHERE split = 'train' GROUP BY bin) r ON b.bin = r.bin
  LEFT JOIN (SELECT bin, count(*) AS cnt FROM assign
             WHERE split = 'test' GROUP BY bin) u ON b.bin = u.bin
),
cum AS (
  SELECT bin,
         SUM(ref_n) OVER (ORDER BY bin) AS cr,
         SUM(cur_n) OVER (ORDER BY bin) AS cc,
         SUM(ref_n) OVER () AS nr,
         SUM(cur_n) OVER () AS nc
  FROM c
),
d AS (
  SELECT bin,
         CAST(cr AS BIGINT) AS ref_cum,
         CAST(cc AS BIGINT) AS cur_cum,
         CAST(cr AS DOUBLE) / CAST(nr AS DOUBLE) AS er,
         CAST(cc AS DOUBLE) / CAST(nc AS DOUBLE) AS ec
  FROM cum
),
ks AS (
  SELECT max(abs(er - ec)) AS stat FROM d
)
SELECT CAST(bin AS BIGINT) AS bin, ref_cum, cur_cum,
       CAST(round(CAST(er AS DECIMAL(18,12)), 6) AS DOUBLE) AS cdf_ref,
       CAST(round(CAST(ec AS DECIMAL(18,12)), 6) AS DOUBLE) AS cdf_cur,
       CAST(round(CAST(abs(er - ec) AS DECIMAL(18,12)), 6) AS DOUBLE)
         AS abs_gap,
       CAST(round(CAST(stat AS DECIMAL(18,12)), 6) AS DOUBLE) AS ks_stat
FROM d CROSS JOIN ks
""",
    tags=("llm", "drift", "monitoring"),
)
def ks_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kolmogorov-Smirnov drift statistic between the train and test
    cohorts of the md5 split, on the binned-ECDF grid: KS = max over
    grid points of |ECDF_ref - ECDF_cur|.  The max-gap companion to
    drift_psi's divergence — PSI weights the whole distribution, KS
    flags the single worst crossing point (where a drift localizes).

    Grid semantics, stated honestly: this is the EXACT KS statistic
    of the binned distributions (the data-independent 10 x 64-char
    grid shared with drift_psi), a lower bound on the unbinned KS —
    the form that is computable in one pass at 100 TB, where an exact
    unbinned ECDF would need a global sort.  Everything up to the
    final ratio is integer counts; the ratios are integer-division
    doubles, bit-identical across engines — no transcendental parity
    risk at all.

    At 100 TB: one scan into 2 x 10 counters, cumulated by a window
    over the 10-row bin spine — the window is bounded by the grid,
    never by the data."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    assign = docs.select(
        char_bin_expr().alias("bin"),
        md5_split_expr().alias("split"),
    )
    counts = (
        assign.filter(F.col("split") != "val")
        .groupBy("bin")
        .agg(
            F.count(F.when(F.col("split") == "train", 1)).alias("r_cnt"),
            F.count(F.when(F.col("split") == "test", 1)).alias("c_cnt"),
        )
    )
    spine = spark.range(_N_BINS).select(F.col("id").alias("bin"))
    c = spine.join(F.broadcast(counts), "bin", "left").select(
        "bin",
        F.coalesce("r_cnt", F.lit(0)).alias("ref_n"),
        F.coalesce("c_cnt", F.lit(0)).alias("cur_n"),
    )
    # Windows over the 10-row bin spine only — bounded by the grid.
    wcum = Window.orderBy("bin").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    wall = Window.orderBy("bin").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    cum = c.select(
        "bin",
        F.sum("ref_n").over(wcum).alias("cr"),
        F.sum("cur_n").over(wcum).alias("cc"),
        F.sum("ref_n").over(wall).alias("nr"),
        F.sum("cur_n").over(wall).alias("nc"),
    )
    er = F.col("cr").cast("double") / F.col("nr").cast("double")
    ec = F.col("cc").cast("double") / F.col("nc").cast("double")
    d = cum.select(
        "bin",
        F.col("cr").cast("long").alias("ref_cum"),
        F.col("cc").cast("long").alias("cur_cum"),
        er.alias("er"),
        ec.alias("ec"),
    )
    ks = d.agg(F.max(F.abs(F.col("er") - F.col("ec"))).alias("stat"))
    return d.crossJoin(F.broadcast(ks)).select(
        F.col("bin").cast("long").alias("bin"),
        "ref_cum",
        "cur_cum",
        F.round(F.col("er").cast("decimal(18,12)"), 6)
        .cast("double")
        .alias("cdf_ref"),
        F.round(F.col("ec").cast("decimal(18,12)"), 6)
        .cast("double")
        .alias("cdf_cur"),
        F.round(
            F.abs(F.col("er") - F.col("ec")).cast("decimal(18,12)"), 6
        )
        .cast("double")
        .alias("abs_gap"),
        F.round(F.col("stat").cast("decimal(18,12)"), 6)
        .cast("double")
        .alias("ks_stat"),
    )


@register(
    "quantile_normalize_sources",
    oracle="""
WITH hist AS (
  SELECT n_chars AS v, count(*) AS cnt FROM documents GROUP BY n_chars
),
cum AS (
  SELECT v,
         SUM(cnt) OVER (ORDER BY v) AS hi,
         SUM(cnt) OVER (ORDER BY v) - cnt + 1 AS lo
  FROM hist
),
tot AS (SELECT CAST(count(*) AS BIGINT) AS big_n FROM documents),
ranked AS (
  SELECT doc_id, source, n_chars,
         row_number() OVER (PARTITION BY source
                            ORDER BY n_chars, doc_id) AS r,
         count(*) OVER (PARTITION BY source) AS ns
  FROM documents
),
mapped AS (
  SELECT doc_id, source, n_chars,
         (r * big_n + ns - 1) // ns AS p
  FROM ranked CROSS JOIN tot
)
SELECT m.doc_id, m.source,
       CAST(m.n_chars AS BIGINT) AS n_chars,
       CAST(c.v AS BIGINT) AS norm_chars
FROM mapped m JOIN cum c ON m.p BETWEEN c.lo AND c.hi
""",
    tags=("llm", "harmonization", "quantile"),
)
def quantile_normalize_sources(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Quantile normalization across sources (the batch-effect
    correction of bioinformatics, applied to corpus harmonization):
    each document's length is replaced by the POOLED distribution's
    value at the same within-source quantile, so every source ends up
    with an identical length distribution — the preprocessing that
    stops a verbose source from dominating length-sensitive gates.

    Mapping is ALL-INTEGER: within-source rank r of n_s maps to
    pooled cumulative position ceil(r*N/n_s), resolved against the
    pooled value histogram's cumulative intervals — no percentile
    float appears anywhere, so both engines agree exactly.

    At 100 TB: the pooled histogram is bounded by the VALUE
    cardinality (lengths: ~500 distinct), its cumulative intervals
    build in one bounded window and BROADCAST to the interval-lookup
    join; the only corpus-scale work is the per-source rank window
    (one keyed shuffle).  A continuous feature would grid-bucket
    first — same plan, coarser histogram."""
    docs = load_table(spark, sf_dir, "documents")
    hist = docs.groupBy(F.col("n_chars").alias("v")).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    wv = Window.orderBy("v").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = hist.select(
        "v",
        F.sum("cnt").over(wv).alias("hi"),
        (F.sum("cnt").over(wv) - F.col("cnt") + 1).alias("lo"),
    )
    tot = docs.agg(F.count(F.lit(1)).cast("long").alias("big_n"))
    ws = Window.partitionBy("source").orderBy("n_chars", "doc_id")
    wn = Window.partitionBy("source")
    ranked = docs.select(
        "doc_id",
        "source",
        "n_chars",
        F.row_number().over(ws).alias("r"),
        F.count(F.lit(1)).over(wn).alias("ns"),
    )
    mapped = ranked.crossJoin(F.broadcast(tot)).select(
        "doc_id",
        "source",
        "n_chars",
        F.expr("(r * big_n + ns - 1) div ns").alias("p"),
    )
    return mapped.join(
        F.broadcast(cum),
        (F.col("p") >= F.col("lo")) & (F.col("p") <= F.col("hi")),
    ).select(
        "doc_id",
        "source",
        F.col("n_chars").cast("long").alias("n_chars"),
        F.col("v").cast("long").alias("norm_chars"),
    )


@register(
    "source_js_divergence",
    oracle="""
WITH t AS (
  SELECT source, least(19, n_chars // 50) AS bucket FROM documents
),
h AS (
  SELECT source, bucket, count(*) AS cnt FROM t GROUP BY source, bucket
),
n AS (
  SELECT source, CAST(sum(cnt) AS BIGINT) AS n FROM h GROUP BY source
),
grid AS (
  SELECT n.source, n.n, g.bucket
  FROM n CROSS JOIN (SELECT DISTINCT bucket FROM h) g
),
dense AS (
  SELECT grid.source, grid.bucket, grid.n, coalesce(h.cnt, 0) AS cnt
  FROM grid LEFT JOIN h
    ON h.source = grid.source AND h.bucket = grid.bucket
),
pairs AS (
  SELECT a.source AS source_a, b.source AS source_b,
         a.n AS n_a, b.n AS n_b, a.cnt AS ca, b.cnt AS cb
  FROM dense a JOIN dense b
    ON a.bucket = b.bucket AND a.source < b.source
),
terms AS (
  SELECT source_a, source_b, n_a, n_b,
         CASE WHEN ca > 0 THEN
           ca * CAST(ln(CAST(2 * ca * n_b AS DOUBLE)
                        / CAST(ca * n_b + cb * n_a AS DOUBLE))
                     AS DECIMAL(18,12))
         ELSE CAST(0 AS DECIMAL(18,12)) END AS ta,
         CASE WHEN cb > 0 THEN
           cb * CAST(ln(CAST(2 * cb * n_a AS DOUBLE)
                        / CAST(ca * n_b + cb * n_a AS DOUBLE))
                     AS DECIMAL(18,12))
         ELSE CAST(0 AS DECIMAL(18,12)) END AS tb
  FROM pairs
)
SELECT source_a, source_b,
       CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
       round(0.5 * (CAST(SUM(ta) AS DOUBLE) / n_a
                    + CAST(SUM(tb) AS DOUBLE) / n_b), 6) AS js_nats
FROM terms
GROUP BY source_a, source_b, n_a, n_b
""",
    tags=("drift", "divergence", "source"),
)
def source_js_divergence(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Pairwise Jensen-Shannon divergence between sources over their
    document-length distributions (20 integer buckets of n_chars) —
    the symmetric, always-finite drift measure an operator reads to
    decide which sources are interchangeable and which need their own
    mixing weight (PSI, drift_psi, is its one-cohort-vs-baseline
    sibling; this is the all-pairs matrix form).

    Parity spine: each JS term is cnt * ln(ratio-of-integer-products)
    — the log argument 2*ca*n_b / (ca*n_b + cb*n_a) is a ratio of
    exact int64 products, so both engines evaluate ln on the
    identical double; the ln result is rounded through DECIMAL(18,12)
    (the text_lm_bigram_nll idiom) before the integer-weighted
    decimal sum, burying last-ulp libm differences.  Zero-count
    buckets contribute exactly 0 (their p log p/m limit).

    At 100 TB: the corpus reduces to a (source x 20-bucket) count
    grid in one partial+final aggregate; the pair matrix is built
    from the GRID (|sources|^2 x 20 rows, broadcast-sized) — corpus
    size never enters the pairing."""
    docs = load_table(spark, sf_dir, "documents")
    h = (
        docs.select(
            "source",
            F.least(F.lit(19), F.expr("n_chars div 50")).alias("bucket"),
        )
        .groupBy("source", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    n = h.groupBy("source").agg(F.sum("cnt").cast("long").alias("n"))
    grid = n.select("source", "n").crossJoin(
        h.select("bucket").distinct()
    )
    dense = grid.join(h, ["source", "bucket"], "left").select(
        "source", "bucket", "n", F.coalesce("cnt", F.lit(0)).alias("cnt")
    )
    a = dense.select(
        F.col("source").alias("source_a"),
        "bucket",
        F.col("n").alias("n_a"),
        F.col("cnt").alias("ca"),
    )
    b = dense.select(
        F.col("source").alias("source_b"),
        "bucket",
        F.col("n").alias("n_b"),
        F.col("cnt").alias("cb"),
    )
    pairs = a.join(F.broadcast(b), "bucket").filter(
        F.col("source_a") < F.col("source_b")
    )
    denom = (
        F.col("ca") * F.col("n_b") + F.col("cb") * F.col("n_a")
    ).cast("double")
    ta = F.when(
        F.col("ca") > 0,
        F.col("ca")
        * F.log((2 * F.col("ca") * F.col("n_b")).cast("double") / denom)
        .cast("decimal(18,12)"),
    ).otherwise(F.lit(0).cast("decimal(18,12)"))
    tb = F.when(
        F.col("cb") > 0,
        F.col("cb")
        * F.log((2 * F.col("cb") * F.col("n_a")).cast("double") / denom)
        .cast("decimal(18,12)"),
    ).otherwise(F.lit(0).cast("decimal(18,12)"))
    return (
        pairs.select("source_a", "source_b", "n_a", "n_b", ta.alias("ta"), tb.alias("tb"))
        .groupBy("source_a", "source_b", "n_a", "n_b")
        .agg(
            F.round(
                0.5
                * (
                    F.sum("ta").cast("double") / F.col("n_a")
                    + F.sum("tb").cast("double") / F.col("n_b")
                ),
                6,
            ).alias("js_nats")
        )
        .select(
            "source_a",
            "source_b",
            F.col("n_a").cast("long").alias("n_a"),
            F.col("n_b").cast("long").alias("n_b"),
            "js_nats",
        )
    )
