"""UDF surface (SURVEY.md §2.C row C10): scalar pandas UDF, grouped-
aggregate pandas UDF, and the row-at-a-time Python UDF — plus
approx_count_distinct (rows-only check; HLL sketches are
engine-specific by nature).

House position: UDFs are the slow path. Every query elsewhere in the
registry is Column expressions; these entries exist to prove the
surface works and to document the cost ladder:
  Column expr (codegen) > pandas UDF (Arrow batch) >> Python UDF (row).
applyInPandas / mapInPandas are exercised by the MapleJuice layer
(operators/maplejuice.py) and multimodal extractor.
"""

from __future__ import annotations

import re
from typing import Iterator

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.functions import pandas_udf

from distributed_system_spark.queries import register
from distributed_system_spark.sources.tables import load_table


@register(
    "udf_pandas_scalar",
    oracle="""
SELECT doc_id,
       len(str_split(text, ' ')) AS n_tokens,
       md5(text) AS text_md5
FROM documents
""",
    tags=("C10", "pandas-udf"),
)
def udf_pandas_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar pandas UDFs: one vectorized (string split/len), one
    per-element (hashlib md5 — bit-identical to the engines' md5).
    Defined inside the query: pandas_udf parses its return type
    against the active session, which doesn't exist at import time."""

    @pandas_udf("long")
    def _vec_token_count(text: pd.Series) -> pd.Series:
        # nullable Int64 (not int64): a NULL line stays NULL, matching
        # the oracle's len(str_split(NULL, ' ')) = NULL.
        return text.str.split(" ").str.len().astype("Int64")

    @pandas_udf("string")
    def _vec_md5(text: pd.Series) -> pd.Series:
        import hashlib

        return text.map(
            lambda s: hashlib.md5(s.encode()).hexdigest(),
            na_action="ignore",  # md5(NULL) = NULL, like the engines'
        )

    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        _vec_token_count("text").alias("n_tokens"),
        _vec_md5("text").alias("text_md5"),
    )


@register(
    "udf_grouped_agg",
    oracle="""
SELECT l_returnflag,
       round(max(l_extendedprice), 2) AS max_price,
       count(*) AS cnt
FROM lineitem GROUP BY l_returnflag
""",
    tags=("C10", "pandas-udf"),
)
def udf_grouped_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-aggregate pandas UDFs (Spark disallows mixing them with
    non-pandas aggregates in one groupBy, so both measures are pandas
    — still a single shuffle)."""

    @pandas_udf("double")
    def _grouped_max(v: pd.Series) -> float:
        # max is exact on floats (no accumulation): oracle-matches.
        return float(v.max())

    @pandas_udf("long")
    def _grouped_count(v: pd.Series) -> int:
        return int(len(v))

    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(_grouped_max("l_extendedprice"), 2).alias("max_price"),
        _grouped_count("l_extendedprice").alias("cnt"),
    )


@register(
    "udf_python_row",
    oracle="""
SELECT p_partkey,
       regexp_replace(p_name, '[^0-9a-zA-Z]', '', 'g') AS sanitized
FROM part
WHERE p_size > 40
""",
    tags=("C10", "python-udf", "B2"),
)
def udf_python_row(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-at-a-time Python UDF applying B2's sanitize (wc_maple.cpp:
    9-21). Exists to prove the surface; 10-100x slower than the
    Column-expression form in functions/wordcount.py — never use this
    shape in a hot path. The filter still pushes down to the scan
    (only the projection pays the Python tax)."""
    sanitize = F.udf(lambda s: re.sub("[^0-9a-zA-Z]", "", s), "string")
    part = load_table(spark, sf_dir, "part")
    return part.filter(F.col("p_size") > 40).select(
        "p_partkey", sanitize("p_name").alias("sanitized")
    )


@register(
    "approx_distinct",
    oracle="""
SELECT l_returnflag,
       count(DISTINCT l_partkey) AS exact_parts,
       TRUE AS within_rel_err
FROM lineitem GROUP BY l_returnflag
""",
    tags=("C4", "approx"),
)
def approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct (HyperLogLog++) checked against the exact
    count; at 100 TB the sketch avoids the count-distinct shuffle
    entirely.

    Two engines' raw HLL estimates legitimately differ, so the
    estimate itself can't be hash-compared — instead the output
    carries the exact count (oracle-checkable) plus a boolean
    ``within_rel_err`` computed from the Spark-side estimate (|approx
    - exact| <= max(1, 10% of exact) — a loose multiple of the
    configured rsd=0.02, so the bound never flakes on a legitimate
    estimator tail).  The oracle asserts the boolean is TRUE on every
    row, which turns the former rows-only record into a real hash
    check certifying the accuracy CONTRACT rather than the
    engine-specific estimate (r12 verdict item #5); the tight-rsd
    assertion lives in tests/test_udf_approx.py."""
    li = load_table(spark, sf_dir, "lineitem")
    agg = li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey", rsd=0.02).alias("approx_parts"),
        F.countDistinct("l_partkey").alias("exact_parts"),
    )
    return agg.select(
        "l_returnflag",
        "exact_parts",
        (
            F.abs(F.col("approx_parts") - F.col("exact_parts"))
            <= F.greatest(
                F.lit(1.0), 0.10 * F.col("exact_parts").cast("double")
            )
        ).alias("within_rel_err"),
    )


@register(
    "hll_mergeable_rollup",
    oracle="""
SELECT event_type,
       count(DISTINCT user_id) AS exact_users,
       TRUE AS within_rel_err
FROM events GROUP BY event_type
UNION ALL
SELECT 'ALL' AS event_type,
       count(DISTINCT user_id) AS exact_users,
       TRUE AS within_rel_err
FROM events
""",
    tags=("C4", "approx", "sketch"),
)
def hll_mergeable_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable HLL sketches (Apache DataSketches via
    hll_sketch_agg / hll_union_agg): per-event-type user sketches are
    built once, then *re-aggregated* to a global distinct-user count
    by merging the sketches — no second pass over the data.

    This is the 100 TB pattern the plain approx_count_distinct can't
    do: persist per-partition/per-day sketch bytes, answer any
    rollup (day → month → all-time distinct) by unioning kilobytes.

    The sketch bytes/estimates are engine-specific, so — like
    ``approx_distinct`` — the output carries the exact counts
    (oracle-checkable; the 'ALL' row's exact global distinct comes
    from a second 1-row aggregate, joined back by a broadcast of one
    row) plus a boolean ``within_rel_err`` (|estimate - exact| <=
    max(1, 5% of exact), the published lgK=14 accuracy with wide
    margin).  The oracle asserts TRUE on every row INCLUDING the
    merged one, so the hash check certifies both the per-type
    accuracy contract and the sketch-union re-aggregation property
    (r12 verdict item #5); the estimate-level assertions live in
    tests/test_udf_approx.py."""
    ev = load_table(spark, sf_dir, "events")

    def within(approx, exact):
        return (
            F.abs(approx - exact)
            <= F.greatest(F.lit(1.0), 0.05 * exact.cast("double"))
        ).alias("within_rel_err")

    per_type = ev.groupBy("event_type").agg(
        F.hll_sketch_agg("user_id", F.lit(14)).alias("sk"),
        F.countDistinct("user_id").alias("exact_users"),
    )
    global_exact = ev.agg(F.countDistinct("user_id").alias("exact_users"))
    merged = (
        per_type.agg(
            F.hll_sketch_estimate(F.hll_union_agg("sk")).alias(
                "approx_users"
            )
        )
        .crossJoin(F.broadcast(global_exact))
        .select(
            F.lit("ALL").alias("event_type"),
            "exact_users",
            within(F.col("approx_users"), F.col("exact_users")),
        )
    )
    return per_type.select(
        "event_type",
        "exact_users",
        within(F.hll_sketch_estimate("sk"), F.col("exact_users")),
    ).unionByName(merged)


@register(
    "udtf_tokenize",
    oracle="""
SELECT doc_id, CAST(i - 1 AS INT) AS pos, toks[CAST(i AS INT)] AS token
FROM (SELECT doc_id, str_split(text, ' ') AS toks
      FROM documents WHERE doc_id < 50),
     LATERAL (SELECT unnest(range(1, len(toks) + 1)) AS i) t
""",
    tags=("C10", "udtf"),
)
def udtf_tokenize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python user-defined TABLE function (Spark 4 `@udtf`) in a
    LATERAL join: one input doc row fans out to one row per token with
    its position — the C10 surface for UDFs whose output is a
    relation, not a scalar (parsers, NER extractors, chunkers).

    Like udf_python_row this exists to pin the API surface: the
    per-row Python hop is the honest cost (the declarative equivalent
    is posexplode, asserted equal by the oracle), so the input is
    capped to 50 docs just as the row-UDF query caps its input.  At
    scale prefer arrow-optimized UDTFs / mapInPandas unless the
    fan-out logic is genuinely imperative.
    """
    from pyspark.sql.functions import udtf

    @udtf(returnType="doc_id bigint, pos int, token string")
    class Tokenize:
        def eval(self, doc_id, text):  # noqa: ANN001
            for i, tok in enumerate(text.split(" ")):
                yield doc_id, i, tok

    spark.udtf.register("dss_tokenize", Tokenize)
    load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") < 50
    ).createOrReplaceTempView("udtf_docs_in")
    return spark.sql(
        "SELECT t.doc_id, t.pos, t.token "
        "FROM udtf_docs_in d, LATERAL dss_tokenize(d.doc_id, d.text) t"
    )


@register(
    "udf_arrow_map",
    oracle="""
SELECT doc_id,
       length(text) AS n_chars_py,
       len(str_split(text, ' ')) AS n_tokens_py,
       md5(text) AS text_md5
FROM documents
""",
    tags=("C10", "udf", "arrow"),
)
def udf_arrow_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``mapInArrow``: the zero-copy end of the Python UDF spectrum —
    the batch arrives as a ``pyarrow.RecordBatch`` and the compute
    runs on Arrow arrays directly, skipping even the pandas
    conversion that pandas_udf/mapInPandas pay.  The right surface
    when the Python side is itself Arrow-native (vectorized token
    counting here via pyarrow.compute; in production: Arrow-native
    tokenizers, DataFusion kernels, GPU libraries via the Arrow CUDA
    interface).  Completes the C10 ladder: row UDF → pandas_udf →
    mapInPandas/applyInPandas → mapInArrow.  One linear scan, no
    shuffle; md5 proves byte-exact passage through the Arrow hop."""
    import pyarrow as pa
    import pyarrow.compute as pc

    def arrow_stats(batches):
        for batch in batches:
            text = batch.column("text")
            toks = pc.split_pattern(text, " ")
            yield pa.RecordBatch.from_arrays(
                [
                    batch.column("doc_id"),
                    pc.cast(pc.utf8_length(text), pa.int64()),
                    pc.cast(pc.list_value_length(toks), pa.int64()),
                ],
                ["doc_id", "n_chars_py", "n_tokens_py"],
            )

    docs = load_table(spark, sf_dir, "documents")
    stats = docs.select("doc_id", "text").mapInArrow(
        arrow_stats,
        "doc_id bigint, n_chars_py bigint, n_tokens_py bigint",
    )
    # md5 stays JVM-side; join back on doc_id (broadcast at this SF,
    # co-partitioned at scale).
    return stats.join(
        docs.select("doc_id", F.md5(F.col("text").cast("binary")).alias("text_md5")),
        "doc_id",
    )


@register(
    "udf_pandas_iter",
    oracle="""
SELECT doc_id,
       CAST(length(text) - length(replace(text, 'a', '')) AS BIGINT)
         AS n_a,
       CAST(length(text) + 7 AS BIGINT) AS enriched
FROM documents
""",
    tags=("C10", "udf", "pandas-iter"),
)
def udf_pandas_iter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``SCALAR_ITER`` pandas UDF — the rung of the C10 ladder between
    the per-batch scalar pandas_udf and mapInPandas: the function
    receives an ITERATOR of Series for one whole partition, so
    expensive per-task setup (a tokenizer, an ONNX session, a
    compiled regex set) is paid ONCE per partition instead of once
    per Arrow batch.  The 'model' here is a deterministic stand-in
    (a constant bias resolved at setup time) so the oracle stays
    SQL-expressible; the amortization structure — setup before the
    loop, batches streamed through it — is the real surface under
    test.

    At 100 TB: identical plan shape to any scalar pandas UDF (one
    linear Arrow-batched projection, no shuffle); the iterator form
    only changes WHERE the Python-side constant cost lands, which at
    thousands of partitions is exactly the difference that matters."""
    # The hint must spell ``Iterator[pd.Series]`` with a module-global
    # ``Iterator``: under ``from __future__ import annotations`` pyspark
    # re-resolves the string against the function's globals, so a
    # local alias raises UNSUPPORTED_SIGNATURE.
    @pandas_udf("long")
    def count_a(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        # per-partition setup: happens once, before the batch loop
        import re as _re

        pat = _re.compile("a")
        for s in batches:
            yield s.map(lambda t: len(pat.findall(t))).astype("int64")

    @pandas_udf("long")
    def enrich(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        bias = 7  # stands in for a model/config loaded at setup
        for s in batches:
            yield (s.str.len() + bias).astype("int64")

    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        count_a(F.col("text")).alias("n_a"),
        enrich(F.col("text")).alias("enriched"),
    )
