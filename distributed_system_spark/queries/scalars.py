"""Scalar-function surface (SURVEY.md §2.C row C8): string, date,
math, regex, array, map and JSON families.

The reference's only scalar functions are the word-count tokenizer /
sanitizer (wc_maple.cpp:9-44) and the try/catch stoi cast
(wc_juice.cpp:28-37), covered by ``wordcount`` / ``try_cast_tokens``;
everything here is the driver-mandated extension surface, expressed
as built-in Column expressions so the whole projection stays inside
whole-stage codegen (never a Python UDF).

Cross-engine gotchas handled below:
- DuckDB ``dayofweek`` is 0=Sunday, Spark's is 1=Sunday (oracle +1);
- dates are emitted as formatted strings (pandas date vs timestamp
  dtypes would never hash-match);
- irrational math outputs are rounded at 6 digits in double (safe:
  half-way representation collisions only occur for exact-decimal
  inputs, which use the DECIMAL path from ``_util``).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from distributed_system_spark.queries import register
from distributed_system_spark.sources.tables import load_table


@register(
    "string_funcs",
    oracle="""
SELECT c_custkey,
       lower(c_name) AS lname,
       upper(c_mktsegment) AS useg,
       substr(c_name, 1, 8) AS pre8,
       length(c_name) AS name_len,
       concat(c_mktsegment, ':', c_name) AS tagged,
       replace(c_name, '#', '-') AS dashed,
       reverse(c_mktsegment) AS rseg,
       strpos(c_name, '#') AS hash_pos,
       lpad(CAST(c_custkey AS VARCHAR), 10, '0') AS padded_key,
       trim(concat(' ', c_name, '  ')) AS trimmed,
       md5(c_name) AS name_md5
FROM customer
""",
    tags=("C8", "string"),
)
def string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    return cust.select(
        "c_custkey",
        F.lower("c_name").alias("lname"),
        F.upper("c_mktsegment").alias("useg"),
        F.substring("c_name", 1, 8).alias("pre8"),
        F.length("c_name").cast("long").alias("name_len"),
        F.concat("c_mktsegment", F.lit(":"), "c_name").alias("tagged"),
        F.replace("c_name", F.lit("#"), F.lit("-")).alias("dashed"),
        F.reverse("c_mktsegment").alias("rseg"),
        F.instr("c_name", "#").cast("long").alias("hash_pos"),
        F.lpad(F.col("c_custkey").cast("string"), 10, "0").alias("padded_key"),
        F.trim(F.concat(F.lit(" "), "c_name", F.lit("  "))).alias("trimmed"),
        F.md5(F.col("c_name").cast("binary")).alias("name_md5"),
    )


@register(
    "date_funcs",
    oracle="""
SELECT o_orderkey,
       year(o_orderdate) AS y,
       month(o_orderdate) AS m,
       day(o_orderdate) AS d,
       quarter(o_orderdate) AS q,
       dayofweek(o_orderdate) + 1 AS dow,
       strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
       strftime(CAST(o_orderdate AS DATE) + 30, '%Y-%m-%d') AS due_date,
       date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS days_since,
       strftime(last_day(o_orderdate), '%Y-%m-%d') AS month_end
FROM orders
""",
    tags=("C8", "date"),
)
def date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    d = F.col("o_orderdate")
    return orders.select(
        "o_orderkey",
        F.year(d).cast("long").alias("y"),
        F.month(d).cast("long").alias("m"),
        F.dayofmonth(d).cast("long").alias("d"),
        F.quarter(d).cast("long").alias("q"),
        F.dayofweek(d).cast("long").alias("dow"),
        F.date_format(F.date_trunc("month", d), "yyyy-MM-dd").alias(
            "month_start"
        ),
        F.date_format(F.date_add(d, 30), "yyyy-MM-dd").alias("due_date"),
        F.datediff(d, F.lit("1995-01-01").cast("date")).cast("long").alias("days_since"),
        F.date_format(F.last_day(d), "yyyy-MM-dd").alias("month_end"),
    )


@register(
    "math_funcs",
    oracle="""
SELECT p_partkey,
       abs(p_size - 25) AS dist25,
       CAST(ceil(p_retailprice) AS BIGINT) AS ceil_price,
       CAST(floor(p_retailprice) AS BIGINT) AS floor_price,
       round(sqrt(CAST(p_size AS DOUBLE)), 6) AS sqrt_size,
       round(ln(p_retailprice), 6) AS ln_price,
       round(log10(p_retailprice), 6) AS log10_price,
       round(pow(CAST(p_size AS DOUBLE), 2), 1) AS size_sq,
       p_size % 7 AS size_mod7,
       CAST(sign(p_size - 25) AS DOUBLE) AS size_sign,
       greatest(p_size, 25) AS size_hi,
       least(p_size, 25) AS size_lo
FROM part
""",
    tags=("C8", "math"),
)
def math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    size_d = F.col("p_size").cast("double")
    return part.select(
        "p_partkey",
        F.abs(F.col("p_size") - 25).alias("dist25"),
        F.ceil("p_retailprice").alias("ceil_price"),
        F.floor("p_retailprice").alias("floor_price"),
        F.round(F.sqrt(size_d), 6).alias("sqrt_size"),
        F.round(F.log("p_retailprice"), 6).alias("ln_price"),
        F.round(F.log10("p_retailprice"), 6).alias("log10_price"),
        F.round(F.pow(size_d, 2), 1).alias("size_sq"),
        (F.col("p_size") % 7).alias("size_mod7"),
        F.signum(F.col("p_size") - 25).cast("double").alias("size_sign"),
        F.greatest("p_size", F.lit(25)).cast("long").alias("size_hi"),
        F.least("p_size", F.lit(25)).cast("long").alias("size_lo"),
    )


@register(
    "regex_funcs",
    oracle="""
SELECT p_partkey, p_type,
       regexp_extract(p_type, '^([A-Z]+)', 1) AS type_head,
       regexp_replace(p_type, '[aeiou]', '_', 'g') AS devoweled,
       regexp_matches(p_name, 'gear|spring') AS is_mech,
       CAST(regexp_extract(p_brand, '([0-9]+)$', 1) AS INTEGER) AS brand_num
FROM part
""",
    tags=("C8", "regex"),
)
def regex_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        "p_type",
        F.regexp_extract("p_type", "^([A-Z]+)", 1).alias("type_head"),
        F.regexp_replace("p_type", "[aeiou]", "_").alias("devoweled"),
        F.col("p_name").rlike("gear|spring").alias("is_mech"),
        F.regexp_extract("p_brand", "([0-9]+)$", 1)
        .cast("int")
        .alias("brand_num"),
    )


@register(
    "array_funcs",
    oracle="""
SELECT doc_id,
       len(str_split(text, ' ')) AS n_words,
       str_split(text, ' ')[1] AS first_word,
       str_split(text, ' ')[-1] AS last_word,
       list_contains(str_split(text, ' '), 'spark') AS has_spark,
       len(list_distinct(str_split(text, ' '))) AS n_unique,
       array_to_string(list_sort(list_distinct(str_split(text, ' '))), ',')
         AS vocab,
       array_to_string(str_split(text, ' ')[1:3], ' ') AS first3
FROM documents
""",
    tags=("C8", "array"),
)
def array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    words = F.split("text", " ", -1)
    return docs.select(
        "doc_id",
        F.size(words).cast("long").alias("n_words"),
        F.element_at(words, 1).alias("first_word"),
        F.element_at(words, -1).alias("last_word"),
        F.array_contains(words, "spark").alias("has_spark"),
        F.size(F.array_distinct(words)).cast("long").alias("n_unique"),
        F.array_join(F.array_sort(F.array_distinct(words)), ",").alias(
            "vocab"
        ),
        F.array_join(F.slice(words, 1, 3), " ").alias("first3"),
    )


@register(
    "agg_arrays",
    oracle="""
SELECT l_returnflag,
       array_to_string(list_sort(list(DISTINCT l_linestatus)), ',')
         AS statuses,
       CAST(round(CAST(min(l_quantity) AS DECIMAL(18,4)), 2) AS DOUBLE)
         AS min_qty,
       CAST(round(CAST(max(l_quantity) AS DECIMAL(18,4)), 2) AS DOUBLE)
         AS max_qty
FROM lineitem
GROUP BY l_returnflag
""",
    tags=("C8", "array", "C4"),
)
def agg_arrays(spark: SparkSession, sf_dir: str) -> DataFrame:
    """collect_set → sorted joined string (engine-stable array agg)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.array_join(F.array_sort(F.collect_set("l_linestatus")), ",").alias(
            "statuses"
        ),
        F.round(F.min("l_quantity").cast("decimal(18,4)"), 2)
        .cast("double")
        .alias("min_qty"),
        F.round(F.max("l_quantity").cast("decimal(18,4)"), 2)
        .cast("double")
        .alias("max_qty"),
    )


@register(
    "map_json_funcs",
    oracle="""
SELECT event_id,
       CAST(props->>'$.k' AS INTEGER) AS prop_k,
       event_type AS type_from_map,
       concat('type=', event_type, ';k=', props->>'$.k') AS packed
FROM events
""",
    tags=("C8", "map", "json"),
)
def map_json_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON extraction + map build/lookup round-trip.

    The map column itself never leaves the plan (map dtypes don't
    hash-match across engines); the oracle reproduces the *values* the
    map operations yield, which is what the driver compares.
    """
    ev = load_table(spark, sf_dir, "events")
    m = F.create_map(
        F.lit("type"), F.col("event_type"),
        F.lit("k"), F.get_json_object("props", "$.k"),
    )
    return ev.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("int").alias("prop_k"),
        F.element_at(m, "type").alias("type_from_map"),
        F.concat(
            F.lit("type="),
            F.element_at(m, "type"),
            F.lit(";k="),
            F.element_at(m, "k"),
        ).alias("packed"),
    )


@register(
    "from_json_struct",
    oracle="""
SELECT event_id, user_id,
       CAST(json_extract(props, '$.k') AS INTEGER) AS k,
       json_extract_string(props, '$.missing') AS missing
FROM events
WHERE event_type = 'view'
""",
    tags=("C8", "json"),
)
def from_json_struct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed JSON parse via from_json (schema'd struct, not string path)."""
    ev = load_table(spark, sf_dir, "events")
    parsed = F.from_json("props", "k INT, missing STRING")
    return (
        ev.filter(F.col("event_type") == "view")
        .withColumn("p", parsed)
        .select(
            "event_id",
            "user_id",
            F.col("p.k").alias("k"),
            F.col("p.missing").alias("missing"),
        )
    )


@register(
    "cond_null_funcs",
    oracle="""
SELECT s_suppkey,
       coalesce(nullif(s_name, 'SUPP_0'), 'anonymous') AS display_name,
       CASE WHEN s_acctbal < 0 THEN NULL ELSE round(s_acctbal, 2) END
         AS pos_bal,
       round(least(s_acctbal, 5000.0), 2) AS capped,
       round(greatest(s_acctbal, 0.0), 2) AS floored,
       (s_acctbal IS NULL) AS bal_missing,
       ifnull(CASE WHEN s_acctbal >= 0 THEN s_acctbal END, 0.0) >= 0
         AS nonneg
FROM supplier
""",
    tags=("C8", "conditional"),
)
def cond_null_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional / NULL-handling family: coalesce, nullif, CASE-to-
    NULL, least/greatest, isnull, ifnull — all codegen'd Column
    expressions (no UDF), identical semantics on both engines."""
    s = load_table(spark, sf_dir, "supplier")
    bal = F.col("s_acctbal")
    return s.select(
        "s_suppkey",
        F.coalesce(F.nullif("s_name", F.lit("SUPP_0")), F.lit("anonymous"))
        .alias("display_name"),
        F.when(bal >= 0, F.round(bal, 2)).alias("pos_bal"),
        F.round(F.least(bal, F.lit(5000.0)), 2).alias("capped"),
        F.round(F.greatest(bal, F.lit(0.0)), 2).alias("floored"),
        F.isnull(bal).alias("bal_missing"),
        (F.ifnull(F.when(bal >= 0, bal), F.lit(0.0)) >= 0).alias("nonneg"),
    )


@register(
    "variant_json_extract",
    oracle="""
SELECT event_id,
       CAST(props ->> '$.k' AS BIGINT) AS k,
       CAST(props ->> '$.missing' AS BIGINT) AS missing
FROM events
""",
    tags=("C8", "semi-structured", "variant"),
)
def variant_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured access through the VARIANT type (Spark 4):
    parse the JSON props column once into the binary variant encoding,
    then extract typed paths with try_variant_get — the
    schema-on-read shape for ragged event payloads, where a
    per-field from_json schema would be wrong the day a producer
    adds a field.  Missing paths are NULL (try_ semantics), never an
    error.

    At 100 TB: variants parse once per row and store as binary
    (shredded access beats repeated string JSON parsing per field);
    the plan stays a shuffle-free per-row map.
    """
    ev = load_table(spark, sf_dir, "events")
    v = F.parse_json("props")
    return ev.select(
        "event_id",
        F.try_variant_get(v, "$.k", "bigint").alias("k"),
        F.try_variant_get(v, "$.missing", "bigint").alias("missing"),
    )
