"""The flagship query: the reference's word count, end to end.

Reproduces the only shipped workload of the reference
(mje/src/wc_maple.cpp + mje/src/wc_juice.cpp, validated by
tests/maplejuice.cpp:249-255) as a single declarative Spark plan:
scan (A1) → tokenize (B1) → sanitize (B2) → partial+final aggregation
(B3+B5, Catalyst does the map-side combine automatically) → global
sort (B9).  The DuckDB oracle implements the identical tokenizer
semantics in SQL.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from distributed_system_spark.functions.wordcount import (
    sanitize_token,
    split_lines,
    tokenize_line,
)
from distributed_system_spark.queries import register
from distributed_system_spark.sources.tables import load_table


def wordcount_df(docs: DataFrame) -> DataFrame:
    """documents(text) → (word, cnt) with the reference's exact
    tokenize/sanitize semantics, ordered by word.  Deliberately NOT
    widened: JVM-side tokenize+partial-count is cheap per byte, and
    measured walls were better letting the partial agg shrink the
    data before the first exchange (the Python maple path in
    doc_lines IS widened — per-byte cost there is ~100x)."""
    return (
        docs.select(F.explode(split_lines("text")).alias("line"))
        .select(F.explode(tokenize_line("line")).alias("tok"))
        .select(sanitize_token("tok").alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy("word")
    )


WORDCOUNT_ORACLE = """
WITH lines0 AS (
  SELECT str_split(text, chr(10)) AS ls FROM documents
), lines AS (
  SELECT unnest(CASE WHEN len(ls) > 0 AND ls[len(ls)] = ''
                THEN list_slice(ls, 1, len(ls) - 1) ELSE ls END) AS line
  FROM lines0
), toks0 AS (
  SELECT regexp_split_to_array(line, '[ \t\r\x0B\f]') AS ts FROM lines
), toks AS (
  SELECT unnest(CASE WHEN len(ts) > 0 AND ts[len(ts)] = ''
                THEN list_slice(ts, 1, len(ts) - 1) ELSE ts END) AS tok
  FROM toks0
)
SELECT regexp_replace(tok, '[^0-9a-zA-Z]', '', 'g') AS word,
       count(*) AS cnt
FROM toks
GROUP BY word
ORDER BY word
"""


@register("wordcount", oracle=WORDCOUNT_ORACLE, tags=("flagship", "B1-B9"))
def wordcount(spark: SparkSession, sf_dir: str) -> DataFrame:
    return wordcount_df(load_table(spark, sf_dir, "documents"))
