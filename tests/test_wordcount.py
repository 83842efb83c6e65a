"""Tokenizer goldens — wc_maple.cpp:28-44: every separator ends a
token INCLUDING empty tokens from consecutive/leading separators; the
trailing token is dropped only when empty; sanitize keeps [0-9a-zA-Z]
preserving case (wc_maple.cpp:9-21)."""

from __future__ import annotations

import pyspark.sql.functions as F

from distributed_system_spark.functions.wordcount import (
    sanitize_token,
    split_lines,
    tokenize_line,
)


def _tokens(spark, line):
    return (
        spark.createDataFrame([(line,)], "line string")
        .select(tokenize_line("line").alias("t"))
        .first()["t"]
    )


def test_simple_split(spark):
    assert _tokens(spark, "a b c") == ["a", "b", "c"]


def test_consecutive_separators_yield_empty_tokens(spark):
    assert _tokens(spark, "a  b") == ["a", "", "b"]


def test_leading_separator_counts_empty(spark):
    assert _tokens(spark, " a") == ["", "a"]


def test_trailing_separator_drops_final_empty(spark):
    assert _tokens(spark, "a b ") == ["a", "b"]
    assert _tokens(spark, "a b  ") == ["a", "b", ""]  # only LAST dropped


def test_tab_and_formfeed_separators(spark):
    assert _tokens(spark, "a\tb\fc\rd\x0be") == ["a", "b", "c", "d", "e"]


def test_empty_line_has_no_tokens(spark):
    # wc_maple.cpp: the trailing token is counted only if non-empty,
    # so an empty line yields zero tokens.
    assert _tokens(spark, "") == []


def test_sanitize_preserves_case_strips_rest(spark):
    out = (
        spark.createDataFrame([("He,llo!42",), ("...",)], "t string")
        .select(sanitize_token("t").alias("s"))
        .collect()
    )
    assert [r["s"] for r in out] == ["Hello42", ""]


def test_split_lines_getline_semantics(spark):
    df = spark.createDataFrame([("l1\nl2\n",), ("only\n",), ("noeol",)], "t string")
    out = df.select(split_lines("t").alias("ls")).collect()
    assert [r["ls"] for r in out] == [["l1", "l2"], ["only"], ["noeol"]]
