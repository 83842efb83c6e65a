"""Source/sink coverage (SURVEY.md §2.C row C1): csv/json/text
readers round-trip, partitioned parquet writes, input_file_name."""

from __future__ import annotations

import pyspark.sql.functions as F

from distributed_system_spark.sources.tables import load_table


def test_csv_roundtrip(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, "a,b", 1.5), (2, None, -0.25)], "id bigint, s string, x double"
    )
    path = str(tmp_path / "csv")
    df.write.option("header", True).csv(path)
    back = (
        spark.read.option("header", True)
        .schema("id bigint, s string, x double")
        .csv(path)
    )
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, df.collect()))


def test_json_roundtrip(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, {"k": "v"}), (2, {"k": None})], "id bigint, m map<string,string>"
    )
    path = str(tmp_path / "json")
    df.write.json(path)
    back = spark.read.schema("id bigint, m map<string,string>").json(path)
    assert back.count() == 2
    assert back.filter(F.col("m")["k"] == "v").count() == 1


def test_text_roundtrip(spark, tmp_path):
    lines = ["first line", "second  line", ""]
    df = spark.createDataFrame([(ln,) for ln in lines], "value string")
    path = str(tmp_path / "text")
    df.write.text(path)
    back = spark.read.text(path)
    assert sorted(r["value"] for r in back.collect()) == sorted(lines)


def test_partitioned_parquet_write_prunes(spark, tmp_path):
    df = spark.range(100).withColumn("part", (F.col("id") % 4).cast("int"))
    path = str(tmp_path / "pq")
    df.write.partitionBy("part").parquet(path)
    one = spark.read.parquet(path).filter(F.col("part") == 2)
    assert one.count() == 25
    # partition pruning must reach the scan
    plan = one._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan


def test_input_file_name_recovers_split(spark, sf_dir):
    """A1/B7: the filename is recoverable per row (the reference keys
    juice work on the intermediate file name, mj_worker.cpp:314)."""
    docs = load_table(spark, sf_dir, "documents").withColumn(
        "src_file", F.input_file_name()
    )
    n_files = docs.select("src_file").distinct().count()
    assert n_files >= 1
    assert docs.filter(F.col("src_file").contains("documents.parquet")).count() == docs.count()


def test_overwrite_vs_append_modes(spark, tmp_path):
    """A14/A15: put=overwrite resets, append adds (piece semantics)."""
    path = str(tmp_path / "modes")
    spark.range(5).write.parquet(path)
    spark.range(5).write.mode("append").parquet(path)
    assert spark.read.parquet(path).count() == 10
    spark.range(3).write.mode("overwrite").parquet(path)
    assert spark.read.parquet(path).count() == 3


def test_observe_metrics_account_for_rows(spark, sf_dir):
    """df.observe(): task-side metric accumulation during a real
    action — the zero-cost row/byte accounting a 100 TB pipeline
    attaches to every stage (the reference's FILE_DONE progress
    counters, mj_master.cpp:199-232, were driver-polled; Spark rolls
    them up with the job)."""
    import pyspark.sql.functions as F
    from pyspark.sql import Observation

    from distributed_system_spark.sources.tables import load_table

    li = load_table(spark, sf_dir, "lineitem")
    obs = Observation("scan_metrics")
    observed = li.observe(
        obs,
        F.count(F.lit(1)).alias("rows_seen"),
        F.sum((F.col("l_quantity") > 25).cast("long")).alias("big_qty"),
    )
    kept = observed.filter(F.col("l_quantity") > 25).count()
    assert obs.get["rows_seen"] == li.count()
    assert obs.get["big_qty"] == kept
