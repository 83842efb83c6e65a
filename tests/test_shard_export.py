"""End-to-end pretraining-shard export: curation_pipeline → join back
to text → split-partitioned parquet shards → re-read with partition
pruning.  The composition a pretraining-data user actually ships:
curate, split, lay out for the trainer."""

from __future__ import annotations

import pyspark.sql.functions as F

from distributed_system_spark.queries import load_all


def test_curated_shard_export_roundtrip(spark, sf_dir, tmp_path):
    reg = load_all()
    curated = reg["curation_pipeline"].fn(spark, sf_dir)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    shards = curated.join(docs, "doc_id").select(
        "doc_id", "split", "n_tokens", "text"
    )
    out = str(tmp_path / "shards")
    shards.write.partitionBy("split").mode("overwrite").parquet(out)

    back = spark.read.parquet(out)
    # Exactly the curated set survives the round trip: same ids, no
    # dupes, same per-split counts.
    expect = {(r.doc_id, r.split) for r in curated.collect()}
    got = [(r.doc_id, r.split) for r in back.select("doc_id", "split").collect()]
    assert len(got) == len(expect)
    assert set(got) == expect

    # Partition pruning: a split=train read must scan only the train
    # directory (PartitionFilters in the plan, train-only row count).
    train = back.filter(F.col("split") == "train")
    n_train = sum(1 for _, s in expect if s == "train")
    assert train.count() == n_train
    plan = train._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan
    assert "split" in plan.split("PartitionFilters")[1][:120]

    # Every shard row still carries its text and the token count the
    # curation stage reported.
    sample = back.limit(20).collect()
    for r in sample:
        assert r.text and r.n_tokens == len(r.text.split(" "))
