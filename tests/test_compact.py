"""Compaction: after incremental updates spread the index over
batches, compact_index folds live rows into one batch with identical
query results (zebra_compact semantics)."""

from __future__ import annotations

from pyspark.sql import functions as F

from idzebra_spark.operators.segment import (
    build_index,
    compact_index,
    update_index,
)
from idzebra_spark.operators.wand import SegmentIndex
from idzebra_spark.sources.corpus import load_documents


def test_compact_preserves_results(spark, sf_dir, tmp_path_factory):
    docs = load_documents(spark, sf_dir)
    path = str(tmp_path_factory.mktemp("cpt") / "idx")
    build_index(spark, docs, path, shard_size=64, block_size=32)
    # two updates → three batches, several live
    snap2 = docs.select("doc_id", F.concat("text", F.lit(" extra merge")).alias("text")) \
        .where(F.col("doc_id") < 80).unionByName(
            docs.select("doc_id", "text").where(F.col("doc_id") >= 80))
    update_index(spark, snap2, path, shard_size=64, block_size=32)

    before_idx = SegmentIndex(spark, path)
    before = [(r.doc_id, r.score_milli)
              for r in before_idx.topk(["merge", "sort"], 10, "or").collect()]
    before_stats = before_idx.stats()
    before_dict = before_idx.dictionary().count()

    m = compact_index(spark, path)
    assert m["shards"] > 0

    idx = SegmentIndex(spark, path)
    # everything now resolves to the single compacted batch
    batches = {r["batch"] for r in idx.shard_batch.select("batch").distinct().collect()}
    assert batches == {m["batch"]}
    got = [(r.doc_id, r.score_milli)
           for r in idx.topk(["merge", "sort"], 10, "or").collect()]
    assert got == before
    assert idx.stats() == before_stats
    assert idx.dictionary().count() == before_dict
