"""Shadow-commit semantics: data files without lineage rows are
invisible orphans (bfile/commit.c: shadow pages discarded unless the
commit record lands)."""

from __future__ import annotations

from pyspark.sql import functions as F

from idzebra_spark.operators.bruteforce import bm25_topk
from idzebra_spark.operators.segment import build_index
from idzebra_spark.operators.wand import SegmentIndex
from idzebra_spark.sources.corpus import load_documents


def test_orphan_batch_is_invisible(spark, sf_dir, tmp_path_factory):
    docs = load_documents(spark, sf_dir)
    path = str(tmp_path_factory.mktemp("orphan") / "idx")
    build_index(spark, docs, path, shard_size=64, block_size=32)

    baseline = [(r.doc_id, r.score_milli)
                for r in SegmentIndex(spark, path)
                .topk(["merge", "sort"], 10, "or").collect()]

    # simulate a crash mid-build of a NEW batch: blocks/norms/doc_meta
    # written under batch=b_orphan, but no lineage rows (the commit
    # record never landed)
    garbage = docs.limit(50).select(
        (F.col("doc_id") + 50000).alias("doc_id"), "text"
    )
    blocks = spark.read.parquet(f"{path}/blocks").limit(5)
    blocks.withColumn("term", F.lit("merge")).withColumn(
        "batch", F.lit("b_orphan")
    ).write.mode("append").partitionBy("batch").parquet(f"{path}/blocks")
    nrm = spark.read.parquet(f"{path}/norms").limit(2)
    nrm.withColumn("batch", F.lit("b_orphan")).write.mode("append").partitionBy(
        "batch"
    ).parquet(f"{path}/norms")

    # a reader opened after the crash sees exactly the committed state
    idx = SegmentIndex(spark, path)
    got = [(r.doc_id, r.score_milli)
           for r in idx.topk(["merge", "sort"], 10, "or").collect()]
    assert got == baseline
    want = [(r.doc_id, r.score_milli)
            for r in bm25_topk(docs, ["merge", "sort"], 10, "or").collect()]
    assert got == want
    assert idx.stats()[0] == docs.count()
