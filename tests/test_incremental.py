"""Incremental update + streaming ingest: the net result must equal a
fresh full rebuild (the insert/delete netting invariant,
/root/reference/index/kinput.c:449-494)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from idzebra_spark.operators.segment import build_index, update_index
from idzebra_spark.operators.wand import SegmentIndex
from idzebra_spark.sources.corpus import load_documents

QUERY = (["merge", "sort"], "or")


def _snapshot2(docs):
    """Modify 50 docs, delete 25, add 10."""
    base = docs.select("doc_id", "text")
    modified = base.where(F.col("doc_id") < 50).withColumn(
        "text", F.concat(F.col("text"), F.lit(" zzedit merge merge"))
    )
    kept = base.where((F.col("doc_id") >= 50) & (F.col("doc_id") < 475))
    added = base.limit(10).select(
        (F.col("doc_id") + 10000).alias("doc_id"),
        F.concat(F.lit("fresh doc sort "), F.col("text")).alias("text"),
    )
    return modified.unionByName(kept).unionByName(added)


def _results(idx):
    terms, mode = QUERY
    top = [(r.doc_id, r.score_milli) for r in idx.topk(terms, 10, mode).collect()]
    n, avgdl = idx.stats()
    return top, n, round(avgdl, 9), idx.count(terms, mode)


def test_incremental_equals_full_rebuild(spark, sf_dir, tmp_path_factory):
    docs = load_documents(spark, sf_dir)
    snap2 = _snapshot2(docs).cache()

    inc_path = str(tmp_path_factory.mktemp("inc") / "idx")
    build_index(spark, docs, inc_path, shard_size=64, block_size=32)
    m = update_index(spark, snap2, inc_path, shard_size=64, block_size=32)
    assert 0 < m["changed_shards"] < 10  # touched, but not everything

    full_path = str(tmp_path_factory.mktemp("full") / "idx")
    build_index(spark, snap2, full_path, shard_size=64, block_size=32)

    inc, full = SegmentIndex(spark, inc_path), SegmentIndex(spark, full_path)
    assert _results(inc) == _results(full)
    # dictionaries identical (net insert/delete resolution)
    d_inc = inc.dictionary()
    d_full = full.dictionary()
    assert d_inc.count() == d_full.count()
    assert (
        d_inc.join(d_full, "term", "full")
        .where(
            (d_inc["df"] != d_full["df"]) | (d_inc["cf"] != d_full["cf"])
            | d_inc["df"].isNull() | d_full["df"].isNull()
        )
        .count()
        == 0
    )
    # deleted docs are gone
    assert inc.count(["merge"], "or") == full.count(["merge"], "or")
    assert inc.doc_meta().where(F.col("doc_id") >= 475).where(
        F.col("doc_id") < 500
    ).count() == 0


def test_noop_update_is_noop(spark, sf_dir, tmp_path_factory):
    docs = load_documents(spark, sf_dir)
    path = str(tmp_path_factory.mktemp("noop") / "idx")
    build_index(spark, docs, path, shard_size=64, block_size=32)
    m = update_index(spark, docs.select("doc_id", "text"), path,
                     shard_size=64, block_size=32)
    assert m["changed_shards"] == 0


def test_streaming_ingest_matches_batch_build(spark, sf_dir, tmp_path_factory):
    from idzebra_spark.streaming.ingest import stream_build

    docs = load_documents(spark, sf_dir).select("doc_id", "text")
    root = tmp_path_factory.mktemp("stream")
    in_dir, idx_path, ckpt = str(root / "in"), str(root / "idx"), str(root / "ckpt")

    # drop 1: first half
    docs.where(F.col("doc_id") < 250).write.mode("append").parquet(in_dir)
    stream_build(spark, in_dir, idx_path, ckpt,
                 shard_size=64, block_size=32)
    idx1 = SegmentIndex(spark, idx_path)
    assert idx1.stats()[0] == 250

    # drop 2: second half arrives; stream drains only the new files
    docs.where(F.col("doc_id") >= 250).write.mode("append").parquet(in_dir)
    stream_build(spark, in_dir, idx_path, ckpt,
                 shard_size=64, block_size=32)

    full_path = str(root / "full")
    build_index(spark, docs, full_path, shard_size=64, block_size=32)
    got, want = SegmentIndex(spark, idx_path), SegmentIndex(spark, full_path)
    assert _results(got) == _results(want)
