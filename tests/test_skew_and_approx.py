"""Skew handling (structural: shard groups stay bounded under Zipf
head terms) and approximate hit counting."""

from __future__ import annotations

from pyspark.sql import functions as F

from idzebra_spark.operators.segment import build_index
from idzebra_spark.operators.wand import SegmentIndex
from idzebra_spark.sources.corpus import synth_source_files


def test_shard_load_uniform_under_zipf(spark, tmp_path_factory):
    """The synthetic corpus has ubiquitous tokens ('int','return') in
    ~every doc. Document-sharding bounds every build group by
    shard_size × avgdl regardless of term skew — lineage metrics must
    show near-uniform per-shard load (no hot key)."""
    path = str(tmp_path_factory.mktemp("skew") / "idx")
    corpus = synth_source_files(spark, 8000).select("doc_id", "content")
    build_index(spark, corpus, path, text_col="content",
                shard_size=512, block_size=128, store_positions=False)
    lin = spark.read.parquet(f"{path}/lineage")
    rows = lin.select("postings_emitted").collect()
    vals = sorted(r[0] for r in rows)
    assert len(vals) >= 10
    median = vals[len(vals) // 2]
    assert vals[-1] <= 2 * median  # no shard carries a skew hotspot

    # and the head term is correct end-to-end
    idx = SegmentIndex(spark, path)
    d = {r["term"]: r["df"] for r in
         idx.dictionary().where(F.col("term") == "int").collect()}
    assert d["int"] > 0.9 * 8000  # ubiquitous
    top = idx.topk(["int", "return"], 10, "and").collect()
    assert len(top) == 10


def test_approx_count_close_to_exact(spark, sf_dir, tmp_path_factory):
    from idzebra_spark.sources.corpus import load_documents

    docs = load_documents(spark, sf_dir)
    path = str(tmp_path_factory.mktemp("apx") / "idx")
    build_index(spark, docs, path, shard_size=32, block_size=32,
                store_positions=False)
    idx = SegmentIndex(spark, path)
    exact = idx.count(["data"], "or")
    approx = idx.approx_count(["data"], "or", sample=0.5)
    assert exact > 0
    # extrapolation from half the shards lands within 40%
    assert 0.6 * exact <= approx <= 1.4 * exact
