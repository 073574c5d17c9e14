"""ZebraSpark facade: a Zebra user's full workflow through one object."""

from __future__ import annotations

from pyspark.sql import functions as F

from idzebra_spark.api import ZebraSpark
from idzebra_spark.operators.bruteforce import bm25_topk
from idzebra_spark.sources.corpus import load_documents


def _zs(spark, sf_dir, tmp_path_factory, **kw):
    docs = load_documents(spark, sf_dir)
    zs = ZebraSpark(spark, str(tmp_path_factory.mktemp("api") / "idx"),
                    corpus=docs, **kw)
    zs.build(docs, shard_size=64, block_size=32)
    return zs, docs


def test_search_flat_routes_to_wand(spark, sf_dir, tmp_path_factory):
    zs, docs = _zs(spark, sf_dir, tmp_path_factory)
    got = [(r.doc_id, r.score_milli)
           for r in zs.search("merge OR sort", 10).collect()]
    want = [(r.doc_id, r.score_milli)
            for r in bm25_topk(docs, ["merge", "sort"], 10, "or").collect()]
    assert got == want

    got_not = [(r.doc_id, r.score_milli)
               for r in zs.search("merge NOT slow", 10).collect()]
    want_not = [(r.doc_id, r.score_milli)
                for r in bm25_topk(docs, ["merge"], 10, "or",
                                   not_terms=["slow"]).collect()]
    assert got_not == want_not


def test_search_structured_falls_back(spark, sf_dir, tmp_path_factory):
    zs, docs = _zs(spark, sf_dir, tmp_path_factory)
    rows = zs.search('(merge OR sort) AND "batch batch"', 10).collect()
    assert len(rows) > 0
    # every returned doc satisfies the boolean constraint
    from idzebra_spark.operators.boolean import PostingsOps

    ops = PostingsOps(docs)
    valid = {r.doc_id for r in
             ops.and_([ops.or_([ops.term_docs("merge"), ops.term_docs("sort")]),
                       ops.phrase(["batch", "batch"]).select("doc_id")]).collect()}
    assert all(r.doc_id in valid for r in rows)


def test_lifecycle_and_vacuum(spark, sf_dir, tmp_path_factory):
    zs, docs = _zs(spark, sf_dir, tmp_path_factory)
    before = zs.count("merge AND sort")
    snap2 = docs.withColumn(
        "text",
        F.when(F.col("doc_id") < 30,
               F.concat("text", F.lit(" merge"))).otherwise(F.col("text")),
    )
    zs.update(snap2)
    zs.compact()
    removed = zs.vacuum()
    assert removed  # superseded batches got dropped
    after = zs.count("merge AND sort")
    assert after >= before
    # index still fully functional post-vacuum
    assert len(zs.search("merge OR sort", 10).collect()) == 10
    assert zs.scan("mer", 5).count() == 5
    assert zs.facets("merge OR sort", "source", 5).count() == 5
    assert zs.snippets("merge", 5).count() == 5


def test_fetch_element_sets(spark, sf_dir, tmp_path):
    from idzebra_spark.api import ZebraSpark
    from idzebra_spark.sources.corpus import load_documents

    docs = load_documents(spark, sf_dir)
    zs = ZebraSpark(spark, str(tmp_path / "idx_fetch"), corpus=docs)
    zs.build(docs, shard_size=64, block_size=32)
    full = zs.fetch([1, 3, 5], elements="full")
    assert [r["doc_id"] for r in full.collect()] == [1, 3, 5]
    assert "text" in full.columns
    meta = zs.fetch([1, 3], elements="meta")
    assert "text" not in meta.columns and meta.count() == 2
    head = zs.fetch([1], elements="head").collect()[0]
    assert len(head["head"].split()) <= 10
    # result-set input form
    hits = zs.index.eval_tree(("term", "merge"))
    assert zs.fetch(hits, "meta").count() == hits.count()


def test_info_matches_corpus(spark, sf_dir, tmp_path):
    """zinfo stats from the segment tables == raw re-tokenization."""
    from pyspark.sql import functions as F

    from idzebra_spark.api import ZebraSpark
    from idzebra_spark.functions.tokenizer import tokenize
    from idzebra_spark.sources.corpus import load_documents

    docs = load_documents(spark, sf_dir)
    zs = ZebraSpark(spark, str(tmp_path / "idx_info"), corpus=docs)
    zs.build(docs, shard_size=64, block_size=32)
    info = zs.info()
    raw = tokenize(docs).agg(
        F.countDistinct("term").alias("t"),
        F.count("*").alias("o"),
    ).collect()[0]
    assert info["n_docs"] == docs.count()
    assert info["n_terms"] == raw["t"]
    assert info["n_occurrences"] == raw["o"]
