"""Segment build + block-max WAND query: rank-identity vs the
brute-force DataFrame plan (the correctness gate of SURVEY.md §7
steps 4-6), resumable-build semantics, and invariant checks."""

from __future__ import annotations

import shutil

import pytest
from pyspark.sql import functions as F

from idzebra_spark.operators.bruteforce import bm25_topk, postings_with_tf
from idzebra_spark.operators.segment import build_index
from idzebra_spark.operators.wand import SegmentIndex
from idzebra_spark.sources.corpus import load_documents


@pytest.fixture(scope="module")
def index(spark, sf_dir, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("seg") / "idx")
    docs = load_documents(spark, sf_dir)
    m = build_index(
        spark, docs, path, shard_size=64, block_size=32, store_positions=True
    )
    assert m["docs"] == docs.count()
    return SegmentIndex(spark, path), docs, path


QUERIES = [
    (["merge"], "or"),
    (["merge", "sort"], "or"),
    (["the", "data"], "or"),          # high-df OR → exercises θ pruning
    (["spark", "query"], "and"),
    (["merge", "sort", "scan"], "and"),
    (["nosuchtoken"], "or"),          # rsnull path
    (["merge", "nosuchtoken"], "and"),
]


@pytest.mark.parametrize("terms,mode", QUERIES, ids=[f"{'_'.join(t)}-{m}" for t, m in QUERIES])
def test_rank_identity_vs_bruteforce(index, terms, mode):
    idx, docs, _ = index
    want = [(r.doc_id, r.score_milli) for r in bm25_topk(docs, terms, 10, mode).collect()]
    got = [(r.doc_id, r.score_milli) for r in idx.topk(terms, 10, mode).collect()]
    assert got == want


def test_counts_match_bruteforce(index, spark):
    idx, docs, _ = index
    from idzebra_spark.functions.tokenizer import tokenize

    toks = tokenize(docs)
    for terms, mode in [(["merge", "sort"], "or"), (["merge", "sort"], "and")]:
        g = toks.where(F.col("term").isin(terms)).groupBy("doc_id").agg(
            F.countDistinct("term").alias("nt")
        )
        if mode == "and":
            g = g.where(F.col("nt") == len(terms))
        assert idx.count(terms, mode) == g.count()


def test_dictionary_matches_logical_postings(index):
    idx, docs, _ = index
    tf = postings_with_tf(docs)
    want = (
        tf.groupBy("term")
        .agg(F.count("*").alias("df"), F.sum("tf").alias("cf"))
    )
    got = idx.dictionary().select("term", "df", "cf")
    diff = got.join(want, "term", "full").where(
        (got["df"] != want["df"]) | (got["cf"] != want["cf"])
        | got["df"].isNull() | want["df"].isNull()
    )
    assert diff.count() == 0
    assert got.count() == want.count()


def test_sha256_invariant(index, spark):
    idx, docs, _ = index
    src = docs.select("doc_id", F.sha2(F.col("text"), 256).alias("src_sha"))
    j = idx.doc_meta().join(src, "doc_id")
    assert j.where(F.col("sha256") != F.col("src_sha")).count() == 0
    assert j.count() == docs.count()


def test_resume_no_double_count(spark, sf_dir, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("seg") / "resume_idx")
    docs = load_documents(spark, sf_dir)
    total = docs.count()

    m1 = build_index(spark, docs, path, shard_size=64, block_size=32,
                     fail_after_shards=3)
    assert m1["shards"] == 3
    m2 = build_index(spark, docs, path, shard_size=64, block_size=32)
    assert m1["docs"] + m2["docs"] == total

    idx = SegmentIndex(spark, path)
    n_docs, _ = idx.stats()
    assert n_docs == total
    # resumed index answers identically to the brute-force plan
    want = [(r.doc_id, r.score_milli)
            for r in bm25_topk(docs, ["merge", "sort"], 10, "or").collect()]
    got = [(r.doc_id, r.score_milli)
           for r in idx.topk(["merge", "sort"], 10, "or").collect()]
    assert got == want
    # idempotent: a third build is a no-op
    m3 = build_index(spark, docs, path, shard_size=64, block_size=32)
    assert m3["shards"] == 0
